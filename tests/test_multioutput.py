"""Multi-output (ICM/LMC coregionalization) oracles.

The coregion axis is beyond-reference capability (the reference is strictly
single-output). Every structured computation is pinned against a dense
float64 numpy oracle built from B ⊗ K directly, per the repo convention.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from vggp_tpu import kernels, train
from vggp_tpu.features import CellIntegralFeature, OutputFeature
from vggp_tpu.models import exact, sgpr, svgp


def _two_task_1d(n=120, seed=0, noise=0.05):
    """y_0 = sin(5x) + ε, y_1 = 0.7·sin(5x) + 0.2 + ε — perfectly correlated
    latents with an affine offset, the canonical ICM transfer setup."""
    rng = np.random.default_rng(seed)
    x = np.sort(rng.uniform(0.0, 1.0, n))
    task = rng.integers(0, 2, n)
    f = np.sin(5.0 * x)
    y = np.where(task == 0, f, 0.7 * f + 0.2) + noise * rng.standard_normal(n)
    X = jnp.asarray(np.stack([x, task.astype(float)], axis=1))
    return X, jnp.asarray(y), x, task


def test_coregion_b_psd_and_gram_gather():
    rng = np.random.default_rng(3)
    p = {"w": jnp.asarray(rng.standard_normal((4, 2))),
         "kappa": jnp.asarray(rng.uniform(0.1, 1.0, 4))}
    B = np.asarray(kernels.coregion_b(p))
    np.testing.assert_allclose(B, B.T, atol=1e-12)
    assert np.linalg.eigvalsh(B).min() > 0.0
    np.testing.assert_allclose(np.asarray(kernels.coregion_b_diag(p)),
                               np.diag(B), rtol=1e-12)
    idx1 = np.array([0, 3, 1]); idx2 = np.array([2, 2, 0, 1])
    got = np.asarray(kernels.axis_gram(
        "coregion", p, jnp.asarray(idx1, jnp.float64), jnp.asarray(idx2, jnp.float64)))
    np.testing.assert_allclose(got, B[idx1[:, None], idx2[None, :]], rtol=1e-12)
    kd = np.asarray(kernels.axis_kdiag("coregion", p, jnp.asarray(idx1, jnp.float64)))
    np.testing.assert_allclose(kd, np.diag(B)[idx1], rtol=1e-12)


def test_axis_gram_matches_gram_1d_for_stationary():
    p = {"variance": jnp.asarray(1.3), "lengthscale": jnp.asarray(0.4)}
    x1 = jnp.linspace(0, 1, 7); x2 = jnp.linspace(0, 1, 5)
    np.testing.assert_allclose(
        np.asarray(kernels.axis_gram("matern32", p, x1, x2)),
        np.asarray(kernels.gram_1d("matern32", x1, x2, p["variance"], p["lengthscale"])),
        rtol=1e-12)


def test_exact_icm_mll_matches_dense_oracle():
    X, y, x, task = _two_task_1d(n=40)
    spec = exact.ExactGPSpec(kinds=("matern32", "coregion"), n_outputs=2)
    p = train.non_informative_init(spec.init_params(jnp.float64), X, y)
    got = float(exact.loss(spec, p, X, y))

    n = x.shape[0]
    K1 = np.asarray(kernels.gram_1d("matern32", X[:, 0], X[:, 0],
                                    p["axes"][0]["variance"], p["axes"][0]["lengthscale"]))
    B = np.asarray(kernels.coregion_b(p["axes"][1]))
    Ky = K1 * B[task[:, None], task[None, :]] + float(p["noise"]) * np.eye(n)
    L = np.linalg.cholesky(Ky)
    a = np.linalg.solve(L, np.asarray(y))
    want = 0.5 * a @ a + np.log(np.diag(L)).sum() + 0.5 * n * np.log(2 * np.pi)
    # (relative-jitter gap: spec.jitter=1e-6 on the repo side, none in the oracle)
    assert got == pytest.approx(want, rel=1e-4)


def test_exact_icm_posterior_matches_dense_oracle():
    X, y, x, task = _two_task_1d(n=40)
    spec = exact.ExactGPSpec(kinds=("matern32", "coregion"), n_outputs=2, jitter=1e-12)
    p = train.non_informative_init(spec.init_params(jnp.float64), X, y)
    xs = np.linspace(0.05, 0.95, 9)
    Xs = jnp.asarray(np.stack([xs, np.ones(9)], axis=1))  # query output 1
    g = exact.posterior(spec, p, X, y, Xs, full_cov=False)

    pax = p["axes"]
    K1 = lambda a, b: np.asarray(kernels.gram_1d(
        "matern32", jnp.asarray(a), jnp.asarray(b), pax[0]["variance"], pax[0]["lengthscale"]))
    B = np.asarray(kernels.coregion_b(pax[1]))
    n = x.shape[0]
    Ky = K1(x, x) * B[task[:, None], task[None, :]] + float(p["noise"]) * np.eye(n)
    Ksx = K1(xs, x) * B[1, task][None, :]
    alpha = np.linalg.solve(Ky, np.asarray(y))
    mean = Ksx @ alpha
    var = np.diag(K1(xs, xs)) * B[1, 1] - np.einsum(
        "ij,jk,ik->i", Ksx, np.linalg.inv(Ky), Ksx)
    np.testing.assert_allclose(np.asarray(g.mean), mean, rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(g.variance()), var, rtol=1e-4, atol=1e-8)


def test_sgpr_icm_elbo_matches_dense_titsias_oracle():
    X, y, x, task = _two_task_1d()
    n = x.shape[0]
    mesh = np.linspace(0.0, 1.0, 13)
    feat = CellIntegralFeature(mesh=mesh)
    out = OutputFeature(n_outputs=2)
    spec = sgpr.SGPRSpec(kinds=("matern12", "coregion"), features=(feat, out))
    p = train.non_informative_init(spec.init_params(jnp.float64), X, y)
    got = float(sgpr.elbo(spec, p, X, y))

    pax = p["axes"]
    Kuu1 = np.asarray(feat.Kuu("matern12", pax[0]))
    Kuf1 = np.asarray(feat.Kuf("matern12", pax[0], X[:, 0]))
    B = np.asarray(kernels.coregion_b(pax[1]))
    Kuu = np.kron(Kuu1, B)                       # kron convention: cell-major
    Kuf = np.einsum("an,bn->abn", Kuf1, B[:, task]).reshape(-1, n)
    noise = float(p["noise"])
    kff = (np.asarray(kernels.k_r("matern12", np.zeros(n),
                                  pax[0]["variance"], pax[0]["lengthscale"]))
           * B[task, task])
    m = Kuu.shape[0]
    L = np.linalg.cholesky(Kuu + 1e-10 * np.eye(m))
    A = np.linalg.solve(L, Kuf) / np.sqrt(noise)
    LB = np.linalg.cholesky(np.eye(m) + A @ A.T)
    c = np.linalg.solve(LB, A @ np.asarray(y)) / np.sqrt(noise)
    want = (-0.5 * n * np.log(2 * np.pi * noise) - np.log(np.diag(LB)).sum()
            - 0.5 * np.asarray(y) @ np.asarray(y) / noise + 0.5 * c @ c
            - (kff.sum() - noise * (A * A).sum()) / (2 * noise))
    assert got == pytest.approx(want, rel=1e-3)


def test_sgpr_icm_fit_recovers_percell_integrals_and_correlation():
    X, y, x, task = _two_task_1d()
    mesh = np.linspace(0.0, 1.0, 13)
    feat = CellIntegralFeature(mesh=mesh)
    out = OutputFeature(n_outputs=2)
    spec = sgpr.SGPRSpec(kinds=("matern12", "coregion"), features=(feat, out))
    p = train.non_informative_init(spec.init_params(jnp.float64), X, y)
    pf, hist = train.fit(lambda q: sgpr.loss(spec, q, X, y), p, 400, 0.05)
    assert float(hist["loss"][-1]) < float(hist["loss"][0])
    assert np.isfinite(np.asarray(hist["coregion_bdiag_2"])).all()

    st = sgpr.precompute(spec, pf, X, y)
    qv = sgpr.q_v_from_state(spec, pf, st, (feat, out))
    # analytic cell integrals of each output's field, kron order cell-major
    a, b = mesh[:-1], mesh[1:]
    i0 = (np.cos(5 * a) - np.cos(5 * b)) / 5.0
    i1 = 0.7 * i0 + 0.2 * (b - a)
    truth = np.stack([i0, i1], axis=1).reshape(-1)
    assert np.abs(np.asarray(qv.mean) - truth).max() < 0.02
    assert (np.asarray(qv.variance()) > 0).all()

    Bm = np.asarray(kernels.coregion_b(pf["axes"][1]))
    corr = Bm[0, 1] / np.sqrt(Bm[0, 0] * Bm[1, 1])
    assert corr > 0.9  # latents are perfectly correlated


def test_svgp_kron_icm_fit_and_anticorrelation():
    rng = np.random.default_rng(1)
    n = 800
    x1 = rng.uniform(0, 1, n); x2 = rng.uniform(0, 1, n)
    task = rng.integers(0, 2, n)
    f = np.sin(4 * x1) * np.cos(3 * x2)
    y = np.where(task == 0, f, -0.8 * f) + 0.05 * rng.standard_normal(n)
    X = jnp.asarray(np.stack([x1, x2, task.astype(float)], 1))
    Y = jnp.asarray(y)
    spec = svgp.SVGPSpec(
        kinds=("matern32", "matern32", "coregion"),
        features=(CellIntegralFeature(mesh=np.linspace(0, 1, 13)),
                  CellIntegralFeature(mesh=np.linspace(0, 1, 13)),
                  OutputFeature(2)),
        num_data=n, variational="kron")
    p = train.non_informative_init(spec.init_params(jnp.float64), X, Y)
    pf, hist = train.fit_minibatch(
        lambda q, xb, yb: svgp.loss(spec, q, xb, yb),
        p, X, Y, n_iters=500, batch_size=256, learning_rate=0.02)
    assert float(hist["loss"][-1]) < float(hist["loss"][0])
    xs = np.stack(np.meshgrid(np.linspace(0.1, 0.9, 8),
                              np.linspace(0.1, 0.9, 8), indexing="ij"),
                  -1).reshape(-1, 2)
    for t, scale in ((0, 1.0), (1, -0.8)):
        Xs = jnp.asarray(np.concatenate([xs, np.full((64, 1), float(t))], 1))
        g = svgp.posterior(spec, pf, Xs, full_cov=False)
        ft = scale * np.sin(4 * xs[:, 0]) * np.cos(3 * xs[:, 1])
        rmse = float(np.sqrt(np.mean((np.asarray(g.mean) - ft) ** 2)))
        assert rmse < 0.1
        assert (np.asarray(g.variance()) > 0).all()
    B = np.asarray(kernels.coregion_b(pf["axes"][2]))
    assert B[0, 1] / np.sqrt(B[0, 0] * B[1, 1]) < -0.5  # learned sign flip
    qv = svgp.q_v(spec, pf, (CellIntegralFeature(mesh=np.linspace(0, 1, 9)),
                             CellIntegralFeature(mesh=np.linspace(0, 1, 9)),
                             OutputFeature(2)))
    assert np.isfinite(np.asarray(qv.mean)).all()
    assert (np.asarray(qv.variance()) > 0).all()


def test_cross_output_transfer_beats_independent_fit():
    """Output 1 is observed at only 8 points; the joint ICM model must
    predict it better than a single-output exact GP on those 8 points."""
    rng = np.random.default_rng(7)
    n0 = 80
    x0 = np.sort(rng.uniform(0, 1, n0))
    x1 = np.sort(rng.uniform(0, 1, 8))
    f = lambda t: np.sin(5 * t)
    y0 = f(x0) + 0.05 * rng.standard_normal(n0)
    y1 = 0.7 * f(x1) + 0.2 + 0.05 * rng.standard_normal(8)
    X = jnp.asarray(np.stack([np.concatenate([x0, x1]),
                              np.concatenate([np.zeros(n0), np.ones(8)])], 1))
    Y = jnp.asarray(np.concatenate([y0, y1]))

    spec_j = exact.ExactGPSpec(kinds=("matern32", "coregion"), n_outputs=2)
    pj = train.non_informative_init(spec_j.init_params(jnp.float64), X, Y)
    pj, _ = train.fit(lambda q: exact.loss(spec_j, q, X, Y), pj, 300, 0.05)

    spec_i = exact.ExactGPSpec(kinds=("matern32",))
    Xi = jnp.asarray(x1); Yi = jnp.asarray(y1)
    pi = train.non_informative_init(spec_i.init_params(jnp.float64), Xi, Yi)
    pi, _ = train.fit(lambda q: exact.loss(spec_i, q, Xi, Yi), pi, 300, 0.05)

    xs = np.linspace(0.02, 0.98, 60)
    truth = 0.7 * f(xs) + 0.2
    Xs = jnp.asarray(np.stack([xs, np.ones(60)], 1))
    gj = exact.posterior(spec_j, pj, X, Y, Xs, full_cov=False)
    gi = exact.posterior(spec_i, pi, Xi, Yi, jnp.asarray(xs), full_cov=False)
    rmse_j = float(np.sqrt(np.mean((np.asarray(gj.mean) - truth) ** 2)))
    rmse_i = float(np.sqrt(np.mean((np.asarray(gi.mean) - truth) ** 2)))
    assert rmse_j < rmse_i  # the shared latent transfers across outputs


def test_output_feature_validation():
    with pytest.raises(ValueError):
        OutputFeature(n_outputs=2, rank=3)
    with pytest.raises(ValueError):
        OutputFeature(n_outputs=0)
    f = OutputFeature(n_outputs=2)
    p = f.init_params(jnp.float64)
    with pytest.raises(ValueError):
        f.Kuu("matern12", p)
    with pytest.raises(ValueError):
        f.Kvu("coregion", p, OutputFeature(n_outputs=3))
    with pytest.raises(ValueError):
        f.Kvu("coregion", p, CellIntegralFeature(mesh=np.linspace(0, 1, 5)))


def test_grad_and_sampling_heads_reject_coregion_axis():
    from vggp_tpu import sampling

    X, y, _, _ = _two_task_1d(n=30)
    spec = exact.ExactGPSpec(kinds=("matern32", "coregion"), n_outputs=2)
    p = spec.init_params(jnp.float64)
    with pytest.raises(ValueError):
        exact.posterior_grad(spec, p, X, y, X, axis=1)
    sspec = svgp.SVGPSpec(
        kinds=("matern12", "coregion"),
        features=(CellIntegralFeature(mesh=np.linspace(0, 1, 5)), OutputFeature(2)),
        num_data=30, variational="kron")
    sp = sspec.init_params(jnp.float64)
    with pytest.raises(NotImplementedError):
        sampling.prior_paths(jax.random.PRNGKey(0), sspec, sp, 16)


def test_grad_head_along_continuous_axis_with_coregion_present():
    """∂f/∂x per output: the non-derivative coregion axis contributes
    B[p, p] to the gradient variance; pinned against forward differences
    of the posterior mean."""
    X, y, x, task = _two_task_1d(n=60)
    spec = exact.ExactGPSpec(kinds=("matern52", "coregion"), n_outputs=2)
    p = train.non_informative_init(spec.init_params(jnp.float64), X, y)
    p, _ = train.fit(lambda q: exact.loss(spec, q, X, y), p, 200, 0.05)
    xs = np.linspace(0.2, 0.8, 11)
    for t in (0, 1):
        Xs = jnp.asarray(np.stack([xs, np.full(11, float(t))], 1))
        g = exact.posterior_grad(spec, p, X, y, Xs, axis=0, full_cov=False)
        eps = 1e-4
        Xp = jnp.asarray(np.stack([xs + eps, np.full(11, float(t))], 1))
        Xm = jnp.asarray(np.stack([xs - eps, np.full(11, float(t))], 1))
        mp = exact.posterior(spec, p, X, y, Xp, full_cov=False).mean
        mm = exact.posterior(spec, p, X, y, Xm, full_cov=False).mean
        fd = (np.asarray(mp) - np.asarray(mm)) / (2 * eps)
        np.testing.assert_allclose(np.asarray(g.mean), fd, rtol=1e-3, atol=1e-5)
        assert (np.asarray(g.variance()) > 0).all()


# --------------------------------------------------------------------------- #
# per-output heteroscedastic noise (per-mission noise levels)
# --------------------------------------------------------------------------- #

def _two_task_hetero(n=100, seed=0):
    rng = np.random.default_rng(seed)
    x = np.sort(rng.uniform(0.0, 1.0, n))
    task = rng.integers(0, 2, n)
    f = np.sin(5.0 * x)
    true_sd = np.where(task == 0, 0.02, 0.3)
    y = np.where(task == 0, f, 0.7 * f) + true_sd * rng.standard_normal(n)
    X = jnp.asarray(np.stack([x, task.astype(float)], axis=1))
    return X, jnp.asarray(y), x, task


def test_hetero_exact_mll_matches_dense_oracle():
    X, y, x, task = _two_task_hetero()
    n = x.shape[0]
    spec = exact.ExactGPSpec(kinds=("matern32", "coregion"), n_outputs=2,
                             per_output_noise=True)
    p = train.non_informative_init(spec.init_params(jnp.float64), X, y)
    assert p["noise"].shape == (2,)
    p["noise"] = jnp.asarray([0.01, 0.05])
    got = float(exact.loss(spec, p, X, y))
    K1 = np.asarray(kernels.gram_1d("matern32", X[:, 0], X[:, 0],
                                    p["axes"][0]["variance"], p["axes"][0]["lengthscale"]))
    B = np.asarray(kernels.coregion_b(p["axes"][1]))
    D = np.asarray(p["noise"])[task]
    Ky = K1 * B[task[:, None], task[None, :]] + np.diag(D)
    L = np.linalg.cholesky(Ky)
    a = np.linalg.solve(L, np.asarray(y))
    want = 0.5 * a @ a + np.log(np.diag(L)).sum() + 0.5 * n * np.log(2 * np.pi)
    assert got == pytest.approx(want, rel=1e-4)


def test_hetero_sgpr_elbo_matches_dense_titsias_oracle():
    X, y, x, task = _two_task_hetero()
    n = x.shape[0]
    mesh = np.linspace(0.0, 1.0, 13)
    feat = CellIntegralFeature(mesh=mesh)
    out = OutputFeature(n_outputs=2)
    spec = sgpr.SGPRSpec(kinds=("matern12", "coregion"), features=(feat, out),
                         per_output_noise=True)
    p = train.non_informative_init(spec.init_params(jnp.float64), X, y)
    p["noise"] = jnp.asarray([0.01, 0.05])
    got = float(sgpr.elbo(spec, p, X, y))
    pax = p["axes"]
    Kuu1 = np.asarray(feat.Kuu("matern12", pax[0]))
    Kuf1 = np.asarray(feat.Kuf("matern12", pax[0], X[:, 0]))
    B = np.asarray(kernels.coregion_b(pax[1]))
    Kuu = np.kron(Kuu1, B)
    Kuf = np.einsum("an,bn->abn", Kuf1, B[:, task]).reshape(-1, n)
    D = np.asarray(p["noise"])[task]
    kff = (np.asarray(kernels.k_r("matern12", np.zeros(n),
                                  pax[0]["variance"], pax[0]["lengthscale"]))
           * B[task, task])
    m = Kuu.shape[0]
    L = np.linalg.cholesky(Kuu + 1e-10 * np.eye(m))
    A = np.linalg.solve(L, Kuf) / np.sqrt(D)
    LB = np.linalg.cholesky(np.eye(m) + A @ A.T)
    c = np.linalg.solve(LB, A @ (np.asarray(y) / np.sqrt(D)))
    want = (-0.5 * np.sum(np.log(2 * np.pi * D)) - np.log(np.diag(LB)).sum()
            - 0.5 * np.sum(np.asarray(y) ** 2 / D) + 0.5 * c @ c
            - 0.5 * ((kff / D).sum() - (A * A).sum()))
    assert got == pytest.approx(want, rel=1e-3)


def test_hetero_noise_recovery_and_predictive_inflation():
    X, y, x, task = _two_task_hetero()
    spec = exact.ExactGPSpec(kinds=("matern32", "coregion"), n_outputs=2,
                             per_output_noise=True)
    p0 = train.non_informative_init(spec.init_params(jnp.float64), X, y)
    pf, _ = train.fit(lambda q: exact.loss(spec, q, X, y), p0, 500, 0.05)
    sd = np.sqrt(np.asarray(pf["noise"]))
    assert sd[0] == pytest.approx(0.02, abs=0.02)
    assert sd[1] == pytest.approx(0.30, abs=0.10)
    # predictive variance adds exactly the queried output's noise
    xs = np.linspace(0.0, 1.0, 10)
    for t in (0, 1):
        Xs = jnp.asarray(np.stack([xs, np.full(10, float(t))], 1))
        gl = exact.posterior(spec, pf, X, y, Xs, full_cov=False)
        gp = exact.posterior_predictive(spec, pf, X, y, Xs, full_cov=False)
        gap = np.asarray(gp.variance()) - np.asarray(gl.variance())
        np.testing.assert_allclose(gap, float(pf["noise"][t]), rtol=1e-8)
    # full-cov predictive puts the per-output noise on the diagonal only
    Xs = jnp.asarray(np.stack([xs, np.concatenate([np.zeros(5), np.ones(5)])], 1))
    gl = exact.posterior(spec, pf, X, y, Xs, full_cov=True)
    gp = exact.posterior_predictive(spec, pf, X, y, Xs, full_cov=True)
    dcov = np.asarray(gp.cov) - np.asarray(gl.cov)
    want = np.diag(np.asarray(pf["noise"])[np.array([0] * 5 + [1] * 5)])
    np.testing.assert_allclose(dcov, want, atol=1e-10)


def test_hetero_svgp_elbo_uses_per_output_noise():
    X, y, x, task = _two_task_hetero()
    feat = CellIntegralFeature(mesh=np.linspace(0, 1, 9))
    out = OutputFeature(n_outputs=2)
    spec = svgp.SVGPSpec(kinds=("matern12", "coregion"), features=(feat, out),
                         num_data=x.shape[0], variational="kron",
                         per_output_noise=True)
    p = train.non_informative_init(spec.init_params(jnp.float64), X, y)
    assert p["noise"].shape == (2,)
    e_equal = float(svgp.elbo(spec, dict(p, noise=jnp.asarray([0.05, 0.05])), X, y))
    p_sc = dict(p, noise=jnp.asarray(0.05))
    e_scalar = float(svgp.elbo(spec, p_sc, X, y))
    assert e_equal == pytest.approx(e_scalar, rel=1e-10)  # vector≡scalar when equal
    # and the per-output predictive adds the right noise
    pf, _ = train.fit_minibatch(lambda q, xb, yb: svgp.loss(spec, q, xb, yb),
                                p, X, y, n_iters=150, batch_size=64,
                                learning_rate=0.05)
    xs = np.linspace(0, 1, 7)
    for t in (0, 1):
        Xs = jnp.asarray(np.stack([xs, np.full(7, float(t))], 1))
        gl = svgp.posterior(spec, pf, Xs, full_cov=False)
        gp = svgp.posterior_predictive(spec, pf, Xs, full_cov=False)
        gap = np.asarray(gp.variance()) - np.asarray(gl.variance())
        np.testing.assert_allclose(gap, float(pf["noise"][t]), rtol=1e-6)


def test_vector_noise_without_coregion_raises():
    from vggp_tpu.models import common as mcommon

    spec = exact.ExactGPSpec(kinds=("matern32",))
    p = spec.init_params(jnp.float64)
    p["noise"] = jnp.asarray([0.1, 0.2])
    with pytest.raises(ValueError):
        mcommon.obs_noise(spec, p, jnp.linspace(0, 1, 5))


# --------------------------------------------------------------------------- #
# ICM pathwise sampling (chol(B)-mixed spectral path bundles)
# --------------------------------------------------------------------------- #

def test_icm_prior_paths_realize_b_kron_k():
    """MC covariance of the mixed bundles must be B ⊗ K (both the function
    paths and the exact inducing functionals)."""
    from vggp_tpu import sampling

    feat = CellIntegralFeature(mesh=np.linspace(0, 1, 7))
    out = OutputFeature(2)
    spec = svgp.SVGPSpec(kinds=("matern32", "coregion"), features=(feat, out),
                         num_data=10, variational="kron")
    p = spec.init_params(jnp.float64)
    p["axes"][0]["lengthscale"] = jnp.asarray(0.3)
    p["axes"][0]["variance"] = jnp.asarray(1.5)
    xs = np.array([0.2, 0.5, 0.9])
    X = jnp.asarray(np.array(
        [[x, t] for t in (0.0, 1.0) for x in xs]))  # tasks-major
    S, F = 2000, 2048  # MC err ~2·√(1+K²)/√S ≈ 4% of scale, bound at 8%

    def draw(k):
        om, ph, amp, LB, co = sampling.prior_paths_multioutput(k, spec, p, F)
        return sampling.eval_path_multioutput(om, ph, amp, LB, co, X)

    fs = np.asarray(jax.vmap(draw)(jax.random.split(jax.random.PRNGKey(1), S)))
    C = np.cov(fs.T)
    K1 = np.asarray(kernels.gram_1d("matern32", jnp.asarray(xs), jnp.asarray(xs),
                                    p["axes"][0]["variance"],
                                    p["axes"][0]["lengthscale"]))
    B = np.asarray(kernels.coregion_b(p["axes"][1]))
    Ktrue = np.kron(B, K1)
    assert np.abs(C - Ktrue).max() < 0.08 * np.abs(Ktrue).max()

    def draw_u(k):
        om, ph, amp, LB, co = sampling.prior_paths_multioutput(k, spec, p, F)
        return sampling.prior_inducing_sample_multioutput(
            om, ph, amp, LB, co, spec, p).reshape(-1)

    us = np.asarray(jax.vmap(draw_u)(jax.random.split(jax.random.PRNGKey(2), S)))
    Cu = np.cov(us.T)
    Kuu_true = np.kron(np.asarray(feat.Kuu("matern32", p["axes"][0])), B)
    assert np.abs(Cu - Kuu_true).max() < 0.08 * np.abs(Kuu_true).max()


def test_icm_pathwise_collapsed_matches_posterior_moments():
    from vggp_tpu import sampling

    X, y, x, task = _two_task_1d()
    feat = CellIntegralFeature(mesh=np.linspace(0, 1, 11))
    out = OutputFeature(2)
    spec = sgpr.SGPRSpec(kinds=("matern32", "coregion"), features=(feat, out))
    p = train.non_informative_init(spec.init_params(jnp.float64), X, y)
    p, _ = train.fit(lambda q: sgpr.loss(spec, q, X, y), p, 300, 0.05)
    xq = jnp.asarray(np.stack([np.linspace(0.05, 0.95, 12),
                               np.concatenate([np.zeros(6), np.ones(6)])], 1))
    draws = sampling.pathwise_posterior_collapsed(
        spec, p, jax.random.PRNGKey(3), X, y, xq,
        n_samples=512, n_features=1024)
    st = sgpr.precompute(spec, p, X, y)
    g = sgpr.posterior_from_state(spec, p, st, xq)
    sd = float(np.sqrt(np.asarray(g.variance()).max()))
    assert np.abs(np.asarray(draws).mean(0) - np.asarray(g.mean)).max() < 0.3 * sd
    rel = (np.abs(np.asarray(draws).var(0) - np.asarray(g.variance())).max()
           / np.asarray(g.variance()).max())
    assert rel < 0.25  # MC tolerance at S=512


def test_icm_pathwise_svgp_runs_and_is_coherent():
    """Uncollapsed SVGP ICM draws: finite, and the across-output draws are
    positively correlated when the fitted B says so."""
    from vggp_tpu import sampling

    X, y, x, task = _two_task_1d()
    feat = CellIntegralFeature(mesh=np.linspace(0, 1, 9))
    out = OutputFeature(2)
    spec = svgp.SVGPSpec(kinds=("matern32", "coregion"), features=(feat, out),
                         num_data=x.shape[0], variational="kron")
    p = train.non_informative_init(spec.init_params(jnp.float64), X, y)
    p, _ = train.fit_minibatch(lambda q, xb, yb: svgp.loss(spec, q, xb, yb),
                               p, X, y, n_iters=300, batch_size=64,
                               learning_rate=0.05)
    xs = np.linspace(0.1, 0.9, 8)
    xq = jnp.asarray(np.stack([np.concatenate([xs, xs]),
                               np.concatenate([np.zeros(8), np.ones(8)])], 1))
    draws = np.asarray(sampling.pathwise_posterior(
        spec, p, jax.random.PRNGKey(5), xq, n_samples=64, n_features=512))
    assert np.isfinite(draws).all()
    # residual (draw − mean) correlation across outputs at the same x should
    # be positive: the latents are shared
    g = svgp.posterior(spec, p, xq, full_cov=False)
    r = draws - np.asarray(g.mean)[None, :]
    corr = np.mean([np.corrcoef(r[:, i], r[:, 8 + i])[0, 1] for i in range(8)])
    assert corr > 0.2


def test_streamed_multimission_equals_batch_icm_sgpr():
    """Two-mission streamed assimilation (per-output noise, interleaved
    passes) must land on the batch collapsed-SGPR posterior exactly."""
    from vggp_tpu import streaming

    X, y, x, task = _two_task_hetero(n=120)
    feat = CellIntegralFeature(mesh=np.linspace(0, 1, 9))
    out = OutputFeature(2)
    vspec = svgp.SVGPSpec(kinds=("matern32", "coregion"), features=(feat, out),
                          num_data=120, variational="full",
                          per_output_noise=True)
    cspec = sgpr.SGPRSpec(kinds=("matern32", "coregion"), features=(feat, out),
                          per_output_noise=True)
    p = vspec.init_params(jnp.float64)
    p["noise"] = jnp.asarray([0.0004, 0.09])
    p["axes"][0]["lengthscale"] = jnp.asarray(0.3)
    p["axes"][0]["variance"] = jnp.asarray(1.2)

    state = streaming.init_state(vspec, jnp.float64)
    for lo in range(0, 120, 40):  # interleaved-mission chunks
        state = streaming.assimilate(vspec, p, state,
                                     X[lo:lo + 40], y[lo:lo + 40])
    pq = streaming.to_params(vspec, p, state)

    xs = np.linspace(0.0, 1.0, 17)
    Xq = jnp.asarray(np.stack([np.concatenate([xs, xs]),
                               np.concatenate([np.zeros(17), np.ones(17)])], 1))
    got = svgp.posterior(vspec, pq, Xq, full_cov=False)
    st = sgpr.precompute(cspec, p, X, y)
    want = sgpr.posterior_from_state(cspec, p, st, Xq)
    np.testing.assert_allclose(np.asarray(got.mean), np.asarray(want.mean),
                               atol=1e-8)
    np.testing.assert_allclose(np.asarray(got.variance()),
                               np.asarray(want.variance()), rtol=1e-6)


def test_invalid_output_index_fails_loudly():
    """VERDICT r2 weak #6: an out-of-range or non-integral output column must
    NOT silently clip in the gather — it poisons the result with NaN."""
    rng = np.random.default_rng(3)
    p = {"w": jnp.asarray(rng.standard_normal((2, 1))),
         "kappa": jnp.asarray(rng.uniform(0.1, 1.0, 2))}
    ok = jnp.asarray([0.0, 1.0])
    bad_range = jnp.asarray([0.0, 2.0])     # P = 2 → index 2 out of range
    bad_frac = jnp.asarray([0.0, 0.5])      # non-integral coordinate
    neg = jnp.asarray([-1.0, 1.0])

    g = np.asarray(kernels.axis_gram("coregion", p, ok, ok))
    assert np.isfinite(g).all()
    for bad, ibad in ((bad_range, 1), (bad_frac, 1), (neg, 0)):
        iok = 1 - ibad
        g = np.asarray(kernels.axis_gram("coregion", p, ok, bad))
        assert np.isnan(g[:, ibad]).all() and np.isfinite(g[:, iok]).all()
        kd = np.asarray(kernels.axis_kdiag("coregion", p, bad))
        assert np.isnan(kd[ibad]) and np.isfinite(kd[iok])

    feat = OutputFeature(n_outputs=2)
    kuf = np.asarray(feat.Kuf("coregion", p, bad_range))
    assert np.isnan(kuf[:, 1]).all() and np.isfinite(kuf[:, 0]).all()

    # end-to-end: a model fed a bad output column produces a NaN loss,
    # not a silently-wrong finite one
    X, y, _, _ = _two_task_1d(n=30)
    Xbad = X.at[0, 1].set(5.0)
    spec = sgpr.SGPRSpec(kinds=("matern32", "coregion"),
                         features=(CellIntegralFeature.from_lims(6, 0.0, 1.0),
                                   OutputFeature(n_outputs=2)))
    params = spec.init_params(jnp.float64)
    assert np.isfinite(float(sgpr.loss(spec, params, X, y)))
    assert np.isnan(float(sgpr.loss(spec, params, Xbad, y)))


def test_valid_output_index_gradients_stay_finite():
    """The NaN-poison where() must not leak NaN into gradients on valid data."""
    X, y, _, _ = _two_task_1d(n=30)
    spec = sgpr.SGPRSpec(kinds=("matern32", "coregion"),
                         features=(CellIntegralFeature.from_lims(6, 0.0, 1.0),
                                   OutputFeature(n_outputs=2)))
    params = spec.init_params(jnp.float64)
    g = jax.grad(lambda q: sgpr.loss(spec, q, X, y))(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
