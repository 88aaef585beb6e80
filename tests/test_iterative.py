"""Matrix-free CG posterior means (models.iterative) and structured matvecs."""

import numpy as np
import jax.numpy as jnp
import pytest

from vggp_tpu import features
from vggp_tpu.models import iterative, sgpr
from vggp_tpu.ops.cg import cg_solve

P = {"variance": jnp.asarray(1.2), "lengthscale": jnp.asarray(0.25)}


def _data(n=80, seed=0):
    rng = np.random.default_rng(seed)
    x = np.sort(rng.uniform(size=n))
    y = np.sin(7 * x) + 0.05 * rng.standard_normal(n)
    return jnp.asarray(x), jnp.asarray(y)


def test_cg_solve_matches_dense(rng):
    a = rng.normal(size=(12, 12))
    A = a @ a.T + 12 * np.eye(12)
    b = rng.normal(size=12)
    x = np.asarray(cg_solve(lambda v: jnp.asarray(A) @ v, jnp.asarray(b), tol=1e-12))
    np.testing.assert_allclose(x, np.linalg.solve(A, b), rtol=1e-8, atol=1e-10)


@pytest.mark.parametrize("make", [
    lambda: features.CellIntegralFeature.from_lims(40, 0.0, 1.0),
    lambda: features.B1SplineFeature(np.linspace(0.0, 1.0, 40)),
])
def test_kuu_matvec_matches_dense(make, rng):
    feat = make()
    v = jnp.asarray(rng.normal(size=(feat.m, 3)))
    dense = np.asarray(feat.Kuu("matern12", P)) @ np.asarray(v)
    fast = np.asarray(feat.kuu_matvec("matern12", P, v))
    np.testing.assert_allclose(fast, dense, rtol=1e-9, atol=1e-11)


@pytest.mark.parametrize("make", [
    lambda: features.CellIntegralFeature.from_lims(48, 0.0, 1.0),
    lambda: features.B1SplineFeature(np.linspace(0.0, 1.0, 48)),
])
def test_qv_and_posterior_mean_cg_match_dense_pipeline(make):
    feat = make()
    X, y = _data()
    spec = sgpr.SGPRSpec(kinds=("matern12",), features=(feat,), jitter=1e-12)
    p = {"axes": ({**P, **feat.init_params(jnp.float64)},), "noise": jnp.asarray(0.01)}
    grids = (features.CellIntegralFeature.from_lims(10, 0.0, 1.0),)
    want_qv = np.asarray(sgpr.q_v(spec, p, X, y, grids, full_cov=False).mean)
    got_qv = np.asarray(iterative.q_v_mean_cg(spec, p, X, y, grids, tol=1e-12))
    np.testing.assert_allclose(got_qv, want_qv, rtol=1e-6, atol=1e-9)
    xs = jnp.asarray(np.linspace(0.02, 0.98, 33))
    want_f = np.asarray(sgpr.posterior(spec, p, X, y, xs, full_cov=False).mean)
    got_f = np.asarray(iterative.posterior_mean_cg(spec, p, X, y, xs, tol=1e-12))
    np.testing.assert_allclose(got_f, want_f, rtol=1e-6, atol=1e-9)


def test_cg_scales_past_dense_range():
    """m = 16384 cells: the dense pipeline would factor a 16384² Kuu; the
    matrix-free path runs in O(m log m) matvecs and stays finite/sane."""
    feat = features.CellIntegralFeature.from_lims(16384, 0.0, 1.0)
    X, y = _data(n=120)
    spec = sgpr.SGPRSpec(kinds=("matern12",), features=(feat,))
    p = {"axes": (dict(P),), "noise": jnp.asarray(0.05)}
    grids = (features.CellIntegralFeature.from_lims(20, 0.0, 1.0),)
    mean = np.asarray(iterative.q_v_mean_cg(spec, p, X, y, grids, tol=1e-8,
                                            maxiter=3000))
    assert mean.shape == (20,)
    assert np.all(np.isfinite(mean))
    # cell means of the posterior should roughly track the cell means of sin(7x)
    cell_truth = np.array([
        (np.cos(7 * a) - np.cos(7 * b)) / 7.0
        for a, b in zip(grids[0].mesh[:-1], grids[0].mesh[1:])
    ])
    assert np.corrcoef(mean, cell_truth)[0, 1] > 0.99


@pytest.mark.parametrize("make", [
    lambda: features.CellIntegralFeature.from_lims(40, 0.0, 1.0),
    lambda: features.B1SplineFeature(np.linspace(0.0, 1.0, 40)),
])
def test_kuu_diag_matches_dense(make):
    feat = make()
    dense = np.diagonal(np.asarray(feat.Kuu("matern12", P)))
    fast = np.asarray(feat.kuu_diag("matern12", P))
    np.testing.assert_allclose(fast, dense, rtol=1e-12)


def test_b1_preconditioner_converges_fast_when_stiff():
    """Regression: Jacobi must use the TRUE diagonal. For the B1-spline RKHS
    Gram at ℓ/δ ≫ 1 the interior row sums cancel to ~δ/ℓ while the diagonal
    is ~ℓ/δ; the old Kuu@1 row-sum proxy made the 'preconditioned' system
    (ℓ/δ)² worse-conditioned and CG could not reach the dense answer in any
    small iteration budget."""
    m = 400
    feat = features.B1SplineFeature(np.linspace(0.0, 1.0, m))   # δ = 1/399
    stiff = {"variance": jnp.asarray(1.0), "lengthscale": jnp.asarray(0.5)}
    X, y = _data(n=100, seed=3)
    spec = sgpr.SGPRSpec(kinds=("matern12",), features=(feat,), jitter=1e-12)
    p = {"axes": (dict(stiff),), "noise": jnp.asarray(0.01)}
    grids = (features.CellIntegralFeature.from_lims(10, 0.0, 1.0),)
    want = np.asarray(sgpr.q_v(spec, p, X, y, grids, full_cov=False).mean)
    got = np.asarray(iterative.q_v_mean_cg(spec, p, X, y, grids, tol=1e-10,
                                           maxiter=80))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_cg_breakdown_returns_finite_iterate():
    """pᵀAp ≤ 0 (numerically indefinite A) must exit with the best iterate,
    not substitute a tiny denominator (alpha → 1/tiny poisons x with inf)."""
    b = jnp.asarray(np.ones(5))
    x, iters, rel = cg_solve(lambda v: -v, b, maxiter=50, return_info=True)
    assert np.all(np.isfinite(np.asarray(x)))
    assert int(iters) == 1


def test_cg_f32_default_tol_terminates_early():
    """The dtype-aware default tol must be reachable in f32 — a fixed 1e-8
    target sits below the f32 stagnation floor and burns all maxiter."""
    rng = np.random.default_rng(5)
    a = rng.normal(size=(60, 60))
    A = jnp.asarray((a @ a.T + 60 * np.eye(60)), jnp.float32)
    b = jnp.asarray(rng.normal(size=60), jnp.float32)
    x, iters, rel = cg_solve(lambda v: A @ v, b, maxiter=1000,
                             return_info=True)
    assert int(iters) < 200, int(iters)
    assert float(rel) < 1e-4
    np.testing.assert_allclose(
        np.asarray(x), np.linalg.solve(np.asarray(A, np.float64),
                                       np.asarray(b, np.float64)),
        rtol=2e-3, atol=2e-4)


def test_2d_kron_cg_matches_dense_pipeline():
    """ndim=2: the kron-structured CG means must equal the dense collapsed
    pipeline (posterior mean AND gridded product mean) — the joint (m, n)
    Khatri-Rao block and the (m, m) B are never materialized."""
    rng = np.random.default_rng(7)
    X = jnp.asarray(rng.random((90, 2)))
    y = jnp.asarray(np.sin(5 * np.asarray(X[:, 0])) * np.asarray(X[:, 1])
                    + 0.05 * rng.standard_normal(90))
    feats = (features.CellIntegralFeature.from_lims(12, 0.0, 1.0),
             features.B1SplineFeature(np.linspace(0.0, 1.0, 11)))
    spec = sgpr.SGPRSpec(kinds=("matern12", "matern12"), features=feats,
                         jitter=1e-12)
    p = {"axes": (dict(P), dict(P)), "noise": jnp.asarray(0.02)}
    grids = (features.CellIntegralFeature.from_lims(6, 0.0, 1.0),
             features.CellIntegralFeature.from_lims(5, 0.0, 1.0))
    want_qv = np.asarray(sgpr.q_v(spec, p, X, y, grids, full_cov=False).mean)
    got_qv = np.asarray(iterative.q_v_mean_cg(spec, p, X, y, grids, tol=1e-12,
                                              maxiter=3000))
    np.testing.assert_allclose(got_qv, want_qv, rtol=1e-6, atol=1e-9)
    xs = jnp.asarray(rng.random((17, 2)))
    want_f = np.asarray(sgpr.posterior(spec, p, X, y, xs, full_cov=False).mean)
    got_f = np.asarray(iterative.posterior_mean_cg(spec, p, X, y, xs,
                                                   tol=1e-12, maxiter=3000))
    np.testing.assert_allclose(got_f, want_f, rtol=1e-6, atol=1e-9)


def test_2d_cg_scales_past_dense_range():
    """m = 256x256 = 65536 inducing cells: dense B would be 65536² (34 GB);
    the matrix-free path runs and its gridded means track the field."""
    rng = np.random.default_rng(8)
    X = jnp.asarray(rng.random((200, 2)))
    y = jnp.asarray(np.sin(4 * np.asarray(X[:, 0]))
                    * np.cos(3 * np.asarray(X[:, 1]))
                    + 0.02 * rng.standard_normal(200))
    feats = (features.CellIntegralFeature.from_lims(256, 0.0, 1.0),
             features.CellIntegralFeature.from_lims(256, 0.0, 1.0))
    spec = sgpr.SGPRSpec(kinds=("matern12", "matern12"), features=feats)
    p = {"axes": (dict(P), dict(P)), "noise": jnp.asarray(0.05)}
    grids = (features.CellIntegralFeature.from_lims(8, 0.0, 1.0),
             features.CellIntegralFeature.from_lims(8, 0.0, 1.0))
    mean = np.asarray(iterative.q_v_mean_cg(spec, p, X, y, grids, tol=1e-8,
                                            maxiter=2000))
    assert mean.shape == (64,)
    assert np.all(np.isfinite(mean))
    i1 = np.array([(np.cos(4 * a) - np.cos(4 * b)) / 4.0
                   for a, b in zip(grids[0].mesh[:-1], grids[0].mesh[1:])])
    i2 = np.array([(np.sin(3 * b) - np.sin(3 * a)) / 3.0
                   for a, b in zip(grids[1].mesh[:-1], grids[1].mesh[1:])])
    truth = np.kron(i1, i2)
    assert np.corrcoef(mean, truth)[0, 1] > 0.98


def _mo_data(n=90, seed=5, noise=0.05):
    rng = np.random.default_rng(seed)
    x = np.sort(rng.uniform(0.0, 1.0, n))
    task = rng.integers(0, 2, n)
    f = np.sin(5.0 * x)
    y = np.where(task == 0, f, 0.6 * f + 0.3) + noise * rng.standard_normal(n)
    return (jnp.asarray(np.stack([x, task.astype(float)], axis=1)),
            jnp.asarray(y))


def _mo_spec(m=24, **kw):
    feats = (features.CellIntegralFeature.from_lims(m, 0.0, 1.0),
             features.OutputFeature(n_outputs=2))
    return sgpr.SGPRSpec(kinds=("matern12", "coregion"), features=feats,
                         jitter=1e-12, **kw)


def test_coregion_cg_qv_and_posterior_match_dense_pipeline():
    """Multi-output (ICM) spec through the matrix-free mean heads: the
    coregion axis's dense (P, P) matvec is its structured form at P ≪ m
    (VERDICT r4 item 5 — the exclusion had no mathematical reason)."""
    X, y = _mo_data()
    spec = _mo_spec()
    p = spec.init_params(jnp.float64)
    grids = (features.CellIntegralFeature.from_lims(7, 0.0, 1.0),
             features.OutputFeature(n_outputs=2))
    want = np.asarray(sgpr.q_v(spec, p, X, y, grids, full_cov=False).mean)
    got = np.asarray(iterative.q_v_mean_cg(spec, p, X, y, grids, tol=1e-12,
                                           maxiter=4000))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-9)
    want_f = np.asarray(sgpr.posterior(spec, p, X, y, X, full_cov=False).mean)
    got_f = np.asarray(iterative.posterior_mean_cg(spec, p, X, y, X,
                                                   tol=1e-12, maxiter=4000))
    np.testing.assert_allclose(got_f, want_f, rtol=1e-6, atol=1e-9)


def test_coregion_cg_per_output_noise_and_mean_match_dense():
    """Heteroscedastic per-output noise + learned per-output mean through
    the weighted CG system (G = c·Kuu + Kuf R Kufᵀ) must reproduce the
    dense factored pipeline, which routes through common.obs_noise /
    mean_fn (ADVICE r4: iterative heads previously ignored both)."""
    X, y = _mo_data(seed=9)
    spec = _mo_spec(per_output_noise=True, learn_mean=True)
    p = spec.init_params(jnp.float64)
    p["noise"] = jnp.asarray([0.02, 0.09], jnp.float64)
    p["mean"] = jnp.asarray([0.4, -0.2], jnp.float64)
    grids = (features.CellIntegralFeature.from_lims(6, 0.0, 1.0),
             features.OutputFeature(n_outputs=2))
    want = np.asarray(sgpr.q_v(spec, p, X, y, grids, full_cov=False).mean)
    got = np.asarray(iterative.q_v_mean_cg(spec, p, X, y, grids, tol=1e-13,
                                           maxiter=6000))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-9)
    want_f = np.asarray(sgpr.posterior(spec, p, X, y, X, full_cov=False).mean)
    got_f = np.asarray(iterative.posterior_mean_cg(spec, p, X, y, X,
                                                   tol=1e-13, maxiter=6000))
    np.testing.assert_allclose(got_f, want_f, rtol=1e-6, atol=1e-9)


def test_scalar_mean_fn_cg_matches_dense():
    """learn_mean on a plain 1D spec: solve_w conditions on the residual and
    the heads add m / ∫m back (regression for the r4 advisor finding)."""
    X, y = _data()
    feat = features.CellIntegralFeature.from_lims(32, 0.0, 1.0)
    spec = sgpr.SGPRSpec(kinds=("matern12",), features=(feat,),
                         jitter=1e-12, learn_mean=True)
    p = {"axes": ({**P, **feat.init_params(jnp.float64)},),
         "noise": jnp.asarray(0.01), "mean": jnp.asarray(3.0)}
    grids = (features.CellIntegralFeature.from_lims(9, 0.0, 1.0),)
    want = np.asarray(sgpr.q_v(spec, p, X, y + 3.0, grids, full_cov=False).mean)
    got = np.asarray(iterative.q_v_mean_cg(spec, p, X, y + 3.0, grids,
                                           tol=1e-12))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-9)
    xs = jnp.asarray(np.linspace(0.05, 0.95, 21))
    want_f = np.asarray(sgpr.posterior(spec, p, X, y + 3.0, xs,
                                       full_cov=False).mean)
    got_f = np.asarray(iterative.posterior_mean_cg(spec, p, X, y + 3.0, xs,
                                                   tol=1e-12))
    np.testing.assert_allclose(got_f, want_f, rtol=1e-6, atol=1e-9)


def test_qdv_mean_cg_matches_dense_pipeline_2d():
    """Matrix-free gridded-gradient mean (face-difference head at CG scale,
    VERDICT r4 item 8) vs the dense sgpr.q_dv, both axes, matern12 incl."""
    rng = np.random.default_rng(21)
    X = jnp.asarray(rng.random((90, 2)))
    y = jnp.asarray(np.sin(4 * np.asarray(X[:, 0])) * np.asarray(X[:, 1])
                    + 0.05 * rng.standard_normal(90))
    feats = (features.CellIntegralFeature.from_lims(12, 0.0, 1.0),
             features.CellIntegralFeature.from_lims(11, 0.0, 1.0))
    spec = sgpr.SGPRSpec(kinds=("matern12", "matern32"), features=feats,
                         jitter=1e-12)
    p = {"axes": ({"variance": jnp.asarray(0.9), "lengthscale": jnp.asarray(0.3)},
                  {"variance": jnp.asarray(1.1), "lengthscale": jnp.asarray(0.25)}),
         "noise": jnp.asarray(0.04)}
    grids = (features.CellIntegralFeature.from_lims(5, 0.0, 1.0),
             features.CellIntegralFeature.from_lims(4, 0.0, 1.0))
    w = iterative.solve_w(spec, p, X, y, tol=1e-13, maxiter=6000)
    for axis in (0, 1):
        want = np.asarray(sgpr.q_dv(spec, p, X, y, grids, axis=axis,
                                    full_cov=False).mean)
        got = np.asarray(iterative.q_dv_mean_from_w(spec, p, grids, axis, w))
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-9)


def test_posterior_grad_mean_cg_matches_dense_pipeline():
    X, y = _data()
    feat = features.CellIntegralFeature.from_lims(40, 0.0, 1.0)
    spec = sgpr.SGPRSpec(kinds=("matern32",), features=(feat,), jitter=1e-12)
    p = {"axes": (dict(P),), "noise": jnp.asarray(0.01)}
    xs = jnp.asarray(np.linspace(0.05, 0.95, 27))
    w = iterative.solve_w(spec, p, X, y, tol=1e-13, maxiter=6000)
    want = np.asarray(sgpr.posterior_grad(spec, p, X, y, xs, axis=0,
                                          full_cov=False).mean)
    got = np.asarray(iterative.posterior_grad_mean_from_w(spec, p, xs, 0, w))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-8)
    # matern12 has no pointwise gradient — must raise, matching the dense head
    spec12 = sgpr.SGPRSpec(kinds=("matern12",), features=(feat,))
    with pytest.raises(ValueError):
        iterative.posterior_grad_mean_from_w(spec12, p, xs, 0, w)


def test_pathwise_qv_coregion_moments_match_dense():
    """Multi-output pathwise q(v): the chol(B)-mixed bundles + heteroscedastic
    Matheron update must reproduce the dense sgpr.q_v moments (MC tol) —
    the matrix-free uncertainty channel for multi-mission products."""
    import jax
    X, y = _mo_data(n=80, seed=6)
    spec = _mo_spec(m=16, per_output_noise=True)
    p = spec.init_params(jnp.float64)
    p["noise"] = jnp.asarray([0.03, 0.08], jnp.float64)
    grids = (features.CellIntegralFeature.from_lims(6, 0.0, 1.0),
             features.OutputFeature(n_outputs=2))
    want = sgpr.q_v(spec, p, X, y, grids, full_cov=False)
    got = iterative.q_v_pathwise(spec, p, X, y, grids, jax.random.PRNGKey(2),
                                 n_samples=768, n_features=4096, tol=1e-10,
                                 maxiter=4000, kuu_maxiter=4000)
    w_var = np.asarray(want.var)
    np.testing.assert_allclose(np.asarray(got.mean), np.asarray(want.mean),
                               atol=5.0 * float(np.max(np.sqrt(w_var / 768))))
    np.testing.assert_allclose(np.asarray(got.var), w_var, rtol=0.25,
                               atol=1e-6 * float(np.max(w_var)))
    # wrong grid axis for the output slot raises loudly
    bad = (features.CellIntegralFeature.from_lims(6, 0.0, 1.0),
           features.CellIntegralFeature.from_lims(2, 0.0, 1.0))
    with pytest.raises(ValueError, match="OutputFeature"):
        iterative.pathwise_q_v_samples(spec, p, X, y, bad,
                                       jax.random.PRNGKey(0), n_samples=2)


def test_iterative_rejects_structureless_specs():
    """Sum/additive/free-Z specs have no per-axis (kinds, features) tuples;
    the error must name the problem, not AttributeError (r4 advisor)."""
    from vggp_tpu.models import sum as sum_mod

    comp = sgpr.SGPRSpec(
        kinds=("matern12",),
        features=(features.CellIntegralFeature.from_lims(8, 0.0, 1.0),))
    spec = sum_mod.SumSGPRSpec(components=(comp, comp))
    p = spec.init_params(jnp.float64)
    with pytest.raises(ValueError, match="dense heads"):
        iterative.solve_w(spec, p, jnp.zeros((4, 1)), jnp.zeros(4))


def test_pathwise_qv_moments_match_dense_1d():
    """Matrix-free pathwise q(v): empirical mean/var over S draws must match
    the dense sgpr.q_v moments (the Matheron update with the DTC-projected
    residual reproduces the Titsias covariance exactly — the only slack is
    MC error ~ sqrt(2/S) and the F-feature prior path)."""
    import jax
    rng = np.random.default_rng(11)
    x = jnp.asarray(np.sort(rng.uniform(size=70)))
    y = jnp.asarray(np.sin(6 * np.asarray(x)) + 0.1 * rng.standard_normal(70))
    feat = features.CellIntegralFeature.from_lims(24, 0.0, 1.0)
    spec = sgpr.SGPRSpec(kinds=("matern12",), features=(feat,), jitter=1e-12)
    p = {"axes": ({"variance": jnp.asarray(1.0), "lengthscale": jnp.asarray(0.2)},),
         "noise": jnp.asarray(0.05)}
    grids = (features.CellIntegralFeature.from_lims(8, 0.0, 1.0),)
    want = sgpr.q_v(spec, p, x, y, grids, full_cov=False)
    got = iterative.q_v_pathwise(spec, p, x, y, grids, jax.random.PRNGKey(0),
                                 n_samples=1024, n_features=4096, tol=1e-10,
                                 kuu_maxiter=4000)
    w_mean, w_var = np.asarray(want.mean), np.asarray(want.var)
    scale = np.sqrt(w_var + np.max(w_var))
    # mean: MC std of the sample mean is sqrt(var/S) — 4-sigma bound
    np.testing.assert_allclose(np.asarray(got.mean), w_mean,
                               atol=4.0 * float(np.max(np.sqrt(w_var / 1024))))
    # var: chi^2 concentration ~ sqrt(2/S) ≈ 4.4% relative; allow 20%
    np.testing.assert_allclose(np.asarray(got.var), w_var, rtol=0.2,
                               atol=1e-6 * float(np.max(w_var)))
    assert np.all(np.asarray(got.var) > 0)


def test_pathwise_qv_moments_match_dense_2d():
    import jax
    rng = np.random.default_rng(12)
    X = jnp.asarray(rng.random((80, 2)))
    y = jnp.asarray(np.sin(4 * np.asarray(X[:, 0])) * np.asarray(X[:, 1])
                    + 0.05 * rng.standard_normal(80))
    feats = (features.CellIntegralFeature.from_lims(10, 0.0, 1.0),
             features.CellIntegralFeature.from_lims(9, 0.0, 1.0))
    spec = sgpr.SGPRSpec(kinds=("matern12", "matern12"), features=feats,
                         jitter=1e-12)
    p = {"axes": ({"variance": jnp.asarray(0.8), "lengthscale": jnp.asarray(0.3)},
                  {"variance": jnp.asarray(1.1), "lengthscale": jnp.asarray(0.25)}),
         "noise": jnp.asarray(0.04)}
    grids = (features.CellIntegralFeature.from_lims(5, 0.0, 1.0),
             features.CellIntegralFeature.from_lims(4, 0.0, 1.0))
    want = sgpr.q_v(spec, p, X, y, grids, full_cov=False)
    got = iterative.q_v_pathwise(spec, p, X, y, grids, jax.random.PRNGKey(1),
                                 n_samples=768, n_features=4096, tol=1e-10,
                                 kuu_maxiter=4000)
    w_var = np.asarray(want.var)
    np.testing.assert_allclose(np.asarray(got.mean), np.asarray(want.mean),
                               atol=5.0 * float(np.max(np.sqrt(w_var / 768))))
    np.testing.assert_allclose(np.asarray(got.var), w_var, rtol=0.25,
                               atol=1e-6 * float(np.max(w_var)))


def test_pcg_identity_matches_cg(rng):
    from vggp_tpu.ops.cg import pcg_solve
    a = rng.normal(size=(20, 20))
    A = jnp.asarray(a @ a.T + 20 * np.eye(20))
    b = jnp.asarray(rng.normal(size=20))
    x_pcg = np.asarray(pcg_solve(lambda v: A @ v, b, lambda r: r, tol=1e-12))
    x_cg = np.asarray(cg_solve(lambda v: A @ v, b, tol=1e-12))
    np.testing.assert_allclose(x_pcg, x_cg, rtol=1e-9, atol=1e-11)


def test_pcg_good_preconditioner_cuts_iterations(rng):
    from vggp_tpu.ops.cg import pcg_solve
    a = rng.normal(size=(60, 60))
    A = np.asarray(a @ a.T + 0.1 * np.eye(60))
    A = A + np.diag(np.geomspace(1.0, 1e6, 60))      # badly conditioned
    Ainv = np.linalg.inv(A + 1e-3 * np.eye(60))       # near-exact M⁻¹
    b = jnp.asarray(rng.normal(size=60))
    Aj = jnp.asarray(A)
    x, it_pc, _ = pcg_solve(lambda v: Aj @ v, b,
                            lambda r: jnp.asarray(Ainv) @ r,
                            tol=1e-10, return_info=True)
    _, it_id, _ = pcg_solve(lambda v: Aj @ v, b, lambda r: r,
                            tol=1e-10, maxiter=10_000, return_info=True)
    np.testing.assert_allclose(np.asarray(x), np.linalg.solve(A, np.asarray(b)),
                               rtol=1e-6, atol=1e-8)
    assert int(it_pc) < 10 and int(it_pc) * 5 < int(it_id)


def test_kms_woodbury_precond_converges_fast_when_stiff():
    """The ℓ/δ ≫ 1 regime that runs Jacobi-CG to its iteration cap: with the
    KMS-Woodbury preconditioner (M == G up to the O(δ/ℓ) η terms) a 30-iter
    budget must reach the dense answer; with Jacobi it must not (that is
    exactly why this preconditioner exists)."""
    from vggp_tpu import config

    rng = np.random.default_rng(3)
    x = jnp.asarray(np.sort(rng.uniform(size=128)))
    y = jnp.asarray(np.sin(3 * np.asarray(x)) + 0.05 * rng.standard_normal(128))
    m = 2048                          # δ = 1/2048, ℓ = 0.5 → ℓ/δ = 1024
    feat = features.CellIntegralFeature.from_lims(m, 0.0, 1.0)
    spec = sgpr.SGPRSpec(kinds=("matern12",), features=(feat,), jitter=1e-12)
    p = {"axes": ({"variance": jnp.asarray(1.0), "lengthscale": jnp.asarray(0.5)},),
         "noise": jnp.asarray(0.01)}
    grids = (features.CellIntegralFeature.from_lims(10, 0.0, 1.0),)
    want = np.asarray(sgpr.q_v(spec, p, x, y, grids, full_cov=False).mean)
    assert config.CG_KMS_PRECOND
    got_kms = np.asarray(iterative.q_v_mean_cg(spec, p, x, y, grids,
                                               tol=1e-11, maxiter=30))
    err_kms = np.abs(got_kms - want).max()
    try:
        config.CG_KMS_PRECOND = False
        got_jac = np.asarray(iterative.q_v_mean_cg(spec, p, x, y, grids,
                                                   tol=1e-11, maxiter=30))
    finally:
        config.CG_KMS_PRECOND = True
    err_jac = np.abs(got_jac - want).max()
    scale = np.abs(want).max()
    assert err_kms < 1e-8 * scale, err_kms
    assert err_jac > 100 * max(err_kms, 1e-14), (err_jac, err_kms)


def test_kms_precond_2d_and_pathwise_still_exact():
    """2D: the Hadamard-factored Woodbury S must leave answers identical to
    the dense pipeline (the preconditioner changes the path, not the
    solution)."""
    rng = np.random.default_rng(9)
    X = jnp.asarray(rng.random((70, 2)))
    y = jnp.asarray(np.sin(5 * np.asarray(X[:, 0])) + 0.05 * rng.standard_normal(70))
    feats = (features.CellIntegralFeature.from_lims(64, 0.0, 1.0),
             features.CellIntegralFeature.from_lims(48, 0.0, 1.0))
    spec = sgpr.SGPRSpec(kinds=("matern12", "matern12"), features=feats,
                         jitter=1e-12)
    p = {"axes": ({"variance": jnp.asarray(1.0), "lengthscale": jnp.asarray(0.4)},
                  {"variance": jnp.asarray(0.9), "lengthscale": jnp.asarray(0.3)}),
         "noise": jnp.asarray(0.02)}
    grids = (features.CellIntegralFeature.from_lims(5, 0.0, 1.0),
             features.CellIntegralFeature.from_lims(4, 0.0, 1.0))
    want = np.asarray(sgpr.q_v(spec, p, X, y, grids, full_cov=False).mean)
    got = np.asarray(iterative.q_v_mean_cg(spec, p, X, y, grids, tol=1e-12,
                                           maxiter=2000))
    np.testing.assert_allclose(got, want, rtol=1e-7, atol=1e-10)


def test_kms_precond_f32_substiff_falls_back_finite():
    """f32 + u = δ/ℓ below the √eps boundary: the tridiagonal KMS⁻¹ apply is
    pure rounding noise amplified by 1/γ (measured NaN on device before the
    gate). The runtime u-gate must select Jacobi and produce the same finite
    answer the plain-Jacobi config gives."""
    from vggp_tpu import config

    rng = np.random.default_rng(4)
    x = jnp.asarray(np.sort(rng.uniform(size=128)), jnp.float32)
    y = jnp.asarray(np.sin(5 * np.asarray(x))
                    + 0.05 * rng.standard_normal(128), jnp.float32)
    feat = features.CellIntegralFeature.from_lims(8192, 0.0, 1.0)
    spec = sgpr.SGPRSpec(kinds=("matern12",), features=(feat,))
    p = {"axes": ({"variance": jnp.asarray(1.0, jnp.float32),
                   "lengthscale": jnp.asarray(0.2, jnp.float32)},),
         "noise": jnp.asarray(0.05, jnp.float32)}   # u = 6.1e-4 < 5·√eps_f32
    grids = (features.CellIntegralFeature.from_lims(8, 0.0, 1.0),)
    got = np.asarray(iterative.q_v_mean_cg(spec, p, x, y, grids, maxiter=400))
    assert np.all(np.isfinite(got))
    try:
        config.CG_KMS_PRECOND = False
        want = np.asarray(iterative.q_v_mean_cg(spec, p, x, y, grids,
                                                maxiter=400))
    finally:
        config.CG_KMS_PRECOND = True
    # the gated path runs PCG (Jacobi selected) vs cg_solve's symmetric
    # scaling — same math, different f32 iteration path
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=1e-6)


def test_antithetic_pathwise_mean_is_exact():
    """Antithetic pairs mirror the affine Matheron update around Kvu·w, so
    the sample mean equals the CG mean for ANY S (here S=4) — where the
    plain estimator at S=4 would carry O(sqrt(var)/2) MC error."""
    import jax
    rng = np.random.default_rng(13)
    x = jnp.asarray(np.sort(rng.uniform(size=60)))
    y = jnp.asarray(np.sin(6 * np.asarray(x)) + 0.1 * rng.standard_normal(60))
    feat = features.CellIntegralFeature.from_lims(24, 0.0, 1.0)
    spec = sgpr.SGPRSpec(kinds=("matern12",), features=(feat,), jitter=1e-12)
    p = {"axes": ({"variance": jnp.asarray(1.0), "lengthscale": jnp.asarray(0.2)},),
         "noise": jnp.asarray(0.05)}
    grids = (features.CellIntegralFeature.from_lims(8, 0.0, 1.0),)
    want = np.asarray(iterative.q_v_mean_cg(spec, p, x, y, grids, tol=1e-12,
                                            maxiter=4000))
    got = iterative.q_v_pathwise(spec, p, x, y, grids, jax.random.PRNGKey(3),
                                 n_samples=4, n_features=256, antithetic=True,
                                 tol=1e-12, maxiter=4000, kuu_maxiter=4000)
    np.testing.assert_allclose(np.asarray(got.mean), want, rtol=1e-7, atol=1e-9)
    with pytest.raises(ValueError, match="even"):
        iterative.pathwise_q_v_samples(spec, p, x, y, grids,
                                       jax.random.PRNGKey(0), n_samples=3,
                                       antithetic=True)


def test_control_variate_cuts_pathwise_var_error():
    """The exact-diag(Kvv) prior control variate must reduce the aggregate
    variance error vs the dense oracle at moderate S (fixed seed)."""
    import jax
    rng = np.random.default_rng(14)
    x = jnp.asarray(np.sort(rng.uniform(0.3, 0.7, size=50)))  # data-sparse edges
    y = jnp.asarray(np.sin(6 * np.asarray(x)) + 0.1 * rng.standard_normal(50))
    feat = features.CellIntegralFeature.from_lims(24, 0.0, 1.0)
    spec = sgpr.SGPRSpec(kinds=("matern12",), features=(feat,), jitter=1e-12)
    p = {"axes": ({"variance": jnp.asarray(1.0), "lengthscale": jnp.asarray(0.15)},),
         "noise": jnp.asarray(0.05)}
    grids = (features.CellIntegralFeature.from_lims(10, 0.0, 1.0),)
    want = np.asarray(sgpr.q_v(spec, p, x, y, grids, full_cov=False).var)
    kw = dict(n_samples=64, n_features=4096, tol=1e-11, maxiter=4000,
              kuu_maxiter=4000, antithetic=True)
    raw = iterative.q_v_pathwise(spec, p, x, y, grids, jax.random.PRNGKey(5),
                                 control_variate=False, **kw)
    cv = iterative.q_v_pathwise(spec, p, x, y, grids, jax.random.PRNGKey(5),
                                control_variate=True, **kw)
    err_raw = float(np.mean(np.abs(np.asarray(raw.var) - want) / want))
    err_cv = float(np.mean(np.abs(np.asarray(cv.var) - want) / want))
    assert err_cv < err_raw, (err_cv, err_raw)
    assert np.all(np.asarray(cv.var) > 0)


def test_pathwise_qdv_moments_match_dense():
    """Matrix-free gridded-gradient UNCERTAINTY: face-difference Matheron
    draws must reproduce the dense sgpr.q_dv moments (MC tol) — for
    matern12 too (the face difference never differentiates pointwise)."""
    import jax
    rng = np.random.default_rng(15)
    X = jnp.asarray(rng.random((70, 2)))
    y = jnp.asarray(np.sin(4 * np.asarray(X[:, 0])) * np.asarray(X[:, 1])
                    + 0.05 * rng.standard_normal(70))
    feats = (features.CellIntegralFeature.from_lims(10, 0.0, 1.0),
             features.CellIntegralFeature.from_lims(9, 0.0, 1.0))
    spec = sgpr.SGPRSpec(kinds=("matern12", "matern32"), features=feats,
                         jitter=1e-12)
    p = {"axes": ({"variance": jnp.asarray(0.9), "lengthscale": jnp.asarray(0.3)},
                  {"variance": jnp.asarray(1.0), "lengthscale": jnp.asarray(0.25)}),
         "noise": jnp.asarray(0.04)}
    grids = (features.CellIntegralFeature.from_lims(5, 0.0, 1.0),
             features.CellIntegralFeature.from_lims(4, 0.0, 1.0))
    for axis in (0, 1):
        want = sgpr.q_dv(spec, p, X, y, grids, axis=axis, full_cov=False)
        got = iterative.q_dv_pathwise(spec, p, X, y, grids, axis,
                                      jax.random.PRNGKey(4), n_samples=768,
                                      n_features=4096, tol=1e-10,
                                      maxiter=4000, kuu_maxiter=4000)
        w_var = np.asarray(want.var)
        np.testing.assert_allclose(
            np.asarray(got.mean), np.asarray(want.mean),
            atol=5.0 * float(np.max(np.sqrt(w_var / 768))))
        np.testing.assert_allclose(np.asarray(got.var), w_var, rtol=0.25,
                                   atol=1e-6 * float(np.max(w_var)))


def test_pathwise_qdv_antithetic_mean_matches_cg():
    """Antithetic face-difference draws: sample mean == Kv'u w exactly."""
    import jax
    X, y = _data(n=60, seed=2)
    feat = features.CellIntegralFeature.from_lims(20, 0.0, 1.0)
    spec = sgpr.SGPRSpec(kinds=("matern12",), features=(feat,), jitter=1e-12)
    p = {"axes": (dict(P),), "noise": jnp.asarray(0.03)}
    grids = (features.CellIntegralFeature.from_lims(7, 0.0, 1.0),)
    w = iterative.solve_w(spec, p, X, y, tol=1e-12, maxiter=4000)
    want = np.asarray(iterative.q_dv_mean_from_w(spec, p, grids, 0, w))
    got = iterative.q_dv_pathwise(spec, p, X, y, grids, 0,
                                  jax.random.PRNGKey(6), n_samples=4,
                                  n_features=256, antithetic=True,
                                  tol=1e-12, maxiter=4000, kuu_maxiter=4000)
    np.testing.assert_allclose(np.asarray(got.mean), want, rtol=1e-6,
                               atol=1e-8)
