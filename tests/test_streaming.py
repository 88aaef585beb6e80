"""Streaming assimilation: chunked online updates == optimal batch posterior.

The module's contract is exactness (vggp_tpu/streaming.py docstring): after
assimilating any chunking/ordering of a dataset, the state equals the
collapsed-SGPR optimum at the same hyperparameters. These tests pin that
against models/sgpr.py (itself dense-oracle tested) in float64.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vggp_tpu import streaming, train
from vggp_tpu.features import CellIntegralFeature, FourierFeature
from vggp_tpu.models import sgpr, svgp


def _data_1d(n=120, seed=0):
    rng = np.random.default_rng(seed)
    X = jnp.asarray(np.sort(rng.random(n)))
    y = jnp.asarray(np.sin(6 * np.asarray(X)) + 0.1 * rng.standard_normal(n))
    return X, y


def _specs_1d(n, likelihood="gaussian"):
    g = CellIntegralFeature.from_lims(10, 0.0, 1.0)
    vspec = svgp.SVGPSpec(kinds=("matern32",), features=(g,), num_data=n,
                          likelihood=likelihood)
    cspec = sgpr.SGPRSpec(kinds=("matern32",), features=(g,))
    return vspec, cspec


def _hypers(vspec, noise=0.05, ell=0.3, var=1.2):
    p = vspec.init_params(jnp.float64)
    p = dict(p)
    p["noise"] = jnp.asarray(noise, jnp.float64)
    axes = []
    for ax in p["axes"]:
        ax = dict(ax)
        ax["lengthscale"] = jnp.asarray(ell, jnp.float64)
        ax["variance"] = jnp.asarray(var, jnp.float64)
        axes.append(ax)
    p["axes"] = tuple(axes)
    return p


def test_streamed_equals_batch_sgpr_1d():
    X, y = _data_1d()
    n = X.shape[0]
    vspec, cspec = _specs_1d(n)
    p = _hypers(vspec)

    state = streaming.init_state(vspec, jnp.float64)
    for lo in range(0, n, 40):  # three uneven-boundary chunks
        state = streaming.assimilate(vspec, p, state, X[lo:lo + 40], y[lo:lo + 40])
    pq = streaming.to_params(vspec, p, state)

    xs = jnp.asarray(np.linspace(0.0, 1.0, 33))
    got = svgp.posterior(vspec, pq, xs, full_cov=False)
    want = sgpr.posterior(cspec, p, X, y, xs, full_cov=False)
    np.testing.assert_allclose(np.asarray(got.mean), np.asarray(want.mean), atol=1e-9)
    np.testing.assert_allclose(np.asarray(got.var), np.asarray(want.var),
                               atol=1e-9)
    assert float(state["n_seen"]) == n


def test_streamed_equals_batch_sgpr_2d_qv():
    rng = np.random.default_rng(1)
    n = 150
    X = jnp.asarray(rng.random((n, 2)))
    y = jnp.asarray(np.sin(5 * np.asarray(X[:, 0])) *
                    np.cos(4 * np.asarray(X[:, 1])) + 0.05 * rng.standard_normal(n))
    f1 = CellIntegralFeature.from_lims(6, 0.0, 1.0)
    f2 = FourierFeature(a=0.0, b=1.0, n_frequencies=4)
    vspec = svgp.SVGPSpec(kinds=("matern12", "matern12"), features=(f1, f2),
                          num_data=n)
    cspec = sgpr.SGPRSpec(kinds=("matern12", "matern12"), features=(f1, f2))
    p = _hypers(vspec, noise=0.02, ell=0.4)

    state = streaming.init_state(vspec, jnp.float64)
    state = streaming.assimilate(vspec, p, state, X[:70], y[:70])
    state = streaming.assimilate(vspec, p, state, X[70:], y[70:])
    pq = streaming.to_params(vspec, p, state)

    grid = tuple(CellIntegralFeature.from_lims(5, 0.1, 0.9) for _ in range(2))
    got = svgp.q_v(vspec, pq, grid, full_cov=True)
    want = sgpr.q_v(cspec, p, X, y, grid, full_cov=True)
    np.testing.assert_allclose(np.asarray(got.mean), np.asarray(want.mean), atol=1e-9)
    np.testing.assert_allclose(np.asarray(got.cov), np.asarray(want.cov), atol=1e-9)


def test_order_and_chunking_invariance():
    X, y = _data_1d(n=90, seed=2)
    vspec, _ = _specs_1d(90)
    p = _hypers(vspec)

    s1 = streaming.init_state(vspec, jnp.float64)
    s1 = streaming.assimilate(vspec, p, s1, X, y)

    perm = np.random.default_rng(3).permutation(90)
    Xp, yp = X[perm], y[perm]
    s2 = streaming.init_state(vspec, jnp.float64)
    for lo in range(0, 90, 17):  # ragged chunks, shuffled order
        s2 = streaming.assimilate(vspec, p, s2, Xp[lo:lo + 17], yp[lo:lo + 17])

    np.testing.assert_allclose(np.asarray(s1["lam"]), np.asarray(s2["lam"]),
                               atol=1e-10)
    np.testing.assert_allclose(np.asarray(s1["eta"]), np.asarray(s2["eta"]),
                               atol=1e-10)


def test_scan_matches_loop():
    X, y = _data_1d(n=80, seed=4)
    vspec, _ = _specs_1d(80)
    p = _hypers(vspec)
    Xc = X.reshape(4, 20)
    yc = y.reshape(4, 20)

    s_loop = streaming.init_state(vspec, jnp.float64)
    for i in range(4):
        s_loop = streaming.assimilate(vspec, p, s_loop, Xc[i], yc[i])
    s_scan = jax.jit(lambda s: streaming.assimilate_scan(vspec, p, s, Xc, yc))(
        streaming.init_state(vspec, jnp.float64))
    np.testing.assert_allclose(np.asarray(s_loop["lam"]), np.asarray(s_scan["lam"]),
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(s_loop["eta"]), np.asarray(s_scan["eta"]),
                               rtol=1e-12)


def test_heteroscedastic_noise_oracle():
    """Per-point noise: state must equal the dense whitened-normal-equations
    optimum Λ = I + A D⁻¹ Aᵀ, η = A D⁻¹ y built in numpy."""
    X, y = _data_1d(n=60, seed=5)
    vspec, _ = _specs_1d(60)
    p = _hypers(vspec)
    nvec = jnp.asarray(0.01 + 0.1 * np.random.default_rng(6).random(60))

    state = streaming.init_state(vspec, jnp.float64)
    state = streaming.assimilate(vspec, p, state, X[:25], y[:25], noise=nvec[:25])
    state = streaming.assimilate(vspec, p, state, X[25:], y[25:], noise=nvec[25:])

    from vggp_tpu.models import common
    chols = common.axis_chol_kuu(vspec, p)
    A = np.asarray(common.khatri_rao_all(
        common.axis_whitened_kuf(vspec, p, chols, X)))
    D = np.asarray(nvec)
    lam = np.eye(A.shape[0]) + (A / D) @ A.T
    eta = (A / D) @ np.asarray(y)
    np.testing.assert_allclose(np.asarray(state["lam"]), lam, atol=1e-10)
    np.testing.assert_allclose(np.asarray(state["eta"]), eta, atol=1e-10)


def test_forget_limits():
    X, y = _data_1d(n=50, seed=7)
    vspec, _ = _specs_1d(50)
    p = _hypers(vspec)
    s = streaming.assimilate(vspec, p, streaming.init_state(vspec, jnp.float64),
                             X, y)
    s1 = streaming.forget(s, 1.0)
    np.testing.assert_allclose(np.asarray(s1["lam"]), np.asarray(s["lam"]))
    s0 = streaming.forget(s, 0.0)
    np.testing.assert_allclose(np.asarray(s0["lam"]), np.eye(10))
    np.testing.assert_allclose(np.asarray(s0["eta"]), 0.0)
    # partial forgetting keeps Λ ⪰ I (a valid posterior precision)
    sh = streaming.forget(s, 0.3)
    w = np.linalg.eigvalsh(np.asarray(sh["lam"]))
    assert w.min() >= 1.0 - 1e-10


def test_assimilated_q_is_elbo_optimum():
    """The written-back q maximizes the whitened ELBO at fixed hypers: any
    perturbation of (μ, L_S) lowers it."""
    X, y = _data_1d(n=70, seed=8)
    vspec, _ = _specs_1d(70)
    p = _hypers(vspec)
    s = streaming.assimilate(vspec, p, streaming.init_state(vspec, jnp.float64),
                             X, y)
    pq = streaming.to_params(vspec, p, s)
    e_opt = float(svgp.elbo(vspec, pq, X, y))

    rng = np.random.default_rng(9)
    for _ in range(3):
        q2 = dict(pq["q"])
        q2["mu"] = q2["mu"] + 0.05 * jnp.asarray(rng.standard_normal(10))
        q2["raw_L"] = q2["raw_L"] + 0.05 * jnp.asarray(
            np.tril(rng.standard_normal((10, 10))))
        p2 = dict(pq)
        p2["q"] = q2
        assert float(svgp.elbo(vspec, p2, X, y)) < e_opt


def test_rejects_non_gaussian_and_kron():
    g = CellIntegralFeature.from_lims(6, 0.0, 1.0)
    # non-Gaussian specs may INIT a state (assimilate_natgrad needs one) but
    # the exact Gaussian update must refuse them — a silent RLS update would
    # treat e.g. Poisson counts as Gaussian observations.
    sp = svgp.SVGPSpec(kinds=("matern12",), features=(g,), num_data=10,
                       likelihood="poisson")
    s = streaming.init_state(sp, jnp.float64)
    X = jnp.asarray(np.linspace(0.1, 0.9, 10))
    y = jnp.asarray(np.ones(10))
    with pytest.raises(ValueError, match="Gaussian"):
        streaming.assimilate(sp, _hypers(sp), s, X, y)
    sk = svgp.SVGPSpec(kinds=("matern12", "matern12"), features=(g, g),
                       num_data=10, variational="kron")
    with pytest.raises(ValueError, match="full"):
        streaming.init_state(sk)


def test_reanchor_identity_and_u_space_oracle():
    """reanchor with unchanged hypers is the identity; with changed hypers,
    the implied q(u) must equal the dense u-space combination of the old
    data information J_u = F₀⁻ᵀ(Λ−I)F₀⁻¹ with the NEW prior:
    cov = (K₁⁻¹ + J_u)⁻¹, mean = cov·F₀⁻ᵀη (exact Woodbury identity)."""
    from vggp_tpu.models import common as mcommon

    X, y = _data_1d(n=100, seed=10)
    vspec, _ = _specs_1d(100)
    p0 = _hypers(vspec, noise=0.05, ell=0.3, var=1.2)
    p1 = _hypers(vspec, noise=0.08, ell=0.45, var=0.8)

    s = streaming.assimilate(vspec, p0, streaming.init_state(vspec, jnp.float64),
                             X, y)
    s_id = streaming.reanchor(vspec, p0, p0, s)
    np.testing.assert_allclose(np.asarray(s_id["lam"]), np.asarray(s["lam"]),
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(s_id["eta"]), np.asarray(s["eta"]),
                               atol=1e-9)

    s1 = streaming.reanchor(vspec, p0, p1, s)
    qu = svgp.q_u(vspec, streaming.to_params(vspec, p1, s1))

    F0 = np.asarray(mcommon.axis_chol_kuu(vspec, p0)[0].F)
    F1 = np.asarray(mcommon.axis_chol_kuu(vspec, p1)[0].F)
    lam0 = np.asarray(s["lam"]) - np.eye(10)
    F0i = np.linalg.inv(F0)
    Ju = F0i.T @ lam0 @ F0i          # F0⁻ᵀ (Λ − I) F0⁻¹
    Ju = 0.5 * (Ju + Ju.T)
    hu = np.linalg.solve(F0.T, np.asarray(s["eta"]))
    P = np.linalg.inv(F1 @ F1.T) + Ju
    cov = np.linalg.inv(P)
    mean = cov @ hu
    np.testing.assert_allclose(np.asarray(qu.mean), mean, atol=1e-8)
    np.testing.assert_allclose(np.asarray(qu.cov), cov, atol=1e-8)


def test_reanchor_tracks_hyper_refit():
    """End-to-end drift pattern: assimilating at bad initial hypers, then
    refitting hypers on a window and reanchoring must improve held-out NLPD
    over staying at the initial hypers."""
    rng = np.random.default_rng(12)
    n = 300
    X = jnp.asarray(np.sort(rng.random(n)))
    f = np.sin(9 * np.asarray(X))
    y = jnp.asarray(f + 0.05 * rng.standard_normal(n))
    g = CellIntegralFeature.from_lims(20, 0.0, 1.0)
    vspec = svgp.SVGPSpec(kinds=("matern32",), features=(g,), num_data=n)
    cspec = sgpr.SGPRSpec(kinds=("matern32",), features=(g,))

    p_bad = _hypers(vspec, noise=0.5, ell=1.5, var=0.3)  # far-off hypers
    s = streaming.assimilate(vspec, p_bad,
                             streaming.init_state(vspec, jnp.float64),
                             X[:150], y[:150])

    # refit hypers on the window seen so far, reanchor, keep assimilating
    p_fit, _ = train.fit(lambda q: sgpr.loss(cspec, q, X[:150], y[:150]),
                         train.non_informative_init(
                             cspec.init_params(jnp.float64), X[:150], y[:150]),
                         n_iters=400, learning_rate=0.05)
    p_new = dict(p_bad)
    p_new["axes"], p_new["noise"] = p_fit["axes"], p_fit["noise"]
    s_re = streaming.reanchor(vspec, p_bad, p_new, s)
    s_re = streaming.assimilate(vspec, p_new, s_re, X[150:], y[150:])
    s_stale = streaming.assimilate(vspec, p_bad, s, X[150:], y[150:])

    xs = jnp.asarray(np.linspace(0.02, 0.98, 64))
    ts = np.sin(9 * np.asarray(xs))

    def nlpd(p, st):
        q = svgp.posterior(vspec, streaming.to_params(vspec, p, st), xs,
                           full_cov=False)
        m, v = np.asarray(q.mean), np.asarray(q.var) + float(p["noise"])
        return float(np.mean(0.5 * np.log(2 * np.pi * v) + (ts - m) ** 2 / (2 * v)))

    assert nlpd(p_new, s_re) < nlpd(p_bad, s_stale) - 0.3


def test_natgrad_gaussian_reduces_to_exact():
    """For the Gaussian likelihood the CVI site is exact and q-independent:
    assimilate_natgrad(gamma=1, n_inner=1) must equal assimilate."""
    X, y = _data_1d(n=80, seed=13)
    vspec, _ = _specs_1d(80)
    p = _hypers(vspec)
    s0 = streaming.init_state(vspec, jnp.float64)
    se = streaming.assimilate(vspec, p, s0, X, y)
    sn = streaming.assimilate_natgrad(vspec, p, s0, X, y, gamma=1.0, n_inner=1)
    np.testing.assert_allclose(np.asarray(sn["lam"]), np.asarray(se["lam"]),
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(sn["eta"]), np.asarray(se["eta"]),
                               rtol=1e-12, atol=1e-12)


def test_natgrad_poisson_stream():
    """Single-pass Poisson streaming reaches nearly the batch natural-
    gradient optimum, keeps Lambda >= I (log-concave sites), and recovers
    the intensity."""
    rng = np.random.default_rng(14)
    n = 360
    X = jnp.asarray(np.sort(rng.random(n)))
    lam_true = np.exp(1.0 + np.sin(2 * np.pi * np.asarray(X)))
    y = jnp.asarray(rng.poisson(lam_true).astype(np.float64))
    g = CellIntegralFeature.from_lims(14, 0.0, 1.0)
    spec = svgp.SVGPSpec(kinds=("matern32",), features=(g,), num_data=n,
                         likelihood="poisson", variational="full")
    p = _hypers(spec, noise=0.05, ell=0.25, var=1.0)

    s = streaming.init_state(spec, jnp.float64)
    order = rng.permutation(n)
    Xs, ys = X[order], y[order]
    for lo in range(0, n, 120):
        s = streaming.assimilate_natgrad(spec, p, s, Xs[lo:lo + 120],
                                         ys[lo:lo + 120], gamma=0.5, n_inner=6)
    w = np.linalg.eigvalsh(np.asarray(s["lam"]))
    assert w.min() >= 1.0 - 1e-8

    pq = streaming.to_params(spec, p, s)
    lam_hat, _ = svgp.predict_y(spec, pq, X)
    rel = np.abs(np.asarray(lam_hat) - lam_true) / lam_true
    assert np.median(rel) < 0.3, np.median(rel)

    # within a few nats of the batch natural-gradient fit at the SAME hypers
    p_ng, _ = train.fit_natgrad(spec, pq, X, y, n_iters=40, gamma=0.3,
                                hyper_lr=0.0)
    e_stream = float(svgp.elbo(spec, pq, X, y))
    e_batch = float(svgp.elbo(spec, p_ng, X, y))
    assert e_stream > e_batch - 5.0, (e_stream, e_batch)


def test_natgrad_probit_stream():
    """Probit classification stream: predictive accuracy beats chance by a
    wide margin and the state stays a valid precision."""
    rng = np.random.default_rng(15)
    n = 300
    X = jnp.asarray(np.sort(rng.random(n)))
    f = 2.5 * np.sin(2 * np.pi * np.asarray(X))
    yb = (rng.random(n) < 1.0 / (1.0 + np.exp(-2 * f))).astype(np.float64)
    g = CellIntegralFeature.from_lims(12, 0.0, 1.0)
    spec = svgp.SVGPSpec(kinds=("matern32",), features=(g,), num_data=n,
                         likelihood="bernoulli", variational="full")
    p = _hypers(spec, noise=0.05, ell=0.3, var=2.0)

    s = streaming.init_state(spec, jnp.float64)
    for lo in range(0, n, 100):
        s = streaming.assimilate_natgrad(spec, p, s, X[lo:lo + 100],
                                         jnp.asarray(yb[lo:lo + 100]),
                                         gamma=0.5, n_inner=6)
    w = np.linalg.eigvalsh(np.asarray(s["lam"]))
    assert w.min() >= 1.0 - 1e-8
    pq = streaming.to_params(spec, p, s)
    prob = np.asarray(svgp.predict_y(spec, pq, X))
    acc = np.mean((prob > 0.5) == (yb > 0.5))
    assert acc > 0.8, acc


def test_natgrad_single_batch_matches_batch_fixed_point():
    """On a COARSE inducing grid (k_ff − ‖a‖² a large fraction of k_ff) the
    one-batch CVI fixed point must coincide with the batch natural-gradient
    optimum: regression for the site gradients being evaluated at the full
    q(f) marginal variance k_ff − ‖a‖² + aᵀSa, not just aᵀSa (which biases
    Poisson sites exactly where the grid is coarse)."""
    rng = np.random.default_rng(21)
    n = 200
    X = jnp.asarray(np.sort(rng.random(n)))
    lam_true = np.exp(0.8 + np.sin(2 * np.pi * np.asarray(X)))
    y = jnp.asarray(rng.poisson(lam_true).astype(np.float64))
    g = CellIntegralFeature.from_lims(6, 0.0, 1.0)   # very coarse: m = 6
    spec = svgp.SVGPSpec(kinds=("matern32",), features=(g,), num_data=n,
                         likelihood="poisson", variational="full")
    p = _hypers(spec, noise=0.05, ell=0.35, var=1.0)

    s = streaming.assimilate_natgrad(spec, p, streaming.init_state(spec, jnp.float64),
                                     X, y, gamma=0.5, n_inner=80)
    pq = streaming.to_params(spec, p, s)
    p_ng, _ = train.fit_natgrad(spec, pq, X, y, n_iters=200, gamma=0.3,
                                hyper_lr=0.0)
    e_stream = float(svgp.elbo(spec, pq, X, y))
    e_batch = float(svgp.elbo(spec, p_ng, X, y))
    # pre-fix (var = aᵀSa only) this gap was O(1) nats at m = 6
    assert abs(e_stream - e_batch) < 0.1, (e_stream, e_batch)


def test_to_q_f32_keeps_prior_variance_on_long_streams():
    """Regression: the Λ factorization must use an ABSOLUTE jitter. A
    diag-relative floor scales like the streamed data volume (mean diag of
    Λ ≈ n/σ²) and collapses the f32 posterior variance in data-free
    directions (measured 9× overconfident at mean-diag ≈ 8e6)."""
    rng = np.random.default_rng(22)
    m = 8
    v = rng.standard_normal(m)
    v /= np.linalg.norm(v)
    lam = np.eye(m) + (1e7 / 3.0) * np.outer(v, v)
    state = {"lam": jnp.asarray(lam, jnp.float32),
             "eta": jnp.zeros((m,), jnp.float32),
             "n_seen": jnp.asarray(1e6, jnp.float32)}
    _, S = streaming.to_q(state)
    w = rng.standard_normal(m)
    w -= v * (v @ w)
    w /= np.linalg.norm(w)               # unit vector ⊥ the data direction
    var_w = float(w @ np.asarray(S, np.float64) @ w)
    assert var_w > 0.9, var_w            # true value 1.0; relative jitter gave ~0.11
