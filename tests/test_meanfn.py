"""Learnable constant / per-output mean functions (beyond-reference: the
reference is ZeroMean-only).

The load-bearing identities: with the mean FIXED at c, every head must equal
the zero-mean model run on the centered data y − c (shifted back where the
head returns f-space quantities); gridded products add the exact cell
integrals of m. Trainability is pinned by offset recovery.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from vggp_tpu import kernels, sampling, streaming, train
from vggp_tpu.features import CellIntegralFeature, OutputFeature
from vggp_tpu.models import common, exact, sgpr, svgp


def _data_1d(n=60, offset=3.0, seed=0):
    rng = np.random.default_rng(seed)
    x = np.sort(rng.uniform(0, 1, n))
    y = np.sin(5 * x) + offset + 0.05 * rng.standard_normal(n)
    return jnp.asarray(x), jnp.asarray(y)


def _data_icm(n=150, offs=(1.0, -2.0), seed=0):
    rng = np.random.default_rng(seed)
    x = np.sort(rng.uniform(0, 1, n))
    task = rng.integers(0, 2, n)
    f = np.sin(5 * x)
    y = (np.where(task == 0, f + offs[0], 0.7 * f + offs[1])
         + 0.05 * rng.standard_normal(n))
    return (jnp.asarray(np.stack([x, task.astype(float)], 1)),
            jnp.asarray(y), task)


def test_mean_fn_and_grid_mean_values():
    spec = exact.ExactGPSpec(kinds=("matern32", "coregion"), n_outputs=2,
                             learn_mean=True)
    p = spec.init_params(jnp.float64)
    assert p["mean"].shape == (2,)
    p["mean"] = jnp.asarray([1.5, -0.5])
    X = jnp.asarray([[0.1, 0.0], [0.2, 1.0], [0.9, 1.0]])
    np.testing.assert_allclose(np.asarray(common.mean_fn(spec, p, X)),
                               [1.5, -0.5, -0.5])
    mesh = np.array([0.0, 0.5, 1.0])
    gm = common.grid_mean(spec, p, (CellIntegralFeature(mesh=mesh),
                                    OutputFeature(2)))
    want = np.array([1.5 * 0.5, -0.5 * 0.5, 1.5 * 0.5, -0.5 * 0.5])
    np.testing.assert_allclose(np.asarray(gm), want, rtol=1e-12)
    # scalar mean over a plain grid
    spec1 = exact.ExactGPSpec(kinds=("matern32",), learn_mean=True)
    p1 = spec1.init_params(jnp.float64)
    p1["mean"] = jnp.asarray(2.0)
    gm1 = common.grid_mean(spec1, p1, (CellIntegralFeature(mesh=mesh),))
    np.testing.assert_allclose(np.asarray(gm1), [1.0, 1.0], rtol=1e-12)
    # vector mean without a coregion axis is rejected
    p1["mean"] = jnp.asarray([1.0, 2.0])
    with pytest.raises(ValueError):
        common.mean_fn(spec1, p1, jnp.linspace(0, 1, 4))


def test_exact_fixed_mean_equals_centered_model():
    X, y = _data_1d()
    c = 2.5
    spec_m = exact.ExactGPSpec(kinds=("matern32",), learn_mean=True)
    spec_0 = exact.ExactGPSpec(kinds=("matern32",))
    pm = spec_m.init_params(jnp.float64)
    pm["mean"] = jnp.asarray(c)
    p0 = {"axes": pm["axes"], "noise": pm["noise"]}
    # MLL identity
    np.testing.assert_allclose(float(exact.mll(spec_m, pm, X, y)),
                               float(exact.mll(spec_0, p0, X, y - c)),
                               rtol=1e-12)
    xs = jnp.linspace(0.0, 1.0, 21)
    gm = exact.posterior_predictive(spec_m, pm, X, y, xs, full_cov=False)
    g0 = exact.posterior_predictive(spec_0, p0, X, y - c, xs, full_cov=False)
    np.testing.assert_allclose(np.asarray(gm.mean), np.asarray(g0.mean) + c,
                               rtol=1e-10)
    np.testing.assert_allclose(np.asarray(gm.variance()),
                               np.asarray(g0.variance()), rtol=1e-12)
    # q_v adds exactly m·|cell|; q_dv is untouched (constant mean)
    grid = (CellIntegralFeature(mesh=np.linspace(0, 1, 7)),)
    qm = exact.q_v(spec_m, pm, X, y, grid, full_cov=False)
    q0 = exact.q_v(spec_0, p0, X, y - c, grid, full_cov=False)
    np.testing.assert_allclose(np.asarray(qm.mean),
                               np.asarray(q0.mean) + c / 6.0, rtol=1e-9)
    dm = exact.q_dv(spec_m, pm, X, y, grid, axis=0, full_cov=False)
    d0 = exact.q_dv(spec_0, p0, X, y - c, grid, axis=0, full_cov=False)
    np.testing.assert_allclose(np.asarray(dm.mean), np.asarray(d0.mean),
                               rtol=1e-9, atol=1e-12)
    gm = exact.posterior_grad(spec_m, pm, X, y, xs, axis=0, full_cov=False)
    g0 = exact.posterior_grad(spec_0, p0, X, y - c, xs, axis=0, full_cov=False)
    np.testing.assert_allclose(np.asarray(gm.mean), np.asarray(g0.mean),
                               rtol=1e-9, atol=1e-12)


def test_sgpr_fixed_mean_identities():
    X, y = _data_1d()
    c = -1.7
    feat = CellIntegralFeature(mesh=np.linspace(0, 1, 11))
    spec_m = sgpr.SGPRSpec(kinds=("matern32",), features=(feat,),
                           learn_mean=True)
    spec_0 = sgpr.SGPRSpec(kinds=("matern32",), features=(feat,))
    pm = spec_m.init_params(jnp.float64)
    pm["mean"] = jnp.asarray(c)
    p0 = {"axes": pm["axes"], "noise": pm["noise"]}
    np.testing.assert_allclose(float(sgpr.elbo(spec_m, pm, X, y)),
                               float(sgpr.elbo(spec_0, p0, X, y - c)),
                               rtol=1e-12)
    xs = jnp.linspace(0.0, 1.0, 21)
    gm = sgpr.posterior(spec_m, pm, X, y, xs, full_cov=False)
    g0 = sgpr.posterior(spec_0, p0, X, y - c, xs, full_cov=False)
    np.testing.assert_allclose(np.asarray(gm.mean), np.asarray(g0.mean) + c,
                               rtol=1e-10)
    st_m = sgpr.precompute(spec_m, pm, X, y)
    gm2 = sgpr.posterior_from_state(spec_m, pm, st_m, xs, full_cov=False)
    np.testing.assert_allclose(np.asarray(gm2.mean), np.asarray(gm.mean),
                               rtol=1e-12)
    qm = sgpr.q_v_from_state(spec_m, pm, st_m, (feat,))
    q0 = sgpr.q_v(spec_0, p0, X, y - c, (feat,), full_cov=False)
    np.testing.assert_allclose(np.asarray(qm.mean),
                               np.asarray(q0.mean) + c / 10.0, rtol=1e-9)


def test_svgp_fixed_mean_elbo_identity_and_posterior_shift():
    X, y = _data_1d()
    c = 0.8
    feat = CellIntegralFeature(mesh=np.linspace(0, 1, 11))
    spec_m = svgp.SVGPSpec(kinds=("matern32",), features=(feat,),
                           num_data=60, variational="full", learn_mean=True)
    spec_0 = svgp.SVGPSpec(kinds=("matern32",), features=(feat,),
                           num_data=60, variational="full")
    pm = spec_m.init_params(jnp.float64)
    pm["mean"] = jnp.asarray(c)
    p0 = {k: v for k, v in pm.items() if k != "mean"}
    np.testing.assert_allclose(float(svgp.elbo(spec_m, pm, X, y)),
                               float(svgp.elbo(spec_0, p0, X, y - c)),
                               rtol=1e-12)
    xs = jnp.linspace(0.0, 1.0, 13)
    gm = svgp.posterior(spec_m, pm, xs, full_cov=False)
    g0 = svgp.posterior(spec_0, p0, xs, full_cov=False)
    np.testing.assert_allclose(np.asarray(gm.mean), np.asarray(g0.mean) + c,
                               rtol=1e-10, atol=1e-12)
    qm = svgp.q_v(spec_m, pm, (feat,))
    q0 = svgp.q_v(spec_0, p0, (feat,))
    np.testing.assert_allclose(np.asarray(qm.mean),
                               np.asarray(q0.mean) + c / 10.0,
                               rtol=1e-9, atol=1e-12)


def test_p_v_u_heads_add_grid_mean():
    """p(v|u) is a head over v = ∫_cell f, so like q_v it must carry the
    learned mean's exact cell integral (regression: p_v_u used to return the
    residual-process conditional, off by −c·|cell| per cell)."""
    from vggp_tpu.models import sum as msum

    X, y = _data_1d()
    c = 0.9
    feat = CellIntegralFeature(mesh=np.linspace(0, 1, 11))
    cell = c / 10.0

    spec_m = sgpr.SGPRSpec(kinds=("matern32",), features=(feat,),
                           learn_mean=True)
    spec_0 = sgpr.SGPRSpec(kinds=("matern32",), features=(feat,))
    pm = spec_m.init_params(jnp.float64)
    pm["mean"] = jnp.asarray(c)
    p0 = {"axes": pm["axes"], "noise": pm["noise"]}
    gm = sgpr.p_v_u(spec_m, pm, X, y, (feat,))
    g0 = sgpr.p_v_u(spec_0, p0, X, y - c, (feat,))
    np.testing.assert_allclose(np.asarray(gm.mean),
                               np.asarray(g0.mean) + cell, rtol=1e-9)
    np.testing.assert_allclose(np.asarray(gm.cov), np.asarray(g0.cov),
                               rtol=1e-12)

    vspec_m = svgp.SVGPSpec(kinds=("matern32",), features=(feat,),
                            num_data=60, variational="full", learn_mean=True)
    vspec_0 = svgp.SVGPSpec(kinds=("matern32",), features=(feat,),
                            num_data=60, variational="full")
    vm = vspec_m.init_params(jnp.float64)
    vm["mean"] = jnp.asarray(c)
    v0 = {k: v for k, v in vm.items() if k != "mean"}
    hm = svgp.p_v_u(vspec_m, vm, (feat,))
    h0 = svgp.p_v_u(vspec_0, v0, (feat,))
    np.testing.assert_allclose(np.asarray(hm.mean),
                               np.asarray(h0.mean) + cell,
                               rtol=1e-9, atol=1e-12)

    comp = sgpr.SGPRSpec(kinds=("matern32",), features=(feat,))
    sspec_m = msum.SumSGPRSpec(components=(comp,), learn_mean=True)
    sspec_0 = msum.SumSGPRSpec(components=(comp,))
    sm = sspec_m.init_params(jnp.float64)
    sm["mean"] = jnp.asarray(c)
    s0 = {k: v for k, v in sm.items() if k != "mean"}
    km = msum.p_v_u(sspec_m, sm, X, y, (feat,))
    k0 = msum.p_v_u(sspec_0, s0, X, y - c, (feat,))
    np.testing.assert_allclose(np.asarray(km.mean),
                               np.asarray(k0.mean) + cell, rtol=1e-9)


def test_icm_learned_means_recover_offsets_and_sharpen_correlation():
    X, y, task = _data_icm()
    feat = CellIntegralFeature(mesh=np.linspace(0, 1, 13))
    out = OutputFeature(2)
    spec = sgpr.SGPRSpec(kinds=("matern32", "coregion"), features=(feat, out),
                         learn_mean=True)
    p = train.non_informative_init(spec.init_params(jnp.float64), X, y)
    pf, _ = train.fit(lambda q: sgpr.loss(spec, q, X, y), p, 600, 0.05)
    # the mean/GP split leaves the sin's average ambiguous; the DIFFERENCE
    # of the two output means is pinned: (1 + s̄) − (−2 + 0.7·s̄) with
    # s̄ = E[sin(5x)] ≈ 0.137 ⇒ Δ ≈ 3 + 0.3·s̄
    mdiff = float(pf["mean"][0] - pf["mean"][1])
    assert mdiff == pytest.approx(3.0 + 0.3 * 0.137, abs=0.3)
    B = np.asarray(kernels.coregion_b(pf["axes"][1]))
    assert B[0, 1] / np.sqrt(B[0, 0] * B[1, 1]) > 0.99
    # per-output q_v including the mean term, vs analytic truth
    st = sgpr.precompute(spec, pf, X, y)
    qv = sgpr.q_v_from_state(spec, pf, st, (feat, out))
    mesh = np.linspace(0, 1, 13)
    a, b = mesh[:-1], mesh[1:]
    i0 = (np.cos(5 * a) - np.cos(5 * b)) / 5.0
    truth = np.stack([i0 + 1.0 * (b - a), 0.7 * i0 - 2.0 * (b - a)],
                     axis=1).reshape(-1)
    assert np.abs(np.asarray(qv.mean) - truth).max() < 0.02


def test_sampler_and_streaming_carry_the_mean():
    X, y, task = _data_icm()
    feat = CellIntegralFeature(mesh=np.linspace(0, 1, 9))
    out = OutputFeature(2)
    spec = sgpr.SGPRSpec(kinds=("matern32", "coregion"), features=(feat, out),
                         learn_mean=True)
    p = train.non_informative_init(spec.init_params(jnp.float64), X, y)
    pf, _ = train.fit(lambda q: sgpr.loss(spec, q, X, y), p, 300, 0.05)
    xq = jnp.asarray(np.stack([np.linspace(0.1, 0.9, 8), np.ones(8)], 1))
    st = sgpr.precompute(spec, pf, X, y)
    g = sgpr.posterior_from_state(spec, pf, st, xq)
    draws = sampling.pathwise_posterior_collapsed(
        spec, pf, jax.random.PRNGKey(1), X, y, xq,
        n_samples=256, n_features=512)
    sd = float(np.sqrt(np.asarray(g.variance()).max()))
    assert np.abs(np.asarray(draws).mean(0) - np.asarray(g.mean)).max() < 0.5 * sd
    # streamed state + svgp head reproduces the collapsed posterior
    vspec = svgp.SVGPSpec(kinds=("matern32", "coregion"),
                          features=(feat, out), num_data=X.shape[0],
                          variational="full", learn_mean=True)
    vp = dict(pf)
    vp["q"] = vspec.init_params(jnp.float64)["q"]
    state = streaming.init_state(vspec, jnp.float64)
    state = streaming.assimilate(vspec, vp, state, X, y)
    pq = streaming.to_params(vspec, vp, state)
    gs = svgp.posterior(vspec, pq, xq, full_cov=False)
    np.testing.assert_allclose(np.asarray(gs.mean), np.asarray(g.mean),
                               atol=1e-9)
