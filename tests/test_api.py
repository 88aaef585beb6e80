"""Facade tests: vggp_tpu.api.GP delegates 1:1 to the functional core.

Every assertion pins facade output against a direct functional-core call on
the same spec/params — the facade must add ergonomics, never numerics.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vggp_tpu import sampling, train
from vggp_tpu.api import GP
from vggp_tpu.features import CellIntegralFeature, FourierFeature, PointFeature
from vggp_tpu.models import exact, sgpr


@pytest.fixture(scope="module")
def data1d():
    rng = np.random.default_rng(0)
    X = rng.uniform(0.0, 1.0, 50).astype(np.float32)
    y = (np.sin(4 * X) + 0.05 * rng.standard_normal(50)).astype(np.float32)
    return jnp.asarray(X), jnp.asarray(y)


def test_gridded_fit_matches_functional_core(data1d):
    X, y = data1d
    m = GP.gridded(10, (0.0, 1.0)).fit(X, y, n_iters=40, learning_rate=0.05)

    spec = sgpr.SGPRSpec(kinds=("matern12",),
                         features=(CellIntegralFeature.from_lims(10, 0.0, 1.0),))
    p0 = train.non_informative_init(spec.init_params(), X, y)
    p_ref, _ = train.fit(lambda p: sgpr.loss(spec, p, X, y), p0, 40, 0.05)

    np.testing.assert_allclose(m.params["noise"], p_ref["noise"], rtol=1e-6)
    np.testing.assert_allclose(float(m.elbo()), float(sgpr.elbo(spec, p_ref, X, y)),
                               rtol=1e-5)

    qv = m.q_v()
    qv_ref = sgpr.q_v(spec, p_ref, X, y, spec.features, full_cov=False)
    np.testing.assert_allclose(np.asarray(qv.mean), np.asarray(qv_ref.mean),
                               rtol=1e-5, atol=1e-7)

    xs = jnp.linspace(0.0, 1.0, 9)
    post = m.predict(xs, predictive=True)
    post_ref = sgpr.posterior_predictive(spec, p_ref, X, y, xs, full_cov=False)
    np.testing.assert_allclose(np.asarray(post.mean), np.asarray(post_ref.mean),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(post.variance()),
                               np.asarray(post_ref.variance()), rtol=1e-4, atol=1e-7)


def test_factories_build_expected_specs():
    g = GP.gridded((6, 5), ((0.0, 1.0), (-1.0, 2.0)), kinds=("matern12", "matern32"))
    assert g.spec.kinds == ("matern12", "matern32")
    assert tuple(f.m for f in g.spec.features) == (6, 5)
    assert isinstance(g.spec.features[0], CellIntegralFeature)

    v = GP.vff(8, (0.0, 1.0), kinds="matern52", ndim=2)
    assert v.spec.kinds == ("matern52", "matern52")
    assert all(isinstance(f, FourierFeature) for f in v.spec.features)

    s = GP.svgp(7, (0.0, 1.0))
    assert isinstance(s.spec.features[0], PointFeature)
    assert s.spec.features[0].m == 7

    e = GP.exact(ndim=2)
    assert isinstance(e.spec, exact.ExactGPSpec) and e.spec.ndim == 2

    with pytest.raises(ValueError):
        GP.asvgp(10, (0.0, 1.0), kinds="rbf")
    with pytest.raises(ValueError):
        GP.gridded(6, ((0.0, 1.0),), ndim=2)


def test_predict_before_fit_raises():
    m = GP.gridded(6, (0.0, 1.0))
    with pytest.raises(ValueError, match="fit"):
        m.predict(jnp.zeros((3,)))


def test_q_v_requires_cell_axes_or_explicit_grid(data1d):
    X, y = data1d
    m = GP.vff(8, (-0.3, 1.3)).fit(X, y, n_iters=20)
    with pytest.raises(ValueError, match="grid_axes"):
        m.q_v()
    grid = CellIntegralFeature.from_lims(8, 0.0, 1.0)
    qv = m.q_v(grid)  # single feature auto-wraps to a 1-tuple
    assert qv.mean.shape == (8,)
    assert np.all(np.isfinite(np.asarray(qv.mean)))


def test_exact_facade_q_v(data1d):
    X, y = data1d
    m = GP.exact().fit(X, y, n_iters=30)
    grid = CellIntegralFeature.from_lims(6, 0.0, 1.0)
    qv = m.q_v(grid)
    spec = exact.ExactGPSpec(kinds=("matern12",))
    qv_ref = exact.q_v(spec, m.params, X, y, (grid,), full_cov=False)
    np.testing.assert_allclose(np.asarray(qv.mean), np.asarray(qv_ref.mean),
                               rtol=1e-5, atol=1e-7)


def test_sampling_and_qdv_delegate(data1d):
    X, y = data1d
    m = GP.gridded(8, (0.0, 1.0)).fit(X, y, n_iters=20)
    key = jax.random.PRNGKey(3)
    s = m.sample(key, jnp.linspace(0, 1, 5), n_samples=4, n_features=128)
    s_ref = sampling.pathwise(m.spec, m.params, key, jnp.linspace(0, 1, 5),
                              data=(X, y), n_samples=4, n_features=128)
    np.testing.assert_allclose(np.asarray(s), np.asarray(s_ref), rtol=1e-6)
    sv = m.sample_q_v(key, n_samples=3, n_features=128)
    assert sv.shape == (3, 8) and np.all(np.isfinite(np.asarray(sv)))

    d = m.q_dv(axis=0)
    d_ref = sgpr.q_dv(m.spec, m.params, X, y, m.spec.features, axis=0, full_cov=False)
    np.testing.assert_allclose(np.asarray(d.mean), np.asarray(d_ref.mean), rtol=1e-5, atol=1e-6)


def test_checkpoint_roundtrip(tmp_path, data1d):
    X, y = data1d
    m = GP.gridded(6, (0.0, 1.0)).fit(X, y, n_iters=15)
    m.save(str(tmp_path / "ckpt"))
    m2 = GP.gridded(6, (0.0, 1.0)).restore(str(tmp_path / "ckpt"))
    jax.tree.map(lambda a, b: np.testing.assert_allclose(a, b), m.params, m2.params)
    m2._X, m2._y = X, y
    np.testing.assert_allclose(float(m.elbo()), float(m2.elbo()), rtol=1e-6)


def test_factories_infer_ndim_from_count_sequence():
    """ADVICE r2: a sequence count with scalar lims must build a model per
    entry, not be zip-truncated to 1-D."""
    m = GP.gridded((6, 5), (0.0, 1.0))
    assert m.spec.ndim == 2 and tuple(f.m for f in m.spec.features) == (6, 5)
    m = GP.vff((4, 3), (0.0, 1.0))
    assert m.spec.ndim == 2
    m = GP.svgp((7, 7), (0.0, 1.0))
    assert m.spec.ndim == 2
    # kinds sequence alone also sets ndim
    m = GP.gridded(6, (0.0, 1.0), kinds=("matern12", "matern32"))
    assert m.spec.ndim == 2
    # mismatches raise instead of truncating
    with pytest.raises(ValueError):
        GP.gridded((6, 5, 4), ((0.0, 1.0), (0.0, 1.0)))
    with pytest.raises(ValueError):
        GP.gridded((6, 0), (0.0, 1.0))


def test_fit_keeps_user_supplied_params(data1d):
    """ADVICE r2: fit() must not auto-init over explicit / restored params."""
    X, y = data1d
    base = GP.gridded(6, (0.0, 1.0))
    p = base.spec.init_params()
    p["noise"] = jnp.asarray(123.0)  # sentinel the auto-init would clobber
    m = GP(base.spec, params=jax.tree.map(lambda a: a, p))
    m.fit(X, y, n_iters=1, learning_rate=0.0)
    assert float(m.params["noise"]) == pytest.approx(123.0, rel=1e-6)
    # fresh params still auto-initialise by default
    m2 = GP(base.spec).fit(X, y, n_iters=1, learning_rate=0.0)
    assert float(m2.params["noise"]) != pytest.approx(0.1, rel=1e-6)
    # explicit initialise=True forces init even on supplied params
    m3 = GP(base.spec, params=jax.tree.map(lambda a: a, p))
    m3.fit(X, y, n_iters=1, learning_rate=0.0, initialise=True)
    assert float(m3.params["noise"]) != pytest.approx(123.0, rel=1e-3)


def test_q_v_cache_hits_on_equal_grids(data1d):
    """ADVICE r2: equal-but-distinct grid features share one compiled head."""
    from vggp_tpu.features import CellIntegralFeature

    X, y = data1d
    m = GP.gridded(6, (0.0, 1.0)).fit(X, y, n_iters=5)
    g1 = CellIntegralFeature.from_lims(4, 0.0, 1.0)
    g2 = CellIntegralFeature.from_lims(4, 0.0, 1.0)
    assert g1 is not g2
    q1 = m.q_v((g1,))
    n_cached = len(m._jitted)
    q2 = m.q_v((g2,))
    assert len(m._jitted) == n_cached  # content-keyed: no recompile
    np.testing.assert_allclose(np.asarray(q1.mean), np.asarray(q2.mean))


# --------------------------------------------------------------------------- #
# SVGP / Streaming facades (VERDICT r2 next #4)
# --------------------------------------------------------------------------- #

from vggp_tpu.api import SVGP, Streaming  # noqa: E402
from vggp_tpu.models import svgp as msvgp  # noqa: E402
from vggp_tpu import streaming as mstreaming  # noqa: E402


@pytest.fixture(scope="module")
def data2d():
    rng = np.random.default_rng(1)
    X = rng.uniform(0.0, 1.0, (200, 2)).astype(np.float32)
    y = (np.sin(4 * X[:, 0]) * np.cos(3 * X[:, 1])
         + 0.05 * rng.standard_normal(200)).astype(np.float32)
    return jnp.asarray(X), jnp.asarray(y)


def test_svgp_facade_matches_functional_core(data2d):
    X, y = data2d
    m = SVGP.gridded((8, 8), (0.0, 1.0), num_data=X.shape[0])
    assert m.spec.variational == "kron"  # ndim>=2 default
    m.fit(X, y, n_iters=30, batch_size=64, learning_rate=0.05, seed=0)

    # the functional core run with the same seed/params must agree exactly
    spec = msvgp.SVGPSpec(kinds=("matern12", "matern12"),
                          features=(CellIntegralFeature.from_lims(8, 0.0, 1.0),
                                    CellIntegralFeature.from_lims(8, 0.0, 1.0)),
                          num_data=X.shape[0], variational="kron")
    p0 = train.non_informative_init(spec.init_params(), X, y)
    p_ref, _ = train.fit_minibatch(
        lambda p, xb, yb: msvgp.loss(spec, p, xb, yb),
        p0, X, y, 30, 64, 0.05, seed=0)
    np.testing.assert_allclose(np.asarray(m.params["noise"]),
                               np.asarray(p_ref["noise"]), rtol=1e-6)

    qv = m.q_v()  # defaults to the model's own cell axes
    qv_ref = msvgp.q_v(spec, p_ref, spec.features, full_cov=False)
    np.testing.assert_allclose(np.asarray(qv.mean), np.asarray(qv_ref.mean),
                               rtol=1e-5, atol=1e-7)
    assert np.all(np.asarray(qv.var) > 0)

    xs = jnp.asarray(np.random.default_rng(2).uniform(0, 1, (7, 2)), jnp.float32)
    post = m.predict(xs, predictive=True)
    post_ref = msvgp.posterior_predictive(spec, p_ref, xs)
    np.testing.assert_allclose(np.asarray(post.mean), np.asarray(post_ref.mean),
                               rtol=1e-5, atol=1e-7)
    # data-free heads exist and are finite
    for g in (m.q_u(), m.p_v_u(), m.prior(xs), m.q_dv(axis=1)):
        assert np.all(np.isfinite(np.asarray(g.mean)))
    assert np.isfinite(m.elbo(X, y))


def test_svgp_facade_fit_keeps_supplied_params(data2d):
    X, y = data2d
    spec = SVGP.gridded((4, 4), (0.0, 1.0), num_data=X.shape[0]).spec
    p = spec.init_params()
    p["noise"] = jnp.asarray(123.0, p["noise"].dtype)
    m = SVGP(spec, params=jax.tree.map(lambda a: a, p))
    m.fit(X, y, n_iters=1, batch_size=32, learning_rate=0.0)
    assert float(m.params["noise"]) == pytest.approx(123.0, rel=1e-6)
    m2 = SVGP(spec).fit(X, y, n_iters=1, batch_size=32, learning_rate=0.0)
    assert float(m2.params["noise"]) != pytest.approx(123.0, rel=1e-3)


def test_svgp_spec_rejected_by_gp_facade():
    spec = SVGP.gridded((4, 4), (0.0, 1.0), num_data=10).spec
    with pytest.raises(TypeError, match="api.SVGP"):
        GP(spec)
    with pytest.raises(TypeError, match="SVGPSpec"):
        SVGP(GP.gridded(4, (0.0, 1.0)).spec)


def test_streaming_facade_matches_functional_core(data1d):
    X, y = data1d
    m = SVGP.gridded(12, (0.0, 1.0), num_data=X.shape[0])
    assert m.spec.variational == "full"  # 1D default
    m.non_informative_initialise(X, y)

    s = m.streaming(dtype=jnp.float64)
    s.assimilate(X[:25], y[:25]).assimilate(X[25:], y[25:])
    assert s.n_seen == X.shape[0]

    # same chunking as the facade: the f32 per-chunk whitens make chunked vs
    # one-batch agree only to f32 (covered in test_streaming); facade == core
    # must be exact
    state_ref = mstreaming.init_state(m.spec, jnp.float64)
    state_ref = mstreaming.assimilate(m.spec, m.params, state_ref, X[:25], y[:25])
    state_ref = mstreaming.assimilate(m.spec, m.params, state_ref, X[25:], y[25:])
    np.testing.assert_allclose(np.asarray(s.state["lam"]),
                               np.asarray(state_ref["lam"]), rtol=1e-10, atol=1e-12)

    xs = jnp.linspace(0.0, 1.0, 9)
    got = s.predict(xs)
    want = msvgp.posterior(m.spec, mstreaming.to_params(m.spec, m.params, state_ref), xs)
    np.testing.assert_allclose(np.asarray(got.mean), np.asarray(want.mean),
                               rtol=1e-6, atol=1e-8)

    # materialize: heads on the returned SVGP agree with the stream's own
    m2 = s.to_svgp()
    got2 = m2.predict(xs)
    np.testing.assert_allclose(np.asarray(got2.mean), np.asarray(got.mean),
                               rtol=1e-6, atol=1e-8)
    qv = s.q_v(CellIntegralFeature.from_lims(6, 0.0, 1.0))
    assert qv.mean.shape == (6,) and np.all(np.asarray(qv.var) > 0)


def test_additive_and_sum_facades(data2d):
    X, y = data2d
    m = GP.additive((6, 5), (0.0, 1.0)).fit(X, y, n_iters=25, learning_rate=0.05)
    assert np.isfinite(m.elbo())
    qv = m.q_v()  # additive: per-axis grids
    assert np.all(np.isfinite(np.asarray(qv.mean)))
    qu = m.q_u()
    assert np.all(np.isfinite(np.asarray(qu.mean)))

    coarse = GP.gridded((4, 4), (0.0, 1.0)).spec
    fine = GP.gridded((8, 8), (0.0, 1.0))  # GP instances are unwrapped
    ms = GP.sum([coarse, fine]).fit(X, y, n_iters=20, learning_rate=0.05)
    assert np.isfinite(ms.elbo())
    qv = ms.q_v()  # grid defaults to the first component's axes
    assert qv.mean.shape == (16,) and np.all(np.isfinite(np.asarray(qv.mean)))
    with pytest.raises(TypeError, match="SGPRSpec"):
        GP.sum([GP.exact()])


def test_multioutput_facade(data2d):
    X, y = data2d
    P = 2
    rng = np.random.default_rng(3)
    out = rng.integers(0, P, X.shape[0]).astype(np.float32)
    Xo = jnp.concatenate([X, out[:, None]], axis=1)
    yo = y + jnp.asarray(0.5 * out)
    m = GP.multioutput((5, 5), (0.0, 1.0), n_outputs=P, per_output_noise=True)
    assert m.spec.kinds[-1] == "coregion"
    m.fit(Xo, yo, n_iters=25, learning_rate=0.05)
    assert np.isfinite(m.elbo())
    post = m.predict(Xo[:7])
    assert np.all(np.isfinite(np.asarray(post.mean)))
    qv = m.q_v()  # cells x cells x outputs
    assert qv.mean.shape == (5 * 5 * P,)


def test_svgp_multioutput_accepts_variational_kwarg(data2d):
    """Regression: SVGP.multioutput hardcoded variational="kron" while also
    forwarding **spec_kwargs, so requesting the full (natgrad-trainable /
    streamable) family raised a duplicate-keyword TypeError."""
    from vggp_tpu.api import SVGP

    m = SVGP.multioutput(4, (0.0, 1.0), n_outputs=2, num_data=64, ndim=1,
                         variational="full")
    assert m.spec.variational == "full" and m.spec.kinds[-1] == "coregion"
    assert SVGP.multioutput(4, (0.0, 1.0), n_outputs=2, num_data=64,
                            ndim=1).spec.variational == "kron"


def test_streaming_rejects_noise_on_nonconjugate_spec():
    """Per-point noise silently ignored by the CVI route → now a loud error."""
    from vggp_tpu.api import SVGP

    m = SVGP.gridded(6, (0.0, 1.0), num_data=32, ndim=1,
                     likelihood="poisson", variational="full")
    s = m.streaming()
    X = jnp.linspace(0.1, 0.9, 8)
    y = jnp.ones(8)
    with pytest.raises(ValueError, match="noise"):
        s.assimilate(X, y, noise=jnp.full((8,), 0.1))


def test_vff_q_v_on_grid_past_domain(data1d):
    """VERDICT r2 next #8 end-to-end: the gridded head on a VFF model now
    covers cells outside the Fourier domain (Markov continuation integrals)."""
    X, y = data1d
    m = GP.vff(8, (0.1, 0.9), kinds="matern32").fit(X, y, n_iters=20)
    grid = CellIntegralFeature.from_lims(10, 0.0, 1.0)  # extends both sides
    qv = m.q_v(grid)
    assert qv.mean.shape == (10,)
    assert np.all(np.isfinite(np.asarray(qv.mean))) and np.all(np.asarray(qv.var) > 0)
    # the straddling-cell posterior mean must agree with a quadrature-split
    # grid summed over sub-cells (linearity of the integral functional)
    sub = CellIntegralFeature(mesh=np.linspace(0.0, 0.1, 6))
    qv_sub = m.q_v(sub)
    np.testing.assert_allclose(float(qv.mean[0]), float(np.sum(np.asarray(qv_sub.mean))),
                               rtol=1e-4, atol=1e-6)


def test_free_z_facade_matches_functional_core(data1d):
    """GP.free_z (the reference's nb61 Z-sweep model) delegates 1:1 to
    models.freesvgp, including the grid heads with explicit grid_axes."""
    from vggp_tpu.models import freesvgp

    rng = np.random.default_rng(2)
    X = jnp.asarray(rng.random((60, 2)), jnp.float32)
    y = jnp.asarray((np.sin(5 * np.asarray(X[:, 0])) * np.asarray(X[:, 1])
                     + 0.05 * rng.standard_normal(60)), jnp.float32)
    m = GP.free_z(12, ((0.0, 1.0), (0.0, 1.0)), kinds="matern32", seed=4)
    assert isinstance(m.spec, freesvgp.FreeSVGPSpec)
    assert m.params["z"].shape == (12, 2)
    m.fit(X, y, n_iters=30, learning_rate=0.05)

    spec, p = m.spec, m.params
    xs = jnp.asarray(rng.random((9, 2)), jnp.float32)
    want = freesvgp.posterior(spec, p, X, y, xs, full_cov=False)
    got = m.predict(xs)
    np.testing.assert_allclose(np.asarray(got.mean), np.asarray(want.mean),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got.var), np.asarray(want.var),
                               rtol=1e-4, atol=1e-6)

    grids = (CellIntegralFeature.from_lims(5, 0.0, 1.0),
             CellIntegralFeature.from_lims(4, 0.0, 1.0))
    want_qv = freesvgp.q_v(spec, p, X, y, grids, full_cov=False)
    got_qv = m.q_v(grid_axes=grids)
    np.testing.assert_allclose(np.asarray(got_qv.mean), np.asarray(want_qv.mean),
                               rtol=1e-5, atol=1e-6)
    got_qu = m.q_u()
    want_qu = freesvgp.q_u(spec, p, X, y)
    np.testing.assert_allclose(np.asarray(got_qu.mean), np.asarray(want_qu.mean),
                               rtol=1e-5, atol=1e-6)
    # grid heads without explicit axes must fail loudly (no feature default)
    with pytest.raises(ValueError, match="grid_axes"):
        m.q_v()


def test_iterative_facade_matches_qv_mean(data1d):
    X, y = data1d
    m = GP.gridded(40, (0.0, 1.0)).fit(X, y, n_iters=30, learning_rate=0.05)
    grids = (CellIntegralFeature.from_lims(10, 0.0, 1.0),)
    want = np.asarray(m.q_v(grids).mean)
    got = np.asarray(m.q_v_mean_iterative(grids))
    # facade params are float32: CG stagnates at ~1e-6 relative residual,
    # which maps to ~1e-4 relative solution error vs the dense pipeline
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=1e-5)
    xs = jnp.linspace(0.02, 0.98, 11)
    np.testing.assert_allclose(np.asarray(m.predict_mean_iterative(xs)),
                               np.asarray(m.predict(xs).mean),
                               rtol=2e-3, atol=1e-5)
    # the cached CG solve must not survive a param change
    assert m._w is not None
    m.fit(X, y, n_iters=2, learning_rate=0.01)
    assert m._w is None


def test_marginalized_facade_widen_variances(data1d):
    """Laplace-marginalized predictions: same means to leading order, strictly
    wider variances than the point-estimate heads (law of total variance)."""
    X, y = data1d
    m = GP.gridded(8, (0.0, 1.0)).fit(X, y, n_iters=60, learning_rate=0.05)
    xs = jnp.linspace(0.1, 0.9, 7)
    point = m.predict(xs)
    marg = m.predict_marginalized(xs, n_samples=48, seed=1)
    assert np.all(np.isfinite(np.asarray(marg.mean)))
    assert np.all(np.asarray(marg.var) >= np.asarray(point.var) * 0.5)
    assert float(np.mean(np.asarray(marg.var))) > float(np.mean(np.asarray(point.var)))
    qmarg = m.q_v_marginalized(n_samples=32, seed=2)
    qpoint = m.q_v()
    assert qmarg.mean.shape == qpoint.mean.shape
    assert float(np.mean(np.asarray(qmarg.var))) > 0.0
    # laplace state caches until params change
    assert m._laplace is not None
    m.fit(X, y, n_iters=2)
    assert m._laplace is None


def test_laplace_cache_rebuilds_on_different_floor(data1d):
    """A second laplace() call with a different min_eig_rel must rebuild,
    not silently return the stale state (ADVICE r4)."""
    X, y = data1d
    m = GP.gridded(6, (0.0, 1.0)).fit(X, y, n_iters=40, learning_rate=0.05)
    st1 = m.laplace(min_eig_rel=1e-8)
    assert m.laplace(min_eig_rel=1e-8) is st1          # same floor: cached
    st2 = m.laplace(min_eig_rel=1e-2)
    assert st2 is not st1                               # new floor: rebuilt
    assert m.laplace(min_eig_rel=1e-2) is st2


def test_hmc_facade_marginalized_heads(data1d):
    """GP.hmc() + method="hmc" marginalized heads (VERDICT r4 item 7):
    the HMC mixture must agree with the Laplace mixture on this easy,
    well-identified posterior, and the chain must mix."""
    X, y = data1d
    m = GP.gridded(8, (0.0, 1.0)).fit(X, y, n_iters=80, learning_rate=0.05)
    res = m.hmc(n_samples=128, n_chains=2, n_warmup=48, seed=3)
    assert 0.4 < float(res.accept_rate) <= 1.0
    assert m.hmc(n_samples=128, n_chains=2, n_warmup=48, seed=3) is res  # cached
    xs = jnp.linspace(0.1, 0.9, 7)
    marg_l = m.predict_marginalized(xs, n_samples=48, seed=1)
    marg_h = m.predict_marginalized(xs, n_samples=48, seed=1, method="hmc")
    span = float(np.max(np.asarray(marg_l.mean)) - np.min(np.asarray(marg_l.mean)))
    np.testing.assert_allclose(np.asarray(marg_h.mean), np.asarray(marg_l.mean),
                               atol=0.15 * span)
    assert np.all(np.asarray(marg_h.var) > 0)
    q_h = m.q_v_marginalized(n_samples=32, seed=2, method="hmc")
    assert q_h.mean.shape == m.q_v().mean.shape
    assert np.all(np.isfinite(np.asarray(q_h.mean)))
    with pytest.raises(ValueError, match="laplace.*hmc|hmc"):
        m.predict_marginalized(xs, method="nuts")
    # params change invalidates the chain
    m.fit(X, y, n_iters=2)
    assert m._hmc is None


def test_iterative_gradient_head_facades(data1d):
    """Matrix-free gridded-gradient and pointwise-gradient mean heads via
    the facade == the dense heads (f32 CG stagnation tolerance)."""
    X, y = data1d
    m = GP.gridded(24, (0.0, 1.0), kinds="matern32").fit(
        X, y, n_iters=40, learning_rate=0.05)
    # gradient heads amplify the w error by ~1/l; push the f32 CG to its
    # stagnation floor rather than the throughput-oriented default tol
    m.solve_iterative(tol=1e-7, maxiter=4000)
    grids = (CellIntegralFeature.from_lims(6, 0.0, 1.0),)
    want = np.asarray(m.q_dv(grids, axis=0).mean)
    got = np.asarray(m.q_dv_mean_iterative(grids, axis=0))
    # facade params are f32: the CG solve stagnates ~1e-6 relative residual
    # and the face-difference head amplifies the solution error to ~1%
    scale = float(np.max(np.abs(want)))
    np.testing.assert_allclose(got, want, atol=2e-2 * scale)
    xs = jnp.linspace(0.1, 0.9, 9)
    want_g = np.asarray(m.posterior_grad(xs, axis=0).mean)
    got_g = np.asarray(m.predict_grad_mean_iterative(xs, axis=0))
    np.testing.assert_allclose(got_g, want_g,
                               atol=2e-2 * float(np.max(np.abs(want_g))))


def test_pathwise_iterative_facade(data1d):
    """Matrix-free q_v with uncertainty through the facade: moments track
    the dense q_v head on a dense-feasible model."""
    X, y = data1d
    m = GP.gridded(32, (0.0, 1.0)).fit(X, y, n_iters=40, learning_rate=0.05)
    grids = (CellIntegralFeature.from_lims(6, 0.0, 1.0),)
    dense = m.q_v(grids)
    pw = m.q_v_pathwise_iterative(grids, n_samples=512, n_features=2048, seed=3)
    w_var = np.asarray(dense.var)
    np.testing.assert_allclose(np.asarray(pw.mean), np.asarray(dense.mean),
                               atol=5.0 * float(np.max(np.sqrt(w_var / 512))))
    np.testing.assert_allclose(np.asarray(pw.var), w_var, rtol=0.3,
                               atol=1e-6 * float(np.max(w_var)))
