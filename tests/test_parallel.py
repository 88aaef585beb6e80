"""Multi-device tests on the 8-virtual-CPU-device mesh (conftest sets
``--xla_force_host_platform_device_count=8``)."""

import numpy as np
import jax
import jax.numpy as jnp
import optax

from vggp_tpu import train
from vggp_tpu.features import CellIntegralFeature
from vggp_tpu.models import svgp
from vggp_tpu.parallel import (
    data_model_mesh,
    make_mesh,
    make_sharded_svgp_step,
    shard_batch,
)


def _spec_and_data(n=64, m1=6, m2=4):
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.random((n, 2)))
    y = jnp.asarray(np.sin(5 * np.asarray(X[:, 0])) + 0.1 * rng.standard_normal(n))
    g1 = CellIntegralFeature.from_lims(m1, 0.0, 1.0)
    g2 = CellIntegralFeature.from_lims(m2, 0.0, 1.0)
    spec = svgp.SVGPSpec(kinds=("matern12", "matern12"), features=(g1, g2),
                         num_data=n, variational="kron")
    return spec, X, y


def test_make_mesh_shape():
    mesh = make_mesh(("data", "model"), (4, 2))
    assert mesh.shape == {"data": 4, "model": 2}


def test_sharded_step_matches_single_device():
    """DP+MP sharded step == unsharded step (GSPMD is math-preserving)."""
    spec, X, y = _spec_and_data()
    params = train.non_informative_init(spec.init_params(jnp.float64), X, y)
    opt = optax.adam(0.05)

    # unsharded
    step0 = train.make_step_fn(lambda p, xb, yb: svgp.loss(spec, p, xb, yb), opt)
    raw0 = train.unconstrain(params)
    st0 = opt.init(raw0)
    raw0, st0, val0 = step0(raw0, st0, X, y)

    # sharded over 4 data x 2 model
    mesh = make_mesh(("data", "model"), (4, 2))
    init_fn, step_fn = make_sharded_svgp_step(spec, opt, mesh)
    raw1, st1 = init_fn(params)
    xb, yb = shard_batch(X, y, mesh)
    raw1, st1, val1 = step_fn(raw1, st1, xb, yb)

    assert float(val0) == jax.tree.reduce(lambda a, b: a, [float(val1)])
    flat0 = jax.tree.leaves(raw0)
    flat1 = jax.tree.leaves(raw1)
    for a, b in zip(flat0, flat1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-8, atol=1e-10)


def test_sharded_step_indivisible_model_axis_falls_back():
    """m2 not divisible by the model axis → replicate variational state."""
    spec, X, y = _spec_and_data(m2=5)
    params = train.non_informative_init(spec.init_params(jnp.float64), X, y)
    opt = optax.adam(0.05)
    mesh = make_mesh(("data", "model"), (4, 2))
    init_fn, step_fn = make_sharded_svgp_step(spec, opt, mesh)
    raw, st = init_fn(params)
    xb, yb = shard_batch(X, y, mesh)
    raw, st, val = step_fn(raw, st, xb, yb)
    assert np.isfinite(float(val))


def test_sharded_training_converges():
    spec, X, y = _spec_and_data(n=128)
    params = train.non_informative_init(spec.init_params(jnp.float64), X, y)
    opt = optax.adam(0.05)
    mesh = data_model_mesh(8, model_parallel=2)
    init_fn, step_fn = make_sharded_svgp_step(spec, opt, mesh)
    raw, st = init_fn(params)
    xb, yb = shard_batch(X, y, mesh)
    losses = []
    for _ in range(60):
        raw, st, val = step_fn(raw, st, xb, yb)
        losses.append(float(val))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] - 1.0


def test_sharded_step_two_model_axes_matches_single_device():
    """DP + 2-axis tensor-model parallelism (μ sharded over BOTH Kronecker
    axes) == unsharded step, bit-for-bit in f64."""
    spec, X, y = _spec_and_data(m1=6, m2=4)
    params = train.non_informative_init(spec.init_params(jnp.float64), X, y)
    opt = optax.adam(0.05)

    step0 = train.make_step_fn(lambda p, xb, yb: svgp.loss(spec, p, xb, yb), opt)
    raw0 = train.unconstrain(params)
    st0 = opt.init(raw0)
    raw0, st0, val0 = step0(raw0, st0, X, y)

    mesh = make_mesh(("data", "model1", "model2"), (2, 2, 2))
    init_fn, step_fn = make_sharded_svgp_step(
        spec, opt, mesh, model_axes=("model1", "model2"))
    raw1, st1 = init_fn(params)
    # both Kronecker axes must actually be sharded (divisible: 6 % 2, 4 % 2)
    mu_shard = raw1["q"]["mu"].sharding.spec
    assert tuple(mu_shard) == ("model1", "model2"), mu_shard
    assert tuple(raw1["q"]["raw_L1"].sharding.spec)[0] == "model1"
    assert tuple(raw1["q"]["raw_L2"].sharding.spec)[0] == "model2"
    xb, yb = shard_batch(X, y, mesh)
    raw1, st1, val1 = step_fn(raw1, st1, xb, yb)

    # GSPMD may partition the elementwise structured-factor assembly
    # (ops/kms.py) with a different reduction order than the unsharded
    # program - allow ULP-level drift, nothing more.
    np.testing.assert_allclose(float(val0), float(val1), rtol=1e-12)
    for a, b in zip(jax.tree.leaves(raw0), jax.tree.leaves(raw1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-8, atol=1e-10)


def test_sharded_step_3d_kron_matches_single_device():
    """ndim = 3 Kronecker variational state sharded over two model axes
    (μ (m₁,m₂,m₃) over ('model1','model2'), third axis replicated)."""
    rng = np.random.default_rng(0)
    n = 64
    X = jnp.asarray(rng.random((n, 3)))
    y = jnp.asarray(np.sin(5 * np.asarray(X[:, 0])) + 0.1 * rng.standard_normal(n))
    gs = (CellIntegralFeature.from_lims(4, 0.0, 1.0),
          CellIntegralFeature.from_lims(4, 0.0, 1.0),
          CellIntegralFeature.from_lims(3, 0.0, 1.0))
    spec = svgp.SVGPSpec(kinds=("matern12",) * 3, features=gs,
                         num_data=n, variational="kron")
    params = train.non_informative_init(spec.init_params(jnp.float64), X, y)
    opt = optax.adam(0.05)

    step0 = train.make_step_fn(lambda p, xb, yb: svgp.loss(spec, p, xb, yb), opt)
    raw0 = train.unconstrain(params)
    raw0, st0, val0 = step0(raw0, opt.init(raw0), X, y)

    mesh = make_mesh(("data", "model1", "model2"), (2, 2, 2))
    init_fn, step_fn = make_sharded_svgp_step(
        spec, opt, mesh, model_axes=("model1", "model2", None))
    raw1, st1 = init_fn(params)
    assert tuple(raw1["q"]["mu"].sharding.spec)[:2] == ("model1", "model2")
    xb, yb = shard_batch(X, y, mesh)
    raw1, st1, val1 = step_fn(raw1, st1, xb, yb)
    # GSPMD may partition the elementwise structured-factor assembly
    # (ops/kms.py) with a different reduction order than the unsharded
    # program - allow ULP-level drift, nothing more.
    np.testing.assert_allclose(float(val0), float(val1), rtol=1e-12)
    for a, b in zip(jax.tree.leaves(raw0), jax.tree.leaves(raw1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-8, atol=1e-10)


def test_graft_entry_dryrun():
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__ as g

    fn, args = g.entry()
    val = jax.jit(fn)(*args)
    assert np.isfinite(float(val))
    g.dryrun_multichip(8)


def test_graft_entry_dryrun_16_devices():
    """16-virtual-device mesh (4 data × 2 model1 × 2 model2) — needs its own
    process because the host-device count is fixed at backend init."""
    import os
    import subprocess
    import sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=16"
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PYTHONPATH", None)
    env["PYTHONPATH"] = root
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu');"
        "import __graft_entry__ as g; g.dryrun_multichip(16); print('ok16')"
    )
    out = subprocess.run([sys.executable, "-c", code], env=env, cwd=root,
                         capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "ok16" in out.stdout


def test_sharded_step_with_banded_apply():
    """m = 256 per axis engages the block-banded whiten apply (ops/kms.py)
    inside the GSPMD-sharded step — lax.cond + blocked gathers must
    partition; the small-m tests above all hit the dense guard."""
    from vggp_tpu import config

    assert config.BANDED_WHITEN_APPLY  # the default path is what ships
    feats = tuple(CellIntegralFeature.from_lims(256, 0.0, 1.0) for _ in range(2))
    spec = svgp.SVGPSpec(kinds=("matern12", "matern12"), features=feats,
                         num_data=10_000, variational="kron")
    params = spec.init_params(jnp.float32)
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.random((256, 2)), jnp.float32)
    y = jnp.asarray(rng.standard_normal(256), jnp.float32)
    opt = optax.adam(1e-2)
    mesh = make_mesh(("data", "model1", "model2"), (2, 2, 2))
    init_fn, step_fn = make_sharded_svgp_step(spec, opt, mesh,
                                              model_axes=("model1", "model2"))
    raw, st = init_fn(params)
    xb, yb = shard_batch(X, y, mesh)
    raw, st, val = step_fn(raw, st, xb, yb)
    assert np.isfinite(float(val))


def test_sharded_assimilate_matches_single_device():
    """Data-parallel streaming assimilation == unsharded update: the Λ/η
    accumulations are data-point sums, so GSPMD's psum of per-shard outer
    products must be exact (up to reduction order)."""
    from vggp_tpu import streaming
    from vggp_tpu.parallel import make_sharded_assimilate

    rng = np.random.default_rng(11)
    n = 64
    X = jnp.asarray(rng.random((n, 2)))
    y = jnp.asarray(np.sin(5 * np.asarray(X[:, 0])) + 0.1 * rng.standard_normal(n))
    g1 = CellIntegralFeature.from_lims(6, 0.0, 1.0)
    g2 = CellIntegralFeature.from_lims(4, 0.0, 1.0)
    spec = svgp.SVGPSpec(kinds=("matern12", "matern12"), features=(g1, g2),
                         num_data=n, variational="full")
    params = train.non_informative_init(spec.init_params(jnp.float64), X, y)

    s0 = streaming.assimilate(spec, params, streaming.init_state(spec, jnp.float64),
                              X, y)

    mesh = make_mesh(("data",), (8,))
    fn = make_sharded_assimilate(spec, params, mesh)
    xb, yb = shard_batch(X, y, mesh)
    s1 = fn(streaming.init_state(spec, jnp.float64), xb, yb)
    np.testing.assert_allclose(np.asarray(s0["lam"]), np.asarray(s1["lam"]),
                               rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(s0["eta"]), np.asarray(s1["eta"]),
                               rtol=1e-10, atol=1e-12)

    # heteroscedastic variant partitions too
    nvec = jnp.asarray(0.01 + 0.1 * rng.random(n))
    s0h = streaming.assimilate(spec, params, streaming.init_state(spec, jnp.float64),
                               X, y, noise=nvec)
    fnh = make_sharded_assimilate(spec, params, mesh, heteroscedastic=True)
    nb = jax.device_put(nvec, jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec("data")))
    s1h = fnh(streaming.init_state(spec, jnp.float64), xb, yb, nb)
    np.testing.assert_allclose(np.asarray(s0h["lam"]), np.asarray(s1h["lam"]),
                               rtol=1e-10, atol=1e-12)


def test_sharded_qv_matches_unsharded():
    """make_sharded_qv over the model-sharded state == plain q_v on the same
    (constrained) params — train and serve share one placement."""
    from vggp_tpu.parallel import make_sharded_qv

    spec, X, y = _spec_and_data(m1=8, m2=8)
    params = train.non_informative_init(spec.init_params(jnp.float64), X, y)
    opt = optax.adam(0.05)
    mesh = make_mesh(("data", "model1", "model2"), (2, 2, 2))
    init_fn, step_fn = make_sharded_svgp_step(
        spec, opt, mesh, model_axes=("model1", "model2"))
    raw, st = init_fn(params)
    xb, yb = shard_batch(X, y, mesh)
    for _ in range(3):
        raw, st, _ = step_fn(raw, st, xb, yb)

    grids = (CellIntegralFeature.from_lims(5, 0.0, 1.0),
             CellIntegralFeature.from_lims(4, 0.0, 1.0))
    got = make_sharded_qv(spec, mesh, grids)(raw)
    host_raw = jax.tree.map(np.asarray, raw)
    want = svgp.q_v(spec, train.constrain(jax.tree.map(jnp.asarray, host_raw)),
                    grids, full_cov=False)
    np.testing.assert_allclose(np.asarray(got.mean), np.asarray(want.mean),
                               rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(got.var), np.asarray(want.var),
                               rtol=1e-10, atol=1e-12)
    assert np.all(np.asarray(got.var) > 0)


def test_sharded_solve_w_matches_unsharded():
    """Data-sharded matrix-free CG (parallel.cg) == unsharded solve_w: the
    Kuf contractions psum per-shard partial sums over the data axis while
    the w-tensor stays replicated (VERDICT r4 item 2)."""
    from vggp_tpu.models import iterative, sgpr
    from vggp_tpu.parallel import make_sharded_qv_mean_cg, make_sharded_solve_w

    rng = np.random.default_rng(3)
    n = 96
    X = jnp.asarray(rng.random((n, 2)))
    y = jnp.asarray(np.sin(4 * np.asarray(X[:, 0])) * np.asarray(X[:, 1])
                    + 0.05 * rng.standard_normal(n))
    feats = (CellIntegralFeature.from_lims(16, 0.0, 1.0),
             CellIntegralFeature.from_lims(12, 0.0, 1.0))
    spec = sgpr.SGPRSpec(kinds=("matern12", "matern12"), features=feats,
                         jitter=1e-12)
    p = spec.init_params(jnp.float64)

    w0 = np.asarray(iterative.solve_w(spec, p, X, y, tol=1e-12, maxiter=4000))
    mesh = make_mesh(("data",), (8,))
    fn = make_sharded_solve_w(spec, mesh, tol=1e-12, maxiter=4000)
    xb, yb = shard_batch(X, y, mesh)
    w1 = fn(p, xb, yb)
    assert w1.sharding.is_fully_replicated
    # psum reduction order differs from the unsharded einsum; the ULP-level
    # per-contraction drift is amplified by cond(G) through the CG iterates
    np.testing.assert_allclose(np.asarray(w1), w0, rtol=1e-6, atol=1e-8)

    grids = (CellIntegralFeature.from_lims(6, 0.0, 1.0),
             CellIntegralFeature.from_lims(5, 0.0, 1.0))
    want_qv = np.asarray(iterative.q_v_mean_from_w(spec, p, grids,
                                                   jnp.asarray(w0)))
    got_qv = np.asarray(make_sharded_qv_mean_cg(spec, mesh, grids, tol=1e-12,
                                                maxiter=4000)(p, xb, yb))
    np.testing.assert_allclose(got_qv, want_qv, rtol=1e-6, atol=1e-9)


def test_sharded_pathwise_qv_matches_unsharded():
    """Data-sharded pathwise q(v) sampler == unsharded moments for the SAME
    key (draw-for-draw determinism must survive GSPMD partitioning)."""
    from vggp_tpu.models import iterative, sgpr
    from vggp_tpu.parallel import make_sharded_pathwise_qv

    rng = np.random.default_rng(4)
    n = 64
    x = jnp.asarray(np.sort(rng.uniform(size=n)))
    y = jnp.asarray(np.sin(6 * np.asarray(x)) + 0.1 * rng.standard_normal(n))
    feat = CellIntegralFeature.from_lims(20, 0.0, 1.0)
    spec = sgpr.SGPRSpec(kinds=("matern12",), features=(feat,), jitter=1e-12)
    p = {"axes": ({"variance": jnp.asarray(1.0), "lengthscale": jnp.asarray(0.25)},),
         "noise": jnp.asarray(0.05)}
    grids = (CellIntegralFeature.from_lims(8, 0.0, 1.0),)
    key = jax.random.PRNGKey(7)
    want = iterative.q_v_pathwise(spec, p, x, y, grids, key, n_samples=16,
                                  n_features=512, tol=1e-10)
    mesh = make_mesh(("data",), (8,))
    fn = make_sharded_pathwise_qv(spec, mesh, grids, n_samples=16,
                                  n_features=512, tol=1e-10)
    xb, yb = shard_batch(x, y, mesh)
    got = fn(p, xb, yb, key)
    np.testing.assert_allclose(np.asarray(got.mean), np.asarray(want.mean),
                               rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(np.asarray(got.var), np.asarray(want.var),
                               rtol=1e-6, atol=1e-9)


def test_sharded_qdv_heads_match_unsharded():
    """Data-sharded gridded-GRADIENT heads (mean + pathwise uncertainty,
    parallel.cg) == their unsharded iterative counterparts: the velocity
    product's sigma channel must survive GSPMD partitioning draw-for-draw
    (same key), exactly like the q_v heads."""
    from vggp_tpu.models import iterative, sgpr
    from vggp_tpu.parallel import (make_sharded_pathwise_qdv,
                                   make_sharded_qdv_mean_cg)

    rng = np.random.default_rng(5)
    n = 64
    x = jnp.asarray(np.sort(rng.uniform(size=n)))
    y = jnp.asarray(np.sin(6 * np.asarray(x)) + 0.1 * rng.standard_normal(n))
    feat = CellIntegralFeature.from_lims(20, 0.0, 1.0)
    spec = sgpr.SGPRSpec(kinds=("matern12",), features=(feat,), jitter=1e-12)
    p = {"axes": ({"variance": jnp.asarray(1.0), "lengthscale": jnp.asarray(0.25)},),
         "noise": jnp.asarray(0.05)}
    grids = (CellIntegralFeature.from_lims(8, 0.0, 1.0),)
    mesh = make_mesh(("data",), (8,))
    xb, yb = shard_batch(x, y, mesh)

    w0 = iterative.solve_w(spec, p, x, y, tol=1e-12, maxiter=2000)
    want_dm = np.asarray(iterative.q_dv_mean_from_w(spec, p, grids, 0, w0))
    got_dm = make_sharded_qdv_mean_cg(spec, mesh, grids, 0, tol=1e-12,
                                      maxiter=2000)(p, xb, yb)
    assert got_dm.sharding.is_fully_replicated
    np.testing.assert_allclose(np.asarray(got_dm), want_dm,
                               rtol=1e-6, atol=1e-9)

    key = jax.random.PRNGKey(9)
    want = iterative.q_dv_pathwise(spec, p, x, y, grids, 0, key, n_samples=16,
                                   n_features=512, tol=1e-10)
    got = make_sharded_pathwise_qdv(spec, mesh, grids, 0, n_samples=16,
                                    n_features=512, tol=1e-10)(p, xb, yb, key)
    np.testing.assert_allclose(np.asarray(got.mean), np.asarray(want.mean),
                               rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(np.asarray(got.var), np.asarray(want.var),
                               rtol=1e-6, atol=1e-9)
