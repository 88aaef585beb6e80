"""Trainer tests: bijectors, init heuristics, fit loops, NaN guard."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from vggp_tpu import train
from vggp_tpu.features import CellIntegralFeature
from vggp_tpu.models import exact, sgpr, svgp
from vggp_tpu.utils import gen_1d


def _data(n=25, seed=0):
    f = lambda x: np.sin(2 * x) + np.cos(5 * x)
    X, y = gen_1d(f, 0.0, 1.0, n)
    y = y + 0.05 * np.random.default_rng(seed).standard_normal(n)
    return jnp.asarray(X), jnp.asarray(y)


def test_constrain_unconstrain_roundtrip():
    p = {"axes": ({"variance": jnp.asarray(1.7), "lengthscale": jnp.asarray(0.31)},),
         "noise": jnp.asarray(0.05), "q": {"mu": jnp.zeros(3)}}
    rt = train.constrain(train.unconstrain(p))
    np.testing.assert_allclose(float(rt["axes"][0]["variance"]), 1.7, rtol=1e-6)
    np.testing.assert_allclose(float(rt["axes"][0]["lengthscale"]), 0.31, rtol=1e-6)
    np.testing.assert_allclose(float(rt["noise"]), 0.05, rtol=1e-6)
    # non-positive-key leaves untouched
    np.testing.assert_array_equal(np.asarray(rt["q"]["mu"]), np.zeros(3))


def test_constrain_applies_noise_floor():
    raw = {"noise": jnp.asarray(-1e6)}  # softplus ≈ 0
    c = train.constrain(raw)
    assert float(c["noise"]) >= train.FLOORS["noise"]


def test_non_informative_init():
    X, y = _data()
    grid = CellIntegralFeature.from_lims(10, 0.0, 1.0)
    spec = sgpr.SGPRSpec(kinds=("matern12",), features=(grid,))
    p = train.non_informative_init(spec.init_params(jnp.float64), X, y)
    assert float(p["axes"][0]["variance"]) == pytest.approx(float(jnp.var(y)))
    assert float(p["noise"]) == pytest.approx(float(jnp.var(y)) / 4.0)


def test_fit_decreases_loss():
    X, y = _data()
    grid = CellIntegralFeature.from_lims(10, 0.0, 1.0)
    spec = sgpr.SGPRSpec(kinds=("matern12",), features=(grid,))
    p0 = train.non_informative_init(spec.init_params(jnp.float64), X, y)
    p_fit, hist = train.fit(lambda q: sgpr.loss(spec, q, X, y), p0, 200, 0.05)
    loss = np.asarray(hist["loss"])
    assert np.isfinite(loss).all()
    assert loss[-1] < loss[0] - 1.0
    # history carries the reference's per-iteration record keys (nb61 cell 35)
    for k in ("elbo", "noise", "scale_sigma_1", "lengthscale_1"):
        assert k in hist and len(np.asarray(hist[k])) == 200


def test_fit_minibatch_decreases_loss():
    X, y = _data(n=200)
    grid = CellIntegralFeature.from_lims(16, 0.0, 1.0)
    spec = svgp.SVGPSpec(kinds=("matern12",), features=(grid,), num_data=200)
    p0 = train.non_informative_init(spec.init_params(jnp.float64), X, y)
    p_fit, hist = train.fit_minibatch(
        lambda q, xb, yb: svgp.loss(spec, q, xb, yb), p0, X, y,
        n_iters=300, batch_size=64, learning_rate=0.05)
    loss = np.asarray(hist["loss"])
    assert np.isfinite(loss).all()
    assert np.mean(loss[-20:]) < np.mean(loss[:20]) - 1.0


def test_guarded_update_skips_nonfinite():
    opt = optax.adam(0.1)
    raw = {"a": jnp.asarray(1.0)}
    state = opt.init(raw)
    ok_grads = {"a": jnp.asarray(0.5)}
    bad_grads = {"a": jnp.asarray(jnp.nan)}
    new_raw, new_state = train.guarded_update(opt, raw, state, jnp.asarray(1.0), ok_grads)
    assert float(new_raw["a"]) != 1.0
    kept_raw, kept_state = train.guarded_update(opt, raw, state, jnp.asarray(1.0), bad_grads)
    assert float(kept_raw["a"]) == 1.0
    # nan loss with finite grads must also be skipped
    kept_raw, _ = train.guarded_update(opt, raw, state, jnp.asarray(jnp.nan), ok_grads)
    assert float(kept_raw["a"]) == 1.0


def test_checkpoint_roundtrip(tmp_path):
    grid = CellIntegralFeature.from_lims(5, 0.0, 1.0)
    spec = sgpr.SGPRSpec(kinds=("matern12",), features=(grid,))
    p = spec.init_params(jnp.float32)
    train.save_checkpoint(str(tmp_path / "ckpt"), p, step=3)
    q = train.load_checkpoint(str(tmp_path / "ckpt"), step=3)
    flat_p, _ = jax.tree.flatten(p)
    flat_q, _ = jax.tree.flatten(q)
    for a, b in zip(flat_p, flat_q):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_metrics_logger(tmp_path):
    path = tmp_path / "m.jsonl"
    log = train.MetricsLogger(str(path))
    log.log(0, loss=1.5, noise=0.1)
    log.log(1, loss=1.2, noise=0.09)
    import json
    lines = [json.loads(l) for l in path.read_text().splitlines()]
    assert lines[1] == {"step": 1, "loss": 1.2, "noise": 0.09}


def test_init_restarts_shapes_and_base():
    X, y = _data()
    grid = CellIntegralFeature.from_lims(8, 0.0, 1.0)
    spec = sgpr.SGPRSpec(kinds=("matern12",), features=(grid,))
    p0 = train.non_informative_init(spec.init_params(jnp.float64), X, y)
    pb = train.init_restarts(p0, jax.random.PRNGKey(0), 5, spread=0.7)
    # every leaf grew a leading restart axis
    for a, b in zip(jax.tree.leaves(pb), jax.tree.leaves(p0)):
        assert a.shape == (5,) + jnp.shape(b)
    # restart 0 is the base init verbatim; others are jittered but positive
    np.testing.assert_allclose(float(pb["noise"][0]), float(p0["noise"]))
    np.testing.assert_allclose(float(pb["axes"][0]["variance"][0]),
                               float(p0["axes"][0]["variance"]))
    assert np.all(np.asarray(pb["noise"]) > 0)
    assert len(np.unique(np.asarray(pb["noise"]))) == 5
    # deterministic given the key
    pb2 = train.init_restarts(p0, jax.random.PRNGKey(0), 5, spread=0.7)
    np.testing.assert_array_equal(np.asarray(pb["axes"][0]["lengthscale"]),
                                  np.asarray(pb2["axes"][0]["lengthscale"]))


def test_fit_restarts_matches_sequential_and_picks_best():
    X, y = _data()
    grid = CellIntegralFeature.from_lims(8, 0.0, 1.0)
    spec = sgpr.SGPRSpec(kinds=("matern12",), features=(grid,))
    loss_fn = lambda q: sgpr.loss(spec, q, X, y)
    p0 = train.non_informative_init(spec.init_params(jnp.float64), X, y)
    pb = train.init_restarts(p0, jax.random.PRNGKey(1), 4, spread=0.8)
    best, hist = train.fit_restarts(loss_fn, pb, n_iters=60, learning_rate=0.05)
    loss = np.asarray(hist["loss"])
    assert loss.shape == (4, 60)
    assert np.isfinite(loss).all()
    # the vmapped program equals running each restart through train.fit
    for r in range(4):
        p_r = jax.tree.map(lambda v: v[r], pb)
        _, hist_r = train.fit(loss_fn, p_r, 60, 0.05)
        np.testing.assert_allclose(loss[r], np.asarray(hist_r["loss"]),
                                   rtol=1e-10, atol=1e-12)
    # winner = argmin of final (pre-update-convention) losses, and the best
    # params equal the sequential fit of that same restart
    assert hist["best"] == int(np.argmin(loss[:, -1]))
    p_seq, _ = train.fit(
        loss_fn, jax.tree.map(lambda v: v[hist["best"]], pb), 60, 0.05)
    np.testing.assert_allclose(float(loss_fn(best)), float(loss_fn(p_seq)),
                               rtol=1e-10)


def test_fit_lbfgs_beats_adam_iteration_count():
    X, y = _data()
    grid = CellIntegralFeature.from_lims(10, 0.0, 1.0)
    spec = sgpr.SGPRSpec(kinds=("matern12",), features=(grid,))
    loss_fn = lambda q: sgpr.loss(spec, q, X, y)
    p0 = train.non_informative_init(spec.init_params(jnp.float64), X, y)
    p_lb, hist_lb = train.fit_lbfgs(loss_fn, p0, n_iters=60)
    lb = np.asarray(hist_lb["loss"])
    assert np.isfinite(lb).all()
    # 60 L-BFGS iterations reach at least what 1000 Adam steps reach
    _, hist_adam = train.fit(loss_fn, p0, 1000, 0.05)
    assert lb[-1] <= np.asarray(hist_adam["loss"])[-1] + 0.05
