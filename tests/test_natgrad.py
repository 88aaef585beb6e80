"""Natural-gradient variational updates.

The sharpest available oracle: for a Gaussian likelihood, full batch and
γ = 1, ONE natural-gradient step lands exactly on the optimal q(u), whose
ELBO is the collapsed (Titsias) SGPR bound at the same hyperparameters.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from vggp_tpu import train
from vggp_tpu.features import CellIntegralFeature
from vggp_tpu.models import sgpr, svgp
from vggp_tpu.utils import gen_1d


def _setup(n=40, m=8, noise=0.01, seed=0):
    f = lambda x: np.sin(4 * x)
    X, y = gen_1d(f, 0.0, 1.0, n)
    y = y + 0.05 * np.random.default_rng(seed).standard_normal(n)
    Xj, yj = jnp.asarray(X), jnp.asarray(y)
    grid = CellIntegralFeature.from_lims(m, 0.0, 1.0)
    spec_v = svgp.SVGPSpec(kinds=("matern12",), features=(grid,), num_data=n,
                           variational="full")
    spec_s = sgpr.SGPRSpec(kinds=("matern12",), features=(grid,))
    params = spec_v.init_params(jnp.float64)
    params["axes"][0]["lengthscale"] = jnp.asarray(0.3)
    params["axes"][0]["variance"] = jnp.asarray(1.0)
    params = dict(params, noise=jnp.asarray(noise))
    return spec_v, spec_s, params, Xj, yj


def test_one_natgrad_step_reaches_collapsed_bound():
    spec_v, spec_s, params, X, y = _setup()
    p_sgpr = {"axes": params["axes"], "noise": params["noise"]}
    collapsed = float(sgpr.elbo(spec_s, p_sgpr, X, y))
    # one full-batch natgrad step at gamma=1, hyperparameters frozen (lr=0)
    p1, hist = train.fit_natgrad(spec_v, params, X, y, n_iters=1, gamma=1.0,
                                 hyper_lr=0.0)
    e1 = float(svgp.elbo(spec_v, p1, X, y))
    assert e1 == pytest.approx(collapsed, rel=1e-8, abs=1e-8)
    # initial (prior) q is far below
    e0 = float(svgp.elbo(spec_v, params, X, y))
    assert e0 < collapsed - 1.0


def test_natgrad_hybrid_training_improves_elbo():
    spec_v, spec_s, params, X, y = _setup()
    p_fit, hist = train.fit_natgrad(spec_v, params, X, y, n_iters=60,
                                    gamma=1.0, hyper_lr=0.05)
    losses = np.asarray(hist["loss"])
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] - 1.0
    # after hybrid training plus one q-only polish step (the final hyper-Adam
    # update makes q lag by one step), the ELBO equals the collapsed bound at
    # the learned hyperparameters
    p_fin, _ = train.fit_natgrad(spec_v, p_fit, X, y, n_iters=1, gamma=1.0,
                                 hyper_lr=0.0)
    p_sgpr = {"axes": p_fin["axes"], "noise": p_fin["noise"]}
    collapsed = float(sgpr.elbo(spec_s, p_sgpr, X, y))
    achieved = float(svgp.elbo(spec_v, p_fin, X, y))
    assert achieved == pytest.approx(collapsed, rel=1e-6, abs=1e-6)


def test_natgrad_minibatch_runs():
    spec_v, _, params, X, y = _setup(n=60)
    p_fit, hist = train.fit_natgrad(spec_v, params, X, y, n_iters=50,
                                    gamma=0.3, hyper_lr=0.02, batch_size=20)
    assert np.isfinite(np.asarray(hist["loss"])).all()


def test_elbo_muS_consistent_with_elbo():
    spec_v, _, params, X, y = _setup()
    q = params["q"]
    Ls = svgp.chol_from_raw(q["raw_L"])
    S = Ls @ Ls.T
    a = float(svgp.elbo_muS(spec_v, params, q["mu"], S, X, y))
    b = float(svgp.elbo(spec_v, params, X, y))
    assert a == pytest.approx(b, rel=1e-10)


def test_natgrad_rejects_kron_family():
    grid = CellIntegralFeature.from_lims(4, 0.0, 1.0)
    spec = svgp.SVGPSpec(kinds=("matern12", "matern12"), features=(grid, grid),
                         num_data=10, variational="kron")
    params = spec.init_params(jnp.float64)
    with pytest.raises(ValueError, match="full variational family"):
        train.fit_natgrad(spec, params, jnp.zeros((4, 2)), jnp.zeros(4), 1)
