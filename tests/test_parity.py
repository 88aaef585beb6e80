"""Cross-framework parity guard: torch-f64 reference oracle vs vggp (CPU).

A fast version of experiments/parity.py (fewer models, fewer iterations,
sparser tracks) asserting the two implementations agree on the gridded data
product — the property the committed results/parity tables certify at full
scale on TPU.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from vggp_tpu import train
from vggp_tpu.experiments import torch_oracle
from vggp_tpu.experiments.configs import EXP_1_TRAIN
from vggp_tpu.experiments.loaders import load_gulf_stream_data
from vggp_tpu.features import CellIntegralFeature
from vggp_tpu.models import freesvgp, sgpr

N_SPLINES = 10
N_ITERS = 60
LR = 0.05


@pytest.fixture(scope="module")
def window():
    ds = load_gulf_stream_data("data/dc_obs", "data/dc_ref", EXP_1_TRAIN)
    X, y = ds.obs_train_data(10)  # sparse: keep the exact/dense parts fast
    truth = ds.grid_ref_data_simpson(N_SPLINES)
    return np.asarray(X, np.float64), np.asarray(y, np.float64).reshape(-1), truth


def _metrics(truth, mean, var, y):
    from vggp_tpu.experiments.parity import _metric_row, METRIC_NAMES

    return dict(zip(METRIC_NAMES, _metric_row(truth, mean, var, y)))


def test_griddedgp_parity(window):
    X, y, truth = window
    grid_mesh = np.linspace(0.0, 1.0, N_SPLINES + 1)
    (mean_t, var_t), losses, _ = torch_oracle.fit(
        "griddedgp", X, y, grid_mesh, N_SPLINES, n_iters=N_ITERS, lr=LR)
    mt = _metrics(truth, mean_t, var_t, y)

    grids = (CellIntegralFeature.from_lims(N_SPLINES, 0.0, 1.0),) * 2
    spec = sgpr.SGPRSpec(
        kinds=("matern12", "matern12"),
        features=(CellIntegralFeature.from_lims(N_SPLINES, 0.0, 1.0),
                  CellIntegralFeature.from_lims(N_SPLINES, 0.0, 1.0)))
    Xj, yj = jnp.asarray(X), jnp.asarray(y)
    p0 = train.non_informative_init(spec.init_params(jnp.float64), Xj, yj)
    p, _ = train.fit(lambda q: sgpr.loss(spec, q, Xj, yj), p0, N_ITERS, LR)
    qv = sgpr.q_v(spec, p, Xj, yj, grids, full_cov=False)
    mv = _metrics(truth, qv.mean, qv.var, y)

    # same data, same protocol, independent frameworks: the gridded product
    # must match closely (identical math; only optimizer numerics differ)
    assert mv["rmse"] == pytest.approx(mt["rmse"], rel=0.05)
    assert mv["nlpd"] == pytest.approx(mt["nlpd"], rel=0.05, abs=0.1)
    assert mv["r2"] == pytest.approx(mt["r2"], abs=0.02)


def test_freesvgp_parity(window):
    X, y, truth = window
    grid_mesh = np.linspace(0.0, 1.0, N_SPLINES + 1)
    (mean_t, var_t), _, _ = torch_oracle.fit(
        "svgp", X, y, grid_mesh, N_SPLINES, n_iters=N_ITERS, lr=LR,
        m_svgp=25, seed=0)
    mt = _metrics(truth, mean_t, var_t, y)

    spec = freesvgp.FreeSVGPSpec(kinds=("matern12", "matern12"), m=25)
    Xj, yj = jnp.asarray(X), jnp.asarray(y)
    z0 = np.random.default_rng(0).random((25, 2))
    p0 = train.non_informative_init(
        spec.init_params(jnp.float64, z_init=z0), Xj, yj)
    grids = (CellIntegralFeature.from_lims(N_SPLINES, 0.0, 1.0),) * 2
    p, _ = train.fit(lambda q: freesvgp.loss(spec, q, Xj, yj), p0, N_ITERS, LR)
    qv = freesvgp.q_v(spec, p, Xj, yj, grids, full_cov=False)
    mv = _metrics(truth, qv.mean, qv.var, y)

    assert mv["rmse"] == pytest.approx(mt["rmse"], rel=0.05)
    assert mv["r2"] == pytest.approx(mt["r2"], abs=0.02)
