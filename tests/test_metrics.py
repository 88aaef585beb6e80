"""utils.metrics oracles: reference formulas (evaluation_metric_row vs the
jnp functions), CRPS closed form vs numerical integration, coverage/PIT
calibration on synthetic calibrated and miscalibrated predictions."""

import numpy as np
import pytest

from vggp_tpu.utils import metrics


def _fake_predictions(n=4000, seed=0):
    rng = np.random.default_rng(seed)
    mu = rng.standard_normal(n)
    sd = np.exp(0.3 * rng.standard_normal(n))
    y = mu + sd * rng.standard_normal(n)  # perfectly calibrated
    return y, mu, sd**2


def test_evaluation_row_matches_jnp_functions():
    import jax.numpy as jnp

    y, mu, var = _fake_predictions(200)
    ty = np.linspace(-1, 2, 50)
    row = metrics.evaluation_metric_row(y, mu, var, ty)
    y2, mu2 = jnp.asarray(y.reshape(-1, 1)), jnp.asarray(mu.reshape(-1, 1))
    assert row[0] == pytest.approx(float(metrics.mean_squared_error(y2, mu2)), rel=1e-10)
    assert row[1] == pytest.approx(float(metrics.mean_absolute_error(y2, mu2)), rel=1e-10)
    assert row[2] == pytest.approx(float(metrics.root_mean_squared_error(y2, mu2)), rel=1e-10)
    assert row[3] == pytest.approx(float(metrics.r_squared(y2, mu2)), rel=1e-10)
    assert row[4] == pytest.approx(
        float(metrics.negative_log_predictive_density(
            jnp.asarray(y), jnp.asarray(mu), jnp.asarray(var))), rel=1e-10)
    assert row[5] == pytest.approx(
        float(metrics.mean_standardized_log_loss(
            jnp.asarray(y), jnp.asarray(mu), jnp.asarray(var), jnp.asarray(ty))),
        rel=1e-9)


def test_crps_closed_form_matches_numerical_integral():
    """CRPS(F, y) = ∫ (F(t) − 1{t ≥ y})² dt, integrated on a wide fine grid."""
    from scipy.special import erf

    def Phi(t, mu, sd):
        return 0.5 * (1.0 + erf((t - mu) / (sd * np.sqrt(2.0))))

    for (mu, sd, y) in [(0.0, 1.0, 0.7), (2.0, 0.5, 0.0), (-1.0, 2.0, -1.0)]:
        # split at the indicator's jump so the trapezoid never straddles it
        lo = np.linspace(mu - 12 * sd, y, 100_001)
        hi = np.linspace(y, mu + 12 * sd, 100_001)
        oracle = (np.trapezoid(Phi(lo, mu, sd) ** 2, lo)
                  + np.trapezoid((Phi(hi, mu, sd) - 1.0) ** 2, hi))
        got = metrics.crps_gaussian(np.asarray([y]), np.asarray([mu]),
                                    np.asarray([sd**2]))
        assert got == pytest.approx(oracle, rel=1e-6)


def test_crps_small_sigma_limit_is_mae():
    y = np.asarray([1.0, -2.0, 0.3])
    mu = np.asarray([0.5, -2.5, 0.3])
    got = metrics.crps_gaussian(y, mu, np.full(3, 1e-16))
    assert got == pytest.approx(np.mean(np.abs(y - mu)), rel=1e-6)


def test_crps_proper_scoring_prefers_true_variance():
    """Strictly proper: the data-generating σ² scores better than over- or
    under-dispersed predictive variances on calibrated data."""
    y, mu, var = _fake_predictions(20_000, seed=3)
    s_true = metrics.crps_gaussian(y, mu, var)
    assert s_true < metrics.crps_gaussian(y, mu, 4.0 * var)
    assert s_true < metrics.crps_gaussian(y, mu, 0.25 * var)


def test_interval_coverage_calibrated_and_not():
    y, mu, var = _fake_predictions(50_000, seed=1)
    for level in (0.5, 0.9, 0.95):
        assert metrics.interval_coverage(y, mu, var, level) == pytest.approx(
            level, abs=0.01)
    # overconfident variances under-cover
    assert metrics.interval_coverage(y, mu, 0.25 * var, 0.95) < 0.8


def test_calibration_curve_tracks_diagonal():
    y, mu, var = _fake_predictions(50_000, seed=2)
    nominal, emp = metrics.calibration_curve(y, mu, var)
    np.testing.assert_allclose(emp, nominal, atol=0.012)
    # an underconfident model sits above the diagonal everywhere
    _, emp_wide = metrics.calibration_curve(y, mu, 4.0 * var)
    assert np.all(emp_wide > nominal)
