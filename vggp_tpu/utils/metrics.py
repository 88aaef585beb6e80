"""Evaluation metrics.

mse/mae/rmse/r² mirror reference ``src/utils/evaluationmetrics.py:6-54``
(including the 2D-shape contract). nlpd and msll are the two metrics the
reference imports from a missing module (SURVEY.md §1 "missing-but-referenced"):
their behavior is recovered from nb61 call sites — an evaluation row is
``[mse, mae, rmse, r2, nlpd, msll]``.
"""

from __future__ import annotations

import jax.numpy as jnp


def _check(true, pred):
    if true.ndim != 2 or pred.ndim != 2:
        raise AssertionError(
            f"tensors must be 2D, got {true.ndim}D and {pred.ndim}D"
        )
    if true.shape != pred.shape:
        raise AssertionError(f"shape mismatch: {true.shape} vs {pred.shape}")


def mean_squared_error(true: jnp.ndarray, pred: jnp.ndarray) -> jnp.ndarray:
    _check(true, pred)
    return jnp.mean((true - pred) ** 2)


def mean_absolute_error(true: jnp.ndarray, pred: jnp.ndarray) -> jnp.ndarray:
    _check(true, pred)
    return jnp.mean(jnp.abs(true - pred))


def root_mean_squared_error(true: jnp.ndarray, pred: jnp.ndarray) -> jnp.ndarray:
    _check(true, pred)
    return jnp.sqrt(jnp.mean((true - pred) ** 2))


def r_squared(true: jnp.ndarray, pred: jnp.ndarray) -> jnp.ndarray:
    _check(true, pred)
    rss = jnp.sum((true - pred) ** 2)
    tss = jnp.sum((true - jnp.mean(true)) ** 2)
    return 1.0 - rss / tss


def negative_log_predictive_density(
    true: jnp.ndarray, pred_mean: jnp.ndarray, pred_var: jnp.ndarray
) -> jnp.ndarray:
    """NLPD = −mean log N(y* | μ*, σ*²) under the predictive marginals."""
    true = jnp.reshape(true, (-1,))
    mu = jnp.reshape(pred_mean, (-1,))
    var = jnp.reshape(pred_var, (-1,))
    logp = -0.5 * jnp.log(2.0 * jnp.pi * var) - (true - mu) ** 2 / (2.0 * var)
    return -jnp.mean(logp)


def mean_standardized_log_loss(
    true: jnp.ndarray,
    pred_mean: jnp.ndarray,
    pred_var: jnp.ndarray,
    train_y: jnp.ndarray,
) -> jnp.ndarray:
    """MSLL: NLPD minus the NLPD of the trivial N(mean(y_train), var(y_train))."""
    true = jnp.reshape(true, (-1,))
    ty = jnp.reshape(train_y, (-1,))
    mu0, var0 = jnp.mean(ty), jnp.var(ty)
    nlpd_model = negative_log_predictive_density(true, pred_mean, pred_var)
    logp0 = -0.5 * jnp.log(2.0 * jnp.pi * var0) - (true - mu0) ** 2 / (2.0 * var0)
    return nlpd_model - (-jnp.mean(logp0))


# nb61 imports the name `mean_squared_log_loss`; its printed values are
# standardized log losses — alias accordingly.
mean_squared_log_loss = mean_standardized_log_loss


def evaluation_metric_row(
    true,
    pred_mean,
    pred_var,
    train_y,
):
    """[mse, mae, rmse, r2, nlpd, msll] — nb61 cell 65 row layout.

    Computed with host numpy: this runs in experiment bookkeeping loops where
    eager per-op dispatch on remote-TPU backends costs a network round trip
    per op. The single source of these six formulas — the experiments layer
    delegates here.
    """
    import numpy as np

    truth = np.asarray(true, dtype=np.float64).reshape(-1)
    mean = np.asarray(pred_mean, dtype=np.float64).reshape(-1)
    var = np.asarray(pred_var, dtype=np.float64).reshape(-1)
    ty = np.asarray(train_y, dtype=np.float64).reshape(-1)
    err = truth - mean
    mse = float(np.mean(err**2))
    mae = float(np.mean(np.abs(err)))
    rmse = float(np.sqrt(mse))
    r2 = float(1.0 - np.sum(err**2) / np.sum((truth - truth.mean()) ** 2))
    logp = -0.5 * np.log(2 * np.pi * var) - err**2 / (2 * var)
    nlpd = float(-np.mean(logp))
    mu0, var0 = ty.mean(), ty.var()
    logp0 = -0.5 * np.log(2 * np.pi * var0) - (truth - mu0) ** 2 / (2 * var0)
    msll = nlpd - float(-np.mean(logp0))
    return [mse, mae, rmse, r2, nlpd, msll]


# --------------------------------------------------------------------------- #
# Calibration / proper-scoring metrics (beyond-reference).
#
# Host-numpy, like evaluation_metric_row: these run in experiment bookkeeping
# loops where eager per-op dispatch on a remote-TPU backend costs a network
# round trip per op.
# --------------------------------------------------------------------------- #


def crps_gaussian(true, pred_mean, pred_var) -> float:
    """Mean continuous ranked probability score of Gaussian predictive
    marginals — a strictly proper scoring rule in the units of y (unlike
    NLPD, it is robust to variance underestimates at outliers).

    Closed form (Gneiting & Raftery 2007, eq. 21):
    CRPS(N(μ,σ²), y) = σ·[ z(2Φ(z) − 1) + 2φ(z) − 1/√π ],  z = (y − μ)/σ.
    Lower is better; for σ → 0 it reduces to |y − μ|.
    """
    import numpy as np
    from scipy.special import erf

    y = np.asarray(true, dtype=np.float64).reshape(-1)
    mu = np.asarray(pred_mean, dtype=np.float64).reshape(-1)
    sd = np.sqrt(np.asarray(pred_var, dtype=np.float64).reshape(-1))
    z = (y - mu) / sd
    cdf = 0.5 * (1.0 + erf(z / np.sqrt(2.0)))
    pdf = np.exp(-0.5 * z * z) / np.sqrt(2.0 * np.pi)
    return float(np.mean(sd * (z * (2.0 * cdf - 1.0) + 2.0 * pdf - 1.0 / np.sqrt(np.pi))))


def interval_coverage(true, pred_mean, pred_var, level: float = 0.95) -> float:
    """Empirical coverage of the central ``level`` predictive interval.

    A calibrated model returns ≈ ``level``; systematically below means
    overconfident predictive variances (the failure mode CLAUDE.md's
    absolute-jitter note documents for streamed states).
    """
    import numpy as np
    from scipy.special import ndtri

    y = np.asarray(true, dtype=np.float64).reshape(-1)
    mu = np.asarray(pred_mean, dtype=np.float64).reshape(-1)
    sd = np.sqrt(np.asarray(pred_var, dtype=np.float64).reshape(-1))
    half = ndtri(0.5 + level / 2.0)  # e.g. 1.959964 at level 0.95
    return float(np.mean(np.abs(y - mu) <= half * sd))


def calibration_curve(true, pred_mean, pred_var, levels=None):
    """(nominal, empirical) central-interval coverage pairs via the PIT.

    Returns two float64 arrays; plot empirical vs nominal — a calibrated
    model tracks the diagonal, above = underconfident, below = overconfident.
    """
    import numpy as np

    if levels is None:
        levels = np.linspace(0.1, 0.9, 9)
    levels = np.asarray(levels, dtype=np.float64)
    emp = np.asarray(
        [interval_coverage(true, pred_mean, pred_var, level=l) for l in levels]
    )
    return levels, emp
