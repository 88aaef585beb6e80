"""Data + evaluation utilities (reference ``src/utils/`` equivalents)."""

from vggp_tpu.utils import metrics, scalers, datagen, integrators  # noqa: F401
from vggp_tpu.utils.metrics import (  # noqa: F401
    mean_squared_error,
    mean_absolute_error,
    root_mean_squared_error,
    r_squared,
    negative_log_predictive_density,
    mean_standardized_log_loss,
    mean_squared_log_loss,
    evaluation_metric_row,
)
from vggp_tpu.utils.scalers import (  # noqa: F401
    min_max_scaling,
    min_max_inverse,
    z_scaling,
    z_inverse,
)
from vggp_tpu.utils.datagen import gen_1d, gen_2d  # noqa: F401
from vggp_tpu.utils.integrators import (  # noqa: F401
    integrate_1d,
    simpson_grid_2d,
    average_grid_2d,
    trapz_grid_2d,
    grad_trapz_grid_2d,
)
