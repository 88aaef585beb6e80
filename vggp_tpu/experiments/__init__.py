"""Experiment layer: the notebook-equivalents (reference L3) as scripts.

The reference drives everything from 8 Jupyter notebooks plus three modules
missing from its snapshot (``src.utils.experiments``, ``src.utils.misc``,
``src.utils.plotting`` — SURVEY.md §1). This package provides those
equivalents plus runnable experiment entry points:

- :mod:`vggp_tpu.experiments.misc`      — history/CV dicts, metric rows
- :mod:`vggp_tpu.experiments.plotting`  — training/posterior/grid plots
- :mod:`vggp_tpu.experiments.configs`   — experiment dictionaries (nb61)
- :mod:`vggp_tpu.experiments.loaders`   — ``load_gulf_stream_data``
- :mod:`vggp_tpu.experiments.univariate`  — notebooks 1 & 4
- :mod:`vggp_tpu.experiments.kronecker`   — notebooks 3 & 5
- :mod:`vggp_tpu.experiments.gulfstream`  — notebooks 6 & 61
- :mod:`vggp_tpu.experiments.northsea`    — notebook 7
"""

from vggp_tpu.experiments.misc import (
    make_training_history_dict,
    cross_validation_dict,
    evaluation_metric_row,
    check_tensors_equal,
)
from vggp_tpu.experiments.configs import EXP_1_TRAIN, EXP_1_VAL, EXP_1_TEST
from vggp_tpu.experiments.loaders import load_gulf_stream_data

__all__ = [
    "make_training_history_dict",
    "cross_validation_dict",
    "evaluation_metric_row",
    "check_tensors_equal",
    "EXP_1_TRAIN",
    "EXP_1_VAL",
    "EXP_1_TEST",
    "load_gulf_stream_data",
]
