"""Data layer: altimetry mission loaders, Gulf Stream simulation, synthetic
stand-ins (reference ``src/utils/dataloaders.py`` equivalents).

xarray/netCDF are optional: the real-data loaders (:class:`MissionData`,
:class:`SimulationDataHour`, :class:`GulfStream`) import xarray lazily and
raise a clear error if it is missing; every experiment also runs against the
numpy-only synthetic stand-ins (:func:`synthetic_ssh_field`,
:class:`SyntheticGulfStream`) so the full pipeline is exercisable without
the CMEMS/NATL60 archives.
"""

from vggp_tpu.data import transforms
from vggp_tpu.data.missions import MissionData, MissionAgnosticData
from vggp_tpu.data.simulation import (
    SimulationDataDay,
    SimulationDataHour,
    generate_track,
    synthetic_ssh_field,
)
from vggp_tpu.data.gulfstream import GulfStream, SyntheticGulfStream

__all__ = [
    "MissionData",
    "MissionAgnosticData",
    "SimulationDataDay",
    "SimulationDataHour",
    "generate_track",
    "synthetic_ssh_field",
    "GulfStream",
    "SyntheticGulfStream",
    "transforms",
]
