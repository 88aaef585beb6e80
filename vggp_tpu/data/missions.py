"""CMEMS L3 along-track altimetry loaders.

Behavioral equivalent of the reference ``src/utils/dataloaders.py:14-180``
(``MissionData`` / ``MissionAgnosticData``): per-mission monthly NetCDF
directories, 0-360 → ±180 longitude wrap, lat/lon box filter, concatenation
along time, empty-dataset fallback. xarray is imported lazily.
"""

from __future__ import annotations

import os
from typing import List, Sequence, Tuple

AVAILABLE_MISSIONS = (
    "e1", "e1g", "e2", "tp", "tpn", "g2", "j1", "j1n", "j1g", "j2",
    "j2n", "j2g", "j3", "j3n", "en", "enn", "c2", "c2n", "al", "alg",
    "h2a", "h2ag", "h2b", "h2c", "s3a", "s3b", "s6a-hr", "s6a-lr",
)


def _require_xarray():
    try:
        import xarray as xr  # noqa: PLC0415
    except ImportError as e:  # pragma: no cover - env without xarray
        raise ImportError(
            "xarray is required for NetCDF mission loading; install xarray "
            "+ netCDF4, or use the synthetic data stand-ins in "
            "vggp_tpu.data.simulation / .gulfstream"
        ) from e
    return xr


class MissionData:
    """Along-track sea-level observations for one altimetry mission.

    Directory layout matches the CMEMS archive the reference uses:
    ``<root>/cmems_obs-sl_eur_phy-ssh_my_<mission>-l3-duacs_PT1S/<year>/<month>/*.nc``.
    """

    def __init__(
        self,
        root_folder: str,
        mission_name: str,
        years: Sequence[str],
        months: Sequence[str],
        latitude_range: Tuple[float, float] = (-90.0, 90.0),
        longitude_range: Tuple[float, float] = (-180.0, 180.0),
        verbose: bool = True,
    ):
        if mission_name not in AVAILABLE_MISSIONS:
            raise ValueError(
                f"Invalid mission name {mission_name!r}; must be one of {AVAILABLE_MISSIONS}"
            )
        self.mission_name = mission_name
        self.mission_folder = os.path.join(
            root_folder, f"cmems_obs-sl_eur_phy-ssh_my_{mission_name}-l3-duacs_PT1S"
        )
        self.years = list(years)
        self.months = list(months)
        self.min_latitude, self.max_latitude = latitude_range
        self.min_longitude, self.max_longitude = longitude_range
        self.verbose = verbose
        self.mission_data = self.load_data()

    def _log(self, msg: str) -> None:
        if self.verbose:
            print(msg)

    def load_data(self):
        xr = _require_xarray()
        datasets = []
        for year in self.years:
            for month in self.months:
                data_dir = os.path.join(self.mission_folder, year, month)
                if not os.path.isdir(data_dir):
                    self._log(f"> {year}-{month} | directory missing: {data_dir}")
                    continue
                files = sorted(os.path.join(data_dir, f) for f in os.listdir(data_dir))
                if not files:
                    self._log(f"> {year}-{month} | no data files in {data_dir}")
                    continue
                for path in files:
                    try:
                        ds = xr.open_dataset(path)
                    except Exception:
                        continue
                    ds["longitude"] = xr.where(
                        ds["longitude"] > 180.0, ds["longitude"] - 360.0, ds["longitude"]
                    )
                    mask = (
                        (ds["longitude"] > self.min_longitude)
                        & (ds["longitude"] < self.max_longitude)
                        & (ds["latitude"] > self.min_latitude)
                        & (ds["latitude"] < self.max_latitude)
                    )
                    datasets.append(ds.where(mask, drop=True))
                self._log(f"> {year}-{month} | completed")
        if not datasets:
            return xr.Dataset(attrs={"description": "Empty dataset, no data found."})
        if len(datasets) == 1:
            return datasets[0]
        return xr.concat(datasets, dim="time")

    def observations(self, var: str = "sla_filtered"):
        """(lon, lat, value) numpy arrays of non-NaN observations."""
        import numpy as np

        ds = self.mission_data
        if var not in ds:
            raise KeyError(f"{var!r} not in mission dataset (vars: {list(ds.data_vars)})")
        lon = np.asarray(ds["longitude"].values).ravel()
        lat = np.asarray(ds["latitude"].values).ravel()
        val = np.asarray(ds[var].values).ravel()
        ok = np.isfinite(lon) & np.isfinite(lat) & np.isfinite(val)
        return lon[ok], lat[ok], val[ok]


class MissionAgnosticData:
    """Concatenation of several missions over the same box/time window
    (reference ``dataloaders.py:141-180``)."""

    def __init__(
        self,
        root_folder: str,
        mission_names: Sequence[str],
        years: Sequence[str],
        months: Sequence[str],
        latitude_range: Tuple[float, float] = (-90.0, 90.0),
        longitude_range: Tuple[float, float] = (-180.0, 180.0),
        verbose: bool = True,
    ):
        xr = _require_xarray()
        self.missions = [
            MissionData(root_folder, name, years, months, latitude_range,
                        longitude_range, verbose=verbose)
            for name in mission_names
        ]
        nonempty = [m.mission_data for m in self.missions if len(m.mission_data.data_vars)]
        if not nonempty:
            self.data = xr.Dataset(attrs={"description": "Empty dataset, no data found."})
        elif len(nonempty) == 1:
            self.data = nonempty[0]
        else:
            self.data = xr.concat(nonempty, dim="time")
