"""Data-layer tests: track generator, synthetic field, Gulf Stream interface,
grid integrators."""

import numpy as np
import pytest

from vggp_tpu.data import (
    SyntheticGulfStream,
    generate_track,
    synthetic_ssh_field,
)
from vggp_tpu.data.missions import MissionData
from vggp_tpu.utils.integrators import average_grid_2d, simpson_grid_2d, trapz_grid_2d


def test_synthetic_field_shape_and_scale():
    field, lons, lats = synthetic_ssh_field(n=300, seed=1)
    assert field.shape == (300, 300)
    assert lons.shape == (300,) and lats.shape == (300,)
    # Gulf-Stream-like SSH amplitude, O(±1) m
    assert 0.2 < np.abs(field).max() < 2.0
    # deterministic in seed
    f2, _, _ = synthetic_ssh_field(n=300, seed=1)
    np.testing.assert_array_equal(field, f2)


def test_generate_track_geometry():
    field, lons, lats = synthetic_ssh_field(n=120, seed=0)
    lon, lat, val = generate_track(field, lons, lats, trajectory_gradient=2,
                                   track_sparsity=2.0, observation_sparsity=0)
    assert len(lon) == len(lat) == len(val) > 100
    # observations come from the field: check a few samples exactly
    lon_idx = np.searchsorted(lons, lon[:50])
    lat_idx = np.searchsorted(lats, lat[:50])
    np.testing.assert_allclose(val[:50], field[lat_idx, lon_idx])
    # sparsity subsamples
    lon_s, _, _ = generate_track(field, lons, lats, 2, 2.0, 5)
    assert len(lon_s) == int(np.ceil(len(lon) / 5))


def test_generate_track_validates_sparsity():
    field, lons, lats = synthetic_ssh_field(n=60)
    with pytest.raises(ValueError):
        generate_track(field, lons, lats, 1, 0.0, 0)
    with pytest.raises(ValueError):
        generate_track(field, lons, lats, 1, 11.0, 0)


def test_synthetic_gulfstream_interface():
    ds = SyntheticGulfStream(seed=4, n=240)
    X, y = ds.obs_train_data(3)
    assert X.ndim == 2 and X.shape[1] == 2 and len(y) == X.shape[0]
    assert X.min() >= 0.0 and X.max() <= 1.0
    g_avg = ds.grid_ref_data_average(12)
    g_trapz = ds.grid_ref_data_trapz(12)
    g_simp = ds.grid_ref_data_simpson(12)
    assert g_avg.shape == g_trapz.shape == g_simp.shape == (12, 12)
    # integral ≈ mean × cell area in scaled coords
    cell_area = (1.0 / 12) ** 2
    np.testing.assert_allclose(g_trapz, g_avg * cell_area, rtol=0.15, atol=2e-4)
    np.testing.assert_allclose(g_simp, g_trapz, rtol=0.05, atol=2e-4)


def test_synthetic_gulfstream_different_seeds_differ():
    a = SyntheticGulfStream(seed=1, n=120).grid_ref_data_average(6)
    b = SyntheticGulfStream(seed=2, n=120).grid_ref_data_average(6)
    assert np.abs(a - b).max() > 1e-3


def test_grid_integrators_constant_field():
    """On a constant field every cell integral is value × its exact area, and
    the cells tile the domain (shared edges — no dropped strips)."""
    n = 120
    xs = np.linspace(0, 1, n)
    field = np.full((n, n), 2.5)
    for fn in (trapz_grid_2d, simpson_grid_2d):
        out = fn(field, xs, ys=xs, n_grids=6)
        # total integral over the full domain is exact
        np.testing.assert_allclose(out.sum(), 2.5 * (xs[-1] - xs[0]) ** 2, rtol=1e-12)
        # every cell ≈ value × (1/6)² up to the sample-snap of cell edges
        # (119 steps / 6 cells → widths of 19 or 20 samples: up to ~8.5% area
        # deviation per cell, exactly tiling in total)
        np.testing.assert_allclose(out, 2.5 / 36, rtol=0.09)
    np.testing.assert_allclose(average_grid_2d(field, 6), 2.5)


def test_grid_integrators_rectangular_spacing():
    """Per-axis spacings are honored (regression: dx/dy were swapped)."""
    nx, ny = 91, 61
    xs = np.linspace(0, 2.0, nx)   # dx larger
    ys = np.linspace(0, 0.5, ny)
    # f(x, y) = x + 10y, integral over [x0,x1]×[y0,y1] computable exactly
    field = xs[:, None] + 10.0 * ys[None, :]
    out = trapz_grid_2d(field, xs, ys, 3)
    from vggp_tpu.utils.integrators import _cell_slices
    sx = _cell_slices(nx, 3)
    sy = _cell_slices(ny, 3)
    for i in range(3):
        for j in range(3):
            x0, x1 = xs[sx[i]][0], xs[sx[i]][-1]
            y0, y1 = ys[sy[j]][0], ys[sy[j]][-1]
            want = 0.5 * (x1**2 - x0**2) * (y1 - y0) + 10.0 * 0.5 * (y1**2 - y0**2) * (x1 - x0)
            np.testing.assert_allclose(out[i, j], want, rtol=1e-10)


def test_mission_data_rejects_bad_name(tmp_path):
    with pytest.raises(ValueError):
        MissionData(str(tmp_path), "not-a-mission", ["2013"], ["04"])


def test_mission_data_missing_archive_is_empty(tmp_path):
    """Missing month directories yield the empty-record fallback; the xarray
    adapter is never reached, so no ImportError regardless of environment
    (the pure pipeline is tested in tests/test_transforms.py)."""
    md = MissionData(str(tmp_path), "al", ["2013"], ["04"], verbose=False)
    assert md.mission_data == {} and len(md) == 0


def test_grid_integrators_reject_degenerate_cells():
    xs = np.linspace(0, 1, 10)
    field = np.ones((10, 10))
    with pytest.raises(ValueError, match="cells"):
        trapz_grid_2d(field, xs, xs, 12)


class _FakeVar:
    def __init__(self, values):
        self.values = np.asarray(values)


class _FakeDataset:
    """Duck-typed stand-in for the slice of the xarray.Dataset API that
    dataset_to_record touches (coords/data_vars/__contains__/__getitem__)."""

    def __init__(self, coords, data_vars):
        self.coords = {k: _FakeVar(v) for k, v in coords.items()}
        self.data_vars = {k: _FakeVar(v) for k, v in data_vars.items()}

    def __contains__(self, k):
        return k in self.coords or k in self.data_vars

    def __getitem__(self, k):
        return self.coords.get(k) or self.data_vars[k]


def test_dataset_to_record_ignores_higher_dim_ancillaries():
    """A >1-D ancillary variable (e.g. an (n, 2) QC matrix) must not poison
    the track-length vote and drop the real 1-D along-track variables
    (regression: max-raveled-length selection kept ONLY the 2-D variable)."""
    from vggp_tpu.data.missions import dataset_to_record

    n = 5
    ds = _FakeDataset(
        coords={"time": np.arange(n)},
        data_vars={
            "longitude": np.linspace(-60, -59, n),
            "latitude": np.linspace(38, 39, n),
            "sla_filtered": np.ones(n),
            "qc_matrix": np.zeros((n, 2)),      # 2-D ancillary
            "scalar_flag": np.asarray(3.0),     # 0-D ancillary
        },
    )
    rec = dataset_to_record(ds)
    assert sorted(rec) == ["latitude", "longitude", "sla_filtered", "time"]
    assert all(v.shape == (n,) for v in rec.values())


def test_dataset_to_record_anchors_length_on_time():
    """A mismatched-length 1-D variable is dropped; the along-track length is
    the time axis's, not whichever variable happens to be longest."""
    from vggp_tpu.data.missions import dataset_to_record

    ds = _FakeDataset(
        coords={"time": np.arange(4)},
        data_vars={
            "longitude": np.zeros(4),
            "latitude": np.zeros(4),
            "sla_filtered": np.ones(4),
            "bounds_1d": np.zeros(9),           # longer non-track 1-D var
        },
    )
    rec = dataset_to_record(ds)
    assert sorted(rec) == ["latitude", "longitude", "sla_filtered", "time"]
