"""Pure data-layer transform tests: the lon-wrap / box-mask / concat /
time-window / mission-pipeline logic exercised with in-repo fake records —
no xarray, no archives (reference ``src/utils/dataloaders.py:100-137,428-459``
behaviors pinned directly)."""

import numpy as np
import pytest

from vggp_tpu.data import transforms as tr
from vggp_tpu.data.missions import MissionAgnosticData, MissionData


def make_record(lon, lat, val=None, time=None):
    lon = np.asarray(lon, dtype=float)
    rec = {"longitude": lon, "latitude": np.asarray(lat, dtype=float)}
    rec["sla_filtered"] = (np.asarray(val, dtype=float) if val is not None
                           else np.zeros_like(lon))
    if time is not None:
        rec["time"] = np.asarray(time)
    return rec


# --------------------------------------------------------------------------- #
# Spatial filters
# --------------------------------------------------------------------------- #

def test_wrap_longitude_0_360_to_pm180():
    lon = np.array([0.0, 179.9, 180.0, 180.1, 359.0, 300.0, -10.0])
    out = tr.wrap_longitude(lon)
    # ref dataloaders.py:102: strictly-greater-than-180 wraps; 180 stays
    np.testing.assert_allclose(out, [0.0, 179.9, 180.0, -179.9, -1.0, -60.0, -10.0])


def test_box_mask_strict_inequalities():
    # points exactly on the box edge are EXCLUDED (ref :104-106 uses >/<)
    lon = np.array([-65.0, -60.0, -55.0, -70.0])
    lat = np.array([33.0, 38.0, 43.0, 38.0])
    m = tr.box_mask(lon, lat, latitude_range=(33.0, 43.0), longitude_range=(-65.0, -55.0))
    np.testing.assert_array_equal(m, [False, True, False, False])


def test_filter_track_wraps_then_masks():
    # 305°E == -55°W: must be wrapped BEFORE the box test or it is lost
    rec = make_record(lon=[299.0, 305.1, 10.0], lat=[38.0, 38.0, 38.0], val=[1, 2, 3])
    out = tr.filter_track(rec, latitude_range=(33.0, 43.0), longitude_range=(-65.0, -50.0))
    np.testing.assert_allclose(out["longitude"], [-61.0, -54.9])
    np.testing.assert_allclose(out["sla_filtered"], [1.0, 2.0])


def test_finite_rows_drops_nan_gaps():
    rec = make_record(lon=[1.0, 2.0, 3.0], lat=[0.0, np.nan, 0.0], val=[9.0, 9.0, np.nan])
    out = tr.finite_rows(rec, ("longitude", "latitude", "sla_filtered"))
    np.testing.assert_allclose(out["longitude"], [1.0])


def test_subsample_every_kth():
    rec = make_record(lon=np.arange(10.0), lat=np.zeros(10))
    out = tr.subsample(rec, 3)
    np.testing.assert_allclose(out["longitude"], [0.0, 3.0, 6.0, 9.0])
    assert tr.subsample(rec, 0) is rec and tr.subsample(rec, 1) is rec


# --------------------------------------------------------------------------- #
# Record protocol
# --------------------------------------------------------------------------- #

def test_concat_records_order_and_empty_fallback():
    a = make_record(lon=[1.0], lat=[0.0], val=[10.0])
    b = make_record(lon=[2.0, 3.0], lat=[0.0, 0.0], val=[20.0, 30.0])
    out = tr.concat_records([a, {}, b])
    np.testing.assert_allclose(out["sla_filtered"], [10.0, 20.0, 30.0])
    assert tr.concat_records([]) == {}
    assert tr.concat_records([{}, {}]) == {}


def test_concat_records_rejects_mismatched_keys():
    a = make_record(lon=[1.0], lat=[0.0])
    b = {"longitude": np.array([2.0]), "latitude": np.array([0.0])}
    with pytest.raises(KeyError, match="disagree"):
        tr.concat_records([a, b])


def test_record_length_validates_alignment():
    with pytest.raises(ValueError, match="ragged"):
        tr.record_length({"a": np.zeros(3), "b": np.zeros(4)})
    assert tr.record_length({}) == 0


# --------------------------------------------------------------------------- #
# Time windows
# --------------------------------------------------------------------------- #

def test_window_bounds_inclusive_end_label():
    # xarray slice("2012-10-01 00", "2012-10-05 23") includes all of hour 23
    start, end = tr.window_bounds(("2012", "2012"), ("10", "10"), ("01", "05"),
                                  ("00", "23"))
    assert start == np.datetime64("2012-10-01T00")
    assert end == np.datetime64("2012-10-06T00")
    # day-resolution variant: the whole end day is inside
    s2, e2 = tr.window_bounds(("2012", "2012"), ("10", "10"), ("01", "05"))
    assert s2 == np.datetime64("2012-10-01") and e2 == np.datetime64("2012-10-06")


def test_select_time_window_half_open():
    t = np.arange(np.datetime64("2012-10-01T00"), np.datetime64("2012-10-02T00"),
                  np.timedelta64(1, "h"))
    rec = {"time": t, "v": np.arange(len(t), dtype=float)}
    start, end = tr.window_bounds(("2012", "2012"), ("10", "10"), ("01", "01"),
                                  ("06", "08"))
    out = tr.select_time_window(rec, start, end)
    np.testing.assert_allclose(out["v"], [6.0, 7.0, 8.0])  # hour 08 inclusive


def test_window_dates_spans_month_boundary():
    days = tr.window_dates(("2012", "2012"), ("10", "11"), ("30", "02"))
    assert days == [("2012", "10", "30"), ("2012", "10", "31"),
                    ("2012", "11", "01"), ("2012", "11", "02")]
    with pytest.raises(ValueError, match="precedes"):
        tr.window_dates(("2013", "2012"), ("01", "01"), ("01", "01"))


def test_time_mean_skips_nan():
    a = np.array([[1.0, np.nan], [2.0, 4.0]])
    b = np.array([[3.0, 6.0], [np.nan, 8.0]])
    out = tr.time_mean([a, b])
    np.testing.assert_allclose(out, [[2.0, 6.0], [2.0, 6.0]])


def test_pooled_time_mean_weights_by_time_steps_not_files():
    """Window mean must equal xarray's pooled mean(dim="time") over ALL
    snapshots, even when per-file time-step counts differ or some steps are
    NaN — a mean of per-file daily means is wrong in exactly those cases."""
    rng = np.random.default_rng(0)
    f1 = rng.standard_normal((5, 3, 4))   # 5 hourly steps
    f2 = rng.standard_normal((2, 3, 4))   # short day: 2 steps
    f2[0, 1, 1] = np.nan                  # partially-NaN pixel
    f3 = rng.standard_normal((3, 4))      # single-snapshot file (no time dim)
    pairs = [tr.field_sum_count(f1, 0), tr.field_sum_count(f2, 0),
             tr.field_sum_count(f3, None)]
    out = tr.pooled_time_mean([s for s, _ in pairs], [c for _, c in pairs])
    truth = np.nanmean(np.concatenate([f1, f2, f3[None]], axis=0), axis=0)
    np.testing.assert_allclose(out, truth, rtol=1e-12)
    # mean-of-means is measurably different on this input
    mom = tr.time_mean([np.nanmean(f1, 0), np.nanmean(f2, 0), f3])
    assert np.abs(mom - truth).max() > 1e-3
    # all-NaN pixel stays NaN
    g = np.full((2, 2, 2), np.nan)
    s, c = tr.field_sum_count(g, 0)
    assert np.isnan(tr.pooled_time_mean([s], [c])).all()


# --------------------------------------------------------------------------- #
# Full mission pipeline with fake month readers (no xarray, no files)
# --------------------------------------------------------------------------- #

def fake_reader(data):
    """data: {(year, month): [record, ...]}"""
    def read_month(year, month):
        return data.get((year, month), [])
    return read_month


def test_load_track_records_pipeline():
    data = {
        ("2013", "04"): [
            make_record(lon=[299.0, 10.0], lat=[38.0, 38.0], val=[1.0, 99.0]),
            make_record(lon=[-60.0], lat=[40.0], val=[2.0]),
        ],
        ("2013", "05"): [make_record(lon=[-58.0], lat=[35.0], val=[3.0])],
    }
    rec = tr.load_track_records(
        fake_reader(data), years=["2013"], months=["04", "05", "06"],
        latitude_range=(33.0, 43.0), longitude_range=(-65.0, -50.0),
    )
    # wrapped, box-filtered, concatenated in (year, month, file) order
    np.testing.assert_allclose(rec["longitude"], [-61.0, -60.0, -58.0])
    np.testing.assert_allclose(rec["sla_filtered"], [1.0, 2.0, 3.0])


def test_load_track_records_all_filtered_is_empty():
    data = {("2013", "04"): [make_record(lon=[10.0], lat=[0.0])]}
    rec = tr.load_track_records(fake_reader(data), ["2013"], ["04"],
                                (33.0, 43.0), (-65.0, -50.0))
    assert rec == {}


def test_mission_data_with_injected_reader():
    data = {("2013", "04"): [make_record(lon=[-60.0, -59.0], lat=[40.0, np.nan],
                                         val=[2.0, 5.0])]}
    md = MissionData("/nonexistent", "al", ["2013"], ["04"],
                     latitude_range=(33.0, 43.0), longitude_range=(-65.0, -50.0),
                     verbose=False, read_month=fake_reader(data))
    # NaN lat row dropped by the box mask (NaN > 33 is False)
    assert len(md) == 1
    lon, lat, val = md.observations()
    np.testing.assert_allclose(val, [2.0])
    with pytest.raises(KeyError, match="not in mission record"):
        md.observations("nope")


def test_mission_agnostic_concatenates_missions():
    per_mission = {
        "al": {("2013", "04"): [make_record(lon=[-60.0], lat=[40.0], val=[1.0])]},
        "en": {("2013", "04"): [make_record(lon=[-59.0], lat=[39.0], val=[2.0])]},
        "j2": {},
    }
    mad = MissionAgnosticData(
        "/nonexistent", ["al", "en", "j2"], ["2013"], ["04"],
        latitude_range=(33.0, 43.0), longitude_range=(-65.0, -50.0),
        verbose=False, read_month_for=lambda name: fake_reader(per_mission[name]),
    )
    np.testing.assert_allclose(mad.data["sla_filtered"], [1.0, 2.0])


def test_mission_data_missing_archive_is_empty_without_xarray():
    """No month directories → the xarray adapter is never reached, so the
    loader works (and is empty) even with no xarray installed."""
    md = MissionData("/nonexistent", "al", ["2013"], ["04"], verbose=False)
    assert md.mission_data == {} and len(md) == 0
