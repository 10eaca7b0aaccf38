"""Evaluation statistics + sky classification semantics."""

import numpy as np

from mwr_fast_forward_operators_and_lbls_tpu.data.dataset import Dataset
from mwr_fast_forward_operators_and_lbls_tpu.eval import sky, stats


def test_deviation_stats_definitions():
    dev = np.array([1.0, 2.0, 3.0, np.nan])
    out = stats.deviation_stats(dev)
    assert float(out["n"]) == 3
    np.testing.assert_allclose(float(out["bias"]), 2.0, atol=1e-6)
    # population std (1/n), the reference's convention
    np.testing.assert_allclose(float(out["std"]), np.sqrt(2.0 / 3.0), atol=1e-6)
    np.testing.assert_allclose(float(out["rmse"]), np.sqrt(14.0 / 3.0), atol=1e-6)


def test_stats_identity_relation():
    """rmse^2 == bias^2 + std^2 for the 1/n definitions."""
    rng = np.random.default_rng(0)
    dev = rng.normal(0.5, 2.0, 500).astype(np.float64)
    out = stats.deviation_stats(dev)
    np.testing.assert_allclose(
        float(out["rmse"]) ** 2,
        float(out["bias"]) ** 2 + float(out["std"]) ** 2, rtol=1e-5)


def test_pearson_r():
    rng = np.random.default_rng(1)
    a = rng.normal(size=200)
    b = 2 * a + rng.normal(0, 0.1, 200)
    b[5] = np.nan
    r = float(stats.pearson_r(a, b))
    expected = np.corrcoef(np.delete(a, 5), np.delete(b, 5))[0, 1]
    np.testing.assert_allclose(r, expected, atol=1e-6)


def test_stats_by_channel_batched():
    rng = np.random.default_rng(2)
    ref = 100 + rng.normal(0, 10, (50, 14))
    val = ref + 0.7 + rng.normal(0, 0.3, (50, 14))
    out = stats.stats_by_channel(val, ref, axis=0)
    assert out["bias"].shape == (14,)
    assert np.all(np.abs(np.asarray(out["bias"]) - 0.7) < 0.2)
    assert np.all(np.asarray(out["r"]) > 0.99)


def test_common_valid_mask():
    a = np.array([[1.0, 2.0], [np.nan, 1.0], [3.0, 4.0]])
    b = np.array([1.0, 2.0, np.nan])
    mask = np.asarray(stats.common_valid_mask(a, b))
    np.testing.assert_array_equal(mask, [True, False, False])


def _mini_ds(n=6):
    ds = Dataset()
    ds["time"] = (("time",), np.arange(n, dtype="f8"), {})
    ds["Joyhat_LWP"] = (("time",),
                        np.array([0.0, 0.001, 0.02, 0.5, np.nan, 0.004]), {})
    ds["LWP_radiosonde"] = (
        ("time", "Crop"),
        np.stack([np.array([0.0, 0.0, 0.0, 0.0, 0.3, 0.0])] * 2, 1), {})
    ds["elevation"] = (("elevation",), np.linspace(90, 4.2, 10), {})
    return ds


def test_cloud_flag_lwp_fallback_and_override():
    ds = sky.add_cloud_flag(_mini_ds())
    flag = ds["cloud_flag"].data
    assert flag.shape == (6, 10)
    np.testing.assert_array_equal(flag[:, 0], [0, 0, 1, 1, 1, 0])
    # index 4: LWP NaN but radiosonde liquid override 0.3 > 0.2 -> cloudy


def test_cloud_flag_external_primary():
    ext = np.full((6, 10), np.nan)
    ext[0, :] = 1.0           # external says cloudy even though LWP ~ 0
    ds = sky.add_cloud_flag(_mini_ds(), external_flag=ext)
    flag = ds["cloud_flag"].data
    assert flag[0, 0] == 1
    assert flag[1, 0] == 0    # NaN external -> LWP fallback


def test_read_external_cloud_flags_reindex(tmp_path):
    """MLNN product reader: CF time decoding, (n_angle, time) transposition,
    nearest-within-30-min reindexing, NaN outside coverage
    (x_analysis_script_MARCH26.py:82-97)."""
    from mwr_fast_forward_operators_and_lbls_tpu.data import netcdf

    base = 1_600_000_000.0
    # product file 1: (time, n_angle), epoch-second time, covers t0..t0+900
    prod = Dataset()
    prod["time"] = (("time",), base + np.array([0.0, 600.0, 900.0]),
                    {"units": "seconds since 1970-01-01 00:00:00"})
    flags = np.zeros((3, 10)); flags[1] = 1.0
    prod["cloud_flag"] = (("time", "n_angle"), flags, {})
    netcdf.write(str(tmp_path / "mlnn_a.nc"), prod)
    # product file 2: transposed dims and hour-based CF time, far future
    prod2 = Dataset()
    prod2["time"] = (("time",), np.array([2.0]),
                     {"units": "hours since 2020-09-13 12:26:40"})
    prod2["cloud_flag"] = (("n_angle", "time"), np.ones((10, 1)), {})
    netcdf.write(str(tmp_path / "mlnn_b.nc"), prod2)

    ds_times = base + np.array([10.0, 630.0, 7200.0, 50_000.0])
    ext = sky.read_external_cloud_flags(str(tmp_path / "mlnn_*.nc"), ds_times)
    assert ext.shape == (4, 10)
    assert ext[0, 0] == 0.0          # nearest = t0 (10 s away)
    assert ext[1, 0] == 1.0          # nearest = t0+600 (30 s away)
    assert ext[2, 0] == 1.0          # file 2: 2 h after 12:26:40 = base+7200
    assert np.isnan(ext[3, 0])       # 50 ks: nothing within 30 min

    # end-to-end through the priority chain
    ds = Dataset()
    ds["time"] = (("time",), ds_times, {})
    ds["Joyhat_LWP"] = (("time",), np.array([0.0, 0.001, 0.02, 0.5]), {})
    ds["elevation"] = (("elevation",), np.linspace(90, 4.2, 10), {})
    ds = sky.add_cloud_flag(ds, external_flag=ext)
    flag = ds["cloud_flag"].data
    assert flag[0, 0] == 0 and flag[1, 0] == 1 and flag[2, 0] == 1
    # timestep 3 uncovered -> LWP fallback (0.5 -> cloudy)
    assert flag[3, 0] == 1


def test_read_external_cloud_flags_no_match(tmp_path):
    assert sky.read_external_cloud_flags(
        str(tmp_path / "nothing_*.nc"), np.array([0.0])) is None


def test_split_clear_cloudy():
    ds = _mini_ds()
    clear, cloudy = sky.split_clear_cloudy(ds)
    assert clear.dims["time"] + cloudy.dims["time"] == 6
    assert np.all(sky.mean_mwr_lwp(clear) <= sky.LWP_CLEAR_THRESHOLD)


def test_plot_model_vs_model_by_iwv(tmp_path):
    from mwr_fast_forward_operators_and_lbls_tpu.eval import plots

    rng = np.random.default_rng(1)
    n = 20
    dx = rng.normal(0.0, 1.0, (n, 14, 10))
    dy = dx + rng.normal(0.0, 0.2, dx.shape)
    iwv = rng.uniform(5, 35, n)
    p = plots.plot_model_vs_model_by_iwv(
        dx, dy, iwv, str(tmp_path / "pooled.png"))
    assert p.endswith("pooled.png")
    p = plots.plot_model_vs_model_by_iwv(
        dx[:, :, 0], dy[:, :, 0], iwv, str(tmp_path / "chan9.png"), channel=9)
    assert p.endswith("chan9.png")


def test_standard_report_includes_model_pair_scatter(tmp_path):
    from mwr_fast_forward_operators_and_lbls_tpu.data.dataset import Dataset
    from mwr_fast_forward_operators_and_lbls_tpu.eval import plots

    rng = np.random.default_rng(2)
    n = 12
    ds = Dataset()
    ds["time"] = (("time",), np.arange(n, dtype="f8"), {})
    for name in ("Deviations_Fast_R24", "Deviations_R98_R24",
                 "Deviations_Joyhat_R24"):
        ds[name] = (("time", "N_Channels", "elevation"),
                    rng.normal(0, 1, (n, 14, 10)), {})
    ds["Joyhat_IWV"] = (("time",), rng.uniform(5, 30, n), {})
    paths = plots.standard_report(ds, str(tmp_path / "figs"))
    assert any("Fast_vs_R98_by_IWV" in p for p in paths)
    # the MWR family is not paired into the model-vs-model scatter
    assert not any("Joyhat_vs" in p or "_vs_Joyhat" in p for p in paths)
