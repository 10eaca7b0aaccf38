"""Report-layer tests: stats CSV, availability, time windows, splits."""
import csv

import numpy as np
import pytest

from mwr_fast_forward_operators_and_lbls_tpu.data.dataset import Dataset
from mwr_fast_forward_operators_and_lbls_tpu.eval import report


def _ds(n=8):
    rng = np.random.default_rng(0)
    ds = Dataset()
    # epoch seconds: 2021-05-01 + i days
    t0 = np.datetime64("2021-05-01", "s").astype("f8")
    ds["time"] = (("time",), t0 + 86400.0 * np.arange(n), {})
    dev = rng.normal(0.5, 1.0, (n, 14, 10))
    dev[3, :, 0] = np.nan
    ds["Deviations_RTTOV_gb_R24"] = (("time", "N_Channels", "elevation"),
                                     dev, {})
    tb = rng.normal(100.0, 30.0, (n, 14, 10))
    tb[2] = np.nan
    ds["TBs_LBL_R24"] = (("time", "N_Channels", "elevation"), tb, {})
    ds["Joyhat_LWP"] = (("time",), rng.uniform(0, 0.1, n), {})
    ds["Surface_Pressure"] = (("time", "Crop"),
                              np.tile(1013.0, (n, 2)), {})
    return ds


def test_stats_table_and_csv(tmp_path):
    ds = _ds()
    rows = report.stats_table(ds)
    assert len(rows) == 14
    r0 = rows[0]
    assert r0["variable"] == "Deviations_RTTOV_gb_R24"
    assert r0["n"] == 7  # one NaN launch at elevation 0
    dev = ds["Deviations_RTTOV_gb_R24"].data[:, 0, 0]
    assert abs(r0["bias"] - np.nanmean(dev)) < 1e-5
    path = report.write_stats_csv(rows, str(tmp_path / "stats.csv"))
    with open(path) as fh:
        got = list(csv.DictReader(fh))
    assert len(got) == 14 and float(got[0]["bias"]) == r0["bias"]


def test_select_time_window():
    ds = _ds()
    sub = report.select_time_window(ds, "2021-05-03", "2021-05-06")
    assert sub.dims["time"] == 3
    # datetime + epoch inputs agree
    import datetime as dt
    sub2 = report.select_time_window(
        ds, dt.datetime(2021, 5, 3), float(np.datetime64("2021-05-06", "s").astype("f8")))
    np.testing.assert_array_equal(sub2["time"].data, sub["time"].data)


def test_split_roof_yard():
    ds = _ds()
    out = report.split_roof_yard(ds)
    assert set(out) == {"roof", "yard"}
    (roof_ds, roof_insts) = out["roof"]
    assert roof_insts == ("Joyhat",)
    assert "Crop" not in roof_ds.dims  # selected away


def test_availability_matrix_and_plot(tmp_path):
    ds = _ds()
    avail = report.availability_matrix(
        ds, ["TBs_LBL_R24", "Joyhat_LWP"])
    assert avail.shape == (8, 2)
    assert not avail[2, 0] and avail[2, 1]
    p = report.plot_data_availability(
        avail, ["LBL", "LWP"], str(tmp_path / "avail.png"),
        times=ds["time"].data)
    assert (tmp_path / "avail.png").exists()


def test_plot_departures_vs_lwp(tmp_path):
    ds = _ds()
    report.plot_departures_vs_lwp(
        ds["Deviations_RTTOV_gb_R24"].data[:, :, 0],
        ds["Joyhat_LWP"].data, str(tmp_path / "lwp.png"))
    assert (tmp_path / "lwp.png").exists()


def test_plot_single_sonde_bias_and_report(tmp_path):
    ds = _ds()
    ds["TBs_Fast"] = (("time", "N_Channels", "elevation"),
                      ds["TBs_LBL_R24"].data + 0.3, {})
    p = report.plot_single_sonde_bias(
        ds, 0, ["TBs_Fast"], "TBs_LBL_R24", str(tmp_path / "s.png"), band="K")
    assert p.endswith("s.png")
    paths = report.per_sonde_report(
        ds, ["TBs_Fast"], "TBs_LBL_R24", str(tmp_path / "sondes"),
        bands=("all", "K", "V"), max_sondes=2)
    # launch 2 is all-NaN in the reference variable -> skipped
    assert len(paths) == 6
    import os
    assert all(os.path.exists(p) for p in paths)


@pytest.mark.slow
def test_full_report_parallel_matches_serial(tmp_path):
    """The process-pool cell renderer (VERDICT r3 Next #3) produces the same
    manifest (cells, figure sets, stats CSVs) as the in-process path."""
    ds = _ds(n=12)
    # two campaign/location pairs so there are >= 4 non-empty cells
    camps = np.array(["FESSTVaL"] * 6 + ["Socles"] * 6)
    locs = np.array(["Lindenberg"] * 6 + ["Cabauw"] * 6)
    ds["Campaign"] = (("time",), camps, {})
    ds["Location"] = (("time",), locs, {})

    # restrict the matrix to the two campaign/location cells (one window,
    # one sky): the serial-vs-parallel equality property is cell-count
    # independent, and the full 18-cell double render cost 48 s of the
    # default suite (VERDICT r3 Next #8); the full matrix runs in the
    # slow-marked CLI test and the campaign run
    kw = dict(windows=[("full", None, None)], skies=("all",))
    m_ser = report.full_report(ds, str(tmp_path / "serial"), n_workers=1,
                               **kw)
    m_par = report.full_report(ds, str(tmp_path / "parallel"), n_workers=2,
                               **kw)
    assert list(m_par["cells"]) == list(m_ser["cells"])
    assert m_par["skipped"] == m_ser["skipped"]
    assert m_par["n_figures_total"] == m_ser["n_figures_total"]
    import os
    for label, cell in m_par["cells"].items():
        ser = m_ser["cells"][label]
        assert cell["n_launches"] == ser["n_launches"]
        assert sorted(cell["figures"]) == sorted(ser["figures"])
        assert cell["stats_csv"] == ser["stats_csv"]
        for fig in cell["figures"]:
            assert os.path.exists(os.path.join(tmp_path, "parallel", fig))
        # stats CSVs byte-identical between the two paths
        if cell["stats_csv"]:
            a = open(os.path.join(tmp_path, "parallel",
                                  cell["stats_csv"])).read()
            b = open(os.path.join(tmp_path, "serial",
                                  ser["stats_csv"])).read()
            assert a == b


def test_retrieval_report(tmp_path):
    from mwr_fast_forward_operators_and_lbls_tpu.eval import report

    out = report.retrieval_report(str(tmp_path), n_profiles=4, n_levels=40)
    assert (tmp_path / "retrieval_quality.png").exists()
    assert (tmp_path / "retrieval_quality.json").exists()
    assert out["rho_rms_post_mean"] < out["rho_rms_prior_mean"]
    assert out["t_rms_post_mean"] < out["t_rms_prior_mean"]
    assert 0.0 < out["dofs_mean"] < 2 * 40
