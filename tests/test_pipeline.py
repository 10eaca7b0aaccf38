"""Full pipeline: preprocess -> forward -> merge/analysis -> stats."""

import numpy as np
import pytest

from mwr_fast_forward_operators_and_lbls_tpu.data import (
    netcdf, preprocess, synthetic)
from mwr_fast_forward_operators_and_lbls_tpu.eval import deviations, stats
from mwr_fast_forward_operators_and_lbls_tpu.models import fast, lbl
from mwr_fast_forward_operators_and_lbls_tpu.pipeline import (
    forward_stage, merge)


@pytest.fixture(scope="module")
def harmonized(tmp_path_factory):
    root = tmp_path_factory.mktemp("pipe")
    sondes = []
    for i, stamp in enumerate(("20240805_102936", "20240806_102936")):
        sondes.append(synthetic.write_sonde_nc_arms(
            str(root / f"{stamp}.nc"), seed=i))
    mwr_files = {"joyhat": []}
    for i, day in enumerate(("05", "06")):
        launch = np.datetime64(f"2024-08-{day}T10:29:36")
        mwr_files["joyhat"].append(synthetic.write_mwr_l1(
            str(root / f"l1_{i}.nc"), launch, seed=i))
        mwr_files["joyhat"].append(synthetic.write_mwr_l2(
            str(root / f"mwr0_l2_clwvi_{i}.nc"), launch, "clwvi", seed=i))
    return preprocess.preprocess_files(sondes, "Vital", "Juelich", mwr_files)


@pytest.fixture(scope="module")
def with_models(harmonized):
    params = fast.distill_on_dataset(harmonized)
    return forward_stage(harmonized.copy(), models=("R24", "R17"),
                         fast_params=params, with_jacobians=True)


def test_forward_stage_shapes(with_models):
    ds = with_models
    nt = ds.dims["time"]
    assert ds["TBs_LBL_R24"].data.shape == (nt, 14, 10, 2)
    assert ds["TBs_Fast"].data.shape == (nt, 14, 10, 2)
    assert ds["ttrans_Fast"].data.shape == (nt, 14, 10, 2)
    assert ds["levtrans_Fast"].data.shape == (nt, 14, 180, 10, 2)
    assert ds["Jacobian_T_LBL"].data.shape == (nt, 14, 10, 180, 2)
    assert np.isfinite(ds["TBs_LBL_R24"].data).all()


def test_forward_stage_physics(with_models):
    ds = with_models
    tb = ds["TBs_LBL_R24"].data
    # K-band TB grows toward low elevation (elevation axis: 90 deg first)
    assert np.all(tb[:, 0, -1, 0] > tb[:, 0, 0, 0])
    # transmittance decreases with lower elevation
    tt = ds["ttrans_Fast"].data
    assert np.all(tt[:, 0, -1, 0] <= tt[:, 0, 0, 0] + 1e-6)
    # fast operator close to its teacher
    dev = ds["TBs_Fast"].data - ds["TBs_LBL_R24"].data
    assert np.nanmax(np.abs(dev)) < 0.3
    # Jacobian wrt lowest-level T is positive for opaque V-band at zenith
    j = ds["Jacobian_T_LBL"].data[:, 13, 0, -1, 0]
    assert np.all(j >= 0)


def test_compressed_upload_tb_budget(harmonized):
    """The opt-in fp16-anomaly upload encoding (pipeline/forward._upload)
    must stay inside the pipeline's 0.05 K TB accuracy budget — the test
    VERDICT r4 Next #3 demands before the halved-link-traffic payload can
    be trusted."""
    ds_a = forward_stage(harmonized.copy(), models=("R24",))
    ds_b = forward_stage(harmonized.copy(), models=("R24",),
                         compress_upload=True)
    a = ds_a["TBs_LBL_R24"].data
    b = ds_b["TBs_LBL_R24"].data
    assert np.isfinite(b).all()
    worst = float(np.abs(a - b).max())
    assert worst < 0.05, f"fp16-anomaly payload costs {worst:.4f} K"


def test_nan_profile_screening(harmonized):
    ds = harmonized.copy()
    ds["Level_Temperature"].data[:, 0, :] = np.nan   # kill profile 0
    out = forward_stage(ds, models=("R24",))
    tb = out["TBs_LBL_R24"].data
    assert np.isnan(tb[0]).all()
    assert np.isfinite(tb[1]).all()


def test_analysis_dataset_and_stats(with_models, tmp_path):
    ds = merge.analysis_dataset(with_models.copy(), compat=True)
    assert "cloud_flag" in ds
    names = deviations.deviation_variables(ds)
    assert "Deviations_Fast_R24" in names
    assert "Deviations_joyhat_R24" in names
    # compat aliases for reference-schema consumers
    assert "TBs_PyRTlib_R24" in ds
    assert "TBs_RTTOV_gb" in ds
    np.testing.assert_array_equal(ds["TBs_PyRTlib_R24"].data,
                                  ds["TBs_LBL_R24"].data)

    dev = ds["Deviations_Fast_R24"].data      # (time, chan, elev)
    out = stats.deviation_stats(dev.reshape(dev.shape[0], -1), axis=0)
    assert np.isfinite(np.asarray(out["bias"])).all()
    assert float(np.nanmax(np.asarray(out["rmse"]))) < 2.0

    # round-trips through our codec with deviations attached
    path = str(tmp_path / "analysis.nc")
    netcdf.write(path, ds)
    r = netcdf.read(path)
    assert "Deviations_Fast_R24" in r
    assert r["Deviations_Fast_R24"].attrs["ref_label"] == "TBs_LBL_R24"


def test_merge_model_results(with_models, harmonized):
    base = harmonized.copy()
    merged = merge.merge_model_results(base, with_models)
    assert "TBs_LBL_R24" in merged
    np.testing.assert_array_equal(merged["TBs_LBL_R24"].data,
                                  with_models["TBs_LBL_R24"].data)
