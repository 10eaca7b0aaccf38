"""Preprocess pipeline: MWR matching, schema assembly, end-to-end to TBs."""

import numpy as np
import pytest

from mwr_fast_forward_operators_and_lbls_tpu.constants import hatpro
from mwr_fast_forward_operators_and_lbls_tpu.data import (
    mwr, netcdf, preprocess, synthetic)


@pytest.fixture(scope="module")
def campaign(tmp_path_factory):
    """Synthetic mini-campaign: 3 sondes + one instrument's L1/L2 files."""
    root = tmp_path_factory.mktemp("campaign")
    sondes = []
    launches = []
    for i, stamp in enumerate(("20240805_102936", "20240806_102936",
                               "20240807_102936")):
        path = str(root / f"{stamp}.nc")
        synthetic.write_sonde_nc_arms(path, seed=i)
        sondes.append(path)
        launches.append(
            np.datetime64(f"2024-08-0{5+i}T10:29:36"))
    mwr_files = {"joyhat": []}
    for i, launch in enumerate(launches):
        mwr_files["joyhat"].append(synthetic.write_mwr_l1(
            str(root / f"mwr_l1_{i}.nc"), launch, seed=10 + i))
        mwr_files["joyhat"].append(synthetic.write_mwr_l2(
            str(root / f"mwr0_l2_ta_{i}.nc"), launch, "ta", seed=20 + i))
        mwr_files["joyhat"].append(synthetic.write_mwr_l2(
            str(root / f"mwr0_l2_hua_{i}.nc"), launch, "hua", seed=30 + i))
        mwr_files["joyhat"].append(synthetic.write_mwr_l2(
            str(root / f"mwr0_l2_prw_{i}.nc"), launch, "prw", seed=40 + i))
        mwr_files["joyhat"].append(synthetic.write_mwr_l2(
            str(root / f"mwr0_l2_clwvi_{i}.nc"), launch, "clwvi", seed=50 + i))
    return sondes, mwr_files, root


def test_mwr_l1_matching(campaign):
    sondes, mwr_files, _ = campaign
    launch = np.datetime64("2024-08-05T10:29:36")
    l1 = [f for f in mwr_files["joyhat"] if "l1" in f]
    tbs, lat, lon, qual = mwr.read_l1_tbs(l1[:1], launch)
    assert tbs.shape == (10, 72, 14)
    assert np.isfinite(tbs[:, 0, :]).any()      # scans at azimuth 0 matched
    assert np.isnan(tbs[:, 1:, :]).all()        # no other azimuths present
    # outside the 15-min window nothing matches
    tbs2, *_ = mwr.read_l1_tbs(l1[:1], launch + np.timedelta64(2, "h"))
    assert np.isnan(tbs2).all()


def test_mwr_l2_regridding(campaign):
    sondes, mwr_files, _ = campaign
    launch = np.datetime64("2024-08-05T10:29:36")
    l2 = [f for f in mwr_files["joyhat"] if "_l2_" in f and "_0" in f]
    data, lwp, iwv = mwr.read_l2_profiles(l2, launch)
    assert data.shape == (4, 180)
    assert np.isfinite(data[1]).all()           # ta regridded to 180 levels
    assert np.all(np.diff(data[0]) > 0)         # height grid ascending
    assert lwp >= 0 and iwv >= 0


def test_insert_points_preserving():
    x = np.array([0.0, 10.0, 100.0])
    out = mwr.insert_points_preserving(x, 10)
    assert out.size == 10
    for xi in x:
        assert np.any(np.isclose(out, xi))      # originals preserved
    assert np.all(np.diff(out) > 0)


def test_azimuth_interpolation():
    tbs = np.full((1, 72, 2), np.nan)
    tbs[0, ::6, :] = 100.0                       # 30-deg raster
    tbs[0, 6, 0] = 110.0
    out = mwr.interpolate_azimuths(tbs)
    assert np.isfinite(out).all()
    assert 100.0 < out[0, 3, 0] < 110.0          # linear between 100 and 110


def test_preprocess_end_to_end(campaign, tmp_path):
    sondes, mwr_files, _ = campaign
    ds = preprocess.preprocess_files(sondes, "Vital", "Juelich",
                                     mwr_files=mwr_files)
    dims = ds.dims
    assert dims["time"] == 3
    assert dims["N_Levels"] == 180
    assert dims["Crop"] == 2
    assert dims["elevation"] == 10 and dims["azimuth"] == 72
    # profiles stored TOA -> ground: pressure increases along N_Levels
    p = ds["Level_Pressure"].data[:, 0, 0]
    assert p[0] < p[-1]
    assert p[-1] > 900 and p[0] < 10
    assert np.isfinite(ds["TBs_joyhat"].data).any()
    assert ds.attrs["Conventions"] == "CF-1.8"
    assert np.isfinite(ds["Joyhat_IWV"].data).all()

    # serialize through our codec and reopen
    path = str(tmp_path / "harmonized.nc")
    netcdf.write(path, ds)
    r = netcdf.read(path)
    np.testing.assert_allclose(r["Level_Temperature"].data,
                               ds["Level_Temperature"].data, atol=0)

    # bridge to the forward operator and compute real TBs
    from mwr_fast_forward_operators_and_lbls_tpu.models import lbl
    profiles = preprocess.profiles_for_forward(ds, crop=0)
    assert profiles["z"].shape == (3, 180)
    assert np.all(np.diff(profiles["z"], axis=1) > 0)
    out = lbl.forward_batch(
        {k: np.asarray(v) for k, v in profiles.items()},
        lbl.LBLConfig(model="R24", elevations_deg=(90.0, 30.0)))
    tb = np.asarray(out["tb"])
    assert tb.shape == (3, 2, 14)
    assert np.isfinite(tb).all()
    assert np.all(tb[:, 0, 10:] > 250)           # opaque V-band near surface T
    assert np.all(tb[:, 0, :7] < 120)            # K-band well below
