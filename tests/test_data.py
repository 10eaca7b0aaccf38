"""Data layer: NetCDF codec, dataset container, radiosonde ingest, cloud water."""

import numpy as np
import pytest

from mwr_fast_forward_operators_and_lbls_tpu.data import (
    cloud, netcdf, radiosonde, synthetic)
from mwr_fast_forward_operators_and_lbls_tpu.data.dataset import (
    Dataset, Variable, concat)


# -- NetCDF codec -----------------------------------------------------------

def test_netcdf_roundtrip_cdf2(tmp_path):
    ds = Dataset(attrs={"title": "t", "n": np.int32(3), "x": 1.5})
    ds["a"] = (("lev", "time"), np.arange(12, dtype="f4").reshape(3, 4),
               {"units": "K"})
    ds["short"] = (("time",), np.arange(4, dtype="i2"), {})
    path = str(tmp_path / "r.nc")
    netcdf.write(path, ds)
    r = netcdf.read(path)
    np.testing.assert_array_equal(r["a"].data, ds["a"].data)
    assert r["a"].dims == ("lev", "time")
    assert r["a"].attrs["units"] == "K"
    assert r.attrs["title"] == "t"
    np.testing.assert_array_equal(r["short"].data, [0, 1, 2, 3])


def test_netcdf_cdf5_int64_roundtrip(tmp_path):
    ds = Dataset()
    ds["t"] = (("time",), np.arange(5, dtype="i8") * 10**10, {})
    path = str(tmp_path / "r5.nc")
    netcdf.write(path, ds)
    r = netcdf.read(path)
    np.testing.assert_array_equal(r["t"].data, ds["t"].data)


def test_netcdf_interops_with_scipy(tmp_path):
    from scipy.io import netcdf_file
    ds = Dataset(attrs={"history": "ours"})
    ds["v"] = (("y", "x"), np.random.rand(3, 5).astype("f8"), {"units": "m"})
    ours = str(tmp_path / "ours.nc")
    netcdf.write(ours, ds, version=2)
    f = netcdf_file(ours, "r", mmap=False)
    np.testing.assert_array_equal(f.variables["v"][:], ds["v"].data)
    assert f.history == b"ours"

    theirs = str(tmp_path / "theirs.nc")
    g = netcdf_file(theirs, "w")
    g.createDimension("t", None)
    g.createDimension("x", 3)
    v = g.createVariable("rec", "f4", ("t", "x"))
    v[:] = np.arange(6, dtype="f4").reshape(2, 3)
    u = g.createVariable("also", "i2", ("t",))
    u[:] = [7, 8]
    g.flush(); g.close()
    r = netcdf.read(theirs)
    np.testing.assert_array_equal(r["rec"].data,
                                  np.arange(6, dtype="f4").reshape(2, 3))
    np.testing.assert_array_equal(r["also"].data, [7, 8])


def test_netcdf_reads_hdf5(tmp_path):
    import h5py
    path = str(tmp_path / "h.nc")
    with h5py.File(path, "w") as f:
        d = f.create_dataset("ta", data=np.arange(6, dtype="f4").reshape(2, 3))
        d.attrs["units"] = np.bytes_("K")
    r = netcdf.read(path)
    assert r["ta"].data.shape == (2, 3)
    assert r["ta"].attrs["units"] == "K"


def test_netcdf4_write_roundtrip(tmp_path):
    """write_hdf5 produces a NetCDF-4 file our HDF5 reader (and any
    netCDF4/xarray install) round-trips: dimension scales, DIMENSION_LIST
    attachments, coordinate variables, attrs."""
    ds = Dataset(attrs={"Conventions": "CF-1.8", "title": "nc4"})
    ds["time"] = (("time",), np.arange(4, dtype="f8"), {"units": "s"})
    ds["a"] = (("lev", "time"), np.arange(12, dtype="f4").reshape(3, 4),
               {"units": "K", "long_name": "test var"})
    ds["flag"] = (("time",), np.array([0, 1, 1, 0], "i4"), {})
    path = str(tmp_path / "r4.nc")
    netcdf.write(path, ds, fmt="netcdf4")

    import h5py
    with h5py.File(path, "r") as f:
        assert f["lev"].attrs["CLASS"] == b"DIMENSION_SCALE"
        assert b"not a netCDF variable" in f["lev"].attrs["NAME"]
        assert "DIMENSION_LIST" in f["a"].attrs
        assert "_Netcdf4Dimid" in f["time"].attrs

    r = netcdf.read(path)
    np.testing.assert_array_equal(r["a"].data, ds["a"].data)
    assert r["a"].dims == ("lev", "time")
    assert r["a"].attrs["units"] == "K"
    assert r.attrs["Conventions"] == "CF-1.8"
    np.testing.assert_array_equal(r["time"].data, ds["time"].data)


def test_netcdf_lazy_read_zero_copy(tmp_path):
    """lazy=True returns mmap-backed big-endian views (no decode copy), so
    multi-GB campaign files open at header-parse cost."""
    ds = Dataset()
    big = np.arange(600_000, dtype="f4").reshape(300, 2000)
    ds["big"] = (("row", "col"), big, {})
    ds["ints"] = (("row",), np.arange(300, dtype="i4"), {})
    path = str(tmp_path / "lazy.nc")
    netcdf.write(path, ds)

    r = netcdf.read(path, lazy=True)
    a = r["big"].data
    assert a.dtype == np.dtype(">f4")
    assert not a.flags["OWNDATA"]          # view into the mmap, not a copy
    np.testing.assert_array_equal(np.asarray(a[5], "f4"), big[5])
    np.testing.assert_array_equal(np.asarray(r["ints"].data, "i4"),
                                  np.arange(300))
    # values identical to the eager path
    e = netcdf.read(path)
    np.testing.assert_array_equal(np.asarray(a, "f4"), e["big"].data)


def test_dataset_isel_concat():
    ds = Dataset()
    ds["v"] = (("time", "lev"), np.arange(12.0).reshape(4, 3), {})
    sub = ds.isel(time=slice(0, 2))
    assert sub["v"].data.shape == (2, 3)
    both = concat([sub, sub], dim="time")
    assert both["v"].data.shape == (4, 3)
    masked = ds.sel_mask("time", np.array([True, False, True, False]))
    assert masked["v"].data.shape == (2, 3)
    with pytest.raises(ValueError):
        ds["bad"] = (("lev",), np.zeros(7), {})


# -- radiosonde ingest ------------------------------------------------------

@pytest.mark.parametrize("writer,reader", [
    (synthetic.write_sonde_nc_arms, radiosonde.read_radiosonde_nc),
    (synthetic.write_sonde_nc_dwd, radiosonde.read_radiosonde_nc),
    (synthetic.write_sonde_txt_graw, radiosonde.read_radiosonde_txt),
])
def test_read_sonde_dialects(tmp_path, writer, reader):
    path = writer(str(tmp_path / "sonde"), seed=3)
    prof = reader(path)
    assert prof.valid, prof.reject_reason
    assert np.all(np.diff(prof.z_m) > 0)          # ascending after crop
    assert prof.z_m.size <= radiosonde.DATAPOINTS_BL + radiosonde.DATAPOINTS_FT + 2
    assert 900 < prof.p_hpa[0] < 1100
    assert prof.p_hpa[-1] >= radiosonde.MIN_P_HPA - 10
    assert radiosonde.physical_realism_report(prof) == []
    assert radiosonde.moisture_consistency_report(prof) == []


def test_sonde_rejects_shallow(tmp_path):
    path = synthetic.write_sonde_nc_arms(
        str(tmp_path / "low.nc"), seed=1, top_m=6_000.0)
    prof = radiosonde.read_radiosonde_nc(path)
    assert not prof.valid
    assert "10 km" in prof.reject_reason


def test_climatology_extension(tmp_path):
    path = synthetic.write_sonde_nc_arms(str(tmp_path / "s.nc"), seed=5)
    prof = radiosonde.read_radiosonde_nc(path)
    ext = radiosonde.extend_with_climatology(prof)
    assert ext.z_m[-1] > prof.z_m[-1]
    assert np.all(np.diff(ext.p_hpa) < 0)  # monotone decreasing
    harm = radiosonde.harmonize_levels(ext)
    assert harm.p_hpa.size == 180
    assert harm.p_hpa[-1] < 10.0           # retained top forced below 10 hPa
    assert np.all(np.diff(harm.p_hpa) < 0)


def test_crop_at_132m(tmp_path):
    path = synthetic.write_sonde_nc_arms(str(tmp_path / "c.nc"), seed=2)
    full = radiosonde.read_radiosonde_nc(path)
    cropped = radiosonde.read_radiosonde_nc(path, crop_at_132m=True)
    assert cropped.z_m[0] > full.z_m[0]


def test_launch_datetime_parsing():
    t1 = radiosonde.parse_launch_datetime("/x/20240805_102936.nc")
    assert t1 == np.datetime64("2024-08-05T10:29:36")
    t2 = radiosonde.parse_launch_datetime(
        "/x/sups_rao_sonde00_l1_any_20210612140212.nc")
    assert t2 == np.datetime64("2021-06-12T14:02:12")
    t3 = radiosonde.parse_launch_datetime("/x/20210721060020068041_Profile.txt")
    assert t3 == np.datetime64("2021-07-21T06:00:20")


# -- cloud water ------------------------------------------------------------

def test_cloud_detection_finds_layer():
    z = np.linspace(100.0, 12_000.0, 300)
    t = 290.0 - 6.5e-3 * (z - z[0])
    # RH decreasing aloft: constant RH would exceed the over-ice thresholds
    # in the cold upper troposphere (the step-1 conversion is multiplicative)
    rh = 60.0 - 4.0 * (z / 1000.0)
    in_cloud = (z > 1_500.0) & (z < 2_300.0)
    rh[in_cloud] = 97.0
    layers = cloud.detect_cloud_layers(z, t, rh)
    assert layers.bases_m.size == 1
    assert 1_300 < layers.bases_m[0] < 1_700
    assert 2_100 < layers.tops_m[0] < 2_500
    water = cloud.adiabatic_water(z, 1013 * np.exp(-z / 7800), t, layers)
    assert water["lwp_kg_m2"] > 0.01
    assert np.all(water["lwc_kg_m3"] >= 0)
    assert water["iwp_kg_m2"] == 0.0


def test_cloud_thin_low_layer_removed():
    z = np.linspace(100.0, 12_000.0, 400)
    t = 290.0 - 6.5e-3 * (z - z[0])
    rh = 50.0 - 3.0 * (z / 1000.0)
    thin = (z > 300.0) & (z < 420.0)  # base <500 m, thickness <400 m
    rh[thin] = 97.0
    layers = cloud.detect_cloud_layers(z, t, rh)
    assert layers.bases_m.size == 0


def test_cloud_gap_merging():
    z = np.linspace(100.0, 12_000.0, 600)
    t = 290.0 - 6.5e-3 * (z - z[0])
    rh = 50.0 - 3.0 * (z / 1000.0)
    rh[(z > 1_500) & (z < 2_000)] = 97.0
    rh[(z > 2_150) & (z < 2_700)] = 97.0   # 150 m gap -> merge
    layers = cloud.detect_cloud_layers(z, t, rh)
    assert layers.bases_m.size == 1
    assert layers.tops_m[0] > 2_500


def test_cloud_ice_phase():
    z = np.linspace(5_000.0, 12_000.0, 300)
    t = np.full_like(z, 220.0)  # below 233.15 everywhere
    rh = np.full_like(z, 50.0)
    rh[(z > 8_000) & (z < 9_000)] = 95.0  # over-ice conversion pushes higher
    layers = cloud.detect_cloud_layers(z, t, rh)
    if layers.bases_m.size:
        water = cloud.adiabatic_water(z, 300 * np.exp(-z / 7800), t, layers)
        assert water["lwp_kg_m2"] == 0.0
        assert water["iwp_kg_m2"] >= 0.0


def test_full_cloud_pipeline_on_synthetic_sonde(tmp_path):
    path = synthetic.write_sonde_nc_arms(str(tmp_path / "s.nc"), seed=7,
                                         cloudy=True)
    prof = radiosonde.read_radiosonde_nc(path)
    out = cloud.derive_cloud_features(prof.z_m, prof.p_hpa, prof.t_k,
                                      prof.rh_pct)
    assert out["layers"].bases_m.size >= 1
    assert out["lwp_kg_m2"] > 0


# -- Adversarial / corrupt inputs (VERDICT r3 Next #9) ------------------------
# The reference's ingest surface is messy real-world files
# (preprocessing4all.py:198-344, MWR_read_in_module.py:167-234); the codec
# must fail with actionable messages, never uncaught struct/numpy errors.

def _sample_ds():
    ds = Dataset(attrs={"title": "adv"})
    ds["a"] = (("time", "lev"), np.arange(40, dtype="f4").reshape(10, 4),
               {"units": "K"})
    ds["b"] = (("lev",), np.arange(4, dtype="i4"), {})
    return ds


@pytest.mark.parametrize("version", [2, 5])
def test_netcdf_truncated_header_actionable(tmp_path, version):
    path = str(tmp_path / "t.nc")
    netcdf.write(path, _sample_ds(), version=version)
    blob = open(path, "rb").read()
    for cut in (5, 9, 17, 33):           # inside magic/dims/attrs/vars
        short = str(tmp_path / f"cut{cut}.nc")
        open(short, "wb").write(blob[:cut])
        with pytest.raises(ValueError, match="truncated|corrupt|not a NetCDF"):
            netcdf.read(short)


@pytest.mark.parametrize("version", [2, 5])
def test_netcdf_truncated_data_names_variable(tmp_path, version):
    path = str(tmp_path / "t.nc")
    netcdf.write(path, _sample_ds(), version=version)
    blob = open(path, "rb").read()
    short = str(tmp_path / "short.nc")
    open(short, "wb").write(blob[:-9])   # header intact, data region short
    with pytest.raises(ValueError, match="truncated"):
        netcdf.read(short)


def test_netcdf_bad_magic_and_version(tmp_path):
    bad = str(tmp_path / "bad.nc")
    open(bad, "wb").write(b"CDF\x07" + b"\x00" * 64)
    with pytest.raises(ValueError, match="unsupported CDF version"):
        netcdf.read_classic(bad)
    open(bad, "wb").write(b"GIF89a" + b"\x00" * 64)
    with pytest.raises(ValueError, match="unrecognized format|not a NetCDF"):
        netcdf.read(bad)


def test_netcdf_garbage_tag_actionable(tmp_path):
    path = str(tmp_path / "t.nc")
    netcdf.write(path, _sample_ds())
    blob = bytearray(open(path, "rb").read())
    blob[8:12] = (0x7F000000).to_bytes(4, "big")   # corrupt NC_DIMENSION tag
    bad = str(tmp_path / "badtag.nc")
    open(bad, "wb").write(bytes(blob))
    with pytest.raises(ValueError, match="truncated|corrupt"):
        netcdf.read(bad)


def test_netcdf_hdf5_chunked_gzip_variables(tmp_path):
    """Real HATPRO L1 NetCDF-4 files carry chunked+gzip variables; the HDF5
    read path must decode them (MWR_read_in_module.py:167-234 surface)."""
    h5py = pytest.importorskip("h5py")
    path = str(tmp_path / "chunked.nc")
    data = np.arange(2000, dtype="f4").reshape(100, 20)
    with h5py.File(path, "w") as f:
        d = f.create_dataset("tb", data=data, chunks=(10, 20),
                             compression="gzip", compression_opts=4)
        d.attrs["units"] = "K"
        d.attrs["_Netcdf4Dimid"] = 0
        f.attrs["title"] = "chunked"
    r = netcdf.read(path)
    np.testing.assert_array_equal(r["tb"].data, data)
    assert r["tb"].attrs["units"] == "K"


def test_netcdf_hdf5_truncated_actionable(tmp_path):
    h5py = pytest.importorskip("h5py")
    path = str(tmp_path / "whole.nc")
    with h5py.File(path, "w") as f:
        f.create_dataset("x", data=np.arange(100000, dtype="f8"),
                         compression="gzip")
    blob = open(path, "rb").read()
    bad = str(tmp_path / "trunc.nc")
    open(bad, "wb").write(blob[: len(blob) // 3])
    with pytest.raises((ValueError, OSError)):
        netcdf.read(bad)


def test_sonde_reader_rejects_garbage(tmp_path):
    """A structurally-valid NetCDF carrying none of the known radiosonde
    dialect variables is rejected through the validity protocol (an invalid
    SondeProfile naming the problem), never a KeyError."""
    path = str(tmp_path / "odd.nc")
    ds = Dataset()
    ds["unrelated"] = (("x",), np.arange(5, dtype="f4"), {})
    netcdf.write(path, ds)
    prof = radiosonde.read_radiosonde_nc(path)
    assert not prof.valid
    assert "dialect" in prof.reject_reason


def test_sonde_reader_truncated_file_actionable(tmp_path):
    path = str(tmp_path / "s.nc")
    synthetic.write_sonde_nc_arms(path, seed=0)
    blob = open(path, "rb").read()
    bad = str(tmp_path / "strunc.nc")
    open(bad, "wb").write(blob[: len(blob) // 2])
    with pytest.raises(ValueError, match="truncated"):
        radiosonde.read_radiosonde_nc(bad)
