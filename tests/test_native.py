"""Native ncio core: equivalence with the pure-Python/NumPy fallbacks.

Skipped when no C++ toolchain is available; the Python paths are covered by
test_data.py either way.
"""

import numpy as np
import pytest

from mwr_fast_forward_operators_and_lbls_tpu.utils import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="libncio not built")


def test_decode_be_widths():
    for dt in ("i2", "i4", "f4", "f8", "u1"):
        a = (np.random.rand(1000) * 100).astype(np.dtype(dt).newbyteorder(">"))
        out = native.decode_be(a.tobytes(), dt, 1000)
        np.testing.assert_array_equal(out, a.astype(np.dtype(dt)))
        assert out.dtype.byteorder in ("=", "|", "<")


def test_gather_records():
    rec = np.arange(60, dtype=">f4").reshape(10, 6)
    recsize = 6 * 4 + 8                       # interleaved: 8 junk bytes/rec
    buf = b"".join(rec[r].tobytes() + b"\x00" * 8 for r in range(10))
    out = native.gather_records_be(buf, "f4", 10, recsize, 6, 0)
    np.testing.assert_array_equal(out, rec.astype("=f4"))


def test_parse_table_matches_python(tmp_path):
    from mwr_fast_forward_operators_and_lbls_tpu.data import synthetic
    import re
    path = synthetic.write_sonde_txt_graw(str(tmp_path / "g.txt"), seed=1)
    arr = native.parse_table(path, 14, 20, 10)
    lines = open(path, errors="ignore").readlines()
    rows = []
    for ln in lines[20:len(lines) - 10]:
        parts = re.split(r"\s+", ln.strip())
        try:
            rows.append([float(x) for x in parts[:14]])
        except ValueError:
            pass
    np.testing.assert_allclose(arr, np.asarray(rows))


def test_netcdf_read_uses_native(tmp_path):
    """Classic file read through the native path matches what we wrote."""
    from mwr_fast_forward_operators_and_lbls_tpu.data import netcdf
    from mwr_fast_forward_operators_and_lbls_tpu.data.dataset import Dataset
    ds = Dataset()
    ds["x"] = (("a", "b"), np.random.rand(37, 11).astype("f8"), {})
    path = str(tmp_path / "n.nc")
    netcdf.write(path, ds)
    r = netcdf.read(path)
    np.testing.assert_array_equal(r["x"].data, ds["x"].data)


def test_read_files_parallel(tmp_path):
    from mwr_fast_forward_operators_and_lbls_tpu.utils import native

    paths = []
    for i in range(12):
        p = tmp_path / f"f{i}.bin"
        p.write_bytes(bytes([i]) * (100 + i))
        paths.append(str(p))
    paths.append(str(tmp_path / "missing.bin"))
    out = native.read_files(paths)
    assert out[-1] is None
    for i in range(12):
        assert out[i] == bytes([i]) * (100 + i)


def test_read_many_netcdf(tmp_path):
    import numpy as np
    from mwr_fast_forward_operators_and_lbls_tpu.data import netcdf
    from mwr_fast_forward_operators_and_lbls_tpu.data.dataset import Dataset

    paths = []
    for i in range(4):
        ds = Dataset()
        ds["x"] = (("n",), np.arange(5, dtype="f4") + i, {})
        p = str(tmp_path / f"d{i}.nc")
        netcdf.write(p, ds)
        paths.append(p)
    paths.append(str(tmp_path / "nope.nc"))
    got = netcdf.read_many(paths)
    assert got[-1] is None
    for i in range(4):
        np.testing.assert_array_equal(got[i]["x"].data,
                                      np.arange(5, dtype="f4") + i)


def test_encode_be_matches_numpy():
    """Write-side parallel byteswap (the decode_be mirror): identical bytes
    to numpy's big-endian astype for every width, fallback included."""
    rng = np.random.default_rng(7)
    for dt in ("f4", "f8", "i4", "i2", "i8"):
        a = rng.normal(0, 100, 1537).astype(dt)
        got = native.encode_be(a)
        ref = np.frombuffer(a.astype(np.dtype(dt).newbyteorder(">"))
                            .tobytes(), np.uint8)
        np.testing.assert_array_equal(got, ref)
