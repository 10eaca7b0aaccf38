"""Sc_module-parity utility tests: geo, times, Richardson, LES writer."""
import datetime as dt

import numpy as np

from mwr_fast_forward_operators_and_lbls_tpu.data import les
from mwr_fast_forward_operators_and_lbls_tpu.models import lbl
from mwr_fast_forward_operators_and_lbls_tpu.ops import thermo
from mwr_fast_forward_operators_and_lbls_tpu.utils import geo, times


def test_haversine_known_distance():
    # Cologne <-> Juelich ~ 40 km
    d = geo.haversine_km(50.9375, 6.9603, 50.9224, 6.3639)
    assert 38 < d < 45
    assert geo.haversine_km(50.0, 6.0, 50.0, 6.0) == 0.0


def test_nearest_gridbox():
    lats, lons = np.meshgrid(np.arange(49, 53.0, 0.5), np.arange(5, 9.0, 0.5))
    i = geo.nearest_gridbox(50.93, 6.96, lats, lons)
    assert abs(np.ravel(lats)[i] - 50.93) <= 0.25
    assert abs(np.ravel(lons)[i] - 6.96) <= 0.25


def test_time_roundtrips():
    d = dt.datetime(2021, 5, 3, 12, 34, tzinfo=dt.timezone.utc)
    s = times.to_epoch_seconds(d)
    assert times.from_epoch_seconds(s) == d
    assert times.to_epoch_seconds("2021-05-03T12:34") == s
    assert times.format_compact(d) == "202105031234"
    assert times.parse_compact("202105031234") == d
    assert times.parse_compact("20210503") == d.replace(hour=0, minute=34 - 34)


def test_bulk_richardson_sign():
    z = np.array([0.0, 100.0, 200.0])
    p = np.array([1000.0, 988.0, 976.0])
    mr = np.array([8.0, 8.0, 8.0])
    u = np.array([0.0, 5.0, 5.0])
    v = np.zeros(3)
    t_stable = np.array([285.0, 286.0, 287.0])     # inversion -> Ri > 0
    t_unstable = np.array([285.0, 283.0, 281.0])   # superadiabatic -> Ri < 0
    ri_s = np.asarray(thermo.bulk_richardson(z, t_stable, p, mr, u, v))
    ri_u = np.asarray(thermo.bulk_richardson(z, t_unstable, p, mr, u, v))
    assert ri_s[1] > 0 and ri_u[1] < 0


def test_les_writer(tmp_path):
    prof = lbl.demo_profile(n_levels=32)
    e = np.asarray(thermo.rho_to_e(prof["rho"], prof["t"]))
    mr = np.asarray(thermo.e_to_mr(e, prof["p"]))
    path = les.write_les_sounding(str(tmp_path / "snd.txt"), prof["z"],
                                  prof["t"], prof["p"], mr)
    rows = [l.split() for l in open(path).read().strip().splitlines()]
    assert len(rows) == 32 and all(len(r) == 5 for r in rows)
    assert float(rows[0][0]) > 900.0           # surface pressure line
    assert 250.0 < float(rows[5][1]) < 400.0   # theta plausible
