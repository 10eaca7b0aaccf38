"""Interop with the reference's RTTOV-gb text and ARMS-gb NetCDF protocols."""

import numpy as np
import pytest

from mwr_fast_forward_operators_and_lbls_tpu.interop import arms_gb, rttov_gb
from mwr_fast_forward_operators_and_lbls_tpu.models import lbl

N_LEV = 40


def _demo_rttov_profiles(n=2):
    profs = []
    for i in range(n):
        b = lbl.demo_profile(n_levels=N_LEV, seed=i)
        p, t, rho = (np.asarray(b[k])[::-1] for k in ("p", "t", "rho"))
        e = rho * t / 216.679
        ppmv = 1e6 * e / p
        profs.append(rttov_gb.RttovProfile(
            p_hpa=p, t_k=t, ppmv=ppmv,
            liquid_kgkg=np.zeros_like(p), zenith_deg=60.0))
    return profs


def test_rttov_profile_dat_round_trip(tmp_path):
    path = str(tmp_path / "prof_plev.dat")
    profs = _demo_rttov_profiles(3)
    rttov_gb.write_profiles_dat(path, profs)
    back = rttov_gb.parse_profiles_dat(path, n_levels=N_LEV)
    assert len(back) == 3
    # fixed-width text rounds: 4 decimals on p, 3 on T
    np.testing.assert_allclose(back[0].p_hpa, profs[0].p_hpa, atol=1e-3)
    np.testing.assert_allclose(back[0].t_k, profs[0].t_k, atol=1e-2)
    np.testing.assert_allclose(back[1].ppmv, profs[1].ppmv, atol=1e-3)
    assert back[2].zenith_deg == 60.0


def test_rttov_profile_format_matches_reference_layout():
    prof = _demo_rttov_profiles(1)[0]
    text = rttov_gb.format_profile(prof)
    lines = text.splitlines()
    # 4 columns of N_LEV + 3 trailer lines (write1profile2str layout)
    assert len(lines) == 4 * N_LEV + 3
    # clear-sky zeroes the liquid column (RTTOV_gb_processing.py:85-86)
    assert float(lines[3 * N_LEV]) == 0.0
    # trailer: surface T/p duplicates the last levels
    assert f"{prof.t_k[-1]:10.4f}" in lines[4 * N_LEV]


def test_rttov_output_report_round_trip(tmp_path):
    rng = np.random.default_rng(0)
    results = [rttov_gb.RttovResult(
        tb=rng.uniform(20, 290, 14),
        total_transmittance=rng.uniform(0, 1, 14),
        level_transmittance=rng.uniform(0, 1, (120, 14)),
        jacobians=rng.normal(size=(120, 14, 4)),
    ) for _ in range(2)]
    path = str(tmp_path / "output_example_k.dat")
    rttov_gb.write_output_report(path, results)
    back = rttov_gb.parse_output_report(path, n_levels=120)
    assert len(back) == 2
    for a, b in zip(results, back):
        np.testing.assert_allclose(b.tb, a.tb, rtol=1e-5)
        np.testing.assert_allclose(b.total_transmittance,
                                   a.total_transmittance, atol=1e-5)
        np.testing.assert_allclose(b.level_transmittance,
                                   a.level_transmittance, atol=1e-5)
        np.testing.assert_allclose(b.jacobians, a.jacobians, rtol=1e-5)


def test_rttov_report_survives_100plus_levels(tmp_path):
    # Rows past 99 drop the level index in the channels-1-10 table (the
    # reference parser's j<99 quirk, RTTOV_gb_processing.py:268-284).
    res = rttov_gb.RttovResult(
        tb=np.arange(14.0), total_transmittance=np.linspace(0, 1, 14),
        level_transmittance=np.linspace(0, 1, 180 * 14).reshape(180, 14),
        jacobians=np.zeros((180, 14, 4)))
    path = str(tmp_path / "out.dat")
    rttov_gb.write_output_report(path, [res])
    text = open(path).read()
    back = rttov_gb.parse_output_report(path, n_levels=180)[0]
    np.testing.assert_allclose(back.level_transmittance,
                               res.level_transmittance, atol=1e-5)
    assert "Level to surface transmittances for channels" in text


def test_patch_run_script():
    script = "#!/bin/bash\nARCH=$1\nNPROF=20\nNLEVELS=180\nrun\n"
    out = rttov_gb.patch_run_script(script, 7, 40)
    assert "NPROF=7" in out and "NLEVELS=40" in out and "run" in out


@pytest.mark.slow
def test_rttov_simulate_drop_in(tmp_path):
    in_path = str(tmp_path / "prof_plev.dat")
    out_path = str(tmp_path / "output_example_k.dat")
    rttov_gb.write_profiles_dat(in_path, _demo_rttov_profiles(2))
    results = rttov_gb.simulate_profiles_dat(in_path, out_path,
                                             n_levels=N_LEV)
    assert len(results) == 2
    for r in results:
        assert r.tb.shape == (14,) and np.isfinite(r.tb).all()
        assert np.all((r.total_transmittance > 0)
                      & (r.total_transmittance <= 1))
        assert r.level_transmittance.shape == (N_LEV, 14)
        # temperature Jacobian must be non-trivial
        assert np.abs(r.jacobians[..., 1]).max() > 1e-4
    back = rttov_gb.parse_output_report(out_path, n_levels=N_LEV)
    np.testing.assert_allclose(back[0].tb, results[0].tb, rtol=1e-4)


# ---------------------------------------------------------------------------
# ARMS-gb
# ---------------------------------------------------------------------------

def _arms_inputs(n_prof=3):
    b = lbl.demo_batch(n_prof, n_levels=N_LEV)
    z = np.asarray(b["z"])[:, ::-1].T        # (L, B) TOA->ground
    p = np.asarray(b["p"])[:, ::-1].T
    t = np.asarray(b["t"])[:, ::-1].T
    rho = np.asarray(b["rho"])[:, ::-1].T
    e = rho * t / 216.679
    mr = 1000.0 * 0.622 * e / (p - e)
    ppmv = 1e6 * e / p
    return dict(level_pressure=p, level_temperature=t, level_h2o=mr,
                level_ppmv=ppmv, level_liquid=np.zeros_like(p),
                level_z=z, level_rh=np.full_like(p, 50.0),
                surface_pressure=p[-1], temperature_2m=t[-1],
                h2o_2m=mr[-1], surface_altitude=z[-1],
                elevation_deg=30.0)


def test_arms_input_nc_schema_round_trip(tmp_path):
    path = str(tmp_path / "arms_gb_inputs.nc")
    ds = arms_gb.write_input_nc(path, **_arms_inputs())
    # schema essentials (ARMS_gb_processing.py:154-198)
    for name in ("Times_Number", "Levels_Number", "Profiles_Number",
                 "Level_Pressure", "Level_O3", "Obs_BT", "Sim_BT", "OMB",
                 "GMRZenith", "Profile_Index", "QC_Flag"):
        assert name in ds.variables, name
    assert ds["Level_Pressure"].data.dtype == np.float32
    assert ds["GMRZenith"].data[0] == np.float32(30.0)  # elevation angle!
    back = arms_gb.read_input_nc(path)
    assert back["p"].shape == (3, N_LEV)
    assert back["p"][0, 0] > back["p"][0, -1]  # ground->top after flip
    assert back["elevation_deg"] == 30.0
    assert np.all(back["o3_ppmv"] >= 0)


def test_arms_o3_profile_from_climatology():
    z = np.linspace(0, 40000.0, 50)
    o3 = arms_gb.o3_profile_ppmv(z)
    assert o3.shape == (50,)
    assert o3.argmax() > 20          # stratospheric maximum
    assert 2.0 < o3.max() < 12.0     # ppmv


def test_arms_simulate_drop_in(tmp_path):
    in_path = str(tmp_path / "elevation_0.nc")
    out_path = str(tmp_path / "elevation_0_out.nc")
    arms_gb.write_input_nc(in_path, **_arms_inputs(2))
    sim = arms_gb.simulate_input_nc(in_path, out_path)
    assert sim.shape[0] == 14
    bt = arms_gb.read_sim_bt(out_path)
    assert np.isfinite(bt[:, :2]).all()
    assert (bt[:, :2] > 5.0).all() and (bt[:, :2] < 350.0).all()


def test_lbl_include_o3_small_positive_effect():
    profs = lbl.demo_batch(2, n_levels=N_LEV)
    cfg0 = lbl.LBLConfig(elevations_deg=(90.0,), outputs=("tb",))
    cfg1 = lbl.LBLConfig(elevations_deg=(90.0,), outputs=("tb",),
                         include_o3=True)
    tb0 = np.asarray(lbl.forward_batch(profs, cfg0)["tb"])
    tb1 = np.asarray(lbl.forward_batch(profs, cfg1)["tb"])
    d = tb1 - tb0
    assert np.all(d >= -1e-4)        # O3 only adds emission
    assert d.max() < 0.5             # and stays sub-Kelvin at HATPRO freqs
