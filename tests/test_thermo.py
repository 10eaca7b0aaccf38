"""Unit tests for the thermo conversion library.

Promotes the reference's runtime round-trip warnings
(`check_moisture_consistency`, /root/reference/python_src/preproc/
preprocessing4all.py:70-100 — tolerances 0.2 g/kg, 3 %, 100 ppmv) to real
assertions.
"""

import jax.numpy as jnp
import numpy as np

from mwr_fast_forward_operators_and_lbls_tpu.ops import thermo


def test_es_reference_points():
    # ~6.11 hPa at 0C, ~23.4 hPa at 20C, ~1.25 hPa at -20C (Magnus)
    assert abs(float(thermo.es_magnus(273.15)) - 6.1078) < 0.01
    assert abs(float(thermo.es_magnus(293.15)) - 23.39) < 0.3
    assert abs(float(thermo.es_magnus(253.15)) - 1.256) < 0.05
    # CC form agrees with Magnus to a few percent over met range
    for t in [250.0, 270.0, 290.0, 310.0]:
        cc = float(thermo.es_clausius_clapeyron(t))
        mg = float(thermo.es_magnus(t))
        assert abs(cc - mg) / mg < 0.06


def test_moisture_round_trips():
    p = jnp.asarray([1000.0, 850.0, 500.0, 300.0])
    t = jnp.asarray([290.0, 280.0, 255.0, 230.0])
    rh = jnp.asarray([80.0, 55.0, 30.0, 10.0])

    mr = thermo.rh_to_mr(rh, p, t)
    rh_back = thermo.mr_to_rh(mr, p, t)
    np.testing.assert_allclose(np.asarray(rh_back), np.asarray(rh), atol=3.0)

    ppmv = thermo.mr_to_ppmv(mr)
    mr_back = thermo.ppmv_to_mr(ppmv)
    np.testing.assert_allclose(np.asarray(mr_back), np.asarray(mr), atol=0.2)

    e = thermo.mr_to_e(mr, p)
    rho = thermo.e_to_rho(e, t)
    e_back = thermo.rho_to_e(rho, t)
    np.testing.assert_allclose(np.asarray(e_back), np.asarray(e), rtol=1e-5)


def test_vapor_density_magnitude():
    # Saturated air at 20C holds ~17.3 g/m^3
    e = thermo.es_magnus(293.15)
    rho = float(thermo.e_to_rho(e, 293.15))
    assert 16.0 < rho < 18.5


def test_iwv_magnitude():
    z = jnp.linspace(0.0, 10_000.0, 100)
    rho = 10.0 * jnp.exp(-z / 2000.0)  # 10 g/m^3 surface, 2 km scale height
    iwv = float(thermo.iwv_from_profile(rho, z))
    assert abs(iwv - 10.0 * 2000.0 * 1e-3 * (1 - np.exp(-5))) < 0.5  # ~19.9 kg/m^2


def test_specific_mixing_inverse():
    mr = jnp.asarray([0.1, 1.0, 5.0, 20.0])
    q = thermo.mr_to_specific(mr)
    np.testing.assert_allclose(np.asarray(thermo.specific_to_mr(q)), np.asarray(mr), rtol=1e-6)


def test_virtual_temperature_exceeds_t_for_moist_air():
    t = 290.0
    assert float(thermo.virtual_temperature(t, 10.0)) > t
    assert abs(float(thermo.virtual_temperature(t, 0.0)) - t) < 1e-4
