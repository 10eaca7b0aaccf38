"""Slant-path geometry tests: zenith limit, curvature, refraction."""

import math

import jax.numpy as jnp
import numpy as np

from mwr_fast_forward_operators_and_lbls_tpu.ops import geometry


def _atmo(n=100, top=20_000.0):
    z = np.linspace(0.0, top, n)
    t = 288.0 - 6.5e-3 * np.minimum(z, 11_000.0)
    p = 1013.0 * np.exp(-z / 7800.0)
    e = 10.0 * np.exp(-z / 2000.0)
    return jnp.asarray(z), jnp.asarray(p), jnp.asarray(t), jnp.asarray(e)


def test_zenith_equals_dz():
    z, p, t, e = _atmo()
    ds = np.asarray(geometry.slant_path_lengths(z, p, t, e, 90.0))
    dz = np.diff(np.asarray(z)) * 1e-3
    np.testing.assert_allclose(ds, dz, rtol=1e-6)


def test_airmass_30deg_near_secant():
    z, p, t, e = _atmo()
    am = float(geometry.airmass(z, p, t, e, 30.0))
    assert abs(am - 2.0) < 0.02  # curvature reduces slightly below sec=2


def test_airmass_low_elevation_below_secant():
    # Earth curvature makes the true airmass significantly smaller than the
    # plane-parallel secant at 4.2 deg elevation.
    z, p, t, e = _atmo()
    am = float(geometry.airmass(z, p, t, e, 4.2))
    sec = 1.0 / math.sin(math.radians(4.2))
    assert 0.6 * sec < am < 0.95 * sec


def test_refraction_bends_ray_toward_horizon():
    # With refraction the ray stays lower -> longer path than a vacuum ray.
    z, p, t, e = _atmo()
    ds_atm = np.asarray(geometry.slant_path_lengths(z, p, t, e, 4.2)).sum()
    ds_vac = np.asarray(
        geometry.slant_path_lengths(z, jnp.zeros_like(p), t, jnp.zeros_like(e), 4.2)
    ).sum()
    assert ds_atm > ds_vac
    assert (ds_atm - ds_vac) / ds_vac < 0.05


def test_refractivity_magnitude():
    # N ~ 320 ppm for moist surface air, ~ a few ppm at 20 km.
    n_sfc = float(geometry.refractivity(1013.0, 288.0, 10.0))
    n_top = float(geometry.refractivity(55.0, 217.0, 0.0))
    assert 280.0 < n_sfc < 400.0
    assert 15.0 < n_top < 25.0


def test_local_zenith_monotone_up():
    z, p, t, e = _atmo()
    za = np.asarray(geometry.local_zenith_angles(z, p, t, e, 10.0))
    # Zenith angle is 90 - elevation at the observer and decreases with
    # height (the ray steepens as n decreases).
    assert abs(za[0] - 80.0) < 1e-3
    assert np.all(np.diff(za) < 1e-6)


def test_differentiable_through_path():
    import jax

    z, p, t, e = _atmo(50)

    def total_path(t_prof):
        return jnp.sum(geometry.slant_path_lengths(z, p, t_prof, e, 4.2))

    g = np.asarray(jax.grad(total_path)(t))
    assert np.all(np.isfinite(g))
    assert np.any(g != 0.0)
