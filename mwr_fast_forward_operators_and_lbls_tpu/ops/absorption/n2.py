"""Dry-air (N2-dominated collision-induced) continuum absorption."""

import jax.numpy as jnp


def n2_absorption(f_ghz, p_hpa, t_k, variant: str = "R98"):
    """Collision-induced dry continuum [Np/km] (Rosenkranz `absn2`).

    R98:  alpha = 6.4e-14 * p^2 * f^2 * theta^3.55
    R17+: alpha = 6.5e-14 * fdep * p^2 * f^2 * theta^3.6,
          fdep = 0.5 + 0.5/(1+(f/450)^2)  (Boissoles et al. frequency roll-off)

    p is the *dry-air* partial pressure [hPa]; callers pass p - e.
    """
    f = jnp.asarray(f_ghz)
    p = jnp.asarray(p_hpa)
    th = 300.0 / jnp.asarray(t_k)
    if variant in ("R98", "R03"):
        return 6.4e-14 * p * p * f * f * th**3.55
    fdep = 0.5 + 0.5 / (1.0 + (f / 450.0) ** 2)
    return 6.5e-14 * fdep * p * p * f * f * th**3.6
