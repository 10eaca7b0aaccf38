"""Ozone absorption coefficient (pure-rotational lines, VVW shape).

Complements the H2O/O2/N2 terms for parity with ARMS-gb, which consumes the
O3 profile the reference interpolates from AFGL climatology
(/root/reference/python_src/proc/ARMS_gb_processing.py:94-99).  Sub-0.1 K
effect on HATPRO channels; see constants/o3_lines.py for provenance.
"""

import jax.numpy as jnp

from ...constants import o3_lines


def o3_absorption(f_ghz, p_hpa, t_k, o3_ppmv):
    """Ozone absorption [Np/km].

    Args:
      f_ghz:   frequency [GHz] (broadcastable).
      p_hpa:   total pressure [hPa].
      t_k:     temperature [K].
      o3_ppmv: ozone volume mixing ratio [ppmv].

    Returns alpha [Np/km], broadcast shape of the inputs.
    """
    dtype = jnp.result_type(f_ghz, p_hpa, t_k, o3_ppmv, jnp.float32)
    f = jnp.asarray(f_ghz, dtype)[..., None]
    p = jnp.asarray(p_hpa, dtype)[..., None]
    t = jnp.asarray(t_k, dtype)[..., None]
    q = jnp.asarray(o3_ppmv, dtype)[..., None]

    fl = jnp.asarray(o3_lines.O3_FL, dtype)
    s1 = jnp.asarray(o3_lines.O3_S1, dtype)
    b2 = jnp.asarray(o3_lines.O3_B2, dtype)
    w3 = jnp.asarray(o3_lines.O3_W3, dtype)
    x = jnp.asarray(o3_lines.O3_X, dtype)

    ti = 300.0 / t
    # O3 number density [molec/cm^3]: n = 7.2429e18 * p/T * q*1e-6.
    den = 7.2429e12 * p * q / t

    width = w3 * p * ti**x
    wsq = width * width
    s = s1 * ti**2.5 * jnp.exp(b2 * (1.0 - ti))

    df1 = f - fl
    df2 = f + fl
    res = width / (df1 * df1 + wsq) + width / (df2 * df2 + wsq)
    line_sum = jnp.sum(s * res * (f / fl) ** 2, axis=-1)
    return 0.3183e-4 * den[..., 0] * line_sum
