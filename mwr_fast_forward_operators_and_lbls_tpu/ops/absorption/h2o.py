"""Water-vapor absorption coefficient (Rosenkranz line-by-line + continuum).

Native JAX implementation of the physics the reference obtains through
PyRTlib's `rte.execute()` (/root/reference/python_src/proc/
PyRTlib_processing.py:121-151).  Structure follows the published Rosenkranz
`abh2o` formulation: Van Vleck-Weisskopf resonances with Clough's 750-GHz
local-line cutoff, plus foreign/self continuum terms.

All inputs broadcast against each other; the line summation happens over an
internal trailing axis, so the op is usable pointwise for any batch layout
(frequencies x layers x profiles) under jit/vmap/pjit.
"""

import jax.numpy as jnp

from ...constants.h2o_lines import H2O_MODELS, H2OModel


def h2o_absorption(f_ghz, p_hpa, t_k, rho_gm3, model: H2OModel = H2O_MODELS["R98"]):
    """Water-vapor absorption [Np/km].

    Args:
      f_ghz:   frequency [GHz] (broadcastable).
      p_hpa:   total pressure [hPa].
      t_k:     temperature [K].
      rho_gm3: water-vapor density [g/m^3].
      model:   H2OModel line table / continuum coefficients.

    Returns:
      alpha [nepers/km], broadcast shape of the inputs.
    """
    dtype = jnp.result_type(f_ghz, p_hpa, t_k, rho_gm3, jnp.float32)
    f = jnp.asarray(f_ghz, dtype)[..., None]  # trailing line axis
    p = jnp.asarray(p_hpa, dtype)[..., None]
    t = jnp.asarray(t_k, dtype)[..., None]
    rho = jnp.asarray(rho_gm3, dtype)[..., None]

    fl = jnp.asarray(model.fl, dtype)
    s1 = jnp.asarray(model.s1, dtype)
    b2 = jnp.asarray(model.b2, dtype)
    w3 = jnp.asarray(model.w3, dtype)
    x = jnp.asarray(model.x, dtype)
    ws = jnp.asarray(model.ws, dtype)
    xs = jnp.asarray(model.xs, dtype)

    ti = 300.0 / t
    pvap = rho * t / 217.0  # vapor partial pressure [hPa]
    pda = p - pvap          # dry-air partial pressure [hPa]
    den = 3.344e16 * rho    # molecules / cm^3 per (g/m^3)
    ti2 = ti ** 2.5

    width = w3 * pda * ti**x + ws * pvap * ti**xs
    wsq = width * width
    s = s1 * ti2 * jnp.exp(b2 * (1.0 - ti))

    df1 = f - fl
    df2 = f + fl
    base = width / (model.cutoff_ghz**2 + wsq)  # Clough local-line base
    res = jnp.where(
        jnp.abs(df1) < model.cutoff_ghz, width / (df1 * df1 + wsq) - base, 0.0
    ) + jnp.where(
        jnp.abs(df2) < model.cutoff_ghz, width / (df2 * df2 + wsq) - base, 0.0
    )
    line_sum = jnp.sum(s * res * (f / fl) ** 2, axis=-1)

    ti_ = ti[..., 0]
    f_ = f[..., 0]
    pvap_ = pvap[..., 0]
    pda_ = pda[..., 0]
    con = (
        model.cf * ti_**model.xcf * pda_ + model.cs * ti_**model.xcs * pvap_
    ) * pvap_ * f_ * f_

    return 0.3183e-4 * den[..., 0] * line_sum + con
