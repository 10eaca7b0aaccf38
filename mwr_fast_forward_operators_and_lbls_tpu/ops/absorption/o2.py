"""Molecular-oxygen absorption coefficient (Rosenkranz 60-GHz complex).

Native JAX implementation of the `o2abs` physics consumed by the reference
via PyRTlib (/root/reference/python_src/proc/PyRTlib_processing.py:121-151):
40 O2 lines with first-order (optionally second-order) Rosenkranz line
mixing plus the nonresonant Debye term.
"""

import jax.numpy as jnp

from ...constants.o2_lines import O2_MODELS, O2Model


def o2_absorption(f_ghz, p_hpa, t_k, rho_gm3, model: O2Model = O2_MODELS["R98"]):
    """O2 absorption [Np/km].

    Args:
      f_ghz:   frequency [GHz] (broadcastable).
      p_hpa:   total pressure [hPa].
      t_k:     temperature [K].
      rho_gm3: water-vapor density [g/m^3] (vapor displaces/broadens dry air).
      model:   O2Model line table.

    Returns:
      alpha [nepers/km], clipped at zero (mixing can drive band wings
      slightly negative), broadcast shape of the inputs.
    """
    dtype = jnp.result_type(f_ghz, p_hpa, t_k, rho_gm3, jnp.float32)
    f = jnp.asarray(f_ghz, dtype)[..., None]
    p = jnp.asarray(p_hpa, dtype)[..., None]
    t = jnp.asarray(t_k, dtype)[..., None]
    rho = jnp.asarray(rho_gm3, dtype)[..., None]

    f0 = jnp.asarray(model.f, dtype)
    s300 = jnp.asarray(model.s300, dtype)
    be = jnp.asarray(model.be, dtype)
    w300 = jnp.asarray(model.w300, dtype)
    y300 = jnp.asarray(model.y300, dtype)
    v = jnp.asarray(model.v, dtype)
    g2 = jnp.asarray(model.g, dtype)
    dnu = jnp.asarray(model.dnu, dtype)

    th = 300.0 / t
    th1 = th - 1.0
    b = th**model.x
    preswv = rho * t / 217.0
    presda = p - preswv
    den = 0.001 * (presda * b + model.h2o_factor * preswv * th)
    pe2 = den * den  # second-order pressure terms use the same effective density

    # Nonresonant Debye (pressure-induced) term.
    dfnr = model.wb300 * den
    f_ = f[..., 0]
    nonres = (
        1.6e-17 * f_ * f_ * dfnr[..., 0]
        / (th[..., 0] * (f_ * f_ + dfnr[..., 0] * dfnr[..., 0]))
    )

    # Resonant lines with mixing: first order y, optional second order (g, dnu).
    df = w300 * den
    y = 0.001 * p * b * (y300 + v * th1)
    strength = s300 * jnp.exp(-be * th1)
    fc = f0 + dnu * pe2  # pressure-shifted line center (0 unless model sets dnu)
    gfac = 1.0 + g2 * pe2

    d1 = f - fc
    d2 = f + fc
    sf1 = (df * gfac + d1 * y) / (d1 * d1 + df * df)
    sf2 = (df * gfac - d2 * y) / (d2 * d2 + df * df)
    line_sum = jnp.sum(strength * (sf1 + sf2) * (f / f0) ** 2, axis=-1)

    total = nonres + line_sum
    alpha = 0.5034e12 * total * presda[..., 0] * th[..., 0] ** 3 / jnp.pi
    return jnp.maximum(alpha, 0.0)
