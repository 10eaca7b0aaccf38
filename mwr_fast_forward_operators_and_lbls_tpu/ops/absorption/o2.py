"""Molecular-oxygen absorption coefficient (Rosenkranz 60-GHz complex).

Native JAX implementation of the `o2abs` physics consumed by the reference
via PyRTlib (/root/reference/python_src/proc/PyRTlib_processing.py:121-151):
per-release line tables with first-order (R98/R03/R16/R17) or second-order
(R19/R20/R24 — Makarov et al. 2011/2020) Rosenkranz line mixing plus the
nonresonant Debye term.  Temperature laws follow each release's published
convention (see constants/o2_lines.py).
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
    y0 = jnp.asarray(model.y0, dtype)
    y1 = jnp.asarray(model.y1, dtype)

    th = 300.0 / t
    th1 = th - 1.0
    b = th**model.x
    preswv = rho * t / 217.0
    presda = p - preswv
    den = 0.001 * (presda * b + model.h2o_factor * preswv * th)
    pe2 = den * den

    # Nonresonant Debye (pressure-induced) term.
    dfnr = model.wb300 * den
    f_ = f[..., 0]
    nonres = (
        model.nonres_coeff * f_ * f_ * dfnr[..., 0]
        / (th[..., 0] * (f_ * f_ + dfnr[..., 0] * dfnr[..., 0]))
    )

    # Resonant lines: first-order mixing Y (basis per release), optional
    # second-order intensity coupling G and band shift delta-nu.
    df = w300 * den
    ybase = 0.001 * p * b if model.mixing_basis == "p" else den
    y = ybase * (y0 + y1 * th1)
    strength = s300 * jnp.exp(-be * th1)

    if model.has_second_order:
        g0 = jnp.asarray(model.g0, dtype)
        g1 = jnp.asarray(model.g1, dtype)
        dnu0 = jnp.asarray(model.dnu0, dtype)
        dnu1 = jnp.asarray(model.dnu1, dtype)
        gfac = 1.0 + pe2 * (g0 + g1 * th1)
        dnu = pe2 * (dnu0 + dnu1 * th1)
    else:
        gfac = 1.0
        dnu = 0.0

    d1 = f - f0 - dnu
    d2 = f + f0 + dnu
    sf1 = (df * gfac + d1 * y) / (d1 * d1 + df * df)
    sf2 = (df * gfac - d2 * y) / (d2 * d2 + df * df)
    line_sum = jnp.sum(strength * (sf1 + sf2) * (f / f0) ** 2, axis=-1)

    total = nonres + line_sum
    alpha = model.scale * total * presda[..., 0] * th[..., 0] ** 3
    return jnp.maximum(alpha, 0.0)
