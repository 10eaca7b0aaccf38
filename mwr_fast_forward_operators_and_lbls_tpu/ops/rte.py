"""Non-scattering microwave radiative transfer along a slant path.

The physics the reference obtains from PyRTlib's downwelling RTE
(`rte.satellite = False`, /root/reference/python_src/proc/
PyRTlib_processing.py:126): thermal emission of each layer, attenuated by the
opacity between the layer and the ground-based radiometer, plus the cosmic
background attenuated by the whole column.  Planck radiance throughout
(converted to Planck-equivalent brightness temperature at the end), with a
linear-in-tau source function inside each layer (Schroeder & Westwater 1991).

Everything is expressed per frequency so the same functions serve the
14-channel HATPRO forward operator and the 50k-point monochromatic grid; the
frequency axis is the leading axis of `alpha`.
"""

import jax
import jax.numpy as jnp

from ..constants import physics as phys


def planck_tb(t_k, f_ghz):
    """Planck radiance expressed in temperature units [K].

    B*(T) = (h f / k) / (exp(h f / k T) - 1).  Inverts with `inverse_planck_tb`.
    """
    x = phys.HK_GHZ * f_ghz
    return x / jnp.expm1(x / t_k)


def inverse_planck_tb(b, f_ghz):
    """Invert `planck_tb`: brightness temperature [K] from radiance-in-K."""
    x = phys.HK_GHZ * f_ghz
    return x / jnp.log1p(x / b)


def layer_opacities(alpha, ds_km):
    """Trapezoidal layer opacities [nepers] from level absorption.

    Args:
      alpha: (..., L) absorption [Np/km] at the L levels (ground -> top).
      ds_km: (..., L-1) slant path through each layer [km].
    Returns:
      (..., L-1) opacity per layer.
    """
    return 0.5 * (alpha[..., :-1] + alpha[..., 1:]) * ds_km


def _emission_factors(dtau):
    """Linear-in-tau layer emission weights (g_bot, g_top).

    For a layer of opacity d with source B varying linearly from B_bot to
    B_top (tau measured from the layer bottom), the emission reaching the
    layer bottom is  g_bot*B_bot + g_top*B_top  with
        g_bot = 1 - e^-d - g_top,   g_top = (1 - (1+d) e^-d) / d.
    A second-order Taylor series covers d -> 0.
    """
    # The exact numerator 1-(1+d)e^-d ~ d^2/2 cancels catastrophically in
    # float32 below d ~ 0.03; a 3-term Taylor series covers that range to
    # ~1e-7 absolute (next term d^4/30).  In float64 the cancellation is
    # benign down to ~2e-4, where the same series is exact to round-off —
    # keeping the float64 path at ~1e-13 so the analytic golden anchors
    # (tests/test_golden.py) hold without tolerance windows.
    small = dtau < (2e-4 if dtau.dtype == jnp.float64 else 0.03)
    d = jnp.where(small, 1.0, dtau)  # avoid 0/0 in the untaken branch
    em = jnp.exp(-d)
    g_top_exact = (1.0 - (1.0 + d) * em) / d
    g_top_series = dtau * (0.5 - dtau / 3.0 + dtau * dtau / 8.0)
    g_top = jnp.where(small, g_top_series, g_top_exact)
    # 1 - e^-d, series-protected below the same threshold so the single exp
    # above is the only transcendental in this function.
    g_total_series = dtau * (1.0 - dtau * (0.5 - dtau / 6.0))
    g_total = jnp.where(small, g_total_series, 1.0 - em)
    g_bot = g_total - g_top
    return g_bot, g_top


def downwelling_tb(alpha, ds_km, t_k, f_ghz, t_cosmic=phys.T_COSMIC):
    """Downwelling brightness temperature at the observer (ground) level.

    Args:
      alpha: (F, L) absorption [Np/km] at levels, ground -> top.
      ds_km: (L-1,) or (F, L-1) slant path lengths [km].
      t_k:   (L,) level temperatures [K].
      f_ghz: (F,) frequencies [GHz].
      t_cosmic: cosmic background temperature [K].

    Returns:
      dict with
        tb:        (F,) Planck-equivalent brightness temperature [K]
        tau_total: (F,) total slant opacity [nepers]
        trans_level: (F, L) transmittance ground -> each level
        t_mr:      (F,) mean radiating temperature [K]
    """
    dtau = layer_opacities(alpha, ds_km)  # (F, L-1)
    return downwelling_tb_from_dtau(dtau, t_k, f_ghz, t_cosmic)


def downwelling_tb_from_dtau(dtau, t_k, f_ghz, t_cosmic=phys.T_COSMIC):
    """Downwelling TB given per-layer slant opacities directly.

    Shared RTE core for the LBL (which derives `dtau` from level absorption)
    and the fast predictor-regression operator (which predicts `dtau`
    directly, the RTTOV-gb formulation the reference consumes via text
    protocol, /root/reference/python_src/proc/RTTOV_gb_processing.py:167-305).

    Args:
      dtau: (F, L-1) layer opacities [nepers], ground -> top.
      t_k:  (L,) level temperatures [K].
      f_ghz: (F,) frequencies [GHz].
    """
    f = f_ghz[:, None] if jnp.ndim(f_ghz) else f_ghz
    # Cumulative opacity from the ground to the *bottom* of each layer.
    tau_below = jnp.cumsum(dtau, axis=-1) - dtau
    tau_total = tau_below[..., -1] + dtau[..., -1]
    trans_below = jnp.exp(-tau_below)           # (F, L-1)
    trans_level = jnp.exp(
        -jnp.concatenate([jnp.zeros_like(dtau[..., :1]), jnp.cumsum(dtau, axis=-1)], axis=-1)
    )                                            # (F, L)

    b = planck_tb(t_k, f)                        # (F, L) source at levels
    g_bot, g_top = _emission_factors(dtau)       # (F, L-1)
    layer_emission = g_bot * b[..., :-1] + g_top * b[..., 1:]

    atm = jnp.sum(layer_emission * trans_below, axis=-1)
    cosmic = planck_tb(t_cosmic, f_ghz) * jnp.exp(-tau_total)
    radiance = atm + cosmic
    tb = inverse_planck_tb(radiance, f_ghz)

    # Mean radiating temperature: Tmr = atm_radiance / (1 - e^-tau), in Tb units.
    t_mr = inverse_planck_tb(
        atm / jnp.maximum(-jnp.expm1(-tau_total), 1e-10), f_ghz
    )
    return {"tb": tb, "tau_total": tau_total, "trans_level": trans_level, "t_mr": t_mr}


def downwelling_tb_lb(alpha, ds_km, t_k, f_ghz, t_cosmic=phys.T_COSMIC):
    """Downwelling TB in the TPU "lanes-batch" layout.

    Identical physics to `downwelling_tb`, but levels live on the second-minor
    axis and the profile batch on the minor (lane) axis, so every op runs on
    fully-populated (8, 128) register tiles and no relayout is ever needed
    between the fused absorption kernel and the RTE.

    Args:
      alpha: (F, L, B) absorption [Np/km], levels ground -> top.
      ds_km: (L-1, B) slant path lengths [km].
      t_k:   (L, B) level temperatures [K].
      f_ghz: (F,) frequencies [GHz].

    Returns:
      dict with tb/tau_total/t_mr (F, B) and trans_level (F, L, B).
    """
    f = f_ghz[:, None, None]
    dtau = 0.5 * (alpha[:, :-1] + alpha[:, 1:]) * ds_km[None]   # (F, L-1, B)
    ctau = jnp.cumsum(dtau, axis=-2)
    tau_below = ctau - dtau
    tau_total = ctau[:, -1]                                      # (F, B)
    trans_below = jnp.exp(-tau_below)
    trans_level = jnp.exp(
        -jnp.concatenate([jnp.zeros_like(dtau[:, :1]), ctau], axis=-2)
    )                                                            # (F, L, B)

    b = planck_tb(t_k[None], f)                                  # (F, L, B)
    g_bot, g_top = _emission_factors(dtau)
    layer_emission = g_bot * b[:, :-1] + g_top * b[:, 1:]

    atm = jnp.sum(layer_emission * trans_below, axis=-2)         # (F, B)
    fb = f_ghz[:, None]
    cosmic = planck_tb(t_cosmic, fb) * jnp.exp(-tau_total)
    tb = inverse_planck_tb(atm + cosmic, fb)
    t_mr = inverse_planck_tb(
        atm / jnp.maximum(-jnp.expm1(-tau_total), 1e-10), fb
    )
    return {"tb": tb, "tau_total": tau_total, "trans_level": trans_level,
            "t_mr": t_mr}


def downwelling_tb_lb_multi(alpha, ds_km, t_k, f_ghz, t_cosmic=phys.T_COSMIC,
                            want_trans_level=True):
    """Multi-elevation lanes-batch downwelling RTE with shared terms hoisted.

    The Planck source and the layer-mean absorption are elevation-independent;
    computing them once (instead of per elevation) and deriving the
    below-layer transmittance by shifting exp(-cumsum) (instead of a second
    cumsum/exp) keeps the per-elevation cost to one multiply chain, one
    cumsum, and two exps — the minimum this formulation needs.

    Args:
      alpha: (F, L, B) absorption [Np/km], levels ground -> top.
      ds_km: (E, L-1, B) slant path lengths per elevation [km].
      t_k:   (L, B) level temperatures [K].
      f_ghz: (F,) frequencies [GHz].
      want_trans_level: skip materializing the (E, F, L, B) transmittance
        profile when the caller doesn't ask for it.

    Returns:
      dict with tb/tau_total/t_mr (E, F, B) and trans_level (E, F, L, B)
      (present only when want_trans_level).
    """
    alpha_mid = 0.5 * (alpha[:, :-1] + alpha[:, 1:])             # (F, L-1, B)
    return downwelling_tb_lb_from_alpha_mid(alpha_mid, ds_km, t_k, f_ghz,
                                            t_cosmic, want_trans_level)


def downwelling_tb_lb_from_alpha_mid(alpha_mid, ds_km, t_k, f_ghz,
                                     t_cosmic=phys.T_COSMIC,
                                     want_trans_level=True):
    """Lanes-batch multi-elevation RTE from layer-mean extinction directly.

    Shared core for the LBL (level absorption averaged to layers) and the
    fast predictor-regression operator (which predicts layer extinction,
    the RTTOV-gb formulation, RTTOV_gb_processing.py:167-305).

    Args:
      alpha_mid: (F, L-1, B) layer-mean extinction [Np/km].
      ds_km: (E, L-1, B); t_k: (L, B); f_ghz: (F,).
    """
    f = f_ghz[:, None, None]
    fb = f_ghz[:, None]
    b = planck_tb(t_k[None], f)                                  # (F, L, B)
    b_bot, b_top = b[:, :-1], b[:, 1:]
    cosmic0 = planck_tb(t_cosmic, fb)

    # Prefix sums along the level axis as ONE lower-triangular matmul over
    # all (elevation, channel) pairs: on TPU this runs on the MXU (HIGHEST
    # precision = exact fp32 via multi-pass bf16) and beats the VPU
    # sublane-axis cumsum by a wide margin — and a single einsum instance
    # keeps XLA compile time flat in the number of elevations.
    lm1 = alpha_mid.shape[1]
    tril = jnp.tril(jnp.ones((lm1, lm1), alpha_mid.dtype))

    dtau = alpha_mid[None] * ds_km[:, None]                      # (E,F,L-1,B)
    ctau = jnp.einsum("kl,eflb->efkb", tril, dtau,
                      precision=jax.lax.Precision.HIGHEST)
    e_ctau = jnp.exp(-ctau)
    # trans to the *bottom* of layer l is exp(-ctau_{l-1}).
    trans_below = jnp.concatenate(
        [jnp.ones_like(e_ctau[:, :, :1]), e_ctau[:, :, :-1]], axis=-2)
    tau_total = ctau[:, :, -1]                                   # (E, F, B)
    trans_total = e_ctau[:, :, -1]

    g_bot, g_top = _emission_factors(dtau)
    atm = jnp.sum((g_bot * b_bot[None] + g_top * b_top[None]) * trans_below,
                  axis=-2)                                       # (E, F, B)

    tb = inverse_planck_tb(atm + cosmic0 * trans_total, fb)
    t_mr = inverse_planck_tb(atm / jnp.maximum(1.0 - trans_total, 1e-10), fb)
    out = {"tb": tb, "tau_total": tau_total, "t_mr": t_mr}
    if want_trans_level:
        out["trans_level"] = jnp.concatenate(
            [jnp.ones_like(e_ctau[:, :, :1]), e_ctau], axis=-2)
    return out


def _planck_dT(t_k, f):
    """d planck_tb / dT = (x/T)^2 e^{x/T} / expm1(x/T)^2."""
    x = phys.HK_GHZ * f
    u = x / t_k
    em = jnp.expm1(u)
    return u * u * (em + 1.0) / (em * em)


def _inverse_planck_dB(b, f):
    """d inverse_planck_tb / dB = x^2 / (b (b+x) log1p(x/b)^2)."""
    x = phys.HK_GHZ * f
    lg = jnp.log1p(x / b)
    return x * x / (b * (b + x) * lg * lg)


def _emission_factor_derivs(dtau):
    """(dg_bot/dd, dg_top/dd) for `_emission_factors`.

    Exact: g_top' = e^-d - g_top/d,  g_bot' = g_top/d; series-protected in
    the same small-d range as the forward (the exact forms hit 0/0 and
    catastrophic cancellation as d -> 0).
    """
    small = dtau < (2e-4 if dtau.dtype == jnp.float64 else 0.03)
    d = jnp.where(small, 1.0, dtau)
    em = jnp.exp(-d)
    g_top_over_d = jnp.where(
        small,
        0.5 - dtau / 3.0 + dtau * dtau / 8.0,
        (1.0 - (1.0 + d) * em) / (d * d))
    dg_top = jnp.where(
        small,
        0.5 - (2.0 / 3.0) * dtau + 0.375 * dtau * dtau,
        em - g_top_over_d)
    return g_top_over_d, dg_top  # = (dg_bot/dd, dg_top/dd)


def downwelling_tb_adjoint(alpha, ds_km, t_k, f_ghz, t_cosmic=phys.T_COSMIC):
    """Hand-written adjoint of the downwelling RTE: exact dTB/d(alpha, t, ds)
    for every (batch, elevation, frequency) in one vectorized pass.

    The TPU-native replacement for RTTOV-gb's hand-coded Fortran K/adjoint
    (the reference parses its K-matrix from text output,
    RTTOV_gb_processing.py:287-301).  Autodiff through the cumulative-
    opacity scan materializes large reverse-mode intermediates; the closed
    form needs only elementwise algebra plus one prefix sum and one suffix
    sum along layers:

        W_k = dR/d(dtau_k) = E'_k T_k - S_k - C0 Ttot,
        S_k = sum_{j>k} E_j T_j     (suffix sum: downstream layers lose
                                     transmission when layer k thickens)

    with E_k = g_bot B_k + g_top B_{k+1}, T_k the ground-to-layer-bottom
    transmittance and E'_k the emission-factor derivative.  Then
        dTB/dalpha_l = dtb/dR * (W ds)/2 gathered from layers l-1, l
        dTB/dt_l     = dtb/dR * (g_bot_l T_l + g_top_{l-1} T_{l-1}) B'(t_l)
        dTB/dds_k    = dtb/dR * W_k * alpha_mid_k.

    Args:
      alpha: (B, F, L) level absorption [Np/km], ground -> top.
      ds_km: (B, E, L-1) slant path lengths [km].
      t_k:   (B, L) level temperatures [K].
      f_ghz: (F,).
    Returns:
      (g_alpha (B,E,F,L), g_t (B,E,F,L) Planck path only, g_ds (B,E,F,L-1)).
    """
    alpha_mid = 0.5 * (alpha[..., :-1] + alpha[..., 1:])  # (B,F,K)
    g_mid, g_t, g_ds = downwelling_tb_adjoint_mid(
        alpha_mid, ds_km, t_k, f_ghz, t_cosmic)
    # spread the layer adjoint onto the two bounding levels
    half = 0.5 * g_mid
    zeros = jnp.zeros_like(half[..., :1])
    g_alpha = (jnp.concatenate([half, zeros], -1)
               + jnp.concatenate([zeros, half], -1))
    return g_alpha, g_t, g_ds


def downwelling_tb_adjoint_mid(alpha_mid, ds_km, t_k, f_ghz,
                               t_cosmic=phys.T_COSMIC):
    """`downwelling_tb_adjoint` for LAYER-MEAN extinction inputs.

    The fast operator predicts alpha directly at layer midpoints
    (models/fast.py::predict_extinction), so its closed-form K-matrix
    chains through dTB/d(alpha_mid) without the level-spreading step.
    Same algebra as `downwelling_tb_adjoint` (see that docstring).

    Args:
      alpha_mid: (B, F, K=L-1) layer-mean extinction [Np/km].
      ds_km: (B, E, K) slant path lengths [km].
      t_k:   (B, L) level temperatures [K].
      f_ghz: (F,).
    Returns:
      (g_alpha_mid (B,E,F,K), g_t (B,E,F,L) Planck path only,
       g_ds (B,E,F,K)).
    """
    f = f_ghz[None, None, :, None]                        # (1,1,F,1)
    dtau = alpha_mid[:, None] * ds_km[:, :, None, :]      # (B,E,F,K)
    ctau = jnp.cumsum(dtau, axis=-1)
    t_below = jnp.exp(-(ctau - dtau))                     # (B,E,F,K)
    trans_total = jnp.exp(-ctau[..., -1:])                # (B,E,F,1)

    b = planck_tb(t_k[:, None, None, :], f)               # (B,1,F,L)
    g_bot, g_top = _emission_factors(dtau)
    e_k = g_bot * b[..., :-1] + g_top * b[..., 1:]        # (B,E,F,K)
    et = e_k * t_below
    atm = jnp.sum(et, axis=-1, keepdims=True)
    suffix = atm - jnp.cumsum(et, axis=-1)                # S_k
    cosmic0 = planck_tb(t_cosmic, f)
    radiance = atm + cosmic0 * trans_total
    dtb_dr = _inverse_planck_dB(radiance, f)              # (B,E,F,1)

    dg_bot, dg_top = _emission_factor_derivs(dtau)
    e_prime = dg_bot * b[..., :-1] + dg_top * b[..., 1:]
    w = e_prime * t_below - suffix - cosmic0 * trans_total  # (B,E,F,K)

    g_alpha_mid = dtb_dr * w * ds_km[:, :, None, :]
    zeros = jnp.zeros_like(w[..., :1])
    bprime = _planck_dT(t_k[:, None, None, :], f)         # (B,1,F,L)
    gbt = g_bot * t_below
    gtt = g_top * t_below
    g_t = dtb_dr * (jnp.concatenate([gbt, zeros], -1)
                    + jnp.concatenate([zeros, gtt], -1)) * bprime
    g_ds = dtb_dr * w * alpha_mid[:, None]
    return g_alpha_mid, g_t, g_ds


def upwelling_tb(alpha, ds_km, t_k, f_ghz, t_surface=None, emissivity=1.0,
                 t_cosmic=phys.T_COSMIC):
    """Upwelling TB at the top of the column (satellite view), for parity with
    PyRTlib's `satellite=True` mode.  Surface treated as specular with the
    given emissivity; t_surface defaults to the lowest level temperature."""
    dtau = layer_opacities(alpha, ds_km)
    tau_total = jnp.sum(dtau, axis=-1)
    # Opacity from each layer *top* to the column top.
    tau_above = jnp.flip(jnp.cumsum(jnp.flip(dtau, -1), -1), -1) - dtau
    trans_above = jnp.exp(-tau_above)

    f = f_ghz[:, None] if jnp.ndim(f_ghz) else f_ghz
    b = planck_tb(t_k, f)
    # Looking down: emission weights mirror (top boundary takes g_bot role).
    g_bot, g_top = _emission_factors(dtau)
    layer_emission = g_bot * b[..., 1:] + g_top * b[..., :-1]
    atm_up = jnp.sum(layer_emission * trans_above, axis=-1)

    ts = t_k[..., 0] if t_surface is None else t_surface
    down = downwelling_tb(alpha, ds_km, t_k, f_ghz, t_cosmic)
    surface = (
        emissivity * planck_tb(ts, f_ghz)
        + (1.0 - emissivity) * planck_tb(down["tb"], f_ghz)
    ) * jnp.exp(-tau_total)
    return {"tb": inverse_planck_tb(atm_up + surface, f_ghz), "tau_total": tau_total}
