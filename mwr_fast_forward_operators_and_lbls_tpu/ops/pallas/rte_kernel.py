"""Fused Pallas TPU kernel for the multi-elevation downwelling RTE.

Physics identical to `ops.rte.downwelling_tb_lb_multi` (linear-in-tau source,
Planck throughout — the reference's PyRTlib downwelling mode,
/root/reference/python_src/proc/PyRTlib_processing.py:126), but engineered
for the TPU memory system:

The XLA formulation must materialize the (E, F, L, B) layer-opacity and
cumulative-opacity tensors in HBM — ~100 MB each at production shapes — and
re-reads them for the transmittance, emission-factor, and reduction steps,
so the RTE is bandwidth-bound at ~6x the useful traffic.  This kernel
instead reads alpha (F, L, B), path lengths (E, L-1, B) and temperature
(L, B) ONCE and keeps the entire per-(elevation, channel) pipeline — layer
opacity, cumulative-opacity prefix scan, transmittance, source integration,
reduction — inside VMEM, writing only the (E, F, B) results.  Useful HBM
traffic drops from ~600 MB to ~19 MB per 1024-profile batch.

Design decisions that matter on the hardware:

  * Grid is (batch-block, elevation) with ALL channels unrolled inside the
    kernel body: a per-(elevation, channel) grid would mean 1120 tiny steps
    whose fixed step overhead dominates the math.
  * The cumulative-opacity prefix scan runs on the VPU as a doubling
    (Hillis-Steele) scan over the sublane axis — 8 masked roll-adds for 180
    levels — in *native fp32*.  An MXU triangular matmul is the obvious
    alternative but Mosaic's in-kernel fp32 dot rounds through bf16 passes
    (~5e-4 relative), which at tau ~ 100+ nepers costs ~0.1 K in TB; the
    additive scan keeps the kernel bit-comparable to the XLA reference.
  * The per-layer transmittance exp(-dtau) is recovered from consecutive
    cumulative transmittances (trans_below - e_ctau), so the kernel
    evaluates ONE exponential per (layer, elevation, channel) point
    instead of two.
  * The Planck source profile and layer-mean absorption depend only on the
    channel, so they are computed once per batch block (at the first
    elevation grid step) and carried in VMEM scratch across the sweep.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...constants import physics as phys

LANES = 128


def _planck(x, t):
    """x / expm1(x / t) without expm1 (unsupported by Mosaic).

    For MWR frequencies and atmospheric temperatures y = x/T <= 0.016, so a
    4-term series of expm1(y) = y (1 + y/2 + y^2/6 + y^3/24) is exact to
    fp32 (truncation O(y^4/120) ~ 5e-10 relative) and the Planck radiance
    reduces to T / poly(y)."""
    y = x / t
    poly = 1.0 + y * (0.5 + y * (1.0 / 6.0 + y * (1.0 / 24.0)))
    return t / poly


def _inv_planck(x, b):
    """x / log1p(x / b) without log1p.

    u = x/b reaches ~0.15 at cold K-band TBs: use the direct log(1+u) there
    (relative error eps/u < 4e-6 for u >= 0.02) and a 5-term alternating
    series below (truncation u^5/6 < 6e-9 relative)."""
    u = x / b
    series = u * (1.0 - u * (0.5 - u * (1.0 / 3.0 - u * (0.25 - u * 0.2))))
    logu = jnp.where(u < 0.02, series, jnp.log(1.0 + u))
    return x / logu


def _cumsum_sublanes(x, n_rows: int):
    """Inclusive prefix sum along axis 0 (sublanes): doubling scan in fp32.

    ceil(log2(n_rows)) shift-adds, with the shift expressed as a
    zeros-concat (bit-identical to, and measured ~7 % faster than, a
    rotate + iota-mask — no select and no wraparound rows to suppress).
    fp32 arithmetic throughout; summation order differs from a serial
    cumsum by O(eps * tau * log L), negligible."""
    shift = 1
    while shift < n_rows:
        zeros = jnp.zeros((shift,) + x.shape[1:], x.dtype)
        x = x + jnp.concatenate([zeros, x[:-shift]], axis=0)
        shift *= 2
    return x


def _build_kernel(nf: int, l: int, alpha_is_mid: bool,
                  small_dtau: float = 0.03, want_trans: bool = False):
    lm1 = l - 1
    # Pad the layer axis to a sublane multiple so the scan's roll operands
    # stay tile-aligned; padded rows carry zero opacity and drop out.
    lpad = -(-lm1 // 8) * 8

    def kernel(f_ref, alpha_ref, ds_ref, t_ref,
               tb_ref, tau_ref, tmr_ref, *rest):
        if want_trans:
            trans_ref, b_scr, amid_scr = rest
        else:
            b_scr, amid_scr = rest
        e_idx = pl.program_id(1)

        @pl.when(e_idx == 0)
        def _():
            t = t_ref[:]
            for fi in range(nf):
                x = phys.HK_GHZ * f_ref[fi]
                b_scr[fi] = _planck(x, t)
                a = alpha_ref[fi]
                # Level absorption averages to layers; predictor-regression
                # operators supply layer-mean extinction directly.
                amid_scr[fi, :lm1] = a if alpha_is_mid \
                    else 0.5 * (a[:-1] + a[1:])

        ds = ds_ref[0]                                   # (L-1, B)
        zeros_pad = jnp.zeros((lpad - lm1, ds.shape[-1]), jnp.float32) \
            if lpad != lm1 else None
        for fi in range(nf):
            x = phys.HK_GHZ * f_ref[fi]
            b = b_scr[fi]
            b_bot, b_top = b[:-1], b[1:]

            d = amid_scr[fi, :lm1] * ds                  # layer opacities
            if zeros_pad is not None:
                d = jnp.concatenate([d, zeros_pad], axis=0)
            ctau = _cumsum_sublanes(d, lm1)
            e_ctau = jnp.exp(-ctau)                      # trans to layer top
            trans_below = jnp.concatenate(
                [jnp.ones_like(e_ctau[:1]), e_ctau[:-1]], axis=0)[:lm1]
            e_ctau_v = e_ctau[:lm1]
            d = d[:lm1]
            if want_trans:
                # Ground -> level transmittance profile, streamed straight
                # from the in-VMEM scan (no XLA fallback; the (E, F, L, B)
                # write is the inherent output traffic and nothing more).
                trans_ref[0, fi, 0:1] = jnp.ones(
                    (1, e_ctau.shape[-1]), jnp.float32)
                trans_ref[0, fi, 1:l] = e_ctau_v

            # Linear-in-tau source integration without a second exponential:
            #   atm = sum_l B_bot*delta + (B_top - B_bot)*g_top*trans_below
            # with delta = trans_below - e_ctau and
            #      g_top * trans_below = delta / d - e_ctau.
            # Both cancel catastrophically as d -> 0; 3-term series (error
            # O(d^4)) take over below `small_dtau` (see rte._emission_factors).
            small = d < small_dtau
            dd = jnp.where(small, 1.0, d)
            delta_exact = trans_below - e_ctau_v
            delta = jnp.where(
                small, trans_below * d * (1.0 - d * (0.5 - d * (1.0 / 6.0))),
                delta_exact)
            gtop_tb = jnp.where(
                small, trans_below * d * (0.5 - d * (1.0 / 3.0 - d * 0.125)),
                delta_exact / dd - e_ctau_v)
            contrib = b_bot * delta + (b_top - b_bot) * gtop_tb
            atm = jnp.sum(contrib, axis=0, keepdims=True)    # (1, B)

            tau_total = ctau[lm1 - 1:lm1]
            trans_total = e_ctau[lm1 - 1:lm1]
            # y = x/T_cosmic ~ 1 is NOT small: exp(y)-1 is O(1), safe.
            cosmic0 = x / (jnp.exp(x * (1.0 / phys.T_COSMIC)) - 1.0)
            tb_ref[0, fi:fi + 1] = _inv_planck(x, atm + cosmic0 * trans_total)
            tau_ref[0, fi:fi + 1] = tau_total
            tmr_ref[0, fi:fi + 1] = _inv_planck(
                x, atm / jnp.maximum(1.0 - trans_total, 1e-10))

    return kernel


def _build_geo_kernel(nf: int, l: int, alpha_is_mid: bool,
                      small_dtau: float = 0.03, want_trans: bool = False):
    """Kernel variant with the refraction-bent slant-path geometry fused in.

    The XLA geometry pass (ops/geometry.slant_path_lengths_lb stacked over
    elevations) costs ~0.2 ms at production shapes — mostly HBM round trips
    for the (E, L-1, B) path-length tensor and its intermediates.  Here the
    elevation-independent pieces (refractive layer index, dz * (r_top +
    r_bot)) are computed once into scratch and each elevation grid step
    derives its Snell chord lengths in VMEM: two sqrts and a divide per
    layer point, amortized over the 14-channel body.
    """
    lm1 = l - 1
    lpad = -(-lm1 // 8) * 8

    def kernel(f_ref, cos_ref, alpha_ref, z_ref, n_ref, t_ref,
               tb_ref, tau_ref, tmr_ref, *rest):
        if want_trans:
            trans_ref, b_scr, amid_scr, r_scr, nlay_scr, dzr_scr = rest
        else:
            b_scr, amid_scr, r_scr, nlay_scr, dzr_scr = rest
        e_idx = pl.program_id(1)

        @pl.when(e_idx == 0)
        def _():
            t = t_ref[:]
            z = z_ref[:]
            n = n_ref[:]
            r = phys.EARTH_RADIUS + z
            r_scr[:] = r
            nlay_scr[:lm1] = 0.5 * (n[:-1] + n[1:])
            # dz * (r_top + r_bot), with the m -> km conversion folded in.
            dzr_scr[:lm1] = (z[1:] - z[:-1]) * ((r[1:] + r[:-1]) * 1e-3)
            for fi in range(nf):
                x = phys.HK_GHZ * f_ref[fi]
                b_scr[fi] = _planck(x, t)
                a = alpha_ref[fi]
                amid_scr[fi, :lm1] = a if alpha_is_mid \
                    else 0.5 * (a[:-1] + a[1:])

        # Snell-invariant chord lengths for this elevation
        # (ops/geometry.slant_path_lengths_lb, cancellation-safe form).
        r = r_scr[:]
        k = (n_ref[0:1] * r[0:1]) * cos_ref[e_idx]       # (1, B) invariant
        rk = k / nlay_scr[:lm1]
        r_bot, r_top = r[:-1], r[1:]
        seg_top = jnp.sqrt(jnp.maximum((r_top - rk) * (r_top + rk), 0.0))
        seg_bot = jnp.sqrt(jnp.maximum((r_bot - rk) * (r_bot + rk), 0.0))
        # dzr carries the m -> km factor, so ds = dzr / segsum is in km.
        ds = dzr_scr[:lm1] / jnp.maximum(seg_top + seg_bot, 1.0)

        for fi in range(nf):
            x = phys.HK_GHZ * f_ref[fi]
            b = b_scr[fi]
            b_bot, b_top = b[:-1], b[1:]
            d = amid_scr[fi, :lm1] * ds
            if lpad != lm1:
                d = jnp.concatenate(
                    [d, jnp.zeros((lpad - lm1, d.shape[-1]), jnp.float32)],
                    axis=0)
            ctau = _cumsum_sublanes(d, lm1)
            e_ctau = jnp.exp(-ctau)
            trans_below = jnp.concatenate(
                [jnp.ones_like(e_ctau[:1]), e_ctau[:-1]], axis=0)[:lm1]
            e_ctau_v = e_ctau[:lm1]
            d = d[:lm1]
            if want_trans:
                trans_ref[0, fi, 0:1] = jnp.ones(
                    (1, e_ctau.shape[-1]), jnp.float32)
                trans_ref[0, fi, 1:l] = e_ctau_v
            small = d < small_dtau
            dd = jnp.where(small, 1.0, d)
            delta_exact = trans_below - e_ctau_v
            delta = jnp.where(
                small, trans_below * d * (1.0 - d * (0.5 - d * (1.0 / 6.0))),
                delta_exact)
            gtop_tb = jnp.where(
                small, trans_below * d * (0.5 - d * (1.0 / 3.0 - d * 0.125)),
                delta_exact / dd - e_ctau_v)
            contrib = b_bot * delta + (b_top - b_bot) * gtop_tb
            atm = jnp.sum(contrib, axis=0, keepdims=True)

            tau_total = ctau[lm1 - 1:lm1]
            trans_total = e_ctau[lm1 - 1:lm1]
            cosmic0 = x / (jnp.exp(x * (1.0 / phys.T_COSMIC)) - 1.0)
            tb_ref[0, fi:fi + 1] = _inv_planck(
                x, atm + cosmic0 * trans_total)
            tau_ref[0, fi:fi + 1] = tau_total
            tmr_ref[0, fi:fi + 1] = _inv_planck(
                x, atm / jnp.maximum(1.0 - trans_total, 1e-10))

    return kernel


@functools.partial(jax.jit, static_argnames=("freqs", "elevations",
                                             "alpha_is_mid",
                                             "want_trans_level"))
def forward_lb_fused(freqs: tuple, elevations: tuple, alpha, z_m, n_refr,
                     t_k, alpha_is_mid: bool = False,
                     want_trans_level: bool = False):
    """Geometry + multi-elevation downwelling RTE in ONE fused kernel.

    Args:
      freqs: static tuple of F channel frequencies [GHz].
      elevations: static tuple of E elevation angles [deg].
      alpha: (F, L, B) level absorption — or (F, L-1, B) layer-mean
        extinction with `alpha_is_mid=True`.
      z_m:    (L, B) level heights above MSL [m].
      n_refr: (L, B) refractive index (ops/geometry.refractive_index).
      t_k:    (L, B) level temperatures [K].
      want_trans_level: also stream the (E, F, L, B) ground-to-level
        transmittance profile out of the in-VMEM scan (its HBM write is
        the only extra cost — no XLA fallback).
      B must be a multiple of 128.

    Returns dict with tb / tau_total / t_mr (E, F, B) and, when requested,
    trans_level (E, F, L, B).
    """
    f_arr = jnp.asarray(freqs, jnp.float32)
    cos_arr = jnp.cos(jnp.deg2rad(jnp.asarray(elevations, jnp.float32)))
    nf, l_in, b = alpha.shape
    l = l_in + 1 if alpha_is_mid else l_in
    e = len(elevations)
    lm1 = l - 1
    if b % LANES:
        raise ValueError(f"B={b} not a multiple of {LANES}")
    lpad = -(-lm1 // 8) * 8

    grid = (b // LANES, e)
    kernel = _build_geo_kernel(nf, l, alpha_is_mid,
                               want_trans=want_trans_level)
    lvl_spec = pl.BlockSpec((l, LANES), lambda i, ei: (0, i),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, nf, LANES), lambda i, ei: (ei, 0, i),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((e, nf, b), jnp.float32)
    out_specs = [out_spec] * 3
    out_shapes = [out_shape] * 3
    if want_trans_level:
        out_specs.append(pl.BlockSpec((1, nf, l, LANES),
                                      lambda i, ei: (ei, 0, 0, i),
                                      memory_space=pltpu.VMEM))
        out_shapes.append(jax.ShapeDtypeStruct((e, nf, l, b), jnp.float32))
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((nf,), lambda i, ei: (0,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((e,), lambda i, ei: (0,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((nf, l_in, LANES), lambda i, ei: (0, 0, i),
                         memory_space=pltpu.VMEM),
            lvl_spec, lvl_spec, lvl_spec,
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[pltpu.VMEM((nf, l, LANES), jnp.float32),
                        pltpu.VMEM((nf, lpad, LANES), jnp.float32),
                        pltpu.VMEM((l, LANES), jnp.float32),
                        pltpu.VMEM((lpad, LANES), jnp.float32),
                        pltpu.VMEM((lpad, LANES), jnp.float32)],
        interpret=(jax.default_backend() != "tpu"),
    )(f_arr, cos_arr, alpha.astype(jnp.float32), z_m.astype(jnp.float32),
      n_refr.astype(jnp.float32), t_k.astype(jnp.float32))
    out = {"tb": outs[0], "tau_total": outs[1], "t_mr": outs[2]}
    if want_trans_level:
        out["trans_level"] = outs[3]
    return out


@functools.partial(jax.jit, static_argnames=("freqs", "alpha_is_mid",
                                             "want_trans_level"))
def downwelling_lb_fused(freqs: tuple, alpha, ds_km, t_k,
                         alpha_is_mid: bool = False,
                         want_trans_level: bool = False):
    """Fused multi-elevation downwelling RTE in the lanes-batch layout.

    Args:
      freqs: static tuple of F channel frequencies [GHz].
      alpha: (F, L, B) level absorption [Np/km], ground -> top, float32 —
        or (F, L-1, B) layer-mean extinction with `alpha_is_mid=True` (the
        fast predictor-regression operator's native output).
      ds_km: (E, L-1, B) slant path lengths [km].
      t_k:   (L, B) level temperatures [K].
      want_trans_level: also stream the (E, F, L, B) ground-to-level
        transmittance profile from the in-VMEM scan.
      B must be a multiple of 128.

    Returns dict with tb / tau_total / t_mr (E, F, B) and, when requested,
    trans_level (E, F, L, B).
    """
    f_arr = jnp.asarray(freqs, jnp.float32)
    nf, l_in, b = alpha.shape
    l = l_in + 1 if alpha_is_mid else l_in
    e, lm1, _ = ds_km.shape
    if lm1 != l - 1:
        raise ValueError(f"ds_km layers {lm1} != levels-1 {l - 1}")
    if b % LANES:
        raise ValueError(f"B={b} not a multiple of {LANES}")
    lpad = -(-lm1 // 8) * 8

    grid = (b // LANES, e)
    kernel = _build_kernel(nf, l, alpha_is_mid,
                           want_trans=want_trans_level)
    out_spec = pl.BlockSpec((1, nf, LANES), lambda i, ei: (ei, 0, i),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((e, nf, b), jnp.float32)
    out_specs = [out_spec] * 3
    out_shapes = [out_shape] * 3
    if want_trans_level:
        out_specs.append(pl.BlockSpec((1, nf, l, LANES),
                                      lambda i, ei: (ei, 0, 0, i),
                                      memory_space=pltpu.VMEM))
        out_shapes.append(jax.ShapeDtypeStruct((e, nf, l, b), jnp.float32))
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((nf,), lambda i, ei: (0,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((nf, l_in, LANES), lambda i, ei: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lm1, LANES), lambda i, ei: (ei, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((l, LANES), lambda i, ei: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[pltpu.VMEM((nf, l, LANES), jnp.float32),
                        pltpu.VMEM((nf, lpad, LANES), jnp.float32)],
        interpret=(jax.default_backend() != "tpu"),
    )(f_arr, alpha.astype(jnp.float32), ds_km.astype(jnp.float32),
      t_k.astype(jnp.float32))
    out = {"tb": outs[0], "tau_total": outs[1], "t_mr": outs[2]}
    if want_trans_level:
        out["trans_level"] = outs[3]
    return out
