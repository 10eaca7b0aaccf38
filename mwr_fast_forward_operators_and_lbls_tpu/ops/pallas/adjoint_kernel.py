"""Fused Pallas TPU kernel for the K-matrix adjoint + assembly.

The closed-form RTE adjoint (`ops.rte.downwelling_tb_adjoint`) is exact but
its XLA formulation materializes ~a dozen (B, E, F, L) intermediates in HBM
— dtau, cumulative opacities, transmittances, emission factors and their
derivatives, the suffix sum, W — so at production sizes it is bandwidth-
bound at ~5x the useful traffic and became the dominant K-matrix stage
(bench.py kmatrix_decomp_ms, VERDICT r3 Next #6).  This kernel keeps the
whole per-(elevation, channel) adjoint pipeline in VMEM and writes ONLY the
assembled K-matrix slice

    K_x[e, f, l] = dTB/dalpha[e, f, l] * dalpha[f, l]/dx[l]  +  direct_x

where direct_x folds the Planck source path (x = t) and the refraction-bent
geometry path (x = t, rho) — i.e. the one inherently large output.  One
kernel invocation per requested variable keeps the VMEM working set (alpha
+ one tangent field + Planck scratches + one output block) under the 16 MB
budget; the adjoint core is recomputed per variable, which is ~free next to
the saved HBM round trips.

Physics identical to `downwelling_tb_adjoint` + the closed-form geometry
assembly in `models.jacobians.kmatrix_batch_fast` (slant-path Jacobian =
tridiagonal-local + rank-one level-0 column); both cumulative sums ride the
MXU as triangular bf16 split-matmul products (see rte_kernel).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...constants import physics as phys
from .rte_kernel import LANES, _mxu_prefix_sum, _pad16, _planck, _tri_ones


def _tri_upper_strict(lm1: int):
    "Strict upper-triangular ones (bf16, padded): direct suffix sums."
    lpad = _pad16(lm1)
    return jnp.asarray(np.triu(np.ones((lpad, lpad), np.float32), 1),
                       jnp.bfloat16)


def _planck_dT(x: float, t):
    """d planck_tb / dT = u^2 e^u / expm1(u)^2 with u = x/T <= 0.016.

    expm1 via the same 4-term series as `_planck` (exact to fp32 here)."""
    u = x / t
    em = u * (1.0 + u * (0.5 + u * (1.0 / 6.0 + u * (1.0 / 24.0))))
    return u * u * (em + 1.0) / (em * em)


def _inv_planck_dB(x: float, b):
    """d inverse_planck_tb / dB = x^2 / (b (b+x) log1p(x/b)^2)."""
    u = x / b
    series = u * (1.0 - u * (0.5 - u * (1.0 / 3.0 - u * (0.25 - u * 0.2))))
    logu = jnp.where(u < 0.02, series, jnp.log(1.0 + u))
    return x * x / (b * (b + x) * logu * logu)


def _build_kernel(freqs, l: int, which: str, small_dtau: float = 0.03):
    """Adjoint+assembly kernel for K-matrix variables.

    which: "rho_lwc" (one shared adjoint core, TWO outputs k_rho/k_lwc —
    with the separate "t" call this covers the production configuration in
    two adjoint passes instead of three; a single 3-output kernel was
    measured 22.5 MB of VMEM, over the 16 MB budget), or a single variable
    "t" (absorption tangent + Planck direct + geometry direct), "rho"
    (absorption tangent + geometry direct), "lwc" (absorption tangent only
    — cloud absorption is the only lwc path)."""
    lm1 = l - 1
    geo = which in ("t", "rho", "rho_lwc")
    want_t = which == "t"

    def kernel(*refs):
        it = iter(refs)
        tri_ref = next(it)
        triu_ref = next(it)
        alpha_ref = next(it)
        if which == "rho_lwc":
            darho_ref = next(it)
            dalwc_ref = next(it)
        else:
            da_ref = next(it)
        ds_ref = next(it)
        t_ref = next(it)
        if geo:
            dnl_ref = next(it)
            dk_ref = next(it)
            dn_ref = next(it)
            r0c_ref = next(it)
        if which == "rho_lwc":
            out_rho_ref = next(it)
            out_lwc_ref = next(it)
        else:
            out_ref = next(it)
        b_scr = next(it)
        # the two-output variant trades the hoisted 1/alpha_mid scratch for
        # a direct per-point divide: the scratch put the kernel 48 KB over
        # the 16 MB VMEM budget, and the divide costs ~0.014 ms at B=256
        inva_scr = None if which == "rho_lwc" else next(it)
        bprime_scr = next(it, None)
        e_idx = pl.program_id(1)

        @pl.when(e_idx == 0)
        def _():
            t = t_ref[:]
            for fi, fch in enumerate(freqs):
                x = float(phys.HK_GHZ * fch)
                b_scr[fi] = _planck(x, t)
                if want_t:
                    bprime_scr[fi] = _planck_dT(x, t)
                if inva_scr is not None:
                    a = alpha_ref[fi]
                    amid = 0.5 * (a[:-1] + a[1:])
                    inva_scr[fi, :lm1] = 1.0 / jnp.maximum(amid, 1e-30)

        ds = ds_ref[0]                                    # (K, B)
        inv_ds = 1.0 / jnp.maximum(ds, 1e-30)
        if geo:
            dnl = dnl_ref[0]
            dk = dk_ref[0]
            dn = dn_ref[:]                                # (L, B)
            r0c_dn0 = r0c_ref[0] * dn[0:1]                # (1, B)

        for fi, fch in enumerate(freqs):
            x = float(phys.HK_GHZ * fch)
            a = alpha_ref[fi]
            amid = 0.5 * (a[:-1] + a[1:])
            d = amid * ds
            if inva_scr is None:
                inv_d = 1.0 / jnp.maximum(d, 1e-30)
            else:
                inv_d = inva_scr[fi, :lm1] * inv_ds
            ctau = _mxu_prefix_sum(d, tri_ref, lm1)
            t_below = jnp.exp(-(ctau - d))
            em = jnp.exp(-d)
            trans_total = t_below[lm1 - 1:lm1] * em[lm1 - 1:lm1]

            small = d < small_dtau
            d2 = d * d
            # emission factors + their opacity derivatives
            # (ops/rte._emission_factors / _emission_factor_derivs, with the
            # exact-branch divides expressed through the hoisted reciprocal)
            gt_exact = (1.0 - (1.0 + d) * em) * inv_d
            g_top = jnp.where(small, d * (0.5 - d * (1.0 / 3.0) + d2 * 0.125),
                              gt_exact)
            g_total = jnp.where(small, d * (1.0 - d * (0.5 - d * (1.0 / 6.0))),
                                1.0 - em)
            g_bot = g_total - g_top
            g_top_over_d = jnp.where(
                small, 0.5 - d * (1.0 / 3.0) + d2 * 0.125, g_top * inv_d)
            dg_top = jnp.where(small, 0.5 - (2.0 / 3.0) * d + 0.375 * d2,
                               em - g_top_over_d)
            dg_bot = g_top_over_d

            b = b_scr[fi]
            b_bot, b_top = b[:-1], b[1:]
            e_k = g_bot * b_bot + g_top * b_top
            et = e_k * t_below
            atm = jnp.sum(et, axis=0, keepdims=True)      # (1, B)
            # S_k = sum_{j>k} et_j DIRECTLY (strict-upper matmul): the
            # atm - prefix form cancels catastrophically near the column
            # top and the MXU split error blows up relatively; the direct
            # tail sum of the all-positive et keeps the error relative.
            suffix = _mxu_prefix_sum(et, triu_ref, lm1)
            cosmic0 = float(x / (np.exp(x / phys.T_COSMIC) - 1.0))
            ctt = cosmic0 * trans_total
            radiance = atm + ctt
            dtb_dr = _inv_planck_dB(x, radiance)          # (1, B)

            e_prime = dg_bot * b_bot + dg_top * b_top
            w = e_prime * t_below - suffix - ctt
            half_wds = (0.5 * dtb_dr) * (w * ds)          # (K, B)
            zeros1 = jnp.zeros_like(half_wds[:1])
            g_alpha = jnp.concatenate([half_wds, zeros1], 0) \
                + jnp.concatenate([zeros1, half_wds], 0)  # (L, B)

            if want_t:
                planck_direct = (jnp.concatenate(
                    [(dtb_dr * g_bot) * t_below, zeros1], 0)
                    + jnp.concatenate(
                        [zeros1, (dtb_dr * g_top) * t_below], 0)) \
                    * bprime_scr[fi]
            if geo:
                g_ds = (dtb_dr * w) * amid                # (K, B)
                a_geo = g_ds * dnl
                c = 0.5 * (jnp.concatenate([a_geo, zeros1], 0)
                           + jnp.concatenate([zeros1, a_geo], 0))
                s_k = jnp.sum(g_ds * dk, axis=0, keepdims=True)
            if which == "rho_lwc":
                k_r = g_alpha * darho_ref[fi] + c * dn
                out_rho_ref[0, fi] = k_r
                out_rho_ref[0, fi, 0:1] = k_r[0:1] + s_k * r0c_dn0
                out_lwc_ref[0, fi] = g_alpha * dalwc_ref[fi]
            else:
                k = g_alpha * da_ref[fi]
                if which == "t":
                    k = k + planck_direct
                if geo:
                    k = k + c * dn
                    out_ref[0, fi] = k
                    out_ref[0, fi, 0:1] = k[0:1] + s_k * r0c_dn0
                else:
                    out_ref[0, fi] = k

    return kernel


@functools.partial(jax.jit, static_argnames=("freqs", "which"))
def kmatrix_assembled_lb(freqs: tuple, which: str, alpha, da, ds, t_k,
                         dds_dnl=None, dds_dk=None, dn=None, r0cos=None):
    """One assembled K-matrix variable in the lanes-batch layout.

    Args:
      freqs: static tuple of F channel frequencies [GHz].
      which: "t" | "rho" | "lwc" (selects the direct-path terms).
      alpha: (F, L, B) level absorption [Np/km].
      da:    (F, L, B) elementwise d(alpha)/d(which).
      ds:    (E, L-1, B) slant path lengths [km].
      t_k:   (L, B) temperatures.
      dds_dnl, dds_dk: (E, L-1, B) slant-path sensitivities (geometry
        Jacobian diagonals) — required for which in ("t", "rho").
      dn:    (L, B) d(refractive index)/d(which) — same requirement.
      r0cos: (E, B) n-free part of the Snell invariant, r_0 * cos(el).

    Returns K_which (E, F, L, B).
    """
    nf, l, b = alpha.shape
    e, lm1, _ = ds.shape
    if lm1 != l - 1:
        raise ValueError(f"ds layers {lm1} != levels-1 {l - 1}")
    if b % LANES:
        raise ValueError(f"B={b} not a multiple of {LANES}")
    lpad = _pad16(lm1)
    geo = which in ("t", "rho")
    if geo and (dds_dnl is None or dds_dk is None or dn is None
                or r0cos is None):
        raise ValueError(f"which={which} needs geometry sensitivities")

    grid = (b // LANES, e)
    kernel = _build_kernel(tuple(freqs), l, which)
    flb_spec = pl.BlockSpec((nf, l, LANES), lambda i, ei: (0, 0, i),
                            memory_space=pltpu.VMEM)
    elev_spec = pl.BlockSpec((1, lm1, LANES), lambda i, ei: (ei, 0, i),
                             memory_space=pltpu.VMEM)
    lvl_spec = pl.BlockSpec((l, LANES), lambda i, ei: (0, i),
                            memory_space=pltpu.VMEM)
    tri_spec = pl.BlockSpec((lpad, lpad), lambda i, ei: (0, 0),
                            memory_space=pltpu.VMEM)
    in_specs = [tri_spec, tri_spec, flb_spec, flb_spec, elev_spec, lvl_spec]
    inputs = [_tri_ones(lm1).astype(jnp.bfloat16), _tri_upper_strict(lm1),
              alpha.astype(jnp.float32), da.astype(jnp.float32),
              ds.astype(jnp.float32), t_k.astype(jnp.float32)]
    if geo:
        in_specs += [elev_spec, elev_spec, lvl_spec,
                     pl.BlockSpec((1, 1, LANES), lambda i, ei: (ei, 0, i),
                                  memory_space=pltpu.VMEM)]
        inputs += [dds_dnl.astype(jnp.float32), dds_dk.astype(jnp.float32),
                   dn.astype(jnp.float32),
                   r0cos.astype(jnp.float32)[:, None, :]]
    scratch = [pltpu.VMEM((nf, l, LANES), jnp.float32),
               pltpu.VMEM((nf, lpad, LANES), jnp.float32)]
    if which == "t":
        scratch.append(pltpu.VMEM((nf, l, LANES), jnp.float32))
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, nf, l, LANES), lambda i, ei: (ei, 0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((e, nf, l, b), jnp.float32),
        scratch_shapes=scratch,
        interpret=(jax.default_backend() != "tpu"),
    )(*inputs)
    return out


@functools.partial(jax.jit, static_argnames=("freqs",))
def kmatrix_assembled_rho_lwc_lb(freqs: tuple, alpha, da_rho, da_lwc, ds,
                                 t_k, dds_dnl, dds_dk, dn_rho, r0cos):
    """k_rho and k_lwc from ONE shared adjoint core.

    The adjoint quantities (cumulative opacities, transmittances, emission
    factors, W, dTB/dR) are variable-independent; the per-variable work is
    one tangent-field multiply plus the direct terms, so pairing rho+lwc
    saves one full adjoint pass over two single-variable calls.  (A
    3-output kernel with k_t was measured at 22.5 MB of VMEM, over the
    16 MB budget, so `which="t"` stays a separate call.)
    Shapes as in `kmatrix_assembled_lb`; returns (k_rho, k_lwc), each
    (E, F, L, B)."""
    nf, l, b = alpha.shape
    e, lm1, _ = ds.shape
    if lm1 != l - 1:
        raise ValueError(f"ds layers {lm1} != levels-1 {l - 1}")
    if b % LANES:
        raise ValueError(f"B={b} not a multiple of {LANES}")
    lpad = _pad16(lm1)

    grid = (b // LANES, e)
    kernel = _build_kernel(tuple(freqs), l, "rho_lwc")
    flb_spec = pl.BlockSpec((nf, l, LANES), lambda i, ei: (0, 0, i),
                            memory_space=pltpu.VMEM)
    elev_spec = pl.BlockSpec((1, lm1, LANES), lambda i, ei: (ei, 0, i),
                             memory_space=pltpu.VMEM)
    lvl_spec = pl.BlockSpec((l, LANES), lambda i, ei: (0, i),
                            memory_space=pltpu.VMEM)
    tri_spec = pl.BlockSpec((lpad, lpad), lambda i, ei: (0, 0),
                            memory_space=pltpu.VMEM)
    in_specs = [tri_spec, tri_spec, flb_spec, flb_spec, flb_spec,
                elev_spec, lvl_spec, elev_spec, elev_spec, lvl_spec,
                pl.BlockSpec((1, 1, LANES), lambda i, ei: (ei, 0, i),
                             memory_space=pltpu.VMEM)]
    inputs = [_tri_ones(lm1).astype(jnp.bfloat16), _tri_upper_strict(lm1),
              alpha.astype(jnp.float32), da_rho.astype(jnp.float32),
              da_lwc.astype(jnp.float32),
              ds.astype(jnp.float32), t_k.astype(jnp.float32),
              dds_dnl.astype(jnp.float32), dds_dk.astype(jnp.float32),
              dn_rho.astype(jnp.float32),
              r0cos.astype(jnp.float32)[:, None, :]]
    out_spec = pl.BlockSpec((1, nf, l, LANES), lambda i, ei: (ei, 0, 0, i),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((e, nf, l, b), jnp.float32)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[out_spec] * 2,
        out_shape=[out_shape] * 2,
        scratch_shapes=[pltpu.VMEM((nf, l, LANES), jnp.float32)],
        interpret=(jax.default_backend() != "tpu"),
    )(*inputs)
