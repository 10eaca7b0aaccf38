"""Pallas kernel for high-resolution monochromatic absorption spectra.

The channel kernel (absorption_kernel.py) bakes a *static* channel set into
the instruction stream — perfect for 14 HATPRO channels, impossible for the
50k-frequency monochromatic grid of BASELINE config 4.  This kernel flips
the layout: frequencies ride the 128-wide lane axis as *data*, and the
(level x profile) points ride the sublane axis, so one grid step evaluates
ROWS points x FLANES frequencies of the line summation on full VPU tiles.

Division of labor: everything that depends only on the atmospheric point —
line widths, strengths, mixing, continua bases (all the transcendentals) —
is precomputed by XLA over the (n_lines, N) arrays and packed into a single
row-table input; the kernel body is pure per-(line, frequency) resonance
math: ~10 multiply/add + one divide per pair, with runtime Clough-cutoff
masks.  This keeps the kernel compute-bound without unrolling anything over
frequency.

The XLA alternative materializes a (F, N, n_lines) broadcast — 55x the
output size in HBM traffic; this kernel reads ~160 rows of N once and
writes alpha (N, F) once.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...constants.h2o_lines import H2O_MODELS
from ...constants.o2_lines import O2_MODELS
from ..absorption.h2o import _GL_W, _GL_X

ROWS = 32     # points per grid step (sublanes; 4 native 8x128 tiles)
FLANES = 256  # frequencies per grid step (lanes)


def _sd_flags(h2o):
    """Static per-line flags: which H2O lines carry a speed-dependent
    width (qSD shape, R19SD/R20SD)."""
    return ((np.asarray(h2o.w2) != 0.0)
            | (np.asarray(h2o.ws2) != 0.0)).tolist()


def _pack_rows(model: str, p_hpa, t_k, rho_gm3, lwc_gm3):
    """Precompute all per-point line/continuum quantities: (n_rows, N).

    Row layout (Python-side constants consumed by the kernel builder):
      h2o width/s per line, o2 df/strength/yy per line, then the scalar rows
      listed in `_SCALAR_ROWS`.
    """
    h2o = H2O_MODELS[model]
    o2 = O2_MODELS[model]
    p = p_hpa
    t = t_k
    rho = rho_gm3
    w = lwc_gm3

    ti = 300.0 / t
    log_ti = jnp.log(ti)
    pvap = rho * t * (1.0 / 217.0)
    pda = p - pvap
    th1 = ti - 1.0
    ti2 = jnp.exp(2.5 * log_ti)

    rows = []
    sd_flags = _sd_flags(h2o)
    cut2 = float(h2o.cutoff_ghz) ** 2
    for li in range(np.asarray(h2o.fl).size):
        width = float(np.asarray(h2o.w3)[li]) * pda \
            * jnp.exp(float(np.asarray(h2o.x)[li]) * log_ti) \
            + float(np.asarray(h2o.ws)[li]) * pvap \
            * jnp.exp(float(np.asarray(h2o.xs)[li]) * log_ti)
        # line strength with the 1/fl^2 prefactor folded in — saves one
        # kernel multiply and keeps per-line terms uniformly scaled
        s = float(np.asarray(h2o.s1)[li]) * ti2 \
            * jnp.exp(float(np.asarray(h2o.b2)[li]) * (1.0 - ti)) \
            * float(1.0 / np.asarray(h2o.fl, np.float64)[li] ** 2)
        rows.append(width)
        rows.append(s)
        # Clough cutoff pedestal s*w/(cut^2+w^2): frequency-independent, so
        # precomputed here by XLA — this removes one fp32 divide per (line,
        # frequency) pair from the kernel body.
        rows.append(s * width / (cut2 + width * width))
        if sd_flags[li]:
            # quadratic speed dependence of the width (qSD line shape,
            # R19SD/R20SD) — one extra row only for the SD lines.
            rows.append(
                float(np.asarray(h2o.w2)[li]) * pda
                * jnp.exp(float(np.asarray(h2o.x)[li]) * log_ti)
                + float(np.asarray(h2o.ws2)[li]) * pvap
                * jnp.exp(float(np.asarray(h2o.xs)[li]) * log_ti))

    b = jnp.exp(o2.x * log_ti)
    den = 0.001 * (pda * b + o2.h2o_factor * pvap * ti)
    ybase = 0.001 * p * b if o2.mixing_basis == "p" else den
    second = o2.has_second_order
    pe2 = den * den
    for li in range(np.asarray(o2.f).size):
        df = float(np.asarray(o2.w300)[li]) * den
        rows.append(df)
        # strength with the 1/f0^2 prefactor folded in (see H2O above)
        rows.append(float(np.asarray(o2.s300)[li]
                          / np.asarray(o2.f, np.float64)[li] ** 2)
                    * jnp.exp(-float(np.asarray(o2.be)[li]) * th1))
        rows.append(ybase * (float(np.asarray(o2.y0)[li])
                             + float(np.asarray(o2.y1)[li]) * th1))
        if second:
            # width numerator with the G intensity coupling folded in, and
            # the band pressure shift delta-nu (R19+ second-order mixing).
            rows.append(df * (1.0 + pe2 * (float(np.asarray(o2.g0)[li])
                                           + float(np.asarray(o2.g1)[li]) * th1)))
            rows.append(pe2 * (float(np.asarray(o2.dnu0)[li])
                               + float(np.asarray(o2.dnu1)[li]) * th1))

    dfnr = o2.wb300 * den
    con_b = (h2o.cf * jnp.exp(h2o.xcf * log_ti) * pda
             + h2o.cs * jnp.exp(h2o.xcs * log_ti) * pvap) * pvap
    if model == "R98":
        n2_b = 6.4e-14 * pda * pda * jnp.exp(3.55 * log_ti)
    else:
        n2_b = 6.5e-14 * pda * pda * jnp.exp(3.6 * log_ti)
    theta1 = 1.0 - 300.0 / t
    eps0 = 77.66 - 103.3 * theta1
    inv_fp = jnp.exp(-7.88 * theta1) * (1.0 / 20.1)

    scalars = {
        "h2o_scale": (0.3183e-4 * 3.344e16) * rho,
        "con_b": con_b,
        "dfnr2": dfnr * dfnr,
        "dfnr_over_th": dfnr / ti,
        "o2_scale": o2.scale * pda * ti * ti * ti,
        "n2_b": n2_b,
        "eps0": eps0,
        "inv_fp": inv_fp,
        "w_scaled": -0.06286 * w,
    }
    rows.extend(scalars.values())
    return jnp.stack(rows), list(scalars)


def _build_kernel(model: str, n_scalar_rows: int, scalar_names: tuple):
    h2o = H2O_MODELS[model]
    o2 = O2_MODELS[model]
    cut = float(h2o.cutoff_ghz)
    cut2 = cut * cut
    h2o_fl = np.asarray(h2o.fl, np.float64)
    o2_f = np.asarray(o2.f, np.float64)
    nh, no = h2o_fl.size, o2_f.size
    sd_flags = _sd_flags(h2o)
    # per-line base offset into the row table (width/strength/pedestal +
    # 1 gamma2 row for speed-dependent lines)
    h2o_base = np.concatenate(
        [[0], np.cumsum([4 if sd else 3 for sd in sd_flags])]).astype(int)
    second = o2.has_second_order
    o2_rows = 5 if second else 3
    s_base = int(h2o_base[-1]) + o2_rows * no
    sidx = {n: s_base + i for i, n in enumerate(scalar_names)}

    def kernel(f_ref, rows_ref, out_ref):
        # one sublane broadcast of the frequency row, reused by every line
        f = jnp.broadcast_to(f_ref[:], (ROWS, FLANES))
        f2 = f * f
        row = lambda i: rows_ref[i]        # (ROWS, 1); lane-broadcasts cheap

        # ---- H2O lines (runtime Clough masks) -----------------------------
        # The resonance and its mirror share ONE divide:
        #   m1*sw/den1 + m2*sw/den2 = sw*(m1*den2 + m2*den1)/(den1*den2)
        # and the cutoff pedestal s*w/(cut^2+w^2) is a precomputed row
        # (frequency-independent), so a non-SD line costs 1 fp32 divide
        # instead of the naive 3 — divides are the VPU's slowest primitive
        # and dominate this kernel's critical path.
        acc = jnp.zeros((ROWS, FLANES), jnp.float32)
        for li in range(nh):
            fl = float(h2o_fl[li])
            base = int(h2o_base[li])
            width = row(base)
            s = row(base + 1)        # strength (1/fl^2 prefactor folded in)
            sbase = row(base + 2)    # pedestal s*w/(cut^2+w^2), same scale
            wsq = width * width
            sw = s * width
            df1 = f - fl
            df2 = f + fl
            m1 = (jnp.abs(df1) < cut).astype(jnp.float32)
            m2 = (jnp.abs(df2) < cut).astype(jnp.float32)
            den2 = wsq + df2 * df2
            if sd_flags[li]:
                # qSD resonant term: Maxwell-Boltzmann speed average via the
                # 16-node generalized Gauss-Laguerre rule (same nodes as the
                # channel kernel / XLA path); mirror + cutoff base stay
                # Lorentzian (gamma2 negligible hundreds of GHz off line).
                gamma2 = row(base + 3)
                c0 = width - 1.5 * gamma2
                d1sq = df1 * df1
                qsum = jnp.zeros((ROWS, FLANES), jnp.float32)
                for xi, wi in zip(_GL_X, _GL_W):
                    cr = c0 + gamma2 * float(xi)
                    qsum = qsum + (float(wi) * cr) / (cr * cr + d1sq)
                acc = acc + m1 * (s * qsum) + m2 * (sw / den2) \
                    - (m1 + m2) * sbase
            else:
                den1 = wsq + df1 * df1
                acc = acc + (sw * (m1 * den2 + m2 * den1)) / (den1 * den2) \
                    - (m1 + m2) * sbase
        h2o_alpha = (row(sidx["h2o_scale"]) * f2) * acc \
            + row(sidx["con_b"]) * f2

        # ---- O2 lines -----------------------------------------------------
        # Each line's +/- resonance pair already shares one divide; lines
        # are then merged two-at-a-time (P_a/D_a + P_b/D_b =
        # (P_a*D_b + P_b*D_a)/(D_a*D_b)) so the 49-line band costs 25
        # divides per point instead of 49.  fp32 range check: D = den1*den2
        # is in [1e-4, 3e8] over the atmosphere, so D_a*D_b stays well
        # inside fp32; strengths carry the 1e-14-scale s300 so P*D ~ 1e-2.
        acc = jnp.zeros((ROWS, FLANES), jnp.float32)
        pending = None  # (P, D) of the unpaired previous line
        for li in range(no):
            f0 = float(o2_f[li])
            base = int(h2o_base[-1]) + o2_rows * li
            df = row(base)
            strength = row(base + 1)  # 1/f0^2 prefactor folded in
            yy = row(base + 2)
            dfsq = df * df
            if second:
                dfg = row(base + 3)   # df * (1 + G), second-order coupling
                dnu = row(base + 4)   # band pressure shift
                d1 = f - f0 - dnu
                d2 = f + f0 + dnu
            else:
                dfg = df
                d1 = f - f0
                d2 = f + f0
            den1 = dfsq + d1 * d1
            den2 = dfsq + d2 * d2
            p_i = strength * (dfg * (den1 + den2)
                              + yy * (d1 * den2 - d2 * den1))
            d_i = den1 * den2
            if pending is None:
                pending = (p_i, d_i)
            else:
                p_a, d_a = pending
                acc = acc + (p_a * d_i + p_i * d_a) / (d_a * d_i)
                pending = None
        if pending is not None:
            acc = acc + pending[0] / pending[1]
        nonres = row(sidx["dfnr_over_th"]) * float(o2.nonres_coeff) * f2 \
            / (f2 + row(sidx["dfnr2"]))
        o2_alpha = jnp.maximum(
            row(sidx["o2_scale"]) * (f2 * acc + nonres), 0.0)

        # ---- dry continuum ------------------------------------------------
        if model == "R98":
            n2 = row(sidx["n2_b"]) * f2
        else:
            fdep = 0.5 + 0.5 / (1.0 + (f * (1.0 / 450.0)) ** 2)
            n2 = row(sidx["n2_b"]) * fdep * f2

        # ---- cloud liquid -------------------------------------------------
        eps0 = row(sidx["eps0"])
        eps1 = 0.0671 * eps0
        eps2 = 3.52
        u = f * row(sidx["inv_fp"])
        vv = u * (1.0 / 39.8)
        uu1 = 1.0 + u * u
        vv1 = 1.0 + vv * vv
        d01 = eps0 - eps1
        re = eps2 + d01 / uu1 + (eps1 - eps2) / vv1
        im = -d01 * u / uu1 - (eps1 - eps2) * vv / vv1
        aimag = 3.0 * im / ((re + 2.0) ** 2 + im * im)
        liq = (f * aimag) * row(sidx["w_scaled"])

        out_ref[:] = h2o_alpha + o2_alpha + n2 + liq

    return kernel, s_base + n_scalar_rows


@functools.partial(jax.jit, static_argnames=("model",))
def absorption_spectral(f_ghz, p_hpa, t_k, rho_gm3, lwc_gm3,
                        model: str = "R24"):
    """Monochromatic absorption: (F,) x (N,) point arrays -> (N, F) [Np/km].

    Inputs are padded internally to (ROWS, FLANES) tile multiples and the
    result sliced back, so any N/F works.
    """
    n = p_hpa.shape[0]
    nf = f_ghz.shape[0]
    n_pad, f_pad = (-n) % ROWS, (-nf) % FLANES
    if f_pad:
        f_ghz = jnp.concatenate(
            [f_ghz, jnp.broadcast_to(f_ghz[-1:], (f_pad,))])

    def padp(a, fill):
        a = a.astype(jnp.float32)
        if n_pad:
            a = jnp.concatenate([a, jnp.full(n_pad, fill, jnp.float32)])
        return a

    rows, scalar_names = _pack_rows(model, padp(p_hpa, 500.0),
                                    padp(t_k, 250.0), padp(rho_gm3, 0.1),
                                    padp(lwc_gm3, 0.0))
    n, nf = n + n_pad, nf + f_pad
    kernel, n_rows = _build_kernel(model, len(scalar_names),
                                   tuple(scalar_names))
    grid = (n // ROWS, nf // FLANES)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, FLANES), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_rows, ROWS, 1), lambda i, j: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ROWS, FLANES), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, nf), jnp.float32),
        interpret=(jax.default_backend() != "tpu"),
    )(f_ghz.astype(jnp.float32).reshape(1, nf), rows[:, :, None])
    return out[:n - n_pad, :nf - f_pad] if (n_pad or f_pad) else out
