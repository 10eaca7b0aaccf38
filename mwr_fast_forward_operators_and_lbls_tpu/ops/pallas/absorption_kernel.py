"""Fused Pallas TPU kernel for the LBL absorption hot stencil.

Computes total atmospheric absorption (H2O lines + continuum, O2 lines +
nonresonant, dry continuum, cloud liquid) for a *static* channel set in one
VMEM-resident pass — the hot loop the reference spends hours in via
sequential PyRTlib calls (/root/reference/python_src/proc/
PyRTlib_processing.py:99-151).

Layout: profiles are flattened level-major to a (B*L,) column axis and the
channel set forms the sublane axis, so every elementwise op runs on
(F_pad, TILE_N) VPU tiles with zero padding waste in the data dimension
(F_pad = 16 for the 14 HATPRO channels).  The line summation is fully
unrolled with the spectroscopy tables baked in as compile-time literals:

  * per-(channel, line) Clough-cutoff decisions (|f - fl| < 750 GHz) fold to
    constant masks — lines invisible to a channel cost nothing;
  * per-line constants (fl, s1, b2, ...) become immediates, so the only
    VMEM traffic is the four profile arrays in and alpha out
    (~arithmetic intensity 55 lines x ~30 ops / 20 bytes ~ 80 flops/byte —
    compute-bound, exactly where a VPU kernel should sit).

The grid is 1-D over column tiles; batch/level/profile structure is
irrelevant to absorption physics, which is pointwise in (p, T, rho, lwc).
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

F_PAD = 16          # sublane tile (>= 14 channels, fp32 min tile 8)
TILE_N = 512        # lane tile over the flattened (B*L) axis


def _h2o_lines_for(model, freqs):
    """(line constants, per-channel mask) pruned to lines any channel sees."""
    m = H2O_MODELS[model]
    keep = []
    for i, fl in enumerate(np.asarray(m.fl)):
        if np.any(np.abs(freqs - fl) < m.cutoff_ghz) or \
           np.any(np.abs(freqs + fl) < m.cutoff_ghz):
            keep.append(i)
    return m, keep


def _build_kernel(model: str, freqs: tuple):
    """Return a Pallas kernel computing alpha for this model + channel set."""
    freqs_np = np.asarray(freqs, np.float64)
    nf = freqs_np.size
    assert nf <= F_PAD, (nf, F_PAD)
    h2o, h2o_keep = _h2o_lines_for(model, freqs_np)
    o2 = O2_MODELS[model]
    cut = h2o.cutoff_ghz

    def kernel(f_ref, p_ref, t_ref, rho_ref, lwc_ref, out_ref):
        # (1, TILE_N) rows broadcast against the (F_PAD, 1) channel column.
        p = p_ref[:]
        t = t_ref[:]
        rho = rho_ref[:]
        w = lwc_ref[:]
        f = f_ref[:]                                 # (F_PAD, 1) channel col
        f2 = f * f

        ti = 300.0 / t
        pvap = rho * t * (1.0 / 217.0)
        pda = p - pvap
        log_ti = jnp.log(ti)

        # ---------------- H2O resonant lines (unrolled, constants baked) ---
        ti2 = jnp.exp(2.5 * log_ti)                  # ti**2.5
        h2o_sum = jnp.zeros((F_PAD, p.shape[1]), jnp.float32)
        for i in h2o_keep:
            fl = float(np.asarray(h2o.fl)[i])
            s1 = float(np.asarray(h2o.s1)[i])
            b2 = float(np.asarray(h2o.b2)[i])
            w3 = float(np.asarray(h2o.w3)[i])
            x = float(np.asarray(h2o.x)[i])
            ws = float(np.asarray(h2o.ws)[i])
            xs = float(np.asarray(h2o.xs)[i])
            width = w3 * pda * jnp.exp(x * log_ti) \
                + ws * pvap * jnp.exp(xs * log_ti)   # (1, N)
            wsq = width * width
            s = s1 * ti2 * jnp.exp(b2 * (1.0 - ti))  # (1, N)
            base = width / (cut * cut + wsq)
            # per-channel cutoff masks from the constant f column (cheap and
            # loop-invariant; lines invisible to every channel were already
            # pruned at build time via h2o_keep)
            df1 = f - fl
            df2 = f + fl
            mask1 = (jnp.abs(df1) < cut).astype(jnp.float32)
            mask2 = (jnp.abs(df2) < cut).astype(jnp.float32)
            res = mask1 * (width / (df1 * df1 + wsq) - base) \
                + mask2 * (width / (df2 * df2 + wsq) - base)
            h2o_sum = h2o_sum + (s * (1.0 / (fl * fl))) * res
        h2o_lines = 0.3183e-4 * (3.344e16 * rho) * h2o_sum * f2

        con = (h2o.cf * jnp.exp(h2o.xcf * log_ti) * pda
               + h2o.cs * jnp.exp(h2o.xcs * log_ti) * pvap) * pvap * f2

        # ---------------- O2: nonresonant + 40 lines -----------------------
        th1 = ti - 1.0
        b = jnp.exp(o2.x * log_ti)
        den = 0.001 * (pda * b + o2.h2o_factor * pvap * ti)
        dfnr = o2.wb300 * den
        o2_acc = 1.6e-17 * f2 * dfnr / (ti * (f2 + dfnr * dfnr))
        pe2 = den * den
        for i in range(np.asarray(o2.f).size):
            f0 = float(np.asarray(o2.f)[i])
            s300 = float(np.asarray(o2.s300)[i])
            be = float(np.asarray(o2.be)[i])
            w300 = float(np.asarray(o2.w300)[i])
            y300 = float(np.asarray(o2.y300)[i])
            v = float(np.asarray(o2.v)[i])
            g2 = float(np.asarray(o2.g)[i])
            dnu = float(np.asarray(o2.dnu)[i])
            df = w300 * den
            yy = 0.001 * p * b * (y300 + v * th1)
            strength = s300 * jnp.exp(-be * th1)
            fc = f0 + dnu * pe2
            gfac = 1.0 + g2 * pe2
            d1 = f - fc
            d2 = f + fc
            sf1 = (df * gfac + d1 * yy) / (d1 * d1 + df * df)
            sf2 = (df * gfac - d2 * yy) / (d2 * d2 + df * df)
            o2_acc = o2_acc + strength * (sf1 + sf2) * (1.0 / (f0 * f0)) * f2
        o2_alpha = jnp.maximum(
            0.5034e12 * o2_acc * pda * ti * ti * ti * (1.0 / np.pi), 0.0)

        # ---------------- dry continuum ------------------------------------
        if model == "R98":
            n2 = 6.4e-14 * pda * pda * f2 * jnp.exp(3.55 * log_ti)
        else:
            fdep = 0.5 + 0.5 / (1.0 + (f * (1.0 / 450.0)) ** 2)
            n2 = 6.5e-14 * fdep * pda * pda * f2 * jnp.exp(3.6 * log_ti)

        # ---------------- cloud liquid (Liebe-Hufford-Manabe) --------------
        theta1 = 1.0 - 300.0 / t
        eps0 = 77.66 - 103.3 * theta1
        eps1 = 0.0671 * eps0
        eps2 = 3.52
        fp = 20.1 * jnp.exp(7.88 * theta1)
        fs = 39.8 * fp
        u = f / fp
        vv = f / fs
        re = eps2 + (eps0 - eps1) / (1.0 + u * u) + (eps1 - eps2) / (1.0 + vv * vv)
        im = -(eps0 - eps1) * u / (1.0 + u * u) - (eps1 - eps2) * vv / (1.0 + vv * vv)
        aimag = 3.0 * im / ((re + 2.0) ** 2 + im * im)
        liq = -0.06286 * aimag * f * w

        out_ref[:] = h2o_lines + con + o2_alpha + n2 + liq

    return kernel


@functools.partial(jax.jit, static_argnames=("freqs", "model"))
def total_absorption_fused(freqs: tuple, p_hpa, t_k, rho_gm3, lwc_gm3,
                           model: str = "R24"):
    """Fused absorption: (N,) flattened level arrays -> (F, N) alpha [Np/km].

    freqs: static tuple of channel frequencies [GHz] (baked into the kernel).
    p/t/rho/lwc: (N,) float32, N a multiple of TILE_N (pad with any finite
    values and discard those columns).
    """
    n = p_hpa.shape[0]
    if n % TILE_N:
        raise ValueError(f"N={n} not a multiple of {TILE_N}")
    kernel = _build_kernel(model, tuple(freqs))
    grid = (n // TILE_N,)
    row = lambda a: a.reshape(1, n).astype(jnp.float32)
    f_col = np.zeros((F_PAD, 1), np.float32)
    f_col[:len(freqs), 0] = np.asarray(freqs, np.float64)
    in_spec = pl.BlockSpec((1, TILE_N), lambda i: (0, i),
                           memory_space=pltpu.VMEM)
    f_spec = pl.BlockSpec((F_PAD, 1), lambda i: (0, 0),
                          memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[f_spec] + [in_spec] * 4,
        out_specs=pl.BlockSpec((F_PAD, TILE_N), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((F_PAD, n), jnp.float32),
    )(jnp.asarray(f_col), row(p_hpa), row(t_k), row(rho_gm3), row(lwc_gm3))
    return out[:len(freqs)]


def absorption_batch_fused(freqs: tuple, profiles: dict,
                           model: str = "R24") -> jax.Array:
    """(B, L) profile dict -> (B, F, L) alpha via the fused kernel, padding
    the flattened axis up to a TILE_N multiple."""
    p = profiles["p"]
    b, l = p.shape
    n = b * l
    n_pad = -(-n // TILE_N) * TILE_N

    def flat(a, fill):
        v = a.reshape(-1).astype(jnp.float32)
        if n_pad != n:
            v = jnp.concatenate([v, jnp.full(n_pad - n, fill, jnp.float32)])
        return v

    lwc = profiles.get("lwc")
    if lwc is None:
        lwc = jnp.zeros_like(p)
    alpha = total_absorption_fused(
        tuple(freqs), flat(p, 500.0), flat(profiles["t"], 250.0),
        flat(profiles["rho"], 0.1), flat(lwc, 0.0), model)
    return alpha[:, :n].reshape(len(freqs), b, l).transpose(1, 0, 2)
