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


def _mask_status(model: str, f_range):
    """Trace-time Clough-mask classification per H2O line.

    Frequencies are runtime data in this kernel, but their RANGE usually is
    not: the BASELINE config-4 grid spans 20-64 GHz, known when the jit
    cache key is built.  With `f_range=(fmin, fmax)` each line's resonance
    mask m1 = |f-fl| < cut and mirror mask m2 = f+fl < cut collapse to
    "always" / "never" / "runtime" (runtime only when the cutoff circle
    straddles the range boundary) — "never/never" lines drop from the
    instruction stream entirely, and "always" masks erase the two
    compare+convert+select chains per (line, pair).  Returns
    [(m1, m2), ...] with values in {"always", "never", "runtime"};
    f_range=None means every mask is "runtime" (the round-4 behavior).
    """
    h2o = H2O_MODELS[model]
    cut = float(h2o.cutoff_ghz)
    fl_all = np.asarray(h2o.fl, np.float64)
    out = []
    for fl in fl_all:
        if f_range is None:
            out.append(("runtime", "runtime"))
            continue
        fmin, fmax = float(f_range[0]), float(f_range[1])
        # m1 = |f - fl| < cut over f in [fmin, fmax]
        far1 = max(abs(fmin - fl), abs(fmax - fl))
        near1 = 0.0 if fmin <= fl <= fmax else min(abs(fmin - fl),
                                                   abs(fmax - fl))
        m1 = "always" if far1 < cut else ("never" if near1 >= cut
                                          else "runtime")
        # m2 = f + fl < cut (f, fl > 0)
        m2 = "always" if fmax + fl < cut else (
            "never" if fmin + fl >= cut else "runtime")
        out.append((m1, m2))
    return out


def _h2o_layout(model: str, f_range):
    """Status-dependent per-H2O-line row layout, shared by `_pack_rows`
    and `_build_kernel` (both derive it from the same static inputs, so
    the two cannot disagree).

    kinds/rows:
      "skip"    0 rows  — both halves outside the Clough cutoff
      "sd"      4 rows  [width, s, sbase, gamma2] — qSD lines
      "both"    3 rows  [sw2 = 2*s*width, q = w^2 + fl^2, wsq] — both
                halves always in: the compressed rational
                P = sw2*(q+u), D = (wsq+d1^2)*((q+u)+2*fl*f) with u = f^2
                (den1+den2 = 2(q+u) exactly; den1 must keep the exact
                wsq+d1^2 form — q's w^2 contribution rounds away next to
                fl^2, which is fine in q but catastrophic in den1)
      "single1" 2 rows  [sw, wsq] — only the resonance in range
      "single2" 2 rows  [sw, wsq] — only the mirror in range
      "runtime" 3 rows  [width, s, sbase] — boundary line, runtime masks
    Returns (kinds list, base-offset array).
    """
    sd = _sd_flags(H2O_MODELS[model])
    kinds = []
    for (m1, m2), is_sd in zip(_mask_status(model, f_range), sd):
        if is_sd:
            kinds.append("sd")
        elif m1 == "never" and m2 == "never":
            kinds.append("skip")
        elif m1 == "always" and m2 == "always":
            kinds.append("both")
        elif m1 == "always" and m2 == "never":
            kinds.append("single1")
        elif m1 == "never" and m2 == "always":
            kinds.append("single2")
        else:
            kinds.append("runtime")
    n_rows = {"skip": 0, "sd": 4, "both": 3, "single1": 2, "single2": 2,
              "runtime": 3}
    base = np.concatenate(
        [[0], np.cumsum([n_rows[k] for k in kinds])]).astype(int)
    return kinds, base


def _pack_rows(model: str, p_hpa, t_k, rho_gm3, lwc_gm3, f_range=None):
    """Precompute all per-point line/continuum quantities: (n_rows, N).

    Row layout (Python-side constants consumed by the kernel builder):
      h2o width/s per line, o2 df/strength/yy per line, then the scalar rows
      listed in `_SCALAR_ROWS`.  With a static `f_range` the pedestal terms
    of every always-in-cutoff line half fold into ONE precombined row
    (`ped_always`), replacing 2 kernel ops per (line, pair) by one per
    pair.
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
    masks = _mask_status(model, f_range)
    kinds, _ = _h2o_layout(model, f_range)
    fl_np = np.asarray(h2o.fl, np.float64)
    cut2 = float(h2o.cutoff_ghz) ** 2
    ped_always = jnp.zeros_like(p)
    for li, kind in enumerate(kinds):
        if kind == "skip":
            continue
        fl = float(fl_np[li])
        width = float(np.asarray(h2o.w3)[li]) * pda \
            * jnp.exp(float(np.asarray(h2o.x)[li]) * log_ti) \
            + float(np.asarray(h2o.ws)[li]) * pvap \
            * jnp.exp(float(np.asarray(h2o.xs)[li]) * log_ti)
        # line strength with the 1/fl^2 prefactor folded in — saves one
        # kernel multiply and keeps per-line terms uniformly scaled
        s = float(np.asarray(h2o.s1)[li]) * ti2 \
            * jnp.exp(float(np.asarray(h2o.b2)[li]) * (1.0 - ti)) \
            * float(1.0 / fl ** 2)
        # Clough cutoff pedestal s*w/(cut^2+w^2): frequency-independent, so
        # precomputed here by XLA — one fp32 divide per (line, POINT)
        # instead of per (line, frequency) pair.
        sbase = s * width / (cut2 + width * width)
        m1, m2 = masks[li]
        n_always = (m1 == "always") + (m2 == "always")
        if n_always:
            ped_always = ped_always + float(n_always) * sbase
        if kind == "sd":
            rows.extend([width, s, sbase,
                         float(np.asarray(h2o.w2)[li]) * pda
                         * jnp.exp(float(np.asarray(h2o.x)[li]) * log_ti)
                         + float(np.asarray(h2o.ws2)[li]) * pvap
                         * jnp.exp(float(np.asarray(h2o.xs)[li]) * log_ti)])
        elif kind == "both":
            rows.extend([2.0 * s * width, width * width + fl * fl,
                         width * width])
        elif kind in ("single1", "single2"):
            rows.extend([s * width, width * width])
        else:                                 # runtime boundary line
            rows.extend([width, s, sbase])

    b = jnp.exp(o2.x * log_ti)
    den = 0.001 * (pda * b + o2.h2o_factor * pvap * ti)
    ybase = 0.001 * p * b if o2.mixing_basis == "p" else den
    second = o2.has_second_order
    pe2 = den * den
    # Compressed O2 rational rows (see _build_kernel's O2 section):
    #   A2 = 2*strength*dfg,  R = 2*b*strength*yy,  q = df^2 + b^2,
    #   [b = f0 + dnu when second-order], g = df^2 (exact, NOT q - b^2 —
    #   df^2 rounds away next to b^2 but must survive exactly in den1)
    for li in range(np.asarray(o2.f).size):
        f0 = float(np.asarray(o2.f, np.float64)[li])
        df = float(np.asarray(o2.w300)[li]) * den
        strength = float(np.asarray(o2.s300)[li] / f0 ** 2) \
            * jnp.exp(-float(np.asarray(o2.be)[li]) * th1)
        yy = ybase * (float(np.asarray(o2.y0)[li])
                      + float(np.asarray(o2.y1)[li]) * th1)
        if second:
            dfg = df * (1.0 + pe2 * (float(np.asarray(o2.g0)[li])
                                     + float(np.asarray(o2.g1)[li]) * th1))
            bshift = f0 + pe2 * (float(np.asarray(o2.dnu0)[li])
                                 + float(np.asarray(o2.dnu1)[li]) * th1)
        else:
            dfg = df
            bshift = f0
        dfsq = df * df
        rows.append(2.0 * strength * dfg)                     # A2
        rows.append(2.0 * bshift * strength * yy)             # R
        rows.append(dfsq + bshift * bshift)                   # q
        if second:
            rows.append(bshift)                               # b
        rows.append(dfsq)                                     # g

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
        "ped_always": ped_always,
    }
    rows.extend(scalars.values())
    return jnp.stack(rows), list(scalars)


# Division strategy for the rational sums: "hw" = hardware fp32 divide
# (the production setting); "newton" = magic-constant reciprocal seed + 2
# Newton steps — kept as a measurement instrument only.  Measured on v5e
# (round 5): newton is just 1.07x faster end-to-end, i.e. the hardware
# divide costs roughly its modeled ~10 issue slots and the kernel is NOT
# divide-bound; and the magic seed breaks for the depth-2-merged
# denominators (bit pattern exceeds the magic constant above ~3e19), so
# "newton" is NOT production-safe without per-term rescaling.
_DIV_MODE = "hw"


def _rdiv(p, d):
    """p / d through the selected division strategy (see _DIV_MODE)."""
    if _DIV_MODE == "hw":
        return p / d
    i = jax.lax.bitcast_convert_type(d, jnp.int32)
    x = jax.lax.bitcast_convert_type(
        jnp.int32(0x7EF0A3D7) - i, jnp.float32)
    x = x * (2.0 - d * x)
    x = x * (2.0 - d * x)
    return p * x


def _merge_rationals(terms, depth: int):
    """Merge a list of (P, D) rationals through a `depth`-level pairwise
    tree: each level halves the number of eventual hardware divides at the
    cost of 3 lane ops per merge (the fp32 divide is ~10 issue slots)."""
    for _ in range(depth):
        merged = []
        for j in range(0, len(terms) - 1, 2):
            (pa, da), (pb, db) = terms[j], terms[j + 1]
            merged.append((pa * db + pb * da, da * db))
        if len(terms) % 2:
            merged.append(terms[-1])
        terms = merged
    return terms


class _RationalAccum:
    """Streaming sum of P/D rationals with bounded live state.

    Building ALL per-line rationals and merging at the end (the round-4
    shape) keeps ~2 x n_lines (ROWS, FLANES) tiles alive simultaneously —
    measured on v5e to spill so heavily that the kernel ran at ~1/3 of
    the clean-ILP op rate.  This accumulator merges each consecutive group
    of `group` rationals into ONE divide as soon as the group completes,
    so at most `group` pairs (plus the running sum) are ever live.  Same
    divide count and same per-group merge tree as the batch form.
    """

    def __init__(self, group: int, acc):
        self.group = group
        self.acc = acc
        self._pend = []

    def add(self, p, d):
        self._pend.append((p, d))
        if len(self._pend) == self.group:
            self._flush()

    def _flush(self):
        if not self._pend:
            return
        terms = self._pend
        self._pend = []
        while len(terms) > 1:
            terms = _merge_rationals(terms, 1)
        p, d = terms[0]
        t = _rdiv(p, d)
        self.acc = t if self.acc is None else self.acc + t

    def result(self):
        self._flush()
        return self.acc


def _build_kernel(model: str, n_scalar_rows: int, scalar_names: tuple,
                  f_range=None):
    h2o = H2O_MODELS[model]
    o2 = O2_MODELS[model]
    cut = float(h2o.cutoff_ghz)
    h2o_fl = np.asarray(h2o.fl, np.float64)
    o2_f = np.asarray(o2.f, np.float64)
    nh, no = h2o_fl.size, o2_f.size
    masks = _mask_status(model, f_range)
    kinds, h2o_base = _h2o_layout(model, f_range)
    second = o2.has_second_order
    o2_rows = 5 if second else 4
    s_base = int(h2o_base[-1]) + o2_rows * no
    sidx = {n: s_base + i for i, n in enumerate(scalar_names)}
    # O2 depth-2 merging (4 lines per divide) needs the 4-denominator
    # product inside fp32: d_i <= ((fmax + 120)^2)^2, so the quad product
    # stays ~10x under fp32 max only for fmax <= ~100 GHz — exactly the
    # MWR regime the static range gives us.  Without a range (or above),
    # stay at the round-4 depth-1.
    o2_depth = 2 if (f_range is not None and float(f_range[1]) <= 100.0) \
        else 1

    def kernel(f_ref, rows_ref, out_ref):
        # one sublane broadcast of the frequency row, reused by every line
        f = jnp.broadcast_to(f_ref[:], (ROWS, FLANES))
        f2 = f * f
        row = lambda i: rows_ref[i]        # (ROWS, 1); lane-broadcasts cheap

        # ---- H2O lines ----------------------------------------------------
        # Static f_range folding (see _mask_status): out-of-cutoff lines
        # vanish, always-in masks erase their compare/convert/select
        # chains, and the pedestal of every always-half is a single
        # precombined row.  A line's resonance and mirror share ONE divide
        #   m1*sw/den1 + m2*sw/den2 = sw*(m1*den2 + m2*den1)/(den1*den2)
        # and surviving per-line rationals merge pairwise ACROSS lines
        # (depth 1: D products reach ~1e22, comfortably fp32), so the
        # common case costs half a hardware divide per line.
        acc = jnp.zeros((ROWS, FLANES), jnp.float32)
        rac = _RationalAccum(2, None)
        for li in range(nh):
            kind = kinds[li]
            if kind == "skip":
                continue                     # zero instructions for this line
            m1s, m2s = masks[li]
            fl = float(h2o_fl[li])
            base = int(h2o_base[li])
            ped_runtime = None

            def rmask(df, _cut=cut):
                return (jnp.abs(df) < _cut).astype(jnp.float32)

            if kind == "both":
                # compressed rational (see _h2o_layout): P = sw2*(q+u),
                # D = den1*den2 with den1 = wsq + (f-fl)^2 kept in the
                # cancellation-safe form and den2 = (q+u) + 2*fl*f (every
                # term positive — the mirror never cancels).
                sw2 = row(base)
                q = row(base + 1)
                wsq = row(base + 2)
                t_ = q + f2
                d1 = f - fl
                den1 = wsq + d1 * d1
                den2 = t_ + (2.0 * fl) * f
                rac.add(sw2 * t_, den1 * den2)
                continue
            if kind in ("single1", "single2"):
                sw = row(base)
                wsq = row(base + 1)
                dfh = f - fl if kind == "single1" else f + fl
                rac.add(sw, wsq + dfh * dfh)
                continue
            width = row(base)
            s = row(base + 1)        # strength (1/fl^2 prefactor folded in)
            sbase = row(base + 2)    # pedestal s*w/(cut^2+w^2), same scale
            wsq = width * width
            sw = s * width
            df1 = f - fl
            if kind == "sd":
                # qSD resonant term: Maxwell-Boltzmann speed average via
                # the 16-node generalized Gauss-Laguerre rule, nodes merged
                # through a depth-2 tree (4 nodes per divide; denominators
                # bounded below by cr^2 ~ 1e-6 and above by cut^2 ~ 6e5,
                # so the quad products sit well inside fp32).  Mirror +
                # cutoff base stay Lorentzian (gamma2 negligible hundreds
                # of GHz off line); the mirror rational joins the
                # cross-line merge below.
                if m1s != "never":
                    gamma2 = row(base + 3)
                    c0 = width - 1.5 * gamma2
                    d1sq = df1 * df1
                    qacc = _RationalAccum(4, None)
                    for xi, wi in zip(_GL_X, _GL_W):
                        cr = c0 + gamma2 * float(xi)
                        qacc.add(float(wi) * cr, cr * cr + d1sq)
                    qsum = qacc.result()
                    res = s * qsum
                    if m1s == "runtime":
                        m1 = rmask(df1)
                        res = m1 * res
                        ped_runtime = m1 * sbase
                    acc = acc + res
                if m2s != "never":
                    df2 = f + fl
                    den2 = wsq + df2 * df2
                    if m2s == "runtime":
                        m2 = rmask(df2)
                        rac.add(m2 * sw, den2)
                        ped_runtime = m2 * sbase if ped_runtime is None \
                            else ped_runtime + m2 * sbase
                    else:
                        rac.add(sw, den2)
            else:
                den1 = wsq + df1 * df1 if m1s != "never" else None
                den2 = None
                if m2s != "never":
                    df2 = f + fl
                    den2 = wsq + df2 * df2
                if m1s == "always" and m2s == "always":
                    rats.append((sw * (den1 + den2), den1 * den2))
                elif m1s == "always" and m2s == "never":
                    rats.append((sw, den1))
                elif m1s == "never" and m2s == "always":
                    rats.append((sw, den2))
                else:
                    # at least one runtime mask: keep the round-4 masked
                    # combined rational (correct for every status mix)
                    m1 = rmask(df1) if m1s == "runtime" else (
                        1.0 if m1s == "always" else 0.0)
                    m2 = rmask(f + fl) if m2s == "runtime" else (
                        1.0 if m2s == "always" else 0.0)
                    if den1 is None:
                        rac.add(m2 * sw, den2)
                    elif den2 is None:
                        rac.add(m1 * sw, den1)
                    else:
                        rac.add(sw * (m1 * den2 + m2 * den1),
                                den1 * den2)
                    ped = 0.0
                    if m1s == "runtime":
                        ped = m1 * sbase
                    if m2s == "runtime":
                        ped = ped + m2 * sbase if not isinstance(ped, float) \
                            else m2 * sbase
                    ped_runtime = None if isinstance(ped, float) else ped
            if ped_runtime is not None:
                acc = acc - ped_runtime
        rsum = rac.result()
        if rsum is not None:
            acc = acc + rsum
        # always-half pedestals, precombined into one row (XLA side)
        acc = acc - row(sidx["ped_always"])
        h2o_alpha = (row(sidx["h2o_scale"]) * f2) * acc \
            + row(sidx["con_b"]) * f2

        # ---- O2 lines -----------------------------------------------------
        # Compressed per-line rational (round 5).  With b = f0 + dnu,
        # g = df^2, u = f^2 and the XLA-precomputed rows A2 = 2*s*dfg,
        # R = 2*b*s*yy, q = g + b^2, the algebra collapses:
        #     den1 + den2        = 2*(q + u)
        #     d1*den2 - d2*den1  = 2*b*(u - q + ... ) exactly -2b*g+2b(u-b^2)
        #                        = 2*b*(u - q)           [q = g + b^2]
        # so  P = A2*(q + u) + R*(u - q),  and only den1 needs the
        # cancellation-safe (f-b)^2 form (u - q cancels too, but it only
        # feeds the y-mixing CORRECTION, where eps*u absolute error is
        # orders below the line term); den2 = (q+u) + 2*b*f is an all-
        # positive mirror.  ~10 tile-ops per line instead of the round-4
        # ~15 plus hidden lane-broadcasts of 5 operand rows.
        # Lines then merge through a depth-`o2_depth` pairwise tree (see
        # above: depth 2 = 4 lines per divide when the static range allows
        # it), taking the 49-line band from 49 naive divides to 13.  fp32
        # range check: D = den1*den2 is in [1e-4, 3e8] over the atmosphere
        # at fmax <= 100, so the quad products stay inside fp32; strengths
        # carry the 1e-14-scale s300 so P*D products stay ~1e-2 scale.
        acc = jnp.zeros((ROWS, FLANES), jnp.float32)
        rac = _RationalAccum(2 ** o2_depth, acc)
        for li in range(no):
            f0 = float(o2_f[li])
            base = int(h2o_base[-1]) + o2_rows * li
            a2 = row(base)
            r_mix = row(base + 1)
            q = row(base + 2)
            t_ = q + f2
            if second:
                bb = row(base + 3)
                g = row(base + 4)
                d1 = f - bb
                den2 = t_ + 2.0 * (bb * f)
            else:
                g = row(base + 3)
                d1 = f - f0
                den2 = t_ + (2.0 * f0) * f
            p_i = a2 * t_ + r_mix * (f2 - q)
            den1 = g + d1 * d1
            rac.add(p_i, den1 * den2)
        acc = rac.result()
        nonres = _rdiv(row(sidx["dfnr_over_th"]) * float(o2.nonres_coeff)
                       * f2, f2 + row(sidx["dfnr2"]))
        o2_alpha = jnp.maximum(
            row(sidx["o2_scale"]) * (f2 * acc + nonres), 0.0)

        # ---- dry continuum ------------------------------------------------
        if model == "R98":
            n2 = row(sidx["n2_b"]) * f2
        else:
            fdep = 0.5 + _rdiv(0.5 * jnp.ones_like(f),
                               1.0 + (f * (1.0 / 450.0)) ** 2)
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
        # ra = d01/uu1 and rb = (eps1-eps2)/vv1 share ONE reciprocal of
        # uu1*vv1 (both denominators strictly positive)
        inv_uv = _rdiv(jnp.ones_like(uu1), uu1 * vv1)
        ra = d01 * (vv1 * inv_uv)
        rb = (eps1 - eps2) * (uu1 * inv_uv)
        re = eps2 + ra + rb
        im = -(ra * u + rb * vv)
        aimag = _rdiv(3.0 * im, (re + 2.0) ** 2 + im * im)
        liq = (f * aimag) * row(sidx["w_scaled"])

        out_ref[:] = h2o_alpha + o2_alpha + n2 + liq

    return kernel, s_base + n_scalar_rows


@functools.partial(jax.jit, static_argnames=("model", "f_range"))
def absorption_spectral(f_ghz, p_hpa, t_k, rho_gm3, lwc_gm3,
                        model: str = "R24", f_range=None):
    """Monochromatic absorption: (F,) x (N,) point arrays -> (N, F) [Np/km].

    Inputs are padded internally to (ROWS, FLANES) tile multiples and the
    result sliced back, so any N/F works.

    f_range: optional STATIC (fmin, fmax) bound on the frequency values —
    the caller's promise, used to fold Clough-cutoff masks and prune
    out-of-range lines at trace time (`_mask_status`) and to enable the
    deeper O2 divide merge.  Pass rounded bounds (e.g. whole GHz) so the
    jit cache stays warm across similar grids.
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
                                    padp(lwc_gm3, 0.0), f_range)
    n, nf = n + n_pad, nf + f_pad
    kernel, n_rows = _build_kernel(model, len(scalar_names),
                                   tuple(scalar_names), f_range)
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
