"""Fused Pallas TPU kernel for the LBL absorption hot stencil.

Computes total atmospheric absorption (H2O lines + continuum, O2 lines +
nonresonant, dry continuum, cloud liquid) for a *static* channel set in one
VMEM-resident pass — the hot loop the reference spends hours in via
sequential PyRTlib calls (/root/reference/python_src/proc/
PyRTlib_processing.py:99-151).

Layout: absorption physics is pointwise in (p, T, rho, lwc), so the
batch x level structure is flattened and reshaped to (rows, 128) — both
sublanes and lanes hold *data points*, giving every vector op a full
(8, 128) native VPU tile with zero broadcast traffic.  The channel set is
a compile-time Python loop: each channel frequency is a scalar immediate,
so per-(channel, line) quantities like (f - f0)^2 and the Clough-cutoff
decision |f - fl| < 750 GHz fold at trace time (line/channel pairs outside
the cutoff cost *zero* instructions).  Per-line tile-valued quantities
(widths, strengths, mixing) are hoisted out of the channel loop and shared
across all channels.

With the spectroscopy tables baked in as immediates the only VMEM traffic
is 4 profile tiles in and nf alpha tiles out; the ~8 ops / pair line math
dominates, i.e. the kernel is VPU-compute-bound as it should be.
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
from ..absorption.h2o import _GL_W as _GL_W_J
from ..absorption.h2o import _GL_X as _GL_X_J

# Gauss-Laguerre nodes/weights for the qSD line shape, as trace-time floats.
_GL_X = np.asarray(_GL_X_J, np.float64)
_GL_W = np.asarray(_GL_W_J, np.float64)

LANES = 128         # native lane count
BLOCK_ROWS = 8      # sublane rows per grid step (8 = one fp32 vreg per value)


# ---------------------------------------------------------------------------
# Hand-rolled forward-mode dual numbers with two tangent slots (dT, drho).
#
# The SAME kernel body computes either alpha alone or (alpha, dalpha/dT,
# dalpha/drho) in one fused pass: inputs are wrapped in `_D` and every
# arithmetic op carries the two tangents along (a Dual multiply is 1 primal
# + 4 tangent lane ops; a Dual divide still costs ONE hardware divide — the
# reciprocal is reused by both tangents).  Python-float 0.0 is the symbolic
# zero tangent, so when tangents are off every tangent expression constant-
# folds at trace time and the kernel is bit-identical to the plain one.
# This is what replaces XLA reverse/forward AD of the absorption for the
# K-matrix: the per-point setup (all the transcendentals) is evaluated once
# and shared by value and tangents inside VMEM.
# ---------------------------------------------------------------------------

def _tz(a, b):
    """Tangent add with symbolic-zero shortcut."""
    if isinstance(a, float) and a == 0.0:
        return b
    if isinstance(b, float) and b == 0.0:
        return a
    return a + b


def _tm(c, t):
    """coefficient * tangent with symbolic-zero shortcut."""
    if isinstance(t, float) and t == 0.0:
        return 0.0
    if isinstance(c, float) and c == 0.0:
        return 0.0
    return c * t


def _tneg(t):
    return 0.0 if (isinstance(t, float) and t == 0.0) else -t


def _is_zero(t):
    return isinstance(t, float) and t == 0.0


class _D:
    __slots__ = ("v", "dt", "dr")

    def __init__(self, v, dt=0.0, dr=0.0):
        self.v, self.dt, self.dr = v, dt, dr

    def __add__(self, o):
        o = _as_d(o)
        return _D(self.v + o.v, _tz(self.dt, o.dt), _tz(self.dr, o.dr))

    __radd__ = __add__

    def __sub__(self, o):
        o = _as_d(o)
        return _D(self.v - o.v, _tz(self.dt, _tneg(o.dt)),
                  _tz(self.dr, _tneg(o.dr)))

    def __rsub__(self, o):
        return _as_d(o).__sub__(self)

    def __mul__(self, o):
        o = _as_d(o)
        return _D(self.v * o.v,
                  _tz(_tm(o.v, self.dt), _tm(self.v, o.dt)),
                  _tz(_tm(o.v, self.dr), _tm(self.v, o.dr)))

    __rmul__ = __mul__

    def __truediv__(self, o):
        o = _as_d(o)
        if _is_zero(o.dt) and _is_zero(o.dr):
            inv = 1.0 / o.v          # constant/opaque denominator
            return _D(self.v * inv, _tm(inv, self.dt), _tm(inv, self.dr))
        inv = 1.0 / o.v              # ONE hardware divide for value + tangents
        v = self.v * inv
        return _D(v,
                  _tm(inv, _tz(self.dt, _tm(-v, o.dt))),
                  _tm(inv, _tz(self.dr, _tm(-v, o.dr))))

    def __rtruediv__(self, o):
        return _as_d(o).__truediv__(self)

    def __neg__(self):
        return _D(-self.v, _tneg(self.dt), _tneg(self.dr))

    def __pow__(self, n):
        assert n == 2
        return self * self


def _as_d(x):
    return x if isinstance(x, _D) else _D(x)


def _exp(x):
    if isinstance(x, _D):
        e = jnp.exp(x.v)
        return _D(e, _tm(e, x.dt), _tm(e, x.dr))
    return jnp.exp(x)


def _log(x):
    if isinstance(x, _D):
        if _is_zero(x.dt) and _is_zero(x.dr):
            return _D(jnp.log(x.v))
        inv = 1.0 / x.v
        return _D(jnp.log(x.v), _tm(inv, x.dt), _tm(inv, x.dr))
    return jnp.log(x)


def _max0(x):
    if isinstance(x, _D):
        pos = x.v > 0.0
        gate = lambda t: 0.0 if _is_zero(t) else jnp.where(pos, t, 0.0)
        return _D(jnp.maximum(x.v, 0.0), gate(x.dt), gate(x.dr))
    return jnp.maximum(x, 0.0)


def _val(x):
    return x.v if isinstance(x, _D) else x


def _tan(x, slot):
    t = getattr(x, slot) if isinstance(x, _D) else 0.0
    return t


def _first_tensor_zero_like(ref_val):
    return jnp.zeros_like(ref_val)


def _build_kernel(model: str, freqs: tuple, with_o3: bool = False,
                  with_tangents: bool = False):
    """Return a Pallas kernel computing alpha for this model + channel set.

    All spectroscopy constants become Python-float immediates; the channel
    loop is unrolled with per-channel scalar frequencies.  with_o3 adds a
    fifth (o3 ppmv) input and the 15-line ozone rotational sum (the ARMS-gb
    capability, ARMS_gb_processing.py:94-99).
    """
    freqs_np = np.asarray(freqs, np.float64)
    nf = freqs_np.size
    h2o = H2O_MODELS[model]
    o2 = O2_MODELS[model]
    cut = float(h2o.cutoff_ghz)
    cut2 = cut * cut

    if with_o3:
        from ...constants import o3_lines
        o3_fl = np.asarray(o3_lines.O3_FL, np.float64)
        o3_s1 = np.asarray(o3_lines.O3_S1, np.float64)
        o3_b2 = np.asarray(o3_lines.O3_B2, np.float64)
        o3_w3 = np.asarray(o3_lines.O3_W3, np.float64)
        o3_x = np.asarray(o3_lines.O3_X, np.float64)
        o3_wmax = o3_w3 * 1100.0 * (300.0 / 170.0) ** np.maximum(o3_x, 0)

    h2o_fl = np.asarray(h2o.fl, np.float64)
    h2o_s1 = np.asarray(h2o.s1, np.float64)
    h2o_b2 = np.asarray(h2o.b2, np.float64)
    h2o_w3 = np.asarray(h2o.w3, np.float64)
    h2o_x = np.asarray(h2o.x, np.float64)
    h2o_ws = np.asarray(h2o.ws, np.float64)
    h2o_xs = np.asarray(h2o.xs, np.float64)
    h2o_w2 = np.asarray(h2o.w2, np.float64)
    h2o_ws2 = np.asarray(h2o.ws2, np.float64)

    o2_f = np.asarray(o2.f, np.float64)
    o2_s300 = np.asarray(o2.s300, np.float64)
    o2_be = np.asarray(o2.be, np.float64)
    o2_w300 = np.asarray(o2.w300, np.float64)
    o2_y0 = np.asarray(o2.y0, np.float64)
    o2_y1 = np.asarray(o2.y1, np.float64)
    o2_g0 = np.asarray(o2.g0, np.float64)
    o2_g1 = np.asarray(o2.g1, np.float64)
    o2_dnu0 = np.asarray(o2.dnu0, np.float64)
    o2_dnu1 = np.asarray(o2.dnu1, np.float64)
    o2_second = o2.has_second_order

    # Conservative per-line upper bounds on the pressure-broadened width
    # [GHz] over any physical atmosphere (p_dry <= 1100 hPa, p_vap <= 120
    # hPa, T >= 170 K).  A (line, channel) pair whose worst-case
    # width^2/distance^2 ratio r is below VERY_FAR_R evaluates its
    # Lorentzian through a 2-term geometric series with a *compile-time*
    # reciprocal — 1/(w^2 + d^2) = (1/d^2)(1 - w^2/d^2), truncation r^2
    # <= 2.5e-5 of that line's (already-small wing) contribution — instead
    # of [add + fp32 divide].  This covers every O2 mirror (f + f0) term
    # and every H2O line above 183 GHz: ~60 % of the pair terms at ~1/3
    # the op count.  (A 4-term series for mid-range pairs was tried and
    # measured *slower* than the hardware divide.)
    h2o_wmax = h2o_w3 * 1100.0 * (300.0 / 170.0) ** np.maximum(h2o_x, 0) \
        + h2o_ws * 120.0 * (300.0 / 170.0) ** np.maximum(h2o_xs, 0)
    o2_dfmax = o2_w300 * 2.0
    VERY_FAR_R = 5e-3

    def _lorentz_term(num, var_sq, d_sq: float, very_far: bool):
        """num / (var_sq + d_sq) with d_sq a trace-time constant."""
        if very_far:
            inv = 1.0 / d_sq
            return (num * inv) * (1.0 - var_sq * inv)
        return num / (var_sq + d_sq)

    def kernel(p_ref, t_ref, rho_ref, lwc_ref, *rest):
        if with_o3:
            o3_ref, rest = rest[0], rest[1:]
        else:
            o3_ref = None
        if with_tangents:
            out_ref, dt_ref, dr_ref = rest
        else:
            (out_ref,) = rest
        p = p_ref[:]
        t = t_ref[:]
        rho = rho_ref[:]
        w = lwc_ref[:]
        if with_tangents:
            # dual-number inputs: one fused pass yields alpha and its
            # elementwise partials w.r.t. T and rho
            t = _D(t, 1.0, 0.0)
            rho = _D(rho, 0.0, 1.0)

        # ---- shared thermodynamic quantities (per data tile) --------------
        ti = 300.0 / t
        log_ti = _log(ti)
        pvap = rho * t * (1.0 / 217.0)
        pda = p - pvap
        th1 = ti - 1.0

        # Trace-time exponential memoization: the line tables reuse
        # temperature exponents heavily (O2 has 30 unique `be` of 49 lines;
        # H2O's b2*(1-ti) is the same -th1 family), so exp(c * log_ti) and
        # exp(c * th1) are cached on the Python-float coefficient — each
        # distinct exponent costs ONE transcendental per point.
        _memo_logti, _memo_th1 = {}, {}

        def exp_logti(c: float):
            if c not in _memo_logti:
                _memo_logti[c] = _exp(c * log_ti)
            return _memo_logti[c]

        def exp_th1(c: float):
            if c not in _memo_th1:
                _memo_th1[c] = _exp(c * th1)
            return _memo_th1[c]

        # ---- H2O resonant lines -------------------------------------------
        # acc_h2o[ch] accumulates sum_l s_l * res_l / fl^2; scaled by
        # 0.3183e-4 * 3.344e16 * rho * f^2 at the end.
        #
        # "Very far" halves (the common case: every mirror, every line far
        # from the channel) fold COMPLETELY into trace-time constants: the
        # 2-term series of a half minus its share of the Clough pedestal is
        #     sw*(inv - inv_cut2) - (sw*w^2)*(inv^2 - inv_cut2^2),
        # so summing the parenthesized constants over a channel's far
        # halves collapses any number of them into TWO fma per (line,
        # channel) on the hoisted per-point tensors (sw, sw*w^2) — same
        # algebra as evaluating each half, just reassociated at trace time.
        ti2 = exp_logti(2.5)
        inv_cut2 = 1.0 / cut2
        invc2_sq = inv_cut2 * inv_cut2
        acc_h2o = [None] * nf
        for li in range(h2o_fl.size):
            fl = float(h2o_fl[li])
            # channels that see this line through the Clough cutoff
            m1 = [abs(f - fl) < cut for f in freqs_np]
            m2 = [abs(f + fl) < cut for f in freqs_np]
            if not (any(m1) or any(m2)):
                continue
            width = float(h2o_w3[li]) * pda * exp_logti(float(h2o_x[li])) \
                + float(h2o_ws[li]) * pvap * exp_logti(float(h2o_xs[li]))
            wsq = width * width
            # b2*(1-ti) = -b2*th1 — same memo family as the O2 strengths.
            s = float(h2o_s1[li]) * ti2 * exp_th1(-float(h2o_b2[li]))
            sw = s * width
            swsq = sw * wsq
            # Clough base: cut^2 >> w^2, so the series is exact to ~1e-10.
            sbase = (sw * inv_cut2) * (1.0 - wsq * inv_cut2)
            inv_fl2 = 1.0 / (fl * fl)
            wmax_sq = float(h2o_wmax[li]) ** 2
            # Speed-dependent lines (R19SD/R20SD, 22/183 GHz): the
            # near-resonant term is the Maxwell-Boltzmann speed average of
            # Lorentzians, evaluated by the same 16-node generalized
            # Gauss-Laguerre rule as the XLA path (ops/absorption/h2o.py).
            # The per-node widths cr_i and cr_i^2 depend only on the line,
            # so they are hoisted out of the channel loop; each channel
            # then costs 16 [add + divide + fma] — and the detuning^2 is a
            # trace-time scalar.  Mirror terms and the cutoff base stay
            # Lorentzian (gamma2 is negligible hundreds of GHz off line).
            sd_nodes = None
            if float(h2o_w2[li]) != 0.0 or float(h2o_ws2[li]) != 0.0:
                gamma2 = (float(h2o_w2[li]) * pda
                          * exp_logti(float(h2o_x[li]))
                          + float(h2o_ws2[li]) * pvap
                          * exp_logti(float(h2o_xs[li])))
                c0 = width - 1.5 * gamma2
                sd_nodes = []
                for xi, wi in zip(_GL_X, _GL_W):
                    cr = c0 + gamma2 * float(xi)
                    sd_nodes.append((float(wi), cr, cr * cr))
            for ci, fch in enumerate(freqs_np):
                d1sq = (fch - fl) ** 2
                d2sq = (fch + fl) ** 2
                if not (m1[ci] or m2[ci]):
                    continue
                a_c = b_c = 0.0          # trace-time far-half constants
                sres = None              # tensor part from near halves
                near_d = []              # detuning^2 of plain near halves
                if m1[ci]:
                    if sd_nodes is not None:
                        qsum = None
                        for wi, cr, cr2 in sd_nodes:
                            term = (wi * cr) / (cr2 + d1sq)
                            qsum = term if qsum is None else qsum + term
                        sres = s * qsum - sbase
                    elif wmax_sq < VERY_FAR_R * d1sq:
                        inv = 1.0 / d1sq
                        a_c += inv - inv_cut2
                        b_c += inv * inv - invc2_sq
                    else:
                        near_d.append(d1sq)
                if m2[ci]:
                    if wmax_sq < VERY_FAR_R * d2sq:
                        inv = 1.0 / d2sq
                        a_c += inv - inv_cut2
                        b_c += inv * inv - invc2_sq
                    else:
                        near_d.append(d2sq)
                if len(near_d) == 2:
                    # Both halves near-resonant (the 22-GHz line seen from
                    # the K band): share ONE hardware divide —
                    # sw/(w2+c1) + sw/(w2+c2) = sw(2w2+c1+c2)/((w2+c1)(w2+c2))
                    c1, c2 = near_d
                    t2 = (sw * (2.0 * wsq + (c1 + c2))) \
                        / ((wsq + c1) * (wsq + c2)) - 2.0 * sbase
                    sres = t2 if sres is None else sres + t2
                elif near_d:
                    t2 = sw / (wsq + near_d[0]) - sbase
                    sres = t2 if sres is None else sres + t2
                contrib = None
                if sres is not None:
                    contrib = inv_fl2 * sres
                if a_c or b_c:
                    far = sw * (inv_fl2 * a_c) - swsq * (inv_fl2 * b_c)
                    contrib = far if contrib is None else contrib + far
                acc_h2o[ci] = contrib if acc_h2o[ci] is None \
                    else acc_h2o[ci] + contrib
        h2o_scale = (0.3183e-4 * 3.344e16) * rho

        # H2O continuum base (per channel: * f^2)
        con_b = (h2o.cf * exp_logti(h2o.xcf) * pda
                 + h2o.cs * exp_logti(h2o.xcs) * pvap) * pvap

        # ---- O2: resonant lines + nonresonant Debye ------------------------
        b = exp_logti(o2.x)
        den = 0.001 * (pda * b + o2.h2o_factor * pvap * ti)
        dfnr = o2.wb300 * den
        dfnr2 = dfnr * dfnr
        dfnr_over_th = dfnr / ti
        ybase = 0.001 * p * b if o2.mixing_basis == "p" else den
        pe2 = den * den if o2_second else None

        # Pass 1 — per-line point tensors, hoisted over channels.  The four
        # strength-folded products A = s*dfg, B = s*yy, C = A*df^2,
        # E = B*df^2 are what both the far folds and the near numerators
        # are linear in, so four extra multiplies per LINE here remove
        # three multiplies per (line, channel) below.
        o2_lines = []
        for li in range(o2_f.size):
            df = float(o2_w300[li]) * den
            yy = ybase * (float(o2_y0[li]) + float(o2_y1[li]) * th1)
            # strength with the 1/f0^2 prefactor folded in
            strength = float(o2_s300[li] / o2_f[li] ** 2) \
                * exp_th1(-float(o2_be[li]))
            # Second-order mixing (R19+): G scales the width numerator once
            # per line (shared across channels); delta-nu shifts the line
            # center, which only matters for near-resonant pairs — at "very
            # far" distances (>= ~48 GHz) a <= 0.3 GHz shift changes an
            # already <= 2.5e-5-relative wing term by < 1 %.
            if o2_second and (o2_g0[li] or o2_g1[li]):
                dfg = df * (1.0 + pe2 * (float(o2_g0[li])
                                         + float(o2_g1[li]) * th1))
            else:
                dfg = df
            if o2_second and (o2_dnu0[li] or o2_dnu1[li]):
                dnu = pe2 * (float(o2_dnu0[li]) + float(o2_dnu1[li]) * th1)
            else:
                dnu = None
            dfsq = df * df
            a_l = strength * dfg
            b_l = strength * yy
            o2_lines.append((float(o2_f[li]), dfsq, a_l, b_l,
                             a_l * dfsq, b_l * dfsq, dnu,
                             float(o2_dfmax[li]) ** 2))

        # Pass 2 — per channel: far halves fold into 4 trace-time constants,
        # applied to the hoisted (A, B, C, E) stacks as FOUR fma per (line,
        # channel) — A*k1 + B*k2 - C*k3 - E*k4 is the 2-term series sum over
        # that line's far halves.  Near halves become (P, D) rationals with
        # P = A + d*B (one fma; d trace-time unless the line has a pressure
        # shift) and are merged through a DEPTH-2 tree across lines
        # (pairs, then pairs-of-pairs) so four near halves share ONE
        # hardware divide — the fp32 divide is the VPU's slowest primitive.
        # Depth 2 is the fp32 limit: denominators reach ~1e-4 GHz^2 at the
        # profile top, and an 8-way product (~1e-32) would underflow.
        acc_o2 = [None] * nf
        for ci, fch in enumerate(freqs_np):
            acc = None
            near = []                     # (P, D) near-half rationals
            for f0, dfsq, a_l, b_l, c_l, e_l, dnu, dfmax_sq in o2_lines:
                d1sq = (fch - f0) ** 2
                d2sq = (fch + f0) ** 2
                vf1 = dfmax_sq < VERY_FAR_R * d1sq
                vf2 = dfmax_sq < VERY_FAR_R * d2sq  # mirror: always far
                k1 = k2 = k3 = k4 = 0.0
                if vf1:
                    inv = 1.0 / d1sq
                    c1 = fch - f0
                    k1 += inv; k2 += c1 * inv
                    k3 += inv * inv; k4 += c1 * inv * inv
                elif dnu is not None:
                    # near-resonant with a pressure-shifted center: the
                    # detuning (and so the denominator) is tile-valued.
                    d1 = (fch - f0) - dnu
                    near.append((a_l + d1 * b_l, dfsq + d1 * d1))
                else:
                    near.append((a_l + (fch - f0) * b_l, dfsq + d1sq))
                if vf2:
                    inv = 1.0 / d2sq
                    c2 = -(fch + f0)
                    k1 += inv; k2 += c2 * inv
                    k3 += inv * inv; k4 += c2 * inv * inv
                else:
                    near.append((a_l - (fch + f0) * b_l, dfsq + d2sq))
                if k1 or k2:
                    far = (a_l * k1 + b_l * k2) - (c_l * k3 + e_l * k4)
                    acc = far if acc is None else acc + far
            pairs = []
            for j in range(0, len(near) - 1, 2):
                (pa, da), (pb, db) = near[j], near[j + 1]
                pairs.append((pa * db + pb * da, da * db))
            if len(near) % 2:
                pairs.append(near[-1])
            for j in range(0, len(pairs) - 1, 2):
                (pa, da), (pb, db) = pairs[j], pairs[j + 1]
                merged = (pa * db + pb * da) / (da * db)
                acc = merged if acc is None else acc + merged
            if len(pairs) % 2:
                pa, da = pairs[-1]
                acc = pa / da if acc is None else acc + pa / da
            acc_o2[ci] = acc
        o2_scale = o2.scale * pda * ti * ti * ti

        # ---- dry (N2/pressure-induced) continuum base ---------------------
        if model == "R98":
            n2_b = 6.4e-14 * pda * pda * exp_logti(3.55)
            n2_fdep = [1.0] * nf
        else:
            n2_b = 6.5e-14 * pda * pda * exp_logti(3.6)
            n2_fdep = [0.5 + 0.5 / (1.0 + (f / 450.0) ** 2) for f in freqs_np]

        # ---- ozone rotational lines (ARMS-gb parity) ----------------------
        acc_o3 = [None] * nf
        o3_den = None
        if with_o3:
            q = o3_ref[:]
            o3_den = 7.2429e12 * p * q / t
            for li in range(o3_fl.size):
                fl = float(o3_fl[li])
                width = float(o3_w3[li]) * p \
                    * exp_logti(float(o3_x[li]))
                wsq = width * width
                s = float(o3_s1[li]) * ti2 \
                    * exp_th1(-float(o3_b2[li]))
                sw = s * width
                inv_fl2 = 1.0 / (fl * fl)
                wmax_sq = float(o3_wmax[li]) ** 2
                for ci, fch in enumerate(freqs_np):
                    d1sq = (fch - fl) ** 2
                    d2sq = (fch + fl) ** 2
                    res = _lorentz_term(sw, wsq, d1sq,
                                        wmax_sq < VERY_FAR_R * d1sq) \
                        + _lorentz_term(sw, wsq, d2sq,
                                        wmax_sq < VERY_FAR_R * d2sq)
                    contrib = inv_fl2 * res
                    acc_o3[ci] = contrib if acc_o3[ci] is None \
                        else acc_o3[ci] + contrib

        # ---- cloud liquid (Liebe-Hufford-Manabe dielectric) ---------------
        # theta1 = 1 - 300/T = -th1, so the Debye relaxation exponential
        # joins the th1 memo family.
        eps0 = 77.66 + 103.3 * th1
        eps1 = 0.0671 * eps0
        eps2 = 3.52
        inv_fp = exp_th1(7.88) * (1.0 / 20.1)
        inv_fs = inv_fp * (1.0 / 39.8)
        d01 = eps0 - eps1
        w_scaled = -0.06286 * w

        # ---- per-channel assembly -----------------------------------------
        for ci, fch in enumerate(freqs_np):
            f2 = float(fch * fch)
            h2o_lines = (f2 * h2o_scale) * acc_h2o[ci] if acc_h2o[ci] is not None \
                else 0.0
            nonres = (o2.nonres_coeff * f2) * dfnr_over_th / (f2 + dfnr2)
            line_sum = acc_o2[ci] if acc_o2[ci] is not None else 0.0
            o2_alpha = _max0(o2_scale * (f2 * line_sum + nonres))

            # Debye terms share their reciprocals between Re and Im:
            # three divides per channel instead of five.
            u = fch * inv_fp
            vv = fch * inv_fs
            uu1 = 1.0 + u * u
            vv1 = 1.0 + vv * vv
            ra = d01 / uu1
            rb = (eps1 - eps2) / vv1
            re = eps2 + ra + rb
            im = -(ra * u + rb * vv)
            aimag = 3.0 * im / ((re + 2.0) ** 2 + im * im)
            liq = (fch * aimag) * w_scaled

            alpha_ci = (h2o_lines + f2 * con_b + o2_alpha
                        + (f2 * n2_fdep[ci]) * n2_b + liq)
            if with_o3 and acc_o3[ci] is not None:
                alpha_ci = alpha_ci + (0.3183e-4 * f2) * o3_den * acc_o3[ci]
            out_ref[ci] = _val(alpha_ci)
            if with_tangents:
                dt_ref[ci] = _tan(alpha_ci, "dt")
                dr_ref[ci] = _tan(alpha_ci, "dr")

    return kernel


@functools.partial(jax.jit, static_argnames=("freqs", "model"))
def total_absorption_fused(freqs: tuple, p_hpa, t_k, rho_gm3, lwc_gm3,
                           model: str = "R24", o3_ppmv=None):
    """Fused absorption: (N,) flattened level arrays -> (F, N) alpha [Np/km].

    freqs: static tuple of channel frequencies [GHz] (baked into the kernel).
    p/t/rho/lwc (and optional o3 ppmv): (N,) float32, N a multiple of
    BLOCK_ROWS*LANES (pad with any finite values and discard those columns).
    """
    n = p_hpa.shape[0]
    block = BLOCK_ROWS * LANES
    if n % block:
        raise ValueError(f"N={n} not a multiple of {block}")
    nf = len(freqs)
    m = n // LANES
    with_o3 = o3_ppmv is not None
    kernel = _build_kernel(model, tuple(freqs), with_o3=with_o3)
    grid = (m // BLOCK_ROWS,)
    tile = lambda a: a.reshape(m, LANES).astype(jnp.float32)
    in_spec = pl.BlockSpec((BLOCK_ROWS, LANES), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    inputs = [tile(p_hpa), tile(t_k), tile(rho_gm3), tile(lwc_gm3)]
    if with_o3:
        inputs.append(tile(o3_ppmv))
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[in_spec] * len(inputs),
        out_specs=pl.BlockSpec((nf, BLOCK_ROWS, LANES), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nf, m, LANES), jnp.float32),
        # On non-TPU backends (CPU test meshes) run the kernel interpreted so
        # the fast path stays exercisable everywhere.
        interpret=(jax.default_backend() != "tpu"),
    )(*inputs)
    return out.reshape(nf, n)


@functools.partial(jax.jit, static_argnames=("freqs", "model"))
def total_absorption_fused_tangents(freqs: tuple, p_hpa, t_k, rho_gm3,
                                    lwc_gm3, model: str = "R24"):
    """Fused absorption + elementwise partials: (N,) -> 3 x (F, N).

    One dual-number pass of the SAME kernel body returns
    (alpha, dalpha/dT, dalpha/drho) — the per-point setup (all the
    transcendentals) is computed once and shared by value and tangents
    inside VMEM, which is what makes the fast K-matrix cheap
    (models/jacobians.py::kmatrix_batch_fast).  d(alpha)/d(lwc) is analytic
    (Rayleigh absorption is linear in LWC) and d/dp is rarely requested;
    both are handled by the caller.
    """
    n = p_hpa.shape[0]
    block = BLOCK_ROWS * LANES
    if n % block:
        raise ValueError(f"N={n} not a multiple of {block}")
    nf = len(freqs)
    m = n // LANES
    kernel = _build_kernel(model, tuple(freqs), with_tangents=True)
    grid = (m // BLOCK_ROWS,)
    tile = lambda a: a.reshape(m, LANES).astype(jnp.float32)
    in_spec = pl.BlockSpec((BLOCK_ROWS, LANES), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((nf, BLOCK_ROWS, LANES), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((nf, m, LANES), jnp.float32)
    alpha, da_dt, da_dr = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[in_spec] * 4,
        out_specs=[out_spec] * 3,
        out_shape=[out_shape] * 3,
        interpret=(jax.default_backend() != "tpu"),
    )(tile(p_hpa), tile(t_k), tile(rho_gm3), tile(lwc_gm3))
    return (alpha.reshape(nf, n), da_dt.reshape(nf, n),
            da_dr.reshape(nf, n))


def absorption_lb_fused(freqs: tuple, p, t, rho, lwc,
                        model: str = "R24", o3=None) -> jax.Array:
    """(L, B) lanes-batch arrays -> (F, L, B) alpha via the fused kernel.

    B must be a multiple of 128 with L*B a multiple of BLOCK_ROWS*LANES, so
    that the (L, B) <-> (L*B,) <-> (F, L, B) reshapes are all tile-preserving
    (zero relayout cost — the whole point of this layout).
    """
    l, b = p.shape
    alpha = total_absorption_fused(
        tuple(freqs), p.reshape(-1), t.reshape(-1), rho.reshape(-1),
        lwc.reshape(-1), model,
        o3_ppmv=None if o3 is None else o3.reshape(-1))
    return alpha.reshape(len(freqs), l, b)


def absorption_batch_fused(freqs: tuple, profiles: dict,
                           model: str = "R24") -> jax.Array:
    """(B, L) profile dict -> (B, F, L) alpha via the fused kernel, padding
    the flattened axis up to a block multiple."""
    p = profiles["p"]
    b, l = p.shape
    n = b * l
    block = BLOCK_ROWS * LANES
    n_pad = -(-n // block) * block

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
