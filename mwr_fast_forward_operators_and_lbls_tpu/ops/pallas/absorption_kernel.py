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

# A (line, channel) pair whose worst-case width^2/distance^2 ratio is below
# this threshold evaluates its Lorentzian through a 2-term geometric series
# (truncation <= 2.5e-5 relative of that already-small wing term) instead of
# a hardware add + divide; see the "very far" discussion in _build_kernel.
VERY_FAR_R = 5e-3


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


@functools.lru_cache(maxsize=None)
def _fold_matrix(model: str, freqs: tuple) -> np.ndarray:
    """Trace-time coefficient matrix of the MXU far-fold contraction.

    Rows 0..nf-1 hold each channel's O2 far-half series constants over the
    per-line (A, B, C, E) stacks; rows nf..2nf-1 the H2O constants over the
    (sw, sw*w^2) stacks.  Mirrors the near/far classification inside
    `_build_kernel` exactly (same tables, same float comparisons) — the
    kernel builder asserts its in-body reconstruction matches this matrix,
    so the two cannot drift silently.  Returned shape: (2*nf, n_stack).
    """
    freqs_np = np.asarray(freqs, np.float64)
    nf = freqs_np.size
    h2o = H2O_MODELS[model]
    o2 = O2_MODELS[model]
    cut = float(h2o.cutoff_ghz)
    cut2 = cut * cut
    inv_cut2 = 1.0 / cut2
    invc2_sq = inv_cut2 * inv_cut2
    h2o_fl = np.asarray(h2o.fl, np.float64)
    h2o_w3 = np.asarray(h2o.w3, np.float64)
    h2o_x = np.asarray(h2o.x, np.float64)
    h2o_ws = np.asarray(h2o.ws, np.float64)
    h2o_xs = np.asarray(h2o.xs, np.float64)
    h2o_w2 = np.asarray(h2o.w2, np.float64)
    h2o_ws2 = np.asarray(h2o.ws2, np.float64)
    h2o_wmax = h2o_w3 * 1100.0 * (300.0 / 170.0) ** np.maximum(h2o_x, 0) \
        + h2o_ws * 120.0 * (300.0 / 170.0) ** np.maximum(h2o_xs, 0)
    o2_f = np.asarray(o2.f, np.float64)
    o2_dfmax = np.asarray(o2.w300, np.float64) * 2.0

    n_out = 2 * nf
    kcols = []
    for li in range(h2o_fl.size):
        fl = float(h2o_fl[li])
        m1 = [abs(f - fl) < cut for f in freqs_np]
        m2 = [abs(f + fl) < cut for f in freqs_np]
        if not (any(m1) or any(m2)):
            continue
        sd_line = float(h2o_w2[li]) != 0.0 or float(h2o_ws2[li]) != 0.0
        wmax_sq = float(h2o_wmax[li]) ** 2
        inv_fl2 = 1.0 / (fl * fl)
        col_sw = col_swsq = None
        for ci, fch in enumerate(freqs_np):
            d1sq = (fch - fl) ** 2
            d2sq = (fch + fl) ** 2
            if not (m1[ci] or m2[ci]):
                continue
            a_c = b_c = 0.0
            if m1[ci] and not sd_line and wmax_sq < VERY_FAR_R * d1sq:
                inv = 1.0 / d1sq
                a_c += inv - inv_cut2
                b_c += inv * inv - invc2_sq
            if m2[ci] and wmax_sq < VERY_FAR_R * d2sq:
                inv = 1.0 / d2sq
                a_c += inv - inv_cut2
                b_c += inv * inv - invc2_sq
            if a_c or b_c:
                if col_sw is None:
                    col_sw = np.zeros(n_out)
                    col_swsq = np.zeros(n_out)
                    kcols.append(col_sw)
                    kcols.append(col_swsq)
                col_sw[nf + ci] += inv_fl2 * a_c
                col_swsq[nf + ci] -= inv_fl2 * b_c
    for li in range(o2_f.size):
        f0 = float(o2_f[li])
        dfmax_sq = float(o2_dfmax[li]) ** 2
        cols = [np.zeros(n_out) for _ in range(2)]
        kcols.extend(cols)
        col_a, col_c = cols
        for ci, fch in enumerate(freqs_np):
            d1sq = (fch - f0) ** 2
            d2sq = (fch + f0) ** 2
            if dfmax_sq < VERY_FAR_R * d1sq:
                inv = 1.0 / d1sq
                col_a[ci] += inv
                col_c[ci] -= inv * inv
            if dfmax_sq < VERY_FAR_R * d2sq:
                inv = 1.0 / d2sq
                col_a[ci] += inv
                col_c[ci] -= inv * inv
    return np.stack(kcols, axis=1)


def _fold_k8(model: str, freqs: tuple):
    """The fold matrix expanded for the sublane-concat MXU layout.

    Stack tiles concatenate along SUBLANES into a (n_stack*8, 128) matrix —
    the natural VMEM layout, zero relayout — so the coefficient matrix is
    kron(K, I_8): out[8r+s] = sum_l K[r,l] * X[8l+s].  The 8x zero padding
    wastes MXU MACs, which are ~3 orders of magnitude cheaper than the VPU
    ops this contraction replaces.

    Precision (measured on this chip, round 5): the fold runs as ONE
    bf16 MXU pass — Mosaic rounds both operands to 8-bit mantissas, so
    each folded far-wing term carries ~5e-4 relative error, NOT fp32.
    That is the deliberate speed/accuracy point: the folded terms are
    far-wing corrections (a few % of total alpha at most), the end-to-end
    TB impact is gated on the real chip at < 0.05 K — BASELINE.md's TB
    budget; measured 0.036 K worst-case on v5e
    (tests/test_absorption.py::test_fused_vs_xla_tb_on_chip) — and
    every exact alternative measured is slower — precision=HIGHEST fp32
    dot 2.5x end-to-end, a 3-pass trace-time-split bf16 hi+lo product
    1.6x (the extra passes + the runtime hi/lo split of the tile stack
    don't pipeline behind the VPU body).  The V-band y-mixing terms,
    whose sum-rule cancellation bf16 rounding WOULD corrupt (~0.04 K
    measured), deliberately stay on the VPU in exact fp32
    (see the pass-2 comment in `_build_kernel`)."""
    k8 = np.kron(_fold_matrix(model, tuple(freqs)),
                 np.eye(BLOCK_ROWS, dtype=np.float64))
    return jnp.asarray(k8, jnp.float32)


def _stack_matmul(kmat_ref, tiles: list):
    """Contract the fold matrix with the stack of per-line tiles on the
    MXU: out[r] = sum_j kmat[r, j] * tiles[j].

    The far-half series folds are LINEAR in the hoisted per-line point
    tensors (O2: A, C; H2O: sw, sw*w^2) with trace-time-constant
    coefficients, i.e. a (rows, stack) x (stack, points) matrix product —
    the one place in the line-by-line math the MXU can eat, and it runs
    concurrently with the VPU's near-resonant rationals.  The product is
    ONE bf16 MXU pass; see `_fold_k8` for the measured precision budget
    and why the exact (hi/lo split or precision=HIGHEST) alternatives
    were measured and rejected.  Dual-number tiles run the same
    contraction per tangent slot.

    Returns a list of per-row (tile-shaped) outputs, dual iff any input is.
    """
    k8 = kmat_ref[:]
    any_dual = any(isinstance(t, _D) for t in tiles)
    zero = None
    rows = tiles and _val(tiles[0]).shape[0]

    def mm(slot):
        nonlocal zero
        vals = []
        for t in tiles:
            v = getattr(t, slot) if isinstance(t, _D) else (
                t if slot == "v" else 0.0)
            if isinstance(v, float):          # symbolic zero tangent
                if zero is None:
                    zero = jnp.zeros_like(_val(tiles[0]))
                v = zero
            vals.append(v)
        x = jnp.concatenate(vals, axis=0)     # (n_stack*8, 128), no relayout
        return jnp.dot(k8, x, preferred_element_type=jnp.float32)

    n_out = k8.shape[0] // rows
    out_v = mm("v")
    if not any_dual:
        return [out_v[r * rows:(r + 1) * rows] for r in range(n_out)]
    out_dt = mm("dt")
    out_dr = mm("dr")
    return [_D(out_v[r * rows:(r + 1) * rows],
               out_dt[r * rows:(r + 1) * rows],
               out_dr[r * rows:(r + 1) * rows]) for r in range(n_out)]


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

    def _lorentz_term(num, var_sq, d_sq: float, very_far: bool):
        """num / (var_sq + d_sq) with d_sq a trace-time constant."""
        if very_far:
            inv = 1.0 / d_sq
            return (num * inv) * (1.0 - var_sq * inv)
        return num / (var_sq + d_sq)

    def kernel(p_ref, t_ref, rho_ref, lwc_ref, kmat_ref, *rest):
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
        # MXU far-fold accumulator (see _stack_matmul): hoisted per-line
        # tiles plus one trace-time coefficient column each; output rows
        # 0..nf-1 are the O2 far sums, nf..2nf-1 the H2O far sums.
        stack_tiles, kcols = [], []
        n_out = 2 * nf
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
            col_sw = col_swsq = None     # lazy fold columns for this line
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
                        # Merge the 16 quadrature rationals through a
                        # depth-2 tree (pairs, then pairs-of-pairs) so four
                        # nodes share ONE hardware divide — same trick as
                        # the O2 near-half merge below.  Denominators are
                        # bounded below by the trace-time d1sq (>= 2.5e-5
                        # GHz^2 for the closest channel/line pair), so the
                        # 4-way product stays far above fp32 underflow.
                        terms = [(wi * cr, cr2 + d1sq)
                                 for wi, cr, cr2 in sd_nodes]
                        for _ in range(2):
                            merged = []
                            for j in range(0, len(terms) - 1, 2):
                                (pa, da), (pb, db) = terms[j], terms[j + 1]
                                merged.append((pa * db + pb * da, da * db))
                            if len(terms) % 2:
                                merged.append(terms[-1])
                            terms = merged
                        qsum = None
                        for pj, dj in terms:
                            term = pj / dj
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
                if a_c or b_c:
                    # far halves ride the MXU fold: sw*(inv_fl2*a_c)
                    # - swsq*(inv_fl2*b_c) becomes two kmat coefficients
                    if col_sw is None:
                        col_sw = np.zeros(n_out)
                        col_swsq = np.zeros(n_out)
                        stack_tiles.append(sw)
                        kcols.append(col_sw)
                        stack_tiles.append(swsq)
                        kcols.append(col_swsq)
                    col_sw[nf + ci] += inv_fl2 * a_c
                    col_swsq[nf + ci] -= inv_fl2 * b_c
                if sres is not None:
                    contrib = inv_fl2 * sres
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
            cols = [np.zeros(n_out) for _ in range(2)]
            for col, tile in zip(cols, (a_l, a_l * dfsq)):
                stack_tiles.append(tile)
                kcols.append(col)
            o2_lines.append((float(o2_f[li]), dfsq, a_l, b_l,
                             b_l * dfsq, dnu,
                             float(o2_dfmax[li]) ** 2, cols))

        # Pass 2 — per channel: far halves fold into 4 trace-time constants
        # on the hoisted (A, B, C, E) stacks — A*k1 + B*k2 - C*k3 - E*k4 is
        # the 2-term series sum over that line's far halves, accumulated
        # into the MXU fold matrix (zero VPU instructions).  Near halves
        # become (P, D) rationals with P = A + d*B (one fma; d trace-time
        # unless the line has a pressure shift) and are merged through a
        # DEPTH-2 tree across lines (pairs, then pairs-of-pairs) so four
        # near halves share ONE hardware divide — the fp32 divide is the
        # VPU's slowest primitive.  Depth 2 is the fp32 limit: denominators
        # reach ~1e-4 GHz^2 at the profile top, and an 8-way product
        # (~1e-32) would underflow.
        acc_o2 = [None] * nf
        for ci, fch in enumerate(freqs_np):
            acc = None
            near = []                     # (P, D) near-half rationals
            for f0, dfsq, a_l, b_l, e_l, dnu, dfmax_sq, cols in o2_lines:
                col_a, col_c = cols
                d1sq = (fch - f0) ** 2
                d2sq = (fch + f0) ** 2
                vf1 = dfmax_sq < VERY_FAR_R * d1sq
                vf2 = dfmax_sq < VERY_FAR_R * d2sq  # mirror: always far
                k2 = k4 = 0.0
                if vf1:
                    inv = 1.0 / d1sq
                    c1 = fch - f0
                    col_a[ci] += inv; col_c[ci] -= inv * inv
                    k2 += c1 * inv; k4 += c1 * inv * inv
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
                    col_a[ci] += inv; col_c[ci] -= inv * inv
                    k2 += c2 * inv; k4 += c2 * inv * inv
                else:
                    near.append((a_l - (fch + f0) * b_l, dfsq + d2sq))
                if k2 or k4:
                    # y-mixing far terms stay on the VPU: the V-band mixing
                    # sum rule makes them cancel across lines, which bf16
                    # MXU rounding would amplify (~0.04 K measured); two
                    # exact fma per (line, channel) instead
                    mix = b_l * k2 - e_l * k4
                    acc = mix if acc is None else acc + mix
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

        # ---- evaluate ALL far folds in one MXU contraction ----------------
        if stack_tiles:
            # the in-body coefficient reconstruction must match the
            # precomputed fold matrix the wrapper passed in (trace-time
            # check; guards _fold_matrix against drifting from this body)
            assert np.allclose(np.stack(kcols, axis=1),
                               _fold_matrix(model, tuple(freqs)),
                               rtol=0, atol=0), "fold-matrix drift"
            fold = _stack_matmul(kmat_ref, stack_tiles)
            for ci in range(nf):
                fo = fold[ci]
                acc_o2[ci] = fo if acc_o2[ci] is None else acc_o2[ci] + fo
                fh = fold[nf + ci]
                acc_h2o[ci] = fh if acc_h2o[ci] is None \
                    else acc_h2o[ci] + fh

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
    k8 = _fold_k8(model, tuple(freqs))
    kmat_spec = pl.BlockSpec(k8.shape, lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
    inputs = [tile(p_hpa), tile(t_k), tile(rho_gm3), tile(lwc_gm3), k8]
    in_specs = [in_spec] * 4 + [kmat_spec]
    if with_o3:
        inputs.append(tile(o3_ppmv))
        in_specs.append(in_spec)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
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
    k8 = _fold_k8(model, tuple(freqs))
    kmat_spec = pl.BlockSpec(k8.shape, lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
    alpha, da_dt, da_dr = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[in_spec] * 4 + [kmat_spec],
        out_specs=[out_spec] * 3,
        out_shape=[out_shape] * 3,
        interpret=(jax.default_backend() != "tpu"),
    )(tile(p_hpa), tile(t_k), tile(rho_gm3), tile(lwc_gm3), k8)
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
