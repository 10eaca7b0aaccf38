"""Profiling and roofline accounting for the forward operators.

The reference has no tracing/profiling at all — performance knowledge lives
in code comments ("Dieser Code ist sehr langsam",
/root/reference/python_src/proc/PyRTlib_processing.py:84; "Processing took
602.0 seconds", old_mwrpy_sim_wrapper/processing_via_mwrpy_sim_4zen.py:97).
This module provides the TPU-native replacements promised in SURVEY.md
section 5: `jax.profiler` trace capture and an analytic roofline model of
the LBL hot path so measured throughput can be judged against
speed-of-light.

Timing methodology: the device may sit behind a high-latency tunnel and the
runtime pipelines host dispatches, so per-call host timing measures the
network, not the chip.  `device_time` runs K iterations inside one device
program (`lax.fori_loop`, iterations serialized by a data dependency) and
subtracts a 1-iteration run of the same program, cancelling the fixed
dispatch + transfer cost.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/mwr_tpu_trace"):
    """Capture a jax.profiler trace (view with tensorboard/xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def device_time(fn, args, iters: int = 20, trials: int = 3) -> float:
    """Per-call device seconds of `fn(*args) -> pytree`, tunnel-robust.

    `fn` must be jit-compatible; every output element is consumed (summed
    into the loop carry) so dead-code elimination cannot drop work, and each
    iteration's inputs are perturbed by the carry so results cannot be
    memoized across iterations.
    """
    @jax.jit
    def step(a, acc):
        out = fn(*jax.tree.map(lambda x: x + acc * 1e-18, a))
        total = sum(jnp.sum(v) for v in jax.tree.leaves(out))
        return acc + total * 1e-20

    def chain(k):
        # K async dispatches serialized by the carried scalar; the device
        # executes them back-to-back while the host races ahead, so wall
        # time ~ fixed cost + K * device time.
        acc = jnp.float32(0.0)
        for _ in range(k):
            acc = step(args, acc)
        return float(acc)

    chain(1), chain(iters)  # compile + warm
    # Minimize the two measurements SEPARATELY before subtracting: the
    # tunnel adds one-sided latency noise, and min(t_many - t_one) pairs a
    # lucky long run with an unlucky short run, which can undershoot the
    # true device time by 2x.  min(t_many) - min(t_one) subtracts the two
    # cleanest runs instead.
    best_one = best_many = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter(); chain(1)
        best_one = min(best_one, time.perf_counter() - t0)
        t0 = time.perf_counter(); chain(iters)
        best_many = min(best_many, time.perf_counter() - t0)
    # The subtraction can go negative on sub-noise workloads; floor it.
    return max((best_many - best_one) / (iters - 1), 1e-9)


@dataclass(frozen=True)
class Roofline:
    """Analytic cost model of one LBL forward batch."""

    flops: float          # fp32 VPU flops (line math + RTE)
    transcendentals: float
    hbm_bytes: float      # unavoidable input/output traffic

    def time_bound_s(self, vpu_flops_s: float = 2.0e12,
                     hbm_bytes_s: float = 8.0e11,
                     transcendental_flop_eq: float = 8.0) -> float:
        """Lower-bound wall time: max of compute and memory bounds."""
        eff_flops = self.flops + self.transcendentals * transcendental_flop_eq
        return max(eff_flops / vpu_flops_s, self.hbm_bytes / hbm_bytes_s)


def spectral_roofline(n_points: int, n_freqs: int, n_h2o_lines: int = 15,
                      n_o2_lines: int = 49,
                      divide_flop_eq: float = 7.0) -> Roofline:
    """Work/traffic accounting of the spectral Pallas kernel
    (ops/pallas/spectral_kernel.py) — the 50k-grid BASELINE config 4.

    Unlike the channel kernel, every (point, frequency) pair must evaluate
    ALL lines with runtime cutoff masks (frequencies are data, so no static
    line pruning is possible), which is the structural reason the spectral
    path costs more per point than the channel path.  Per (point, freq,
    line): H2O ~19 flops + 1 divide (resonance+mirror share the divide, the
    Clough pedestal is a precomputed row); O2 ~19 flops + 1/2 divide (lines
    merged pairwise).  The fp32 VPU divide is the slowest primitive
    (`divide_flop_eq` ~ its cost in mul-adds).  All transcendentals live in
    the XLA-precomputed row table, amortized over frequencies — counted in
    HBM traffic, not kernel flops.
    """
    pairs = float(n_points) * n_freqs
    flops = pairs * (n_h2o_lines * (19.0 + divide_flop_eq)
                     + n_o2_lines * (19.0 + 0.5 * divide_flop_eq)
                     + 40.0)  # continua + cloud liquid tail
    n_rows = 3 * n_h2o_lines + 5 * n_o2_lines + 9
    hbm = (n_points * n_rows * 4.0     # row table (read once per row-tile)
           + pairs * 4.0)              # alpha out
    return Roofline(flops, 0.0, hbm)


def lbl_roofline(batch: int, n_levels: int = 180, n_channels: int = 14,
                 n_elevations: int = 10, n_h2o_lines: int = 15,
                 n_o2_lines: int = 40) -> Roofline:
    """Work/traffic accounting of the fused LBL forward.

    Per (profile, level) point: per-line shared quantities (widths,
    strengths; ~10 flops + ~3 exps for H2O, ~6 flops + 1 exp for O2) plus
    ~8-9 flops per (line, channel) pair that survives the Clough cutoff; the
    RTE adds ~12 flops + 2 exps per (channel, elevation, layer).
    """
    pts = batch * n_levels
    pairs = pts * n_channels * (n_h2o_lines + n_o2_lines)
    absorption_flops = pairs * 9.0 + pts * (n_h2o_lines * 10 + n_o2_lines * 6)
    absorption_trans = pts * (n_h2o_lines * 3 + n_o2_lines * 1 + 8)
    rte_pts = batch * n_elevations * n_channels * n_levels
    rte_flops = rte_pts * 12.0
    rte_trans = rte_pts * 2.0
    hbm = (
        pts * 5 * 4                                   # profile arrays in
        + pts * n_channels * 4 * 2                    # alpha out + re-read
        + batch * n_elevations * n_channels * 4 * 3   # tb/tau/tmr out
    )
    return Roofline(absorption_flops + rte_flops,
                    absorption_trans + rte_trans, float(hbm))
