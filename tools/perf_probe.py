"""Measured per-stage decomposition of the headline LBL forward.

Splits the production forward (models/lbl.forward_batch, use_pallas=True)
into its device stages and times each with the tunnel-robust
`profiling.device_time` chain, against the analytic per-category bounds of
`profiling.lbl_roofline`.  This is the measurement behind the refined
(additive) pipeline model in `profiling.lbl_pipeline_model` — run it on the
target chip whenever the kernel or the model changes.

Usage: python tools/perf_probe.py [--batch 1024]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from mwr_fast_forward_operators_and_lbls_tpu.models import lbl
from mwr_fast_forward_operators_and_lbls_tpu.ops import geometry, thermo
from mwr_fast_forward_operators_and_lbls_tpu.ops.pallas.absorption_kernel import (
    absorption_lb_fused)
from mwr_fast_forward_operators_and_lbls_tpu.ops.pallas.rte_kernel import (
    forward_lb_fused)
from mwr_fast_forward_operators_and_lbls_tpu.parallel import profiling


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    args = ap.parse_args()
    b = args.batch
    config = lbl.LBLConfig(model="R24", use_pallas=True, outputs=("tb",))
    freqs = config.freqs_ghz
    elevs = config.elevations_deg
    profiles = jax.device_put(lbl.demo_batch(b, n_levels=180),
                              jax.devices()[0])

    # lanes-batch inputs as the production path lays them out
    zt = profiles["z"].T
    pt = profiles["p"].T
    tt = profiles["t"].T
    rt = profiles["rho"].T
    wt = profiles["lwc"].T

    t_full = profiling.device_time(
        lambda pr: lbl.forward_batch(pr, config), (profiles,),
        iters=40, trials=4)

    t_abs = profiling.device_time(
        lambda p_, t_, r_, w_: absorption_lb_fused(freqs, p_, t_, r_, w_,
                                                   "R24"),
        (pt, tt, rt, wt), iters=40, trials=4)

    alpha = absorption_lb_fused(freqs, pt, tt, rt, wt, "R24")
    e_hpa = thermo.rho_to_e(rt, tt)
    n = geometry.refractive_index(pt, tt, e_hpa)

    t_rte = profiling.device_time(
        lambda a_, z_, n_, t_: forward_lb_fused(freqs, elevs, a_, z_, n_, t_),
        (alpha, zt, n, tt), iters=40, trials=4)

    roof = profiling.lbl_roofline(b)
    peaks = profiling.DEFAULT_PEAKS
    spectra = b * len(elevs)

    # refined (measured) pipeline model: exact jaxpr counts x issue rates
    c_abs = profiling.count_pallas_ops(
        lambda p_, t_, r_, w_: absorption_lb_fused(freqs, p_, t_, r_, w_,
                                                   "R24"),
        pt, tt, rt, wt)
    c_rte = profiling.count_pallas_ops(
        lambda a_, z_, n_, t_: forward_lb_fused(freqs, elevs, a_, z_, n_, t_),
        alpha, zt, n, tt)
    m_abs = profiling.pipeline_model_time(c_abs, peaks)
    m_rte = profiling.pipeline_model_time(c_rte, peaks)

    out = {
        "batch": b,
        "platform": jax.devices()[0].platform,
        "device": str(jax.devices()[0]),
        "full_forward_ms": round(t_full * 1e3, 4),
        "absorption_kernel_ms": round(t_abs * 1e3, 4),
        "rte_kernel_ms": round(t_rte * 1e3, 4),
        # Stage times are separately-minimized measurements, so their sum
        # can exceed the full forward by the measurement jitter; the glue
        # residual is floored at 0 with the raw value kept for honesty.
        "glue_ms": round(max(t_full - t_abs - t_rte, 0.0) * 1e3, 4),
        "glue_ms_raw": round((t_full - t_abs - t_rte) * 1e3, 4),
        "spectra_per_s": round(spectra / t_full, 1),
        "strict_bound_ms": round(roof.time_bound_s(peaks) * 1e3, 4),
        "strict_frac": round(roof.time_bound_s(peaks) / t_full, 3),
        "category_bounds_ms": {
            "fma": round(roof.fma_ops / peaks["fma"] * 1e3, 4),
            "div": round(roof.div_ops / peaks["div"] * 1e3, 4),
            "exp": round(roof.exp_ops / peaks["exp"] * 1e3, 4),
            "hbm": round(roof.hbm_bytes / peaks["hbm"] * 1e3, 4),
        },
        "additive_bound_ms": round(
            (roof.fma_ops / peaks["fma"] + roof.div_ops / peaks["div"]
             + roof.exp_ops / peaks["exp"]) * 1e3, 4),
        "refined_model_abs_ms": round(m_abs * 1e3, 4),
        "refined_model_rte_ms": round(m_rte * 1e3, 4),
        "refined_frac_abs": round(m_abs / t_abs, 3),
        "refined_frac_rte": round(m_rte / t_rte, 3),
        "refined_frac_full": round((m_abs + m_rte) / t_full, 3),
        "counts_abs_per_pt": {k: round(v / (b * 180), 1)
                              for k, v in c_abs.items()},
        "counts_rte_per_pt": {k: round(v / (b * 180), 1)
                              for k, v in c_rte.items()},
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
