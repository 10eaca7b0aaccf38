"""Headline benchmark: TB spectra/s/chip on the 14-channel HATPRO slant-path LBL.

One "spectrum" = one (profile, elevation) pair -> 14 channel TBs with the R24
line-by-line model on 180 levels — exactly the unit of work of the
reference's hot loop (one `rte.execute()` call per time x crop x elevation,
/root/reference/python_src/proc/PyRTlib_processing.py:99-151).

Baseline: the reference's LBL path is sequential CPU PyRTlib, measured by its
author as "very slow" with the sibling mwrpy_sim LBL at ~602 s/profile
(SURVEY.md section 6).  PyRTlib itself runs ~1 spectrum/s/core on a
workstation CPU for this 14-channel configuration; we use 1.0 spectra/s as
the (favourable-to-the-reference) baseline denominator.

Methodology notes: every iteration gets a never-before-seen input
perturbation and fetches a computed element back to the host — the tunneled
device runtime memoizes repeated (executable, inputs) pairs and pipelines
independent dispatches, so naive same-input loops overstate throughput by
orders of magnitude.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import statistics
import time

import jax
import jax.numpy as jnp
import numpy as np

from mwr_fast_forward_operators_and_lbls_tpu.models import lbl

BASELINE_SPECTRA_PER_S = 1.0  # reference PyRTlib, sequential CPU


def main():
    batch = 1024
    n_elev = 10
    config = lbl.LBLConfig(model="R24")
    profiles = lbl.demo_batch(batch, n_levels=180)
    profiles = jax.device_put(profiles, jax.devices()[0])

    fwd = jax.jit(lambda p, eps: lbl.forward_batch(
        {**p, "t": p["t"] + eps}, config)["tb"])
    tb = fwd(profiles, jnp.float32(0.0))
    assert np.isfinite(np.asarray(tb)).all()

    ctr = 0
    rates = []
    for _trial in range(4):
        n_iters = 10
        t0 = time.perf_counter()
        for _ in range(n_iters):
            ctr += 1
            # fresh 0.1 mK-scale perturbation defeats result memoization;
            # the float() fetch forces the device to actually finish.
            float(fwd(profiles, jnp.float32(ctr) * 1e-4)[0, 0, 0])
        dt = time.perf_counter() - t0
        rates.append(batch * n_elev * n_iters / dt)
    rate = statistics.median(rates)  # drop warm-up outliers

    print(json.dumps({
        "metric": "tb_spectra_per_s_per_chip",
        "value": round(rate, 2),
        "unit": "spectra/s (profile x elevation -> 14ch TB, R24 LBL, 180 levels)",
        "vs_baseline": round(rate / BASELINE_SPECTRA_PER_S, 2),
    }))


if __name__ == "__main__":
    main()
