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

Methodology: the device is reached through a network tunnel whose ~30 ms
round trip dwarfs the compute, and the runtime pipelines/memoizes host-side
dispatches — so naive per-call host timing is meaningless.  We chain K
dispatches whose inputs depend on the previous output (so the device must
execute them back-to-back and nothing can be memoized), consume every output
element (so dead-code elimination cannot drop work), and subtract a
1-dispatch run to cancel the fixed dispatch + transfer cost — see
`parallel/profiling.device_time`.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json

import jax
import numpy as np

from mwr_fast_forward_operators_and_lbls_tpu.models import lbl
from mwr_fast_forward_operators_and_lbls_tpu.parallel import profiling

BASELINE_SPECTRA_PER_S = 1.0  # reference PyRTlib, sequential CPU


def main():
    batch = 1024
    n_elev = 10
    config = lbl.LBLConfig(model="R24", use_pallas=True, outputs=("tb",))
    profiles = lbl.demo_batch(batch, n_levels=180)
    profiles = jax.device_put(profiles, jax.devices()[0])

    tb = lbl.forward_batch(profiles, config)["tb"]
    assert np.isfinite(np.asarray(tb)).all()

    per_call = profiling.device_time(
        lambda pr: lbl.forward_batch(pr, config), (profiles,),
        iters=40, trials=4)
    rate = batch * n_elev / per_call

    print(json.dumps({
        "metric": "tb_spectra_per_s_per_chip",
        "value": round(rate, 2),
        "unit": "spectra/s (profile x elevation -> 14ch TB, R24 LBL, 180 levels)",
        "vs_baseline": round(rate / BASELINE_SPECTRA_PER_S, 2),
    }))


if __name__ == "__main__":
    main()
