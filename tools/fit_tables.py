"""Refit global spectroscopy scale factors against an external golden file.

The vendored line tables (constants/{h2o,o2}_lines.py) are transcriptions of
the published Rosenkranz releases; where an upstream release carries retunes
that were never publicly tabulated, this tool closes the residual: given a
golden absorption file produced by an *external* LBL (same JSON schema as
tests/golden/absorption_<model>.json — freqs_ghz, conditions, alpha table in
Np/km), it fits multiplicative retune factors

    h2o_s1    water-vapor line intensities
    h2o_w3    water-vapor air-broadened widths
    h2o_cf    foreign continuum coefficient
    h2o_cs    self continuum coefficient
    o2_s      oxygen line intensities
    o2_w      oxygen widths
    o2_y      oxygen first-order mixing (y0)
    o2_y1     oxygen mixing temperature dependence (y1)
    o2_g      oxygen second-order intensity coupling (g0)
    o2_g1     oxygen coupling temperature dependence (g1)
    o2_dnu    oxygen second-order band shift (dnu0 and dnu1)

by Adam on the mean squared *log*-absorption error (log-space so window and
line-center points weigh equally).  Output is a JSON of fitted factors plus
before/after residuals; apply them by scaling the model dataclass (see
`apply_scales`) or by folding them into the tables.

The o2_y*/o2_g*/o2_dnu factors exist specifically to close the R20/R24
Makarov-2020 ECS mixing refit, which constants/o2_lines.py carries at the
2011-fit values pending an external golden (see MIXING_PROVENANCE there).
Constraining the temperature-dependence factors (o2_y1/o2_g1 — where the
2020 refit differs most from 2011) requires golden conditions at two or
more temperatures; with single-temperature goldens leave them at 1.

Usage:
    python tools/fit_tables.py --golden external.json --model R24 \
        [--steps 400] [--out fitted.json]

Referenced from constants/h2o_lines.py and constants/o2_lines.py.
"""

import argparse
import json
import pathlib
import sys
from dataclasses import replace

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from mwr_fast_forward_operators_and_lbls_tpu.constants.h2o_lines import (
    H2O_MODELS)
from mwr_fast_forward_operators_and_lbls_tpu.constants.o2_lines import (
    O2_MODELS)
from mwr_fast_forward_operators_and_lbls_tpu.ops.absorption import (
    h2o_absorption, n2_absorption, o2_absorption)

SCALE_NAMES = ("h2o_s1", "h2o_w3", "h2o_cf", "h2o_cs", "o2_s", "o2_w",
               "o2_y", "o2_y1", "o2_g", "o2_g1", "o2_dnu")


def apply_scales(model_name: str, scales: dict):
    """Return (H2OModel, O2Model) copies with the retune factors applied."""
    h = H2O_MODELS[model_name]
    o = O2_MODELS[model_name]
    h = replace(
        h,
        s1=h.s1 * scales.get("h2o_s1", 1.0),
        w3=h.w3 * scales.get("h2o_w3", 1.0),
        ws=h.ws * scales.get("h2o_w3", 1.0),
        cf=h.cf * scales.get("h2o_cf", 1.0),
        cs=h.cs * scales.get("h2o_cs", 1.0),
    )
    o = replace(
        o,
        s300=o.s300 * scales.get("o2_s", 1.0),
        w300=o.w300 * scales.get("o2_w", 1.0),
        y0=o.y0 * scales.get("o2_y", 1.0),
        y1=o.y1 * scales.get("o2_y1", 1.0),
        g0=o.g0 * scales.get("o2_g", 1.0),
        g1=o.g1 * scales.get("o2_g1", 1.0),
        dnu0=o.dnu0 * scales.get("o2_dnu", 1.0),
        dnu1=o.dnu1 * scales.get("o2_dnu", 1.0),
    )
    return h, o


def _alpha_with_scales(theta, model_name, f, p, t, rho):
    """Total absorption with log-scale retunes theta (len 6)."""
    s = {n: jnp.exp(th) for n, th in zip(SCALE_NAMES, theta)}
    hm, om = apply_scales(model_name, s)
    e = rho * t / 217.0
    return (h2o_absorption(f, p, t, rho, hm)
            + o2_absorption(f, p, t, rho, om)
            + n2_absorption(f, p - e, t, variant=model_name))


def fit(golden: dict, model_name: str, steps: int = 400,
        lr: float = 0.03) -> dict:
    f = jnp.asarray(golden["freqs_ghz"], jnp.float64)
    conds = golden["conditions"]
    targets, rows = [], []
    for (p, t, rho), want in zip(conds, golden["alpha"].values()):
        rows.append((jnp.float64(p), jnp.float64(t), jnp.float64(rho)))
        targets.append(jnp.asarray(want, jnp.float64))
    targets = jnp.stack(targets)

    def loss(theta):
        preds = jnp.stack([
            _alpha_with_scales(theta, model_name, f, p, t, rho)
            for (p, t, rho) in rows])
        return jnp.mean((jnp.log(preds + 1e-14)
                         - jnp.log(targets + 1e-14)) ** 2)

    grad = jax.jit(jax.value_and_grad(loss))
    theta = jnp.zeros(len(SCALE_NAMES), jnp.float64)
    m = v = jnp.zeros_like(theta)
    loss0 = None
    for i in range(steps):
        val, g = grad(theta)
        if loss0 is None:
            loss0 = float(val)
        m = 0.9 * m + 0.1 * g
        v = 0.999 * v + 0.001 * g * g
        mhat = m / (1 - 0.9 ** (i + 1))
        vhat = v / (1 - 0.999 ** (i + 1))
        theta = theta - lr * mhat / (jnp.sqrt(vhat) + 1e-9)
    final = float(grad(theta)[0])
    return {
        "model": model_name,
        "scales": {n: float(jnp.exp(th))
                   for n, th in zip(SCALE_NAMES, theta)},
        "rms_log_residual_before": float(np.sqrt(loss0)),
        "rms_log_residual_after": float(np.sqrt(final)),
    }


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--golden", required=True,
                    help="external golden absorption JSON")
    ap.add_argument("--model", default="R24")
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    jax.config.update("jax_enable_x64", True)
    golden = json.loads(pathlib.Path(args.golden).read_text())
    result = fit(golden, args.model, args.steps)
    text = json.dumps(result, indent=1)
    print(text)
    if args.out:
        pathlib.Path(args.out).write_text(text)


if __name__ == "__main__":
    main()
