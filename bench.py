"""Headline benchmark suite: every BASELINE.json config on one chip.

Headline metric (BASELINE configs 2/3): TB spectra/s/chip on the 14-channel
HATPRO slant-path LBL.  One "spectrum" = one (profile, elevation) pair ->
14 channel TBs with the R24 line-by-line model on 180 levels — exactly the
unit of work of the reference's hot loop (one `rte.execute()` call per
time x crop x elevation, /root/reference/python_src/proc/
PyRTlib_processing.py:99-151).

Baseline: the reference's LBL path is sequential CPU PyRTlib, measured by
its author as "very slow" with the sibling mwrpy_sim LBL at ~602 s/profile
(SURVEY.md section 6).  PyRTlib itself runs ~1 spectrum/s/core on a
workstation CPU for this 14-channel configuration; we use 1.0 spectra/s as
the (favourable-to-the-reference) baseline denominator.

The `extra` object carries the remaining BASELINE configs measured in the
same run:
  spectral_50k_Mfreqpoints_per_s   config 4: 50k-frequency monochromatic
                                   grid + SRF convolution (profile-freq
                                   points per second, millions)
  kmatrix_ms_per_batch             config 4: batched K-matrix (B=256, E=10,
                                   wrt t/rho/lwc) via the diagonal-adjoint
                                   path; also expressed as x-forward cost
  distill_step_ms                  config 5: one distillation train step
                                   (B=512 profiles, TB-space loss)
  fast_serving_ms_per_batch        fast operator, 1024 profiles x 10 elev
  forward_stage_frac               pipeline forward_stage throughput as a
                                   fraction of the raw kernel headline.
                                   NOTE: in this harness the chip sits
                                   behind a ~2 MB/s network tunnel, so this
                                   number is bound by the host->device
                                   upload of the profile data itself
                                   (~7 MB per 1000-launch campaign), not by
                                   the pipeline design — profiles are
                                   uploaded once per crop and sliced on
                                   device; on directly-attached TPU the
                                   same path is kernel-bound.

Methodology: the device sits behind a network tunnel whose ~30 ms round
trip dwarfs the compute, so `parallel/profiling.device_time` chains K
data-dependent dispatches, consumes every output element, and subtracts a
1-dispatch run to cancel fixed dispatch + transfer cost.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.
`--quick` skips the extras.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from mwr_fast_forward_operators_and_lbls_tpu.models import fast, lbl
from mwr_fast_forward_operators_and_lbls_tpu.models import jacobians
from mwr_fast_forward_operators_and_lbls_tpu.parallel import profiling

BASELINE_SPECTRA_PER_S = 1.0  # reference PyRTlib, sequential CPU


def bench_headline():
    batch, n_elev = 1024, 10
    config = lbl.LBLConfig(model="R24", use_pallas=True, outputs=("tb",))
    profiles = lbl.demo_batch(batch, n_levels=180)
    profiles = jax.device_put(profiles, jax.devices()[0])
    tb = lbl.forward_batch(profiles, config)["tb"]
    assert np.isfinite(np.asarray(tb)).all()
    per_call = profiling.device_time(
        lambda pr: lbl.forward_batch(pr, config), (profiles,),
        iters=40, trials=4)
    # fraction of the speed-of-light bound: analytic instruction counts
    # against the fixed v5e per-primitive peak basis (DEFAULT_PEAKS —
    # architectural numbers cross-checked once against a register-resident
    # chain microbench; VERDICT r2 Next #4)
    peaks = profiling.DEFAULT_PEAKS
    bound = profiling.lbl_roofline(batch).time_bound_s(peaks)

    # refined measured pipeline model (VERDICT r3 Next #1): EXACT
    # jaxpr-derived per-primitive counts of the two production kernels x
    # the same fixed issue-rate basis, additive over the shared VPU issue
    # port with the MXU concurrent.  refined_frac = model / measured.
    from mwr_fast_forward_operators_and_lbls_tpu.ops import (geometry,
                                                             thermo)
    from mwr_fast_forward_operators_and_lbls_tpu.ops.pallas import (
        absorption_kernel as ak, rte_kernel as rk)
    freqs = tuple(float(x) for x in np.asarray(config.freqs_ghz))
    elevs = tuple(float(x) for x in np.asarray(config.elevations_deg))
    pt, tt, rt, wt, zt = (profiles[k].T for k in ("p", "t", "rho", "lwc",
                                                  "z"))
    c_abs = profiling.count_pallas_ops(
        lambda *a: ak.absorption_lb_fused(freqs, *a, "R24"),
        pt, tt, rt, wt)
    alpha = jnp.zeros((len(freqs),) + tuple(pt.shape), jnp.float32)
    n_refr = geometry.refractive_index(pt, tt, thermo.rho_to_e(rt, tt))
    c_rte = profiling.count_pallas_ops(
        lambda a_, z_, n_, t_: rk.forward_lb_fused(freqs, elevs, a_, z_,
                                                   n_, t_),
        alpha, zt, n_refr, tt)
    model_s = (profiling.pipeline_model_time(c_abs, peaks)
               + profiling.pipeline_model_time(c_rte, peaks))
    return (batch * n_elev / per_call, per_call, bound / per_call,
            model_s / per_call, peaks)


def bench_spectral(peaks=None):
    """Config 4: 50k monochromatic frequencies + SRF, 32 profiles."""
    from mwr_fast_forward_operators_and_lbls_tpu.constants import hatpro
    from mwr_fast_forward_operators_and_lbls_tpu.models import spectral

    batch, nf = 32, 50_000
    profiles = jax.device_put(lbl.demo_batch(batch, n_levels=180),
                              jax.devices()[0])
    f = np.linspace(20.0, 64.0, nf).astype(np.float32)
    w = np.zeros((14, nf), np.float32)
    for c, (fc, bw) in enumerate(zip(hatpro.HATPRO_FREQS_GHZ,
                                     hatpro.nominal_bandwidth_ghz())):
        w[c] = np.exp(-0.5 * ((f - fc) / max(bw, 1e-3)) ** 2)

    def run(pr):
        out = spectral.forward_spectral(pr, f, (90.0,), "R24",
                                        freq_chunk=8192)
        return spectral.srf_convolve(out["tb"], jnp.asarray(w))

    tb_c = np.asarray(run(profiles))
    assert np.isfinite(tb_c).all()
    # Device rate from one resident 8192-frequency chunk (the Python chunk
    # loop adds one tunnel round trip per chunk, which is a property of the
    # test harness's network link, not of the chip).  The static f_range
    # promise matches what forward_spectral derives for this grid.
    fc = jnp.asarray(f[:8192])
    f_range = (20.0, 64.0)
    per_chunk = profiling.device_time(
        lambda pr: spectral._forward_chunk(pr, fc, (90.0,), "R24",
                                           f_range)[0],
        (profiles,), iters=10, trials=3)
    per_call = per_chunk * (nf / 8192)

    # roofline fraction of the absorption kernel itself (VERDICT r2 Next
    # #5), against the f_range-aware bound that mirrors the kernel's
    # static line pruning (round 5), PLUS the refined measured pipeline
    # model: exact jaxpr-derived counts x the fixed issue-rate basis
    # (VERDICT r4 Next #2).
    from mwr_fast_forward_operators_and_lbls_tpu.ops.pallas import (
        spectral_kernel)
    n_pts = batch * 180

    def abs_only(pr):
        return spectral_kernel.absorption_spectral(
            fc, pr["p"].reshape(-1), pr["t"].reshape(-1),
            pr["rho"].reshape(-1), pr["lwc"].reshape(-1), "R24", f_range)

    t_abs = profiling.device_time(abs_only, (profiles,), iters=10, trials=3)
    bound = profiling.spectral_roofline(
        n_pts, 8192, f_range=f_range).time_bound_s(peaks)
    c_spec = profiling.count_pallas_ops(abs_only, profiles)
    m_spec = profiling.pipeline_model_time(c_spec, peaks)
    decomp = {
        "abs_kernel_ms": round(t_abs * 1e3, 3),
        "chunk_ms": round(per_chunk * 1e3, 3),
        "rte_glue_frac_of_chunk": round(1.0 - t_abs / per_chunk, 3),
    }
    return (batch * nf / per_call, per_call, bound / t_abs,
            m_spec / t_abs, decomp)


def bench_kmatrix(forward_per_call):
    """Fast K-matrix at B=256 vs a DIRECTLY-MEASURED B=256 forward (the r3
    pro-rated denominator overstated the ratio, VERDICT r3 Weak #4), plus
    the stage decomposition demanded by VERDICT r3 Next #6: dual-tangent
    absorption kernel / closed-form RTE adjoint / geometry+assembly rest."""
    import numpy as np
    from mwr_fast_forward_operators_and_lbls_tpu.ops import geometry, thermo
    from mwr_fast_forward_operators_and_lbls_tpu.ops.pallas import (
        absorption_kernel as ak)

    batch = 256
    cfg = lbl.LBLConfig(model="R24")
    profiles = jax.device_put(lbl.demo_batch(batch, n_levels=180),
                              jax.devices()[0])
    per_call = profiling.device_time(
        lambda pr: jacobians.kmatrix_batch_fast(pr, cfg), (profiles,),
        iters=10, trials=4)
    fwd_cfg = lbl.LBLConfig(model="R24", use_pallas=True, outputs=("tb",))
    fwd_256 = profiling.device_time(
        lambda pr: lbl.forward_batch(pr, fwd_cfg), (profiles,),
        iters=40, trials=4)

    # stage 1: the dual-number absorption tangent kernel alone
    tT = profiles["t"].T
    n = tT.size
    block = ak.BLOCK_ROWS * ak.LANES
    n_pad = -(-n // block) * block

    def flat(a, fill):
        v = a.reshape(-1)
        if n_pad != n:
            v = jnp.concatenate([v, jnp.full(n_pad - n, fill, v.dtype)])
        return v

    freqs = tuple(float(x) for x in np.asarray(cfg.freqs_ghz))
    args_flat = (flat(profiles["p"].T, 500.0), flat(tT, 250.0),
                 flat(profiles["rho"].T, 0.1), flat(profiles["lwc"].T, 0.0))
    t_tan = profiling.device_time(
        lambda *a: ak.total_absorption_fused_tangents(freqs, *a, "R24"),
        args_flat, iters=10, trials=3)

    # stage 2: the fused adjoint+assembly kernel alone (one invocation per
    # variable; alpha and the geometry factors precomputed) — replaces the
    # r3 XLA closed-form adjoint that materialized ~12 (B, E, F, L)
    # intermediates in HBM and dominated the K-matrix
    from mwr_fast_forward_operators_and_lbls_tpu.constants import physics
    from mwr_fast_forward_operators_and_lbls_tpu.ops.pallas.adjoint_kernel \
        import kmatrix_assembled_lb

    alpha = ak.total_absorption_fused(freqs, *args_flat, "R24")
    n_levels = profiles["t"].shape[1]
    alpha_lb = alpha[:, :n].reshape(len(freqs), n_levels, batch)
    elevs = jnp.asarray(cfg.elevations_deg)
    tT = profiles["t"].T
    pT = profiles["p"].T
    rhoT = profiles["rho"].T
    zT = profiles["z"].T
    e_hpa = thermo.rho_to_e(rhoT, tT)
    ds = jax.vmap(lambda el: geometry.slant_path_lengths_lb(
        zT, pT, tT, e_hpa, el))(elevs)
    n_lev = geometry.refractive_index(pT, tT, e_hpa)
    dds_dnl, dds_dk = geometry.slant_path_sensitivities(
        zT.T[:, None], n_lev.T[:, None], elevs[None, :])
    dds_dnl = dds_dnl.transpose(1, 2, 0)
    dds_dk = dds_dk.transpose(1, 2, 0)
    r0cos = ((physics.EARTH_RADIUS + zT[0])[None, :]
             * jnp.cos(jnp.deg2rad(elevs))[:, None])
    dn_t = jnp.ones_like(tT) * 1e-6
    t_adj = profiling.device_time(
        lambda a, da: kmatrix_assembled_lb(
            freqs, "t", a, da, ds, tT, dds_dnl, dds_dk, dn_t, r0cos),
        (alpha_lb, alpha_lb), iters=10, trials=3)

    decomp = {
        "tangent_kernel_ms": round(t_tan * 1e3, 3),
        "adjoint_assembly_t_ms": round(t_adj * 1e3, 3),
        "note": "stages measured STANDALONE; inside the fused call they "
                "pipeline with the layout restores, so the sum of parts "
                "can differ from kmatrix_ms_per_batch256",
    }
    return per_call, per_call / fwd_256, decomp


def bench_distill_step():
    batch = 512
    cfg = fast.FastConfig()
    profiles = jax.device_put(lbl.demo_batch(batch, n_levels=180),
                              jax.devices()[0])
    targets = lbl.forward_batch(
        profiles, lbl.LBLConfig(model=cfg.teacher_model, use_pallas=True,
                                outputs=("tb",)))["tb"]
    params = fast.fit_closed_form(profiles, cfg)
    opt = fast._default_optimizer()
    opt_state = opt.init(params)

    def step(pr, tg):
        p2, _, loss = fast.train_step(params, opt_state, pr, tg, cfg, opt)
        return {"w": p2["w"], "loss": loss}

    per_call = profiling.device_time(step, (profiles, targets),
                                     iters=20, trials=3)
    return per_call


def bench_fast_serving():
    batch = 1024
    cfg = fast.FastConfig(use_lanes=True, outputs=("tb", "tau_total"))
    profiles = lbl.demo_batch(batch, n_levels=180)
    params = fast.fit_closed_form(
        {k: v[:64] for k, v in profiles.items()}, cfg)
    profiles = jax.device_put(profiles, jax.devices()[0])
    per_call = profiling.device_time(
        lambda pr: fast.fast_forward_batch(params, pr, cfg), (profiles,),
        iters=40, trials=4)
    return per_call


def bench_retrieval():
    """Config 5 second half: Gauss-Newton OEM retrieval on the fast
    operator's K-matrix (models/retrieval.py), batched."""
    from mwr_fast_forward_operators_and_lbls_tpu.models import retrieval

    batch, n_lev = 64, 180
    profiles = lbl.demo_batch(batch, n_levels=n_lev)
    cfg = fast.FastConfig()
    params = fast.fit_closed_form(
        {k: v[:32] for k, v in profiles.items()}, cfg)
    tb_obs = fast.fast_forward_batch(params, profiles, fast.FastConfig(
        outputs=("tb",)))["tb"]
    ocfg = retrieval.OEMConfig(n_iter=3)
    z, p = profiles["z"], profiles["p"]
    t_prior = profiles["t"] + 1.5
    rho_prior = profiles["rho"] * 0.8

    def run(tb):
        out = retrieval.retrieve_batch(params, tb, z, p, t_prior,
                                       rho_prior, ocfg)
        return {"t": out["t"], "rho": out["rho"]}

    per_call = profiling.device_time(run, (tb_obs,), iters=4, trials=3)
    return per_call / batch


def bench_forward_stage(headline_rate):
    """Pipeline throughput (host loop + NaN screening + layout restores)
    as a fraction of the raw kernel headline — VERDICT r1 item 5."""
    from mwr_fast_forward_operators_and_lbls_tpu.data.dataset import (
        Dataset, Variable)
    from mwr_fast_forward_operators_and_lbls_tpu.pipeline import (
        forward_stage)

    n_time, n_lev = N_STAGE_TIME, 180
    profs = lbl.demo_batch(n_time, n_levels=n_lev)
    ds = Dataset()
    flip = slice(None, None, -1)

    def lev_var(x):                       # (B, L) ground->top  ->  TOA->gnd
        a = np.asarray(x).T[flip]         # (L, B)
        return np.repeat(a[:, :, None], 2, axis=2).astype("f4")

    p = np.asarray(profs["p"])
    t = np.asarray(profs["t"])
    rho = np.asarray(profs["rho"])
    e = rho * t / 216.679
    mr = 1000.0 * 0.622 * e / np.maximum(p - e, 1e-3)
    air = p * 100.0 / (287.04 * t)
    liq = np.asarray(profs["lwc"]) / 1000.0 / air
    ds["Level_Pressure"] = Variable(("N_Levels", "time", "Crop"), lev_var(p))
    ds["Level_Temperature"] = Variable(("N_Levels", "time", "Crop"),
                                       lev_var(t))
    ds["Level_H2O"] = Variable(("N_Levels", "time", "Crop"), lev_var(mr))
    ds["Level_z"] = Variable(("N_Levels", "time", "Crop"),
                             lev_var(profs["z"]))
    ds["Level_Liquid"] = Variable(("N_Levels", "time", "Crop"), lev_var(liq))

    # warm the executables at the MEASURED shape so the measurement below is
    # steady-state pipeline throughput, not compile time (a smaller warm-up
    # slice compiles a different stage program and the measured wall becomes
    # one giant recompile — the r3/r4 "stage frac" collapse)
    forward_stage(ds, models=("R24",), batch_size=256, fused=True)

    t0 = time.perf_counter()
    forward_stage(ds, models=("R24",), batch_size=256, fused=True)
    wall = time.perf_counter() - t0

    # opt-in fp16-anomaly payload (halves link traffic; < 0.02 K measured,
    # tests/test_pipeline.py::test_compressed_upload_tb_budget)
    forward_stage(ds, models=("R24",), batch_size=256, fused=True,
                  compress_upload=True)            # warm the f16 program
    t0 = time.perf_counter()
    forward_stage(ds, models=("R24",), batch_size=256, fused=True,
                  compress_upload=True)
    wall_c = time.perf_counter() - t0

    # On-device time of the whole stage program (all chunks x model via
    # lax.map, one dispatch) — instrumented with the same chained
    # device_time methodology as the headline (VERDICT r2 Next #3), so it
    # is comparable to the summed kernel time for the same work.
    from mwr_fast_forward_operators_and_lbls_tpu.data import (
        preprocess as _pp)
    from mwr_fast_forward_operators_and_lbls_tpu.pipeline.forward import (
        _screen, _stage_device)
    raw0, _ = _screen(_pp.profiles_for_forward(ds, crop=0))
    dev = {k: jax.device_put(jnp.asarray(v)) for k, v in raw0.items()}
    stage_dev_s = profiling.device_time(
        lambda d: _stage_device(d, None, ("R24",), False, True, 256),
        (dev,), iters=12, trials=4)

    # Host->device upload cost of the same profile payload, measured
    # separately: over the test harness's network tunnel this is the
    # dominant term and is a property of the link, not the pipeline.
    raw = {k: np.ascontiguousarray(v)
           for k, v in _pp.profiles_for_forward(ds, crop=0).items()}
    t0 = time.perf_counter()
    for _ in range(2):                  # one upload per crop
        jax.block_until_ready(jax.device_put(
            {k: jnp.asarray(v + 0.0) for k, v in raw.items()}))
    upload = time.perf_counter() - t0

    spectra = n_time * 2 * 10           # time x crop x elevation
    rate = spectra / wall
    return (rate / headline_rate, rate, upload / wall, stage_dev_s,
            wall, wall_c, upload)


N_STAGE_TIME = 1000


def main():
    quick = "--quick" in sys.argv
    rate, fwd_per_call, roofline_frac, refined_frac, peaks = bench_headline()
    result = {
        "metric": "tb_spectra_per_s_per_chip",
        "value": round(rate, 2),
        "unit": "spectra/s (profile x elevation -> 14ch TB, R24 LBL, "
                "180 levels)",
        "vs_baseline": round(rate / BASELINE_SPECTRA_PER_S, 2),
    }
    if not quick:
        extra = {}
        # measured fraction of the analytic roofline bound (strict) and of
        # the refined measured pipeline model (exact jaxpr counts x issue
        # rates; >= 0.85 means the kernels run at the issue-model limit)
        extra["lbl_roofline_frac"] = round(roofline_frac, 3)
        extra["lbl_refined_model_frac"] = round(refined_frac, 3)
        sp_rate, _, sp_roof, sp_refined, sp_decomp = bench_spectral(peaks)
        extra["spectral_50k_Mfreqpoints_per_s"] = round(sp_rate / 1e6, 2)
        extra["spectral_roofline_frac"] = round(sp_roof, 3)
        extra["spectral_refined_model_frac"] = round(sp_refined, 3)
        extra["spectral_decomp_ms"] = sp_decomp
        k_ms, k_x, k_decomp = bench_kmatrix(fwd_per_call)
        extra["kmatrix_ms_per_batch256"] = round(k_ms * 1e3, 2)
        extra["kmatrix_x_forward"] = round(k_x, 2)
        extra["kmatrix_decomp_ms"] = k_decomp
        extra["distill_step_ms"] = round(bench_distill_step() * 1e3, 3)
        extra["fast_serving_ms_per_batch1024"] = round(
            bench_fast_serving() * 1e3, 3)
        extra["oem_retrieval_ms_per_profile"] = round(
            bench_retrieval() * 1e3, 3)
        (frac, stage_rate, upload_frac, stage_dev_s, wall, wall_c,
         upload) = bench_forward_stage(rate)
        extra["forward_stage_spectra_per_s"] = round(stage_rate, 1)
        extra["forward_stage_frac_of_kernel"] = round(frac, 4)
        # fraction of the stage wall the (link-dependent) host->device
        # upload WOULD cost serialized, measured separately; since r5 the
        # uploads are dispatched async for both crops before either pull,
        # so the wall approaches max(upload, compute) instead of their sum
        extra["forward_stage_upload_frac_of_wall"] = round(upload_frac, 3)
        extra["forward_stage_wall_s"] = round(wall, 3)
        # opt-in fp16-anomaly payload: halves link bytes (< 0.02 K TB cost,
        # gated in tests/test_pipeline.py)
        extra["forward_stage_wall_s_f16payload"] = round(wall_c, 3)
        # on-device time of the single-dispatch stage program (crop 0,
        # 1000 launches x 10 elevations, R24) vs the summed kernel time
        # for the same 10k spectra
        extra["forward_stage_device_ms"] = round(stage_dev_s * 1e3, 2)
        extra["forward_stage_device_x_kernel"] = round(
            stage_dev_s / (N_STAGE_TIME * 10 / rate), 2)
        result["extra"] = extra
    print(json.dumps(result))


if __name__ == "__main__":
    main()
