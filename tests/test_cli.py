"""CLI: the full preprocess -> distill -> forward -> evaluate chain through
the typed entry point (replacing the reference's run_all_procs.sh)."""

import json
import os

import numpy as np
import pytest

from mwr_fast_forward_operators_and_lbls_tpu.cli.main import main
from mwr_fast_forward_operators_and_lbls_tpu.data import netcdf, synthetic


@pytest.fixture(scope="module")
def raw(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli")
    for i, stamp in enumerate(("20240805_102936", "20240806_102936")):
        synthetic.write_sonde_nc_arms(str(root / f"{stamp}.nc"), seed=i)
        launch = np.datetime64(f"2024-08-0{5+i}T10:29:36")
        synthetic.write_mwr_l1(str(root / f"l1_{i}.nc"), launch, seed=i)
    return root


def test_cli_pipeline(raw, tmp_path):
    harm = str(tmp_path / "harmonized.nc")
    assert main(["preprocess", "--sondes", f"{raw}/2024*_*.nc",
                 "--campaign", "Vital", "--location", "Juelich",
                 "--mwr", f"joyhat={raw}/l1_*.nc",
                 "-o", harm]) == 0
    assert os.path.exists(harm)

    params = str(tmp_path / "fast_params.npz")
    assert main(["distill", "-i", harm, "-o", params]) == 0

    results = str(tmp_path / "results.nc")
    assert main(["forward", "-i", harm, "-o", results,
                 "--models", "R24", "--fast-params", params,
                 "--compat"]) == 0
    ds = netcdf.read(results)
    assert "TBs_LBL_R24" in ds
    assert "TBs_Fast" in ds
    assert "TBs_PyRTlib_R24" in ds     # compat alias
    assert np.isfinite(ds["TBs_LBL_R24"].data).all()

    outdir = str(tmp_path / "plots")
    analysis = str(tmp_path / "analysis.nc")
    assert main(["evaluate", "-i", results, "-o", analysis,
                 "--outdir", outdir]) == 0
    pngs = [f for f in os.listdir(outdir) if f.endswith(".png")]
    assert len(pngs) >= 5
    a = netcdf.read(analysis)
    assert "cloud_flag" in a
    assert any(n.startswith("Deviations_") for n in a.variables)


def test_cli_config(capsys):
    assert main(["config"]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["n_levels"] == 180
    assert out["models"] == ["R98", "R17", "R20", "R24"]


def test_cli_missing_sondes(tmp_path):
    assert main(["preprocess", "--sondes", f"{tmp_path}/nope*.nc",
                 "-o", str(tmp_path / "x.nc")]) == 1


@pytest.fixture(scope="module")
def chain(raw, tmp_path_factory):
    """One shared preprocess -> distill -> forward chain for the evaluate /
    retrieve / spectral tests (each used to rebuild its own copy, ~6 s of
    redundant compile+compute per test — VERDICT r3 Next #8)."""
    root = tmp_path_factory.mktemp("chain")
    harm = str(root / "h.nc")
    params = str(root / "p.npz")
    results = str(root / "r.nc")
    assert main(["preprocess", "--sondes", f"{raw}/2024*_*.nc",
                 "--campaign", "Vital", "--location", "Juelich",
                 "--mwr", f"joyhat={raw}/l1_*.nc", "-o", harm]) == 0
    assert main(["distill", "-i", harm, "-o", params]) == 0
    assert main(["forward", "-i", harm, "-o", results,
                 "--models", "R24,R98", "--fast-params", params]) == 0
    return {"harm": harm, "params": params, "results": results}


def test_cli_retrieve_and_spectral(chain, tmp_path):
    harm, params, results = (chain["harm"], chain["params"],
                             chain["results"])
    ret = str(tmp_path / "ret.nc")
    assert main(["retrieve", "-i", results, "-o", ret,
                 "--fast-params", params]) == 0
    ds = netcdf.read(ret)
    t = ds["Retrieved_T"].data
    valid = np.isfinite(t).all(axis=1)
    assert valid.any()
    assert (t[valid] > 150).all() and (t[valid] < 330).all()

    spec = str(tmp_path / "spec.nc")
    assert main(["spectral", "-i", harm, "-o", spec, "--n-freqs", "256",
                 "--f-min", "22.0", "--f-max", "32.0"]) == 0
    sd = netcdf.read(spec)
    assert sd["TB_spectrum"].data.shape[1] == 256
    assert np.isfinite(sd["TB_spectrum"].data).all()


def test_cli_run_all(raw, tmp_path):
    work = str(tmp_path / "work")
    assert main(["run-all", "--sondes", f"{raw}/2024*_*.nc",
                 "--campaign", "Vital", "--location", "Juelich",
                 "--mwr", f"joyhat={raw}/l1_*.nc",
                 "--workdir", work, "--models", "R24",
                 "--distill", "--compat"]) == 0
    for name in ("harmonized.nc", "results.nc", "analysis.nc",
                 "fast_params.npz", "stats.csv", "run_all.log"):
        assert os.path.exists(os.path.join(work, name)), name
    ds = netcdf.read(os.path.join(work, "results.nc"))
    assert "TBs_LBL_R24" in ds and "TBs_Fast" in ds
    assert "TBs_PyRTlib_R24" in ds       # compat alias
    pngs = [f for f in os.listdir(os.path.join(work, "plots"))
            if f.endswith(".png")]
    assert len(pngs) >= 5

    # stage-level resume: reuses harmonized.nc without the sonde files
    assert main(["run-all", "--sondes", f"{raw}/nonexistent*.nc",
                 "--workdir", work, "--models", "R24", "--resume"]) == 0


def test_cli_evaluate_stratified(chain, tmp_path):
    results = chain["results"]
    outdir = str(tmp_path / "figs")
    csv_path = str(tmp_path / "stats.csv")
    assert main(["evaluate", "-i", results, "--outdir", outdir,
                 "--sky", "all", "--start", "2024-08-01",
                 "--end", "2024-09-01", "--per-sonde", "1",
                 "--stats-csv", csv_path]) == 0
    assert os.path.exists(csv_path)
    assert os.path.isdir(os.path.join(outdir, "per_sonde"))


@pytest.mark.slow
def test_cli_evaluate_full_matrix(chain, tmp_path):
    """`evaluate --full` emits the reference's complete analysis matrix:
    campaign x location x seasonal-window x sky cells, each with the
    standard figure set + a per-elevation stats CSV, plus a manifest
    (multi_campaign_plots_and_ana.py:1047-1348)."""
    results = chain["results"]
    outdir = str(tmp_path / "matrix")
    assert main(["evaluate", "-i", results, "--outdir", outdir,
                 "--full"]) == 0
    with open(os.path.join(outdir, "manifest.json")) as fh:
        manifest = json.load(fh)
    cells = manifest["cells"]
    # the fixture launches are August -> the seasonal May/June-July windows
    # are empty cells; the full-record cells must exist for both the "all"
    # aggregate and the Vital/Juelich campaign-location pair
    assert "all/full/all" in cells
    assert "Vital_Juelich/full/all" in cells
    for label, cell in cells.items():
        assert cell["n_figures"] >= 1, label
        assert cell["stats_csv"], label
        assert os.path.exists(os.path.join(outdir, cell["stats_csv"]))
        for fig in cell["figures"]:
            assert os.path.exists(os.path.join(outdir, fig))
    # per-elevation stats rows: 10 elevations per deviation x channel
    import csv as _csv
    with open(os.path.join(
            outdir, cells["all/full/all"]["stats_csv"])) as fh:
        rows = list(_csv.DictReader(fh))
    elevs = {r["elevation_deg"] for r in rows}
    assert len(elevs) == 10
    assert manifest["n_figures_total"] >= 4 * len(cells) - 4


def test_campaign_demo_raw_generation(tmp_path):
    """tools/campaign_demo.py's synthetic archive drives the multi-campaign
    preprocess path (preprocess_campaigns = the reference's 5-glob __main__
    loop, preprocessing4all.py:1251-1401): 3 campaigns concat on time with
    Campaign/Location stamped per launch."""
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "tools"))
    import campaign_demo

    from mwr_fast_forward_operators_and_lbls_tpu.data import preprocess
    specs = campaign_demo.generate_raws(str(tmp_path / "raw"), 6)
    assert len(specs) == 3
    ds = preprocess.preprocess_campaigns(specs)
    assert ds.dims["time"] >= 5
    camps = {str(c) for c in np.asarray(ds["Campaign"].data).astype(str)}
    assert {"FESSTVaL", "Socles", "Vital-I"} <= camps
    # launches span May-July (the seasonal-window matrix is exercisable)
    t = np.asarray(ds["time"].data, "f8")
    import datetime as dt
    months = {dt.datetime.fromtimestamp(x, dt.timezone.utc).month
              for x in t}
    assert months & {5, 6} and months & {6, 7}


@pytest.mark.slow
def test_cli_compilation_cache(raw, tmp_path):
    """--cache-dir persists compiled executables across processes: a second
    identical distill run in a FRESH process hits the cache for every jit
    (slow-marked: two cold-interpreter subprocesses compiling the teacher
    graph cost ~60 s; CAMPAIGN_r04.md carries the same claim at campaign
    scale - distill 136 s cold -> 2.0 s warm)
    (no new cache entries) and skips compile time (VERDICT r3 Next #4; the
    reference's stage-rerun workflow, run_all_procs.sh:1-12)."""
    import subprocess
    import sys
    import time

    from mwr_fast_forward_operators_and_lbls_tpu.parallel import compile_cache

    harm = str(tmp_path / "harmonized.nc")
    assert main(["preprocess", "--sondes", f"{raw}/2024*_*.nc",
                 "-o", harm]) == 0
    cache = str(tmp_path / "jit_cache")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    # MWR_JAX_PLATFORM (the CLI's own knob) rather than JAX_PLATFORMS: the
    # harness's sitecustomize re-pins the platform to the tunneled device
    # after reading the environment, and a degraded tunnel once turned this
    # test's "CPU" subprocesses into 10-minute hangs.
    env["MWR_JAX_PLATFORM"] = "cpu"
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")

    def run_distill(out):
        t0 = time.perf_counter()
        r = subprocess.run(
            [sys.executable, "-m",
             "mwr_fast_forward_operators_and_lbls_tpu.cli.main",
             "--cache-dir", cache, "distill", "-i", harm, "-o", out],
            env=env, capture_output=True, text=True, timeout=1800)
        assert r.returncode == 0, r.stdout + r.stderr
        return time.perf_counter() - t0

    run_distill(str(tmp_path / "p1.npz"))
    n_cold = compile_cache.entry_count(cache)
    assert n_cold > 0, "first run wrote no cache entries"
    run_distill(str(tmp_path / "p2.npz"))
    n_warm = compile_cache.entry_count(cache)
    # every compilation of the second run hit the persistent cache (no new
    # entries written).  Deliberately NO wall-time assertion: under xdist
    # the sibling worker's load makes subprocess timing flaky; the campaign
    # artifact (CAMPAIGN_r04.md, distill 136 s cold -> 2.0 s warm) carries
    # the quantitative claim.
    assert n_warm == n_cold, (n_cold, n_warm)
