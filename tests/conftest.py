"""Test harness configuration.

The test suite runs on CPU with 8 virtual devices so multi-chip sharding is
exercised without TPU hardware (the standard
`--xla_force_host_platform_device_count` fake-multi-device backend — SURVEY.md
section 4).  The container's sitecustomize pre-imports jax bound to the
tunneled `axon` TPU platform, where *eager* dispatch round-trips the network
per op; `jax.config.update` below re-targets the (not yet initialized)
backend to CPU before any array is created.
"""

import os

import jax
import numpy as np
import pytest

# MWR_TPU_TESTS=1 leaves the real (tunneled) backend in place so the
# on-chip gates (e.g. test_fused_vs_xla_tb_on_chip) exercise actual Mosaic
# lowering — everything else about the suite is identical.
if not os.environ.get("MWR_TPU_TESTS"):
    jax.config.update("jax_platforms", "cpu")

# Persistent XLA compilation cache for the suite: the two xdist workers
# otherwise compile every shared jit program TWICE per run, and repeat
# runs recompile everything — the dominant cost of this CPU-bound suite.
# Lives in /tmp (host-local scratch; safe to delete any time), shared
# across workers and across runs.  Disable with MWR_NO_TEST_CACHE=1.
if not os.environ.get("MWR_NO_TEST_CACHE"):
    _cache = os.environ.get("MWR_TEST_CACHE_DIR", "/tmp/mwr_jax_test_cache")
    try:
        os.makedirs(_cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", _cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()


def pytest_collection_modifyitems(config, items):
    """Skip `slow`-marked tests by default (VERDICT r2 Weak #8: keep the
    inner-loop suite under ~5 min).  MWR_RUN_SLOW=1 or `-m slow` runs them;
    CI/pre-commit for physics changes should use MWR_RUN_SLOW=1."""
    if os.environ.get("MWR_RUN_SLOW"):
        return
    if "slow" in (config.getoption("-m") or ""):
        return
    skip = pytest.mark.skip(
        reason="slow sweep; set MWR_RUN_SLOW=1 (or -m slow) to run")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def demo_batch():
    from mwr_fast_forward_operators_and_lbls_tpu.models import lbl

    # 96 levels span the same 0-25 km column at half the
    # interpret-mode cost; production-geometry (180-level)
    # parity is covered by the golden gates, the dryrun and
    # the on-chip tests
    return lbl.demo_batch(4, n_levels=96)


@pytest.fixture(scope="session")
def demo_profile_np():
    from mwr_fast_forward_operators_and_lbls_tpu.models import lbl

    return {k: np.asarray(v) for k, v in lbl.demo_profile(64).items()}
