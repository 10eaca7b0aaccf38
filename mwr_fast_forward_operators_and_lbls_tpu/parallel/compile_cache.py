"""Persistent JAX compilation cache.

Every CLI invocation is a fresh process, so without a persistent cache each
`run-all` / `distill` / `forward` pays every `jit` first-compile again — on a
tunneled device those compiles ship through the network and dominated the
round-3 campaign's 624 s distill stage (CAMPAIGN_r03.md).  The reference's
own workflow re-runs individual stages constantly
(/root/reference/run_all_procs.sh:1-12), so warm-start compile time is a
first-class cost.

`enable(path)` points XLA's persistent compilation cache at `path` with
thresholds lowered so every executable is cached (the defaults skip
fast-compiling programs, which is most of this framework's host-side test
shapes).  Safe to call multiple times; later calls win.
"""

from __future__ import annotations

import os

import jax


def enable(path: str) -> str:
    """Enable the persistent compilation cache rooted at `path`."""
    path = os.path.abspath(os.path.expanduser(path))
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    return path


def entry_count(path: str) -> int:
    """Number of cached executables under `path` (0 if absent)."""
    try:
        return sum(1 for n in os.listdir(path) if n.endswith("-cache"))
    except FileNotFoundError:
        return 0
