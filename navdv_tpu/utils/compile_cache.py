"""Opt-in persistent XLA compilation cache (SURVEY.md §3.5 boundary note:
sweep cells recompile per shape; first TPU compiles run ~30 s through the
tunnel).

Two layers attack recompilation:
  - within one process, ``SweepSpec.lib_bucket`` + run_sweep's navigate-fn
    cache merge shape-equal cells into one compilation (sweep.py);
  - ACROSS processes (re-runs, resumed array-job shards, bench repeats),
    this module persists compiled executables to disk so the same program
    loads in ~100 ms instead of recompiling.

Off by default: enable with ``enable_persistent_cache(dir)`` or the
``--jax-cache DIR`` flag on ``cli bench/sweep/demo`` and ``bench.py``.
"""

from __future__ import annotations

import logging
import os

logger = logging.getLogger(__name__)


def enable_persistent_cache(cache_dir: str, min_compile_time_s: float = 1.0) -> str:
    """Point JAX's persistent compilation cache at ``cache_dir`` (created if
    missing). Only programs that took >= ``min_compile_time_s`` to compile are
    persisted — tiny programs are cheaper to recompile than to load.

    Returns the absolute cache dir. Safe to call more than once; later calls
    re-point the cache.
    """
    import jax

    cache_dir = os.path.abspath(os.path.expanduser(cache_dir))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(min_compile_time_s))
    # cache every kind of miss (default "all" on current jax, set explicitly
    # so behavior survives default changes)
    try:
        jax.config.update("jax_persistent_cache_enable_xla_caches", "all")
    except Exception:  # older jax without the knob — the dir alone suffices
        logger.debug("jax_persistent_cache_enable_xla_caches unavailable")
    logger.info("persistent compilation cache at %s", cache_dir)
    return cache_dir
