"""Multi-host entry (SURVEY.md §5.8): thin wrapper over
``jax.distributed.initialize`` plus mesh construction spanning all hosts.

On a TPU pod slice, run the same program on every host::

    from navdv_tpu.parallel.distributed import init_distributed, global_mesh
    init_distributed()              # no-op on single-host
    mesh = global_mesh(n_lib=1)    # data axis spans all chips over ICI/DCN

Collectives (the per-step familiarity ``pmin`` and result gathers) are
inserted by XLA; nothing else changes — shard_statics/make_navigate_sharded
work identically on a multi-host mesh.
"""

from __future__ import annotations

import logging

import jax

from navdv_tpu.parallel.mesh import make_mesh

logger = logging.getLogger(__name__)


def init_distributed(**kwargs) -> None:
    """Initialize multi-host JAX (JAX auto-detects TPU pod topology).

    Safe no-op when already initialized or on a plain single-host setup. A
    failure with explicit ``kwargs`` (coordinator_address etc.) is a real
    misconfiguration and re-raises; the implicit single-host case logs the
    reason instead of silently swallowing it.
    """
    if getattr(jax.distributed, "is_initialized", lambda: False)():
        logger.info("jax.distributed already initialized; skipping")
        return
    try:
        jax.distributed.initialize(**kwargs)
    except Exception as e:
        if kwargs:
            # the caller asked for a specific topology — surface the failure
            raise
        logger.info(
            "jax.distributed.initialize unavailable (%s: %s); "
            "continuing with local devices only",
            type(e).__name__,
            e,
        )


def global_mesh(n_lib: int = 1):
    """Mesh over every addressable device: ('data', 'lib') with the library
    axis innermost so pmin rides ICI within a host before crossing DCN."""
    n_dev = len(jax.devices())
    assert n_dev % n_lib == 0, (n_dev, n_lib)
    return make_mesh(n_dev // n_lib, n_lib)
