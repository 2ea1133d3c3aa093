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

import jax

from navdv_tpu.parallel.mesh import make_mesh


def init_distributed(**kwargs) -> None:
    """Initialize multi-host JAX if this looks like a multi-host environment
    (JAX auto-detects TPU pod topology); safe no-op on a single host."""
    try:
        if jax.process_count() > 1:
            return  # already initialized
    except RuntimeError:
        pass
    try:
        jax.distributed.initialize(**kwargs)
    except Exception:
        # single-host / unsupported platform: local devices only
        pass


def global_mesh(n_lib: int = 1):
    """Mesh over every addressable device: ('data', 'lib') with the library
    axis innermost so pmin rides ICI within a host before crossing DCN."""
    n_dev = len(jax.devices())
    assert n_dev % n_lib == 0, (n_dev, n_lib)
    return make_mesh(n_dev // n_lib, n_lib)
