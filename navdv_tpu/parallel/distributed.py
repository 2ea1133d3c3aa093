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
import os

import jax

from navdv_tpu.parallel.mesh import make_mesh

logger = logging.getLogger(__name__)

# env vars whose presence means a multi-process launcher set this process up
# to join a cluster — a failure to initialize is then a real outage, never
# the benign "plain single host" case
_CLUSTER_ENV = (
    # NOT TPU_WORKER_HOSTNAMES: single-host TPU VMs set it too (this repo's
    # own axon environment does), so it cannot distinguish pod from plain
    "JAX_COORDINATOR_ADDRESS",
    "COORDINATOR_ADDRESS",
    "MEGASCALE_COORDINATOR_ADDRESS",
    "SLURM_JOB_NUM_NODES",
    "OMPI_MCA_orte_hnp_uri",
)


def init_distributed(**kwargs) -> None:
    """Initialize multi-host JAX (JAX auto-detects TPU pod topology).

    Safe no-op when already initialized or on a plain single-host setup. A
    failure is swallowed (logged) ONLY when nothing indicates this process
    was meant to join a cluster; with explicit ``kwargs``
    (coordinator_address etc.) or any cluster launcher env present
    (coordinator/SLURM/TPU-pod variables) it re-raises — proceeding
    single-host there means every host silently runs the whole workload
    independently, which is worse than a loud failure.
    """
    if getattr(jax.distributed, "is_initialized", lambda: False)():
        logger.info("jax.distributed already initialized; skipping")
        return
    cluster_env = [v for v in _CLUSTER_ENV if os.environ.get(v)]
    try:
        jax.distributed.initialize(**kwargs)
    except Exception as e:
        if kwargs or cluster_env:
            # the caller (or its launcher) asked for a specific topology —
            # surface the failure instead of degrading to single-host
            raise RuntimeError(
                f"multi-host initialization failed with cluster context "
                f"present (kwargs={sorted(kwargs)}, env={cluster_env})"
            ) from e
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
    if n_dev % n_lib != 0:  # not assert: must survive python -O
        raise ValueError(
            f"{n_dev} devices do not tile a lib axis of {n_lib}; a truncated "
            f"mesh would silently idle {n_dev % n_lib} chips"
        )
    return make_mesh(n_dev // n_lib, n_lib)
