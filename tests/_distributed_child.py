"""Child program for the 2-process jax.distributed coordinator test
(test_distributed.py). Run as::

    python _distributed_child.py <process_id> <port>

in an env with the axon plugin disabled and JAX_PLATFORMS=cpu; each process
exposes 2 virtual CPU devices, so the global mesh spans 4 devices across 2
processes. Exercises the full multi-host entry surface of
navdv_tpu/parallel/distributed.py (SURVEY.md §4.5/§5.8):

- ``init_distributed`` with an explicit localhost coordinator (and its
  already-initialized no-op re-entry),
- ``global_mesh`` over every addressable device,
- one ``lax.pmin`` over the library axis SPANNING the process boundary —
  the system's one collective — checked against the host-side min,
- a gather of the non-fully-addressable result back to every host.
"""

import os
import sys


def main() -> None:
    proc_id = int(sys.argv[1])
    port = sys.argv[2]
    os.environ.setdefault("XLA_FLAGS", "")
    if "--xla_force_host_platform_device_count" not in os.environ["XLA_FLAGS"]:
        os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=2"
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    import jax
    import numpy as np
    from jax import shard_map
    from jax.experimental import multihost_utils
    from jax.sharding import NamedSharding, PartitionSpec as P

    from navdv_tpu.parallel.distributed import init_distributed, global_mesh

    init_distributed(
        coordinator_address=f"localhost:{port}", num_processes=2,
        process_id=proc_id,
    )
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 4, len(jax.devices())
    init_distributed()  # second call: already-initialized no-op path

    mesh = global_mesh(n_lib=2)
    assert mesh.shape == {"data": 2, "lib": 2}, mesh.shape

    # pmin across the lib axis, which spans the process boundary: the mesh
    # lays devices out (data, lib) row-major over [p0d0, p0d1, p1d0, p1d1],
    # so each data row is one process and lib pairs devices WITHIN a row —
    # flip to n_lib=2 over 2 data rows means lib crosses nothing. Shard the
    # DATA axis over processes and pmin over lib within each; then repeat
    # with the transposed value so the collective crosses processes too.
    glob = (np.arange(4, dtype=np.float32).reshape(2, 2) * 7.0) - 5.0
    x = jax.make_array_from_callback(
        (2, 2), NamedSharding(mesh, P("data", "lib")), lambda idx: glob[idx]
    )
    f = jax.jit(shard_map(
        lambda v: jax.lax.pmin(v, "lib"),
        mesh=mesh, in_specs=P("data", "lib"), out_specs=P("data", None),
    ))
    y = multihost_utils.process_allgather(f(x), tiled=True)
    np.testing.assert_allclose(
        np.asarray(y).reshape(-1), glob.min(axis=1).reshape(-1)
    )

    # and a pmin over DATA — the axis that spans the two processes — so the
    # collective provably crosses the coordinator boundary
    g = jax.jit(shard_map(
        lambda v: jax.lax.pmin(v, "data"),
        mesh=mesh, in_specs=P("data", "lib"), out_specs=P(None, "lib"),
    ))
    z = multihost_utils.process_allgather(g(x), tiled=True)
    np.testing.assert_allclose(
        np.asarray(z).reshape(-1), glob.min(axis=0).reshape(-1)
    )

    print(f"DIST_OK {jax.process_index()}", flush=True)


if __name__ == "__main__":
    main()
