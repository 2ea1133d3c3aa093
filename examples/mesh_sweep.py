#!/usr/bin/env python3
"""Distribute a parameter sweep's CELLS over a device mesh (SURVEY.md §3.5).

A grid sweep is embarrassingly parallel at cell granularity. With
``run_sweep(cells_mesh=...)`` cells that share a traced program (same
sensor/scan config; library shapes matched by ``lib_bucket``) are stacked
along a cell axis and run as ONE SPMD program with that axis sharded over
the mesh's ``data`` axis — each device runs whole episode batches for its
cells and reduces them to metric aggregates on device. Per-cell result
files and resume work exactly like the serial path.

Runs anywhere: on a multi-chip TPU slice the mesh spans real chips; on CPU
this script forces an 8-device virtual mesh so the behavior is identical.

    python examples/mesh_sweep.py [--out /tmp/navdv_mesh_sweep]
"""

import argparse
import os
import sys

# virtual 8-device CPU mesh when no multi-chip backend is available (the
# axon sitecustomize registers its plugin at interpreter startup, so the
# cleaned environment needs a re-exec, same as tests/conftest.py)
if os.environ.get("PALLAS_AXON_POOL_IPS") and not os.environ.get("NAVDV_EXAMPLE_REEXEC"):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["NAVDV_EXAMPLE_REEXEC"] = "1"
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if "host_platform_device_count" not in f]
    env["XLA_FLAGS"] = " ".join(flags + ["--xla_force_host_platform_device_count=8"])
    os.execvpe(sys.executable, [sys.executable] + sys.argv, env)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/navdv_mesh_sweep")
    args = ap.parse_args()

    import jax

    import navdv_tpu as nav
    from navdv_tpu.parallel.mesh import make_mesh
    from navdv_tpu.sweep import SweepSpec, run_sweep

    n = min(8, len(jax.devices()))
    mesh = make_mesh(n, 1)
    print(f"devices: {len(jax.devices())} ({jax.devices()[0].platform}); "
          f"cell mesh: data={n}")

    landscape = nav.make_landscape("blobs", size=(256, 256), seed=7,
                                   n_features=80)
    route = nav.make_route("sine", size=(256, 256), margin=50.0, length=60.0,
                           amplitude=8.0)
    # one sensor/scan config x a 4-point capture-density axis: all four
    # cells share one traced program (lib_bucket matches their library
    # shapes), so they run as a single sharded program over the mesh
    spec = SweepSpec(
        sensor_px=((72, 16, 5),),
        scan_granularity=((60, 2),),
        capture_spacing=(0.8, 1.2, 1.6, 2.0),
        n_trials=64,
        max_steps=96,
        lib_bucket=128,
    )
    results = run_sweep(landscape, route, spec, args.out, cells_mesh=mesh,
                        tensorboard=False)
    print(f"\n{len(results)} cells -> {args.out}")
    for key in sorted(results):
        r = results[key]
        print(f"  {key}: success={float(r['success_rate']):.3f} "
              f"views={int(r['n_library_views'])} "
              f"group={int(r['group_size'])}")


if __name__ == "__main__":
    main()
