"""Auxiliary subsystems: NaN hygiene (SURVEY.md §5.2), perf-harness smoke
(§4.6), mesh-sharded sweep cells, SweepSpec JSON, distributed init no-op."""

import json

import jax
import numpy as np
import pytest


def test_step_is_nan_free_under_debug_nans(small_cfg, small_world):
    """jax_debug_nans raises on any NaN produced inside the jitted step."""
    import jax.numpy as jnp

    from navdv_tpu.agent import init_state, make_statics, make_step_batched
    from navdv_tpu.oracle import resample_route
    from navdv_tpu.training import train_library

    landscape, route = small_world
    lib = train_library(jnp.asarray(landscape), route, small_cfg)
    st = make_statics(landscape, lib, route)
    pts, hd = resample_route(route, small_cfg.capture_spacing)
    states = init_state(
        jnp.asarray(pts[:4], jnp.float32), jnp.asarray(hd[:4], jnp.float32)
    )
    with jax.debug_nans(True):
        out, rec = jax.jit(make_step_batched(small_cfg))(states, st)
        jax.block_until_ready(out)


def test_bench_smoke():
    """The repo-root bench harness runs end-to-end (tiny, CPU)."""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import run_bench

    res = run_bench(config_n=1, batch=8, steps=16, impl="jnp", repeats=1)
    assert res["metric"] == "agent-steps/sec/chip"
    assert res["value"] > 0
    assert set(res) >= {"metric", "value", "unit", "vs_baseline", "success_rate"}


def test_sweep_cell_on_mesh(small_cfg, small_world):
    """One sweep cell spanning the 8-device mesh == aggregate sanity."""
    from navdv_tpu.parallel.mesh import make_mesh
    from navdv_tpu.sweep import run_cell

    landscape, route = small_world
    mesh = make_mesh(4, 2)
    res = run_cell(landscape, route, small_cfg, n_trials=8, seed=0, mesh=mesh)
    assert res["status_counts"].sum() == 8
    assert 0.0 <= float(res["success_rate"]) <= 1.0


def test_sweepspec_json_roundtrip(tmp_path):
    from navdv_tpu.sweep import SweepSpec

    spec = {
        "sensor_px": [[24, 4, 3]],
        "scan_granularity": [[12, 2]],
        "capture_spacing": [1.5, 3.0],
        "metric": "ncc",
        "n_trials": 7,
    }
    p = tmp_path / "spec.json"
    p.write_text(json.dumps(spec))
    got = SweepSpec.from_json(str(p))
    assert got.metric == "ncc" and got.n_trials == 7
    keys = [k for k, _, _ in got.cells()]
    assert len(keys) == 2


def test_distributed_init_single_host():
    from navdv_tpu.parallel.distributed import global_mesh, init_distributed

    init_distributed()  # must be a safe no-op on one host
    mesh = global_mesh(n_lib=2)
    assert mesh.devices.size == len(jax.devices())


def test_distributed_init_raises_with_cluster_context(monkeypatch):
    """A failed initialize with launcher env present must raise: degrading
    to single-host there means every host silently runs the whole workload
    independently."""
    import pytest

    from navdv_tpu.parallel import distributed

    monkeypatch.setattr(
        jax.distributed, "is_initialized", lambda: False, raising=False
    )
    def boom(**kw):
        raise ValueError("no coordinator")
    monkeypatch.setattr(jax.distributed, "initialize", boom)
    # no cluster context: swallowed (logged), single-host continues
    distributed.init_distributed()
    # launcher env present: loud failure
    monkeypatch.setenv("SLURM_JOB_NUM_NODES", "4")
    with pytest.raises(RuntimeError, match="cluster context"):
        distributed.init_distributed()
    monkeypatch.delenv("SLURM_JOB_NUM_NODES")
    # explicit kwargs: loud failure
    with pytest.raises(RuntimeError, match="cluster context"):
        distributed.init_distributed(coordinator_address="127.0.0.1:1")


def test_persistent_compile_cache_writes_and_hits(tmp_path):
    """enable_persistent_cache persists compiled executables to disk
    (SURVEY.md §3.5: per-cell-shape compiles; the cache removes them across
    processes). In-process we can only assert the cache dir fills; the
    cross-process hit is the measured artifact (artifacts/bucket_sweep)."""
    import jax.numpy as jnp

    from navdv_tpu.utils.compile_cache import enable_persistent_cache

    d = enable_persistent_cache(str(tmp_path / "cc"), min_compile_time_s=0.0)
    try:

        @jax.jit
        def f(x):
            return (x * 2.0 + 1.0).sum()

        jax.block_until_ready(f(jnp.arange(128.0)))
        import os

        files = os.listdir(d)
        assert files, "no cache entries written"
    finally:
        jax.config.update("jax_compilation_cache_dir", None)
