"""Extend the large-library scale envelope to 32k/64k views (single chip).

Round 4 measured Nl = 500/2000/8000 (artifacts/biglib_envelope.jsonl): the
memory model extrapolates the roll path's pre-rolled aux to ~7 GB at 64k
views — this script finds where the single-chip paths actually break.
Workload matches the committed envelope: 120-heading 1-bin SSD scan,
72x16 u=5 sensor, B=256, capture spacing held at the 8000-view density
(route length scales with Nl; world grows to 2048^2 with feature density
and size held constant per the scale-envelope lesson).

Usage: python artifacts/biglib_ext.py [views ...]   (default: 32000 64000)
"""

import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def run_one(views: int, impl: str) -> dict:
    import dataclasses

    import jax
    import jax.numpy as jnp

    from bench import _world, _timed_windows
    from navdv_tpu import oracle, train_library
    from navdv_tpu.agent import init_state, make_navigate_batch, make_statics
    from navdv_tpu.config import (
        AgentConfig,
        ScanConfig,
        SensorConfig,
        SimConfig,
    )
    from navdv_tpu.metrics import success_rate

    # Route length scales with Nl up to the 8000-view envelope's 160, then
    # CAPS there: a first attempt scaled the route to 640 px (2048^2 world)
    # for 32k views and recall collapsed to 0.02 — 16x-longer routes make the
    # TASK unsolvable (perceptual aliasing between distant route segments),
    # conflating task difficulty with the memory axis this envelope isolates.
    # Past 8000 views the library just gets denser on the same solvable
    # route/world as the committed envelope.
    route_length = min(160.0 * views / 8000.0, 160.0)
    size = 512
    landscape, route = _world(route_length, size=size)
    arc = float(np.hypot(*np.diff(route, axis=0).T).sum())
    cfg = SimConfig(
        sensor=SensorConfig(n_azimuth=72, n_radial=16, az_upsample=5),
        scan=ScanConfig(n_headings=120, scan_step_bins=1, metric="ssd"),
        agent=AgentConfig(max_steps=int(arc * 1.3)),
        capture_spacing=arc / (views - 0.5),
    )
    batch = 256
    t0 = time.perf_counter()
    lib = train_library(landscape, route, cfg)
    jax.block_until_ready(lib.views)
    train_s = time.perf_counter() - t0
    st = make_statics(landscape, lib, route)
    pts, headings = oracle.resample_route(route, cfg.capture_spacing)
    rng = np.random.default_rng(0)
    starts = pts[0][None, :] + rng.normal(0, 1.5, size=(batch, 2))
    thetas = headings[0] + rng.normal(0, 0.15, size=(batch,))
    states0 = init_state(starts, thetas)

    nav_fn = make_navigate_batch(cfg, fam_impl=impl)
    prep_s = aux_mb = None
    if nav_fn.prepare is not None:
        t0 = time.perf_counter()
        aux = jax.block_until_ready(nav_fn.prepare(st))
        prep_s = time.perf_counter() - t0
        aux_mb = sum(x.size * x.dtype.itemsize
                     for x in jax.tree.leaves(aux)) / 1e6
        del aux
    rate, times, chain = _timed_windows(nav_fn, states0, st, repeats=2,
                                        min_window_s=0.5)
    dt = min(times)
    return {
        "views": int(lib.views.shape[0]),
        "impl": impl,
        "steps_s": round(batch * cfg.agent.max_steps / dt, 1),
        "recall": round(rate, 4),
        "batch": batch,
        "max_steps": cfg.agent.max_steps,
        "train_s": round(train_s, 1),
        "prepare_s": round(prep_s, 3) if prep_s else None,
        "aux_mb": round(aux_mb, 1) if aux_mb else None,
        "route_length": route_length,
        "landscape": f"blobs-{size}x{size}",
        "chain": chain,
    }


def main():
    views_list = [int(v) for v in sys.argv[1:]] or [32000, 64000]
    out = "artifacts/biglib_ext.jsonl"
    with open(out, "a") as f:
        for views in views_list:
            for impl in ("roll", "fft"):
                try:
                    r = run_one(views, impl)
                except Exception as e:  # record the wall, don't die
                    r = {"views": views, "impl": impl,
                         "error": f"{type(e).__name__}: {str(e)[:300]}"}
                r["attempt"] = 2
                print(json.dumps(r), flush=True)
                f.write(json.dumps(r) + "\n")
                f.flush()


if __name__ == "__main__":
    main()
