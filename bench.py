#!/usr/bin/env python3
"""Benchmark harness — prints ONE JSON line with the headline metric.

Headline (BASELINE.json): agent-steps/sec/chip (render + familiarity) at
matched route-recall accuracy, target >= 1e5 on TPU v5e-1. The run reports the
recall success rate alongside throughput (the accuracy gate, BASELINE.md);
steps are counted as B * max_steps scan iterations actually executed on
device.

Usage: python bench.py [--config N] [--batch B] [--steps T] [--impl jnp|pallas]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def run_bench(config_n: int = 1, batch: int = 1024, steps: int | None = None,
              impl: str = "default", repeats: int = 3) -> dict:
    import dataclasses

    import jax
    import jax.numpy as jnp

    import navdv_tpu as nav
    from navdv_tpu import oracle
    from navdv_tpu.agent import init_state, make_navigate_batch, make_statics
    from navdv_tpu.config import baseline_config
    from navdv_tpu.metrics import success_rate

    if impl == "default":
        # measured on v5e-1: XLA's fused matmul (jnp path) beats the Pallas
        # kernel at the BASELINE shapes; the kernel is for giant libraries
        impl = "jnp"

    cfg = baseline_config(config_n)
    landscape = jnp.asarray(
        nav.make_landscape("blobs", size=(512, 512), seed=7, n_features=150)
    )
    route = nav.make_route("sine", size=(512, 512), margin=60.0, length=200.0,
                           amplitude=25.0)
    if steps is None:
        # success gate needs the budget to cover the route: arc length + 30%
        arc = float(np.hypot(*np.diff(route, axis=0).T).sum())
        steps = int(arc / cfg.agent.step_size * 1.3)
    cfg = dataclasses.replace(
        cfg, agent=dataclasses.replace(cfg.agent, max_steps=steps)
    )
    lib = nav.train_library(landscape, route, cfg)
    st = make_statics(landscape, lib, route)
    pts, headings = oracle.resample_route(route, cfg.capture_spacing)

    rng = np.random.default_rng(0)
    starts = pts[0][None, :] + rng.normal(0, 1.5, size=(batch, 2))
    thetas = headings[0] + rng.normal(0, 0.15, size=(batch,))
    states0 = init_state(starts, thetas)

    nav_fn = make_navigate_batch(cfg, fam_impl=impl)
    # warmup + compile
    final, rec = jax.block_until_ready(nav_fn(states0, st))
    rate = float(success_rate(final))

    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(nav_fn(states0, st))
        times.append(time.perf_counter() - t0)
    dt = min(times)
    agent_steps = batch * cfg.agent.max_steps
    return {
        "metric": "agent-steps/sec/chip",
        "value": round(agent_steps / dt, 1),
        "unit": "steps/s",
        "vs_baseline": round(agent_steps / dt / 1e5, 3),
        "config": config_n,
        "batch": batch,
        "max_steps": cfg.agent.max_steps,
        "library_views": int(lib.views.shape[0]),
        "success_rate": round(rate, 4),
        "impl": impl,
        "device": str(jax.devices()[0].platform),
        "wall_s": round(dt, 4),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", type=int, default=1)
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--steps", type=int, default=None,
                    help="default: route arc length * 1.3")
    ap.add_argument("--impl", default="default")
    ap.add_argument("--all", action="store_true",
                    help="run BASELINE configs 1-4 (one JSON line each)")
    args = ap.parse_args()
    if args.all:
        # config 4 IS config 1 with the 1024-agent batch (the default run);
        # config 5 (sweep grid) runs via `python -m navdv_tpu.cli sweep`
        for cfg_n, batch in [(1, 1024), (2, 512), (3, 128), (4, 1024)]:
            print(json.dumps(run_bench(cfg_n, batch, args.steps, args.impl)))
        return
    result = run_bench(args.config, args.batch, args.steps, args.impl)
    print(json.dumps(result))


if __name__ == "__main__":
    sys.path.insert(0, ".")
    main()
