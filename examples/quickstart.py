#!/usr/bin/env python3
"""Quickstart: train a route, recall it with 256 agents, plot the result.

Runs on CPU or TPU unchanged (episodes jit-compile either way; first TPU
compile takes ~30 s). Mirrors the reference workflow (MIGRATION.md): build a
world -> store views along a route -> re-navigate by scene familiarity.

    python examples/quickstart.py [--out /tmp/navdv_quickstart]
"""

import argparse
import os
import sys

# runnable from anywhere: python path/to/examples/quickstart.py
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

import navdv_tpu as nav
from navdv_tpu.simulator import NavigationSimulator


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/navdv_quickstart")
    ap.add_argument("--landscape", default="blobs",
                    choices=["blobs", "noise", "fractal", "checker"])
    ap.add_argument("--trials", type=int, default=256)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    # 1. A world: a textured landscape and a training route across it.
    landscape = nav.make_landscape(args.landscape, size=(512, 512), seed=7,
                                   n_features=150)
    route = nav.make_route("sine", size=(512, 512), margin=60.0, length=120.0,
                           amplitude=15.0)

    # 2. Configure the simulation (defaults = BASELINE config 1's sensor:
    #    72x16 px polar panorama, 60-heading SSD scan, 1 px steps) and give
    #    the agents enough step budget to cover the route.
    arc = float(np.hypot(*np.diff(route, axis=0).T).sum())
    import dataclasses

    cfg = nav.SimConfig()
    cfg = dataclasses.replace(
        cfg, agent=dataclasses.replace(cfg.agent, max_steps=int(arc * 1.3))
    )

    # 3. Train: one vmapped render pass stores a view library along the route.
    # fam_impl defaults to "auto": the measured per-workload winner
    # (config.choose_fam_impl); pass "jnp" for exact reference numerics
    sim = NavigationSimulator.from_config(cfg, landscape, route)
    sim.train()
    print(f"library: {sim.library.views.shape[0]} views "
          f"({sim.library.views.shape[2]}x{sim.library.views.shape[1]} px)")

    # 4. Recall: agents start near the route head with randomized pose noise
    #    and must re-reach the goal using only view familiarity.
    result = sim.navigate(n_trials=args.trials, seed=0)
    print(f"success_rate: {result.success_rate:.3f} over {args.trials} trials")
    print(f"mean path error: {float(result.metrics['mean_path_error'].mean()):.2f} px")

    # 5. Plot trajectories over the landscape.
    out = result.plot(landscape, route, os.path.join(args.out, "recall.png"))
    print("wrote", out)

    # 6. Libraries round-trip through orbax checkpoints.
    import shutil

    shutil.rmtree(os.path.join(args.out, "library"), ignore_errors=True)
    sim.save_library(os.path.join(args.out, "library"))
    sim2 = NavigationSimulator.from_config(cfg, landscape, route)
    sim2.load_library(os.path.join(args.out, "library"))
    r2 = sim2.navigate(n_trials=64, seed=1)
    print(f"reloaded-library success_rate: {r2.success_rate:.3f}")


if __name__ == "__main__":
    main()
