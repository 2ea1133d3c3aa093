#!/usr/bin/env python3
"""Learned-memory workflow: the Infomax novelty network (fam_impl="infomax").

Instead of storing every view (perfect memory — cost and HBM grow with the
library), a single-layer network is trained once on the route's views and
the library is discarded: memory is O(units x pixels), CONSTANT in library
size (SEMANTICS.md §9). The workflow below trains it, checkpoints the
few-MB pack, reloads it, and navigates — without the library in device
memory at recall time.

Measured guidance from artifacts/RESULTS.md to mind when adopting it:
the model prefers SPARSE capture (don't hand it a dense perfect-memory
library — artifacts/infomax_density.jsonl), and its recall is a ROUTE/WORLD
regime (artifacts/infomax_noise.jsonl): on straight routes through
high-frequency (noise) worlds it collapses — no training-RULE mitigation
rescues it, though training on a heading-jittered capture library recovers
much of it (train_library(heading_jitter=0.2..0.4) — see its docstring
recipe) — while on heading-diverse (curved) routes through the same
worlds it works and can BEAT perfect memory (0.82-0.92 vs 0.70, best
with infomax_units at P/4..P/2). Gate recall on your route/world pair.

    python examples/learned_memory.py [--out /tmp/navdv_learned]
"""

import argparse
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

import navdv_tpu as nav
from navdv_tpu import oracle
from navdv_tpu.agent import init_state, make_navigate_batch, make_statics
from navdv_tpu.checkpoint import load_infomax, save_infomax
from navdv_tpu.metrics import success_rate


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/navdv_learned")
    ap.add_argument("--trials", type=int, default=64)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    cfg = nav.SimConfig()  # 72x16 sensor; infomax AUTO training budget
    landscape = jnp.asarray(nav.make_landscape("blobs", size=(512, 512), seed=7))
    route = nav.make_route("line", size=(512, 512), margin=60.0, length=60.0)

    # capture + train the network once (the prepare stage), then checkpoint
    lib = nav.train_library(landscape, route, cfg)
    st = make_statics(landscape, lib, route)
    run = make_navigate_batch(cfg, fam_impl="infomax")
    pack = run.prepare(st)
    ckpt = os.path.join(args.out, "infomax_pack")
    shutil.rmtree(ckpt, ignore_errors=True)  # orbax refuses to overwrite
    save_infomax(ckpt, pack)
    mb = sum(x.size * x.dtype.itemsize for x in pack) / 1e6
    print(f"trained network checkpointed: {mb:.1f} MB — CONSTANT in library "
          f"size (this tiny demo library is {lib.flat.nbytes / 1e6:.1f} MB, "
          f"but a 32k-view one is ~3.5 GB pre-rolled; biglib_ext.jsonl)")

    # recall with the reloaded pack
    pack = load_infomax(ckpt)
    pts, headings = oracle.resample_route(route, cfg.capture_spacing)
    rng = np.random.default_rng(0)
    starts = pts[0][None] + rng.normal(0, 1.5, (args.trials, 2))
    thetas = headings[0] + rng.normal(0, 0.15, (args.trials,))
    final, _ = run(init_state(starts, thetas), st, pack)
    print("learned-memory success_rate:", float(success_rate(final)))


if __name__ == "__main__":
    main()
