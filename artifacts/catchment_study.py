"""Catchment fraction vs closed-loop recall across world statistics.

The catchment area (analysis.catchment: share of map positions whose
familiarity-descent path reaches the route corridor) is the literature's
static predictor of navigability (Zeil 2003). This study measures it next
to the actual closed-loop recall on the three world kinds whose recall
ordering is already established (artifacts/RESULTS.md: blobs ≈ 1.0 >>
fractal ≈ 0.5 on this route scale), asking whether the static surface
predicts the dynamic outcome.

Protocol per world (512², sine route length 200 at margin 60 — the
committed sweep/quickstart route — default SimConfig, fam_impl="jnp" exact
path): full-circle familiarity map at stride 8 → catchment at the agent's
corridor (20 px), plus B=64 recall from bench-noise starts
(σ=1.5 px / 0.15 rad, make_trials). Reported capture fractions are banded
by distance-to-route (≤24 / ≤48 / ≤96 px / all): grid-global fractions are
dominated by far cells whose 8-px-grid descent cannot reach home, so the
near bands carry the signal. Appends one JSON line per world to
catchment_study.jsonl and writes a contoured map figure per world.

Route-placement caveat (measured while building this): on the blobs seed-7
world the same sine route at margin 40 instead of 60 drops exact-path
recall 1.000 -> 0.281 (45/64 diverge) — route placement changes which
texture the library sees, the RESULTS.md finding-5 mechanism at 20-px
scale. The study pins margin=60.

Runs anywhere (CPU ok, TPU fast): python artifacts/catchment_study.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

OUTDIR = os.path.dirname(os.path.abspath(__file__))


def main():
    import jax
    import jax.numpy as jnp

    import navdv_tpu as nav
    from navdv_tpu import viz
    from navdv_tpu.agent import init_state, make_navigate_batch, make_statics
    from navdv_tpu.analysis import catchment, familiarity_map
    from navdv_tpu.metrics import success_rate
    from navdv_tpu.trials import make_trials

    cfg = nav.SimConfig()
    out = os.path.join(OUTDIR, "catchment_study.jsonl")
    # overwrite, don't append: the study always runs all three worlds, and
    # appended re-runs would leave stale rows mixed with fresh ones
    open(out, "w").close()
    for kind in ["blobs", "fractal", "noise"]:
        t0 = time.perf_counter()
        landscape = jnp.asarray(nav.make_landscape(kind, size=(512, 512), seed=7))
        route = nav.make_route("sine", size=(512, 512), margin=60.0, length=200.0)
        lib = nav.train_library(landscape, route, cfg)
        st = make_statics(landscape, lib, route)

        fmap = familiarity_map(landscape, lib, cfg, stride=8.0, batch=2048)
        c = catchment(fmap, route, corridor=cfg.agent.corridor)
        fig = viz.plot_familiarity_map(
            np.asarray(landscape), route, fmap,
            os.path.join(OUTDIR, f"catchment_{kind}.png"),
            captured=c["captured"],
            title=f"{kind}: catchment fraction {c['fraction']:.2f}",
        )

        arc = float(np.hypot(*np.diff(route, axis=0).T).sum())
        import dataclasses

        cfg_run = dataclasses.replace(
            cfg,
            agent=dataclasses.replace(
                cfg.agent, max_steps=int(arc / cfg.agent.step_size * 1.3)
            ),
        )
        B = 64
        starts, thetas = make_trials(route, cfg_run, B, seed=0)
        final, _ = jax.block_until_ready(
            make_navigate_batch(cfg_run, fam_impl="jnp")(
                init_state(starts, thetas), st
            )
        )
        bands = {
            f"captured_within_{r}px": round(
                float(c["captured"][c["route_dist"] <= r].mean()), 4)
            for r in (24, 48, 96)
        }
        row = {
            "world": kind,
            "device": jax.default_backend(),
            "route_margin": 60.0,
            "catchment_fraction": round(c["fraction"], 4),
            **bands,
            "recall": round(float(success_rate(final)), 4),
            "map_grid": list(c["captured"].shape),
            "corridor": cfg.agent.corridor,
            "views": int(lib.views.shape[0]),
            "fig": os.path.basename(fig),
            "wall_s": round(time.perf_counter() - t0, 1),
        }
        print(json.dumps(row), flush=True)
        with open(out, "a") as f:
            f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
