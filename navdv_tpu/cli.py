"""Command-line interface: ``python -m navdv_tpu.cli <command>``.

Commands:
  demo     train on a route and run batched recall, writing plots (+ movie)
  bench    the throughput harness (same as repo-root bench.py)
  sweep    run the BASELINE config-5 parameter grid with on-disk resume
  analyze  RIDF curve + familiarity/catchment map for a trained route
"""

from __future__ import annotations

import argparse
import json
import os


def _add_world_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--landscape", default="blobs", choices=["blobs", "noise", "fractal", "checker", "flat"])
    p.add_argument("--landscape-file", default=None,
                   help="image (PNG/JPEG) or .npy texture; overrides --landscape")
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--seed", type=int, default=7)
    p.add_argument("--route", default="sine", choices=["line", "sine"])
    p.add_argument("--route-length", type=float, default=200.0)
    p.add_argument("--impl", default="auto",
                   choices=["auto", "jnp", "fft", "roll", "conv", "pallas", "infomax"],
                   help="familiarity impl; auto = measured per-workload "
                        "winner (config.choose_fam_impl), jnp = exact "
                        "reference numerics")


def _cli_route(args, size):
    """Route for the CLI commands.

    The edge margin scales down on small worlds (a fixed 60 would leave a
    128-px world only 8 px of route regardless of --route-length), and a
    silently-truncated --route-length is warned about instead of hidden.
    """
    import sys

    import navdv_tpu as nav

    _, w = size
    margin = min(60.0, w / 4.0)
    avail = w - 2.0 * margin
    if args.route_length > avail + 1e-9:
        print(
            f"warning: --route-length {args.route_length:g} does not fit "
            f"world width {w} at margin {margin:g}; truncated to {avail:g}",
            file=sys.stderr,
        )
    return nav.make_route(
        args.route, size=size, margin=margin, length=args.route_length
    )


def cmd_demo(args) -> None:
    import jax
    import jax.numpy as jnp

    import navdv_tpu as nav
    from navdv_tpu.agent import init_state, make_navigate_batch, make_statics
    from navdv_tpu.config import baseline_config
    from navdv_tpu.metrics import episode_metrics, success_rate
    from navdv_tpu.trials import make_trials
    from navdv_tpu import viz

    import dataclasses

    import numpy as np

    cfg = baseline_config(args.config)
    size = (args.size, args.size)
    landscape = _load_world(args, size)
    route = _cli_route(args, landscape.shape)
    steps = args.steps or int(
        np.hypot(*np.diff(route, axis=0).T).sum() / cfg.agent.step_size * 1.3
    )
    cfg = dataclasses.replace(
        cfg, agent=dataclasses.replace(cfg.agent, max_steps=steps)
    )
    land_dev = jnp.asarray(landscape)
    lib = nav.train_library(land_dev, route, cfg)
    st = make_statics(land_dev, lib, route)
    starts, thetas = make_trials(route, cfg, args.trials, seed=args.seed)
    final, rec = jax.block_until_ready(
        make_navigate_batch(cfg, fam_impl=args.impl)(init_state(starts, thetas), st)
    )
    rate = float(success_rate(final))
    print(f"library: {lib.views.shape[0]} views | trials: {args.trials} | "
          f"success_rate: {rate:.3f}")
    os.makedirs(args.out, exist_ok=True)
    print("wrote", viz.plot_trajectory(landscape, route, rec, os.path.join(args.out, "trajectories.png")))
    print("wrote", viz.plot_familiarity_trace(rec, os.path.join(args.out, "familiarity.png")))
    if args.movie:
        one = jax.tree.map(lambda x: x[0], rec)
        print("wrote", viz.animate_episode(landscape, route, one, os.path.join(args.out, "episode.mp4")))
    m = episode_metrics(final, rec)
    with open(os.path.join(args.out, "metrics.json"), "w") as f:
        json.dump(
            {
                "success_rate": rate,
                "mean_steps": float(jnp.mean(m["n_steps"].astype(jnp.float32))),
                "mean_path_error": float(jnp.mean(m["mean_path_error"])),
            },
            f,
            indent=2,
        )


def cmd_bench(args) -> None:
    """Full arg parity with repo-root bench.py (it is the same harness), so
    the CLI can reproduce every committed artifact — including --all's
    per-config lines and the on-TPU parity gates."""
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench

    # delegate to bench's defended CLI body so the --all sequence, the
    # per-line ok/gate invariant, the regression guard AND the three-layer
    # outage defense (probe/watchdog/structured-error) live in ONE place —
    # this entry point must not reintroduce the round-4 hang-on-dead-tunnel.
    # Defaults come from bench's OWN parser (new bench args inherit their
    # defaults instead of silently breaking a hand-mirrored Namespace);
    # values the cli subcommand parsed override the shared names.
    ap = bench.build_parser()
    ns = ap.parse_args([])
    for k, v in vars(args).items():
        if hasattr(ns, k):
            setattr(ns, k, v)
    bench.run_defended(ns, ap)


def _load_world(args, size):
    import navdv_tpu as nav
    from navdv_tpu.landscape import load_landscape

    if getattr(args, "landscape_file", None):
        return load_landscape(args.landscape_file)
    return nav.make_landscape(args.landscape, size=size, seed=args.seed)


def cmd_sweep(args) -> None:
    import navdv_tpu as nav
    from navdv_tpu.sweep import SweepSpec, run_sweep
    from navdv_tpu import viz

    size = (args.size, args.size)
    landscape = _load_world(args, size)
    route = _cli_route(args, landscape.shape)
    import numpy as np

    # budget in STEPS: arc length / step size (sweep cells run the spec's
    # default kinematics; cmd_demo divides the same way)
    steps = args.steps or int(
        np.hypot(*np.diff(route, axis=0).T).sum()
        / nav.SimConfig().agent.step_size
        * 1.3
    )
    trial_seed = args.trial_seed if args.trial_seed is not None else args.seed
    if args.spec:
        # the JSON spec is authoritative; --steps still overrides its budget
        spec = SweepSpec.from_json(args.spec)
        if args.steps:
            import dataclasses

            spec = dataclasses.replace(spec, max_steps=args.steps)
    else:
        spec = SweepSpec(
            n_trials=args.trials,
            max_steps=steps,
            seed=trial_seed,
            start_anywhere=args.start_anywhere,
            lib_bucket=args.lib_bucket,
        )
    shard = None
    if args.shard:
        i, n = args.shard.split("/")
        shard = (int(i), int(n))
    cells_mesh = None
    if args.cells_mesh:
        from navdv_tpu.parallel.mesh import make_mesh

        cells_mesh = make_mesh(args.cells_mesh, 1)
    results = run_sweep(landscape, route, spec, args.out, fam_impl=args.impl,
                        shard=shard, cells_mesh=cells_mesh,
                        recall_check_trials=0 if cells_mesh is not None
                        else args.recall_check)
    viz.plot_sweep_heatmap(
        results, "scan", "px", os.path.join(args.out, "success_heatmap.png")
    )
    print(f"sweep complete: {len(results)} cells -> {args.out}/summary.json")


def cmd_analyze(args) -> None:
    """RIDF + catchment-map diagnostics for a trained route (analysis.py)."""
    import jax.numpy as jnp
    import numpy as np

    import navdv_tpu as nav
    from navdv_tpu import oracle, viz
    from navdv_tpu.analysis import familiarity_map, ridf

    size = (args.size, args.size)
    landscape = _load_world(args, size)
    route = _cli_route(args, landscape.shape)
    cfg = nav.SimConfig()
    land_dev = jnp.asarray(landscape)
    lib = nav.train_library(land_dev, route, cfg)
    pts, headings = oracle.resample_route(route, cfg.capture_spacing)
    i = min(max(args.pose_index, 0), len(pts) - 1) if args.pose_index >= 0 \
        else len(pts) // 2
    os.makedirs(args.out, exist_ok=True)

    angles, fam = ridf(land_dev, lib, pts[i], headings[i], cfg,
                       fam_impl=args.impl)
    k = int(np.argmin(fam))
    print("wrote", viz.plot_ridf(
        angles, fam, os.path.join(args.out, "ridf.png"),
        title=f"RIDF at capture pose {i} (valley "
              f"{np.degrees(angles[k]):+.1f} deg)"))

    fmap = familiarity_map(land_dev, lib, cfg, stride=args.stride,
                           fam_impl=args.impl, batch=args.batch)
    print("wrote", viz.plot_familiarity_map(
        landscape, route, fmap, os.path.join(args.out, "familiarity_map.png")))
    with open(os.path.join(args.out, "analysis.json"), "w") as f:
        json.dump(
            {
                "ridf_pose": [float(pts[i][0]), float(pts[i][1]),
                              float(headings[i])],
                "ridf_valley_deg": float(np.degrees(angles[k])),
                "ridf_depth": float(fam[k]) / max(float(np.max(fam)), 1e-30),
                "map_grid": [len(fmap["y"]), len(fmap["x"])],
                "map_stride": args.stride,
                "fam_min": float(fmap["fam"].min()),
                "fam_max": float(fmap["fam"].max()),
            },
            f,
            indent=2,
        )
    print(f"analysis complete -> {args.out}/analysis.json")


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(prog="navdv_tpu")
    ap.add_argument("--jax-cache", default=None, metavar="DIR",
                    help="persist compiled XLA executables to DIR; re-runs "
                         "load in ~100 ms instead of recompiling "
                         "(utils.compile_cache)")
    sub = ap.add_subparsers(dest="cmd", required=True)

    d = sub.add_parser("demo", help="train + batched recall + plots")
    _add_world_args(d)
    d.add_argument("--config", type=int, default=1)
    d.add_argument("--steps", type=int, default=None, help="override max_steps")
    d.add_argument("--trials", type=int, default=256)
    d.add_argument("--movie", action="store_true")
    d.add_argument("--out", default="out/demo")
    d.set_defaults(fn=cmd_demo)

    b = sub.add_parser("bench", help="throughput harness (same as bench.py)")
    b.add_argument("--config", type=int, default=1)
    b.add_argument("--batch", type=int, default=None)
    b.add_argument("--steps", type=int, default=None)
    b.add_argument("--impl", default="default")
    b.add_argument("--views", type=int, default=None,
                   help="stored-view count (default: BASELINE spec)")
    b.add_argument("--route-length", type=float, default=40.0)
    b.add_argument("--repeats", type=int, default=3)
    b.add_argument("--land-kind", default="blobs",
                   help="bench-world landscape kind (blobs|fractal|noise|"
                        "checker|flat)")
    b.add_argument("--all", action="store_true",
                   help="configs 1-4, the B=1/16/64 latency envelope, and "
                        "the Pallas and sector parity gates")
    b.set_defaults(fn=cmd_bench)

    s = sub.add_parser("sweep", help="BASELINE config-5 grid with resume")
    _add_world_args(s)
    s.add_argument("--trials", type=int, default=256)
    s.add_argument("--steps", type=int, default=None,
                   help="default: route arc length * 1.3")
    s.add_argument("--out", default="out/sweep")
    s.add_argument("--shard", default=None, metavar="I/N",
                   help="run every N-th cell starting at I (array-job pattern)")
    s.add_argument("--spec", default=None, help="SweepSpec JSON file")
    s.add_argument("--start-anywhere", action="store_true",
                   help="start trials uniformly along the route (harder task)")
    s.add_argument("--recall-check", type=int, default=64,
                   help="per cell, re-run this many trials on the exact jnp "
                        "path and record success_rate_jnp (0 = off)")
    s.add_argument("--trial-seed", type=int, default=None,
                   help="trial-randomization seed (default: --seed, which also "
                        "seeds the landscape)")
    s.add_argument("--cells-mesh", type=int, default=0, metavar="N",
                   help="distribute grid CELLS over an N-device data-axis "
                        "mesh (SURVEY §3.5): same-traced-program cells run "
                        "as one SPMD program; disables --recall-check")
    s.add_argument("--lib-bucket", type=int, default=0,
                   help="pad libraries to a multiple of this many views so "
                        "spacing-only cells share one XLA compilation "
                        "(0 = off; results are unchanged — padded views "
                        "never win the familiarity min)")
    s.set_defaults(fn=cmd_sweep)

    a = sub.add_parser("analyze",
                       help="RIDF curve + familiarity/catchment map figures")
    _add_world_args(a)
    a.add_argument("--stride", type=float, default=8.0,
                   help="map grid spacing in px")
    a.add_argument("--batch", type=int, default=1024,
                   help="map positions per compiled probe batch")
    a.add_argument("--pose-index", type=int, default=-1,
                   help="capture-pose index for the RIDF (-1 = mid-route)")
    a.add_argument("--out", default="out/analysis")
    a.set_defaults(fn=cmd_analyze)

    args = ap.parse_args(argv)
    if args.jax_cache:
        from navdv_tpu.utils.compile_cache import enable_persistent_cache

        enable_persistent_cache(args.jax_cache)
    args.fn(args)


if __name__ == "__main__":
    main()
