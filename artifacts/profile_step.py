#!/usr/bin/env python3
"""Ad-hoc: profile one BASELINE config's episode and print top HLO ops.

Usage: python artifacts/profile_step.py [config_n] [batch] [impl]
"""
import dataclasses
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax

    import navdv_tpu as nav
    from navdv_tpu import oracle
    from navdv_tpu.agent import init_state, make_navigate_batch, make_statics
    from navdv_tpu.config import baseline_config, baseline_fam_impl
    from navdv_tpu.metrics import success_rate
    from navdv_tpu.utils.profiling import top_hlo_ops, trace
    from bench import _world, SPEC_BATCH, SPEC_VIEWS

    config_n = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else SPEC_BATCH[config_n]
    impl = sys.argv[3] if len(sys.argv) > 3 else baseline_fam_impl(config_n)

    cfg = baseline_config(config_n)
    landscape, route = _world(40.0)
    arc = float(np.hypot(*np.diff(route, axis=0).T).sum())
    steps = int(arc / cfg.agent.step_size * 1.3)
    cfg = dataclasses.replace(
        cfg,
        capture_spacing=arc / SPEC_VIEWS[config_n],
        agent=dataclasses.replace(cfg.agent, max_steps=steps),
    )
    lib = nav.train_library(landscape, route, cfg)
    st = make_statics(landscape, lib, route)
    pts, headings = oracle.resample_route(route, cfg.capture_spacing)
    rng = np.random.default_rng(0)
    starts = pts[0][None, :] + rng.normal(0, 1.5, size=(batch, 2))
    thetas = headings[0] + rng.normal(0, 0.15, size=(batch,))
    states0 = init_state(starts, thetas)
    nav_fn = make_navigate_batch(cfg, fam_impl=impl)
    final, rec = nav_fn(states0, st)
    print("warmup success:", float(success_rate(final)))

    logdir = f"/tmp/navdv_prof_c{config_n}_b{batch}_{impl}"
    with trace(logdir):
        final, rec = nav_fn(states0, st)
        float(success_rate(final))

    rows = top_hlo_ops(logdir, n=28, divisor=steps)
    total = sum(r["self_us"] for r in rows)
    print(f"config {config_n} batch {batch} impl {impl} steps {steps}")
    print(f"top-op total: {total:.0f} us/step")
    for r in rows:
        print(f"  {r['self_us']:8.1f} us  {r['bound_by'] or '?':<12} {r['op']}")


if __name__ == "__main__":
    main()
