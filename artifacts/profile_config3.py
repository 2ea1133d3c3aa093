"""Profile the BASELINE config-3 step (sector renderer + spectral NCC) on the
real chip: one warm episode traced, top HLO ops by self time per step.

Run: PYTHONPATH=/root/repo python artifacts/profile_config3.py [config_n]
"""

import sys

sys.path.insert(0, "/root/repo")

import numpy as np


def main(config_n: int = 3) -> None:
    import bench
    import navdv_tpu as nav
    from navdv_tpu.agent import init_state, make_navigate_batch, make_statics
    from navdv_tpu.config import baseline_fam_impl
    from navdv_tpu.metrics import success_rate
    from navdv_tpu.utils.profiling import top_hlo_ops, trace

    cfg, landscape, route, pts, headings = bench._setup(config_n)
    lib = nav.train_library(landscape, route, cfg)
    st = make_statics(landscape, lib, route)
    rng = np.random.default_rng(0)
    batch = bench.SPEC_BATCH[config_n]
    starts = pts[0][None, :] + rng.normal(0, 1.5, size=(batch, 2))
    thetas = headings[0] + rng.normal(0, 0.15, size=(batch,))
    states0 = init_state(starts, thetas)

    nav_fn = make_navigate_batch(cfg, fam_impl=baseline_fam_impl(config_n))
    final, _ = nav_fn(states0, st)
    print("recall", float(success_rate(final)))  # warm + sync

    logdir = f"/tmp/navdv_prof_c{config_n}"
    with trace(logdir):
        final, _ = nav_fn(states0, st)
        float(success_rate(final))  # host pull: the only trustworthy sync

    total = 0.0
    for row in top_hlo_ops(logdir, n=25, divisor=cfg.agent.max_steps):
        total += row["self_us"]
        print(f"{row['self_us']:9.1f} us/step  {row['bound_by'] or '?':12s} {row['op'][:95]}")
    print(f"top-25 sum: {total:.0f} us/step over {cfg.agent.max_steps} steps")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 3)
