"""NCC small-sensor impl ordering (ADVICE r4, config.choose_fam_impl).

Round 4 measured small SSD sensors (n_pixels < 512) running fastest on the
exact extract-then-matmul "jnp" path — the extraction-free paths pay the
full fine-azimuth circle for tiny views. ADVICE r4 asked the same question
for NCC: this measures jnp vs fft closed-loop throughput + recall at two
small NCC sensors (18x4 u=20 and 72x16 u=5, both on the round-4 probe
shapes) with bench.py's chained-window timing discipline. Run on the real
TPU chip:

    python artifacts/ncc_small_sensor.py

Appends one JSON line per (sensor, impl) to artifacts/ncc_small_sensor.jsonl.
"""

import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "ncc_small_sensor.jsonl")


def main():
    import jax

    import navdv_tpu as nav
    from bench import _timed_windows, _world
    from navdv_tpu import oracle
    from navdv_tpu.agent import init_state, make_navigate_batch, make_statics
    from navdv_tpu.config import ScanConfig, SensorConfig, SimConfig

    sensors = [
        ("18x4u20", SensorConfig(n_azimuth=18, n_radial=4, az_upsample=20,
                                 hat_dtype="bfloat16")),
        ("72x16u5", SensorConfig(n_azimuth=72, n_radial=16, az_upsample=5,
                                 hat_dtype="bfloat16")),
    ]
    batch = 1024
    landscape, route = _world(route_length=40.0)
    for name, sensor in sensors:
        cfg = SimConfig(
            sensor=sensor,
            scan=ScanConfig(n_headings=60, scan_step_bins=2, metric="ncc",
                            tol_bins=3),
            capture_spacing=1.0,
        )
        arc = float(np.hypot(*np.diff(route, axis=0).T).sum())
        steps = int(arc / cfg.agent.step_size * 1.3)
        cfg = dataclasses.replace(
            cfg, agent=dataclasses.replace(cfg.agent, max_steps=steps))
        lib = nav.train_library(landscape, route, cfg)
        st = make_statics(landscape, lib, route)
        pts, headings = oracle.resample_route(route, cfg.capture_spacing)
        rng = np.random.default_rng(0)
        starts = pts[0][None] + rng.normal(0, 1.5, (batch, 2))
        thetas = headings[0] + rng.normal(0, 0.15, (batch,))
        s0 = init_state(starts, thetas)
        for impl in ("jnp", "fft"):
            nav_fn = make_navigate_batch(cfg, fam_impl=impl)
            rate, times, chain = _timed_windows(
                nav_fn, s0, st, repeats=3, min_window_s=0.5)
            dt = min(times)
            row = {
                "metric": "ncc_small_sensor",
                "sensor": name,
                "n_pixels": cfg.sensor.n_pixels,
                "impl": impl,
                "batch": batch,
                "max_steps": steps,
                "library_views": int(lib.views.shape[0]),
                "steps_per_s": round(batch * steps / dt, 1),
                "success_rate": round(rate, 4),
                "wall_s": round(dt * chain, 4),
                "chain": chain,
                "device": str(jax.devices()[0].platform),
            }
            with open(OUT, "a") as f:
                f.write(json.dumps(row) + "\n")
            print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
