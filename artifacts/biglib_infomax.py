"""Learned memory past the perfect-memory wall: infomax at 16k-128k views.

artifacts/biglib_ext.jsonl measured the perfect-memory single-chip wall:
the roll path OOMs between 48k and 64k views (aux ~ Nl), fft's spectra
break the remote compiler from 32k. The Infomax model's memory is
O(units x pixels) -- CONSTANT in Nl -- so it should carry the same workload
(same world/route/scan as biglib_ext attempt 2) past that wall at flat
throughput. This measures it on the real TPU chip.

Each cell runs TWO training variants, because of the measured density-law
inversion (artifacts/infomax_density.jsonl: near-duplicate training views
shrink the learned model's noise margin):
  - dense:  trained on the full Nl-view library (AUTO epochs);
  - sparse: trained on a strided subsample at ~1 px effective spacing (the
    density the model prefers; infomax_density.jsonl), same per-arc-pixel
    dose; the recall episode and throughput measurement are identical.

Usage: python artifacts/biglib_infomax.py [views ...]
       (default: 16000 32000 64000 128000)
"""

import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def run_one(views: int, train_stride: int) -> dict:
    import dataclasses

    import jax

    from bench import _world, _timed_windows
    from navdv_tpu import oracle, train_library
    from navdv_tpu.agent import init_state, make_navigate_batch, make_statics
    from navdv_tpu.config import AgentConfig, ScanConfig, SensorConfig, SimConfig
    from navdv_tpu.familiarity_infomax import auto_epochs, train_infomax
    from navdv_tpu.metrics import success_rate

    # same workload as biglib_ext attempt 2 (keep this block in lockstep
    # with biglib_ext.run_one — cross-artifact comparability depends on it):
    # route capped at the 8000-view envelope's 160 px so the library
    # densifies on a solvable task
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

    nav_fn = make_navigate_batch(cfg, fam_impl="infomax")
    p = cfg.sensor.n_pixels
    t0 = time.perf_counter()
    if train_stride > 1:
        sub = jax.tree.map(lambda x: x[::train_stride], lib)
        n_eff = int(sub.z.shape[0])
        # same per-arc-pixel dose as the dense variant (AUTO v2 rule): the
        # comparison isolates training-set diversity, not budget
        eff_spacing = cfg.capture_spacing * train_stride
        aux = train_infomax(sub, n_units=p, eta=cfg.scan.infomax_eta,
                            epochs=auto_epochs(n_eff, p, eff_spacing), seed=0)
    else:
        n_eff = int(lib.z.shape[0])
        aux = nav_fn.prepare(st)
    aux = jax.block_until_ready(aux)
    prep_s = time.perf_counter() - t0
    aux_mb = sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(aux)) / 1e6
    rate, times, chain = _timed_windows(nav_fn, states0, st, repeats=2,
                                        min_window_s=0.5, aux=aux)
    dt = min(times)
    return {
        "views": int(lib.views.shape[0]),
        "impl": "infomax",
        "train_stride": train_stride,
        "train_views_eff": n_eff,
        "steps_s": round(batch * cfg.agent.max_steps / dt, 1),
        "recall": round(rate, 4),
        "batch": batch,
        "max_steps": cfg.agent.max_steps,
        "train_s": round(train_s, 1),
        "prepare_s": round(prep_s, 3),
        "aux_mb": round(aux_mb, 1),
        "route_length": route_length,
        "landscape": f"blobs-{size}x{size}",
        "chain": chain,
    }


def main():
    views_list = [int(v) for v in sys.argv[1:]] or [16000, 32000, 64000, 128000]
    out = "artifacts/biglib_infomax.jsonl"
    with open(out, "a") as f:
        for views in views_list:
            # sparse stride targets ~1 px effective spacing on the 160-px arc
            for stride in sorted({1, max(1, round(views / 160.0))}):
                try:
                    r = run_one(views, stride)
                except Exception as e:  # record the wall, don't die
                    r = {"views": views, "impl": "infomax", "train_stride": stride,
                         "error": f"{type(e).__name__}: {str(e)[:300]}"}
                print(json.dumps(r), flush=True)
                f.write(json.dumps(r) + "\n")
                f.flush()


if __name__ == "__main__":
    main()
