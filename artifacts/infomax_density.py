"""Library-density law for the LEARNED memory (fam_impl="infomax").

For the perfect-memory paths, denser capture costs throughput and HBM
proportionally to Nl (the measured 1/Nl envelope, biglib_ext.jsonl); the
Infomax model's step cost and memory are CONSTANT in Nl. This measures the
other side of that trade: closed-loop recall vs capture density for both
models at two trial-noise levels, same world/route/trials (model property,
hardware-independent: runs on CPU). Workload: the BASELINE config-1 world
(512^2 blobs, route 40 px, P=1152 bench sensor), B=64.

Usage: python artifacts/infomax_density.py <pos_sigma> <heading_sigma>
       (run twice: 1.5 0.15 — the bench trial noise — and 2.5 0.25)
Appends to artifacts/infomax_density.jsonl.
"""

import dataclasses
import json
import sys
import warnings

sys.path.insert(0, ".")
warnings.filterwarnings("ignore")

import numpy as np


def main():
    pos_sigma = float(sys.argv[1]) if len(sys.argv) > 1 else 1.5
    heading_sigma = float(sys.argv[2]) if len(sys.argv) > 2 else 0.15

    import navdv_tpu as nav
    from bench import _setup
    from navdv_tpu import oracle
    from navdv_tpu.agent import init_state, make_navigate_batch, make_statics
    from navdv_tpu.metrics import success_rate

    cfg0, landscape, route, _, _ = _setup(1, None, 40.0, None)
    B = 64
    with open("artifacts/infomax_density.jsonl", "a") as out:
        for spacing in (1.6, 0.8, 0.4, 0.2):
            # fresh seed per spacing: identical trial draws across densities,
            # so the cross-density trend is paired like the within-row
            # impl comparison already was
            rng = np.random.default_rng(0)
            cfg = dataclasses.replace(cfg0, capture_spacing=spacing)
            lib = nav.train_library(landscape, route, cfg)
            st = make_statics(landscape, lib, route)
            pts, headings = oracle.resample_route(route, spacing)
            starts = pts[0][None] + rng.normal(0, pos_sigma, (B, 2))
            thetas = headings[0] + rng.normal(0, heading_sigma, (B,))
            s0 = init_state(starts, thetas)
            row = {"spacing": spacing, "views": int(lib.flat.shape[0]),
                   "pos_sigma": pos_sigma, "heading_sigma": heading_sigma,
                   "auto": "v2"}  # epochs = ceil(0.8*P*spacing); untagged
                                  # rows were AUTO v1 (flat 40*P total)
            for impl in ("jnp", "infomax"):
                run = make_navigate_batch(cfg, fam_impl=impl)
                aux = run.prepare(st) if run.prepare is not None else None
                args = (s0, st) if aux is None else (s0, st, aux)
                final, _ = run(*args)
                row[f"success_{impl}"] = round(float(success_rate(final)), 3)
            print(json.dumps(row), flush=True)
            out.write(json.dumps(row) + "\n")
            out.flush()


if __name__ == "__main__":
    main()
