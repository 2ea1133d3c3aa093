"""Measure the sweep shape-bucketing compile-reuse win on the real TPU.

Runs the same 6-cell capture-spacing sweep (config-1-like sensor/scan, blobs
world) under lib_bucket=0 (one traced program per cell) vs lib_bucket=64
(capture renders AND navigate fns share bucketed shapes -> compilations are
reused across cells). Each variant runs in its OWN process — in-process
program caches would otherwise let the second variant inherit the first's
compilations and confound the comparison (this bit round 4's first attempt).

Usage:
  python artifacts/bucket_sweep_bench.py            # driver: both variants
  python artifacts/bucket_sweep_bench.py --variant 0|64 --out f.json
"""

import json
import subprocess
import sys
import time

sys.path.insert(0, ".")

SPACINGS = (0.7, 0.9, 1.1, 1.4, 1.7, 2.0)


def run(lib_bucket: int, out_dir: str) -> dict:
    from bench import _world
    from navdv_tpu.sweep import SweepSpec, run_sweep

    landscape, route = _world(40.0)
    spec = SweepSpec(
        sensor_px=((72, 16, 5),),
        scan_granularity=((60, 2),),
        capture_spacing=SPACINGS,
        n_trials=256,
        max_steps=384,
        lib_bucket=lib_bucket,
    )
    t0 = time.perf_counter()
    res = run_sweep(landscape, route, spec, out_dir, verbose=True,
                    tensorboard=False)
    wall = time.perf_counter() - t0
    return {
        "lib_bucket": lib_bucket,
        "total_wall_s": round(wall, 2),
        "cells": {
            k: {
                "warmup_s": round(float(v["warmup_s"]), 3),
                "success_rate": round(float(v["success_rate"]), 4),
                "n_views": int(v["n_library_views"]),
                "n_padded": int(v["n_library_padded"]),
                "steps_per_s": round(float(v["agent_steps_per_s"])),
                "fam_impl": str(v["fam_impl"]),
            }
            for k, v in res.items()
        },
    }


def main():
    if "--variant" in sys.argv:
        bucket = int(sys.argv[sys.argv.index("--variant") + 1])
        out = sys.argv[sys.argv.index("--out") + 1]
        import tempfile

        with tempfile.TemporaryDirectory() as td:
            r = run(bucket, f"{td}/cells")
        with open(out, "w") as f:
            json.dump(r, f)
        return

    out_path = sys.argv[1] if len(sys.argv) > 1 else "artifacts/bucket_sweep.jsonl"
    results = []
    for bucket in (0, 64):
        tmp = f"/tmp/bucket_variant_{bucket}.json"
        subprocess.run(
            [sys.executable, __file__, "--variant", str(bucket), "--out", tmp],
            check=True,
        )
        with open(tmp) as f:
            results.append(json.load(f))
    plain, bucketed = results
    for k in plain["cells"]:
        a = plain["cells"][k]["success_rate"]
        b = bucketed["cells"][k]["success_rate"]
        assert a == b, (k, a, b)
    plain["recall_identical_to_bucketed"] = True
    bucketed["recall_identical_to_plain"] = True
    with open(out_path, "w") as f:
        f.write(json.dumps(plain) + "\n")
        f.write(json.dumps(bucketed) + "\n")
    speedup = plain["total_wall_s"] / bucketed["total_wall_s"]
    print(f"\nplain   : {plain['total_wall_s']:.1f} s")
    print(f"bucketed: {bucketed['total_wall_s']:.1f} s  ({speedup:.2f}x)")
    for name, r in (("plain", plain), ("bucketed", bucketed)):
        warm = ["%.1f" % c["warmup_s"] for c in r["cells"].values()]
        print(f"warmups {name}: {warm}")


if __name__ == "__main__":
    main()
