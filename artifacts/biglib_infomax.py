"""Learned memory past the perfect-memory wall: infomax at 16k-128k views.

artifacts/biglib_ext.jsonl measured the perfect-memory single-chip wall:
the roll path OOMs between 48k and 64k views (aux ~ Nl), fft's spectra
break the remote compiler from 32k. The Infomax model's memory is
O(units x pixels) -- CONSTANT in Nl -- so it should carry the same workload
(same world/route/scan as biglib_ext attempt 2) past that wall at flat
throughput. This script measures it on the real TPU chip.

Usage: python artifacts/biglib_infomax.py [views ...]
       (default: 16000 32000 64000 128000)
"""

import json
import os
import sys

sys.path.insert(0, ".")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from biglib_ext import run_one  # same workload harness, different impl


def main():
    views_list = [int(v) for v in sys.argv[1:]] or [16000, 32000, 64000, 128000]
    out = "artifacts/biglib_infomax.jsonl"
    with open(out, "a") as f:
        for views in views_list:
            try:
                r = run_one(views, "infomax")
            except Exception as e:  # record the wall, don't die
                r = {"views": views, "impl": "infomax",
                     "error": f"{type(e).__name__}: {str(e)[:300]}"}
            print(json.dumps(r), flush=True)
            f.write(json.dumps(r) + "\n")
            f.flush()


if __name__ == "__main__":
    main()
