"""RIDF shape: perfect memory vs the learned Infomax memory, same pose.

One figure contrasting the two memory MODELS' rotation functions at a
mid-route capture pose on the bench world (blobs seed 7, margin-60 sine
route): perfect memory's min-over-library SSD valley vs the Infomax
network's novelty readout (SEMANTICS.md §9). Curves are min-max normalized
per model (the units differ); the diagnostic content is the valley's
position, depth, and width — the literature's explanation for why the
learned memory generalizes differently across pose perturbation
(artifacts/RESULTS.md route-shape regime sections).

Runs anywhere: python artifacts/ridf_models.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

OUTDIR = os.path.dirname(os.path.abspath(__file__))


def main():
    import jax.numpy as jnp
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    import navdv_tpu as nav
    from navdv_tpu import oracle
    from navdv_tpu.analysis import ridf

    cfg = nav.SimConfig()
    landscape = jnp.asarray(nav.make_landscape("blobs", size=(512, 512), seed=7))
    route = nav.make_route("sine", size=(512, 512), margin=60.0, length=200.0)
    lib = nav.train_library(landscape, route, cfg)
    pts, headings = oracle.resample_route(route, cfg.capture_spacing)
    i = len(pts) // 2

    fig, ax = plt.subplots(figsize=(7, 3.5))
    for impl, style in (("jnp", "C0-"), ("infomax", "C3-")):
        angles, fam = ridf(landscape, lib, pts[i], headings[i], cfg,
                           fam_impl=impl)
        lo, hi = float(np.min(fam)), float(np.max(fam))
        ax.plot(np.degrees(angles), (fam - lo) / max(hi - lo, 1e-30), style,
                lw=1.3, label="perfect memory (min SSD)" if impl == "jnp"
                else "Infomax novelty (learned)")
    ax.axvline(0.0, color="k", lw=0.6, ls=":")
    ax.set_xlabel("rotation (deg)")
    ax.set_ylabel("normalized response")
    ax.set_title(f"RIDF at capture pose {i}: memory models compared")
    ax.legend(loc="upper right")
    out = os.path.join(OUTDIR, "ridf_models.png")
    fig.savefig(out, dpi=110, bbox_inches="tight")
    print("wrote", out)


if __name__ == "__main__":
    main()
