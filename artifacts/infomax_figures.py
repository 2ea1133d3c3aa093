"""Figures for the Infomax training-budget findings (RESULTS.md).

Three PNGs from the committed measurements:
  - infomax_dose_response.png: closed-loop recall vs training dose in
    updates per ARC-PIXEL (x = total updates / P / arc_px) for three
    workloads — the optima align near 0.8-1.0/px, the AUTO v2 rule.
  - infomax_density.png: recall vs library density (bench trial noise,
    AUTO v2 rows of infomax_density.jsonl) — perfect memory flat at
    ceiling, learned memory declining.
  - infomax_noise.png: the round-5 mitigation sweep by route regime
    (infomax_noise.jsonl) — straight-route collapse unrescued, curved-route
    units<P win.

Data points are the measured values recorded in artifacts/RESULTS.md and
infomax_density.jsonl (B=64-256 trials per point; ±4-6pp binomial s.e.).
"""

import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

SURFACE = "#fcfcfb"
TEXT = "#0b0b0b"
TEXT2 = "#52514e"
S1, S2, S3 = "#2a78d6", "#eb6834", "#1baf7a"  # fixed categorical order


def _style(ax):
    ax.set_facecolor(SURFACE)
    for s in ("top", "right"):
        ax.spines[s].set_visible(False)
    for s in ("left", "bottom"):
        ax.spines[s].set_color(TEXT2)
    ax.tick_params(colors=TEXT2, labelsize=9)
    ax.grid(True, axis="y", color="#e5e4e0", lw=0.6)
    ax.set_axisbelow(True)


def dose_response(path):
    # (updates per arc-pixel, recall) per workload; arcs: 51.4 / 25.7 / 40 px
    config1 = [(0.39, 0.61), (0.78, 0.922), (1.17, 0.906), (1.95, 0.922)]
    biglib = [(0.40, 0.531), (0.54, 0.934), (0.68, 0.988), (0.78, 0.992),
              (0.95, 0.973), (1.11, 0.922), (1.35, 0.527), (1.59, 0.148),
              (3.12, 0.156)]
    noise128 = [(0.5, 0.812), (1.0, 0.875), (2.0, 0.625)]
    fig, ax = plt.subplots(figsize=(6.4, 4.0), dpi=150)
    fig.patch.set_facecolor(SURFACE)
    _style(ax)
    for pts, c, label in ((config1, S1, "config-1 world (arc 51 px)"),
                          (biglib, S2, "biglib 1000-view cell (arc 26 px)"),
                          (noise128, S3, "128² noise world (arc 40 px)")):
        xs, ys = zip(*pts)
        ax.plot(xs, ys, "-o", color=c, lw=2, ms=5, label=label)
    ax.axvspan(0.78, 1.0, color="#e5e4e0", alpha=0.6, zorder=0)
    ax.text(0.88, 0.35, "measured optima\n0.78–1.0 / px", ha="center",
            fontsize=8, color=TEXT2)
    ax.set_xscale("log")
    ax.set_xlabel("training dose: total updates / P / arc-pixel (log)",
                  color=TEXT)
    ax.set_ylabel("closed-loop recall", color=TEXT)
    ax.set_title("Infomax dose–response: the optimum is per arc-pixel "
                 "(AUTO v2 rule)", color=TEXT, fontsize=10)
    ax.legend(frameon=False, fontsize=8, loc="lower left",
              labelcolor=TEXT2)
    ax.set_ylim(0, 1.05)
    fig.tight_layout()
    fig.savefig(path, facecolor=SURFACE)
    plt.close(fig)


def density(path):
    views = [33, 65, 129, 258]
    jnp = [0.969, 1.0, 1.0, 1.0]
    info = [0.875, 0.703, 0.719, 0.25]
    fig, ax = plt.subplots(figsize=(6.4, 4.0), dpi=150)
    fig.patch.set_facecolor(SURFACE)
    _style(ax)
    ax.plot(views, jnp, "-o", color=S1, lw=2, ms=5,
            label="perfect memory (jnp)")
    ax.plot(views, info, "-o", color=S2, lw=2, ms=5,
            label="learned memory (infomax, AUTO v2)")
    ax.text(views[-1], jnp[-1] + 0.03, "1.00", ha="center", fontsize=8,
            color=TEXT2)
    ax.text(views[-1], info[-1] - 0.07, "0.25", ha="center", fontsize=8,
            color=TEXT2)
    from matplotlib.ticker import NullFormatter, NullLocator

    ax.set_xscale("log")
    ax.set_xticks(views, [str(v) for v in views])
    ax.xaxis.set_minor_locator(NullLocator())
    ax.xaxis.set_minor_formatter(NullFormatter())
    ax.set_xlabel("library views (same route; denser capture →)", color=TEXT)
    ax.set_ylabel("closed-loop recall", color=TEXT)
    ax.set_title("Density-law inversion: recall of the learned memory\n"
                 "declines with capture density (bench trial noise)",
                 color=TEXT, fontsize=10)
    ax.legend(frameon=False, fontsize=8, loc="lower left", labelcolor=TEXT2)
    ax.set_ylim(0, 1.05)
    fig.tight_layout()
    fig.savefig(path, facecolor=SURFACE)
    plt.close(fig)




def noise_mitigations(path):
    """Round-5 mitigation sweep (infomax_noise.jsonl): per-variant recall on
    the two route regimes through the same 512^2 noise world."""
    import json
    import os

    import numpy as np

    src = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "infomax_noise.jsonl")
    rows = [json.loads(l) for l in open(src)]
    regimes = {}
    refs = {}
    for r in rows:
        route = r.get("route", "sine")
        if r["variant"] == "jnp_reference":
            refs[route] = r["recall"]
        elif "seed" in r:
            regimes.setdefault(route, {}).setdefault(
                r["variant"], []).append(r["recall"])

    fig, axes = plt.subplots(1, 2, figsize=(9.2, 4.2), dpi=150, sharex=True)
    fig.patch.set_facecolor(SURFACE)
    titles = {"line": "straight route (61 views, one heading)",
              "sine": "curved route (78 views, heading-diverse)"}
    for ax, route in zip(axes, ("line", "sine")):
        _style(ax)
        ax.grid(True, axis="x", color="#e5e4e0", lw=0.6)
        ax.grid(False, axis="y")
        var_means = {v: float(np.mean(rs))
                     for v, rs in regimes[route].items()}
        order = sorted(var_means, key=var_means.get)
        ys = np.arange(len(order))
        vals = [var_means[v] for v in order]
        colors = [S2 if v == "base" else S1 for v in order]
        ax.barh(ys, vals, height=0.62, color=colors, zorder=2)
        for y, v in zip(ys, vals):
            ax.text(v + 0.015, y, f"{v:.2f}", va="center", fontsize=8,
                    color=TEXT2, zorder=3)
        ax.axvline(refs[route], color=TEXT2, lw=1.4, ls="--", zorder=1)
        ax.text(refs[route] - 0.02, -0.62,
                f"perfect memory {refs[route]:.2f}", fontsize=8,
                color=TEXT2, ha="right")
        ax.set_ylim(-0.9, len(order) - 0.4)
        ax.set_yticks(ys, order, fontsize=8.5)
        ax.set_xlim(0, 1.12)
        ax.set_title(titles[route], fontsize=10, color=TEXT)
        ax.set_xlabel("closed-loop recall (B=64, mean over seeds)",
                      color=TEXT, fontsize=9)
    axes[0].text(0.98, 0.18, "no mitigation rescues\nthe collapse",
                 transform=axes[0].transAxes, ha="right", fontsize=8.5,
                 color=TEXT2)
    fig.suptitle("Learned memory on a noise world: mitigations by route "
                 "regime (orange = production trainer)",
                 fontsize=11, color=TEXT)
    fig.tight_layout(rect=(0, 0, 1, 0.94))
    fig.savefig(path, facecolor=SURFACE)
    print("wrote", path)


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "artifacts"
    dose_response(f"{out}/infomax_dose_response.png")
    density(f"{out}/infomax_density.png")
    noise_mitigations(f"{out}/infomax_noise.png")
    print("wrote figures")
