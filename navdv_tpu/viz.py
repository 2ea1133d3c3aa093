"""L5: visualization (SURVEY.md §1 L5, §2.1 visualization row) — trajectory
plots over the landscape, familiarity traces, and episode animations. All
host-side matplotlib on NumPy copies of the device records."""

from __future__ import annotations

import numpy as np

import matplotlib

matplotlib.use("Agg")  # headless
import matplotlib.pyplot as plt
from matplotlib import animation


def _active_slice(rec) -> np.ndarray:
    """Steps actually taken (rec.done is pre-step done)."""
    done = np.asarray(rec.done)
    return ~done


def plot_trajectory(landscape, route, rec, path: str, title: str = "") -> str:
    """Recalled trajectory (single episode or a batch) over the landscape."""
    fig, ax = plt.subplots(figsize=(7, 7))
    land = np.asarray(landscape)
    ax.imshow(land, cmap="gray", origin="lower", extent=(-0.5, land.shape[1] - 0.5, -0.5, land.shape[0] - 0.5))
    route = np.asarray(route)
    ax.plot(route[:, 0], route[:, 1], "c-", lw=2, label="training route")
    xy = np.asarray(rec.xy)
    act = _active_slice(rec)
    if xy.ndim == 2:  # single episode [T, 2]
        ax.plot(xy[act, 0], xy[act, 1], "r.-", ms=3, lw=1, label="recall")
    else:  # batch [B, T, 2]
        for b in range(min(xy.shape[0], 64)):
            a = act[b]
            ax.plot(xy[b, a, 0], xy[b, a, 1], "-", lw=0.7, alpha=0.5)
        ax.plot([], [], "r-", label="recall trials")
    ax.legend(loc="upper right")
    ax.set_title(title or "route recall")
    fig.savefig(path, dpi=110, bbox_inches="tight")
    plt.close(fig)
    return path


def plot_familiarity_trace(rec, path: str) -> str:
    """Per-step selected familiarity (lower = more familiar)."""
    fig, ax = plt.subplots(figsize=(8, 3))
    fam = np.asarray(rec.fam)
    act = _active_slice(rec)
    if fam.ndim == 1:
        ax.plot(np.where(act)[0], fam[act], "b-")
    else:
        for b in range(min(fam.shape[0], 32)):
            a = act[b]
            ax.plot(np.where(a)[0], fam[b, a], "-", lw=0.7, alpha=0.5)
    ax.set_xlabel("step")
    ax.set_ylabel("min distance")
    ax.set_title("familiarity trace")
    fig.savefig(path, dpi=110, bbox_inches="tight")
    plt.close(fig)
    return path


def _axis_sort_key(v: str):
    """Numeric-aware ordering for sweep axis labels: plain numbers sort by
    value ("0.5" < "2.0" < "10.0") and structured labels by their embedded
    numbers ("18x4u20" < "72x16u5" < "360x64u1") — lexicographic string sort
    scrambles exactly the monotone parameter trend the heatmap exists to
    show."""
    import re

    try:
        return (0, (float(v),), "")
    except ValueError:
        return (1, tuple(float(n) for n in re.findall(r"-?\d+\.?\d*", v)), v)


def plot_sweep_heatmap(results: dict, axis_x: str, axis_y: str, path: str) -> str:
    """Success-rate heatmap over two sweep axes.

    ``axis_x`` / ``axis_y`` name SweepSpec axes ("px", "scan", "spacing");
    their values come from the structured ``ax_<axis>`` entries each cell's
    results carry (sweep.run_sweep), never from parsing cell-key strings.
    Cells sharing an (x, y) value pair (a third swept axis) keep the last one
    seen."""
    rows = {}
    for key, res in results.items():
        try:
            y = str(np.asarray(res[f"ax_{axis_y}"]))
            x = str(np.asarray(res[f"ax_{axis_x}"]))
        except KeyError as e:
            raise KeyError(
                f"cell {key!r} has no structured axis entry {e.args[0]!r} — "
                "re-run the sweep (older result files predate ax_* metadata)"
            ) from None
        rows[(y, x)] = float(res["success_rate"])
    ys = sorted({k[0] for k in rows}, key=_axis_sort_key)
    xs = sorted({k[1] for k in rows}, key=_axis_sort_key)
    mat = np.full((len(ys), len(xs)), np.nan)
    for (y, x), v in rows.items():
        mat[ys.index(y), xs.index(x)] = v
    fig, ax = plt.subplots(figsize=(1.2 * len(xs) + 2, 1.0 * len(ys) + 2))
    im = ax.imshow(mat, vmin=0, vmax=1, cmap="viridis")
    ax.set_xticks(range(len(xs)), xs)
    ax.set_yticks(range(len(ys)), ys)
    ax.set_xlabel(axis_x)
    ax.set_ylabel(axis_y)
    fig.colorbar(im, label="success rate")
    fig.savefig(path, dpi=110, bbox_inches="tight")
    plt.close(fig)
    return path


def plot_ridf(angles, fam, path: str, title: str = "") -> str:
    """RIDF curve(s): familiarity vs rotation (``analysis.ridf`` output).

    ``fam`` is ``[Nh]`` or ``[B, Nh]``; the x axis is degrees, centered."""
    fig, ax = plt.subplots(figsize=(7, 3.5))
    deg = np.degrees(np.asarray(angles))
    fam = np.asarray(fam)
    shown = 1 if fam.ndim == 1 else min(fam.shape[0], 32)
    for row in fam[None, :] if fam.ndim == 1 else fam[:shown]:
        ax.plot(deg, row, "-", lw=1.2, alpha=0.9 if fam.ndim == 1 else 0.5)
    ax.axvline(0.0, color="k", lw=0.6, ls=":")
    ax.set_xlabel("rotation (deg)")
    ax.set_ylabel("min distance")
    base = title or "rotational image difference function"
    if fam.ndim == 2 and fam.shape[0] > shown:
        base += f" (showing {shown} of {fam.shape[0]} poses)"
    ax.set_title(base)
    fig.savefig(path, dpi=110, bbox_inches="tight")
    plt.close(fig)
    return path


def plot_familiarity_map(
    landscape, route, fmap: dict, path: str, *, quiver: bool = True,
    captured=None, title: str = ""
) -> str:
    """Catchment-area figure: best familiarity over the position grid
    (``analysis.familiarity_map`` output), the training route, optionally
    the preferred-heading vector field and the ``analysis.catchment``
    boundary (``captured`` mask, drawn as a red contour)."""
    fig, ax = plt.subplots(figsize=(7.5, 7))
    land = np.asarray(landscape)
    ax.imshow(land, cmap="gray", origin="lower",
              extent=(-0.5, land.shape[1] - 0.5, -0.5, land.shape[0] - 0.5), alpha=0.45)
    x, y, fam = fmap["x"], fmap["y"], fmap["fam"]
    # grid coordinates are CELL CENTERS; imshow extent takes edges, so pad
    # by half a stride or the heat layer lands half a cell off the
    # quiver/contour/route overlays
    dx = float(x[1] - x[0]) if len(x) > 1 else 1.0
    dy = float(y[1] - y[0]) if len(y) > 1 else 1.0
    # robust scale: isolated unfamiliarity spikes (e.g. positions on top of
    # features) would otherwise flatten the route-proximal gradient
    im = ax.imshow(
        fam, cmap="viridis_r", origin="lower", alpha=0.75,
        extent=(x[0] - dx / 2, x[-1] + dx / 2, y[0] - dy / 2, y[-1] + dy / 2),
        vmin=float(np.min(fam)), vmax=float(np.percentile(fam, 95.0)),
    )
    fig.colorbar(im, label="best familiarity (min distance)")
    if quiver:
        th = fmap["best_heading"]
        s = max(1, min(len(x), len(y)) // 24)  # ≤ ~24 arrows per axis
        gx, gy = np.meshgrid(x[::s], y[::s])
        ax.quiver(gx, gy, np.cos(th[::s, ::s]), np.sin(th[::s, ::s]),
                  color="w", scale=40, width=0.0025, alpha=0.85)
    if captured is not None:
        ax.contour(x, y, np.asarray(captured).astype(float), levels=[0.5],
                   colors="r", linewidths=1.2)
        ax.plot([], [], "r-", lw=1.2, label="catchment boundary")
    route = np.asarray(route)
    ax.plot(route[:, 0], route[:, 1], "c-", lw=2, label="training route")
    ax.legend(loc="upper right")
    ax.set_title(title or "familiarity map (catchment area)")
    fig.savefig(path, dpi=110, bbox_inches="tight")
    plt.close(fig)
    return path


def animate_episode(landscape, route, rec, path: str, fps: int = 20) -> str:
    """Movie of one recall episode (SURVEY.md §1 L5 'movies')."""
    land = np.asarray(landscape)
    route = np.asarray(route)
    xy = np.asarray(rec.xy)
    if xy.ndim == 3:
        # boolean-masking a [B, T, 2] batch would silently splice every
        # agent's steps into one teleporting fake trajectory
        raise ValueError(
            f"animate_episode wants ONE episode (xy [T, 2]); got a batched "
            f"record {xy.shape} — slice one out, e.g. "
            f"jax.tree.map(lambda x: x[0], rec)"
        )
    theta = np.asarray(rec.theta)
    act = _active_slice(rec)
    xy, theta = xy[act], theta[act]

    fig, ax = plt.subplots(figsize=(6, 6))
    ax.imshow(land, cmap="gray", origin="lower", extent=(-0.5, land.shape[1] - 0.5, -0.5, land.shape[0] - 0.5))
    ax.plot(route[:, 0], route[:, 1], "c-", lw=2)
    (trail,) = ax.plot([], [], "r-", lw=1)
    (head,) = ax.plot([], [], "ro", ms=5)
    arrow = ax.annotate(
        "", xy=(0, 0), xytext=(0, 0), arrowprops=dict(arrowstyle="->", color="y")
    )

    def update(i):
        trail.set_data(xy[: i + 1, 0], xy[: i + 1, 1])
        head.set_data([xy[i, 0]], [xy[i, 1]])
        arrow.set_position((xy[i, 0], xy[i, 1]))
        arrow.xy = (xy[i, 0] + 8 * np.cos(theta[i]), xy[i, 1] + 8 * np.sin(theta[i]))
        return trail, head

    ani = animation.FuncAnimation(fig, update, frames=len(xy), interval=1000 / fps)
    try:
        ani.save(path, writer="ffmpeg", fps=fps)
    except Exception:
        path = path.rsplit(".", 1)[0] + ".gif"
        ani.save(path, writer="pillow", fps=fps)
    plt.close(fig)
    return path
