"""L5 analysis: RIDF curves and spatial familiarity maps (catchment areas).

The scene-familiarity literature's two standard diagnostics (SURVEY.md §1
L5, §0.2 [LIT] — Zeil et al. 2003 "Catchment areas of panoramic snapshots
in outdoor scenes"; Baddeley et al. 2012):

- **RIDF** (rotational image difference function): image distance vs
  rotation at a fixed pose. Its valley depth/width IS the navigable signal
  the per-step heading scan exploits; a flat RIDF predicts recall failure
  (the "flat valley" worlds measured in artifacts/RESULTS.md).
- **Familiarity map / catchment area**: best-over-headings familiarity and
  the preferred absolute heading on a position grid around the route — the
  region whose familiarity gradient leads back to the route is the
  snapshot's catchment area.

Both probe the EXACT production familiarity stage
(:func:`navdv_tpu.agent.make_step_batched`'s ``step.fam`` — renderer, lag
dedup, metric, RIDF pooling, precision knobs), so what is plotted is what
the agent computes, for every ``fam_impl`` including the learned infomax
memory. For a library sharded over a mesh axis, build the probe with
``make_familiarity_probe(cfg, fam_impl, lib_axis=...)`` and call it under
``shard_map`` (the per-shard minima then ``pmin`` exactly as in the
production step); the ``ridf``/``familiarity_map`` convenience wrappers
below are single-device. The map is one giant
batched familiarity evaluation — grid cells play the role of agents, i.e.
the bench hot path at B = grid size; on TPU a 10⁴-position map is a few
episode-steps' worth of work.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from navdv_tpu.agent import EpisodeStatics, init_state, make_statics, make_step_batched
from navdv_tpu.config import SimConfig
from navdv_tpu.familiarity import LibraryPack
from navdv_tpu.sensor import scan_shift_sets

__all__ = [
    "full_circle_scan",
    "make_familiarity_probe",
    "ridf",
    "familiarity_map",
    "catchment",
    "heading_error",
]


def full_circle_scan(cfg: SimConfig) -> SimConfig:
    """``cfg`` with the heading scan widened to the full azimuth circle.

    One candidate per fine bin (``n_headings = n_fine``, ``scan_step_bins =
    1``) and no RIDF tolerance pooling — the full-circle scan is itself the
    rotation function, so pooling would only blur it. Metric and precision
    knobs are preserved.
    """
    scan = dataclasses.replace(
        cfg.scan,
        n_headings=cfg.sensor.n_fine,
        scan_step_bins=1,
        tol_bins=0,
    )
    return dataclasses.replace(cfg, scan=scan)


def make_familiarity_probe(
    cfg: SimConfig, fam_impl: str = "auto", lib_axis: str | None = None
):
    """Batched familiarity probe over the production pipeline.

    Returns ``probe(xy[B, 2], theta[B], st, aux=None) -> fam[B, Nh]`` (jitted)
    with three attributes:

    - ``probe.angles``: ``f32[Nh]`` candidate rotations relative to ``theta``
      (radians, ascending; candidate k's absolute heading is
      ``theta + angles[k]``);
    - ``probe.prepare``: per-library preprocessing (``st -> aux``) for impls
      that need it (fft/roll spectra, the trained infomax network), or None;
    - ``probe.best``: jitted ``(xy, theta, st, aux) -> (fam_min[B], k[B])``
      argmin-over-headings reduction with the production tie-break
      (smallest |shift| first, SEMANTICS.md §5 — what the agent's decide
      applies; what ``familiarity_map`` runs).

    ``lib_axis`` names a library-sharded mesh axis exactly as in
    ``make_step_batched`` — pass it when probing under ``shard_map`` so the
    per-shard minima ``pmin`` to the global familiarity. Probes are cached
    on ``(cfg, fam_impl, lib_axis)`` (configs are frozen/hashable), so
    repeated ``ridf``/``heading_error`` calls reuse one jitted pipeline
    instead of recompiling.
    """
    # normalize to one positional key: lru_cache would otherwise key
    # keyword and positional call styles (and explicit-default calls)
    # separately, building duplicate probes for the same pipeline
    return _make_familiarity_probe(cfg, fam_impl, lib_axis)


@functools.lru_cache(maxsize=32)
def _make_familiarity_probe(cfg, fam_impl, lib_axis):
    step = make_step_batched(cfg, fam_impl, lib_axis)
    fam_of = step.fam
    shifts, _ = scan_shift_sets(cfg.scan)
    angles = np.asarray(shifts, dtype=np.float32) * cfg.sensor.bin_width

    @jax.jit
    def probe(xy, theta, st: EpisodeStatics, aux=None):
        return fam_of(init_state(xy, theta), st, aux)

    tie_order = jnp.asarray(np.asarray(cfg.scan.tie_order(), dtype=np.int32))

    @jax.jit
    def best(xy, theta, st: EpisodeStatics, aux=None):
        fam = fam_of(init_state(xy, theta), st, aux)
        # argmin over the tie-order permutation implements the production
        # tie-break exactly (agent._make_decide does the same per agent)
        famo = fam[:, tie_order]
        j = jnp.argmin(famo, axis=1)
        return jnp.take_along_axis(famo, j[:, None], axis=1)[:, 0], tie_order[j]

    probe.angles = angles
    probe.prepare = getattr(step, "lib_prepare", None)
    probe.best = best
    return probe


_DUMMY_ROUTE = np.array([[0.0, 0.0], [1.0, 1.0]])  # fam never reads the route

# Per-call caches for the convenience wrappers below (commonly called in a
# loop against one landscape+library): prepared aux — probe.prepare can be
# expensive (fft/roll spectra; the infomax prepare TRAINS the whole network)
# — and the EpisodeStatics device upload. Entries hold every id()-keyed
# object strongly so no id can be recycled while its entry lives; small
# FIFOs bound device memory held by evicted libraries.
_AUX_CACHE: dict = {}
_STATICS_CACHE: dict = {}
_CACHE_MAX = 8


def _fifo_put(cache: dict, key, entry) -> None:
    while len(cache) >= _CACHE_MAX:
        cache.pop(next(iter(cache)))
    cache[key] = entry


def _statics_for(landscape, lib: LibraryPack) -> EpisodeStatics:
    key = (id(landscape), id(lib.views))
    hit = _STATICS_CACHE.get(key)
    if hit is not None and hit[0] is landscape and hit[1] is lib.views:
        return hit[2]
    st = make_statics(landscape, lib, _DUMMY_ROUTE)
    _fifo_put(_STATICS_CACHE, key, (landscape, lib.views, st))
    return st


def _aux_for(probe, st: EpisodeStatics):
    if probe.prepare is None:
        return None
    key = (id(probe), id(st.lib.views))
    hit = _AUX_CACHE.get(key)
    # both identities re-checked: the probe's lru_cache slot (and hence its
    # id) can be evicted+recycled independently of this cache's entries
    if hit is not None and hit[0] is probe and hit[1] is st.lib.views:
        return hit[2]
    aux = probe.prepare(st)
    _fifo_put(_AUX_CACHE, key, (probe, st.lib.views, aux))
    return aux


def ridf(
    landscape,
    lib: LibraryPack,
    xy,
    theta,
    cfg: SimConfig,
    *,
    fam_impl: str = "auto",
) -> tuple[np.ndarray, np.ndarray]:
    """Full-circle RIDF at one pose or a batch of poses.

    Returns ``(angles[Nh], fam[..., Nh])``: familiarity (min image distance
    over the library, by ``cfg.scan.metric``) at each rotation of the view
    captured at ``(xy, theta)``. ``xy`` may be ``[2]`` or ``[B, 2]`` with
    matching ``theta``.
    """
    xy = np.asarray(xy, dtype=np.float32)
    single = xy.ndim == 1
    xy_b = xy[None, :] if single else xy
    theta_b = np.atleast_1d(np.asarray(theta, dtype=np.float32))
    if theta_b.shape[0] != xy_b.shape[0]:
        raise ValueError(
            f"theta batch {theta_b.shape[0]} != xy batch {xy_b.shape[0]} — "
            "pass one heading per pose"
        )
    probe = make_familiarity_probe(full_circle_scan(cfg), fam_impl)
    st = _statics_for(landscape, lib)
    aux = _aux_for(probe, st)
    fam = np.asarray(probe(xy_b, theta_b, st, aux))
    return probe.angles, (fam[0] if single else fam)


def familiarity_map(
    landscape,
    lib: LibraryPack,
    cfg: SimConfig,
    *,
    stride: float = 8.0,
    margin: float | None = None,
    fam_impl: str = "auto",
    batch: int = 1024,
) -> dict:
    """Best-over-headings familiarity on a position grid (catchment map).

    Probes the full heading circle at every grid position (spacing
    ``stride`` px, keeping ``margin`` px — default the sensor radius, the
    same bound the agent's off-landscape condition uses — clear of the
    edges) and reduces to the per-position minimum. Positions are evaluated
    in fixed-size batches of ``batch`` (one compile; the last batch is
    padded), each batch one production familiarity evaluation.

    Returns a dict:

    - ``x[nx], y[ny]``: grid coordinates (px);
    - ``fam[ny, nx]``: best familiarity (lower = more familiar);
    - ``best_heading[ny, nx]``: the absolute heading (radians) achieving it;
    - ``angles[Nh]``: the probed heading circle.
    """
    land = np.asarray(landscape)
    if margin is None:
        margin = float(cfg.sensor.r_max)
    hl, wl = land.shape
    xs = np.arange(margin, wl - 1 - margin + 1e-9, stride, dtype=np.float32)
    ys = np.arange(margin, hl - 1 - margin + 1e-9, stride, dtype=np.float32)
    if xs.size == 0 or ys.size == 0:
        raise ValueError(
            f"no grid positions: landscape {land.shape} leaves no interior at "
            f"margin {margin} (stride {stride})"
        )
    gx, gy = np.meshgrid(xs, ys)
    pts = np.stack([gx.ravel(), gy.ravel()], axis=1)  # [N, 2]
    n = pts.shape[0]

    probe = make_familiarity_probe(full_circle_scan(cfg), fam_impl)
    st = _statics_for(landscape, lib)
    aux = _aux_for(probe, st)
    zeros = jnp.zeros(batch, jnp.float32)

    best = np.empty(n, dtype=np.float32)
    best_k = np.empty(n, dtype=np.int32)
    for lo in range(0, n, batch):
        hi = min(lo + batch, n)
        chunk = pts[lo:hi]
        if hi - lo < batch:  # pad to the single compiled shape
            chunk = np.concatenate(
                [chunk, np.repeat(chunk[-1:], batch - (hi - lo), axis=0)]
            )
        b, k = probe.best(jnp.asarray(chunk), zeros, st, aux)
        best[lo:hi] = np.asarray(b)[: hi - lo]
        best_k[lo:hi] = np.asarray(k)[: hi - lo]

    return {
        "x": xs,
        "y": ys,
        "fam": best.reshape(len(ys), len(xs)),
        "best_heading": probe.angles[best_k].reshape(len(ys), len(xs)),
        "angles": probe.angles,
    }


def heading_error(
    landscape,
    lib: LibraryPack,
    cfg: SimConfig,
    xy,
    theta_ref,
    *,
    theta_probe=None,
    fam_impl: str = "auto",
    full_circle: bool = True,
) -> np.ndarray:
    """Open-loop angular error of the familiarity scan at given poses.

    At each pose the scan runs once (no episode) and the selected heading —
    argmin with the production tie-break, SEMANTICS.md §5 — is compared to
    the reference heading ``theta_ref`` (typically the route tangent).
    Returns the signed error wrapped to [-pi, pi), shape ``[B]``.

    ``theta_probe`` is the heading the agent FACES while scanning (default:
    ``theta_ref``); with ``full_circle=True`` (default) the scan covers the
    whole circle so the error is probe-heading-invariant — the infomax
    dose-response artifacts' ``herr`` metric, now first-class.
    """
    xy = np.atleast_2d(np.asarray(xy, dtype=np.float32))
    theta_ref = np.atleast_1d(np.asarray(theta_ref, dtype=np.float32))
    theta_probe = (
        theta_ref
        if theta_probe is None
        else np.atleast_1d(np.asarray(theta_probe, dtype=np.float32))
    )
    if theta_ref.shape[0] != xy.shape[0] or theta_probe.shape[0] != xy.shape[0]:
        raise ValueError(
            f"heading batches (ref {theta_ref.shape[0]}, probe "
            f"{theta_probe.shape[0]}) != xy batch {xy.shape[0]}"
        )
    pcfg = full_circle_scan(cfg) if full_circle else cfg
    probe = make_familiarity_probe(pcfg, fam_impl)
    st = _statics_for(landscape, lib)
    aux = _aux_for(probe, st)
    # probe.best applies the production tie-break on device and transfers
    # [B] instead of the full [B, Nh] familiarity matrix
    _, k = probe.best(xy, theta_probe, st, aux)
    chosen = theta_probe + probe.angles[np.asarray(k)]
    err = chosen - theta_ref
    return np.asarray((err + np.pi) % (2 * np.pi) - np.pi, dtype=np.float32)


def catchment(fmap: dict, route, corridor: float = 20.0) -> dict:
    """Quantify the catchment area of a familiarity map.

    Zeil's operational definition: a position is in the catchment when
    steepest descent on the (image-)difference surface leads home. Here:
    from each grid cell, repeatedly step to the lowest-familiarity cell in
    the 8-neighborhood (strict descent, host-side on the grid) until a
    local minimum; the start cell is *captured* if its descent path ends
    within ``corridor`` px of the training route.

    Returns ``{"captured": bool[ny, nx], "fraction": float,
    "route_dist": f32[ny, nx]}``. ``fraction`` is the captured share of
    grid cells — a world/route-level predictor of recall difficulty
    (compare artifacts/RESULTS.md's world-statistics findings).
    """
    from navdv_tpu.oracle import point_to_polyline_dists

    fam = np.asarray(fmap["fam"], dtype=np.float64)
    ny, nx = fam.shape
    gx, gy = np.meshgrid(fmap["x"], fmap["y"])
    route = np.asarray(route, dtype=np.float64)
    pts = np.stack([gx.ravel(), gy.ravel()], axis=1)  # [N, 2]
    route_dist = (
        point_to_polyline_dists(pts, route).reshape(ny, nx).astype(np.float32)
    )

    # descent successor of every cell: lowest strict-descent 8-neighbor
    # (-1 = local minimum). Computed once; paths then resolve by pointer
    # chasing with memoization — O(cells), no per-cell re-simulation.
    padded = np.full((ny + 2, nx + 2), np.inf)
    padded[1:-1, 1:-1] = fam
    neigh = np.stack([
        padded[1 + dy : 1 + dy + ny, 1 + dx : 1 + dx + nx]
        for dy in (-1, 0, 1)
        for dx in (-1, 0, 1)
        if not (dy == 0 and dx == 0)
    ])  # [8, ny, nx]
    offsets = np.asarray(
        [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)
         if not (dy == 0 and dx == 0)]
    )
    kmin = np.argmin(neigh, axis=0)  # [ny, nx]
    vmin = np.take_along_axis(neigh, kmin[None], axis=0)[0]
    flat_succ = np.where(
        vmin < fam,
        (np.arange(ny)[:, None] + offsets[kmin][..., 0]) * nx
        + (np.arange(nx)[None, :] + offsets[kmin][..., 1]),
        -1,
    ).ravel()

    at_route = (route_dist.ravel() <= corridor)
    state = np.full(ny * nx, -1, dtype=np.int8)  # -1 unknown, 0 no, 1 yes
    for i in range(ny * nx):
        path = []
        j = i
        while state[j] == -1:
            path.append(j)
            state[j] = -2  # on the current path (cycle guard; strict
            # descent can't cycle, but inf/NaN plateaus would)
            nxt = flat_succ[j]
            if nxt < 0:  # local minimum: captured iff it sits on the route
                state[j] = 1 if at_route[j] else 0
                path.pop()
                break
            j = nxt
            if state[j] == -2:  # plateau cycle — treat as not captured
                state[j] = 0
        verdict = state[j]
        for p in path:
            state[p] = verdict
    captured = (state == 1).reshape(ny, nx)
    return {
        "captured": captured,
        "fraction": float(captured.mean()),
        "route_dist": route_dist,
    }
