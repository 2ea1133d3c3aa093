"""L2/L4: training — route -> device-resident view library (SEMANTICS.md §6).

SURVEY.md §3.2 rebuild note: instead of the reference's per-pose Python loop,
``vmap(render_view)`` renders all route views in one device launch; the library
is a single f32[Nl, R, W] array resident in HBM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from navdv_tpu.config import SimConfig
from navdv_tpu.familiarity import LibraryPack, pack_library
from navdv_tpu.oracle import resample_route  # host-side; shared semantics
from navdv_tpu.sensor import make_render_view


# capture chunk: the vmapped full-window renderer materializes
# [chunk, R, A, wsz] hat transients (~0.5 GB/1k views at a 72x16 u=5
# sensor); one unchunked launch at 6000+ views exhausted HBM on v5e-16GB
# (round-4 large-library envelope, artifacts/biglib_envelope.jsonl) — the
# dense-library training axis is SURVEY §5.7's growing axis, so capture in
# bounded chunks. Throughput-neutral at small Nl (cold path, one-time).
TRAIN_CHUNK_VIEWS = 1024


@functools.lru_cache(maxsize=16)
def _capture_renderer(sensor_cfg):
    """One jitted batched capture renderer per sensor config. The capture
    render is the slowest compile in a sweep cell (~25-80 s per distinct
    [Nl] shape through the tunnel — it dominates the per-cell wall,
    artifacts/bucket_sweep.jsonl); caching the jit object makes in-process
    reuse guaranteed rather than dependent on the runtime's program cache."""
    return jax.jit(jax.vmap(make_render_view(sensor_cfg), in_axes=(None, 0, 0)))


def train_library(
    landscape: jnp.ndarray,
    route: np.ndarray,
    cfg: SimConfig,
    pad_views_to: int = 0,
    heading_jitter: float = 0.0,
    jitter_seed: int = 0,
) -> LibraryPack:
    """Capture one view per resampled route point (heading = tangent) and pack.

    Cold path: vmapped renders over the route poses, in TRAIN_CHUNK_VIEWS
    chunks so the hat-weight transients stay bounded at dense libraries.

    ``pad_views_to > 1`` renders at a pose count padded up to that multiple
    (repeating the final pose) and slices back to the true count — the
    returned library is identical, but sweeps whose cells differ only in
    library size then reuse ONE capture-render compilation
    (SweepSpec.lib_bucket wires this through).

    ``heading_jitter`` (radians) adds seeded uniform(-j, +j) noise to each
    capture heading. NOT for perfect-memory libraries (it corrupts the
    metric's training views); it exists for the learned memory's measured
    straight-route mitigation (artifacts/infomax_heading_jitter.jsonl):
    training views captured along a straight route share one heading, the
    regime where fam_impl="infomax" collapses (recall 0.17 vs jnp 1.0 on
    the noise world), and a SEPARATE jitter-captured library used only for
    the prepare stage recovers 2.5-4x recall at j=0.2-0.4 (0.45-0.72,
    seed-variable; j=0.8 destroys the route signal — rotation suppression
    erases the discrimination the scan needs). Recipe::

        lib_j = train_library(land, route, cfg, heading_jitter=0.3)
        run = make_navigate_batch(cfg, fam_impl="infomax")
        aux = run.prepare(make_statics(land, lib_j, route))  # train jittered
        final, rec = run(states0, st, aux)                   # navigate normal
    """
    pts, headings = resample_route(np.asarray(route, dtype=np.float64), cfg.capture_spacing)
    if heading_jitter:
        jr = np.random.default_rng(jitter_seed)
        headings = headings + jr.uniform(
            -heading_jitter, heading_jitter, size=len(headings))
    render_many = _capture_renderer(cfg.sensor)
    pts_d = jnp.asarray(pts, dtype=jnp.float32)
    hd_d = jnp.asarray(headings, dtype=jnp.float32)
    n = pts_d.shape[0]
    if pad_views_to > 1 and n % pad_views_to:
        rem = (-n) % pad_views_to
        pts_d = jnp.concatenate([pts_d, jnp.tile(pts_d[-1:], (rem, 1))])
        hd_d = jnp.concatenate([hd_d, jnp.tile(hd_d[-1:], (rem,))])
    n_render = pts_d.shape[0]
    if n_render <= TRAIN_CHUNK_VIEWS:
        return pack_library(render_many(landscape, pts_d, hd_d)[:n])
    views = jnp.concatenate(
        [
            render_many(
                landscape,
                pts_d[i : i + TRAIN_CHUNK_VIEWS],
                hd_d[i : i + TRAIN_CHUNK_VIEWS],
            )
            for i in range(0, n_render, TRAIN_CHUNK_VIEWS)
        ],
        axis=0,
    )
    return pack_library(views[:n])
