"""L2/L4: training — route -> device-resident view library (SEMANTICS.md §6).

SURVEY.md §3.2 rebuild note: instead of the reference's per-pose Python loop,
``vmap(render_view)`` renders all route views in one device launch; the library
is a single f32[Nl, R, W] array resident in HBM.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from navdv_tpu.config import SimConfig
from navdv_tpu.familiarity import LibraryPack, pack_library
from navdv_tpu.oracle import resample_route  # host-side; shared semantics
from navdv_tpu.sensor import make_render_view


def train_library(
    landscape: jnp.ndarray, route: np.ndarray, cfg: SimConfig
) -> LibraryPack:
    """Capture one view per resampled route point (heading = tangent) and pack.

    Cold path: one vmapped render over all ~Nl poses.
    """
    pts, headings = resample_route(np.asarray(route, dtype=np.float64), cfg.capture_spacing)
    render_view = make_render_view(cfg.sensor)
    views = jax.vmap(render_view, in_axes=(None, 0, 0))(
        landscape,
        jnp.asarray(pts, dtype=jnp.float32),
        jnp.asarray(headings, dtype=jnp.float32),
    )
    return pack_library(views)
