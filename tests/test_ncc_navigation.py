"""Closed-loop NCC + RIDF navigation (BASELINE config 3 semantics at small
scale): oracle and JAX path both recall the route with the NCC metric and
rotation tolerance; NCC survives a global intensity change of the landscape
(which breaks SSD) — the behavioral reason the metric exists."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from navdv_tpu import oracle
from navdv_tpu.agent import (
    STATUS_REACHED,
    init_state,
    make_navigate,
    make_statics,
)
from navdv_tpu.config import ScanConfig
from navdv_tpu.training import train_library


def _ncc_cfg(small_cfg):
    # tol_bins=1 exercises RIDF in the loop: overlapping RIDF windows create
    # exact fam ties, which the smallest-|shift| tie-break (SEMANTICS.md §5)
    # resolves without the left-turn bias that previously destroyed recall.
    return dataclasses.replace(
        small_cfg, scan=ScanConfig(n_headings=12, scan_step_bins=2, metric="ncc", tol_bins=1)
    )


def test_ncc_oracle_recalls_route(small_cfg, small_world):
    landscape, route = small_world
    cfg = _ncc_cfg(small_cfg)
    lib = oracle.train_library(landscape, route, cfg)
    pts, headings = oracle.resample_route(route, cfg.capture_spacing)
    out = oracle.navigate(landscape, lib, route, pts[0], headings[0], cfg)
    assert out["success"], out["status"]


def test_ncc_jax_recalls_route_under_intensity_change(small_cfg, small_world):
    """Train on the landscape, recall on 0.6*landscape + 0.2: NCC is invariant
    to affine intensity change (SEMANTICS.md §4), so recall must survive."""
    landscape, route = small_world
    cfg = _ncc_cfg(small_cfg)
    lib = train_library(jnp.asarray(landscape), route, cfg)
    dimmed = 0.6 * landscape + 0.2
    st = make_statics(dimmed, lib, route)
    pts, headings = oracle.resample_route(route, cfg.capture_spacing)
    final, rec = make_navigate(cfg)(init_state(pts[0], headings[0]), st)
    assert int(final.status) == STATUS_REACHED


def test_tie_break_prefers_straightest(small_cfg):
    """Exact fam ties resolve to the smallest |shift| (SEMANTICS.md §5)."""
    import jax.numpy as jnp

    from navdv_tpu.agent import _make_decide, init_state, make_statics
    from navdv_tpu.familiarity import pack_library
    import numpy as np

    cfg = small_cfg
    decide = _make_decide(cfg)
    lib = pack_library(jnp.zeros((1, 4, 24)))
    st = make_statics(np.zeros((64, 64), np.float32), lib,
                      np.array([[10.0, 32.0], [50.0, 32.0]]))
    fam = jnp.zeros((cfg.scan.n_headings,))  # all tied
    state = init_state(jnp.asarray([30.0, 32.0]), jnp.float32(0.0))
    out, rec = decide(state, fam, st)
    shifts = cfg.scan.shifts()
    assert abs(shifts[int(rec.k)]) == min(abs(s) for s in shifts)


def test_ridf_familiarity_no_worse_than_plain(small_cfg, small_world, rng):
    """Min-pooling over the RIDF window can only lower the distance."""
    landscape, route = small_world
    cfg0 = dataclasses.replace(
        small_cfg, scan=ScanConfig(n_headings=12, scan_step_bins=2, tol_bins=0)
    )
    cfg1 = dataclasses.replace(
        small_cfg, scan=ScanConfig(n_headings=12, scan_step_bins=2, tol_bins=2)
    )
    lib = oracle.train_library(landscape, route, cfg0)
    x, y, th = 60.0, 64.0, 0.5
    pano = oracle.render_panorama(landscape, x, y, th, cfg0)
    fam0 = oracle.scan_familiarity(pano, lib, cfg0)
    fam1 = oracle.scan_familiarity(pano, lib, cfg1)
    assert (fam1 <= fam0 + 1e-12).all()
