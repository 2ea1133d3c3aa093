"""Auto-chunked candidate/familiarity path (big-sensor configs) equals the
unchunked path exactly."""

import dataclasses

import jax.numpy as jnp
import numpy as np

import navdv_tpu.agent as agent_mod
from navdv_tpu.agent import init_state, make_statics
from navdv_tpu.config import ScanConfig
from navdv_tpu.oracle import resample_route
from navdv_tpu.training import train_library


def test_chunked_step_matches_unchunked(small_cfg, small_world, monkeypatch):
    cfg = dataclasses.replace(
        small_cfg,
        scan=ScanConfig(n_headings=12, scan_step_bins=2, metric="ncc", tol_bins=1),
    )
    landscape, route = small_world
    lib = train_library(jnp.asarray(landscape), route, cfg)
    st = make_statics(landscape, lib, route)
    pts, hd = resample_route(route, cfg.capture_spacing)
    states = init_state(
        jnp.asarray(np.stack([pts[0], pts[3], pts[6]]), jnp.float32),
        jnp.asarray([hd[0], hd[3], hd[6]], jnp.float32),
    )
    o1, r1 = agent_mod.make_step_batched(cfg)(states, st)
    monkeypatch.setattr(agent_mod, "FAM_CHUNK_ELEMS", 200)  # force ~2-col chunks
    o2, r2 = agent_mod.make_step_batched(cfg)(states, st)
    np.testing.assert_allclose(np.asarray(r1.fam), np.asarray(r2.fam), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(r1.k), np.asarray(r2.k))
    np.testing.assert_allclose(np.asarray(o1.xy), np.asarray(o2.xy), atol=1e-6)
