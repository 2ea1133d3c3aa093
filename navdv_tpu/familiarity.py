"""L2: familiarity scoring (SEMANTICS.md §4; SURVEY.md §7 familiarity.py).

TPU-first formulation: SSD over all (candidate headings x library views)
decomposes as ``|c|^2 + |l|^2 - 2 c.l`` — the cross term is ONE matmul
``[Ns, P] @ [P, Nl]`` that runs on the MXU; NCC is the same matmul on z-scored
views. This module holds the jnp reference implementation; the fused Pallas
kernel lives in :mod:`navdv_tpu.ops.familiarity_pallas` and must match it
exactly (tests/test_pallas.py).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from navdv_tpu.config import ScanConfig, SensorConfig

NCC_EPS = 1e-8


PAD_PENALTY = 1e30  # added to padded library columns; they never win the min

# ScanConfig.matmul_precision values -> MXU pass counts (config.py notes);
# honored by every matmul familiarity path (jnp + conv). The Pallas kernel is
# pinned to HIGHEST by a Mosaic constraint (no HIGH inside kernels).
MATMUL_PRECISIONS = {
    "default": jax.lax.Precision.DEFAULT,
    "high": jax.lax.Precision.HIGH,
    "highest": jax.lax.Precision.HIGHEST,
}


def matmul_precision(name: str) -> jax.lax.Precision:
    if name not in MATMUL_PRECISIONS:
        raise ValueError(
            f"unknown matmul precision {name!r} "
            f"(valid: {sorted(MATMUL_PRECISIONS)})"
        )
    return MATMUL_PRECISIONS[name]


class LibraryPack(NamedTuple):
    """Device-resident training library, preprocessed per metric.

    views: f32[Nl, R, W] raw views (kept for viz/inspection)
    flat:  f32[Nl, P]    flattened views (SSD path)
    sq:    f32[Nl]       per-view squared norms (SSD path)
    z:     f32[Nl, P]    z-scored views (NCC path)
    valid: f32[Nl]       1.0 = real view, 0.0 = shape-padding sentinel
                         (library sharding / sweep shape-bucketing pad Nl;
                         invalid columns get +PAD_PENALTY distance)
    """

    views: jnp.ndarray
    flat: jnp.ndarray
    sq: jnp.ndarray
    z: jnp.ndarray
    valid: jnp.ndarray


def zscore(v: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    m = v.mean(axis=axis, keepdims=True)
    var = ((v - m) ** 2).mean(axis=axis, keepdims=True)
    return (v - m) / jnp.sqrt(var + NCC_EPS)


def pack_library(views: jnp.ndarray) -> LibraryPack:
    """views f32[Nl, R, W] -> LibraryPack (one-time, cold)."""
    flat = views.reshape(views.shape[0], -1)
    return LibraryPack(
        views=views,
        flat=flat,
        sq=jnp.sum(flat * flat, axis=1),
        z=zscore(flat),
        valid=jnp.ones(views.shape[0], dtype=jnp.float32),
    )


def _pad_penalty(lib: LibraryPack) -> jnp.ndarray:
    return (1.0 - lib.valid)[None, :] * PAD_PENALTY


def ssd_matrix(cand: jnp.ndarray, lib: LibraryPack,
               precision=jax.lax.Precision.HIGH) -> jnp.ndarray:
    """d[s, v] = sum((cand_s - lib_v)^2) via the matmul decomposition.

    Default HIGH (bf16x3): the decomposition cancels catastrophically at
    plain bf16. ``precision`` threads ScanConfig.matmul_precision so the
    reference path runs the SAME rounding class as the production path it
    is compared against (see make_familiarity_jnp).
    """
    cand_sq = jnp.sum(cand * cand, axis=1)  # [Ns]
    cross = jnp.dot(cand, lib.flat.T, precision=precision)  # [Ns, Nl]
    d = cand_sq[:, None] + lib.sq[None, :] - 2.0 * cross
    return jnp.maximum(d, 0.0) + _pad_penalty(lib)  # clamp fp cancellation noise


def ncc_matrix(cand: jnp.ndarray, lib: LibraryPack,
               precision=jax.lax.Precision.HIGH) -> jnp.ndarray:
    """d[s, v] = 1 - mean(z(cand_s) * z(lib_v)) (SEMANTICS.md §4)."""
    p = cand.shape[1]
    zc = zscore(cand)
    d = 1.0 - jnp.dot(zc, lib.z.T, precision=precision) / p
    return d + _pad_penalty(lib)


def distance_matrix(cand: jnp.ndarray, lib: LibraryPack, metric: str,
                    precision=jax.lax.Precision.HIGH) -> jnp.ndarray:
    if metric == "ssd":
        return ssd_matrix(cand, lib, precision)
    if metric == "ncc":
        return ncc_matrix(cand, lib, precision)
    raise ValueError(metric)


def reduce_familiarity(d_ext: jnp.ndarray, scan: ScanConfig) -> jnp.ndarray:
    """d_ext f32[Nh*(2t+1), Nl] over the extended shift set -> fam f32[Nh].

    RIDF min-pool over the tolerance window, then min over the library
    (SEMANTICS.md §4–§5). With tol_bins=0 this is a plain min over Nl.
    """
    w = 2 * scan.tol_bins + 1
    d = d_ext.reshape(scan.n_headings, w, -1)
    return jnp.min(d, axis=(1, 2))


def make_familiarity_jnp(sensor: SensorConfig, scan: ScanConfig):
    """Reference fam(cand_ext f32[Ne, P], lib) -> f32[Nh] (pure jnp)."""
    if scan.metric not in ("ssd", "ncc"):
        raise ValueError(f"unknown familiarity metric {scan.metric!r}")

    prec = matmul_precision(scan.matmul_precision)

    def fam(cand_ext: jnp.ndarray, lib: LibraryPack) -> jnp.ndarray:
        d = distance_matrix(cand_ext, lib, scan.metric, prec)
        return reduce_familiarity(d, scan)

    return fam
