"""Rolled-library familiarity path: extraction-free matmul cross term.

Sibling of :mod:`navdv_tpu.familiarity_fft` with the *same* elimination of the
[B, L, P] candidate tensor but matmul-identical numerics to the jnp path —
the right tool when the familiarity valley is so flat that the spectral
path's decorrelated per-lag noise costs recall (BASELINE config 2's dense
library; see familiarity_fft.py and STATUS.md).

Identity: decompose lag ``l = q·u + j`` (j = l mod u). The candidate view is
a cyclic W-roll of the residue-j phase plane of the pooled panorama:

    cand(l)[r, w] = T_j[r, (w + q) mod W],   T_j[r, w] = S[r, w·u + j] / u

so the cross term against library view v is

    cross[l, v] = sum_{r,w} T_j[r, w] · lib[v, r, (w - q) mod W]

i.e. ONE matmul ``[B·u, R·W] @ [R·W, Nl·|Q|]`` against a statically
pre-rolled library (per-episode constant — XLA hoists it out of the scan),
followed by a tiny static permutation from the (j, q) grid back to lag order.
Same FLOPs as the extract-then-matmul path, minus the ~[B, L, P] extraction
traffic (283 MB/step at config 2).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from navdv_tpu.config import ScanConfig, SensorConfig
from navdv_tpu.familiarity import (
    NCC_EPS,
    PAD_PENALTY,
    LibraryPack,
    matmul_precision,
)


def _lag_grid(lags: np.ndarray, u: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Static (j, q) decomposition: returns (qs_unique, grid_rows, lag_cols)
    where ``grid_rows[i] = j_i * |Q| + index(q_i)`` maps lag i into the
    flattened (j, q) grid, and the cross/matmul is built over all u*|Q| grid
    cells (unused cells are computed but never selected)."""
    lags = np.asarray(lags)
    js = np.mod(lags, u)
    qs = (lags - js) // u
    qs_unique = np.unique(qs)
    q_index = {int(q): i for i, q in enumerate(qs_unique)}
    grid_rows = np.array(
        [int(j) * len(qs_unique) + q_index[int(q)] for j, q in zip(js, qs)],
        dtype=np.int32,
    )
    return qs_unique, grid_rows, js.astype(np.int32)


def make_lib_min_roll(sensor: SensorConfig, scan: ScanConfig, lags: np.ndarray):
    """Per-lag library minimum via the rolled-library matmul:
    ``lib_min(S f32[B, R, A], lib, lag_sum f32[B, L], lag_sq f32[B, L]) ->
    M f32[B, L]`` — same contract as the fft path (consumes the pooled
    panorama, no candidate extraction)."""
    if scan.metric not in ("ssd", "ncc"):
        raise ValueError(f"unknown familiarity metric {scan.metric!r}")
    r, w, u = sensor.n_radial, sensor.n_azimuth, sensor.az_upsample
    p = float(sensor.n_pixels)
    prec = matmul_precision(scan.matmul_precision)
    n_lags = len(np.asarray(lags))

    qs_unique, grid_rows, _ = _lag_grid(np.asarray(lags), u)
    nq = len(qs_unique)
    # static roll gather index: rolled[v, qi, r, w] = zrows[v, r, (w - q) mod W]
    wmat = np.mod(np.arange(w)[None, :] - qs_unique[:, None], w)  # [nq, W]
    roll_idx = jnp.asarray(wmat.astype(np.int32))
    grid_rows_dev = jnp.asarray(grid_rows)
    inv_u = 1.0 / u

    def _cross(s: jnp.ndarray, zrows: jnp.ndarray) -> jnp.ndarray:
        """(S f32[B,R,A], zrows f32[Nl, P]) -> cross f32[B, L, Nl]."""
        b = s.shape[0]
        nl = zrows.shape[0]
        # T[b, j, r, w] = S[b, r, w*u + j] / u   (one transpose, no gather)
        t = jnp.transpose(s.reshape(b, r, w, u), (0, 3, 1, 2)) * inv_u
        t2 = t.reshape(b * u, r * w)
        # statically pre-rolled library: per-episode constant, hoisted out of
        # the episode scan by XLA
        zr = zrows.reshape(nl, r, w)
        zrolled = zr[:, :, roll_idx]  # [Nl, R, nq, W]
        zmat = jnp.transpose(zrolled, (0, 2, 1, 3)).reshape(nl * nq, r * w)
        cross_grid = jnp.dot(t2, zmat.T, precision=prec)  # [B*u, Nl*nq]
        cross_grid = cross_grid.reshape(b, u, nl, nq)
        cross_grid = jnp.transpose(cross_grid, (0, 1, 3, 2)).reshape(b, u * nq, nl)
        return cross_grid[:, grid_rows_dev]  # [B, L, Nl] in lag order

    if scan.metric == "ssd":

        def lib_min(s, lib: LibraryPack, lag_sum, lag_sq):
            cross = _cross(s, lib.flat)  # [B, L, Nl]
            pen = (1.0 - lib.valid) * PAD_PENALTY
            d = lag_sq[:, :, None] + (lib.sq + pen)[None, None, :] - 2.0 * cross
            return jnp.min(jnp.maximum(d, 0.0), axis=2)

        return lib_min

    def lib_min(s, lib: LibraryPack, lag_sum, lag_sq):
        cross = _cross(s, lib.z)
        pen = (1.0 - lib.valid) * PAD_PENALTY
        mu = lag_sum / p
        var = jnp.maximum(lag_sq / p - mu * mu, 0.0)
        sigma = jnp.sqrt(var + NCC_EPS)
        zsum = jnp.sum(lib.z, axis=1)  # [Nl]
        zdot = (cross - mu[:, :, None] * zsum[None, None, :]) / sigma[:, :, None]
        d = 1.0 - zdot / p + pen[None, None, :]
        return jnp.min(d, axis=2)

    _ = n_lags
    return lib_min
