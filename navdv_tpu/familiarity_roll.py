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

i.e. ONE matmul ``[B·u, R·W] @ [R·W, |Q|·Nl]`` against a statically
pre-rolled library (computed once per episode via the prepare stage). The
distance math and the min over the library run IN THE MATMUL'S OUTPUT GRID
LAYOUT [B·u, |Q|·Nl] — un-gridding to lag order happens only on the tiny
[B, L] minima (merging the row-derived j axis with the column-derived q axis
any earlier is a genuine relayout of the [B, L, Nl] tensor: profiled 1.16
ms/step of HBM copies at BASELINE config 2). Per-lag norms scatter INTO the
grid through a static index instead.
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


def _lag_grid(lags: np.ndarray, u: int):
    """Static (j, q) decomposition. Returns (qs_unique, grid_rows, inv_rows):
    ``grid_rows[i] = j_i * |Q| + index(q_i)`` maps lag i into the flattened
    (j, q) grid; ``inv_rows[g]`` maps a grid cell back to SOME lag index with
    that (j, q) (0 for cells no lag uses — their values are never gathered)."""
    lags = np.asarray(lags)
    js = np.mod(lags, u)
    qs = (lags - js) // u
    qs_unique = np.unique(qs)
    q_index = {int(q): i for i, q in enumerate(qs_unique)}
    nq = len(qs_unique)
    grid_rows = np.array(
        [int(j) * nq + q_index[int(q)] for j, q in zip(js, qs)], dtype=np.int32
    )
    inv_rows = np.zeros(u * nq, dtype=np.int32)
    inv_rows[grid_rows] = np.arange(len(lags), dtype=np.int32)
    return qs_unique, grid_rows, inv_rows


def make_lib_min_roll(sensor: SensorConfig, scan: ScanConfig, lags: np.ndarray):
    """Per-lag library minimum via the rolled-library matmul:
    ``lib_min(S f32[B, R, A], lib, lag_sum f32[B, L], lag_sq f32[B, L],
    aux=None) -> M f32[B, L]`` — same contract as the fft path (consumes the
    pooled panorama, no candidate extraction). ``lib_min.prepare(lib)``
    builds the pre-rolled library once per episode."""
    if scan.metric not in ("ssd", "ncc"):
        raise ValueError(f"unknown familiarity metric {scan.metric!r}")
    r, w, u = sensor.n_radial, sensor.n_azimuth, sensor.az_upsample
    p = float(sensor.n_pixels)
    prec = matmul_precision(scan.matmul_precision)

    qs_unique, grid_rows, inv_rows = _lag_grid(np.asarray(lags), u)
    nq = len(qs_unique)
    # static roll gather: rolled[qi, v, r, w] = zrows[v, r, (w - q) mod W]
    wmat = np.mod(np.arange(w)[None, :] - qs_unique[:, None], w)  # [nq, W]
    roll_idx = jnp.asarray(wmat.astype(np.int32))
    grid_rows_dev = jnp.asarray(grid_rows)
    inv_rows_dev = jnp.asarray(inv_rows)
    inv_u = 1.0 / u

    def _prepare_rows(zrows: jnp.ndarray) -> jnp.ndarray:
        """zrows f32[Nl, P] -> pre-rolled library f32[P, |Q|*Nl] (q-major
        columns: the matmul output grid is then [(b, j), (q, v)])."""
        nl = zrows.shape[0]
        zr = zrows.reshape(nl, r, w)
        zrolled = zr[:, :, roll_idx]  # [Nl, R, nq, W]
        zmat = jnp.transpose(zrolled, (2, 0, 1, 3)).reshape(nq * nl, r * w)
        return zmat.T  # [P, nq*Nl]

    def _cross_grid(s: jnp.ndarray, zmat_t: jnp.ndarray) -> jnp.ndarray:
        """(S f32[B,R,A], prepared f32[P, |Q|*Nl]) -> f32[B, u, nq, Nl]
        where [b, j, qi, v] = cross of lag (j, q) against view v."""
        b = s.shape[0]
        nl = zmat_t.shape[1] // nq
        # T[b, j, r, w] = S[b, r, w*u + j] / u   (one transpose, no gather)
        t = jnp.transpose(s.reshape(b, r, w, u), (0, 3, 1, 2)) * inv_u
        t2 = t.reshape(b * u, r * w)
        cg = jnp.dot(t2, zmat_t, precision=prec)  # [B*u, nq*Nl]
        return cg.reshape(b, u, nq, nl)  # free: rows (b,u), cols (nq,nl)

    def _to_grid(per_lag: jnp.ndarray) -> jnp.ndarray:
        """[B, L] per-lag values -> [B, u, nq] grid (static scatter; unused
        cells carry a duplicate value that is never gathered back)."""
        return per_lag[:, inv_rows_dev].reshape(-1, u, nq)

    if scan.metric == "ssd":

        def prepare(lib: LibraryPack):
            return _prepare_rows(lib.flat)

        def lib_min(s, lib: LibraryPack, lag_sum, lag_sq, aux=None):
            cg = _cross_grid(s, prepare(lib) if aux is None else aux)
            pen = (1.0 - lib.valid) * PAD_PENALTY
            d = (
                _to_grid(lag_sq)[..., None]
                + (lib.sq + pen)[None, None, None, :]
                - 2.0 * cg
            )
            m_grid = jnp.min(jnp.maximum(d, 0.0), axis=3)  # [B, u, nq]
            return m_grid.reshape(-1, u * nq)[:, grid_rows_dev]  # [B, L]

        lib_min.prepare = prepare
        return lib_min

    def prepare(lib: LibraryPack):
        return _prepare_rows(lib.z)

    def lib_min(s, lib: LibraryPack, lag_sum, lag_sq, aux=None):
        cg = _cross_grid(s, prepare(lib) if aux is None else aux)
        pen = (1.0 - lib.valid) * PAD_PENALTY
        mu = _to_grid(lag_sum / p)  # [B, u, nq]
        var = jnp.maximum(_to_grid(lag_sq / p) - mu * mu, 0.0)
        sigma = jnp.sqrt(var + NCC_EPS)
        zsum = jnp.sum(lib.z, axis=1)  # [Nl]
        zdot = (cg - mu[..., None] * zsum[None, None, None, :]) / sigma[..., None]
        d = 1.0 - zdot / p + pen[None, None, None, :]
        m_grid = jnp.min(d, axis=3)  # [B, u, nq]
        return m_grid.reshape(-1, u * nq)[:, grid_rows_dev]  # [B, L]

    lib_min.prepare = prepare
    return lib_min
