"""Pallas fused lag-familiarity kernel (exploration artifact — NON-DEFAULT).

Idea: fuse candidate extraction + norms + distance matmul + library min in
VMEM — rows for every (residue j, coarse shift q) lag materialized via static
slices of the doubled residue-split panorama (rotation = slice), so the
[B, L, P] candidate tensor never exists in HBM.

Measured on v5e-1 at BASELINE config 1 (correct to ~1e-2 vs the jnp path):
  - flat=True (single [L, P] matmul): Mosaic rejects the [L, R, W] -> [L, P]
    shape cast ("infer-vector-layout: unsupported shape cast");
  - flat=False (per-ring K=W matmuls): 10.5 ms/step — the K=72->128 padding
    (1.78x waste) plus ~320 unrolled blocks/program lose badly to XLA's fused
    extract+matmul (whole production step: 4.6 ms). Compile ~5 min.

Kept (with interpret-mode tests) as the documented frontier for future
Mosaic versions that support the flattening relayout; the production path
remains agent.make_step_batched's jnp pipeline.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from navdv_tpu.config import ScanConfig, SensorConfig
from navdv_tpu.familiarity import PAD_PENALTY, LibraryPack
from navdv_tpu.sensor import scan_lag_sets

TILE_AGENTS = 8


def lag_grid_geometry(sensor: SensorConfig, scan: ScanConfig):
    """Static (qmin, nq, lag_rows): the kernel computes rows for the full
    (q, j) product grid; ``lag_rows[i]`` is the grid row of scan lag i."""
    u = sensor.az_upsample
    lags, window_idx = scan_lag_sets(scan)
    qs = lags // u
    js = lags - qs * u
    qmin, qmax = int(qs.min()), int(qs.max())
    nq = qmax - qmin + 1
    lag_rows = ((qs - qmin) * u + js).astype(np.int32)
    return qmin, nq, lag_rows, window_idx


def _lag_kernel(t2_ref, lib_ref, gamma_ref, out_ref, rows_ref, *, tb, u, r, w, nq, n_rows_pad, flat):
    p = r * w
    for t in range(tb):
        # build candidate rows in VMEM via static slices (rotation = slice)
        for qi in range(nq):
            rows_ref[qi * u : (qi + 1) * u] = t2_ref[t, :, :, qi : qi + w]
        rows3 = rows_ref[:]  # [rows_pad, R, W]
        if flat:
            rows2 = rows3.reshape(n_rows_pad, p)
            cross = jnp.dot(
                rows2,
                lib_ref[:].reshape(-1, p).T,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )  # [rows_pad, Nl]
            rowsq = jnp.sum(rows2 * rows2, axis=1, keepdims=True)
        else:
            nl = lib_ref.shape[0]
            cross = jnp.zeros((n_rows_pad, nl), jnp.float32)
            rowsq = jnp.zeros((n_rows_pad, 1), jnp.float32)
            for ri in range(r):
                rr = rows3[:, ri, :]  # [rows_pad, W]
                cross += jnp.dot(
                    rr,
                    lib_ref[:, ri, :].T,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
                rowsq += jnp.sum(rr * rr, axis=1, keepdims=True)
        d = rowsq + gamma_ref[:] - 2.0 * cross
        # min over library, clamped >= 0 (fp cancellation; parity w/ jnp ref)
        out_ref[t] = jnp.maximum(jnp.min(d, axis=1), 0.0)


def make_lag_fam_pallas(
    sensor: SensorConfig,
    scan: ScanConfig,
    flat: bool = True,
    interpret: bool | None = None,
):
    """Batched SSD familiarity ``(pano f32[B, R, A], lib) -> fam f32[B, Nh]``.

    Consumes the raw fine panorama; pooling, lag extraction, distances, library
    min and RIDF pooling all fused. Requires metric == 'ssd'.
    """
    if scan.metric != "ssd":
        raise ValueError("lag kernel implements SSD only; use jnp path for NCC")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    u, r, w = sensor.az_upsample, sensor.n_radial, sensor.n_azimuth
    a = sensor.n_fine
    qmin, nq, lag_rows, window_idx = lag_grid_geometry(sensor, scan)
    n_rows = nq * u
    n_rows_pad = -(-n_rows // 8) * 8
    assert n_rows_pad == n_rows or True
    tb = TILE_AGENTS
    # jnp-side prep indices: T2[b, j, r, w'] = S[b, r, ((w'+qmin)*u + j) mod A] / u
    wprime = np.arange(2 * w)
    col_idx = jnp.asarray(
        (((wprime[None, :] + qmin) * u + np.arange(u)[:, None]) % a).astype(np.int32)
    )  # [u, 2W]
    fam_rows = jnp.asarray(lag_rows[window_idx])  # [Nh, 2t+1]
    inv_u = 1.0 / u

    kernel = functools.partial(
        _lag_kernel, tb=tb, u=u, r=r, w=w, nq=nq, n_rows_pad=n_rows_pad, flat=flat
    )

    def fam(pano: jnp.ndarray, lib: LibraryPack) -> jnp.ndarray:
        b = pano.shape[0]
        assert b % tb == 0, f"batch {b} must be a multiple of {tb}"
        s = pano
        for j in range(1, u):
            s = s + jnp.roll(pano, -j, axis=2)
        t2 = jnp.transpose(s[:, :, col_idx], (0, 2, 1, 3)) * inv_u  # [B, u, R, 2W]

        nl = lib.views.shape[0]
        nl_pad = -(-nl // 128) * 128
        lib_rw = jnp.pad(
            lib.flat.reshape(nl, r, w), ((0, nl_pad - nl), (0, 0), (0, 0))
        )
        gamma = jnp.pad(
            lib.sq + (1.0 - lib.valid) * PAD_PENALTY,
            (0, nl_pad - nl),
            constant_values=PAD_PENALTY,
        )[None, :]

        m = pl.pallas_call(
            kernel,
            grid=(b // tb,),
            in_specs=[
                pl.BlockSpec((tb, u, r, 2 * w), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((nl_pad, r, w), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, nl_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tb, n_rows_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, n_rows_pad), jnp.float32),
            scratch_shapes=[pltpu.VMEM((n_rows_pad, r, w), jnp.float32)],
            cost_estimate=pl.CostEstimate(
                flops=2 * b * n_rows_pad * r * w * nl_pad,
                bytes_accessed=4 * (b * u * r * 2 * w + nl_pad * r * w + b * n_rows_pad),
                transcendentals=0,
            ),
            interpret=interpret,
        )(t2, lib_rw, gamma)
        return jnp.min(m[:, fam_rows], axis=2)  # [B, Nh] RIDF pool

    return fam
