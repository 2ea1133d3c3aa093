"""Convolutional familiarity path (non-default: an earlier round's fastest
formulation, since beaten by the spectral/rolled paths at every BASELINE
config — kept as an engineering record and cross-check; see COMPONENTS.md).

The per-lag cross term sum_{r,w} S[r, w*u + s] * lib[v, r, w] over ALL scan
lags s is exactly a 1D valid convolution over azimuth: split the prefix-pooled
panorama S by azimuth residue j = s mod u into T[j, r, w] = S[r, w*u+j]/u,
shift-extend over the q = s // u range, and one ``lax.conv_general_dilated``
([B*u, R, width] x [Nl, R, W]) computes every (j, q) lag on the MXU — no
[B, L, P] candidate tensor, no layout copies, no separate norm pass (row norms
and means are the same conv with a ones filter). Profiled ~3x faster than the
round-1 extract-then-matmul path at BASELINE config 1, but slower than the
extraction-free fft/roll matmul paths that replaced both.

Numerics match familiarity.distance_matrix to fp32 tolerance
(tests/test_conv_fam.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from navdv_tpu.config import ScanConfig, SensorConfig
from navdv_tpu.familiarity import NCC_EPS, PAD_PENALTY, LibraryPack, matmul_precision
from navdv_tpu.sensor import make_pooled_panorama, scan_lag_sets


def conv_lag_geometry(sensor: SensorConfig, scan: ScanConfig):
    """Static mapping from scan lags to the (j, q_hat) conv output grid."""
    u = sensor.az_upsample
    lags, window_idx = scan_lag_sets(scan)
    qs = lags // u  # floor division (works for negative lags)
    js = lags - qs * u  # in [0, u)
    qmin, qmax = int(qs.min()), int(qs.max())
    qrange = qmax - qmin + 1
    # row index of lag i in the [u, qrange] conv-output grid
    lag_rows = (js * qrange + (qs - qmin)).astype(np.int32)
    return lags, window_idx, qmin, qrange, lag_rows


def _conv1d(lhs: jnp.ndarray, rhs: jnp.ndarray, prec) -> jnp.ndarray:
    """lhs f32[N, C, WIDTH] (*) rhs f32[O, C, W] -> f32[N, O, WIDTH-W+1]."""
    return jax.lax.conv_general_dilated(
        lhs,
        rhs,
        window_strides=(1,),
        padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        precision=prec,
    )


def make_fam_conv(sensor: SensorConfig, scan: ScanConfig):
    """Batched familiarity ``(pano f32[B, R, A], lib) -> fam f32[B, Nh]``.

    Consumes the raw fine panorama (pooling folded in) and produces the
    RIDF-pooled per-heading familiarity directly.
    """
    if scan.metric not in ("ssd", "ncc"):
        raise ValueError(f"unknown familiarity metric {scan.metric!r}")
    prec = matmul_precision(scan.matmul_precision)
    u, r, w = sensor.az_upsample, sensor.n_radial, sensor.n_azimuth
    a = sensor.n_fine
    p = sensor.n_pixels
    lags, window_idx, qmin, qrange, lag_rows = conv_lag_geometry(sensor, scan)
    width = qrange - 1 + w
    # static gather index building T-extended: text[j, r, w'] = S[r, ((w'+qmin)*u + j) mod A]
    wprime = np.arange(width)
    col_idx = ((wprime[None, :] + qmin) * u + np.arange(u)[:, None]) % a  # [u, width]
    col_idx = jnp.asarray(col_idx.astype(np.int32))
    # fam row gather: window_idx maps (heading, delta) -> lag index -> conv row
    fam_rows = jnp.asarray(lag_rows[window_idx])  # [Nh, 2t+1]
    inv_u = 1.0 / u
    pooled = make_pooled_panorama(sensor)  # shared circular prefix-pool

    def fam(pano: jnp.ndarray, lib: LibraryPack) -> jnp.ndarray:
        b = pano.shape[0]
        s = pooled(pano)
        text = s[:, :, col_idx] * inv_u  # [B, R, u, width]
        lhs = jnp.transpose(text, (0, 2, 1, 3)).reshape(b * u, r, width)

        pen = (1.0 - lib.valid) * PAD_PENALTY
        if scan.metric == "ssd":
            rhs = lib.flat.reshape(-1, r, w)
            cross = _conv1d(lhs, rhs, prec)  # [B*u, Nl, qrange]
            ones = jnp.ones((1, r, w), jnp.float32)
            rowsq = _conv1d(lhs * lhs, ones, prec)  # [B*u, 1, qrange]
            gamma = lib.sq + pen
            d = rowsq + gamma[None, :, None] - 2.0 * cross
            d = jnp.maximum(d, 0.0)  # clamp fp cancellation
        else:
            zlib = lib.z.reshape(-1, r, w)
            cross = _conv1d(lhs, zlib, prec)  # [B*u, Nl, qrange]
            ones = jnp.ones((1, r, w), jnp.float32)
            rowsum = _conv1d(lhs, ones, prec)  # [B*u, 1, qrange]
            rowsq = _conv1d(lhs * lhs, ones, prec)
            mu = rowsum / p
            var = jnp.maximum(rowsq / p - mu * mu, 0.0)
            sigma = jnp.sqrt(var + NCC_EPS)
            zsum = jnp.sum(lib.z, axis=1)  # [Nl]
            zdot = (cross - mu * zsum[None, :, None]) / sigma
            d = 1.0 - zdot / p + pen[None, :, None]

        m = jnp.min(d, axis=1)  # [B*u, qrange] min over library
        m = m.reshape(b, u * qrange)
        return jnp.min(m[:, fam_rows], axis=2)  # [B, Nh] RIDF pool

    return fam
