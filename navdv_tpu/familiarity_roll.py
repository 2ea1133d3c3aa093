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

import jax
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


def _make_ssd_lowrank(rank, _prepare_rows, _t_planes, _to_grid, _dot_t,
                      grid_rows_dev, u, nq):
    """Exact low-rank split of the SSD cross term (ScanConfig.roll_rank).

    With m the mean library view and l_v - m = U y_v + r_v for ANY basis
    U f32[P, k] (r_v := the exact remainder), the identity

        c.l_v = c.m + (c.U) y_v + c.r_v

    holds in real arithmetic regardless of U's quality. Choosing U as the
    library's top-k principal directions makes |r_v| tiny for smooth route
    libraries (measured |r_v|^2 ~ 1e-4 vs |l|^2 ~ 160 at BASELINE config 2),
    so the only full-width matmul left — c.r_v — can run at ONE bf16 pass:
    its error is bounded by ~|c| |r_v| 2^-9 ~ 3e-4, far below the familiarity
    valley, while the k-wide pieces stay at HIGH. 2.3x fewer MXU pass-FLOPs
    than the dense HIGH cross term at config 2 (k=32).

    The basis comes from an eigendecomposition of the library Gram matrix in
    the per-episode prepare stage; zero-variance directions are zeroed, which
    the identity absorbs exactly (their component rides in r_v).
    """
    hi = matmul_precision("high")

    def prepare(lib: LibraryPack):
        nl = lib.flat.shape[0]
        k = min(rank, nl)
        nv = jnp.maximum(jnp.sum(lib.valid), 1.0)
        m = jnp.sum(lib.flat * lib.valid[:, None], axis=0) / nv  # [P]
        zc = (lib.flat - m[None, :]) * lib.valid[:, None]  # [Nl, P]
        gram = jnp.dot(zc, zc.T, precision=hi)  # [Nl, Nl]
        w, v = jnp.linalg.eigh(gram)  # ascending
        w_top = w[-k:]
        v_top = v[:, -k:]  # [Nl, k]
        ok = w_top > 1e-6 * jnp.maximum(w[-1], 1e-12)
        inv_sig = jnp.where(ok, 1.0 / jnp.sqrt(jnp.maximum(w_top, 1e-12)), 0.0)
        basis = jnp.dot(zc.T, v_top * inv_sig[None, :], precision=hi)  # [P, k]
        y = jnp.dot(zc, basis, precision=hi)  # [Nl, k]
        resid = zc - jnp.dot(y, basis.T, precision=hi)  # [Nl, P] exact remainder
        return (
            _prepare_rows(m[None, :]),  # [nq, P]
            _prepare_rows(basis.T),  # [nq*k, P]
            y,
            _prepare_rows(resid),  # [nq*Nl, P]
        )

    def lib_min(s, lib: LibraryPack, lag_sum, lag_sq, aux=None):
        mmat, umat, y, rmat = prepare(lib) if aux is None else aux
        b = s.shape[0]
        nl = lib.flat.shape[0]
        k = umat.shape[0] // nq
        t2 = _t_planes(s)  # [B*u, P]
        cm = _dot_t(t2, mmat, hi).reshape(b, u, nq)
        cu = _dot_t(t2, umat, hi).reshape(b, u, nq, k)
        cuy = jnp.einsum("bjqk,vk->bjqv", cu, y, precision=hi)
        cr = jax.lax.dot_general(
            t2.astype(jnp.bfloat16),
            rmat.astype(jnp.bfloat16),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(b, u, nq, nl)
        cross = cm[..., None] + cuy + cr
        pen = (1.0 - lib.valid) * PAD_PENALTY
        d = (
            _to_grid(lag_sq)[..., None]
            + (lib.sq + pen)[None, None, None, :]
            - 2.0 * cross
        )
        m_grid = jnp.min(jnp.maximum(d, 0.0), axis=3)  # [B, u, nq]
        return m_grid.reshape(-1, u * nq)[:, grid_rows_dev]  # [B, L]

    lib_min.prepare = prepare
    return lib_min


def _make_ssd_fixed_point(_prepare_rows, _t_planes, grid_rows_dev, u, nq,
                          n_pixels):
    """Exact fixed-point SSD (ScanConfig.fixed_point_bits=8).

    Candidate planes and the pre-rolled library are quantized to the 1/255
    grid (views live in [0, 1]) as CENTERED int8, q = round(255 v) - 128 —
    the common -128 shift cancels in every difference, so

        d[l, v] = sum_p (qc_p - ql_p)^2 / 255^2

    is the EXACT SSD between the 1/255-quantized images. All three SSD terms
    run in integer arithmetic: the cross term is one int8 x int8 -> int32 MXU
    matmul (native on v5e), and the squared norms are int32 reductions of the
    same quantized tensors. The int32 envelope is validated at build time —
    the max quantized SSD is P*255^2, so P beyond ~33k px would silently wrap
    (ADVICE round 3); the invalid-view pad penalty is applied AFTER the f32
    conversion (like the float paths' PAD_PENALTY) so it dominates for every
    sensor size instead of only P <~ 4.1k. The result is a consistent metric
    with ZERO decorrelated per-lag noise — the measured failure mode of every
    approximate reformulation of this cross term (STATUS.md speed-of-light
    section); what changes is the metric itself (8-bit sensor quantization),
    which the recall gate arbitrates.
    """
    inv_s2 = 1.0 / (255.0 * 255.0)
    max_d = int(n_pixels) * 255 * 255  # worst-case quantized SSD
    if max_d >= 2**31:
        raise ValueError(
            f"fixed_point_bits=8 exceeds the int32 budget: {n_pixels} px "
            f"gives max quantized SSD {max_d:.3g} >= 2^31 (silent wraparound);"
            f" use a float fam path for sensors this large"
        )

    def _quant(x: jnp.ndarray) -> jnp.ndarray:
        return (
            jnp.clip(jnp.round(x * 255.0), 0.0, 255.0).astype(jnp.int32) - 128
        ).astype(jnp.int8)

    def prepare(lib: LibraryPack):
        qz = _quant(_prepare_rows(lib.flat))  # [nq*Nl, P] int8
        qz_sq = jnp.sum(
            qz.astype(jnp.int32) * qz.astype(jnp.int32), axis=1
        )  # [nq*Nl], columns are (q-major, v)
        return qz, qz_sq

    def lib_min(s, lib: LibraryPack, lag_sum, lag_sq, aux=None):
        qz, qz_sq = prepare(lib) if aux is None else aux
        b = s.shape[0]
        nl = lib.valid.shape[0]
        qt = _quant(_t_planes(s))  # [B*u, P] int8
        qti = qt.astype(jnp.int32)
        qc_sq = jnp.sum(qti * qti, axis=1)  # [B*u]
        cross = jax.lax.dot_general(
            qt, qz, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
        )  # [B*u, nq*Nl] int32, exact
        d = qc_sq[:, None] + qz_sq[None, :] - 2 * cross  # exact, in [0, max_d]
        pen = (1.0 - lib.valid) * PAD_PENALTY  # f32 [Nl]: always dominates
        df = (
            d.reshape(b, u, nq, nl).astype(jnp.float32) * inv_s2
            + pen[None, None, None, :]
        )
        m_grid = jnp.min(df, axis=3)  # [B, u, nq]
        return m_grid.reshape(b, u * nq)[:, grid_rows_dev]  # [B, L]

    lib_min.prepare = prepare
    return lib_min


def make_lib_min_roll(sensor: SensorConfig, scan: ScanConfig, lags: np.ndarray):
    """Per-lag library minimum via the rolled-library matmul:
    ``lib_min(S f32[B, R, A], lib, lag_sum f32[B, L], lag_sq f32[B, L],
    aux=None) -> M f32[B, L]`` — same contract as the fft path (consumes the
    pooled panorama, no candidate extraction). ``lib_min.prepare(lib)``
    builds the pre-rolled library once per episode."""
    if scan.metric not in ("ssd", "ncc"):
        raise ValueError(f"unknown familiarity metric {scan.metric!r}")
    if scan.roll_rank > 0 and scan.metric != "ssd":
        # the low-rank split is an SSD cross-term identity; silently ignoring
        # the knob on NCC would read as "low-rank is free" (ADVICE round 2)
        raise ValueError(
            f"ScanConfig.roll_rank={scan.roll_rank} requires metric='ssd' "
            f"(got {scan.metric!r})"
        )
    if scan.fixed_point_bits and scan.metric != "ssd":
        # same silent-no-op failure mode as roll_rank: the fixed-point path
        # is an SSD identity only (ADVICE round 3)
        raise ValueError(
            f"ScanConfig.fixed_point_bits={scan.fixed_point_bits} requires "
            f"metric='ssd' (got {scan.metric!r})"
        )
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
        """zrows f32[Nl, P] -> pre-rolled library f32[|Q|*Nl, P] (q-major
        rows: the matmul output grid is then [(b, j), (q, v)]).

        Returned TRANSPOSED (P minor) and consumed via :func:`_dot_t` — this
        is the layout XLA's RHS-transposed matmul wants at rest, so the
        library is never relayouted (the [P, cols] orientation cost a
        profiled ~92 us/step HBM conversion at BASELINE config 2)."""
        nl = zrows.shape[0]
        zr = zrows.reshape(nl, r, w)
        zrolled = zr[:, :, roll_idx]  # [Nl, R, nq, W]
        return jnp.transpose(zrolled, (2, 0, 1, 3)).reshape(nq * nl, r * w)

    def _dot_t(lhs: jnp.ndarray, rows: jnp.ndarray, precision) -> jnp.ndarray:
        """``lhs f32[M, P] x rows f32[N, P] -> f32[M, N]`` contracting P on
        both (RHS-transposed matmul, native on the MXU)."""
        return jax.lax.dot_general(
            lhs, rows, (((1,), (1,)), ((), ())), precision=precision
        )

    def _t_planes(s: jnp.ndarray) -> jnp.ndarray:
        """S f32[B,R,A] -> residue phase planes f32[B*u, R*W]:
        T[b, j, r, w] = S[b, r, w*u + j] / u (one transpose, no gather)."""
        b = s.shape[0]
        t = jnp.transpose(s.reshape(b, r, w, u), (0, 3, 1, 2)) * inv_u
        return t.reshape(b * u, r * w)

    def _cross_grid(s: jnp.ndarray, zmat: jnp.ndarray) -> jnp.ndarray:
        """(S f32[B,R,A], prepared f32[|Q|*Nl, P]) -> f32[B, u, nq, Nl]
        where [b, j, qi, v] = cross of lag (j, q) against view v."""
        b = s.shape[0]
        nl = zmat.shape[0] // nq
        cg = _dot_t(_t_planes(s), zmat, prec)  # [B*u, nq*Nl]
        return cg.reshape(b, u, nq, nl)  # free: rows (b,u), cols (nq,nl)

    def _to_grid(per_lag: jnp.ndarray) -> jnp.ndarray:
        """[B, L] per-lag values -> [B, u, nq] grid (static scatter; unused
        cells carry a duplicate value that is never gathered back)."""
        return per_lag[:, inv_rows_dev].reshape(-1, u, nq)

    if scan.metric == "ssd":
        if scan.fixed_point_bits:
            if scan.fixed_point_bits != 8:
                raise ValueError(
                    f"fixed_point_bits must be 0 or 8, got {scan.fixed_point_bits}"
                )
            if scan.roll_rank > 0:
                raise ValueError("fixed_point_bits and roll_rank are exclusive")
            return _make_ssd_fixed_point(
                _prepare_rows, _t_planes, grid_rows_dev, u, nq,
                sensor.n_pixels,
            )
        if scan.roll_rank > 0:
            return _make_ssd_lowrank(
                scan.roll_rank, _prepare_rows, _t_planes, _to_grid, _dot_t,
                grid_rows_dev, u, nq,
            )

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
        # zsum ([Nl], ≈0 for z-scored views; kept exact) belongs in the
        # prepare aux: per step it is a full [Nl, P] reduction inside the
        # episode scan, riding on the XLA loop-invariant hoisting this
        # module's prepare stage exists because XLA was measured to lose
        return _prepare_rows(lib.z), jnp.sum(lib.z, axis=1)

    def lib_min(s, lib: LibraryPack, lag_sum, lag_sq, aux=None):
        if aux is None:
            aux = prepare(lib)
        rows, zsum = aux
        cg = _cross_grid(s, rows)
        pen = (1.0 - lib.valid) * PAD_PENALTY
        mu = _to_grid(lag_sum / p)  # [B, u, nq]
        var = jnp.maximum(_to_grid(lag_sq / p) - mu * mu, 0.0)
        sigma = jnp.sqrt(var + NCC_EPS)
        zdot = (cg - mu[..., None] * zsum[None, None, None, :]) / sigma[..., None]
        d = 1.0 - zdot / p + pen[None, None, None, :]
        m_grid = jnp.min(d, axis=3)  # [B, u, nq]
        return m_grid.reshape(-1, u * nq)[:, grid_rows_dev]  # [B, L]

    lib_min.prepare = prepare
    return lib_min
