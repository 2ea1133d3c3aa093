"""Pallas TPU kernel for the batched familiarity reduction (the hot op).

The BASELINE north-star names this kernel explicitly: "a single Pallas kernel
computing batched SSD/NCC image distances over (candidate headings x library
views), reduced by argmin" (/root/repo/BASELINE.json:5).

Formulation: both metrics reduce to

    d[row, v] = alpha * <a_row, b_v> + beta[row] + gamma[v]

with  SSD:  a = cand,        b = lib.flat,  alpha = -2,   beta = |c|^2, gamma = |l|^2
      NCC:  a = zscore(cand), b = lib.z,    alpha = -1/P, beta = 1,     gamma = 0
and the library-padding penalty folded into gamma, so one kernel serves both.
The kernel tiles rows=(B*Ne candidates) x lib x pixels on the MXU with fp32
accumulation and a fused running-min over library tiles — the full [rows, Nl]
distance matrix never exists in HBM (SURVEY.md §5.7 "blockwise min-reduction",
the online-softmax-shaped trick of this domain).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from navdv_tpu.config import ScanConfig, SensorConfig
from navdv_tpu.familiarity import PAD_PENALTY, LibraryPack, zscore

# VMEM budget: (TILE_ROWS + TILE_LIB) * TILE_P * 4B * 2 (double buffering)
# + TILE_ROWS * TILE_LIB * 4B (acc scratch) must stay well under the 16MB
# per-core VMEM — 256/256/2304 uses ~9.7MB
TILE_ROWS = 256  # candidate rows per program (MXU sublane-friendly)
TILE_LIB = 256  # library tile (lanes)
TILE_P = 2304  # pixel (contraction) tile


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _round_up(a: int, b: int) -> int:
    return _cdiv(a, b) * b


def _min_kernel(
    a_ref, b_ref, gamma_ref, out_ref, acc_ref, rowsq_ref, *, alpha, with_rowsq, np_tiles
):
    """grid = (row_tiles, lib_tiles, p_tiles); p innermost, then lib.

    acc accumulates the cross term over p tiles; at the last p tile the
    distance tile is formed and min-reduced into out (running min over lib).
    With ``with_rowsq`` (SSD), the per-row squared norm is accumulated from the
    already-VMEM-resident a tiles on the first lib pass — no extra HBM read.
    """
    j = pl.program_id(1)
    p = pl.program_id(2)

    @pl.when(p == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    a = a_ref[:]
    # HIGHEST forces true-fp32 MXU passes: the SSD decomposition cancels
    # catastrophically at bf16 (distances ~1 on norms ~350), which zeroes
    # near-route distances and destroys the argmin (observed: 0% recall)
    acc_ref[:] += jnp.dot(
        a,
        b_ref[:].T,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )

    if with_rowsq:
        @pl.when(j == 0)
        def _():
            part = jnp.sum(a * a, axis=1, keepdims=True)
            @pl.when(p == 0)
            def _():
                rowsq_ref[:] = part
            @pl.when(p > 0)
            def _():
                rowsq_ref[:] += part

    @pl.when(p == np_tiles - 1)
    def _():
        beta = rowsq_ref[:] if with_rowsq else 1.0
        d = alpha * acc_ref[:] + beta + gamma_ref[:]
        m = jnp.min(d, axis=1, keepdims=True)  # [TILE_ROWS, 1]

        @pl.when(j == 0)
        def _():
            out_ref[:] = m

        @pl.when(j > 0)
        def _():
            out_ref[:] = jnp.minimum(out_ref[:], m)


def min_distance_rows(
    a: jnp.ndarray,
    b: jnp.ndarray,
    gamma: jnp.ndarray,
    alpha: float,
    with_rowsq: bool,
    interpret: bool = False,
) -> jnp.ndarray:
    """min over v of ``alpha * (a @ b.T) + beta[:, None] + gamma[None, :]``
    where beta = per-row |a|^2 (SSD, accumulated in-kernel from the VMEM-
    resident tiles — no extra HBM pass) or the constant 1 (NCC).

    a: f32[rows, P], b: f32[Nl, P], gamma: f32[Nl] -> f32[rows].
    Pads every axis internally (gamma pad = +PAD_PENALTY so padded library
    columns never win; row pads are discarded).
    """
    rows, p = a.shape
    nl = b.shape[0]
    rows_p = _round_up(rows, TILE_ROWS)
    nl_p = _round_up(nl, min(TILE_LIB, _round_up(nl, 128)))
    tile_lib = min(TILE_LIB, nl_p)
    p_p = _round_up(p, min(TILE_P, _round_up(p, 128)))
    tile_p = min(TILE_P, p_p)

    a = jnp.pad(a, ((0, rows_p - rows), (0, p_p - p)))
    b = jnp.pad(b, ((0, nl_p - nl), (0, p_p - p)))
    gamma = jnp.pad(gamma, (0, nl_p - nl), constant_values=PAD_PENALTY)[None, :]

    grid = (rows_p // TILE_ROWS, nl_p // tile_lib, p_p // tile_p)
    kernel = functools.partial(
        _min_kernel, alpha=alpha, with_rowsq=with_rowsq, np_tiles=grid[2]
    )

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_ROWS, tile_p), lambda i, j, p: (i, p), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_lib, tile_p), lambda i, j, p: (j, p), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_lib), lambda i, j, p: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_ROWS, 1), lambda i, j, p: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows_p, 1), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((TILE_ROWS, tile_lib), jnp.float32),
            pltpu.VMEM((TILE_ROWS, 1), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * rows_p * nl_p * p_p,
            bytes_accessed=4 * (rows_p * p_p + grid[0] * nl_p * p_p + rows_p),
            transcendentals=0,
        ),
        interpret=interpret,
    )(a, b, gamma)
    return out[:rows, 0]


def _metric_min_rows(metric: str, rows, lib: LibraryPack, p: int, interpret):
    """One place for the metric -> kernel-parameter mapping (a/b/gamma/alpha/
    with_rowsq) and the parity-critical SSD clamp — both public entry points
    dispatch through it so they cannot desynchronize."""
    pen = (1.0 - lib.valid) * PAD_PENALTY
    if metric == "ssd":
        m = min_distance_rows(
            rows, lib.flat, lib.sq + pen, -2.0, True, interpret=interpret
        )
        return jnp.maximum(m, 0.0)  # clamp fp cancellation (parity w/ jnp ref)
    return min_distance_rows(
        zscore(rows), lib.z, pen, -1.0 / p, False, interpret=interpret
    )


def make_lib_min_pallas(
    sensor: SensorConfig, scan: ScanConfig, interpret: bool | None = None
):
    """Per-lag library minimum: ``(cand f32[B, L, P], lib) -> M f32[B, L]``.

    The production kernel entry used by agent.make_step_batched (the RIDF
    window pooling happens outside on the tiny [B, L] result).
    """
    if scan.metric not in ("ssd", "ncc"):
        raise ValueError(f"unknown familiarity metric {scan.metric!r}")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    def lib_min(cand: jnp.ndarray, lib: LibraryPack) -> jnp.ndarray:
        b, nl_rows, p = cand.shape
        rows = cand.reshape(b * nl_rows, p)
        m = _metric_min_rows(scan.metric, rows, lib, p, interpret)
        return m.reshape(b, nl_rows)

    return lib_min


def make_familiarity_batched_pallas(
    sensor: SensorConfig, scan: ScanConfig, interpret: bool | None = None
):
    """Batched fam: ``(cand_ext f32[B, Ne, P], lib) -> f32[B, Nh]``.

    Matches the jnp reference (familiarity.make_familiarity_jnp vmapped) to fp
    tolerance; tests/test_pallas.py bit-compares on CPU interpret mode and on
    device. ``interpret=None`` auto-selects interpreter mode off-TPU so the
    same code path runs under the CPU test mesh (SURVEY.md §7 "keep kernels
    interpret=True-testable").
    """
    if scan.metric not in ("ssd", "ncc"):
        raise ValueError(f"unknown familiarity metric {scan.metric!r}")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    w = 2 * scan.tol_bins + 1
    nh = scan.n_headings

    def fam(cand_ext: jnp.ndarray, lib: LibraryPack) -> jnp.ndarray:
        b, ne, p = cand_ext.shape
        rows = cand_ext.reshape(b * ne, p)
        m = _metric_min_rows(scan.metric, rows, lib, p, interpret)
        # RIDF min-pool over the tolerance window, per heading (SEMANTICS.md §4)
        return m.reshape(b, nh, w).min(axis=2)

    return fam
