"""Pallas kernel: batched landscape-window extraction (hot op #3).

XLA lowers the vmapped ``dynamic_slice`` window extraction to per-agent
dynamic-update-slice fusions that run at ~2 GiB/s (profiled: ~1.0 ms/step at
B=1024 — the single largest step cost in the round-1 gather formulation).
This kernel replaces it with direct per-agent band reads.

Mosaic DMA/VMEM slice constraints (f32 tiling (8, 128)): sublane starts must
be provably 8-aligned (callers align down; the remainder rides in the
fractional offset) and lane slices must be 128-aligned. So each agent reads an
aligned [wy, 256] band and the true wx-wide window is extracted with
``pltpu.roll`` (dynamic lane rotation) + a static slice — measured faster than
the round-1 selection-matmul extraction at every config (it replaced B tiny
[wy, BAND] @ [BAND, wx] MXU dots with a VPU shuffle).

Two band sources, selected per call:
  - ``vmem``: the whole landscape resident in VMEM, bands are direct dynamic
    slices. Wins at large batch (B >= 512: +12% end-to-end at BASELINE
    config 1); only valid when the landscape fits the VMEM budget.
  - ``dma``: landscape stays in HBM; per-agent async DMAs into scratch.
    Wins at small batch (config 3's B=128: +5% over vmem) and is the only
    option for big landscapes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BAND = 256  # aligned lane width read per agent
# landscape cells up to which the vmem-resident variant may be used
# (f32: 2M cells = 8 MB of the ~16 MB per-core VMEM)
VMEM_LAND_MAX_ELEMS = 2_000_000
# batch size from which the vmem-resident variant wins end-to-end
VMEM_MIN_BATCH = 512


def _extract(band, xoff, yoff, band_h, wy, wx):
    """band f32[band_h, BAND] -> f32[wy, wx] window at (yoff, xoff): dynamic
    lane AND sublane rotations bring the unaligned window corner to (0, 0) —
    outputting the aligned slack rows would otherwise force the hat matmul to
    contract over band_h=32 instead of wy=24 (25% wasted renderer FLOPs)."""
    r = pltpu.roll(band, BAND - xoff, 1)
    r = pltpu.roll(r, band_h - yoff, 0)
    return r[:wy, :wx]


def _dma_kernel(
    by_ref, bx_ref, xoff_ref, yoff_ref, land_ref, out_ref, band_ref, sems,
    *, tb, band_h, wy, wx,
):
    i = pl.program_id(0)

    def get_dma(t):
        b = i * tb + t
        by = pl.multiple_of(by_ref[b], 8)
        bx = pl.multiple_of(bx_ref[b], 128)  # lane-tile aligned band start
        return pltpu.make_async_copy(
            land_ref.at[pl.ds(by, band_h), pl.ds(bx, BAND)],
            band_ref.at[t],
            sems.at[t],
        )

    for t in range(tb):
        get_dma(t).start()
    for t in range(tb):
        get_dma(t).wait()
        b = i * tb + t
        out_ref[t] = _extract(band_ref[t], xoff_ref[b], yoff_ref[b], band_h, wy, wx)


def _vmem_kernel(
    by_ref, bx_ref, xoff_ref, yoff_ref, land_ref, out_ref, *, tb, band_h, wy, wx
):
    i = pl.program_id(0)
    for t in range(tb):
        b = i * tb + t
        by = pl.multiple_of(by_ref[b], 8)
        bx = pl.multiple_of(bx_ref[b], 128)
        band = land_ref[pl.ds(by, band_h), pl.ds(bx, BAND)]
        out_ref[t] = _extract(band, xoff_ref[b], yoff_ref[b], band_h, wy, wx)


def make_window_gather_pallas(
    wy: int, wx: int, tb: int = 16, interpret: bool | None = None
):
    """``(landscape f32[H, W>=BAND], base_y i32[B], base_x i32[B]) -> f32[B, wy, wx]``.

    base_y/base_x are the TRUE (unaligned) window corners, base_y in
    [0, H-8-wy] against a landscape carrying >=8 replicated bottom rows (the
    8-aligned band start can overrun by up to 7 rows), base_x in [0, W-wx].
    All alignment is internal: aligned band reads + dynamic lane/sublane
    rotations. The band source (vmem-resident vs per-agent DMA) is chosen per
    call from the batch size and landscape footprint.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    band_h = -(-(wy + 7) // 8) * 8  # covers the up-to-7-row align-down slack

    def gather(landscape: jnp.ndarray, base_y: jnp.ndarray, base_x: jnp.ndarray):
        b = base_y.shape[0]
        b_pad = -(-b // tb) * tb  # any batch size: pad with base-0 windows
        if b_pad != b:
            base_y = jnp.pad(base_y, (0, b_pad - b))
            base_x = jnp.pad(base_x, (0, b_pad - b))
        hl, wl = landscape.shape
        assert wl >= BAND, f"landscape width {wl} < {BAND}; pad first"
        # 128-granular band start: off stays < 128 (or <= 232 at the right
        # edge clip), so the wx-wide window never crosses the band end
        bx_band = jnp.minimum((base_x // 128) * 128, wl - BAND)
        xoff = base_x - bx_band
        by_band = (base_y // 8) * 8
        yoff = base_y - by_band  # in [0, 7]

        use_vmem = b_pad >= VMEM_MIN_BATCH and hl * wl <= VMEM_LAND_MAX_ELEMS
        kw = dict(tb=tb, band_h=band_h, wy=wy, wx=wx)
        if use_vmem:
            kernel = functools.partial(_vmem_kernel, **kw)
            in_specs = [
                pl.BlockSpec((hl, wl), lambda i, *_: (0, 0), memory_space=pltpu.VMEM)
            ]
            scratch = []
        else:
            kernel = functools.partial(_dma_kernel, **kw)
            in_specs = [pl.BlockSpec(memory_space=pl.ANY)]  # landscape in HBM
            scratch = [
                pltpu.VMEM((tb, band_h, BAND), jnp.float32),
                pltpu.SemaphoreType.DMA((tb,)),
            ]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,  # by_band, bx_band, xoff, yoff
            grid=(b_pad // tb,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (tb, wy, wx), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            scratch_shapes=scratch,
        )
        out = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((b_pad, wy, wx), jnp.float32),
            interpret=interpret,
        )(by_band, bx_band, xoff, yoff, landscape)
        return out[:b]

    return gather
