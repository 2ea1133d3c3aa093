"""L1: on-device polar-panorama renderer (SEMANTICS.md §3; SURVEY.md §7 sensor.py).

TPU-first design (SURVEY.md §3.3 structural insight): render ONE fine-azimuth
panorama per *position*; every candidate-heading view is a cyclic shift +
mean-pool of it, so the 60-renders-per-step loop of the reference collapses to
a single gather pass. Sample coordinates are a static polar offset grid rotated
by the heading (two FMAs per sample) — no trig per pixel, no dynamic shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from navdv_tpu.config import SensorConfig, ScanConfig


def polar_offsets(cfg: SensorConfig) -> tuple[np.ndarray, np.ndarray]:
    """Static heading-relative sample offsets (dx0, dy0), each f32[R, A].

    Column a looks along relative azimuth alpha_a = (a + 0.5)*binw - pi; the
    world-frame sample point for heading theta is
    ``xy + Rot(theta) @ (dx0, dy0)`` (SEMANTICS.md §3).
    """
    a = np.arange(cfg.n_fine)
    alpha = (a + 0.5) * cfg.bin_width - np.pi
    d = np.linspace(cfg.r_min, cfg.r_max, cfg.n_radial)
    dx0 = (d[:, None] * np.cos(alpha)[None, :]).astype(np.float32)
    dy0 = (d[:, None] * np.sin(alpha)[None, :]).astype(np.float32)
    return dx0, dy0


def candidate_col_index(sensor: SensorConfig, shifts: np.ndarray) -> np.ndarray:
    """Static gather index i32[Ns, W] into the *pooled* panorama:
    row s, col w -> ``(w*u + shifts[s]) mod A`` (see make_candidate_views)."""
    base = np.arange(sensor.n_azimuth) * sensor.az_upsample
    return ((base[None, :] + shifts[:, None]) % sensor.n_fine).astype(np.int32)


def bilinear_sample(landscape: jnp.ndarray, xs: jnp.ndarray, ys: jnp.ndarray) -> jnp.ndarray:
    """Edge-clamped bilinear sample of landscape[y, x]; xs/ys any shape."""
    h, w = landscape.shape
    xs = jnp.clip(xs, 0.0, w - 1.0)
    ys = jnp.clip(ys, 0.0, h - 1.0)
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, w - 2)
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, h - 2)
    fx = xs - x0
    fy = ys - y0
    flat = landscape.reshape(-1)
    idx = y0 * w + x0
    v00 = jnp.take(flat, idx, axis=0)
    v01 = jnp.take(flat, idx + 1, axis=0)
    v10 = jnp.take(flat, idx + w, axis=0)
    v11 = jnp.take(flat, idx + w + 1, axis=0)
    return (
        v00 * (1 - fy) * (1 - fx)
        + v01 * (1 - fy) * fx
        + v10 * fy * (1 - fx)
        + v11 * fy * fx
    )


def make_render_panorama_gather(sensor: SensorConfig):
    """Gather-based reference renderer (slow on TPU; kept for parity tests).

    ``render(landscape, xy, theta) -> f32[R, A]`` with static offsets baked in
    as compile-time constants.
    """
    dx0, dy0 = polar_offsets(sensor)
    dx0 = jnp.asarray(dx0)
    dy0 = jnp.asarray(dy0)

    def render(landscape: jnp.ndarray, xy: jnp.ndarray, theta: jnp.ndarray) -> jnp.ndarray:
        c, s = jnp.cos(theta), jnp.sin(theta)
        xs = xy[0] + c * dx0 - s * dy0
        ys = xy[1] + s * dx0 + c * dy0
        return bilinear_sample(landscape, xs, ys)

    return render


def window_size(sensor: SensorConfig) -> int:
    """Side of the square landscape window that covers the sensor footprint
    (radius r_max) plus bilinear/fractional margin."""
    return int(np.ceil(2 * sensor.r_max)) + 4


def make_render_panorama(sensor: SensorConfig):
    """Production TPU renderer: ``render(landscape, xy, theta) -> f32[R, A]``.

    TPU-first formulation (SURVEY.md §7 hard-part 1): instead of a 4-tap HBM
    gather per polar sample (TPUs execute large gathers very poorly — measured
    170 ms/step at B=1024), take one ``dynamic_slice`` window around the agent
    and evaluate bilinear interpolation as two *hat-weight matmul* contractions
    against the window: out[r,a] = sum_pq hat(ys-p) hat(xs-q) win[p,q]. The
    hat weights are dense VPU elementwise ops and the contraction runs on the
    MXU — no gathers anywhere. Exact bilinear (matches the gather renderer to
    ~1e-7; tests/test_sensor.py), 46x faster end-to-end.

    Edge semantics match SEMANTICS.md §1: the window base is clipped into the
    landscape and sample coords clamp to the window, which reproduces
    edge-clamped sampling of the full landscape.
    """
    dx0, dy0 = polar_offsets(sensor)
    dx0 = jnp.asarray(dx0)
    dy0 = jnp.asarray(dy0)
    wsz = window_size(sensor)
    half = wsz // 2
    iota_w = jnp.arange(wsz, dtype=jnp.float32)

    def render(landscape: jnp.ndarray, xy: jnp.ndarray, theta: jnp.ndarray) -> jnp.ndarray:
        hl, wl = landscape.shape
        base_x = jnp.clip(jnp.floor(xy[0]).astype(jnp.int32) - half, 0, wl - wsz)
        base_y = jnp.clip(jnp.floor(xy[1]).astype(jnp.int32) - half, 0, hl - wsz)
        win = jax.lax.dynamic_slice(landscape, (base_y, base_x), (wsz, wsz))
        fx = xy[0] - base_x.astype(jnp.float32)
        fy = xy[1] - base_y.astype(jnp.float32)
        c, s = jnp.cos(theta), jnp.sin(theta)
        xs = jnp.clip(fx + c * dx0 - s * dy0, 0.0, wsz - 1.0)
        ys = jnp.clip(fy + s * dx0 + c * dy0, 0.0, wsz - 1.0)
        wx = jnp.maximum(0.0, 1.0 - jnp.abs(xs[..., None] - iota_w))  # [R, A, W]
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(ys[..., None] - iota_w))  # [R, A, W]
        # plain-bf16 MXU passes lose ~6e-2 absolute here; HIGH (bf16x3) keeps parity
        t = jnp.einsum("rap,pq->raq", wy, win, precision=jax.lax.Precision.HIGH)
        return jnp.sum(t * wx, axis=-1)

    return render


def window_geometry(sensor: SensorConfig) -> tuple[int, int]:
    """(wy, wx) window shape for the batched renderer: both axes are the
    minimal footprint cover — the window kernel normalizes DMA alignment
    internally with dynamic lane/sublane rotations (ops/window_pallas.py), so
    the hat matmul contracts over exactly the footprint rows (the round-1
    wy=32 carried 8 alignment-slack rows = 25% wasted renderer FLOPs)."""
    wx = window_size(sensor)
    return wx, wx


def _render_scaffold(sensor: SensorConfig, window_impl: str):
    """Shared batched-renderer plumbing for make_render_batch and
    make_render_batch_rolled: window-gather impl selection, hat_dtype
    validation, and the fusion-cliff chunk policy.

    Chunk policy: for tall sensors at larger batches XLA stops fusing the
    hat reduce into the einsum and materializes the f32 [B,R,A,wx]
    intermediate to HBM (profiled 1.7 ms/step of pure traffic at BASELINE
    config 3, B=256) — render in 128-agent chunks. Small sensors (config 1's
    R=16) fuse fine unchunked at B=1024, and chunk at 1024 beyond that
    (B=2048 unchunked: 841k steps/s; chunked: 856k — bench.py SPEC_BATCH).
    """
    if window_impl == "auto":
        window_impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if sensor.hat_dtype not in ("float32", "bfloat16"):
        raise ValueError(f"unknown hat_dtype {sensor.hat_dtype!r}")
    wy_sz, wx_sz = window_geometry(sensor)
    if window_impl == "pallas":
        from navdv_tpu.ops.window_pallas import make_window_gather_pallas

        gather_win = make_window_gather_pallas(wy_sz, wx_sz)
    elif window_impl == "xla":
        def gather_win(landscape, by, bx):
            return jax.vmap(
                lambda y, x: jax.lax.dynamic_slice(landscape, (y, x), (wy_sz, wx_sz))
            )(by, bx)
    else:
        raise ValueError(f"unknown window_impl {window_impl!r}")
    chunk_b = 128 if sensor.n_radial >= 32 else 1024
    return gather_win, chunk_b, sensor.hat_dtype == "bfloat16"


def _chunk_over_agents(render_chunk, chunk_b: int, landscape, *per_agent):
    """Apply ``render_chunk(landscape, *per_agent_slices)`` in chunk_b-agent
    chunks along axis 0 and concatenate (the fusion-cliff guard)."""
    b = per_agent[0].shape[0]
    if chunk_b and b > chunk_b:
        return jnp.concatenate(
            [
                render_chunk(landscape, *(x[i : i + chunk_b] for x in per_agent))
                for i in range(0, b, chunk_b)
            ],
            axis=0,
        )
    return render_chunk(landscape, *per_agent)


def _chunk_over_agents_tuple(render_chunk, chunk_b: int, landscape, *per_agent):
    """Tuple-output variant of :func:`_chunk_over_agents` (the fused sector
    renderer returns (spec, rowsum, rowsq) per chunk)."""
    b = per_agent[0].shape[0]
    if chunk_b and b > chunk_b:
        outs = [
            render_chunk(landscape, *(x[i : i + chunk_b] for x in per_agent))
            for i in range(0, b, chunk_b)
        ]
        return tuple(
            jnp.concatenate([o[t] for o in outs], axis=0)
            for t in range(len(outs[0]))
        )
    return render_chunk(landscape, *per_agent)


def make_render_batch(sensor: SensorConfig, window_impl: str = "auto"):
    """Batched production renderer ``(landscape, xy f32[B,2], theta f32[B]) ->
    pano f32[B, R, A]``.

    Same hat-weight matmul math as make_render_panorama, but the window
    extraction is pluggable: XLA's vmapped dynamic_slice runs at ~2 GiB/s
    (profiled ~1 ms/step at B=1024), so on TPU it defaults to the Pallas
    window-gather kernel (which handles all DMA alignment internally).
    """
    gather_win, chunk_b, hat_bf16 = _render_scaffold(sensor, window_impl)
    dx0, dy0 = polar_offsets(sensor)
    dx0 = jnp.asarray(dx0)
    dy0 = jnp.asarray(dy0)
    wy_sz, wx_sz = window_geometry(sensor)
    half = wx_sz // 2
    iota_x = jnp.arange(wx_sz, dtype=jnp.float32)
    iota_y = jnp.arange(wy_sz, dtype=jnp.float32)

    def render_b(landscape: jnp.ndarray, xy: jnp.ndarray, theta: jnp.ndarray):
        return _chunk_over_agents(_render_chunk, chunk_b, landscape, xy, theta)

    def _render_chunk(landscape: jnp.ndarray, xy: jnp.ndarray, theta: jnp.ndarray):
        hl, wl = landscape.shape
        # edge-replicate 8 extra rows: the kernel's 8-aligned band start can
        # overrun the bottom edge by up to 7 rows, and clamping into the
        # replicated rows reproduces exact edge-clamp semantics. Columns pad
        # to the DMA band width if the landscape is narrower. Loop-invariant
        # -> XLA hoists this out of the episode scan.
        land_pad = jnp.concatenate(
            [landscape, jnp.tile(landscape[-1:], (8, 1))], axis=0
        )
        if wl < 256:
            land_pad = jnp.concatenate(
                [land_pad, jnp.tile(land_pad[:, -1:], (1, 256 - wl))], axis=1
            )
        bx = jnp.clip(jnp.floor(xy[:, 0]).astype(jnp.int32) - half, 0, wl - wx_sz)
        by = jnp.clip(jnp.floor(xy[:, 1]).astype(jnp.int32) - half, 0, hl - wy_sz)
        wins = gather_win(land_pad, by, bx)  # [B, wy, wx]
        fx = xy[:, 0] - bx.astype(jnp.float32)
        fy = xy[:, 1] - by.astype(jnp.float32)
        c = jnp.cos(theta)
        s = jnp.sin(theta)
        bcast = lambda v: v[:, None, None]
        xs = jnp.clip(bcast(fx) + bcast(c) * dx0 - bcast(s) * dy0, 0.0, wx_sz - 1.0)
        ys = jnp.clip(bcast(fy) + bcast(s) * dx0 + bcast(c) * dy0, 0.0, wy_sz - 1.0)
        wxh = jnp.maximum(0.0, 1.0 - jnp.abs(xs[..., None] - iota_x))  # [B,R,A,wx]
        wyh = jnp.maximum(0.0, 1.0 - jnp.abs(ys[..., None] - iota_y))  # [B,R,A,wy]
        if hat_bf16:
            # hat tensors dominate renderer HBM traffic (~660 MB/step at
            # BASELINE config 3); bf16 halves it, accumulation stays f32
            t = jnp.einsum(
                "braq,bpq->brap",
                wxh.astype(jnp.bfloat16),
                wins.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
            return jnp.sum(t * wyh.astype(jnp.bfloat16).astype(jnp.float32), axis=-1)
        t = jnp.einsum(
            "braq,bpq->brap", wxh, wins, precision=jax.lax.Precision.HIGH
        )  # [B,R,A,wy]
        return jnp.sum(t * wyh, axis=-1)

    return render_b


def sector_bounds(
    sensor: SensorConfig, n_sectors: int, ring_blocks: int = 1
) -> list[tuple[int, int, int, int, int, int]]:
    """Static per-piece hat support:
    ``[(ring_lo, n_rings, row_lo, n_rows, col_lo, n_cols)]`` over
    ``ring_blocks x n_sectors`` pieces (ring-block-major order).

    With the heading decomposed as ``theta = k*bin_width + phi``
    (|phi| <= bin_width/2), the in-window sample position for azimuth column
    ``a`` is ``frac(xy) + half + Rot(phi) @ (dx0, dy0)[:, a]`` — nearly static.
    For each contiguous block of (rings x azimuth columns) the reachable
    positions span a small static box; the hat weights are zero outside it,
    so the bilinear contraction only needs that slice of the window (~11x11
    of 24x24 at the default sensor with 8 sectors; inner-ring blocks are
    smaller still — 2 ring blocks cut weight elements a further 23% at the
    BASELINE config-3 sensor).
    """
    a = sensor.n_fine
    if a % n_sectors:
        raise ValueError(f"n_fine {a} not divisible by n_sectors {n_sectors}")
    dx0, dy0 = polar_offsets(sensor)
    wsz = window_size(sensor)
    half = wsz // 2
    binw = sensor.bin_width
    a_s = a // n_sectors
    # more blocks than rings would produce empty blocks (and zero-size
    # reductions below); clamp — the extra blocks could never help anyway
    blocks = np.array_split(
        np.arange(sensor.n_radial), min(ring_blocks, sensor.n_radial)
    )
    out = []
    for rb in blocks:
        for s in range(n_sectors):
            cols = np.arange(s * a_s, (s + 1) * a_s)
            txs, tys = [], []
            for phi in (-binw / 2, 0.0, binw / 2):
                c, si = np.cos(phi), np.sin(phi)
                dxb = dx0[np.ix_(rb, cols)]
                dyb = dy0[np.ix_(rb, cols)]
                txs.append(c * dxb - si * dyb)
                tys.append(si * dxb + c * dyb)
            tx = np.stack(txs)
            ty = np.stack(tys)

            def rng(t):
                # sample in [half + t.min, half + 1 + t.max); both hat taps
                # of every in-range sample land inside [lo, lo + n)
                lo = int(np.clip(np.floor(half + t.min() - 1e-3), 0, wsz - 2))
                hi = int(
                    np.clip(np.floor(half + 1 + t.max() + 1e-3) + 1, lo + 1, wsz - 1)
                )
                return lo, hi - lo + 1

            col_lo, n_cols = rng(tx)
            row_lo, n_rows = rng(ty)
            out.append((int(rb[0]), len(rb), row_lo, n_rows, col_lo, n_cols))
    return out


def make_render_batch_rolled(
    sensor: SensorConfig, window_impl: str = "auto", max_drift: float = 2.0,
    contract: jnp.ndarray | None = None,
    contract_precision=jax.lax.Precision.HIGH,
):
    """Sector renderer: ``(landscape, xy f32[B,2], theta f32[B]) ->
    (pano_phi f32[B, R, A], k i32[B])`` with the exact roll identity

        pano_theta[r, a] == pano_phi[r, (a + k) mod A],  theta = k*binw + phi.

    Same bilinear sampling math as make_render_batch (the rotation by theta
    is evaluated as the rotation by phi of azimuth-shifted static offsets —
    identical sample points up to fp rounding), but because |phi| <= binw/2
    the hat support per static azimuth sector is a small static window slice
    (sector_bounds). Consumers absorb the k roll where it is free: the
    spectral familiarity path rotates the panorama spectra by
    ``exp(i 2 pi f k / A)`` (familiarity_fft) and the per-lag statistics
    gather residue classes shifted by k (make_lag_stats dynamic_roll).

    With ``contract`` (f32[A, C] — e.g. the spectral path's forward DFT
    weights) the renderer instead returns ``(spec f32[B, R, C], k i32[B],
    rowsum f32[B, R], rowsq f32[B, R])`` where ``spec[b,r,:] = sum_a
    pano_phi[b,r,a] * contract[a,:]``: each sector's render partial is
    contracted against its static rows of ``contract`` as it is produced and
    the [B, R, A] panorama is NEVER materialized — removing a full HBM
    round trip plus the separate statistics passes (rowsum/rowsq are reduced
    from the same partials). Azimuth-sum reassociation only (per-sector
    blocks), so parity with the unfused path is fp-tight.
    """
    gather_win, chunk_b, hat_bf16 = _render_scaffold(sensor, window_impl)
    dx0_np, dy0_np = polar_offsets(sensor)
    a_fine = sensor.n_fine
    n_sectors = sensor.n_sectors
    n_ring_blocks = sensor.ring_blocks
    bounds = sector_bounds(sensor, n_sectors, n_ring_blocks)
    a_s = a_fine // n_sectors
    binw = sensor.bin_width
    wy_sz, wx_sz = window_geometry(sensor)
    half = wx_sz // 2
    # replicate-pad the landscape so the window never clips against the
    # edge: in-window fractional position is then always frac(xy) + half,
    # which the static sector bounds assume. Active agents render at least
    # r_max from the edge (the off-landscape stop), and a done agent's frozen
    # pose is at most ONE kinematics step past that margin, so PAD covers the
    # footprint overhang (half) minus the guaranteed margin (r_max - drift);
    # agent.make_step_batched passes max_drift >= step_size. The +1 is
    # bilinear slack: a sample at fractional radius r reads texels up to
    # floor(r)+1, one past the floor the margin arithmetic counts
    # (ADVICE round 3).
    pad = max(0, half - int(np.floor(sensor.r_max - max_drift)) + 1)
    pieces = []
    for i, (ring_lo, n_rings, row_lo, n_rows, col_lo, n_cols) in enumerate(bounds):
        cols = slice((i % n_sectors) * a_s, (i % n_sectors + 1) * a_s)
        rows = slice(ring_lo, ring_lo + n_rings)
        pieces.append(
            (
                n_rings,
                row_lo,
                n_rows,
                col_lo,
                n_cols,
                jnp.asarray(dx0_np[rows, cols]),
                jnp.asarray(dy0_np[rows, cols]),
                jnp.arange(col_lo, col_lo + n_cols, dtype=jnp.float32),
                jnp.arange(row_lo, row_lo + n_rows, dtype=jnp.float32),
            )
        )
    # phi-quantized static hat weights (SensorConfig.phi_bins): per piece and
    # per phi-bin, the full [taps, M] weight tensors are compile-time
    # constants; the per-agent weight GENERATION (VPU elementwise hats over
    # every tap) becomes a [B, nphi] x [nphi, taps*M] one-hot selection on
    # the MXU. The agent's fractional offset moves into a window pre-shift
    # (see _render_chunk).
    nphi = sensor.phi_bins
    wdt = np.float32
    phi_weights = []
    if nphi:
        phi_centers = -binw / 2 + (np.arange(nphi) + 0.5) * (binw / nphi)
        for n_rings, row_lo, n_rows, col_lo, n_cols, dxs, dys, _, _ in pieces:
            dx = np.asarray(dxs, np.float64)
            dy = np.asarray(dys, np.float64)
            wxs, wys = [], []
            for pj in phi_centers:
                c, s = np.cos(pj), np.sin(pj)
                xs = np.clip(
                    half + c * dx - s * dy, col_lo, col_lo + n_cols - 1
                ).reshape(-1)
                ys = np.clip(
                    half + s * dx + c * dy, row_lo, row_lo + n_rows - 1
                ).reshape(-1)
                qc = np.arange(col_lo, col_lo + n_cols, dtype=np.float64)[:, None]
                qr = np.arange(row_lo, row_lo + n_rows, dtype=np.float64)[:, None]
                wxs.append(np.maximum(0.0, 1.0 - np.abs(xs[None, :] - qc)))
                wys.append(np.maximum(0.0, 1.0 - np.abs(ys[None, :] - qr)))
            dt = jnp.bfloat16 if hat_bf16 else jnp.float32
            phi_weights.append(
                (
                    jnp.asarray(np.stack(wxs).astype(wdt), dt),  # [nphi, nc, M]
                    jnp.asarray(np.stack(wys).astype(wdt), dt),  # [nphi, nr, M]
                )
            )

    contract_slices = None
    if contract is not None:
        if contract.shape[0] != a_fine:
            raise ValueError(
                f"contract rows {contract.shape[0]} != n_fine {a_fine}"
            )
        # static per-sector row slices of the contraction matrix
        contract_slices = [
            jnp.asarray(contract[s * a_s : (s + 1) * a_s]) for s in range(n_sectors)
        ]

    def render_b(landscape: jnp.ndarray, xy: jnp.ndarray, theta: jnp.ndarray):
        kf = jnp.round(theta / binw)
        phi = theta - kf * binw
        k = kf.astype(jnp.int32) % a_fine
        if contract is None:
            return _chunk_over_agents(_render_chunk, chunk_b, landscape, xy, phi), k
        spec, rowsum, rowsq = _chunk_over_agents_tuple(
            _render_chunk, chunk_b, landscape, xy, phi
        )
        return spec, k, rowsum, rowsq

    def _render_chunk(landscape: jnp.ndarray, xy: jnp.ndarray, phi: jnp.ndarray):
        hl, wl = landscape.shape
        # 4-side replicate pad (edge-clamp semantics); bottom carries 8 extra
        # rows of kernel align-down slack, width pads to the DMA band
        land_pad = jnp.pad(landscape, ((pad, pad + 8), (pad, pad)), mode="edge")
        wp = wl + 2 * pad
        if wp < 256:
            land_pad = jnp.concatenate(
                [land_pad, jnp.tile(land_pad[:, -1:], (1, 256 - wp))], axis=1
            )
        bx = jnp.clip(
            jnp.floor(xy[:, 0]).astype(jnp.int32) + pad - half, 0, wp - wx_sz
        )
        by = jnp.clip(
            jnp.floor(xy[:, 1]).astype(jnp.int32) + pad - half, 0, hl + 2 * pad - wy_sz
        )
        wins = gather_win(land_pad, by, bx)  # [B, wy, wx]
        fx = xy[:, 0] + pad - bx.astype(jnp.float32)
        fy = xy[:, 1] + pad - by.astype(jnp.float32)
        b = xy.shape[0]
        c = jnp.cos(phi)
        s = jnp.sin(phi)
        bcast = lambda v: v[:, None, None]
        if nphi:
            # phi-bin one-hot + fractional window pre-shift: the static
            # per-bin weights assume sample position half + Rot(phi_j)@d, so
            # the (fx, fy) fraction is applied to the WINDOW as one 4-tap
            # bilinear blend (edge columns/rows replicate = edge clamp) and
            # phi rounds to its bin center
            jbin = jnp.clip(
                jnp.floor((phi + binw / 2) * (nphi / binw)), 0, nphi - 1
            ).astype(jnp.int32)
            oh = (jbin[:, None] == jnp.arange(nphi)[None, :]).astype(
                jnp.bfloat16 if hat_bf16 else jnp.float32
            )
            frx = bcast(fx - half)
            fry = bcast(fy - half)
            wsx = jnp.concatenate([wins[:, :, 1:], wins[:, :, -1:]], axis=2)
            wtmp = wins * (1 - frx) + wsx * frx
            wsy = jnp.concatenate([wtmp[:, 1:, :], wtmp[:, -1:, :]], axis=1)
            wins = wtmp * (1 - fry) + wsy * fry
        parts = []
        # transposed-hat layout: taps live in SUBLANES and the merged
        # (ring x sector-azimuth) axis in LANES, so every per-piece tensor
        # has a lane-dense minor dim — the (r, a, taps) layout materialized
        # tap-minor [B, R, As, ~11] tensors whose 128-lane tile padding cost
        # ~6 ms/step of HBM copies at B=2048 (profiled)
        for i, (n_rings, row_lo, n_rows, col_lo, n_cols, dxs, dys, iota_c, iota_r) in enumerate(pieces):
            win_s = wins[:, row_lo : row_lo + n_rows, col_lo : col_lo + n_cols]
            if nphi:
                wxq, wyq = phi_weights[i]
                if hat_bf16:
                    wxh = jnp.einsum(
                        "bj,jcm->bcm", oh, wxq,
                        preferred_element_type=jnp.bfloat16,
                    )
                    wyh = jnp.einsum(
                        "bj,jrm->brm", oh, wyq,
                        preferred_element_type=jnp.bfloat16,
                    )
                else:
                    hi = jax.lax.Precision.HIGHEST
                    wxh = jnp.einsum("bj,jcm->bcm", oh, wxq, precision=hi)
                    wyh = jnp.einsum("bj,jrm->brm", oh, wyq, precision=hi)
            else:
                xs = jnp.clip(
                    bcast(fx) + bcast(c) * dxs - bcast(s) * dys,
                    col_lo,
                    col_lo + n_cols - 1,
                ).reshape(b, 1, -1)  # [B, 1, n_rings*As]
                ys = jnp.clip(
                    bcast(fy) + bcast(s) * dxs + bcast(c) * dys,
                    row_lo,
                    row_lo + n_rows - 1,
                ).reshape(b, 1, -1)
                wxh = jnp.maximum(0.0, 1.0 - jnp.abs(xs - iota_c[:, None]))  # [B,nc,M]
                wyh = jnp.maximum(0.0, 1.0 - jnp.abs(ys - iota_r[:, None]))  # [B,nr,M]
            if hat_bf16:
                t = jnp.einsum(
                    "bpq,bqm->bpm",
                    win_s.astype(jnp.bfloat16),
                    wxh.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32,
                )  # [B, nr, M]
                part = jnp.sum(
                    t * wyh.astype(jnp.bfloat16).astype(jnp.float32), axis=1
                )
            else:
                t = jnp.einsum(
                    "bpq,bqm->bpm", win_s, wxh, precision=jax.lax.Precision.HIGH
                )
                part = jnp.sum(t * wyh, axis=1)
            parts.append(part.reshape(b, n_rings, -1))  # [B, n_rings, As]
        if contract_slices is None:
            # reassemble: azimuth concat within each ring block, rings across
            blocks = [
                jnp.concatenate(parts[i : i + n_sectors], axis=-1)
                for i in range(0, len(parts), n_sectors)
            ]
            return blocks[0] if len(blocks) == 1 else jnp.concatenate(blocks, axis=1)
        # fused contraction: each sector partial hits its static contract rows
        # and accumulates — the [B, R, A] panorama never exists; the lag-stat
        # reductions ride the same VMEM-resident partials
        spec_blocks, sum_blocks, sq_blocks = [], [], []
        for i0 in range(0, len(parts), n_sectors):
            sp = rs = rq = None
            for j, part in enumerate(parts[i0 : i0 + n_sectors]):
                term = jnp.einsum(
                    "bra,ac->brc", part, contract_slices[j],
                    precision=contract_precision,
                )
                sp = term if sp is None else sp + term
                srow = jnp.sum(part, axis=2)
                sqrow = jnp.sum(part * part, axis=2)
                rs = srow if rs is None else rs + srow
                rq = sqrow if rq is None else rq + sqrow
            spec_blocks.append(sp)
            sum_blocks.append(rs)
            sq_blocks.append(rq)
        cat = lambda xs: xs[0] if len(xs) == 1 else jnp.concatenate(xs, axis=1)
        return cat(spec_blocks), cat(sum_blocks), cat(sq_blocks)

    return render_b


def unroll_panorama(pano_phi, k) -> np.ndarray:
    """Materialize the true-heading panorama from the sector renderer's
    output: ``pano_theta[b, r, a] = pano_phi[b, r, (a + k_b) % A]``.

    Host-side utility (cold path — the production pipeline absorbs the roll
    spectrally and never materializes this); used by parity tests and the
    bench sector gate."""
    pano_phi = np.asarray(pano_phi)
    k = np.asarray(k)
    a = pano_phi.shape[-1]
    idx = (np.arange(a)[None, :] + k[:, None]) % a  # [B, A]
    return np.take_along_axis(pano_phi, idx[:, None, :], axis=2)


def make_candidate_views(sensor: SensorConfig, shifts: np.ndarray):
    """Build ``views(pano f32[R, A]) -> f32[Ns, P]``: the pooled sensor view at
    every shift in ``shifts`` (fine bins), flattened to P = R*W pixels.

    Equivalent (tested) to re-rendering at each candidate heading; SEMANTICS.md
    §3 "rotation = cyclic shift".

    TPU formulation: first build the circular prefix-pooled panorama
    ``S[r, a] = sum_{j<u} pano[r, (a+j) mod A]`` (u-1 cheap rolled adds), so
    the pooled view at shift s is just the stride-u slice ``S[r, w*u+s] / u``
    — the per-candidate gather shrinks from W*u to W columns (5x less traffic
    at the default sensor) and the mean-pool is fused into it.
    """
    col_idx = jnp.asarray(candidate_col_index(sensor, np.asarray(shifts)))
    r, w, u = sensor.n_radial, sensor.n_azimuth, sensor.az_upsample
    ns = len(shifts)
    inv_u = 1.0 / u
    pooled = make_pooled_panorama(sensor)

    def views(pano: jnp.ndarray) -> jnp.ndarray:
        g = pooled(pano)[:, col_idx]  # [R, Ns, W]
        return jnp.transpose(g, (1, 0, 2)).reshape(ns, r * w) * inv_u

    return views


def make_pooled_panorama(sensor: SensorConfig):
    """``pooled(pano f32[..., R, A]) -> S f32[..., R, A]`` with
    ``S[r, a] = sum_{j<u} pano[r, (a+j) mod A]``.

    Exact path: u-1 rolled adds. In the bf16 fast-numerics mode
    (``hat_dtype="bfloat16"``, SEMANTICS.md §8) the circular box filter runs
    as ONE banded-circulant matmul on the MXU instead: the roll-adds
    materialize 8 panorama slices per step (profiled ~155 us at BASELINE
    config 1, B=1024; the matmul replaces them at ~15 us for 0.3% pixel
    noise — recall measured unchanged, +16% end-to-end at config 1)."""
    u = sensor.az_upsample

    if u > 1 and sensor.hat_dtype == "bfloat16":
        a = sensor.n_fine
        box = np.zeros((a, a), np.float32)
        for j in range(u):
            box[(np.arange(a) + j) % a, np.arange(a)] = 1.0  # exact in bf16
        box_bf = jnp.asarray(box, jnp.bfloat16)

        def pooled(pano: jnp.ndarray) -> jnp.ndarray:
            lead = pano.shape[:-1]
            flat = pano.reshape(-1, a).astype(jnp.bfloat16)
            out = jnp.dot(flat, box_bf, preferred_element_type=jnp.float32)
            return out.reshape(*lead, a)

        return pooled

    def pooled(pano: jnp.ndarray) -> jnp.ndarray:
        s = pano
        for j in range(1, u):
            s = s + jnp.roll(pano, -j, axis=-1)
        return s

    return pooled


def make_views_from_pooled(sensor: SensorConfig, shifts: np.ndarray):
    """Candidate views from an already-pooled panorama S (batched):
    ``views(S f32[B, R, A]) -> f32[B, Ns, P]``."""
    col_idx = jnp.asarray(candidate_col_index(sensor, np.asarray(shifts)))
    r, w, u = sensor.n_radial, sensor.n_azimuth, sensor.az_upsample
    ns = len(shifts)
    inv_u = 1.0 / u

    def views(s: jnp.ndarray) -> jnp.ndarray:
        g = s[:, :, col_idx]  # [B, R, Ns, W]
        return jnp.transpose(g, (0, 2, 1, 3)).reshape(-1, ns, r * w) * inv_u

    return views


def make_lag_stats(
    sensor: SensorConfig, shifts: np.ndarray, dynamic_roll: bool = False
):
    """Cheap per-lag candidate statistics straight from the pooled panorama:
    ``stats(S f32[B, R, A]) -> (sum f32[B, Ns], sumsq f32[B, Ns])`` where
    sum/sumsq are over the candidate's P pixels.

    Key reduction: candidate ``l``'s pixels are the pooled columns
    ``(w*u + l) mod A`` — exactly the columns congruent to ``l mod u`` — so
    the per-lag stats take only ``u`` DISTINCT values. Summing the column
    stats per residue class and gathering ``[B, u] -> [B, Ns]`` replaces the
    round-1 ``colsum[:, col_idx]`` gather that materialized a [B, Ns, W]
    tensor (profiled 200 us/step of VMEM-write-bound traffic at BASELINE
    config 3, where Ns=125 and W=A=360 made every row the same full-circle
    sum, computed 125 times).

    With ``dynamic_roll=True`` the returned fn takes ``(s, k i32[B])`` and
    shifts each agent's residue classes by its sector-renderer roll k."""
    u = sensor.az_upsample
    w = sensor.n_azimuth
    inv_u = 1.0 / u
    residues = jnp.asarray(np.mod(np.asarray(shifts), u).astype(np.int32))  # [Ns]

    def _per_residue(s: jnp.ndarray):
        colsum = jnp.sum(s, axis=1) * inv_u  # [B, A]
        colsq = jnp.sum(s * s, axis=1) * (inv_u * inv_u)  # [B, A]
        b = s.shape[0]
        # column a = w*u + j  ->  reshape [B, W, u], sum over w -> per-residue
        res_sum = jnp.sum(colsum.reshape(b, w, u), axis=1)  # [B, u]
        res_sq = jnp.sum(colsq.reshape(b, w, u), axis=1)  # [B, u]
        return res_sum, res_sq

    def stats(s: jnp.ndarray):
        res_sum, res_sq = _per_residue(s)
        return res_sum[:, residues], res_sq[:, residues]  # [B, Ns] each

    if not dynamic_roll:
        return stats

    if u == 1:
        # a single residue class: the roll is a provable no-op, so skip the
        # one-hot select on the sector hot path (BASELINE config 3 has u=1)
        return lambda s, k: stats(s)

    def stats_rolled(s: jnp.ndarray, k: jnp.ndarray):
        """Sector-renderer variant: ``s`` is the pooled phi-frame panorama and
        the true candidate at lag ``l`` occupies its columns ``w*u + l + k``,
        i.e. residue class ``(l + k) mod u``. The per-agent select runs as a
        one-hot contraction — take_along_axis lowers to a serial TPU gather
        (profiled ~1 ms/step at B=2048)."""
        res_sum, res_sq = _per_residue(s)
        idx = jnp.mod(residues[None, :] + k[:, None], u)  # [B, Ns]
        onehot = (idx[:, :, None] == jnp.arange(u)[None, None, :]).astype(
            jnp.float32
        )  # [B, Ns, u]
        # HIGHEST: the select must pass the ~1e4-magnitude stats through
        # exactly — a default bf16x1 dot would round them by ~0.4%, the
        # decorrelated per-lag noise class that breaks flat-valley argmins
        hi = jax.lax.Precision.HIGHEST
        return (
            jnp.einsum("bnu,bu->bn", onehot, res_sum, precision=hi),
            jnp.einsum("bnu,bu->bn", onehot, res_sq, precision=hi),
        )

    return stats_rolled


def make_render_view(sensor: SensorConfig):
    """Per-heading reference path: one pooled view at the pose's own heading
    (shift 0). Cold path — used for training capture and parity tests."""
    render = make_render_panorama(sensor)
    views = make_candidate_views(sensor, np.zeros(1, dtype=np.int64))

    def render_view(landscape, xy, theta):
        return views(render(landscape, xy, theta))[0].reshape(
            sensor.n_radial, sensor.n_azimuth
        )

    return render_view


def scan_shift_sets(scan: ScanConfig) -> tuple[np.ndarray, np.ndarray]:
    """(shifts[Nh], extended[Nh*(2t+1)]) — extended enumerates s_k + delta for
    the RIDF tolerance window (SEMANTICS.md §4); with tol_bins=0 it's shifts."""
    shifts = np.asarray(scan.shifts(), dtype=np.int64)
    deltas = np.arange(-scan.tol_bins, scan.tol_bins + 1, dtype=np.int64)
    extended = (shifts[:, None] + deltas[None, :]).reshape(-1)
    return shifts, extended


def scan_lag_sets(scan: ScanConfig) -> tuple[np.ndarray, np.ndarray]:
    """Deduplicated scan lags: (lags[L], window_idx[Nh, 2t+1]).

    RIDF windows of neighboring headings overlap heavily (e.g. BASELINE
    config 3: 60 headings x 7-wide windows = 420 extended candidates but only
    ~125 unique lags — 3.4x less render/score work). ``lags`` is the sorted
    unique set; ``window_idx[k, d]`` indexes the lag of heading k's d-th
    tolerance offset, so ``fam[k] = min_d M[window_idx[k, d]]`` where M is the
    per-lag library minimum.
    """
    shifts, extended = scan_shift_sets(scan)
    lags, inverse = np.unique(extended, return_inverse=True)
    window_idx = inverse.reshape(scan.n_headings, 2 * scan.tol_bins + 1)
    return lags, window_idx.astype(np.int32)
