"""L3: agent state, step, and episode loop (SEMANTICS.md §2, §5).

SURVEY.md §3.3–3.4 rebuild: the whole episode is ONE ``lax.scan`` with
done-masking — no host syncs inside an episode; the per-step argmin feedback
stays on-device. The production step is *natively batched* over agents
(BASELINE config 4): render/views vmap per agent, the familiarity reduction
runs as one fused batched op (jnp reference or the Pallas kernel in
:mod:`navdv_tpu.ops.familiarity_pallas`).

Status codes: 0 = running/budget, 1 = reached, 2 = diverged, 3 = off-landscape.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from navdv_tpu.config import SimConfig
from navdv_tpu.familiarity import LibraryPack
from navdv_tpu.sensor import (
    make_candidate_views,
    make_lag_stats,
    make_pooled_panorama,
    make_render_batch,
    make_views_from_pooled,
    scan_lag_sets,
    scan_shift_sets,
)

STATUS_RUNNING = 0
STATUS_REACHED = 1
STATUS_DIVERGED = 2
STATUS_OFF = 3


class AgentState(NamedTuple):
    xy: jnp.ndarray  # f32[2] or f32[B, 2]
    theta: jnp.ndarray  # f32[] or f32[B]
    done: jnp.ndarray  # bool
    status: jnp.ndarray  # i32


class EpisodeStatics(NamedTuple):
    """Device-resident per-episode constants (broadcast across agents)."""

    landscape: jnp.ndarray  # f32[Hl, Wl]
    lib: LibraryPack
    route_a: jnp.ndarray  # f32[Nseg, 2] segment starts
    route_ab: jnp.ndarray  # f32[Nseg, 2] segment vectors
    route_denom: jnp.ndarray  # f32[Nseg] |ab|^2 (clamped)
    goal: jnp.ndarray  # f32[2]


class StepRecord(NamedTuple):
    """Per-step trajectory record (stacked to [T, ...] by lax.scan)."""

    xy: jnp.ndarray
    theta: jnp.ndarray
    fam: jnp.ndarray  # selected familiarity min_k fam[k]
    k: jnp.ndarray  # selected candidate index
    dist_route: jnp.ndarray  # distance to route polyline after the step
    done: jnp.ndarray  # was the episode already finished BEFORE this step


def make_statics(landscape, lib: LibraryPack, route: np.ndarray) -> EpisodeStatics:
    route = jnp.asarray(route, dtype=jnp.float32)
    a, b = route[:-1], route[1:]
    ab = b - a
    return EpisodeStatics(
        landscape=jnp.asarray(landscape, dtype=jnp.float32),
        lib=lib,
        route_a=a,
        route_ab=ab,
        route_denom=jnp.maximum(jnp.sum(ab * ab, axis=1), 1e-12),
        goal=route[-1],
    )


def init_state(xy, theta) -> AgentState:
    """Works for single ([2], []) or batched ([B, 2], [B]) starts."""
    theta = jnp.asarray(theta, dtype=jnp.float32)
    return AgentState(
        xy=jnp.asarray(xy, dtype=jnp.float32),
        theta=theta,
        done=jnp.zeros(theta.shape, dtype=bool),
        status=jnp.full(theta.shape, STATUS_RUNNING, dtype=jnp.int32),
    )


def point_to_polyline_dist(p, st: EpisodeStatics) -> jnp.ndarray:
    """Min point-to-segment distance to the training route (SEMANTICS.md §5.2)."""
    t = jnp.clip(
        jnp.sum((p[None, :] - st.route_a) * st.route_ab, axis=1) / st.route_denom,
        0.0,
        1.0,
    )
    proj = st.route_a + t[:, None] * st.route_ab
    return jnp.sqrt(jnp.min(jnp.sum((p[None, :] - proj) ** 2, axis=1)))


def _make_decide(cfg: SimConfig):
    """Shared post-familiarity logic: argmin -> kinematics -> stop conditions.

    Per-agent; vmapped by the batched step. Returns (state', StepRecord).
    """
    sensor, ag = cfg.sensor, cfg.agent
    shifts, _ = scan_shift_sets(cfg.scan)
    shifts_dev = jnp.asarray(shifts, dtype=jnp.float32)
    tie_order = jnp.asarray(np.asarray(cfg.scan.tie_order(), dtype=np.int32))
    binw = sensor.bin_width

    def decide(state: AgentState, fam: jnp.ndarray, st: EpisodeStatics):
        # ties -> smallest |shift|, then lowest index (SEMANTICS.md §5):
        # argmin over the tie-order permutation implements it exactly
        k = tie_order[jnp.argmin(fam[tie_order])]
        theta_new = state.theta + shifts_dev[k] * binw
        xy_new = state.xy + ag.step_size * jnp.stack(
            [jnp.cos(theta_new), jnp.sin(theta_new)]
        )

        reached = jnp.sum((xy_new - st.goal) ** 2) <= ag.goal_radius**2
        dist_route = point_to_polyline_dist(xy_new, st)
        diverged = dist_route > ag.corridor
        hl, wl = st.landscape.shape
        margin = sensor.r_max
        off = ~(
            (xy_new[0] >= margin)
            & (xy_new[0] <= wl - 1 - margin)
            & (xy_new[1] >= margin)
            & (xy_new[1] <= hl - 1 - margin)
        )
        # priority: reached > diverged > off (SEMANTICS.md §5)
        new_status = jnp.where(
            reached,
            STATUS_REACHED,
            jnp.where(
                diverged, STATUS_DIVERGED, jnp.where(off, STATUS_OFF, STATUS_RUNNING)
            ),
        ).astype(jnp.int32)

        was_done = state.done
        out = AgentState(
            xy=jnp.where(was_done, state.xy, xy_new),
            theta=jnp.where(was_done, state.theta, theta_new),
            done=was_done | (new_status != STATUS_RUNNING),
            status=jnp.where(was_done, state.status, new_status),
        )
        rec = StepRecord(
            xy=out.xy,
            theta=out.theta,
            fam=fam[k],
            k=k.astype(jnp.int32),
            dist_route=dist_route,
            done=was_done,
        )
        return out, rec

    return decide


def _make_lib_min(cfg: SimConfig, fam_impl: str):
    """Per-lag library minimum: (cand f32[B, L, P], lib, lag_sum f32[B, L],
    lag_sq f32[B, L]) -> M f32[B, L].

    The per-candidate statistics (pixel sum / squared sum) arrive precomputed
    from the pooled panorama (sensor.make_lag_stats) so neither metric ever
    re-reduces the extracted candidate tensor: SSD needs only the cross-term
    matmul; NCC z-scores algebraically via
    ``z_c . z_l = (c . z_l - mu_c * sum(z_l)) / sigma_c``.
    """
    from navdv_tpu.familiarity import NCC_EPS, PAD_PENALTY, matmul_precision

    p = float(cfg.sensor.n_pixels)
    prec = matmul_precision(cfg.scan.matmul_precision)

    if fam_impl == "infomax":
        # learned-memory model (familiarity_infomax.py): same extraction
        # front-end, but scores against trained Infomax weights (the aux,
        # built in the prepare-once stage) instead of the stored library
        from navdv_tpu.familiarity_infomax import make_lib_min_infomax

        return make_lib_min_infomax(cfg.sensor, cfg.scan, cfg.capture_spacing)

    if fam_impl == "jnp":
        if cfg.scan.metric == "ssd":
            def lib_min(cand, lib, lag_sum, lag_sq, aux=None):
                pen = (1.0 - lib.valid) * PAD_PENALTY
                cross = jnp.einsum(
                    "blp,vp->blv", cand, lib.flat, precision=prec
                )
                d = lag_sq[:, :, None] + (lib.sq + pen)[None, None, :] - 2.0 * cross
                return jnp.min(jnp.maximum(d, 0.0), axis=2)
        elif cfg.scan.metric == "ncc":
            def lib_min(cand, lib, lag_sum, lag_sq, aux=None):
                pen = (1.0 - lib.valid) * PAD_PENALTY
                cross = jnp.einsum("blp,vp->blv", cand, lib.z, precision=prec)
                mu = lag_sum / p
                var = jnp.maximum(lag_sq / p - mu * mu, 0.0)
                sigma = jnp.sqrt(var + NCC_EPS)
                zsum = jnp.sum(lib.z, axis=1)  # [Nl]
                zdot = (cross - mu[:, :, None] * zsum[None, None, :]) / sigma[:, :, None]
                d = 1.0 - zdot / p + pen[None, None, :]
                return jnp.min(d, axis=2)
        else:
            raise ValueError(f"unknown familiarity metric {cfg.scan.metric!r}")
        return lib_min

    if fam_impl == "pallas":
        from navdv_tpu.ops.familiarity_pallas import make_lib_min_pallas

        inner = make_lib_min_pallas(cfg.sensor, cfg.scan)

        def lib_min(cand, lib, lag_sum, lag_sq, aux=None):
            return inner(cand, lib)

        return lib_min
    raise ValueError(f"unknown fam_impl {fam_impl!r}")


# auto-chunking threshold: candidate-extraction fp32 elements per agent before
# the (L x P) lag stack is split into chunks (bounds HBM transients at big
# sensors, e.g. BASELINE config 3)
FAM_CHUNK_ELEMS = 2 << 20


def _step_from_fam(fam_of, decide):
    """Assemble a batched step from its familiarity stage.

    ``step.fam`` exposes the pre-argmin familiarity ``fam_of(states, st,
    aux) -> [B, Nh]`` so analysis tooling (RIDF curves, familiarity maps —
    :mod:`navdv_tpu.analysis`) probes the EXACT production pipeline,
    including the library-axis ``pmin`` collective when sharded.
    """

    def step(states: AgentState, st: EpisodeStatics, aux=None):
        return decide(states, fam_of(states, st, aux), st)

    step.fam = fam_of
    return step


def make_step_batched(
    cfg: SimConfig, fam_impl: str = "jnp", lib_axis: str | None = None
):
    """Production batched step: ``(AgentState[B], EpisodeStatics) -> (AgentState[B], StepRecord[B])``.

    Pipeline: render one panorama per agent -> candidate views at the
    DEDUPLICATED scan lags (RIDF windows of neighboring headings overlap;
    sensor.scan_lag_sets — e.g. 3.4x less work at BASELINE config 3) -> per-lag
    library minimum M[B, L] (jnp matmul or Pallas kernel) -> RIDF min-pool via
    a static window gather -> argmin/kinematics. When (L x P) per agent
    exceeds FAM_CHUNK_ELEMS, lags are extracted and scored in chunks so only
    [B, chunk, P] is ever materialized (SURVEY.md §5.7 blockwise min).
    """
    if fam_impl == "auto":
        from navdv_tpu.config import choose_fam_impl

        fam_impl = choose_fam_impl(cfg)
    decide = jax.vmap(_make_decide(cfg), in_axes=(0, 0, None))
    if cfg.sensor.render_mode not in ("full", "sector"):
        raise ValueError(f"unknown render_mode {cfg.sensor.render_mode!r}")
    # impl-specific knobs: warn when set but routed to an impl that ignores
    # them — silence would read as "the knob is free" (ADVICE rounds 2+3)
    _impl_knobs = (
        ("roll", "roll_rank", cfg.scan.roll_rank > 0),
        ("roll", "fixed_point_bits", bool(cfg.scan.fixed_point_bits)),
        ("fft", "spectral_cutoff", cfg.scan.spectral_cutoff > 0),
        ("fft", "fused_dft_precision",
         cfg.scan.fused_dft_precision != "off"),
    ) + tuple(
        # non-default infomax training knobs (defaults read from the
        # dataclass so the sentinel can't drift from config.py)
        ("infomax", f.name, getattr(cfg.scan, f.name) != f.default)
        for f in dataclasses.fields(type(cfg.scan))
        if f.name.startswith("infomax_")
    )
    for knob_impl, knob, is_set in _impl_knobs:
        if is_set and fam_impl != knob_impl:
            import warnings

            warnings.warn(
                f"ScanConfig.{knob}={getattr(cfg.scan, knob)!r} has no effect"
                f" with fam_impl={fam_impl!r}; it applies only to "
                f"fam_impl={knob_impl!r}",
                stacklevel=2,
            )
    if fam_impl == "infomax" and cfg.scan.metric != "ssd":
        import warnings

        warnings.warn(
            f"ScanConfig.metric={cfg.scan.metric!r} is ignored with "
            f"fam_impl='infomax': the learned novelty readout replaces the "
            f"image-distance metric entirely (familiarity_infomax.py)",
            stacklevel=2,
        )
    # the sector renderer's roll absorption is spectral-domain only: non-fft
    # impls fall back to the (numerically equivalent) full-window renderer
    sector = cfg.sensor.render_mode == "sector" and fam_impl == "fft"
    if cfg.sensor.phi_bins and not sector:
        import warnings

        warnings.warn(
            f"SensorConfig.phi_bins={cfg.sensor.phi_bins} has no effect "
            f"outside render_mode='sector' with fam_impl='fft' "
            f"(got render_mode={cfg.sensor.render_mode!r}, "
            f"fam_impl={fam_impl!r})",
            stacklevel=2,
        )
    render_b = None if sector else make_render_batch(cfg.sensor)

    if fam_impl == "conv":
        # the whole lag scan as one MXU convolution — extraction-free like
        # fft/roll but non-default: the fft/roll paths beat it at every
        # BASELINE config (familiarity_conv.py, COMPONENTS.md)
        from navdv_tpu.familiarity_conv import make_fam_conv

        fam_conv = make_fam_conv(cfg.sensor, cfg.scan)

        def fam_of(states: AgentState, st: EpisodeStatics, aux=None):
            pano = render_b(st.landscape, states.xy, states.theta)
            fam = fam_conv(pano, st.lib)
            if lib_axis is not None:
                fam = jax.lax.pmin(fam, lib_axis)  # min commutes with pooling
            return fam

        return _step_from_fam(fam_of, decide)

    if fam_impl in ("fft", "roll"):
        # extraction-free paths: the whole lag scan straight from the pooled
        # panorama — no [B, L, P] candidate tensor at all. "fft" = circular
        # correlation via DFT matmuls (familiarity_fft.py); "roll" = one
        # matmul against a statically pre-rolled library, matmul-identical
        # numerics to "jnp" (familiarity_roll.py)
        if fam_impl == "fft":
            from navdv_tpu.familiarity_fft import make_lib_min_fft as _mk
        else:
            from navdv_tpu.familiarity_roll import make_lib_min_roll as _mk

        lags, window_idx = scan_lag_sets(cfg.scan)
        lib_min_fft = _mk(cfg.sensor, cfg.scan, lags)
        pooled_f = make_pooled_panorama(cfg.sensor)
        lag_stats_f = make_lag_stats(cfg.sensor, lags, dynamic_roll=sector)
        window_idx_f = jnp.asarray(window_idx)

        if sector:
            # sector renderer: pano comes back in the phi frame plus its
            # integer-bin roll k; the spectral path rotates the spectra by k
            # (exact) and the lag stats gather the k-shifted residue classes
            from navdv_tpu.familiarity import matmul_precision
            from navdv_tpu.sensor import make_render_batch_rolled

            drift = max(2.0, cfg.agent.step_size)
            # u == 1 (e.g. BASELINE config 3): pooled == pano and every
            # candidate tiles the full circle, so the forward DFT can be
            # contracted per sector INSIDE the renderer — the [B, R, A]
            # panorama is never materialized and the lag stats reduce from
            # the same partials (fused front-end; sensor.py `contract`).
            # Opt-in via ScanConfig.fused_dft_precision (see config.py for
            # the measured win/loss conditions).
            fused = (
                cfg.scan.fused_dft_precision != "off"
                and cfg.sensor.az_upsample == 1
                and hasattr(lib_min_fft, "spectral")
            )
            if fused:
                render_fused = make_render_batch_rolled(
                    cfg.sensor,
                    max_drift=drift,
                    contract=lib_min_fft.forward_mats,
                    contract_precision=matmul_precision(
                        cfg.scan.fused_dft_precision
                        if cfg.scan.fused_dft_precision != "inherit"
                        else cfg.scan.matmul_precision
                    ),
                )
                a_fine = cfg.sensor.n_fine
                # retained frequency bins (spectral_cutoff-aware): the
                # contraction matrix is [A, 2*f_bins] = (sre | sim)
                f_bins = lib_min_fft.forward_mats.shape[1] // 2
                n_lags = len(lags)

                def fam_of(states: AgentState, st: EpisodeStatics, aux=None):
                    spec, k, rowsum, rowsq = render_fused(
                        st.landscape, states.xy, states.theta
                    )
                    sre = spec[..., :f_bins]
                    sim = spec[..., f_bins:]
                    mu = rowsum * (1.0 / a_fine)
                    # u == 1: every candidate is a full-circle roll, so the
                    # per-lag stats are lag-independent totals (roll-invariant)
                    tot = jnp.sum(rowsum, axis=1)
                    totq = jnp.sum(rowsq, axis=1)
                    lag_sum = jnp.broadcast_to(tot[:, None], (tot.shape[0], n_lags))
                    lag_sq = jnp.broadcast_to(totq[:, None], (totq.shape[0], n_lags))
                    m = lib_min_fft.spectral(
                        (sre, sim, mu), st.lib, lag_sum, lag_sq, aux=aux, roll_k=k
                    )
                    if lib_axis is not None:
                        m = jax.lax.pmin(m, lib_axis)
                    return jnp.min(m[:, window_idx_f], axis=2)  # [B, Nh]

                step = _step_from_fam(fam_of, decide)
                step.lib_prepare = lambda st: lib_min_fft.prepare(st.lib)
                return step

            render_roll = make_render_batch_rolled(cfg.sensor, max_drift=drift)

            def render_front(states, st):
                pano, k = render_roll(st.landscape, states.xy, states.theta)
                return pooled_f(pano), k
        else:
            def render_front(states, st):
                pano = render_b(st.landscape, states.xy, states.theta)
                return pooled_f(pano), None

        def fam_of(states: AgentState, st: EpisodeStatics, aux=None):
            s, k = render_front(states, st)  # s: pooled [B, R, A]
            if k is None:
                lag_sum, lag_sq = lag_stats_f(s)
                m = lib_min_fft(s, st.lib, lag_sum, lag_sq, aux=aux)  # [B, L]
            else:
                lag_sum, lag_sq = lag_stats_f(s, k)
                m = lib_min_fft(s, st.lib, lag_sum, lag_sq, aux=aux, roll_k=k)
            if lib_axis is not None:
                m = jax.lax.pmin(m, lib_axis)
            return jnp.min(m[:, window_idx_f], axis=2)  # [B, Nh]

        # per-episode library preprocessing (pre-rolled / spectral library):
        # make_navigate_batch_fn runs it ONCE before the scan — XLA's
        # loop-invariant code motion declined to hoist it (profiled 66
        # us/step of rebuilt rolled library at BASELINE config 2)
        step = _step_from_fam(fam_of, decide)
        step.lib_prepare = lambda st: lib_min_fft.prepare(st.lib)
        return step

    lags, window_idx = scan_lag_sets(cfg.scan)
    lib_min = _make_lib_min(cfg, fam_impl)
    pooled = make_pooled_panorama(cfg.sensor)
    lag_stats = make_lag_stats(cfg.sensor, lags)

    p = cfg.sensor.n_pixels
    n_lags = len(lags)
    chunk = max(1, FAM_CHUNK_ELEMS // p)
    chunk_bounds = (
        [(0, n_lags)]
        if n_lags * p <= FAM_CHUNK_ELEMS
        else [(i, min(i + chunk, n_lags)) for i in range(0, n_lags, chunk)]
    )
    chunk_views = [
        (lo, hi, make_views_from_pooled(cfg.sensor, lags[lo:hi]))
        for lo, hi in chunk_bounds
    ]
    window_idx_dev = jnp.asarray(window_idx)  # [Nh, 2t+1]

    def fam_of(states: AgentState, st: EpisodeStatics, aux=None):
        pano = render_b(st.landscape, states.xy, states.theta)  # [B, R, A]
        s = pooled(pano)  # [B, R, A]
        lag_sum, lag_sq = lag_stats(s)  # [B, L] each
        parts = [
            lib_min(v(s), st.lib, lag_sum[:, lo:hi], lag_sq[:, lo:hi], aux)
            for lo, hi, v in chunk_views
        ]
        m = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=1)  # [B, L]
        if lib_axis is not None:
            # per-library-shard partial minima -> pmin across shards: the
            # system's one collective (SURVEY.md §2.3/§5.8)
            m = jax.lax.pmin(m, lib_axis)
        return jnp.min(m[:, window_idx_dev], axis=2)  # [B, Nh]

    step = _step_from_fam(fam_of, decide)
    lm_prepare = getattr(lib_min, "prepare", None)
    if lm_prepare is not None:  # infomax: train the network once per library
        step.lib_prepare = lambda st: lm_prepare(st.lib)
    return step


def make_step(cfg: SimConfig, fam_impl: str = "jnp", lib_axis: str | None = None):
    """Single-agent step ``(AgentState, EpisodeStatics) -> (state', StepRecord)``
    (parity tests / debugging; the production path is make_step_batched)."""
    batched = make_step_batched(cfg, fam_impl, lib_axis)

    def step(state: AgentState, st: EpisodeStatics, aux=None):
        states = jax.tree.map(lambda x: x[None], state)
        out, rec = batched(states, st, aux)
        return jax.tree.map(lambda x: x[0], out), jax.tree.map(lambda x: x[0], rec)

    step.lib_prepare = getattr(batched, "lib_prepare", None)
    return step


def make_navigate(cfg: SimConfig, fam_impl: str = "jnp"):
    """Jitted single episode ``(state0, statics) -> (final_state, StepRecord[T])``."""
    step = make_step(cfg, fam_impl)
    lib_prepare = step.lib_prepare

    def navigate(state0: AgentState, st: EpisodeStatics):
        aux = None if lib_prepare is None else lib_prepare(st)
        return jax.lax.scan(
            lambda s, _: step(s, st, aux), state0, None, length=cfg.agent.max_steps
        )

    return jax.jit(navigate)


def make_navigate_batch_fn(
    cfg: SimConfig,
    fam_impl: str = "jnp",
    lib_axis: str | None = None,
    early_exit: bool = False,
):
    """Unjitted batched episode fn (parallel/mesh.py wraps it in shard_map).

    ``(AgentState[B], statics) -> (final[B], StepRecord[B, T])``; record layout
    is batch-leading (transposed from scan's time-leading order).

    ``early_exit`` uses a ``lax.while_loop`` that stops once EVERY agent is
    done (sweep cells with short episodes finish early); records are
    preallocated with ``done=True`` so untouched tail steps stay masked.
    Identical results to the scan path (tests/test_early_exit.py).
    """
    step = make_step_batched(cfg, fam_impl, lib_axis)
    t_max = cfg.agent.max_steps
    lib_prepare = getattr(step, "lib_prepare", None)

    def _step_fn(st, aux=None):
        if lib_prepare is None:
            return lambda s: step(s, st)
        if aux is None:
            # once per episode, outside the scan; callers running many
            # episodes against ONE library should prepare once and pass
            # ``aux`` explicitly — rebuilding the pre-rolled/spectral library
            # per episode costs e.g. ~6 ms (92 us/step amortized) of HBM
            # relayout at BASELINE config 2 (profiled)
            aux = lib_prepare(st)
        return lambda s: step(s, st, aux)

    if not early_exit:
        def navigate(states0: AgentState, st: EpisodeStatics, aux=None):
            step1 = _step_fn(st, aux)
            final, recs = jax.lax.scan(
                lambda s, _: step1(s), states0, None, length=t_max
            )
            recs = jax.tree.map(lambda x: jnp.moveaxis(x, 0, 1), recs)
            return final, recs

        navigate.lib_prepare = lib_prepare
        return navigate

    def navigate(states0: AgentState, st: EpisodeStatics, aux=None):
        b = states0.theta.shape[0]
        recs0 = StepRecord(
            xy=jnp.zeros((t_max, b, 2), jnp.float32),
            theta=jnp.zeros((t_max, b), jnp.float32),
            fam=jnp.zeros((t_max, b), jnp.float32),
            k=jnp.zeros((t_max, b), jnp.int32),
            dist_route=jnp.zeros((t_max, b), jnp.float32),
            done=jnp.ones((t_max, b), bool),  # untouched tail = masked
        )

        step1 = _step_fn(st, aux)

        def cond(carry):
            t, states, _ = carry
            return (t < t_max) & ~jnp.all(states.done)

        def body(carry):
            t, states, recs = carry
            states2, rec = step1(states)
            recs2 = jax.tree.map(lambda buf, r: buf.at[t].set(r), recs, rec)
            return (t + 1, states2, recs2)

        _, final, recs = jax.lax.while_loop(cond, body, (0, states0, recs0))
        recs = jax.tree.map(lambda x: jnp.moveaxis(x, 0, 1), recs)
        return final, recs

    navigate.lib_prepare = lib_prepare
    return navigate


def make_navigate_batch(
    cfg: SimConfig, fam_impl: str = "jnp", early_exit: bool = False
):
    """Batched trials (BASELINE config 4): jitted whole episodes for B agents.

    The returned fn is ``run(states0, statics, aux=None)``. Callers running
    MANY episodes against one trained library should build the per-library
    constants once via ``run.prepare(statics)`` and pass the result as
    ``aux`` — otherwise every call rebuilds the pre-rolled/spectral library
    (~6 ms of HBM relayout per episode at BASELINE config 2, profiled).
    ``run.prepare`` is None for impls with no prepare stage.
    """
    fn = make_navigate_batch_fn(cfg, fam_impl, early_exit=early_exit)
    jitted = jax.jit(fn)
    lib_prepare = getattr(fn, "lib_prepare", None)

    def run(states0: AgentState, st: EpisodeStatics, aux=None):
        return jitted(states0, st, aux)

    run.prepare = jax.jit(lib_prepare) if lib_prepare is not None else None
    return run


def navigate(landscape, lib: LibraryPack, route, start_xy, start_theta, cfg: SimConfig,
             fam_impl: str = "jnp"):
    """Convenience single-episode entry mirroring oracle.navigate's signature."""
    st = make_statics(landscape, lib, route)
    state0 = init_state(start_xy, start_theta)
    return make_navigate(cfg, fam_impl)(state0, st)


def step(state: AgentState, st: EpisodeStatics, cfg: SimConfig):
    """Convenience unjitted single step (tests/debugging)."""
    return make_step(cfg)(state, st)
