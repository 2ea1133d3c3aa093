"""Static configuration dataclasses (shared by oracle and JAX paths).

All fields are static Python values: under ``jit`` they are closed over, so
every distinct config compiles once (SURVEY.md §3.5 shape-polymorphism note).
Semantics: SEMANTICS.md §3–§5.
"""

from __future__ import annotations

import dataclasses
import math


@dataclasses.dataclass(frozen=True)
class SensorConfig:
    """Polar-panorama sensor (SEMANTICS.md §3).

    The sensor view is ``(n_radial, n_azimuth)`` px; the fine panorama has
    ``n_azimuth * az_upsample`` azimuth bins so candidate headings land on
    integer fine-bin shifts (rotation == cyclic shift, exact).
    """

    n_radial: int = 16
    n_azimuth: int = 72
    az_upsample: int = 5
    r_min: float = 2.0
    r_max: float = 10.0
    # dtype of the bilinear hat-weight tensors in the batched renderer:
    # "float32" (exact bilinear, parity-tested vs the gather renderer) or
    # "bfloat16" (~2x renderer speed: the hat tensors dominate HBM traffic;
    # weights lose <=2^-9 relative -> ~1e-3 pixel noise, accumulation stays
    # f32. Route-recall measured unchanged at BASELINE configs 1-3 — the
    # bench accuracy gate is the arbiter, SEMANTICS.md §3 note).
    hat_dtype: str = "float32"
    # renderer formulation: "full" = one hat matmul over the whole window
    # per azimuth column; "sector" = heading decomposed as k*bin_width + phi
    # (exact identity pano_theta[a] = pano_phi[a+k], SEMANTICS.md §3 note) so
    # sample offsets are nearly static and the azimuth circle splits into
    # static sectors whose hat support is ~11x11 instead of wsz x wsz (4.6x
    # fewer render FLOPs at 8 sectors). Identical sample points up to fp
    # rounding of the rotation (parity: atol ~2e-4 f32 / 2e-2 bf16 — see
    # sensor.py and SEMANTICS.md §3); the k
    # roll is absorbed as a spectral phase rotation, so "sector" takes
    # effect only with fam_impl="fft" — other impls fall back to the
    # (numerically equivalent) full renderer. Unknown values raise in
    # agent.make_step_batched.
    render_mode: str = "full"
    n_sectors: int = 8
    # sector mode only: split the rings into this many contiguous blocks
    # with per-block tap bounds. Inner rings have much smaller hat support
    # (2 blocks: 23% fewer weight elements at the config-3 sensor), but the
    # measured end-to-end result is a LOSS — per-piece overhead beats the
    # savings (config 3: 272k at 1 block, 264k at 2, 239k at 4) — so the
    # default stays 1; the knob remains for other geometries.
    ring_blocks: int = 1
    # sector mode only: quantize the residual rotation phi (|phi| <=
    # bin_width/2) to this many bins and contract against PRECOMPUTED static
    # hat-weight tensors per (piece, phi-bin), selected per agent by a
    # one-hot MXU matmul — the per-sample VPU hat-weight generation (the
    # measured config-3 frontier, STATUS.md) leaves the step entirely. The
    # fractional window offset (fx, fy) is applied by pre-shifting the
    # window itself (one 4-tap bilinear blend per agent, VPU-trivial).
    # APPROXIMATE twice over: (a) the heading rounds to the phi grid
    # (sample displacement <= r_max*bin_width/(2*phi_bins) px — 0.011 px at
    # the BASELINE config-3 sensor with 8 bins); (b) pre-shifting the window
    # composes two bilinear kernels, widening the effective sampling kernel
    # by the (fx, fy) 2-tap blend. The bench recall gate is the arbiter.
    # 0 = off (exact continuous-phi hat generation).
    # MEASURED RESULT (round 4, artifacts/phi_bins_refutation.jsonl): 2.2x
    # SLOWER than the exact path at BASELINE config 3 (229k vs 512k steps/s,
    # recall 1.000 both), flat in phi_bins — the selected [B, taps, M]
    # weight tensors materialize to HBM (matmuls don't fuse into matmul
    # operands) where the exact path's hat generation fuses into the
    # contraction and never leaves VMEM. Kept as a documented negative
    # result; do not enable expecting a win.
    phi_bins: int = 0

    @property
    def n_fine(self) -> int:
        return self.n_azimuth * self.az_upsample

    @property
    def bin_width(self) -> float:
        return 2.0 * math.pi / self.n_fine

    @property
    def n_pixels(self) -> int:
        return self.n_radial * self.n_azimuth


@dataclasses.dataclass(frozen=True)
class ScanConfig:
    """Heading scan (SEMANTICS.md §5) + familiarity scoring mode (§4)."""

    n_headings: int = 60
    scan_step_bins: int = 2
    metric: str = "ssd"  # "ssd" | "ncc"
    tol_bins: int = 0  # RIDF rotation tolerance (fine bins), 0 = off
    # MXU passes for the distance cross-term: "high" (bf16x3, ~fp32 quality,
    # the default) | "highest" (bf16x6) | "default" (bf16x1 — ~2x faster
    # steps but the SSD decomposition cancels catastrophically at bf16:
    # measured recall collapse 1.00 -> 0.13 at BASELINE config 2. Only use
    # with the success gate validated for your config.)
    # Honored by fam_impl "jnp" and "conv"; the Pallas kernel is pinned to
    # HIGHEST (Mosaic does not support HIGH dot precision inside kernels).
    matmul_precision: str = "high"
    # fam_impl="fft" only: precision of the spectral-product + lag-synthesis
    # matmuls ("inherit" = matmul_precision). The forward DFT always runs at
    # matmul_precision — its coefficients feed everything downstream.
    # "default" (bf16x1) measured at BASELINE configs 1/3: +22%/+10% speed
    # but recall 0.99 -> 0.81 / 1.00 -> 0.60 — the same flat-valley
    # precision wall as roll_rank; only for workloads with recall slack.
    fft_product_precision: str = "inherit"
    # fused sector front-end (render_mode="sector", u=1, fam_impl="fft"
    # only): contract the forward DFT per sector INSIDE the renderer — the
    # [B, R, A] panorama is never materialized and the lag stats reduce from
    # the same partials. Values: "off" (default: unfused sector path) or a
    # precision for the per-sector contraction ("inherit" = matmul_precision,
    # "default" = one bf16 pass, "high", "highest"). The fusion fragments the
    # K=A forward DFT into n_sectors K=A/n matmuls; at HIGH that
    # fragmentation costs more than the saved HBM round trip (measured
    # BASELINE config 3: 312k fused vs 340k unfused), but at one bf16 pass it
    # wins: 374k at recall 1.000 (the short K=45 sums bound bf16 rounding
    # well below NCC's valley depth; the bench recall gate is the arbiter —
    # flat-valley SSD workloads should gate before trusting "default").
    fused_dft_precision: str = "off"
    # fam_impl="fft" only: keep only the first `spectral_cutoff` frequency
    # bins of the azimuth DFT (0 = all A//2+1 bins, exact). Natural-scene
    # spectra decay with frequency, so the tail bins add little familiarity
    # signal but a proportional share of the DFT/product/synthesis matmul
    # cost. APPROXIMATE — unlike every other fft-path transform this changes
    # the metric (a high-frequency blur of the correlation); gate recall
    # before adopting. Measured sweeps (blobs world, two trial seeds):
    # config 3 (fused, B=256): 181(exact)/120/90/60/45/30/24 ->
    # 388k/428k/445k/464k/476k/488k/497k steps/s, recall 1.000 at EVERY
    # point across three trial seeds — default 30 (one step of margin above
    # the lowest probed-safe cutoff). Config 1 (B=1024): 181/144/120/90/72/60 ->
    # 1,121k/1,243k/1,300k/1,336k/1,450k/1,452k, recall
    # .982/.987/.988/.985/.980/.981 (seed 0; seeds 1/2 at cutoff 72: .989/
    # .988; a 5x-longer 260-view route at 72: 1.000 — the seed band is
    # ±0.5pp, so 72 matches 90 and the exact path within noise) — default 72
    # (the saturation point). For reference, the jnp extract-then-matmul
    # path measures 0.999 here: the spectral family as a whole trades ~1pp
    # recall for ~4x throughput, a standing accuracy-gated choice since
    # round 2. Second-world gate (round 4, artifacts/bench_r4_gate_demo.
    # jsonl): on a fractal 1/f^2 world — where the familiarity valley
    # flattens and an approximate metric is exactly what should fail — the
    # adopted defaults hold: config 1 recall 1.000 (= exact ref), config 3
    # 0.949 vs exact 0.957 (in-band; the fractal world is intrinsically
    # harder for the exact metric too).
    # NOTE (round 4): phi_bins (SensorConfig) was the attempted next step on
    # this frontier and is REFUTED — see SensorConfig.phi_bins.
    spectral_cutoff: int = 0
    # fam_impl="roll" + metric="ssd" only: exact fixed-point familiarity.
    # 8 = quantize candidate planes and the pre-rolled library to the
    # 1/255 grid (views live in [0, 1]) and compute ALL THREE SSD terms in
    # integer arithmetic — the cross term as one int8 x int8 -> int32 MXU
    # matmul (native on v5e, ~6x the bf16x3 pass throughput). The result is
    # the EXACT SSD between the quantized images: a consistent metric with
    # zero decorrelated per-lag noise — the failure mode of every measured
    # approximate reformulation (fft/centered-bf16/low-rank; STATUS.md
    # speed-of-light section). What changes is the metric itself (8-bit
    # sensor quantization, ~4e-3 per pixel); the bench recall gate is the
    # arbiter. 0 = off (f32/bf16x3 path).
    fixed_point_bits: int = 0
    # fam_impl="roll" + metric="ssd" only: rank of the exact low-rank split
    # of the cross term, c.l = c.m + (c.U)y_v + c.r_v with r_v the library's
    # residual off its top-k basis. The k-wide pieces run at HIGH; only the
    # full-width residual matmul runs at one bf16 pass, where its error is
    # bounded by |c|*|r_v|*2^-9 — negligible when the library is a smooth
    # route (measured effective rank ~16 at BASELINE config 2's 500 views;
    # tail |r|^2 ~ 1e-4). 0 = dense cross term at matmul_precision.
    # Measured win (round 4, artifacts/int8_rank_demo.jsonl): on a noise-
    # world dense-library workload (deep valley) roll_rank=16 gives +51%
    # steps/s and fixed_point_bits=8 +11%, both at recall equal to the
    # default — while the same knobs lose recall on the flat-valley blobs
    # bench world. Gate recall per workload before adopting.
    roll_rank: int = 0
    # fam_impl="infomax" only: the LEARNED familiarity memory from the same
    # literature as the perfect-memory model (Baddeley/Graham/Husbands/
    # Philippides 2012's second model; Lulham et al. 2009 Infomax rule) —
    # instead of min-distance over the stored library, a single-layer
    # novelty network is trained on the (z-scored) library views and
    # familiarity = mean |Wx| response. Memory is O(units x pixels),
    # CONSTANT in library size — the complement to the measured Nl-
    # proportional walls of the perfect-memory paths (artifacts/
    # biglib_ext.jsonl). A different MODEL, not an equivalent impl: recall
    # differs from perfect memory; always opt-in, never chosen by "auto".
    # 0 units = n_pixels (the literature's default shape; scoring cost and
    # memory scale with units — measured trade for fewer: on the easy
    # route-60 world even units=P/8 holds recall 0.98, on the config-1
    # noisy-start workload units=P/2 already costs ~28pp. Workload-gated
    # opt-in, like every approximation knob here). eta=0.1 with
    # epochs=0 = AUTO (~0.8*n_pixels updates per arc-pixel of route,
    # familiarity_infomax.auto_epochs): the literature's single presentation
    # at eta=0.01 is undertrained at these sensor scales — the dose-response
    # is knee -> plateau -> overtraining decline, and the optimum is
    # invariant in updates per arc-pixel (0.78-1.0*P/px on every measured
    # workload; curves at auto_epochs and in artifacts/RESULTS.md). DENSITY
    # CAUTION (artifacts/infomax_density.jsonl): infomax recall DECLINES
    # with capture density (near-duplicate training views narrow the
    # suppressed subspace and shrink the noise margin) — choose
    # capture_spacing for the learned model; don't inherit a dense
    # perfect-memory library. WORLD CAUTION (artifacts/RESULTS.md): recall
    # is world-dependent (blobs 1.00 / fractal 0.48 / noise 0.27 at AUTO on
    # 512^2 worlds where perfect memory holds 0.94-1.00; no budget rescues
    # the noise world past ~0.56) — gate recall per world before adopting.
    # Round-5 mitigation sweep (artifacts/infomax_noise.jsonl): the
    # collapse is specifically the STRAIGHT-route/noise regime (training
    # views share one heading and translate through decorrelating texture —
    # the density law's near-duplicate mechanism); none of the literature's
    # training-rule mitigations rescues it (weight renorm per epoch/update,
    # linear/exp eta decay, shuffled presentation, units in {P/4..2P}: best
    # 0.23 vs base 0.17, jnp 1.00 — REFUTED). The one working mitigation is
    # CAPTURE-side: train on a heading-jittered library (0.17 -> 0.45-0.72
    # at +-0.2-0.4 rad; train_library(heading_jitter=...) documents the
    # separate-training-library recipe and the +-0.8 failure). On heading-diverse (curved)
    # routes through the same noise world the model WORKS and units < P is
    # the one positive knob: units=P/4..P/2 -> mean 0.87-0.89 over two net
    # seeds (0.92/0.81, 0.92/0.86) vs base 0.82, vs jnp 0.70 — there the
    # learned memory beats perfect memory. The units<P
    # win is SPARSE-capture-specific AND seed-variable (two net seeds:
    # +11pp to -1pp at spacing 1.0; consistently -7 to -31pp at dense
    # 0.25-0.5 where full units hold 0.77-0.84): treat units<P as a
    # throughput/memory knob, recall-gate it on your workload, and keep
    # units=P when inheriting a dense library.
    infomax_units: int = 0
    infomax_eta: float = 0.1
    infomax_epochs: int = 0
    infomax_seed: int = 0

    def shifts(self) -> list[int]:
        """Candidate fine-bin shifts relative to the current heading."""
        half = self.n_headings // 2
        return [(k - half) * self.scan_step_bins for k in range(self.n_headings)]

    def tie_order(self) -> list[int]:
        """Candidate evaluation order for argmin tie-breaking: smallest
        |shift| first, then lowest index (SEMANTICS.md §5). Taking the argmin
        over candidates permuted by this order implements the rule exactly."""
        s = self.shifts()
        return sorted(range(self.n_headings), key=lambda k: (abs(s[k]), k))


@dataclasses.dataclass(frozen=True)
class AgentConfig:
    """Kinematics and stop conditions (SEMANTICS.md §2, §5)."""

    step_size: float = 1.0
    goal_radius: float = 2.0
    corridor: float = 20.0
    max_steps: int = 256  # must cover the route length in steps


@dataclasses.dataclass(frozen=True)
class SimConfig:
    """Bundle of everything static for one simulation setup."""

    sensor: SensorConfig = SensorConfig()
    scan: ScanConfig = ScanConfig()
    agent: AgentConfig = AgentConfig()
    capture_spacing: float = 1.0  # world units between stored training views


# --- BASELINE.json benchmark configurations (BASELINE.md table) -------------

def baseline_config(n: int) -> SimConfig:
    """The five driver-specified benchmark configs (/root/repo/BASELINE.json:7-11).

    Benchmark configs 1–4 run the bfloat16 hat-weight renderer: route-recall
    is measured unchanged at these workloads (the bench accuracy gate checks
    it every run) and the renderer is ~2x faster. Library density (the
    "~50 / 500 stored views" of the spec) is a property of the route +
    ``capture_spacing``; bench.py sizes spacing so the spec'd view count comes
    out exactly (BASELINE.md).
    """
    if n == 1:  # ~50 stored 72x16 views, 60-heading SSD scan
        # render_mode stays "full": at R=16 the sector path's per-sector
        # matmuls are too small to beat the one fused hat einsum (re-measured
        # under honest timing at B=1024: 991k/1,069k sector at 8/4 sectors
        # vs 1,121k full); the tall config-3 sensor wins.
        # spectral_cutoff=72: see the ScanConfig sweep — recall matches the
        # exact fft path within the ±0.5pp seed band, +29% steps/s
        return SimConfig(
            sensor=SensorConfig(hat_dtype="bfloat16"),
            scan=ScanConfig(spectral_cutoff=72),
        )
    if n == 2:  # dense library: 500 views, 1-degree scan steps
        return SimConfig(
            sensor=SensorConfig(hat_dtype="bfloat16"),
            scan=ScanConfig(n_headings=120, scan_step_bins=1),
            capture_spacing=0.2,
        )
    if n == 3:  # high-res sensors: 360x64 px, NCC + rotation tolerance
        return SimConfig(
            sensor=SensorConfig(
                n_radial=64,
                n_azimuth=360,
                az_upsample=1,
                hat_dtype="bfloat16",
                render_mode="sector",
            ),
            # fused_dft_precision="default": the per-sector forward-DFT
            # contraction runs at one bf16 pass inside the renderer (no
            # [B, R, A] panorama) — 377k vs 340k unfused at recall 1.000.
            # spectral_cutoff=30: recall 1.000 at every swept cutoff down to
            # 24, across three seeds; ~488k
            scan=ScanConfig(n_headings=60, scan_step_bins=2, metric="ncc",
                            tol_bins=3, fused_dft_precision="default",
                            spectral_cutoff=30),
        )
    if n == 4:  # batched trials: 1024 vmapped agents (batching set by caller)
        return SimConfig(
            sensor=SensorConfig(hat_dtype="bfloat16"),
            scan=ScanConfig(spectral_cutoff=72),
        )
    if n == 5:  # sweep grid — cells built by navdv_tpu.sweep
        return SimConfig()
    raise ValueError(f"unknown baseline config {n}")


def baseline_fam_impl(n: int) -> str:
    """Fastest measured familiarity impl per benchmark config (v5e-1, round 2):
    the spectral (fft) path wins where the familiarity valley is deep
    (configs 1/3/4); the dense-library config 2 uses the rolled-library
    matmul path — same extraction-free structure, but matmul-identical
    numerics to "jnp", which keeps recall at 0.99 where the spectral path's
    decorrelated per-lag noise wanders in config 2's flat valley
    (familiarity_roll.py, STATUS.md). Config 5 (sweeps) resolves per cell via
    :func:`choose_fam_impl` — cells differ in exactly the quantities the
    rule reads."""
    return {1: "fft", 2: "roll", 3: "fft", 4: "fft", 5: "auto"}[n]


def choose_fam_impl(cfg: SimConfig) -> str:
    """Resolve ``fam_impl="auto"``: the measured per-workload winner rule
    (VERDICT round 3, weak 4 — user-facing defaults routed to the slowest
    impl unless the caller knew the knob).

    The rule generalizes :func:`baseline_fam_impl`'s measured outcomes:

    - NCC metric -> "fft": the spectral path carries the rotation-tolerant
      scan's algebra natively (config 3: 3.0x "jnp") and NCC's z-scored
      valley is deep enough that spectral rounding never decided a step in
      any measured workload (recall 1.000 across seeds).
    - SSD + dense library (capture_spacing <= 0.5) -> "roll": adjacent
      stored views are near-duplicates, so the familiarity valley is FLAT
      and the fft path's decorrelated per-lag rounding noise can out-vote
      the signal (config 2: recall 0.99 -> wandering; STATUS.md). The rolled
      path is matmul-identical to "jnp" at ~5x its speed.
    - SSD + sparse library -> "fft": the valley is deep (config 1/4: recall
      within the documented 1-2pp band at 4-7x "jnp").
    - Small sensor (n_pixels < 512) -> "jnp", for BOTH metrics: measured
      round 4 for SSD (artifacts/sweep_r4_auto + small-sensor probe): at
      18x4 (u=20) the extract-then-matmul path runs 1.31M steps/s — 1.9-3.1x
      fft and ~2x roll — because the extraction-free paths pay the FULL
      fine-azimuth circle (A=360 DFT bins / a u-times-wider pre-rolled
      library) for views of only 72-288 px, a cost structure the metric
      does not change (NCC adds only per-view z-scoring to both paths);
      the fft path also lost up to 17pp recall at sparse SSD spacings
      there. Exact numerics, fastest, no trade (ADVICE r4: the small-sensor
      rule now precedes the metric branch; TPU confirmation of the NCC
      small-sensor ordering is in artifacts/ncc_small_sensor.jsonl).
    """
    if cfg.sensor.n_pixels < 512:
        return "jnp"
    if cfg.scan.metric == "ncc":
        return "fft"
    if cfg.capture_spacing <= 0.5:
        return "roll"
    return "fft"
