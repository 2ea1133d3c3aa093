"""Spectral familiarity path: the whole lag scan as circular cross-correlation.

Structural insight (extends SURVEY.md §3.3): every candidate view is a
stride-``u`` slice of the pooled panorama at offset ``lag`` — its pixels tile
the FULL azimuth circle (W·u == A always). The per-lag cross term

    cross[b, l, v] = sum_{r,w} S[b, r, (w·u + l) mod A] · lib[v, r, w]

is therefore a *circular correlation* over azimuth between the pooled panorama
and the zero-upsampled library row, for every lag at once:

    cross[b, ·, v] = IDFT( DFT(S[b, r, :]) · conj(DFT(zu[v, r, :])) ) summed over r

with ``zu[v, r, w·u] = lib[v, r, w]`` (zeros elsewhere). This removes the
[B, L, P] candidate tensor entirely — the round-1 config-3 bottleneck moved
~GB/step of extracted candidates (STATUS.md round 1).

TPU-first formulation: XLA's FFT lowers poorly on TPU (measured 0.8–1.7 ms
for the rfft alone at BASELINE config-3 shapes), so both transforms are
written as dense DFT *matmuls* on the MXU — exact, and the inverse transform
synthesizes only the L lags the scan actually needs:

    SRE/SIM  = S · Wre/Wim                  [B·R, A] @ [A, F]
    ZRE/ZIM  = lib · ZWre/ZWim              [Nl·R, W] @ [W, F]   (hoisted out
                                            of the episode scan by XLA — it
                                            depends only on the library)
    Gre      = Σ_r SRE·ZRE + SIM·SIM'       'brf,vrf->bvf'
    Gim      = Σ_r SIM·ZRE − SRE·ZIM
    cross    = Gre · Vre + Gim · Vim        [B·Nl, F] @ [F, L]

where F = A//2 + 1 real-signal bins and Vre/Vim fold the hermitian-symmetry
weights (w_k = 2 except DC/Nyquist) and the 1/A normalization.

Numerics: exact circular correlation up to fp32 rounding (~1e-6 relative,
far tighter than the bf16x3 matmul passes the extract-then-matmul path uses).
Parity with familiarity.distance_matrix: tests/test_fft_fam.py.
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


def _forward_weights(a: int) -> tuple[np.ndarray, np.ndarray]:
    """DFT analysis weights: SF[k] = sum_a s[a] e^{-i 2π k a / A}.
    Returns (Wre, Wim) f32[A, F]."""
    f = a // 2 + 1
    k = np.arange(f)
    ang = -2.0 * np.pi * np.outer(np.arange(a), k) / a  # [A, F]
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


def _library_weights(w: int, u: int, a: int) -> tuple[np.ndarray, np.ndarray]:
    """Analysis weights for the zero-upsampled library row (support at w·u):
    ZF[k] = sum_w z[w] e^{-i 2π k (w u) / A}. Returns (ZWre, ZWim) f32[W, F]."""
    f = a // 2 + 1
    k = np.arange(f)
    ang = -2.0 * np.pi * np.outer(np.arange(w) * u, k) / a  # [W, F]
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


def _inverse_lag_weights(a: int, lags: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Real-IDFT synthesis weights evaluated only at ``lags``:
    c[l] = sum_k w_k (Gre[k] cos(2π k l / A) − Gim[k] sin(2π k l / A)) / A
    with w_k = 2 for the doubled hermitian bins, 1 for DC (and Nyquist when A
    is even). Returns (Vre, Vim) f32[F, L]."""
    f = a // 2 + 1
    k = np.arange(f)
    wk = np.full(f, 2.0)
    wk[0] = 1.0
    if a % 2 == 0:
        wk[-1] = 1.0
    ang = 2.0 * np.pi * np.outer(k, np.asarray(lags)) / a  # [F, L]
    vre = (wk[:, None] * np.cos(ang)) / a
    vim = -(wk[:, None] * np.sin(ang)) / a
    return vre.astype(np.float32), vim.astype(np.float32)


def make_lib_min_fft(sensor: SensorConfig, scan: ScanConfig, lags: np.ndarray):
    """Per-lag library minimum via spectral correlation:
    ``lib_min(S f32[B, R, A], lib, lag_sum f32[B, L], lag_sq f32[B, L]) ->
    M f32[B, L]`` — same contract as agent._make_lib_min's jnp path but
    consuming the pooled panorama directly (no candidate extraction).
    """
    if scan.metric not in ("ssd", "ncc"):
        raise ValueError(f"unknown familiarity metric {scan.metric!r}")
    a = sensor.n_fine
    r, w = sensor.n_radial, sensor.n_azimuth
    u = sensor.az_upsample
    p = float(sensor.n_pixels)
    prec = matmul_precision(scan.matmul_precision)

    wre_np, wim_np = _forward_weights(a)
    zwre_np, zwim_np = _library_weights(w, u, a)
    vre_np, vim_np = _inverse_lag_weights(a, np.asarray(lags))
    f_full = a // 2 + 1
    fc = scan.spectral_cutoff or f_full
    if not 0 < fc <= f_full:
        raise ValueError(
            f"spectral_cutoff must be in (0, {f_full}], got {scan.spectral_cutoff}"
        )
    # truncated-series approximation (ScanConfig.spectral_cutoff): drop the
    # tail frequency bins from analysis AND synthesis — every downstream
    # matmul shrinks proportionally. fc == f_full is exact.
    wre = jnp.asarray(wre_np[:, :fc])
    wim = jnp.asarray(wim_np[:, :fc])
    zwre = jnp.asarray(zwre_np[:, :fc])
    zwim = jnp.asarray(zwim_np[:, :fc])
    vre = jnp.asarray(vre_np[:fc, :])
    vim = jnp.asarray(vim_np[:fc, :])
    inv_u = 1.0 / u
    # precision of the spectral-product + lag-synthesis stages; the forward
    # DFT always runs at scan.matmul_precision (its coefficients feed
    # everything downstream)
    prod_prec = matmul_precision(
        scan.fft_product_precision
        if scan.fft_product_precision != "inherit"
        else scan.matmul_precision
    )

    # stack re/im into one 2R-deep contraction only while that still fits a
    # single 128-deep MXU tile: at R=16, two 2R=32-deep einsums beat four
    # 16-deep ones; at R=64, 2R=128 gains nothing over K=64 while the sc/sd
    # concat materializes 2x [B, 2R, F] to HBM (profiled 143 us/step at
    # BASELINE config 3) — keep re/im separate there.
    stack_reim = r < 64

    def _prepare_rows(zrows: jnp.ndarray):
        """Library-side spectra + row sums — per-episode constants, computed
        once through the prepare stage (agent.make_navigate_batch_fn) rather
        than relying on XLA loop-invariant code motion inside the scan."""
        nl = zrows.shape[0]
        rowsum_z = jnp.sum(zrows.reshape(nl, r, w), axis=2)  # [Nl, R]
        z = zrows.reshape(nl * r, w)
        zre = jnp.dot(z, zwre, precision=prec).reshape(nl, r, -1)
        zim = jnp.dot(z, zwim, precision=prec).reshape(nl, r, -1)
        if stack_reim:
            # stacked re/im (see _cross): the candidate side stacks ONCE as
            # sc = [sre; sim]; both G components come from library-side
            # stackings (per-episode constants): gre = sc.zc with
            # zc = [zre; zim], gim = sc.zd with zd = [-zim; zre] — the
            # per-step sd = [sim; -sre] concat this replaces moved 2x
            # [B, 2R, F] through HBM (~88 us/step at config 1)
            zc = jnp.concatenate([zre, zim], axis=1)  # [Nl, 2R, F]
            zd = jnp.concatenate([-zim, zre], axis=1)
            return (zc, zd), rowsum_z
        return (zre, zim), rowsum_z

    f_idx_i32 = jnp.arange(fc, dtype=jnp.int32)
    # the DC bin is removed from the spectral product (see _cross) by zeroing
    # column 0 of the forward weights — folding the mask into the static
    # weights costs nothing, vs ~94 us/step for an elementwise mask pass on
    # [B, R, F] at config 1 (wim[:, 0] == 0 already for real input)
    wre_dc = wre.at[:, 0].set(0.0)

    def _cross(s: jnp.ndarray, aux, roll_k=None) -> jnp.ndarray:
        """(S f32[B,R,A], prepared (zc, rowsum_z)) -> cross f32[B, Nl, L]
        where cross[b,v,l] = (1/u) sum_{rw} S[b,r,(wu+l)%A] zrows[v,(r,w)].

        The DC spectral product |SF[0]||ZF[0]| would dominate G (~1e4 on unit
        pixels), and its f32 rounding noise decorrelates across lags —
        measured 17x worse epsilon-optimality of the selected lag vs float64
        at BASELINE config 2's dense library. Mean-centering the panorama
        only changes the DC bin, so instead of materializing a centered
        [B, R, A] tensor the DC bin is masked out of the spectra (SF[0] is
        the row sum, recovered as mu) and the exact lag-independent
        correction sum_a mu[b,r]·zu[v,r,a] = mu[b,r]·rowsum_z[v,r] is added
        back — one tiny [B,R]@[R,Nl] matmul (see _cross_spectral)."""
        b = s.shape[0]
        flat = s.reshape(b * r, a)
        # every matmul below must honor prec: plain `@` would run bf16x1 on
        # TPU, and DFT coefficients reach ~A·mean magnitude, so 0.4% bf16
        # noise swamps the SSD/NCC argmin (measured recall 0.99 -> 0.07)
        sre = jnp.dot(flat, wre_dc, precision=prec).reshape(b, r, -1)
        sim = jnp.dot(flat, wim, precision=prec).reshape(b, r, -1)
        mu = jnp.mean(s, axis=2)  # [B, R] — the (masked-out) SF[0] / A
        return _cross_spectral((sre, sim, mu), aux, roll_k)

    def _cross_spectral(spec, aux, roll_k=None) -> jnp.ndarray:
        """Spectral-domain tail of :func:`_cross`, entered directly by the
        fused sector renderer (sensor.make_render_batch_rolled with
        ``contract=forward_mats``) which produces the DC-masked panorama
        spectra without materializing the [B, R, A] panorama at all.

        ``spec`` = (sre f32[B,R,F], sim f32[B,R,F], mu f32[B,R]) with the DC
        bin already masked from sre (column 0 of the forward weights is
        zeroed) and mu = SF[0]/A the azimuth row means.

        ``roll_k`` (i32[B], from the sector renderer) absorbs the exact
        azimuth roll pano_theta[a] = pano_phi[a+k] in the spectral domain:
        DFT(S_theta)[f] = e^{i 2 pi f k / A} DFT(S_phi)[f] — a per-(b, f)
        complex rotation of the panorama spectra, so the lag synthesis below
        runs at the TRUE candidate lags with no rolled tensor materialized
        (mu is roll-invariant)."""
        sre, sim, mu = spec
        zc, rowsum_z = aux[0], aux[1]  # NCC aux carries a third leaf (zsum)
        k_corr = jnp.einsum("br,vr->bv", mu, rowsum_z, precision=prec)
        if roll_k is not None:
            # reduce k*f mod A in exact int32 first: the raw angle reaches
            # ~A*pi rad where f32 quantization injects ~1e-4 phase noise —
            # exactly the decorrelated per-lag noise scale that costs recall
            # on flat-valley workloads (STATUS.md)
            kf = jnp.mod(roll_k[:, None] * f_idx_i32[None, :], a)
            ang = (2.0 * np.pi / a) * kf.astype(jnp.float32)
            ck = jnp.cos(ang)[:, None, :]  # [B, 1, F]
            sk = jnp.sin(ang)[:, None, :]
            sre, sim = sre * ck - sim * sk, sre * sk + sim * ck
        if stack_reim:
            zc_s, zd_s = zc
            sc = jnp.concatenate([sre, sim], axis=1)  # [B, 2R, F]
            gre = jnp.einsum("brf,vrf->bvf", sc, zc_s, precision=prod_prec)
            gim = jnp.einsum("brf,vrf->bvf", sc, zd_s, precision=prod_prec)
        else:
            zre, zim = zc
            gre = jnp.einsum("brf,vrf->bvf", sre, zre, precision=prod_prec) + jnp.einsum(
                "brf,vrf->bvf", sim, zim, precision=prod_prec
            )
            gim = jnp.einsum("brf,vrf->bvf", sim, zre, precision=prod_prec) - jnp.einsum(
                "brf,vrf->bvf", sre, zim, precision=prod_prec
            )
        # IDFT as einsum (NOT reshape->dot->reshape): the reshape round-trip
        # forced [B, Nl, F] layout copies around the batched matmul — profiled
        # 151 us/step at config 1; the einsum form lets XLA keep the spectral
        # product's native layout (+20% end-to-end at config 1)
        cross = jnp.einsum("bvf,fl->bvl", gre, vre, precision=prod_prec) + jnp.einsum(
            "bvf,fl->bvl", gim, vim, precision=prod_prec
        )
        return (cross + k_corr[:, :, None]) * inv_u

    # forward analysis weights [A, 2F] for the fused sector renderer: one
    # matmul against the per-sector render partials produces (sre | sim)
    # directly — the [B, R, A] panorama is never materialized (agent.py wires
    # this when render_mode="sector", u == 1, fam_impl="fft")
    forward_mats = jnp.concatenate([wre_dc, wim], axis=1)

    if scan.metric == "ssd":

        def prepare(lib: LibraryPack):
            return _prepare_rows(lib.flat)

        def _finish(cross, lib, lag_sum, lag_sq, aux):
            pen = (1.0 - lib.valid) * PAD_PENALTY
            d = (
                lag_sq[:, None, :]
                + (lib.sq + pen)[None, :, None]
                - 2.0 * cross
            )
            return jnp.min(jnp.maximum(d, 0.0), axis=1)  # [B, L]

    else:

        def prepare(lib: LibraryPack):
            # zsum ([Nl], ≈0 for z-scored views; kept exact) lives in the
            # prepare aux: computed per step it is a full [Nl, P] library
            # reduction inside the episode scan, riding on the XLA
            # loop-invariant hoisting this module was measured to lose
            return _prepare_rows(lib.z) + (jnp.sum(lib.z, axis=1),)

        def _finish(cross, lib, lag_sum, lag_sq, aux):
            pen = (1.0 - lib.valid) * PAD_PENALTY
            mu = lag_sum / p
            var = jnp.maximum(lag_sq / p - mu * mu, 0.0)
            sigma = jnp.sqrt(var + NCC_EPS)
            zsum = aux[2]
            zdot = (cross - mu[:, None, :] * zsum[None, :, None]) / sigma[:, None, :]
            d = 1.0 - zdot / p + pen[None, :, None]
            return jnp.min(d, axis=1)  # [B, L]

    def lib_min(s, lib: LibraryPack, lag_sum, lag_sq, aux=None, roll_k=None):
        if aux is None:
            aux = prepare(lib)
        cross = _cross(s, aux, roll_k)
        return _finish(cross, lib, lag_sum, lag_sq, aux)

    def lib_min_spectral(spec, lib: LibraryPack, lag_sum, lag_sq, aux=None,
                         roll_k=None):
        if aux is None:
            aux = prepare(lib)
        cross = _cross_spectral(spec, aux, roll_k)
        return _finish(cross, lib, lag_sum, lag_sq, aux)

    lib_min.prepare = prepare
    lib_min.spectral = lib_min_spectral
    lib_min.forward_mats = forward_mats
    return lib_min
