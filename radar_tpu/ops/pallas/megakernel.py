"""Pallas mega-kernel: raw int16 shorts -> RD power (+ CA-CFAR threshold)
with NO intermediate ever reaching HBM.

Stage-budget finding (scripts/stage_budget.py, v5e on-chip): the fused
XLA pipeline writes the range planes (~268 MB per 512-frame batch) and
the RD planes (~268 MB) to HBM and immediately reads each back, then
CA-CFAR's 273-tap ``reduce_window`` burns ~1.5 ms of VPU time on the
power map.  All of that is one kernel's worth of work per frame:

* range DFT: one (C*V, 2S) @ (2S, R) matmul pair on the raw int16 frame
  (the TI interleave decode and Hann window are folded into the DFT
  matrices, ops/fuseddft.py) minus the transformed base frame;
* Doppler DFT: a (D, Kc) @ (Kc, TX*V*R) complex matmul pair — the TDM
  demux ``(C*V, R) -> (Kc, TX*V*R)`` is a contiguous in-VMEM reshape;
* power integration: elementwise square-accumulate over the virtual-RX
  axis of the Doppler OUTPUT, while it is still in VMEM;
* CA-CFAR: the wrap/reflect box sums are banded 0/1/2 matrices (exact in
  bfloat16), so ``threshold = (Td @ p @ Sr^T - Gd @ p @ Gr^T) * alpha/n``
  is four more MXU matmuls per map instead of a 273-tap sliding window.

HBM traffic for the whole front+mid pipeline drops from ~1.1 GB to
105 MB read (int16 raw) + 66 MB written (power + threshold) per
512-frame batch.  Measured on v5e: 3.30 ms vs 5.22 ms for the fused XLA
formulation of the same prefix (~1.9 ms off the 5.9 ms on-chip headline).

The detection tail's K per-frame AoA snapshots are then recomputed from
the SAME raw frames with per-detection gathered DFT rows
(:func:`snapshots_from_shorts`): ~2 MFLOP per frame, numerically
equivalent to gathering from materialized RD planes.

Matmul precision: Mosaic lowers only DEFAULT/HIGHEST dot precisions, so
``cfg.dft_precision == 'high'`` (XLA's 3-pass bf16) is reproduced
explicitly — split each operand into a bf16 hi part and a bf16 residual
and keep the hi*hi + hi*lo + lo*hi terms (~1.4e-5 relative on the
default geometry, same class as the XLA fused path).  The Doppler stage
carries its terms in ONE dot per output plane: since
``dot(concat(A_i, axis=1), concat(B_i, axis=0)) == sum_i A_i @ B_i``,
the complex pair dr = fr@xr - fi@xi / di = fr@xi + fi@xr collapses to
two K=6*Kc dots against slot-packed host-built LHS constants
(:func:`_dop_lhs_consts`) and one shared per-frame RHS concat
(:func:`_dop_rhs`) — a single f32 accumulation chain instead of five
(D, TV*R)-sized VPU adds per plane.  The CFAR band
matmuls use the exact-band split scheme instead (cfar_kernel.split3):
(total - inner) cancels, so operand-representation error would amplify
to ~5e-4 relative near strong peaks — but the 0/1/2 band matrices are
EXACT in bf16 and the f32 map splits EXACTLY into three bf16 terms, so
three bf16 passes per product carry pure f32-accumulation-order error
(observed up to ~3e-4 relative near strong peaks on v5e, same class as
a true-f32 HIGHEST product at half its MXU passes; hit decisions
identical, test gate 1e-3).

Reference contrast: the reference materializes every intermediate and
crosses the PCIe boundary per frame (acceleration.cu:435-519); here the
two largest intermediates of the whole pipeline stop existing.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from radar_tpu.config import RadarConfig, DEFAULT_CONFIG
from radar_tpu.ops.cfar import cfar_alpha, cfar_band_matrices
from radar_tpu.ops.dftmat import dft_matrix, resolve_precision
from radar_tpu.ops.pallas.cfar_kernel import (
    band_mm,
    band_threshold,
    mm_band,
    split3,
)


# ---------------------------------------------------------------------------
# in-kernel matmul helpers


def _split(a):
    """f32 -> (bf16 hi, bf16 residual); hi + lo == a up to ~2^-16 rel."""
    hi = a.astype(jnp.bfloat16)
    return hi, (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)


_DOT = functools.partial(
    jax.lax.dot_general,
    dimension_numbers=(((1,), (0,)), ((), ())),
    preferred_element_type=jnp.float32,
)


def _make_split(precision: str):
    """Plane splitter: (hi, lo) bf16 pair for 'high'; a single EXPLICIT
    bf16 term for 'default' (the mode's one MXU pass rounds the f32
    plane to bf16 at the dot anyway, so casting at the split point is
    bit-identical while halving the bytes the demux reshape, the
    Doppler-RHS concat and the plane scratch move); identity 1-tuple
    for 'highest' (exact f32 operands, HIGHEST dot precision)."""
    if precision == "high":
        return _split
    if precision == "highest":
        return lambda x: (x,)
    return lambda x: (x.astype(jnp.bfloat16),)


# ---------------------------------------------------------------------------
# concat-packed front-end dots: the whole range stage and the whole
# Doppler stage run as ONE MXU dot each.
#
# Two packing identities (both applied at trace time; the packed constant
# operands are built on the host for free):
#   contraction concat  dot(cat(A1..An, 1), cat(B1..Bn, 0)) == sum_i Ai@Bi
#   output concat       cat(L1@B, L2@B, axis=0) == cat(L1, L2, axis=0) @ B
#                       cat(A@B1, A@B2, axis=1) == A @ cat(B1, B2, axis=1)
# so the 'high' mode's 3-pass bf16 scheme (hi*hi + hi*lo + lo*hi) carries
# ALL its terms — for BOTH the real and imaginary outputs — in a single
# dot with one f32 accumulation chain per output cell: the Doppler
# stage's 12 bf16 products + 10 (D, TVR)-sized f32 VPU adds per frame
# collapse into one (2D, 6Kc) @ (6Kc, TVR) dot, and the range stage's 6
# products + 4 adds into one (CV, 3*2S) @ (3*2S, 2R) dot.  The only new
# per-frame VPU work is building each stage's concat operand (for
# Doppler: two duplicated hi-part block writes, ~5x cheaper than the
# adds removed; for range: the lhs slot concat).


def _dop_lhs_consts(fr, fi, precision):
    """Row-stacked slot-packed Doppler LHS: ONE (2D, n*Kc) constant whose
    product against :func:`_dop_rhs`'s fixed RHS emits dr as rows [0, D)
    and di as rows [D, 2D).

    'high' slot pairing against RHS [xr_h, xr_l, xr_h, xi_h, xi_l, xi_h]:
    dr needs fr_h@xr_h + fr_h@xr_l + fr_l@xr_h (XLA's 3-pass terms) minus
    the same three for fi@xi, so ldr = [fr_h, fr_h, fr_l, -fi_h, -fi_h,
    -fi_l]; di swaps the operand families.  Single-pass modes pair
    [fr, -fi] / [fi, fr] against RHS [xr, xi] — bf16 for 'default' (the
    kernel's RHS planes are bf16 there, and pre-rounding the constant
    host-side is exactly what the mode's one-pass dot would do)."""
    if precision == "high":
        frh, frl = _split(fr)
        fih, fil = _split(fi)
        ldr = jnp.concatenate([frh, frh, frl, -fih, -fih, -fil], axis=1)
        ldi = jnp.concatenate([fih, fih, fil, frh, frh, frl], axis=1)
    else:
        ldr = jnp.concatenate([fr, -fi], axis=1)
        ldi = jnp.concatenate([fi, fr], axis=1)
    l2 = jnp.concatenate([ldr, ldi], axis=0)
    return l2 if precision == "highest" else l2.astype(jnp.bfloat16)


def _dop_rhs(xr, xi, precision):
    """Per-frame Doppler RHS: the demuxed split planes stacked along the
    contraction (sublane) axis in the slot order `_dop_lhs_consts` packed
    its LHS for."""
    if precision == "high":
        return jnp.concatenate([xr[0], xr[1], xr[0], xi[0], xi[1], xi[0]],
                               axis=0)
    return jnp.concatenate([xr[0], xi[0]], axis=0)


def _range_consts(art, ait, precision):
    """Lane-stacked range DFT constant: ONE operand whose product against
    the (split) raw frame emits zr as columns [0, R) and zi as columns
    [R, 2R).

    'high': (3*2S, 2R) bf16 with contraction slots [a_h, a_h, a_l]
    pairing the kernel's raw slots [raw_h, raw_l, raw_h] (terms rh@ah +
    rl@ah + rh@al — the 3-pass set; the dropped rl@al is the tiny-by-tiny
    term every 3-pass form drops, and the int16 raw's hi/lo split is
    EXACT, so accuracy matches the former per-operand form).
    'default': (2S, 2R) bf16 — the kernel feeds a bf16 raw and one
    explicit bf16 pass IS the mode's semantics.  'highest': (2S, 2R) f32,
    the HIGHEST dot precision does the work.

    A 4-slot variant pairing an int16 AND-split lhs ([raw&0xFF00,
    raw&0x00FF] — both exact in bf16, no f32 materialization) with slots
    [a_h, a_h, a_l, a_l] was built and measured SLOWER end-to-end
    (detect() 4.44 vs 4.27 ms/512 on v5e, same session): the 4th MXU
    pass + the 33%-wider lhs concat cost more than the removed
    cast/split VPU chain, and the 3-slot form of the AND split is
    blocked on accuracy (the dropped rl@al term scales with the
    ABSOLUTE <=255 residual, ~1e-3-class on small ADC values vs RN's
    relative residual).  scripts/i16_split_ab.py keeps the recipe."""
    if precision == "high":
        def pack3(a):
            ah, al = _split(a)
            return jnp.concatenate([ah, ah, al], axis=0)

        return jnp.concatenate([pack3(art), pack3(ait)], axis=1)
    a2 = jnp.concatenate([art, ait], axis=1)
    return a2 if precision == "highest" else a2.astype(jnp.bfloat16)


def _range_lhs(raw_i16, precision, base=None):
    """Per-frame range LHS from the INT16 raw frame, in
    :func:`_range_consts`'s slot order.

    ``base`` (f32 (C*V, 2S), the base frame in the RAW interleave) is
    subtracted BEFORE the slot packing: the windowed range DFT is
    linear, so ``(raw - base_raw) @ A == raw @ A - base_z`` — the former
    z-space subtraction of two (C*V, R) f32 planes per frame becomes one
    (C*V, 2S) subtract riding the existing cast chain (2.5x fewer
    elementwise cells at the default geometry, and the 1 MB br/bi VMEM
    constants shrink to a 0.4 MB raw-layout one).  The difference of two
    int16-valued f32s is exact (<= 17 bits); for 'high' the hi/lo split
    of a 17-bit value rounds the lo term by <= 2^-9 of the residual
    (vs exact at 16 bits) — ~1e-7-class relative on the plane, two
    orders under the mode's ~8e-6 budget.

    'default' feeds bf16(raw) directly — int16->bf16 RN equals
    f32->bf16 RN of the exact f32 cast (int16->f32 is exact), so this
    is bit-identical to the former f32-operand DEFAULT-precision dot at
    half the cast vregs.  'highest' keeps the exact f32 operand."""
    x = raw_i16.astype(jnp.float32)
    if base is not None:
        x = x - base
    if precision == "high":
        rh, rl = _split(x)
        return jnp.concatenate([rh, rl, rh], axis=1)
    if precision == "highest":
        return x
    if base is None:
        return raw_i16.astype(jnp.bfloat16)
    return x.astype(jnp.bfloat16)


# ---------------------------------------------------------------------------
# the kernel


def _range_stage(raw_f, a2, bs_ref, *, split, dprec, cv, s2,
                 r_size, clutter, n_chirps):
    """One frame's clutter-removed, pre-split range planes, all in VMEM,
    via ONE range dot; a2 is the packed host-built constant
    (:func:`_range_consts` — the kernel never splits, negates or
    re-stacks a DFT matrix).  The returned planes are CLUTTER-REMOVED
    (base subtracted or chirp-mean subtracted) and PRE-SPLIT at the
    configured precision (a (hi, lo) bf16 pair for 'high', the plain f32
    plane otherwise) — split is elementwise, so splitting BEFORE the
    demux reshape yields the same Doppler operands while letting the
    detect variant store the parts and gather AoA snapshots from them
    without re-splitting (and, for 'high', halving the bytes the demux
    relayout moves).

    Base clutter removal happens in RAW space, inside
    :func:`_range_lhs`'s cast chain (``bs_ref``: the base frame in the
    raw interleave; the DFT's linearity makes it identical to the former
    z-space plane subtraction at 2.5x fewer elementwise cells).

    Chirp-mean clutter removal runs in zr space — mean over all chirps
    per (v, r) via the (C*V, R) -> (C, V*R) lane-merge reshape — which is
    bit-identical to the former xr-space form (same ascending-chirp
    summation order, same cells) and keeps the demuxed planes clean.
    """
    prec = jax.lax.Precision.HIGHEST if dprec == "highest" else None
    lhs = _range_lhs(raw_f.reshape(cv, s2), dprec,
                     bs_ref[:] if clutter == "base" else None)
    z2c = _DOT(lhs, a2, precision=prec)   # (C*V, 2R): [zr | zi] planes
    zr = z2c[:, :r_size]
    zi = z2c[:, r_size:]
    if clutter == "mean":
        vr = (cv // n_chirps) * r_size
        z2 = zr.reshape(n_chirps, vr)
        zr = (z2 - jnp.mean(z2, axis=0, keepdims=True)).reshape(cv, r_size)
        z2 = zi.reshape(n_chirps, vr)
        zi = (z2 - jnp.mean(z2, axis=0, keepdims=True)).reshape(cv, r_size)
    # else 'none': MTI modes reach the kernel as a host-side fold of the
    # canceller into the Doppler DFT constants (see :func:`_plan`) — the
    # range planes stay raw and every Doppler-domain consumer (power
    # map, AoA snapshot dots) sees the filtered slow time for free.  An
    # in-kernel roll+subtract variant measured +5% (mti2) / +27% (mti3)
    # detect() time on v5e.
    return split(zr), split(zi)


def _doppler_power(zrp, zip_, l2, *, dprec, kc, tvr, d_size, tv, r_size):
    """Demux + Doppler DFT + power integration for one frame's pre-split
    range planes, via ONE Doppler dot against the slot-packed l2
    constant (:func:`_dop_lhs_consts`)."""
    prec = jax.lax.Precision.HIGHEST if dprec == "highest" else None
    xr = tuple(t.reshape(kc, tvr) for t in zrp)   # TDM demux: contiguous
    xi = tuple(t.reshape(kc, tvr) for t in zip_)  # in-VMEM reshape
    rhs = _dop_rhs(xr, xi, dprec)    # slot-stacked along the contraction
    dd = _DOT(l2, rhs, precision=prec)    # (2D, TV*R): [dr; di] planes,
    dr = dd[:d_size]                      # ONE dot, ONE f32 chain/cell
    di = dd[d_size:]
    return (dr * dr + di * di).reshape(d_size, tv, r_size).sum(axis=1)


def _frame_maps(raw_f, a2, l2, bs_ref, *, split,
                dprec, cv, s2, kc, tvr, d_size, tv, r_size, clutter,
                tx, n_chirps):
    """One frame's (zr parts, zi parts, p): :func:`_range_stage` then
    :func:`_doppler_power` — ONE range dot and ONE Doppler dot total."""
    zrp, zip_ = _range_stage(
        raw_f, a2, bs_ref, split=split, dprec=dprec, cv=cv, s2=s2,
        r_size=r_size, clutter=clutter, n_chirps=n_chirps,
    )
    p = _doppler_power(zrp, zip_, l2, dprec=dprec, kc=kc, tvr=tvr,
                       d_size=d_size, tv=tv, r_size=r_size)
    return zrp, zip_, p


def _mega_kernel(
    raw_ref, a2_ref, l2_ref, bs_ref,
    *refs,
    rows, cv, s2, kc, tvr, d_size, tv, r_size, precision,
    clutter, tx, n_chirps, with_cfar, coef, n_band=2,
    cfar_kind="ca",
):
    if with_cfar:
        band = [r[:] for r in refs[:n_band]]
        out_ref, th_ref = refs[n_band:]
        thresh = _make_threshold(cfar_kind, band, coef)
    else:
        (out_ref,) = refs
    split = _make_split(precision)
    a2 = a2_ref[:]
    l2 = l2_ref[:]

    for f in range(rows):
        _, _, p = _frame_maps(
            raw_ref[f], a2, l2, bs_ref,
            split=split, dprec=precision, cv=cv, s2=s2, kc=kc, tvr=tvr,
            d_size=d_size, tv=tv, r_size=r_size,
            clutter=clutter, tx=tx, n_chirps=n_chirps,
        )
        out_ref[f] = p
        if with_cfar:
            th_ref[f] = thresh(p)


def _r_pad(cfg: RadarConfig) -> int:
    """Range axis padded up to whole 128-lane tiles.

    The in-VMEM TDM demux ``(C*V, R) -> (Kc, TX*V*R)`` merges sublanes
    into lanes; Mosaic lowers that shape cast only when the row width is
    a whole number of 128-lane tiles (measured: r_size=64 fails with
    "infer-vector-layout: unsupported shape cast"; every R % 128 == 0
    geometry compiles).  Non-aligned geometries therefore run with the
    range DFT matrices zero-padded to ``_r_pad`` columns — pad cells
    carry exact zeros through clutter removal, Doppler, power and the
    (padded) CFAR band matrices, so they can never become hits — and the
    maps are sliced back to R on output.  This restores the reference's
    any-compile-time-geometry property (acceleration.cu:7-15)."""
    return -(-cfg.range_fft_size // 128) * 128


_VMEM_DEFAULT = 16 << 20


def _vmem_limit() -> int:
    """Scoped-VMEM budget the mega kernels plan against, in bytes.

    Mosaic's default scoped-VMEM ceiling is ~16 MB; the physical VMEM is
    far larger (128 MB on v5e), the rest being XLA's share for the
    non-Pallas program.  The default budget is 32 MB: the round-4
    on-chip sweep (scripts/vmem_sweep.py, v5e) measured the detect
    kernel at 3.31 ms/512 under a 32 MB request vs 3.41 at Mosaic's
    16 MB default — the extra headroom pays for itself at unchanged
    rows=8 tiling — and 32 MB also admits heavier geometries
    (256 samples x 256 chirps needs ~30 MB at rows=1).
    ``RADAR_TPU_VMEM_LIMIT_MB`` overrides: the kernels both PLAN
    against the value (``mega_supported`` gate + ``rows`` tiling) and
    REQUEST it from Mosaic via ``CompilerParams.vmem_limit_bytes``.
    Set it before the first traced call (``rows`` and the compiler
    params bake in at trace time), and only on programs whose XLA tail
    is small enough to live in the remainder.
    """
    return int(os.environ.get("RADAR_TPU_VMEM_LIMIT_MB", "32")) << 20


def _compiler_params():
    """Non-default scoped-VMEM request, or None for Mosaic's default."""
    lim = _vmem_limit()
    if lim == _VMEM_DEFAULT:
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=lim)


def mega_supported(cfg: RadarConfig) -> bool:
    """Whether the mega kernel can run this geometry on TPU.

    With in-kernel range padding (see :func:`_r_pad`) the former
    R % 128 == 0 lane gate is gone; what remains is the scoped-VMEM
    ceiling — the rows=1 working set, charged with the SAME
    transient/per-row split :func:`_rows_for` budgets with (taking the
    larger of the maps and detect variants), must fit the 16 MB budget.
    ``rd_impl='auto'`` falls back to the fused XLA path when this is
    False."""
    need = max(sum(_maps_vmem_parts(cfg)), sum(_detect_vmem_parts(cfg)))
    return need <= _vmem_limit()


def _rows_for(transient: int, per_row: int, b: int) -> int:
    """Largest power-of-two rows (<= 8, <= b) whose working set fits.

    ``transient`` is the ONE-TIME part of the step's VMEM: the per-frame
    intermediates (raw f32 + bf16 splits, demux splits, Doppler planes)
    that Mosaic's liveness reuses across the row loop, so they do not
    scale with rows.  ``per_row`` is what genuinely does: double-buffered
    I/O blocks and any scratch keep-alives.  The round-3 formula charged
    the transients per row, which halved the admitted tiling — rows=8
    (vs 4) measured 3.95 vs 4.25 ms/512 on the default detect kernel
    (rows=16 correctly fails Mosaic's scoped-VMEM check at ~20 MB).
    Power-of-two only: odd tile counts mis-tile power-of-two batches
    (rows=3 pads 512 -> 513 over a 171-step grid, measured 3.11 vs
    2.69 ms/512 at rows=4 on v5e).  The cap is a HARD 8 at any budget:
    the round-4 on-chip sweep (scripts/vmem_sweep.py) measured deeper
    tiling uniformly slower — 3.31 ms/512 at (32 MB, rows=8) vs 3.66
    (32, 16), 3.71 (64, 16), 3.87 (64, 32), 4.09 (100, 32) — a raised
    limit helps as Mosaic scheduling headroom, not as tiling depth.
    Explicit ``rows=`` pins past 8 remain available for experiments.
    """
    lim = _vmem_limit()
    budget = lim - transient
    cap = 8
    rows = max(1, min(int(budget // max(per_row, 1)), cap, b))
    while rows & (rows - 1):
        rows -= 1
    return rows


def _const_vmem_bytes(cfg: RadarConfig, detect: bool) -> int:
    """VMEM-resident constant operands, charged to the transient budget:
    the slot-packed DFT constants (built on the host — the kernel never
    splits or re-stacks them), the f32 base planes (x2: generic headroom
    for the subtraction's transients), and the 3x-tiled bf16 band
    matrices (12 bytes per source element for the doppler/range pair,
    doubled on the range side for GO/SO's four asymmetric half-window
    matrices).  Round 4's review found these uncounted just as the band
    constants grew 1.5x — a borderline geometry the gate admitted could
    die with a raw Mosaic scoped-VMEM error instead of the intended
    fused-path fallback."""
    c, v, s2 = cfg.num_chirps, cfg.num_rx, 2 * cfg.num_samples
    d, r = cfg.doppler_fft_size, _r_pad(cfg)
    kc = cfg.chirps_per_tx
    dft = s2 * r * 12                  # a2: (3*2S, 2R) bf16 slot-packed
    dft += c * v * s2 * 4 * 2          # bs raw-layout base (x2: headroom)
    dft += d * kc * 24                 # l2: (2D, 6Kc) bf16 slot-packed
    if detect:
        dft += d * kc * 8              # frt/fit: (Kc, 2D) bf16 [hi | lo]
    if cfg.cfar_kind in ("goca", "soca"):
        band = 12 * d * d + 24 * r * r
    else:                                                 # ca (and the
        band = 12 * (d * d + r * r)                       # power-only twin)
    return dft + band


def _maps_vmem_parts(cfg: RadarConfig) -> tuple[int, int]:
    """(transient, per_row) bytes for the maps kernel (power+threshold out)."""
    c, v, s2 = cfg.num_chirps, cfg.num_rx, 2 * cfg.num_samples
    d, r = cfg.doppler_fft_size, _r_pad(cfg)
    tvr = cfg.num_tx * v * r
    # c*v*s2: raw f32 (4) + hi/lo regs (4) + range lhs3 concat (6 bf16);
    # c*v*r: [zr|zi] f32 (8) + bf16 splits (8) + the slot-packed Doppler
    # RHS concat buffer (6 bf16 blocks of kc*tvr == c*v*r, = 12)
    transient = ((c * v * s2 * 14) + (c * v * r * 28) + (d * tvr * 16)
                 + _const_vmem_bytes(cfg, detect=False))
    per_row = (c * v * s2 * 4) + (d * r * 16)   # in blocks + out blocks, 2x
    return transient, per_row


def _auto_rows(cfg: RadarConfig, b: int) -> int:
    """Frames per grid step for the maps kernel (power + threshold out)."""
    return _rows_for(*_maps_vmem_parts(cfg), b)


def _mti_matrix(kc: int, order: int):
    """(kc, kc) float64 circulant canceller M with ``y = M @ x`` the
    circular two/three-pulse MTI over a demuxed per-TX chirp axis
    (golden.mti_filter semantics at stride 1): M = I - R (order 2) or
    I - 2R + R^2 (order 3), R the one-step delay."""
    eye = np.eye(kc)
    r1 = np.roll(eye, -1, axis=1)   # r1[c, c-1] = 1
    if order == 2:
        return eye - r1
    return eye - 2.0 * r1 + np.roll(eye, -2, axis=1)


def _plan(shorts, base_cube, cfg, window, clutter="base"):
    """Shared host-side setup: reshaped raw frames + constant operands.
    The range matrices are zero-padded to ``_r_pad(cfg)`` columns so
    non-128-multiple range sizes lower (see :func:`_r_pad`); the base
    stays in the unpadded RAW interleave (it is subtracted before the
    range dot, see :func:`_range_lhs`).

    MTI clutter modes fold the canceller INTO the Doppler DFT matrix:
    ``dr = F diag(w) (M x) = (F diag(w) M) x``, and the per-detection
    AoA snapshots are Doppler-domain values of the same transform, so
    one host-side constant fold filters the power map AND the snapshots
    at ZERO kernel cost (an in-kernel roll+subtract form measured
    +5%/+27% for mti2/mti3 on v5e — Mosaic's tiny-op tax on the extra
    per-frame VPU chain)."""
    from radar_tpu.ops.fuseddft import interleaved_range_matrices

    from radar_tpu.ops.window import resolve_window

    window = resolve_window(window, cfg)
    c, v, s2 = cfg.num_chirps, cfg.num_rx, 2 * cfg.num_samples
    r_true, rp = cfg.range_fft_size, _r_pad(cfg)
    lead = shorts.shape[:-1]
    raw = shorts.reshape((-1, c, v, s2))
    a_re, a_im = interleaved_range_matrices(
        cfg.num_samples, r_true, window
    )
    art = jnp.asarray(a_re.T, jnp.float32)   # (2S, R)
    ait = jnp.asarray(a_im.T, jnp.float32)
    from radar_tpu.ops.dftmat import _dft_factors

    # the fold runs in NUMPY complex128: a jnp matmul here would lower
    # to the TPU's default bf16 dot and silently corrupt the folded
    # constants below the 'high'/'highest' accuracy tiers
    f_dop = np.asarray(_dft_factors(cfg.chirps_per_tx,
                                    cfg.doppler_fft_size, window, True),
                       np.complex128)
    if clutter in ("mti2", "mti3"):
        f_dop = f_dop @ _mti_matrix(cfg.chirps_per_tx, int(clutter[-1]))
    fr = jnp.asarray(f_dop.real, jnp.float32)
    fi = jnp.asarray(f_dop.imag, jnp.float32)
    if base_cube is None:
        bs = jnp.zeros((c * v, s2), jnp.float32)
    else:
        # the base in the RAW interleave: the kernel subtracts it BEFORE
        # the range dot inside _range_lhs's cast chain (one (C*V, 2S)
        # subtract instead of two (C*V, R) plane subtracts per frame,
        # and a 0.4 MB VMEM constant instead of the former 1 MB br/bi
        # pair) — see fuseddft.base_raw_interleave for the algebra
        from radar_tpu.ops.fuseddft import base_raw_interleave

        bs = base_raw_interleave(base_cube, cfg).reshape(c * v, s2)
    if rp != r_true:
        pad = ((0, 0), (0, rp - r_true))
        art, ait = jnp.pad(art, pad), jnp.pad(ait, pad)
    return lead, raw, art, ait, fr, fi, bs


def _padded_band_matrices(cfg, d_size, r_true, rp):
    """CFAR band operands — cancellation-free strip form, stacked for
    the two-dot ``cfar_kernel.band_threshold`` — with the range pair
    embedded in (rp, rp): rows/cols >= R are zero, so pad cells get
    threshold 0 over power 0 — never hits — while real cells see exactly
    the unpadded matrices."""
    import numpy as np

    from radar_tpu.ops.pallas.cfar_kernel import stack_rows, stack_slots

    td, sr, gd, gr = cfar_band_matrices(cfg, d_size, r_true)
    sr2 = (sr, sr - gr)
    if rp != r_true:
        pad = ((0, rp - r_true), (0, rp - r_true))
        sr2 = tuple(np.pad(m, pad) for m in sr2)
    # stacked bf16: small-int values are exact; stage 1 takes both row
    # products in one dot, stage 2 both column products + their sum
    return [stack_rows([td - gd, gd]), stack_slots(list(sr2))]


def _cfar_kind_consts(cfg, d_size, r_true, rp):
    """(band matrix list, coef) for the in-kernel CFAR: 'ca' or
    'goca'/'soca' (see :func:`_make_threshold`).  GO/SO range matrices
    are padded like :func:`_padded_band_matrices` — pad cells get
    lead = lag = 0 over power 0, never hits."""
    import numpy as np

    from radar_tpu.ops.cfar import go_so_band_matrices, go_so_params

    if cfg.cfar_kind == "ca":
        alpha, n_train = cfar_alpha(cfg.cfar_guard, cfg.cfar_train,
                                    cfg.cfar_pfa, cfg.cfar_pulses_effective)
        return (_padded_band_matrices(cfg, d_size, r_true, rp),
                float(alpha / n_train))
    if cfg.cfar_kind not in ("goca", "soca"):
        raise ValueError(
            f"in-kernel CFAR supports ca/goca/soca, not "
            f"{cfg.cfar_kind!r} (OS runs on the power kernel's output)"
        )
    from radar_tpu.ops.pallas.cfar_kernel import stack_rows, stack_slots

    _, t = go_so_params(cfg, cfg.cfar_kind[:2])
    td, gd, al, alg, bl, blg = go_so_band_matrices(cfg, d_size, r_true)
    # cancellation-free strip form (cfar_kernel.band_threshold notes):
    # lead = Td@p@AL - Gd@p@ALg == (Td-Gd)@p@AL + Gd@p@(AL-ALg), lag
    # mirrored; every difference is small non-negative ints (exact bf16).
    # Stage 2 packs lead and lag as the TWO row groups of one (2R, 6R)
    # operand, so both half-window sums come out of a single dot as the
    # (D, 2R) halves of its output.
    rmats = [al, al - alg, bl, bl - blg]
    if rp != r_true:
        rmats = [np.pad(m, ((0, rp - r_true), (0, rp - r_true)))
                 for m in rmats]
    return [stack_rows([td - gd, gd]), stack_slots(rmats, n_rows=2)], t


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "window", "with_cfar", "interpret", "rows"),
)
def _mega_call(
    shorts, base_cube, cfg, window, with_cfar, interpret, rows
):
    if not interpret and not mega_supported(cfg):
        # one gate for every entry point (pipeline, distributed, CLI):
        # raise our error instead of Mosaic's internal scoped-VMEM failure
        raise ValueError(
            f"the mega kernel's single-frame working set exceeds scoped "
            f"VMEM for this geometry "
            f"({cfg.num_chirps}x{cfg.num_samples}x{cfg.num_rx}, "
            f"range_fft={cfg.range_fft_size}); use rd_impl='fused' "
            "(what 'auto' falls back to)"
        )
    clutter = cfg.effective_clutter(base_cube is not None)
    if clutter != "base":
        base_cube = None   # zero base planes; the kernel never reads them
    lead, raw, art, ait, fr, fi, bs = _plan(shorts, base_cube, cfg, window,
                                            clutter)
    if clutter in ("mti2", "mti3"):
        clutter = "none"   # folded into the Doppler constants by _plan
    b = raw.shape[0]
    c, v, s2 = cfg.num_chirps, cfg.num_rx, 2 * cfg.num_samples
    kc, tx = cfg.chirps_per_tx, cfg.num_tx
    d_size, r_true = cfg.doppler_fft_size, cfg.range_fft_size
    r_size = _r_pad(cfg)   # kernel-internal range width (lane-aligned)
    tv = tx * v

    rows = _auto_rows(cfg, b) if rows is None else max(1, min(rows, b))
    b_pad = -(-b // rows) * rows
    if b_pad != b:
        raw = jnp.pad(raw, ((0, b_pad - b),) + ((0, 0),) * 3)

    a2 = _range_consts(art, ait, cfg.dft_precision)
    l2 = _dop_lhs_consts(fr, fi, cfg.dft_precision)
    consts = [a2, l2, bs]
    coef, n_band = 0.0, 0
    if with_cfar:
        band, coef = _cfar_kind_consts(cfg, d_size, r_true, r_size)
        n_band = len(band)
        consts += band

    kern = functools.partial(
        _mega_kernel,
        rows=rows, cv=c * v, s2=s2, kc=kc, tvr=tv * r_size,
        d_size=d_size, tv=tv, r_size=r_size,
        precision=cfg.dft_precision,
        clutter=clutter, tx=tx, n_chirps=c,
        with_cfar=with_cfar, coef=coef, n_band=n_band,
        cfar_kind=cfg.cfar_kind,
    )
    map_sds = jax.ShapeDtypeStruct((b_pad, d_size, r_size), jnp.float32)
    map_spec = pl.BlockSpec((rows, d_size, r_size), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    def const_spec(m):
        nd = m.ndim
        return pl.BlockSpec(m.shape, lambda i, _nd=nd: (0,) * _nd,
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        kern,
        out_shape=(map_sds, map_sds) if with_cfar else map_sds,
        grid=(b_pad // rows,),
        in_specs=[pl.BlockSpec((rows, c, v, s2), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)]
        + [const_spec(m) for m in consts],
        out_specs=(map_spec, map_spec) if with_cfar else map_spec,
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(raw, *consts)
    if with_cfar:
        power, thresh = out
        return (power[:b, :, :r_true].reshape(lead + (d_size, r_true)),
                thresh[:b, :, :r_true].reshape(lead + (d_size, r_true)))
    return out[:b, :, :r_true].reshape(lead + (d_size, r_true))


def power_from_shorts_pallas(
    shorts: jnp.ndarray,
    base_cube: jnp.ndarray | None,
    cfg: RadarConfig = DEFAULT_CONFIG,
    window: bool = True,
    interpret: bool = False,
    rows: int | None = None,
) -> jnp.ndarray:
    """Raw int16 frames -> integrated RD power map, one Pallas kernel.

    Args:
      shorts: int16 (..., shorts_per_frame) in on-disk layout.
      base_cube: complex64 (rx, chirps, samples) empty-scene cube, or None
        for mean-over-chirps clutter removal.

    Returns:
      power float32 (..., doppler_fft, range_fft), Doppler fftshifted —
      same contract as ``integrate_power(fused_rd_planes(...))``.
    """
    return _mega_call(shorts, base_cube, cfg, window, False, interpret, rows)


def power_cfar_from_shorts_pallas(
    shorts: jnp.ndarray,
    base_cube: jnp.ndarray | None,
    cfg: RadarConfig = DEFAULT_CONFIG,
    window: bool = True,
    interpret: bool = False,
    rows: int | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Raw int16 frames -> (power, CA-CFAR threshold), one Pallas kernel.

    The threshold follows ``ops.cfar.ca_cfar_2d`` exactly (Doppler wrap,
    range reflect/wrap, alpha = N * (pfa^{-1/N} - 1)) via the band-matrix
    formulation; hits are ``power > threshold``.
    """
    return _mega_call(shorts, base_cube, cfg, window, True, interpret, rows)


# ---------------------------------------------------------------------------
# the detect variant: selection + interp neighbors + AoA snapshots fused in
# ---------------------------------------------------------------------------
#
# Round 3 measured the detection tail at ~2.2 of 5.0 ms/512 on-chip (top-K
# 0.52, interp gathers 0.39, snapshot recompute ~1.25 incl. a ~0.5-0.9 ms
# XLA relayout of the 105 MB raw operand) and closed two naive fusions as
# negative results: per-frame scalar extraction loops and extra map-sized
# kernel outputs both LOSE (ROADMAP.md round-3 notes).  This variant is the
# prescribed third form:
#
# * selection is the topk_pallas knockout VECTORIZED ACROSS the step's
#   frames on a (rows, D, R) VMEM scratch — no per-frame reduction loops;
# * every per-detection gather is a ONE-HOT MATMUL or lane mask-reduce
#   (static shapes; Mosaic's dynamic-sublane tax, which killed the round-3
#   attempt, is never paid);
# * AoA snapshots are gathered from the clutter-removed range planes that
#   phase A already holds in VMEM, then Doppler-projected with gathered
#   DFT rows — the XLA-side snapshot recompute and its raw-input relayout
#   disappear from the detect path entirely;
# * HBM output is KB-sized detection tensors; the D*R maps are never
#   written.
#
# Bit-compatibility with the shipped maps path: top-K indices/values,
# num_hits, and the five interp neighbor samples are bit-identical (same
# masked map, same knockout order, exact f32 one-hot gathers at HIGHEST
# precision).  Snapshots are numerically equivalent but not bit-identical
# to ``snapshots_from_shorts`` (gathered from the kernel's 3-pass range
# planes instead of re-contracted from raw) — azimuth agrees to ~1e-5 deg.

_F32_MIN = float(jnp.finfo(jnp.float32).min)
_K_LANE = 128  # one-hot gather matmuls run at the full lane width


def _make_threshold(cfar_kind, band, coef):
    """p -> CFAR threshold from VMEM-loaded packed band operands.

    'ca': (Td@p@Sr^T - Gd@p@Gr^T)*alpha/n in the cancellation-free
    strip form — TWO dots (cfar_kernel.band_threshold).  'goca'/'soca':
    the GO/SO half-window sums share the stage-1 row products, and
    stage 2's (2R, 6R) operand emits lead and lag as the two (D, R)
    halves of ONE dot's output — then max/min and the Gandhi-Kassam
    multiplier (ops/cfar.go_so_params).  All products use the
    exact-band split scheme (cfar_kernel.split3: bf16 band operands
    exact, the f32 map split exactly into three bf16 terms, one
    accumulation chain per output) — pure training-ring-magnitude f32
    accumulation error at a fraction of the former HIGHEST form's MXU
    passes and dot dispatches."""
    from radar_tpu.ops.pallas.cfar_kernel import _stage2

    if cfar_kind == "ca":
        tg3, b6 = band   # strip form, _padded_band_matrices
        return lambda p: band_threshold(p, tg3, b6, coef)
    take = jnp.maximum if cfar_kind == "goca" else jnp.minimum
    tg3, b6 = band       # strip form, _cfar_kind_consts (b6 is (2R, 6R))

    def thresh(p):
        d, r = p.shape
        y = band_mm(tg3, split3(p))      # (2D, R): both row products
        ll = _stage2(y, d, b6)           # (D, 2R): lead | lag
        return take(ll[:, :r], ll[:, r:]) * coef

    return thresh


def _mega_detect_kernel(
    raw_ref, a2_ref, l2_ref, frt_ref, fit_ref,
    bs_ref, *rest,
    rows, cv, s2, kc, tvr, d_size, tv, r_size, r_valid, precision,
    clutter, tx, n_chirps, coef, k_det, s_pack, n_band,
    cfar_kind="ca", phases="full",
):
    band = [r[:] for r in rest[:n_band]]
    (idx_ref, val_ref, nbr_ref, nh_ref, sre_ref, sim_ref) = rest[
        n_band : n_band + 6
    ]
    # range-plane scratch holds the PRE-SPLIT parts _frame_maps returns,
    # LANE-PACKED as [hi | lo] for 'high' (same bytes as one f32 plane;
    # B3's doubled one-hot contracts both halves in one dot), the plain
    # f32 plane otherwise
    scr = rest[n_band + 6 :]
    mask_s, p_s, zr_s, zi_s, vals_s, idxs_s = scr
    split = _make_split(precision)
    a2 = a2_ref[:]
    l2 = l2_ref[:]
    thresh = _make_threshold(cfar_kind, band, coef)
    sentinel = jnp.float32(_F32_MIN)
    # top-edge range guard: same cut assemble_result applies on the
    # maps paths (RadarConfig.range_edge_guard — wrapped window
    # sidelobes of strong near-range targets are persistent false
    # alarms there); one static lane-iota compare, hoisted per step
    ok_lane = (jax.lax.broadcasted_iota(jnp.int32, (d_size, r_size), 1)
               < r_valid)

    # -- phase A: per-frame front-end; maps live only in VMEM scratch ----
    # (phases='a0'/'a1'/'a2' stop after the range stage / Doppler+power /
    # threshold+mask store — the perf-decomposition prefixes that locate
    # the front-end's VPU cost; scratch stores are memref side effects,
    # so Mosaic keeps each prefix's real work)
    for f in range(rows):
        zrp, zip_ = _range_stage(
            raw_ref[f], a2, bs_ref,
            split=split, dprec=precision, cv=cv, s2=s2, r_size=r_size,
            clutter=clutter, n_chirps=n_chirps,
        )
        if precision == "high":
            zr_s[f] = jnp.concatenate(zrp, axis=1)    # [hi | lo], aligned
            zi_s[f] = jnp.concatenate(zip_, axis=1)
        else:
            zr_s[f] = zrp[0]
            zi_s[f] = zip_[0]
        if phases == "a0":
            continue
        p = _doppler_power(zrp, zip_, l2, dprec=precision, kc=kc, tvr=tvr,
                           d_size=d_size, tv=tv, r_size=r_size)
        p_s[f] = p
        if phases == "a1":
            continue
        th = thresh(p)
        # sentinel (not -inf) for non-hits: the knockout's -inf then sorts
        # strictly below every untaken cell, reproducing lax.top_k's
        # exhausted-slot order exactly (same trick as topk_pallas).
        # Stored LANE-MAJOR and SUBLANE-PACKED (s_pack chunks of the map
        # per frame, stacked on sublanes): with rows < 8 frames/step the
        # plain (rows, D*R) form leaves 8-rows of every vreg's sublanes
        # empty and the knockout's full-width passes pay double (measured
        # 1.1 vs 0.55 ms/512 at rows=4); packing restores full vregs.
        # The 3D (rows, D, R) two-stage-reduce variant is worse still
        # (2.6x, 1.35 ms).
        mask_s[f * s_pack : (f + 1) * s_pack] = jnp.where(
            (p > th) & ok_lane, p, sentinel
        ).reshape(s_pack, (d_size * r_size) // s_pack)

    if phases in ("a0", "a1", "a2"):
        nh_ref[:] = jnp.zeros((rows, 1, 1), jnp.int32)
        idx_ref[:] = jnp.zeros((rows, 1, k_det), jnp.int32)
        val_ref[:] = jnp.zeros((rows, 1, k_det), jnp.float32)
        nbr_ref[:] = jnp.zeros((rows, k_det, 8), jnp.float32)
        sre_ref[:] = jnp.zeros((rows, tv, k_det), jnp.float32)
        sim_ref[:] = jnp.zeros((rows, tv, k_det), jnp.float32)
        return

    # -- phase B1: top-K knockout, vectorized across the step's frames ---
    # m is (rows*s_pack, n2): frame f's cells [c*n2, (c+1)*n2) live in row
    # f*s_pack + c.  Full-width passes run on fully-packed vregs; the
    # per-frame combines are log2(s_pack) masked sublane-roll butterfly
    # rounds on (rs, 1) vregs — the reshape/broadcast form of the same
    # combine pays Mosaic's full tiny-op relayout tax 16x per step and
    # measured +0.85 ms/512.  Per-iteration output columns accumulate in
    # (rs, K) scratch; frame rows are extracted ONCE after the loop.
    m = mask_s[:]
    n_cells = d_size * r_size
    n2 = n_cells // s_pack
    rs = rows * s_pack
    nh2 = jnp.sum((m != sentinel).astype(jnp.int32), axis=1, keepdims=True)
    nh = jnp.sum(nh2.reshape(rows, s_pack), axis=1, keepdims=True)
    nh_ref[:] = nh[:, :, None]                          # (rows, 1, 1)
    if phases == "a":    # perf decomposition: front-end + CFAR mask only
        idx_ref[:] = jnp.zeros((rows, 1, k_det), jnp.int32)
        val_ref[:] = jnp.zeros((rows, 1, k_det), jnp.float32)
        nbr_ref[:] = jnp.zeros((rows, k_det, 8), jnp.float32)
        sre_ref[:] = jnp.zeros((rows, tv, k_det), jnp.float32)
        sim_ref[:] = jnp.zeros((rows, tv, k_det), jnp.float32)
        return
    chunk = jax.lax.broadcasted_iota(jnp.int32, (rs, n2), 0) % s_pack
    gidx = chunk * n2 + jax.lax.broadcasted_iota(jnp.int32, (rs, n2), 1)
    neg_inf = jnp.float32(-jnp.inf)

    row1 = jax.lax.broadcasted_iota(jnp.int32, (rs, 1), 0)
    shifts = []
    h = 1
    while h < s_pack:
        shifts.append((h, (row1 & h) != 0))
        h *= 2

    def group_combine(x, op):
        # butterfly over each frame's s_pack rows: at round h, row r
        # combines with row r ^ h (never crosses the aligned group).
        # pltpu.roll is a single hardware sublane rotate (jnp.roll's
        # concat-of-slices form measures within noise of it at s_pack=2:
        # B1 3.74 vs 3.79 ms/512; both beat the reshape/broadcast
        # combine's +0.85).
        for hh, mk in shifts:
            x = op(x, jnp.where(mk, pltpu.roll(x, hh, 0),
                                pltpu.roll(x, rs - hh, 0)))
        return x

    for j in range(k_det):
        peak_c = jnp.max(m, axis=1, keepdims=True)      # (rs, 1)
        peak_b = group_combine(peak_c, jnp.maximum)     # frame max, replic.
        cand = jnp.where(m == peak_b, gidx, n_cells)
        idx_c = jnp.min(cand, axis=1, keepdims=True)    # (rs, 1)
        idx_b = group_combine(idx_c, jnp.minimum)       # frame argmin idx
        vals_s[:, j : j + 1] = peak_b
        idxs_s[:, j : j + 1] = idx_b
        m = jnp.where(gidx == idx_b, neg_inf, m)

    idx_all = idxs_s[:].reshape(rows, s_pack, k_det)[:, 0, :]  # (rows, K)
    val_all = vals_s[:].reshape(rows, s_pack, k_det)[:, 0, :]
    idx_ref[:] = idx_all[:, None, :]
    val_ref[:] = val_all[:, None, :]

    if phases == "b1":   # perf decomposition: stop after selection
        nbr_ref[:] = jnp.zeros((rows, k_det, 8), jnp.float32)
        sre_ref[:] = jnp.zeros((rows, tv, k_det), jnp.float32)
        sim_ref[:] = jnp.zeros((rows, tv, k_det), jnp.float32)
        return

    # -- phase B2: interp neighbor samples, vectorized across frames -----
    # p[f, d_k +/- 1, r_k +/- 1] via ONE (3K*rows, D*rows) one-hot matmul
    # against the frame-stacked maps, then lane mask-reduces; HIGHEST f32
    # one-hot products reproduce the map values bit-exactly.
    rk = rows * k_det
    # idx_all has K on LANES; the one-hot build needs a (rk, 1) COLUMN.
    # Mosaic cannot shape-cast lanes into sublanes ((rows, K) -> (rk, 1)
    # fails "unsupported shape cast"), but a sublane-repeat broadcast +
    # lane mask-reduce is the same data movement in supported ops:
    rep = jnp.broadcast_to(
        idx_all[:, None, :], (rows, k_det, k_det)
    ).reshape(rk, k_det)                      # row q = frame q//K's indices
    kk_sel = jax.lax.broadcasted_iota(jnp.int32, (rk, k_det), 0) % k_det
    lane_k = jax.lax.broadcasted_iota(jnp.int32, (rk, k_det), 1)
    idxcol = jnp.sum(
        jnp.where(lane_k == kk_sel, rep, 0), axis=1, keepdims=True
    )                                         # idxcol[f*K+k] = idx_all[f,k]
    db_c = idxcol // r_size
    rb_c = idxcol % r_size
    foff = (
        jax.lax.broadcasted_iota(jnp.int32, (rk, 1), 0) // k_det
    ) * d_size
    col3 = jnp.concatenate(
        [
            db_c + foff,
            ((db_c - 1) % d_size) + foff,
            ((db_c + 1) % d_size) + foff,
        ],
        axis=0,
    )                                                   # (3*rk, 1)
    oh3 = (
        jax.lax.broadcasted_iota(jnp.int32, (3 * rk, rows * d_size), 1)
        == col3
    ).astype(jnp.float32)
    p3 = mm_band(oh3, p_s[:].reshape(rows * d_size, r_size))  # (3*rk, R)
    lane = jax.lax.broadcasted_iota(jnp.int32, (rk, r_size), 1)
    rm_c = rb_c - (rb_c > 0)
    rp_c = rb_c + (rb_c < r_size - 1)
    pc_rows = p3[0:rk]
    pdm_rows = p3[rk : 2 * rk]
    pdp_rows = p3[2 * rk : 3 * rk]

    def lane_pick(rows_v, col):
        return jnp.sum(
            jnp.where(lane == col, rows_v, 0.0), axis=1, keepdims=True
        )

    nbr = jnp.concatenate(
        [
            lane_pick(pc_rows, rb_c),    # center (== top value where valid)
            lane_pick(pc_rows, rm_c),    # range -1 (clamped)
            lane_pick(pc_rows, rp_c),    # range +1 (clamped)
            lane_pick(pdm_rows, rb_c),   # doppler -1 (wrapped)
            lane_pick(pdp_rows, rb_c),   # doppler +1 (wrapped)
            jnp.zeros((rk, 3), jnp.float32),
        ],
        axis=1,
    )
    nbr_ref[:] = nbr.reshape(rows, k_det, 8)

    if phases == "b2":   # perf decomposition: stop after interp gathers
        sre_ref[:] = jnp.zeros((rows, tv, k_det), jnp.float32)
        sim_ref[:] = jnp.zeros((rows, tv, k_det), jnp.float32)
        return

    # -- phase B3: AoA snapshots from the in-VMEM range planes -----------
    # Per frame (each op is a full-width matmul or a medium elementwise —
    # no tiny dynamic extractions): gather the K detected range columns
    # from the clutter-removed (C*V, R) planes with a (R, 128) one-hot,
    # demux to (Kc, TV, 128), and project each detection onto its gathered
    # Doppler DFT row.
    #
    # Gather-dot precision: one-hot matrices are EXACT in bf16, so the
    # 'high' 3-pass form's ah@bl pass multiplies by an exactly-zero
    # residual — the 2-pass hi/lo form is BIT-IDENTICAL to it and 1/3
    # cheaper.  Both 2-pass families run as ONE dot each: the plane
    # gathers consume phase A's LANE-PACKED [hi | lo] scratch against a
    # doubled (2R, 128) one-hot (rows r and R+r both one — the dot's f32
    # accumulator adds hi[r] + lo[r], bitwise the two-dot-plus-add form),
    # and the DFT-row gathers consume the host-packed (Kc, 2D) frt/fit
    # constants against a doubled (2D, 128) one-hot — no per-frame
    # splits, half the dot dispatches.  'highest' keeps exact-f32
    # gathers; 'default' keeps its single bf16 pass for the plane
    # gathers and the 2-pass form for the DFT rows (unit-magnitude trig
    # values whose bf16 rounding would dominate the mode's error budget).
    if precision == "highest":
        def g_dot(z_f, oh_b):
            return _DOT(z_f, oh_b.astype(jnp.float32),
                        precision=jax.lax.Precision.HIGHEST)

        def f_dot(x, oh2_b):
            return _DOT(x, oh2_b.astype(jnp.float32),
                        precision=jax.lax.Precision.HIGHEST)
    elif precision == "high":
        def g_dot(z_f, oh_b):
            return _DOT(z_f, oh_b)

        def f_dot(x, oh2_b):
            return _DOT(x, oh2_b)
    else:
        # 'default': the stored planes are already bf16 — a bf16 dot
        # against the bf16 one-hot gathers them EXACTLY (what the f32
        # form's single bf16 pass produced on the fly)
        def g_dot(z_f, oh_b):
            return _DOT(z_f, oh_b)

        def f_dot(x, oh2_b):
            return _DOT(x, oh2_b)

    frt = frt_ref[:]                    # (Kc, 2D) packed / (Kc, D) f32
    fit = fit_ref[:]
    pad = jnp.full((1, _K_LANE - k_det), -1, jnp.int32)
    r_rows = 2 * r_size if precision == "high" else r_size
    iota_r = jax.lax.broadcasted_iota(
        jnp.int32, (r_rows, _K_LANE), 0) % r_size
    d_rows = d_size if precision == "highest" else 2 * d_size
    iota_d = jax.lax.broadcasted_iota(
        jnp.int32, (d_rows, _K_LANE), 0) % d_size
    for f in range(rows):
        top_row = idx_ref[f]                            # (1, K)
        r_col = jnp.concatenate([top_row % r_size, pad], axis=1)
        oh_r = (iota_r == r_col).astype(jnp.bfloat16)
        oh_d = (iota_d == jnp.concatenate(
            [top_row // r_size, pad], axis=1
        )).astype(jnp.bfloat16)
        g_re = g_dot(zr_s[f], oh_r)                     # (C*V, 128)
        g_im = g_dot(zi_s[f], oh_r)
        fsel_re = f_dot(frt, oh_d)                      # (Kc, 128)
        fsel_im = f_dot(fit, oh_d)
        g3r = g_re.reshape(kc, tv, _K_LANE)
        g3i = g_im.reshape(kc, tv, _K_LANE)
        sre = jnp.sum(
            fsel_re[:, None, :] * g3r - fsel_im[:, None, :] * g3i, axis=0
        )                                               # (TV, 128)
        sim = jnp.sum(
            fsel_re[:, None, :] * g3i + fsel_im[:, None, :] * g3r, axis=0
        )
        sre_ref[f] = sre[:, :k_det]
        sim_ref[f] = sim[:, :k_det]


def _detect_vmem_parts(cfg: RadarConfig) -> tuple[int, int]:
    """(transient, per_row) bytes for the detect variant, whose per-row
    state is the scratch keep-alives that survive the whole step: the
    clutter-removed range planes (rows, C*V, R) x2 and the power +
    masked maps (rows, D, R); outputs are K-sized (negligible)."""
    c, v, s2 = cfg.num_chirps, cfg.num_rx, 2 * cfg.num_samples
    d, r = cfg.doppler_fft_size, _r_pad(cfg)
    tvr = cfg.num_tx * v * r
    # c*v*s2: raw f32 (4) + hi/lo regs (4) + range lhs3 concat (6 bf16);
    # c*v*r: [zr|zi] f32 (8; the split parts live in per-row scratch) +
    # the slot-packed Doppler RHS concat buffer (12)
    transient = ((c * v * s2 * 14) + (c * v * r * 20) + (d * tvr * 16)
                 + _const_vmem_bytes(cfg, detect=True))
    per_row = (c * v * s2 * 4) + (c * v * r * 8) + (d * r * 12)
    return transient, per_row


def _auto_rows_detect(cfg: RadarConfig, b: int) -> int:
    """:func:`_auto_rows` for the detect variant."""
    return _rows_for(*_detect_vmem_parts(cfg), b)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "window", "k_det", "interpret", "rows",
                     "phases"),
)
def _mega_detect_call(shorts, base_cube, cfg, window, k_det, interpret, rows,
                      phases="full"):
    if not interpret and not mega_supported(cfg):
        raise ValueError(
            f"the mega kernel's single-frame working set exceeds scoped "
            f"VMEM for this geometry "
            f"({cfg.num_chirps}x{cfg.num_samples}x{cfg.num_rx}, "
            f"range_fft={cfg.range_fft_size}); use rd_impl='fused' "
            "(what 'auto' falls back to)"
        )
    if k_det > _K_LANE:
        raise ValueError(
            f"mega detect kernel supports max_detections <= {_K_LANE} "
            f"(got {k_det}); use rd_impl='mega-maps'"
        )
    clutter = cfg.effective_clutter(base_cube is not None)
    if clutter != "base":
        base_cube = None   # zero base planes; the kernel never reads them
    lead, raw, art, ait, fr, fi, bs = _plan(shorts, base_cube, cfg, window,
                                            clutter)
    if clutter in ("mti2", "mti3"):
        clutter = "none"   # folded into the Doppler constants by _plan
    b = raw.shape[0]
    c, v, s2 = cfg.num_chirps, cfg.num_rx, 2 * cfg.num_samples
    kc, tx = cfg.chirps_per_tx, cfg.num_tx
    d_size, r_true = cfg.doppler_fft_size, cfg.range_fft_size
    r_size = _r_pad(cfg)   # kernel-internal range width (lane-aligned)
    tv = tx * v

    rows = _auto_rows_detect(cfg, b) if rows is None else max(1, min(rows, b))
    b_pad = -(-b // rows) * rows
    if b_pad != b:
        raw = jnp.pad(raw, ((0, b_pad - b),) + ((0, 0),) * 3)

    # sublane packing for the knockout: chunks of the masked map per
    # frame, stacked on sublanes so rows*s_pack fills the 8-sublane f32
    # vreg; each chunk's row width must stay whole 128-lane tiles
    s_pack = max(1, 8 // rows)
    while s_pack > 1 and (
        d_size % s_pack or ((d_size // s_pack) * r_size) % 128
    ):
        s_pack //= 2

    band, coef = _cfar_kind_consts(cfg, d_size, r_true, r_size)
    a2 = _range_consts(art, ait, cfg.dft_precision)
    l2 = _dop_lhs_consts(fr, fi, cfg.dft_precision)
    if cfg.dft_precision == "highest":
        frt, fit = fr.T, fi.T
    else:
        # host-packed [hi | lo] (Kc, 2D) bf16: B3's DFT-row gathers run
        # as one dot against a doubled one-hot, no per-frame splits
        frt = jnp.concatenate(_split(fr.T), axis=1)
        fit = jnp.concatenate(_split(fi.T), axis=1)
    consts = [a2, l2, frt, fit, bs] + band

    kern = functools.partial(
        _mega_detect_kernel,
        rows=rows, cv=c * v, s2=s2, kc=kc, tvr=tv * r_size,
        d_size=d_size, tv=tv, r_size=r_size,
        r_valid=r_true - cfg.range_edge_guard_effective,
        precision=cfg.dft_precision,
        clutter=clutter, tx=tx, n_chirps=c,
        coef=coef, k_det=k_det, s_pack=s_pack, n_band=len(band),
        cfar_kind=cfg.cfar_kind, phases=phases,
    )

    def const_spec(m):
        nd = m.ndim
        return pl.BlockSpec(m.shape, lambda i, _nd=nd: (0,) * _nd,
                            memory_space=pltpu.VMEM)

    def out_spec(*shape):
        return pl.BlockSpec((rows,) + shape, lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    idx, val, nbr, nh, sre, sim = pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct((b_pad, 1, k_det), jnp.int32),
            jax.ShapeDtypeStruct((b_pad, 1, k_det), jnp.float32),
            jax.ShapeDtypeStruct((b_pad, k_det, 8), jnp.float32),
            jax.ShapeDtypeStruct((b_pad, 1, 1), jnp.int32),
            jax.ShapeDtypeStruct((b_pad, tv, k_det), jnp.float32),
            jax.ShapeDtypeStruct((b_pad, tv, k_det), jnp.float32),
        ),
        grid=(b_pad // rows,),
        in_specs=[pl.BlockSpec((rows, c, v, s2), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)]
        + [const_spec(m) for m in consts],
        out_specs=(
            out_spec(1, k_det), out_spec(1, k_det), out_spec(k_det, 8),
            out_spec(1, 1), out_spec(tv, k_det), out_spec(tv, k_det),
        ),
        scratch_shapes=[
            pltpu.VMEM(                                        # masked map,
                (rows * s_pack, (d_size * r_size) // s_pack),  # sublane-
                jnp.float32,                                   # packed 2D
            ),
            pltpu.VMEM((rows, d_size, r_size), jnp.float32),   # power
        ] + [
            # zr/zi parts (pre-split; see _frame_maps): one LANE-PACKED
            # [hi | lo] bf16 plane per component for 'high' (same total
            # bytes as one f32 plane), one bf16 plane for 'default'
            # (the mode's planes are bf16 everywhere), one f32 plane for
            # 'highest'
            pltpu.VMEM(
                (rows, c * v,
                 2 * r_size if cfg.dft_precision == "high" else r_size),
                jnp.float32 if cfg.dft_precision == "highest"
                else jnp.bfloat16,
            )
            for _ in range(2)
        ] + [
            pltpu.VMEM((rows * s_pack, k_det), jnp.float32),   # val columns
            pltpu.VMEM((rows * s_pack, k_det), jnp.int32),     # idx columns
        ],
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(raw, *consts)

    top_idx = idx[:b, 0].reshape(lead + (k_det,))
    if r_size != r_true:
        # re-encode the kernel's padded flat index onto the true R grid.
        # Valid detections always have r < R (pad cells can't be hits);
        # exhausted (-inf) slots may point at pad cells — clamp their
        # range bin so downstream physics stays in range (they carry
        # valid=False either way).
        d_b = top_idx // r_size
        r_b = jnp.minimum(top_idx % r_size, r_true - 1)
        top_idx = d_b * r_true + r_b
    top_val = val[:b, 0].reshape(lead + (k_det,))
    top_val = jnp.where(top_val == jnp.float32(_F32_MIN), -jnp.inf, top_val)
    nbr5 = nbr[:b, :, :5].reshape(lead + (k_det, 5))
    num_hits = nh[:b, 0, 0].reshape(lead)
    snaps = jax.lax.complex(sre[:b], sim[:b])            # (b, TV, K)
    snaps = jnp.swapaxes(snaps, -1, -2).reshape(lead + (k_det, tv))
    return top_idx, top_val, nbr5, num_hits, snaps


def detections_from_shorts_pallas(
    shorts: jnp.ndarray,
    base_cube: jnp.ndarray | None,
    k_det: int,
    cfg: RadarConfig = DEFAULT_CONFIG,
    window: bool = True,
    interpret: bool = False,
    rows: int | None = None,
):
    """Raw int16 frames -> compact detection tensors, ONE Pallas kernel.

    The full shorts -> range DFT -> Doppler DFT -> power -> CA-CFAR ->
    top-K -> interp-neighbor -> AoA-snapshot prefix; only KB-sized
    per-detection tensors reach HBM (the D*R maps never do).

    Returns:
      top_idx  int32   (..., K) flat D*R cell index (lax.top_k order,
        ascending untaken indices in exhausted slots);
      top_val  float32 (..., K) detection power, -inf in exhausted slots;
      nbr      float32 (..., K, 5) power at [center, range-1, range+1,
        doppler-1, doppler+1] (range clamped, Doppler wrapped — the exact
        samples ``interp_cell_physics`` gathers);
      num_hits int32   (...,) CFAR hit count;
      snaps    complex64 (..., K, TX*V) virtual-RX snapshots (numerically
        equivalent to :func:`snapshots_from_shorts`, pre-MIMO-compensation).

    Reference contrast: the whole per-frame detection of the reference —
    kernel chain + full-spectrum D2H + host scan (acceleration.cu:435-523)
    — is one kernel invocation whose result transfer is ~200 bytes/frame.
    """
    return _mega_detect_call(
        shorts, base_cube, cfg, window, k_det, interpret, rows
    )


# ---------------------------------------------------------------------------
# detection-tail snapshots without materialized RD planes


def snapshots_from_shorts(
    shorts: jnp.ndarray,
    base_cube: jnp.ndarray | None,
    top_idx: jnp.ndarray,
    cfg: RadarConfig = DEFAULT_CONFIG,
    window: bool = True,
) -> jnp.ndarray:
    """Per-detection virtual-RX snapshots recomputed from the raw frames.

    snap[b, k, t*V + v] = sum_kc F_dop[d_k, kc] * rng[b, kc, t, v, r_k]
    where rng is the clutter-removed range plane — i.e. the (d_k, r_k)
    cell of the RD planes, computed without materializing them.  Per
    frame this is K gathered DFT rows, one small matmul and an
    elementwise Doppler reduction (~2 MFLOP).

    Layout note: XLA's TPU dot wants the 105 MB raw operand in a
    transposed layout while the mega kernel's custom call pins it
    row-major, so layout assignment materializes a relayout copy of the
    input whichever way the contraction is phrased (profiler: ~0.5-0.9
    ms/512 of copies; both einsum orientations measure the same).  This
    form at least keeps the Doppler stage off the MXU — contracting Kc
    into only TX*V outputs would pad 8-32x — as an elementwise
    multiply+reduce.

    Args:
      shorts: int16 (..., shorts_per_frame).
      top_idx: int32 (..., K) flat D*R cell index.

    Returns:
      complex64 (..., K, TX*V), ordering identical to gathering from
      ``fused_rd_planes`` output.
    """
    from radar_tpu.ops.fuseddft import (
        _base_range_planes,
        interleaved_range_matrices,
    )

    c, v, s2 = cfg.num_chirps, cfg.num_rx, 2 * cfg.num_samples
    kc, tx = cfg.chirps_per_tx, cfg.num_tx
    r_size = cfg.range_fft_size
    lead = shorts.shape[:-1]
    raw = shorts.reshape((-1, c * v, s2)).astype(jnp.float32)
    from radar_tpu.ops.window import resolve_window

    window = resolve_window(window, cfg)
    k_det = top_idx.shape[-1]
    top_idx = top_idx.reshape((-1, k_det))
    b = raw.shape[0]
    prec = resolve_precision(cfg.dft_precision)

    d_bin = (top_idx // r_size).astype(jnp.int32)
    r_bin = (top_idx % r_size).astype(jnp.int32)

    a_re, a_im = interleaved_range_matrices(cfg.num_samples, r_size, window)
    a_sel_re = jnp.take(jnp.asarray(a_re, jnp.float32), r_bin, axis=0)
    a_sel_im = jnp.take(jnp.asarray(a_im, jnp.float32), r_bin, axis=0)
    # rng[b, k, c*v] at the detected range bins  (contract over 2S)
    ein_r = functools.partial(jnp.einsum, "bkj,bmj->bkm", precision=prec)
    g_re = ein_r(a_sel_re, raw)
    g_im = ein_r(a_sel_im, raw)

    clutter = cfg.effective_clutter(base_cube is not None)
    if clutter == "mean":
        gm_re = g_re.reshape(b, k_det, c, v)
        gm_im = g_im.reshape(b, k_det, c, v)
        g_re = (gm_re - jnp.mean(gm_re, axis=2, keepdims=True)).reshape(
            b, k_det, c * v
        )
        g_im = (gm_im - jnp.mean(gm_im, axis=2, keepdims=True)).reshape(
            b, k_det, c * v
        )
    elif clutter != "base":  # mti2/mti3: gathering at a range bin
        # commutes with the chirp-axis filter, so filter the gathered
        # (b, K, C, v) slices directly (golden.mti_filter semantics)
        from radar_tpu.ops.preproc import mti_clutter_removal

        order = int(clutter[-1])
        gm_re = g_re.reshape(b, k_det, c, v)
        gm_im = g_im.reshape(b, k_det, c, v)
        g_re = mti_clutter_removal(gm_re, order, axis=2, stride=tx).reshape(
            b, k_det, c * v
        )
        g_im = mti_clutter_removal(gm_im, order, axis=2, stride=tx).reshape(
            b, k_det, c * v
        )
    else:
        b_re, b_im = _base_range_planes(base_cube, cfg, window)  # (C, V, R)
        idx = r_bin[:, None, :]  # (B, 1, K)
        bs_re = jnp.take_along_axis(
            b_re.reshape(1, c * v, r_size), idx, axis=-1
        )  # (B, C*V, K)
        bs_im = jnp.take_along_axis(
            b_im.reshape(1, c * v, r_size), idx, axis=-1
        )
        g_re = g_re - jnp.swapaxes(bs_re, -1, -2)
        g_im = g_im - jnp.swapaxes(bs_im, -1, -2)

    # TDM demux (chirp = kc*TX + tx), then the per-detection Doppler DFT
    # row as an elementwise multiply + chirp reduction (contraction length
    # Kc with only TX*V outputs — MXU would pad it 8-32x)
    g_re = g_re.reshape(b, k_det, kc, tx * v)
    g_im = g_im.reshape(b, k_det, kc, tx * v)
    f_dop = dft_matrix(kc, cfg.doppler_fft_size, window, shift=True)
    fr = jnp.take(jnp.asarray(f_dop.real, jnp.float32), d_bin, axis=0)
    fr = fr[..., None]  # (B, K, Kc, 1)
    fi = jnp.take(jnp.asarray(f_dop.imag, jnp.float32), d_bin, axis=0)
    fi = fi[..., None]
    sr = jnp.sum(fr * g_re - fi * g_im, axis=-2)
    si = jnp.sum(fr * g_im + fi * g_re, axis=-2)
    return jax.lax.complex(sr, si).reshape(lead + (k_det, tx * v))
