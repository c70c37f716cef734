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
and accumulate hi*hi + hi*lo + lo*hi in f32 (~1.4e-5 relative on the
default geometry, same class as the XLA fused path).  The CFAR band
matmuls run at HIGHEST (true f32) precision instead: (total - inner)
cancels, so bf16 passes would leave ~5e-4 relative threshold error near
strong peaks, while exact f32 multiplies keep it at accumulation-order
noise (~1e-7) for negligible MXU cost.

Reference contrast: the reference materializes every intermediate and
crosses the PCIe boundary per frame (acceleration.cu:435-519); here the
two largest intermediates of the whole pipeline stop existing.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from radar_tpu.config import RadarConfig, DEFAULT_CONFIG
from radar_tpu.ops.cfar import cfar_alpha, cfar_band_matrices
from radar_tpu.ops.dftmat import dft_matrix, resolve_precision
from radar_tpu.ops.pallas.cfar_kernel import band_threshold


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


def _make_dot(precision: str):
    """(lhs, rhs) -> f32 matmul at the configured MXU precision.

    Operands arrive pre-split as (hi, lo) pairs for 'high' so the bf16
    decomposition of a reused operand is computed once, not per product.
    """
    if precision == "high":
        def dot3(a, b):
            (ah, al), (bh, bl) = a, b
            return _DOT(ah, bh) + _DOT(ah, bl) + _DOT(al, bh)

        return dot3, _split
    prec = jax.lax.Precision.HIGHEST if precision == "highest" else None

    def dot1(a, b):
        return _DOT(a[0], b[0], precision=prec)

    return dot1, (lambda x: (x,))


# ---------------------------------------------------------------------------
# the kernel


def _frame_maps(raw_f, art, ait, fr, fi, br_ref, bi_ref, *, dot, split,
                cv, s2, kc, tvr, d_size, tv, r_size, mean_clutter, tx):
    """One frame's (dr, di, p) from its raw int16 block, all in VMEM;
    art/ait/fr/fi arrive pre-split at the configured precision.
    """
    raw = split(raw_f.reshape(cv, s2).astype(jnp.float32))
    zr = dot(raw, art)            # (C*V, R) range planes
    zi = dot(raw, ait)
    if not mean_clutter:
        zr = zr - br_ref[:]
        zi = zi - bi_ref[:]
    xr = zr.reshape(kc, tvr)      # TDM demux: contiguous reshape
    xi = zi.reshape(kc, tvr)
    if mean_clutter:
        # chirp-mean clutter removal == subtracting the mean over ALL
        # chirps (Kc x TX) per (v, r) cell, matching fuseddft.py
        mr = jnp.mean(xr.reshape(kc * tx, tvr // tx), axis=0)
        mi = jnp.mean(xi.reshape(kc * tx, tvr // tx), axis=0)
        xr = xr - jnp.tile(mr, tx)[None, :]
        xi = xi - jnp.tile(mi, tx)[None, :]
    xr = split(xr)
    xi = split(xi)
    dr = dot(fr, xr) - dot(fi, xi)   # (D, TV*R) Doppler planes
    di = dot(fr, xi) + dot(fi, xr)
    p = (dr * dr + di * di).reshape(d_size, tv, r_size).sum(axis=1)
    return dr, di, p


def _mega_kernel(
    raw_ref, art_ref, ait_ref, fr_ref, fi_ref, br_ref, bi_ref,
    *refs,
    rows, cv, s2, kc, tvr, d_size, tv, r_size, precision,
    mean_clutter, tx, with_cfar, coef,
):
    if with_cfar:
        td_ref, sr_ref, gd_ref, gr_ref, out_ref, th_ref = refs
        td = td_ref[:]
        sr = sr_ref[:]
        gd = gd_ref[:]
        gr = gr_ref[:]
    else:
        (out_ref,) = refs
    dot, split = _make_dot(precision)
    art = split(art_ref[:])
    ait = split(ait_ref[:])
    fr = split(fr_ref[:])
    fi = split(fi_ref[:])

    for f in range(rows):
        _, _, p = _frame_maps(
            raw_ref[f], art, ait, fr, fi, br_ref, bi_ref, dot=dot,
            split=split, cv=cv, s2=s2, kc=kc, tvr=tvr, d_size=d_size,
            tv=tv, r_size=r_size, mean_clutter=mean_clutter, tx=tx,
        )
        out_ref[f] = p
        if with_cfar:
            th_ref[f] = band_threshold(p, td, sr, gd, gr, coef)


def mega_supported(cfg: RadarConfig) -> bool:
    """Whether Mosaic can lower the mega kernel for this geometry.

    The in-VMEM TDM demux ``(C*V, R) -> (Kc, TX*V*R)`` merges sublanes
    into lanes; Mosaic lowers that shape cast only when the row width is
    a whole number of 128-lane tiles (measured: s64/r_size=64 fails with
    "infer-vector-layout: unsupported shape cast"; every R % 128 == 0
    geometry compiles).  ``rd_impl='auto'`` falls back to the fused XLA
    path when this is False; interpret mode (CPU tests) is unaffected.
    """
    return cfg.range_fft_size % 128 == 0


def _auto_rows(cfg: RadarConfig, b: int) -> int:
    """Frames per grid step, sized so the per-step working set (raw block,
    range/Doppler planes and their bf16 splits, double-buffered I/O)
    stays under the 16 MB scoped-VMEM limit for any geometry.  The
    estimate is deliberately pessimistic (Mosaic's liveness reuses most
    intermediates), so the budget is most of the limit.  Rounded DOWN to
    a power of two: odd tile counts mis-tile power-of-two batches
    (rows=3 pads 512 -> 513 over a 171-step grid, measured 3.11 vs
    2.69 ms/512 at rows=4 on v5e)."""
    c, v, s2 = cfg.num_chirps, cfg.num_rx, 2 * cfg.num_samples
    d, r = cfg.doppler_fft_size, cfg.range_fft_size
    per_frame = (c * v * s2 * 6) + (c * v * r * 16) + (d * v * cfg.num_tx * r * 16)
    rows = max(1, min(int((14 << 20) // max(per_frame, 1)), 8, b))
    while rows & (rows - 1):
        rows -= 1
    return rows


def _plan(shorts, base_cube, cfg, window):
    """Shared host-side setup: reshaped raw frames + constant operands."""
    from radar_tpu.ops.fuseddft import (
        _base_range_planes,
        interleaved_range_matrices,
    )

    c, v, s2 = cfg.num_chirps, cfg.num_rx, 2 * cfg.num_samples
    lead = shorts.shape[:-1]
    raw = shorts.reshape((-1, c, v, s2))
    a_re, a_im = interleaved_range_matrices(
        cfg.num_samples, cfg.range_fft_size, window
    )
    art = jnp.asarray(a_re.T, jnp.float32)   # (2S, R)
    ait = jnp.asarray(a_im.T, jnp.float32)
    f_dop = dft_matrix(cfg.chirps_per_tx, cfg.doppler_fft_size, window,
                       shift=True)
    fr = jnp.asarray(f_dop.real, jnp.float32)
    fi = jnp.asarray(f_dop.imag, jnp.float32)
    if base_cube is None:
        br = bi = jnp.zeros((c * v, cfg.range_fft_size), jnp.float32)
    else:
        b_re, b_im = _base_range_planes(base_cube, cfg, window)
        br = b_re.reshape(c * v, cfg.range_fft_size)
        bi = b_im.reshape(c * v, cfg.range_fft_size)
    return lead, raw, art, ait, fr, fi, br, bi


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "window", "with_cfar", "interpret", "rows"),
)
def _mega_call(
    shorts, base_cube, cfg, window, with_cfar, interpret, rows
):
    if not interpret and not mega_supported(cfg):
        # one gate for every entry point (pipeline, distributed, CLI):
        # raise our error instead of Mosaic's internal shape-cast failure
        raise ValueError(
            f"the mega kernel needs range_fft_size % 128 == 0 on TPU "
            f"(Mosaic cannot lower the in-VMEM TDM demux reshape for "
            f"{cfg.range_fft_size}-lane rows); use rd_impl='fused' "
            "(what 'auto' falls back to)"
        )
    lead, raw, art, ait, fr, fi, br, bi = _plan(shorts, base_cube, cfg, window)
    b = raw.shape[0]
    c, v, s2 = cfg.num_chirps, cfg.num_rx, 2 * cfg.num_samples
    kc, tx = cfg.chirps_per_tx, cfg.num_tx
    d_size, r_size = cfg.doppler_fft_size, cfg.range_fft_size
    tv = tx * v

    rows = _auto_rows(cfg, b) if rows is None else max(1, min(rows, b))
    b_pad = -(-b // rows) * rows
    if b_pad != b:
        raw = jnp.pad(raw, ((0, b_pad - b),) + ((0, 0),) * 3)

    consts = [art, ait, fr, fi, br, bi]
    coef = 0.0
    if with_cfar:
        alpha, n_train = cfar_alpha(cfg.cfar_guard, cfg.cfar_train,
                                    cfg.cfar_pfa)
        coef = float(alpha / n_train)
        consts += [jnp.asarray(m) for m in
                   cfar_band_matrices(cfg, d_size, r_size)]

    kern = functools.partial(
        _mega_kernel,
        rows=rows, cv=c * v, s2=s2, kc=kc, tvr=tv * r_size,
        d_size=d_size, tv=tv, r_size=r_size,
        precision=cfg.dft_precision,
        mean_clutter=base_cube is None, tx=tx,
        with_cfar=with_cfar, coef=coef,
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
        interpret=interpret,
    )(raw, *consts)
    if with_cfar:
        power, thresh = out
        return (power[:b].reshape(lead + (d_size, r_size)),
                thresh[:b].reshape(lead + (d_size, r_size)))
    return out[:b].reshape(lead + (d_size, r_size))


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

    if base_cube is None:
        gm_re = g_re.reshape(b, k_det, c, v)
        gm_im = g_im.reshape(b, k_det, c, v)
        g_re = (gm_re - jnp.mean(gm_re, axis=2, keepdims=True)).reshape(
            b, k_det, c * v
        )
        g_im = (gm_im - jnp.mean(gm_im, axis=2, keepdims=True)).reshape(
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
