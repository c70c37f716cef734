"""Pallas fused decode + window + range-DFT kernel.

The north-star's "Pallas fused window+FFT path for small radix sizes",
kernel form: one VMEM pass per frame performs

    int16 interleaved shorts -> f32 -> windowed range DFT (MXU dot with
    the interleave-aware matrices of ops/fuseddft.py) -> base-frame
    subtraction

so the raw frame is read from HBM exactly once as int16 and only the
(C*V, R) range planes are written back.  The Doppler stage runs as the
same XLA contraction the fused-XLA path uses
(``fuseddft.doppler_from_range_planes``).

Contract identical to the XLA fused path (``rd_impl="fused"``); this
kernel backs ``rd_impl="fused-pallas"``.  On v5e the XLA path compiles to
essentially the same fusion, so the two measure within noise of each
other — the kernel exists as the explicit, schedule-controlled form (and
as the hedge if an XLA version regresses the automatic fusion).

Grid: one step per frame.  Block shapes: raw (C*V, 2S) int16 in VMEM
(~200 KB at default geometry), DFT factor matrices (2S, R) and the
transformed base (C*V, R) resident un-gridded, outputs (C*V, R) f32 x2.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from radar_tpu.config import RadarConfig, DEFAULT_CONFIG
from radar_tpu.ops.fuseddft import (
    base_raw_interleave,
    doppler_from_range_planes,
    interleaved_range_matrices,
)


@functools.partial(
    jax.jit, static_argnames=("cfg", "window", "interpret")
)
def fused_rd_planes_pallas(
    shorts: jnp.ndarray,
    base_cube: jnp.ndarray | None,
    cfg: RadarConfig = DEFAULT_CONFIG,
    window: bool = True,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Same contract as ``fuseddft.fused_rd_planes``; Pallas range stage.

    Args:
      shorts: int16 (B, shorts_per_frame).
      base_cube: complex64 (rx, chirps, samples) or None (mean-over-chirps
        clutter removal, applied to the transformed planes).
    """
    c, v, s2 = cfg.num_chirps, cfg.num_rx, 2 * cfg.num_samples
    r = cfg.range_fft_size
    lead = shorts.shape[:-1]  # arbitrary lead dims, flattened for the grid
    rows = c * v
    raw = shorts.reshape((-1, rows, s2))
    b = raw.shape[0]

    from radar_tpu.ops.window import resolve_window

    window = resolve_window(window, cfg)
    a_re, a_im = interleaved_range_matrices(cfg.num_samples, r, window)
    a_re_t, a_im_t = a_re.T, a_im.T  # (2S, R) for the row-major dot
    clutter = cfg.effective_clutter(base_cube is not None)
    if clutter != "base":
        base_cube = None   # the kernel subtracts a zero base
    if base_cube is not None:
        # raw-space base subtraction before the dot (exact; the shared
        # convention — see fuseddft.base_raw_interleave)
        bs = base_raw_interleave(base_cube, cfg).reshape(rows, s2)
    else:
        bs = jnp.zeros((rows, s2), jnp.float32)

    def full(shape):
        return pl.BlockSpec(shape, lambda i: (0, 0), memory_space=pltpu.VMEM)

    per_frame = pl.BlockSpec(
        (1, rows, s2), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec(
        (1, rows, r), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )

    from radar_tpu.ops.dftmat import resolve_precision

    prec = resolve_precision(cfg.dft_precision)
    if prec == jax.lax.Precision.HIGH:
        # Mosaic's dot rejects HIGH ("Unsupported dot precision"); use the
        # strictly-more-accurate exact-f32 passes instead
        prec = jax.lax.Precision.HIGHEST

    def kernel(raw_ref, a_re_ref, a_im_ref, bs_ref,
               out_re_ref, out_im_ref):
        x = raw_ref[0].astype(jnp.float32) - bs_ref[:]  # (C*V, 2S)
        out_re_ref[0] = jnp.dot(x, a_re_ref[:],
                                preferred_element_type=jnp.float32,
                                precision=prec)
        out_im_ref[0] = jnp.dot(x, a_im_ref[:],
                                preferred_element_type=jnp.float32,
                                precision=prec)

    rng_re, rng_im = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((b, rows, r), jnp.float32),
            jax.ShapeDtypeStruct((b, rows, r), jnp.float32),
        ),
        grid=(b,),
        in_specs=[
            per_frame,
            full((s2, r)),
            full((s2, r)),
            full((rows, s2)),
        ],
        out_specs=(out_spec, out_spec),
        interpret=interpret,
    )(raw, a_re_t, a_im_t, bs)

    rng_re = rng_re.reshape(lead + (c, v, r))
    rng_im = rng_im.reshape(lead + (c, v, r))
    if clutter != "base":  # 'base' was subtracted inside the kernel
        from radar_tpu.ops.preproc import declutter_planes

        rng_re, rng_im = declutter_planes(rng_re, rng_im, clutter,
                                          axis=-3, stride=cfg.num_tx)
    return doppler_from_range_planes(rng_re, rng_im, cfg, window)
