"""Pallas fused magnitude + scan-window argmax.

The detect stage of the parity pipeline: given the 16,384-point range
spectrum, find the first index of the max |X| over the first ``scan_bins``
bins.  The reference ships the whole spectrum over PCIe and scans it on the
host (acceleration.cu:518-522); the XLA version is an argmax HLO.  This
kernel fuses |X|^2 + window masking + argmax in one VMEM pass over the
split real/imag planes (Pallas has no complex dtype), so the power array
never materializes in HBM and only two scalars per frame leave the chip.

Rows are processed 8 at a time (one f32 sublane tile).

Backend note: the axon remote-TPU transport cannot move complex64 across
the host<->device boundary (H2D or D2H) — verified fine when the spectrum
is produced on device (int16 capture -> decode -> FFT -> this kernel, all
in one jit).  Keep complex values device-resident on that transport.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from radar_tpu.config import RadarConfig, DEFAULT_CONFIG

_ROWS = 8  # f32 sublane tile


def _kernel(re_ref, im_ref, idx_ref, mag_ref, *, scan_bins, n):
    re = re_ref[:]
    im = im_ref[:]
    power = re * re + im * im
    lane = jax.lax.broadcasted_iota(jnp.int32, power.shape, 1)
    masked = jnp.where(lane < scan_bins, power, -1.0)
    # Mosaic has no argmax reduce: take the max, then the lowest lane index
    # equal to it (FindAbsMax's strict-> first-index tie-break,
    # cudaBenchMarking.cpp:199).
    peak = jnp.max(masked, axis=-1, keepdims=True)
    cand = jnp.where(masked == peak, lane, n)
    idx_ref[:] = jnp.min(cand, axis=-1, keepdims=True)
    mag_ref[:] = jnp.sqrt(peak)


@functools.partial(jax.jit, static_argnames=("cfg", "interpret"))
def masked_argmax_pallas(
    spectrum: jnp.ndarray,
    cfg: RadarConfig = DEFAULT_CONFIG,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(peak_bin int32, magnitude f32) over the scan window.

    Args:
      spectrum: complex64 (..., fft_size).
    """
    lead = spectrum.shape[:-1]
    n = spectrum.shape[-1]
    x = spectrum.reshape((-1, n))
    b = x.shape[0]
    b_pad = -(-b // _ROWS) * _ROWS
    re = jnp.zeros((b_pad, n), jnp.float32).at[:b].set(jnp.real(x))
    im = jnp.zeros((b_pad, n), jnp.float32).at[:b].set(jnp.imag(x))

    kernel = functools.partial(_kernel, scan_bins=cfg.scan_bins, n=n)
    grid = (b_pad // _ROWS,)
    idx, mag = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((b_pad, 1), jnp.int32),
            jax.ShapeDtypeStruct((b_pad, 1), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((_ROWS, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_ROWS, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((_ROWS, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_ROWS, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(re, im)
    return (
        idx[:b, 0].reshape(lead),
        mag[:b, 0].reshape(lead),
    )
