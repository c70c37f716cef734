"""Clutter removal + zero-padding (TPU path).

The reference fuses base-frame subtraction with tail zero-fill in
``cudaDataExtension_kernel`` (acceleration.cu:152-166).  Here it is one
fused XLA elementwise+pad; the kernel's off-by-one bug (element at
``idx == oldSize`` neither zeroed nor subtracted, strict ``>`` at
acceleration.cu:156) is NOT reproduced — the CPU path
(cudaBenchMarking.cpp:277-285) is the contract.
"""

from __future__ import annotations

import jax.numpy as jnp

from radar_tpu.config import RadarConfig, DEFAULT_CONFIG


def clutter_subtract_pad(
    rx0: jnp.ndarray,
    base_rx0: jnp.ndarray,
    cfg: RadarConfig = DEFAULT_CONFIG,
) -> jnp.ndarray:
    """(frame - base) zero-padded to the FFT size.

    Args:
      rx0: complex64 (..., rx_samples).
      base_rx0: complex64 (rx_samples,) — broadcast over the batch.

    Returns:
      complex64 (..., fft_size).
    """
    diff = rx0 - base_rx0
    pad = [(0, 0)] * (diff.ndim - 1) + [(0, cfg.fft_size - cfg.rx_samples)]
    return jnp.pad(diff, pad)


def mean_clutter_removal(cube: jnp.ndarray) -> jnp.ndarray:
    """Alternative clutter removal for the range-Doppler path: subtract the
    per-(rx, sample) mean over chirps (removes zero-Doppler returns without
    needing an empty-scene base frame)."""
    return cube - jnp.mean(cube, axis=-2, keepdims=True)
