"""Keystone transform: exact range-migration compensation on raw data.

Within one CPI a mover's beat frequency drifts — the dechirped phase is

    phi(n, m) = (4*pi/c) * (f_c + S*t_n) * (R0 + v*t_m)        (up to
                the constant 2*f_c*R0/c the generator also drops)

so the range peak walks ``v * CPI / r_res`` cells across the chirps and
the Doppler FFT smears it over both axes once that exceeds one cell.
The map-level ``--walk`` alignment (rd_pipeline.detect_integrated)
shifts whole maps BETWEEN frames; the keystone transform removes the
coupling exactly WITHIN the CPI, for every velocity at once, by
rescaling slow time per fast-time sample:

    t' = t * (f_c + S*t_n) / f_c        <=>   evaluate s at  t = alpha_n * t',
    alpha_n = f_c / (f_c + S*t_n)

after which phi = (4*pi/c) * (S*t_n*R0 + f_c*v*t') — range and Doppler
separate cleanly.  The resampling is the standard DFT-based form (exact
for band-limited slow-time content): per fast-time sample n, the
slow-time spectrum is re-evaluated at scaled positions with one
(D, D) matrix — a batched MXU matmul over the sample axis, not a
gather/interpolation loop.

TDM-MIMO: each virtual channel's stream samples absolute slow time at
``(m*num_tx + tx) * Tc``, so the scaled evaluation point in STREAM
coordinates is ``alpha_n*m + (alpha_n - 1)*tx/num_tx`` — the per-TX
fractional offset is folded into the per-TX matrix stack.

Caveats (standard for keystone): the signed-frequency mapping assumes
the true Doppler is UNAMBIGUOUS — aliased velocities are rescaled by the
wrong factor and stay smeared (ambiguity-number hypotheses would extend
it); slow-time content is treated as periodic, so off-grid Doppler
tones pick up spectral-leakage-level interpolation error.

Reference contrast: the reference has no motion compensation at all —
one range FFT per frame (acceleration.cu:522); migration within its
8.2 ms CPI is sub-cell at its geometry, which is exactly why this ships
as an opt-in for long-CPI / fine-range-resolution configs.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from radar_tpu.config import RadarConfig, DEFAULT_CONFIG


def keystone_matrices(cfg: RadarConfig) -> np.ndarray:
    """(num_tx, num_samples, D, D) complex64 resampling stack, host-side.

    ``K[tx, n] @ FFT(s)`` evaluates the slow-time inverse DFT of one
    stream at the keystone-scaled positions for fast-time sample n.
    """
    d = cfg.num_chirps // cfg.num_tx
    t_n = np.arange(cfg.num_samples, dtype=np.float64) / cfg.sample_rate_hz
    alpha = cfg.carrier_hz / (cfg.carrier_hz + cfg.slope_hz_per_s * t_n)
    k = np.arange(d)
    k_signed = np.where(k < (d + 1) // 2, k, k - d).astype(np.float64)
    m = np.arange(d, dtype=np.float64)
    out = np.empty((cfg.num_tx, cfg.num_samples, d, d), np.complex64)
    for tx in range(cfg.num_tx):
        # stream-coordinate evaluation points: alpha*m + (alpha-1)*tx/ntx
        pos = (alpha[:, None] * m[None, :]
               + (alpha - 1.0)[:, None] * (tx / cfg.num_tx))  # (N, D)
        out[tx] = (np.exp(2j * np.pi / d
                          * pos[:, :, None] * k_signed[None, None, :])
                   / d)
    return out


@functools.partial(jax.jit, static_argnames=("cfg",))
def keystone_cube(
    cube: jnp.ndarray, cfg: RadarConfig = DEFAULT_CONFIG
) -> jnp.ndarray:
    """Apply the keystone transform to a VIRTUALIZED radar cube.

    Args:
      cube: complex64 (..., V, D, N) — virtual channels, chirps-per-TX,
        fast-time samples (``virtualize_cube`` layout; with num_tx == 1
        this is the decoded (..., rx, chirps, samples) cube directly).

    Returns:
      same shape/dtype, slow time rescaled so range-Doppler coupling
      vanishes for unambiguous velocities (see module docstring).
    """
    if cube.shape[-3] != cfg.num_virtual_rx:
        raise ValueError(
            f"keystone_cube wants a virtualized cube with "
            f"{cfg.num_virtual_rx} channels, got {cube.shape[-3]} "
            "(run virtualize_cube first)"
        )
    kmat = jnp.asarray(keystone_matrices(cfg))  # (T, N, D, D)
    lead = cube.shape[:-3]
    d, n = cube.shape[-2], cube.shape[-1]
    x = cube.reshape((-1, cfg.num_tx, cfg.num_rx, d, n))
    spec = jnp.fft.fft(x, axis=-2)  # per-stream slow-time spectrum
    # per fast-time sample n: one (D, D) matmul per TX group — a batched
    # MXU contraction (XLA lowers the complex dot to 4 real ones)
    out = jnp.einsum("tnmk,btrkn->btrmn", kmat, spec,
                     precision=jax.lax.Precision.HIGHEST)
    return out.reshape(lead + (cfg.num_virtual_rx, d, n)).astype(cube.dtype)
