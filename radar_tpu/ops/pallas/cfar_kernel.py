"""Pallas CA-CFAR threshold kernel.

Contract identical to ``radar_tpu.ops.cfar.ca_cfar_2d`` (and the golden
NumPy version): 2D cell-averaging, Doppler axis wrap-around, range axis
reflect (default, ``cfg.cfar_range_mode``) or wrap, threshold
``alpha * (ring mean)``.  Range reflection is handled OUTSIDE the kernel:
the map is reflect-padded by the window half-width at XLA level, the
circular kernel runs on the padded width (its wrap artifacts land only in
the padding), and the valid centers are sliced back out.

Kernel design (one range-Doppler map per grid step, resident in VMEM):

* The (2w+1)^2 training window sum is computed **separably** — a row box
  sum (2*wr+1 circular shifts along the lane axis) followed by a column box
  sum (2*wd+1 shifts along sublanes) — ~34 VPU shift+adds on a 128x128 f32
  block instead of the 273-tap naive window XLA's reduce_window evaluates.
* Circular ``pltpu.roll`` implements the wrap padding for free: no pad
  materialization, no HBM round trips between the two box passes.

The XLA version remains as the portable/verification path; this kernel is
the TPU production path for the CFAR stage (north-star: "CA-CFAR detector
becomes a Pallas sliding-window kernel").
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from radar_tpu.config import RadarConfig, DEFAULT_CONFIG
from radar_tpu.ops.cfar import cfar_alpha


def _box_sum(x: jnp.ndarray, half: int, axis: int) -> jnp.ndarray:
    """Circular box sum of width 2*half+1 along ``axis`` (VMEM-resident)."""
    acc = x
    for s in range(1, half + 1):
        acc = acc + pltpu.roll(x, s, axis=axis) + pltpu.roll(x, -s % x.shape[axis], axis=axis)
    return acc


def _cfar_kernel(power_ref, thresh_ref, *, wd, wr, gd, gr, alpha, inv_n):
    # block is (rows, D, R): several maps per grid step amortize step
    # overhead; rolls act on the last two (map) axes only
    p = power_ref[:]
    total = _box_sum(_box_sum(p, wr, axis=2), wd, axis=1)
    inner = _box_sum(_box_sum(p, gr, axis=2), gd, axis=1)
    thresh_ref[:] = (total - inner) * (alpha * inv_n)


@functools.partial(jax.jit, static_argnames=("cfg", "interpret", "maps_per_step"))
def ca_cfar_2d_pallas(
    power: jnp.ndarray,
    cfg: RadarConfig = DEFAULT_CONFIG,
    interpret: bool = False,
    maps_per_step: int = 8,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """CA-CFAR via the Pallas kernel.  power: float32 (..., D, R)."""
    gd, gr = cfg.cfar_guard
    td, tr = cfg.cfar_train
    wd, wr = gd + td, gr + tr
    alpha, n_train = cfar_alpha(cfg.cfar_guard, cfg.cfar_train, cfg.cfar_pfa)

    lead = power.shape[:-2]
    d, r_out = power.shape[-2], power.shape[-1]
    x = power.reshape((-1, d, r_out)).astype(jnp.float32)
    if cfg.cfar_range_mode == "reflect":
        # window centers in [0, r_out) never see the circular wrap once the
        # range axis carries wr cells of reflection on each side
        x = jnp.pad(x, ((0, 0), (0, 0), (wr, wr)), mode="reflect")
    r = x.shape[-1]
    b = x.shape[0]
    # VMEM budget: Mosaic's scheduled box-sum roll temporaries cost ~32
    # live copies of one map row (measured: 8 maps/step of 128x128 f32 sat
    # exactly at the 16 MB scoped-vmem limit; 128x148 reflect-padded maps
    # at 8/step exceeded it by 3 MB).  Cap rows so 32 copies fit in 16 MB.
    vmem_cap = max(1, (16 << 20) // (32 * d * r * 4))
    rows = max(1, min(maps_per_step, b, vmem_cap))
    b_pad = -(-b // rows) * rows
    if b_pad != b:
        x = jnp.pad(x, ((0, b_pad - b), (0, 0), (0, 0)))

    kernel = functools.partial(
        _cfar_kernel,
        wd=wd, wr=wr, gd=gd, gr=gr,
        alpha=float(alpha), inv_n=float(1.0 / n_train),
    )
    thresh = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b_pad, d, r), jnp.float32),
        grid=(b_pad // rows,),
        in_specs=[
            pl.BlockSpec(
                (rows, d, r), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            )
        ],
        out_specs=pl.BlockSpec(
            (rows, d, r), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(x)
    if cfg.cfar_range_mode == "reflect":
        thresh = thresh[..., wr : wr + r_out]
    thresh = thresh[:b].reshape(lead + (d, r_out))
    return power > thresh, thresh
