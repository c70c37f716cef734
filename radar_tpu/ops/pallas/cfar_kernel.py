"""Pallas CA-CFAR threshold kernel (band-matrix MXU formulation).

Contract identical to ``radar_tpu.ops.cfar.ca_cfar_2d`` (and the golden
NumPy version): 2D cell-averaging, Doppler axis wrap-around, range axis
reflect (default, ``cfg.cfar_range_mode``) or wrap, threshold
``alpha * (ring mean)``.

A wrap/reflect box sum along one axis is a linear map with a constant
banded 0/1/2 matrix (``ops.cfar.cfar_band_matrices``), so each map's
threshold is four MXU matmuls::

    threshold = (Td @ p @ Sr^T  -  Gd @ p @ Gr^T) * alpha / n

run at HIGHEST (true f32) precision — the total-inner cancellation would
amplify bf16-pass rounding to ~5e-4 near strong peaks, while exact f32
multiplies keep it at f32 accumulation-order error (measured on v5e: up
to ~3e-4 relative vs reduce_window near strong peaks, hit decisions
identical; the test gate is 1e-3).  This replaced a
separable ``pltpu.roll`` shift-add kernel that was VPU-bound (2.28 ms vs
1.48 ms for XLA's ``reduce_window`` on a 512x128x128 batch on v5e; the
matmul form runs the same batch in ~0.5 ms) and needed a hand-calibrated
VMEM cap.  The same formulation runs fused inside the mega kernel
(``ops/pallas/megakernel.py``); this standalone kernel serves the
non-mega pipelines and ``cfar_impl="pallas"``.

North-star bullet covered: "CA-CFAR detector becomes a Pallas kernel" —
as MXU matmuls, which is what the hardware actually wants.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from radar_tpu.config import RadarConfig, DEFAULT_CONFIG
from radar_tpu.ops.cfar import cfar_alpha, cfar_band_matrices

# The canonical band matmul pair, shared with the mega kernel
# (ops/pallas/megakernel.py): run at HIGHEST (true f32) precision — the
# box sums cancel in (total - inner), so bf16-split passes would leave
# ~5e-4 relative threshold error near strong peaks, while exact f32
# multiplies keep it at f32 accumulation-order error (observed up to
# ~3e-4 relative near strong peaks on v5e; hit decisions identical, test
# gate 1e-3) for negligible MXU cost (four small products per map).
mm_band = functools.partial(
    jax.lax.dot_general,
    dimension_numbers=(((1,), (0,)), ((), ())),
    preferred_element_type=jnp.float32,
    precision=jax.lax.Precision.HIGHEST,
)
mm_band_r = functools.partial(
    jax.lax.dot_general,
    dimension_numbers=(((1,), (1,)), ((), ())),
    preferred_element_type=jnp.float32,
    precision=jax.lax.Precision.HIGHEST,
)


def band_threshold(p, td, sr, gd, gr, coef):
    """One map's CA-CFAR threshold from its band matrices (VMEM values)."""
    tot = mm_band_r(mm_band(td, p), sr)
    inn = mm_band_r(mm_band(gd, p), gr)
    return (tot - inn) * coef


def _cfar_kernel(p_ref, td_ref, sr_ref, gd_ref, gr_ref, th_ref, *,
                 rows, coef):
    td = td_ref[:]
    sr = sr_ref[:]
    gd = gd_ref[:]
    gr = gr_ref[:]
    for f in range(rows):
        th_ref[f] = band_threshold(p_ref[f], td, sr, gd, gr, coef)


@functools.partial(jax.jit, static_argnames=("cfg", "interpret", "maps_per_step"))
def ca_cfar_2d_pallas(
    power: jnp.ndarray,
    cfg: RadarConfig = DEFAULT_CONFIG,
    interpret: bool = False,
    maps_per_step: int = 8,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """CA-CFAR via the band-matrix Pallas kernel.  power: f32 (..., D, R)."""
    alpha, n_train = cfar_alpha(cfg.cfar_guard, cfg.cfar_train, cfg.cfar_pfa)

    lead = power.shape[:-2]
    d, r = power.shape[-2], power.shape[-1]
    x = power.reshape((-1, d, r)).astype(jnp.float32)
    b = x.shape[0]
    consts = [jnp.asarray(m) for m in cfar_band_matrices(cfg, d, r)]

    # working set per step: rows maps in + rows out + tot/inn temporaries
    # + the four band matrices (two (D,D) + two (R,R) f32).  64 KB/map at
    # the default geometry, but at D=R=1024 the band matrices alone are
    # 16 MB — shrink rows first, then fail with a pointer at the XLA path
    # instead of a raw Mosaic scoped-VMEM error.
    rows = max(1, min(maps_per_step, b))
    band_bytes = 8 * (d * d + r * r)
    budget = 13 << 20
    while rows > 1 and rows * d * r * 12 + band_bytes > budget:
        rows //= 2
    if d * r * 12 + band_bytes > budget:
        raise ValueError(
            f"CA-CFAR band matrices for a {d}x{r} map ({band_bytes >> 20} "
            "MB) exceed the ~16 MB scoped-VMEM budget even at one map per "
            "step; use cfar_impl='xla' (reduce_window) for this geometry"
        )
    b_pad = -(-b // rows) * rows
    if b_pad != b:
        x = jnp.pad(x, ((0, b_pad - b), (0, 0), (0, 0)))

    kernel = functools.partial(
        _cfar_kernel, rows=rows, coef=float(alpha / n_train)
    )
    thresh = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b_pad, d, r), jnp.float32),
        grid=(b_pad // rows,),
        in_specs=[
            pl.BlockSpec((rows, d, r), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + [
            pl.BlockSpec(m.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
            for m in consts
        ],
        out_specs=pl.BlockSpec(
            (rows, d, r), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(x, *consts)
    thresh = thresh[:b].reshape(lead + (d, r))
    return power > thresh, thresh
