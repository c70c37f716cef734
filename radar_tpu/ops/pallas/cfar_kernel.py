"""Pallas CA-CFAR threshold kernel (band-matrix MXU formulation).

Contract identical to ``radar_tpu.ops.cfar.ca_cfar_2d`` (and the golden
NumPy version): 2D cell-averaging, Doppler axis wrap-around, range axis
reflect (default, ``cfg.cfar_range_mode``) or wrap, threshold
``alpha * (ring mean)``.

A wrap/reflect box sum along one axis is a linear map with a constant
banded 0/1/2 matrix (``ops.cfar.cfar_band_matrices``), so each map's
threshold is four MXU matmuls::

    threshold = (Td @ p @ Sr^T  -  Gd @ p @ Gr^T) * alpha / n

run with the exact-band split scheme (see ``split3`` below): the band
matrices are exact in bf16 and the f32 map splits exactly into three
bf16 terms, so each product costs THREE bf16 MXU passes with pure
f32-accumulation-order error — the same class as a true-f32 (HIGHEST)
product at half its MXU cost.  The total-inner cancellation amplifies
any operand-representation error near strong peaks (a single bf16 pass
would leave ~5e-4 relative there; the exact scheme, like HIGHEST,
measures up to ~3e-4 relative vs reduce_window, hit decisions
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

# HIGHEST-precision band matmul: kept for the mega kernel's one-hot
# gather dots (ops/pallas/megakernel.py phase B2), where the result must
# reproduce map values BIT-exactly.  The THRESHOLD products below use the
# cheaper exact-band split scheme instead.
mm_band = functools.partial(
    jax.lax.dot_general,
    dimension_numbers=(((1,), (0,)), ((), ())),
    preferred_element_type=jnp.float32,
    precision=jax.lax.Precision.HIGHEST,
)

# Threshold products: the band matrices are 0/1/2-valued — EXACT in
# bfloat16 — and an f32 value splits EXACTLY into three bf16 terms
# (round-to-nearest: the residual after each cast spans <= 8 mantissa
# bits, so h1 + h2 + h3 == p bit-for-bit).  band @ p therefore equals
# [band band band] @ [h1; h2; h3] with NO representation error — ONE
# bf16 dot whose K=3D contraction accumulates every term in a single
# f32 chain (summing three separate products instead pays two extra
# output-magnitude roundings, which the total-inner cancellation
# amplified past the 1e-3 gate on razor-edge cells) — i.e. the same
# f32-accumulation-order class as a true-f32 (HIGHEST) product at
# THREE bf16 MXU passes instead of HIGHEST's six.  (Same trick as the
# detect kernel's bf16-exact one-hot gather dots, applied to the other
# exactly-representable operand family.)  Band constants arrive
# pre-tiled 3x along the contraction axis (``tile3``).
_BDOT = functools.partial(
    jax.lax.dot_general,
    dimension_numbers=(((1,), (0,)), ((), ())),
    preferred_element_type=jnp.float32,
)
_BDOT_R = functools.partial(
    jax.lax.dot_general,
    dimension_numbers=(((1,), (1,)), ((), ())),
    preferred_element_type=jnp.float32,
)


def tile3(m):
    """Band matrix -> bf16 constant tiled 3x along the contraction
    (minor) axis, the operand format ``band_mm`` consumes."""
    import numpy as np

    return jnp.asarray(np.tile(np.asarray(m), (1, 3)), jnp.bfloat16)


def split3(p):
    """f32 -> three bf16 terms with h1 + h2 + h3 == p exactly.

    h1 = RN_bf16(p) leaves a residual spanning <= 16 mantissa bits
    (exact in f32 by Sterbenz), h2 takes its top 8, and the final
    residual spans <= 8 bits — exactly representable in bf16.

    Domain: finite f32 below bf16 max (~3.39e38) — above it h1
    overflows to inf and the residual goes NaN.  RD power maps (sums of
    squares of int16-derived values, <= ~1e21) are far inside this."""
    h1 = p.astype(jnp.bfloat16)
    r1 = p - h1.astype(jnp.float32)
    h2 = r1.astype(jnp.bfloat16)
    r2 = r1 - h2.astype(jnp.float32)
    return h1, h2, r2.astype(jnp.bfloat16)


def band_mm(band3, parts):
    """band @ p as ONE bf16 dot: band3 (N, 3N) pre-tiled, p pre-split3."""
    return _BDOT(band3, jnp.concatenate(parts, axis=0))




def stack_rows(mats):
    """Stage-1 LHS: band matrices tile3'd and stacked on ROWS — one
    (n*D, 3D) bf16 operand so ``tg3 @ cat(split3(p))`` computes every
    row-product in ONE dot (output rows [i*D, (i+1)*D) = mats[i] @ p)."""
    return jnp.concatenate([tile3(m) for m in mats], axis=0)


def stack_slots(mats, n_rows=1):
    """Stage-2 RHS: band matrices tile3'd and packed for
    :func:`_stage2` — ``n_rows`` output groups stacked on ROWS, each a
    slot-concat along LANES pairing :func:`_stage2`'s fixed M layout.
    mats is row-major: [out0_slot0, out0_slot1, ..., out1_slot0, ...]."""
    per = len(mats) // n_rows
    groups = [
        jnp.concatenate([tile3(m) for m in mats[i * per : (i + 1) * per]],
                        axis=1)
        for i in range(n_rows)
    ]
    return jnp.concatenate(groups, axis=0)


def _stage2(y, d, b6):
    """sum_i Y_i @ B_i^T for the (2D, R) stacked stage-1 output ``y``:
    split3 once, lay the six parts out along LANES in the slot order
    ``stack_slots`` packed ``b6`` for, and contract in ONE dot.  With
    ``b6`` of (n*R, 6R) the output is (D, n*R) — n independent band
    combinations (e.g. GO/SO's lead and lag) from the same product."""
    yh, ym, yl = split3(y)
    m = jnp.concatenate(
        [yh[:d], ym[:d], yl[:d], yh[d:], ym[d:], yl[d:]], axis=1
    )                                                   # (D, 6R)
    return _BDOT_R(m, b6)


def band_threshold(p, tg3, b6, coef):
    """One map's CA-CFAR threshold from its packed bf16 band operands
    (VMEM values), in the CANCELLATION-FREE strip form — TWO dots total.

    The classic (Td @ p @ Sr^T - Gd @ p @ Gr^T) rounds both box sums at
    cell-under-test magnitude before they cancel — near a ~1e12 peak
    that amplifies f32 accumulation error to the 1e-3 gate.  The ring
    partitions exactly into two disjoint strip pairs instead::

        ring = (Td - Gd) @ p @ Sr^T  +  Gd @ p @ (Sr - Gr)^T

    (algebraically identical — expand and the cross terms cancel — and
    both difference matrices are small non-negative ints, the wider
    window's multiplicities dominating the narrower's, so still exact
    in bf16).  The cell under test and its guard box never enter any
    partial sum, so every accumulation stays at training-ring magnitude.

    Both stages run as single dots over stacked operands (the same
    contraction-concat identity as the split-scheme itself):
    ``tg3 = stack_rows([Td-Gd, Gd])`` computes both row-products at
    once, and ``b6 = stack_slots([Sr, Sr-Gr])`` contracts both column
    products AND their sum in one K=6R dot — one f32 accumulation chain
    end-to-end, half the dot dispatches of the pairwise form."""
    d = p.shape[0]
    y = _BDOT(tg3, jnp.concatenate(split3(p), axis=0))  # (2D, R)
    return _stage2(y, d, b6) * coef


def _cfar_kernel(p_ref, tg3_ref, b6_ref, th_ref, *, rows, coef):
    tg3 = tg3_ref[:]
    b6 = b6_ref[:]
    for f in range(rows):
        th_ref[f] = band_threshold(p_ref[f], tg3, b6, coef)


@functools.partial(jax.jit, static_argnames=("cfg", "interpret", "maps_per_step"))
def ca_cfar_2d_pallas(
    power: jnp.ndarray,
    cfg: RadarConfig = DEFAULT_CONFIG,
    interpret: bool = False,
    maps_per_step: int = 8,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """CA-CFAR via the band-matrix Pallas kernel.

    power: f32 (..., D, R), finite and below bf16 max (~3.39e38) — the
    split-scheme products overflow past that (see ``split3``); RD power
    maps are orders of magnitude inside the bound."""
    alpha, n_train = cfar_alpha(cfg.cfar_guard, cfg.cfar_train,
                                cfg.cfar_pfa, cfg.cfar_pulses_effective)

    lead = power.shape[:-2]
    d, r = power.shape[-2], power.shape[-1]
    x = power.reshape((-1, d, r)).astype(jnp.float32)
    b = x.shape[0]
    # bf16 band constants in the cancellation-free strip form (see
    # band_threshold), tiled 3x along the contraction axis and stacked
    # so both stages run as ONE dot each (stack_rows/stack_slots notes)
    td, sr, gd, gr = cfar_band_matrices(cfg, d, r)
    consts = [stack_rows([td - gd, gd]), stack_slots([sr, sr - gr])]

    # working set per step: rows maps in + rows out + strip-sum
    # temporaries
    # + the stacked band operands ((2D,3D) + (R,6R) bf16).
    # 64 KB/map at the default geometry, but at D=R=1024 the band
    # matrices alone are 24 MB — shrink rows first, then fail with a
    # pointer at the XLA path instead of a raw Mosaic scoped-VMEM error.
    rows = max(1, min(maps_per_step, b))
    band_bytes = 12 * (d * d + r * r)
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
