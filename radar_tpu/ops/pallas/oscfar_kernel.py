"""Pallas OS-CFAR threshold kernel: exact rank selection without a sort.

Contract identical to ``radar_tpu.ops.cfar.os_cfar_2d`` and the float64
golden (``radar_tpu.golden.os_cfar_2d``): threshold = alpha_os * (k-th
smallest training-ring cell), Doppler axis wraps, range axis reflect or
wrap per ``cfg.cfar_range_mode``, ring decimated by ``cfg.cfar_os_stride``
in the same deterministic (dd, dr) order as both twins.

Why a kernel: the XLA formulation materializes a ~248-deep training-ring
tensor in HBM and SORTS it per cell — measured 118 fps full-pipeline at
stride 1 (the exact mode) vs the 1,000 fps north star, and batched
reformulations exhaust HBM.  The k-th order statistic needs *selection*,
not a sort, and selection is a counting problem:

* For non-negative IEEE-754 floats (power maps are sums of squares), the
  float ordering equals the ordering of their raw bits as int32.  The
  k-th smallest value is therefore the smallest bit pattern ``t`` with
  ``count(ring <= t) >= k`` — found EXACTLY by a 31-step binary search
  over the bit space, where each step is one vectorized
  compare-and-count over the ring axis.
* The ring tensor for one Doppler tile lives entirely in VMEM
  (``(n_ring, d_tile, R)`` f32, ~4 MB at defaults), built once per tile
  with static-offset slices of the padded map; the 31 counting passes
  then run at VPU/VMEM speed with zero HBM traffic.

Measured on v5e (512-frame batch, default 128x128 maps, 248-cell ring):
rank-search stage 42.0 ms/512 = 12,200 fps vs 118 fps for the XLA
gather+sort — bit-identical thresholds to jnp.sort on the same f32 ring
(tests/test_pallas.py::TestPallasOSCFAR::test_bit_exact_vs_xla_sort).
The detection pipelines skip the threshold map entirely via the
one-pass HIT kernels below (box-count form: see its docstring for the
stage/pipeline numbers).

The reference detects with a bare argmax (acceleration.cu:522); the CFAR
family is the north-star extension, golden truth radar_tpu/golden.py:313.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Largest finite float32 bit pattern: the binary search converges from
# [0, MAX_FINITE_BITS] in ceil(log2(0x7F7FFFFF)) = 31 iterations.
_MAX_FINITE_BITS = 0x7F7FFFFF
_SEARCH_ITERS = 31


def ring_offsets(cfg) -> list[tuple[int, int]]:
    """Training-ring offsets in the shared deterministic order (see
    ``ops.cfar.os_ring_params`` — the single definition every OS twin
    consumes)."""
    from radar_tpu.ops.cfar import os_ring_params

    return os_ring_params(cfg)[0]


def _os_kernel(
    padded_ref,  # (1, D + 2*wd, R + 2*wr) f32, one padded map
    thresh_ref,  # (1, d_tile, R) f32 threshold tile
    ring,        # VMEM scratch (n_pad, d_tile, R) f32
    *,
    offsets,
    wd: int,
    wr: int,
    d_tile: int,
    r_size: int,
    k: int,
    n_pad: int,
    alpha: float,
):
    d0 = pl.program_id(1) * d_tile
    # One sublane-aligned dynamic load of the tile + halo (Mosaic requires
    # dynamic sublane starts provably 8-aligned: d0 is a d_tile multiple);
    # the per-offset windows are then STATIC slices of the loaded value —
    # register relayouts, no alignment constraint.
    d_blk = -(-(d_tile + 2 * wd) // 8) * 8
    blk = padded_ref[0, pl.ds(d0, d_blk), :]
    for j, (dd, dr) in enumerate(offsets):
        ring[j] = blk[wd + dd : wd + dd + d_tile, wr + dr : wr + dr + r_size]
    for j in range(len(offsets), n_pad):
        ring[j] = jnp.full((d_tile, r_size), jnp.inf, jnp.float32)

    # Exact k-th smallest via bit-space binary search: smallest t with
    # count(ring <= t) >= k.  Non-negative f32 order == int32 bit order;
    # the inf pads (0x7F800000) always rank above MAX_FINITE_BITS.
    rb = pltpu.bitcast(ring[:], jnp.int32)

    def body(_, carry):
        lo, hi = carry
        mid = lo + jax.lax.shift_right_logical(hi - lo, 1)
        cnt = jnp.sum((rb <= mid[None]).astype(jnp.int32), axis=0)
        ge = cnt >= k
        return jnp.where(ge, lo, mid + 1), jnp.where(ge, mid, hi)

    lo = jnp.zeros((d_tile, r_size), jnp.int32)
    hi = jnp.full((d_tile, r_size), _MAX_FINITE_BITS, jnp.int32)
    lo, hi = jax.lax.fori_loop(0, _SEARCH_ITERS, body, (lo, hi))
    kth = pltpu.bitcast(lo, jnp.float32)
    thresh_ref[0] = jnp.float32(alpha) * kth


def _pick_d_tile(d_size: int, r_size: int, n_pad: int) -> int:
    """Largest Doppler tile whose ring scratch + count temporaries stay
    within a conservative VMEM budget (~10 MB of the 16 MB/core): the ring
    is n_pad*d_tile*R f32 and the compare materializes an equal-size i32."""
    budget = 10 << 20
    d_tile = d_size
    while d_tile > 1 and n_pad * d_tile * r_size * 8 > budget:
        d_tile //= 2
    return max(1, d_tile)


def _prepare(power, cfg):
    """Host-side scaffolding SHARED by the rank-search and hits kernels
    (their selftest cross-check is bit-exact only while the padding
    semantics stay identical): flatten the lead axes, cast f32, wrap-pad
    Doppler, edge-pad range per ``cfg.cfar_range_mode``.

    Returns (x (b, dp, rp), lead, d_size, r_size, wd, wr).
    """
    gd, gr = cfg.cfar_guard
    td, tr = cfg.cfar_train
    wd, wr = gd + td, gr + tr
    lead = power.shape[:-2]
    d_size, r_size = power.shape[-2], power.shape[-1]
    x = power.reshape((-1, d_size, r_size)).astype(jnp.float32)
    x = jnp.pad(x, ((0, 0), (wd, wd), (0, 0)), mode="wrap")
    x = jnp.pad(x, ((0, 0), (0, 0), (wr, wr)), mode=cfg.cfar_range_mode)
    return x, lead, d_size, r_size, wd, wr


def _bottom_pad(x, d_tile: int, n_tiles: int, wd: int):
    """Junk rows below the padded map so every tile's ALIGNED block load
    (d_blk rows from the tile start) stays in bounds — the other half of
    the shared scaffolding contract (see :func:`_prepare`)."""
    d_blk = -(-(d_tile + 2 * wd) // 8) * 8
    rows_needed = (n_tiles - 1) * d_tile + d_blk
    if rows_needed > x.shape[-2]:
        x = jnp.pad(x, ((0, 0), (0, rows_needed - x.shape[-2]), (0, 0)))
    return x


@functools.partial(jax.jit, static_argnames=("cfg", "interpret"))
def os_cfar_2d_pallas(
    power: jnp.ndarray,
    cfg,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """OS-CFAR via the Pallas rank-selection kernel.

    Args:
      power: float32 (..., doppler, range) NON-NEGATIVE power map (the
        bit-order trick requires it; RD power is a sum of squares).

    Returns:
      (hits bool, threshold float32), shapes of ``power``.
    """
    from radar_tpu.ops.cfar import os_ring_params

    offsets, n_train, k, alpha = os_ring_params(cfg)
    n_pad = -(-n_train // 8) * 8  # sublane-multiple ring depth

    x, lead, d_size, r_size, wd, wr = _prepare(power, cfg)
    b = x.shape[0]

    d_tile = _pick_d_tile(d_size, r_size, n_pad)
    n_tiles = -(-d_size // d_tile)
    if n_tiles * d_tile != d_size:
        raise ValueError(
            f"doppler size {d_size} not divisible by tile {d_tile} "
            "(FFT sizes are powers of two; custom sizes must divide evenly)"
        )
    if n_tiles > 1 and d_tile % 8:
        # sublane tiles must be multiples of 8, but the VMEM budget asked
        # for fewer rows.  Clamp UP to 8 only if that still fits the hard
        # scoped-VMEM ceiling — silently reverting to one full-height
        # tile would blow VMEM on exactly the geometries the budget
        # logic targets (e.g. range_fft_size=2048 at the full ring).
        if n_pad * 8 * r_size * 8 > (15 << 20):
            raise ValueError(
                f"OS-CFAR ring ({n_pad} cells x {r_size} range bins) "
                "exceeds VMEM even at an 8-row Doppler tile; decimate "
                "the training ring (cfg.cfar_os_stride) or use the XLA "
                "path (cfar_impl='xla')"
            )
        d_tile = min(8, d_size)
        n_tiles = -(-d_size // d_tile)
        if n_tiles * d_tile != d_size:
            # the pre-clamp divisibility check ran against the budget tile;
            # re-check against the clamped one (e.g. D=36 -> 5 tiles x 8 =
            # 40 rows would silently rely on unvalidated edge-block padding)
            raise ValueError(
                f"doppler size {d_size} not divisible by the 8-row VMEM "
                f"tile the ring budget forces; use a multiple-of-8 doppler "
                "FFT size or the XLA path (cfar_impl='xla')"
            )
    x = _bottom_pad(x, d_tile, n_tiles, wd)

    kernel = functools.partial(
        _os_kernel,
        offsets=tuple(offsets),
        wd=wd, wr=wr, d_tile=d_tile, r_size=r_size,
        k=k, n_pad=n_pad, alpha=alpha,
    )
    thresh = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, d_size, r_size), jnp.float32),
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec(
                (1, x.shape[-2], r_size + 2 * wr),
                lambda i, j: (i, 0, 0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec(
            (1, d_tile, r_size), lambda i, j: (i, j, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.VMEM((n_pad, d_tile, r_size), jnp.float32)],
        interpret=interpret,
    )(x)
    thresh = thresh.reshape(lead + (d_size, r_size))
    return power > thresh, thresh


# ---------------------------------------------------------------------------
# one-pass hit decision: rank selection without finding the rank value
# ---------------------------------------------------------------------------
#
# The detection pipeline never consumes the OS threshold MAP — every
# caller unpacks ``hits, _`` (rd_pipeline._cfar, distributed) — so the
# 31-iteration bit-space search above does 31x the work the decision
# needs.  The decision itself is a SINGLE counting pass:
#
#     hit  <=>  p > RN(alpha * T_k)                (the contract above)
#          <=>  count_j( RN(alpha * v_j) < p ) >= k
#
# EXACTLY, including every float rounding: v -> RN(alpha*v) is monotone
# non-decreasing (RN is monotone, alpha > 0), so the k-th smallest of the
# transformed ring values IS RN(alpha * T_k), and for any sorted w,
# ``count(w < p) >= k  <=>  w_(k) < p``.  Ties behave right too: a cell
# whose power exactly equals RN(alpha * T_k) counts fewer than k strict
# inequalities, matching the strict ``power > threshold`` gate.
#
# The counting pass needs no ring scratch at all — the count accumulates
# offset-by-offset against static slices of the (alpha-scaled) padded
# map — so the whole Doppler extent fits one tile at default geometry
# and the kernel does ~2 vector ops per (cell, ring-offset) pair vs the
# search's ~2 per pair PER ITERATION (~20x less vector work).
# ``os_cfar_2d_pallas`` above remains the path that materializes the
# threshold map (cfar_detect without hits_only, selftest cross-checks).


def _os_hits_kernel(
    padded_ref,  # (1, D + 2*wd (+ align pad), R + 2*wr) f32, one padded map
    hits_ref,    # (1, d_tile, R) int32 0/1 hit tile
    *,
    offsets,
    wd: int,
    wr: int,
    d_tile: int,
    r_size: int,
    k: int,
    alpha: float,
):
    d0 = pl.program_id(1) * d_tile
    d_blk = -(-(d_tile + 2 * wd) // 8) * 8
    blk = padded_ref[0, pl.ds(d0, d_blk), :]
    # hoist RN(alpha * v) once per tile; each ring offset is then one
    # compare + one add on the (d_tile, R) window
    ab = jnp.float32(alpha) * blk
    p = blk[wd : wd + d_tile, wr : wr + r_size]
    cnt = jnp.zeros((d_tile, r_size), jnp.int32)
    for dd, dr in offsets:
        w = ab[wd + dd : wd + dd + d_tile, wr + dr : wr + dr + r_size]
        cnt += (w < p).astype(jnp.int32)
    hits_ref[0] = (cnt >= k).astype(jnp.int32)


def _os_hits_box_kernel(
    padded_ref,  # (f, dp, rp) f32 — f whole padded maps per grid step
    hits_ref,    # (f, d_size, r_size) int32 0/1 hits
    *,
    wd: int,
    wr: int,
    gd: int,
    gr: int,
    d_size: int,
    r_size: int,
    k: int,
    alpha: float,
    unroll_r: int = 1,
):
    """Stride-1 hits via ONE regular box count with the guard masked.

    At ``cfar_os_stride == 1`` the training ring is exactly the
    (2wd+1) x (2wr+1) window box minus the (2gd+1) x (2gr+1) guard box,
    and counts are integers, so excluding the guard cells' indicators
    from the box accumulation gives the ring count exactly (every cell
    counted once; the center is a guard cell).
    The loop structure is shaped by two measured Mosaic costs.  A fully
    unrolled offset list keeps every per-offset temporary on the stack
    (~5.6 B/cell/offset, the reason :func:`_os_hits_kernel` is clamped
    to small Doppler tiles), so the RANGE shift runs as a ``fori_loop``
    whose carry is the lane-rolled map, advanced by a constant -1 each
    iteration (a dynamic ``pltpu.roll`` shift lowers to a log-step
    barrel chain, ~8 ops/vreg: 28.4 ms/512; a CARRIED incremental roll
    measured 23.6 when both loops were fori, still bound by the inner
    carry's VMEM round-trip).  The DOPPLER shift is a short Python
    unroll of STATIC sublane slices — no roll, no carry, and only
    2*wd+1 offsets' temporaries live at once.

    Invariants: abr at outer step jr == roll(ab, wr - jr), so lane
    wr+r reads ab[.., wr+r+dr] with dr = jr - wr; the jd-th slice
    starts at row jd, so row wd+d reads col[wd+d+dd] with dd = jd - wd.
    All read indices stay inside the real halo (never the +inf
    alignment pad): rows span [0, D-1+2wd] subset [0, dp), lanes span
    [wr-wr, R-1+2wr] subset [0, rp).

    Measured on v5e (512-frame batch, default geometry, 248-cell ring,
    stage_budget discipline): 10.5 ms/512 = 48.8k fps — 3.4x the
    unrolled offsets kernel (35.2 ms) and 4.0x the rank search (42.0);
    full OS pipeline 14.8 ms/512 = 34.6k fps (scripts/os_hits_ab.py,
    2026-08-18).  Negative result: an int16 count carry (halving the
    carry's VMEM round-trip) measured 13.3 ms — Mosaic repacks the
    (8,128) f32-native compare result into (16,128) i16 registers per
    iteration, costing more than the saved bandwidth; keep i32.
    Unrolling the outer fori_loop is also closed: Pallas supports only
    unroll=1 or full unroll, and the full unroll keeps all n_r
    iterations' per-slice temporaries on the stack at once (45 MB
    scoped-VMEM at the default geometry vs the 16 MB limit) — the
    carried form is the only admissible schedule.
    """
    blk = padded_ref[...]
    ab = jnp.float32(alpha) * blk
    p = blk[:, wd : wd + d_size, wr : wr + r_size]
    n_d, n_r = 2 * wd + 1, 2 * wr + 1
    # widened unroll: each fori step handles ``unroll_r`` consecutive
    # range shifts as STATIC lane-offset slices of the carried rolled
    # map (abr at step js == roll(ab, wr - js*u), so sub-offset uu
    # reads lanes [wr+uu, wr+uu+R) — always inside the real halo, never
    # the +inf alignment pad, since the ab-space indices span
    # [js*u, R-1+2wr]).  This divides the (cnt, abr) carry's VMEM
    # round-trips by u while the per-step stack grows only u-fold.
    u = min(unroll_r, n_r)
    while n_r % u:
        u -= 1   # whole steps only: partial-step masking costs a
        #          where per (cell, offset) pair, more than it saves

    def outer(js, carry):
        cnt, abr = carry
        for uu in range(u):
            jr = js * u + uu
            col = abr[:, :, wr + uu : wr + uu + r_size]
            # dr = jr - wr; guard columns are the 2*gr+1 middle ones.
            # The guard exclusion folds into the SAME pass as masked
            # adds on the 2*gd+1 static guard rows (a second counting
            # pass would pay the cnt/abr carry round-trip 2*gr+1 more
            # times — more VMEM traffic than these selects cost in VPU
            # time).
            in_guard_col = jnp.abs(jr - wr) <= gr
            for jd in range(n_d):  # static sublane slices, unrolled
                w = col[:, jd : jd + d_size, :]
                ind = (w < p).astype(jnp.int32)
                if abs(jd - wd) <= gd:
                    ind = jnp.where(in_guard_col, jnp.int32(0), ind)
                cnt = cnt + ind
        # -u mod n: pltpu.roll requires non-negative shifts
        return cnt, pltpu.roll(abr, abr.shape[2] - u, axis=2)

    cnt, _ = jax.lax.fori_loop(
        0, n_r // u, outer,
        (jnp.zeros(p.shape, jnp.int32), pltpu.roll(ab, wr, axis=2)),
    )
    hits_ref[...] = (cnt >= k).astype(jnp.int32)


def _box_frames_per_step(dp: int, rp: int, d_size: int, r_size: int,
                         unroll_r: int, n_d: int) -> int:
    """Per-frame VMEM bytes for the box kernel at a given range unroll.
    Base charge (u=1): the double-buffered in block (2x dp*rp f32) plus
    blk/ab copies (2x), the lane-rolled column (dp*r), and ~7 map-sized
    f32/i32 values (p, w, cnt carry in/out, compare temporaries, the
    double-buffered out block) — calibrated against Mosaic's measured
    17.55 MB at f=16, dp=144, rp=256, D=R=128 (~1.10 MB/frame).
    Each EXTRA unrolled range shift keeps its n_d sublane slices' copy/
    compare/count temporaries live on the stack — measured 36.39 MB at
    u=3, f=16 (same geometry), i.e. ~+0.59 MB/frame per extra u; charged
    at 4 B per (cell, extra-u, sublane slice) for headroom."""
    return (4 * (4 * dp * rp + dp * r_size + 7 * d_size * r_size)
            + 4 * (unroll_r - 1) * n_d * d_size * r_size)


def _pick_box_frames(b: int, dp: int, rp: int, d_size: int,
                     r_size: int, unroll_r: int = 1,
                     n_d: int = 1) -> int:
    """Frames per grid step for the box kernel: largest power of two
    whose working set fits ~10 MB of the 16 MB scoped-VMEM ceiling
    (see :func:`_box_frames_per_step` for the charge model)."""
    per_frame = _box_frames_per_step(dp, rp, d_size, r_size, unroll_r,
                                     n_d)
    f = 1
    while f < min(b, 64) and per_frame * f * 2 <= (10 << 20):
        f *= 2
    return f


def _box_hits_fits(b: int, d_size: int, r_size: int, wd: int,
                   wr: int) -> bool:
    """Whether the box kernel's f=1 working set fits its VMEM budget
    (at the register-aligned padded dims the call site rounds up to)."""
    dp = -(-(d_size + 2 * wd) // 8) * 8
    rp = -(-(r_size + 2 * wr) // 128) * 128
    per_frame = 4 * (4 * dp * rp + dp * r_size + 7 * d_size * r_size)
    return per_frame * 2 <= (10 << 20)


def _pick_hits_tile(d_size: int, wd: int, dp: int, rp: int,
                    r_size: int, n_off: int) -> int:
    """Largest Doppler tile whose working set stays inside a
    conservative VMEM budget.  The whole padded frame map (dp x rp) is
    the kernel's VMEM block (Pallas blocks cannot overlap, and each
    tile needs a 2*wd halo), so tiling bounds the per-tile transients.
    The DOMINANT charge is Mosaic's stack for the fully unrolled
    counting loop: each ring offset's shifted window is a lane/sublane-
    offset slice whose copy + compare + count temporaries Mosaic keeps
    as distinct stack values — measured 30.25 MB scoped at d_tile=128,
    R=128, 332 offsets on v5e (~5.6 B per cell per offset); charged at
    8 B/cell/offset so the estimate stays conservative."""
    budget = 10 << 20
    resident = 4 * dp * rp

    def need(dt):
        d_blk = -(-(dt + 2 * wd) // 8) * 8
        return resident + 8 * d_blk * rp + n_off * 8 * dt * r_size

    if need(8) > budget:
        raise ValueError(
            f"padded power map ({dp} x {rp} f32) plus the {n_off}-offset "
            "count loop's temporaries do not fit the OS hits kernel's "
            "VMEM budget even at an 8-row tile; decimate the ring "
            "(cfg.cfar_os_stride) or use cfar_impl='xla'"
        )
    d_tile = d_size
    while d_tile > 8 and need(d_tile) > budget:
        d_tile //= 2
    return max(1, d_tile)


def os_hits_supported(d_size: int, r_size: int, cfg) -> bool:
    """True when :func:`os_cfar_hits_pallas` can run this geometry —
    the non-raising form of its gates (box-count form at stride 1, else
    the offsets form's VMEM-resident padded map + 8-aligned Doppler
    tiling).  ``cfar_detect(hits_only=True)`` checks this and falls
    back to the rank-search kernel (whose ring-scratch budget admits a
    different set of geometries) when False."""
    from radar_tpu.ops.cfar import os_ring_params

    gd, gr = cfg.cfar_guard
    td, tr = cfg.cfar_train
    wd, wr = gd + td, gr + tr
    if cfg.cfar_os_stride == 1 and _box_hits_fits(1, d_size, r_size,
                                                  wd, wr):
        return True
    dp, rp = d_size + 2 * wd, r_size + 2 * wr
    n_off = len(os_ring_params(cfg)[0])
    try:
        d_tile = _pick_hits_tile(d_size, wd, dp, rp, r_size, n_off)
    except ValueError:
        return False
    n_tiles = -(-d_size // d_tile)
    return n_tiles == 1 or (d_tile % 8 == 0 and n_tiles * d_tile == d_size)


@functools.partial(jax.jit, static_argnames=("cfg", "interpret", "impl",
                                              "box_unroll"))
def os_cfar_hits_pallas(
    power: jnp.ndarray,
    cfg,
    interpret: bool = False,
    impl: str = "auto",
    box_unroll: int = 1,
) -> jnp.ndarray:
    """OS-CFAR hit map via a counting kernel (no threshold).

    Bit-identical to ``power > os_cfar_2d_pallas(power, cfg)[1]`` (see
    the counting-identity note above) at a fraction of the vector work.

    Two kernel forms behind one contract:

    * ``'box'`` (stride 1 only): ring count = train-box count minus
      guard-box count, two nested fori_loops over dynamic rolls — the
      fast form (see :func:`_os_hits_box_kernel`).
    * ``'offsets'``: the unrolled per-offset counting loop, any stride,
      Doppler-tiled under the Mosaic stack budget
      (:func:`_os_hits_kernel`).

    ``'auto'`` picks 'box' at stride 1 when its VMEM estimate fits.

    Args:
      power: float32 (..., doppler, range) NON-NEGATIVE power map.

    Returns:
      hits bool, shape of ``power``.
    """
    from radar_tpu.ops.cfar import os_ring_params

    offsets, _, k, alpha = os_ring_params(cfg)

    x, lead, d_size, r_size, wd, wr = _prepare(power, cfg)
    b = x.shape[0]

    if impl not in ("auto", "box", "offsets"):
        raise ValueError(f"unknown OS hits impl {impl!r}")
    use_box = impl == "box" or (
        impl == "auto" and cfg.cfar_os_stride == 1
        and _box_hits_fits(b, d_size, r_size, wd, wr)
    )
    if use_box:
        if cfg.cfar_os_stride != 1:
            raise ValueError("the box-count OS hits kernel is exact only "
                             "at cfar_os_stride == 1")
        gd, gr = cfg.cfar_guard
        # Mosaic's dynamic_rotate wants register-aligned shapes: pad the
        # map to (8k sublanes, 128k lanes) with +inf — inf ring cells
        # never satisfy RN(alpha*v) < p, and interior windows stay
        # inside the real halo anyway (see the kernel docstring)
        dp8 = -(-x.shape[-2] // 8) * 8
        rp128 = -(-x.shape[-1] // 128) * 128
        if (dp8, rp128) != x.shape[-2:]:
            x = jnp.pad(x, ((0, 0), (0, dp8 - x.shape[-2]),
                            (0, rp128 - x.shape[-1])),
                        constant_values=jnp.inf)
        n_d = 2 * wd + 1
        u = max(1, box_unroll)
        # clamp the unroll to what fits at f=1 (the widened stack is
        # the binding constraint; see _box_frames_per_step)
        while u > 1 and (_box_frames_per_step(dp8, rp128, d_size,
                                              r_size, u, n_d) * 2
                         > (10 << 20)):
            u -= 1
        f = _pick_box_frames(b, dp8, rp128, d_size, r_size, u, n_d)
        n_steps = -(-b // f)
        if n_steps * f != b:
            x = jnp.pad(x, ((0, n_steps * f - b), (0, 0), (0, 0)),
                        constant_values=jnp.inf)
        kernel = functools.partial(
            _os_hits_box_kernel,
            wd=wd, wr=wr, gd=gd, gr=gr,
            d_size=d_size, r_size=r_size, k=k, alpha=alpha,
            unroll_r=u,
        )
        hits = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(
                (n_steps * f, d_size, r_size), jnp.int32
            ),
            grid=(n_steps,),
            in_specs=[
                pl.BlockSpec(
                    (f, x.shape[-2], x.shape[-1]),
                    lambda i: (i, 0, 0),
                    memory_space=pltpu.VMEM,
                )
            ],
            out_specs=pl.BlockSpec(
                (f, d_size, r_size), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            interpret=interpret,
        )(x)
        return hits[:b].astype(bool).reshape(lead + (d_size, r_size))

    d_tile = _pick_hits_tile(d_size, wd, x.shape[-2], x.shape[-1], r_size,
                             len(offsets))
    n_tiles = -(-d_size // d_tile)
    if n_tiles > 1 and (d_tile % 8 or n_tiles * d_tile != d_size):
        # dynamic sublane starts must be provably 8-aligned, and partial
        # edge tiles are never validated for this kernel (same policy as
        # the threshold kernel above)
        raise ValueError(
            f"doppler size {d_size} does not tile into 8-aligned rows "
            f"for the OS hits kernel; use cfar_impl='xla'"
        )
    x = _bottom_pad(x, d_tile, n_tiles, wd)

    kernel = functools.partial(
        _os_hits_kernel,
        offsets=tuple(offsets),
        wd=wd, wr=wr, d_tile=d_tile, r_size=r_size, k=k, alpha=alpha,
    )
    hits = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, d_size, r_size), jnp.int32),
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec(
                (1, x.shape[-2], r_size + 2 * wr),
                lambda i, j: (i, 0, 0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec(
            (1, d_tile, r_size), lambda i, j: (i, j, 0),
            memory_space=pltpu.VMEM,
        ),
        interpret=interpret,
    )(x)
    return hits.astype(bool).reshape(lead + (d_size, r_size))
