"""Pallas top-K kernel for CFAR detection lists.

``jax.lax.top_k`` over the flattened 16,384-cell RD map is the most
expensive op in the detection tail (it sorts far more than the K=16 winners
we keep).  CFAR hit lists are tiny, so K rounds of (max-reduce, first-match
index, knock out the winner) on a VMEM-resident block are much cheaper:
K * O(N) VPU work with no sort network and no HBM round trips.

Semantics match ``lax.top_k`` on the masked power map EXACTLY: values
descending, ties broken by lowest index, and once the hits run out the
remaining ``-inf`` slots carry ascending untaken indices (stable-sort
order).  The last part needs a trick: the iterative knockout marks taken
cells, but a cell knocked to ``-inf`` would tie with — and shadow — the
untaken ``-inf`` cells.  So ``-inf`` inputs are remapped to the largest
finite negative f32 before the kernel (the knockout's ``-inf`` then
sorts strictly below every untaken cell) and mapped back on output.
Inputs equal to exactly ``float32.min`` would alias the sentinel; the
pipeline's masked power maps are non-negative-or--inf, so this never
binds there.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ROWS = 8  # f32 sublane tile


def _kernel(m_ref, idx_ref, val_ref, *, k, n):
    m = m_ref[:]
    lane = jax.lax.broadcasted_iota(jnp.int32, m.shape, 1)
    neg_inf = jnp.float32(-jnp.inf)
    for j in range(k):
        peak = jnp.max(m, axis=-1, keepdims=True)          # (rows, 1)
        cand = jnp.where(m == peak, lane, n)
        idx = jnp.min(cand, axis=-1, keepdims=True)        # first max
        idx_ref[:, j : j + 1] = idx
        val_ref[:, j : j + 1] = peak
        m = jnp.where(lane == idx, neg_inf, m)             # knock out


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def topk_pallas(
    masked: jnp.ndarray, k: int, interpret: bool = False
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(values f32 (..., k), indices int32 (..., k)) of the top-k entries.

    Args:
      masked: float32 (..., n) — typically the CFAR-masked power map
        (non-hits already set to -inf).
    """
    lead = masked.shape[:-1]
    n = masked.shape[-1]
    x = masked.reshape((-1, n)).astype(jnp.float32)
    sentinel = jnp.float32(jnp.finfo(jnp.float32).min)
    x = jnp.where(jnp.isneginf(x), sentinel, x)
    b = x.shape[0]
    b_pad = -(-b // _ROWS) * _ROWS
    if b_pad != b:
        x = jnp.pad(x, ((0, b_pad - b), (0, 0)),
                    constant_values=jnp.finfo(jnp.float32).min)

    kernel = functools.partial(_kernel, k=k, n=n)
    idx, val = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((b_pad, k), jnp.int32),
            jax.ShapeDtypeStruct((b_pad, k), jnp.float32),
        ),
        grid=(b_pad // _ROWS,),
        in_specs=[
            pl.BlockSpec((_ROWS, n), lambda i: (i, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=(
            pl.BlockSpec((_ROWS, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_ROWS, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(x)
    val = jnp.where(val == sentinel, -jnp.inf, val)
    return val[:b].reshape(lead + (k,)), idx[:b].reshape(lead + (k,))
