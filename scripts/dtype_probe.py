#!/usr/bin/env python
"""Probe which int-dtype ops/conversions Mosaic lowers on this TPU.

Each probe compiles a one-op Pallas kernel; a SIGABRT/HTTP-500 from the
remote compile helper means "unsupported".  Used to pick an exact
int-space hi/lo split for the mega kernel's range stage (the f32-route
split is ~1.5 ms/512 of phase A's a0 prefix).
"""
from __future__ import annotations

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def probe(name, fn, x_dtype, out_dtype, shape=(512, 256)):
    def kern(x_ref, o_ref):
        o_ref[:] = fn(x_ref[:])

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct(shape, out_dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)

    rng = np.random.default_rng(0)
    if np.issubdtype(x_dtype, np.integer):
        info = np.iinfo(x_dtype)
        x = jnp.asarray(rng.integers(max(info.min, -2048),
                                     min(info.max, 2048),
                                     size=shape, dtype=x_dtype))
    else:
        x = jnp.asarray(rng.standard_normal(shape), x_dtype)
    try:
        np.asarray(run(x))
        print(f"  OK    {name}")
        return True
    except Exception as e:  # noqa: BLE001
        msg = str(e).split("\n")[0][:110]
        print(f"  FAIL  {name}: {type(e).__name__}: {msg}")
        return False


def main():
    i16, i32, i8 = jnp.int16, jnp.int32, jnp.int8
    bf16, f32 = jnp.bfloat16, jnp.float32
    print("converts:")
    probe("int16->f32", lambda x: x.astype(f32), np.int16, f32)
    probe("int16->bf16", lambda x: x.astype(bf16), np.int16, bf16)
    probe("int16->int32", lambda x: x.astype(i32), np.int16, i32)
    probe("int32->f32", lambda x: x.astype(f32), np.int32, f32)
    probe("int32->bf16", lambda x: x.astype(bf16), np.int32, bf16)
    probe("int16->int8", lambda x: (x % 127).astype(i8), np.int16, i8)
    probe("int8->bf16", lambda x: x.astype(bf16), np.int8, bf16)
    probe("int8->f32", lambda x: x.astype(f32), np.int8, f32)
    probe("bf16->int16", lambda x: x.astype(i16), np.float32, i16,
          )
    probe("f32->bf16", lambda x: x.astype(bf16), np.float32, bf16)
    print("int16 arithmetic:")
    probe("int16 sub", lambda x: x - jnp.int16(3), np.int16, i16)
    probe("int16 shr8", lambda x: x >> 8, np.int16, i16)
    probe("int16 and255", lambda x: x & jnp.int16(255), np.int16, i16)
    print("int8 dot (MXU):")

    def i8dot(x):
        a = (x % 7).astype(i8)
        return jax.lax.dot_general(
            a, a.T.astype(i8),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=i32,
        ).astype(i32)

    probe("int8xint8->int32 dot", i8dot, np.int16, i32, (256, 256))


if __name__ == "__main__":
    main()
