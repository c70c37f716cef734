"""Wall-clock timing with device fencing.

The reference's ``Timer`` (acceleration.h:10-24) brackets four buckets —
total / FFT / preprocess / findMax — but its GPU windows overlap (the
"fftTime" window contains the D2H copy and host scan, acceleration.cu:496-528)
and its CPU accumulators are read before initialization
(cudaBenchMarking.cpp:215-218).  This module reports the same four-bucket
breakdown with non-overlapping windows and explicit
``jax.block_until_ready`` fencing so device async dispatch can't leak one
stage's time into another.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable

import jax


@jax.jit
def _complex_power_sum(v):
    import jax.numpy as jnp

    return jnp.sum(v.real * v.real + v.imag * v.imag)


class Timer:
    """Monotonic stopwatch (the reference Timer's contract)."""

    def __init__(self):
        self.reset()

    def reset(self) -> None:
        self._t0 = time.perf_counter()

    def elapsed(self) -> float:
        return time.perf_counter() - self._t0


@dataclasses.dataclass
class StageTimings:
    """Reference-format 4-bucket accumulator (seconds)."""

    preprocess: float = 0.0   # decode + reshape + clutter + pad
    fft: float = 0.0          # range (+Doppler) transforms
    detect: float = 0.0       # peak scan / CFAR / AoA
    total: float = 0.0
    frames: int = 0

    @property
    def fps(self) -> float:
        return self.frames / self.total if self.total else 0.0

    def per_frame_ms(self, bucket: str) -> float:
        if not self.frames:
            return 0.0
        return 1000.0 * getattr(self, bucket) / self.frames

    def report(self) -> str:
        """Human-readable summary mirroring the reference's printfs
        (cudaBenchMarking.cpp:328-331)."""
        return (
            f"Total Time for {self.frames} frames "
            f"{1000.0 * self.total:.5f} ms averaged {self.fps:.5f} FPS\n"
            f"Total FFT time {1000.0 * self.fft:.5f} ms averaged "
            f"{self.per_frame_ms('fft'):.5f} ms/frame\n"
            f"Total Reshape + Extension time {1000.0 * self.preprocess:.5f} ms "
            f"averaged {self.per_frame_ms('preprocess'):.5f} ms/frame\n"
            f"Total findMax time {1000.0 * self.detect:.5f} ms averaged "
            f"{self.per_frame_ms('detect'):.5f} ms/frame"
        )


def fence(tree) -> None:
    """Hard device fence: materialize one scalar derived from every leaf.

    ``jax.block_until_ready`` does NOT actually fence on some remote TPU
    transports (observed on the axon relay: a 100 s computation "blocks"
    in 3 ms); only a device->host value transfer is a true barrier.  Summing
    the leaves first keeps it to a single small transfer.
    """
    import jax.numpy as jnp

    total = jnp.float32(0)
    for leaf in jax.tree.leaves(tree):
        if not isinstance(leaf, jax.Array):
            continue  # host value: already materialized
        if jnp.iscomplexobj(leaf):
            # reduce c64 -> f32 on device in one jitted program; complex64
            # values cannot cross the host boundary on the axon transport
            total = total + _complex_power_sum(leaf)
        else:
            total = total + jnp.sum(leaf.astype(jnp.float32))
    float(total)


def onchip_time(program: Callable, shorts, base=None, iters: int = 32,
                reps: int = 3, perturb: Callable | None = None) -> float:
    """Best-of-``reps`` per-iteration ON-CHIP time of ``program(shorts,
    base)`` (or ``program(shorts)`` when ``base`` is None) — the
    measurement discipline every perf script shares.  ``perturb``
    overrides the per-iteration input defeat (default: int16 XOR with
    the loop index; pass e.g. a float add for f32 inputs).

    The dev relay adds ~26 ms of dispatch+fence RTT per call, which
    swamps millisecond-scale programs in a host-side loop, so the
    program runs inside ONE jitted ``lax.fori_loop``: the body perturbs
    the int16 input with the iteration index (an elementwise XOR that
    XLA fuses into the first consumer — defeats loop-invariant
    hoisting) and folds EVERY output leaf into a scalar carry (folding
    only one leaf lets XLA dead-code-eliminate the rest — this silently
    zeroed the round-2 tail measurements).  The warmed harness overhead
    (one dispatch + fence of a no-op on the same operand) is subtracted
    before dividing by ``iters``.
    """
    import jax.numpy as jnp

    if perturb is None:
        def perturb(s, i):
            return jnp.bitwise_xor(s, i.astype(jnp.int16))

    @jax.jit
    def run(s, b):
        def body(i, acc):
            s_i = perturb(s, i)
            out = program(s_i) if b is None else program(s_i, b)
            return acc + sum(jnp.sum(leaf).astype(jnp.float32)
                             for leaf in jax.tree.leaves(out))

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    noop = jax.jit(lambda s: jnp.float32(0))
    fence(noop(shorts))
    t0 = time.perf_counter()
    fence(noop(shorts))
    fixed = time.perf_counter() - t0

    fence(run(shorts, base))  # compile + warm
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        fence(run(shorts, base))
        dt = time.perf_counter() - t0
        best = dt if best is None or dt < best else best
    return max(best - fixed, 0.0) / iters


def time_fn(fn: Callable, *args, iters: int = 10, warmup: int = 2) -> float:
    """Mean per-iteration wall time of ``fn(*args)``.

    All ``iters`` calls are dispatched asynchronously and fenced ONCE so a
    fixed transport round-trip latency amortizes across iterations instead
    of dominating each one.
    """
    for _ in range(warmup):
        fence(fn(*args))
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    fence(outs)
    return (time.perf_counter() - t0) / iters
