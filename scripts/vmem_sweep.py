#!/usr/bin/env python
"""On-chip A/B: scoped-VMEM limit x frame tiling for the detect kernel.

Round-4 found deeper ``rows`` tiling pays (transients charged once per
step): rows=4 -> 8 took detect() 4.66 -> 4.11 ms/512, but rows=16 OOMs
under Mosaic's default ~16 MB scoped-VMEM ceiling.  The megakernel now
takes ``RADAR_TPU_VMEM_LIMIT_MB`` (planned budget + Mosaic
``vmem_limit_bytes`` request), so rows=16/32 become reachable by
trading XLA's share of the 128 MB physical VMEM for kernel tiling.

Each (limit, rows) combo runs in a FRESH subprocess — the limit and
``rows`` bake into the trace, and a wedged/OOM combo must not take the
sweep down.  Timing follows the stage_budget discipline: one jitted
fori_loop, input XORed with the iteration index, every output leaf
folded into the carry.

Usage: python scripts/vmem_sweep.py [--frames 512] [--iters 32]
       (child mode: --child --limit-mb N --rows R)
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

COMBOS = [  # (limit_mb, rows) — 16/8 is the shipped default = control
    (16, 8),
    (32, 8),     # isolate the limit's own effect at fixed tiling
    (32, 16),
    (64, 16),
    (64, 32),
    (100, 32),
]


def child(frames: int, iters: int, rows: int) -> None:
    import jax
    import jax.numpy as jnp

    from radar_tpu.config import RadarConfig
    from radar_tpu.io.synthetic import SceneTarget, synthesize_capture
    from radar_tpu.models.rd_pipeline import RDPipeline
    from radar_tpu.ops.pallas.megakernel import _mega_detect_call
    from radar_tpu.utils.timing import fence

    cfg = RadarConfig()
    pipe = RDPipeline(cfg, max_detections=16)
    cap = synthesize_capture(
        [SceneTarget(range_m=3.0, velocity_mps=2.0, azimuth_deg=20.0,
                     amplitude=2500.0)],
        frames + 1, cfg, noise_std=5.0, seed=0,
    )
    base = pipe.prepare_base(cap[0])
    shorts = jax.device_put(cap[1:])
    fence(shorts)

    def program(s, b):
        return _mega_detect_call(s, b, cfg, True, 16, False, rows)

    @jax.jit
    def run(s, b):
        def body(i, acc):
            out = program(jnp.bitwise_xor(s, i.astype(jnp.int16)), b)
            return acc + sum(jnp.sum(leaf).astype(jnp.float32)
                             for leaf in jax.tree.leaves(out))

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    fence(run(shorts, base))  # compile + warm
    best = min(
        _timed(run, shorts, base, fence) for _ in range(3)
    )
    print(json.dumps({
        "limit_mb": int(os.environ.get("RADAR_TPU_VMEM_LIMIT_MB", "16")),
        "rows": rows,
        "ms_per_batch": best / iters * 1e3,
        "fps": frames * iters / best,
    }), flush=True)


def _timed(run, shorts, base, fence) -> float:
    t0 = time.perf_counter()
    fence(run(shorts, base))
    return time.perf_counter() - t0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=512)
    ap.add_argument("--iters", type=int, default=32)
    ap.add_argument("--child", action="store_true")
    ap.add_argument("--limit-mb", type=int, default=16)
    ap.add_argument("--rows", type=int, default=8)
    args = ap.parse_args()

    if args.child:
        child(args.frames, args.iters, args.rows)
        return

    for limit_mb, rows in COMBOS:
        env = dict(os.environ, RADAR_TPU_VMEM_LIMIT_MB=str(limit_mb))
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child",
             "--limit-mb", str(limit_mb), "--rows", str(rows),
             "--frames", str(args.frames), "--iters", str(args.iters)],
            env=env, capture_output=True, text=True, timeout=1800,
        )
        line = (r.stdout.strip().splitlines() or [""])[-1]
        if r.returncode == 0 and line.startswith("{"):
            print(line, flush=True)
        else:
            tail = (r.stderr.strip().splitlines() or ["?"])[-1][:200]
            print(json.dumps({"limit_mb": limit_mb, "rows": rows,
                              "error": tail}), flush=True)


if __name__ == "__main__":
    main()
