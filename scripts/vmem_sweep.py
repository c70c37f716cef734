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

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

COMBOS = [  # (limit_mb, rows) — 16/8 is the shipped default = control
    (16, 8),
    (32, 8),     # isolate the limit's own effect at fixed tiling
    (32, 16),
    (64, 16),
    (64, 32),
    (100, 32),
]


def child(frames: int, iters: int, limit_mb: int, rows: int) -> None:
    # the knob is read from the env at trace time — set it from the flag
    # BEFORE the first traced call so a manual `--child --limit-mb 64`
    # run actually applies 64 MB (not whatever the shell exported)
    os.environ["RADAR_TPU_VMEM_LIMIT_MB"] = str(limit_mb)

    import jax

    from radar_tpu.config import RadarConfig
    from radar_tpu.io.synthetic import SceneTarget, synthesize_capture
    from radar_tpu.models.rd_pipeline import RDPipeline
    from radar_tpu.ops.pallas.megakernel import _mega_detect_call
    from radar_tpu.utils.timing import fence, onchip_time

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

    per_iter = onchip_time(program, shorts, base, iters=iters)
    print(json.dumps({
        "limit_mb": limit_mb,
        "rows": rows,
        "ms_per_batch": per_iter * 1e3,
        "fps": frames / per_iter,
    }), flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=512)
    ap.add_argument("--iters", type=int, default=32)
    ap.add_argument("--child", action="store_true")
    ap.add_argument("--limit-mb", type=int, default=16)
    ap.add_argument("--rows", type=int, default=8)
    args = ap.parse_args()

    if args.child:
        child(args.frames, args.iters, args.limit_mb, args.rows)
        return

    for limit_mb, rows in COMBOS:
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--child",
                 "--limit-mb", str(limit_mb), "--rows", str(rows),
                 "--frames", str(args.frames), "--iters", str(args.iters)],
                capture_output=True, text=True, timeout=1200,
            )
        except subprocess.TimeoutExpired:
            # a wedged combo (hung Mosaic compile / wedged relay) must
            # not take the rest of the sweep down
            print(json.dumps({"limit_mb": limit_mb, "rows": rows,
                              "error": "timeout (1200s)"}), flush=True)
            continue
        line = (r.stdout.strip().splitlines() or [""])[-1]
        if r.returncode == 0 and line.startswith("{"):
            print(line, flush=True)
        else:
            tail = (r.stderr.strip().splitlines() or ["?"])[-1][:200]
            print(json.dumps({"limit_mb": limit_mb, "rows": rows,
                              "error": tail}), flush=True)


if __name__ == "__main__":
    main()
