#!/usr/bin/env python
"""Headline benchmark: end-to-end range-Doppler-CFAR-AoA frames/sec/chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

vs_baseline is measured fps / 1000 (the BASELINE.json north-star target of
>=1000 radar frames/sec/chip; the reference itself publishes no numbers —
BASELINE.md).  Stage breakdown and the reference-parity range-only numbers
go to stderr.

Run on the real chip:   python bench.py
Options:                python bench.py --frames 2048 --batch 256
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=2048, help="frames to stream")
    ap.add_argument("--batch", type=int, default=256, help="frames per cube")
    ap.add_argument("--reps", type=int, default=3, help="timed repetitions")
    args = ap.parse_args()

    import jax

    from radar_tpu.config import RadarConfig
    from radar_tpu.io.synthetic import SceneTarget, synthesize_capture
    from radar_tpu.models.range_detector import RangeDetector
    from radar_tpu.models.rd_pipeline import RDPipeline
    from radar_tpu.parallel.stream import FrameStreamer, stream_detect
    from radar_tpu.utils.timing import time_fn

    cfg = RadarConfig()
    dev = jax.devices()[0]
    log(f"device: {dev} platform={dev.platform}")

    targets = [
        SceneTarget(range_m=3.0, velocity_mps=2.0, azimuth_deg=20.0, amplitude=2500.0),
        SceneTarget(range_m=8.0, velocity_mps=-4.0, azimuth_deg=-35.0, amplitude=1500.0),
    ]
    n_frames = args.frames + 1  # +1 base frame
    log(f"synthesizing {n_frames} frames ...")
    capture = synthesize_capture(targets, n_frames, cfg, noise_std=5.0, seed=0)

    pipe = RDPipeline(cfg, max_detections=16)
    base = jax.block_until_ready(pipe.prepare_base(capture[0]))

    # ---- compile warmup -------------------------------------------------
    warm = FrameStreamer(capture[: args.batch + 1], batch=args.batch, cfg=cfg)
    t0 = time.perf_counter()
    jax.block_until_ready(stream_detect(warm, lambda b: pipe.detect(b, base)))
    log(f"compile+warmup: {time.perf_counter() - t0:.2f}s")

    # ---- timed end-to-end streaming runs (includes H2D) -----------------
    fps_runs = []
    for rep in range(args.reps):
        streamer = FrameStreamer(capture, batch=args.batch, cfg=cfg)
        t0 = time.perf_counter()
        results = stream_detect(streamer, lambda b: pipe.detect(b, base))
        jax.block_until_ready(results)
        dt = time.perf_counter() - t0
        fps = args.frames / dt
        fps_runs.append(fps)
        log(f"rep {rep}: {args.frames} frames in {dt:.4f}s -> {fps:.1f} fps")
    fps = max(fps_runs)

    # ---- stage breakdown (device-only, fenced) ---------------------------
    batch_dev = jax.device_put(capture[1 : args.batch + 1])
    t_detect = time_fn(lambda b: pipe.detect(b, base), batch_dev, iters=5)
    log(f"device-only RD-CFAR-AoA: {1000*t_detect:.3f} ms/batch "
        f"({args.batch/t_detect:.0f} fps)")

    # reference-parity range-only pipeline for comparison
    rdet = RangeDetector(cfg)
    base_rx0 = jax.block_until_ready(rdet.prepare_base(capture[0]))
    t_range = time_fn(lambda b: rdet.detect(b, base_rx0), batch_dev, iters=5)
    log(f"device-only range-parity: {1000*t_range:.3f} ms/batch "
        f"({args.batch/t_range:.0f} fps)")

    result = {
        "metric": "range-doppler-cfar-aoa frames/sec/chip",
        "value": round(fps, 1),
        "unit": "frames/s",
        "vs_baseline": round(fps / 1000.0, 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
