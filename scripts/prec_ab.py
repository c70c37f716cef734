#!/usr/bin/env python
"""On-chip A/B of the detect kernel across dft_precision modes.

Question (round 4): the 'high' mode reproduces XLA's 3-pass bf16 scheme
with EXPLICIT VPU splits/concats because Mosaic only lowers
DEFAULT/HIGHEST dot precisions — but the a0/a1 stage decomposition
(scripts/stage_budget.py) shows phase A is ~1.5 ms/512 of VPU work over
a ~0.5 ms MXU floor.  HIGHEST (true f32, 6 hardware passes) needs NO
splits, NO slot concats and NO [hi|lo] packing: ~2x the MXU passes for
a fraction of the VPU work, and BETTER accuracy (~1e-7 vs ~1.4e-5).
If HIGHEST measures at or under 'high', the hardware 6-pass dot beats
the hand-built 3-pass scheme and should become the quality default.

Usage: python scripts/prec_ab.py [--frames 512] [--iters 64]
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, ".")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=512)
    ap.add_argument("--iters", type=int, default=64)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from radar_tpu.config import RadarConfig
    from radar_tpu.io.synthetic import SceneTarget, synthesize_capture
    from radar_tpu.models.rd_pipeline import RDPipeline
    from radar_tpu.utils.timing import fence

    targets = [
        SceneTarget(range_m=3.0, velocity_mps=2.0, azimuth_deg=20.0,
                    amplitude=2500.0),
        SceneTarget(range_m=8.0, velocity_mps=-4.0, azimuth_deg=-35.0,
                    amplitude=1500.0),
    ]
    cap = synthesize_capture(targets, args.frames + 1, RadarConfig(),
                             noise_std=5.0, seed=0)
    shorts = jax.device_put(cap[1:])
    fence(shorts)

    from radar_tpu.utils.timing import onchip_time

    results = {}
    for prec in ("high", "highest", "default"):
        cfg = RadarConfig(dft_precision=prec)
        pipe = RDPipeline(cfg, max_detections=16)
        base = pipe.prepare_base(cap[0])
        dt = onchip_time(pipe.detect, shorts, base, iters=args.iters)
        results[prec] = dt
        print(f"  detect() dft_precision={prec!r}: "
              f"{1000*dt:7.3f} ms/{args.frames} = {args.frames/dt:,.0f} fps")

    # accuracy cross-check on one small batch (golden f64 comparison is
    # in tests; here just show the two modes agree on detections)
    cfg_a = RadarConfig(dft_precision="high")
    cfg_b = RadarConfig(dft_precision="highest")
    pa = RDPipeline(cfg_a, max_detections=16)
    pb = RDPipeline(cfg_b, max_detections=16)
    base = pa.prepare_base(cap[0])
    small = jnp.asarray(cap[1:9])
    a = pa.detect(small, base)
    b = pb.detect(small, base)
    same = bool(np.array_equal(np.asarray(a.range_bin),
                               np.asarray(b.range_bin)))
    dp = float(np.max(np.abs(
        (np.asarray(a.power) - np.asarray(b.power))
        / np.maximum(np.abs(np.asarray(b.power)), 1e-30))))
    print(f"  high vs highest: same bins={same}, max power rel diff={dp:.2e}")


if __name__ == "__main__":
    main()
