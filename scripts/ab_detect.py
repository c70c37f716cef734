#!/usr/bin/env python
"""Minimal on-chip detect() timing for A/B runs across commits.

Times ONLY the production ``RDPipeline.detect`` program inside one
jitted ``lax.fori_loop`` (the measurement discipline from
``stage_budget.py``: XOR the input with the loop index so nothing
hoists, fold every output leaf into the carry so nothing dead-codes).
Prints one line::

    ab_detect <ms_per_batch> ms/<frames> = <fps> fps

Usage: copy this script into the checkout/worktree of the revision
under test and run THAT copy (`python <tree>/scripts/ab_detect.py`) —
it pins its own tree to the FRONT of sys.path, so PYTHONPATH cannot
select the revision.  It touches only long-stable public API
(RDPipeline, synthetic capture, fence).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

# the repo revision this copy of the script sits in
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=512)
    ap.add_argument("--iters", type=int, default=32)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--precision", default=None,
                    help="dft_precision override (default/high/highest)")
    ap.add_argument("--clutter", default=None,
                    help="clutter_mode override (auto/base/mean/mti2/mti3)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from radar_tpu.config import RadarConfig
    from radar_tpu.io.synthetic import SceneTarget, synthesize_capture
    from radar_tpu.models.rd_pipeline import RDPipeline
    from radar_tpu.utils.timing import fence

    kw = {}
    if args.precision:
        kw["dft_precision"] = args.precision
    if args.clutter:
        kw["clutter_mode"] = args.clutter
    cfg = RadarConfig(**kw)
    pipe = RDPipeline(cfg, max_detections=16)
    cap = synthesize_capture(
        [SceneTarget(range_m=3.0, velocity_mps=2.0, azimuth_deg=20.0,
                     amplitude=2500.0),
         SceneTarget(range_m=8.0, velocity_mps=-4.0, azimuth_deg=-35.0,
                     amplitude=1500.0)],
        args.frames + 1, cfg, noise_std=5.0, seed=0,
    )
    base = pipe.prepare_base(cap[0])
    shorts = jax.device_put(cap[1:])
    fence(shorts)

    @jax.jit
    def run(s, b):
        def body(i, acc):
            out = pipe.detect(jnp.bitwise_xor(s, i.astype(jnp.int16)), b)
            return acc + sum(jnp.sum(leaf).astype(jnp.float32)
                             for leaf in jax.tree.leaves(out))

        return jax.lax.fori_loop(0, args.iters, body, jnp.float32(0))

    t0 = time.perf_counter()
    fence(run(shorts, base))  # compile + warm
    print(f"compile+warm {time.perf_counter() - t0:.1f} s", file=sys.stderr)
    best = float("inf")
    for _ in range(args.reps):
        t0 = time.perf_counter()
        fence(run(shorts, base))
        best = min(best, (time.perf_counter() - t0) / args.iters)
    print(f"ab_detect {1000 * best:.3f} ms/{args.frames} = "
          f"{args.frames / best:.0f} fps")


if __name__ == "__main__":
    main()
