#!/usr/bin/env python
"""On-chip A/B: OS-CFAR one-pass hits kernel vs the rank-search kernel.

Times three things with the stage_budget discipline (one jitted
fori_loop, input XORed/permuted per iteration, every output folded into
the carry):

  stage-search : os_cfar_2d_pallas   (31-iteration bit-space rank search)
  stage-hits   : os_cfar_hits_pallas (one counting pass, hits only)
  pipe-os      : full RDPipeline.detect with cfar_kind='os' (auto impl —
                 uses the hits kernel through cfar_detect(hits_only=True))

Usage: python scripts/os_hits_ab.py [--frames 512] [--stride 1]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=512)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--stride", type=int, default=1)
    ap.add_argument("--skip-search", action="store_true",
                    help="skip the slow rank-search baseline")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from radar_tpu.config import RadarConfig
    from radar_tpu.io.synthetic import SceneTarget, synthesize_capture
    from radar_tpu.models.rd_pipeline import RDPipeline
    from radar_tpu.ops.pallas.oscfar_kernel import (
        os_cfar_2d_pallas,
        os_cfar_hits_pallas,
    )
    from radar_tpu.utils.timing import fence, onchip_time

    cfg = RadarConfig(cfar_kind="os", cfar_os_stride=args.stride)
    rng = np.random.default_rng(0)
    power = rng.gamma(
        2.0, 100.0,
        (args.frames, cfg.doppler_fft_size, cfg.range_fft_size),
    ).astype(np.float32)
    p_dev = jax.device_put(power)
    fence(p_dev)

    def report(name, dt):
        print(f"{name:14s} {1000 * dt:8.3f} ms/{args.frames} = "
              f"{args.frames / dt:8.0f} fps", flush=True)

    # the shared on-chip harness (utils.timing.onchip_time) with a
    # float add as the per-iteration defeat — these stages take the
    # f32 power map, not int16 shorts
    def f32_perturb(s, i):
        return s + i.astype(jnp.float32)

    def stage_time(fn):
        return onchip_time(fn, p_dev, iters=args.iters, reps=args.reps,
                           perturb=f32_perturb)

    if not args.skip_search:
        report("stage-search",
               stage_time(lambda p: os_cfar_2d_pallas(p, cfg)))
    if args.stride == 1:
        # widened range-unroll sweep: u static lane slices per carried
        # roll step divide the (cnt, abr) fori carry round-trips by u
        # (n_r = 21 at defaults -> whole-step u in {1, 3, 7, 21})
        for u in (1, 3, 7, 21):
            report(f"stage-hits-box-u{u}",
                   stage_time(lambda p, _u=u: os_cfar_hits_pallas(
                       p, cfg, impl="box", box_unroll=_u)))
    report("stage-hits-off",
           stage_time(lambda p: os_cfar_hits_pallas(p, cfg,
                                                    impl="offsets")))

    pipe = RDPipeline(cfg, max_detections=16)
    cap = synthesize_capture(
        [SceneTarget(range_m=3.0, velocity_mps=2.0, azimuth_deg=20.0,
                     amplitude=2500.0),
         SceneTarget(range_m=8.0, velocity_mps=-4.0, azimuth_deg=-35.0,
                     amplitude=1500.0)],
        args.frames + 1, cfg, noise_std=5.0, seed=0,
    )
    base = pipe.prepare_base(jnp.asarray(cap[0]))
    shorts = jax.device_put(cap[1:])
    fence(shorts)

    # onchip_time passes shorts/base as jit ARGUMENTS (not closures:
    # jit inlines closed-over arrays as MLIR constants via a host
    # round-trip, and the dev relay's host boundary is Unimplemented
    # for the complex base — the SKILL.md eager-complex note)
    report("pipe-os", onchip_time(pipe.detect, shorts, base,
                                  iters=args.iters, reps=args.reps))


if __name__ == "__main__":
    main()
