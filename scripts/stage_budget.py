#!/usr/bin/env python
"""On-chip stage budget for the production (mega-kernel) pipeline.

Methodology: the dev relay adds ~26 ms of dispatch+fence RTT per call,
which swamps millisecond-scale stages in a host-side timing loop.  Every
number here is therefore measured ON CHIP: the program under test runs
inside a single jitted ``lax.fori_loop`` (one dispatch, ``iters``
sequential on-device iterations).  The loop body perturbs the program
input with the iteration index (an elementwise op XLA fuses into the
first consumer) so the compiler cannot hoist the loop-invariant
computation, and folds EVERY output leaf into a scalar accumulator —
folding only one leaf lets XLA dead-code-eliminate the rest of the
program (this silently zeroed the round-2 tail measurements).

Two views:

* prefix programs — raw shorts up to stage k in one fused program;
  successive differences are the MARGINAL cost of each stage inside the
  program that actually ships (this decomposes the headline).
* alternates — the XLA formulations the mega kernel replaced, for the
  before/after record.

Usage: python scripts/stage_budget.py [--frames 512] [--iters 64]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=512)
    ap.add_argument("--iters", type=int, default=64)
    ap.add_argument("--precision", default=None,
                    help="dft_precision override (high/highest/default)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from radar_tpu.config import RadarConfig
    from radar_tpu.io.synthetic import SceneTarget, synthesize_capture
    from radar_tpu.models.rd_pipeline import (
        RDPipeline,
        aoa_from_snapshots,
        mimo_compensate,
        topk_cells,
    )
    from radar_tpu.ops.cfar import ca_cfar_2d
    from radar_tpu.ops.fuseddft import (
        doppler_from_range_planes,
        fused_range_planes,
    )
    from radar_tpu.ops.pallas.megakernel import (
        power_cfar_from_shorts_pallas,
        power_from_shorts_pallas,
        snapshots_from_shorts,
    )
    from radar_tpu.utils.timing import fence

    cfg = RadarConfig(**({"dft_precision": args.precision}
                         if args.precision else {}))
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

    # ---- on-chip timing harness -------------------------------------------
    def onchip(program, iters=args.iters):
        """Time ``program(shorts, base)`` inside one jitted fori_loop."""

        @jax.jit
        def run(s, b):
            def body(i, acc):
                out = program(jnp.bitwise_xor(s, i.astype(jnp.int16)), b)
                return acc + sum(jnp.sum(leaf).astype(jnp.float32)
                                 for leaf in jax.tree.leaves(out))

            return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

        fence(run(shorts, base))  # compile + warm
        t0 = time.perf_counter()
        fence(run(shorts, base))
        return (time.perf_counter() - t0) / iters

    # fixed overhead of the harness itself (dispatch + fence), warmed so
    # compile time does not pollute it; amortized /iters in every line
    noop = jax.jit(lambda s: jnp.float32(0))
    fence(noop(shorts))
    t0 = time.perf_counter()
    fence(noop(shorts))
    fixed = time.perf_counter() - t0

    # ---- prefix programs of the shipped (round-4 detect kernel) path ------
    from radar_tpu.ops.pallas.megakernel import _mega_detect_call

    def p_a0(s, b):   # range dot + clutter removal + split/store only
        return _mega_detect_call(s, b, cfg, True, 16, False, None,
                                 phases="a0")

    def p_a1(s, b):   # + TDM demux + Doppler dot + power integration
        return _mega_detect_call(s, b, cfg, True, 16, False, None,
                                 phases="a1")

    def p_a2(s, b):   # + CFAR threshold + masked-map store
        return _mega_detect_call(s, b, cfg, True, 16, False, None,
                                 phases="a2")

    def p_a(s, b):    # front-end + CFAR mask (no selection)
        return _mega_detect_call(s, b, cfg, True, 16, False, None,
                                 phases="a")

    def p_b1(s, b):   # front-end + CFAR + vectorized top-K knockout
        return _mega_detect_call(s, b, cfg, True, 16, False, None,
                                 phases="b1")

    def p_b2(s, b):   # + one-hot interp neighbor gathers
        return _mega_detect_call(s, b, cfg, True, 16, False, None,
                                 phases="b2")

    def p_full(s, b):  # + in-VMEM AoA snapshot gathers (the full kernel)
        return _mega_detect_call(s, b, cfg, True, 16, False, None)

    prefixes = [
        ("a0 range dot + clutter + split/store", p_a0),
        ("a1 + demux + Doppler dot + power", p_a1),
        ("a2 + CFAR threshold + mask store", p_a2),
        ("k0 front-end + CFAR mask (phases='a')", p_a),
        ("k1 detect kernel through top-K (phases='b1')", p_b1),
        ("k2 + interp neighbor gathers (phases='b2')", p_b2),
        ("k3 + AoA snapshots (the full kernel)", p_full),
        ("k4 + XLA tail (physics+MIMO+angle FFT) == detect()",
         pipe.detect),
    ]

    # ---- XLA alternates the kernel replaced -------------------------------
    def alt_power(s, b):
        rr, ri = fused_range_planes(s, b, cfg)
        dr, di = doppler_from_range_planes(rr, ri, cfg)
        return jnp.sum(dr * dr + di * di, axis=-3)

    def alt_power_cfar(s, b):
        pw = alt_power(s, b)
        return pw, ca_cfar_2d(pw, cfg)[1]

    def p_kernel_maps(s, b):
        return power_cfar_from_shorts_pallas(s, b, cfg)

    def alt_mega_power(s, b):
        return power_from_shorts_pallas(s, b, cfg)

    def alt_topk_xla(s, b):
        power, th = power_cfar_from_shorts_pallas(s, b, cfg)
        return topk_cells(power, power > th, 16, topk_impl="xla")

    def alt_snaps(s, b):
        power, th = power_cfar_from_shorts_pallas(s, b, cfg)
        _, top_idx, _, _, d_bin, _ = topk_cells(
            power, power > th, 16, topk_impl="pallas"
        )
        snaps = mimo_compensate(
            snapshots_from_shorts(s, b, top_idx, cfg), d_bin, cfg
        )
        return aoa_from_snapshots(snaps, cfg)

    def alt_maps_path(s, b):   # the round-3 shipped path: maps + XLA tail
        return RDPipeline(cfg, max_detections=16, rd_impl="mega-maps",
                          topk_impl="pallas").detect(s, b)

    alternates = [
        ("XLA fused shorts->power (no CFAR)", alt_power),
        ("XLA fused shorts->power+CFAR", alt_power_cfar),
        ("mega kernel power-only (no CFAR)", alt_mega_power),
        ("maps kernel (power+CFAR out to HBM)", p_kernel_maps),
        ("maps kernel + lax.top_k tail", alt_topk_xla),
        ("maps kernel + Pallas topk + snapshot recompute", alt_snaps),
        ("round-3 shipped path (rd_impl='mega-maps')", alt_maps_path),
    ]

    print(f"\nstage budget, {args.frames}-frame batch, on-chip fori_loop "
          f"of {args.iters} iters (v5e); harness fixed overhead "
          f"{1000*fixed:.1f} ms/dispatch (amortized /{args.iters})")
    print("shipped-path prefixes (marginal = this line minus previous):")
    prev = 0.0
    for name, prog in prefixes:
        dt = onchip(prog)
        print(f"  {1000*dt:7.3f} ms  (+{1000*(dt-prev):6.3f})  {name}")
        prev = dt
    total = prev
    print(f"  headline: on-chip detect() {1000*total:.3f} ms/"
          f"{args.frames} = {args.frames/total:.0f} fps")
    print("alternates (what the shipped choices replaced):")
    for name, prog in alternates:
        dt = onchip(prog)
        print(f"  {1000*dt:7.3f} ms  {name}")


if __name__ == "__main__":
    main()
