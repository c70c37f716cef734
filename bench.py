#!/usr/bin/env python
"""Headline benchmark: end-to-end range-Doppler-CFAR-AoA frames/sec/chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

vs_baseline = measured fps / 1000 (the BASELINE.json north-star target of
>=1000 radar frames/sec/chip; the reference publishes no numbers —
BASELINE.md).

Measurement notes
-----------------
* ``jax.block_until_ready`` is not a real fence on remote TPU transports
  (axon relay); every timing here fences by materializing a scalar
  reduction of the results (radar_tpu.utils.timing.fence).
* The headline is the sustained on-chip detection rate: raw int16 frames
  resident in HBM -> ONE Pallas mega-kernel (decode+window+range DFT +
  Doppler DFT + power + band-matrix CA-CFAR, no intermediate in HBM;
  ops/pallas/megakernel.py) -> top-K -> AoA, with per-batch detection
  outputs.
* The headline runs dft_precision='default' (the TPU's single bf16 MXU
  pass), PROMOTED in round 5 under a formalized acceptance gate: the
  20-seed + geometry + noise study (scripts/speed_gate.py,
  artifacts/speed_gate_r5.json) measured 0.026 detection-set flips per
  frame on target scenes (marginal threshold cells only; every common
  detection bit-identical in its bins, azimuth within ~0.01 deg) and
  0.7% on noise-only marginal detections — inside the detector's own
  +-Pfa statistical band — and the compiled selftest check 'speed-mode
  detections' gates <= 1 flip per 8-frame batch across seeds on every
  run.  The library default stays 'high' (3-pass, ~8e-6 — the
  verification-grade mode; DESIGN §5); 'high' is reported as the first
  variant and in the final JSON (high_mode_fps).
* The dev relay adds ~4 ms of dispatch RTT to EVERY step it relays, even
  pipelined (measured: the same program is 4.3 ms/batch inside one
  on-device loop vs 8.2 ms/batch host-dispatched through the relay; a
  production host dispatches in ~100 us).  The headline therefore runs
  ``n_batches`` iterations inside ONE jitted ``lax.fori_loop`` — one
  dispatch, sequential on-device iterations, every output leaf folded
  into the loop carry so no stage is dead-code-eliminated, and the input
  XORed with the loop index so iterations cannot be CSE'd.  The
  host-dispatched loop rate is reported on stderr for transparency.
  Host->HBM ingest through *this environment's* loopback tunnel runs at
  ~29 MB/s (~145 fps equivalent) and is reported separately on stderr; a
  production host NIC/PCIe sustains the 205 MB/s needed for 1000 fps with
  >100x margin, so the chip rate is the meaningful per-chip metric.
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import time

import numpy as np


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=65536, help="frames per run")
    ap.add_argument("--batch", type=int, default=512, help="frames per cube")
    ap.add_argument("--reps", type=int, default=3, help="timed repetitions")
    ap.add_argument("--skip-h2d", action="store_true",
                    help="skip the (slow) tunnel H2D measurement")
    ap.add_argument("--wait-device", type=int, default=5400,
                    help="seconds to wait for the TPU backend before giving "
                         "up (the dev relay wedges for 10-20 min after a "
                         "killed run and full outages of 1h+ have been "
                         "observed; 0 = no wait)")
    args = ap.parse_args()

    # The dev relay can be down for 10-20 min at a time.  A backend-init
    # failure is cached process-wide by JAX, so probe in SUBPROCESSES and
    # only import-and-init here once a probe succeeds — this keeps a
    # driver-invoked run from dying JSON-less on a transient wedge.
    # If jax is ALREADY imported (bench.main() called in-process, e.g.
    # the pytest smoke), the backend choice is already cached and the
    # probe can only waste time — worse, the probe subprocesses don't
    # inherit an in-process CPU override and would hang on a downed
    # relay.  The driver always runs bench.py as a fresh process, so it
    # still gets the wait.
    if args.wait_device and "jax" not in sys.modules:
        import subprocess
        deadline = time.time() + args.wait_device
        attempt = 0
        while True:
            attempt += 1
            try:
                r = subprocess.run(
                    [sys.executable, "-c", "import jax; jax.devices()"],
                    capture_output=True, timeout=300,
                )
                ok = r.returncode == 0
            except subprocess.TimeoutExpired:
                ok = False  # init hung — the relay is wedged, not down
            if ok:
                if attempt > 1:
                    log(f"backend up after {attempt} probes")
                break
            if time.time() >= deadline:
                log("backend still unavailable after "
                    f"{args.wait_device}s; proceeding to fail with the "
                    "real error")
                break
            log(f"backend probe {attempt} failed; retrying in 60s "
                f"({int(deadline - time.time())}s left)")
            time.sleep(60)

    import jax
    import jax.numpy as jnp

    from radar_tpu.config import RadarConfig
    from radar_tpu.io.synthetic import SceneTarget, synthesize_capture
    from radar_tpu.models.range_detector import RangeDetector
    from radar_tpu.models.rd_pipeline import RDPipeline
    from radar_tpu.utils.timing import fence

    cfg = RadarConfig(dft_precision="default")   # promoted speed mode
    cfg_high = RadarConfig()                     # library-default 'high'
    dev = jax.devices()[0]
    log(f"device: {dev} platform={dev.platform}")

    targets = [
        SceneTarget(range_m=3.0, velocity_mps=2.0, azimuth_deg=20.0, amplitude=2500.0),
        SceneTarget(range_m=8.0, velocity_mps=-4.0, azimuth_deg=-35.0, amplitude=1500.0),
    ]
    n_batches = max(1, args.frames // args.batch)
    log(f"synthesizing {args.batch + 1} unique frames "
        f"(x{n_batches} batches/run) ...")
    capture = synthesize_capture(targets, args.batch + 1, cfg, noise_std=5.0, seed=0)

    pipe = RDPipeline(cfg, max_detections=16)  # auto: mega Pallas kernel (in-kernel CFAR)
    base = pipe.prepare_base(capture[0])
    batch_dev = jax.device_put(capture[1:])
    fence(batch_dev)

    # ---- compile warmup --------------------------------------------------
    t0 = time.perf_counter()
    fence(pipe.detect(batch_dev, base))
    log(f"compile+warmup: {time.perf_counter() - t0:.2f}s")

    # ---- headline: sustained on-chip detection rate ----------------------
    # one dispatch per rep: n_batches sequential on-device iterations in a
    # fori_loop (see module docstring); every RDResult leaf folds into the
    # carry so the whole tail stays live
    @jax.jit
    def sustained(shorts, base_c):
        def body(i, acc):
            out = pipe.detect(jnp.bitwise_xor(shorts, i.astype(jnp.int16)),
                              base_c)
            return acc + sum(jnp.sum(leaf).astype(jnp.float32)
                             for leaf in jax.tree.leaves(out))
        return jax.lax.fori_loop(0, n_batches, body, jnp.float32(0))

    fence(sustained(batch_dev, base))  # compile + warm
    # median of reps (not best-of): reproducible within run-to-run noise
    fps_runs = []
    for rep in range(args.reps):
        t0 = time.perf_counter()
        fence(sustained(batch_dev, base))
        dt = time.perf_counter() - t0
        frames = n_batches * args.batch
        fps_runs.append(frames / dt)
        log(f"rep {rep}: {frames} frames in {dt:.4f}s -> {frames/dt:.0f} fps")
    fps = statistics.median(fps_runs)
    log(f"headline = median of {len(fps_runs)} reps: {fps:.0f} fps "
        f"(min {min(fps_runs):.0f}, max {max(fps_runs):.0f})")

    # host-dispatched loop through the dev relay, for transparency
    t0 = time.perf_counter()
    outs = [pipe.detect(batch_dev, base) for _ in range(n_batches)]
    fence([o.power for o in outs])
    dt = time.perf_counter() - t0
    log(f"host-dispatched loop (carries dev-relay RTT per step): "
        f"{n_batches * args.batch / dt:.0f} fps")

    # arithmetic intensity of the measured pipeline (MXU DFT path):
    # complex matmul = 4 real; range (C,S)x(S,R) + doppler (D,C)x(C,R) per rx
    cf = cfg
    flop_frame = 8 * cf.num_rx * (
        cf.num_chirps * cf.num_samples * cf.range_fft_size
        + cf.doppler_fft_size * cf.num_chirps * cf.range_fft_size
    )
    log(f"DFT matmul work: {flop_frame/1e6:.1f} MFLOP/frame -> "
        f"{flop_frame*fps/1e12:.2f} TFLOP/s f32 achieved; input "
        f"{cfg.bytes_per_frame*args.batch/1e6:.0f} MB int16/batch, RD power "
        f"map {4*cf.doppler_fft_size*cf.range_fft_size*args.batch/1e6:.0f} "
        f"MB f32/batch")

    # the headline JSON line goes to stdout IMMEDIATELY (if the extras
    # below hang or die, the driver still has the result) AND AGAIN as
    # the very last line of output (round 4's ~25 lines of variant
    # chatter pushed the early print out of the driver's 2000-char tail
    # window — BENCH_r04.json landed parsed:null despite rc=0; the
    # re-emit in the finally below guarantees the tail ends with the
    # JSON no matter how much the extras print)
    result = {
        "metric": "range-doppler-cfar-aoa detection rate (on-chip, frames resident in HBM, dft_precision=default under the speed-gate acceptance criterion)",
        "value": round(fps, 1),
        "unit": "frames/s/chip",
        "vs_baseline": round(fps / 1000.0, 3),
    }
    print(json.dumps(result), flush=True)
    # selected variant rates land in the final JSON re-emit too, so they
    # are driver-captured (round 4's stderr-only variant lines were not)
    extras: dict = {}

    # ---- optional extras (stderr only; never allowed to kill the
    # headline JSON line) ----------------------------------------------------
    # a SIGTERM (driver timeout) would normally terminate WITHOUT
    # running the finally below; convert it to SystemExit so the final
    # re-emit still lands in the tail window
    import signal

    signal.signal(signal.SIGTERM, lambda *_: sys.exit(1))
    try:
        # library-default 'high' quality mode (3-pass bf16, ~8e-6 vs
        # golden; the headline above is the promoted 1-pass speed mode)
        p = RDPipeline(cfg_high, 16)
        base_high = p.prepare_base(capture[0])
        fence(p.detect(batch_dev, base_high))
        t0 = time.perf_counter()
        outs = [p.detect(batch_dev, base_high) for _ in range(n_batches)]
        fence([o.power for o in outs])
        dt = (time.perf_counter() - t0) / n_batches
        log(f"quality mode dft_precision=high (3-pass bf16, ~8e-6 vs "
            f"golden): {1000*dt:.2f} ms/{args.batch} = {args.batch/dt:.0f} fps")
        extras["high_mode_fps"] = round(args.batch / dt, 1)

        # loop depth aligned with the headline (n_batches per fence) so
        # variant numbers are directly comparable
        variants = [
            ("mega", "xla"),
            ("fused", "xla"),
            ("fused", "pallas"),
            ("fused-pallas", "xla"),
            ("planar", "xla"),
            ("mxu", "pallas"),
            ("fft", "pallas"),
        ]
        for rd, cfi in variants:
            p = RDPipeline(cfg, 16, cfar_impl=cfi, rd_impl=rd)
            fence(p.detect(batch_dev, base))
            t0 = time.perf_counter()
            outs = [p.detect(batch_dev, base) for _ in range(n_batches)]
            fence([o.power for o in outs])
            dt = (time.perf_counter() - t0) / n_batches
            log(f"variant rd={rd} cfar={cfi}: {1000*dt:.2f} ms/{args.batch} "
                f"frames = {args.batch/dt:.0f} fps")

        # MTI clutter mode: the pulse canceller rides as a host-side fold
        # into the Doppler DFT constants (megakernel._plan), so this
        # should match the headline within noise -- no base frame needed
        cfg_mti = RadarConfig(clutter_mode="mti2")
        p = RDPipeline(cfg_mti, 16, use_base_frame=False)
        fence(p.detect(batch_dev, None))
        t0 = time.perf_counter()
        outs = [p.detect(batch_dev, None) for _ in range(n_batches)]
        fence([o.power for o in outs])
        dt = (time.perf_counter() - t0) / n_batches
        log(f"variant clutter_mode=mti2 (canceller folded into the Doppler "
            f"constants, no base frame): {1000*dt:.2f} ms/{args.batch} = "
            f"{args.batch/dt:.0f} fps")
        extras["mti2_fps"] = round(args.batch / dt, 1)

        # non-coherent integration (x4, Erlang-matched alpha): the
        # power-only mega kernel + reshape-sum + band CFAR + tail; one
        # detection set per 4 frames
        p = RDPipeline(cfg, 16)
        fence(p.detect_integrated(batch_dev, base, 4))
        t0 = time.perf_counter()
        outs = [p.detect_integrated(batch_dev, base, 4)
                for _ in range(n_batches)]
        fence([o.power for o in outs])
        dt = (time.perf_counter() - t0) / n_batches
        log(f"variant detect_integrated n=4 (NCI, Erlang-matched alpha): "
            f"{1000*dt:.2f} ms/{args.batch} frames = {args.batch/dt:.0f} "
            f"fps ({args.batch//4} detection sets)")
        extras["nci4_fps"] = round(args.batch / dt, 1)

        # exact (stride-1) OS-CFAR via the Pallas box-count hits kernel:
        # the full 248-cell ring, no decimation (golden truth
        # radar_tpu/golden.py:313; upgraded detector for the reference's
        # argmax at acceleration.cu:522)
        cfg_os = RadarConfig(cfar_kind="os")
        p = RDPipeline(cfg_os, 16)  # auto: mega power kernel + Pallas OS kernel
        base_os = p.prepare_base(capture[0])
        fence(p.detect(batch_dev, base_os))
        t0 = time.perf_counter()
        outs = [p.detect(batch_dev, base_os) for _ in range(n_batches)]
        fence([o.power for o in outs])
        dt = (time.perf_counter() - t0) / n_batches
        log(f"variant cfar_kind=os stride=1 (exact Pallas box-count hits "
            f"kernel): {1000*dt:.2f} ms/{args.batch} = {args.batch/dt:.0f} "
            f"fps")
        extras["os_cfar_fps"] = round(args.batch / dt, 1)

        # reference-parity range-only pipeline
        rdet = RangeDetector(cfg)
        base_rx0 = rdet.prepare_base(capture[0])
        fence(rdet.detect(batch_dev, base_rx0))
        t0 = time.perf_counter()
        outs = [rdet.detect(batch_dev, base_rx0) for _ in range(n_batches)]
        fence([o.peak_bin for o in outs])
        dt = (time.perf_counter() - t0) / n_batches
        log(f"range-parity (16K FFT + argmax): {1000*dt:.2f} ms/{args.batch} "
            f"= {args.batch/dt:.0f} fps")

        # ingest: (a) pure transport, (b) on-chip compute, (c) sustained
        # end-to-end with upload/compute overlap + donated input buffers.
        # Root-caused in round 3: jax.device_put is ASYNC on this relay
        # (returns in ~10 ms; transfers proceed behind dispatches) and
        # compute (~5 ms/batch) hides entirely behind ~seconds of
        # transport — but the relay's bandwidth drifts up to 11x between
        # CONSECUTIVE identical uploads (measured 0.9 s vs 10.1 s for the
        # same 39 MB in one process), so a single-sample overlap ratio is
        # noise: round 2's "0.45" was a drifting denominator, not failed
        # overlap.  (a) is therefore measured TWICE, sandwiching (c), and
        # the ratio uses their mean with the drift band printed alongside.
        if not args.skip_h2d:
            n_up = 3
            chunk = capture[1 : 1 + min(args.batch, 128)]
            mb = chunk.nbytes / 1e6

            def transport():
                t0 = time.perf_counter()
                ups = [jax.device_put(chunk) for _ in range(n_up)]
                fence([jnp.sum(jnp.max(u, axis=-1)) for u in ups])
                return time.perf_counter() - t0

            fence(pipe.detect_donated(jax.device_put(chunk), base))  # compile
            t_a1 = transport()
            t0 = time.perf_counter()
            buf = jax.device_put(chunk)
            outs = []
            for i in range(n_up):
                nxt = jax.device_put(chunk) if i + 1 < n_up else None
                outs.append(pipe.detect_donated(buf, base))  # buf consumed
                buf = nxt  # upload of batch i+1 overlaps compute of batch i
            fence([o.power for o in outs])
            t_c = time.perf_counter() - t0
            t_a2 = transport()

            # ring-depth sweep: does a deeper upload ring (more in-flight
            # device_put futures ahead of compute) change the overlap?
            # On a transport that serializes H2D with compute, depth is
            # irrelevant; on one that pipelines, deeper rings should
            # approach the pure-transport floor.  n_sweep > max depth so
            # every depth runs a DISTINCT schedule (depth 1 = fully
            # serial floor; a sweep capped at the batch count would
            # silently re-measure the same ring and fabricate the trend).
            n_sweep = 5
            for depth in (1, 2, 4):
                t0 = time.perf_counter()
                ring = [jax.device_put(chunk) for _ in range(depth)]
                outs_d = []
                up_next = len(ring)
                while ring:
                    outs_d.append(pipe.detect_donated(ring.pop(0), base))
                    if up_next < n_sweep:
                        ring.append(jax.device_put(chunk))
                        up_next += 1
                fence([o.power for o in outs_d])
                dt_d = time.perf_counter() - t0
                log(f"ingest: ring depth {depth}: {dt_d:.2f}s = "
                    f"{n_sweep*len(chunk)/dt_d:.0f} fps end-to-end "
                    f"({n_sweep} batches)")

            t_a = (t_a1 + t_a2) / 2
            t_b = n_up * len(chunk) / fps
            log(f"ingest: (a) transport {n_up}x{mb:.0f} MB: {t_a1:.2f}s "
                f"before / {t_a2:.2f}s after (relay drift band "
                f"{min(t_a1,t_a2)/max(t_a1,t_a2):.2f}x); mean "
                f"{n_up*mb/t_a:.0f} MB/s (production PCIe >> the 205 MB/s "
                f"that 1000 fps needs)")
            log(f"ingest: (b) on-chip compute for the same frames: {t_b:.3f}s")
            log(f"ingest: (c) sustained overlapped+donated end-to-end: "
                f"{t_c:.2f}s = {n_up*len(chunk)/t_c:.0f} fps end-to-end; "
                f"c/max(mean_a,b) = {t_c/max(t_a, t_b):.2f} (1.0 = perfect "
                f"overlap; <1 happens when the relay drifts faster "
                f"mid-sandwich)")
            log("ingest: (XLA warns the donation is unusable for aliasing "
                "— the outputs are far smaller than the int16 input, so "
                "there is nothing to alias INTO; donation still releases "
                "each consumed buffer, which is its purpose here: ring "
                "memory stays bounded at 2 in-flight cubes)")
    except Exception as e:  # transient transport failures are non-fatal
        log(f"optional bench sections skipped: {type(e).__name__}: {e}")
    finally:
        # FINAL line of the whole run = the headline JSON, so a tail
        # window of any reasonable size captures it (see comment above)
        sys.stderr.flush()
        print(json.dumps({**result, **extras}), flush=True)


if __name__ == "__main__":
    main()
