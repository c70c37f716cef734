#!/usr/bin/env python
"""Micro-benchmark: exact (stride-1) OS-CFAR threshold-map formulations.

Round-2 shipped OS-CFAR at 118 fps full-pipeline for stride 1 (the exact
mode): a per-frame ``lax.map`` building a 248-slice ring gather on the
minor axis + a width-248 minor-axis sort.  This script races exact
reformulations on the real TPU to pick the round-3 production form:

  current        : round-2 formulation (baseline)
  ring-ax0-c8    : ring stacked on a NON-minor axis (sort = vectorized
                   compare-exchange network across lanes), 8-frame chunks
  patches-sort   : one conv_general_dilated_patches HLO builds all 273
                   window cells; guards masked +inf; non-minor sort
  patches-topk   : patches + lax.top_k for the (N-k+1)-th largest --
                   rank selection instead of a full sort
  ring-topk-c8   : 248 static slices on minor axis + top_k (no patches)

Every variant is verified against radar_tpu.golden.os_cfar_2d before it
is timed.  Usage:  python scripts/os_cfar_bench.py [--frames 512]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def build_offsets(cfg):
    from radar_tpu.ops.cfar import os_ring_params

    gd, gr = cfg.cfar_guard
    td, tr = cfg.cfar_train
    wd, wr = gd + td, gr + tr
    return wd, wr, os_ring_params(cfg)[0]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=512)
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from radar_tpu import golden
    from radar_tpu.config import RadarConfig
    from radar_tpu.utils.timing import fence

    cfg = RadarConfig()
    gd, gr = cfg.cfar_guard
    wd, wr, offsets = build_offsets(cfg)
    n_train = len(offsets)
    k = max(1, min(n_train, int(np.floor(cfg.cfar_os_k_frac * n_train + 0.5))))
    m = n_train - k + 1  # rank from the top
    alpha = np.float32(golden.os_cfar_alpha(n_train, k, cfg.cfar_pfa))
    D, R = cfg.doppler_fft_size, cfg.range_fft_size
    win_d, win_r = 2 * wd + 1, 2 * wr + 1
    print(f"device={jax.devices()[0]} map {D}x{R} window {win_d}x{win_r} "
          f"n_train={n_train} k={k} m={m}", flush=True)

    rng = np.random.default_rng(0)
    power = rng.gamma(2.0, 100.0, size=(args.frames, D, R)).astype(np.float32)

    # guard mask in conv_general_dilated_patches channel order: for a
    # single input channel the patch channels iterate the filter spatial
    # positions row-major (verified by test_ops.py::test_patches_order)
    guard_flags = np.array(
        [abs(dd - wd) <= gd and abs(dr - wr) <= gr
         for dd in range(win_d) for dr in range(win_r)]
    )

    def pad_map(p):
        lead = [(0, 0)] * (p.ndim - 2)
        p = jnp.pad(p, lead + [(wd, wd), (0, 0)], mode="wrap")
        return jnp.pad(p, lead + [(0, 0), (wr, wr)], mode=cfg.cfar_range_mode)

    # ---- variant impls (power (B,D,R) -> threshold (B,D,R)) -------------
    def v_current(p):
        def one_map(pm):
            padded = pad_map(pm)
            ring = jnp.stack(
                [jax.lax.dynamic_slice(padded, (wd + dd, wr + dr), (D, R))
                 for dd, dr in offsets], axis=-1)
            return alpha * jnp.sort(ring, axis=-1)[..., k - 1]
        return jax.lax.map(one_map, p)

    def chunked(fn, chunk):
        def run(p):
            ch = p.reshape(-1, chunk, D, R)
            return jax.lax.map(fn, ch).reshape(p.shape)
        return run

    def ring_ax0(pc):  # (F, D, R) chunk
        padded = pad_map(pc)
        ring = jnp.stack(
            [padded[:, wd + dd: wd + dd + D, wr + dr: wr + dr + R]
             for dd, dr in offsets], axis=1)  # (F, 248, D, R)
        return alpha * jnp.sort(ring, axis=1)[:, k - 1]

    def patches(pc):
        padded = pad_map(pc)[:, None]  # (F, 1, D+2wd, R+2wr)
        pat = jax.lax.conv_general_dilated_patches(
            padded, (win_d, win_r), (1, 1), "VALID")  # (F, 273, D, R)
        return pat

    inf_mask = jnp.asarray(guard_flags)[None, :, None, None]

    def patches_sort(pc):
        pat = jnp.where(inf_mask, jnp.inf, patches(pc))
        return alpha * jnp.sort(pat, axis=1)[:, k - 1]

    def patches_topk(pc):
        pat = jnp.where(inf_mask, -jnp.inf, patches(pc))
        x = jnp.moveaxis(pat, 1, -1)  # (F, D, R, 273)
        return alpha * jax.lax.top_k(x, m)[0][..., m - 1]

    def ring_topk(pc):
        padded = pad_map(pc)
        ring = jnp.stack(
            [padded[:, wd + dd: wd + dd + D, wr + dr: wr + dr + R]
             for dd, dr in offsets], axis=-1)  # (F, D, R, 248)
        return alpha * jax.lax.top_k(ring, m)[0][..., m - 1]

    variants = {
        "current": (v_current, 2),
        "ring-ax0-c8": (chunked(ring_ax0, 8), args.iters),
        "ring-ax0-c32": (chunked(ring_ax0, 32), args.iters),
        "patches-sort-c8": (chunked(patches_sort, 8), args.iters),
        "patches-sort-c32": (chunked(patches_sort, 32), args.iters),
        "patches-topk-c8": (chunked(patches_topk, 8), args.iters),
        "patches-topk-c32": (chunked(patches_topk, 32), args.iters),
        "ring-topk-c8": (chunked(ring_topk, 8), args.iters),
    }

    # golden truth on a small slice
    _, want = golden.os_cfar_2d(
        power[:4].astype(np.float64), cfg.cfar_guard, cfg.cfar_train,
        cfg.cfar_pfa, cfg.cfar_os_k_frac, cfg.cfar_range_mode,
        n_pulses=cfg.cfar_pulses_effective)

    p_dev = jax.device_put(power)
    p_small = jax.device_put(power[:8])  # chunk-compatible small batch
    fence(p_dev)
    for name, (fn, iters) in variants.items():
        jfn = jax.jit(fn)
        try:
            got = np.asarray(jfn(p_small))[:4]
            rel = np.max(np.abs(got - want) / np.maximum(np.abs(want), 1e-9))
            ok = "OK " if rel < 1e-3 else f"BAD rel={rel:.2e} "
            t0 = time.perf_counter()
            fence(jfn(p_dev))  # compile at full size
            comp = time.perf_counter() - t0
            t0 = time.perf_counter()
            outs = [jfn(p_dev) for _ in range(iters)]
            fence(outs)
            dt = (time.perf_counter() - t0) / iters
            print(f"{name:18s} {ok} {1000*dt:8.2f} ms/{args.frames} = "
                  f"{args.frames/dt:8.0f} fps  (compile {comp:.1f}s, "
                  f"rel {rel:.1e})", flush=True)
        except Exception as e:
            print(f"{name:18s} FAILED: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
