"""Detection-performance evaluation: Pd / Pfa curves for the CFAR family.

The reference has no evaluation story at all — its detector is an argmax
whose output is eyeballed (/root/reference/acceleration.cu:518-533).  A
detector that emits thresholded detections needs the two numbers that
characterize it: probability of detection (Pd) at a given target
strength and the realized false-alarm rate (Pfa) on target-free data —
the latter is the closed loop on every `cfar_alpha`/`go_so_cfar_alpha`
derivation in this repo (the solved alpha should REPRODUCE cfg.cfar_pfa
on exponential noise).

Methodology:

* Pfa: synthesize target-free frames (noise only), run the full
  pipeline, and count CFAR hits per cell via ``RDResult.num_hits``
  (the kernel's full-map count, not the top-K cap).  With clutter
  removal subtracting a same-distribution base frame the residual is
  noise-like, so the measured rate lands within small factors of
  cfg.cfar_pfa — not exactly: the map cells are FFT-correlated by the
  Hann window, which the standard CFAR derivation ignores.
* Pd: per amplitude point, synthesize frames with one target of known
  (range, velocity), run the pipeline, and score a detection when any
  valid output cell lands within ``tol_bins`` of the ground-truth
  (doppler, range) cell.

Consumed by ``cli eval`` and ``tests/test_evaluate.py``.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from radar_tpu.config import LIGHT_SPEED, DEFAULT_CONFIG, RadarConfig


def expected_bins(
    range_m: float, velocity_mps: float, cfg: RadarConfig = DEFAULT_CONFIG
) -> tuple[int, int]:
    """Ground-truth (doppler_bin, range_bin) for a target — the inverse
    of ``models.rd_pipeline.cell_physics``."""
    rng_hz = range_m * 2.0 * cfg.slope_hz_per_s / LIGHT_SPEED
    r_bin = rng_hz / (cfg.sample_rate_hz / cfg.range_fft_size)
    dopp_hz = velocity_mps / (cfg.wavelength_m / 2.0)
    d_bin = dopp_hz * cfg.doppler_fft_size * cfg.slow_time_interval_s
    d_bin += cfg.doppler_fft_size // 2
    return int(round(d_bin)), int(round(r_bin))


@dataclass(frozen=True)
class EvalPoint:
    amplitude: float
    pd: float
    frames: int
    mean_hits: float


def measure_pfa(
    cfg: RadarConfig = DEFAULT_CONFIG,
    frames: int = 32,
    noise_std: float = 20.0,
    seed: int = 0,
    max_detections: int = 16,
    rd_impl: str = "auto",
) -> dict:
    """Realized false-alarm rate on target-free frames.

    Returns {'pfa_measured', 'pfa_configured', 'cells', 'hits'}.
    """
    import jax.numpy as jnp

    from radar_tpu.io.synthetic import synthesize_capture
    from radar_tpu.models.rd_pipeline import RDPipeline

    cap = synthesize_capture([], frames + 1, cfg, noise_std=noise_std,
                             seed=seed)
    pipe = RDPipeline(cfg, max_detections=max_detections, rd_impl=rd_impl)
    base = pipe.prepare_base(jnp.asarray(cap[0]))
    out = pipe.detect(jnp.asarray(cap[1:]), base)
    hits = int(np.asarray(out.num_hits).sum())
    cells = frames * cfg.doppler_fft_size * cfg.range_fft_size
    return {
        "pfa_measured": hits / cells,
        "pfa_configured": cfg.cfar_pfa,
        "cells": cells,
        "hits": hits,
    }


def pd_curve(
    cfg: RadarConfig = DEFAULT_CONFIG,
    amplitudes: tuple[float, ...] = (20.0, 40.0, 80.0, 160.0, 320.0),
    frames: int = 32,
    noise_std: float = 20.0,
    range_m: float = 6.0,
    velocity_mps: float = 2.0,
    azimuth_deg: float = 10.0,
    tol_bins: tuple[int, int] = (1, 1),
    seed: int = 0,
    max_detections: int = 16,
    rd_impl: str = "auto",
) -> list[EvalPoint]:
    """Pd over target amplitude for one target geometry.

    A frame scores as detected when any VALID output detection lands
    within ``tol_bins`` (doppler, range) of the ground-truth cell.
    """
    import jax.numpy as jnp

    from radar_tpu.io.synthetic import SceneTarget, synthesize_capture
    from radar_tpu.models.rd_pipeline import RDPipeline

    d_true, r_true = expected_bins(range_m, velocity_mps, cfg)
    pipe = RDPipeline(cfg, max_detections=max_detections, rd_impl=rd_impl)
    points = []
    for i, amp in enumerate(amplitudes):
        cap = synthesize_capture(
            [SceneTarget(range_m=range_m, velocity_mps=velocity_mps,
                         azimuth_deg=azimuth_deg, amplitude=float(amp))],
            frames + 1, cfg, noise_std=noise_std, seed=seed + 17 * i,
        )
        base = pipe.prepare_base(jnp.asarray(cap[0]))
        out = pipe.detect(jnp.asarray(cap[1:]), base)
        valid = np.asarray(out.valid)
        d_bin = np.asarray(out.doppler_bin)
        r_bin = np.asarray(out.range_bin)
        ok = (
            valid
            & (np.abs(d_bin - d_true) <= tol_bins[0])
            & (np.abs(r_bin - r_true) <= tol_bins[1])
        )
        points.append(EvalPoint(
            amplitude=float(amp),
            pd=float(ok.any(axis=-1).mean()),
            frames=frames,
            mean_hits=float(np.asarray(out.num_hits).mean()),
        ))
    return points


def object_metrics(
    cfg: RadarConfig = DEFAULT_CONFIG,
    ranges_m: tuple[float, ...] = (3.0, 8.0),
    velocities_mps: tuple[float, ...] = (2.0, -4.0),
    amplitude: float = 2500.0,
    frames: int = 16,
    noise_std: float = 5.0,
    seed: int = 0,
    max_detections: int = 16,
    rd_impl: str = "auto",
    tol_range_m: float = 1.0,
    tol_velocity_mps: float = 1.0,
) -> dict:
    """Object-level scoring of the clustering stage (``ops.cluster``).

    The cell-level Pd above says "some cell near the truth fired"; a
    tracker consumer cares about the OBJECT list: how many distinct
    objects were reported (vs the true count — raw top-K lists carry
    several cells per blob), and how accurate each object's centroid is.

    Per frame: cluster representatives are greedily matched to the true
    targets within (tol_range_m, tol_velocity_mps); a matched target
    counts toward ``object_pd``, and matched centroids accumulate the
    range/velocity RMSE.

    Returns {'object_pd', 'mean_objects', 'true_objects',
    'mean_valid_detections' (pre-grouping, for the dedupe ratio),
    'range_rmse_m', 'velocity_rmse_mps', 'frames'}.
    """
    import jax.numpy as jnp

    from radar_tpu.io.synthetic import SceneTarget, synthesize_capture
    from radar_tpu.models.rd_pipeline import RDPipeline

    targets = [
        SceneTarget(range_m=r, velocity_mps=v, azimuth_deg=0.0,
                    amplitude=amplitude)
        for r, v in zip(ranges_m, velocities_mps)
    ]
    cap = synthesize_capture(targets, frames + 1, cfg, noise_std=noise_std,
                             seed=seed)
    pipe = RDPipeline(cfg, max_detections=max_detections, rd_impl=rd_impl)
    base = pipe.prepare_base(jnp.asarray(cap[0]))
    out, cl = pipe.detect_objects(jnp.asarray(cap[1:]), base)

    valid = np.asarray(out.valid)
    cid = np.asarray(cl.cluster_id)
    c_r = np.asarray(cl.centroid_range_m)
    c_v = np.asarray(cl.centroid_velocity_mps)
    k_idx = np.arange(valid.shape[-1])

    matched = 0
    sq_r = []
    sq_v = []
    n_objects = []
    for b in range(valid.shape[0]):
        reps = [k for k in k_idx if valid[b, k] and cid[b, k] == k]
        n_objects.append(len(reps))
        free = set(reps)
        for r_true, v_true in zip(ranges_m, velocities_mps):
            best = None
            for k in free:
                dr = abs(c_r[b, k] - r_true)
                dv = abs(c_v[b, k] - v_true)
                if dr <= tol_range_m and dv <= tol_velocity_mps:
                    if best is None or dr < abs(c_r[b, best] - r_true):
                        best = k
            if best is not None:
                free.discard(best)
                matched += 1
                sq_r.append((c_r[b, best] - r_true) ** 2)
                sq_v.append((c_v[b, best] - v_true) ** 2)
    n_true = len(targets) * valid.shape[0]
    return {
        "ranges_m": list(ranges_m),
        "velocities_mps": list(velocities_mps),
        "amplitude": amplitude,
        "noise_std": noise_std,
        "object_pd": matched / max(1, n_true),
        "mean_objects": float(np.mean(n_objects)),
        "true_objects": len(targets),
        "mean_valid_detections": float(valid.sum(axis=-1).mean()),
        "range_rmse_m": float(np.sqrt(np.mean(sq_r))) if sq_r else None,
        "velocity_rmse_mps": float(np.sqrt(np.mean(sq_v))) if sq_v else None,
        "frames": frames,
    }
