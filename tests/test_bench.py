"""bench.py smoke test (CPU backend) — the driver runs this on real TPU."""

import json
import sys

import numpy as np
import pytest


def test_bench_main_emits_json_line(monkeypatch, capsys):
    import bench

    monkeypatch.setattr(
        sys, "argv",
        ["bench.py", "--frames", "32", "--batch", "16", "--reps", "1",
         "--skip-h2d", "--wait-device", "0"],
    )
    bench.main()
    out = capsys.readouterr().out.strip().splitlines()
    rec = json.loads(out[-1])
    # the final re-emit may carry extra driver-captured variant fields
    # (speed_mode_fps, os_cfar_fps) on top of the required four
    assert {"metric", "value", "unit", "vs_baseline"} <= set(rec)
    assert rec["value"] > 0
    # the headline is ALSO printed early (before the extras), so a
    # hang in the extras can never lose it; both copies agree
    early = json.loads(out[0])
    assert early["value"] == rec["value"]
    # both fields are independently rounded from the raw fps
    assert rec["vs_baseline"] == pytest.approx(rec["value"] / 1000.0, abs=1e-3)


def test_detect_sharded_matches_local(cfg, capture):
    from radar_tpu.models.range_detector import RangeDetector
    from radar_tpu.parallel.mesh import build_mesh

    det = RangeDetector(cfg)
    base = det.prepare_base(capture[0])
    want = det.detect(capture[1:9], base)

    mesh = build_mesh(n_devices=8, num_rx=1)  # pure-DP 8-way mesh
    got = det.detect_sharded(capture[1:9], base, mesh)
    np.testing.assert_array_equal(
        np.asarray(got.peak_bin), np.asarray(want.peak_bin)
    )
    assert len(got.peak_bin.sharding.device_set) == 8
