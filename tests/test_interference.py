"""Interference blanking: twin exactness, no-op on clean data, and the
end-to-end rescue of a jammed capture."""

import jax.numpy as jnp
import numpy as np
import pytest

from radar_tpu.config import RadarConfig
from radar_tpu.io.synthetic import SceneTarget, synthesize_capture
from radar_tpu.ops.interference import (
    blank_interference,
    golden_blank_interference,
)

TARGETS = [
    SceneTarget(range_m=5.0, velocity_mps=2.0, azimuth_deg=15.0,
                amplitude=2000.0),
    SceneTarget(range_m=9.0, velocity_mps=-1.0, azimuth_deg=-30.0,
                amplitude=1500.0),
]


def test_blanking_twin_bit_exact():
    cfg = RadarConfig()
    cap = synthesize_capture(TARGETS, 4, cfg, noise_std=10.0, seed=5,
                             interference_bursts=10)
    got, n_got = blank_interference(jnp.asarray(cap))
    want, n_want = golden_blank_interference(cap)
    np.testing.assert_array_equal(np.asarray(got), want)
    np.testing.assert_array_equal(np.asarray(n_got), n_want)
    assert n_want[1:].sum() > 0          # the bursts were caught
    assert n_want[0] == 0                # the base frame stays clean


def test_blanking_noop_on_clean_capture():
    cfg = RadarConfig()
    cap = synthesize_capture(TARGETS, 4, cfg, noise_std=10.0, seed=5)
    out, n_bl = blank_interference(jnp.asarray(cap))
    assert int(np.asarray(n_bl).sum()) == 0
    np.testing.assert_array_equal(np.asarray(out), cap)


def test_blanking_rescues_jammed_detection():
    """Strong interference corrupts the RD map; blanking restores the
    clean capture's detections."""
    from radar_tpu.models.rd_pipeline import RDPipeline

    cfg = RadarConfig()
    clean = synthesize_capture(TARGETS, 5, cfg, noise_std=5.0, seed=9)
    jam = synthesize_capture(TARGETS, 5, cfg, noise_std=5.0, seed=9,
                             interference_bursts=30,
                             interference_amplitude=25000.0)
    pipe = RDPipeline(cfg, max_detections=16)
    base = pipe.prepare_base(jnp.asarray(clean[0]))

    def top2_bins(cap):
        out = pipe.detect(jnp.asarray(cap[1:]), base)
        r = np.asarray(out.range_bin)
        v = np.asarray(out.valid)
        return [set(r[f][v[f]][:2]) for f in range(r.shape[0])]

    want = top2_bins(clean)
    fixed_cap, n_bl = blank_interference(jnp.asarray(jam))
    assert int(np.asarray(n_bl)[1:].sum()) > 0
    got = top2_bins(np.asarray(fixed_cap))
    # every frame's top-2 range bins match the clean capture's
    assert got == want
    # and the jammed map really was corrupted: off-target energy from
    # the bursts dwarfs the blanked map's residual (probe: ~290x summed,
    # ~50x peak with ALL clean detections' range neighborhoods masked)
    from radar_tpu.ops.fuseddft import fused_rd_planes

    def power_map(frames):
        dr, di = fused_rd_planes(jnp.asarray(frames), base, cfg)
        return np.asarray((dr * dr + di * di).sum(axis=-3))

    p_jam = power_map(jam[1:2])
    p_fix = power_map(np.asarray(fixed_cap)[1:2])
    out_c = pipe.detect(jnp.asarray(clean[1:2]), base)
    r_all = np.asarray(out_c.range_bin)[np.asarray(out_c.valid)]
    mask = np.ones(p_jam.shape[-1], bool)
    for b in r_all:
        mask[max(0, int(b) - 5) : int(b) + 6] = False
    assert p_jam[..., mask].sum() > 20 * p_fix[..., mask].sum()


def test_cli_detect_blank_interference(tmp_path, capsys):
    from radar_tpu.cli import main
    from radar_tpu.io.capture import write_capture

    cfg = RadarConfig()
    cap = synthesize_capture(TARGETS, 4, cfg, noise_std=5.0, seed=9,
                             interference_bursts=10)
    p = tmp_path / "jam.bin"
    write_capture(str(p), cap)
    out = tmp_path / "dets.jsonl"
    rc = main(["detect", str(p), "--full", "--blank-interference",
               "--out", str(out)])
    assert rc == 0
    assert out.exists()


def test_interference_with_rx_imbalance_encodes(cfg):
    """Review regression: the channel response applies BEFORE the ADC
    clip, so a gain > 1 channel on a saturated (jammed) cube must still
    encode to int16."""
    import numpy as np

    from radar_tpu.io.capture import encode_frame
    from radar_tpu.io.synthetic import SceneTarget, synthesize_cube

    resp = np.array([1.0, 1.26 * np.exp(1j * 0.6),
                     0.79 * np.exp(-1j * 0.7), 1.12 * np.exp(-1j * 0.3)])
    cube = synthesize_cube(
        [SceneTarget(range_m=4.0, amplitude=2000.0)], 3, cfg,
        interference_bursts=6, interference_amplitude=30000.0,
        rx_response=resp, seed=2,
    )
    shorts = encode_frame(cube, cfg)  # must not raise
    assert shorts.dtype == np.int16
