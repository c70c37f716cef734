"""Parity tests for the raw->power(+CFAR) Pallas mega-kernel.

``rd_impl='mega'`` collapses the whole shorts -> range DFT -> Doppler DFT
-> power -> CA-CFAR-threshold prefix into one Pallas kernel
(ops/pallas/megakernel.py) and recomputes AoA snapshots from the raw
frames.  These tests run the kernel in interpret mode on CPU and check
it against the fused XLA path (itself golden-verified in
test_pipeline.py): detections exact, power to f32 roundoff, the
band-matrix CFAR threshold against ``ca_cfar_2d``.

Reference contract being upgraded: the single argmax detector at
/root/reference/acceleration.cu:522 with every intermediate materialized
(acceleration.cu:435-519).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from radar_tpu.config import RadarConfig
from radar_tpu.io.synthetic import SceneTarget, synthesize_capture
from radar_tpu.models.rd_pipeline import RDPipeline


def _assert_same_detections(a, b, max_flips=0):
    """Slot-exact detection comparison.

    ``max_flips > 0`` tolerates that many detection-SET differences
    across the whole batch: cross-implementation pairs (mega kernel vs
    fused XLA) accumulate bf16 rounding in different orders, so a cell
    sitting ~1e-2 relative from its CFAR threshold can flip while the
    power maps agree to ~1e-6 of the global max (measured; the repo's
    within-family pairs stay bit-exact and pass ``max_flips=0``).
    Frames with zero flips are still compared slot-exactly."""
    av = np.asarray(a.valid).astype(bool)
    bv = np.asarray(b.valid).astype(bool)
    a_db, b_db = np.asarray(a.doppler_bin), np.asarray(b.doppler_bin)
    a_rb, b_rb = np.asarray(a.range_bin), np.asarray(b.range_bin)
    a_nh = np.asarray(a.num_hits)
    b_nh = np.asarray(b.num_hits)
    flips, clean = 0, []
    for f in range(av.shape[0]):
        sa = {(int(d), int(r))
              for d, r in zip(a_db[f][av[f]], a_rb[f][av[f]])}
        sb = {(int(d), int(r))
              for d, r in zip(b_db[f][bv[f]], b_rb[f][bv[f]])}
        # num_hits counts ALL CFAR hits, so a marginal cell that never
        # reaches the top-K slots still shows up here — count it as a
        # flip too
        n = len(sa ^ sb) + abs(int(a_nh[f]) - int(b_nh[f]))
        flips += n
        if n == 0:
            clean.append(f)
    assert flips <= max_flips, (
        f"{flips} detection-set flips across the batch "
        f"(allowed {max_flips})"
    )
    cl = np.asarray(clean, int)
    for fname in ("range_bin", "doppler_bin", "valid", "angle_bin",
                  "num_hits"):
        np.testing.assert_array_equal(
            np.asarray(getattr(a, fname))[cl],
            np.asarray(getattr(b, fname))[cl], err_msg=fname,
        )


@pytest.mark.parametrize("use_base", [True, False])
def test_mega_matches_fused(cfg, targets, use_base):
    """Power-only mega kernel + XLA CFAR vs the fused XLA path."""
    shorts = synthesize_capture(targets, 4, cfg, noise_std=2.0, seed=51)
    fused = RDPipeline(cfg, max_detections=8, rd_impl="fused",
                       cfar_impl="xla", use_base_frame=use_base)
    mega = RDPipeline(cfg, max_detections=8, rd_impl="mega",
                      cfar_impl="xla", use_base_frame=use_base)
    base = fused.prepare_base(jnp.asarray(shorts[0])) if use_base else None
    a = fused.detect(jnp.asarray(shorts[1:]), base)
    b = mega.detect(jnp.asarray(shorts[1:]), base)
    _assert_same_detections(a, b, max_flips=2)
    np.testing.assert_allclose(np.asarray(a.power), np.asarray(b.power),
                               rtol=2e-4, atol=1e-2)
    np.testing.assert_allclose(np.asarray(a.azimuth_deg),
                               np.asarray(b.azimuth_deg),
                               rtol=1e-4, atol=1e-3)


def test_mega_fused_cfar_threshold(cfg, targets):
    """In-kernel band-matrix CFAR (cfar_impl='auto') == ca_cfar_2d."""
    from radar_tpu.ops.cfar import ca_cfar_2d
    from radar_tpu.ops.pallas.megakernel import power_cfar_from_shorts_pallas

    shorts = synthesize_capture(targets, 4, cfg, noise_std=2.0, seed=52)
    pipe = RDPipeline(cfg, max_detections=8, rd_impl="mega")
    base = pipe.prepare_base(jnp.asarray(shorts[0]))
    power, thresh = power_cfar_from_shorts_pallas(
        jnp.asarray(shorts[1:]), base, cfg, interpret=True
    )
    hits_want, thresh_want = ca_cfar_2d(power, cfg)
    # both are f32 window sums over ~1e11-peak cells; sequential f32
    # accumulation-order noise leaves ~7e-4 relative near strong targets
    # (the BASELINE gate is 1e-3)
    np.testing.assert_allclose(np.asarray(thresh), np.asarray(thresh_want),
                               rtol=1e-3)
    # reassociation may flip only razor-edge cells
    differ = int(jnp.sum((power > thresh) != hits_want))
    assert differ <= 4

    # and the full pipeline with the fused CFAR finds the same targets
    xla = RDPipeline(cfg, max_detections=8, rd_impl="mega", cfar_impl="xla")
    a = xla.detect(jnp.asarray(shorts[1:]), base)
    b = pipe.detect(jnp.asarray(shorts[1:]), base)
    _assert_same_detections(a, b, max_flips=2)


def test_mega_cfar_range_wrap(targets):
    """Band-matrix CFAR honors cfar_range_mode='wrap'."""
    from radar_tpu.ops.cfar import ca_cfar_2d
    from radar_tpu.ops.pallas.megakernel import power_cfar_from_shorts_pallas

    cfg2 = RadarConfig(cfar_range_mode="wrap")
    shorts = synthesize_capture(targets, 3, cfg2, noise_std=2.0, seed=53)
    pipe = RDPipeline(cfg2, max_detections=8, rd_impl="mega")
    base = pipe.prepare_base(jnp.asarray(shorts[0]))
    power, thresh = power_cfar_from_shorts_pallas(
        jnp.asarray(shorts[1:]), base, cfg2, interpret=True
    )
    _, thresh_want = ca_cfar_2d(power, cfg2)
    np.testing.assert_allclose(np.asarray(thresh), np.asarray(thresh_want),
                               rtol=1e-3)


def test_mega_mimo(targets):
    """TDM-MIMO (num_tx=2): in-kernel demux must match the fused path."""
    cfg2 = RadarConfig(num_tx=2)
    shorts = synthesize_capture(targets, 3, cfg2, noise_std=2.0, seed=54)
    fused = RDPipeline(cfg2, max_detections=8, rd_impl="fused",
                       cfar_impl="xla")
    mega = RDPipeline(cfg2, max_detections=8, rd_impl="mega",
                      cfar_impl="xla")
    base = fused.prepare_base(jnp.asarray(shorts[0]))
    a = fused.detect(jnp.asarray(shorts[1:]), base)
    b = mega.detect(jnp.asarray(shorts[1:]), base)
    _assert_same_detections(a, b, max_flips=2)
    np.testing.assert_allclose(np.asarray(a.power), np.asarray(b.power),
                               rtol=2e-4, atol=1e-2)


def test_mega_os_cfar_falls_back(cfg, targets):
    """cfar_kind='os' under mega: power-only kernel + OS-CFAR dispatch."""
    cfg_os = RadarConfig(cfar_kind="os", cfar_os_stride=8)
    shorts = synthesize_capture(targets, 3, cfg_os, noise_std=2.0, seed=55)
    fused = RDPipeline(cfg_os, max_detections=8, rd_impl="fused",
                       cfar_impl="xla")
    mega = RDPipeline(cfg_os, max_detections=8, rd_impl="mega",
                      cfar_impl="xla")
    base = fused.prepare_base(jnp.asarray(shorts[0]))
    a = fused.detect(jnp.asarray(shorts[1:]), base)
    b = mega.detect(jnp.asarray(shorts[1:]), base)
    _assert_same_detections(a, b, max_flips=2)


@pytest.mark.parametrize("precision", ["highest", "default"])
def test_mega_precision_variants(cfg, targets, precision):
    """The kernel honors cfg.dft_precision; the strong target survives
    even at 1-pass bf16."""
    cfg_p = RadarConfig(dft_precision=precision)
    shorts = synthesize_capture(targets, 3, cfg_p, noise_std=2.0, seed=56)
    mega = RDPipeline(cfg_p, max_detections=8, rd_impl="mega",
                      cfar_impl="xla")
    base = mega.prepare_base(jnp.asarray(shorts[0]))
    out = mega.detect(jnp.asarray(shorts[1:]), base)
    assert int(np.asarray(out.num_hits).min()) > 0
    if precision == "highest":
        fused = RDPipeline(cfg_p, max_detections=8, rd_impl="fused",
                           cfar_impl="xla")
        _assert_same_detections(fused.detect(jnp.asarray(shorts[1:]), base),
                                out)


def test_mega_unbatched(cfg, targets):
    """A single unbatched frame keeps its scalar leading shape."""
    shorts = synthesize_capture(targets, 2, cfg, noise_std=2.0, seed=57)
    mega = RDPipeline(cfg, max_detections=8, rd_impl="mega",
                      cfar_impl="xla")
    base = mega.prepare_base(jnp.asarray(shorts[0]))
    out = mega.detect(jnp.asarray(shorts[1]), base)
    assert out.range_bin.shape == (8,)
    assert int(np.asarray(out.num_hits)) > 0


def test_snapshots_from_shorts_matches_gather(cfg, targets):
    """snapshots_from_shorts == gathering from materialized RD planes."""
    from radar_tpu.models.rd_pipeline import gather_snapshots
    from radar_tpu.ops.fuseddft import fused_rd_planes
    from radar_tpu.ops.pallas.megakernel import snapshots_from_shorts

    shorts = synthesize_capture(targets, 3, cfg, noise_std=2.0, seed=58)
    pipe = RDPipeline(cfg, max_detections=8, rd_impl="fused")
    base = pipe.prepare_base(jnp.asarray(shorts[0]))
    x = jnp.asarray(shorts[1:])
    dr, di = fused_rd_planes(x, base, cfg)
    power = jnp.sum(dr * dr + di * di, axis=-3)
    flat = power.reshape(power.shape[0], -1)
    top_idx = jax.lax.top_k(flat, 8)[1].astype(jnp.int32)
    want = jax.lax.complex(gather_snapshots(dr, top_idx),
                           gather_snapshots(di, top_idx))
    got = snapshots_from_shorts(x, base, top_idx, cfg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-2 * float(jnp.abs(want).max()))


def test_snapshots_from_shorts_mean_clutter(cfg, targets):
    """Mean-clutter mode of the snapshot recompute matches the planes."""
    from radar_tpu.models.rd_pipeline import gather_snapshots
    from radar_tpu.ops.fuseddft import fused_rd_planes
    from radar_tpu.ops.pallas.megakernel import snapshots_from_shorts

    shorts = synthesize_capture(targets, 3, cfg, noise_std=2.0, seed=59)
    x = jnp.asarray(shorts[1:])
    dr, di = fused_rd_planes(x, None, cfg)
    power = jnp.sum(dr * dr + di * di, axis=-3)
    flat = power.reshape(power.shape[0], -1)
    top_idx = jax.lax.top_k(flat, 8)[1].astype(jnp.int32)
    want = jax.lax.complex(gather_snapshots(dr, top_idx),
                           gather_snapshots(di, top_idx))
    got = snapshots_from_shorts(x, None, top_idx, cfg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-2 * float(jnp.abs(want).max()))

_EXACT_FIELDS = (
    "num_hits", "doppler_bin", "range_bin", "valid", "power", "range_m",
    "velocity_mps", "range_m_interp", "velocity_mps_interp",
)


@pytest.mark.parametrize("use_base", [True, False])
def test_mega_detect_variant_bit_exact(cfg, targets, use_base):
    """The fused detect kernel (selection + interp neighbors + snapshots
    in VMEM) is bit-identical to the maps + Pallas-top-K tail on every
    field except azimuth (snapshots gathered from the kernel's range
    planes instead of re-contracted from raw; ~1e-4 deg)."""
    shorts = synthesize_capture(targets, 4, cfg, noise_std=2.0, seed=91)
    det = RDPipeline(cfg, max_detections=8, rd_impl="mega-interpret",
                     use_base_frame=use_base)
    maps = RDPipeline(cfg, max_detections=8, rd_impl="mega-maps-interpret",
                      topk_impl="pallas-interpret", use_base_frame=use_base)
    base = det.prepare_base(jnp.asarray(shorts[0])) if use_base else None
    a = det.detect(jnp.asarray(shorts[1:]), base)
    b = maps.detect(jnp.asarray(shorts[1:]), base)
    for f in _EXACT_FIELDS:
        np.testing.assert_array_equal(
            np.asarray(getattr(a, f)), np.asarray(getattr(b, f)),
            err_msg=f,
        )
    np.testing.assert_allclose(np.asarray(a.azimuth_deg),
                               np.asarray(b.azimuth_deg), atol=1e-3)


def test_mega_detect_variant_mimo(targets):
    """Detect kernel under TDM-MIMO: demux + per-detection Doppler rows."""
    cfg2 = RadarConfig(num_tx=2)
    shorts = synthesize_capture(targets, 3, cfg2, noise_std=2.0, seed=92)
    det = RDPipeline(cfg2, max_detections=8, rd_impl="mega-interpret")
    maps = RDPipeline(cfg2, max_detections=8, rd_impl="mega-maps-interpret",
                      topk_impl="pallas-interpret")
    base = det.prepare_base(jnp.asarray(shorts[0]))
    a = det.detect(jnp.asarray(shorts[1:]), base)
    b = maps.detect(jnp.asarray(shorts[1:]), base)
    for f in _EXACT_FIELDS:
        np.testing.assert_array_equal(
            np.asarray(getattr(a, f)), np.asarray(getattr(b, f)),
            err_msg=f,
        )
    np.testing.assert_allclose(np.asarray(a.azimuth_deg),
                               np.asarray(b.azimuth_deg), atol=1e-3)


@pytest.mark.parametrize("kind", ["goca", "soca"])
def test_mega_detect_go_so_cfar(kind, targets):
    """GOCA/SOCA fused into the detect kernel (asymmetric band matmuls,
    round 4): bit-identical to the maps kernel + Pallas top-K tail
    (which shares the in-kernel threshold code), and detection-identical
    to the fused XLA pipeline with the einsum GO/SO path."""
    cfg2 = RadarConfig(cfar_kind=kind)
    shorts = synthesize_capture(targets, 4, cfg2, noise_std=2.0, seed=71)
    det = RDPipeline(cfg2, max_detections=8, rd_impl="mega-interpret")
    maps = RDPipeline(cfg2, max_detections=8, rd_impl="mega-maps-interpret",
                      topk_impl="pallas-interpret")
    fused = RDPipeline(cfg2, max_detections=8, rd_impl="fused")
    base = det.prepare_base(jnp.asarray(shorts[0]))
    a = det.detect(jnp.asarray(shorts[1:]), base)
    b = maps.detect(jnp.asarray(shorts[1:]), base)
    for f in _EXACT_FIELDS:
        np.testing.assert_array_equal(
            np.asarray(getattr(a, f)), np.asarray(getattr(b, f)),
            err_msg=f,
        )
    c = fused.detect(jnp.asarray(shorts[1:]), base)
    _assert_same_detections(a, c, max_flips=2)
    # and the two kinds genuinely differ (different thresholds)
    assert bool(np.asarray(a.num_hits).max() >= 1)


def test_mega_detect_exhausted_slots_match_topk(cfg):
    """With nearly-empty hit maps, exhausted slots must carry the same
    ascending untaken indices as lax.top_k (the e586119 bug class)."""
    shorts = synthesize_capture(
        [SceneTarget(5.0, 0.0, 0.0)], 3, cfg, noise_std=0.5, seed=93
    )
    det = RDPipeline(cfg, max_detections=32, rd_impl="mega-interpret")
    xla = RDPipeline(cfg, max_detections=32, rd_impl="mega-maps-interpret",
                     topk_impl="xla")
    base = det.prepare_base(jnp.asarray(shorts[0]))
    a = det.detect(jnp.asarray(shorts[1:]), base)
    b = xla.detect(jnp.asarray(shorts[1:]), base)
    assert not bool(np.asarray(a.valid).all())  # exhausted slots exist
    np.testing.assert_array_equal(np.asarray(a.range_bin),
                                  np.asarray(b.range_bin))
    np.testing.assert_array_equal(np.asarray(a.doppler_bin),
                                  np.asarray(b.doppler_bin))
    np.testing.assert_array_equal(np.asarray(a.valid), np.asarray(b.valid))


def test_mega_detect_k_above_lane_width_falls_back(cfg, targets):
    """max_detections > the detect kernel's 128-lane selection width must
    fall through to the maps path (the round-3 behavior) instead of
    raising from the kernel gate — rd_impl='mega'/'auto' stays usable at
    any K."""
    shorts = synthesize_capture(targets, 3, cfg, noise_std=2.0, seed=60)
    big = RDPipeline(cfg, max_detections=200, rd_impl="mega-interpret")
    twin = RDPipeline(cfg, max_detections=200,
                      rd_impl="mega-maps-interpret", topk_impl="xla")
    base = big.prepare_base(jnp.asarray(shorts[0]))
    a = big.detect(jnp.asarray(shorts[1:]), base)
    b = twin.detect(jnp.asarray(shorts[1:]), base)
    assert a.range_bin.shape[-1] == 200
    _assert_same_detections(a, b)


def test_mega_supported_gate(cfg):
    """With in-kernel range padding the old 128-lane gate is gone: any
    geometry whose single-frame working set fits scoped VMEM is
    supported (the reference's any-compile-time-geometry property,
    acceleration.cu:7-15); only VMEM-exceeding geometries fall back."""
    from radar_tpu.ops.pallas.megakernel import mega_supported

    assert mega_supported(cfg)
    assert mega_supported(RadarConfig(num_samples=256, num_chirps=128))
    # non-128-multiple range sizes now run (padded in-kernel)
    assert mega_supported(
        RadarConfig(num_samples=64, num_chirps=64, num_rx=2)
    )
    assert mega_supported(RadarConfig(num_samples=50, num_chirps=64))
    # a frame whose planes alone blow the 16 MB scoped-VMEM budget: no
    assert not mega_supported(
        RadarConfig(num_samples=2048, num_chirps=1024)
    )


@pytest.mark.parametrize("geom", [
    dict(num_samples=64, num_chirps=64, num_rx=2),   # R=64, pad to 128
    dict(num_samples=48, num_chirps=128),            # R=64, full chirps
])
def test_mega_padded_geometry_matches_fused(geom, targets):
    """Non-lane-aligned geometries through the padded mega kernel match
    the fused XLA path bit-for-bit on detections (pad cells carry exact
    zeros and can never become hits)."""
    cfg2 = RadarConfig(**geom)
    assert cfg2.range_fft_size % 128 != 0  # actually exercises padding
    shorts = synthesize_capture(targets, 3, cfg2, noise_std=2.0, seed=95)
    fused = RDPipeline(cfg2, max_detections=8, rd_impl="fused",
                       cfar_impl="xla")
    mega = RDPipeline(cfg2, max_detections=8, rd_impl="mega",
                      cfar_impl="xla")
    base = fused.prepare_base(jnp.asarray(shorts[0]))
    a = fused.detect(jnp.asarray(shorts[1:]), base)
    b = mega.detect(jnp.asarray(shorts[1:]), base)
    _assert_same_detections(a, b, max_flips=2)
    np.testing.assert_allclose(np.asarray(a.power), np.asarray(b.power),
                               rtol=2e-4, atol=1e-2)


def test_mega_detect_padded_geometry(targets):
    """The fused DETECT variant at a padded geometry: bit-exact vs the
    maps path on the same geometry (valid slots; exhausted-slot bins are
    clamped re-encodings and carry valid=False)."""
    cfg2 = RadarConfig(num_samples=64, num_chirps=64, num_rx=2)
    shorts = synthesize_capture(targets, 3, cfg2, noise_std=2.0, seed=96)
    det = RDPipeline(cfg2, max_detections=8, rd_impl="mega-interpret")
    maps = RDPipeline(cfg2, max_detections=8, rd_impl="mega-maps-interpret",
                      topk_impl="pallas-interpret")
    base = det.prepare_base(jnp.asarray(shorts[0]))
    a = det.detect(jnp.asarray(shorts[1:]), base)
    b = maps.detect(jnp.asarray(shorts[1:]), base)
    valid = np.asarray(b.valid)
    np.testing.assert_array_equal(np.asarray(a.valid), valid)
    np.testing.assert_array_equal(np.asarray(a.num_hits),
                                  np.asarray(b.num_hits))
    for f in ("doppler_bin", "range_bin", "power", "range_m_interp",
              "velocity_mps_interp"):
        ga, gb = np.asarray(getattr(a, f)), np.asarray(getattr(b, f))
        np.testing.assert_array_equal(ga[valid], gb[valid], err_msg=f)
    np.testing.assert_allclose(np.asarray(a.azimuth_deg)[valid],
                               np.asarray(b.azimuth_deg)[valid], atol=1e-3)


def test_mega_go_so_padded_geometry(targets):
    """GOCA at a non-lane-aligned geometry: the (2R, 6R) stage-2 stacked
    band operand is range-padded (pad cells get lead = lag = 0 over
    power 0 — never hits) and the padded kernel matches the fused XLA
    GO/SO path on detections."""
    cfg2 = RadarConfig(num_samples=64, num_chirps=64, num_rx=2,
                       cfar_kind="goca")
    assert cfg2.range_fft_size % 128 != 0  # actually exercises padding
    shorts = synthesize_capture(targets, 3, cfg2, noise_std=2.0, seed=97)
    fused = RDPipeline(cfg2, max_detections=8, rd_impl="fused",
                       cfar_impl="xla")
    mega = RDPipeline(cfg2, max_detections=8, rd_impl="mega-interpret")
    base = fused.prepare_base(jnp.asarray(shorts[0]))
    a = fused.detect(jnp.asarray(shorts[1:]), base)
    b = mega.detect(jnp.asarray(shorts[1:]), base)
    _assert_same_detections(a, b, max_flips=2)


def test_vmem_limit_knob(monkeypatch):
    """RADAR_TPU_VMEM_LIMIT_MB overrides the planned scoped-VMEM
    budget: mega_supported admits bigger geometries under a raised
    limit and the kernels request it via CompilerParams.  The default
    (env unset) is 32 MB — the round-4 sweep's winner — requested from
    Mosaic explicitly; the rows cap stays a HARD 8 at any budget
    (deeper tiling measured uniformly slower, see _rows_for)."""
    from radar_tpu.ops.pallas import megakernel as mk

    monkeypatch.delenv("RADAR_TPU_VMEM_LIMIT_MB", raising=False)
    t, p = mk._detect_vmem_parts(RadarConfig())
    assert mk._vmem_limit() == 32 << 20
    params = mk._compiler_params()
    assert params is not None and params.vmem_limit_bytes == 32 << 20
    assert mk._rows_for(t, p, 512) == 8
    big = RadarConfig(num_samples=2048, num_chirps=1024)
    assert not mk.mega_supported(big)
    # the heavy selftest geometry rides the default admission
    assert mk.mega_supported(RadarConfig(num_samples=256, num_chirps=256))

    # at Mosaic's own 16 MB ceiling no override is requested
    monkeypatch.setenv("RADAR_TPU_VMEM_LIMIT_MB", "16")
    assert mk._vmem_limit() == 16 << 20
    assert mk._compiler_params() is None
    assert mk._rows_for(t, p, 512) == 8

    monkeypatch.setenv("RADAR_TPU_VMEM_LIMIT_MB", "64")
    assert mk._vmem_limit() == 64 << 20
    params = mk._compiler_params()
    assert params is not None and params.vmem_limit_bytes == 64 << 20
    assert mk._rows_for(t, p, 512) == 8   # cap does NOT scale

    # a limit just above the big geometry's working set admits it
    need = max(sum(mk._maps_vmem_parts(big)), sum(mk._detect_vmem_parts(big)))
    monkeypatch.setenv("RADAR_TPU_VMEM_LIMIT_MB", str((need >> 20) + 1))
    assert mk.mega_supported(big)


def test_mega_detect_rows16_parity(cfg, targets):
    """Deeper frame tiling (rows=16, reachable under a raised VMEM
    limit) is a pure schedule change: every detect-kernel output is
    bit-identical to the shipped rows=8 tiling."""
    from radar_tpu.ops.pallas.megakernel import detections_from_shorts_pallas

    cfg2 = RadarConfig(num_samples=64, num_chirps=32, num_rx=2)
    shorts = jnp.asarray(
        synthesize_capture(targets, 33, cfg2, noise_std=5.0, seed=0)[1:]
    )
    o8 = detections_from_shorts_pallas(shorts, None, 8, cfg2,
                                       interpret=True, rows=8)
    o16 = detections_from_shorts_pallas(shorts, None, 8, cfg2,
                                        interpret=True, rows=16)
    for a, b in zip(jax.tree.leaves(o8), jax.tree.leaves(o16)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
