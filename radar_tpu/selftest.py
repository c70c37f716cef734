"""Compiled-mode kernel selftest: every Pallas kernel against its golden.

The CPU pytest suite runs all Pallas kernels in interpret mode
(tests/conftest.py forces the CPU backend), which cannot catch
Mosaic-lowering bugs — round 3 hit two at runtime that interpret-mode
tests had passed: the top-K exhausted-slot tie-order divergence (commit
e586119) and the non-128-lane shape-cast failure that motivated
``mega_supported``.  This module is the enabled, on-accelerator form of
the reference's dual-implementation cross-check
(/root/reference/cudaBenchMarking.cpp:410-419): one command that runs
every kernel NON-interpret on the real chip and compares against the
XLA/golden twin.

Run with ``python -m radar_tpu.cli selftest`` (add ``--require-tpu`` to
fail instead of falling back to interpret mode off-chip).  The verify
skill runs it before each bench capture.

Also the VMEM-budget regression sweep: ``_auto_rows`` is a working-set
heuristic (ops/pallas/megakernel.py); the geometry sweep here compiles
and runs the kernel at every admitted geometry, so a budget mistake
fails HERE, not in production.
"""

from __future__ import annotations

import time
import traceback

import numpy as np


def _interpret() -> bool:
    import jax

    return jax.default_backend() != "tpu"


def _capture(cfg, n, seed=0, targets=None):
    from radar_tpu.io.synthetic import SceneTarget, synthesize_capture

    if targets is None:
        targets = [
            SceneTarget(5.0, 2.0, 15.0, amplitude=2500.0),
            SceneTarget(9.0, -1.0, -30.0, amplitude=1500.0),
        ]
    return synthesize_capture(targets, n, cfg, noise_std=2.0, seed=seed)


def _materialize(tree):
    import jax

    return jax.tree.map(np.asarray, tree)


def _det_fields(a, b, azimuth_atol=1e-3):
    """Assert two RDResults agree: bit-exact everywhere but azimuth."""
    for f in ("num_hits", "doppler_bin", "range_bin", "valid", "power",
              "range_m", "velocity_mps", "range_m_interp",
              "velocity_mps_interp"):
        np.testing.assert_array_equal(
            np.asarray(getattr(a, f)), np.asarray(getattr(b, f)), err_msg=f
        )
    np.testing.assert_allclose(
        np.asarray(a.azimuth_deg), np.asarray(b.azimuth_deg),
        atol=azimuth_atol,
    )


# --------------------------------------------------------------------------
# checks (each raises on failure)
# --------------------------------------------------------------------------


def check_mega_maps_ca(base_mode: bool):
    """Maps kernel (power + band-matrix CA-CFAR) vs the XLA twins."""
    import jax.numpy as jnp

    from radar_tpu.config import RadarConfig
    from radar_tpu.models.rd_pipeline import RDPipeline
    from radar_tpu.ops.cfar import ca_cfar_2d
    from radar_tpu.ops.pallas.megakernel import power_cfar_from_shorts_pallas

    cfg = RadarConfig()
    cap = _capture(cfg, 9, seed=11)
    pipe = RDPipeline(cfg, max_detections=8, rd_impl="mega",
                      use_base_frame=base_mode)
    base = pipe.prepare_base(jnp.asarray(cap[0])) if base_mode else None
    power, thresh = _materialize(power_cfar_from_shorts_pallas(
        jnp.asarray(cap[1:]), base, cfg, interpret=_interpret()
    ))
    hits_want, thresh_want = _materialize(
        ca_cfar_2d(jnp.asarray(power), cfg)
    )
    np.testing.assert_allclose(thresh, thresh_want, rtol=1e-3)
    flips = int(((power > thresh) != hits_want).sum())
    assert flips <= 4, f"{flips} hit flips vs reduce_window CFAR"


def check_mega_detect_bitexact():
    """Fused detect kernel vs maps + Pallas top-K tail: bit-exact."""
    import jax.numpy as jnp

    from radar_tpu.config import RadarConfig
    from radar_tpu.models.rd_pipeline import RDPipeline

    cfg = RadarConfig()
    cap = _capture(cfg, 9, seed=12)
    det = RDPipeline(cfg, max_detections=16, rd_impl="mega")
    maps = RDPipeline(cfg, max_detections=16, rd_impl="mega-maps",
                      topk_impl="pallas")
    base = det.prepare_base(jnp.asarray(cap[0]))
    a = det.detect(jnp.asarray(cap[1:]), base)
    b = maps.detect(jnp.asarray(cap[1:]), base)
    _det_fields(a, b)


def check_mega_detect_go_so():
    """GOCA/SOCA fused into the detect kernel (asymmetric band matmuls)
    vs the maps kernel + Pallas top-K tail: bit-exact, compiled."""
    import jax.numpy as jnp

    from radar_tpu.config import RadarConfig
    from radar_tpu.models.rd_pipeline import RDPipeline

    for kind in ("goca", "soca"):
        cfg = RadarConfig(cfar_kind=kind)
        cap = _capture(cfg, 5, seed=14)
        det = RDPipeline(cfg, max_detections=8, rd_impl="mega")
        maps = RDPipeline(cfg, max_detections=8, rd_impl="mega-maps",
                          topk_impl="pallas")
        base = det.prepare_base(jnp.asarray(cap[0]))
        a = det.detect(jnp.asarray(cap[1:]), base)
        b = maps.detect(jnp.asarray(cap[1:]), base)
        _det_fields(a, b)


def check_mega_detect_mimo():
    """Detect kernel under TDM-MIMO (tx=2)."""
    import jax.numpy as jnp

    from radar_tpu.config import RadarConfig
    from radar_tpu.models.rd_pipeline import RDPipeline

    cfg = RadarConfig(num_tx=2)
    cap = _capture(cfg, 5, seed=13)
    det = RDPipeline(cfg, max_detections=8, rd_impl="mega")
    maps = RDPipeline(cfg, max_detections=8, rd_impl="mega-maps",
                      topk_impl="pallas")
    base = det.prepare_base(jnp.asarray(cap[0]))
    _det_fields(det.detect(jnp.asarray(cap[1:]), base),
                maps.detect(jnp.asarray(cap[1:]), base))


def check_mega_mean_clutter():
    """Detect kernel, chirp-mean clutter removal (no base frame)."""
    import jax.numpy as jnp

    from radar_tpu.config import RadarConfig
    from radar_tpu.models.rd_pipeline import RDPipeline

    cfg = RadarConfig()
    cap = _capture(cfg, 5, seed=14)
    det = RDPipeline(cfg, max_detections=8, rd_impl="mega",
                     use_base_frame=False)
    maps = RDPipeline(cfg, max_detections=8, rd_impl="mega-maps",
                      topk_impl="pallas", use_base_frame=False)
    _det_fields(det.detect(jnp.asarray(cap[1:]), None),
                maps.detect(jnp.asarray(cap[1:]), None))


def check_mega_mti():
    """Detect kernel, MTI clutter mode (canceller folded into the
    Doppler constants, megakernel._plan): bin-agreement with the
    complex-FFT impl plus physics — a 5x static target fully notched,
    the mover kept."""
    import jax.numpy as jnp

    from radar_tpu.config import RadarConfig
    from radar_tpu.io.synthetic import SceneTarget
    from radar_tpu.models.rd_pipeline import RDPipeline

    cfg = RadarConfig(clutter_mode="mti2")
    cap = _capture(cfg, 4, seed=21, targets=[
        SceneTarget(range_m=6.0, velocity_mps=0.0, azimuth_deg=5.0,
                    amplitude=6000.0),
        SceneTarget(range_m=9.0, velocity_mps=-4.0, azimuth_deg=-30.0,
                    amplitude=1200.0),
    ])
    shorts = jnp.asarray(cap[1:])
    a = RDPipeline(cfg, max_detections=8, rd_impl="mega",
                   use_base_frame=False).detect(shorts, None)
    b = RDPipeline(cfg, max_detections=8, rd_impl="fft",
                   use_base_frame=False).detect(shorts, None)
    av, bv = np.asarray(a.valid), np.asarray(b.valid)
    np.testing.assert_array_equal(av, bv)
    np.testing.assert_array_equal(np.asarray(a.range_bin)[av],
                                  np.asarray(b.range_bin)[bv])
    np.testing.assert_array_equal(np.asarray(a.doppler_bin)[av],
                                  np.asarray(b.doppler_bin)[bv])
    dets = [(float(np.asarray(a.range_m)[0, k]),
             float(np.asarray(a.velocity_mps)[0, k]))
            for k in range(8) if av[0, k]]
    assert any(abs(r - 9.0) < 1.0 and abs(v + 4.0) < 1.0 for r, v in dets)
    assert not any(abs(r - 6.0) < 0.5 and abs(v) < 0.5 for r, v in dets)


def check_topk_tie_order():
    """topk_pallas == lax.top_k bit-for-bit, including the exhausted-slot
    ascending-untaken-index order (the e586119 bug class)."""
    import jax
    import jax.numpy as jnp

    from radar_tpu.ops.pallas.topk_kernel import topk_pallas

    rng = np.random.default_rng(15)
    x = np.full((16, 2048), -np.inf, np.float32)
    for i in range(16):
        # between 0 and 24 finite cells per row, with deliberate ties
        k = int(rng.integers(0, 25))
        cols = rng.choice(2048, size=k, replace=False)
        x[i, cols] = rng.integers(1, 6, size=k).astype(np.float32)
    xd = jnp.asarray(x)
    want_v, want_i = jax.lax.top_k(xd, 16)
    got_v, got_i = topk_pallas(xd, 16, interpret=_interpret())
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))
    np.testing.assert_array_equal(np.asarray(got_v), np.asarray(want_v))


def check_oscfar_exact():
    """OS-CFAR rank-selection kernel: bit-identical to jnp.sort at
    stride 1 (the exact mode)."""
    import jax.numpy as jnp

    from radar_tpu.config import RadarConfig
    from radar_tpu.ops.cfar import os_cfar_2d
    from radar_tpu.ops.pallas.oscfar_kernel import os_cfar_2d_pallas

    cfg = RadarConfig(cfar_kind="os", cfar_os_stride=1)
    rng = np.random.default_rng(16)
    power = (rng.random((4, cfg.doppler_fft_size, cfg.range_fft_size))
             .astype(np.float32) * 1e6)
    pd = jnp.asarray(power)
    _, thresh_want = _materialize(os_cfar_2d(pd, cfg))
    _, thresh_got = _materialize(
        os_cfar_2d_pallas(pd, cfg, interpret=_interpret())
    )
    np.testing.assert_array_equal(thresh_got, thresh_want)


def check_oscfar_hits_one_pass():
    """One-pass OS-CFAR counting kernels: hit maps identical to the
    rank-search kernel's ``power > threshold`` (the counting identity
    must hold COMPILED, not just in interpret mode) — BOTH the stride-1
    box-count form (dynamic-roll fori_loops, the production choice) and
    the unrolled per-offset form."""
    import jax.numpy as jnp

    from radar_tpu.config import RadarConfig
    from radar_tpu.ops.pallas.oscfar_kernel import (
        os_cfar_2d_pallas,
        os_cfar_hits_pallas,
    )

    cfg = RadarConfig(cfar_kind="os", cfar_os_stride=1)
    rng = np.random.default_rng(21)
    power = (rng.gamma(
        2.0, 100.0, (4, cfg.doppler_fft_size, cfg.range_fft_size)
    ).astype(np.float32))
    power[2, 0, 0] = power[3, -1, -1] = 9e5   # edge/halo coverage
    pd = jnp.asarray(power)
    hits_want, _ = _materialize(
        os_cfar_2d_pallas(pd, cfg, interpret=_interpret())
    )
    for impl in ("box", "offsets"):
        hits_got = _materialize(
            os_cfar_hits_pallas(pd, cfg, interpret=_interpret(), impl=impl)
        )
        np.testing.assert_array_equal(hits_got, hits_want,
                                      err_msg=f"impl={impl}")


def check_band_cfar():
    """Standalone band-matrix CA-CFAR kernel vs reduce_window."""
    import jax.numpy as jnp

    from radar_tpu.config import RadarConfig
    from radar_tpu.ops.cfar import ca_cfar_2d
    from radar_tpu.ops.pallas.cfar_kernel import ca_cfar_2d_pallas

    cfg = RadarConfig()
    rng = np.random.default_rng(17)
    power = (rng.random((8, cfg.doppler_fft_size, cfg.range_fft_size))
             .astype(np.float32) * 1e6)
    pd = jnp.asarray(power)
    hits_want, thresh_want = _materialize(ca_cfar_2d(pd, cfg))
    hits_got, thresh_got = _materialize(
        ca_cfar_2d_pallas(pd, cfg, interpret=_interpret())
    )
    np.testing.assert_allclose(thresh_got, thresh_want, rtol=1e-3)
    assert int((hits_got != hits_want).sum()) <= 4


def check_magargmax():
    """Fused magnitude+argmax kernel vs the XLA argmax, spectrum produced
    on device (complex64 never crosses the host boundary)."""
    import jax
    import jax.numpy as jnp

    from radar_tpu.config import RadarConfig
    from radar_tpu.ops.pallas.magargmax import masked_argmax_pallas

    cfg = RadarConfig()
    rng = np.random.default_rng(18)
    real = jnp.asarray(rng.standard_normal((8, cfg.fft_size))
                       .astype(np.float32))

    @jax.jit
    def both(x):
        spec = jnp.fft.fft(x).astype(jnp.complex64)
        p = jnp.abs(spec[..., : cfg.scan_bins])
        want = jnp.argmax(p, axis=-1).astype(jnp.int32)
        got_i, _ = masked_argmax_pallas(spec, cfg, interpret=_interpret())
        return want, got_i

    want, got = _materialize(both(real))
    np.testing.assert_array_equal(got, want)


def check_fused_dft_kernel():
    """Explicit Pallas fused decode+range-DFT kernel vs the XLA einsum."""
    import jax
    import jax.numpy as jnp

    from radar_tpu.config import RadarConfig
    from radar_tpu.models.rd_pipeline import RDPipeline
    from radar_tpu.ops.fuseddft import fused_rd_planes
    from radar_tpu.ops.pallas.fused_dft_kernel import fused_rd_planes_pallas

    cfg = RadarConfig()
    cap = _capture(cfg, 5, seed=19)
    pipe = RDPipeline(cfg, max_detections=8)
    base = pipe.prepare_base(jnp.asarray(cap[0]))
    x = jnp.asarray(cap[1:])
    # jit the golden: eager complex ops hit the dev relay's Unimplemented
    # host-boundary path (SKILL.md); under jit they compile fine
    dr_w, di_w = jax.jit(
        lambda a, b: fused_rd_planes(a, b, cfg)
    )(x, base)
    dr_g, di_g = fused_rd_planes_pallas(x, base, cfg,
                                        interpret=_interpret())
    scale = float(jnp.max(jnp.abs(dr_w)))
    np.testing.assert_allclose(np.asarray(dr_g), np.asarray(dr_w),
                               rtol=1e-4, atol=1e-4 * scale)
    np.testing.assert_allclose(np.asarray(di_g), np.asarray(di_w),
                               rtol=1e-4, atol=1e-4 * scale)


def check_vmem_geometry_sweep():
    """Every geometry ``mega_supported`` admits must compile and run at
    the ``_auto_rows`` tiling — incl. non-128-lane range sizes (padded
    in-kernel) and TDM-MIMO — and agree with the fused path on
    detections.  This is the regression net under the VMEM budget
    heuristic (megakernel._auto_rows / _auto_rows_detect)."""
    import jax.numpy as jnp

    from radar_tpu.config import RadarConfig
    from radar_tpu.models.rd_pipeline import RDPipeline
    from radar_tpu.ops.pallas.megakernel import mega_supported

    geometries = [
        dict(),                                     # default 128x100x4
        dict(num_samples=64, num_chirps=64, num_rx=2),   # R=64 padded
        dict(num_samples=48, num_chirps=128),            # R=64 padded
        dict(num_samples=256, num_chirps=128),           # R=256 aligned
        dict(num_tx=2),                                  # TDM-MIMO
        dict(num_samples=256, num_chirps=256),           # heavier frame
    ]
    for geom in geometries:
        cfg = RadarConfig(**geom)
        assert mega_supported(cfg), f"gate rejected {geom}"
        cap = _capture(cfg, 3, seed=20)
        mega = RDPipeline(cfg, max_detections=8, rd_impl="mega",
                          cfar_impl="xla")
        fused = RDPipeline(cfg, max_detections=8, rd_impl="fused",
                           cfar_impl="xla")
        base = mega.prepare_base(jnp.asarray(cap[0]))
        a = _materialize(mega.detect(jnp.asarray(cap[1:]), base))
        b = _materialize(fused.detect(jnp.asarray(cap[1:]), base))
        np.testing.assert_array_equal(a.range_bin, b.range_bin,
                                      err_msg=str(geom))
        np.testing.assert_array_equal(a.valid, b.valid, err_msg=str(geom))


def check_speed_mode_detections():
    """Speed-mode acceptance gate (round-5): ``dft_precision='default'``
    (one bf16 MXU pass, ~9e-4 relative vs f64 golden) must reproduce the
    'high' mode's DETECTION SETS on moderate-SNR target scenes — at most
    one marginal-cell flip per 8-frame batch across three seeds.  This
    is the formalized criterion behind promoting the 26%-faster 1-pass
    mode (159.3k vs 126.6k fps driver-captured, BENCH_r04); the full
    seed/geometry/noise study is ``scripts/speed_gate.py``.  Runs
    compiled on TPU; on the CPU backend both modes lower to the same
    exact f32 dot, so the interpret-mode run only exercises the plumbing.
    """
    import jax.numpy as jnp

    from radar_tpu.config import RadarConfig
    from radar_tpu.models.rd_pipeline import RDPipeline

    cfg_hi = RadarConfig()
    cfg_lo = RadarConfig(dft_precision="default")
    for seed in (3, 7, 11):
        cap = _capture(cfg_hi, 9, seed=seed)
        sets = {}
        for name, c in (("high", cfg_hi), ("default", cfg_lo)):
            pipe = RDPipeline(c, max_detections=8)
            base = pipe.prepare_base(jnp.asarray(cap[0]))
            r = _materialize(pipe.detect(jnp.asarray(cap[1:]), base))
            valid = r.valid.astype(bool)
            sets[name] = [
                {(int(d), int(rr))
                 for d, rr in zip(r.doppler_bin[f][valid[f]],
                                  r.range_bin[f][valid[f]])}
                for f in range(valid.shape[0])
            ]
        flips = sum(len(sa ^ sb)
                    for sa, sb in zip(sets["high"], sets["default"]))
        assert flips <= 1, (
            f"seed {seed}: {flips} detection flips high vs default"
        )


CHECKS = [
    ("mega-maps ca-cfar (base clutter)", lambda: check_mega_maps_ca(True)),
    ("mega-maps ca-cfar (mean clutter)", lambda: check_mega_maps_ca(False)),
    ("mega-detect bit-exact vs maps", check_mega_detect_bitexact),
    ("mega-detect GOCA/SOCA", check_mega_detect_go_so),
    ("mega-detect TDM-MIMO", check_mega_detect_mimo),
    ("mega-detect mean clutter", check_mega_mean_clutter),
    ("mega-detect mti clutter (folded canceller)", check_mega_mti),
    ("topk tie order vs lax.top_k", check_topk_tie_order),
    ("os-cfar exact rank selection", check_oscfar_exact),
    ("os-cfar one-pass hit decision", check_oscfar_hits_one_pass),
    ("band-matrix ca-cfar kernel", check_band_cfar),
    ("magargmax kernel", check_magargmax),
    ("fused dft kernel", check_fused_dft_kernel),
    ("vmem geometry sweep", check_vmem_geometry_sweep),
    ("speed-mode detections (default vs high)", check_speed_mode_detections),
]


def run_selftests(names: list[str] | None = None) -> int:
    """Run all (or the named) checks; returns the number of failures."""
    import jax

    backend = jax.default_backend()
    mode = "compiled" if backend == "tpu" else "interpret"
    print(f"selftest backend={backend} kernels={mode}")
    failures = 0
    for name, fn in CHECKS:
        if names and not any(s in name for s in names):
            continue
        t0 = time.perf_counter()
        try:
            fn()
        except Exception:
            failures += 1
            print(f"FAIL {name} ({time.perf_counter() - t0:.1f}s)")
            traceback.print_exc()
        else:
            print(f"ok   {name} ({time.perf_counter() - t0:.1f}s)")
    print(f"selftest: {len(CHECKS) if not names else 'selected'} checks, "
          f"{failures} failed")
    return failures
