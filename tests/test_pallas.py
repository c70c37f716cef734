"""Pallas kernels (interpreter mode on CPU) and MXU DFT path vs golden/XLA."""

import jax.numpy as jnp
import numpy as np
import pytest

from radar_tpu import golden
from radar_tpu.config import RadarConfig
from radar_tpu.io.synthetic import synthesize_cube
from radar_tpu.ops.cfar import ca_cfar_2d
from radar_tpu.ops.dftmat import range_doppler_mxu
from radar_tpu.ops.pallas.cfar_kernel import ca_cfar_2d_pallas
from radar_tpu.ops.pallas.magargmax import masked_argmax_pallas
from radar_tpu.ops.rangefft import range_doppler


class TestDFTMatmul:
    def test_matches_fft_path(self, cfg, targets):
        cube = synthesize_cube(targets, 2, cfg, noise_std=1.0, seed=7)
        x = jnp.asarray((cube[1] - cube[0]).astype(np.complex64))
        want = np.asarray(range_doppler(x, cfg))
        got = np.asarray(range_doppler_mxu(x, cfg))
        scale = np.abs(want).max()
        assert np.abs(got - want).max() / scale < 2e-4

    def test_matches_golden(self, cfg, targets):
        cube = synthesize_cube(targets, 2, cfg, noise_std=1.0, seed=7)
        x64 = cube[1] - cube[0]
        want = golden.range_doppler_map(x64, cfg)
        got = np.asarray(range_doppler_mxu(jnp.asarray(x64.astype(np.complex64)), cfg))
        scale = np.abs(want).max()
        assert np.abs(got - want).max() / scale < 1e-3

    def test_no_window(self, cfg):
        rng = np.random.default_rng(3)
        x = (rng.standard_normal((cfg.num_chirps, cfg.num_samples))
             + 1j * rng.standard_normal((cfg.num_chirps, cfg.num_samples)))
        want = golden.range_doppler_map(x, cfg, window=False)
        got = np.asarray(
            range_doppler_mxu(jnp.asarray(x.astype(np.complex64)), cfg, window=False)
        )
        assert np.abs(got - want).max() / np.abs(want).max() < 1e-3


class TestPallasCFAR:
    def test_matches_xla_cfar(self, cfg):
        rng = np.random.default_rng(43)
        power = rng.exponential(
            1.0, (2, cfg.doppler_fft_size, cfg.range_fft_size)
        ).astype(np.float32)
        power[0, 30, 40] = 900.0
        power[1, 99, 120] = 700.0
        want_hits, want_thresh = ca_cfar_2d(jnp.asarray(power), cfg)
        got_hits, got_thresh = ca_cfar_2d_pallas(
            jnp.asarray(power), cfg, interpret=True
        )
        np.testing.assert_allclose(
            np.asarray(got_thresh), np.asarray(want_thresh), rtol=1e-4
        )
        # identical inputs, near-identical thresholds -> hit maps agree except
        # exactly-at-threshold cells
        want_t = np.asarray(want_thresh)
        marginal = np.abs(power - want_t) < 1e-4 * np.abs(want_t)
        disagree = np.asarray(got_hits) != np.asarray(want_hits)
        assert not np.any(disagree & ~marginal)
        assert np.asarray(got_hits)[0, 30, 40]
        assert np.asarray(got_hits)[1, 99, 120]

    def test_single_map(self, cfg):
        rng = np.random.default_rng(44)
        power = rng.exponential(
            1.0, (cfg.doppler_fft_size, cfg.range_fft_size)
        ).astype(np.float32)
        _, want = ca_cfar_2d(jnp.asarray(power), cfg)
        _, got = ca_cfar_2d_pallas(jnp.asarray(power), cfg, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4)


class TestMaskedArgmax:
    def test_matches_xla_detect(self, cfg, capture):
        from radar_tpu.models.range_detector import RangeDetector

        det = RangeDetector(cfg)
        base = det.prepare_base(jnp.asarray(capture[0]))
        spec = det.spectrum(jnp.asarray(capture[1:]), base)
        want = det.detect(jnp.asarray(capture[1:]), base)
        idx, mag = masked_argmax_pallas(spec, cfg, interpret=True)
        np.testing.assert_array_equal(np.asarray(idx), np.asarray(want.peak_bin))
        np.testing.assert_allclose(
            np.asarray(mag), np.asarray(want.peak_magnitude), rtol=1e-6
        )

    def test_respects_scan_window(self, cfg):
        # plant the global max OUTSIDE the scan window; kernel must ignore it
        spec = np.ones((3, cfg.fft_size), np.complex64)
        spec[:, cfg.scan_bins + 10] = 100.0
        spec[0, 5] = 7.0
        spec[1, 100] = 9.0
        spec[2, cfg.scan_bins - 1] = 3.0
        idx, mag = masked_argmax_pallas(jnp.asarray(spec), cfg, interpret=True)
        np.testing.assert_array_equal(
            np.asarray(idx), [5, 100, cfg.scan_bins - 1]
        )
        np.testing.assert_allclose(np.asarray(mag), [7.0, 9.0, 3.0], rtol=1e-6)

    def test_unbatched(self, cfg):
        spec = np.ones((cfg.fft_size,), np.complex64)
        spec[123] = 50.0
        idx, mag = masked_argmax_pallas(jnp.asarray(spec), cfg, interpret=True)
        assert idx.shape == ()
        assert int(idx) == 123


class TestTopKKernel:
    def test_matches_lax_topk(self, cfg):
        from radar_tpu.ops.pallas.topk_kernel import topk_pallas
        import jax

        rng = np.random.default_rng(51)
        # distinct values so ordering is unambiguous
        flat = rng.permutation(16384 * 3).reshape(3, 16384).astype(np.float32)
        masked = np.where(flat > 16384 * 3 - 500, flat, -np.inf).astype(np.float32)
        want_v, want_i = jax.lax.top_k(jnp.asarray(masked), 16)
        got_v, got_i = topk_pallas(jnp.asarray(masked), 16, interpret=True)
        np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))
        np.testing.assert_array_equal(np.asarray(got_v), np.asarray(want_v))

    def test_fewer_hits_than_k(self):
        from radar_tpu.ops.pallas.topk_kernel import topk_pallas

        masked = np.full((1, 256), -np.inf, np.float32)
        masked[0, 17] = 5.0
        masked[0, 200] = 9.0
        v, i = topk_pallas(jnp.asarray(masked), 4, interpret=True)
        v, i = np.asarray(v), np.asarray(i)
        assert list(i[0, :2]) == [200, 17]
        assert list(v[0, :2]) == [9.0, 5.0]
        assert not np.isfinite(v[0, 2:]).any()

    def test_tie_break_lowest_index(self):
        from radar_tpu.ops.pallas.topk_kernel import topk_pallas

        masked = np.zeros((1, 128), np.float32)
        masked[0, [5, 60, 100]] = 7.0
        v, i = topk_pallas(jnp.asarray(masked), 3, interpret=True)
        assert list(np.asarray(i)[0]) == [5, 60, 100]

    def test_pipeline_topk_impl_matches(self, cfg, targets):
        from radar_tpu.io.synthetic import synthesize_capture
        from radar_tpu.models.rd_pipeline import RDPipeline

        shorts = synthesize_capture(targets, 3, cfg, noise_std=2.0, seed=53)
        a = RDPipeline(cfg, 8, topk_impl="xla")
        b = RDPipeline(cfg, 8, topk_impl="pallas-interpret")
        base = a.prepare_base(jnp.asarray(shorts[0]))
        out_a = a.detect(jnp.asarray(shorts[1:]), base)
        out_b = b.detect(jnp.asarray(shorts[1:]), base)
        np.testing.assert_array_equal(
            np.asarray(out_a.range_bin), np.asarray(out_b.range_bin)
        )
        np.testing.assert_array_equal(
            np.asarray(out_a.valid), np.asarray(out_b.valid)
        )


class TestPallasCFARConfigs:
    @pytest.mark.parametrize("guard,train,pfa", [
        ((1, 1), (2, 2), 1e-3),
        ((3, 3), (6, 6), 1e-5),
        ((0, 2), (2, 8), 1e-4),
    ])
    def test_param_sweep_matches_golden(self, guard, train, pfa):
        cfg = RadarConfig(cfar_guard=guard, cfar_train=train, cfar_pfa=pfa)
        rng = np.random.default_rng(sum(guard) + sum(train))
        power = rng.exponential(
            1.0, (cfg.doppler_fft_size, cfg.range_fft_size)
        ).astype(np.float32)
        _, want = golden.ca_cfar_2d(
            power.astype(np.float64), guard, train, pfa,
            n_pulses=cfg.cfar_pulses_effective,
        )
        _, got = ca_cfar_2d_pallas(jnp.asarray(power), cfg, interpret=True)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4)


def test_mxu_planar_matches_complex(cfg):
    rng = np.random.default_rng(61)
    x = (rng.standard_normal((2, 4, cfg.num_chirps, cfg.num_samples))
         + 1j * rng.standard_normal((2, 4, cfg.num_chirps, cfg.num_samples))
         ).astype(np.complex64)
    a = np.asarray(range_doppler_mxu(jnp.asarray(x), cfg, planar=False))
    b = np.asarray(range_doppler_mxu(jnp.asarray(x), cfg, planar=True))
    assert np.abs(a - b).max() / np.abs(a).max() < 1e-5


def test_range_detector_pallas_impl_matches(cfg, capture):
    from radar_tpu.models.range_detector import RangeDetector

    a = RangeDetector(cfg, detect_impl="xla")
    b = RangeDetector(cfg, detect_impl="pallas-interpret")
    base = a.prepare_base(jnp.asarray(capture[0]))
    oa = a.detect(jnp.asarray(capture[1:]), base)
    ob = b.detect(jnp.asarray(capture[1:]), base)
    np.testing.assert_array_equal(np.asarray(oa.peak_bin), np.asarray(ob.peak_bin))
    np.testing.assert_array_equal(
        np.asarray(oa.rescaled_bin), np.asarray(ob.rescaled_bin)
    )
    np.testing.assert_allclose(
        np.asarray(oa.peak_magnitude), np.asarray(ob.peak_magnitude), rtol=1e-6
    )


class TestPallasOSCFAR:
    """The Pallas rank-selection OS-CFAR (exact k-th order statistic via
    bit-space binary search) vs the float64 golden and the XLA sort path."""

    def _power(self, cfg, frames=2, seed=47):
        rng = np.random.default_rng(seed)
        p = rng.gamma(
            2.0, 100.0, (frames, cfg.doppler_fft_size, cfg.range_fft_size)
        ).astype(np.float32)
        p[0, 50, 100] = 9e5
        return p

    @pytest.mark.parametrize(
        "kw",
        [
            {},
            {"cfar_os_stride": 3},
            {"cfar_range_mode": "wrap"},
            {"cfar_os_k_frac": 0.9},
            {"cfar_guard": (1, 1), "cfar_train": (2, 3)},
        ],
    )
    def test_matches_golden(self, kw):
        from radar_tpu.ops.pallas.oscfar_kernel import os_cfar_2d_pallas

        cfg = RadarConfig(cfar_kind="os", **kw)
        power = self._power(cfg)
        want_hits, want_t = golden.os_cfar_2d(
            power.astype(np.float64), cfg.cfar_guard, cfg.cfar_train,
            cfg.cfar_pfa, cfg.cfar_os_k_frac, cfg.cfar_range_mode,
            cfg.cfar_os_stride, n_pulses=cfg.cfar_pulses_effective,
        )
        got_hits, got_t = os_cfar_2d_pallas(
            jnp.asarray(power), cfg, interpret=True
        )
        np.testing.assert_allclose(np.asarray(got_t), want_t, rtol=2e-4)
        np.testing.assert_array_equal(np.asarray(got_hits), want_hits)

    def test_bit_exact_vs_xla_sort(self):
        """Selection by counting and selection by sorting must agree to the
        BIT on the same f32 ring (both pick the k-th smallest f32)."""
        from radar_tpu.ops.cfar import os_cfar_2d
        from radar_tpu.ops.pallas.oscfar_kernel import os_cfar_2d_pallas

        cfg = RadarConfig(cfar_kind="os")
        power = self._power(cfg, frames=3, seed=11)
        _, want = os_cfar_2d(jnp.asarray(power), cfg)
        _, got = os_cfar_2d_pallas(jnp.asarray(power), cfg, interpret=True)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_small_single_tile_geometry(self):
        cfg = RadarConfig(
            cfar_kind="os", cfar_guard=(1, 1), cfar_train=(2, 2),
            num_samples=16, num_chirps=16,
        )
        rng = np.random.default_rng(5)
        power = rng.exponential(1.0, (2, 16, 16)).astype(np.float32)
        from radar_tpu.ops.pallas.oscfar_kernel import os_cfar_2d_pallas

        _, want = golden.os_cfar_2d(
            power.astype(np.float64), cfg.cfar_guard, cfg.cfar_train,
            cfg.cfar_pfa, cfg.cfar_os_k_frac, cfg.cfar_range_mode,
            n_pulses=cfg.cfar_pulses_effective,
        )
        _, got = os_cfar_2d_pallas(jnp.asarray(power), cfg, interpret=True)
        np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4)

    @pytest.mark.parametrize(
        "kw",
        [
            {},
            {"cfar_os_stride": 3},
            {"cfar_range_mode": "wrap"},
            {"cfar_os_k_frac": 0.9},
            {"cfar_guard": (1, 1), "cfar_train": (2, 3)},
        ],
    )
    def test_hits_kernel_matches_threshold_compare(self, kw):
        """The one-pass counting kernel's hit map == power > threshold
        from the rank-search kernel, bit-for-bit (the counting identity:
        count(RN(alpha*v) < p) >= k  <=>  p > RN(alpha*T_k))."""
        from radar_tpu.ops.pallas.oscfar_kernel import (
            os_cfar_2d_pallas,
            os_cfar_hits_pallas,
        )

        cfg = RadarConfig(cfar_kind="os", **kw)
        power = self._power(cfg)
        want_hits, _ = os_cfar_2d_pallas(jnp.asarray(power), cfg,
                                         interpret=True)
        got = os_cfar_hits_pallas(jnp.asarray(power), cfg, interpret=True)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want_hits))

    def test_hits_kernel_exact_tie_is_not_a_hit(self):
        """A cell whose power EQUALS its f32 threshold must not be a hit
        (the gate is strict >), and one ulp above must be — the razor-edge
        case where an inexact reformulation would diverge."""
        from radar_tpu.ops.pallas.oscfar_kernel import (
            os_cfar_2d_pallas,
            os_cfar_hits_pallas,
        )

        cfg = RadarConfig(cfar_kind="os")
        power = self._power(cfg, frames=1, seed=23)
        _, thr = os_cfar_2d_pallas(jnp.asarray(power), cfg, interpret=True)
        thr = np.asarray(thr)
        d, r = 40, 60
        for bump, want in [(0, False), (1, True)]:
            p2 = power.copy()
            t = thr[0, d, r]
            # the cell is not in its own training ring, so changing it
            # leaves its own threshold unchanged
            p2[0, d, r] = t if bump == 0 else np.nextafter(
                np.float32(t), np.float32(np.inf)
            )
            got = np.asarray(
                os_cfar_hits_pallas(jnp.asarray(p2), cfg, interpret=True)
            )
            assert bool(got[0, d, r]) is want
            _, thr2 = os_cfar_2d_pallas(jnp.asarray(p2), cfg,
                                        interpret=True)
            np.testing.assert_array_equal(got, p2 > np.asarray(thr2))

    @pytest.mark.parametrize(
        "kw",
        [
            {},
            {"cfar_range_mode": "wrap"},
            {"cfar_os_k_frac": 0.9},
            {"cfar_guard": (1, 1), "cfar_train": (2, 3)},
            {"num_samples": 48, "num_chirps": 64},   # non-aligned dims
        ],
    )
    def test_hits_box_matches_offsets(self, kw):
        """The stride-1 box-count form (train box minus guard box, exact
        integer subtraction) == the unrolled per-offset count, bit-for-
        bit, including edge cells whose windows read the wrap/reflect
        halo and the +inf alignment padding."""
        from radar_tpu.ops.pallas.oscfar_kernel import os_cfar_hits_pallas

        cfg = RadarConfig(cfar_kind="os", **kw)
        d, r = cfg.doppler_fft_size, cfg.range_fft_size
        rng = np.random.default_rng(47)
        power = rng.gamma(2.0, 100.0, (2, d, r)).astype(np.float32)
        # force hits near every edge so halo/padding mistakes surface
        for dd, rr in [(0, 0), (0, r - 1), (d - 1, 0), (d - 1, r - 1),
                       (d // 2, r // 2)]:
            power[1, dd, rr] = 8e5
        box = os_cfar_hits_pallas(jnp.asarray(power), cfg, interpret=True,
                                  impl="box")
        off = os_cfar_hits_pallas(jnp.asarray(power), cfg, interpret=True,
                                  impl="offsets")
        assert np.asarray(box).any()
        np.testing.assert_array_equal(np.asarray(box), np.asarray(off))

    def test_hits_box_requires_stride_1(self):
        """The box decomposition is exact only for the undecimated ring;
        forcing it at stride > 1 must refuse, and auto must route to the
        offsets form instead."""
        from radar_tpu.ops.pallas.oscfar_kernel import os_cfar_hits_pallas

        cfg = RadarConfig(cfar_kind="os", cfar_os_stride=3)
        power = self._power(cfg, frames=1)
        with pytest.raises(ValueError, match="stride"):
            os_cfar_hits_pallas(jnp.asarray(power), cfg, interpret=True,
                                impl="box")
        got = os_cfar_hits_pallas(jnp.asarray(power), cfg, interpret=True)
        want = os_cfar_hits_pallas(jnp.asarray(power), cfg, interpret=True,
                                   impl="offsets")
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_hits_supported_predicate_and_fallback(self):
        """os_hits_supported mirrors the hits kernel's gates without
        raising; cfar_detect(hits_only=True) falls back to the
        rank-search kernel (threshold returned) when it says False."""
        from radar_tpu.ops.cfar import cfar_detect
        from radar_tpu.ops.pallas.oscfar_kernel import os_hits_supported

        cfg = RadarConfig(cfar_kind="os")
        assert os_hits_supported(cfg.doppler_fft_size, cfg.range_fft_size,
                                 cfg)
        # resident padded map >> 10 MB: the predicate refuses instead of
        # letting the kernel raise
        assert not os_hits_supported(2048, 2048, cfg)
        # supported geometry: hits-only dispatch returns no threshold
        power = self._power(cfg, frames=1)
        hits, thr = cfar_detect(jnp.asarray(power), cfg, "pallas",
                                interpret=True, hits_only=True)
        assert thr is None
        want, _ = cfar_detect(jnp.asarray(power), cfg, "pallas",
                              interpret=True)
        np.testing.assert_array_equal(np.asarray(hits), np.asarray(want))

    def test_pipeline_dispatch(self, targets):
        """cfar_impl='pallas-interpret' with cfar_kind='os' must produce the
        same detections as the XLA OS path through the full pipeline."""
        from radar_tpu.io.synthetic import synthesize_capture
        from radar_tpu.models.rd_pipeline import RDPipeline

        cfg = RadarConfig(cfar_kind="os")
        cap = synthesize_capture(targets, 3, cfg, noise_std=5.0, seed=3)
        a = RDPipeline(cfg, 16, cfar_impl="xla", rd_impl="fft")
        b = RDPipeline(cfg, 16, cfar_impl="pallas-interpret", rd_impl="fft")
        base = a.prepare_base(jnp.asarray(cap[0]))
        oa = a.detect(jnp.asarray(cap[1:]), base)
        ob = b.detect(jnp.asarray(cap[1:]), base)
        np.testing.assert_array_equal(np.asarray(oa.valid), np.asarray(ob.valid))
        np.testing.assert_array_equal(
            np.asarray(oa.range_bin), np.asarray(ob.range_bin)
        )
        np.testing.assert_array_equal(np.asarray(oa.num_hits), np.asarray(ob.num_hits))


def test_topk_pallas_exhausted_slots_match_lax(cfg):
    """With fewer hits than K the -inf slots must carry ASCENDING untaken
    indices, exactly like lax.top_k's stable order (regression: the
    knockout used to re-pick cell 0 for every exhausted slot)."""
    import jax

    m = jnp.full((3, 32), -jnp.inf)
    m = m.at[0, 7].set(5.0).at[0, 3].set(9.0)   # 2 hits
    m = m.at[1, 0].set(1.0)                      # hit at the tie index
    # row 2: no hits at all
    from radar_tpu.ops.pallas.topk_kernel import topk_pallas

    v_ref, i_ref = jax.lax.top_k(m, 5)
    v_p, i_p = topk_pallas(m, 5, interpret=True)
    np.testing.assert_array_equal(np.asarray(i_ref), np.asarray(i_p))
    np.testing.assert_array_equal(np.asarray(v_ref), np.asarray(v_p))
