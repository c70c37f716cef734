"""Reference-parity single-target range detector (flagship TPU pipeline).

Replaces the reference's whole per-frame GPU orchestration
(``cudaProcessing``, acceleration.cu:417-572: 6 cudaMallocs, 4 PCIe
crossings, 17 kernel launches per frame) with ONE jitted, frame-batched
array program:

    int16 view -> complex64 -> transpose -> rx0 - base -> pad 16,384
    -> XLA FFT -> fused |X|^2 argmax -> distance scalars

The base frame is computed once and stays resident in HBM (the reference
re-uploads it every frame, acceleration.cu:475).  Only (bin, distance,
magnitude) scalars per frame ever leave the device.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from radar_tpu.config import RadarConfig, DEFAULT_CONFIG
from radar_tpu.ops.decode import decode_to_cube, rx0_slice
from radar_tpu.ops.detect import PeakDetection, peak_detect
from radar_tpu.ops.preproc import clutter_subtract_pad
from radar_tpu.ops.rangefft import range_fft


@dataclasses.dataclass(frozen=True)
class RangeDetector:
    """Frame-batched parity pipeline.

    Usage::

        det = RangeDetector(cfg)
        base = det.prepare_base(frames[0])      # frame 0 = empty scene
        out = det.detect(frames[1:], base)       # PeakDetection, batched

    Frozen + hashed by value (``self`` is a jit static argument): equal
    configs share one compiled program; mutation raises.

    Attributes:
      detect_impl: 'auto'/'xla' (fused XLA argmax) or
        'pallas'/'pallas-interpret' (fused |X|^2+mask+argmax kernel,
        ops/pallas/magargmax.py).
    """

    cfg: RadarConfig = DEFAULT_CONFIG
    detect_impl: str = "auto"

    # -- base frame ------------------------------------------------------
    def prepare_base(self, frame0_shorts: jnp.ndarray) -> jnp.ndarray:
        """Decode frame 0 and keep its RX0 slice on-device
        (cudaBenchMarking.cpp:242-250)."""
        return self._prepare_base_jit(frame0_shorts)

    @partial(jax.jit, static_argnums=0)
    def _prepare_base_jit(self, frame0_shorts: jnp.ndarray) -> jnp.ndarray:
        return rx0_slice(decode_to_cube(frame0_shorts, self.cfg), self.cfg)

    # -- individual stages (for stage-level verification and the
    # reference-format 4-bucket timing report) ----------------------------
    @partial(jax.jit, static_argnums=0)
    def preprocess(self, shorts: jnp.ndarray, base_rx0: jnp.ndarray) -> jnp.ndarray:
        """decode -> rx0 -> clutter subtract -> pad ("Reshape + Extension")."""
        cube = decode_to_cube(shorts, self.cfg)
        return clutter_subtract_pad(rx0_slice(cube, self.cfg), base_rx0, self.cfg)

    @partial(jax.jit, static_argnums=0)
    def fft_stage(self, padded: jnp.ndarray) -> jnp.ndarray:
        return range_fft(padded, self.cfg)

    @partial(jax.jit, static_argnums=0)
    def detect_stage(self, spectrum: jnp.ndarray) -> PeakDetection:
        return peak_detect(spectrum, self.cfg)

    @partial(jax.jit, static_argnums=0)
    def spectrum(self, shorts: jnp.ndarray, base_rx0: jnp.ndarray) -> jnp.ndarray:
        """Range spectrum, complex64 (..., fft_size)."""
        cube = decode_to_cube(shorts, self.cfg)
        padded = clutter_subtract_pad(rx0_slice(cube, self.cfg), base_rx0, self.cfg)
        return range_fft(padded, self.cfg)

    # -- full detection ---------------------------------------------------
    @partial(jax.jit, static_argnums=0)
    def detect(self, shorts: jnp.ndarray, base_rx0: jnp.ndarray) -> PeakDetection:
        """Detect on a batch of raw frames.

        Args:
          shorts: int16 (batch, shorts_per_frame) — or unbatched (S,).
          base_rx0: complex64 (rx_samples,) from :meth:`prepare_base`.
        """
        spec = self.spectrum(shorts, base_rx0)
        impl = self.detect_impl
        if impl in ("auto", "xla"):
            return peak_detect(spec, self.cfg)
        from radar_tpu.ops.detect import distance_from_bin
        from radar_tpu.ops.pallas.magargmax import masked_argmax_pallas

        interpret = (
            impl == "pallas-interpret" or jax.default_backend() != "tpu"
        )
        peak_bin, mag = masked_argmax_pallas(spec, self.cfg, interpret=interpret)
        rescaled, dist = distance_from_bin(peak_bin, self.cfg)
        return PeakDetection(peak_bin, rescaled, dist, mag)

    # -- convenience: whole-capture run ------------------------------------
    def detect_capture(self, frames_shorts) -> PeakDetection:
        """Frame 0 is the base; detect frames 1..N-1 in one batch."""
        frames = jnp.asarray(frames_shorts)
        base = self.prepare_base(frames[0])
        return self.detect(frames[1:], base)

    # -- multi-chip data parallelism ----------------------------------------
    def detect_sharded(self, shorts, base_rx0, mesh) -> PeakDetection:
        """Pure-DP multi-chip detection: frames sharded over the mesh's
        'data' axis, base replicated.  Frames are independent, so XLA
        auto-partitions the jitted program with zero collectives — the
        sharding IS the parallelism (SURVEY.md §2.2 row 1)."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        s = jax.device_put(
            jnp.asarray(shorts), NamedSharding(mesh, P("data", None))
        )
        b = jax.device_put(base_rx0, NamedSharding(mesh, P()))
        return self.detect(s, b)
