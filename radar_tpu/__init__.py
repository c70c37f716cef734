"""radar_tpu — TPU-native mmWave FMCW radar object-detection framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
``codingMMax/CUDA-based-mmWave-Radar-Object-Detection-Acceleration``
(reference mounted at /root/reference):

* TI DCA1000-style binary ADC capture ingest (reference
  cudaBenchMarking.cpp:121-188) — ``radar_tpu.io``
* decode / reshape / clutter-removal / zero-pad preprocessing
  (reference acceleration.cu:91-166) — ``radar_tpu.ops.decode``,
  ``radar_tpu.ops.preproc``
* 16K-point range FFT + peak-scan single-target range estimation
  (reference acceleration.cu:181-247, 391-407) — ``radar_tpu.ops.rangefft``,
  ``radar_tpu.ops.detect``
* extended pipeline: range-Doppler maps, CA-CFAR detection, angle of
  arrival (angle-FFT + Capon) — ``radar_tpu.ops.doppler/cfar/aoa``
* frame-batched, jitted end-to-end pipelines — ``radar_tpu.models``
* multi-chip sharding + double-buffered host->HBM streaming —
  ``radar_tpu.parallel``

The float64 golden model lives in ``radar_tpu.golden`` (NumPy) with a
native C++ twin under ``cpp/`` (the reference's host path is C++).
"""

from radar_tpu.config import RadarConfig, DEFAULT_CONFIG

__version__ = "0.1.0"

__all__ = ["RadarConfig", "DEFAULT_CONFIG", "__version__"]
