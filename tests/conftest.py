"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Correctness tests never need real TPU hardware (mirroring how the reference
needs no cluster); multi-chip sharding tests run against
``--xla_force_host_platform_device_count=8``.  Must run before jax imports.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The container's sitecustomize imports jax and registers the TPU plugin at
# interpreter start, so env vars alone are too late; override the platform
# before the backend initializes.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from radar_tpu.config import RadarConfig  # noqa: E402
from radar_tpu.io.synthetic import SceneTarget, synthesize_capture  # noqa: E402


@pytest.fixture(scope="session")
def cfg() -> RadarConfig:
    return RadarConfig()


@pytest.fixture(scope="session")
def targets() -> list[SceneTarget]:
    return [
        SceneTarget(range_m=3.0, velocity_mps=2.0, azimuth_deg=20.0,
                    amplitude=2500.0),
        SceneTarget(range_m=8.0, velocity_mps=-4.0, azimuth_deg=-35.0,
                    amplitude=1500.0),
    ]


@pytest.fixture(scope="session")
def capture(cfg, targets) -> np.ndarray:
    """A 10-frame synthetic capture (frame 0 = base frame)."""
    return synthesize_capture(targets, num_frames=10, cfg=cfg, seed=42)
