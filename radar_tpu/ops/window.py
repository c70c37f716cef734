"""Window functions (periodic convention, matching the golden model)."""

from __future__ import annotations

import jax.numpy as jnp


def hann(n: int, dtype=jnp.float32) -> jnp.ndarray:
    """Periodic Hann window."""
    k = jnp.arange(n, dtype=dtype)
    return 0.5 - 0.5 * jnp.cos(2.0 * jnp.pi * k / n)
