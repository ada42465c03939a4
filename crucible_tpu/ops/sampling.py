"""Closed-form geometric samplers.

The reference draws these with rejection sampling loops
(src/utils.rs:113-148) — a data-dependent loop that cannot live under jit.
We use exact closed-form maps from uniforms instead (equal distribution,
different sequences — image comparisons are therefore statistical at matched
spp, per SURVEY.md §7 "Counter-based RNG").
"""

from __future__ import annotations

import jax.numpy as jnp

TWO_PI = 2.0 * jnp.pi


def unit_vector(u1: jnp.ndarray, u2: jnp.ndarray) -> jnp.ndarray:
    """Uniform direction on the unit sphere from two uniforms.

    Replaces ``random_unit_vector`` (rejection, src/utils.rs:130-139).
    Returns (..., 3).
    """
    z = 1.0 - 2.0 * u1
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = TWO_PI * u2
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def on_hemisphere(u1, u2, normal: jnp.ndarray) -> jnp.ndarray:
    """Uniform direction on the hemisphere around ``normal``
    (src/utils.rs:142-148)."""
    v = unit_vector(u1, u2)
    flip = jnp.sum(v * normal, axis=-1, keepdims=True) < 0.0
    return jnp.where(flip, -v, v)


def in_unit_disk(u1: jnp.ndarray, u2: jnp.ndarray) -> jnp.ndarray:
    """Uniform point in the unit disk (replaces rejection sampling at
    src/utils.rs:113-121). Returns (..., 2)."""
    r = jnp.sqrt(u1)
    phi = TWO_PI * u2
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi)], axis=-1)


def square_offset(u1: jnp.ndarray, u2: jnp.ndarray) -> jnp.ndarray:
    """Antialiasing jitter in [-0.5, 0.5)^2 (reference ``sample_square``,
    src/camera/mod.rs:368-376). Returns (..., 2)."""
    return jnp.stack([u1 - 0.5, u2 - 0.5], axis=-1)
