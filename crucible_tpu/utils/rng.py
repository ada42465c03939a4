"""Counter-based RNG for reproducible, sharding-invariant rendering.

The reference uses thread-local ``rand::rng()`` everywhere
(src/utils.rs:92-148) so its renders are nondeterministic. Here every random
number is a pure hash of ``(pixel_id, sample_id, stream_id, seed)`` — the
PCG4D mixer from Jarzynski & Olano, "Hash Functions for GPU Rendering"
(JCGT 2020). This makes renders bit-identical regardless of device count,
sharding layout, or tile traversal order, which is what makes golden-image
tests and finite-difference gradient checks feasible (SURVEY.md §7).

Stream-id allocation (per bounce ``b``, NSTREAM_PER_BOUNCE streams each):
  0: shutter time            1: pixel jitter (x=lane0, y=lane1)
  2: defocus disk            3 + 4*b + 0: scatter unit-vector sample
  3 + 4*b + 1: material decision (RR / reflectance)  ... see integrator.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# NumPy (not jnp) so importing this module never initializes a JAX backend —
# device placement must stay deferred until the user picks a platform.
_PCG_MULT = np.uint32(1664525)
_PCG_ADD = np.uint32(1013904223)

# Fixed stream ids for camera-side randomness. The camera consumes ONE
# PCG4D evaluation per ray: jitter x/y on lanes 0-1, defocus disk on lanes
# 2-3 (models/camera.py). Shutter time has its own stream so static scenes
# never pay for it (DCE).
STREAM_TIME = 0
STREAM_PIXEL_JITTER = 1
STREAM_BOUNCE_BASE = 3
STREAMS_PER_BOUNCE = 1  # one hash per bounce: dir u1/u2 + decision


def pcg4d(a, b, c, d):
    """PCG4D hash: four uint32 counters -> four well-mixed uint32 words.

    All inputs broadcast; uint32 arithmetic wraps (defined in XLA).
    """
    x = jnp.asarray(a, jnp.uint32)
    y = jnp.asarray(b, jnp.uint32)
    z = jnp.asarray(c, jnp.uint32)
    w = jnp.asarray(d, jnp.uint32)

    x = x * _PCG_MULT + _PCG_ADD
    y = y * _PCG_MULT + _PCG_ADD
    z = z * _PCG_MULT + _PCG_ADD
    w = w * _PCG_MULT + _PCG_ADD

    x = x + y * w
    y = y + z * x
    z = z + x * y
    w = w + y * z

    x = x ^ (x >> 16)
    y = y ^ (y >> 16)
    z = z ^ (z >> 16)
    w = w ^ (w >> 16)

    x = x + y * w
    y = y + z * x
    z = z + x * y
    w = w + y * z
    return x, y, z, w


def _to_unit_float(u: jnp.ndarray) -> jnp.ndarray:
    """uint32 -> float32 uniform in [0, 1) using the top 24 bits."""
    return (u >> np.uint32(8)).astype(jnp.float32) * np.float32(1.0 / (1 << 24))


def uniform4(pixel_id, sample_id, stream_id, seed):
    """Four independent uniforms in [0,1) per counter tuple. Shapes broadcast."""
    x, y, z, w = pcg4d(pixel_id, sample_id, stream_id, seed)
    return (_to_unit_float(x), _to_unit_float(y), _to_unit_float(z), _to_unit_float(w))


def uniform1(pixel_id, sample_id, stream_id, seed):
    return uniform4(pixel_id, sample_id, stream_id, seed)[0]


def uniform2(pixel_id, sample_id, stream_id, seed):
    u = uniform4(pixel_id, sample_id, stream_id, seed)
    return u[0], u[1]


def uniform3(pixel_id, sample_id, stream_id, seed):
    u = uniform4(pixel_id, sample_id, stream_id, seed)
    return u[0], u[1], u[2]
