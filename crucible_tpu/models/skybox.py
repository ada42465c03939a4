"""Skybox: default white-blue gradient or spherical (equirect) image.

Reference: ``Skybox`` enum (src/scene/mod.rs:18-46) and the miss-shader in
``ray_color`` (src/camera/ray_casting.rs:133-151). The skybox is the only
light source in the reference (no emissive materials), so its radiance — and
its gradient w.r.t. the skybox image — dominates every render.

Deviation (documented, SURVEY.md §7): HDR skyboxes keep full float range
here, instead of the reference's rgb8 tone-crush (src/asset_loader/
img_loader.rs:28 ``to_rgb8``).
"""

from __future__ import annotations

import jax.numpy as jnp

from crucible_tpu.models.textures import image_lookup
from crucible_tpu.utils import vec

DEFAULT = 0
SPHERICAL = 1


def default_gradient(d: jnp.ndarray) -> jnp.ndarray:
    """White -> (0.5, 0.7, 1.0) vertical lerp on the unit direction
    (src/camera/ray_casting.rs:145-150)."""
    ud = vec.unit(d, eps=1e-20)
    a = 0.5 * (ud[..., 1] + 1.0)
    white = jnp.ones((3,), dtype=d.dtype)
    blue = jnp.array([0.5, 0.7, 1.0], dtype=d.dtype)
    return (1.0 - a)[..., None] * white + a[..., None] * blue


def spherical(image: jnp.ndarray, d: jnp.ndarray) -> jnp.ndarray:
    """Equirectangular lookup: theta = atan2(x, z), phi = asin(y);
    u = theta/2pi + 0.5, v = phi/pi + 0.5 (src/camera/ray_casting.rs:134-144),
    then the same clamp + v-flip image mapping as textures
    (src/scene/mod.rs:37-45)."""
    ud = vec.unit(d, eps=1e-20)
    theta = vec.safe_arctan2(ud[..., 0], ud[..., 2])
    phi = vec.safe_arcsin(ud[..., 1])
    u = theta / (2.0 * jnp.pi) + 0.5
    v = phi / jnp.pi + 0.5
    return image_lookup(image, u, v)


def radiance(kind: int, image, d: jnp.ndarray) -> jnp.ndarray:
    """Miss-shader radiance. ``kind`` is static (baked into the jit trace)."""
    if kind == SPHERICAL:
        return spherical(image, d)
    return default_gradient(d)
