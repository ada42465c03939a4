"""Batched 3-vector math on jnp arrays (component axis last).

Replaces the reference's scalar ``Point3``/``Vec3`` (``src/utils.rs:72-331``)
with vectorized helpers: every function broadcasts over arbitrary leading
batch axes, so one code path serves a single ray or a wavefront of millions.

The reference's elementwise ``Mul for Point3`` defect (computes rhs*rhs,
``src/utils.rs:313-323``) is intentionally NOT replicated — plain ``*``
broadcasting is correct here.
"""

from __future__ import annotations

import jax.numpy as jnp


def dot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched dot product over the last axis. Keeps batch axes; drops the
    component axis. Reference: src/utils.rs:194-199."""
    return jnp.sum(a * b, axis=-1)


def cross(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched cross product (component axis last). Reference: src/utils.rs:202-210."""
    return jnp.cross(a, b)


def length_squared(a: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(a * a, axis=-1)


def length(a: jnp.ndarray) -> jnp.ndarray:
    return jnp.sqrt(length_squared(a))


def unit(a: jnp.ndarray, eps: float = 0.0) -> jnp.ndarray:
    """Normalize over the last axis. Reference: src/utils.rs:213-218.

    ``eps`` guards against division by zero for degenerate vectors (the
    reference would produce NaNs there too; pass a small eps on paths where
    zero-length inputs are possible).
    """
    n = length(a)[..., None]
    if eps:
        n = jnp.maximum(n, eps)
    return a / n


def near_zero(a: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """True where all components are below eps in magnitude.

    Reference: Vec3::near_zero used by Lambertian scatter degeneracy fix
    (src/materials/lambertian.rs:41-45). The Rust side uses 1e-8 against f64;
    we keep the same threshold in f32 (it only needs to catch the case where
    ``normal + unit_vector`` cancels).
    """
    return jnp.all(jnp.abs(a) < eps, axis=-1)


def safe_arccos(x: jnp.ndarray) -> jnp.ndarray:
    """arccos with finite reverse-mode gradients at |x| >= 1.

    Forward value is exact (clamped arccos); the boundary branch is selected
    from CONSTANTS so the backward pass never multiplies 0 * inf into NaN.
    """
    inside = jnp.abs(x) < 1.0
    x_safe = jnp.where(inside, x, 0.0)
    boundary = jnp.where(x >= 1.0, 0.0, jnp.pi)
    return jnp.where(inside, jnp.arccos(x_safe), boundary)


def safe_arcsin(x: jnp.ndarray) -> jnp.ndarray:
    """arcsin with finite reverse-mode gradients at |x| >= 1 (see
    safe_arccos)."""
    inside = jnp.abs(x) < 1.0
    x_safe = jnp.where(inside, x, 0.0)
    boundary = jnp.where(x >= 1.0, jnp.pi / 2.0, -jnp.pi / 2.0)
    return jnp.where(inside, jnp.arcsin(x_safe), boundary)


def safe_arctan2(y: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """arctan2 whose gradient is zeroed (not NaN) at the (0, 0) pole."""
    pole = (jnp.abs(x) < 1e-20) & (jnp.abs(y) < 1e-20)
    x_safe = jnp.where(pole, 1.0, x)
    y_safe = jnp.where(pole, 0.0, y)
    return jnp.arctan2(y_safe, x_safe)


def reflect(v: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """Mirror reflection of v about unit normal n. Reference: src/utils.rs:151-155."""
    return v - 2.0 * dot(v, n)[..., None] * n


def refract(uv: jnp.ndarray, n: jnp.ndarray, etai_over_etat: jnp.ndarray) -> jnp.ndarray:
    """Snell refraction of unit vector uv about unit normal n.

    Reference: src/utils.rs:158-165. ``etai_over_etat`` broadcasts over batch
    axes (pass shape (...,) or scalar).
    """
    cos_theta = jnp.minimum(dot(-uv, n), 1.0)
    eta = jnp.asarray(etai_over_etat)
    r_out_perp = eta[..., None] * (uv + cos_theta[..., None] * n)
    # abs + tiny floor: keeps d(sqrt) finite at total internal reflection
    # boundaries under reverse-mode AD.
    r_out_parallel = (
        -jnp.sqrt(jnp.maximum(jnp.abs(1.0 - length_squared(r_out_perp)), 1e-12))[
            ..., None
        ]
        * n
    )
    return r_out_perp + r_out_parallel
