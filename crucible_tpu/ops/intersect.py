"""Batched closest-hit primitive intersection.

Sphere math follows the reference quadratic (src/objects/sphere.rs:61-105):
``h = d.oc``, ``c = |oc|^2 - r^2``, roots ``(h -/+ sqrt(disc)) / a`` with the
near root preferred, accepted iff strictly inside (t_min, t_max)
(Interval::surrounds, src/utils.rs:656-659).

TPU re-design: for R rays x N spheres the terms expand to

    h  = (d @ C^T) - (d.o)          c = |C|^2 - 2 (o @ C^T) + |o|^2 - r^2

i.e. two (R,3)x(3,N) matmuls plus rank-1 broadcasts — the whole quadratic
rides the MXU instead of a scalar loop per leaf.

Triangle math is batched Möller–Trumbore (src/objects/triangle.rs:84-140)
with the same epsilon (1e-8) for parallel rays.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from crucible_tpu.utils import backend
import numpy as np

# Plain NumPy so importing never initializes a JAX backend.
BIG = np.float32(3.0e38)  # sentinel "no hit" distance (finite to keep grads clean)
MT_EPS = 1e-8
# Largest sphere table the fused Pallas hit kernel takes (see hit_spheres).
PALLAS_HIT_MAX_ROWS = 2048


def hit_spheres(o, d, centers, radii, active, t_min, t_max):
    """Closest sphere hit per ray — differentiable with an O(R) backward.

    Forward is :func:`_hit_spheres_impl`; the custom VJP differentiates the
    hit distance as an IMPLICIT function of the winning sphere's quadratic
    f(t) = |o + t d - c|^2 - r^2 = 0, so the backward pass touches only the
    R winners (dt/dtheta = -(df/dtheta)/(df/dt)) instead of rematerializing
    the (R, N) candidate matrix — mathematically identical to autodiff
    through the root formula (argmin winners are detached either way), and
    the enabler for large fwd+bwd ray batches.

    Args:
      o, d: ray origins/directions, (R, 3). d need not be normalized
        (the reference never normalizes primary directions).
      centers: (N, 3) static scene, or (R, N, 3) when per-ray times animate
        the scene (motion blur — reference evaluates the timeline per ray,
        src/objects/sphere.rs:67-69).
      radii: (N,) or (R, N).
      active: (N,) or (R, N) bool — False for hidden/padding spheres
        (reference ``hide`` flag, src/objects/sphere.rs:62-64).
      t_min, t_max: scalar acceptance interval (exclusive, "surrounds").

    Returns:
      t: (R,) hit distance (BIG where no hit)
      idx: (R,) int32 index of the winning sphere (0 where no hit)
      hit: (R,) bool
    """
    import math

    # The primal may ride the fused Pallas kernel (ops/pallas/sphere_hit.py)
    # when shapes align and bounds are the standard (t_min, inf) — forward
    # AND the remat recompute inside jax.checkpoint'd bounce scans then run
    # at kernel speed, while the analytic winner-only backward needs no
    # kernel VJP at all.
    use_pl = (
        centers.ndim == 2
        and isinstance(t_min, (int, float))
        and isinstance(t_max, (int, float))
        and math.isinf(t_max)
        and o.shape[0] % 512 == 0
        and centers.shape[0] % 8 == 0
        # The fused kernel materializes ~4 (N, 512) f32 intermediates in
        # scoped VMEM: 1936 rows measured at the ~16 MB limit, 7744 OOM'd
        # 66 MB (tools/tpu_results.jsonl structrec, r5 final). Large tables
        # take the jnp (R, N) path, which XLA tiles freely.
        and centers.shape[0] <= PALLAS_HIT_MAX_ROWS
        and backend.on_accelerator()
    )
    return _closest_hit(
        o, d, centers, radii,
        jnp.asarray(active).astype(jnp.float32),
        jnp.asarray(t_min, jnp.float32),
        jnp.asarray(t_max, jnp.float32),
        float(t_min) if use_pl else 0.0,
        use_pl,
    )


def _closest_hit_primal(o, d, centers, radii, active_f, t_min, t_max, t_min_s, use_pl):
    if use_pl:
        from crucible_tpu.ops.pallas.sphere_hit import hit_spheres_pallas

        csr = jnp.sum(centers * centers, -1) - radii * radii
        return hit_spheres_pallas(o, d, centers, csr, active_f, t_min=t_min_s)
    return _hit_spheres_impl(o, d, centers, radii, active_f > 0.0, t_min, t_max)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def _closest_hit(o, d, centers, radii, active_f, t_min, t_max, t_min_s, use_pl):
    return _closest_hit_primal(
        o, d, centers, radii, active_f, t_min, t_max, t_min_s, use_pl
    )


def _closest_hit_fwd(o, d, centers, radii, active_f, t_min, t_max, t_min_s, use_pl):
    out = _closest_hit_primal(
        o, d, centers, radii, active_f, t_min, t_max, t_min_s, use_pl
    )
    t, idx, hit = out
    return out, (o, d, centers, radii, active_f, t, idx, hit)


def _closest_hit_bwd(t_min_s, use_pl, res, cts):
    o, d, centers, radii, active_f, t, idx, hit = res
    t_bar = cts[0]  # cotangents of idx/hit are symbolic zeros
    if centers.ndim == 2:
        c_w = jnp.take(centers, idx, axis=0)  # (R, 3)
        r_w = jnp.take(radii, idx, axis=0)
    else:
        c_w = jnp.take_along_axis(centers, idx[:, None, None], axis=1)[:, 0]
        r_w = jnp.take_along_axis(radii, idx[:, None], axis=1)[:, 0]
    # Miss lanes carry t = BIG; 3e38 * |d| overflows to inf and 0 * inf
    # would NaN the masked-out products below — mask t first.
    t_safe = jnp.where(hit, t, 1.0)
    nvec = o + t_safe[:, None] * d - c_w  # hit point minus center
    den = jnp.sum(d * nvec, axis=-1)  # = (df/dt)/2 at the root
    # Guard tangent hits (den ~ 0, where the true derivative diverges).
    safe_den = jnp.where(jnp.abs(den) > 1e-12, den, 1.0)
    g = jnp.where(hit & (jnp.abs(den) > 1e-12), t_bar / safe_den, 0.0)
    go = -g[:, None] * nvec  # dt/do = -nvec/den
    gd = -(g * t_safe)[:, None] * nvec  # dt/dd = -t*nvec/den
    gc_rows = jnp.where(hit[:, None], g[:, None] * nvec, 0.0)  # dt/dc = +nvec/den
    gr_rows = jnp.where(hit, g * r_w, 0.0)  # dt/dr = r/den
    if centers.ndim == 2:
        gc = jnp.zeros_like(centers).at[idx].add(gc_rows)
        gr = jnp.zeros_like(radii).at[idx].add(gr_rows)
    else:
        r_ar = jnp.arange(idx.shape[0])
        gc = jnp.zeros_like(centers).at[r_ar, idx].add(gc_rows)
        gr = jnp.zeros_like(radii).at[r_ar, idx].add(gr_rows)
    zero = jnp.zeros((), jnp.float32)
    return go, gd, gc, gr, jnp.zeros_like(active_f), zero, zero


_closest_hit.defvjp(_closest_hit_fwd, _closest_hit_bwd)


def _hit_spheres_impl(o, d, centers, radii, active, t_min, t_max):
    a = jnp.sum(d * d, axis=-1)[:, None]  # (R, 1)
    if centers.ndim == 2:
        # MXU path: static scene. f32 accumulation is mandatory — the TPU
        # default matmul precision is bf16, which corrupts the quadratic
        # (observed 7.6% wrong hit decisions vs CPU).
        hi = jax.lax.Precision.HIGHEST
        d_dot_c = jnp.dot(d, centers.T, precision=hi)  # (R, N)
        o_dot_c = jnp.dot(o, centers.T, precision=hi)  # (R, N)
        c_sq = jnp.sum(centers * centers, axis=-1)[None, :]  # (1, N)
        r_sq = (radii * radii)[None, :]
        act = active[None, :]
    else:
        # Animated path: per-ray centers.
        d_dot_c = jnp.sum(d[:, None, :] * centers, axis=-1)
        o_dot_c = jnp.sum(o[:, None, :] * centers, axis=-1)
        c_sq = jnp.sum(centers * centers, axis=-1)
        r_sq = radii * radii
        act = active if active.ndim == 2 else active[None, :]

    h = d_dot_c - jnp.sum(d * o, axis=-1)[:, None]  # (R, N)
    c = c_sq - 2.0 * o_dot_c + jnp.sum(o * o, axis=-1)[:, None] - r_sq
    disc = h * h - a * c
    # Double-where so reverse-mode AD never sees d(sqrt)/dx at x<=0 = inf
    # (inf * 0 = NaN would poison camera/geometry gradients).
    disc_pos = disc > 0.0
    sqrtd = jnp.where(disc_pos, jnp.sqrt(jnp.where(disc_pos, disc, 1.0)), 0.0)

    root0 = (h - sqrtd) / a
    root1 = (h + sqrtd) / a
    ok0 = (root0 > t_min) & (root0 < t_max)
    ok1 = (root1 > t_min) & (root1 < t_max)
    root = jnp.where(ok0, root0, root1)
    valid = (disc >= 0.0) & (ok0 | ok1) & act

    t_all = jnp.where(valid, root, BIG)
    idx = jnp.argmin(t_all, axis=-1).astype(jnp.int32)
    t = jnp.take_along_axis(t_all, idx[:, None], axis=-1)[:, 0]
    return t, idx, t < BIG


def hit_spheres_moving(o, d, w, ca, cd, ra, rd, active, t_min, t_max):
    """Closest hit against linearly-moving spheres, MXU-formulated.

    Motion model: center(w) = ca + w*cd, radius(w) = ra + w*rd with the
    per-ray shutter fraction w in [0,1] (models/timeline.py linear-shutter
    lowering; the reference instead re-evaluates the whole timeline per ray,
    src/objects/sphere.rs:67-69 — identical for piecewise-linear tracks with
    no keyframe inside the frame's shutter window).

    All (R, N) terms expand into static matmuls plus w-weighted lerps:
      d.c(w)   = d@ca' + w*(d@cd')
      |c(w)|^2 = |ca|^2 + 2w(ca.cd) + w^2|cd|^2      (per-sphere scalars)
      r(w)^2   = ra^2 + 2w(ra*rd) + w^2 rd^2
    so the animated path costs two extra matmuls and no (R, N, 3) tensors.

    Differentiable with an O(R) winner-only backward (custom VJP mirroring
    hit_spheres): dt/d(ca) = nvec/den per winner, the motion leaves pick up
    an extra factor w (dt/d(cd) = w * nvec/den, dt/d(rd) = w * r(w)/den).
    The shutter fraction w itself is an RNG sample (detached).

    Args: o, d (R,3); w (R,); ca/cd (N,3); ra/rd (N,); active (N,) bool.
    Returns (t, idx, hit) like hit_spheres.
    """
    return _moving_hit(
        o, d, w, ca, cd, ra, rd,
        jnp.asarray(active).astype(jnp.float32),
        jnp.asarray(t_min, jnp.float32),
        jnp.asarray(t_max, jnp.float32),
    )


@jax.custom_vjp
def _moving_hit(o, d, w, ca, cd, ra, rd, active_f, t_min, t_max):
    return _moving_hit_impl(o, d, w, ca, cd, ra, rd, active_f, t_min, t_max)


def _moving_hit_fwd(o, d, w, ca, cd, ra, rd, active_f, t_min, t_max):
    out = _moving_hit_impl(o, d, w, ca, cd, ra, rd, active_f, t_min, t_max)
    t, idx, hit = out
    return out, (o, d, w, ca, cd, ra, rd, t, idx, hit)


def _moving_hit_bwd(res, cts):
    o, d, w, ca, cd, ra, rd, t, idx, hit = res
    t_bar = cts[0]
    c_w = jnp.take(ca, idx, axis=0) + w[:, None] * jnp.take(cd, idx, axis=0)
    r_w = jnp.take(ra, idx, axis=0) + w * jnp.take(rd, idx, axis=0)
    t_safe = jnp.where(hit, t, 1.0)
    nvec = o + t_safe[:, None] * d - c_w
    den = jnp.sum(d * nvec, axis=-1)
    safe_den = jnp.where(jnp.abs(den) > 1e-12, den, 1.0)
    g = jnp.where(hit & (jnp.abs(den) > 1e-12), t_bar / safe_den, 0.0)
    go = -g[:, None] * nvec
    gd = -(g * t_safe)[:, None] * nvec
    gc_rows = jnp.where(hit[:, None], g[:, None] * nvec, 0.0)
    gr_rows = jnp.where(hit, g * r_w, 0.0)
    gca = jnp.zeros_like(ca).at[idx].add(gc_rows)
    gcd = jnp.zeros_like(cd).at[idx].add(w[:, None] * gc_rows)
    gra = jnp.zeros_like(ra).at[idx].add(gr_rows)
    grd = jnp.zeros_like(rd).at[idx].add(w * gr_rows)
    zero = jnp.zeros((), jnp.float32)
    # w is an RNG sample: detached (its true derivative moves the shutter
    # instant, a term the detached-sampling estimator excludes).
    return (
        go, gd, jnp.zeros_like(w), gca, gcd, gra, grd,
        jnp.zeros_like(ca[:, 0]), zero, zero,
    )


_moving_hit.defvjp(_moving_hit_fwd, _moving_hit_bwd)


def _moving_hit_impl(o, d, w, ca, cd, ra, rd, active_f, t_min, t_max):
    active = active_f > 0.0
    hi = jax.lax.Precision.HIGHEST
    wcol = w[:, None]  # (R, 1)
    d_dot_c = jnp.dot(d, ca.T, precision=hi) + wcol * jnp.dot(d, cd.T, precision=hi)
    o_dot_c = jnp.dot(o, ca.T, precision=hi) + wcol * jnp.dot(o, cd.T, precision=hi)
    c_sq = (
        jnp.sum(ca * ca, -1)[None, :]
        + 2.0 * wcol * jnp.sum(ca * cd, -1)[None, :]
        + (wcol * wcol) * jnp.sum(cd * cd, -1)[None, :]
    )
    r_sq = (
        (ra * ra)[None, :]
        + 2.0 * wcol * (ra * rd)[None, :]
        + (wcol * wcol) * (rd * rd)[None, :]
    )

    a = jnp.sum(d * d, axis=-1)[:, None]
    h = d_dot_c - jnp.sum(d * o, axis=-1)[:, None]
    c = c_sq - 2.0 * o_dot_c + jnp.sum(o * o, axis=-1)[:, None] - r_sq
    disc = h * h - a * c
    disc_pos = disc > 0.0
    sqrtd = jnp.where(disc_pos, jnp.sqrt(jnp.where(disc_pos, disc, 1.0)), 0.0)
    root0 = (h - sqrtd) / a
    root1 = (h + sqrtd) / a
    ok0 = (root0 > t_min) & (root0 < t_max)
    ok1 = (root1 > t_min) & (root1 < t_max)
    root = jnp.where(ok0, root0, root1)
    valid = disc_pos & (ok0 | ok1) & active[None, :]
    t_all = jnp.where(valid, root, BIG)
    idx = jnp.argmin(t_all, axis=-1).astype(jnp.int32)
    t = jnp.take_along_axis(t_all, idx[:, None], axis=-1)[:, 0]
    return t, idx, t < BIG


def sphere_uv(n):
    """(u, v) texture coordinates from the unit outward normal.

    Reference: src/objects/sphere.rs:41-46 — theta = acos(-y),
    phi = atan2(-z, x) + pi; u = phi/2pi, v = theta/pi.
    """
    from crucible_tpu.utils.vec import safe_arccos, safe_arctan2

    theta = safe_arccos(-n[..., 1])
    phi = safe_arctan2(-n[..., 2], n[..., 0]) + jnp.pi
    return phi / (2.0 * jnp.pi), theta / jnp.pi


def hit_triangles(o, d, v0, v1, v2, active, t_min, t_max, v0d=None, v1d=None, v2d=None, w=None):
    """Closest triangle hit per ray via batched Möller–Trumbore.

    Args:
      o, d: (R, 3); v0/v1/v2: (M, 3) or (R, M, 3) (animated); active: (M,).
      v0d/v1d/v2d, w: optional linear shutter motion (vertex + w * delta,
        per-ray w) — the brute-force path materializes (R, M, 3) so keep M
        small here; the BVH path (ops/traverse.py) lerps per leaf instead.

    Returns (t, idx, hit) like :func:`hit_spheres`. Barycentrics are
    recomputed at shading time for the winner only.
    """
    if v0.ndim == 2:
        v0b, v1b, v2b = v0[None], v1[None], v2[None]  # (1, M, 3)
    else:
        v0b, v1b, v2b = v0, v1, v2
    if v0d is not None:
        wb = w[:, None, None]
        v0b = v0b + wb * v0d[None]
        v1b = v1b + wb * v1d[None]
        v2b = v2b + wb * v2d[None]
    e1 = v1b - v0b
    e2 = v2b - v0b
    ob = o[:, None, :]
    db = d[:, None, :]

    pvec = jnp.cross(db, e2)
    det = jnp.sum(e1 * pvec, axis=-1)
    inv_det = jnp.where(jnp.abs(det) > MT_EPS, 1.0 / jnp.where(det == 0, 1.0, det), 0.0)
    tvec = ob - v0b
    u = jnp.sum(tvec * pvec, axis=-1) * inv_det
    qvec = jnp.cross(tvec, e1)
    v = jnp.sum(db * qvec, axis=-1) * inv_det
    t = jnp.sum(e2 * qvec, axis=-1) * inv_det

    valid = (
        (jnp.abs(det) > MT_EPS)
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > t_min)
        & (t < t_max)
        & (active if active.ndim == 2 else active[None, :])
    )
    t_all = jnp.where(valid, t, BIG)
    idx = jnp.argmin(t_all, axis=-1).astype(jnp.int32)
    t_best = jnp.take_along_axis(t_all, idx[:, None], axis=-1)[:, 0]
    return t_best, idx, t_best < BIG


def triangle_normal(v0, v1, v2):
    """Geometric normal e1 x e2, normalized (reference uses
    HitRecord::safe_new which normalizes, src/objects/triangle.rs:120-140)."""
    n = jnp.cross(v1 - v0, v2 - v0)
    return n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-20)


def hit_aabbs(o, d, box_min, box_max, t_min, t_max):
    """Batched slab test: R rays x K boxes.

    Reference: Aabb::hit (src/objects/bvh.rs:96-132) iterates axes with
    early-out; here all axes and boxes evaluate in parallel and the interval
    intersection is a max/min reduction.

    Args: o, d (R,3); box_min/box_max (K,3). Returns (R, K) bool.
    """
    # Avoid 0 * inf = nan when a ray is axis-aligned AND starts on a slab
    # plane: nudge zero components to a tiny signed epsilon instead.
    d_safe = jnp.where(jnp.abs(d) < 1e-30, jnp.where(d >= 0, 1e-30, -1e-30), d)
    inv_d = 1.0 / d_safe
    t0 = (box_min[None, :, :] - o[:, None, :]) * inv_d[:, None, :]
    t1 = (box_max[None, :, :] - o[:, None, :]) * inv_d[:, None, :]
    lo = jnp.minimum(t0, t1)
    hi = jnp.maximum(t0, t1)
    enter = jnp.maximum(jnp.max(lo, axis=-1), t_min)
    exit_ = jnp.minimum(jnp.min(hi, axis=-1), t_max)
    return enter < exit_
