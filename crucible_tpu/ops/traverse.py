"""Stackless lockstep BVH traversal for a wavefront of rays.

The reference traverses a pointer tree recursively, mutating shared AABBs
per ray (src/objects/bvhwrapper.rs:97-127) — per-ray mutation is the reason
every render thread clones the whole world there (SURVEY.md §2.7). Here
traversal is a single ``lax.while_loop`` over the whole ray batch: every ray
carries a DFS cursor into the flat skip-link BVH (ops/bvh.py); on bbox hit
at an inner node the cursor advances to the left child (``i+1``), otherwise
it follows the ``miss`` link. Closest-hit distance doubles as the shrinking
t_max, like the reference capping the right-child interval at the left hit
(bvhwrapper.rs:108-119).

All rays run in lockstep; the loop ends when every cursor has walked off the
end. The cursor is strictly increasing, so the step count is bounded by the
node count.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from crucible_tpu.ops.intersect import BIG, MT_EPS


def _mt_single(o, d, a, b, c, t_min, t_max):
    """Möller–Trumbore for one (per-ray) triangle: all args (R, 3) except
    the scalar/broadcast t bounds. Returns (t, valid)."""
    e1 = b - a
    e2 = c - a
    pvec = jnp.cross(d, e2)
    det = jnp.sum(e1 * pvec, axis=-1)
    inv_det = jnp.where(jnp.abs(det) > MT_EPS, 1.0 / jnp.where(det == 0, 1.0, det), 0.0)
    tvec = o - a
    u = jnp.sum(tvec * pvec, axis=-1) * inv_det
    qvec = jnp.cross(tvec, e1)
    v = jnp.sum(d * qvec, axis=-1) * inv_det
    t = jnp.sum(e2 * qvec, axis=-1) * inv_det
    valid = (
        (jnp.abs(det) > MT_EPS)
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > t_min)
        & (t < t_max)
    )
    return t, valid


def bvh_hit_triangles(
    o,
    d,
    v0,
    v1,
    v2,
    node_min,
    node_max,
    node_first,
    node_count,
    node_miss,
    t_min,
    t_max,
    leaf_size: int,
    v0d=None,
    v1d=None,
    v2d=None,
    w=None,
    vertex_fn=None,
):
    """Closest triangle hit through the flat BVH.

    Args:
      o, d: (R, 3) rays.
      v0, v1, v2: (M, 3) triangle vertices in LEAF ORDER (pre-permuted).
      node_*: flat BVH arrays (K nodes). For moving meshes the node boxes
        must enclose the shutter-open AND shutter-close vertex positions
        (union refit, ops/bvh.py).
      t_min, t_max: scalar acceptance bounds.
      leaf_size: static max primitives per leaf (unrolled).
      v0d/v1d/v2d, w: optional linear shutter motion — vertex(w) =
        v + w * vd with per-ray w (see hit_spheres_moving).
      vertex_fn: optional ``pid (R,) -> (a, b, c)`` candidate-vertex
        evaluator overriding the v0/v1/v2 gathers — the exact per-ray-time
        hook (piecewise-linear timeline tracks evaluated at each ray's
        absolute time, mirroring the reference's per-ray ``update_bb`` +
        leaf-timeline evaluation, src/objects/bvhwrapper.rs:102-106).
        Node boxes must then enclose the FULL trajectory over the shutter
        window (models/scene.py unions bounds over keyframe breakpoints).

    Returns:
      t: (R,) distance (BIG where miss)
      idx: (R,) winning triangle index in leaf order
      hit: (R,) bool
    """
    num_nodes = node_min.shape[0]
    num_prims = v0.shape[0]
    r = o.shape[0]

    inv_d = 1.0 / jnp.where(jnp.abs(d) < 1e-30, jnp.where(d >= 0, 1e-30, -1e-30), d)

    def cond(state):
        cursor, _, _ = state
        return jnp.any(cursor < num_nodes)

    def body(state):
        cursor, t_best, idx_best = state
        done = cursor >= num_nodes
        cur = jnp.minimum(cursor, num_nodes - 1)

        lo = jnp.take(node_min, cur, axis=0)  # (R, 3)
        hi = jnp.take(node_max, cur, axis=0)
        t0 = (lo - o) * inv_d
        t1 = (hi - o) * inv_d
        enter = jnp.maximum(jnp.max(jnp.minimum(t0, t1), axis=-1), t_min)
        exit_ = jnp.minimum(jnp.min(jnp.maximum(t0, t1), axis=-1), t_best)
        box_hit = (enter <= exit_) & ~done

        count = jnp.take(node_count, cur, axis=0)
        first = jnp.take(node_first, cur, axis=0)
        is_leaf = count > 0

        def leaf_tests(carry):
            t_b, i_b = carry
            for li in range(leaf_size):
                pid = jnp.minimum(first + li, num_prims - 1)
                test = box_hit & is_leaf & (li < count)
                if vertex_fn is not None:
                    a, b, c = vertex_fn(pid)
                else:
                    a = jnp.take(v0, pid, axis=0)
                    b = jnp.take(v1, pid, axis=0)
                    c = jnp.take(v2, pid, axis=0)
                    if v0d is not None:
                        wcol = w[:, None]
                        a = a + wcol * jnp.take(v0d, pid, axis=0)
                        b = b + wcol * jnp.take(v1d, pid, axis=0)
                        c = c + wcol * jnp.take(v2d, pid, axis=0)
                t_hit, valid = _mt_single(o, d, a, b, c, t_min, t_b)
                upd = test & valid
                t_b = jnp.where(upd, t_hit, t_b)
                i_b = jnp.where(upd, pid, i_b)
            return t_b, i_b

        t_best, idx_best = leaf_tests((t_best, idx_best))

        miss_link = jnp.take(node_miss, cur, axis=0)
        nxt = jnp.where(
            box_hit & ~is_leaf,
            cur + 1,
            jnp.where(done, num_nodes, miss_link),
        )
        return nxt, t_best, idx_best

    cursor0 = jnp.zeros((r,), jnp.int32)
    t_best0 = jnp.full((r,), jnp.asarray(t_max, jnp.float32))
    idx0 = jnp.zeros((r,), jnp.int32)
    _, t_best, idx_best = jax.lax.while_loop(cond, body, (cursor0, t_best0, idx0))

    hit = t_best < jnp.minimum(jnp.asarray(t_max, jnp.float32), BIG)
    t_out = jnp.where(hit, t_best, BIG)
    return t_out, idx_best, hit
