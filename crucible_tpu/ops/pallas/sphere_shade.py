"""Fused sphere intersect + winner-attribute fetch kernel (static + moving).

The pure intersect kernel (sphere_hit.py) still leaves ~10 per-ray table
gathers in the shading code (center/radius/material/texture of the winning
sphere) — at ~7.5 ns/element, gathers dominated the persistent loop (~75 ms
of a 140 ms iteration at 1M lanes). Here the winner's attributes are
extracted INSIDE the kernel as exact one-hot masked reductions over the
sphere axis while the (N, TR) quadratic is still in VMEM, so the outer
shade code is pure elementwise arithmetic with ZERO gathers.

Motion: linear-shutter model (models/timeline.py) — center(w) = c + w*cd,
radius(w) = r + w*rd with the per-ray shutter fraction w. The quadratic's
|c(w)|^2 - r(w)^2 expands into three per-sphere scalars s0 + 2w*s1 + w^2*s2
so the moving case costs two extra FMA sets. Static scenes pass w = 0 and
zero deltas (the compiler folds them).

The per-sphere attribute table is assembled in jit from the differentiable
scene tables (integrator.make_sphere_table) — loop-invariant; this kernel
is forward-only (the differentiable path uses the jnp ops).

Input table columns (N, C_IN = 32):
  0-2 center, 3 radius, 4 s0 = |c|^2 - r^2, 5 active,
  6 mat_type, 7 fuzz, 8 ior, 9 prob, 10-12 emission, 13 tex_kind,
  14-16 solid color, 17 checker inv_scale, 18-20 even color, 21-23 odd,
  24-26 center delta, 27 radius delta, 28 s1 = c.cd - r*rd,
  29 s2 = |cd|^2 - rd^2, 30-31 pad.

Output rows (C_OUT = 32 x TR):
  0 t, 1 idx, 2-4 center, 5 radius, 6..23 = shading cols 6..23,
  24-26 center delta, 27 radius delta, 28-31 pad.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import numpy as np

BIG = np.float32(3.0e38)
TILE_RAYS = 512

C_IN = 32
C_OUT = 32


def _kernel(o_ref, d_ref, w_ref, table_ref, out_ref, *, t_min):
    d_t = d_ref[:]  # (3, TR)
    o_t = o_ref[:]
    w = w_ref[:]  # (1, TR)

    a = jnp.sum(d_t * d_t, axis=0, keepdims=True)  # (1, TR)
    d_dot_o = jnp.sum(d_t * o_t, axis=0, keepdims=True)
    o_sq = jnp.sum(o_t * o_t, axis=0, keepdims=True)

    def col(c):
        return table_ref[:, c : c + 1]  # (N, 1)

    cx, cy, cz = col(0), col(1), col(2)
    s0, act = col(4), col(5)
    cdx, cdy, cdz = col(24), col(25), col(26)
    s1, s2 = col(28), col(29)

    # f32 FMAs (not dot_general — the MXU multiplies f32 in bf16 passes,
    # which corrupted hit decisions); K=3 is too small for the MXU anyway.
    dc_a = cx * d_t[0:1, :] + cy * d_t[1:2, :] + cz * d_t[2:3, :]  # (N, TR)
    dc_d = cdx * d_t[0:1, :] + cdy * d_t[1:2, :] + cdz * d_t[2:3, :]
    oc_a = cx * o_t[0:1, :] + cy * o_t[1:2, :] + cz * o_t[2:3, :]
    oc_d = cdx * o_t[0:1, :] + cdy * o_t[1:2, :] + cdz * o_t[2:3, :]

    dc = dc_a + w * dc_d
    oc = oc_a + w * oc_d
    csr = s0 + (2.0 * w) * s1 + (w * w) * s2

    h = dc - d_dot_o
    c = csr - 2.0 * oc + o_sq
    disc = h * h - a * c
    sqrtd = jnp.sqrt(jnp.maximum(disc, 0.0))
    inv_a = 1.0 / a
    root0 = (h - sqrtd) * inv_a
    root1 = (h + sqrtd) * inv_a
    ok0 = (root0 > t_min) & (root0 < BIG)
    ok1 = (root1 > t_min) & (root1 < BIG)
    root = jnp.where(ok0, root0, root1)
    valid = (disc >= 0.0) & (ok0 | ok1) & (act > 0.0)
    t_all = jnp.where(valid, root, BIG)

    t_best = jnp.min(t_all, axis=0, keepdims=True)  # (1, TR)
    rows = jax.lax.broadcasted_iota(jnp.int32, t_all.shape, 0)
    idx_best = jnp.min(
        jnp.where(t_all == t_best, rows, jnp.int32(2**30)), axis=0, keepdims=True
    )
    win = (rows == idx_best) & (t_best < BIG)  # exact one-hot (N, TR)

    out_ref[0:1, :] = t_best
    out_ref[1:2, :] = idx_best.astype(jnp.float32)
    for out_row, c in [(2, 0), (3, 1), (4, 2), (5, 3)]:  # center, radius
        out_ref[out_row : out_row + 1, :] = jnp.sum(
            jnp.where(win, col(c), 0.0), axis=0, keepdims=True
        )
    for c in range(6, 24):  # shading columns, same row index
        out_ref[c : c + 1, :] = jnp.sum(
            jnp.where(win, col(c), 0.0), axis=0, keepdims=True
        )
    for c in range(24, 28):  # center/radius deltas
        out_ref[c : c + 1, :] = jnp.sum(
            jnp.where(win, col(c), 0.0), axis=0, keepdims=True
        )


@functools.partial(jax.jit, static_argnames=("t_min", "interpret"))
def hit_spheres_fetch(o, d, w, table, t_min=1.0e-3, interpret=False):
    """Closest sphere hit + winner attributes in one fused pass.

    Args:
      o, d: (R, 3) rays, R a multiple of TILE_RAYS.
      w: (R,) per-ray shutter fraction (zeros for static scenes).
      table: (N, C_IN) per-sphere attribute table (make_sphere_table).

    Returns an (C_OUT, R) f32 array (see module docstring for rows).
    """
    r = o.shape[0]
    n = table.shape[0]
    assert r % TILE_RAYS == 0, f"R={r} not a multiple of {TILE_RAYS}"
    assert table.shape[1] == C_IN

    o_t = o.T.astype(jnp.float32)
    d_t = d.T.astype(jnp.float32)
    w_t = w.reshape(1, r).astype(jnp.float32)

    grid = (r // TILE_RAYS,)
    kernel = functools.partial(_kernel, t_min=np.float32(t_min))
    (out,) = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((3, TILE_RAYS), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, TILE_RAYS), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_RAYS), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, C_IN), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((C_OUT, TILE_RAYS), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((C_OUT, r), jnp.float32)],
        interpret=interpret,
    )(o_t, d_t, w_t, table)
    return out
