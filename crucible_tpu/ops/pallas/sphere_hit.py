"""Fused closest-hit sphere intersection as a Pallas TPU kernel.

Math identical to ops/intersect.hit_spheres (the reference quadratic,
src/objects/sphere.rs:61-105) but fused in VMEM: the jnp version
materializes ~10 (R, N) f32 arrays in HBM per bounce (2 GB at R=1M, N=512
— it falls off a cliff beyond ~128K rays); this kernel keeps the (N, TR)
quadratic tiles in VMEM and writes only the per-ray winners.

Layout: spheres ride the SUBLANE axis, rays the 128-wide LANE axis, so the
two N x R dot products run on the MXU ((N,3) @ (3,TR), K=3 is small but the
MXU still beats lane-broadcast FMAs) and the winner reduction is a sublane
min/argmin. Scene tables (centers', |c|^2 - r^2, active) are resident in
VMEM across the whole grid.

N must be padded to a sublane multiple (the scene builder pads to 128,
models/scene.py SPHERE_PAD); R to TILE_RAYS.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import numpy as np

BIG = np.float32(3.0e38)

TILE_RAYS = 512  # rays per grid step (lane axis, 128-multiple)


def _kernel(o_ref, d_ref, centers_ref, csr_ref, active_ref, t_ref, idx_ref, *, t_min):
    """One ray tile vs the whole sphere table.

    o_ref, d_ref: (3, TR). centers_ref: (N, 3). csr_ref/active_ref: (N, 1)
    |c|^2 - r^2 and 0/1 mask. Outputs (1, TR).
    """
    d_t = d_ref[:]  # (3, TR)
    o_t = o_ref[:]

    a = jnp.sum(d_t * d_t, axis=0, keepdims=True)  # (1, TR)
    d_dot_o = jnp.sum(d_t * o_t, axis=0, keepdims=True)
    o_sq = jnp.sum(o_t * o_t, axis=0, keepdims=True)

    # (N, TR) dot products as explicit f32 FMAs on the VPU. NOT dot_general:
    # the MXU multiplies f32 inputs in bf16 passes unless forced, which
    # corrupted hit decisions (same failure as the jnp path's default
    # matmul precision); K=3 is too small for the MXU to matter anyway.
    c0 = centers_ref[:, 0:1]  # (N, 1)
    c1 = centers_ref[:, 1:2]
    c2 = centers_ref[:, 2:3]
    dc = c0 * d_t[0:1, :] + c1 * d_t[1:2, :] + c2 * d_t[2:3, :]
    oc = c0 * o_t[0:1, :] + c1 * o_t[1:2, :] + c2 * o_t[2:3, :]

    h = dc - d_dot_o  # (N, TR) broadcast over sublanes
    c = csr_ref[:] - 2.0 * oc + o_sq
    disc = h * h - a * c
    sqrtd = jnp.sqrt(jnp.maximum(disc, 0.0))
    inv_a = 1.0 / a
    root0 = (h - sqrtd) * inv_a
    root1 = (h + sqrtd) * inv_a
    ok0 = (root0 > t_min) & (root0 < BIG)
    ok1 = (root1 > t_min) & (root1 < BIG)
    root = jnp.where(ok0, root0, root1)
    valid = (disc >= 0.0) & (ok0 | ok1) & (active_ref[:] > 0.0)
    t_all = jnp.where(valid, root, BIG)

    t_best = jnp.min(t_all, axis=0, keepdims=True)  # (1, TR)
    rows = jax.lax.broadcasted_iota(jnp.int32, t_all.shape, 0)
    idx_best = jnp.min(
        jnp.where(t_all == t_best, rows, jnp.int32(2**30)), axis=0, keepdims=True
    )
    t_ref[:] = t_best
    idx_ref[:] = idx_best


@functools.partial(jax.jit, static_argnames=("t_min", "interpret"))
def hit_spheres_pallas(o, d, centers, csr, active, t_min=1.0e-3, interpret=False):
    """Closest sphere hit per ray via the fused kernel.

    Args:
      o, d: (R, 3) rays; R must be a multiple of TILE_RAYS (pad upstream).
      centers: (N, 3); csr: (N,) = |c|^2 - r^2 precomputed; active: (N,)
        float 0/1. N must be a sublane multiple (scene builder pads to 128).

    Returns (t (R,), idx (R,) int32, hit (R,) bool).
    """
    r = o.shape[0]
    n = centers.shape[0]
    assert r % TILE_RAYS == 0, f"R={r} not a multiple of {TILE_RAYS}"
    assert n % 8 == 0, f"N={n} not a sublane multiple"

    o_t = o.T.astype(jnp.float32)  # (3, R)
    d_t = d.T.astype(jnp.float32)
    c_n = centers.astype(jnp.float32)  # (N, 3)
    csr2 = csr.reshape(n, 1).astype(jnp.float32)
    act2 = active.reshape(n, 1).astype(jnp.float32)

    grid = (r // TILE_RAYS,)
    kernel = functools.partial(_kernel, t_min=np.float32(t_min))
    t_out, idx_out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((3, TILE_RAYS), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, TILE_RAYS), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, 3), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, TILE_RAYS), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_RAYS), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, r), jnp.float32),
            jax.ShapeDtypeStruct((1, r), jnp.int32),
        ],
        interpret=interpret,
    )(o_t, d_t, c_n, csr2, act2)

    t = t_out[0]
    idx = idx_out[0]
    return t, idx, t < BIG
