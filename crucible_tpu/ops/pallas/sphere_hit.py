"""Fused closest-hit sphere intersection as a Pallas TPU kernel.

Math identical to ops/intersect.hit_spheres (the reference quadratic,
src/objects/sphere.rs:61-105) but fused: the (TR, NC) per-chunk quadratic
lives entirely in VMEM and only the per-ray winners (t, index) ever touch
HBM. The jnp version writes ~13 (R, N) f32 arrays to HBM per bounce
(~1.7 GB at R=64K, N=512); this kernel writes 2 (R,) arrays.

Layout: rays are transposed to (3, R) so the ray axis rides the 128-wide
lanes; spheres are chunked 128 at a time along lanes with rays on sublanes
for the dot products. N must be padded to a multiple of 128 (the scene
builder pads with ``active=0`` rows — models/scene.py SPHERE_PAD).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import numpy as np

BIG = np.float32(3.0e38)

# Rays per grid step (sublane axis of the (TR, NC) quadratic tiles).
TILE_RAYS = 512
# Spheres per inner chunk (lane axis).
CHUNK = 128


def _kernel(o_ref, d_ref, centers_ref, csr_ref, active_ref, t_ref, idx_ref, *, n_spheres, t_min):
    """One ray tile vs all spheres.

    o_ref, d_ref: (3, TR) ray tile. centers_ref: (3, N). csr_ref: (1, N)
    |c|^2 - r^2. active_ref: (1, N) 0/1 mask. Outputs (1, TR).
    """
    o0 = o_ref[0, :]
    o1 = o_ref[1, :]
    o2 = o_ref[2, :]
    d0 = d_ref[0, :]
    d1 = d_ref[1, :]
    d2 = d_ref[2, :]

    a = d0 * d0 + d1 * d1 + d2 * d2  # (TR,)
    d_dot_o = d0 * o0 + d1 * o1 + d2 * o2
    o_sq = o0 * o0 + o1 * o1 + o2 * o2
    inv_a = 1.0 / a

    num_chunks = n_spheres // CHUNK

    def chunk_body(k, carry):
        t_best, idx_best = carry  # (TR,), (TR,) f32
        off = k * CHUNK
        cx = centers_ref[0, pl.ds(off, CHUNK)]  # (NC,)
        cy = centers_ref[1, pl.ds(off, CHUNK)]
        cz = centers_ref[2, pl.ds(off, CHUNK)]
        csr = csr_ref[0, pl.ds(off, CHUNK)]
        act = active_ref[0, pl.ds(off, CHUNK)]

        # (TR, NC) broadcasted quadratic. Rays on sublanes, spheres on lanes.
        dc = (
            d0[:, None] * cx[None, :]
            + d1[:, None] * cy[None, :]
            + d2[:, None] * cz[None, :]
        )
        oc = (
            o0[:, None] * cx[None, :]
            + o1[:, None] * cy[None, :]
            + o2[:, None] * cz[None, :]
        )
        h = dc - d_dot_o[:, None]
        c = csr[None, :] - 2.0 * oc + o_sq[:, None]
        disc = h * h - a[:, None] * c
        sqrtd = jnp.sqrt(jnp.maximum(disc, 0.0))
        root0 = (h - sqrtd) * inv_a[:, None]
        root1 = (h + sqrtd) * inv_a[:, None]
        ok0 = (root0 > t_min) & (root0 < t_best[:, None])
        ok1 = (root1 > t_min) & (root1 < t_best[:, None])
        root = jnp.where(ok0, root0, root1)
        valid = (disc >= 0.0) & (ok0 | ok1) & (act[None, :] > 0.0)
        t_all = jnp.where(valid, root, BIG)

        cmin = jnp.min(t_all, axis=1)  # (TR,)
        # Index of the chunk minimum without int<->float casts (Mosaic has no
        # sitofp): smallest column index whose t equals the row minimum.
        cols = jax.lax.broadcasted_iota(jnp.int32, t_all.shape, 1)
        carg = jnp.min(
            jnp.where(t_all == cmin[:, None], cols, jnp.int32(2**30)), axis=1
        ) + off
        upd = cmin < t_best
        t_best = jnp.where(upd, cmin, t_best)
        idx_best = jnp.where(upd, carg, idx_best)
        return t_best, idx_best

    t0 = jnp.full((TILE_RAYS,), BIG, jnp.float32)
    i0 = jnp.zeros((TILE_RAYS,), jnp.int32)
    t_best, idx_best = jax.lax.fori_loop(0, num_chunks, chunk_body, (t0, i0))
    t_ref[0, :] = t_best
    idx_ref[0, :] = idx_best


@functools.partial(jax.jit, static_argnames=("t_min", "interpret"))
def hit_spheres_pallas(o, d, centers, csr, active, t_min=1.0e-3, interpret=False):
    """Closest sphere hit per ray via the fused kernel.

    Args:
      o, d: (R, 3) rays; R must be a multiple of TILE_RAYS (pad upstream).
      centers: (N, 3); csr: (N,) = |c|^2 - r^2 precomputed; active: (N,)
        float 0/1. N must be a multiple of CHUNK.

    Returns (t (R,), idx (R,) int32, hit (R,) bool).
    """
    r = o.shape[0]
    n = centers.shape[0]
    assert r % TILE_RAYS == 0, f"R={r} not a multiple of {TILE_RAYS}"
    assert n % CHUNK == 0, f"N={n} not a multiple of {CHUNK}"

    o_t = o.T.astype(jnp.float32)  # (3, R)
    d_t = d.T.astype(jnp.float32)
    c_t = centers.T.astype(jnp.float32)  # (3, N)
    csr2 = csr.reshape(1, n).astype(jnp.float32)
    act2 = active.reshape(1, n).astype(jnp.float32)

    grid = (r // TILE_RAYS,)
    kernel = functools.partial(_kernel, n_spheres=n, t_min=np.float32(t_min))
    t_out, idx_out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((3, TILE_RAYS), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, TILE_RAYS), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
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
    )(o_t, d_t, c_t, csr2, act2)

    t = t_out[0]
    idx = idx_out[0]
    return t, idx, t < BIG
