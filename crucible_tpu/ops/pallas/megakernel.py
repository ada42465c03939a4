"""Persistent path-tracing MEGAKERNEL for sphere scenes.

The staged persistent loop (integrator.trace_persistent) runs the whole
1M-lane wavefront in lockstep: every while_loop iteration pays the full
(N_spheres x R) intersection cost even when most lanes are dead. Measured
on book1 (tools/profile_persistent.py, v5e): 131 iterations x 24 ms for
~7M useful lane-bounces out of 141M processed — ~5% utilization; the
long-path tail (dielectric chains up to max_depth=50) holds the entire
wavefront hostage.

This kernel moves the COMPLETE persistent loop — camera ray generation,
counter-based RNG, sphere intersection, winner-attribute fetch,
solid/checker shading, Lambertian/metal/dielectric/emissive scatter,
radiance accumulation, lane-local sample regeneration — inside one
`pl.pallas_call`, tiled 512 rays per grid step:

- Each tile's while_loop exits when ITS 512 lanes finish their spp samples:
  sky-dominated tiles stop after ~spp*2 bounces; only tiles containing
  glass pay for deep paths. Lane-per-pixel binding makes tiles spatially
  coherent (they are contiguous pixel runs), which is what makes per-tile
  exit profitable.
- Zero HBM traffic per bounce: state (o/d/throughput/accumulator/sample
  counters) lives in registers/VMEM for the tile's whole lifetime. The
  staged loop reads+writes ~30 (R,3) HBM arrays per iteration.
- Static scenes compile with the motion FMAs removed (``animated`` is a
  Python flag), unlike the runtime w=0 of the staged kernel which still
  pays them.

Semantics are the lane-per-pixel persistent schedule of
integrator.trace_persistent with groups=1: lane p walks pixel p's samples
0..spp-1 sequentially; every random number is the same
pcg4d(pixel, sample, stream, seed) hash (utils/rng.py), so images match
the staged paths up to f32 association (same sample set, same decisions).

Scope (static predicate `megakernel_supported`): sphere scenes plus
static triangle-mesh BVHs (windowed skip-link traversal below), solid /
checker-of-solid textures, default-gradient sky. Linearly-moving spheres
are supported (motion columns of the attribute table,
ops/pallas/sphere_shade.py layout), and so are animated cameras — the
camera basis is re-derived per ray at its shutter fraction in-kernel,
mirroring generate_rays' animated branch. Image textures / equirect
skies / nested checkers run the RECORD mode (rec_depth > 0): the kernel
streams per-bounce decisions and models/replay.py shades them in jnp.

Reference behaviors mirrored: quadratic + nearest-root selection
(src/objects/sphere.rs:61-105), t_min=1e-3 shadow acne epsilon
(src/camera/ray_casting.rs:119), scatter programs
(src/materials/{lambertian,metal,dielectric}.rs), default sky gradient
(src/camera/ray_casting.rs:145-150), camera jitter/defocus
(src/camera/ray_casting.rs:64-108).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import numpy as np

BIG = np.float32(3.0e38)
import os as _os

# Rays per persistent-kernel tile (lanes per grid step). 512 is the
# shipped default; CRUCIBLE_TILE overrides at import for per-scene
# experiments (smaller tiles = more spatial coherence per tile -> fewer
# union leaves in the mesh walk, but more grid steps; VERDICT r4 #2's
# per-scene-TILE lever). Must be a multiple of 128 (vreg lane width).
TILE = int(_os.environ.get("CRUCIBLE_TILE", "512"))
assert TILE % 128 == 0, "TILE must be a multiple of 128 lanes"
C_IN = 32  # sphere attribute table columns (sphere_shade.py layout)

# BVH nodes slab-tested per traversal iteration (one (W,T) batch).
# Env-overridable for bench sweeps (tools/tpu_bench.py teapotx).
NODE_WIN = int(_os.environ.get("CRUCIBLE_NODE_WIN", "16"))
# Leaves taken per traversal iteration. The windowed walk is LEAF-
# SERIALIZED (tools/walk_sim.py: iters ~ leaves+1 at MAX_LEAVES=1), so
# taking several leaves per window amortizes the per-iteration fixed cost
# (slab batch, scalar chase, vector sync) over the SAME total MT rows —
# unlike the reverted (256,T) block (058c4f8) whose fixed-span blocks
# inflated MT rows with masked dead weight. sim @ sah64: iters/tile
# 14.0 -> 7.8 (ml=2, win16) -> 5.6 (ml=3, win16).
MAX_LEAVES = int(_os.environ.get("CRUCIBLE_MAX_LEAVES", "3"))

# Unit-triangle (Woop-style) leaf test for STATIC meshes: the tris table
# carries precomputed world->unit-triangle affine transforms (12 coeffs,
# integrator.make_tri_tables) and the leaf test becomes
# t = -o'_z/d'_z, u = o'_x + t d'_x, v = o'_y + t d'_y — ~17% fewer VPU
# ops than Moller-Trumbore and no cross-product temporaries. Moving
# meshes keep MT (the transform inverse does not lerp linearly).
# Measured on v5e (r4): teapot 400w/32spp/d50 4.40 -> 4.88 Mrays/s
# (+11%); all six real-chip goldens pass with identical stats.
WOOP = _os.environ.get("CRUCIBLE_WOOP", "1").lower() not in (
    "0", "false", "off",
)

# Execute every leaf slot unconditionally instead of cond-guarding each
# taken leaf (see the traversal chase below).
UNCOND_LEAVES = _os.environ.get("CRUCIBLE_UNCOND_LEAVES", "0").lower() not in (
    "0", "false", "off",
)

# Winner-attribute fetch via a one-hot MXU contraction instead of per-column
# masked sums on the VPU (see the fetch site below). Verified on v5e
# (tools/tpu_bench.py mxufetch, r4): image sha256 IDENTICAL to the
# masked-sum fetch and book1 400w/32spp/d50 went 8.43 -> 12.68 Mrays/s
# (1.50x) — the fetch was 44 of ~77 VPU ops/(row,lane) and now rides the
# otherwise-idle MXU. CRUCIBLE_MXU_FETCH=0 restores the masked sums.
MXU_FETCH = _os.environ.get("CRUCIBLE_MXU_FETCH", "1").lower() not in (
    "0", "false", "off",
)
# Split-table (3 bf16 passes) vs Precision.HIGHEST (9) for the one-hot
# MXU fetch — bit-identical results either way (see _fetch_mm).
MXU_SPLIT = _os.environ.get("CRUCIBLE_MXU_SPLIT", "1").lower() not in (
    "0", "false", "off",
)
# Same contraction for the RECORD kernel's (smaller, 8-12 column) fetch.
# Verified on v5e (tools/tpu_bench.py mxurec, r4): records sha256
# IDENTICAL, d8 record pass 0.516 -> 0.453 s (1.14x — fewer columns, so a
# smaller win than the forward kernel's 1.50x).
MXU_FETCH_REC = _os.environ.get("CRUCIBLE_MXU_FETCH_REC", "1").lower() not in (
    "0", "false", "off",
)
# The window's any-hit bits pack into ONE int32 word (1 << i per row); more
# than 31 rows would overflow the shift and corrupt traversal (ADVICE r2).
assert NODE_WIN <= 31, "hit-mask packing holds at most 31 window rows"
# tri_meta lives in SMEM as 3*(K+NODE_WIN) int32. TPU scalar memory is tens
# of KiB; cap the node count well under it so an oversized BVH fails here
# with a clear message instead of an opaque Mosaic compile error (ADVICE
# r2). Raise bvh leaf_size to shrink K for larger meshes.
MAX_TRI_NODES = 4096  # 3*(4096+W)*4 B ≈ 48 KiB of SMEM

# Camera constant vector layout (1, 48) f32.
# Static-camera slots (precomputed basis — models/camera.py::generate_rays):
#  0-2 pixel00, 3-5 du, 6-8 dv, 9-11 look_from, 12-14 basis u, 15-17 basis v,
#  18 defocus_radius.
# Animated-camera extras (basis re-derived per ray at shutter fraction w):
#  19-21 look_at, 22-24 look_from_d, 25-27 look_at_d, 28-30 vup,
#  31 viewport_h, 32 viewport_w, 33 focus_dist,
#  34 width, 35 height (as f32), 36 0.5*(width-1), 37 0.5*(height-1),
#  38-47 pad.
CAM_SIZE = 48

# PCG4D in INT32: Mosaic supports no u32<->s32/f32 converts in-kernel, but
# two's-complement mul/add/xor are bit-identical to uint32, and the one
# logical shift uses lax.shift_right_logical — so these int32 streams equal
# utils/rng.py's uint32 streams bit-for-bit.
_PCG_MULT = np.int32(np.uint32(1664525))
_PCG_ADD = np.int32(np.uint32(1013904223))
_U24 = np.float32(1.0 / (1 << 24))

# Stream ids (utils/rng.py — must stay in lockstep).
STREAM_TIME = np.int32(0)
STREAM_PIXEL_JITTER = np.int32(1)
STREAM_BOUNCE_BASE = np.int32(3)

LAMBERTIAN, METAL, DIELECTRIC, EMISSIVE = 0, 1, 2, 3
TEX_CHECKER = 1


def _srl(x, k):
    return jax.lax.shift_right_logical(x, np.int32(k))


def _pcg4d(x, y, z, w):
    x = x * _PCG_MULT + _PCG_ADD
    y = y * _PCG_MULT + _PCG_ADD
    z = z * _PCG_MULT + _PCG_ADD
    w = w * _PCG_MULT + _PCG_ADD
    x = x + y * w
    y = y + z * x
    z = z + x * y
    w = w + y * z
    x = x ^ _srl(x, 16)
    y = y ^ _srl(y, 16)
    z = z ^ _srl(z, 16)
    w = w ^ _srl(w, 16)
    x = x + y * w
    y = y + z * x
    z = z + x * y
    w = w + y * z
    return x, y, z, w


def _unit_f32(u):
    # Logical shift keeps the top 24 bits non-negative -> exact s32->f32.
    return _srl(u, 8).astype(jnp.float32) * _U24


# Spheres per culling chunk. 32 loses even on multi-tile tables (r4 stress:
# n2048 cull 1.88 s vs brute 1.21 s — the per-chunk lax.cond overhead at 64
# chunks swamps the skipped quadratics); coarser chunks cut the cond count
# linearly while still skipping far grid cells.
CLUSTER = int(_os.environ.get("CRUCIBLE_CLUSTER", "256"))
_FAR = np.float32(1.0e30)  # empty-chunk sentinel: a far point box never hits
# Chunks per SUPERCLUSTER: a second bounding level over the cluster chunks
# (VERDICT r4 #3) — one coarse slab over each group of SUPER consecutive
# chunks gates the group's per-chunk slabs/conds behind one cond.
# MEASURED NEGATIVE on v5e (r5, sphere_stress n7808/31 chunks,
# 400w/32spp/d50): flat 1.80 Mrays/s vs SUPER=8 1.58 vs SUPER=4 1.58 —
# after a few bounces the tile's rays decohere and reach most of the
# scene, so the group predicates nearly always fire and the extra conds
# are pure overhead (the same cond-economics as the r4 teapot sweep).
# Tile-granular culling is the binding constraint, not scan depth; a
# per-LANE sphere BVH is the structure that would change it. DISABLED by
# default (0); set CRUCIBLE_SUPER=k to re-engage for scenes with tighter
# primary-ray locality. Bit-identity is tested either way.
SUPER = int(_os.environ.get("CRUCIBLE_SUPER", "0")) or (1 << 30)


def cluster_spheres(center, radius, active, center_d=None, radius_d=None):
    """Host-side spatial clustering for in-kernel chunk culling.

    Recursive median split on the longest centroid axis (the same build rule
    as the reference BVH, src/objects/bvhwrapper.rs:46-80) with split points
    aligned to CLUSTER, so every 32-row slice of the permuted table is a
    spatially tight cluster. Returns (perm, bounds):
      perm: (N,) int32 — active spheres in split order, inactive last.
      bounds: (ceil(N/CLUSTER), 8) f32 — chunk AABB lo(3)/hi(3), padding.
    For linear motion the AABB is the union over the shutter (endpoints of a
    linear path bound the whole segment). Empty chunks get a far point box.
    """
    center = np.asarray(center, np.float64)
    radius = np.abs(np.asarray(radius, np.float64))
    active = np.asarray(active).astype(bool)
    n = center.shape[0]

    act_ids = np.nonzero(active)[0]
    order = []

    def rec(ids):
        if len(ids) <= CLUSTER:
            order.extend(ids.tolist())
            return
        c = center[ids]
        ax = int(np.argmax(c.max(axis=0) - c.min(axis=0)))
        ids = ids[np.argsort(c[:, ax], kind="stable")]
        half = max(CLUSTER, (len(ids) // 2 // CLUSTER) * CLUSTER)
        rec(ids[:half])
        rec(ids[half:])

    rec(act_ids)
    inact = np.nonzero(~active)[0]
    n_pad = ((n + CLUSTER - 1) // CLUSTER) * CLUSTER
    # Indices >= n address zero pad rows the caller appends to the table.
    perm = np.concatenate(
        [np.asarray(order, np.int64), inact, np.arange(n, n_pad)]
    ).astype(np.int32)
    assert perm.shape[0] == n_pad

    lo_all = center - radius[:, None]
    hi_all = center + radius[:, None]
    if center_d is not None:
        c1 = center + np.asarray(center_d, np.float64)
        r1 = np.abs(radius + np.asarray(radius_d, np.float64))
        lo_all = np.minimum(lo_all, c1 - r1[:, None])
        hi_all = np.maximum(hi_all, c1 + r1[:, None])

    k = n_pad // CLUSTER
    bounds = np.zeros((k, 8), np.float32)
    for ci in range(k):
        rows = perm[ci * CLUSTER : (ci + 1) * CLUSTER]
        rows = rows[rows < n]
        rows = rows[active[rows]]
        if rows.size == 0:
            bounds[ci, 0:3] = _FAR
            bounds[ci, 3:6] = _FAR
        else:
            lo = lo_all[rows].min(axis=0)
            hi = hi_all[rows].max(axis=0)
            # Pad by a few ulps so f32 rounding of the kernel's quadratic
            # can never land a true hit epsilon-outside the box.
            pad = 1e-5 * (1.0 + np.maximum(np.abs(lo), np.abs(hi)))
            bounds[ci, 0:3] = (lo - pad).astype(np.float32)
            bounds[ci, 3:6] = (hi + pad).astype(np.float32)
    return perm, bounds


# Spheres per BVH leaf for the per-LANE sphere BVH walk (below).
# Swept on v5e at n7808 (r5): leaf 32 -> 3.11, 64 -> 3.41, 96 -> 3.46,
# **128 -> 3.61**, 256 -> 3.45 Mrays/s — like the mesh walk, the window
# chase is leaf-serialized, so bigger leaves amortize the per-iteration
# fixed cost until the masked quadratic rows dominate.
SPH_LEAF = int(_os.environ.get("CRUCIBLE_SPH_LEAF", "128"))


def sphere_bvh_tables(center, radius, active, leaf_size=None):
    """Host-side per-LANE sphere BVH for the megakernel (r5).

    The chunked cull scan is TILE-granular: a chunk's quadratic runs if ANY
    of 512 lanes can hit it, and post-bounce ray decoherence makes that
    predicate fire nearly always (the supercluster negative, BASELINE.md
    r5). This builds the same flat skip-link BVH the mesh stage walks
    (ops/bvh.py, SAH) over the ACTIVE sphere AABBs instead, so traversal
    skips whole subtrees per tile-window — the per-ray O(log N) the
    reference gets from src/objects/bvhwrapper.rs:46-80, vectorized over
    the tile.

    Returns (perm (N_pad,) int32 — BVH leaf order, inactive then padding
    last, N_pad a CLUSTER multiple so the post-walk winner fetch reuses
    the chunk-gated one-hot; snodes (K, 16) f32 slab boxes; smeta
    (3*(K+NODE_WIN),) int32 [first, count, miss] + guard rows). Static
    scenes only (animated bounds would go stale; the cull path unions
    motion bounds instead).
    """
    if leaf_size is None:
        leaf_size = SPH_LEAF
    from crucible_tpu.ops import bvh as bvh_mod

    center = np.asarray(center, np.float64)
    radius = np.abs(np.asarray(radius, np.float64))
    active = np.asarray(active).astype(bool)
    n = center.shape[0]
    ids = np.nonzero(active)[0]
    assert ids.size > 0, "sphere BVH over an empty scene"
    bbmin = (center[ids] - radius[ids, None]).astype(np.float32)
    bbmax = (center[ids] + radius[ids, None]).astype(np.float32)
    fb = bvh_mod.build_bvh(bbmin, bbmax, leaf_size=leaf_size, method="sah")
    perm_act = ids[fb.perm]
    inact = np.nonzero(~active)[0]
    # One EXTRA CLUSTER block of zero-pad rows: the kernel's (SPH_LEAF, T)
    # leaf block read at the last leaf's `first` must stay in bounds (the
    # tris table does the same with tri_leaf pad rows); zero rows are
    # inactive and never win.
    assert leaf_size <= CLUSTER
    n_pad = ((n + CLUSTER - 1) // CLUSTER) * CLUSTER + CLUSTER
    # Indices >= n address zero pad rows the caller appends to the table.
    perm = np.concatenate(
        [perm_act, inact, np.arange(n, n_pad)]
    ).astype(np.int32)
    assert perm.shape[0] == n_pad
    k = fb.num_nodes
    snodes = np.zeros((k, 16), np.float32)
    snodes[:, 0:3] = fb.node_min
    snodes[:, 3:6] = fb.node_max
    meta = np.stack(
        [fb.node_first, fb.node_count, fb.node_miss], axis=1
    ).astype(np.int32)
    guard = np.broadcast_to(np.asarray([0, 0, k], np.int32), (NODE_WIN, 3))
    smeta = np.concatenate([meta, guard]).reshape(-1)
    return perm, snodes, smeta


def _pad_tri_nodes(tri_nodes):
    """Append NODE_WIN guard rows so the windowed walk's (W, 16) block read
    at the last real node never runs off the VMEM block. Guard rows are an
    empty far-away box (lo == hi == 3e37 — the min/max slab only 'hits' it
    for exactly-diagonal rays, and even then harmlessly), count 0, and
    miss = n: a cursor that wanders in exits the traversal loop."""
    k = tri_nodes.shape[0]
    pad = jnp.zeros((NODE_WIN, 16), tri_nodes.dtype)
    pad = pad.at[:, 0:6].set(3.0e37)
    pad = pad.at[:, 8].set(np.float32(k))
    return jnp.concatenate([tri_nodes, pad], axis=0)


def _kernel(
    smem_ref,  # (8,) int32: [spp, seed, width, max_depth, ...] in SMEM
    pix_ref,  # (1, TILE) int32 pixel ids (clamped for padding lanes)
    sample0_ref,  # (1, TILE) int32 initial sample index (>= spp for padding)
    cam_ref,  # (1, CAM_SIZE) f32 camera constants
    table_ref,  # (N, C_IN) f32 sphere attribute table
    *rest,  # [cbounds (K,8) if n_chunks] + [tnodes, tris, mats if
    #          n_tri_nodes] + [acc_ref out (3, TILE)]
    #          + [rec_ref (rec_depth, TILE) int32 packed records if rec_depth]
    animated: bool,
    t_min,
    n_chunks: int = 0,
    cam_animated: bool = False,
    n_tri_nodes: int = 0,
    tri_leaf: int = 4,
    n_mats: int = 0,
    rec_depth: int = 0,
    tri_moving: bool = False,
    n_super: int = 0,
    rec_radiance: bool = False,
    n_sph_nodes: int = 0,
    sph_leaf: int = 64,
):
    rest = list(rest)
    cbounds_ref = rest.pop(0) if n_chunks else None
    sbounds_ref = rest.pop(0) if n_super else None
    if n_sph_nodes:
        snodes_ref = rest.pop(0)
        smeta_ref = rest.pop(0)
    if n_tri_nodes:
        tnodes_ref, tris_ref, mats_ref, tmeta_ref = rest[:4]
        rest = rest[4:]
    if rec_depth:
        # RECORD MODE (models/replay.py): each lane traces exactly ONE
        # (pixel, sample) path — sample0 holds the sample id and the loop
        # issues once — while per-bounce discrete decisions (winner id +
        # flag word) stream to the rec refs. The fast forward then feeds
        # the O(R*depth) differentiable replay, replacing the staged
        # trace_record (measured 2.1 vs 4.9 Mrays/s at the grad config).
        acc_ref, rec_ref = rest
    else:
        (acc_ref,) = rest
    spp = smem_ref[0]
    seed = smem_ref[1]
    width = smem_ref[2]
    max_depth = smem_ref[3]

    pix = pix_ref[:]  # (1, T) int32
    fi = (pix % width).astype(jnp.float32)
    fj = (pix // width).astype(jnp.float32)

    def cam(k):
        return cam_ref[0, k]

    # --- sphere column accessor --------------------------------------------
    def col(c):
        return table_ref[:, c : c + 1]  # (N, 1)

    zeros = jnp.zeros((1, TILE), jnp.float32)

    # Winner attribute columns consumed by the shading code below. RECORD
    # mode needs only the DECISION inputs — geometry (center/radius for the
    # normal) and material scalars (type/fuzz/ior/prob for the scatter
    # branch + direction); albedo/emission/texture columns (10..23) feed
    # radiance, which the jnp replay recomputes. The per-column one-hot
    # fetch is ~2/3 of an iteration's VPU work, so trimming 18 -> 8 columns
    # is the main record-pass speedup (VERDICT r2 #2).
    # FUSED record+radiance (rec_radiance, r5): the record pass recomputes
    # every decision anyway, so accumulating the forward radiance in the
    # same loop costs only the full attribute fetch (MXU) + shading tail —
    # and saves the gradient path its entire separate replay-forward
    # dispatch (the in-Pallas backward kernel differentiates the SAME
    # estimator from the streamed records; ops/pallas/replay_kernel.py).
    if rec_depth and not rec_radiance:
        attr_cols = [0, 1, 2, 3, 6, 7, 8, 9] + (
            [24, 25, 26, 27] if animated else []
        )
    else:
        attr_cols = [0, 1, 2, 3] + list(range(6, 24)) + (
            [24, 25, 26, 27] if animated else []
        )
    if rec_depth and (n_sph_nodes or n_chunks):
        # Structure walks run over the PERMUTED table — fetch the winner's
        # original row id (column 31) to de-permute the recorded id, so
        # records stay bit-compatible with the brute/staged passes.
        attr_cols = attr_cols + [31]

    def uniform4(smp, stream):
        x, y, z, w = _pcg4d(pix, smp, jnp.broadcast_to(stream, pix.shape),
                            jnp.broadcast_to(seed, pix.shape))
        return _unit_f32(x), _unit_f32(y), _unit_f32(z), _unit_f32(w)

    # Exact 3-way bf16 split of the attribute table for the one-hot MXU
    # fetch: f32's 24 mantissa bits = 3 x bf16's 8, the residuals are
    # exactly representable, and with one nonzero product per output each
    # bf16 pass is exact — so hi+mid+lo reconstructs the f32 fetch
    # BIT-EXACTLY in 3 MXU passes where Precision.HIGHEST runs 9 (it
    # splits BOTH operands; the one-hot side never needed it). Loop-
    # invariant: computed once per tile. See ops/pallas/replay_kernel.py
    # _split3 (same trick, verified bit-equal on CPU and on-chip sha).
    if MXU_FETCH or MXU_FETCH_REC:
        _t32 = table_ref[:, :]
        _thi = _t32.astype(jnp.bfloat16)
        _tr1 = _t32 - _thi.astype(jnp.float32)
        _tmid = _tr1.astype(jnp.bfloat16)
        _tlo = (_tr1 - _tmid.astype(jnp.float32)).astype(jnp.bfloat16)

        def _fetch_mm(win, lo_row=None, hi_row=None):
            """(32, T) one-hot fetch via 3 bf16 passes (MXU_SPLIT) or one
            Precision.HIGHEST contraction (9 passes) — bit-identical.
            ``lo_row``/``hi_row`` select a chunk's row slice (cull)."""
            sl = (
                (lambda t: t)
                if lo_row is None
                else (lambda t: t[lo_row:hi_row, :])
            )
            if not MXU_SPLIT:
                return jax.lax.dot_general(
                    sl(_t32),
                    jnp.where(win, 1.0, 0.0),
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
            ohb = jnp.where(win, 1.0, 0.0).astype(jnp.bfloat16)

            def one(t):
                return jax.lax.dot_general(
                    sl(t),
                    ohb,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )

            return (one(_thi) + one(_tmid)) + one(_tlo)

    # Record mode: one path per lane — the issue limit is per-lane
    # (sample0 + 1; padding lanes carry sample0 = 2^30 and never issue).
    if rec_depth:
        rec_limit = jnp.minimum(
            sample0_ref[:] + 1, jnp.int32(2**30)
        )  # (1, T)

    def body(state):
        sample_i, alive_m, bounce, it, ox, oy, oz, dx, dy, dz, tx, ty, tz, ax, ay, az = state
        alive = alive_m > 0  # loop-carried as int32: Mosaic can't carry i1 vectors

        # --- lane-local regeneration (integrator.trace_persistent) --------
        issue = (~alive) & (sample_i < (rec_limit if rec_depth else spp))
        ux, uy, ud1, ud2 = uniform4(sample_i, STREAM_PIXEL_JITTER)
        if cam_animated:
            # Re-derive the camera basis PER RAY at its shutter fraction
            # (models/camera.py::generate_rays animated branch). Same TIME
            # stream as the intersection's motion sample, so an issued ray's
            # camera and scene share one shutter instant.
            w_cam, _, _, _ = uniform4(
                sample_i, jnp.broadcast_to(STREAM_TIME, pix.shape)
            )
            lfx = cam(9) + w_cam * cam(22)
            lfy = cam(10) + w_cam * cam(23)
            lfz = cam(11) + w_cam * cam(24)
            lax_ = cam(19) + w_cam * cam(25)
            lay_ = cam(20) + w_cam * cam(26)
            laz_ = cam(21) + w_cam * cam(27)
            # True divisions, matching utils/vec.py::unit and generate_rays
            # op-for-op so rays are bit-identical to the staged path.
            wx0, wy0, wz0 = lfx - lax_, lfy - lay_, lfz - laz_
            wden = jnp.maximum(
                jnp.sqrt(wx0 * wx0 + wy0 * wy0 + wz0 * wz0), 1e-12
            )
            wbx, wby, wbz = wx0 / wden, wy0 / wden, wz0 / wden
            ux0 = cam(29) * wbz - cam(30) * wby  # cross(vup, w)
            uy0 = cam(30) * wbx - cam(28) * wbz
            uz0 = cam(28) * wby - cam(29) * wbx
            uden = jnp.maximum(
                jnp.sqrt(ux0 * ux0 + uy0 * uy0 + uz0 * uz0), 1e-12
            )
            ubx, uby, ubz = ux0 / uden, uy0 / uden, uz0 / uden
            vbx = wby * ubz - wbz * uby  # cross(w, u)
            vby = wbz * ubx - wbx * ubz
            vbz = wbx * uby - wby * ubx
            dux = cam(32) * ubx / cam(34)  # viewport_w * u / width
            duy = cam(32) * uby / cam(34)
            duz = cam(32) * ubz / cam(34)
            dvx = -cam(31) * vbx / cam(35)  # viewport_h * (-v) / height
            dvy = -cam(31) * vby / cam(35)
            dvz = -cam(31) * vbz / cam(35)
            p00x = lfx - cam(33) * wbx - cam(36) * dux - cam(37) * dvx
            p00y = lfy - cam(33) * wby - cam(36) * duy - cam(37) * dvy
            p00z = lfz - cam(33) * wbz - cam(36) * duz - cam(37) * dvz
        else:
            lfx, lfy, lfz = cam(9), cam(10), cam(11)
            ubx, uby, ubz = cam(12), cam(13), cam(14)
            vbx, vby, vbz = cam(15), cam(16), cam(17)
            dux, duy, duz = cam(3), cam(4), cam(5)
            dvx, dvy, dvz = cam(6), cam(7), cam(8)
            p00x, p00y, p00z = cam(0), cam(1), cam(2)
        # (fi + (ux - 0.5)): association matches generate_rays bit-for-bit.
        oxj = fi + (ux - 0.5)
        oyj = fj + (uy - 0.5)
        px = p00x + oxj * dux + oyj * dvx
        py = p00y + oxj * duy + oyj * dvy
        pz = p00z + oxj * duz + oyj * dvz
        # Defocus disk (radius 0 => exactly look_from, matching the staged
        # path's where(use_defocus) select).
        # ((sqrt(u1)*cos)*radius): association matches in_unit_disk + the
        # staged (disk * radius) multiply order bit-for-bit.
        dphi = (2.0 * np.pi) * ud2
        dru = jnp.sqrt(ud1)
        da = dru * jnp.cos(dphi) * cam(18)
        db = dru * jnp.sin(dphi) * cam(18)
        nox = lfx + da * ubx + db * vbx
        noy = lfy + da * uby + db * vby
        noz = lfz + da * ubz + db * vbz
        ox = jnp.where(issue, nox, ox)
        oy = jnp.where(issue, noy, oy)
        oz = jnp.where(issue, noz, oz)
        dx = jnp.where(issue, px - nox, dx)
        dy = jnp.where(issue, py - noy, dy)
        dz = jnp.where(issue, pz - noz, dz)
        tx = jnp.where(issue, 1.0, tx)
        ty = jnp.where(issue, 1.0, ty)
        tz = jnp.where(issue, 1.0, tz)
        bounce = jnp.where(issue, 0, bounce)
        alive = alive | issue
        smp = jnp.where(alive & ~issue, sample_i - 1, sample_i)
        sample_i = jnp.where(issue, sample_i + 1, sample_i)

        # --- intersect spheres ----------------------------------------------
        if animated:
            w_t, _, _, _ = uniform4(smp, jnp.broadcast_to(STREAM_TIME, pix.shape))
        a_q = dx * dx + dy * dy + dz * dz  # (1, T)
        d_dot_o = dx * ox + dy * oy + dz * oz
        o_sq = ox * ox + oy * oy + oz * oz
        inv_a = 1.0 / a_q

        def quad_t(colf):
            """Quadratic closest-root t for a (rows, T) column slice."""
            cxk, cyk, czk = colf(0), colf(1), colf(2)
            dck = cxk * dx + cyk * dy + czk * dz
            ock = cxk * ox + cyk * oy + czk * oz
            csrk = colf(4)
            if animated:
                cdxk, cdyk, cdzk = colf(24), colf(25), colf(26)
                dck = dck + w_t * (cdxk * dx + cdyk * dy + cdzk * dz)
                ock = ock + w_t * (cdxk * ox + cdyk * oy + cdzk * oz)
                csrk = csrk + (2.0 * w_t) * colf(28) + (w_t * w_t) * colf(29)
            h = dck - d_dot_o
            c_q = csrk - 2.0 * ock + o_sq
            disc = h * h - a_q * c_q
            sqrtd = jnp.sqrt(jnp.maximum(disc, 0.0))
            root0 = (h - sqrtd) * inv_a
            root1 = (h + sqrtd) * inv_a
            ok0 = (root0 > t_min) & (root0 < BIG)
            ok1 = (root1 > t_min) & (root1 < BIG)
            root = jnp.where(ok0, root0, root1)
            valid = (disc >= 0.0) & (ok0 | ok1) & (colf(5) > 0.0)
            return jnp.where(valid, root, BIG)

        if n_sph_nodes:
            # --- per-LANE sphere BVH walk (r5; sphere_bvh_tables) ----------
            # The mesh stage's windowed skip-link traversal with a batched
            # (L, T) QUADRATIC leaf over the BVH-permuted sphere table in
            # place of Möller–Trumbore. Replaces the chunk-cond scan whose
            # tile-granular predicates stopped skipping once bounced rays
            # decohere (the supercluster negative, BASELINE.md r5): subtree
            # skips happen per WINDOW here, and winner attrs still come
            # from the chunk-gated one-hot fetch below.
            def ssafe_inv(dc):
                return 1.0 / jnp.where(
                    jnp.abs(dc) < 1e-30, jnp.where(dc >= 0, 1e-30, -1e-30), dc
                )

            sivx, sivy, sivz = ssafe_inv(dx), ssafe_inv(dy), ssafe_inv(dz)

            def sleaf_fn(carry, first, count, bh):
                tb2, ib2 = carry
                # Table is padded by a zero CLUSTER block (inactive rows
                # never win) so this never runs off the block.
                blk = table_ref[pl.ds(first, sph_leaf), :]  # (L, 32)

                def bc(c):
                    return blk[:, c : c + 1]

                cxk, cyk, czk = bc(0), bc(1), bc(2)
                dck = cxk * dx + cyk * dy + czk * dz
                ock = cxk * ox + cyk * oy + czk * oz
                h = dck - d_dot_o
                c_q = bc(4) - 2.0 * ock + o_sq
                disc = h * h - a_q * c_q
                sqrtd = jnp.sqrt(jnp.maximum(disc, 0.0))
                root0 = (h - sqrtd) * inv_a
                root1 = (h + sqrtd) * inv_a
                ok0 = (root0 > t_min) & (root0 < BIG)
                ok1 = (root1 > t_min) & (root1 < BIG)
                root = jnp.where(ok0, root0, root1)
                rows = jax.lax.broadcasted_iota(
                    jnp.int32, (sph_leaf, TILE), 0
                )
                valid = (
                    (disc >= 0.0)
                    & (ok0 | ok1)
                    & (bc(5) > 0.0)
                    & bh
                    & (rows < count)
                )
                th_m = jnp.where(valid, root, BIG)
                tmin = jnp.min(th_m, axis=0, keepdims=True)
                better = tmin < tb2
                win_row = jnp.min(
                    jnp.where(th_m == tmin, rows, jnp.int32(2**30)),
                    axis=0, keepdims=True,
                )
                ib2 = jnp.where(better, first + win_row, ib2)
                tb2 = jnp.where(better, tmin, tb2)
                return tb2, ib2

            def strav_cond(s):
                return s[0] < n_sph_nodes

            def strav_body(s):
                c, tb, ib = s
                blk = snodes_ref[pl.ds(c, NODE_WIN), :]  # (W, 16)
                t0x = (blk[:, 0:1] - ox) * sivx
                t1x = (blk[:, 3:4] - ox) * sivx
                t0y = (blk[:, 1:2] - oy) * sivy
                t1y = (blk[:, 4:5] - oy) * sivy
                t0z = (blk[:, 2:3] - oz) * sivz
                t1z = (blk[:, 5:6] - oz) * sivz
                enter = jnp.maximum(
                    jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
                    jnp.maximum(jnp.minimum(t0z, t1z), t_min),
                )
                exitv = jnp.minimum(
                    jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
                    jnp.minimum(jnp.maximum(t0z, t1z), tb),
                )
                bh_w = jnp.where((enter <= exitv) & alive, 1, 0)  # (W, T)

                # Scalar cursor chase — same one-vector-sync structure as
                # the mesh walk (hm bit packing + SMEM metadata).
                cur = c
                have = jnp.int32(0)
                stop = jnp.int32(0)
                firsts = [jnp.int32(0)] * MAX_LEAVES
                counts = [jnp.int32(0)] * MAX_LEAVES
                lf_rows = [jnp.int32(0)] * MAX_LEAVES
                ah = jnp.max(bh_w, axis=1, keepdims=True)
                wrow = jax.lax.broadcasted_iota(jnp.int32, (NODE_WIN, 1), 0)
                pw = jnp.int32(1)
                for i in range(1, NODE_WIN):
                    pw = jnp.where(wrow == i, jnp.int32(1 << i), pw)
                hm = jnp.sum(ah * pw, axis=0, keepdims=True)[0, 0]
                for i in range(NODE_WIN):
                    hit_i = (_srl(hm, i) & 1) > 0
                    first_i = smeta_ref[3 * (c + i)]
                    cnt_i = smeta_ref[3 * (c + i) + 1]
                    miss_i = smeta_ref[3 * (c + i) + 2]
                    at = (cur == c + i) & (stop == 0)
                    hitleaf = at & hit_i & (cnt_i > 0)
                    take = hitleaf & (have < MAX_LEAVES)
                    for j in range(MAX_LEAVES):
                        tj = hitleaf & (have == j)
                        firsts[j] = jnp.where(tj, first_i, firsts[j])
                        counts[j] = jnp.where(tj, cnt_i, counts[j])
                        lf_rows[j] = jnp.where(tj, jnp.int32(i), lf_rows[j])
                    stop = jnp.where(hitleaf & ~take, jnp.int32(1), stop)
                    have = jnp.where(take, have + 1, have)
                    nxt = jnp.where(hit_i, c + i + 1, miss_i)
                    cur = jnp.where(at & (stop == 0), nxt, cur)
                c_next = cur
                lrows = jax.lax.broadcasted_iota(
                    jnp.int32, (NODE_WIN, TILE), 0
                )
                carry1 = (tb, ib)
                for j in range(MAX_LEAVES):
                    bh_j = (
                        jnp.max(
                            jnp.where(lrows == lf_rows[j], bh_w, 0),
                            axis=0, keepdims=True,
                        )
                        > 0
                    )
                    carry1 = jax.lax.cond(
                        have > j,
                        functools.partial(
                            sleaf_fn, first=firsts[j], count=counts[j],
                            bh=bh_j,
                        ),
                        lambda cc: cc,
                        carry1,
                    )
                return (c_next,) + carry1

            _, t, idx = jax.lax.while_loop(
                strav_cond,
                strav_body,
                (jnp.int32(0), jnp.full((1, TILE), BIG),
                 jnp.zeros((1, TILE), jnp.int32)),
            )
            hit = t[0:1, :] < BIG

            # Winner fetch: chunk-gated one-hot over the permuted table
            # (BVH leaf order is chunk-contiguous, so only winner chunks
            # fire — same code shape as the cull branch's fetch loop).
            n_rows = table_ref.shape[0]
            win_chunk = idx // CLUSTER
            vals = tuple(zeros for _ in attr_cols)
            for k in range(n_rows // CLUSTER):
                predf = jnp.max(
                    jnp.where(hit & (win_chunk == k), 1, 0)
                ) > 0

                def sfetch_chunk(vs, k=k):
                    rk_ = jax.lax.broadcasted_iota(
                        jnp.int32, (CLUSTER, TILE), 0
                    ) + k * CLUSTER
                    win = (rk_ == idx) & hit
                    if MXU_FETCH:
                        res = _fetch_mm(
                            win, k * CLUSTER, (k + 1) * CLUSTER
                        )  # (32, T)
                        return tuple(
                            v + res[c : c + 1, :]
                            for v, c in zip(vs, attr_cols)
                        )
                    return tuple(
                        v
                        + jnp.sum(
                            jnp.where(
                                win,
                                table_ref[
                                    k * CLUSTER : (k + 1) * CLUSTER,
                                    c : c + 1,
                                ],
                                0.0,
                            ),
                            axis=0,
                            keepdims=True,
                        )
                        for v, c in zip(vs, attr_cols)
                    )

                vals = jax.lax.cond(predf, sfetch_chunk, lambda v: v, vals)
            attrs = dict(zip(attr_cols, vals))
        elif n_chunks == 0:
            # Brute force over all N rows (small scenes / no clustering).
            t_all = quad_t(col)
            t = jnp.min(t_all, axis=0, keepdims=True)  # (1, T)
            rows = jax.lax.broadcasted_iota(jnp.int32, t_all.shape, 0)
            idx = jnp.min(
                jnp.where(t_all == t, rows, jnp.int32(2**30)), axis=0,
                keepdims=True,
            )
            win = (rows == idx) & (t < BIG)  # exact one-hot (N, T)
            hit = t[0:1, :] < BIG
            if (MXU_FETCH and not rec_depth) or (MXU_FETCH_REC and rec_depth):
                # Winner fetch as one-hot contractions on the (otherwise
                # idle) MXU instead of 2*N VPU ops per column — the fetch
                # was 44 of ~77 VPU ops/(row,lane) (BASELINE.md roofline).
                # BIT-EXACT despite bf16 passes (split-table argument at
                # _fetch_mm; r4 shipped the same values via HIGHEST's 9
                # passes, r5 trims it to 3 — image sha unchanged).
                res = _fetch_mm(win)  # (32, T)
                attrs = {c: res[c : c + 1, :] for c in attr_cols}
            else:
                attrs = {
                    c: jnp.sum(
                        jnp.where(win, col(c), 0.0), axis=0, keepdims=True
                    )
                    for c in attr_cols
                }
        else:
            # Chunked: slab-test each cluster's AABB against the live rays
            # and lax.cond-skip chunks nobody can hit. Tiles are contiguous
            # pixel runs, so live rays stay coherent and most chunks skip.
            def safe_inv(d):
                return 1.0 / jnp.where(
                    jnp.abs(d) < 1e-30, jnp.where(d >= 0, 1e-30, -1e-30), d
                )

            inv_dx, inv_dy, inv_dz = safe_inv(dx), safe_inv(dy), safe_inv(dz)

            def colk_fn(k):
                def colk(c):
                    return table_ref[k * CLUSTER : (k + 1) * CLUSTER, c : c + 1]
                return colk

            def box_pred(bref, k, tcap):
                """Any live lane's ray enters box row k of ``bref`` before
                its current-best t."""
                t0x = (bref[k, 0] - ox) * inv_dx
                t1x = (bref[k, 3] - ox) * inv_dx
                t0y = (bref[k, 1] - oy) * inv_dy
                t1y = (bref[k, 4] - oy) * inv_dy
                t0z = (bref[k, 2] - oz) * inv_dz
                t1z = (bref[k, 5] - oz) * inv_dz
                enter = jnp.maximum(
                    jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
                    jnp.maximum(jnp.minimum(t0z, t1z), t_min),
                )
                exitv = jnp.minimum(
                    jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
                    jnp.minimum(jnp.maximum(t0z, t1z), tcap),
                )
                boxhit = (enter <= exitv) & alive
                return jnp.max(jnp.where(boxhit, 1, 0)) > 0

            def chunk_step(k, carry):
                pred = box_pred(cbounds_ref, k, carry[0])

                def chunk_hit(carry, k=k):
                    tb, ib = carry
                    t_all_k = quad_t(colk_fn(k))
                    tk = jnp.min(t_all_k, axis=0, keepdims=True)
                    rk = jax.lax.broadcasted_iota(jnp.int32, t_all_k.shape, 0)
                    ik = jnp.min(
                        jnp.where(t_all_k == tk, rk, jnp.int32(2**30)),
                        axis=0, keepdims=True,
                    ) + k * CLUSTER
                    better = tk < tb
                    return jnp.where(better, tk, tb), jnp.where(better, ik, ib)

                return jax.lax.cond(pred, chunk_hit, lambda c: c, carry)

            t = jnp.full((1, TILE), BIG)
            idx = jnp.zeros((1, TILE), jnp.int32)
            if n_super:
                # Two-level scan: one coarse slab + cond per SUPER-chunk
                # group; the per-chunk slab/cond run only when the group's
                # union box is reachable (see SUPER above).
                for g in range(n_super):
                    lo_k = g * SUPER
                    hi_k = min((g + 1) * SUPER, n_chunks)
                    spred = box_pred(sbounds_ref, g, t)

                    def group_body(carry, lo_k=lo_k, hi_k=hi_k):
                        for k in range(lo_k, hi_k):
                            carry = chunk_step(k, carry)
                        return carry

                    t, idx = jax.lax.cond(
                        spred, group_body, lambda c: c, (t, idx)
                    )
            else:
                for k in range(n_chunks):
                    t, idx = chunk_step(k, (t, idx))

            hit = t[0:1, :] < BIG
            win_chunk = idx // CLUSTER
            vals0 = tuple(zeros for _ in attr_cols)

            def fetch_step(k, vs):
                predf = jnp.max(
                    jnp.where(hit & (win_chunk == k), 1, 0)
                ) > 0

                def fetch_chunk(vs, k=k):
                    colk = colk_fn(k)
                    rk = jax.lax.broadcasted_iota(
                        jnp.int32, (CLUSTER, TILE), 0
                    ) + k * CLUSTER
                    win = (rk == idx) & hit
                    if MXU_FETCH and not rec_depth:
                        # Per-chunk one-hot contraction (same bit-exactness
                        # argument as the brute branch; the FULL-table
                        # contraction would not fit VMEM past ~4k rows).
                        res = _fetch_mm(
                            win, k * CLUSTER, (k + 1) * CLUSTER
                        )  # (32, T)
                        return tuple(
                            v + res[c : c + 1, :]
                            for v, c in zip(vs, attr_cols)
                        )
                    return tuple(
                        v + jnp.sum(jnp.where(win, colk(c), 0.0), axis=0,
                                    keepdims=True)
                        for v, c in zip(vs, attr_cols)
                    )

                return jax.lax.cond(predf, fetch_chunk, lambda v: v, vs)

            vals = vals0
            if n_super:
                for g in range(n_super):
                    lo_k = g * SUPER
                    hi_k = min((g + 1) * SUPER, n_chunks)
                    in_g = hit & (win_chunk >= lo_k) & (win_chunk < hi_k)
                    predg = jnp.max(jnp.where(in_g, 1, 0)) > 0

                    def fetch_group(vs, lo_k=lo_k, hi_k=hi_k):
                        for k in range(lo_k, hi_k):
                            vs = fetch_step(k, vs)
                        return vs

                    vals = jax.lax.cond(
                        predg, fetch_group, lambda v: v, vals
                    )
            else:
                for k in range(n_chunks):
                    vals = fetch_step(k, vals)
            attrs = dict(zip(attr_cols, vals))

        # --- triangle BVH stage (teapot-class meshes) -----------------------
        # Tile-coherent WINDOWED traversal: ONE scalar DFS cursor per tile
        # walks the flat skip-link BVH (ops/bvh.py), but each while-iteration
        # slab-tests a NODE_WIN-node window as a single (W, T) batch (full
        # sublane occupancy — the per-(1,T)-op walk left vregs 7/8 empty) and
        # then chases the cursor through the window with unrolled scalar
        # selects: hit interior -> +1, miss -> skip link, first hit LEAF ->
        # batched Moller-Trumbore below (ops/traverse.py::_mt_single math),
        # second hit leaf -> the cursor parks there for the next iteration.
        # The traversal starts from the sphere-stage t, so only closer
        # triangle hits win (strict <, integrator.intersect_scene's rule).
        if n_tri_nodes:

            def tsafe_inv(dc):
                return 1.0 / jnp.where(
                    jnp.abs(dc) < 1e-30, jnp.where(dc >= 0, 1e-30, -1e-30), dc
                )

            ivx, ivy, ivz = tsafe_inv(dx), tsafe_inv(dy), tsafe_inv(dz)

            def trav_cond(s):
                return s[0] < n_tri_nodes

            def trav_body(s):
                if rec_depth:
                    c, tb, tnx, tny, tnz, tmid, ttid = s
                else:
                    c, tb, tnx, tny, tnz, tmid = s
                # tnodes_ref is padded by NODE_WIN guard rows (empty far box,
                # count 0, miss = n) so this never runs off the block.
                blk = tnodes_ref[pl.ds(c, NODE_WIN), :]  # (W, 16)
                t0x = (blk[:, 0:1] - ox) * ivx  # (W, T)
                t1x = (blk[:, 3:4] - ox) * ivx
                t0y = (blk[:, 1:2] - oy) * ivy
                t1y = (blk[:, 4:5] - oy) * ivy
                t0z = (blk[:, 2:3] - oz) * ivz
                t1z = (blk[:, 5:6] - oz) * ivz
                enter = jnp.maximum(
                    jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
                    jnp.maximum(jnp.minimum(t0z, t1z), t_min),
                )
                exitv = jnp.minimum(
                    jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
                    jnp.minimum(jnp.maximum(t0z, t1z), tb),
                )
                bh_w = jnp.where((enter <= exitv) & alive, 1, 0)  # (W, T)

                # Scalar cursor chase through the window. The walk is LEAF-
                # SERIALIZED (tools/walk_sim.py), so the chase takes up to
                # MAX_LEAVES leaves per iteration; `stop` parks the cursor
                # at the (MAX_LEAVES+1)-th hit leaf. Nodes visited after a
                # taken leaf were slab-tested against the pre-leaf tb —
                # conservative (never skips a node the tighter t would
                # keep), so correctness is unaffected.
                #
                # The chase syncs on the vector pipeline exactly ONCE: the
                # window's per-row any-hit bits are packed into a single
                # scalar word (hm) read from one (1,1) reduce; node metadata
                # (first/count/miss) comes from SMEM (tmeta_ref), so the
                # unrolled steps are pure scalar ALU + SMEM reads instead of
                # serial reads of a just-computed vector result.
                cur = c
                have = jnp.int32(0)
                stop = jnp.int32(0)
                firsts = [jnp.int32(0)] * MAX_LEAVES
                counts = [jnp.int32(0)] * MAX_LEAVES
                lf_rows = [jnp.int32(0)] * MAX_LEAVES
                ah = jnp.max(bh_w, axis=1, keepdims=True)  # (W, 1)
                wrow = jax.lax.broadcasted_iota(jnp.int32, (NODE_WIN, 1), 0)
                # Per-row weight 2^i as a select chain (vector<<vector shifts
                # are outside Mosaic's proven surface).
                pw = jnp.int32(1)
                for i in range(1, NODE_WIN):
                    pw = jnp.where(wrow == i, jnp.int32(1 << i), pw)
                hm_v = jnp.sum(
                    ah * pw, axis=0, keepdims=True
                )  # (1, 1) — bit i set iff window row i has any lane hit
                hm = hm_v[0, 0]
                for i in range(NODE_WIN):
                    hit_i = (_srl(hm, i) & 1) > 0
                    first_i = tmeta_ref[3 * (c + i)]
                    cnt_i = tmeta_ref[3 * (c + i) + 1]
                    miss_i = tmeta_ref[3 * (c + i) + 2]
                    at = (cur == c + i) & (stop == 0)
                    hitleaf = at & hit_i & (cnt_i > 0)
                    take = hitleaf & (have < MAX_LEAVES)
                    for j in range(MAX_LEAVES):
                        tj = hitleaf & (have == j)
                        firsts[j] = jnp.where(tj, first_i, firsts[j])
                        counts[j] = jnp.where(tj, cnt_i, counts[j])
                        lf_rows[j] = jnp.where(tj, jnp.int32(i), lf_rows[j])
                    stop = jnp.where(hitleaf & ~take, jnp.int32(1), stop)
                    have = jnp.where(take, have + 1, have)
                    nxt = jnp.where(hit_i, c + i + 1, miss_i)
                    cur = jnp.where(at & (stop == 0), nxt, cur)
                c_next = cur
                lrows = jax.lax.broadcasted_iota(jnp.int32, (NODE_WIN, TILE), 0)

                def leaf_fn(carry, first, count, bh):
                    # BATCHED leaf test: the whole <=tri_leaf-triangle leaf
                    # against all TILE lanes as ONE (L, T) Möller–Trumbore —
                    # the same (rows, T) layout as the sphere stage. The
                    # former per-triangle sequential loop issued (1, T) ops
                    # whose vregs are 7/8-empty in the sublane dim; batching
                    # fills them (measured 1.22 -> see tpu_results.jsonl).
                    if rec_depth:
                        tb2, nx2, ny2, nz2, md2, ti2 = carry
                    else:
                        tb2, nx2, ny2, nz2, md2 = carry
                    # tris is padded by tri_leaf zero rows (make_tri_tables)
                    # so a full block read at `first` never runs off the end;
                    # zero rows have det == 0 and fail det_ok.
                    blk = tris_ref[pl.ds(first, tri_leaf), :]  # (L, 16)

                    def bc(c):
                        return blk[:, c : c + 1]  # (L, 1)

                    if WOOP and not tri_moving:
                        # Unit-triangle test on the precomputed transform:
                        # rows a0 (cols 0-2), a1 (3-5), a2 (6-8), b (9-11).
                        dpz = bc(6) * dx + bc(7) * dy + bc(8) * dz
                        dz_ok = jnp.abs(dpz) > 1e-12
                        invdz = jnp.where(
                            dz_ok, 1.0 / jnp.where(dpz == 0.0, 1.0, dpz), 0.0
                        )
                        opz = bc(6) * ox + bc(7) * oy + bc(8) * oz + bc(11)
                        th = -opz * invdz
                        opx = bc(0) * ox + bc(1) * oy + bc(2) * oz + bc(9)
                        dpx = bc(0) * dx + bc(1) * dy + bc(2) * dz
                        uu = opx + th * dpx
                        opy = bc(3) * ox + bc(4) * oy + bc(5) * oz + bc(10)
                        dpy = bc(3) * dx + bc(4) * dy + bc(5) * dz
                        vv = opy + th * dpy
                        rows = jax.lax.broadcasted_iota(
                            jnp.int32, (tri_leaf, TILE), 0
                        )
                        ok = (
                            dz_ok
                            & (uu >= 0.0)
                            & (vv >= 0.0)
                            & (uu + vv <= 1.0)
                            & (th > t_min)
                            & (th < tb2)
                            & bh
                            & (rows < count)
                        )
                        th_m = jnp.where(ok, th, BIG)
                        tmin = jnp.min(th_m, axis=0, keepdims=True)
                        better = tmin < tb2
                        win_row = jnp.min(
                            jnp.where(th_m == tmin, rows, jnp.int32(2**30)),
                            axis=0, keepdims=True,
                        )
                        win = (rows == win_row) & better

                        def pickw(c, old):
                            v = jnp.sum(
                                jnp.where(win, bc(c), 0.0), axis=0,
                                keepdims=True,
                            )
                            return jnp.where(better, v, old)

                        tb2 = jnp.where(better, tmin, tb2)
                        nx2 = pickw(12, nx2)  # WOOP layout: normal 12-14
                        ny2 = pickw(13, ny2)
                        nz2 = pickw(14, nz2)
                        md2 = pickw(15, md2)  # mat id col 15
                        if rec_depth:
                            tid_val = jnp.sum(
                                jnp.where(
                                    win, (first + rows).astype(jnp.float32),
                                    0.0,
                                ),
                                axis=0, keepdims=True,
                            )
                            ti2 = jnp.where(better, tid_val, ti2)
                            return tb2, nx2, ny2, nz2, md2, ti2
                        return tb2, nx2, ny2, nz2, md2
                    e1x, e1y, e1z = bc(3), bc(4), bc(5)
                    e2x, e2y, e2z = bc(6), bc(7), bc(8)
                    if tri_moving:
                        # Linear shutter motion: vertices at the lane's
                        # shutter fraction (same per-ray w stream as the
                        # sphere motion columns; deltas in table cols
                        # 16-24 — make_tri_tables). The lerped edges are
                        # (L, T) instead of (L, 1).
                        e1x = e1x + w_t * bc(19)
                        e1y = e1y + w_t * bc(20)
                        e1z = e1z + w_t * bc(21)
                        e2x = e2x + w_t * bc(22)
                        e2y = e2y + w_t * bc(23)
                        e2z = e2z + w_t * bc(24)
                    pvx = dy * e2z - dz * e2y  # (L, T)
                    pvy = dz * e2x - dx * e2z
                    pvz = dx * e2y - dy * e2x
                    det = e1x * pvx + e1y * pvy + e1z * pvz
                    det_ok = jnp.abs(det) > 1e-8  # ops/intersect.MT_EPS
                    invd = jnp.where(
                        det_ok, 1.0 / jnp.where(det == 0.0, 1.0, det), 0.0
                    )
                    if tri_moving:
                        tvx = ox - (bc(0) + w_t * bc(16))
                        tvy = oy - (bc(1) + w_t * bc(17))
                        tvz = oz - (bc(2) + w_t * bc(18))
                    else:
                        tvx = ox - bc(0)
                        tvy = oy - bc(1)
                        tvz = oz - bc(2)
                    uu = (tvx * pvx + tvy * pvy + tvz * pvz) * invd
                    qvx = tvy * e1z - tvz * e1y
                    qvy = tvz * e1x - tvx * e1z
                    qvz = tvx * e1y - tvy * e1x
                    vv = (dx * qvx + dy * qvy + dz * qvz) * invd
                    th = (e2x * qvx + e2y * qvy + e2z * qvz) * invd
                    rows = jax.lax.broadcasted_iota(
                        jnp.int32, (tri_leaf, TILE), 0
                    )
                    ok = (
                        det_ok
                        & (uu >= 0.0)
                        & (vv >= 0.0)
                        & (uu + vv <= 1.0)
                        & (th > t_min)
                        & (th < tb2)
                        & bh
                        & (rows < count)
                    )
                    th_m = jnp.where(ok, th, BIG)
                    tmin = jnp.min(th_m, axis=0, keepdims=True)  # (1, T)
                    better = tmin < tb2
                    # Lowest-index winner on exact ties — matches the
                    # sequential loop's strictly-better update order.
                    win_row = jnp.min(
                        jnp.where(th_m == tmin, rows, jnp.int32(2**30)),
                        axis=0, keepdims=True,
                    )
                    win = (rows == win_row) & better

                    def pick_v(val, old):
                        v = jnp.sum(
                            jnp.where(win, val, 0.0), axis=0, keepdims=True
                        )
                        return jnp.where(better, v, old)

                    def pick(c, old):
                        return pick_v(bc(c), old)

                    tb2 = jnp.where(better, tmin, tb2)
                    if tri_moving:
                        # Geometric normal of the LERPED triangle: per-row
                        # cross of the moved edges, winner-picked, then
                        # normalized once post-traversal (the static table's
                        # precomputed unit normal is stale under motion).
                        nx2 = pick_v(e1y * e2z - e1z * e2y, nx2)
                        ny2 = pick_v(e1z * e2x - e1x * e2z, ny2)
                        nz2 = pick_v(e1x * e2y - e1y * e2x, nz2)
                    else:
                        nx2 = pick(9, nx2)
                        ny2 = pick(10, ny2)
                        nz2 = pick(11, nz2)
                    md2 = pick(12, md2)
                    if rec_depth:
                        tid_val = jnp.sum(
                            jnp.where(win, (first + rows).astype(jnp.float32), 0.0),
                            axis=0, keepdims=True,
                        )
                        ti2 = jnp.where(better, tid_val, ti2)
                        return tb2, nx2, ny2, nz2, md2, ti2
                    return tb2, nx2, ny2, nz2, md2

                if rec_depth:
                    carry1 = (tb, tnx, tny, tnz, tmid, ttid)
                else:
                    carry1 = (tb, tnx, tny, tnz, tmid)
                # One (L, T) MT per TAKEN leaf. Two dispatch modes:
                # - cond-guarded (default): iterations with fewer than
                #   MAX_LEAVES takes skip the rest, so total MT rows equal
                #   the single-leaf walk's;
                # - UNCOND_LEAVES: every slot executes unconditionally —
                #   untaken slots carry count 0 and mask to no-ops, so the
                #   extra (tri_leaf, T) rows are pure masked VPU work traded
                #   against the per-cond dispatch overhead (the teapot sweep
                #   measures which side wins; leaves/tile ~1.3 takes/iter
                #   means most slot-conds fire empty).
                for j in range(MAX_LEAVES):
                    bh_j = (
                        jnp.max(
                            jnp.where(lrows == lf_rows[j], bh_w, 0),
                            axis=0, keepdims=True,
                        )
                        > 0
                    )  # (1, T) box gate of taken leaf j's window row
                    if UNCOND_LEAVES:
                        carry1 = leaf_fn(
                            carry1, first=firsts[j], count=counts[j], bh=bh_j
                        )
                    else:
                        carry1 = jax.lax.cond(
                            have > j,
                            functools.partial(
                                leaf_fn, first=firsts[j], count=counts[j],
                                bh=bh_j,
                            ),
                            lambda cc: cc,
                            carry1,
                        )
                return (c_next,) + carry1

            if rec_depth:
                trav0 = (jnp.int32(0), t, zeros, zeros, zeros, zeros, zeros)
                _, tb, tnx, tny, tnz, tmid, ttid = jax.lax.while_loop(
                    trav_cond, trav_body, trav0
                )
            else:
                trav0 = (jnp.int32(0), t, zeros, zeros, zeros, zeros)
                _, tb, tnx, tny, tnz, tmid = jax.lax.while_loop(
                    trav_cond, trav_body, trav0
                )
            if tri_moving:
                # Normalize the winner's lerped-edge cross (matches
                # ops/intersect.triangle_normal: n / max(|n|, 1e-20)).
                nlen = jnp.sqrt(tnx * tnx + tny * tny + tnz * tnz)
                invn = 1.0 / jnp.maximum(nlen, 1e-20)
                tnx, tny, tnz = tnx * invn, tny * invn, tnz * invn
            is_tri = tb < t  # strict: intersect_scene's tie rule
            t = tb
            hit = t[0:1, :] < BIG
            # Winner shading attrs come from the per-MATERIAL table (meshes
            # share one material row each, ids are few) via a tiny one-hot.
            mrows = jax.lax.broadcasted_iota(jnp.int32, (n_mats, TILE), 0)
            mwin = (mrows == tmid.astype(jnp.int32)) & is_tri
            for c in range(6, 10) if (rec_depth and not rec_radiance) else range(6, 24):
                mval = jnp.sum(
                    jnp.where(mwin, mats_ref[:, c - 6 : c - 5], 0.0),
                    axis=0, keepdims=True,
                )
                attrs[c] = jnp.where(is_tri, mval, attrs[c])

        def fetch(c):
            return attrs[c]

        # --- shading point + outward normal --------------------------------
        t_sh = jnp.where(hit, t, 1.0)
        hx = ox + t_sh * dx
        hy = oy + t_sh * dy
        hz = oz + t_sh * dz
        wcx, wcy, wcz, wr = fetch(0), fetch(1), fetch(2), fetch(3)
        if animated:
            wcx = wcx + w_t * fetch(24)
            wcy = wcy + w_t * fetch(25)
            wcz = wcz + w_t * fetch(26)
            wr = wr + w_t * fetch(27)
        inv_r = 1.0 / jnp.maximum(wr, 1e-20)
        nx = (hx - wcx) * inv_r
        ny = (hy - wcy) * inv_r
        nz = (hz - wcz) * inv_r
        if n_tri_nodes:
            nx = jnp.where(is_tri, tnx, nx)
            ny = jnp.where(is_tri, tny, ny)
            nz = jnp.where(is_tri, tnz, nz)
        front = dx * nx + dy * ny + dz * nz < 0.0
        sgn = jnp.where(front, 1.0, -1.0)
        nx, ny, nz = nx * sgn, ny * sgn, nz * sgn

        # --- sky (default gradient) + emission ------------------------------
        # True sqrt + divide: bit-matches utils/vec.py::unit(d, eps=1e-20).
        dlen = jnp.maximum(jnp.sqrt(a_q), 1e-20)
        if not rec_depth or rec_radiance:
            # Radiance/albedo/attenuation are replay-side in plain record
            # mode — only dlen (dielectric unit direction) is
            # decision-relevant. The fused rec_radiance mode keeps them.
            sky_a = 0.5 * (dy / dlen + 1.0)
            one_m_a = 1.0 - sky_a
            skyr = one_m_a + sky_a * 0.5
            skyg = one_m_a + sky_a * 0.7
            skyb = one_m_a + sky_a
            cr = jnp.where(hit, fetch(10), skyr)
            cg = jnp.where(hit, fetch(11), skyg)
            cb = jnp.where(hit, fetch(12), skyb)
            if rec_radiance:
                # Rows below smem[4] update the carry only — the narrow
                # re-record's fused radiance starts at the head boundary
                # (replay_bucketed's accum_from contract); 0 for the
                # head/unsplit calls.
                acc_live = alive & (bounce >= smem_ref[4])
            else:
                acc_live = alive
            ax = ax + jnp.where(acc_live, tx * cr, 0.0)
            ay = ay + jnp.where(acc_live, ty * cg, 0.0)
            az = az + jnp.where(acc_live, tz * cb, 0.0)

            # --- albedo: solid or 3-D checker of solids (models/textures.py)
            inv_scale = fetch(17)
            xf = jnp.floor(inv_scale * hx).astype(jnp.int32)
            yf = jnp.floor(inv_scale * hy).astype(jnp.int32)
            zf = jnp.floor(inv_scale * hz).astype(jnp.int32)
            is_even = (xf + yf + zf) % 2 == 0
            is_checker = fetch(13) == np.float32(TEX_CHECKER)
            alr = jnp.where(is_checker, jnp.where(is_even, fetch(18), fetch(21)), fetch(14))
            alg = jnp.where(is_checker, jnp.where(is_even, fetch(19), fetch(22)), fetch(15))
            alb = jnp.where(is_checker, jnp.where(is_even, fetch(20), fetch(23)), fetch(16))

        # --- scatter (models/materials.py) ----------------------------------
        mat_type = fetch(6)
        fuzz = fetch(7)
        ior = fetch(8)
        prob = fetch(9)
        u1, u2, u_dec, _ = uniform4(smp, STREAM_BOUNCE_BASE + bounce)

        # Uniform unit vector (ops/sampling.py).
        rz = 1.0 - 2.0 * u1
        rr = jnp.sqrt(jnp.maximum(0.0, 1.0 - rz * rz))
        rphi = (2.0 * np.pi) * u2
        rx = rr * jnp.cos(rphi)
        ry = rr * jnp.sin(rphi)

        # Lambertian.
        lamx, lamy, lamz = nx + rx, ny + ry, nz + rz
        degenerate = (
            (jnp.abs(lamx) < 1e-8) & (jnp.abs(lamy) < 1e-8) & (jnp.abs(lamz) < 1e-8)
        )
        lamx = jnp.where(degenerate, nx, lamx)
        lamy = jnp.where(degenerate, ny, lamy)
        lamz = jnp.where(degenerate, nz, lamz)
        inv_prob = 1.0 / jnp.maximum(prob, 1e-8)
        lam_alive = u_dec <= prob

        # Metal: reflect(d, n) normalized + fuzz * unit.
        d_dot_n = dx * nx + dy * ny + dz * nz
        refx = dx - 2.0 * d_dot_n * nx
        refy = dy - 2.0 * d_dot_n * ny
        refz = dz - 2.0 * d_dot_n * nz
        rlen = jnp.maximum(
            jnp.sqrt(refx * refx + refy * refy + refz * refz), 1e-20
        )
        metx = refx / rlen + fuzz * rx
        mety = refy / rlen + fuzz * ry
        metz = refz / rlen + fuzz * rz
        met_alive = metx * nx + mety * ny + metz * nz > 0.0

        # Dielectric: Snell + Schlick on the UNIT incoming direction.
        udx, udy, udz = dx / dlen, dy / dlen, dz / dlen
        ri = jnp.where(front, 1.0 / jnp.maximum(ior, 1e-8), ior)
        cos_t = jnp.minimum(-(udx * nx + udy * ny + udz * nz), 1.0)
        sin_t = jnp.sqrt(jnp.maximum(1.0e-12, 1.0 - cos_t * cos_t))
        r0 = (1.0 - ri) / (1.0 + ri)
        r0 = r0 * r0
        one_m = 1.0 - cos_t
        om2 = one_m * one_m
        schlick = r0 + (1.0 - r0) * om2 * om2 * one_m
        reflect_choice = (ri * sin_t > 1.0) | (schlick > u_dec)
        ud_dot_n = udx * nx + udy * ny + udz * nz
        drefx = udx - 2.0 * ud_dot_n * nx
        drefy = udy - 2.0 * ud_dot_n * ny
        drefz = udz - 2.0 * ud_dot_n * nz
        # refract (utils/vec.py::refract): perp = ri*(ud + cos*n); par =
        # -sqrt(|1-|perp|^2|) * n.
        ppx = ri * (udx + cos_t * nx)
        ppy = ri * (udy + cos_t * ny)
        ppz = ri * (udz + cos_t * nz)
        pp_sq = ppx * ppx + ppy * ppy + ppz * ppz
        par = -jnp.sqrt(jnp.abs(1.0 - pp_sq))
        refrx = ppx + par * nx
        refry = ppy + par * ny
        refrz = ppz + par * nz
        diex = jnp.where(reflect_choice, drefx, refrx)
        diey = jnp.where(reflect_choice, drefy, refry)
        diez = jnp.where(reflect_choice, drefz, refrz)

        is_metal = mat_type == np.float32(METAL)
        is_diel = mat_type == np.float32(DIELECTRIC)
        is_emis = mat_type == np.float32(EMISSIVE)
        ndx = jnp.where(is_diel, diex, jnp.where(is_metal, metx, lamx))
        ndy = jnp.where(is_diel, diey, jnp.where(is_metal, mety, lamy))
        ndz = jnp.where(is_diel, diez, jnp.where(is_metal, metz, lamz))
        if not rec_depth or rec_radiance:
            atr = jnp.where(is_diel, 1.0, jnp.where(is_metal, alr, alr * inv_prob))
            atg = jnp.where(is_diel, 1.0, jnp.where(is_metal, alg, alg * inv_prob))
            atb = jnp.where(is_diel, 1.0, jnp.where(is_metal, alb, alb * inv_prob))
        # Pure i1 algebra — Mosaic cannot lower a select over i1 vectors.
        scattered = (
            is_diel
            | (is_metal & met_alive)
            | (~is_metal & ~is_diel & lam_alive)
        ) & ~is_emis

        cont = alive & hit & scattered & (bounce + 1 < max_depth)

        if rec_depth:
            # --- record per-bounce decisions (models/replay.py bit layout;
            # the F_* constants there must stay in lockstep) ---------------
            # Which quadratic root the winner used — same per-winner math as
            # trace_record/trace_replay so the bit and the replayed t are
            # self-consistent (src/objects/sphere.rs:84-94).
            r_ocx = wcx - ox
            r_ocy = wcy - oy
            r_ocz = wcz - oz
            r_h = dx * r_ocx + dy * r_ocy + dz * r_ocz
            r_c = r_ocx * r_ocx + r_ocy * r_ocy + r_ocz * r_ocz - wr * wr
            r_disc = jnp.maximum(r_h * r_h - a_q * r_c, 0.0)
            r_root0 = (r_h - jnp.sqrt(r_disc)) * inv_a
            root1_bit = ~(r_root0 > t_min)

            hit_rec = alive & hit
            if n_sph_nodes or n_chunks:
                # De-permuted original id from the winner fetch (col 31 —
                # exact integers through the bit-exact one-hot fetch).
                sph_win = attrs[31].astype(jnp.int32)
            else:
                sph_win = idx
            if n_tri_nodes:
                is_tri_rec = is_tri
                win_id = jnp.where(is_tri, ttid.astype(jnp.int32), sph_win)
            else:
                is_tri_rec = hit_rec & ~hit_rec  # constant-false i1 vector
                win_id = sph_win

            def _bits(b, m):
                return jnp.where(b, jnp.int32(m), jnp.int32(0))

            flags_rec = (
                _bits(alive, 1)
                | _bits(hit_rec, 2)
                | _bits(is_tri_rec & hit_rec, 4)
                | _bits(hit_rec & scattered, 8)
                | _bits(front, 16)
                | _bits(reflect_choice, 32)
                | _bits(degenerate, 64)
                | _bits(root1_bit & ~is_tri_rec, 128)
            )
            # Non-hit lanes keep only the alive bit: the hit-side bits
            # (front/refl/degen/root1) are junk there — never read by the
            # replay (all gated on hit/cont) and dependent on WHICH
            # intersection path ran (brute keeps intersecting dead lanes'
            # stale rays; the structure walks mask them out) — masking
            # makes records bit-identical across brute/BVH/cull paths.
            flags_rec = jnp.where(hit_rec, flags_rec, flags_rec & jnp.int32(1))
            # ONE packed int32 per (bounce, lane): winner id in bits 8..30
            # (ids < 2^23 keep the word non-negative), flag byte in bits
            # 0..7 — halves record traffic vs two words (VERDICT r2 #2).
            rec_ref[pl.ds(it, 1), :] = (
                jnp.where(hit_rec, win_id, jnp.int32(0)) * jnp.int32(256)
                + flags_rec
            )
        if not rec_depth or rec_radiance:
            tx = jnp.where(cont, tx * atr, tx)
            ty = jnp.where(cont, ty * atg, ty)
            tz = jnp.where(cont, tz * atb, tz)
        ox = jnp.where(cont, hx, ox)
        oy = jnp.where(cont, hy, oy)
        oz = jnp.where(cont, hz, oz)
        dx = jnp.where(cont, ndx, dx)
        dy = jnp.where(cont, ndy, dy)
        dz = jnp.where(cont, ndz, dz)
        bounce = bounce + 1
        cont_m = jnp.where(cont, 1, 0).astype(jnp.int32)
        return (sample_i, cont_m, bounce, it + 1, ox, oy, oz, dx, dy, dz, tx, ty, tz, ax, ay, az)

    def cond(state):
        sample_i, alive_m = state[0], state[1]
        pending = jnp.where(
            sample_i < (rec_limit if rec_depth else spp), 1, alive_m
        )
        return jnp.max(pending) > 0

    if rec_depth:
        # Rows past the tile's death stay zero (F_ALIVE clear).
        rec_ref[:] = jnp.zeros((rec_depth, TILE), jnp.int32)
    sample00 = sample0_ref[:]
    state0 = (
        sample00,
        jnp.zeros((1, TILE), jnp.int32),  # alive mask
        jnp.zeros((1, TILE), jnp.int32),
        jnp.int32(0),  # loop iteration (= bounce row in record mode)
        zeros, zeros, zeros,  # o
        zeros, zeros, jnp.ones((1, TILE), jnp.float32),  # d (unit-ish filler)
        zeros, zeros, zeros,  # throughput (dead)
        zeros, zeros, zeros,  # acc
    )
    out = jax.lax.while_loop(cond, body, state0)
    ax, ay, az = out[13], out[14], out[15]
    acc_ref[0:1, :] = ax
    acc_ref[1:2, :] = ay
    acc_ref[2:3, :] = az


@functools.partial(
    jax.jit,
    static_argnames=(
        "animated", "cam_animated", "tri_leaf", "sph_leaf", "t_min",
        "interpret",
    ),
)
def run_megakernel(
    smem,  # (8,) int32 [spp, seed, width, max_depth, 0...]
    pix,  # (1, R) int32
    sample0,  # (1, R) int32
    cam,  # (1, CAM_SIZE) f32
    table,  # (N, C_IN) f32 (cluster-permuted when cbounds is given)
    cbounds=None,  # (K, 8) f32 chunk AABBs (cluster_spheres) or None
    sph_nodes=None,  # (K, 16) f32 sphere-BVH slab boxes (sphere_bvh_tables)
    sph_meta=None,  # (3*(K+NODE_WIN),) i32 sphere-BVH [first,count,miss]
    tri_nodes=None,  # (K, 16) f32 flat BVH [lo3, hi3, legacy meta, pad]
    tris=None,  # (M, 16) f32 [v0(3), e1(3), e2(3), unit normal(3), mat_id, pad]
    mats=None,  # (NM, 24) f32 per-material shading cols (sphere cols 6..23)
    tri_meta=None,  # (3*(K+NODE_WIN),) i32 [first,count,miss] per node, SMEM
    *,
    animated: bool,
    cam_animated: bool = False,
    tri_leaf: int = 4,
    sph_leaf: int = 64,
    t_min=1.0e-3,
    interpret: bool = False,
):
    """Dispatch the persistent megakernel -> per-lane radiance sums (3, R)."""
    r = pix.shape[1]
    n = table.shape[0]
    assert r % TILE == 0, f"R={r} not a multiple of {TILE}"
    assert table.shape[1] == C_IN and cam.shape == (1, CAM_SIZE)
    n_chunks = 0
    n_tri_nodes = 0
    n_mats = 0
    extra_in = []
    extra_specs = []
    n_super = 0
    if cbounds is not None:
        n_chunks = cbounds.shape[0]
        assert n_chunks * CLUSTER == n, (n_chunks, n)
        extra_in.append(cbounds)
        extra_specs.append(
            pl.BlockSpec((n_chunks, 8), lambda i: (0, 0), memory_space=pltpu.VMEM)
        )
        if n_chunks > SUPER:
            # Supercluster union boxes over groups of SUPER consecutive
            # chunks (consecutive = spatially tight, cluster_spheres'
            # median-split order). Empty (far-sentinel) chunks are masked
            # out of the union; an all-empty group gets an inverted box
            # that can never be entered.
            n_super = (n_chunks + SUPER - 1) // SUPER
            pad = n_super * SUPER - n_chunks
            cb = jnp.concatenate(
                [cbounds, jnp.full((pad, 8), _FAR, cbounds.dtype)]
            ) if pad else cbounds
            far = cb[:, 0] >= np.float32(1e29)
            lo = jnp.where(far[:, None], np.float32(3e38), cb[:, 0:3])
            hi = jnp.where(far[:, None], np.float32(-3e38), cb[:, 3:6])
            slo = lo.reshape(n_super, SUPER, 3).min(axis=1)
            shi = hi.reshape(n_super, SUPER, 3).max(axis=1)
            sbounds = jnp.concatenate(
                [slo, shi, jnp.zeros((n_super, 2), cbounds.dtype)], axis=1
            )
            extra_in.append(sbounds)
            extra_specs.append(
                pl.BlockSpec(
                    (n_super, 8), lambda i: (0, 0), memory_space=pltpu.VMEM
                )
            )
    n_sph_nodes = 0
    if sph_nodes is not None:
        assert cbounds is None, "sphere BVH replaces chunk culling"
        n_sph_nodes = sph_nodes.shape[0]
        if n_sph_nodes > MAX_TRI_NODES:
            raise ValueError(
                f"sphere BVH has {n_sph_nodes} nodes > MAX_TRI_NODES="
                f"{MAX_TRI_NODES} (sph_meta would exceed TPU SMEM); raise "
                f"CRUCIBLE_SPH_LEAF"
            )
        assert n % CLUSTER == 0, (n, CLUSTER)  # chunk-gated winner fetch
        assert sph_meta.shape == (3 * (n_sph_nodes + NODE_WIN),)
        extra_in += [_pad_tri_nodes(sph_nodes), sph_meta]
        extra_specs += [
            pl.BlockSpec(
                (n_sph_nodes + NODE_WIN, 16),
                lambda i: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ]
    if tri_nodes is not None:
        n_tri_nodes = tri_nodes.shape[0]
        if n_tri_nodes > MAX_TRI_NODES:
            raise ValueError(
                f"BVH has {n_tri_nodes} nodes > MAX_TRI_NODES="
                f"{MAX_TRI_NODES} (tri_meta would exceed TPU SMEM); raise "
                f"leaf_size in Scene.build or use the staged schedule"
            )
        n_mats = mats.shape[0]
        # Width 32 = MOVING mesh (linear shutter deltas in cols 16-24);
        # inferred from the table shape, which is part of the jit key.
        tri_w = tris.shape[1]
        assert tri_nodes.shape[1] == 16 and tri_w in (16, 32)
        assert tri_w == 16 or animated, "moving mesh requires animated"
        assert mats.shape[1] == 24
        assert tri_meta.shape == (3 * (n_tri_nodes + NODE_WIN),)
        extra_in += [_pad_tri_nodes(tri_nodes), tris, mats, tri_meta]
        extra_specs += [
            pl.BlockSpec(
                (n_tri_nodes + NODE_WIN, 16),
                lambda i: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (tris.shape[0], tri_w), lambda i: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((n_mats, 24), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ]

    kernel = functools.partial(
        _kernel, animated=animated, t_min=np.float32(t_min),
        n_chunks=n_chunks, cam_animated=cam_animated,
        n_tri_nodes=n_tri_nodes, tri_leaf=tri_leaf, n_mats=n_mats,
        tri_moving=bool(tri_nodes is not None and tris.shape[1] == 32),
        n_super=n_super,
        n_sph_nodes=n_sph_nodes,
        sph_leaf=sph_leaf,
    )
    grid = (r // TILE,)
    (acc,) = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CAM_SIZE), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, C_IN), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ]
        + extra_specs,
        out_specs=[
            pl.BlockSpec((3, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((3, r), jnp.float32)],
        interpret=interpret,
    )(smem, pix, sample0, cam, table, *extra_in)
    return acc


@functools.partial(
    jax.jit,
    static_argnames=(
        "max_depth", "animated", "cam_animated", "tri_leaf", "sph_leaf",
        "t_min", "interpret", "radiance",
    ),
)
def run_megakernel_record(
    smem,  # (8,) int32 [unused, seed, width, max_depth, 0...]
    pix,  # (1, R) int32 pixel id per LANE (one (pixel, sample) path each)
    sample0,  # (1, R) int32 sample id per lane (2^30 for padding lanes)
    cam,  # (1, CAM_SIZE) f32
    table,  # (N, C_IN) f32 sphere attribute table (PERMUTED when a
    #          structure is given — ids de-permute via column 31)
    tri_nodes=None,
    tris=None,
    mats=None,
    tri_meta=None,
    cbounds=None,  # (K, 8) f32 cluster AABBs (animated big scenes)
    sph_nodes=None,  # (K, 16) f32 sphere-BVH boxes (static big scenes)
    sph_meta=None,  # (3*(K+W),) i32 sphere-BVH metadata
    *,
    max_depth: int,  # STATIC here — sizes the record buffers
    animated: bool,
    cam_animated: bool = False,
    tri_leaf: int = 4,
    sph_leaf: int = 64,
    t_min=1.0e-3,
    interpret: bool = False,
    radiance: bool = False,
):
    """RECORD-MODE megakernel dispatch (models/replay.py's fast forward).

    Each lane traces exactly one (pixel, sample) path; per-bounce discrete
    decisions stream to HBM as ONE packed int32 per (bounce, lane): winner
    id * 256 + flag byte (models/replay.py F_* layout). Returns
    (radiance (3, R) — zeros unless ``radiance=True``, which runs the
    FUSED record+radiance mode: the same loop also accumulates each
    lane's forward radiance, saving the gradient path its separate
    replay-forward dispatch (r5); rec (D, R) int32 packed records,
    bit-compatible with trace_record either way).

    Big sphere tables (r5 final): pass the forward path's structures —
    ``sph_nodes``/``sph_meta`` (per-lane sphere BVH, static scenes) or
    ``cbounds`` (chunk-cond cull, animated) — with the PERMUTED table; the
    kernel fetches the winner's original id (column 31) so the streamed
    records hold UNPERMUTED ids, bit-compatible with trace_record. Without
    a structure the brute (N, T) quadratic caps at ~4k rows (VMEM).
    """
    r = pix.shape[1]
    n = table.shape[0]
    assert r % TILE == 0, f"R={r} not a multiple of {TILE}"
    assert table.shape[1] == C_IN and cam.shape == (1, CAM_SIZE)
    n_tri_nodes = 0
    n_mats = 0
    n_chunks = 0
    n_sph_nodes = 0
    extra_in = []
    extra_specs = []
    if cbounds is not None:
        assert sph_nodes is None, "sphere BVH replaces chunk culling"
        n_chunks = cbounds.shape[0]
        assert n_chunks * CLUSTER == n, (n_chunks, n)
        extra_in.append(cbounds)
        extra_specs.append(
            pl.BlockSpec((n_chunks, 8), lambda i: (0, 0), memory_space=pltpu.VMEM)
        )
    if sph_nodes is not None:
        n_sph_nodes = sph_nodes.shape[0]
        if n_sph_nodes > MAX_TRI_NODES:
            raise ValueError(
                f"sphere BVH has {n_sph_nodes} nodes > MAX_TRI_NODES="
                f"{MAX_TRI_NODES} (sph_meta would exceed TPU SMEM); raise "
                f"CRUCIBLE_SPH_LEAF"
            )
        assert n % CLUSTER == 0, (n, CLUSTER)
        assert sph_meta.shape == (3 * (n_sph_nodes + NODE_WIN),)
        extra_in += [_pad_tri_nodes(sph_nodes), sph_meta]
        extra_specs += [
            pl.BlockSpec(
                (n_sph_nodes + NODE_WIN, 16),
                lambda i: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ]
    if tri_nodes is not None:
        n_tri_nodes = tri_nodes.shape[0]
        if n_tri_nodes > MAX_TRI_NODES:
            raise ValueError(
                f"BVH has {n_tri_nodes} nodes > MAX_TRI_NODES="
                f"{MAX_TRI_NODES} (tri_meta would exceed TPU SMEM); raise "
                f"leaf_size in Scene.build or use the staged schedule"
            )
        n_mats = mats.shape[0]
        tri_w = tris.shape[1]
        assert tri_w in (16, 32) and (tri_w == 16 or animated)
        assert tri_meta.shape == (3 * (n_tri_nodes + NODE_WIN),)
        extra_in += [_pad_tri_nodes(tri_nodes), tris, mats, tri_meta]
        extra_specs += [
            pl.BlockSpec(
                (n_tri_nodes + NODE_WIN, 16),
                lambda i: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (tris.shape[0], tri_w), lambda i: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((n_mats, 24), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ]
    # The loop's depth gate reads smem[3]; the record rows are sized by the
    # static max_depth — they must agree or records would run off the block.
    smem = smem.at[3].set(jnp.int32(max_depth))

    kernel = functools.partial(
        _kernel, animated=animated, t_min=np.float32(t_min),
        n_chunks=n_chunks, cam_animated=cam_animated,
        n_tri_nodes=n_tri_nodes, tri_leaf=tri_leaf, n_mats=n_mats,
        rec_depth=max_depth,
        tri_moving=bool(tri_nodes is not None and tris.shape[1] == 32),
        rec_radiance=radiance,
        n_sph_nodes=n_sph_nodes,
        sph_leaf=sph_leaf,
    )
    grid = (r // TILE,)
    acc, rec = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CAM_SIZE), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, C_IN), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ]
        + extra_specs,
        out_specs=[
            pl.BlockSpec((3, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (max_depth, TILE), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((3, r), jnp.float32),
            jax.ShapeDtypeStruct((max_depth, r), jnp.int32),
        ],
        interpret=interpret,
    )(smem, pix, sample0, cam, table, *extra_in)
    return acc, rec
