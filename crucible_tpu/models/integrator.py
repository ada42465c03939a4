"""Wavefront path integrator: the TPU re-imagination of ``ray_color``.

The reference integrates recursively per ray (src/camera/ray_casting.rs:
112-152): on hit, ``attenuation * ray_color(scattered, depth-1)``; on miss,
skybox radiance; at depth 0, black. Unrolling the recursion into an
iterative product gives the mathematically identical wavefront form used
here over a flat batch of R rays:

    L      += throughput * sky        (on miss)
    L      += throughput * emission   (on hit — extension, zero by default)
    throughput *= attenuation         (on scatter)
    black at depth exhaustion         (rays alive after max_depth add 0)

The bounce loop is a ``lax.while_loop`` that exits early once every ray in
the wavefront is dead — dynamic trip count, static shapes, no recursion.

Gradient stance (SURVEY.md §7 "Differentiability"): discrete decisions
(hit/miss masks, argmin winners, material branches, RNG) are inherently
non-differentiable and act as detached samples; continuous quantities
(hit t, normals, attenuations, sky radiance, emission) stay on the autodiff
tape, giving detached-sampling interior gradients w.r.t. material albedo,
texels, emission, skybox images, and camera parameters.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from crucible_tpu.models import materials as mat_mod
from crucible_tpu.models import skybox as sky_mod
from crucible_tpu.models import textures as tex_mod
from crucible_tpu.models.camera import CameraParams, generate_rays
from crucible_tpu.models.scene import SceneData
from crucible_tpu.ops import intersect
from crucible_tpu.ops.traverse import bvh_hit_triangles
from crucible_tpu.utils import rng as crng
from crucible_tpu.utils import vec

T_MIN = 1.0e-3  # shadow-acne epsilon (src/camera/ray_casting.rs:119)
BIG = intersect.BIG


def exact_tri_vertices(sd: SceneData, pid, t_ray):
    """Per-candidate exact-motion triangle vertices -> (a, b, c), each (R, 3).

    Gathers the three vertex-major timeline track rows of triangle ``pid``
    (leaf order for BVH meshes) and evaluates position = scale(t) *
    translate(t) * origin at each ray's absolute time (the vectorized
    counterpart of src/objects/triangle.rs:91-97 evaluating per-vertex
    timelines at ray.time()). O(R * K) — candidates only, never (R, M)."""
    from crucible_tpu.models import timeline as tl_mod

    m_rows = sd.tri_v0.shape[0]
    out = []
    for vi in range(3):
        rows = pid + vi * m_rows
        pos = tl_mod.eval_translate_rows(
            jnp.take(sd.tri_tr_t0, rows, axis=0),
            jnp.take(sd.tri_tr_t1, rows, axis=0),
            jnp.take(sd.tri_tr_delta, rows, axis=0),
            jnp.take(sd.tri_tr_init, rows, axis=0),
            t_ray,
        )
        scl = tl_mod.eval_scale_rows(
            jnp.take(sd.tri_sc_t0, rows, axis=0),
            jnp.take(sd.tri_sc_t1, rows, axis=0),
            jnp.take(sd.tri_sc_from, rows, axis=0),
            jnp.take(sd.tri_sc_to, rows, axis=0),
            t_ray,
        )
        out.append(scl * pos)
    return tuple(out)


def exact_sphere_winner(sd: SceneData, i_s, t_ray):
    """Per-winner exact-motion sphere (center, radius) at each ray's time —
    the replay/record counterpart of the exact branch's full (R, N)
    evaluation (src/objects/sphere.rs:67-69). O(R * K)."""
    from crucible_tpu.models import timeline as tl_mod

    c_w = tl_mod.eval_translate_rows(
        jnp.take(sd.sph_tr_t0, i_s, axis=0),
        jnp.take(sd.sph_tr_t1, i_s, axis=0),
        jnp.take(sd.sph_tr_delta, i_s, axis=0),
        jnp.take(sd.sph_tr_init, i_s, axis=0),
        t_ray,
    )
    r_w = tl_mod.eval_scale_rows(
        jnp.take(sd.sph_sc_t0, i_s, axis=0),
        jnp.take(sd.sph_sc_t1, i_s, axis=0),
        jnp.take(sd.sph_sc_from, i_s, axis=0),
        jnp.take(sd.sph_sc_to, i_s, axis=0),
        t_ray,
    )[..., 0]
    return c_w, r_w


def intersect_scene(sd: SceneData, o, d, use_pallas: bool = False, w=None):
    """Closest hit against all scene primitives.

    ``use_pallas`` routes sphere intersection through the fused VMEM kernel
    (ops/pallas/sphere_hit.py) — requires R % TILE_RAYS == 0; the pure-jnp
    path is the portable reference.

    Returns a dict of per-ray arrays:
      hit (bool), t, point (R,3), normal (R,3) front-face-flipped unit,
      front (bool), u, v, mat (int32).
    """
    r = o.shape[0]
    animated = sd.animated
    exact = animated and sd.motion_exact
    if exact:
        # Exact per-ray-time evaluation (keyframe inside the shutter window;
        # models/scene.py build detection). Evaluates the piecewise-linear
        # tracks at the ray's absolute time — the vectorized counterpart of
        # the reference re-evaluating the whole timeline per ray
        # (src/objects/sphere.rs:67-69). O(R*N*K) — a correctness path, not
        # a fast path (the linear-shutter model covers everything else).
        from crucible_tpu.models import timeline as tl_mod

        assert w is not None
        t_ray = sd.motion_t0 + w * (sd.motion_t1 - sd.motion_t0)
        centers_rt = tl_mod.eval_translate(
            sd.sph_tr_t0, sd.sph_tr_t1, sd.sph_tr_delta, sd.sph_tr_init, t_ray
        )  # (R, N, 3)
        radii_rt = tl_mod.eval_scale(
            sd.sph_sc_t0, sd.sph_sc_t1, sd.sph_sc_from, sd.sph_sc_to, t_ray
        )[..., 0]  # (R, N)
        t_s, i_s, hit_s = intersect.hit_spheres(
            o, d, centers_rt, radii_rt, sd.sph_active, T_MIN, jnp.inf
        )
    elif animated:
        assert w is not None, "animated scenes need per-ray shutter fractions"
        t_s, i_s, hit_s = intersect.hit_spheres_moving(
            o,
            d,
            w,
            sd.sph_center,
            sd.sph_center_d,
            sd.sph_radius,
            sd.sph_radius_d,
            sd.sph_active,
            T_MIN,
            jnp.inf,
        )
    elif use_pallas:
        from crucible_tpu.ops.pallas.sphere_hit import hit_spheres_pallas

        csr = jnp.sum(sd.sph_center * sd.sph_center, -1) - sd.sph_radius * sd.sph_radius
        t_s, i_s, hit_s = hit_spheres_pallas(
            o, d, sd.sph_center, csr, sd.sph_active.astype(jnp.float32), t_min=T_MIN
        )
    else:
        t_s, i_s, hit_s = intersect.hit_spheres(
            o, d, sd.sph_center, sd.sph_radius, sd.sph_active, T_MIN, jnp.inf
        )

    moving_tris = animated and sd.tri_v0_d is not None and not sd.tri_exact
    tri_rt = None
    exact_winner_fn = None
    if sd.num_tris > 0 and exact and sd.tri_exact:
        from crucible_tpu.models import timeline as tl_mod

        if sd.use_bvh:
            # Per-candidate vertex timelines evaluated at the ray's time
            # inside the leaf test — the reference's per-ray traversal-time
            # evaluation (src/objects/bvhwrapper.rs:102-106) without the
            # per-ray AABB mutation (node bounds enclose the full
            # trajectory; models/scene.py unions over keyframe kinks).
            exact_winner_fn = lambda pid: exact_tri_vertices(sd, pid, t_ray)
            t_t, i_t, hit_t = bvh_hit_triangles(
                o,
                d,
                sd.tri_v0,
                sd.tri_v1,
                sd.tri_v2,
                sd.bvh_min,
                sd.bvh_max,
                sd.bvh_first,
                sd.bvh_count,
                sd.bvh_miss,
                T_MIN,
                BIG,
                sd.bvh_leaf_size,
                vertex_fn=exact_winner_fn,
            )
        else:
            vall = tl_mod.eval_translate(
                sd.tri_tr_t0, sd.tri_tr_t1, sd.tri_tr_delta, sd.tri_tr_init,
                t_ray,
            )  # (R, 3M, 3) vertex-major
            sall = tl_mod.eval_scale(
                sd.tri_sc_t0, sd.tri_sc_t1, sd.tri_sc_from, sd.tri_sc_to, t_ray
            )
            vall = sall * vall  # reference: scale(t) * translate(t) * origin
            m_rows = sd.tri_v0.shape[0]
            tri_rt = (
                vall[:, 0:m_rows],
                vall[:, m_rows : 2 * m_rows],
                vall[:, 2 * m_rows : 3 * m_rows],
            )
            t_t, i_t, hit_t = intersect.hit_triangles(
                o, d, tri_rt[0], tri_rt[1], tri_rt[2], sd.tri_active, T_MIN, jnp.inf
            )
        is_tri = hit_t & (t_t < t_s)
    elif sd.num_tris > 0:
        motion = (
            dict(v0d=sd.tri_v0_d, v1d=sd.tri_v1_d, v2d=sd.tri_v2_d, w=w)
            if moving_tris
            else {}
        )
        if sd.use_bvh:
            t_t, i_t, hit_t = bvh_hit_triangles(
                o,
                d,
                sd.tri_v0,
                sd.tri_v1,
                sd.tri_v2,
                sd.bvh_min,
                sd.bvh_max,
                sd.bvh_first,
                sd.bvh_count,
                sd.bvh_miss,
                T_MIN,
                BIG,
                sd.bvh_leaf_size,
                **motion,
            )
        else:
            t_t, i_t, hit_t = intersect.hit_triangles(
                o, d, sd.tri_v0, sd.tri_v1, sd.tri_v2, sd.tri_active, T_MIN, jnp.inf,
                **motion,
            )
        is_tri = hit_t & (t_t < t_s)
    else:
        t_t = jnp.full((r,), BIG)
        i_t = jnp.zeros((r,), jnp.int32)
        is_tri = jnp.zeros((r,), bool)

    hit = hit_s | is_tri
    t = jnp.where(is_tri, t_t, t_s)
    # Miss lanes carry t = BIG; clamp the shading-point t to keep all
    # downstream geometry finite (inf would turn masked-out lanes into NaN
    # gradients via 0 * inf in the backward pass).
    t_shade = jnp.where(hit, t, 1.0)
    point = o + t_shade[:, None] * d

    # Sphere shading attributes (src/objects/sphere.rs:95-105).
    if exact:
        c_w = jnp.take_along_axis(centers_rt, i_s[:, None, None], axis=1)[:, 0]
        r_w = jnp.take_along_axis(radii_rt, i_s[:, None], axis=1)[:, 0]
    else:
        c_w = jnp.take(sd.sph_center, i_s, axis=0)
        r_w = jnp.take(sd.sph_radius, i_s, axis=0)
        if animated:
            c_w = c_w + w[:, None] * jnp.take(sd.sph_center_d, i_s, axis=0)
            r_w = r_w + w * jnp.take(sd.sph_radius_d, i_s, axis=0)
    n_sph = (point - c_w) / jnp.maximum(r_w, 1e-20)[:, None]
    u_sph, v_sph = intersect.sphere_uv(n_sph)

    if sd.num_tris > 0:
        if exact_winner_fn is not None:
            a, b, c = exact_winner_fn(i_t)
        elif tri_rt is not None:
            sel = i_t[:, None, None]
            a = jnp.take_along_axis(tri_rt[0], sel, axis=1)[:, 0]
            b = jnp.take_along_axis(tri_rt[1], sel, axis=1)[:, 0]
            c = jnp.take_along_axis(tri_rt[2], sel, axis=1)[:, 0]
        else:
            a = jnp.take(sd.tri_v0, i_t, axis=0)
            b = jnp.take(sd.tri_v1, i_t, axis=0)
            c = jnp.take(sd.tri_v2, i_t, axis=0)
        if moving_tris:
            a = a + w[:, None] * jnp.take(sd.tri_v0_d, i_t, axis=0)
            b = b + w[:, None] * jnp.take(sd.tri_v1_d, i_t, axis=0)
            c = c + w[:, None] * jnp.take(sd.tri_v2_d, i_t, axis=0)
        n_tri = intersect.triangle_normal(a, b, c)
        n_out = jnp.where(is_tri[:, None], n_tri, n_sph)
        mat = jnp.where(
            is_tri, jnp.take(sd.tri_mat, i_t, axis=0), jnp.take(sd.sph_mat, i_s, axis=0)
        )
        # Triangle uv hardcoded (0,0) in the reference (triangle.rs:133-134).
        uu = jnp.where(is_tri, 0.0, u_sph)
        vv = jnp.where(is_tri, 0.0, v_sph)
    else:
        n_out = n_sph
        mat = jnp.take(sd.sph_mat, i_s, axis=0)
        uu, vv = u_sph, v_sph

    front = vec.dot(d, n_out) < 0.0
    normal = jnp.where(front[:, None], n_out, -n_out)
    return dict(
        hit=hit, t=t, point=point, normal=normal, front=front, u=uu, v=vv,
        mat=mat, i_sph=i_s, i_tri=i_t, is_tri=is_tri,
    )


def bounce_step(
    sd: SceneData, o, d, pixel_ids, sample_ids, bounce, seed,
    use_pallas=False, return_decisions=False,
):
    """One wavefront bounce: intersect, shade, sample the next direction.

    ``bounce`` may be a scalar (lockstep loop) or a per-ray (R,) array
    (persistent wavefront — each lane is at its own depth).

    Returns a dict:
      contrib (R, 3): radiance contribution BEFORE throughput weighting
        (sky on miss + emission on hit)
      hit (R,) bool, scattered (R,) bool
      new_o, new_d (R, 3), atten (R, 3)
    """
    if sd.animated:
        # Per-ray shutter fraction — same hash as the camera's time sample,
        # so scattered rays inherit the primary ray's time (reference:
        # Ray::new_at_time(.., r_in.time()), materials/*.rs).
        w = crng.uniform1(pixel_ids, sample_ids, crng.STREAM_TIME, seed)
    else:
        w = None
    h = intersect_scene(sd, o, d, use_pallas=use_pallas, w=w)
    hit = h["hit"]

    sky = sky_mod.radiance(sd.sky_kind, sd.sky_image, d)
    mat = h["mat"]
    emission = jnp.take(sd.mat_emission, mat, axis=0)
    contrib = jnp.where(hit[:, None], emission, sky)

    albedo = tex_mod.value(
        sd.tex, jnp.take(sd.mat_tex, mat, axis=0), h["u"], h["v"], h["point"]
    )
    u_dir1, u_dir2, u_decide = crng.uniform3(
        pixel_ids,
        sample_ids,
        jnp.uint32(crng.STREAM_BOUNCE_BASE) + jnp.asarray(bounce).astype(jnp.uint32),
        seed,
    )
    scat_out = mat_mod.scatter(
        jnp.take(sd.mat_type, mat, axis=0),
        jnp.take(sd.mat_fuzz, mat, axis=0),
        jnp.take(sd.mat_ior, mat, axis=0),
        jnp.take(sd.mat_prob, mat, axis=0),
        albedo,
        d,
        h["normal"],
        h["front"],
        u_dir1,
        u_dir2,
        u_decide,
        return_decisions=return_decisions,
    )
    out = dict(
        contrib=contrib,
        hit=hit,
        scattered=scat_out[2],
        new_o=h["point"],
        new_d=scat_out[0],
        atten=scat_out[1],
    )
    if return_decisions:
        out.update(
            decisions=scat_out[3],
            front=h["front"],
            i_sph=h["i_sph"],
            i_tri=h["i_tri"],
            is_tri=h["is_tri"],
        )
    return out


def make_sphere_table(sd: SceneData):
    """Per-sphere attribute table (N, 32) for the fused intersect+fetch
    kernel (ops/pallas/sphere_shade.py — see its docstring for the column
    layout). Built from the differentiable scene tables with N-sized (tiny)
    gathers; loop-invariant per render. Motion columns are zeros for static
    scenes."""
    n = sd.sph_center.shape[0]
    mat = sd.sph_mat
    tid = jnp.take(sd.mat_tex, mat, axis=0)
    even_id = jnp.take(sd.tex.even, tid, axis=0)
    odd_id = jnp.take(sd.tex.odd, tid, axis=0)
    if sd.animated and sd.sph_center_d is not None:
        cd = sd.sph_center_d
        rd = sd.sph_radius_d
    else:
        cd = jnp.zeros_like(sd.sph_center)
        rd = jnp.zeros_like(sd.sph_radius)
    zeros = jnp.zeros((n,), jnp.float32)
    cols = [
        sd.sph_center[:, 0],
        sd.sph_center[:, 1],
        sd.sph_center[:, 2],
        sd.sph_radius,
        jnp.sum(sd.sph_center * sd.sph_center, -1) - sd.sph_radius * sd.sph_radius,
        sd.sph_active.astype(jnp.float32),
        jnp.take(sd.mat_type, mat, axis=0).astype(jnp.float32),
        jnp.take(sd.mat_fuzz, mat, axis=0),
        jnp.take(sd.mat_ior, mat, axis=0),
        jnp.take(sd.mat_prob, mat, axis=0),
        jnp.take(sd.mat_emission, mat, axis=0)[:, 0],
        jnp.take(sd.mat_emission, mat, axis=0)[:, 1],
        jnp.take(sd.mat_emission, mat, axis=0)[:, 2],
        jnp.take(sd.tex.kind, tid, axis=0).astype(jnp.float32),
        jnp.take(sd.tex.color, tid, axis=0)[:, 0],
        jnp.take(sd.tex.color, tid, axis=0)[:, 1],
        jnp.take(sd.tex.color, tid, axis=0)[:, 2],
        jnp.take(sd.tex.inv_scale, tid, axis=0),
        jnp.take(sd.tex.color, even_id, axis=0)[:, 0],
        jnp.take(sd.tex.color, even_id, axis=0)[:, 1],
        jnp.take(sd.tex.color, even_id, axis=0)[:, 2],
        jnp.take(sd.tex.color, odd_id, axis=0)[:, 0],
        jnp.take(sd.tex.color, odd_id, axis=0)[:, 1],
        jnp.take(sd.tex.color, odd_id, axis=0)[:, 2],
        cd[:, 0],
        cd[:, 1],
        cd[:, 2],
        rd,
        jnp.sum(sd.sph_center * cd, -1) - sd.sph_radius * rd,  # s1
        jnp.sum(cd * cd, -1) - rd * rd,  # s2
        tid.astype(jnp.float32),  # 30: texture id (replay image lookups)
        # 31: original row id (exact in f32 for ids < 2^24 >> REC_MAX_IDS).
        # Structure-walk record passes fetch it through the winner fetch to
        # DE-PERMUTE ids from the BVH/cluster-permuted table, keeping
        # records bit-compatible with the brute/staged passes.
        jnp.arange(n, dtype=jnp.float32),
    ]
    return jnp.stack(cols, axis=1)


def fused_supported(sd: SceneData) -> bool:
    """Static predicate: the fused gather-free bounce applies to sphere-only
    scenes (static or linearly-moving) whose textures are
    solid/checker-of-solid (no image lookups — those need uv + texel
    gathers). The equirect sky image is fine (sampled outside the kernel).
    Exact per-ray-time track evaluation (mid-shutter keyframes) and nested
    checkers (the fused table bakes one level of checker colors) stay on
    the jnp path."""
    return (
        sd.num_tris == 0
        and len(sd.tex.images) == 0
        and sd.tex.max_nest <= 1
        and not sd.motion_exact
    )


def bounce_step_fused(sd: SceneData, table, o, d, pixel_ids, sample_ids, bounce, seed):
    """Gather-free bounce for sphere scenes: the pallas kernel returns the
    winner's shading attributes directly (sphere_shade.py), so everything
    below is elementwise. Also skips sphere-uv transcendentals (uv only
    feeds image textures, absent here)."""
    from crucible_tpu.ops.pallas.sphere_shade import hit_spheres_fetch

    if sd.animated:
        w = crng.uniform1(pixel_ids, sample_ids, crng.STREAM_TIME, seed)
    else:
        w = jnp.zeros(o.shape[:1], jnp.float32)
    out = hit_spheres_fetch(o, d, w, table, t_min=T_MIN)
    t = out[0]
    hit = t < BIG
    center = out[2:5].T + w[:, None] * out[24:27].T
    radius = out[5] + w * out[27]
    point = o + jnp.where(hit, t, 1.0)[:, None] * d
    n_out = (point - center) / jnp.maximum(radius, 1e-20)[:, None]
    front = vec.dot(d, n_out) < 0.0
    normal = jnp.where(front[:, None], n_out, -n_out)

    mat_type = out[6]
    emission = out[10:13].T
    sky = sky_mod.radiance(sd.sky_kind, sd.sky_image, d)
    contrib = jnp.where(hit[:, None], emission, sky)

    # Texture: solid or 3-D checker of solids (textures.py semantics).
    tex_kind = out[13]
    inv_scale = out[17]
    xyz = jnp.floor(inv_scale[:, None] * point).astype(jnp.int32)
    is_even = (xyz[:, 0] + xyz[:, 1] + xyz[:, 2]) % 2 == 0
    checker = jnp.where(is_even[:, None], out[18:21].T, out[21:24].T)
    albedo = jnp.where((tex_kind == tex_mod.CHECKER)[:, None], checker, out[14:17].T)

    u_dir1, u_dir2, u_decide = crng.uniform3(
        pixel_ids,
        sample_ids,
        jnp.uint32(crng.STREAM_BOUNCE_BASE) + jnp.asarray(bounce).astype(jnp.uint32),
        seed,
    )
    new_dir, atten, scattered = mat_mod.scatter(
        mat_type, out[7], out[8], out[9], albedo, d, normal, front,
        u_dir1, u_dir2, u_decide,
    )
    return dict(
        contrib=contrib,
        hit=hit,
        scattered=scattered,
        new_o=point,
        new_d=new_dir,
        atten=atten,
    )


def trace(
    sd: SceneData,
    o,
    d,
    pixel_ids,
    sample_ids,
    seed,
    max_depth: int,
    use_pallas: bool = False,
    differentiable: bool = False,
):
    """Integrate radiance for a wavefront of primary rays -> (R, 3).

    Lockstep bounce loop — the direct unrolling of the reference recursion.
    ``differentiable=False`` uses a while_loop with early exit once every
    ray died (fast forward-only path); ``differentiable=True`` uses a
    static-trip-count scan so reverse-mode autodiff works (while_loop has
    no transpose rule). Identical results either way.
    """
    r = o.shape[0]
    throughput0 = jnp.ones((r, 3), jnp.float32)
    radiance0 = jnp.zeros((r, 3), jnp.float32)
    alive0 = jnp.ones((r,), bool)
    bounce0 = jnp.int32(0)

    def body(state):
        bounce, o_c, d_c, throughput, radiance, alive = state
        s = bounce_step(sd, o_c, d_c, pixel_ids, sample_ids, bounce, seed, use_pallas)
        radiance = radiance + jnp.where(
            alive[:, None], throughput * s["contrib"], 0.0
        )
        new_alive = alive & s["hit"] & s["scattered"]
        throughput = jnp.where(new_alive[:, None], throughput * s["atten"], throughput)
        o_c = jnp.where(new_alive[:, None], s["new_o"], o_c)
        d_c = jnp.where(new_alive[:, None], s["new_d"], d_c)
        return bounce + 1, o_c, d_c, throughput, radiance, new_alive

    state = (bounce0, o, d, throughput0, radiance0, alive0)
    if differentiable:
        # Rematerialize each bounce in the backward pass: without this the
        # AD tape holds every (R, N) intersection intermediate for all
        # max_depth bounces (O(depth * R * N) memory); with it, backward
        # memory is one bounce deep at the cost of recomputing forwards
        # (the jax.checkpoint trade from the TPU playbook).
        @jax.checkpoint
        def scan_body(state, _):
            return body(state), None

        state, _ = jax.lax.scan(scan_body, state, None, length=max_depth)
    else:
        def cond(state):
            bounce, _, _, _, _, alive = state
            return (bounce < max_depth) & jnp.any(alive)

        state = jax.lax.while_loop(cond, body, state)
    return state[4]


def trace_persistent(
    sd: SceneData,
    cp,
    width: int,
    height: int,
    spp: int,
    max_depth: int,
    seed,
    lanes: int = 0,
    use_pallas: bool = True,
    return_stats: bool = False,
    sample_start=0,
):
    """Persistent-wavefront path tracer with lane-local sample regeneration.

    The TPU answer to ray compaction (SURVEY.md §7 "Wavefront integrator"):
    every vector lane is PERMANENTLY bound to one pixel and walks that
    pixel's spp samples sequentially. When a lane's path dies (sky hit,
    absorption, depth exhausted) it immediately starts the pixel's next
    sample — no global work queue, no prefix sums, and crucially NO
    scatter-adds into a framebuffer (TPU scatters are slow): each lane
    accumulates privately and the framebuffer is just the accumulator array.

    Lane utilization is governed by path-length variance *summed over spp
    samples*, which concentrates sharply (CLT), so busy work stays ~100%
    except in the final tail. Because every random number is a pure hash of
    (pixel, sample, bounce) (utils/rng.py), the image is identical to
    :func:`trace` over the same sample set, up to f32 summation order.

    ``lanes`` is a TARGET lane count: the pixel grid is replicated into
    G = ceil(lanes / pixels) SAMPLE GROUPS (clamped to spp) — lane (g, p)
    traces pixel p's samples g, g+G, g+2G, ... This saturates the chip on
    small images AND shortens the serial tail (each lane sums ~spp/G path
    lengths, so the max-over-lanes concentrates). Group accumulators reduce
    with one reshape-sum at the end — still no scatter.

    Returns the per-pixel radiance SUM (num_pixels, 3); divide by spp.

    ``spp`` may be a Python int (static) or a traced uint32 scalar — traced
    spp keeps ONE compiled executable across sample counts (the group count
    then comes from ``lanes`` alone; groups beyond spp idle, which only
    wastes lanes when spp is tiny).

    ``sample_start`` renders samples [sample_start, spp) — the chunked
    progress-reporting driver (models/render.py) sums chunk renders, same
    sample set as one call up to f32 summation order.
    """
    num_pixels = width * height
    spp_static = int(spp) if isinstance(spp, (int, np.integer)) else None
    groups = max(1, (max(lanes, 1) + num_pixels - 1) // num_pixels)
    if spp_static is not None:
        groups = min(spp_static, groups)
    spp = jnp.asarray(spp, jnp.uint32)
    sample_start = jnp.asarray(sample_start, jnp.uint32)
    p_pad = ((num_pixels + 511) // 512) * 512  # pallas TILE_RAYS alignment
    r = groups * p_pad

    lane = jnp.arange(r, dtype=jnp.uint32)
    pix = jnp.minimum(lane % p_pad, num_pixels - 1)
    grp = lane // p_pad
    # Padding lanes (pixel slot >= num_pixels) start exhausted.
    pad = (lane % p_pad) >= num_pixels

    acc0 = jnp.zeros((r, 3), jnp.float32)
    sample0 = jnp.where(pad, spp, sample_start + grp).astype(jnp.uint32)
    alive0 = jnp.zeros((r,), bool)
    bounce0 = jnp.zeros((r,), jnp.int32)
    o0 = jnp.zeros((r, 3), jnp.float32)
    d0 = jnp.ones((r, 3), jnp.float32)
    thr0 = jnp.zeros((r, 3), jnp.float32)

    fused = use_pallas and fused_supported(sd)
    table = make_sphere_table(sd) if fused else None

    def cond(state):
        sample_i, alive, *_ = state[:-1] if return_stats else state
        return jnp.any(alive | (sample_i < spp))

    def body(state):
        if return_stats:
            *state, iters = state
        sample_i, alive, bounce, o, d, thr, acc = state

        # --- lane-local regeneration: this lane's next sample -------------
        issue = (~alive) & (sample_i < spp)
        no, nd, _ = generate_rays(cp, width, height, pix, sample_i, seed)
        o = jnp.where(issue[:, None], no, o)
        d = jnp.where(issue[:, None], nd, d)
        thr = jnp.where(issue[:, None], 1.0, thr)
        bounce = jnp.where(issue, 0, bounce)
        alive = alive | issue

        # The sample id that rays in flight belong to (issued now or earlier).
        smp = jnp.where(alive & ~issue, sample_i - groups, sample_i)
        smp_next = jnp.where(issue, sample_i + groups, sample_i)

        # --- one bounce for every lane ------------------------------------
        if fused:
            s = bounce_step_fused(sd, table, o, d, pix, smp, bounce, seed)
        else:
            s = bounce_step(sd, o, d, pix, smp, bounce, seed, use_pallas)
        acc = acc + jnp.where(alive[:, None], thr * s["contrib"], 0.0)

        cont = alive & s["hit"] & s["scattered"] & (bounce + 1 < max_depth)
        thr = jnp.where(cont[:, None], thr * s["atten"], thr)
        o = jnp.where(cont[:, None], s["new_o"], o)
        d = jnp.where(cont[:, None], s["new_d"], d)
        bounce = bounce + 1
        out = (smp_next, cont, bounce, o, d, thr, acc)
        return out + (iters + 1,) if return_stats else out

    state = (sample0, alive0, bounce0, o0, d0, thr0, acc0)
    if return_stats:
        *rest, acc, iters = jax.lax.while_loop(
            cond, body, state + (jnp.int32(0),)
        )
        return acc.reshape(groups, p_pad, 3).sum(axis=0)[:num_pixels], iters
    *_, acc = jax.lax.while_loop(cond, body, state)
    return acc.reshape(groups, p_pad, 3).sum(axis=0)[:num_pixels]


def megakernel_supported(sd: SceneData, cp) -> bool:
    """Static predicate for the all-in-VMEM persistent megakernel
    (ops/pallas/megakernel.py): solid/checker textures, default-gradient
    sky. Moving spheres, animated cameras (per-ray basis re-derivation
    in-kernel), and — as of r4 — MOVING triangle meshes (linear shutter
    vertex deltas lerped in the leaf test; the node bounds already union
    the shutter endpoints) are supported; only exact per-ray-time scenes
    fall back to the staged path. Very large BVHs fall back: node metadata
    lives in SMEM, capped at megakernel.MAX_TRI_NODES (raise leaf_size to
    shrink the node count)."""
    from crucible_tpu.ops.pallas.megakernel import MAX_TRI_NODES

    tris_ok = sd.num_tris == 0 or (
        sd.use_bvh and sd.bvh_min.shape[0] <= MAX_TRI_NODES
    )
    return (
        len(sd.tex.images) == 0
        and sd.tex.max_nest <= 1
        and sd.sky_kind == sky_mod.DEFAULT
        and tris_ok
        and not sd.motion_exact
        and not getattr(cp, "motion_exact", False)
    )


def megakernel_record_supported(sd: SceneData, cp) -> bool:
    """Static predicate for the RECORD-MODE megakernel (replay.py).

    Wider than :func:`megakernel_supported`: path DECISIONS (winner ids,
    scatter branches, termination) never depend on albedo or sky radiance —
    Lambertian/metal/dielectric directions and Russian-roulette use only
    geometry + material scalars — so image textures, equirect skyboxes and
    nested checkers are all fine here; the decision records feed the jnp
    replay, whose XLA gathers handle the texel/sky lookups. Only the
    geometry stage's limits remain: BVH triangles (static or linear-motion,
    node count within the SMEM cap), no exact per-ray timeline
    evaluation."""
    from crucible_tpu.ops.pallas.megakernel import MAX_TRI_NODES

    from crucible_tpu.models.render import MEGA_MAX_BRUTE_ROWS

    tris_ok = sd.num_tris == 0 or (
        sd.use_bvh and sd.bvh_min.shape[0] <= MAX_TRI_NODES
    )
    # Big sphere tables need a structure walk (sphere BVH / cluster cull,
    # built at scene build — sd.sph_perm): the brute (N, T) candidate
    # buffers exceed scoped VMEM past ~4k rows. Without one (structure
    # build disabled or all spheres hidden), route to the staged record.
    rows_ok = (
        int(sd.sph_center.shape[0]) <= MEGA_MAX_BRUTE_ROWS
        or sd.sph_perm is not None
    )
    return (
        tris_ok
        and rows_ok
        and not sd.motion_exact
        and not getattr(cp, "motion_exact", False)
    )


def make_tri_tables(sd: SceneData):
    """Assemble the megakernel triangle inputs from the scene arrays:
    (tri_nodes (K,16), tris (M,16) — or (M,32) for MOVING meshes, with
    linear shutter deltas v0d/e1d/e2d in cols 16-24 — mats (NM,24)) —
    layouts in megakernel.run_megakernel's docstring. Tiny per-render
    gathers."""
    e1 = sd.tri_v1 - sd.tri_v0
    e2 = sd.tri_v2 - sd.tri_v0
    n = intersect.triangle_normal(sd.tri_v0, sd.tri_v1, sd.tri_v2)
    m = sd.tri_v0.shape[0]
    from crucible_tpu.ops.pallas.megakernel import WOOP

    if WOOP and sd.tri_v0_d is None:
        # WOOP layout (static meshes): cols 0-11 = the affine world->unit-
        # triangle transform (rows of M = [e1 e2 nu]^-1 and b = -M v0, with
        # nu = e1 x e2 UNNORMALIZED so det = |nu|^2), cols 12-14 = unit
        # normal, col 15 = mat id. The kernel's unit-triangle test
        # (t = -o'_z/d'_z, u = o'_x + t d'_x, ...) replaces Moller-Trumbore
        # with ~17% fewer VPU ops and no cross-product temporaries.
        nu = jnp.cross(e1, e2)
        det = jnp.sum(nu * nu, axis=-1, keepdims=True)
        inv = 1.0 / jnp.where(jnp.abs(det) > 1e-30, det, 1.0)
        a0 = jnp.cross(e2, nu) * inv
        a1 = jnp.cross(nu, e1) * inv
        a2 = nu * inv
        # Degenerate rows (det ~ 0): zero the transform -> d'_z == 0 ->
        # the dz guard rejects, like MT's det_ok.
        ok = (jnp.abs(det) > 1e-30).astype(jnp.float32)
        a0, a1, a2 = a0 * ok, a1 * ok, a2 * ok
        b = jnp.stack(
            [
                -jnp.sum(a0 * sd.tri_v0, axis=-1),
                -jnp.sum(a1 * sd.tri_v0, axis=-1),
                -jnp.sum(a2 * sd.tri_v0, axis=-1),
            ],
            axis=1,
        )
        cols = [a0, a1, a2, b, n, sd.tri_mat.astype(jnp.float32)[:, None]]
    else:
        cols = [
            sd.tri_v0, e1, e2, n,
            sd.tri_mat.astype(jnp.float32)[:, None],
            jnp.zeros((m, 3), jnp.float32),
        ]
        if sd.tri_v0_d is not None:
            cols += [
                sd.tri_v0_d,
                sd.tri_v1_d - sd.tri_v0_d,  # e1 delta
                sd.tri_v2_d - sd.tri_v0_d,  # e2 delta
                jnp.zeros((m, 7), jnp.float32),
            ]
    tris = jnp.concatenate(cols, axis=1)
    # Pad by one leaf of zero rows: the kernel's batched leaf test reads a
    # full tri_leaf block at any leaf start (zero rows fail det_ok).
    tris = jnp.pad(tris, ((0, sd.bvh_leaf_size), (0, 0)))
    k = sd.bvh_min.shape[0]
    tri_nodes = jnp.concatenate(
        [
            sd.bvh_min, sd.bvh_max,
            sd.bvh_first.astype(jnp.float32)[:, None],
            sd.bvh_count.astype(jnp.float32)[:, None],
            sd.bvh_miss.astype(jnp.float32)[:, None],
            jnp.zeros((k, 7), jnp.float32),
        ],
        axis=1,
    )
    nm = sd.mat_type.shape[0]
    tid = sd.mat_tex
    even_id = jnp.take(sd.tex.even, tid, axis=0)
    odd_id = jnp.take(sd.tex.odd, tid, axis=0)
    mats = jnp.concatenate(
        [
            sd.mat_type.astype(jnp.float32)[:, None],
            sd.mat_fuzz[:, None],
            sd.mat_ior[:, None],
            sd.mat_prob[:, None],
            sd.mat_emission,
            jnp.take(sd.tex.kind, tid, axis=0).astype(jnp.float32)[:, None],
            jnp.take(sd.tex.color, tid, axis=0),
            jnp.take(sd.tex.inv_scale, tid, axis=0)[:, None],
            jnp.take(sd.tex.color, even_id, axis=0),
            jnp.take(sd.tex.color, odd_id, axis=0),
            tid.astype(jnp.float32)[:, None],  # 18: texture id (replay)
            jnp.zeros((nm, 5), jnp.float32),
        ],
        axis=1,
    )
    # Flat int32 node metadata [first, count, miss] per node, padded with
    # NODE_WIN guard rows (count 0, miss = K) — lives in SMEM so the
    # kernel's scalar cursor chase reads it without syncing on the vector
    # pipeline (the f32 metadata columns of tri_nodes are legacy and
    # unread by the kernel).
    from crucible_tpu.ops.pallas.megakernel import NODE_WIN

    guard = jnp.broadcast_to(
        jnp.asarray([0, 0, k], jnp.int32), (NODE_WIN, 3)
    )
    tri_meta = jnp.concatenate(
        [
            jnp.stack(
                [
                    sd.bvh_first.astype(jnp.int32),
                    sd.bvh_count.astype(jnp.int32),
                    sd.bvh_miss.astype(jnp.int32),
                ],
                axis=1,
            ),
            guard,
        ]
    ).reshape(-1)
    return tri_nodes, tris, mats, tri_meta


def mega_cam_vector(cp, width: int, height: int):
    """Camera-constant vector for the megakernel — the static-camera
    specialization of models/camera.py::generate_rays (identical formulas
    and eps; layout documented at megakernel.py CAM_SIZE)."""
    from crucible_tpu.ops.pallas import megakernel as mk
    from crucible_tpu.utils import vec

    lf, la = cp.look_from, cp.look_at
    w_b = vec.unit(lf - la, eps=1e-12)
    u_b = vec.unit(jnp.cross(cp.vup, w_b), eps=1e-12)
    v_b = jnp.cross(w_b, u_b)
    h = jnp.tan(cp.vfov_rad / 2.0)
    viewport_h = 2.0 * h * cp.focus_dist
    viewport_w = viewport_h * (width / height)
    du = viewport_w * u_b / width
    dv = viewport_h * (-v_b) / height
    pixel00 = (
        lf - cp.focus_dist * w_b - 0.5 * (width - 1) * du - 0.5 * (height - 1) * dv
    )
    defr = cp.focus_dist * jnp.tan(cp.defocus_angle_rad / 2.0)
    defr = jnp.where(cp.defocus_angle_rad > 0.0, defr, 0.0)
    zero3 = jnp.zeros((3,), jnp.float32)
    lf_d = cp.look_from_d if cp.look_from_d is not None else zero3
    la_d = cp.look_at_d if cp.look_at_d is not None else zero3
    return jnp.concatenate(
        [
            pixel00, du, dv, lf, u_b, v_b, defr[None],
            # Animated-camera slots 19-37 (megakernel.py layout).
            la, lf_d, la_d, cp.vup,
            viewport_h[None], viewport_w[None], cp.focus_dist[None],
            jnp.asarray([width, height], jnp.float32),
            jnp.asarray([0.5 * (width - 1), 0.5 * (height - 1)], jnp.float32),
            jnp.zeros((10,), jnp.float32),
        ]
    ).astype(jnp.float32).reshape(1, mk.CAM_SIZE)


def trace_persistent_mega(
    sd: SceneData,
    cp,
    width: int,
    height: int,
    spp,
    max_depth,
    seed,
    lanes: int = 0,  # accepted for signature parity; lane count = pixels
    use_pallas: bool = True,  # ditto
    interpret: bool = False,
    cluster_perm=None,  # (N_pad,) int32 from megakernel.cluster_spheres
    cluster_bounds=None,  # (K, 8) f32 chunk AABBs (enables chunk culling)
    sphere_nodes=None,  # (K, 16) f32 sphere-BVH boxes (sphere_bvh_tables;
    #                     cluster_perm then carries the BVH-leaf-order perm)
    sphere_meta=None,  # (3*(K+W),) i32 sphere-BVH node metadata
    swizzle: bool = True,
    row0=0,  # first image row this call renders (traced ok) — sharding
    band_height: int | None = None,  # rows this call renders (default: all)
    sample_start=0,  # render samples [sample_start, spp) — chunked progress
):
    """Whole persistent render in ONE pallas kernel (see megakernel.py).

    Semantics = trace_persistent with groups=1 (lane p walks pixel p's spp
    samples; identical pcg4d streams), with per-TILE loop exit instead of a
    global wavefront barrier. Returns the per-pixel radiance SUM
    (band_height*width, 3). ``spp``, ``max_depth`` and ``seed`` are traced —
    one executable per (scene shape, image size).

    ``swizzle`` maps each 512-lane tile to a 32x16 PIXEL BLOCK instead of
    1.3 scanlines: compact tile frustums mean coherent path lengths (earlier
    per-tile exit) and fewer sphere chunks per tile under cluster culling.
    Per-pixel output is bit-identical either way (lane assignment only).

    ``row0``/``band_height`` render a horizontal band of the FULL image
    (width/height stay the global dims for camera math and RNG pixel ids),
    which is how the multi-chip driver shards pixels: each device renders
    rows [row0, row0+band_height) and the sharded image is bit-identical
    to the single-chip render (parallel/render.py).
    """
    from crucible_tpu.ops.pallas import megakernel as mk
    from crucible_tpu.utils import vec

    if band_height is None:
        band_height = height
    row0 = jnp.asarray(row0, jnp.int32)
    sample_start = jnp.asarray(sample_start, jnp.int32)
    band_pixels = width * band_height
    if swizzle:
        bw, bh = 32, mk.TILE // 32
        gx = (width + bw - 1) // bw
        gy = (band_height + bh - 1) // bh
        r = gx * gy * mk.TILE
        lane = jnp.arange(r, dtype=jnp.int32)
        tile, q = lane // mk.TILE, lane % mk.TILE
        px = (tile % gx) * bw + q % bw
        py = (tile // gx) * bh + q // bw + row0  # global image row
        valid = (px < width) & (py < row0 + band_height) & (py < height)
        pix = (
            jnp.minimum(py, height - 1) * width + jnp.minimum(px, width - 1)
        ).reshape(1, r)
        sample0 = jnp.where(valid, sample_start, jnp.int32(2**30)).reshape(1, r)
        p = jnp.arange(band_pixels, dtype=jnp.int32)
        ppx, ppy = p % width, p // width  # band-local row
        lane_of = (
            ((ppy // bh) * gx + ppx // bw) * mk.TILE + (ppy % bh) * bw + ppx % bw
        )
    else:
        r = ((band_pixels + mk.TILE - 1) // mk.TILE) * mk.TILE
        lane = jnp.arange(r, dtype=jnp.int32)
        gpix = lane + row0 * width  # global flat pixel id
        valid = (lane < band_pixels) & (gpix < width * height)
        pix = jnp.minimum(gpix, width * height - 1).reshape(1, r)
        sample0 = jnp.where(valid, sample_start, jnp.int32(2**30)).reshape(1, r)
        lane_of = None

    cam = mega_cam_vector(cp, width, height)

    smem = jnp.stack(
        [
            jnp.asarray(spp, jnp.uint32).astype(jnp.int32),
            jnp.asarray(seed, jnp.uint32).astype(jnp.int32),
            jnp.int32(width),
            jnp.asarray(max_depth, jnp.int32),
            jnp.int32(0), jnp.int32(0), jnp.int32(0), jnp.int32(0),
        ]
    )
    table = make_sphere_table(sd)
    if cluster_perm is not None:
        n_pad = cluster_perm.shape[0]
        if n_pad > table.shape[0]:
            table = jnp.pad(table, ((0, n_pad - table.shape[0]), (0, 0)))
        table = jnp.take(table, cluster_perm, axis=0)
    if sd.num_tris > 0:
        tri_nodes, tris, mats, tri_meta = make_tri_tables(sd)
    else:
        tri_nodes = tris = mats = tri_meta = None
    acc = mk.run_megakernel(
        smem, pix, sample0, cam, table, cluster_bounds,
        sphere_nodes, sphere_meta,
        tri_nodes, tris, mats, tri_meta,
        animated=bool(sd.animated), cam_animated=bool(cp.animated),
        tri_leaf=sd.bvh_leaf_size, sph_leaf=mk.SPH_LEAF,
        interpret=interpret,
    )
    if lane_of is not None:
        return jnp.take(acc.T, lane_of, axis=0)
    return acc.T[:band_pixels]


def trace_persistent_queue(
    sd: SceneData,
    cp,
    width: int,
    height: int,
    spp: int,
    max_depth: int,
    seed,
    lanes: int,
    use_pallas: bool = True,
    return_stats: bool = False,
    sample_start=0,
):
    """Persistent wavefront with a STRIDED GLOBAL path schedule.

    Lane i processes path ids i, i+R, i+2R, ... where path q maps to
    (pixel = q mod P, sample = q div P). Because consecutive paths of one
    lane orbit through many different pixels, per-lane total work
    concentrates by CLT even when path length is strongly pixel-dependent
    (glass-heavy pixels) — the failure mode of the lane-per-pixel schedule,
    whose worst lane must grind all spp samples of the worst pixel. The
    price is a scatter-add into the framebuffer each iteration (the
    lane-per-pixel schedule is scatter-free). Static schedule, no global
    counter, no prefix sums.

    Same RNG per (pixel, sample) => same image as the other modes up to
    f32 summation order.

    Returns the per-pixel radiance SUM (num_pixels, 3).

    ``spp`` may be a Python int or a traced uint32 scalar (single compile
    across sample counts). Total path count (pixels * spp) must stay below
    2^31 — int32 path ids (int64 needs jax x64 mode).
    """
    num_pixels = width * height
    r = max(512, ((lanes + 511) // 512) * 512)
    if isinstance(spp, (int, np.integer)):
        total_static = num_pixels * int(spp)
        assert total_static < 2**31, "queue schedule path ids overflow int32"
        r = min(r, ((total_static + 511) // 512) * 512)
    total = jnp.int32(num_pixels) * jnp.asarray(spp, jnp.int32)

    fused = use_pallas and fused_supported(sd)
    table = make_sphere_table(sd) if fused else None

    lane = jnp.arange(r, dtype=jnp.int32)
    # "previous" path id; first issue advances by r into [start, total).
    q0 = lane - r + jnp.asarray(sample_start, jnp.int32) * num_pixels
    fb0 = jnp.zeros((num_pixels, 3), jnp.float32)

    state0 = (
        q0,
        jnp.zeros((r,), bool),
        jnp.zeros((r,), jnp.int32),
        jnp.zeros((r, 3), jnp.float32),
        jnp.ones((r, 3), jnp.float32),
        jnp.zeros((r, 3), jnp.float32),
        fb0,
    )

    def cond(state):
        q, alive, *_ = state[:-1] if return_stats else state
        return jnp.any(alive | (q + r < total))

    def body(state):
        if return_stats:
            *state, iters = state
        q, alive, bounce, o, d, thr, fb = state

        issue = (~alive) & (q + r < total)
        q = jnp.where(issue, q + r, q)
        active = alive | issue
        pix = (jnp.where(q >= 0, q, 0) % num_pixels).astype(jnp.uint32)
        smp = (jnp.where(q >= 0, q, 0) // num_pixels).astype(jnp.uint32)

        no, nd, _ = generate_rays(cp, width, height, pix, smp, seed)
        o = jnp.where(issue[:, None], no, o)
        d = jnp.where(issue[:, None], nd, d)
        thr = jnp.where(issue[:, None], 1.0, thr)
        bounce = jnp.where(issue, 0, bounce)

        if fused:
            s = bounce_step_fused(sd, table, o, d, pix, smp, bounce, seed)
        else:
            s = bounce_step(sd, o, d, pix, smp, bounce, seed, use_pallas)
        contrib = jnp.where(active[:, None], thr * s["contrib"], 0.0)
        fb = fb.at[pix].add(contrib)

        cont = active & s["hit"] & s["scattered"] & (bounce + 1 < max_depth)
        thr = jnp.where(cont[:, None], thr * s["atten"], thr)
        o = jnp.where(cont[:, None], s["new_o"], o)
        d = jnp.where(cont[:, None], s["new_d"], d)
        out = (q, cont, bounce + 1, o, d, thr, fb)
        return out + (iters + 1,) if return_stats else out

    if return_stats:
        *rest, fb, iters = jax.lax.while_loop(cond, body, state0 + (jnp.int32(0),))
        return fb, iters
    *_, fb = jax.lax.while_loop(cond, body, state0)
    return fb


def render_rays(
    sd: SceneData,
    cp: CameraParams,
    width: int,
    height: int,
    pixel_ids,
    sample_ids,
    seed,
    max_depth: int,
    use_pallas: bool = False,
    differentiable: bool = False,
):
    """Primary-ray generation + path tracing for (pixel, sample) pairs."""
    o, d, _times = generate_rays(cp, width, height, pixel_ids, sample_ids, seed)
    return trace(
        sd, o, d, pixel_ids, sample_ids, seed, max_depth,
        use_pallas=use_pallas, differentiable=differentiable,
    )
