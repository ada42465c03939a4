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


def intersect_scene(sd: SceneData, o, d):
    """Closest hit against all scene primitives.

    Returns a dict of per-ray arrays:
      hit (bool), t, point (R,3), normal (R,3) front-face-flipped unit,
      front (bool), u, v, mat (int32).
    """
    r = o.shape[0]
    t_s, i_s, hit_s = intersect.hit_spheres(
        o, d, sd.sph_center, sd.sph_radius, sd.sph_active, T_MIN, jnp.inf
    )

    if sd.num_tris > 0:
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
            )
        else:
            t_t, i_t, hit_t = intersect.hit_triangles(
                o, d, sd.tri_v0, sd.tri_v1, sd.tri_v2, sd.tri_active, T_MIN, jnp.inf
            )
        is_tri = hit_t & (t_t < t_s)
    else:
        t_t = jnp.full((r,), BIG)
        i_t = jnp.zeros((r,), jnp.int32)
        is_tri = jnp.zeros((r,), bool)

    hit = hit_s | is_tri
    t = jnp.where(is_tri, t_t, t_s)
    point = o + t[:, None] * d

    # Sphere shading attributes (src/objects/sphere.rs:95-105).
    c_w = jnp.take(sd.sph_center, i_s, axis=0)
    r_w = jnp.take(sd.sph_radius, i_s, axis=0)
    n_sph = (point - c_w) / jnp.maximum(r_w, 1e-20)[:, None]
    u_sph, v_sph = intersect.sphere_uv(n_sph)

    if sd.num_tris > 0:
        a = jnp.take(sd.tri_v0, i_t, axis=0)
        b = jnp.take(sd.tri_v1, i_t, axis=0)
        c = jnp.take(sd.tri_v2, i_t, axis=0)
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
    return dict(hit=hit, t=t, point=point, normal=normal, front=front, u=uu, v=vv, mat=mat)


def trace(sd: SceneData, o, d, pixel_ids, sample_ids, seed, max_depth: int):
    """Integrate radiance for a wavefront of primary rays -> (R, 3)."""
    r = o.shape[0]
    throughput0 = jnp.ones((r, 3), jnp.float32)
    radiance0 = jnp.zeros((r, 3), jnp.float32)
    alive0 = jnp.ones((r,), bool)
    bounce0 = jnp.int32(0)

    def cond(state):
        bounce, _, _, _, _, alive = state
        return (bounce < max_depth) & jnp.any(alive)

    def body(state):
        bounce, o_c, d_c, throughput, radiance, alive = state
        h = intersect_scene(sd, o_c, d_c)
        hit = h["hit"] & alive
        miss = alive & ~h["hit"]

        sky = sky_mod.radiance(sd.sky_kind, sd.sky_image, d_c)
        radiance = radiance + jnp.where(miss[:, None], throughput * sky, 0.0)

        mat = h["mat"]
        emission = jnp.take(sd.mat_emission, mat, axis=0)
        radiance = radiance + jnp.where(hit[:, None], throughput * emission, 0.0)

        albedo = tex_mod.value(
            sd.tex, jnp.take(sd.mat_tex, mat, axis=0), h["u"], h["v"], h["point"]
        )
        u_dir1, u_dir2, u_decide = crng.uniform3(
            pixel_ids,
            sample_ids,
            jnp.uint32(crng.STREAM_BOUNCE_BASE) + bounce.astype(jnp.uint32),
            seed,
        )
        new_dir, atten, scattered = mat_mod.scatter(
            jnp.take(sd.mat_type, mat, axis=0),
            jnp.take(sd.mat_fuzz, mat, axis=0),
            jnp.take(sd.mat_ior, mat, axis=0),
            jnp.take(sd.mat_prob, mat, axis=0),
            albedo,
            d_c,
            h["normal"],
            h["front"],
            u_dir1,
            u_dir2,
            u_decide,
        )
        new_alive = hit & scattered
        throughput = jnp.where(new_alive[:, None], throughput * atten, throughput)
        o_c = jnp.where(new_alive[:, None], h["point"], o_c)
        d_c = jnp.where(new_alive[:, None], new_dir, d_c)
        return bounce + 1, o_c, d_c, throughput, radiance, new_alive

    state = (bounce0, o, d, throughput0, radiance0, alive0)
    _, _, _, _, radiance, _ = jax.lax.while_loop(cond, body, state)
    return radiance


def render_rays(
    sd: SceneData,
    cp: CameraParams,
    width: int,
    height: int,
    pixel_ids,
    sample_ids,
    seed,
    max_depth: int,
):
    """Primary-ray generation + path tracing for (pixel, sample) pairs."""
    o, d, _times = generate_rays(cp, width, height, pixel_ids, sample_ids, seed)
    return trace(sd, o, d, pixel_ids, sample_ids, seed, max_depth)
