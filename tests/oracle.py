"""Independent pure-NumPy scalar path-tracing oracle.

Implements the SAME mathematical semantics as crucible_tpu's integrator
(reference recursion ray_color, src/camera/ray_casting.rs:112-152, with the
framework's documented deviations: no per-op clamping, closed-form samplers,
PCG4D counter RNG) but written scalar-recursively in float64 NumPy with no
JAX anywhere. Agreement between this oracle and the vectorized f32 JAX
renderer validates both against each other — the BASELINE "allclose to CPU
reference at matched spp and seeds" acceptance.
"""

from __future__ import annotations

import math

import numpy as np

# --- PCG4D, bit-identical to crucible_tpu.utils.rng ------------------------

M32 = 0xFFFFFFFF


def pcg4d(a, b, c, d):
    x, y, z, w = a & M32, b & M32, c & M32, d & M32
    x = (x * 1664525 + 1013904223) & M32
    y = (y * 1664525 + 1013904223) & M32
    z = (z * 1664525 + 1013904223) & M32
    w = (w * 1664525 + 1013904223) & M32
    x = (x + y * w) & M32
    y = (y + z * x) & M32
    z = (z + x * y) & M32
    w = (w + y * z) & M32
    x ^= x >> 16
    y ^= y >> 16
    z ^= z >> 16
    w ^= w >> 16
    x = (x + y * w) & M32
    y = (y + z * x) & M32
    z = (z + x * y) & M32
    w = (w + y * z) & M32
    return x, y, z, w


def uniform4(pix, smp, stream, seed):
    # Match _to_unit_float: top 24 bits, scaled by 2^-24, computed in f32.
    vals = pcg4d(pix, smp, stream, seed)
    return tuple(float(np.float32(v >> 8) * np.float32(1.0 / (1 << 24))) for v in vals)


STREAM_TIME = 0
STREAM_JITTER = 1
STREAM_DEFOCUS = 2
STREAM_BOUNCE = 3

# --- samplers (closed-form, same maps as ops/sampling.py) -------------------


def unit_vector(u1, u2):
    z = 1.0 - 2.0 * u1
    r = math.sqrt(max(0.0, 1.0 - z * z))
    phi = 2.0 * math.pi * u2
    return np.array([r * math.cos(phi), r * math.sin(phi), z])


def in_unit_disk(u1, u2):
    r = math.sqrt(u1)
    phi = 2.0 * math.pi * u2
    return np.array([r * math.cos(phi), r * math.sin(phi)])


# --- scene ------------------------------------------------------------------
#
# Textures are dicts (matching models/textures.py semantics, arbitrary
# checker nesting like the reference's Arc<Textures>):
#   {"kind": "solid", "color": (r, g, b)}
#   {"kind": "checker", "inv_scale": s, "even": tex, "odd": tex}
#   {"kind": "image", "img": (H, W, 3) float array}
# Materials: dict(type=0 lambertian / 1 metal / 2 dielectric / 3 emissive,
#   albedo=<texture dict or rgb tuple>, fuzz=, ior=, prob=, emission=).
# Motion: linear-shutter deltas (center_d / radius_d / vertex deltas), lerped
# by the per-ray shutter fraction w (models/timeline.py linear model).


def _tex(t):
    if isinstance(t, dict):
        return t
    return {"kind": "solid", "color": tuple(t)}


class OracleSphere:
    def __init__(self, center, radius, mat, center_d=(0, 0, 0), radius_d=0.0):
        self.center = np.asarray(center, float)
        self.radius = float(radius)
        self.center_d = np.asarray(center_d, float)
        self.radius_d = float(radius_d)
        self.mat = mat

    def at(self, w):
        return self.center + w * self.center_d, self.radius + w * self.radius_d


class OracleTriangle:
    def __init__(self, v0, v1, v2, mat, v0_d=(0, 0, 0), v1_d=(0, 0, 0), v2_d=(0, 0, 0)):
        self.v = [np.asarray(p, float) for p in (v0, v1, v2)]
        self.vd = [np.asarray(p, float) for p in (v0_d, v1_d, v2_d)]
        self.mat = mat

    def at(self, w):
        return [a + w * b for a, b in zip(self.v, self.vd)]


def _unit(v):
    return v / np.linalg.norm(v)


def _reflect(v, n):
    return v - 2.0 * np.dot(v, n) * n


def _refract(uv, n, eta):
    cos_theta = min(-np.dot(uv, n), 1.0)
    r_perp = eta * (uv + cos_theta * n)
    r_par = -math.sqrt(abs(1.0 - np.dot(r_perp, r_perp))) * n
    return r_perp + r_par


def image_lookup(img, u, v):
    """Nearest lookup, clamp + v flip (src/textures/image_texture.rs:23-31)."""
    h, w = img.shape[0], img.shape[1]
    uu = min(max(u, 0.0), 1.0)
    vv = 1.0 - min(max(v, 0.0), 1.0)
    i = min(max(int(math.floor(uu * w)), 0), w - 1)
    j = min(max(int(math.floor(vv * h)), 0), h - 1)
    return np.asarray(img[j, i], float)


def texture_value(tex, u, v, p):
    """Texture dict evaluation — recursive checker like the reference's
    Arc<Textures> composition (src/textures/checker_texture.rs:39-52)."""
    tex = _tex(tex)
    if tex["kind"] == "solid":
        return np.asarray(tex["color"], float)
    if tex["kind"] == "image":
        return image_lookup(tex["img"], u, v)
    s = tex["inv_scale"]
    xyz = np.floor(s * p).astype(int)
    child = tex["even"] if (xyz[0] + xyz[1] + xyz[2]) % 2 == 0 else tex["odd"]
    return texture_value(child, u, v, p)


def sphere_uv(n):
    """theta = acos(-y), phi = atan2(-z, x) + pi (src/objects/sphere.rs:41-46)."""
    theta = math.acos(max(-1.0, min(1.0, -n[1])))
    phi = math.atan2(-n[2], n[0]) + math.pi
    return phi / (2 * math.pi), theta / math.pi


def sky(d, sky_img=None):
    ud = _unit(d)
    if sky_img is not None:
        # Equirect: theta = atan2(x, z), phi = asin(y)
        # (src/camera/ray_casting.rs:134-144).
        theta = math.atan2(ud[0], ud[2])
        phi = math.asin(max(-1.0, min(1.0, ud[1])))
        return image_lookup(sky_img, theta / (2 * math.pi) + 0.5, phi / math.pi + 0.5)
    a = 0.5 * (ud[1] + 1.0)
    return (1.0 - a) * np.ones(3) + a * np.array([0.5, 0.7, 1.0])


MT_EPS = 1e-8


def hit_scene(objects, o, d, w, t_min=1e-3):
    """Closest hit over spheres + triangles at shutter fraction w.

    Returns (t, obj, normal_out, u, v) — normal unnormalized for spheres is
    already unit (point-center)/r; triangle uv is (0,0) like the reference
    (src/objects/triangle.rs:133-134)."""
    best = (math.inf, None, None, 0.0, 0.0)
    for s in objects:
        if isinstance(s, OracleSphere):
            c, r = s.at(w)
            oc = c - o
            a = np.dot(d, d)
            h = np.dot(d, oc)
            cq = np.dot(oc, oc) - r * r
            disc = h * h - a * cq
            if disc < 0:
                continue
            sq = math.sqrt(disc)
            for root in ((h - sq) / a, (h + sq) / a):
                if t_min < root < best[0]:
                    p = o + root * d
                    n_out = (p - c) / r
                    uu, vv = sphere_uv(n_out)
                    best = (root, s, n_out, uu, vv)
                    break
        else:
            v0, v1, v2 = s.at(w)
            e1, e2 = v1 - v0, v2 - v0
            pvec = np.cross(d, e2)
            det = np.dot(e1, pvec)
            if abs(det) <= MT_EPS:
                continue
            inv = 1.0 / det
            tvec = o - v0
            uu = np.dot(tvec, pvec) * inv
            qvec = np.cross(tvec, e1)
            vv = np.dot(d, qvec) * inv
            t = np.dot(e2, qvec) * inv
            if uu >= 0.0 and vv >= 0.0 and uu + vv <= 1.0 and t_min < t < best[0]:
                best = (t, s, _unit(np.cross(e1, e2)), 0.0, 0.0)
    return best


def ray_color(objects, o, d, depth, pix, smp, seed, w=0.0, sky_img=None):
    if depth <= 0:
        return np.zeros(3)
    # Walk iteratively, mirroring the bounce-stream RNG layout.
    throughput = np.ones(3)
    radiance = np.zeros(3)
    for bounce in range(depth):
        t, s, n_out, uu, vv = hit_scene(objects, o, d, w)
        if s is None:
            radiance += throughput * sky(d, sky_img)
            break
        mat = s.mat
        if mat["type"] == 3:  # emissive: contribute and terminate
            radiance += throughput * np.asarray(mat["emission"], float)
            break
        p = o + t * d
        front = np.dot(d, n_out) < 0.0
        n = n_out if front else -n_out
        u1, u2, u3, _ = uniform4(pix, smp, STREAM_BOUNCE + bounce, seed)
        rnd = unit_vector(u1, u2)
        if mat["type"] == 0:  # lambertian
            nd = n + rnd
            if np.all(np.abs(nd) < 1e-8):
                nd = n
            albedo = texture_value(mat["albedo"], uu, vv, p)
            atten = albedo / mat.get("prob", 1.0)
            if u3 > mat.get("prob", 1.0):
                break  # absorbed
        elif mat["type"] == 1:  # metal
            nd = _unit(_reflect(d, n)) + mat["fuzz"] * rnd
            if np.dot(nd, n) <= 0.0:
                break
            atten = texture_value(mat["albedo"], uu, vv, p)
        else:  # dielectric
            ud = _unit(d)
            ri = 1.0 / mat["ior"] if front else mat["ior"]
            cos_t = min(-np.dot(ud, n), 1.0)
            sin_t = math.sqrt(max(1e-12, 1.0 - cos_t * cos_t))
            r0 = ((1 - ri) / (1 + ri)) ** 2
            schlick = r0 + (1 - r0) * (1 - cos_t) ** 5
            if ri * sin_t > 1.0 or schlick > u3:
                nd = _reflect(ud, n)
            else:
                nd = _refract(ud, n, ri)
            atten = np.ones(3)
        throughput = throughput * atten
        o, d = p, nd
    return radiance


def render(objects, cam, width, height, spp, depth, seed, sky_img=None, animated=False):
    """cam: dict(look_from, look_at, vup, vfov_deg, defocus_deg, focus_dist,
    optional look_from_d / look_at_d shutter deltas). Returns (H, W, 3)
    float64 mean radiance. ``animated`` samples the per-ray shutter fraction
    w (STREAM_TIME) and lerps camera/scene motion by it — the linear-shutter
    model (models/timeline.py)."""
    lf0 = np.asarray(cam["look_from"], float)
    la0 = np.asarray(cam["look_at"], float)
    lfd = np.asarray(cam.get("look_from_d", (0, 0, 0)), float)
    lad = np.asarray(cam.get("look_at_d", (0, 0, 0)), float)
    vup = np.asarray(cam.get("vup", (0, 1, 0)), float)
    focus = cam.get("focus_dist", 10.0)
    hh = math.tan(math.radians(cam["vfov_deg"]) / 2.0)
    vh = 2.0 * hh * focus
    vw = vh * width / height
    defocus_r = focus * math.tan(math.radians(cam.get("defocus_deg", 0.0)) / 2.0)
    cam_moves = np.any(lfd != 0) or np.any(lad != 0)

    img = np.zeros((height, width, 3))
    for j in range(height):
        for i in range(width):
            pix = j * width + i
            acc = np.zeros(3)
            for smp in range(spp):
                w_frac = (
                    uniform4(pix, smp, STREAM_TIME, seed)[0] if animated else 0.0
                )
                lf = lf0 + w_frac * lfd if cam_moves else lf0
                la = la0 + w_frac * lad if cam_moves else la0
                w = _unit(lf - la)
                u = _unit(np.cross(vup, w))
                v = np.cross(w, u)
                vpu, vpv = vw * u, vh * (-v)
                du, dv = vpu / width, vpv / height
                p00 = lf - focus * w - vpu / 2 - vpv / 2 + 0.5 * (du + dv)
                # One camera hash: jitter on lanes 0-1, defocus on 2-3.
                jx, jy, dx1, dx2 = uniform4(pix, smp, STREAM_JITTER, seed)
                pos = p00 + (i + jx - 0.5) * du + (j + jy - 0.5) * dv
                if defocus_r > 0.0:
                    disk = in_unit_disk(dx1, dx2)
                    o = lf + disk[0] * defocus_r * u + disk[1] * defocus_r * v
                else:
                    o = lf
                acc += ray_color(
                    objects, o, pos - o, depth, pix, smp, seed,
                    w=w_frac, sky_img=sky_img,
                )
            img[j, i] = acc / spp
    return img
