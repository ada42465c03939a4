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


class OracleSphere:
    def __init__(self, center, radius, mat):
        self.center = np.asarray(center, float)
        self.radius = float(radius)
        self.mat = mat  # dict(type=..., albedo=..., fuzz=..., ior=..., prob=...)


def _unit(v):
    return v / np.linalg.norm(v)


def _reflect(v, n):
    return v - 2.0 * np.dot(v, n) * n


def _refract(uv, n, eta):
    cos_theta = min(-np.dot(uv, n), 1.0)
    r_perp = eta * (uv + cos_theta * n)
    r_par = -math.sqrt(abs(1.0 - np.dot(r_perp, r_perp))) * n
    return r_perp + r_par


def sky(d):
    ud = _unit(d)
    a = 0.5 * (ud[1] + 1.0)
    return (1.0 - a) * np.ones(3) + a * np.array([0.5, 0.7, 1.0])


def hit_scene(spheres, o, d, t_min=1e-3):
    best_t, best = math.inf, None
    for s in spheres:
        oc = s.center - o
        a = np.dot(d, d)
        h = np.dot(d, oc)
        c = np.dot(oc, oc) - s.radius**2
        disc = h * h - a * c
        if disc < 0:
            continue
        sq = math.sqrt(disc)
        for root in ((h - sq) / a, (h + sq) / a):
            if t_min < root < best_t:
                best_t, best = root, s
                break
    return best_t, best


def ray_color(spheres, o, d, depth, pix, smp, seed):
    if depth <= 0:
        return np.zeros(3)
    # Walk iteratively, mirroring the bounce-stream RNG layout.
    throughput = np.ones(3)
    radiance = np.zeros(3)
    for bounce in range(depth):
        t, s = hit_scene(spheres, o, d)
        if s is None:
            radiance += throughput * sky(d)
            break
        p = o + t * d
        n_out = (p - s.center) / s.radius
        front = np.dot(d, n_out) < 0.0
        n = n_out if front else -n_out
        u1, u2, u3, _ = uniform4(pix, smp, STREAM_BOUNCE + bounce, seed)
        rnd = unit_vector(u1, u2)
        mat = s.mat
        if mat["type"] == 0:  # lambertian
            nd = n + rnd
            if np.all(np.abs(nd) < 1e-8):
                nd = n
            atten = np.asarray(mat["albedo"]) / mat.get("prob", 1.0)
            if u3 > mat.get("prob", 1.0):
                break  # absorbed
        elif mat["type"] == 1:  # metal
            nd = _unit(_reflect(d, n)) + mat["fuzz"] * rnd
            if np.dot(nd, n) <= 0.0:
                break
            atten = np.asarray(mat["albedo"])
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


def render(spheres, cam, width, height, spp, depth, seed):
    """cam: dict(look_from, look_at, vup, vfov_deg, defocus_deg, focus_dist).
    Returns (H, W, 3) float64 mean radiance."""
    lf = np.asarray(cam["look_from"], float)
    la = np.asarray(cam["look_at"], float)
    vup = np.asarray(cam.get("vup", (0, 1, 0)), float)
    w = _unit(lf - la)
    u = _unit(np.cross(vup, w))
    v = np.cross(w, u)
    focus = cam.get("focus_dist", 10.0)
    hh = math.tan(math.radians(cam["vfov_deg"]) / 2.0)
    vh = 2.0 * hh * focus
    vw = vh * width / height
    vpu, vpv = vw * u, vh * (-v)
    du, dv = vpu / width, vpv / height
    p00 = lf - focus * w - vpu / 2 - vpv / 2 + 0.5 * (du + dv)
    defocus_r = focus * math.tan(math.radians(cam.get("defocus_deg", 0.0)) / 2.0)

    img = np.zeros((height, width, 3))
    for j in range(height):
        for i in range(width):
            pix = j * width + i
            acc = np.zeros(3)
            for smp in range(spp):
                # One camera hash: jitter on lanes 0-1, defocus on 2-3.
                jx, jy, dx1, dx2 = uniform4(pix, smp, STREAM_JITTER, seed)
                pos = p00 + (i + jx - 0.5) * du + (j + jy - 0.5) * dv
                if defocus_r > 0.0:
                    disk = in_unit_disk(dx1, dx2)
                    o = lf + disk[0] * defocus_r * u + disk[1] * defocus_r * v
                else:
                    o = lf
                acc += ray_color(spheres, o, pos - o, depth, pix, smp, seed)
            img[j, i] = acc / spp
    return img
