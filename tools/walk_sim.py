"""Host-side simulator of the megakernel's windowed BVH walk.

Replays the EXACT cursor algorithm (ops/pallas/megakernel.py trav_body)
over real teapot rays, counting per-tile-bounce iterations, leaf visits
and window utilization — so window-size / leaf-size / multi-leaf design
changes can be compared algorithmically before paying a TPU compile.

Usage: python tools/walk_sim.py [width] [max_bounces]
"""

from __future__ import annotations

import sys

import numpy as np


def simulate_tile(o, d, t0, nodes, node_win, max_leaves=1):
    """One tile's traversal: o/d (T,3) f64, t0 (T,) starting best-t.

    ``max_leaves``: leaves taken per window iteration before the cursor
    parks (the kernel's chase takes 1; multi-leaf variants take more —
    the walk is LEAF-SERIALIZED, iters ~ leaves+1, so this is the lever).

    Returns (iterations, leaf_visits, interior_rows_tested)."""
    lo, hi, first, count, miss = nodes
    n = lo.shape[0]
    inv = 1.0 / np.where(np.abs(d) < 1e-30, np.where(d >= 0, 1e-30, -1e-30), d)
    tb = t0.copy()
    iters = 0
    leaves = 0
    rows_tested = 0
    c = 0
    while c < n:
        iters += 1
        w_end = min(c + node_win, n)
        # (W, T) slab tests against current tb
        any_hit = np.zeros(w_end - c, bool)
        for i in range(w_end - c):
            t0x = (lo[c + i] - o) * inv  # (T, 3)
            t1x = (hi[c + i] - o) * inv
            enter = np.maximum(np.minimum(t0x, t1x).max(axis=1), 1e-3)
            exitv = np.minimum(np.maximum(t0x, t1x).min(axis=1), tb)
            any_hit[i] = bool(np.any(enter <= exitv))
        rows_tested += w_end - c
        # scalar cursor chase: the (max_leaves+1)-th hit leaf parks the
        # cursor for the next iteration
        cur = c
        taken = []
        stop = False
        for i in range(w_end - c):
            at = (cur == c + i) and not stop
            if not at:
                continue
            if any_hit[i] and count[c + i] > 0:
                if len(taken) < max_leaves:
                    taken.append(c + i)
                    cur = c + i + 1
                else:
                    stop = True
                    continue
            elif any_hit[i]:
                cur = c + i + 1
            else:
                cur = miss[c + i]
        for lf in taken:
            leaves += 1
            # leaf test shrinks tb: approximate with exact tri hits
            f, cnt = first[lf], count[lf]
            for j in range(f, f + cnt):
                th = tri_hit(o, d, j)
                tb = np.where((th > 1e-3) & (th < tb), th, tb)
        c = cur
    return iters, leaves, rows_tested


def tri_hit(o, d, j):
    v0, e1, e2 = TRI[j]
    pvec = np.cross(d, e2)
    det = (e1 * pvec).sum(axis=1)
    ok = np.abs(det) > 1e-8
    invd = np.where(ok, 1.0 / np.where(det == 0, 1.0, det), 0.0)
    tvec = o - v0
    u = (tvec * pvec).sum(axis=1) * invd
    qvec = np.cross(tvec, e1)
    v = (d * qvec).sum(axis=1) * invd
    t = (e2 * qvec).sum(axis=1) * invd
    good = ok & (u >= 0) & (v >= 0) & (u + v <= 1)
    return np.where(good, t, np.inf)


TRI = None


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    from crucible_tpu.models import demo
    from crucible_tpu.models.camera import generate_rays
    import jax.numpy as jnp

    width = int(sys.argv[1]) if len(sys.argv) > 1 else 192
    sc = demo.load_teapot(width=width)
    cp = sc.scene_cam.params()
    w, h = sc.scene_cam.image_width, sc.scene_cam.image_height
    p = w * h
    pix = jnp.arange(p, dtype=jnp.uint32)
    smp = jnp.zeros((p,), jnp.uint32)
    o, d, _ = generate_rays(cp, w, h, pix, smp, jnp.uint32(0))
    o = np.asarray(o, np.float64)
    d = np.asarray(d, np.float64)

    global TRI
    for method in ("median", "sah"):
      for leaf in (32, 64, 128, 256):
        sd = sc.build(leaf_size=leaf, bvh_method=method)
        v0 = np.asarray(sd.tri_v0, np.float64)
        v1 = np.asarray(sd.tri_v1, np.float64)
        v2 = np.asarray(sd.tri_v2, np.float64)
        TRI = [(v0[j], v1[j] - v0[j], v2[j] - v0[j]) for j in range(v0.shape[0])]
        nodes = (
            np.asarray(sd.bvh_min, np.float64),
            np.asarray(sd.bvh_max, np.float64),
            np.asarray(sd.bvh_first),
            np.asarray(sd.bvh_count),
            np.asarray(sd.bvh_miss),
        )
        # Starting best-t = closest SPHERE hit from the built scene (the
        # kernel's sphere stage runs FIRST, so traversal begins with its t —
        # big culling effect for below-horizon rays the BIG start misses).
        # Derived from sd rather than hardcoding the demo's ground sphere so
        # the simulator tracks demo.load_teapot's actual geometry (ADVICE r2).
        tground = np.full((o.shape[0],), np.inf)
        centers = np.asarray(sd.sph_center, np.float64)
        radii = np.asarray(sd.sph_radius, np.float64)
        active = np.asarray(sd.sph_active, bool) if hasattr(sd, "sph_active") else np.ones(len(radii), bool)
        a_q = (d * d).sum(axis=1)
        for gc, gr, act in zip(centers, radii, active):
            if not act or gr <= 0:
                continue
            oc = o - gc
            b_half = (d * oc).sum(axis=1)
            c_q = (oc * oc).sum(axis=1) - gr * gr
            disc = b_half * b_half - a_q * c_q
            sq = np.sqrt(np.maximum(disc, 0.0))
            r0 = (-b_half - sq) / a_q
            r1 = (-b_half + sq) / a_q
            tg = np.where(r0 > 1e-3, r0, np.where(r1 > 1e-3, r1, np.inf))
            tground = np.minimum(tground, np.where(disc >= 0, tg, np.inf))
        tground = np.minimum(tground, 3.0e38)

        for win, ml in ((8, 1), (16, 1), (8, 2), (16, 2), (16, 3), (16, 4)):
            tot_it = tot_lf = tot_rows = 0
            ntiles = 0
            for s in range(0, p, 512):
                if (s // 512) % 7:  # sample tiles for speed
                    continue
                sl = slice(s, min(s + 512, p))
                t0 = tground[sl].copy()
                it, lf, rows = simulate_tile(o[sl], d[sl], t0, nodes, win, ml)
                tot_it += it
                tot_lf += lf
                tot_rows += rows
                ntiles += 1
            print(
                f"{method:6s} leaf={leaf:3d} win={win:2d} ml={ml} nodes={nodes[0].shape[0]:4d} "
                f"iters/tile={tot_it/ntiles:6.1f} leaves/tile={tot_lf/ntiles:6.1f} "
                f"node_rows/tile={tot_rows/ntiles:7.1f}"
            )


if __name__ == "__main__":
    main()
