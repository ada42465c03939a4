"""Persistent-wavefront cost breakdown on the real chip — run alone.

Decomposes one persistent-loop iteration into its stages and measures each
with fixed-trip-count fori loops at the production lane count, then runs the
full renderer with an iteration counter so total time can be attributed:

    total ~= iters * (raygen + bounce + bookkeeping)

Appends JSON lines to tools/tpu_results.jsonl.

Usage: python tools/profile_persistent.py [width] [spp]
"""

from __future__ import annotations

import functools
import json
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

RESULTS = Path(__file__).parent / "tpu_results.jsonl"


def log(**kw):
    kw["ts"] = time.strftime("%H:%M:%S")
    print(json.dumps(kw), flush=True)
    with open(RESULTS, "a") as f:
        f.write(json.dumps(kw) + "\n")


def time_loop(name, body, state0, n=20, **extra):
    """Median-free two-point timing: (n iters) - (2 iters) isolates the loop
    body from dispatch/compile."""

    @jax.jit
    def run(k, s):
        return jax.lax.fori_loop(0, k, lambda i, s_: body(s_), s)

    s = run(2, state0)
    jax.block_until_ready(s)
    t0 = time.time()
    jax.block_until_ready(run(2, state0))
    base = time.time() - t0
    t0 = time.time()
    jax.block_until_ready(run(n + 2, state0))
    dt = time.time() - t0 - base
    log(stage=name, ms_per_iter=round(1000 * dt / n, 3), **extra)
    return dt / n


def main():
    width = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    spp = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    from crucible_tpu.models import demo, integrator, render
    from crucible_tpu.models.camera import generate_rays

    sc = demo.book1_end_scene(width=width)
    sd = sc.build()
    cp = sc.scene_cam.params()
    w, h = sc.scene_cam.image_width, sc.scene_cam.image_height
    print("devices:", jax.devices(), flush=True)

    lanes = 1 << 20
    num_pixels = w * h
    p_pad = ((num_pixels + 511) // 512) * 512
    groups = max(1, (lanes + p_pad - 1) // p_pad)
    r = groups * p_pad
    log(config=f"book1_{width}w", lanes=r, groups=groups, pixels=num_pixels)

    lane = jnp.arange(r, dtype=jnp.uint32)
    pix = jnp.minimum(lane % p_pad, num_pixels - 1)
    seed = jnp.uint32(0)

    table = integrator.make_sphere_table(sd)

    # Representative in-flight rays: one raygen batch.
    o0, d0, _ = generate_rays(cp, w, h, pix, lane % 7, seed)

    # --- stage: raygen ----------------------------------------------------
    def raygen_body(s):
        o, d, k = s
        no, nd, _ = generate_rays(cp, w, h, pix, k, seed)
        return no, nd, k + 1

    time_loop("raygen", raygen_body, (o0, d0, jnp.zeros_like(lane)))

    # --- stage: fused pallas kernel only ----------------------------------
    from crucible_tpu.ops.pallas.sphere_shade import hit_spheres_fetch

    w0 = jnp.zeros((r,), jnp.float32)

    def kernel_body(s):
        o, acc = s
        out = hit_spheres_fetch(o, d0, w0, table, t_min=1e-3)
        return o + 1e-9, acc + out[0]

    time_loop("fused_kernel", kernel_body, (o0, jnp.zeros((r,), jnp.float32)),
              n_spheres=int(table.shape[0]))

    # --- stage: full fused bounce (kernel + shade + scatter + rng) --------
    def bounce_body(s):
        o, d, k = s
        st = integrator.bounce_step_fused(sd, table, o, d, pix, lane % 7, k, seed)
        return st["new_o"], st["new_d"], k + 1

    time_loop("bounce_fused", bounce_body, (o0, d0, jnp.zeros((r,), jnp.int32)))

    # --- full renders with iteration counts --------------------------------
    for schedule, fn in (
        ("pixel", integrator.trace_persistent),
        ("queue", integrator.trace_persistent_queue),
    ):
        f = jax.jit(
            functools.partial(
                fn, width=w, height=h, max_depth=50, lanes=lanes,
                use_pallas=True, return_stats=True,
            )
        )
        fb, iters = f(sd, cp, spp=jnp.uint32(2), seed=seed)
        jax.block_until_ready(fb)
        t0 = time.time()
        fb, iters = f(sd, cp, spp=jnp.uint32(spp), seed=seed)
        jax.block_until_ready(fb)
        dt = time.time() - t0
        it = int(iters)
        log(
            stage=f"full_{schedule}",
            seconds=round(dt, 2),
            iters=it,
            ms_per_iter=round(1000 * dt / max(it, 1), 3),
            mrays_per_s=round(num_pixels * spp / dt / 1e6, 2),
            spp=spp,
        )


if __name__ == "__main__":
    main()
