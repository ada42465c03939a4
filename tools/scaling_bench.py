"""Scaling-efficiency harness: sharded render throughput vs device count.

North star (BASELINE.md): >85% scaling efficiency from 1 host to N hosts.
On real pods this runs unchanged after ``initialize_distributed``; in this
environment it demonstrates the methodology on the virtual CPU mesh
(set XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS via
jax.config cpu) or on however many real chips are attached.

Usage: python tools/scaling_bench.py [--cpu] [--width W] [--spp S]
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--width", type=int, default=192)
    ap.add_argument("--spp", type=int, default=8)
    ap.add_argument("--depth", type=int, default=8)
    args = ap.parse_args()

    import os

    if args.cpu:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
        )
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    from crucible_tpu.models import demo
    from crucible_tpu.parallel import mesh as mesh_mod
    from crucible_tpu.parallel.render import render_image_sharded

    n_dev = jax.device_count()
    if jax.default_backend() == "cpu":
        print(
            json.dumps(
                {
                    "note": "virtual CPU devices share physical cores - "
                    "efficiency numbers validate mechanics only, not scaling"
                }
            ),
            flush=True,
        )
    sc = demo.book1_end_scene(width=args.width)
    sc.scene_cam.set_samples(args.spp)
    sc.scene_cam.set_max_depth(args.depth)
    rays = sc.scene_cam.image_width * sc.scene_cam.image_height * args.spp

    results = []
    base_rps = None
    n = 1
    while n <= n_dev:
        mesh = mesh_mod.make_mesh(n)
        render_image_sharded(sc, mesh=mesh)  # compile
        t0 = time.time()
        render_image_sharded(sc, mesh=mesh)
        dt = time.time() - t0
        rps = rays / dt
        if base_rps is None:
            base_rps = rps
        eff = rps / (base_rps * n)
        results.append(
            dict(devices=n, seconds=round(dt, 3), rays_per_sec=round(rps, 1),
                 scaling_efficiency=round(eff, 3))
        )
        print(json.dumps(results[-1]), flush=True)
        n *= 2
    print(json.dumps({"summary": results}))


if __name__ == "__main__":
    main()
