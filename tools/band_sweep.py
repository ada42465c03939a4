"""Single-chip band-count sweep: sharding overhead of the multi-chip
megakernel path measured ON ONE DEVICE (VERDICT r1 #7).

render_image_sharded_mega shards the image into horizontal bands, one per
device. Rendering the same image as 1 band vs N sequential bands on a
single chip isolates the per-band overhead (dispatch + tile-grid rounding +
band-edge tile padding) from any actual communication — an upper bound on
the sharding tax, since real multi-chip runs overlap bands across chips and
add only the framebuffer all-gather.

Usage: python tools/band_sweep.py  (ONE TPU job; run nothing else)
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from crucible_tpu.models import demo, integrator

WIDTH, SPP, DEPTH, SEED = 1920, 32, 50, 1


def main() -> None:
    print("devices:", jax.devices(), flush=True)
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent))
    from tpu_bench import log

    sc = demo.book1_end_scene(width=WIDTH)
    sd = sc.build()
    cp = sc.scene_cam.params()
    w, h = sc.scene_cam.image_width, sc.scene_cam.image_height
    rays = w * h * SPP

    run = jax.jit(
        lambda row0, band_h, spp, seed: integrator.trace_persistent_mega(
            sd, cp, w, h, spp, DEPTH, seed, row0=row0, band_height=band_h
        ),
        static_argnames=("band_h",),
    )

    base = None
    imgs = {}
    for bands in (1, 2, 4, 8):
        band_h = (h + bands - 1) // bands
        # warmup compile (one executable per band height)
        for k in range(bands):
            run(jnp.int32(k * band_h), band_h, jnp.uint32(2), jnp.uint32(0))
        t0 = time.time()
        outs = [
            run(jnp.int32(k * band_h), band_h, jnp.uint32(SPP), jnp.uint32(SEED))
            for k in range(bands)
        ]
        jax.block_until_ready(outs)
        dt = time.time() - t0
        full = np.concatenate([np.asarray(o) for o in outs], axis=0)[: w * h]
        imgs[bands] = full
        if base is None:
            base = dt
        log(
            bench=f"band_sweep_{WIDTH}w_{SPP}spp",
            bands=bands,
            seconds=round(dt, 2),
            mrays_per_s=round(rays / dt / 1e6, 2),
            overhead_vs_1band=round(dt / base - 1.0, 4),
        )
    # Band sharding must be bit-identical to the single-band render.
    for bands, img in imgs.items():
        assert np.array_equal(img, imgs[1]), f"bands={bands} not bit-identical"
    log(bench="band_sweep_bit_identical", ok=True)


if __name__ == "__main__":
    main()
