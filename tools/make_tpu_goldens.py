"""Generate the REAL-CHIP golden references (tests/goldens/golden_tpu_v1.npz).

CPU tiled renders (the semantic reference path) of all six demo worlds at
64px / 8 spp / depth 8, seed 0 — larger than the CI goldens (32px, 2-8 spp)
so real-chip drift has more surface to show up in, and covering the two
worlds CI goldens omit (teapot BVH meshes, garden equirect HDR sky).

`tools/tpu_bench.py golden` renders the same configs on the TPU through
each world's PRODUCTION schedule and asserts the bounds (VERDICT r3 #3:
interpret-mode CPU goldens could not catch a Mosaic lowering change that
alters numerics).

Regenerate ONLY on an intentional semantic change:
    python tools/make_tpu_goldens.py
"""

from __future__ import annotations

import jax

jax.config.update("jax_platforms", "cpu")

from pathlib import Path

import numpy as np

SPP = 8
DEPTH = 8
OUT = Path(__file__).resolve().parent.parent / "tests" / "goldens" / "golden_tpu_v1.npz"

# (builder name, width, spp) — garden's demo defaults to 1920w; pin it
# small. Teapot runs 32 spp (r5): at 8 spp its flip tail sat at 1.98% of
# the 2% bound — one Mosaic change from flaky-red; 4x the samples averages
# the ulp-flipped silhouette samples down and restores margin (VERDICT
# r4 #6).
WORLDS = (
    ("smoke_scene", 64, SPP),
    ("book1_end_scene", 64, SPP),
    ("checkered_spheres", 64, SPP),
    ("earth", 64, SPP),
    ("load_teapot", 64, 32),
    ("garden_skybox", 64, SPP),
    # r4 additions: multi-tile sphere table (cull path) + deep nested
    # checkers (record-schedule shading).
    ("sphere_stress", 64, SPP),
    ("nested_checkers", 64, SPP),
)

# Per-config spp map consumed by tools/tpu_bench.py golden.
WORLD_SPP = {name: spp for name, _, spp in WORLDS}

# r5 addition: a DEPTH-50 config through the deep-GRADIENT forward path
# (two-level record + depth-bucketed replay — on the chip the buckets run
# the in-Pallas replay kernel). The headline deep numbers were never
# image-checked on the chip before (VERDICT r4 #6).
DEEP_WORLD = ("book1_end_scene", 64, SPP, 50)
DEEP_KEY = "book1_deep50"


def deep_replay_image(width=64, spp=SPP, depth=50, seed=0):
    """Per-pixel mean radiance through the DEEP gradient path's forward:
    render_rays_replay with lane-narrowing forced on (two-level record +
    depth-bucketed replay). This is the exact estimator the grad500
    headline differentiates."""
    import jax.numpy as jnp

    from crucible_tpu.models import demo
    from crucible_tpu.models import replay as replay_mod

    sc = getattr(demo, DEEP_WORLD[0])(width=width)
    sd = sc.build()
    cp = sc.scene_cam.params()
    h = sc.scene_cam.image_height
    p = width * h
    pix = jnp.tile(jnp.arange(p, dtype=jnp.uint32), spp)
    smp = jnp.repeat(jnp.arange(spp, dtype=jnp.uint32), p)
    rad = replay_mod.render_rays_replay(
        sd, cp, width, h, pix, smp, jnp.uint32(seed), depth, split=True
    )
    return np.asarray(
        rad.reshape(spp, p, 3).mean(axis=0).reshape(h, width, 3), np.float32
    )


def main():
    from crucible_tpu.models import demo, render

    out = {}
    for name, width, spp in WORLDS:
        sc = getattr(demo, name)(width=width)
        img = render.render_image(
            sc, samples=spp, max_depth=DEPTH, seed=0, mode="tiled"
        )
        arr = np.asarray(img, np.float32)
        out[name] = arr
        print(f"{name}: {arr.shape} mean={arr.mean():.4f} max={arr.max():.4f}")
    arr = deep_replay_image(DEEP_WORLD[1], DEEP_WORLD[2], DEEP_WORLD[3])
    out[DEEP_KEY] = arr
    print(f"{DEEP_KEY}: {arr.shape} mean={arr.mean():.4f} max={arr.max():.4f}")
    np.savez_compressed(OUT, **out)
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
