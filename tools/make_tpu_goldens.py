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

# (builder name, width) — garden's demo defaults to 1920w; pin it small.
WORLDS = (
    ("smoke_scene", 64),
    ("book1_end_scene", 64),
    ("checkered_spheres", 64),
    ("earth", 64),
    ("load_teapot", 64),
    ("garden_skybox", 64),
    # r4 additions: multi-tile sphere table (cull path) + deep nested
    # checkers (record-schedule shading).
    ("sphere_stress", 64),
    ("nested_checkers", 64),
)


def main():
    from crucible_tpu.models import demo, render

    out = {}
    for name, width in WORLDS:
        sc = getattr(demo, name)(width=width)
        img = render.render_image(
            sc, samples=SPP, max_depth=DEPTH, seed=0, mode="tiled"
        )
        arr = np.asarray(img, np.float32)
        out[name] = arr
        print(f"{name}: {arr.shape} mean={arr.mean():.4f} max={arr.max():.4f}")
    np.savez_compressed(OUT, **out)
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
