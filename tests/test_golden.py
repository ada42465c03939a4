"""Golden-image regression: tiny fixed-seed renders of the demo worlds,
compared bit-for-bit against committed references (the image-level suite
the reference lacks, SURVEY.md §4). Regenerate goldens ONLY for an
intentional semantic change:

    python -c "..."  # see tests/goldens/README
"""

from pathlib import Path

import numpy as np
import pytest

from crucible_tpu.models import demo, render

GOLDEN = Path(__file__).parent / "goldens" / "golden_v1.npz"

CONFIGS = {
    "smoke": (demo.smoke_scene, dict(width=32), 4, 6),
    "book1": (demo.book1_end_scene, dict(width=32), 2, 6),
    "checker": (demo.checkered_spheres, dict(width=32), 2, 4),
    "earth": (demo.earth, dict(width=32), 2, 4),
}


@pytest.mark.parametrize("name", sorted(CONFIGS))
def test_golden(name):
    fn, kw, spp, depth = CONFIGS[name]
    sc = fn(**kw)
    img = render.render_image(sc, samples=spp, max_depth=depth, seed=0, mode="tiled")
    want = np.load(GOLDEN)[name]
    # Same platform + deterministic RNG: tolerance only for cross-platform
    # f32 contraction-order differences.
    np.testing.assert_allclose(np.asarray(img), want, atol=2e-5)


@pytest.mark.parametrize("name", ["smoke", "book1"])
def test_golden_megakernel(name):
    """The megakernel path against the same goldens: same samples, same
    decisions — only f32 association differs, so the tolerance covers ulp
    noise but catches any RNG-stream or shading-semantics drift."""
    import jax.numpy as jnp

    from crucible_tpu.models import integrator

    fn, kw, spp, depth = CONFIGS[name]
    sc = fn(**kw)
    sd = sc.build()
    cp = sc.scene_cam.params()
    w, h = sc.scene_cam.image_width, sc.scene_cam.image_height
    assert integrator.megakernel_supported(sd, cp)
    acc = integrator.trace_persistent_mega(
        sd, cp, w, h, jnp.uint32(spp), depth, jnp.uint32(0), interpret=True
    )
    img = np.asarray(acc).reshape(h, w, 3) / np.float32(spp)
    want = np.load(GOLDEN)[name]
    d = np.abs(img - want)
    # Allow rare silhouette hit-flips — at 32px/2spp a handful of flipped
    # samples is a visible fraction, so the bound is per-config loose but
    # still catches any systematic RNG/shading drift.
    assert (d > 1e-3).mean() < 0.03, d.max()
    assert d.mean() < 3e-3


def test_golden_megakernel_high_spp():
    """Higher-spp run (VERDICT r1 weak #9). More samples mean MORE pixels
    contain at least one ulp-flipped silhouette sample, but each flip's
    weight shrinks to 1/spp — so the sensitive regression bounds are the
    per-value MAX (no pixel may deviate by more than ~one flipped sample)
    and the image MEAN (~10x tighter than the 2-spp test): any systematic
    RNG/shading drift moves every value, not a thin flip tail."""
    import jax.numpy as jnp

    from crucible_tpu.models import integrator

    sc = demo.book1_end_scene(width=32)
    sd = sc.build()
    cp = sc.scene_cam.params()
    w, h = sc.scene_cam.image_width, sc.scene_cam.image_height
    spp, depth = 8, 6
    acc = integrator.trace_persistent_mega(
        sd, cp, w, h, jnp.uint32(spp), depth, jnp.uint32(0), interpret=True
    )
    img = np.asarray(acc).reshape(h, w, 3) / np.float32(spp)
    ref = render.render_image(sc, samples=spp, max_depth=depth, seed=0, mode="tiled")
    d = np.abs(img - np.asarray(ref))
    assert d.max() < 2.0 / spp, d.max()  # at most ~one flipped sample/pixel
    assert (d > 0.05).mean() < 0.02, (d > 0.05).mean()
    assert d.mean() < 2e-3, d.mean()


GOLDEN_TPU = Path(__file__).parent / "goldens" / "golden_tpu_v1.npz"


def test_tpu_golden_file_honest():
    """The real-chip golden references (tools/make_tpu_goldens.py; asserted
    on the chip by `tools/tpu_bench.py golden`) must stay in sync with the
    CPU tiled reference renderer: all eight worlds plus the depth-50
    deep-gradient-path config present at 64px, and the cheapest world
    re-rendered here bit-for-bit."""
    z = np.load(GOLDEN_TPU)
    assert sorted(z.files) == sorted(
        ["smoke_scene", "book1_end_scene", "checkered_spheres", "earth",
         "load_teapot", "garden_skybox", "sphere_stress", "nested_checkers",
         "book1_deep50"]
    )
    for name in z.files:
        assert z[name].shape[1] == 64 and z[name].shape[2] == 3, name
    sc = demo.smoke_scene(width=64)
    img = render.render_image(sc, samples=8, max_depth=8, seed=0, mode="tiled")
    np.testing.assert_allclose(
        np.asarray(img), z["smoke_scene"], atol=2e-5
    )


def test_tpu_deep_golden_matches_deep_replay_path():
    """The stored depth-50 golden reproduces through the deep gradient
    path's forward (two-level record + bucketed replay) on CPU — the same
    estimator `tools/tpu_bench.py golden` runs on the chip (where the
    buckets go through the in-Pallas replay kernel)."""
    import sys

    sys.path.insert(0, str(Path(__file__).parent.parent / "tools"))
    import make_tpu_goldens as mg

    img = mg.deep_replay_image(64, 8, 50)
    want = np.load(GOLDEN_TPU)["book1_deep50"]
    np.testing.assert_allclose(img, want, atol=2e-5)


def test_golden_earth_record_schedule():
    """Earth (image texture) against the stored golden THROUGH the record
    schedule — the megakernel-geometry production path for textured scenes
    (VERDICT r1 #2 'goldens extended to earth through the megakernel')."""
    sc = demo.earth(width=32)
    sd = sc.build()
    cp = sc.scene_cam.params()
    w, h = sc.scene_cam.image_width, sc.scene_cam.image_height
    img = render.render_image_persistent(sd, cp, w, h, 2, 4, 0, schedule="record")
    want = np.load(GOLDEN)["earth"]
    d = np.abs(np.asarray(img) - want)
    assert (d > 1e-3).mean() < 0.03, d.max()
    assert d.mean() < 3e-3
