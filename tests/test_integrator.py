"""Integrator/materials/textures behavior tests: semantics anchored to the
reference's ray_color (src/camera/ray_casting.rs:112-152) and materials,
plus renderer-mode equivalence and animated-scene checks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from crucible_tpu.models import demo, integrator, render
from crucible_tpu.models.scene import (
    Dielectric,
    Emissive,
    Lambertian,
    Metal,
    Scene,
    Sphere,
    Triangle,
)
from crucible_tpu.models.timeline import LERP, LOCAL, NERP


def _simple_scene(material, width=64):
    sc = Scene.new_image(1.0, width)
    cam = sc.scene_cam
    cam.set_samples(4)
    cam.set_max_depth(4)
    cam.look_from((0.0, 0.0, 2.0))
    cam.look_at((0.0, 0.0, 0.0))
    cam.set_vfov(40.0)
    sc.add_element(Sphere((0.0, 0.0, 0.0), 0.5, material), "obj")
    return sc


class TestIntegratorSemantics:
    def test_depth_zero_is_black(self):
        sc = _simple_scene(Lambertian.from_color((0.9, 0.9, 0.9)))
        img = render.render_image(sc, samples=2, max_depth=0)
        assert np.all(img == 0.0)  # ray_color depth==0 -> black

    def test_miss_gives_sky_gradient(self):
        sc = Scene.new_image(1.0, 16)
        sc.scene_cam.look_from((0, 0, 2))
        sc.scene_cam.look_at((0, 0, 0))
        sc.add_element(Sphere((0, -1000, 0), 1.0, Lambertian.from_color((0.5,) * 3)), "x")
        sc.elements[0].hide = True
        img = render.render_image(sc, samples=1, max_depth=3)
        # Everything misses: colors between white and (0.5, 0.7, 1.0).
        assert img[..., 2].min() >= 0.69  # blue channel high everywhere
        assert np.all(img[..., 2] >= img[..., 0])  # blue >= red

    def test_deeper_depth_brighter_for_diffuse(self):
        # With depth 1 every hit is terminated black; more bounces recover
        # energy (throughput product form of the recursion).
        sc = _simple_scene(Lambertian.from_color((0.8, 0.8, 0.8)))
        d1 = render.render_image(sc, samples=8, max_depth=1).mean()
        d4 = render.render_image(sc, samples=8, max_depth=4).mean()
        assert d4 > d1

    def test_metal_mirror_center_reflects_sky(self):
        # A fuzz-0 metal sphere head-on reflects the ray back toward the
        # camera -> sky behind the viewer (gradient), never black.
        sc = _simple_scene(Metal((1.0, 1.0, 1.0), 0.0))
        img = render.render_image(sc, samples=4, max_depth=4)
        h, w = img.shape[:2]
        center = img[h // 2, w // 2]
        assert center.min() > 0.2

    def test_emissive_terminates_and_emits(self):
        sc = _simple_scene(Emissive((3.0, 0.0, 0.0)))
        img = render.render_image(sc, samples=4, max_depth=4)
        h, w = img.shape[:2]
        center = img[h // 2, w // 2]
        assert center[0] == pytest.approx(3.0, rel=1e-5)
        assert center[1] == pytest.approx(0.0, abs=1e-6)

    def test_dielectric_transmits_background(self):
        # Glass sphere in front of sky: light passes through, image stays
        # bright (attenuation is white, dielectric.rs:31).
        sc = _simple_scene(Dielectric(1.5))
        img = render.render_image(sc, samples=8, max_depth=8)
        assert img.mean() > 0.5

    def test_lambertian_russian_roulette_prob(self):
        # prob=0.5: half the paths absorb but attenuation compensates by
        # 1/p (lambertian.rs:49-60) -> same expected radiance, more noise.
        full = _simple_scene(Lambertian.from_color((0.7, 0.7, 0.7)))
        rr = _simple_scene(Lambertian.from_color((0.7, 0.7, 0.7), prob=0.5))
        a = render.render_image(full, samples=64, max_depth=4).mean()
        b = render.render_image(rr, samples=64, max_depth=4).mean()
        assert abs(a - b) / a < 0.05

    def test_triangle_scene_renders(self):
        sc = Scene.new_image(1.0, 32)
        sc.scene_cam.look_from((0, 0, 2))
        sc.scene_cam.look_at((0, 0, 0))
        sc.scene_cam.set_vfov(60.0)
        sc.add_element(
            Triangle((-1, -1, 0), (1, -1, 0), (0, 1, 0), Lambertian.from_color((0.9, 0.1, 0.1))),
            "tri",
        )
        img = render.render_image(sc, samples=4, max_depth=3)
        h, w = img.shape[:2]
        # Center hits the triangle (reddish), corners miss (sky blue-ish).
        assert img[h // 2, w // 2, 0] > img[h // 2, w // 2, 2]
        assert img[0, 0, 2] > img[0, 0, 0]


class TestRendererModes:
    def test_persistent_schedules_equal_tiled(self):
        sc = demo.book1_end_scene(width=64)
        sd = sc.build()
        cp = sc.scene_cam.params()
        w, h = sc.scene_cam.image_width, sc.scene_cam.image_height
        a = render.render_image_data(sd, cp, w, h, 4, 8, 0, mode="tiled")
        for schedule in ("pixel", "queue"):
            b = render.render_image_persistent(
                sd, cp, w, h, 4, 8, 0, schedule=schedule
            )
            np.testing.assert_allclose(a, b, atol=1e-5, err_msg=schedule)

    def test_megakernel_matches_staged(self):
        # Decision-light scene (lambertian only): the megakernel's f32
        # reassociation cannot flip branch decisions -> tight match. Chaotic
        # scenes (book1 glass) only match statistically; covered on-chip by
        # tools/tpu_bench.py.
        sc = demo.smoke_scene(width=64)
        sd = sc.build()
        cp = sc.scene_cam.params()
        w, h = sc.scene_cam.image_width, sc.scene_cam.image_height
        assert integrator.megakernel_supported(sd, cp)
        ref = integrator.trace_persistent(
            sd, cp, w, h, 8, 8, jnp.uint32(0), lanes=512, use_pallas=False
        )
        mega = integrator.trace_persistent_mega(
            sd, cp, w, h, jnp.uint32(8), 8, jnp.uint32(0), interpret=True
        )
        np.testing.assert_allclose(np.asarray(ref), np.asarray(mega), atol=1e-4)

    def test_megakernel_animated_camera_matches_staged(self):
        # Keyframed camera (shutter-varying basis) + defocus, lambertian-only
        # so f32 reassociation cannot flip decisions.
        from crucible_tpu.models.timeline import LERP, WORLD

        sc = Scene.new_movie(16.0 / 9.0, 64, 24.0, 180.0, 2.0)
        cam = sc.scene_cam
        cam.look_from((0.0, 1.0, -8.0))
        cam.look_at((0.0, 0.5, 0.0))
        cam.set_vfov(40.0)
        cam.set_defocus_angle(0.5)
        cam.set_focus_dist(8.0)
        sc.add_element(
            Sphere((0.0, -100.0, 0.0), 100.0, Lambertian.from_color((0.5, 0.7, 0.3))),
            "ground",
        )
        sc.add_element(
            Sphere((0.0, 1.0, 0.0), 1.0, Lambertian.from_color((0.9, 0.3, 0.2))),
            "ball",
        )
        sc.cam_translate_point((6.0, 2.0, -6.0), 2.0, LERP, WORLD, "from")
        cam.frame = 24  # mid-walk: camera moves within this frame's shutter
        sd = sc.build()
        cp = cam.params()
        assert cp.animated and integrator.megakernel_supported(sd, cp)
        w, h = cam.image_width, cam.image_height
        ref = integrator.trace_persistent(
            sd, cp, w, h, 8, 6, jnp.uint32(0), lanes=512, use_pallas=False
        )
        mega = integrator.trace_persistent_mega(
            sd, cp, w, h, jnp.uint32(8), 6, jnp.uint32(0), interpret=True
        )
        d = np.abs(np.asarray(ref) - np.asarray(mega))
        # The staged jnp path factorizes the sphere quadratic differently
        # (oc = c - o vs the kernel's expanded form), so ulp-level rounding
        # can flip hit/miss exactly on silhouettes — a measure-zero set.
        # Require agreement everywhere but such flips.
        assert (d > 1e-4).mean() < 0.005, d.max()
        assert d.mean() < 1e-3

    def test_megakernel_swizzle_bit_exact(self):
        # Lane assignment (scanline vs 32x16 pixel blocks) must not change
        # any pixel: samples accumulate within one lane either way.
        sc = demo.smoke_scene(width=64)
        sd = sc.build()
        cp = sc.scene_cam.params()
        w, h = sc.scene_cam.image_width, sc.scene_cam.image_height
        a = integrator.trace_persistent_mega(
            sd, cp, w, h, jnp.uint32(4), 6, jnp.uint32(0), interpret=True,
            swizzle=True,
        )
        b = integrator.trace_persistent_mega(
            sd, cp, w, h, jnp.uint32(4), 6, jnp.uint32(0), interpret=True,
            swizzle=False,
        )
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_megakernel_cluster_culling_exact(self):
        # Chunk culling is a pure skip optimization: the clustered kernel
        # must be BIT-identical to the brute-force megakernel.
        from crucible_tpu.ops.pallas import megakernel as mk

        sc = demo.book1_end_scene(width=48)
        sd = sc.build()
        cp = sc.scene_cam.params()
        w, h = sc.scene_cam.image_width, sc.scene_cam.image_height
        plain = integrator.trace_persistent_mega(
            sd, cp, w, h, jnp.uint32(4), 6, jnp.uint32(0), interpret=True
        )
        perm, bounds = mk.cluster_spheres(
            np.asarray(sd.sph_center),
            np.asarray(sd.sph_radius),
            np.asarray(sd.sph_active),
        )
        clustered = integrator.trace_persistent_mega(
            sd, cp, w, h, jnp.uint32(4), 6, jnp.uint32(0), interpret=True,
            cluster_perm=jnp.asarray(perm), cluster_bounds=jnp.asarray(bounds),
        )
        np.testing.assert_array_equal(np.asarray(plain), np.asarray(clustered))

    @pytest.mark.parametrize("sbvh", ["0", "1"])
    def test_megakernel_cluster_culling_multitile(self, sbvh, monkeypatch):
        """Acceleration bit-identity on a MULTI-TILE sphere table: BOTH
        large-scene paths — the chunk-cond cull scan (CRUCIBLE_SPHERE_BVH=0)
        and the r5 per-LANE sphere BVH walk (default) — are pure skip
        optimizations and must match the brute kernel exactly. Routed
        through the render driver's cull flag (tables built host-side)."""
        from crucible_tpu.models import render

        monkeypatch.setenv("CRUCIBLE_SPHERE_BVH", sbvh)
        sc = demo.sphere_stress(width=24, copies=4)
        sd = sc.build()
        cp = sc.scene_cam.params()
        w, h = sc.scene_cam.image_width, sc.scene_cam.image_height
        assert sd.sph_center.shape[0] >= 1536  # multi-tile (pad-8: 1936)
        plain = render.render_image_persistent(
            sd, cp, w, h, 2, 4, 0, schedule="mega", cull=False
        )
        culled = render.render_image_persistent(
            sd, cp, w, h, 2, 4, 0, schedule="mega", cull=True
        )
        np.testing.assert_array_equal(np.asarray(plain), np.asarray(culled))

    def test_megakernel_supercluster_hierarchy_exact(self, monkeypatch):
        """The two-level (supercluster) chunk scan is a pure skip
        optimization: with SUPER forced small so the hierarchy engages
        (n_chunks > SUPER), the image must stay BIT-identical to the flat
        cull scan and to the brute kernel (VERDICT r4 #3)."""
        from crucible_tpu.models import render
        from crucible_tpu.ops.pallas import megakernel as mk

        monkeypatch.setenv("CRUCIBLE_SPHERE_BVH", "0")  # chunk-scan path
        sc = demo.sphere_stress(width=24, copies=4)
        sd = sc.build()
        cp = sc.scene_cam.params()
        w, h = sc.scene_cam.image_width, sc.scene_cam.image_height
        n_chunks = -(-sd.sph_center.shape[0] // mk.CLUSTER)
        plain = render.render_image_persistent(
            sd, cp, w, h, 2, 4, 0, schedule="mega", cull=False
        )
        monkeypatch.setattr(mk, "SUPER", 2)
        assert n_chunks > 2  # hierarchy engaged
        culled = render.render_image_persistent(
            sd, cp, w, h, 2, 4, 0, schedule="mega", cull=True
        )
        np.testing.assert_array_equal(np.asarray(plain), np.asarray(culled))

    def test_megakernel_moving_mesh_matches_staged(self):
        """MOVING triangle meshes in-kernel (r4): linear shutter vertex
        deltas lerped in the leaf test (table cols 16-24), winner normal
        from the lerped-edge cross. The moving_teapot demo must match the
        staged reference statistically (triangle-edge ulp flips)."""
        from crucible_tpu.models import render

        sc = demo.moving_teapot(duration=5.0)
        sd = sc.build(leaf_size=8)
        cp = sc.scene_cam.params()
        assert sd.animated and sd.tri_v0_d is not None
        assert integrator.megakernel_supported(sd, cp)
        w, h = 48, 27
        acc = integrator.trace_persistent_mega(
            sd, cp, w, h, jnp.uint32(2), 4, jnp.uint32(0), interpret=True
        )
        img = np.asarray(acc).reshape(h, w, 3) / 2.0
        ref = np.asarray(
            render.render_image_data(
                sd, cp, w, h, samples=2, max_depth=4, seed=0, mode="tiled"
            )
        )
        d = np.abs(img - ref)
        assert d.mean() < 3e-3 and (d > 1e-3).mean() < 0.03, d.max()

    def test_megakernel_mxu_fetch_matches(self, monkeypatch):
        """The one-hot MXU winner fetch (CRUCIBLE_MXU_FETCH) must be
        bit-identical to the per-column masked sums. Interpret mode checks
        the wiring in exact f32; the on-chip bf16-pass exactness is checked
        by tools/tpu_bench.py mxufetch (sha256 equality)."""
        from crucible_tpu.ops.pallas import megakernel as mk

        sc = demo.book1_end_scene(width=32)
        sd = sc.build()
        cp = sc.scene_cam.params()
        w, h = sc.scene_cam.image_width, sc.scene_cam.image_height

        def run():
            jax.clear_caches()  # MXU_FETCH is not part of the jit key
            return np.asarray(
                integrator.trace_persistent_mega(
                    sd, cp, w, h, jnp.uint32(2), 4, jnp.uint32(0),
                    interpret=True,
                )
            )

        monkeypatch.setattr(mk, "MXU_FETCH", False)
        plain = run()
        monkeypatch.setattr(mk, "MXU_FETCH", True)
        mxu = run()
        jax.clear_caches()
        np.testing.assert_array_equal(plain, mxu)

    def test_megakernel_triangle_bvh_matches_staged(self):
        # 80-triangle fan (> BVH_MIN_TRIS) + ground sphere: the in-kernel
        # tile-coherent BVH traversal must match the staged XLA traversal.
        # Triangle-edge samples can land differently at the ulp level, so
        # the assertion is statistical (see CLAUDE.md).
        import math

        sc = Scene.new_image(1.0, 48)
        cam = sc.scene_cam
        cam.look_from((0.0, 1.5, 4.0))
        cam.look_at((0.0, 0.3, 0.0))
        cam.set_vfov(45.0)
        sc.add_element(
            Sphere((0.0, -100.0, 0.0), 100.0, Lambertian.from_color((0.6, 0.6, 0.2))),
            "ground",
        )
        for i in range(80):
            a0 = 2 * math.pi * i / 80
            a1 = 2 * math.pi * (i + 1) / 80
            z0 = 0.3 + 0.1 * math.sin(5 * a0)
            sc.add_element(
                Triangle(
                    (0.8 * math.cos(a0), z0, 0.8 * math.sin(a0)),
                    (1.2 * math.cos(a1), 0.35, 1.2 * math.sin(a1)),
                    (0.0, 0.5, 0.0),
                    Metal((0.8, 0.7, 0.6), 0.2),
                ),
                f"tri{i}",
            )
        sd = sc.build()
        cp = cam.params()
        assert sd.use_bvh and integrator.megakernel_supported(sd, cp)
        w, h = cam.image_width, cam.image_height
        ref = integrator.trace_persistent(
            sd, cp, w, h, 4, 5, jnp.uint32(0), lanes=512, use_pallas=False
        )
        mega = integrator.trace_persistent_mega(
            sd, cp, w, h, jnp.uint32(4), 5, jnp.uint32(0), interpret=True
        )
        d = np.abs(np.asarray(ref) - np.asarray(mega))
        assert (d > 1e-3).mean() < 0.005, d.max()
        assert d.mean() < 1e-3

    def test_megakernel_unsupported_scenes_fall_back(self):
        # Image-textured scene -> staged path must be picked by auto.
        sc = demo.earth(width=32)
        sd = sc.build()
        cp = sc.scene_cam.params()
        assert not integrator.megakernel_supported(sd, cp)

    def test_seed_changes_noise_not_structure(self):
        sc = demo.smoke_scene(width=48)
        a = render.render_image(sc, samples=4, seed=0)
        b = render.render_image(sc, samples=4, seed=1)
        assert not np.array_equal(a, b)
        assert abs(a.mean() - b.mean()) < 0.02

    def test_render_deterministic(self):
        sc = demo.smoke_scene(width=48)
        a = render.render_image(sc, samples=4, seed=0)
        b = render.render_image(sc, samples=4, seed=0)
        np.testing.assert_array_equal(a, b)


class TestAnimatedScenes:
    def test_static_timeline_matches_plain(self):
        # A scene with a timeline whose keys are in the future renders
        # (at t=0 shutter) very close to the plain static scene — only the
        # within-shutter ramp of the first LERP key differs.
        base = _simple_scene(Lambertian.from_color((0.6, 0.3, 0.3)))
        anim = _simple_scene(Lambertian.from_color((0.6, 0.3, 0.3)))
        anim.translate_x(5.0, 1000.0, LERP, LOCAL, "obj")
        a = render.render_image(base, samples=4, max_depth=3)
        b = render.render_image(anim, samples=4, max_depth=3)
        # LERP ramps from the init time (-0.1), so at t=0 the sphere has
        # already moved ~5 * 0.1/1000 — a few edge pixels flip; the images
        # agree everywhere else (the reference behaves identically).
        assert np.abs(a - b).mean() < 2e-3

    def test_nerp_future_key_is_exact(self):
        base = _simple_scene(Lambertian.from_color((0.6, 0.3, 0.3)))
        anim = _simple_scene(Lambertian.from_color((0.6, 0.3, 0.3)))
        anim.translate_x(5.0, 1000.0, NERP, LOCAL, "obj")
        a = render.render_image(base, samples=4, max_depth=3)
        b = render.render_image(anim, samples=4, max_depth=3)
        np.testing.assert_allclose(a, b, atol=1e-6)

    def test_moved_sphere_moves_in_image(self):
        anim = _simple_scene(Lambertian.from_color((0.9, 0.1, 0.1)))
        anim.translate_x(0.6, 1.0, NERP, LOCAL, "obj")
        anim.scene_cam.frame_rate = 24.0
        img0 = render.render_image(anim, samples=4, max_depth=3)
        anim.scene_cam.frame = 48  # t = 2s, past the keyframe
        img1 = render.render_image(anim, samples=4, max_depth=3)
        h, w = img0.shape[:2]
        # Sphere occupied center at t=0; by t=2 it moved +x (image left/right
        # depends on basis) — center pixel changes from red to sky.
        assert img0[h // 2, w // 2, 0] > img0[h // 2, w // 2, 2]
        assert img1[h // 2, w // 2, 2] > img1[h // 2, w // 2, 0]

    def test_motion_blur_smears(self):
        # A fast-moving sphere within one open shutter produces motion blur:
        # hit region wider than the static sphere.
        anim = _simple_scene(Lambertian.from_color((0.9, 0.1, 0.1)))
        anim.elements[0].radius = 0.25  # small enough to smear inside frame
        anim.scene_cam.shutter_angle = 360.0
        anim.scene_cam.frame_rate = 1.0  # shutter window [0, 1]s
        anim.translate_x(0.55, 1.0, LERP, LOCAL, "obj")
        blurred = render.render_image(anim, samples=64, max_depth=2)
        static = _simple_scene(Lambertian.from_color((0.9, 0.1, 0.1)))
        static.elements[0].radius = 0.25
        static.scene_cam.shutter_angle = 360.0
        static.scene_cam.frame_rate = 1.0
        sharp = render.render_image(static, samples=64, max_depth=2)
        # The smeared sphere's red mass extends along +x: its rightmost
        # red-dominant column lies well beyond the static sphere's.
        def rightmost_red(img):
            cols = np.maximum(img[..., 0] - img[..., 2], 0.0).sum(axis=0)
            return np.nonzero(cols > 0.01)[0].max()

        assert rightmost_red(blurred) > rightmost_red(sharp) + 8


class TestProgressChunking:
    def test_chunked_equals_single_dispatch(self):
        """progress=True renders in sample chunks; the sum must equal the
        single dispatch up to f32 summation order."""
        from crucible_tpu.models import demo, render

        sc = demo.smoke_scene(width=24)
        sd = sc.build()
        cp = sc.scene_cam.params()
        w, h = sc.scene_cam.image_width, sc.scene_cam.image_height
        reports = []
        one = render.render_image_persistent(
            sd, cp, w, h, 9, 6, 3, schedule="pixel"
        )
        chunked = render.render_image_persistent(
            sd, cp, w, h, 9, 6, 3, schedule="pixel",
            progress=lambda d, t, s: reports.append((d, t)),
        )
        np.testing.assert_allclose(chunked, one, rtol=1e-5, atol=1e-6)
        assert reports[-1][0] == 9 and reports[-1][1] == 9
        assert len(reports) >= 2  # intra-render progress actually reported

    def test_queue_sample_start(self):
        from crucible_tpu.models import demo, render

        sc = demo.smoke_scene(width=24)
        sd = sc.build()
        cp = sc.scene_cam.params()
        w, h = sc.scene_cam.image_width, sc.scene_cam.image_height
        one = render.render_image_persistent(sd, cp, w, h, 8, 6, 3, schedule="queue")
        chunked = render.render_image_persistent(
            sd, cp, w, h, 8, 6, 3, schedule="queue", progress=lambda *a: None
        )
        np.testing.assert_allclose(chunked, one, rtol=1e-5, atol=1e-6)

    def test_queue_overflow_guard_raises(self):
        from crucible_tpu.models import demo, render

        sc = demo.smoke_scene(width=24)
        sd = sc.build()
        cp = sc.scene_cam.params()
        with pytest.raises(ValueError, match="overflow int32"):
            render.render_image_persistent(
                sd, cp, 3840, 2160, 500, 6, 3, schedule="queue"
            )
