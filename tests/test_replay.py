"""Record/replay gradient path (models/replay.py): the replay's radiance
must match the direct wavefront integrator, and gradients through the
replay must pass the same finite-difference acceptance as direct AD —
including the scenes direct AD could not reach (animated spheres,
triangle meshes)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from crucible_tpu import grad as G
from crucible_tpu.models import demo, integrator
from crucible_tpu.models import replay as replay_mod
from crucible_tpu.models.camera import generate_rays
from crucible_tpu.models.scene import Lambertian, Metal, Scene, Sphere
from crucible_tpu.models.timeline import LERP, WORLD
from crucible_tpu.ops.gather import take_rows_mm


def _rays(sc, width, height, spp, seed=0):
    sd = sc.build()
    cp = sc.scene_cam.params()
    p = width * height
    pix = jnp.tile(jnp.arange(p, dtype=jnp.uint32), spp)
    smp = jnp.repeat(jnp.arange(spp, dtype=jnp.uint32), p)
    return sd, cp, pix, smp


class TestTakeRowsMM:
    def test_matches_take(self):
        table = jnp.asarray(np.random.default_rng(0).normal(size=(37, 8)), jnp.float32)
        idx = jnp.asarray(np.random.default_rng(1).integers(0, 37, 513), jnp.int32)
        np.testing.assert_array_equal(
            np.asarray(take_rows_mm(table, idx)),
            np.asarray(jnp.take(table, idx, axis=0)),
        )

    def test_backward_is_exact_scatter_sum(self):
        table = jnp.ones((5, 2), jnp.float32)
        idx = jnp.asarray([0, 3, 3, 1], jnp.int32)
        g = jax.grad(lambda t: jnp.sum(take_rows_mm(t, idx) * 2.0))(table)
        expect = np.zeros((5, 2), np.float32)
        for i in idx:
            expect[int(i)] += 2.0
        np.testing.assert_allclose(np.asarray(g), expect)


class TestReplayMatchesForward:
    @pytest.mark.parametrize(
        "mk,depth",
        [
            (demo.smoke_scene, 6),
            (demo.book1_end_scene, 8),
            (demo.checkered_spheres, 5),
            (demo.earth, 4),
            (demo.load_teapot, 5),
        ],
    )
    def test_radiance_close(self, mk, depth):
        sc = mk(width=32)
        sd, cp, pix, smp = _rays(sc, 32, sc.scene_cam.image_height, 2)
        o, d, _ = generate_rays(cp, 32, sc.scene_cam.image_height, pix, smp, 0)
        ref = integrator.trace(sd, o, d, pix, smp, jnp.uint32(0), depth)
        got = replay_mod.render_rays_replay(
            sd, cp, 32, sc.scene_cam.image_height, pix, smp, jnp.uint32(0), depth
        )
        # Same decisions, same RNG; only f32 association of the hit-t math
        # differs (per-winner dot vs (R,N) matmul quadratic). Silhouette
        # lanes can land on different-but-valid decision branches when the
        # recomputed t drifts an ulp across the acceptance boundary, so
        # compare means tightly and lanes loosely.
        ref, got = np.asarray(ref), np.asarray(got)
        assert np.isfinite(got).all()
        np.testing.assert_allclose(got.mean(0), ref.mean(0), rtol=2e-3, atol=2e-3)
        close = np.isclose(got, ref, rtol=1e-3, atol=1e-3).all(axis=-1)
        assert close.mean() > 0.98, f"only {close.mean():.3f} lanes match"

    def test_moving_mesh_radiance_close(self):
        sc = demo.load_teapot(width=24)
        sc.translate_x(0.4, 1.0, LERP, WORLD, "teapot")
        sc.scene_cam.frame = 6
        h = sc.scene_cam.image_height
        sd, cp, pix, smp = _rays(sc, 24, h, 2)
        assert sd.animated and sd.tri_v0_d is not None
        o, d, _ = generate_rays(cp, 24, h, pix, smp, 0)
        ref = np.asarray(integrator.trace(sd, o, d, pix, smp, jnp.uint32(0), 5))
        got = np.asarray(
            replay_mod.render_rays_replay(sd, cp, 24, h, pix, smp, jnp.uint32(0), 5)
        )
        assert np.isfinite(got).all()
        np.testing.assert_allclose(got.mean(0), ref.mean(0), rtol=5e-3, atol=5e-3)

    def test_animated_scene_radiance_close(self):
        sc = demo.smoke_scene(width=32)
        sc.translate_x(1.0, 1.0, LERP, WORLD, "ball")  # make it animated
        sc.scene_cam.frame = 6
        sd, cp, pix, smp = _rays(sc, 32, sc.scene_cam.image_height, 2)
        assert sd.animated
        o, d, _ = generate_rays(cp, 32, sc.scene_cam.image_height, pix, smp, 0)
        ref = integrator.trace(sd, o, d, pix, smp, jnp.uint32(0), 6)
        got = replay_mod.render_rays_replay(
            sd, cp, 32, sc.scene_cam.image_height, pix, smp, jnp.uint32(0), 6
        )
        ref, got = np.asarray(ref), np.asarray(got)
        np.testing.assert_allclose(got.mean(0), ref.mean(0), rtol=2e-3, atol=2e-3)


def _fd_vs_grad(sc, key, width=32, spp=4, depth=4, eps=1e-3, rel=2e-2, pix_n=None):
    sd = sc.build()
    cp = sc.scene_cam.params()
    height = sc.scene_cam.image_height
    n = pix_n or width * height
    pix = jnp.arange(n, dtype=jnp.uint32)
    target = jnp.zeros((n, 3), jnp.float32)
    params = G.extract_params(sd, cp)
    kw = dict(width=width, height=height, spp=spp, max_depth=depth, method="replay")
    _, grads = G.loss_and_grad(params, sd, cp, target, pix, jnp.uint32(0), **kw)
    g = np.asarray(grads[key])
    idx = np.unravel_index(np.argmax(np.abs(g)), g.shape)
    assert abs(g[idx]) > 0

    def loss_at(delta):
        p2 = dict(params)
        arr = np.asarray(params[key], np.float64).copy()
        arr[idx] += delta
        p2[key] = jnp.asarray(arr, jnp.float32)
        return float(G.l2_loss(p2, sd, cp, target, pix, jnp.uint32(0), **kw))

    fd = (loss_at(eps) - loss_at(-eps)) / (2 * eps)
    assert g[idx] == pytest.approx(fd, rel=rel), f"{key}: ad={g[idx]} fd={fd}"


class TestReplayFiniteDifference:
    def test_albedo(self):
        _fd_vs_grad(demo.smoke_scene(width=32), "tex_color")

    def test_emission(self):
        sc = Scene.new_image(1.0, 32)
        sc.scene_cam.look_from((0, 0, 2))
        sc.scene_cam.look_at((0, 0, 0))
        sc.scene_cam.set_vfov(40.0)
        from crucible_tpu.models.scene import Emissive

        sc.add_element(Sphere((0, 0, 0), 0.5, Emissive((1.0, 0.5, 0.2))), "light")
        _fd_vs_grad(sc, "mat_emission")

    def test_texel_image(self):
        sc = demo.earth(width=24)
        sd = sc.build()
        cp = sc.scene_cam.params()
        pix = jnp.arange(24 * 13, dtype=jnp.uint32)
        target = jnp.zeros((24 * 13, 3), jnp.float32)
        params = G.extract_params(sd, cp)
        kw = dict(width=24, height=13, spp=2, max_depth=3, method="replay")
        _, grads = G.loss_and_grad(params, sd, cp, target, pix, jnp.uint32(0), **kw)
        g = np.asarray(grads["tex_images"][0])
        assert np.isfinite(g).all() and np.abs(g).max() > 0

    def test_camera_vfov_sky_pixels(self):
        sc = demo.smoke_scene(width=32)
        _fd_vs_grad(sc, "cam_vfov", pix_n=8, spp=2, depth=3, eps=1e-4)

    def test_fuzz_metal_matches_direct_ad(self):
        """Fuzz gradients are boundary-dominated (rotating scatter
        directions flips hit/miss at silhouettes — a term every
        detached-sampling estimator excludes, FD included at eps scale), so
        the acceptance here is estimator EQUIVALENCE: replay must produce
        the same interior gradient as direct reverse-mode AD."""
        sc = Scene.new_image(1.0, 32)
        sc.scene_cam.look_from((0, 0, 2))
        sc.scene_cam.look_at((0, 0, 0))
        sc.scene_cam.set_vfov(40.0)
        sc.add_element(Sphere((0, 0, 0), 0.5, Metal((0.8, 0.7, 0.6), 0.3)), "m")
        sc.add_element(
            Sphere((0, -100.5, 0), 100.0, Lambertian.from_color((0.5, 0.5, 0.5))),
            "ground",
        )
        sd = sc.build()
        cp = sc.scene_cam.params()
        pix = jnp.arange(32 * 32, dtype=jnp.uint32)
        target = jnp.zeros((32 * 32, 3), jnp.float32)
        params = G.extract_params(sd, cp)
        kw = dict(width=32, height=32, spp=4, max_depth=4)
        _, g_ad = G.loss_and_grad(
            params, sd, cp, target, pix, jnp.uint32(0), method="ad", **kw
        )
        _, g_rp = G.loss_and_grad(
            params, sd, cp, target, pix, jnp.uint32(0), method="replay", **kw
        )
        np.testing.assert_allclose(
            np.asarray(g_rp["mat_fuzz"]), np.asarray(g_ad["mat_fuzz"]),
            rtol=1e-3, atol=1e-7,
        )

    def test_moving_sphere_albedo(self):
        """Animated-scene gradients — unreachable for direct AD without an
        (R, N, 3) rematerialization; the replayed quadratic carries them."""
        sc = demo.smoke_scene(width=32)
        sc.translate_x(0.6, 1.0, LERP, WORLD, "ball")
        sc.scene_cam.frame = 6
        assert sc.build().animated
        _fd_vs_grad(sc, "tex_color", depth=4)

    def test_teapot_mesh_albedo(self):
        """Triangle-BVH scene gradients through per-winner Möller-Trumbore."""
        sc = demo.load_teapot(width=24)
        _fd_vs_grad(sc, "tex_color", width=24, spp=2, depth=3, rel=5e-2)

    def test_moving_mesh_albedo(self):
        """Animated triangle meshes replay via per-winner vertex motion
        lerp (VERDICT r2 #7; reference per-vertex timelines
        triangle.rs:15-17)."""
        sc = demo.load_teapot(width=24)
        sc.translate_x(0.5, 1.0, LERP, WORLD, "teapot")
        sc.scene_cam.frame = 6
        sd = sc.build()
        assert sd.animated and sd.tri_v0_d is not None
        assert replay_mod.replay_supported(sd)
        _fd_vs_grad(sc, "tex_color", width=24, spp=2, depth=3, rel=5e-2)

    def test_nested_checker_albedo(self):
        """Nested checkers replay through the full textures.value
        resolution (VERDICT r2 #7; Arc<Textures> composition,
        checker_texture.rs:12-36)."""
        from crucible_tpu.models.scene import CheckerTexture, SolidColor

        inner = CheckerTexture.from_colors(0.1, (0.9, 0.1, 0.1), (0.1, 0.9, 0.1))
        outer = CheckerTexture(1.0, inner, SolidColor((0.1, 0.1, 0.9)))
        sc = Scene.new_image(1.5, 24)
        sc.scene_cam.look_from((0, 2, 4))
        sc.scene_cam.look_at((0, 0, 0))
        sc.scene_cam.set_vfov(40.0)
        sc.add_element(
            Sphere((0, -100.5, 0), 100.0, Lambertian.from_texture(outer)),
            "ground",
        )
        sd = sc.build()
        assert sd.tex.max_nest == 2 and replay_mod.replay_supported(sd)
        _fd_vs_grad(sc, "tex_color", width=24, spp=2, depth=3)


class TestReplayGradientsFinite:
    def test_all_finite_book1(self):
        sc = demo.book1_end_scene(width=32)
        sd = sc.build()
        cp = sc.scene_cam.params()
        pix = jnp.arange(32 * 18, dtype=jnp.uint32)
        target = jnp.zeros((32 * 18, 3), jnp.float32)
        params = G.extract_params(sd, cp)
        kw = dict(width=32, height=18, spp=4, max_depth=4, method="replay")
        _, grads = G.loss_and_grad(params, sd, cp, target, pix, jnp.uint32(0), **kw)
        for k, leaf in grads.items():
            for arr in jax.tree_util.tree_leaves(leaf):
                assert bool(jnp.isfinite(arr).all()), f"non-finite grad in {k}"


class TestMegaRecordMode:
    """Record-mode megakernel (interpret on CPU): records must be
    semantically equivalent to the staged trace_record — identical pcg4d
    streams, decisions equal except ulp silhouette flips — and the replay
    over them must reproduce the forward image statistically."""

    def _records(self, sc, width, spp=2, depth=6, seed=3):
        sd = sc.build()
        cp = sc.scene_cam.params()
        w, h = sc.scene_cam.image_width, sc.scene_cam.image_height
        p = w * h
        pix = jnp.tile(jnp.arange(p, dtype=jnp.uint32), spp)
        smp = jnp.repeat(jnp.arange(spp, dtype=jnp.uint32), p)
        seed = jnp.uint32(seed)
        o, d, _ = generate_rays(cp, w, h, pix, smp, seed)
        rec_s = replay_mod.trace_record(sd, o, d, pix, smp, seed, depth)
        rec_m = replay_mod.trace_record_mega(
            sd, cp, w, h, pix, smp, seed, depth, interpret=True
        )
        return sd, cp, (o, d, pix, smp, seed), map(np.asarray, (rec_s, rec_m))

    @pytest.mark.parametrize("mk", [demo.book1_end_scene, demo.load_teapot])
    def test_records_match_staged(self, mk):
        sc = mk(width=32)
        sd, cp, rays, (rec_s, rec_m) = self._records(sc, 32)
        ess = replay_mod.F_ALIVE | replay_mod.F_HIT | replay_mod.F_SCAT
        # Decisions equal except ulp silhouette flips (<1% of lanes).
        assert ((rec_s & ess) == (rec_m & ess)).mean() > 0.99
        hit_both = ((rec_s & rec_m) & replay_mod.F_HIT) > 0
        ri_s, ri_m = rec_s >> 8, rec_m >> 8
        rf_s, rf_m = rec_s & 255, rec_m & 255
        assert (ri_s[hit_both] == ri_m[hit_both]).mean() > 0.99
        assert (rf_s[hit_both] == rf_m[hit_both]).mean() > 0.99

    def test_replay_over_mega_records_matches_image(self):
        sc = demo.book1_end_scene(width=32)
        depth = 8
        sd, cp, (o, d, pix, smp, seed), (rec_s, rec_m) = self._records(
            sc, 32, depth=depth
        )
        rad_m = np.asarray(
            replay_mod.trace_replay(
                sd, o, d, pix, smp, seed, depth, jnp.asarray(rec_m)
            )
        )
        rad_fwd = np.asarray(
            integrator.trace(sd, o, d, pix, smp, seed, depth)
        )
        # Ulp-flipped lanes take different (valid) sample paths; compare in
        # aggregate, and exactly on the >97% of lanes whose SEMANTIC record
        # content matches (bits that don't reach the replay's radiance —
        # front/root1 of absorbed rows, winner ids of miss rows — are
        # don't-cares the two kernels fill differently).
        def canon(rec):
            rf, ri = rec & 255, rec >> 8
            hit = (rf & replay_mod.F_HIT) > 0
            scat = (rf & replay_mod.F_SCAT) > 0
            mask = (
                (replay_mod.F_ALIVE | replay_mod.F_HIT | replay_mod.F_SCAT)
                | np.where(hit, replay_mod.F_TRI, 0)
                | np.where(
                    scat,
                    replay_mod.F_FRONT
                    | replay_mod.F_ROOT1
                    | replay_mod.F_REFL
                    | replay_mod.F_DEGEN,
                    0,
                )
            )
            return rf & mask, np.where(hit, ri, 0)

        cs = canon(np.asarray(rec_s))
        cm = canon(np.asarray(rec_m))
        same = np.all((cs[0] == cm[0]) & (cs[1] == cm[1]), axis=0)
        assert same.mean() > 0.97
        # Replay re-derives t per winner (different f32 association than the
        # trace's (R,N) matmul), so even identical decisions drift ulps —
        # same convention as TestReplayMatchesForward: means tight, lanes
        # loose.
        close = np.isclose(rad_m, rad_fwd, rtol=1e-3, atol=1e-3).all(axis=-1)
        assert close[same].mean() > 0.98
        np.testing.assert_allclose(rad_m.mean(), rad_fwd.mean(), atol=5e-3)

    def test_flag_bits_in_lockstep_with_kernel(self):
        """The kernel packs flag bits with hard-coded masks; they must match
        the replay's F_* layout."""
        assert (replay_mod.F_ALIVE, replay_mod.F_HIT, replay_mod.F_TRI,
                replay_mod.F_SCAT, replay_mod.F_FRONT, replay_mod.F_REFL,
                replay_mod.F_DEGEN, replay_mod.F_ROOT1) == (1, 2, 4, 8, 16, 32, 64, 128)


class TestRecordSchedule:
    """'record' render schedule (render.py): record-mode megakernel for
    geometry + jnp replay for shading — the production path for image
    textures, equirect skies and nested checkers (VERDICT r1 #2, solved by
    moving shading OUT of the kernel instead of fighting Mosaic's gather
    coverage)."""

    @pytest.mark.parametrize("mk,depth", [(demo.earth, 6), (demo.garden_skybox, 5)])
    def test_matches_staged(self, mk, depth):
        from crucible_tpu.models import render

        sc = mk(width=32)
        sd = sc.build()
        cp = sc.scene_cam.params()
        w, h = sc.scene_cam.image_width, sc.scene_cam.image_height
        a = render.render_image_persistent(
            sd, cp, w, h, 2, depth, 1, schedule="pixel", use_pallas=False
        )
        b = render.render_image_persistent(sd, cp, w, h, 2, depth, 1, schedule="record")
        close = np.isclose(a, b, rtol=1e-3, atol=1e-3).mean()
        assert close > 0.99, close
        np.testing.assert_allclose(a.mean(), b.mean(), atol=2e-3)

    def test_record_supported_predicates(self):
        sc = demo.earth(width=32)
        sd = sc.build()
        cp = sc.scene_cam.params()
        assert not integrator.megakernel_supported(sd, cp)  # image texture
        assert integrator.megakernel_record_supported(sd, cp)
        assert replay_mod.replay_supported(sd)

    def test_moving_mesh_mega_records_replay(self):
        """Record-mode megakernel over a MOVING BVH mesh (r4: shutter
        deltas lerped in-kernel): the replay over mega records must match
        the staged forward statistically — proves the kernel's per-lane
        shutter fractions and moved-edge MT agree with the jnp lerp."""
        sc = demo.moving_teapot(duration=5.0)
        sd = sc.build(leaf_size=8)
        cp = sc.scene_cam.params()
        assert integrator.megakernel_record_supported(sd, cp)
        w, h, spp, depth = 32, 18, 2, 4
        p = w * h
        pix = jnp.tile(jnp.arange(p, dtype=jnp.uint32), spp)
        smp = jnp.repeat(jnp.arange(spp, dtype=jnp.uint32), p)
        seed = jnp.uint32(3)
        rec = replay_mod.trace_record_mega(
            sd, cp, w, h, pix, smp, seed, depth, interpret=True
        )
        o, d, _ = generate_rays(cp, w, h, pix, smp, seed)
        rad = np.asarray(
            replay_mod.trace_replay(sd, o, d, pix, smp, seed, depth, rec)
        )
        ref = np.asarray(
            integrator.render_rays(sd, cp, w, h, pix, smp, seed, depth)
        )
        d_ = np.abs(rad - ref)
        assert d_.mean() < 3e-3 and (d_ > 1e-3).mean() < 0.03, d_.max()

    def test_chunked_record_replay_sums(self):
        """Chunking the record+replay over samples equals one chunk."""
        from crucible_tpu.models import replay as R

        sc = demo.earth(width=24)
        sd = sc.build()
        cp = sc.scene_cam.params()
        w, h = sc.scene_cam.image_width, sc.scene_cam.image_height
        one = R.render_record_replay(sd, cp, w, h, 4, 4, 1)
        # Budget forcing 1-sample chunks.
        many = R.render_record_replay(
            sd, cp, w, h, 4, 4, 1, rec_budget_bytes=8 * 4 * w * h
        )
        np.testing.assert_allclose(np.asarray(many), np.asarray(one), rtol=1e-5, atol=1e-5)

    @pytest.mark.parametrize("depth", [8, 14])
    def test_grad_split_matches_unsplit(self, depth):
        """render_rays_replay narrows deep lanes past GRAD_SPLIT_DEPTH with
        static scans (recursively re-splitting every TAIL_SPLIT_DEPTH rows
        at depth 14); value AND gradients must match the unsplit replay
        (the head/tail handoff is bit-exact — same f32 op order, dead tail
        rows contribute nothing)."""
        import functools

        sc = demo.smoke_scene(width=24)
        sd = sc.build()
        cp = sc.scene_cam.params()
        h = sc.scene_cam.image_height
        assert depth > replay_mod.GRAD_SPLIT_DEPTH + 2
        p = 24 * h
        pix = jnp.tile(jnp.arange(p, dtype=jnp.uint32), 2)
        smp = jnp.repeat(jnp.arange(2, dtype=jnp.uint32), p)
        seed = jnp.uint32(0)
        o, d, _ = generate_rays(cp, 24, h, pix, smp, seed)
        rec = replay_mod.trace_record(sd, o, d, pix, smp, seed, depth)

        def loss(params, split):
            sd2, _ = G.apply_params(sd, cp, params)
            if split:
                rad = replay_mod.replay_split(
                    sd2, o, d, pix, smp, seed, depth, rec,
                    split_depth=replay_mod.GRAD_SPLIT_DEPTH,
                    long_div=replay_mod.GRAD_LONG_DIV,
                    early_exit=False,
                )
            else:
                rad = replay_mod.trace_replay(
                    sd2, o, d, pix, smp, seed, depth, rec
                )
            return jnp.mean(rad**2)

        params = G.extract_params(sd, cp)
        v0, g0 = jax.value_and_grad(functools.partial(loss, split=False))(params)
        v1, g1 = jax.value_and_grad(functools.partial(loss, split=True))(params)
        assert float(v0) == pytest.approx(float(v1), rel=1e-6)
        np.testing.assert_allclose(
            np.asarray(g1["tex_color"]), np.asarray(g0["tex_color"]),
            rtol=1e-5, atol=1e-8,
        )

    def test_split_tail_replay_matches_reference(self):
        """max_depth past SPLIT_DEPTH triggers the head/tail lane-narrowing
        (top_k compaction of deep lanes); radiance must match the tiled
        reference bit-for-bit up to f32 association."""
        from crucible_tpu.models import render
        from crucible_tpu.models import replay as R

        assert 12 > R.SPLIT_DEPTH + 2
        sc = demo.earth(width=24)
        sd = sc.build()
        cp = sc.scene_cam.params()
        w, h = sc.scene_cam.image_width, sc.scene_cam.image_height
        fb = R.render_record_replay(sd, cp, w, h, 3, 12, 0)
        img = np.asarray(fb).reshape(h, w, 3) / np.float32(3)
        ref = np.asarray(
            render.render_image(sc, samples=3, max_depth=12, seed=0, mode="tiled")
        )
        d = np.abs(img - ref)
        assert d.mean() < 3e-3 and (d > 1e-3).mean() < 0.03, d.max()


class TestNestedCheckerRecordSchedule:
    def test_deep_nest_matches_tiled(self):
        """The record schedule's replay shading resolves a 3-level nested
        checker (each level with its own inv_scale) identically to the
        tiled reference (VERDICT r3 weak #6 — previously unmeasured past
        one level)."""
        from crucible_tpu.models import render
        from crucible_tpu.models import replay as R

        sc = demo.nested_checkers(width=24, nest=3)
        sd = sc.build()
        cp = sc.scene_cam.params()
        w, h = sc.scene_cam.image_width, sc.scene_cam.image_height
        assert sd.tex.max_nest == 3
        fb = R.render_record_replay(sd, cp, w, h, 2, 4, 0)
        img = np.asarray(fb).reshape(h, w, 3) / np.float32(2)
        ref = np.asarray(
            render.render_image(sc, samples=2, max_depth=4, seed=0, mode="tiled")
        )
        d = np.abs(img - ref)
        assert d.mean() < 3e-3 and (d > 1e-3).mean() < 0.03, d.max()


class TestReplayExactMotion:
    """Exact per-ray-time scenes (mid-shutter keyframes) are replayable as
    of r4: the replay re-derives winner geometry from the piecewise-linear
    timeline tracks at the lane's absolute time (VERDICT r3 #2). Anchor:
    src/timeline/mod.rs:233-263 evaluated per ray."""

    def _scene(self):
        from crucible_tpu.models.scene import Emissive
        from crucible_tpu.models.timeline import LOCAL, NERP

        sc = Scene(aspect_ratio=1.0, image_width=12)
        sc.add_element(
            Sphere((0, -100.5, -3), 100.0, Lambertian.from_color((0.5, 0.6, 0.4))),
            "ground",
        )
        sc.add_element(Sphere((0, 0, -3), 0.5, Metal((0.8, 0.7, 0.6), 0.2)), "ball")
        sc.add_element(Sphere((1.2, 0.2, -2.5), 0.3, Emissive((0.9, 0.4, 0.2))), "lamp")
        sc.translate_x(0.6, 0.01, NERP, LOCAL, "ball")  # mid-shutter key
        return sc

    def test_forward_matches_integrator(self):
        sc = self._scene()
        sd = sc.build()
        cp = sc.scene_cam.params()
        assert sd.motion_exact and replay_mod.replay_supported(sd)
        w = h = 12
        spp, depth = 2, 6
        p = w * h
        pix = jnp.tile(jnp.arange(p, dtype=jnp.uint32), spp)
        smp = jnp.repeat(jnp.arange(spp, dtype=jnp.uint32), p)
        seed = jnp.uint32(7)
        ref = np.asarray(integrator.render_rays(sd, cp, w, h, pix, smp, seed, depth))
        rep = np.asarray(
            replay_mod.render_rays_replay(sd, cp, w, h, pix, smp, seed, depth)
        )
        np.testing.assert_allclose(rep, ref, rtol=1e-5, atol=1e-6)

    def test_grads_match_direct_ad(self):
        sc = self._scene()
        sd = sc.build()
        cp = sc.scene_cam.params()
        w = h = 12
        spp, depth = 2, 6
        pix = jnp.arange(w * h, dtype=jnp.uint32)
        target = jnp.zeros((w * h, 3), jnp.float32)
        params = G.extract_params(sd, cp)
        kw = dict(width=w, height=h, spp=spp, max_depth=depth)
        l1, g1 = G.loss_and_grad(
            params, sd, cp, target, pix, jnp.uint32(7), method="replay", **kw
        )
        l2, g2 = G.loss_and_grad(
            params, sd, cp, target, pix, jnp.uint32(7), method="ad", **kw
        )
        assert float(l1) == pytest.approx(float(l2), rel=1e-6)
        for k in ("tex_color", "mat_emission", "mat_fuzz", "cam_vfov"):
            np.testing.assert_allclose(
                np.asarray(g1[k]), np.asarray(g2[k]), rtol=1e-4, atol=1e-7,
                err_msg=k,
            )

    def test_exact_mesh_replay(self):
        """Replay over a mid-shutter BVH mesh (per-winner exact vertex
        tracks, leaf order) matches the staged integrator."""
        from crucible_tpu.models.scene import Emissive, Triangle
        from crucible_tpu.models.timeline import LOCAL, NERP

        sc = Scene(aspect_ratio=1.0, image_width=8)
        n, ext, z = 8, 300.0, 5.0
        emission = (0.8, 0.1, 0.6)
        for i in range(n):
            for j in range(n):
                x0, x1 = -ext + 2 * ext * i / n, -ext + 2 * ext * (i + 1) / n
                y0, y1 = -ext + 2 * ext * j / n, -ext + 2 * ext * (j + 1) / n
                sc.add_element(
                    Triangle((x0, y0, z), (x1, y0, z), (x1, y1, z), Emissive(emission)),
                    f"t{i}_{j}a",
                )
                sc.add_element(
                    Triangle((x0, y0, z), (x1, y1, z), (x0, y1, z), Emissive(emission)),
                    f"t{i}_{j}b",
                )
        for i in range(n):
            for j in range(n):
                for s in "ab":
                    sc.translate_point((0, 0, -10.0), 0.008, NERP, LOCAL, f"t{i}_{j}{s}")
        sd = sc.build()
        cp = sc.scene_cam.params()
        assert sd.use_bvh and sd.tri_exact and replay_mod.replay_supported(sd)
        w, h, spp, depth = 8, 8, 4, 4
        p = w * h
        pix = jnp.tile(jnp.arange(p, dtype=jnp.uint32), spp)
        smp = jnp.repeat(jnp.arange(spp, dtype=jnp.uint32), p)
        seed = jnp.uint32(2)
        ref = np.asarray(integrator.render_rays(sd, cp, w, h, pix, smp, seed, depth))
        rep = np.asarray(
            replay_mod.render_rays_replay(sd, cp, w, h, pix, smp, seed, depth)
        )
        np.testing.assert_allclose(rep, ref, rtol=1e-5, atol=1e-6)


class TestBucketedReplay:
    """Depth-bucketed replay (replay.replay_bucketed, the r4 deep-budget
    gradient path): lanes are partitioned by recorded path depth into
    static scan lengths; narrow buckets re-walk head rows from regenerated
    primary rays (integer-only compaction) and accumulate radiance only
    past the head — values and gradients must match the unsplit replay."""

    def _shell_scene(self):
        from crucible_tpu.models.scene import Emissive

        # Fuzzy-metal enclosure -> a long spread of path depths (some lanes
        # reach max_depth); emissive ball -> HIT rows contribute radiance,
        # so any double counting by the accum_from mask is caught.
        sc = Scene.new_image(1.0, 24)
        sc.scene_cam.look_from((0, 0, 0))
        sc.scene_cam.look_at((0, 0, -1))
        sc.scene_cam.set_vfov(70.0)
        sc.add_element(
            Sphere((0, 0, 0), 10.0, Metal((0.85, 0.8, 0.75), 0.4)), "shell"
        )
        sc.add_element(Sphere((0, 1.5, -4), 1.0, Emissive((0.6, 0.5, 0.4))), "lamp")
        sc.add_element(
            Sphere((0, -2.5, -4), 1.2, Lambertian.from_color((0.4, 0.5, 0.6))),
            "ball",
        )
        return sc

    def test_matches_unsplit_value_and_grads(self):
        import functools

        sc = self._shell_scene()
        sd = sc.build()
        cp = sc.scene_cam.params()
        h = sc.scene_cam.image_height
        depth = 20
        p = 24 * h
        pix = jnp.tile(jnp.arange(p, dtype=jnp.uint32), 2)
        smp = jnp.repeat(jnp.arange(2, dtype=jnp.uint32), p)
        seed = jnp.uint32(0)
        o0, d0, _ = generate_rays(cp, 24, h, pix, smp, seed)
        rec = replay_mod.trace_record(sd, o0, d0, pix, smp, seed, depth)
        depth_lane = np.asarray(
            ((np.asarray(rec) & replay_mod.F_ALIVE) > 0).sum(0)
        )
        assert (depth_lane > 8).any() and (depth_lane == depth).any()

        # Last bucket full width (this scene's deep survivors exceed any
        # narrow capacity — that case is the overflow test below); the
        # middle bucket genuinely narrows.
        spec = ((4, 1), (8, 2), (0, 1))

        def loss(params, bucketed):
            sd2, cp2 = G.apply_params(sd, cp, params)
            o, d, _ = generate_rays(cp2, 24, h, pix, smp, seed)
            if bucketed:
                rad = replay_mod.replay_bucketed(
                    sd2, cp2, 24, h, o, d, pix, smp, seed, depth, rec,
                    spec=spec,
                )
            else:
                rad = replay_mod.trace_replay(
                    sd2, o, d, pix, smp, seed, depth, rec
                )
            return jnp.mean(rad**2)

        params = G.extract_params(sd, cp)
        v0, g0 = jax.value_and_grad(functools.partial(loss, bucketed=False))(params)
        v1, g1 = jax.value_and_grad(functools.partial(loss, bucketed=True))(params)
        assert float(v0) == pytest.approx(float(v1), rel=1e-7)
        for k in ("tex_color", "mat_emission", "mat_fuzz", "cam_vfov",
                  "cam_look_from"):
            np.testing.assert_allclose(
                np.asarray(g1[k]), np.asarray(g0[k]), rtol=1e-5, atol=1e-7,
                err_msg=k,
            )

    def test_routed_by_render_rays_replay(self, monkeypatch):
        """render_rays_replay routes deep budgets through the bucketed
        replay (CRUCIBLE_GRAD_BUCKETS honored) and split=False forces the
        unsplit reference — the two must agree."""
        monkeypatch.setenv("CRUCIBLE_GRAD_BUCKETS", "4:1,8:2,0:1")
        sc = self._shell_scene()
        sd = sc.build()
        cp = sc.scene_cam.params()
        h = sc.scene_cam.image_height
        depth = 20
        pix = jnp.arange(24 * h, dtype=jnp.uint32)
        smp = jnp.zeros((24 * h,), jnp.uint32)
        seed = jnp.uint32(3)
        a = replay_mod.render_rays_replay(
            sd, cp, 24, h, pix, smp, seed, depth, split=True
        )
        b = replay_mod.render_rays_replay(
            sd, cp, 24, h, pix, smp, seed, depth, split=False
        )
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7)

    def test_two_level_record_matches_unsplit(self, monkeypatch):
        """The two-level record (full-width head + narrow re-record of deep
        survivors, replay.record_two_level) + bucketed replay must equal
        the unsplit replay in value (bit-exact) and gradients: the narrow
        re-record re-traces deep lanes from bounce 0, and decisions are a
        pure function of (pixel, sample, seed)."""
        import functools

        monkeypatch.setenv("CRUCIBLE_GRAD_BUCKETS", "4:1,0:1")
        monkeypatch.setenv("CRUCIBLE_RECORD_DEEP_DIV", "1")
        sc = self._shell_scene()
        sd = sc.build()
        cp = sc.scene_cam.params()
        h = sc.scene_cam.image_height
        depth = 20
        pix = jnp.tile(jnp.arange(24 * h, dtype=jnp.uint32), 2)
        smp = jnp.repeat(jnp.arange(2, dtype=jnp.uint32), 24 * h)
        seed = jnp.uint32(0)

        def loss(params, split):
            sd2, cp2 = G.apply_params(sd, cp, params)
            rad = replay_mod.render_rays_replay(
                sd2, cp2, 24, h, pix, smp, seed, depth, split=split
            )
            return jnp.mean(rad**2)

        params = G.extract_params(sd, cp)
        v0, g0 = jax.value_and_grad(functools.partial(loss, split=False))(params)
        v1, g1 = jax.value_and_grad(functools.partial(loss, split=True))(params)
        assert float(v0) == float(v1)
        for k in ("tex_color", "mat_emission", "mat_fuzz", "cam_vfov"):
            np.testing.assert_allclose(
                np.asarray(g1[k]), np.asarray(g0[k]), rtol=1e-5, atol=1e-7,
                err_msg=k,
            )

    def test_two_level_overflow_poisons(self):
        """Deep lanes beyond the narrow record's capacity poison with NaN."""
        from crucible_tpu.models.camera import generate_rays as gr

        sc = self._shell_scene()
        sd = sc.build()
        cp = sc.scene_cam.params()
        h = sc.scene_cam.image_height
        depth = 20
        pix = jnp.tile(jnp.arange(24 * h, dtype=jnp.uint32), 2)
        smp = jnp.repeat(jnp.arange(2, dtype=jnp.uint32), 24 * h)
        seed = jnp.uint32(0)
        o, d, _ = gr(cp, 24, h, pix, smp, seed)
        rh, rn, idxn, validn, ndeep = replay_mod.record_two_level(
            sd, cp, 24, h, pix, smp, seed, depth, head=4, div=100000
        )
        assert int(ndeep) > rn.shape[1]  # genuinely overflowing
        rad = replay_mod.replay_bucketed_2l(
            sd, cp, 24, h, o, d, pix, smp, seed, depth,
            rh, rn, idxn, validn, ndeep, spec=((4, 1), (0, 2)),
        )
        assert bool(jnp.isnan(rad).any())

    def test_overflow_poisons_loudly(self):
        """Survivors beyond a narrow bucket's static capacity must poison
        the radiance with NaN — loud, never silently truncated."""
        sc = self._shell_scene()
        sd = sc.build()
        cp = sc.scene_cam.params()
        h = sc.scene_cam.image_height
        depth = 20
        pix = jnp.tile(jnp.arange(24 * h, dtype=jnp.uint32), 2)
        smp = jnp.repeat(jnp.arange(2, dtype=jnp.uint32), 24 * h)
        seed = jnp.uint32(0)
        o, d, _ = generate_rays(cp, 24, h, pix, smp, seed)
        rec = replay_mod.trace_record(sd, o, d, pix, smp, seed, depth)
        rad = replay_mod.replay_bucketed(
            sd, cp, 24, h, o, d, pix, smp, seed, depth, rec,
            spec=((4, 1), (8, 2), (0, 4)),
        )
        assert bool(jnp.isnan(rad).any())


class TestTailOverflowGuard:
    def test_overflow_poisons_loudly(self):
        """When more lanes survive the split head than the static tail
        capacity, the differentiable split must return NaN (a loud failed
        finite-check downstream) — never a silently truncated radiance.
        Scene: camera inside a mirror sphere, so EVERY lane survives to
        max_depth."""
        sc = Scene.new_image(1.0, 32)
        sc.scene_cam.look_from((0, 0, 0))
        sc.scene_cam.look_at((0, 0, -1))
        sc.scene_cam.set_vfov(60.0)
        # Enclosing mirror: rays reflect forever (fuzz 0 keeps scatter
        # above the inner surface).
        sc.add_element(Sphere((0, 0, 0), 10.0, Metal((0.9, 0.9, 0.9), 0.0)), "shell")
        sd = sc.build()
        cp = sc.scene_cam.params()
        depth = 8
        # r=2048 lanes: past the 512-lane tail-budget floor, so capacity
        # 2 * max(512, r/4) = 1024 < r survivors.
        p = 32 * 32
        pix = jnp.tile(jnp.arange(p, dtype=jnp.uint32), 2)
        smp = jnp.repeat(jnp.arange(2, dtype=jnp.uint32), p)
        seed = jnp.uint32(0)
        o, d, _ = generate_rays(cp, 32, 32, pix, smp, seed)
        rec = replay_mod.trace_record(sd, o, d, pix, smp, seed, depth)
        depth_lane = np.asarray(
            ((np.asarray(rec) & replay_mod.F_ALIVE) > 0).sum(0)
        )
        assert (depth_lane == depth).all()  # everyone survives
        rad = replay_mod.replay_split(
            sd, o, d, pix, smp, seed, depth, rec,
            split_depth=2, long_div=4, early_exit=False,
        )
        # capacity = TAIL_PASSES * r/4 = r/2 < r survivors -> poisoned.
        assert bool(jnp.isnan(rad).any())
        # The forward (early-exit) variant keeps its full-width cond
        # fallback and stays exact/finite.
        rad_fwd = replay_mod.replay_split(
            sd, o, d, pix, smp, seed, depth, rec,
            split_depth=2, long_div=4, early_exit=True,
        )
        ref = replay_mod.trace_replay(sd, o, d, pix, smp, seed, depth, rec)
        np.testing.assert_allclose(
            np.asarray(rad_fwd), np.asarray(ref), rtol=1e-6, atol=1e-7
        )


class TestStructureRecord:
    """Structure-walk record passes (r5 final): scenes whose padded sphere
    table exceeds the forward cull crossover build a sphere BVH (static)
    or motion-unioned cluster chunks (animated) at scene build
    (SceneData.sph_perm/...); the record kernel walks the PERMUTED table
    and de-permutes winner ids through the table's id column (31), so
    records are BIT-identical to the brute record kernel — which keeps
    deep gradients available on multi-thousand-sphere scenes where the
    brute (N, T) quadratic exceeds VMEM."""

    def _scene(self, animated):
        sc = demo.book1_end_scene(width=32)
        if animated:
            from crucible_tpu.models.timeline import LERP, WORLD

            sc.translate_x(0.6, 1.0, LERP, WORLD, "large_dielectric")
            sc.scene_cam.frame = 6
        return sc

    @pytest.mark.parametrize("animated", [False, True])
    def test_structure_records_bit_match_brute(self, animated, monkeypatch):
        sd0 = self._scene(animated).build()
        monkeypatch.setenv("CRUCIBLE_RECORD_STRUCT_MIN", "64")
        sc1 = self._scene(animated)
        sd1 = sc1.build()
        assert sd0.sph_perm is None and sd1.sph_perm is not None
        if animated:
            assert sd1.sph_cbounds is not None and sd1.sph_nodes is None
        else:
            assert sd1.sph_nodes is not None and sd1.sph_cbounds is None
        cp = sc1.scene_cam.params()
        w, h = 32, sc1.scene_cam.image_height
        r = 1024
        pix = jnp.arange(r, dtype=jnp.uint32) % (w * h)
        smp = jnp.zeros((r,), jnp.uint32)
        seed = jnp.uint32(7)
        brute = np.asarray(
            replay_mod.trace_record_mega(
                sd0, cp, w, h, pix, smp, seed, 6, interpret=True
            )
        )
        struct = np.asarray(
            replay_mod.trace_record_mega(
                sd1, cp, w, h, pix, smp, seed, 6, interpret=True
            )
        )
        np.testing.assert_array_equal(brute, struct)
        # Fused record+radiance through the structure path too.
        rec_f, rad_f = replay_mod.trace_record_mega(
            sd1, cp, w, h, pix, smp, seed, 6, interpret=True, radiance=True
        )
        np.testing.assert_array_equal(np.asarray(rec_f), brute)
        _, rad_b = replay_mod.trace_record_mega(
            sd0, cp, w, h, pix, smp, seed, 6, interpret=True, radiance=True
        )
        np.testing.assert_array_equal(np.asarray(rad_f), np.asarray(rad_b))

    def test_big_brute_without_structure_routes_staged(self, monkeypatch):
        """A sphere table past the brute VMEM cap with no structure built
        (e.g. structure build disabled) must NOT claim mega-record support
        — it routes to the staged record instead of OOMing the kernel."""
        from crucible_tpu.models import render as render_mod

        sd = self._scene(False).build()
        assert sd.sph_perm is None
        monkeypatch.setattr(render_mod, "MEGA_MAX_BRUTE_ROWS", 64)
        assert not integrator.megakernel_record_supported(
            sd, self._scene(False).scene_cam.params()
        )
        monkeypatch.setenv("CRUCIBLE_RECORD_STRUCT_MIN", "64")
        sd2 = self._scene(False).build()
        assert sd2.sph_perm is not None
        assert integrator.megakernel_record_supported(
            sd2, self._scene(False).scene_cam.params()
        )


class TestReplayKernel:
    """In-Pallas replay step (ops/pallas/replay_kernel.py): the r5
    deep-gradient lever. Forward radiance must match the jnp replay (to
    f32/FMA association — CLAUDE.md: exact pallas-vs-XLA bit-matching is
    impossible, and sqrt at near-tangent discriminants amplifies it);
    the HAND-WRITTEN backward must match plain autodiff through the
    identical per-bounce math tightly (that comparison shares the
    association, so it isolates the custom-vjp wiring)."""

    def _setup(self, depth=8, r=1024 + 128, width=64):
        sc = demo.book1_end_scene(width=width)
        sd = sc.build()
        cp = sc.scene_cam.params()
        h = sc.scene_cam.image_height
        pix = jnp.arange(r, dtype=jnp.uint32) % (width * h)
        smp = jnp.zeros((r,), jnp.uint32)
        seed = jnp.uint32(7)
        o, d, _ = generate_rays(cp, width, h, pix, smp, seed)
        rec = replay_mod.trace_record(sd, o, d, pix, smp, seed, depth)
        table = integrator.make_sphere_table(sd)
        return sd, table, o, d, pix, smp, seed, rec

    def test_supported_predicates(self):
        from crucible_tpu.ops.pallas import replay_kernel as rk

        assert rk.supported(demo.book1_end_scene(width=32).build(), 512)
        assert not rk.supported(demo.earth(width=32).build(), 512)  # images
        assert not rk.supported(demo.load_teapot(width=32).build(), 512)
        sc = demo.smoke_scene(width=32)
        from crucible_tpu.models.timeline import LERP, WORLD

        sc.translate_x(0.6, 1.0, LERP, WORLD, "ball")
        sc.scene_cam.frame = 6
        assert not rk.supported(sc.build(), 512)  # animated
        assert not rk.supported(
            demo.book1_end_scene(width=32).build(), 4096
        )  # table too large for the (N, TILE) one-hot

    def test_forward_matches_jnp_replay(self):
        from crucible_tpu.ops.pallas import replay_kernel as rk

        sd, table, o, d, pix, smp, seed, rec = self._setup()
        ref = np.asarray(
            replay_mod.trace_replay(sd, o, d, pix, smp, seed, 8, rec)
        )
        got = np.asarray(
            rk.trace_replay_mega(
                table, o, d, pix, smp, seed, rec, interpret=True
            )
        )
        assert np.isfinite(got).all()
        np.testing.assert_allclose(got.mean(0), ref.mean(0), rtol=1e-3, atol=1e-3)
        close = np.isclose(got, ref, rtol=1e-3, atol=1e-3).all(axis=-1)
        assert close.mean() > 0.98, f"only {close.mean():.3f} lanes match"

    def test_backward_matches_identical_math_autodiff(self):
        """Kernel cotangents vs jax.grad through a pure-jnp loop over the
        SAME `_bounce` + exact row gathers — isolates the hand-written
        backward (phase-1 checkpointing, reverse vjp sweep, one-hot table
        cotangent) from association noise."""
        from crucible_tpu.ops.pallas import replay_kernel as rk
        from crucible_tpu.utils import rng as crng

        depth = 6
        sd, table, o, d, pix, smp, seed, rec = self._setup(depth=depth, r=1024)
        r = o.shape[0]
        wgt = jnp.asarray(
            np.random.default_rng(0).standard_normal((r, 3)), jnp.float32
        )

        def pure_loop(table, o, d):
            carry = tuple(
                x[None, :]
                for x in (o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2])
            )
            ones = jnp.ones((1, r), jnp.float32)
            carry = carry + (ones, ones, ones)
            acc = [jnp.zeros((1, r), jnp.float32)] * 3
            for it in range(depth):
                dec = rk._decode(rec[it][None, :])
                srow = jnp.take(table, dec["idx"][0], axis=0).T
                u1, u2, ud = crng.uniform3(pix, smp, jnp.uint32(3 + it), seed)
                carry, (dr, dg, db) = rk._bounce(
                    carry, srow, dec, u1[None, :], u2[None, :], ud[None, :],
                    True,
                )
                acc = [acc[0] + dr, acc[1] + dg, acc[2] + db]
            return jnp.stack([acc[0][0], acc[1][0], acc[2][0]], axis=1)

        def loss_pure(table, o, d):
            return jnp.sum(pure_loop(table, o, d) * wgt)

        def loss_kernel(table, o, d):
            rad = rk.trace_replay_mega(
                table, o, d, pix, smp, seed, rec, interpret=True
            )
            return jnp.sum(rad * wgt)

        lp, gp = jax.value_and_grad(loss_pure, argnums=(0, 1, 2))(table, o, d)
        lk, gk = jax.value_and_grad(loss_kernel, argnums=(0, 1, 2))(table, o, d)
        assert float(lp) == pytest.approx(float(lk), rel=1e-3)
        for name, a, b in zip(
            ("g_table", "g_o", "g_d"), gk, gp
        ):
            a, b = np.asarray(a), np.asarray(b)
            assert np.isfinite(a).all(), name
            scale = max(float(np.abs(b).max()), 1e-6)
            nd = np.abs(a - b) / scale
            # Near-tangent lanes (disc ~ 0) amplify 1-ulp association
            # differences through d(sqrt)/d(disc) into O(1) relative
            # gradient noise — both values are valid subgradients of
            # slightly different f32 functions. Require the bulk tight
            # and bound the outlier tail.
            frac = float((nd > 2e-4).mean())
            # Per-lane cotangents (g_o, g_d) concentrate the silhouette
            # noise one-lane-per-entry; the table cotangent averages it.
            cap = 0.005 if name == "g_table" else 0.02
            assert frac < cap, f"{name}: {frac:.4f} outlier fraction"
            assert float(nd.max()) < 0.1, f"{name}: max {nd.max():.4f}"

    def test_blocked_matches_legacy_bitwise(self):
        """The lane-blocked (SUB, LANES) layout is the same per-lane op
        sequence as the legacy (1, TILE) rows — radiance must be
        BIT-identical; table cotangents differ only in reduction order
        (per-sublane one-hot contractions sum in a different sequence)."""
        from crucible_tpu.ops.pallas import replay_kernel as rk

        sd, table, o, d, pix, smp, seed, rec = self._setup(
            depth=6, r=1024 + 128
        )
        a = np.asarray(
            rk.trace_replay_mega(
                table, o, d, pix, smp, seed, rec,
                interpret=True, blocked=False,
            )
        )
        b = np.asarray(
            rk.trace_replay_mega(
                table, o, d, pix, smp, seed, rec,
                interpret=True, blocked=True,
            )
        )
        np.testing.assert_array_equal(a, b)

        def loss(t, blocked):
            return jnp.sum(
                rk.trace_replay_mega(
                    t, o, d, pix, smp, seed, rec,
                    interpret=True, blocked=blocked,
                )
            )

        ga = np.asarray(jax.grad(lambda t: loss(t, False))(table))
        gb = np.asarray(jax.grad(lambda t: loss(t, True))(table))
        assert np.isfinite(gb).all()
        scale = max(float(np.abs(ga).max()), 1e-6)
        np.testing.assert_allclose(gb / scale, ga / scale, rtol=0, atol=1e-5)

    def test_accum_from_and_valid_mask(self):
        """Bucket semantics: head rows below accum_from update the carry
        only; invalid lanes replay to exactly zero (value AND cotangent)."""
        from crucible_tpu.ops.pallas import replay_kernel as rk

        depth = 6
        sd, table, o, d, pix, smp, seed, rec = self._setup(depth=depth, r=1024)
        r = o.shape[0]
        valid = jnp.arange(r) % 3 != 0
        thr0 = jnp.where(valid[:, None], jnp.ones((r, 3), jnp.float32), 0.0)
        ref = np.asarray(
            replay_mod.trace_replay(
                sd, o, d, pix, smp, seed, depth, rec,
                thr_in=thr0, accum_from=3,
            )
        )
        got = np.asarray(
            rk.trace_replay_mega(
                table, o, d, pix, smp, seed, rec,
                accum_from=3, valid=valid, interpret=True,
            )
        )
        v = np.asarray(valid)
        assert (got[~v] == 0).all() and (ref[~v] == 0).all()
        np.testing.assert_allclose(
            got[v].mean(0), ref[v].mean(0), rtol=1e-3, atol=1e-3
        )
        g = jax.grad(
            lambda t: jnp.sum(
                rk.trace_replay_mega(
                    t, o, d, pix, smp, seed, rec,
                    accum_from=3, valid=valid, interpret=True,
                )
            )
        )(table)
        assert np.isfinite(np.asarray(g)).all()

    def test_loss_and_grad_routing_on_off(self, monkeypatch):
        """End-to-end loss_and_grad with the kernel forced on equals the
        jnp replay to estimator tolerance, and routing honors the env."""
        sc = demo.book1_end_scene(width=48)
        sd = sc.build()
        cp = sc.scene_cam.params()
        w, h = 48, sc.scene_cam.image_height
        pix = jnp.arange(w * h, dtype=jnp.uint32)
        target = jnp.zeros((w * h, 3), jnp.float32)
        params = G.extract_params(sd, cp)
        kw = dict(width=w, height=h, spp=2, max_depth=16)

        monkeypatch.setenv("CRUCIBLE_REPLAY_KERNEL", "0")
        jax.clear_caches()
        l0, g0 = G.loss_and_grad(
            params, sd, cp, target, pix, jnp.uint32(3), **kw
        )
        monkeypatch.setenv("CRUCIBLE_REPLAY_KERNEL", "1")
        jax.clear_caches()
        l1, g1 = G.loss_and_grad(
            params, sd, cp, target, pix, jnp.uint32(3), **kw
        )
        jax.clear_caches()
        assert float(l0) == pytest.approx(float(l1), rel=1e-3)
        for key in ("mat_emission", "tex_color"):
            a, b = np.asarray(g0[key]), np.asarray(g1[key])
            scale = max(float(np.abs(a).max()), 1e-6)
            np.testing.assert_allclose(
                b / scale, a / scale, rtol=0, atol=5e-3, err_msg=key
            )

    def test_fd_albedo_with_kernel(self, monkeypatch):
        """The standard FD acceptance passes through the kernel path."""
        monkeypatch.setenv("CRUCIBLE_REPLAY_KERNEL", "1")
        jax.clear_caches()
        try:
            _fd_vs_grad(demo.smoke_scene(width=32), "tex_color")
        finally:
            jax.clear_caches()


class TestFusedRecordRadiance:
    """Fused record+radiance forward (r5): run_megakernel_record with
    radiance=True accumulates the forward radiance in the same loop that
    streams decisions, and render_rays_replay routes its value through the
    given-forward custom_vjp (no separate replay-forward dispatch). The
    primal must match the staged/tiled reference statistically and the
    gradients must match the non-fused kernel path through the loss
    cotangent."""

    def test_fused_routing_and_equivalence(self, monkeypatch):
        monkeypatch.setenv("CRUCIBLE_REPLAY_KERNEL", "1")
        jax.clear_caches()
        try:
            sc = demo.book1_end_scene(width=48)
            sd = sc.build()
            cp = sc.scene_cam.params()
            w, h = 48, sc.scene_cam.image_height
            pix = jnp.arange(w * h, dtype=jnp.uint32)
            smp = jnp.zeros((w * h,), jnp.uint32)
            seed = jnp.uint32(3)
            for depth in (8, 16):  # unsplit + two-level bucketed
                # Fused forward value == the record kernel's own radiance.
                rec, rad_mega = replay_mod.trace_record_mega(
                    sd, cp, w, h, pix, smp, seed, depth,
                    interpret=True, radiance=True,
                )
                got = replay_mod.render_rays_replay(
                    sd, cp, w, h, pix, smp, seed, depth, record_mode="mega"
                )
                ref = integrator.trace(
                    sd,
                    *generate_rays(cp, w, h, pix, smp, seed)[:2],
                    pix, smp, seed, depth,
                )
                got, ref = np.asarray(got), np.asarray(ref)
                assert np.isfinite(got).all()
                np.testing.assert_allclose(
                    got.mean(0), ref.mean(0), rtol=2e-3, atol=2e-3
                )
                # Records from the radiance mode are bit-identical to the
                # plain record mode (the decision math is untouched).
                rec_plain = replay_mod.trace_record_mega(
                    sd, cp, w, h, pix, smp, seed, depth, interpret=True
                )
                np.testing.assert_array_equal(
                    np.asarray(rec), np.asarray(rec_plain)
                )

                # Gradients: fused vs non-fused kernel path agree to the
                # loss-cotangent tolerance (the primal differs by mega-t vs
                # replay-t f32 association, ~1e-3 relative).
                def loss(sd_, fused):
                    mode = "mega" if fused else "staged"
                    r = replay_mod.render_rays_replay(
                        sd_, cp, w, h, pix, smp, seed, depth,
                        record_mode=mode,
                    )
                    return jnp.mean(r ** 2)

                gf = jax.grad(lambda s: loss(s, True), allow_int=True)(sd)
                gr = jax.grad(lambda s: loss(s, False), allow_int=True)(sd)
                for name in ("mat_emission",):
                    a = np.asarray(getattr(gf, name))
                    b = np.asarray(getattr(gr, name))
                    scale = max(float(np.abs(b).max()), 1e-6)
                    assert float(np.abs(a - b).max()) / scale < 0.02, name
        finally:
            jax.clear_caches()
