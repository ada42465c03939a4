"""Differentiable-rendering acceptance: finite-difference checks on albedo,
texels, emission, and camera parameters (BASELINE.json north star), plus
train-step smoke."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from crucible_tpu import grad as G
from crucible_tpu.models import demo
from crucible_tpu.models.scene import Emissive, Lambertian, Scene, Sphere


def _setup(scene, width=32, height=18, spp=4, depth=4):
    sd = scene.build()
    cp = scene.scene_cam.params()
    pix = jnp.arange(width * height, dtype=jnp.uint32)
    target = jnp.zeros((width * height, 3), jnp.float32)
    params = G.extract_params(sd, cp)
    kw = dict(width=width, height=height, spp=spp, max_depth=depth)
    return sd, cp, pix, target, params, kw


def _fd(params, key, idx, sd, cp, target, pix, kw, eps=1e-3):
    def loss_at(delta):
        p2 = dict(params)
        arr = np.asarray(params[key], np.float64).copy()
        arr[idx] += delta
        p2[key] = jnp.asarray(arr, jnp.float32)
        return float(G.l2_loss(p2, sd, cp, target, pix, jnp.uint32(0), **kw))

    return (loss_at(eps) - loss_at(-eps)) / (2 * eps)


class TestFiniteDifference:
    def test_albedo_gradient(self):
        sd, cp, pix, target, params, kw = _setup(demo.smoke_scene(width=32))
        _, grads = G.loss_and_grad(params, sd, cp, target, pix, jnp.uint32(0), **kw)
        g = np.asarray(grads["tex_color"])
        idx = np.unravel_index(np.argmax(np.abs(g)), g.shape)
        fd = _fd(params, "tex_color", idx, sd, cp, target, pix, kw)
        assert g[idx] == pytest.approx(fd, rel=2e-2)

    def test_emission_gradient(self):
        sc = Scene.new_image(1.0, 32)
        sc.scene_cam.look_from((0, 0, 2))
        sc.scene_cam.look_at((0, 0, 0))
        sc.scene_cam.set_vfov(40.0)
        sc.add_element(Sphere((0, 0, 0), 0.5, Emissive((1.0, 0.5, 0.2))), "light")
        sd, cp, pix, target, params, kw = _setup(sc)
        _, grads = G.loss_and_grad(params, sd, cp, target, pix, jnp.uint32(0), **kw)
        g = np.asarray(grads["mat_emission"])
        idx = np.unravel_index(np.argmax(np.abs(g)), g.shape)
        assert abs(g[idx]) > 0
        fd = _fd(params, "mat_emission", idx, sd, cp, target, pix, kw)
        assert g[idx] == pytest.approx(fd, rel=2e-2)

    def test_texel_gradient(self):
        # Image-texture texels: earth demo at tiny size.
        sc = demo.earth(width=24)
        sd, cp, pix, target, params, kw = _setup(sc, width=24, height=13, spp=2, depth=3)
        _, grads = G.loss_and_grad(params, sd, cp, target, pix, jnp.uint32(0), **kw)
        g_imgs = grads["tex_images"]
        assert len(g_imgs) == 1
        g = np.asarray(g_imgs[0])
        assert np.isfinite(g).all()
        assert np.abs(g).max() > 0  # visible texels receive gradient

    def test_camera_gradient_smooth_pixels(self):
        # Sky-only pixels are smooth in camera params; FD matches there
        # (boundary pixels carry undetached discrete terms — see
        # models/integrator.py gradient stance).
        sc = demo.smoke_scene(width=32)
        sd = sc.build()
        cp = sc.scene_cam.params()
        pix = jnp.arange(8, dtype=jnp.uint32)  # top rows: pure sky
        target = jnp.zeros((8, 3), jnp.float32)
        params = G.extract_params(sd, cp)
        kw = dict(width=32, height=18, spp=2, max_depth=3)
        _, grads = G.loss_and_grad(params, sd, cp, target, pix, jnp.uint32(0), **kw)
        fd = _fd(params, "cam_vfov", (), sd, cp, target, pix, kw, eps=1e-4)
        assert float(grads["cam_vfov"]) == pytest.approx(fd, rel=2e-2)

    def test_all_gradients_finite(self):
        for mk in (demo.smoke_scene, demo.book1_end_scene):
            sd, cp, pix, target, params, kw = _setup(mk(width=32))
            _, grads = G.loss_and_grad(params, sd, cp, target, pix, jnp.uint32(0), **kw)
            for k, leaf in grads.items():
                for arr in jax.tree_util.tree_leaves(leaf):
                    assert bool(jnp.isfinite(arr).all()), f"non-finite grad in {k}"


class TestTrainStep:
    def test_albedo_recovery_descends(self):
        """Inverse rendering smoke: optimize a wrong albedo toward a target
        rendered with the true albedo — loss must drop monotonically-ish."""
        w, h = 24, 24
        true = Scene.new_image(1.0, w)
        true.scene_cam.look_from((0, 0, 2))
        true.scene_cam.look_at((0, 0, 0))
        true.scene_cam.set_vfov(40.0)
        true.add_element(Sphere((0, 0, 0), 0.5, Lambertian.from_color((0.8, 0.2, 0.2))), "s")

        guess = Scene.new_image(1.0, w)
        guess.scene_cam.look_from((0, 0, 2))
        guess.scene_cam.look_at((0, 0, 0))
        guess.scene_cam.set_vfov(40.0)
        guess.add_element(Sphere((0, 0, 0), 0.5, Lambertian.from_color((0.3, 0.6, 0.6))), "s")

        sd_t = true.build()
        cp = true.scene_cam.params()
        pix = jnp.arange(w * h, dtype=jnp.uint32)
        kw = dict(width=w, height=h, spp=4, max_depth=3)
        target = G.render_pixels_mean(
            G.extract_params(sd_t, cp), sd_t, cp, pix, kw["width"], kw["height"], kw["spp"], kw["max_depth"], jnp.uint32(0)
        )

        sd_g = guess.build()
        params = G.extract_params(sd_g, cp)
        # Optimize ONLY the albedo table: unconstrained Adam on camera
        # parameters at this lr destabilizes the view (observed). NB
        # optax.masked passes unmasked grads through raw (ascent!) — use
        # multi_transform + set_to_zero to freeze.
        opt = optax.multi_transform(
            {"train": optax.adam(5e-2), "freeze": optax.set_to_zero()},
            {k: ("train" if k == "tex_color" else "freeze") for k in params},
        )
        step = G.make_train_step(opt, **kw)
        state = opt.init(params)
        losses = []
        for i in range(15):
            params, state, loss = step(
                params, state, sd_g, cp, target, pix, jnp.uint32(0)
            )
            losses.append(float(loss))
        assert losses[-1] < losses[0] * 0.35, f"loss did not descend: {losses}"


class TestCheckpoint:
    def test_round_trip(self, tmp_path):
        sc = demo.smoke_scene(width=16)
        sd = sc.build()
        cp = sc.scene_cam.params()
        params = G.extract_params(sd, cp)
        opt = optax.adam(1e-2)
        state = opt.init(params)
        p = tmp_path / "ckpt.npz"
        G.save_checkpoint(p, params, state, step=7)
        params2, state2, step = G.load_checkpoint(p)
        assert step == 7
        for a, b in zip(
            jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(params2)
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(
            jax.tree_util.tree_leaves(state), jax.tree_util.tree_leaves(state2)
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestAnimatedAndMeshGradients:
    """VERDICT r1 #6: gradients through animated scenes and triangle-mesh
    BVH scenes at production-shaped sizes (160x90 — no OOM: both the replay
    and the direct-AD path's O(R) winner-only VJPs, including the new
    hit_spheres_moving custom VJP, avoid (R, N, 3) rematerialization)."""

    def _animated_scene(self):
        from crucible_tpu.models.timeline import LERP, WORLD

        sc = demo.smoke_scene(width=160)
        sc.translate_x(2.0, 1.0, LERP, WORLD, "ball")
        sc.scene_cam.frame = 6
        return sc

    def test_animated_fd_replay(self):
        sc = self._animated_scene()
        sd, cp, pix, target, params, kw = _setup(sc, width=160, height=90, spp=2, depth=3)
        assert sd.animated
        kw["method"] = "replay"
        _, grads = G.loss_and_grad(params, sd, cp, target, pix, jnp.uint32(0), **kw)
        g = np.asarray(grads["tex_color"])
        idx = np.unravel_index(np.argmax(np.abs(g)), g.shape)
        fd = _fd(params, "tex_color", idx, sd, cp, target, pix, kw)
        assert g[idx] == pytest.approx(fd, rel=2e-2)

    def test_animated_ad_matches_replay(self):
        """Direct AD through hit_spheres_moving's O(R) custom VJP equals the
        replay estimator (same detached decisions, same interior tape)."""
        sc = self._animated_scene()
        sd, cp, pix, target, params, kw = _setup(sc, width=64, height=36, spp=2, depth=3)
        _, g_ad = G.loss_and_grad(
            params, sd, cp, target, pix, jnp.uint32(0), method="ad", **kw
        )
        _, g_rp = G.loss_and_grad(
            params, sd, cp, target, pix, jnp.uint32(0), method="replay", **kw
        )
        np.testing.assert_allclose(
            np.asarray(g_rp["tex_color"]), np.asarray(g_ad["tex_color"]),
            rtol=5e-3, atol=1e-6,
        )

    def test_mesh_fd_replay(self):
        sc = demo.load_teapot(width=160)
        sd, cp, pix, target, params, kw = _setup(sc, width=160, height=90, spp=2, depth=3)
        assert sd.use_bvh
        kw["method"] = "replay"
        _, grads = G.loss_and_grad(params, sd, cp, target, pix, jnp.uint32(0), **kw)
        g = np.asarray(grads["tex_color"])
        idx = np.unravel_index(np.argmax(np.abs(g)), g.shape)
        fd = _fd(params, "tex_color", idx, sd, cp, target, pix, kw)
        assert g[idx] == pytest.approx(fd, rel=2e-2)


class TestAccumulatedGradient:
    def test_accum_equals_mean_of_chunks(self):
        """loss_and_grad_accum over 2-sample windows equals the hand-
        averaged chunk gradients (one executable, sample0 traced)."""
        sc = demo.smoke_scene(width=24)
        sd, cp, pix, target, params, kw = _setup(
            sc, width=24, height=13, spp=2, depth=3
        )
        ls, gs = [], []
        for s0 in (0, 2):
            l, g = G.loss_and_grad(
                params, sd, cp, target, pix, jnp.uint32(0),
                sample0=jnp.uint32(s0), **kw,
            )
            ls.append(float(l))
            gs.append(g)
        la, ga = G.loss_and_grad_accum(
            params, sd, cp, target, pix, jnp.uint32(0),
            width=24, height=13, spp=4, max_depth=3, chunk_spp=2,
        )
        assert float(la) == pytest.approx(0.5 * (ls[0] + ls[1]), rel=1e-6)
        want = 0.5 * (
            np.asarray(gs[0]["tex_color"]) + np.asarray(gs[1]["tex_color"])
        )
        np.testing.assert_allclose(
            np.asarray(ga["tex_color"]), want, rtol=1e-6, atol=1e-9
        )

    def test_distinct_windows_differ(self):
        """sample0 really changes the RNG sample set."""
        sc = demo.smoke_scene(width=24)
        sd, cp, pix, target, params, kw = _setup(
            sc, width=24, height=13, spp=2, depth=3
        )
        l0, _ = G.loss_and_grad(
            params, sd, cp, target, pix, jnp.uint32(0), sample0=jnp.uint32(0), **kw
        )
        l1, _ = G.loss_and_grad(
            params, sd, cp, target, pix, jnp.uint32(0), sample0=jnp.uint32(2), **kw
        )
        assert float(l0) != float(l1)


class TestFrozenDecisionTraining:
    def test_frozen_records_match_inline(self):
        """loss_and_grad(..., rec=record_decisions(...)) must equal the
        normal path exactly at the recording params (same decisions, same
        tape) — the frozen-decision training contract."""
        sc = demo.smoke_scene(width=24)
        sd, cp, pix, target, params, kw = _setup(
            sc, width=24, height=13, spp=2, depth=4
        )
        rec = G.record_decisions(
            sd, cp, pix, jnp.uint32(0),
            width=24, height=13, spp=2, max_depth=4,
        )
        kw["method"] = "replay"
        l0, g0 = G.loss_and_grad(params, sd, cp, target, pix, jnp.uint32(0), **kw)
        l1, g1 = G.loss_and_grad(
            params, sd, cp, target, pix, jnp.uint32(0), rec=rec, **kw
        )
        assert float(l0) == float(l1)
        np.testing.assert_array_equal(
            np.asarray(g0["tex_color"]), np.asarray(g1["tex_color"])
        )

    def test_frozen_records_track_albedo_updates(self):
        """A few frozen-record gradient steps on albedo reduce the loss —
        the replay-only step is a usable optimizer step."""
        import optax

        sc = demo.smoke_scene(width=24)
        sd, cp, pix, target, params, kw = _setup(
            sc, width=24, height=13, spp=2, depth=4
        )
        kw["method"] = "replay"
        rec = G.record_decisions(
            sd, cp, pix, jnp.uint32(0),
            width=24, height=13, spp=2, max_depth=4,
        )
        opt = optax.adam(0.05)
        state = opt.init(params)
        losses = []
        for _ in range(5):
            loss, grads = G.loss_and_grad(
                params, sd, cp, target, pix, jnp.uint32(0), rec=rec, **kw
            )
            losses.append(float(loss))
            upd, state = opt.update(grads, state, params)
            params = jax.tree_util.tree_map(lambda p, u: p + u, params, upd)
        assert losses[-1] < losses[0]


class TestTrainDemoResume:
    """tools/train_demo.py (the end-to-end inverse-rendering demo): a run
    resumed from a mid-run checkpoint must be BIT-identical to the
    uninterrupted run — records, sample windows and optimizer state are
    pure functions of the step index and the checkpoint."""

    def _load(self):
        import importlib.util
        from pathlib import Path

        p = Path(__file__).parent.parent / "tools" / "train_demo.py"
        spec = importlib.util.spec_from_file_location("train_demo", p)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod

    def test_resumed_equals_uninterrupted(self, tmp_path):
        td = self._load()
        kw = dict(
            scene="earth", width=24, steps=4, spp=2, depth=3, target_spp=2,
            rerecord=2, ckpt_every=1, lr=5e-2, verbose=False,
        )
        p_full, l_full = td.run(out_dir=tmp_path / "full", resume=True, **kw)
        # Interrupted: 2 steps, then resume to 4 from the checkpoint.
        kw2 = dict(kw, steps=2)
        td.run(out_dir=tmp_path / "resumed", resume=True, **kw2)
        p_res, l_res = td.run(out_dir=tmp_path / "resumed", resume=True, **kw)
        assert [r["loss"] for r in l_res] == [r["loss"] for r in l_full]
        for k in p_full:
            for a, b in zip(
                jax.tree_util.tree_leaves(p_full[k]),
                jax.tree_util.tree_leaves(p_res[k]),
            ):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_loss_descends(self, tmp_path):
        td = self._load()
        _, losses = td.run(
            scene="earth", width=24, steps=6, spp=2, depth=3, target_spp=4,
            rerecord=3, ckpt_every=6, lr=8e-2, out_dir=tmp_path,
            resume=False, verbose=False,
        )
        assert losses[-1]["loss"] < losses[0]["loss"] * 0.7, losses


class TestOverflowRecovery:
    """Deep-replay capacity overflow must auto-recover (VERDICT r4 #4):
    the static lane-narrowing capacities NaN-poison loudly on enclosed /
    high-survivor scenes; the recovery ladder retries the poisoned chunk
    with widened capacities and finally the unsplit full-width replay,
    so a training run completes with DEFAULT knobs."""

    def _mirror_shell(self):
        from crucible_tpu.models.scene import Metal, Scene, Sphere

        sc = Scene.new_image(1.0, 32)
        sc.scene_cam.look_from((0, 0, 0))
        sc.scene_cam.look_at((0, 0, -1))
        sc.scene_cam.set_vfov(60.0)
        # Camera inside a perfect mirror sphere: EVERY lane survives to
        # max_depth, exceeding every narrowed capacity.
        sc.add_element(
            Sphere((0, 0, 0), 10.0, Metal((0.9, 0.9, 0.9), 0.0)), "shell"
        )
        sd = sc.build()
        cp = sc.scene_cam.params()
        p = 32 * 32
        pix = jnp.arange(p, dtype=jnp.uint32)
        target = jnp.zeros((p, 3), jnp.float32)
        params = G.extract_params(sd, cp)
        kw = dict(width=32, height=32, spp=2, max_depth=16)
        return sd, cp, pix, target, params, kw

    def test_default_chunk_poisons_and_ladder_recovers(self, capsys):
        sd, cp, pix, target, params, kw = self._mirror_shell()
        # The overflow injection: the default deep path NaN-poisons.
        loss0, _ = G.loss_and_grad(
            params, sd, cp, target, pix, jnp.uint32(0), **kw
        )
        assert not np.isfinite(float(loss0))
        # The ladder recovers with default knobs and warns loudly.
        loss1, g1 = G.loss_and_grad_recovering(
            params, sd, cp, target, pix, jnp.uint32(0), **kw
        )
        assert np.isfinite(float(loss1))
        for leaf in jax.tree_util.tree_leaves(g1):
            assert np.isfinite(np.asarray(leaf)).all()
        err = capsys.readouterr().err
        assert "retrying with wider" in err and "recovered" in err
        # The recovered value equals the explicit unsplit escape hatch.
        loss2, g2 = G.loss_and_grad(
            params, sd, cp, target, pix, jnp.uint32(0), grad_split=False,
            **kw,
        )
        assert float(loss1) == float(loss2)
        for a, b in zip(
            jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_accum_recovers_poisoned_chunks(self, capsys):
        sd, cp, pix, target, params, kw = self._mirror_shell()
        loss, g = G.loss_and_grad_accum(
            params, sd, cp, target, pix, jnp.uint32(0), chunk_spp=1, **kw
        )
        assert np.isfinite(float(loss))
        for leaf in jax.tree_util.tree_leaves(g):
            assert np.isfinite(np.asarray(leaf)).all()
        assert "recovering" in capsys.readouterr().err

    def test_train_step_recovering_descends(self):
        import optax
        from crucible_tpu.models.scene import Emissive, Metal, Scene, Sphere

        # Mirror shell + a small emitter inside: most lanes still bounce to
        # max_depth (overflow preserved) but the radiance is nonzero, so a
        # zero target gives the optimizer a slope (drive emission down).
        sc = Scene.new_image(1.0, 32)
        sc.scene_cam.look_from((0, 0, 0))
        sc.scene_cam.look_at((0, 0, -1))
        sc.scene_cam.set_vfov(60.0)
        sc.add_element(
            Sphere((0, 0, 0), 10.0, Metal((0.9, 0.9, 0.9), 0.0)), "shell"
        )
        sc.add_element(
            Sphere((0, 0, -3), 0.6, Emissive((2.0, 1.5, 1.0))), "light"
        )
        sd = sc.build()
        cp = sc.scene_cam.params()
        pix = jnp.arange(32 * 32, dtype=jnp.uint32)
        target = jnp.zeros((32 * 32, 3), jnp.float32)
        params = G.extract_params(sd, cp)
        # Overflow injection still holds for this scene too.
        l0, _ = G.loss_and_grad(
            params, sd, cp, target, pix, jnp.uint32(0),
            width=32, height=32, spp=2, max_depth=16,
        )
        assert not np.isfinite(float(l0))
        step = G.make_train_step(
            optax.adam(2e-2), 32, 32, 2, 16, recover=True
        )
        opt_state = optax.adam(2e-2).init(params)
        losses = []
        for i in range(3):
            params, opt_state, loss = step(
                params, opt_state, sd, cp, target, pix, jnp.uint32(i)
            )
            losses.append(float(loss))
        assert all(np.isfinite(losses))
        assert losses[-1] < losses[0]

    def test_ladder_raises_actionable_on_true_nan(self):
        """A NaN that ISN'T a capacity overflow must climb the whole
        ladder and raise with a message naming the knobs' limits."""
        sd, cp, pix, target, params, kw = self._mirror_shell()
        bad = dict(params)
        bad["tex_color"] = params["tex_color"].at[0].set(jnp.nan)
        with pytest.raises(FloatingPointError, match="NOT a lane-narrowing"):
            G.loss_and_grad_recovering(
                bad, sd, cp, target, pix, jnp.uint32(0), **kw
            )
