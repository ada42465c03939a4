"""Timeline animation anchors ported from the reference's inline tests
(src/timeline/mod.rs:266-350) plus scene-animator integration checks."""

import numpy as np
import pytest

from crucible_tpu.models.timeline import LERP, LOCAL, NERP, WORLD, TransformTimeline


class TestScaleTrack:
    def test_nerp_scaling(self):
        # check_nerp_scaling (timeline/mod.rs:292-309): radius 1 sphere,
        # NERP radius->15 at t=5: before -> 1, at/after -> 15.
        tl = TransformTimeline(init_pos=(2.0, 3.0, 0.0), init_scale=1.0)
        tl.scale_r(15.0, 5.0, NERP)
        assert tl.scale_at(7.0)[0] == pytest.approx(15.0)
        assert tl.scale_at(3.15)[0] == pytest.approx(1.0)

    def test_lerp_scaling(self):
        # check_lerp_scaling (timeline/mod.rs:312-331): LERP to 15 @5 then
        # to 5 @10; at t=5 -> 15; at t=3.15 -> ~10 (ramping from init time
        # -0.1, tolerance 0.2 in the reference).
        tl = TransformTimeline(init_pos=(2.0, 3.0, 0.0), init_scale=1.0)
        tl.scale_r(15.0, 5.0, LERP)
        tl.scale_r(5.0, 10.0, LERP)
        assert tl.scale_at(5.0)[0] == pytest.approx(15.0)
        assert abs(tl.scale_at(3.15)[0] - 10.0) < 0.2
        # Second segment: at t=10 -> 5; midway ramps from 15.
        assert tl.scale_at(10.0)[0] == pytest.approx(5.0)
        assert 5.0 < tl.scale_at(7.5)[0] < 15.0

    def test_per_axis_scale_most_recent_wins(self):
        # A later scale_y key resets untouched axes to identity, matching
        # the reference's single-most-recent-matrix rule
        # (timeline/mod.rs:250-256).
        tl = TransformTimeline(init_scale=1.0)
        tl.scale_x(2.0, 1.0, NERP)
        tl.scale_y(3.0, 2.0, NERP)
        np.testing.assert_allclose(tl.scale_at(1.5), [2.0, 1.0, 1.0])
        np.testing.assert_allclose(tl.scale_at(2.5), [1.0, 3.0, 1.0])


class TestTranslateTrack:
    def test_nerp_translate(self):
        # check_nerp_translate (timeline/mod.rs:334-349).
        tl = TransformTimeline(init_pos=(2.0, 3.0, 1.0))
        tl.translate_x(1.0, 5.0, NERP, LOCAL)
        tl.translate_y(10.0, 3.0, NERP, LOCAL)
        np.testing.assert_allclose(tl.position_at(0.0)[:2], [2.0, 3.0])
        np.testing.assert_allclose(tl.position_at(5.0)[:2], [3.0, 13.0])

    def test_lerp_ramp(self):
        tl = TransformTimeline(init_pos=(0.0, 0.0, 0.0))
        tl.translate_x(10.0, 10.0, LERP, LOCAL)
        # Ramp runs from the init end time (-0.1) to the keyframe.
        assert tl.position_at(10.0)[0] == pytest.approx(10.0)
        assert tl.position_at(20.0)[0] == pytest.approx(10.0)
        assert 4.5 < tl.position_at(5.0)[0] < 5.5

    def test_world_space_targets_absolute(self):
        # World keys move TO the coordinate; delta = target - prev endpoint
        # (transform_builder.rs:365-428).
        tl = TransformTimeline(init_pos=(5.0, 0.0, 0.0))
        tl.translate_x(12.0, 2.0, LERP, WORLD)
        tl.translate_x(-3.0, 4.0, LERP, WORLD)
        assert tl.position_at(2.0)[0] == pytest.approx(12.0)
        assert tl.position_at(4.0)[0] == pytest.approx(-3.0)

    def test_translate_point_square_walk(self):
        # first_movie's camera walk (demo_movies.rs:32-70): world-space
        # waypoints visited in order.
        tl = TransformTimeline(init_pos=(0.0, 0.0, -12.0))
        for p, t in [
            ((12.0, 0.0, 0.0), 2.5),
            ((0.0, 0.0, 12.0), 5.0),
            ((-12.0, 0.0, 0.0), 7.5),
            ((0.0, 0.0, -12.0), 10.0),
        ]:
            tl.translate_point(p, t, LERP, WORLD)
        np.testing.assert_allclose(tl.position_at(2.5), [12, 0, 0], atol=1e-5)
        np.testing.assert_allclose(tl.position_at(5.0), [0, 0, 12], atol=1e-5)
        np.testing.assert_allclose(tl.position_at(10.0), [0, 0, -12], atol=1e-5)
        # Midway between waypoints: linear blend.
        np.testing.assert_allclose(tl.position_at(3.75), [6, 0, 6], atol=1e-5)

    def test_negative_keyframe_rejected(self):
        tl = TransformTimeline()
        with pytest.raises(AssertionError):
            tl.translate_x(1.0, -1.0, LERP, LOCAL)


class TestSceneAnimator:
    def _scene(self):
        from crucible_tpu.models.scene import Lambertian, Scene, Sphere

        sc = Scene.new_image(1.0, 32)
        sc.add_element(
            Sphere((0.0, 0.0, -2.0), 0.5, Lambertian.from_color((0.5, 0.5, 0.5))),
            "ball",
        )
        return sc

    def test_sphere_translate_and_scale_r(self):
        sc = self._scene()
        sc.translate_x(2.0, 1.0, LERP, LOCAL, "ball")
        sc.scale_r(0.25, 1.0, NERP, "ball")
        assert sc.is_animated
        sd = sc.build(t_open=1.0, t_close=1.0)
        el = sc.elements[0]
        np.testing.assert_allclose(el.timeline.position_at(1.0), [2.0, 0.0, -2.0])
        assert el.timeline.scale_at(1.0)[0] == pytest.approx(0.25)
        np.testing.assert_allclose(np.asarray(sd.sph_center[0]), [2.0, 0.0, -2.0])
        assert float(sd.sph_radius[0]) == pytest.approx(0.25)

    def test_type_checks(self):
        sc = self._scene()
        with pytest.raises(TypeError):
            sc.scale_x(2.0, 1.0, LERP, "ball")  # per-axis scale rejects spheres
        with pytest.raises(KeyError):
            sc.translate_x(1.0, 1.0, LERP, LOCAL, "missing")
        # scale_r on a mesh alias is rejected (scene_animator.rs:141-150 —
        # the check that makes the reference's moving_teapot demo panic).
        from crucible_tpu.models.scene import Metal

        sc.load_asset("teapot.obj", "pot", 0.1, (0, 0, 0), Metal((0.5, 0.5, 0.5), 0.0))
        with pytest.raises(TypeError):
            sc.scale_r(0.5, 1.0, LERP, "pot")

    def test_camera_walk_params(self):
        sc = self._scene()
        sc.cam_translate_point((12.0, 0.0, 0.0), 2.5, LERP, WORLD, "from")
        cam = sc.scene_cam
        cam.frame_rate = 24.0
        cam.frame = 60  # t = 2.5s
        cp = cam.params()
        assert cp.animated
        np.testing.assert_allclose(np.asarray(cp.look_from), [12, 0, 0], atol=1e-4)

    def test_shutter_deltas(self):
        sc = self._scene()
        sc.translate_x(4.8, 1.0, LERP, LOCAL, "ball")  # 4.8/1.1 units/s ramp
        # Frame 0 of a 24fps 180-degree shutter: window [0, 1/48].
        sd = sc.build(t_open=0.0, t_close=1.0 / 48.0)
        d = np.asarray(sd.sph_center_d[0])
        assert d[0] == pytest.approx((4.8 / 1.1) / 48.0, rel=1e-3)
