"""Cross-validation against the independent scalar NumPy oracle — the
BASELINE acceptance "rendered images allclose to CPU reference at matched
spp and seeds". Same RNG counters, same closed-form samplers, independent
code path (scalar f64 vs wavefront f32 JAX)."""

import numpy as np

from crucible_tpu.models import render
from crucible_tpu.models.scene import Dielectric, Lambertian, Metal, Scene, Sphere

from tests import oracle


def _both(scene_spheres, cam_kwargs, width=24, height=24, spp=4, depth=4, seed=0):
    sc = Scene.new_image(width / height, width)
    cam = sc.scene_cam
    cam.look_from(cam_kwargs["look_from"])
    cam.look_at(cam_kwargs["look_at"])
    cam.set_vfov(cam_kwargs["vfov_deg"])
    if cam_kwargs.get("defocus_deg"):
        cam.set_defocus_angle(cam_kwargs["defocus_deg"])
        cam.set_focus_dist(cam_kwargs.get("focus_dist", 10.0))
    osph = []
    for k, (center, radius, spec) in enumerate(scene_spheres):
        sc.add_element(Sphere(center, radius, spec), f"s{k}")
        if isinstance(spec, Lambertian):
            mat = dict(type=0, albedo=spec.texture.color, prob=spec.scatter_prob)
        elif isinstance(spec, Metal):
            mat = dict(type=1, albedo=spec.albedo, fuzz=spec.fuzz)
        else:
            mat = dict(type=2, ior=spec.refraction_index)
        osph.append(oracle.OracleSphere(center, radius, mat))

    got = render.render_image(sc, samples=spp, max_depth=depth, seed=seed)
    want = oracle.render(osph, cam_kwargs, width, height, spp, depth, seed)
    return np.asarray(got, np.float64), want


CAM = dict(look_from=(0.0, 0.5, 3.0), look_at=(0.0, 0.0, -1.0), vfov_deg=60.0)


class TestOracleAgreement:
    def test_lambertian_scene(self):
        got, want = _both(
            [
                ((0.0, 0.0, -1.0), 0.5, Lambertian.from_color((0.7, 0.3, 0.3))),
                ((0.0, -100.5, -1.0), 100.0, Lambertian.from_color((0.8, 0.8, 0.0))),
            ],
            CAM,
        )
        # f32 wavefront vs f64 scalar: tiny numeric drift can flip a
        # borderline hit on a handful of pixels; everything else matches.
        close = np.isclose(got, want, atol=2e-3).mean()
        assert close > 0.98, f"only {close:.3f} of values agree"
        np.testing.assert_allclose(got.mean(), want.mean(), atol=1e-3)

    def test_metal_and_glass(self):
        got, want = _both(
            [
                ((-0.6, 0.0, -1.0), 0.5, Metal((0.8, 0.8, 0.9), 0.1)),
                ((0.6, 0.0, -1.0), 0.5, Dielectric(1.5)),
                ((0.0, -100.5, -1.0), 100.0, Lambertian.from_color((0.5, 0.7, 0.4))),
            ],
            CAM,
            spp=4,
            depth=6,
        )
        close = np.isclose(got, want, atol=5e-3).mean()
        assert close > 0.95, f"only {close:.3f} of values agree"
        np.testing.assert_allclose(got.mean(), want.mean(), atol=3e-3)

    def test_defocus_camera(self):
        got, want = _both(
            [((0.0, 0.0, -1.0), 0.5, Lambertian.from_color((0.2, 0.6, 0.2)))],
            dict(
                look_from=(0.0, 0.0, 3.0),
                look_at=(0.0, 0.0, -1.0),
                vfov_deg=45.0,
                defocus_deg=2.0,
                focus_dist=4.0,
            ),
            spp=4,
        )
        close = np.isclose(got, want, atol=5e-3).mean()
        assert close > 0.95, f"only {close:.3f} of values agree"
