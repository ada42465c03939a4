"""Multi-chip render driver: pixels sharded over the device mesh.

User-facing counterpart of the test/driver-contract sharding (SURVEY.md
§2.7 TPU plan): the flat pixel grid shards over the mesh's ``dp`` axis
(NamedSharding), the scene/BVH/camera replicate into every chip's HBM, and
XLA partitions the jitted render; the framebuffer gathers over ICI on the
way out. Because the RNG is a pure counter hash (utils/rng.py), the sharded
image is bit-identical to the single-chip render.

Multi-host: call ``parallel.mesh.initialize_distributed`` first; the same
code then runs with a global mesh (ICI within a slice, DCN across hosts).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from crucible_tpu.models import integrator
from crucible_tpu.models.camera import CameraParams
from crucible_tpu.models.scene import Scene, SceneData
from crucible_tpu.parallel import mesh as mesh_mod
from crucible_tpu.utils import backend


@partial(jax.jit, static_argnames=("width", "height", "spp", "max_depth", "use_pallas"))
def _render_sharded(
    sd: SceneData,
    cp: CameraParams,
    pixel_ids,
    seed,
    *,
    width: int,
    height: int,
    spp: int,
    max_depth: int,
    use_pallas: bool,
):
    p = pixel_ids.shape[0]
    pix = jnp.tile(pixel_ids, spp)
    smp = jnp.repeat(jnp.arange(spp, dtype=jnp.uint32), p)
    rad = integrator.render_rays(
        sd, cp, width, height, pix, smp, seed, max_depth, use_pallas=use_pallas
    )
    return rad.reshape(spp, p, 3).mean(axis=0)


def render_image_sharded_mega(
    scene: Scene,
    mesh=None,
    samples: int | None = None,
    max_depth: int | None = None,
    seed: int | None = None,
) -> np.ndarray:
    """Multi-chip megakernel render: horizontal pixel BANDS shard over all
    mesh devices via shard_map; each device runs the persistent megakernel
    (ops/pallas/megakernel.py) on its band with GLOBAL pixel ids, so the
    sharded image is bit-identical to the single-chip megakernel render.
    Scene/camera replicate; the framebuffer gathers over ICI on the way out.

    Requires ``integrator.megakernel_supported(sd, cp)``; falls back to
    :func:`render_image_sharded` otherwise.
    """
    from jax.sharding import PartitionSpec as P

    if mesh is None:
        mesh = mesh_mod.make_mesh()
    sd = scene.build()
    cam = scene.scene_cam
    cp = cam.params()
    if not integrator.megakernel_supported(sd, cp):
        import sys

        print(
            "crucible_tpu: WARNING: scene not megakernel-eligible "
            "(image textures / equirect sky / animated mesh); "
            "render_image_sharded_mega falling back to the staged sharded "
            "path (~10x slower on real chips)",
            file=sys.stderr,
        )
        return render_image_sharded(scene, mesh, samples, max_depth, seed)
    w, h = cam.image_width, cam.image_height
    spp = samples if samples is not None else cam.samples
    depth = max_depth if max_depth is not None else cam.max_depth
    seed_v = jnp.uint32(seed if seed is not None else scene.seed)

    ndev = mesh.devices.size
    band_h = (h + ndev - 1) // ndev
    row0s = jnp.arange(ndev, dtype=jnp.int32) * band_h
    interpret = backend.pallas_interpret()

    def shard_fn(sd_, cp_, row0_, spp_, seed_):
        fb = integrator.trace_persistent_mega(
            sd_, cp_, w, h, spp_, depth, seed_,
            interpret=interpret, row0=row0_[0], band_height=band_h,
        )
        return fb

    axes = (mesh_mod.DP_AXIS, mesh_mod.SP_AXIS)
    fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P(), P(axes), P(), P()),
        out_specs=P(axes),
        check_vma=False,
    )
    fb = jax.jit(fn)(sd, cp, row0s, jnp.uint32(spp), seed_v)
    img = np.asarray(fb)[: w * h].reshape(h, w, 3) / np.float32(spp)
    return img


def render_image_sharded(
    scene: Scene,
    mesh=None,
    samples: int | None = None,
    max_depth: int | None = None,
    seed: int | None = None,
    use_pallas: bool = False,
) -> np.ndarray:
    """Render with pixels sharded across all devices of ``mesh`` (defaults
    to a 1-D mesh over every local device). Returns (H, W, 3) float32."""
    if mesh is None:
        mesh = mesh_mod.make_mesh()
    sd = scene.build()
    cam = scene.scene_cam
    cp = cam.params()
    w, h = cam.image_width, cam.image_height
    spp = samples if samples is not None else cam.samples
    depth = max_depth if max_depth is not None else cam.max_depth

    num_pixels = w * h
    dp = mesh.shape[mesh_mod.DP_AXIS] * mesh.shape[mesh_mod.SP_AXIS]
    pad = (-num_pixels) % dp
    pixel_ids = np.minimum(np.arange(num_pixels + pad, dtype=np.uint32), num_pixels - 1)

    sd_r = jax.device_put(sd, mesh_mod.replicated(mesh))
    cp_r = jax.device_put(cp, mesh_mod.replicated(mesh))
    pix_s = jax.device_put(jnp.asarray(pixel_ids), mesh_mod.ray_sharding(mesh))

    out = _render_sharded(
        sd_r,
        cp_r,
        pix_s,
        jnp.uint32(seed if seed is not None else scene.seed),
        width=w,
        height=h,
        spp=spp,
        max_depth=depth,
        use_pallas=use_pallas,
    )
    return np.asarray(out)[:num_pixels].reshape(h, w, 3)
