"""Decompose the fwd+bwd (north-star) time on TPU: where do the
milliseconds go at the bench config (book1, 768x432, 4 spp, depth 8)?

Stages timed separately (all jitted, compile excluded, block_until_ready):
  record      trace_record alone (fast non-diff forward -> decision ints)
  replay_fwd  trace_replay alone given records (differentiable primal)
  replay_bwd  value_and_grad of a scalar loss over trace_replay given
              records (isolates the backward from the record pass)
  full        grad.loss_and_grad (the production path: record + replay +
              backward, one jit)
  mega_fwd    the megakernel forward at the same ray count (the speed
              ceiling a record-mode megakernel could reach)
  onehot      one take_rows_mm (R, 512->32) fwd and fwd+bwd (the replay's
              per-bounce fetch primitive; 2 per bounce in the scan)

Usage: python tools/profile_grad.py   (ONE TPU job; run nothing else)
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from crucible_tpu import grad as G
from crucible_tpu.models import demo, integrator, replay
from crucible_tpu.models.camera import generate_rays
from crucible_tpu.ops.gather import take_rows_mm

W, H, SPP, DEPTH = 768, 432, 4, 8


def bench(name, fn, *args, n=3, rays=None):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / n
    row = {"stage": name, "seconds": round(dt, 4)}
    if rays:
        row["mrays_per_s"] = round(rays / dt / 1e6, 3)
    print(json.dumps(row), flush=True)
    return out


def main():
    print("devices:", jax.devices(), flush=True)
    sc = demo.book1_end_scene(width=400)
    sd = sc.build()
    cp = sc.scene_cam.params()
    params = G.extract_params(sd, cp)

    p = W * H
    rays = p * SPP
    pix = jnp.tile(jnp.arange(p, dtype=jnp.uint32), SPP)
    smp = jnp.repeat(jnp.arange(SPP, dtype=jnp.uint32), p)
    seed = jnp.uint32(1)
    o, d, _ = jax.jit(generate_rays, static_argnums=(1, 2))(cp, W, H, pix, smp, seed)

    rec_fn = jax.jit(
        lambda sd_, o_, d_: replay.trace_record(
            sd_, o_, d_, pix, smp, seed, DEPTH, use_pallas=True
        )
    )
    rec = bench("record", rec_fn, sd, o, d, rays=rays)

    rep_fn = jax.jit(
        lambda sd_, o_, d_, rc: replay.trace_replay(
            sd_, o_, d_, pix, smp, seed, DEPTH, rc
        )
    )
    bench("replay_fwd", rep_fn, sd, o, d, rec, rays=rays)

    def loss_replay(sd_, o_, d_, rc):
        rad = replay.trace_replay(sd_, o_, d_, pix, smp, seed, DEPTH, rc)
        return jnp.mean(rad**2)

    vg = jax.jit(jax.value_and_grad(loss_replay, argnums=0, allow_int=True))
    bench("replay_bwd", vg, sd, o, d, rec, rays=rays)

    def loss_replay_split(sd_, o_, d_, rc):
        rad = replay.replay_split(
            sd_, o_, d_, pix, smp, seed, DEPTH, rc,
            split_depth=replay.GRAD_SPLIT_DEPTH,
            long_div=replay.GRAD_LONG_DIV, early_exit=False,
        )
        return jnp.mean(rad**2)

    vg2 = jax.jit(jax.value_and_grad(loss_replay_split, argnums=0, allow_int=True))
    bench("replay_split_bwd", vg2, sd, o, d, rec, rays=rays)

    target = jnp.zeros((p, 3), jnp.float32)
    pix1 = jnp.arange(p, dtype=jnp.uint32)
    kw = dict(width=W, height=H, spp=SPP, max_depth=DEPTH, method="replay")

    def full(params_):
        return G.loss_and_grad(params_, sd, cp, target, pix1, seed, **kw)

    bench("full_loss_and_grad", full, params, rays=rays)

    # Megakernel forward ceiling at the same config.
    from crucible_tpu.models import render

    bench(
        "mega_fwd",
        lambda s: render.render_image_persistent(
            sd, cp, W, H, SPP, DEPTH, s, schedule="mega"
        ),
        jnp.uint32(1),
        rays=rays,
    )

    # One-hot fetch primitive.
    table = jax.jit(integrator.make_sphere_table)(sd)
    idx = jnp.asarray(np.random.default_rng(0).integers(0, 488, rays), jnp.int32)
    oh_fwd = jax.jit(lambda t: jnp.sum(take_rows_mm(t, idx)))
    bench("onehot_fwd", oh_fwd, table, rays=rays)
    oh_vg = jax.jit(jax.grad(lambda t: jnp.sum(take_rows_mm(t, idx) ** 2)))
    bench("onehot_fwd_bwd", oh_vg, table, rays=rays)


if __name__ == "__main__":
    main()
