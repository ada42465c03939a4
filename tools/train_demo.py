"""End-to-end inverse-rendering demo (VERDICT r3 #8): recover texture
texels + solid albedos from a rendered target with FROZEN-DECISION
training steps, periodic re-records, and checkpoint/resume mid-run.

This exercises the full training story that previously only had unit
tests: record staleness (decisions re-recorded every ``rerecord`` steps
with a fresh sample window), sample-windowed minibatch gradients, optax
multi_transform masking (frozen leaves get set_to_zero, never raw
gradients — see CLAUDE.md AD hazards), and grad.save/load_checkpoint
resume whose trajectory is bit-identical to an uninterrupted run
(tests/test_grad.py::TestTrainDemoResume).

Usage:
    python tools/train_demo.py            # earth @ 1080p on the chip
    python tools/train_demo.py --steps 40 --width 1920

Artifacts under artifacts/train_demo/: losses.json (the committed loss
curve), ckpt.npz (resumable), recovered.png.
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

import numpy as np


def build(scene: str, width: int):
    from crucible_tpu.models import demo

    sc = getattr(demo, scene)(width=width)
    sd = sc.build()
    cp = sc.scene_cam.params()
    return sc, sd, cp


def scrambled_init(true_params):
    """Start from gray texels and mid-gray solid albedos — the parameters
    the optimization must recover."""
    import jax.numpy as jnp

    p = dict(true_params)
    p["tex_images"] = tuple(
        jnp.full_like(img, 0.5) for img in true_params["tex_images"]
    )
    p["tex_color"] = jnp.full_like(true_params["tex_color"], 0.5)
    return p


TRAINABLE = ("tex_images", "tex_color")


def make_optimizer(lr: float):
    """adam on the trainable leaves, set_to_zero on everything else
    (optax.masked would pass frozen grads RAW — AD hazard, CLAUDE.md)."""
    import optax

    def label(params):
        return {k: ("train" if k in TRAINABLE else "freeze") for k in params}

    return optax.multi_transform(
        {"train": optax.adam(lr), "freeze": optax.set_to_zero()}, label
    )


def run(
    scene: str = "earth",
    width: int = 1920,
    steps: int = 30,
    spp: int = 4,
    depth: int = 8,
    target_spp: int = 16,
    rerecord: int = 10,
    ckpt_every: int = 10,
    lr: float = 5e-2,
    out_dir: str | Path = "artifacts/train_demo",
    resume: bool = True,
    seed: int = 123,
    verbose: bool = True,
):
    """-> (params, losses list). Deterministic: a run resumed from any
    checkpoint produces bit-identical parameters and losses to an
    uninterrupted run (records and sample windows are pure functions of
    the step index)."""
    import jax
    import jax.numpy as jnp

    from crucible_tpu import grad as G

    sc, sd, cp = build(scene, width)
    w, h = sc.scene_cam.image_width, sc.scene_cam.image_height
    pix = jnp.arange(w * h, dtype=jnp.uint32)
    seed_t = jnp.uint32(seed)
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    ckpt = out_dir / "ckpt.npz"
    losses_path = out_dir / "losses.json"

    true_params = G.extract_params(sd, cp)
    # Target: the ground-truth render the optimization must reproduce
    # (its OWN sample window, disjoint from every training window).
    target = G.render_pixels_mean(
        true_params, sd, cp, pix, w, h, target_spp, depth, seed_t,
        sample0=jnp.uint32(1 << 20),
    )
    jax.block_until_ready(target)

    params = scrambled_init(true_params)
    optimizer = make_optimizer(lr)
    opt_state = optimizer.init(params)
    start = 0
    losses = []
    if resume and ckpt.exists():
        params, opt_state, start = G.load_checkpoint(ckpt)
        losses = json.loads(losses_path.read_text())[:start]
        if verbose:
            print(f"resumed from {ckpt} at step {start}")

    kw = dict(width=w, height=h, spp=spp, max_depth=depth, method="replay")
    rec = None
    rec_epoch = -1
    for step in range(start, steps):
        t0 = time.time()
        epoch = step // rerecord
        if rec is None or epoch != rec_epoch:
            # Fresh sample window per record epoch; decisions recorded at
            # the CURRENT params (geometry/camera — identical to true here,
            # radiometric leaves don't affect decisions).
            sd_cur, cp_cur = G.apply_params(sd, cp, params)
            rec = G.record_decisions(
                sd_cur, cp_cur, pix, seed_t,
                width=w, height=h, spp=spp, max_depth=depth,
                sample0=jnp.uint32(epoch * spp),
            )
            rec_epoch = epoch
        loss, grads = G.loss_and_grad(
            params, sd, cp, target, pix, seed_t,
            sample0=jnp.uint32(epoch * spp), rec=rec, **kw,
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        loss = float(loss)
        losses.append(
            {"step": step, "loss": loss, "seconds": round(time.time() - t0, 3)}
        )
        if verbose:
            print(json.dumps(losses[-1]), flush=True)
        if (step + 1) % ckpt_every == 0 or step + 1 == steps:
            G.save_checkpoint(ckpt, params, opt_state, step + 1)
            losses_path.write_text(json.dumps(losses, indent=0))

    # Recovered-image artifact.
    try:
        from crucible_tpu.io.image import write_png
        from crucible_tpu.models import render

        img = G.render_pixels_mean(
            params, sd, cp, pix, w, h, spp, depth, seed_t,
            sample0=jnp.uint32(1 << 21),
        )
        write_png(
            out_dir / "recovered.png",
            render.to_u8(np.asarray(img).reshape(h, w, 3)),
        )
    except Exception as e:  # artifact only — never fail the run for it
        print(f"recovered.png skipped: {e}")
    return params, losses


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="earth")
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--spp", type=int, default=4)
    ap.add_argument("--depth", type=int, default=8)
    ap.add_argument("--rerecord", type=int, default=10)
    ap.add_argument("--ckpt-every", type=int, default=10)
    ap.add_argument("--lr", type=float, default=5e-2)
    ap.add_argument("--out", default="artifacts/train_demo")
    ap.add_argument("--no-resume", action="store_true")
    args = ap.parse_args()
    _, losses = run(
        scene=args.scene, width=args.width, steps=args.steps, spp=args.spp,
        depth=args.depth, rerecord=args.rerecord, ckpt_every=args.ckpt_every,
        lr=args.lr, out_dir=args.out, resume=not args.no_resume,
    )
    print(json.dumps({"final_loss": losses[-1]["loss"], "steps": len(losses)}))


if __name__ == "__main__":
    main()
