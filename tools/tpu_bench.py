"""Consolidated TPU performance harness — run ONE of these at a time.

Runs the full measurement matrix in a single process (compiles amortize,
no overlapping jobs to wedge the tunnel) and appends JSON lines to
tools/tpu_results.jsonl.

Usage: python tools/tpu_bench.py [quick|full|micro]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

RESULTS = Path(__file__).parent / "tpu_results.jsonl"


def log(**kw):
    kw["ts"] = time.strftime("%H:%M:%S")
    print(json.dumps(kw), flush=True)
    with open(RESULTS, "a") as f:
        f.write(json.dumps(kw) + "\n")


def micro():
    """In-loop primitive costs at 1M lanes."""
    R = 1 << 20
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, 512, R), jnp.int32)
    pix = jnp.asarray(rng.integers(0, 90000, R), jnp.uint32)
    table = jnp.ones((512,))
    fb = jnp.zeros((90000, 3), jnp.float32)
    contrib = jnp.ones((R, 3), jnp.float32)
    from crucible_tpu.utils import rng as crng

    def timeloop(name, bodyfn, x0, n=30):
        @jax.jit
        def loop(n, x):
            return jax.lax.while_loop(
                lambda s: s[0] < n, lambda s: (s[0] + 1, bodyfn(s[1])), (0, x)
            )[1]

        jax.block_until_ready(loop(2, x0))
        t0 = time.time()
        jax.block_until_ready(loop(2, x0))
        base = time.time() - t0
        t0 = time.time()
        jax.block_until_ready(loop(n + 2, x0))
        log(bench=name, ms_per_iter=round(1000 * (time.time() - t0 - base) / n, 3))

    x0 = jnp.zeros((R,), jnp.float32)
    timeloop("u32_hash_pcg4d", lambda x: x + crng.uniform1(pix, 3, 5, 7), x0)
    timeloop("u32_mul_only", lambda x: x + ((pix * np.uint32(1664525)) >> np.uint32(8)).astype(jnp.float32) * 1e-9, x0)
    timeloop("gather_512table", lambda x: x + jnp.take(table, idx), x0)
    timeloop("scatter_add_90K", lambda fb_: fb_.at[pix].add(contrib), fb)
    timeloop("transcendental_sincos", lambda x: jnp.sin(x) + jnp.cos(x) * 1e-9 + x, x0)


def quick(width=400, spps=(32, 100), schedules=("mega", "pixel", "queue")):
    from crucible_tpu.models import demo, render

    sc = demo.book1_end_scene(width=width)
    sd = sc.build()
    cp = sc.scene_cam.params()
    w, h = sc.scene_cam.image_width, sc.scene_cam.image_height
    for schedule in schedules:
        # spp is traced: this warmup compiles the ONE executable that the
        # timed runs reuse (timings below are pure execution).
        render.render_image_persistent(sd, cp, w, h, 2, 50, 0, schedule=schedule)
        for spp in spps:
            t0 = time.time()
            img = render.render_image_persistent(
                sd, cp, w, h, spp, 50, 1, schedule=schedule
            )
            dt = time.time() - t0
            log(
                bench=f"book1_{width}w",
                schedule=schedule,
                spp=spp,
                seconds=round(dt, 2),
                mrays_per_s=round(w * h * spp / dt / 1e6, 2),
                mean=round(float(img.mean()), 4),
            )


def demos(width=400, spp=32, depth=50):
    """One number per demo family (all through the auto schedule)."""
    from crucible_tpu.models import demo, render

    for name, mk, w_ in (
        ("book1", demo.book1_end_scene, width),
        ("teapot", demo.load_teapot, width),
        ("earth", demo.earth, width),
        ("garden", demo.garden_skybox, 1920),
    ):
        sc = mk(width=w_)
        sd = sc.build()
        cp = sc.scene_cam.params()
        w, h = sc.scene_cam.image_width, sc.scene_cam.image_height
        # Warm up at the MEASURED spp: the record schedule's chunk_spp is a
        # static jit arg derived from spp, so a cheap 2-spp warmup compiles
        # a different executable and the timed run pays the real compile.
        render.render_image_persistent(sd, cp, w, h, spp, depth, 0)
        t0 = time.time()
        img = render.render_image_persistent(sd, cp, w, h, spp, depth, 0)
        dt = time.time() - t0
        log(
            bench=f"demo_{name}_{w_}w",
            spp=spp,
            seconds=round(dt, 2),
            mrays_per_s=round(w * h * spp / dt / 1e6, 2),
            mean=round(float(img.mean()), 4),
        )


def grad(
    configs=(
        (192, 108, 4, 8),
        (384, 216, 4, 8),
        (768, 432, 4, 8),
        (1920, 1080, 4, 8),  # 8.3M rays/step: records 530 MB, chunked one-hots
    )
):
    """fwd+bwd loss_and_grad throughput (north-star metric component):
    replay vs direct-AD at growing pixel batches on book1."""
    from crucible_tpu import grad as G
    from crucible_tpu.models import demo

    sc = demo.book1_end_scene(width=400)
    sd = sc.build()
    cp = sc.scene_cam.params()
    params = G.extract_params(sd, cp)
    for method in ("replay", "ad"):
        for (w, h, spp, depth) in configs:
            if method == "ad" and w > 192:
                continue  # direct AD at large batches is known-slow; skip
            pix = jnp.arange(w * h, dtype=jnp.uint32)
            target = jnp.zeros((w * h, 3), jnp.float32)
            kw = dict(width=w, height=h, spp=spp, max_depth=depth, method=method)
            loss, g = G.loss_and_grad(params, sd, cp, target, pix, jnp.uint32(0), **kw)
            jax.block_until_ready(g)
            t0 = time.time()
            loss, g = G.loss_and_grad(params, sd, cp, target, pix, jnp.uint32(1), **kw)
            jax.block_until_ready(g)
            dt = time.time() - t0
            log(
                bench=f"fwd_bwd_{method}_{w}x{h}x{spp}spp_d{depth}",
                seconds=round(dt, 3),
                mrays_per_s=round(w * h * spp / dt / 1e6, 3),
                loss=round(float(loss), 5),
            )


def leafsweep(width=400, spp=32, depth=50, sizes=(32, 48, 64, 96, 128)):
    """Teapot BVH leaf-size sweep through the megakernel. With BATCHED leaf
    tests, leaf flops per tested-triangle are constant while node count
    halves per doubling — measures where the scalar node walk stops
    dominating (VERDICT r1 #3)."""
    from crucible_tpu.models import demo, render

    for ls in sizes:
        sc = demo.load_teapot(width=width)
        sd = sc.build(leaf_size=ls)
        cp = sc.scene_cam.params()
        w, h = sc.scene_cam.image_width, sc.scene_cam.image_height
        render.render_image_persistent(sd, cp, w, h, 2, depth, 0)
        t0 = time.time()
        img = render.render_image_persistent(sd, cp, w, h, spp, depth, 0)
        dt = time.time() - t0
        log(
            bench=f"teapot_leaf{ls}_{width}w",
            spp=spp,
            seconds=round(dt, 2),
            mrays_per_s=round(w * h * spp / dt / 1e6, 2),
            mean=round(float(img.mean()), 4),
        )


def teapotx(width=400, spp=32, depth=50):
    """Teapot traversal experiment matrix: median vs SAH builds across leaf
    sizes, plus a mesh-hidden run that isolates the kernel's NON-traversal
    cost (sphere stage + shading + regen at the same tile schedule)."""
    from crucible_tpu.models import demo, render

    def run(tag, sd, cp, w, h):
        render.render_image_persistent(sd, cp, w, h, 2, depth, 0)
        t0 = time.time()
        img = render.render_image_persistent(sd, cp, w, h, spp, depth, 0)
        dt = time.time() - t0
        log(bench=f"teapotx_{tag}", spp=spp, seconds=round(dt, 3),
            mrays_per_s=round(w * h * spp / dt / 1e6, 2),
            mean=round(float(img.mean()), 4))

    for method in ("median", "sah"):
        for ls in (64, 128, 256):
            sc = demo.load_teapot(width=width)
            sd = sc.build(leaf_size=ls, bvh_method=method)
            cp = sc.scene_cam.params()
            w, h = sc.scene_cam.image_width, sc.scene_cam.image_height
            run(f"{method}{ls}", sd, cp, w, h)
    sc = demo.load_teapot(width=width)
    sc.hide_element("teapot")
    sd = sc.build()
    cp = sc.scene_cam.params()
    w, h = sc.scene_cam.image_width, sc.scene_cam.image_height
    run("hidden", sd, cp, w, h)


def nestedx(width=400, spp=32, depth=50):
    """Nested-checker record-schedule throughput at real nesting depth
    (VERDICT r3 weak #6): textures.value resolves max_nest checker levels
    in the replay shading."""
    from crucible_tpu.models import demo, render

    for nest in (1, 2, 3):
        sc = demo.nested_checkers(width=width, nest=nest)
        sd = sc.build()
        cp = sc.scene_cam.params()
        w, h = sc.scene_cam.image_width, sc.scene_cam.image_height
        render.render_image_persistent(sd, cp, w, h, spp, depth, 0)
        t0 = time.time()
        img = render.render_image_persistent(sd, cp, w, h, spp, depth, 0)
        dt = time.time() - t0
        log(
            bench=f"nested{nest}_{width}w", spp=spp, seconds=round(dt, 2),
            mrays_per_s=round(w * h * spp / dt / 1e6, 2),
            mean=round(float(img.mean()), 4),
        )


def mxufetch(width=400, spp=32, depth=50):
    """One point of the MXU-fetch check (CRUCIBLE_MXU_FETCH is an
    import-time env knob — run one process per setting):
        CRUCIBLE_MXU_FETCH=0 python tools/tpu_bench.py mxufetch
        CRUCIBLE_MXU_FETCH=1 python tools/tpu_bench.py mxufetch
    Renders book1 through the megakernel, logs throughput AND the image
    sha256 — the two settings must produce IDENTICAL hashes (the one-hot
    contraction is bit-exact; see megakernel.py MXU_FETCH)."""
    import hashlib

    from crucible_tpu.models import demo, render
    from crucible_tpu.ops.pallas import megakernel as mk

    sc = demo.book1_end_scene(width=width)
    sd = sc.build()
    cp = sc.scene_cam.params()
    w, h = sc.scene_cam.image_width, sc.scene_cam.image_height
    render.render_image_persistent(sd, cp, w, h, 2, depth, 0, schedule="mega")
    best = None
    for rep in range(2):
        t0 = time.time()
        img = render.render_image_persistent(
            sd, cp, w, h, spp, depth, 1, schedule="mega"
        )
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    sha = hashlib.sha256(np.ascontiguousarray(np.asarray(img))).hexdigest()[:16]
    log(
        bench=f"mxufetch_{int(mk.MXU_FETCH)}_{width}w",
        spp=spp, seconds=round(best, 3),
        mrays_per_s=round(w * h * spp / best / 1e6, 2),
        sha=sha, mean=round(float(img.mean()), 5),
    )


def mxurec(w=1920, h=1080, spp=4, depth=8):
    """Record-kernel MXU-fetch A/B (CRUCIBLE_MXU_FETCH_REC, import-time):
    one process per setting; logs record-pass seconds + records sha256 —
    shas must be identical (records feed gradients)."""
    import hashlib

    from crucible_tpu.models import demo, replay
    from crucible_tpu.ops.pallas import megakernel as mk

    sc = demo.book1_end_scene(width=400)
    sd = sc.build()
    cp = sc.scene_cam.params()
    pix = jnp.tile(jnp.arange(w * h, dtype=jnp.uint32), spp)
    smp = jnp.repeat(jnp.arange(spp, dtype=jnp.uint32), w * h)
    seed = jnp.uint32(1)
    rec_f = jax.jit(
        lambda sd_, cp_: replay.trace_record_mega(
            sd_, cp_, w, h, pix, smp, seed, depth
        )
    )
    rec = rec_f(sd, cp)
    float(np.asarray(rec[0, 0]))
    best = None
    for _ in range(2):
        t0 = time.time()
        rec = rec_f(sd, cp)
        float(np.asarray(rec[0, 0]))
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    # Full fetch once for the sha (off the timed path).
    sha = hashlib.sha256(np.ascontiguousarray(np.asarray(rec))).hexdigest()[:16]
    log(
        bench=f"mxurec_{int(mk.MXU_FETCH_REC)}_d{depth}",
        seconds=round(best, 3),
        mrays_per_s=round(w * h * spp / best / 1e6, 2),
        sha=sha,
    )


def teapot1(width=400, spp=32, depth=50):
    """ONE teapot megakernel point for the (leaf, NODE_WIN, MAX_LEAVES)
    joint sweep (VERDICT r3 #6). NODE_WIN/MAX_LEAVES are import-time env
    knobs, so each point runs in its own process:
        CRUCIBLE_NODE_WIN=16 CRUCIBLE_MAX_LEAVES=4 SWEEP_LEAF=32 \\
            python tools/tpu_bench.py teapot1"""
    import os

    from crucible_tpu.models import demo, render
    from crucible_tpu.ops.pallas import megakernel as mk

    leaf = int(os.environ.get("SWEEP_LEAF", "64"))
    sc = demo.load_teapot(width=width)
    sd = sc.build(leaf_size=leaf)
    cp = sc.scene_cam.params()
    w, h = sc.scene_cam.image_width, sc.scene_cam.image_height
    render.render_image_persistent(sd, cp, w, h, 2, depth, 0)
    best = None
    for rep in range(2):
        t0 = time.time()
        img = render.render_image_persistent(sd, cp, w, h, spp, depth, 1 + rep)
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    log(
        bench=(
            f"teapot1_leaf{leaf}_win{mk.NODE_WIN}_ml{mk.MAX_LEAVES}"
            + ("_uncond" if mk.UNCOND_LEAVES else "")
            + ("_woop" if mk.WOOP else "")
        ),
        spp=spp, seconds=round(best, 3),
        mrays_per_s=round(w * h * spp / best / 1e6, 2),
        mean=round(float(img.mean()), 4),
    )


def earthprof(width=400, spp=32, depth=50):
    """Split the earth demo's record-schedule cost: record kernel vs replay
    vs live-row count, steady state (one chunk, compiled out of the timing)."""
    from crucible_tpu.models import demo, replay
    from crucible_tpu.models.camera import generate_rays
    from crucible_tpu.models import integrator

    sc = demo.earth(width=width)
    sd = sc.build()
    cp = sc.scene_cam.params()
    w, h = sc.scene_cam.image_width, sc.scene_cam.image_height
    p = w * h
    chunk_spp = int(max(1, min(spp, (1 << 28) // (8 * depth * p))))
    pix = jnp.tile(jnp.arange(p, dtype=jnp.uint32), chunk_spp)
    smp = jnp.repeat(jnp.arange(chunk_spp, dtype=jnp.uint32), p)
    seed = jnp.uint32(0)

    rec_f = jax.jit(
        lambda: replay.trace_record_mega(sd, cp, w, h, pix, smp, seed, depth)
    )
    rec = jax.block_until_ready(rec_f())
    t0 = time.time()
    jax.block_until_ready(rec_f())
    rec_s = time.time() - t0

    live = int(
        np.asarray(jnp.sum(jnp.any((rec & replay.F_ALIVE) > 0, axis=1)))
    )
    o, d, _ = generate_rays(cp, w, h, pix, smp, seed)

    rp = jax.jit(
        lambda rc: replay.trace_replay(
            sd, o, d, pix, smp, seed, depth, rc, early_exit=True
        )
    )
    jax.block_until_ready(rp(rec))
    t0 = time.time()
    jax.block_until_ready(rp(rec))
    rp_s = time.time() - t0
    log(
        bench=f"earthprof_{width}w",
        chunk_spp=chunk_spp,
        lanes=int(pix.shape[0]),
        record_s=round(rec_s, 3),
        replay_s=round(rp_s, 3),
        live_rows=live,
        implied_mrays=round(p * chunk_spp / (rec_s + rp_s) / 1e6, 2),
    )


def gradprof(w=1920, h=1080, spp=4, depth=8):
    """Split loss_and_grad cost: record kernel vs replay forward vs the
    full fwd+bwd, on book1 at the bench config."""
    from crucible_tpu import grad as G
    from crucible_tpu.models import demo, replay
    from crucible_tpu.models.camera import generate_rays

    sc = demo.book1_end_scene(width=400)
    sd = sc.build()
    cp = sc.scene_cam.params()
    params = G.extract_params(sd, cp)
    pix0 = jnp.arange(w * h, dtype=jnp.uint32)
    pix = jnp.tile(pix0, spp)
    smp = jnp.repeat(jnp.arange(spp, dtype=jnp.uint32), w * h)
    seed = jnp.uint32(0)

    def timeit(name, fn):
        jax.block_until_ready(fn())
        t0 = time.time()
        jax.block_until_ready(fn())
        dt = time.time() - t0
        log(bench=f"gradprof_{name}", seconds=round(dt, 3),
            mrays_per_s=round(w * h * spp / dt / 1e6, 2))
        return dt

    # NOTE: the record array (D, R) must be a jit ARGUMENT, not a closure —
    # closed-over arrays embed in the HLO as literals and a 265 MB constant
    # blows the tunnel's remote-compile request limit (HTTP 413).
    rec_f = jax.jit(
        lambda sd_, cp_: replay.trace_record_mega(
            sd_, cp_, w, h, pix, smp, seed, depth
        )
    )
    timeit("record", lambda: rec_f(sd, cp))
    rc = rec_f(sd, cp)

    def fwd(sd_, rc_):
        o, d, _ = generate_rays(cp, w, h, pix, smp, seed)
        return replay.trace_replay(sd_, o, d, pix, smp, seed, depth, rc_)

    jfwd = jax.jit(fwd)
    timeit("replay_fwd", lambda: jfwd(sd, rc))

    def split_loss(sd_, rc_):
        o, d, _ = generate_rays(cp, w, h, pix, smp, seed)
        rad = replay.replay_split(
            sd_, o, d, pix, smp, seed, depth, rc_,
            split_depth=replay.GRAD_SPLIT_DEPTH,
            long_div=replay.GRAD_LONG_DIV, early_exit=False,
        )
        return jnp.mean(rad ** 2)

    jsplit = jax.jit(split_loss)
    timeit("replay_split_fwd", lambda: jsplit(sd, rc))
    jsplit_vg = jax.jit(jax.value_and_grad(split_loss, allow_int=True))
    timeit("replay_split_bwd", lambda: jsplit_vg(sd, rc))

    def unsplit_loss(sd_, rc_):
        o, d, _ = generate_rays(cp, w, h, pix, smp, seed)
        rad = replay.trace_replay(sd_, o, d, pix, smp, seed, depth, rc_)
        return jnp.mean(rad ** 2)

    juns_vg = jax.jit(jax.value_and_grad(unsplit_loss, allow_int=True))
    timeit("replay_unsplit_bwd", lambda: juns_vg(sd, rc))

    target = jnp.zeros((w * h, 3), jnp.float32)
    kw = dict(width=w, height=h, spp=spp, max_depth=depth, method="replay")
    timeit(
        "loss_and_grad",
        lambda: G.loss_and_grad(params, sd, cp, target, pix0, seed, **kw)[1],
    )


def fetchbench(r=1 << 20, n=512, c=32):
    """Winner-row fetch strategies: one-hot matmul at HIGHEST vs HIGH
    precision vs jnp.take row gather, fwd and fwd+bwd."""
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, n, r), jnp.int32)
    table = jnp.asarray(rng.standard_normal((n, c)), jnp.float32)
    cols = jnp.arange(n, dtype=jnp.int32)[None, :]

    def mm(prec):
        def f(tab):
            onehot = (idx[:, None] == cols).astype(jnp.float32)
            return jnp.dot(onehot, tab, precision=prec).sum()
        return f

    def gather(tab):
        return jnp.take(tab, idx, axis=0).sum()

    for name, f in (
        ("mm_highest", mm(jax.lax.Precision.HIGHEST)),
        ("mm_high", mm(jax.lax.Precision.HIGH)),
        ("take_rows", gather),
    ):
        for mode, g in (("fwd", jax.jit(f)), ("grad", jax.jit(jax.grad(f)))):
            jax.block_until_ready(g(table))
            t0 = time.time()
            for _ in range(5):
                out = g(table)
            jax.block_until_ready(out)
            dt = (time.time() - t0) / 5
            log(bench=f"fetch_{name}_{mode}", ms=round(1000 * dt, 2),
                r=r, n=n, c=c)
    # exactness: HIGH vs HIGHEST for one-hot operands
    a = jnp.dot((idx[:512, None] == cols).astype(jnp.float32), table,
                precision=jax.lax.Precision.HIGH)
    b = jnp.take(table, idx[:512], axis=0)
    log(bench="fetch_high_exact", max_abs_diff=float(jnp.abs(a - b).max()))


def frozen(w=1920, h=1080, spp=4, depth=8, steps=5):
    """Frozen-decision training step rate: record once, run replay-only
    gradient steps (grad.record_decisions + loss_and_grad(rec=...))."""
    from crucible_tpu import grad as G
    from crucible_tpu.models import demo

    sc = demo.book1_end_scene(width=400)
    sd = sc.build()
    cp = sc.scene_cam.params()
    params = G.extract_params(sd, cp)
    pix = jnp.arange(w * h, dtype=jnp.uint32)
    target = jnp.zeros((w * h, 3), jnp.float32)
    kw = dict(width=w, height=h, spp=spp, max_depth=depth, method="replay")

    t0 = time.time()
    rec = G.record_decisions(sd, cp, pix, jnp.uint32(0),
                             width=w, height=h, spp=spp, max_depth=depth)
    int(np.asarray(rec[0, 0]))  # forced fetch
    rec_s = time.time() - t0
    loss, g = G.loss_and_grad(
        params, sd, cp, target, pix, jnp.uint32(0), rec=rec, **kw
    )
    float(loss)  # forced D2H fetch: block_until_ready alone can no-op
    # through the axon tunnel (queued executions drain into the NEXT
    # timing window); a scalar fetch of the last loss is a real barrier.
    t0 = time.time()
    for _ in range(steps):
        loss, g = G.loss_and_grad(
            params, sd, cp, target, pix, jnp.uint32(0), rec=rec, **kw
        )
    float(loss)
    dt = (time.time() - t0) / steps
    log(
        bench=f"fwd_bwd_frozen_{w}x{h}x{spp}spp_d{depth}",
        record_s=round(rec_s, 3),
        step_seconds=round(dt, 3),
        mrays_per_s=round(w * h * spp / dt / 1e6, 3),
        loss=round(float(loss), 5),
    )


def gradprof50(w=1920, h=1080, spp=4, depth=50):
    """Decompose the DEEP-budget (depth-50) gradient chunk on book1 —
    the r4 target (VERDICT r3 #1). Times, per piece: the d50 record pass,
    the full-width head-8 fwd+bwd, the r3 carry-handoff split fwd/fwd+bwd,
    and the depth-bucketed replay fwd/fwd+bwd at candidate bucket specs.
    Also logs the lane depth distribution (who pays for deep rows)."""
    from crucible_tpu import grad as G
    from crucible_tpu.models import demo, replay
    from crucible_tpu.models.camera import generate_rays

    sc = demo.book1_end_scene(width=400)
    sd = sc.build()
    cp = sc.scene_cam.params()
    rays = w * h * spp
    pix = jnp.tile(jnp.arange(w * h, dtype=jnp.uint32), spp)
    smp = jnp.repeat(jnp.arange(spp, dtype=jnp.uint32), w * h)
    seed = jnp.uint32(1)

    def timeit(name, fn, *args, n=1):
        out = fn(*args)
        jax.block_until_ready(out)
        # Forced D2H fetch ends every timed window (tunnel no-op guard).
        t0 = time.time()
        for _ in range(n):
            out = fn(*args)
        x = jax.tree_util.tree_leaves(out)[0]
        # Slice ON DEVICE before fetching — np.asarray(big_array) would
        # drag the whole buffer through the tunnel into the timed window
        # (1.66 GB for the d50 records = ~88 s of pure transfer).
        float(np.asarray(x[(0,) * x.ndim] if x.ndim else x))
        dt = (time.time() - t0) / n
        log(bench=f"gradprof50_{name}", seconds=round(dt, 3),
            mrays_per_s=round(rays / dt / 1e6, 2))
        return out

    rec_f = jax.jit(
        lambda sd_, cp_: replay.trace_record_mega(
            sd_, cp_, w, h, pix, smp, seed, depth
        )
    )
    rec = timeit("record_d50", rec_f, sd, cp)

    # Lane depth distribution — sets the bucket capacities honestly.
    dl = jnp.sum(((rec & replay.F_ALIVE) > 0).astype(jnp.int32), axis=0)
    hist = {
        f"gt{k}": int(np.asarray(jnp.sum(dl > k)))
        for k in (0, 2, 4, 6, 8, 12, 16, 24, 32)
    }
    log(bench="gradprof50_depth_dist", lanes=int(pix.shape[0]), **hist)

    o, d, _ = jax.jit(generate_rays, static_argnums=(1, 2))(cp, w, h, pix, smp, seed)

    def head8_loss(sd_, o_, d_, rc):
        rad = replay.trace_replay(sd_, o_, d_, pix, smp, seed, 8, rc[:8])
        return jnp.mean(rad**2)

    vg_h = jax.jit(jax.value_and_grad(head8_loss, argnums=0, allow_int=True))
    timeit("head8_bwd", vg_h, sd, o, d, rec)

    def split_loss(sd_, o_, d_, rc):
        rad = replay.replay_split(
            sd_, o_, d_, pix, smp, seed, depth, rc,
            split_depth=replay.GRAD_DEEP_SPLIT_DEPTH,
            long_div=replay.GRAD_DEEP_LONG_DIV, early_exit=False,
        )
        return jnp.mean(rad**2)

    jsplit = jax.jit(split_loss)
    timeit("r3split_fwd", jsplit, sd, o, d, rec)
    vg_s = jax.jit(jax.value_and_grad(split_loss, argnums=0, allow_int=True))
    timeit("r3split_bwd", vg_s, sd, o, d, rec)

    for tag, spec in (
        ("b8_8_32", ((8, 1), (16, 8), (0, 32))),
        ("b4_4_16_64", ((4, 1), (8, 4), (16, 16), (0, 64))),
        ("b8_16", ((8, 1), (0, 16))),
    ):
        def bloss(sd_, cp_, rc, spec=spec):
            o_, d_, _ = generate_rays(cp_, w, h, pix, smp, seed)
            rad = replay.replay_bucketed(
                sd_, cp_, w, h, o_, d_, pix, smp, seed, depth, rc,
                spec=spec,
            )
            return jnp.mean(rad**2)

        jb = jax.jit(bloss)
        timeit(f"bucket_{tag}_fwd", jb, sd, cp, rec)
        vg_b = jax.jit(jax.value_and_grad(bloss, argnums=(0, 1), allow_int=True))
        out = timeit(f"bucket_{tag}_bwd", vg_b, sd, cp, rec)
        v = float(np.asarray(out[0]))
        log(bench=f"bucket_{tag}_loss", loss=round(v, 6),
            finite=bool(np.isfinite(v)))


def gradprof50b(w=1920, h=1080, spp=4, depth=50):
    """Round-4 follow-up: record-depth scaling (is the full-width d50
    record the chunk's dominant cost?), the two-level record, and the
    production deep chunk through the new bucketed path."""
    from crucible_tpu import grad as G
    from crucible_tpu.models import demo, replay

    sc = demo.book1_end_scene(width=400)
    sd = sc.build()
    cp = sc.scene_cam.params()
    params = G.extract_params(sd, cp)
    rays = w * h * spp
    pix0 = jnp.arange(w * h, dtype=jnp.uint32)
    pix = jnp.tile(pix0, spp)
    smp = jnp.repeat(jnp.arange(spp, dtype=jnp.uint32), w * h)
    seed = jnp.uint32(1)

    def timeit(name, fn, *args, n=1):
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.time()
        for _ in range(n):
            out = fn(*args)
        x = jax.tree_util.tree_leaves(out)[0]
        float(np.asarray(x[(0,) * x.ndim] if x.ndim else x))
        dt = (time.time() - t0) / n
        log(bench=f"gradprof50b_{name}", seconds=round(dt, 3),
            mrays_per_s=round(rays / dt / 1e6, 2))
        return out

    for dep in (8, 50):
        rec_f = jax.jit(
            lambda sd_, cp_, dep=dep: replay.trace_record_mega(
                sd_, cp_, w, h, pix, smp, seed, dep
            )
        )
        timeit(f"record_d{dep}", rec_f, sd, cp)

    two_f = jax.jit(
        lambda sd_, cp_: replay.record_two_level(
            sd_, cp_, w, h, pix, smp, seed, depth, head=8
        )
    )
    out = timeit("record_2l", two_f, sd, cp)
    log(bench="gradprof50b_2l_ndeep", n_deep=int(np.asarray(out[4])),
        r_n=int(out[1].shape[1]))

    target = jnp.zeros((w * h, 3), jnp.float32)
    kw = dict(width=w, height=h, spp=spp, max_depth=depth, method="replay")
    chunk = timeit(
        "chunk_bwd",
        lambda: G.loss_and_grad(
            params, sd, cp, target, pix0, seed, sample0=jnp.uint32(0), **kw
        ),
    )
    finite = all(
        bool(jnp.isfinite(x).all())
        for x in jax.tree_util.tree_leaves(chunk[1])
    )
    log(bench="gradprof50b_chunk_finite", finite=finite,
        loss=round(float(chunk[0]), 6))


def gradprof50c(w=1920, h=1080, spp=4, depth=50):
    """Bucket/record shape sweep for the deep chunk: head depth, narrow
    record divisor, tail divisor (env knobs re-read per variant;
    jax.clear_caches() forces retraces since the env is not in jit keys)."""
    import os

    from crucible_tpu import grad as G
    from crucible_tpu.models import demo

    sc = demo.book1_end_scene(width=400)
    sd = sc.build()
    cp = sc.scene_cam.params()
    params = G.extract_params(sd, cp)
    rays = w * h * spp
    pix0 = jnp.arange(w * h, dtype=jnp.uint32)
    target = jnp.zeros((w * h, 3), jnp.float32)
    seed = jnp.uint32(1)
    kw = dict(width=w, height=h, spp=spp, max_depth=depth, method="replay")

    variants = (
        ("h8d16", "8:1,0:16", "8"),         # r4 sweep baseline
        ("h6d16", "6:1,0:16", "8"),         # shallower head
        ("h6d24", "6:1,0:24", "16"),        # + tighter tail/narrow record
        ("h8d24", "8:1,0:24", "16"),
        ("h6d16r12", "6:1,0:16", "12"),     # shipped default
        # Head 4 + a mid bucket ON the narrow record (compactions there are
        # cheap): thin 1.27x narrow-record margin — measurement only.
        ("h4m8d8", "4:1,8:8,0:16", "8"),
        ("h6m16d12", "6:1,16:16,0:32", "12"),
    )
    only = set(sys.argv[2:])  # resume a partial sweep: pass variant tags
    for tag, buckets, rdiv in variants:
        if only and tag not in only:
            continue
        os.environ["CRUCIBLE_GRAD_BUCKETS"] = buckets
        os.environ["CRUCIBLE_RECORD_DEEP_DIV"] = rdiv
        jax.clear_caches()
        out = None
        for attempt in range(3):
            try:
                out = G.loss_and_grad(
                    params, sd, cp, target, pix0, seed,
                    sample0=jnp.uint32(0), **kw,
                )
                break
            except Exception as e:  # transient tunnel/remote-compile hiccups
                log(bench=f"gradprof50c_{tag}_retry", attempt=attempt,
                    err=str(e)[:120])
                time.sleep(20)
        if out is None:
            continue
        float(out[0])  # forced fetch: block_until_ready can no-op (tunnel)
        t0 = time.time()
        for _ in range(2):
            out = G.loss_and_grad(
                params, sd, cp, target, pix0, seed, sample0=jnp.uint32(0), **kw
            )
        loss = float(out[0])
        dt = (time.time() - t0) / 2
        finite = all(
            bool(jnp.isfinite(x).all())
            for x in jax.tree_util.tree_leaves(out[1])
        )
        log(bench=f"gradprof50c_{tag}", seconds=round(dt, 3),
            mrays_per_s=round(rays / dt / 1e6, 2), loss=round(loss, 6),
            finite=finite)
    os.environ.pop("CRUCIBLE_GRAD_BUCKETS", None)
    os.environ.pop("CRUCIBLE_RECORD_DEEP_DIV", None)


def grad500(w=1920, h=1080, spp=500, depth=50, chunk=4):
    """The STATED north-star fwd+bwd config (BASELINE.json): book1
    1920x1080 @ 500 spp, max_depth 50 — measured as 125 accumulated
    4-spp chunk gradients (grad.loss_and_grad_accum; sample0 traced, one
    executable)."""
    from crucible_tpu import grad as G
    from crucible_tpu.models import demo

    sc = demo.book1_end_scene(width=400)
    sd = sc.build()
    cp = sc.scene_cam.params()
    params = G.extract_params(sd, cp)
    pix = jnp.arange(w * h, dtype=jnp.uint32)
    target = jnp.zeros((w * h, 3), jnp.float32)
    # Warm-up: compile the fused accumulation executable the loop reuses
    # (one single-chunk accum — identical statics). An earlier warmup that
    # compiled plain loss_and_grad leaked a ~40 s compile into the window.
    akw = dict(width=w, height=h, spp=chunk, max_depth=depth, chunk_spp=chunk)
    l, g = G.loss_and_grad_accum(params, sd, cp, target, pix, jnp.uint32(0), **akw)
    float(l)  # forced fetch: block_until_ready can no-op via the tunnel
    # Per-chunk steady-state (diagnoses loop overhead vs the chunk itself).
    t0 = time.time()
    for i in range(3):
        l, g = G.loss_and_grad_accum(
            params, sd, cp, target, pix, jnp.uint32(1 + i), **akw
        )
    float(l)
    log(
        bench="grad500_chunk_steady",
        seconds=round((time.time() - t0) / 3, 3),
        mrays_per_s=round(w * h * chunk * 3 / (time.time() - t0) / 1e6, 2),
    )
    t0 = time.time()
    loss, grads = G.loss_and_grad_accum(
        params, sd, cp, target, pix, jnp.uint32(1),
        width=w, height=h, spp=spp, max_depth=depth, chunk_spp=chunk,
    )
    loss = float(loss)  # forced fetch BEFORE dt: block_until_ready can
    # no-op through the tunnel and leak queued work past the timer
    dt = time.time() - t0
    finite = all(
        bool(jnp.isfinite(x).all()) for x in jax.tree_util.tree_leaves(grads)
    )
    log(
        bench="fwd_bwd_northstar_1080p_500spp_d50",
        seconds=round(dt, 1),
        mrays_per_s=round(w * h * spp / dt / 1e6, 3),
        chunks=spp // chunk,
        loss=round(loss, 5),
        grads_finite=finite,
    )


def stress(width=400, spp=32, depth=50):
    """Multi-tile sphere-table scaling (VERDICT r3 #5): book1 x N grid at
    N ~ {0.5k, 2k, 8k} spheres through the megakernel, cluster culling
    off vs on — the r3 'culling is slower' verdict was N=512-only."""
    from crucible_tpu.models import demo, render

    for copies in (1, 4, 16):
        sc = demo.sphere_stress(width=width, copies=copies)
        sd = sc.build()
        cp = sc.scene_cam.params()
        w, h = sc.scene_cam.image_width, sc.scene_cam.image_height
        rows = int(sd.sph_center.shape[0])
        for cull in (False, True):
            if not cull and rows > render.MEGA_MAX_BRUTE_ROWS:
                # Brute (N, T) buffers exceed scoped VMEM past ~4k rows
                # (measured OOM at 7808) — chunked is the only megakernel
                # option at this scale.
                log(bench=f"stress_n{rows}_cull0", rows=rows,
                    skipped="brute infeasible past MEGA_MAX_BRUTE_ROWS")
                continue
            render.render_image_persistent(
                sd, cp, w, h, 2, depth, 0, schedule="mega", cull=cull
            )
            t0 = time.time()
            img = render.render_image_persistent(
                sd, cp, w, h, spp, depth, 1, schedule="mega", cull=cull
            )
            dt = time.time() - t0
            log(
                bench=f"stress_n{rows}_cull{int(cull)}",
                copies=copies,
                rows=rows,
                spp=spp,
                seconds=round(dt, 2),
                mrays_per_s=round(w * h * spp / dt / 1e6, 2),
                mean=round(float(img.mean()), 4),
            )


def golden(out_json=None):
    """REAL-CHIP golden harness (VERDICT r3 #3): render all six demo worlds
    at the stored reference configs (tools/make_tpu_goldens.py: 64px, 8 spp,
    depth 8, seed 0) through each world's PRODUCTION schedule on the TPU and
    assert statistical equality with the CPU tiled references. A Mosaic
    lowering change that alters numerics fails HERE even though CI's
    interpret-mode goldens pass. Writes a JSON verdict (driver artifact:
    TPU_GOLDEN_r{N}.json); exits non-zero naming the drifted config."""
    from pathlib import Path

    from crucible_tpu.models import demo, render

    sys.path.insert(0, str(Path(__file__).parent))
    import make_tpu_goldens as mg

    npz = Path(__file__).parent.parent / "tests" / "goldens" / "golden_tpu_v1.npz"
    want_all = np.load(npz)
    depth = 8
    results = []
    ok_all = True

    def check(name, img, want, spp):
        nonlocal ok_all
        d = np.abs(img - want)
        scale = max(1.0, float(want.max()))
        # Same samples, same decisions — only f32 association and rare
        # ulp-flipped silhouette samples differ (tests/test_golden.py
        # bounds): no pixel beyond ~one flipped sample, thin flip tail,
        # tight mean. (Teapot runs 32 spp since r5 — its 8-spp flip tail
        # sat at 99% of the bound, VERDICT r4 #6.)
        checks = {
            "max_lt_2_over_spp": float(d.max()) < 2.0 * scale / spp,
            "fliptail_lt_2pct": float((d > 0.05 * scale).mean()) < 0.02,
            "mean_lt_3em3": float(d.mean()) < 3e-3 * scale,
        }
        ok = all(checks.values())
        ok_all = ok_all and ok
        row = dict(
            config=name, ok=ok, spp=spp,
            d_max=round(float(d.max()), 5), d_mean=round(float(d.mean()), 6),
            flip_frac=round(float((d > 0.05 * scale).mean()), 5),
            scale=round(scale, 3), **checks,
        )
        results.append(row)
        log(bench=f"golden_{name}", **row)

    for name in want_all.files:
        if name == mg.DEEP_KEY:
            continue
        want = want_all[name]
        h, w, _ = want.shape
        spp = mg.WORLD_SPP[name]
        sc = getattr(demo, name)(width=w)
        sd = sc.build()
        cp = sc.scene_cam.params()
        img = np.asarray(
            render.render_image_persistent(sd, cp, w, h, spp, depth, 0)
        )
        check(name, img, want, spp)

    # Depth-50 config through the DEEP gradient path's forward (two-level
    # record + bucketed replay; on the chip the buckets run the in-Pallas
    # replay kernel) — the headline deep machinery, image-checked
    # (VERDICT r4 #6).
    img = mg.deep_replay_image(mg.DEEP_WORLD[1], mg.DEEP_WORLD[2],
                               mg.DEEP_WORLD[3])
    check(mg.DEEP_KEY, img, want_all[mg.DEEP_KEY], mg.DEEP_WORLD[2])

    verdict = {
        "ok": ok_all, "depth": depth, "configs": results,
        "gradcheck": gradcheck(standalone=False),
    }
    ok_all = ok_all and verdict["gradcheck"]["ok"]
    verdict["ok"] = ok_all
    if out_json is None:
        out_json = Path(__file__).parent.parent / "TPU_GOLDEN_r05.json"
    with open(out_json, "w") as f:
        json.dump(verdict, f, indent=1)
    print(json.dumps({"golden_verdict": ok_all, "out": str(out_json)}))
    if not ok_all:
        drifted = [r["config"] for r in results if not r["ok"]]
        if not verdict["gradcheck"]["ok"]:
            drifted.append(
                "gradcheck:" + ",".join(verdict["gradcheck"]["failed"])
            )
        raise SystemExit(f"golden drift in: {drifted}")


def gradcheck(standalone=True):
    """ON-CHIP gradient golden (VERDICT r4 #5): replay-vs-direct-AD
    gradient agreement plus FD spot-checks (albedo + one texel) at small
    configs, on the real chip. Failure names the drifted parameter.
    Returns a dict merged into TPU_GOLDEN by `golden`."""
    from crucible_tpu import grad as G
    from crucible_tpu.models import demo

    failed = []
    rows = {}

    # 1. Replay vs direct AD. On the chip these are two VALID estimators
    #    with independently-derived decisions (the replay freezes the MEGA
    #    record's; direct AD re-derives them in staged math), so any
    #    ulp-flipped silhouette sample creates a real estimator delta.
    #    The ENFORCED comparison therefore runs on the flip-poor smoke
    #    scene (lambertians only — no glass/TIR, no fuzz-absorb flips);
    #    book1's glass-heavy leaves are additionally REPORTED for trend
    #    tracking with only the radiometric ones enforced (camera leaves
    #    measured flip-dominated: cam_defocus up to 2.0 normalized at
    #    64px/8spp while radiometric stays ~1e-3 — r5 calibration).
    def ad_vs_replay(tag, sc, enforce, spp=8, depth=4):
        sd = sc.build()
        cp = sc.scene_cam.params()
        w, h = sc.scene_cam.image_width, sc.scene_cam.image_height
        pix = jnp.arange(w * h, dtype=jnp.uint32)
        target = jnp.zeros((w * h, 3), jnp.float32)
        params = G.extract_params(sd, cp)
        kw = dict(width=w, height=h, spp=spp, max_depth=depth)
        _, g_ad = G.loss_and_grad(
            params, sd, cp, target, pix, jnp.uint32(0), method="ad", **kw
        )
        _, g_rp = G.loss_and_grad(
            params, sd, cp, target, pix, jnp.uint32(0), method="replay", **kw
        )
        for key in sorted(params):
            if isinstance(g_ad[key], (list, tuple)):
                continue
            a = np.asarray(g_ad[key], np.float64)
            b = np.asarray(g_rp[key], np.float64)
            scale = max(float(np.abs(a).max()), 1e-6)
            nd = float(np.abs(a - b).max() / scale)
            rows[f"ad_vs_replay:{tag}:{key}"] = round(nd, 6)
            bound = enforce(key)
            if bound is not None and not (np.isfinite(nd) and nd < bound):
                failed.append(f"ad_vs_replay:{tag}:{key}")

    ad_vs_replay(
        "smoke", demo.smoke_scene(width=64),
        lambda k: 0.02 if k.startswith("cam_") else 5e-3,
    )
    ad_vs_replay(
        "book1", demo.book1_end_scene(width=64),
        lambda k: None if k.startswith("cam_") or k == "mat_fuzz" else 5e-3,
    )

    # 2. FD spot-checks on the chip: albedo (smoke scene) + one texel
    #    (earth). Same protocol as tests/test_replay.py::_fd_vs_grad.
    def fd_check(name, sc, key, spp=4, depth=4, eps=1e-3, rel=5e-2,
                 pix_n=None):
        sd = sc.build()
        cp = sc.scene_cam.params()
        wd, ht = sc.scene_cam.image_width, sc.scene_cam.image_height
        pixf = jnp.arange(pix_n or wd * ht, dtype=jnp.uint32)
        tgt = jnp.zeros((pix_n or wd * ht, 3), jnp.float32)
        p0 = G.extract_params(sd, cp)
        kwf = dict(width=wd, height=ht, spp=spp, max_depth=depth,
                   method="replay")
        _, grads = G.loss_and_grad(p0, sd, cp, tgt, pixf, jnp.uint32(0), **kwf)
        leaf = grads[key][0] if key == "tex_images" else grads[key]
        g = np.asarray(leaf)
        idx = np.unravel_index(np.argmax(np.abs(g)), g.shape)

        def loss_at(delta):
            p2 = dict(p0)
            if key == "tex_images":
                arr = np.asarray(p0[key][0], np.float64).copy()
                arr[idx] += delta
                p2[key] = (jnp.asarray(arr, jnp.float32),) + tuple(
                    p0[key][1:]
                )
            else:
                arr = np.asarray(p0[key], np.float64).copy()
                arr[idx] += delta
                p2[key] = jnp.asarray(arr, jnp.float32)
            return float(
                G.l2_loss(p2, sd, cp, tgt, pixf, jnp.uint32(0), **kwf)
            )

        fd = (loss_at(eps) - loss_at(-eps)) / (2 * eps)
        ad = float(g[idx])
        rows[f"fd:{name}:{key}"] = dict(
            ad=round(ad, 8), fd=round(fd, 8),
            rel=round(abs(ad - fd) / max(abs(fd), 1e-9), 5),
        )
        if not (abs(ad) > 0 and abs(ad - fd) <= rel * abs(fd)):
            failed.append(f"fd:{name}:{key}")

    fd_check("smoke", demo.smoke_scene(width=32), "tex_color")
    fd_check("earth", demo.earth(width=24), "tex_images", spp=2, depth=3)
    # Camera FD on sky-only pixels (smooth in vfov — no silhouette term;
    # the protocol of tests/test_replay.py::test_camera_vfov_sky_pixels).
    fd_check(
        "smoke", demo.smoke_scene(width=32), "cam_vfov",
        spp=2, depth=3, eps=1e-4, pix_n=8,
    )

    # 3. Deep-path gradients (d50 budget machinery) finite on the chip.
    sc = demo.book1_end_scene(width=64)
    sd = sc.build()
    cp = sc.scene_cam.params()
    w, h = sc.scene_cam.image_width, sc.scene_cam.image_height
    pix = jnp.arange(w * h, dtype=jnp.uint32)
    target = jnp.zeros((w * h, 3), jnp.float32)
    params = G.extract_params(sd, cp)
    _, g_deep = G.loss_and_grad(
        params, sd, cp, target, pix, jnp.uint32(0),
        width=w, height=h, spp=2, max_depth=50,
    )
    deep_finite = all(
        bool(np.isfinite(np.asarray(l)).all())
        for l in jax.tree_util.tree_leaves(g_deep)
    )
    rows["deep50_grads_finite"] = deep_finite
    if not deep_finite:
        failed.append("deep50_grads_finite")

    out = {"ok": not failed, "failed": failed, "checks": rows}
    log(bench="gradcheck", **{"ok": out["ok"], "failed": failed})
    if standalone:
        print(json.dumps(out, indent=1))
        if failed:
            raise SystemExit(f"gradcheck drift in: {failed}")
    return out


def movie(duration=5.0, out=None, world=None):
    """BASELINE config 5 end-to-end: a movie demo rendered frame-by-frame
    with per-frame checkpoints (skip_existing), per-frame seconds logged,
    ffmpeg assembly (VERDICT r2 #10).

        python tools/tpu_bench.py movie [out_dir] [world]"""
    from crucible_tpu.models import demo, render

    if out is None:
        out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/first_movie_tpu"
    if world is None:
        world = sys.argv[3] if len(sys.argv) > 3 else "first_movie"
    sc = getattr(demo, world)(duration=duration)
    n = render.compute_frame_count(duration, sc.frame_rate)
    secs = []

    def on_frame(i, dt):
        secs.append(round(dt, 3))
        print(json.dumps({"frame": i, "seconds": secs[-1]}), flush=True)

    t0 = time.time()
    path = render.render_movie(sc, out, skip_existing=True, verbose=False,
                               on_frame=on_frame)
    wall = time.time() - t0
    rays = (
        sc.scene_cam.image_width * sc.scene_cam.image_height
        * sc.scene_cam.samples
    )
    steady = sorted(secs)[len(secs) // 2] if secs else None
    log(
        bench=f"movie_{world}_{sc.scene_cam.image_width}w",
        frames=n,
        rendered=len(secs),
        wall_s=round(wall, 1),
        median_frame_s=steady,
        mrays_per_s_median_frame=round(rays / steady / 1e6, 2) if steady else None,
        out=str(path),
    )


def replaykernel():
    """On-chip validation + timing of the in-Pallas replay kernel (r5
    VERDICT #1): (1) does Mosaic lower both kernels, (2) forward radiance
    vs the jnp replay, (3) gradient agreement, (4) d8 minibatch and deep
    d50 chunk timings with the kernel on vs off."""
    import os

    from crucible_tpu import grad as G
    from crucible_tpu.models import demo, replay
    from crucible_tpu.models import integrator
    from crucible_tpu.models.camera import generate_rays

    sc = demo.book1_end_scene(width=400)
    sd = sc.build()
    cp = sc.scene_cam.params()

    # --- 1+2: small-config correctness on the chip ------------------------
    w0, h0, depth0 = 192, 108, 8
    r0 = w0 * h0
    pix = jnp.arange(r0, dtype=jnp.uint32)
    smp = jnp.zeros((r0,), jnp.uint32)
    seed = jnp.uint32(7)
    o, d, _ = generate_rays(cp, w0, h0, pix, smp, seed)
    rec = replay.trace_record_mega(sd, cp, w0, h0, pix, smp, seed, depth0)
    table = integrator.make_sphere_table(sd)
    os.environ["CRUCIBLE_REPLAY_KERNEL"] = "0"
    jax.clear_caches()
    ref = np.asarray(
        jax.jit(
            lambda: replay.trace_replay(sd, o, d, pix, smp, seed, depth0, rec)
        )()
    )
    from crucible_tpu.ops.pallas import replay_kernel as rk

    got = np.asarray(
        jax.jit(
            lambda: rk.trace_replay_mega(table, o, d, pix, smp, seed, rec)
        )()
    )
    close = np.isclose(got, ref, rtol=1e-3, atol=1e-3).all(axis=-1)
    log(
        bench="replaykernel_fwd_check",
        lanes_close=round(float(close.mean()), 5),
        mean_absdiff=float(np.abs(got - ref).mean()),
        finite=bool(np.isfinite(got).all()),
    )

    # Gradient agreement at 48x27 (normalized by each leaf's max).
    w1, h1 = 96, 54
    pix1 = jnp.arange(w1 * h1, dtype=jnp.uint32)
    target = jnp.zeros((w1 * h1, 3), jnp.float32)
    params = G.extract_params(sd, cp)
    kw1 = dict(width=w1, height=h1, spp=2, max_depth=16)
    outs = {}
    for mode in ("0", "1"):
        os.environ["CRUCIBLE_REPLAY_KERNEL"] = mode
        jax.clear_caches()
        l, g = G.loss_and_grad(
            params, sd, cp, target, pix1, jnp.uint32(3), **kw1
        )
        outs[mode] = (float(l), jax.tree_util.tree_map(np.asarray, g))
    gstats = {}
    for key in ("mat_emission", "tex_color", "mat_fuzz", "cam_vfov"):
        a, b = outs["0"][1][key], outs["1"][1][key]
        scale = max(float(np.abs(a).max()), 1e-6)
        gstats[key] = round(float(np.abs(a - b).max() / scale), 6)
    log(
        bench="replaykernel_grad_check",
        loss_off=round(outs["0"][0], 6),
        loss_on=round(outs["1"][0], 6),
        norm_maxdiff=gstats,
    )

    # --- 3: production timings on/off -------------------------------------
    def time_step(w, h, spp, depth, steps=3):
        pix_t = jnp.arange(w * h, dtype=jnp.uint32)
        tgt = jnp.zeros((w * h, 3), jnp.float32)
        kw = dict(width=w, height=h, spp=spp, max_depth=depth)
        loss, g = G.loss_and_grad(
            params, sd, cp, tgt, pix_t, jnp.uint32(0), **kw
        )
        jax.block_until_ready(g)
        t0 = time.time()
        for i in range(steps):
            loss, g = G.loss_and_grad(
                params, sd, cp, tgt, pix_t, jnp.uint32(1 + i), **kw
            )
        # Forced D2H fetch ends the window (tunnel no-op guard, CLAUDE.md).
        float(loss)
        return (time.time() - t0) / steps

    for mode in ("0", "1"):
        os.environ["CRUCIBLE_REPLAY_KERNEL"] = mode
        jax.clear_caches()
        dt = time_step(1920, 1080, 4, 8)
        log(
            bench=f"replaykernel_d8_step_kernel{mode}",
            seconds=round(dt, 3),
            mrays_per_s=round(1920 * 1080 * 4 / dt / 1e6, 3),
        )
        dt = time_step(1920, 1080, 4, 50)
        log(
            bench=f"replaykernel_d50_chunk_kernel{mode}",
            seconds=round(dt, 3),
            mrays_per_s=round(1920 * 1080 * 4 / dt / 1e6, 3),
        )
    os.environ.pop("CRUCIBLE_REPLAY_KERNEL", None)


def replayprof(w=1920, h=1080, spp=4, depth=8):
    """Decompose the d8 minibatch step with the in-Pallas replay kernel:
    record pass, kernel replay fwd, kernel replay fwd+bwd, jnp replay fwd
    and fwd+bwd on the same records — names the dominant piece."""
    import os

    from crucible_tpu.models import demo, replay, integrator
    from crucible_tpu.models.camera import generate_rays
    from crucible_tpu.ops.pallas import replay_kernel as rk

    sc = demo.book1_end_scene(width=400)
    sd = sc.build()
    cp = sc.scene_cam.params()
    rays = w * h * spp
    pix = jnp.tile(jnp.arange(w * h, dtype=jnp.uint32), spp)
    smp = jnp.repeat(jnp.arange(spp, dtype=jnp.uint32), w * h)
    seed = jnp.uint32(1)

    def timeit(name, fn, *args, n=3):
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.time()
        for _ in range(n):
            out = fn(*args)
        x = jax.tree_util.tree_leaves(out)[0]
        float(np.asarray(x[(0,) * x.ndim] if x.ndim else x))
        dt = (time.time() - t0) / n
        log(bench=f"replayprof_{name}", seconds=round(dt, 3),
            mrays_per_s=round(rays / dt / 1e6, 2))
        return out

    rec_f = jax.jit(
        lambda sd_, cp_: replay.trace_record_mega(
            sd_, cp_, w, h, pix, smp, seed, depth
        )
    )
    rec = timeit("record", rec_f, sd, cp)
    table = integrator.make_sphere_table(sd)
    o, d, _ = generate_rays(cp, w, h, pix, smp, seed)
    o = jax.block_until_ready(o)

    # Big arrays must be jit ARGUMENTS, not closure constants (a closed-over
    # buffer embeds in the HLO -> remote-compile HTTP 413, CLAUDE.md).
    kf = jax.jit(
        lambda t, o_, d_, p_, s_, rec_: rk.trace_replay_mega(
            t, o_, d_, p_, s_, seed, rec_
        )
    )
    timeit("kernel_fwd", kf, table, o, d, pix, smp, rec)
    kg = jax.jit(
        jax.grad(
            lambda t, o_, d_, p_, s_, rec_: jnp.sum(
                rk.trace_replay_mega(t, o_, d_, p_, s_, seed, rec_)
            )
        )
    )
    timeit("kernel_fwd_bwd", kg, table, o, d, pix, smp, rec)

    os.environ["CRUCIBLE_REPLAY_KERNEL"] = "0"
    jax.clear_caches()
    rec = jax.block_until_ready(rec)
    jf = jax.jit(
        lambda sd_, o_, d_, p_, s_, rec_: replay.trace_replay(
            sd_, o_, d_, p_, s_, seed, depth, rec_
        )
    )
    timeit("jnp_fwd", jf, sd, o, d, pix, smp, rec)
    jg2 = jax.jit(
        jax.grad(
            lambda sd_, o_, d_, p_, s_, rec_: jnp.sum(
                replay.trace_replay(sd_, o_, d_, p_, s_, seed, depth, rec_)
            ),
            allow_int=True,
        )
    )
    timeit("jnp_fwd_bwd", jg2, sd, o, d, pix, smp, rec)
    os.environ.pop("CRUCIBLE_REPLAY_KERNEL", None)

    # --- depth-50 deep path: where does the chunk go with the kernel? ----
    depth50 = 50
    for mode in ("1", "0"):
        os.environ["CRUCIBLE_REPLAY_KERNEL"] = mode
        jax.clear_caches()
        df = jax.jit(
            lambda sd_, cp_, p_, s_: replay.render_rays_replay(
                sd_, cp_, w, h, p_, s_, seed, depth50, split=True
            )
        )
        timeit(f"deep50_fwd_kernel{mode}", df, sd, cp, pix, smp)
        dg = jax.jit(
            jax.grad(
                lambda sd_, cp_, p_, s_: jnp.sum(
                    replay.render_rays_replay(
                        sd_, cp_, w, h, p_, s_, seed, depth50, split=True
                    )
                ),
                allow_int=True,
            )
        )
        timeit(f"deep50_fwd_bwd_kernel{mode}", dg, sd, cp, pix, smp)
    os.environ.pop("CRUCIBLE_REPLAY_KERNEL", None)


def blockedab(w=1920, h=1080, spp=4, depth=8):
    """On-chip A/B of the lane-blocked replay-kernel layout (r5 final):
    (1) does Mosaic lower the blocked kernels, (2) blocked radiance vs the
    legacy layout (same per-lane op sequence — expect bit-identical or
    ulp-level), (3) kernel fwd / bwd timings both layouts, (4) the
    production d8 minibatch + d50 chunk through loss_and_grad with
    CRUCIBLE_REPLAY_BLOCKED on/off."""
    import os

    from crucible_tpu import grad as G
    from crucible_tpu.models import demo, replay, integrator
    from crucible_tpu.models.camera import generate_rays
    from crucible_tpu.ops.pallas import replay_kernel as rk

    sc = demo.book1_end_scene(width=400)
    sd = sc.build()
    cp = sc.scene_cam.params()
    params = G.extract_params(sd, cp)
    seed = jnp.uint32(1)

    # --- correctness at a small config ------------------------------------
    w0, h0, d0 = 192, 108, 8
    r0 = w0 * h0
    pix0 = jnp.arange(r0, dtype=jnp.uint32)
    smp0 = jnp.zeros((r0,), jnp.uint32)
    o0, dd0, _ = generate_rays(cp, w0, h0, pix0, smp0, seed)
    rec0 = replay.trace_record_mega(sd, cp, w0, h0, pix0, smp0, seed, d0)
    table = integrator.make_sphere_table(sd)
    vals = {}
    for blocked in (False, True):
        vals[blocked] = np.asarray(
            jax.jit(
                lambda b=blocked: rk.trace_replay_mega(
                    table, o0, dd0, pix0, smp0, seed, rec0, blocked=b
                )
            )()
        )
    diff = np.abs(vals[True] - vals[False])
    log(
        bench="blockedab_fwd_check",
        bit_identical=bool((vals[True] == vals[False]).all()),
        max_absdiff=float(diff.max()),
        finite=bool(np.isfinite(vals[True]).all()),
    )
    gv = {}
    for blocked in (False, True):
        gv[blocked] = np.asarray(
            jax.jit(
                jax.grad(
                    lambda t, b=blocked: jnp.sum(
                        rk.trace_replay_mega(
                            t, o0, dd0, pix0, smp0, seed, rec0, blocked=b
                        )
                    )
                )
            )(table)
        )
    scale = max(float(np.abs(gv[False]).max()), 1e-6)
    log(
        bench="blockedab_grad_check",
        norm_maxdiff=float(np.abs(gv[True] - gv[False]).max() / scale),
        finite=bool(np.isfinite(gv[True]).all()),
    )

    # --- kernel-only timings at the minibatch config ----------------------
    rays = w * h * spp
    pix = jnp.tile(jnp.arange(w * h, dtype=jnp.uint32), spp)
    smp = jnp.repeat(jnp.arange(spp, dtype=jnp.uint32), w * h)
    rec = replay.trace_record_mega(sd, cp, w, h, pix, smp, seed, depth)
    o, d, _ = generate_rays(cp, w, h, pix, smp, seed)
    o = jax.block_until_ready(o)

    def timeit(name, fn, *args, n=3):
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.time()
        for _ in range(n):
            out = fn(*args)
        x = jax.tree_util.tree_leaves(out)[0]
        float(np.asarray(x[(0,) * x.ndim] if x.ndim else x))
        dt = (time.time() - t0) / n
        log(bench=f"blockedab_{name}", seconds=round(dt, 3),
            mrays_per_s=round(rays / dt / 1e6, 2))

    for blocked in (False, True):
        tag = "blk" if blocked else "leg"
        kf = jax.jit(
            lambda t, o_, d_, p_, s_, rec_, b=blocked: rk.trace_replay_mega(
                t, o_, d_, p_, s_, seed, rec_, blocked=b
            )
        )
        timeit(f"kernel_fwd_{tag}", kf, table, o, d, pix, smp, rec)
        kg = jax.jit(
            jax.grad(
                lambda t, o_, d_, p_, s_, rec_, b=blocked: jnp.sum(
                    rk.trace_replay_mega(
                        t, o_, d_, p_, s_, seed, rec_, blocked=b
                    )
                )
            )
        )
        timeit(f"kernel_bwd_{tag}", kg, table, o, d, pix, smp, rec)

    # --- production steps through loss_and_grad ---------------------------
    def time_step(w_, h_, spp_, depth_, steps=3):
        pix_t = jnp.arange(w_ * h_, dtype=jnp.uint32)
        tgt = jnp.zeros((w_ * h_, 3), jnp.float32)
        kw = dict(width=w_, height=h_, spp=spp_, max_depth=depth_)
        loss, g = G.loss_and_grad(
            params, sd, cp, tgt, pix_t, jnp.uint32(0), **kw
        )
        jax.block_until_ready(g)
        t0 = time.time()
        for i in range(steps):
            loss, g = G.loss_and_grad(
                params, sd, cp, tgt, pix_t, jnp.uint32(1 + i), **kw
            )
        float(loss)  # forced D2H ends the window (CLAUDE.md)
        return (time.time() - t0) / steps

    for mode in ("0", "1"):
        os.environ["CRUCIBLE_REPLAY_BLOCKED"] = mode
        jax.clear_caches()
        dt = time_step(1920, 1080, 4, 8)
        log(
            bench=f"blockedab_d8_step_blocked{mode}",
            seconds=round(dt, 3),
            mrays_per_s=round(1920 * 1080 * 4 / dt / 1e6, 3),
        )
        dt = time_step(1920, 1080, 4, 50)
        log(
            bench=f"blockedab_d50_chunk_blocked{mode}",
            seconds=round(dt, 3),
            mrays_per_s=round(1920 * 1080 * 4 / dt / 1e6, 3),
        )
    os.environ.pop("CRUCIBLE_REPLAY_BLOCKED", None)


def structrec(width=400, spp=4, depth=8):
    """On-chip probe of the STRUCTURE-WALK record passes (r5 final):
    sphere_stress at 1936 rows (sphere BVH record vs the old brute) and
    7744 rows (previously record-INFEASIBLE — brute (N,T) exceeds VMEM).
    Measures the record pass, checks records against the staged oracle on
    a lane subset, and runs a full gradient minibatch step (the first
    on-chip deep-gradient evidence on a multi-thousand-sphere scene)."""
    from crucible_tpu import grad as G
    from crucible_tpu.models import demo, replay
    from crucible_tpu.models.camera import generate_rays

    for copies, tag in ((4, "n1936"), (16, "n7744")):
        sc = demo.sphere_stress(width=width, copies=copies)
        sd = sc.build()
        cp = sc.scene_cam.params()
        w, hh = width, sc.scene_cam.image_height
        rays = w * hh * spp
        pix = jnp.tile(jnp.arange(w * hh, dtype=jnp.uint32), spp)
        smp = jnp.repeat(jnp.arange(spp, dtype=jnp.uint32), w * hh)
        seed = jnp.uint32(1)
        struct = (
            "bvh" if sd.sph_nodes is not None
            else ("cull" if sd.sph_cbounds is not None else "none")
        )
        log(bench=f"structrec_{tag}_built",
            rows=int(sd.sph_center.shape[0]), struct=struct)

        rec_f = jax.jit(
            lambda sd_, cp_: replay.trace_record_mega(
                sd_, cp_, w, hh, pix, smp, seed, depth
            )
        )
        rec = rec_f(sd, cp)
        jax.block_until_ready(rec)
        t0 = time.time()
        for _ in range(3):
            rec = rec_f(sd, cp)
        int(np.asarray(rec[0, 0]))
        dt = (time.time() - t0) / 3
        log(bench=f"structrec_{tag}_record", seconds=round(dt, 3),
            mrays_per_s=round(rays / dt / 1e6, 2))

        # Records vs the staged oracle on an 8k-lane subset (the staged
        # (R, N) intersection is too heavy at full width here).
        r_sub = 8192
        pix_s, smp_s = pix[:r_sub], smp[:r_sub]
        o_s, d_s, _ = generate_rays(cp, w, hh, pix_s, smp_s, seed)
        rec_s = np.asarray(
            jax.jit(
                lambda: replay.trace_record(
                    sd, o_s, d_s, pix_s, smp_s, seed, depth
                )
            )()
        )
        rec_m = np.asarray(rec[:, :r_sub])
        ess = replay.F_ALIVE | replay.F_HIT | replay.F_SCAT
        ess_match = float(((rec_s & ess) == (rec_m & ess)).mean())
        hit_both = ((rec_s & rec_m) & replay.F_HIT) > 0
        id_match = float(
            ((rec_s >> 8)[hit_both] == (rec_m >> 8)[hit_both]).mean()
        )
        log(bench=f"structrec_{tag}_check",
            ess_match=round(ess_match, 5), id_match=round(id_match, 5))

        # Full gradient minibatch step through loss_and_grad.
        params = G.extract_params(sd, cp)
        tgt = jnp.zeros((w * hh, 3), jnp.float32)
        pix_t = jnp.arange(w * hh, dtype=jnp.uint32)
        kw = dict(width=w, height=hh, spp=spp, max_depth=depth)
        try:
            loss, g = G.loss_and_grad(
                params, sd, cp, tgt, pix_t, jnp.uint32(0), **kw
            )
            finite = all(
                bool(np.isfinite(np.asarray(x)).all())
                for x in jax.tree_util.tree_leaves(g)
            )
            t0 = time.time()
            for i in range(3):
                loss, g = G.loss_and_grad(
                    params, sd, cp, tgt, pix_t, jnp.uint32(1 + i), **kw
                )
            float(loss)
            dt = (time.time() - t0) / 3
            log(bench=f"structrec_{tag}_grad_step", seconds=round(dt, 3),
                mrays_per_s=round(rays / dt / 1e6, 3), finite=finite)
        except Exception as e:  # noqa: BLE001 — probe records the failure
            log(bench=f"structrec_{tag}_grad_step", error=str(e)[:200])


def deepsweep(w=1920, h=1080, depth=50):
    """Re-sweep the deep-chunk bucket spec with the in-Pallas replay
    kernel on: the kernel changes the record-vs-replay trade (narrow
    re-walk rows are much cheaper now), so the r4 head-6 optimum may have
    moved. Uses the explicit grad_spec/grad_record_div statics."""
    from crucible_tpu import grad as G
    from crucible_tpu.models import demo

    sc = demo.book1_end_scene(width=400)
    sd = sc.build()
    cp = sc.scene_cam.params()
    params = G.extract_params(sd, cp)

    def step(tag, spp, spec, div, steps=3):
        pix = jnp.arange(w * h, dtype=jnp.uint32)
        tgt = jnp.zeros((w * h, 3), jnp.float32)
        kw = dict(width=w, height=h, spp=spp, max_depth=depth,
                  grad_spec=spec, grad_record_div=div)
        loss, g = G.loss_and_grad(
            params, sd, cp, tgt, pix, jnp.uint32(0), **kw
        )
        finite = bool(np.isfinite(float(loss)))
        t0 = time.time()
        for i in range(steps):
            loss, g = G.loss_and_grad(
                params, sd, cp, tgt, pix, jnp.uint32(1 + i), **kw
            )
        float(loss)
        dt = (time.time() - t0) / steps
        log(bench=f"deepsweep_{tag}", seconds=round(dt, 3),
            mrays_per_s=round(w * h * spp / dt / 1e6, 3), finite=finite)

    step("default_h6d12", 4, None, None)
    step("h4_d8", 4, ((4, 1), (16, 8), (0, 32)), 8)
    step("h4_d12", 4, ((4, 1), (16, 8), (0, 32)), 12)
    step("h6_d16", 4, None, 16)
    step("h2_d4", 4, ((2, 1), (8, 4), (16, 16), (0, 32)), 4)
    step("h3_d6", 4, ((3, 1), (12, 6), (0, 24)), 6)
    step("default_spp8", 8, None, None)
    step("h4_d8_spp8", 8, ((4, 1), (16, 8), (0, 32)), 8)


def r2():
    demos()
    leafsweep()
    grad()


def r3():
    """The round-3 measurement matrix (reproducibility: run ONE at a time)."""
    demos()
    gradprof()
    grad()
    frozen()
    grad500()
    movie()


def full():
    micro()
    quick(400)
    quick(1920, spps=(32,))
    demos()


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "quick"
    print("devices:", jax.devices(), flush=True)
    {
        "quick": quick, "full": full, "micro": micro, "demos": demos,
        "grad": grad, "leafsweep": leafsweep, "r2": r2, "r3": r3,
        "earthprof": earthprof, "gradprof": gradprof, "fetchbench": fetchbench,
        "teapotx": teapotx, "movie": movie, "grad500": grad500, "frozen": frozen,
        "gradprof50": gradprof50, "gradprof50b": gradprof50b,
        "golden": golden, "stress": stress, "gradprof50c": gradprof50c,
        "teapot1": teapot1, "mxufetch": mxufetch, "nestedx": nestedx,
        "mxurec": mxurec, "replaykernel": replaykernel,
        "replayprof": replayprof, "gradcheck": gradcheck, "deepsweep": deepsweep,
        "blockedab": blockedab, "structrec": structrec,
    }[mode]()
