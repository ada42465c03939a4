"""Driver benchmark: forward (and backward) path-tracing throughput on the
flagship book1 scene (BASELINE.md north star: fwd+bwd rays/sec/chip at
book1 1920x1080x500spp).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

The reference publishes no numbers (BASELINE.json "published": {}), so
``vs_baseline`` compares against the previous round's recorded result
(BENCH_r*.json) when present, else 1.0.

Env knobs: BENCH_WIDTH (default 1920), BENCH_SPP (default 32 — full 500spp
scales linearly; spp only changes wall-clock, not rays/sec), BENCH_DEPTH
(default 50), BENCH_GRAD=0 to skip the backward component.
"""

from __future__ import annotations

import glob
import json
import os
import re
import time


def _probe_once(timeout_s: float) -> bool:
    import subprocess
    import sys

    code = (
        "import jax, jax.numpy as jnp, numpy as np;"
        "np.asarray(jax.jit(lambda x: x.sum())(jnp.arange(8.)));"
        "print('HEALTHY')"
    )
    try:
        out = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, timeout=timeout_s
        )
        return b"HEALTHY" in out.stdout
    except Exception:
        return False


def _device_healthy() -> bool:
    """Probe the accelerator in a subprocess: the axon tunnel can wedge
    (host-side compile helper), and a hung bench is worse than a CPU bench.

    The tunnel's wedges DRAIN (queued device executions finish serially —
    CLAUDE.md), so one failed probe must not demote the round's evidence to
    a CPU number (VERDICT r2 weak #1): retry with backoff for up to ~10
    minutes before falling back."""
    import sys
    import time as _t

    waits = [0, 30, 60, 120, 240]  # ~7.5 min of backoff + 5 x 90 s probes
    for i, wait in enumerate(waits):
        if wait:
            print(
                f"bench: accelerator probe {i}/{len(waits)} failed; "
                f"retrying in {wait}s (tunnel wedges drain)",
                file=sys.stderr,
            )
            _t.sleep(wait)
        if _probe_once(90.0):
            return True
    return False


def main() -> None:
    width = int(os.environ.get("BENCH_WIDTH", 1920))
    spp = int(os.environ.get("BENCH_SPP", 32))
    depth = int(os.environ.get("BENCH_DEPTH", 50))
    do_grad = os.environ.get("BENCH_GRAD", "1") != "0"

    import jax

    cpu_fallback = False
    if not _device_healthy():
        print(
            "bench: accelerator unresponsive after retries, falling back to "
            "CPU — this run is NOT comparable to TPU rounds",
            file=__import__("sys").stderr,
        )
        cpu_fallback = True
        jax.config.update("jax_platforms", "cpu")
        width = min(width, int(os.environ.get("BENCH_CPU_WIDTH", 192)))
        spp = min(spp, 4)
        depth = min(depth, 8)
    import jax.numpy as jnp
    import numpy as np

    from crucible_tpu.models import demo, render
    from crucible_tpu import grad as grad_mod

    sc = demo.book1_end_scene(width=width)
    sd = sc.build()
    cp = sc.scene_cam.params()
    w, h = sc.scene_cam.image_width, sc.scene_cam.image_height

    # --- forward: persistent wavefront, one warmup (compile) + timed runs.
    # Best of 2: a single dispatch through the tunnel occasionally absorbs
    # a multi-second queue stall (observed 5.8 vs 10.0 s for identical
    # work), which is latency noise, not render throughput.
    render.render_image_persistent(sd, cp, w, h, 2, depth, 0)
    fwd_s = None
    for rep in range(2):
        t0 = time.time()
        img = render.render_image_persistent(sd, cp, w, h, spp, depth, 1 + rep)
        dt = time.time() - t0
        fwd_s = dt if fwd_s is None else min(fwd_s, dt)
    fwd_rays = w * h * spp
    fwd_rps = fwd_rays / fwd_s
    assert np.isfinite(img).all()

    # --- north star: the STATED config, book1 1920x1080 @ 500 spp depth 50
    # (BASELINE.md). spp is traced, so this reuses the compiled executable —
    # a directly measured number, not an extrapolation (VERDICT r1 #8).
    ns_rps = None
    if (
        jax.default_backend() != "cpu"
        and width == 1920
        and depth == 50
        and os.environ.get("BENCH_NORTHSTAR", "1") != "0"
    ):
        t0 = time.time()
        img = render.render_image_persistent(sd, cp, w, h, 500, depth, 1)
        ns_s = time.time() - t0
        ns_rps = w * h * 500 / ns_s
        assert np.isfinite(img).all()

    # --- backward: value_and_grad over a pixel batch ----------------------
    # The OFFICIAL fwd+bwd metric (BASELINE.md "Official metric
    # definitions"): book1 1920x1080 @ 4 spp depth 8 — one training
    # minibatch step at the north-star pixel geometry, 8.3M rays/step.
    # The full 500-spp depth-50 budget is measured separately
    # (tools/tpu_bench.py grad500; BASELINE.md) — too slow to recompile in
    # every driver bench. The r1-comparable 192x108 number is also emitted.
    bwd_rps = None
    bwd_small_rps = None
    frozen_rps = None
    if do_grad:
        if jax.default_backend() == "cpu":
            configs = [("fwd_bwd", 64, 36, 2, 4)]
        else:
            configs = [
                ("fwd_bwd", 1920, 1080, 4, 8),
                ("fwd_bwd_small", 192, 108, 4, 8),
            ]
        params = grad_mod.extract_params(sd, cp)
        for name, bw, bh, bspp, bdepth in configs:
            pix = jnp.arange(bw * bh, dtype=jnp.uint32)
            target = jnp.zeros((bw * bh, 3), jnp.float32)
            kw = dict(width=bw, height=bh, spp=bspp, max_depth=bdepth)
            loss, grads = grad_mod.loss_and_grad(
                params, sd, cp, target, pix, jnp.uint32(0), **kw
            )
            jax.block_until_ready(grads)
            # Steady-state: a training loop pipelines steps (async
            # dispatch); block only after several, like the measured
            # 500-spp accumulation run does.
            n_steps = 3
            t0 = time.time()
            for it in range(n_steps):
                loss, grads = grad_mod.loss_and_grad(
                    params, sd, cp, target, pix, jnp.uint32(1 + it), **kw
                )
            jax.block_until_ready(grads)
            np.asarray(loss)
            bwd_s = (time.time() - t0) / n_steps
            if name == "fwd_bwd":
                bwd_rps = bw * bh * bspp / bwd_s
            else:
                bwd_small_rps = bw * bh * bspp / bwd_s

        # Frozen-decision step rate (BASELINE.md): record once, replay-only
        # gradient steps — the training mode for radiometric parameters.
        # Optional extra: a failure here must not take down the whole
        # artifact (the JSON line is the round's evidence).
        if jax.default_backend() != "cpu":
            try:
                bw, bh, bspp, bdepth = configs[0][1:]
                pix = jnp.arange(bw * bh, dtype=jnp.uint32)
                target = jnp.zeros((bw * bh, 3), jnp.float32)
                kw = dict(width=bw, height=bh, spp=bspp, max_depth=bdepth)
                rec = grad_mod.record_decisions(
                    sd, cp, pix, jnp.uint32(0), **kw
                )
                loss, grads = grad_mod.loss_and_grad(
                    params, sd, cp, target, pix, jnp.uint32(0), rec=rec, **kw
                )
                float(loss)  # forced fetch: real barrier through the tunnel
                t0 = time.time()
                for _ in range(3):
                    loss, grads = grad_mod.loss_and_grad(
                        params, sd, cp, target, pix, jnp.uint32(0), rec=rec,
                        **kw,
                    )
                float(loss)
                frozen_rps = bw * bh * bspp / ((time.time() - t0) / 3)
            except Exception as e:  # noqa: BLE001
                print(f"bench: frozen-step measurement failed: {e}",
                      file=__import__("sys").stderr)

    # --- fwd+bwd at the FULL north-star budget (1080p, 500 spp, depth 50):
    # the r4 headline (two-level record + depth-bucketed replay). ~4-5 min
    # including the chunk compile; BENCH_GRAD500=0 skips.
    deep_rps = None
    if (
        do_grad
        and jax.default_backend() != "cpu"
        and width == 1920
        and os.environ.get("BENCH_GRAD500", "1") != "0"
    ):
        try:
            bw, bh, bspp, bdepth, chunk = 1920, 1080, 500, 50, 4
            pix = jnp.arange(bw * bh, dtype=jnp.uint32)
            target = jnp.zeros((bw * bh, 3), jnp.float32)
            # Warmup compiles the fused accumulation executable the loop
            # reuses (one single-chunk accum, identical statics).
            l, _ = grad_mod.loss_and_grad_accum(
                params, sd, cp, target, pix, jnp.uint32(0),
                width=bw, height=bh, spp=chunk, max_depth=bdepth,
                chunk_spp=chunk,
            )
            float(l)
            t0 = time.time()
            loss, grads = grad_mod.loss_and_grad_accum(
                params, sd, cp, target, pix, jnp.uint32(1),
                width=bw, height=bh, spp=bspp, max_depth=bdepth,
                chunk_spp=chunk,
            )
            loss = float(loss)  # forced fetch ends the timed window
            deep_s = time.time() - t0
            finite = all(
                bool(jnp.isfinite(x).all())
                for x in jax.tree_util.tree_leaves(grads)
            )
            if finite:
                deep_rps = bw * bh * bspp / deep_s
            else:
                print("bench: grad500 grads not finite; omitting",
                      file=__import__("sys").stderr)
        except Exception as e:  # noqa: BLE001
            print(f"bench: grad500 measurement failed: {e}",
                  file=__import__("sys").stderr)

    # --- vs_baseline: latest previous round that ran on TPU ---------------
    # CPU fallbacks (BENCH_r02) are non-comparable: skip them when picking
    # the comparison-of-record, and emit null when THIS run is a fallback.
    vs = None if cpu_fallback else 1.0
    if not cpu_fallback:
        for path in sorted(glob.glob("BENCH_r*.json"), reverse=True):
            try:
                with open(path) as f:
                    prev = json.load(f)
                # The driver wraps the bench line under "parsed".
                prev = prev.get("parsed", prev)
                if prev.get("backend", "tpu") == "cpu":
                    continue
                if prev.get("value"):
                    vs = fwd_rps / float(prev["value"])
                    break
            except Exception:
                continue

    out = {
        "metric": f"book1_{width}w_fwd_primary_rays_per_sec",
        "value": round(fwd_rps, 1),
        "unit": "rays/s",
        "vs_baseline": round(vs, 3) if vs is not None else None,
        "spp": spp,
        "depth": depth,
        "fwd_seconds": round(fwd_s, 2),
        "backend": jax.default_backend(),
    }
    if ns_rps is not None:
        out["northstar_1080p_500spp_rays_per_sec"] = round(ns_rps, 1)
    if bwd_rps is not None:
        out["fwd_bwd_rays_per_sec"] = round(bwd_rps, 1)
    if bwd_small_rps is not None:
        out["fwd_bwd_rays_per_sec_192x108"] = round(bwd_small_rps, 1)
    if frozen_rps is not None:
        out["fwd_bwd_frozen_decisions_rays_per_sec"] = round(frozen_rps, 1)
    if deep_rps is not None:
        out["fwd_bwd_northstar_500spp_d50_rays_per_sec"] = round(deep_rps, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
