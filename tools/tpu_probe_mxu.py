"""Probe: can Mosaic's in-kernel dot_general be made f32-exact?

Gates the r4 speed-of-light plan (BASELINE.md): moving the sphere
quadratic's dot products and the Möller–Trumbore trilinear forms onto the
MXU is only acceptable if geometry stays f32-accurate — CLAUDE.md records
that in-kernel dot_general multiplies f32 in bf16 passes by default.
This measures the actual error of DEFAULT vs HIGHEST precision against an
f64 reference, plus throughput at a megakernel-shaped contraction.

ONE TPU job; run alone.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def probe(name, fn, args, ref):
    try:
        out = np.asarray(jax.jit(fn)(*args))
        rel = float(np.max(np.abs(out - ref) / np.maximum(np.abs(ref), 1e-20)))
        print(json.dumps({"probe": name, "ok": True, "max_rel_err": rel}), flush=True)
        return rel
    except Exception as e:  # noqa: BLE001
        print(
            json.dumps({"probe": name, "ok": False, "err": str(e).split("\n")[0][:160]}),
            flush=True,
        )
        return None


def main():
    rng = np.random.default_rng(0)
    # Megakernel-shaped contraction: lane dirs (T,3) x sphere normals (3,N).
    t, n = 512, 512
    a = jnp.asarray(rng.normal(size=(t, 8)), jnp.float32)  # pad 3 -> 8 sublanes
    b = jnp.asarray(rng.normal(size=(8, n)), jnp.float32)
    ref = np.asarray(a, np.float64) @ np.asarray(b, np.float64)

    for prec_name, prec in (
        ("default", None),
        ("highest", jax.lax.Precision.HIGHEST),
    ):
        def k(a_ref, b_ref, o_ref, prec=prec):
            o_ref[:] = jax.lax.dot_general(
                a_ref[:], b_ref[:], (((1,), (0,)), ((), ())), precision=prec
            )

        fn = pl.pallas_call(
            k,
            out_shape=jax.ShapeDtypeStruct((t, n), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        probe(f"dot_{prec_name}_{t}x8x{n}", fn, (a, b), ref)

    # Reference error scale of a pure-FMA (VPU) product for calibration.
    def k_fma(a_ref, b_ref, o_ref):
        acc = jnp.zeros((t, n), jnp.float32)
        for i in range(8):
            acc = acc + a_ref[:, i : i + 1] * b_ref[i : i + 1, :]
        o_ref[:] = acc

    fn = pl.pallas_call(
        k_fma,
        out_shape=jax.ShapeDtypeStruct((t, n), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    probe("fma_reference", fn, (a, b), ref)

    # Throughput: 100 highest-precision dots in-kernel vs 100 FMA expansions.
    for name, body in (
        (
            "dot_highest",
            lambda a_, b_: jax.lax.dot_general(
                a_, b_, (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
            ),
        ),
        (
            "fma",
            lambda a_, b_: sum(
                a_[:, i : i + 1] * b_[i : i + 1, :] for i in range(8)
            ),
        ),
    ):
        def k_timed(a_ref, b_ref, o_ref, body=body):
            def it(i, acc):
                return acc + body(a_ref[:] + i.astype(jnp.float32) * 0.0, b_ref[:])

            o_ref[:] = jax.lax.fori_loop(0, 100, it, jnp.zeros((t, n), jnp.float32))

        fn = jax.jit(
            pl.pallas_call(
                k_timed,
                out_shape=jax.ShapeDtypeStruct((t, n), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )
        )
        try:
            np.asarray(fn(a, b))
            t0 = time.time()
            np.asarray(fn(a, b))
            dt = time.time() - t0
            print(
                json.dumps({"probe": f"time_{name}", "us_per_dot": round(dt / 100 * 1e6, 1)}),
                flush=True,
            )
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"probe": f"time_{name}", "ok": False,
                              "err": str(e).split("\n")[0][:160]}), flush=True)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    main()
