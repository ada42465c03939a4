"""On-device probe: can Mosaic lower per-lane dynamic gathers in-kernel?

Gates the megakernel image-texture/equirect-sky design: Mosaic's gather
rule (jax/_src/pallas/mosaic/lowering.py::_gather_lowering_rule) lowers
``jnp.take_along_axis`` to ``tpu.dynamic_gather`` along sublanes (axis 0)
or lanes (axis 1) when operand/index shapes match. An arbitrary gather
from a (S, 128)-tiled texture then composes from TWO such gathers:

  z[s, j]  = x[s, c[j]]     (lane gather, column select, idx broadcast)
  out[., j] = z[r[j], j]    (sublane gather, row select)

This probe compiles tiny kernels for each primitive and the composition,
checks them against NumPy, and times the composition at texture scale.
Run it alone (one TPU job at a time — CLAUDE.md).
"""

from __future__ import annotations

import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def run(name, kernel, out_shape, *args):
    try:
        f = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(*out_shape),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in args],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        t0 = time.time()
        out = np.asarray(jax.jit(f)(*args))
        print(json.dumps({"probe": name, "ok": True, "compile_s": round(time.time() - t0, 1)}), flush=True)
        return out
    except Exception as e:  # noqa: BLE001
        msg = str(e).split("\n")[0][:200]
        print(json.dumps({"probe": name, "ok": False, "err": msg}), flush=True)
        return None


def main():
    rng = np.random.default_rng(0)

    # --- 1. lane gather: out[i,j] = x[i, idx[i,j]] on (8, 128) -------------
    x = jnp.asarray(rng.normal(size=(8, 128)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, 128, (8, 128)), jnp.int32)

    def k_lane(x_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=1)

    out = run("lane_gather_8x128", k_lane, ((8, 128), jnp.float32), x, idx)
    if out is not None:
        ref = np.take_along_axis(np.asarray(x), np.asarray(idx), axis=1)
        print(json.dumps({"probe": "lane_gather_correct", "ok": bool(np.array_equal(out, ref))}), flush=True)

    # --- 2. sublane gather: out[i,j] = x[idx[i,j], j] on (1024, 128) --------
    S = 1024
    x2 = jnp.asarray(rng.normal(size=(S, 128)), jnp.float32)
    idx2 = jnp.asarray(rng.integers(0, S, (S, 128)), jnp.int32)

    def k_sub(x_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=0)

    out = run(f"sublane_gather_{S}x128", k_sub, ((S, 128), jnp.float32), x2, idx2)
    if out is not None:
        ref = np.take_along_axis(np.asarray(x2), np.asarray(idx2), axis=0)
        print(json.dumps({"probe": "sublane_gather_correct", "ok": bool(np.array_equal(out, ref))}), flush=True)

    # --- 3. composition: arbitrary 131072-entry lookup for a (8,128) tile --
    tab = jnp.asarray(rng.normal(size=(S, 128)), jnp.float32)
    q = jnp.asarray(rng.integers(0, S * 128, (8, 128)), jnp.int32)

    def k_full(tab_ref, q_ref, o_ref):
        qq = q_ref[:]
        col = qq % 128
        row = qq // 128
        t = tab_ref[:]
        acc = jnp.zeros((8, 128), jnp.float32)
        for i in range(8):  # one 128-query slab at a time
            ci = jnp.broadcast_to(col[i : i + 1, :], t.shape)
            z = jnp.take_along_axis(t, ci, axis=1)  # (S, 128)
            ri = jnp.broadcast_to(row[i : i + 1, :], t.shape)
            zz = jnp.take_along_axis(z, ri, axis=0)[0:1, :]
            acc = jax.lax.dynamic_update_slice(acc, zz, (i, 0))
        o_ref[:] = acc

    out = run("full_gather_131072", k_full, ((8, 128), jnp.float32), tab, q)
    if out is not None:
        flat = np.asarray(tab).reshape(-1)
        ref = flat[np.asarray(q)]
        print(json.dumps({"probe": "full_gather_correct", "ok": bool(np.array_equal(out, ref))}), flush=True)

        # Timing: loop the composition in-kernel to estimate per-lookup cost.
        def k_timed(tab_ref, q_ref, o_ref):
            def body(it, acc):
                qq = (q_ref[:] + it) % (S * 128)
                col = qq % 128
                row = qq // 128
                t = tab_ref[:]
                for i in range(8):
                    ci = jnp.broadcast_to(col[i : i + 1, :], t.shape)
                    z = jnp.take_along_axis(t, ci, axis=1)
                    ri = jnp.broadcast_to(row[i : i + 1, :], t.shape)
                    zz = jnp.take_along_axis(z, ri, axis=0)[0:1, :]
                    acc = acc + jnp.pad(zz, ((i, 7 - i), (0, 0)))
                return acc

            o_ref[:] = jax.lax.fori_loop(0, 100, body, jnp.zeros((8, 128), jnp.float32))

        f = pl.pallas_call(
            k_timed,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        jf = jax.jit(f)
        np.asarray(jf(tab, q))
        t0 = time.time()
        np.asarray(jf(tab, q))
        dt = time.time() - t0
        # 100 iters x 1024 lookups
        print(json.dumps({"probe": "full_gather_ns_per_lookup", "value": round(dt / (100 * 1024) * 1e9, 1)}), flush=True)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    main()
