"""Probe 2: find the working envelope of tpu.dynamic_gather.

Probe 1 (tools/tpu_probe_gather.py) established: lane gather (axis 1,
(8,128)) lowers and is correct; sublane gather (axis 0) at (1024,128)
fails with a remote-compile 500. This sweeps sizes/axes to find the
boundary, and times the largest working arbitrary-gather composition.
One TPU job; run alone.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def probe(name, kernel, out_sd, args, check=None):
    try:
        f = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(*out_sd),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in args],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        t0 = time.time()
        out = np.asarray(jax.jit(f)(*args))
        ok = True if check is None else bool(check(out))
        print(json.dumps({"probe": name, "ok": ok, "s": round(time.time() - t0, 1)}), flush=True)
        return ok
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"probe": name, "ok": False, "err": str(e).split("\n")[0][:160]}), flush=True)
        return False


def main():
    rng = np.random.default_rng(0)

    # Sublane gather at increasing depth.
    max_ok_s = 0
    for s in (8, 32, 128, 512):
        x = jnp.asarray(rng.normal(size=(s, 128)), jnp.float32)
        idx = jnp.asarray(rng.integers(0, s, (s, 128)), jnp.int32)

        def k(x_ref, i_ref, o_ref):
            o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=0)

        ref = np.take_along_axis(np.asarray(x), np.asarray(idx), axis=0)
        if probe(f"sub_{s}x128", k, ((s, 128), jnp.float32), (x, idx),
                 lambda o, ref=ref: np.array_equal(o, ref)):
            max_ok_s = s

    # Lane gather with wider minor dim (multi-vreg lanes).
    for w in (256, 512):
        x = jnp.asarray(rng.normal(size=(8, w)), jnp.float32)
        idx = jnp.asarray(rng.integers(0, w, (8, w)), jnp.int32)

        def k(x_ref, i_ref, o_ref):
            o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=1)

        ref = np.take_along_axis(np.asarray(x), np.asarray(idx), axis=1)
        probe(f"lane_8x{w}", k, ((8, w), jnp.float32), (x, idx),
              lambda o, ref=ref: np.array_equal(o, ref))

    if not max_ok_s:
        return

    # Arbitrary-gather composition from an (S,128) table for (8,128)
    # queries: lane-gather the column, sublane-gather the row (padding-sum
    # assembly — dynamic_update_slice doesn't lower in TC kernels).
    S = max_ok_s
    tab = jnp.asarray(rng.normal(size=(S, 128)), jnp.float32)
    q = jnp.asarray(rng.integers(0, S * 128, (8, 128)), jnp.int32)

    def k_full(tab_ref, q_ref, o_ref):
        qq = q_ref[:]
        col = qq % 128
        row = qq // 128
        t = tab_ref[:]
        acc = jnp.zeros((8, 128), jnp.float32)
        for i in range(8):
            ci = jnp.broadcast_to(col[i : i + 1, :], t.shape)
            z = jnp.take_along_axis(t, ci, axis=1)
            ri = jnp.broadcast_to(row[i : i + 1, :], t.shape)
            zz = jnp.take_along_axis(z, ri, axis=0)[0:1, :]
            acc = acc + jnp.pad(zz, ((i, 7 - i), (0, 0)))
        o_ref[:] = acc

    flat = np.asarray(tab).reshape(-1)
    refq = flat[np.asarray(q)]
    ok = probe(f"full_{S * 128}", k_full, ((8, 128), jnp.float32), (tab, q),
               lambda o: np.array_equal(o, refq))
    if not ok:
        return

    # Time it: 100 composed lookups of 1024 queries in-kernel.
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
    print(json.dumps({"probe": f"ns_per_lookup_S{S}", "value": round(dt / (100 * 1024) * 1e9, 1)}), flush=True)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    main()
