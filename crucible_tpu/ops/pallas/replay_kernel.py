"""In-Pallas differentiable REPLAY step with a hand-written backward kernel.

The jnp decision replay (models/replay.trace_replay) is the gradient path's
workhorse, but its winner-attribute fetch is an HBM-bound one-hot matmul
(~5 ns/lane, ops/gather.take_rows_mm) re-materialized by the rematerializing
backward every bounce — the bucketed replay backward was ~1.0 s of the
1.61 s deep-budget chunk (BASELINE.md r5 notes). This module moves the
replay INSIDE one `pl.pallas_call`: the sphere attribute table stays
VMEM-resident for the tile's whole lifetime, the per-bounce fetch is an
in-kernel one-hot MXU contraction (bit-exact through bf16 passes — one
nonzero product per output, megakernel.py MXU_FETCH argument), and the
backward is a second kernel that (1) re-runs the forward, checkpointing the
per-bounce (o, d, throughput) carry into VMEM scratch, then (2) walks the
bounces in reverse applying the per-bounce VJP with the table gradient
accumulated as a second MXU contraction (one_hot x g_srow^T) — zero HBM
traffic per bounce on either side.

Semantics: op-for-op mirror of trace_replay's sphere fast path (solid /
one-level-checker textures, default-gradient sky, static scenes), i.e. the
recursive attenuation product of src/camera/ray_casting.rs:112-152 with
every discrete decision frozen from the packed records (models/replay.py
F_* layout). Per-lane radiance bit-matches the jnp replay (verified in
tests/test_replay.py); gradients match to f32 reduction-order tolerance
(the table cotangent sums tiles sequentially instead of one big matmul).

Scope (static predicate `supported`): sphere-only scenes, not animated,
no image textures / nested checkers / equirect sky, table rows <=
MAX_TABLE_ROWS (the (N, TILE) one-hot must fit VMEM). Everything else
falls back to the jnp replay — same estimator, same gradients.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import numpy as np

from crucible_tpu.ops.pallas.megakernel import (
    TILE,
    C_IN,
    _pcg4d,
    _unit_f32,
    STREAM_BOUNCE_BASE,
)

CHECKER = np.float32(1)  # models/textures.py kind id
METAL = np.float32(1)
DIELECTRIC = np.float32(2)
T_MIN = np.float32(1.0e-3)
TWO_PI = np.float32(2.0 * np.pi)

# The (N, TILE) one-hot is the kernel's big VMEM tenant (N*TILE*4 B); 2048
# rows = 4 MB. Larger tables (sphere_stress 7808) keep the jnp replay.
MAX_TABLE_ROWS = 2048

# Table channels the bounce math reads (integrator.make_sphere_table
# layout). Both kernel layouts materialize exactly these rows.
USED = (
    0, 1, 2, 3, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17,
    18, 19, 20, 21, 22, 23,
)
NUSE = len(USED)

# Lane-BLOCKED layout (r5 final): per-lane state shaped (SUB, LANES) — one
# full f32 vreg per quantity — instead of (1, TILE) rows that occupy 4
# vregs at 1/8 sublane occupancy. Elementwise bounce math is the kernel's
# bound (CLAUDE.md), so full vregs are ~4x fewer VPU instructions per lane.
SUB = 8
LANES = 128
BTILE = SUB * LANES


def _blocked_default() -> bool:
    import os

    v = os.environ.get("CRUCIBLE_REPLAY_BLOCKED", "1").lower()
    return v not in ("0", "false", "off")


def supported(sd, n_rows: int) -> bool:
    """Static predicate: can this scene's replay run in-kernel?"""
    import os

    max_rows = int(
        os.environ.get("CRUCIBLE_REPLAY_KERNEL_ROWS", MAX_TABLE_ROWS)
    )
    return (
        sd.num_tris == 0
        and not sd.animated
        and not sd.motion_exact
        and len(sd.tex.images) == 0
        and sd.tex.max_nest <= 1
        and sd.sky_kind == 0  # default-gradient sky only
        and n_rows <= max_rows
    )


def _decode(word):
    """Packed record word (models/replay.py layout) -> decision dict."""
    return dict(
        idx=jax.lax.shift_right_logical(word, 8),
        alive=(word & 1) > 0,
        hit=(word & 2) > 0,
        cont=(word & 8) > 0,
        front=(word & 16) > 0,
        refl=(word & 32) > 0,
        degen=(word & 64) > 0,
        root1=(word & 128) > 0,
    )


def _uniform3(pix, smp, stream, seed):
    x, y, z, _ = _pcg4d(
        pix, smp,
        jnp.broadcast_to(stream, pix.shape),
        jnp.broadcast_to(seed, pix.shape),
    )
    return _unit_f32(x), _unit_f32(y), _unit_f32(z)


def _ch_from_srow(srow):
    """(32, T) fetched winner rows -> channel dict (the _bounce input)."""
    return {c: srow[c : c + 1, :] for c in USED}


def _bounce(carry, ch, dec, u1, u2, u_dec, accumulate: bool):
    """One replay bounce on per-lane component blocks.

    Op-for-op mirror of trace_replay's scan step (sphere fast path) +
    materials.scatter with forced decisions, so per-lane values bit-match
    the jnp replay. ``ch`` maps table channel -> differentiable winner
    values with the lane shape of the carry ((1, T) rows in the legacy
    layout, (SUB, LANES) blocks in the lane-blocked layout — the per-lane
    op sequence is identical either way); `dec` carries the frozen
    decisions (integers — no tangents).

    Returns (carry', (dr, dg, db)) — the radiance increments are zeros
    rows when ``accumulate`` is False (a bucket re-walking its head rows;
    replay_bucketed's accum_from contract).
    """
    ox, oy, oz, dx, dy, dz, tx, ty, tz = carry

    def row(c):
        return ch[c]

    hit, cont, front = dec["hit"], dec["cont"], dec["front"]

    # Winner quadratic -> recorded root (trace_replay lines: the implicit-
    # function t estimator on the primal tape; src/objects/sphere.rs:84-94).
    cwx, cwy, cwz, rw = row(0), row(1), row(2), row(3)
    a_q = dx * dx + dy * dy + dz * dz
    ocx, ocy, ocz = cwx - ox, cwy - oy, cwz - oz
    h_q = dx * ocx + dy * ocy + dz * ocz
    c_q = (ocx * ocx + ocy * ocy + ocz * ocz) - rw * rw
    disc = h_q * h_q - a_q * c_q
    pos = disc > 0.0
    sqrtd = jnp.where(pos, jnp.sqrt(jnp.where(pos, disc, 1.0)), 0.0)
    t_sph = (h_q + jnp.where(dec["root1"], sqrtd, -sqrtd)) / a_q

    t_sh = jnp.where(hit, t_sph, 1.0)
    hx, hy, hz = ox + t_sh * dx, oy + t_sh * dy, oz + t_sh * dz
    rmax = jnp.maximum(rw, 1e-20)
    nsx, nsy, nsz = (hx - cwx) / rmax, (hy - cwy) / rmax, (hz - cwz) / rmax
    nx = jnp.where(front, nsx, -nsx)
    ny = jnp.where(front, nsy, -nsy)
    nz = jnp.where(front, nsz, -nsz)

    # Unit incoming direction (vec.unit eps=1e-20; shared by sky + diel).
    dlen = jnp.maximum(jnp.sqrt(a_q), 1e-20)
    udx, udy, udz = dx / dlen, dy / dlen, dz / dlen

    if accumulate:
        # Default-gradient sky (skybox.default_gradient) + emission.
        a_sky = 0.5 * (udy + 1.0)
        one_m = 1.0 - a_sky
        skyr = one_m * 1.0 + a_sky * 0.5
        skyg = one_m * 1.0 + a_sky * 0.7
        skyb = one_m * 1.0 + a_sky * 1.0
        cr = jnp.where(hit, row(10), skyr)
        cg = jnp.where(hit, row(11), skyg)
        cb = jnp.where(hit, row(12), skyb)
        alive = dec["alive"]
        dr = jnp.where(alive, tx * cr, 0.0)
        dg = jnp.where(alive, ty * cg, 0.0)
        db = jnp.where(alive, tz * cb, 0.0)
    else:
        zero = jnp.zeros_like(tx)
        dr = dg = db = zero

    # Albedo fast path (trace_replay's no-image branch).
    inv_scale = row(17)
    xf = jnp.floor(inv_scale * hx).astype(jnp.int32)
    yf = jnp.floor(inv_scale * hy).astype(jnp.int32)
    zf = jnp.floor(inv_scale * hz).astype(jnp.int32)
    is_even = (xf + yf + zf) % 2 == 0
    is_checker = row(13) == CHECKER
    alr = jnp.where(is_checker, jnp.where(is_even, row(18), row(21)), row(14))
    alg = jnp.where(is_checker, jnp.where(is_even, row(19), row(22)), row(15))
    alb = jnp.where(is_checker, jnp.where(is_even, row(20), row(23)), row(16))

    # Scatter with frozen decisions (materials.scatter op order).
    rz = 1.0 - 2.0 * u1
    rr = jnp.sqrt(jnp.maximum(0.0, 1.0 - rz * rz))
    rphi = TWO_PI * u2
    rux = rr * jnp.cos(rphi)
    ruy = rr * jnp.sin(rphi)
    ruz = rz

    # Lambertian.
    degen = dec["degen"]
    lamx = jnp.where(degen, nx, nx + rux)
    lamy = jnp.where(degen, ny, ny + ruy)
    lamz = jnp.where(degen, nz, nz + ruz)
    prob = row(9)
    pmax = jnp.maximum(prob, 1e-8)
    latr, latg, latb = alr / pmax, alg / pmax, alb / pmax

    # Metal (vec.reflect on the raw direction, then unit + fuzz).
    fuzz = row(7)
    d_dot_n = dx * nx + dy * ny + dz * nz
    refx = dx - 2.0 * d_dot_n * nx
    refy = dy - 2.0 * d_dot_n * ny
    refz = dz - 2.0 * d_dot_n * nz
    rlen = jnp.maximum(
        jnp.sqrt((refx * refx + refy * refy) + refz * refz), 1e-20
    )
    metx = refx / rlen + fuzz * rux
    mety = refy / rlen + fuzz * ruy
    metz = refz / rlen + fuzz * ruz

    # Dielectric (Snell + recorded reflect choice).
    ior = row(8)
    ri = jnp.where(front, 1.0 / ior, ior)
    ud_dot_n = udx * nx + udy * ny + udz * nz
    cos_t = jnp.minimum(-ud_dot_n, 1.0)
    drefx = udx - 2.0 * ud_dot_n * nx
    drefy = udy - 2.0 * ud_dot_n * ny
    drefz = udz - 2.0 * ud_dot_n * nz
    ppx = ri * (udx + cos_t * nx)
    ppy = ri * (udy + cos_t * ny)
    ppz = ri * (udz + cos_t * nz)
    pp_sq = (ppx * ppx + ppy * ppy) + ppz * ppz
    par = -jnp.sqrt(jnp.maximum(jnp.abs(1.0 - pp_sq), 1e-12))
    refrx = ppx + par * nx
    refry = ppy + par * ny
    refrz = ppz + par * nz
    refl = dec["refl"]
    diex = jnp.where(refl, drefx, refrx)
    diey = jnp.where(refl, drefy, refry)
    diez = jnp.where(refl, drefz, refrz)

    mat = row(6)
    is_metal = mat == METAL
    is_diel = mat == DIELECTRIC
    ndx = jnp.where(is_diel, diex, jnp.where(is_metal, metx, lamx))
    ndy = jnp.where(is_diel, diey, jnp.where(is_metal, mety, lamy))
    ndz = jnp.where(is_diel, diez, jnp.where(is_metal, metz, lamz))
    one = jnp.ones_like(alr)
    atr = jnp.where(is_diel, one, jnp.where(is_metal, alr, latr))
    atg = jnp.where(is_diel, one, jnp.where(is_metal, alg, latg))
    atb = jnp.where(is_diel, one, jnp.where(is_metal, alb, latb))

    tx2 = jnp.where(cont, tx * atr, tx)
    ty2 = jnp.where(cont, ty * atg, ty)
    tz2 = jnp.where(cont, tz * atb, tz)
    ox2 = jnp.where(cont, hx, ox)
    oy2 = jnp.where(cont, hy, oy)
    oz2 = jnp.where(cont, hz, oz)
    dx2 = jnp.where(cont, ndx, dx)
    dy2 = jnp.where(cont, ndy, dy)
    dz2 = jnp.where(cont, ndz, dz)
    return (ox2, oy2, oz2, dx2, dy2, dz2, tx2, ty2, tz2), (dr, dg, db)


def _split3(x):
    """Exact 3-way bf16 split of f32 values: x == hi + mid + lo (f32
    mantissa 24 bits = 3 x bf16's 8; residuals are exactly representable
    for normal-range table values — the same decomposition
    Precision.HIGHEST performs internally)."""
    hi = x.astype(jnp.bfloat16)
    r1 = x - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, mid, lo


def _onehot(idx, n):
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, TILE), 0)
    return jnp.where(rows == idx, 1.0, 0.0)


def _dot_nt(a, b):
    """(N, C) x (N, T) -> (C, T), one bf16 MXU pass, f32 accumulate."""
    return jax.lax.dot_general(
        a,
        b,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _fetch(table3, idx, n):
    """(32, T) winner rows via one-hot MXU contractions — bit-exact in
    THREE bf16 passes instead of Precision.HIGHEST's nine: the one-hot is
    exact in bf16 (1.0/0.0) so only the TABLE needs splitting (_split3);
    each pass has one nonzero product per output and the three f32 terms
    sum back to the original value exactly (verified bit-equal to a
    HIGHEST f32 contraction in tests). HIGHEST's nine passes were the
    kernel's dominant MXU cost (replayprof r5)."""
    oh = _onehot(idx, n)
    ohb = oh.astype(jnp.bfloat16)
    hi, mid, lo = table3
    srow = (_dot_nt(hi, ohb) + _dot_nt(mid, ohb)) + _dot_nt(lo, ohb)
    return oh, srow


def _fwd_kernel(
    smem_ref,  # (8,) int32 [seed, ...]
    pix_ref,  # (1, T) int32
    smp_ref,  # (1, T) int32
    valid_ref,  # (1, T) int32 initial-throughput mask
    o_ref,  # (3, T) f32 ray origins
    d_ref,  # (3, T) f32 ray directions
    rec_ref,  # (depth, T) int32 packed records
    table_ref,  # (N, 32) f32
    rad_ref,  # OUT (3, T) f32
    *,
    depth: int,
    accum_from: int,
    n: int,
):
    seed = smem_ref[0]
    pix = pix_ref[:]
    smp = smp_ref[:]
    thr0 = jnp.where(valid_ref[:] > 0, 1.0, 0.0)
    carry0 = (
        o_ref[0:1, :], o_ref[1:2, :], o_ref[2:3, :],
        d_ref[0:1, :], d_ref[1:2, :], d_ref[2:3, :],
        thr0, thr0, thr0,
    )
    table3 = _split3(table_ref[:, :])  # loop-invariant, hoisted

    def step(it, carry, accumulate):
        word = rec_ref[pl.ds(it, 1), :]
        dec = _decode(word)
        _, srow = _fetch(table3, dec["idx"], n)
        u1, u2, ud = _uniform3(pix, smp, STREAM_BOUNCE_BASE + it, seed)
        return _bounce(carry, _ch_from_srow(srow), dec, u1, u2, ud, accumulate)

    # Head rows below accum_from update the carry only (bucket re-walk).
    carry = jax.lax.fori_loop(
        0, accum_from,
        lambda it, c: step(it, c, False)[0],
        carry0,
    ) if accum_from > 0 else carry0

    zero = jnp.zeros((1, TILE), jnp.float32)

    def acc_body(it, state):
        carry, ar, ag, ab = state
        carry, (dr, dg, db) = step(it, carry, True)
        return (carry, ar + dr, ag + dg, ab + db)

    _, ar, ag, ab = jax.lax.fori_loop(
        accum_from, depth, acc_body, (carry, zero, zero, zero)
    )
    rad_ref[0:1, :] = ar
    rad_ref[1:2, :] = ag
    rad_ref[2:3, :] = ab


def _bwd_kernel(
    smem_ref,
    pix_ref,
    smp_ref,
    valid_ref,
    o_ref,
    d_ref,
    rec_ref,
    table_ref,
    g_rad_ref,  # (3, T) f32 incoming radiance cotangent
    gtab_ref,  # OUT (N, 32) f32 — accumulated across the whole grid
    go_ref,  # OUT (3, T) f32
    gd_ref,  # OUT (3, T) f32
    *scratch,  # 9 x VMEM (depth, T) carries + VMEM (depth*32, T) srows
    depth: int,
    accum_from: int,
    n: int,
):
    carry_scratch = scratch[:9]
    srow_scratch = scratch[9]
    seed = smem_ref[0]
    pix = pix_ref[:]
    smp = smp_ref[:]
    thr0 = jnp.where(valid_ref[:] > 0, 1.0, 0.0)
    carry0 = (
        o_ref[0:1, :], o_ref[1:2, :], o_ref[2:3, :],
        d_ref[0:1, :], d_ref[1:2, :], d_ref[2:3, :],
        thr0, thr0, thr0,
    )
    table3 = _split3(table_ref[:, :])

    def decode_at(it):
        word = rec_ref[pl.ds(it, 1), :]
        dec = _decode(word)
        u1, u2, ud = _uniform3(pix, smp, STREAM_BOUNCE_BASE + it, seed)
        return dec, u1, u2, ud

    # Phase 1: re-run the forward, checkpointing each bounce's ENTERING
    # carry AND its fetched winner rows into VMEM scratch (the carry is
    # one-way; caching srow saves the reverse sweep its re-fetch).
    def fwd_body(it, carry):
        for k in range(9):
            carry_scratch[k][pl.ds(it, 1), :] = carry[k]
        dec, u1, u2, ud = decode_at(it)
        _, srow = _fetch(table3, dec["idx"], n)
        srow_scratch[pl.ds(it * C_IN, C_IN), :] = srow
        # accumulate=False everywhere: phase 1 only needs the carries.
        carry, _ = _bounce(carry, _ch_from_srow(srow), dec, u1, u2, ud, False)
        return carry

    jax.lax.fori_loop(0, depth, fwd_body, carry0)

    # Phase 2: reverse sweep. rad = sum of per-bounce increments, so every
    # accumulated bounce's radiance cotangent is g_rad itself; the carry
    # cotangent chains backward through the per-bounce VJP. The table
    # cotangent leaves through g_srow -> one_hot contraction per bounce.
    g_rad = (g_rad_ref[0:1, :], g_rad_ref[1:2, :], g_rad_ref[2:3, :])
    zero = jnp.zeros((1, TILE), jnp.float32)
    zero_rad = (zero, zero, zero)
    g_carry0 = (zero,) * 9
    gtab0 = jnp.zeros((n, C_IN), jnp.float32)

    def bwd_step(it, g_carry, gtab, acc: bool):
        dec, u1, u2, ud = decode_at(it)
        oh = _onehot(dec["idx"], n).astype(jnp.bfloat16)
        srow = srow_scratch[pl.ds(it * C_IN, C_IN), :]
        carry_in = tuple(
            carry_scratch[k][pl.ds(it, 1), :] for k in range(9)
        )
        f = lambda c, s: _bounce(c, _ch_from_srow(s), dec, u1, u2, ud, acc)
        _, vjp_f = jax.vjp(f, carry_in, srow)
        g_in, g_srow = vjp_f((g_carry, g_rad if acc else zero_rad))
        # Table cotangent: one-hot x 3-way-split(g_srow) — three bf16
        # passes summing the same exact per-term products HIGHEST would
        # (the one-hot side is exact in bf16).
        ghi, gmid, glo = _split3(g_srow)

        def dot_tc(gs):
            return jax.lax.dot_general(
                oh,
                gs,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        gtab = gtab + ((dot_tc(ghi) + dot_tc(gmid)) + dot_tc(glo))
        return g_in, gtab

    # The accumulate/carry-only boundary is STATIC (accum_from), so the
    # reverse sweep is two fori_loops — no per-row cond.
    def bwd_acc(i, state):
        g_carry, gtab = state
        return bwd_step(depth - 1 - i, g_carry, gtab, True)

    g_carry, gtab = jax.lax.fori_loop(
        0, depth - accum_from, bwd_acc, (g_carry0, gtab0)
    )
    if accum_from > 0:
        def bwd_head(i, state):
            g_carry, gtab = state
            return bwd_step(accum_from - 1 - i, g_carry, gtab, False)

        g_carry, gtab = jax.lax.fori_loop(
            0, accum_from, bwd_head, (g_carry, gtab)
        )

    go_ref[0:1, :] = g_carry[0]
    go_ref[1:2, :] = g_carry[1]
    go_ref[2:3, :] = g_carry[2]
    gd_ref[0:1, :] = g_carry[3]
    gd_ref[1:2, :] = g_carry[4]
    gd_ref[2:3, :] = g_carry[5]

    # Accumulate this tile's table cotangent (sequential TPU grid: the
    # revisited output block stays resident; init on the first step).
    @pl.when(pl.program_id(0) == 0)
    def _():
        gtab_ref[:, :] = jnp.zeros_like(gtab_ref)

    gtab_ref[:, :] = gtab_ref[:, :] + gtab


@functools.lru_cache(maxsize=None)
def _build(depth: int, accum_from: int, n: int, interpret: bool):
    """Cached custom_vjp callable for one static configuration."""

    std_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # smem
        pl.BlockSpec((1, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((3, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((3, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((depth, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((n, C_IN), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]

    def fwd_call(table, o3, d3, valid, pix, smp, rec, smem):
        r = pix.shape[1]
        grid = (r // TILE,)
        (rad,) = pl.pallas_call(
            functools.partial(
                _fwd_kernel, depth=depth, accum_from=accum_from, n=n
            ),
            grid=grid,
            in_specs=std_specs,
            out_specs=[
                pl.BlockSpec(
                    (3, TILE), lambda i: (0, i), memory_space=pltpu.VMEM
                ),
            ],
            out_shape=[jax.ShapeDtypeStruct((3, r), jnp.float32)],
            interpret=interpret,
        )(smem, pix, smp, valid, o3, d3, rec, table)
        return rad

    def bwd_call(table, o3, d3, valid, pix, smp, rec, smem, g_rad):
        r = pix.shape[1]
        grid = (r // TILE,)
        gtab, go3, gd3 = pl.pallas_call(
            functools.partial(
                _bwd_kernel, depth=depth, accum_from=accum_from, n=n
            ),
            grid=grid,
            in_specs=std_specs
            + [
                pl.BlockSpec(
                    (3, TILE), lambda i: (0, i), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=[
                pl.BlockSpec((n, C_IN), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((3, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((3, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((n, C_IN), jnp.float32),
                jax.ShapeDtypeStruct((3, r), jnp.float32),
                jax.ShapeDtypeStruct((3, r), jnp.float32),
            ],
            scratch_shapes=[pltpu.VMEM((depth, TILE), jnp.float32)] * 9
            + [pltpu.VMEM((depth * C_IN, TILE), jnp.float32)],
            interpret=interpret,
        )(smem, pix, smp, valid, o3, d3, rec, table, g_rad)
        return gtab, go3, gd3

    @jax.custom_vjp
    def replay(table, o3, d3, valid, pix, smp, rec, smem):
        return fwd_call(table, o3, d3, valid, pix, smp, rec, smem)

    def replay_fwd(table, o3, d3, valid, pix, smp, rec, smem):
        rad = fwd_call(table, o3, d3, valid, pix, smp, rec, smem)
        return rad, (table, o3, d3, valid, pix, smp, rec, smem)

    def replay_bwd(res, g_rad):
        table, o3, d3, valid, pix, smp, rec, smem = res
        gtab, go3, gd3 = bwd_call(
            table, o3, d3, valid, pix, smp, rec, smem, g_rad
        )
        return gtab, go3, gd3, None, None, None, None, None

    replay.defvjp(replay_fwd, replay_bwd)

    # GIVEN-forward variant (the fused record+radiance path, r5): the
    # megakernel's record pass already accumulated this batch's forward
    # radiance in-kernel (run_megakernel_record(radiance=True)), so the
    # primal here is just that value — no forward kernel dispatch — while
    # the backward kernel differentiates the same frozen-decision
    # estimator from the records. The primal differs from the backward's
    # own recomputation only by f32/FMA association (both are valid values
    # of the same estimator).
    @jax.custom_vjp
    def replay_given(table, o3, d3, valid, pix, smp, rec, smem, rad3):
        return rad3

    def replay_given_fwd(table, o3, d3, valid, pix, smp, rec, smem, rad3):
        return rad3, (table, o3, d3, valid, pix, smp, rec, smem)

    def replay_given_bwd(res, g_rad):
        table, o3, d3, valid, pix, smp, rec, smem = res
        gtab, go3, gd3 = bwd_call(
            table, o3, d3, valid, pix, smp, rec, smem, g_rad
        )
        return gtab, go3, gd3, None, None, None, None, None, None

    replay_given.defvjp(replay_given_fwd, replay_given_bwd)
    replay.given = replay_given
    return replay


# ---------------------------------------------------------------------------
# Lane-BLOCKED layout (r5 final): state as (SUB, LANES) full-vreg blocks.
#
# The legacy kernel's (1, TILE) rows occupy 4 vregs each with 1 of 8
# sublanes live, and the elementwise bounce math — not the MXU fetch — is
# the kernel's measured bound (CLAUDE.md; replayprof). Blocking 1024 lanes
# as (8, 128) makes every per-lane op a single full vreg instruction. The
# price is the fetch: the one-hot contraction runs once per sublane row
# ((N,32)x(N,128) -> (32,128), same total MACs) and the 22 used channels
# are assembled into (8, 128) blocks by sublane concatenation (and the
# table cotangent disassembled the same way in reverse).
# ---------------------------------------------------------------------------


def _onehot_l(idx_row, n):
    """(1, LANES) winner ids -> (n, LANES) f32 one-hot."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, LANES), 0)
    return jnp.where(rows == idx_row, 1.0, 0.0)


def _fetch_blk(table3, idx, n):
    """Winner channels for a (SUB, LANES) lane block.

    Same exact arithmetic as `_fetch` (3-way split table, one nonzero
    product per output, exact 3-term f32 reconstruction) applied per
    sublane row, so per-lane values are bit-identical to the legacy
    layout's fetch."""
    hi, mid, lo = table3
    parts = []
    for k in range(SUB):
        ohb = _onehot_l(idx[k : k + 1, :], n).astype(jnp.bfloat16)
        parts.append(
            (_dot_nt(hi, ohb) + _dot_nt(mid, ohb)) + _dot_nt(lo, ohb)
        )
    return {
        c: jnp.concatenate(
            [parts[k][c : c + 1, :] for k in range(SUB)], axis=0
        )
        for c in USED
    }


def _fwd_kernel_blk(
    smem_ref,  # (8,) int32 [seed, ...]
    pix_ref,  # (SUB, LANES) int32
    smp_ref,
    valid_ref,
    ox_ref, oy_ref, oz_ref,  # (SUB, LANES) f32 origin components
    dx_ref, dy_ref, dz_ref,  # (SUB, LANES) f32 direction components
    rec_ref,  # (depth*SUB, LANES) int32, tile-major packed records
    table_ref,  # (N, 32) f32
    rr_ref, rg_ref, rb_ref,  # OUT (SUB, LANES) f32
    *,
    depth: int,
    accum_from: int,
    n: int,
):
    seed = smem_ref[0]
    pix = pix_ref[:, :]
    smp = smp_ref[:, :]
    thr0 = jnp.where(valid_ref[:, :] > 0, 1.0, 0.0)
    carry0 = (
        ox_ref[:, :], oy_ref[:, :], oz_ref[:, :],
        dx_ref[:, :], dy_ref[:, :], dz_ref[:, :],
        thr0, thr0, thr0,
    )
    table3 = _split3(table_ref[:, :])

    def step(it, carry, accumulate):
        word = rec_ref[pl.ds(it * SUB, SUB), :]
        dec = _decode(word)
        ch = _fetch_blk(table3, dec["idx"], n)
        u1, u2, ud = _uniform3(pix, smp, STREAM_BOUNCE_BASE + it, seed)
        return _bounce(carry, ch, dec, u1, u2, ud, accumulate)

    carry = jax.lax.fori_loop(
        0, accum_from,
        lambda it, c: step(it, c, False)[0],
        carry0,
    ) if accum_from > 0 else carry0

    zero = jnp.zeros((SUB, LANES), jnp.float32)

    def acc_body(it, state):
        carry, ar, ag, ab = state
        carry, (dr, dg, db) = step(it, carry, True)
        return (carry, ar + dr, ag + dg, ab + db)

    _, ar, ag, ab = jax.lax.fori_loop(
        accum_from, depth, acc_body, (carry, zero, zero, zero)
    )
    rr_ref[:, :] = ar
    rg_ref[:, :] = ag
    rb_ref[:, :] = ab


def _bwd_kernel_blk(
    smem_ref,
    pix_ref,
    smp_ref,
    valid_ref,
    ox_ref, oy_ref, oz_ref,
    dx_ref, dy_ref, dz_ref,
    rec_ref,
    table_ref,
    grr_ref, grg_ref, grb_ref,  # (SUB, LANES) incoming radiance cotangent
    gtab_ref,  # OUT (N, 32) f32 — accumulated across the whole grid
    gox_ref, goy_ref, goz_ref,  # OUT (SUB, LANES)
    gdx_ref, gdy_ref, gdz_ref,  # OUT (SUB, LANES)
    *scratch,  # 9 x VMEM (depth*SUB, LANES) carries + (depth*NUSE*SUB, LANES) chans
    depth: int,
    accum_from: int,
    n: int,
):
    carry_scratch = scratch[:9]
    ch_scratch = scratch[9]
    seed = smem_ref[0]
    pix = pix_ref[:, :]
    smp = smp_ref[:, :]
    thr0 = jnp.where(valid_ref[:, :] > 0, 1.0, 0.0)
    carry0 = (
        ox_ref[:, :], oy_ref[:, :], oz_ref[:, :],
        dx_ref[:, :], dy_ref[:, :], dz_ref[:, :],
        thr0, thr0, thr0,
    )
    table3 = _split3(table_ref[:, :])

    def decode_at(it):
        word = rec_ref[pl.ds(it * SUB, SUB), :]
        dec = _decode(word)
        u1, u2, ud = _uniform3(pix, smp, STREAM_BOUNCE_BASE + it, seed)
        return dec, u1, u2, ud

    # Phase 1: re-run the forward, checkpointing each bounce's ENTERING
    # carry and its fetched channel blocks into VMEM scratch.
    def fwd_body(it, carry):
        for k in range(9):
            carry_scratch[k][pl.ds(it * SUB, SUB), :] = carry[k]
        dec, u1, u2, ud = decode_at(it)
        ch = _fetch_blk(table3, dec["idx"], n)
        for j, _c in enumerate(USED):
            ch_scratch[pl.ds((it * NUSE + j) * SUB, SUB), :] = ch[_c]
        carry, _ = _bounce(carry, ch, dec, u1, u2, ud, False)
        return carry

    jax.lax.fori_loop(0, depth, fwd_body, carry0)

    # Phase 2: reverse sweep (identical structure to _bwd_kernel); the
    # table cotangent disassembles the per-channel blocks back into
    # per-sublane (32, LANES) rows and contracts each against its one-hot.
    g_rad = (grr_ref[:, :], grg_ref[:, :], grb_ref[:, :])
    zero = jnp.zeros((SUB, LANES), jnp.float32)
    zero_rad = (zero, zero, zero)
    g_carry0 = (zero,) * 9
    gtab0 = jnp.zeros((n, C_IN), jnp.float32)
    zrow = jnp.zeros((1, LANES), jnp.float32)

    def bwd_step(it, g_carry, gtab, acc: bool):
        dec, u1, u2, ud = decode_at(it)
        ch = {
            _c: ch_scratch[pl.ds((it * NUSE + j) * SUB, SUB), :]
            for j, _c in enumerate(USED)
        }
        carry_in = tuple(
            carry_scratch[k][pl.ds(it * SUB, SUB), :] for k in range(9)
        )
        f = lambda c, chv: _bounce(c, chv, dec, u1, u2, ud, acc)
        _, vjp_f = jax.vjp(f, carry_in, ch)
        g_in, g_ch = vjp_f((g_carry, g_rad if acc else zero_rad))
        idx = dec["idx"]

        def dot_tc(oh, gs):
            return jax.lax.dot_general(
                oh,
                gs,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        for k in range(SUB):
            ohb = _onehot_l(idx[k : k + 1, :], n).astype(jnp.bfloat16)
            gs = jnp.concatenate(
                [
                    (g_ch[c][k : k + 1, :] if c in g_ch else zrow)
                    for c in range(C_IN)
                ],
                axis=0,
            )
            ghi, gmid, glo = _split3(gs)
            gtab = gtab + (
                (dot_tc(ohb, ghi) + dot_tc(ohb, gmid)) + dot_tc(ohb, glo)
            )
        return g_in, gtab

    def bwd_acc(i, state):
        g_carry, gtab = state
        return bwd_step(depth - 1 - i, g_carry, gtab, True)

    g_carry, gtab = jax.lax.fori_loop(
        0, depth - accum_from, bwd_acc, (g_carry0, gtab0)
    )
    if accum_from > 0:
        def bwd_head(i, state):
            g_carry, gtab = state
            return bwd_step(accum_from - 1 - i, g_carry, gtab, False)

        g_carry, gtab = jax.lax.fori_loop(
            0, accum_from, bwd_head, (g_carry, gtab)
        )

    gox_ref[:, :] = g_carry[0]
    goy_ref[:, :] = g_carry[1]
    goz_ref[:, :] = g_carry[2]
    gdx_ref[:, :] = g_carry[3]
    gdy_ref[:, :] = g_carry[4]
    gdz_ref[:, :] = g_carry[5]

    @pl.when(pl.program_id(0) == 0)
    def _():
        gtab_ref[:, :] = jnp.zeros_like(gtab_ref)

    gtab_ref[:, :] = gtab_ref[:, :] + gtab


@functools.lru_cache(maxsize=None)
def _build_blk(depth: int, accum_from: int, n: int, interpret: bool):
    """Cached custom_vjp callable for the lane-blocked layout."""

    lane = pl.BlockSpec((SUB, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
    std_specs = (
        [pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [lane] * 3  # pix, smp, valid
        + [lane] * 6  # o / d components
        + [
            pl.BlockSpec(
                (depth * SUB, LANES), lambda i: (i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((n, C_IN), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ]
    )

    def fwd_call(table, comps, valid, pix, smp, rec, smem):
        rows = pix.shape[0]  # = Gtot * SUB
        grid = (rows // SUB,)
        rr, rg, rb = pl.pallas_call(
            functools.partial(
                _fwd_kernel_blk, depth=depth, accum_from=accum_from, n=n
            ),
            grid=grid,
            in_specs=std_specs,
            out_specs=[lane, lane, lane],
            out_shape=[jax.ShapeDtypeStruct((rows, LANES), jnp.float32)] * 3,
            interpret=interpret,
        )(smem, pix, smp, valid, *comps, rec, table)
        return jnp.stack(
            [rr.reshape(-1), rg.reshape(-1), rb.reshape(-1)], axis=0
        )

    def bwd_call(table, comps, valid, pix, smp, rec, smem, g_rad):
        rows = pix.shape[0]
        grid = (rows // SUB,)
        grr = g_rad[0].reshape(-1, LANES)
        grg = g_rad[1].reshape(-1, LANES)
        grb = g_rad[2].reshape(-1, LANES)
        out = pl.pallas_call(
            functools.partial(
                _bwd_kernel_blk, depth=depth, accum_from=accum_from, n=n
            ),
            grid=grid,
            in_specs=std_specs + [lane, lane, lane],
            out_specs=[
                pl.BlockSpec(
                    (n, C_IN), lambda i: (0, 0), memory_space=pltpu.VMEM
                ),
            ]
            + [lane] * 6,
            out_shape=[jax.ShapeDtypeStruct((n, C_IN), jnp.float32)]
            + [jax.ShapeDtypeStruct((rows, LANES), jnp.float32)] * 6,
            scratch_shapes=[pltpu.VMEM((depth * SUB, LANES), jnp.float32)] * 9
            + [pltpu.VMEM((depth * NUSE * SUB, LANES), jnp.float32)],
            interpret=interpret,
        )(smem, pix, smp, valid, *comps, rec, table, grr, grg, grb)
        return out[0], tuple(out[1:7])

    @jax.custom_vjp
    def replay(table, comps, valid, pix, smp, rec, smem):
        return fwd_call(table, comps, valid, pix, smp, rec, smem)

    def replay_fwd(table, comps, valid, pix, smp, rec, smem):
        rad = fwd_call(table, comps, valid, pix, smp, rec, smem)
        return rad, (table, comps, valid, pix, smp, rec, smem)

    def replay_bwd(res, g_rad):
        table, comps, valid, pix, smp, rec, smem = res
        gtab, gcomps = bwd_call(
            table, comps, valid, pix, smp, rec, smem, g_rad
        )
        return gtab, gcomps, None, None, None, None, None

    replay.defvjp(replay_fwd, replay_bwd)

    @jax.custom_vjp
    def replay_given(table, comps, valid, pix, smp, rec, smem, rad3):
        return rad3

    def replay_given_fwd(table, comps, valid, pix, smp, rec, smem, rad3):
        return rad3, (table, comps, valid, pix, smp, rec, smem)

    def replay_given_bwd(res, g_rad):
        table, comps, valid, pix, smp, rec, smem = res
        gtab, gcomps = bwd_call(
            table, comps, valid, pix, smp, rec, smem, g_rad
        )
        return gtab, gcomps, None, None, None, None, None, None

    replay_given.defvjp(replay_given_fwd, replay_given_bwd)
    replay.given = replay_given
    return replay


def trace_replay_mega(
    table,  # (N, 32) f32 differentiable sphere table
    o,  # (R, 3) f32 ray origins (differentiable)
    d,  # (R, 3) f32 ray directions (differentiable)
    pixel_ids,  # (R,) int ids
    sample_ids,  # (R,) int ids
    seed,
    rec,  # (depth, R) int32 packed records
    *,
    accum_from: int = 0,
    valid=None,  # (R,) bool initial-throughput mask (None = all live)
    interpret: bool = False,
    rad_given=None,  # (R, 3) precomputed forward radiance (fused record)
    blocked=None,  # None = CRUCIBLE_REPLAY_BLOCKED (default on)
):
    """Differentiable in-kernel replay -> radiance (R, 3).

    Drop-in for the jnp trace_replay on eligible scenes (see `supported`):
    same records, same estimator, bit-matching per-lane radiance. The
    throughput always starts at the 0/1 ``valid`` mask (the bucketed
    replay's thr_in contract — never a general float).

    ``blocked`` selects the lane-blocked (SUB, LANES) layout (default via
    CRUCIBLE_REPLAY_BLOCKED, on): same per-lane arithmetic, full-vreg
    elementwise occupancy."""
    if blocked is None:
        blocked = _blocked_default()
    r = o.shape[0]
    depth = rec.shape[0]
    n = table.shape[0]
    quantum = BTILE if blocked else TILE
    r_pad = ((r + quantum - 1) // quantum) * quantum

    def pad2(x, fill=0):
        if r_pad == r:
            return x
        return jnp.concatenate(
            [x, jnp.full((r_pad - r,) + x.shape[1:], fill, x.dtype)], axis=0
        )

    pix = pad2(pixel_ids.astype(jnp.int32))
    smp = pad2(sample_ids.astype(jnp.int32))
    valid_i = (
        jnp.ones((r,), jnp.int32)
        if valid is None
        else valid.astype(jnp.int32)
    )
    valid_i = pad2(valid_i)
    # Padding lanes carry a unit-z direction: their records are dead (all
    # gates closed -> exact zero radiance and cotangents) but the bounce
    # math must stay finite so no NaN leaks into the table gradient
    # through 0 * inf in the quadratic's backward.
    opad = pad2(o)
    dpad = pad2(d)
    if r_pad != r:
        dpad = dpad.at[r:, 2].set(1.0)
    recp = (
        rec
        if r_pad == r
        else jnp.concatenate(
            [rec, jnp.zeros((depth, r_pad - r), rec.dtype)], axis=1
        )
    )
    smem = jnp.zeros((8,), jnp.int32).at[0].set(
        jnp.asarray(seed, jnp.uint32).astype(jnp.int32)
    )
    if blocked:
        gtot = r_pad // BTILE
        comps = tuple(
            a[:, c].reshape(gtot * SUB, LANES)
            for a, c in ((opad, 0), (opad, 1), (opad, 2),
                         (dpad, 0), (dpad, 1), (dpad, 2))
        )
        # Records go tile-major so each grid step reads one contiguous
        # (depth*SUB, LANES) block.
        rec_t = (
            recp.reshape(depth, gtot, SUB, LANES)
            .transpose(1, 0, 2, 3)
            .reshape(gtot * depth * SUB, LANES)
        )
        fn = _build_blk(depth, int(accum_from), n, bool(interpret))
        args = (
            table,
            comps,
            valid_i.reshape(gtot * SUB, LANES),
            pix.reshape(gtot * SUB, LANES),
            smp.reshape(gtot * SUB, LANES),
            rec_t,
            smem,
        )
    else:
        fn = _build(depth, int(accum_from), n, bool(interpret))
        args = (
            table,
            opad.T,
            dpad.T,
            valid_i.reshape(1, r_pad),
            pix.reshape(1, r_pad),
            smp.reshape(1, r_pad),
            recp,
            smem,
        )
    if rad_given is not None:
        rad3 = pad2(jax.lax.stop_gradient(rad_given)).T
        rad = fn.given(*args, rad3)
    else:
        rad = fn(*args)
    return rad[:, :r].T
