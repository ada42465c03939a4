"""Keyframe timeline animation as data: authoring commands -> flat tracks.

The reference's most distinctive subsystem (src/timeline/, 1,382 LoC) stores
each animated quantity as a 4x4 matrix OF CLOSURES evaluated per ray
(SURVEY.md §2.6). Here a timeline is plain data lowered to padded arrays and
evaluated as vectorized gather+lerp — differentiable and jit-able for free.

Semantics preserved from ``combine_and_compute`` (timeline/mod.rs:233-263):

- value(t) = Scale(t) applied to Translate(t) applied to the origin.
- Translate is the PRODUCT of all translate transforms with interval start
  <= t — translation matrices commute into a SUM of per-keyframe deltas,
  each ramped by the clamped proportion of its validity interval
  (LERP: [prev_end, keyframe]; NERP: the degenerate [keyframe, keyframe]
  whose proportion is a step — utils/interval.py).
- Scale is the single MOST RECENT transform with start <= t, interpolating
  from the previous same-axis endpoint to the keyframe value. Axes not
  touched by that transform evaluate to identity — matching the reference,
  where each scale matrix carries 1.0 in untouched diagonal cells.
- Keyframe chaining: World space keys store delta = target - previous
  endpoint; Local keys store the delta directly
  (transform_builder.rs:365-428).
- Sphere radius rides the scale track (the reference's ``sphere scaler``
  puts r in matrix slot m44, matrix_builder.rs:39-62).

Intentional fixes (documented, SURVEY.md §7): the reference's ``scale_y``
writes its factor into m21 producing a shear (transform_builder.rs:229-246)
— not replicated; ``scale_point`` there pushes three sibling transforms of
which most-recent-wins keeps only Z — here it is one vector-valued keyframe.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import numpy as np
import jax.numpy as jnp

NERP = "nerp"
LERP = "lerp"
WORLD = "world"
LOCAL = "local"

_INIT_TIME = -0.1  # init transforms are seeded at t=-0.1 (timeline/mod.rs:141)

AXIS_X, AXIS_Y, AXIS_Z = 0, 1, 2
AXIS_ALL = -1  # uniform / vector-valued keys


@dataclass
class _TranslateKey:
    axis: int  # AXIS_X/Y/Z or AXIS_ALL (vector key)
    value: np.ndarray  # (3,) target (world) or delta (local); only `axis` lanes used
    keyframe: float
    interp: str
    space: str


@dataclass
class _ScaleKey:
    axis: int  # AXIS_X/Y/Z or AXIS_ALL (uniform / radius)
    value: float
    keyframe: float
    interp: str


@dataclass
class TransformTimeline:
    """Host-side authoring record for one animated entity.

    ``init_scale`` doubles as the sphere radius for sphere timelines
    (TransformTimeline::new_sphere, timeline/mod.rs:176-223).
    """

    init_pos: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    init_scale: float = 1.0
    translate_keys: List[_TranslateKey] = field(default_factory=list)
    scale_keys: List[_ScaleKey] = field(default_factory=list)
    # Memoized lowered tracks (frame-independent — only EVALUATION times
    # change between movie frames; per-frame re-lowering of every vertex
    # timeline dominated moving-mesh scene rebuilds before this cache).
    _lowered: Optional[dict] = field(default=None, repr=False, compare=False)

    def _dirty(self):
        self._lowered = None

    def _cache(self, key, fn):
        if self._lowered is None:
            self._lowered = {}
        if key not in self._lowered:
            self._lowered[key] = fn()
        return self._lowered[key]

    # --- authoring (transform_builder.rs surface) -------------------------
    def _add_translate(self, axis: int, value, keyframe: float, interp: str, space: str):
        assert keyframe >= 0.0, "keyframes cannot be negative"
        self._dirty()
        v = np.zeros(3, np.float64)
        if axis == AXIS_ALL:
            v[:] = value
        else:
            v[axis] = value
        self.translate_keys.append(_TranslateKey(axis, v, float(keyframe), interp, space))

    def translate_x(self, x, keyframe, interp=LERP, space=LOCAL):
        self._add_translate(AXIS_X, x, keyframe, interp, space)

    def translate_y(self, y, keyframe, interp=LERP, space=LOCAL):
        self._add_translate(AXIS_Y, y, keyframe, interp, space)

    def translate_z(self, z, keyframe, interp=LERP, space=LOCAL):
        self._add_translate(AXIS_Z, z, keyframe, interp, space)

    def translate_point(self, p, keyframe, interp=LERP, space=LOCAL):
        """Vector keyframe — equivalent to the reference's composite
        translate_point (transform_builder.rs:715-733) but as one key."""
        self._add_translate(AXIS_ALL, np.asarray(p, np.float64), keyframe, interp, space)

    def scale_x(self, f, keyframe, interp=LERP):
        self._dirty()
        self.scale_keys.append(_ScaleKey(AXIS_X, float(f), float(keyframe), interp))

    def scale_y(self, f, keyframe, interp=LERP):
        self._dirty()
        self.scale_keys.append(_ScaleKey(AXIS_Y, float(f), float(keyframe), interp))

    def scale_z(self, f, keyframe, interp=LERP):
        self._dirty()
        self.scale_keys.append(_ScaleKey(AXIS_Z, float(f), float(keyframe), interp))

    def scale_uniform(self, f, keyframe, interp=LERP):
        self._dirty()
        self.scale_keys.append(_ScaleKey(AXIS_ALL, float(f), float(keyframe), interp))

    # `scale_r` for spheres IS `scale_uniform` on the radius track.
    scale_r = scale_uniform

    @property
    def animated(self) -> bool:
        return bool(self.translate_keys or self.scale_keys)

    # --- lowering ----------------------------------------------------------
    def lower_translate(self) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        return self._cache("tr", self._lower_translate)

    def _lower_translate(self) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """-> (t0 (K,), t1 (K,), delta (K,3)) ramp segments.

        position(t) = init_pos + sum_k delta_k * step_or_ramp(t; t0_k, t1_k).
        Keys are chained per axis (per-type prev endpoint, LERP interval
        [prev_end, keyframe]); vector keys chain all three axes.
        """
        keys = sorted(self.translate_keys, key=lambda k: k.keyframe)
        abs_pos = np.asarray(self.init_pos, np.float64).copy()
        prev_end = {AXIS_X: _INIT_TIME, AXIS_Y: _INIT_TIME, AXIS_Z: _INIT_TIME}
        t0s, t1s, deltas = [], [], []
        for k in keys:
            axes = [AXIS_X, AXIS_Y, AXIS_Z] if k.axis == AXIS_ALL else [k.axis]
            if k.space == WORLD:
                delta = np.zeros(3)
                for ax in axes:
                    delta[ax] = k.value[ax] - abs_pos[ax]
            else:
                delta = np.array([k.value[ax] if ax in axes else 0.0 for ax in range(3)])
            start = max(prev_end[ax] for ax in axes) if k.interp == LERP else k.keyframe
            t0s.append(start if k.interp == LERP else k.keyframe)
            t1s.append(k.keyframe)
            deltas.append(delta)
            abs_pos += delta
            for ax in axes:
                prev_end[ax] = k.keyframe
        if not t0s:
            return (
                np.zeros((0,), np.float32),
                np.zeros((0,), np.float32),
                np.zeros((0, 3), np.float32),
            )
        return (
            np.asarray(t0s, np.float32),
            np.asarray(t1s, np.float32),
            np.asarray(deltas, np.float32),
        )

    def lower_scale(self) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
        return self._cache("sc", self._lower_scale)

    def _lower_scale(self) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
        """-> (t0 (K,), t1 (K,), from (K,3), to (K,3)) most-recent segments.

        scale(t) = lerp(from_k*, to_k*, ramp) for k* = last segment with
        t0 <= t; identity (init) before any key. Untouched axes carry 1.0
        except the init segment which carries init_scale on all axes.
        """
        keys = sorted(self.scale_keys, key=lambda k: k.keyframe)
        prev_val = {
            AXIS_X: self.init_scale,
            AXIS_Y: self.init_scale,
            AXIS_Z: self.init_scale,
        }
        prev_end = {AXIS_X: _INIT_TIME, AXIS_Y: _INIT_TIME, AXIS_Z: _INIT_TIME}
        t0s = [_INIT_TIME]
        t1s = [_INIT_TIME]
        froms = [np.full(3, self.init_scale)]
        tos = [np.full(3, self.init_scale)]
        for k in keys:
            axes = [AXIS_X, AXIS_Y, AXIS_Z] if k.axis == AXIS_ALL else [k.axis]
            f = np.ones(3)
            t = np.ones(3)
            for ax in axes:
                f[ax] = prev_val[ax]
                t[ax] = k.value
            start = (
                max(prev_end[ax] for ax in axes) if k.interp == LERP else k.keyframe
            )
            t0s.append(start if k.interp == LERP else k.keyframe)
            t1s.append(k.keyframe)
            froms.append(f)
            tos.append(t)
            for ax in axes:
                prev_val[ax] = k.value
                prev_end[ax] = k.keyframe
        return (
            np.asarray(t0s, np.float32),
            np.asarray(t1s, np.float32),
            np.asarray(froms, np.float32),
            np.asarray(tos, np.float32),
        )


    def boundary_times(self) -> np.ndarray:
        return self._cache("bt", self._boundary_times)

    def _boundary_times(self) -> np.ndarray:
        """All segment boundary times (t0 and t1 of every lowered segment,
        init sentinels excluded) — the instants where the piecewise-linear
        trajectory changes slope. Used by scene.build to detect keyframes
        inside a frame's shutter window (where the linear-shutter lowering
        deviates from the reference's per-ray timeline evaluation,
        timeline/mod.rs:233-263) and switch to exact per-ray evaluation."""
        ts = []
        for arrs in (self.lower_translate()[:2], self.lower_scale()[:2]):
            for a in arrs:
                ts.extend(float(x) for x in a if x > _INIT_TIME)
        return np.unique(np.asarray(ts, np.float64))

    # --- host-side scalar evaluation (NumPy) -------------------------------
    def position_at(self, t: float) -> np.ndarray:
        """Evaluate the translate track at time t -> (3,) (host NumPy).

        Matches combine_and_compute's translate product = init + sum of
        ramped deltas (timeline/mod.rs:237-247).
        """
        t0, t1, delta = self.lower_translate()
        pos = np.asarray(self.init_pos, np.float64).copy()
        for a, b, dv in zip(t0, t1, delta):
            span = b - a
            r = np.clip((t - a) / span, 0.0, 1.0) if span > 0 else (1.0 if t >= a else 0.0)
            pos += dv * r
        return pos

    def scale_at(self, t: float) -> np.ndarray:
        """Evaluate the scale track at time t -> (3,) (most-recent-wins,
        timeline/mod.rs:250-256). Component 0 doubles as the sphere radius."""
        t0, t1, f, g = self.lower_scale()
        k = 0
        for i, a in enumerate(t0):
            if t >= a:
                k = i
        span = t1[k] - t0[k]
        r = np.clip((t - t0[k]) / span, 0.0, 1.0) if span > 0 else (1.0 if t >= t0[k] else 0.0)
        return f[k] + (g[k] - f[k]) * r


# --------------------------------------------------------------------------
# Vectorized evaluation (jit side)
# --------------------------------------------------------------------------


def _ramp(t, t0, t1):
    """clamp((t - t0)/(t1 - t0), 0, 1) with degenerate intervals as steps —
    Interval::proportion semantics (utils/interval.py)."""
    span = t1 - t0
    lin = (t - t0) / jnp.where(span > 0, span, 1.0)
    step = jnp.where(t >= t0, 1.0, 0.0)
    return jnp.clip(jnp.where(span > 0, lin, step), 0.0, 1.0)


def eval_translate(t0, t1, delta, init_pos, t):
    """Translate track evaluation.

    Args:
      t0, t1: (..., K) segment intervals; delta: (..., K, 3); init_pos (..., 3).
      t: broadcastable time(s) — scalar, or (R,) against (K,)-shaped tracks.

    Returns position with batch shape broadcast(t, track_batch) x 3.
    """
    t = jnp.asarray(t, jnp.float32)
    if t.ndim and t0.ndim >= 1:
        # (R,) times against (..., K) tracks -> (R, ..., 3)
        tt = t.reshape(t.shape + (1,) * t0.ndim)
    else:
        tt = t
    r = _ramp(tt, t0, t1)  # (R, ..., K) or (..., K)
    return init_pos + jnp.sum(r[..., None] * delta, axis=-2)


def eval_scale(t0, t1, sc_from, sc_to, t):
    """Scale track evaluation: most-recent segment (largest k with t0 <= t;
    tracks are start-sorted) lerped by its ramp. Returns (..., 3)."""
    t = jnp.asarray(t, jnp.float32)
    if t.ndim and t0.ndim >= 1:
        tt = t.reshape(t.shape + (1,) * t0.ndim)
    else:
        tt = t
    mask = tt >= t0  # (R, ..., K); init segment at -0.1 always active
    k_star = jnp.maximum(jnp.sum(mask, axis=-1, dtype=jnp.int32) - 1, 0)  # (R, ...)
    f = jnp.take_along_axis(
        jnp.broadcast_to(sc_from, mask.shape + (3,)), k_star[..., None, None], axis=-2
    )[..., 0, :]
    g = jnp.take_along_axis(
        jnp.broadcast_to(sc_to, mask.shape + (3,)), k_star[..., None, None], axis=-2
    )[..., 0, :]
    s0 = jnp.take_along_axis(jnp.broadcast_to(t0, mask.shape), k_star[..., None], axis=-1)[..., 0]
    s1 = jnp.take_along_axis(jnp.broadcast_to(t1, mask.shape), k_star[..., None], axis=-1)[..., 0]
    ramp = _ramp(jnp.asarray(t, jnp.float32).reshape(s0.shape[: t.ndim] + (1,) * (s0.ndim - t.ndim)) if t.ndim else t, s0, s1)
    return f + (g - f) * ramp[..., None]


def eval_translate_rows(t0, t1, delta, init_pos, t):
    """Row-aligned translate evaluation: per-ray GATHERED tracks.

    Args: t0, t1 (R, K); delta (R, K, 3); init_pos (R, 3); t (R,) — row i's
    track evaluated at row i's time (unlike :func:`eval_translate`, which
    broadcasts all times against all tracks). The per-winner form used by
    the exact-motion replay and the BVH leaf test."""
    r = _ramp(t[:, None], t0, t1)  # (R, K)
    return init_pos + jnp.sum(r[..., None] * delta, axis=-2)


def eval_scale_rows(t0, t1, sc_from, sc_to, t):
    """Row-aligned scale evaluation (most-recent segment per row) -> (R, 3).

    Same alignment contract as :func:`eval_translate_rows`."""
    mask = t[:, None] >= t0  # (R, K)
    k_star = jnp.maximum(jnp.sum(mask, axis=-1, dtype=jnp.int32) - 1, 0)
    f = jnp.take_along_axis(sc_from, k_star[:, None, None], axis=1)[:, 0]
    g = jnp.take_along_axis(sc_to, k_star[:, None, None], axis=1)[:, 0]
    s0 = jnp.take_along_axis(t0, k_star[:, None], axis=1)[:, 0]
    s1 = jnp.take_along_axis(t1, k_star[:, None], axis=1)[:, 0]
    return f + (g - f) * _ramp(t, s0, s1)[:, None]


def eval_translate_np(t0, t1, delta, init_pos, t: float):
    """Vectorized NumPy translate evaluation at ONE scalar time: (N, K)
    padded tracks -> (N, 3). The host-side batch form of position_at —
    per-timeline Python evaluation dominated moving-mesh movie rebuilds
    (37,920 scalar evals/frame on the teapot)."""
    t0 = np.asarray(t0, np.float64)
    t1 = np.asarray(t1, np.float64)
    span = t1 - t0
    lin = (t - t0) / np.where(span > 0, span, 1.0)
    step = (t >= t0).astype(np.float64)
    r = np.clip(np.where(span > 0, lin, step), 0.0, 1.0)
    return np.asarray(init_pos, np.float64) + (
        r[..., None] * np.asarray(delta, np.float64)
    ).sum(axis=-2)


def eval_scale_np(t0, t1, sc_from, sc_to, t: float):
    """Vectorized NumPy scale evaluation (most-recent segment) at ONE
    scalar time: (N, K) padded tracks -> (N, 3)."""
    t0 = np.asarray(t0, np.float64)
    t1 = np.asarray(t1, np.float64)
    mask = t >= t0  # (N, K); padding rows are +inf -> never selected
    k = np.maximum(mask.sum(axis=-1) - 1, 0)
    rows = np.arange(t0.shape[0])
    s0 = t0[rows, k]
    s1 = t1[rows, k]
    span = s1 - s0
    lin = (t - s0) / np.where(span > 0, span, 1.0)
    step = (t >= s0).astype(np.float64)
    r = np.clip(np.where(span > 0, lin, step), 0.0, 1.0)
    f = np.asarray(sc_from, np.float64)[rows, k]
    g = np.asarray(sc_to, np.float64)[rows, k]
    return f + (g - f) * r[:, None]


def pad_tracks(tracks, max_k: Optional[int] = None):
    """Stack per-object lowered translate tracks into padded arrays.

    tracks: list of (t0 (K_i,), t1, delta (K_i,3)).
    Returns (t0 (N, K), t1 (N, K), delta (N, K, 3)); padding deltas are zero
    so padded segments contribute nothing.
    """
    n = len(tracks)
    k = max_k if max_k is not None else max((len(tr[0]) for tr in tracks), default=0)
    k = max(k, 1)
    t0 = np.zeros((n, k), np.float32)
    t1 = np.zeros((n, k), np.float32)
    delta = np.zeros((n, k, 3), np.float32)
    for i, (a, b, d) in enumerate(tracks):
        t0[i, : len(a)] = a
        t1[i, : len(a)] = b
        delta[i, : len(a)] = d
    return t0, t1, delta


def pad_scale_tracks(tracks, max_k: Optional[int] = None):
    """Stack per-object lowered scale tracks. Padding segments get
    t0 = +inf so they are never selected."""
    n = len(tracks)
    k = max_k if max_k is not None else max((len(tr[0]) for tr in tracks), default=1)
    k = max(k, 1)
    t0 = np.full((n, k), np.inf, np.float32)
    t1 = np.full((n, k), np.inf, np.float32)
    f = np.ones((n, k, 3), np.float32)
    g = np.ones((n, k, 3), np.float32)
    for i, (a, b, fr, to) in enumerate(tracks):
        t0[i, : len(a)] = a
        t1[i, : len(a)] = b
        f[i, : len(a)] = fr
        g[i, : len(a)] = to
    return t0, t1, f, g
