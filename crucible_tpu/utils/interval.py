"""Interval arithmetic as (min, max) pairs — batched, functional.

Behavioral anchor: reference ``src/utils.rs:614-697`` (``Interval`` with
``contains``/``surrounds``/``clamp``/``proportion`` plus EMPTY/UNIVERSE
constants). Here an interval is just any broadcastable pair of arrays; the
helpers are free functions so they work elementwise inside kernels.
"""

from __future__ import annotations

import jax.numpy as jnp

EMPTY = (jnp.inf, -jnp.inf)  # contains nothing (src/utils.rs:695)
UNIVERSE = (-jnp.inf, jnp.inf)  # contains everything (src/utils.rs:696)


def contains(lo, hi, x):
    """min <= x <= max (src/utils.rs:650-653)."""
    return (lo <= x) & (x <= hi)


def surrounds(lo, hi, x):
    """min < x < max — used for ray-t acceptance (src/utils.rs:656-659)."""
    return (lo < x) & (x < hi)


def clamp(lo, hi, x):
    """Clamp x into [lo, hi] (src/utils.rs:662-670)."""
    return jnp.clip(x, lo, hi)


def proportion(lo, hi, x):
    """Normalized position of x inside [lo, hi] (src/utils.rs:673-683).

    Degenerate intervals (hi == lo) map everything at-or-after the point to
    1.0 and everything before it to 0.0 — this is what makes NERP keyframes
    behave as steps in the timeline evaluator.
    """
    span = hi - lo
    p = jnp.where(span > 0, (x - lo) / jnp.where(span > 0, span, 1.0), jnp.where(x >= lo, 1.0, 0.0))
    return p


def size(lo, hi):
    return hi - lo


def expand(lo, hi, delta):
    """Symmetric expansion by delta/2 each side (AABB padding)."""
    pad = delta / 2.0
    return lo - pad, hi + pad
