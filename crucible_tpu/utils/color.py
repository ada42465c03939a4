"""Film / color pipeline: HDR accumulation -> gamma -> quantized bytes.

Behavioral anchors from the reference:
- ``linear_to_gamma = sqrt`` (src/utils.rs:407-410).
- byte quantization ``(255.0 * c) as u32`` after gamma (src/utils.rs:432-434);
  c is already in [0,1] there so 1.0 -> 255 with truncating cast.

Intentional deviation (documented per SURVEY.md §7): the reference clamps
every color arithmetic op to [0,1] (src/utils.rs:487-604), which truncates
energy mid-integration and kills gradients. We accumulate unclamped linear
radiance and clamp only here, at film output.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def linear_to_gamma(c: jnp.ndarray) -> jnp.ndarray:
    """Gamma 2.0 encode: sqrt of linear values, negatives -> 0.

    Reference: src/utils.rs:407-410 (sqrt; inputs there are pre-clamped).
    """
    return jnp.sqrt(jnp.maximum(c, 0.0))


def to_bytes(c: jnp.ndarray) -> jnp.ndarray:
    """Linear radiance image -> uint8 via clamp, gamma, 255*c truncation.

    Matches the reference's PPM formatting (src/utils.rs:427-438): bytes are
    ``(255.0 * gamma(c)) as u32`` with a truncating cast; since gamma(c) is
    clamped to [0,1], 1.0 maps to exactly 255.
    """
    g = linear_to_gamma(jnp.clip(c, 0.0, 1.0))
    return jnp.clip(jnp.floor(255.0 * g), 0.0, 255.0).astype(jnp.uint8)


def from_bytes(b) -> jnp.ndarray:
    """uint8 [0,255] -> linear float via /255 then gamma-2 decode (square).

    The reference loads LDR images as byte/255 *without* linearization
    (src/asset_loader/img_loader.rs) — use :func:`srgb_bytes_passthrough`
    for bit-parity texture loads; this helper is the physically-correct
    variant kept for HDR-aware pipelines.
    """
    return (jnp.asarray(b, jnp.float32) / 255.0) ** 2


def complement(c: jnp.ndarray) -> jnp.ndarray:
    """Color complement (1 - c), the reference's ``Neg for Color``
    (src/utils.rs:445-483, used by scalar mul with negative factors)."""
    return 1.0 - c


def srgb_bytes_passthrough(b) -> np.ndarray:
    """uint8 -> float in [0,1] with no gamma decode, matching the reference's
    ``RTWImage`` color scaling (byte * 1/255)."""
    return np.asarray(b, np.float32) / 255.0
