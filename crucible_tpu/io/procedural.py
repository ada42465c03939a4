"""Procedurally generated substitute assets.

The reference's world 5 and movie 1 need ``garden.hdr``, which is absent
from its assets/ (SURVEY.md §2.5) — those demos fail out of the box there.
With zero network egress we synthesize a plausible garden-like equirect HDR
(sky gradient + sun disk + ground bounce) and cache it in the repo assets/
dir; it exercises the full float-HDR decode path (io/hdr.py).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from crucible_tpu.io import hdr as hdr_io

_ASSETS_DIR = Path(__file__).resolve().parents[2] / "assets"


def generate_garden_hdr(height: int = 512) -> np.ndarray:
    """Equirect (H, 2H, 3) float32 radiance map: blue sky, warm sun disk at
    ~45 deg elevation, green grassy lower hemisphere with horizon haze."""
    h, w = height, 2 * height
    v = (np.arange(h) + 0.5) / h  # 0 top .. 1 bottom
    u = (np.arange(w) + 0.5) / w
    uu, vv = np.meshgrid(u, v)
    # Direction from equirect (matching the skybox mapping inverse):
    phi = (vv - 0.5) * -np.pi  # +pi/2 at top
    theta = (uu - 0.5) * 2.0 * np.pi
    y = np.sin(phi)
    x = np.cos(phi) * np.sin(theta)
    z = np.cos(phi) * np.cos(theta)

    img = np.zeros((h, w, 3), np.float32)
    sky_t = np.clip(y, 0.0, 1.0)
    sky = (
        (1.0 - sky_t)[..., None] * np.array([0.9, 0.95, 1.05], np.float32)
        + sky_t[..., None] * np.array([0.25, 0.45, 0.95], np.float32)
    ) * 1.2

    sun_dir = np.array([0.5, np.sqrt(0.5), 0.5], np.float32)
    sun_dir /= np.linalg.norm(sun_dir)
    cos_sun = x * sun_dir[0] + y * sun_dir[1] + z * sun_dir[2]
    sun = np.clip((cos_sun - 0.9995) / 0.0005, 0.0, 1.0)[..., None] * np.array(
        [500.0, 450.0, 380.0], np.float32
    )
    halo = np.clip(cos_sun, 0.0, 1.0) ** 64
    sky = sky + halo[..., None] * np.array([1.5, 1.2, 0.8], np.float32)

    grass_t = np.clip(-y, 0.0, 1.0)
    # Low-frequency mottling so reflections aren't flat.
    mottle = 0.15 * np.sin(8.0 * theta) * np.sin(5.0 * phi) + 0.1 * np.sin(23.0 * theta)
    ground = (
        (0.9 + mottle)[..., None]
        * (
            (1.0 - grass_t)[..., None] * np.array([0.45, 0.42, 0.35], np.float32)
            + grass_t[..., None] * np.array([0.12, 0.35, 0.1], np.float32)
        )
        * 0.8
    )

    above = (y >= 0.0)[..., None]
    img = np.where(above, sky + sun, ground).astype(np.float32)
    return img


def ensure_garden_hdr() -> Path:
    """Generate assets/garden.hdr if missing; return its path."""
    _ASSETS_DIR.mkdir(parents=True, exist_ok=True)
    path = _ASSETS_DIR / "garden.hdr"
    if not path.exists():
        hdr_io.write_hdr(path, generate_garden_hdr())
    return path
