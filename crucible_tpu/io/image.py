"""Image decode (LDR via PIL, HDR via the RGBE codec) and film output.

Reference analogues: ``RTWImage`` (src/asset_loader/img_loader.rs:8-77 —
decode to rgb8, byte/255 color scale, clamped accessor) and the P3 PPM
formatting in ``Camera::render`` (src/camera/mod.rs:306-311) +
``Color``'s Display impl (src/utils.rs:427-438).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from crucible_tpu.io.assets import build_asset_path
from crucible_tpu.io import hdr as hdr_io


def load_image(filename: str) -> np.ndarray:
    """Load an asset image -> (H, W, 3) float32.

    LDR formats decode to byte/255 in [0,1] with NO gamma linearization,
    matching the reference's RTWImage scaling. ``.hdr`` files decode to full
    float radiance (deviation from the reference's rgb8 crush — see io/hdr.py).
    """
    path = build_asset_path(filename)
    return load_image_path(path)


def load_image_path(path) -> np.ndarray:
    path = Path(path)
    if path.suffix.lower() == ".hdr":
        return hdr_io.read_hdr(path)
    from PIL import Image

    with Image.open(path) as im:
        arr = np.asarray(im.convert("RGB"), dtype=np.float32) / 255.0
    return arr


def write_ppm(path, img_u8: np.ndarray) -> None:
    """Write (H, W, 3) uint8 as ASCII P3 PPM (reference film format,
    src/camera/mod.rs:285-311)."""
    img_u8 = np.asarray(img_u8, dtype=np.uint8)
    h, w = img_u8.shape[:2]
    flat = img_u8.reshape(-1, 3)
    # One "r g b" triple per line, like the reference's Display for Color.
    body = "\n".join(f"{r} {g} {b}" for r, g, b in flat)
    with open(path, "w") as f:
        f.write(f"P3\n{w} {h}\n255\n{body}\n")


def read_ppm(path) -> np.ndarray:
    """Read an ASCII P3 PPM -> (H, W, 3) uint8 (for golden-image tests)."""
    with open(path) as f:
        tokens = f.read().split()
    assert tokens[0] == "P3", "only ASCII P3 supported"
    w, h, maxval = int(tokens[1]), int(tokens[2]), int(tokens[3])
    assert maxval == 255
    pix = np.array(tokens[4 : 4 + 3 * w * h], dtype=np.int64)
    return pix.reshape(h, w, 3).astype(np.uint8)


def write_png(path, img_u8: np.ndarray) -> None:
    from PIL import Image

    Image.fromarray(np.asarray(img_u8, dtype=np.uint8), mode="RGB").save(path)


def write_image(path, img_u8: np.ndarray) -> None:
    """Dispatch on extension: .ppm -> P3 text, else PIL (png/jpg/...)."""
    path = Path(path)
    if path.suffix.lower() == ".ppm":
        write_ppm(path, img_u8)
    else:
        write_png(path, img_u8)
