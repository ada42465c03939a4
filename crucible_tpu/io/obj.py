"""Minimal Wavefront OBJ loader (``v``/``f`` records, triangles only).

Reference: src/asset_loader/obj_loader.rs:21-143 — only ``v`` and ``f``
records are supported (anything else panics), faces must be triangles with
plain 1-based vertex indices, and a uniform ``scale`` + ``shift`` are applied
to every vertex at load time. We mirror those semantics; set
``strict=False`` to skip unknown records (comments, normals) instead of
raising — a quality-of-life extension for real-world OBJ files.
"""

from __future__ import annotations

import numpy as np

from crucible_tpu.io.assets import build_asset_path


def load_obj(filename: str, scale: float = 1.0, shift=(0.0, 0.0, 0.0), strict: bool = True):
    """Parse an OBJ file -> (verts (V,3) f32 scaled+shifted, faces (F,3) i32 0-based)."""
    path = build_asset_path(filename)
    if path.suffix != ".obj":
        raise ValueError("Expected an obj file.")
    return parse_obj_text(path.read_text(), scale=scale, shift=shift, strict=strict)


def parse_obj_text(text: str, scale: float = 1.0, shift=(0.0, 0.0, 0.0), strict: bool = True):
    verts, faces = [], []
    for line in text.splitlines():
        parts = line.split()
        if not parts:
            continue
        tag = parts[0]
        if tag == "v":
            if len(parts) != 4:
                raise ValueError("Invalid number of coordinates for a vertex")
            verts.append([float(parts[1]), float(parts[2]), float(parts[3])])
        elif tag == "f":
            if len(parts) != 4:
                raise ValueError(
                    "The asset loader only supports triangulated meshes; "
                    "triangulate the model and try again"
                )
            # Tolerate v/vt/vn forms by taking the leading vertex index.
            idx = [int(p.split("/")[0]) for p in parts[1:]]
            faces.append(idx)
        elif strict:
            raise ValueError(f"Unsupported OBJ record {tag!r}")

    v = np.asarray(verts, dtype=np.float32) * np.float32(scale) + np.asarray(
        shift, dtype=np.float32
    )
    # OBJ indices are 1-based (negative = relative from end, per spec).
    f = np.asarray(faces, dtype=np.int64)
    f = np.where(f > 0, f - 1, len(v) + f).astype(np.int32)
    return v, f
