"""Asset path resolution.

Reference: ``build_asset_path`` (src/asset_loader/mod.rs:6-41) — honor the
``ASSET_DIR`` env var, else probe ``assets/`` in the current directory and up
to 6 parent directories. We add one extra fallback: the read-only reference
checkout's ``assets/`` (earthmap.jpg, teapot.obj ship there).
"""

from __future__ import annotations

import os
from pathlib import Path

_REFERENCE_ASSETS = Path("/root/reference/assets")
_MAX_PARENT_PROBES = 6


def build_asset_path(filename: str) -> Path:
    """Resolve an asset filename to an existing path or raise FileNotFoundError."""
    env_dir = os.environ.get("ASSET_DIR")
    candidates = []
    if env_dir:
        candidates.append(Path(env_dir) / filename)

    here = Path.cwd()
    for _ in range(_MAX_PARENT_PROBES + 1):
        candidates.append(here / "assets" / filename)
        if here.parent == here:
            break
        here = here.parent

    # Repo-local assets dir (procedurally generated substitutes live here).
    candidates.append(Path(__file__).resolve().parents[2] / "assets" / filename)
    candidates.append(_REFERENCE_ASSETS / filename)

    for c in candidates:
        if c.is_file():
            return c
    raise FileNotFoundError(
        f"Asset {filename!r} not found. Searched ASSET_DIR, ./assets up to "
        f"{_MAX_PARENT_PROBES} parents, repo assets/, and {_REFERENCE_ASSETS}."
    )
