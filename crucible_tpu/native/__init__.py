"""Native (C++) host-runtime components, loaded via ctypes.

The reference implements its host runtime in Rust; here the hot host-side
pieces (BVH construction for large meshes) have C++ implementations
compiled on demand with g++ (no pybind11 in the image — plain C ABI +
ctypes). Everything has a NumPy fallback, so the framework works without a
toolchain; the native path is an accelerator.
"""

from __future__ import annotations

import ctypes
import subprocess
import sys
from pathlib import Path
from typing import Optional

import numpy as np

_DIR = Path(__file__).resolve().parent
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _compile() -> Optional[Path]:
    src = _DIR / "bvh_builder.cpp"
    out = _DIR / "_native_bvh.so"
    if out.exists() and out.stat().st_mtime >= src.stat().st_mtime:
        return out
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-o", str(out), str(src)],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return out
    except Exception as e:  # no toolchain / compile error -> fallback
        print(f"[crucible_tpu.native] build failed, using NumPy fallback: {e}", file=sys.stderr)
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (compiling if needed) the native library, or None."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    path = _compile()
    if path is None:
        return None
    lib = ctypes.CDLL(str(path))
    for fname in ("crucible_build_bvh", "crucible_build_bvh_sah"):
        fn = getattr(lib, fname)
        fn.restype = ctypes.c_int64
        fn.argtypes = [
            ctypes.POINTER(ctypes.c_float),  # bb_min
            ctypes.POINTER(ctypes.c_float),  # bb_max
            ctypes.c_int64,  # m
            ctypes.c_int64,  # leaf_size
            ctypes.POINTER(ctypes.c_float),  # node_min
            ctypes.POINTER(ctypes.c_float),  # node_max
            ctypes.POINTER(ctypes.c_int32),  # node_first
            ctypes.POINTER(ctypes.c_int32),  # node_count
            ctypes.POINTER(ctypes.c_int32),  # node_miss
            ctypes.POINTER(ctypes.c_int32),  # node_parent
            ctypes.POINTER(ctypes.c_int32),  # perm
        ]
    _LIB = lib
    return _LIB


def build_bvh_native(
    bb_min: np.ndarray, bb_max: np.ndarray, leaf_size: int = 4,
    method: str = "median",
):
    """C++ BVH build -> dict of arrays (same layout as ops/bvh.FlatBVH), or
    None if the native library is unavailable.

    ``method``: "median" reproduces the reference topology exactly
    (bit-matched against the NumPy builder, tests/test_ops.py); "sah" is
    the binned surface-area-heuristic build with leaf-size snapping —
    float tie-breaks may differ from the NumPy SAH, which is fine: any
    valid BVH yields the same closest-hit image (equivalence is checked at
    render level)."""
    lib = get_lib()
    if lib is None:
        return None
    m = len(bb_min)
    bb_min = np.ascontiguousarray(bb_min, np.float32)
    bb_max = np.ascontiguousarray(bb_max, np.float32)
    cap = 4 * m + 2
    node_min = np.empty((cap, 3), np.float32)
    node_max = np.empty((cap, 3), np.float32)
    node_first = np.empty(cap, np.int32)
    node_count = np.empty(cap, np.int32)
    node_miss = np.empty(cap, np.int32)
    node_parent = np.empty(cap, np.int32)
    perm = np.empty(m, np.int32)

    def ptr(a, t):
        return a.ctypes.data_as(ctypes.POINTER(t))

    fn = (
        lib.crucible_build_bvh_sah if method == "sah" else lib.crucible_build_bvh
    )
    k = fn(
        ptr(bb_min, ctypes.c_float),
        ptr(bb_max, ctypes.c_float),
        m,
        leaf_size,
        ptr(node_min, ctypes.c_float),
        ptr(node_max, ctypes.c_float),
        ptr(node_first, ctypes.c_int32),
        ptr(node_count, ctypes.c_int32),
        ptr(node_miss, ctypes.c_int32),
        ptr(node_parent, ctypes.c_int32),
        ptr(perm, ctypes.c_int32),
    )
    if k < 0:
        return None
    return dict(
        node_min=node_min[:k].copy(),
        node_max=node_max[:k].copy(),
        node_first=node_first[:k].copy(),
        node_count=node_count[:k].copy(),
        node_miss=node_miss[:k].copy(),
        node_parent=node_parent[:k].copy(),
        perm=perm,
    )
