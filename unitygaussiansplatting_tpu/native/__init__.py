"""Native (C++) import-pipeline kernels with on-demand build.

The reference compiles its import hot paths with Burst to native AVX/NEON
code (SURVEY.md §2.3); here the equivalents live in splat_native.cpp and are
built lazily with g++ into a CPython extension.  Everything has a NumPy
fallback, so the framework works without a toolchain — the native path just
makes multi-million-splat imports fast (radix argsort of 6M Morton codes is
~10x numpy argsort).
"""

from __future__ import annotations

import os
import subprocess
import sys
import sysconfig

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "_splat_native.so")
_SRC = os.path.join(_DIR, "splat_native.cpp")

_mod = None
_tried = False


def _build() -> bool:
    include = sysconfig.get_paths()["include"]
    cmd = [
        "g++",
        "-O3",
        "-march=native",
        "-shared",
        "-fPIC",
        "-std=c++17",
        f"-I{include}",
        _SRC,
        "-o",
        _SO,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_native():
    """Import (building if needed) the extension; None when unavailable."""
    global _mod, _tried
    if _mod is not None or _tried:
        return _mod
    _tried = True
    if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
        if not _build():
            return None
    try:
        import importlib.util

        spec = importlib.util.spec_from_file_location("_splat_native", _SO)
        _mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(_mod)
    except Exception:
        _mod = None
    return _mod


def morton_order(positions: np.ndarray) -> np.ndarray:
    """Permutation sorting splats into 3D Morton order; native when possible.

    Semantics match ops.morton.morton_order_np (the import-time reorder,
    GaussianSplatAssetCreator.cs:384-429).
    """
    native = get_native()
    pos = np.ascontiguousarray(positions, dtype=np.float32)
    if native is None:
        from ..ops.morton import morton_order_np

        return morton_order_np(pos)
    bmin = pos.min(axis=0)
    bmax = pos.max(axis=0)
    codes = native.morton_codes(
        pos, (float(bmin[0]), float(bmin[1]), float(bmin[2])),
        (float(bmax[0]), float(bmax[1]), float(bmax[2])),
    )
    perm = native.radix_argsort_u64(codes)
    return np.frombuffer(perm, dtype=np.int64)


def chunk_minmax(values: np.ndarray, chunk_size: int) -> tuple[np.ndarray, np.ndarray]:
    """Per-chunk min/max over columns; (C, D) mins and maxs."""
    native = get_native()
    vals = np.ascontiguousarray(values, dtype=np.float32)
    n, d = vals.shape
    c = (n + chunk_size - 1) // chunk_size
    if native is None:
        pad = c * chunk_size - n
        if pad:
            vals = np.concatenate([vals, np.repeat(vals[-1:], pad, axis=0)])
        chunks = vals.reshape(c, chunk_size, d)
        return chunks.min(axis=1), chunks.max(axis=1)
    raw = np.frombuffer(
        native.chunk_minmax(vals, d, chunk_size), dtype=np.float32
    ).reshape(c, 2, d)
    return raw[:, 0], raw[:, 1]
