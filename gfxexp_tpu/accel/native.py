"""ctypes binding for the native C++ BVH builder (native/bvh_builder.cpp).

Compiled on demand with g++ into .cache/libbvh.so; falls back to the numpy
builder when the toolchain is unavailable. The Python builder remains the
oracle — tests cross-check the two produce equivalent traversal results.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
_SRC = os.path.join(_REPO, "native", "bvh_builder.cpp")
_SO = os.path.join(_REPO, ".cache", "libbvh.so")

_lib = None
_load_failed = False


class _BvhResult(ctypes.Structure):
    _fields_ = [
        ("child_min", ctypes.POINTER(ctypes.c_float)),
        ("child_max", ctypes.POINTER(ctypes.c_float)),
        ("child_idx", ctypes.POINTER(ctypes.c_int32)),
        ("child_count", ctypes.POINTER(ctypes.c_int32)),
        ("perm", ctypes.POINTER(ctypes.c_int32)),
        ("n_nodes", ctypes.c_int32),
        ("max_depth", ctypes.c_int32),
        ("n_perm", ctypes.c_int32),
    ]


def _ensure_lib():
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    try:
        if (not os.path.exists(_SO)) or (
            os.path.getmtime(_SO) < os.path.getmtime(_SRC)
        ):
            os.makedirs(os.path.dirname(_SO), exist_ok=True)
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                 "-std=c++17", _SRC, "-o", _SO],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(_SO)
        lib.bvh_build.restype = ctypes.c_int
        lib.bvh_build.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(_BvhResult),
        ]
        lib.bvh_free.argtypes = [ctypes.POINTER(_BvhResult)]
        lib.bvh_build_sbvh.restype = ctypes.c_int
        lib.bvh_build_sbvh.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float), ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_float, ctypes.c_float,
            ctypes.POINTER(_BvhResult),
        ]
        _lib = lib
    except (subprocess.CalledProcessError, OSError) as e:  # pragma: no cover
        import sys

        print(f"[gfxexp_tpu] native BVH builder unavailable ({e}); "
              "using numpy fallback", file=sys.stderr)
        _load_failed = True
    return _lib


def native_available() -> bool:
    return _ensure_lib() is not None


def build_bvh_arrays_native(
    tri_min: np.ndarray, tri_max: np.ndarray, arity: int = 4, max_leaf: int = 4
) -> Optional[Tuple[np.ndarray, ...]]:
    """Same contract as bvh_build.build_bvh_arrays; None if unavailable."""
    lib = _ensure_lib()
    if lib is None:
        return None
    tri_min = np.ascontiguousarray(tri_min, np.float32)
    tri_max = np.ascontiguousarray(tri_max, np.float32)
    n = tri_min.shape[0]
    res = _BvhResult()
    rc = lib.bvh_build(
        tri_min.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        tri_max.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n, arity, max_leaf, ctypes.byref(res),
    )
    if rc != 0:
        raise RuntimeError(f"bvh_build failed with code {rc}")
    try:
        nn = res.n_nodes
        cmin = np.ctypeslib.as_array(res.child_min, (nn, arity, 3)).copy()
        cmax = np.ctypeslib.as_array(res.child_max, (nn, arity, 3)).copy()
        cidx = np.ctypeslib.as_array(res.child_idx, (nn, arity)).copy()
        ccnt = np.ctypeslib.as_array(res.child_count, (nn, arity)).copy()
        perm = np.ctypeslib.as_array(res.perm, (n,)).copy()
        return cmin, cmax, cidx, ccnt, perm.astype(np.int64), int(res.max_depth)
    finally:
        lib.bvh_free(ctypes.byref(res))


def build_bvh_arrays_native_sbvh(
    tri_min: np.ndarray, tri_max: np.ndarray, verts,
    arity: int = 4, max_leaf: int = 4, budget_frac: float = 0.3,
    alpha: float = 1e-5,
) -> Optional[Tuple[np.ndarray, ...]]:
    """Native SBVH (spatial splits + reference duplication). Same contract
    as the numpy _build_bvh2_spatial path: the returned perm may hold
    duplicate triangle ids. None if the native library is unavailable."""
    lib = _ensure_lib()
    if lib is None:
        return None
    v0, v1, v2 = (np.ascontiguousarray(v, np.float32) for v in verts)
    tri_min = np.ascontiguousarray(tri_min, np.float32)
    tri_max = np.ascontiguousarray(tri_max, np.float32)
    n = tri_min.shape[0]
    res = _BvhResult()
    fp = ctypes.POINTER(ctypes.c_float)
    rc = lib.bvh_build_sbvh(
        v0.ctypes.data_as(fp), v1.ctypes.data_as(fp), v2.ctypes.data_as(fp),
        tri_min.ctypes.data_as(fp), tri_max.ctypes.data_as(fp),
        n, arity, max_leaf, ctypes.c_float(budget_frac),
        ctypes.c_float(alpha), ctypes.byref(res),
    )
    if rc != 0:
        raise RuntimeError(f"bvh_build_sbvh failed with code {rc}")
    try:
        nn = res.n_nodes
        cmin = np.ctypeslib.as_array(res.child_min, (nn, arity, 3)).copy()
        cmax = np.ctypeslib.as_array(res.child_max, (nn, arity, 3)).copy()
        cidx = np.ctypeslib.as_array(res.child_idx, (nn, arity)).copy()
        ccnt = np.ctypeslib.as_array(res.child_count, (nn, arity)).copy()
        perm = np.ctypeslib.as_array(res.perm, (res.n_perm,)).copy()
        return cmin, cmax, cidx, ccnt, perm.astype(np.int64), int(res.max_depth)
    finally:
        lib.bvh_free(ctypes.byref(res))
