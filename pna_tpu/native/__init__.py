"""Native (C++) host-side graph kernels, loaded via ctypes.

Compiled on first import with g++ -O3 (cached as graph_ops.so next to the
source).  All callers have pure-numpy fallbacks, so a missing toolchain only
costs preprocessing speed, never correctness."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "graph_ops.cpp")
_SO = os.path.join(_DIR, "graph_ops.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
             _SRC, "-o", _SO + ".tmp"],
            check=True, capture_output=True, timeout=120)
        os.replace(_SO + ".tmp", _SO)
        return True
    except Exception:
        return False


def get_lib():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or (os.path.getmtime(_SO)
                                       < os.path.getmtime(_SRC)):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        i32p = ctypes.POINTER(ctypes.c_int32)
        i64p = ctypes.POINTER(ctypes.c_int64)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.degree_count.argtypes = [i32p, u8p, ctypes.c_int64,
                                     ctypes.c_int64, i32p]
        lib.build_ell.argtypes = [i32p, u8p, ctypes.c_int64, ctypes.c_int64,
                                  ctypes.c_int64, i32p, u8p]
        lib.sort_edges_by_receiver.argtypes = [i32p, ctypes.c_int64,
                                               ctypes.c_int64, i32p]
        lib.partition_stats.argtypes = [i64p, i64p, ctypes.c_int64,
                                        ctypes.c_int64, ctypes.c_int64,
                                        ctypes.c_int64, i64p, i64p]
        lib.build_partition_indices.argtypes = [
            i64p, i64p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            i32p, i32p, u8p, i32p, u8p]
        _lib = lib
        return _lib


def _ptr(a, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def degree_count(receivers: np.ndarray, edge_mask: np.ndarray,
                 n_nodes: int) -> np.ndarray:
    lib = get_lib()
    receivers = np.ascontiguousarray(receivers, dtype=np.int32)
    mask = np.ascontiguousarray(edge_mask, dtype=np.uint8)
    if lib is None:
        return np.bincount(receivers[mask.astype(bool)],
                           minlength=n_nodes).astype(np.int32)
    out = np.zeros(n_nodes, dtype=np.int32)
    lib.degree_count(_ptr(receivers, ctypes.c_int32),
                     _ptr(mask, ctypes.c_uint8),
                     len(receivers), n_nodes, _ptr(out, ctypes.c_int32))
    return out


def build_ell_native(receivers: np.ndarray, edge_mask: np.ndarray,
                     n_nodes: int, dmax: int):
    """Returns (nbr [N, dmax] int32, mask [N, dmax] bool) or None if the
    native lib is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    receivers = np.ascontiguousarray(receivers, dtype=np.int32)
    mask = np.ascontiguousarray(edge_mask, dtype=np.uint8)
    nbr = np.zeros((n_nodes, dmax), dtype=np.int32)
    out_mask = np.zeros((n_nodes, dmax), dtype=np.uint8)
    lib.build_ell(_ptr(receivers, ctypes.c_int32), _ptr(mask, ctypes.c_uint8),
                  len(receivers), n_nodes, dmax,
                  _ptr(nbr, ctypes.c_int32), _ptr(out_mask, ctypes.c_uint8))
    return nbr, out_mask.astype(bool)


def sort_edges_by_receiver(receivers: np.ndarray, n_nodes: int) -> np.ndarray:
    lib = get_lib()
    receivers = np.ascontiguousarray(receivers, dtype=np.int32)
    if lib is None:
        return np.argsort(receivers, kind='stable').astype(np.int32)
    out = np.zeros(len(receivers), dtype=np.int32)
    lib.sort_edges_by_receiver(_ptr(receivers, ctypes.c_int32),
                               len(receivers), n_nodes,
                               _ptr(out, ctypes.c_int32))
    return out
