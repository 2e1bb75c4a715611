"""Native (C++) host-side graph kernels, loaded via ctypes.

Compiled on first import with g++ -O3 (cached as graph_ops.so next to the
source).  All callers have pure-numpy fallbacks, so a missing toolchain only
costs preprocessing speed, never correctness."""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "graph_ops.cpp")
_FLAGS = ["-O3", "-march=native", "-shared", "-fPIC", "-std=c++17"]
_lock = threading.Lock()
_lib = None
_tried = False


def _so_path() -> str:
    """Cache path keyed on a content hash of the source + build flags, so a
    stale or foreign-ISA binary is never loaded (the .so is not committed;
    each host builds its own — ADVICE r2)."""
    with open(_SRC, 'rb') as f:
        h = hashlib.sha256(f.read() + " ".join(_FLAGS).encode()).hexdigest()
    return os.path.join(_DIR, f"graph_ops_{h[:16]}.so")


def _build(so: str) -> bool:
    try:
        subprocess.run(["g++", *_FLAGS, _SRC, "-o", so + ".tmp"],
                       check=True, capture_output=True, timeout=120)
        os.replace(so + ".tmp", so)
        # drop caches of older source revisions
        for f in os.listdir(_DIR):
            p = os.path.join(_DIR, f)
            if f.endswith(".so") and p != so:
                try:
                    os.remove(p)
                except OSError:
                    pass
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
        so = _so_path()
        if not os.path.exists(so):
            if not _build(so):
                return None
        try:
            lib = ctypes.CDLL(so)
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
        lib.locality_order.argtypes = [i64p, i64p, ctypes.c_int64,
                                       ctypes.c_int64, i64p]
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


def partition_stats(senders: np.ndarray, receivers: np.ndarray,
                    nl: int, num_parts: int, n_nodes: int):
    """Per-part edge counts and per-(src_part, dst_part) halo sizes.

    Returns (edge_count [P], halo_count [P, P]) or None if the native lib is
    unavailable (callers fall back to the vectorized numpy path)."""
    lib = get_lib()
    if lib is None:
        return None
    senders = np.ascontiguousarray(senders, dtype=np.int64)
    receivers = np.ascontiguousarray(receivers, dtype=np.int64)
    edge_count = np.zeros(num_parts, dtype=np.int64)
    halo_count = np.zeros(num_parts * num_parts, dtype=np.int64)
    lib.partition_stats(_ptr(senders, ctypes.c_int64),
                        _ptr(receivers, ctypes.c_int64),
                        len(senders), nl, num_parts, n_nodes,
                        _ptr(edge_count, ctypes.c_int64),
                        _ptr(halo_count, ctypes.c_int64))
    return edge_count, halo_count.reshape(num_parts, num_parts)


def build_partition_indices(senders: np.ndarray, receivers: np.ndarray,
                            nl: int, num_parts: int, n_nodes: int,
                            el: int, h: int):
    """Full O(E) edge-partition index build (see graph_ops.cpp for the exact
    layout contract).  Returns (senders_local [P, el] i32, receivers_local
    [P, el] i32, edge_mask [P, el] bool, send_idx [P, P, h] i32,
    send_mask [P, P, h] bool) or None if the native lib is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    senders = np.ascontiguousarray(senders, dtype=np.int64)
    receivers = np.ascontiguousarray(receivers, dtype=np.int64)
    P = num_parts
    senders_local = np.zeros((P, el), dtype=np.int32)
    receivers_local = np.zeros((P, el), dtype=np.int32)
    edge_mask = np.zeros((P, el), dtype=np.uint8)
    send_idx = np.zeros((P, P, h), dtype=np.int32)
    send_mask = np.zeros((P, P, h), dtype=np.uint8)
    lib.build_partition_indices(
        _ptr(senders, ctypes.c_int64), _ptr(receivers, ctypes.c_int64),
        len(senders), nl, P, n_nodes, el, h,
        _ptr(senders_local, ctypes.c_int32),
        _ptr(receivers_local, ctypes.c_int32),
        _ptr(edge_mask, ctypes.c_uint8),
        _ptr(send_idx, ctypes.c_int32),
        _ptr(send_mask, ctypes.c_uint8))
    return (senders_local, receivers_local, edge_mask.astype(bool),
            send_idx, send_mask.astype(bool))


def locality_order(senders: np.ndarray, receivers: np.ndarray,
                   n_nodes: int) -> np.ndarray:
    """Locality-aware node ordering for contiguous-range partitioning: lay
    each sender's receivers out contiguously, rare senders first (see
    graph_ops.cpp:locality_order for the hypergraph rationale).  Returns
    order[i] = old node id at new position i.  Pure-python twin when the
    toolchain is absent."""
    lib = get_lib()
    senders = np.ascontiguousarray(senders, dtype=np.int64)
    receivers = np.ascontiguousarray(receivers, dtype=np.int64)
    if lib is not None:
        out = np.zeros(n_nodes, dtype=np.int64)
        lib.locality_order(_ptr(senders, ctypes.c_int64),
                           _ptr(receivers, ctypes.c_int64),
                           len(senders), n_nodes, _ptr(out, ctypes.c_int64))
        return out
    od = np.bincount(senders, minlength=n_nodes)
    edge_order = np.argsort(senders, kind='stable')
    ptr = np.concatenate([[0], np.cumsum(od)])
    rs = receivers[edge_order]
    placed = np.zeros(n_nodes, bool)
    out = np.empty(n_nodes, np.int64)
    pos = 0
    for s in np.argsort(od, kind='stable'):
        if od[s] == 0:
            continue
        for v in rs[ptr[s]:ptr[s + 1]]:
            if not placed[v]:
                placed[v] = True
                out[pos] = v
                pos += 1
        if not placed[s]:
            placed[s] = True
            out[pos] = s
            pos += 1
    rest = np.nonzero(~placed)[0]
    out[pos:pos + len(rest)] = rest
    return out


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
