"""Native (C++) host-runtime tier.

The TPU compute path is JAX/XLA/Pallas; the host-side runtime around it —
here the temporal-CSR graph builder, the hottest host operation when
loading multi-million-edge streams — is C++, compiled once per machine
with the system toolchain and loaded through ctypes. Everything degrades
gracefully to the numpy implementation when no compiler is available.
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)), "csr_builder.cpp")
_LIB = None
_TRIED = False


def _build_dir() -> str:
    d = os.environ.get(
        "DYGLIB_TPU_NATIVE_CACHE",
        os.path.join(tempfile.gettempdir(), "dyglib_tpu_native"),
    )
    os.makedirs(d, exist_ok=True)
    return d


def _load() -> ctypes.CDLL | None:
    """Compile (once, content-addressed) and dlopen the native library."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    try:
        with open(_SRC, "rb") as f:
            tag = hashlib.sha256(f.read()).hexdigest()[:16]
        so = os.path.join(_build_dir(), f"_csr_native_{tag}.so")
        if not os.path.exists(so):
            tmp = so + f".{os.getpid()}.tmp"
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-o", tmp, _SRC],
                check=True, capture_output=True, timeout=120,
            )
            os.replace(tmp, so)  # atomic under concurrent builders
        lib = ctypes.CDLL(so)
        i64p = ctypes.POINTER(ctypes.c_int64)
        lib.build_temporal_csr.argtypes = [
            i64p, i64p, i64p, ctypes.POINTER(ctypes.c_double),
            ctypes.c_int64, ctypes.c_int64,
            i64p, ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_double),
        ]
        lib.build_temporal_csr.restype = None
        _LIB = lib
    except Exception:
        _LIB = None  # no toolchain / build failure -> numpy fallback
    return _LIB


def native_available() -> bool:
    return _load() is not None


def build_temporal_csr_native(
    src: np.ndarray, dst: np.ndarray, eid: np.ndarray, ts: np.ndarray,
    num_nodes: int,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray] | None:
    """(offsets, nbr, eid, ts) flat arrays, or None when unavailable.

    Output contract identical to the numpy path in graph/csr.py: per-node
    segments in stream order with the src-side entry of each edge before
    its dst-side entry (reference utils/utils.py:96-103 order).
    """
    lib = _load()
    if lib is None:
        return None
    e = len(src)
    src = np.ascontiguousarray(src, dtype=np.int64)
    dst = np.ascontiguousarray(dst, dtype=np.int64)
    eid = np.ascontiguousarray(eid, dtype=np.int64)
    ts = np.ascontiguousarray(ts, dtype=np.float64)
    offsets = np.empty(num_nodes + 1, dtype=np.int64)
    nbr = np.empty(2 * e, dtype=np.int32)
    eid_out = np.empty(2 * e, dtype=np.int32)
    ts_out = np.empty(2 * e, dtype=np.float64)
    p = lambda a, t: a.ctypes.data_as(ctypes.POINTER(t))
    lib.build_temporal_csr(
        p(src, ctypes.c_int64), p(dst, ctypes.c_int64), p(eid, ctypes.c_int64),
        p(ts, ctypes.c_double), ctypes.c_int64(e), ctypes.c_int64(num_nodes),
        p(offsets, ctypes.c_int64), p(nbr, ctypes.c_int32),
        p(eid_out, ctypes.c_int32), p(ts_out, ctypes.c_double),
    )
    return offsets, nbr, eid_out, ts_out
