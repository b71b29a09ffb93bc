"""ctypes bindings for the native data-plane library (``native/graphops.cpp``).

Builds on demand with make/g++ if the shared object is missing; every entry
point has a pure-numpy fallback so the framework works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "libgraphops.so"
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not _LIB_PATH.exists():
        try:
            subprocess.run(
                ["make", "-C", str(_NATIVE_DIR)], capture_output=True,
                check=True, timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        return None
    lib.knn_graph.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.knn_cross.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.sdf_parse_first.restype = ctypes.c_int
    lib.sdf_parse_first.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
    ]
    _lib = lib
    return _lib


def have_native() -> bool:
    return _load() is not None


def _fptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def knn_graph_native(
    pos: np.ndarray, k: int, max_radius: Optional[float] = None
) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    lib = _load()
    if lib is None:
        return None
    pos = np.ascontiguousarray(pos, np.float32)
    n = pos.shape[0]
    k = min(k, max(n - 1, 1))
    idx = np.zeros((n, k), np.int32)
    mask = np.zeros((n, k), np.uint8)
    lib.knn_graph(
        _fptr(pos), n, k, ctypes.c_float(max_radius or -1.0),
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return idx, mask.astype(bool)


def knn_cross_native(
    query: np.ndarray, ref: np.ndarray, k: int,
    max_radius: Optional[float] = None,
) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    lib = _load()
    if lib is None:
        return None
    query = np.ascontiguousarray(query, np.float32)
    ref = np.ascontiguousarray(ref, np.float32)
    nq, nr = query.shape[0], ref.shape[0]
    k = min(k, max(nr, 1))
    idx = np.zeros((nq, k), np.int32)
    mask = np.zeros((nq, k), np.uint8)
    lib.knn_cross(
        _fptr(query), nq, _fptr(ref), nr, k,
        ctypes.c_float(max_radius or -1.0),
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return idx, mask.astype(bool)


def sdf_parse_first_native(text: str):
    """Parse the first SDF record natively; returns
    (coords, elements, bonds, charges) or None if unavailable/failed."""
    lib = _load()
    if lib is None:
        return None
    raw = text.encode()
    max_atoms, max_bonds = 1024, 2048
    for _ in range(2):
        coords = np.zeros((max_atoms, 3), np.float32)
        elements = ctypes.create_string_buffer(4 * max_atoms)
        bonds = np.zeros((max_bonds, 3), np.int32)
        charges = np.zeros(max_atoms, np.int32)
        na = ctypes.c_int32()
        nb = ctypes.c_int32()
        rc = lib.sdf_parse_first(
            raw, len(raw), max_atoms, max_bonds,
            _fptr(coords), elements,
            bonds.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            charges.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            ctypes.byref(na), ctypes.byref(nb),
        )
        if rc == 1:
            max_atoms, max_bonds = na.value + 8, nb.value + 8
            continue
        if rc != 0:
            return None
        n, m = na.value, nb.value
        els = [
            elements.raw[4 * i : 4 * i + 4].split(b"\0")[0].decode()
            for i in range(n)
        ]
        return coords[:n].copy(), els, bonds[:m].copy(), charges[:n].copy()
    return None
