"""ctypes bindings for the native foamio parser (native/foamio.cpp).

Builds the shared library on first use (g++ -O3); every entry point has
a numpy fallback in the callers, so a missing toolchain only costs
speed, never correctness.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_TRIED = False


def _repo_root():
    return os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))


def get_lib():
    """Load (building if needed) libfoamio; returns None if unavailable."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    root = _repo_root()
    src = os.path.join(root, "native", "foamio.cpp")
    so = os.path.join(root, "native", "libfoamio.so")
    try:
        if (not os.path.isfile(so)
                or os.path.getmtime(so) < os.path.getmtime(src)):
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                 "-o", so, src],
                check=True, capture_output=True, timeout=120)
        lib = ctypes.CDLL(so)
        lib.foam_parse_scalars.restype = ctypes.c_long
        lib.foam_parse_scalars.argtypes = [
            ctypes.c_char_p, ctypes.c_long,
            ctypes.POINTER(ctypes.c_double), ctypes.c_long]
        lib.foam_parse_labels.restype = ctypes.c_long
        lib.foam_parse_labels.argtypes = [
            ctypes.c_char_p, ctypes.c_long,
            ctypes.POINTER(ctypes.c_longlong), ctypes.c_long]
        lib.foam_parse_faces.restype = ctypes.c_long
        lib.foam_parse_faces.argtypes = [
            ctypes.c_char_p, ctypes.c_long,
            ctypes.POINTER(ctypes.c_longlong), ctypes.c_long,
            ctypes.POINTER(ctypes.c_longlong), ctypes.c_long]
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def parse_scalars(text: str, expected: int) -> np.ndarray | None:
    lib = get_lib()
    if lib is None:
        return None
    raw = text.encode()
    out = np.empty(expected, dtype=np.float64)
    n = lib.foam_parse_scalars(
        raw, len(raw),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), expected)
    if n != expected:
        return None
    return out


def parse_labels(text: str, expected: int) -> np.ndarray | None:
    lib = get_lib()
    if lib is None:
        return None
    raw = text.encode()
    out = np.empty(expected, dtype=np.int64)
    n = lib.foam_parse_labels(
        raw, len(raw),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)), expected)
    if n != expected:
        return None
    return out


def parse_faces(text: str, n_faces: int):
    """Returns (flat_labels, offsets) or None."""
    lib = get_lib()
    if lib is None:
        return None
    raw = text.encode()
    sizes = np.empty(n_faces, dtype=np.int64)
    # generous upper bound: average 8 vertices per face
    max_flat = max(64, 8 * n_faces)
    flat = np.empty(max_flat, dtype=np.int64)
    n = lib.foam_parse_faces(
        raw, len(raw),
        sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)), n_faces,
        flat.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)), max_flat)
    if n != n_faces:
        return None
    offsets = np.zeros(n_faces + 1, dtype=np.int64)
    np.cumsum(sizes, out=offsets[1:])
    return flat[:offsets[-1]].copy(), offsets
