"""ctypes bindings for the native host library (native/cge_native.cpp).

Builds on demand with `make -C native` (g++ + zlib, both baked into the
image). All entry points degrade gracefully: if the library is missing and
can't be built, `lib()` raises and callers fall back to the pure-Python
paths.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_ROOT = Path(__file__).resolve().parent.parent
_SO = _ROOT / "native" / "libcge_native.so"
_lib = None


def lib() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    if not _SO.exists():
        subprocess.run(["make", "-C", str(_SO.parent)], check=True, capture_output=True)
    L = ctypes.CDLL(str(_SO))
    L.cge_read_asset.restype = ctypes.c_int
    L.cge_read_asset.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.POINTER(ctypes.c_uint64),
    ]
    L.cge_write_asset.restype = ctypes.c_int
    L.cge_write_asset.argtypes = [
        ctypes.c_char_p,
        ctypes.c_uint8,
        ctypes.c_uint8,
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_uint64,
    ]
    L.cge_free.argtypes = [ctypes.c_void_p]
    L.cge_character_step.restype = ctypes.c_int
    L.cge_character_step.argtypes = [
        ctypes.POINTER(ctypes.c_double),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double),
        ctypes.c_double,
        ctypes.c_int,
    ]
    L.cge_actions_write.restype = ctypes.c_int
    L.cge_actions_write.argtypes = [
        ctypes.c_char_p,
        ctypes.c_uint32,
        ctypes.c_uint32,
        ctypes.c_uint8,
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_uint8),
    ]
    L.cge_actions_read.restype = ctypes.c_int
    L.cge_actions_read.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_uint32),
        ctypes.POINTER(ctypes.c_uint32),
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
    ]
    _lib = L
    return L


def actions_write_native(path: str, move: np.ndarray, look: np.ndarray,
                         buttons: np.ndarray) -> None:
    """Native CGAS stream write. move/look [T,B,2] f32, buttons [T,B,NB] u8."""
    L = lib()
    t, b = move.shape[:2]
    nb = buttons.shape[-1]
    mv = np.ascontiguousarray(move, np.float32)
    lk = np.ascontiguousarray(look, np.float32)
    bt = np.ascontiguousarray(buttons, np.uint8)
    rc = L.cge_actions_write(
        path.encode(), b, t, nb,
        mv.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        lk.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        bt.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    if rc != 0:
        raise IOError(f"cge_actions_write({path}) failed: {rc}")


def actions_read_native(path: str):
    """Native CGAS stream read -> (move [T,B,2], look [T,B,2], buttons [T,B,NB])."""
    L = lib()
    b = ctypes.c_uint32()
    t = ctypes.c_uint32()
    nb = ctypes.c_uint8()
    mv = ctypes.POINTER(ctypes.c_float)()
    lk = ctypes.POINTER(ctypes.c_float)()
    bt = ctypes.POINTER(ctypes.c_uint8)()
    rc = L.cge_actions_read(
        path.encode(), ctypes.byref(b), ctypes.byref(t), ctypes.byref(nb),
        ctypes.byref(mv), ctypes.byref(lk), ctypes.byref(bt),
    )
    if rc != 0:
        raise IOError(f"cge_actions_read({path}) failed: {rc}")
    try:
        tb = t.value * b.value
        move = np.ctypeslib.as_array(mv, (tb * 2,)).copy().reshape(t.value, b.value, 2)
        look = np.ctypeslib.as_array(lk, (tb * 2,)).copy().reshape(t.value, b.value, 2)
        btns = np.ctypeslib.as_array(bt, (tb * nb.value,)).copy().reshape(
            t.value, b.value, nb.value
        )
    finally:
        L.cge_free(mv)
        L.cge_free(lk)
        L.cge_free(bt)
    return move, look, btns


def read_asset_native(path: str):
    """Native .g* decode. Returns (type, type_version, bytes)."""
    L = lib()
    t = ctypes.c_uint8()
    tv = ctypes.c_uint8()
    data = ctypes.POINTER(ctypes.c_uint8)()
    size = ctypes.c_uint64()
    rc = L.cge_read_asset(path.encode(), ctypes.byref(t), ctypes.byref(tv), ctypes.byref(data), ctypes.byref(size))
    if rc != 0:
        raise IOError(f"cge_read_asset({path}) failed: {rc}")
    try:
        out = ctypes.string_at(data, size.value)
    finally:
        L.cge_free(data)
    return t.value, tv.value, out


def character_step_oracle(tris: np.ndarray, pos: np.ndarray, vel: np.ndarray, dt: float, was_on_ground: bool):
    """Double-precision C++ collide-and-slide step (test oracle).
    tris [T,3,3]; pos/vel [3] float64. Returns (pos, vel, grounded)."""
    L = lib()
    t = np.ascontiguousarray(tris, np.float64)
    p = np.ascontiguousarray(pos, np.float64).copy()
    v = np.ascontiguousarray(vel, np.float64).copy()
    g = L.cge_character_step(
        t.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        t.shape[0],
        p.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        v.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        float(dt),
        int(bool(was_on_ground)),
    )
    return p, v, bool(g)
