"""ctypes wrapper for the independent C++ cost oracle (native/refcost.cc).

This fills the role of the reference's edlib cross-check
(/root/reference/evals/src/benchsuite/edlib.rs): a third, independently
written implementation of the end-cost semantics, used by differential
fuzz tests and the eval harness's cost-verification columns. Compiled on
demand from native/refcost.cc (g++ is in the base image; edlib itself is
not installable here — no package egress).
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_ALPHABETS = {"iupac": 0, "dna": 1, "ascii": 2, "ascii_ci": 3}

_lib = None


def _native_dir() -> Path:
    return Path(__file__).resolve().parent.parent / "native"


def load() -> ctypes.CDLL | None:
    """Load (building if needed) the shared library; None if unavailable."""
    global _lib
    if _lib is not None:
        return _lib or None
    nd = _native_dir()
    so = nd / "librefcost.so"
    src = nd / "refcost.cc"
    if not so.exists() or (src.exists() and src.stat().st_mtime > so.stat().st_mtime):
        if not src.exists():
            _lib = False
            return None
        try:
            subprocess.run(
                ["make", "-C", str(nd), "librefcost.so"],
                check=True, capture_output=True, timeout=120,
            )
        except Exception:
            _lib = False
            return None
    lib = ctypes.CDLL(str(so))
    lib.refcost_end_costs.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
        ctypes.c_int, ctypes.c_float, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.refcost_end_costs.restype = ctypes.c_int
    lib.refcost_edit_distance.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_int,
    ]
    lib.refcost_edit_distance.restype = ctypes.c_int64
    _lib = lib
    return lib


def _alphabet_id(profile) -> int:
    name = profile.name
    if name == "ascii" and not getattr(profile, "case_sensitive", True):
        return _ALPHABETS["ascii_ci"]
    return _ALPHABETS[name]


def end_costs(
    profile,
    pattern: bytes | np.ndarray,
    text: bytes | np.ndarray,
    alpha: float | None = None,
    max_overhang: int | None = None,
) -> np.ndarray | None:
    """Independent end-cost row D[m][0..n] over RAW characters (not engine
    codes). None if the native library is unavailable."""
    lib = load()
    if lib is None:
        return None
    p = np.ascontiguousarray(np.frombuffer(bytes(pattern), dtype=np.uint8))
    t = np.ascontiguousarray(np.frombuffer(bytes(text), dtype=np.uint8))
    out = np.zeros(len(t) + 1, dtype=np.int64)
    rc = lib.refcost_end_costs(
        p.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(p),
        t.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(t),
        _alphabet_id(profile),
        ctypes.c_float(-1.0 if alpha is None else alpha),
        -1 if max_overhang is None else max_overhang,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    if rc != 0:
        return None
    return out


def edit_distance(profile, a: bytes, b: bytes) -> int | None:
    lib = load()
    if lib is None:
        return None
    pa = np.frombuffer(bytes(a), dtype=np.uint8)
    pb = np.frombuffer(bytes(b), dtype=np.uint8)
    return int(
        lib.refcost_edit_distance(
            np.ascontiguousarray(pa).ctypes.data_as(
                ctypes.POINTER(ctypes.c_uint8)
            ),
            len(pa),
            np.ascontiguousarray(pb).ctypes.data_as(
                ctypes.POINTER(ctypes.c_uint8)
            ),
            len(pb),
            _alphabet_id(profile),
        )
    )
