"""Build and run the C ABI example (reference c/example.c analog)."""

import os
import shutil
import subprocess
import sys
from pathlib import Path

import pytest

ROOT = Path(__file__).resolve().parent.parent


@pytest.mark.skipif(shutil.which("g++") is None, reason="no C++ toolchain")
def test_c_example_end_to_end():
    r = subprocess.run(
        ["make", "-C", str(ROOT / "c")], capture_output=True, text=True
    )
    assert r.returncode == 0, r.stderr
    env = dict(os.environ, PYTHONPATH=str(ROOT), JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [str(ROOT / "c" / "example")], capture_output=True, text=True,
        env=env, timeout=300,
    )
    assert r.returncode == 0, (r.stdout, r.stderr)
    assert "matches: 3" in r.stdout
    assert "[3, 7) cost=0 strand=+" in r.stdout
    assert "strand=-" in r.stdout


@pytest.mark.skipif(shutil.which("g++") is None, reason="no C++ toolchain")
def test_c_abi_from_ctypes():
    """Drive the shared library via ctypes too (no compiler needed for the
    caller side)."""
    import ctypes

    lib_path = ROOT / "c" / "libsassy_tpu_c.so"
    if not lib_path.exists():
        subprocess.run(["make", "-C", str(ROOT / "c")], check=True,
                       capture_output=True)
    # load in a subprocess to avoid embedding a second interpreter here
    code = f"""
import ctypes, math
lib = ctypes.CDLL({str(lib_path)!r})

class Match(ctypes.Structure):
    _fields_ = [("text_start", ctypes.c_size_t), ("text_end", ctypes.c_size_t),
                ("pattern_start", ctypes.c_size_t),
                ("pattern_end", ctypes.c_size_t),
                ("cost", ctypes.c_int32), ("strand", ctypes.c_uint8)]

lib.sassy_searcher.restype = ctypes.c_void_p
lib.sassy_searcher.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_double]
lib.sassy_search.restype = ctypes.c_size_t
lib.sassy_search.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                             ctypes.c_size_t, ctypes.c_char_p,
                             ctypes.c_size_t, ctypes.c_size_t,
                             ctypes.POINTER(ctypes.POINTER(Match))]
lib.sassy_matches_free.argtypes = [ctypes.POINTER(Match), ctypes.c_size_t]
lib.sassy_searcher_free.argtypes = [ctypes.c_void_p]
s = lib.sassy_searcher(b"dna", 0, float("nan"))
assert s
out = ctypes.POINTER(Match)()
n = lib.sassy_search(s, b"ACGT", 4, b"TTACGTTT", 8, 0, ctypes.byref(out))
assert n == 1, n
assert out[0].text_start == 2 and out[0].text_end == 6, (out[0].text_start,
                                                         out[0].text_end)
lib.sassy_matches_free(out, n)
lib.sassy_searcher_free(s)
print("ctypes ok")
"""
    env = dict(os.environ, PYTHONPATH=str(ROOT), JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        env=env, timeout=300,
    )
    assert r.returncode == 0, (r.stdout, r.stderr)
    assert "ctypes ok" in r.stdout
