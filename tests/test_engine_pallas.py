"""Pallas kernel conformance in interpret mode (CPU).

Small cases only — interpret mode executes the kernel step-by-step in
Python. Real-hardware conformance + perf run via bench.py on TPU.
"""

import os

import numpy as np
import pytest

os.environ.setdefault("SASSY_PALLAS_INTERPRET", "1")

from sassy_tpu import Searcher, profiles  # noqa: E402


@pytest.fixture(scope="module")
def engines():
    import jax

    if jax.default_backend() != "tpu" and os.environ.get("SASSY_PALLAS_INTERPRET") != "1":
        pytest.skip("no TPU and interpret mode disabled")
    return None


def test_pallas_matches_numpy_small(engines):
    sp = Searcher(profiles.Iupac(), rc=True, alpha=0.5, engine="pallas")
    sn = Searcher(profiles.Iupac(), rc=True, alpha=0.5, engine="numpy")
    rng = np.random.default_rng(5)
    bases = np.frombuffer(b"ACGTN", dtype=np.uint8)
    for _ in range(3):
        pat = rng.choice(bases, size=int(rng.integers(4, 18))).tobytes()
        txt = rng.choice(bases, size=int(rng.integers(10, 150))).tobytes()
        k = int(rng.integers(0, 3))
        a = sp.search(pat, txt, k)
        b = sn.search(pat, txt, k)
        assert len(a) == len(b), (pat, txt, k)
        for x, y in zip(a, b):
            assert x.same_as(y), (pat, txt, k, x, y)


@pytest.mark.slow
def test_pallas_ascii_mode(engines):
    sp = Searcher(profiles.Ascii(case_sensitive=False), engine="pallas")
    sn = Searcher(profiles.Ascii(case_sensitive=False), engine="numpy")
    a = sp.search(b"Hello", b"say hello There HELLo", 1)
    b = sn.search(b"Hello", b"say hello There HELLo", 1)
    assert len(a) == len(b)
    for x, y in zip(a, b):
        assert x.same_as(y)
