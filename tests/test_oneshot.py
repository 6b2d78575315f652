"""One-shot fused bytes path (ops/myers_xla.py pipeline_bytes).

A FIRST search over a fresh small host array must take the single-
dispatch pack+scan+select program and return exactly the standard
path's candidates; a SECOND search over the same array must fall back
to the standard cached-planes path (and still agree). Covers alpha
(overlay inside the fused program) and the ascii validity plane.
"""

import numpy as np
import pytest

from sassy_tpu import profiles
from sassy_tpu.ops.myers_xla import XlaEngine
from sassy_tpu.search import NumpyEngine

BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


@pytest.mark.parametrize("alpha", [None, 0.5])
def test_oneshot_bytes_oracle(alpha):
    rng = np.random.default_rng(0)
    prof = profiles.Iupac()
    eng = XlaEngine()
    oracle = NumpyEngine()
    for n in (50, 1000, 100_000):
        pat = rng.choice(BASES, size=12)
        text = rng.choice(BASES, size=n)
        if n >= 24:
            text[n // 3 : n // 3 + 12] = pat
        pc = prof.encode(pat)
        want = oracle.candidates(prof, pc, text, 2, alpha, None, False)
        # first sighting: bytes path
        prep_before = eng._prep_cache.get(prof, text)
        assert prep_before is None
        got1 = eng.candidates(prof, pc, text, 2, alpha, None, False)
        prep = eng._prep_cache.get(prof, text)
        assert prep is not None and prep.buf_np is not None
        assert prep._planes is None, "one-shot search materialized planes"
        assert sorted(got1) == sorted(want), n
        # second sighting: standard path (planes materialize), same result
        got2 = eng.candidates(prof, pc, text, 2, alpha, None, False)
        assert sorted(got2) == sorted(want), n
        assert prep._planes is not None


def test_oneshot_bytes_ascii():
    prof = profiles.Ascii(case_sensitive=False)
    eng = XlaEngine()
    oracle = NumpyEngine()
    text = np.frombuffer(b"Hello world, hello WORLD, hullo", np.uint8)
    pat = np.frombuffer(b"hello", np.uint8)
    pc = prof.encode(pat)
    want = oracle.candidates(prof, pc, text, 1, None, None, False)
    got = eng.candidates(prof, pc, text, 1, None, None, False)
    assert sorted(got) == sorted(want)


def test_oneshot_threshold_respected():
    """Texts above ONE_SHOT_BYTES_MAX take the standard path."""
    rng = np.random.default_rng(1)
    prof = profiles.Iupac()
    eng = XlaEngine()
    eng.ONE_SHOT_BYTES_MAX = 1000  # shrink for the test
    text = rng.choice(BASES, size=4096)
    pat = rng.choice(BASES, size=9)
    pc = prof.encode(pat)
    eng.candidates(prof, pc, text, 1, None, None, False)
    prep = eng._prep_cache.get(prof, text)
    assert prep is not None and prep._planes is not None


def test_oneshot_pallas_interpret():
    from sassy_tpu.ops.myers_pallas import PallasEngine

    rng = np.random.default_rng(2)
    prof = profiles.Iupac()
    eng = PallasEngine(interpret=True)
    oracle = NumpyEngine()
    pat = rng.choice(BASES, size=16)
    text = rng.choice(BASES, size=5000)
    text[100:116] = pat
    pc = prof.encode(pat)
    want = oracle.candidates(prof, pc, text, 2, None, None, False)
    got = eng.candidates(prof, pc, text, 2, None, None, False)
    assert sorted(got) == sorted(want)
