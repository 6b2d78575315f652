"""Differential fuzz: NumPy oracle and engines vs the independent C++ DP.

The reference's conformance contract is differential fuzz between two
independently written implementations (pattern_tiling/search.rs:690-848,
1M cases, with edlib as a third-party cost oracle in the evals). edlib is
not installable here, so native/refcost.cc plays that role: a scalar
cell-by-cell C++ DP sharing no code or algorithmic shortcuts with the
Python oracle (prefix-min rows) or the bit-parallel engines.

Default runs use hundreds of cases; ``pytest -m soak`` scales to 10k+.
"""

import numpy as np
import pytest

from sassy_tpu import Searcher, profiles, refcost
from sassy_tpu.oracle import end_costs as np_end_costs
from sassy_tpu.profiles import as_bytes_array

pytestmark = pytest.mark.skipif(
    refcost.load() is None, reason="native refcost library unavailable"
)

IUPAC_BASES = b"ACGTNRYSWKMBDHVU"
RNG = np.random.default_rng(20260817)


def _rand_seq(n, bases=b"ACGT"):
    arr = np.frombuffer(bases, dtype=np.uint8)
    return bytes(RNG.choice(arr, size=n))


def _check_case(profile, pattern, text, alpha, max_overhang=None):
    codes_p = profile.encode(as_bytes_array(pattern))
    codes_t = profile.encode(as_bytes_array(text))
    ours = np_end_costs(profile, codes_p, codes_t, alpha, max_overhang)
    theirs = refcost.end_costs(profile, pattern, text, alpha, max_overhang)
    np.testing.assert_array_equal(
        ours, theirs,
        err_msg=f"pattern={pattern!r} text={text!r} alpha={alpha}",
    )


def _fuzz(n_cases):
    prof_iupac = profiles.Iupac()
    prof_dna = profiles.Dna()
    for i in range(n_cases):
        m = int(RNG.integers(1, 40))
        n = int(RNG.integers(1, 120))
        alpha = [None, 0.0, 0.5, 0.25, 1.0][int(RNG.integers(0, 5))]
        if RNG.random() < 0.5:
            pattern = _rand_seq(m, IUPAC_BASES)
            text = _rand_seq(n, b"ACGTN")
            _check_case(prof_iupac, pattern, text, alpha)
        else:
            pattern = _rand_seq(m)
            text = _rand_seq(n)
            _check_case(prof_dna, pattern, text, None)
        if alpha is not None and RNG.random() < 0.3:
            mo = int(RNG.integers(0, m + 1))
            _check_case(prof_iupac, _rand_seq(m, IUPAC_BASES),
                        _rand_seq(n, b"ACGTN"), alpha, mo)


def test_oracle_vs_cpp_fuzz():
    _fuzz(300)


@pytest.mark.soak
def test_oracle_vs_cpp_soak():
    _fuzz(10_000)


def test_ascii_profiles():
    prof_cs = profiles.Ascii(case_sensitive=True)
    prof_ci = profiles.Ascii(case_sensitive=False)
    for _ in range(100):
        m = int(RNG.integers(1, 20))
        n = int(RNG.integers(1, 60))
        letters = np.frombuffer(b"abAB xyXY", dtype=np.uint8)
        pattern = bytes(RNG.choice(letters, size=m))
        text = bytes(RNG.choice(letters, size=n))
        _check_case(prof_cs, pattern, text, None)
        _check_case(prof_ci, pattern, text, None)


@pytest.mark.parametrize("engine", ["numpy", "xla"])
def test_engine_match_costs_vs_cpp(engine):
    """Every reported match cost must equal the independent C++ end cost
    at that end position (planted-match workload, both strands)."""
    prof = profiles.Iupac()
    for _ in range(30):
        m = int(RNG.integers(8, 30))
        pattern = _rand_seq(m)
        text = bytearray(_rand_seq(int(RNG.integers(m, 400))))
        pos = int(RNG.integers(0, len(text) - m + 1))
        text[pos : pos + m] = pattern  # plant an exact occurrence
        text = bytes(text)
        k = int(RNG.integers(0, 4))
        s = Searcher(prof, rc=False, engine=engine)
        cpp = refcost.end_costs(prof, pattern, text, None)
        for match in s.search_all(pattern, text, k):
            assert cpp[match.text_end] == match.cost, (
                pattern, text, k, match,
            )
        assert any(
            mm.cost == 0 and mm.text_end == pos + m
            for mm in s.search_all(pattern, text, k)
        )


def test_edit_distance_basics():
    prof = profiles.Dna()
    assert refcost.edit_distance(prof, b"ACGT", b"ACGT") == 0
    assert refcost.edit_distance(prof, b"ACGT", b"AGT") == 1
    assert refcost.edit_distance(prof, b"ACGT", b"AGGT") == 1
    assert refcost.edit_distance(prof, b"ACGT", b"TTTT") == 3
    prof_i = profiles.Iupac()
    assert refcost.edit_distance(prof_i, b"ACGT", b"NNNN") == 0
