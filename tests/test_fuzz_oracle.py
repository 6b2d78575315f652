"""Fuzz tests of the core semantics (NumPy oracle engine).

Modeled on the reference's planted-match fuzz (search.rs:2604-2710
``search_fuzz``) and internal consistency checks.
"""

import numpy as np
import pytest

from sassy_tpu import Searcher, Strand, profiles
from sassy_tpu.cigar import DEL, INS, MATCH, SUB
from sassy_tpu.semantics import find_candidates, find_candidates_scalar

rng = np.random.default_rng(0)

BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


def rand_dna(n):
    return rng.choice(BASES, size=n).tobytes()


def apply_random_edits(pattern: bytes, edits: int) -> bytes:
    p = bytearray(pattern)
    for _ in range(edits):
        if not p:
            break
        op = rng.integers(0, 3)
        pos = int(rng.integers(0, len(p)))
        if op == 0:  # sub
            p[pos] = int(rng.choice(BASES))
        elif op == 1:  # del
            del p[pos]
        else:  # ins
            p.insert(pos, int(rng.choice(BASES)))
    return bytes(p)


def test_minima_vectorized_matches_scalar():
    for _ in range(500):
        n = int(rng.integers(1, 40))
        costs = rng.integers(0, 6, size=n)
        k = int(rng.integers(0, 5))
        assert find_candidates(costs, k, False) == find_candidates_scalar(
            costs, k, False
        )
        assert find_candidates(costs, k, True) == find_candidates_scalar(costs, k, True)


def verify_match(profile, pattern: bytes, text: bytes, m):
    """Check the CIGAR is consistent: walking it over (pattern, region)
    reproduces the cost and consumes both fully."""
    region = text[m.text_start : m.text_end]
    if m.strand is Strand.RC:
        region = profile.reverse_complement(region)
    pi, ti, cost = m.pattern_start, 0, 0
    for op, cnt in m.cigar.ops:
        for _ in range(cnt):
            if op == MATCH:
                assert profile.is_match(pattern[pi], region[ti]), (
                    pattern,
                    text,
                    m,
                    region,
                )
                pi += 1
                ti += 1
            elif op == SUB:
                cost += 1
                pi += 1
                ti += 1
            elif op == INS:
                cost += 1
                pi += 1
            elif op == DEL:
                cost += 1
                ti += 1
    assert pi == m.pattern_end
    assert ti == len(region)
    if m.pattern_start == 0 and m.pattern_end == len(pattern):
        assert cost == m.cost, (pattern, text, m)


@pytest.mark.parametrize("use_rc", [False, True])
def test_planted_match_fuzz(use_rc):
    profile = profiles.Dna()
    s = Searcher(profile, rc=use_rc, engine="numpy")
    for _ in range(60):
        m_len = int(rng.integers(5, 60))
        n_len = int(rng.integers(m_len + 1, 400))
        pattern = rand_dna(m_len)
        max_edits = max(1, m_len // 3)
        edits = int(rng.integers(0, max_edits))
        planted = apply_random_edits(pattern, edits)
        if use_rc and rng.integers(0, 2):
            planted = profile.reverse_complement(planted)
        text = bytearray(rand_dna(n_len))
        pos = int(rng.integers(0, n_len - len(planted) + 1)) if n_len > len(planted) else 0
        text[pos : pos + len(planted)] = planted
        text = bytes(text)

        matches = s.search(pattern, text, edits)
        assert matches, (pattern, text, edits)
        # some match must be near the planted position
        assert any(
            abs(m.text_start - pos) <= edits + 1 for m in matches
        ), (pattern, text, pos, edits, matches)
        for m in matches:
            assert m.cost <= edits
            verify_match(profile, pattern, text, m)


def test_all_matches_cost_verified_iupac():
    profile = profiles.Iupac()
    s = Searcher(profile, rc=True, engine="numpy")
    for _ in range(40):
        m_len = int(rng.integers(3, 25))
        n_len = int(rng.integers(10, 120))
        pattern = rand_dna(m_len)
        text = rand_dna(n_len)
        k = int(rng.integers(0, 4))
        for m in s.search_all(pattern, text, k):
            assert m.cost <= k
            verify_match(profile, pattern, text, m)


def test_overhang_fuzz_costs():
    """Overhang matches must satisfy the alpha cost accounting."""
    profile = profiles.Iupac()
    for _ in range(30):
        alpha = float(rng.choice([0.25, 0.5, 1.0]))
        s = Searcher(profile, rc=False, alpha=alpha, engine="numpy")
        m_len = int(rng.integers(4, 20))
        n_len = int(rng.integers(m_len, 80))
        pattern = rand_dna(m_len)
        text = rand_dna(n_len)
        k = int(rng.integers(0, 4))
        for m in s.search_all(pattern, text, k):
            assert m.cost <= k
            verify_match(profile, pattern, text, m)
            # overhang chars charged floor(alpha * len) at each end
            left = m.pattern_start
            right = m_len - m.pattern_end
            base = int(np.floor(np.float32(alpha) * np.float32(left))) + int(
                np.floor(np.float32(alpha) * np.float32(right))
            )
            assert m.cost >= base


def test_search_vs_search_all_subset():
    """Every local-minima match must appear among the all-positions matches."""
    profile = profiles.Dna()
    s = Searcher(profile, rc=False, engine="numpy")
    for _ in range(40):
        pattern = rand_dna(int(rng.integers(4, 20)))
        text = rand_dna(int(rng.integers(20, 200)))
        k = int(rng.integers(0, 3))
        minima = s.search(pattern, text, k)
        everything = s.search_all(pattern, text, k)
        all_keys = {(m.text_end, m.cost) for m in everything}
        for m in minima:
            assert (m.text_end, m.cost) in all_keys


def test_long_patterns_vs_oracle():
    """v1-range pattern lengths (up to ~1000bp, search.rs practicality cap):
    the bit-parallel engine must match the oracle for multi-limb row counts."""
    import numpy as np

    from sassy_tpu import Searcher, profiles

    rng = np.random.default_rng(99)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    prof = profiles.Iupac()
    for m, k in ((150, 10), (400, 25), (1000, 40)):
        text = bytearray(rng.choice(bases, size=5 * m))
        pat = bytes(rng.choice(bases, size=m))
        mut = bytearray(pat)
        for _ in range(k // 2):
            mut[rng.integers(0, m)] = rng.choice(bases)
        text[m : 2 * m] = mut
        text = bytes(text)

        o = Searcher(prof, engine="numpy").search(pat, text, k)
        x = Searcher(prof, engine="xla").search(pat, text, k)
        assert len(o) == len(x) and all(
            a.same_as(b) for a, b in zip(sorted(o), sorted(x))
        ), (m, k, o, x)
        assert o, (m, k)
