"""Tests for search_all_alignments, transcribed from the reference's
inline tests (/root/reference/src/search.rs:1795-2190)."""

import numpy as np

from sassy_tpu import Searcher, Strand, profiles
from sassy_tpu.alignment_iterator import CONTINUE, iterate_all_alignments


def _searcher():
    return Searcher(profiles.Dna(), rc=False, engine="numpy").with_max_n_frac(1.0)


def test_multiple_end_positions():
    groups = _searcher().search_all_alignments(b"AA", b"AAAA", 0)
    assert len(groups) == 3
    for g in groups:
        assert len(g) == 1
        m = g[0]
        assert m.cost == 0
        assert (m.pattern_start, m.pattern_end) == (0, 2)
        assert m.text_end - m.text_start == 2


def test_complete_matches_span_full_pattern():
    groups = _searcher().search_all_alignments(b"ACGT", b"AACGTT", 2)
    assert groups
    for g in groups:
        for m in g:
            assert (m.pattern_start, m.pattern_end) == (0, 4)


def test_combinatorial_count():
    t, k = 5, 3
    pattern = b"A" * (t + k)
    text = b"A" * t
    groups = _searcher().search_all_alignments(pattern, text, k)
    assert sum(len(g) for g in groups) == 56  # C(8,3)


def test_homopolymer_prune_gives_one_exact_per_end():
    groups = _searcher().search_all_alignments(b"AAAA", b"AAAAAA", 2)
    assert sum(len(g) for g in groups) == 3
    for g in groups:
        assert len(g) == 1
        m = g[0]
        assert m.cost == 0
        assert m.text_end - m.text_start == m.pattern_end - m.pattern_start
        assert m.cigar.to_string() == "4="


def test_no_leading_or_trailing_deletions():
    for rc in (False, True):
        s = Searcher(profiles.Dna(), rc=rc, engine="numpy").with_max_n_frac(1.0)
        groups = s.search_all_alignments(b"ACGT", b"XACGTX", 1)
        for g in groups:
            for m in g:
                expanded = m.cigar.expand()
                assert not expanded.startswith("D"), m
                assert not expanded.endswith("D"), m


def test_no_partial_callbacks_when_disabled():
    s = Searcher(profiles.Dna(), rc=False, engine="numpy")
    s.without_trace_flag = True
    matches = s.search_all(b"ACG", b"AACG", 1)
    s.without_trace_flag = False
    fwd = [m for m in matches if m.strand is Strand.FWD]

    def cb(complete, m):
        assert complete
        return CONTINUE

    iterate_all_alignments(s, b"ACG", b"AACG", 1, fwd, False, cb)


def test_partial_callbacks_when_enabled():
    s = Searcher(profiles.Dna(), rc=False, engine="numpy")
    s.without_trace_flag = True
    matches = s.search_all(b"ACG", b"AACG", 1)
    s.without_trace_flag = False
    fwd = [m for m in matches if m.strand is Strand.FWD]
    saw_partial = []

    def cb(complete, m):
        if not complete:
            saw_partial.append(True)
            assert m.pattern_start > 0
        return CONTINUE

    iterate_all_alignments(s, b"ACG", b"AACG", 1, fwd, True, cb)
    assert saw_partial


def test_empty_matches_no_callbacks():
    s = Searcher(profiles.Dna(), rc=False, engine="numpy")
    called = []
    iterate_all_alignments(
        s, b"ACGT", b"ACGT", 1, [], False, lambda c, m: called.append(1) or CONTINUE
    )
    assert not called


def test_consistent_with_search_all():
    """Reference contract (search.rs:2010-2070): every group anchors at a
    search_all endpoint (some endpoints may yield no group — e.g. only
    pruned leading-deletion paths); all alignments in a group share the
    anchor and have cost <= k."""
    rng = np.random.default_rng(7)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    s = Searcher(profiles.Dna(), rc=False, engine="numpy")
    for _ in range(20):
        pattern = rng.choice(bases, size=int(rng.integers(3, 12))).tobytes()
        text = rng.choice(bases, size=int(rng.integers(10, 80))).tobytes()
        k = int(rng.integers(0, 3))
        endpoints = s.search_all(pattern, text, k)
        groups = s.search_all_alignments(pattern, text, k)
        assert len(groups) <= len(endpoints)
        by_end = {m.text_end: m for m in endpoints}
        for grp in groups:
            assert grp
            anchor = grp[0].text_end
            assert anchor in by_end, (pattern, text, k, grp[0])
            for m in grp:
                assert m.text_end == anchor
                assert m.cost <= k



def test_rc_all_alignments_coordinates():
    s = Searcher(profiles.Dna(), rc=True, engine="numpy")
    groups = s.search_all_alignments(b"ACGT", b"TTACGTTT", 0)
    strands = {m.strand for g in groups for m in g}
    assert Strand.FWD in strands
    rc_groups = s.search_all_alignments(b"ACGT", b"TTAACGTT", 0)
    # rc(ACGT) = ACGT is a palindrome; both strands match at the same spot
    found = [(m.strand, m.text_start, m.text_end) for g in rc_groups for m in g]
    assert (Strand.RC, 3, 7) in found
