"""Golden conformance tests transcribed from the reference's executable docs.

Sources: /root/reference/README.md:101-140, /root/reference/src/lib.rs:52-137,
/root/reference/src/n_filter.rs tests. These are behavioral contracts the
reference CI runs as doc tests; our output must be identical.
"""

import pytest

from sassy_tpu import CachedRev, Searcher, Strand, profiles


def test_readme_lib_example_iupac():
    # README.md:101-123
    searcher = Searcher(profiles.Iupac(), rc=False, engine="numpy")
    searcher.set_max_n_frac(0.4)
    matches = searcher.search(b"ATCG", b"AAAATTGAAA", 1)
    assert len(matches) == 1
    m = matches[0]
    assert m.text_start == 3
    assert m.text_end == 7
    assert m.cost == 1
    assert m.strand is Strand.FWD
    assert m.cigar.to_string() == "2=1X1="


def test_librs_fwd_example_dna():
    # lib.rs:63-83
    searcher = Searcher(profiles.Dna(), rc=False, engine="numpy")
    matches = searcher.search(b"ATCG", b"CCCATCACCC", 1)
    assert len(matches) == 1
    m = matches[0]
    assert (m.pattern_start, m.pattern_end) == (0, 4)
    assert (m.text_start, m.text_end) == (3, 7)
    assert m.cost == 1
    assert m.strand is Strand.FWD
    assert m.cigar.to_string() == "3=1X"


def test_librs_rc_example_dna():
    # lib.rs:85-107
    searcher = Searcher(profiles.Dna(), rc=True, engine="numpy")
    cached = CachedRev(b"CCCATCACCC", True)
    matches = searcher.search(b"ATCG", cached, 1)
    assert len(matches) == 2
    fwd, rc = matches
    assert (fwd.text_start, fwd.text_end, fwd.cost) == (3, 7, 1)
    assert fwd.strand is Strand.FWD
    assert fwd.cigar.to_string() == "3=1X"
    assert (rc.pattern_start, rc.pattern_end) == (0, 4)
    assert (rc.text_start, rc.text_end) == (1, 5)
    assert rc.cost == 1
    assert rc.strand is Strand.RC
    assert rc.cigar.to_string() == "2=1X1="


def test_librs_overhang_example():
    # lib.rs:109-137
    searcher = Searcher(profiles.Iupac(), rc=False, alpha=0.5, engine="numpy")
    matches = searcher.search(b"ACGT", b"GTXXXNNN", 1)
    assert len(matches) >= 2
    m0, m1 = matches[0], matches[1]
    assert (m0.pattern_start, m0.pattern_end) == (2, 4)
    assert (m0.text_start, m0.text_end) == (0, 2)
    assert m0.cost == 1
    assert m0.strand is Strand.FWD
    assert m0.cigar.to_string() == "2="
    assert (m1.pattern_start, m1.pattern_end) == (0, 3)
    assert (m1.text_start, m1.text_end) == (5, 8)
    assert m1.cost == 0
    assert m1.cigar.to_string() == "3="


def test_search_vs_search_all_doc():
    # lib.rs:37-46: ABC in XXXABCXXX, k=1 (ASCII semantics)
    s = Searcher(profiles.Ascii(), rc=False, engine="numpy")
    all_matches = s.search_all(b"ABC", b"XXXABCXXX", 1)
    assert sorted(m.text_end for m in all_matches) == [5, 6, 7]
    best = s.search(b"ABC", b"XXXABCXXX", 1)
    assert len(best) == 1
    assert (best[0].text_start, best[0].text_end, best[0].cost) == (3, 6, 0)
    assert best[0].cigar.to_string() == "3="


def test_n_filter_full_overhang_match():
    # n_filter.rs:67-87
    searcher = Searcher(
        profiles.Iupac(), rc=False, alpha=0.5, engine="numpy"
    ).with_max_n_frac(0.0)
    matches = searcher.search_all(b"AAAA", b"GGGGGG", 2)
    assert len(matches) == 4


def test_n_filter_complex_example():
    # n_filter.rs:89-113
    pattern = b"ACGTACGTACGT"
    text = b"NNNNNNNNNNNNNAAAAAAAAAAAAAAAAAANNNNNNNGTACGT"
    k = 1
    s = Searcher(profiles.Iupac(), rc=False, engine="numpy")
    no_filter = s.search_all(pattern, text, k)
    assert len(no_filter) == 6
    s2 = Searcher(profiles.Iupac(), rc=False, engine="numpy").with_max_n_frac(0.5)
    filtered = s2.search_all(pattern, text, k)
    assert len(filtered) == 1
    assert filtered[0].text_end == 44


def test_only_best_match():
    s = Searcher(profiles.Dna(), rc=False, engine="numpy").only_best_match()
    matches = s.search(b"ATCG", b"CCCATCGCCCATCGCC", 1)
    assert len(matches) == 1
    assert matches[0].cost == 0
    # rightmost of the two exact occurrences
    assert matches[0].text_start == 10


def test_without_trace():
    from sassy_tpu import UNKNOWN

    s = Searcher(profiles.Dna(), rc=False, engine="numpy").without_trace()
    matches = s.search(b"ATCG", b"CCCATCGCC", 0)
    assert len(matches) == 1
    m = matches[0]
    assert m.text_start == UNKNOWN
    assert m.text_end == 7
    assert m.pattern_start == UNKNOWN
    assert m.pattern_end == 4
    assert not m.cigar


def test_case_insensitive_dna():
    s = Searcher(profiles.Dna(), rc=False, engine="numpy")
    matches = s.search(b"atcg", b"CCCATCGCC", 0)
    assert len(matches) == 1
    assert matches[0].cigar.to_string() == "4="


def test_iupac_ambiguity_codes():
    s = Searcher(profiles.Iupac(), rc=False, engine="numpy")
    # R = A|G
    matches = s.search(b"ART", b"CCAATCC", 0)
    assert any(m.cost == 0 for m in matches)
    # N matches everything
    matches = s.search(b"ANT", b"CCAGTCC", 0)
    assert any(m.cost == 0 for m in matches)


def test_ascii_case_modes():
    cs = Searcher(profiles.Ascii(case_sensitive=True), engine="numpy")
    assert len(cs.search(b"Hello", b"say hello there", 0)) == 0
    assert len(cs.search(b"hello", b"say hello there", 0)) == 1
    ci = Searcher(profiles.Ascii(case_sensitive=False), engine="numpy")
    assert len(ci.search(b"Hello", b"say hello there", 0)) == 1


def test_overhang_requires_support():
    with pytest.raises(ValueError):
        Searcher(profiles.Dna(), alpha=0.5, engine="numpy")
    with pytest.raises(ValueError):
        Searcher(profiles.Iupac(), alpha=1.5, engine="numpy")


def test_search_many_ordering():
    s = Searcher(profiles.Dna(), rc=False, engine="numpy")
    patterns = [b"ATCG", b"GGGG"]
    texts = [b"ATCGGGGG", b"TTTTATCG"]
    out = s.search_many(patterns, texts, 0)
    keys = [(m.pattern_idx, m.text_idx) for m in out]
    assert keys == sorted(keys)
    assert any(m.pattern_idx == 1 and m.text_idx == 0 for m in out)
