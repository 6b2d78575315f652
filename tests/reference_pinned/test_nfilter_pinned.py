"""Reference-authored pinned expectations: N-fraction filtering.

Transcribed from /root/reference/src/search.rs n_frac tests and
/root/reference/src/n_filter.rs tests (file:line cited per test).
"""

import pytest

from sassy_tpu import Searcher, profiles

ENGINES = ["numpy", "xla"]


def test_n_frac_filtering_all_alignments():
    # search.rs:2186-2206 (n_frac_filtering)
    groups = Searcher(
        profiles.Iupac(), rc=False, engine="numpy"
    ).with_max_n_frac(0.0).search_all_alignments(b"ACGT", b"NNNN", 4)
    assert groups == []
    groups = Searcher(
        profiles.Iupac(), rc=False, engine="numpy"
    ).with_max_n_frac(1.0).search_all_alignments(b"ACGT", b"NNNN", 4)
    assert groups


def test_n_frac_prefilter_dense_n_skipped_fwd():
    # search.rs:2208-2221
    groups = Searcher(
        profiles.Iupac(), rc=False, engine="numpy"
    ).with_max_n_frac(0.5).search_all_alignments(b"ACGTACGTAC", b"NNNNNNNNNN", 2)
    assert groups == []


def test_n_frac_prefilter_real_sequence_passthrough():
    # search.rs:2222-2243
    pattern, text, k = b"ACGTACGT", b"AACGTACGTTT", 1
    filt = Searcher(
        profiles.Dna(), rc=False, engine="numpy"
    ).with_max_n_frac(0.5).search_all_alignments(pattern, text, k)
    unfilt = Searcher(
        profiles.Dna(), rc=False, engine="numpy"
    ).with_max_n_frac(1.0).search_all_alignments(pattern, text, k)
    assert len(filt) == len(unfilt)
    for a, b in zip(filt, unfilt):
        assert len(a) == len(b)


def test_n_frac_prefilter_real_match_after_n_run_not_discarded():
    # search.rs:2245-2269
    pattern = b"ACGTACGT"
    text = b"NNNNNNNNACGTACGT"
    groups = Searcher(
        profiles.Iupac(), rc=False, engine="numpy"
    ).with_max_n_frac(0.4).search_all_alignments(pattern, text, 1)
    assert groups
    for group in groups:
        for m in group:
            assert m.text_start >= 8


def test_n_frac_prefilter_dense_n_skipped_rc():
    # search.rs:2271-2281
    groups = Searcher(
        profiles.Iupac(), rc=True, engine="numpy"
    ).with_max_n_frac(0.5).search_all_alignments(b"ACGTACGTAC", b"NNNNNNNNNN", 2)
    assert groups == []


def test_n_frac_prefilter_rc_real_match_not_discarded():
    # search.rs:2283-2309
    pattern = b"ACGTACGT"
    text = b"ACGTACGTNNNNNNNN"
    groups = Searcher(
        profiles.Iupac(), rc=True, engine="numpy"
    ).with_max_n_frac(0.4).search_all_alignments(pattern, text, 1)
    assert groups
    for group in groups:
        for m in group:
            assert m.text_start < 8


def test_n_frac_on_search_all():
    # search.rs:2311-2325 (test_n_frac_on_search_all)
    pattern = b"ACGTACGTACGT"
    text = b"ACGTACNNNNNN"
    s = Searcher(profiles.Iupac(), rc=False, engine="numpy")
    s.set_max_n_frac(0.49)
    assert s.search_all_alignments(pattern, text, 0) == []
    s.set_max_n_frac(0.5)
    assert len(s.search_all_alignments(pattern, text, 0)) == 1


def test_n_frac_builder_init():
    # search.rs:2326-2334 (test_n_frac_builder_init)
    s = Searcher(profiles.Iupac(), rc=False, engine="numpy").with_max_n_frac(0.49)
    assert s.search_all_alignments(b"ACGTACGTACGT", b"ACGTACNNNNNN", 0) == []


@pytest.mark.parametrize("engine", ENGINES)
def test_n_filter_fuzz_case(engine):
    # n_filter.rs:115-131 (n_filter_fuzz_case): this specific threshold
    # must not change the match count.
    pattern = b"GGGACN"
    text = b"GAGGGCCA"
    k = 3
    s = Searcher(profiles.Iupac(), rc=False, alpha=0.5, engine=engine)
    unfiltered = s.search_all(pattern, text, k)
    s.set_max_n_frac(0.13340974)
    filtered = s.search_all(pattern, text, k)
    assert len(unfiltered) == len(filtered)
