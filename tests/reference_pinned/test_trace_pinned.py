"""Reference-authored pinned expectations: traceback paths.

Transcribed from /root/reference/src/search.rs trace-path tests and
/root/reference/src/trace.rs tests (file:line cited per test).
"""

import pytest

from sassy_tpu import Searcher, profiles

ENGINES = ["numpy", "xla"]


@pytest.mark.parametrize("engine", ENGINES)
def test_pattern_trace_path_0_edits(engine):
    # search.rs:2880-2896
    s = Searcher(profiles.Dna(), rc=False, engine=engine)
    matches = s.search(b"ATGC", b"GGGGATGCGGG", 0)
    path = matches[0].to_path()
    assert path == [(0, 4), (1, 5), (2, 6), (3, 7)]
    assert matches[0].pattern_end == path[-1][0] + 1
    assert matches[0].text_end == path[-1][1] + 1


@pytest.mark.parametrize("engine", ENGINES)
def test_pattern_trace_path_0_edits_rc(engine):
    # search.rs:2898-2914
    prof = profiles.Dna()
    pattern = b"TCCGGAT"
    text = b"GGGGGGGGATGCGGAAAA"
    s = Searcher(prof, rc=True, engine=engine)
    matches = s.search(pattern, text, 1)
    path = matches[0].to_path()
    for q_pos, r_pos in path[:4]:
        assert pattern[q_pos] == prof.reverse_complement(
            text[r_pos : r_pos + 1]
        )[0]


@pytest.mark.parametrize("engine", ENGINES)
def test_pattern_trace_path_1_edits(engine):
    # search.rs:2916-2928
    s = Searcher(profiles.Dna(), rc=False, engine=engine)
    matches = s.search(b"ATGC", b"GGGGATTGCGGG", 1)
    path = matches[0].to_path()
    assert path == [(0, 5), (1, 6), (2, 7), (3, 8)]
    assert matches[0].pattern_end == path[-1][0] + 1
    assert matches[0].text_end == path[-1][1] + 1


@pytest.mark.parametrize("engine", ENGINES)
def test_pattern_trace_path_with_overhang_prefix(engine):
    # search.rs:2930-2943
    s = Searcher(profiles.Iupac(), rc=False, alpha=0.5, engine=engine)
    matches = s.search(b"ATCGATCG", b"ATCGGGGGGGGGG", 2)
    path = matches[0].to_path()
    assert path == [(4, 0), (5, 1), (6, 2), (7, 3)]
    assert matches[0].pattern_end == path[-1][0] + 1
    assert matches[0].text_end == path[-1][1] + 1


@pytest.mark.parametrize("engine", ENGINES)
def test_pattern_trace_path_with_overhang_suffix(engine):
    # search.rs:2945-2958
    s = Searcher(profiles.Iupac(), rc=False, alpha=0.5, engine=engine)
    matches = s.search(b"ATCGATCG", b"GGGGGGGATCG", 2)
    path = matches[0].to_path()
    assert path == [(0, 7), (1, 8), (2, 9), (3, 10)]
    assert matches[0].pattern_end == path[-1][0] + 1
    assert matches[0].text_end == path[-1][1] + 1


@pytest.mark.parametrize("engine", ENGINES)
def test_traceback_deletion_block(engine):
    # trace.rs:413-424 (test_traceback): pattern with CCC deleted from text;
    # the greedy walk must produce a cost-3 pure-deletion alignment.
    s = Searcher(profiles.Dna(), rc=False, engine=engine)
    matches = s.search(b"ATTTTCCCGGGGATTTT", b"ATTTTGGGGATTTT", 3)
    assert matches, "expected a match"
    m = min(matches, key=lambda m: m.cost)
    assert m.cost == 3
    ops = m.cigar.to_string()
    # 3 pattern chars unmatched by text: net 3 insertions (pattern-direction I)
    assert ops.count("I") >= 1 or ops.count("D") >= 1


@pytest.mark.parametrize("engine", ENGINES)
def test_traceback_multi_window(engine):
    # trace.rs:426-447 (test_traceback_simd): same pattern against four
    # windows of different lengths — every trace must complete with the
    # recorded cost.
    pattern = b"ATTTTCCCGGGGATTTT"
    texts = [
        b"ATTTTCCCGGGGATTTT",
        b"ATTTTGGGGATTTT",
        b"TGGGGATTTT",
        b"TTTTTTTTTTATTTTGGGGATTTT",
    ]
    s = Searcher(profiles.Dna(), rc=False, engine=engine)
    expected_best = [0, 3, 7, 3]
    for text, cb in zip(texts, expected_best):
        matches = s.search(pattern, text, len(pattern) // 2)
        if cb <= len(pattern) // 2:
            assert matches
            assert min(m.cost for m in matches) == cb
