"""Settles the v1-vs-v2 reverse-complement anchor question.

The reference documents two different RC semantics (lib.rs:33-40):

- **v1 native RC** (``Searcher::new_rc``, search.rs:29-30): the pattern is
  matched against ``rc(text[start..end])`` — the DP runs over the
  reverse-complemented text, so "one match per end position" is one match
  per *RC-text* end = per *forward-text start* of each RC site.
- **v2** (``search_encoded_patterns``, pattern_tiling): ``rc(pattern)`` is
  matched against the FORWARD text — one match per *forward-text end* of
  each RC site.

The reference's differential fuzz (pattern_tiling/search.rs:690-848)
*appears* to assert v1 == v2 with RC enabled, which would contradict the
above. It does not: the fuzz builds its v1 side with a **forward-only**
searcher (``new_fwd`` / ``new_fwd_with_overhang``, search.rs:696-700) and
emulates RC by running ``search(&reverse_complement(pattern), &text)`` and
relabeling strand (search.rs:770-780) — i.e. it reimplements v2's RC
semantics on the v1 engine. v1-native RC is never fuzzed against v2, so
the two semantics genuinely differ and no contradiction exists.

Consequences pinned here:

1. The match sets of v1-native RC and v2 can differ — in LocalMinima mode
   (different plateau anchors) AND in All mode (per-start vs per-end
   enumeration of RC alignments). Minimal concrete cases are pinned.
2. The fuzz invariant that IS asserted by the reference: v2 output equals
   the forward search of rc(pattern) with strand relabeled. We replicate
   that differential over random cases.
3. Surfaces: ``encode_patterns`` defaults to v2 semantics
   (rc_anchor="start") because the reference's v2 engine always behaves
   that way (and the reference CLI's --v2 path, grep.rs:372-374, uses it);
   ``search``/``search_all``/crispr keep v1-native semantics (the
   reference crispr tool uses ``Searcher::new_rc``, crispr.rs:192-195).
"""

import numpy as np
import pytest

from sassy_tpu import Searcher, Strand, profiles

ENGINES = ["numpy", "xla"]


def _key(m):
    return (m.strand is Strand.RC, m.text_start, m.text_end, m.cost)


@pytest.mark.parametrize("engine", ENGINES)
def test_v1_native_vs_v2_anchor_divergence_local_minima(engine):
    """LocalMinima mode: same RC site, different anchor per semantics.

    p=TTAAA in t=GTTGTTAATAT at k=1: rc(p)=TTTAA sits around t[3..8]
    with a cost-1 plateau. v1-native (per RC-text end = per fwd start)
    anchors the site at fwd start 2; v2 (per fwd end) anchors it at
    start 3. Oracle-verified; found by differential search, 2026-08-18.
    """
    prof = profiles.Iupac()
    p, t, k = b"TTAAA", b"GTTGTTAATAT", 1
    s = Searcher(prof, rc=True, engine=engine)

    v1 = sorted(map(_key, s.search(p, t, k)))
    enc = s.encode_patterns([p], include_rc=True, rc_anchor="start")
    v2 = sorted(map(_key, s.search_encoded_patterns(enc, t, k)))

    assert v1 == [(False, 4, 10, 1), (True, 2, 8, 1)]
    assert v2 == [(False, 4, 10, 1), (True, 3, 8, 1)]

    # rc_anchor="end" reproduces v1-native semantics on the v2 surface
    enc_end = s.encode_patterns([p], include_rc=True, rc_anchor="end")
    v2_end = sorted(map(_key, s.search_encoded_patterns(enc_end, t, k)))
    assert v2_end == v1


@pytest.mark.parametrize("engine", ENGINES)
def test_v1_native_vs_v2_divergence_all_mode(engine):
    """All mode: v1-native enumerates one RC match per fwd START with an
    alignment; v2 one per fwd END. Same site, different match sets."""
    prof = profiles.Iupac()
    p, t, k = b"TTAAA", b"GTTGTTAATAT", 1
    s = Searcher(prof, rc=True, engine=engine)

    v1 = sorted(map(_key, s.search_all(p, t, k)))
    enc = s.encode_patterns([p], include_rc=True, rc_anchor="start")
    v2 = sorted(map(_key, s.search_all_encoded_patterns(enc, t, k)))

    fwd = [(False, 4, 8, 1), (False, 4, 9, 1), (False, 4, 10, 1)]
    # starts 2,3,4 all reach the RC site (ends chosen by traceback)
    assert v1 == fwd + [(True, 2, 8, 1), (True, 3, 8, 1), (True, 4, 8, 1)]
    # only end 8 has a cost<=1 RC alignment
    assert v2 == fwd + [(True, 3, 8, 1)]


@pytest.mark.parametrize("engine", ENGINES)
def test_v2_equals_fwd_search_of_rc_pattern(engine):
    """The invariant the reference fuzz actually asserts
    (pattern_tiling/search.rs:770-780): v2-with-RC == forward search of
    rc(pattern) with strand relabeled, in both modes."""
    prof = profiles.Iupac()
    rng = np.random.default_rng(7)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    s_rc = Searcher(prof, rc=True, engine=engine)
    s_fwd = Searcher(prof, rc=False, engine=engine)
    for case in range(40):
        m = int(rng.integers(3, 9))
        n = int(rng.integers(5, 24))
        k = int(rng.integers(0, 3))
        p = bytes(rng.choice(bases, m))
        t = bytes(rng.choice(bases, n))
        rc_p = bytes(prof.reverse_complement(p))
        enc = s_rc.encode_patterns([p], include_rc=True, rc_anchor="start")
        for all_minima in (False, True):
            if all_minima:
                v2 = s_rc.search_all_encoded_patterns(enc, t, k)
                fwd = s_fwd.search_all(p, t, k)
                rc = s_fwd.search_all(rc_p, t, k)
            else:
                v2 = s_rc.search_encoded_patterns(enc, t, k)
                fwd = s_fwd.search(p, t, k)
                rc = s_fwd.search(rc_p, t, k)
            emu = [(False, m_.text_start, m_.text_end, m_.cost)
                   for m_ in fwd]
            emu += [(True, m_.text_start, m_.text_end, m_.cost)
                    for m_ in rc]
            got = sorted(map(_key, v2))
            assert got == sorted(emu), (
                f"case={case} p={p} t={t} k={k} all={all_minima}"
            )


@pytest.mark.parametrize("engine", ENGINES)
def test_rc_anchor_divergence_third_case(engine):
    """A second independent pinned divergence (All mode): p=AGAT in
    t=TATCA at k=1 — v2 sees RC ends {4, 5}; v1-native only start 1."""
    prof = profiles.Iupac()
    p, t, k = b"AGAT", b"TATCA", 1
    s = Searcher(prof, rc=True, engine=engine)
    v1 = sorted(map(_key, s.search_all(p, t, k)))
    enc = s.encode_patterns([p], include_rc=True, rc_anchor="start")
    v2 = sorted(map(_key, s.search_all_encoded_patterns(enc, t, k)))
    assert v1 == [(True, 1, 5, 1)]
    assert v2 == [(True, 1, 4, 1), (True, 1, 5, 1)]
