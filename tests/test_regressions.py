"""Named regression cases transcribed from the reference's inline tests
(pinning the same behaviors; citations per case)."""

import numpy as np
import pytest

from sassy_tpu import Searcher, profiles
from sassy_tpu.cigar import Cigar
from sassy_tpu.matchrec import Strand
from sassy_tpu.pretty_print import (
    PrettyPrintDirection,
    PrettyPrintStyle,
    pretty_print,
)

IUPAC = profiles.Iupac()
DNA = profiles.Dna()


def test_fixed_matches():
    """search.rs:2745 test_fixed_matches: planted exact matches found."""
    pattern = b"ATCGATCA"
    text = bytearray(b"G" * 1000)
    positions = [50, 150, 250, 350, 450, 800]
    for pos in positions:
        text[pos : pos + len(pattern)] = pattern
    s = Searcher(DNA, engine="numpy")
    matches = s.search_all(pattern, bytes(text), 1)
    starts = {m.text_start for m in matches}
    for pos in positions:
        assert pos in starts, pos


def test_search_bug_2():
    """search.rs:3194 search_bug_2: planted 1-edit match must be reported by
    the minima rule, not only by search_all."""
    pattern = b"TACACAGTCAAG"
    text = (
        b"GAAGTGTCACGACTGTAGGATTGTTCGTTTGTGTGGTCATATTAAGAATATGCGTCCTGGCATTTACTCC"
        b"GCAATATGATAACCCACTAACGCCTGGCTAAACTAATAAAATTCTTGCGTATGCCAGTGGGTATTGTCCA"
        b"CCTCACTCCTGAGTCTACGCGCGACCAATAACTTAGTTACGAACTTCCGGAACACATATTACCAGAAAAA"
        b"GCGCACGATGTTACGTATCGTTATGGGCAGCCTCCGTAACCCCGTCTCTAGGGTTTCGCCCTTCGTAGTC"
        b"CTAACACCCCCTGATTTTTTAATACAGACGGACGCTCTCCAAAGTCCGCTGACTAGTTTCCTAATACTCT"
        b"CTTTGTCATATAACACCCTCGTTTTCGACAGGCCATCTAGAATTTTATGGATCCTTAGGGTATTCAGGGC"
        b"GGTCAAATCTAGCCTTACGACAGTCAAGTCACATGTGAATACTCCTTCTTCCACGGACGTCTTTATAAAT"
        b"TCCCCCTATTGCCTCTCACTAGGGGTTTCCATGGGGCTTGATCGCACAATAGGAATGTCTAGGAGGCAAG"
    )
    edits, expected_idx = 1, 436
    for engine in ("numpy", "xla"):
        s = Searcher(DNA, engine=engine)
        matches = s.search(pattern, text, edits)
        assert any(
            abs(m.text_start - expected_idx) <= edits for m in matches
        ), (engine, matches)


def test_search_bug_3():
    """search.rs:3231 search_bug_3: high-k short-text minima reporting."""
    pattern = b"CGATCGGAATCTCTTTGTTCATGATCCAAAGCCCAGCCATCAGCCCGAACGGTGGTTCGCG"
    text = b"ACAGGGTGATCGAATCTTTTTTTTTGTACTCCAAAGCCCTCATCAGCTCCGACAGTGGTTCGCG"
    edits, expected_idx = 18, 3
    for engine in ("numpy", "xla"):
        s = Searcher(DNA, engine=engine)
        matches = s.search(pattern, text, edits)
        assert any(
            abs(m.text_start - expected_idx) <= edits for m in matches
        ), (engine, matches)


def test_original_rc_bug_smoke():
    """search.rs:3268 original_rc_bug: fwd and rc queries against the same
    text; must not crash and the rc-of-fwd must find the site the fwd
    pattern finds on the other strand."""
    fwd = (
        b"TGAAGCGGCGCACGAAAAACGCGAAAGCGTTTCACGATAAATGCGAAAAC"
        b"NNNNNNNNNNNNNNNNNNNNNNNN"
        b"GGTTAAACACCCAAGCAGCAATACGTAACTGAACGAAGTACAGGAAAAAAAA"
    )
    rc = IUPAC.reverse_complement(fwd)
    text = (
        b"TGTTATATTTCCCTGTACTTCGTTCCAGTTATTTTTATGCAAAAAACCGGTGTTTAACCACCACTGCCAT"
        b"GTATCAAAGTACGGTTTTCGCATTTATCGTGAAACGCTTTCGCGTTTTTCGTGCGCCGCTTCAACAGGAA"
        b"AACTATTTTCTGCAG"
    )
    s = Searcher(IUPAC, rc=True, engine="xla")
    m_fwd = s.search(fwd, text, 44)
    m_rc = s.search(rc, text, 44)
    assert m_fwd and m_rc
    # the same genomic site is hit from both query orientations
    # (the reference test is diagnostic-only; we assert span overlap)
    overlap = any(
        a.text_start < b.text_end and b.text_start < a.text_end
        for a in m_fwd
        for b in m_rc
    )
    assert overlap, (m_fwd, m_rc)


def test_cigar_invariant_under_rc_text():
    """search.rs:3310: the CIGAR of a match is invariant when searching the
    reverse-complemented text on the other strand."""
    pattern = b"AAAAAAA"
    text = b"GGGGAATAAAAGGG"
    s_fwd = Searcher(DNA, engine="numpy")
    fwd_cigar = s_fwd.search(pattern, text, 1)[0].cigar.to_string()
    s_rc = Searcher(DNA, rc=True, engine="numpy")
    text_rc = IUPAC.reverse_complement(text)
    matches = s_rc.search(pattern, text_rc, 1)
    rc = [m for m in matches if m.strand is Strand.RC]
    assert rc and rc[0].cigar.to_string() == fwd_cigar


def test_cigar_rc_at_overhang_end_smoke():
    """search.rs:3389 test_cigar_rc_at_overhang_end (smoke: both strands
    trace without error)."""
    pattern = b"TTTTAAA"
    pattern_rc = IUPAC.reverse_complement(pattern)
    text = b"GGGGGGGGGTTTTAAA"
    s = Searcher(IUPAC, rc=True, alpha=0.5, engine="numpy")
    assert s.search(pattern, text, 1)
    assert s.search(pattern_rc, text, 1)


def test_real_data_bug_smoke():
    """search.rs:3412 real_data_bug: long pattern with an N-run + overhang
    rc search; must not crash."""
    pattern = (
        b"TTTTTTTTCCTGTACTTCGTTCAGTTACGTATTGCTGCTTGGGTGTTTAACC"
        b"NNNNNNNNNNNNNNNNNNNNNNNN"
        b"GTTTTCGCATTTATCGTGAAACGCTTTCGCGTTTTTCGTGCGCCGCTTCA"
    )
    rng = np.random.default_rng(0)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    text = bytes(rng.choice(bases, size=1800))
    planted = bytes(
        IUPAC.reverse_complement(pattern[:52] + b"A" * 24 + pattern[76:])
    )
    text = text[:60] + planted + text[60:]
    s = Searcher(IUPAC, rc=True, alpha=0.5, engine="xla")
    matches = s.search(pattern, text, 45)
    assert matches


def test_amplicon_crash():
    """grep.rs:770 amplicon_crash: big overhang rc search + pretty print
    must not crash."""
    rng = np.random.default_rng(11)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    pattern = bytes(rng.choice(bases, size=500))
    core = bytearray(pattern[30:470])
    for _ in range(30):  # ~30 scattered edits
        core[rng.integers(0, len(core))] = rng.choice(bases)
    text = bytes(DNA.reverse_complement(bytes(core) + bytes(rng.choice(bases, size=25))))
    s = Searcher(IUPAC, rc=True, alpha=0.5, engine="xla")
    matches = s.search(pattern, text, 40)
    for m in matches:
        pretty_print(
            m, None, pattern, text,
            PrettyPrintDirection.TEXT, 0, PrettyPrintStyle.FULL,
        )


def test_sam_cigar_formatting():
    """grep.rs sam_output: RC cigars reversed only in --sam mode."""
    from sassy_tpu.cli import _format_cigar
    from sassy_tpu.matchrec import Match

    cigar = Cigar.from_string("2=1X3D")
    m = Match(strand=Strand.RC, cigar=cigar)
    assert _format_cigar(m, sam=False) == "2=1X3D"
    assert _format_cigar(m, sam=True) == "3D1X2="
    m.strand = Strand.FWD
    assert _format_cigar(m, sam=True) == "2=1X3D"
    assert _format_cigar(m, sam=False) == "2=1X3D"


def test_tile_boundary_lookahead():
    """Word-level selection must read the true next delta at a tile's last
    owned position (one right-context word per window), not an artificial
    +1: a cost run decreasing across the tile boundary (exact match just
    past it) must suppress the boundary position as a non-minimum."""
    import numpy as np

    from sassy_tpu import profiles
    from sassy_tpu.ops.myers_xla import XlaEngine
    from sassy_tpu.search import NumpyEngine

    prof = profiles.Iupac()
    rng = np.random.default_rng(0)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    pat = b"ACGT"
    pc = prof.encode(pat)
    for trial in range(6):
        text = rng.choice(bases, size=2000)
        # exact match at [1022:1026]: costs 2,1,0 at ends 1024,1025,1026 —
        # strictly decreasing across the 512-position tile boundary at 1024
        text[1022:1026] = np.frombuffer(pat, np.uint8)
        want = NumpyEngine().candidates(prof, pc, text, 2, None, None, False)
        got = XlaEngine().candidates(prof, pc, text, 2, None, None, False)
        assert sorted(got) == sorted(want), trial


@pytest.mark.slow
def test_plateau_state_across_restarts():
    """The rightmost-minima decreasing-state needs unbounded left context:
    a flat cost plateau (homopolymer run) entered by a +1 delta and crossing
    a tile/piece/shard restart must NOT emit the plateau edge. Restart halos
    carry artifact deltas, so the state is seeded by the cross-tile chain
    (ops/minima.py tile_state_chain) / all_gather (parallel/sharded.py)."""
    import numpy as np

    from sassy_tpu import profiles
    from sassy_tpu.ops.batch import BatchEngine
    from sassy_tpu.ops.myers_xla import XlaEngine
    from sassy_tpu.search import NumpyEngine

    prof = profiles.Iupac()
    rng = np.random.default_rng(99)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    oracle = NumpyEngine()
    be = BatchEngine(cell_budget=1 << 18)
    for trial in range(12):
        m = int(rng.integers(3, 12))
        k = int(rng.integers(0, min(m, 4)))
        pat = rng.choice(bases, size=m)
        segs, tot = [], 0
        while tot < 3000:
            r = int(rng.integers(20, 400))
            segs.append(np.full(r, rng.choice(bases), np.uint8))
            tot += r
            if rng.integers(0, 3) == 0:
                segs.append(pat.copy())
                tot += m
        text = np.concatenate(segs)[:3000]
        allm = bool(rng.integers(0, 2))
        want = oracle.candidates(prof, pat, text, k, None, None, allm)
        got = XlaEngine().candidates(prof, pat, text, k, None, None, allm)
        assert sorted(got) == sorted(want), ("xla", trial, m, k, allm)
        gotb = be.candidates_many(prof, [pat], [text], k, None, None, allm)[0][0]
        assert sorted(map(tuple, gotb)) == sorted(map(tuple, want)), (
            "batch", trial, m, k, allm,
        )


def test_overhang_tail_restart_margin():
    """The overhang fast path's tail tile restarts with a cost-j boundary,
    so its window must re-scan >= m+k chars before the overshoot span.
    Texts that fit one tile plan with halo=0; slicing the tail with that
    halo left the restart DP unconverged at the first overshoot positions
    (found by scripts/soak_cpu.py: GMMRGC over T-homopolymers, alpha=0.5,
    missing suffix-overhang minima at n+1/n+3)."""
    import numpy as np

    from sassy_tpu import profiles
    from sassy_tpu.ops.myers_xla import XlaEngine
    from sassy_tpu.search import NumpyEngine

    prof = profiles.Iupac()
    pat = np.frombuffer(b"GMMRGC", np.uint8)
    for n in (32, 33, 35, 64, 67):
        for alpha in (0.25, 0.5, 1.0):
            t = np.full(n, ord("T"), np.uint8)
            want = NumpyEngine().candidates(prof, pat, t, 3, alpha, None, False)
            got = XlaEngine().candidates(prof, pat, t, 3, alpha, None, False)
            assert sorted(got) == sorted(want), (n, alpha)


def test_overhang_batch_piece_boundaries():
    """Batch-engine overhang fast path at piece-boundary shapes: suffix
    overshoot minima must match the oracle for text lengths around word
    and piece multiples (companion to test_overhang_tail_restart_margin,
    which covers the single-pattern tail tile)."""
    import numpy as np

    from sassy_tpu import profiles
    from sassy_tpu.ops.batch import BatchEngine
    from sassy_tpu.search import NumpyEngine

    prof = profiles.Iupac()
    rng = np.random.default_rng(7)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    be = BatchEngine(cell_budget=1 << 16)  # force several small pieces
    oracle = NumpyEngine()
    # batched overhang requires equal-length patterns
    pats = [np.frombuffer(b"GMMRGC", np.uint8), rng.choice(bases, size=6)]
    for n in (31, 32, 33, 255, 256, 257, 511, 513):
        text = np.full(n, ord("T"), np.uint8)
        if n > 40:
            text[: n // 2] = rng.choice(bases, size=n // 2)
        # plant a suffix-overhang half-occurrence at the very end
        half = pats[1][: max(3, len(pats[1]) // 2)]
        text[n - len(half):] = half
        for alpha in (0.5, 1.0):
            want = [
                oracle.candidates(prof, p, text, 3, alpha, None, False)
                for p in pats
            ]
            got = be.candidates_many(prof, pats, [text], 3, alpha, None, False)
            for q in range(len(pats)):
                assert sorted(map(tuple, got[q][0])) == sorted(want[q]), (
                    n, alpha, q,
                )


def test_boundary_candidate_screened():
    """Position 0 (the tile boundary) must be screened by word 0 of the
    position-0-owning tile: with an overhang boundary, cost at position 0
    is floor(alpha*m), which can be <= k while every in-word position is
    more expensive (found by scripts/soak_cpu.py: alpha=0, k=0 dropped
    the cost-0 candidate at position 0)."""
    import numpy as np

    from sassy_tpu import profiles
    from sassy_tpu.ops.batch import BatchEngine
    from sassy_tpu.ops.myers_xla import XlaEngine
    from sassy_tpu.search import NumpyEngine

    prof = profiles.Iupac()
    rng = np.random.default_rng(17)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    be = BatchEngine(cell_budget=1 << 16)
    for m, n, k, alpha in (
        (11, 3150, 0, 0.0),  # the soak case shape
        (6, 100, 1, 0.25),
        (4, 40, 0, 0.0),
        (8, 700, 2, 0.25),
    ):
        text = rng.choice(bases, size=n)
        pat = rng.choice(bases, size=m)
        want = NumpyEngine().candidates(prof, pat, text, k, alpha, None, False)
        got = XlaEngine().candidates(prof, pat, text, k, alpha, None, False)
        assert sorted(got) == sorted(want), (m, n, k, alpha)
        gb = be.candidates_many(prof, [pat], [text], k, alpha, None, False)
        assert sorted(map(tuple, gb[0][0])) == sorted(want), (m, n, k, alpha)
