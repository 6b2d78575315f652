"""End-to-end CLI tests over temp fasta files (the reference's CLI test
strategy: crispr PAM/n-frac flips counts, --sam formatting; crispr.rs:271-362,
grep.rs:791-820)."""

import numpy as np
import pytest

from sassy_tpu.cli import main
from sassy_tpu.profiles import Iupac

BASES = np.frombuffer(b"ACGT", dtype=np.uint8)
RNG = np.random.default_rng(77)


def _dna(n):
    return bytes(RNG.choice(BASES, size=n))


def _write_fasta(path, recs):
    with open(path, "w") as f:
        for rid, seq in recs:
            f.write(f">{rid}\n{seq.decode()}\n")


def _run(argv, capsys):
    rc = main(argv)
    out = capsys.readouterr()
    return rc, out.out, out.err


@pytest.fixture()
def reads(tmp_path):
    pat = _dna(25)
    comp = Iupac().reverse_complement(pat)
    recs = [
        ("r0", _dna(150)),
        ("r1", _dna(60) + pat + _dna(40)),
        ("r2", _dna(20) + comp + _dna(80)),
    ]
    fa = tmp_path / "reads.fa"
    _write_fasta(fa, recs)
    return pat, str(fa)


def test_search_tsv(reads, capsys):
    pat, fa = reads
    rc, out, err = _run(
        ["search", "-p", pat.decode(), "-k", "1", "--engine", "xla", fa], capsys
    )
    assert rc == 0
    lines = out.strip().split("\n")
    assert lines[0].split("\t") == [
        "pat_id", "text_id", "cost", "strand", "start", "end",
        "match_region", "cigar",
    ]
    rows = [l.split("\t") for l in lines[1:]]
    assert {r[1] for r in rows} == {"r1", "r2"}
    for r in rows:
        # match_region reads in pattern direction: always equals the pattern
        assert r[6] == pat.decode()
        assert r[7] == "25="
    strands = {r[1]: r[3] for r in rows}
    assert strands == {"r1": "+", "r2": "-"}


def test_search_sam_mode(reads, capsys):
    pat, fa = reads
    rc, out, _ = _run(
        ["search", "-p", pat.decode(), "-k", "1", "--sam", "--engine", "xla", fa],
        capsys,
    )
    rows = [l.split("\t") for l in out.strip().split("\n")[1:]]
    rcrow = next(r for r in rows if r[3] == "-")
    # --sam: match_region in text direction = rc(pattern) for this planted match
    assert rcrow[6] == Iupac().reverse_complement(pat).decode()


def test_filter_and_invert(reads, capsys):
    pat, fa = reads
    rc, out, _ = _run(
        ["filter", "-p", pat.decode(), "-k", "1", "--engine", "xla", fa], capsys
    )
    ids = [l[1:] for l in out.split("\n") if l.startswith(">")]
    assert ids == ["r1", "r2"]
    rc, out, _ = _run(
        ["filter", "-p", pat.decode(), "-k", "1", "-v", "--engine", "xla", fa],
        capsys,
    )
    ids = [l[1:] for l in out.split("\n") if l.startswith(">")]
    assert ids == ["r0"]


def test_grep_histogram(reads, capsys):
    pat, fa = reads
    rc, out, err = _run(
        ["grep", "-p", pat.decode(), "-k", "1", "--engine", "xla", fa], capsys
    )
    assert rc == 0
    assert "Statistics: total" in err
    assert "r1" in err and "r2" in err


def test_pattern_file_ids(tmp_path, capsys):
    pats = [_dna(12), _dna(12)]
    text = _dna(30) + pats[1] + _dna(30)
    fa = tmp_path / "t.fa"
    _write_fasta(fa, [("t0", text)])
    pf = tmp_path / "pats.txt"
    pf.write_text("\n".join(p.decode() for p in pats) + "\n")
    rc, out, _ = _run(
        ["search", "-l", str(pf), "-k", "0", "--no-rc", "--engine", "xla", str(fa)],
        capsys,
    )
    rows = [l.split("\t") for l in out.strip().split("\n")[1:]]
    assert rows and all(r[0] == "2" for r in rows)  # 1-based line ids


def test_crispr_pam_filter(tmp_path, capsys):
    guide20 = _dna(20)
    guide = guide20 + b"TGG"
    # plant guide with a correct PAM and one with a broken PAM
    genome = _dna(400) + guide + _dna(200) + guide20 + b"TCA" + _dna(400)
    _write_fasta(tmp_path / "g.fa", [("chr", genome)])
    (tmp_path / "guides.txt").write_text(guide.decode() + "\n")

    rc, out, _ = _run(
        ["crispr", "-g", str(tmp_path / "guides.txt"), "-k", "0",
         "--max-n-frac", "0.2", "--engine", "xla", str(tmp_path / "g.fa")],
        capsys,
    )
    rows = [l.split("\t") for l in out.strip().split("\n") if "\t" in l][1:]
    starts = {int(r[4]) for r in rows}
    assert 400 in starts  # correct-PAM site found
    assert 623 not in starts  # broken-PAM site filtered

    rc, out, _ = _run(
        ["crispr", "-g", str(tmp_path / "guides.txt"), "-k", "0",
         "--allow-pam-edits", "--max-n-frac", "0.2", "--engine", "xla",
         str(tmp_path / "g.fa")],
        capsys,
    )
    rows2 = [l.split("\t") for l in out.strip().split("\n") if "\t" in l][1:]
    assert len(rows2) >= len(rows)


def test_agrep(tmp_path, capsys):
    f = tmp_path / "lines.txt"
    f.write_text("hello world\nnothing\nhealo world again\n")
    rc, out, err = _run(
        ["agrep", "hello world", "1", "--engine", "xla", str(f)], capsys
    )
    assert rc == 0
    assert "Statistics: total \x1b[1m2" in err


def test_pretty_print_directions():
    """RC matches render in text or pattern direction (pretty_print.rs)."""
    from sassy_tpu import Searcher, profiles
    from sassy_tpu.pretty_print import (
        PrettyPrintDirection,
        PrettyPrintStyle,
        pretty_print,
    )

    pat = b"ACGTACGTAA"
    rc = profiles.Iupac().reverse_complement(pat)
    text = b"GGGGG" + rc + b"CCCCC"
    s = Searcher(profiles.Iupac(), rc=True, engine="numpy")
    (m,) = s.search(pat, text, 0)
    assert str(m.strand) == "-"
    txt_dir = pretty_print(m, "p", pat, text, PrettyPrintDirection.TEXT,
                           5, PrettyPrintStyle.FULL, color=False)
    pat_dir = pretty_print(m, "p", pat, text, PrettyPrintDirection.PATTERN,
                           5, PrettyPrintStyle.FULL, color=False)
    assert rc.decode() in txt_dir          # as in the input text
    assert pat.decode() in pat_dir         # flipped to pattern direction
    compact = pretty_print(m, None, pat, text, PrettyPrintDirection.TEXT,
                           5, PrettyPrintStyle.COMPACT, color=False)
    assert compact.startswith("-")


def test_grep_v2_flag(reads, capsys):
    """--v2 routes through encode_patterns/search_encoded_patterns and must
    produce the same TSV as the default path."""
    pat, fa = reads
    _, v1, _ = _run(
        ["search", "-p", pat.decode(), "-k", "1", "--engine", "xla", fa], capsys
    )
    _, v2, _ = _run(
        ["search", "-p", pat.decode(), "-k", "1", "--v2", "--engine", "xla", fa],
        capsys,
    )
    assert sorted(v1.strip().split("\n")) == sorted(v2.strip().split("\n"))
