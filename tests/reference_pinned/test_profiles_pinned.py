"""Profile semantics pinned from the reference's inline tests.

Every expectation below is transcribed verbatim from the reference
authors' own fixed test cases (file:line cited per test):
/root/reference/src/profiles/{iupac,dna,ascii}.rs."""

from sassy_tpu.profiles import Ascii, Dna, Iupac


def test_iupac_is_match():
    # iupac.rs test_iupac_is_match
    p = Iupac()
    assert p.is_match(ord("a"), ord("A"))
    assert p.is_match(ord("C"), ord("C"))
    assert p.is_match(ord("T"), ord("t"))
    assert p.is_match(ord("G"), ord("G"))
    assert p.is_match(ord("y"), ord("Y"))
    assert p.is_match(ord("A"), ord("N"))
    assert p.is_match(ord("C"), ord("Y"))


def test_iupac_valid_seq_all():
    # iupac.rs test_iupac_valid_seq_all
    p = Iupac()
    all_codes = b"ACTUGNRYSWKMBDHVXACTUGNRYSWKMBDHVX"
    for c in all_codes:
        assert p.valid_seq(bytes([c]))
        assert p.valid_seq(bytes([c]).lower())
    assert p.valid_seq(all_codes)
    assert p.valid_seq(all_codes.lower())
    assert p.valid_seq(all_codes + all_codes.lower())
    assert p.valid_seq(b"AaCcTtUuGgNnRrYySsWwKkMmBbDdHhVvXx")
    assert not p.valid_seq(b"_aCcTtUuGgNnRrYySsWwKkMmBbDdHhVvXx")
    assert not p.valid_seq(b"AaCcTtUuGgNnRrYySsWwKkMmBbDdH_VvXx")
    assert not p.valid_seq(b"AaCcTtUuGgN@RrYySsWwKkMmBbDdHhVvXx")
    assert not p.valid_seq(b"AaEcTtUuGgNnRrYySsWwKkMmBbDdHhVvXx")
    assert not p.valid_seq(b"AaCeTtUuGgNnRrYySsWwKkMmBbDdHhVvXx")


def test_invalid_iupac_codes():
    # iupac.rs test_invalid_iupac_codes
    p = Iupac()
    for case in (
        b"@CGT", b"?CGT", b"1CGT", b" CGT",
        b"ACGZ", b"ACG[", b"ACG{", b"ACG~",
        b"ACG\n", b"ACG\t", b"ACG\r", b"\0CGT",
    ):
        assert not p.valid_seq(case), case


def test_iupac_boundary_chars():
    # iupac.rs test_iupac_boundary_chars: the valid block is exactly
    # ['A', 'Y'] (with U for T, X as never-match)
    p = Iupac()
    assert not p.valid_seq(b"@")  # 64
    assert p.valid_seq(b"A")  # 65
    assert p.valid_seq(b"X")  # 88
    assert p.valid_seq(b"Y")  # 89
    assert not p.valid_seq(b"Z")  # 90
    seq = bytearray(b"ACGT" * 8)
    seq[31] = ord("Y")
    assert p.valid_seq(bytes(seq))
    seq[31] = ord("Z")
    assert not p.valid_seq(bytes(seq))


def test_iupac_valid_seq_empty():
    # iupac.rs test_iupac_valid_seq_empty
    assert Iupac().valid_seq(b"")


def test_dna_is_match():
    # dna.rs test_dna_is_match — the Dna profile matches ACGT case-
    # insensitively and nothing else (N is NOT a wildcard here)
    p = Dna()
    assert p.is_match(ord("A"), ord("A"))
    assert p.is_match(ord("c"), ord("c"))
    assert p.is_match(ord("C"), ord("c"))
    assert p.is_match(ord("c"), ord("C"))
    assert not p.is_match(ord("X"), ord("A"))
    assert not p.is_match(ord("X"), ord("T"))
    assert not p.is_match(ord("X"), ord("G"))
    assert not p.is_match(ord("X"), ord("C"))
    assert not p.is_match(ord("A"), ord("N"))
    assert not p.is_match(ord("C"), ord("t"))


def test_dna_valid_seq():
    # dna.rs test_dna_valid_seq / test_dna_valid_seq_empty
    p = Dna()
    assert p.valid_seq(b"ACGTactg")
    assert p.valid_seq(b"ACTGactg" * 32)
    non = bytes(c for c in range(256) if chr(c) not in "ACGTacgt")
    assert not p.valid_seq(non)
    assert p.valid_seq(b"")


def test_ascii_is_match():
    # ascii.rs test_ascii_is_match
    cs = Ascii(case_sensitive=True)
    ci = Ascii(case_sensitive=False)
    assert cs.is_match(ord("H"), ord("H"))
    assert not cs.is_match(ord("l"), ord("L"))
    assert ci.is_match(ord("H"), ord("H"))
    assert ci.is_match(ord("l"), ord("L"))
