"""Generate the expanded pinned-conformance corpus (tests/golden/).

The reference's conformance contract is a 1M-case differential fuzz against
its own v1 engine (/root/reference/src/pattern_tiling/search.rs:690-848).
Running the reference binary here is impossible (no Rust toolchain, no
prebuilt binary, zero egress — documented in BASELINE.md), so per the
round-3 fallback the pinned corpus is doubled instead, with shapes drawn
from the reference fuzz's distribution (k in 0..4, m in 5..60, n in
10..60, plus longer records) and the full CLI flag matrix
(±rc, ±overhang-alpha, ±n-frac, v1+v2, ±sam).

Expected TSVs are produced by the NumPy oracle engine (the slow, direct
transcription of the reference semantics in sassy_tpu/semantics.py +
oracle.py); every device engine must then reproduce them byte-for-byte
(tests/test_golden_corpus.py).

Run: python scripts/gen_golden_corpus.py   (regenerates tests/golden/*2*)
"""

import io
import sys
from contextlib import redirect_stderr, redirect_stdout
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

GOLD = Path(__file__).resolve().parent.parent / "tests" / "golden"

BASES = np.frombuffer(b"ACGT", dtype=np.uint8)
IUPAC_EXTRA = np.frombuffer(b"RYSWKMN", dtype=np.uint8)


def make_patterns(rng) -> list[bytes]:
    """12 patterns with the reference fuzz's m in 5..60, a couple with
    IUPAC ambiguity codes, one homopolymer-ish."""
    pats = []
    for m in (5, 8, 12, 17, 23, 31, 40, 52, 60):
        pats.append(bytes(rng.choice(BASES, size=m)))
    # IUPAC ambiguity in the pattern (N matches everything)
    p = rng.choice(BASES, size=24)
    p[5] = ord("N")
    p[11] = ord("R")
    p[17] = ord("Y")
    pats.append(bytes(p))
    # homopolymer run (minima tie rules)
    pats.append(b"AAAAAAAATTTTTTTT")
    # short with W/S codes
    p = rng.choice(BASES, size=9)
    p[2] = ord("W")
    p[6] = ord("S")
    pats.append(bytes(p))
    return pats


def rc(seq: bytes) -> bytes:
    comp = bytes.maketrans(b"ACGTRYSWKMN", b"TGCAYRSWMKN")
    return seq.translate(comp)[::-1]


def make_corpus(rng, pats: list[bytes]) -> list[bytes]:
    """~48 records: fuzz-range shorties (n in 10..60), mid-size, and a few
    2kb records; planted fwd and RC pattern copies with up to 3 edits;
    N-runs for the n-frac filter; records shorter than the pattern for the
    overhang paths."""
    recs: list[bytes] = []
    # fuzz-range records
    for i in range(24):
        n = int(rng.integers(10, 61))
        recs.append(bytes(rng.choice(BASES, size=n)))
    # mid/long records with planted (mutated) copies
    for i in range(16):
        n = int(rng.integers(200, 2001))
        t = rng.choice(BASES, size=n)
        for _ in range(int(rng.integers(1, 4))):
            p = np.frombuffer(pats[int(rng.integers(0, len(pats)))], np.uint8)
            p = p.copy()
            for _ in range(int(rng.integers(0, 4))):  # up to 3 edits
                p[rng.integers(0, len(p))] = rng.choice(BASES)
            if rng.random() < 0.4:
                p = np.frombuffer(rc(p.tobytes()), np.uint8).copy()
            off = int(rng.integers(0, n - len(p)))
            t[off : off + len(p)] = p
        recs.append(bytes(t))
    # N-heavy records (n-frac filter)
    for i in range(4):
        n = int(rng.integers(80, 200))
        t = rng.choice(BASES, size=n)
        p = np.frombuffer(pats[4], np.uint8).copy()
        off = int(rng.integers(0, n - len(p) - 10))
        t[off : off + len(p)] = p
        nrun = int(rng.integers(3, 12))
        t[off + 3 : off + 3 + nrun] = ord("N")
        recs.append(bytes(t))
    # shorter than most patterns (overhang / whole-record matches)
    for n in (10, 15, 22, 35):
        recs.append(bytes(rng.choice(BASES, size=n)))
    return recs


# flag matrix: name -> extra CLI args (reference flag semantics:
# /root/reference/bin/grep.rs:29-112; overhang README.md:127-151)
MATRIX = {
    "k1": ["-k", "1"],
    "k3_norc": ["-k", "3", "--no-rc"],
    "k2_alpha05": ["-k", "2", "--overhang", "0.5"],
    "k3_nfrac01": ["-k", "3", "--max-n-frac", "0.1"],
    "k3_v2": ["-k", "3", "--v2"],
    "k3_sam": ["-k", "3", "--sam"],
    "k0": ["-k", "0"],
    "k4_alpha03_norc": ["-k", "4", "--overhang", "0.3", "--no-rc"],
}


def run_cli(argv) -> str:
    from sassy_tpu.cli import main

    out, err = io.StringIO(), io.StringIO()
    with redirect_stdout(out), redirect_stderr(err):
        code = main(argv)
    assert code == 0, err.getvalue()
    return out.getvalue()


def main():
    rng = np.random.default_rng(20260819)
    pats = make_patterns(rng)
    recs = make_corpus(rng, pats)

    (GOLD / "patterns2.txt").write_bytes(b"\n".join(pats) + b"\n")
    with open(GOLD / "corpus2.fa", "wb") as fh:
        for i, r in enumerate(recs):
            fh.write(b">rec%d\n" % i)
            fh.write(r + b"\n")
    print(f"corpus2: {len(pats)} patterns, {len(recs)} records, "
          f"{sum(len(r) for r in recs)} bp")

    for name, extra in MATRIX.items():
        argv = [
            "search", "-l", str(GOLD / "patterns2.txt"), "--engine", "numpy",
            *extra, str(GOLD / "corpus2.fa"),
        ]
        tsv = run_cli(argv)
        path = GOLD / f"expected2_{name}.tsv"
        path.write_text(tsv)
        print(f"  {name}: {len(tsv.splitlines())} rows -> {path.name}")


if __name__ == "__main__":
    main()
