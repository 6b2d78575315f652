"""CLI --resume checkpointing and prefetch IO overlap.

Contract (beyond the reference, SURVEY §5 checkpoint/resume): a run killed
mid-scan and rerun with ``--resume <progress.json>`` produces output
byte-identical to an uninterrupted run — including when the kill lands
after a unit's rows hit the output but before its checkpoint was saved
(the resume truncates the output back to the last checkpointed offset).
The kill is injected via SASSY_CRASH_AFTER_UNIT, which dies after unit N's
output is flushed and *before* its checkpoint write — the worst case.
"""

import json

import numpy as np
import pytest

from sassy_tpu.cli import main
from sassy_tpu.io import fastx
from sassy_tpu.profiles import Iupac

BASES = np.frombuffer(b"ACGT", dtype=np.uint8)
RNG = np.random.default_rng(123)


def _dna(n):
    return bytes(RNG.choice(BASES, size=n))


def _write_fasta(path, recs):
    with open(path, "w") as f:
        for rid, seq in recs:
            f.write(f">{rid}\n{seq.decode()}\n")


@pytest.fixture()
def genome(tmp_path):
    pat = _dna(12)
    comp = bytes(Iupac().reverse_complement(pat))
    recs = []
    for i in range(8):
        body = _dna(300)
        if i % 2 == 0:
            body = body[:40] + pat + body[52:]
        if i % 3 == 0:
            body = body[:200] + comp + body[212:]
        recs.append((f"r{i}", body))
    fa = tmp_path / "g.fa"
    _write_fasta(fa, recs)
    return str(fa), pat


def test_search_resume_byte_identical(genome, tmp_path, monkeypatch, capsys):
    fa, pat = genome
    base = [
        "--platform", "cpu", "search", "-p", pat.decode(), "-k", "2",
        "--engine", "numpy", "--batch-bytes", "400",
    ]
    golden = tmp_path / "golden.tsv"
    assert main(base + ["-o", str(golden), fa]) == 0
    capsys.readouterr()

    out = tmp_path / "out.tsv"
    ck = tmp_path / "ck.json"
    # crash after unit 1's rows are flushed but before its checkpoint
    monkeypatch.setenv("SASSY_CRASH_AFTER_UNIT", "1")
    with pytest.raises(SystemExit) as e:
        main(base + ["-o", str(out), "--resume", str(ck), fa])
    assert e.value.code == 130
    capsys.readouterr()
    d = json.loads(ck.read_text())
    assert d["unit"] == 1  # unit 1 wrote rows but never checkpointed
    partial = out.read_bytes()
    assert partial != golden.read_bytes()

    monkeypatch.delenv("SASSY_CRASH_AFTER_UNIT")
    assert main(base + ["-o", str(out), "--resume", str(ck), fa]) == 0
    capsys.readouterr()
    assert out.read_bytes() == golden.read_bytes()
    assert json.loads(ck.read_text())["unit"] >= 2


def test_search_resume_histogram_restored(genome, tmp_path, monkeypatch,
                                          capsys):
    fa, pat = genome
    base = [
        "--platform", "cpu", "search", "-p", pat.decode(), "-k", "2",
        "--engine", "numpy", "--batch-bytes", "400",
    ]
    golden = tmp_path / "golden.tsv"
    main(base + ["-o", str(golden), fa])
    golden_stats = capsys.readouterr().err

    out, ck = tmp_path / "o.tsv", tmp_path / "ck.json"
    monkeypatch.setenv("SASSY_CRASH_AFTER_UNIT", "2")
    with pytest.raises(SystemExit):
        main(base + ["-o", str(out), "--resume", str(ck), fa])
    capsys.readouterr()
    monkeypatch.delenv("SASSY_CRASH_AFTER_UNIT")
    main(base + ["-o", str(out), "--resume", str(ck), fa])
    resumed_stats = capsys.readouterr().err
    # the per-distance histogram must cover the WHOLE file, not just the
    # resumed tail (it is checkpointed alongside the output offset)
    assert golden_stats.splitlines()[-2:] == resumed_stats.splitlines()[-2:]


def test_resume_rejects_changed_parameters(genome, tmp_path, monkeypatch,
                                           capsys):
    """Resuming under different parameters (k here) must refuse loudly
    instead of silently merging incompatible outputs."""
    fa, pat = genome
    base = ["--platform", "cpu", "search", "-p", pat.decode(),
            "--engine", "numpy", "--batch-bytes", "400"]
    out, ck = tmp_path / "o.tsv", tmp_path / "ck.json"
    monkeypatch.setenv("SASSY_CRASH_AFTER_UNIT", "1")
    with pytest.raises(SystemExit):
        main(base + ["-k", "2", "-o", str(out), "--resume", str(ck), fa])
    capsys.readouterr()
    monkeypatch.delenv("SASSY_CRASH_AFTER_UNIT")
    with pytest.raises(SystemExit) as e:
        main(base + ["-k", "1", "-o", str(out), "--resume", str(ck), fa])
    assert "different parameters" in str(e.value.code)
    capsys.readouterr()


def test_resume_requires_file_sink(genome, capsys):
    fa, pat = genome
    with pytest.raises(SystemExit):
        main(["--platform", "cpu", "search", "-p", pat.decode(), "-k", "1",
              "--engine", "numpy", "--resume", "/tmp/nope.json", fa])
    capsys.readouterr()


def test_crispr_resume_byte_identical(tmp_path, monkeypatch, capsys):
    guide = _dna(20) + b"AGG"  # NGG-style PAM tail kept constant
    recs = []
    for i in range(6):
        body = _dna(500)
        if i % 2 == 0:
            body = body[:100] + guide + body[123:]
        recs.append((f"c{i}", body))
    fa = tmp_path / "g.fa"
    _write_fasta(fa, recs)
    gf = tmp_path / "guides.txt"
    gf.write_text(guide.decode() + "\n")

    base = [
        "--platform", "cpu", "crispr", "-g", str(gf), "-k", "2",
        "--max-n-frac", "0.2", "--engine", "numpy", "--batch-bytes", "600",
    ]
    golden = tmp_path / "golden.tsv"
    assert main(base + ["-o", str(golden), str(fa)]) == 0
    capsys.readouterr()

    out, ck = tmp_path / "out.tsv", tmp_path / "ck.json"
    monkeypatch.setenv("SASSY_CRASH_AFTER_UNIT", "1")
    with pytest.raises(SystemExit) as e:
        main(base + ["-o", str(out), "--resume", str(ck), str(fa)])
    assert e.value.code == 130
    capsys.readouterr()
    monkeypatch.delenv("SASSY_CRASH_AFTER_UNIT")
    assert main(base + ["-o", str(out), "--resume", str(ck), str(fa)]) == 0
    capsys.readouterr()
    assert out.read_bytes() == golden.read_bytes()


def test_prefetch_order_and_exhaustion():
    assert list(fastx.prefetch(iter(range(100)), depth=3)) == list(range(100))
    assert list(fastx.prefetch(iter(()))) == []


def test_prefetch_propagates_exception():
    def gen():
        yield 1
        raise ValueError("boom")

    it = fastx.prefetch(gen())
    assert next(it) == 1
    with pytest.raises(ValueError, match="boom"):
        list(it)


def test_prefetch_early_abandon():
    produced = []

    def gen():
        for i in range(10_000):
            produced.append(i)
            yield i

    for i, x in enumerate(fastx.prefetch(gen(), depth=2)):
        if i == 3:
            break
    # the producer thread stopped early instead of draining the source
    assert len(produced) < 10_000
