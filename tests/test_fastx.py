"""FASTX reading: python parser and native (C++) parser agree."""

import gzip
import shutil
import subprocess
from pathlib import Path

import pytest

import sassy_tpu.io.fastx as fx

ROOT = Path(__file__).resolve().parent.parent

FA = b">r1 desc here\nACGT\nACGT\n>r2\nTTTT\n>empty\n>r3\nA\n"
FQ = b"@q1\nACGTA\n+\nIIIII\n@q2 x\nGG\n+\n##\n"


def _py_parse(data: bytes):
    import io

    return list(fx.parse_fastx(io.BufferedReader(io.BytesIO(data))))


def test_python_parser(tmp_path):
    fa = tmp_path / "t.fa"
    fa.write_bytes(FA)
    recs = list(fx.read_fastx(str(fa)))
    assert [(r.rid, r.seq) for r in recs] == [
        ("r1", b"ACGTACGT"), ("r2", b"TTTT"), ("empty", b""), ("r3", b"A"),
    ]
    fq = tmp_path / "t.fq.gz"
    with gzip.open(fq, "wb") as fh:
        fh.write(FQ)
    recs = list(fx.read_fastx(str(fq)))
    assert [(r.rid, r.seq, r.qual) for r in recs] == [
        ("q1", b"ACGTA", b"IIIII"), ("q2", b"GG", b"##"),
    ]


@pytest.mark.skipif(shutil.which("g++") is None, reason="no C++ toolchain")
def test_native_parser_agrees(tmp_path, monkeypatch):
    r = subprocess.run(["make", "-C", str(ROOT / "native")],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    monkeypatch.setenv("SASSY_NATIVE_FASTX", "1")
    monkeypatch.setattr(fx, "_NATIVE", None)

    for name, data in [("t.fa", FA), ("t.fq", FQ)]:
        p = tmp_path / name
        p.write_bytes(data)
        native = list(fx.read_fastx(str(p)))
        py = _py_parse(data)
        assert [(r.rid, r.seq, r.qual) for r in native] == [
            (r.rid, r.seq, r.qual) for r in py
        ]
    gz = tmp_path / "t.fa.gz"
    with gzip.open(gz, "wb") as fh:
        fh.write(FA)
    native = list(fx.read_fastx(str(gz)))
    assert [(r.rid, r.seq) for r in native] == [
        (r.rid, r.seq) for r in _py_parse(FA)
    ]
    monkeypatch.setattr(fx, "_NATIVE", None)