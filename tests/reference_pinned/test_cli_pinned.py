"""Reference-authored pinned expectations: CLI crispr end-to-end.

Transcription of /root/reference/bin/crispr.rs:271-362 (test_crispr): a
guide with an N in its PAM against three crafted records, run through the
real CLI with output-count assertions at four parameter settings.
"""

from sassy_tpu.cli import main


def _run_crispr(tmp_path, k, max_n_frac, allow_pam_edits):
    guide_file = tmp_path / "guides.txt"
    guide_file.write_text("TAGCATCAGCTACGNGG\n")
    fasta = tmp_path / "targets.fa"
    fasta.write_text(
        ">exact\nTAGCATCAGCTACGAGG\n"
        ">pam_mutated\nTAGCATCAGCTACGACG\n"  # C instead of G in PAM
        ">n_frac\nTNNNATCAGCTACGAGG\n"  # 3 N's out of 17 bases
    )
    out = tmp_path / "out.tsv"
    argv = [
        "crispr",
        "--guide", str(guide_file),
        "-k", str(k),
        "--pam-length", "3",
        "--max-n-frac", str(max_n_frac),
        "--engine", "xla",
        "-o", str(out),
        str(fasta),
    ]
    if allow_pam_edits:
        argv.insert(1, "--allow-pam-edits")
    rc = main(argv)
    assert rc == 0
    counts = {"exact": 0, "pam_mutated": 0, "n_frac": 0}
    for line in out.read_text().splitlines()[1:]:
        counts[line.split("\t")[1]] += 1
    return counts


def test_crispr_allow_pam_edits(tmp_path, capsys):
    # crispr.rs:319-337: with PAM edits allowed
    counts = _run_crispr(tmp_path, k=1, max_n_frac=1.0, allow_pam_edits=True)
    assert counts["exact"] == 2
    assert counts["pam_mutated"] == 1
    assert counts["n_frac"] == 2


def test_crispr_pam_filter(tmp_path, capsys):
    # crispr.rs:339-345: PAM mutations disallowed
    counts = _run_crispr(tmp_path, k=1, max_n_frac=1.0, allow_pam_edits=False)
    assert counts["exact"] == 1
    assert counts["pam_mutated"] == 0
    assert counts["n_frac"] == 1


def test_crispr_n_frac_threshold(tmp_path, capsys):
    # crispr.rs:347-360: 3/17 N threshold straddled from both sides
    thr = 3.0 / 17.0
    counts = _run_crispr(
        tmp_path, k=1, max_n_frac=thr + 0.01, allow_pam_edits=False
    )
    assert counts["n_frac"] == 1
    counts = _run_crispr(
        tmp_path, k=1, max_n_frac=thr - 0.01, allow_pam_edits=False
    )
    assert counts["n_frac"] == 0
