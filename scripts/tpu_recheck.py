"""Hardware gate: one JSON artifact proving HEAD was measured on TPU.

Runs, in order:
  1. the tpu-marked pytest lane (hardware conformance),
  2. the headline bench (bench.py, with its own retry machinery),
  3. both flagship evals (off_targets, nanopore) — refreshing the
     committed CSVs under evals/output-v5e/,
and writes RECHECK.json at the repo root:

  {git_hash, dirty, ts_utc, tests: {passed, failed, rc}, bench: {...},
   off_targets: {tiling_median_ms, matches}, nanopore: {...}, ok}

Policy (round-3 verdict #3): run this before every end-of-round snapshot
commit and commit RECHECK.json, so no hot-path change ships without a
hardware measurement — the committed artifact's git_hash must equal the
snapshot's parent.

Usage: python scripts/tpu_recheck.py [--skip-tests] [--skip-evals] [--full]

``--full`` additionally runs the reference-scale flagship rows
(off_targets_full: 312 x 3.12 Gbp, nanopore_full: 96 x 334 Mbp;
~30-40 min) so end-of-round gates capture the headline eval medians in
the same artifact as the committed CSVs.
"""

from __future__ import annotations

import csv
import json
import re
import subprocess
import sys
import time
from datetime import datetime, timezone
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def sh(cmd, timeout, env=None):
    t0 = time.perf_counter()
    try:
        r = subprocess.run(
            cmd, cwd=ROOT, capture_output=True, text=True, timeout=timeout,
            env=env,
        )
        return r.returncode, r.stdout, r.stderr, time.perf_counter() - t0
    except subprocess.TimeoutExpired as e:
        out = e.stdout.decode() if isinstance(e.stdout, bytes) else (e.stdout or "")
        err = e.stderr.decode() if isinstance(e.stderr, bytes) else (e.stderr or "")
        return -9, out, err, time.perf_counter() - t0


def run_tpu_tests() -> dict:
    import os

    env = dict(os.environ, SASSY_TESTS_TPU="1")
    rc, out, err, dt = sh(
        [sys.executable, "-m", "pytest", "tests/", "-m", "tpu", "-q",
         "--no-header"],
        timeout=3600, env=env,
    )
    tail = (out.strip().splitlines() or [""])[-1]
    m_pass = re.search(r"(\d+) passed", out)
    m_fail = re.search(r"(\d+) failed", out)
    return {
        "rc": rc,
        "passed": int(m_pass.group(1)) if m_pass else 0,
        "failed": int(m_fail.group(1)) if m_fail else 0,
        "summary": tail[-160:],
        "wall_s": round(dt, 1),
    }


def run_bench() -> dict:
    rc, out, err, dt = sh([sys.executable, "bench.py"], timeout=4 * 3600)
    line = None
    for ln in reversed(out.strip().splitlines()):
        ln = ln.strip()
        if ln.startswith("{"):
            try:
                d = json.loads(ln)
                if "metric" in d:
                    line = d
                    break
            except json.JSONDecodeError:
                continue
    if line is None:
        line = {"error": f"no json line (rc={rc})"}
    line["wall_s"] = round(dt, 1)
    return line


def run_eval(name: str) -> dict:
    rc, out, err, dt = sh(
        [sys.executable, "evals/bench_suite.py", name], timeout=3600
    )
    res = {"rc": rc, "wall_s": round(dt, 1)}
    path = ROOT / "evals" / "output-v5e" / f"{name}_results.csv"
    if rc == 0 and path.exists():
        with open(path) as fh:
            rows = list(csv.DictReader(fh))
        if rows:
            r0 = rows[0]
            res.update(
                tiling_median_ms=float(r0["tiling_median_ms"]),
                tiling_std_ms=float(r0["tiling_std_ms"]),
                matches=int(r0["tiling_n_matches"]),
                tiling_gbps=float(r0["tiling_throughput_gbps"]),
            )
    else:
        res["error"] = (err or out)[-300:]
    return res


def main() -> int:
    skip_tests = "--skip-tests" in sys.argv
    skip_evals = "--skip-evals" in sys.argv
    full = "--full" in sys.argv
    rc, head, _, _ = sh(["git", "rev-parse", "HEAD"], timeout=10)
    rc2, stat, _, _ = sh(["git", "status", "--porcelain"], timeout=10)
    art: dict = {
        "git_hash": head.strip(),
        "dirty": bool(stat.strip()),
        "ts_utc": datetime.now(timezone.utc).isoformat(timespec="seconds"),
    }
    out = ROOT / "RECHECK.json"

    def flush(stage):
        # crash-safe artifact: a gate interrupted mid-run (round budget,
        # tunnel loss) still leaves every completed stage's measurement
        # on disk, marked partial until the final ok computation
        art["partial"] = stage
        out.write_text(json.dumps(art, indent=2) + "\n")

    if not skip_tests:
        print("[recheck] 1/4 tpu-marked pytest lane", file=sys.stderr)
        art["tests"] = run_tpu_tests()
        flush("tests")
    print("[recheck] 2/4 headline bench", file=sys.stderr)
    art["bench"] = run_bench()
    flush("bench")
    if not skip_evals:
        print("[recheck] 3/4 off_targets eval", file=sys.stderr)
        art["off_targets"] = run_eval("off_targets")
        flush("off_targets")
        print("[recheck] 4/4 nanopore eval", file=sys.stderr)
        art["nanopore"] = run_eval("nanopore")
        flush("nanopore")
    if full:
        print("[recheck] --full: off_targets_full eval", file=sys.stderr)
        art["off_targets_full"] = run_eval("off_targets_full")
        flush("off_targets_full")
        print("[recheck] --full: nanopore_full eval", file=sys.stderr)
        art["nanopore_full"] = run_eval("nanopore_full")
        flush("nanopore_full")
    art.pop("partial", None)

    ok = (
        art.get("tests", {}).get("failed", 0) == 0
        and art.get("tests", {}).get("rc", 0) in (0, 5)  # 5 = none collected
        and art["bench"].get("backend") == "tpu"
        # floor at ~2/3 of the round-4 capture (33.2 pipelined): a 3x
        # regression must fail the gate, not pass under a 10 GB/s floor
        and art["bench"].get("value", 0) >= 22.0
        and art.get("off_targets", {}).get("rc", 0) == 0
        and art.get("nanopore", {}).get("rc", 0) == 0
        and art.get("off_targets_full", {}).get("rc", 0) == 0
        and art.get("nanopore_full", {}).get("rc", 0) == 0
    )
    art["ok"] = ok
    out = ROOT / "RECHECK.json"
    out.write_text(json.dumps(art, indent=2) + "\n")
    print(json.dumps(art, indent=2))
    print(f"[recheck] ok={ok} -> {out}", file=sys.stderr)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
