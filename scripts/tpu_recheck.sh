#!/bin/bash
# DEEP post-change TPU measurement pass (run when the tunnel is up).
# For the pre-snapshot hardware GATE (one JSON artifact: tpu test lane +
# headline bench + both flagship evals) use: python scripts/tpu_recheck.py
# Usage: bash scripts/tpu_recheck.sh [outdir]
set -u
OUT=${1:-/tmp/tpu_recheck}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

echo "== 1. hardware conformance (incl. new kernel screen + window cache)"
SASSY_TESTS_TPU=1 timeout 3600 python -m pytest tests/ -m tpu -q \
    2>&1 | tail -5 | tee "$OUT/tpu_tests.log"

echo "== 2. headline bench"
timeout 1800 python bench.py 2>&1 | tee "$OUT/bench.log"

echo "== 3. device trace of the headline call"
timeout 1800 python scripts/trace_headline.py /tmp/trace_recheck \
    2>&1 | tail -30 | tee "$OUT/trace.log"

echo "== 4. flagship evals"
timeout 3600 python evals/bench_suite.py off_targets \
    2>&1 | tail -5 | tee "$OUT/off_targets.log"
timeout 3600 python evals/bench_suite.py nanopore \
    2>&1 | tail -5 | tee "$OUT/nanopore.log"

echo "== 4b. REFERENCE-scale evals (312x3.12Gbp, 334Mbp) + long patterns"
timeout 7200 python evals/bench_suite.py off_targets_full \
    2>&1 | tail -5 | tee "$OUT/off_targets_full.log"
timeout 5400 python evals/bench_suite.py nanopore_full \
    2>&1 | tail -5 | tee "$OUT/nanopore_full.log"
timeout 7200 python evals/bench_suite.py throughput_m \
    2>&1 | tail -5 | tee "$OUT/throughput_m.log"

echo "== 5. crispr end-to-end (device RC path) on a fresh 128 Mbp genome"
timeout 2400 python - <<'EOF' 2>&1 | tee "$OUT/crispr.log"
import subprocess, sys, time
import numpy as np
rng = np.random.default_rng(0)
bases = np.frombuffer(b"ACGT", dtype=np.uint8)
g = rng.choice(bases, size=128_000_000)
with open("/tmp/recheck_genome.fa", "wb") as f:
    f.write(b">chr1\n")
    f.write(g.tobytes())
    f.write(b"\n")
guides = [bytes(rng.choice(bases, size=23)) for _ in range(32)]
with open("/tmp/recheck_guides.txt", "wb") as f:
    f.write(b"\n".join(guides) + b"\n")
t0 = time.time()
r = subprocess.run(
    [sys.executable, "-m", "sassy_tpu.cli", "crispr",
     "-g", "/tmp/recheck_guides.txt", "-k", "3", "--max-n-frac", "0.2",
     "-o", "/tmp/recheck_crispr.tsv", "/tmp/recheck_genome.fa"],
    capture_output=True, text=True)
print(r.stdout[-500:], r.stderr[-300:])
print(f"crispr wall: {time.time()-t0:.1f}s")
EOF

echo "== results in $OUT; update docs/ROOFLINE.md, README.md, eval CSVs"
