"""Headline benchmark: single-chip text-scan throughput.

Config mirrors the reference's flagship eval row (23bp pattern, k=3 text
scaling; /root/reference/evals/src/sassy2/output-xeon-512/
text_scaling_results.csv:2 -> 2.105 GB/s on one AVX-512 thread). We scan a
large random DNA text with one 23bp IUPAC pattern at k=3 through the full
search path (device scan + device candidate selection + host matches).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

BASELINE_GBPS = 2.105  # reference sassy1, 23bp/k=3, 1 thread AVX-512


def main() -> None:
    import jax

    from sassy_tpu import Searcher, profiles

    backend = jax.default_backend()
    engine = "pallas" if backend == "tpu" else "xla"
    text_bytes = 1 << 25 if backend == "tpu" else 1 << 21

    rng = np.random.default_rng(42)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    text = rng.choice(bases, size=text_bytes)
    pattern = rng.choice(bases, size=23)

    s = Searcher(profiles.Iupac(), rc=False, engine=engine)
    # warmup: compile + prepare text planes (cached across runs)
    t0 = time.perf_counter()
    s.search(pattern, text, k=3)
    warm = time.perf_counter() - t0
    print(f"[bench] backend={backend} engine={engine} warmup={warm:.2f}s",
          file=sys.stderr)

    reps = 5
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        s.search(pattern, text, k=3)
        best = min(best, time.perf_counter() - t0)

    gbps = text_bytes / best / 1e9
    print(json.dumps({
        "metric": "text_scan_23bp_k3",
        "value": round(gbps, 4),
        "unit": "GB/s",
        "vs_baseline": round(gbps / BASELINE_GBPS, 4),
    }))


if __name__ == "__main__":
    main()
