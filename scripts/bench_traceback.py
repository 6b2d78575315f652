"""Traceback-heavy workload benchmark (round-1 ask #4's done criterion).

Measures `search_all` (candidates + full CIGAR traceback for every match)
against the candidates-only scan on a match-dense text, to bound the
host-side traceback cost: the reference batches LANES candidate windows
per SIMD fill (search.rs:1372-1517) and its traceback never dominates; our
vectorized NumPy batch fill (traceback.py:37-120) must stay under 10x the
scan time even at ~10k matches.

Usage: python scripts/bench_traceback.py [n_matches] [text_mb]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from sassy_tpu import Searcher, profiles  # noqa: E402

BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


def main() -> int:
    n_matches = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    text_mb = float(sys.argv[2]) if len(sys.argv) > 2 else 64.0
    m, k = 24, 3
    n = int(text_mb * 1e6)

    rng = np.random.default_rng(7)
    pat = rng.choice(BASES, size=m)
    text = rng.choice(BASES, size=n)
    # plant n_matches mutated copies, evenly spaced
    step = n // (n_matches + 1)
    for i in range(n_matches):
        mut = pat.copy()
        for _ in range(int(rng.integers(0, k + 1))):
            mut[int(rng.integers(0, m))] = rng.choice(BASES)
        off = (i + 1) * step
        text[off : off + m] = mut
    pattern = bytes(pat)
    text_b = bytes(text)

    s = Searcher(profiles.Iupac(), rc=False)

    # warm both paths (compile)
    s.search_all(pattern, text_b[: 1 << 20], k)

    t0 = time.perf_counter()
    s.search_all(pattern, text_b, k)  # first full-size call: cap grow etc.
    t_first = time.perf_counter() - t0

    t0 = time.perf_counter()
    matches = s.search_all(pattern, text_b, k)
    t_all = time.perf_counter() - t0

    s2 = Searcher(profiles.Iupac(), rc=False).without_trace()
    s2.search_all(pattern, text_b[: 1 << 20], k)
    t0 = time.perf_counter()
    endpoints = s2.search_all(pattern, text_b, k)
    t_scan = time.perf_counter() - t0

    assert len(matches) == len(endpoints)
    ratio = t_all / t_scan if t_scan > 0 else float("inf")
    print(
        f"matches={len(matches)} text={text_mb:.0f} MB m={m} k={k}\n"
        f"scan-only (trace=False): {t_scan*1e3:8.1f} ms\n"
        f"search_all (with trace): {t_all*1e3:8.1f} ms  (first {t_first*1e3:.1f})\n"
        f"trace overhead ratio:    {ratio:8.2f}x  (criterion: < 10x)"
    )
    return 0 if ratio < 10 else 1


if __name__ == "__main__":
    sys.exit(main())
