"""Measure the sharded path's overhang (alpha) fallback penalty.

The sharded engine's documented limit (parallel/sharded.py docstring):
with ``alpha`` set, the scan inside shard_map runs as the XLA lax.scan
instead of the Pallas kernel (the overhang tail-tile fast path is
single-chip only). This script quantifies that penalty on the real chip:
a 1-device ('pat','text') mesh, same patterns/text/k, alpha=None (Pallas)
vs alpha=0.5 (XLA scan), steady-state best-of-reps.

Usage: python scripts/bench_sharded_alpha.py [mb] [reps]
Writes the measured ratio to stdout; record it in docs/ROOFLINE.md.
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    mb = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    n = mb * 1_000_000
    k = 2

    import jax

    from sassy_tpu.parallel import ShardedSearch, ShardedText, make_mesh
    from sassy_tpu.profiles import Iupac

    rng = np.random.default_rng(5)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    text = rng.choice(bases, size=n)
    pats = [rng.choice(bases, size=20) for _ in range(4)]
    for i, p in enumerate(pats):
        text[1000 + 100 * i : 1020 + 100 * i] = p
    prof = Iupac()
    mesh = make_mesh(n_text=1, n_pat=1, devices=jax.devices()[:1])
    st = ShardedText(prof, text)

    results = {}
    for label, alpha in (("pallas (alpha=None)", None), ("xla (alpha=0.5)", 0.5)):
        ss = ShardedSearch(mesh=mesh, cap=1 << 12, bcap=1 << 10)
        t0 = time.perf_counter()
        got = ss.candidates_batch(prof, pats, st, k, alpha=alpha)
        warm = time.perf_counter() - t0
        nm = sum(len(c) for c in got)
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            ss.candidates_batch(prof, pats, st, k, alpha=alpha)
            best = min(best, time.perf_counter() - t0)
        gbps = 4 * n / best / 1e9
        results[label] = best
        print(f"{label:22s}: first={warm:6.1f}s steady={best*1e3:8.1f} ms "
              f"= {gbps:6.2f} GB/s agg ({nm} candidates)")

    ratio = results["xla (alpha=0.5)"] / results["pallas (alpha=None)"]
    print(f"sharded overhang penalty: {ratio:.2f}x "
          f"(XLA-scan fallback vs Pallas fast path, {mb} MB, Q=4, k={k})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
