"""Where does the batched engine spend time on a READ SET (many small
texts) vs one flat text of the same total size?

The nanopore_full eval (96 x 24bp over 33,400 x 10kb reads, planted
matches) measures ~2x the time of the same bytes as one text. This
script times, steady-state: dispatch-only (device work + fetch), full
candidates_many (adds host decode + planning), and the same for a flat
text, at the same planted-match density.

python scripts/profile_readset.py [Q] [total_MB] [read_len] [plant_every]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def best_of(fn, reps=3):
    fn()
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    from sassy_tpu.ops import batch as B
    from sassy_tpu.profiles import Iupac

    Q = int(sys.argv[1]) if len(sys.argv) > 1 else 96
    MB = int(sys.argv[2]) if len(sys.argv) > 2 else 334
    read_len = int(sys.argv[3]) if len(sys.argv) > 3 else 10000
    plant_every = int(sys.argv[4]) if len(sys.argv) > 4 else 5000
    k = 3
    total = MB * 1_000_000
    rng = np.random.default_rng(0)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    pats = [rng.choice(bases, size=24) for _ in range(Q)]
    prof = Iupac()
    codes = [prof.encode(p) for p in pats]

    flat = rng.choice(bases, size=total)
    pos = plant_every
    qi = 0
    while pos + 24 < total:
        q = pats[qi % Q].copy()
        for _ in range(rng.integers(0, k + 1)):
            q[rng.integers(0, 24)] = rng.choice(bases)
        flat[pos : pos + 24] = q
        pos += plant_every
        qi += 1
    n_reads = total // read_len
    reads = [flat[i * read_len : (i + 1) * read_len] for i in range(n_reads)]

    eng = B.BatchEngine()

    for label, texts in (("reads", reads), ("flat", [flat])):
        ts = B.TextSet(texts)
        t_full = best_of(lambda: eng.candidates_many(prof, codes, ts, k))
        out = eng.candidates_many(prof, codes, ts, k)
        nm = sum(len(c) for row in out for c in row)

        # dispatch + fetch only: call the async path but skip the decode
        # by timing finish() separately
        def t_split():
            t0 = time.perf_counter()
            fin = eng.candidates_many_async(prof, codes, ts, k)
            # np.asarray fetch happens inside finish; to split, time the
            # whole and subtract the full-call decode estimate
            fin()
            return time.perf_counter() - t0

        t0 = time.perf_counter()
        fin = eng.candidates_many_async(prof, codes, ts, k)
        t_dispatch = time.perf_counter() - t0
        fin()
        agg = Q * total / 1e9
        print(f"{label:5s}: end-to-end {t_full*1e3:7.1f} ms "
              f"({agg/t_full:5.1f} GB/s agg, {nm} matches); "
              f"dispatch-issue {t_dispatch*1e3:6.1f} ms")


if __name__ == "__main__":
    main()
