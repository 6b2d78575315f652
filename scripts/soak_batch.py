"""Reference-scale differential soak: >=1M pattern x text cases on CPU.

The reference's load-bearing conformance contract is a 1,000,000-case
differential fuzz between its two engines
(/root/reference/src/pattern_tiling/search.rs:690-848). A Python loop of
one-shot searches cannot reach that scale (every distinct (m, n, k) is a
fresh XLA compile), so this soak batches: each *group* is one fixed shape
signature (Q patterns x T texts x n chars, fixed k/alpha/all_minima) run
through the batch engine in ONE dispatch and checked pair-by-pair against
the NumPy oracle. Shape signatures repeat round-robin, so compiles
amortize to zero and throughput is data-bound. One pattern x text pair ==
one case (the reference counts batch_size queries per fuzz iteration the
same way).

Adversarial generators (the classes that caught every conformance bug so
far — see tests/test_regressions.py provenance):
  - exact/mutated plants straddling 256/512/1024/2048-position boundaries
  - homopolymer plateau texts (flat cost runs longer than restart halos)
  - IUPAC patterns incl. N / mask degeneracies; N-runs in texts
  - alpha in {None, 0, 0.25, 0.5, 1} x k down to 0; all_minima both ways
  - reverse= (RC-strand scan) groups; xla single-pattern spot checks

Usage:
  python scripts/soak_batch.py [n_pairs] [seed] [--log FILE]
  python scripts/soak_batch.py --repro GROUP_IDX SEED   # regenerate group

Progress prints per group; exits nonzero on first mismatch with a
reproducer line. Writes a cumulative tally to --log (default
evals/soak_log.txt, appended, so nightly runs accumulate evidence).
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from sassy_tpu import profiles  # noqa: E402
from sassy_tpu.ops.batch import BatchEngine, TextSet  # noqa: E402
from sassy_tpu.ops.myers_xla import XlaEngine  # noqa: E402
from sassy_tpu.search import NumpyEngine  # noqa: E402

BASES = np.frombuffer(b"ACGT", dtype=np.uint8)
IUPAC = np.frombuffer(b"ACGTNRYSWKM", dtype=np.uint8)

# Shape signatures, reused round-robin so each compiles once per process.
# (Q, T, n, m, k, alpha, all_minima, reverse)
SIGNATURES = [
    (16, 48, 2048, 12, 2, None, False, False),
    (16, 48, 2048, 12, 2, None, True, False),
    (16, 48, 2048, 23, 3, None, False, True),
    (8, 64, 4096, 23, 3, None, False, False),
    (8, 64, 4096, 23, 3, 0.5, False, False),
    (16, 48, 2048, 7, 1, None, False, False),
    (16, 48, 2048, 7, 0, 0.0, True, False),
    (8, 48, 2048, 18, 4, 1.0, False, False),
    (8, 48, 2048, 18, 4, 0.25, True, True),
    (4, 64, 4096, 48, 5, None, False, False),
    (4, 48, 2048, 100, 6, None, True, False),
    (16, 48, 1024, 5, 2, None, False, True),
    (8, 48, 2048, 23, 0, None, False, False),
    (8, 48, 2048, 23, 3, 0.5, True, False),
]


def gen_text(rng, n, mode):
    if mode == 0:  # uniform
        return rng.choice(BASES, size=n)
    if mode == 1:  # homopolymer plateau segments
        segs, tot = [], 0
        while tot < n:
            r = int(rng.integers(10, 300))
            segs.append(np.full(r, rng.choice(BASES), np.uint8))
            tot += r
        return np.concatenate(segs)[:n]
    # uniform with N runs
    t = rng.choice(BASES, size=n)
    for _ in range(int(rng.integers(0, 4))):
        p = int(rng.integers(0, max(1, n - 10)))
        t[p : p + int(rng.integers(1, 10))] = ord("N")
    return t


def gen_group(rng, sig):
    """Generate one group's patterns and texts for a signature."""
    Q, T, n, m, k, alpha, allm, reverse = sig
    pats = [
        rng.choice(IUPAC if rng.random() < 0.2 else BASES, size=m)
        for _ in range(Q)
    ]
    texts = []
    for _ in range(T):
        tmode = int(rng.integers(0, 3))
        text = gen_text(rng, n, tmode)
        # plant mutated copies of random patterns, half targeted at
        # power-of-two boundaries (tile-edge multiples)
        for _ in range(int(rng.integers(0, 4))):
            pat = pats[int(rng.integers(0, Q))]
            mut = pat.copy()
            for _ in range(int(rng.integers(0, k + 1))):
                mut[int(rng.integers(0, m))] = rng.choice(BASES)
            if rng.random() < 0.5:
                p = int(rng.integers(0, n - m + 1))
            else:
                b = int(rng.choice([256, 512, 1024, 2048]))
                p = max(0, min(n - m, b - int(rng.integers(0, m + 2))))
            text[p : p + m] = mut
        texts.append(text)
    return pats, texts


def run_group(prof, oracle, be, xe, pats, texts, sig, spot_xla):
    Q, T, n, m, k, alpha, allm, reverse = sig
    pcodes = [prof.encode(p) for p in pats]
    if reverse:
        got = be.candidates_many(
            prof, pcodes, TextSet(texts), k, alpha, None, allm, reverse=True
        )
        otexts = [np.ascontiguousarray(t[::-1]) for t in texts]
    else:
        got = be.candidates_many(prof, pcodes, texts, k, alpha, None, allm)
        otexts = texts
    for qi in range(Q):
        for ti in range(T):
            want = oracle.candidates(
                prof, pcodes[qi], otexts[ti], k, alpha, None, allm
            )
            if sorted(map(tuple, got[qi][ti])) != sorted(map(tuple, want)):
                return qi, ti
    # spot-check the single-pattern xla engine on a few pairs
    for qi, ti in spot_xla:
        want = oracle.candidates(
            prof, pcodes[qi], texts[ti], k, alpha, None, allm
        )
        gx = xe.candidates(prof, pcodes[qi], texts[ti], k, alpha, None, allm)
        if sorted(map(tuple, gx)) != sorted(map(tuple, want)):
            return qi, ti
    return None


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--repro":
        gidx, seed = int(sys.argv[2]), int(sys.argv[3])
        sig = SIGNATURES[gidx % len(SIGNATURES)]
        rng = np.random.default_rng((seed, gidx))
        pats, texts = gen_group(rng, sig)
        np.savez("/tmp/soak_group.npz", *pats, *texts)
        print(f"group {gidx} sig={sig} -> /tmp/soak_group.npz")
        return

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_pairs = int(args[0]) if args else 1_000_000
    seed = int(args[1]) if len(args) > 1 else 0
    log_path = "evals/soak_log.txt"
    if "--log" in sys.argv:
        log_path = sys.argv[sys.argv.index("--log") + 1]

    prof = profiles.Iupac()
    oracle = NumpyEngine()
    be = BatchEngine()
    xe = XlaEngine()
    done = 0
    gidx = 0
    t0 = time.time()
    while done < n_pairs:
        sig = SIGNATURES[gidx % len(SIGNATURES)]
        Q, T = sig[0], sig[1]
        rng = np.random.default_rng((seed, gidx))
        pats, texts = gen_group(rng, sig)
        spot = [(int(rng.integers(0, Q)), int(rng.integers(0, T)))
                for _ in range(2)]
        bad = run_group(prof, oracle, be, xe, pats, texts, sig, spot)
        if bad is not None:
            print(f"MISMATCH group={gidx} seed={seed} sig={sig} "
                  f"pair=(q={bad[0]}, t={bad[1]})  "
                  f"repro: python scripts/soak_batch.py --repro {gidx} {seed}")
            sys.exit(1)
        done += Q * T
        gidx += 1
        if gidx % 8 == 0:
            dt = time.time() - t0
            print(f"{done}/{n_pairs} pairs ok  ({dt:.0f}s, "
                  f"{done / max(dt, 1e-9):.0f} pairs/s)", flush=True)
    dt = time.time() - t0
    msg = (f"SOAK PASSED: {done} pairs in {dt:.0f}s "
           f"({len(SIGNATURES)} signatures, seed={seed})")
    print(msg)
    try:
        with open(log_path, "a") as fh:
            fh.write(time.strftime("%Y-%m-%d %H:%M:%S ") + msg + "\n")
    except OSError:
        pass


if __name__ == "__main__":
    main()
