"""Deep differential soak: engines vs the NumPy oracle on CPU.

Mixes uniform-random cases with the adversarial generators that caught
the round-1 conformance bugs (boundary-straddling plants, homopolymer
plateaus), across: xla single-pattern engine, batch engine (fwd and
reverse=), alpha overhang, all_minima, and RC at the Searcher level.

Usage: python scripts/soak_cpu.py [n_cases] [seed]
Prints progress every 100 cases; exits nonzero on first mismatch with a
reproducer line.
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from sassy_tpu import profiles  # noqa: E402
from sassy_tpu.ops.batch import BatchEngine  # noqa: E402
from sassy_tpu.ops.myers_xla import XlaEngine  # noqa: E402
from sassy_tpu.search import NumpyEngine  # noqa: E402

BASES = np.frombuffer(b"ACGT", dtype=np.uint8)
IUPAC = np.frombuffer(b"ACGTNRYSWKM", dtype=np.uint8)


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
    # sparse IUPAC with N runs
    t = rng.choice(BASES, size=n)
    for _ in range(int(rng.integers(0, 4))):
        p = int(rng.integers(0, max(1, n - 10)))
        t[p : p + int(rng.integers(1, 10))] = ord("N")
    return t


def gen_case(rng):
    """One generator step — shared by the soak loop and --repro."""
    m = int(rng.integers(2, 24))
    n = int(rng.integers(m, 4000))
    tmode = int(rng.integers(0, 3))
    text = gen_text(rng, n, tmode)
    pat = rng.choice(IUPAC if rng.random() < 0.2 else BASES, size=m)
    for _ in range(int(rng.integers(0, 4))):
        if rng.random() < 0.5:
            p = int(rng.integers(0, n - m + 1))
        else:
            b = int(rng.choice([256, 512, 1024, 2048]))
            p = max(0, min(n - m, b - int(rng.integers(0, m + 2))))
        text[p : p + m] = pat
    k = int(rng.integers(0, min(m, 6)))
    alpha = (
        float(rng.choice([0.0, 0.5, 1.0])) if rng.random() < 0.25 else None
    )
    allm = bool(rng.integers(0, 2))
    return m, n, tmode, text, pat, k, alpha, allm


def repro(case_no, seed):
    rng = np.random.default_rng(seed)
    for _ in range(case_no + 1):
        got = gen_case(rng)
    return got


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--repro":
        case_no, seed = int(sys.argv[2]), int(sys.argv[3])
        m, n, tmode, text, pat, k, alpha, allm = repro(case_no, seed)
        np.save("/tmp/soak_text.npy", text)
        np.save("/tmp/soak_pat.npy", pat)
        print(f"m={m} n={n} k={k} alpha={alpha} allm={allm} tmode={tmode} "
              f"pat={bytes(pat)} -> /tmp/soak_{{text,pat}}.npy")
        return
    n_cases = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    rng = np.random.default_rng(seed)
    prof = profiles.Iupac()
    oracle = NumpyEngine()
    xe = XlaEngine()
    be = BatchEngine(cell_budget=1 << 18)
    t0 = time.time()
    for case in range(n_cases):
        m, n, tmode, text, pat, k, alpha, allm = gen_case(rng)
        want = oracle.candidates(prof, pat, text, k, alpha, None, allm)
        got = xe.candidates(prof, pat, text, k, alpha, None, allm)
        if sorted(got) != sorted(want):
            print(f"XLA MISMATCH case={case} seed={seed} m={m} n={n} "
                  f"k={k} alpha={alpha} allm={allm} tmode={tmode}")
            print("pat=", bytes(pat))
            sys.exit(1)
        gotb = be.candidates_many(
            prof, [pat], [text], k, alpha, None, allm
        )[0][0]
        if sorted(map(tuple, gotb)) != sorted(map(tuple, want)):
            print(f"BATCH MISMATCH case={case} seed={seed} m={m} n={n} "
                  f"k={k} alpha={alpha} allm={allm} tmode={tmode}")
            sys.exit(1)
        if case % 2 == 0:
            # reverse= batch path vs oracle on the reversed text
            # (device assembly when alpha is None, host pack otherwise)
            wantr = oracle.candidates(
                prof, pat, np.ascontiguousarray(text[::-1]), k, alpha, None,
                allm,
            )
            from sassy_tpu.ops.batch import TextSet

            gotr = be.candidates_many(
                prof, [pat], TextSet([text]), k, alpha, None, allm,
                reverse=True,
            )[0][0]
            if sorted(map(tuple, gotr)) != sorted(map(tuple, wantr)):
                print(f"REVERSE MISMATCH case={case} seed={seed} m={m} "
                      f"n={n} k={k} allm={allm} tmode={tmode}")
                sys.exit(1)
        if case % 100 == 99:
            print(f"{case + 1}/{n_cases} ok  ({time.time() - t0:.0f}s)",
                  flush=True)
        if case % 400 == 399:
            # every (m, n, k) tuple is a fresh jit shape; long soaks
            # otherwise grow the in-process XLA cache without bound
            jax.clear_caches()
    print(f"SOAK PASSED: {n_cases} cases in {time.time() - t0:.0f}s")


if __name__ == "__main__":
    main()
