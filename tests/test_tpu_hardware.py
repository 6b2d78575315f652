"""Real-TPU conformance lane: the adversarial recipes that caught the
round-1 tile-boundary and plateau-state bugs, run against the ACTUAL
Pallas kernels on hardware (interpret-mode coverage alone leaves the
Mosaic-compiled code path untested).

Run with:  SASSY_TESTS_TPU=1 python -m pytest tests/test_tpu_hardware.py -m tpu
(skipped automatically off-hardware; the default test run forces the CPU
backend via conftest.py). ``-m "tpu and soak"`` adds the 10k-case oracle
soak (nightly scale).
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.tpu


def _require_tpu():
    if os.environ.get("SASSY_TESTS_TPU") != "1":
        pytest.skip("set SASSY_TESTS_TPU=1 to run hardware tests")
    import jax

    if jax.default_backend() != "tpu":
        pytest.skip("no TPU backend")


BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


@pytest.fixture(scope="module")
def engines():
    _require_tpu()
    from sassy_tpu.ops.batch import BatchEngine
    from sassy_tpu.ops.myers_pallas import PallasEngine
    from sassy_tpu.search import NumpyEngine

    return PallasEngine(), BatchEngine(), NumpyEngine()


def test_tile_boundary_lookahead_hw(engines):
    # test_regressions.py recipe, on the real kernel
    from sassy_tpu import profiles

    eng, _, oracle = engines
    prof = profiles.Iupac()
    rng = np.random.default_rng(0)
    pat = b"ACGT"
    pc = prof.encode(pat)
    for trial in range(4):
        text = rng.choice(BASES, size=200_000)
        for edge in (512, 1024, 4096, 65536, 131072):
            text[edge - 2 : edge + 2] = np.frombuffer(pat, np.uint8)
        want = oracle.candidates(prof, pc, text, 2, None, None, False)
        got = eng.candidates(prof, pc, text, 2, None, None, False)
        assert sorted(got) == sorted(want), trial


def test_plateau_state_hw(engines):
    from sassy_tpu import profiles

    eng, be, oracle = engines
    prof = profiles.Iupac()
    rng = np.random.default_rng(99)
    for trial in range(6):
        m = int(rng.integers(3, 12))
        k = int(rng.integers(0, min(m, 4)))
        pat = rng.choice(BASES, size=m)
        segs, tot = [], 0
        while tot < 100_000:
            r = int(rng.integers(20, 4000))
            segs.append(np.full(r, rng.choice(BASES), np.uint8))
            tot += r
            if rng.integers(0, 3) == 0:
                segs.append(pat.copy())
                tot += m
        text = np.concatenate(segs)[:100_000]
        allm = bool(trial % 2)
        want = oracle.candidates(prof, pat, text, k, None, None, allm)
        got = eng.candidates(prof, pat, text, k, None, None, allm)
        assert sorted(got) == sorted(want), ("pallas", trial, m, k, allm)
        gotb = be.candidates_many(prof, [pat], [text], k, None, None, allm)[0][0]
        assert sorted(map(tuple, gotb)) == sorted(map(tuple, want)), (
            "batch", trial, m, k, allm,
        )


def test_alpha_overshoot_hw(engines):
    """Overhang fast path (tail tile + strips) on the real kernel."""
    from sassy_tpu import profiles

    eng, be, oracle = engines
    prof = profiles.Iupac()
    rng = np.random.default_rng(7)
    for trial in range(4):
        n = int(rng.integers(50_000, 120_000))
        m = int(rng.integers(6, 40))
        k = int(rng.integers(0, 5))
        alpha = [0.5, 0.25, 1.0, 0.34][trial]
        text = rng.choice(BASES, size=n)
        pat = rng.choice(BASES, size=m)
        text[-m:] = pat
        text[: m] = pat
        pc = prof.encode(pat)
        want = oracle.candidates(prof, pc, text, k, alpha, None, False)
        got = eng.candidates(prof, pc, text, k, alpha, None, False)
        assert sorted(got) == sorted(want), ("pallas", trial)
        gotb = be.candidates_many(prof, [pc], [text], k, alpha, None, False)[0][0]
        assert sorted(map(tuple, gotb)) == sorted(map(tuple, want)), (
            "batch", trial,
        )


def test_batch_multi_text_hw(engines):
    from sassy_tpu import profiles

    _, be, oracle = engines
    prof = profiles.Iupac()
    rng = np.random.default_rng(5)
    texts = [rng.choice(BASES, size=int(s)) for s in (3000, 64, 40_000, 1)]
    pats = [rng.choice(BASES, size=s) for s in (8, 24, 24, 31)]
    texts[2][1000:1024] = pats[1]
    codes = [prof.encode(p) for p in pats]
    for k in (0, 3):
        for am in (False, True):
            got = be.candidates_many(prof, codes, texts, k, all_minima=am)
            for q in range(len(pats)):
                for t in range(len(texts)):
                    want = oracle.candidates(
                        prof, codes[q], texts[t], k, None, None, am
                    )
                    assert sorted(map(tuple, got[q][t])) == sorted(
                        map(tuple, want)
                    ), (k, am, q, t)


@pytest.mark.soak
def test_oracle_soak_hw(engines):
    """10k-case random+planted soak against the real kernel (nightly)."""
    from sassy_tpu import profiles

    eng, be, oracle = engines
    prof = profiles.Iupac()
    rng = np.random.default_rng(2026)
    # batch them: many (pattern, text) pairs per dispatch via the batch
    # engine; single-engine spot checks interleaved
    for round_i in range(100):
        texts = [
            rng.choice(BASES, size=int(rng.integers(10, 4000)))
            for _ in range(10)
        ]
        m = int(rng.integers(4, 50))
        pats = [rng.choice(BASES, size=m) for _ in range(10)]
        for t in texts:
            if len(t) > m and rng.random() < 0.7:
                p = int(rng.integers(0, len(t) - m))
                t[p : p + m] = pats[int(rng.integers(0, len(pats)))]
        k = int(rng.integers(0, 6))
        am = bool(round_i % 2)
        codes = [prof.encode(p) for p in pats]
        got = be.candidates_many(prof, codes, texts, k, all_minima=am)
        for q in range(10):
            for t in range(10):
                want = oracle.candidates(
                    prof, codes[q], texts[t], k, None, None, am
                )
                assert sorted(map(tuple, got[q][t])) == sorted(
                    map(tuple, want)
                ), (round_i, q, t, k, am)


def test_kernel_warmup_registers(engines):
    """The G=1 kernel warmup must fire for every big dispatch: without it a
    fresh process's first 1 GiB search pays a kernel build that scales with
    the grid (measured 486 s; with the warm, 25 s cold-cache). The engines
    call myers_pallas.warm_kernel before dispatching; verify the variant
    registry grows and a warmed re-run is a no-op."""
    from sassy_tpu.ops import myers_pallas as mp

    eng, be, oracle = engines
    from sassy_tpu.profiles import Iupac

    prof = Iupac()
    rng = np.random.default_rng(3)
    # the warm gate requires a big grid (>= 16k tiles / pieces)
    text = rng.choice(BASES, size=96_000_000)
    pat = rng.choice(BASES, size=19)
    text[1234:1253] = pat
    got = eng.candidates(prof, prof.encode(pat), text, 2, None, None, False)
    q1 = {k for k in mp._WARMED if k[0] == "q1meta"}
    assert q1, "single-pattern dispatch did not warm the q1meta kernel"
    be.candidates_many(prof, [prof.encode(pat)], [text], 2)
    q2 = {k for k in mp._WARMED if k[0] in ("q2", "q2meta")}
    assert q2, "batch dispatch did not warm a q2 kernel variant"
    assert any(p == 1253 and c == 0 for p, c in got), got[:5]


def test_sharded_1dev_hw(engines):
    """shard_map code path on the real chip (a 1-device ('pat','text')
    mesh): the fast word-level path AND the overhang fallback whose shard
    window now tiles TL x WL lanes (parallel/sharded.py one_pattern xla
    path — the rewrite that replaced the single sequential lax.scan that
    crashed the TPU worker at 64 MB shards). Oracle parity at 4 MB, then
    the overhang path at a 64 MB shard asserting the planted matches (the
    crash-fix shape itself; a full oracle there would dominate the lane)."""
    import jax

    from sassy_tpu.parallel import ShardedSearch, ShardedText, make_mesh
    from sassy_tpu.profiles import Iupac

    _, _, oracle = engines
    prof = Iupac()
    rng = np.random.default_rng(11)
    n = 4_000_000
    text = rng.choice(BASES, size=n)
    pats = [rng.choice(BASES, size=20) for _ in range(4)]
    for i, p in enumerate(pats):
        text[10_000 + 50_000 * i : 10_020 + 50_000 * i] = p
    mesh = make_mesh(n_text=1, n_pat=1, devices=jax.devices()[:1])
    st = ShardedText(prof, text)
    ss = ShardedSearch(mesh=mesh, cap=1 << 12, bcap=1 << 10)
    for alpha in (None, 0.5):
        got = ss.candidates_batch(prof, pats, st, 2, alpha=alpha)
        for p, cands in zip(pats, got):
            want = oracle.candidates(
                prof, prof.encode(p), text, 2, alpha, None, False
            )
            assert sorted(cands) == sorted(want), alpha

    big = rng.choice(BASES, size=64_000_000)
    planted = []
    for i, p in enumerate(pats):
        at = 1_000_000 + 13_000_000 * i
        big[at : at + 20] = p
        planted.append(at + 20)
    got = ss.candidates_batch(
        prof, pats, ShardedText(prof, big), 2, alpha=0.5
    )
    for q, end in enumerate(planted):
        assert any(pos == end and cost == 0 for pos, cost in got[q]), (
            q, end, got[q][:5],
        )


def test_perf_regression_hw(engines):
    """Automated perf-regression lane (the reference gates changes on
    criterion benches, benches/perf.rs:11-43; no IPC counters exist over
    the tunnel so wall-clock floors stand in). Floors are ~2x below the
    measured steady state (RECHECK.json 2026-08-19: 24.5 GB/s sequential
    headline, 57.8 ms off-targets-shape batch) so only real regressions —
    not run-to-run noise — trip them. Runs inside scripts/tpu_recheck.py's
    pytest lane, which gates every end-of-round snapshot."""
    import time

    import jax

    eng, be, _ = engines
    from sassy_tpu.profiles import Iupac

    prof = Iupac()
    rng = np.random.default_rng(7)

    # single-pattern scan, 256 MiB device-resident, steady-state best-of-3.
    # Calibrated on hardware 2026-08-20 (the lane's first real run — the
    # original 12 GB/s floor was a guess from the 1 GiB rate, round-4
    # verdict weak #6): at THIS size the ~30 ms tunnel RTT dominates the
    # ~11 ms scan, measured 8.5-9.6 GB/s per call (pipelining does not
    # beat the RTT floor at 256 MiB). Floor 5.0 = catch a >= 2x
    # regression; the 1 GiB absolute rate is gated separately by
    # scripts/tpu_recheck.py's >= 22 GB/s bench floor.
    n = 256 << 20
    text = rng.choice(BASES, size=n)
    pat = rng.choice(BASES, size=23)
    from sassy_tpu.ops.myers_xla import PreparedText

    pt = PreparedText(prof, text)
    pcode = prof.encode(pat)
    eng.candidates(prof, pcode, pt, 3, None, None, False)  # warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        eng.candidates(prof, pcode, pt, 3, None, None, False)
        best = min(best, time.perf_counter() - t0)
    gbps = n / best / 1e9
    assert gbps >= 5.0, f"headline regression: {gbps:.1f} GB/s < 5 floor"

    # batched engine at the off-targets shape (32 x 23bp x 128 Mbp, k=3),
    # on a REUSED TextSet (the eval's methodology — a fresh list re-packs
    # and re-uploads 128 MB through the ~0.05 GB/s tunnel every call,
    # ~2.5 s of pure transfer; first hardware run caught exactly that)
    from sassy_tpu.ops.batch import TextSet

    genome = rng.choice(BASES, size=128_000_000)
    pats = [prof.encode(rng.choice(BASES, size=23)) for _ in range(32)]
    ts = TextSet([genome])
    be.candidates_many(prof, pats, ts, 3)  # warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        be.candidates_many(prof, pats, ts, 3)
        best = min(best, time.perf_counter() - t0)
    ms = best * 1e3
    assert ms <= 120.0, f"batch regression: {ms:.1f} ms > 120 ms floor"
    jax.clear_caches()
