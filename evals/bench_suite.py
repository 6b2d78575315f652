"""Eval harness: the reference's benchmark suite, TPU edition.

Ports the four sassy2 benchmarks (text-scaling, pattern-scaling, nanopore
barcodes, CRISPR off-targets; /root/reference/evals/src/main.rs:14-98 and
benchsuite/bench.rs) with the same CSV schema, so rows are directly
comparable with the committed reference CSVs
(evals/src/sassy2/output-xeon-512/*.csv).

Tools:
- ``search``  = per-(pattern, text) single scans (the reference's Sassy1
  column): one fused device dispatch per pair.
- ``tiling``  = the batched cartesian engine (the Sassy2 column): one
  dispatch for the whole pattern batch x text set.
- ``edlib`` columns are written as 0 (not available in this environment).
- ``*_ipc`` columns are 0 (no hardware counter access on the TPU tunnel).

Throughput accounting matches bench.rs:240-242: scaling benches count
text_len x num_patterns bytes; read/genome benches count raw text bytes.

NOTE on this environment: the host<->TPU tunnel adds ~30 ms per dispatch
round trip and uploads at ~0.03 GB/s; text preparation/upload is done once
untimed (as the reference pre-encodes v2 chunks untimed), but the per-call
round trip IS included in the timed region.

Usage: python evals/bench_suite.py {text_scaling,pattern_scaling,nanopore,
off_targets,all} [--out evals/output-v5e] [--scale 1.0]
"""

from __future__ import annotations

import argparse
import csv
import statistics
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

BASES = np.frombuffer(b"ACGT", dtype=np.uint8)

HEADER = (
    "num_queries,target_len,query_len,k,"
    "search_median_ms,search_mean_ms,search_std_ms,search_ci_lower_ms,"
    "search_ci_upper_ms,search_n_matches,"
    "tiling_median_ms,tiling_mean_ms,tiling_std_ms,tiling_ci_lower_ms,"
    "tiling_ci_upper_ms,tiling_n_matches,"
    "edlib_median_ms,edlib_mean_ms,edlib_std_ms,edlib_ci_lower_ms,"
    "edlib_ci_upper_ms,edlib_n_matches,"
    "search_ipc,tiling_ipc,edlib_ipc,"
    "search_throughput_gbps,search_ci_lower_throughput_gbps,"
    "search_ci_upper_throughput_gbps,"
    "tiling_throughput_gbps,tiling_ci_lower_throughput_gbps,"
    "tiling_ci_upper_throughput_gbps,"
    "edlib_throughput_gbps,edlib_ci_lower_throughput_gbps,"
    "edlib_ci_upper_throughput_gbps,throughput_bytes"
).split(",")


def sim_text(rng, n: int, queries=(), plant_every: int = 0, k: int = 0):
    """Random DNA; optionally plant mutated query copies every
    ``plant_every`` bp (the analog of benchsuite/sim_data.rs)."""
    text = rng.choice(BASES, size=n)
    if queries and plant_every:
        pos = plant_every
        qi = 0
        while pos + len(queries[0]) < n:
            q = queries[qi % len(queries)].copy()
            for _ in range(rng.integers(0, k + 1)):
                q[rng.integers(0, len(q))] = rng.choice(BASES)
            text[pos : pos + len(q)] = q
            pos += plant_every
            qi += 1
    return text


def stats_row(times_ms: list[float], n_matches: int, tbytes: int):
    med = statistics.median(times_ms)
    mean = statistics.fmean(times_ms)
    std = statistics.pstdev(times_ms) if len(times_ms) > 1 else 0.0
    lo, hi = min(times_ms), max(times_ms)
    gb = lambda ms: tbytes / (ms * 1e6) if ms > 0 else 0.0  # noqa: E731
    return (
        [f"{med:.3f}", f"{mean:.3f}", f"{std:.3f}", f"{lo:.3f}", f"{hi:.3f}",
         n_matches],
        [f"{gb(med):.3f}", f"{gb(hi):.3f}", f"{gb(lo):.3f}"],
    )


class Runner:
    def __init__(self, reps: int = 3):
        import jax

        from sassy_tpu.ops.batch import BatchEngine, TextSet
        from sassy_tpu.profiles import Iupac
        from sassy_tpu.search import make_engine

        self.prof = Iupac()
        backend = jax.default_backend()
        self.engine = make_engine("pallas" if backend == "tpu" else "xla")
        self.batch = BatchEngine()
        self.TextSet = TextSet
        self.reps = reps
        print(f"[evals] backend={backend}", file=sys.stderr)

    def run_case(self, queries: list[np.ndarray], texts: list[np.ndarray], k: int):
        """Returns (search_times_ms, search_matches, tiling_times_ms,
        tiling_matches). ``search`` = one pattern at a time (the Sassy1
        analog); ``tiling`` = whole pattern batch in one dispatch."""
        prof = self.prof
        qcodes = [prof.encode(q) for q in queries]
        ts = self.TextSet(texts)

        def t_search():
            n = 0
            t0 = time.perf_counter()
            for qc in qcodes:
                res = self.batch.candidates_many(prof, [qc], ts, k)
                n += sum(len(c) for c in res[0])
            return (time.perf_counter() - t0) * 1e3, n

        def t_tiling():
            t0 = time.perf_counter()
            res = self.batch.candidates_many(prof, qcodes, ts, k)
            dt = (time.perf_counter() - t0) * 1e3
            return dt, sum(len(c) for row in res for c in row)

        t_search()  # warmup/compile
        t_tiling()
        s_times, s_n = [], 0
        t_times, t_n = [], 0
        for _ in range(self.reps):
            dt, s_n = t_search()
            s_times.append(dt)
            dt, t_n = t_tiling()
            t_times.append(dt)
        return s_times, s_n, t_times, t_n

    def emit(self, w, num_q, target_len, query_len, k, s_times, s_n,
             t_times, t_n, tbytes):
        s_stats, s_tp = stats_row(s_times, s_n, tbytes)
        t_stats, t_tp = stats_row(t_times, t_n, tbytes)
        row = (
            [num_q, target_len, query_len, k]
            + s_stats + t_stats
            + ["0.000"] * 5 + [0]           # edlib times/matches
            + ["0.00", "0.00", "0.00"]      # ipc
            + s_tp + t_tp + ["0.000"] * 3   # throughputs
            + [tbytes]
        )
        w.writerow(row)


def bench_text_scaling(r: Runner, w, scale: float):
    rng = np.random.default_rng(1)
    target_len = int(100_000 * scale)
    query_len, k = 23, 3
    text = sim_text(rng, target_len)
    for num_q in (1, 4, 16, 64, 128):
        queries = [rng.choice(BASES, size=query_len) for _ in range(num_q)]
        s_t, s_n, t_t, t_n = r.run_case(queries, [text], k)
        r.emit(w, num_q, target_len, query_len, k, s_t, s_n, t_t, t_n,
               target_len * num_q)


def bench_pattern_scaling(r: Runner, w, scale: float):
    rng = np.random.default_rng(2)
    num_q, query_len = 128, 23
    queries = [rng.choice(BASES, size=query_len) for _ in range(num_q)]
    for target_len in (50, 200, 1000, 2000, 8000):
        tl = max(query_len + 1, int(target_len * scale))
        text = sim_text(rng, tl)
        for k in (0, 3):
            s_t, s_n, t_t, t_n = r.run_case(queries, [text], k)
            r.emit(w, num_q, tl, query_len, k, s_t, s_n, t_t, t_n, tl * num_q)


def bench_nanopore(r: Runner, w, scale: float):
    """96 barcodes x simulated reads (the nanopore benchmark shape,
    reference: 334 Mbp of reads; scaled here)."""
    rng = np.random.default_rng(3)
    num_q, query_len = 96, 24
    total_bp = int(64_000_000 * scale)
    read_len = 10_000
    queries = [rng.choice(BASES, size=query_len) for _ in range(num_q)]
    texts = [
        sim_text(rng, read_len, queries, plant_every=5000, k=3)
        for _ in range(total_bp // read_len)
    ]
    for k in (3, 4):
        s_t, s_n, t_t, t_n = r.run_case(queries, texts, k)
        r.emit(w, num_q, total_bp, query_len, k, s_t, s_n, t_t, t_n, total_bp)


def bench_off_targets(r: Runner, w, scale: float):
    """CRISPR guides x one genome-scale text (reference: 312 guides x
    3.12 Gbp; scaled here)."""
    rng = np.random.default_rng(4)
    query_len, k = 23, 3
    num_q = max(4, int(32 * min(scale * 4, 1.0)))
    genome_bp = int(128_000_000 * scale)
    queries = [rng.choice(BASES, size=query_len) for _ in range(num_q)]
    text = sim_text(rng, genome_bp, queries, plant_every=1_000_000, k=k)
    s_t, s_n, t_t, t_n = r.run_case(queries, [text], k)
    r.emit(w, num_q, genome_bp, query_len, k, s_t, s_n, t_t, t_n, genome_bp)


def _bench_single(r: Runner, w, configs):
    """Single-pattern engine rows (the sassy1 throughput benches,
    evals/src/main.rs:14-40): device-resident text, one fused dispatch."""
    import jax
    import jax.numpy as jnp

    from sassy_tpu.ops.myers_xla import PreparedText

    rng = np.random.default_rng(5)
    for m, n, k in configs:
        key = jax.random.PRNGKey(n)
        idx = jax.random.randint(key, (n,), 0, 4, dtype=jnp.uint8)
        text = jnp.take(jnp.asarray(BASES), idx.astype(jnp.int32))
        prep = PreparedText(r.prof, text)
        np.asarray(prep.planes.ravel()[:1])  # sync upload/pack
        pat = r.prof.encode(rng.choice(BASES, size=m))

        def one():
            t0 = time.perf_counter()
            c = r.engine.candidates(r.prof, pat, prep, k, None, None, False)
            return (time.perf_counter() - t0) * 1e3, len(c)

        one()  # compile
        times, nm = [], 0
        for _ in range(r.reps):
            dt, nm = one()
            times.append(dt)
        r.emit(w, 1, n, m, k, times, nm, [0.0], 0, n)


def bench_throughput_m(r: Runner, w, scale: float):
    n = int(64_000_000 * scale)
    _bench_single(r, w, [(m, n, 3) for m in (16, 23, 32, 64, 96, 128)])


def bench_throughput_n(r: Runner, w, scale: float):
    _bench_single(
        r, w,
        [(23, int(n * scale), 3)
         for n in (1_000_000, 8_000_000, 64_000_000, 512_000_000)],
    )


BENCHES = {
    "text_scaling": bench_text_scaling,
    "pattern_scaling": bench_pattern_scaling,
    "nanopore": bench_nanopore,
    "off_targets": bench_off_targets,
    "throughput_m": bench_throughput_m,
    "throughput_n": bench_throughput_n,
}


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("bench", choices=[*BENCHES, "all"])
    ap.add_argument("--out", default="evals/output-v5e")
    ap.add_argument("--scale", type=float, default=1.0,
                    help="Data size multiplier (1.0 = default scaled sizes)")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args(argv)

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    r = Runner(reps=args.reps)
    names = list(BENCHES) if args.bench == "all" else [args.bench]
    for name in names:
        path = out / f"{name}_results.csv"
        with open(path, "w", newline="") as fh:
            w = csv.writer(fh)
            w.writerow(HEADER)
            t0 = time.perf_counter()
            BENCHES[name](r, w, args.scale)
            print(f"[evals] {name}: {time.perf_counter() - t0:.1f}s -> {path}",
                  file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
