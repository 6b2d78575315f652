"""Diagnostics and profiling (the reference's `sassy test` + perf-counter
harness, lib.rs:187-281 / benches/ipc.rs, TPU edition)."""

from __future__ import annotations

import contextlib
import time

import numpy as np

__all__ = ["self_test", "trace", "cost_model"]


def self_test(text_bytes: int = 100_000, verbose: bool = True) -> dict:
    """Device features + a 23bp/k=1 throughput smoke (lib.rs:259-281)."""
    import jax

    from . import features
    from .profiles import Iupac
    from .search import Searcher

    info = features()
    rng = np.random.default_rng(0)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    text = rng.choice(bases, size=text_bytes)
    pattern = rng.choice(bases, size=23)
    engine = "pallas" if jax.default_backend() == "tpu" else "xla"
    s = Searcher(Iupac(), rc=False, engine=engine)
    s.search(pattern, text, 1)  # compile
    t0 = time.perf_counter()
    reps = 5
    for _ in range(reps):
        s.search(pattern, text, 1)
    dt = (time.perf_counter() - t0) / reps
    info["engine"] = engine
    info["throughput_gbps"] = text_bytes / dt / 1e9
    if verbose:
        for key, val in info.items():
            print(f"{key}: {val}")
    return info


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace (view with tensorboard/xprof)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def cost_model(m: int, n: int, k: int, num_patterns: int = 1) -> dict:
    """Speed-of-light estimate for the scan on one TPU core.

    The inner loop does ~17 VPU ops per (32-position word x pattern row)
    over (8, 128) lanes; 1024 tiles run per core pass. Useful as the
    roofline check the build plan calls for (SURVEY §7.9)."""
    words = -(-n // 32)
    m_rows = max(16, -(-m // 8) * 8)
    # per 1024-tile core pass, each (word, row) costs ~17 vector ops; tiles
    # partition the words, so total vector-op count divides by 1024.
    ops = words * m_rows * 17 * num_patterns / 1024
    clk = 940e6  # v5e
    sol_seconds = ops / clk
    return {
        "dp_cells": n * m * num_patterns,
        "vector_ops": ops,
        "sol_seconds": sol_seconds,
        "sol_gbps": n * num_patterns / sol_seconds / 1e9,
    }
