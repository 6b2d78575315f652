"""Headline benchmark: single-chip text-scan throughput.

Config mirrors the reference's flagship eval row (23bp pattern, k=3;
/root/reference/evals/src/sassy2/output-xeon-512/text_scaling_results.csv:2
-> 2.105 GB/s on one AVX-512 thread). We scan a large random DNA text
(generated device-side; this environment's host<->TPU tunnel moves bytes at
~0.03 GB/s, so text upload must stay off the hot path, exactly as a real
deployment keeps the genome resident in HBM) with one 23bp pattern at k=3,
through the full search pipeline: bit-parallel scan + on-device candidate
selection + packed result fetch.

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
    import jax.numpy as jnp

    from sassy_tpu.ops.myers_xla import PreparedText
    from sassy_tpu.profiles import Iupac
    from sassy_tpu.search import make_engine

    backend = jax.default_backend()
    engine = "pallas" if backend == "tpu" else "xla"
    n = 1 << 30 if backend == "tpu" else 1 << 21

    # device-side random DNA with a few planted (mutated) pattern copies
    rng = np.random.default_rng(42)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    pattern = rng.choice(bases, size=23)
    key = jax.random.PRNGKey(0)
    idx = jax.random.randint(key, (n,), 0, 4, dtype=jnp.uint8)
    text_dev = jnp.take(jnp.asarray(bases), idx.astype(jnp.int32))
    planted = pattern.copy()
    planted[11] = bases[(np.where(bases == planted[11])[0][0] + 1) % 4]
    for off in (12345, n // 2, n - 5000):
        text_dev = jax.lax.dynamic_update_slice(
            text_dev, jnp.asarray(planted), (off,)
        )
    text_dev.block_until_ready()

    prof = Iupac()
    eng = make_engine(engine)
    t0 = time.perf_counter()
    prep = PreparedText(prof, text_dev)
    prep.planes.block_until_ready()
    t_pack = time.perf_counter() - t0
    pcodes = prof.encode(pattern)

    t0 = time.perf_counter()
    cands = eng.candidates(prof, pcodes, prep, 3, None, None, False)
    warm = time.perf_counter() - t0
    assert len(cands) >= 3, f"planted matches not found: {cands}"
    print(
        f"[bench] backend={backend} engine={engine} n={n} "
        f"pack={t_pack:.2f}s warmup={warm:.2f}s matches={len(cands)}",
        file=sys.stderr,
    )

    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        eng.candidates(prof, pcodes, prep, 3, None, None, False)
        best = min(best, time.perf_counter() - t0)

    gbps = n / best / 1e9
    print(json.dumps({
        "metric": "text_scan_23bp_k3",
        "value": round(gbps, 4),
        "unit": "GB/s",
        "vs_baseline": round(gbps / BASELINE_GBPS, 4),
    }))


if __name__ == "__main__":
    main()
