"""Headline benchmark: single-chip text-scan throughput.

Config mirrors the reference's flagship eval row (23bp pattern, k=3;
/root/reference/evals/src/sassy2/output-xeon-512/text_scaling_results.csv:2
-> 2.105 GB/s on one AVX-512 thread). We scan a large random DNA text
(generated device-side; this environment's host<->TPU tunnel moves bytes at
~0.03 GB/s, so text upload must stay off the hot path, exactly as a real
deployment keeps the genome resident in HBM) with one 23bp pattern at k=3,
through the full search pipeline: bit-parallel scan + on-device candidate
selection + packed result fetch.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "backend"}.

Resilience: the axon TPU tunnel flaps (it took out round 2's capture with an
rc=1 backend-init hang). The orchestrator therefore (a) probes the TPU
backend in a killable subprocess with a timeout, retrying with backoff,
(b) runs the actual measurement in a subprocess with a hard timeout, and
(c) on persistent TPU failure re-runs on the XLA-CPU backend and emits that
number tagged "backend": "cpu" — a driver capture is never empty-handed.
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import time

import numpy as np

BASELINE_GBPS = 2.105  # reference sassy1, 23bp/k=3, 1 thread AVX-512

PROBE_TIMEOUT_S = 120
PROBE_ATTEMPTS = 3
PROBE_BACKOFF_S = 30
TPU_RUN_TIMEOUT_S = 2400  # cold compile of the fused pipeline can be slow
TPU_RUN_ATTEMPTS = 3  # round-3 lesson: one transient flake cost the capture
TPU_RUN_BACKOFF_S = 60
CPU_RUN_TIMEOUT_S = 1800
REDUCED_N = 1 << 28  # fallback size on RESOURCE_EXHAUSTED

_PROBE_CODE = "import jax; d = jax.devices(); print('PROBE_OK', d[0].platform)"


def _log(msg: str) -> None:
    print(f"[bench] {msg}", file=sys.stderr, flush=True)


def _run_subprocess(argv: list[str], timeout_s: int, env: dict | None = None):
    """Run argv in its own session; kill the whole group on timeout."""
    proc = subprocess.Popen(
        argv,
        stdout=subprocess.PIPE,
        stderr=subprocess.PIPE,
        text=True,
        start_new_session=True,
        env=env,
    )
    try:
        out, err = proc.communicate(timeout=timeout_s)
        return proc.returncode, out, err
    except subprocess.TimeoutExpired:
        try:
            os.killpg(proc.pid, signal.SIGKILL)
        except (ProcessLookupError, PermissionError):
            proc.kill()
        out, err = proc.communicate()
        return -9, out, err


def probe_tpu() -> bool:
    """True iff the axon TPU backend initializes within the timeout."""
    rc, out, err = _run_subprocess(
        [sys.executable, "-c", _PROBE_CODE], PROBE_TIMEOUT_S
    )
    ok = rc == 0 and "PROBE_OK" in out
    _log(f"tpu probe rc={rc} ok={ok} {out.strip()[:80]} {err.strip()[-120:]}")
    return ok


def run_bench(backend: str) -> None:
    """The actual measurement (child process). backend in {'tpu', 'cpu'}."""
    import jax

    if backend == "cpu":
        # JAX_PLATFORMS=cpu in the env does NOT override the axon preset
        # here; the config update (same as tests/conftest.py) does.
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from sassy_tpu.ops.myers_xla import PreparedText
    from sassy_tpu.profiles import Iupac
    from sassy_tpu.search import make_engine

    actual = jax.default_backend()
    engine = "pallas" if actual == "tpu" else "xla"
    n = int(os.environ.get("SASSY_BENCH_N", "0"))
    if n <= 0:
        n = 1 << 30 if actual == "tpu" else 1 << 24

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
    _log(
        f"backend={actual} engine={engine} n={n} "
        f"pack={t_pack:.2f}s warmup={warm:.2f}s matches={len(cands)}"
    )

    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        eng.candidates(prof, pcodes, prep, 3, None, None, False)
        best = min(best, time.perf_counter() - t0)
    seq_gbps = n / best / 1e9

    # steady-state throughput: depth-2 pipelined dispatches, so the
    # host<->device round trip of fetch i overlaps the scan of i+1 (a
    # scanning workload issues many searches back to back; this is the
    # deployment-relevant rate, and how the CLI drives the device)
    reps = 8
    t0 = time.perf_counter()
    prev = eng.candidates_async(prof, pcodes, prep, 3, None, None, False)
    for _ in range(reps - 1):
        nxt = eng.candidates_async(prof, pcodes, prep, 3, None, None, False)
        res = prev()
        prev = nxt
    res = prev()
    pipe_dt = (time.perf_counter() - t0) / reps
    assert len(res) >= 3
    pipe_gbps = n / pipe_dt / 1e9
    _log(f"sequential(latency)={seq_gbps:.2f} GB/s  "
         f"pipelined(depth2 x{reps})={pipe_gbps:.2f} GB/s")

    gbps = max(seq_gbps, pipe_gbps)
    print(json.dumps({
        "metric": "text_scan_23bp_k3",
        "value": round(gbps, 4),
        "unit": "GB/s",
        "vs_baseline": round(gbps / BASELINE_GBPS, 4),
        "backend": actual,
        "sequential_gbps": round(seq_gbps, 4),
        "pipelined_gbps": round(pipe_gbps, 4),
        "n": n,
        "reduced_n": n < (1 << 30) and actual == "tpu",
    }))


def _extract_json_line(out: str) -> str | None:
    for line in reversed(out.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                d = json.loads(line)
            except json.JSONDecodeError:
                continue
            if "metric" in d and "value" in d:
                return line
    return None


def _try_backend(
    backend: str, timeout_s: int, n_override: int | None = None
) -> tuple[str | None, str]:
    """One measurement run. Returns (json_line_or_None, stderr_tail)."""
    env = dict(os.environ)
    if n_override is not None:
        env["SASSY_BENCH_N"] = str(n_override)
        _log(f"running measurement on backend={backend} with reduced "
             f"n={n_override} (timeout {timeout_s}s)")
    else:
        env.pop("SASSY_BENCH_N", None)
        _log(f"running measurement on backend={backend} "
             f"(timeout {timeout_s}s)")
    rc, out, err = _run_subprocess(
        [sys.executable, os.path.abspath(__file__), "--run", backend],
        timeout_s,
        env=env,
    )
    if err.strip():
        sys.stderr.write(err[-2000:])
        sys.stderr.flush()
    line = _extract_json_line(out)
    if rc == 0 and line:
        return line, err
    _log(f"backend={backend} run failed rc={rc}")
    return None, err


def _measure_tpu() -> str | None:
    """Retry the TPU measurement itself (not just the probe).

    Round 3's capture was lost to ONE transient RESOURCE_EXHAUSTED on a
    2400s-budget measurement (BENCH_r03.json; HEAD actually delivered
    29.5 GB/s when re-run). Policy: up to TPU_RUN_ATTEMPTS full-size runs
    with backoff; after any RESOURCE_EXHAUSTED failure, also try once at
    REDUCED_N (tagged "reduced_n": true in the JSON) before giving up.
    """
    tried_reduced = False
    for attempt in range(1, TPU_RUN_ATTEMPTS + 1):
        line, err = _try_backend("tpu", TPU_RUN_TIMEOUT_S)
        if line:
            return line
        oom = "RESOURCE_EXHAUSTED" in err or "ResourceExhausted" in err
        if oom and not tried_reduced:
            tried_reduced = True
            line, _ = _try_backend("tpu", TPU_RUN_TIMEOUT_S, REDUCED_N)
            if line:
                return line
        if attempt < TPU_RUN_ATTEMPTS:
            _log(f"tpu measurement attempt {attempt} failed; retrying in "
                 f"{TPU_RUN_BACKOFF_S}s")
            time.sleep(TPU_RUN_BACKOFF_S)
    return None


def orchestrate() -> None:
    tpu_up = False
    for attempt in range(1, PROBE_ATTEMPTS + 1):
        if probe_tpu():
            tpu_up = True
            break
        if attempt < PROBE_ATTEMPTS:
            _log(f"probe attempt {attempt} failed; retrying in "
                 f"{PROBE_BACKOFF_S}s")
            time.sleep(PROBE_BACKOFF_S)

    line = None
    if tpu_up:
        line = _measure_tpu()
    if line is None:
        _log("falling back to the XLA-CPU backend")
        line = _try_backend("cpu", CPU_RUN_TIMEOUT_S)
    if line is None:
        # Never leave the driver with nothing to parse.
        line = json.dumps({
            "metric": "text_scan_23bp_k3",
            "value": 0.0,
            "unit": "GB/s",
            "vs_baseline": 0.0,
            "backend": "none",
            "error": "both tpu and cpu measurement runs failed",
        })
    print(line, flush=True)


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--run":
        run_bench(sys.argv[2])
    else:
        orchestrate()
