"""TPU profiling harness: where does search time go?

Measures (on the real chip): dispatch round-trip overhead, pack time,
scan-only vs fused pipeline, sync-per-dispatch vs async-pipelined
throughput. Run: python scripts/profile_tpu.py [size_log2]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def t(fn, reps=5):
    fn()  # warmup/compile
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import jax
    import jax.numpy as jnp

    from sassy_tpu.ops.myers_xla import XlaEngine, _kernels
    from sassy_tpu.ops.myers_pallas import PallasEngine
    from sassy_tpu.profiles import Iupac

    size = 1 << (int(sys.argv[1]) if len(sys.argv) > 1 else 25)
    print(f"backend={jax.default_backend()} size={size/1e6:.0f}MB")

    # 1. bare dispatch round trip
    f = jax.jit(lambda x: x + 1)
    x = jnp.zeros(8, jnp.int32)
    rt = t(lambda: np.asarray(f(x)))
    print(f"bare dispatch+fetch roundtrip: {rt*1e3:.1f} ms")

    rng = np.random.default_rng(0)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    text = rng.choice(bases, size=size)
    pattern = rng.choice(bases, size=23)
    prof = Iupac()

    for Eng in (PallasEngine, XlaEngine):
        eng = Eng()
        name = eng.name
        # 2. pack (prepare) time
        def prep():
            eng._prep_cache._items.clear()
            p = eng.prepare(prof, text)
            p.planes.block_until_ready()
            return p

        pk = t(prep, reps=3)
        print(f"[{name}] pack: {pk*1e3:.1f} ms ({size/pk/1e9:.2f} GB/s)")

        prep_text = eng.prepare(prof, text)
        pcodes = prof.encode(pattern)

        # 3. full candidates (sync)
        full = t(lambda: eng.candidates(prof, pcodes, prep_text, 3, None, None, False))
        print(f"[{name}] candidates sync: {full*1e3:.1f} ms ({size/full/1e9:.2f} GB/s)")

        # 4. scan-only vs fused pipeline (device time, block_until_ready)
        ker = _kernels()
        array_args, statics = eng.build_inputs(prof, pcodes, prep_text, 3)
        cap = statics.pop("cap"); bcap = statics.pop("bcap")

        def fused():
            out = ker["pipeline"](*array_args, **statics, cap=cap, bcap=bcap)
            out.block_until_ready()

        fu = t(fused)
        print(f"[{name}] fused pipeline device: {fu*1e3:.1f} ms ({size/fu/1e9:.2f} GB/s)")

        sstat = {k: statics[k] for k in ("eq_mode", "T", "W", "halo", "backend", "interpret")}

        def scan_only():
            fc, fd = ker["scan"](*array_args[:6], **sstat)
            fc.block_until_ready()

        so = t(scan_only)
        print(f"[{name}] scan-only device: {so*1e3:.1f} ms ({size/so/1e9:.2f} GB/s)")

        # 5. async pipelined: N dispatches in flight
        N = 8
        def pipelined():
            outs = [
                ker["pipeline"](*array_args, **statics, cap=cap, bcap=bcap)
                for _ in range(N)
            ]
            for o in outs:
                o.block_until_ready()

        pl = t(pipelined, reps=3)
        print(f"[{name}] pipelined x{N}: {pl*1e3:.1f} ms total "
              f"({N*size/pl/1e9:.2f} GB/s)")
        print(f"[{name}] statics: T={statics['T']} W={statics['W']} halo={statics['halo']}")


if __name__ == "__main__":
    main()
