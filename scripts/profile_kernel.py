"""Isolate pallas kernel vs window construction; sweep W.

python scripts/profile_kernel.py [size_log2]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def t(fn, reps=5):
    fn()
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import jax
    import jax.numpy as jnp
    from functools import partial

    from sassy_tpu.ops.myers_pallas import LANES_PER_GROUP, get_pallas_scan
    from sassy_tpu.ops.myers_xla import XlaEngine, _cdiv, pattern_inputs_np
    from sassy_tpu.profiles import Iupac

    size = 1 << (int(sys.argv[1]) if len(sys.argv) > 1 else 25)
    rng = np.random.default_rng(0)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    text = rng.choice(bases, size=size)
    pattern = rng.choice(bases, size=23)
    prof = Iupac()
    eng = XlaEngine()
    prep = eng.prepare(prof, text)
    pmasks, is_pad, h_init, boundary_m = pattern_inputs_np(prof, prof.encode(pattern), None, None)
    M = pmasks.shape[0]
    P = prof.planes
    halo = 2

    for W in (16, 32, 64, 128, 256):
        total = prep.gw
        T = _cdiv(total, W)
        T = _cdiv(T, LANES_PER_GROUP) * LANES_PER_GROUP
        G = T // LANES_PER_GROUP
        NW = W + halo

        @partial(jax.jit, static_argnames=("T", "W", "halo"))
        def build_windows(planes_g, T, W, halo):
            n_planes = planes_g.shape[0]
            TW = T * W
            gw = planes_g.shape[1]
            if TW > gw:
                planes_g = jnp.pad(planes_g, ((0, 0), (0, TW - gw)))
            owned = planes_g[:, :TW].reshape(n_planes, T, W)
            shifted = jnp.concatenate(
                [jnp.zeros((n_planes, halo), planes_g.dtype), planes_g[:, : TW - halo]],
                axis=1,
            )
            hal = shifted.reshape(n_planes, T, W)[:, :, :halo]
            win = jnp.concatenate([hal, owned], axis=2)
            win = win.at[:, 0, :].set(planes_g[:, : W + halo])
            win = win.transpose(2, 0, 1)  # (NW, P, T)
            win = jax.lax.bitcast_convert_type(win, jnp.int32)
            Gn = T // LANES_PER_GROUP
            return win.reshape(NW, n_planes, Gn, 8, 128).transpose(2, 0, 1, 3, 4)

        bw = t(lambda: build_windows(prep.planes, T, W, halo).block_until_ready())
        windows = build_windows(prep.planes, T, W, halo)

        call = get_pallas_scan("iupac", P, M, NW, False)
        call = jax.jit(call)
        bc = lambda x: jax.lax.bitcast_convert_type(jnp.asarray(x), jnp.int32)
        args = (bc(pmasks), bc(is_pad), bc(h_init), np.int32(23), np.int32(boundary_m))

        def kern():
            o = call(windows, *args[:3], args[3], args[4])
            o[0].block_until_ready()

        kt = t(kern)
        print(
            f"W={W:4d} T={T:6d} G={G:3d}: windows {bw*1e3:7.1f} ms "
            f"({size/bw/1e9:5.2f} GB/s) | kernel {kt*1e3:7.1f} ms "
            f"({size/kt/1e9:5.2f} GB/s)"
        )


if __name__ == "__main__":
    main()
