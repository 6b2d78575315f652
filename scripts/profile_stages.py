"""Bisect device time across pipeline stages at genome scale.

python scripts/profile_stages.py [size_log2]
"""

import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, ".")


def t(fn, reps=4):
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

    from sassy_tpu.ops import minima
    from sassy_tpu.ops.myers_pallas import PallasEngine
    from sassy_tpu.ops.myers_xla import PreparedText, _kernels
    from sassy_tpu.profiles import Iupac

    lg = int(sys.argv[1]) if len(sys.argv) > 1 else 29
    n = 1 << lg
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    key = jax.random.PRNGKey(0)
    idx = jax.random.randint(key, (n,), 0, 4, dtype=jnp.uint8)
    text_dev = jnp.take(jnp.asarray(bases), idx.astype(jnp.int32))

    prof = Iupac()
    rng = np.random.default_rng(0)
    pattern = rng.choice(bases, size=23)
    eng = PallasEngine()

    pk = t(lambda: np.asarray(PreparedText(prof, text_dev).planes.ravel()[:1]), reps=2)
    print(f"pack: {pk*1e3:.1f} ms ({n/pk/1e9:.2f} GB/s)")
    prep = PreparedText(prof, text_dev)

    ker = _kernels()
    array_args, statics = eng.build_inputs(prof, prof.encode(pattern), prep, 3)
    print("statics:", {k: statics[k] for k in ("T", "W", "halo")})
    sstat = {k: statics[k] for k in ("eq_mode", "T", "W", "halo", "backend", "interpret")}
    scan_words = ker["scan_words"]

    @partial(jax.jit, static_argnames=tuple(sstat))
    def j_scan(*a, **kw):
        return scan_words(*a, **kw)

    def sync(x):
        leaves = jax.tree_util.tree_leaves(x)
        return np.asarray(leaves[0].ravel()[:1])

    sc = t(lambda: sync(j_scan(*array_args[:6], **sstat)))
    print(f"scan_words: {sc*1e3:.1f} ms ({n/sc/1e9:.2f} GB/s)")

    @partial(jax.jit, static_argnames=tuple(sstat))
    def j_screen(*a, **kw):
        vp, vm, cw = scan_words(*a, **kw)
        lb = cw + minima.word_min_prefix(jax, jnp, vp, vm)
        return jnp.sum((lb <= 3).astype(jnp.int32))

    scr = t(lambda: sync(j_screen(*array_args[:6], **sstat)))
    print(f"scan+minprefix-screen: {scr*1e3:.1f} ms ({n/scr/1e9:.2f} GB/s)")

    @partial(jax.jit, static_argnames=tuple(sstat))
    def j_dstate(*a, **kw):
        vp, vm, cw = scan_words(*a, **kw)
        clz = jax.lax.clz
        NW, T = vp.shape
        widx = jnp.arange(NW, dtype=jnp.int32)[:, None]
        has = (vp | vm) != 0
        s_w = ((31 - clz(vp).astype(jnp.int32)) > (31 - clz(vm).astype(jnp.int32))).astype(jnp.int32)
        enc = jnp.where(has, 2 * (widx + 1) + s_w, 0)
        cm = jax.lax.cummax(enc, axis=0)
        return jnp.sum(cm)

    ds = t(lambda: sync(j_dstate(*array_args[:6], **sstat)))
    print(f"scan+dstate-cummax: {ds*1e3:.1f} ms ({n/ds/1e9:.2f} GB/s)")

    cap = statics["cap"]; bcap = statics["bcap"]
    st2 = dict(statics); st2.pop("cap"); st2.pop("bcap")
    fused = lambda: sync(ker["pipeline"](*array_args, **st2, cap=cap, bcap=bcap))
    fu = t(fused)
    print(f"fused pipeline: {fu*1e3:.1f} ms ({n/fu/1e9:.2f} GB/s)")


if __name__ == "__main__":
    main()
