"""Identify the Pallas kernel's row-cost bound by ablation.

Variants: full (current math), noeq (eq = constant), nomem (hp/hm kept as
loop carry in registers across rows — only correct for tiny M, used purely
for timing), nostore (skip vp/vm/cost output stores).
python scripts/kernel_variants.py
"""

import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from sassy_tpu.ops.myers_pallas import SUBLANES, LANECOLS, _popcount32

    srl = jax.lax.shift_right_logical
    G, NW, P, M = 64, 130, 4, 24

    def make(variant):
        def kernel(pm_ref, win_ref, vp_out, hp_ref, hm_ref):
            def init_row(j, _):
                hp_ref[j] = jnp.ones((SUBLANES, LANECOLS), jnp.int32)
                hm_ref[j] = jnp.zeros((SUBLANES, LANECOLS), jnp.int32)
                return 0

            jax.lax.fori_loop(0, M, init_row, 0)

            def word_body(w, acc):
                def row_body(j, v):
                    vp, vm = v
                    if variant == "noeq":
                        eq = win_ref[0, w, 0]
                    else:
                        eq = jnp.zeros((SUBLANES, LANECOLS), jnp.int32)
                        for p in range(P):
                            eq = eq | (win_ref[0, w, p] & pm_ref[j, p])
                    if variant == "nomem":
                        hp_j = vp  # nonsense math, same op mix minus VMEM
                        hm_j = vm
                    else:
                        hp_j = hp_ref[j]
                        hm_j = hm_ref[j]
                    vx = eq | vm
                    eqh = eq | hm_j
                    hx = (((eqh & vp) + vp) ^ vp) | eqh
                    hp_o = vm | ~(hx | vp)
                    hm_o = vp & hx
                    if variant != "nomem":
                        hp_ref[j] = srl(hp_o, 31)
                        hm_ref[j] = srl(hm_o, 31)
                    hp_sh = (hp_o << 1) | hp_j
                    hm_sh = (hm_o << 1) | hm_j
                    vp_new = hm_sh | ~(vx | hp_sh)
                    vm_new = hp_sh & vx
                    return (vp_new, vm_new)

                zero = jnp.zeros((SUBLANES, LANECOLS), jnp.int32)
                vp, vm = jax.lax.fori_loop(0, M, row_body, (zero, zero))
                if variant != "nostore":
                    vp_out[0, w] = vp
                return acc + _popcount32(jnp, vp)

            r = jax.lax.fori_loop(0, NW, word_body,
                jnp.zeros((SUBLANES, LANECOLS), jnp.int32))
            if variant == "nostore":
                vp_out[0, 0] = r

        out_shape = jax.ShapeDtypeStruct((G, NW, SUBLANES, LANECOLS), jnp.int32)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(G,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((1, NW, P, SUBLANES, LANECOLS),
                             lambda g: (g, 0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[pl.BlockSpec((1, NW, SUBLANES, LANECOLS),
                                    lambda g: (g, 0, 0, 0),
                                    memory_space=pltpu.VMEM)],
            scratch_shapes=[
                pltpu.VMEM((M, SUBLANES, LANECOLS), jnp.int32),
                pltpu.VMEM((M, SUBLANES, LANECOLS), jnp.int32),
            ],
        )
        call = pl.pallas_call(kernel, grid_spec=grid_spec,
                              out_shape=(out_shape,))
        return jax.jit(lambda w, p: call(p, w)[0])

    rng = np.random.default_rng(0)
    win = jnp.asarray(rng.integers(0, 2**31, (G, NW, P, 8, 128), dtype=np.int32))
    pm = jnp.asarray(rng.integers(-1, 1, (M, P), dtype=np.int32))
    chars = G * NW * 32 * 1024

    for variant in ("full", "noeq", "nomem", "nostore"):
        fn = make(variant)
        sync = lambda: np.asarray(fn(win, pm).ravel()[:1])  # 1-elem fetch
        sync()  # compile+run
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            sync()
            best = min(best, time.perf_counter() - t0)
        # subtract nothing; relative comparison only
        print(f"{variant:8s}: {best*1e3:7.1f} ms  ({chars/best/1e9:6.2f} GB/s)")


if __name__ == "__main__":
    main()
