"""Microbench: U patterns interleaved per program in the batched scan.

The Myers step is latency-bound on its serial op chain; q2 (two chains)
was a big win. This measures q1/q2/q4/q8 on the real TPU to see where the
ILP benefit saturates vs VMEM pressure. Standalone — does not touch the
engine. python scripts/kernel_qn.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def make_call(U, eq_mode, n_planes, M, NW, interpret=False):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from sassy_tpu.ops.myers_pallas import LANECOLS, SUBLANES, _popcount32

    srl = jax.lax.shift_right_logical

    def kernel(pm_ref, ispad_ref, hinit_ref, scal_ref, t0_ref, win_ref,
               vp_out, vm_out, cost_out, hp_ref, hm_ref):
        lane0 = t0_ref[0] != 0

        def init_row(j, _):
            for u in range(U):
                pad = ispad_ref[u, 0, j]
                hj = jnp.where(
                    pad != 0,
                    jnp.int32(0),
                    jnp.where(lane0, hinit_ref[u, 0, j], jnp.int32(1)),
                )
                hp_ref[u, j] = hj
                hm_ref[u, j] = jnp.zeros((SUBLANES, LANECOLS), jnp.int32)
            return 0

        jax.lax.fori_loop(0, M, init_row, 0)
        cost0 = tuple(
            jnp.where(lane0, scal_ref[u, 0, 1], scal_ref[u, 0, 0])
            for u in range(U)
        )

        def word_body(w, costs):
            def row_body(j, v):
                outs = []
                for u in range(U):
                    vp, vm = v[2 * u], v[2 * u + 1]
                    eq = jnp.full(
                        (SUBLANES, LANECOLS), ispad_ref[u, 0, j], jnp.int32
                    )
                    for pp in range(n_planes):
                        eq = eq | (
                            win_ref[0, w, pp] & pm_ref[u, 0, j * n_planes + pp]
                        )
                    hp_j = hp_ref[u, j]
                    hm_j = hm_ref[u, j]
                    vx = eq | vm
                    eqh = eq | hm_j
                    hx = (((eqh & vp) + vp) ^ vp) | eqh
                    hp_o = vm | ~(hx | vp)
                    hm_o = vp & hx
                    hp_ref[u, j] = srl(hp_o, 31)
                    hm_ref[u, j] = srl(hm_o, 31)
                    hp_sh = (hp_o << 1) | hp_j
                    hm_sh = (hm_o << 1) | hm_j
                    outs.append(hm_sh | ~(vx | hp_sh))
                    outs.append(hp_sh & vx)
                return tuple(outs)

            zero = jnp.zeros((SUBLANES, LANECOLS), jnp.int32)
            v = jax.lax.fori_loop(0, M, row_body, (zero,) * (2 * U))
            new_costs = []
            for u in range(U):
                vp_out[u, 0, w] = v[2 * u]
                vm_out[u, 0, w] = v[2 * u + 1]
                cost_out[u, 0, w] = costs[u]
                new_costs.append(
                    costs[u]
                    + _popcount32(jnp, v[2 * u])
                    - _popcount32(jnp, v[2 * u + 1])
                )
            return tuple(new_costs)

        jax.lax.fori_loop(0, NW, word_body, cost0)

    def call(windows, tile0, pmasks, is_pad, h_init, scal):
        G = windows.shape[0]
        Q = pmasks.shape[0]
        P = windows.shape[2]
        pmasks = pmasks.reshape(Q, 1, M * P)
        is_pad = is_pad.reshape(Q, 1, M)
        h_init = h_init.reshape(Q, 1, M)
        scal = scal.reshape(Q, 1, 2)
        out_shape = jax.ShapeDtypeStruct(
            (Q, G, NW, SUBLANES, LANECOLS), jnp.int32
        )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(Q // U, G),
            in_specs=[
                pl.BlockSpec((U, 1, M * P), lambda q, g: (q, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((U, 1, M), lambda q, g: (q, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((U, 1, M), lambda q, g: (q, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((U, 1, 2), lambda q, g: (q, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, SUBLANES, LANECOLS), lambda q, g: (g, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, NW, P, SUBLANES, LANECOLS),
                             lambda q, g: (g, 0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((U, 1, NW, SUBLANES, LANECOLS),
                             lambda q, g: (q, g, 0, 0, 0),
                             memory_space=pltpu.VMEM)
            ]
            * 3,
            scratch_shapes=[
                pltpu.VMEM((U, M, SUBLANES, LANECOLS), jnp.int32),
                pltpu.VMEM((U, M, SUBLANES, LANECOLS), jnp.int32),
            ],
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=(out_shape, out_shape, out_shape),
            interpret=interpret,
        )(pmasks, is_pad, h_init, scal, tile0, windows)

    return call


def main():
    import jax
    import jax.numpy as jnp

    G, NW, P, M, Q = 16, 128, 4, 24, 8
    rng = np.random.default_rng(0)
    win = jnp.asarray(
        rng.integers(0, 2**31, (G, NW, P, 8, 128), dtype=np.int32)
    )
    t0 = jnp.zeros((G, 8, 128), jnp.int32)
    pm = jnp.asarray(rng.integers(0, 2**31, (Q, M, P), dtype=np.int32))
    ip = jnp.zeros((Q, M), jnp.int32)
    hi = jnp.ones((Q, M), jnp.int32)
    scal = jnp.asarray(np.tile([M, M], (Q, 1)).astype(np.int32))
    chars = Q * G * NW * 32 * 1024

    ref = None
    for U in (1, 2, 4, 8):
        call = make_call(U, "iupac", P, M, NW)
        fn = jax.jit(lambda w, t, p, i, h, s: call(w, t, p, i, h, s))
        try:
            sync = lambda: np.asarray(fn(win, t0, pm, ip, hi, scal)[0].ravel()[:1])  # noqa: E731
            sync()
            best = 1e9
            for _ in range(3):
                st = time.perf_counter()
                sync()
                best = min(best, time.perf_counter() - st)
            out = np.asarray(fn(win, t0, pm, ip, hi, scal)[0])
            if ref is None:
                ref = out
            ok = "ok" if np.array_equal(out, ref) else "MISMATCH"
            print(f"q{U}: {best*1e3:7.1f} ms  ({chars/best/1e9:6.2f} Gchar/s) {ok}")
        except Exception as e:
            print(f"q{U}: FAIL {str(e)[:140]}")


if __name__ == "__main__" and "--unroll" not in sys.argv and "--wunroll" not in sys.argv:
    main()


def make_call_unroll(U, eq_mode, n_planes, M, NW, interpret=False):
    """Same as make_call but the rows loop is fully unrolled (static VMEM
    indices for hp/hm instead of fori_loop dynamic indexing)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from sassy_tpu.ops.myers_pallas import LANECOLS, SUBLANES, _popcount32

    srl = jax.lax.shift_right_logical

    def kernel(pm_ref, ispad_ref, hinit_ref, scal_ref, t0_ref, win_ref,
               vp_out, vm_out, cost_out, hp_ref, hm_ref):
        lane0 = t0_ref[0] != 0
        for j in range(M):
            for u in range(U):
                pad = ispad_ref[u, 0, j]
                hj = jnp.where(
                    pad != 0,
                    jnp.int32(0),
                    jnp.where(lane0, hinit_ref[u, 0, j], jnp.int32(1)),
                )
                hp_ref[u, j] = hj
                hm_ref[u, j] = jnp.zeros((SUBLANES, LANECOLS), jnp.int32)
        cost0 = tuple(
            jnp.where(lane0, scal_ref[u, 0, 1], scal_ref[u, 0, 0])
            for u in range(U)
        )

        def word_body(w, costs):
            vs = [jnp.zeros((SUBLANES, LANECOLS), jnp.int32)] * (2 * U)
            for j in range(M):  # static unroll
                for u in range(U):
                    vp, vm = vs[2 * u], vs[2 * u + 1]
                    eq = jnp.full(
                        (SUBLANES, LANECOLS), ispad_ref[u, 0, j], jnp.int32
                    )
                    for pp in range(n_planes):
                        eq = eq | (
                            win_ref[0, w, pp] & pm_ref[u, 0, j * n_planes + pp]
                        )
                    hp_j = hp_ref[u, j]
                    hm_j = hm_ref[u, j]
                    vx = eq | vm
                    eqh = eq | hm_j
                    hx = (((eqh & vp) + vp) ^ vp) | eqh
                    hp_o = vm | ~(hx | vp)
                    hm_o = vp & hx
                    hp_ref[u, j] = srl(hp_o, 31)
                    hm_ref[u, j] = srl(hm_o, 31)
                    hp_sh = (hp_o << 1) | hp_j
                    hm_sh = (hm_o << 1) | hm_j
                    vs[2 * u] = hm_sh | ~(vx | hp_sh)
                    vs[2 * u + 1] = hp_sh & vx
            new_costs = []
            for u in range(U):
                vp_out[u, 0, w] = vs[2 * u]
                vm_out[u, 0, w] = vs[2 * u + 1]
                cost_out[u, 0, w] = costs[u]
                new_costs.append(
                    costs[u]
                    + _popcount32(jnp, vs[2 * u])
                    - _popcount32(jnp, vs[2 * u + 1])
                )
            return tuple(new_costs)

        jax.lax.fori_loop(0, NW, word_body, cost0)

    def call(windows, tile0, pmasks, is_pad, h_init, scal):
        G = windows.shape[0]
        Q = pmasks.shape[0]
        P = windows.shape[2]
        pmasks = pmasks.reshape(Q, 1, M * P)
        is_pad = is_pad.reshape(Q, 1, M)
        h_init = h_init.reshape(Q, 1, M)
        scal = scal.reshape(Q, 1, 2)
        out_shape = jax.ShapeDtypeStruct(
            (Q, G, NW, SUBLANES, LANECOLS), jnp.int32
        )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(Q // U, G),
            in_specs=[
                pl.BlockSpec((U, 1, M * P), lambda q, g: (q, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((U, 1, M), lambda q, g: (q, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((U, 1, M), lambda q, g: (q, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((U, 1, 2), lambda q, g: (q, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, SUBLANES, LANECOLS), lambda q, g: (g, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, NW, P, SUBLANES, LANECOLS),
                             lambda q, g: (g, 0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((U, 1, NW, SUBLANES, LANECOLS),
                             lambda q, g: (q, g, 0, 0, 0),
                             memory_space=pltpu.VMEM)
            ]
            * 3,
            scratch_shapes=[
                pltpu.VMEM((U, M, SUBLANES, LANECOLS), jnp.int32),
                pltpu.VMEM((U, M, SUBLANES, LANECOLS), jnp.int32),
            ],
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=(out_shape, out_shape, out_shape),
            interpret=interpret,
        )(pmasks, is_pad, h_init, scal, tile0, windows)

    return call


def main_unroll():
    import jax
    import jax.numpy as jnp

    G, NW, P, M, Q = 16, 128, 4, 24, 8
    rng = np.random.default_rng(0)
    win = jnp.asarray(
        rng.integers(0, 2**31, (G, NW, P, 8, 128), dtype=np.int32)
    )
    t0 = jnp.zeros((G, 8, 128), jnp.int32)
    pm = jnp.asarray(rng.integers(0, 2**31, (Q, M, P), dtype=np.int32))
    ip = jnp.zeros((Q, M), jnp.int32)
    hi = jnp.ones((Q, M), jnp.int32)
    scal = jnp.asarray(np.tile([M, M], (Q, 1)).astype(np.int32))
    chars = Q * G * NW * 32 * 1024

    ref = None
    for name, mk, U in (("q2-loop", make_call, 2), ("q2-unroll", make_call_unroll, 2),
                        ("q1-unroll", make_call_unroll, 1)):
        call = mk(U, "iupac", P, M, NW)
        fn = jax.jit(lambda w, t, p, i, h, s: call(w, t, p, i, h, s))
        try:
            sync = lambda: np.asarray(fn(win, t0, pm, ip, hi, scal)[0].ravel()[:1])  # noqa: E731
            sync()
            best = 1e9
            for _ in range(3):
                st = time.perf_counter()
                sync()
                best = min(best, time.perf_counter() - st)
            out = np.asarray(fn(win, t0, pm, ip, hi, scal)[0])
            if ref is None:
                ref = out
            ok = "ok" if np.array_equal(out, ref) else "MISMATCH"
            print(f"{name}: {best*1e3:7.1f} ms  ({chars/best/1e9:6.2f} Gchar/s) {ok}")
        except Exception as e:
            print(f"{name}: FAIL {str(e)[:140]}")


if __name__ == "__main__" and "--unroll" in sys.argv:
    main_unroll()
    sys.exit(0)


def make_call_unroll_w(U, eq_mode, n_planes, M, NW, WU, interpret=False):
    """Rows fully unrolled AND the word loop unrolled by WU."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from sassy_tpu.ops.myers_pallas import LANECOLS, SUBLANES, _popcount32

    srl = jax.lax.shift_right_logical
    assert NW % WU == 0

    def kernel(pm_ref, ispad_ref, hinit_ref, scal_ref, t0_ref, win_ref,
               vp_out, vm_out, cost_out, hp_ref, hm_ref):
        lane0 = t0_ref[0] != 0
        for j in range(M):
            for u in range(U):
                pad = ispad_ref[u, 0, j]
                hj = jnp.where(
                    pad != 0,
                    jnp.int32(0),
                    jnp.where(lane0, hinit_ref[u, 0, j], jnp.int32(1)),
                )
                hp_ref[u, j] = hj
                hm_ref[u, j] = jnp.zeros((SUBLANES, LANECOLS), jnp.int32)
        cost0 = tuple(
            jnp.where(lane0, scal_ref[u, 0, 1], scal_ref[u, 0, 0])
            for u in range(U)
        )

        def word_body(wb, costs):
            costs = list(costs)
            for dw in range(WU):
                w = wb * WU + dw
                vs = [jnp.zeros((SUBLANES, LANECOLS), jnp.int32)] * (2 * U)
                for j in range(M):
                    for u in range(U):
                        vp, vm = vs[2 * u], vs[2 * u + 1]
                        eq = jnp.full(
                            (SUBLANES, LANECOLS), ispad_ref[u, 0, j], jnp.int32
                        )
                        for pp in range(n_planes):
                            eq = eq | (
                                win_ref[0, w, pp]
                                & pm_ref[u, 0, j * n_planes + pp]
                            )
                        hp_j = hp_ref[u, j]
                        hm_j = hm_ref[u, j]
                        vx = eq | vm
                        eqh = eq | hm_j
                        hx = (((eqh & vp) + vp) ^ vp) | eqh
                        hp_o = vm | ~(hx | vp)
                        hm_o = vp & hx
                        hp_ref[u, j] = srl(hp_o, 31)
                        hm_ref[u, j] = srl(hm_o, 31)
                        hp_sh = (hp_o << 1) | hp_j
                        hm_sh = (hm_o << 1) | hm_j
                        vs[2 * u] = hm_sh | ~(vx | hp_sh)
                        vs[2 * u + 1] = hp_sh & vx
                for u in range(U):
                    vp_out[u, 0, w] = vs[2 * u]
                    vm_out[u, 0, w] = vs[2 * u + 1]
                    cost_out[u, 0, w] = costs[u]
                    costs[u] = (
                        costs[u]
                        + _popcount32(jnp, vs[2 * u])
                        - _popcount32(jnp, vs[2 * u + 1])
                    )
            return tuple(costs)

        jax.lax.fori_loop(0, NW // WU, word_body, cost0)

    def call(windows, tile0, pmasks, is_pad, h_init, scal):
        G = windows.shape[0]
        Q = pmasks.shape[0]
        P = windows.shape[2]
        pmasks = pmasks.reshape(Q, 1, M * P)
        is_pad = is_pad.reshape(Q, 1, M)
        h_init = h_init.reshape(Q, 1, M)
        scal = scal.reshape(Q, 1, 2)
        out_shape = jax.ShapeDtypeStruct(
            (Q, G, NW, SUBLANES, LANECOLS), jnp.int32
        )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(Q // U, G),
            in_specs=[
                pl.BlockSpec((U, 1, M * P), lambda q, g: (q, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((U, 1, M), lambda q, g: (q, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((U, 1, M), lambda q, g: (q, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((U, 1, 2), lambda q, g: (q, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, SUBLANES, LANECOLS), lambda q, g: (g, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, NW, P, SUBLANES, LANECOLS),
                             lambda q, g: (g, 0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((U, 1, NW, SUBLANES, LANECOLS),
                             lambda q, g: (q, g, 0, 0, 0),
                             memory_space=pltpu.VMEM)
            ]
            * 3,
            scratch_shapes=[
                pltpu.VMEM((U, M, SUBLANES, LANECOLS), jnp.int32),
                pltpu.VMEM((U, M, SUBLANES, LANECOLS), jnp.int32),
            ],
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=(out_shape, out_shape, out_shape),
            interpret=interpret,
        )(pmasks, is_pad, h_init, scal, tile0, windows)

    return call


def main_wunroll():
    import jax
    import jax.numpy as jnp

    G, NW, P, M, Q = 16, 128, 4, 24, 8
    rng = np.random.default_rng(0)
    win = jnp.asarray(
        rng.integers(0, 2**31, (G, NW, P, 8, 128), dtype=np.int32)
    )
    t0 = jnp.zeros((G, 8, 128), jnp.int32)
    pm = jnp.asarray(rng.integers(0, 2**31, (Q, M, P), dtype=np.int32))
    ip = jnp.zeros((Q, M), jnp.int32)
    hi = jnp.ones((Q, M), jnp.int32)
    scal = jnp.asarray(np.tile([M, M], (Q, 1)).astype(np.int32))
    chars = Q * G * NW * 32 * 1024

    ref = None
    cases = [("q2-unroll-w1", lambda: make_call_unroll(2, "iupac", P, M, NW)),
             ("q2-unroll-w2", lambda: make_call_unroll_w(2, "iupac", P, M, NW, 2)),
             ("q2-unroll-w4", lambda: make_call_unroll_w(2, "iupac", P, M, NW, 4)),
             ("q1-unroll-w2", lambda: make_call_unroll_w(1, "iupac", P, M, NW, 2))]
    for name, mk in cases:
        call = mk()
        fn = jax.jit(lambda w, t, p, i, h, s: call(w, t, p, i, h, s))
        try:
            sync = lambda: np.asarray(fn(win, t0, pm, ip, hi, scal)[0].ravel()[:1])  # noqa: E731
            sync()
            best = 1e9
            for _ in range(3):
                st = time.perf_counter()
                sync()
                best = min(best, time.perf_counter() - st)
            out = np.asarray(fn(win, t0, pm, ip, hi, scal)[0])
            if ref is None:
                ref = out
            ok = "ok" if np.array_equal(out, ref) else "MISMATCH"
            print(f"{name}: {best*1e3:7.1f} ms  ({chars/best/1e9:6.2f} Gchar/s) {ok}")
        except Exception as e:
            print(f"{name}: FAIL {str(e)[:140]}")


if __name__ == "__main__" and "--wunroll" in sys.argv:
    main_wunroll()
    sys.exit(0)
