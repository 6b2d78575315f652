"""Fine-grained split of the batched-engine dispatch at a given shape.

Times, per stage, steady state (min of reps), at Q patterns x MB of text:
  1. meta-kernel scan only       (scan_win_q_meta, outputs reduced to sums)
  2. scan + word selection       (select_words_tiles_q, packed reduced)
  3. scan + selection + fetch    (the real mapped dispatch + np.asarray)
  4. end-to-end candidates_many  (host decode, planning, memoized uploads)

Differences attribute time to: in-kernel meta cost, XLA selection cost,
result-fetch tunnel cost, host overhead. Run when deciding which lever
(in-kernel block counts, merged fetch, cap tuning) actually pays.

python scripts/profile_batch2.py [Q] [MB] [reps] [plant_every] [read_len]

``read_len`` > 0 splits the text into a read set (the nanopore_full
shape is Q=96 MB=334 plant_every=5000 read_len=10000), attributing the
read-set-specific overhead stage by stage.
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def best_of(fn, reps):
    fn()  # warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import jax
    import jax.numpy as jnp

    from sassy_tpu.ops import batch as B
    from sassy_tpu.ops.myers_xla import _kernels, pattern_inputs_np
    from sassy_tpu.profiles import Iupac

    Q = int(sys.argv[1]) if len(sys.argv) > 1 else 96
    MB = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    plant_every = int(sys.argv[4]) if len(sys.argv) > 4 else 0
    read_len = int(sys.argv[5]) if len(sys.argv) > 5 else 0
    k = 3
    rng = np.random.default_rng(0)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    text = rng.choice(bases, size=MB * 1_000_000)
    pats = [rng.choice(bases, size=24) for _ in range(Q)]
    if plant_every:
        pos = plant_every
        qi = 0
        while pos + 24 < len(text):
            p = pats[qi % Q].copy()
            for _ in range(rng.integers(0, k + 1)):
                p[rng.integers(0, 24)] = rng.choice(bases)
            text[pos : pos + 24] = p
            pos += plant_every
            qi += 1
    prof = Iupac()
    eng = B.BatchEngine()
    codes = [prof.encode(p) for p in pats]

    # ---- engine end-to-end (cap hints warmed by best_of's warm call)
    if read_len:
        n_reads = len(text) // read_len
        ts = B.TextSet(
            [text[i * read_len : (i + 1) * read_len] for i in range(n_reads)]
        )
    else:
        ts = B.TextSet([text])
    t_full = best_of(lambda: eng.candidates_many(prof, codes, ts, k), reps)
    t_flat = best_of(
        lambda: eng.candidates_many_flat(prof, codes, ts, k), reps
    )
    out = eng.candidates_many_flat(prof, codes, ts, k)
    nm = len(out[0])

    # ---- reproduce the engine's plan (mirrors candidates_many): same
    # w_cap model AND the same fitted-window pick (_pick_w_words), so the
    # per-stage attribution runs at the engine's true window/piece shape
    per = [pattern_inputs_np(prof, c, None, None) for c in codes]
    M = per[0][0].shape[0]
    halo = M + k
    lens = ts.lens
    total_chars = sum(lens)
    target = max(4 * halo, -(-total_chars // 4096), 4 * 32)
    p_cnt = prof.planes
    per_word = (2 * p_cnt + 16) * 4096
    budget = 15 * (1 << 20) - 4 * M * 4096 - (1 << 19)
    w_lim = max(32, budget // per_word)
    from sassy_tpu.ops.batch import _pick_w_words
    from sassy_tpu.ops.myers_xla import _bucket_words, _cdiv

    pad_mult = 1024
    w_cap = min(
        _bucket_words(max(_cdiv(max(lens), 32), 1)),
        _bucket_words(_cdiv(target, 32)),
        eng.w_max_words, w_lim,
    )
    w_chars = _pick_w_words(lens, 0, halo, w_cap, pad_mult) * 32
    if w_chars <= halo + 32:
        w_chars = _bucket_words(_cdiv(halo + 4 * 32, 32)) * 32
    pieces, planes_all, tv_all = ts.packed_win(prof, 0, halo, w_chars, 1024)
    n_pos = w_chars
    t_chunk = max(1, eng.cell_budget // max(1, Q * n_pos))
    t_chunk = max(1024, (t_chunk // 1024) * 1024)
    t_chunk = min(t_chunk, len(pieces))
    nchunks = -(-len(pieces) // t_chunk)
    NW = w_chars // 32
    F = Q * NW * t_chunk
    print(f"Q={Q} text={MB}MB w_chars={w_chars} pieces={len(pieces)} "
          f"t_chunk={t_chunk} chunks={nchunks} F/chunk={F/1e6:.1f}M words")

    blob = np.concatenate(
        [
            np.stack([p[0] for p in per]).reshape(Q, -1),
            np.stack([p[1] for p in per]),
            np.stack([p[2] for p in per]),
            np.array([[24]] * Q, np.uint32),
            np.array([[p[3]] for p in per], np.uint32),
        ],
        axis=1,
    ).astype(np.uint32)
    patblob = jnp.asarray(blob)
    t0s = jnp.asarray(
        [min(c * t_chunk, len(pieces) - t_chunk) for c in range(nchunks)],
        jnp.int32,
    )

    scan_meta = _kernels()["scan_win_q_meta"]
    p_pat = 4
    from sassy_tpu.ops.myers_pallas import LANES_PER_GROUP

    def unpack(pb):
        Qb, cols = pb.shape
        Mn = (cols - 2) // (p_pat + 2)
        pm = pb[:, : Mn * p_pat].reshape(Qb, Mn, p_pat)
        ip = pb[:, Mn * p_pat : Mn * p_pat + Mn]
        hi = pb[:, Mn * p_pat + Mn : Mn * p_pat + 2 * Mn]
        mv = pb[:, -2].astype(jnp.int32)
        bv = pb[:, -1].astype(jnp.int32)
        return pm, ip, hi, mv, bv

    @jax.jit
    def scan_meta_only(planes_all, tv_all, t0s, patblob):
        pm, ip, hi, mv, bv = unpack(patblob)

        def one(t0):
            win = jax.lax.dynamic_slice(
                planes_all, (t0 // LANES_PER_GROUP, 0, 0, 0, 0),
                (t_chunk // LANES_PER_GROUP,) + planes_all.shape[1:],
            )
            tv = jax.lax.dynamic_slice(tv_all, (0, t0), (5, t_chunk))
            vp, vm, cw, meta, fin = scan_meta(
                win, tv[0] != 0, tv[2], tv[3], pm, ip, hi, mv, bv,
                np.int32(k), "iupac", eng.backend, eng.interpret,
                native=True, native_in=True,
            )
            # touch all outputs so nothing is DCE'd, but fetch only scalars
            return (jnp.sum(cw) + jnp.sum(meta) + jnp.sum(fin)
                    + jnp.sum(vp[..., :1]) + jnp.sum(vm[..., :1]))

        return jax.lax.map(one, t0s)

    def run_scan():
        np.asarray(scan_meta_only(planes_all, tv_all, t0s, patblob))

    t_scan = best_of(run_scan, reps)

    # ---- scan + selection, fetch only the 3 header ints per chunk
    from sassy_tpu.ops.minima import select_words_tiles_q, tile_state_chain_codes

    cap, bcap = 1 << 10, 1 << 8

    @jax.jit
    def scan_select(planes_all, tv_all, t0s, patblob):
        pm, ip, hi, mv, bv = unpack(patblob)

        def one(t0):
            win = jax.lax.dynamic_slice(
                planes_all, (t0 // LANES_PER_GROUP, 0, 0, 0, 0),
                (t_chunk // LANES_PER_GROUP,) + planes_all.shape[1:],
            )
            tv = jax.lax.dynamic_slice(tv_all, (0, t0), (5, t_chunk))
            true_start = tv[0] != 0
            vp, vm, cw, meta, fin = scan_meta(
                win, true_start, tv[2], tv[3], pm, ip, hi, mv, bv,
                np.int32(k), "iupac", eng.backend, eng.interpret,
                native=True, native_in=True,
            )
            st0 = tile_state_chain_codes(jax, jnp, fin, tv[2] < 0)
            stride = w_chars + 1
            pos_base = jnp.arange(t_chunk, dtype=jnp.int32) * stride
            packed = select_words_tiles_q(
                jax, jnp, vp, vm, cw, meta, tv[2], tv[3], tv[4], pos_base,
                np.int32(k), st0, False, cap, bcap, native=True,
            )
            return packed

        return jax.lax.map(one, t0s)

    def run_select_hdr():
        got = scan_select(planes_all, tv_all, t0s, patblob)
        np.asarray(got[:, :3])  # headers only

    t_sel = best_of(run_select_hdr, reps)

    def run_select_fetch():
        np.asarray(scan_select(planes_all, tv_all, t0s, patblob))

    t_fetch = best_of(run_select_fetch, reps)

    fetch_bytes = nchunks * (3 + 2 * cap) * 4
    print(f"scan(meta kernel)+sums : {t_scan*1e3:7.1f} ms")
    print(f"scan+select (hdr fetch): {t_sel*1e3:7.1f} ms "
          f"(+{(t_sel-t_scan)*1e3:.1f} selection)")
    print(f"scan+select+full fetch : {t_fetch*1e3:7.1f} ms "
          f"(+{(t_fetch-t_sel)*1e3:.1f} fetch of {fetch_bytes/1024:.0f} KiB)")
    print(f"end-to-end engine      : {t_full*1e3:7.1f} ms "
          f"(+{(t_full-t_fetch)*1e3:.1f} host/plan/decode; {nm} matches)")
    print(f"end-to-end flat-output : {t_flat*1e3:7.1f} ms")
    agg = Q * (MB * 1_000_000) / 1e9
    print(f"aggregate GB/s: scan={agg/t_scan:.1f} select={agg/t_sel:.1f} "
          f"fetch={agg/t_fetch:.1f} engine={agg/t_full:.1f}")


if __name__ == "__main__":
    main()
