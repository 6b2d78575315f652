"""Device-side candidate end-position extraction.

jnp port of :func:`sassy_tpu.semantics.find_candidates` (the reference's
sequential minima scan, search.rs:1286-1369), engineered for TPU:

- **No gathers/scatters over positions.** The decreasing-state d(p) ("last
  cost change at or before p was a decrease, or none yet") is computed with a
  single cummax over an encoding ``2*p + (delta>0)`` of nonzero deltas —
  position-level gathers run at ~30M elem/s on TPU and were the bottleneck.
- **Hierarchical compaction.** Candidates are compacted block-wise: a small
  scatter over n/BS block ids, a row-gather of only the nonzero blocks, and a
  tiny scatter into the output buffer. Only ``[count, nblocks, pos[cap],
  cost[cap]]`` leaves the device, in one transfer (the TPU tunnel charges
  ~26ms per round trip).

``select_candidates`` is a plain traced function fused into the engine's
single-dispatch pipeline (ops/myers_xla.py).
"""

from __future__ import annotations

#: positions per compaction block
BLOCK = 1024


def select_candidates(
    jax,
    jnp,
    flat_costs,  # (N,) int32 DP costs at positions 1..N
    flat_delta,  # (N,) int32 cost deltas c(p) - c(p-1) at positions 1..N
    boundary_m,  # () int32 cost at position 0
    n_text,  # () int32 true text length
    max_pos,  # () int32 last valid end position
    k,  # () int32
    alpha,  # () float32 (0.0 when no overhang)
    all_minima: bool,
    cap: int,
    bcap: int,
    min_pos=None,  # () int32: first owned position (shard ownership), or None
    owned_end=None,  # () int32: last owned position, or None
):
    """Returns packed (2 + cap + cap,) int32: [count, nblocks, pos, cost].

    ``min_pos``/``owned_end`` implement the owner-computes rule for sharded
    search (the generalization of the reference's prune_lane_overlaps,
    search.rs:1202-1240): candidates outside [min_pos, owned_end] are
    suppressed, while the decreasing-state scan still sees the halo context.
    """
    c = jnp.concatenate([jnp.asarray(boundary_m, jnp.int32).reshape(1), flat_costs])
    delta = jnp.concatenate([jnp.zeros(1, jnp.int32), flat_delta])
    P1 = c.shape[0]
    pos = jnp.arange(P1, dtype=jnp.int32)

    # total cost incl. overshoot (f32 floor, matching the reference
    # search.rs:1274-1282) — also adjust deltas in the overshoot region so
    # the plateau logic sees total costs.
    ov = jnp.floor(alpha * jnp.maximum(pos - n_text, 0).astype(jnp.float32)).astype(
        jnp.int32
    )
    ov_prev = jnp.floor(
        alpha * jnp.maximum(pos - 1 - n_text, 0).astype(jnp.float32)
    ).astype(jnp.int32)
    c = c + ov
    delta = delta + (ov - ov_prev)

    in_range = pos <= max_pos
    if min_pos is not None:
        in_range = in_range & (pos >= min_pos)
    if owned_end is not None:
        in_range = in_range & (pos <= owned_end)
    if all_minima:
        mask = in_range & (c <= k)
    else:
        # decreasing-state after p: encode each nonzero delta as
        # 2*p (decrease) / 2*p+1 (increase); cummax finds the latest one.
        enc = jnp.where(delta > 0, 2 * pos + 1, jnp.where(delta < 0, 2 * pos, -1))
        m2 = jax.lax.cummax(enc)
        d = (m2 < 0) | ((m2 & 1) == 0)
        delta_next = jnp.concatenate([delta[1:], jnp.ones(1, jnp.int32)])
        next_gt = (delta_next >= 1) | (pos == max_pos)
        mask = in_range & (c <= k) & next_gt & d

    # ---- hierarchical compaction -------------------------------------
    NB = -(-P1 // BLOCK)
    pad = NB * BLOCK - P1
    maskb = jnp.concatenate([mask, jnp.zeros(pad, bool)]).reshape(NB, BLOCK)
    cb = jnp.concatenate([c, jnp.zeros(pad, jnp.int32)]).reshape(NB, BLOCK)

    blk_cnt = jnp.sum(maskb, axis=1, dtype=jnp.int32)  # (NB,)
    blk_nz = blk_cnt > 0
    nblk = jnp.sum(blk_nz.astype(jnp.int32))
    count = jnp.sum(blk_cnt)

    blk_slot = jnp.where(blk_nz, jnp.cumsum(blk_nz.astype(jnp.int32)) - 1, bcap)
    blk_ids = jnp.full((bcap,), NB, jnp.int32)
    blk_ids = blk_ids.at[blk_slot].set(jnp.arange(NB, dtype=jnp.int32), mode="drop")
    blk_base = jnp.cumsum(blk_cnt) - blk_cnt  # output offset per block

    safe = jnp.minimum(blk_ids, NB - 1)
    g_valid = blk_ids < NB
    g_mask = jnp.take(maskb, safe, axis=0) & g_valid[:, None]  # (bcap, BLOCK)
    g_c = jnp.take(cb, safe, axis=0)
    g_base = jnp.take(blk_base, safe)

    local = jnp.cumsum(g_mask.astype(jnp.int32), axis=1) - 1
    slot = jnp.where(g_mask, g_base[:, None] + local, cap)
    g_pos = safe[:, None] * BLOCK + jnp.arange(BLOCK, dtype=jnp.int32)[None, :]

    out_pos = jnp.full((cap,), -1, dtype=jnp.int32)
    out_cost = jnp.zeros((cap,), dtype=jnp.int32)
    out_pos = out_pos.at[slot].set(g_pos, mode="drop")
    out_cost = out_cost.at[slot].set(g_c, mode="drop")
    return jnp.concatenate([count.reshape(1), nblk.reshape(1), out_pos, out_cost])
