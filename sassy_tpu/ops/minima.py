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

    return compact_packed(jax, jnp, mask, pos, c, cap, bcap)


def compact_packed(jax, jnp, mask, posvals, costvals, cap, bcap):
    """Block-hierarchical compaction of a sparse candidate mask.

    mask/posvals/costvals: flat (N,) arrays. Returns packed (2 + 2*cap,)
    int32 [count, nblocks, pos[cap], cost[cap]] — pos entries are the
    posvals at mask positions, in increasing index order; unused slots -1.
    Gathers touch only the (few) nonzero blocks, so the compaction cost
    scales with matches, not text length.
    """
    N = mask.shape[0]
    NB = -(-N // BLOCK)
    pad = NB * BLOCK - N
    maskb = jnp.concatenate([mask, jnp.zeros(pad, bool)]).reshape(NB, BLOCK)
    cb = jnp.concatenate([costvals, jnp.zeros(pad, jnp.int32)]).reshape(NB, BLOCK)
    pb = jnp.concatenate([posvals, jnp.zeros(pad, jnp.int32)]).reshape(NB, BLOCK)

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
    g_p = jnp.take(pb, safe, axis=0)
    g_base = jnp.take(blk_base, safe)

    local = jnp.cumsum(g_mask.astype(jnp.int32), axis=1) - 1
    slot = jnp.where(g_mask, g_base[:, None] + local, cap)

    out_pos = jnp.full((cap,), -1, dtype=jnp.int32)
    out_cost = jnp.zeros((cap,), dtype=jnp.int32)
    out_pos = out_pos.at[slot].set(g_p, mode="drop")
    out_cost = out_cost.at[slot].set(g_c, mode="drop")
    return jnp.concatenate([count.reshape(1), nblk.reshape(1), out_pos, out_cost])


def select_candidates_tiles(
    jax,
    jnp,
    vp_w,  # (W, T) uint32 vertical +1 delta words
    vm_w,  # (W, T) uint32 vertical -1 delta words
    cost_w,  # (W, T) int32 last-row cost at each word start
    boundary0,  # (T,) int32 cost at each tile's position 0
    text_end,  # (T,) int32 per-tile text end (overshoot reference point)
    valid_from,  # (T,) int32: positions > valid_from are owned (-1 = from 0)
    valid_to,  # (T,) int32: positions <= valid_to are owned
    islast_at,  # (T,) int32: trailing-minimum position (-1 = none)
    k,  # () int32
    alpha,  # () float32 (0.0 = no overhang)
    all_minima: bool,
    cap: int,
    bcap: int,
):
    """Per-tile candidate selection for the batched engine.

    Each tile is an independent text (or text segment) with its own boundary
    cost, ownership interval, and trailing-minimum position — the device-side
    generalization of :func:`sassy_tpu.semantics.find_candidates` to a
    (tiles, positions) grid. Returns packed [count, nblocks, enc[cap],
    cost[cap]] where ``enc = tile * (W*32 + 1) + pos``.
    """
    W, T = vp_w.shape
    WB = 32
    N = W * WB
    bit = jnp.arange(WB, dtype=jnp.uint32)
    vp_b = ((vp_w[..., None] >> bit) & 1).astype(jnp.int32)  # (W,T,32)
    vm_b = ((vm_w[..., None] >> bit) & 1).astype(jnp.int32)
    delta = (vp_b - vm_b).transpose(1, 0, 2).reshape(T, N)
    csum = jnp.cumsum((vp_b - vm_b), axis=-1)
    posc = (cost_w[..., None] + csum).transpose(1, 0, 2).reshape(T, N)

    c = jnp.concatenate([boundary0[:, None], posc], axis=1)  # (T, N+1)
    delta = jnp.concatenate([jnp.zeros((T, 1), jnp.int32), delta], axis=1)
    pos = jnp.arange(N + 1, dtype=jnp.int32)[None, :]

    # overshoot cost, f32 floor as in the reference (search.rs:1274-1282)
    ov = jnp.floor(
        alpha * jnp.maximum(pos - text_end[:, None], 0).astype(jnp.float32)
    ).astype(jnp.int32)
    ov_prev = jnp.floor(
        alpha * jnp.maximum(pos - 1 - text_end[:, None], 0).astype(jnp.float32)
    ).astype(jnp.int32)
    c = c + ov
    delta = delta + (ov - ov_prev)

    valid = (pos > valid_from[:, None]) & (pos <= valid_to[:, None])
    if all_minima:
        mask = valid & (c <= k)
    else:
        enc = jnp.where(delta > 0, 2 * pos + 1, jnp.where(delta < 0, 2 * pos, -1))
        m2 = jax.lax.cummax(enc, axis=1)
        d = (m2 < 0) | ((m2 & 1) == 0)
        delta_next = jnp.concatenate(
            [delta[:, 1:], jnp.ones((T, 1), jnp.int32)], axis=1
        )
        next_gt = (delta_next >= 1) | (pos == islast_at[:, None])
        mask = valid & (c <= k) & next_gt & d

    tile_ids = jnp.arange(T, dtype=jnp.int32)[:, None]
    posenc = tile_ids * (N + 1) + pos
    return compact_packed(
        jax, jnp, mask.reshape(-1), posenc.reshape(-1), c.reshape(-1), cap, bcap
    )
