"""Portable bit-parallel search engine (pure jnp — runs on CPU and TPU).

This is the TPU-native re-design of the reference's Myers'99 bit-parallel DP
(/root/reference/src/bitpacking.rs:63-85, transposed formulation of
search.rs:1074-1199): the 32 bits of a u32 word span 32 consecutive *text*
positions; the DP iterates over pattern rows per word and over words
sequentially, carrying the per-row horizontal deltas (hp/hm) between words.

Parallelism is the direct generalization of sassy's chunking
(search.rs:1018-1070): the text is split into T tiles of W words; each tile
re-runs the DP from scratch starting ``halo = ceil((m+k)/32)`` words before
its owned range, so every owned end position has full left context (any
alignment spans at most m+k text chars). Tile 0 carries the true text-start
boundary (overhang alpha-init); all other tiles use the plain cost-j
boundary, which never underestimates. Ownership intervals make dedup trivial
(the reference's prune_lane_overlaps, search.rs:1202-1240, becomes a static
gather).

Output: per-position costs of the best alignment ending at each position —
identical to the NumPy oracle's last DP row.
"""

from __future__ import annotations

from functools import partial

import numpy as np

from .. import semantics
from ..profiles import Profile
from .bitpack import WORD_BITS, pack_planes_np, pattern_plane_masks_np

__all__ = ["XlaEngine", "end_costs_xla"]


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _next_pow2(x: int) -> int:
    return 1 << max(0, (x - 1).bit_length())


def _bucket_rows(m: int) -> int:
    """Bucketed pattern-row count: multiples of 16 up to 128, then 64."""
    if m <= 128:
        return max(16, _cdiv(m, 16) * 16)
    return _cdiv(m, 64) * 64


# ---------------------------------------------------------------------------
# jitted kernels (built lazily so importing never initializes JAX)

_JIT_CACHE: dict = {}


def _get_kernels():
    if "scan" in _JIT_CACHE:
        return _JIT_CACHE["scan"], _JIT_CACHE["assemble"]

    import jax
    import jax.numpy as jnp

    @partial(jax.jit, static_argnames=("eq_mode",))
    def scan_tiles(planes_win, pmasks, is_pad, hp0, hm0, cost0, eq_mode):
        """Run the bit-parallel DP over all tiles in lockstep.

        Args:
            planes_win: (NW, P, T) uint32 — per-word text planes per tile.
            pmasks: (M, Pp) uint32 — per-pattern-row plane masks. M may be a
                bucketed (padded) row count: pad rows match everything and
                carry h-delta 0, which leaves the DP invariant (they copy the
                row above), so one compiled kernel serves all m <= M.
            is_pad: (M,) uint32 — all-ones for pad rows (used in ascii mode,
                where "match everything" is not expressible via bit-compare).
            hp0/hm0: (M, T) uint32 — initial horizontal deltas (tile 0 may
                carry the overhang alpha pattern).
            cost0: (T,) int32 — last-row cost at each tile's DP start.
            eq_mode: "iupac" or "ascii".

        Returns:
            vp_w, vm_w: (NW, T) uint32 — last-row ±delta words.
            cost_w: (NW, T) int32 — last-row cost at each word's start.
        """
        n_planes = planes_win.shape[1]
        full = jnp.uint32(0xFFFFFFFF)

        def word_step(carry, planes_w):
            hp, hm, cost = carry  # (M,T),(M,T),(T,)

            def row_step(v, row):
                vp, vm = v
                hp_j, hm_j, pmask, pad_j = row  # (T,),(T,),(Pp,),()
                # pad rows (pad_j all-ones) match unconditionally — even at
                # code-0 ('X') text positions — so they copy the row above.
                if eq_mode == "iupac":
                    eq = pad_j
                    for p in range(n_planes):
                        eq = eq | (planes_w[p] & pmask[p])
                else:  # ascii: equality of all 8 bits, gated by validity plane
                    acc = jnp.uint32(0)
                    for p in range(n_planes - 1):
                        acc = acc | (planes_w[p] ^ pmask[p])
                    valid = planes_w[n_planes - 1]
                    eq = ((~acc) & valid) | pad_j
                # Myers step (bitpacking.rs:63-85 semantics, 32-bit words)
                vx = eq | vm
                eqh = eq | hm_j
                hx = (((eqh & vp) + vp) ^ vp) | eqh
                hp_out = vm | (~(hx | vp) & full)
                hm_out = vp & hx
                hp_carry = hp_out >> 31
                hm_carry = hm_out >> 31
                hp_sh = (hp_out << 1) | hp_j
                hm_sh = (hm_out << 1) | hm_j
                vp_new = hm_sh | (~(vx | hp_sh) & full)
                vm_new = hp_sh & vx
                return (vp_new, vm_new), (hp_carry, hm_carry)

            zero = jnp.zeros(hp.shape[1], dtype=jnp.uint32)
            (vp, vm), (hp_new, hm_new) = jax.lax.scan(
                row_step, (zero, zero), (hp, hm, pmasks, is_pad)
            )
            pc = jax.lax.population_count
            new_cost = (
                cost
                + pc(vp).astype(jnp.int32)
                - pc(vm).astype(jnp.int32)
            )
            return (hp_new, hm_new, new_cost), (vp, vm, cost)

        (_, _, _), (vp_w, vm_w, cost_w) = jax.lax.scan(
            word_step, (hp0, hm0, cost0), planes_win
        )
        return vp_w, vm_w, cost_w

    @partial(jax.jit, static_argnames=("w_owned",))
    def assemble_costs(vp_w, vm_w, cost_w, off, w_owned):
        """Expand owned delta words into per-position costs.

        off: (T,) int32 — index of the first owned word in each tile's window.
        Returns (T * w_owned * 32,) int32 — cost at global positions 1..N.
        """
        idx = off[None, :] + jnp.arange(w_owned, dtype=jnp.int32)[:, None]  # (W,T)
        vp = jnp.take_along_axis(vp_w, idx.astype(jnp.int32), axis=0)
        vm = jnp.take_along_axis(vm_w, idx.astype(jnp.int32), axis=0)
        cw = jnp.take_along_axis(cost_w, idx.astype(jnp.int32), axis=0)
        bit = jnp.arange(WORD_BITS, dtype=jnp.uint32)
        vp_b = ((vp[..., None] >> bit) & 1).astype(jnp.int32)
        vm_b = ((vm[..., None] >> bit) & 1).astype(jnp.int32)
        csum = jnp.cumsum(vp_b - vm_b, axis=-1)
        pos = cw[..., None] + csum  # (W, T, 32)
        return pos.transpose(1, 0, 2).reshape(-1)

    _JIT_CACHE["scan"] = scan_tiles
    _JIT_CACHE["assemble"] = assemble_costs
    return scan_tiles, assemble_costs


# ---------------------------------------------------------------------------


def _plan(total_words: int, halo: int, target_tiles: int = 256):
    """Pick (T, W) tile layout: W large enough to amortize the halo re-scan,
    T capped so tiny texts stay single-tile."""
    min_w = max(4 * halo, 16)
    W = max(min_w, _cdiv(total_words, target_tiles))
    T = max(1, _cdiv(total_words, W))
    if T == 1:
        return 1, total_words, 0
    return T, W, halo


def end_costs_padded(
    profile: Profile,
    pattern_codes: np.ndarray,
    text_codes: np.ndarray,
    alpha,
    max_overhang,
    n_positions: int,
    k: int,
) -> np.ndarray:
    """Costs at end positions 0..n_positions (inclusive) via the XLA engine.

    ``text_codes`` must already include any overhang padding. ``k`` sizes the
    halo: every owned position needs m+k chars of left context.
    """
    import jax.numpy as jnp

    scan_tiles, assemble_costs = _get_kernels()

    m = len(pattern_codes)
    boundary = semantics.left_boundary_costs(m, alpha, max_overhang)
    boundary_m = int(boundary[-1])

    total_words = max(1, _cdiv(n_positions, WORD_BITS))
    # bucket everything that affects compiled shapes to limit recompiles
    total_words = _next_pow2(total_words)
    m_bucket = _bucket_rows(m)
    n_pad_rows = m_bucket - m
    halo = _next_pow2(_cdiv(m_bucket + k, WORD_BITS))
    T, W, halo = _plan(total_words, halo)
    NW = halo + W
    GW = max(T * W, NW)

    eq_mode = profile.eq_mode
    planes = pack_planes_np(text_codes, profile.planes, GW)
    if eq_mode == "ascii":
        valid = np.zeros(GW * WORD_BITS, dtype=np.uint8)
        valid[: len(text_codes)] = 1
        vplane = pack_planes_np(valid, 1, GW)
        planes = np.concatenate([planes, vplane], axis=0)

    # per-tile windows: (NW, P, T)
    ws = np.maximum(0, np.arange(T) * W - halo)  # (T,)
    widx = ws[None, :] + np.arange(NW)[:, None]  # (NW, T)
    planes_win = planes[:, widx].transpose(1, 0, 2)  # (NW, P, T)

    # Pattern rows padded at the top to the bucket: pad rows match everything
    # and carry h-delta 0, leaving the DP invariant.
    pm_real = pattern_plane_masks_np(pattern_codes, profile.planes, eq_mode)
    pad_fill = 0xFFFFFFFF if eq_mode == "iupac" else 0
    pmasks = np.vstack(
        [
            np.full((n_pad_rows, profile.planes), pad_fill, dtype=np.uint32),
            pm_real,
        ]
    )
    is_pad = np.zeros(m_bucket, dtype=np.uint32)
    is_pad[:n_pad_rows] = 0xFFFFFFFF

    h_init = semantics.init_h_deltas(m, alpha, max_overhang).astype(np.uint32)
    hp0 = np.ones((m_bucket, T), dtype=np.uint32)
    hp0[:n_pad_rows, :] = 0
    hp0[n_pad_rows:, 0] = h_init
    hm0 = np.zeros((m_bucket, T), dtype=np.uint32)
    cost0 = np.full((T,), m, dtype=np.int32)
    cost0[0] = boundary_m

    vp_w, vm_w, cost_w = scan_tiles(
        jnp.asarray(planes_win),
        jnp.asarray(pmasks),
        jnp.asarray(is_pad),
        jnp.asarray(hp0),
        jnp.asarray(hm0),
        jnp.asarray(cost0),
        eq_mode,
    )
    off = np.full((T,), halo, dtype=np.int32)
    off[0] = 0
    flat = assemble_costs(vp_w, vm_w, cost_w, jnp.asarray(off), W)
    flat = np.asarray(flat)[:n_positions]
    return np.concatenate([[boundary_m], flat]).astype(np.int64)


def end_costs_xla(
    profile: Profile,
    pattern_codes: np.ndarray,
    text_codes: np.ndarray,
    alpha,
    max_overhang,
    k: int,
) -> np.ndarray:
    """Costs 0..len(text_codes) — comparable to oracle.end_costs."""
    return end_costs_padded(
        profile, pattern_codes, text_codes, alpha, max_overhang, len(text_codes), k
    )


class XlaEngine:
    """Engine adapter: bit-parallel costs + shared candidate selection."""

    name = "xla"

    def candidates(
        self,
        profile: Profile,
        pattern_codes: np.ndarray,
        text_codes: np.ndarray,
        k: int,
        alpha,
        max_overhang,
        all_minima: bool,
    ):
        m = len(pattern_codes)
        n = len(text_codes)
        steps = semantics.overhang_steps(m, k, alpha, max_overhang)
        if steps:
            pad = np.full(steps, profile.overhang_pad_code, dtype=np.uint8)
            padded = np.concatenate([text_codes, pad])
        else:
            padded = text_codes
        costs = end_costs_padded(
            profile, pattern_codes, padded, alpha, max_overhang, n + steps, k
        )
        total = costs + semantics.overshoot_costs_vec(
            alpha, np.arange(len(costs), dtype=np.int64) - n
        )
        return semantics.find_candidates(total, k, all_minima)


def _register():
    from ..search import register_engine

    register_engine("xla", XlaEngine)


_register()
