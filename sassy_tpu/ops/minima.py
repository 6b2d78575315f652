"""Device-side candidate end-position extraction.

jnp port of :func:`sassy_tpu.semantics.find_candidates` (which is itself the
vectorized form of the reference's sequential minima scan,
search.rs:1286-1369): computes total costs (DP cost + overshoot), applies the
rightmost-local-minima or all-minima rule, and compacts the hits into a
fixed-capacity (positions, costs, count) buffer so only O(matches) bytes ever
leave the device.
"""

from __future__ import annotations

from functools import partial

_JIT = {}

#: Large sentinel added to positions beyond max_pos so the plateau logic sees
#: a strictly increasing tail (triggers the trailing-minimum rule at max_pos).
_BIG = 1 << 28


def get_postprocess():
    if "post" in _JIT:
        return _JIT["post"]

    import jax
    import jax.numpy as jnp

    @partial(jax.jit, static_argnames=("all_minima", "cap"))
    def postprocess(
        flat_costs,  # (N,) int32 — DP costs at positions 1..N (from assemble)
        boundary_m,  # () int32 — DP cost at position 0
        n_text,  # () int32 — true text length (overshoot starts after)
        max_pos,  # () int32 — last valid end position (n + overhang steps)
        k,  # () int32
        alpha,  # () float32 — 0.0 when no overhang (overshoot adds nothing
        #            then because positions > n are masked by max_pos == n)
        all_minima: bool,
        cap: int,
    ):
        c = jnp.concatenate([boundary_m[None].astype(jnp.int32), flat_costs])
        P1 = c.shape[0]  # positions 0..P1-1
        pos = jnp.arange(P1, dtype=jnp.int32)

        # total cost incl. overshoot (f32 floor, matching the reference)
        over = jnp.maximum(pos - n_text, 0).astype(jnp.float32)
        c = c + jnp.floor(alpha * over).astype(jnp.int32)

        in_range = pos <= max_pos
        # strictly-increasing tail beyond max_pos
        c_eff = jnp.where(in_range, c, _BIG + pos)

        if all_minima:
            mask = in_range & (c_eff <= k)
        else:
            cn = jnp.concatenate([c_eff[1:], c_eff[-1:] + 1])
            diff = jnp.concatenate(
                [jnp.ones(1, dtype=bool), c_eff[1:] != c_eff[:-1]]
            )
            ps = jax.lax.cummax(jnp.where(diff, pos, 0))
            prev_cost = c_eff[jnp.maximum(ps - 1, 0)]
            d = (ps == 0) | (prev_cost > c_eff)
            mask = in_range & (c_eff <= k) & (cn > c_eff) & d

        count = jnp.sum(mask.astype(jnp.int32))
        slot = jnp.cumsum(mask.astype(jnp.int32)) - 1
        slot = jnp.where(mask, slot, cap)  # out-of-range -> dropped
        out_pos = jnp.full((cap,), -1, dtype=jnp.int32)
        out_cost = jnp.zeros((cap,), dtype=jnp.int32)
        out_pos = out_pos.at[slot].set(pos, mode="drop")
        out_cost = out_cost.at[slot].set(c_eff, mode="drop")
        return out_pos, out_cost, count

    _JIT["post"] = postprocess
    return postprocess
