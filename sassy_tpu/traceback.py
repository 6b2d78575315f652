"""Windowed DP re-fill and greedy CIGAR traceback.

Mirrors the reference's candidate post-processing: each candidate end
position gets a text window ``[end - (m+k), end)``; the DP is re-computed
over the window and a greedy backwards walk extracts the alignment
(/root/reference/src/search.rs:1372-1689 ``process_matches`` +
/root/reference/src/trace.rs:273-406 ``get_trace``).

Op preference is fixed: Match, then (after spending one edit) Sub, then Del
(consumes text), then Ins (consumes pattern) — trace.rs:338-365, pinned by
reference PR#46.

The window DP always uses the overhang-discounted left boundary when alpha
is set, even for windows that don't start at the text start — harmless
because for such windows the left column is only reachable at j=0
(trace.rs:141-146 note), and it matches the reference bit-for-bit.
"""

from __future__ import annotations

import numpy as np

from .cigar import DEL, INS, MATCH, SUB, Cigar
from .matchrec import Match, Strand
from .oracle import dp_matrix
from .profiles import Profile, as_bytes_array
from .semantics import overshoot_cost

__all__ = ["trace_candidate", "trace_candidates_batch", "TraceError"]


class TraceError(RuntimeError):
    """Raised when no backward step is consistent — the reference panics here
    with an invalid-alphabet hint (trace.rs:367-387)."""


def _fill_batch(
    profile: Profile,
    pattern_codes: np.ndarray,
    wins: np.ndarray,  # (B, w) engine codes, right-padded
    alpha: float | None,
    max_overhang: int | None,
) -> np.ndarray:
    """Batched windowed DP fill: one vectorized pass over all B windows.

    The role of the reference's ``simd_fill`` (trace.rs:107-178): candidate
    windows are re-filled together so the fill cost amortizes over the
    batch instead of paying the per-row dispatch overhead per candidate.
    Right-padding is harmless — each candidate's walk only reads columns
    up to its own window length.
    """
    from .semantics import left_boundary_costs

    B, w = wins.shape
    m = len(pattern_codes)
    boundary = left_boundary_costs(m, alpha, max_overhang)
    # (m, B*w) -> (B, m, w)
    mm = (
        profile.match_mask(pattern_codes, wins.reshape(-1))
        .reshape(m, B, w)
        .transpose(1, 0, 2)
    )
    D = np.zeros((B, m + 1, w + 1), dtype=np.int64)
    D[:, :, 0] = boundary[None, :]
    idx = np.arange(w + 1, dtype=np.int64)
    base = np.empty((B, w + 1), dtype=np.int64)
    for j in range(1, m + 1):
        prev = D[:, j - 1]
        base[:, 0] = boundary[j]
        np.minimum(prev[:, :-1] + (1 - mm[:, j - 1]), prev[:, 1:] + 1,
                   out=base[:, 1:])
        D[:, j] = np.minimum.accumulate(base - idx, axis=1) + idx
    return D


def trace_candidates_batch(
    profile: Profile,
    pattern: np.ndarray,
    pattern_codes: np.ndarray,
    text: np.ndarray,
    ends: list[int],
    fill_len: int,
    alpha: float | None,
    max_overhang: int | None,
) -> list[Match]:
    """Re-align and trace a batch of candidate end positions in ONE fill.

    The reference's ``process_matches`` batches LANES candidates per
    ``simd_fill`` (search.rs:1372-1689, trace.rs:107-178); here the batch is
    all candidates of the (pattern, text) pair — the windowed DP matrices
    are computed together (vectorized over the batch axis), then each
    candidate's greedy walk reads its own precomputed matrix.
    """
    if not ends:
        return []
    m = len(pattern)
    n = len(text)
    w = fill_len
    B = len(ends)
    wins = np.full((B, w), profile.pad_code, dtype=np.uint8)
    offsets = []
    wlens = []
    for b, end_pos in enumerate(ends):
        offset = max(0, end_pos - fill_len)
        win_end = min(end_pos, n)
        wl = win_end - offset
        # encode per-window: encoding the whole text here would cost
        # O(n) per (pattern, text) pair at genome scale
        wins[b, :wl] = profile.encode(text[offset:win_end])
        offsets.append(offset)
        wlens.append(wl)
    D = _fill_batch(profile, pattern_codes, wins, alpha, max_overhang)
    out = []
    for b, end_pos in enumerate(ends):
        wtext = text[offsets[b] : offsets[b] + wlens[b]]
        out.append(
            _walk(
                profile, pattern, wtext, D[b], end_pos, offsets[b],
                wlens[b], alpha, max_overhang,
            )
        )
    return out


def trace_candidate(
    profile: Profile,
    pattern: np.ndarray,
    pattern_codes: np.ndarray,
    text: np.ndarray,
    end_pos: int,
    fill_len: int,
    alpha: float | None,
    max_overhang: int | None,
) -> Match:
    """Re-align and trace one candidate end position.

    Args:
        pattern/text: raw bytes (uint8 arrays) — used for the is_match check.
        pattern_codes: engine codes. The text window is encoded here (only
        the m+k window is touched — the full text is never re-encoded).
        end_pos: candidate end position (may exceed len(text) with overhang).
        fill_len: window length, ``m + k``.

    Returns a Match with coordinates in this text (strand FWD; the caller
    flips RC coordinates).
    """
    n = len(text)
    offset = max(0, end_pos - fill_len)
    win_end = min(end_pos, n)
    win = slice(offset, win_end)
    wtext = text[win]
    wcodes = profile.encode(wtext)
    wlen = win_end - offset

    D = dp_matrix(profile, pattern_codes, wcodes, alpha, max_overhang)
    return _walk(
        profile, pattern, wtext, D, end_pos, offset, wlen, alpha, max_overhang
    )


def _walk(
    profile: Profile,
    pattern: np.ndarray,
    wtext: np.ndarray,
    D: np.ndarray,
    end_pos: int,
    offset: int,
    wlen: int,
    alpha: float | None,
    max_overhang: int | None,
) -> Match:
    """Greedy backwards walk of one windowed cost matrix (trace.rs:273-406)."""
    m = len(pattern)
    j = m
    i = end_pos - offset
    pattern_start = 0
    pattern_end = m

    # End overshoot: walk straight back along the virtual 'N' diagonal
    # (trace.rs:300-312).
    if i > wlen:
        overshoot = i - wlen
        pattern_end -= overshoot
        oc = overshoot_cost(alpha, overshoot)
        i -= overshoot
        j -= overshoot
        g = int(D[j, i])
        total_cost = g + oc
    else:
        g = int(D[j, i])
        total_cost = g

    cigar = Cigar()
    while True:
        if j == 0:
            break
        if i == 0 and alpha is not None:
            # Start overshoot: remaining pattern prefix hangs off the text
            # start (trace.rs:322-335).
            pattern_start = j
            if max_overhang is not None:
                oc = int(
                    np.floor(np.float32(min(j, max_overhang)) * np.float32(alpha))
                ) + max(0, j - max_overhang)
            else:
                oc = int(np.floor(np.float32(j) * np.float32(alpha)))
            g -= oc
            break

        if i > 0 and D[j - 1, i - 1] == g and profile.is_match(
            int(pattern[j - 1]), int(wtext[i - 1])
        ):
            cigar.push(MATCH)
            j -= 1
            i -= 1
            continue
        g -= 1
        if i > 0 and D[j - 1, i - 1] == g:
            cigar.push(SUB)
            j -= 1
            i -= 1
            continue
        if i > 0 and D[j, i - 1] == g:
            cigar.push(DEL)
            i -= 1
            continue
        if D[j - 1, i] == g:
            cigar.push(INS)
            j -= 1
            continue

        _raise_trace_error(profile, pattern, wtext, j, i, g)

    if g != 0:
        raise TraceError(f"remaining cost after trace must be 0, got {g}")

    cigar.reverse()
    return Match(
        pattern_idx=0,
        text_idx=0,
        cost=total_cost,
        text_start=offset + i,
        text_end=offset + wlen,
        pattern_start=pattern_start,
        pattern_end=pattern_end,
        strand=Strand.FWD,
        cigar=cigar,
    )


def _raise_trace_error(profile, pattern, wtext, j, i, g):
    pat_ch = int(pattern[j - 1])
    if not profile.valid_seq(as_bytes_array(bytes([pat_ch]))):
        raise TraceError(
            f"trace failed: pattern contains non-{profile.name} character "
            f"{chr(pat_ch)!r} at position {j - 1} "
            f"(use the Iupac profile instead of Dna)"
        )
    if i > 0:
        txt_ch = int(wtext[i - 1])
        if not profile.valid_seq(as_bytes_array(bytes([txt_ch]))):
            raise TraceError(
                f"trace failed: text contains non-{profile.name} character "
                f"{chr(txt_ch)!r} at position {i - 1} "
                f"(use the Iupac profile instead of Dna)"
            )
    raise TraceError(f"trace failed: no ancestor of ({j}, {i}) at distance {g + 1}")
