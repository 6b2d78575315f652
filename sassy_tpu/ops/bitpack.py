"""Text bit-plane packing.

The engines represent the text as P bit-planes of packed u32 words:
``plane[p] bit (32*w + i)`` = bit ``p`` of the engine code of text char
``32*w + i`` (LSB-first within each word, matching the carry direction of the
bit-parallel DP step).

For DNA/IUPAC, P=4 (the IUPAC base-set bits A/C/T/G): the Eq word for a
pattern char with code ``c`` is ``OR_{p in c} plane[p]`` — equality by
construction of the reference's matching rule ``code1 & code2 != 0``
(/root/reference/src/profiles/iupac.rs:136-138), without per-block Eq table
construction or gathers.

For ASCII, P=8 (the bits of the folded byte) plus one validity plane; the Eq
word is ``valid & ~OR_p(plane[p] ^ splat(pattern_bit_p))`` — bytes equal iff
no bit differs.
"""

from __future__ import annotations

import numpy as np

__all__ = ["pack_planes_np", "pattern_plane_masks_np", "WORD_BITS"]

WORD_BITS = 32


def pack_planes_np(codes: np.ndarray, planes: int, total_words: int) -> np.ndarray:
    """Pack per-char codes into (planes, total_words) uint32 bit-planes.

    ``codes`` may be shorter than ``total_words * 32``; the tail is zero
    (plane bits 0 = matches nothing in IUPAC mode, invalid in ASCII mode).
    """
    n = len(codes)
    padded = np.zeros(total_words * WORD_BITS, dtype=np.uint8)
    padded[:n] = codes
    # (total_words, 32) bit matrix per plane; np.packbits is C-speed
    # (an integer matmul has no BLAS path and runs ~50x slower)
    bits = padded.reshape(total_words, WORD_BITS)
    out = np.empty((planes, total_words), dtype=np.uint32)
    for p in range(planes):
        pb = np.packbits((bits >> p) & 1, axis=-1, bitorder="little")
        out[p] = pb.view(np.uint32).reshape(total_words)
    return out


def pattern_plane_masks_np(
    pattern_codes: np.ndarray, planes: int, eq_mode: str
) -> np.ndarray:
    """(m, planes) uint32 per-row masks.

    iupac mode: mask[j, p] = all-ones iff bit p set in pattern code j.
    ascii mode: mask[j, p] = all-ones iff bit p set (XOR-compare splat).
    """
    m = len(pattern_codes)
    out = np.zeros((m, planes), dtype=np.uint32)
    for p in range(planes):
        bit = (pattern_codes.astype(np.uint32) >> p) & 1
        out[:, p] = np.where(bit == 1, np.uint32(0xFFFFFFFF), np.uint32(0))
    del eq_mode  # same representation for both modes
    return out
