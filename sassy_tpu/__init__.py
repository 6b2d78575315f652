"""sassy_tpu: TPU-native approximate string matching.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the
reference `sassy` library (RagnarGrootKoerkamp/sassy): find all locations in
a text where a short pattern aligns with edit distance <= k, for DNA / IUPAC
/ ASCII alphabets, with reverse-complement search, overhang alignments,
N-fraction filtering, and CIGAR traceback.

Public API mirrors the reference's (src/lib.rs:151-165 re-exports):

    from sassy_tpu import Searcher, Match, Strand, profiles

    searcher = Searcher(profiles.Iupac(), rc=False)
    matches = searcher.search(b"ATCG", b"AAAATTGAAA", k=1)
"""

from . import profiles
from .cigar import Cigar
from .matchrec import UNKNOWN, Match, Strand
from .search import CachedRev, EncodedPatterns, SearchMode, Searcher

__all__ = [
    "Searcher",
    "Match",
    "Strand",
    "Cigar",
    "CachedRev",
    "EncodedPatterns",
    "SearchMode",
    "UNKNOWN",
    "profiles",
]

__version__ = "0.1.0"
