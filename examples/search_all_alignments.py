"""Enumerate every sufficiently-distinct alignment per match end
(/root/reference/examples/search_all_alignments.rs analog)."""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from sassy_tpu import Searcher, profiles  # noqa: E402

BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


def main():
    rng = np.random.default_rng(3)
    text = bytes(rng.choice(BASES, size=5000))
    pattern = text[1200:1224]  # guaranteed exact hit + nearby variants

    s = Searcher(profiles.Iupac(), rc=True)
    groups = s.search_all_alignments(pattern, text, k=2)
    print(f"{len(groups)} end-position groups")
    for g in groups[:5]:
        first = g[0]
        print(
            f"  anchor {first.text_start}-{first.text_end} "
            f"({len(g)} alignments): "
            + ", ".join(m.cigar.to_string() for m in g[:4])
        )


if __name__ == "__main__":
    main()
