"""All-vs-all barcode comparison via encoded patterns
(/root/reference/examples/all_vs_all_barcodes.rs analog): semi-global
alignment of every barcode against every other.
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from sassy_tpu import Searcher, profiles  # noqa: E402

BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


def main():
    rng = np.random.default_rng(7)
    barcodes = [bytes(rng.choice(BASES, size=24)) for _ in range(64)]
    k = 4

    s = Searcher(profiles.Iupac(), rc=False)
    matches = s.search_many(barcodes, barcodes, k)
    hits = [
        (m.pattern_idx, m.text_idx, m.cost)
        for m in matches
        if m.pattern_idx != m.text_idx
    ]
    print(f"{len(barcodes)} barcodes, k={k}: {len(hits)} cross matches")
    for pi, ti, cost in hits[:10]:
        print(f"  barcode {pi} ~ barcode {ti} (cost {cost})")


if __name__ == "__main__":
    main()
