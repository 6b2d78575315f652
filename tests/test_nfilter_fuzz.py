"""N-filter fuzz: the reference's 100k-case don't-crash fuzz
(/root/reference/src/n_filter.rs:126-160: plen 4..=20, tlen plen..=plen+10,
k 0..=3, bases NACGT incl. dense N, rc + alpha=0.5 + random max_n_frac,
both v1 search_all and v2 search_all_encoded_patterns).

Strengthened beyond don't-crash: every returned match must satisfy
cost <= k and the exact matched-region N-fraction bound
(n_filter.rs:58-60) — ground-truth invariants, checked per match.

The fast-lane version runs a few thousand cases; the full 100k-case run
is marked `soak` (nightly lane: pytest -m soak).
"""

import numpy as np
import pytest

from sassy_tpu import Searcher, profiles
from sassy_tpu.nfilter import check_n_fraction

NBASES = np.frombuffer(b"NACGT", dtype=np.uint8)


def _run_cases(n_cases: int, seed: int, engine: str = "numpy"):
    rng = np.random.default_rng(seed)
    prof = profiles.Iupac()
    max_n_frac = float(rng.uniform(0.0, 1.0))
    s = Searcher(prof, rc=True, alpha=0.5, engine=engine)
    s.set_max_n_frac(max_n_frac)
    for case in range(n_cases):
        plen = int(rng.integers(4, 21))
        tlen = int(rng.integers(plen, plen + 11))
        k = int(rng.integers(0, 4))
        # bases[0..4) as in the reference (dense N: index 0..3 of NACGT)
        pat = bytes(rng.choice(NBASES[:4], size=plen))
        text = np.array(rng.choice(NBASES[:4], size=tlen), dtype=np.uint8)
        ms = s.search_all(pat, text, k)
        enc = s.encode_patterns([pat])
        ms2 = s.search_all_encoded_patterns(enc, bytes(text), k)
        for m in ms + ms2:
            assert m.cost <= k, (case, pat, bytes(text), k, m)
            assert check_n_fraction(
                text, m.text_start, m.text_end, max_n_frac
            ), (case, pat, bytes(text), k, max_n_frac, m)
        # occasionally rotate the threshold like fresh fuzz seeds would
        if case % 500 == 499:
            max_n_frac = float(rng.uniform(0.0, 1.0))
            s.set_max_n_frac(max_n_frac)


def test_nfilter_fuzz_fast():
    _run_cases(2000, 42)


@pytest.mark.soak
@pytest.mark.slow
def test_nfilter_fuzz_100k():
    # the reference's full scale (n_filter.rs:135: 100_000 iterations)
    for shard in range(10):
        _run_cases(10_000, 1000 + shard)
