"""High-level search API: the :class:`Searcher`.

Mirrors the reference's ``Searcher`` surface (/root/reference/src/search.rs:
358-784): ``search``, ``search_all``, ``search_with_fn``, ``search_texts``,
``search_patterns``, ``search_many``, overhang (``alpha``), reverse
complement, ``only_best_match``, ``without_trace``, ``max_n_frac``.

Architecture (TPU-first, not a port): a pluggable *engine* computes, for one
(pattern, text, strand), the candidate end positions with their costs — the
NumPy oracle engine for CPU correctness, the XLA bit-parallel engine
portably, and the Pallas TPU kernel for speed. All shared semantics
(overhang math, minima rule, filters, traceback) live in one place
(:mod:`semantics`, :mod:`nfilter`, :mod:`traceback`), so every engine
produces identical matches.

Reverse-complement handling follows the reference exactly
(search.rs:787-881): search the *complemented* pattern against the
*reversed* text, then map positions back to forward coordinates
(``text_start = len - rc_end``), keeping the CIGAR in pattern direction.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from . import oracle, semantics
from .matchrec import UNKNOWN, Match, Strand
from .nfilter import satisfy_n_endpoint_filter, traced_satisfy_n_frac
from .profiles import Profile, as_bytes_array
from .traceback import trace_candidate, trace_candidates_batch

__all__ = [
    "Searcher",
    "CachedRev",
    "NumpyEngine",
    "SearchMode",
    "EncodedPatterns",
]


class EncodedPatterns:
    """A pre-validated batch of equal-length patterns for repeated batched
    searching (the v2 ``EncodedPatterns`` surface, reference
    general.rs:133-196 / search.rs:404-410). The reference caps v2 patterns
    at 64bp (general.rs:286-291); this engine has no such limit — longer
    patterns are accepted as an extension."""

    def __init__(self, profile, patterns, include_rc: bool,
                 rc_anchor: str = "start"):
        self.patterns = [as_bytes_array(p) for p in patterns]
        lens = {len(p) for p in self.patterns}
        if len(lens) > 1:
            raise ValueError("encode_patterns requires equal-length patterns")
        self.pattern_len = lens.pop() if lens else 0
        self.include_rc = include_rc
        self.profile = profile
        #: RC match anchor: "start" (the v2 engine's semantics — RC(pattern)
        #: searched on the FORWARD text, at most one match per fwd *end*
        #: position = per RC-match start; reference lib.rs:33-40) or "end"
        #: (v1 native-RC semantics — pattern vs RC(text), one match per
        #: RC-text end). "start" is the default because this is the v2 API
        #: surface and the reference's v2 engine always behaves this way;
        #: its differential fuzz (pattern_tiling/search.rs:770-780) emulates
        #: the same semantics on the v1 side via search(rc(pattern), text),
        #: so fuzz equality never constrains v1-native RC. See
        #: tests/reference_pinned/test_rc_anchor_settled.py.
        if rc_anchor not in ("end", "start"):
            raise ValueError("rc_anchor must be 'end' or 'start'")
        self.rc_anchor = rc_anchor

    @property
    def n_original(self) -> int:
        return len(self.patterns)


class SearchMode:
    """Batching strategies for :meth:`Searcher.search_many`
    (reference search.rs:317-344). The TPU engines batch internally, so these
    are accepted for API compatibility and treated as hints."""

    SINGLE = "single"
    BATCH_PATTERNS = "batch_patterns"
    BATCH_TEXTS = "batch_texts"
    BATCH_PATTERNS_SHORT = "batch_patterns_short"
    AUTO = "auto"


class CachedRev:
    """Text wrapper that precomputes the reversed text once
    (reference search.rs:144-166). Note: *reversed*, not reverse-complemented —
    RC search complements the pattern instead."""

    def __init__(self, text, cache: bool = True):
        self.fwd = as_bytes_array(text)
        self._rev = self.fwd[::-1].copy() if cache else None

    def text(self) -> np.ndarray:
        return self.fwd

    def rev_text(self) -> np.ndarray:
        if self._rev is None:
            return self.fwd[::-1]
        return self._rev


def _as_rc_searchable(text) -> CachedRev:
    if isinstance(text, CachedRev):
        return text
    return CachedRev(text, cache=False)


class NumpyEngine:
    """Reference oracle engine: direct DP (see :mod:`oracle`)."""

    name = "numpy"

    def candidates(
        self,
        profile: Profile,
        pattern_codes: np.ndarray,
        text: np.ndarray,
        k: int,
        alpha: float | None,
        max_overhang: int | None,
        all_minima: bool,
    ) -> list[tuple[int, int]]:
        text_codes = profile.encode(text)
        m = len(pattern_codes)
        n = len(text_codes)
        steps = semantics.overhang_steps(m, k, alpha, max_overhang)
        if steps:
            pad = np.full(steps, profile.overhang_pad_code, dtype=np.uint8)
            padded = np.concatenate([text_codes, pad])
        else:
            padded = text_codes
        costs = oracle.end_costs(profile, pattern_codes, padded, alpha, max_overhang)
        total = costs + semantics.overshoot_costs_vec(
            alpha, np.arange(len(costs), dtype=np.int64) - n
        )
        return semantics.find_candidates(total, k, all_minima)


_ENGINES = {"numpy": NumpyEngine}


def register_engine(name: str, factory) -> None:
    _ENGINES[name] = factory


def _load_device_engines() -> None:
    """Device engines register themselves on import (lazy: keeps plain
    oracle usage free of any JAX import)."""
    for mod in ("myers_pallas", "myers_xla"):
        try:
            __import__(f"{__package__}.ops.{mod}")
        except ImportError:
            pass


def make_engine(name: str):
    if name not in _ENGINES:
        _load_device_engines()
    if name == "auto":
        for candidate in ("pallas", "xla", "numpy"):
            if candidate in _ENGINES:
                try:
                    return _ENGINES[candidate]()
                except Exception:
                    continue
        raise RuntimeError("no search engine available")
    return _ENGINES[name]()


@dataclass
class _StrandInput:
    """One (pattern, text) pair on one strand, plus its output indices."""

    pattern: np.ndarray
    text: np.ndarray
    pattern_idx: int
    text_idx: int


class Searcher:
    """Approximate string searcher.

    Args:
        profile: alphabet profile (``Dna()``, ``Iupac()``, ``Ascii()``).
        rc: also search the reverse-complement strand.
        alpha: overhang cost per char (enables overhang alignments;
            requires a profile with ``supports_overhang``), in [0, 1].
        engine: "numpy", "xla", "pallas", or "auto".
    """

    def __init__(
        self,
        profile: Profile | str,
        rc: bool = False,
        alpha: float | None = None,
        engine: str = "auto",
        max_n_frac: float | None = None,
    ):
        if isinstance(profile, str):
            # string alphabets as in the reference Python binding
            # (python.rs:27-63); ascii has no reverse complement, so rc is
            # forced off (python.rs:41).
            from .profiles import get_profile

            profile = get_profile(profile)
            if profile.name == "ascii":
                rc = False
        if alpha is not None:
            self._overhang_check(profile, alpha)
        self.profile = profile
        self.rc = rc
        self.alpha = alpha
        self.only_best_match_flag = False
        self.without_trace_flag = False
        self.max_overhang: int | None = None
        self.max_n_frac: float | None = None
        if max_n_frac is not None:
            self.set_max_n_frac(max_n_frac)
        if engine != "auto":
            self.engine = make_engine(engine)
        else:
            # Lazy: resolved on first use so importing this module never
            # initializes JAX.
            self.engine = None
        self._engine_name = engine
        self._batch = None

    # ------------------------------------------------------------------
    # builders (reference search.rs:364-483)

    @staticmethod
    def new_fwd(profile: Profile, **kw) -> "Searcher":
        return Searcher(profile, rc=False, **kw)

    @staticmethod
    def new_rc(profile: Profile, **kw) -> "Searcher":
        return Searcher(profile, rc=True, **kw)

    @staticmethod
    def new_fwd_with_overhang(profile: Profile, alpha: float, **kw) -> "Searcher":
        return Searcher(profile, rc=False, alpha=alpha, **kw)

    @staticmethod
    def new_rc_with_overhang(profile: Profile, alpha: float, **kw) -> "Searcher":
        return Searcher(profile, rc=True, alpha=alpha, **kw)

    @staticmethod
    def _overhang_check(profile: Profile, alpha: float) -> None:
        if not profile.supports_overhang:
            raise ValueError(f"overhang is not supported for profile {profile.name!r}")
        if not (0.0 <= alpha <= 1.0):
            raise ValueError("alpha must be in range 0.0 <= alpha <= 1.0")

    def with_overhang(self, alpha: float) -> "Searcher":
        self._overhang_check(self.profile, alpha)
        self.alpha = alpha
        return self

    def with_max_overhang(self, max_overhang: int | None) -> "Searcher":
        self.max_overhang = max_overhang
        return self

    def only_best_match(self) -> "Searcher":
        self.only_best_match_flag = True
        return self

    def without_trace(self) -> "Searcher":
        self.without_trace_flag = True
        return self

    def with_trace(self) -> "Searcher":
        self.without_trace_flag = False
        return self

    def set_trace(self, trace: bool) -> None:
        self.without_trace_flag = not trace

    def set_max_n_frac(self, max_n_frac: float) -> None:
        # 1.0 disables (reference search.rs:454-460)
        self.max_n_frac = None if max_n_frac == 1.0 else max_n_frac

    def with_max_n_frac(self, max_n_frac: float) -> "Searcher":
        self.set_max_n_frac(max_n_frac)
        return self

    def without_max_n_frac(self) -> "Searcher":
        self.max_n_frac = None
        return self

    # ------------------------------------------------------------------

    def _engine(self):
        if self.engine is None:
            self.engine = make_engine(self._engine_name)
        return self.engine

    # ------------------------------------------------------------------
    # public search API

    def search(self, pattern, text, k: int) -> list[Match]:
        """Matches at rightmost-local-minimum end positions with cost <= k."""
        return self._search_handle_rc(pattern, text, k, all_minima=False)

    def search_all(self, pattern, text, k: int) -> list[Match]:
        """Matches at *all* end positions with cost <= k."""
        return self._search_handle_rc(pattern, text, k, all_minima=True)

    def search_with_fn(
        self, pattern, text, k: int, all_minima: bool, filter_fn
    ) -> list[Match]:
        """Like search/search_all but with an end-position filter.

        ``filter_fn(pattern, text_up_to_end, strand)`` — for RC searches both
        pattern and text are complemented/reversed, exactly as in the
        reference (search.rs:756-784 note).
        """
        return self._search_handle_rc(
            pattern, text, k, all_minima=all_minima, filter_fn=filter_fn
        )

    def search_texts(self, pattern, texts, k: int) -> list[Match]:
        """One pattern against multiple texts; ``text_idx`` set per text."""
        return self._search_many_impl([pattern], texts, k, False)

    def search_all_texts(self, pattern, texts, k: int) -> list[Match]:
        return self._search_many_impl([pattern], texts, k, True)

    def search_patterns(self, patterns, text, k: int) -> list[Match]:
        """Multiple equal-length patterns against one text."""
        lens = {len(as_bytes_array(p)) for p in patterns}
        if len(lens) > 1:
            raise ValueError("search_patterns requires equal-length patterns")
        return self._search_many_impl(patterns, [text], k, False)

    def search_many(
        self,
        patterns,
        texts,
        k: int,
        num_threads: int = 0,
        mode: str = SearchMode.AUTO,
    ) -> list[Match]:
        """Cartesian product search (reference search.rs:531-603). Results in
        (pattern-major, text-minor) order. ``num_threads``/``mode`` are
        accepted for API compatibility; the engines batch internally (one
        fused device dispatch covers the whole product)."""
        del num_threads, mode
        return self._search_many_impl(patterns, texts, k, False)

    # ------------------------------------------------------------------
    # v2-equivalent encoded-pattern API (reference search.rs:404-433,
    # pattern_tiling/general.rs). RC is encoded into the pattern set; the
    # engine searches both strands in the same batch. The reference's v1/v2
    # engines produce identical match sets (fuzz-asserted,
    # pattern_tiling/search.rs:690-848), so one batched engine serves both.

    def encode_patterns(self, patterns, include_rc: bool | None = None,
                        rc_anchor: str = "start"):
        """Pre-encode a batch of equal-length patterns for repeated use.
        The default ``rc_anchor="start"`` is the reference v2 engine's RC
        semantics (RC(pattern) searched on the forward text, reference
        lib.rs:33-40); ``rc_anchor="end"`` selects v1 native-RC anchoring
        (pattern vs RC(text)) instead. See EncodedPatterns.rc_anchor."""
        return EncodedPatterns(
            self.profile, patterns,
            include_rc if include_rc is not None else self.rc,
            rc_anchor=rc_anchor,
        )

    def search_encoded_patterns(self, encoded, text, k: int) -> list[Match]:
        if getattr(encoded, "rc_anchor", "end") == "start":
            return self._search_encoded_v2_anchor(encoded, text, k, False)
        return self._search_many_impl(
            encoded.patterns, [text], k, False, rc=encoded.include_rc
        )

    def search_all_encoded_patterns(self, encoded, text, k: int) -> list[Match]:
        if getattr(encoded, "rc_anchor", "end") == "start":
            return self._search_encoded_v2_anchor(encoded, text, k, True)
        return self._search_many_impl(
            encoded.patterns, [text], k, True, rc=encoded.include_rc
        )

    def _search_encoded_v2_anchor(
        self, encoded, text, k: int, all_minima: bool
    ) -> list[Match]:
        """v2 RC anchor semantics (reference lib.rs:33-40): the RC strand is
        searched as RC(pattern) against the FORWARD text, so local-minima
        anchors land on the v2 side of a tied plateau. The reference's two
        engines agree on the match set (differential fuzz asserts it); this
        flag exists for exact anchor parity with v2-mode consumers."""
        pats = encoded.patterns
        if not encoded.include_rc:
            return self._search_many_impl(pats, [text], k, all_minima,
                                          rc=False)
        prof = self.profile
        Q = len(pats)
        rc_pats = [as_bytes_array(prof.reverse_complement(p)) for p in pats]
        # both strands ride ONE batched dispatch: the RC lanes are just
        # more forward patterns (exactly how the reference's v2 engine
        # lays out its encoded pattern set, pattern_tiling/general.rs)
        ms_all = self._search_many_impl(
            pats + rc_pats, [text], k, all_minima, rc=False
        )
        m_len = encoded.pattern_len
        out: list[Match] = []
        for m in ms_all:
            if m.pattern_idx >= Q:
                m.pattern_idx -= Q
                m.strand = Strand.RC
                if m.cigar is not None:
                    m.cigar = m.cigar.reversed()
                if m.pattern_start is not UNKNOWN:
                    ps, pe = m.pattern_start, m.pattern_end
                    m.pattern_start, m.pattern_end = m_len - pe, m_len - ps
            out.append(m)
        return out

    # ------------------------------------------------------------------

    def _batch_engine(self):
        """Batched cartesian-product engine (None when the configured engine
        is the NumPy oracle, which stays loop-based by design)."""
        if self._batch is False:
            return None
        if self._batch is None:
            if self._engine_name == "numpy":
                self._batch = False
                return None
            try:
                from .ops.batch import BatchEngine

                self._batch = BatchEngine()
            except ImportError:
                self._batch = False
                return None
        return self._batch

    def search_many_with_fn(
        self, patterns, texts, k: int, all_minima: bool, filter_fn
    ) -> list[Match]:
        """Cartesian-product search with an end-position filter — the
        batched counterpart of search_with_fn (one device dispatch for the
        whole product; the filter runs on the few candidates). Powers the
        CRISPR CLI's PAM filter over guide batches (reference
        crispr.rs:188-261 threads over records instead)."""
        return self._search_many_impl(
            patterns, texts, k, all_minima, filter_fn=filter_fn
        )

    def search_many_with_fn_async(
        self, patterns, texts, k: int, all_minima: bool, filter_fn
    ):
        """search_many_with_fn, split into dispatch-now / finish-later:
        returns a ``finish()`` callable. Dispatching record batch N+1
        before finishing batch N overlaps N's fetch + host postprocess
        with N+1's device scan (the CLI's record-batch pipelining)."""
        rc = self.rc
        pats = [as_bytes_array(p) for p in patterns]
        rc_texts = [_as_rc_searchable(t) for t in texts]
        eng = self._batch_engine()
        if eng is not None:
            try:
                return self._search_many_batched_async(
                    pats, rc_texts, k, all_minima, rc, filter_fn
                )
            except (ValueError, NotImplementedError) as e:
                import logging

                logging.getLogger(__name__).warning(
                    "batched search unavailable (%s); falling back to the "
                    "pairwise loop", e,
                )
        return lambda: self._search_many_impl(
            patterns, texts, k, all_minima, filter_fn=filter_fn
        )

    def _search_many_impl(
        self, patterns, texts, k: int, all_minima: bool, rc: bool | None = None,
        filter_fn=None,
    ) -> list[Match]:
        """Cartesian product via one batched device dispatch, with the same
        per-pair postprocessing as the single search path. Falls back to the
        pairwise loop for the oracle engine or unsupported configs."""
        rc = self.rc if rc is None else rc
        pats = [as_bytes_array(p) for p in patterns]
        rc_texts = [_as_rc_searchable(t) for t in texts]
        eng = self._batch_engine()
        if eng is not None:
            try:
                return self._search_many_batched(
                    pats, rc_texts, k, all_minima, rc, filter_fn
                )
            except (ValueError, NotImplementedError) as e:
                # legitimate unsupported configs (e.g. mixed-length patterns
                # with overhang) degrade to the pairwise loop — but loudly:
                # a shape bug here would otherwise present as a 100x slowdown
                import logging

                logging.getLogger(__name__).warning(
                    "batched search unavailable (%s); falling back to the "
                    "pairwise loop", e,
                )
        out: list[Match] = []
        for pi, pattern in enumerate(pats):
            for ti, text in enumerate(rc_texts):
                out.extend(
                    self._search_handle_rc(
                        pattern, text, k, all_minima,
                        pattern_idx=pi, text_idx=ti, rc=rc,
                        filter_fn=filter_fn,
                    )
                )
        return out

    def _search_many_batched(
        self,
        pats: list[np.ndarray],
        rc_texts: list[CachedRev],
        k: int,
        all_minima: bool,
        rc: bool,
        filter_fn=None,
    ) -> list[Match]:
        return self._search_many_batched_async(
            pats, rc_texts, k, all_minima, rc, filter_fn
        )()

    def _search_many_batched_async(
        self,
        pats: list[np.ndarray],
        rc_texts: list[CachedRev],
        k: int,
        all_minima: bool,
        rc: bool,
        filter_fn=None,
    ):
        from .ops.batch import TextSet

        eng = self._batch_engine()
        prof = self.profile
        pcodes = [prof.encode(p) for p in pats]
        fwd_texts = [t.text() for t in rc_texts]
        # one TextSet serves both strands: the RC pass scans the reversed
        # texts via reverse=True, so genome-scale inputs share a single
        # device upload (TextSet._flat_dev) instead of packing and
        # uploading a reversed copy
        ts = TextSet(fwd_texts)
        # both strand scans dispatch back to back; the fwd fetch then
        # overlaps the RC scan on device
        fin = eng.candidates_many_async(
            prof, pcodes, ts, k, self.alpha, self.max_overhang, all_minima
        )
        rfin = None
        comp = ccodes = None
        if rc:
            comp = [as_bytes_array(prof.complement(p)) for p in pats]
            ccodes = [prof.encode(c) for c in comp]
            rfin = eng.candidates_many_async(
                prof, ccodes, ts, k, self.alpha, self.max_overhang,
                all_minima, reverse=True,
            )
        return lambda: self._finish_many_batched(
            fin, rfin, pats, pcodes, comp, ccodes, rc_texts, fwd_texts,
            k, filter_fn,
        )

    def _finish_many_batched(
        self, fin, rfin, pats, pcodes, comp, ccodes, rc_texts, fwd_texts,
        k, filter_fn,
    ) -> list[Match]:
        cands = fin()
        rcands = rfin() if rfin is not None else None
        out: list[Match] = []
        for pi in range(len(pats)):
            row = cands[pi]
            rrow = rcands[pi] if rcands is not None else None
            for ti in range(len(rc_texts)):
                # skip empty cells without the _postprocess call overhead
                # (read batches are Q x thousands of mostly-empty cells)
                if not row[ti] and (rrow is None or not rrow[ti]):
                    continue
                fwd = fwd_texts[ti]
                out.extend(
                    self._postprocess(
                        pats[pi], pcodes[pi], fwd, k, row[ti],
                        filter_fn, Strand.FWD, pi, ti,
                    )
                )
                if rcands is not None:
                    n = len(fwd)
                    ms = self._postprocess(
                        comp[pi], ccodes[pi], rc_texts[ti].rev_text(), k,
                        rrow[ti], filter_fn, Strand.RC, pi, ti,
                    )
                    for m in ms:
                        m.strand = Strand.RC
                        rs, re = m.text_start, m.text_end
                        m.text_start = n - re
                        m.text_end = UNKNOWN if self.without_trace_flag else n - rs
                    out.extend(ms)
        return out

    def search_all_alignments(self, pattern, text, k: int) -> list[list[Match]]:
        from .alignment_iterator import search_all_alignments

        return search_all_alignments(self, pattern, text, k)

    # ------------------------------------------------------------------
    # core pipeline

    def _search_handle_rc(
        self,
        pattern,
        text,
        k: int,
        all_minima: bool,
        filter_fn=None,
        pattern_idx: int = 0,
        text_idx: int = 0,
        rc: bool | None = None,
    ) -> list[Match]:
        if rc is None:
            rc = self.rc
        pat = as_bytes_array(pattern)
        rc_text = _as_rc_searchable(text)
        fwd = rc_text.text()
        n = len(fwd)

        out = self._search_one_strand(
            pat, fwd, k, all_minima, filter_fn, Strand.FWD, pattern_idx, text_idx
        )

        if rc:
            comp = as_bytes_array(self.profile.complement(pat))
            rev = rc_text.rev_text()
            rc_matches = self._search_one_strand(
                comp, rev, k, all_minima, filter_fn, Strand.RC, pattern_idx, text_idx
            )
            for m in rc_matches:
                m.strand = Strand.RC
                rc_start, rc_end = m.text_start, m.text_end
                m.text_start = n - rc_end
                m.text_end = UNKNOWN if self.without_trace_flag else n - rc_start
            out.extend(rc_matches)
        return out

    def _search_one_strand(
        self,
        pattern: np.ndarray,
        text: np.ndarray,
        k: int,
        all_minima: bool,
        filter_fn,
        strand: Strand,
        pattern_idx: int,
        text_idx: int,
    ) -> list[Match]:
        p_codes = self.profile.encode(pattern)
        cands = self._engine().candidates(
            self.profile, p_codes, text, k, self.alpha, self.max_overhang, all_minima
        )
        return self._postprocess(
            pattern, p_codes, text, k, cands, filter_fn, strand,
            pattern_idx, text_idx,
        )

    def _postprocess(
        self,
        pattern: np.ndarray,
        p_codes: np.ndarray,
        text: np.ndarray,
        k: int,
        cands: list[tuple[int, int]],
        filter_fn,
        strand: Strand,
        pattern_idx: int,
        text_idx: int,
    ) -> list[Match]:
        """Shared candidate postprocessing: end-position filter, N-fraction
        pre-filter, only-best selection, traceback, traced N-filter
        (reference search.rs:884-937 + process_matches)."""
        profile = self.profile
        m = len(pattern)
        n = len(text)

        if filter_fn is not None:
            cands = [
                (end, cost)
                for end, cost in cands
                if filter_fn(pattern, text[: min(end, n)], strand)
            ]

        if self.max_n_frac is not None:
            cands = [
                (end, cost)
                for end, cost in cands
                if satisfy_n_endpoint_filter(end, text, m, k, self.max_n_frac)
            ]

        if self.only_best_match_flag and cands:
            # smallest cost; ties broken by larger end position
            # (search.rs:1392-1411)
            best = min(cands, key=lambda ec: (ec[1], -ec[0]))
            cands = [best]

        fill_len = m + k
        out: list[Match] = []
        if self.without_trace_flag:
            for end, cost in cands:
                out.append(
                    Match(
                        pattern_idx=pattern_idx,
                        text_idx=text_idx,
                        text_start=UNKNOWN,
                        text_end=min(end, n),
                        pattern_start=UNKNOWN,
                        pattern_end=m - max(0, end - n),
                        cost=cost,
                        strand=Strand.FWD,
                    )
                )
        elif cands:
            # one batched window fill for all candidates of this pair
            # (the reference's LANES-at-a-time process_matches batching)
            traced = trace_candidates_batch(
                profile,
                pattern,
                p_codes,
                text,
                [end for end, _ in cands],
                fill_len,
                self.alpha,
                self.max_overhang,
            )
            for (end, cost), mt in zip(cands, traced):
                assert mt.cost <= cost, f"trace cost {mt.cost} > recorded {cost}"
                assert mt.cost <= k
                mt.pattern_idx = pattern_idx
                mt.text_idx = text_idx
                out.append(mt)

        if self.max_n_frac is not None and not self.without_trace_flag:
            out = [mm for mm in out if traced_satisfy_n_frac(mm, text, self.max_n_frac)]
        return out
