"""Pure-Python exact reference engine (SURVEY.md §5.2.2).

Replaces the reference system's "Elasticsearch computes the truth"
stance: a brute-force in-memory inverted index with exact BM25 using
the SAME tokenizer and the SAME formula module as the distributed
engine.  The distributed engine must be rank-identical (doc_ids AND
float64 scores bit-equal) on the reference query set — that is the
north_rule acceptance test.

Determinism contract shared with mee_ray.query:
  * per-doc score = sum over the query's unique terms in sorted order
  * float64 everywhere
  * ties broken by ascending doc_id
"""

from __future__ import annotations

from collections import Counter

import numpy as np

from mee_ray.config import BM25Params, TokenizerConfig
from mee_ray.scoring import idf, tfn_scalar
from mee_ray.tokenizer import Tokenizer


class OracleIndex:
    def __init__(self, docs: list[tuple[int, str]],
                 tok_cfg: TokenizerConfig | None = None,
                 bm25: BM25Params | None = None,
                 store_positions: bool = False):
        """docs: [(doc_id, content)] — live documents only.
        ``store_positions=True`` additionally keeps term → doc →
        position sets for phrase verification (opt-in: position maps
        are memory-heavy at the 96k-doc validation scale)."""
        self.bm25 = bm25 or BM25Params()
        tok = Tokenizer(tok_cfg or TokenizerConfig())
        self.tok = tok   # kept for seed-text analysis (more_like_this)
        self.postings: dict[str, dict[int, int]] = {}
        self.dl: dict[int, int] = {}
        self.positions: dict[str, dict[int, set]] | None = \
            {} if store_positions else None
        for doc_id, content in docs:
            if store_positions:
                counts, poss = tok.counts_and_positions(content)
                for term, plist in poss.items():
                    self.positions.setdefault(
                        term, {})[doc_id] = set(plist)
            else:
                counts = tok.counts(content)
            self.dl[doc_id] = sum(counts.values())
            for term, tf in counts.items():
                self.postings.setdefault(term, {})[doc_id] = tf
        self.n_docs = len(self.dl)
        total = sum(self.dl.values())
        self.avgdl = (total / self.n_docs) if self.n_docs else 0.0

    def df(self, term: str) -> int:
        return len(self.postings.get(term, ()))

    def search(self, terms: list[str], k: int = 10) -> list[tuple[int, float]]:
        """Top-k (doc_id, score) in rank order."""
        p = self.bm25
        acc: dict[int, float] = {}
        for term in sorted(set(terms)):
            plist = self.postings.get(term)
            if not plist:
                continue
            w = idf(len(plist), self.n_docs)
            for doc_id, tf in plist.items():
                s = w * tfn_scalar(float(tf), float(self.dl[doc_id]), self.avgdl, p)
                acc[doc_id] = acc.get(doc_id, 0.0) + s
        ranked = sorted(acc.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:k]

    def search_min_match(self, terms: list[str], k: int = 10,
                         min_match: int = 1) -> list[tuple[int, float]]:
        """minimum_should_match top-k: docs matching >= min_match
        distinct query terms, scored exactly like :meth:`search`
        (the count threshold filters, it never rescales)."""
        uterms = sorted(set(terms))
        if min_match > len(uterms):
            return []
        cnt: dict[int, int] = {}
        for term in uterms:
            for doc_id in self.postings.get(term, ()):
                cnt[doc_id] = cnt.get(doc_id, 0) + 1
        keep = {d for d, c in cnt.items() if c >= min_match}
        return [(d, s) for d, s in self.search(terms, k=self.n_docs)
                if d in keep][:k]

    def search_weighted(self, term_boosts: dict[str, float],
                        k: int = 10) -> list[tuple[int, float]]:
        """Per-term boosted top-k: score = Σ_t boost_t·idf_t·tfn_t in
        sorted-term order (same accumulation contract as
        :meth:`search`)."""
        p = self.bm25
        acc: dict[int, float] = {}
        for term in sorted(term_boosts):
            plist = self.postings.get(term)
            if not plist:
                continue
            w = idf(len(plist), self.n_docs)
            boost = float(term_boosts[term])
            for doc_id, tf in plist.items():
                s = (w * tfn_scalar(float(tf), float(self.dl[doc_id]),
                                    self.avgdl, p)) * boost
                acc[doc_id] = acc.get(doc_id, 0.0) + s
        ranked = sorted(acc.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:k]

    def search_after(self, terms: list[str], size: int = 10,
                     after=None) -> list[tuple[int, float]]:
        """Cursor pagination: full ranking post-filtered strictly
        after the (doc_id, score) cursor (a result-row tuple) — the
        brute-force mirror of the engine's exact-score page filter."""
        full = self.search(terms, k=self.n_docs)
        if after is not None:
            c_d, c_s = int(after[0]), float(after[1])
            full = [(d, s) for d, s in full
                    if s < c_s or (s == c_s and d > c_d)]
        return full[:size]

    def search_dismax(self, terms: list[str], k: int = 10,
                      tie_breaker: float = 0.0
                      ) -> list[tuple[int, float]]:
        """Dis-max top-k: max + tie_breaker·(sum − max) over per-term
        contributions, the sum accumulated in sorted-term order."""
        p = self.bm25
        acc: dict[int, float] = {}
        mx: dict[int, float] = {}
        for term in sorted(set(terms)):
            plist = self.postings.get(term)
            if not plist:
                continue
            w = idf(len(plist), self.n_docs)
            for doc_id, tf in plist.items():
                s = w * tfn_scalar(float(tf), float(self.dl[doc_id]),
                                   self.avgdl, p)
                acc[doc_id] = acc.get(doc_id, 0.0) + s
                mx[doc_id] = max(mx.get(doc_id, -float("inf")), s)
        ranked = sorted(
            ((d, mx[d] + tie_breaker * (acc[d] - mx[d])) for d in acc),
            key=lambda kv: (-kv[1], kv[0]))
        return ranked[:k]

    def more_like_this(self, text: str, k: int = 10,
                       max_terms: int = 10,
                       exclude_doc_ids=()) -> list[tuple[int, float]]:
        """more_like_this: top-``max_terms`` seed terms by tf·idf
        (ties by term asc), ranked disjunctively with the seed doc(s)
        excluded — the brute-force mirror of the engine path."""
        counts = self.tok.counts(text)
        scored = []
        for t, tf in counts.items():
            df = self.df(t)
            if df > 0:
                scored.append((-(float(tf) * idf(df, self.n_docs)), t))
        scored.sort()
        sel = [t for _, t in scored[:max_terms]]
        if not sel:
            return []
        excl = set(exclude_doc_ids)
        return [(d, s) for d, s in self.search(sel, k=self.n_docs)
                if d not in excl][:k]

    def search_phrase(self, terms: list[str], k: int = 10
                      ) -> list[tuple[int, float]]:
        """Exact phrase top-k: docs where ``terms`` occur at
        consecutive positions in order, scored exactly like
        :meth:`search_and` restricted to the matching docs.  Needs
        ``store_positions=True``."""
        if self.positions is None:
            raise ValueError("OracleIndex built without store_positions")
        if not terms:
            return []
        uterms = sorted(set(terms))
        for t in uterms:
            if t not in self.postings:
                return []
        cand = set.intersection(
            *(set(self.postings[t]) for t in uterms))
        phrase_docs = set()
        first = self.positions.get(terms[0], {})
        for doc in cand:
            for p in first.get(doc, ()):
                if all((p + i) in self.positions[t].get(doc, ())
                       for i, t in enumerate(terms[1:], start=1)):
                    phrase_docs.add(doc)
                    break
        if not phrase_docs:
            return []
        p = self.bm25
        acc: dict[int, float] = {}
        for term in uterms:
            plist = self.postings[term]
            w = idf(len(plist), self.n_docs)
            for doc_id in phrase_docs:
                s = w * tfn_scalar(float(plist[doc_id]),
                                   float(self.dl[doc_id]), self.avgdl, p)
                acc[doc_id] = acc.get(doc_id, 0.0) + s
        ranked = sorted(acc.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:k]

    def search_span_near(self, terms: list[str], slop: int = 0,
                         k: int = 10) -> list[tuple[int, float]]:
        """Ordered proximity top-k (span_near, in_order=true): terms
        left-to-right with ≤ ``slop`` intervening tokens between each
        consecutive pair; ``slop=0`` ≡ :meth:`search_phrase`.  Match
        test is an exhaustive chain search over stored positions (not
        greedy — per-gap bounds make greedy-earliest incomplete);
        scoring identical to :meth:`search_and` restricted to the
        matching docs."""
        if self.positions is None:
            raise ValueError("OracleIndex built without store_positions")
        if not terms:
            return []
        uterms = sorted(set(terms))
        for t in uterms:
            if t not in self.postings:
                return []
        cand = set.intersection(
            *(set(self.postings[t]) for t in uterms))

        def chain(doc: int, i: int, prev: int) -> bool:
            if i == len(terms):
                return True
            for p in self.positions[terms[i]].get(doc, ()):
                if prev < p <= prev + slop + 1 and chain(doc, i + 1, p):
                    return True
            return False

        span_docs = {doc for doc in cand
                     if any(chain(doc, 1, p)
                            for p in self.positions[terms[0]].get(doc, ()))}
        # scoring IS search_and restricted to the matching docs —
        # filter its ranking so the two can never desynchronize
        ranked = self.search_and(terms, k=self.n_docs + 1)
        return [(d, s) for d, s in ranked if d in span_docs][:k]

    def _spans(self, doc: int, terms: list[str], slop: int
               ) -> list[tuple[int, int]]:
        """ALL (start, end) position spans of a span_near match in one
        doc — exhaustive chain enumeration (no greedy shortcuts)."""
        out: list[tuple[int, int]] = []

        def chain(i: int, prev: int, start: int) -> None:
            if i == len(terms):
                out.append((start, prev))
                return
            for p in self.positions[terms[i]].get(doc, ()):
                if prev < p <= prev + slop + 1:
                    chain(i + 1, p, start)

        for p0 in self.positions[terms[0]].get(doc, ()):
            chain(1, p0, p0)
        return out

    def _span_containing_docs(self, big_terms: list[str], slop: int,
                              little: str) -> set[int]:
        uterms = sorted(set(big_terms) | {little})
        for t in uterms:
            if t not in self.postings:
                return set()
        cand = set.intersection(
            *(set(self.postings[t]) for t in uterms))
        return {doc for doc in cand
                if any(s <= p <= e
                       for s, e in self._spans(doc, big_terms, slop)
                       for p in self.positions[little].get(doc, ()))}

    def search_span_containing(self, big_terms: list[str], slop: int,
                               little: str, k: int = 10
                               ) -> list[tuple[int, float]]:
        """span_containing: a big span_near span contains a little
        occurrence (boundaries inclusive); scored like
        :meth:`search_and` over the BIG terms restricted to the
        matching docs."""
        if self.positions is None:
            raise ValueError("OracleIndex built without store_positions")
        docs = self._span_containing_docs(big_terms, slop, little)
        if not docs:
            return []
        ranked = self.search_and(big_terms, k=self.n_docs + 1)
        return [(d, s) for d, s in ranked if d in docs][:k]

    def search_span_within(self, little: str, big_terms: list[str],
                           slop: int, k: int = 10
                           ) -> list[tuple[int, float]]:
        """span_within: same containment predicate, scored over the
        LITTLE term only restricted to the matching docs."""
        if self.positions is None:
            raise ValueError("OracleIndex built without store_positions")
        docs = self._span_containing_docs(big_terms, slop, little)
        if not docs:
            return []
        ranked = self.search([little], k=self.n_docs + 1)
        return [(d, s) for d, s in ranked if d in docs][:k]

    def search_span_or_near(self, slots: list[list[str]],
                            slop: int = 0, k: int = 10
                            ) -> list[tuple[int, float]]:
        """span_near over span_or slots: slot i matches any of its
        alternatives; scored like :meth:`search` (disjunctive, over
        every alternative) restricted to the matching docs."""
        if self.positions is None:
            raise ValueError("OracleIndex built without store_positions")
        if not slots or any(not s for s in slots):
            return []

        def alt_pos(doc: int, slot: list[str]) -> list[int]:
            return sorted({p for t in set(slot)
                           for p in self.positions.get(t, {})
                           .get(doc, ())})

        all_terms = sorted({t for slot in slots for t in slot})
        cand: set[int] | None = None
        for slot in slots:
            docs_s = {d for t in set(slot)
                      for d in self.postings.get(t, {})}
            cand = docs_s if cand is None else cand & docs_s
            if not cand:
                return []

        def chain(doc: int, i: int, prev: int) -> bool:
            if i == len(slots):
                return True
            return any(chain(doc, i + 1, p)
                       for p in alt_pos(doc, slots[i])
                       if prev < p <= prev + slop + 1)

        matched = {doc for doc in cand
                   if any(chain(doc, 1, p)
                          for p in alt_pos(doc, slots[0]))}
        if not matched:
            return []
        ranked = self.search(all_terms, k=self.n_docs + 1)
        return [(d, s) for d, s in ranked if d in matched][:k]

    def search_common_terms(self, terms: list[str],
                            cutoff_frequency: float = 0.5,
                            k: int = 10) -> list[tuple[int, float]]:
        """common_terms (cutoff frequency): low-df terms
        (df <= cutoff * n_docs) are required, high-df terms only score
        on surviving docs; no low term → plain disjunction.  Scoring
        is the OR ranking filtered to the survivors."""
        uterms = sorted(set(terms))
        if not uterms:
            return []
        thresh = cutoff_frequency * self.n_docs
        low = [t for t in uterms
               if len(self.postings.get(t, {})) <= thresh]
        if not low:
            return self.search(uterms, k)
        for t in low:
            if t not in self.postings:
                return []
        allowed = set.intersection(
            *(set(self.postings[t]) for t in low))
        ranked = self.search(uterms, k=self.n_docs + 1)
        return [(d, s) for d, s in ranked if d in allowed][:k]

    def search_intervals(self, terms: list[str], max_gaps: int = 0,
                         ordered: bool = True, k: int = 10
                         ) -> list[tuple[int, float]]:
        """ES ``intervals`` match rule over DISTINCT terms: one
        occurrence of each term inside a window with at most
        ``max_gaps`` TOTAL non-matching tokens (width - n), in query
        order when ``ordered``.  Exhaustive occurrence-combination
        check; scoring is :meth:`search_and` filtered to the matching
        docs (membership gates, never rescales)."""
        import itertools
        if self.positions is None:
            raise ValueError("OracleIndex built without store_positions")
        if not terms:
            return []
        if len(set(terms)) != len(terms):
            raise ValueError("intervals terms must be distinct")
        for t in terms:
            if t not in self.postings:
                return []
        cand = set.intersection(
            *(set(self.postings[t]) for t in terms))
        bound = len(terms) - 1 + max_gaps
        iv_docs = set()
        for doc in cand:
            runs = [self.positions[t].get(doc, ()) for t in terms]
            for combo in itertools.product(*runs):
                if ordered and any(b <= a for a, b in
                                   zip(combo, combo[1:])):
                    continue
                if max(combo) - min(combo) <= bound:
                    iv_docs.add(doc)
                    break
        ranked = self.search_and(terms, k=self.n_docs + 1)
        return [(d, s) for d, s in ranked if d in iv_docs][:k]

    def search_span_not(self, include: str, exclude: str,
                        dist: int = 1, k: int = 10
                        ) -> list[tuple[int, float]]:
        """span_not (single-term spans, symmetric pre/post = dist):
        docs with ≥1 ``include`` occurrence having no ``exclude``
        occurrence within ``dist`` positions; scoring is the plain
        single-term ranking filtered to the matching docs (membership
        gates, never rescales)."""
        if self.positions is None:
            raise ValueError("OracleIndex built without store_positions")
        if not include or include == exclude:
            return []
        pin = self.positions.get(include, {})
        pex = self.positions.get(exclude, {})
        allowed = {d for d, ps in pin.items()
                   if not pex.get(d)
                   or any(all(abs(p - e) > dist for e in pex[d])
                          for p in ps)}
        ranked = self.search([include], k=self.n_docs + 1)
        return [(d, s) for d, s in ranked if d in allowed][:k]

    def search_and(self, terms: list[str], k: int = 10
                   ) -> list[tuple[int, float]]:
        """Conjunctive (match-ALL-terms) top-k — same scoring and
        accumulation order as :meth:`search`, restricted to documents
        containing every unique query term.  A term absent from the
        index empties the result (ES `operator: and` semantics)."""
        p = self.bm25
        uterms = sorted(set(terms))
        docsets = []
        for term in uterms:
            plist = self.postings.get(term)
            if not plist:
                return []
            docsets.append(set(plist))
        common = set.intersection(*docsets) if docsets else set()
        acc: dict[int, float] = {}
        for term in uterms:
            plist = self.postings[term]
            w = idf(len(plist), self.n_docs)
            for doc_id in common:
                s = w * tfn_scalar(float(plist[doc_id]),
                                   float(self.dl[doc_id]), self.avgdl, p)
                acc[doc_id] = acc.get(doc_id, 0.0) + s
        ranked = sorted(acc.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:k]


def make_query_set(docs: list[tuple[int, str]], n_queries: int = 50,
                   seed: int = 42,
                   tok_cfg: TokenizerConfig | None = None) -> list[dict]:
    """Reference query set (FIXTURES.md F1 `queries`): mix of 1-term
    hot, 1-term rare, and 2–4-term conjunctions, drawn from the actual
    corpus vocabulary so every query has matches."""
    tok = Tokenizer(tok_cfg or TokenizerConfig())
    df: Counter = Counter()
    for _, content in docs:
        df.update(set(tok.terms(content)))
    return make_query_set_from_df(df, n_queries, seed)


def make_query_set_from_df(df: Counter, n_queries: int = 50,
                           seed: int = 42) -> list[dict]:
    """The query-set draw given a precomputed document-frequency
    Counter — the streaming-oracle entry point (oracle_stream
    computes df in one bounded pass; make_query_set delegates here,
    so both paths pick IDENTICAL queries for equal df)."""
    if not df:
        return []
    vocab = sorted(df)
    by_df = sorted(df.items(), key=lambda kv: (-kv[1], kv[0]))
    hot = [t for t, _ in by_df[:20]]
    rare = sorted(t for t, d in df.items() if d == 1)[:200]
    rng = np.random.default_rng(seed)
    queries = []
    for qid in range(n_queries):
        mode = qid % 3
        if mode == 0 and hot:
            terms = [hot[int(rng.integers(0, len(hot)))]]
        elif mode == 1 and rare:
            terms = [rare[int(rng.integers(0, len(rare)))]]
        else:
            n = int(rng.integers(2, 5))
            terms = [vocab[int(rng.integers(0, len(vocab)))] for _ in range(n)]
        queries.append({"query_id": qid, "terms": terms, "k": 10})
    return queries
