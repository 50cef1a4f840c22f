"""Differential fuzz: random queries across EVERY ranking form
compared between the engine (local + distributed shard actors) and
the pure-Python oracle — breadth on top of the per-form identity
tests."""

import numpy as np

from mee_ray.query import DistributedSearcher, Searcher
from tests.test_phrase import pos_index  # noqa: F401 (module fixture)


def test_query_forms_fuzz_local_and_distributed(pos_index):  # noqa: F811
    s = Searcher(pos_index["root"])
    oi = pos_index["oracle"]
    ds = DistributedSearcher(pos_index["root"], n_actors=3)
    vocab = [t for t in s.vocabulary() if s.term_df(t) > 0]
    assert len(vocab) > 50
    rng = np.random.default_rng(20260818)

    def draw(n):
        return [vocab[int(i)] for i in rng.integers(0, len(vocab),
                                                    size=n)]
    mism = []
    try:
        for trial in range(120):
            terms = draw(int(rng.integers(1, 5)))
            k = int(rng.integers(1, 25))
            form = trial % 6
            if form == 0:
                a, b, c = (s.search(terms, k), oi.search(terms, k),
                           ds.search(terms, k))
            elif form == 1:
                a = s.search(terms, k, operator="and")
                b = oi.search_and(terms, k)
                c = ds.search(terms, k, operator="and")
            elif form == 2:
                mm = int(rng.integers(1, len(set(terms)) + 1))
                a = s.search_min_match(terms, k, min_match=mm)
                b = oi.search_min_match(terms, k, min_match=mm)
                c = ds.search_min_match(terms, k, min_match=mm)
            elif form == 3:
                tb = float(rng.integers(0, 3)) / 2.0
                a = s.search_dismax(terms, k, tie_breaker=tb)
                b = oi.search_dismax(terms, k, tie_breaker=tb)
                c = ds.search_dismax(terms, k, tie_breaker=tb)
            elif form == 4:
                boosts = {t: 1.0 + (i % 3) * 0.5
                          for i, t in enumerate(sorted(set(terms)))}
                a = s.search_weighted(boosts, k)
                b = oi.search_weighted(boosts, k)
                c = ds.search_weighted(boosts, k)
            else:
                a = s.search_phrase(terms, k)
                b = oi.search_phrase(terms, k)
                c = ds.search_phrase(terms, k)
            if not (a == b == c):
                mism.append((form, terms, k, a[:3], b[:3], c[:3]))
    finally:
        ds.shutdown()
    assert not mism, mism[:3]


def test_explain_distributed_equals_local(pos_index):  # noqa: F811
    """Distributed _explain merges per-owner term entries into the
    same breakdown the local searcher computes, and the contributions
    still sum to the exact search score."""
    s = Searcher(pos_index["root"])
    ds = DistributedSearcher(pos_index["root"], n_actors=3)
    try:
        for terms in (["def", "return"], ["import", "merge", "def"],
                      ["zzz_missing"]):
            hits = s.search(terms, 5)
            for doc_id, score in hits[:3]:
                loc = s.explain(terms, doc_id)
                dist = ds.explain(terms, doc_id)
                assert loc == dist, (terms, doc_id)
                acc = 0.0
                for t in sorted(loc):
                    acc += loc[t]["contribution"]
                assert acc == score
    finally:
        ds.shutdown()
