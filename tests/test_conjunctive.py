"""Conjunctive (operator="and") BM25 — rank/score identity vs the
oracle's search_and, in-process and across the shard-actor pool."""

import numpy as np


def _query_set(oracle):
    by_df = sorted(oracle.postings, key=lambda t: (-len(oracle.postings[t]), t))
    hot, mid, rare = by_df[:6], by_df[40:46], by_df[-6:]
    qs = ([[a, b] for a, b in zip(hot, mid)]
          + [[a, b] for a, b in zip(hot, rare)]
          + [[a, b, c] for a, b, c in zip(hot, mid, rare)]
          + [[hot[0]], [rare[0]]]
          + [[hot[0], "qqqq_not_a_term"]])
    return qs


def test_conjunctive_matches_oracle(built_index):
    from mee_ray.query import Searcher

    oracle = built_index["oracle"]
    s = Searcher(built_index["index_root"])
    n_nonempty = 0
    for q in _query_set(oracle):
        got = s.search(q, k=10, operator="and")
        want = oracle.search_and(q, k=10)
        assert got == want, q
        n_nonempty += bool(got)
    assert n_nonempty >= 10  # the set actually exercises matches


def test_conjunctive_is_subset_of_disjunctive(built_index):
    from mee_ray.query import Searcher

    oracle = built_index["oracle"]
    s = Searcher(built_index["index_root"])
    for q in _query_set(oracle)[:6]:
        both = dict(s.search(q, k=10_000))           # OR, effectively all
        for doc, score in s.search(q, k=10_000, operator="and"):
            # conjunction filters, never rescales
            assert doc in both and both[doc] == score


def test_conjunctive_missing_term_empties(built_index):
    from mee_ray.query import Searcher

    s = Searcher(built_index["index_root"])
    assert s.search(["qqqq_not_a_term"], k=10, operator="and") == []
    assert s.search(["merge", "qqqq_not_a_term"], k=10,
                    operator="and") == []


def test_degenerate_queries_return_empty(built_index):
    """k<=0 and empty term lists return [] on every path instead of
    crashing (WAND's theta() used to index an empty heap; conjunctive
    merge used to dereference a None candidate set)."""
    from mee_ray.query import Searcher

    s = Searcher(built_index["index_root"])
    assert s.search(["merge"], k=0) == []
    assert s.search(["merge"], k=-3) == []
    assert s.search([], k=10) == []
    assert s.search([], k=10, operator="and") == []
    assert s.search(["merge"], k=0, operator="and") == []


def test_conjunctive_single_term_equals_or(built_index):
    from mee_ray.query import Searcher

    oracle = built_index["oracle"]
    s = Searcher(built_index["index_root"])
    hot = max(oracle.postings, key=lambda t: len(oracle.postings[t]))
    assert s.search([hot], k=10, operator="and") == s.search([hot], k=10)


def test_conjunctive_distributed(built_index, ray_session):
    from mee_ray.query import DistributedSearcher

    oracle = built_index["oracle"]
    ds = DistributedSearcher(built_index["index_root"], n_actors=3)
    try:
        for q in _query_set(oracle)[:10]:
            got = ds.search(q, k=10, operator="and")
            assert got == oracle.search_and(q, k=10), q
    finally:
        ds.shutdown()
