"""minimum_should_match and per-term-boost query variants — both are
filter/scale layers over the same exact disjunctive scoring: min_match
filters by distinct-term match count without rescaling, boosts scale
each term's contribution before the sorted-term accumulation."""

import numpy as np
import pytest


def _queries(oracle):
    by_df = sorted(oracle.postings,
                   key=lambda t: (-len(oracle.postings[t]), t))
    return [[by_df[0], by_df[40]],
            [by_df[1], by_df[30], by_df[-4]],
            [by_df[0], by_df[2], by_df[50], by_df[-2]],
            [by_df[3]]]


def test_min_match_matches_oracle(built_index):
    from mee_ray.query import Searcher

    oracle = built_index["oracle"]
    s = Searcher(built_index["index_root"])
    n = 0
    for q in _queries(oracle):
        for m in range(1, len(q) + 2):
            got = s.search_min_match(q, k=10, min_match=m)
            want = oracle.search_min_match(q, k=10, min_match=m)
            assert got == want, (q, m)
            n += bool(got)
    assert n >= 6


def test_min_match_degenerates_to_or_and(built_index):
    from mee_ray.query import Searcher

    oracle = built_index["oracle"]
    s = Searcher(built_index["index_root"])
    for q in _queries(oracle):
        assert (s.search_min_match(q, k=10, min_match=1)
                == s.search(q, k=10))
        # m == n_terms: same docs AND same scores as operator="and"
        assert (s.search_min_match(q, k=10, min_match=len(q))
                == s.search(q, k=10, operator="and")), q


def test_weighted_matches_oracle(built_index):
    from mee_ray.query import Searcher

    oracle = built_index["oracle"]
    s = Searcher(built_index["index_root"])
    n = 0
    for q in _queries(oracle):
        # power-of-two boosts by sorted-term position: the multiply is
        # EXACT, so engine/oracle stay bit-identical like unboosted
        boosts = {t: float(1 << i) for i, t in enumerate(sorted(set(q)))}
        got = s.search_weighted(boosts, k=10)
        want = oracle.search_weighted(boosts, k=10)
        assert got == want, q
        n += bool(got)
    assert n >= 3
    # all-ones boosts == plain disjunctive search
    q = _queries(oracle)[1]
    ones = {t: 1.0 for t in q}
    assert s.search_weighted(ones, k=10) == s.search(q, k=10)


def test_variant_degenerates(built_index):
    from mee_ray.query import Searcher

    s = Searcher(built_index["index_root"])
    assert s.search_min_match(["merge"], k=0, min_match=1) == []
    assert s.search_min_match([], k=10, min_match=1) == []
    assert s.search_min_match(["merge"], k=10, min_match=5) == []
    assert s.search_weighted({}, k=10) == []
    assert s.search_weighted({"merge": 2.0}, k=0) == []
    with pytest.raises(ValueError):
        s.search_weighted({"merge": 0.0}, k=10)
    with pytest.raises(ValueError):
        s.search_weighted({"merge": -1.0}, k=10)


def test_search_after_reconstructs_full_ranking(built_index):
    """Stitching cursor pages (several page sizes, including sizes
    that split exact-tie runs) must reproduce the full ranking with
    no duplicate, dropped, or re-ordered doc."""
    from mee_ray.query import Searcher

    oracle = built_index["oracle"]
    s = Searcher(built_index["index_root"])

    def stitch(q, size):
        pages, cursor = [], None
        while True:
            page = s.search_after(q, size=size, after=cursor)
            if not page:
                break
            assert len(page) <= size
            pages.extend(page)
            cursor = page[-1]
        return pages

    # hot queries: big result sets, so use page sizes that keep the
    # page count modest (each page recomputes the ranking, like ES)
    for q in _queries(oracle)[:3]:
        full = s.search(q, k=s.n_docs or 1)
        for size in (503, max(1, len(full) // 3)):
            assert stitch(q, size) == full, (q, size)
    # a rare term: small result set — walk it one doc per page, the
    # harshest tie-splitting case
    rare = min(oracle.postings, key=lambda t: (len(oracle.postings[t]), t))
    full = s.search([rare], k=s.n_docs or 1)
    assert 0 < len(full) <= 64
    assert stitch([rare], 1) == full


def test_search_after_matches_oracle(built_index):
    from mee_ray.query import Searcher

    oracle = built_index["oracle"]
    s = Searcher(built_index["index_root"])
    for q in _queries(oracle):
        p1 = s.search_after(q, size=10)
        assert p1 == oracle.search_after(q, size=10), q
        if len(p1) == 10:
            c = p1[-1]
            assert (s.search_after(q, size=10, after=c)
                    == oracle.search_after(q, size=10, after=c)), q
    assert s.search_after([], size=10) == []
    assert s.search_after(["merge"], size=0) == []


def test_dismax_matches_oracle(built_index):
    from mee_ray.query import Searcher

    oracle = built_index["oracle"]
    s = Searcher(built_index["index_root"])
    n = 0
    for q in _queries(oracle):
        for tb in (0.0, 0.5, 1.0):
            got = s.search_dismax(q, k=10, tie_breaker=tb)
            want = oracle.search_dismax(q, k=10, tie_breaker=tb)
            assert got == want, (q, tb)
            n += bool(got)
    assert n >= 6
    # single-term: dis_max degenerates to the plain ranking
    one = _queries(oracle)[-1]
    assert s.search_dismax(one, k=10) == s.search(one, k=10)
    assert s.search_dismax([], k=10) == []
    assert s.search_dismax(["merge"], k=0) == []


def test_more_like_this_matches_oracle(built_index):
    from mee_ray.query import Searcher

    oracle = built_index["oracle"]
    s = Searcher(built_index["index_root"])
    docs = sorted(built_index["docs"])
    n = 0
    for did, text in docs[:6] + docs[-3:]:
        for mt in (3, 10):
            got = s.more_like_this(text, k=10, max_terms=mt,
                                   exclude_doc_ids=[did])
            want = oracle.more_like_this(text, k=10, max_terms=mt,
                                         exclude_doc_ids=[did])
            assert got == want, (did, mt)
            assert all(d != did for d, _ in got)
            n += bool(got)
    assert n >= 8
    # term selection itself is deterministic and df-filtered
    did, text = docs[0]
    sel = s.select_mlt_terms(text, 5)
    assert len(sel) <= 5 and len(set(sel)) == len(sel)
    assert all(s.term_df(t) > 0 for t in sel)


def test_more_like_this_degenerate(built_index):
    from mee_ray.query import Searcher

    s = Searcher(built_index["index_root"])
    assert s.more_like_this("", k=10) == []
    assert s.more_like_this("merge sort", k=0) == []
    assert s.more_like_this("merge sort", k=10, max_terms=0) == []
    # seed containing no indexed terms selects nothing (single token —
    # the code tokenizer would split a snake_case probe into subtokens)
    assert s.more_like_this("zzzzqqqqxxxx", k=10) == []


def test_suggest_matches_bruteforce(built_index):
    from mee_ray.query import Searcher, _levenshtein_le

    oracle = built_index["oracle"]
    s = Searcher(built_index["index_root"])
    vocab = sorted(oracle.postings)
    probes = [vocab[0] + "x", vocab[len(vocab) // 2], "zzzzzz"]
    n = 0
    for p in probes:
        want = sorted(((-len(oracle.postings[t]), t) for t in vocab
                       if t != p and _levenshtein_le(p, t, 1)))[:5]
        got = s.suggest(p, n=5)
        assert got == [(-d, t) for d, t in want], p
        n += bool(got)
    assert n >= 1
    assert s.suggest("merge", n=0) == []
    assert s.suggest("") == []   # empty input suggests nothing


def test_suggest_excludes_dead_terms(built_index, tmp_path_factory,
                                     ray_session):
    """A term whose every document is tombstoned stays in the
    dictionary but must never be suggested (live df = 0)."""
    import shutil

    import pyarrow as pa

    from mee_ray.config import EngineConfig
    from mee_ray.delta import apply_delta
    from mee_ray.ids import doc_id_of
    from mee_ray.query import Searcher

    root = str(tmp_path_factory.mktemp("suggest_dead"))
    shutil.copytree(built_index["index_root"], root, dirs_exist_ok=True)
    oracle = built_index["oracle"]
    rare = min(oracle.postings, key=lambda t: (len(oracle.postings[t]), t))
    rare_docs = set(oracle.postings[rare])
    keys = [(r, p) for (r, p), (c, _) in built_index["live"].items()
            if doc_id_of(r, p, c) in rare_docs]
    assert keys
    n = len(keys)
    ev = pa.table({
        "seq": pa.array(range(1, n + 1), pa.int64()),
        "type": pa.array(["DELETE"] * n),
        "repo": pa.array([r for r, _ in keys]),
        "path": pa.array([p for _, p in keys]),
        "commit": pa.array([""] * n),
        "lang": pa.array([""] * n),
        "content": pa.array([""] * n),
    })
    apply_delta(ev, root, EngineConfig())
    s = Searcher(root)
    assert s.term_df(rare) == 0
    assert rare in s.vocabulary()          # dictionary key survives
    got = s.suggest(rare + "x", n=100)
    assert all(t != rare for _, t in got)
    assert all(df > 0 for df, _ in got)


def test_count_matches_bruteforce(built_index):
    from mee_ray.query import Searcher

    oracle = built_index["oracle"]
    s = Searcher(built_index["index_root"])
    n = 0
    for q in _queries(oracle):
        sets = [set(oracle.postings.get(t, ())) for t in set(q)]
        want_or = len(set.union(*sets))
        want_and = len(set.intersection(*sets))
        assert s.count(q, "or") == want_or, q
        assert s.count(q, "and") == want_and, q
        n += want_or > 0
    assert n >= 3
    assert s.count([], "or") == 0
    assert s.count(["qq_absent_term"], "or") == 0
    assert s.count(["qq_absent_term", q[0]], "and") == 0


def test_variants_distributed(built_index, ray_session):
    from mee_ray.query import DistributedSearcher, Searcher

    oracle = built_index["oracle"]
    s = Searcher(built_index["index_root"])
    ds = DistributedSearcher(built_index["index_root"], n_actors=3)
    try:
        for q in _queries(oracle):
            for m in (1, 2, len(q)):
                assert (ds.search_min_match(q, k=10, min_match=m)
                        == s.search_min_match(q, k=10, min_match=m)), \
                    (q, m)
            boosts = {t: float(1 << i)
                      for i, t in enumerate(sorted(set(q)))}
            assert (ds.search_weighted(boosts, k=10)
                    == s.search_weighted(boosts, k=10)), q
        with pytest.raises(ValueError):
            ds.search_weighted({"merge": -2.0}, k=10)
        for did, text in sorted(built_index["docs"])[:4]:
            assert (ds.more_like_this(text, k=10, max_terms=5,
                                      exclude_doc_ids=[did])
                    == s.more_like_this(text, k=10, max_terms=5,
                                        exclude_doc_ids=[did])), did
        for q in _queries(oracle)[:2]:
            p1 = ds.search_after(q, size=10)
            assert p1 == s.search_after(q, size=10), q
            if len(p1) == 10:
                assert (ds.search_after(q, size=10, after=p1[-1])
                        == s.search_after(q, size=10, after=p1[-1])), q
            assert (ds.search_dismax(q, k=10, tie_breaker=0.5)
                    == s.search_dismax(q, k=10, tie_breaker=0.5)), q
        for q in _queries(oracle):
            assert ds.count(q, "or") == s.count(q, "or"), q
            assert ds.count(q, "and") == s.count(q, "and"), q
        vocab = s.vocabulary()
        for p in (vocab[0] + "x", vocab[1]):
            assert ds.suggest(p, n=5) == s.suggest(p, n=5), p
    finally:
        ds.shutdown()


def test_explain_sums_to_search_score(built_index):
    """_explain analog: per-term contributions, accumulated in the
    engine's sorted-term order, reproduce search()'s exact score."""
    from mee_ray.query import Searcher

    s = Searcher(built_index["index_root"])
    oracle = built_index["oracle"]
    vocab = sorted(oracle.postings)
    n = 0
    for terms in ([vocab[0]], [vocab[0], vocab[3]],
                  [vocab[1], vocab[2], vocab[5]]):
        for doc, score in s.search(terms, 5):
            ex = s.explain(terms, doc)
            total = 0.0
            for t in sorted(set(terms)):
                if t in ex:
                    total += ex[t]["contribution"]
            assert total == score, (terms, doc)
            for t, d in ex.items():
                assert d["tf"] >= 1 and d["df"] >= 1
            n += 1
    assert n >= 10
    assert s.explain(["zzz_not_a_term"], 1) == {}


def test_get_doc_live_and_tombstoned(built_index, tmp_path_factory,
                                     ray_session):
    import hashlib
    import shutil

    import pyarrow as pa

    from mee_ray.config import EngineConfig
    from mee_ray.delta import apply_delta
    from mee_ray.ids import doc_id_of
    from mee_ray.query import Searcher

    root = str(tmp_path_factory.mktemp("get_doc"))
    shutil.copytree(built_index["index_root"], root, dirs_exist_ok=True)
    s = Searcher(root)
    (repo, path), (commit, content) = next(iter(built_index["live"].items()))
    got = s.get_doc(repo, path)
    assert got is not None
    assert got["commit"] == commit
    assert got["doc_id"] == doc_id_of(repo, path, commit)
    assert got["content_sha256"] == hashlib.sha256(
        content.encode()).digest()
    assert s.get_doc(repo, "no/such/path.py") is None
    # DELETE tombstones it; a later re-INSERT revives it
    ev = pa.table({"seq": pa.array([1, 2], pa.int64()),
                   "type": pa.array(["DELETE", "INSERT"]),
                   "repo": pa.array([repo, repo]),
                   "path": pa.array([path, path]),
                   "commit": pa.array(["", "f" * 40]),
                   "lang": pa.array(["", "py"]),
                   "content": pa.array(["", "new content here"])})
    apply_delta(ev.slice(0, 1), root, EngineConfig())
    assert Searcher(root).get_doc(repo, path) is None
    apply_delta(ev.slice(1, 1), root, EngineConfig())
    got2 = Searcher(root).get_doc(repo, path)
    assert got2 is not None and got2["commit"] == "f" * 40


def test_explain_correct_after_delta(built_index, tmp_path_factory,
                                     ray_session):
    """explain() must stay bit-exact when postings carry delta chunks
    (posting ids are no longer globally sorted then — the regression
    a review pass reproduced live)."""
    import shutil

    import pyarrow as pa

    from mee_ray.config import EngineConfig
    from mee_ray.delta import apply_delta
    from mee_ray.query import Searcher

    root = str(tmp_path_factory.mktemp("explain_delta"))
    shutil.copytree(built_index["index_root"], root, dirs_exist_ok=True)
    oracle = built_index["oracle"]
    common = max(oracle.postings, key=lambda t: len(oracle.postings[t]))
    n = 30
    ev = pa.table({
        "seq": pa.array(range(1, n + 1), pa.int64()),
        "type": pa.array(["INSERT"] * n),
        "repo": pa.array([f"newrepo/r{i}" for i in range(n)]),
        "path": pa.array([f"src/new_{i}.py" for i in range(n)]),
        "commit": pa.array(["a" * 40] * n),
        "lang": pa.array(["py"] * n),
        "content": pa.array([f"{common} fresh content {i}"
                             for i in range(n)]),
    })
    apply_delta(ev, root, EngineConfig())
    s = Searcher(root)
    hits = s.search([common], k=50)
    assert len(hits) >= n
    checked = 0
    for doc, score in hits:
        ex = s.explain([common], doc)
        assert common in ex, doc
        assert ex[common]["contribution"] == score, doc
        checked += 1
    assert checked >= n


def test_msearch_equals_per_query_search(built_index, ray_session):
    """One-round distributed msearch must reproduce per-query search
    exactly (scores AND tie-breaks), including empty and unknown-term
    queries and terms shared across queries."""
    from mee_ray.query import DistributedSearcher, Searcher

    s = Searcher(built_index["index_root"])
    oracle = built_index["oracle"]
    vocab = sorted(oracle.postings)
    queries = [[vocab[0], vocab[1]], [vocab[1]], [],
               ["zzz_nope"], [vocab[2], vocab[0], vocab[7]]]
    assert s.msearch(queries, 10) == [s.search(q, 10) for q in queries]
    ds = DistributedSearcher(built_index["index_root"], n_actors=3)
    try:
        got = ds.msearch(queries, 10)
        assert got == [s.search(q, 10) for q in queries]
        assert ds.msearch([], 10) == []
        assert ds.msearch([[]], 10) == [[]]
    finally:
        ds.shutdown()


def test_complete_local_and_distributed(built_index, ray_session):
    """Completion suggester parity: local ranks by (df desc, term),
    the distributed form matches exactly; dead prefixes empty."""
    from mee_ray.query import DistributedSearcher, Searcher

    s = Searcher(built_index["index_root"])
    oracle = built_index["oracle"]
    vocab = sorted(oracle.postings)
    prefixes = [vocab[0][:1], vocab[len(vocab) // 2][:2], "zzz", ""]
    for pre in prefixes:
        got = s.complete(pre, 5)
        want = sorted((-len(oracle.postings[t]), t)
                      for t in vocab if t.startswith(pre))[:5] \
            if pre else []
        assert got == [(-d, t) for d, t in want], pre
    ds = DistributedSearcher(built_index["index_root"], n_actors=3)
    try:
        for pre in prefixes:
            assert ds.complete(pre, 5) == s.complete(pre, 5), pre
    finally:
        ds.shutdown()



def test_pinned_query_semantics(ray_session):
    """Pinned ids surface first in list order for EVERY query (even a
    zero-organic-match one), organic hits follow without duplicates."""
    from mee_ray.pipelines.fulltext import (PINNED_IDS, TOP_K,
                                            bm25_pinned_documents,
                                            bm25_topk_documents)

    sf = "/root/testdata/sf0.001"
    pinned = bm25_pinned_documents(sf)
    organic = bm25_topk_documents(sf)
    by_q: dict[int, list[int]] = {}
    for qid, rank, did in zip(pinned["query_id"].to_pylist(),
                              pinned["rank"].to_pylist(),
                              pinned["doc_id"].to_pylist()):
        by_q.setdefault(qid, []).append((rank, did))
    org_q: dict[int, list[int]] = {}
    for qid, did in zip(organic["query_id"].to_pylist(),
                        organic["doc_id"].to_pylist()):
        org_q.setdefault(qid, []).append(did)

    assert by_q, "no pinned results at all"
    for qid, hits in by_q.items():
        hits = [d for _, d in sorted(hits)]
        # promoted ids lead, in PINNED_IDS order
        assert hits[:len(PINNED_IDS)] == list(PINNED_IDS), (qid, hits)
        # no duplicates; bounded at TOP_K
        assert len(hits) == len(set(hits)) and len(hits) <= TOP_K
        # the organic tail is the organic ranking minus pinned ids
        tail = [d for d in org_q.get(qid, []) if d not in PINNED_IDS]
        assert hits[len(PINNED_IDS):] == tail[:len(hits) - len(PINNED_IDS)], qid


def test_simple_query_string_parser_and_semantics(ray_session):
    from mee_ray.pipelines.fulltext import (bm25_simple_query_string,
                                            parse_simple_query_string)

    assert parse_simple_query_string("+a b -c") == (["a"], ["b"], ["c"])
    assert parse_simple_query_string("+a +a b") == (["a", "a"], ["b"], [])
    # lone +/- are bare tokens, not operators
    assert parse_simple_query_string("+ -") == ([], ["+", "-"], [])
    import pytest as _pytest
    with _pytest.raises(ValueError, match="positive clause"):
        parse_simple_query_string("-only -exclusions")

    # engine semantics: every hit of "+merge sort -slow" contains
    # 'merge' and not 'slow' (brute-force over the raw corpus)
    import pyarrow.parquet as pq
    import re
    sf = "/root/testdata/sf0.001"
    t = pq.read_table(f"{sf}/documents.parquet",
                      columns=["doc_id", "text"])
    toks = {d: set(re.findall(r"[a-z0-9_]+", (x or "").lower()))
            for d, x in zip(t["doc_id"].to_pylist(),
                            t["text"].to_pylist())}
    out = bm25_simple_query_string(sf)
    got1 = [d for q, d in zip(out["query_id"].to_pylist(),
                              out["doc_id"].to_pylist()) if q == 1]
    assert got1, "query 1 returned nothing"
    for d in got1:
        assert "merge" in toks[d] and "slow" not in toks[d], d


def test_terms_set_degenerates_and_filters(built_index):
    """ES terms_set (per-doc dynamic minimum from the indexed doc
    length): dl_threshold beyond every dl makes every doc 'short'
    (required=low) — low=1 must equal plain OR, low=2 must equal
    min_match=2; threshold 0 makes every doc 'long' (required=high).
    A mid-corpus threshold must equal the per-doc reference filter
    computed from the oracle's own doc lengths, with survivor scores
    bit-equal to the OR query's."""
    from mee_ray.query import Searcher

    oracle = built_index["oracle"]
    s = Searcher(built_index["index_root"])
    big = max(oracle.dl.values()) + 1
    for q in _queries(oracle):
        assert (s.search_terms_set(q, k=10, dl_threshold=big, low=1)
                == s.search(q, k=10))
        assert (s.search_terms_set(q, k=10, dl_threshold=big, low=2,
                                   high=2)
                == s.search_min_match(q, k=10, min_match=2))
        assert (s.search_terms_set(q, k=10, dl_threshold=0, high=2)
                == s.search_min_match(q, k=10, min_match=2))

    thr = int(np.median(list(oracle.dl.values())))
    for q in _queries(oracle):
        full = dict(s.search(q, k=oracle.n_docs or 1))
        counts = {}
        for t in set(q):
            for d in oracle.postings.get(t, {}):
                counts[d] = counts.get(d, 0) + 1
        want = sorted(
            ((d, full[d]) for d, c in counts.items()
             if c >= (1 if oracle.dl[d] < thr else 2)),
            key=lambda x: (-x[1], x[0]))[:10]
        assert s.search_terms_set(q, k=10, dl_threshold=thr) == want


# ----------------------------------------------------- common_terms --


def test_common_terms_matches_oracle(built_index):
    """ES common_terms across the cutoff sweep: low-df terms gate,
    high-df terms only score — engine equals the set-based oracle at
    every cutoff, including the all-low and all-high extremes."""
    from mee_ray.query import Searcher

    oracle = built_index["oracle"]
    s = Searcher(built_index["index_root"])
    n = 0
    for q in _queries(oracle):
        for cutoff in (0.0, 0.02, 0.1, 0.5, 0.9, 1.0):
            got = s.search_common_terms(q, cutoff_frequency=cutoff,
                                        k=10)
            want = oracle.search_common_terms(
                q, cutoff_frequency=cutoff, k=10)
            assert got == want, (q, cutoff)
            n += bool(got)
    assert n >= 10


def test_common_terms_degenerate_edges(built_index):
    """cutoff >= 1 makes every term required — identical to
    min_match = n_terms (full disjunctive scores on the AND doc set);
    cutoff 0 with all dfs > 0 makes every term optional — identical to
    plain OR; an unknown term at cutoff 0 is low (df 0) and required —
    the result must be empty."""
    from mee_ray.query import Searcher

    oracle = built_index["oracle"]
    s = Searcher(built_index["index_root"])
    for q in _queries(oracle):
        assert (s.search_common_terms(q, cutoff_frequency=1.0, k=10)
                == s.search_min_match(q, k=10,
                                      min_match=len(set(q)))), q
        assert (s.search_common_terms(q, cutoff_frequency=0.0, k=10)
                == s.search(q, k=10)), q
        assert s.search_common_terms(q + ["zz_unknown_term"],
                                     cutoff_frequency=0.0, k=10) == []


def test_common_terms_distributed(built_index, ray_session):
    from mee_ray.query import DistributedSearcher

    oracle = built_index["oracle"]
    ds = DistributedSearcher(built_index["index_root"], n_actors=3)
    try:
        for q in _queries(oracle):
            for cutoff in (0.02, 0.5, 1.0):
                assert (ds.search_common_terms(
                    q, cutoff_frequency=cutoff, k=10)
                    == oracle.search_common_terms(
                        q, cutoff_frequency=cutoff, k=10)), (q, cutoff)
    finally:
        ds.shutdown()


def test_terms_set_and_script_score_distributed(built_index,
                                                ray_session):
    """The per-doc-dl family must be tuple-identical (ids AND float64
    scores) between the local Searcher and the partials-with-dl
    distributed fan-out."""
    from mee_ray.query import DistributedSearcher, Searcher

    oracle = built_index["oracle"]
    s = Searcher(built_index["index_root"])
    thr = int(np.median([len(c.split()) for _, c in
                         built_index["docs"]]))
    ds = DistributedSearcher(built_index["index_root"], n_actors=3)
    try:
        for q in _queries(oracle):
            for lo, hi in ((1, 2), (1, 3), (2, 2)):
                assert (ds.search_terms_set(q, k=10, dl_threshold=thr,
                                            low=lo, high=hi)
                        == s.search_terms_set(q, k=10,
                                              dl_threshold=thr,
                                              low=lo, high=hi)), \
                    (q, lo, hi)
            for script in ("_score",
                           "div(mul(_score, dl), sum(dl, 10))",
                           "sum(mul(_score, 2), 1)"):
                assert (ds.search_script_score(q, script, k=10)
                        == s.search_script_score(q, script, k=10)), \
                    (q, script)
        assert ds.search_terms_set([], k=10, dl_threshold=thr) == []
        assert ds.search_script_score(["zz_none"], "_score", k=10) \
            == []
        with pytest.raises(Exception):
            ds.search_script_score(["merge"], "nosuchfn(_score)", k=10)
    finally:
        ds.shutdown()


# ----------------------------------------------------- script_score --


def test_script_score_identity_and_constant(built_index):
    """The bare ``_score`` script must reproduce the plain disjunctive
    ranking exactly; a constant script makes every match tie and the
    doc_id tie-break orders them."""
    from mee_ray.query import Searcher

    oracle = built_index["oracle"]
    s = Searcher(built_index["index_root"])
    for q in _queries(oracle):
        assert s.search_script_score(q, "_score", k=10) \
            == s.search(q, k=10), q
        const = s.search_script_score(q, "echo(1.5)", k=10)
        plain = s.search(q, k=oracle.n_docs or 1)
        want = [(d, 1.5) for d in sorted(d for d, _ in plain)[:10]]
        assert const == want, q


def test_script_score_rescore_matches_reference(built_index):
    """The dl-damped script equals a per-doc reference rescore built
    from the plain full-depth ranking and the oracle's doc lengths —
    bit-exact float64 (multiply/divide of identical inputs)."""
    from mee_ray.query import Searcher

    oracle = built_index["oracle"]
    s = Searcher(built_index["index_root"])
    n = 0
    for q in _queries(oracle):
        got = s.search_script_score(
            q, "div(mul(_score, dl), sum(dl, 10))", k=10)
        full = s.search(q, k=oracle.n_docs or 1)
        resc = [(d, sc * oracle.dl[d] / (oracle.dl[d] + 10))
                for d, sc in full]
        want = sorted(resc, key=lambda x: (-x[1], x[0]))[:10]
        assert got == want, q
        n += bool(got)
    assert n >= 3


def test_script_score_bad_script_fails_eagerly(built_index):
    from mee_ray.functions.scalar import ExprError
    from mee_ray.query import Searcher

    s = Searcher(built_index["index_root"])
    with pytest.raises(ExprError):
        s.search_script_score(["merge"], "not_a_fn(_score)", k=10)


def test_search_template_rendering_and_validation(ray_session):
    """Template rendering: provided params, fired default, overridden
    default; a template whose param has neither value nor default
    fails at compile (eager validation)."""
    import pyarrow as pa
    import pytest as _pt

    from mee_ray.functions.interp import IllegalTemplate, compile_template
    from mee_ray.pipelines.fulltext import _rendered_template_queries

    got = dict(_rendered_template_queries())
    assert got[1] == ["merge", "sort"]
    assert got[2] == ["window"]          # default fired
    assert got[3] == ["customer", "join", "fast"]
    assert got[4] == ["spark", "batch"]  # default overridden
    with _pt.raises(IllegalTemplate, match="unknown column"):
        compile_template("%a %missing")(
            pa.table({"a": pa.array(["x"])}))
