"""Block-max WAND query path: exact-equivalence (rank AND float64
score identity) with the exhaustive path and the oracle, plus proof
that the pruning actually prunes."""

import pyarrow as pa
import pytest

from mee_ray.config import EngineConfig
from mee_ray.oracle import make_query_set
from mee_ray.query import Searcher, merge_partials
from mee_ray.wand import WandStats


@pytest.fixture(scope="module")
def searcher(built_index):
    return Searcher(built_index["index_root"])


@pytest.fixture(scope="module")
def qset(built_index):
    docs = [(i, c) for i, (_, c) in enumerate(built_index["live"].values())]
    return make_query_set(docs, n_queries=80, seed=9)


def test_wand_equals_exact_and_oracle(built_index, searcher, qset):
    oracle = built_index["oracle"]
    for q in qset:
        uterms = sorted(set(q["terms"]))
        exact = merge_partials([searcher.term_partials(uterms)],
                               uterms, q["k"])
        wand = searcher.search_wand(uterms, q["k"])
        assert wand == exact, (q["terms"], wand[:3], exact[:3])
        assert wand == oracle.search(q["terms"], q["k"]), q["terms"]


def test_search_defaults_to_wand_without_tombstones(built_index, searcher, qset):
    q = qset[0]
    assert searcher.search(q["terms"], q["k"]) == \
        searcher.search_wand(sorted(set(q["terms"])), q["k"])


def test_wand_prunes_hot_single_term(built_index, searcher):
    # the hottest term: largest df — single-term block-max skipping
    # must avoid scoring a meaningful share of its postings at small k
    oracle = built_index["oracle"]
    hot = max(oracle.postings, key=lambda t: len(oracle.postings[t]))
    stats = WandStats()
    res = searcher.search_wand([hot], 3, stats=stats)
    assert res == oracle.search([hot], 3)
    assert stats.postings_total > 0
    assert stats.docs_scored < stats.postings_total, (
        f"no pruning: scored {stats.docs_scored} of {stats.postings_total}")


def test_wand_multi_term_mixed_df(built_index, searcher):
    oracle = built_index["oracle"]
    by_df = sorted(oracle.postings, key=lambda t: -len(oracle.postings[t]))
    hot, rare = by_df[0], by_df[-1]
    for terms in ([hot, rare], [hot, by_df[1]], [rare, by_df[-2], hot]):
        assert searcher.search_wand(sorted(set(terms)), 10) == \
            oracle.search(terms, 10), terms


def test_wand_unknown_and_empty_terms(searcher):
    assert searcher.search_wand(["zzz_never_a_term"], 10) == []
    assert searcher.search_wand([], 10) == []


def test_wand_after_pure_add_delta(built_index, tmp_path_factory, ray_session):
    """Pure-add delta (no tombstones): WAND must stay exact with delta
    chunks merged at live avgdl and stale base bounds rescaled."""
    import shutil

    from mee_ray.delta import apply_delta
    from mee_ray.ids import doc_id_of
    from mee_ray.oracle import OracleIndex

    root = str(tmp_path_factory.mktemp("wand_delta"))
    shutil.copytree(built_index["index_root"], root, dirs_exist_ok=True)

    new_content = ("def wand_delta_probe(): return unique_wand_token_abc\n"
                   * 40)
    events = pa.table({
        "seq": pa.array([1], pa.int64()),
        "type": pa.array(["INSERT"]),
        "repo": pa.array(["repo_new"]),
        "path": pa.array(["src/new_file.py"]),
        "commit": pa.array(["aaaa0001"]),
        "lang": pa.array(["py"]),
        "content": pa.array([new_content]),
    })
    apply_delta(events, root, EngineConfig())

    live = dict(built_index["live"])
    live[("repo_new", "src/new_file.py")] = ("aaaa0001", new_content)
    oracle = OracleIndex([(doc_id_of(r, p, c), content)
                          for (r, p), (c, content) in live.items()])

    s = Searcher(root)
    assert len(s.tombstones) == 0  # pure add — WAND stays on
    docs = [(i, c) for i, (_, c) in enumerate(live.values())]
    for q in make_query_set(docs, n_queries=40, seed=17):
        assert s.search(q["terms"], q["k"]) == \
            oracle.search(q["terms"], q["k"]), q["terms"]
    assert s.search(["unique_wand_token_abc"], 5) == \
        oracle.search(["unique_wand_token_abc"], 5)


def test_fallback_with_tombstones(built_index, tmp_path_factory, ray_session):
    import shutil

    from mee_ray.delta import apply_delta
    from mee_ray.ids import doc_id_of
    from mee_ray.oracle import OracleIndex

    root = str(tmp_path_factory.mktemp("wand_tomb"))
    shutil.copytree(built_index["index_root"], root, dirs_exist_ok=True)

    victim = sorted(built_index["live"])[0]
    events = pa.table({
        "seq": pa.array([1], pa.int64()),
        "type": pa.array(["DELETE"]),
        "repo": pa.array([victim[0]]),
        "path": pa.array([victim[1]]),
        "commit": pa.array([""]),
        "lang": pa.array([""]),
        "content": pa.array([""]),
    })
    apply_delta(events, root, EngineConfig())

    live = dict(built_index["live"])
    del live[victim]
    oracle = OracleIndex([(doc_id_of(r, p, c), content)
                          for (r, p), (c, content) in live.items()])

    s = Searcher(root)
    assert len(s.tombstones) > 0
    docs = [(i, c) for i, (_, c) in enumerate(live.values())]
    for q in make_query_set(docs, n_queries=30, seed=23):
        assert s.search(q["terms"], q["k"]) == \
            oracle.search(q["terms"], q["k"]), q["terms"]


def test_chunk_skip_without_decode_on_multichunk_term():
    """advance_to must skip whole chunks on their stored last-block
    boundary WITHOUT decoding them (the lazy-decode contract): with
    three disjoint-range chunks, jumping into the third decodes only
    two (init + target), never the middle one."""
    import numpy as np

    from mee_ray.wand import WandStats, _Cursor

    decoded = []

    def chunk(lo, hi, tag):
        ids = np.arange(lo, hi, dtype=np.int64)
        tfs = np.ones(len(ids), np.int64)
        dls = np.full(len(ids), 10, np.int64)

        def decode(ids=ids, tfs=tfs, dls=dls, tag=tag):
            decoded.append(tag)
            return ids, tfs, dls

        return {"block_last": np.array([hi - 1], np.int64),
                "block_max": np.array([1.0], np.float64),
                "scale": 1.0, "decode": decode}

    stats = WandStats()
    cur = _Cursor("t", 1.0,
                  [chunk(0, 100, "a"), chunk(100, 200, "b"),
                   chunk(200, 300, "c")],
                  1.0, 1.2, 0.75, 10.0, 128, stats)
    assert decoded == []                 # init decodes NOTHING (lazy)
    assert cur.doc() == 0
    assert decoded == ["a"]              # first access decodes chunk 0
    cur.advance_to(250)
    assert cur.doc() == 250
    assert decoded == ["a", "c"]         # middle chunk skipped undecoded
    assert stats.chunks_total == 3
    assert stats.chunks_decoded == 2
    cur.advance_to(10_000)               # past everything → exhausted
    assert cur.exhausted
    assert decoded == ["a", "c"]         # exhaustion decodes nothing
    # chunk-level skip from a fresh cursor: skip_chunk never decodes
    decoded.clear()
    cur2 = _Cursor("t", 1.0,
                   [chunk(0, 100, "a"), chunk(100, 200, "b")],
                   1.0, 1.2, 0.75, 10.0, 128, WandStats())
    assert cur2.chunk_bound() == 1.0
    cur2.skip_chunk()
    assert decoded == [] and not cur2.exhausted
    cur2.skip_chunk()
    assert cur2.exhausted and decoded == []


def test_lazy_decode_preserves_block_skip_position():
    """Decode-free block skips advance pos BEFORE the chunk decodes;
    the lazy decode must not reset it (scoring would silently redo the
    skipped blocks)."""
    import numpy as np

    from mee_ray.wand import WandStats, _Cursor

    ids = np.arange(0, 256, dtype=np.int64)
    tfs = np.ones(256, np.int64)
    dls = np.full(256, 10, np.int64)
    chunk = {"block_last": np.array([127, 255], np.int64),
             "block_max": np.array([1.0, 2.0], np.float64),
             "scale": 1.0,
             "decode": (lambda: (ids, tfs, dls))}
    cur = _Cursor("t", 1.0, [chunk], 1.0, 1.2, 0.75, 10.0, 128,
                  WandStats())
    cur.skip_block()                 # decode-free: past block 0
    got_ids, _ = cur.score_block_vectorized()   # lazy decode here
    assert got_ids[0] == 128 and len(got_ids) == 128
    assert cur.exhausted
