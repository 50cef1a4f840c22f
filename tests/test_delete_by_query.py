"""delete_by_query: ES _delete_by_query analog — matched docs are
tombstoned through the sequenced delta path, idempotently, and the
surviving ranking is oracle-identical across compaction."""

import shutil

import numpy as np
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def dq_index(ray_session, tmp_path_factory):
    import ray.data

    from mee_ray.build import build_index
    from mee_ray.config import EngineConfig
    from mee_ray.corpus import write_corpus
    from mee_ray.ids import doc_id_of

    root = str(tmp_path_factory.mktemp("dq_idx"))
    cdir = write_corpus(f"{root}/corpus", n_files=100, seed=31,
                        rows_per_file=50)
    cfg = EngineConfig()
    build_index(ray.data.read_parquet(cdir), f"{root}/index", "ep1", cfg)

    t = pq.read_table(cdir)
    live = {}
    for r, p, c, content in zip(t["repo"].to_pylist(),
                                t["path"].to_pylist(),
                                t["commit"].to_pylist(),
                                t["content"].to_pylist()):
        if (r, p) not in live or c > live[(r, p)][0]:
            live[(r, p)] = (c, content)
    docs = [(doc_id_of(r, p, c), content)
            for (r, p), (c, content) in live.items()]
    return {"root": f"{root}/index", "docs": docs}


def _pick_term(docs, lo=5, hi=40):
    """A corpus term with moderate df (some matches, not everything)."""
    from mee_ray.config import TokenizerConfig
    from mee_ray.tokenizer import Tokenizer
    tok = Tokenizer(TokenizerConfig())
    df: dict[str, int] = {}
    for _, content in docs:
        for t in set(tok.terms(content)):
            df[t] = df.get(t, 0) + 1
    for t in sorted(df):
        if lo <= df[t] <= hi:
            return t
    raise AssertionError("no term in df band")


def test_delete_by_query_or_idempotent_and_compact(dq_index, tmp_path):
    from mee_ray.delta import delete_by_query
    from mee_ray.merge import compact
    from mee_ray.oracle import OracleIndex
    from mee_ray.query import Searcher
    from mee_ray.tokenizer import Tokenizer
    from mee_ray.config import TokenizerConfig

    root = str(tmp_path / "index")
    shutil.copytree(dq_index["root"], root)
    term = _pick_term(dq_index["docs"])

    s0 = Searcher(root)
    n_before = s0.count([term])
    assert n_before > 0
    rec = delete_by_query(root, [term])
    assert rec["n_matched"] == n_before
    assert rec["n_deleted"] == n_before

    s1 = Searcher(root)
    assert s1.count([term]) == 0
    assert s1.search([term], k=10) == []

    # survivors rank exactly like an oracle over the remaining docs
    tok = Tokenizer(TokenizerConfig())
    remaining = [(i, c) for i, c in dq_index["docs"]
                 if term not in tok.terms(c)]
    assert len(remaining) == len(dq_index["docs"]) - n_before
    oracle = OracleIndex(remaining)
    for q in (["def"], ["return", "import"], ["data", "value"]):
        assert s1.search(q, k=10) == oracle.search(q, k=10), q

    # redelivery: a second identical call matches nothing
    rec2 = delete_by_query(root, [term])
    assert rec2.get("noop") and rec2["n_matched"] == 0

    compact(root, "ep2")
    s2 = Searcher(root)
    assert s2.count([term]) == 0
    for q in (["def"], ["return", "import"]):
        assert s2.search(q, k=10) == oracle.search(q, k=10), q


def test_delete_by_query_and_operator(dq_index, tmp_path):
    from mee_ray.delta import delete_by_query
    from mee_ray.query import Searcher

    root = str(tmp_path / "index")
    shutil.copytree(dq_index["root"], root)
    t1 = _pick_term(dq_index["docs"], 10, 60)
    t2 = _pick_term(dq_index["docs"], 61, 90)

    s0 = Searcher(root)
    both = s0.matched_doc_ids([t1, t2], "and")
    any_ = s0.matched_doc_ids([t1, t2], "or")
    assert 0 < both.size < any_.size
    rec = delete_by_query(root, [t1, t2], operator="and")
    assert rec["n_matched"] == both.size

    s1 = Searcher(root)
    assert s1.count([t1, t2], operator="and") == 0
    # docs holding only one of the two terms survive
    assert s1.count([t1, t2]) == any_.size - both.size


def test_delete_by_query_unknown_term_is_noop(dq_index):
    from mee_ray import manifest as mf
    from mee_ray.delta import delete_by_query

    before = len(mf.load_manifest(dq_index["root"]).get("deltas", []))
    rec = delete_by_query(dq_index["root"], ["zz_no_such_term_anywhere"])
    assert rec.get("noop") and rec["n_matched"] == 0
    after = len(mf.load_manifest(dq_index["root"]).get("deltas", []))
    assert after == before
