"""RRF hybrid retrieval: fusion math + end-to-end consistency with
the two component rankings (each oracle-checked elsewhere)."""

import pyarrow as pa
import pytest

from mee_ray.pipelines.hybrid import RRF_K, rrf_fuse

SF = "/root/testdata/sf0.001"


def _t(rows):
    return pa.table({"query_id": pa.array([r[0] for r in rows],
                                          pa.int64()),
                     "rank": pa.array([r[1] for r in rows], pa.int64()),
                     "doc_id": pa.array([r[2] for r in rows],
                                        pa.int64())})


def test_rrf_fuse_math():
    # doc 7 is rank 1 in both lists; doc 3 rank 2 text only; doc 5
    # rank 2 vec only — 7 must win, 3 vs 5 tie on score -> doc_id asc
    text = _t([(1, 1, 7), (1, 2, 3)])
    vec = _t([(1, 1, 7), (1, 2, 5)])
    out = rrf_fuse([text, vec], k=10)
    assert out["doc_id"].to_pylist() == [7, 3, 5]
    assert out["rank"].to_pylist() == [1, 2, 3]
    s = out["rrf_score"].to_pylist()
    assert s[0] == pytest.approx(2 / (RRF_K + 1))
    assert s[1] == s[2] == pytest.approx(1 / (RRF_K + 2))


def test_rrf_single_list_is_identity_ranking():
    text = _t([(2, r, 100 + r) for r in range(1, 6)])
    out = rrf_fuse([text], k=3)
    assert out["doc_id"].to_pylist() == [101, 102, 103]


@pytest.mark.usefixtures("ray_session")
def test_rrf_hybrid_end_to_end_consistency():
    """The operator's output must equal an independent RRF recompute
    over its two component rankings, and every fused doc must come
    from at least one component list."""
    import numpy as np

    from mee_ray.pipelines.fulltext import (REFERENCE_QUERIES,
                                            bm25_topk_documents)
    from mee_ray.pipelines.hybrid import rrf_hybrid_topk
    from mee_ray.pipelines.vector import knn_bruteforce

    got = rrf_hybrid_topk(SF, k=10)
    assert len(got) > 0

    text = bm25_topk_documents(SF)
    vec = knn_bruteforce(SF, n_queries=len(REFERENCE_QUERIES), k=10)
    # independent recompute (dict-free path: sort + reduce)
    contrib: dict = {}
    for q, r, d in zip(text["query_id"].to_pylist(),
                       text["rank"].to_pylist(),
                       text["doc_id"].to_pylist()):
        contrib[(q, d)] = contrib.get((q, d), 0.0) + 1.0 / (60 + r)
    for q, r, d in zip(vec["query_id"].to_pylist(),
                       vec["rank"].to_pylist(),
                       vec["neighbor_id"].to_pylist()):
        contrib[(q + 1, d)] = contrib.get((q + 1, d), 0.0) \
            + 1.0 / (60 + r)
    for q in {k[0] for k in contrib}:
        items = sorted(((d, s) for (qq, d), s in contrib.items()
                        if qq == q), key=lambda kv: (-kv[1], kv[0]))[:10]
        mask = np.asarray(got["query_id"].to_pylist()) == q
        gd = np.asarray(got["doc_id"].to_pylist())[mask]
        gs = np.asarray(got["rrf_score"].to_pylist())[mask]
        assert gd.tolist() == [d for d, _ in items]
        assert gs.tolist() == pytest.approx([s for _, s in items])
