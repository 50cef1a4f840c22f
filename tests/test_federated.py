"""FederatedSearcher (cross-index search with global statistics —
the ES cross-cluster + dfs_query_then_fetch analog): federating two
disjoint half-indexes must be BIT-IDENTICAL to searching the union
index, because global df / n_docs / total_tokens are the same
integers and accumulation order is shared."""

import zlib

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def federated_roots(built_index, tmp_path_factory, ray_session):
    import ray.data

    from mee_ray.build import build_index
    from mee_ray.config import EngineConfig

    t = pq.read_table(built_index["cdir"])
    # ALL rows of a (repo, path) go to the same half so latest-wins
    # dedup resolves within one sub-index, exactly like the union
    halves = ([], [])
    for i, (r, p) in enumerate(zip(t["repo"].to_pylist(),
                                   t["path"].to_pylist())):
        halves[zlib.crc32(f"{r}|{p}".encode()) % 2].append(i)
    roots = []
    for hx, idxs in enumerate(halves):
        assert idxs, "degenerate split"
        d = str(tmp_path_factory.mktemp(f"fed_half{hx}"))
        pq.write_table(t.take(pa.array(idxs)), f"{d}/corpus.parquet")
        root = f"{d}/index"
        build_index(ray.data.read_parquet(f"{d}/corpus.parquet"),
                    root, "ep1", EngineConfig())
        roots.append(root)
    return roots


def test_federated_equals_union_index(built_index, federated_roots):
    from mee_ray.query import FederatedSearcher, Searcher

    fs = FederatedSearcher(federated_roots)
    s = Searcher(built_index["index_root"])
    assert fs.n_docs == s.n_docs
    assert fs.avgdl == s.avgdl
    oracle = built_index["oracle"]
    vocab = sorted(oracle.postings)
    queries = [[vocab[0]], [vocab[1], vocab[4]],
               [vocab[2], vocab[5], vocab[9]], ["zzz_nope"],
               [vocab[0], "zzz_nope"]]
    n = 0
    for q in queries:
        got, want = fs.search(q, 10), s.search(q, 10)
        assert got == want, q            # bit-exact scores AND order
        got_and = fs.search(q, 10, operator="and")
        want_and = s.search(q, 10, operator="and")
        assert got_and == want_and, q
        for op in ("or", "and"):
            assert fs.count(q, op) == s.count(q, op), (q, op)
        n += bool(got)
    assert n >= 3
    assert fs.search([], 10) == []
    assert fs.count([]) == 0


def test_federated_rejects_mismatched_params(federated_roots,
                                             tmp_path_factory,
                                             ray_session):
    import ray.data

    from mee_ray.build import build_index
    from mee_ray.config import BM25Params, EngineConfig
    from mee_ray.corpus import write_corpus
    from mee_ray.query import FederatedSearcher

    d = str(tmp_path_factory.mktemp("fed_othercfg"))
    cdir = write_corpus(f"{d}/corpus", n_files=40, seed=3,
                        rows_per_file=40)
    root = f"{d}/index"
    build_index(ray.data.read_parquet(cdir), root, "ep1",
                EngineConfig(bm25=BM25Params(k1=0.9, b=0.3)))
    with pytest.raises(ValueError, match="disagrees on"):
        FederatedSearcher([federated_roots[0], root])
    with pytest.raises(ValueError):
        FederatedSearcher([])


def test_federated_overlapping_doc_ids(tmp_path_factory, ray_session):
    """A doc indexed in TWO sub-indexes surfaces once per sub (ES
    cross-cluster hits), never as one entry with both contributions
    summed; a conjunction holds only when a single copy matches every
    term."""
    import ray.data

    from mee_ray.build import build_index
    from mee_ray.config import EngineConfig
    from mee_ray.ids import doc_id_of
    from mee_ray.query import FederatedSearcher

    # shared doc X (same repo/path/commit -> same doc_id, same content)
    # and split-personality doc Z (same id, DIFFERENT content per sub)
    rows_a = [("r1", "x.py", "c" * 40, "python", "alpha beta shared"),
              ("r1", "z.py", "d" * 40, "python", "gamma only here"),
              ("r1", "a.py", "e" * 40, "python", "alpha alone")]
    rows_b = [("r1", "x.py", "c" * 40, "python", "alpha beta shared"),
              ("r1", "z.py", "d" * 40, "python", "delta only here"),
              ("r1", "b.py", "f" * 40, "python", "beta alone")]
    roots = []
    for hx, rows in enumerate((rows_a, rows_b)):
        d = str(tmp_path_factory.mktemp(f"fed_ovl{hx}"))
        pq.write_table(pa.table({
            "repo": pa.array([r[0] for r in rows]),
            "path": pa.array([r[1] for r in rows]),
            "commit": pa.array([r[2] for r in rows]),
            "lang": pa.array([r[3] for r in rows]),
            "content": pa.array([r[4] for r in rows]),
        }), f"{d}/corpus.parquet")
        root = f"{d}/index"
        build_index(ray.data.read_parquet(f"{d}/corpus.parquet"),
                    root, "ep1", EngineConfig())
        roots.append(root)

    fs = FederatedSearcher(roots)
    x_id = doc_id_of("r1", "x.py", "c" * 40)
    z_id = doc_id_of("r1", "z.py", "d" * 40)

    got = fs.search(["shared"], 10)
    assert [d for d, _ in got] == [x_id, x_id]     # both copies, once each
    assert got[0][1] == got[1][1]                   # identical content
    # the copy's score must be a SINGLE sub's contribution: matching
    # alpha in both copies plus a.py/b.py gives 4 alpha hits total,
    # but each surfaced entry accumulated exactly one copy's tf
    alpha = fs.search(["alpha"], 10)
    assert [d for d, _ in alpha].count(x_id) == 2
    sc = [s for d, s in alpha if d == x_id]
    assert sc[0] == sc[1]
    # count matches search: two hits for the shared doc
    assert fs.count(["shared"]) == 2
    # conjunction needs ONE copy holding every term: Z's copies hold
    # gamma and delta separately -> no AND match across subs
    assert fs.search(["gamma", "delta"], 10, operator="and") == []
    assert fs.count(["gamma", "delta"], "and") == 0
    # but X matches alpha AND beta within each copy -> two hits
    both = fs.search(["alpha", "beta"], 10, operator="and")
    assert [d for d, _ in both] == [x_id, x_id]
    assert fs.count(["alpha", "beta"], "and") == 2
