"""Connected-components clustering: engine vs brute-force union-find.

Mirrors the repo's sketch-op test strategy (SURVEY.md §5.2): the
distributed pipeline must reproduce an exact in-memory oracle on
small inputs, including adversarial graph shapes (paths are the
worst case for star-contraction round counts)."""

import numpy as np
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


def _union_find(n_edges):
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in n_edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical root = component min (find compresses toward min
    # because we always parent the larger root under the smaller)
    return {x: find(x) for x in list(parent)}


def _cc_of_edges(edges):
    import ray.data

    from mee_ray.pipelines.cluster import connected_components
    t = pa.table({"a": pa.array([a for a, _ in edges], pa.int64()),
                  "b": pa.array([b for _, b in edges], pa.int64())})
    got = connected_components(ray.data.from_arrow(t))
    return dict(zip(got["node"].to_pylist(), got["root"].to_pylist()))


GRAPHS = [
    [],                                           # empty
    [(5, 5)],                                     # self-loop only
    [(1, 2)],                                     # single edge
    [(i, i + 1) for i in range(40)],              # long path (worst case)
    [(0, i) for i in range(1, 30)],               # star
    [(1, 2), (2, 3), (10, 11), (12, 11), (3, 1)],  # two comps + cycle
]


@pytest.mark.parametrize("gi", range(len(GRAPHS)))
def test_cc_fixed_graphs(ray_session, gi):
    edges = GRAPHS[gi]
    # self-loops are ignored by the engine: exclude them from the oracle
    want = _union_find([(a, b) for a, b in edges if a != b])
    got = _cc_of_edges(edges)
    assert got == want


def test_cc_random_graphs(ray_session):
    rng = np.random.default_rng(7)
    for _ in range(3):
        n = int(rng.integers(10, 80))
        m = int(rng.integers(1, 3 * n))
        edges = [(int(rng.integers(0, n)), int(rng.integers(0, n)))
                 for _ in range(m)]
        edges = [(a, b) for a, b in edges]
        got = _cc_of_edges(edges)
        want = _union_find([(a, b) for a, b in edges if a != b])
        assert got == want


def test_gram_edges_match_bruteforce_components(ray_session):
    """Star edges from shared 8-grams must induce exactly the
    brute-force shared-gram components."""
    import collections

    import pyarrow.parquet as pq

    from mee_ray.pipelines.cluster import (connected_components,
                                           gram_dup_edges)

    t = pq.read_table(f"{SF}/documents.parquet",
                      columns=["doc_id", "text"])
    g2d = collections.defaultdict(set)
    for d, x in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        toks = (x or "").split(" ")
        for i in range(len(toks) - 7):
            g2d[" ".join(toks[i:i + 8])].add(d)
    brute_edges = []
    for ds in g2d.values():
        if 2 <= len(ds) <= 50:
            s = sorted(ds)
            brute_edges.extend((s[0], o) for o in s[1:])
    want = _union_find(brute_edges)

    got_t = connected_components(gram_dup_edges(SF, n=8, max_df=50))
    got = dict(zip(got_t["node"].to_pylist(), got_t["root"].to_pylist()))
    assert got == want


def test_clusters_cover_all_docs_and_match_oracle(ray_session):
    import duckdb
    import pyarrow.parquet as pq

    from mee_ray.pipelines.cluster import (NEARDUP_CLUSTERS_SQL,
                                           neardup_gram_clusters,
                                           neardup_representatives)

    got = neardup_gram_clusters(SF)
    n_docs = pq.read_metadata(f"{SF}/documents.parquet").num_rows
    assert got.num_rows == n_docs

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    want = con.execute(
        NEARDUP_CLUSTERS_SQL + " ORDER BY doc_id").fetch_arrow_table()
    assert got.sort_by("doc_id").equals(
        want.cast(got.schema))

    reps = neardup_representatives(SF)
    d = got["doc_id"].to_numpy(zero_copy_only=False)
    r = got["root"].to_numpy(zero_copy_only=False)
    assert sorted(reps["doc_id"].to_pylist()) == sorted(d[d == r].tolist())


def test_minhash_clusters_consistent_with_pairs(ray_session):
    """Every verified MinHash pair must land in one cluster, and every
    multi-doc cluster must be spanned by the pair set."""
    from mee_ray.pipelines.cluster import minhash_neardup_clusters
    from mee_ray.pipelines.text import minhash_lsh_candidates

    pairs = minhash_lsh_candidates(SF).to_pandas()
    got = minhash_neardup_clusters(SF)
    root = dict(zip(got["doc_id"].to_pylist(), got["root"].to_pylist()))
    edges = list(zip(pairs["a"].tolist(), pairs["b"].tolist()))
    want = _union_find([(a, b) for a, b in edges if a != b])
    for node, r in want.items():
        assert root[node] == r
    clustered = {d for d, rt in root.items() if rt != d} | \
        {rt for d, rt in root.items() if rt != d}
    assert clustered == set(want.keys())


def test_embedding_clusters_consistent_with_pairs(ray_session):
    from mee_ray.pipelines.cluster import embedding_neardup_clusters
    from mee_ray.pipelines.vector import embedding_neardup

    pairs = embedding_neardup(SF).to_pandas()
    got = embedding_neardup_clusters(SF)
    root = dict(zip(got["vec_id"].to_pylist(), got["root"].to_pylist()))
    edges = list(zip(pairs["a"].tolist(), pairs["b"].tolist()))
    want = _union_find([(a, b) for a, b in edges if a != b])
    for node, r in want.items():
        assert root[node] == r


def test_pagerank_matches_numpy_fixed_point(ray_session, tmp_path):
    """pagerank_users vs a third, in-memory implementation of the
    identical int64 fixed-point recurrence (the SQL oracle being the
    second): crafted two-stream graph with a weighted repeated edge,
    a cycle, a hub, a dangling user, a dropped self-succession, and a
    ts tie broken by event_id."""
    import pyarrow.parquet as pq

    from mee_ray.pipelines.cluster import _PR_FP, pagerank_users

    ua = [1, 2, 1, 2, 1, 3, 3, 4]      # 3->3 self-succession dropped
    ub = [5, 1, 5, 2, 6]               # 6 is dangling (no out-edges)
    n_a = len(ua)
    ts = ([1000 + i for i in range(n_a - 2)] + [1000 + n_a - 2] * 2
          + [2000 + i for i in range(len(ub))])   # tie on the last two
    t = pa.table({
        "event_id": pa.array(list(range(n_a + len(ub))), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array(ua + ub, pa.int64()),
        "event_type": pa.array(["a"] * n_a + ["b"] * len(ub)),
    })
    pq.write_table(t, f"{tmp_path}/events.parquet")

    iters = 3
    got = pagerank_users(str(tmp_path), iters=iters)

    from collections import Counter, defaultdict
    edges = Counter()
    for stream in (ua, ub):
        for s, d in zip(stream, stream[1:]):
            if s != d:
                edges[(s, d)] += 1
    wout = defaultdict(int)
    for (s, _), w in edges.items():
        wout[s] += w
    nodes = sorted(set(ua) | set(ub))
    n = len(nodes)
    r = {u: _PR_FP // n for u in nodes}
    tp = (15 * _PR_FP) // (100 * n)
    for _ in range(iters):
        c = {u: 0 for u in nodes}
        for (s, d), w in edges.items():
            c[d] += ((r[s] * 85) // (100 * wout[s])) * w
        r = {u: tp + c[u] for u in nodes}

    got_d = dict(zip(got["user_id"].to_pylist(),
                     got["rank_fp"].to_pylist()))
    assert got_d == r


def test_pagerank_hot_type_day_split(tmp_path, ray_session):
    """Single-hot-type fixture: ALL events share one event_type but
    span many days, so the (event_type, day) grouping must shard the
    stream (no task sees it whole) while the boundary stitch
    reproduces the exact whole-stream succession edges.  Verified
    value-exact against a driver-side whole-stream recompute of the
    identical fixed-point iteration."""
    import pyarrow.parquet as pq

    from mee_ray.pipelines.cluster import pagerank_users

    DAY_US = 86_400_000_000
    rng = np.random.default_rng(11)
    n, n_users, n_days = 3000, 40, 12
    ts = np.sort(rng.integers(0, n_days * DAY_US, size=n))
    users = rng.integers(1, n_users + 1, size=n).astype(np.int64)
    t = pa.table({
        "event_id": pa.array(np.arange(n), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array(users, pa.int64()),
        "event_type": pa.array(["hot"] * n, pa.string())})
    pq.write_table(t, str(tmp_path / "events.parquet"))
    assert len(np.unique(ts // DAY_US)) >= 8   # the stream really shards

    got = pagerank_users(str(tmp_path))
    got_map = dict(zip(got["user_id"].to_pylist(),
                       got["rank_fp"].to_pylist()))

    # driver-side reference: whole-stream sort -> weighted succession
    # edges -> the same int64 fixed-point damped power method
    order = np.lexsort((np.arange(n), ts))
    u = users[order]
    src, dst = u[:-1], u[1:]
    keep = src != dst
    edges = {}
    for s, d in zip(src[keep], dst[keep]):
        edges[(int(s), int(d))] = edges.get((int(s), int(d)), 0) + 1
    wout = {}
    for (s, _), w in edges.items():
        wout[s] = wout.get(s, 0) + w
    from mee_ray.pipelines.cluster import _PR_FP, _PR_ITERS
    nodes = sorted(set(users.tolist()))
    N = len(nodes)
    r = {x: _PR_FP // N for x in nodes}
    tele = (15 * _PR_FP) // (100 * N)
    for _ in range(_PR_ITERS):
        contrib = {x: 0 for x in nodes}
        for (s, d), w in edges.items():
            contrib[d] += ((r[s] * 85) // (100 * wout[s])) * w
        r = {x: tele + contrib[x] for x in nodes}
    assert got_map == r
