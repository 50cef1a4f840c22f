"""CachedSearcher (ES request-cache analog): hit identity, LRU bound,
and generation invalidation across BOTH mutation shapes — a delta
apply that keeps the epoch name (manifest fingerprint moves) and a
compaction that publishes a new epoch."""

import os

import pyarrow as pa
import pyarrow.parquet as pq

from mee_ray import manifest as mf
from mee_ray.build import build_index
from mee_ray.config import EngineConfig
from mee_ray.delta import apply_delta
from mee_ray.merge import compact
from mee_ray.query import CachedSearcher, Searcher

EV_COLS = ("seq", "type", "repo", "path", "commit", "lang", "content")


def _events(rows):
    return pa.table({c: pa.array([r.get(c) for r in rows])
                     for c in EV_COLS})


def _build(tmp_path, docs, name="idx"):
    import ray.data
    cdir = str(tmp_path / f"{name}_corpus")
    os.makedirs(cdir, exist_ok=True)
    t = pa.table({
        "repo": pa.array([d[0] for d in docs]),
        "path": pa.array([d[1] for d in docs]),
        "commit": pa.array([d[2] for d in docs]),
        "lang": pa.array(["python"] * len(docs)),
        "content": pa.array([d[3] for d in docs]),
    })
    pq.write_table(t, os.path.join(cdir, "part-0.parquet"))
    root = str(tmp_path / name)
    build_index(ray.data.read_parquet(cdir), root, "ep1",
                EngineConfig(store_positions=True))
    return root


DOCS = [
    ("r1", "a.py", "c1", "alpha beta gamma delta"),
    ("r1", "b.py", "c1", "alpha alpha beta"),
    ("r2", "c.py", "c1", "gamma delta epsilon"),
    ("r2", "d.py", "c1", "zeta eta theta alpha"),
]


def test_cache_hit_identity_and_lru(ray_session, tmp_path):
    root = _build(tmp_path, DOCS)
    cs = CachedSearcher(root, capacity=2)
    fresh = Searcher(root)
    r1 = cs.search(["alpha"], k=5)
    assert r1 == fresh.search(["alpha"], k=5)
    r2 = cs.search(["alpha"], k=5)
    assert r2 == r1
    assert cs.stats()["hits"] == 1 and cs.stats()["misses"] == 1
    # a hit returns a COPY — mutating it must not poison the cache
    r2.append(("poison", 0.0))
    assert cs.search(["alpha"], k=5) == r1
    # LRU bound: 2 more distinct queries evict the oldest
    cs.search(["beta"], k=5)
    cs.search(["gamma"], k=5)
    assert cs.stats()["entries"] == 2
    before = cs.stats()["misses"]
    cs.search(["alpha"], k=5)          # evicted → re-miss
    assert cs.stats()["misses"] == before + 1


def test_cache_invalidation_on_delta_and_compact(ray_session, tmp_path):
    root = _build(tmp_path, DOCS, name="idx2")
    cs = CachedSearcher(root)
    stale = cs.search(["omega"], k=5)
    assert stale == []
    # delta apply: SAME epoch name, manifest fingerprint moves
    apply_delta(_events([{
        "seq": 1, "type": "INSERT", "repo": "r3", "path": "n.py",
        "commit": "c9", "lang": "python", "content": "omega omega",
    }]), root)
    got = cs.search(["omega"], k=5)
    assert len(got) == 1, "cache served a pre-delta result"
    assert got == Searcher(root).search(["omega"], k=5)
    assert cs.stats()["invalidations"] == 1
    # phrase path shares the same generation guard
    assert cs.search_phrase(["omega", "omega"], k=5) \
        == Searcher(root).search_phrase(["omega", "omega"], k=5)
    # compact: NEW epoch published
    compact(root, "ep2")
    assert mf.current_epoch(root) != "ep1"
    again = cs.search(["omega"], k=5)
    assert again == Searcher(root).search(["omega"], k=5)
    assert cs.stats()["invalidations"] == 2
    # results across the whole surface still identical post-invalidate
    for q in (["alpha"], ["beta", "gamma"], ["zeta"]):
        assert cs.search(q, k=5) == Searcher(root).search(q, k=5)
    assert cs.msearch([["alpha"], ["omega"]], k=3) \
        == [Searcher(root).search(["alpha"], k=3),
            Searcher(root).search(["omega"], k=3)]


def test_cache_under_concurrent_compaction(ray_session, tmp_path):
    """Stress the gc-race window the review found: a reader hammering
    a CachedSearcher while a compactor repeatedly publishes new epochs
    and gc's old ones.  Contract: no exception ever escapes, and every
    result equals a fresh Searcher's on SOME valid generation (the
    reader may legitimately serve the epoch just before or after a
    swap — so results are checked against the pre/post answer set,
    which here is identical because compaction never changes ranks)."""
    import threading

    root = _build(tmp_path, DOCS, name="race")
    want = Searcher(root).search(["alpha"], k=5)
    cs = CachedSearcher(root)
    errors: list = []
    stop = threading.Event()

    def reader():
        try:
            while not stop.is_set():
                got = cs.search(["alpha"], k=5)
                assert got == want, got
        except Exception as ex:        # pragma: no cover
            errors.append(ex)

    t = threading.Thread(target=reader)
    t.start()
    try:
        for i in range(4):
            compact(root, f"ep.r{i}", gc_old=True)
    finally:
        stop.set()
        t.join(timeout=30)
    assert not errors, errors
    assert cs.invalidations >= 1
    assert cs.search(["alpha"], k=5) == Searcher(root).search(
        ["alpha"], k=5)


def test_cache_threaded_readers_under_mutation(ray_session, tmp_path):
    """The round-3 advice item: CachedSearcher is now lock-protected,
    so many reader threads sharing one instance across a concurrent
    delta+compact must neither crash nor ever return a result that
    differs from SOME legitimate generation's answer."""
    import threading

    root = _build(tmp_path, DOCS, name="thr")
    cs = CachedSearcher(root, capacity=64)

    # legitimate answers: pre-delta and post-delta generations
    before = Searcher(root).search(["alpha"], k=5)
    errors, results = [], []

    def reader():
        try:
            for _ in range(200):
                results.append(tuple(map(tuple,
                                         cs.search(["alpha"], k=5))))
        except Exception as e:          # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=reader) for _ in range(4)]
    for t in threads:
        t.start()
    apply_delta(_events([{"seq": 1, "type": "INSERT", "repo": "r9",
                          "path": "z.py", "commit": "c9",
                          "lang": "python",
                          "content": "alpha omega"}]), root)
    compact(root, "ep2")
    for t in threads:
        t.join()
    assert not errors
    after = Searcher(root).search(["alpha"], k=5)
    legit = {tuple(map(tuple, before)), tuple(map(tuple, after))}
    assert set(results) <= legit and len(results) == 800
