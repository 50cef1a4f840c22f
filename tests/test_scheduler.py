"""Merge scheduler: size-tiered policy, epoch lineage naming, and the
singleton actor path — merged indexes stay rank-identical."""

import shutil

import pyarrow as pa
import pytest

from mee_ray.config import EngineConfig
from mee_ray.ids import doc_id_of
from mee_ray.oracle import OracleIndex, make_query_set
from mee_ray.query import Searcher
from mee_ray.scheduler import (MergePolicy, MergeScheduler, _next_epoch_name,
                               maybe_compact, should_compact)


def _delta(i, key, content):
    return pa.table({
        "seq": pa.array([i], pa.int64()),
        "type": pa.array(["UPDATE"]),
        "repo": pa.array([key[0]]),
        "path": pa.array([key[1]]),
        "commit": pa.array([f"{i:08x}" + "e" * 32]),
        "lang": pa.array(["py"]),
        "content": pa.array([content]),
    })


def test_policy_thresholds():
    m = {"n_docs": 100, "deltas": [], "segments": []}
    pol = MergePolicy(max_deltas=3, max_churn_ratio=0.5,
                      tombstone_ratio=0.5, delta_bytes_ratio=10.0)
    assert not should_compact(m, pol)[0]
    m["deltas"] = [{"n_added": 1, "n_deleted": 0, "segments": []}] * 2
    assert not should_compact(m, pol)[0]
    m["deltas"] = [{"n_added": 1, "n_deleted": 0,
                    "segments": []}] * 3                # count trigger
    assert should_compact(m, pol)[0]
    m["deltas"] = [{"n_added": 30, "n_deleted": 25,
                    "segments": []}]                    # churn trigger
    assert should_compact(m, pol)[0]


def test_epoch_lineage_names():
    assert _next_epoch_name({"epoch": "ep1"}) == "ep1.c1"
    assert _next_epoch_name({"epoch": "ep1.c1"}) == "ep1.c2"
    assert _next_epoch_name({"epoch": "ep1.c9"}) == "ep1.c10"


def test_maybe_compact_end_to_end(built_index, ray_session, tmp_path):
    from mee_ray.delta import apply_delta

    root = str(tmp_path / "idx")
    shutil.copytree(built_index["index_root"], root)
    live = dict(built_index["live"])
    keys = sorted(live)
    pol = MergePolicy(max_deltas=2, max_churn_ratio=1.0)

    assert maybe_compact(root, policy=pol) is None  # no deltas yet

    c1 = "def sched_fn_one(): return sched_token_one\n"
    apply_delta(_delta(1, keys[0], c1), root)
    live[keys[0]] = ("00000001" + "e" * 32, c1)
    assert maybe_compact(root, policy=pol) is None  # 1 < max_deltas

    c2 = "def sched_fn_two(): return sched_token_two\n"
    apply_delta(_delta(2, keys[1], c2), root)
    live[keys[1]] = ("00000002" + "e" * 32, c2)
    m2 = maybe_compact(root, policy=pol)
    assert m2 is not None and m2["epoch"] == "ep1.c1"
    assert m2["deltas"] == []

    oi = OracleIndex([(doc_id_of(r, p, c), content)
                      for (r, p), (c, content) in live.items()])
    s = Searcher(root)
    assert (s.n_docs, s.avgdl) == (oi.n_docs, oi.avgdl)
    for q in make_query_set([(i, c) for i, (_, c) in enumerate(live.values())],
                            n_queries=15, seed=13):
        assert s.search(q["terms"], q["k"]) == oi.search(q["terms"], q["k"])
    assert s.search(["sched_token_two"], 3) == oi.search(["sched_token_two"], 3)


def test_scheduler_actor_singleton_and_notify(built_index, ray_session,
                                              tmp_path):
    import ray

    from mee_ray.delta import apply_delta

    root = str(tmp_path / "idx")
    shutil.copytree(built_index["index_root"], root)
    keys = sorted(built_index["live"])

    a1 = MergeScheduler.get(root, policy=MergePolicy(max_deltas=1,
                                                     max_churn_ratio=1.0))
    a2 = MergeScheduler.get(root)
    assert a1._actor_id == a2._actor_id  # singleton per root

    assert ray.get(a1.notify.remote()) is None  # nothing pending
    apply_delta(_delta(1, keys[2],
                       "def actor_fn(): return actor_token_x\n"), root)
    new_epoch = ray.get(a1.notify.remote())
    assert new_epoch == "ep1.c1"
    st = ray.get(a1.stats.remote())
    assert st["merges_run"] == 1 and st["pending_deltas"] == 0
    assert Searcher(root).search(["actor_token_x"], 3)
    ray.kill(a1, no_restart=True)  # don't leak the detached actor


def test_shard_actor_failover(built_index, ray_session):
    """Query-path fault tolerance (VERDICT r4 #5): killing a shard
    actor — including with an msearch in flight — must be invisible:
    Ray restarts the actor from (index_root, pinned epoch) and retries
    the read-only call, so post-crash results are bit-identical
    (doc_ids AND float64 scores) to the pre-crash pool's."""
    import threading
    import time

    import ray

    from mee_ray.oracle import make_query_set
    from mee_ray.query import DistributedSearcher

    ds = DistributedSearcher(built_index["index_root"], n_actors=3)
    qset = make_query_set(built_index["docs"], n_queries=30, seed=21)
    queries = [sorted(set(q["terms"])) for q in qset]
    baseline = ds.msearch(queries, 10)
    assert baseline == [ds.search(q, 10) for q in queries]

    # cold kill: actor down BEFORE the next call
    ray.kill(ds.actors[0], no_restart=False)
    assert ds.msearch(queries, 10) == baseline

    # mid-flight kill: run msearch loops on a thread, kill every
    # actor once while calls are in the air
    results, errs = [], []

    def worker():
        try:
            for _ in range(6):
                results.append(ds.msearch(queries, 10))
        except Exception as e:          # surfaced to the assert below
            errs.append(e)

    th = threading.Thread(target=worker)
    th.start()
    for a in ds.actors:
        time.sleep(0.05)
        ray.kill(a, no_restart=False)
    th.join(timeout=120)
    assert not th.is_alive()
    assert not errs, errs
    assert all(r == baseline for r in results)

    # three-phase and conjunctive paths on the restarted pool
    for q in qset[:8]:
        assert ds.search(q["terms"], q["k"], mode="threephase") == \
            built_index["oracle"].search(q["terms"], q["k"])
    ds.shutdown()
