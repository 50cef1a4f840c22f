"""Auto-compaction policy: the merge-scheduler trigger (size-tiered
analog of the reference's periodic full rebuild,
services/updateservice.py:47-80) must fire on measured debt — delta
count, tombstone ratio, delta bytes — and auto_compact must produce an
index rank-identical to what manual compact would."""

import shutil

import pyarrow as pa
import pytest

from mee_ray.merge import CompactionPolicy, auto_compact, should_compact


def _event(seq, etype, repo, path, commit=None, content=None):
    return {"seq": seq, "type": etype, "repo": repo, "path": path,
            "commit": commit, "lang": "python" if content else None,
            "content": content}


def _to_table(events):
    cols = ("seq", "type", "repo", "path", "commit", "lang", "content")
    return pa.table({n: pa.array([e[n] for e in events]) for n in cols})


def test_should_compact_triggers(built_index):
    from mee_ray import manifest as mf
    m = mf.load_manifest(built_index["index_root"])
    assert m.get("deltas", []) == []
    ok, reason = should_compact(m)
    assert not ok and "no deltas" in reason

    # synthetic manifests exercise each trigger independently
    base = {"n_docs": 100, "segments": [{"bytes": 1000}], "deltas": []}

    m1 = dict(base, deltas=[{"n_deleted": 0, "segments": []}] * 8)
    ok, reason = should_compact(m1)
    assert ok and "delta count" in reason

    m2 = dict(base, deltas=[{"n_deleted": 15, "segments": []}])
    ok, reason = should_compact(m2)
    assert ok and "tombstones" in reason

    m3 = dict(base, deltas=[{"n_deleted": 0, "segments": []}] * 2)
    ok, reason = should_compact(m3)
    assert not ok and "below thresholds" in reason

    # thresholds are policy-tunable
    ok, _ = should_compact(m3, CompactionPolicy(max_deltas=2))
    assert ok


def test_auto_compact_end_to_end(built_index, ray_session, tmp_path):
    """Below threshold → no-op; above → folds, publishes a derived
    epoch name, and queries stay oracle-identical."""
    from mee_ray import manifest as mf
    from mee_ray.delta import apply_delta
    from mee_ray.ids import doc_id_of
    from mee_ray.oracle import OracleIndex
    from mee_ray.query import Searcher

    root = str(tmp_path / "index")
    shutil.copytree(built_index["index_root"], root)
    live = dict(built_index["live"])

    assert auto_compact(root) is None      # no deltas → no-op

    keys = sorted(live)[:4]
    seq = 1
    for i, k in enumerate(keys):
        content = f"def policyPatched_{i}():\n    return policy_marker\n"
        apply_delta(_to_table(
            [_event(seq, "UPDATE", k[0], k[1], "d" * 40, content)]), root)
        live[k] = ("d" * 40, content)
        seq += 1

    # 4 deltas, 4 tombstones on 250 docs (< 10%): below default policy
    lax = CompactionPolicy(max_deltas=8, tombstone_ratio=0.5,
                           delta_bytes_ratio=10.0)
    assert auto_compact(root, policy=lax) is None
    old_epoch = mf.load_manifest(root)["epoch"]

    m2 = auto_compact(root, policy=CompactionPolicy(max_deltas=3))
    assert m2 is not None and "delta count" in m2["compact_reason"]
    assert m2["epoch"] == f"{old_epoch}-c{seq - 1:08d}"
    assert m2["deltas"] == []
    assert mf.load_manifest(root)["epoch"] == m2["epoch"]  # published

    oi = OracleIndex([(doc_id_of(r, p, c), content)
                      for (r, p), (c, content) in live.items()])
    s = Searcher(root)
    for terms in (["policy_marker"], ["def"], ["policypatched_2"]):
        assert s.search(terms, 10) == oi.search(terms, 10), terms

    # a second auto_compact after more deltas derives a FRESH name
    # (the -cNNNNNNNN suffix is replaced, not stacked)
    k = sorted(live)[5]
    for _ in range(3):
        content = f"def again_{seq}():\n    return policy_marker\n"
        apply_delta(_to_table(
            [_event(seq, "UPDATE", k[0], k[1], "e" * 40, content)]), root)
        live[k] = ("e" * 40, content)
        seq += 1
    m3 = auto_compact(root, policy=CompactionPolicy(max_deltas=2))
    assert m3 is not None
    assert m3["epoch"] == f"{old_epoch}-c{seq - 1:08d}"
    oi2 = OracleIndex([(doc_id_of(r, p, c), content)
                       for (r, p), (c, content) in live.items()])
    s2 = Searcher(root)
    assert s2.search(["policy_marker"], 10) == oi2.search(
        ["policy_marker"], 10)


def test_auto_compact_delta_bytes_trigger(built_index, ray_session,
                                          tmp_path):
    from mee_ray import manifest as mf
    from mee_ray.delta import apply_delta

    root = str(tmp_path / "index")
    shutil.copytree(built_index["index_root"], root)
    k = sorted(built_index["live"])[0]
    big = "def hugeFn():\n" + "    x = alpha beta gamma\n" * 2000
    apply_delta(_to_table([_event(1, "UPDATE", k[0], k[1],
                                  "f" * 40, big)]), root)
    m = mf.load_manifest(root)
    ok, reason = should_compact(
        m, CompactionPolicy(max_deltas=99, tombstone_ratio=0.9,
                            delta_bytes_ratio=0.0001))
    assert ok and "delta bytes" in reason
