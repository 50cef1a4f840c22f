"""Auto-compaction policy triggers (the merge scheduler's
should_compact): delta count, tombstone ratio, churn, delta bytes —
and the policy-gated fold stays oracle-identical end to end."""

import shutil

import pyarrow as pa
import pytest

from mee_ray.scheduler import MergePolicy, maybe_compact, should_compact


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
    ok, reason = should_compact(m, MergePolicy())
    assert not ok and "no deltas" in reason

    # synthetic manifests exercise each trigger independently
    base = {"n_docs": 100, "segments": [{"bytes": 1000}], "deltas": []}

    m1 = dict(base, deltas=[{"n_added": 0, "n_deleted": 0,
                             "segments": []}] * 8)
    ok, reason = should_compact(m1, MergePolicy())
    assert ok and "delta count" in reason

    m2 = dict(base, deltas=[{"n_added": 0, "n_deleted": 15,
                             "segments": []}])
    ok, reason = should_compact(m2, MergePolicy())
    assert ok and "tombstones" in reason

    m3 = dict(base, deltas=[{"n_added": 25, "n_deleted": 0,
                             "segments": []}])
    ok, reason = should_compact(m3, MergePolicy())
    assert ok and "churn" in reason

    m4 = dict(base, deltas=[{"n_added": 1, "n_deleted": 0,
                             "segments": []}] * 2)
    ok, reason = should_compact(m4, MergePolicy())
    assert not ok and "below thresholds" in reason

    # thresholds are policy-tunable
    ok, _ = should_compact(m4, MergePolicy(max_deltas=2))
    assert ok


def test_maybe_compact_reason_and_identity(built_index, ray_session,
                                           tmp_path):
    """Below threshold → no-op; above → folds with a reason, publishes
    the lineage-named epoch, and queries stay oracle-identical."""
    from mee_ray import manifest as mf
    from mee_ray.delta import apply_delta
    from mee_ray.ids import doc_id_of
    from mee_ray.oracle import OracleIndex
    from mee_ray.query import Searcher

    root = str(tmp_path / "index")
    shutil.copytree(built_index["index_root"], root)
    live = dict(built_index["live"])

    assert maybe_compact(root) is None      # no deltas → no-op

    keys = sorted(live)[:4]
    seq = 1
    for i, k in enumerate(keys):
        content = f"def policyPatched_{i}():\n    return policy_marker\n"
        apply_delta(_to_table(
            [_event(seq, "UPDATE", k[0], k[1], "d" * 40, content)]), root)
        live[k] = ("d" * 40, content)
        seq += 1

    # 4 deltas, churn 8/250: below a lax policy
    lax = MergePolicy(max_deltas=8, max_churn_ratio=0.5,
                      tombstone_ratio=0.5, delta_bytes_ratio=10.0)
    assert maybe_compact(root, policy=lax) is None
    old_epoch = mf.load_manifest(root)["epoch"]

    m2 = maybe_compact(root, policy=MergePolicy(max_deltas=3))
    assert m2 is not None and "delta count" in m2["compact_reason"]
    assert m2["epoch"] == f"{old_epoch}.c1"
    assert m2["deltas"] == []
    assert mf.load_manifest(root)["epoch"] == m2["epoch"]  # published

    oi = OracleIndex([(doc_id_of(r, p, c), content)
                      for (r, p), (c, content) in live.items()])
    s = Searcher(root)
    for terms in (["policy_marker"], ["def"], ["policypatched_2"]):
        assert s.search(terms, 10) == oi.search(terms, 10), terms


def test_delta_bytes_trigger(built_index, ray_session, tmp_path):
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
        m, MergePolicy(max_deltas=99, max_churn_ratio=9.0,
                       tombstone_ratio=0.9, delta_bytes_ratio=0.0001))
    assert ok and "delta bytes" in reason


def test_fsck_repair_debris(built_index, ray_session, tmp_path):
    """fsck_repair removes tmp leftovers and unreferenced segment
    files, rebuilds missing lineage sidecars, and leaves every
    referenced file, docs table, and manifest-less epoch dir alone —
    queries unchanged after repair."""
    import json
    import os

    from mee_ray import manifest as mf
    from mee_ray.query import Searcher

    root = str(tmp_path / "index")
    shutil.copytree(built_index["index_root"], root)
    edir = mf.epoch_dir(root, "ep1")

    # plant debris: a tmp leftover, an orphan segment + its sidecar,
    # and delete one real lineage sidecar
    tmp_f = os.path.join(edir, "segments", "part-00000.parquet.tmp.999")
    open(tmp_f, "wb").write(b"junk")
    orphan = os.path.join(edir, "segments", "part-99999.parquet")
    open(orphan, "wb").write(b"junk")
    open(orphan + ".lineage.json", "w").write("{}")
    m = mf.load_manifest(root)
    real_seg = m["segments"][0]["path"]
    os.remove(real_seg + ".lineage.json")
    # a manifest-less epoch dir (crashed build) must be untouched
    half = mf.epoch_dir(root, "half_built")
    os.makedirs(os.path.join(half, "segments"))
    keepme = os.path.join(half, "segments", "part-00000.parquet")
    open(keepme, "wb").write(b"resumable")

    before = Searcher(root).search(["def"], 10)
    rep = mf.fsck_repair(root)
    assert tmp_f in rep["removed"]
    assert orphan in rep["removed"]
    assert orphan + ".lineage.json" in rep["removed"]
    assert real_seg + ".lineage.json" in rep["sidecars_rebuilt"]
    assert "half_built" in rep["skipped_epochs"]
    assert os.path.exists(keepme)          # resumable build untouched
    assert os.path.exists(real_seg)        # referenced file untouched
    with open(real_seg + ".lineage.json") as f:
        lin = json.load(f)
    assert lin["sha256"] == m["segments"][0]["sha256"]
    assert Searcher(root).search(["def"], 10) == before
    # idempotent: second pass finds nothing
    rep2 = mf.fsck_repair(root)
    assert rep2["removed"] == [] and rep2["sidecars_rebuilt"] == []
    # full fsck still green
    assert mf.fsck(root)["ok"]


def test_compact_refuses_stale_target(built_index, ray_session,
                                      tmp_path):
    """The racer guard: a compactor that named its target from a STALE
    manifest (the target is now the published CURRENT, or any other
    manifested epoch) must refuse with CompactTargetExists — the old
    behavior rmtree'd the live epoch's segments.  maybe_compact treats
    the refusal as 'already folded' and returns None."""
    from mee_ray import manifest as mf
    from mee_ray.delta import apply_delta
    from mee_ray.merge import CompactTargetExists, compact

    root = str(tmp_path / "index")
    shutil.copytree(built_index["index_root"], root)
    old_epoch = mf.load_manifest(root)["epoch"]
    apply_delta(_to_table([
        _event(1, "INSERT", "r_pol", "new.py", "a" * 40,
               "def policy_probe():\n    return 1\n")]), root)

    compact(root, "ep_race")
    cur = mf.load_manifest(root)
    assert cur["epoch"] == "ep_race"
    # target IS the current epoch (the exact maybe_compact race shape)
    with pytest.raises(CompactTargetExists, match="IS the current"):
        compact(root, "ep_race")
    # live epoch untouched: still queryable, fsck clean
    assert mf.fsck(root, verify_hashes=False)["ok"]
    # target pinned by an alias: a live read target even though it is
    # no longer CURRENT — must refuse, never gut it
    apply_delta(_to_table([_event(2, "INSERT", "r_pol", "new2.py",
                                  "b" * 40,
                                  "def probe_two():\n    return 2\n")]),
                root)
    mf.set_alias(root, "prev", old_epoch)
    with pytest.raises(CompactTargetExists, match="alias"):
        compact(root, old_epoch)
    assert mf.fsck(root, verify_hashes=False)["ok"]
