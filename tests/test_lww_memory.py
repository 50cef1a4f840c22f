"""Per-key LWW memory survival across epoch transitions.

Two regression suites for the same invariant — delta.py's documented
out-of-order-arrival guarantee ("a delayed OLDER event for a key loses;
a delayed FRESH event applies") must hold across:

* catch-up carry-over: a delta record relocated onto a successor epoch
  by publish_with_catchup must carry its ``key_seqs`` file along (the
  record previously kept pointing into the predecessor epoch, so
  gc_epochs silently destroyed the delete/upsert memory);
* reindex: the rebuilt epoch must keep ``base_event_seq`` at the CHAIN
  floor and fold per-key seqs into its own ``key_seqs.parquet``
  (previously the floor was collapsed to max(observed seq), dropping
  delayed fresh events below the watermark).
"""

import os

import pyarrow as pa
import pyarrow.parquet as pq

from mee_ray import manifest as mf
from mee_ray.build import build_index, reindex
from mee_ray.config import EngineConfig
from mee_ray.corpus import write_corpus
from mee_ray.delta import apply_delta
from mee_ray.merge import compact
from mee_ray.query import Searcher

COLS = ("seq", "type", "repo", "path", "commit", "lang", "content")


def _events(rows):
    return pa.table({
        "seq": pa.array([r[0] for r in rows], pa.int64()),
        "type": pa.array([r[1] for r in rows], pa.string()),
        "repo": pa.array([r[2] for r in rows], pa.string()),
        "path": pa.array([r[3] for r in rows], pa.string()),
        "commit": pa.array([r[4] for r in rows], pa.string()),
        "lang": pa.array([r[5] for r in rows], pa.string()),
        "content": pa.array([r[6] for r in rows], pa.string()),
    })


def _build(root, tmp, n_files=40, seed=77):
    cdir = write_corpus(f"{tmp}/corpus", n_files=n_files, seed=seed,
                        rows_per_file=40)
    import ray.data
    cfg = EngineConfig(num_shards=2, parts_per_shard=2,
                       store_source=True)
    build_index(ray.data.read_parquet(cdir), root, "ep1", cfg)
    t = pq.read_table(cdir)
    live = {}
    for r, p, c, content in zip(t["repo"].to_pylist(),
                                t["path"].to_pylist(),
                                t["commit"].to_pylist(),
                                t["content"].to_pylist()):
        if (r, p) not in live or c > live[(r, p)][0]:
            live[(r, p)] = (c, content)
    return cfg, live


def test_relocated_record_carries_key_seqs():
    rec = {"seq": 3, "tombstones": "/old/deltas/delta-000003/t.parquet",
           "added_docs": None, "deleted_keys": None,
           "key_seqs": "/old/deltas/delta-000003/key_seqs.parquet",
           "segments": []}
    out = mf._relocated_delta_record(rec, "/old/deltas/delta-000003",
                                     "/new/deltas/delta-000001", 1)
    assert out["key_seqs"] == "/new/deltas/delta-000001/key_seqs.parquet"
    assert out["tombstones"] == "/new/deltas/delta-000001/t.parquet"
    assert out["seq"] == 1


def test_catchup_carry_preserves_delete_memory(ray_session, tmp_path):
    """DELETE lands during a compaction; after carry-over + gc of the
    predecessor epoch, a redelivered STALE insert must still lose."""
    root = str(tmp_path / "index")
    cfg, live = _build(root, tmp_path)
    keys = sorted(live)
    ka, kb = keys[0], keys[1]

    # a first delta (applied DELETE of ka) folds into ep2's base
    apply_delta(_events([(1, "DELETE", ka[0], ka[1], None, None, None)]),
                root)
    compact(root, "ep2", auto_publish=False)
    # DELETE of kb lands on ep1 AFTER ep2's snapshot → carried over
    apply_delta(_events([(2, "DELETE", kb[0], kb[1], None, None, None)]),
                root)
    replayed = mf.publish_with_catchup(root, "ep2")
    assert replayed == 1
    m2 = mf.load_manifest(root)
    assert m2["epoch"] == "ep2"
    carried = m2["deltas"][-1]
    ep2_dir = mf.epoch_dir(root, "ep2")
    # the carried record's side files all live INSIDE ep2 now
    for field in ("tombstones", "key_seqs"):
        p = carried.get(field)
        assert p and p.startswith(ep2_dir), (field, p)
        assert os.path.exists(p), (field, p)
    # predecessor epoch gone: memory must survive on ep2 alone
    gone = mf.gc_epochs(root)
    assert any("ep1" in g for g in gone)
    # stale redelivery (seq 1 < delete seq 2) must NOT resurrect kb
    apply_delta(_events([(1, "INSERT", kb[0], kb[1], "e" * 40,
                          "python", "def zombie():\n    return 1\n")]),
                root)
    s = Searcher(root)
    assert s.get_doc(*kb) is None
    assert s.get_doc(*ka) is None


def test_reindex_applies_delayed_fresh_event(ray_session, tmp_path):
    """An event with seq BELOW the reindex watermark but targeting a
    key never written past the chain floor must still apply."""
    root = str(tmp_path / "index")
    cfg, live = _build(root, tmp_path, seed=78)
    keys = sorted(live)
    ka, kb, kc = keys[0], keys[1], keys[2]

    # seq 2 (UPDATE ka) and seq 3 (DELETE kc) applied; seq 1 in flight
    apply_delta(_events([
        (2, "UPDATE", ka[0], ka[1], "a" * 40, "python",
         "def updated_a():\n    return 2\n"),
        (3, "DELETE", kc[0], kc[1], None, None, None)]), root)
    m2 = reindex(root, "ep2")
    assert m2["epoch"] == "ep2"
    # chain floor preserved; watermark still covers seq 3
    assert m2["base_event_seq"] == 0
    assert m2["event_watermark"] == 3
    assert mf.next_event_seq(root) == 4
    # the folded per-key memory lives in the new epoch
    ks = os.path.join(mf.epoch_dir(root, "ep2"), "key_seqs.parquet")
    assert os.path.exists(ks)
    t = pq.read_table(ks)
    seq_of = {(r, p): s for r, p, s in zip(t["repo"].to_pylist(),
                                           t["path"].to_pylist(),
                                           t["event_seq"].to_pylist())}
    assert seq_of[ka] == 2
    assert seq_of[kc] == 3

    # delayed FRESH event: seq 1 for kb (never written) → applies
    apply_delta(_events([(1, "UPDATE", kb[0], kb[1], "b" * 40,
                          "python",
                          "def delayed_b():\n    return 1\n")]), root)
    s = Searcher(root)
    assert s.get_doc(*kb)["content"] == "def delayed_b():\n    return 1\n"
    # stale redelivery for ka (seq 2 == last write) → still a no-op
    apply_delta(_events([(2, "UPDATE", ka[0], ka[1], "z" * 40,
                          "python", "def stale_a():\n    return 0\n")]),
                root)
    s = Searcher(root)
    assert s.get_doc(*ka)["content"] == "def updated_a():\n    return 2\n"
    # delete memory: INSERT kc at seq 2 < delete seq 3 → stays dead
    apply_delta(_events([(2, "INSERT", kc[0], kc[1], "c" * 40,
                          "python", "def zombie_c():\n    return 0\n")]),
                root)
    s = Searcher(root)
    assert s.get_doc(*kc) is None


def test_fsck_checks_key_seqs(ray_session, tmp_path):
    """fsck must flag a missing key_seqs file (lost LWW memory)."""
    root = str(tmp_path / "index")
    cfg, live = _build(root, tmp_path, seed=79, n_files=20)
    ka = sorted(live)[0]
    apply_delta(_events([(1, "DELETE", ka[0], ka[1], None, None, None)]),
                root)
    m = mf.load_manifest(root)
    ks = m["deltas"][0]["key_seqs"]
    assert ks and os.path.exists(ks)
    assert mf.fsck(root, verify_hashes=False)["ok"]
    os.remove(ks)
    rep = mf.fsck(root, verify_hashes=False)
    assert not rep["ok"]
    assert any("key_seqs" in e for e in rep["errors"])
