"""Incremental delta application — the reimagining of the reference's
Kafka→ES SyncService (reference services/syncservice.py:53-114,
modules/handlers/v1/commonhandler.py:595-1367).

The reference patches ES documents in place with generated painless
scripts; our segments are immutable, so the write path is log-
structured (SURVEY.md §2.5 mapping):

  INSERT           → tokenize → delta segments + added-docs record
  DELETE           → tombstone the live doc_id of (repo, path)
  UPDATE           → tombstone old doc_id + add new doc (documents are
                     atomic: content change ⇒ new commit ⇒ new doc_id —
                     the anchor-field delete+reinsert semantics of
                     commonhandler.py:1087-1104, generalized)
  path rename      → arrives as DELETE(old key) + INSERT(new key)

Events carry a monotone ``seq`` (the Kafka-offset analog,
FIXTURES.md F2); within one applied batch the LAST event per
(repo, path) wins — the same last-writer-wins the reference gets from
processing a key's events in partition order (listenservice.py:195).

Each applied batch appends one delta record to the manifest with exact
stats deltas (n/sum_dl added+deleted) so N and avgdl stay
oracle-identical without recomputation (manifest.live_stats), plus the
segment + tombstone file paths.  Tombstoned postings are physically
dropped at compaction (mee_ray.merge).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from mee_ray import manifest as mf
from mee_ray.build import DocTokenize, ExplodeTriples, make_encode_partition
from mee_ray.config import EngineConfig, resolve_index_config
from mee_ray.ids import doc_id_of


# docs tables below this total size are scanned on the driver (the
# pyarrow C++ scanner reads a few dozen MB faster than Ray tasks can
# start); above it the scan fans out as a broadcast-filtered map_batches
_LIVE_INDEX_DRIVER_BYTES = 64 << 20


def _live_key_index(index_root: str, manifest: dict,
                    keys: set[tuple[str, str]], mode: str | None = None
                    ) -> dict[tuple[str, str], tuple[int, int]]:
    """(repo, path) → (doc_id, length) for currently-live docs among
    ``keys`` under the sequenced-tombstone rule: a docs row written by
    source s (base = 0, delta record j = j) is live iff no tombstone
    for its id has seq > s.

    Scans the epoch docs table plus every delta's added-docs file.
    Only rows matching ``keys`` (one delta batch — the broadcast side)
    ever reach the driver; for docs tables past
    ``_LIVE_INDEX_DRIVER_BYTES`` the scan itself runs as Ray tasks,
    one per docs file, so the corpus-sized read is distributed while
    newest-file-wins precedence is preserved via the file ordinal."""
    files = list(mf.docs_files(index_root, manifest["epoch"]))
    file_seqs = [0] * len(files)
    for d in manifest.get("deltas", []):
        if d.get("added_docs"):
            if not os.path.exists(d["added_docs"]):
                # a silently skipped source would turn an UPDATE of a
                # key living in this file into a duplicate (no
                # tombstone for the old version) and a DELETE into a
                # no-op — corruption must fail loudly (fsck agrees)
                raise FileNotFoundError(
                    f"delta record {d.get('seq')} added-docs file "
                    f"missing: {d['added_docs']} — index is "
                    f"inconsistent; run fsck")
            files.append(d["added_docs"])
            file_seqs.append(d["seq"])

    tomb_ids, tomb_seqs = mf.tombstone_index(manifest)
    total = sum(os.path.getsize(f) for f in files)
    if mode is None:
        mode = "driver" if total < _LIVE_INDEX_DRIVER_BYTES else "distributed"

    def matches_of(t: pa.Table, seq: int):
        for r, p, did, ln in zip(t["repo"].to_pylist(), t["path"].to_pylist(),
                                 t["doc_id"].to_pylist(),
                                 t["length"].to_pylist()):
            if (r, p) in keys:
                yield r, p, did, ln, seq

    if mode == "distributed":
        import ray
        import ray.data
        keys_ref = ray.put(keys)

        def scan_file(batch: pa.Table) -> pa.Table:
            ks = ray.get(keys_ref)
            rows = {"ord": [], "repo": [], "path": [],
                    "doc_id": [], "length": []}
            for item in batch.to_pylist():
                t = pq.read_table(item["file"],
                                  columns=["repo", "path", "doc_id",
                                           "length"])
                for r, p, did, ln in zip(t["repo"].to_pylist(),
                                         t["path"].to_pylist(),
                                         t["doc_id"].to_pylist(),
                                         t["length"].to_pylist()):
                    if (r, p) in ks:
                        rows["ord"].append(item["ord"])
                        rows["repo"].append(r)
                        rows["path"].append(p)
                        rows["doc_id"].append(did)
                        rows["length"].append(ln)
            return pa.table({
                "ord": pa.array(rows["ord"], pa.int64()),
                "repo": pa.array(rows["repo"], pa.string()),
                "path": pa.array(rows["path"], pa.string()),
                "doc_id": pa.array(rows["doc_id"], pa.int64()),
                "length": pa.array(rows["length"], pa.int64()),
            })

        items = [{"ord": i, "file": f} for i, f in enumerate(files)]
        got = (ray.data.from_items(items)
               .map_batches(scan_file, batch_format="pyarrow", batch_size=1)
               .take_all())
        got.sort(key=lambda r: r["ord"])   # newest-file-wins precedence
        matched = [(r["repo"], r["path"], r["doc_id"], r["length"],
                    file_seqs[r["ord"]]) for r in got]
    else:
        matched = []
        for f, seq in zip(files, file_seqs):   # later files overwrite
            t = pq.read_table(f, columns=["repo", "path", "doc_id",
                                          "length"])
            matched.extend(matches_of(t, seq))

    live: dict[tuple[str, str], tuple[int, int]] = {}
    for r, p, did, ln, seq in matched:
        if mf.live_posting_mask(np.array([did], dtype=np.int64), seq,
                                tomb_ids, tomb_seqs)[0]:
            live[(r, p)] = (did, ln)
        else:
            # this version is dead; a later file may re-add the key
            live.pop((r, p), None)
    return live


def apply_delta(events, index_root: str, cfg: EngineConfig | None = None,
                epoch: str | None = None) -> dict:
    """Apply one batch of delta events (a Ray Dataset or pyarrow Table
    with columns seq, type, repo, path, commit, lang, content) to the
    CURRENT epoch. Returns the appended delta record."""
    # serialize index mutators (the reference's Redis-redlock analog):
    # the manifest append below is a read-modify-write — a concurrent
    # applier would silently drop one of the two records
    with mf.write_lock(index_root):
        return _apply_delta_locked(events, index_root, cfg, epoch)


def _apply_delta_locked(events, index_root: str,
                        cfg: EngineConfig | None = None,
                        epoch: str | None = None) -> dict:
    import ray.data

    manifest = mf.load_manifest(index_root, epoch)
    mf.require_format(manifest)
    # the index's own recorded routing/scoring parameters are
    # authoritative: a cfg that disagrees would route delta postings to
    # partitions the merge never reads (silently dropped)
    cfg = resolve_index_config(manifest, cfg)
    epoch = manifest["epoch"]
    edir = mf.epoch_dir(index_root, epoch)

    _EV_COLS = ("seq", "type", "repo", "path", "commit", "lang",
                "content")
    if hasattr(events, "to_arrow_refs") or hasattr(events, "iter_batches"):
        batches = [b for b in events.iter_batches(batch_format="pyarrow",
                                                  batch_size=1 << 18)]
        ev = (pa.concat_tables(batches) if batches
              else pa.table({c: pa.array([], pa.int64() if c == "seq"
                                         else pa.string())
                             for c in _EV_COLS}))
    else:
        ev = events

    # stale-replay guard: a batch already INCORPORATED by this index —
    # its [min, max] event span lies inside the snapshot watermark or
    # inside one applied record's span — is a redelivery/offset-rewind;
    # re-applying it would tombstone a NEWER live version and
    # resurrect the older one (a lost update).  Span containment, not
    # a global high-water cutoff: concurrent appliers may land fresh
    # batches out of seq order (their spans are disjoint from every
    # applied record's), and those must still apply.
    if ev.num_rows:
        seqs = ev["seq"].to_numpy(zero_copy_only=False)
        b_lo, b_hi = int(seqs.min()), int(seqs.max())
        wm = int(manifest.get("event_watermark") or 0)
        stale = b_hi <= wm or any(
            d.get("max_event_seq")
            and int(d.get("min_event_seq") or d["max_event_seq"]) <= b_lo
            and b_hi <= int(d["max_event_seq"])
            for d in manifest.get("deltas", []))
        if stale:
            ev = ev.slice(0, 0)

    # last-writer-wins per (repo, path), by seq
    order = np.argsort(ev["seq"].to_numpy(zero_copy_only=False), kind="stable")
    final: dict[tuple[str, str], dict] = {}
    rows = {name: ev[name].to_pylist() for name in _EV_COLS}
    max_seq, min_seq = 0, 0
    for i in order:
        key = (rows["repo"][i], rows["path"][i])
        s = int(rows["seq"][i])
        max_seq = max(max_seq, s)
        min_seq = s if min_seq == 0 else min(min_seq, s)
        final[key] = {k: rows[k][i] for k in rows}

    live = _live_key_index(index_root, manifest, set(final))

    tomb_ids, tomb_dls = [], []
    adds = []
    for key, e in final.items():
        old = live.get(key)
        if e["type"] == "DELETE":
            if old is not None:
                tomb_ids.append(old[0]); tomb_dls.append(old[1])
        else:  # INSERT / UPDATE → upsert
            new_id = doc_id_of(e["repo"], e["path"], e["commit"])
            if old is not None and old[0] == new_id:
                # redelivered upsert of the already-live version:
                # no-op, so at-least-once delivery stays idempotent
                # (the analog of the reference's upsert-by-id semantics
                # under Kafka redelivery, commonhandler.py:68-83)
                continue
            if old is not None:
                tomb_ids.append(old[0]); tomb_dls.append(old[1])
            # delete → re-insert of the same version is a plain re-add:
            # under sequenced tombstones the new delta's postings
            # out-sequence the old tombstone, and unlike a revival
            # record this stays correct when the record is replayed
            # onto a compacted epoch whose base dropped the postings
            adds.append(e)

    seq_no = len(manifest.get("deltas", [])) + 1
    ddir = os.path.join(edir, "deltas", f"delta-{seq_no:06d}")
    # A directory at this seq that the manifest does not reference is
    # debris from a crashed apply (segments written, manifest append
    # never reached).  Clear it: otherwise the encoder's lineage-sidecar
    # resume short-circuit would return the aborted batch's segments
    # for THIS batch's events.
    if os.path.isdir(ddir):
        import shutil
        shutil.rmtree(ddir)
    os.makedirs(os.path.join(ddir, "segments"), exist_ok=True)

    tomb_path = os.path.join(ddir, "tombstones.parquet")
    tmp = tomb_path + ".tmp"
    pq.write_table(pa.table({"doc_id": pa.array(tomb_ids, pa.int64())}), tmp)
    os.replace(tmp, tomb_path)

    record = {
        "seq": seq_no, "max_event_seq": max_seq, "min_event_seq": min_seq,
        "tombstones": tomb_path, "added_docs": None, "segments": [],
        "n_added": 0, "n_deleted": len(tomb_ids),
        "sum_dl_added": 0,
        "sum_dl_deleted": int(sum(tomb_dls)),
    }

    if adds:
        add_tbl = pa.table({
            "repo": pa.array([a["repo"] for a in adds], pa.string()),
            "path": pa.array([a["path"] for a in adds], pa.string()),
            "commit": pa.array([a["commit"] for a in adds], pa.string()),
            "lang": pa.array([a["lang"] for a in adds], pa.string()),
            "content": pa.array([a["content"] or "" for a in adds], pa.string()),
        })
        # stateless tasks: delta batches are small and latency-bound —
        # spawning an actor pool per batch would dominate apply time
        tok_ds = (ray.data.from_arrow(add_tbl)
                  .map_batches(DocTokenize(cfg), batch_format="pyarrow",
                               batch_size=cfg.tokenize_batch_size))
        # stage the tokenized adds once (small), then docs + segments
        tok_tbl = pa.concat_tables(
            [b for b in tok_ds.iter_batches(batch_format="pyarrow",
                                            batch_size=1 << 18)])
        added_docs_path = os.path.join(ddir, "added_docs.parquet")
        tmp = added_docs_path + ".tmp"
        pq.write_table(tok_tbl.drop_columns(
            [c for c in ("terms", "tfs", "poss")
             if c in tok_tbl.schema.names]), tmp)
        os.replace(tmp, added_docs_path)

        # delta segments: same explode + encode machinery as the full
        # build, but over the tiny add set; tfnorm uses the BASE avgdl
        # of the epoch — both engines recompute exact scores at query
        # time from (tf, dl, live avgdl), so this only affects the
        # stored (unused until compaction) block-max hints
        tri_cols = ["doc_id", "length", "terms", "tfs"] + \
            (["poss"] if "poss" in tok_tbl.schema.names else [])
        triples = (ray.data.from_arrow(tok_tbl.select(tri_cols))
                   .map_batches(ExplodeTriples(cfg), batch_format="pyarrow"))
        seg_out = triples.groupby("part").map_groups(
            make_encode_partition(os.path.join(ddir, "segments"),
                                  manifest["avgdl"] or 1.0, cfg),
            batch_format="pyarrow")
        lin = seg_out.take_all()
        record["segments"] = [r["path"] for r in lin]
        record["added_docs"] = added_docs_path
        record["n_added"] += tok_tbl.num_rows
        record["sum_dl_added"] += int(pa.compute.sum(tok_tbl["length"]).as_py() or 0)

    manifest.setdefault("deltas", []).append(record)
    epoch_name = manifest.pop("epoch")
    mf.write_manifest(index_root, epoch_name, manifest)
    return record
