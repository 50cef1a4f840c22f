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
FIXTURES.md F2).  Last-writer-wins is PER KEY and EXACT across
batches: within a batch the highest-seq event per (repo, path) wins,
and an event only applies if its seq is newer than the key's last
recorded write (live row ``event_seq``, DELETE memory in
``key_seqs.parquet``, or the snapshot floor ``base_event_seq``).
At-least-once redelivery, offset rewinds, and out-of-order batch
arrival all resolve to the same final state as seq-ordered delivery —
the guarantee the reference gets from processing a key's events in
partition order (listenservice.py:195), generalized.

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


_base_event_seq = mf.base_event_seq


def _read_key_seq_file(path: str, keys: set, out: dict) -> None:
    """Max-merge one (repo, path, event_seq) parquet into ``out`` for
    the keys of interest.  Key-seq files hold only applied DELETEs and
    no-op same-version upserts, so they stay small relative to the
    corpus; at 10^12-key scale this read distributes exactly like the
    docs scan (same broadcast-filtered per-file task shape)."""
    t = pq.read_table(path, columns=["repo", "path", "event_seq"])
    for r, p, s in zip(t["repo"].to_pylist(), t["path"].to_pylist(),
                       t["event_seq"].to_pylist()):
        k = (r, p)
        if k in keys and int(s) > out.get(k, -1):
            out[k] = int(s)


def _live_key_index(index_root: str, manifest: dict,
                    keys: set[tuple[str, str]], mode: str | None = None
                    ) -> tuple[dict, dict]:
    """Returns ``(live, key_seqs)`` for the given keys:

    * ``live``: (repo, path) → (doc_id, length) of the currently-live
      doc under the sequenced-tombstone rule — a docs row written by
      source s (base = 0, delta record j = j) is live iff no tombstone
      for its id has seq > s.
    * ``key_seqs``: (repo, path) → last EVENT seq that wrote the key:
      the live row's ``event_seq`` (per-row column; base rows default
      to the manifest's ``base_event_seq``), max-merged with the
      epoch's key-seq memory (applied DELETEs and no-op upserts).
      Keys absent here have never been written past the base floor.

    Scans the epoch docs table plus every delta's added-docs file.
    Only rows matching ``keys`` (one delta batch — the broadcast side)
    ever reach the driver; for docs tables past
    ``_LIVE_INDEX_DRIVER_BYTES`` the scan itself runs as Ray tasks,
    one per docs file, so the corpus-sized read is distributed while
    newest-file-wins precedence is preserved via the file ordinal."""
    base_floor = _base_event_seq(manifest)
    files = list(mf.docs_files(index_root, manifest["epoch"]))
    file_seqs = [0] * len(files)
    # per-file fallback when the file lacks an event_seq column: base
    # files → base floor; legacy delta files → their record's span max
    file_ev_defaults = [base_floor] * len(files)
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
            file_ev_defaults.append(int(d.get("max_event_seq") or 0))

    tomb_ids, tomb_seqs = mf.tombstone_index(manifest)
    total = sum(os.path.getsize(f) for f in files)
    if mode is None:
        mode = "driver" if total < _LIVE_INDEX_DRIVER_BYTES else "distributed"

    def read_cols(f: str) -> pa.Table:
        cols = ["repo", "path", "doc_id", "length"]
        if "event_seq" in pq.read_schema(f).names:
            cols.append("event_seq")
        return pq.read_table(f, columns=cols)

    if mode == "distributed":
        import ray
        import ray.data
        keys_ref = ray.put(keys)

        def scan_file(batch: pa.Table) -> pa.Table:
            ks = ray.get(keys_ref)
            rows = {"ord": [], "repo": [], "path": [],
                    "doc_id": [], "length": [], "event_seq": []}
            for item in batch.to_pylist():
                t = read_cols(item["file"])
                evs = (t["event_seq"].to_pylist()
                       if "event_seq" in t.schema.names
                       else [None] * t.num_rows)
                for r, p, did, ln, ev in zip(t["repo"].to_pylist(),
                                             t["path"].to_pylist(),
                                             t["doc_id"].to_pylist(),
                                             t["length"].to_pylist(),
                                             evs):
                    if (r, p) in ks:
                        rows["ord"].append(item["ord"])
                        rows["repo"].append(r)
                        rows["path"].append(p)
                        rows["doc_id"].append(did)
                        rows["length"].append(ln)
                        rows["event_seq"].append(
                            -1 if ev is None else int(ev))
            return pa.table({
                "ord": pa.array(rows["ord"], pa.int64()),
                "repo": pa.array(rows["repo"], pa.string()),
                "path": pa.array(rows["path"], pa.string()),
                "doc_id": pa.array(rows["doc_id"], pa.int64()),
                "length": pa.array(rows["length"], pa.int64()),
                "event_seq": pa.array(rows["event_seq"], pa.int64()),
            })

        items = [{"ord": i, "file": f} for i, f in enumerate(files)]
        got = (ray.data.from_items(items)
               .map_batches(scan_file, batch_format="pyarrow", batch_size=1)
               .take_all())
        got.sort(key=lambda r: r["ord"])   # newest-file-wins precedence
        matched = [(r["repo"], r["path"], r["doc_id"], r["length"],
                    file_seqs[r["ord"]],
                    r["event_seq"] if r["event_seq"] >= 0
                    else file_ev_defaults[r["ord"]]) for r in got]
    else:
        matched = []
        for f, seq, ev_def in zip(files, file_seqs, file_ev_defaults):
            t = read_cols(f)          # later files overwrite
            evs = (t["event_seq"].to_pylist()
                   if "event_seq" in t.schema.names
                   else [None] * t.num_rows)
            for r, p, did, ln, ev in zip(
                    t["repo"].to_pylist(), t["path"].to_pylist(),
                    t["doc_id"].to_pylist(), t["length"].to_pylist(),
                    evs):
                if (r, p) in keys:
                    matched.append((r, p, did, ln, seq,
                                    ev_def if ev is None else int(ev)))

    live: dict[tuple[str, str], tuple[int, int]] = {}
    key_seqs: dict[tuple[str, str], int] = {}
    for r, p, did, ln, seq, ev in matched:
        key_seqs[(r, p)] = max(key_seqs.get((r, p), -1), ev)
        if mf.live_posting_mask(np.array([did], dtype=np.int64), seq,
                                tomb_ids, tomb_seqs)[0]:
            live[(r, p)] = (did, ln)
        else:
            # this version is dead; a later file may re-add the key
            live.pop((r, p), None)

    # key-seq memory: epoch-level file (folded by compaction) plus each
    # delta record's file (applied DELETEs + no-op upsert bumps)
    edir = mf.epoch_dir(index_root, manifest["epoch"])
    epoch_ks = os.path.join(edir, "key_seqs.parquet")
    if os.path.exists(epoch_ks):
        _read_key_seq_file(epoch_ks, keys, key_seqs)
    for d in manifest.get("deltas", []):
        p = d.get("key_seqs")
        if p:
            if not os.path.exists(p):
                # same loud-failure stance as the added-docs check
                # above: lost per-key memory re-applies stale events
                raise FileNotFoundError(
                    f"delta record {d.get('seq')} key_seqs file "
                    f"missing: {p} — index is inconsistent; run fsck")
            _read_key_seq_file(p, keys, key_seqs)
    return live, key_seqs


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


def apply_with_seq_allocation(build_events, index_root: str,
                              cfg: EngineConfig | None = None) -> dict:
    """Allocate the next event-seq range and apply in ONE critical
    section.  ``build_events(start_seq)`` must return the event batch
    (pyarrow Table) with seqs from ``start_seq`` upward.

    Separate ``next_event_seq()`` + ``apply_delta()`` calls race under
    concurrent publishers: both can allocate the same start seq, and
    the per-key LWW guard then treats the second batch's events as
    redeliveries of the first's for any key both touch.  Holding the
    index write lock across allocation + apply makes the seq range
    exclusive."""
    with mf.write_lock(index_root):
        start = mf.next_event_seq(index_root)
        ev = build_events(start)
        return _apply_delta_locked(ev, index_root, cfg)


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

    live, key_seqs = _live_key_index(index_root, manifest, set(final))
    base_floor = _base_event_seq(manifest)

    # PER-KEY sequenced LWW: an event applies iff its seq is newer than
    # the last seq that wrote the key (live row's event_seq, DELETE
    # memory, or the snapshot floor).  This is exact under at-least-once
    # redelivery, offset rewinds, AND cross-batch out-of-order arrival:
    # a delayed fresh batch applies for the keys it is newest for and
    # no-ops for keys a later batch already rewrote — batch-granular
    # span heuristics either lose those events or resurrect old ones.
    tomb_ids, tomb_dls = [], []
    adds = []
    key_seq_rows: list[tuple[str, str, int]] = []   # DELETEs + no-op bumps
    n_stale = 0
    for key, e in final.items():
        s = int(e["seq"])
        if s <= key_seqs.get(key, base_floor):
            n_stale += 1
            continue
        old = live.get(key)
        if e["type"] == "DELETE":
            if old is not None:
                tomb_ids.append(old[0]); tomb_dls.append(old[1])
            # remember the delete's seq even for unknown keys: a
            # delayed older INSERT must not resurrect the key later
            key_seq_rows.append((key[0], key[1], s))
        else:  # INSERT / UPDATE → upsert
            new_id = doc_id_of(e["repo"], e["path"], e["commit"])
            if old is not None and old[0] == new_id:
                # fresh upsert of the already-live version: skip the
                # re-index (the reference's diff-fields no-op,
                # commonhandler.py:68-83) but RECORD the seq bump so a
                # delayed older update cannot later beat this event
                key_seq_rows.append((key[0], key[1], s))
                continue
            if old is not None:
                tomb_ids.append(old[0]); tomb_dls.append(old[1])
            # delete → re-insert of the same version is a plain re-add:
            # under sequenced tombstones the new delta's postings
            # out-sequence the old tombstone, and unlike a revival
            # record this stays correct when the record is replayed
            # onto a compacted epoch whose base dropped the postings
            adds.append(e)

    if not adds and not tomb_ids and not key_seq_rows:
        # nothing applied (empty batch or pure redelivery): do NOT
        # append a manifest record — no-op records churn reader-pool
        # staleness checks and inflate the compaction trigger
        return {"noop": True, "seq": None,
                "max_event_seq": max_seq, "min_event_seq": min_seq,
                "n_added": 0, "n_deleted": 0, "n_stale": n_stale,
                "sum_dl_added": 0, "sum_dl_deleted": 0,
                "tombstones": None, "added_docs": None, "key_seqs": None,
                "segments": []}

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
        "key_seqs": None,
        "n_added": 0, "n_deleted": len(tomb_ids), "n_stale": n_stale,
        "sum_dl_added": 0,
        "sum_dl_deleted": int(sum(tomb_dls)),
    }

    if key_seq_rows:
        ks_path = os.path.join(ddir, "key_seqs.parquet")
        tmp = ks_path + ".tmp"
        pq.write_table(pa.table({
            "repo": pa.array([r for r, _, _ in key_seq_rows], pa.string()),
            "path": pa.array([p for _, p, _ in key_seq_rows], pa.string()),
            "event_seq": pa.array([s for _, _, s in key_seq_rows],
                                  pa.int64()),
        }), tmp)
        os.replace(tmp, ks_path)
        record["key_seqs"] = ks_path

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
        # per-row event seq: the key's LWW memory (rides through
        # compaction so a delayed older event still loses after the
        # delta log is folded away)
        seq_of = {(a["repo"], a["path"]): int(a["seq"]) for a in adds}
        keys = list(zip(tok_tbl["repo"].to_pylist(),
                        tok_tbl["path"].to_pylist()))
        ev_col = pa.array([seq_of[k] for k in keys], pa.int64())
        docs_tbl = tok_tbl.drop_columns(
            [c for c in ("terms", "tfs", "poss")
             if c in tok_tbl.schema.names]).append_column(
                 "event_seq", ev_col)
        if cfg.store_source:
            # source-enabled index (manifest-pinned): added docs carry
            # their raw content like the base rows, so get-with-source
            # and reindex stay complete across deltas
            content_of = {(a["repo"], a["path"]): (a["content"] or "")
                          for a in adds}
            docs_tbl = docs_tbl.append_column(
                "content", pa.array([content_of[k] for k in keys],
                                    pa.string()))
        pq.write_table(docs_tbl, tmp)
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


def _keys_for_doc_ids(index_root: str, manifest: dict,
                      doc_ids: "np.ndarray") -> list[tuple[str, str]]:
    """Identity keys (repo, path) of the given doc_ids — a
    doc_id-pruned scan of the epoch docs files + delta added-docs
    files (predicate pushdown, never a full-table decode; the same
    bounded stored-field-fetch stance as Searcher.get_doc).  The id
    set is bounded by the caller's query dfs, so driver-side collection
    is bounded by the match's blast radius."""
    import pyarrow.dataset as pads

    # missing="raise": a silently-skipped source would turn a matched
    # doc's deletion into a silent no-op (the _live_key_index stance)
    sources = [f for f, _seq in
               mf.docs_sources(index_root, manifest, missing="raise")]
    want = pa.array(np.unique(np.asarray(doc_ids, dtype=np.int64)))
    keys: set[tuple[str, str]] = set()
    for f in sources:
        t = pads.dataset(f).to_table(
            columns=["doc_id", "repo", "path"],
            filter=pads.field("doc_id").isin(want))
        keys.update(zip(t["repo"].to_pylist(), t["path"].to_pylist()))
    return sorted(keys)


def delete_by_query(index_root: str, terms: list[str],
                    operator: str = "or",
                    cfg: EngineConfig | None = None) -> dict:
    """ES ``_delete_by_query`` analog (the query-driven form of the
    reference's ES delete sink, deleteservice shape): find the live
    documents matching ``terms`` (``or`` = any term, ``and`` = every
    term), then emit DELETE events for their identity keys through the
    locked seq-allocating delta path — so the deletion is idempotent,
    redelivery-safe, sequenced against concurrent publishers, and
    folds into the next compaction like any other delta batch.

    The matched id set comes from posting unions/intersections
    (bounded by the query terms' dfs, no scoring); the key fetch is a
    doc_id-pruned scan.  A second identical call is a no-op: the
    matched docs' postings are already tombstoned, so the match set is
    empty.  Returns the delta record plus ``n_matched``.

    Match, key fetch, seq allocation, and apply all sit inside ONE
    write-lock critical section: a match set computed outside the lock
    could race a concurrent UPDATE of a matched key (the update's new
    version no longer matches, but the later-sequenced DELETE would
    still kill it — the version-conflict case ES's _delete_by_query
    aborts on)."""
    from mee_ray.query import Searcher

    with mf.write_lock(index_root):
        s = Searcher(index_root)
        matched = s.matched_doc_ids(terms, operator)
        if matched.size == 0:
            return {"noop": True, "seq": None, "n_matched": 0,
                    "n_added": 0, "n_deleted": 0}
        keys = _keys_for_doc_ids(index_root, s.manifest, matched)
        start_seq = mf.next_event_seq(index_root)
        n = len(keys)
        ev = pa.table({
            "seq": pa.array(range(start_seq, start_seq + n), pa.int64()),
            "type": pa.array(["DELETE"] * n, pa.string()),
            "repo": pa.array([k[0] for k in keys], pa.string()),
            "path": pa.array([k[1] for k in keys], pa.string()),
            "commit": pa.array([None] * n, pa.string()),
            "lang": pa.array([None] * n, pa.string()),
            "content": pa.array([None] * n, pa.string()),
        })
        rec = _apply_delta_locked(ev, index_root, cfg)
    rec["n_matched"] = int(matched.size)
    return rec


def _live_rows_for_doc_ids(index_root: str, manifest: dict,
                           doc_ids: "np.ndarray") -> list[dict]:
    """Live stored rows (repo, path, lang, content) of the given
    doc_ids — the update_by_query fetch.  Requires a source-enabled
    index.  Same doc_id-pruned pushdown scan as ``_keys_for_doc_ids``;
    when a doc_id appears in several sources (a same-commit
    resurrection), the highest-seq source wins, matching
    ``Searcher.get_doc``."""
    import pyarrow.dataset as pads

    sources = mf.docs_sources(index_root, manifest, missing="raise")
    want = pa.array(np.unique(np.asarray(doc_ids, dtype=np.int64)))
    best: dict[int, tuple[int, dict]] = {}
    for f, seq in sources:
        t = pads.dataset(f).to_table(
            columns=["doc_id", "repo", "path", "lang", "content"],
            filter=pads.field("doc_id").isin(want))
        for row in t.to_pylist():
            did = row["doc_id"]
            if did not in best or seq >= best[did][0]:
                best[did] = (seq, row)
    return [r for _, r in sorted(best.values(),
                                 key=lambda x: (x[1]["repo"],
                                                x[1]["path"]))]


def update_by_query(index_root: str, terms: list[str], transform,
                    operator: str = "or",
                    cfg: EngineConfig | None = None) -> dict:
    """ES ``_update_by_query`` analog — the reference's
    query-then-scripted-update loop (commonhandler.py:107-130, its
    painless codegen replaced by a plain content transform): find the
    live documents matching ``terms``, apply ``transform(content) →
    new content`` to each, and re-emit the changed ones as UPDATE
    events through the locked seq-allocating delta path.

    Requires a source-enabled index (``store_source=True``) — the
    transform needs the stored content.

    The new version key (commit) is ``sha256(new content)[:40]``:
    deterministic from the content, so rows the transform leaves
    unchanged are skipped outright, a re-run of the same transform
    emits the same versions (no-op upserts under the per-key LWW
    guard), and the reference's ``retry_on_conflict=256`` loop
    collapses into idempotence.  Match, fetch, transform, seq
    allocation and apply share ONE write-lock critical section (the
    delete_by_query race stance)."""
    import hashlib

    from mee_ray.query import Searcher

    with mf.write_lock(index_root):
        s = Searcher(index_root)
        if not s.manifest.get("store_source"):
            raise ValueError("update_by_query needs a source-enabled "
                             "index (store_source=True at build)")
        matched = s.matched_doc_ids(terms, operator)
        if matched.size == 0:
            return {"noop": True, "seq": None, "n_matched": 0,
                    "n_transformed": 0, "n_added": 0, "n_deleted": 0}
        rows = _live_rows_for_doc_ids(index_root, s.manifest, matched)
        changed = []
        for r in rows:
            old = r["content"] or ""
            new = transform(old)
            if not isinstance(new, str):
                raise TypeError("transform must return str content")
            if new != old:
                changed.append((r, new))
        if not changed:
            return {"noop": True, "seq": None,
                    "n_matched": int(matched.size),
                    "n_transformed": 0, "n_added": 0, "n_deleted": 0}
        start_seq = mf.next_event_seq(index_root)
        n = len(changed)
        ev = pa.table({
            "seq": pa.array(range(start_seq, start_seq + n), pa.int64()),
            "type": pa.array(["UPDATE"] * n, pa.string()),
            "repo": pa.array([r["repo"] for r, _ in changed]),
            "path": pa.array([r["path"] for r, _ in changed]),
            "commit": pa.array(
                [hashlib.sha256(c.encode()).hexdigest()[:40]
                 for _, c in changed], pa.string()),
            "lang": pa.array([r["lang"] for r, _ in changed]),
            "content": pa.array([c for _, c in changed], pa.string()),
        })
        rec = _apply_delta_locked(ev, index_root, cfg)
    rec["n_matched"] = int(matched.size)
    rec["n_transformed"] = n
    return rec
