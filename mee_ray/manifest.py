"""Epoch manifests, atomic publish, lineage, GC.

The durable-state analog of the reference's Redis status machine + ES
alias swap + dirty-data GC:

- epoch manifest  ≙ RedisStatusConfig "epoch descriptor"
  (reference modules/status.py:101-195)
- CURRENT pointer rename ≙ atomic alias swap
  (reference services/updateservice.py:252-310)
- gc_epochs ≙ _cleanDirtyData (reference services/updateservice.py:100-114)
- per-partition lineage records ≙ binlog position file + Kafka offsets
  (reference services/listenservice.py:160-182)

All writes are write-temp-then-``os.replace`` so a crashed build never
leaves a readable-but-partial manifest, and the publish step is the
single atomic rename in the whole lifecycle (SURVEY.md §4.1).

Layout:
    index_root/
      CURRENT                      # epoch name (atomic pointer)
      epochs/<epoch>/
        _state.json                # coarse stage checkpoints (resume)
        docs_tok/  docs/  segments/
        manifest.json              # stats + segment lineage + delta log
        deltas/delta-<seq>/        # delta segments + tombstones
"""

from __future__ import annotations

import json
import os
import shutil
import time


def _atomic_write_json(path: str, obj: dict) -> None:
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(obj, f, indent=1, sort_keys=True)
    os.replace(tmp, path)


def epoch_dir(index_root: str, epoch: str) -> str:
    return os.path.join(index_root, "epochs", epoch)


def manifest_path(index_root: str, epoch: str) -> str:
    return os.path.join(epoch_dir(index_root, epoch), "manifest.json")


def write_manifest(index_root: str, epoch: str, manifest: dict) -> None:
    _atomic_write_json(manifest_path(index_root, epoch), manifest)


def load_manifest(index_root: str, epoch: str | None = None) -> dict:
    if epoch is None:
        epoch = current_epoch(index_root)
        if epoch is None:
            raise FileNotFoundError(f"no CURRENT epoch in {index_root}")
    else:
        epoch = resolve_epoch(index_root, epoch)
    with open(manifest_path(index_root, epoch)) as f:
        m = json.load(f)
    m["epoch"] = epoch
    return m


# --- named epoch aliases (ES index-alias analog) ---------------------------

def _aliases_path(index_root: str) -> str:
    return os.path.join(index_root, "ALIASES.json")


def load_aliases(index_root: str) -> dict:
    try:
        with open(_aliases_path(index_root)) as f:
            return json.load(f)
    except FileNotFoundError:
        return {}


def resolve_epoch(index_root: str, name: str) -> str:
    """An alias resolves to its target epoch; a plain epoch name (or
    an unknown name — the manifest open will fail loudly) passes
    through unchanged.  One level only: alias→alias chains are not
    allowed by :func:`set_alias`.  Filtered aliases (dict records)
    resolve to their epoch; the filter is read via
    :func:`alias_filter`."""
    v = load_aliases(index_root).get(name, name)
    return v["epoch"] if isinstance(v, dict) else v


ALIAS_FILTER_FIELDS = ("lang", "repo")


def alias_filter(index_root: str, name: str) -> dict | None:
    """The stored filter of a filtered alias ({"field", "value"}), or
    None for plain aliases / raw epoch names."""
    v = load_aliases(index_root).get(name)
    return v.get("filter") if isinstance(v, dict) else None


def set_alias(index_root: str, alias: str, epoch: str,
              filter: dict | None = None) -> None:
    """Create or atomically re-point a named epoch alias (the ES
    ``_aliases`` atomic-swap contract; CURRENT is the built-in
    publish alias and cannot be shadowed).  An alias names an EPOCH,
    not a frozen point-in-time — like an ES alias on a live index,
    readers through it see deltas applied to that epoch afterwards;
    :func:`snapshot` is the immutability tool.  The target must be an
    EXISTING epoch, never another alias; alias names must not collide
    with epoch directories.  Alias targets are pinned from
    :func:`gc_epochs`.

    ``filter`` makes a FILTERED alias (the ES alias-with-filter):
    ``{"field": <lang|repo>, "value": <str>}`` — readers resolving the
    alias restrict plain term search to live docs whose stored field
    equals the value (query.allowed_ids_for_field); non-plain query
    forms fail closed rather than silently ignore the filter."""
    if alias == "CURRENT":
        raise ValueError("CURRENT is the publish pointer — use publish()")
    if filter is not None:
        if (set(filter) != {"field", "value"}
                or filter["field"] not in ALIAS_FILTER_FIELDS
                or not isinstance(filter["value"], str)):
            raise ValueError(
                "alias filter must be {'field': one of "
                f"{ALIAS_FILTER_FIELDS}, 'value': str}}; got {filter!r}")
    with write_lock(index_root):
        if os.path.isdir(epoch_dir(index_root, alias)):
            raise ValueError(f"alias {alias!r} collides with an epoch name")
        al = load_aliases(index_root)
        if epoch in al:
            raise ValueError(f"alias target {epoch!r} is itself an alias")
        if not os.path.isfile(manifest_path(index_root, epoch)):
            raise FileNotFoundError(
                f"epoch {epoch!r} has no manifest; refusing to alias")
        al[alias] = ({"epoch": epoch, "filter": filter}
                     if filter is not None else epoch)
        _atomic_write_json(_aliases_path(index_root), al)


def drop_alias(index_root: str, alias: str) -> bool:
    with write_lock(index_root):
        al = load_aliases(index_root)
        if alias not in al:
            return False
        del al[alias]
        _atomic_write_json(_aliases_path(index_root), al)
        return True


import contextlib


def write_lock(index_root: str, timeout_s: float = 60.0):
    """Advisory exclusive lock serializing index mutators — the analog
    of the reference's Redis redlock around status transitions
    (updateservice.py:158-188).  apply_delta / compact / publish do
    read-modify-write cycles on the manifest; two concurrent writers
    would silently drop a delta record.  flock on <root>/.write_lock;
    raises TimeoutError rather than deadlocking."""
    return _flock(index_root, ".write_lock", timeout_s)


def compact_lock(index_root: str, timeout_s: float = 600.0):
    """Serializes whole COMPACTION runs (a separate file from
    write_lock, which publish_with_catchup re-acquires inside a
    compaction — one lock for both would self-deadlock).  Two
    concurrent compactors otherwise race on the same deterministic
    next-epoch directory and can publish a mix of two snapshots."""
    return _flock(index_root, ".compact_lock", timeout_s)


@contextlib.contextmanager
def _flock(index_root: str, name: str, timeout_s: float):
    import fcntl
    import time as _time

    os.makedirs(index_root, exist_ok=True)
    path = os.path.join(index_root, name)
    fd = os.open(path, os.O_CREAT | os.O_RDWR, 0o644)
    deadline = _time.monotonic() + timeout_s
    try:
        while True:
            try:
                fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
                break
            except BlockingIOError:
                if _time.monotonic() > deadline:
                    raise TimeoutError(
                        f"could not acquire index lock {path} "
                        f"within {timeout_s}s — another writer is "
                        f"active") from None
                _time.sleep(0.05)
        yield
    finally:
        try:
            fcntl.flock(fd, fcntl.LOCK_UN)
        finally:
            os.close(fd)


def require_format(manifest: dict) -> None:
    """Refuse to touch postings written by a different on-disk format
    version (misparsing tagged vs untagged buffers is silent garbage)."""
    from mee_ray.postings import FORMAT_VERSION
    got = manifest.get("format_version", 1)
    if got != FORMAT_VERSION:
        raise RuntimeError(
            f"epoch {manifest.get('epoch')} has posting format v{got}, "
            f"engine is v{FORMAT_VERSION} — rebuild the index")


def publish(index_root: str, epoch: str) -> None:
    """Atomic alias-swap analog: point CURRENT at a fully-built epoch."""
    if not os.path.exists(manifest_path(index_root, epoch)):
        raise FileNotFoundError(f"epoch {epoch} has no manifest; refusing to publish")
    tmp = os.path.join(index_root, f".CURRENT.tmp.{os.getpid()}")
    with open(tmp, "w") as f:
        f.write(epoch)
    os.replace(tmp, os.path.join(index_root, "CURRENT"))


def current_epoch(index_root: str) -> str | None:
    try:
        with open(os.path.join(index_root, "CURRENT")) as f:
            return f.read().strip()
    except FileNotFoundError:
        return None


def snapshot(index_root: str, dest: str,
             epoch: str | None = None) -> str:
    """Consistent point-in-time backup (the ES snapshot API analog):
    copy one epoch + every delta file its manifest references into
    ``dest`` and rewrite the manifest's absolute paths, producing a
    SELF-CONTAINED index root (restore = point a Searcher, or the
    whole engine, at it).  Referenced files are immutable, but the
    epoch tree gains new delta files while writers run, so the copy
    holds the same write_lock apply_delta takes; a referenced path
    that cannot be resolved to a file fails LOUDLY (a snapshot with a
    dangling tombstone ref would silently resurrect deletes)."""
    m = load_manifest(index_root, epoch)
    epoch = m.pop("epoch")
    if os.path.exists(os.path.join(dest, "CURRENT")):
        raise FileExistsError(f"{dest} already holds an index; "
                              "refusing to overwrite a snapshot")
    src_abs = os.path.abspath(index_root)
    prefixes = tuple({src_abs, os.path.realpath(index_root),
                      index_root.rstrip("/")})
    dest_abs = os.path.abspath(dest)

    def owned(p: str) -> str | None:
        for cand in (p, os.path.abspath(p)):
            for pref in prefixes:
                if cand.startswith(pref + os.sep):
                    return os.path.relpath(cand, pref)
        return None

    def referenced(o):
        if isinstance(o, str):
            if os.sep in o:
                if os.path.isfile(o):
                    yield o
                elif o.endswith((".parquet", ".json")):
                    raise FileNotFoundError(
                        f"manifest references missing file {o!r} — "
                        "refusing a dangling snapshot")
        elif isinstance(o, list):
            for x in o:
                yield from referenced(x)
        elif isinstance(o, dict):
            for x in o.values():
                yield from referenced(x)

    # the epoch tree wholesale (docs/, segments/, metrics, lineage);
    # under the writers' lock so a concurrent apply_delta can't
    # os.replace/rmtree files out from under copytree
    with write_lock(index_root):
        shutil.copytree(epoch_dir(index_root, epoch),
                        epoch_dir(dest, epoch), dirs_exist_ok=True)
    # plus every OTHER referenced file: in-root files (delta segments,
    # sidecars) keep their relative layout; FOREIGN absolute refs
    # (e.g. an index root that was itself copied from elsewhere) land
    # under external/ so the snapshot never dangles off its source
    mapping: dict[str, str] = {}
    for i, f in enumerate(sorted(set(referenced(m)))):
        rel = owned(f)
        if rel is None:
            rel = os.path.join(
                "external", f"{i:04d}_{os.path.basename(f)}")
        mapping[f] = os.path.join(dest_abs, rel)
        if rel.startswith("epochs" + os.sep):
            continue                       # copied with the tree above
        os.makedirs(os.path.dirname(mapping[f]), exist_ok=True)
        shutil.copy2(f, mapping[f])

    def rewrite(o):
        if isinstance(o, str):
            if o in mapping:
                return mapping[o]
            rel = owned(o)
            return os.path.join(dest_abs, rel) if rel else o
        if isinstance(o, list):
            return [rewrite(x) for x in o]
        if isinstance(o, dict):
            return {k: rewrite(v) for k, v in o.items()}
        return o

    _atomic_write_json(manifest_path(dest, epoch), rewrite(m))
    publish(dest, epoch)
    return dest


def gc_epochs(index_root: str, keep: set[str] | None = None) -> list[str]:
    """Delete epoch directories not in ``keep`` (default: CURRENT only).
    Mirrors _cleanDirtyData's 'anything not referenced by status is
    dirty' rule."""
    keep = set(keep or ())
    cur = current_epoch(index_root)
    if cur:
        keep.add(cur)
    # named aliases pin their targets — deleting an aliased epoch
    # would leave readers resolving to a vanished manifest
    keep.update(v["epoch"] if isinstance(v, dict) else v
                for v in load_aliases(index_root).values())
    removed = []
    root = os.path.join(index_root, "epochs")
    if not os.path.isdir(root):
        return removed
    for name in sorted(os.listdir(root)):
        if name not in keep:
            shutil.rmtree(os.path.join(root, name))
            removed.append(name)
    return removed


# --- coarse per-stage checkpoints (resume) ---------------------------------

def _state_path(index_root: str, epoch: str) -> str:
    return os.path.join(epoch_dir(index_root, epoch), "_state.json")


def load_state(index_root: str, epoch: str) -> dict:
    try:
        with open(_state_path(index_root, epoch)) as f:
            return json.load(f)
    except FileNotFoundError:
        return {}


def mark_stage(index_root: str, epoch: str, stage: str, **info) -> None:
    st = load_state(index_root, epoch)
    st[stage] = {"done": True, "ts": time.time(), **info}
    _atomic_write_json(_state_path(index_root, epoch), st)


def stage_done(index_root: str, epoch: str, stage: str) -> bool:
    return bool(load_state(index_root, epoch).get(stage, {}).get("done"))


DOCS_COLUMNS = ["doc_id", "repo", "path", "commit", "lang",
                "content_sha256", "length"]


def docs_files(index_root: str, epoch: str) -> list[str]:
    """Parquet files holding the epoch's docs table.  Built and
    compacted epochs write a slim ``docs/`` directory; ``docs_tok``
    is accepted as a fallback for epochs built by older versions that
    staged the full token table (column pruning skips terms/tfs)."""
    edir = epoch_dir(index_root, epoch)
    for sub in ("docs", "docs_tok"):
        d = os.path.join(edir, sub)
        if os.path.isdir(d):
            files = [os.path.join(d, f) for f in sorted(os.listdir(d))
                     if f.endswith(".parquet")]
            if files:
                return files
    return []


def write_metrics(index_root: str, epoch: str, cfg=None) -> dict:
    """Aggregate per-partition lineage + stage timings into one
    ``metrics.json`` per epoch (north_star: index metrics carried with
    the build).  Skew visibility: per-partition byte/posting spread of
    the shuffle output — the number to watch when picking
    ``salt_factor`` / ``hot_terms``."""
    state = load_state(index_root, epoch)
    lineage = state.get("segments", {}).get("lineage", [])
    bytes_per = [r["bytes"] for r in lineage] or [0]
    postings_per = [r["n_postings"] for r in lineage] or [0]
    m = {
        "epoch": epoch,
        "stage_seconds": {s: info.get("seconds")
                          for s, info in state.items()
                          if isinstance(info, dict) and "seconds" in info},
        "n_docs": state.get("stats", {}).get("n_docs"),
        "total_tokens": state.get("stats", {}).get("total_tokens"),
        "segments": {
            "n_partitions": len(lineage),
            "n_terms": sum(r["n_terms"] for r in lineage),
            "n_postings": sum(postings_per),
            "bytes_total": sum(bytes_per),
            "bytes_max_partition": max(bytes_per),
            "bytes_min_partition": min(bytes_per),
            "postings_max_partition": max(postings_per),
            "skew_ratio": (max(postings_per) * len(postings_per)
                           / max(1, sum(postings_per))) if lineage else None,
            "resumed_partitions": sum(1 for r in lineage if r.get("resumed")),
        },
    }
    _atomic_write_json(os.path.join(epoch_dir(index_root, epoch),
                                    "metrics.json"), m)
    return m


# --- snapshot watermark + catch-up replay at publish -----------------------
#
# The reference pins the new consumer group to the stream head before a
# rebuild so events arriving during the rebuild replay onto the new
# index before the alias swap (reference services/updateservice.py:
# 190-250, including the wait-until-caught-up loop).  Here: a new epoch
# records `catch_up_from` = (predecessor epoch, how many of its delta
# records the new epoch's base already covers); publish_with_catchup
# replays any records appended to the predecessor after that point by
# relocating their delta dirs onto the new epoch, loops until no new
# records appear, then flips CURRENT.  Replay is exact — the carried
# records were computed against precisely the state the new epoch's
# base folds in, so stats deltas and tombstones stay oracle-identical.


def _relocated_delta_record(rec: dict, src_dir: str, dst_dir: str,
                            seq_no: int) -> dict:
    def reloc(p):
        return (os.path.join(dst_dir, os.path.relpath(p, src_dir))
                if p else p)
    return dict(rec, seq=seq_no,
                tombstones=reloc(rec.get("tombstones")),
                added_docs=reloc(rec.get("added_docs")),
                deleted_keys=reloc(rec.get("deleted_keys")),
                key_seqs=reloc(rec.get("key_seqs")),
                segments=[reloc(s) for s in rec.get("segments", [])])


def carry_over_deltas(index_root: str, new_epoch: str,
                      records: list, n_consumed_now: int) -> None:
    """Copy delta records (their dirs + manifest entries) from the
    predecessor epoch onto ``new_epoch`` and advance the catch-up
    cursor.  ``records`` are the predecessor-manifest records to
    replay; ``n_consumed_now`` is the cursor value after them."""
    new_m = load_manifest(index_root, new_epoch)
    new_edir = epoch_dir(index_root, new_epoch)
    for rec in records:
        seq_no = len(new_m.setdefault("deltas", [])) + 1
        src_dir = os.path.dirname(rec["tombstones"])
        dst_dir = os.path.join(new_edir, "deltas", f"delta-{seq_no:06d}")
        if os.path.isdir(dst_dir):      # debris from a crashed carry-over
            shutil.rmtree(dst_dir)
        shutil.copytree(src_dir, dst_dir)
        new_m["deltas"].append(
            _relocated_delta_record(rec, src_dir, dst_dir, seq_no))
        new_m["event_watermark"] = max(new_m.get("event_watermark", 0),
                                       rec.get("max_event_seq", 0))
    cu = new_m.get("catch_up_from") or {}
    cu["consumed_deltas"] = n_consumed_now
    new_m["catch_up_from"] = cu
    epoch_name = new_m.pop("epoch")
    write_manifest(index_root, epoch_name, new_m)


def publish_with_catchup(index_root: str, epoch: str) -> int:
    """Replay deltas that landed on the predecessor epoch after this
    epoch's snapshot, then atomically publish.  Returns the number of
    replayed records.  Closes the snapshot→publish window for every
    delta whose manifest append completed before the CURRENT flip
    (true concurrent writers must serialize through the merge
    scheduler actor, mee_ray.scheduler)."""
    replayed = 0
    # the whole catch-up + flip runs under the index write lock: a
    # delta either lands on the predecessor BEFORE we take the lock
    # (then the loop replays it) or blocks until after the flip (then
    # it targets the new CURRENT) — no lost-window in between
    with write_lock(index_root):
        while True:
            new_m = load_manifest(index_root, epoch)
            cu = new_m.get("catch_up_from")
            if not cu or not cu.get("epoch"):
                break
            try:
                old_m = load_manifest(index_root, cu["epoch"])
            except FileNotFoundError:
                break
            extra = old_m.get("deltas", [])[cu.get("consumed_deltas", 0):]
            if not extra:
                break
            carry_over_deltas(index_root, epoch, extra,
                              cu.get("consumed_deltas", 0) + len(extra))
            replayed += len(extra)
        publish(index_root, epoch)
    return replayed


def base_event_seq(manifest: dict) -> int:
    """Per-key LWW floor for docs rows / keys with no recorded event
    seq: the snapshot corpus of the epoch CHAIN incorporates every
    event <= it.  Preserved verbatim across compactions (folded delta
    rows carry their own per-row ``event_seq`` column instead)."""
    return int(manifest.get("base_event_seq") or 0)


def next_event_seq(index_root: str) -> int:
    """First event seq NOT yet covered by the CURRENT epoch.  NOTE:
    calling this and then apply_delta separately is racy under
    concurrent publishers (two callers can allocate the same range);
    use delta.apply_with_seq_allocation, which holds the index write
    lock across allocation + apply."""
    m = load_manifest(index_root)
    return 1 + max([int(m.get("event_watermark") or 0)]
                   + [int(d.get("max_event_seq") or 0)
                      for d in m.get("deltas", [])])


def tombstone_index(manifest: dict):
    """(sorted doc_ids, last tombstone seq per id) over the delta log.

    Sequenced-tombstone semantics: a tombstone written by delta record
    k kills ONLY posting/doc-row copies from OLDER sources (the base
    epoch is source 0, delta record j is source j).  A copy written by
    source s is live iff s > last_seq(id).  This makes delete →
    re-insert a plain re-add (the new delta's postings out-sequence the
    tombstone) that stays correct across compactions and catch-up
    replays — record seqs are renumbered together at carry-over, so
    relative order is preserved.  Backward compat: legacy
    ``resurrected`` lists (an older engine's revival records) drop the
    id from the index entirely, restoring the base copy."""
    import numpy as np
    import pyarrow.parquet as pq

    last: dict[int, int] = {}
    for d in manifest.get("deltas", []):
        p = d.get("tombstones")
        if p:
            if not os.path.exists(p):
                # silently skipping would resurrect deleted docs (and a
                # compact run would bake their postings back in) —
                # corruption must fail loudly, like _live_key_index
                raise FileNotFoundError(
                    f"delta record {d.get('seq')} tombstones file "
                    f"missing: {p} — index is inconsistent; run fsck")
            for did in pq.read_table(p, columns=["doc_id"])["doc_id"].to_pylist():
                last[did] = d["seq"]
        for did in d.get("resurrected", ()):
            last.pop(did, None)
    if not last:
        z = np.empty(0, dtype=np.int64)
        return z, z.copy()
    ids = np.fromiter(last.keys(), dtype=np.int64, count=len(last))
    seqs = np.fromiter(last.values(), dtype=np.int64, count=len(last))
    order = np.argsort(ids)
    return ids[order], seqs[order]


def live_posting_mask(ids, source_seq: int, tomb_ids, tomb_seqs):
    """Boolean mask of ids from ``source_seq`` that are live under the
    sequenced-tombstone rule (vectorized: searchsorted lookup)."""
    import numpy as np

    if len(tomb_ids) == 0 or len(ids) == 0:
        return np.ones(len(ids), dtype=bool)
    pos = np.minimum(np.searchsorted(tomb_ids, ids),
                     max(0, len(tomb_ids) - 1))
    hit = tomb_ids[pos] == ids
    # a tombstone at seq k kills copies from sources < k, so the copy
    # from source s is dead iff last_seq(id) > s (equality cannot
    # occur: one batch is last-writer-wins per key)
    dead = hit & (tomb_seqs[pos] > source_seq)
    return ~dead


def effective_tombstones(manifest: dict):
    """Ids whose BASE-epoch copy (source 0) is dead — the set the base
    docs/postings filters need.  Sorted int64 numpy array."""
    ids, _seqs = tombstone_index(manifest)
    return ids


def fsck(index_root: str, epoch: str | None = None,
         verify_hashes: bool = True) -> dict:
    """Integrity check of an epoch against its lineage — the
    operational "is this index trustworthy" probe: every segment file
    exists with the recorded size (and sha256 when ``verify_hashes``),
    every delta record's tombstone/added-docs/segment files exist, and
    the docs directory is non-empty when n_docs > 0.  Returns a report
    dict; ``ok`` is False iff any check failed."""
    import hashlib

    m = load_manifest(index_root, epoch)
    errors: list[str] = []
    checked = 0
    for s in m.get("segments", []):
        checked += 1
        p = s["path"]
        if not os.path.exists(p):
            errors.append(f"segment missing: {p}")
            continue
        if os.path.getsize(p) != s["bytes"]:
            errors.append(f"segment size mismatch: {p} "
                          f"({os.path.getsize(p)} != {s['bytes']})")
            continue
        if verify_hashes:
            h = hashlib.sha256()
            with open(p, "rb") as f:
                # chunked: segments can be GB-scale; constant memory
                for chunk in iter(lambda: f.read(1 << 20), b""):
                    h.update(chunk)
            if h.hexdigest() != s["sha256"]:
                errors.append(f"segment sha256 mismatch: {p}")
    for d in m.get("deltas", []):
        for p in ([d.get("tombstones"), d.get("added_docs"),
                   d.get("key_seqs"), d.get("deleted_keys")]
                  + list(d.get("segments", []))):
            if p:
                checked += 1
                if not os.path.exists(p):
                    errors.append(f"delta file missing: {p}")
    if m.get("n_docs", 0) > 0 and not docs_files(index_root, m["epoch"]):
        errors.append("docs table empty despite n_docs > 0")
    if m.get("store_positions") and not errors:
        # positional-index invariant: every segment row's position
        # blob holds exactly sum(tf) varints (sampled — first file of
        # the base set plus every delta segment; a full sweep is the
        # hash check's job)
        import pyarrow.parquet as pq

        from mee_ray.postings import (decode_posting_list,
                                      varint_value_offsets)
        sample = [s["path"] for s in m.get("segments", [])][:1]
        for d in m.get("deltas", []):
            sample += list(d.get("segments", []))
        for p in sample:
            t = pq.read_table(p)
            checked += 1
            if "pos_enc" not in t.schema.names:
                errors.append(f"store_positions set but {p} has no "
                              f"pos_enc column")
                continue
            for r in range(t.num_rows):
                _, tfs = decode_posting_list(
                    t["doc_ids_enc"][r].as_py(), t["tfs_enc"][r].as_py())
                n_vals = len(varint_value_offsets(
                    t["pos_enc"][r].as_py())) - 1
                if n_vals != int(tfs.sum()):
                    errors.append(
                        f"position count mismatch in {p} row {r}: "
                        f"{n_vals} varints vs sum(tf)={int(tfs.sum())}")
                    break
    return {"epoch": m["epoch"], "ok": not errors, "checked": checked,
            "n_segments": len(m.get("segments", [])),
            "n_deltas": len(m.get("deltas", [])), "errors": errors}


def docs_sources(index_root: str, manifest: dict,
                 missing: str = "raise") -> list[tuple[str, int]]:
    """THE liveness-ordered docs-source walk, shared by every stored-
    field reader (get_doc, filter bitsets, update_by_query's fetch,
    delete_by_query's key fetch, reindex's corpus): the epoch's base
    docs files at source seq 0, then each delta record's added-docs
    file at its seq.  A row from source s is live iff no tombstone for
    its id has seq > s (live_posting_mask).

    ``missing``: "raise" fails loudly on a manifest-referenced
    added-docs file that is gone (index corruption — a silent skip
    would turn deletes into no-ops); "skip" tolerates it for
    best-effort diagnostic readers."""
    if missing not in ("raise", "skip"):
        raise ValueError("missing must be 'raise' or 'skip'")
    sources: list[tuple[str, int]] = [
        (f, 0) for f in docs_files(index_root, manifest["epoch"])]
    for d in manifest.get("deltas", []):
        f = d.get("added_docs")
        if not f:
            continue
        if not os.path.exists(f):
            if missing == "skip":
                continue
            raise FileNotFoundError(
                f"manifest references missing added-docs file {f!r} "
                f"(delta seq {d.get('seq')}) — index is inconsistent; "
                "run fsck")
        sources.append((f, d["seq"]))
    return sources


# Filenames that are legitimate epoch-dir members without appearing in
# any manifest file list.
_EPOCH_HOUSEKEEPING = {"manifest.json", "_state.json", "metrics.json",
                       "key_seqs.parquet", "_compact_src.json",
                       "_reindex_src.json", "_build_cfg.json"}


def fsck_repair(index_root: str) -> dict:
    """Conservative debris repair across every MANIFESTED epoch:

    * delete ``*.tmp.*`` leftovers of crashed atomic writes;
    * delete parquet files under ``segments/`` / ``deltas/*/``
      directories that NO manifest in the root references (catch-up
      carries delta records across epochs, so references are gathered
      from ALL manifests, never just the owner's);
    * rebuild missing ``*.lineage.json`` sidecars from the manifest's
      own segment records (path/sha256/bytes live there).

    Never touches: epoch dirs WITHOUT a manifest (a resumable crashed
    build — ``gc_epochs`` territory, and only when unpublished and
    unaliased), the ``docs/`` tables (directory-globbed, so every file
    is live by construction), or any file a manifest references.
    Missing/corrupt segments are NOT repairable here — re-run the
    build/compact that produced them.

    Runs under the index WRITE LOCK: apply_delta writes its new files
    into the (manifested) CURRENT epoch dir BEFORE appending the
    manifest record, and an unlocked repair racing it would delete
    exactly those not-yet-referenced files.  (Mid-compaction/reindex
    writes land in manifest-LESS target epochs, which the skip rule
    already protects.)"""
    with write_lock(index_root):
        return _fsck_repair_locked(index_root)


def _fsck_repair_locked(index_root: str) -> dict:
    import glob
    import json as _json

    eroot = os.path.join(index_root, "epochs")
    if not os.path.isdir(eroot):
        return {"removed": [], "sidecars_rebuilt": [], "skipped_epochs": []}
    manifested: dict[str, dict] = {}
    skipped: list[str] = []
    for name in sorted(os.listdir(eroot)):
        if os.path.isfile(manifest_path(index_root, name)):
            manifested[name] = load_manifest(index_root, name)
        else:
            skipped.append(name)

    referenced: set[str] = set()
    for m in manifested.values():
        for s in m.get("segments", []):
            referenced.add(os.path.realpath(s["path"]))
        for d in m.get("deltas", []):
            for p in ([d.get("tombstones"), d.get("added_docs"),
                       d.get("key_seqs")] + list(d.get("segments", []))):
                if p:
                    referenced.add(os.path.realpath(p))

    removed: list[str] = []
    rebuilt: list[str] = []
    for name, m in manifested.items():
        edir = epoch_dir(index_root, name)
        for path in glob.glob(os.path.join(edir, "**"), recursive=True):
            if not os.path.isfile(path):
                continue
            base = os.path.basename(path)
            rel = os.path.relpath(path, edir)
            if ".tmp." in base:
                os.remove(path)
                removed.append(path)
                continue
            top = rel.split(os.sep, 1)[0]
            if top in ("docs", "docs_tok") or base in _EPOCH_HOUSEKEEPING:
                continue
            if base.endswith(".lineage.json"):
                # orphan sidecar of a removed segment is debris too
                if os.path.realpath(path[:-len(".lineage.json")]) \
                        not in referenced:
                    os.remove(path)
                    removed.append(path)
                continue
            if top in ("segments", "deltas") \
                    and os.path.realpath(path) not in referenced:
                os.remove(path)
                removed.append(path)
        for s in m.get("segments", []):
            sc = s["path"] + ".lineage.json"
            if os.path.exists(s["path"]) and not os.path.exists(sc):
                lin = {"part": s.get("part"), "n_terms": s.get("n_terms"),
                       "n_postings": s.get("n_postings"),
                       "bytes": s.get("bytes"), "path": s["path"],
                       "sha256": s.get("sha256"), "resumed": True,
                       "hint_avgdl": float(s.get("hint_avgdl") or 0.0)}
                tmp = sc + f".tmp.{os.getpid()}"
                with open(tmp, "w") as f:
                    _json.dump(lin, f)
                os.replace(tmp, sc)
                rebuilt.append(sc)
    return {"removed": sorted(removed), "sidecars_rebuilt": sorted(rebuilt),
            "skipped_epochs": skipped}


def live_totals(manifest: dict) -> tuple[int, int]:
    """(N_live, total_live_tokens) after applying the delta log to
    base stats — the exact integers behind :func:`live_stats`.
    Federated (cross-index) search sums these across sub-indexes so
    its global avgdl divides the same integers a union index would."""
    n = manifest["n_docs"]
    total = manifest["total_tokens"]
    for d in manifest.get("deltas", []):
        n += d["n_added"] - d["n_deleted"]
        total += d["sum_dl_added"] - d["sum_dl_deleted"]
    return n, total


def live_stats(manifest: dict) -> tuple[int, float]:
    """(N_live, avgdl_live) after applying the delta log to base stats.
    Exact, not approximate: each delta records n/sum_dl added+deleted,
    so BM25 global stats stay oracle-identical between compactions."""
    n, total = live_totals(manifest)
    avgdl = (total / n) if n else 0.0
    return n, avgdl
