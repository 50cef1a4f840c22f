"""Built-document → index delta-event bridge: the reference's
end-to-end loop, closed.

mee's full pipeline is: a DB row changes → the handler rebuilds the
affected documents → the sync service upserts them into the fulltext
index (reference modules/handlers/v1/commonhandler.py slave branches
:646-858 feeding the ES bulk writer :68-83).  This engine has both
halves — ``docbuild.apply_join_delta`` / ``apply_master_delta``
re-emit the affected documents, ``delta.apply_delta`` applies an event
batch to the index — and this module is the adapter between them:

    changes ──apply_join_delta──▶ docs ──docs_to_delta_events──▶
        events ──apply_delta──▶ searchable index

Document identity mapping (mirrors corpus.documents_as_corpus_batch's
shape so one index serves both):

    repo    = a logical collection name (caller-chosen)
    path    = "<key_field>/<key value>"            (stable doc address)
    commit  = sha256(canonical JSON of the row)[:40]  (version key —
              ANY field change produces a new version, so the index's
              no-op-upsert / resurrection semantics apply naturally)
    content = rendered text fields ("field: value" lines)
"""

from __future__ import annotations

import hashlib
import json

import pyarrow as pa

EVENT_COLS = ("seq", "type", "repo", "path", "commit", "lang", "content")


def _canonical(row: dict) -> str:
    return json.dumps(row, sort_keys=True, default=str)


def render_content(row: dict, text_fields: list[str] | None) -> str:
    """Searchable text of one document: the chosen fields (default all)
    as "field: value" lines — field names become searchable tokens too,
    like the reference's mapped ES field names."""
    fields = text_fields if text_fields is not None else sorted(row)
    out = []
    for f in fields:
        v = row.get(f)
        if v is None:
            continue
        out.append(f"{f}: {v}")
    return "\n".join(out) + "\n"


def next_event_seq(index_root: str) -> int:
    """First event seq NOT yet covered by the index — thread this into
    :func:`docs_to_delta_events` so bridged batches stay globally
    monotone (the watermark/catch-up machinery depends on it; a batch
    re-using covered seqs is treated as a redelivery by apply_delta's
    per-key LWW guard or, worse, mis-classified as snapshot-covered at
    rebuild).  RACY under concurrent publishers — two callers can
    allocate the same range; prefer :func:`publish_documents`, which
    holds the index write lock across allocation + apply."""
    from mee_ray import manifest as mf
    return mf.next_event_seq(index_root)


def publish_documents(index_root: str, docs, key_field: str,
                      deleted_keys=None,
                      text_fields: list[str] | None = None,
                      repo: str = "docbuild", cfg=None) -> dict:
    """Atomic bridge publish: allocate the event-seq range, convert the
    re-emitted documents (+ deleted keys) to one event batch, and apply
    it, all inside the index write lock.  This is the safe form of
    ``docs_to_delta_events(..., start_seq=next_event_seq(root))`` +
    ``apply_delta`` — which, as two separate steps, lets two concurrent
    publishers allocate the same seq range and silently drop one
    batch's changes for any key both touch."""
    from mee_ray.delta import apply_with_seq_allocation

    # materialize the (blast-radius-bounded) docs BEFORE taking the
    # lock: only the seq-stamped conversion + apply sit inside it
    if hasattr(docs, "iter_batches"):
        tables = list(docs.iter_batches(batch_format="pyarrow",
                                        batch_size=1 << 16))
        docs = (pa.concat_tables(tables) if tables
                else pa.table({key_field: pa.array([], pa.int64())}))

    def build(start_seq: int) -> pa.Table:
        return docs_to_delta_events(
            docs, key_field, deleted_keys=deleted_keys,
            text_fields=text_fields, repo=repo, start_seq=start_seq)

    return apply_with_seq_allocation(build, index_root, cfg)


def docs_to_delta_events(docs, key_field: str,
                         deleted_keys=None,
                         text_fields: list[str] | None = None,
                         repo: str = "docbuild",
                         start_seq: int | None = None) -> pa.Table:
    """Convert re-emitted documents (+ deleted master keys) into one
    index delta-event batch.

    ``docs`` is a Ray Dataset or pyarrow Table of built documents (the
    output of build_documents / apply_join_delta / apply_master_delta);
    ``deleted_keys`` an iterable or single-column table of master keys
    whose documents must be removed (apply_master_delta's second return
    value).  The batch is bounded by the change's blast radius — the
    same bound the reference's per-event handler works under.

    ``start_seq`` is REQUIRED: event seqs must be globally monotone
    per index across batches (use :func:`next_event_seq`).  A silent
    default of 1 made every batch restart the sequence, which the
    watermark machinery then mis-classifies (snapshot rebuilds would
    treat post-snapshot batches as already covered and drop them)."""
    if start_seq is None:
        raise ValueError(
            "start_seq is required — event seqs must be globally "
            "monotone per index across batches; use "
            "next_event_seq(index_root) to continue the sequence")
    if hasattr(docs, "iter_batches"):
        tables = list(docs.iter_batches(batch_format="pyarrow",
                                        batch_size=1 << 16))
        tbl = (pa.concat_tables(tables) if tables
               else pa.table({key_field: pa.array([], pa.int64())}))
    else:
        tbl = docs
    if key_field not in tbl.schema.names and tbl.num_rows:
        raise ValueError(f"documents lack key field {key_field!r} "
                         f"(have {tbl.schema.names})")

    seqs, types, paths, commits, contents = [], [], [], [], []
    seq = start_seq
    for row in tbl.to_pylist():
        key = row[key_field]
        seqs.append(seq); seq += 1
        types.append("INSERT")
        paths.append(f"{key_field}/{key}")
        commits.append(hashlib.sha256(
            _canonical(row).encode()).hexdigest()[:40])
        contents.append(render_content(row, text_fields))

    if deleted_keys is not None:
        if isinstance(deleted_keys, pa.Table):
            deleted_keys = deleted_keys.column(0).to_pylist()
        for key in deleted_keys:
            seqs.append(seq); seq += 1
            types.append("DELETE")
            paths.append(f"{key_field}/{key}")
            commits.append(None)
            contents.append(None)

    n = len(seqs)
    return pa.table({
        "seq": pa.array(seqs, pa.int64()),
        "type": pa.array(types, pa.string()),
        "repo": pa.array([repo] * n, pa.string()),
        "path": pa.array(paths, pa.string()),
        "commit": pa.array(commits, pa.string()),
        "lang": pa.array(["doc" if t == "INSERT" else None
                          for t in types], pa.string()),
        "content": pa.array(contents, pa.string()),
    })
