"""Resumable sharded training export: the corpus → N deterministic
hash shards of Parquet, one directory per shard, each written
atomically and skippable on retry.

This is the training-data hand-off the reference never needed (its
sink was Elasticsearch); a 100-TB pipeline needs the inverse of the
ingest path: stream the curated corpus back out as partitioned Parquet
such that

* a failed run RESUMES: finished shards carry a ``_SUCCESS`` marker
  and are skipped verbatim on retry (the same lineage discipline as
  the index build's segment sidecars, build.py);
* writes are ATOMIC: each shard materializes under a pid-unique temp
  name and is renamed into place only after a full write — a crashed
  task leaves debris that the retry overwrites, never a half shard
  that a reader can see (same tmp+rename rule as the segment writer);
* shard membership is DETERMINISTIC and content-independent:
  ``doc_id % n_shards``.  Engine doc ids are already uniform 63-bit
  hashes (ids.py), so plain modulo balances shards without an extra
  mixing step — and it keeps the rule SQL-expressible for the oracle.

Shape: ONE groupby(shard) shuffle; each shard group is written by its
own task (map_groups), so shard writes are distributed and
independently retryable.  Row order within a shard is sorted by
doc_id — reproducible output beats incidental order for training-data
audits; consumers that want a shuffled read order should use
ds.random_shuffle(seed) at READ time, which is a property of the run,
not of the artifact."""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

_SUMMARY_SCHEMA = pa.schema([("shard", pa.int32()),
                             ("n_docs", pa.int64()),
                             ("skipped", pa.bool_())])


def export_training_shards(docs, out_dir: str, n_shards: int = 16,
                           fingerprint: str | None = None):
    """Write ``docs`` (a Ray Dataset with a ``doc_id`` int64 column)
    to ``out_dir/shard=NNNNN/part.parquet``.  Returns a pa.Table
    (shard, n_docs, skipped) — one row per non-empty shard.

    Resume: a shard directory whose ``_SUCCESS`` marker matches this
    run's ``(fingerprint, n_shards)`` is skipped (its recorded row
    count is returned); a marker from a DIFFERENT input or shard
    layout forces a rewrite — mixing two corpora's shards in one
    out_dir would otherwise silently serve stale rows (pass the
    source path / snapshot id as ``fingerprint``).  Safe against the
    write_parquet append-dup hazard the plain ``export`` CLI refuses
    to risk.

    Scale note: one map_groups task materializes and sorts one whole
    shard in memory — size ``n_shards`` so corpus_bytes / n_shards
    fits a worker's heap (the shard count, not the cluster size, is
    the memory knob)."""
    import glob as _glob
    os.makedirs(out_dir, exist_ok=True)

    def add_shard(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False)
        shard = (d.astype(np.uint64) % np.uint64(n_shards)).astype(np.int32)
        return t.append_column("shard", pa.array(shard))

    def write_shard(g: pa.Table) -> pa.Table:
        shard = int(g["shard"][0].as_py())
        sdir = os.path.join(out_dir, f"shard={shard:05d}")
        marker = os.path.join(sdir, "_SUCCESS")
        if os.path.exists(marker):
            with open(marker) as f:
                rec = json.load(f)
            if rec.get("fingerprint") == fingerprint \
                    and rec.get("n_shards", n_shards) == n_shards:
                return pa.Table.from_pylist(
                    [{"shard": shard, "n_docs": rec["n_docs"],
                      "skipped": True}],
                    schema=_SUMMARY_SCHEMA)
            # marker from a different input/layout: rewrite, never mix
        # '_'-prefixed tmp INSIDE out_dir: Arrow dataset discovery
        # treats underscore-prefixed basenames as hidden, so debris a
        # crashed task leaves (any pid — clean ALL of them, not just
        # our own) is invisible to readers until renamed into place
        for stale in _glob.glob(os.path.join(
                out_dir, f"_tmp.shard={shard:05d}.*")):
            shutil.rmtree(stale, ignore_errors=True)
        tmp = os.path.join(out_dir, f"_tmp.shard={shard:05d}.{os.getpid()}")
        os.makedirs(tmp)
        body = g.drop_columns(["shard"]).sort_by("doc_id")
        pq.write_table(body, os.path.join(tmp, "part.parquet"))
        with open(os.path.join(tmp, "_SUCCESS"), "w") as f:
            json.dump({"n_docs": body.num_rows, "n_shards": n_shards,
                       "fingerprint": fingerprint}, f)
        shutil.rmtree(sdir, ignore_errors=True)
        os.replace(tmp, sdir)
        return pa.Table.from_pylist(
            [{"shard": shard, "n_docs": body.num_rows, "skipped": False}],
            schema=_SUMMARY_SCHEMA)

    parts = list(docs
                 .map_batches(add_shard, batch_format="pyarrow",
                              zero_copy_batch=True)
                 .groupby("shard")
                 .map_groups(write_shard, batch_format="pyarrow")
                 .iter_batches(batch_format="pyarrow"))
    out = (pa.concat_tables(parts) if parts
           else pa.Table.from_pylist([], schema=_SUMMARY_SCHEMA))
    return out.sort_by("shard")


def training_export_shards(sf_dir: str) -> pa.Table:
    """Driver query: export the documents table to a deterministic
    scratch root and report per-shard row counts.  A pre-existing
    scratch root is cleared so the driver check always exercises the
    WRITE path (the resume path is pytest-covered)."""
    import zlib

    from mee_ray.pipelines.text import _read_docs

    # crc32, NOT Python hash(): str hashing is per-process salted, so
    # hash() would mint a fresh /tmp dir every run (leaked exports)
    out_dir = f"/tmp/mee_export/{zlib.crc32(sf_dir.encode()):08x}"
    shutil.rmtree(out_dir, ignore_errors=True)
    t = export_training_shards(_read_docs(sf_dir), out_dir, n_shards=16,
                               fingerprint=sf_dir)
    return t.select(["shard", "n_docs"])


TRAINING_EXPORT_SQL = """
SELECT CAST(doc_id % 16 AS INTEGER) AS shard,
       CAST(count(*) AS BIGINT)     AS n_docs
FROM documents GROUP BY 1
"""

QUERIES = {"training_export_shards": training_export_shards}
ORACLE = {"training_export_shards": TRAINING_EXPORT_SQL}
