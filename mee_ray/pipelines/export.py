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


def export_training_shards(docs, out_dir: str, n_shards: int = 16):
    """Write ``docs`` (a Ray Dataset with a ``doc_id`` int64 column)
    to ``out_dir/shard=NNNNN/part.parquet``.  Returns a pa.Table
    (shard, n_docs, skipped) — one row per non-empty shard.

    Resume: a shard directory containing ``_SUCCESS`` is skipped (its
    recorded row count is returned); anything else is rewritten from
    scratch.  Safe against the write_parquet append-dup hazard the
    plain ``export`` CLI refuses to risk."""
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
                n = json.load(f)["n_docs"]
            return pa.Table.from_pylist(
                [{"shard": shard, "n_docs": n, "skipped": True}],
                schema=_SUMMARY_SCHEMA)
        tmp = sdir + f".tmp.{os.getpid()}"
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp)
        body = g.drop_columns(["shard"]).sort_by("doc_id")
        pq.write_table(body, os.path.join(tmp, "part.parquet"))
        with open(os.path.join(tmp, "_SUCCESS"), "w") as f:
            json.dump({"n_docs": body.num_rows}, f)
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
    from mee_ray.pipelines.text import _read_docs

    out_dir = f"/tmp/mee_export/{abs(hash(sf_dir)) % (1 << 32):08x}"
    shutil.rmtree(out_dir, ignore_errors=True)
    t = export_training_shards(_read_docs(sf_dir), out_dir, n_shards=16)
    return t.select(["shard", "n_docs"])


TRAINING_EXPORT_SQL = """
SELECT CAST(doc_id % 16 AS INTEGER) AS shard,
       CAST(count(*) AS BIGINT)     AS n_docs
FROM documents GROUP BY 1
"""

QUERIES = {"training_export_shards": training_export_shards}
ORACLE = {"training_export_shards": TRAINING_EXPORT_SQL}
