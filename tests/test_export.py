"""Resumable sharded training export: atomicity, resume-skip, and
round-trip row identity."""

import json
import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"
OUT = "/tmp/mee_test_export"


def _read_all_shards(out_dir):
    tabs = []
    for d in sorted(os.listdir(out_dir)):
        p = os.path.join(out_dir, d, "part.parquet")
        if os.path.exists(p):
            tabs.append(pq.read_table(p))
    return pa.concat_tables(tabs)


def test_export_roundtrip_and_resume(ray_session):
    import ray.data

    from mee_ray.pipelines.export import export_training_shards

    shutil.rmtree(OUT, ignore_errors=True)
    docs = ray.data.read_parquet(f"{SF}/documents.parquet")
    summary = export_training_shards(docs, OUT, n_shards=8)

    want = pq.read_table(f"{SF}/documents.parquet").sort_by("doc_id")
    got = _read_all_shards(OUT).sort_by("doc_id")
    assert got.equals(want.select(got.column_names))
    assert sum(summary["n_docs"].to_pylist()) == want.num_rows
    assert not any(summary["skipped"].to_pylist())

    # every shard honors the membership rule
    for d in os.listdir(OUT):
        shard = int(d.split("=")[1])
        t = pq.read_table(os.path.join(OUT, d, "part.parquet"))
        assert all(x % 8 == shard for x in t["doc_id"].to_pylist())
        assert os.path.exists(os.path.join(OUT, d, "_SUCCESS"))

    # resume: clobber two shards (one fully removed, one left as a
    # half-written wreck without _SUCCESS) — only those two rewrite
    victims = sorted(os.listdir(OUT))[:2]
    shutil.rmtree(os.path.join(OUT, victims[0]))
    os.remove(os.path.join(OUT, victims[1], "_SUCCESS"))
    mtimes = {d: os.path.getmtime(os.path.join(OUT, d, "part.parquet"))
              for d in os.listdir(OUT) if d not in victims}

    summary2 = export_training_shards(docs, OUT, n_shards=8)
    skipped = {f"shard={s:05d}"
               for s, sk in zip(summary2["shard"].to_pylist(),
                                summary2["skipped"].to_pylist()) if sk}
    assert skipped == set(mtimes)          # untouched shards skipped
    for d, mt in mtimes.items():
        assert os.path.getmtime(os.path.join(OUT, d, "part.parquet")) == mt
    got2 = _read_all_shards(OUT).sort_by("doc_id")
    assert got2.equals(want.select(got2.column_names))


def test_export_summary_matches_oracle(ray_session):
    import duckdb

    from mee_ray.pipelines.export import (TRAINING_EXPORT_SQL,
                                          training_export_shards)

    got = training_export_shards(SF).sort_by("shard")
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    want = con.execute(
        TRAINING_EXPORT_SQL + " ORDER BY shard").fetch_arrow_table()
    assert got.equals(want.cast(got.schema))


def test_export_fingerprint_mismatch_rewrites(ray_session):
    """A _SUCCESS marker from a DIFFERENT input or shard layout must
    not be resumed over — mixing two corpora's shards silently serves
    stale rows."""
    import ray.data

    from mee_ray.pipelines.export import export_training_shards

    out = OUT + "_fp"
    shutil.rmtree(out, ignore_errors=True)
    docs = ray.data.read_parquet(f"{SF}/documents.parquet")
    s1 = export_training_shards(docs, out, n_shards=8, fingerprint="v1")
    assert not any(s1["skipped"].to_pylist())
    # same fingerprint: all shards skip
    s2 = export_training_shards(docs, out, n_shards=8, fingerprint="v1")
    assert all(s2["skipped"].to_pylist())
    # different fingerprint: every shard rewrites
    s3 = export_training_shards(docs, out, n_shards=8, fingerprint="v2")
    assert not any(s3["skipped"].to_pylist())
    want = pq.read_table(f"{SF}/documents.parquet").sort_by("doc_id")
    got = _read_all_shards(out).sort_by("doc_id")
    assert got.equals(want.select(got.column_names))


def test_export_tmp_debris_invisible_and_cleared(ray_session):
    """Crashed-task tmp dirs (underscore-prefixed, any pid) are
    invisible to Arrow dataset discovery and cleared by the retry."""
    import pyarrow.dataset as pads
    import ray.data

    from mee_ray.pipelines.export import export_training_shards

    out = OUT + "_tmpdbg"
    shutil.rmtree(out, ignore_errors=True)
    docs = ray.data.read_parquet(f"{SF}/documents.parquet")
    export_training_shards(docs, out, n_shards=4, fingerprint="x")
    n_live = pads.dataset(out, format="parquet").count_rows()

    # simulate another pid's crashed half-write of shard 1
    debris = os.path.join(out, "_tmp.shard=00001.99999")
    os.makedirs(debris)
    pq.write_table(pa.table({"doc_id": pa.array([1, 2], pa.int64())}),
                   os.path.join(debris, "part.parquet"))
    # hidden from readers
    assert pads.dataset(out, format="parquet").count_rows() == n_live
    # a rewrite of that shard clears ALL pids' debris
    shutil.rmtree(os.path.join(out, "shard=00001"))
    export_training_shards(docs, out, n_shards=4, fingerprint="x")
    assert not os.path.exists(debris)
    assert pads.dataset(out, format="parquet").count_rows() == n_live
