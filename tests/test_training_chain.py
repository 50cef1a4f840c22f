"""Composed corpus→training-shards chain: end-to-end oracle equality
and artifact integrity."""

import os

import duckdb
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_training_chain_matches_oracle_and_writes_artifact(ray_session):
    from mee_ray.pipelines.training import (_training_sql,
                                            corpus_to_training_shards)

    got = corpus_to_training_shards(SF).sort_by("shard")
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    want = con.execute(
        _training_sql() + " ORDER BY shard").fetch_arrow_table()
    assert got.equals(want.cast(got.schema))

    # the exported artifact holds exactly the representative ids
    import zlib
    # crc32: stable across interpreter runs (hash() is salted), so
    # the resumable export's _SUCCESS markers are findable on retry
    out_dir = f"/tmp/mee_export/train_{zlib.crc32(SF.encode()):08x}"
    ids = []
    for d in sorted(os.listdir(out_dir)):
        p = os.path.join(out_dir, d, "part.parquet")
        if os.path.exists(p):
            ids.extend(pq.read_table(p, columns=["doc_id"])
                       ["doc_id"].to_pylist())
    reps_sql = (_training_sql().rsplit("SELECT CAST(doc_id", 1)[0]
                + "SELECT doc_id FROM reps")
    want_ids = con.execute(reps_sql).df()["doc_id"].tolist()
    assert sorted(ids) == sorted(want_ids)
