"""Source readers: schema validation + pruned reads (SURVEY.md §2.1
S1/S4/S5 analogs)."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from mee_ray.corpus import write_corpus
from mee_ray.sources import (CORPUS_SCHEMA, SchemaMismatch, read_corpus,
                             read_delta_events)


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("src_corpus"))
    write_corpus(d, n_files=120, seed=5, rows_per_file=60)
    return d


def test_read_corpus_pruned(ray_session, corpus_dir):
    ds = read_corpus(corpus_dir, columns=["repo", "path"])
    assert set(ds.schema().names) == {"repo", "path"}
    assert ds.count() > 0


def test_read_corpus_full_schema(ray_session, corpus_dir):
    ds = read_corpus(corpus_dir)
    assert set(CORPUS_SCHEMA) <= set(ds.schema().names)


def test_missing_column_fails_fast(tmp_path):
    bad = tmp_path / "bad"
    bad.mkdir()
    pq.write_table(pa.table({"repo": pa.array(["r"]),
                             "path": pa.array(["p"])}),
                   str(bad / "part-0.parquet"))
    with pytest.raises(SchemaMismatch, match="missing"):
        read_corpus(str(bad))
    # but a read pruned to the columns that DO exist is fine
    import ray.data  # noqa: F401  (validation is metadata-only)
    read_corpus(str(bad), columns=["repo", "path"])


def test_wrong_type_fails_fast(tmp_path):
    bad = tmp_path / "badtype"
    bad.mkdir()
    t = pa.table({"repo": pa.array(["r"]), "path": pa.array(["p"]),
                  "commit": pa.array([1], pa.int64()),
                  "lang": pa.array(["py"]), "content": pa.array(["x"])})
    pq.write_table(t, str(bad / "part-0.parquet"))
    with pytest.raises(SchemaMismatch, match="commit"):
        read_corpus(str(bad))


def test_read_delta_events(ray_session, tmp_path):
    d = tmp_path / "events"
    d.mkdir()
    t = pa.table({
        "seq": pa.array([2, 1], pa.int64()),
        "type": pa.array(["DELETE", "UPDATE"]),
        "repo": pa.array(["r", "r"]),
        "path": pa.array(["a", "a"]),
        "commit": pa.array(["", "c2"]),
        "lang": pa.array(["", "py"]),
        "content": pa.array(["", "def f(): pass"]),
    })
    pq.write_table(t, str(d / "batch-0.parquet"))
    ds = read_delta_events(str(d))
    assert ds.count() == 2

    bad = tmp_path / "bad_ev"
    bad.mkdir()
    pq.write_table(pa.table({"type": pa.array(["UPDATE"])}),
                   str(bad / "b.parquet"))
    with pytest.raises(SchemaMismatch, match="seq"):
        read_delta_events(str(bad))
