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


def test_jsonl_corpus_roundtrip(ray_session, corpus_dir, tmp_path):
    """Parquet corpus → JSONL sink → JSONL source is row-for-row
    identical (the ingest/interchange edge), and the pruned read
    projects to exactly the requested columns."""
    import pandas as pd

    from mee_ray.sources import (read_corpus_jsonl, write_corpus_jsonl)

    out = str(tmp_path / "jl")
    ds = read_corpus(corpus_dir)
    write_corpus_jsonl(ds, out)
    back = read_corpus_jsonl(out)
    a = read_corpus(corpus_dir).to_pandas()
    b = back.to_pandas()[a.columns.tolist()]
    # (repo, path) is NOT unique (dup-commit rows) and parallel read
    # block order varies under load — sort on the full unique key
    key = ["repo", "path", "commit"]
    a = a.sort_values(key, kind="mergesort").reset_index(drop=True)
    b = b.sort_values(key, kind="mergesort").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_exact=True)

    pruned = read_corpus_jsonl(out, columns=["repo", "path"])
    assert set(pruned.schema().names) == {"repo", "path"}


def test_jsonl_delta_events_and_validation(ray_session, tmp_path):
    """JSONL delta events parse to the EVENT_SCHEMA contract (the
    reference's JSON binlog envelope shape) and a missing required
    column fails at the read."""
    import json

    from mee_ray.sources import read_delta_events_jsonl

    d = tmp_path / "ev"
    d.mkdir()
    rows = [
        {"seq": 2, "type": "DELETE", "repo": "r", "path": "a",
         "commit": "", "lang": "", "content": ""},
        {"seq": 1, "type": "UPDATE", "repo": "r", "path": "a",
         "commit": "c2", "lang": "py", "content": "def f(): pass"},
    ]
    with open(d / "batch-0.jsonl", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    ds = read_delta_events_jsonl(str(d))
    got = sorted(ds.take_all(), key=lambda r: r["seq"])
    assert [r["seq"] for r in got] == [1, 2]
    assert got[0]["content"] == "def f(): pass"

    bad = tmp_path / "bad"
    bad.mkdir()
    with open(bad / "b.jsonl", "w") as f:
        f.write(json.dumps({"type": "UPDATE"}) + "\n")
    with pytest.raises(SchemaMismatch, match="seq"):
        read_delta_events_jsonl(str(bad))


def test_jsonl_delete_only_delta_batch(ray_session, tmp_path):
    """A DELETE-only JSONL batch carries JSON null commit/lang/content
    — Arrow infers those columns as type null, which must validate
    (the Parquet path accepts all-null string columns the same way)."""
    import json

    from mee_ray.sources import read_delta_events_jsonl

    d = tmp_path / "del_ev"
    d.mkdir()
    with open(d / "b.jsonl", "w") as f:
        f.write(json.dumps({"seq": 5, "type": "DELETE", "repo": "r",
                            "path": "a", "commit": None, "lang": None,
                            "content": None}) + "\n")
    ds = read_delta_events_jsonl(str(d))
    got = ds.take_all()
    assert got[0]["seq"] == 5 and got[0]["type"] == "DELETE"


def test_csv_corpus_roundtrip(ray_session, corpus_dir, tmp_path):
    """Parquet corpus → CSV sink → CSV source is row-for-row identical
    — content with embedded newlines/commas survives Arrow quoting."""
    import pandas as pd

    from mee_ray.sources import read_corpus_csv, write_corpus_csv

    out = str(tmp_path / "csv")
    write_corpus_csv(read_corpus(corpus_dir), out)
    a = read_corpus(corpus_dir).to_pandas()
    b = read_corpus_csv(out).to_pandas()[a.columns.tolist()]
    # (repo, path) is NOT unique (dup-commit rows) and parallel read
    # block order varies under load — sort on the full unique key
    key = ["repo", "path", "commit"]
    a = a.sort_values(key, kind="mergesort").reset_index(drop=True)
    b = b.sort_values(key, kind="mergesort").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_exact=True)


def test_csv_forced_types_and_null_roundtrip(ray_session, tmp_path):
    """CSV contract (review-found): numeric-looking content must read
    as STRING (types forced to the corpus schema, never inferred) and
    a null string cell round-trips as null, not ''."""
    import pyarrow as pa

    from mee_ray.sources import read_corpus_csv, write_corpus_csv
    import ray.data

    t = pa.table({
        "repo": pa.array(["r1", "r2"]),
        "path": pa.array(["a", "b"]),
        "commit": pa.array(["c1", "c2"]),
        "lang": pa.array(["py", None]),
        "content": pa.array(["12345", "678"]),   # numeric-looking
    })
    out = str(tmp_path / "csvtyped")
    write_corpus_csv(ray.data.from_arrow(t), out)
    back = read_corpus_csv(out).to_pandas() \
        .sort_values("repo").reset_index(drop=True)
    assert back["content"].tolist() == ["12345", "678"]
    assert back["content"].dtype == object          # string, not int
    assert back["lang"].iloc[1] is None or back["lang"].isna().iloc[1]


def test_generate_corpus_cdf_draw_identity():
    """The O(n log n) corpus generator must produce byte-identical
    tables to the historical rng.choice(p=...) form — the recorded
    scale series depends on (n, seed) fully determining the corpus."""
    import hashlib

    import numpy as np

    from mee_ray.corpus import generate_corpus

    # replay thousands of draws on PARALLEL streams: the historical
    # rng.choice(p=) and the cdf draw must consume one uniform each
    # and return the same index every time (review finding r4b#1 —
    # checking only draw #0 left the byte-identity claim unverified)
    for n_repos in (37, 1000, 4096):
        w = 1.0 / np.arange(1, n_repos + 1) ** 1.1
        w /= w.sum()
        cdf = np.cumsum(w)
        r1, r2 = np.random.default_rng(17), np.random.default_rng(17)
        for i in range(3000):
            a = int(r1.choice(n_repos, p=w))
            b = int(cdf.searchsorted(r2.random() * cdf[-1],
                                     side="right"))
            assert a == b, (n_repos, i)
    t = generate_corpus(1500, seed=17)
    rng = np.random.default_rng(17)
    n_repos = max(4, 1500 // 40)
    w = 1.0 / np.arange(1, n_repos + 1) ** 1.1
    w /= w.sum()
    r0 = int(rng.choice(n_repos, p=w))
    # historical first repo id must match the generated first repo
    assert t["repo"][0].as_py() == f"org{r0 % 7}/repo{r0}"
    # determinism across calls
    h1 = hashlib.sha256()
    for col in t.column_names:
        for v in t[col].to_pylist():
            h1.update((v or "").encode())
    t2 = generate_corpus(1500, seed=17)
    h2 = hashlib.sha256()
    for col in t2.column_names:
        for v in t2[col].to_pylist():
            h2.update((v or "").encode())
    assert h1.hexdigest() == h2.hexdigest()


def test_corpus_slice_writer_identity(tmp_path):
    """iter_corpus_slices (the O(slice_rows)-memory streaming writer
    behind write_corpus) must reproduce generate_corpus's row stream
    byte-for-byte at EVERY slice boundary — including boundaries that
    split an (original, rev2) commit pair — and choice-normalized cdf
    draws must replay rng.choice exactly (ADVICE r4)."""
    import hashlib

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from mee_ray.corpus import generate_corpus, iter_corpus_slices, \
        write_corpus

    def sha(t):
        h = hashlib.sha256()
        for col in ("repo", "path", "commit", "lang", "content"):
            for v in t[col].to_pylist():
                h.update((v or "").encode())
                h.update(b"\x00")
        return h.hexdigest()

    whole = generate_corpus(997, seed=23, content_scale=1)
    want = sha(whole)
    # slice_rows=7 guarantees cut points inside i%25==7 rev2 pairs
    for slice_rows in (7, 100, 2000):
        got = pa.concat_tables(list(iter_corpus_slices(
            997, seed=23, slice_rows=slice_rows)))
        assert sha(got) == want, slice_rows
    out = write_corpus(str(tmp_path / "c"), n_files=997, seed=23,
                       rows_per_file=100)
    back = pq.read_table(out)
    assert sha(back) == want
    # normalized-cdf draw == rng.choice draw, same stream position
    w = 1.0 / np.arange(1, 300 + 1) ** 1.1
    w /= w.sum()
    cdf = np.cumsum(w)
    cdf /= cdf[-1]
    r1, r2 = np.random.default_rng(5), np.random.default_rng(5)
    for _ in range(2000):
        assert int(r1.choice(300, p=w)) == int(
            cdf.searchsorted(r2.random(), side="right"))
