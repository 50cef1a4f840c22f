"""End-to-end reference loop: table change → affected-document rebuild
→ index delta → searchable results, oracle-verified at every step.

This is the reference's whole reason to exist (binlog event → handler
rebuilds docs → ES upsert), run through this engine's halves and the
bridge that connects them:

    build_documents ─▶ docs_to_delta_events ─▶ build_index
    SlaveChange ─▶ apply_join_delta ─▶ events ─▶ apply_delta
    master delete ─▶ apply_master_delta ─▶ events ─▶ apply_delta
    compact ─▶ still oracle-identical
"""

import hashlib
import json

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from mee_ray.build import build_index
from mee_ray.config import EngineConfig
from mee_ray.delta import apply_delta
from mee_ray.ids import doc_id_of
from mee_ray.merge import compact
from mee_ray.oracle import OracleIndex
from mee_ray.pipelines.bridge import docs_to_delta_events, render_content
from mee_ray.pipelines.docbuild import (DocSpec, JoinSpec, SlaveChange,
                                        apply_join_delta,
                                        apply_master_delta,
                                        build_documents)
from mee_ray.query import Searcher

SF = "/root/testdata/sf0.001"


def _spec() -> DocSpec:
    return DocSpec(
        master="customer", key="c_custkey",
        mappings={"cust_id": "c_custkey", "cust_name": "c_name"},
        joins=(JoinSpec("nation", "n_nationkey", "c_nationkey",
                        {"nation_name": "n_name"}),))


def _expected_docs(df):
    """(doc_id, content) pairs a documents frame should produce —
    identical identity mapping and rendering as the bridge (rows pass
    through Arrow so value types match the engine's exactly)."""
    rows = pa.Table.from_pandas(df, preserve_index=False).to_pylist()
    for row in rows:
        commit = hashlib.sha256(json.dumps(
            row, sort_keys=True, default=str).encode()).hexdigest()[:40]
        yield (doc_id_of("docbuild", f"cust_id/{row['cust_id']}", commit),
               render_content(row, None))


def _check(root, expected_df, probes):
    oi = OracleIndex(list(_expected_docs(expected_df)))
    s = Searcher(root)
    assert (s.n_docs, s.avgdl) == (oi.n_docs, oi.avgdl)
    for q in probes:
        assert s.search(q, 10) == oi.search(q, 10), q
    return oi, s


def test_end_to_end_change_propagation(ray_session, tmp_path):
    root = str(tmp_path / "docidx")
    spec = _spec()

    # 1. initial state: build all documents, bridge them into a corpus,
    #    build the index
    full = build_documents(SF, spec).to_pandas()
    events = docs_to_delta_events(
        pa.Table.from_pandas(full, preserve_index=False), "cust_id",
        start_seq=1)
    corpus = events.select(["repo", "path", "commit", "lang", "content"])
    import ray.data
    build_index(ray.data.from_arrow(corpus), root, "ep1",
                EngineConfig(), dedup=False)

    nat = pq.read_table(f"{SF}/nation.parquet",
                        columns=["n_nationkey", "n_name"])
    nmap = dict(zip(nat["n_nationkey"].to_pylist(),
                    nat["n_name"].to_pylist()))
    nation3 = nmap[3].lower()
    _check(root, full, [[nation3], ["cust_name"],
                        [nation3, "nation_name"]])
    n3_custs = set(full[full["nation_name"] == nmap[3]]["cust_id"])
    assert n3_custs, "fixture needs customers in nation 3"

    # 2. slave change: rename nation 3, delete nation 7 → re-emit →
    #    bridge → apply to the index
    ups = pa.table({"n_nationkey": pa.array([3], nat["n_nationkey"].type),
                    "n_name": pa.array(["ZZRENAMEDLAND"])})
    reemit = apply_join_delta(
        SF, spec, SlaveChange("nation", upserts=ups, delete_keys=(7,)))
    ev2 = docs_to_delta_events(reemit, "cust_id", start_seq=100_000)
    assert ev2["type"].to_pylist().count("INSERT") == ev2.num_rows
    apply_delta(ev2, root)

    expected = full.copy()
    n7_custs = set(full[full["nation_name"] == nmap[7]]["cust_id"])
    expected.loc[expected["cust_id"].isin(n3_custs),
                 "nation_name"] = "ZZRENAMEDLAND"
    expected.loc[expected["cust_id"].isin(n7_custs), "nation_name"] = None
    _, s = _check(root, expected,
                  [["zzrenamedland"], [nation3], [nmap[7].lower()],
                   ["zzrenamedland", "cust_name"]])
    # the renamed token matches exactly the nation-3 customer docs
    got = {h for h, _ in s.search(["zzrenamedland"], 10_000)}
    assert len(got) == len(n3_custs)

    # 3. master change: delete one customer → DELETE event → gone
    victim = int(expected["cust_id"].iloc[0])
    docs2, deleted = apply_master_delta(
        SF, spec, SlaveChange("customer", delete_keys=(victim,)))
    assert deleted["c_custkey"].to_pylist() == [victim]
    ev3 = docs_to_delta_events(docs2, "cust_id", deleted_keys=deleted,
                               start_seq=200_000)
    assert ev3["type"].to_pylist() == ["DELETE"]
    apply_delta(ev3, root)
    expected = expected[expected["cust_id"] != victim]
    _check(root, expected, [["zzrenamedland"], ["cust_name"]])

    # 4. compaction preserves everything
    compact(root, "ep2", gc_old=True)
    _check(root, expected, [["zzrenamedland"], [nation3], ["cust_name"]])


def test_bridge_event_shape():
    t = pa.table({"cust_id": pa.array([7, 9], pa.int64()),
                  "cust_name": pa.array(["a", "b"])})
    ev = docs_to_delta_events(t, "cust_id", deleted_keys=[11],
                              start_seq=5)
    assert ev.schema.names == ["seq", "type", "repo", "path", "commit",
                               "lang", "content"]
    assert ev["seq"].to_pylist() == [5, 6, 7]
    assert ev["type"].to_pylist() == ["INSERT", "INSERT", "DELETE"]
    assert ev["path"].to_pylist() == ["cust_id/7", "cust_id/9",
                                      "cust_id/11"]
    assert ev["commit"][2].as_py() is None
    # version key: any field change changes the commit
    t2 = pa.table({"cust_id": pa.array([7], pa.int64()),
                   "cust_name": pa.array(["CHANGED"])})
    ev2 = docs_to_delta_events(t2, "cust_id", start_seq=1)
    assert ev2["commit"][0].as_py() != ev["commit"][0].as_py()

    with pytest.raises(ValueError, match="lack key field"):
        docs_to_delta_events(pa.table({"x": pa.array([1])}), "cust_id",
                             start_seq=1)
    with pytest.raises(ValueError, match="start_seq is required"):
        docs_to_delta_events(t, "cust_id")
