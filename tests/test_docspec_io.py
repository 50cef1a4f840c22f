"""Config-file DocSpec loader: positive round-trip (YAML + JSON +
!include), equality with the programmatic spec, and the table-driven
negative-fixture battery (the reference's IllegalConfigException tests,
handlerconfig.py:181-347 as the model)."""

import json
import os

import pytest

from mee_ray.pipelines.docbuild import DocSpec, IllegalDocSpec, JoinSpec, NestedSpec
from mee_ray.pipelines.docspec_io import docspec_from_dict, load_docspec

SF = "/root/testdata/sf0.001"

GOOD_YAML = """
master: customer
key: c_custkey
mappings:
  cust_id: c_custkey
  cust_name: c_name
  balance_capped: "min(c_acctbal, echo(5000.0))"
filter:
  c_mktsegment: [BUILDING, AUTOMOBILE]
  c_acctbal: {">": 0.0}
joins:
  - table: nation
    key: n_nationkey
    master_key: c_nationkey
    fields: {nation_name: n_name}
nested:
  - table: orders
    parent_key: o_custkey
    master_key: c_custkey
    fields: [o_orderkey, o_totalprice]
    out: orders
    order_by: o_orderkey
    limit: 50
"""


def _expected_spec() -> DocSpec:
    return DocSpec(
        master="customer", key="c_custkey",
        mappings={"cust_id": "c_custkey", "cust_name": "c_name",
                  "balance_capped": "min(c_acctbal, echo(5000.0))"},
        filter={"c_mktsegment": ["BUILDING", "AUTOMOBILE"],
                "c_acctbal": {">": 0.0}},
        joins=(JoinSpec("nation", "n_nationkey", "c_nationkey",
                        {"nation_name": "n_name"}),),
        nested=(NestedSpec("orders", "o_custkey", "c_custkey",
                           ["o_orderkey", "o_totalprice"], "orders",
                           "o_orderkey", 50),))


def test_yaml_roundtrip_equals_programmatic(tmp_path):
    p = tmp_path / "spec.yml"
    p.write_text(GOOD_YAML)
    assert load_docspec(str(p)) == _expected_spec()


def test_json_roundtrip(tmp_path):
    import yaml
    p = tmp_path / "spec.json"
    p.write_text(json.dumps(yaml.safe_load(GOOD_YAML)))
    assert load_docspec(str(p)) == _expected_spec()


def test_include_composition(tmp_path):
    (tmp_path / "joins.yml").write_text(
        "- table: nation\n  key: n_nationkey\n  master_key: c_nationkey\n"
        "  fields: {nation_name: n_name}\n")
    (tmp_path / "main.yml").write_text(
        "master: customer\nkey: c_custkey\n"
        "mappings: {cust_id: c_custkey}\n"
        "joins: !include joins.yml\n")
    spec = load_docspec(str(tmp_path / "main.yml"))
    assert spec.joins[0].table == "nation"


def test_include_cycle_rejected(tmp_path):
    (tmp_path / "a.yml").write_text("x: !include b.yml\n")
    (tmp_path / "b.yml").write_text("y: !include a.yml\n")
    with pytest.raises(IllegalDocSpec, match="include cycle"):
        load_docspec(str(tmp_path / "a.yml"))


def test_loaded_spec_builds_documents(ray_session, tmp_path):
    """A file-loaded spec drives the same pipeline as the programmatic
    one — identical output frames."""
    import pandas as pd

    from mee_ray.pipelines.docbuild import build_documents

    p = tmp_path / "spec.yml"
    p.write_text(GOOD_YAML)
    a = build_documents(SF, load_docspec(str(p))).to_pandas()
    b = build_documents(SF, _expected_spec()).to_pandas()
    key = sorted(a.columns)
    a = a[key].sort_values("cust_id").reset_index(drop=True)
    b = b[key].sort_values("cust_id").reset_index(drop=True)
    a["orders"] = a["orders"].map(repr)
    b["orders"] = b["orders"].map(repr)
    pd.testing.assert_frame_equal(a, b)


def test_cli_docbuild_subcommand(tmp_path):
    import subprocess
    import sys

    p = tmp_path / "spec.yml"
    p.write_text("master: nation\nkey: n_nationkey\n"
                 "mappings: {nkey: n_nationkey, nname: n_name}\n")
    out = tmp_path / "docs_out"
    r = subprocess.run(
        [sys.executable, "-m", "mee_ray", "--num-cpus", "2", "docbuild",
         "--spec", str(p), "--input", SF, "--out", str(out)],
        capture_output=True, text=True, cwd="/root/repo", timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    payload = json.loads(r.stdout.strip().splitlines()[-1])
    assert payload["rows"] == 25 and payload["master"] == "nation"


# ---- negative-fixture battery ---------------------------------------

BAD_SPECS = [
    # (fixture, error-regex)
    ({"key": "k", "mappings": {"x": "k"}}, "master.*non-empty string"),
    ({"master": "t", "mappings": {"x": "k"}}, "key.*non-empty string"),
    ({"master": "t", "key": "k"}, "mappings"),
    ({"master": "t", "key": "k", "mappings": {}}, "mappings"),
    ({"master": "t", "key": "k", "mappings": {"x": 3}}, "column name or DSL"),
    ({"master": "t", "key": "k", "mappings": {"x": "k"}, "bogus": 1},
     "unknown keys.*bogus"),
    ({"master": "t", "key": "k", "mappings": {"bad name": "k"}},
     "identifier"),
    ({"master": "t", "key": "k", "mappings": {"x": "k"},
      "filter": {"c": {"~": 1}}}, "unknown ops"),
    ({"master": "t", "key": "k", "mappings": {"x": "k"},
      "filter": [1, 2]}, "filter must be a mapping"),
    ({"master": "t", "key": "k", "mappings": {"x": "k"},
      "joins": [{"table": "n", "key": "a", "master_key": "b",
                 "fields": {}}]}, "fields.*non-empty"),
    ({"master": "t", "key": "k", "mappings": {"x": "k"},
      "joins": [{"table": "n", "key": "a", "master_key": "b",
                 "fields": {"y": "c"}, "oops": 1}]}, "unknown keys.*oops"),
    ({"master": "t", "key": "k", "mappings": {"x": "k"},
      "joins": [{"table": "n", "key": "a", "master_key": "b",
                 "fields": {"y": "c"}, "nested": []}]}, "joins cannot nest"),
    ({"master": "t", "key": "k", "mappings": {"x": "k"},
      "nested": [{"table": "n", "parent_key": "p", "master_key": "k",
                  "fields": ["a"], "out": "o", "nested": []}]},
     "nested-in-nested"),
    ({"master": "t", "key": "k", "mappings": {"x": "k"},
      "nested": [{"table": "n", "parent_key": "p", "master_key": "k",
                  "fields": [], "out": "o"}]}, "non-empty list"),
    ({"master": "t", "key": "k", "mappings": {"x": "k"},
      "nested": [{"table": "n", "parent_key": "p", "master_key": "k",
                  "fields": ["a"], "out": "o", "limit": 0}]},
     "positive integer"),
    # bool is an int subclass: `limit: true` must not become limit=1
    ({"master": "t", "key": "k", "mappings": {"x": "k"},
      "nested": [{"table": "n", "parent_key": "p", "master_key": "k",
                  "fields": ["a"], "out": "o", "limit": True}]},
     "positive integer"),
    ({"master": "t", "key": "k", "mappings": {"x": "k"},
      "nested": [{"table": "n", "parent_key": "p", "master_key": "k",
                  "fields": ["a"], "out": "o", "order_by": 5}]},
     "order_by"),
    # duplicate output field across mapping + join (DocSpec.validate)
    ({"master": "t", "key": "k", "mappings": {"x": "k"},
      "joins": [{"table": "n", "key": "a", "master_key": "b",
                 "fields": {"x": "c"}}]}, "duplicate"),
    ({"master": "t", "key": "k", "mappings": {"x": "k"},
      "joins": [{"table": "n", "key": "a", "master_key": "b",
                 "fields": {"y": "c"}, "on_parent_delete": "stale"}]},
     "on_parent_delete"),
    (["not", "a", "mapping"], "spec must be a mapping"),
]


@pytest.mark.parametrize("fixture,regex", BAD_SPECS,
                         ids=[f"bad{i:02d}" for i in range(len(BAD_SPECS))])
def test_negative_fixtures(fixture, regex):
    with pytest.raises(IllegalDocSpec, match=regex):
        docspec_from_dict(fixture)


def test_on_parent_delete_yaml_null_keyword(tmp_path):
    """A bare YAML `on_parent_delete: null` parses to Python None and
    must select the documented 'null' mode, not trap."""
    p = tmp_path / "s.yml"
    p.write_text(
        "master: customer\nkey: c_custkey\n"
        "mappings: {cust_id: c_custkey}\n"
        "joins:\n"
        "  - table: nation\n    key: n_nationkey\n"
        "    master_key: c_nationkey\n"
        "    fields: {nation_name: n_name}\n"
        "    on_parent_delete: null\n")
    spec = load_docspec(str(p))
    assert spec.joins[0].on_parent_delete == "null"


# ------------------------------------------------- multi-index config


MULTI_YAML = """
__defs:
  nation_join: &nation_join
    table: nation
    key: n_nationkey
    fields: {nation_name: n_name}

customers:
  flat:
    master: customer
    key: c_custkey
    mappings: {doc_key: c_custkey}
    joins:
      - <<: *nation_join
        master_key: c_nationkey

suppliers:
  flat:
    master: supplier
    key: s_suppkey
    mappings: {doc_key: s_suppkey}
    joins:
      - <<: *nation_join
        master_key: s_nationkey
  with_nation:
    master: supplier
    key: s_suppkey
    mappings: {doc_key: s_suppkey, bal: s_acctbal}
"""


def _write(tmp_path, name, text):
    p = tmp_path / name
    p.write_text(text)
    return str(p)


def test_multispec_yaml_load(tmp_path):
    """Top-level index→type→spec addressing, __-prefixed defs dropped
    (reference handlerconfig.py:67-69), anchors/merge-keys reused."""
    from mee_ray.pipelines.docspec_io import load_multispec

    ms = load_multispec(_write(tmp_path, "multi.yml", MULTI_YAML))
    assert len(ms) == 3
    assert ms.indices() == ["customers", "suppliers"]
    assert ms.types("suppliers") == ["flat", "with_nation"]
    assert ms.types("nope") == []
    assert ms.spec("customers", "flat").master == "customer"
    assert ms.spec("customers", "nope") is None
    # __defs did not become an index
    assert "__defs" not in ms.indices()


def test_multispec_list_merge(tmp_path):
    """A top-level YAML LIST of one-index mappings merges into one
    config (reference loadFromFile, handlerconfig.py:61-65)."""
    from mee_ray.pipelines.docspec_io import load_multispec

    text = """
- customers:
    flat:
      master: customer
      key: c_custkey
      mappings: {doc_key: c_custkey}
- suppliers:
    flat:
      master: supplier
      key: s_suppkey
      mappings: {doc_key: s_suppkey}
"""
    ms = load_multispec(_write(tmp_path, "list.yml", text))
    assert sorted(ms.indices()) == ["customers", "suppliers"]


def test_multispec_bad_leaf_names_address(tmp_path):
    """A malformed leaf spec fails at load naming its index.type
    address (the reference's eager IllegalConfigException battery)."""
    from mee_ray.pipelines.docspec_io import load_multispec

    text = """
customers:
  flat:
    master: customer
    key: c_custkey
"""
    with pytest.raises(IllegalDocSpec, match=r"customers\.flat"):
        load_multispec(_write(tmp_path, "bad.yml", text))


def test_multispec_structure_errors(tmp_path):
    from mee_ray.pipelines.docspec_io import multispec_from_dict

    with pytest.raises(IllegalDocSpec, match="must be a mapping"):
        multispec_from_dict(["nope"])
    with pytest.raises(IllegalDocSpec, match="non-empty mapping of type_name"):
        multispec_from_dict({"idx": {}})
    with pytest.raises(IllegalDocSpec, match="type name"):
        multispec_from_dict({"idx": {3: {}}})
    with pytest.raises(IllegalDocSpec, match="index alias"):
        multispec_from_dict({"": {"t": {}}})


def test_multispec_routing(tmp_path):
    """specs_for_table returns every watching collection with its role
    — one entry per watching statement (reference
    getConfigItemsByDatabaseAndTable, handlerconfig.py:105-110)."""
    from mee_ray.pipelines.docspec_io import load_multispec

    ms = load_multispec(_write(tmp_path, "multi.yml", MULTI_YAML))
    nation = ms.specs_for_table("nation")
    assert sorted((i, t, r) for i, t, _s, r in nation) == [
        ("customers", "flat", "join"), ("suppliers", "flat", "join")]
    supplier = ms.specs_for_table("supplier")
    assert sorted((i, t, r) for i, t, _s, r in supplier) == [
        ("suppliers", "flat", "master"),
        ("suppliers", "with_nation", "master")]
    assert ms.specs_for_table("lineitem") == []


def test_multispec_route_change(ray_session, tmp_path):
    """route_change dispatches one table-change batch to every watching
    collection: a nation upsert re-emits affected docs in BOTH joined
    collections; a supplier upsert goes through the master path of the
    two supplier collections only."""
    import pyarrow as pa

    from mee_ray.pipelines.docbuild import SlaveChange
    from mee_ray.pipelines.docspec_io import load_multispec

    ms = load_multispec(_write(tmp_path, "multi.yml", MULTI_YAML))

    upd = SlaveChange("nation", upserts=pa.table({
        "n_nationkey": pa.array([3], pa.int64()),
        "n_name": pa.array(["CANADA-EDIT"], pa.string()),
    }))
    out = ms.route_change(SF, upd)
    assert sorted(out) == [("customers", "flat"), ("suppliers", "flat")]
    for (idx, typ), (ds, deleted) in out.items():
        t = ds.take_all()
        assert t, f"{idx}.{typ}: no re-emitted docs"
        assert all(r["nation_name"] == "CANADA-EDIT" for r in t)
        assert deleted.num_rows == 0

    sup = SlaveChange("supplier", upserts=pa.table({
        "s_suppkey": pa.array([1], pa.int64()),
        "s_name": pa.array(["S-EDIT"], pa.string()),
        "s_address": pa.array(["addr"], pa.string()),
        "s_nationkey": pa.array([3], pa.int64()),
        "s_phone": pa.array(["000"], pa.string()),
        "s_acctbal": pa.array([42.0], pa.float64()),
        "s_comment": pa.array(["c"], pa.string()),
    }))
    out = ms.route_change(SF, sup)
    assert sorted(out) == [("suppliers", "flat"), ("suppliers", "with_nation")]
    flat = out[("suppliers", "flat")][0].take_all()
    assert [r["doc_key"] for r in flat] == [1]


def test_multispec_route_change_self_join(ray_session, tmp_path):
    """A spec watching the changed table in BOTH roles (self-join:
    join.table == master) runs the master path AND the join path —
    the reference processes one config item per watching statement —
    with join-path re-emits deduplicated against the master-path blast
    radius, and the empty/typed deleted table carries the master key's
    real Arrow type."""
    import pyarrow as pa

    from mee_ray.pipelines.docbuild import DocSpec, JoinSpec, SlaveChange
    from mee_ray.pipelines.docspec_io import MultiSpec

    # "peer" self-join: each supplier embeds the name of the supplier
    # whose suppkey equals its nationkey — structurally a self-join
    # where join-affected masters differ from the changed row itself
    spec = DocSpec(
        master="supplier", key="s_suppkey",
        mappings={"doc_key": "s_suppkey", "nat": "s_nationkey"},
        joins=(JoinSpec("supplier", "s_suppkey", "s_nationkey",
                        {"peer_name": "s_name"}),),
    )
    ms = MultiSpec({("sup", "peers"): spec})
    assert sorted(r for _i, _t, _s, r in ms.specs_for_table("supplier")) \
        == ["join", "master"]

    up = SlaveChange("supplier", upserts=pa.table({
        "s_suppkey": pa.array([3], pa.int64()),
        "s_name": pa.array(["PEER-EDIT"], pa.string()),
        "s_address": pa.array(["a"], pa.string()),
        "s_nationkey": pa.array([7], pa.int64()),
        "s_phone": pa.array(["p"], pa.string()),
        "s_acctbal": pa.array([1.0], pa.float64()),
        "s_comment": pa.array(["c"], pa.string()),
    }))
    out = ms.route_change(SF, up)
    (docs, deleted) = out[("sup", "peers")]
    rows = docs.take_all()
    keys = [r["doc_key"] for r in rows]
    # no duplicate re-emits across the two paths
    assert len(keys) == len(set(keys))
    # master path re-emitted the changed row itself
    assert 3 in keys
    by_key = {r["doc_key"]: r for r in rows}
    # join path re-emitted every master referencing suppkey 3 (its
    # nationkey equals 3), all now embedding the edited peer name
    for k, r in by_key.items():
        if k != 3:
            assert r["nat"] == 3
            assert r["peer_name"] == "PEER-EDIT"
    # the changed row's own doc reflects ITS join (nationkey 7)
    assert by_key[3]["nat"] == 7
    # typed empty tombstone table — concatenable with the master
    # path's typed deletes
    assert deleted.num_rows == 0
    assert deleted.schema.field("s_suppkey").type == pa.int64()
