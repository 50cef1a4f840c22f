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
