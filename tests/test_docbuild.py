"""Config-driven document builder: filter semantics, join/nested
shapes, and the negative-fixture validation battery (mirroring the
reference's IllegalConfigException tests, handlerconfig tests §5.1)."""

import pyarrow as pa
import pytest

from mee_ray.pipelines.docbuild import (DocSpec, IllegalDocSpec, JoinSpec,
                                        NestedSpec, _filter_mask,
                                        build_documents)

SF = "/root/testdata/sf0.001"


# ---- validation (negative fixtures) ---------------------------------

def test_duplicate_output_fields_rejected():
    spec = DocSpec(master="customer", key="c_custkey",
                   mappings={"x": "c_custkey"},
                   joins=(JoinSpec("nation", "n_nationkey", "c_nationkey",
                                   {"x": "n_name"}),))
    with pytest.raises(IllegalDocSpec, match="duplicate"):
        spec.validate()


def test_non_identifier_output_rejected():
    spec = DocSpec(master="customer", key="c_custkey",
                   mappings={"bad name": "c_custkey"})
    with pytest.raises(IllegalDocSpec, match="identifier"):
        spec.validate()


def test_empty_mappings_rejected():
    with pytest.raises(IllegalDocSpec, match="mapping"):
        DocSpec(master="customer", key="c_custkey").validate()


def test_bad_dsl_expr_fails_at_compile(ray_session):
    spec = DocSpec(master="customer", key="c_custkey",
                   mappings={"x": "not_a_function(c_acctbal)"})
    from mee_ray.functions.scalar import ExprError
    with pytest.raises(ExprError):
        build_documents(SF, spec)


def test_unknown_filter_op_rejected():
    t = pa.table({"a": pa.array([1, 2])})
    with pytest.raises(IllegalDocSpec, match="unknown filter op"):
        _filter_mask(t, {"a": {"~=": 1}})


# ---- filter truth table (reference filterData semantics) ------------

def test_filter_semantics():
    t = pa.table({"a": pa.array([1, 2, 3, 4]),
                  "s": pa.array(["x", "y", "x", "z"])})
    assert _filter_mask(t, {"a": 2}).to_pylist() == [False, True, False, False]
    assert _filter_mask(t, {"s": ["x", "z"]}).to_pylist() == \
        [True, False, True, True]
    assert _filter_mask(t, {"a": {">": 1, "<=": 3}}).to_pylist() == \
        [False, True, True, False]
    # missing column rejects every row (reference: missing key => reject)
    assert _filter_mask(t, {"nope": 1}).to_pylist() == [False] * 4


# ---- end-to-end shapes ----------------------------------------------

def test_join_miss_yields_null(ray_session, tmp_path):
    import pyarrow.parquet as pq

    d = tmp_path
    pq.write_table(pa.table({"mk": pa.array([1, 2], pa.int64()),
                             "v": pa.array(["a", "b"])}),
                   str(d / "master.parquet"))
    pq.write_table(pa.table({"jk": pa.array([1], pa.int64()),
                             "name": pa.array(["one"])}),
                   str(d / "side.parquet"))
    spec = DocSpec(master="master", key="mk",
                   mappings={"mk_out": "mk", "v_out": "v"},
                   joins=(JoinSpec("side", "jk", "mk", {"side_name": "name"}),))
    t = pa.concat_tables(build_documents(str(d), spec)
                         .to_pandas().pipe(lambda df: [pa.Table.from_pandas(df)]))
    rows = {r["mk_out"]: r for r in t.to_pylist()}
    assert rows[1]["side_name"] == "one"
    assert rows[2]["side_name"] is None  # miss => null (null_value analog)


def test_nested_cap_and_order(ray_session, tmp_path):
    import pyarrow.parquet as pq

    d = tmp_path
    pq.write_table(pa.table({"mk": pa.array([7], pa.int64()),
                             "v": pa.array(["m"])}),
                   str(d / "master.parquet"))
    pq.write_table(pa.table({
        "pk": pa.array([7] * 5, pa.int64()),
        "ord": pa.array([5, 3, 1, 4, 2], pa.int64()),
    }), str(d / "child.parquet"))
    spec = DocSpec(master="master", key="mk",
                   mappings={"mk_out": "mk"},
                   nested=(NestedSpec("child", "pk", "mk", fields=["ord"],
                                      out="kids", order_by="ord", limit=3),))
    rows = build_documents(str(d), spec).to_pandas().to_dict("records")
    assert len(rows) == 1
    kids = rows[0]["kids"]
    assert [k["ord"] for k in kids] == [1, 2, 3]  # ordered + capped at 3
