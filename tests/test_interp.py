"""`%` template interpolation (M4) — table-driven like the reference's
regex suite (reference modules/handlers/v1/test/test_exp_re.py:12-89),
plus vectorized-evaluation and docbuild-integration checks."""

import duckdb
import pandas as pd
import pyarrow as pa
import pytest

from mee_ray.functions.interp import (IllegalTemplate, compile_template,
                                      is_template, parse_default,
                                      template_columns)

SF = "/root/testdata/sf0.001"


# --------------------------------------------------- parse semantics --

@pytest.mark.parametrize("tpl,cols", [
    ("%a", ["a"]),
    ("%__master.a", ["a"]),
    ("x-%a/%b:(0)", ["a", "b"]),
    ("%%", []),
    ("no refs at all", []),
    ("%a:('quoted )(')", ["a"]),
])
def test_template_columns(tpl, cols):
    assert template_columns(tpl) == cols


@pytest.mark.parametrize("raw,val", [
    ("0", 0),
    ("1.5", 1.5),
    ("'x'", "x"),
    ("None", None),
    ("bare", "bare"),       # not literal-evaluable → raw string
    (None, None),
])
def test_parse_default(raw, val):
    assert parse_default(raw) == val


def test_is_template():
    assert is_template("%a")
    assert is_template("x%a y")
    assert is_template("100%%")
    assert not is_template("plain text")
    assert not is_template("c_custkey + 1")   # DSL expr, no %


def test_unknown_namespace_rejected():
    with pytest.raises(IllegalTemplate):
        compile_template("%__parent.a")   # only __master/bare supported


# ------------------------------------------------ vectorized evaluate --

NS = pa.table({
    "a": pa.array([1, 2, None], pa.int64()),
    "s": pa.array(["x", None, "z"]),
    "f": pa.array([1.5, 2.0, 0.25], pa.float64()),
})


def test_whole_value_keeps_native_type():
    out = compile_template("%a")(NS)
    assert out.type == pa.int64()
    assert out.to_pylist() == [1, 2, None]


def test_whole_value_default_fills_null():
    out = compile_template("%a:(7)")(NS)
    assert out.type == pa.int64()
    assert out.to_pylist() == [1, 2, 7]


def test_whole_value_missing_column_uses_default():
    out = compile_template("%ghost:(42)")(NS)
    assert out.to_pylist() == [42, 42, 42]
    with pytest.raises(IllegalTemplate):
        compile_template("%ghost")(NS)


def test_mixed_stringifies_and_concats():
    out = compile_template("id=%a num")(NS)
    assert out.to_pylist() == ["id=1 num", "id=2 num", None]


def test_mixed_float_matches_python_str():
    out = compile_template("<%f>")(NS)
    assert out.to_pylist() == ["<1.5>", "<2.0>", "<0.25>"]


def test_percent_escape():
    out = compile_template("100%% of %a:(0)")(NS)
    assert out.to_pylist() == ["100% of 1", "100% of 2", "100% of 0"]


def test_qualified_master_form():
    out = compile_template("%__master.s:('none')")(NS)
    assert out.to_pylist() == ["x", "none", "z"]


def test_string_default_on_int_column_stringifies():
    out = compile_template("%a:('n/a')")(NS)
    assert out.to_pylist() == ["1", "2", "n/a"]


def test_incompatible_default_is_type_stable_across_batches():
    """The output type must depend only on (column type, default) —
    a batch with no nulls and a batch with nulls must agree, or a
    multi-batch dataset gets conflicting block schemas."""
    f = compile_template("%a:('n/a')")
    no_nulls = pa.table({"a": pa.array([1, 2], pa.int64())})
    with_nulls = pa.table({"a": pa.array([3, None], pa.int64())})
    t1, t2 = f(no_nulls), f(with_nulls)
    assert t1.type == t2.type == pa.string()
    assert t1.to_pylist() == ["1", "2"]
    assert t2.to_pylist() == ["3", "n/a"]
    # compatible default keeps the native type in both cases
    g = compile_template("%a:(0)")
    assert g(no_nulls).type == g(with_nulls).type == pa.int64()


def test_literal_only_template_via_escape():
    out = compile_template("%%done")(NS)
    assert out.to_pylist() == ["%done"] * 3


def test_docbuild_normalize_in_place_and_dsl_percent_literal(ray_session):
    """Review regressions: (1) an output field reusing its source
    column's name must still read that column (DSL exprs evaluate on
    the raw master batch); (2) a valid DSL expr whose string literal
    contains '%' must stay DSL, not be misrouted to the template
    compiler."""
    from mee_ray.pipelines.docbuild import DocSpec, build_documents

    spec = DocSpec(
        master="customer", key="c_custkey",
        mappings={
            "cust_id": "c_custkey",
            # normalize-in-place: output name == source column
            "c_acctbal": "max(c_acctbal, echo(0.0))",
            # DSL with a %-bearing string literal
            "tag": "echo('100%')",
        },
    )
    df = build_documents(SF, spec).to_pandas()
    assert (df["c_acctbal"] >= 0).all() and len(df) == 150
    assert (df["tag"] == "100%").all()


# ------------------------------------------------- docbuild + oracle --

def test_docbuild_interpolated_matches_duckdb(ray_session):
    from mee_ray.pipelines.docbuild import (DOCBUILD_INTERP_SQL,
                                            docbuild_interpolated)

    got = (docbuild_interpolated(SF).to_pandas()
           .sort_values("cust_id").reset_index(drop=True))
    con = duckdb.connect()
    for t in ("customer", "nation"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    want = (con.execute(DOCBUILD_INTERP_SQL).df()
            .sort_values("cust_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got[sorted(got.columns)],
                                  want[sorted(want.columns)],
                                  check_dtype=False)
    # default actually fired for the join-miss rows
    assert (got.loc[got.small_nation.isna(), "tag"] == "%-unknown").all()
    assert (~got.small_nation.isna()).any()


def test_unquoted_default_with_apostrophe():
    """%field:(don't) must parse the apostrophe-bearing default — the
    old alternation silently appended ':(don't)' as literal text."""
    from mee_ray.functions.interp import compile_template
    import pyarrow as pa

    fn = compile_template("%name:(don't)")
    t = pa.table({"name": pa.array(["x", None])})
    assert fn(t).to_pylist() == ["x", "don't"]


def test_malformed_default_fails_at_compile():
    """An unparseable default (unterminated quote) must raise
    IllegalTemplate eagerly, never emit the raw text."""
    import pytest as _pytest

    from mee_ray.functions.interp import IllegalTemplate, compile_template
    with _pytest.raises(IllegalTemplate, match="malformed default"):
        compile_template("%name:('abc)")
