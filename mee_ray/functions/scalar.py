"""Vectorized scalar-function DSL.

Re-expression of the reference's per-row function resolver
(modules/handlers/common.py:32-127: ``resolve`` + the hand-rolled
paren/quote-aware argument splitter) and its built-in functions
(common.py:129-148: ``echo``/``yesterday``/``max``/``min``/``sum``/
``abs`` and the unary ``+field``/``-field`` sign forms).  Differences
by design:

* expressions compile ONCE to a closure over ``pyarrow.Table`` →
  ``pyarrow.Array`` — evaluation is per batch, never per row;
* the dotted-import fallback (common.py:60-66) is supported
  (``function_for_name``, resolved EAGERLY at compile on the driver —
  a bad path can never fail inside a distributed task), but the
  preferred extension surface is explicit ``register(name, fn)``
  (SURVEY.md §2.10): registration is declarative and picklable;
* unknown names and malformed expressions raise ``ExprError`` at
  compile time, mirroring the reference's eager config validation.

Grammar (same shapes the reference accepts):
  expr     := call | literal | column
  call     := name '(' expr (',' expr)* ')'
  literal  := quoted string | int | float   (via ``echo`` semantics)
  column   := [+-]? identifier              (sign negates / asserts)
"""

from __future__ import annotations

import ast
import datetime as _dt
from typing import Callable

import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["ExprError", "compile_expr", "eval_expr", "register", "registered"]


class ExprError(ValueError):
    """Malformed expression or unknown function (compile-time)."""


# --------------------------------------------------------------- parser


def _split_args(s: str) -> list[str]:
    """Split a call's argument list on top-level commas, honoring
    nested parens and single/double quotes (semantics of the
    reference's splitter, common.py:73-127; independent implementation)."""
    out, depth, quote, cur = [], 0, None, []
    escaped = False
    for ch in s:
        if quote:
            cur.append(ch)
            if escaped:
                # backslash-escaped char inside a literal (incl. \' )
                # — ast.literal_eval accepts these, so the splitter
                # must not treat the escaped quote as the terminator
                escaped = False
            elif ch == "\\":
                escaped = True
            elif ch == quote:
                quote = None
        elif ch in "'\"":
            quote = ch
            cur.append(ch)
        elif ch == "(":
            depth += 1
            cur.append(ch)
        elif ch == ")":
            depth -= 1
            if depth < 0:
                raise ExprError(f"unbalanced ')' in {s!r}")
            cur.append(ch)
        elif ch == "," and depth == 0:
            out.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if depth != 0 or quote is not None:
        raise ExprError(f"unbalanced parens/quotes in {s!r}")
    out.append("".join(cur).strip())
    if len(out) == 1 and out[0] == "":
        return []                     # zero-arg call: fn()
    if any(a == "" for a in out):
        # 'sum(a,,b)' must fail at COMPILE, not silently parse as two
        # args (the eager-validation contract of this module)
        raise ExprError(f"empty argument in {s!r}")
    return out


def _parse(expr: str):
    """→ ('call', name, [sub]) | ('lit', value) | ('col', name, sign)"""
    expr = expr.strip()
    if not expr:
        raise ExprError("empty expression")
    # quoted / numeric literal
    if expr[0] in "'\"" or expr.replace(".", "", 1).lstrip("+-").isdigit():
        try:
            return ("lit", ast.literal_eval(expr))
        except (ValueError, SyntaxError) as e:
            raise ExprError(f"bad literal {expr!r}") from e
    lp = expr.find("(")
    if lp > 0 and expr.endswith(")"):
        name = expr[:lp].strip()
        # dotted names are the importlib fallback (function_for_name);
        # every segment must still be an identifier
        if not all(p.isidentifier() for p in name.split(".")):
            raise ExprError(f"bad function name {name!r}")
        return ("call", name, [_parse(a) for a in _split_args(expr[lp + 1:-1])])
    sign = 1
    if expr[0] in "+-":
        sign = -1 if expr[0] == "-" else 1
        expr = expr[1:].strip()
    if not expr.isidentifier():
        raise ExprError(f"bad column reference {expr!r}")
    return ("col", expr, sign)


# ------------------------------------------------------------- builtins


def _nary(kernel):
    def f(*args):
        if not args:
            raise ExprError("need at least one argument")
        acc = args[0]
        for a in args[1:]:
            acc = kernel(acc, a)
        return acc
    return f


def _echo(*args):
    if len(args) != 1:
        raise ExprError("echo takes exactly one argument")
    return args[0]


def _yesterday(*args):
    if args:
        raise ExprError("yesterday takes no arguments")
    d = _dt.date.today() - _dt.timedelta(days=1)
    return pa.scalar(d.isoformat())


# arity bounds, enforced at compile (the module contract: a bad
# config fails at pipeline build, never inside a distributed task);
# zero-arg constants folded at compile so every batch sees one value
_MIN_ARGS = {"max": 1, "min": 1, "sum": 1, "abs": 1, "mul": 1,
             "sub": 2, "div": 2, "coalesce": 1, "echo": 1,
             "round": 1, "length": 1, "lower": 1, "upper": 1}
_MAX_ARGS = {"sub": 2, "div": 2, "abs": 1, "round": 2, "length": 1,
             "lower": 1, "upper": 1, "echo": 1, "yesterday": 0}
_CONST_AT_COMPILE = {"yesterday"}

_REGISTRY: dict[str, Callable] = {
    "echo": _echo,
    "yesterday": _yesterday,
    "max": _nary(pc.max_element_wise),
    "min": _nary(pc.min_element_wise),
    "sum": _nary(pc.add),
    "abs": lambda a: pc.abs(a),
    # engine extras beyond the reference set (same calling convention)
    "mul": _nary(pc.multiply),
    "sub": lambda a, b: pc.subtract(a, b),
    "div": lambda a, b: pc.divide(a, b),
    "coalesce": lambda *a: pc.coalesce(*a),
    "round": lambda a, n=pa.scalar(0): pc.round(a, ndigits=n.as_py()
                                                if isinstance(n, pa.Scalar) else n),
    "length": lambda a: pc.utf8_length(a),
    "lower": lambda a: pc.utf8_lower(a),
    "upper": lambda a: pc.utf8_upper(a),
}


def register(name: str, fn: Callable) -> None:
    """User-extension surface (reference's dotted-import fallback,
    common.py:60-66, made explicit).  ``fn`` receives pyarrow
    Arrays/Scalars and must return one."""
    if not name.isidentifier():
        raise ExprError(f"bad function name {name!r}")
    _REGISTRY[name] = fn


def registered() -> list[str]:
    return sorted(_REGISTRY)


def function_for_name(dotted: str) -> Callable:
    """Resolve ``pkg.mod.attr`` to a callable — the reference's
    ``utils.functionForName`` extension hook (utils/__init__.py:9-31)
    re-expressed with importlib.  Resolution is eager (a bad dotted
    path fails at pipeline compile on the driver, never inside a
    distributed task) and the result must be callable."""
    import importlib
    mod_name, _, attr = dotted.rpartition(".")
    if not mod_name or not all(p.isidentifier()
                               for p in dotted.split(".")):
        raise ExprError(f"bad dotted function name {dotted!r}")
    try:
        obj = getattr(importlib.import_module(mod_name), attr)
    except (ImportError, AttributeError) as e:
        raise ExprError(f"cannot resolve {dotted!r}: {e}") from e
    if not callable(obj):
        raise ExprError(f"{dotted!r} is not callable")
    return obj


# ------------------------------------------------------------- compiler


def _compile_node(node) -> Callable[[pa.Table], object]:
    kind = node[0]
    if kind == "lit":
        s = pa.scalar(node[1])
        return lambda t: s
    if kind == "col":
        _, name, sign = node
        if sign < 0:
            return lambda t: pc.negate(t[name])
        return lambda t: t[name]
    _, name, subs = node
    fn = _REGISTRY.get(name)
    if fn is None and "." in name:
        fn = function_for_name(name)   # dotted-import fallback
    if fn is None:
        raise ExprError(f"unknown function {name!r} "
                        f"(register it with mee_ray.functions.register, "
                        f"or use a dotted import path)")
    sub_fns = [_compile_node(s) for s in subs]
    if name == "echo":  # literal-only, validated eagerly like the reference
        if len(subs) != 1 or subs[0][0] != "lit":
            raise ExprError("echo takes exactly one literal argument")
    if name in _MIN_ARGS and len(subs) < _MIN_ARGS[name]:
        # arity errors surface at compile (pipeline build), not per
        # batch inside a distributed task
        raise ExprError(f"{name} needs at least "
                        f"{_MIN_ARGS[name]} argument(s)")
    if name in _MAX_ARGS and len(subs) > _MAX_ARGS[name]:
        raise ExprError(f"{name} takes at most "
                        f"{_MAX_ARGS[name]} argument(s), "
                        f"got {len(subs)}")
    if not subs and name in _CONST_AT_COMPILE:
        # zero-arg constants (yesterday) evaluate ONCE at compile on
        # the driver: per-batch evaluation on workers could straddle
        # midnight (or timezones) and tag one dataset with two values
        const = fn()
        return lambda t: const
    return lambda t: fn(*(sf(t) for sf in sub_fns))


def compile_expr(expr: str) -> Callable[[pa.Table], object]:
    """Compile ``expr`` to ``fn(batch: pa.Table) -> pa.Array | Scalar``.
    Raises ExprError on malformed input or unknown names (eager, so a
    bad config fails at pipeline build, not inside a task)."""
    return _compile_node(_parse(expr))


def eval_expr(expr: str, batch: pa.Table):
    return compile_expr(expr)(batch)
