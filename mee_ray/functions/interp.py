"""``%`` expression interpolation — the reference's template language
as a compile-once vectorized batch transform (SURVEY.md §2.2 M4).

The reference resolves templates like ``%key.field:(default)`` lazily,
per row, against a dict-of-dicts ``HandlerContext`` (reference
modules/handlers/v1/commonhandler.py:31-39 — ``_EXP_RE`` /
``_ORIGIN_VALUE_RE``; evaluation ``exp_value`` :437-487).  The exact
semantics mirrored here:

* ``%field`` or ``%__master.field`` references a column of the current
  document namespace (master columns plus already-computed fields —
  the flat-batch analog of the reference's context rows).  The
  reference's cross-item keys collapse to this one namespace because
  docbuild materializes joins as columns before templates run.
* ``:(default)`` supplies a fallback used when the referenced value is
  null (the reference: context row falsy or field missing,
  commonhandler.py:446-455) or the column is absent entirely.  The
  default literal is parsed like the reference's ``echo`` scalar
  (``ast.literal_eval`` with string fallback, modules/handlers/
  common.py:129-135): ``:(0)`` is the int 0, ``:('x')`` the string x.
* **Whole-value templates keep the native type** — a ``value`` that is
  exactly one expression returns the referenced column as-is
  (``_ORIGIN_VALUE_RE`` branch, commonhandler.py:495-500); anything
  with surrounding text stringifies each match (``unicode(ret)`` in
  ``sub_exp``, :476).
* ``%%`` escapes a literal percent (EXP_RE group 1, :469-470).

Everything compiles ONCE (template → plan) and evaluates as pyarrow
kernels over whole batches — no per-row formatting in the hot path.
"""

from __future__ import annotations

import ast
import re
from dataclasses import dataclass

import pyarrow as pa
import pyarrow.compute as pc

# One template expression.  Structure (same grammar as the reference's
# _EXP_RE, commonhandler.py:31): optional "<key>." qualifier, field
# name, optional ":(<default>)" where the default is either a
# single-quoted string (escaped quotes allowed) or any run without a
# closing paren.
_REF = re.compile(
    r"%%"                                   # escaped literal percent
    r"|%(?:(?P<key>\w+)\.)?(?P<field>\w+)"  # %field / %key.field
    # :(default) — quoted (escapes allowed) or unquoted (any run
    # without ')'; apostrophes are fine as long as the default does
    # not START with a quote, which selects the quoted form)
    r"(?::\((?P<dflt>'(?:\\.|[^'\\])*'|(?!')[^)]*)\))?"
)


class IllegalTemplate(ValueError):
    """Malformed or unresolvable ``%`` template (eager, at compile)."""


def parse_default(text: str | None):
    """Reference ``echo`` semantics (modules/handlers/common.py:129-135):
    literal-eval where possible, else the raw string; None when no
    default was written."""
    if text is None:
        return None
    try:
        return ast.literal_eval(text)
    except (ValueError, SyntaxError):
        return text


@dataclass(frozen=True)
class _Ref:
    field: str
    default: object
    has_default: bool


def _segments(template: str) -> list:
    """Template → list of str literals and _Ref expressions."""
    out: list = []
    pos = 0
    for m in _REF.finditer(template):
        if m.start() > pos:
            out.append(template[pos:m.start()])
        if m.group(0) == "%%":
            out.append("%")
        else:
            key = m.group("key")
            if key is not None and key != "__master":
                raise IllegalTemplate(
                    f"unknown namespace {key!r} in {template!r} — flat "
                    "documents expose one namespace (%field or "
                    "%__master.field)")
            out.append(_Ref(m.group("field"),
                            parse_default(m.group("dflt")),
                            m.group("dflt") is not None))
            if m.group("dflt") is None and \
                    template[m.end():m.end() + 2] == ":(":
                # a default FOLLOWS but did not parse (e.g. an
                # unterminated quote): appending it as literal text
                # would be silent wrong output — fail at compile, the
                # module's eager-validation contract
                raise IllegalTemplate(
                    f"malformed default after %{m.group('field')} in "
                    f"{template!r}")
        pos = m.end()
    if pos < len(template):
        out.append(template[pos:])
    # merge adjacent literals (e.g. produced by %%)
    merged: list = []
    for seg in out:
        if isinstance(seg, str) and merged and isinstance(merged[-1], str):
            merged[-1] += seg
        else:
            merged.append(seg)
    return merged


def template_columns(template: str) -> list[str]:
    """Columns a template references (for read pruning)."""
    return sorted({s.field for s in _segments(template)
                   if isinstance(s, _Ref)})


def is_template(value: str) -> bool:
    """True if the mapping value contains at least one ``%`` expression
    (or escape) — i.e. must go through the interpolator."""
    return any(not isinstance(s, str) for s in _segments(value)) \
        or "%%" in value


def _resolve(ref: _Ref, ns: pa.Table, n: int) -> pa.Array:
    """One expression → a length-n Arrow array with the default
    substituted for nulls / missing columns."""
    if ref.field not in ns.schema.names:
        if not ref.has_default:
            raise IllegalTemplate(
                f"template references unknown column {ref.field!r}")
        typ = None if ref.default is None else pa.scalar(ref.default).type
        return pa.array([ref.default] * n, type=typ)
    col = ns[ref.field]
    col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if ref.has_default:
        # the output TYPE must depend only on (column type, default) —
        # never on whether THIS batch happens to contain nulls — or
        # different batches of one dataset would disagree on schema
        try:
            fill = pa.scalar(ref.default, col.type)
        except (pa.ArrowInvalid, pa.ArrowTypeError):
            # type-incompatible default (e.g. string default on an int
            # column): stringify the column so both representations fit
            col = pc.cast(col, pa.string())
            fill = pa.scalar(str(ref.default), pa.string())
        if col.null_count:
            col = pc.fill_null(col, fill)
    return col


def _stringify(arr: pa.Array) -> pa.Array:
    if pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type):
        return arr
    if pa.types.is_floating(arr.type):
        # match Python str(float) (the reference's unicode(ret)):
        # Arrow's cast prints 1.0 as "1" — format via Python for floats
        return pa.array([None if v is None else str(v)
                         for v in arr.to_pylist()], pa.string())
    return pc.cast(arr, pa.string())


def compile_template(template: str):
    """Template → ``fn(namespace_table) -> pa.Array`` (vectorized).

    Whole-value templates (exactly one expression, no literal text)
    return the referenced column with its native type; mixed templates
    string-concatenate literals and stringified expressions per row
    (nulls without a default propagate to a null result row, the
    columnar reading of the reference's exp failure)."""
    segs = _segments(template)
    if not segs:
        raise IllegalTemplate("empty template")

    if len(segs) == 1 and isinstance(segs[0], _Ref):
        ref = segs[0]

        def whole(ns: pa.Table, ref=ref) -> pa.Array:
            return _resolve(ref, ns, ns.num_rows)

        return whole

    def mixed(ns: pa.Table, segs=tuple(segs)) -> pa.Array:
        n = ns.num_rows
        parts = []
        for seg in segs:
            if isinstance(seg, str):
                parts.append(pa.array([seg] * n, pa.string()))
            else:
                parts.append(_stringify(_resolve(seg, ns, n)))
        return pc.binary_join_element_wise(
            *parts, "", null_handling="emit_null")

    return mixed
