"""YAML/JSON document-spec loader — the reference's config-file UX.

mee's whole user surface is a YAML handler config (reference
README.md:80-143) assembled with an ``!include`` tag
(modules/handlers/loader.py:10-38) and validated eagerly into typed
config objects with a battery of IllegalConfigException checks
(modules/handlers/handlerconfig.py:33-118 schema, :181-347 validation).
This module gives :class:`~mee_ray.pipelines.docbuild.DocSpec` the same
surface: declarative files → validated frozen dataclasses, bad configs
fail at LOAD time with a typed error, never inside a Ray task.

Schema (YAML or JSON — YAML is a superset, one loader serves both)::

    master: customer           # master table name
    key: c_custkey             # master primary key column
    mappings:                  # out_field: column, functions-DSL expr,
      cust_id: c_custkey       #   or "%" template (M4 interpolation)
      balance_capped: "min(c_acctbal, echo(5000.0))"
      label: "cust-%c_custkey:(0)"
    filter:                    # reference filterData shape
      c_mktsegment: [BUILDING, AUTOMOBILE]
      c_acctbal: {">": 0.0}
    joins:                     # exactly-one-row lookups (J1)
      - table: nation
        key: n_nationkey
        master_key: c_nationkey
        fields: {nation_name: n_name}
    nested:                    # capped one-to-many rollups (J2)
      - table: orders
        parent_key: o_custkey
        master_key: c_custkey
        fields: [o_orderkey, o_totalprice]
        out: orders
        order_by: o_orderkey
        limit: 50

``!include other.yml`` splices a fragment (resolved relative to the
including file); include cycles are detected and rejected.
"""

from __future__ import annotations

import json
import os

from mee_ray.pipelines.docbuild import (DocSpec, IllegalDocSpec, JoinSpec,
                                        NestedSpec)

_FILTER_OPS = {"==", "!=", "<>", ">", ">=", "<", "<="}

_TOP_KEYS = {"master", "key", "mappings", "filter", "joins", "nested"}
_JOIN_KEYS = {"table", "key", "master_key", "fields", "on_parent_delete"}
_NESTED_KEYS = {"table", "parent_key", "master_key", "fields", "out",
                "order_by", "limit"}


def _reject_unknown(d: dict, allowed: set, where: str) -> None:
    unknown = sorted(set(d) - allowed)
    if unknown:
        raise IllegalDocSpec(f"{where}: unknown keys {unknown} "
                             f"(allowed: {sorted(allowed)})")


def _require_str(d: dict, k: str, where: str) -> str:
    v = d.get(k)
    if not isinstance(v, str) or not v:
        raise IllegalDocSpec(f"{where}: {k!r} must be a non-empty string, "
                             f"got {v!r}")
    return v


def _validate_filter(flt, where: str) -> None:
    if not isinstance(flt, dict):
        raise IllegalDocSpec(f"{where}: filter must be a mapping, "
                             f"got {type(flt).__name__}")
    for col, cond in flt.items():
        if isinstance(cond, dict):
            bad = sorted(set(cond) - _FILTER_OPS)
            if bad:
                raise IllegalDocSpec(
                    f"{where}: filter on {col!r} uses unknown ops {bad} "
                    f"(allowed: {sorted(_FILTER_OPS)})")


def docspec_from_dict(d: dict, origin: str = "<dict>") -> DocSpec:
    """Dict → validated DocSpec.  Every malformation raises
    IllegalDocSpec naming the offending element — the analog of the
    reference's eager IllegalConfigException battery."""
    if not isinstance(d, dict):
        raise IllegalDocSpec(f"{origin}: spec must be a mapping, "
                             f"got {type(d).__name__}")
    _reject_unknown(d, _TOP_KEYS, origin)
    master = _require_str(d, "master", origin)
    key = _require_str(d, "key", origin)

    mappings = d.get("mappings")
    if not isinstance(mappings, dict) or not mappings:
        raise IllegalDocSpec(f"{origin}: 'mappings' must be a non-empty "
                             f"mapping of out_field -> column/expr")
    for out_f, src in mappings.items():
        if not isinstance(src, str) or not src:
            raise IllegalDocSpec(f"{origin}: mapping {out_f!r} must map to "
                                 f"a column name or DSL expression string")

    flt = d.get("filter")
    if flt is not None:
        _validate_filter(flt, origin)

    joins = []
    for i, j in enumerate(d.get("joins") or ()):
        where = f"{origin}: joins[{i}]"
        if not isinstance(j, dict):
            raise IllegalDocSpec(f"{where}: must be a mapping")
        if "nested" in j:
            raise IllegalDocSpec(f"{where}: joins cannot nest ('nested' "
                                 f"belongs at the top level, one deep)")
        _reject_unknown(j, _JOIN_KEYS, where)
        fields = j.get("fields")
        if not isinstance(fields, dict) or not fields:
            raise IllegalDocSpec(f"{where}: 'fields' must be a non-empty "
                                 f"mapping of out_field -> source column")
        opd = j.get("on_parent_delete", "reeval")
        if opd is None:
            # YAML parses a bare `on_parent_delete: null` to None —
            # exactly the documented mode, so coerce rather than trap
            opd = "null"
        if opd not in ("reeval", "null"):
            raise IllegalDocSpec(f"{where}: on_parent_delete must be "
                                 f"'reeval' or 'null', got {opd!r}")
        joins.append(JoinSpec(_require_str(j, "table", where),
                              _require_str(j, "key", where),
                              _require_str(j, "master_key", where),
                              dict(fields), on_parent_delete=opd))

    nested = []
    for i, n in enumerate(d.get("nested") or ()):
        where = f"{origin}: nested[{i}]"
        if not isinstance(n, dict):
            raise IllegalDocSpec(f"{where}: must be a mapping")
        if "nested" in n or "joins" in n:
            # the invariant the reference enforces at
            # handlerconfig.py:373-374: nesting is one level deep
            raise IllegalDocSpec(f"{where}: nested-in-nested is not "
                                 f"representable (one level deep only)")
        _reject_unknown(n, _NESTED_KEYS, where)
        fields = n.get("fields")
        if not isinstance(fields, list) or not fields or \
                not all(isinstance(f, str) for f in fields):
            raise IllegalDocSpec(f"{where}: 'fields' must be a non-empty "
                                 f"list of child column names")
        limit = n.get("limit", 50)
        # bool is an int subclass: `limit: true` must not silently
        # become limit=1
        if not isinstance(limit, int) or isinstance(limit, bool) \
                or limit <= 0:
            raise IllegalDocSpec(f"{where}: 'limit' must be a positive "
                                 f"integer, got {limit!r}")
        order_by = n.get("order_by")
        if order_by is not None and not isinstance(order_by, str):
            raise IllegalDocSpec(f"{where}: 'order_by' must be a column "
                                 f"name string")
        nested.append(NestedSpec(_require_str(n, "table", where),
                                 _require_str(n, "parent_key", where),
                                 _require_str(n, "master_key", where),
                                 list(fields),
                                 _require_str(n, "out", where),
                                 order_by, limit))

    spec = DocSpec(master=master, key=key, mappings=dict(mappings),
                   filter=dict(flt) if flt else None,
                   joins=tuple(joins), nested=tuple(nested))
    spec.validate()   # duplicates / identifier checks
    return spec


# ----------------------------------------------------------- file I/O


def _make_loader(base_dir: str, stack: tuple):
    """A SafeLoader with a path-aware ``!include`` constructor.
    ``stack`` is the chain of absolute paths currently being loaded —
    re-entering one is an include cycle and raises."""
    import yaml

    class _Loader(yaml.SafeLoader):
        pass

    def _include(loader, node):
        rel = loader.construct_scalar(node)
        path = os.path.normpath(os.path.join(base_dir, rel))
        if path in stack:
            chain = " -> ".join(list(stack) + [path])
            raise IllegalDocSpec(f"include cycle: {chain}")
        return _load_raw(path, stack)

    _Loader.add_constructor("!include", _include)
    return _Loader


def _load_raw(path: str, stack: tuple = ()):
    import yaml

    with open(path) as f:
        text = f.read()
    return yaml.load(text, Loader=_make_loader(os.path.dirname(path),
                                               stack + (path,)))


def load_docspec(path: str) -> DocSpec:
    """Load + validate a DocSpec from a YAML or JSON file (JSON is
    valid YAML; ``.json`` files skip the !include machinery)."""
    if path.endswith(".json"):
        with open(path) as f:
            raw = json.load(f)
    else:
        raw = _load_raw(os.path.abspath(path))
    return docspec_from_dict(raw, origin=path)
