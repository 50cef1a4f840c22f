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


# -------------------------------------------------- multi-index config


class MultiSpec:
    """Many document collections in ONE config — the reference's
    HandlerConfig (modules/handlers/handlerconfig.py:33-119): the top
    level of the file is ``index_alias → type_name → spec``, each leaf
    a full DocSpec dict, and one change event routes to EVERY
    collection that watches the changed table
    (getConfigItemsByDatabaseAndTable, handlerconfig.py:105-110 +
    :145-150).  The reference keys watchers by (database, table); here
    a table name is unique within an ``sf_dir``, so routing keys on
    table alone."""

    def __init__(self, specs: "dict[tuple[str, str], DocSpec]"):
        self._specs = dict(specs)

    # -- addressing (handlerconfig.py:94-103)

    def indices(self) -> list:
        seen: dict = {}
        for (idx, _t) in self._specs:
            seen.setdefault(idx, None)
        return list(seen)

    def types(self, index: str) -> list:
        return [t for (i, t) in self._specs if i == index]

    def spec(self, index: str, type_name: str) -> DocSpec | None:
        return self._specs.get((index, type_name))

    def __iter__(self):
        for (idx, typ), spec in self._specs.items():
            yield idx, typ, spec

    def __len__(self) -> int:
        return len(self._specs)

    # -- routing (handlerconfig.py:105-110, :145-150)

    def specs_for_table(self, table: str) -> list:
        """Every collection watching ``table``, with the role the table
        plays there: ``(index, type, spec, role)`` where role is
        ``"master"``, ``"join"`` or ``"nested"``.  A collection whose
        spec references the table in several roles appears once per
        role (the reference returns one config ITEM per watching
        statement, same multiplicity)."""
        hits = []
        for (idx, typ), spec in self._specs.items():
            if spec.master == table:
                hits.append((idx, typ, spec, "master"))
            for j in spec.joins:
                if j.table == table:
                    hits.append((idx, typ, spec, "join"))
            for n in spec.nested:
                if n.table == table:
                    hits.append((idx, typ, spec, "nested"))
        return hits

    def route_change(self, sf_dir: str, change) -> dict:
        """Apply one table-change batch to every watching collection —
        the updateservice dispatch (reference updateservice.py: each
        binlog event fans out to all config items watching its table).
        Returns ``{(index, type): (docs, deleted)}`` — the re-emitted
        documents Dataset plus the table of master keys to tombstone.
        Master-table watchers go through the filter-boundary rewrite
        (apply_master_delta, which can tombstone); joined/nested
        watchers through the reverse-query rebuild (apply_join_delta,
        which only re-emits — its ``deleted`` is always empty).
        A spec watching the table in BOTH roles (a self-join:
        j.table == spec.master) runs both paths — the reference
        processes one config item per watching statement — with the
        join-path re-emits deduplicated against the master-path blast
        radius (both rebuild against the same post-change state, so
        overlapping keys carry identical documents).  Collections not
        watching the table are untouched."""
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        from mee_ray.pipelines.docbuild import (apply_join_delta,
                                                apply_master_delta)

        out = {}
        for (idx, typ), spec in self._specs.items():
            is_master = spec.master == change.table
            is_joined = (any(j.table == change.table for j in spec.joins)
                         or any(n.table == change.table
                                for n in spec.nested))
            if not (is_master or is_joined):
                continue
            key_type = pq.read_schema(
                f"{sf_dir}/{spec.master}.parquet").field(spec.key).type
            docs = deleted = None
            master_keys: set = set()
            if is_master:
                docs, deleted = apply_master_delta(sf_dir, spec, change)
                if change.upserts is not None:
                    master_keys |= set(
                        change.upserts[spec.key].to_pylist())
                master_keys |= set(change.delete_keys or ())
            if is_joined:
                jdocs = apply_join_delta(sf_dir, spec, change)
                # documents carry OUTPUT fields, so dedup keys on the
                # mapping that re-emits the master key; a spec mapping
                # no identity column emits both copies (identical
                # content — the index sink's LWW tombstone+re-add
                # makes the duplicate a no-op)
                key_out = next((f for f, src in spec.mappings.items()
                                if src == spec.key), None)
                if master_keys and key_out is not None:
                    drop = pa.array(sorted(master_keys), key_type)

                    def dedup(t: pa.Table, drop=drop,
                              key=key_out) -> pa.Table:
                        return t.filter(pc.invert(pc.is_in(
                            t[key], value_set=drop)))

                    jdocs = jdocs.map_batches(dedup,
                                              batch_format="pyarrow")
                docs = jdocs if docs is None else docs.union(jdocs)
            if deleted is None:
                deleted = pa.table(
                    {spec.key: pa.array([], key_type)})
            out[(idx, typ)] = (docs, deleted)
        return out


def multispec_from_dict(d: dict, origin: str = "<dict>") -> MultiSpec:
    """``{index_alias: {type_name: spec-dict}}`` → validated MultiSpec.
    Mirrors HandlerConfig._resolve (handlerconfig.py:83-92): every leaf
    is compiled eagerly, so a bad spec fails at load naming its
    ``index.type`` address."""
    if not isinstance(d, dict):
        raise IllegalDocSpec(f"{origin}: multi-spec must be a mapping of "
                             f"index_alias -> type_name -> spec, got "
                             f"{type(d).__name__}")
    specs: dict = {}
    for idx, types in d.items():
        if not isinstance(idx, str) or not idx:
            raise IllegalDocSpec(f"{origin}: index alias must be a "
                                 f"non-empty string, got {idx!r}")
        if not isinstance(types, dict) or not types:
            raise IllegalDocSpec(f"{origin}: index {idx!r} must map to a "
                                 f"non-empty mapping of type_name -> spec")
        for typ, spec_d in types.items():
            if not isinstance(typ, str) or not typ:
                raise IllegalDocSpec(f"{origin}: index {idx!r}: type name "
                                     f"must be a non-empty string, got "
                                     f"{typ!r}")
            specs[(idx, typ)] = docspec_from_dict(
                spec_d, origin=f"{origin}[{idx}.{typ}]")
    return MultiSpec(specs)


def load_multispec(path: str) -> MultiSpec:
    """Load a multi-index config file.  YAML semantics mirror
    HandlerConfig.loadFromFile (handlerconfig.py:56-69): a top-level
    LIST of one-index mappings merges into one dict (the include-
    fragments idiom), and top-level keys starting with ``__`` are
    dropped (the anchor-definitions convention); ``!include`` works as
    in :func:`load_docspec`.  JSON files mirror loadFromJson — no list
    merge, no ``__`` stripping."""
    if path.endswith(".json"):
        with open(path) as f:
            raw = json.load(f)
    else:
        raw = _load_raw(os.path.abspath(path))
        if isinstance(raw, list):
            merged: dict = {}
            for item in raw:
                if not isinstance(item, dict):
                    raise IllegalDocSpec(
                        f"{path}: a top-level list must contain only "
                        f"mappings, got {type(item).__name__}")
                merged.update(item)
            raw = merged
        if isinstance(raw, dict):
            raw = {k: v for k, v in raw.items()
                   if not (isinstance(k, str) and k.startswith("__"))}
    return multispec_from_dict(raw, origin=path)
