"""Validated Parquet sources for corpus and delta-event inputs."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.dataset as pads

# Input contract (BASELINE.json input_hint): the corpus table shape.
CORPUS_SCHEMA = {
    "repo": pa.string(),
    "path": pa.string(),
    "commit": pa.string(),
    "lang": pa.string(),
    "content": pa.string(),
}

# Delta event envelope — the engine's analog of the reference's binlog
# JSON envelope {database, table, type, values, before}
# (services/listenservice.py:129-148): last-writer-wins by seq.
EVENT_SCHEMA = {
    "seq": pa.int64(),
    "type": pa.string(),  # INSERT | UPDATE | DELETE
    "repo": pa.string(),
    "path": pa.string(),
    "commit": pa.string(),
    "lang": pa.string(),
    "content": pa.string(),
}


class SchemaMismatch(ValueError):
    """Input does not satisfy the engine's schema contract."""


def _validate(path: str, expected: dict[str, pa.DataType],
              columns: list[str] | None) -> None:
    """Check the Parquet footer schema (metadata-only, no data read)
    for the requested columns.  String-like widenings (large_string,
    string_view) are accepted — Arrow kernels handle them uniformly."""
    schema = pads.dataset(path, format="parquet").schema
    want = columns if columns is not None else list(expected)
    for name in want:
        exp = expected.get(name)
        if exp is None:
            continue
        idx = schema.get_field_index(name)
        if idx < 0:
            raise SchemaMismatch(
                f"{path}: required column {name!r} missing "
                f"(have: {schema.names})")
        got = schema.field(idx).type
        is_view = getattr(pa.types, "is_string_view", lambda _t: False)
        ok = (got == exp
              or (pa.types.is_string(exp)
                  and (pa.types.is_string(got)
                       or pa.types.is_large_string(got)
                       or is_view(got)))
              or (pa.types.is_integer(exp) and pa.types.is_integer(got)))
        if not ok:
            raise SchemaMismatch(
                f"{path}: column {name!r} has type {got}, expected {exp}")


def read_corpus(path: str, columns: list[str] | None = None,
                validate: bool = True, **read_kwargs):
    """Corpus source: parallel pruned Parquet read of the
    (repo, path, commit, lang, content) table.

    Pass ``columns`` to prune at the read (a metadata-only projection
    — only the named columns' pages leave storage).  ``read_kwargs``
    forward to ``ray.data.read_parquet`` (e.g. ``filter=`` for
    row-group predicate pushdown, ``override_num_blocks=``)."""
    import ray.data

    if validate:
        _validate(path, CORPUS_SCHEMA, columns)
    return ray.data.read_parquet(path, columns=columns, **read_kwargs)


def read_delta_events(path: str, validate: bool = True, **read_kwargs):
    """Delta-event source: Parquet event-log directory → Dataset.

    Ordering contract: ``apply_delta`` orders by ``seq`` internally
    (last-writer-wins per (repo, path)), so the read itself needs no
    sort — at scale this stays a plain parallel scan."""
    import ray.data

    if validate:
        _validate(path, EVENT_SCHEMA, None)
    return ray.data.read_parquet(path, **read_kwargs)
