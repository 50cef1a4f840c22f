"""JSONL corpus / delta-event sources and sinks.

The reference's change stream is a stream of JSON binlog envelopes
(services/listenservice.py:129-148, one object per message); this
module is the line-JSON transport analog of the Parquet sources —
same schema contract, same fail-at-the-read validation, row-for-row
interchangeable with the Parquet path.  Parquet stays the at-scale
default (columnar pruning + row-group pushdown happen at the READ;
JSON can only project AFTER parsing every field), so JSONL here is
the ingest/interchange edge: accept line-JSON at the boundary, convert
once, run the pipeline on Parquet.
"""

from __future__ import annotations

import pyarrow as pa

from mee_ray.sources.parquet import (CORPUS_SCHEMA, EVENT_SCHEMA,
                                     SchemaMismatch)

_JSON_EXTS = ["jsonl", "json"]


def _check_schema(schema, expected: dict[str, pa.DataType],
                  columns: list[str] | None, label: str) -> None:
    """Same contract as the Parquet footer check, applied to the
    schema Ray inferred from the first JSON blocks (a ray.data Schema
    — names/types lists, not a pyarrow.Schema)."""
    by_name = dict(zip(schema.names, schema.types))
    want = columns if columns is not None else list(expected)
    for name in want:
        exp = expected.get(name)
        if exp is None:
            continue
        if name not in by_name:
            raise SchemaMismatch(
                f"{label}: required column {name!r} missing "
                f"(have: {schema.names})")
        got = by_name[name]
        # an all-null JSON column (e.g. DELETE envelopes carrying
        # null commit/lang/content) infers Arrow type null — valid
        # content for ANY expected type, exactly like a Parquet
        # column of nulls under a declared type
        ok = (got == exp
              or pa.types.is_null(got)
              or (pa.types.is_string(exp)
                  and (pa.types.is_string(got)
                       or pa.types.is_large_string(got)))
              or (pa.types.is_integer(exp) and pa.types.is_integer(got)))
        if not ok:
            raise SchemaMismatch(
                f"{label}: column {name!r} has type {got}, "
                f"expected {exp}")


def read_corpus_jsonl(path: str, columns: list[str] | None = None,
                      validate: bool = True, **read_kwargs):
    """Corpus source over line-JSON files.  ``columns`` projects
    immediately after the parse (JSON has no columnar pruning — the
    projection bounds what enters the object store, not what leaves
    disk)."""
    import ray.data

    ds = ray.data.read_json(path, file_extensions=_JSON_EXTS,
                            **read_kwargs)
    if validate:
        _check_schema(ds.schema(), CORPUS_SCHEMA, columns, path)
    if columns is not None:
        ds = ds.select_columns(columns)
    return ds


def read_delta_events_jsonl(path: str, validate: bool = True,
                            **read_kwargs):
    """Delta-event source over line-JSON event logs — the direct
    analog of the reference's JSON binlog envelope transport.  Same
    ordering contract as the Parquet reader: ``apply_delta`` orders by
    ``seq`` internally, so the read is a plain parallel scan."""
    import ray.data

    ds = ray.data.read_json(path, file_extensions=_JSON_EXTS,
                            **read_kwargs)
    if validate:
        _check_schema(ds.schema(), EVENT_SCHEMA, None, path)
    return ds


def write_corpus_jsonl(ds, path: str) -> None:
    """Corpus sink: stream the Dataset out as line-JSON (one file per
    block — the resumable-output shape; Ray names files uniquely per
    task)."""
    ds.write_json(path)


def read_corpus_csv(path: str, columns: list[str] | None = None,
                    validate: bool = True, **read_kwargs):
    """Corpus source over CSV files (Arrow CSV reader: quoted fields
    carry embedded commas/newlines, so round-tripping code content is
    lossless).  Column types are FORCED to the corpus contract rather
    than inferred — a corpus whose content values all look numeric
    must still read as strings — and unquoted empty fields read as
    NULL (strings_can_be_null) so the sink's null cells round-trip as
    nulls, not ''.  Same projection caveat as the JSONL reader."""
    from pyarrow import csv as pacsv

    import ray.data

    read_kwargs.setdefault("convert_options", pacsv.ConvertOptions(
        column_types=dict(CORPUS_SCHEMA), strings_can_be_null=True))
    ds = ray.data.read_csv(path, **read_kwargs)
    if validate:
        _check_schema(ds.schema(), CORPUS_SCHEMA, columns, path)
    if columns is not None:
        ds = ds.select_columns(columns)
    return ds


def write_corpus_csv(ds, path: str) -> None:
    """Corpus sink: one CSV file per block (Arrow writer quotes
    embedded delimiters/newlines)."""
    ds.write_csv(path)
