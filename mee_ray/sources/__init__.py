"""Sources: validated readers for the engine's two inputs.

The reference's sources are a MySQL keyset-paginated full scan
(S5, commonhandler.py:388-418 — one row per round-trip) and a
Kafka binlog event stream (S1/S4, listenservice.py:107-115,
basecosumerservice.py:24-53).  Here both become pruned, parallel
Parquet reads:

* :func:`read_corpus` — the full-rebuild source: whole-table scan in
  parallel blocks, with schema validation against the engine's input
  contract (repo, path, commit, lang, content) so a bad input fails at
  the read, not mid-shuffle (the analog of the reference's eager
  config validation, handlerconfig.py:181-204).
* :func:`read_delta_events` — the incremental source: ordered delta
  event batches (seq, type, repo, path, commit, lang, content) read
  from an event-log directory; per-file sequence ordering replaces
  Kafka partition offsets (SURVEY.md §2.9).
"""

from mee_ray.sources.parquet import (  # noqa: F401
    CORPUS_SCHEMA,
    EVENT_SCHEMA,
    SchemaMismatch,
    read_corpus,
    read_delta_events,
)
from mee_ray.sources.jsonl import (  # noqa: F401
    read_corpus_csv,
    read_corpus_jsonl,
    read_delta_events_jsonl,
    write_corpus_csv,
    write_corpus_jsonl,
)
