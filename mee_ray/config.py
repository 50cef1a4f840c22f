"""Engine configuration.

The reference drives everything from YAML handler configs + an INI app
config (reference modules/handlers/handlerconfig.py:33-118,
application/config.py:14-56).  The new engine needs far less runtime
configurability — the analog is a small frozen dataclass tree covering
the tokenizer, sharding/salting, BM25 parameters and scale knobs.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class TokenizerConfig:
    """Code-aware tokenizer settings.

    ``split_identifiers`` turns ``parseHTTPResponse`` /
    ``snake_case_name`` into sub-tokens (and keeps the full lowered
    token when ``emit_full_token``).  ``subtoken_ngram=n`` additionally
    emits n-grams over an identifier's sub-tokens joined by a space
    (space cannot occur inside a token, so the n-gram vocabulary is
    collision-free with single tokens).

    ``simple`` mode (``split_identifiers=False, emit_full_token=True,
    subtoken_ngram=0``) matches the SQL-expressible tokenizer
    ``regexp_extract_all(lower(text), '[a-z0-9_]+')`` used by the
    DuckDB oracles.
    """

    split_identifiers: bool = True
    emit_full_token: bool = True
    subtoken_ngram: int = 0
    lowercase: bool = True
    max_token_len: int = 64

    @staticmethod
    def simple() -> "TokenizerConfig":
        return TokenizerConfig(split_identifiers=False, emit_full_token=True,
                               subtoken_ngram=0)


@dataclass(frozen=True)
class BM25Params:
    """One formula, shared by the distributed engine and the oracle so
    rank-identity tests exercise the distributed machinery, not formula
    agreement (SURVEY.md §7.2 step 4)."""

    k1: float = 1.2
    b: float = 0.75


# Static hot-term stop-list for salting (SURVEY.md §7.2 step 5): the
# Zipf head of source-code token distributions.  Terms here get their
# posting lists split into ``salt_factor`` doc_id-range sub-lists at
# build time; because salt = top bits of doc_id, sub-lists concatenate
# back into globally doc_id-sorted order with zero merge cost.
DEFAULT_HOT_TERMS = frozenset({
    "def", "import", "return", "self", "class", "if", "else", "elif",
    "for", "while", "in", "not", "and", "or", "none", "true", "false",
    "public", "private", "static", "void", "int", "string", "new",
    "func", "var", "const", "let", "function", "package", "type",
    "struct", "interface", "nil", "err", "error", "range", "print",
    "the", "a", "to", "of", "is", "this", "that",
})


@dataclass(frozen=True)
class EngineConfig:
    tokenizer: TokenizerConfig = field(default_factory=TokenizerConfig)
    bm25: BM25Params = field(default_factory=BM25Params)

    # --- sharding / shuffle (SURVEY.md §7.4) ---
    # Terms are routed to `num_shards` logical shards by a stable hash;
    # the build shuffle uses `parts_per_shard` partitions per shard so
    # one groupby group == one output segment file and no single group
    # must hold a whole shard.  At 100 TB raise parts_per_shard so a
    # partition's token slice fits a worker's heap (each partition is
    # materialized in one encode task).
    num_shards: int = 8
    parts_per_shard: int = 4

    # --- skew / salting ---
    hot_terms: frozenset = DEFAULT_HOT_TERMS
    salt_factor: int = 8            # power of two; sub-lists per hot term
    # terms whose in-partition df exceeds this also get salted on the
    # fly (dynamic skew defense in addition to the static list)
    hot_df_threshold: int = 1 << 20

    # --- posting-list encoding ---
    block_size: int = 128           # docs per skip/max-impact block

    # --- batching ---
    tokenize_batch_size: int = 256  # docs per tokenize batch (multi-KB rows)
    tokenize_concurrency: int | None = None  # None → stateless tasks sizing by Ray

    # --- stats/audit ---
    # "driver": stream (doc_id, length) to the driver, np.unique audit
    #           (no shuffle; fine to ~10^9 docs).
    # "shuffle": exact audit via groupby(doc_id) — the 10^12-doc path.
    stats_mode: str = "driver"

    def shard_of_part(self, part: int) -> int:
        return part % self.num_shards

    @property
    def num_parts(self) -> int:
        return self.num_shards * self.parts_per_shard
