"""Code-aware tokenizer.

The pluggable UDF surface of the engine (the analog of the reference's
scalar-function DSL + ``db_field`` mapping layer, reference
modules/handlers/common.py:32-127) — pure module, no Ray imports, so it
unit-tests table-driven like the reference's regex tests
(modules/handlers/v1/test/test_exp_re.py).

Semantics (BASELINE.json north_star):
- raw tokens: maximal runs matching ``[A-Za-z_][A-Za-z0-9_]* | [0-9]+``
- identifier splitting: ``_`` boundaries plus camelCase transitions
  (``parseHTTPResponse`` → ``parse http response``; ``v2Parser`` →
  ``v2 parser`` — digits glue to the preceding lowercase run)
- the full identifier is also emitted lowercased (configurable)
- optional sub-token n-grams joined by a single space (a character that
  can never occur inside a token, so n-grams never collide with tokens)

Everything is deterministic; term frequencies are exact counts.
"""

from __future__ import annotations

import re
from collections import Counter

from mee_ray.config import TokenizerConfig

# Maximal identifier-or-number runs.
TOKEN_RE = re.compile(r"[A-Za-z_][A-Za-z0-9_]*|[0-9]+")

# Simple mode: exactly regexp_extract_all(lower(text), '[a-z0-9_]+'),
# so DuckDB oracle SQL can reproduce it verbatim.  NOTE the boundary
# semantics deliberately differ from TOKEN_RE: a digit run directly
# followed by letters is ONE token here ('2fast') but TWO under
# TOKEN_RE ('2', 'fast') — so this fast path applies only when BOTH
# split_identifiers=False AND lowercase=True; flipping either flag
# re-tokenizes under TOKEN_RE and the two configs' indexes are not
# df/position-comparable for digit-prefixed tokens.
SIMPLE_RE = re.compile(r"[a-z0-9_]+")

# Sub-token split of one identifier:
#   HTTPResponse -> HTTP Response ; parseHTTP -> parse HTTP ;
#   camelCase -> camel Case ; v2x -> v2x ; ABCdef -> AB Cdef
CAMEL_RE = re.compile(r"[A-Z]+(?![a-z])|[A-Z][a-z0-9]*|[a-z][a-z0-9]*|[0-9]+")


class Tokenizer:
    """Stateful tokenizer meant to live inside a map_batches actor:
    compiled regexes plus a token→sub-token memo cache (term
    distributions are heavy-tailed, so the cache hit rate is very
    high — this is the engine's analog of the reference's per-handler
    script cache, commonhandler.py:593-628)."""

    def __init__(self, cfg: TokenizerConfig | None = None):
        self.cfg = cfg or TokenizerConfig()
        self._memo: dict[str, tuple[str, ...]] = {}
        self._run_memo: dict[str, tuple[str, ...]] = {}
        # bound the memos so adversarial corpora can't OOM an actor
        self._memo_cap = 1 << 20

    def _expand(self, raw: str) -> tuple[str, ...]:
        """All terms emitted for one raw token."""
        cfg = self.cfg
        memo = self._memo
        hit = memo.get(raw)
        if hit is not None:
            return hit

        out: list[str] = []
        low = raw.lower() if cfg.lowercase else raw
        if cfg.split_identifiers:
            subs = CAMEL_RE.findall(raw)
            if cfg.lowercase:
                subs = [s.lower() for s in subs]
            if len(subs) == 0:
                out.append(low)
            elif len(subs) == 1:
                # "__init__" → "init" (plus the full form so exact
                # lookups still hit); "foo" → just "foo"
                out.append(subs[0])
                if cfg.emit_full_token and low != subs[0]:
                    out.append(low)
            else:
                if cfg.emit_full_token:
                    out.append(low)
                out.extend(subs)
                n = cfg.subtoken_ngram
                if n >= 2 and len(subs) >= n:
                    for i in range(len(subs) - n + 1):
                        out.append(" ".join(subs[i:i + n]))
        else:
            out.append(low)

        maxlen = cfg.max_token_len
        result = tuple(t for t in out if 0 < len(t) <= maxlen)
        if len(memo) < self._memo_cap:
            memo[raw] = result
        return result

    def terms(self, text: str) -> list[str]:
        """Flat term sequence (with repetitions) for one document."""
        cfg = self.cfg
        if not cfg.split_identifiers and cfg.lowercase:
            # SQL-reproducible fast path (see SIMPLE_RE)
            maxlen = cfg.max_token_len
            return [t for t in SIMPLE_RE.findall(text.lower()) if len(t) <= maxlen]
        expand = self._expand
        out: list[str] = []
        for raw in TOKEN_RE.findall(text):
            out.extend(expand(raw))
        return out

    def counts(self, text: str) -> Counter:
        """term → tf for one document."""
        return Counter(self.terms(text))

    def counts_and_positions(self, text: str
                             ) -> tuple[Counter, dict[str, list[int]]]:
        """(term → tf, term → sorted positions) for one document.
        Position = index in the emitted term stream (:meth:`terms`
        order) — in ``simple`` mode that is exactly the regex token
        sequence, which is what makes phrase adjacency reproducible in
        SQL (two terms are adjacent iff only non-token characters
        separate them in the raw text)."""
        seq = self.terms(text)
        counts: Counter = Counter(seq)
        poss: dict[str, list[int]] = {}
        for i, t in enumerate(seq):
            poss.setdefault(t, []).append(i)
        return counts, poss

    def doc_length(self, text: str) -> int:
        """Total number of emitted terms (the BM25 ``dl``)."""
        return len(self.terms(text))

    # -------------------------------------------- vectorized batch --

    def _terms_of_run(self, run: str) -> tuple[str, ...]:
        """All terms emitted for one maximal word-character run.
        A run splits under TOKEN_RE into at most a leading digit run
        plus one identifier (e.g. '2fast' → '2', 'fast'); each raw
        token then expands through the memoized _expand.  Memoized per
        UNIQUE run — term distributions are heavy-tailed, so the batch
        path touches Python once per distinct run, not once per
        occurrence."""
        memo = self._run_memo
        hit = memo.get(run)
        if hit is not None:
            return hit
        if not self.cfg.split_identifiers and self.cfg.lowercase:
            maxlen = self.cfg.max_token_len
            out = (run,) if 0 < len(run) <= maxlen else ()
        else:
            out = tuple(t for raw in TOKEN_RE.findall(run)
                        for t in self._expand(raw))
        if len(memo) < self._memo_cap:
            memo[run] = out
        return out

    def terms_batch(self, contents):
        """Vectorized :meth:`terms` over a batch text column.

        ``contents``: pa.Array/ChunkedArray of strings (nulls → "").
        Returns ``(didx, tids, tdict)``: int64 doc index per emitted
        term (document-major, term-stream order), int64 id per term
        into ``tdict``, and the np object array of distinct term
        strings.  Per-occurrence work is Arrow/numpy only: one
        split_pattern_regex + dictionary_encode per batch, a Python
        call per UNIQUE run (memoized across batches), and a gather
        to expand the run stream into the term stream.  Bit-parity
        with the scalar path is asserted in test_tokenizer.py."""
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        col = pc.fill_null(contents, "")
        if not self.cfg.split_identifiers and self.cfg.lowercase:
            # Python str.lower maps U+0130 'İ' to TWO codepoints
            # (i + combining dot) — the one multi-codepoint lower
            # mapping — while utf8_lower emits a single 'i'.  Align
            # before lowering so token boundaries match the scalar
            # path exactly.
            col = pc.replace_substring(col, "\u0130", "i\u0307")
            col = pc.utf8_lower(col)
        lists = pc.split_pattern_regex(col, "[^A-Za-z0-9_]+")
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        rlens = pc.list_value_length(lists).to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(lists)
        n_docs = len(rlens)
        didx_runs = np.repeat(np.arange(n_docs, dtype=np.int64), rlens)
        if len(flat) == 0:
            z = np.zeros(0, dtype=np.int64)
            return z, z, np.empty(0, dtype=object)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        d = pc.dictionary_encode(flat)
        inv = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        uniq = d.dictionary.to_numpy(zero_copy_only=False)

        exp = [self._terms_of_run(u) for u in uniq]
        exp_lens = np.fromiter((len(e) for e in exp), np.int64,
                               len(exp))
        all_terms = [t for e in exp for t in e]
        if not all_terms:
            z = np.zeros(0, dtype=np.int64)
            return z, z, np.empty(0, dtype=object)
        import pandas as pd
        tinv, tdict = pd.factorize(np.array(all_terms, dtype=object))
        exp_off = np.cumsum(exp_lens) - exp_lens
        cnts = exp_lens[inv]
        total = int(cnts.sum())
        loc = np.arange(total, dtype=np.int64)             - np.repeat(np.cumsum(cnts) - cnts, cnts)
        src = np.repeat(exp_off[inv], cnts) + loc
        tids = tinv[src].astype(np.int64)
        didx = np.repeat(didx_runs, cnts)
        return didx, tids, tdict
