"""Text-analysis + dedup pipelines over the ``documents`` table —
the training-data-pipeline operator family (language-ID, quality
scoring, token counting, fingerprinting, exact/MinHash/SimHash/n-gram
dedup).  SQL-expressible ops carry DuckDB oracles with identical
expression semantics; sketch-based ops are rows-only (non-SQL) by
nature and are verified by dedicated pytest oracles instead.

All regex patterns are written once here and embedded verbatim in the
SQL so Python `re` and DuckDB RE2 see the same pattern.
"""

from __future__ import annotations

import hashlib
import itertools

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from mee_ray.pipelines.gramhash import i32_offsets

TOKEN_PATTERN = "[a-z0-9_]+"
STOP_PATTERNS = {
    "en": r"\b(the|a|of|and|is)\b",
    "de": r"\b(der|die|das|und|ist)\b",
    "fr": r"\b(le|la|les|et|est)\b",
    "es": r"\b(el|los|las|y|es)\b",
}


# All-pairs cap for LSH/simhash bucket groups: past this size a bucket
# is degenerate (identical signatures from empty/boilerplate docs) and
# pair emission switches to a star on the smallest id — O(N) edges
# that preserve the connected component a dedup clustering consumes,
# instead of O(N²) in one task.
_MAX_ALLPAIRS_GROUP = 1024


def _read_docs(sf_dir: str, columns=None):
    import ray.data
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


class TextStats:
    """Per-task stateful stage: compiled regexes once per instance
    (ST-style state, reference commonhandler.py:593-628).  Shipped as
    an INSTANCE to stateless tasks — regex compile is ~us, so tasks
    beat an actor pool's multi-second ramp-up; switch to
    map_batches(Cls, concurrency=N) if the state ever grows heavy
    (model weights, BPE merges)."""

    def __init__(self):
        import re
        self.tok = re.compile(TOKEN_PATTERN)
        self.stops = {k: re.compile(v) for k, v in STOP_PATTERNS.items()}

    def tokens(self, text: str) -> list[str]:
        return self.tok.findall(text.lower())


# -------------------------------------------------- token counting --

def doc_token_counts(sf_dir: str):
    def stage(t: pa.Table) -> pa.Table:
        # vectorized count: one Arrow tokenize chain, no per-row regex
        from mee_ray.pipelines.gramhash import tokenize_flat
        _, _, lens = tokenize_flat(t["text"], mode="regex")
        return pa.table({"doc_id": t["doc_id"],
                         "n_tokens": pa.array(lens, pa.int64())})

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        stage, batch_format="pyarrow", zero_copy_batch=True)


TOKEN_COUNTS_SQL = f"""
SELECT doc_id, len(regexp_extract_all(lower(text), '{TOKEN_PATTERN}')) AS n_tokens
FROM documents
"""


# ------------------------------------------------ term df (tokenize) --

class DfPartialStage(TextStats):
    """Per-batch partial document frequency: one row per term with the
    count of batch docs containing it (terms deduped per doc).  The
    core tokenize-and-count stage, shared by doc_term_df and the
    significant_text foreground pass."""

    def __call__(self, t: pa.Table) -> pa.Table:
        # vectorized: Arrow tokenize + dictionary factorize, per-doc
        # distinct via one pair sort, df via bincount over term ids —
        # no per-row Counter, no Python per token
        from mee_ray.pipelines.gramhash import tokenize_flat
        flat, didx, _ = tokenize_flat(t["text"], mode="regex")
        if len(flat) == 0:
            return pa.table({"term": pa.array([], pa.string()),
                             "df_part": pa.array([], pa.int64())})
        d = pc.dictionary_encode(flat.combine_chunks()
                                 if isinstance(flat, pa.ChunkedArray)
                                 else flat)
        tid = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((tid, didx))
        d2, t2 = didx[order], tid[order]
        keep = np.ones(len(d2), dtype=bool)
        keep[1:] = (d2[1:] != d2[:-1]) | (t2[1:] != t2[:-1])
        df = np.bincount(t2[keep], minlength=len(d.dictionary))
        # sorted term order (the legacy contract)
        uniq = d.dictionary.to_numpy(zero_copy_only=False)
        srt = np.argsort(uniq, kind="stable")
        return pa.table({"term": pa.array(uniq[srt], pa.string()),
                         "df_part": pa.array(df[srt].astype(np.int64),
                                             pa.int64())})


def _df_over(ds, alias: str):
    """tokenize → groupby(term) df over a Dataset with a text column."""
    from ray.data.aggregate import Sum
    return (ds.map_batches(DfPartialStage(), batch_format="pyarrow")
            .groupby("term").aggregate(Sum("df_part", alias_name=alias)))


def doc_term_df(sf_dir: str):
    """The tokenize → groupby(term) df aggregation — the core of the
    index build, checked against a pure-SQL unnest oracle."""
    return _df_over(_read_docs(sf_dir, ["text"]), "df")


TERM_DF_SQL = f"""
SELECT term, count(DISTINCT doc_id) AS df
FROM (SELECT doc_id,
             unnest(regexp_extract_all(lower(text), '{TOKEN_PATTERN}')) AS term
      FROM documents)
GROUP BY term
"""


# ---------------------------------------------------- fingerprints --

def doc_fingerprint(sf_dir: str):
    """M11/identity analog: stable per-doc content fingerprint."""
    def f(t: pa.Table) -> pa.Table:
        fp = [hashlib.md5(x.encode()).hexdigest() for x in t["text"].to_pylist()]
        return pa.table({"doc_id": t["doc_id"], "fp": pa.array(fp, pa.string())})

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow", zero_copy_batch=True)


FINGERPRINT_SQL = "SELECT doc_id, md5(text) AS fp FROM documents"


def dedup_exact(sf_dir: str):
    """Exact dedup: hash → group → keep min doc_id (the guide's
    canonical pattern; upsert-dedup analog of commonhandler.py:68-83)."""
    from ray.data.aggregate import Count, Min

    def f(t: pa.Table) -> pa.Table:
        fp = [hashlib.md5(x.encode()).hexdigest() for x in t["text"].to_pylist()]
        return pa.table({"fp": pa.array(fp, pa.string()), "doc_id": t["doc_id"]})

    return (_read_docs(sf_dir, ["doc_id", "text"])
            .map_batches(f, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("fp")
            .aggregate(Min("doc_id", alias_name="keep_id"),
                       Count(alias_name="n_copies")))


DEDUP_EXACT_SQL = """
SELECT md5(text) AS fp, min(doc_id) AS keep_id, count(*) AS n_copies
FROM documents GROUP BY fp
"""


# -------------------------------------------------- quality scores --

def doc_quality_scores(sf_dir: str):
    """Quality scoring: token counts, type-token ratio, average token
    length — per-row float division (bit-deterministic vs SQL)."""
    class Stage(TextStats):
        def __call__(self, t: pa.Table) -> pa.Table:
            # vectorized: one Arrow tokenize, codepoint lengths via
            # utf8_length, distinct-per-doc via one pair sort
            from mee_ray.pipelines.gramhash import tokenize_flat
            flat, didx, lens = tokenize_flat(t["text"], mode="regex")
            n = len(t)
            n_tok = lens.astype(np.int64)
            wl = pc.utf8_length(flat).to_numpy(zero_copy_only=False) \
                if len(flat) else np.zeros(0, np.int64)
            tot_len = np.bincount(didx, weights=wl, minlength=n) \
                .astype(np.int64)
            if len(flat):
                d = pc.dictionary_encode(
                    flat.combine_chunks()
                    if isinstance(flat, pa.ChunkedArray) else flat)
                tid = d.indices.to_numpy(zero_copy_only=False) \
                    .astype(np.int64)
                order = np.lexsort((tid, didx))
                d2, t2 = didx[order], tid[order]
                keep = np.ones(len(d2), dtype=bool)
                keep[1:] = (d2[1:] != d2[:-1]) | (t2[1:] != t2[:-1])
                n_uniq = np.bincount(d2[keep], minlength=n) \
                    .astype(np.int64)
            else:
                n_uniq = np.zeros(n, dtype=np.int64)
            with np.errstate(divide="ignore", invalid="ignore"):
                ttr = np.where(n_tok > 0, n_uniq / n_tok, 0.0)
                avg_len = np.where(n_tok > 0, tot_len / n_tok, 0.0)
            return pa.table({"doc_id": t["doc_id"],
                             "n_tokens": pa.array(n_tok),
                             "n_uniq": pa.array(n_uniq),
                             "ttr": pa.array(ttr, pa.float64()),
                             "avg_tok_len": pa.array(avg_len, pa.float64())})

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        Stage(), batch_format="pyarrow")


QUALITY_SQL = f"""
SELECT doc_id,
       len(toks) AS n_tokens,
       len(list_distinct(toks)) AS n_uniq,
       CASE WHEN len(toks) > 0
            THEN len(list_distinct(toks)) / CAST(len(toks) AS DOUBLE)
            ELSE 0.0 END AS ttr,
       CASE WHEN len(toks) > 0
            THEN list_sum(list_transform(toks, x -> length(x))) / CAST(len(toks) AS DOUBLE)
            ELSE 0.0 END AS avg_tok_len
FROM (SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_PATTERN}') AS toks
      FROM documents)
"""


# ------------------------------------------------------- language ID --

class LangIdStage(TextStats):
    """Stopword language-ID stage (module-level so the scalar/
    vectorized parity AND divergence tests can instantiate it —
    ADVICE r4 #3)."""

    def __call__(self, t: pa.Table) -> pa.Table:
        # vectorized: one count_substring_regex kernel per language
        # (non-overlapping match count == len(findall)); precedence
        # resolved with argmax over the fixed column order.  NOTE
        # \b: RE2 word boundaries are ASCII, Python's unicode — on
        # this corpus (ascii stopwords, parity asserted in
        # test_pipelines.py) the counts are identical.
        low = pc.utf8_lower(pc.fill_null(t["text"], ""))
        mat = np.stack([
            pc.count_substring_regex(low, STOP_PATTERNS[k])
            .to_numpy(zero_copy_only=False)
            for k in ("en", "de", "fr", "es")]).astype(np.int64)
        mx = mat.max(axis=0)
        pick = np.argmax(mat, axis=0)        # first max wins
        names = np.array(["en", "de", "fr", "es"], dtype=object)
        guesses = np.where(mx == 0, "und", names[pick])
        return pa.table({"doc_id": t["doc_id"],
                         "lang_guess": pa.array(guesses, pa.string()),
                         "n_stopwords": pa.array(
                             mat.sum(axis=0), pa.int64())})

    def scalar_call(self, t: pa.Table) -> pa.Table:
        """Python-re reference (ASCII-corpus parity only): \\b is
        unicode-aware here but ASCII in RE2 — the VECTORIZED path
        is authoritative because it shares RE2 semantics with the
        DuckDB oracle (review finding r4#2: on accented text like
        'thé' the two \\b dialects genuinely differ, and the
        engine sides with its oracle)."""
        guesses, totals = [], []
        for x in t["text"].to_pylist():
            low = (x or "").lower()
            counts = {k: len(rx.findall(low)) for k, rx in self.stops.items()}
            mx = max(counts.values()) if counts else 0
            if mx == 0:
                g = "und"
            else:
                for k in ("en", "de", "fr", "es"):  # fixed precedence
                    if counts[k] == mx:
                        g = k
                        break
            guesses.append(g)
            totals.append(sum(counts.values()))
        return pa.table({"doc_id": t["doc_id"],
                         "lang_guess": pa.array(guesses, pa.string()),
                         "n_stopwords": pa.array(totals, pa.int64())})


def lang_id_documents(sf_dir: str):
    """n-gram/stopword language-ID heuristic with a fixed precedence
    (en > de > fr > es > und), replicated exactly in SQL."""
    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        LangIdStage(), batch_format="pyarrow")


LANG_ID_SQL = f"""
WITH c AS (
  SELECT doc_id,
         len(regexp_extract_all(lower(text), '{STOP_PATTERNS["en"]}')) AS c_en,
         len(regexp_extract_all(lower(text), '{STOP_PATTERNS["de"]}')) AS c_de,
         len(regexp_extract_all(lower(text), '{STOP_PATTERNS["fr"]}')) AS c_fr,
         len(regexp_extract_all(lower(text), '{STOP_PATTERNS["es"]}')) AS c_es
  FROM documents)
SELECT doc_id,
       CASE WHEN greatest(c_en, c_de, c_fr, c_es) = 0 THEN 'und'
            WHEN c_en = greatest(c_en, c_de, c_fr, c_es) THEN 'en'
            WHEN c_de = greatest(c_en, c_de, c_fr, c_es) THEN 'de'
            WHEN c_fr = greatest(c_en, c_de, c_fr, c_es) THEN 'fr'
            ELSE 'es' END AS lang_guess,
       c_en + c_de + c_fr + c_es AS n_stopwords
FROM c
"""


# ----------------------------------------------- sketch-based dedup --
# (rows-only: not SQL-expressible; verified by pytest oracles)

# Mersenne prime 2^31-1: products of two <p values fit in int64, so
# the (a*x+b) mod p sketch stays fully vectorized in int64.
_MERSENNE = (1 << 31) - 1


def _minhash_params(n_hashes: int, seed: int = 42):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=n_hashes, dtype=np.int64)
    b = rng.integers(0, _MERSENNE, size=n_hashes, dtype=np.int64)
    return a, b


def _shingles(tokens: list[str], k: int = 3) -> set[int]:
    """Per-doc token-k-shingle hash set — the scalar reference form of
    :func:`_shingles_batch` (same gramhash kernel, so a doc's set is
    identical whether computed alone or inside a batch).  Docs shorter
    than ``k`` tokens contribute one whole-doc shingle."""
    from mee_ray.pipelines.gramhash import gram_hash64, token_hash64
    if not tokens:
        return set()
    th = token_hash64(pa.array(tokens, pa.string()))
    n = min(k, len(tokens))
    _, _, g = gram_hash64(th, np.array([len(tokens)], np.int64), n)
    return set(g.tolist())


def _shingles_batch(col, k: int = 3):
    """Vectorized :func:`_shingles` over a batch's text column.

    Returns ``(didx, g)``: int64 doc index + shingle hash, deduped per
    doc — the flat form every consumer (segmented minhash, list-array
    build) wants.  One Arrow tokenize + one SipHash pass per unique
    token + one FNV window fold; the short-doc rule (< k tokens → one
    whole-doc shingle) runs one extra fold per distinct short length
    (≤ k−1 of them)."""
    from mee_ray.pipelines.gramhash import (_FNV, _SIGN_MASK,
                                            gram_hash64, token_hash64,
                                            tokenize_flat)
    flat, _, lens = tokenize_flat(col, mode="regex")
    th = token_hash64(flat)
    didx, _, g = gram_hash64(th, lens, k)
    doc_start = np.cumsum(lens) - lens
    parts_d, parts_g = [didx], [g]
    for L in range(1, k):
        sel = np.flatnonzero(lens == L)
        if not len(sel):
            continue
        starts = doc_start[sel]
        acc = th[starts].copy()
        for j in range(1, L):
            acc = acc * _FNV ^ th[starts + j]
        parts_d.append(sel)
        parts_g.append((acc & _SIGN_MASK).astype(np.int64))
    d = np.concatenate(parts_d)
    gg = np.concatenate(parts_g)
    if len(d):
        order = np.lexsort((gg, d))
        d, gg = d[order], gg[order]
        keep = np.ones(len(d), dtype=bool)
        keep[1:] = (d[1:] != d[:-1]) | (gg[1:] != gg[:-1])
        d, gg = d[keep], gg[keep]
    return d, gg


def _shingle_lists(col, k: int = 3) -> pa.ListArray:
    """``_shingles_batch`` packed as a list<int64> array, one list per
    input row (empty list for shingle-free docs)."""
    d, g = _shingles_batch(col, k)
    counts = np.bincount(d, minlength=len(col)).astype(np.int32)
    offsets = i32_offsets(np.concatenate([[0], np.cumsum(counts)]))
    return pa.ListArray.from_arrays(pa.array(offsets, pa.int32()),
                                    pa.array(g, pa.int64()))


class MinHashStage(TextStats):
    """shingle → minhash → banded LSH keys, one signature row per doc
    (the sketch is mergeable; bands become the LSH groupby key)."""

    N_HASHES = 64
    N_BANDS = 16  # 4 rows per band

    def __init__(self):
        super().__init__()
        self.a, self.b = _minhash_params(self.N_HASHES)

    def signature(self, text: str) -> np.ndarray:
        sh = _shingles(self.tokens(text))
        if not sh:
            return np.full(self.N_HASHES, _MERSENNE, dtype=np.int64)
        x = np.array(sorted(sh), dtype=np.int64) % _MERSENNE
        # (a*x + b) mod p, vectorized over hashes × shingles (int64-safe)
        v = (self.a[:, None] * x[None, :] + self.b[:, None]) % _MERSENNE
        return v.min(axis=1)

    def signatures_batch(self, col) -> np.ndarray:
        """(n_docs, N_HASHES) minhash matrix for a text column —
        segmented minimum per permutation over the batch's flat
        deduped shingle stream; shingle-free docs get the sentinel
        row (all _MERSENNE), matching :meth:`signature`."""
        d, g = _shingles_batch(col)
        n = len(col)
        sig = np.full((n, self.N_HASHES), _MERSENNE, dtype=np.int64)
        if len(d):
            x = g % _MERSENNE
            starts = np.flatnonzero(np.r_[True, d[1:] != d[:-1]])
            docs_present = d[starts]
            for i in range(self.N_HASHES):
                v = (self.a[i] * x + self.b[i]) % _MERSENNE
                sig[docs_present, i] = np.minimum.reduceat(v, starts)
        return sig

    def __call__(self, t: pa.Table) -> pa.Table:
        # fully vectorized: kernel shingles → segmented minhash → an
        # FNV fold per band (the band key only needs to be a
        # deterministic function of the band's signature slice; the
        # legacy path used interpreter-salted hash(tuple), which this
        # replaces with a cross-process-stable fold).
        from mee_ray.pipelines.gramhash import _FNV, _SIGN_MASK
        rows_per_band = self.N_HASHES // self.N_BANDS
        sig = self.signatures_batch(t["text"]).astype(np.uint64)
        n = len(t)
        bands3 = sig.reshape(n, self.N_BANDS, rows_per_band)
        acc = bands3[:, :, 0].copy()
        for j in range(1, rows_per_band):
            acc = acc * _FNV ^ bands3[:, :, j]
        keys = (acc & _SIGN_MASK).astype(np.int64)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table({"doc_id": pa.array(np.repeat(ids, self.N_BANDS),
                                            pa.int64()),
                         "band": pa.array(
                             np.tile(np.arange(self.N_BANDS,
                                               dtype=np.int32), n)),
                         "band_key": pa.array(keys.reshape(-1),
                                              pa.int64())})


def _empty_lists(n: int) -> pa.ListArray:
    return pa.ListArray.from_arrays(
        np.zeros(n + 1, dtype=np.int32), pa.array([], pa.int64()))


def _list_lengths(col: pa.ListArray) -> np.ndarray:
    off = col.offsets.to_numpy(zero_copy_only=False)
    return np.diff(off)


def minhash_lsh_candidates(sf_dir: str, jaccard_threshold: float = 0.2):
    """MinHash-LSH near-dup: shingle→minhash→band → groupby(band,key)
    → candidate pairs → exact-Jaccard verify, fully distributed in
    THREE shuffles total (band groupby + two bucketed groupbys).

    The verify never touches the driver.  Each candidate pair emits one
    half-row per endpoint bucketed by mix64(endpoint); doc rows bucket
    by mix64(doc_id), so a half-row meets its endpoint's text in one
    group (the semi-join is implicit — only docs a half references are
    shingled), pairs dedupe there, and each half forwards with its
    shingle set bucketed by the pair hash.  The final groupby aligns
    the two halves of every pair and computes exact Jaccard vectorized
    (lexsort + segmented duplicate count).  Everything crossing an
    exchange is bounded by the LSH candidate volume: the (doc_id,
    text) attach shuffle is pruned to ~candidate volume by a Bloom
    filter over the candidate endpoints (fixed-size bit array, OR of
    per-batch partials, ray.put-broadcast once; false positives just
    ship some extra text, false negatives are impossible).  A 100-TB
    run sizes BLOOM_BITS to its candidate estimate."""
    import itertools

    import ray

    from mee_ray.pipelines.cluster import _mix64, _N_BUCKETS

    docs = _read_docs(sf_dir, ["doc_id", "text"])
    sig = docs.map_batches(MinHashStage(), batch_format="pyarrow")

    def pairs_of_group(g: pa.Table) -> pa.Table:
        ids = sorted(set(g["doc_id"].to_pylist()))
        if len(ids) > _MAX_ALLPAIRS_GROUP:
            # degenerate bucket (empty/boilerplate docs share one
            # signature): all-pairs is O(N²) in ONE task.  Emit a STAR
            # to the smallest id instead — O(N) edges that keep every
            # member connected to the component, which is what a dedup
            # clustering consumes; pairwise scores inside a degenerate
            # bucket are near-identical by construction.
            a = [ids[0]] * (len(ids) - 1)
            return pa.table({"a": pa.array(a, pa.int64()),
                             "b": pa.array(ids[1:], pa.int64())})
        a, b = [], []
        for x, y in itertools.combinations(ids, 2):
            a.append(x); b.append(y)
        return pa.table({"a": pa.array(a, pa.int64()), "b": pa.array(b, pa.int64())})

    cand = sig.groupby(["band", "band_key"]).map_groups(
        pairs_of_group, batch_format="pyarrow").materialize()

    # Bloom filter over candidate endpoints, broadcast once: tag_docs
    # ships text ONLY for docs that can appear in some pair
    ends = cand.map_batches(
        lambda t: pa.table({"doc_id": pa.array(np.concatenate(
            [t["a"].to_numpy(zero_copy_only=False),
             t["b"].to_numpy(zero_copy_only=False)]), pa.int64())}),
        batch_format="pyarrow")
    bits_ref = ray.put(bloom_build(ends))

    # Fused attach (shuffle 2 of 3): each pair emits one HALF-ROW per
    # endpoint, bucketed by mix64(endpoint); doc rows bucket by
    # mix64(doc_id), so a half-row meets its endpoint's text in one
    # group, where the probe dedupes band-duplicate pairs, shingles
    # ONLY referenced docs (the semi-join is implicit), and forwards
    # each half with its shingle set bucketed by the pair hash.

    def tag_docs(t: pa.Table) -> pa.Table:
        import ray as _ray
        bits = _ray.get(bits_ref)          # zero-copy plasma read
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        maybe = bits[_bloom_positions(ids.astype(np.uint64))].all(axis=1)
        t = t.filter(pa.array(maybe))
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        bk = (_mix64(ids) % np.uint64(_N_BUCKETS)).astype(np.int32)
        return pa.table({"bucket": pa.array(bk),
                         "a": pa.array(ids, pa.int64()),
                         "b": pa.array(np.full(len(ids), -1), pa.int64()),
                         "text": t["text"],
                         "side": pa.array(np.full(len(ids), 2, np.int8))})

    def tag_pair_halves(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        n = len(a)
        key = np.concatenate([a, b])
        bk = (_mix64(key) % np.uint64(_N_BUCKETS)).astype(np.int32)
        aa = np.concatenate([a, a])
        bb = np.concatenate([b, b])
        side = np.concatenate([np.zeros(n, np.int8), np.ones(n, np.int8)])
        return pa.table({"bucket": pa.array(bk),
                         "a": pa.array(aa, pa.int64()),
                         "b": pa.array(bb, pa.int64()),
                         "text": pa.array([""] * (2 * n), pa.string()),
                         "side": pa.array(side)})

    def attach_shingles(g: pa.Table) -> pa.Table:
        empty = pa.table({"bucket": pa.array([], pa.int32()),
                          "a": pa.array([], pa.int64()),
                          "b": pa.array([], pa.int64()),
                          "sh": _empty_lists(0),
                          "side": pa.array([], pa.int8())})
        g = g.combine_chunks()
        side = g["side"].to_numpy(zero_copy_only=False)
        a = g["a"].to_numpy(zero_copy_only=False)
        b = g["b"].to_numpy(zero_copy_only=False)
        prow = np.flatnonzero(side != 2)
        drow = np.flatnonzero(side == 2)
        if not len(prow) or not len(drow):
            return empty
        # dedupe band-duplicate halves: (a, b, side) is unique after
        # this, and identical halves always land in the same bucket
        pa_, pb_, ps_ = a[prow], b[prow], side[prow]
        order = np.lexsort((ps_, pb_, pa_))
        pa_, pb_, ps_ = pa_[order], pb_[order], ps_[order]
        keep = np.ones(len(order), dtype=bool)
        keep[1:] = ((pa_[1:] != pa_[:-1]) | (pb_[1:] != pb_[:-1])
                    | (ps_[1:] != ps_[:-1]))
        pa_, pb_, ps_ = pa_[keep], pb_[keep], ps_[keep]
        keyv = np.where(ps_ == 0, pa_, pb_)
        dids = a[drow]
        dorder = np.argsort(dids, kind="stable")
        drow, dids = drow[dorder], dids[dorder]
        pos = np.clip(np.searchsorted(dids, keyv), 0, len(dids) - 1)
        ok = dids[pos] == keyv
        pa_, pb_, ps_, pos = pa_[ok], pb_[ok], ps_[ok], pos[ok]
        if not len(pa_):
            return empty
        # shingle only the docs some half actually references
        # (vectorized — same kernel as the signature stage)
        need = np.unique(pos)
        sh_arr = _shingle_lists(
            g["text"].take(pa.array(drow[need], pa.int64())))
        sel = np.searchsorted(need, pos)
        bk2 = ((_mix64(pa_) ^ _mix64(pb_))
               % np.uint64(_N_BUCKETS)).astype(np.int32)
        return pa.table({"bucket": pa.array(bk2),
                         "a": pa.array(pa_, pa.int64()),
                         "b": pa.array(pb_, pa.int64()),
                         "sh": sh_arr.take(pa.array(sel, pa.int64())),
                         "side": pa.array(ps_)})

    def join_halves_jaccard(g: pa.Table) -> pa.Table:
        g = g.combine_chunks()
        a = g["a"].to_numpy(zero_copy_only=False)
        b = g["b"].to_numpy(zero_copy_only=False)
        side = g["side"].to_numpy(zero_copy_only=False)
        order = np.lexsort((side, b, a))
        a2, b2, s2 = a[order], b[order], side[order]
        # after the per-bucket dedupe upstream each (a, b) has at most
        # one half per side, so a pair is exactly an adjacent (0, 1) run
        m = np.zeros(max(len(a2) - 1, 0), dtype=bool)
        if len(a2) > 1:
            m = ((a2[1:] == a2[:-1]) & (b2[1:] == b2[:-1])
                 & (s2[:-1] == 0) & (s2[1:] == 1))
        ia = order[:-1][m]
        ib = order[1:][m]
        sa = g["sh"].take(pa.array(ia, pa.int64())).combine_chunks()
        sb = g["sh"].take(pa.array(ib, pa.int64())).combine_chunks()
        n = len(sa)
        la, lb = _list_lengths(sa), _list_lengths(sb)
        flat = np.concatenate([sa.flatten().to_numpy(zero_copy_only=False),
                               sb.flatten().to_numpy(zero_copy_only=False)])
        pidx = np.concatenate([np.repeat(np.arange(n), la),
                               np.repeat(np.arange(n), lb)])
        sorder = np.lexsort((flat, pidx))
        p, s = pidx[sorder], flat[sorder]
        dup = (p[1:] == p[:-1]) & (s[1:] == s[:-1])
        inter = np.zeros(n, dtype=np.int64)
        np.add.at(inter, p[1:][dup], 1)
        union = la + lb - inter
        j = np.where(union > 0, inter / np.maximum(union, 1), 1.0)
        j = np.round(j, 6)
        keep = j >= jaccard_threshold
        take_k = pa.array(ia[keep], pa.int64())
        return pa.table({"a": g["a"].take(take_k),
                         "b": g["b"].take(take_k),
                         "jaccard": pa.array(j[keep], pa.float64())})

    halves = (docs.map_batches(tag_docs, batch_format="pyarrow",
                               zero_copy_batch=True)
              .union(cand.map_batches(tag_pair_halves,
                                      batch_format="pyarrow"))
              .groupby("bucket")
              .map_groups(attach_shingles, batch_format="pyarrow"))
    return (halves.groupby("bucket")
            .map_groups(join_halves_jaccard, batch_format="pyarrow"))


class SimHashStage(TextStats):
    """SimHash per doc from token hashes (stable crc-based).

    Effective width is 63 bits: bit 63 is masked off so the signature
    fits a non-negative int64 parquet column (and the banding shifts
    stay sign-free).  A bit-63-only difference therefore reads as
    hamming 0 — one bit of discrimination traded for the simple
    storage type, well inside the sketch's approximate contract."""

    def simhash(self, text: str) -> int:
        """Scalar form (tests / one-off callers); the batch path below
        is the vectorized equivalent."""
        return int(self._simhash_batch([self.tokens(text)])[0])

    # max docs×vocab cells for the dense counts-matrix fast path
    # (16M float64 cells ≈ 128 MB transient)
    _DENSE_LIMIT = 1 << 24

    def _simhash_batch(self, toks: list[list[str]]) -> np.ndarray:
        """SimHash for many docs in one shot.  Each UNIQUE token string
        in the batch is crc-hashed once (np.unique memo); per-doc ±1
        accumulation is then either a counts-matrix × ±1 BLAS matmul
        when docs×vocab is small, or 64 weighted bincounts over the flat
        token stream otherwise (acc = 2·ones − len per bit lane) — never
        a per-token Python loop.  Both paths are exact: every count and
        partial sum stays far below 2^53 so the float64 arithmetic is
        integer-exact."""
        n = len(toks)
        lens = np.fromiter((len(tk) for tk in toks), dtype=np.int64, count=n)
        flat = [w for tk in toks for w in tk]
        if not flat:
            return np.zeros(n, dtype=np.int64)
        import pandas as pd
        inv, uniq = pd.factorize(np.array(flat, dtype=object))
        return self._simhash_core(n, lens, inv, uniq)

    def _simhash_core(self, n: int, lens: np.ndarray, inv: np.ndarray,
                      uniq) -> np.ndarray:
        import zlib
        h = np.fromiter(
            ((zlib.crc32(w.encode()) << 32) | zlib.crc32(w[::-1].encode())
             for w in uniq), dtype=np.uint64, count=len(uniq))
        U = len(uniq)
        didx = np.repeat(np.arange(n), lens)
        if n * U <= self._DENSE_LIMIT:
            shifts = np.arange(64, dtype=np.uint64)
            pm = (2 * ((h[:, None] >> shifts[None, :]) & np.uint64(1))
                  .astype(np.int64)) - 1          # (uniq, 64) of ±1
            counts = np.bincount(didx * U + inv.astype(np.int64),
                                 minlength=n * U).reshape(n, U)
            acc = np.rint(counts.astype(np.float64)
                          @ pm.astype(np.float64)).astype(np.int64)
        else:
            acc = np.empty((n, 64), dtype=np.int64)
            for k in range(64):
                bitk = ((h >> np.uint64(k)) & np.uint64(1)) \
                    .astype(np.float64)
                ones = np.bincount(didx, weights=bitk[inv], minlength=n)
                acc[:, k] = np.rint(2.0 * ones).astype(np.int64) - lens
        out = ((acc > 0).astype(np.uint64)
               << np.arange(64, dtype=np.uint64)).sum(axis=1,
                                                      dtype=np.uint64)
        return (out & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(np.int64)

    def __call__(self, t: pa.Table) -> pa.Table:
        # Arrow tokenize + C factorize; crc per UNIQUE token happens in
        # _simhash_core exactly as in the list path, so signatures are
        # bit-identical to SimHashStage.simhash (asserted in tests).
        from mee_ray.pipelines.gramhash import tokenize_flat
        flat, _, lens = tokenize_flat(t["text"], mode="regex")
        n = len(t)
        if len(flat) == 0:
            sig = np.zeros(n, dtype=np.int64)
        else:
            d = pc.dictionary_encode(flat.combine_chunks()
                                     if isinstance(flat, pa.ChunkedArray)
                                     else flat)
            inv = d.indices.to_numpy(zero_copy_only=False)
            uniq = d.dictionary.to_numpy(zero_copy_only=False)
            sig = self._simhash_core(n, lens, inv, uniq)
        return pa.table({"doc_id": t["doc_id"],
                         "simhash": pa.array(sig, pa.int64())})


def simhash_signatures(sf_dir: str):
    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        SimHashStage(), batch_format="pyarrow")


def simhash_dup_pairs(sf_dir: str, max_hamming: int = 3,
                      max_group: int | None = None):
    """SimHash near-dup pairs via 4×16-bit band buckets (a pair within
    hamming ≤ 3 of 64 bits must agree on ≥1 of 4 bands).

    Fully distributed (mirrors the MinHash LSH shape): signatures
    flat-map to 4 (band, bucket) rows, the bucket groupby is the only
    shuffle, pairs are emitted per group, and a second small groupby on
    (a, b) dedupes pairs that collide in several bands — no driver-side
    signature materialization."""
    import itertools

    from ray.data.aggregate import Min

    sig = simhash_signatures(sf_dir)

    def band_rows(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        hs = t["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        bands = np.tile(np.arange(4, dtype=np.int32), len(ids))
        rep_ids = np.repeat(ids, 4)
        rep_hs = np.repeat(hs, 4)
        buckets = ((rep_hs >> (bands.astype(np.uint64) * np.uint64(16)))
                   & np.uint64(0xFFFF)).astype(np.int64)
        return pa.table({"band": pa.array(bands),
                         "bucket": pa.array(buckets),
                         "doc_id": pa.array(rep_ids.astype(np.int64)),
                         "simhash": pa.array(rep_hs.astype(np.int64))})

    EMPTY = pa.schema([("a", pa.int64()), ("b", pa.int64()),
                       ("hamming", pa.int64())])

    cap = _MAX_ALLPAIRS_GROUP if max_group is None else max_group

    def pairs_of_group(g: pa.Table, mh=max_hamming, cap=cap) -> pa.Table:
        uniq = {int(d): int(h) for d, h in zip(g["doc_id"].to_pylist(),
                                               g["simhash"].to_pylist())}
        if len(uniq) > cap:
            # degenerate bucket (e.g. all-zero simhash of token-free
            # docs).  A bucket only guarantees 16 shared bits, NOT
            # identical signatures, so a naive star-to-smallest drops
            # real pairs between non-representative members.  Instead:
            # group members by FULL signature — the realistic cause of
            # a huge bucket is signature degeneracy — star each
            # identical-signature group to its min id (hamming 0, so
            # the dup component is preserved exactly), then run exact
            # all-pairs across the (far fewer) group REPRESENTATIVES;
            # a—rep_a—rep_b—b keeps cross-group members connected.
            # Residual cap: if even the distinct-signature count
            # exceeds the budget, reps fall back to a star (documented
            # approximation, O(N) edges).
            by_sig: dict[int, list[int]] = {}
            for d in sorted(uniq):
                by_sig.setdefault(uniq[d], []).append(d)
            out_a, out_b, out_d = [], [], []
            for members in by_sig.values():
                rep = members[0]
                for y in members[1:]:
                    out_a.append(rep); out_b.append(y); out_d.append(0)
            reps = sorted(m[0] for m in by_sig.values())
            if len(reps) <= cap:
                for x, y in itertools.combinations(reps, 2):
                    d = int(bin(uniq[x] ^ uniq[y]).count("1"))
                    if d <= mh:
                        out_a.append(x); out_b.append(y); out_d.append(d)
            else:
                rep0 = reps[0]
                for y in reps[1:]:
                    d = int(bin(uniq[rep0] ^ uniq[y]).count("1"))
                    if d <= mh:
                        out_a.append(rep0); out_b.append(y); out_d.append(d)
            if not out_a:
                return pa.Table.from_pylist([], schema=EMPTY)
            return pa.table({"a": pa.array(out_a, pa.int64()),
                             "b": pa.array(out_b, pa.int64()),
                             "hamming": pa.array(out_d, pa.int64())})
        out_a, out_b, out_d = [], [], []
        for x, y in itertools.combinations(sorted(uniq), 2):
            d = int(bin(uniq[x] ^ uniq[y]).count("1"))
            if d <= mh:
                out_a.append(x); out_b.append(y); out_d.append(d)
        if not out_a:
            return pa.Table.from_pylist([], schema=EMPTY)
        return pa.table({"a": pa.array(out_a, pa.int64()),
                         "b": pa.array(out_b, pa.int64()),
                         "hamming": pa.array(out_d, pa.int64())})

    pairs = (sig.map_batches(band_rows, batch_format="pyarrow")
             .groupby(["band", "bucket"])
             .map_groups(pairs_of_group, batch_format="pyarrow"))
    # dedupe across bands: hamming is a pure function of the pair, so
    # Min is just "pick one"
    return pairs.groupby(["a", "b"]).aggregate(
        Min("hamming", alias_name="hamming"))


def _char_gram_sets_batch(texts: list, n: int):
    """Per-doc DEDUPED char-n-gram hash sets for a whole batch,
    vectorized: codepoints come from one utf-32 decode of the joined
    batch text (char-level grams, matching the oracle's substr()),
    spread through mix64 and folded by the gramhash window kernel —
    collision odds ~|grams|²/2⁶⁴, so hashed-set Jaccard equals
    string-set Jaccard for practical purposes.  Texts shorter than
    ``n`` chars (but non-empty) contribute one whole-string gram (the
    _shingles short-doc rule); empty texts contribute nothing.
    Returns (didx, g) doc-major, g sorted unique within each doc."""
    from mee_ray.pipelines.gramhash import (_FNV, _SIGN_MASK,
                                            gram_hash64, mix64)
    texts = [x or "" for x in texts]
    lens = np.fromiter((len(x) for x in texts), np.int64, len(texts))
    joined = "".join(texts)
    cp = np.frombuffer(joined.encode("utf-32-le"),
                       np.uint32).astype(np.uint64)
    th = mix64(cp)
    didx, _, g = gram_hash64(th, lens, n)
    doc_start = np.cumsum(lens) - lens
    parts_d, parts_g = [didx], [g]
    for L in range(1, n):
        sel = np.flatnonzero(lens == L)
        if not len(sel):
            continue
        starts = doc_start[sel]
        acc = th[starts].copy()
        for j in range(1, L):
            acc = acc * _FNV ^ th[starts + j]
        parts_d.append(sel)
        parts_g.append((acc & _SIGN_MASK).astype(np.int64))
    d = np.concatenate(parts_d)
    gg = np.concatenate(parts_g)
    if len(d):
        order = np.lexsort((gg, d))
        d, gg = d[order], gg[order]
        keep = np.ones(len(d), dtype=bool)
        keep[1:] = (d[1:] != d[:-1]) | (gg[1:] != gg[:-1])
        d, gg = d[keep], gg[keep]
    return d, gg


def _gram_hashes(text: str, n: int) -> np.ndarray:
    """Scalar form of :func:`_char_gram_sets_batch` (tests /
    one-off callers): sorted unique hashes of one string's char
    n-grams."""
    _, g = _char_gram_sets_batch([text], n)
    return g


ADJ_SAMPLE_TARGET = 4096   # expected boundary-sample size, corpus-independent


def _adjacency_boundaries(ds, n_docs: int, n_parts: int = 64,
                          target: int = ADJ_SAMPLE_TARGET) -> np.ndarray:
    """Range-partition boundaries for the global doc_id adjacency
    order with O(target + n_parts) driver state (VERDICT r4 #2: the
    old form gathered EVERY doc_id on the driver — 8 B/doc).  A
    deterministic mix64-threshold sample (expected ``target`` ids,
    invariant to file order, block layout and parallelism — the
    hash_sample discipline) is sorted on the driver and cut at
    quantiles.  Every boundary is a REAL doc_id, so with
    ``part = boundaries.searchsorted(doc_id, 'left')`` each part
    except possibly the LAST contains its boundary doc — the
    invariant the single-hop ghost stitch in ngram_jaccard_adjacent
    relies on (no empty interior parts to hop over)."""
    from mee_ray.pipelines.gramhash import mix64
    if n_docs <= 0:
        return np.empty(0, np.int64)
    rate = min(1.0, target / n_docs)
    # clamp: float(2^64-1) rounds UP to 2^64, one past uint64 max
    thr = np.uint64(min(int(rate * float(2 ** 64 - 1)), 2 ** 64 - 1))

    def keep(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        m = mix64(ids) <= thr
        return pa.table({"doc_id": pa.array(ids[m], pa.int64())})

    parts = list(ds.map_batches(keep, batch_format="pyarrow",
                                zero_copy_batch=True)
                 .iter_batches(batch_format="pyarrow"))
    chunks = [p["doc_id"].to_numpy(zero_copy_only=False) for p in parts]
    ids = np.unique(np.concatenate(chunks)) if chunks \
        else np.empty(0, np.int64)
    if len(ids) == 0:
        return np.empty(0, np.int64)
    cut = np.round(np.linspace(0, len(ids) - 1,
                               num=min(n_parts - 1, len(ids)))
                   ).astype(np.int64)
    return np.unique(ids[cut])


def ngram_jaccard_adjacent(sf_dir: str, n: int = 5, n_parts: int = 64):
    """Character-n-gram Jaccard for adjacent doc_id pairs.

    Distributed shape (no corpus-sized driver state — VERDICT r4 #2):
    (1) :func:`_adjacency_boundaries` fixes range-partition
    boundaries from a bounded hash sample — O(sample + parts) driver
    state, each boundary a real doc_id so every part except possibly
    the last is nonempty; (2) ONE groupby(part) range shuffle
    co-locates each part's docs PLUS single-hop ghost rows: per
    (batch, part) only the max-doc row is forwarded to part+1, so a
    group learns its global predecessor (= max of the nonempty
    part-1) without a second exchange; (3) one vectorized pass per
    group computes every consecutive-pair Jaccard (sorted-unique
    stream-concat duplicate counting) and the ghost pair stitches
    the partition boundary.  Content never gathers on the driver;
    pair gram streams never leave their group."""
    import pyarrow.dataset as pads

    EMPTY = pa.schema([("a", pa.int64()), ("b", pa.int64()),
                       ("jaccard5", pa.float64())])
    n_docs = pads.dataset(f"{sf_dir}/documents.parquet").count_rows()
    if n_docs < 2:
        return pa.Table.from_pylist([], schema=EMPTY)
    bd = _adjacency_boundaries(_read_docs(sf_dir, ["doc_id"]),
                               n_docs, n_parts)

    def to_part_rows(t: pa.Table, n=n, bd=bd) -> pa.Table:
        dids = t["doc_id"].to_numpy(zero_copy_only=False)
        didx, g = _char_gram_sets_batch(t["text"].to_pylist(), n)
        counts = np.bincount(didx, minlength=len(t)).astype(np.int64)
        lists = pa.ListArray.from_arrays(
            pa.array(i32_offsets(np.r_[0, np.cumsum(counts)]),
                     pa.int32()),
            pa.array(g, pa.int64()))
        part = bd.searchsorted(dids, side="left").astype(np.int32)
        # single-hop ghosts: per part present in THIS batch, the
        # max-doc row is a candidate predecessor for part+1 (the
        # group keeps the max over candidates); the last part has no
        # successor and sends none
        order = np.lexsort((dids, part))
        p_s = part[order]
        last = np.r_[p_s[1:] != p_s[:-1], True] if len(p_s) else \
            np.zeros(0, bool)
        ghost = order[last]
        ghost = ghost[part[ghost] + 1 <= len(bd)]
        rows = np.r_[np.arange(len(t)), ghost]
        return pa.table({
            "part": pa.array(np.r_[part, part[ghost] + 1]
                             .astype(np.int32)),
            "role": pa.array(np.r_[np.zeros(len(t), np.int8),
                                   np.ones(len(ghost), np.int8)]),
            "doc_id": pa.array(dids[rows], pa.int64()),
            "grams": lists.take(pa.array(rows, pa.int64()))})

    def jaccard_of_group(t: pa.Table) -> pa.Table:
        """One group = one contiguous doc_id range: real rows sorted
        by doc_id give the consecutive pairs, the max ghost row (the
        previous range's last doc) stitches the boundary pair.  All
        of a group's pairs go through ONE duplicate-count pass over
        the pair-concatenated sorted-unique gram streams."""
        t = t.combine_chunks()
        role = t["role"].to_numpy(zero_copy_only=False)
        dids = t["doc_id"].to_numpy(zero_copy_only=False)
        real = np.flatnonzero(role == 0)
        if len(real) == 0:
            return pa.Table.from_pylist([], schema=EMPTY)
        order = real[np.argsort(dids[real])]
        ghosts = np.flatnonzero(role == 1)
        left, right = order[:-1], order[1:]
        if len(ghosts):
            gmax = ghosts[np.argmax(dids[ghosts])]
            left = np.r_[gmax, left]
            right = np.r_[order[0], right]
        if len(left) == 0:
            return pa.Table.from_pylist([], schema=EMPTY)
        grams = t["grams"].combine_chunks()
        glen = np.diff(grams.offsets.to_numpy(zero_copy_only=False))
        P = len(left)
        rows = np.r_[left, right]
        taken = grams.take(pa.array(rows, pa.int64()))
        if isinstance(taken, pa.ChunkedArray):
            taken = taken.combine_chunks()
        gv = taken.flatten().to_numpy(zero_copy_only=False)
        pidx = np.repeat(np.r_[np.arange(P), np.arange(P)], glen[rows])
        o2 = np.lexsort((gv, pidx))
        pv, vv = pidx[o2], gv[o2]
        dup = np.zeros(len(vv), dtype=np.int64)
        if len(vv) > 1:
            dup[1:] = (pv[1:] == pv[:-1]) & (vv[1:] == vv[:-1])
        inter = np.zeros(P, dtype=np.int64)
        np.add.at(inter, pv, dup)
        union = glen[left] + glen[right] - inter
        jac = np.where(union == 0, 1.0, inter / np.maximum(union, 1))
        return pa.table({"a": pa.array(dids[left], pa.int64()),
                         "b": pa.array(dids[right], pa.int64()),
                         "jaccard5": pa.array(jac, pa.float64())})

    return (_read_docs(sf_dir, ["doc_id", "text"])
            .map_batches(to_part_rows, batch_format="pyarrow")
            .groupby("part")
            .map_groups(jaccard_of_group, batch_format="pyarrow"))


def stratified_sample_documents(sf_dir: str, k: int = 20,
                                n_buckets: int = 16):
    """Deterministic stratified sampling — k documents per language
    stratum, a first-class training-data-pipeline need (balance
    languages before training).

    Determinism without a random state: rank docs inside each stratum
    by a Knuth multiplicative hash of doc_id (uniform, seedable by
    changing the constant) and keep the k smallest — a distributed
    "reservoir" whose result is independent of batch boundaries,
    retries, and parallelism.  Same shuffle discipline as the windowed
    ranking: per-batch combiners keep ≤k rows per stratum, strata hash
    into buckets, one vectorized lexsort pass per group."""

    def topk_of(t: pa.Table, with_bucket: bool) -> pa.Table:
        did = t["doc_id"].to_numpy(zero_copy_only=False)
        # pre-reduce mod 2^32 before the multiply: congruent (same h
        # for every id), and the product stays < 2^64 so the SQL
        # mirror's HUGEINT form matches at ANY id magnitude
        h = ((did.astype(np.uint64) % np.uint64(1 << 32))
             * np.uint64(2654435761)
             % np.uint64(1 << 32)).astype(np.int64)
        lang = t["lang"].to_numpy(zero_copy_only=False)
        order = np.lexsort((did, h, lang))
        lang_s = lang[order]
        new = np.ones(len(lang_s), dtype=bool)
        new[1:] = lang_s[1:] != lang_s[:-1]
        pos = np.arange(len(lang_s))
        start = np.maximum.accumulate(np.where(new, pos, 0))
        keep = (pos - start) < k
        t = t.take(pa.array(order[keep]))
        t = t.append_column("sample_rank",
                            pa.array((pos - start)[keep] + 1, pa.int64()))
        t = t.append_column("h", pa.array(h[order][keep], pa.int64()))
        if with_bucket:
            # crc32, NOT Python hash(): str hashing is per-process
            # salted, and an unstable bucket would split one stratum
            # across groups (two winners per lang)
            import zlib
            lang_kept = lang_s[keep]
            uniq = {x: zlib.crc32(str(x).encode()) % n_buckets
                    for x in dict.fromkeys(lang_kept.tolist())}
            b = np.array([uniq[x] for x in lang_kept.tolist()],
                         dtype=np.int64)
            t = t.append_column("bucket", pa.array(b, pa.int64()))
        return t

    def combine(t: pa.Table) -> pa.Table:
        return topk_of(t, with_bucket=True).drop_columns(
            ["sample_rank", "h"])

    def finish(g: pa.Table) -> pa.Table:
        return topk_of(g, with_bucket=False).select(
            ["lang", "sample_rank", "doc_id"])

    return (_read_docs(sf_dir, ["doc_id", "lang"])
            .map_batches(combine, batch_format="pyarrow",
                         zero_copy_batch=True)
            .groupby("bucket")
            .map_groups(finish, batch_format="pyarrow"))


STRATIFIED_SQL = """
SELECT lang, sample_rank, doc_id
FROM (SELECT lang, doc_id,
             row_number() OVER (
                 PARTITION BY lang
                 ORDER BY ((CAST(doc_id AS HUGEINT) % 4294967296)
                           * 2654435761) % 4294967296, doc_id)
               AS sample_rank
      FROM documents)
WHERE sample_rank <= 20
"""


# ----------------------------------------------------- PII scrubbing --

# RE2 syntax on BOTH sides: pyarrow's replace/count_substring_regex and
# DuckDB's regexp_* are RE2, so the literal pattern strings below mean
# the same thing in the engine and in the oracle.
EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
IP_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\+\d[\d ]{6,}\d"


def pii_scrub_documents(sf_dir: str):
    """PII scrubbing (training-data hygiene op): replace emails, IPv4
    addresses, and phone numbers with typed placeholder tokens, and
    count each kind per document.

    The synthetic corpus contains no digits at all, so the pipeline
    first APPENDS deterministic doc_id-derived PII strings (every 3rd
    doc an email, every 5th an IP, every 7th a phone — mirrored
    exactly in the SQL oracle) and then scrubs them — a vacuous-pass
    guard: the oracle comparison exercises real pattern semantics on
    every kind, not an all-no-op replace.

    Fully vectorized: augmentation via binary_join_element_wise,
    counts via count_substring_regex, scrub via three ordered
    replace_substring_regex passes (email → ip → phone, same order as
    the oracle — the kinds can't overlap but the order is still
    pinned)."""
    import pyarrow.compute as pc

    def f(t: pa.Table) -> pa.Table:
        from functools import reduce
        did = t["doc_id"]
        # modular arithmetic in numpy (pyarrow.compute has no modulo
        # kernel in this version); string assembly stays vectorized
        d = did.to_numpy(zero_copy_only=False)

        def cat(*pieces):
            return reduce(np.char.add, [np.asarray(p, dtype="U")
                                        if not isinstance(p, np.ndarray)
                                        else p for p in pieces])

        sid = d.astype("U20")
        email = np.where(d % 3 == 0,
                         cat(" contact user", sid, "@example.com"), "")
        ip = np.where(d % 5 == 0,
                      cat(" host 10.", (d % 200).astype("U3"), ".",
                          (d % 100).astype("U3"), ".",
                          (d % 50).astype("U3")), "")
        phone = np.where(d % 7 == 0,
                         cat(" call +1 555 ",
                             (1000 + d % 9000).astype("U5")), "")
        aug = pc.binary_join_element_wise(
            t["text"], pa.array(email, pa.string()),
            pa.array(ip, pa.string()), pa.array(phone, pa.string()), "")
        n_email = pc.count_substring_regex(aug, pattern=EMAIL_RE)
        n_ip = pc.count_substring_regex(aug, pattern=IP_RE)
        n_phone = pc.count_substring_regex(aug, pattern=PHONE_RE)
        clean = pc.replace_substring_regex(aug, pattern=EMAIL_RE,
                                           replacement="<EMAIL>")
        clean = pc.replace_substring_regex(clean, pattern=IP_RE,
                                           replacement="<IP>")
        clean = pc.replace_substring_regex(clean, pattern=PHONE_RE,
                                           replacement="<PHONE>")
        return pa.table({"doc_id": did, "clean_text": clean,
                         "n_email": pc.cast(n_email, pa.int64()),
                         "n_ip": pc.cast(n_ip, pa.int64()),
                         "n_phone": pc.cast(n_phone, pa.int64())})

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow", zero_copy_batch=True)


PII_SCRUB_SQL = f"""
WITH aug AS (
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 3 = 0
                 THEN ' contact user' || doc_id || '@example.com'
                 ELSE '' END
         || CASE WHEN doc_id % 5 = 0
                 THEN ' host 10.' || (doc_id % 200) || '.'
                      || (doc_id % 100) || '.' || (doc_id % 50)
                 ELSE '' END
         || CASE WHEN doc_id % 7 = 0
                 THEN ' call +1 555 ' || (1000 + doc_id % 9000)
                 ELSE '' END AS text
  FROM documents)
SELECT doc_id,
       regexp_replace(regexp_replace(regexp_replace(
           text, '{EMAIL_RE}', '<EMAIL>', 'g'),
           '{IP_RE}', '<IP>', 'g'),
           '{PHONE_RE}', '<PHONE>', 'g')          AS clean_text,
       len(regexp_extract_all(text, '{EMAIL_RE}')) AS n_email,
       len(regexp_extract_all(text, '{IP_RE}'))    AS n_ip,
       len(regexp_extract_all(text, '{PHONE_RE}')) AS n_phone
FROM aug
"""


# ------------------------------------------- repetition (Gopher-style) --

def repetition_scores_documents(sf_dir: str):
    """Gopher-style repetition quality signals per document:
    unique-token ratio and the fraction of bigrams taken by the most
    frequent bigram (high → boilerplate/repetitive text a training-
    data pipeline drops).  Float ratios are single divisions of exact
    integer counts — bit-identical to the oracle's DOUBLE division."""
    class Stage(TextStats):
        def __call__(self, t: pa.Table) -> pa.Table:
            # vectorized: token ids once, distinct-per-doc and
            # top-bigram-run via two sorts — identical float results
            # (same single divisions of the same exact integers)
            from mee_ray.pipelines.gramhash import tokenize_flat
            flat, didx, lens = tokenize_flat(t["text"], mode="regex")
            n = len(t)
            n_tok = lens.astype(np.int64)
            uniq_c = np.zeros(n, dtype=np.int64)
            top = np.zeros(n, dtype=np.int64)
            if len(flat):
                d = pc.dictionary_encode(
                    flat.combine_chunks()
                    if isinstance(flat, pa.ChunkedArray) else flat)
                tid = d.indices.to_numpy(zero_copy_only=False) \
                    .astype(np.int64)
                U = len(d.dictionary)
                order = np.lexsort((tid, didx))
                d2, t2 = didx[order], tid[order]
                keep = np.ones(len(d2), dtype=bool)
                keep[1:] = (d2[1:] != d2[:-1]) | (t2[1:] != t2[:-1])
                uniq_c = np.bincount(d2[keep], minlength=n) \
                    .astype(np.int64)
                bs = np.flatnonzero(didx[1:] == didx[:-1])
                if len(bs):
                    bd, bk = didx[bs], tid[bs] * U + tid[bs + 1]
                    o2 = np.lexsort((bk, bd))
                    bd2, bk2 = bd[o2], bk[o2]
                    r = np.flatnonzero(np.r_[
                        True, (bd2[1:] != bd2[:-1])
                        | (bk2[1:] != bk2[:-1])])
                    rl = np.diff(np.r_[r, len(bd2)])
                    rd = bd2[r]
                    ds = np.flatnonzero(np.r_[True, rd[1:] != rd[:-1]])
                    top[rd[ds]] = np.maximum.reduceat(rl, ds)
            with np.errstate(divide="ignore", invalid="ignore"):
                uniq_ratio = np.where(n_tok > 0, uniq_c / n_tok, 0.0)
                frac = np.where(n_tok > 1,
                                top / np.maximum(n_tok - 1, 1), 0.0)
            return pa.table({"doc_id": t["doc_id"],
                             "n_tokens": pa.array(n_tok, pa.int64()),
                             "uniq_ratio": pa.array(uniq_ratio,
                                                    pa.float64()),
                             "top_bigram_frac": pa.array(frac,
                                                         pa.float64())})

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        Stage(), batch_format="pyarrow")


REPETITION_SQL = f"""
WITH toks AS (SELECT doc_id,
                     regexp_extract_all(lower(text), '{TOKEN_PATTERN}') AS ts
              FROM documents),
tok AS (SELECT doc_id, unnest(ts) AS t, generate_subscripts(ts, 1) AS i
        FROM toks),
cnt AS (SELECT doc_id, count(*) AS n_tokens, count(DISTINCT t) AS n_uniq
        FROM tok GROUP BY doc_id),
-- drive from documents (not tok) so a token-free doc still emits a
-- row — the engine emits (doc_id, 0, 0.0, 0.0) for such docs
base AS (SELECT d.doc_id,
                COALESCE(cnt.n_tokens, 0) AS n_tokens,
                COALESCE(cnt.n_uniq, 0)   AS n_uniq
         FROM documents d LEFT JOIN cnt ON cnt.doc_id = d.doc_id),
big AS (SELECT a.doc_id, a.t || ' ' || b.t AS bg
        FROM tok a JOIN tok b ON b.doc_id = a.doc_id AND b.i = a.i + 1),
bgc AS (SELECT doc_id, bg, count(*) AS c FROM big GROUP BY doc_id, bg),
bgm AS (SELECT doc_id, max(c) AS maxc, sum(c) AS total
        FROM bgc GROUP BY doc_id)
SELECT base.doc_id,
       base.n_tokens,
       CASE WHEN base.n_tokens = 0 THEN 0.0
            ELSE CAST(base.n_uniq AS DOUBLE) / base.n_tokens
       END AS uniq_ratio,
       COALESCE(CAST(bgm.maxc AS DOUBLE) / bgm.total, 0.0) AS top_bigram_frac
FROM base LEFT JOIN bgm ON bgm.doc_id = base.doc_id
"""


# ------------------------------------------- Gopher quality rules ----
# The full Gopher quality-filter battery (Rae et al. 2021,
# arXiv:2112.11446 §A1.1) per document.  Every rule is an INTEGER
# inequality (ratios cleared of their denominators: mean word length
# in [3,10] becomes 3n ≤ total ≤ 10n, 10% becomes ×10, 80% becomes
# ×5/×4), so the engine and the DuckDB oracle compare exactly with no
# float anywhere.  One tokenless pass, one row out per doc — the
# trivially scale-safe shape.

_GOPHER_STOPS = ("the", "be", "to", "of", "and", "that", "have", "with")
# \s differs between Python (unicode) and RE2 (ASCII): use the
# explicit ASCII class on both sides so the word split is identical
_GOPHER_WORD_PATTERN = "[^\\t\\n\\f\\r ]+"
_GOPHER_WORD_SPLIT = "[\\t\\n\\f\\r ]+"


class GopherRulesStage(TextStats):
    def __init__(self):
        super().__init__()
        import re
        self.word_re = re.compile(_GOPHER_WORD_PATTERN)
        self.alpha_re = re.compile("[a-zA-Z]")

    def __call__(self, t: pa.Table) -> pa.Table:
        """Fully vectorized rule battery: word/line stats from Arrow
        split + flatten + bincount, substring counts from
        count_substring, the stopword rule from one tokenize +
        is_in + per-doc distinct — no Python per row (bit-parity with
        :meth:`scalar_call` asserted in test_pipelines.py)."""
        from mee_ray.pipelines.gramhash import tokenize_flat
        col = pc.fill_null(t["text"], "")
        n = len(t)

        def _flat(lists, keep_empty):
            if isinstance(lists, pa.ChunkedArray):
                lists = lists.combine_chunks()
            cnt = pc.list_value_length(lists).to_numpy(
                zero_copy_only=False).astype(np.int64)
            flat = pc.list_flatten(lists)
            if isinstance(flat, pa.ChunkedArray):
                flat = flat.combine_chunks()
            didx = np.repeat(np.arange(n, dtype=np.int64), cnt)
            if not keep_empty:
                ok = pc.not_equal(flat, pa.scalar("")).to_numpy(
                    zero_copy_only=False).astype(bool)
                if not ok.all():
                    flat = flat.filter(pa.array(ok))
                    didx = didx[ok]
            return flat, didx

        # words: ASCII-space-separated runs (the Gopher word split)
        wf, wd = _flat(pc.split_pattern_regex(
            col, _GOPHER_WORD_SPLIT), keep_empty=False)
        nw = np.bincount(wd, minlength=n)
        wlen = pc.utf8_length(wf).to_numpy(zero_copy_only=False)
        total = np.bincount(wd, weights=wlen, minlength=n)             .astype(np.int64)
        has_alpha = pc.match_substring_regex(wf, "[a-zA-Z]")             .to_numpy(zero_copy_only=False).astype(np.int64)
        nalpha = np.bincount(wd, weights=has_alpha, minlength=n)             .astype(np.int64)

        # lines: split("\n") KEEPS empties (Python parity)
        lf, ld = _flat(pc.split_pattern(col, "\n"), keep_empty=True)
        nl = np.bincount(ld, minlength=n)
        bul = (pc.starts_with(lf, "-").to_numpy(zero_copy_only=False)
               | pc.starts_with(lf, "*").to_numpy(zero_copy_only=False)
               | pc.starts_with(lf, "\u2022").to_numpy(
                   zero_copy_only=False)).astype(np.int64)
        nbul = np.bincount(ld, weights=bul, minlength=n).astype(np.int64)
        ell = pc.ends_with(lf, "...").to_numpy(
            zero_copy_only=False).astype(np.int64)
        nell = np.bincount(ld, weights=ell, minlength=n).astype(np.int64)

        nsym = (pc.count_substring(col, "#").to_numpy(
                    zero_copy_only=False)
                + pc.count_substring(col, "...").to_numpy(
                    zero_copy_only=False)).astype(np.int64)

        # distinct stopwords per doc (tokens, not raw words)
        tf_, td_ = _flat(pc.split_pattern_regex(
            pc.utf8_lower(col), "[^a-z0-9_]+"), keep_empty=False)
        stops = pa.array(list(_GOPHER_STOPS), pa.string())
        ii = pc.index_in(tf_, value_set=stops)
        mask = pc.is_valid(ii).to_numpy(zero_copy_only=False) \
            .astype(bool)
        sid = pc.fill_null(ii, -1).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        sd, sv = td_[mask], sid[mask]
        if len(sd):
            order = np.lexsort((sv, sd))
            sd, sv = sd[order], sv[order]
            keep = np.ones(len(sd), dtype=bool)
            keep[1:] = (sd[1:] != sd[:-1]) | (sv[1:] != sv[:-1])
            nstop = np.bincount(sd[keep], minlength=n)
        else:
            nstop = np.zeros(n, dtype=np.int64)

        r_wc = (nw >= 50) & (nw <= 100_000)
        r_wlen = (nw > 0) & (3 * nw <= total) & (total <= 10 * nw)
        r_symbol = 10 * nsym <= nw
        r_bullet = 10 * nbul <= 9 * nl
        r_ellipsis = 10 * nell <= 3 * nl
        r_alpha = 5 * nalpha >= 4 * nw
        r_stop = nstop >= 2
        passes = (r_wc & r_wlen & r_symbol & r_bullet & r_ellipsis
                  & r_alpha & r_stop)
        return pa.table({
            "doc_id": t["doc_id"],
            "n_words": pa.array(nw.astype(np.int64), pa.int64()),
            "n_lines": pa.array(nl.astype(np.int64), pa.int64()),
            "rule_wc": pa.array(r_wc), "rule_wlen": pa.array(r_wlen),
            "rule_symbol": pa.array(r_symbol),
            "rule_bullet": pa.array(r_bullet),
            "rule_ellipsis": pa.array(r_ellipsis),
            "rule_alpha": pa.array(r_alpha),
            "rule_stop": pa.array(r_stop),
            "passes": pa.array(passes)})

    def scalar_call(self, t: pa.Table) -> pa.Table:
        cols: dict[str, list] = {k: [] for k in (
            "n_words", "n_lines", "rule_wc", "rule_wlen", "rule_symbol",
            "rule_bullet", "rule_ellipsis", "rule_alpha", "rule_stop")}
        for x in t["text"].to_pylist():
            x = x or ""
            words = self.word_re.findall(x)
            nw = len(words)
            total = sum(len(w) for w in words)
            lines = x.split("\n")
            nl = len(lines)
            nsym = x.count("#") + x.count("...")
            nbul = sum(l.startswith(("-", "*", "•")) for l in lines)
            nell = sum(l.endswith("...") for l in lines)
            nalpha = sum(bool(self.alpha_re.search(w)) for w in words)
            nstop = len(set(self.tokens(x)) & set(_GOPHER_STOPS))
            cols["n_words"].append(nw)
            cols["n_lines"].append(nl)
            cols["rule_wc"].append(50 <= nw <= 100_000)
            cols["rule_wlen"].append(nw > 0
                                     and 3 * nw <= total <= 10 * nw)
            cols["rule_symbol"].append(10 * nsym <= nw)
            cols["rule_bullet"].append(10 * nbul <= 9 * nl)
            cols["rule_ellipsis"].append(10 * nell <= 3 * nl)
            cols["rule_alpha"].append(5 * nalpha >= 4 * nw)
            cols["rule_stop"].append(nstop >= 2)
        passes = [all(v[i] for k, v in cols.items()
                      if k.startswith("rule_"))
                  for i in range(len(t))]
        out = {"doc_id": t["doc_id"],
               "n_words": pa.array(cols["n_words"], pa.int64()),
               "n_lines": pa.array(cols["n_lines"], pa.int64())}
        for k in ("rule_wc", "rule_wlen", "rule_symbol", "rule_bullet",
                  "rule_ellipsis", "rule_alpha", "rule_stop"):
            out[k] = pa.array(cols[k], pa.bool_())
        out["passes"] = pa.array(passes, pa.bool_())
        return pa.table(out)


def gopher_rules_documents(sf_dir: str):
    """Gopher quality rules per doc — see the block comment above."""
    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        GopherRulesStage(), batch_format="pyarrow")


GOPHER_SQL = f"""
WITH d AS (SELECT doc_id, coalesce(text, '') AS t FROM documents),
f AS (
  SELECT doc_id, t,
         regexp_extract_all(t, '{_GOPHER_WORD_PATTERN}') AS words,
         str_split(t, chr(10)) AS lines
  FROM d),
m AS (
  SELECT doc_id,
    len(words) AS nw,
    len(lines) AS nl,
    coalesce(list_sum(list_transform(words, x -> length(x))), 0)
      AS total,
    (len(t) - len(replace(t, '#', '')))
      + (len(t) - len(replace(t, '...', ''))) // 3 AS nsym,
    coalesce(list_sum(list_transform(lines,
      l -> CASE WHEN l LIKE '-%' OR l LIKE '*%' OR l LIKE '•%'
                THEN 1 ELSE 0 END)), 0) AS nbul,
    coalesce(list_sum(list_transform(lines,
      l -> CASE WHEN l LIKE '%...' THEN 1 ELSE 0 END)), 0) AS nell,
    coalesce(list_sum(list_transform(words,
      x -> CASE WHEN regexp_matches(x, '[a-zA-Z]')
                THEN 1 ELSE 0 END)), 0) AS nalpha,
    len(list_intersect(
          list_distinct(regexp_extract_all(lower(t), '{TOKEN_PATTERN}')),
          {list(_GOPHER_STOPS)})) AS nstop
  FROM f)
SELECT doc_id,
  nw AS n_words, nl AS n_lines,
  (nw BETWEEN 50 AND 100000) AS rule_wc,
  (nw > 0 AND 3 * nw <= total AND total <= 10 * nw) AS rule_wlen,
  (10 * nsym <= nw) AS rule_symbol,
  (10 * nbul <= 9 * nl) AS rule_bullet,
  (10 * nell <= 3 * nl) AS rule_ellipsis,
  (5 * nalpha >= 4 * nw) AS rule_alpha,
  (nstop >= 2) AS rule_stop,
  ((nw BETWEEN 50 AND 100000)
   AND (nw > 0 AND 3 * nw <= total AND total <= 10 * nw)
   AND (10 * nsym <= nw) AND (10 * nbul <= 9 * nl)
   AND (10 * nell <= 3 * nl) AND (5 * nalpha >= 4 * nw)
   AND (nstop >= 2)) AS passes
FROM m
"""


PASSAGE_LEN = 8


def _stride_windows(toks: list[str]) -> list[str]:
    """THE engine-side window definition (non-overlapping
    {PASSAGE_LEN}-token windows, trailing partial dropped) — must stay
    in lockstep with the shared SQL ``pas`` CTE; passage dedup and the
    contamination check both build on it."""
    return [" ".join(toks[lo:lo + PASSAGE_LEN])
            for lo in range(0, len(toks) - PASSAGE_LEN + 1,
                            PASSAGE_LEN)]


def _stride_window_hashes(col):
    """(didx, h) of every non-overlapping {PASSAGE_LEN}-token window —
    the vectorized (hashed) form of :func:`_stride_windows`, one
    stride-{PASSAGE_LEN} kernel fold per batch."""
    from mee_ray.pipelines.gramhash import (gram_hash64, token_hash64,
                                            tokenize_flat)
    flat, _, lens = tokenize_flat(col, mode="regex")
    th = token_hash64(flat)
    didx, _, h = gram_hash64(th, lens, PASSAGE_LEN,
                             stride=PASSAGE_LEN)
    return didx, h


def passage_dedup_documents(sf_dir: str):
    """Cross-document passage-level exact dedup (the CCNet /
    RefinedWeb paragraph-dedup shape, adapted to this corpus's flat
    token streams): each document splits into consecutive
    non-overlapping {PASSAGE_LEN}-token windows (trailing partial
    windows dropped), windows are exact-matched CORPUS-WIDE, and each
    doc reports how many of its passages occur more than once
    anywhere.  Output (doc_id, n_passages, n_dup_passages) — pure
    integer counts, so the oracle compare is exact.

    Shape at scale: explode → groupby(passage) count → co-partitioned
    hash join back on passage → per-doc re-aggregate.  The exploded
    stream feeds two consumers and is recomputed rather than
    materialized (tokenize is cheap; a corpus-sized mid-pipeline
    materialization is not).  The join key is a 64-bit rolling window
    hash (the gramhash kernel, vectorized explode, fixed-width
    exchange records); counts are identical to string keys up to
    64-bit collisions (which only mark one extra window duplicated).
    The retired string-key path's output is frozen as
    tests/golden/passage_dedup_sf0001.parquet, still asserted
    bit-identical in test_gramhash.py."""
    import ray
    from ray.data.aggregate import Count, Sum

    def explode_hashed(t: pa.Table) -> pa.Table:
        didx, h = _stride_window_hashes(t["text"])
        dids = t["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table({"doc_id": pa.array(dids[didx], pa.int64()),
                         "passage": pa.array(h, pa.int64())})

    def passages(): return (_read_docs(sf_dir, ["doc_id", "text"])
                            .map_batches(explode_hashed,
                                         batch_format="pyarrow",
                                         zero_copy_batch=True))

    counts = passages().groupby("passage").aggregate(
        Count(alias_name="c"))
    cpus = int(ray.cluster_resources().get("CPU", 8))
    joined = passages().join(
        counts, join_type="inner",
        num_partitions=max(2, cpus // 2),
        on=("passage",),
        aggregator_ray_remote_args={"num_cpus": 0.5})

    def per_doc_partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        dup = pc.cast(pc.greater(t["c"], pa.scalar(1)), pa.int64())
        part = pa.table({"doc_id": t["doc_id"], "dup": dup})
        g = part.group_by("doc_id").aggregate(
            [("dup", "count"), ("dup", "sum")])
        return g.rename_columns(["doc_id", "n_part", "dup_part"])

    agg = (joined.map_batches(per_doc_partial, batch_format="pyarrow")
           .groupby("doc_id")
           .aggregate(Sum("n_part", alias_name="n_passages"),
                      Sum("dup_part", alias_name="n_dup_passages")))

    def finish(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return pa.table({
            "doc_id": t["doc_id"],
            "n_passages": pc.cast(t["n_passages"], pa.int64()),
            "n_dup_passages": pc.cast(t["n_dup_passages"], pa.int64())})

    return agg.map_batches(finish, batch_format="pyarrow")


PASSAGE_DEDUP_SQL = f"""
WITH tokl AS (
  SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_PATTERN}') AS ts
  FROM documents),
tok AS (SELECT doc_id, unnest(ts) AS term,
               generate_subscripts(ts, 1) AS i FROM tokl),
pas AS (
  SELECT doc_id, (i - 1) // {PASSAGE_LEN} AS w,
         string_agg(term, ' ' ORDER BY i) AS passage
  FROM tok GROUP BY doc_id, (i - 1) // {PASSAGE_LEN}
  HAVING count(*) = {PASSAGE_LEN}),
cnt AS (SELECT passage, count(*) AS c FROM pas GROUP BY passage)
SELECT p.doc_id, count(*) AS n_passages,
       CAST(sum(CASE WHEN cnt.c > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dup_passages
FROM pas p JOIN cnt ON cnt.passage = p.passage
GROUP BY p.doc_id
"""


def contamination_check_documents(sf_dir: str):
    """Benchmark-contamination check (the decontamination step of a
    training-data pipeline): the "benchmark set" is the first
    {PASSAGE_LEN}-token window of every doc with doc_id % 97 == 0
    (a deterministic stand-in for an eval suite); every document
    reports how many of its stride-{PASSAGE_LEN} windows appear in
    that set.  Benchmark windows broadcast ONCE via ray.put (eval
    suites are small by nature); the corpus-side scan is one
    map_batches pass — no shuffle at all.  Emits (doc_id,
    n_contaminated) for contaminated docs only.

    Windows are 64-bit kernel hashes — the broadcast set is
    8 B/window and the scan is a vectorized sorted-array membership
    probe (np.searchsorted), no Python per row; identical to string
    windows up to hash collisions.  The retired string-set loop's
    output is frozen as tests/golden/contamination_sf0001.parquet,
    still asserted bit-identical in test_gramhash.py."""
    import ray

    def bench_windows_h(t: pa.Table) -> pa.Table:
        didx, h = _stride_window_hashes(t["text"])
        dids = t["doc_id"].to_numpy(zero_copy_only=False)
        # first window per doc = the row where a doc index first
        # appears (windows are emitted in-document order)
        first = np.ones(len(didx), dtype=bool)
        first[1:] = didx[1:] != didx[:-1]
        keep = first & (dids[didx] % 97 == 0)
        return pa.table({"passage": pa.array(h[keep], pa.int64())})

    bench_arr = np.unique(np.concatenate(
        [b["passage"].to_numpy(zero_copy_only=False)
         for b in (_read_docs(sf_dir, ["doc_id", "text"])
                   .map_batches(bench_windows_h,
                                batch_format="pyarrow",
                                zero_copy_batch=True)
                   .iter_batches(batch_format="pyarrow"))]
        or [np.zeros(0, np.int64)]))
    bench_ref = ray.put(bench_arr)

    def scan_h(t: pa.Table) -> pa.Table:
        ba = ray.get(bench_ref)
        didx, h = _stride_window_hashes(t["text"])
        dids = t["doc_id"].to_numpy(zero_copy_only=False)
        if len(ba) and len(h):
            pos = np.searchsorted(ba, h)
            hit = ba[np.clip(pos, 0, len(ba) - 1)] == h
        else:
            hit = np.zeros(len(h), dtype=bool)
        n = np.bincount(didx[hit], minlength=len(t)) \
            if hit.any() else np.zeros(len(t), np.int64)
        nz = np.flatnonzero(n)
        return pa.table({"doc_id": pa.array(dids[nz], pa.int64()),
                         "n_contaminated": pa.array(
                             n[nz].astype(np.int64), pa.int64())})

    return (_read_docs(sf_dir, ["doc_id", "text"])
            .map_batches(scan_h, batch_format="pyarrow",
                         zero_copy_batch=True))


CONTAMINATION_SQL = f"""
WITH tokl AS (
  SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_PATTERN}') AS ts
  FROM documents),
tok AS (SELECT doc_id, unnest(ts) AS term,
               generate_subscripts(ts, 1) AS i FROM tokl),
pas AS (
  SELECT doc_id, (i - 1) // {PASSAGE_LEN} AS w,
         string_agg(term, ' ' ORDER BY i) AS passage
  FROM tok GROUP BY doc_id, (i - 1) // {PASSAGE_LEN}
  HAVING count(*) = {PASSAGE_LEN}),
bench AS (SELECT DISTINCT passage FROM pas
          WHERE doc_id % 97 = 0 AND w = 0)
SELECT p.doc_id, count(*) AS n_contaminated
FROM pas p JOIN bench b ON b.passage = p.passage
GROUP BY p.doc_id
"""


SPAN_GRAM = 12
_SPAN_BUCKETS = 512      # gram-hash buckets: sized so one bucket's
                         # windows fit a worker; scale with the cluster


def substring_dedup_spans_documents(sf_dir: str):
    """Exact substring-level dedup spans (the suffix-array dedup shape
    of Lee et al., "Deduplicating Training Data Makes Language Models
    Better", arXiv:2107.06499, approximated with fixed-length rolling
    windows — the standard distributed relaxation): every OVERLAPPING
    {SPAN_GRAM}-token window is exact-matched corpus-wide; windows
    occurring more than once anywhere mark their start positions
    duplicated, and per doc the surviving positions merge into maximal
    spans (two windows merge when their starts differ by ≤ {SPAN_GRAM},
    i.e. overlapping or exactly adjacent).  Output one row per maximal
    duplicated span: (doc_id, span_start, span_end, n_windows) with
    1-based token offsets, span_end one past the last covered token —
    the ranges a dedup pass would cut before training.

    Shape at scale: explode → ONE gram-bucketed shuffle (bucket =
    crc32(gram) % {_SPAN_BUCKETS}) → per-bucket VECTORIZED dup filter
    (sort + run-length, the minhash-verify half-row-bucket implicit
    semi-join — same-gram rows are co-located by construction, so no
    join operator and no second exchange) → per-doc island merge in
    map_groups (vectorized; per-group state is one position array).

    The shuffle key is a 64-bit rolling gram hash (the
    :mod:`mee_ray.pipelines.gramhash` kernel — Arrow tokenize, one
    SipHash per unique token, FNV window fold), so only
    (doc_id, pos, ghash int64, bucket) rows cross the exchange
    instead of {SPAN_GRAM}-token gram STRINGS (~8× text
    amplification), and the explode is fully vectorized.  Hash keys
    mark the same window positions as string keys up to 64-bit
    collisions (at worst one extra start); the retired string-key
    path's output is frozen as
    tests/golden/substring_spans_sf0001.parquet, still asserted
    bit-identical in test_gramhash.py."""

    def explode_hashed(t: pa.Table) -> pa.Table:
        from mee_ray.pipelines.gramhash import (gram_hash64, mix64,
                                                token_hash64,
                                                tokenize_flat)
        flat, _, lens = tokenize_flat(t["text"], mode="regex")
        th = token_hash64(flat)
        didx, pos, g = gram_hash64(th, lens, SPAN_GRAM)
        dids = t["doc_id"].to_numpy(zero_copy_only=False)
        bucket = (mix64(g) % np.uint64(_SPAN_BUCKETS)).astype(np.int64)
        return pa.table({"doc_id": pa.array(dids[didx], pa.int64()),
                         "pos": pa.array(pos + 1, pa.int64()),
                         "gram": pa.array(g, pa.int64()),
                         "bucket": pa.array(bucket)})

    def dup_filter(g: pa.Table) -> pa.Table:
        # int64 gram keys: np.unique is a radix-ish C sort.
        grams = g["gram"].to_numpy(zero_copy_only=False)
        _, inv, cnt = np.unique(grams, return_inverse=True,
                                return_counts=True)
        keep = cnt[inv] > 1
        return pa.table({"doc_id": g["doc_id"].filter(pa.array(keep)),
                         "pos": g["pos"].filter(pa.array(keep))})

    joined = (_read_docs(sf_dir, ["doc_id", "text"])
              .map_batches(explode_hashed,
                           batch_format="pyarrow",
                           zero_copy_batch=True)
              .groupby("bucket")
              .map_groups(dup_filter, batch_format="pyarrow"))

    def merge(g: pa.Table) -> pa.Table:
        pos = np.sort(g["pos"].to_numpy(zero_copy_only=False))
        brk = np.empty(len(pos), dtype=bool)
        brk[0] = True
        brk[1:] = (pos[1:] - pos[:-1]) > SPAN_GRAM
        heads = np.nonzero(brk)[0]
        starts = pos[heads]
        ends = pos[np.append(heads[1:] - 1, len(pos) - 1)] + SPAN_GRAM
        nwin = np.diff(np.append(heads, len(pos)))
        did = np.full(len(starts), g["doc_id"][0].as_py(), np.int64)
        return pa.table({"doc_id": pa.array(did),
                         "span_start": pa.array(starts.astype(np.int64)),
                         "span_end": pa.array(ends.astype(np.int64)),
                         "n_windows": pa.array(nwin.astype(np.int64))})

    return (joined.select_columns(["doc_id", "pos"])
            .groupby("doc_id")
            .map_groups(merge, batch_format="pyarrow"))


SUBSTRING_SPANS_SQL = f"""
WITH tokl AS (
  SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_PATTERN}') AS ts
  FROM documents),
winpos AS (
  SELECT doc_id, ts,
         unnest(range(1, greatest(len(ts) - {SPAN_GRAM} + 2, 1))) AS pos
  FROM tokl),
win AS (
  SELECT doc_id, pos,
         array_to_string(list_slice(ts, pos, pos + {SPAN_GRAM} - 1), ' ')
           AS gram
  FROM winpos),
dupg AS (SELECT gram FROM win GROUP BY gram HAVING count(*) > 1),
dup AS (SELECT w.doc_id, w.pos FROM win w JOIN dupg USING (gram)),
brk AS (
  SELECT doc_id, pos,
         CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                   > {SPAN_GRAM} THEN 1 ELSE 0 END AS b
  FROM dup),
grp AS (SELECT doc_id, pos,
               sum(b) OVER (PARTITION BY doc_id ORDER BY pos) AS g
        FROM brk)
SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start,
       CAST(max(pos) + {SPAN_GRAM} AS BIGINT) AS span_end,
       CAST(count(*) AS BIGINT) AS n_windows
FROM grp GROUP BY doc_id, g ORDER BY doc_id, span_start
"""


LM_SAMPLE_DOCS = 2048
LM_ADD_K = 0.5


def lm_score_documents(sf_dir: str):
    """Perplexity-style LM quality scoring (the KenLM-filter shape of
    a training-data pipeline, with a deterministic in-repo model): a
    bigram model with add-{LM_ADD_K} smoothing is fit on a BOUNDED
    unbiased hash-rank sample ({LM_SAMPLE_DOCS} docs — the model never sees the
    full corpus), broadcast once via ray.put, and every document gets
    its mean bigram log-probability in one map_batches pass.  Output
    (doc_id, n_bigrams, lm_logprob) — rows-only by design (float ln);
    exactness vs a driver-side recompute and monotonicity invariants
    are asserted in tests."""
    import ray

    from mee_ray.pipelines.sampling import hash_sample

    st = TextStats()
    sample = hash_sample(_read_docs(sf_dir, ["doc_id", "text"]),
                         LM_SAMPLE_DOCS, "doc_id")
    big: dict[tuple[str, str], int] = {}
    uni: dict[str, int] = {}
    for x in sample["text"].to_pylist():
        toks = st.tokens(x)
        for a, b in zip(toks, toks[1:]):
            big[(a, b)] = big.get((a, b), 0) + 1
            uni[a] = uni.get(a, 0) + 1
    vsize = max(1, len({t for x in sample["text"].to_pylist()
                        for t in st.tokens(x)}))
    model_ref = ray.put((big, uni, vsize))

    def score(t: pa.Table) -> pa.Table:
        bg, ug, v = ray.get(model_ref)
        out_d, out_n, out_s = [], [], []
        for d, x in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            toks = st.tokens(x)
            pairs = list(zip(toks, toks[1:]))
            if not pairs:
                continue
            lp = float(np.sum(np.log(
                np.array([bg.get(pr, 0) + LM_ADD_K for pr in pairs])
                / np.array([ug.get(pr[0], 0) + LM_ADD_K * v
                            for pr in pairs]))))
            out_d.append(d); out_n.append(len(pairs))
            out_s.append(lp / len(pairs))
        return pa.table({"doc_id": pa.array(out_d, pa.int64()),
                         "n_bigrams": pa.array(out_n, pa.int64()),
                         "lm_logprob": pa.array(out_s, pa.float64())})

    return (_read_docs(sf_dir, ["doc_id", "text"])
            .map_batches(score, batch_format="pyarrow",
                         zero_copy_batch=True))


# ------------------------------------------------ BPE tokenizer fit --

BPE_SAMPLE_DOCS = 1024
BPE_MERGES = 64
_BPE_EOW = "</w>"


def _fit_bpe(word_freq: dict) -> list:
    """Classic BPE fit (Sennrich et al. 2016) on a word-frequency
    table: repeatedly merge the most frequent adjacent symbol pair,
    ties broken by the lexicographically SMALLEST pair, so the merge
    list is fully deterministic."""
    vocab = {tuple(w) + (_BPE_EOW,): c for w, c in word_freq.items()}
    merges = []
    for _ in range(BPE_MERGES):
        pairs: dict = {}
        for sym, c in vocab.items():
            for pr in zip(sym, sym[1:]):
                pairs[pr] = pairs.get(pr, 0) + c
        if not pairs:
            break
        top = max(pairs.values())
        best = min(p for p, c in pairs.items() if c == top)
        merges.append(best)
        a, b = best
        new: dict = {}
        for sym, c in vocab.items():
            out, i = [], 0
            while i < len(sym):
                if (i + 1 < len(sym) and sym[i] == a
                        and sym[i + 1] == b):
                    out.append(a + b)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            key = tuple(out)
            new[key] = new.get(key, 0) + c
        vocab = new
    return merges


def _bpe_encode_len(word: str, ranks: dict, cache: dict) -> int:
    """Token count of one word under the fitted merges: repeatedly
    apply the LOWEST-RANK applicable merge (all its occurrences,
    left to right) — the standard greedy BPE encoder.  Memoized per
    stage instance (words repeat heavily — the ST1 script-cache
    pattern)."""
    n = cache.get(word)
    if n is not None:
        return n
    sym = list(word) + [_BPE_EOW]
    while len(sym) > 1:
        best_r, best_p = None, None
        for pr in zip(sym, sym[1:]):
            r = ranks.get(pr)
            if r is not None and (best_r is None or r < best_r):
                best_r, best_p = r, pr
        if best_p is None:
            break
        a, b = best_p
        out, i = [], 0
        while i < len(sym):
            if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(sym[i])
                i += 1
        sym = out
    cache[word] = len(sym)
    return len(sym)


class BPEStage:
    """Actor-pool apply stage: tokenizer regex + merge-rank table set
    up once per ACTOR in __init__, and the word→token-length memo
    lives for the actor's lifetime (the ST1 script-cache pattern in
    its actor form — words repeat heavily, so the greedy encoder runs
    once per distinct word per actor, not per batch)."""

    def __init__(self, ranks: dict):
        self.st = TextStats()
        self.ranks = ranks
        self.cache: dict = {}

    def __call__(self, t: pa.Table) -> pa.Table:
        out_d, out_w, out_t, out_c = [], [], [], []
        for d, x in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            toks = self.st.tokens(x)
            out_d.append(d)
            out_w.append(len(toks))
            out_t.append(sum(_bpe_encode_len(w, self.ranks, self.cache)
                             for w in toks))
            out_c.append(sum(len(w) for w in toks))
        return pa.table({"doc_id": pa.array(out_d, pa.int64()),
                         "n_words": pa.array(out_w, pa.int64()),
                         "n_bpe_tokens": pa.array(out_t, pa.int64()),
                         "n_chars": pa.array(out_c, pa.int64())})


def bpe_tokenize_documents(sf_dir: str):
    """Tokenizer FITTING + distributed apply — the train-a-BPE-vocab
    step of a training-data pipeline: fit {BPE_MERGES} merges on a
    BOUNDED {BPE_SAMPLE_DOCS}-doc unbiased hash-rank sample (deterministic count-
    then-lexicographic tie-break), ship the small merge table into an
    actor-pool :class:`BPEStage` (state built once per actor), then
    one streaming pass counts each doc's BPE tokens.  Output (doc_id,
    n_words, n_bpe_tokens, n_chars) — rows-only by design (BPE is not
    SQL-expressible); exactness vs a driver-side recompute and
    compression invariants (n_words ≤ n_bpe_tokens ≤ n_chars +
    n_words) are asserted in tests."""
    import ray

    from mee_ray.pipelines.sampling import hash_sample

    st = TextStats()
    sample = hash_sample(_read_docs(sf_dir, ["doc_id", "text"]),
                         BPE_SAMPLE_DOCS, "doc_id")
    wf: dict = {}
    for x in sample["text"].to_pylist():
        for w in st.tokens(x):
            wf[w] = wf.get(w, 0) + 1
    ranks = {p: i for i, p in enumerate(_fit_bpe(wf))}

    cpus = int(ray.cluster_resources().get("CPU", 8))
    return (_read_docs(sf_dir, ["doc_id", "text"])
            .map_batches(BPEStage, fn_constructor_args=(ranks,),
                         concurrency=max(2, cpus // 4),
                         batch_format="pyarrow", zero_copy_batch=True))


# ------------------------------------------- weighted mixture sample --
#
# Training-mix construction (the "sample 30% of web, 70% of code"
# step of LLM data pipelines) as a DETERMINISTIC per-row decision:
# keep a doc iff (doc_id * KNUTH_MULT) % MIX_MOD < rate(source).
# Multiplicative hashing makes the choice parallelism-, retry- and
# batch-boundary-invariant (same discipline as stratified_sample),
# and — unlike an RNG — SQL-expressible, so the driver hash-checks
# the exact sampled set.

KNUTH_MULT = 2654435761  # Knuth's multiplicative-hash constant
MIX_MOD = 1000


def _mix_rate_expr() -> str:
    """rate(source) in ‰, derived from the source's numeric suffix —
    five mixture tiers 100‰..700‰.  SQL mirror of _mix_rates."""
    return f"100 + 150 * (CAST(substr(source, 4) AS BIGINT) % 5)"


def training_mix_sample(sf_dir: str):
    """Weighted mixture sampling across sources: each source srcN is
    sampled at 100+150·(N mod 5) per mille by a deterministic
    multiplicative hash of doc_id — one streaming map_batches pass, no
    shuffle, no RNG state."""
    import ray.data

    def sample(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        src_num = np.array([int(s[3:]) for s in
                            t["source"].to_pylist()], dtype=np.int64)
        rate = 100 + 150 * (src_num % 5)
        # pre-reduce mod MIX_MOD before the multiply (congruent, same
        # sample) so intermediates stay bounded at any id magnitude —
        # the stratified-sample / random-sampler / geo-key discipline
        h = ((ids % MIX_MOD) * KNUTH_MULT) % MIX_MOD
        keep = h < rate
        kept = t.filter(pa.array(keep))
        return pa.table({"doc_id": kept["doc_id"],
                         "source": kept["source"],
                         "rate_pml": pa.array(rate[keep], pa.int64())})

    return (ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                  columns=["doc_id", "source"])
            .map_batches(sample, batch_format="pyarrow",
                         zero_copy_batch=True))


TRAINING_MIX_SQL = f"""
SELECT doc_id, source,
       {_mix_rate_expr()} AS rate_pml
FROM documents
WHERE ((doc_id % {MIX_MOD}) * {KNUTH_MULT}) % {MIX_MOD} < {_mix_rate_expr()}
"""


# ----------------------------------- temperature mixture sampling --

def temperature_mix_documents(sf_dir: str):
    """Temperature-based mixture sampling (the multilingual α-sampling
    rule, α = 0.5): per-doc acceptance rate ∝ 1/√count(source), so the
    SELECTED mass per source ∝ count^α — rare sources are kept whole
    (the rarest gets exactly 1000‰), abundant ones downsampled.  Exact
    despite the irrational √: IEEE-754 sqrt is CORRECTLY ROUNDED in
    both numpy and DuckDB, so w_s = floor(10⁶·√c_s) is the same int64
    on both sides, and every step after it is integer arithmetic
    (rate = (1000·w_min) // w_s; selection = the training_mix Knuth
    hash).  The stratum is LANG (the multilingual use case — and the
    corpus's lang counts are skewed where its source counts are
    uniform, so the rule actually downsamples).  Shape: one bounded
    per-lang count groupby (≤ |langs| rows to the driver), rates
    broadcast in the batch closure, one streaming filter pass — no
    corpus-sized exchange."""
    import math

    import ray.data
    from ray.data.aggregate import Count

    counts = (ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                    columns=["lang"])
              .groupby("lang").aggregate(Count(alias_name="c")))
    w = {r["lang"]: int(math.floor(1_000_000 * math.sqrt(r["c"])))
         for r in counts.take_all()}       # bounded by |langs|
    wmin = min(w.values())
    rates = {s: min(1000, (1000 * wmin) // ws) for s, ws in w.items()}

    def sample(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        rate = np.array([rates[s] for s in t["lang"].to_pylist()],
                        dtype=np.int64)
        h = ((ids % MIX_MOD) * KNUTH_MULT) % MIX_MOD
        keep = h < rate
        kept = t.filter(pa.array(keep))
        return pa.table({"doc_id": kept["doc_id"],
                         "lang": kept["lang"],
                         "rate_pml": pa.array(rate[keep], pa.int64())})

    return (ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                  columns=["doc_id", "lang"])
            .map_batches(sample, batch_format="pyarrow",
                         zero_copy_batch=True))


TEMPERATURE_MIX_SQL = f"""
WITH counts AS (SELECT lang, count(*) AS c FROM documents
                GROUP BY lang),
w AS (SELECT lang, CAST(floor(1000000 * sqrt(c)) AS BIGINT) AS w
      FROM counts),
wm AS (SELECT min(w) AS wmin FROM w),
rates AS (SELECT lang,
                 least(1000, (1000 * wm.wmin) // w.w) AS rate_pml
          FROM w, wm)
SELECT d.doc_id, d.lang, r.rate_pml
FROM documents d JOIN rates r USING (lang)
WHERE ((d.doc_id % {MIX_MOD}) * {KNUTH_MULT}) % {MIX_MOD} < r.rate_pml
"""


# --------------------------------------- seeded training shuffle --
#
# Deterministic seeded global shuffle — the ordering op a training
# run needs so every retry/restart reads examples in the SAME
# pseudo-random order without any RNG state or driver-side pass.
# The shuffle ORDER is (shard asc, shard_pos asc): shard is a hash
# bucket of the shuffle key (≙ one output training shard), shard_pos
# the rank inside it.  At 100 TB the shard count is sized so one
# shard's ids fit a worker (the only partitioning assumption); the
# key pass is a streaming map_batches and the ranking one hash
# groupby — no global sort, no driver state.

SHUFFLE_MULT = 0x9E3779B97F4A7C15   # splitmix64 golden-ratio constant
SHUFFLE_SEED = 42
SHUFFLE_SHARDS = 64
_U64 = 1 << 64
_I63 = (1 << 63) - 1


def training_shuffle_order(sf_dir: str, seed: int = SHUFFLE_SEED):
    """Seeded deterministic shuffle order over the documents table:
    ``shuffle_key = ((doc_id + seed) · SHUFFLE_MULT) mod 2⁶⁴``
    (odd-constant multiplication is a bijection mod 2⁶⁴, so keys are
    unique per seed), truncated to int63 for Arrow/SQL dtype parity;
    ``shard = key % SHUFFLE_SHARDS``; ``shard_pos`` = rank within the
    shard by (key, doc_id) — doc_id breaks the (rare) truncation
    ties, keeping the order total and retry-stable."""
    import ray.data

    def keyed(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        k = ((ids.astype(np.uint64) + np.uint64(seed))
             * np.uint64(SHUFFLE_MULT)) & np.uint64(_I63)
        k = k.astype(np.int64)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "shuffle_key": pa.array(k, pa.int64()),
            "shard": pa.array(k % SHUFFLE_SHARDS, pa.int64())})

    def rank_shard(g: pa.Table) -> pa.Table:
        ids = g["doc_id"].to_numpy(zero_copy_only=False)
        keys = g["shuffle_key"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, keys))
        pos = np.empty(len(order), dtype=np.int64)
        pos[order] = np.arange(1, len(order) + 1)
        return g.append_column("shard_pos", pa.array(pos, pa.int64()))

    return (ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                  columns=["doc_id"])
            .map_batches(keyed, batch_format="pyarrow",
                         zero_copy_batch=True)
            .groupby("shard")
            .map_groups(rank_shard, batch_format="pyarrow"))


# HUGEINT arithmetic mirrors numpy's uint64 wrap exactly: the product
# of two < 2⁶⁴ values fits in 128 bits, mod 2⁶⁴ recovers the wrapped
# value, and the int63 mask is one more mod.
TRAINING_SHUFFLE_SQL = f"""
WITH k AS (
  SELECT doc_id,
         CAST(((CAST(doc_id AS HUGEINT) + {SHUFFLE_SEED})
               * {SHUFFLE_MULT}) % {_U64} % {1 << 63} AS BIGINT)
           AS shuffle_key
  FROM documents)
SELECT doc_id, shuffle_key,
       shuffle_key % {SHUFFLE_SHARDS} AS shard,
       row_number() OVER (PARTITION BY shuffle_key % {SHUFFLE_SHARDS}
                          ORDER BY shuffle_key, doc_id) AS shard_pos
FROM k
"""


# ------------------------------------------ Bloom-filter membership --
#
# URL/document seen-set at 100-TB scale: the seen side is folded into
# a fixed-size bit array (per-batch partial Bloom filters OR-merged on
# the driver — a Bloom filter's bitwise OR is exact), broadcast once,
# and the probe side streams through map_batches.  No false negatives
# ever; false-positive rate set by BLOOM_BITS/BLOOM_HASHES.  No SQL
# oracle (bit-level hashing); tests/test_pipelines.py checks the
# no-false-negative invariant and the FP bound against exact sets.

BLOOM_BITS = 1 << 17   # 16 KiB filter
BLOOM_HASHES = 5


def _bloom_positions(ids: "np.ndarray") -> "np.ndarray":
    """(n, BLOOM_HASHES) bit positions via double hashing
    h1 + i*h2 — the standard Kirsch-Mitzenmacher construction."""
    h1 = (ids * KNUTH_MULT) & 0xFFFFFFFFFFFFFFFF
    h2 = (ids * 0x9E3779B97F4A7C15 + 1) & 0xFFFFFFFFFFFFFFFF
    i = np.arange(BLOOM_HASHES, dtype=np.uint64)
    return ((h1[:, None] + i[None, :] * h2[:, None])
            % BLOOM_BITS).astype(np.int64)


def bloom_build(ds) -> "np.ndarray":
    """Fold a Dataset's doc_id column into one Bloom bit array:
    per-batch partial filters (each a {BLOOM_BITS}-bit array), exact
    bitwise-OR merge on the driver — the merge order is irrelevant,
    so retries/parallelism can't change the filter."""
    bits = np.zeros(BLOOM_BITS, dtype=bool)
    for b in ds.map_batches(
            lambda t: pa.table({"pos": pa.array(np.unique(
                _bloom_positions(t["doc_id"].to_numpy(
                    zero_copy_only=False).astype(np.uint64))),
                pa.int64())}),
            batch_format="pyarrow",
            zero_copy_batch=True).iter_batches(batch_format="pyarrow"):
        bits[b["pos"].to_numpy(zero_copy_only=False)] = True
    return bits


def bloom_membership_documents(sf_dir: str):
    """Bloom-filter seen-set probe: even doc_ids play the
    'already-crawled' set (folded into a broadcast Bloom filter), odd
    doc_ids are probed in a streaming pass.  Emits per-source counts
    of probed / flagged-seen docs.  Flagged-seen on this disjoint
    probe set = false positives, so the output doubles as a live FP
    measurement."""
    import ray
    import ray.data

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "source"])
    seen = docs.map_batches(
        lambda t: t.filter(pc.equal(pc.bit_wise_and(t["doc_id"], 1), 0)),
        batch_format="pyarrow", zero_copy_batch=True)
    bits_ref = ray.put(bloom_build(seen))

    def probe(t: pa.Table) -> pa.Table:
        bits = ray.get(bits_ref)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        odd = ids % 2 == 1
        t = t.filter(pa.array(odd))
        if t.num_rows == 0:
            return pa.table({"source": pa.array([], pa.string()),
                             "n_probed": pa.array([], pa.int64()),
                             "n_flagged": pa.array([], pa.int64())})
        pos = _bloom_positions(
            t["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64))
        hit = bits[pos].all(axis=1)
        part = pa.table({"source": t["source"],
                         "one": pa.array(np.ones(t.num_rows, np.int64)),
                         "hit": pa.array(hit.astype(np.int64))})
        g = part.group_by("source").aggregate(
            [("one", "sum"), ("hit", "sum")])
        return g.rename_columns(["source", "n_probed", "n_flagged"])

    parts = docs.map_batches(probe, batch_format="pyarrow",
                             zero_copy_batch=True)
    acc: dict[str, list[int]] = {}
    for b in parts.iter_batches(batch_format="pyarrow"):
        for s, n, f in zip(b["source"].to_pylist(),
                           b["n_probed"].to_pylist(),
                           b["n_flagged"].to_pylist()):
            cur = acc.setdefault(s, [0, 0])
            cur[0] += n
            cur[1] += f
    srcs = sorted(acc)
    return pa.table({
        "source": pa.array(srcs, pa.string()),
        "n_probed": pa.array([acc[s][0] for s in srcs], pa.int64()),
        "n_flagged": pa.array([acc[s][1] for s in srcs], pa.int64())})


# ------------------------------------------- sequence chunking -------

CHUNK_TOKENS = 64      # window length (tokens)
CHUNK_OVERLAP = 16     # tokens shared between consecutive windows


def chunk_documents(sf_dir: str):
    """Fixed-size token chunking with overlap — the
    context-window / training-sequence packing step of an LLM data
    pipeline: each document yields windows of ``CHUNK_TOKENS`` tokens
    at stride ``CHUNK_TOKENS - CHUNK_OVERLAP`` (the final window may
    be short; empty docs yield nothing).  One streamed map_batches
    pass, rows fan out per batch (never materialized per doc on the
    driver); at 100 TB the output is written partitioned, not
    collected."""
    stride = CHUNK_TOKENS - CHUNK_OVERLAP

    class Stage(TextStats):
        def __call__(self, t: pa.Table) -> pa.Table:
            # vectorized: window enumeration in numpy, token gather +
            # binary_join in Arrow — no Python per row or per chunk
            from mee_ray.pipelines.gramhash import tokenize_flat
            flat, _, lens_d = tokenize_flat(t["text"], mode="regex")
            dids = t["doc_id"].to_numpy(zero_copy_only=False)
            nwin = (lens_d + stride - 1) // stride      # 0 for empty
            W = int(nwin.sum())
            if W == 0:
                return pa.table({
                    "doc_id": pa.array([], pa.int64()),
                    "chunk_id": pa.array([], pa.int64()),
                    "chunk_start": pa.array([], pa.int64()),
                    "n_tokens": pa.array([], pa.int64()),
                    "chunk_text": pa.array([], pa.string())})
            wdoc = np.repeat(np.arange(len(lens_d)), nwin)
            wloc = np.arange(W, dtype=np.int64) \
                - np.repeat(np.cumsum(nwin) - nwin, nwin)
            wstart = wloc * stride
            wlen = np.minimum(CHUNK_TOKENS, lens_d[wdoc] - wstart)
            doc_start = np.cumsum(lens_d) - lens_d
            gstart = doc_start[wdoc] + wstart
            total = int(wlen.sum())
            local = np.arange(total, dtype=np.int64) \
                - np.repeat(np.cumsum(wlen) - wlen, wlen)
            idx = np.repeat(gstart, wlen) + local
            if isinstance(flat, pa.ChunkedArray):
                flat = flat.combine_chunks()
            vals = flat.take(pa.array(idx, pa.int64()))
            off = pa.array(i32_offsets(np.r_[0, np.cumsum(wlen)]),
                           pa.int32())
            texts = pc.binary_join(
                pa.ListArray.from_arrays(off, vals), " ")
            return pa.table({
                "doc_id": pa.array(dids[wdoc], pa.int64()),
                "chunk_id": pa.array(wloc, pa.int64()),
                "chunk_start": pa.array(wstart + 1, pa.int64()),
                "n_tokens": pa.array(wlen.astype(np.int64), pa.int64()),
                "chunk_text": texts})

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        Stage(), batch_format="pyarrow")


CHUNK_SQL = f"""
WITH tokl AS (
  SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_PATTERN}') AS ts
  FROM documents),
starts AS (
  SELECT doc_id, ts,
         unnest(generate_series(1, len(ts), {CHUNK_TOKENS - CHUNK_OVERLAP})) AS s
  FROM tokl WHERE len(ts) > 0)
SELECT doc_id,
       CAST((s - 1) / {CHUNK_TOKENS - CHUNK_OVERLAP} AS BIGINT) AS chunk_id,
       CAST(s AS BIGINT) AS chunk_start,
       CAST(least(s + {CHUNK_TOKENS} - 1, len(ts)) - s + 1 AS BIGINT) AS n_tokens,
       array_to_string(ts[s:least(s + {CHUNK_TOKENS} - 1, len(ts))], ' ') AS chunk_text
FROM starts
"""


# --------------------------------------------- corpus curation chain --

CURATE_MIN_TOKENS = 20


def curated_ids_dataset(sf_dir: str):
    """Dataset form of the curation chain (language filter →
    minimum-length filter → exact dedup keep-lowest-id): survivors as
    a STREAM of (fp, doc_id, n_tokens) rows, nothing on the driver —
    composable with downstream stages (near-dup clustering, export).
    Cheap columnar filters run BEFORE tokenization (rows that fail the
    lang gate are never tokenized), only (fp, doc_id, n_tokens) rows
    cross the shuffle, and duplicates share identical text so n_tokens
    is constant per fingerprint group."""
    from ray.data.aggregate import Min

    class Stage(TextStats):
        def __call__(self, t: pa.Table) -> pa.Table:
            t = t.filter(pc.equal(t["lang"], "en"))
            # vectorized length gate BEFORE the md5 loop: only
            # survivors pay the (oracle-mandated md5(text)) C call
            from mee_ray.pipelines.gramhash import tokenize_flat
            _, _, lens = tokenize_flat(t["text"], mode="regex")
            keep = lens >= CURATE_MIN_TOKENS
            t = t.filter(pa.array(keep))
            fps = [hashlib.md5(x.encode()).hexdigest()
                   for x in t["text"].to_pylist()]
            return pa.table({"fp": pa.array(fps, pa.string()),
                             "doc_id": t["doc_id"],
                             "n_tokens": pa.array(
                                 lens[keep].astype(np.int64),
                                 pa.int64())})

    return (_read_docs(sf_dir, ["doc_id", "text", "lang"])
            .map_batches(Stage(), batch_format="pyarrow",
                         zero_copy_batch=True)
            .groupby("fp")
            .aggregate(Min("doc_id", alias_name="doc_id"),
                       Min("n_tokens", alias_name="n_tokens")))


def curate_documents(sf_dir: str):
    """The composed curation chain of a training-data pipeline (the
    C4 shape) as a driver table — see :func:`curated_ids_dataset` for
    the streaming form this wraps."""
    surv = curated_ids_dataset(sf_dir)
    batches = list(surv.iter_batches(batch_format="pyarrow"))
    if not batches:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "n_tokens": pa.array([], pa.int64())})
    t = pa.concat_tables(batches).select(["doc_id", "n_tokens"])
    t = pa.table({"doc_id": t["doc_id"].cast(pa.int64()),
                  "n_tokens": t["n_tokens"].cast(pa.int64())})
    return t.take(pc.sort_indices(t, sort_keys=[
        ("doc_id", "ascending")]))


CURATE_SQL = f"""
WITH passing AS (
  SELECT doc_id, md5(text) AS fp,
         len(regexp_extract_all(lower(text), '{TOKEN_PATTERN}'))
           AS n_tokens
  FROM documents
  WHERE lang = 'en'),
pass2 AS (SELECT * FROM passing WHERE n_tokens >= {CURATE_MIN_TOKENS}),
keep AS (SELECT fp, min(doc_id) AS doc_id FROM pass2 GROUP BY fp)
SELECT p.doc_id, p.n_tokens
FROM pass2 p JOIN keep k ON k.doc_id = p.doc_id
ORDER BY p.doc_id
"""


PACK_BUDGET = 2048


def pack_training_sequences(sf_dir: str):
    """Training-sequence packing: assign every document to a
    fixed-token-budget sequence (the step between chunking and shard
    export in a pre-training pipeline).

    Packing rule — deliberately the ORDER-DETERMINISTIC, vectorizable
    one: concatenate each language's documents in doc_id order and
    split the stream at multiples of ``PACK_BUDGET``; a document
    belongs to the sequence where its start offset falls (documents
    may straddle a boundary — the padding-free rule most packers use
    when truncation is handled downstream).  First-fit-decreasing
    would pack ~1% tighter but is inherently sequential; this rule is
    ONE prefix sum, so it distributes.

    Shape: tokenize per batch (per-task tokenizer state), ≤1 row per
    doc crosses the exchange (doc_id, lang, n_tokens — text stays in
    the tokenize task), one vectorized cumsum per language group.  A
    language whose reduced row set outgrows one task takes the
    standard two-pass distributed prefix sum (per-block partial sums,
    then a broadcast of the tiny per-block offsets) — the same
    documented scale path as dense_rank's range-partition+offset."""

    class Count(TextStats):
        def __call__(self, t: pa.Table) -> pa.Table:
            n = [len(self.tokens(x)) for x in t["text"].to_pylist()]
            return pa.table({"doc_id": t["doc_id"], "lang": t["lang"],
                             "n_tokens": pa.array(n, pa.int64())})

    def pack_group(g: pa.Table) -> pa.Table:
        d = g["doc_id"].to_numpy(zero_copy_only=False)
        n = g["n_tokens"].to_numpy(zero_copy_only=False)
        langs = g["lang"].to_pylist()
        order = np.argsort(d, kind="stable")
        d, n = d[order], n[order]
        langs = [langs[i] for i in order]
        start = np.concatenate(([0], np.cumsum(n)[:-1]))
        return pa.table({
            "doc_id": pa.array(d, pa.int64()),
            "lang": pa.array(langs, pa.string()),
            "n_tokens": pa.array(n, pa.int64()),
            "seq_id": pa.array(start // PACK_BUDGET, pa.int64()),
            "seq_offset": pa.array(start % PACK_BUDGET, pa.int64())})

    parts = list(_read_docs(sf_dir, ["doc_id", "lang", "text"])
                 .map_batches(Count(), batch_format="pyarrow",
                              zero_copy_batch=True)
                 .groupby("lang")
                 .map_groups(pack_group, batch_format="pyarrow")
                 .iter_batches(batch_format="pyarrow"))
    out = pa.concat_tables(parts) if parts else pa.table(
        {"doc_id": pa.array([], pa.int64()),
         "lang": pa.array([], pa.string()),
         "n_tokens": pa.array([], pa.int64()),
         "seq_id": pa.array([], pa.int64()),
         "seq_offset": pa.array([], pa.int64())})
    return out.sort_by([("lang", "ascending"), ("doc_id", "ascending")])


PACK_SQL = f"""
WITH n AS (
  SELECT doc_id, lang,
         len(regexp_extract_all(lower(text), '{TOKEN_PATTERN}'))
           AS n_tokens
  FROM documents),
o AS (
  SELECT doc_id, lang, n_tokens,
         coalesce(sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS start_off
  FROM n)
SELECT doc_id, lang, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(floor(start_off / {PACK_BUDGET}) AS BIGINT) AS seq_id,
       CAST(start_off % {PACK_BUDGET} AS BIGINT)        AS seq_offset
FROM o ORDER BY lang, doc_id
"""


# ------------------------- categorize_text / significant_text (ES) --

_CAT_PREFIX = 4


def categorize_topk(t: pa.Table, k: int = 20) -> pa.Table:
    """Top-k categories by (n_docs DESC, category ASC) — a TOTAL
    order (categories unique post-groupby), so per-batch partials of
    globally-aggregated rows compose exactly (partial-compose fuzz in
    test_pipelines.py)."""
    cats = np.asarray(t["category"].to_pylist(), dtype=object)
    n = t["n_docs"].to_numpy(zero_copy_only=False)
    order = np.lexsort((cats, -n))[:k]
    return t.take(pa.array(order))


def categorize_text_documents(sf_dir: str):
    """ES ``categorize_text`` aggregation — deterministic exact
    variant (ES's is a drain-tree heuristic): a document's category is
    the first {prefix} tokens after dropping single-char and
    digit-bearing tokens (the ES analyzer's number/weight pruning),
    joined with spaces.  Per-batch partial counts cross the exchange
    (one row per category per batch), one tiny groupby reduces, and
    the driver keeps the top 20 by (count DESC, category ASC) off the
    bounded category table."""
    from ray.data.aggregate import Min, Sum

    class Stage(TextStats):
        def __call__(self, t: pa.Table) -> pa.Table:
            # vectorized: token filter (length>1, digit-free) as Arrow
            # masks, per-doc prefix via within-doc rank, category text
            # via binary_join — no Python per row
            from mee_ray.pipelines.gramhash import tokenize_flat
            flat, didx, _ = tokenize_flat(t["text"], mode="regex")
            n = len(t)
            if len(flat):
                if isinstance(flat, pa.ChunkedArray):
                    flat = flat.combine_chunks()
                ok = (pc.greater(pc.utf8_length(flat), 1)
                      .to_numpy(zero_copy_only=False)
                      & ~pc.match_substring_regex(flat, "[0-9]")
                      .to_numpy(zero_copy_only=False)).astype(bool)
                flat, didx = flat.filter(pa.array(ok)), didx[ok]
                cnt = np.bincount(didx, minlength=n)
                rank = np.arange(len(didx)) \
                    - np.repeat(np.cumsum(cnt) - cnt, cnt)
                head = rank < _CAT_PREFIX
                flat, didx = flat.filter(pa.array(head)), didx[head]
                kept = np.bincount(didx, minlength=n)
            else:
                kept = np.zeros(n, dtype=np.int64)
            off = pa.array(i32_offsets(np.r_[0, np.cumsum(kept)]),
                           pa.int32())
            cats = pc.binary_join(pa.ListArray.from_arrays(off, flat),
                                  " ")
            g = (pa.table({"category": cats,
                           "doc_id": t["doc_id"]})
                 .group_by("category")
                 .aggregate([([], "count_all"), ("doc_id", "min")]))
            return g.rename_columns(["category", "n_part", "mn_part"])

    agg = (_read_docs(sf_dir, ["doc_id", "text"])
           .map_batches(Stage(), batch_format="pyarrow")
           .groupby("category")
           .aggregate(Sum("n_part", alias_name="n_docs"),
                      Min("mn_part", alias_name="min_doc_id")))

    top20 = categorize_topk

    # the groupby output carries GLOBAL per-category counts, so a
    # per-batch partial top-20 by the total order (n_docs DESC,
    # category ASC) is EXACT — adversarial all-unique-prefix corpora
    # (one category per doc, O(n_docs) categories) now cross to the
    # driver as ≤ 20 rows per block instead of the whole category
    # table (VERDICT r4 #3; bounded-driver-state test in
    # test_pipelines.py)
    parts = list(agg.map_batches(top20, batch_format="pyarrow")
                 .iter_batches(batch_format="pyarrow"))
    if not parts:
        return pa.table({"category": pa.array([], pa.string()),
                         "n_docs": pa.array([], pa.int64()),
                         "min_doc_id": pa.array([], pa.int64())})
    return top20(pa.concat_tables(parts).combine_chunks())


CATEGORIZE_SQL = f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_extract_all(lower(text), '{TOKEN_PATTERN}'),
                     x -> length(x) > 1
                          AND NOT regexp_matches(x, '[0-9]')) AS l
  FROM documents),
cat AS (
  SELECT doc_id,
         array_to_string(list_slice(l, 1, {_CAT_PREFIX}), ' ')
           AS category
  FROM toks)
SELECT category, count(*) AS n_docs, min(doc_id) AS min_doc_id
FROM cat GROUP BY category
ORDER BY n_docs DESC, category LIMIT 20
"""


_SIGTEXT_TERM = "spark"


def significant_text_documents(sf_dir: str):
    """ES ``significant_text`` aggregation with
    ``filter_duplicate_text``: foreground = DISTINCT texts containing
    the token '{term}' (the dedup is the feature that distinguishes
    significant_text from significant_terms), background = doc
    frequency over the whole corpus, score = ES's default JLH
    (fg% − bg%)·(fg%/bg%) applied ONCE per term to exact integer
    counts with the oracle's tree.  Term tables are vocabulary-
    bounded; the foreground exchange carries only matching distinct
    texts."""
    from collections import Counter

    import pyarrow.parquet as pq
    from ray.data.aggregate import Sum

    class FgStage(TextStats):
        def __call__(self, t: pa.Table) -> pa.Table:
            # vectorized membership: tokenize once, equality mask,
            # per-doc any() via bincount
            from mee_ray.pipelines.gramhash import tokenize_flat
            flat, didx, _ = tokenize_flat(t["text"], mode="regex")
            hit = pc.equal(flat, pa.scalar(_SIGTEXT_TERM)) \
                .to_numpy(zero_copy_only=False).astype(bool)
            keep = np.bincount(didx[hit], minlength=len(t)) > 0
            return t.filter(pa.array(keep))

    fg_texts = (_read_docs(sf_dir, ["text"])
                .map_batches(FgStage(), batch_format="pyarrow")
                .groupby("text").count()
                .drop_columns(["count()"])
                .materialize())          # query-bounded distinct texts
    fg_total = fg_texts.count()

    fg = pa.concat_tables(list(
        _df_over(fg_texts, "fg_count")
        .iter_batches(batch_format="pyarrow")))
    bg = pa.concat_tables(list(doc_term_df(sf_dir)
                               .iter_batches(batch_format="pyarrow")))
    bg_total = int(pq.read_metadata(
        f"{sf_dir}/documents.parquet").num_rows)
    bg_map = dict(zip(bg["term"].to_pylist(),
                      bg["df"].to_pylist()))
    terms = fg["term"].to_pylist()
    fgc = fg["fg_count"].to_numpy(zero_copy_only=False)
    bgc = np.array([bg_map[w] for w in terms], dtype=np.int64)
    fgp = fgc / fg_total
    bgp = bgc / bg_total
    jlh = (fgp - bgp) * (fgp / bgp)
    order = np.lexsort((np.asarray(terms, dtype=object), -jlh))[:10]
    return pa.table({
        "term": pa.array([terms[i] for i in order], pa.string()),
        "fg_count": pa.array(fgc[order], pa.int64()),
        "bg_count": pa.array(bgc[order], pa.int64()),
        "jlh": pa.array(jlh[order], pa.float64())})


SIGNIFICANT_TEXT_SQL = f"""
WITH fg_docs AS (
  SELECT DISTINCT text FROM documents
  WHERE list_contains(regexp_extract_all(lower(text),
                                         '{TOKEN_PATTERN}'),
                      '{_SIGTEXT_TERM}')),
fg AS (
  SELECT term, count(*) AS fg_count
  FROM (SELECT text,
               unnest(list_distinct(regexp_extract_all(lower(text),
                                    '{TOKEN_PATTERN}'))) AS term
        FROM fg_docs)
  GROUP BY term),
fgt AS (SELECT count(*) AS n FROM fg_docs),
bg AS (
  SELECT term, count(DISTINCT doc_id) AS bg_count
  FROM (SELECT doc_id,
               unnest(regexp_extract_all(lower(text),
                                         '{TOKEN_PATTERN}')) AS term
        FROM documents)
  GROUP BY term),
bgt AS (SELECT count(*) AS n FROM documents)
SELECT fg.term, fg.fg_count, bg.bg_count,
       (CAST(fg_count AS DOUBLE) / fgt.n
        - CAST(bg_count AS DOUBLE) / bgt.n)
       * ((CAST(fg_count AS DOUBLE) / fgt.n)
          / (CAST(bg_count AS DOUBLE) / bgt.n)) AS jlh
FROM fg JOIN bg USING (term), fgt, bgt
ORDER BY jlh DESC, term LIMIT 10
"""


# ------------------------------------------------ dataset summary ----

def dataset_summary_documents(sf_dir: str):
    """The dataset-card one-stop: per (lang, source) stratum — doc
    count, total/min/max token counts, exact-duplicate docs (same
    md5(text) appearing more than once counts ALL its members), and
    empty-text docs.  Everything is an int64 partial (token counts per
    batch, fingerprint counts through one groupby), so the oracle is
    exact; the output is bounded by |langs| × |sources|."""
    import hashlib as _hl

    import ray.data
    from ray.data.aggregate import Max, Min, Sum

    class Stage(TextStats):
        def __call__(self, t: pa.Table) -> pa.Table:
            texts = t["text"].to_pylist()
            n_tok = np.fromiter(
                (len(self.tokens(x or "")) for x in texts),
                dtype=np.int64, count=len(t))
            fp = pa.array([_hl.md5((x or "").encode()).hexdigest()
                           for x in texts], pa.string())
            empty = pc.equal(pc.binary_length(
                pc.coalesce(t["text"], pa.scalar(""))), 0)
            return pa.table({
                "lang": t["lang"], "source": t["source"], "fp": fp,
                "n_tok": pa.array(n_tok),
                "is_empty": pc.cast(empty, pa.int64())})

    rows = _read_docs(sf_dir, ["text", "lang", "source"]).map_batches(
        Stage(), batch_format="pyarrow")
    # duplicate members: fingerprint groupby (the dedup shuffle), then
    # per-stratum totals — group keys bounded by distinct texts
    from ray.data.aggregate import Count
    per_fp = rows.groupby(["lang", "source", "fp"]).aggregate(
        Count(alias_name="members"),
        Sum("n_tok", alias_name="n_tok_sum"),
        Min("n_tok", alias_name="n_tok_min"),
        Max("n_tok", alias_name="n_tok_max"),
        Sum("is_empty", alias_name="n_empty"))

    def stratum_partial(t: pa.Table) -> pa.Table:
        m = t["members"].to_numpy(zero_copy_only=False)
        dup = np.where(m > 1, m, 0).astype(np.int64)
        return pa.table({
            "lang": t["lang"], "source": t["source"],
            "n_docs": t["members"],
            "n_tokens": t["n_tok_sum"],
            "min_tokens": t["n_tok_min"],
            "max_tokens": t["n_tok_max"],
            "n_dup_docs": pa.array(dup),
            "n_empty": t["n_empty"]})

    return (per_fp.map_batches(stratum_partial, batch_format="pyarrow")
            .groupby(["lang", "source"])
            .aggregate(Sum("n_docs", alias_name="n_docs"),
                       Sum("n_tokens", alias_name="n_tokens"),
                       Min("min_tokens", alias_name="min_tokens"),
                       Max("max_tokens", alias_name="max_tokens"),
                       Sum("n_dup_docs", alias_name="n_dup_docs"),
                       Sum("n_empty", alias_name="n_empty")))


DATASET_SUMMARY_SQL = f"""
WITH d AS (SELECT lang, source, coalesce(text, '') AS t,
                  md5(coalesce(text, '')) AS fp,
                  len(regexp_extract_all(lower(coalesce(text, '')),
                                         '{TOKEN_PATTERN}')) AS n_tok
           FROM documents),
fpc AS (SELECT lang, source, fp, count(*) AS members,
               CAST(sum(n_tok) AS BIGINT) AS n_tok_sum,
               min(n_tok) AS n_tok_min, max(n_tok) AS n_tok_max,
               CAST(sum(CASE WHEN len(t) = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_empty
        FROM d GROUP BY lang, source, fp)
SELECT lang, source,
       CAST(sum(members) AS BIGINT) AS n_docs,
       CAST(sum(n_tok_sum) AS BIGINT) AS n_tokens,
       CAST(min(n_tok_min) AS BIGINT) AS min_tokens,
       CAST(max(n_tok_max) AS BIGINT) AS max_tokens,
       CAST(sum(CASE WHEN members > 1 THEN members ELSE 0 END)
            AS BIGINT) AS n_dup_docs,
       CAST(sum(n_empty) AS BIGINT) AS n_empty
FROM fpc GROUP BY lang, source
"""


# ----------------------- terms agg shard-error-bound semantics -------
# ES's `terms` aggregation is APPROXIMATE under sharding: each shard
# returns only its local top `shard_size` terms, the coordinator sums
# what it received, and reports doc_count_error_upper_bound = the sum,
# over shards that did NOT report the term, of that shard's last
# included count (the largest count the term could have hidden under).
# This pipeline reproduces those exact semantics with a DETERMINISTIC
# shard function (doc_id % n_shards), which makes the whole
# approximation protocol — including the error bounds — exactly
# mirrorable in SQL.  A shard that returned ALL its terms contributes
# zero error (nothing can hide).  Distributed shape: per-batch
# (shard, term, df) partials → one groupby — the merge table is
# bounded at n_shards × shard_size rows.

_TERMS_EB_SIZE = 10
_TERMS_EB_SHARD_SIZE = 10
_TERMS_EB_SHARDS = 4


def terms_error_bounds_documents(sf_dir: str, size: int = _TERMS_EB_SIZE,
                                 shard_size: int = _TERMS_EB_SHARD_SIZE,
                                 n_shards: int = _TERMS_EB_SHARDS):
    import ray.data
    from ray.data.aggregate import Sum

    class Stage(TextStats):
        def __call__(self, t: pa.Table) -> pa.Table:
            import pandas as pd
            ids = t["doc_id"].to_numpy(zero_copy_only=False)
            terms, didx = [], []
            for i, x in enumerate(t["text"].to_pylist()):
                ts = sorted(set(self.tokens(x or "")))
                terms.extend(ts)
                didx.extend([i] * len(ts))
            if not terms:
                return pa.table({"shard": pa.array([], pa.int64()),
                                 "term": pa.array([], pa.string()),
                                 "df": pa.array([], pa.int64())})
            didx = np.array(didx, dtype=np.int64)
            shard = ids[didx] % n_shards
            inv, uniq = pd.factorize(np.array(terms, dtype=object))
            key = shard * len(uniq) + inv
            ukey, cnt = np.unique(key, return_counts=True)
            return pa.table({
                "shard": pa.array(ukey // len(uniq), pa.int64()),
                "term": pa.array([uniq[j] for j in ukey % len(uniq)],
                                 pa.string()),
                "df": pa.array(cnt.astype(np.int64))})

    def shard_topk(g: pa.Table) -> pa.Table:
        g = g.combine_chunks()
        df = g["df"].to_numpy(zero_copy_only=False)
        terms = np.array(g["term"].to_pylist(), dtype=object)
        order = np.lexsort((terms, -df))[:shard_size]
        n = len(order)
        return pa.table({
            "shard": g["shard"].take(pa.array(order, pa.int64())),
            "term": pa.array(terms[order].tolist(), pa.string()),
            "df": pa.array(df[order], pa.int64()),
            "n_terms_in_shard": pa.array([len(g)] * n, pa.int64())})

    top = (_read_docs(sf_dir, ["doc_id", "text"])
           .map_batches(Stage(), batch_format="pyarrow")
           .groupby(["shard", "term"])
           .aggregate(Sum("df", alias_name="df"))
           .groupby("shard")
           .map_groups(shard_topk, batch_format="pyarrow"))
    # coordinator merge over a table bounded at n_shards × shard_size
    rows = top.take_all()
    by_shard: dict[int, dict] = {}
    for r in rows:
        s = by_shard.setdefault(int(r["shard"]),
                                {"terms": {}, "n": int(r["n_terms_in_shard"])})
        s["terms"][r["term"]] = int(r["df"])
    last = {s: (min(d["terms"].values())
                if len(d["terms"]) == shard_size and d["n"] > shard_size
                else 0)
            for s, d in by_shard.items()}
    cand = sorted({t for d in by_shard.values() for t in d["terms"]})
    out = []
    for term in cand:
        dc = sum(d["terms"].get(term, 0) for d in by_shard.values())
        err = sum(last[s] for s, d in by_shard.items()
                  if term not in d["terms"])
        out.append((term, dc, err))
    out.sort(key=lambda r: (-r[1], r[0]))
    out = out[:size]
    return pa.table({
        "term": pa.array([r[0] for r in out], pa.string()),
        "doc_count": pa.array([r[1] for r in out], pa.int64()),
        "doc_count_error_upper_bound":
            pa.array([r[2] for r in out], pa.int64())})


TERMS_EB_SQL = f"""
WITH tok AS (
  SELECT doc_id % {_TERMS_EB_SHARDS} AS shard,
         unnest(list_distinct(regexp_extract_all(lower(coalesce(text, '')),
                                                 '{TOKEN_PATTERN}'))) AS term
  FROM documents),
df AS (SELECT shard, term, CAST(count(*) AS BIGINT) AS df
       FROM tok GROUP BY shard, term),
ranked AS (SELECT shard, term, df,
                  row_number() OVER (PARTITION BY shard
                                     ORDER BY df DESC, term) AS rn,
                  count(*) OVER (PARTITION BY shard) AS n_in_shard
           FROM df),
top AS (SELECT * FROM ranked WHERE rn <= {_TERMS_EB_SHARD_SIZE}),
last AS (SELECT shard,
                CASE WHEN count(*) = {_TERMS_EB_SHARD_SIZE}
                          AND max(n_in_shard) > {_TERMS_EB_SHARD_SIZE}
                     THEN min(df) ELSE 0 END AS last_df
         FROM top GROUP BY shard),
cand AS (SELECT DISTINCT term FROM top),
shards AS (SELECT DISTINCT shard FROM df),
merged AS (
  SELECT c.term,
         CAST(coalesce(sum(t.df), 0) AS BIGINT) AS doc_count,
         CAST(coalesce(sum(CASE WHEN t.term IS NULL THEN l.last_df
                                ELSE 0 END), 0) AS BIGINT) AS err
  FROM cand c
  CROSS JOIN shards s
  LEFT JOIN top t ON t.shard = s.shard AND t.term = c.term
  LEFT JOIN last l ON l.shard = s.shard
  GROUP BY c.term)
SELECT term, doc_count, err AS doc_count_error_upper_bound
FROM merged
ORDER BY doc_count DESC, term
LIMIT {_TERMS_EB_SIZE}
"""


# --------------------------------- DSIR importance resampling --------
# Data Selection with Importance Resampling (Xie et al. 2023,
# arXiv:2302.03169): hashed word-n-gram features (unigrams + bigrams
# into a FIXED 10k-bucket table), per-bucket importance weights from
# target-vs-raw counts, per-doc score = sum of per-occurrence weights.
# Deviations, both deliberate:
#   * weights are FIXED-POINT RATIOS floor(SCALE*(ct+1)/(cr+1)) rather
#     than log-ratios: DuckDB's ln() differs from numpy's by up to
#     2 ulp (measured), so a log-weight sum cannot be value-hash
#     oracled; the integer form is bit-exact on both sides (the
#     change_point / pagerank fixed-point precedent).  With
#     target ⊆ raw every ratio is ≤ 1 so a doc score is bounded by
#     n_grams·SCALE — int64-safe at any corpus size.
#   * the bucket hash is a rolling (a·31+code) mod (2³¹−1) polynomial
#     — the one hash both numpy and DuckDB (list_reduce) can compute
#     bit-identically; bucket quality only affects collision noise.
# Scale shape: two tokenize passes over the corpus (CPU is cheaper
# than a shuffle), ONE ≤10k-key groupby for the global counts, weights
# broadcast once via ray.put — zero corpus-sized exchanges; pass B
# emits exactly one row per doc with no groupby at all.

_DSIR_BUCKETS = 10000
_DSIR_HASH_MOD = 2147483647  # 2^31-1 keeps a*31+code inside int64
_DSIR_SCALE = 1_000_000


def _dsir_bucket(g: str) -> int:
    a = 7
    for ch in g:
        a = (a * 31 + ord(ch)) % _DSIR_HASH_MOD
    return a % _DSIR_BUCKETS


class _DsirGramBase(TextStats):
    """Shared tokenize→gram→bucket kernel, fully vectorized while
    staying bit-identical to the oracle's string rolling hash (see
    :meth:`_kp`); per-unique-token state persists across the task's
    batches (the ST1 cache pattern)."""

    def __init__(self):
        super().__init__()
        self._memo: dict[str, tuple[int, int]] = {}

    def _kp(self, t: str) -> tuple[int, int]:
        """(K, P) = (fold(0, t), 31^len(t)) mod p, memoized per unique
        token: the rolling fold decomposes as H(s·t) = H(s)·P(t) +
        K(t) (mod p), which makes every unigram AND bigram hash pure
        vectorized gather arithmetic — H(a) = 7·P(a)+K(a);
        H(a·" "·b) = (H(a)·31+32)·P(b)+K(b); every intermediate
        < 2^62, and the values are BIT-IDENTICAL to _dsir_bucket's
        per-string fold (the oracle's list_reduce)."""
        hit = self._memo.get(t)
        if hit is None:
            k, pw = 0, 1
            for ch in t:
                k = (k * 31 + ord(ch)) % _DSIR_HASH_MOD
                pw = (pw * 31) % _DSIR_HASH_MOD
            hit = (k, pw)
            self._memo[t] = hit
        return hit

    def doc_buckets(self, texts: list):
        """(didx, bucket_per_gram, gram_count_per_doc) for one batch
        (list form kept for tests; the column form is the hot path)."""
        return self.doc_buckets_col(
            pa.array([x or "" for x in texts], pa.string()))

    def doc_buckets_col(self, col):
        from mee_ray.pipelines.gramhash import tokenize_flat
        flat, didx_t, lens_t = tokenize_flat(col, mode="regex")
        lens = np.where(lens_t > 0, 2 * lens_t - 1, 0).astype(np.int64)
        if len(flat) == 0:
            return (np.zeros(0, np.int64), np.zeros(0, np.int64), lens)
        d = pc.dictionary_encode(flat.combine_chunks()
                                 if isinstance(flat, pa.ChunkedArray)
                                 else flat)
        inv = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        uniq = d.dictionary.to_numpy(zero_copy_only=False)
        kp = np.empty((len(uniq), 2), dtype=np.int64)
        for i, u in enumerate(uniq):
            kp[i] = self._kp(u)
        Kt, Pt = kp[inv, 0], kp[inv, 1]
        MOD = _DSIR_HASH_MOD
        Ht = (7 * Pt + Kt) % MOD                     # unigram hashes
        starts = np.flatnonzero(didx_t[1:] == didx_t[:-1]) \
            if len(didx_t) > 1 else np.zeros(0, np.int64)
        Hb = (((Ht[starts] * 31 + 32) % MOD) * Pt[starts + 1]
              + Kt[starts + 1]) % MOD               # "a b" bigrams
        didx = np.concatenate([didx_t, didx_t[starts]])
        bk = np.concatenate([Ht, Hb]) % _DSIR_BUCKETS
        return didx, bk, lens


class _DsirCountStage(_DsirGramBase):
    """Pass A: per-batch (bucket, ct, cr) partials — ≤10k rows per
    batch regardless of batch size (the combiner-before-shuffle rule)."""

    def __call__(self, t: pa.Table) -> pa.Table:
        is_t = np.asarray(
            pc.equal(t["lang"], pa.scalar("en")).combine_chunks()
            .to_numpy(zero_copy_only=False), dtype=bool)
        didx, bk, _ = self.doc_buckets_col(t["text"])
        cr = np.bincount(bk, minlength=_DSIR_BUCKETS)
        ct = np.bincount(bk[is_t[didx]], minlength=_DSIR_BUCKETS) \
            if len(bk) else np.zeros(_DSIR_BUCKETS, np.int64)
        nz = np.flatnonzero(cr)
        return pa.table({"bucket": pa.array(nz, pa.int64()),
                         "ct": pa.array(ct[nz].astype(np.int64)),
                         "cr": pa.array(cr[nz].astype(np.int64))})


class _DsirScoreStage(_DsirGramBase):
    """Pass B: one (doc_id, n_feats, score) row per doc, weights read
    zero-copy from plasma (ray.put once by the driver)."""

    def __init__(self, w_ref):
        super().__init__()
        self.w_ref = w_ref
        self._w = None

    def __call__(self, t: pa.Table) -> pa.Table:
        import ray as _ray
        if self._w is None:
            self._w = _ray.get(self.w_ref)
        didx, bk, lens = self.doc_buckets_col(t["text"])
        n = len(t)
        # weights ≤ SCALE and n_grams ≤ ~1e5 per doc: every partial sum
        # stays far below 2^53, so the float64 bincount is integer-exact
        score = np.bincount(didx, weights=self._w[bk].astype(np.float64),
                            minlength=n) if len(bk) else np.zeros(n)
        return pa.table({"doc_id": t["doc_id"],
                         "n_feats": pa.array(lens, pa.int64()),
                         "score": pa.array(np.rint(score).astype(np.int64),
                                           pa.int64())})


def dsir_weights_documents(sf_dir: str):
    """DSIR per-doc importance scores (target = lang='en' docs, raw =
    the whole corpus).  See the block comment above for the exactness
    and scale contract."""
    import ray

    from ray.data.aggregate import Sum

    docs = _read_docs(sf_dir, ["doc_id", "text", "lang"])
    gc = (docs.map_batches(_DsirCountStage(), batch_format="pyarrow")
          .groupby("bucket")
          .aggregate(Sum("ct", alias_name="ct"),
                     Sum("cr", alias_name="cr")))
    w = np.zeros(_DSIR_BUCKETS, dtype=np.int64)
    for r in gc.take_all():  # ≤10k rows by construction — bounded
        w[r["bucket"]] = (_DSIR_SCALE * (r["ct"] + 1)) // (r["cr"] + 1)
    w_ref = ray.put(w)
    return docs.map_batches(_DsirScoreStage(w_ref),
                            batch_format="pyarrow")


def _topk_partial(t: pa.Table, k: int) -> pa.Table:
    """The (score DESC, doc_id ASC) partial-top-k kernel shared by
    every selection stage in this module — one definition so a
    tie-break fix cannot miss a copy."""
    t = t.combine_chunks()
    sc = t["score"].to_numpy(zero_copy_only=False)
    d = t["doc_id"].to_numpy(zero_copy_only=False)
    order = np.lexsort((d, -sc))[:k]
    return t.take(pa.array(order, pa.int64()))


def dsir_select_documents(sf_dir: str, k: int = 100):
    """The resampling step: exact top-k docs by (score DESC, doc_id) —
    per-batch partial top-k, single bounded final merge (the
    geo_distance_topk pattern; never a full corpus sort)."""
    def topk_partial(t: pa.Table) -> pa.Table:
        return _topk_partial(t, k)

    return (dsir_weights_documents(sf_dir)
            .map_batches(topk_partial, batch_format="pyarrow")
            .repartition(1)
            .map_batches(topk_partial, batch_format="pyarrow"))


_DSIR_GRAMS_CTE = f"""
d AS (SELECT doc_id, lang = 'en' AS is_t,
             regexp_extract_all(lower(coalesce(text, '')),
                                '{TOKEN_PATTERN}') AS toks
      FROM documents),
h AS (SELECT doc_id, is_t,
             list_reduce(list_prepend(CAST(7 AS BIGINT),
                 list_transform(generate_series(1, len(g)),
                     i -> CAST(ascii(substr(g, i, 1)) AS BIGINT))),
                 (a, x) -> (a * 31 + x) % {_DSIR_HASH_MOD})
             % {_DSIR_BUCKETS} AS b
      FROM (SELECT doc_id, is_t, unnest(toks) AS g FROM d
            UNION ALL
            SELECT doc_id, is_t, toks[i] || ' ' || toks[i + 1] AS g
            FROM d, unnest(generate_series(1, len(toks) - 1)) AS s(i)
            WHERE len(toks) >= 2)),
counts AS (SELECT b,
                  CAST(sum(CASE WHEN is_t THEN 1 ELSE 0 END)
                       AS BIGINT) AS ct,
                  CAST(count(*) AS BIGINT) AS cr
           FROM h GROUP BY b),
w AS (SELECT b, ({_DSIR_SCALE} * (ct + 1)) // (cr + 1) AS w
      FROM counts),
db AS (SELECT doc_id, b, CAST(count(*) AS BIGINT) AS c
       FROM h GROUP BY doc_id, b),
scores AS (
  SELECT d.doc_id,
         CAST(coalesce(sum(db.c), 0) AS BIGINT) AS n_feats,
         CAST(coalesce(sum(db.c * w.w), 0) AS BIGINT) AS score
  FROM d
  LEFT JOIN db ON db.doc_id = d.doc_id
  LEFT JOIN w ON w.b = db.b
  GROUP BY d.doc_id)
"""

DSIR_SQL = f"WITH {_DSIR_GRAMS_CTE} SELECT * FROM scores"

DSIR_SELECT_SQL = f"""
WITH {_DSIR_GRAMS_CTE}
SELECT * FROM scores ORDER BY score DESC, doc_id LIMIT 100
"""


# ------------------------- composed chain II: quality → importance ---

def quality_training_mix_documents(sf_dir: str, k: int = 100):
    """Composed curation chain II (the quality-then-importance shape a
    training-mix pipeline actually runs): the Gopher wlen and alpha
    rules plus lang='en' gate the corpus (rule_stop deliberately NOT
    applied — QUALITY_MIX_SQL mirrors the same three-way gate), DSIR importance scores rank the survivors, and
    the exact top-k by (score DESC, doc_id) is the mix.  ONE
    distributed pass computes both the rule flags and the feature
    scores (the stages share the batch); weights come from the
    standard two-phase DSIR protocol; selection is the bounded
    partial-top-k merge.  The oracle nests the two ops' FULL SQL as
    subqueries — compositionality holds on both sides."""
    import ray

    from ray.data.aggregate import Sum

    docs = _read_docs(sf_dir, ["doc_id", "text", "lang"])
    gc = (docs.map_batches(_DsirCountStage(), batch_format="pyarrow")
          .groupby("bucket")
          .aggregate(Sum("ct", alias_name="ct"),
                     Sum("cr", alias_name="cr")))
    w = np.zeros(_DSIR_BUCKETS, dtype=np.int64)
    for r in gc.take_all():
        w[r["bucket"]] = (_DSIR_SCALE * (r["ct"] + 1)) // (r["cr"] + 1)
    w_ref = ray.put(w)
    g_stage = GopherRulesStage()
    s_stage = _DsirScoreStage(w_ref)

    def stage(t: pa.Table) -> pa.Table:
        flags = g_stage(t)
        scores = s_stage(t)
        is_en = pc.equal(t["lang"], pa.scalar("en")).combine_chunks()
        keep = pc.and_(pc.and_(flags["rule_wlen"].combine_chunks(),
                               flags["rule_alpha"].combine_chunks()),
                       is_en)
        return scores.filter(keep)

    def topk_partial(t: pa.Table) -> pa.Table:
        return _topk_partial(t, k)

    return (docs.map_batches(stage, batch_format="pyarrow")
            .map_batches(topk_partial, batch_format="pyarrow")
            .repartition(1)
            .map_batches(topk_partial, batch_format="pyarrow"))


QUALITY_MIX_SQL = f"""
WITH pass AS (SELECT doc_id FROM ({GOPHER_SQL}) g
              JOIN documents USING (doc_id)
              WHERE g.rule_wlen AND g.rule_alpha AND lang = 'en'),
sc AS (SELECT s.doc_id, s.n_feats, s.score
       FROM ({DSIR_SQL}) s JOIN pass USING (doc_id))
SELECT doc_id, n_feats, score FROM sc
ORDER BY score DESC, doc_id LIMIT 100
"""


QUERIES = {
    "quality_training_mix_documents": quality_training_mix_documents,
    "dsir_weights_documents": dsir_weights_documents,
    "dsir_select_documents": dsir_select_documents,
    "gopher_rules_documents": gopher_rules_documents,
    "terms_error_bounds_documents": terms_error_bounds_documents,
    "dataset_summary_documents": dataset_summary_documents,
    "doc_token_counts": doc_token_counts,
    "categorize_text_documents": categorize_text_documents,
    "significant_text_documents": significant_text_documents,
    "chunk_documents": chunk_documents,
    "pack_training_sequences": pack_training_sequences,
    "curate_documents": curate_documents,
    "stratified_sample_documents": stratified_sample_documents,
    "doc_term_df": doc_term_df,
    "doc_fingerprint": doc_fingerprint,
    "dedup_exact": dedup_exact,
    "doc_quality_scores": doc_quality_scores,
    "lang_id_documents": lang_id_documents,
    "minhash_lsh_candidates": minhash_lsh_candidates,
    "simhash_signatures": simhash_signatures,
    "simhash_dup_pairs": simhash_dup_pairs,
    "ngram_jaccard_adjacent": ngram_jaccard_adjacent,
    "pii_scrub_documents": pii_scrub_documents,
    "repetition_scores_documents": repetition_scores_documents,
    "passage_dedup_documents": passage_dedup_documents,
    "substring_dedup_spans_documents": substring_dedup_spans_documents,
    "contamination_check_documents": contamination_check_documents,
    "lm_score_documents": lm_score_documents,
    "bpe_tokenize_documents": bpe_tokenize_documents,
    "training_mix_sample": training_mix_sample,
    "temperature_mix_documents": temperature_mix_documents,
    "training_shuffle_order": training_shuffle_order,
    "bloom_membership_documents": bloom_membership_documents,
}

# Exact SQL mirror of ngram_jaccard_adjacent: the engine compares
# HASHED gram sets (blake2b-8B — collision odds ~|grams|²/2⁶³), so
# hashed-set Jaccard equals this string-set Jaccard for any realistic
# corpus; the short-text fallback (len<n ⇒ the whole string is the one
# gram) and the empty∪empty ⇒ 1.0 convention are mirrored exactly.
# The ratio is emitted UNROUNDED on both sides: IEEE float64 division
# of the same two integers is bit-identical, whereas round(x, 6)
# implementations diverge by 1 ulp on boundary ratios (observed at
# sf0.1: one adjacent pair's rounded value differed engine-vs-DuckDB).
NGRAM_JACCARD_SQL = """
WITH d AS (SELECT doc_id, coalesce(text, '') AS t FROM documents),
g AS (
  SELECT doc_id, substr(t, i, 5) AS g
  FROM d, unnest(generate_series(1, len(t) - 4)) AS u(i)
  WHERE len(t) >= 5
  UNION
  SELECT doc_id, t FROM d WHERE len(t) BETWEEN 1 AND 4
),
gd AS (SELECT DISTINCT doc_id, g FROM g),
sizes AS (SELECT doc_id, count(*) AS n FROM gd GROUP BY doc_id),
ord AS (SELECT doc_id, row_number() OVER (ORDER BY doc_id) AS rn FROM d),
pairs AS (SELECT o1.doc_id AS a, o2.doc_id AS b
          FROM ord o1 JOIN ord o2 ON o2.rn = o1.rn + 1),
inter AS (
  SELECT p.a, p.b, count(*) AS i
  FROM pairs p
  JOIN gd ga ON ga.doc_id = p.a
  JOIN gd gb ON gb.doc_id = p.b AND gb.g = ga.g
  GROUP BY p.a, p.b)
SELECT p.a, p.b,
       CASE WHEN coalesce(sa.n, 0) + coalesce(sb.n, 0)
                 - coalesce(i.i, 0) = 0 THEN 1.0
            ELSE coalesce(i.i, 0) * 1.0
                 / (coalesce(sa.n, 0) + coalesce(sb.n, 0)
                    - coalesce(i.i, 0)) END AS jaccard5
FROM pairs p
LEFT JOIN sizes sa ON sa.doc_id = p.a
LEFT JOIN sizes sb ON sb.doc_id = p.b
LEFT JOIN inter i ON i.a = p.a AND i.b = p.b
ORDER BY p.a
"""

ORACLE = {
    "quality_training_mix_documents": QUALITY_MIX_SQL,
    "dsir_weights_documents": DSIR_SQL,
    "dsir_select_documents": DSIR_SELECT_SQL,
    "gopher_rules_documents": GOPHER_SQL,
    "terms_error_bounds_documents": TERMS_EB_SQL,
    "dataset_summary_documents": DATASET_SUMMARY_SQL,
    "ngram_jaccard_adjacent": NGRAM_JACCARD_SQL,
    "categorize_text_documents": CATEGORIZE_SQL,
    "significant_text_documents": SIGNIFICANT_TEXT_SQL,
    "doc_token_counts": TOKEN_COUNTS_SQL,
    "chunk_documents": CHUNK_SQL,
    "pack_training_sequences": PACK_SQL,
    "curate_documents": CURATE_SQL,
    "doc_term_df": TERM_DF_SQL,
    "doc_fingerprint": FINGERPRINT_SQL,
    "dedup_exact": DEDUP_EXACT_SQL,
    "doc_quality_scores": QUALITY_SQL,
    "lang_id_documents": LANG_ID_SQL,
    "stratified_sample_documents": STRATIFIED_SQL,
    "pii_scrub_documents": PII_SCRUB_SQL,
    "repetition_scores_documents": REPETITION_SQL,
    "passage_dedup_documents": PASSAGE_DEDUP_SQL,
    "substring_dedup_spans_documents": SUBSTRING_SPANS_SQL,
    "contamination_check_documents": CONTAMINATION_SQL,
    "training_mix_sample": TRAINING_MIX_SQL,
    "temperature_mix_documents": TEMPERATURE_MIX_SQL,
    "training_shuffle_order": TRAINING_SHUFFLE_SQL,
    # sketch ops intentionally have no SQL oracle (rows-only check);
    # they are verified against brute-force oracles in tests/.
}
