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

import numpy as np
import pyarrow as pa

TOKEN_PATTERN = "[a-z0-9_]+"
STOP_PATTERNS = {
    "en": r"\b(the|a|of|and|is)\b",
    "de": r"\b(der|die|das|und|ist)\b",
    "fr": r"\b(le|la|les|et|est)\b",
    "es": r"\b(el|los|las|y|es)\b",
}


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
    class Stage(TextStats):
        def __call__(self, t: pa.Table) -> pa.Table:
            n = [len(self.tokens(x)) for x in t["text"].to_pylist()]
            return pa.table({"doc_id": t["doc_id"],
                             "n_tokens": pa.array(n, pa.int64())})

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        Stage(), batch_format="pyarrow")


TOKEN_COUNTS_SQL = f"""
SELECT doc_id, len(regexp_extract_all(lower(text), '{TOKEN_PATTERN}')) AS n_tokens
FROM documents
"""


# ------------------------------------------------ term df (tokenize) --

def doc_term_df(sf_dir: str):
    """The tokenize → groupby(term) df aggregation — the core of the
    index build, checked against a pure-SQL unnest oracle."""
    from ray.data.aggregate import Sum

    class Stage(TextStats):
        def __call__(self, t: pa.Table) -> pa.Table:
            # per-batch partial df: one row per (term) with count of
            # docs containing it in this batch (terms deduped per doc)
            from collections import Counter
            c: Counter = Counter()
            for x in t["text"].to_pylist():
                c.update(set(self.tokens(x)))
            items = sorted(c.items())
            return pa.table({"term": pa.array([k for k, _ in items], pa.string()),
                             "df_part": pa.array([v for _, v in items], pa.int64())})

    return (_read_docs(sf_dir, ["text"])
            .map_batches(Stage(), batch_format="pyarrow")
            .groupby("term").aggregate(Sum("df_part", alias_name="df")))


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
            n_tok, n_uniq, tot_len = [], [], []
            for x in t["text"].to_pylist():
                toks = self.tokens(x)
                n_tok.append(len(toks))
                n_uniq.append(len(set(toks)))
                tot_len.append(sum(len(w) for w in toks))
            n_tok = np.array(n_tok, dtype=np.int64)
            n_uniq = np.array(n_uniq, dtype=np.int64)
            tot_len = np.array(tot_len, dtype=np.int64)
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

def lang_id_documents(sf_dir: str):
    """n-gram/stopword language-ID heuristic with a fixed precedence
    (en > de > fr > es > und), replicated exactly in SQL."""
    class Stage(TextStats):
        def __call__(self, t: pa.Table) -> pa.Table:
            guesses, totals = [], []
            for x in t["text"].to_pylist():
                low = x.lower()
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

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        Stage(), batch_format="pyarrow")


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
    import zlib
    if len(tokens) < k:
        return {zlib.crc32(" ".join(tokens).encode())} if tokens else set()
    return {zlib.crc32(" ".join(tokens[i:i + k]).encode())
            for i in range(len(tokens) - k + 1)}


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

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, bands, keys = [], [], []
        rows_per_band = self.N_HASHES // self.N_BANDS
        for did, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            sig = self.signature(text)
            for bi in range(self.N_BANDS):
                chunk = sig[bi * rows_per_band:(bi + 1) * rows_per_band]
                ids.append(did)
                bands.append(bi)
                keys.append(hash(tuple(chunk.tolist())) & 0x7FFFFFFFFFFFFFFF)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "band": pa.array(bands, pa.int32()),
                         "band_key": pa.array(keys, pa.int64())})


def minhash_lsh_candidates(sf_dir: str, jaccard_threshold: float = 0.2):
    """MinHash-LSH near-dup: shingle→minhash→band → groupby(band,key)
    → candidate pairs → exact-Jaccard verification (broadcast token
    sets; at scale this verify joins back to docs by id instead)."""
    import ray
    import pyarrow.parquet as pq
    import itertools

    # NOTE: `hash()` on tuples is salted per interpreter; band keys are
    # only compared within one driver session, which is all LSH needs.
    docs = _read_docs(sf_dir, ["doc_id", "text"])
    sig = docs.map_batches(MinHashStage(), batch_format="pyarrow")

    def pairs_of_group(g: pa.Table) -> pa.Table:
        ids = sorted(set(g["doc_id"].to_pylist()))
        a, b = [], []
        for x, y in itertools.combinations(ids, 2):
            a.append(x); b.append(y)
        return pa.table({"a": pa.array(a, pa.int64()), "b": pa.array(b, pa.int64())})

    cand = sig.groupby(["band", "band_key"]).map_groups(
        pairs_of_group, batch_format="pyarrow")
    cand_tbl = pa.concat_tables(
        list(cand.iter_batches(batch_format="pyarrow", batch_size=1 << 20))
        or [pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})])
    if cand_tbl.num_rows == 0:
        return pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
                         "jaccard": pa.array([], pa.float64())})
    uniq_pairs = sorted({(x, y) for x, y in zip(cand_tbl["a"].to_pylist(),
                                                cand_tbl["b"].to_pylist())})
    # exact verify (candidate set is small by construction)
    st = TextStats()
    toks: dict[int, set] = {}
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    need = {i for p in uniq_pairs for i in p}
    for did, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        if did in need:
            toks[did] = _shingles(st.tokens(text))
    out_a, out_b, out_j = [], [], []
    for x, y in uniq_pairs:
        sx, sy = toks[x], toks[y]
        j = len(sx & sy) / len(sx | sy) if (sx or sy) else 1.0
        if j >= jaccard_threshold:
            out_a.append(x); out_b.append(y); out_j.append(round(j, 6))
    return pa.table({"a": pa.array(out_a, pa.int64()),
                     "b": pa.array(out_b, pa.int64()),
                     "jaccard": pa.array(out_j, pa.float64())})


class SimHashStage(TextStats):
    """64-bit SimHash per doc from token hashes (stable crc-based)."""

    def simhash(self, text: str) -> int:
        import zlib
        acc = np.zeros(64, dtype=np.int64)
        shifts = np.arange(64, dtype=np.uint64)
        for w in self.tokens(text):
            h = np.uint64((zlib.crc32(w.encode()) << 32) | zlib.crc32(w[::-1].encode()))
            bits = ((h >> shifts) & np.uint64(1)).astype(np.int64)
            acc += np.where(bits == 1, 1, -1)
        out = 0
        for i in range(64):
            if acc[i] > 0:
                out |= (1 << i)
        return out & 0x7FFFFFFFFFFFFFFF

    def __call__(self, t: pa.Table) -> pa.Table:
        hs = [self.simhash(x) for x in t["text"].to_pylist()]
        return pa.table({"doc_id": t["doc_id"],
                         "simhash": pa.array(hs, pa.int64())})


def simhash_signatures(sf_dir: str):
    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        SimHashStage(), batch_format="pyarrow")


def simhash_dup_pairs(sf_dir: str, max_hamming: int = 3):
    """SimHash near-dup pairs via 4×16-bit band buckets (a pair within
    hamming ≤ 3 of 64 bits must agree on ≥1 of 4 bands)."""
    sig = simhash_signatures(sf_dir)
    rows = pa.concat_tables(
        list(sig.iter_batches(batch_format="pyarrow", batch_size=1 << 20)))
    ids = rows["doc_id"].to_numpy(zero_copy_only=False)
    hs = rows["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
    from collections import defaultdict
    buckets = defaultdict(list)
    for i in range(len(ids)):
        for b in range(4):
            buckets[(b, int((hs[i] >> np.uint64(16 * b)) & np.uint64(0xFFFF)))].append(i)
    seen = set()
    out_a, out_b, out_d = [], [], []
    for idxs in buckets.values():
        if len(idxs) < 2:
            continue
        import itertools
        for i, j in itertools.combinations(sorted(set(idxs)), 2):
            key = (int(ids[i]), int(ids[j]))
            if key in seen:
                continue
            seen.add(key)
            d = int(bin(int(hs[i]) ^ int(hs[j])).count("1"))
            if d <= max_hamming:
                out_a.append(key[0]); out_b.append(key[1]); out_d.append(d)
    return pa.table({"a": pa.array(out_a, pa.int64()),
                     "b": pa.array(out_b, pa.int64()),
                     "hamming": pa.array(out_d, pa.int64())})


def ngram_jaccard_adjacent(sf_dir: str, n: int = 5):
    """Character-n-gram Jaccard for adjacent doc_id pairs — linear-cost
    exercise of the n-gram similarity kernel."""
    import pyarrow.parquet as pq
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    ids = t["doc_id"].to_pylist()
    texts = t["text"].to_pylist()
    order = np.argsort(ids)
    out_a, out_b, out_j = [], [], []
    grams = {}

    def g(s):
        return {s[i:i + n] for i in range(max(0, len(s) - n + 1))}

    for k in range(len(order) - 1):
        i, j = order[k], order[k + 1]
        if ids[i] not in grams:
            grams[ids[i]] = g(texts[i])
        if ids[j] not in grams:
            grams[ids[j]] = g(texts[j])
        sx, sy = grams[ids[i]], grams[ids[j]]
        jac = len(sx & sy) / len(sx | sy) if (sx or sy) else 1.0
        out_a.append(ids[i]); out_b.append(ids[j]); out_j.append(round(jac, 6))
    return pa.table({"a": pa.array(out_a, pa.int64()),
                     "b": pa.array(out_b, pa.int64()),
                     "jaccard5": pa.array(out_j, pa.float64())})


QUERIES = {
    "doc_token_counts": doc_token_counts,
    "doc_term_df": doc_term_df,
    "doc_fingerprint": doc_fingerprint,
    "dedup_exact": dedup_exact,
    "doc_quality_scores": doc_quality_scores,
    "lang_id_documents": lang_id_documents,
    "minhash_lsh_candidates": minhash_lsh_candidates,
    "simhash_signatures": simhash_signatures,
    "simhash_dup_pairs": simhash_dup_pairs,
    "ngram_jaccard_adjacent": ngram_jaccard_adjacent,
}

ORACLE = {
    "doc_token_counts": TOKEN_COUNTS_SQL,
    "doc_term_df": TERM_DF_SQL,
    "doc_fingerprint": FINGERPRINT_SQL,
    "dedup_exact": DEDUP_EXACT_SQL,
    "doc_quality_scores": QUALITY_SQL,
    "lang_id_documents": LANG_ID_SQL,
    # sketch ops intentionally have no SQL oracle (rows-only check);
    # they are verified against brute-force oracles in tests/.
}
