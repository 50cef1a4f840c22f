"""Lifecycle verification drive: build → query-vs-oracle → delta
(with redelivery) → compact → distributed, asserting engine/oracle
rank identity (doc ids AND float64 scores) at every stage for a set
of query variants.

This is the /verify recipe as one command:

    PYTHONPATH=/root/repo python scripts/lifecycle_drive.py [variant ...]

Variants (default: all): or, and, common_terms, script_score,
terms_set, min_match, phrase, span_near, intervals.
Positional variants build with store_positions=True.
"""

from __future__ import annotations

import glob
import hashlib
import shutil
import sys

import numpy as np


def _load_docs(root, by_sha):
    import pyarrow.parquet as pq

    from mee_ray import manifest as mf
    ep = mf.current_epoch(root)
    files = list(mf.docs_files(root, ep)) + glob.glob(
        f"{root}/epochs/{ep}/deltas/*/added_docs.parquet")
    docs = []
    for f in files:
        t = pq.read_table(f, columns=["doc_id", "content_sha256"])
        for d, h in zip(t["doc_id"].to_pylist(),
                        t["content_sha256"].to_pylist()):
            docs.append((d, by_sha[h]))
    return docs


def _cases(oracle, variant):
    """Deterministic query cases per variant, drawn from the oracle's
    own df ordering / token streams."""
    by_df = sorted(oracle.postings,
                   key=lambda t: (-len(oracle.postings[t]), t))
    qs = [[by_df[0], by_df[-1]], [by_df[1], by_df[5], by_df[-3]],
          [by_df[2]], [by_df[0], by_df[3]], ["zz_none", by_df[0]]]
    if variant in ("phrase", "span_near", "intervals"):
        # real adjacent windows from doc token streams
        from mee_ray.config import TokenizerConfig
        from mee_ray.tokenizer import Tokenizer
        tok = Tokenizer(TokenizerConfig())
        out = []
        for i, (_, c) in enumerate(sorted(oracle.docs.items())[:25]):
            seq = tok.terms(c)
            if len(seq) > 12:
                out.append(seq[2:4])
                if i % 3 == 0:
                    out.append(seq[5:8])
        return out[:12] + [["zz_none", "also_gone"]]
    if variant == "span_multi":
        # (prefix, anchor-term) pairs: the prefix slot is re-expanded
        # per query against EACH side's own current vocabulary, so the
        # dictionary rewrite is exercised against delta/compact vocab
        # changes, not a frozen expansion
        from mee_ray.config import TokenizerConfig
        from mee_ray.tokenizer import Tokenizer
        tok = Tokenizer(TokenizerConfig())
        out = []
        for _, c in sorted(oracle.docs.items())[:25]:
            seq = tok.terms(c)
            if len(seq) > 12:
                out.append((seq[3][:2], seq[6]))
        return out[:10]
    if variant == "prefix":
        # prefixes re-expanded per query against each side's CURRENT
        # vocabulary (delta/compact add terms; a frozen expansion
        # would miss them)
        return [by_df[0][:2], by_df[1][:3], by_df[-1][:1],
                by_df[4][:2], "zzzz"]
    if variant == "fuzzy":
        alt = by_df[3][:-1] + "x" if len(by_df[3]) > 3 else by_df[3]
        return [by_df[0], alt, by_df[7], "zz_none"]
    if variant in ("span_containing", "span_or_near"):
        from mee_ray.config import TokenizerConfig
        from mee_ray.tokenizer import Tokenizer
        tok = Tokenizer(TokenizerConfig())
        out = []
        for _, c in sorted(oracle.docs.items())[:25]:
            seq = tok.terms(c)
            if len(seq) > 12:
                if variant == "span_containing":
                    out.append(([seq[2], seq[6]], 4, seq[4]))
                else:
                    out.append(([[seq[2], seq[9]], [seq[4]]], 3))
        return out[:10]
    return qs


def _run(searcher, oracle, variant, q):
    k = 10
    if variant == "or":
        return searcher.search(q, k=k), oracle.search(q, k=k)
    if variant == "and":
        return (searcher.search(q, k=k, operator="and"),
                oracle.search_and(q, k=k))
    if variant == "common_terms":
        return (searcher.search_common_terms(q, 0.3, k=k),
                oracle.search_common_terms(q, 0.3, k=k))
    if variant == "script_score":
        got = searcher.search_script_score(
            q, "div(mul(_score, dl), sum(dl, 10))", k=k)
        full = oracle.search(q, k=oracle.n_docs + 1)
        resc = [(d, sc * oracle.dl[d] / (oracle.dl[d] + 10))
                for d, sc in full]
        want = sorted(resc, key=lambda x: (-x[1], x[0]))[:k]
        return got, want
    if variant == "prefix":
        got = searcher.search_prefix(q, k=k)
        terms = sorted(t for t in oracle.postings if t.startswith(q))
        want = oracle.search(terms, k=k) if terms else []
        return got, want
    if variant == "fuzzy":
        def _lev_le1(a: str, b: str) -> bool:
            # independent oracle-side edit-distance<=1 (unit costs,
            # no transposition) -- NOT the engine's fuzzy_terms
            if a == b:
                return True
            la, lb = len(a), len(b)
            if abs(la - lb) > 1:
                return False
            if la == lb:
                return sum(x != y for x, y in zip(a, b)) == 1
            if la > lb:
                a, b, la, lb = b, a, lb, la
            i = j = used = 0
            while i < la and j < lb:
                if a[i] == b[j]:
                    i += 1
                    j += 1
                else:
                    if used:
                        return False
                    used = 1
                    j += 1
            return True
        got = searcher.search_fuzzy(q, k=k, max_edits=1)
        terms = sorted(t for t in oracle.postings if _lev_le1(t, q))
        want = oracle.search(terms, k=k) if terms else []
        return got, want
    if variant == "terms_set":
        thr = int(np.median(list(oracle.dl.values()))) if oracle.dl else 1
        got = searcher.search_terms_set(q, k=k, dl_threshold=thr)
        full = dict(oracle.search(q, k=oracle.n_docs + 1))
        counts: dict[int, int] = {}
        for t in set(q):
            for d in oracle.postings.get(t, {}):
                counts[d] = counts.get(d, 0) + 1
        want = sorted(((d, full[d]) for d, c in counts.items()
                       if c >= (1 if oracle.dl[d] < thr else 2)),
                      key=lambda x: (-x[1], x[0]))[:k]
        return got, want
    if variant == "min_match":
        return (searcher.search_min_match(q, k=k, min_match=2),
                oracle.search_min_match(q, k=k, min_match=2))
    if variant == "phrase":
        return (searcher.search_phrase(q, k=k),
                oracle.search_phrase(q, k=k))
    if variant == "span_near":
        return (searcher.search_span_near(q, 2, k=k),
                oracle.search_span_near(q, 2, k=k))
    if variant == "intervals":
        if len(set(q)) != len(q):
            return [], []
        return (searcher.search_intervals(q, max_gaps=3, ordered=True,
                                          k=k),
                oracle.search_intervals(q, max_gaps=3, ordered=True,
                                        k=k))
    if variant == "span_containing":
        big, slop, little = q
        if len(set(big)) < 2:
            return [], []
        return (searcher.search_span_containing(big, slop, little,
                                                k=k),
                oracle.search_span_containing(big, slop, little, k=k))
    if variant == "span_or_near":
        slots, slop = q
        return (searcher.search_span_or_near(slots, slop, k=k),
                oracle.search_span_or_near(slots, slop, k=k))
    if variant == "span_multi":
        from mee_ray.query import prefix_terms
        prefix, anchor = q
        cap = 16
        got_slot = prefix_terms(searcher.vocabulary(), prefix)[:cap]
        want_slot = sorted(t for t in oracle.postings
                           if t.startswith(prefix))[:cap]
        got = (searcher.search_span_or_near([got_slot, [anchor]], 2,
                                            k=k) if got_slot else [])
        want = (oracle.search_span_or_near([want_slot, [anchor]], 2,
                                           k=k) if want_slot else [])
        return got, want
    raise SystemExit(f"unknown variant {variant!r}")


ALL = ["or", "and", "common_terms", "script_score", "terms_set",
       "min_match", "prefix", "fuzzy", "phrase", "span_near",
       "intervals", "span_containing", "span_or_near", "span_multi"]


def main():
    variants = sys.argv[1:] or ALL
    positional = any(v in ("phrase", "span_near", "intervals",
                           "span_containing", "span_or_near",
                           "span_multi")
                     for v in variants)

    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    import ray.data
    ray.data.DataContext.get_current().enable_progress_bars = False
    import pyarrow as pa
    import pyarrow.parquet as pq

    from mee_ray.build import build_index
    from mee_ray.config import EngineConfig, TokenizerConfig
    from mee_ray.corpus import write_corpus
    from mee_ray.delta import apply_delta
    from mee_ray.merge import compact
    from mee_ray.oracle import OracleIndex
    from mee_ray.query import DistributedSearcher, Searcher

    root = "/tmp/mee_lifecycle_drive/index"
    cdir = "/tmp/mee_lifecycle_drive/corpus"
    shutil.rmtree(root, ignore_errors=True)
    if not glob.glob(f"{cdir}/*.parquet"):
        write_corpus(cdir, n_files=600, seed=5, rows_per_file=100,
                     content_scale=2)
    cfg = EngineConfig(num_shards=4, parts_per_shard=2,
                       store_positions=positional,
                       tokenizer=TokenizerConfig())
    build_index(ray.data.read_parquet(cdir), root, "ep1", cfg,
                dedup=True)

    by_sha = {}
    for f in glob.glob(f"{cdir}/*.parquet"):
        t = pq.read_table(f, columns=["content"])
        for c in t["content"].to_pylist():
            by_sha[hashlib.sha256(c.encode()).digest()] = c

    def check(stage):
        docs = _load_docs(root, by_sha)
        oracle = OracleIndex(docs, store_positions=positional)
        oracle.docs = dict(docs)
        s = Searcher(root)
        for v in variants:
            hits = 0
            for q in _cases(oracle, v):
                got, want = _run(s, oracle, v, q)
                assert got == want, (stage, v, q, got[:2], want[:2])
                hits += bool(got)
            print(f"  {stage:>18} {v:<14} identical ({hits} non-empty)")

    check("post-build")

    # long-lived-reader cache coherence: ONE CachedSearcher created
    # here must keep serving post-delta and post-compact results
    # identical to a fresh Searcher (generation invalidation), with
    # hits in between (copy-on-hit identity)
    from mee_ray.query import CachedSearcher
    cache = CachedSearcher(root)

    def cache_probe(stage):
        fresh = Searcher(root)
        for q in (["alpha"], ["merge", "sort"], ["driveterm"]):
            for _ in range(2):     # second call must be a cache hit
                assert cache.search(q, k=10) == fresh.search(q, k=10), \
                    (stage, q)
        print(f"  {stage:>18} {'cache':<14} coherent "
              f"(inv={cache.invalidations} hit={cache.hits})")

    cache_probe("post-build")
    rows = [{"seq": i + 1, "type": "INSERT", "repo": "drive/d",
             "path": f"n{i}.py", "commit": "b" * 40, "lang": "python",
             "content": f"driveterm alpha beta gamma merge sort "
                        f"tok_{i}\n"}
            for i in range(25)]
    for r in rows:
        by_sha[hashlib.sha256(r["content"].encode()).digest()] = \
            r["content"]
    cols = ("seq", "type", "repo", "path", "commit", "lang", "content")
    ev = pa.table({c: pa.array([r.get(c) for r in rows]) for c in cols})
    apply_delta(ev, root)
    apply_delta(ev, root)      # at-least-once redelivery must no-op
    check("post-delta")
    cache_probe("post-delta")
    compact(root, "ep.c1", gc_old=True)
    check("post-compact")
    cache_probe("post-compact")
    assert cache.invalidations >= 2, "delta+compact must each invalidate"
    assert cache.hits >= 9, "repeat queries must be served from cache"

    docs = _load_docs(root, by_sha)
    oracle = OracleIndex(docs, store_positions=positional)
    oracle.docs = dict(docs)
    ds = DistributedSearcher(root, n_actors=3)
    try:
        for v in variants:
            for q in _cases(oracle, v)[:4]:
                if v == "or":
                    got, want = ds.search(q, k=10), oracle.search(q, k=10)
                elif v == "and":
                    got = ds.search(q, k=10, operator="and")
                    want = oracle.search_and(q, k=10)
                else:
                    got, want = _run(ds, oracle, v, q)
                assert got == want, ("distributed", v, q)
            print(f"  {'distributed':>18} {v:<14} identical")
    finally:
        ds.shutdown()
    ray.shutdown()
    print("LIFECYCLE DRIVE OK:", ", ".join(variants))


if __name__ == "__main__":
    main()
