"""Mergeable cardinality sketch: HyperLogLog distinct counting.

Distributed distinct-count WITHOUT a distinct shuffle: each map_batches
task folds its rows into 2^p max-registers (vectorized numpy — hash,
index bits, leading-zero rank), so the exchange carries ONE 2^p-byte
vector per batch regardless of row count, and merging is an
elementwise max (associative + commutative + idempotent — batch
boundaries, retries, and merge order cannot change the result).
Standard error ≈ 1.04/√(2^p) (~1.6 % at p = 12); small cardinalities
fall back to linear counting over the zero registers, making counts
below ~2.5·2^p near-exact.  Public-knowledge algorithm (Flajolet et
al., HyperLogLog; splitmix64 finalizer for the hash).

The exact companion query (`count(DISTINCT ...)`) is SQL-expressible,
so the driver gate checks the exact side; the sketch itself is
verified by error-bound and merge-identity tests.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

HLL_P = 12                      # 4096 registers ≈ 1.6 % standard error
_M = 1 << HLL_P


def _hash64(v: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — a well-mixed 64-bit hash, vectorized."""
    x = v.astype(np.uint64, copy=True)
    x += np.uint64(0x9E3779B97F4A7C15)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def _clz64(x: np.ndarray) -> np.ndarray:
    """Vectorized count-leading-zeros of uint64 (64 for x == 0 — the
    shift accumulation alone tops out at 63, so zero is special-cased
    to honor the contract)."""
    zero = x == 0
    x = x.copy()
    clz = np.zeros(len(x), dtype=np.int64)
    for s in (32, 16, 8, 4, 2, 1):
        m = x < (np.uint64(1) << np.uint64(64 - s))
        clz += np.where(m, s, 0)
        x = np.where(m, x << np.uint64(s), x)
    return np.where(zero, 64, clz)


def hll_fold(values: np.ndarray, registers: np.ndarray) -> np.ndarray:
    """Fold int64/uint64 values into 2^p uint8 registers (in place)."""
    h = _hash64(values)
    idx = (h >> np.uint64(64 - HLL_P)).astype(np.int64)
    w = h << np.uint64(HLL_P)        # remaining 64-p bits, left-aligned
    rho = np.minimum(_clz64(w), 64 - HLL_P).astype(np.uint8) + np.uint8(1)
    np.maximum.at(registers, idx, rho)
    return registers


def hll_estimate(registers: np.ndarray) -> float:
    """Bias-corrected estimate with the linear-counting small-range
    fallback."""
    m = float(_M)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    e = alpha * m * m / np.sum(np.exp2(-registers.astype(np.float64)))
    zeros = int(np.sum(registers == 0))
    if e <= 2.5 * m and zeros > 0:
        e = m * np.log(m / zeros)
    return float(e)


def hll_sketch_column(ds, column: str) -> np.ndarray:
    """Sketch a Ray Dataset column: per-batch register partials (one
    2^p-byte row per batch crosses the wire), elementwise-max merge on
    the driver."""

    def partial(t: pa.Table, col=column) -> pa.Table:
        import pyarrow.compute as pc
        reg = np.zeros(_M, dtype=np.uint8)
        # drop nulls ARROW-side: a nullable int64 column converts to
        # float64-with-NaN in numpy (not object), and NaN→uint64 is a
        # platform-dependent bit pattern that would both count NULL as
        # a distinct value and break merge determinism
        vals = pc.drop_null(t[col]).to_numpy(zero_copy_only=False)
        hll_fold(vals.astype(np.int64, copy=False)
                 if vals.dtype.kind in "fiu" else vals, reg)
        return pa.table({"registers": pa.array([reg.tobytes()],
                                               pa.binary())})

    merged = np.zeros(_M, dtype=np.uint8)
    for b in (ds.map_batches(partial, batch_format="pyarrow",
                             zero_copy_batch=True)
              .iter_batches(batch_format="pyarrow", batch_size=1 << 10)):
        for buf in b["registers"].to_pylist():
            np.maximum(merged, np.frombuffer(buf, dtype=np.uint8),
                       out=merged)
    return merged


def hll_distinct_counts(sf_dir: str):
    """Approximate distinct counts over several columns, one sketch
    per column (rows-only: the estimate is approximate by design; the
    exact companions are separate oracle-checked queries and the error
    bound is asserted in tests)."""
    import ray.data

    specs = [("events", "user_id"), ("events", "event_id"),
             ("lineitem", "l_orderkey"), ("orders", "o_custkey")]
    cols, ests = [], []
    for table, col in specs:
        ds = ray.data.read_parquet(f"{sf_dir}/{table}.parquet",
                                   columns=[col])
        reg = hll_sketch_column(ds, col)
        cols.append(f"{table}.{col}")
        ests.append(int(round(hll_estimate(reg))))
    return pa.table({"column": pa.array(cols, pa.string()),
                     "hll_estimate": pa.array(ests, pa.int64())})


def exact_distinct_counts(sf_dir: str):
    """Exact distributed companion (groupby-distinct then count) for
    the same columns — SQL-expressible, value-hash-checked."""
    import ray.data

    specs = [("events", "user_id"), ("events", "event_id"),
             ("lineitem", "l_orderkey"), ("orders", "o_custkey")]
    cols, ns = [], []
    for table, col in specs:
        ds = ray.data.read_parquet(f"{sf_dir}/{table}.parquet",
                                   columns=[col])

        def distinct_part(t: pa.Table, c=col) -> pa.Table:
            import pyarrow.compute as pc
            # Arrow-native distinct: SQL count(DISTINCT) excludes
            # NULLs, and numpy's unique would either crash on object
            # arrays containing None or count NaN as a value
            return pa.table({c: pc.unique(pc.drop_null(
                t[c].combine_chunks()))})

        uniq = (ds.map_batches(distinct_part, batch_format="pyarrow",
                               zero_copy_batch=True)
                .groupby(col).count())
        cols.append(f"{table}.{col}")
        ns.append(uniq.count())
    return pa.table({"column": pa.array(cols, pa.string()),
                     "n_distinct": pa.array(ns, pa.int64())})


EXACT_DISTINCT_SQL = """
SELECT * FROM (
  SELECT 'events.user_id' AS column, count(DISTINCT user_id) AS n_distinct FROM events
  UNION ALL
  SELECT 'events.event_id', count(DISTINCT event_id) FROM events
  UNION ALL
  SELECT 'lineitem.l_orderkey', count(DISTINCT l_orderkey) FROM lineitem
  UNION ALL
  SELECT 'orders.o_custkey', count(DISTINCT o_custkey) FROM orders
)
"""

# ------------------------------------------------- heavy hitters ----

HH_CAPACITY = 512     # per-batch summary size m
HH_TOPK = 30


def _hh_summaries(sf_dir: str):
    """Per-batch truncated-counter summaries (SpaceSaving-style,
    Metwally et al.): exact batch term counts cut to the top
    ``HH_CAPACITY``, plus the count of the heaviest DROPPED term as
    the batch's error bound.  Each summary is ≤ m rows regardless of
    batch size — the same bounded-transport discipline as the HLL
    registers; merge at larger batch counts becomes a tree-reduce."""
    import re

    import ray.data

    from mee_ray.pipelines.text import TOKEN_PATTERN

    tok = re.compile(TOKEN_PATTERN)

    def summary(t: pa.Table) -> pa.Table:
        import os as _os
        from collections import Counter
        c: Counter = Counter()
        for x in t["text"].to_pylist():
            c.update(tok.findall(x.lower()))
        items = c.most_common()
        kept = items[:HH_CAPACITY]
        err = items[HH_CAPACITY][1] if len(items) > HH_CAPACITY else 0
        # unique summary id: Ray Data may coalesce several batch
        # outputs into ONE block, and naively treating a block as one
        # summary would drop duplicate terms' counts (breaking the
        # count_max ≥ true-count bound) — the id keeps each summary
        # self-delimiting through any block re-bundling
        sid = _os.urandom(8).hex()
        return pa.table({
            "sid": pa.array([sid] * len(kept), pa.string()),
            "term": pa.array([k for k, _ in kept], pa.string()),
            "cnt": pa.array([v for _, v in kept], pa.int64()),
            "err": pa.array([err] * len(kept), pa.int64()),
        })

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["text"])
    by_sid: dict[str, tuple[dict, int]] = {}
    for b in (ds.map_batches(summary, batch_format="pyarrow",
                             zero_copy_batch=True)
              .iter_batches(batch_format="pyarrow", batch_size=None)):
        sids = b["sid"].to_pylist()
        terms = b["term"].to_pylist()
        cnts = b["cnt"].to_numpy(zero_copy_only=False)
        errs = b["err"].to_numpy(zero_copy_only=False)
        for sid, term, cnt, err in zip(sids, terms, cnts, errs):
            m, _ = by_sid.setdefault(sid, ({}, int(err)))
            m[term] = int(cnt)
    return list(by_sid.values())


def heavy_hitters_terms(sf_dir: str):
    """Approximate top terms by total occurrence count with
    deterministic error BOUNDS: for every emitted term,
    ``count_min ≤ true count ≤ count_max`` (count_min sums the counts
    of summaries that kept the term; count_max adds each dropping
    summary's error).  Rows-only by design — the exact companion
    ``exact_top_terms`` is the oracle-checked side, and the bounds
    invariant is asserted in tests."""
    summaries = _hh_summaries(sf_dir)
    lower: dict[str, int] = {}
    for m, _ in summaries:
        for term, c in m.items():
            lower[term] = lower.get(term, 0) + c
    upper = {}
    for term in lower:
        upper[term] = sum(m.get(term, err) for m, err in summaries)
    ranked = sorted(lower, key=lambda t: (-lower[t], t))[:HH_TOPK]
    return pa.table({
        "term": pa.array(ranked, pa.string()),
        "count_min": pa.array([lower[t] for t in ranked], pa.int64()),
        "count_max": pa.array([upper[t] for t in ranked], pa.int64()),
    })


def exact_top_terms(sf_dir: str):
    """Exact distributed companion: total term-occurrence counts →
    top-``HH_TOPK`` by (count desc, term asc).  No global sort: after
    the groupby every term lives in exactly one block, so the union of
    per-block top-k contains the global top-k and the driver merges a
    few k-row partials."""
    import re

    import ray.data
    from ray.data.aggregate import Sum

    from mee_ray.pipelines.text import TOKEN_PATTERN

    tok = re.compile(TOKEN_PATTERN)

    def counts(t: pa.Table) -> pa.Table:
        from collections import Counter
        c: Counter = Counter()
        for x in t["text"].to_pylist():
            c.update(tok.findall(x.lower()))
        items = sorted(c.items())
        return pa.table({"term": pa.array([k for k, _ in items], pa.string()),
                         "n_part": pa.array([v for _, v in items], pa.int64())})

    def local_topk(t: pa.Table) -> pa.Table:
        import numpy as np
        n = t["n"].to_numpy(zero_copy_only=False)
        terms = np.array(t["term"].to_pylist(), dtype=object)
        order = np.lexsort((terms, -n))[:HH_TOPK]
        return t.take(pa.array(order))

    grouped = (ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                     columns=["text"])
               .map_batches(counts, batch_format="pyarrow",
                            zero_copy_batch=True)
               .groupby("term").aggregate(Sum("n_part", alias_name="n"))
               .map_batches(local_topk, batch_format="pyarrow"))
    parts = list(grouped.iter_batches(batch_format="pyarrow",
                                      batch_size=None))
    t = (pa.concat_tables(parts) if parts
         else pa.table({"term": pa.array([], pa.string()),
                        "n": pa.array([], pa.int64())}))
    import numpy as np
    n = t["n"].to_numpy(zero_copy_only=False)
    terms = np.array(t["term"].to_pylist(), dtype=object)
    order = np.lexsort((terms, -n))[:HH_TOPK]
    t = t.take(pa.array(order))
    return t.append_column("rank", pa.array(
        np.arange(1, t.num_rows + 1), pa.int64()))


def _exact_top_terms_sql() -> str:
    from mee_ray.pipelines.text import TOKEN_PATTERN
    return f"""
SELECT term, CAST(n AS BIGINT) AS n,
       row_number() OVER (ORDER BY n DESC, term) AS rank
FROM (SELECT term, count(*) AS n
      FROM (SELECT unnest(regexp_extract_all(lower(text), '{TOKEN_PATTERN}'))
                   AS term
            FROM documents)
      GROUP BY term)
ORDER BY n DESC, term
LIMIT {HH_TOPK}
"""


EXACT_TOP_TERMS_SQL = _exact_top_terms_sql()


# --- KLL-style quantile sketch ---------------------------------------------
#
# Mergeable rank sketch (Karnin–Lang–Liberty shape, deterministic
# variant): level-l values carry weight 2^l; when a level buffer
# exceeds K it is sorted and every SECOND element promotes one level.
# Real KLL randomizes the even/odd choice; here the choice alternates
# deterministically per compaction (tracked per level), which keeps the
# pipeline reproducible across runs/partitionings at slightly worse
# error constants.  Space O(K log(n/K)) per key, single pass, and the
# per-batch partial that crosses the exchange is the sketch itself —
# never raw values.

KLL_K = 256


def _kll_compact(levels: list[np.ndarray], parity: int) -> int:
    """Compact in place: promote every second element of each
    overfull level.  ``parity`` alternates the kept offset."""
    li = 0
    while li < len(levels):
        if len(levels[li]) > KLL_K:
            buf = np.sort(levels[li])
            keep = buf[(parity & 1)::2]
            parity += 1
            levels[li] = np.empty(0, dtype=np.float64)
            if li + 1 == len(levels):
                levels.append(keep)
            else:
                levels[li + 1] = np.concatenate([levels[li + 1], keep])
        li += 1
    return parity


def _kll_add(levels: list[np.ndarray], vals: np.ndarray,
             parity: int) -> int:
    levels[0] = np.concatenate([levels[0], vals.astype(np.float64)])
    return _kll_compact(levels, parity)


def _kll_merge(a: list[np.ndarray], b: list[np.ndarray],
               parity: int) -> int:
    while len(a) < len(b):
        a.append(np.empty(0, dtype=np.float64))
    for li, buf in enumerate(b):
        a[li] = np.concatenate([a[li], buf])
    return _kll_compact(a, parity)


def _kll_quantile(levels: list[np.ndarray], q: float) -> float:
    vals = np.concatenate([b for b in levels if len(b)] or
                          [np.empty(0, dtype=np.float64)])
    wts = np.concatenate(
        [np.full(len(b), 1 << li, dtype=np.int64)
         for li, b in enumerate(levels) if len(b)] or
        [np.empty(0, dtype=np.int64)])
    if not len(vals):
        return float("nan")
    order = np.argsort(vals, kind="stable")
    vals, wts = vals[order], wts[order]
    cum = np.cumsum(wts)
    target = q * cum[-1]
    return float(vals[np.searchsorted(cum, target, side="left")
                      .clip(0, len(vals) - 1)])


def quantile_sketch_events(sf_dir: str):
    """Approximate per-event-type value quantiles from ONE pass of
    mergeable KLL-style sketches (rows-only: approximate by design —
    the exact order-statistic companion is `quantiles_events`, and the
    rank-error bound is asserted in tests).  Per-batch partials are
    (event_type, level, values) rows; the driver folds sketches, not
    data."""
    import ray.data

    def partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        out_k, out_l, out_v = [], [], []
        tt = pa.table({"k": t["event_type"], "v": t["value"]})
        for key in pc.unique(tt["k"]).to_pylist():
            vals = tt.filter(pc.equal(tt["k"], key))["v"] \
                .to_numpy(zero_copy_only=False)
            levels: list[np.ndarray] = [np.empty(0, dtype=np.float64)]
            _kll_add(levels, vals, 0)
            for li, buf in enumerate(levels):
                if len(buf):
                    out_k.append(key)
                    out_l.append(li)
                    out_v.append(buf.tolist())
        return pa.table({"k": pa.array(out_k, pa.string()),
                         "level": pa.array(out_l, pa.int32()),
                         "vals": pa.array(out_v,
                                          pa.list_(pa.float64()))})

    sketches: dict[str, list[np.ndarray]] = {}
    parities: dict[str, int] = {}
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_type", "value"])
    for b in (ds.map_batches(partial, batch_format="pyarrow",
                             zero_copy_batch=True)
              .iter_batches(batch_format="pyarrow")):
        for key, li, vals in zip(b["k"].to_pylist(),
                                 b["level"].to_pylist(),
                                 b["vals"].to_pylist()):
            cur = sketches.setdefault(
                key, [np.empty(0, dtype=np.float64)])
            other = [np.empty(0, dtype=np.float64)] * li \
                + [np.asarray(vals, dtype=np.float64)]
            parities[key] = _kll_merge(cur, other,
                                       parities.get(key, 0))
    keys = sorted(sketches)
    return pa.table({
        "event_type": pa.array(keys, pa.string()),
        "p50": pa.array([_kll_quantile(sketches[k], 0.50)
                         for k in keys], pa.float64()),
        "p90": pa.array([_kll_quantile(sketches[k], 0.90)
                         for k in keys], pa.float64()),
        "p99": pa.array([_kll_quantile(sketches[k], 0.99)
                         for k in keys], pa.float64()),
    })


QUERIES = {
    "hll_distinct_counts": hll_distinct_counts,
    "quantile_sketch_events": quantile_sketch_events,
    "exact_distinct_counts": exact_distinct_counts,
    "heavy_hitters_terms": heavy_hitters_terms,
    "exact_top_terms": exact_top_terms,
}

ORACLE = {
    "exact_distinct_counts": EXACT_DISTINCT_SQL,
    "exact_top_terms": EXACT_TOP_TERMS_SQL,
    # heavy_hitters_terms: rows-only (approximate by design; bounds
    # invariant vs the exact counts asserted in tests)
    # hll_distinct_counts: rows-only (approximate by design; error
    # bound + merge identity verified in tests/test_pipelines.py)
}
