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
    """Vectorized count-leading-zeros of uint64 (64 for x == 0)."""
    x = x.copy()
    clz = np.zeros(len(x), dtype=np.int64)
    for s in (32, 16, 8, 4, 2, 1):
        m = x < (np.uint64(1) << np.uint64(64 - s))
        clz += np.where(m, s, 0)
        x = np.where(m, x << np.uint64(s), x)
    return np.where(clz > 64, 64, clz)


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
        reg = np.zeros(_M, dtype=np.uint8)
        vals = t[col].to_numpy(zero_copy_only=False)
        hll_fold(vals[~np.equal(vals, None)] if vals.dtype == object
                 else vals, reg)
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
            u = np.unique(t[c].to_numpy(zero_copy_only=False))
            return pa.table({c: pa.array(u)})

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

QUERIES = {
    "hll_distinct_counts": hll_distinct_counts,
    "exact_distinct_counts": exact_distinct_counts,
}

ORACLE = {
    "exact_distinct_counts": EXACT_DISTINCT_SQL,
    # hll_distinct_counts: rows-only (approximate by design; error
    # bound + merge identity verified in tests/test_pipelines.py)
}
