"""Deterministic UNBIASED bounded sampling for model fits.

Every bounded-sample model fit in the engine (IVF / SQ / PQ
quantizers, the BPE vocab, the bigram LM) used to take a file-order
PREFIX sample (``ds.take_batch(n)``) — deterministic, but at 100 TB a
prefix is the first file(s) only: one repo, one language, one day of
crawl.  A hash-threshold sample is equally deterministic and
unbiased: keep the ``n`` rows with the smallest ``mix64(key)``.
splitmix64 is a bijection on uint64, so distinct keys give distinct
ranks — the sample is a uniform-without-replacement draw fixed by the
key column alone, invariant to file order, block layout, parallelism
and retries (asserted in test_sampling.py).

Scale shape: one streaming pass; each batch keeps ≤ n rows
(partial top-n by hash rank — the geo_distance_topk / dsir_select
pattern), one ``repartition(1)`` merge, and a driver-side final
reduce over the few surviving partials.  Driver state is O(n), never
the corpus.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from mee_ray.pipelines.gramhash import mix64


def hash_sample(ds, n: int, key: str) -> pa.Table:
    """The ``n`` rows of ``ds`` with the smallest ``mix64(ds[key])``,
    returned KEY-ordered (canonical: fits consuming the sample see the
    same row order a file-order prefix gave on key-sorted test data,
    so small-scale fit results are unchanged while the DRAW itself is
    unbiased).  ``key`` must be an int64 column with distinct values
    (doc_id / vec_id)."""

    def partial(t: pa.Table) -> pa.Table:
        if len(t) > n:
            h = mix64(t[key].to_numpy(zero_copy_only=False))
            keep = np.argpartition(h, n)[:n]
            t = t.take(pa.array(keep, pa.int64()))
        return t

    parts = list(ds.map_batches(partial, batch_format="pyarrow",
                                zero_copy_batch=True)
                 .repartition(1)
                 .map_batches(partial, batch_format="pyarrow")
                 .iter_batches(batch_format="pyarrow"))
    if not parts:
        sch = ds.schema()
        return pa.Table.from_pylist(
            [], schema=pa.schema(list(zip(sch.names, sch.types))))
    t = pa.concat_tables(parts).combine_chunks()
    ids = t[key].to_numpy(zero_copy_only=False)
    h = mix64(ids)
    chosen = np.argsort(h, kind="stable")[:n]
    order = chosen[np.argsort(ids[chosen], kind="stable")]
    return t.take(pa.array(order, pa.int64()))
