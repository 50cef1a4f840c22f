"""BM25 scoring — the ONE formula used by both the distributed engine
and the pure-Python oracle (SURVEY.md §7.2 step 4), so rank-identity
tests exercise the distributed machinery, not formula agreement.

    idf(df)      = ln(1 + (N - df + 0.5) / (df + 0.5))          (Lucene-style)
    tfn(tf, dl)  = tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
    score(d, Q)  = Σ_{t∈Q, sorted by term} idf(df_t) * tfn(tf_{t,d}, dl_d)

Determinism contract (SURVEY.md §7.5.1): float64 throughout, per-doc
accumulation strictly in sorted-unique-term order, ties broken by
ascending doc_id.  Both engines follow it bit-for-bit.
"""

from __future__ import annotations

import math

import numpy as np

from mee_ray.config import BM25Params


def idf(df: int, n_docs: int) -> float:
    return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def tfn_scalar(tf: float, dl: float, avgdl: float, p: BM25Params) -> float:
    return tf * (p.k1 + 1.0) / (tf + p.k1 * (1.0 - p.b + p.b * dl / avgdl))


def top_k_select(doc_ids: np.ndarray, scores: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic top-k: by (-score, doc_id). Returns (ids, scores)
    in rank order."""
    n = len(doc_ids)
    if n == 0 or k <= 0:
        return doc_ids[:0], scores[:0]
    k = min(k, n)
    if n > 4096 and k < n // 8:
        # partition-then-sort: O(n + c log c) instead of lexsorting
        # all n candidates.  Every doc with score > kth-best survives;
        # boundary-score ties are all kept so the doc_id tie-break
        # stays exact (c ≥ k; degenerate mass ties degrade gracefully
        # to the full sort, never to a wrong answer).
        kth = np.partition(scores, n - k)[n - k]
        sel = scores >= kth
        ids_c, sc_c = doc_ids[sel], scores[sel]
        order = np.lexsort((ids_c, -sc_c))[:k]
        return ids_c[order], sc_c[order]
    # np.lexsort: last key is primary
    order = np.lexsort((doc_ids, -scores))[:k]
    return doc_ids[order], scores[order]
