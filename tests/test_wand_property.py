"""Property-based WAND correctness: random corpora → hand-built chunk
structures (random contiguous splits, tiny blocks to force boundary
cases) → search_wand must equal a brute-force evaluated with the same
formula, every time."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from mee_ray.postings import block_metadata, tf_norm
from mee_ray.scoring import idf
from mee_ray.wand import search_wand

K1, B = 1.2, 0.75
BLOCK = 4  # tiny blocks force block-boundary logic constantly


@st.composite
def corpus(draw):
    n_docs = draw(st.integers(2, 30))
    vocab = draw(st.integers(1, 6))
    doc_ids = sorted(draw(st.sets(st.integers(1, 10_000),
                                  min_size=n_docs, max_size=n_docs)))
    dls = {d: draw(st.integers(1, 50)) for d in doc_ids}
    postings = {}
    for t in range(vocab):
        members = sorted(draw(st.sets(st.sampled_from(doc_ids), min_size=1,
                                      max_size=n_docs)))
        postings[f"t{t}"] = {d: draw(st.integers(1, 5)) for d in members}
    qsize = draw(st.integers(1, vocab))
    terms = sorted(draw(st.sets(st.sampled_from(sorted(postings)),
                                min_size=qsize, max_size=qsize)))
    k = draw(st.integers(1, 8))
    n_splits = draw(st.integers(0, 3))
    return doc_ids, dls, postings, terms, k, n_splits


def _chunks_for(plist: dict[int, int], dls: dict[int, int], avgdl: float,
                n_splits: int) -> list[dict]:
    """Split a term's postings into 1+n_splits contiguous doc ranges —
    the salted-sub-list layout — with real block metadata."""
    ids = np.array(sorted(plist), dtype=np.int64)
    cuts = sorted({len(ids) * (i + 1) // (n_splits + 1)
                   for i in range(n_splits)} - {0, len(ids)})
    bounds = [0] + cuts + [len(ids)]
    chunks = []
    for lo, hi in zip(bounds[:-1], bounds[1:]):
        if lo == hi:
            continue
        cids = ids[lo:hi]
        ctfs = np.array([plist[d] for d in cids], dtype=np.int64)
        cdls = np.array([dls[d] for d in cids], dtype=np.int64)
        impacts = tf_norm(ctfs, cdls, avgdl, K1, B)
        bl, bm = block_metadata(cids, impacts, BLOCK)
        chunks.append({
            "block_last": bl, "block_max": bm, "df": len(cids),
            "decode": (lambda a=cids, b=ctfs, c=cdls: (a, b, c)),
        })
    return chunks


@settings(max_examples=150, deadline=None)
@given(corpus())
def test_wand_equals_bruteforce(case):
    doc_ids, dls, postings, terms, k, n_splits = case
    n = len(doc_ids)
    avgdl = sum(dls.values()) / n

    term_chunks = {}
    for t in terms:
        w = idf(len(postings[t]), n)
        term_chunks[t] = (w, _chunks_for(postings[t], dls, avgdl, n_splits))

    got = search_wand(term_chunks, k, n, avgdl, avgdl, K1, B,
                      block_size=BLOCK)

    # brute force with identical accumulation order (sorted terms)
    acc: dict[int, float] = {}
    for t in sorted(terms):
        w = idf(len(postings[t]), n)
        for d, tf in postings[t].items():
            s = w * (tf * (K1 + 1.0)
                     / (tf + K1 * (1.0 - B + B * dls[d] / avgdl)))
            acc[d] = acc.get(d, 0.0) + s
    want = sorted(acc.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    assert got == want
