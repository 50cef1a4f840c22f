"""Property test: the vectorized span_not veto kernel equals a
brute-force set implementation on random ragged position runs,
including unsorted run order (the delta-chunk layout), duplicate-free
runs, and boundary distances."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from mee_ray.query import span_not_match_docs

docs = st.dictionaries(
    st.integers(min_value=0, max_value=40),            # doc ids
    st.sets(st.integers(min_value=0, max_value=60),    # positions
            min_size=1, max_size=8),
    min_size=0, max_size=12)


def _ragged(mapping, order):
    ids = np.array(order, dtype=np.int64)
    off = np.concatenate(
        ([0], np.cumsum([len(mapping[d]) for d in order]))
    ).astype(np.int64)
    pos = np.array([p for d in order for p in sorted(mapping[d])],
                   dtype=np.int64)
    return ids, off, pos


@settings(max_examples=200, deadline=None)
@given(inc=docs, exc=docs, dist=st.integers(min_value=0, max_value=6),
       seed=st.integers(min_value=0, max_value=2**31 - 1))
def test_span_not_kernel_matches_bruteforce(inc, exc, dist, seed):
    rng = np.random.default_rng(seed)
    inc_order = list(inc)
    exc_order = list(exc)
    rng.shuffle(inc_order)
    rng.shuffle(exc_order)                # unsorted runs (delta layout)

    got = span_not_match_docs(_ragged(inc, inc_order),
                              _ragged(exc, exc_order), dist)

    want = sorted(
        d for d, ps in inc.items()
        if d not in exc
        or any(all(abs(p - e) > dist for e in exc[d]) for p in ps))
    assert got.tolist() == want


bigram_docs = st.dictionaries(
    st.integers(min_value=0, max_value=30),
    st.sets(st.integers(min_value=0, max_value=40),
            min_size=1, max_size=10),
    min_size=0, max_size=10)


@settings(max_examples=200, deadline=None)
@given(a=bigram_docs, b=bigram_docs,
       seed=st.integers(min_value=0, max_value=2**31 - 1))
def test_bigram_count_runs_matches_bruteforce(a, b, seed):
    """The composite-key adjacency counter equals the brute-force
    count of (doc, p) with the first term at p and the second at p+1,
    on random ragged runs in shuffled (delta-layout) order."""
    from mee_ray.query import _bigram_count_runs

    rng = np.random.default_rng(seed)
    ao, bo = list(a), list(b)
    rng.shuffle(ao)
    rng.shuffle(bo)
    got = _bigram_count_runs(_ragged(a, ao), _ragged(b, bo))
    want = sum(1 for d in a
               if d in b
               for p in a[d] if (p + 1) in b[d])
    assert got == want
