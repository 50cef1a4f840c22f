"""Property tests for the dictionary-expansion helpers and the
partials-merge contract behind msearch (pure-Python, no Ray)."""

import re

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from mee_ray.query import (merge_partials, prefix_terms, regexp_terms,
                           wildcard_regex, wildcard_terms)

_vocab = st.lists(st.text(alphabet="abc_1", min_size=1, max_size=5),
                  min_size=0, max_size=40).map(lambda v: sorted(set(v)))
_pattern = st.lists(st.sampled_from(["a", "b", "c", "1", "_", "*", "?"]),
                    min_size=1, max_size=6).map("".join)


@settings(max_examples=200, deadline=None)
@given(_vocab, _pattern)
def test_wildcard_terms_equals_naive_scan(vocab, pattern):
    rx = re.compile(wildcard_regex(pattern))
    assert wildcard_terms(vocab, pattern) == \
        [t for t in vocab if rx.fullmatch(t)]


@settings(max_examples=200, deadline=None)
@given(_vocab, st.text(alphabet="abc_1", max_size=4))
def test_prefix_terms_equals_naive_scan(vocab, prefix):
    assert prefix_terms(vocab, prefix) == \
        [t for t in vocab if t.startswith(prefix)]


@settings(max_examples=100, deadline=None)
@given(_vocab, st.sampled_from(["a.*", "[ab]c?", "(a|b)1*", "c+_?",
                                ".*1", "a{1,2}b?"]))
def test_regexp_terms_equals_naive_scan(vocab, pattern):
    rx = re.compile(pattern)
    assert regexp_terms(vocab, pattern) == \
        [t for t in vocab if rx.fullmatch(t)]


_partials = st.dictionaries(
    st.text(alphabet="xyz", min_size=1, max_size=3),
    st.lists(st.tuples(st.integers(0, 50),
                       st.floats(0.01, 10, allow_nan=False)),
             min_size=1, max_size=8),
    min_size=1, max_size=6)


@settings(max_examples=150, deadline=None)
@given(_partials, st.integers(1, 5), st.data())
def test_merge_partials_ignores_extraneous_terms(raw, k, data):
    """The msearch contract: merging a SUBSET of terms out of a
    partials dict holding the whole union must equal merging from a
    dict holding only that subset."""
    partials = {}
    for t, rows in raw.items():
        ids = np.array(sorted({i for i, _ in rows}), dtype=np.int64)
        sc = np.array([dict(rows)[int(i)] for i in ids], dtype=np.float64)
        partials[t] = (ids, sc)
    subset = data.draw(st.lists(st.sampled_from(sorted(partials)),
                                min_size=0, max_size=len(partials),
                                unique=True))
    subset = sorted(subset)
    only = {t: partials[t] for t in subset}
    assert merge_partials([partials], subset, k) == \
        merge_partials([only], subset, k)


def test_dsir_bucket_hash_cross_engine_property():
    """Property: the rolling-polynomial gram hash is bit-identical
    between the engine (_dsir_bucket) and the DuckDB list_reduce
    expression embedded in DSIR_SQL, for arbitrary token strings —
    the identity every DSIR oracle row rests on."""
    import duckdb
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from mee_ray.pipelines.text import (_DSIR_BUCKETS, _DSIR_HASH_MOD,
                                        _dsir_bucket)

    con = duckdb.connect()
    expr = (f"list_reduce(list_prepend(CAST(7 AS BIGINT), "
            f"list_transform(generate_series(1, len(g)), "
            f"i -> CAST(ascii(substr(g, i, 1)) AS BIGINT))), "
            f"(a, x) -> (a * 31 + x) % {_DSIR_HASH_MOD}) "
            f"% {_DSIR_BUCKETS}")

    @settings(max_examples=60, deadline=None)
    @given(st.text(alphabet=st.characters(
        whitelist_categories=("Ll", "Nd"), max_codepoint=0x7F),
        min_size=1, max_size=24))
    def check(g):
        sql = con.execute(f"SELECT {expr} FROM (SELECT ? AS g)",
                          [g]).fetchone()[0]
        assert _dsir_bucket(g) == sql, g

    check()


def test_morton_interleave_cross_engine_property():
    """Property: the generated Morton-interleave SQL expression equals
    the numpy kernel for arbitrary 16-bit cell coordinates, and
    deinterleaving recovers (cx, cy) — the zorder oracle's foundation."""
    import duckdb
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from mee_ray.pipelines.geo import _morton_expr, _morton_np

    con = duckdb.connect()
    expr = _morton_expr("cx", "cy")

    @settings(max_examples=60, deadline=None)
    @given(st.integers(0, (1 << 16) - 1), st.integers(0, (1 << 16) - 1))
    def check(cx, cy):
        code = int(_morton_np(np.array([cx]), np.array([cy]))[0])
        sql = con.execute(
            f"SELECT ({expr}) FROM (SELECT CAST(? AS BIGINT) AS cx, "
            f"CAST(? AS BIGINT) AS cy)", [cx, cy]).fetchone()[0]
        assert code == sql, (cx, cy)
        # deinterleave identity
        dx = sum(((code >> (2 * i)) & 1) << i for i in range(16))
        dy = sum(((code >> (2 * i + 1)) & 1) << i for i in range(16))
        assert (dx, dy) == (cx, cy)

    check()


def test_sqrt_floor_cross_engine_property():
    """Property behind temperature_mix_documents' exactness claim:
    floor(10⁶·√c) is the same int64 in Python/numpy and DuckDB for
    arbitrary counts (IEEE sqrt is correctly rounded in both)."""
    import math

    import duckdb
    from hypothesis import given, settings
    from hypothesis import strategies as st

    con = duckdb.connect()

    @settings(max_examples=80, deadline=None)
    @given(st.integers(1, 10 ** 12))
    def check(c):
        py = int(math.floor(1_000_000 * math.sqrt(c)))
        sql = con.execute(
            "SELECT CAST(floor(1000000 * sqrt(CAST(? AS BIGINT))) "
            "AS BIGINT)", [c]).fetchone()[0]
        assert py == sql, c

    check()
