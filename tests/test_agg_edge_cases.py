"""Edge-case fixtures for the ES agg family III: crafted events tables
exercising the degenerate paths the TPC-H-ish testdata never hits —
constant series (all change-point scores tie), fewer distinct values
than variable-width buckets, single-bucket histograms, and an exactly
tied frequent-pair support.  Engine vs DuckDB oracle on the SAME
crafted parquet, mirroring the driver's value-exact compare."""

import os

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write_events(tmp_path, ts_us, user_id, event_type, value):
    n = len(ts_us)
    t = pa.table({
        "event_id": pa.array(range(1, n + 1), pa.int64()),
        "ts": pa.array(ts_us, pa.timestamp("us")),
        "user_id": pa.array(user_id, pa.int64()),
        "event_type": pa.array(event_type, pa.string()),
        "value": pa.array(value, pa.float64()),
        "props": pa.array(['{"k": 1}'] * n, pa.string()),
    })
    pq.write_table(t, os.path.join(tmp_path, "events.parquet"))
    return str(tmp_path)


def _compare(name, sf_dir):
    import __ray_entry__ as e
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"'{sf_dir}/events.parquet'")
    mine = e.queries()[name](sf_dir)
    if not isinstance(mine, pd.DataFrame):
        mine = mine.to_pandas()
    ref = con.execute(e.oracle_sql()[name]).df()
    mine = mine[sorted(mine.columns)].sort_values(
        by=sorted(mine.columns), kind="mergesort").reset_index(drop=True)
    ref = ref[sorted(ref.columns)].sort_values(
        by=sorted(ref.columns), kind="mergesort").reset_index(drop=True)
    assert list(mine.columns) == list(ref.columns)
    pd.testing.assert_frame_equal(mine, ref, check_dtype=False,
                                  check_exact=True)
    return mine


DAY_US = 86_400_000_000


def test_change_point_constant_series_ties_to_earliest(
        ray_session, tmp_path):
    """A perfectly flat daily series makes every split score 0 — the
    deterministic tie-break must pick the EARLIEST candidate day on
    both sides."""
    ts, ut, et, v = [], [], [], []
    for day in range(6):
        for k in range(4):               # 4 events every day
            ts.append(day * DAY_US + k)
            ut.append(1)
            et.append("view")
            v.append(1.0)
    sf = _write_events(tmp_path, ts, ut, et, v)
    out = _compare("change_point_events", sf)
    assert out["change_day"].iloc[0] == 1   # first valid split day
    assert out["score"].iloc[0] == 0


def test_change_point_step_series_finds_the_step(ray_session, tmp_path):
    """2/day for five days then 50/day for five days — the change day
    is exactly the first high day."""
    ts, ut, et, v = [], [], [], []
    for day in range(10):
        for k in range(2 if day < 5 else 50):
            ts.append(day * DAY_US + k)
            ut.append(1)
            et.append("view")
            v.append(1.0)
    sf = _write_events(tmp_path, ts, ut, et, v)
    out = _compare("change_point_events", sf)
    assert out["change_day"].iloc[0] == 5


def test_variable_width_histogram_fewer_values_than_buckets(
        ray_session, tmp_path):
    """3 distinct cents vs 5 requested buckets: every distinct value
    becomes its own bucket, no empty buckets, engine == oracle."""
    vals = [1.00, 1.00, 2.50, 9.99]
    sf = _write_events(tmp_path,
                       [i * 1000 for i in range(len(vals))],
                       [1] * len(vals), ["view"] * len(vals), vals)
    out = _compare("variable_width_histogram_events", sf)
    assert len(out) == 3
    assert out["n_events"].sum() == 4


def test_variable_width_histogram_single_value(ray_session, tmp_path):
    """One distinct cent: one bucket, centroid == the value."""
    sf = _write_events(tmp_path, [0, 1, 2], [1, 1, 1],
                       ["view"] * 3, [7.25] * 3)
    out = _compare("variable_width_histogram_events", sf)
    assert len(out) == 1
    assert out["centroid_cents"].iloc[0] == 725.0


def test_stats_bucket_with_gap_days(ray_session, tmp_path):
    """Days 0, 1 and 4 occupied; 2–3 empty.  The gap-filled histogram
    makes min_n = 0 and the min_day the FIRST empty day."""
    ts = [0, 1, DAY_US, 4 * DAY_US, 4 * DAY_US + 1, 4 * DAY_US + 2]
    sf = _write_events(tmp_path, ts, [1] * 6, ["view"] * 6, [1.0] * 6)
    out = _compare("stats_bucket_events", sf)
    assert out["n_buckets"].iloc[0] == 5
    assert out["min_n"].iloc[0] == 0
    assert out["min_day"].iloc[0] == 2
    assert out["max_day"].iloc[0] == 4


def test_frequent_item_sets_threshold_boundary(ray_session, tmp_path):
    """4 users: {a,b} ×2, {a,c} ×1, {a} ×1 → support(a,b)=2 =
    ceil(0.5·4) exactly (kept), support(a,c)=1 (dropped)."""
    rows = [
        (1, "alpha"), (1, "beta"),
        (2, "alpha"), (2, "beta"),
        (3, "alpha"), (3, "gamma"),
        (4, "alpha"),
    ]
    ts = [i * 1000 for i in range(len(rows))]
    sf = _write_events(tmp_path, ts, [u for u, _ in rows],
                       [t for _, t in rows], [1.0] * len(rows))
    out = _compare("frequent_item_sets_events", sf)
    assert list(out.itertuples(index=False, name=None)) == [
        ("alpha", "beta", 2)]


def test_change_point_single_day_is_empty(ray_session, tmp_path):
    """One occupied day → no valid split; engine emits the oracle's
    zero rows instead of crashing."""
    sf = _write_events(tmp_path, [0, 1, 2], [1, 1, 1],
                       ["view"] * 3, [1.0] * 3)
    out = _compare("change_point_events", sf)
    assert len(out) == 0


def test_t_test_zero_variance_is_null(ray_session, tmp_path):
    """Constant values in both populations → pooled SE is 0; DuckDB's
    x/0 is NULL and the engine mirrors it (no ZeroDivisionError)."""
    ts, ut, et, v = [], [], [], []
    for i in range(3):
        for typ in ("purchase", "click"):
            ts.append(len(ts))
            ut.append(1)
            et.append(typ)
            v.append(5.0)
    sf = _write_events(tmp_path, ts, ut, et, v)
    out = _compare("t_test_events", sf)
    assert pd.isna(out["t_stat"].iloc[0])
    assert pd.isna(out["welch_df"].iloc[0])
    assert out["var_a_cents"].iloc[0] == 0.0


def test_t_test_n1_population(ray_session, tmp_path):
    """One population has a single row: its sample variance divides by
    n−1 == 0 → NULL → greatest(NULL,0) == 0 in DuckDB; t stays
    computable off the other population's variance, welch_df is NULL.
    Engine mirrors exactly."""
    ts = [0, 1, 2, 3]
    et = ["purchase", "click", "click", "click"]
    v = [10.0, 1.0, 2.0, 3.0]
    sf = _write_events(tmp_path, ts, [1] * 4, et, v)
    out = _compare("t_test_events", sf)
    assert out["n_a"].iloc[0] == 1
    assert out["var_a_cents"].iloc[0] == 0.0
    assert not pd.isna(out["t_stat"].iloc[0])
    assert pd.isna(out["welch_df"].iloc[0])


def test_t_test_missing_population(ray_session, tmp_path):
    """No 'purchase' rows at all: the oracle's conditional aggregates
    give NULLs for that side; the engine emits the same row instead
    of raising KeyError."""
    sf = _write_events(tmp_path, [0, 1], [1, 1],
                       ["click", "click"], [1.0, 2.0])
    out = _compare("t_test_events", sf)
    assert pd.isna(out["n_a"].iloc[0])
    assert pd.isna(out["t_stat"].iloc[0])


def test_t_test_identical_populations_t_is_zero(ray_session, tmp_path):
    """Same values in both populations → means equal, t == 0, and the
    all-DOUBLE variance tree agrees bit-for-bit with DuckDB."""
    vals = [1.25, 2.50, 3.75, 5.00]
    ts, ut, et, v = [], [], [], []
    for i, x in enumerate(vals):
        for typ in ("purchase", "click"):
            ts.append(i * 1000 + len(ts))
            ut.append(1)
            et.append(typ)
            v.append(x)
    sf = _write_events(tmp_path, ts, ut, et, v)
    out = _compare("t_test_events", sf)
    assert out["t_stat"].iloc[0] == 0.0


def test_geo_and_ip_aggs_on_empty_events(ray_session, tmp_path):
    """Zero-row events: the geo/ip aggregate collectors must return
    the oracle's result (typed-empty for sparse aggs, all-zero bucket
    rows for the fixed range aggs) instead of crashing on
    pa.concat_tables([])."""
    sf = _write_events(tmp_path, [], [], [], [])
    for name in ("geo_bounding_box_events", "geo_grid_events",
                 "geo_centroid_events", "geo_distance_count_events",
                 "geo_distance_topk_events", "geo_distance_rings_events",
                 "ip_range_events", "date_range_agg_events",
                 "geo_bounds_events", "geo_polygon_events"):
        _compare(name, sf)


def test_geo_coords_id_magnitude_safe(ray_session, tmp_path):
    """Coordinate/ip derivation must hold for ids far beyond int64/
    Knuth-multiply overflow (~3.5e9) — the pre-reduce-mod form keeps
    numpy and DuckDB congruent where the naive product would wrap in
    numpy and throw in DuckDB."""
    big = [4_000_000_000, 2 ** 62, 7, 2 ** 61 + 12345]
    t = pa.table({
        "event_id": pa.array(big, pa.int64()),
        "ts": pa.array([1000 + i for i in range(len(big))],
                       pa.timestamp("us")),
        "user_id": pa.array(big[::-1], pa.int64()),
        "event_type": pa.array(["a"] * len(big), pa.string()),
        "value": pa.array([1.0] * len(big), pa.float64()),
        "props": pa.array(['{"k": 1}'] * len(big), pa.string()),
    })
    pq.write_table(t, os.path.join(tmp_path, "events.parquet"))
    for name in ("geo_grid_events", "geo_centroid_events",
                 "geo_distance_topk_events", "ip_range_events"):
        _compare(name, str(tmp_path))


def test_children_agg_zero_child_bucket(ray_session, tmp_path):
    """A priority whose orders ALL lack lineitems must still bucket —
    with zero child stats — via the engine's left_outer + coalesce
    mirror of the oracle's LEFT JOIN (the TPC-H-ish testdata has no
    childless order, so only this crafted fixture hits the path);
    parent_agg on the same tiny relation pins the one-price-per-parent
    dedup."""
    orders = pa.table({
        "o_orderkey": pa.array([1, 2, 3], pa.int64()),
        "o_orderpriority": pa.array(["1-URGENT", "1-URGENT", "5-LOW"],
                                    pa.string()),
        "o_totalprice": pa.array([10.01, 20.02, 30.03], pa.float64()),
    })
    lineitem = pa.table({
        "l_orderkey": pa.array([1, 1, 2], pa.int64()),
        "l_quantity": pa.array([2.0, 3.5, 4.0], pa.float64()),
        "l_returnflag": pa.array(["R", "N", "R"], pa.string()),
    })
    pq.write_table(orders, os.path.join(tmp_path, "orders.parquet"))
    pq.write_table(lineitem, os.path.join(tmp_path, "lineitem.parquet"))

    import __ray_entry__ as e
    con = duckdb.connect()
    for tb in ("orders", "lineitem"):
        con.execute(f"CREATE VIEW {tb} AS SELECT * FROM "
                    f"'{tmp_path}/{tb}.parquet'")
    for name in ("children_agg_orders", "parent_agg_lineitem"):
        mine = e.queries()[name](str(tmp_path))
        if not isinstance(mine, pd.DataFrame):
            mine = mine.to_pandas()
        ref = con.execute(e.oracle_sql()[name]).df()
        mine = mine[sorted(mine.columns)].sort_values(
            by=sorted(mine.columns),
            kind="mergesort").reset_index(drop=True)
        ref = ref[sorted(ref.columns)].sort_values(
            by=sorted(ref.columns),
            kind="mergesort").reset_index(drop=True)
        pd.testing.assert_frame_equal(mine, ref, check_dtype=False,
                                      check_exact=True)
    # the zero-child bucket really is in the output
    ch = e.queries()["children_agg_orders"](str(tmp_path))
    if not isinstance(ch, pd.DataFrame):
        ch = ch.to_pandas()
    low = ch[ch.o_orderpriority == "5-LOW"].iloc[0]
    assert low.n_parents == 1 and low.n_parents_with_children == 0
    assert low.n_children == 0 and low.sum_child_qty_cents == 0


def _write_docs(tmp_path, texts, langs=None):
    n = len(texts)
    t = pa.table({
        "doc_id": pa.array(range(1, n + 1), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs or ["en"] * n, pa.string()),
        "source": pa.array([f"src{i % 3}" for i in range(n)], pa.string()),
        "n_chars": pa.array([len(x or "") for x in texts], pa.int64()),
    })
    pq.write_table(t, os.path.join(tmp_path, "documents.parquet"))
    return str(tmp_path)


def _compare_docs(name, sf_dir):
    import __ray_entry__ as e
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{sf_dir}/documents.parquet'")
    mine = e.queries()[name](sf_dir)
    if not isinstance(mine, pd.DataFrame):
        mine = mine.to_pandas()
    ref = con.execute(e.oracle_sql()[name]).df()
    mine = mine[sorted(mine.columns)].sort_values(
        by=sorted(mine.columns), kind="mergesort").reset_index(drop=True)
    ref = ref[sorted(ref.columns)].sort_values(
        by=sorted(ref.columns), kind="mergesort").reset_index(drop=True)
    assert list(mine.columns) == list(ref.columns)
    pd.testing.assert_frame_equal(mine, ref, check_dtype=False,
                                  check_exact=True)
    return mine


def test_gopher_rules_every_branch(ray_session, tmp_path):
    """Crafted docs flip each Gopher rule exactly once (the synthetic
    corpus is single-line prose that never exercises the bullet /
    ellipsis / symbol / alpha branches) — engine vs oracle value-exact
    plus explicit expected flags per doc."""
    prose = ("the quick brown fox jumps over that lazy dog and then "
             "have some with rest after the long run " * 4).strip()
    texts = [
        prose,                                    # 1: passes everything
        "the of and short",                       # 2: rule_wc fails
        "a " * 60 + "the of",                     # 3: rule_wlen (mean<3)
        prose + " " + "### ... ... ... ..." * 9,  # 4: rule_symbol
        "\n".join(["- item " + prose[:20]] * 10), # 5: rule_bullet (10/10)
        "\n".join([prose[:20]] * 6
                  + [prose[:20] + "..."] * 4),    # 6: rule_ellipsis (4/10)
        ("42 " * 60) + "the of and",              # 7: rule_alpha (<80%)
        "zebra quokka lemur " * 20,               # 8: rule_stop (none)
        "",                                       # 9: empty text
        "\n".join(["• punkt"] * 10),              # 10: unicode bullets
    ]
    sf = _write_docs(tmp_path, texts)
    out = _compare_docs("gopher_rules_documents", sf).set_index("doc_id")
    assert bool(out.loc[1, "passes"])
    assert not out.loc[2, "rule_wc"] and out.loc[2, "rule_wlen"]
    assert not out.loc[3, "rule_wlen"]
    assert not out.loc[4, "rule_symbol"] and out.loc[1, "rule_symbol"]
    assert not out.loc[5, "rule_bullet"]
    assert not out.loc[6, "rule_ellipsis"] and out.loc[5, "rule_ellipsis"]
    assert not out.loc[7, "rule_alpha"]
    assert not out.loc[8, "rule_stop"]
    assert not out.loc[9, "passes"] and out.loc[9, "n_words"] == 0
    assert not out.loc[10, "rule_bullet"]


def test_dsir_prefers_target_like_docs(ray_session, tmp_path):
    """DSIR on a crafted bilingual corpus: the en-gram doc must
    outscore the de-gram doc (weights favor target-distribution
    features), and both columns stay value-exact vs the oracle."""
    en = "the cat sat on the mat and the dog ran " * 6
    de = "der hund lief und die katze sass auf " * 6
    texts = [en, de, en + de, ""]
    sf = _write_docs(tmp_path, texts, langs=["en", "de", "de", "en"])
    out = _compare_docs("dsir_weights_documents", sf).set_index("doc_id")
    # doc 1 is pure target-vocabulary, doc 2 pure raw-only vocabulary
    assert out.loc[1, "score"] > out.loc[2, "score"]
    assert out.loc[4, "score"] == 0 and out.loc[4, "n_feats"] == 0
    # select keeps all 4 docs (k=100 > corpus) — canon-sorted compare
    sel = _compare_docs("dsir_select_documents", sf)
    assert len(sel) == 4


def test_terms_error_bounds_branches(ray_session, tmp_path):
    """Shard-error-bound terms agg on a crafted corpus: shard 1 (odd
    doc_ids) has fewer distinct terms than shard_size so it reports
    everything and contributes ZERO error; shard 0 overflows
    shard_size so terms it hides get a positive bound.  Engine vs
    oracle value-exact, plus both branch assertions."""
    # even doc_ids (shard 0): 15 distinct terms -> overflow
    wide = " ".join(f"term{i:02d}" for i in range(15))
    texts = []
    for i in range(1, 13):                 # doc_ids 1..12
        if i % 2 == 0:
            texts.append(wide + f" extra{i}")
        else:
            texts.append("alpha beta")     # shard 1: 2 distinct terms
    sf = _write_docs(tmp_path, texts)
    out = _compare_docs("terms_error_bounds_documents", sf)
    # alpha/beta live only in shard 1 which reported all its terms ->
    # their bound from shard 0 is positive only if shard 0 overflowed
    assert (out["doc_count_error_upper_bound"] >= 0).all()
    row = out[out.term == "alpha"]
    if len(row):
        # shard 0 overflows (16 terms > 10): alpha could hide there
        assert row["doc_count_error_upper_bound"].iloc[0] > 0
    # terms reported by BOTH shards have zero error
    both = out[out.term.isin([f"term{i:02d}" for i in range(15)])]
    assert len(both) > 0


def test_ks_test_identical_and_disjoint_distributions(
        ray_session, tmp_path):
    """KS statistic boundary fixtures: identical samples give D = 0,
    fully disjoint supports give D = 1 (numerator = n_v * n_p), and a
    one-sided-empty input degrades to d = 0.0 on both sides."""
    # identical distributions
    ts = list(range(8)); v = [1.0, 2.0, 3.0, 4.0] * 2
    et = ["view"] * 4 + ["purchase"] * 4
    sf = _write_events(tmp_path, [t * DAY_US for t in ts],
                       [1] * 8, et, v)
    out = _compare("ks_test_events", sf)
    assert out["d_num"].iloc[0] == 0 and out["d"].iloc[0] == 0.0
    # disjoint supports
    d2 = tmp_path / "disjoint"; d2.mkdir()
    sf2 = _write_events(d2, [t * DAY_US for t in ts], [1] * 8, et,
                        [1.0, 2.0, 3.0, 4.0, 90.0, 91.0, 92.0, 93.0])
    out2 = _compare("ks_test_events", sf2)
    assert out2["d"].iloc[0] == 1.0
    assert out2["d_num"].iloc[0] == 16    # n_v * n_p


def test_ks_test_one_sided_and_absent_classes(ray_session, tmp_path):
    """The review-flagged degenerate paths: a corpus with view rows
    but ZERO purchase rows (engine and oracle both emit d = 0.0, not
    NULL), and a corpus with NEITHER class (zero groupby batches —
    the concat guard)."""
    ts = [t * DAY_US for t in range(4)]
    sf = _write_events(tmp_path, ts, [1] * 4, ["view"] * 4,
                       [1.0, 2.0, 3.0, 4.0])
    out = _compare("ks_test_events", sf)
    assert out["n_purchase"].iloc[0] == 0
    assert out["d_num"].iloc[0] == 0 and out["d"].iloc[0] == 0.0
    d2 = tmp_path / "none"; d2.mkdir()
    sf2 = _write_events(d2, ts, [1] * 4, ["signup"] * 4,
                        [1.0, 2.0, 3.0, 4.0])
    out2 = _compare("ks_test_events", sf2)
    assert len(out2) == 0      # the oracle's empty cross-join shape


def test_frequent_item_sets_wide_vocab_pair_explosion(ray_session,
                                                      tmp_path):
    """>63 distinct items trips the bitmask lane limit; the
    pair-explosion fallback must (a) engage, (b) match the DuckDB
    oracle value-exact, and (c) agree with the bitmask path's
    output contract on a narrow sub-run."""
    import numpy as np

    from mee_ray.pipelines.relational import (_fis_pair_explosion,
                                              frequent_item_sets_events)

    rng = np.random.default_rng(3)
    n_items, n_users = 80, 30
    items = [f"it{i:03d}" for i in range(n_items)]
    rows = []
    # every user holds a COMMON pair (it000, it001) plus random tail
    # items; a few duplicate rows exercise the global distinct
    for u in range(1, n_users + 1):
        basket = {0, 1} | set(rng.integers(2, n_items, size=6).tolist())
        for it in sorted(basket):
            rows.append((u, items[it]))
        rows.append((u, items[0]))          # duplicate event
    ts = [i * 1000 for i in range(len(rows))]
    sf = _write_events(tmp_path, ts, [u for u, _ in rows],
                       [t for _, t in rows], [1.0] * len(rows))
    out = _compare("frequent_item_sets_events", sf)
    assert ("it000", "it001") in {(a, b) for a, b, _ in
                                  out.itertuples(index=False, name=None)}

    # narrow fixture: pair-explosion path === bitmask path bit-exact
    d2 = tmp_path / "narrow"; d2.mkdir()
    rows2 = [(1, "a"), (1, "b"), (2, "a"), (2, "b"), (3, "a"),
             (3, "c"), (4, "a"), (4, "b")]
    ts2 = [i * 1000 for i in range(len(rows2))]
    sf2 = _write_events(d2, ts2, [u for u, _ in rows2],
                        [t for _, t in rows2], [1.0] * len(rows2))
    bit = frequent_item_sets_events(sf2)
    pex = _fis_pair_explosion(sf2, sorted({t for _, t in rows2}))
    assert bit.equals(pex)
