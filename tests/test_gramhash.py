"""Hashed-gram dedup kernel: bit-identity vs the retired string modes.

The gramhash kernel replaces Python row loops + per-gram md5 / raw
string shuffle keys in the dedup edge generators.  The contract is
that the HASHED mode produces byte-identical final output to the
legacy STRING mode on real data (collisions being the only
theoretical divergence, ~2⁻⁶⁴ per gram pair).  The string code paths
were retired in round 5; their last outputs are FROZEN as golden
parquet fixtures (tests/golden/*_sf0001.parquet, each stamped with
the sha256 of the documents.parquet it was recorded against), and
the tests below assert the live hashed pipelines still reproduce
them bit-for-bit — plus unit coverage of the tokenizer parity and
the doc-boundary handling of the window fold.
"""

import hashlib
import os

import re

import numpy as np
import pyarrow as pa
import pytest

from mee_ray.pipelines.gramhash import (gram_hash64, token_hash64,
                                        tokenize_flat)

SF = "/root/testdata/sf0.001"


def _texts(limit=300):
    import pyarrow.parquet as pq
    t = pq.read_table(f"{SF}/documents.parquet", columns=["text"])
    return t["text"].to_pylist()[:limit]


def test_tokenize_flat_regex_parity():
    texts = _texts() + ["", None, "  ", "Hello, World!", "a_b-c  d",
                        "Aİb İstanbul KELVIN ẞß"]   # U+0130 lower()

    flat, didx, lens = tokenize_flat(pa.chunked_array([texts]),
                                     mode="regex")
    tok = re.compile("[a-z0-9_]+")
    expect = [tok.findall((x or "").lower()) for x in texts]
    assert lens.tolist() == [len(e) for e in expect]
    assert flat.to_pylist() == [t for e in expect for t in e]
    assert didx.tolist() == [i for i, e in enumerate(expect)
                             for _ in e]


def test_tokenize_flat_space_parity():
    texts = _texts(100) + ["", None, "a  b", " x "]
    flat, didx, lens = tokenize_flat(pa.chunked_array([texts]),
                                     mode="space")
    expect = [(x or "").split(" ") for x in texts]
    assert lens.tolist() == [len(e) for e in expect]
    assert flat.to_pylist() == [t for e in expect for t in e]


def test_gram_hash_window_semantics():
    # same token sequence -> same hash; any difference -> different;
    # windows never cross doc boundaries
    texts = ["a b c d", "b c d e", "a b c d", "x", ""]
    flat, _, lens = tokenize_flat(pa.array(texts), mode="space")
    th = token_hash64(flat)
    didx, pos, g = gram_hash64(th, lens, 3)
    # doc0: windows (a b c),(b c d); doc1: (b c d),(c d e); doc2 same
    # as doc0; doc3/doc4: none
    assert didx.tolist() == [0, 0, 1, 1, 2, 2]
    assert pos.tolist() == [0, 1, 0, 1, 0, 1]
    assert g[1] == g[2]          # "b c d" shared across docs
    assert g[0] == g[4] and g[1] == g[5]   # doc2 repeats doc0
    assert len({g[0], g[1], g[3]}) == 3    # distinct grams differ
    assert (g >= 0).all()


def test_gram_hash_order_sensitive():
    flat, _, lens = tokenize_flat(pa.array(["a b", "b a"]),
                                  mode="space")
    th = token_hash64(flat)
    _, _, g = gram_hash64(th, lens, 2)
    assert g[0] != g[1]


GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


def _golden(name):
    """Load a frozen legacy-mode output, refusing to compare against
    a DIFFERENT corpus than the one it was recorded on (the fixture
    is only meaningful for the exact documents.parquet bytes)."""
    import pyarrow.parquet as pq
    t = pq.read_table(os.path.join(GOLDEN_DIR, f"{name}_sf0001.parquet"))
    recorded = t.schema.metadata[b"corpus_sha256"].decode()
    current = hashlib.sha256(
        open(f"{SF}/documents.parquet", "rb").read()).hexdigest()
    assert recorded == current, (
        "testdata documents.parquet changed since the golden fixtures "
        "were recorded — regenerate them by replaying the retired "
        "use_hash=False paths (git history, pre-round-5) on the new "
        "corpus")
    return t


@pytest.mark.usefixtures("ray_session")
def test_gram_edges_hashed_vs_string_identity():
    from mee_ray.pipelines.cluster import gram_dup_edges

    parts = list(gram_dup_edges(SF, n=8, max_df=50)
                 .iter_batches(batch_format="pyarrow"))
    t = pa.concat_tables(parts) if parts else pa.table(
        {"a": pa.array([], pa.int64()),
         "b": pa.array([], pa.int64())})
    hashed = set(zip(t["a"].to_pylist(), t["b"].to_pylist()))
    g = _golden("gram_edges")
    string = set(zip(g["a"].to_pylist(), g["b"].to_pylist()))
    assert hashed == string
    assert len(hashed) > 0       # the fixture corpus has near-dups


@pytest.mark.usefixtures("ray_session")
def test_substring_spans_hashed_vs_string_identity():
    from mee_ray.pipelines.text import substring_dedup_spans_documents

    parts = list(substring_dedup_spans_documents(SF)
                 .iter_batches(batch_format="pyarrow"))
    t = pa.concat_tables(parts)
    assert len(t) > 0
    hashed = t.sort_by([("doc_id", "ascending"),
                        ("span_start", "ascending")])
    assert hashed.equals(
        _golden("substring_spans").replace_schema_metadata(None)
        .cast(hashed.schema))


def test_shingles_batch_parity():
    from mee_ray.pipelines.text import (TextStats, _shingle_lists,
                                        _shingles)
    texts = _texts(200) + ["", None, "one two", "a", "x y z w v",
                           "Aİb one two three four"]
    st = TextStats()
    got = _shingle_lists(pa.chunked_array([texts])).to_pylist()
    for x, lst in zip(texts, got):
        assert set(lst) == _shingles(st.tokens(x or "")), x[:40] if x else x


def test_minhash_signatures_batch_parity():
    from mee_ray.pipelines.text import MinHashStage
    stage = MinHashStage()
    texts = _texts(100) + ["", "one two", "tiny"]
    sig = stage.signatures_batch(pa.array([x or "" for x in texts]))
    for i, x in enumerate(texts):
        assert (sig[i] == stage.signature(x or "")).all()


@pytest.mark.usefixtures("ray_session")
def test_passage_dedup_hashed_vs_string_identity():
    from mee_ray.pipelines.text import passage_dedup_documents

    parts = list(passage_dedup_documents(SF)
                 .iter_batches(batch_format="pyarrow"))
    t = pa.concat_tables(parts)
    assert len(t) > 0
    hashed = t.sort_by("doc_id")
    assert hashed.equals(
        _golden("passage_dedup").replace_schema_metadata(None)
        .cast(hashed.schema))


@pytest.mark.usefixtures("ray_session")
def test_contamination_hashed_vs_string_identity():
    from mee_ray.pipelines.text import contamination_check_documents

    parts = list(contamination_check_documents(SF)
                 .iter_batches(batch_format="pyarrow"))
    t = pa.concat_tables(parts)
    assert len(t) > 0
    hashed = t.sort_by("doc_id")
    assert hashed.equals(
        _golden("contamination").replace_schema_metadata(None)
        .cast(hashed.schema))


def test_gram_hash_stride():
    from mee_ray.pipelines.gramhash import (gram_hash64, token_hash64,
                                            tokenize_flat)
    flat, _, lens = tokenize_flat(pa.array(["a b c d e f g", "x y"]),
                                  mode="space")
    th = token_hash64(flat)
    d1, p1, g1 = gram_hash64(th, lens, 3, stride=3)
    # doc0 (7 toks): windows at 0 and 3 only (trailing partial dropped)
    assert d1.tolist() == [0, 0] and p1.tolist() == [0, 3]
    # strided hashes equal the corresponding overlapping-window hashes
    d2, p2, g2 = gram_hash64(th, lens, 3, stride=1)
    lookup = {(d, p): g for d, p, g in zip(d2, p2, g2)}
    assert [lookup[(d, p)] for d, p in zip(d1, p1)] == g1.tolist()


def test_char_gram_sets_batch_parity_and_fuzz():
    """_char_gram_sets_batch vs a naive per-string recompute (set of
    raw char 5-gram equality classes) over random and edge-case
    strings: per-doc set SIZES and cross-doc equality structure must
    match (hash values are opaque; what matters is which grams
    collide)."""
    import numpy as np

    from mee_ray.pipelines.text import _char_gram_sets_batch

    rng = np.random.default_rng(5)
    alpha = list("abcde ")
    texts = ["".join(rng.choice(alpha, rng.integers(0, 30)))
             for _ in range(200)] + ["", "abcd", "abcde", "aaaaaa",
                                     "naïve café ünïcødé", None,
                                     "abcde"]   # duplicate on purpose
    d, g = _char_gram_sets_batch(texts, 5)
    per_doc = {}
    for dd, gg in zip(d, g):
        per_doc.setdefault(int(dd), set()).add(int(gg))
    for i, x in enumerate(texts):
        x = x or ""
        gs = {x[k:k + 5] for k in range(max(0, len(x) - 4))}
        if not gs and x:
            gs = {x}
        assert len(per_doc.get(i, set())) == len(gs), (i, x)
    # equality structure: identical strings share identical hash sets
    dup = [i for i, x in enumerate(texts) if (x or "") == "abcde"]
    assert len(dup) >= 2          # fixture guarantees the pair exists
    assert per_doc[dup[0]] == per_doc[dup[1]]
