"""Table-driven tokenizer tests (mirrors the reference's regex-semantics
test style, modules/handlers/v1/test/test_exp_re.py)."""

from collections import Counter

import pytest

from mee_ray.config import TokenizerConfig
from mee_ray.tokenizer import Tokenizer, CAMEL_RE, TOKEN_RE


@pytest.mark.parametrize("raw,subs", [
    ("parseHTTPResponse", ["parse", "HTTP", "Response"]),
    ("camelCase", ["camel", "Case"]),
    ("HTTPResponse", ["HTTP", "Response"]),
    ("snake_case_name", ["snake", "case", "name"]),  # via TOKEN then split on _
    ("v2Parser", ["v2", "Parser"]),
    ("ABCdef", ["AB", "Cdef"]),
    ("x", ["x"]),
    ("X", ["X"]),
    ("ALLCAPS", ["ALLCAPS"]),
])
def test_camel_split(raw, subs):
    assert CAMEL_RE.findall(raw) == subs


@pytest.mark.parametrize("text,tokens", [
    ("def foo(bar):", ["def", "foo", "bar"]),
    ("x = 42 + y_1", ["x", "42", "y_1"]),
    ("a.b->c", ["a", "b", "c"]),
    ("", []),
    ("   \n\t ", []),
    ("123abc", ["123", "abc"]),  # number then identifier
])
def test_raw_tokens(text, tokens):
    assert TOKEN_RE.findall(text) == tokens


def test_full_and_subtokens():
    tok = Tokenizer(TokenizerConfig())
    assert tok.terms("parseHTTPResponse") == ["parsehttpresponse", "parse", "http", "response"]
    assert tok.terms("snake_case") == ["snake_case", "snake", "case"]
    assert tok.terms("plain") == ["plain"]
    assert tok.terms("__init__") == ["init", "__init__"]


def test_counts_and_length():
    tok = Tokenizer(TokenizerConfig())
    c = tok.counts("def foo():\n    return foo")
    assert c == Counter({"foo": 2, "def": 1, "return": 1})
    assert tok.doc_length("def foo():\n    return foo") == 4


def test_ngrams():
    tok = Tokenizer(TokenizerConfig(subtoken_ngram=2))
    assert tok.terms("parseHTTPResponse") == [
        "parsehttpresponse", "parse", "http", "response",
        "parse http", "http response",
    ]


def test_simple_mode_matches_sql_semantics():
    """simple() must equal regexp_extract_all(lower(text),'[a-z0-9_]+')."""
    import re
    tok = Tokenizer(TokenizerConfig.simple())
    text = "Def parseHTTP_Response x9 42 foo.bar"
    expect = re.findall(r"[a-z0-9_]+", text.lower())
    assert tok.terms(text) == expect


def test_max_token_len():
    tok = Tokenizer(TokenizerConfig(max_token_len=4))
    assert tok.terms("abcdefgh ab") == ["ab"]


def test_memo_consistency():
    tok = Tokenizer(TokenizerConfig())
    a = tok.terms("camelCase camelCase")
    assert a == ["camelcase", "camel", "case"] * 2


def test_terms_batch_parity_all_modes():
    """terms_batch (the vectorized build path) must reproduce the
    scalar terms() stream bit-exactly in every tokenizer mode,
    including unicode-lowering edge cases."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from mee_ray.config import TokenizerConfig
    from mee_ray.tokenizer import Tokenizer

    texts = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                          columns=["text"])["text"].to_pylist()[:200]
    texts += ["", None, "parseHTTPResponse v2Parser __init__ 2fast",
              "ABCdef 22_x snake_case a2b 2fast3x",
              "İstanbul KELVIN ẞß Δδ naïve café",
              "x" * 100 + " ok"]      # max_token_len boundary
    col = pa.array([t for t in texts], pa.string())
    for cfg in (TokenizerConfig(), TokenizerConfig.simple(),
                TokenizerConfig(subtoken_ngram=2),
                TokenizerConfig(split_identifiers=True,
                                emit_full_token=False),
                TokenizerConfig(max_token_len=8)):
        tok = Tokenizer(cfg)
        didx, tids, tdict = tok.terms_batch(col)
        seqs = [[] for _ in texts]
        for d, t in zip(didx, tids):
            seqs[d].append(tdict[t])
        for i, x in enumerate(texts):
            assert seqs[i] == tok.terms(x or ""), (cfg, x)
