"""Corpus fixtures (FIXTURES.md F1).

Two corpus sources, both deterministic:

1. :func:`generate_corpus` — seeded synthetic source-code table
   ``(repo, path, commit, lang, content)``: per-lang templates with
   camelCase + snake_case identifiers, hot keywords (skew for salting),
   one rare unique identifier per file (exact-match queries), Zipfian
   repo sizes, duplicate ``(repo, path)`` pairs with two commits
   (dedup/latest-wins), empty/whitespace rows, and a multi-100KB tail.

2. :func:`documents_as_corpus` — maps the driver's
   ``documents.parquet`` ``(doc_id, text, lang, ...)`` into the corpus
   schema with formulas simple enough to replicate in DuckDB SQL
   (FIXTURES.md F4 note), so oracle checks can cover the docs-build
   path end-to-end.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

_LANGS = ["python", "java", "go", "js", "c"]
_EXT = {"python": "py", "java": "java", "go": "go", "js": "js", "c": "c"}

# Hot keywords per language (Zipf head → exercises salting).
_KEYWORDS = {
    "python": ["def", "import", "return", "self", "class", "if", "for", "in", "None"],
    "java": ["public", "private", "static", "void", "class", "new", "return", "int", "String"],
    "go": ["func", "package", "return", "err", "nil", "range", "struct", "type", "var"],
    "js": ["function", "const", "let", "return", "var", "new", "this", "import", "export"],
    "c": ["int", "void", "return", "static", "struct", "char", "if", "for", "while"],
}

_IDENT_PARTS = ["parse", "build", "fetch", "merge", "index", "query", "token",
                "batch", "shard", "score", "count", "cache", "flush", "read",
                "write", "http", "json", "user", "order", "event"]


def _ident(rng: np.random.Generator, style: str) -> str:
    k = int(rng.integers(2, 4))
    parts = [_IDENT_PARTS[int(rng.integers(0, len(_IDENT_PARTS)))] for _ in range(k)]
    if style == "camel":
        return parts[0] + "".join(p.capitalize() for p in parts[1:])
    return "_".join(parts)


def _file_content(rng: np.random.Generator, lang: str, uniq: str, big: bool,
                  content_scale: int = 1) -> str:
    kw = _KEYWORDS[lang]
    lines = []
    n_funcs = int(rng.integers(2, 8)) * content_scale * (40 if big else 1)
    for _ in range(n_funcs):
        name = _ident(rng, "camel" if lang in ("java", "js") else "snake")
        arg = _ident(rng, "snake")
        k1 = kw[int(rng.integers(0, len(kw)))]
        k2 = kw[int(rng.integers(0, len(kw)))]
        body_id = _ident(rng, "camel")
        lines.append(f"{k1} {name}({arg}) {{")
        for _ in range(int(rng.integers(1, 5))):
            lines.append(f"    {k2} {body_id} = {arg} + {int(rng.integers(0, 100))};")
        lines.append(f"    return {body_id};  // {uniq}")
        lines.append("}")
    return "\n".join(lines)


def iter_corpus_slices(n_files: int, seed: int = 42,
                       slice_rows: int = 2000, content_scale: int = 1):
    """Stream the synthetic corpus row sequence in bounded-memory
    slices of ``slice_rows`` rows (last slice ragged).  ONE rng
    consumed in the original row order, so the concatenated slices
    are byte-identical to the historical whole-table generator for
    every (n_files, seed, content_scale)
    (test_sources.py::test_corpus_slice_writer_identity) — while peak
    memory is O(slice_rows) instead of O(n_files), which is what lets
    the multi-10M-doc scale corpora be written at all."""
    rng = np.random.default_rng(seed)
    n_repos = max(4, n_files // 40)
    # Zipfian repo popularity
    repo_weights = 1.0 / np.arange(1, n_repos + 1) ** 1.1
    repo_weights /= repo_weights.sum()
    # rng.choice(n, p=w) recomputes the O(n_repos) cdf EVERY draw —
    # O(n_files²/40) total, the corpus-gen wall at multi-million-file
    # scale.  Replicate its exact draw: Generator.choice normalizes
    # the cdf then searches one uniform (cdf /= cdf[-1];
    # cdf.searchsorted(u, 'right')) — do the SAME arithmetic so the
    # draw is bit-equivalent for every rng state (ADVICE r4: searching
    # u*cdf[-1] against the unnormalized cdf could differ within 1 ulp
    # of a bucket boundary), verified in
    # test_sources.py::test_generate_corpus_cdf_draw_identity.
    repo_cdf = np.cumsum(repo_weights)
    repo_cdf /= repo_cdf[-1]

    repos, paths, commits, langs, contents = [], [], [], [], []

    def cut(k: int) -> pa.Table:
        t = pa.table({
            "repo": pa.array(repos[:k], pa.string()),
            "path": pa.array(paths[:k], pa.string()),
            "commit": pa.array(commits[:k], pa.string()),
            "lang": pa.array(langs[:k], pa.string()),
            "content": pa.array(contents[:k], pa.string()),
        })
        del repos[:k], paths[:k], commits[:k], langs[:k], contents[:k]
        return t

    for i in range(n_files):
        r = int(repo_cdf.searchsorted(rng.random(), side="right"))
        repo = f"org{r % 7}/repo{r}"
        lang = _LANGS[int(rng.integers(0, len(_LANGS)))]
        path = f"src/pkg{int(rng.integers(0, 20))}/file_{i}.{_EXT[lang]}"
        commit = hashlib.sha1(f"{repo}/{path}@0".encode()).hexdigest()
        uniq = "uniq_" + hashlib.sha1(f"{seed}:{i}".encode()).hexdigest()[:12]
        big = (i % 500 == 499)
        if i % 200 == 199:
            content = ""  # empty-content edge case
        elif i % 200 == 198:
            content = "   \n\t  "  # whitespace-only edge case
        else:
            content = _file_content(rng, lang, uniq, big, content_scale)
        repos.append(repo); paths.append(path); commits.append(commit)
        langs.append(lang); contents.append(content)
        # ~4% of files get a second, later commit (latest-wins dedup)
        if i % 25 == 7:
            repos.append(repo); paths.append(path); langs.append(lang)
            commits.append(hashlib.sha1(f"{repo}/{path}@1".encode()).hexdigest())
            contents.append(content + f"\n// rev2 {uniq}_v2\n")
        while len(repos) >= slice_rows:
            yield cut(slice_rows)
    if repos:
        yield cut(len(repos))


def generate_corpus(n_files: int = 2000, seed: int = 42,
                    content_scale: int = 1) -> pa.Table:
    """Deterministic synthetic corpus. Same (n_files, seed,
    content_scale) → same table, independent of parallelism (generated
    driver-side, read as parquet). content_scale multiplies per-file
    function count (bench uses >1 for KB-scale files)."""
    slices = list(iter_corpus_slices(n_files, seed,
                                     slice_rows=max(1, n_files),
                                     content_scale=content_scale))
    if not slices:
        return pa.table({c: pa.array([], pa.string()) for c in
                         ("repo", "path", "commit", "lang", "content")})
    return pa.concat_tables(slices).combine_chunks()


def write_corpus(path: str, n_files: int = 2000, seed: int = 42,
                 rows_per_file: int = 2000, content_scale: int = 1) -> str:
    """Write the synthetic corpus as a multi-file parquet directory so
    ``read_parquet`` parallelizes over fragments.  Streams
    :func:`iter_corpus_slices` one file at a time — file layout and
    bytes identical to the historical materialize-then-slice form,
    peak memory O(rows_per_file)."""
    import os
    import pyarrow.parquet as pq
    os.makedirs(path, exist_ok=True)
    for part, t in enumerate(iter_corpus_slices(
            n_files, seed, slice_rows=rows_per_file,
            content_scale=content_scale)):
        pq.write_table(t, f"{path}/part-{part:05d}.parquet")
    return path


# --- documents.parquet → corpus schema (SQL-replicable formulas) -----------

def documents_as_corpus_batch(batch: pa.Table) -> pa.Table:
    """Map (doc_id, text, lang) → (repo, path, commit, lang, content).

    DuckDB equivalents (used verbatim in oracle SQL):
      repo   = 'org' || (doc_id % 10) || '/repo' || (doc_id % 97)
      path   = 'src/doc_' || doc_id || '.txt'
      commit = substr(sha256(CAST(doc_id AS VARCHAR)), 1, 40)
    """
    ids = batch["doc_id"].to_numpy(zero_copy_only=False)
    repo = [f"org{int(i) % 10}/repo{int(i) % 97}" for i in ids]
    path = [f"src/doc_{int(i)}.txt" for i in ids]
    commit = [hashlib.sha256(str(int(i)).encode()).hexdigest()[:40] for i in ids]
    return pa.table({
        "repo": pa.array(repo, pa.string()),
        "path": pa.array(path, pa.string()),
        "commit": pa.array(commit, pa.string()),
        "lang": batch["lang"],
        "content": batch["text"],
    })


def documents_as_corpus(sf_dir: str):
    """Ray Dataset view of documents.parquet in corpus schema."""
    import ray.data
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text", "lang"])
    return ds.map_batches(documents_as_corpus_batch, batch_format="pyarrow")
