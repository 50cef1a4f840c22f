"""Top-k BM25 query path.

The analog of the reference's read side — except the reference
delegates all scoring to Elasticsearch; here the engine owns it.

Determinism contract (shared with mee_ray.oracle.OracleIndex.search):
per-doc accumulation strictly in sorted-unique-term order, float64,
ties broken by ascending doc_id — so results are rank-identical AND
score-bit-identical to the oracle.

Two drivers over the same `_ShardIndex` core:

- :class:`Searcher` — in-process, lazy per-shard loading. Used by
  tests and as the per-actor worker.
- :class:`DistributedSearcher` — a pool of Ray shard actors, each
  owning a subset of term-shards (the index is sharded BY TERM for
  build-side skew control, per BASELINE.json north_star). A document's
  score can span shards for multi-term queries, so shard actors return
  exact per-term partial score vectors and the driver does the final
  per-doc merge + global top-k heap; queries whose terms all live on
  one actor run that actor's local block-max WAND and skip the merge.

  Scale note — why exact partials and not distributed WAND: with
  term-partitioned shards, per-shard pruning against a global
  threshold is unsound (a doc weak in one shard may be strong
  globally).  Two exact modes are implemented
  (DistributedSearcher.search(mode=...)):

  - "partials" (default): one round; each actor ships its full
    per-term partial vectors (unique docs × 12 B per term).  Wins
    while posting lists are modest.
  - "threephase": CA-style bound collection → exact local top-m →
    per-candidate partial fetch, looping with doubled m until the
    k-th exact candidate score strictly beats Σ of the actors' m-th
    best bounds.  Two+ rounds, but transfer is O(m + |C|·terms)
    instead of O(df) — the multi-million-doc-posting-list path.

Live stats: N/avgdl come from the manifest delta log
(mee_ray.manifest.live_stats) and df is counted after tombstone
filtering, so post-delta queries stay oracle-identical without a
compaction (SURVEY.md §7.5.5).
"""

from __future__ import annotations

import os
from collections import defaultdict

import numpy as np
import pyarrow.parquet as pq

from mee_ray import manifest as mf
from mee_ray.ids import isin_sorted, positions_in_sorted, term_hash
from mee_ray.postings import decode_posting_list, tf_norm, varint_decode
from mee_ray.scoring import idf, top_k_select


class _ShardIndex:
    """All segment rows of one term-shard (base + delta segments),
    with a term → [(file, row)] dictionary built once.

    Memory discipline for scale: the constructor reads ONLY the `term`
    column of each segment file (parquet column pruning) to build the
    dictionary; posting payloads load lazily per ROW GROUP on first
    touch (segments are written with bounded row groups), so an actor
    serving a cold shard holds the dictionary plus just the row groups
    its queries actually hit."""

    # bounded row-group cache: 512-row groups ≈ a few hundred KB each,
    # so 256 entries cap a cold shard's resident payload well under a
    # worker's heap while keeping the hot-term working set loaded
    RG_CACHE_CAP = 256
    # decoded-postings LRU: repeated hot query terms skip varint/pfor
    # decode entirely (a few MB at worst — arrays, not raw buffers)
    DEC_CACHE_CAP = 128

    def __init__(self, files: list[str], delta_files: list[str] = (),
                 file_hints: dict[str, float] | None = None,
                 file_seqs: dict[str, int] | None = None,
                 shard_id: int | None = None,
                 delta_dict: dict | None = None):
        from collections import OrderedDict
        self.files: list[pq.ParquetFile] = []
        self.is_delta: list[bool] = []
        self.rows: dict[str, list[tuple[int, int]]] = defaultdict(list)
        self._rg_cache: "OrderedDict[tuple[int, int], object]" = OrderedDict()
        self._dec_cache: "OrderedDict[tuple[int, int], tuple]" = OrderedDict()
        self._rg_bounds: list[np.ndarray] = []
        self._hints: list[float] = []
        self._seqs: list[int] = []
        file_hints = file_hints or {}
        file_seqs = file_seqs or {}
        for f, d in [(f, False) for f in files] + [(f, True) for f in delta_files]:
            pf = pq.ParquetFile(f)
            ti = len(self.files)
            self.files.append(pf)
            self.is_delta.append(d)
            self._hints.append(float(file_hints.get(f, 0.0)))
            self._seqs.append(int(file_seqs.get(f, 0)))
            # cumulative row offsets per row group → row → group lookup
            sizes = [pf.metadata.row_group(g).num_rows
                     for g in range(pf.num_row_groups)]
            self._rg_bounds.append(np.cumsum([0] + sizes))
            if d and delta_dict is not None:
                # delta files span shards: the owning Searcher read
                # each delta file's term column ONCE and shared
                # (terms, shard-of-term) across its shards — without
                # this an S-shard searcher re-reads and re-parses
                # every delta dictionary S times.  Keep only this
                # shard's terms so dictionary memory stays O(own
                # terms), not O(all × shards).
                terms, shards = delta_dict[f]
                for ri in np.nonzero(shards == shard_id)[0]:
                    self.rows[terms[ri]].append((ti, int(ri)))
                continue
            terms = pf.read(columns=["term"])["term"].to_pylist()
            for ri, term in enumerate(terms):
                self.rows[term].append((ti, ri))

    def _row(self, ti: int, ri: int) -> tuple[object, int]:
        """(row_group table, local row index) — row groups LRU-cached."""
        bounds = self._rg_bounds[ti]
        g = int(np.searchsorted(bounds, ri, side="right")) - 1
        key = (ti, g)
        t = self._rg_cache.get(key)
        if t is None:
            t = self._rg_cache[key] = self.files[ti].read_row_group(g)
            if len(self._rg_cache) > self.RG_CACHE_CAP:
                self._rg_cache.popitem(last=False)
        else:
            self._rg_cache.move_to_end(key)
        return t, ri - int(bounds[g])

    def _decode_row(self, ti: int, ri: int):
        key = (ti, ri)
        got = self._dec_cache.get(key)
        if got is not None:
            self._dec_cache.move_to_end(key)
            return got
        t, r = self._row(ti, ri)
        ids, tfs = decode_posting_list(t["doc_ids_enc"][r].as_py(),
                                       t["tfs_enc"][r].as_py())
        dls = varint_decode(t["dls_enc"][r].as_py()).astype(np.int64)
        self._dec_cache[key] = (ids, tfs, dls)
        if len(self._dec_cache) > self.DEC_CACHE_CAP:
            self._dec_cache.popitem(last=False)
        return ids, tfs, dls

    def prefetch(self, max_groups: int | None = None) -> int:
        """Index warmer (the ES warm-up analog): load posting row
        groups into the LRU up to its cap so a freshly-started query
        actor serves its FIRST queries at warm latency (cold first
        touch costs ~100s of ms per row group; measured in bench.py).
        Bounded by RG_CACHE_CAP, so on an index too large to cache the
        warmer loads the first cap-worth and lazy loading covers the
        rest — never more memory than steady state would use."""
        cap = self.RG_CACHE_CAP if max_groups is None \
            else min(max_groups, self.RG_CACHE_CAP)
        loaded = 0
        # round-robin across files so a capped warm covers the FRONT
        # of every segment file instead of exhausting the budget on
        # the first file (terms are sorted within a file, so breadth
        # beats depth for arbitrary first queries)
        max_g = max((pf.num_row_groups for pf in self.files), default=0)
        for g in range(max_g):
            for ti, pf in enumerate(self.files):
                if len(self._rg_cache) >= cap:
                    return loaded
                if g < pf.num_row_groups and (ti, g) not in self._rg_cache:
                    self._rg_cache[(ti, g)] = pf.read_row_group(g)
                    loaded += 1
        return loaded

    def postings(self, term: str) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Concatenated (doc_ids, tfs, dls) across salted sub-lists and
        delta segments. Doc sets are disjoint per source (salts are
        disjoint doc_id ranges; a re-add of an id lives in a NEWER
        source than the tombstone that killed the older copy), so order
        across chunks is irrelevant to per-doc accumulation — but live
        filtering must be per source (postings_by_source)."""
        locs = self.rows.get(term)
        if not locs:
            z = np.empty(0, dtype=np.int64)
            return z, z, z
        ids_l, tfs_l, dls_l = [], [], []
        for ti, ri in locs:
            ids, tfs, dls = self._decode_row(ti, ri)
            ids_l.append(ids); tfs_l.append(tfs); dls_l.append(dls)
        return (np.concatenate(ids_l), np.concatenate(tfs_l),
                np.concatenate(dls_l))

    def postings_by_source(self, term: str):
        """[(source_seq, doc_ids, tfs, dls)] per stored chunk — the
        sequenced-tombstone filter needs each chunk's source seq (base
        segments = 0, delta segments = their record seq)."""
        out = []
        for ti, ri in self.rows.get(term, ()):
            ids, tfs, dls = self._decode_row(ti, ri)
            out.append((self._seqs[ti], ids, tfs, dls))
        return out

    def _positions_row(self, ti: int, ri: int):
        """(flat absolute positions, per-doc offsets) for one stored
        chunk — decoded lazily, cached alongside the posting LRU."""
        from mee_ray.postings import decode_positions_concat
        key = ("pos", ti, ri)
        got = self._dec_cache.get(key)
        if got is not None:
            self._dec_cache.move_to_end(key)
            return got
        t, r = self._row(ti, ri)
        if "pos_enc" not in t.schema.names:
            raise ValueError("index was built without store_positions")
        _, tfs, _ = self._decode_row(ti, ri)
        flat, offs = decode_positions_concat(t["pos_enc"][r].as_py(), tfs)
        self._dec_cache[key] = (flat, offs)
        if len(self._dec_cache) > self.DEC_CACHE_CAP:
            self._dec_cache.popitem(last=False)
        return flat, offs

    def _positions_subset(self, ti: int, ri: int, keep: np.ndarray,
                          tfs: np.ndarray) -> np.ndarray:
        """Flat positions for the ``keep``-masked subset of one chunk's
        docs.  Slices the full decode when it is already cached (or
        when most docs survive anyway); otherwise decodes ONLY the kept
        runs via cached varint value-boundary offsets, so first touch
        of a hot term's position blob costs O(kept positions), not
        O(chunk positions) — the phrase-tail fix."""
        from mee_ray.postings import (decode_positions_subset,
                                      varint_value_offsets)
        full = self._dec_cache.get(("pos", ti, ri))
        if full is None and keep.mean() > 0.5:
            # majority survives: the full decode costs about the same
            # and its cache entry serves every later query
            full = self._positions_row(ti, ri)
        if full is not None:
            self._dec_cache.move_to_end(("pos", ti, ri))
            return full[0][np.repeat(keep, tfs)]
        key = ("posoff", ti, ri)
        off = self._dec_cache.get(key)
        t, r = self._row(ti, ri)
        if "pos_enc" not in t.schema.names:
            raise ValueError("index was built without store_positions")
        buf = t["pos_enc"][r].as_py()
        if off is None:
            off = varint_value_offsets(buf)
            self._dec_cache[key] = off
            if len(self._dec_cache) > self.DEC_CACHE_CAP:
                self._dec_cache.popitem(last=False)
        else:
            self._dec_cache.move_to_end(key)
        flat, _ = decode_positions_subset(buf, tfs,
                                          np.flatnonzero(keep), off)
        return flat


    def chunk_meta(self, term: str) -> list[dict]:
        """Per-chunk metadata WITHOUT decoding postings: stored block
        boundaries + max impacts, df, delta flag, and a lazy decode
        hook — the inputs of the block-max WAND cursor."""
        out = []
        for ti, ri in self.rows.get(term, ()):
            t, r = self._row(ti, ri)
            out.append({
                # ListScalar.values → numpy without a Python-list hop
                "block_last": t["block_last"][r].values.to_numpy(
                    zero_copy_only=False).astype(np.int64),
                "block_max": t["block_max"][r].values.to_numpy(
                    zero_copy_only=False).astype(np.float64),
                "df": int(t["df"][r].as_py()),
                "salt": int(t["salt"][r].as_py()),
                "delta": self.is_delta[ti],
                "hint_avgdl": self._hints[ti],
                "decode": (lambda ti=ti, ri=ri: self._decode_row(ti, ri)),
            })
        return out


def _segment_files(index_root: str, manifest: dict) -> tuple[list[str], list[str]]:
    """(base segment files, delta segment files)."""
    base = [s["path"] for s in manifest["segments"]]
    delta = []
    for d in manifest.get("deltas", []):
        delta.extend(d.get("segments", []))
    return base, delta


class Searcher:
    def __init__(self, index_root: str, epoch: str | None = None,
                 shard_subset: list[int] | None = None):
        self.index_root = index_root
        self.manifest = mf.load_manifest(index_root, epoch)
        mf.require_format(self.manifest)
        self.num_shards = self.manifest["num_shards"]
        self.n_docs, self.avgdl = mf.live_stats(self.manifest)
        self.k1 = self.manifest["bm25"]["k1"]
        self.b = self.manifest["bm25"]["b"]
        self.tomb_ids, self.tomb_seqs = mf.tombstone_index(self.manifest)
        self.tombstones = self.tomb_ids   # gate: any pending deletes?
        from mee_ray.wand import WandStats
        self.query_stats = WandStats()
        # merged-chunk cache for delta-bearing terms (wand.search_wand)
        # — valid for this snapshot's lifetime (immutable files)
        self._merge_cache: dict = {}
        self._vocab: list[str] | None = None  # sorted, built on demand
        self._tok = None  # index-config tokenizer, built on demand
        self._del_index: dict[str, list[str]] | None = None
        self._shards: dict[int, _ShardIndex] = {}
        self._delta_dict_cache: dict | None = None
        self._subset = set(shard_subset) if shard_subset is not None else None
        base, delta = _segment_files(index_root, self.manifest)
        # group files by shard: part = shard * parts_per_shard + r, so a
        # base partition file maps to exactly one shard = part // pps;
        # delta files may hold several shards (they're small — filtered
        # by the per-shard term dict at load)
        pps = self.manifest["parts_per_shard"]
        self._files_by_shard: dict[int, list[str]] = defaultdict(list)
        for f in base:
            part = int(os.path.basename(f).split("-")[1].split(".")[0])
            self._files_by_shard[part // pps].append(f)
        self._delta_files = delta
        # per-segment block-max hint base: segments copied verbatim
        # across compactions keep the avgdl their hints were computed
        # at; missing (older manifests) → the epoch's avgdl
        epoch_avgdl = float(self.manifest.get("avgdl") or 0.0)
        self._file_hints = {
            s["path"]: float(s.get("hint_avgdl") or epoch_avgdl)
            for s in self.manifest["segments"]}
        # delta segment file → record seq (base files default to 0)
        self._file_seqs = {f: d["seq"]
                           for d in self.manifest.get("deltas", [])
                           for f in d.get("segments", [])}

    def _delta_dict(self) -> dict:
        """file → (term list, shard-of-term int64 array) for every
        delta segment file, read ONCE per Searcher and shared by all
        its _ShardIndex instances (a per-shard read would re-parse
        every delta dictionary once per owned shard)."""
        if self._delta_dict_cache is None:
            ns = self.num_shards
            out = {}
            for f in self._delta_files:
                terms = pq.read_table(f, columns=["term"])["term"].to_pylist()
                out[f] = (terms, np.fromiter(
                    (term_hash(t) % ns for t in terms),
                    dtype=np.int64, count=len(terms)))
            self._delta_dict_cache = out
        return self._delta_dict_cache

    def _shard(self, s: int) -> _ShardIndex:
        got = self._shards.get(s)
        if got is None:
            files = list(self._files_by_shard.get(s, []))
            got = self._shards[s] = _ShardIndex(
                files, self._delta_files, self._file_hints,
                self._file_seqs, shard_id=s,
                delta_dict=self._delta_dict())
        return got

    def owns(self, shard: int) -> bool:
        return self._subset is None or shard in self._subset

    def _live_postings(self, shard: int, term: str):
        """(doc_ids, tfs, dls) with the sequenced-tombstone filter
        applied PER SOURCE: a tombstone at delta seq k kills only
        copies from sources < k, so a re-added doc's newer postings
        survive the tombstone that killed its older copy."""
        if len(self.tomb_ids) == 0:
            return self._shard(shard).postings(term)
        ids_l, tfs_l, dls_l = [], [], []
        for seq, ids, tfs, dls in self._shard(shard).postings_by_source(term):
            keep = mf.live_posting_mask(ids, seq, self.tomb_ids,
                                        self.tomb_seqs)
            if keep.all():
                ids_l.append(ids); tfs_l.append(tfs); dls_l.append(dls)
            elif keep.any():
                ids_l.append(ids[keep]); tfs_l.append(tfs[keep])
                dls_l.append(dls[keep])
        if not ids_l:
            z = np.empty(0, dtype=np.int64)
            return z, z, z
        return (np.concatenate(ids_l), np.concatenate(tfs_l),
                np.concatenate(dls_l))

    def term_raw_postings(self, term: str
                          ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """(live doc_ids, tfs, dls) for one term — THE routing rule
        (term_hash → shard → ownership → sequenced-tombstone filter)
        behind one public accessor, so federated/stat consumers never
        re-implement it.  Empty arrays when unowned or absent."""
        s = term_hash(term) % self.num_shards
        if not self.owns(s):
            e = np.empty(0, np.int64)
            return e, e, e
        return self._live_postings(s, term)

    def term_partials(self, terms: list[str]) -> dict[str, tuple[np.ndarray, np.ndarray]]:
        """term → (live doc_ids, exact per-term scores) for the terms
        whose shard this searcher owns."""
        out = {}
        for term in terms:
            ids, tfs, dls = self.term_raw_postings(term)
            if len(ids) == 0:
                continue
            w = idf(len(ids), self.n_docs)
            out[term] = (ids, w * tf_norm(tfs, dls, self.avgdl, self.k1, self.b))
        return out

    def term_partials_dl(self, terms: list[str]
                         ) -> dict[str, tuple[np.ndarray, np.ndarray,
                                              np.ndarray]]:
        """:meth:`term_partials` extended with each posting's document
        length — the transport for per-doc-dl consumers (terms_set,
        script_score)."""
        out = {}
        for term in terms:
            ids, tfs, dls = self.term_raw_postings(term)
            if len(ids) == 0:
                continue
            w = idf(len(ids), self.n_docs)
            out[term] = (ids,
                         w * tf_norm(tfs, dls, self.avgdl, self.k1,
                                     self.b),
                         dls)
        return out

    def complete(self, prefix: str, n: int = 5
                 ) -> list[tuple[int, str]]:
        """Completion suggester (ES completion / autocomplete): the
        top-``n`` dictionary terms starting with ``prefix``, as
        (live df, term) ranked df desc then term asc — one df lookup
        per candidate, live terms only (same rank contract as
        :meth:`suggest`)."""
        if n <= 0 or not prefix:
            return []
        ranked = sorted((-df, t)
                        for t in prefix_terms(self.vocabulary(), prefix)
                        if (df := self.term_df(t)) > 0)
        return [(-negdf, t) for negdf, t in ranked[:n]]

    def explain(self, terms: list[str], doc_id: int
                ) -> dict[str, dict[str, float]]:
        """Score breakdown for one document (the ES ``_explain`` API):
        term → {tf, dl, df, idf, contribution} for every query term
        the doc matches (live postings only).  The contributions sum
        — in sorted-term order, the engine's accumulation order — to
        the doc's exact search() score; asserted in tests."""
        out: dict[str, dict[str, float]] = {}
        for term in sorted(set(terms)):
            s = term_hash(term) % self.num_shards
            if not self.owns(s):
                continue
            ids, tfs, dls = self._live_postings(s, term)
            # ids are NOT globally sorted once delta segments exist
            # (delta chunks concatenate after base chunks) — a linear
            # scan is exact and this is a single-doc diagnostics path
            hit = np.flatnonzero(ids == doc_id)
            if not len(hit):
                continue
            df = len(ids)
            w = idf(df, self.n_docs)
            contrib = float(w * tf_norm(tfs[hit], dls[hit], self.avgdl,
                                        self.k1, self.b)[0])
            out[term] = {"tf": float(tfs[hit][0]),
                         "dl": float(dls[hit][0]),
                         "df": float(df), "idf": float(w),
                         "contribution": contrib}
        return out

    def allowed_ids_for_field(self, field: str, value: str) -> np.ndarray:
        """Sorted live doc_ids whose stored docs-table ``field`` equals
        ``value`` — the filter bitset of a FILTERED ALIAS (ES
        alias-with-filter).  Liveness-correct under deltas: sources are
        the base docs files (seq 0) plus each delta's added-docs file
        (its seq), and a row from source s survives iff no tombstone
        for its id has seq > s — the same rule the posting read path
        applies.  Row-group-pruned id-only reads (~8 B/doc collected);
        the distributed variant for billion-doc filters is the
        map_batches scan of pipelines.fulltext._allowed_ids_by_lang
        plus this liveness rule."""
        import os

        import pyarrow.dataset as pads
        if field not in mf.ALIAS_FILTER_FIELDS:
            raise ValueError(f"filterable fields: {mf.ALIAS_FILTER_FIELDS}")
        sources = mf.docs_sources(self.index_root, self.manifest,
                                  missing="skip")
        out = []
        for f, seq in sources:
            t = pads.dataset(f).to_table(
                columns=["doc_id"], filter=pads.field(field) == value)
            ids = t["doc_id"].to_numpy(zero_copy_only=False)
            if len(self.tomb_ids) and len(ids):
                keep = mf.live_posting_mask(ids, seq, self.tomb_ids,
                                            self.tomb_seqs)
                ids = ids[keep]
            if len(ids):
                out.append(ids)
        if not out:
            return np.empty(0, dtype=np.int64)
        return np.sort(np.concatenate(out))

    def get_doc(self, repo: str, path: str) -> dict | None:
        """Fetch one live document's stored fields by identity key
        (the ES GET /_doc analog): predicate-pushdown reads over the
        epoch docs table + delta added-docs files (row-group pruned —
        never a full scan), applying the sequenced-tombstone liveness
        rule (a copy from source s is live iff no tombstone for its id
        has seq > s; latest live source wins — the same rule
        delta._live_key_index enforces on the write path)."""
        import os

        import pyarrow.dataset as pads
        sources = mf.docs_sources(self.index_root, self.manifest,
                                  missing="skip")
        slim = ["doc_id", "repo", "path", "commit", "lang",
                "content_sha256", "length", "content"]
        best: tuple[int, dict] | None = None
        for f, seq in sources:
            dset = pads.dataset(f)
            # explicit projection: a legacy docs_tok fallback file also
            # carries the token columns — never decode those here
            cols = [c for c in slim if c in dset.schema.names]
            t = dset.to_table(
                columns=cols,
                filter=(pads.field("repo") == repo)
                & (pads.field("path") == path))
            for row in t.to_pylist():
                pos = int(np.searchsorted(self.tomb_ids, row["doc_id"]))
                dead = (pos < len(self.tomb_ids)
                        and int(self.tomb_ids[pos]) == row["doc_id"]
                        and int(self.tomb_seqs[pos]) > seq)
                if dead:
                    continue
                if best is None or seq >= best[0]:
                    best = (seq, row)
        return best[1] if best else None

    def term_partials_for_docs(self, terms: list[str],
                               doc_ids_sorted: np.ndarray
                               ) -> dict[str, tuple[np.ndarray, np.ndarray]]:
        """Like :meth:`term_partials` but restricted to a candidate doc
        set — phase 3 of the distributed three-phase protocol: only
        |candidates| × |terms| contributions cross the wire, never the
        full posting lists."""
        out = {}
        cand = np.asarray(doc_ids_sorted, dtype=np.int64)
        for term in terms:
            s = term_hash(term) % self.num_shards
            if not self.owns(s):
                continue
            ids, tfs, dls = self._live_postings(s, term)
            if len(ids) == 0:
                continue
            # df/idf from the FULL live posting list (identical to
            # term_partials), contributions only for the candidates
            w = idf(len(ids), self.n_docs)
            keep = isin_sorted(ids, cand)
            ids, tfs, dls = ids[keep], tfs[keep], dls[keep]
            if len(ids):
                out[term] = (ids, w * tf_norm(tfs, dls, self.avgdl,
                                              self.k1, self.b))
        return out

    def term_doc_positions(self, term: str,
                           candidates: np.ndarray | None = None
                           ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """(doc_ids, per-doc offsets, flat absolute positions) for one
        term's LIVE postings (sequenced-tombstone filter applied like
        :meth:`_live_postings`, with each killed doc's position run
        dropped via a repeat-mask — no per-doc loop).

        ``candidates`` (sorted doc_id array) is the phrase-path
        pushdown: chunks whose doc set misses the candidates entirely
        skip the position decode altogether, and surviving chunks keep
        only candidate docs' position runs — a hot term salted across
        many sub-lists decodes only the sub-lists the (rare-term-
        bounded) candidate set actually touches."""
        s = term_hash(term) % self.num_shards
        if not self.owns(s):
            return (np.empty(0, np.int64), np.zeros(1, np.int64),
                    np.empty(0, np.int64))
        shard = self._shard(s)
        ids_l, tf_l, flat_l = [], [], []
        for chunk_i, (ti, ri) in enumerate(shard.rows.get(term, ())):
            seq = shard._seqs[ti]
            ids, tfs, _dls = shard._decode_row(ti, ri)
            keep = None
            if len(self.tomb_ids):
                keep = mf.live_posting_mask(ids, seq, self.tomb_ids,
                                            self.tomb_seqs)
            if candidates is not None:
                in_cand = isin_sorted(ids, candidates)
                keep = in_cand if keep is None else (keep & in_cand)
            if keep is not None and not keep.any():
                continue                # skip the position decode
            if keep is None or keep.all():
                flat, _offs = shard._positions_row(ti, ri)
            else:
                flat = shard._positions_subset(ti, ri, keep, tfs)
                ids, tfs = ids[keep], tfs[keep]
            ids_l.append(ids); tf_l.append(tfs); flat_l.append(flat)
        if not ids_l:
            return (np.empty(0, np.int64), np.zeros(1, np.int64),
                    np.empty(0, np.int64))
        ids = np.concatenate(ids_l)
        tfs = np.concatenate(tf_l)
        flat = np.concatenate(flat_l)
        offs = np.concatenate(([0], np.cumsum(tfs)))
        return ids, offs, flat

    def search_phrase(self, terms: list[str], k: int = 10
                      ) -> list[tuple[int, float]]:
        """Exact phrase top-k: documents where ``terms`` occur at
        consecutive positions (in order, duplicates included), scored
        like ``operator="and"`` restricted to the matching docs (idf
        full-index; conjunction/phrase filter, never rescale).

        Vectorized verify: candidate docs (present in every unique
        term) map to dense ranks; each slot i contributes composite
        keys ``rank << 32 | (pos - i)``, and a phrase hit is a key
        that survives intersection across all slots — no per-doc loop
        (ranks, not raw doc_ids, because doc_ids are 63-bit hashes
        that cannot pack beside a position in 64 bits).
        Requires an index built with ``store_positions=True``."""
        if not terms:
            return []
        if not self.manifest.get("store_positions"):
            raise ValueError("phrase queries need store_positions=True "
                             "(pinned in the manifest at build)")
        uterms = sorted(set(terms))
        # candidate docs from the (cheap, LRU-cached) posting decode
        # BEFORE touching positions: hot terms then decode positions
        # only for chunks the candidate intersection actually reaches
        cand = self._candidate_docs(uterms)
        if cand is None:
            return []
        # rarest-term-first: each term's position blobs decode against
        # the candidate set SURVIVING the rarer slots' key intersection,
        # so a hot term's chunks are skipped wherever a rare term has
        # already eliminated the docs (the BASELINE.md positions-tail
        # optimization)
        order = sorted(uterms, key=lambda t: (self._stored_df(t), t))
        phrase_docs = phrase_match_docs_lazy(
            self.term_doc_positions, terms, cand, order)
        if phrase_docs.size == 0:
            return []
        partials = self.term_partials_for_docs(uterms, phrase_docs)
        return merge_partials_conjunctive([partials], uterms, k)

    def _stored_df(self, term: str) -> int:
        """Stored (tombstone-blind) chunk-df sum from resident segment
        metadata — the rarest-first ordering heuristic of the
        positional query family.  Never decodes postings; with pending
        tombstones it can overcount, which only perturbs the decode
        ORDER, never a result."""
        s = term_hash(term) % self.num_shards
        if not self.owns(s):
            return 0
        return sum(c["df"] for c in self._shard(s).chunk_meta(term))

    def _candidate_docs(self, uterms: list[str]) -> np.ndarray | None:
        """Sorted live docs holding EVERY term (posting decode only,
        LRU-warm) — the shared candidate pushdown of the positional
        query family (phrase / span_near / phrase_prefix).  None ⇔ no
        candidates (some term empty or intersection empty)."""
        cand = None
        for t in uterms:
            ids, _, _ = self._live_postings(
                term_hash(t) % self.num_shards, t)
            if len(ids) == 0:
                return None
            cand = (np.unique(ids) if cand is None
                    else np.intersect1d(cand, ids))
            if cand.size == 0:
                return None
        return cand

    def search_span_first(self, term: str, end: int,
                          k: int = 10) -> list[tuple[int, float]]:
        """ES ``span_first`` analog (single-term span, boundary
        ``end``): rank documents whose FIRST occurrence of ``term``
        lies within the first ``end`` token positions (0-based
        position < end, i.e. among the document's first ``end``
        tokens).  Membership gates, scores never rescale — survivors
        keep the term's plain BM25 contribution (the filter-context
        stance, delegated to :meth:`search_filtered`).  Positions are
        stored ascending per doc, so the first occurrence is each
        run's leading value — no scan.  Requires
        ``store_positions=True``."""
        if end <= 0 or not term:
            return []
        if not self.manifest.get("store_positions"):
            raise ValueError("span_first needs store_positions=True "
                             "(pinned in the manifest)")
        ids, offs, flat = self.term_doc_positions(term)
        if not len(ids):
            return []
        first = flat[offs[:-1]]
        allowed = np.sort(ids[first < end])
        if not allowed.size:
            return []
        return self.search_filtered([term], k, allowed)

    def search_span_not(self, include: str, exclude: str,
                        dist: int = 1, k: int = 10
                        ) -> list[tuple[int, float]]:
        """ES/Lucene ``span_not`` analog (single-term spans with a
        symmetric ``pre``/``post`` = ``dist``): rank documents having
        at least one occurrence of ``include`` with NO occurrence of
        ``exclude`` within ``dist`` token positions (a doc without
        ``exclude`` always matches).  Membership gates, scores never
        rescale — survivors keep the include term's plain BM25
        contribution (delegated to :meth:`search_filtered`, the
        filter-context stance shared with span_first).  Fully
        vectorized: exclude positions are composite-keyed per doc and
        each include occurrence checks only its two searchsorted
        neighbors.  Requires ``store_positions=True``."""
        if not include:
            return []
        if not self.manifest.get("store_positions"):
            raise ValueError("span_not needs store_positions=True "
                             "(pinned in the manifest)")
        if include == exclude:
            return []          # every occurrence vetoes itself
        inc = self.term_doc_positions(include)
        if not len(inc[0]):
            return []
        exc = self.term_doc_positions(exclude)
        allowed = span_not_match_docs(inc, exc, dist)
        if not allowed.size:
            return []
        return self.search_filtered([include], k, allowed)

    def search_span_near(self, terms: list[str], slop: int = 0,
                         k: int = 10) -> list[tuple[int, float]]:
        """Ordered proximity top-k (ES/Lucene ``span_near`` with
        ``in_order=true``): ``terms`` in order with at most ``slop``
        intervening tokens between each consecutive pair (``slop=0``
        ≡ :meth:`search_phrase`), scored like ``operator="and"``
        restricted to the matching docs.  Same candidate pushdown as
        the phrase path: positions are decoded only for docs holding
        every term.  Requires ``store_positions=True``."""
        if not terms:
            return []
        if not self.manifest.get("store_positions"):
            raise ValueError("span_near queries need "
                             "store_positions=True (pinned in the "
                             "manifest at build)")
        uterms = sorted(set(terms))
        cand = self._candidate_docs(uterms)
        if cand is None:
            return []
        data = {t: self.term_doc_positions(t, cand) for t in uterms}
        span_docs = span_near_match_docs(data, terms, slop)
        if span_docs.size == 0:
            return []
        partials = self.term_partials_for_docs(uterms, span_docs)
        return merge_partials_conjunctive([partials], uterms, k)

    def search_intervals(self, terms: list[str], max_gaps: int = 0,
                         ordered: bool = True, k: int = 10
                         ) -> list[tuple[int, float]]:
        """ES ``intervals`` query, ``match`` rule over distinct terms
        with a TOTAL ``max_gaps`` budget (shared across the whole
        interval — the semantic difference from :meth:`search_span_near`
        whose slop is per consecutive pair) and an ``ordered`` flag.
        Membership gates, scores never rescale: survivors are scored
        like ``operator="and"`` restricted to the matching docs, the
        filter-context stance of the whole positional family.  Same
        candidate pushdown as the phrase path.  Requires
        ``store_positions=True``."""
        if not terms:
            return []
        if not self.manifest.get("store_positions"):
            raise ValueError("intervals queries need "
                             "store_positions=True (pinned in the "
                             "manifest at build)")
        # Validate BEFORE the candidate pushdown so degenerate queries
        # fail the same way regardless of index contents (the kernel
        # re-checks, but only after data-dependent early-outs).
        if max_gaps < 0:
            raise ValueError(f"max_gaps must be >= 0, got {max_gaps}")
        if len(set(terms)) != len(terms):
            raise ValueError("intervals terms must be distinct")
        uterms = sorted(set(terms))
        cand = self._candidate_docs(uterms)
        if cand is None:
            return []
        data = {t: self.term_doc_positions(t, cand) for t in uterms}
        docs = intervals_match_docs(data, terms, max_gaps, ordered)
        if docs.size == 0:
            return []
        partials = self.term_partials_for_docs(uterms, docs)
        return merge_partials_conjunctive([partials], uterms, k)

    def _require_positions(self, what: str) -> None:
        if not self.manifest.get("store_positions"):
            raise ValueError(f"{what} queries need store_positions="
                             "True (pinned in the manifest at build)")

    def search_span_containing(self, big_terms: list[str], slop: int,
                               little: str, k: int = 10
                               ) -> list[tuple[int, float]]:
        """ES/Lucene ``span_containing``: documents where some
        ``span_near(big_terms, slop)`` span CONTAINS an occurrence of
        ``little`` (boundaries inclusive — overlap counts, Lucene's
        containment).  ES returns/scores the big clause, so survivors
        are scored conjunctively over ``big_terms`` restricted to the
        matching docs (membership gates, scores never rescale — the
        positional family's filter-context stance).  Requires ≥ 2 big
        terms (a 1-term span has no interior) and
        ``store_positions=True``."""
        if k <= 0:
            return []
        if len(big_terms) < 2:
            raise ValueError("span_containing needs >= 2 big terms")
        if not little:
            raise ValueError("span_containing needs a little term")
        if slop < 0:
            raise ValueError(f"slop must be >= 0, got {slop}")
        self._require_positions("span_containing")
        uterms = sorted(set(big_terms) | {little})
        cand = self._candidate_docs(uterms)
        if cand is None:
            return []
        data = {t: self.term_doc_positions(t, cand) for t in uterms}
        docs = span_containing_match_docs(data, big_terms, slop,
                                          little)
        if docs.size == 0:
            return []
        ubig = sorted(set(big_terms))
        partials = self.term_partials_for_docs(ubig, docs)
        return merge_partials_conjunctive([partials], ubig, k)

    def search_span_within(self, little: str, big_terms: list[str],
                           slop: int, k: int = 10
                           ) -> list[tuple[int, float]]:
        """ES/Lucene ``span_within`` — the same containment predicate
        as :meth:`search_span_containing` but the LITTLE clause is
        what's returned/scored: survivors keep ``little``'s plain
        BM25 contribution restricted to the matching docs."""
        if k <= 0:
            return []
        if len(big_terms) < 2:
            raise ValueError("span_within needs >= 2 big terms")
        if not little:
            raise ValueError("span_within needs a little term")
        if slop < 0:
            raise ValueError(f"slop must be >= 0, got {slop}")
        self._require_positions("span_within")
        uterms = sorted(set(big_terms) | {little})
        cand = self._candidate_docs(uterms)
        if cand is None:
            return []
        data = {t: self.term_doc_positions(t, cand) for t in uterms}
        docs = span_containing_match_docs(data, big_terms, slop,
                                          little)
        if docs.size == 0:
            return []
        partials = self.term_partials_for_docs([little], docs)
        return merge_partials_conjunctive([partials], [little], k)

    def search_span_or_near(self, slots: list[list[str]],
                            slop: int = 0, k: int = 10
                            ) -> list[tuple[int, float]]:
        """``span_near`` whose slots are ``span_or`` clauses: slot i
        matches ANY of its alternative terms, consecutive slots at
        most ``slop`` tokens apart in order (ES span_near over
        span_or sub-clauses).  Each slot's alternatives merge into
        one pseudo-slot position set (the phrase_prefix expansion
        mechanics), so the matcher stays fully vectorized.  Scoring:
        disjunctive BM25 over ALL alternatives restricted to the
        matching docs via :meth:`search_filtered` — per-doc matched
        alternatives contribute, absent ones add 0 (a documented,
        deterministic simplification of ES's per-span scoring)."""
        if k <= 0 or not slots:
            return []
        if any(not s for s in slots):
            raise ValueError("every span_or slot needs >= 1 term")
        if slop < 0:
            raise ValueError(f"slop must be >= 0, got {slop}")
        self._require_positions("span_or_near")
        cand: np.ndarray | None = None
        for slot in slots:
            ids_l = [self.term_raw_postings(t)[0]
                     for t in sorted(set(slot))]
            ids_l = [x for x in ids_l if x.size]
            if not ids_l:
                return []
            slot_ids = np.unique(np.concatenate(ids_l))
            cand = (slot_ids if cand is None
                    else np.intersect1d(cand, slot_ids))
            if cand.size == 0:
                return []
        pseudo = [f"\x00slot{i}" for i in range(len(slots))]
        data = {p: merge_position_sets(
                    [self.term_doc_positions(t, cand)
                     for t in sorted(set(slot))])
                for p, slot in zip(pseudo, slots)}
        docs = span_near_match_docs(data, pseudo, slop)
        if docs.size == 0:
            return []
        all_terms = sorted({t for slot in slots for t in slot})
        return self.search_filtered(all_terms, k, docs)

    def search_phrase_prefix(self, terms: list[str], k: int = 10,
                             max_expansions: int = 50
                             ) -> list[tuple[int, float]]:
        """match_phrase_prefix (ES search-as-you-type): docs containing
        ``terms[:-1]`` at consecutive positions followed immediately by
        ANY token starting with ``terms[-1]``.  Scoring: conjunctive
        BM25 over the FIXED terms restricted to the matching docs
        (the expansion slot gates membership, it does not contribute —
        a documented, deterministic simplification of ES's
        synonym-blended multi-term weight).  Requires ≥ 2 terms (a
        single-prefix query is :meth:`search_prefix`).

        The prefix expands against the resident sorted dictionary
        (binary-searched run), capped at ``max_expansions`` in
        dictionary order like ES — a hit beyond the cap is missed, the
        same truncation contract ES documents.  Expansion position
        sets merge into ONE pseudo-slot per doc, so the phrase matcher
        stays fully vectorized."""
        if len(terms) < 2:
            raise ValueError("match_phrase_prefix needs >= 2 terms; "
                             "use search_prefix for a bare prefix")
        if not self.manifest.get("store_positions"):
            raise ValueError("phrase_prefix queries need "
                             "store_positions=True")
        fixed, prefix = terms[:-1], terms[-1]
        ufixed = sorted(set(fixed))
        cand = self._candidate_docs(ufixed)
        if cand is None:
            return []
        expansions = prefix_terms(self.vocabulary(),
                                  prefix)[:max_expansions]
        if not expansions:
            return []
        pseudo = "\x00" + prefix           # cannot collide with a token

        # rarest-first over the fixed slots, expansion slot LAST: all
        # max_expansions position decodes run against the candidate set
        # already narrowed by the fixed-phrase key intersection
        def fetch(t, alive):
            if t == pseudo:
                return merge_position_sets(
                    [self.term_doc_positions(e, alive)
                     for e in expansions])
            return self.term_doc_positions(t, alive)

        order = sorted(ufixed,
                       key=lambda t: (self._stored_df(t), t)) + [pseudo]
        phrase_docs = phrase_match_docs_lazy(
            fetch, list(fixed) + [pseudo], cand, order)
        if phrase_docs.size == 0:
            return []
        partials = self.term_partials_for_docs(ufixed, phrase_docs)
        return merge_partials_conjunctive([partials], ufixed, k)

    def search_filtered(self, terms: list[str], k: int,
                        allowed_doc_ids, operator: str = "or",
                        use_wand: bool | None = None
                        ) -> list[tuple[int, float]]:
        """Filter-context search — the ES bool ``{must: match,
        filter: ...}`` analog (the reference delegates this to ES;
        here the engine owns it): rank only documents in
        ``allowed_doc_ids``, with df/idf/avgdl from the FULL live
        index.  A filter restricts the result set, it never rescales
        scores — the same stance as ``operator="and"`` — so a doc's
        filtered score equals its unfiltered score.

        Disjunctive queries push the filter INTO block-max WAND
        (wand.search_wand ``allowed``): non-allowed docs are skipped
        without scoring while pruning bounds stay full-index — whole
        chunks a selective filter never reaches are skipped without
        decode.  Same tombstone gate as :meth:`search` (stored df /
        bounds unsound while deletes pend → exhaustive restricted
        path).

        Exhaustive restricted path: per-term contributions are
        fetched only for allowed docs (:meth:`term_partials_for_docs`),
        so per-term work beyond the posting decode is
        O(|allowed ∩ postings|).  The allowed set is a sorted int64
        doc_id array (ids-only, ~8 B/doc — the id-set analog of a
        filter bitset; a roaring-bitmap carrier is the documented
        upgrade when filters routinely match billions of docs)."""
        if k <= 0 or not terms:
            return []
        allowed = np.unique(np.asarray(allowed_doc_ids, dtype=np.int64))
        if allowed.size == 0:
            return []
        uterms = sorted(set(terms))
        if operator == "and":
            partials = self.term_partials_for_docs(uterms, allowed)
            return merge_partials_conjunctive([partials], uterms, k)
        if use_wand is None:
            use_wand = len(self.tombstones) == 0
        if use_wand:
            return self.search_wand(uterms, k, allowed=allowed)
        partials = self.term_partials_for_docs(uterms, allowed)
        return merge_partials([partials], uterms, k)

    def vocabulary(self) -> list[str]:
        """Sorted union of the index's terms across owned shards —
        dictionary-only (term columns are already memory-resident per
        shard; no posting decode).  Feeds prefix/fuzzy query
        expansion.  Built once per snapshot (cached).  Prefix
        expansion binary-searches this sorted array
        (O(log V + matches)); fuzzy at max_edits=1 looks up a
        deletion-neighborhood index (also snapshot-cached) and only
        falls back to a linear scan for larger edit distances."""
        if self._vocab is None:
            out: set[str] = set()
            for sh in range(self.num_shards):
                if self.owns(sh):
                    out.update(self._shard(sh).rows.keys())
            self._vocab = sorted(out)
        return self._vocab

    def search_prefix(self, prefix: str, k: int = 10
                      ) -> list[tuple[int, float]]:
        """Prefix query (ES match_phrase_prefix / wildcard `term*`
        analog): expand the prefix against the dictionary, then score
        the expansion disjunctively — each expanded term keeps its own
        df/idf, so the result equals an OR query over the matching
        vocabulary."""
        if k <= 0 or not prefix:
            return []
        terms = prefix_terms(self.vocabulary(), prefix)
        if not terms:
            return []
        return self.search(terms, k)

    def search_fuzzy(self, term: str, k: int = 10, max_edits: int = 1
                     ) -> list[tuple[int, float]]:
        """Fuzzy query (ES match with fuzziness): expand to dictionary
        terms within plain Levenshtein distance ``max_edits`` (unit
        costs, no transposition — the same metric as the SQL oracle's
        levenshtein()), then score the expansion disjunctively."""
        if k <= 0 or not term:
            return []
        terms = fuzzy_terms(self.vocabulary(), term, max_edits,
                            self._deletion_index if max_edits == 1
                            else None)
        if not terms:
            return []
        return self.search(terms, k)

    def search_wildcard(self, pattern: str, k: int = 10
                        ) -> list[tuple[int, float]]:
        """Wildcard query (ES ``wildcard``, ``*``/``?``): expand
        against the dictionary (literal-prefix narrowed), then score
        the expansion disjunctively — each expanded term keeps its
        own df/idf."""
        if k <= 0 or not pattern:
            return []
        terms = wildcard_terms(self.vocabulary(), pattern)
        if not terms:
            return []
        return self.search(terms, k)

    def search_regexp(self, pattern: str, k: int = 10
                      ) -> list[tuple[int, float]]:
        """Regexp query (ES ``regexp``, implicitly anchored): expand
        by full-match against the dictionary, score disjunctively."""
        if k <= 0 or not pattern:
            return []
        terms = regexp_terms(self.vocabulary(), pattern)
        if not terms:
            return []
        return self.search(terms, k)

    def _deletion_index(self) -> dict[str, list[str]]:
        """Snapshot-cached :func:`build_deletion_index`."""
        if self._del_index is None:
            self._del_index = build_deletion_index(self.vocabulary())
        return self._del_index

    def suggest(self, term: str, n: int = 5, max_edits: int = 1
                ) -> list[tuple[int, str]]:
        """Term suggester (ES \"did you mean\"): dictionary terms
        within ``max_edits`` of the input (the input itself excluded),
        ranked by live df desc then term asc — the most common close
        spelling first.  Returns (df, term) pairs."""
        if n <= 0 or not term:
            return []
        cands = fuzzy_terms(self.vocabulary(), term, max_edits,
                            self._deletion_index if max_edits == 1
                            else None)
        # live df only: a fully-tombstoned term is still a dictionary
        # key but must never be suggested (it matches zero live docs)
        ranked = sorted((-df, t) for t in cands
                        if t != term and (df := self.term_df(t)) > 0)
        return [(-negdf, t) for negdf, t in ranked[:n]]

    def term_total_tf(self, term: str) -> int:
        """Total live occurrence count of one term (sum of tfs) — the
        unigram count of the phrase-suggester language model."""
        s = term_hash(term) % self.num_shards
        if not self.owns(s):
            return 0
        _, tfs, _ = self._live_postings(s, term)
        return int(tfs.sum()) if len(tfs) else 0

    def bigram_count(self, w1: str, w2: str) -> int:
        """Corpus-wide count of ADJACENT occurrences (w1 at position
        p, w2 at p+1, summed over live docs) — the bigram count of the
        phrase-suggester LM.  Composite-key intersection per common
        doc, fully vectorized.  Requires store_positions."""
        return _bigram_count_runs(self.term_doc_positions(w1),
                                  self.term_doc_positions(w2))

    def suggest_phrase(self, terms: list[str], n: int = 3,
                       max_candidates: int = 5, backoff: float = 0.4
                       ) -> list[tuple[float, list[str]]]:
        """Phrase suggester (the ES ``phrase`` suggester, did-you-mean
        over whole phrases): per-slot candidates are the dictionary
        terms within edit distance 1 of the input (the input itself
        included when live), ranked (df desc, term asc) and capped at
        ``max_candidates``; every combination is scored by a
        stupid-backoff bigram language model over the live corpus:

            ln(c(w1)/T) + Σ [ ln(cb(wi, wi+1) / c(wi))   if cb > 0
                              else ln(backoff·c(wi+1)/T) ]

        with T the live token total.  Scores are rounded to 10
        decimals (the libm-vs-DuckDB ln ULP, see bm25_explain) and
        ranked (score desc, phrase asc).  Requires store_positions."""
        if not terms or n <= 0:
            return []
        if not self.manifest.get("store_positions"):
            raise ValueError("suggest_phrase needs store_positions=True "
                             "(bigram counts are positional)")
        slots: list[list[str]] = []
        for t in terms:
            cands = [(df, w) for df, w in
                     self.suggest(t, n=max_candidates)]
            self_df = self.term_df(t)
            if self_df > 0:
                cands.append((self_df, t))
            ranked = sorted(cands, key=lambda x: (-x[0], x[1]))
            slots.append([w for _, w in ranked[:max_candidates]])
            if not slots[-1]:
                return []
        _, total = mf.live_totals(self.manifest)
        words = {w for s_ in slots for w in s_}
        uni = {w: self.term_total_tf(w) for w in words}
        # decode (and run-sort) each word's positions ONCE — the pair
        # loop would otherwise re-decode every word per pair (O(C²))
        pos = {w: _sort_runs(*self.term_doc_positions(w))
               for w in words}
        bi: dict[tuple[str, str], int] = {}
        for i in range(len(slots) - 1):
            for w1 in slots[i]:
                for w2 in slots[i + 1]:
                    if (w1, w2) not in bi:
                        bi[(w1, w2)] = _bigram_count_runs(pos[w1],
                                                          pos[w2])
        return _lm_score_slots(slots, uni, bi, total, n, backoff)

    def count(self, terms: list[str], operator: str = "or") -> int:
        """Match count without scoring (the ES ``_count`` API): number
        of live documents containing ANY (``or``) or EVERY (``and``)
        query term.  Posting id sets only — no tf/dl decode use, no
        accumulation, no heap.  Unowned shards are skipped like every
        other posting accessor (a shard-subset searcher counts only
        what it owns; an ``and`` over an unowned term is 0, matching
        search(operator="and") returning [])."""
        return int(self.matched_doc_ids(terms, operator).size)

    def matched_doc_ids(self, terms: list[str], operator: str = "or"
                        ) -> np.ndarray:
        """Sorted live doc_ids matching the query — the id-set core
        shared by :meth:`count` and ``delete_by_query`` (posting id
        sets only, no scoring).  ``or`` = union, ``and`` =
        intersection; an ``and`` over an unowned or absent term is
        empty, matching search(operator="and")."""
        empty = np.empty(0, dtype=np.int64)
        uterms = sorted(set(terms))
        if not uterms:
            return empty
        if operator == "and":
            cand = None
            for t in uterms:
                s = term_hash(t) % self.num_shards
                if not self.owns(s):
                    return empty
                ids = np.unique(self._live_postings(s, t)[0])
                cand = ids if cand is None else np.intersect1d(cand, ids)
                if cand.size == 0:
                    return cand
            return cand
        return self.excluded_doc_ids(uterms)

    def excluded_doc_ids(self, must_not: list[str]) -> np.ndarray:
        """Sorted union of live doc_ids containing ANY of ``must_not``
        — the must_not exclusion set of a boolean query (also the
        OR-count set of :meth:`count`).  Unowned shards are skipped
        like every other posting accessor."""
        out = []
        for t in sorted(set(must_not)):
            s = term_hash(t) % self.num_shards
            if not self.owns(s):
                continue
            ids, _, _ = self._live_postings(s, t)
            if len(ids):
                out.append(ids)
        if not out:
            return np.empty(0, dtype=np.int64)
        return np.unique(np.concatenate(out))

    def search_boolean(self, must: list[str], must_not: list[str],
                       k: int = 10) -> list[tuple[int, float]]:
        """ES bool ``{should: match, must_not: match}`` analog:
        disjunctive BM25 ranking over ``must`` terms with documents
        containing ANY ``must_not`` term removed.  must_not is
        filter-context — survivors keep their exact unfiltered scores
        (df/idf/avgdl full-index), the same never-rescale stance as
        ``operator="and"`` and ``search_filtered``."""
        if k <= 0 or not must:
            return []
        uterms = sorted(set(must))
        partials = self.term_partials(uterms)
        excl = self.excluded_doc_ids(must_not)
        return merge_partials([partials], uterms, k, exclude_sorted=excl)

    def _tokenizer(self):
        """The index's OWN tokenizer, reconstructed from the manifest
        (the same rule lifecycle entry points use) — seed text in
        more_like_this must analyze exactly like the indexed corpus."""
        if self._tok is None:
            self._tok = tokenizer_from_manifest(self.manifest)
        return self._tok

    def term_df(self, term: str) -> int:
        """LIVE document frequency of one term.  Dictionary-only
        (chunk df sums — no posting decode) on a tombstone-free
        snapshot, where base and delta doc sets are disjoint (a re-add
        of a live key is either a no-op upsert or tombstone+re-add);
        with deletes pending the stored dfs are stale, so the live
        postings are decoded instead."""
        s = term_hash(term) % self.num_shards
        if not self.owns(s):
            return 0
        if len(self.tombstones):
            ids, _, _ = self._live_postings(s, term)
            return len(ids)
        return sum(c["df"] for c in self._shard(s).chunk_meta(term))

    def select_mlt_terms(self, text: str, max_terms: int,
                         df_of=None) -> list[str]:
        """more_like_this term selection: analyze ``text`` with the
        index tokenizer, score each in-dictionary term tf·idf (float
        product, same operand order as the SQL oracle), keep the top
        ``max_terms`` with ties broken by term asc."""
        counts = self._tokenizer().counts(text)
        return select_terms_tfidf(counts, self.n_docs,
                                  df_of or self.term_df, max_terms)

    def more_like_this(self, text: str, k: int = 10,
                       max_terms: int = 10, exclude_doc_ids=None
                       ) -> list[tuple[int, float]]:
        """ES ``more_like_this`` analog: re-analyze the seed text,
        select the top ``max_terms`` terms by tf·idf against the live
        dictionary, then rank the selection disjunctively with the
        seed doc(s) excluded (exclusion filters after accumulation,
        it never rescales — the must_not stance)."""
        if k <= 0 or max_terms <= 0 or not text:
            return []
        sel = self.select_mlt_terms(text, max_terms)
        if not sel:
            return []
        excl = None
        if exclude_doc_ids is not None:
            excl = np.unique(np.asarray(list(exclude_doc_ids),
                                        dtype=np.int64))
        partials = self.term_partials(sel)
        return merge_partials([partials], sel, k, exclude_sorted=excl)

    def msearch(self, queries: list[list[str]], k: int = 10
                ) -> list[list[tuple[int, float]]]:
        """Multi-search (ES ``_msearch``): in-process form — shared
        terms hit the decode LRU once; results are exactly
        ``[search(q, k) for q in queries]``."""
        return [self.search(q, k) for q in queries]

    def search_after(self, terms: list[str], size: int = 10,
                     after: tuple[int, float] | None = None
                     ) -> list[tuple[int, float]]:
        """Cursor pagination (ES ``search_after``): the next ``size``
        results STRICTLY after the cursor in the (-score, doc_id)
        ranking order (``after=None`` is page one; the cursor is the
        previous page's last (doc_id, score) result tuple, passed
        verbatim).
        Stateless like ES — each page recomputes the ranking and
        filters at exact accumulated scores, so stitched pages
        reconstruct the full ranking with no duplicate or dropped doc
        even across exact-tie runs.  Exhaustive path by design: a
        cursor upper-bounds scores, which the lower-bound WAND
        pruning cannot exploit."""
        if size <= 0 or not terms:
            return []
        uterms = sorted(set(terms))
        partials = self.term_partials(uterms)
        return merge_partials([partials], uterms, size, after=after)

    def search_dismax(self, terms: list[str], k: int = 10,
                      tie_breaker: float = 0.0
                      ) -> list[tuple[int, float]]:
        """Dis-max ranking (ES ``dis_max``): best single-term
        contribution + tie_breaker × the rest (see
        :func:`merge_partials_dismax`)."""
        if k <= 0 or not terms:
            return []
        uterms = sorted(set(terms))
        partials = self.term_partials(uterms)
        return merge_partials_dismax([partials], uterms, k, tie_breaker)

    def search_min_match(self, terms: list[str], k: int,
                         min_match: int) -> list[tuple[int, float]]:
        """ES ``minimum_should_match`` analog: rank only documents
        matching at least ``min_match`` DISTINCT query terms; survivor
        scores equal their full disjunctive scores (df/idf/avgdl stay
        full-index — the count threshold filters, it never rescales).
        min_match<=1 degenerates to OR, min_match==len(terms) to AND
        — same result set AND same scores as those operators."""
        if k <= 0 or not terms:
            return []
        uterms = sorted(set(terms))
        m = max(1, int(min_match))
        if m > len(uterms):
            return []
        partials = self.term_partials(uterms)
        return merge_partials([partials], uterms, k, min_match=m)

    def _gather_with_dl(self, uterms: list[str]):
        """Exhaustive disjunctive gather over sorted ``uterms`` with
        per-doc document length (see :func:`_accumulate_with_dl` for
        the result shape and the determinism contract)."""
        return _accumulate_with_dl([self.term_partials_dl(uterms)],
                                   uterms)

    def search_terms_set(self, terms: list[str], k: int,
                         dl_threshold: int, low: int = 1, high: int = 2
                         ) -> list[tuple[int, float]]:
        """ES ``terms_set`` query: the required distinct-match count is
        PER-DOCUMENT, read from indexed per-doc data (ES
        ``minimum_should_match_field``) — here the indexed document
        length: docs shorter than ``dl_threshold`` tokens need ``low``
        distinct query terms, longer docs need ``high``.  Survivors
        keep their full disjunctive scores (the per-doc threshold
        filters, it never rescales), and accumulation stays in
        sorted-term order (the determinism contract), so a survivor's
        score is bit-identical to the plain OR query's."""
        if k <= 0 or not terms:
            return []
        uterms = sorted(set(terms))
        return _terms_set_select(self._gather_with_dl(uterms),
                                 dl_threshold, low, high, k)

    def search_common_terms(self, terms: list[str],
                            cutoff_frequency: float = 0.5,
                            k: int = 10) -> list[tuple[int, float]]:
        """ES ``common_terms`` query (cutoff-frequency shape; ES also
        exposes it as ``match`` + ``cutoff_frequency``): query terms
        split by LIVE document frequency — a term is high-frequency
        when ``df > cutoff_frequency * n_docs``.  Low-frequency terms
        are REQUIRED (conjunction — an absent or unknown low term
        empties the result); high-frequency terms never gate, they
        only add their BM25 contribution to docs that survive the
        low-term conjunction.  With no low-frequency term the query
        degrades to the plain disjunction (the ES ``high_freq_operator
        = or`` fallback).  Scores never rescale: a survivor's score is
        the plain OR query's score over its matched terms."""
        if k <= 0 or not terms:
            return []
        uterms = sorted(set(terms))
        thresh = cutoff_frequency * self.n_docs
        low = [t for t in uterms if self.term_df(t) <= thresh]
        if not low:
            return self.search(uterms, k)
        allowed = self._candidate_docs(low)
        if allowed is None:
            return []
        return self.search_filtered(uterms, k, allowed)

    def search_script_score(self, terms: list[str], script: str,
                            k: int = 10) -> list[tuple[int, float]]:
        """ES ``script_score`` query: the disjunctive BM25 score of
        every matching doc is REPLACED by ``script`` — an expression
        in the engine's scalar-function DSL (mee_ray.functions.scalar,
        the reference's resolver surface) evaluated over a columnar
        batch with ``_score`` (float64 BM25) and ``dl`` (int64 doc
        token count), e.g. ``div(mul(_score, dl), sum(dl, 10))``.
        The script compiles ONCE per query (driver-side, eager
        validation) and evaluates vectorized over all matches — never
        per doc.  An arbitrary script breaks WAND's monotone-bound
        contract, so matching is exhaustive disjunctive by design
        (the same stance ES documents for script_score)."""
        from mee_ray.functions.scalar import compile_expr
        if k <= 0 or not terms:
            return []
        fn = compile_expr(script)
        uterms = sorted(set(terms))
        return _script_rescore(self._gather_with_dl(uterms), fn, k)

    def search_weighted(self, term_boosts: dict[str, float], k: int
                        ) -> list[tuple[int, float]]:
        """Per-term query-time boosts (ES ``term^boost``): each term's
        exact contribution vector is scaled by its boost BEFORE the
        sorted-term accumulation, so score = Σ_t boost_t·idf_t·tfn_t
        in sorted-term order (float multiply is commutative, so the
        oracle's boost·(idf·tfn) is bit-identical).  Non-positive
        boosts are rejected — a zero boost is a term removal, a
        negative one would need must_not semantics."""
        if k <= 0 or not term_boosts:
            return []
        if any(b <= 0 for b in term_boosts.values()):
            raise ValueError("boosts must be positive; drop the term "
                             "or use search_boolean must_not instead")
        uterms = sorted(term_boosts)
        partials = self.term_partials(uterms)
        boosted = {t: (ids, sc * float(term_boosts[t]))
                   for t, (ids, sc) in partials.items()}
        return merge_partials([boosted], uterms, k)

    def search(self, terms: list[str], k: int = 10,
               use_wand: bool | None = None,
               operator: str = "or") -> list[tuple[int, float]]:
        """Top-k (doc_id, score).  Uses the block-max WAND path when it
        is exact-equivalent: pending tombstones make the live df (hence
        idf) unknowable without decoding, so while deletes await
        compaction the exhaustive path runs instead.

        ``operator="and"`` scores only documents containing EVERY
        query term (ES ``operator: and``); idf still uses full-index
        df, so scores of surviving docs equal their disjunctive
        scores — conjunction filters, it does not rescale."""
        if k <= 0:
            return []
        uterms = sorted(set(terms))
        if operator == "and":
            return merge_partials_conjunctive(
                [self.term_partials(uterms)], uterms, k)
        if use_wand is None:
            use_wand = len(self.tombstones) == 0
        if not use_wand:
            partials = self.term_partials(uterms)
            return merge_partials([partials], uterms, k)
        return self.search_wand(uterms, k)

    def search_wand(self, uterms: list[str], k: int,
                    stats=None, allowed: np.ndarray | None = None
                    ) -> list[tuple[int, float]]:
        from mee_ray.wand import WandStats, search_wand

        if len(self.tombstones):
            # stored df (hence idf) and chunk block maxes include the
            # tombstoned docs — WAND over them is unsound; search()
            # gates this automatically, direct callers get told why
            raise ValueError(
                "pending tombstones make stored df/chunk bounds "
                "unsound for WAND; use search() (exhaustive fallback) "
                "until compaction")
        if stats is None:
            # cumulative per-searcher pruning counters (query metrics,
            # north_star) — read via .query_stats.as_dict()
            stats = self.query_stats
        term_chunks: dict[str, tuple[float, list[dict]]] = {}
        for term in uterms:
            s = term_hash(term) % self.num_shards
            if not self.owns(s):
                continue
            chunks = self._shard(s).chunk_meta(term)
            if not chunks:
                continue
            df = sum(c["df"] for c in chunks)
            term_chunks[term] = (idf(df, self.n_docs), chunks)
        return search_wand(term_chunks, k, self.n_docs, self.avgdl,
                           self.manifest.get("avgdl") or self.avgdl,
                           self.k1, self.b,
                           block_size=self.manifest.get("block_size", 128),
                           stats=stats,
                           salt_factor=self.manifest.get("salt_factor"),
                           merge_cache=self._merge_cache,
                           allowed=allowed)


def _deletions1(t: str) -> set[str]:
    """The term plus every string reachable by deleting one char."""
    return {t} | {t[:i] + t[i + 1:] for i in range(len(t))}


def prefix_terms(vocab: list[str], prefix: str) -> list[str]:
    """The contiguous prefix run of a SORTED vocabulary:
    O(log V) bisect to its start, O(|matches|) walk."""
    import bisect
    lo = bisect.bisect_left(vocab, prefix)
    hi = lo
    while hi < len(vocab) and vocab[hi].startswith(prefix):
        hi += 1
    return vocab[lo:hi]


def wildcard_regex(pattern: str) -> str:
    """Translate an ES wildcard pattern (``*`` = any run, ``?`` = one
    char) into an anchored-regex SOURCE string.  The same string is
    used verbatim by Python's ``re.fullmatch`` (engine side) and
    DuckDB's ``regexp_full_match`` (oracle side); the emitted subset
    (escaped literals, ``.``, ``.*``) means the two regex dialects
    cannot disagree."""
    import re
    out = []
    for ch in pattern:
        if ch == "*":
            out.append(".*")
        elif ch == "?":
            out.append(".")
        else:
            out.append(re.escape(ch))
    return "".join(out)


def wildcard_terms(vocab: list[str], pattern: str) -> list[str]:
    """Dictionary terms matching an ES wildcard pattern.  The literal
    prefix before the first metacharacter narrows the scan to its
    contiguous run of the SORTED vocabulary (a `mer*`-style pattern
    never walks the whole dictionary); a leading wildcard degrades to
    a full scan of the memory-resident term list."""
    import re
    i = min((pattern.index(c) for c in "*?" if c in pattern),
            default=len(pattern))
    cands = prefix_terms(vocab, pattern[:i]) if i else vocab
    rx = re.compile(wildcard_regex(pattern))
    return [t for t in cands if rx.fullmatch(t)]


def regexp_terms(vocab: list[str], pattern: str) -> list[str]:
    """Dictionary terms fully matching ``pattern`` (the ES regexp
    query is implicitly anchored — so is this).  Linear scan of the
    memory-resident dictionary; at scale the scan runs per shard actor
    over its own (smaller) term list, and the caller unions.  A
    malformed pattern raises ValueError (clean, driver-side) rather
    than leaking re.error from inside a query path."""
    import re
    try:
        rx = re.compile(pattern)
    except re.error as e:
        raise ValueError(f"bad regexp pattern {pattern!r}: {e}") from e
    return [t for t in vocab if rx.fullmatch(t)]


def build_deletion_index(vocab: list[str]) -> dict[str, list[str]]:
    """variant → vocabulary terms whose single-deletion neighborhood
    contains it.  Built lazily ONCE per snapshot on the first fuzzy
    query (a memory-for-latency trade); ~len(term) entries per
    term."""
    idx: dict[str, list[str]] = {}
    for t in vocab:
        for v in _deletions1(t):
            idx.setdefault(v, []).append(t)
    return idx


def fuzzy_terms(vocab: list[str], term: str, max_edits: int,
                del_index_fn=None) -> list[str]:
    """Dictionary terms within plain Levenshtein ``max_edits`` of
    ``term``.  With ``max_edits == 1`` and a deletion-index supplier,
    candidates come from the SymSpell deletion-neighborhood property
    (two strings within distance 1 share a string reachable by at
    most one deletion from each) and are then exactly verified —
    O(len) lookups instead of a vocabulary scan."""
    if max_edits == 1 and del_index_fn is not None:
        idx = del_index_fn()
        cand: set[str] = set()
        for v in _deletions1(term):
            cand.update(idx.get(v, ()))
        return sorted(t for t in cand if _levenshtein_le(term, t, 1))
    return [t for t in vocab if _levenshtein_le(term, t, max_edits)]


def _levenshtein_le(a: str, b: str, cap: int) -> bool:
    """True iff plain Levenshtein distance (unit insert/delete/
    substitute, NO transposition — DuckDB's levenshtein()) ≤ cap.
    Banded DP: O(len·cap) and early-exits when a row exceeds cap."""
    if abs(len(a) - len(b)) > cap:
        return False
    if a == b:
        return True
    lb = len(b)
    inf = cap + 1   # any cell > cap behaves identically; clamp there
    prev = [j if j <= cap else inf for j in range(lb + 1)]
    for i, ca in enumerate(a, start=1):
        # only cells with |i - j| <= cap can end <= cap: compute the
        # band, leave the rest at the clamp value
        lo, hi = max(1, i - cap), min(lb, i + cap)
        cur = [inf] * (lb + 1)
        if i <= cap:
            cur[0] = i
        best = cur[0]   # j=0 (deleting all of a[:i]) is a band cell
        for j in range(lo, hi + 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                         prev[j - 1] + (ca != b[j - 1]))
            best = min(best, cur[j])
        if best > cap:
            return False
        prev = cur
    return prev[-1] <= cap


def tokenizer_from_manifest(manifest: dict):
    """The index's OWN tokenizer, reconstructed from the manifest —
    the one rule for anything that re-analyzes text against a built
    index (more_like_this seed analysis, local and distributed)."""
    from mee_ray.config import config_from_manifest
    from mee_ray.tokenizer import Tokenizer
    return Tokenizer(config_from_manifest(manifest).tokenizer)


def _gather_accumulate(partials_list: list[dict], terms: list[str]):
    """The shared merge preamble: gather per-term partial vectors in
    SORTED-TERM order (the determinism contract — concatenation order
    IS the float addition order of np.add.at) and accumulate per-doc
    sums.  Returns (uniq_ids, inverse, acc_sums, all_scores), or None
    when no term has postings."""
    ids_l, sc_l = [], []
    for term in sorted(set(terms)):
        for partials in partials_list:
            got = partials.get(term)
            if got is not None:
                ids_l.append(got[0]); sc_l.append(got[1])
    if not ids_l:
        return None
    all_ids = np.concatenate(ids_l)
    all_sc = np.concatenate(sc_l)
    uniq, inv = np.unique(all_ids, return_inverse=True)
    acc = np.zeros(len(uniq), dtype=np.float64)
    np.add.at(acc, inv, all_sc)
    return uniq, inv, acc, all_sc


def _accumulate_with_dl(partials_list: list[dict], terms: list[str]):
    """:func:`_gather_accumulate` with per-doc document length: the
    partial vectors are ``(ids, scores, dls)`` triples and the result
    is ``(uniq_ids, acc_sums, distinct_match_counts, doc_dls)`` — or
    ``None`` when no term has postings.  Same sorted-term
    concatenation order (the bit-identity determinism contract), so
    the local and distributed terms_set / script_score paths produce
    float-identical scores."""
    ids_l, sc_l, dl_l = [], [], []
    for term in sorted(set(terms)):
        for partials in partials_list:
            got = partials.get(term)
            if got is not None:
                ids_l.append(got[0])
                sc_l.append(got[1])
                dl_l.append(got[2])
    if not ids_l:
        return None
    all_ids = np.concatenate(ids_l)
    all_sc = np.concatenate(sc_l)
    all_dl = np.concatenate(dl_l)
    uniq, inv = np.unique(all_ids, return_inverse=True)
    acc = np.zeros(len(uniq), dtype=np.float64)
    np.add.at(acc, inv, all_sc)
    cnt = np.zeros(len(uniq), dtype=np.int64)
    np.add.at(cnt, inv, 1)
    doc_dl = np.zeros(len(uniq), dtype=np.int64)
    doc_dl[inv] = all_dl   # dl identical for every entry of a doc
    return uniq, acc, cnt, doc_dl


def _terms_set_select(gathered, dl_threshold: int, low: int, high: int,
                      k: int) -> list[tuple[int, float]]:
    """Shared terms_set tail: apply the per-doc required-match-count
    threshold (docs shorter than ``dl_threshold`` need ``low``
    distinct terms, longer need ``high``) and select top-k.  Survivors
    keep their full disjunctive scores."""
    if gathered is None:
        return []
    uniq, acc, cnt, doc_dl = gathered
    required = np.where(doc_dl < dl_threshold, low, high)
    keep = cnt >= required
    uniq, acc = uniq[keep], acc[keep]
    if uniq.size == 0:
        return []
    ids, scores = top_k_select(uniq, acc, k)
    return list(zip(ids.tolist(), scores.tolist()))


def _script_rescore(gathered, fn, k: int) -> list[tuple[int, float]]:
    """Shared script_score tail: evaluate the compiled DSL expression
    ``fn`` vectorized over a columnar batch of ``_score`` (float64
    accumulated BM25) and ``dl`` (int64 token count), REPLACING the
    score, then select top-k."""
    if gathered is None:
        return []
    uniq, acc, _cnt, doc_dl = gathered
    import pyarrow as _pa
    batch = _pa.table({"_score": _pa.array(acc, _pa.float64()),
                       "dl": _pa.array(doc_dl, _pa.int64())})
    out = fn(batch)
    if isinstance(out, _pa.ChunkedArray):
        out = out.combine_chunks()
    if isinstance(out, _pa.Scalar):            # constant script
        rescored = np.full(len(uniq), out.as_py(), dtype=np.float64)
    else:
        rescored = np.asarray(out, dtype=np.float64)
    ids, scores = top_k_select(uniq, rescored, k)
    return list(zip(ids.tolist(), scores.tolist()))


def select_terms_tfidf(counts, n_docs: int, df_of, max_terms: int
                       ) -> list[str]:
    """Top-``max_terms`` terms of a token-count map by tf·idf against
    the live dictionary (terms with df=0 dropped; ties broken by term
    asc — the same ordering the SQL oracle's window uses).  Shared by
    the local and distributed more_like_this paths."""
    scored = []
    for t, tf in counts.items():
        df = df_of(t)
        if df > 0:
            scored.append((-(float(tf) * idf(df, n_docs)), t))
    scored.sort()
    return [t for _, t in scored[:max_terms]]


def merge_partials(partials_list: list[dict], terms: list[str], k: int,
                   exclude_sorted: np.ndarray | None = None,
                   min_match: int = 1,
                   after: tuple[int, float] | None = None
                   ) -> list[tuple[int, float]]:
    """Merge per-term partial score vectors (possibly from several
    shard actors) into the global top-k. Accumulation is per-doc in
    sorted-term order — the determinism contract.

    ``exclude_sorted`` (sorted int64 doc_ids) drops those docs AFTER
    accumulation and BEFORE top-k selection — the must_not branch of a
    boolean query: exclusion filters the result set, it never rescales
    the survivors' scores.

    ``min_match`` > 1 keeps only docs matching at least that many
    DISTINCT query terms (ES minimum_should_match) — survivors keep
    their full disjunctive scores (match-count filters, it never
    rescales).  The entry count per doc equals its distinct-term match
    count because each term is owned by exactly ONE shard and appears
    at most once per doc in that shard's partial vector.

    ``after`` = a (doc_id, score) cursor — the shape of a RESULT row,
    so the previous page's last tuple is passed verbatim: only docs
    STRICTLY after it in the (-score, doc_id) ranking order survive
    to the top-k (the search_after pagination filter).  Applied to
    exact accumulated scores, so a page boundary can never duplicate
    or drop a doc even inside an exact-score tie run."""
    gathered = _gather_accumulate(partials_list, terms)
    if gathered is None:
        return []
    uniq, inv, acc, all_sc = gathered
    if min_match > 1:
        cnt = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(cnt, inv, 1)
        keep = cnt >= min_match
        uniq, acc = uniq[keep], acc[keep]
        if uniq.size == 0:
            return []
    if after is not None:
        c_d, c_s = int(after[0]), float(after[1])
        keep = (acc < c_s) | ((acc == c_s) & (uniq > c_d))
        uniq, acc = uniq[keep], acc[keep]
        if uniq.size == 0:
            return []
    if exclude_sorted is not None and exclude_sorted.size and uniq.size:
        keep = ~isin_sorted(uniq, exclude_sorted)
        uniq, acc = uniq[keep], acc[keep]
        if uniq.size == 0:
            return []
    ids, scores = top_k_select(uniq, acc, k)
    return list(zip(ids.tolist(), scores.tolist()))


def phrase_match_docs(data: dict, terms: list[str]) -> np.ndarray:
    """Docs containing ``terms`` at consecutive positions, in order.

    ``data``: term → (doc_ids, per-doc offsets, flat positions).
    Candidates (docs holding every unique term) map to dense ranks;
    slot i contributes composite keys ``rank << 32 | (pos - i)`` and
    a hit is a key surviving intersection across all slots — fully
    vectorized (ranks, not raw doc_ids, because doc_ids are 63-bit
    hashes that cannot pack beside a position in 64 bits).  Keys are
    uint64 with explicit bound checks: ranks and positions each get
    32 bits, and exceeding either is an error, never silent key
    aliasing."""
    uterms = sorted(set(terms))
    empty = np.empty(0, dtype=np.int64)
    if not uterms:
        return empty
    cand = None
    for t in uterms:
        ids = data[t][0]
        if ids.size == 0:
            return empty
        cand = np.unique(ids) if cand is None else np.intersect1d(cand, ids)
        if cand.size == 0:
            return empty
    if cand.size >= (1 << 32):
        raise NotImplementedError(
            "phrase candidate set exceeds 2^32 docs — partition the "
            "candidate space before key packing")
    keys = None
    for i, t in enumerate(terms):
        ids, offs, flat = data[t]
        tfs = np.diff(offs)
        pos_c, keep = positions_in_sorted(ids, cand)
        rank_rep = np.repeat(pos_c[keep], tfs[keep])
        flat_k = flat[np.repeat(keep, tfs)]
        if flat_k.size and int(flat_k.max()) >= (1 << 32):
            raise ValueError("term position exceeds 2^32 — cannot pack "
                             "beside the candidate rank")
        ok = flat_k >= i              # a phrase cannot start before 0
        kk = ((rank_rep[ok].astype(np.uint64) << np.uint64(32))
              | (flat_k[ok] - i).astype(np.uint64))
        keys = kk if keys is None else np.intersect1d(keys, kk)
        if keys.size == 0:
            return empty
    return cand[np.unique(keys >> np.uint64(32)).astype(np.int64)]


def phrase_match_docs_lazy(fetch, terms: list[str], cand: np.ndarray,
                           order: list[str]) -> np.ndarray:
    """Rarest-term-first variant of :func:`phrase_match_docs` —
    identical result (slot-key intersection is commutative), but each
    unique term's positions are fetched on demand AGAINST THE
    SURVIVING candidate set, so hot terms (fetched last) skip the
    position decode for every chunk the rarer slots already emptied.

    ``fetch(term, alive_sorted)`` → (doc_ids, offsets, flat positions)
    restricted to ``alive_sorted``; ``cand`` is the sorted doc set
    holding every unique term (the rank base for key packing);
    ``order`` lists the unique slot terms, rarest first."""
    empty = np.empty(0, dtype=np.int64)
    if not terms:
        return empty
    if cand.size >= (1 << 32):
        raise NotImplementedError(
            "phrase candidate set exceeds 2^32 docs — partition the "
            "candidate space before key packing")
    slots: dict[str, list[int]] = {}
    for i, t in enumerate(terms):
        slots.setdefault(t, []).append(i)
    keys = None
    alive = cand
    for t in order:
        ids, offs, flat = fetch(t, alive)
        if ids.size == 0:
            return empty
        tfs = np.diff(offs)
        pos_c, keep = positions_in_sorted(ids, cand)
        rank_rep = np.repeat(pos_c[keep], tfs[keep])
        flat_k = flat[np.repeat(keep, tfs)]
        if flat_k.size and int(flat_k.max()) >= (1 << 32):
            raise ValueError("term position exceeds 2^32 — cannot pack "
                             "beside the candidate rank")
        for i in slots[t]:
            ok = flat_k >= i          # a phrase cannot start before 0
            kk = ((rank_rep[ok].astype(np.uint64) << np.uint64(32))
                  | (flat_k[ok] - i).astype(np.uint64))
            keys = kk if keys is None else np.intersect1d(keys, kk)
            if keys.size == 0:
                return empty
        alive = cand[np.unique(keys >> np.uint64(32)).astype(np.int64)]
    return alive


def merge_position_sets(parts: list[tuple]) -> tuple:
    """Union several terms' (doc_ids, offsets, flat positions) sets
    into ONE pseudo-slot for the phrase matcher — (doc, pos) pairs
    concatenated, lexsorted, rebuilt as run offsets.  Distinct terms
    occupy distinct positions within a doc, so no dedup is needed."""
    doc_parts, pos_parts = [], []
    for ids_e, offs_e, flat_e in parts:
        if ids_e.size:
            doc_parts.append(np.repeat(ids_e, np.diff(offs_e)))
            pos_parts.append(flat_e)
    if not doc_parts:
        return (np.empty(0, np.int64), np.zeros(1, np.int64),
                np.empty(0, np.int64))
    docs_all = np.concatenate(doc_parts)
    pos_all = np.concatenate(pos_parts)
    order = np.lexsort((pos_all, docs_all))
    docs_all, pos_all = docs_all[order], pos_all[order]
    uniq_docs, first = np.unique(docs_all, return_index=True)
    offs = np.concatenate((first, [len(docs_all)])).astype(np.int64)
    return uniq_docs, offs, pos_all


def span_not_match_docs(inc: tuple, exc: tuple, dist: int) -> np.ndarray:
    """Sorted doc_ids with ≥1 ``include`` occurrence having no
    ``exclude`` occurrence within ``dist`` positions.

    ``inc``/``exc``: (doc_ids, per-doc offsets, flat ascending
    positions) as returned by ``term_doc_positions``.  Docs absent
    from ``exc`` match outright.  For docs holding both terms, every
    include occurrence is checked against only its two nearest
    exclude positions (one searchsorted over composite
    ``rank·2³² + pos`` keys — positions are token indexes, far below
    2³²; runs are ascending so keys are globally sorted)."""
    inc_ids, inc_off, inc_pos = inc
    exc_ids, exc_off, exc_pos = exc
    if inc_ids.size == 0:
        return np.empty(0, dtype=np.int64)
    if exc_ids.size == 0:
        return np.sort(inc_ids)
    # doc runs are not globally id-sorted once delta chunks exist
    # (delta chunks concatenate after base chunks) — the searchsorted
    # mapping below needs sorted exclude ids, so permute its runs
    exc_ids, exc_off, exc_pos = _sort_runs(exc_ids, exc_off, exc_pos)
    p = np.minimum(np.searchsorted(exc_ids, inc_ids), exc_ids.size - 1)
    has_exc = exc_ids[p] == inc_ids
    out = [inc_ids[~has_exc]]
    shared = np.nonzero(has_exc)[0]
    if shared.size:
        B = np.int64(1) << np.int64(32)
        if inc_pos.size and int(inc_pos.max()) >= int(B):
            raise ValueError("token position exceeds 32-bit key budget")
        inc_cnt = (inc_off[shared + 1] - inc_off[shared])
        exc_run = p[shared]
        exc_cnt = (exc_off[exc_run + 1] - exc_off[exc_run])
        rank = np.arange(shared.size, dtype=np.int64)
        # gather the shared docs' position runs
        i_take = _runs_take(inc_off, shared)
        e_take = _runs_take(exc_off, exc_run)
        ik = np.repeat(rank, inc_cnt) * B + inc_pos[i_take]
        ek = np.repeat(rank, exc_cnt) * B + exc_pos[e_take]
        ins = np.searchsorted(ek, ik)
        veto = np.zeros(ik.size, dtype=bool)
        left_ok = ins > 0
        li = np.maximum(ins - 1, 0)
        veto |= left_ok & (ek[li] // B == ik // B) \
            & (ik - ek[li] <= dist)
        right_ok = ins < ek.size
        ri = np.minimum(ins, ek.size - 1)
        veto |= right_ok & (ek[ri] // B == ik // B) \
            & (ek[ri] - ik <= dist)
        # doc matches if ANY occurrence survives
        doc_of = np.repeat(np.arange(shared.size), inc_cnt)
        survive = np.zeros(shared.size, dtype=bool)
        np.logical_or.at(survive, doc_of, ~veto)
        out.append(inc_ids[shared[survive]])
    return np.sort(np.concatenate(out))


def _runs_take(offsets: np.ndarray, runs: np.ndarray) -> np.ndarray:
    """Flat indices selecting the given runs from an offsets-encoded
    ragged array (vectorized: one repeat + cumsum, no per-run loop)."""
    starts = offsets[runs]
    counts = offsets[runs + 1] - starts
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    first = np.repeat(starts, counts)
    bounds = np.concatenate(([0], np.cumsum(counts)[:-1])).astype(np.int64)
    within = np.arange(total, dtype=np.int64) - np.repeat(bounds, counts)
    return first + within


def _bigram_count_runs(a: tuple, b: tuple) -> int:
    """Adjacency count core shared by the local and distributed
    phrase suggesters: given two (doc_ids, offsets, flat ascending
    positions) triples, the number of (doc, p) with the first term at
    p and the second at p+1 — composite rank·2³²+pos key intersection
    per common doc, fully vectorized."""
    a = _sort_runs(*a)
    b = _sort_runs(*b)
    if not a[0].size or not b[0].size:
        return 0
    common, ia, ib = np.intersect1d(a[0], b[0], return_indices=True)
    if not common.size:
        return 0
    B = np.int64(1) << np.int64(32)
    rank = np.arange(common.size, dtype=np.int64)
    ta = _runs_take(a[1], ia)
    tb = _runs_take(b[1], ib)
    ca = a[1][ia + 1] - a[1][ia]
    cb = b[1][ib + 1] - b[1][ib]
    k1 = np.repeat(rank, ca) * B + (a[2][ta] + 1)
    k2 = np.repeat(rank, cb) * B + b[2][tb]
    return int(np.intersect1d(k1, k2).size)


def _lm_score_slots(slots: list[list[str]], uni: dict, bi: dict,
                    total: int, n: int, backoff: float
                    ) -> list[tuple[float, list[str]]]:
    """Stupid-backoff bigram LM scoring over candidate slots — ONE
    implementation shared by Searcher.suggest_phrase and
    DistributedSearcher.suggest_phrase so the two can never diverge
    (counts are integers, so equal inputs give bit-equal scores)."""
    import itertools
    import math

    scored = []
    for combo in itertools.product(*slots):
        sc = math.log(uni[combo[0]] / total)
        for w1, w2 in zip(combo, combo[1:]):
            cb = bi[(w1, w2)]
            if cb > 0:
                sc += math.log(cb / uni[w1])
            else:
                sc += math.log(backoff * uni[w2] / total)
        scored.append((round(sc, 10), list(combo)))
    scored.sort(key=lambda x: (-x[0], x[1]))
    return scored[:n]


def _sort_runs(ids: np.ndarray, off: np.ndarray, pos: np.ndarray):
    """Permute an offsets-encoded ragged array so its runs are in
    ascending doc_id order (no-op when already sorted)."""
    if ids.size <= 1 or bool(np.all(ids[:-1] <= ids[1:])):
        return ids, off, pos
    order = np.argsort(ids, kind="stable")
    take = _runs_take(off, order)
    counts = off[order + 1] - off[order]
    new_off = np.concatenate(
        ([0], np.cumsum(counts))).astype(np.int64)
    return ids[order], new_off, pos[take]


def span_near_match_docs(data: dict, terms: list[str], slop: int
                         ) -> np.ndarray:
    """Docs matching an ORDERED proximity query (the Lucene/ES
    ``span_near`` with ``in_order=true`` shape; reference delegates
    proximity to ES): ``terms`` occur left-to-right with at most
    ``slop`` intervening tokens between each CONSECUTIVE pair —
    ``slop=0`` is exactly the phrase predicate.

    Same uint64 ``rank << 32 | pos`` key packing as
    :func:`phrase_match_docs`; instead of aligning every slot to one
    shared anchor, the REACHABLE-position set is propagated left to
    right: step i expands each reachable position by gaps
    ``1..slop+1`` and intersects with term i's keys, so work is
    O((slop+1) · positions-in-candidates) and fully vectorized — no
    per-doc loop."""
    if slop < 0:
        raise ValueError(f"slop must be >= 0, got {slop}")
    empty = np.empty(0, dtype=np.int64)
    uterms = sorted(set(terms))
    if not uterms:
        return empty
    cand = None
    for t in uterms:
        ids = data[t][0]
        if ids.size == 0:
            return empty
        cand = np.unique(ids) if cand is None else np.intersect1d(cand, ids)
        if cand.size == 0:
            return empty
    if cand.size >= (1 << 32):
        raise NotImplementedError(
            "span_near candidate set exceeds 2^32 docs — partition "
            "the candidate space before key packing")

    gaps = np.arange(1, slop + 2, dtype=np.uint64)
    reach: np.ndarray | None = None
    for i, t in enumerate(terms):
        keys = _packed_slot_keys(data, t, cand, slop)
        if i == 0:
            reach = np.unique(keys)
        else:
            expanded = (reach[:, None] + gaps).ravel()
            reach = np.intersect1d(expanded, keys)
        if reach.size == 0:
            return empty
    return cand[np.unique(reach >> np.uint64(32)).astype(np.int64)]


def _packed_slot_keys(data: dict, t: str, cand: np.ndarray, slop: int
                      ) -> np.ndarray:
    """One term's occurrences in the candidate docs as packed
    ``rank << 32 | pos`` uint64 keys — the shared packing of the
    positional kernels (rank = index into sorted ``cand``)."""
    ids, offs, flat = data[t]
    tfs = np.diff(offs)
    pos_c, keep = positions_in_sorted(ids, cand)
    rank_rep = np.repeat(pos_c[keep], tfs[keep])
    flat_k = flat[np.repeat(keep, tfs)]
    if flat_k.size and int(flat_k.max()) + slop + 1 >= (1 << 32):
        raise ValueError("term position + slop exceeds 2^32 — cannot "
                         "pack beside the candidate rank")
    return ((rank_rep.astype(np.uint64) << np.uint64(32))
            | flat_k.astype(np.uint64))


_POS_MASK = np.uint64((1 << 32) - 1)


def span_near_spans(data: dict, terms: list[str], slop: int,
                    cand: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Every matching span_near chain END over the candidate docs,
    with its EARLIEST feasible chain start: ``(end_keys, min_starts)``
    — end_keys sorted packed ``rank << 32 | end_pos`` uint64, and
    min_starts the parallel uint64 start positions.  The widest span
    per end covers every narrower span ending there, so containment
    tests need only these.  Same left-to-right reachable-set
    propagation as :func:`span_near_match_docs`, carrying a parallel
    min-start value: duplicate expanded keys collapse to their
    minimum start (lexsort + first-occurrence), fully vectorized."""
    if slop < 0:
        raise ValueError(f"slop must be >= 0, got {slop}")
    empty = (np.empty(0, np.uint64), np.empty(0, np.uint64))
    if cand.size >= (1 << 32):
        raise NotImplementedError(
            "span candidate set exceeds 2^32 docs — partition the "
            "candidate space before key packing")
    gaps = np.arange(1, slop + 2, dtype=np.uint64)
    reach: np.ndarray | None = None
    start: np.ndarray | None = None
    for i, t in enumerate(terms):
        keys = _packed_slot_keys(data, t, cand, slop)
        if i == 0:
            reach = np.unique(keys)
            start = reach & _POS_MASK
        else:
            expanded = (reach[:, None] + gaps).ravel()
            exp_start = np.repeat(start, gaps.size)
            order = np.lexsort((exp_start, expanded))
            expanded, exp_start = expanded[order], exp_start[order]
            first = np.ones(len(expanded), dtype=bool)
            first[1:] = expanded[1:] != expanded[:-1]
            expanded, exp_start = expanded[first], exp_start[first]
            sel = isin_sorted(expanded, np.unique(keys))
            reach, start = expanded[sel], exp_start[sel]
        if reach.size == 0:
            return empty
    return reach, start


def span_containing_match_docs(data: dict, big_terms: list[str],
                               slop: int, little: str) -> np.ndarray:
    """Sorted doc_ids where some ``span_near(big_terms, slop)`` span
    contains an occurrence of ``little`` (ES ``span_containing``:
    little within [span start, span end], boundary positions
    inclusive — an overlapping occurrence counts, matching Lucene's
    span-overlap containment).

    Per candidate rank the spans ending at ``e`` are summarized by
    the widest one ``[min_start(e), e]`` (it contains every narrower
    span's positions), so ``little`` at ``p`` is contained iff some
    end ``e ≥ p`` in the same doc has ``min_start(e) ≤ p``.  One
    reversed ``minimum.accumulate`` over packed ``rank << 32 |
    min_start`` gives the suffix minimum (later docs' rank bits
    dominate, so the minimum never leaks across docs), and one
    searchsorted per little occurrence answers the exists-test."""
    empty = np.empty(0, dtype=np.int64)
    uterms = sorted(set(big_terms) | {little})
    cand = None
    for t in uterms:
        ids = data[t][0]
        if ids.size == 0:
            return empty
        cand = (np.unique(ids) if cand is None
                else np.intersect1d(cand, ids))
        if cand.size == 0:
            return empty
    ends, starts = span_near_spans(data, big_terms, slop, cand)
    if ends.size == 0:
        return empty
    little_keys = np.unique(_packed_slot_keys(data, little, cand, 0))
    if little_keys.size == 0:
        return empty
    packed_starts = (ends & ~_POS_MASK) | starts
    suffmin = np.minimum.accumulate(packed_starts[::-1])[::-1]
    idx = np.searchsorted(ends, little_keys, side="left")
    ok = idx < len(ends)
    lk, sm = little_keys[ok], suffmin[idx[ok]]
    contained = ((sm >> np.uint64(32)) == (lk >> np.uint64(32))) \
        & ((sm & _POS_MASK) <= (lk & _POS_MASK))
    if not contained.any():
        return empty
    ranks = np.unique(lk[contained] >> np.uint64(32)).astype(np.int64)
    return cand[ranks]


def intervals_match_docs(data: dict, terms: list[str], max_gaps: int,
                         ordered: bool) -> np.ndarray:
    """Docs matching an ES ``intervals`` match rule (reference
    delegates interval queries to ES) over DISTINCT ``terms``: one
    occurrence of every term inside a window whose TOTAL gap count
    (window width minus ``len(terms)``) is at most ``max_gaps``;
    ``ordered=True`` additionally requires the occurrences
    left-to-right in query order.  Unlike :func:`span_near_match_docs`
    the gap budget is shared across the whole interval, not spent per
    consecutive pair.

    Fully vectorized, same ``rank << 32 | pos`` packing as the other
    positional kernels:

    * ordered — left-to-right propagation of the LATEST feasible chain
      start: slot i's occurrence at key ``k`` inherits
      ``max(best_start)`` over slot i-1 occurrences strictly before
      ``k`` in the same doc.  One searchsorted plus one
      ``maximum.accumulate`` over composite ``rank<<32 | best`` values
      per step — the accumulate never leaks across docs because a
      later doc's rank bits dominate any earlier best.  A doc matches
      when some last-slot occurrence ``p`` has
      ``p - best_start(p) <= len(terms)-1 + max_gaps``.
    * unordered — every occurrence is a candidate window END; each
      term's latest occurrence ``<=`` that end in the same doc
      (searchsorted ``side='right'``) yields the minimal covering
      window, which matches when
      ``end - min(latest_occ) <= len(terms)-1 + max_gaps``.
    """
    if max_gaps < 0:
        raise ValueError(f"max_gaps must be >= 0, got {max_gaps}")
    empty = np.empty(0, dtype=np.int64)
    if not terms:
        return empty
    if len(set(terms)) != len(terms):
        raise ValueError("intervals terms must be distinct")
    cand = None
    for t in terms:
        ids = data[t][0]
        if ids.size == 0:
            return empty
        cand = np.unique(ids) if cand is None else np.intersect1d(cand, ids)
        if cand.size == 0:
            return empty
    if cand.size >= (1 << 32):
        raise NotImplementedError(
            "intervals candidate set exceeds 2^32 docs — partition "
            "the candidate space before key packing")

    def slot_keys(t: str) -> np.ndarray:
        ids, offs, flat = data[t]
        tfs = np.diff(offs)
        pos_c, keep = positions_in_sorted(ids, cand)
        rank_rep = np.repeat(pos_c[keep], tfs[keep])
        flat_k = flat[np.repeat(keep, tfs)]
        if flat_k.size and int(flat_k.max()) >= (1 << 32):
            raise ValueError("term position exceeds 2^32 — cannot "
                             "pack beside the candidate rank")
        # globally sorted keys: the searchsorteds below need them
        return np.sort((rank_rep.astype(np.uint64) << np.uint64(32))
                       | flat_k.astype(np.uint64))

    RANK = np.uint64(32)
    POSMASK = np.uint64(0xFFFFFFFF)
    bound = np.uint64(len(terms) - 1 + max_gaps)
    keys = [slot_keys(t) for t in terms]
    if ordered:
        prev = keys[0]
        best = prev & POSMASK        # slot 0: the chain starts here
        for ki in keys[1:]:
            runmax = np.maximum.accumulate((prev & ~POSMASK) | best)
            # distinct terms never share a (doc, pos), so the default
            # side='left' minus one is exactly "last prev key < ki"
            ins = np.searchsorted(prev, ki)
            ok = ins > 0
            ins = np.maximum(ins - 1, 0)
            ok &= (runmax[ins] >> RANK) == (ki >> RANK)
            ki = ki[ok]
            if ki.size == 0:
                return empty
            best = runmax[ins[ok]] & POSMASK
            prev = ki
        hit = (prev & POSMASK) - best <= bound
        ranks = np.unique(prev[hit] >> RANK).astype(np.int64)
        return cand[ranks]
    ends = np.sort(np.concatenate(keys))
    okall = np.ones(ends.size, dtype=bool)
    start: np.ndarray | None = None
    for ki in keys:
        p = np.searchsorted(ki, ends, side="right")
        ok = p > 0
        idx = np.maximum(p - 1, 0)
        ok &= (ki[idx] >> RANK) == (ends >> RANK)
        okall &= ok
        last = ki[idx] & POSMASK
        start = last if start is None else np.minimum(start, last)
    # masked-out rows may wrap the uint64 subtraction — they are
    # already excluded by okall, the wrap only makes them huge
    hit = okall & ((ends & POSMASK) - start <= bound)
    ranks = np.unique(ends[hit] >> RANK).astype(np.int64)
    return cand[ranks]


def merge_partials_conjunctive(partials_list: list[dict],
                               terms: list[str], k: int
                               ) -> list[tuple[int, float]]:
    """Conjunctive merge: keep only docs present in EVERY term's
    partial vector, then accumulate per-doc in sorted-term order (the
    determinism contract — same float addition order as the oracle's
    ``search_and``).  A term with no live postings anywhere empties
    the result."""
    uterms = sorted(set(terms))
    if not uterms:
        return []
    per_term: dict[str, tuple[np.ndarray, np.ndarray]] = {}
    for term in uterms:
        ids_l, sc_l = [], []
        for partials in partials_list:
            got = partials.get(term)
            if got is not None:
                ids_l.append(got[0]); sc_l.append(got[1])
        if not ids_l:
            return []
        per_term[term] = (np.concatenate(ids_l), np.concatenate(sc_l))
    common = None
    for term in uterms:
        ids = per_term[term][0]
        common = (np.unique(ids) if common is None
                  else np.intersect1d(common, ids))
        if common.size == 0:
            return []
    acc = np.zeros(common.size, dtype=np.float64)
    for term in uterms:
        ids, sc = per_term[term]
        order = np.argsort(ids, kind="stable")
        ids_s, sc_s = ids[order], sc[order]
        acc += sc_s[np.searchsorted(ids_s, common)]
    ids, scores = top_k_select(common, acc, k)
    return list(zip(ids.tolist(), scores.tolist()))


def merge_partials_dismax(partials_list: list[dict], terms: list[str],
                          k: int, tie_breaker: float = 0.0
                          ) -> list[tuple[int, float]]:
    """Dis-max merge (ES ``dis_max`` over per-term queries): a doc's
    score is its BEST single-term contribution plus ``tie_breaker`` ×
    the sum of its remaining contributions —
    ``max + tb·(sum − max)`` with the sum accumulated in sorted-term
    order (the shared determinism contract; tb=0 is pure best-field,
    tb=1 matches the disjunctive sum up to one float rounding —
    ``(sum−max)+max`` need not equal ``sum`` bit-for-bit)."""
    gathered = _gather_accumulate(partials_list, terms)
    if gathered is None:
        return []
    uniq, inv, acc, all_sc = gathered
    amax = np.full(len(uniq), -np.inf, dtype=np.float64)
    np.maximum.at(amax, inv, all_sc)
    score = amax + tie_breaker * (acc - amax)
    ids, scores = top_k_select(uniq, score, k)
    return list(zip(ids.tolist(), scores.tolist()))


class FederatedSearcher:
    """Cross-index search with GLOBAL statistics — the ES
    cross-cluster-search + ``dfs_query_then_fetch`` analog.  Phase 1
    (dfs): per-term df and corpus (n_docs, total_tokens) gathered from
    every sub-index; phase 2: each sub-index's postings are scored
    with the GLOBAL idf/avgdl and merged into one top-k.

    Invariant (tested bit-exact): federating disjoint sub-indexes
    equals searching their union index — global df/n_docs/total_tokens
    are the same integers the union would compute, tf_norm is
    per-posting, and the sorted-term accumulation order is shared with
    :func:`merge_partials`.  BM25/tokenizer params must agree across
    sub-indexes (validated eagerly)."""

    def __init__(self, roots: list[str]):
        import os
        if not roots:
            raise ValueError("FederatedSearcher needs >= 1 index root")
        real = [os.path.realpath(r) for r in roots]
        if len(set(real)) != len(real):
            # a duplicated root would double n_docs and every matched
            # doc's contribution — silently wrong scores; fail loudly.
            # (Overlapping doc_ids across DISTINCT roots surface both
            # copies, like ES cross-cluster search.)
            raise ValueError(f"duplicate index roots in {roots}")
        self.subs = [Searcher(r) for r in roots]
        m0 = self.subs[0].manifest
        for s in self.subs[1:]:
            for key in ("bm25", "tokenizer"):
                if s.manifest.get(key) != m0.get(key):
                    raise ValueError(
                        f"sub-index {s.index_root} disagrees on {key!r}"
                        " — federated scores would be meaningless")
        totals = [mf.live_totals(s.manifest) for s in self.subs]
        self.n_docs = sum(n for n, _ in totals)
        total_tokens = sum(t for _, t in totals)
        self.avgdl = (total_tokens / self.n_docs) if self.n_docs else 0.0
        self.k1 = m0["bm25"]["k1"]
        self.b = m0["bm25"]["b"]

    def _per_sub_partials(self, uterms: list[str]) -> list[dict]:
        """One partials dict PER SUB-INDEX — term → (doc_ids,
        contributions at GLOBAL stats: df summed across subs, shared
        n_docs/avgdl).  Raw (ids, tf, dl) stay inside each sub-index
        accessor; only per-term score vectors surface — the same
        partials shape every merge_* consumer takes.  Kept per-sub
        (never concatenated across subs) so a doc_id indexed in two
        sub-indexes scores as two separate copies, one per sub —
        concatenating would np.unique-fold them into a single
        double-counted score."""
        raw = [{} for _ in self.subs]
        df_g: dict[str, int] = {t: 0 for t in uterms}
        for si, s in enumerate(self.subs):
            for term in uterms:
                ids, tfs, dls = s.term_raw_postings(term)
                if len(ids):
                    raw[si][term] = (ids, tfs, dls)
                    df_g[term] += len(ids)
        out = [{} for _ in self.subs]
        for si, sub_raw in enumerate(raw):
            for term, (ids, tfs, dls) in sub_raw.items():
                w = idf(df_g[term], self.n_docs)
                out[si][term] = (
                    ids, w * tf_norm(tfs, dls, self.avgdl,
                                     self.k1, self.b))
        return out

    def search(self, terms: list[str], k: int = 10,
               operator: str = "or") -> list[tuple[int, float]]:
        """Global top-k across the sub-indexes.  Each sub-index's
        matches are accumulated WITHIN that sub (global idf/avgdl,
        sorted-term order), then the per-sub top-k lists merge by
        (-score, doc_id, sub ordinal): a doc indexed in two subs
        surfaces once per sub, like ES cross-cluster hits — and a
        conjunction holds only when a single copy matches every term.
        For disjoint subs this is bit-identical to the union index
        (same float additions in the same order, same tie-breaks)."""
        if k <= 0 or not terms:
            return []
        uterms = sorted(set(terms))
        merge = (merge_partials_conjunctive if operator == "and"
                 else merge_partials)
        hits: list[tuple[float, int, int]] = []
        for si, partials in enumerate(self._per_sub_partials(uterms)):
            hits.extend((sc, did, si)
                        for did, sc in merge([partials], uterms, k))
        hits.sort(key=lambda h: (-h[0], h[1], h[2]))
        return [(did, sc) for sc, did, _ in hits[:k]]

    def count(self, terms: list[str], operator: str = "or") -> int:
        """Federated match count: the sum of per-sub hit counts (a doc
        indexed in two subs is two hits, matching ``search``); a
        conjunction is evaluated within each sub — a copy in A matching
        only t1 plus a copy in B matching only t2 is NOT an AND hit."""
        uterms = sorted(set(terms))
        if not uterms:
            return 0
        total = 0
        for s in self.subs:
            sets = []
            for term in uterms:
                ids = s.term_raw_postings(term)[0]
                if operator == "and" and ids.size == 0:
                    sets = []
                    break
                sets.append(ids)
            if not sets:
                continue
            if operator == "and":
                cand = sets[0]
                for x in sets[1:]:
                    cand = np.intersect1d(cand, x)
                    if cand.size == 0:
                        break
                total += int(cand.size)
            else:
                total += int(np.unique(np.concatenate(sets)).size)
        return total


class CachedSearcher:
    """ES request-cache analog (ST-family): whole-query results
    memoized per index GENERATION.  A :class:`Searcher` is an
    immutable snapshot, so entries never go stale within one; the
    cache re-resolves the root's generation per lookup — the epoch
    name PLUS the manifest file's (mtime_ns, size) fingerprint,
    because ``apply_delta`` appends a delta record to the SAME epoch's
    manifest (atomic tmp+rename, so the fingerprint always moves).
    Any publish/delta/compact therefore changes the generation, which
    drops every cached entry — the ES refresh-invalidation semantic.
    LRU-bounded; hits return a fresh list so callers can't mutate the
    cache.  Thread-safe: _resolve and the LRU mutate shared state
    under one lock, so a long-lived instance may be shared across
    reader threads (writers — delta/compact — still coordinate via
    the index flock, not through this cache)."""

    def __init__(self, index_root: str, capacity: int = 1024):
        import threading
        from collections import OrderedDict
        self.index_root = index_root
        self.capacity = int(capacity)
        self._lock = threading.Lock()
        self._gen: tuple | None = None
        self._searcher: Searcher | None = None
        self._entries: "OrderedDict[tuple, list]" = OrderedDict()
        self.hits = 0
        self.misses = 0
        self.invalidations = 0

    def _resolve(self) -> Searcher:
        """Searcher for the CURRENT on-disk generation.  Lock scope is
        minimal (review finding r4#6): the epoch read + manifest stat
        run OUTSIDE the lock, a hit-path request takes the lock only
        for the generation compare, and the (milliseconds-long)
        Searcher load of a generation swap also runs outside it with
        a double-checked install — readers never queue behind a load.
        If two threads race a swap the loser may briefly re-install
        the older snapshot; both are legitimate published generations
        and the next request self-heals (the threaded test pins
        results to the set of legitimate generations)."""
        import os as _os
        for attempt in range(3):
            ep = mf.current_epoch(self.index_root)
            if ep is None:
                raise FileNotFoundError(
                    f"no CURRENT epoch in {self.index_root}")
            try:
                st = _os.stat(mf.manifest_path(self.index_root, ep))
                gen = (ep, st.st_mtime_ns, st.st_size)
                with self._lock:
                    if gen == self._gen:
                        return self._searcher
                # the Searcher load itself must sit INSIDE the
                # retry: the same compact+gc race can delete the
                # old epoch's files between the stat and the open
                searcher = Searcher(self.index_root, ep)
                with self._lock:
                    if gen != self._gen:
                        if self._gen is not None:
                            self.invalidations += 1
                        self._gen = gen
                        self._searcher = searcher
                        self._entries.clear()
                    return self._searcher
            except FileNotFoundError:
                # CURRENT moved and the old epoch was gc'ed between
                # the reads (compact + gc_epochs race) — re-resolve
                if attempt == 2:
                    raise
        raise AssertionError("unreachable")

    def _cached(self, method: str, key_args: tuple, call):
        key = (method,) + key_args
        s = self._resolve()
        with self._lock:
            if self._searcher is s:
                got = self._entries.get(key)
                if got is not None:
                    self._entries.move_to_end(key)
                    self.hits += 1
                    return list(got)
        # the search itself runs OUTSIDE the lock (reads immutable
        # Searcher state); s is pinned by the local reference even if
        # a concurrent generation swap replaces self._searcher
        val = call(s)
        with self._lock:
            if self._searcher is s:       # drop results of a dead gen
                self._entries[key] = list(val)
                if len(self._entries) > self.capacity:
                    self._entries.popitem(last=False)
            self.misses += 1
        return list(val)

    def search(self, terms: list[str], k: int = 10, **kw):
        return self._cached(
            "search", (tuple(terms), k, tuple(sorted(kw.items()))),
            lambda s: s.search(list(terms), k=k, **kw))

    def search_phrase(self, terms: list[str], k: int = 10):
        return self._cached(
            "search_phrase", (tuple(terms), k),
            lambda s: s.search_phrase(list(terms), k=k))

    def search_min_match(self, terms: list[str], k: int,
                         min_match: int):
        return self._cached(
            "search_min_match", (tuple(terms), k, min_match),
            lambda s: s.search_min_match(list(terms), k, min_match))

    def msearch(self, queries: list[list[str]], k: int = 10):
        return [self.search(q, k=k) for q in queries]

    def stats(self) -> dict:
        return {"hits": self.hits, "misses": self.misses,
                "invalidations": self.invalidations,
                "entries": len(self._entries)}


class DistributedSearcher:
    """Actor-pool query path: `n_actors` shard actors, shards assigned
    round-robin; queries fan out only to actors owning a needed shard,
    and the driver performs the global merge + top-k."""

    def __init__(self, index_root: str, epoch: str | None = None,
                 n_actors: int = 4):
        import ray

        self.index_root = index_root
        self.n_actors_requested = n_actors
        self.manifest = mf.load_manifest(index_root, epoch)
        self.num_shards = self.manifest["num_shards"]
        self.n_docs, _ = mf.live_stats(self.manifest)
        self._tok = None  # driver-side tokenizer for mlt seed text
        self._vocab: list[str] | None = None
        self._del_index: dict[str, list[str]] | None = None
        # never request more 1-CPU actors than the cluster can schedule
        # — an unsatisfiable pool blocks warm() forever
        cluster_cpus = int(ray.cluster_resources().get("CPU", n_actors))
        n_actors = max(1, min(n_actors, self.num_shards, cluster_cpus - 1 or 1))

        # max_restarts/max_task_retries: a shard actor that dies
        # (OOM-killed worker, preempted node) is rebuilt by Ray from
        # its constructor args — index_root + the PINNED epoch — and
        # the in-flight read-only method call is retried on the
        # restarted actor.  State is a pure function of the manifest,
        # so a post-crash answer is bit-identical to the pre-crash one
        # (tests/test_scheduler.py::test_shard_actor_failover);
        # the restarted actor is merely cold (warm() runs only at pool
        # construction).
        @ray.remote(num_cpus=1, max_restarts=4, max_task_retries=4)
        class ShardActor:
            def __init__(self, index_root, epoch, shards):
                self.searcher = Searcher(index_root, epoch, shard_subset=shards)

            def warm(self, shards):
                # dictionary + row-group prefetch: queries right after
                # pool construction run at warm latency (bench.py
                # measured 300–400 ms cold first-touches without this).
                # The pa.array() poke triggers pyarrow's LAZY pandas-
                # compat init — constructing any Array/Scalar imports
                # pandas the first time (~300 ms in a fresh worker),
                # which otherwise lands on the first real query.
                import pyarrow as _pa
                _pa.array([0])
                for s in shards:
                    self.searcher._shard(s).prefetch()
                return True

            def term_partials(self, terms):
                return self.searcher.term_partials(terms)

            def term_partials_dl(self, terms):
                return self.searcher.term_partials_dl(terms)

            def term_partials_for_docs(self, terms, doc_ids_sorted):
                return self.searcher.term_partials_for_docs(
                    terms, doc_ids_sorted)

            def term_doc_ids(self, terms):
                return {t: np.unique(self.searcher._live_postings(
                    term_hash(t) % self.searcher.num_shards, t)[0])
                        for t in terms}

            def term_dfs(self, terms):
                # dictionary-only live dfs (mlt term selection)
                return {t: self.searcher.term_df(t) for t in terms}

            def vocab(self):
                # owned shards' sorted term union (prefix/fuzzy)
                return self.searcher.vocabulary()

            def term_doc_positions(self, terms, candidates=None):
                return {t: self.searcher.term_doc_positions(t, candidates)
                        for t in terms}

            def search_phrase(self, terms, k):
                return self.searcher.search_phrase(terms, k)

            def search_span_near(self, terms, slop, k):
                return self.searcher.search_span_near(terms, slop, k)

            def search_intervals(self, terms, max_gaps, ordered, k):
                return self.searcher.search_intervals(
                    terms, max_gaps, ordered, k)

            def search_span_first(self, term, end, k):
                return self.searcher.search_span_first(term, end, k)

            def search_span_containing(self, big_terms, slop, little,
                                       k):
                return self.searcher.search_span_containing(
                    big_terms, slop, little, k)

            def search_span_within(self, little, big_terms, slop, k):
                return self.searcher.search_span_within(
                    little, big_terms, slop, k)

            def search_span_or_near(self, slots, slop, k):
                return self.searcher.search_span_or_near(slots, slop,
                                                          k)

            def search_span_not(self, include, exclude, dist, k):
                return self.searcher.search_span_not(include, exclude,
                                                     dist, k)

            def explain(self, terms, doc_id):
                return self.searcher.explain(terms, doc_id)

            def term_total_tfs(self, terms):
                return {t: self.searcher.term_total_tf(t)
                        for t in terms}

            def local_topm(self, terms, m):
                """(exact local top-m partial ranking, bound): the
                m-th best partial bounds every unreturned doc's
                contribution from this actor — phase 1+2 of the
                three-phase protocol."""
                ranked = self.searcher.search(terms, m)
                tau = ranked[m - 1][1] if len(ranked) >= m else 0.0
                return ranked, tau

            def search(self, terms, k, operator="or"):
                # complete top-k when every query shard lives here —
                # takes the block-max WAND path when it is exact
                return self.searcher.search(terms, k, operator=operator)

            def stats(self):
                return self.searcher.query_stats.as_dict()

        self.assign: dict[int, int] = {s: s % n_actors for s in range(self.num_shards)}
        shards_of = defaultdict(list)
        for s, a in self.assign.items():
            shards_of[a].append(s)
        self.actors = [ShardActor.remote(index_root, self.manifest["epoch"],
                                         shards_of[a]) for a in range(n_actors)]
        import ray as _ray
        _ray.get([self.actors[a].warm.remote(shards_of[a]) for a in range(n_actors)])

    def search(self, terms: list[str], k: int = 10,
               mode: str = "partials",
               operator: str = "or") -> list[tuple[int, float]]:
        """Exact top-k.  ``mode``:

        - "partials": one round — every actor ships its full per-term
          partial score vectors (unique docs × 12 B per term).  Best
          while posting lists are modest; the r1 default.
        - "threephase": bound collection → thresholded local top-m →
          per-candidate partial fetch.  Two+ rounds, but the transfer
          is O(m + |candidates| × terms) instead of O(df) — the
          documented upgrade for multi-million-doc posting lists.

        Both modes return doc_ids AND float64 scores identical to the
        oracle (candidate scores are re-accumulated from per-term
        contribution vectors in sorted-term order)."""
        import ray
        uterms = sorted(set(terms))
        by_actor = self._terms_by_actor(uterms)
        if len(by_actor) == 1:
            # single-actor query: the actor owns every needed shard, so
            # its local (WAND-pruned) top-k IS the global answer
            (a,) = by_actor
            return ray.get(self.actors[a].search.remote(uterms, k,
                                                        operator))
        if operator == "and":
            # two rounds: doc-id sets first (cheap), then per-term
            # partials restricted to the intersection — transfer is
            # bounded by the rarest term's df, not the hottest's.
            # A bound protocol cannot prune soundly across
            # term-partitioned shards, but conjunction doesn't need
            # one: the intersection IS the exact result set.
            id_futs = [self.actors[a].term_doc_ids.remote(ts)
                       for a, ts in by_actor.items()]
            id_sets: dict = {}
            for d in ray.get(id_futs):
                id_sets.update(d)
            cand = None
            for t in uterms:
                ids = id_sets.get(t)
                if ids is None or ids.size == 0:
                    return []
                cand = ids if cand is None else np.intersect1d(cand, ids)
                if cand.size == 0:
                    return []
            pfuts = [self.actors[a].term_partials_for_docs.remote(ts, cand)
                     for a, ts in by_actor.items()]
            return merge_partials_conjunctive(ray.get(pfuts), uterms, k)
        if mode == "threephase":
            return self._search_three_phase(by_actor, uterms, k)
        futs = [self.actors[a].term_partials.remote(ts) for a, ts in by_actor.items()]
        return merge_partials(ray.get(futs), uterms, k)

    def msearch(self, queries: list[list[str]], k: int = 10
                ) -> list[list[tuple[int, float]]]:
        """Multi-search (the ES ``_msearch`` bulk API): ONE partials
        fan-out round for the UNION of every query's terms (each term
        shipped once even when shared by several queries), then one
        driver-side merge per query.  Results are exactly
        ``[search(q, k) for q in queries]`` — same scores, same
        tie-breaks — at a fraction of the actor round-trips."""
        import ray
        if not queries:
            return []
        union = sorted({t for q in queries for t in q})
        if k <= 0 or not union:
            return [[] for _ in queries]
        by_actor = self._terms_by_actor(union)
        parts = ray.get([self.actors[a].term_partials.remote(ts)
                         for a, ts in by_actor.items()])
        return [merge_partials(parts, sorted(set(q)), k) if q else []
                for q in queries]

    def search_boolean(self, must: list[str], must_not: list[str],
                       k: int = 10) -> list[tuple[int, float]]:
        """Distributed boolean must/must_not (see
        :meth:`Searcher.search_boolean` for semantics).  One fan-out
        round: owning actors ship per-term partials for ``must`` and
        live doc-id sets for ``must_not`` (the id sets are bounded by
        the excluded terms' df — rare exclusion terms cost almost
        nothing); the driver merges, drops excluded docs, and selects
        the top-k."""
        import ray
        if k <= 0 or not must:
            return []
        uterms = sorted(set(must))
        nterms = sorted(set(must_not))
        by_actor = self._terms_by_actor(uterms)
        n_by_actor = self._terms_by_actor(nterms)
        futs = [self.actors[a].term_partials.remote(ts)
                for a, ts in by_actor.items()]
        nfuts = [self.actors[a].term_doc_ids.remote(ts)
                 for a, ts in n_by_actor.items()]
        parts = ray.get(futs)
        excl_sets = [ids for d in ray.get(nfuts) for ids in d.values()
                     if ids.size]
        excl = (np.unique(np.concatenate(excl_sets)) if excl_sets
                else np.empty(0, dtype=np.int64))
        return merge_partials(parts, uterms, k, exclude_sorted=excl)

    def _terms_by_actor(self, uterms: list[str]) -> dict[int, list[str]]:
        """Group terms by their single owning actor (shard hash →
        round-robin actor assignment) — THE routing rule, in one
        place."""
        by_actor: dict[int, list[str]] = defaultdict(list)
        for t in uterms:
            by_actor[self.assign[term_hash(t) % self.num_shards]].append(t)
        return by_actor

    def _fanout_partials(self, uterms: list[str]) -> list[dict]:
        """One round: each owning actor ships its per-term partial
        score vectors (the `mode=\"partials\"` transport)."""
        import ray
        futs = [self.actors[a].term_partials.remote(ts)
                for a, ts in self._terms_by_actor(uterms).items()]
        return ray.get(futs)

    def _fanout_partials_dl(self, uterms: list[str]) -> list[dict]:
        """One round: per-term ``(ids, scores, dls)`` triples from each
        owning actor — the per-doc-dl transport (terms_set,
        script_score).  Same transfer bound as
        :meth:`_fanout_partials` plus one int64 per posting."""
        import ray
        futs = [self.actors[a].term_partials_dl.remote(ts)
                for a, ts in self._terms_by_actor(uterms).items()]
        return ray.get(futs)

    def search_terms_set(self, terms: list[str], k: int,
                         dl_threshold: int, low: int = 1, high: int = 2
                         ) -> list[tuple[int, float]]:
        """Distributed ``terms_set`` (see
        :meth:`Searcher.search_terms_set`): one partials-with-dl
        fan-out; the per-doc required-count threshold is applied in
        the driver merge.  Bit-identical to the local path
        (sorted-term accumulation via :func:`_accumulate_with_dl`)."""
        if k <= 0 or not terms:
            return []
        uterms = sorted(set(terms))
        gathered = _accumulate_with_dl(self._fanout_partials_dl(uterms),
                                       uterms)
        return _terms_set_select(gathered, dl_threshold, low, high, k)

    def search_script_score(self, terms: list[str], script: str,
                            k: int = 10) -> list[tuple[int, float]]:
        """Distributed ``script_score`` (see
        :meth:`Searcher.search_script_score`): the script compiles
        ONCE on the driver (eager validation), one partials-with-dl
        fan-out gathers the exhaustive disjunctive matches, and the
        rescore evaluates vectorized on the driver — matching docs
        and replaced scores bit-identical to the local path."""
        from mee_ray.functions.scalar import compile_expr
        if k <= 0 or not terms:
            return []
        fn = compile_expr(script)
        uterms = sorted(set(terms))
        gathered = _accumulate_with_dl(self._fanout_partials_dl(uterms),
                                       uterms)
        return _script_rescore(gathered, fn, k)

    def search_min_match(self, terms: list[str], k: int,
                         min_match: int) -> list[tuple[int, float]]:
        """Distributed minimum_should_match (see
        :meth:`Searcher.search_min_match`): per-term partials fan out
        exactly like a disjunctive query; the count threshold is
        applied in the driver merge (each term's vector arrives from
        its single owning actor, so per-doc entry count = distinct
        matched terms)."""
        if k <= 0 or not terms:
            return []
        uterms = sorted(set(terms))
        m = max(1, int(min_match))
        if m > len(uterms):
            return []
        return merge_partials(self._fanout_partials(uterms), uterms, k,
                              min_match=m)

    def search_weighted(self, term_boosts: dict[str, float], k: int
                        ) -> list[tuple[int, float]]:
        """Distributed per-term boosts (see
        :meth:`Searcher.search_weighted`): boosts are applied to the
        partial vectors on the driver — transport is unchanged."""
        if k <= 0 or not term_boosts:
            return []
        if any(b <= 0 for b in term_boosts.values()):
            raise ValueError("boosts must be positive; drop the term "
                             "or use search_boolean must_not instead")
        uterms = sorted(term_boosts)
        parts = self._fanout_partials(uterms)
        boosted = [{t: (ids, sc * float(term_boosts[t]))
                    for t, (ids, sc) in p.items()} for p in parts]
        return merge_partials(boosted, uterms, k)

    def search_after(self, terms: list[str], size: int = 10,
                     after: tuple[int, float] | None = None
                     ) -> list[tuple[int, float]]:
        """Distributed cursor pagination (see
        :meth:`Searcher.search_after`): one partials fan-out per page,
        cursor filter in the driver merge."""
        if size <= 0 or not terms:
            return []
        uterms = sorted(set(terms))
        return merge_partials(self._fanout_partials(uterms), uterms,
                              size, after=after)

    def search_dismax(self, terms: list[str], k: int = 10,
                      tie_breaker: float = 0.0
                      ) -> list[tuple[int, float]]:
        """Distributed dis-max (see :meth:`Searcher.search_dismax`)."""
        if k <= 0 or not terms:
            return []
        uterms = sorted(set(terms))
        return merge_partials_dismax(self._fanout_partials(uterms),
                                     uterms, k, tie_breaker)

    def vocabulary(self) -> list[str]:
        """Sorted union of every actor's owned-shard terms, fetched
        ONCE per pool lifetime (dictionaries are memory-resident on
        the actors; one round of sorted lists crosses the wire)."""
        import ray
        if self._vocab is None:
            out: set[str] = set()
            for v in ray.get([a.vocab.remote() for a in self.actors]):
                out.update(v)
            self._vocab = sorted(out)
        return self._vocab

    def _deletion_index_cached(self) -> dict[str, list[str]]:
        if self._del_index is None:
            self._del_index = build_deletion_index(self.vocabulary())
        return self._del_index

    def search_prefix(self, prefix: str, k: int = 10
                      ) -> list[tuple[int, float]]:
        """Distributed prefix expansion: expansion against the pooled
        vocabulary, then the standard partials fan-out (expanded terms
        route to their owning actors like any disjunctive query)."""
        if k <= 0 or not prefix:
            return []
        terms = prefix_terms(self.vocabulary(), prefix)
        if not terms:
            return []
        # search() keeps the single-actor WAND shortcut when the whole
        # expansion hashes to one actor (common for small expansions)
        return self.search(terms, k)

    def search_fuzzy(self, term: str, k: int = 10, max_edits: int = 1
                     ) -> list[tuple[int, float]]:
        """Distributed fuzzy expansion (same SymSpell candidate path
        as :meth:`Searcher.search_fuzzy`, driver-side index)."""
        if k <= 0 or not term:
            return []
        terms = fuzzy_terms(self.vocabulary(), term, max_edits,
                            self._deletion_index_cached
                            if max_edits == 1 else None)
        if not terms:
            return []
        return self.search(terms, k)

    def search_wildcard(self, pattern: str, k: int = 10
                        ) -> list[tuple[int, float]]:
        """Distributed wildcard expansion against the pooled
        vocabulary, then the standard partials fan-out."""
        if k <= 0 or not pattern:
            return []
        terms = wildcard_terms(self.vocabulary(), pattern)
        if not terms:
            return []
        return self.search(terms, k)

    def search_regexp(self, pattern: str, k: int = 10
                      ) -> list[tuple[int, float]]:
        """Distributed regexp expansion (full-match, anchored)."""
        if k <= 0 or not pattern:
            return []
        terms = regexp_terms(self.vocabulary(), pattern)
        if not terms:
            return []
        return self.search(terms, k)

    def suggest(self, term: str, n: int = 5, max_edits: int = 1
                ) -> list[tuple[int, str]]:
        """Distributed term suggester: candidates from the pooled
        vocabulary's deletion index, dfs via one dictionary-only
        fan-out (see :meth:`Searcher.suggest`)."""
        import ray
        if n <= 0 or not term:
            return []
        cands = [t for t in fuzzy_terms(
                     self.vocabulary(), term, max_edits,
                     self._deletion_index_cached
                     if max_edits == 1 else None)
                 if t != term]
        return self._ranked_by_df(cands, n)

    def suggest_phrase(self, terms: list[str], n: int = 3,
                       max_candidates: int = 5, backoff: float = 0.4
                       ) -> list[tuple[float, list[str]]]:
        """Distributed phrase suggester — identical results to
        :meth:`Searcher.suggest_phrase` (shared scoring core; counts
        are integers, so scores are bit-equal).  Exchange shape: slot
        candidates from the pooled vocabulary + ONE df fan-out; ONE
        unigram-count fan-out; per bigram pair, doc-id sets then
        positions restricted to the pair's common docs ship from each
        term's owning actor — transfer bounded by candidate dfs."""
        import ray
        if not terms or n <= 0:
            return []
        if not self.manifest.get("store_positions"):
            raise ValueError("suggest_phrase needs store_positions="
                             "True (bigram counts are positional)")
        slots: list[list[str]] = []
        for t in terms:
            cands = list(self.suggest(t, n=max_candidates))
            self_df = self._dfs_of([t]).get(t, 0)
            if self_df > 0:
                cands.append((self_df, t))
            ranked = sorted(cands, key=lambda x: (-x[0], x[1]))
            slots.append([w for _, w in ranked[:max_candidates]])
            if not slots[-1]:
                return []
        _, total = mf.live_totals(self.manifest)
        words = sorted({w for s_ in slots for w in s_})
        uni: dict[str, int] = {}
        for d in ray.get([self.actors[a].term_total_tfs.remote(ts)
                          for a, ts in
                          self._terms_by_actor(words).items()]):
            uni.update(d)
        # doc-id sets once per word, then per-pair common-restricted
        # positions from each owner
        ids: dict[str, np.ndarray] = {}
        for d in ray.get([self.actors[a].term_doc_ids.remote(ts)
                          for a, ts in
                          self._terms_by_actor(words).items()]):
            ids.update(d)
        pairs = sorted({(w1, w2)
                        for i in range(len(slots) - 1)
                        for w1 in slots[i] for w2 in slots[i + 1]})
        owner = {w: self.assign[term_hash(w) % self.num_shards]
                 for w in words}
        bi: dict[tuple[str, str], int] = {}
        pend = []
        for w1, w2 in pairs:
            common = np.intersect1d(np.unique(ids[w1]),
                                    np.unique(ids[w2]))
            if not common.size:
                bi[(w1, w2)] = 0
                continue
            f1 = self.actors[owner[w1]].term_doc_positions.remote(
                [w1], common)
            f2 = self.actors[owner[w2]].term_doc_positions.remote(
                [w2], common)
            pend.append(((w1, w2), f1, f2))
        for (w1, w2), f1, f2 in pend:
            p1, p2 = ray.get([f1, f2])
            bi[(w1, w2)] = _bigram_count_runs(p1[w1], p2[w2])
        return _lm_score_slots(slots, uni, bi, total, n, backoff)

    def _dfs_of(self, terms: list[str]) -> dict[str, int]:
        import ray
        out: dict[str, int] = {}
        for d in ray.get([self.actors[a].term_dfs.remote(ts)
                          for a, ts in
                          self._terms_by_actor(terms).items()]):
            out.update(d)
        return out

    def _ranked_by_df(self, cands: list[str], n: int
                      ) -> list[tuple[int, str]]:
        """Shared suggester tail: ONE dictionary-only df fan-out for
        the candidates, ranked (live df desc, term asc), dead terms
        dropped — suggest() and complete() differ only in how they
        generate candidates."""
        import ray
        if not cands:
            return []
        dfs: dict[str, int] = {}
        for d in ray.get([self.actors[a].term_dfs.remote(ts)
                          for a, ts in
                          self._terms_by_actor(cands).items()]):
            dfs.update(d)
        ranked = sorted((-dfs[t], t) for t in cands
                        if dfs.get(t, 0) > 0)   # live terms only
        return [(-negdf, t) for negdf, t in ranked[:n]]

    def complete(self, prefix: str, n: int = 5
                 ) -> list[tuple[int, str]]:
        """Distributed completion suggester: prefix run of the pooled
        vocabulary + the shared :meth:`_ranked_by_df` tail."""
        if n <= 0 or not prefix:
            return []
        return self._ranked_by_df(prefix_terms(self.vocabulary(),
                                               prefix), n)

    def count(self, terms: list[str], operator: str = "or") -> int:
        """Distributed match count (see :meth:`Searcher.count`): one
        id-set fan-out (transfer bounded by the terms' dfs), set math
        on the driver."""
        import ray
        uterms = sorted(set(terms))
        if not uterms:
            return 0
        id_sets: dict[str, np.ndarray] = {}
        for d in ray.get([self.actors[a].term_doc_ids.remote(ts)
                          for a, ts in
                          self._terms_by_actor(uterms).items()]):
            id_sets.update(d)
        sets = [id_sets.get(t, np.empty(0, np.int64)) for t in uterms]
        if operator == "and":
            cand = sets[0]
            for x in sets[1:]:
                cand = np.intersect1d(cand, x)
                if cand.size == 0:
                    return 0
            return int(cand.size)
        sets = [x for x in sets if x.size]
        if not sets:
            return 0
        return int(np.unique(np.concatenate(sets)).size)

    def more_like_this(self, text: str, k: int = 10,
                       max_terms: int = 10, exclude_doc_ids=None
                       ) -> list[tuple[int, float]]:
        """Distributed more_like_this (see
        :meth:`Searcher.more_like_this`): seed analysis on the driver,
        one dictionary-only df fan-out for the seed's terms (no
        posting decode crosses the wire), selection on the driver,
        then the standard partials fan-out over the selected terms."""
        import ray
        if k <= 0 or max_terms <= 0 or not text:
            return []
        if self._tok is None:
            self._tok = tokenizer_from_manifest(self.manifest)
        counts = self._tok.counts(text)
        by_actor = self._terms_by_actor(sorted(counts))
        dfs: dict[str, int] = {}
        for d in ray.get([self.actors[a].term_dfs.remote(ts)
                          for a, ts in by_actor.items()]):
            dfs.update(d)
        sel = select_terms_tfidf(counts, self.n_docs,
                                 lambda t: dfs.get(t, 0), max_terms)
        if not sel:
            return []
        excl = None
        if exclude_doc_ids is not None:
            excl = np.unique(np.asarray(list(exclude_doc_ids),
                                        dtype=np.int64))
        return merge_partials(self._fanout_partials(sel), sel, k,
                              exclude_sorted=excl)

    def search_filtered(self, terms: list[str], k: int,
                        allowed_doc_ids, operator: str = "or"
                        ) -> list[tuple[int, float]]:
        """Distributed filter-context search (see
        :meth:`Searcher.search_filtered` for semantics).  The allowed
        id array is ``ray.put`` ONCE and the ObjectRef fans out to the
        owning actors — broadcast, not re-shipped per actor message —
        and each actor returns contributions only for allowed docs, so
        transfer is bounded by |allowed ∩ postings| per term, never
        the hot term's full df."""
        import ray
        if k <= 0 or not terms:
            return []
        allowed = np.unique(np.asarray(allowed_doc_ids, dtype=np.int64))
        if allowed.size == 0:
            return []
        uterms = sorted(set(terms))
        by_actor = self._terms_by_actor(uterms)
        ref = ray.put(allowed)
        futs = [self.actors[a].term_partials_for_docs.remote(ts, ref)
                for a, ts in by_actor.items()]
        parts = ray.get(futs)
        if operator == "and":
            return merge_partials_conjunctive(parts, uterms, k)
        return merge_partials(parts, uterms, k)

    def search_common_terms(self, terms: list[str],
                            cutoff_frequency: float = 0.5,
                            k: int = 10) -> list[tuple[int, float]]:
        """Distributed ``common_terms`` (see
        :meth:`Searcher.search_common_terms` for semantics).  One df
        round classifies terms (dictionary-only — no postings); the
        LOW terms' doc-id sets ship from their owners (transfer
        bounded by the rare terms' dfs — the cheap side by
        construction) and intersect on the driver; the surviving
        allowed set broadcasts via :meth:`search_filtered`'s one
        ``ray.put``."""
        import ray
        if k <= 0 or not terms:
            return []
        uterms = sorted(set(terms))
        dfs = self._dfs_of(uterms)
        thresh = cutoff_frequency * self.n_docs
        low = [t for t in uterms if dfs.get(t, 0) <= thresh]
        if not low:
            return self.search(uterms, k)
        cand = self._intersect_live_ids(low)
        if cand is None:
            return []
        return self.search_filtered(uterms, k, cand)

    def _intersect_live_ids(self, terms: list[str]
                            ) -> "np.ndarray | None":
        """One doc-id fan-out over ``terms``' owning actors (postings
        decode only — no positions) intersected on the driver; the
        candidate round shared by the positional family and
        ``common_terms``.  Transfer is bounded by the terms' dfs.
        Returns ``None`` when any term is dead or the intersection
        empties."""
        import ray
        id_sets: dict[str, np.ndarray] = {}
        for d in ray.get([self.actors[a].term_doc_ids.remote(ts)
                          for a, ts in
                          self._terms_by_actor(terms).items()]):
            id_sets.update(d)
        cand: np.ndarray | None = None
        for t in terms:
            ids = id_sets.get(t)
            if ids is None or ids.size == 0:
                return None
            cand = ids if cand is None else np.intersect1d(cand, ids)
            if cand.size == 0:
                return None
        return cand

    def _positional_query(self, terms: list[str], k: int, matcher,
                          single_actor_call,
                          score_terms: list[str] | None = None
                          ) -> list[tuple[int, float]]:
        """Shared two-round distributed body of the positional query
        family.  Single-owning-actor queries run entirely actor-side
        (``single_actor_call(actor)`` → remote future); otherwise:
        (1) each owning actor ships its terms' live doc-id sets
        (postings decode only — no positions), the driver intersects
        them into the candidate set; (2) actors ship positions
        restricted to the candidates — transfer and position decode
        bounded by the rarest term's df, not the hottest term's
        occurrence count; (3) ``matcher(data)`` picks the matching
        docs and they are scored conjunctively over ``score_terms``
        (default: all of ``terms`` — span_containing/within score a
        sub-clause)."""
        import ray
        if not terms:
            return []
        uterms = sorted(set(terms))
        by_actor = self._terms_by_actor(uterms)
        if len(by_actor) == 1:
            (a,) = by_actor
            return ray.get(single_actor_call(self.actors[a]))
        cand = self._intersect_live_ids(uterms)
        if cand is None:
            return []
        futs = [self.actors[a].term_doc_positions.remote(ts, cand)
                for a, ts in by_actor.items()]
        data: dict = {}
        for d in ray.get(futs):
            data.update(d)
        matched = matcher(data)
        if matched.size == 0:
            return []
        sterms = (sorted(set(score_terms)) if score_terms is not None
                  else uterms)
        by_actor_s = self._terms_by_actor(sterms)
        pfuts = [self.actors[a].term_partials_for_docs.remote(ts, matched)
                 for a, ts in by_actor_s.items()]
        return merge_partials_conjunctive(ray.get(pfuts), sterms, k)

    def search_phrase(self, terms: list[str], k: int = 10
                      ) -> list[tuple[int, float]]:
        """Distributed exact phrase top-k (see
        :meth:`_positional_query` for the transfer bounds)."""
        return self._positional_query(
            terms, k,
            lambda data: phrase_match_docs(data, terms),
            lambda actor: actor.search_phrase.remote(terms, k))

    def search_span_near(self, terms: list[str], slop: int = 0,
                         k: int = 10) -> list[tuple[int, float]]:
        """Distributed ordered-proximity top-k — the span_near analog
        of :meth:`search_phrase`, same two-round shape."""
        return self._positional_query(
            terms, k,
            lambda data: span_near_match_docs(data, terms, slop),
            lambda actor: actor.search_span_near.remote(terms, slop, k))

    def search_intervals(self, terms: list[str], max_gaps: int = 0,
                         ordered: bool = True, k: int = 10
                         ) -> list[tuple[int, float]]:
        """Distributed ES ``intervals`` (total-gap-budget) top-k —
        same two-round shape as :meth:`search_phrase`."""
        return self._positional_query(
            terms, k,
            lambda data: intervals_match_docs(data, terms, max_gaps,
                                              ordered),
            lambda actor: actor.search_intervals.remote(
                terms, max_gaps, ordered, k))

    def search_span_containing(self, big_terms: list[str], slop: int,
                               little: str, k: int = 10
                               ) -> list[tuple[int, float]]:
        """Distributed ``span_containing`` (see
        :meth:`Searcher.search_span_containing`): the two-round
        positional body over big ∪ {little}, scored over the BIG
        terms only."""
        if k <= 0:
            return []
        if len(big_terms) < 2:
            raise ValueError("span_containing needs >= 2 big terms")
        if not little:
            raise ValueError("span_containing needs a little term")
        return self._positional_query(
            sorted(set(big_terms) | {little}), k,
            lambda data: span_containing_match_docs(data, big_terms,
                                                    slop, little),
            lambda actor: actor.search_span_containing.remote(
                big_terms, slop, little, k),
            score_terms=sorted(set(big_terms)))

    def search_span_within(self, little: str, big_terms: list[str],
                           slop: int, k: int = 10
                           ) -> list[tuple[int, float]]:
        """Distributed ``span_within`` — same containment predicate,
        scored over the LITTLE term only."""
        if k <= 0:
            return []
        if len(big_terms) < 2:
            raise ValueError("span_within needs >= 2 big terms")
        if not little:
            raise ValueError("span_within needs a little term")
        return self._positional_query(
            sorted(set(big_terms) | {little}), k,
            lambda data: span_containing_match_docs(data, big_terms,
                                                    slop, little),
            lambda actor: actor.search_span_within.remote(
                little, big_terms, slop, k),
            score_terms=[little])

    def search_span_or_near(self, slots: list[list[str]],
                            slop: int = 0, k: int = 10
                            ) -> list[tuple[int, float]]:
        """Distributed span_near-over-span_or (see
        :meth:`Searcher.search_span_or_near`).  The candidate round
        unions each slot's alternatives' doc-id sets BEFORE the
        cross-slot intersection (an OR slot must not conjunct its
        alternatives); positions then ship restricted to the
        candidates, slots merge into pseudo-slots on the driver, and
        scoring delegates to the distributed
        :meth:`search_filtered`."""
        import ray
        if k <= 0 or not slots:
            return []
        if any(not s for s in slots):
            raise ValueError("every span_or slot needs >= 1 term")
        if slop < 0:
            raise ValueError(f"slop must be >= 0, got {slop}")
        all_terms = sorted({t for slot in slots for t in slot})
        by_actor = self._terms_by_actor(all_terms)
        if len(by_actor) == 1:
            (a,) = by_actor
            return ray.get(self.actors[a].search_span_or_near.remote(
                slots, slop, k))
        id_sets: dict[str, np.ndarray] = {}
        for d in ray.get([self.actors[a].term_doc_ids.remote(ts)
                          for a, ts in by_actor.items()]):
            id_sets.update(d)
        cand: np.ndarray | None = None
        for slot in slots:
            ids_l = [id_sets.get(t) for t in sorted(set(slot))]
            ids_l = [x for x in ids_l if x is not None and x.size]
            if not ids_l:
                return []
            slot_ids = np.unique(np.concatenate(ids_l))
            cand = (slot_ids if cand is None
                    else np.intersect1d(cand, slot_ids))
            if cand.size == 0:
                return []
        futs = [self.actors[a].term_doc_positions.remote(ts, cand)
                for a, ts in by_actor.items()]
        data: dict = {}
        for d in ray.get(futs):
            data.update(d)
        pseudo = [f"\x00slot{i}" for i in range(len(slots))]
        pdata = {p: merge_position_sets(
                     [data[t] for t in sorted(set(slot))])
                 for p, slot in zip(pseudo, slots)}
        docs = span_near_match_docs(pdata, pseudo, slop)
        if docs.size == 0:
            return []
        return self.search_filtered(all_terms, k, docs)

    def search_span_first(self, term: str, end: int,
                          k: int = 10) -> list[tuple[int, float]]:
        """Distributed span_first: a single-term span has exactly ONE
        owning shard actor, so the whole query runs actor-side — the
        positional family's single-actor fast path, with zero
        position bytes crossing the wire."""
        import ray
        if end <= 0 or not term:
            return []
        by_actor = self._terms_by_actor([term])
        (a,) = by_actor
        return ray.get(
            self.actors[a].search_span_first.remote(term, end, k))

    def explain(self, terms: list[str], doc_id: int
                ) -> dict[str, dict[str, float]]:
        """Distributed _explain: each term's breakdown is computed by
        its OWNING actor (shard-subset searchers return entries only
        for owned terms, so the per-actor dicts are disjoint) and the
        driver merges — identical to the local Searcher.explain."""
        import ray
        uterms = sorted(set(terms))
        if not uterms:
            return {}
        futs = [self.actors[a].explain.remote(ts, doc_id)
                for a, ts in self._terms_by_actor(uterms).items()]
        out: dict[str, dict[str, float]] = {}
        for d in ray.get(futs):
            out.update(d)
        return out

    def search_span_not(self, include: str, exclude: str,
                        dist: int = 1, k: int = 10
                        ) -> list[tuple[int, float]]:
        """Distributed span_not: the candidate set is the include
        term's doc ids (one owning actor), exclude positions ship
        candidate-restricted from THEIR owner — transfer bounded by
        the include df, the filter-side analog of _positional_query's
        rarest-term bound.  One owner for both terms → the whole query
        runs actor-side."""
        import ray
        if not include or include == exclude:
            return []
        if not self.manifest.get("store_positions"):
            # same clean refusal as the local path — without this, the
            # split-owner branch surfaces an obscure actor-side decode
            # error through ray.get instead
            raise ValueError("span_not needs store_positions=True "
                             "(pinned in the manifest)")
        by_actor = self._terms_by_actor(sorted({include, exclude}))
        if len(by_actor) == 1:
            (a,) = by_actor
            return ray.get(self.actors[a].search_span_not.remote(
                include, exclude, dist, k))
        inc_owner = next(a for a, ts in by_actor.items()
                         if include in ts)
        exc_owner = next(a for a, ts in by_actor.items()
                         if exclude in ts)
        inc = ray.get(self.actors[inc_owner].term_doc_positions.remote(
            [include]))[include]
        if not inc[0].size:
            return []
        cand = np.unique(inc[0])
        exc = ray.get(self.actors[exc_owner].term_doc_positions.remote(
            [exclude], cand))[exclude]
        matched = span_not_match_docs(inc, exc, dist)
        if not matched.size:
            return []
        pf = ray.get(self.actors[inc_owner].term_partials_for_docs
                     .remote([include], matched))
        return merge_partials([pf], [include], k)

    def search_phrase_prefix(self, terms: list[str], k: int = 10,
                             max_expansions: int = 50
                             ) -> list[tuple[int, float]]:
        """Distributed match_phrase_prefix: candidates from the fixed
        terms' id-set fan-out; the prefix expands against the POOLED
        vocabulary (dictionary-only, like the completion suggester),
        expansion positions ship candidate-restricted from their
        owning actors and merge into one pseudo-slot driver-side —
        transfer stays bounded by |candidates|, never an expansion's
        full occurrence count."""
        import ray
        if len(terms) < 2:
            raise ValueError("match_phrase_prefix needs >= 2 terms; "
                             "use search_prefix for a bare prefix")
        if not self.manifest.get("store_positions"):
            # same clean refusal as the local path — without this the
            # position fan-out surfaces an obscure actor-side decode
            # error through ray.get instead (span_not precedent)
            raise ValueError("match_phrase_prefix needs "
                             "store_positions=True (pinned in the "
                             "manifest)")
        if k <= 0:
            return []
        fixed, prefix = terms[:-1], terms[-1]
        ufixed = sorted(set(fixed))
        by_actor = self._terms_by_actor(ufixed)
        id_futs = [self.actors[a].term_doc_ids.remote(ts)
                   for a, ts in by_actor.items()]
        id_sets: dict = {}
        for d in ray.get(id_futs):
            id_sets.update(d)
        cand = None
        for t in ufixed:
            ids = id_sets[t]
            if ids.size == 0:
                return []
            cand = ids if cand is None else np.intersect1d(cand, ids)
            if cand.size == 0:
                return []
        expansions = prefix_terms(self.vocabulary(),
                                  prefix)[:max_expansions]
        if not expansions:
            return []
        all_by_actor = self._terms_by_actor(
            sorted(set(ufixed) | set(expansions)))
        futs = [self.actors[a].term_doc_positions.remote(ts, cand)
                for a, ts in all_by_actor.items()]
        data: dict = {}
        for d in ray.get(futs):
            data.update(d)
        merged = merge_position_sets(
            [data[e] for e in expansions if e in data])
        if merged[0].size == 0:
            return []
        pseudo = "\x00" + prefix
        d2 = {t: data[t] for t in ufixed}
        d2[pseudo] = merged
        matched = phrase_match_docs(d2, list(fixed) + [pseudo])
        if matched.size == 0:
            return []
        pfuts = [self.actors[a].term_partials_for_docs.remote(ts, matched)
                 for a, ts in by_actor.items()]
        return merge_partials_conjunctive(ray.get(pfuts), ufixed, k)

    def _search_three_phase(self, by_actor: dict, uterms: list[str],
                            k: int) -> list[tuple[int, float]]:
        """CA-style exact top-k over term-partitioned shard actors.

        Loop: each actor returns its exact local top-m partial ranking
        plus τ_a (its m-th best partial — the upper bound on any doc it
        did NOT return); the driver fetches per-term contributions for
        the candidate union and re-scores them exactly (sorted-term
        accumulation).  An unseen doc's score is bounded by Σ_a τ_a, so
        once the k-th exact candidate score strictly beats that sum —
        or every actor has been drained — the candidate top-k is the
        global top-k.  m doubles per round; bounded by total drain."""
        import numpy as np
        import ray

        m = max(k, 16)
        while True:
            futs = [self.actors[a].local_topm.remote(ts, m)
                    for a, ts in by_actor.items()]
            got = ray.get(futs)
            taus = [tau for _, tau in got]
            cand = sorted({doc for ranked, _ in got for doc, _ in ranked})
            if not cand:
                return []
            cand_arr = np.array(cand, dtype=np.int64)
            pfuts = [self.actors[a].term_partials_for_docs.remote(ts, cand_arr)
                     for a, ts in by_actor.items()]
            exact = merge_partials(ray.get(pfuts), uterms, k)
            bound = sum(taus)
            drained = all(t == 0.0 for t in taus)
            if drained or (len(exact) >= k and exact[k - 1][1] > bound):
                return exact
            m *= 2

    def stale(self) -> bool:
        """True when the index moved past this pool's snapshot: a
        compaction/rebuild published a newer epoch (whose files may be
        GC'd), OR delta records were appended to the SAME epoch — the
        actors' Searcher snapshots would otherwise keep serving
        tombstoned docs and stale stats until an epoch flip."""
        if mf.current_epoch(self.index_root) != self.manifest["epoch"]:
            return True
        cur = mf.load_manifest(self.index_root)
        return (len(cur.get("deltas", []))
                != len(self.manifest.get("deltas", [])))

    def refresh(self) -> bool:
        """Re-point the pool at the CURRENT epoch if it moved — the
        reader-side half of the alias swap (searchers follow the
        pointer; epochs are immutable so no coordination is needed
        beyond tearing down the old actors).  Returns True if the pool
        was rebuilt."""
        if not self.stale():
            return False
        self.shutdown()
        self.__init__(self.index_root, None, self.n_actors_requested)
        return True

    def query_stats(self) -> dict:
        """Aggregated WAND pruning counters across the actor pool."""
        import ray
        totals: dict[str, int] = {}
        for d in ray.get([a.stats.remote() for a in self.actors]):
            for k, v in d.items():
                totals[k] = totals.get(k, 0) + v
        return totals

    def shutdown(self) -> None:
        """Release the shard actors' CPU slots.  Call when done
        querying from a process that will run further Ray Data work —
        each actor pins one CPU, and on a small cluster a lingering
        pool can starve the streaming executor."""
        import ray
        for a in self.actors:
            ray.kill(a, no_restart=True)
        self.actors = []
