"""Whole-lifecycle fuzz: random interleavings of delta batches,
delete_by_query, update_by_query, policy-gated compaction and reindex
on a source-enabled index — rank-identical to the model oracle after
EVERY operation."""

import random
import shutil
import zlib

import pyarrow as pa
import pytest

from mee_ray import manifest as mf
from mee_ray.build import build_index, reindex
from mee_ray.config import EngineConfig, TokenizerConfig
from mee_ray.corpus import write_corpus
from mee_ray.delta import apply_delta, delete_by_query, update_by_query
from mee_ray.ids import doc_id_of
from mee_ray.oracle import OracleIndex, make_query_set
from mee_ray.query import Searcher
from mee_ray.scheduler import MergePolicy, maybe_compact
from mee_ray.tokenizer import Tokenizer


def test_lifecycle_fuzz(ray_session, tmp_path):
    import ray.data

    root = str(tmp_path / "index")
    cdir = write_corpus(str(tmp_path / "corpus"), n_files=100, seed=47,
                        rows_per_file=50)
    cfg = EngineConfig(num_shards=2, parts_per_shard=2,
                       store_source=True)
    build_index(ray.data.read_parquet(cdir), root, "ep1", cfg)

    import pyarrow.parquet as pq
    t = pq.read_table(cdir)
    live: dict = {}
    for r, p, c, content in zip(t["repo"].to_pylist(),
                                t["path"].to_pylist(),
                                t["commit"].to_pylist(),
                                t["content"].to_pylist()):
        k = (r, p)
        if k not in live or c > live[k][0]:
            live[k] = (c, content)

    tok = Tokenizer(TokenizerConfig())
    rng = random.Random(4747)

    def tokens_of(content):
        return set(tok.terms(content))

    def pick_live_term():
        k = sorted(live)[rng.randrange(len(live))]
        ts = sorted(tokens_of(live[k][1]))
        return ts[rng.randrange(len(ts))]

    def check(tag):
        oi = OracleIndex([(doc_id_of(r, p, c), content)
                          for (r, p), (c, content) in live.items()])
        s = Searcher(root)
        assert (s.n_docs, s.avgdl) == (oi.n_docs, oi.avgdl), tag
        docs = [(i, c) for i, (_, c) in enumerate(live.values())]
        for q in make_query_set(docs, n_queries=8,
                                seed=zlib.crc32(tag.encode()) % 997):
            assert s.search(q["terms"], q["k"]) == \
                oi.search(q["terms"], q["k"]), (tag, q["terms"])

    import hashlib
    ops_run = {"delta": 0, "dbq": 0, "ubq": 0, "compact": 0,
               "reindex": 0}
    for step in range(14):
        roll = rng.random()
        if roll < 0.35:                       # delta batch
            start = mf.next_event_seq(root)
            ev, seq = [], start
            for _ in range(rng.randrange(1, 4)):
                r2 = rng.random()
                if r2 < 0.5 and live:
                    k = sorted(live)[rng.randrange(len(live))]
                    c = f"{seq:08x}" + "b" * 32
                    content = (f"def lc_fn_{seq}():\n"
                               f"    return lc_token_{seq}\n")
                    ev.append(("UPDATE", k, c, content))
                    live[k] = (c, content)
                elif r2 < 0.75 and live:
                    k = sorted(live)[rng.randrange(len(live))]
                    ev.append(("DELETE", k, None, None))
                    live.pop(k)
                else:
                    k = (f"org_lc/r{seq}", f"src/lc_{seq}.py")
                    c = f"{seq:08x}" + "c" * 32
                    content = f"class LcNew{seq}: pass\n"
                    ev.append(("INSERT", k, c, content))
                    live[k] = (c, content)
                seq += 1
            tbl = pa.table({
                "seq": pa.array(range(start, seq), pa.int64()),
                "type": pa.array([e[0] for e in ev]),
                "repo": pa.array([e[1][0] for e in ev]),
                "path": pa.array([e[1][1] for e in ev]),
                "commit": pa.array([e[2] for e in ev], pa.string()),
                "lang": pa.array(
                    ["py" if e[2] else None for e in ev], pa.string()),
                "content": pa.array([e[3] for e in ev], pa.string()),
            })
            apply_delta(tbl, root)
            ops_run["delta"] += 1
        elif roll < 0.55 and live:            # delete_by_query
            term = pick_live_term()
            delete_by_query(root, [term])
            live = {k: v for k, v in live.items()
                    if term not in tokens_of(v[1])}
            ops_run["dbq"] += 1
        elif roll < 0.75 and live:            # update_by_query
            term = pick_live_term()
            marker = f"ubq_marker_{step}"

            def transform(c, m=marker):
                return c if m in c else c + f"\n{m}\n"
            update_by_query(root, [term], transform)
            for k, (c, content) in list(live.items()):
                if term in tokens_of(content):
                    new = transform(content)
                    if new != content:
                        live[k] = (hashlib.sha256(
                            new.encode()).hexdigest()[:40], new)
            ops_run["ubq"] += 1
        elif roll < 0.9:                      # policy-gated compact
            if maybe_compact(root,
                             policy=MergePolicy(max_deltas=1)) is not None:
                ops_run["compact"] += 1
        else:                                 # reindex, same config
            reindex(root, f"re{step}")
            ops_run["reindex"] += 1
        check(f"step{step}")

    # every op class must have fired at least once across the run
    assert ops_run["delta"] and ops_run["dbq"] and ops_run["ubq"]
    assert ops_run["compact"] + ops_run["reindex"] >= 1, ops_run
    # a final compact folds everything; identity must survive it
    m = maybe_compact(root, policy=MergePolicy(max_deltas=1))
    check("final")
