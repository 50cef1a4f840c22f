"""Out-of-order delivery fuzz: events carrying externally-allocated
seqs arrive shuffled, duplicated, and split into arbitrary batches,
interleaved with policy compaction and reindex — after EVERY delivery
the engine must equal the per-key LWW model (each key's state is the
max-seq event delivered so far), rank-identical to the oracle.

This is the regression net for the per-key memory machinery: delta
key_seqs files, catch-up carry-over relocation, compact's key-seq
fold, and reindex's chain-floor + fold (the round-2 review findings).
"""

import random
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from mee_ray import manifest as mf
from mee_ray.build import build_index, reindex
from mee_ray.config import EngineConfig
from mee_ray.corpus import write_corpus
from mee_ray.delta import apply_delta
from mee_ray.ids import doc_id_of
from mee_ray.oracle import OracleIndex, make_query_set
from mee_ray.query import Searcher
from mee_ray.scheduler import MergePolicy, maybe_compact


def _deliver(root, events):
    cols = {
        "seq": pa.array([e["seq"] for e in events], pa.int64()),
        "type": pa.array([e["type"] for e in events], pa.string()),
        "repo": pa.array([e["repo"] for e in events], pa.string()),
        "path": pa.array([e["path"] for e in events], pa.string()),
        "commit": pa.array([e["commit"] for e in events], pa.string()),
        "lang": pa.array([e["lang"] for e in events], pa.string()),
        "content": pa.array([e["content"] for e in events], pa.string()),
    }
    apply_delta(pa.table(cols), root)


@pytest.mark.parametrize("seed", [101, 202, 303])
def test_out_of_order_delivery_fuzz(ray_session, tmp_path, seed):
    import zlib

    import ray.data

    rng = random.Random(seed)
    root = str(tmp_path / "index")
    cdir = write_corpus(str(tmp_path / "corpus"), n_files=60,
                        seed=seed, rows_per_file=40)
    cfg = EngineConfig(num_shards=2, parts_per_shard=2,
                       store_source=True)
    build_index(ray.data.read_parquet(cdir), root, "ep1", cfg)

    t = pq.read_table(cdir)
    base: dict = {}
    for r, p, c, content in zip(t["repo"].to_pylist(),
                                t["path"].to_pylist(),
                                t["commit"].to_pylist(),
                                t["content"].to_pylist()):
        if (r, p) not in base or c > base[(r, p)][0]:
            base[(r, p)] = (c, content)

    # --- generate a timeline of sequenced events over a key space ----
    keys = sorted(base)[:10] + [(f"oo/r{seed}", f"new_{i}.py")
                                for i in range(5)]
    timeline = []
    for s in range(1, 25):
        k = keys[rng.randrange(len(keys))]
        if rng.random() < 0.25:
            timeline.append({"seq": s, "type": "DELETE", "repo": k[0],
                             "path": k[1], "commit": None, "lang": None,
                             "content": None})
        else:
            content = (f"def oo_fn_{s}():\n"
                       f"    return oo_token_{s}\n")
            timeline.append({"seq": s, "type": "UPDATE", "repo": k[0],
                             "path": k[1], "commit": f"{s:08x}" + "e" * 32,
                             "lang": "python", "content": content})

    # delivery plan: shuffled batches with ~30% redelivered duplicates
    deliveries = list(timeline)
    deliveries += [dict(e) for e in rng.sample(timeline, 7)]
    rng.shuffle(deliveries)

    delivered: dict = {}          # key -> max-seq event delivered so far

    def model_live():
        live = dict(base)
        for (r, p), e in delivered.items():
            if e["type"] == "DELETE":
                live.pop((r, p), None)
            else:
                live[(r, p)] = (e["commit"], e["content"])
        return live

    def check(tag):
        live = model_live()
        oi = OracleIndex([(doc_id_of(r, p, c), content)
                          for (r, p), (c, content) in live.items()])
        s = Searcher(root)
        assert (s.n_docs, s.avgdl) == (oi.n_docs, oi.avgdl), tag
        docs = [(i, c) for i, (_, c) in enumerate(live.values())]
        for q in make_query_set(docs, n_queries=6,
                                seed=zlib.crc32(tag.encode()) % 997):
            assert s.search(q["terms"], q["k"]) == \
                oi.search(q["terms"], q["k"]), (tag, q["terms"])
        # stored-source spot check on a fuzzed key
        for k in keys[:3]:
            want = live.get(k)
            got = s.get_doc(*k)
            if want is None:
                assert got is None, (tag, k)
            else:
                assert got is not None and \
                    got["content"] == want[1], (tag, k)

    step = 0
    while deliveries:
        n = min(len(deliveries), rng.randrange(1, 4))
        batch, deliveries = deliveries[:n], deliveries[n:]
        for e in batch:
            k = (e["repo"], e["path"])
            if k not in delivered or e["seq"] > delivered[k]["seq"]:
                delivered[k] = e
        _deliver(root, batch)
        roll = rng.random()
        if roll < 0.2:
            maybe_compact(root, policy=MergePolicy(max_deltas=1))
        elif roll < 0.3:
            reindex(root, f"oo_re{seed}_{step}")
        check(f"seed{seed}-step{step}")
        step += 1

    # full redelivery of the ENTIRE timeline after a final reindex:
    # every event is stale now — the index must not move at all
    reindex(root, f"oo_final_{seed}")
    stale = list(timeline)
    rng.shuffle(stale)
    _deliver(root, stale)
    check(f"seed{seed}-final-redelivery")
