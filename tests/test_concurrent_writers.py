"""True-concurrency stress for the index lock machinery: several
writer threads (apply_with_seq_allocation over DISJOINT key ranges)
race a compactor thread (policy-gated maybe_compact); afterwards the
index must equal the union of the per-thread LWW models,
rank-identical to the oracle and fsck-clean.

This is the first test that exercises the round-2 race guards
(CompactTargetExists, publish_with_catchup's locked replay, the
delta write-lock) under REAL thread interleavings rather than
single-threaded simulations."""

import random
import threading

import pyarrow as pa
import pyarrow.parquet as pq

from mee_ray import manifest as mf
from mee_ray.build import build_index
from mee_ray.config import EngineConfig
from mee_ray.corpus import write_corpus
from mee_ray.delta import apply_with_seq_allocation
from mee_ray.ids import doc_id_of
from mee_ray.oracle import OracleIndex, make_query_set
from mee_ray.query import Searcher
from mee_ray.scheduler import MergePolicy, maybe_compact


def test_concurrent_writers_and_compactor(ray_session, tmp_path):
    import zlib

    import ray.data

    root = str(tmp_path / "index")
    cdir = write_corpus(str(tmp_path / "corpus"), n_files=40, seed=211,
                        rows_per_file=40)
    cfg = EngineConfig(num_shards=2, parts_per_shard=2,
                       store_source=True)
    build_index(ray.data.read_parquet(cdir), root, "ep1", cfg)

    t = pq.read_table(cdir)
    base = {}
    for r, p, c, content in zip(t["repo"].to_pylist(),
                                t["path"].to_pylist(),
                                t["commit"].to_pylist(),
                                t["content"].to_pylist()):
        if (r, p) not in base or c > base[(r, p)][0]:
            base[(r, p)] = (c, content)

    N_WRITERS, N_BATCHES = 3, 5
    models = [dict() for _ in range(N_WRITERS)]   # per-writer key state
    errors: list = []

    def writer(wid: int):
        rng = random.Random(1000 + wid)
        keys = [(f"cw/w{wid}", f"f{j}.py") for j in range(6)]
        try:
            for b in range(N_BATCHES):
                picked = rng.sample(keys, rng.randrange(1, 4))
                ops = []
                for k in picked:
                    if k in models[wid] and models[wid][k] is not None \
                            and rng.random() < 0.3:
                        ops.append((k, "DELETE", None, None))
                    else:
                        content = (f"def w{wid}_b{b}_{k[1][:-3]}():\n"
                                   f"    return tok_w{wid}_b{b}\n")
                        ops.append((k, "UPDATE",
                                    f"{wid:02d}{b:02d}" + "f" * 36,
                                    content))

                def build_events(start, ops=ops):
                    return pa.table({
                        "seq": pa.array(
                            range(start, start + len(ops)), pa.int64()),
                        "type": pa.array([o[1] for o in ops]),
                        "repo": pa.array([o[0][0] for o in ops]),
                        "path": pa.array([o[0][1] for o in ops]),
                        "commit": pa.array([o[2] for o in ops],
                                           pa.string()),
                        "lang": pa.array(
                            ["python" if o[3] else None for o in ops],
                            pa.string()),
                        "content": pa.array([o[3] for o in ops],
                                            pa.string())})

                apply_with_seq_allocation(build_events, root)
                for k, typ, c, content in ops:
                    models[wid][k] = None if typ == "DELETE" \
                        else (c, content)
        except Exception as e:        # surfaced by the main thread
            errors.append((wid, repr(e)))

    stop = threading.Event()

    def compactor():
        try:
            while not stop.is_set():
                maybe_compact(root, policy=MergePolicy(max_deltas=2))
        except Exception as e:
            errors.append(("compactor", repr(e)))

    threads = [threading.Thread(target=writer, args=(w,))
               for w in range(N_WRITERS)]
    ct = threading.Thread(target=compactor)
    ct.start()
    for th in threads:
        th.start()
    for th in threads:
        th.join(timeout=300)
    stop.set()
    ct.join(timeout=300)
    assert not errors, errors

    live = dict(base)
    for m in models:
        for k, v in m.items():
            if v is None:
                live.pop(k, None)
            else:
                live[k] = v

    oi = OracleIndex([(doc_id_of(r, p, c), content)
                      for (r, p), (c, content) in live.items()])
    s = Searcher(root)
    assert (s.n_docs, s.avgdl) == (oi.n_docs, oi.avgdl)
    docs = [(i, c) for i, (_, c) in enumerate(live.values())]
    for q in make_query_set(docs, n_queries=10, seed=7):
        assert s.search(q["terms"], q["k"]) == \
            oi.search(q["terms"], q["k"]), q["terms"]
    for wid in range(N_WRITERS):
        for k, v in models[wid].items():
            got = s.get_doc(*k)
            if v is None:
                assert got is None, k
            else:
                assert got is not None and got["content"] == v[1], k
    assert mf.fsck(root, verify_hashes=False)["ok"]
    # a final fold leaves the same state
    maybe_compact(root, policy=MergePolicy(max_deltas=1))
    s = Searcher(root)
    for q in make_query_set(docs, n_queries=6, seed=11):
        assert s.search(q["terms"], q["k"]) == \
            oi.search(q["terms"], q["k"]), q["terms"]
