"""Benchmark entry point (driver contract).

Default: run the headline suite at $GRAFT_SF_DIR (default
/root/testdata/sf0.1) with ray.init(num_cpus=$RAY_GRAFT_CPUS or 32) and
print ONE JSON line:
  {"metric": ..., "value": suite_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "num_cpus": N,
   "index_build": {...}, "query_latency": {...}}

--scaling: run the identical suite in two fresh subprocesses at
num_cpus=8 and num_cpus=32 over the SAME pre-generated input (page
cache warmed) and print throughputs + scaling efficiency — the
in-sandbox evidence for the north_rule's two-cluster-size criterion.

Headline pieces:
  * index_build      — full engine build (tokenize → shuffle → encode →
                       manifest) over a deterministic synthetic code
                       corpus (~BENCH_FILES files); files/sec is the
                       BASELINE.md metric.
  * query p50/p99    — BM25 top-10 latency over the reference query
                       set via DistributedSearcher shard actors.
  * pipeline timings — a slice of queries() entries at sf_dir.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

BENCH_FILES = int(os.environ.get("MEE_BENCH_FILES", "24000"))
BENCH_SCALE = int(os.environ.get("MEE_BENCH_CONTENT_SCALE", "5"))
BENCH_SEED = 42
N_QUERIES = 100


def corpus_dir() -> str:
    """Deterministic corpus, generated once and shared by all runs
    (both --scaling subprocesses see the same warm input)."""
    from mee_ray.corpus import write_corpus
    path = f"/tmp/mee_bench/corpus_{BENCH_FILES}_{BENCH_SEED}_{BENCH_SCALE}"
    if not (os.path.isdir(path) and os.listdir(path)):
        write_corpus(path, n_files=BENCH_FILES, seed=BENCH_SEED,
                     rows_per_file=max(500, BENCH_FILES // 64),
                     content_scale=BENCH_SCALE)
    return path


def run_suite(sf_dir: str, num_cpus: int) -> dict:
    import numpy as np
    import ray

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    import ray.data
    ray.data.DataContext.get_current().enable_progress_bars = False

    from mee_ray.build import build_index
    from mee_ray.config import EngineConfig
    from mee_ray.oracle import make_query_set
    from mee_ray.query import DistributedSearcher

    results: dict = {"num_cpus": num_cpus, "sf_dir": sf_dir}
    queries_sec: dict[str, float] = {}

    # ---- 1. index build over the synthetic code corpus ---------------
    cdir = corpus_dir()
    # warm the page cache so we measure compute + shuffle, not cold disk
    ds_warm = ray.data.read_parquet(cdir)
    _ = ds_warm.count()

    index_root = f"/tmp/mee_bench/index_{num_cpus}"
    shutil.rmtree(index_root, ignore_errors=True)
    cfg = EngineConfig(num_shards=8, parts_per_shard=4)
    t0 = time.time()
    manifest = build_index(ray.data.read_parquet(cdir), index_root, "bench",
                           cfg, dedup=True)
    build_sec = time.time() - t0
    n_docs = manifest["n_docs"]
    results["index_build"] = {
        "n_docs": n_docs, "build_sec": round(build_sec, 2),
        "files_per_sec": round(n_docs / build_sec, 1),
        "total_tokens": manifest["total_tokens"],
    }
    queries_sec["index_build"] = round(build_sec, 3)

    # ---- 2. BM25 query latency over the reference query set ----------
    import pyarrow.parquet as pq
    t = pq.read_table(cdir, columns=["repo", "path", "commit", "content"])
    # sample docs for query-set generation (vocabulary source only)
    sample = [(i, c) for i, c in enumerate(t["content"].to_pylist()[:2000])]
    qset = make_query_set(sample, n_queries=N_QUERIES, seed=7)

    searcher = DistributedSearcher(index_root, n_actors=min(8, cfg.num_shards))
    lat = []
    for q in qset:
        tq = time.time()
        searcher.search(q["terms"], q["k"])
        lat.append(time.time() - tq)
    lat_ms = np.array(lat) * 1000.0
    results["query_latency"] = {
        "n_queries": len(qset),
        "p50_ms": round(float(np.percentile(lat_ms, 50)), 2),
        "p99_ms": round(float(np.percentile(lat_ms, 99)), 2),
        "qps": round(len(qset) / (lat_ms.sum() / 1000.0), 1),
    }
    queries_sec["bm25_query_set"] = round(lat_ms.sum() / 1000.0, 3)

    # ---- 3. headline pipeline slice at sf_dir ------------------------
    import __ray_entry__ as entry_mod
    qs = entry_mod.queries()
    for name in ("q1_pricing_summary", "doc_term_df", "knn_bruteforce",
                 "minhash_lsh_candidates", "tumbling_window_events"):
        tq = time.time()
        res = qs[name](sf_dir)
        if hasattr(res, "materialize"):
            res.materialize()
        queries_sec[name] = round(time.time() - tq, 3)

    results["queries"] = queries_sec
    results["suite_sec"] = round(sum(queries_sec.values()), 2)
    ray.shutdown()
    return results


def main() -> None:
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

    if "--scaling" in sys.argv:
        corpus_dir()  # generate once; both subprocesses reuse it
        out = {}
        for n in (8, 32):
            env = dict(os.environ, RAY_GRAFT_CPUS=str(n))
            import subprocess
            r = subprocess.run([sys.executable, __file__], env=env,
                               capture_output=True, text=True, check=True,
                               cwd=os.path.dirname(os.path.abspath(__file__)))
            out[n] = json.loads(r.stdout.strip().splitlines()[-1])
        fps8 = out[8]["index_build"]["files_per_sec"]
        fps32 = out[32]["index_build"]["files_per_sec"]
        eff = (fps32 / fps8) / (32 / 8)
        print(json.dumps({
            "metric": "index_build_scaling_8_to_32_cpus",
            "files_per_sec_8": fps8, "files_per_sec_32": fps32,
            "build_sec_8": out[8]["index_build"]["build_sec"],
            "build_sec_32": out[32]["index_build"]["build_sec"],
            "scaling_efficiency": round(eff, 3),
            "query_p50_ms_32": out[32]["query_latency"]["p50_ms"],
            "query_p99_ms_32": out[32]["query_latency"]["p99_ms"],
        }))
        return

    r = run_suite(sf_dir, num_cpus)
    print(json.dumps({
        "metric": "index_build_plus_query_suite",
        "value": r["suite_sec"],
        "unit": "sec",
        "queries": r["queries"],
        "sf": sf_dir,
        "num_cpus": num_cpus,
        "index_build": r["index_build"],
        "query_latency": r["query_latency"],
    }))


if __name__ == "__main__":
    main()
