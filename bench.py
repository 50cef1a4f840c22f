"""Benchmark entry point (driver contract).

Default: run the headline suite at $GRAFT_SF_DIR (default
/root/testdata/sf0.1) with ray.init(num_cpus=$RAY_GRAFT_CPUS or 32) and
print ONE JSON line:
  {"metric": ..., "value": suite_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "num_cpus": N,
   "index_build": {...}, "query_latency": {...}}

--scaling: run the identical index build in fresh subprocesses at
num_cpus=N and 4N (default 4 and 16, override MEE_SCALING_LEVELS="8,32")
over the SAME pre-generated input, interleaved min-of-2 reps, and print
throughputs + scaling efficiency — the in-sandbox evidence for the
north_rule's two-cluster-size criterion.  N=4 is the default because
this sandbox's host is CPU-throttled above ~16 effective cores (a pure
multiprocessing burn scales 8→32 procs at only ~0.65), so 8→32 measures
the hypervisor, not the engine; see BASELINE.md for both pairs.

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
SCALING_FILES = int(os.environ.get("MEE_SCALING_FILES", "96000"))
BENCH_SCALE = int(os.environ.get("MEE_BENCH_CONTENT_SCALE", "5"))
BENCH_SEED = 42
N_QUERIES = 100


def corpus_dir(n_files: int = BENCH_FILES) -> str:
    """Deterministic corpus, generated once and shared by all runs
    (all --scaling subprocesses see the same warm input)."""
    from mee_ray.corpus import write_corpus
    path = f"/tmp/mee_bench/corpus_{n_files}_{BENCH_SEED}_{BENCH_SCALE}"
    if not (os.path.isdir(path) and os.listdir(path)):
        write_corpus(path, n_files=n_files, seed=BENCH_SEED,
                     rows_per_file=max(500, n_files // 64),
                     content_scale=BENCH_SCALE)
    return path


def run_suite(sf_dir: str, num_cpus: int, build_only: bool = False) -> dict:
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
    # real warm-up: spawn the worker pool AND fault the corpus into the
    # page cache (count() alone is metadata-only and warms neither)
    ray.data.read_parquet(cdir).map_batches(
        lambda t: t.slice(0, 0), batch_format="pyarrow").count()

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
    frag = sorted(os.listdir(cdir))[0]
    t = pq.read_table(os.path.join(cdir, frag), columns=["content"])
    # sample docs for query-set generation (vocabulary source only)
    sample = [(i, c) for i, c in enumerate(t["content"].to_pylist()[:500])]
    qset = make_query_set(sample, n_queries=N_QUERIES, seed=7)

    searcher = DistributedSearcher(index_root, n_actors=min(8, cfg.num_shards))
    lat = []
    for q in qset:
        tq = time.time()
        searcher.search(q["terms"], q["k"])
        lat.append(time.time() - tq)
    lat_ms = np.array(lat) * 1000.0

    # controls for attribution: the distributed p50 floor is one actor
    # round-trip, which swings ~1–6 ms with co-tenant host load — so
    # report a bare-actor RTT and the in-process (no-RPC) latency
    # measured in the SAME minute as the headline number
    @ray.remote
    class _Ping:
        def ping(self):
            return 1

    ping = _Ping.remote()
    ray.get(ping.ping.remote())
    rtt = []
    for _ in range(50):
        tq = time.time()
        ray.get(ping.ping.remote())
        rtt.append((time.time() - tq) * 1000.0)
    # release the probe's CPU slot — on an 8-cpu run a lingering actor
    # silently starves every later Ray Data stage
    ray.kill(ping, no_restart=True)

    from mee_ray.query import Searcher as _LocalSearcher
    local = _LocalSearcher(index_root)
    for q in qset[:10]:
        local.search(q["terms"], q["k"])  # warm the row-group cache
    lat_local = []
    for q in qset:
        tq = time.time()
        local.search(q["terms"], q["k"])
        lat_local.append((time.time() - tq) * 1000.0)

    # msearch: the whole query set in ONE fan-out round vs the
    # sequential per-query loop above (same results, fewer RPCs)
    tq = time.time()
    searcher.msearch([q["terms"] for q in qset], 10)
    msearch_sec = time.time() - tq

    results["query_latency"] = {
        "n_queries": len(qset),
        "msearch_batch_ms": round(msearch_sec * 1000.0, 2),
        "msearch_speedup": round((lat_ms.sum() / 1000.0)
                                 / max(msearch_sec, 1e-9), 1),
        "p50_ms": round(float(np.percentile(lat_ms, 50)), 2),
        "p99_ms": round(float(np.percentile(lat_ms, 99)), 2),
        "qps": round(len(qset) / (lat_ms.sum() / 1000.0), 1),
        "p50_ms_inprocess": round(float(np.percentile(lat_local, 50)), 2),
        "p99_ms_inprocess": round(float(np.percentile(lat_local, 99)), 2),
        "actor_rtt_p50_ms": round(float(np.percentile(rtt, 50)), 2),
        "wand_pruning": searcher.query_stats(),
    }
    queries_sec["bm25_query_set"] = round(lat_ms.sum() / 1000.0, 3)
    # free the shard actors' CPU slots — on an 8-cpu run a lingering
    # 8-actor pool starves every later Ray Data stage (deadlock)
    searcher.shutdown()

    # ---- 2b. lifecycle: delta apply + both compaction paths ----------
    # (separate dict — not part of suite_sec, so the headline stays
    # comparable across rounds; skipped in --build-only scaling runs)
    if build_only:
        results["queries"] = queries_sec
        results["suite_sec"] = round(sum(queries_sec.values()), 2)
        ray.shutdown()
        return results
    import pyarrow as pa

    from mee_ray import manifest as mf_
    from mee_ray.delta import apply_delta
    from mee_ray.merge import compact

    def _ev(rows):
        cols = ("seq", "type", "repo", "path", "commit", "lang", "content")
        return pa.table({c: pa.array([r.get(c) for r in rows])
                         for c in cols})

    ins = [{"seq": i + 1, "type": "INSERT", "repo": "bench/delta",
            "path": f"d{i}.py", "commit": "e" * 40, "lang": "python",
            "content": f"def bench_delta_{i}(): return bench_tok_{i}\n"}
           for i in range(100)]
    tq = time.time()
    apply_delta(_ev(ins), index_root)
    delta_sec = time.time() - tq
    tq = time.time()
    compact(index_root, "bench.c1", gc_old=True)   # insert-only: fast path
    compact_fast_sec = time.time() - tq
    doc0 = pq.read_table(mf_.docs_files(index_root, "bench.c1")[0],
                         columns=["repo", "path"]).slice(0, 1)
    apply_delta(_ev([{"seq": 1000, "type": "DELETE",
                      "repo": doc0["repo"][0].as_py(),
                      "path": doc0["path"][0].as_py()}]), index_root)
    tq = time.time()
    compact(index_root, "bench.c2", gc_old=True)   # delete: full rewrite
    compact_rewrite_sec = time.time() - tq
    results["lifecycle"] = {
        "delta_apply_sec": round(delta_sec, 3),
        "compact_fastpath_sec": round(compact_fast_sec, 3),
        "compact_rewrite_sec": round(compact_rewrite_sec, 3),
    }

    # ---- 3. headline pipeline slice at sf_dir ------------------------
    if not build_only:
        import __ray_entry__ as entry_mod
        qs = entry_mod.queries()
        for name in ("q1_pricing_summary", "doc_term_df", "knn_bruteforce",
                     "minhash_lsh_candidates", "tumbling_window_events"):
            tq = time.time()
            res = qs[name](sf_dir)
            if hasattr(res, "materialize"):
                res.materialize()
            queries_sec[name] = round(time.time() - tq, 3)

    # ---- 4. extras: newer flagship pipelines, timed OUTSIDE the
    # headline so suite_sec stays comparable across rounds -------------
    if not build_only:
        extras = {}
        for name in ("corpus_to_training_shards", "neardup_gram_clusters",
                     "substring_dedup_spans_documents",
                     "bpe_tokenize_documents", "dsir_weights_documents",
                     "quality_training_mix_documents",
                     "semdedup_embeddings", "gopher_rules_documents",
                     "rrf_hybrid_topk", "multimodal_wav_real",
                     "multimodal_png_real"):
            tq = time.time()
            res = qs[name](sf_dir)
            if hasattr(res, "materialize"):
                res.materialize()
            extras[name] = round(time.time() - tq, 3)
        results["extras"] = extras

    results["queries"] = queries_sec
    results["suite_sec"] = round(sum(queries_sec.values()), 2)
    ray.shutdown()
    return results


def main() -> None:
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

    if "--scaling" in sys.argv:
        import subprocess
        levels = [int(x) for x in
                  os.environ.get("MEE_SCALING_LEVELS", "4,16").split(",")]
        corpus_dir(SCALING_FILES)  # generate once; subprocesses reuse it
        best: dict[int, dict] = {}
        # interleaved min-of-2: system-level noise (co-tenant load,
        # page-cache state) drifts over minutes, so alternating levels
        # and keeping each level's fastest rep is the fair comparison
        for _rep in range(2):
            for n in levels:
                env = dict(os.environ, RAY_GRAFT_CPUS=str(n),
                           MEE_BENCH_FILES=str(SCALING_FILES))
                r = subprocess.run([sys.executable, __file__, "--build-only"],
                                   env=env,
                                   capture_output=True, text=True, check=True,
                                   cwd=os.path.dirname(os.path.abspath(__file__)))
                res = json.loads(r.stdout.strip().splitlines()[-1])
                cur = best.get(n)
                if cur is None or (res["index_build"]["build_sec"]
                                   < cur["index_build"]["build_sec"]):
                    best[n] = res
        lo, hi = min(levels), max(levels)
        fps_lo = best[lo]["index_build"]["files_per_sec"]
        fps_hi = best[hi]["index_build"]["files_per_sec"]
        eff = (fps_hi / fps_lo) / (hi / lo)
        print(json.dumps({
            "metric": f"index_build_scaling_{lo}_to_{hi}_cpus",
            "n_files": SCALING_FILES,
            f"files_per_sec_{lo}": fps_lo, f"files_per_sec_{hi}": fps_hi,
            f"build_sec_{lo}": best[lo]["index_build"]["build_sec"],
            f"build_sec_{hi}": best[hi]["index_build"]["build_sec"],
            "scaling_efficiency": round(eff, 3),
            f"query_p50_ms_{hi}": best[hi]["query_latency"]["p50_ms"],
            f"query_p99_ms_{hi}": best[hi]["query_latency"]["p99_ms"],
        }))
        return

    r = run_suite(sf_dir, num_cpus, build_only="--build-only" in sys.argv)
    print(json.dumps({
        "metric": "index_build_plus_query_suite",
        "value": r["suite_sec"],
        "unit": "sec",
        "queries": r["queries"],
        "sf": sf_dir,
        "num_cpus": num_cpus,
        "index_build": r["index_build"],
        "query_latency": r["query_latency"],
        "lifecycle": r.get("lifecycle"),
        "extras": r.get("extras"),
    }))


if __name__ == "__main__":
    main()
