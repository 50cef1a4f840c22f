"""Build-stage resume must not adopt outputs of a DIFFERENT config.

The resumable build short-circuits on completed stages (_state.json +
lineage sidecars).  A rerun of the same epoch with different
output-affecting parameters (sharding, tokenizer, codec, ...) must
clear and rebuild — otherwise the manifest records the new config
against files routed by the old one and queries silently miss
postings (the _reindex_src/_compact_src fingerprint rule, applied to
plain builds)."""

import json
import os

import pyarrow.parquet as pq

from mee_ray import manifest as mf
from mee_ray.build import build_index
from mee_ray.config import EngineConfig, TokenizerConfig
from mee_ray.corpus import write_corpus
from mee_ray.ids import doc_id_of
from mee_ray.oracle import OracleIndex
from mee_ray.query import Searcher


def test_rerun_with_different_config_rebuilds(ray_session, tmp_path):
    import ray.data
    cdir = write_corpus(str(tmp_path / "corpus"), n_files=40, seed=91,
                        rows_per_file=40)
    root = str(tmp_path / "index")
    build_index(ray.data.read_parquet(cdir), root, "ep1",
                EngineConfig(num_shards=2, parts_per_shard=2))
    m1 = mf.load_manifest(root)
    assert m1["num_shards"] == 2 and len(m1["segments"]) >= 1

    # rerun the SAME epoch with different sharding: stage outputs must
    # be invalidated, not adopted
    cfg2 = EngineConfig(num_shards=3, parts_per_shard=1)
    build_index(ray.data.read_parquet(cdir), root, "ep1", cfg2)
    m2 = mf.load_manifest(root)
    assert m2["num_shards"] == 3 and m2["parts_per_shard"] == 1
    # every surviving segment file's part number fits the NEW layout
    for s in m2["segments"]:
        part = int(os.path.basename(s["path"]).split("-")[1].split(".")[0])
        assert part < 3, s["path"]
    # and the index answers queries correctly under the new routing
    t = pq.read_table(cdir)
    live = {}
    for r, p, c, content in zip(t["repo"].to_pylist(),
                                t["path"].to_pylist(),
                                t["commit"].to_pylist(),
                                t["content"].to_pylist()):
        if (r, p) not in live or c > live[(r, p)][0]:
            live[(r, p)] = (c, content)
    oi = OracleIndex([(doc_id_of(r, p, c), content)
                      for (r, p), (c, content) in live.items()],
                     tok_cfg=cfg2.tokenizer)
    s = Searcher(root)
    for q in (["def"], ["return", "import"], ["self"]):
        assert s.search(q, 10) == oi.search(q, 10), q

    # the fingerprint file records the effective config and survives
    # as housekeeping (fsck_repair must not treat it as debris)
    fp = os.path.join(mf.epoch_dir(root, "ep1"), "_build_cfg.json")
    assert os.path.exists(fp)
    with open(fp) as f:
        assert json.load(f)["num_shards"] == 3
    mf.fsck_repair(root)
    assert os.path.exists(fp)


def test_rerun_same_config_resumes(ray_session, tmp_path):
    """Identical config (even with different execution-only knobs)
    keeps completed stages — the resume path stays usable."""
    import ray.data
    cdir = write_corpus(str(tmp_path / "corpus"), n_files=20, seed=92,
                        rows_per_file=30)
    root = str(tmp_path / "index")
    cfg = EngineConfig(num_shards=2, parts_per_shard=1)
    build_index(ray.data.read_parquet(cdir), root, "ep1", cfg)
    st = os.path.join(mf.epoch_dir(root, "ep1"), "_state.json")
    with open(st) as f:
        stages_before = json.load(f)
    # different batching knob, same outputs → stages NOT invalidated
    cfg_same = EngineConfig(num_shards=2, parts_per_shard=1,
                            tokenize_batch_size=64)
    build_index(ray.data.read_parquet(cdir), root, "ep1", cfg_same)
    with open(st) as f:
        stages_after = json.load(f)
    for name, rec in stages_before.items():
        assert stages_after[name] == rec, name


def test_shuffle_waves_identity(ray_session, tmp_path):
    """cfg.shuffle_waves partitions THE pass-2 exchange by its own key
    (part % waves), so a 3-wave build must produce BYTE-identical
    segments (same per-part sha256 lineage) and rank-identical queries
    vs the single-wave build — the lever that fits the 15.36M-doc
    shuffle into bounded spill disk."""
    import ray.data

    from mee_ray.build import build_index
    from mee_ray.config import EngineConfig
    from mee_ray.corpus import write_corpus
    from mee_ray.query import Searcher

    from mee_ray.ids import doc_id_of
    from mee_ray.oracle import OracleIndex, make_query_set

    cdir = write_corpus(str(tmp_path / "c"), n_files=600, seed=31,
                        rows_per_file=150)
    # (a) BYTE identity: with dynamic salting off, part routing is a
    # pure function of (term, static salt) and the encode sorts each
    # part — wave count cannot change a single segment byte.  (With
    # dynamic salting ON, the fired set depends on task batch slices,
    # which legitimately differ between executions — the query side
    # handles the mixed layout; that path is covered by (b).)
    m = {}
    roots = {}
    for waves in (1, 3):
        root = str(tmp_path / f"idx{waves}")
        cfg = EngineConfig(shuffle_waves=waves, hot_df_threshold=0)
        m[waves] = build_index(ray.data.read_parquet(cdir), root,
                               "ep1", cfg)
        roots[waves] = root
    assert m[1]["n_docs"] == m[3]["n_docs"] > 0
    sha1 = {os.path.basename(r["path"]): r["sha256"]
            for r in m[1]["segments"]}
    sha3 = {os.path.basename(r["path"]): r["sha256"]
            for r in m[3]["segments"]}
    assert sha1 == sha3 and len(sha1) > 0

    # (b) RANK identity vs the oracle with dynamic salting + shuffle
    # dedup on — the 15.36M configuration
    root_d = str(tmp_path / "idxd")
    cfg = EngineConfig(shuffle_waves=3, hot_df_threshold=50,
                       dedup_mode="shuffle")
    md3 = build_index(ray.data.read_parquet(cdir), root_d, "ep1", cfg)
    # total postings = Σ (term, doc) pairs — invariant to HOW salting
    # fires, so any wave-filter drop/duplication shows up here even
    # when dynamic salting makes segment bytes legitimately differ
    md1 = build_index(
        ray.data.read_parquet(cdir), str(tmp_path / "idxd1"), "ep1",
        EngineConfig(shuffle_waves=1, hot_df_threshold=50,
                     dedup_mode="shuffle"))
    assert (sum(r["n_postings"] for r in md3["segments"])
            == sum(r["n_postings"] for r in md1["segments"]) > 0)
    t = pq.read_table(cdir, columns=["repo", "path", "commit",
                                     "content"])
    live = {}
    for r_, p_, c_, content in zip(t["repo"].to_pylist(),
                                   t["path"].to_pylist(),
                                   t["commit"].to_pylist(),
                                   t["content"].to_pylist()):
        if (r_, p_) not in live or c_ > live[(r_, p_)][0]:
            live[(r_, p_)] = (c_, content)
    docs = [(doc_id_of(r_, p_, c_), content)
            for (r_, p_), (c_, content) in live.items()]
    oi = OracleIndex(docs)
    sd = Searcher(root_d)
    for q in make_query_set(docs, n_queries=30, seed=4):
        assert sd.search(q["terms"], q["k"]) == \
            oi.search(q["terms"], q["k"])
