import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def ray_session():
    """ONE Ray session for the whole pytest run (driver contract)."""
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    import ray.data
    ctx = ray.data.DataContext.get_current()
    ctx.enable_progress_bars = False
    yield ray
    ray.shutdown()


@pytest.fixture(scope="session")
def built_index(ray_session):
    """One built index + its oracle, shared by engine/wand tests."""
    import shutil

    import pyarrow.parquet as pq
    import ray.data

    from mee_ray.build import build_index
    from mee_ray.config import EngineConfig
    from mee_ray.corpus import write_corpus
    from mee_ray.ids import doc_id_of
    from mee_ray.oracle import OracleIndex

    ROOT = "/tmp/mee_test_engine"
    shutil.rmtree(ROOT, ignore_errors=True)
    cdir = write_corpus(f"{ROOT}/corpus", n_files=250, seed=11,
                        rows_per_file=100)
    corpus = ray.data.read_parquet(cdir)
    manifest = build_index(corpus, f"{ROOT}/index", "ep1", EngineConfig())

    t = pq.read_table(cdir)
    live = {}
    for r, p, c, content in zip(t["repo"].to_pylist(), t["path"].to_pylist(),
                                t["commit"].to_pylist(),
                                t["content"].to_pylist()):
        key = (r, p)
        if key not in live or c > live[key][0]:
            live[key] = (c, content)
    docs = [(doc_id_of(r, p, c), content)
            for (r, p), (c, content) in live.items()]
    return {"cdir": cdir, "index_root": f"{ROOT}/index",
            "manifest": manifest, "live": live, "docs": docs,
            "oracle": OracleIndex(docs)}
