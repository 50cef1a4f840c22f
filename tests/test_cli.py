"""CLI (`python -m mee_ray`) — the ray-job-submit surface."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(*args):
    r = subprocess.run([sys.executable, "-m", "mee_ray", *args],
                       capture_output=True, text=True, cwd=REPO)
    assert r.returncode == 0, r.stderr[-2000:]
    return json.loads(r.stdout.strip().splitlines()[-1])


@pytest.mark.slow
def test_cli_build_then_query(tmp_path):
    from mee_ray.corpus import write_corpus

    corpus = str(tmp_path / "corpus")
    index = str(tmp_path / "index")
    write_corpus(corpus, n_files=80, seed=21, rows_per_file=40)
    cfg = str(tmp_path / "cfg.json")
    with open(cfg, "w") as f:
        json.dump({"num_shards": 2, "parts_per_shard": 2}, f)

    out = _run("--config", cfg, "--num-cpus", "2", "build",
               "--input", corpus, "--index", index, "--epoch", "ep1")
    assert out["n_docs"] > 0 and out["segments"] > 0

    # query path needs no Ray session (in-process Searcher)
    hits = _run("query", "--index", index, "--terms", "def return", "-k", "3")
    assert len(hits["hits"]) == 3
    assert all(h["score"] > 0 for h in hits["hits"])

    met = _run("metrics", "--index", index)
    assert met["epoch"] == "ep1" and met["segments"]["n_partitions"] == 4
