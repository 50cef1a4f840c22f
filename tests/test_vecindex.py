"""Persisted vector-index lifecycle: build → search → delta →
compact, exactness vs brute force at full probe depth."""

import numpy as np
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"
N_CLUSTERS = 8


def _brute(base: dict[int, np.ndarray], q: np.ndarray, k: int):
    """Replicates the index's storage pipeline bit-for-bit: vectors
    unit-normalized in float64, QUANTIZED to float32 at rest, widened
    back to float64 for the dot — so scores compare exactly."""
    q = q / (np.linalg.norm(q) or 1.0)
    ids = np.array(sorted(base), dtype=np.int64)
    mat = np.stack([base[i] for i in ids])
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    mat = mat.astype(np.float32).astype(np.float64)
    sc = mat @ q
    order = np.lexsort((ids, -sc))[:k]
    return [(int(ids[i]), float(sc[i])) for i in order]


@pytest.fixture(scope="module")
def vec_index(ray_session, tmp_path_factory):
    import pyarrow.parquet as pq
    import ray.data

    from mee_ray.vecindex import build_vector_index

    root = str(tmp_path_factory.mktemp("vecidx")) + "/index"
    ds = ray.data.read_parquet(f"{SF}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    build_vector_index(ds, root, "ep1", n_clusters=N_CLUSTERS)

    t = pq.read_table(f"{SF}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    base = {int(v): np.asarray(e, dtype=np.float64)
            for v, e in zip(t["vec_id"].to_pylist(),
                            t["embedding"].to_pylist())}
    return {"root": root, "base": base}


def test_full_probe_is_exact_and_partial_probe_recalls(vec_index):
    from mee_ray.vecindex import VectorSearcher

    s = VectorSearcher(vec_index["root"])
    base = vec_index["base"]
    rng = np.random.default_rng(5)
    dim = len(next(iter(base.values())))
    hits = total = 0
    for _ in range(10):
        q = rng.normal(size=dim)
        want = _brute(base, q, 10)
        got = s.search(q, k=10, nprobe=N_CLUSTERS)
        assert [(d, round(x, 12)) for d, x in got] == \
            [(d, round(x, 12)) for d, x in want]
        part = {d for d, _ in s.search(q, k=10, nprobe=2)}
        hits += len(part & {d for d, _ in want})
        total += 10
    assert hits / total >= 0.5, f"nprobe=2 recall {hits/total:.2f}"


def test_delta_upsert_delete_and_compact(vec_index, ray_session):
    from mee_ray.vecindex import (VectorSearcher, apply_vector_delta,
                                  compact_vector_index)

    root = vec_index["root"]
    base = dict(vec_index["base"])
    dim = len(next(iter(base.values())))
    rng = np.random.default_rng(9)

    new_vec = rng.normal(size=dim)
    moved_id = sorted(base)[0]
    moved_vec = rng.normal(size=dim)
    dead_id = sorted(base)[1]

    ev = pa.table({
        "op": pa.array(["UPSERT", "UPSERT", "DELETE"]),
        "vec_id": pa.array([10_001, moved_id, dead_id], pa.int64()),
        "embedding": pa.array(
            [list(map(float, new_vec)), list(map(float, moved_vec)),
             None], pa.list_(pa.float64())),
    })
    rec = apply_vector_delta(ev, root)
    assert rec["n_upserts"] == 2 and rec["n_deletes"] == 1

    base[10_001] = new_vec
    base[moved_id] = moved_vec
    del base[dead_id]

    s = VectorSearcher(root)
    for _ in range(6):
        q = rng.normal(size=dim)
        want = _brute(base, q, 10)
        got = s.search(q, k=10, nprobe=N_CLUSTERS)
        assert [(d, round(x, 12)) for d, x in got] == \
            [(d, round(x, 12)) for d, x in want]

    # the dead id never surfaces, the new one does (as top hit for
    # its own vector)
    assert s.search(base[10_001], k=1, nprobe=N_CLUSTERS)[0][0] == 10_001
    allr = s.search(rng.normal(size=dim), k=len(base) + 10,
                    nprobe=N_CLUSTERS)
    assert dead_id not in {d for d, _ in allr}

    compact_vector_index(root, "ep2")
    s2 = VectorSearcher(root)
    assert s2.m["epoch"] == "ep2" and not s2.m["deltas"]
    for _ in range(6):
        q = rng.normal(size=dim)
        assert s2.search(q, k=10, nprobe=N_CLUSTERS) == \
            s.search(q, k=10, nprobe=N_CLUSTERS)
    assert s2.m["n_vectors"] == len(base)
