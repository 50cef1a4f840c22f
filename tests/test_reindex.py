"""store_source (ES _source) + reindex (ES _reindex): a source-enabled
index carries raw content in its docs table — across deltas and
compaction — and can rebuild itself under a brand-new config,
rank-identical to an oracle built with that new config over the live
documents."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from mee_ray import manifest as mf
from mee_ray.build import build_index, reindex
from mee_ray.config import EngineConfig, TokenizerConfig
from mee_ray.corpus import write_corpus
from mee_ray.delta import apply_delta
from mee_ray.ids import doc_id_of
from mee_ray.oracle import OracleIndex
from mee_ray.query import Searcher


@pytest.fixture(scope="module")
def src_index(ray_session, tmp_path_factory):
    import ray.data
    root = str(tmp_path_factory.mktemp("src_idx"))
    cdir = write_corpus(f"{root}/corpus", n_files=120, seed=31,
                        rows_per_file=60)
    cfg = EngineConfig(num_shards=2, parts_per_shard=2,
                       store_source=True)
    build_index(ray.data.read_parquet(cdir), f"{root}/index", "ep1", cfg)
    t = pq.read_table(cdir)
    live = {}
    for r, p, c, content in zip(t["repo"].to_pylist(),
                                t["path"].to_pylist(),
                                t["commit"].to_pylist(),
                                t["content"].to_pylist()):
        key = (r, p)
        if key not in live or c > live[key][0]:
            live[key] = (c, content)
    return {"root": f"{root}/index", "live": live, "cfg": cfg}


def test_source_stored_and_get_doc(src_index):
    s = Searcher(src_index["root"])
    assert s.manifest["store_source"] is True
    (repo, path), (commit, content) = next(iter(
        sorted(src_index["live"].items())))
    row = s.get_doc(repo, path)
    assert row["content"] == content
    # every docs file carries the column
    for f in mf.docs_files(src_index["root"], "ep1"):
        assert "content" in pq.read_schema(f).names


def test_reindex_new_config_rank_identity(src_index, ray_session,
                                          tmp_path):
    """Delta the index, then reindex under a different sharding +
    positions + tokenizer config: results must equal an oracle built
    with the NEW tokenizer over the live docs, and phrase queries
    (impossible on the old positions-less index) must now work."""
    import shutil
    root = str(tmp_path / "index")
    shutil.copytree(src_index["root"], root)
    live = dict(src_index["live"])

    keys = sorted(live)[:4]
    ev = []
    seq = 1
    for k in keys[:2]:
        c = f"def reindexedFn_{seq}():\n    return reindex_marker\n"
        ev.append({"seq": seq, "type": "UPDATE", "repo": k[0],
                   "path": k[1], "commit": "d" * 40, "lang": "python",
                   "content": c})
        live[k] = ("d" * 40, c)
        seq += 1
    for k in keys[2:4]:
        ev.append({"seq": seq, "type": "DELETE", "repo": k[0],
                   "path": k[1], "commit": None, "lang": None,
                   "content": None})
        live.pop(k)
        seq += 1
    cols = ("seq", "type", "repo", "path", "commit", "lang", "content")
    apply_delta(pa.table({n: pa.array([e[n] for e in ev])
                          for n in cols}), root)

    # delta added-docs must carry source on a source-enabled index
    man = mf.load_manifest(root)
    add_f = man["deltas"][0]["added_docs"]
    assert "content" in pq.read_schema(add_f).names

    new_tok = TokenizerConfig(split_identifiers=False,
                              emit_full_token=True, subtoken_ngram=0)
    new_cfg = EngineConfig(num_shards=3, parts_per_shard=2,
                           store_positions=True, store_source=True,
                           tokenizer=new_tok)
    m2 = reindex(root, "ep2", new_cfg)
    assert m2["epoch"] == "ep2"
    assert mf.current_epoch(root) == "ep2"
    assert m2["n_docs"] == len(live)
    # watermark covers the folded events: a stale redelivery is a no-op
    assert m2["event_watermark"] == seq - 1

    oi = OracleIndex([(doc_id_of(r, p, c), content)
                      for (r, p), (c, content) in live.items()],
                     tok_cfg=new_tok, store_positions=True)
    s = Searcher(root)
    for terms in (["def"], ["reindex_marker"], ["return", "import"]):
        assert s.search(terms, 10) == oi.search(terms, 10), terms
    # positions exist now: phrase works on the reindexed epoch
    ph = s.search_phrase(["reindex_marker"], 10)
    assert ph == oi.search_phrase(["reindex_marker"], 10)
    # source survived the rebuild
    (repo, path) = next(iter(sorted(live)))
    assert s.get_doc(repo, path)["content"] == live[(repo, path)][1]


def test_reindex_refuses_sourceless(built_index, ray_session, tmp_path):
    import shutil
    root = str(tmp_path / "index")
    shutil.copytree(built_index["index_root"], root)
    with pytest.raises(ValueError, match="store_source"):
        reindex(root, "ep2")


def test_compact_preserves_source(src_index, ray_session, tmp_path):
    """The tombstone-filtering docs rewrite keeps the content column."""
    import shutil

    from mee_ray.merge import compact
    root = str(tmp_path / "index")
    shutil.copytree(src_index["root"], root)
    live = dict(src_index["live"])
    k = sorted(live)[0]
    apply_delta(pa.table({
        "seq": pa.array([1], pa.int64()),
        "type": pa.array(["DELETE"]),
        "repo": pa.array([k[0]]), "path": pa.array([k[1]]),
        "commit": pa.array([None], pa.string()),
        "lang": pa.array([None], pa.string()),
        "content": pa.array([None], pa.string())}), root)
    live.pop(k)
    compact(root, "ep2")
    s = Searcher(root)
    assert s.manifest["epoch"] == "ep2"
    assert s.get_doc(*k) is None
    (repo, path) = next(iter(sorted(live)))
    assert s.get_doc(repo, path)["content"] == live[(repo, path)][1]
    for f in mf.docs_files(root, "ep2"):
        assert "content" in pq.read_schema(f).names


def test_reindex_rerun_folds_late_deltas(src_index, ray_session,
                                         tmp_path):
    """A delta landing after an unpublished reindex changes the
    snapshot fingerprint: the re-run clears the stale half-built epoch
    and folds the new delta into a fresh snapshot."""
    import shutil
    root = str(tmp_path / "index")
    shutil.copytree(src_index["root"], root)
    k = sorted(src_index["live"])[0]

    def ev(seq, content):
        return pa.table({
            "seq": pa.array([seq], pa.int64()),
            "type": pa.array(["UPDATE"]),
            "repo": pa.array([k[0]]), "path": pa.array([k[1]]),
            "commit": pa.array([f"{seq:040d}"]),
            "lang": pa.array(["python"]),
            "content": pa.array([content])})

    apply_delta(ev(1, "def first(): return marker_one\n"), root)
    m_built = reindex(root, "ep2", auto_publish=False)
    assert mf.current_epoch(root) == "ep1"      # unpublished
    # a late delta lands on the predecessor
    apply_delta(ev(2, "def second(): return marker_two\n"), root)
    # re-run with the SAME target epoch: fingerprint mismatch clears
    # the stale build, the fresh snapshot folds seq 2, publish works
    m2 = reindex(root, "ep2")
    assert mf.current_epoch(root) == "ep2"
    assert m2["event_watermark"] == 2
    s = Searcher(root)
    assert s.search(["marker_two"], 5)          # late delta folded
    assert not s.search(["marker_one"], 5)      # superseded content
    assert m_built["n_docs"] == m2["n_docs"]


def test_update_by_query_end_to_end(src_index, ray_session, tmp_path):
    """update_by_query transforms every matching doc's stored content,
    the index reflects it (oracle-identical), unchanged rows are
    skipped, and a re-run of the same transform is a pure no-op (the
    deterministic content-hash version key)."""
    import shutil

    from mee_ray.delta import update_by_query
    root = str(tmp_path / "index")
    shutil.copytree(src_index["root"], root)
    live = dict(src_index["live"])

    def transform(c):
        return c if "updated_marker" in c else c + "\nupdated_marker\n"

    s0 = Searcher(root)
    matched = s0.matched_doc_ids(["def"], "or")
    rec = update_by_query(root, ["def"], transform)
    assert rec["n_matched"] == matched.size
    assert rec["n_transformed"] == matched.size   # all gained the marker
    # the index reflects the transform: every matched doc now holds
    # the marker token, and ranks equal a rebuilt oracle
    import hashlib

    from mee_ray.config import TokenizerConfig
    from mee_ray.tokenizer import Tokenizer
    tok = Tokenizer(TokenizerConfig())
    for (r, p), (c, content) in list(live.items()):
        if "def" not in tok.terms(content):
            continue                    # only MATCHING docs transform
        new = transform(content)
        if new != content:
            live[(r, p)] = (
                hashlib.sha256(new.encode()).hexdigest()[:40], new)
    oi = OracleIndex([(doc_id_of(r, p, c), content)
                      for (r, p), (c, content) in live.items()])
    s = Searcher(root)
    assert s.count(["updated_marker"]) == len(matched)
    for terms in (["updated_marker"], ["def", "return"]):
        assert s.search(terms, 10) == oi.search(terms, 10), terms
    # stored source updated too (pick a transformed key)
    (r, p) = next(k for k in sorted(live)
                  if "updated_marker" in live[k][1])
    assert s.get_doc(r, p)["content"].endswith("updated_marker\n")

    # idempotence: same transform again → nothing changes
    rec2 = update_by_query(root, ["def"], transform)
    assert rec2.get("noop") is True and rec2["n_transformed"] == 0
    assert Searcher(root).count(["updated_marker"]) == len(matched)


def test_update_by_query_refuses_sourceless(built_index, ray_session,
                                            tmp_path):
    import shutil

    from mee_ray.delta import update_by_query
    root = str(tmp_path / "index")
    shutil.copytree(built_index["index_root"], root)
    with pytest.raises(ValueError, match="store_source"):
        update_by_query(root, ["def"], lambda c: c.upper())


def test_reindex_after_delete_everything(src_index, ray_session,
                                         tmp_path):
    """delete_by_query wiping every doc, compact (empty base docs
    table), one fresh INSERT, then reindex — the delta-only corpus
    path."""
    import shutil

    from mee_ray.delta import apply_delta, delete_by_query
    from mee_ray.merge import compact
    from mee_ray.query import Searcher

    root = str(tmp_path / "index")
    shutil.copytree(src_index["root"], root)
    # a token every generated doc contains: pick from one doc and
    # delete repeatedly until nothing is live
    s = Searcher(root)
    guard = 0
    while s.n_docs > 0 and guard < 50:
        vocab = [t for t in s.vocabulary() if s.term_df(t) > 0]
        delete_by_query(root, vocab[: max(1, len(vocab) // 2)] or vocab)
        s = Searcher(root)
        guard += 1
    assert s.n_docs == 0
    compact(root, "empty_epoch")                # stages ZERO docs files
    assert Searcher(root).n_docs == 0

    from mee_ray import manifest as mf
    start = mf.next_event_seq(root)
    apply_delta(pa.table({
        "seq": pa.array([start], pa.int64()),
        "type": pa.array(["INSERT"]),
        "repo": pa.array(["org_e/r"]), "path": pa.array(["src/only.py"]),
        "commit": pa.array(["9" * 40]), "lang": pa.array(["python"]),
        "content": pa.array(["def onlyDoc():\n    return only_marker\n"]),
    }), root)
    m2 = reindex(root, "re_empty")              # delta-only corpus
    assert m2["n_docs"] == 1
    s2 = Searcher(root)
    got = s2.search(["only_marker"], 5)
    assert len(got) == 1
    assert s2.get_doc("org_e/r", "src/only.py")["content"].startswith(
        "def onlyDoc")


def test_reindex_refuses_when_current_advances(src_index, ray_session,
                                               tmp_path, monkeypatch):
    """Review regression: a successor epoch published DURING the
    rebuild (e.g. a concurrent compaction) must make the locked
    publish refuse — previously only same-epoch delta growth was
    checked and the stale snapshot published anyway."""
    import shutil

    import mee_ray.build as B
    from mee_ray.merge import compact

    root = str(tmp_path / "index")
    shutil.copytree(src_index["root"], root)
    k = sorted(src_index["live"])[0]
    apply_delta(pa.table({
        "seq": pa.array([1], pa.int64()),
        "type": pa.array(["UPDATE"]),
        "repo": pa.array([k[0]]), "path": pa.array([k[1]]),
        "commit": pa.array(["1" * 40]), "lang": pa.array(["python"]),
        "content": pa.array(["def racer(): return race_marker\n"])}),
        root)

    orig = B.build_index

    def racing_build(*a, **kw):
        out = orig(*a, **kw)
        # a concurrent compaction publishes a successor mid-rebuild
        if mf.current_epoch(root) == "ep1":
            compact(root, "mid_epoch")
        return out

    monkeypatch.setattr(B, "build_index", racing_build)
    with pytest.raises(RuntimeError, match="advanced past snapshot"):
        B.reindex(root, "ep2")
    assert mf.current_epoch(root) == "mid_epoch"  # winner kept
    # the re-run (fresh snapshot of mid_epoch) succeeds
    monkeypatch.setattr(B, "build_index", orig)
    m2 = B.reindex(root, "ep3")
    assert mf.current_epoch(root) == "ep3"
    assert Searcher(root).search(["race_marker"], 5)


def test_cli_lifecycle_commands_derive_manifest_config(src_index,
                                                       tmp_path):
    """Review regression: update-by-query / reindex / auto-compact
    without --config must reconstruct the index's recorded config (a
    default EngineConfig dropped store_source on reindex and tripped
    the pin check on the others)."""
    import json
    import shutil
    import subprocess
    import sys

    REPO = __file__.rsplit("/tests/", 1)[0]
    root = str(tmp_path / "index")
    shutil.copytree(src_index["root"], root)

    r = subprocess.run(
        [sys.executable, "-m", "mee_ray", "update-by-query",
         "--index", root, "--terms", "def",
         "--pattern", "return", "--repl", "return"],   # no-op rewrite
        capture_output=True, text=True, cwd=REPO)
    assert r.returncode == 0, r.stderr[-1500:]
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["n_matched"] > 0 and out["n_transformed"] == 0

    r2 = subprocess.run(
        [sys.executable, "-m", "mee_ray", "--num-cpus", "2", "reindex",
         "--index", root, "--epoch", "cli_re"],
        capture_output=True, text=True, cwd=REPO)
    assert r2.returncode == 0, r2.stderr[-1500:]
    out2 = json.loads(r2.stdout.strip().splitlines()[-1])
    assert out2["epoch"] == "cli_re" and out2["n_docs"] > 0
    # store_source survived the config-less reindex
    assert mf.load_manifest(root, "cli_re")["store_source"] is True

    r3 = subprocess.run(
        [sys.executable, "-m", "mee_ray", "auto-compact",
         "--index", root],
        capture_output=True, text=True, cwd=REPO)
    assert r3.returncode == 0, r3.stderr[-1500:]
