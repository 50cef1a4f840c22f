"""Merge scheduler — the engine's SyncService-side housekeeping brain.

The reference leaves compaction implicit (Elasticsearch merges its own
segments); here the engine owns segments, so something must decide WHEN
the delta log has grown enough that queries pay too much overlay cost
and a log-structured merge should fold it into a fresh epoch
(SURVEY.md §3.4, §7.3: "merge scheduler (singleton actor holding merge
queue)").

Two forms, same policy object:

* :func:`maybe_compact` — driver-side, call after each
  ``apply_delta``; returns the new manifest if a merge ran.
* :class:`MergeScheduler` — a named detached Ray actor (singleton per
  index root) owning the merge queue: ``notify()`` after each delta,
  and merges run inside the actor so concurrent writers can't start
  two compactions of the same index (the mutual-exclusion role the
  reference gives its Redis redlock, updateservice.py:158-188).

Policy (size-tiered, LSM-flavored): merge when the delta log has
``max_deltas`` entries, OR the deltas' live-row churn exceeds
``max_churn_ratio`` of the base doc count — both bound the per-query
overlay work (extra delta-segment chunk probes + tombstone filter).
"""

from __future__ import annotations

from dataclasses import dataclass

from mee_ray import manifest as mf
from mee_ray.config import EngineConfig
from mee_ray.merge import compact


@dataclass(frozen=True)
class MergePolicy:
    max_deltas: int = 8          # delta-log length bound
    max_churn_ratio: float = 0.2  # (added+deleted) / base n_docs
    # Epoch GC on the AUTOMATIC path defaults OFF: deleting the
    # predecessor right after the CURRENT flip yanks files out from
    # under in-flight queries and pools that haven't polled
    # stale()/refresh() yet.  Leave old epochs for an explicit
    # gc_epochs() sweep once readers have moved (epochs are immutable,
    # so keeping them costs only disk).
    gc_old: bool = False


def should_compact(manifest: dict, policy: MergePolicy) -> bool:
    deltas = manifest.get("deltas", [])
    if not deltas:
        return False
    if len(deltas) >= policy.max_deltas:
        return True
    churn = sum(d["n_added"] + d["n_deleted"] for d in deltas)
    base = max(1, manifest.get("n_docs", 1))
    return churn / base >= policy.max_churn_ratio


def _next_epoch_name(manifest: dict) -> str:
    """Deterministic successor epoch name (epoch lineage stays readable:
    ep1 → ep1.c1 → ep1.c2 …)."""
    cur = manifest["epoch"]
    base, _, n = cur.rpartition(".c")
    if base and n.isdigit():
        return f"{base}.c{int(n) + 1}"
    return f"{cur}.c1"


def maybe_compact(index_root: str, cfg: EngineConfig | None = None,
                  policy: MergePolicy | None = None) -> dict | None:
    """Driver-side scheduler step: compact iff the policy says so.
    Returns the new manifest or None."""
    policy = policy or MergePolicy()
    manifest = mf.load_manifest(index_root)
    if not should_compact(manifest, policy):
        return None
    # cfg=None → compact reconstructs the config from the manifest
    return compact(index_root, _next_epoch_name(manifest),
                   cfg, gc_old=policy.gc_old)


class MergeScheduler:
    """Singleton merge actor per index root.

    Use ``MergeScheduler.get(index_root)`` to create-or-fetch the named
    detached actor, then ``actor.notify.remote()`` after each delta:
    the actor re-reads the manifest, applies the policy, and runs the
    merge inside itself — serializing compactions exactly like the
    reference's Redis lock serializes status transitions."""

    def __init__(self, index_root: str, cfg: EngineConfig | None = None,
                 policy: MergePolicy | None = None):
        self.index_root = index_root
        self.cfg = cfg  # None → per-merge reconstruction from manifest
        self.policy = policy or MergePolicy()
        self.merges_run = 0

    def notify(self) -> str | None:
        """Called after a delta lands. Returns the new epoch if a merge
        ran (merges execute serially inside this actor)."""
        got = maybe_compact(self.index_root, self.cfg, self.policy)
        if got is None:
            return None
        self.merges_run += 1
        return got["epoch"]

    def stats(self) -> dict:
        manifest = mf.load_manifest(self.index_root)
        return {"epoch": manifest["epoch"],
                "pending_deltas": len(manifest.get("deltas", [])),
                "merges_run": self.merges_run}

    @staticmethod
    def get(index_root: str, cfg: EngineConfig | None = None,
            policy: MergePolicy | None = None):
        """Create-or-fetch the named detached scheduler actor for this
        index root (one per root, cluster-wide)."""
        import hashlib

        import ray

        name = "mee_merge_" + hashlib.sha256(
            index_root.encode()).hexdigest()[:12]
        try:
            return ray.get_actor(name)
        except ValueError:
            Actor = ray.remote(num_cpus=0)(MergeScheduler)
            return Actor.options(name=name, lifetime="detached",
                                 get_if_exists=True).remote(
                index_root, cfg, policy)
