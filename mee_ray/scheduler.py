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

Policy (size-tiered, LSM-flavored) — the four debts the delta log
accumulates, each with its own trigger:

* ``max_deltas``: every query eagerly merges a term's delta chunks
  into one stream (wand._merge_delta_chunks), so latency grows with
  the delta count;
* ``max_churn_ratio``: total row churn vs the base bounds overlay
  work as a whole;
* ``tombstone_ratio``: pending tombstones force the exhaustive
  (non-WAND) scoring path — the single costliest debt;
* ``delta_bytes_ratio``: delta segments are encoded per small batch
  (worse compression, more files); when they rival the base in bytes
  a fold roughly halves read amplification.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from mee_ray import manifest as mf
from mee_ray.config import EngineConfig
from mee_ray.merge import CompactTargetExists, compact


@dataclass(frozen=True)
class MergePolicy:
    max_deltas: int = 8           # delta-log length bound
    max_churn_ratio: float = 0.2  # (added+deleted) / base n_docs
    tombstone_ratio: float = 0.1  # deleted / base n_docs
    delta_bytes_ratio: float = 0.5  # delta seg bytes / base seg bytes
    # Epoch GC on the AUTOMATIC path defaults OFF: deleting the
    # predecessor right after the CURRENT flip yanks files out from
    # under in-flight queries and pools that haven't polled
    # stale()/refresh() yet.  Leave old epochs for an explicit
    # gc_epochs() sweep once readers have moved (epochs are immutable,
    # so keeping them costs only disk).
    gc_old: bool = False


def should_compact(manifest: dict, policy: MergePolicy
                   ) -> tuple[bool, str]:
    """Evaluate the policy against one manifest.  Returns
    (decision, reason) — reason names the tripped trigger or says why
    not, so operators can log it."""
    deltas = manifest.get("deltas", [])
    if not deltas:
        return False, "no deltas"
    if len(deltas) >= policy.max_deltas:
        return True, f"delta count {len(deltas)} >= {policy.max_deltas}"
    base = max(1, int(manifest.get("n_docs", 1)))
    n_tomb = sum(int(d.get("n_deleted", 0)) for d in deltas)
    if n_tomb / base >= policy.tombstone_ratio:
        return True, (f"tombstones {n_tomb}/{base} >= "
                      f"{policy.tombstone_ratio:.2f} "
                      "(exhaustive-path tax)")
    churn = sum(int(d.get("n_added", 0)) + int(d.get("n_deleted", 0))
                for d in deltas)
    if churn / base >= policy.max_churn_ratio:
        return True, (f"churn {churn}/{base} >= "
                      f"{policy.max_churn_ratio:.2f}")
    base_b = sum(int(s.get("bytes", 0))
                 for s in manifest.get("segments", []))
    delta_b = 0
    for d in deltas:
        for f in d.get("segments", []):
            try:
                delta_b += os.path.getsize(f)
            except OSError:
                pass
    if base_b and delta_b / base_b >= policy.delta_bytes_ratio:
        return True, (f"delta bytes {delta_b}/{base_b} >= "
                      f"{policy.delta_bytes_ratio:.2f}")
    return False, (f"below thresholds ({len(deltas)} deltas, "
                   f"{n_tomb} tombstones, {churn} churn, "
                   f"{delta_b} delta bytes)")


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
    decision, reason = should_compact(manifest, policy)
    if not decision:
        return None
    try:
        # cfg=None → compact reconstructs the config from the manifest
        out = compact(index_root, _next_epoch_name(manifest),
                      cfg, gc_old=policy.gc_old)
    except CompactTargetExists:
        # a concurrent scheduler step beat us to the same target name:
        # the delta log this step meant to fold is already folded (or
        # folding under the lock we just released) — nothing to do
        return None
    out["compact_reason"] = reason
    return out


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
