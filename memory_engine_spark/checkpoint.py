"""Tracked ``localCheckpoint`` lifecycle helpers.

``Dataset.unpersist()`` NEVER frees localCheckpoint blocks: a
checkpointed Dataset has no CacheManager entry, so the only handle is
the JVM persistent-RDD map keyed by RDD id. These helpers diff that
map around the checkpoint call so callers can free the blocks
deterministically instead of waiting for ContextCleaner GC — the
round-7 fix for the identical-plan CacheManager collision lives on
this pattern (see SCALING.md "CacheManager collision").

Shared by ``operators/graph.py`` (BFS frontiers, resident adjacency)
and ``streaming/events.py`` (DLQ compaction swaps) — previously the
DLQ path called ``capped.unpersist(False)`` which was a silent no-op,
leaving ~DLQ_CAP rows of checkpoint blocks pinned per compaction
(round-7 ADVICE).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def lc_tracked(df: DataFrame, eager: bool = True
               ) -> tuple[DataFrame, set]:
    """``localCheckpoint`` plus the JVM RDD ids it pinned (id-diff
    around the call — lazy checkpoints register their RDD immediately,
    before materialization). Free with ``lc_free`` once the frame is
    provably dead — it is UNUSABLE afterwards (the checkpoint
    truncated its lineage, so there is nothing to recompute from)."""
    sc = df.sparkSession.sparkContext
    before = {e.getKey()
              for e in sc._jsc.getPersistentRDDs().entrySet().toArray()}
    out = df.localCheckpoint(eager=eager)
    ids = {e.getKey()
           for e in sc._jsc.getPersistentRDDs().entrySet().toArray()} - before
    return out, ids


def lc_free(spark, ids: set) -> None:
    """Drop the checkpoint blocks behind ``lc_tracked`` ids."""
    if not ids:
        return
    for e in spark.sparkContext._jsc.getPersistentRDDs() \
            .entrySet().toArray():
        if e.getKey() in ids:
            e.getValue().unpersist(False)
