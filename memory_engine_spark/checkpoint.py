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

import threading

from pyspark.sql import DataFrame

# The id-diff below (snapshot → checkpoint → snapshot) is only correct
# if no OTHER thread checkpoints inside the window: EventBus
# run_subscriber*(once=False) streams run foreachBatch callbacks on
# separate threads that also call lc_tracked, and a checkpoint
# performed by query B between A's two snapshots would land in A's id
# set — A's lc_free would then unpersist B's still-live
# lineage-truncated blocks, an unrecoverable missing-block failure
# (round-8 ADVICE). One driver-side lock serializes the window; the
# checkpoint itself (block materialization) is a driver-blocking call
# anyway, so the lock adds no real contention.
_LC_LOCK = threading.Lock()


def lc_tracked(df: DataFrame, eager: bool = True
               ) -> tuple[DataFrame, set]:
    """``localCheckpoint`` plus the JVM RDD ids it pinned (id-diff
    around the call — lazy checkpoints register their RDD immediately,
    before materialization; the module lock makes the diff atomic
    against concurrent checkpointers). Free with ``lc_free`` once the
    frame is provably dead — it is UNUSABLE afterwards (the checkpoint
    truncated its lineage, so there is nothing to recompute from)."""
    sc = df.sparkSession.sparkContext
    with _LC_LOCK:
        before = {e.getKey()
                  for e in sc._jsc.getPersistentRDDs().entrySet().toArray()}
        out = df.localCheckpoint(eager=eager)
        ids = {e.getKey()
               for e in sc._jsc.getPersistentRDDs().entrySet().toArray()
               } - before
    return out, ids


def lc(df: DataFrame) -> DataFrame:
    """``localCheckpoint`` under ``_LC_LOCK``, for call sites that do
    NOT need the freed-id set. The id-diff in ``lc_tracked`` is only
    atomic if EVERY checkpoint in the process takes the same lock — a
    direct ``.localCheckpoint()`` on another thread (operator code
    running inside a subscriber's foreachBatch) would register its
    persistent RDD inside someone else's diff window and get
    unpersisted by THEIR ``lc_free`` while still live (round-9
    ADVICE). All package-internal checkpoints therefore route through
    here (``.transform(lc)``) or through ``lc_tracked``; the lock adds
    no real contention because checkpoint materialization is a
    driver-blocking call anyway."""
    with _LC_LOCK:
        return df.localCheckpoint()


def lc_lazy(df: DataFrame) -> DataFrame:
    """``localCheckpoint(eager=False)`` under ``_LC_LOCK`` — lazy
    checkpoints register their RDD immediately too, so they need the
    same serialization as ``lc``."""
    with _LC_LOCK:
        return df.localCheckpoint(eager=False)


def lc_free(spark, ids: set) -> None:
    """Drop the checkpoint blocks behind ``lc_tracked`` ids."""
    if not ids:
        return
    for e in spark.sparkContext._jsc.getPersistentRDDs() \
            .entrySet().toArray():
        if e.getKey() in ids:
            e.getValue().unpersist(False)
