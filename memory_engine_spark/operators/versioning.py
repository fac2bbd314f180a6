"""Versioning: append-only revision log, snapshots, history, revert.

Reference: /root/reference/memory_core/versioning/revision_manager.py —
every node/edge create/update/delete logged (:55-195) with
(change_id, object_type, object_id, change_type, old_data, new_data,
timestamp); periodic snapshots every ``changes_threshold=100`` changes
(:41-54, 197-236); history per object (:290-321); revert (:322-407).

Spark-first: revisions are an append-only Parquet table (the classic
Delta-style change log); snapshots are materialized table versions.
State reconstruction "as of" a revision is a window top-1 over the log
applied to the snapshot base — no row-at-a-time replay.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

REVISION_SCHEMA = ("change_id string, object_type string, object_id string, "
                   "change_type string, old_data string, new_data string, "
                   "seq long, timestamp double")

CHANGES_THRESHOLD = 100  # revision_manager.py:41-54


class RevisionLog:
    """Append-only revision log over a directory of Parquet parts."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        os.makedirs(path, exist_ok=True)
        self._seq = self._max_seq() + 1

    def _log_dir(self) -> str:
        return os.path.join(self.path, "revisions")

    def _exists(self) -> bool:
        d = self._log_dir()
        return os.path.isdir(d) and any(f.endswith(".parquet") for f in os.listdir(d))

    def _max_seq(self) -> int:
        if not self._exists():
            return -1
        return self.read().agg(F.max("seq")).first()[0] or 0

    def read(self) -> DataFrame:
        if not self._exists():
            return self.spark.createDataFrame([], REVISION_SCHEMA)
        return self.spark.read.parquet(self._log_dir())

    def log_changes(self, rows: list[dict]) -> None:
        """Append a batch of changes (revision_manager.py:55-195). Each
        dict: object_type, object_id, change_type, old_data, new_data."""
        now = time.time()
        payload = []
        for r in rows:
            payload.append((
                str(uuid.uuid4()), r["object_type"], r["object_id"],
                r["change_type"],
                json.dumps(r.get("old_data"), sort_keys=True),
                json.dumps(r.get("new_data"), sort_keys=True),
                self._seq, now,
            ))
            self._seq += 1
        df = self.spark.createDataFrame(payload, REVISION_SCHEMA)
        df.write.mode("append").parquet(self._log_dir())

    def history(self, object_id: str) -> DataFrame:
        """Per-object change history, newest first (revision_manager.py:290-321)."""
        return self.read().filter(F.col("object_id") == object_id) \
            .orderBy(F.col("seq").desc())

    # -- snapshots ----------------------------------------------------------
    def snapshot(self, name: str, table: DataFrame) -> str:
        """Materialize a table version (revision_manager.py:197-236)."""
        dest = os.path.join(self.path, "snapshots", name)
        table.write.mode("overwrite").parquet(dest)
        return dest

    def read_snapshot(self, name: str) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.path, "snapshots", name))

    def should_snapshot(self, changes_since_last: int,
                        threshold: int = CHANGES_THRESHOLD) -> bool:
        return changes_since_last >= threshold

    # -- state reconstruction ------------------------------------------------
    def state_as_of(self, seq: int, object_type: str,
                    base: DataFrame | None = None,
                    id_col: str = "object_id") -> DataFrame:
        """Reconstruct object state at log position ``seq`` (inclusive):
        latest new_data per object with change ≤ seq, minus deletes —
        the revert primitive (revision_manager.py:322-407) expressed as
        one window top-1 instead of row-at-a-time replay.
        Returns (object_id, data JSON string)."""
        log = self.read().filter(
            (F.col("object_type") == object_type) & (F.col("seq") <= seq))
        w = Window.partitionBy("object_id").orderBy(F.col("seq").desc())
        latest = (log.withColumn("rn", F.row_number().over(w)).filter("rn = 1")
                  .filter(F.col("change_type") != "delete")
                  .select(F.col("object_id"), F.col("new_data").alias("data")))
        return latest


def evolution_report(log: RevisionLog, period_days: int = 30) -> DataFrame:
    """Evolution analytics over the revision log
    (enhanced_mcp_endpoint.py:1499-1589): created/updated/deleted counts
    per fixed-length period. One groupBy over the append-only log."""
    df = log.read()
    period = F.floor(F.col("timestamp") / (period_days * 86400)).cast("long")
    return (
        df.groupBy(period.alias("period"))
        .agg(F.sum(F.when(F.col("change_type") == "create", 1).otherwise(0))
             .alias("n_created"),
             F.sum(F.when(F.col("change_type") == "update", 1).otherwise(0))
             .alias("n_updated"),
             F.sum(F.when(F.col("change_type") == "delete", 1).otherwise(0))
             .alias("n_deleted"))
        .orderBy("period")
    )


def versioned_upsert(log: RevisionLog, existing: DataFrame, updates: DataFrame,
                     key: str, object_type: str) -> DataFrame:
    """Versioned mutation (db/versioned_graph_adapter.py:38-283): log the
    change rows, then apply the MERGE. The log write is driver-side for
    the small update batches the reference handles; bulk paths should
    write the log DataFrame directly."""
    from memory_engine_spark.operators.merging import upsert

    old = {r[key]: r.asDict() for r in
           existing.join(updates.select(key), key, "left_semi").collect()}
    changes = []
    for r in updates.collect():
        d = r.asDict()
        oid = str(d[key])
        changes.append({
            "object_type": object_type, "object_id": oid,
            "change_type": "update" if d[key] in old else "create",
            "old_data": old.get(d[key]), "new_data": d,
        })
    log.log_changes(changes)
    return upsert(existing, updates, key)
