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

    def log_changes_df(self, changes: DataFrame) -> int:
        """Append a change DataFrame with columns (object_type,
        object_id, change_type, old_data, new_data) WITHOUT collecting to
        the driver — the bulk path. seq is assigned via row_number over
        object_id (a single-partition window; a log batch is one commit's
        worth of changes, so the total order is the point, not a
        bottleneck); change_id/timestamp are expression-side. Returns the
        number of rows appended."""
        n = changes.count()
        if n == 0:
            return 0
        w = Window.orderBy("object_id")
        out = changes.select(
            F.expr("uuid()").alias("change_id"),
            "object_type", "object_id", "change_type",
            F.coalesce(F.col("old_data"), F.lit("null")).alias("old_data"),
            F.coalesce(F.col("new_data"), F.lit("null")).alias("new_data"),
            (F.row_number().over(w).cast("long") + F.lit(self._seq - 1)).alias("seq"),
            F.lit(time.time()).alias("timestamp"),
        )
        out.write.mode("append").parquet(self._log_dir())
        self._seq += n
        return n

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

        ``base`` (optional snapshot with columns (id_col, data)): objects
        that exist ONLY in the snapshot — no log entry ≤ seq at all —
        are carried through via an anti-join; any object the log touches
        takes its state (or deletion) from the log.
        Returns (object_id, data JSON string)."""
        log = self.read().filter(
            (F.col("object_type") == object_type) & (F.col("seq") <= seq))
        w = Window.partitionBy("object_id").orderBy(F.col("seq").desc())
        top = log.withColumn("rn", F.row_number().over(w)).filter("rn = 1")
        latest = (top.filter(F.col("change_type") != "delete")
                  .select(F.col("object_id"), F.col("new_data").alias("data")))
        if base is None:
            return latest
        untouched = (
            base.select(F.col(id_col).cast("string").alias("object_id"),
                        F.col("data").cast("string").alias("data"))
            .join(log.select("object_id"), "object_id", "left_anti")
        )
        return latest.unionByName(untouched)


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
    change rows, then apply the MERGE. The change log is derived entirely
    DataFrame-side (matched-existing ⋈ updates, old/new rendered with
    to_json) and appended via ``log_changes_df`` — nothing but the batch
    row count touches the driver, so the bulk path scales."""
    from memory_engine_spark.operators.merging import upsert

    matched = existing.join(updates.select(key), key, "left_semi")
    old_json = matched.select(
        F.col(key).cast("string").alias("object_id"),
        F.to_json(F.struct(*[F.col(c) for c in matched.columns])).alias("old_data"))
    changes = (
        updates.select(
            F.col(key).cast("string").alias("object_id"),
            F.to_json(F.struct(*[F.col(c) for c in updates.columns])).alias("new_data"))
        .join(old_json, "object_id", "left")
        .select(
            F.lit(object_type).alias("object_type"), "object_id",
            F.when(F.col("old_data").isNotNull(), "update").otherwise("create")
            .alias("change_type"),
            "old_data", "new_data")
    )
    log.log_changes_df(changes)
    return upsert(existing, updates, key)
