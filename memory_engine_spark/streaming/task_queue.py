"""Async task queue: prioritized, retried, metered background work.

Reference: /root/reference/memory_core/processing/async_queue_processor.py
— TaskStatus (:23-31), TaskPriority (:33-41), QueueTask with expiry
(:43-76), QueueMetrics throughput (:78-95), TaskProcessor registry keyed
by supported task types (:97-152), asyncio workers draining a priority
queue with per-task retries.

Spark-first: the queue is an APPEND-ONLY parquet log of state-change
rows; the current state of every task is a window top-1 over the log
(the same pattern as operators/versioning.RevisionLog). Submission,
completion, and retry are all log appends — no in-place mutation, so
concurrent SUBMITTERS are safe. ``claim`` is a read-then-append and is
NOT atomic across consumers: run one claiming worker (the reference's
processor is likewise a single drain loop), or accept at-least-once
processing with idempotent processors. Processors receive a whole
claimed BATCH as a DataFrame (set-oriented, not task-at-a-time) and
return (task_id, result, error) rows.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from memory_engine_spark.checkpoint import lc as _lc
from pyspark.sql.window import Window

TASK_STATUSES = ["pending", "processing", "completed", "failed", "retrying",
                 "expired", "cancelled"]
# async_queue_processor.py:33-41 — larger number = more urgent
TASK_PRIORITIES = {"low": 0, "normal": 1, "high": 2, "critical": 3}

_SCHEMA = ("task_id string, task_type string, payload string, "
           "priority int, status string, attempts int, max_retries int, "
           "result string, error string, submitted_at double, "
           "expires_at double, seq long, ts double")


class TaskQueue:
    """Parquet-log task queue with priority claim, retry, and expiry."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        os.makedirs(path, exist_ok=True)
        self.processors: dict[str, Callable[[DataFrame], DataFrame]] = {}

    def register_processor(self, task_type: str,
                           fn: Callable[[DataFrame], DataFrame]) -> None:
        """``fn`` maps a claimed-batch DataFrame (task_id, task_type,
        payload, priority, attempts) to (task_id, result, error) rows —
        error non-null marks the task failed (retried up to
        max_retries)."""
        self.processors[task_type] = fn

    # -- log plumbing -------------------------------------------------------
    def _log_dir(self) -> str:
        return os.path.join(self.path, "log")

    def _exists(self) -> bool:
        d = self._log_dir()
        return os.path.isdir(d) and any(f.endswith(".parquet") for f in os.listdir(d))

    def _read_log(self) -> DataFrame:
        if not self._exists():
            return self.spark.createDataFrame([], _SCHEMA)
        return self.spark.read.parquet(self._log_dir())

    def _append(self, rows: list[tuple]) -> None:
        self.spark.createDataFrame(rows, _SCHEMA).write.mode("append") \
            .parquet(self._log_dir())

    def _append_df(self, df: DataFrame) -> None:
        df.write.mode("append").parquet(self._log_dir())

    def current_state(self) -> DataFrame:
        """Latest row per task (window top-1 on seq,ts), with lazy expiry:
        pending/retrying tasks past expires_at read as 'expired'
        (async_queue_processor.py:70-76)."""
        log = self._read_log()
        w = Window.partitionBy("task_id").orderBy(F.col("seq").desc(),
                                                  F.col("ts").desc())
        latest = (log.withColumn("_rn", F.row_number().over(w))
                  .filter("_rn = 1").drop("_rn"))
        expired = (F.col("status").isin("pending", "retrying")
                   & F.col("expires_at").isNotNull()
                   & (F.col("expires_at") < F.lit(time.time())))
        return latest.withColumn(
            "status", F.when(expired, "expired").otherwise(F.col("status")))

    # -- producer side ------------------------------------------------------
    def submit(self, task_type: str, payload: dict, priority: str = "normal",
               max_retries: int = 3, ttl_s: float | None = None) -> str:
        task_id = str(uuid.uuid4())
        now = time.time()
        self._append([(
            task_id, task_type, json.dumps(payload, sort_keys=True),
            TASK_PRIORITIES[priority], "pending", 0, max_retries,
            None, None, now,
            (now + ttl_s) if ttl_s is not None else None, 0, now,
        )])
        return task_id

    def submit_batch(self, tasks: list[tuple[str, dict, str]],
                     max_retries: int = 3,
                     ttl_s: float | None = None) -> list[str]:
        """Set-oriented submission: one log append for N tasks
        (``tasks`` = [(task_type, payload, priority), ...]). At scale
        submission is a batch write, not a per-task round trip — the
        reference's enqueue loop (async_queue_processor.py:154-170)
        amortized into a single parquet append. ``submitted_at`` gets a
        strictly increasing per-task offset so FIFO-within-priority
        stays a total order even when the clock doesn't tick between
        tasks."""
        now = time.time()
        ids = [str(uuid.uuid4()) for _ in tasks]
        self._append([
            (tid, ttype, json.dumps(payload, sort_keys=True),
             TASK_PRIORITIES[priority], "pending", 0, max_retries,
             None, None, now + i * 1e-6,
             (now + ttl_s) if ttl_s is not None else None, 0, now)
            for i, (tid, (ttype, payload, priority))
            in enumerate(zip(ids, tasks))
        ])
        return ids

    def cancel(self, task_id: str) -> None:
        self._transition([task_id], "cancelled")

    def _transition(self, task_ids: list[str], status: str,
                    results: dict[str, str] | None = None,
                    errors: dict[str, str] | None = None,
                    bump_attempts: bool = False) -> None:
        state = self.current_state().filter(F.col("task_id").isin(task_ids))
        out = state.select(
            "task_id", "task_type", "payload", "priority",
            F.lit(status).alias("status"),
            (F.col("attempts") + (1 if bump_attempts else 0)).alias("attempts"),
            "max_retries",
            F.lit(None).cast("string").alias("result") if results is None
            else F.coalesce(*[F.when(F.col("task_id") == k, F.lit(v))
                              for k, v in results.items()],
                            F.col("result")).alias("result"),
            F.lit(None).cast("string").alias("error") if errors is None
            else F.coalesce(*[F.when(F.col("task_id") == k, F.lit(v))
                              for k, v in errors.items()],
                            F.lit(None).cast("string")).alias("error"),
            "submitted_at", "expires_at",
            (F.col("seq") + 1).alias("seq"),
            F.lit(time.time()).alias("ts"),
        )
        self._append_df(out)

    # -- consumer side ------------------------------------------------------
    def claim(self, batch_size: int = 100) -> DataFrame:
        """Claim up to batch_size runnable tasks in (priority desc,
        submitted_at asc) order; marks them 'processing'. Returns the
        claimed batch."""
        runnable = self.current_state().filter(
            F.col("status").isin("pending", "retrying"))
        batch = (runnable.orderBy(F.col("priority").desc(),
                                  F.col("submitted_at").asc(),
                                  F.col("task_id").asc())
                 .limit(batch_size).transform(_lc))
        ids = [r["task_id"] for r in batch.select("task_id").collect()]
        if ids:
            self._transition(ids, "processing", bump_attempts=True)
        return batch.select("task_id", "task_type", "payload", "priority",
                            "attempts", "max_retries")

    def process_available(self, batch_size: int = 100) -> dict:
        """Claim a batch and run each task type's registered processor
        over its sub-batch (set-oriented). Failures retry until
        max_retries then fail terminally. Returns counts."""
        batch = self.claim(batch_size)
        rows = batch.collect()  # bounded by batch_size by construction
        counts = {"completed": 0, "failed": 0, "retrying": 0, "unroutable": 0}
        by_type: dict[str, list] = {}
        for r in rows:
            by_type.setdefault(r["task_type"], []).append(r)
        for ttype, trows in by_type.items():
            fn = self.processors.get(ttype)
            ids = [r["task_id"] for r in trows]
            if fn is None:
                self._transition(ids, "failed",
                                 errors=dict.fromkeys(ids, "no processor"))
                counts["unroutable"] += len(ids)
                continue
            sub = batch.filter(F.col("task_type") == ttype)
            try:
                results = {r["task_id"]: r for r in fn(sub).collect()}
            except Exception as exc:  # noqa: BLE001 — queue must survive
                results = {i: {"task_id": i, "result": None,
                               "error": f"processor crashed: {exc}"} for i in ids}
            ok = [i for i in ids if results.get(i) is not None
                  and results[i]["error"] is None]
            if ok:
                self._transition(ok, "completed",
                                 results={i: results[i]["result"] for i in ok})
                counts["completed"] += len(ok)
            # batch the failure transitions by target status: one log
            # scan + one append per status, not one per task
            retry_errs, fail_errs = {}, {}
            for r in trows:
                i = r["task_id"]
                if i in ok:
                    continue
                err = (results[i]["error"] if results.get(i) is not None
                       else "no result returned")
                if r["attempts"] < r["max_retries"]:
                    retry_errs[i] = err
                else:
                    fail_errs[i] = err
            if retry_errs:
                self._transition(list(retry_errs), "retrying", errors=retry_errs)
                counts["retrying"] += len(retry_errs)
            if fail_errs:
                self._transition(list(fail_errs), "failed", errors=fail_errs)
                counts["failed"] += len(fail_errs)
        return counts

    def metrics(self) -> dict:
        """QueueMetrics analogue (:78-95): per-status counts + avg
        processing attempts of completed tasks."""
        state = self.current_state()
        rows = state.groupBy("status").agg(F.count(F.lit(1)).alias("n")).collect()
        out = {f"n_{s}": 0 for s in TASK_STATUSES}
        for r in rows:
            out[f"n_{r['status']}"] = r["n"]
        done = state.filter(F.col("status") == "completed")
        avg = done.agg(F.avg("attempts")).first()[0]
        out["avg_attempts_to_complete"] = round(avg, 3) if avg is not None else None
        return out
