"""Event-stream processing: micro-batch subscriber pipelines, rate
limiting, dead-letter queue with retries, replay-from-timestamp.

Reference: /root/reference/memory_core/orchestrator/event_system.py —
typed pub/sub with predicate filters (:551-693), micro-batching flush on
``batch_size=10`` OR ``flush_interval=1.0s`` (:304-353), throttling to
``max_events_per_second=100`` (:355-375), persistence + replay
``load_events(from_timestamp)`` (:377-450), dead-letter queue capped at
1000 with ``max_retries=3`` (:453-489, :88-98,169-196).

The reference has NO event-time semantics (no watermarks) — only
processing-time micro-batches and replay (SURVEY.md §2.9). Structured
Streaming covers this exactly: file source → filtered streaming queries
(= subscribers) → ``foreachBatch`` handlers with try/except routing
failures to a DLQ table, ``maxFilesPerTrigger``/processing-time triggers
as the batching knobs, and checkpointing for replay/exactly-once.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENT_SCHEMA = ("event_id long, ts timestamp, user_id long, event_type string, "
                "value double, props string")

MAX_RETRIES = 3          # event_system.py:108
DLQ_CAP = 1000           # event_system.py:453-489
DEFAULT_BATCH_SIZE = 10  # event_system.py:307
DEFAULT_RATE_LIMIT = 100  # events/s, event_system.py:358


@dataclass
class Subscriber:
    """Typed subscription with an optional predicate filter
    (event_system.py:551-693)."""

    name: str
    handler: Callable[[DataFrame, int], None]
    event_types: list[str] | None = None
    predicate: str | None = None  # SQL expression

    def apply_filters(self, df: DataFrame) -> DataFrame:
        out = df
        if self.event_types:
            out = out.filter(F.col("event_type").isin(self.event_types))
        if self.predicate:
            out = out.filter(F.expr(self.predicate))
        return out


class EventBus:
    """File-backed event bus: publishers append Parquet to ``events_dir``;
    each subscriber is one streaming query over it. The DLQ is a Parquet
    side-output written inside foreachBatch (retry bookkeeping included).
    """

    def __init__(self, spark: SparkSession, root: str,
                 schema: str = EVENT_SCHEMA):
        self.spark = spark
        self.root = root
        self.schema = schema
        self.events_dir = os.path.join(root, "events")
        self.dlq_dir = os.path.join(root, "dlq")
        self.checkpoints = os.path.join(root, "checkpoints")
        os.makedirs(self.events_dir, exist_ok=True)

    # -- publish -------------------------------------------------------------
    def publish(self, df: DataFrame) -> None:
        df.write.mode("append").parquet(self.events_dir)

    # -- subscribe (streaming) -------------------------------------------------
    def stream(self, max_files_per_trigger: int | None = None) -> DataFrame:
        reader = self.spark.readStream.schema(self.schema)
        if max_files_per_trigger:
            reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
        return reader.parquet(self.events_dir)

    def run_subscriber(self, sub: Subscriber, once: bool = True,
                       max_files_per_trigger: int | None = None):
        """Run a subscriber as a micro-batch streaming query. Handler
        failures send the WHOLE batch to the DLQ with retry metadata
        (event_system.py:88-98: PENDING→…→DEAD_LETTER is per-event in
        the reference; batch-granular here because Spark retries are
        batch-granular)."""
        filtered_src = self.stream(max_files_per_trigger)

        def process(batch_df: DataFrame, batch_id: int) -> None:
            batch = sub.apply_filters(batch_df)
            attempt = 0
            while True:
                try:
                    sub.handler(batch, batch_id)
                    return
                except Exception as exc:  # noqa: BLE001 — DLQ any handler error
                    attempt += 1
                    if attempt > MAX_RETRIES:
                        self._dead_letter(batch, sub.name, str(exc))
                        return

        writer = (filtered_src.writeStream
                  .foreachBatch(process)
                  .option("checkpointLocation",
                          os.path.join(self.checkpoints, sub.name)))
        if once:
            writer = writer.trigger(availableNow=True)
        else:
            writer = writer.trigger(processingTime="1 second")
        query = writer.start()
        if once:
            query.awaitTermination()
        return query

    # -- DLQ -------------------------------------------------------------------
    def _dead_letter(self, batch: DataFrame, sub_name: str, error: str) -> None:
        (batch.withColumn("_subscriber", F.lit(sub_name))
         .withColumn("_error", F.lit(error))
         .withColumn("_retries", F.lit(MAX_RETRIES))
         .withColumn("_dlq_ts", F.lit(time.time()))
         .write.mode("append").parquet(self.dlq_dir))

    def dead_letters(self) -> DataFrame:
        if not os.path.isdir(self.dlq_dir):
            return self.spark.createDataFrame(
                [], self.schema + ", _subscriber string, _error string, "
                                  "_retries int, _dlq_ts double")
        return self.spark.read.parquet(self.dlq_dir).limit(DLQ_CAP)

    def retry_dead_letters(self, sub: Subscriber) -> int:
        """Manual DLQ retry (event_system.py:477-489): re-run the handler
        over dead-lettered rows; on success they are cleared."""
        dl = self.dead_letters().filter(F.col("_subscriber") == sub.name)
        rows = dl.drop("_subscriber", "_error", "_retries", "_dlq_ts")
        n = rows.count()
        if n:
            sub.handler(rows, -1)
            # Atomic swap: rewrite the surviving rows to a temp dir
            # (executor-side, never collected), then rename into place.
            # A crash at any step leaves a complete DLQ either at
            # dlq_dir or at the .bak path a retry will clear.
            import shutil
            remaining = self.dead_letters().filter(
                F.col("_subscriber") != sub.name).localCheckpoint()
            tmp, bak = self.dlq_dir + ".tmp", self.dlq_dir + ".bak"
            shutil.rmtree(tmp, ignore_errors=True)
            shutil.rmtree(bak, ignore_errors=True)
            remaining.write.mode("overwrite").parquet(tmp)
            os.rename(self.dlq_dir, bak)
            os.rename(tmp, self.dlq_dir)
            shutil.rmtree(bak, ignore_errors=True)
        return n

    # -- replay ------------------------------------------------------------------
    def replay(self, from_timestamp) -> DataFrame:
        """Replay persisted events from a timestamp
        (event_system.py:377-450; CLI `events replay --from-timestamp`,
        README.md:205). Batch read — partition/filter pushdown applies."""
        return (self.spark.read.schema(self.schema).parquet(self.events_dir)
                .filter(F.col("ts") >= F.lit(from_timestamp)))


def rate_limited_batches(df: DataFrame, events_per_second: int = DEFAULT_RATE_LIMIT,
                         batch_seconds: float = 1.0,
                         order_cols: tuple[str, ...] = ("ts",)) -> DataFrame:
    """Throttling plan (event_system.py:355-375): assign each event a
    processing slot so no 1-second slot exceeds the rate; purely
    declarative (row_number over arrival order → slot = n // rate).
    Returns df + (slot long).

    ``order_cols`` should include a unique tiebreak (e.g. the event id)
    when timestamps can collide — row_number over a non-total order is
    partition-order-dependent. The global window is a single-partition
    sort by design: throttling is inherently a sequential admission
    plan, and the frame it runs over is one subscriber's pending batch,
    not the corpus."""
    from pyspark.sql.window import Window

    w = Window.orderBy(*order_cols)
    rn = F.row_number().over(w) - 1
    return df.withColumn("slot", F.floor(rn / F.lit(int(events_per_second * batch_seconds))).cast("long"))
