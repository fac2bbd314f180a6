"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference tracks per-event processing status across time
(PENDING→IN_PROGRESS→PROCESSED/…, /root/reference/memory_core/
orchestrator/event_system.py:88-98) and dedupes work items by id in its
async queue (/root/reference/memory_core/processing/
async_queue_processor.py). In Structured Streaming that cross-batch
memory is GroupState: this module implements the two canonical stateful
shapes —

- ``streaming_dedup``: drop events whose key was already seen, with a
  processing-time state TTL (bounded state, the at-most-once guard the
  reference's queue gives within a process, here across micro-batches
  and restarts via checkpointed state).
- ``running_counts``: per-key running aggregates that survive batches.

Both are Arrow-batched per group; state is a tiny tuple per key.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def streaming_dedup(events: DataFrame, key_col: str = "event_id",
                    ttl_ms: int | None = None) -> DataFrame:
    """First occurrence of each key passes; later ones drop. ``events``
    must be a STREAMING DataFrame.

    ``ttl_ms`` bounds state via a processing-time timeout — use it with
    CONTINUOUS triggers (state size = key arrival rate × TTL). Leave it
    None for availableNow/drain runs: a pending processing-time timeout
    keeps an availableNow query alive re-running empty batches until the
    TTL fires, so TTL mode never terminates under drain semantics."""
    out_schema = events.schema
    timeout = (GroupStateTimeout.ProcessingTimeTimeout if ttl_ms
               else GroupStateTimeout.NoTimeout)

    def fn(key: tuple, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        seen = state.exists
        first = None
        for pdf in pdfs:
            if not seen and len(pdf) > 0 and first is None:
                first = pdf.iloc[:1]
        if not seen:
            state.update((1,))
            if ttl_ms:
                state.setTimeoutDuration(ttl_ms)
            if first is not None:
                yield first

    return (events.groupBy(key_col)
            .applyInPandasWithState(fn, out_schema, "seen int",
                                    "append", timeout))


def running_counts(events: DataFrame, key_col: str = "user_id") -> DataFrame:
    """Per-key running event count + value sum across all micro-batches
    (the reference's per-subscriber counters, event_system.py metrics)."""
    def fn(key: tuple, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].fillna(0.0).sum())
        state.update((n, total))
        yield pd.DataFrame({"key": [key[0]], "n": [n], "value_sum": [total]})

    return (events.groupBy(key_col)
            .applyInPandasWithState(fn, "key long, n long, value_sum double",
                                    "n long, value_sum double",
                                    "update",
                                    GroupStateTimeout.NoTimeout))


def windowed_counts(events: DataFrame, ts_col: str = "ts",
                    window: str = "10 minutes", slide: str | None = None,
                    watermark: str | None = "30 minutes",
                    group_cols: tuple[str, ...] = ()) -> DataFrame:
    """Watermarked tumbling (or sliding) event-time aggregation — the
    canonical Structured Streaming shape for late data: a window's
    count is emitted (append mode) only once the watermark passes its
    end, and events arriving later than ``watermark`` behind the
    max-seen event time are DROPPED rather than reopening state. State
    is bounded by watermark horizon × window count, independent of
    stream length — the property that matters at 100 TB/day. Works on
    batch frames too (watermark ignored by Spark).

    Returns (window_start, window_end, *group_cols, n).
    """
    from pyspark.sql import functions as F

    src = events
    if watermark is not None and events.isStreaming:
        src = events.withWatermark(ts_col, watermark)
    w = (F.window(F.col(ts_col), window, slide) if slide
         else F.window(F.col(ts_col), window))
    return (src.groupBy(w.alias("w"), *[F.col(c) for c in group_cols])
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.col("w.start").alias("window_start"),
                    F.col("w.end").alias("window_end"), *group_cols, "n"))


def session_aggregates(events: DataFrame, key_col: str, ts_col: str,
                       gap: str = "30 minutes",
                       watermark: str | None = "1 hour") -> DataFrame:
    """Native session-window aggregation (the streaming counterpart of
    operators/temporal.sessionize): Spark's ``session_window`` merges
    events of a key whose gaps stay under ``gap`` and closes the session
    once the watermark passes its end — exactly the hypertable/session
    semantics, with state bounded by the watermark instead of a TTL
    heuristic. Works on BATCH frames too (watermark ignored), which the
    tests use to assert parity with the window-function sessionizer.
    Returns (key, session_start, session_end, n_events)."""
    from pyspark.sql import functions as F

    src = events
    if watermark is not None and events.isStreaming:
        src = events.withWatermark(ts_col, watermark)
    return (src.groupBy(F.session_window(F.col(ts_col), gap).alias("w"),
                        F.col(key_col))
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select(key_col, F.col("w.start").alias("session_start"),
                    F.col("w.end").alias("session_end"), "n_events"))
