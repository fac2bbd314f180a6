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
from pyspark.sql import functions as F
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


def streaming_hll_registers(events: DataFrame, col: str,
                            group_cols: list[str] | None = None,
                            p: int = 8) -> DataFrame:
    """Streaming HyperLogLog: maintain the portable HLL register state
    (functions/sketch.py primitives — md5 index + bin() rank) as a
    STREAMING aggregation, the canonical unbounded distinct-count at
    scale. Per (group, register) the state is one int (the max rank):
    ≤ 2**p rows per group TOTAL no matter how many events flow
    through, and the aggregation is map-side combinable, so the state
    store never grows with cardinality. Emit in update mode and fold
    registers to the estimate batch-side (``hll_estimate_from_
    registers``) — chaining a second stateful agg in one streaming
    query is the anti-pattern Structured Streaming forbids.

    Streaming == batch by construction: the register rows equal
    ``sketch.hll_count_distinct``'s pre-fold partials on the same data
    (tested), so an estimate from a live stream can be cross-checked
    against the batch oracle at any point.
    """
    from pyspark.sql import functions as F

    from ..functions.sketch import _md5_word, hll_rank

    m = 1 << p
    gcols = list(group_cols or [])
    c = F.col(col)
    return (events.filter(c.isNotNull())
            .select(*gcols,
                    (_md5_word(c, 1) % m).alias("reg"),
                    hll_rank(_md5_word(c, 9)).alias("rank"))
            .groupBy(*gcols, "reg")
            .agg(F.max("rank").alias("max_rank")))


def hll_estimate_from_registers(regs: DataFrame,
                                group_cols: list[str] | None = None,
                                p: int = 8) -> DataFrame:
    """Fold (group, reg, max_rank) register rows — batch table or a
    micro-batch snapshot of ``streaming_hll_registers`` — into the
    HLL estimate. Mirrors ``sketch.hll_count_distinct``'s fold exactly
    (same α, same linear-counting small-range correction, same 4-dp
    round), so streaming and batch estimates are bit-identical."""
    from pyspark.sql import functions as F

    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    gcols = list(group_cols or [])
    agg = (regs.groupBy(*gcols)
           .agg(F.sum(F.pow(F.lit(2.0), -F.col("max_rank"))).alias("_s"),
                F.count(F.lit(1)).alias("_n")))
    v = F.lit(m) - F.col("_n")
    raw = F.lit(alpha * m * m) / (F.col("_s") + v.cast("double"))
    est = F.when((raw <= F.lit(2.5 * m)) & (v > 0),
                 F.lit(float(m)) * F.log(F.lit(float(m)) / v.cast("double"))
                 ).otherwise(raw)
    return agg.select(*gcols, F.round(est, 4).alias("hll_estimate"))


def stream_interval_join(left: DataFrame, right: DataFrame, key: str,
                         left_ts: str = "ts", right_ts: str = "ts",
                         within_s: int = 3600,
                         watermark_s: int = 7200,
                         how: str = "inner") -> DataFrame:
    """Watermarked stream-stream join (the state-store-backed
    enrichment join Structured Streaming is built for): left and right
    streams pair on ``key`` when the right event lands within
    ±``within_s`` of the left event. Both sides carry a
    ``watermark_s`` watermark, and the time-range predicate is what
    lets Spark EVICT join state — without it the state store grows
    forever, the stream-stream-join version of an unbounded shuffle.
    The reference's event system correlates events only within one
    process (event_system.py pub/sub); this is the cross-stream
    correlation upgrade. Right columns come back prefixed ``r_`` to
    keep the joined schema collision-free.

    ``how = "left_outer"`` adds the null-padded-when-provably-
    unmatched semantics: a left row emits with null right columns
    only once the watermark passes the end of its ±within_s match
    window (before that a matching right event could still arrive),
    so outer results trail the watermark — the q236 drain pushes the
    watermark past end-of-data with a sentinel to flush them. Same
    state-store shape as inner; eviction unchanged.
    """
    lw = left.withWatermark(left_ts, f"{watermark_s} seconds").alias("l")
    rw = (right.select(F.col(key).alias(f"r_{key}"),
                       F.col(right_ts).alias(f"r_{right_ts}"),
                       *[F.col(c).alias(f"r_{c}") for c in right.columns
                         if c not in (key, right_ts)])
          .withWatermark(f"r_{right_ts}", f"{watermark_s} seconds")
          .alias("r"))
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.r_{key}"))
        & (F.col(f"r.r_{right_ts}")
           >= F.col(f"l.{left_ts}") - F.expr(f"INTERVAL {within_s} SECONDS"))
        & (F.col(f"r.r_{right_ts}")
           <= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {within_s} SECONDS"))
    )
    return lw.join(rw, cond, how).drop(f"r_{key}")
