"""Temporal relational operators Spark lacks natively: as-of join,
range (interval-containment) join, sessionization, hypertable-style
rollup cascade.

Motivated by the reference's temporal analytics (TEMPORAL_PROXIMITY
discovery, /root/reference/memory_core/ingestion/relationship_extractor.py
:349-369; evolution/time-bucket analytics, enhanced_mcp_endpoint.py:1336,
1499-1589) generalized to the operations a large-scale event/training
pipeline needs. Each is a composition of built-in DataFrame ops — no
UDFs, no cross joins:

- ``asof_join``: the union-and-carry formulation — tag both sides,
  sort per key by (ts, side), carry the last right row forward with
  last(ignorenulls) over an unbounded-preceding window. ONE shuffle
  (the per-key sort), exact, and skew-bounded by the key.
- ``range_join``: interval containment via bucket decomposition —
  intervals explode into the fixed-width buckets they cover, points
  join on their bucket (equi-join), exact predicate refines. Candidate
  count is |points| + Σ interval_width/bucket, never |p|×|i|.
- ``sessionize``: gap-based session ids from lag + a running sum of
  session-start flags — two window functions, one shuffle.
- ``rollup_cascade``: coarse time buckets aggregate FROM the next finer
  bucket (the continuous-aggregate / hypertable trick), so raw data is
  scanned once regardless of how many resolutions are materialized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from memory_engine_spark.checkpoint import lc as _lc
from pyspark.sql.window import Window


def sessionize(events: DataFrame, key_col: str, ts_col: str,
               gap_s: float = 1800.0, id_col: str | None = None) -> DataFrame:
    """Assign gap-based session ids: a new session starts when the time
    since the key's previous event exceeds ``gap_s``. Returns the input
    plus (session_seq, session_id). Deterministic ordering via
    (ts, id_col) when an id column is given."""
    order = [F.col(ts_col).asc()] + ([F.col(id_col).asc()] if id_col else [])
    w = Window.partitionBy(key_col).orderBy(*order)
    prev = F.lag(F.col(ts_col)).over(w)
    new_session = F.when(
        prev.isNull()
        | (F.unix_micros(F.col(ts_col)) - F.unix_micros(prev)
           > gap_s * 1_000_000), 1).otherwise(0)
    seq = F.sum(new_session).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (events.withColumn("session_seq", seq.cast("long"))
            .withColumn("session_id",
                        F.concat_ws("#", F.col(key_col).cast("string"),
                                    F.col("session_seq"))))


def session_stats(sessions: DataFrame, key_col: str, ts_col: str) -> DataFrame:
    """Per-session aggregates over a ``sessionize`` output: bounds,
    event count, duration seconds."""
    return (sessions.groupBy(key_col, "session_id")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.min(ts_col).alias("session_start"),
                 F.max(ts_col).alias("session_end"))
            .withColumn("duration_s",
                        F.round((F.unix_micros("session_end")
                                 - F.unix_micros("session_start"))
                                / 1_000_000.0, 6)))


def asof_join(left: DataFrame, right: DataFrame, key_col: str, ts_col: str,
              value_cols: list[str], tolerance_s: float | None = None,
              how: str = "left") -> DataFrame:
    """As-of join: for every left row, the LATEST right row of the same
    key with right.ts ≤ left.ts (DuckDB/kdb/pandas merge_asof backward
    semantics; ties at equal ts match).

    Union-and-carry plan: tag rows (right=0, left=1), sort per key by
    (ts, tag), carry each right value forward with last(ignorenulls)
    over unbounded-preceding — one shuffle on the key, no join at all,
    so it scales with the sort and is immune to time-range skew.
    ``tolerance_s`` nulls out matches older than the window.
    """
    if how not in ("left", "inner"):
        raise ValueError("asof_join supports how='left'|'inner'")
    lcols = [c for c in left.columns]
    l = left.select(
        *lcols, F.lit(1).alias("_side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}")
          for c in value_cols],
        F.lit(None).cast(right.schema[ts_col].dataType).alias("_r_ts"))
    r = right.select(
        *[F.col(key_col).alias(key_col) if c == key_col
          else F.col(ts_col).alias(ts_col) if c == ts_col
          else F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in lcols],
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
        F.col(ts_col).alias("_r_ts"))
    u = l.unionByName(r)
    # value columns in the sort make the carried pick deterministic when
    # several right rows share the same (key, ts)
    w = (Window.partitionBy(key_col)
         .orderBy(F.col(ts_col).asc(), F.col("_side").asc(),
                  *[F.col(f"_r_{c}").asc_nulls_first() for c in value_cols])
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = u.select(
        *lcols, "_side",
        *[F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_c_{c}")
          for c in value_cols],
        F.last("_r_ts", ignorenulls=True).over(w).alias("_c_ts"))
    out = carried.filter(F.col("_side") == 1).drop("_side")
    in_tol = F.lit(True) if tolerance_s is None else (
        (F.unix_micros(F.col(ts_col)) - F.unix_micros(F.col("_c_ts")))
        <= tolerance_s * 1_000_000)
    matched = F.col("_c_ts").isNotNull() & in_tol
    out = out.select(
        *lcols,
        *[F.when(matched, F.col(f"_c_{c}")).alias(c if c not in lcols
                                                  else f"right_{c}")
          for c in value_cols],
        F.when(matched, F.col("_c_ts")).alias("matched_ts"))
    if how == "inner":
        out = out.filter(F.col("matched_ts").isNotNull())
    return out


def range_join(points: DataFrame, intervals: DataFrame, ts_col: str,
               start_col: str, end_col: str,
               bucket_s: float = 3600.0) -> DataFrame:
    """Join each point to every interval CONTAINING it
    (start ≤ ts ≤ end) without a cross join: intervals explode into the
    fixed-width time buckets they cover; points carry their single
    bucket; candidates come from the bucket equi-join and the exact
    BETWEEN refines. Choose ``bucket_s`` near the median interval width
    so replication stays O(1) per interval."""
    us = 1_000_000
    b = F.lit(int(bucket_s * us))
    p = points.withColumn("_bkt", (F.unix_micros(F.col(ts_col)) / b)
                          .cast("long"))
    i = intervals.withColumn(
        "_bkt",
        F.explode(F.sequence((F.unix_micros(F.col(start_col)) / b).cast("long"),
                             (F.unix_micros(F.col(end_col)) / b).cast("long"))))
    return (p.join(i, "_bkt")
            .filter(F.col(ts_col).between(F.col(start_col), F.col(end_col)))
            .drop("_bkt"))


def rollup_cascade(events: DataFrame, ts_col: str, dims: list[str],
                   resolutions: list[str] = ("hour", "day", "month"),
                   value_col: str | None = None) -> DataFrame:
    """Multi-resolution time rollup (hypertable continuous-aggregate
    pattern): the finest resolution aggregates the raw events ONCE;
    every coarser resolution re-aggregates the previous level, so cost
    is O(raw + Σ level sizes) instead of O(raw × levels). Returns the
    union of levels: (resolution, bucket, *dims, n_events[, sum_value]).
    ``resolutions`` must be ordered fine → coarse."""
    aggs = [F.count(F.lit(1)).alias("n_events")]
    reaggs = [F.sum("n_events").alias("n_events")]
    if value_col is not None:
        aggs.append(F.sum(F.col(value_col).cast("decimal(28,6)"))
                    .cast("double").alias("sum_value"))
        reaggs.append(F.sum(F.col("sum_value").cast("decimal(28,6)"))
                      .cast("double").alias("sum_value"))
    fine_res = resolutions[0]
    level = (events.groupBy(
        F.date_trunc(fine_res, F.col(ts_col)).alias("bucket"), *dims)
        .agg(*aggs).transform(_lc))
    out = level.withColumn("resolution", F.lit(fine_res))
    for res in resolutions[1:]:
        level = (level.groupBy(
            F.date_trunc(res, F.col("bucket")).alias("bucket"), *dims)
            .agg(*reaggs).transform(_lc))
        out = out.unionByName(level.withColumn("resolution", F.lit(res)))
    metrics = ["n_events"] + (["sum_value"] if value_col is not None else [])
    return out.select("resolution", "bucket", *dims, *metrics)


def resample_ffill(df: DataFrame, key_col: str, ts_col: str,
                   value_cols: list[str], step_s: int) -> DataFrame:
    """Regularize an irregular time series per key: one row per
    ``step_s``-second slot from each key's first to last observation,
    values forward-filled from the most recent observation at or
    before the slot (the gap-filling step before joins/windows that
    assume a regular grid — TimescaleDB ``time_bucket_gapfill`` /
    pandas ``resample().ffill()``). Slots before a key's first
    observation don't exist (nothing to fill from); observations
    within one slot resolve to the LATEST (max ts wins, ties by the
    union order below).

    Scale shape: the dense grid comes from per-key
    sequence+explode of slot indices (first..last — never a global
    calendar cross join); grid and observations union and sort ONCE
    per key (the asof_join union-and-carry trick: a single shuffle on
    the key, then last(ignorenulls) over the per-key window carries
    values forward). Output rows = Σ_key span/step — the caller
    chooses step_s to bound it.
    """
    e = F.unix_timestamp(F.col(ts_col))
    slot = F.floor(e / step_s).cast("long")
    # _ord must be MICROsecond-resolution: the source timestamps carry
    # microseconds, and the oracle breaks same-slot ties on epoch_us —
    # whole-second _ord would tie two sub-second observations and
    # forward-fill a nondeterministic value ("max ts wins" contract)
    obs = df.select(F.col(key_col).alias("_k"), slot.alias("_slot"),
                    F.unix_micros(F.col(ts_col)).alias("_ord"),
                    *[F.col(c).alias(c) for c in value_cols])
    spans = obs.groupBy("_k").agg(F.min("_slot").alias("_lo"),
                                  F.max("_slot").alias("_hi"))
    grid = spans.select(
        "_k", F.explode(F.sequence(F.col("_lo"), F.col("_hi"))).alias("_slot"),
        F.lit(None).cast("long").alias("_ord"),
        *[F.lit(None).cast(dict(obs.dtypes)[c]).alias(c)
          for c in value_cols])
    # union-and-carry: grid rows sort AFTER same-slot observations
    # (_ord null sorts last), so the running last(ignorenulls) hands
    # each grid row the freshest observation at or before its slot
    unioned = obs.unionByName(grid)
    from pyspark.sql import Window as W
    w = (W.partitionBy("_k")
         .orderBy(F.col("_slot").asc(), F.col("_ord").asc_nulls_last())
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    filled = unioned.select(
        "_k", "_slot", "_ord",
        *[F.last(c, ignorenulls=True).over(w).alias(c)
          for c in value_cols])
    # one row per (key, slot): the grid row (null _ord) carries the
    # fully-resolved state, so it wins the dedup
    dedup_w = W.partitionBy("_k", "_slot").orderBy(
        F.col("_ord").desc_nulls_first())
    return (filled.withColumn("_rn", F.row_number().over(dedup_w))
            .filter(F.col("_rn") == 1)
            .select(F.col("_k").alias(key_col),
                    F.to_timestamp(F.col("_slot") * step_s).alias(ts_col),
                    *value_cols))


def funnel(events: DataFrame, key_col: str, ts_col: str, type_col: str,
           steps: list[str], within_s: float | None = None) -> DataFrame:
    """Ordered funnel analysis: for each key, the earliest strictly
    time-ordered completion prefix of ``steps`` (the warehouse
    MATCH_RECOGNIZE-lite / funnel chart query). Step k counts only if
    it occurs AFTER the chosen step k−1 occurrence (earliest-greedy,
    the standard funnel semantics — greedy-earliest maximizes the
    completed prefix for per-step independence); ``within_s`` bounds
    the whole journey from step 1. Returns
    (key, n_steps, step1_ts, last_ts) with n_steps = length of the
    completed prefix (keys missing step 1 are absent).

    Scale shape: one filtered (key, step) min-aggregate per funnel
    stage, each a broadcast-joined refinement of the previous — k
    small aggregates over the filtered event set, no windows over raw
    events, no self-join of the event table.
    """
    cur = (events.filter(F.col(type_col) == steps[0])
           .groupBy(F.col(key_col).alias("_k"))
           .agg(F.min(F.col(ts_col)).alias("t1"))
           .withColumn("n_steps", F.lit(1))
           .withColumn("_last", F.col("t1")))
    for i, step in enumerate(steps[1:], start=2):
        nxt = (events.filter(F.col(type_col) == step)
               .select(F.col(key_col).alias("_k"),
                       F.col(ts_col).alias("_ts")))
        cond = F.col("_ts") > F.col("_last")
        if within_s is not None:
            cond = cond & (F.unix_timestamp("_ts")
                           <= F.unix_timestamp("t1") + within_s)
        # only keys that completed step i-1 may extend to step i —
        # without this gate a key stuck at step 1 could "skip" to a
        # later stage whose event type happens to occur after t1
        live = cur.filter(F.col("n_steps") == i - 1) \
            .select("_k", "t1", "_last")
        hit = (nxt.join(live, "_k")
               .filter(cond)
               .groupBy("_k").agg(F.min("_ts").alias("_hit")))
        cur = (cur.join(hit, "_k", "left")
               .select("_k", "t1",
                       F.when(F.col("_hit").isNotNull(), F.lit(i))
                       .otherwise(F.col("n_steps")).alias("n_steps"),
                       F.coalesce(F.col("_hit"), F.col("_last"))
                       .alias("_last")))
    return cur.select(F.col("_k").alias(key_col), "n_steps",
                      F.col("t1").alias("step1_ts"),
                      F.col("_last").alias("last_ts"))


def cohort_retention(events: DataFrame, key_col: str, ts_col: str,
                     period_s: int = 604800) -> DataFrame:
    """Cohort retention matrix: users grouped by their FIRST-activity
    period (the cohort), counted as retained in every later period
    they act in. Returns (cohort, period_offset, n_active,
    cohort_size, retention) — the classic warehouse triangle chart.

    Scale shape: one min-aggregate for first activity (map-side
    combined), broadcast back onto the per-(key, period) distinct
    activity set, then one (cohort, offset) count — no window over raw
    events, shuffles keyed on user then cohort only.
    """
    e = F.unix_timestamp(F.col(ts_col))
    acts = (events.select(F.col(key_col).alias("_k"),
                          F.floor(e / period_s).cast("long").alias("p"))
            .distinct())
    first = acts.groupBy("_k").agg(F.min("p").alias("cohort"))
    sizes = first.groupBy("cohort").agg(
        F.count(F.lit(1)).alias("cohort_size"))
    ret = (acts.join(first, "_k")
           .groupBy("cohort", (F.col("p") - F.col("cohort"))
                    .alias("period_offset"))
           .agg(F.countDistinct("_k").alias("n_active")))
    return (ret.join(F.broadcast(sizes), "cohort")
            .select("cohort", "period_offset", "n_active", "cohort_size",
                    F.round(F.col("n_active")
                            / F.col("cohort_size"), 6).alias("retention")))
