"""Stateful streaming operators + bucketed-join physical layout."""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F

from memory_engine_spark.sources.tables import write_bucketed
from memory_engine_spark.streaming.events import EventBus
from memory_engine_spark.streaming.stateful import running_counts, streaming_dedup


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, "
              "value double, props string")


@pytest.fixture()
def bus(spark, tmp_path):
    t0 = dt.datetime(2024, 1, 1)
    b = EventBus(spark, str(tmp_path / "bus"))
    # duplicate event_ids 1 and 2 across the batch
    b.publish(_events(spark, [
        (1, t0, 10, "click", 1.0, "{}"),
        (1, t0, 10, "click", 1.0, "{}"),
        (2, t0, 11, "buy", 5.0, "{}"),
        (2, t0, 11, "buy", 5.0, "{}"),
        (3, t0, 10, "click", 2.0, "{}"),
    ]))
    return b


def test_streaming_dedup(spark, bus, tmp_path):
    stream = bus.stream()
    deduped = streaming_dedup(stream, "event_id")
    q = (deduped.writeStream.format("parquet")
         .option("path", str(tmp_path / "out"))
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    out = spark.read.parquet(str(tmp_path / "out"))
    assert sorted(r["event_id"] for r in out.collect()) == [1, 2, 3]


def test_running_counts_across_batches(spark, bus, tmp_path):
    latest: dict = {}

    def sink(batch_df, batch_id):
        for r in batch_df.collect():
            latest[r["key"]] = (r["n"], r["value_sum"])

    def run_once():
        q = (running_counts(bus.stream(), "user_id").writeStream
             .foreachBatch(sink).outputMode("update")
             .option("checkpointLocation", str(tmp_path / "ck2"))
             .trigger(availableNow=True).start())
        q.awaitTermination()

    run_once()
    assert latest[10] == (3, 4.0)   # events 1,1,3 for user 10
    assert latest[11] == (2, 10.0)

    # new data arrives; a NEW query resumes from the same checkpoint —
    # per-key state survives the restart
    bus.publish(_events(spark, [(9, dt.datetime(2024, 1, 2), 10, "click", 1.5, "{}")]))
    run_once()
    assert latest[10] == (4, 5.5)


def test_lc_lock_concurrent_subscribers(spark, tmp_path, monkeypatch):
    """Round-10 regression for the `_LC_LOCK` race fix (round-8/9
    ADVICE): two REAL `run_subscriber_per_event(once=False)` streams
    whose foreachBatch callbacks interleave `lc_tracked`/`lc_free`
    across ~20 micro-batches, while the handlers themselves checkpoint
    through the package-locked `checkpoint.lc` (operator code running
    on a subscriber thread — the exact pre-fix hazard). Without the
    lock, a checkpoint performed by query B inside query A's id-diff
    window lands in A's tracked set, and A's lc_free unpersists B's
    live lineage-truncated blocks → missing-block failure. Asserts:
    every lc_tracked id set is pairwise disjoint, no handler-side
    checkpoint id ever appears in a subscriber's tracked set, and all
    handler-checkpointed frames remain readable after both streams'
    frees have run."""
    import threading
    import time

    import memory_engine_spark.streaming.events as ev
    from memory_engine_spark import checkpoint as cp
    from memory_engine_spark.streaming.events import Subscriber

    t0 = dt.datetime(2024, 1, 1)
    bus = EventBus(spark, str(tmp_path / "bus"))
    for i in range(10):        # 10 files × maxFilesPerTrigger=1
        bus.publish(_events(spark, [
            (100 + i, t0, 10, "click", float(i), "{}"),
            (200 + i, t0, 11, "buy", float(i), "{}")]))

    rec_lock = threading.Lock()
    tracked_sets: list[frozenset] = []   # one per lc_tracked call
    handler_ids: set = set()             # ids pinned via package lc()
    kept_frames: list = []               # frames that must stay alive

    real_tracked = cp.lc_tracked

    def tracked_spy(df, eager=True):
        out, ids = real_tracked(df, eager)
        with rec_lock:
            tracked_sets.append(frozenset(ids))
        return out, ids

    monkeypatch.setattr(ev, "lc_tracked", tracked_spy)

    sc = spark.sparkContext

    def handler(pending, attempt):
        # Operator-style direct checkpoint on the subscriber thread,
        # through the production locked helper; record exactly which
        # ids it pinned (diff inside the SAME lock → exact).
        with cp._LC_LOCK:
            before = {e.getKey() for e in
                      sc._jsc.getPersistentRDDs().entrySet().toArray()}
            frame = pending.select("event_id").localCheckpoint()
            mine = {e.getKey() for e in
                    sc._jsc.getPersistentRDDs().entrySet().toArray()
                    } - before
        with rec_lock:
            handler_ids.update(mine)
            kept_frames.append(frame)
        time.sleep(0.05)       # stretch the overlap window
        if attempt == 1:
            return pending.limit(1)    # force a retry round
        return None

    q1 = bus.run_subscriber_per_event(
        Subscriber("sub_a", handler), once=False,
        max_files_per_trigger=1, log_attempts=False)
    q2 = bus.run_subscriber_per_event(
        Subscriber("sub_b", handler), once=False,
        max_files_per_trigger=1, log_attempts=False)
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            with rec_lock:
                n = len(tracked_sets)
            if n >= 20 and q1.recentProgress and q2.recentProgress:
                break
            if q1.exception() or q2.exception():
                break
            time.sleep(0.5)
        assert q1.exception() is None, q1.exception()
        assert q2.exception() is None, q2.exception()
    finally:
        q1.stop()
        q2.stop()

    with rec_lock:
        sets = list(tracked_sets)
        hids = set(handler_ids)
        frames = list(kept_frames)
    assert len(sets) >= 20
    # (1) no lc_tracked window captured another call's ids
    seen: set = set()
    for s in sets:
        assert not (s & seen), f"id leaked across diff windows: {s & seen}"
        seen |= s
    # (2) no handler-side checkpoint landed in a subscriber's window
    assert not (hids & seen), f"handler ids captured: {hids & seen}"
    # (3) every handler frame survives all frees — a missing block
    # raises here
    assert all(f.count() >= 0 for f in frames)


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    import shutil

    spark.sql("DROP TABLE IF EXISTS b_edges")
    spark.sql("DROP TABLE IF EXISTS b_nodes")
    # a killed prior run can leave the managed-table dir without the
    # catalog entry — remove stale locations
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("b_edges", "b_nodes"):
        shutil.rmtree(os.path.join(warehouse, t), ignore_errors=True)
    edges = spark.range(0, 1000).select(
        (F.col("id") % 100).cast("string").alias("from_id"),
        F.col("id").cast("string").alias("to_id"))
    nodes = spark.range(0, 100).select(F.col("id").cast("string").alias("from_id"),
                                       F.lit("n").alias("kind"))
    write_bucketed(edges, "b_edges", ["from_id"], num_buckets=8)
    write_bucketed(nodes, "b_nodes", ["from_id"], num_buckets=8)
    # force SMJ (small side would otherwise broadcast) to show that the
    # bucketed layout removes the shuffle both sides would need
    joined = spark.table("b_edges").join(spark.table("b_nodes").hint("merge"),
                                         "from_id")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange hashpartitioning" not in plan  # co-located buckets
    assert joined.count() == 1000
    # contrast: the same join on plain (unbucketed) parquet shuffles
    plain = edges.join(nodes.hint("merge"), "from_id")
    plain_plan = plain._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" in plain_plan


def test_gopher_filter_is_shuffle_free(spark):
    """The corpus gate must stay a pure projection — no Exchange in the
    plan (it runs over every document at 100 TB)."""
    from memory_engine_spark.operators.text import gopher_filter

    df = spark.createDataFrame([("d1", "some text")], "doc_id string, body string")
    plan = gopher_filter(df, "body", "doc_id")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan


def test_bm25_broadcasts_stats_sides(spark):
    """Corpus stats and per-term document frequencies must broadcast —
    the big (doc, term) side never shuffles for them."""
    from memory_engine_spark.operators.ranking import bm25_scores

    df = spark.createDataFrame(
        [(i, "spark join stream") for i in range(50)], "doc_id int, body string")
    plan = bm25_scores(df, "body", "doc_id", ["spark", "join"]) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" in plan


def test_streaming_hll_matches_batch_across_restart(spark, bus, tmp_path):
    from memory_engine_spark.functions.sketch import hll_count_distinct
    from memory_engine_spark.streaming.stateful import (
        hll_estimate_from_registers, streaming_hll_registers)

    regs: dict = {}

    def sink(batch_df, batch_id):
        for r in batch_df.collect():
            regs[r["reg"]] = r["max_rank"]

    def run_once():
        q = (streaming_hll_registers(bus.stream(), "user_id", p=6)
             .writeStream.foreachBatch(sink).outputMode("update")
             .option("checkpointLocation", str(tmp_path / "ck_hll"))
             .trigger(availableNow=True).start())
        q.awaitTermination()

    def streamed_estimate():
        snap = spark.createDataFrame(
            [(k, v) for k, v in regs.items()], "reg long, max_rank int")
        return hll_estimate_from_registers(snap, p=6).first()["hll_estimate"]

    run_once()
    batch1 = hll_count_distinct(bus.replay(dt.datetime(2000, 1, 1)), "user_id", p=6) \
        .first()["hll_estimate"]
    assert streamed_estimate() == batch1  # bit-identical fold

    # 30 new users arrive; the register STATE survives the restart and
    # the streamed estimate still equals batch-over-everything
    t0 = dt.datetime(2024, 1, 3)
    bus.publish(_events(spark, [
        (100 + i, t0, 1000 + i, "click", 1.0, "{}") for i in range(30)]))
    run_once()
    batch2 = hll_count_distinct(bus.replay(dt.datetime(2000, 1, 1)), "user_id", p=6) \
        .first()["hll_estimate"]
    assert streamed_estimate() == batch2
    assert batch2 > batch1


def test_stream_interval_join_pairs_within_window(spark, tmp_path):
    from memory_engine_spark.streaming.stateful import stream_interval_join
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    clicks = EventBus(spark, str(tmp_path / "clicks"))
    buys = EventBus(spark, str(tmp_path / "buys"))
    clicks.publish(_events(spark, [
        (1, t0, 10, "click", 1.0, "{}"),
        (2, t0 + dt.timedelta(hours=3), 11, "click", 1.0, "{}")]))
    buys.publish(_events(spark, [
        # within 1h of user 10's click -> joins
        (100, t0 + dt.timedelta(minutes=30), 10, "buy", 9.0, "{}"),
        # 3h after user 10's click -> outside the interval
        (101, t0 + dt.timedelta(hours=3), 10, "buy", 9.0, "{}"),
        # different user at a joinable time -> no key match
        (102, t0 + dt.timedelta(minutes=10), 99, "buy", 9.0, "{}")]))

    joined = stream_interval_join(
        clicks.stream(), buys.stream(), key="user_id", within_s=3600)
    q = (joined.selectExpr("event_id", "r_event_id", "user_id")
         .writeStream.format("parquet")
         .option("path", str(tmp_path / "out"))
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    rows = sorted((r["event_id"], r["r_event_id"])
                  for r in spark.read.parquet(str(tmp_path / "out")).collect())
    assert rows == [(1, 100)]


def test_dpp_fires_on_month_partitioned_layout(spark, tmp_path):
    """r9 dynamic-partition-pruning demo: joining a month-partitioned
    fact on its partition column against a filtered dim must inject
    the dim as a runtime partition filter (dynamicpruning#N in the
    fact scan's PartitionFilters) — the q237 plan contract."""
    from pyspark.sql import functions as F

    fact = spark.range(4000).select(
        (F.lit(202400) + F.col("id") % 12).cast("int").alias("m"),
        (F.col("id") * 3 % 97).alias("v"))
    fact.write.mode("overwrite").partitionBy("m") \
        .parquet(str(tmp_path / "fact"))
    pf = spark.read.parquet(str(tmp_path / "fact"))
    dim = spark.range(400).select(
        (F.lit(202400) + F.col("id") % 12).cast("int").alias("m"),
        F.col("id").alias("k")).filter(F.col("k") % 100 == 3)
    out = pf.join(dim.select("m").distinct(), "m") \
        .groupBy("m").agg(F.sum("v").alias("s"))
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan, plan[:2000]


def test_stream_interval_join_left_outer_flush(spark, tmp_path):
    """r9 left-outer topology: a matched left row pairs normally, an
    unmatched one emits NULL-padded — but ONLY after the watermark
    proves its window closed, which the far-future sentinel forces.
    Without the sentinel the unmatched row would be swallowed at
    drain (the hazard q236's docstring documents)."""
    from memory_engine_spark.streaming.stateful import stream_interval_join
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    far = dt.datetime(2100, 1, 1)

    clicks = EventBus(spark, str(tmp_path / "clicks"))
    buys = EventBus(spark, str(tmp_path / "buys"))
    clicks.publish(_events(spark, [
        (1, t0, 10, "click", 1.0, "{}"),
        (2, t0, 11, "click", 1.0, "{}"),       # no buy -> null-padded
        (-1, far, -1, "click", 0.0, "{}")]))   # sentinel
    buys.publish(_events(spark, [
        (100, t0 + dt.timedelta(minutes=30), 10, "buy", 9.0, "{}"),
        (-2, far, -1, "buy", 0.0, "{}")]))     # sentinel

    joined = stream_interval_join(
        clicks.stream(), buys.stream(), key="user_id",
        within_s=3600, watermark_s=3600, how="left_outer")
    q = (joined.selectExpr("event_id", "r_event_id", "user_id")
         .writeStream.format("parquet")
         .option("path", str(tmp_path / "out"))
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    rows = sorted(
        (r["event_id"], r["r_event_id"])
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
        if r["user_id"] >= 0)
    assert rows == [(1, 100), (2, None)]
