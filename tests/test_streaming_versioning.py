"""Streaming event-bus + versioning semantics (event_system.py,
revision_manager.py) against temp-dir backends."""

from __future__ import annotations

import datetime as dt
import json

import pytest
from pyspark.sql import functions as F

from memory_engine_spark.operators.versioning import RevisionLog, versioned_upsert
from memory_engine_spark.streaming.events import (
    EventBus, Subscriber, rate_limited_batches,
)


def _events(spark, n=20, t0=None):
    t0 = t0 or dt.datetime(2024, 1, 1)
    rows = [(i, t0 + dt.timedelta(seconds=10 * i), i % 3,
             "purchase" if i % 2 else "click", float(i), "{}")
            for i in range(n)]
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, "
              "value double, props string")


def test_bus_publish_subscribe_once(spark, tmp_path):
    bus = EventBus(spark, str(tmp_path / "bus"))
    bus.publish(_events(spark))
    seen = []

    sub = Subscriber("clicks", lambda df, bid: seen.append(df.count()),
                     event_types=["click"], predicate="value >= 4")
    bus.run_subscriber(sub, once=True)
    # clicks are even ids; value>=4 → ids 4,6,...,18 → 8 rows
    assert sum(seen) == 8


def test_bus_dlq_and_retry(spark, tmp_path):
    bus = EventBus(spark, str(tmp_path / "bus2"))
    bus.publish(_events(spark, n=6))
    calls = {"n": 0}

    def flaky(df, bid):
        calls["n"] += 1
        raise RuntimeError("boom")

    sub = Subscriber("flaky", flaky)
    bus.run_subscriber(sub, once=True)
    assert calls["n"] == 4  # 1 + MAX_RETRIES
    dl = bus.dead_letters()
    assert dl.count() == 6
    assert dl.first()["_subscriber"] == "flaky"

    # successful manual retry clears the DLQ (event_system.py:477-489)
    ok = Subscriber("flaky", lambda df, bid: None)
    retried = bus.retry_dead_letters(ok)
    assert retried == 6
    assert bus.dead_letters().count() == 0


def test_replay_from_timestamp(spark, tmp_path):
    bus = EventBus(spark, str(tmp_path / "bus3"))
    bus.publish(_events(spark, n=10))
    cut = dt.datetime(2024, 1, 1, 0, 0, 50)
    assert bus.replay(cut).count() == 5  # ids 5..9


def test_rate_limited_slots(spark):
    df = _events(spark, n=25)
    slots = rate_limited_batches(df, events_per_second=10)
    per_slot = {r["slot"]: r["n"] for r in
                slots.groupBy("slot").agg(F.count("*").alias("n")).collect()}
    assert per_slot == {0: 10, 1: 10, 2: 5}


def test_checkpoint_no_reprocess(spark, tmp_path):
    bus = EventBus(spark, str(tmp_path / "bus4"))
    bus.publish(_events(spark, n=5))
    counts = []
    sub = Subscriber("ck", lambda df, bid: counts.append(df.count()))
    bus.run_subscriber(sub, once=True)
    bus.run_subscriber(sub, once=True)  # nothing new → no rows
    bus.publish(_events(spark, n=3, t0=dt.datetime(2024, 2, 1)))
    bus.run_subscriber(sub, once=True)
    assert sum(counts) == 8  # 5, then 0, then 3 — never reprocessed


# -- versioning ---------------------------------------------------------------

def test_revision_log_and_history(spark, tmp_path):
    log = RevisionLog(spark, str(tmp_path / "rev"))
    log.log_changes([
        {"object_type": "node", "object_id": "n1", "change_type": "create",
         "old_data": None, "new_data": {"v": 1}},
        {"object_type": "node", "object_id": "n1", "change_type": "update",
         "old_data": {"v": 1}, "new_data": {"v": 2}},
        {"object_type": "node", "object_id": "n2", "change_type": "create",
         "old_data": None, "new_data": {"v": 9}},
    ])
    hist = log.history("n1").collect()
    assert [h["change_type"] for h in hist] == ["update", "create"]


def test_state_as_of_and_revert(spark, tmp_path):
    log = RevisionLog(spark, str(tmp_path / "rev2"))
    log.log_changes([
        {"object_type": "node", "object_id": "n1", "change_type": "create",
         "new_data": {"v": 1}},
        {"object_type": "node", "object_id": "n1", "change_type": "update",
         "new_data": {"v": 2}},
        {"object_type": "node", "object_id": "n2", "change_type": "create",
         "new_data": {"v": 9}},
        {"object_type": "node", "object_id": "n2", "change_type": "delete",
         "new_data": None},
    ])
    at1 = {r["object_id"]: json.loads(r["data"])
           for r in log.state_as_of(1, "node").collect()}
    assert at1 == {"n1": {"v": 2}}   # seq 0,1 applied; n2 not created yet
    at2 = {r["object_id"]: json.loads(r["data"])
           for r in log.state_as_of(2, "node").collect()}
    assert at2 == {"n1": {"v": 2}, "n2": {"v": 9}}
    final = {r["object_id"]: json.loads(r["data"])
             for r in log.state_as_of(99, "node").collect()}
    assert final == {"n1": {"v": 2}}  # n2 deleted


def test_evolution_report(spark, tmp_path):
    from memory_engine_spark.operators.versioning import evolution_report
    log = RevisionLog(spark, str(tmp_path / "rev_ev"))
    log.log_changes([
        {"object_type": "node", "object_id": f"n{i}", "change_type": ct,
         "new_data": {}}
        for i, ct in enumerate(["create", "create", "update", "delete"])
    ])
    rows = evolution_report(log).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["n_created"], r["n_updated"], r["n_deleted"]) == (2, 1, 1)


def test_snapshot_roundtrip_and_versioned_upsert(spark, tmp_path):
    log = RevisionLog(spark, str(tmp_path / "rev3"))
    base = spark.createDataFrame([("n1", 1), ("n2", 2)], "node_id string, v int")
    log.snapshot("s1", base)
    assert {r["node_id"] for r in log.read_snapshot("s1").collect()} == {"n1", "n2"}
    updates = spark.createDataFrame([("n2", 20), ("n3", 3)], "node_id string, v int")
    merged = versioned_upsert(log, base, updates, "node_id", "node")
    got = {r["node_id"]: r["v"] for r in merged.collect()}
    assert got == {"n1": 1, "n2": 20, "n3": 3}
    kinds = {r["object_id"]: r["change_type"] for r in log.read().collect()}
    assert kinds == {"n2": "update", "n3": "create"}
    assert log.should_snapshot(150) and not log.should_snapshot(50)


def test_versioned_upsert_bulk_dataframe_side(spark, tmp_path):
    import json as _json

    from memory_engine_spark.operators import versioning as v

    log = v.RevisionLog(spark, str(tmp_path / "bulklog"))
    existing = spark.createDataFrame(
        [(str(i), i) for i in range(200)], "id string, val int")
    updates = spark.createDataFrame(
        [(str(i), i * 10) for i in range(150, 250)], "id string, val int")
    merged = v.versioned_upsert(log, existing, updates, "id", "node")
    assert merged.count() == 250
    entries = log.read().collect()
    assert len(entries) == 100
    by_type = {e["object_id"]: e for e in entries}
    assert by_type["160"]["change_type"] == "update"
    assert _json.loads(by_type["160"]["old_data"])["val"] == 160
    assert _json.loads(by_type["160"]["new_data"])["val"] == 1600
    assert by_type["240"]["change_type"] == "create"
    assert by_type["240"]["old_data"] == "null"
    # seq values are unique and contiguous
    seqs = sorted(e["seq"] for e in entries)
    assert seqs == list(range(seqs[0], seqs[0] + 100))


def test_state_as_of_uses_snapshot_base(spark, tmp_path):
    from memory_engine_spark.operators import versioning as v

    log = v.RevisionLog(spark, str(tmp_path / "baselog"))
    log.log_changes([
        {"object_type": "node", "object_id": "x", "change_type": "update",
         "old_data": {"v": 1}, "new_data": {"v": 2}},
        {"object_type": "node", "object_id": "gone", "change_type": "delete",
         "old_data": {"v": 9}, "new_data": None},
    ])
    base = spark.createDataFrame(
        [("x", '{"v": 1}'), ("only_in_base", '{"v": 7}'), ("gone", '{"v": 9}')],
        "object_id string, data string")
    state = {r["object_id"]: r["data"]
             for r in log.state_as_of(10, "node", base=base).collect()}
    assert state["only_in_base"] == '{"v": 7}'  # carried from snapshot
    assert "gone" not in state                   # log delete wins over base
    assert '"v": 2' in state["x"]                # log update wins over base


def test_session_aggregates_batch_parity_and_streaming(spark, tmp_path):
    """session_window output must agree with the window-function
    sessionizer on counts, and work as a real streaming query with a
    watermark."""
    import datetime as dt

    from pyspark.sql import functions as F

    from memory_engine_spark.operators import temporal
    from memory_engine_spark.streaming.stateful import session_aggregates

    base = dt.datetime(2024, 1, 1, 10, 0, 0)
    rows = [(i, 1 + i % 2, base + dt.timedelta(seconds=s))
            for i, s in enumerate([0, 60, 2000, 2100, 6000, 6100])]
    df = spark.createDataFrame(rows, "event_id int, user_id int, ts timestamp")

    # batch parity: same session count multiset per user (session_window
    # gap is measured to window END, matching the > gap rule)
    sw = session_aggregates(df, "user_id", "ts", gap="30 minutes")
    batch = temporal.session_stats(
        temporal.sessionize(df, "user_id", "ts", gap_s=1800,
                            id_col="event_id"), "user_id", "ts")
    a = sorted((r["user_id"], r["n_events"]) for r in sw.collect())
    b = sorted((r["user_id"], r["n_events"]) for r in batch.collect())
    assert a == b

    # streaming: write the rows as a file source and drain
    src = str(tmp_path / "sess_src")
    df.write.mode("overwrite").parquet(src)
    stream = (spark.readStream.schema(df.schema).parquet(src))
    out = session_aggregates(stream, "user_id", "ts", gap="30 minutes",
                             watermark=None)
    results = []
    # complete mode for the drain test: append mode would hold the final
    # sessions open behind the watermark forever on a finite source (the
    # same availableNow trap as processing-time TTLs, documented above)
    q = (out.writeStream.outputMode("complete")
         .foreachBatch(lambda b, _: results.extend(b.collect()))
         .option("checkpointLocation", str(tmp_path / "sess_ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    assert sorted((r["user_id"], r["n_events"]) for r in results) == b


def test_windowed_counts_watermark_drops_late_rows(spark, tmp_path):
    """Append-mode watermark semantics end-to-end across two
    availableNow restarts sharing a checkpoint: a window is emitted
    once the watermark passes its end, and a row arriving behind the
    persisted watermark is dropped instead of reopening the window."""
    import datetime as dt

    from memory_engine_spark.streaming.stateful import windowed_counts

    def t(h, m):
        return dt.datetime(2024, 1, 1, h, m, 0)

    src = str(tmp_path / "wc_src")
    ck = str(tmp_path / "wc_ck")
    out_dir = str(tmp_path / "wc_out")
    schema = "event_id int, ts timestamp"

    def run_batch(rows, first):
        df = spark.createDataFrame(rows, schema)
        df.write.mode("overwrite" if first else "append").parquet(src)
        stream = spark.readStream.schema(df.schema).parquet(src)
        counts = windowed_counts(stream, "ts", window="10 minutes",
                                 watermark="30 minutes")
        q = (counts.writeStream.outputMode("append").format("parquet")
             .option("path", out_dir).option("checkpointLocation", ck)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    # batch 1: window A = [10:00,10:10) x2, sentinel at 12:00 pushes the
    # watermark to 11:30 -> A is finalized and emitted, 12:00's isn't
    run_batch([(1, t(10, 0)), (2, t(10, 5)), (3, t(12, 0))], first=True)
    got = {(r["window_start"], r["n"])
           for r in spark.read.parquet(out_dir).collect()}
    assert (t(10, 0), 2) in got
    assert all(ws != t(12, 0) for ws, _ in got)

    # batch 2: a LATE row for window A (behind the 11:30 watermark, must
    # be dropped) plus 13:30 advancing the watermark past 12:10
    run_batch([(4, t(10, 7)), (5, t(13, 30))], first=False)
    got2 = {(r["window_start"], r["n"])
            for r in spark.read.parquet(out_dir).collect()}
    assert (t(10, 0), 2) in got2          # late row did NOT bump A
    assert (t(10, 0), 3) not in got2
    assert (t(12, 0), 1) in got2          # 12:00 window finalized now


def test_dlq_retry_keeps_other_subscribers(spark, tmp_path):
    # the atomic rewrite must preserve OTHER subscribers' dead letters
    bus = EventBus(spark, str(tmp_path / "bus4"))
    bus.publish(_events(spark, n=4))

    def boom(df, bid):
        raise RuntimeError("boom")

    bus.run_subscriber(Subscriber("a", boom), once=True)
    bus.run_subscriber(Subscriber("b", boom), once=True)
    assert bus.dead_letters().count() == 8

    bus.retry_dead_letters(Subscriber("a", lambda df, bid: None))
    dl = bus.dead_letters()
    assert dl.count() == 4
    assert {r["_subscriber"] for r in dl.select("_subscriber").collect()} == {"b"}
    # no leftover swap dirs
    import os
    assert not os.path.exists(bus.dlq_dir + ".tmp")
    assert not os.path.exists(bus.dlq_dir + ".bak")

def test_per_event_dlq_lifecycle(spark, tmp_path):
    """Reference lifecycle at per-event granularity: 1 + MAX_RETRIES
    attempts, dead-letter on exhaustion, manual retry clears only the
    events the patched handler now processes, attempts ledger records
    every transition with the reference's status names."""
    from pyspark.sql import functions as F

    from memory_engine_spark.streaming.events import EventBus, Subscriber

    ev = spark.createDataFrame(
        [(i, None, i, "click", 1.0, "{}") for i in range(20)],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string")
    bus = EventBus(spark, str(tmp_path / "bus"))
    bus.publish(ev)

    m = F.col("event_id") % 10
    sub = Subscriber(
        name="s", handler=lambda b, a: b.filter(
            (m >= 8) | ((m >= 6) & (F.lit(a) < 3))))
    bus.run_subscriber_per_event(sub, once=True)

    # buckets 8,9 dead-lettered with _retries = MAX_RETRIES
    dl = bus.dead_letters()
    assert dl.count() == 4
    assert {r["_retries"] for r in dl.collect()} == {3}

    # ledger: bucket 0-5 -> 1 attempt; 6-7 -> retrying,retrying,processed
    led = bus.attempts()
    a7 = sorted((r["_attempt"], r["_status"])
                for r in led.filter("event_id = 7").collect())
    assert a7 == [(1, "retrying"), (2, "retrying"), (3, "processed")]
    a9 = sorted((r["_attempt"], r["_status"])
                for r in led.filter("event_id = 9").collect())
    assert a9[-1] == (4, "dead_letter")

    # manual per-event retry with a patched handler clears bucket 8 only
    patched = Subscriber(name="s", handler=lambda b, a: b.filter(m == 9))
    n = bus.retry_dead_letters_per_event(patched)
    assert n == 2
    left = sorted(r["event_id"] for r in bus.dead_letters().collect())
    assert left == [9, 19]
    # and the manual attempt is in the ledger at attempt MAX_RETRIES+2
    # (re-read: the pre-retry frame's file listing is already fixed)
    a8 = sorted((r["_attempt"], r["_status"])
                for r in bus.attempts().filter("event_id = 8").collect())
    assert a8[-1] == (5, "processed")


def test_per_event_retry_keeps_other_subscribers(spark, tmp_path):
    """Clearing one subscriber's dead letters must not clear another
    subscriber's copy of the same event ids."""
    from pyspark.sql import functions as F

    from memory_engine_spark.streaming.events import EventBus, Subscriber

    ev = spark.createDataFrame(
        [(i, None, i, "click", 1.0, "{}") for i in range(4)],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string")
    bus = EventBus(spark, str(tmp_path / "bus2"))
    bus.publish(ev)
    fail_all = lambda b, a: b  # noqa: E731
    for name in ("s1", "s2"):
        bus.run_subscriber_per_event(
            Subscriber(name=name, handler=fail_all), once=True)
    assert bus.dead_letters().count() == 8
    ok_all = Subscriber(name="s1", handler=lambda b, a: None)
    assert bus.retry_dead_letters_per_event(ok_all) == 4
    rest = bus.dead_letters()
    assert rest.count() == 4
    assert {r["_subscriber"] for r in rest.collect()} == {"s2"}


def test_dlq_compaction_bounds_disk_and_keeps_newest(spark, tmp_path,
                                                     monkeypatch):
    """compact_dead_letters mirrors the reference deque(maxlen=1000)
    (event_system.py:453-460): the parquet dir is rewritten down to the
    newest DLQ_CAP rows, reads after compaction still work, and the
    per-append file-count trigger keeps a pathological subscriber from
    growing the dir unboundedly."""
    import os

    from memory_engine_spark.streaming import events as ev

    monkeypatch.setattr(ev, "DLQ_CAP", 5)
    bus = EventBus(spark, str(tmp_path / "bus_dlq"))
    # 3 appends x 4 rows, strictly increasing _dlq_ts per append
    for batch in range(3):
        rows = _events(spark, n=4).withColumn(
            "event_id", F.col("event_id") + F.lit(batch * 10))
        bus._dead_letter(rows, "s", f"err{batch}")

    capped = bus.dead_letters().collect()
    assert len(capped) == 5
    # newest-first: all of batch 2 (ids 20..23) + the max-id row of
    # batch 1 (same _dlq_ts within an append -> event_id desc tiebreak)
    assert sorted(r["event_id"] for r in capped) == [13, 20, 21, 22, 23]

    bus.compact_dead_letters()
    on_disk = spark.read.parquet(bus.dlq_dir)
    assert on_disk.count() == 5
    after = bus.dead_letters().collect()
    assert sorted(r["event_id"] for r in after) == [13, 20, 21, 22, 23]

    # retry after compaction still clears the queue
    n = bus.retry_dead_letters(Subscriber("s", lambda df, bid: None))
    assert n == 5
    assert bus.dead_letters().count() == 0

    # auto-trigger: with a tiny file threshold, repeated appends
    # compact the dir instead of accumulating part files forever
    monkeypatch.setattr(EventBus, "DLQ_COMPACT_FILES", 2)
    for batch in range(6):
        bus._dead_letter(_events(spark, n=2), "s", "boom")
    n_parts = sum(1 for f in os.listdir(bus.dlq_dir)
                  if f.endswith(".parquet"))
    assert n_parts <= 2 + spark.sparkContext.defaultParallelism
    assert bus.dead_letters().count() == 5


def test_dlq_compaction_frees_checkpoint_blocks(spark, tmp_path,
                                                monkeypatch):
    """Round-8 regression for the r7 ADVICE leak: compact_dead_letters
    used Dataset.unpersist on a localCheckpoint'd frame — a silent
    no-op (checkpoint blocks have no CacheManager entry) — pinning
    ~DLQ_CAP rows of blocks per compaction. The lc_tracked/lc_free
    rewrite must leave the JVM persistent-RDD map at its pre-call
    size after every swap path (compact, retry, per-event retry)."""
    from memory_engine_spark.streaming import events as ev

    def n_pinned():
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        return len(jmap.entrySet().toArray())

    monkeypatch.setattr(ev, "DLQ_CAP", 5)
    bus = EventBus(spark, str(tmp_path / "bus_lc"))
    for batch in range(3):
        rows = _events(spark, n=4).withColumn(
            "event_id", F.col("event_id") + F.lit(batch * 10))
        bus._dead_letter(rows, "s", f"err{batch}")
    before = n_pinned()
    bus.compact_dead_letters()
    assert n_pinned() == before, "compaction leaked checkpoint blocks"
    bus.retry_dead_letters(Subscriber("s", lambda df, bid: None))
    assert n_pinned() == before, "retry swap leaked checkpoint blocks"


def test_crash_recovery_exactly_once(spark, tmp_path):
    """r10 verdict item 2 — the durability claim a 100-TB pipeline
    rests on: kill a live MicroBatchExecution mid-drain (query.stop()
    after ≥3 committed batches of 12), then restart against the SAME
    checkpoint dir from a HARD new session, and assert the combined
    output equals an uninterrupted run's byte-exactly. foreachBatch is
    at-least-once by contract — the interrupted batch replays on
    resume with the SAME batch_id — so the handler uses the standard
    idempotent-sink pattern (overwrite into a batch_id-keyed path):
    replay overwrites, never duplicates. That pattern plus the
    checkpoint IS the exactly-once story; this test proves both halves
    (no lost events, no duplicated events) across a real crash
    boundary."""
    import glob
    import time as _time

    bus_root = str(tmp_path / "bus")
    bus = EventBus(spark, bus_root)
    n_files, per_file = 12, 5
    for k in range(n_files):
        t0 = dt.datetime(2024, 1, 1) + dt.timedelta(hours=k)
        rows = [(k * per_file + i, t0 + dt.timedelta(seconds=i), i % 3,
                 "click", float(i), "{}") for i in range(per_file)]
        bus.publish(spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, "
                  "event_type string, value double, props string")
            .coalesce(1))

    out_dir = str(tmp_path / "out_crash")
    solo_dir = str(tmp_path / "out_solo")

    def make_handler(dest):
        def handler(batch, bid):
            batch.write.mode("overwrite").parquet(f"{dest}/b{bid:05d}")
        return handler

    # phase 1: continuous trigger, killed after ≥3 committed batches
    q = bus.run_subscriber(Subscriber("crash", make_handler(out_dir)),
                           once=False, max_files_per_trigger=1)
    deadline = _time.time() + 120
    while len(glob.glob(out_dir + "/b*")) < 3:
        assert _time.time() < deadline, "stream made no progress"
        _time.sleep(0.2)
    q.stop()
    while q.isActive:
        _time.sleep(0.1)
    done_at_crash = len(glob.glob(out_dir + "/b*"))
    assert 3 <= done_at_crash < n_files, \
        f"crash must land mid-drain, got {done_at_crash}/{n_files}"

    # phase 2: HARD new session, same checkpoint dir, drain to the end
    spark2 = spark.newSession()
    bus2 = EventBus(spark2, bus_root)
    bus2.run_subscriber(Subscriber("crash", make_handler(out_dir)),
                        once=True, max_files_per_trigger=1)

    # uninterrupted reference run (own checkpoint, same events)
    bus.run_subscriber(Subscriber("solo", make_handler(solo_dir)),
                       once=True, max_files_per_trigger=1)

    got = spark.read.parquet(out_dir + "/b*")
    solo = spark.read.parquet(solo_dir + "/b*")
    total = n_files * per_file
    # exactly-once: every published event exactly once after resume
    assert got.count() == total
    assert got.select("event_id").distinct().count() == total
    # resumed == uninterrupted, byte-exact (batch boundaries may
    # differ; the event rows themselves may not)
    assert sorted(map(tuple, got.collect())) == \
        sorted(map(tuple, solo.collect()))


def test_crash_recovery_attempts_ledger_exactly_once(spark, tmp_path):
    """The lifecycle LEDGER is exactly-once across a crash too (r11):
    run_subscriber_per_event writes each micro-batch's attempt rows as
    ONE overwrite into a batch_id-keyed path, so a batch replayed
    after a kill re-writes its own slice instead of double-counting.
    Kill mid-drain, resume from the same checkpoint in a hard new
    session, and the full ledger equals the uninterrupted run's —
    every event exactly once per attempt round."""
    import glob
    import time as _time

    def ledger_multiset(bus):
        return sorted((r["event_id"], r["_attempt"], r["_status"])
                      for r in bus.attempts().collect())

    def make_sub(name):
        def handler(batch, attempt):
            if attempt <= 2:             # %3 events fail rounds 1-2
                return batch.filter(F.col("event_id") % 3 == 0)
            return None                  # round 3: everything sticks
        return Subscriber(name, handler)

    def publish(bus):
        for k in range(12):
            t0 = dt.datetime(2024, 1, 1) + dt.timedelta(hours=k)
            rows = [(k * 5 + i, t0 + dt.timedelta(seconds=i), i % 3,
                     "click", float(i), "{}") for i in range(5)]
            bus.publish(spark.createDataFrame(
                rows, "event_id long, ts timestamp, user_id long, "
                      "event_type string, value double, props string")
                .coalesce(1))

    crash_bus = EventBus(spark, str(tmp_path / "bus_crash"))
    publish(crash_bus)
    q = crash_bus.run_subscriber_per_event(
        make_sub("ledger"), once=False, max_files_per_trigger=1)
    deadline = _time.time() + 120
    while len(glob.glob(crash_bus.attempts_dir + "/b*")) < 3:
        assert _time.time() < deadline, "stream made no progress"
        _time.sleep(0.2)
    q.stop()
    while q.isActive:
        _time.sleep(0.1)
    done = len(glob.glob(crash_bus.attempts_dir + "/b*"))
    assert 3 <= done < 12, f"crash must land mid-drain, got {done}/12"

    spark2 = spark.newSession()
    bus2 = EventBus(spark2, str(tmp_path / "bus_crash"))
    bus2.run_subscriber_per_event(make_sub("ledger"), once=True,
                                  max_files_per_trigger=1)

    solo_bus = EventBus(spark, str(tmp_path / "bus_solo"))
    publish(solo_bus)
    solo_bus.run_subscriber_per_event(make_sub("ledger"), once=True,
                                      max_files_per_trigger=1)

    got, want = ledger_multiset(crash_bus), ledger_multiset(solo_bus)
    assert got == want
    # shape check: 60 events x 1 row + 20 (%3) events x 2 extra rounds
    assert len(got) == 60 + 20 * 2


def test_crash_recovery_dlq_exactly_once(spark, tmp_path):
    """Dead letters are exactly-once across a crash too (r11): the
    streaming DLQ write is a batch_id-keyed overwrite, so the replayed
    batch re-records its own dead letters instead of appending a
    second copy. Handler dead-letters every %5==0 event (fails all 4
    rounds); kill mid-drain, resume in a hard new session, compare the
    DLQ multiset (sans the bookkeeping timestamp) with an
    uninterrupted run."""
    import glob
    import time as _time

    def make_sub(name):
        def handler(batch, attempt):
            return batch.filter(F.col("event_id") % 5 == 0)
        return Subscriber(name, handler)

    def publish(bus):
        for k in range(12):
            t0 = dt.datetime(2024, 1, 1) + dt.timedelta(hours=k)
            rows = [(k * 5 + i, t0 + dt.timedelta(seconds=i), i % 3,
                     "click", float(i), "{}") for i in range(5)]
            bus.publish(spark.createDataFrame(
                rows, "event_id long, ts timestamp, user_id long, "
                      "event_type string, value double, props string")
                .coalesce(1))

    def dlq_multiset(bus):
        return sorted((r["event_id"], r["_subscriber"], r["_retries"])
                      for r in bus.dead_letters().collect())

    crash_bus = EventBus(spark, str(tmp_path / "bus_dlq_crash"))
    publish(crash_bus)
    q = crash_bus.run_subscriber_per_event(
        make_sub("dlq"), once=False, max_files_per_trigger=1,
        log_attempts=False)
    deadline = _time.time() + 120
    while len(glob.glob(crash_bus.dlq_dir + "/b*")) < 3:
        assert _time.time() < deadline, "stream made no progress"
        _time.sleep(0.2)
    q.stop()
    while q.isActive:
        _time.sleep(0.1)
    done = len(glob.glob(crash_bus.dlq_dir + "/b*"))
    assert 3 <= done < 12, f"crash must land mid-drain, got {done}/12"

    spark2 = spark.newSession()
    bus2 = EventBus(spark2, str(tmp_path / "bus_dlq_crash"))
    bus2.run_subscriber_per_event(make_sub("dlq"), once=True,
                                  max_files_per_trigger=1,
                                  log_attempts=False)

    solo_bus = EventBus(spark, str(tmp_path / "bus_dlq_solo"))
    publish(solo_bus)
    solo_bus.run_subscriber_per_event(make_sub("dlq"), once=True,
                                      max_files_per_trigger=1,
                                      log_attempts=False)

    got, want = dlq_multiset(crash_bus), dlq_multiset(solo_bus)
    assert got == want
    assert len(got) == 12               # one %5 event per 5-row file


def test_dlq_compaction_checkpoint_aware_no_replay_duplicates(
        spark, tmp_path):
    """r12 (r11 verdict item 2): the compactor must not fold a slice
    whose batch is not yet committed — folding it flat and then
    crashing before the commit meant the replay re-created the slice
    BESIDE the folded copy, duplicating that one batch's dead
    letters. Reproduce the exact window deterministically: drain
    fully, then delete the newest commit file (= crashed after
    foreachBatch wrote the slice, before MicroBatchExecution
    committed), compact in that state, resume in a hard new session,
    and assert the DLQ multiset equals an uninterrupted run's — no
    duplicates, and the uncommitted slice was carried over intact at
    its original path (so the replay overwrote, not appended)."""
    import glob
    import os

    def make_sub(name):
        def handler(batch, attempt):
            return batch.filter(F.col("event_id") % 5 == 0)
        return Subscriber(name, handler)

    def publish(bus):
        for k in range(6):
            t0 = dt.datetime(2024, 1, 1) + dt.timedelta(hours=k)
            rows = [(k * 5 + i, t0 + dt.timedelta(seconds=i), i % 3,
                     "click", float(i), "{}") for i in range(5)]
            bus.publish(spark.createDataFrame(
                rows, "event_id long, ts timestamp, user_id long, "
                      "event_type string, value double, props string")
                .coalesce(1))

    def dlq_multiset(bus):
        return sorted((r["event_id"], r["_subscriber"], r["_retries"])
                      for r in bus.dead_letters().collect())

    bus = EventBus(spark, str(tmp_path / "bus_cpa"))
    publish(bus)
    bus.run_subscriber_per_event(make_sub("cpa"), once=True,
                                 max_files_per_trigger=1,
                                 log_attempts=False)
    slices = sorted(glob.glob(bus.dlq_dir + "/b*"))
    assert len(slices) == 6
    commits = os.path.join(bus.checkpoints, "cpa", "commits")
    last = max(int(f) for f in os.listdir(commits) if f.isdigit())
    # crash-before-commit leaves NEITHER the commit file nor its
    # Hadoop checksum twin (a stale .crc fails the replay's rename)
    os.remove(os.path.join(commits, str(last)))
    os.remove(os.path.join(commits, f".{last}.crc"))

    bus.compact_dead_letters()
    # the uncommitted batch's slice survives at its ORIGINAL path;
    # every committed slice was folded into the flat layout
    kept = sorted(glob.glob(bus.dlq_dir + "/b*"))
    assert kept == [os.path.join(bus.dlq_dir, f"b{last:09d}_cpa")]
    assert bus.dead_letters().count() == 6        # read spans both

    spark2 = spark.newSession()
    bus2 = EventBus(spark2, str(tmp_path / "bus_cpa"))
    bus2.run_subscriber_per_event(make_sub("cpa"), once=True,
                                  max_files_per_trigger=1,
                                  log_attempts=False)

    solo = EventBus(spark, str(tmp_path / "bus_cpa_solo"))
    publish(solo)
    solo.run_subscriber_per_event(make_sub("cpa"), once=True,
                                  max_files_per_trigger=1,
                                  log_attempts=False)
    got, want = dlq_multiset(bus), dlq_multiset(solo)
    assert got == want                  # replay overwrote, no dupes
    assert len(got) == 6                # one %5 event per 5-row file
