"""Temporal operators: as-of join, range join, sessionization, rollup
cascade (operators/temporal.py)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from memory_engine_spark.operators import temporal


def _ts(s):
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def quotes_trades(spark):
    quotes = spark.createDataFrame(
        [("A", _ts("2024-01-01T10:00:00"), 100.0),
         ("A", _ts("2024-01-01T10:05:00"), 101.0),
         ("A", _ts("2024-01-01T10:20:00"), 99.0),
         ("B", _ts("2024-01-01T10:01:00"), 50.0)],
        "sym string, ts timestamp, px double")
    trades = spark.createDataFrame(
        [(1, "A", _ts("2024-01-01T10:00:00")),   # tie → matches 10:00 quote
         (2, "A", _ts("2024-01-01T10:07:00")),   # after 10:05
         (3, "A", _ts("2024-01-01T09:59:00")),   # before any quote
         (4, "B", _ts("2024-01-01T10:30:00")),   # 29 min after B's quote
         (5, "C", _ts("2024-01-01T10:00:00"))],  # key with no quotes
        "trade_id int, sym string, ts timestamp")
    return quotes, trades


def test_asof_join_backward_semantics(quotes_trades):
    quotes, trades = quotes_trades
    out = {r["trade_id"]: r for r in temporal.asof_join(
        trades, quotes.withColumnRenamed("sym", "sym"), "sym", "ts",
        value_cols=["px"]).collect()}
    assert out[1]["px"] == 100.0            # equal ts matches
    assert out[2]["px"] == 101.0            # latest at-or-before
    assert out[3]["px"] is None             # nothing before
    assert out[4]["px"] == 50.0
    assert out[5]["px"] is None             # unknown key
    assert len(out) == 5                    # left join keeps all


def test_asof_join_tolerance_and_inner(quotes_trades):
    quotes, trades = quotes_trades
    tol = {r["trade_id"]: r["px"] for r in temporal.asof_join(
        trades, quotes, "sym", "ts", value_cols=["px"],
        tolerance_s=600).collect()}
    assert tol[2] == 101.0                  # 2 min back — inside 10 min
    assert tol[4] is None                   # 29 min back — outside
    inner = temporal.asof_join(trades, quotes, "sym", "ts",
                               value_cols=["px"], how="inner")
    assert {r["trade_id"] for r in inner.collect()} == {1, 2, 4}


def test_asof_join_matches_duckdb_native(spark, tmp_path):
    """Cross-engine: our union-and-carry plan == DuckDB's ASOF JOIN on
    random-ish data."""
    import duckdb

    quotes = spark.createDataFrame(
        [(f"s{i % 3}", _ts("2024-01-01T00:00:00")
          + dt.timedelta(minutes=7 * i), float(i)) for i in range(40)],
        "sym string, ts timestamp, px double")
    trades = spark.createDataFrame(
        [(i, f"s{i % 4}", _ts("2024-01-01T00:00:00")
          + dt.timedelta(minutes=11 * i)) for i in range(30)],
        "trade_id int, sym string, ts timestamp")
    got = {(r["trade_id"]): (r["px"]) for r in temporal.asof_join(
        trades, quotes, "sym", "ts", value_cols=["px"]).collect()}
    qp, tp = str(tmp_path / "q.parquet"), str(tmp_path / "t.parquet")
    quotes.toPandas().to_parquet(qp)
    trades.toPandas().to_parquet(tp)
    con = duckdb.connect()
    want = {r[0]: r[1] for r in con.execute(
        f"SELECT t.trade_id, q.px FROM '{tp}' t ASOF LEFT JOIN '{qp}' q "
        f"ON t.sym = q.sym AND t.ts >= q.ts").fetchall()}
    assert got == want


def test_range_join_containment_and_no_crossjoin(spark):
    points = spark.createDataFrame(
        [(1, _ts("2024-01-01T10:15:00")), (2, _ts("2024-01-01T13:00:00")),
         (3, _ts("2024-01-01T10:59:59"))],
        "pid int, ts timestamp")
    intervals = spark.createDataFrame(
        [("i1", _ts("2024-01-01T10:00:00"), _ts("2024-01-01T11:00:00")),
         ("i2", _ts("2024-01-01T10:30:00"), _ts("2024-01-01T12:00:00"))],
        "iid string, s timestamp, e timestamp")
    out = {(r["pid"], r["iid"]) for r in temporal.range_join(
        points, intervals, "ts", "s", "e", bucket_s=900).collect()}
    assert out == {(1, "i1"), (3, "i1"), (3, "i2")}
    # plan is an equi-join on the bucket, not a nested-loop cross join
    plan = temporal.range_join(points, intervals, "ts", "s", "e",
                               bucket_s=900)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_sessionize_gap_boundaries(spark):
    # offsets from t0: gaps between events are 100s, exactly 1800s,
    # and 1801s — the exact-gap event stays (strict >), the next starts
    # a new session
    rows = [(i, 7, _ts("2024-01-01T10:00:00") + dt.timedelta(seconds=s))
            for i, s in enumerate([0, 100, 1900, 3701])]
    df = spark.createDataFrame(rows, "event_id int, user_id int, ts timestamp")
    out = {r["event_id"]: r["session_seq"] for r in temporal.sessionize(
        df, "user_id", "ts", gap_s=1800, id_col="event_id").collect()}
    assert out == {0: 1, 1: 1, 2: 1, 3: 2}
    stats = temporal.session_stats(
        temporal.sessionize(df, "user_id", "ts", gap_s=1800,
                            id_col="event_id"), "user_id", "ts").collect()
    assert {r["n_events"] for r in stats} == {3, 1}


def test_rollup_cascade_levels_consistent(spark):
    rows = [(i, "click" if i % 2 else "view",
             _ts("2024-01-01T00:00:00") + dt.timedelta(minutes=37 * i), 1.5)
            for i in range(100)]
    df = spark.createDataFrame(rows, "event_id int, event_type string, "
                                     "ts timestamp, value double")
    out = temporal.rollup_cascade(df, "ts", ["event_type"],
                                  ["hour", "day", "month"], value_col="value")
    by_res = {r: [x for x in out.collect() if x["resolution"] == r]
              for r in ("hour", "day", "month")}
    # every level preserves totals exactly
    for res in ("hour", "day", "month"):
        assert sum(x["n_events"] for x in by_res[res]) == 100
        assert abs(sum(x["sum_value"] for x in by_res[res]) - 150.0) < 1e-9
    assert len(by_res["hour"]) > len(by_res["day"]) >= len(by_res["month"])


def test_resample_ffill_fills_gaps_and_latest_wins(spark):
    import datetime as dt
    from memory_engine_spark.operators.temporal import resample_ffill
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        ("a", t0, 1.0),
        ("a", t0 + dt.timedelta(seconds=25), 2.0),   # same slot as :20
        ("a", t0 + dt.timedelta(seconds=95), 5.0),   # slot 9, gap 2..8
        ("b", t0 + dt.timedelta(seconds=10), 7.0),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    out = {(r["k"], r["ts"]): r["v"] for r in
           resample_ffill(df, "k", "ts", ["v"], step_s=10).collect()}
    def at(s):
        return t0 + dt.timedelta(seconds=s)
    # slot 0 has one obs; slot 2 holds BOTH :20 and :25 -> latest wins
    assert out[("a", at(0))] == 1.0
    assert out[("a", at(20))] == 2.0
    # gap slots carry the last value forward
    assert out[("a", at(30))] == 2.0
    assert out[("a", at(80))] == 2.0
    assert out[("a", at(90))] == 5.0
    # key b spans a single slot; no rows before its first observation
    assert out[("b", at(10))] == 7.0
    assert ("b", at(0)) not in out
    # row count = sum of spans
    assert len(out) == 10 + 1


def test_funnel_ordered_matching_and_no_step_skipping(spark):
    import datetime as dt
    from memory_engine_spark.operators.temporal import funnel
    t0 = dt.datetime(2024, 1, 1)
    def at(s):
        return t0 + dt.timedelta(seconds=s)
    rows = [
        # u1 completes all: signup(0) view(10) click(20) purchase(30)
        (1, at(0), "signup"), (1, at(10), "view"),
        (1, at(20), "click"), (1, at(30), "purchase"),
        # u2: view BEFORE signup -> stuck at 1 even though click later
        (2, at(5), "view"), (2, at(10), "signup"), (2, at(20), "click"),
        # u3: signup only
        (3, at(0), "signup"),
        # u4: no signup -> absent
        (4, at(0), "view"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, et string")
    out = {r["user_id"]: r for r in
           funnel(df, "user_id", "ts", "et",
                  ["signup", "view", "click", "purchase"]).collect()}
    assert out[1]["n_steps"] == 4 and out[1]["last_ts"] == at(30)
    # u2 must NOT skip to click: no view after signup
    assert out[2]["n_steps"] == 1
    assert out[3]["n_steps"] == 1
    assert 4 not in out


def test_funnel_within_bound(spark):
    import datetime as dt
    from memory_engine_spark.operators.temporal import funnel
    t0 = dt.datetime(2024, 1, 1)
    rows = [(1, t0, "signup"),
            (1, t0 + dt.timedelta(seconds=100), "view")]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, et string")
    out = funnel(df, "user_id", "ts", "et", ["signup", "view"],
                 within_s=50).collect()[0]
    assert out["n_steps"] == 1  # view arrived outside the window


def test_cohort_retention_triangle(spark):
    import datetime as dt
    from memory_engine_spark.operators.temporal import cohort_retention
    day = 86400
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, t0), (1, t0 + dt.timedelta(days=1)),   # cohort 0, active d0+d1
        (2, t0),                                    # cohort 0, d0 only
        (3, t0 + dt.timedelta(days=1)),             # cohort 1, d1 only
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = {(r["cohort"], r["period_offset"]):
           (r["n_active"], r["cohort_size"], r["retention"]) for r in
           cohort_retention(df, "user_id", "ts", period_s=day).collect()}
    c0 = min(k[0] for k in out)
    assert out[(c0, 0)] == (2, 2, 1.0)
    assert out[(c0, 1)] == (1, 2, 0.5)
    assert out[(c0 + 1, 0)] == (1, 1, 1.0)
