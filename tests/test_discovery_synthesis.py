"""Relationship discovery + synthesis semantics vs hand-computed values
(relationship_extractor.py thresholds; insight_discovery.py stats)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from memory_engine_spark.operators import discovery, synthesis


@pytest.fixture(scope="module")
def nodes(spark):
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        # id, text, tags, source, ts
        (1, "apple banana cherry fruit market", "fruit,food", "web",
         t0),
        (2, "apple banana cherry fruit store", "fruit,food,shop", "web",
         t0 + dt.timedelta(minutes=30)),
        (3, "cars engines wheels roads traffic", "cars", "web",
         t0 + dt.timedelta(hours=5)),
        (4, "apple banana grape fruit market", "food,drink", "book",
         t0 + dt.timedelta(minutes=45)),
        (5, "unrelated text entirely different", "misc", "book",
         t0 + dt.timedelta(days=2)),
    ]
    return spark.createDataFrame(
        rows, "id int, text string, tags string, source string, ts timestamp")


def test_similar_tags_threshold(nodes):
    got = {(r["a"], r["b"]): r["confidence"] for r in
           discovery.similar_tags(nodes, "tags", "id").collect()}
    # tags(1)={fruit,food}, tags(2)={fruit,food,shop} → J=2/3 > 0.3
    assert abs(got[(1, 2)] - 2 / 3) < 1e-6
    # tags(1)={fruit,food} vs tags(4)={food,drink} → J=1/3 > 0.3 ✓
    assert abs(got[(1, 4)] - 1 / 3) < 1e-6
    # tags(2) vs tags(4): {fruit,food,shop}∩{food,drink}=1, ∪=4 → 0.25 < 0.3 ✗
    assert (2, 4) not in got


def test_similar_content_threshold(nodes):
    got = {(r["a"], r["b"]): r["confidence"] for r in
           discovery.similar_content(nodes, "text", "id").collect()}
    # words(1)={apple,banana,cherry,fruit,market}, words(2)=...{store}
    # J = 4/6 = 0.667 > 0.4 ✓
    assert abs(got[(1, 2)] - 4 / 6) < 1e-6
    assert (1, 3) not in got


def test_same_source(nodes):
    got = {(r["a"], r["b"]) for r in
           discovery.same_source(nodes, "source", "id").collect()}
    assert got == {(1, 2), (1, 3), (2, 3), (4, 5)}


def test_temporal_proximity_window_and_confidence(nodes):
    got = {(r["a"], r["b"]): r["confidence"] for r in
           discovery.temporal_proximity(nodes, "ts", "id").collect()}
    # 1-2: Δt=1800s → conf = max(0.5, 1-0.5) = 0.5
    # 1-4: Δt=2700s → conf = max(0.5, 0.25) = 0.5
    # 2-4: Δt=900s  → conf = 0.75
    assert set(got) == {(1, 2), (1, 4), (2, 4)}
    assert abs(got[(2, 4)] - 0.75) < 1e-6
    assert got[(1, 2)] == 0.5


def test_discover_all_union(nodes):
    out = discovery.discover_all(nodes, "id", text_col="text", tags_col="tags",
                                 source_col="source", ts_col="ts")
    kinds = {r["relation_type"] for r in out.collect()}
    assert kinds == {"SIMILAR_TAGS", "SIMILAR_CONTENT", "SAME_SOURCE",
                     "TEMPORAL_PROXIMITY"}


def test_related_by_shared_tag(nodes):
    got = {(r["a"], r["b"]) for r in
           discovery.related_by_shared_tag(nodes, "tags", "id").collect()}
    assert (1, 2) in got and (1, 4) in got and (2, 4) in got
    assert (3, 5) not in got


def test_term_cooccurrence(nodes):
    got = {(r["t1"], r["t2"]): r["n_docs"] for r in
           synthesis.term_cooccurrence(nodes, "text", "id", min_count=3).collect()}
    # apple+banana+fruit in docs 1,2,4
    assert got[("apple", "banana")] == 3
    assert got[("banana", "fruit")] == 3


def test_relation_chains(spark):
    edges = spark.createDataFrame(
        [("a", "b", "is_a"), ("b", "c", "is_a"), ("c", "d", "is_a"),
         ("x", "y", "causes")],
        "from_id string, to_id string, relation_type string")
    chains = {tuple(r["path"]) for r in
              synthesis.relation_chains(edges, ["is_a"], max_len=4).collect()}
    assert ("a", "b") in chains and ("a", "b", "c") in chains
    assert ("a", "b", "c", "d") in chains
    assert ("x", "y") not in chains


def test_monthly_trend_slope(spark):
    rows = [(dt.datetime(2024, m, 1),) for m in (1, 1, 2, 2, 2, 3, 3, 3, 3)]
    df = spark.createDataFrame(rows, "ts timestamp")
    r = synthesis.monthly_trend(df, "ts").collect()[0]
    assert r["slope"] == 1.0          # counts 2,3,4 → slope exactly 1
    assert r["growth_rate"] == 1.0    # (4-2)/2
    assert r["n_periods"] == 3


def test_sudden_changes(spark):
    rows = ([(dt.datetime(2024, 1, 1, 10),)] * 4
            + [(dt.datetime(2024, 1, 2, 10),)] * 10
            + [(dt.datetime(2024, 1, 3, 10),)] * 9)
    df = spark.createDataFrame(rows, "ts timestamp")
    got = {r["bucket"]: r["change_ratio"] for r in
           synthesis.sudden_changes(df, "ts").collect()}
    assert got == {"2024-01-02": 1.5}  # 4→10 = +150%; 10→9 = 10% no


def test_structural_anomalies(spark):
    edges = spark.createDataFrame(
        [("h", f"x{i}", "r", 0.5) for i in range(10)],
        "from_id string, to_id string, relation_type string, confidence_score double")
    nodes = spark.createDataFrame(
        [("h",), ("x1",), ("lonely",)], "node_id string")
    got = {r["node_id"]: r["kind"] for r in
           synthesis.structural_anomalies(edges, nodes, hub_degree=10).collect()}
    assert got == {"h": "hub", "lonely": "isolated"}


def test_temporal_bursts_and_gaps(spark):
    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [(base + dt.timedelta(seconds=s),) for s in (0, 1, 2, 3, 4, 3600, 7200)]
    df = spark.createDataFrame(rows, "ts timestamp")
    bursts = synthesis.temporal_bursts(df, "ts", "ts", burst_window_s=60,
                                       min_burst=5).collect()
    assert len(bursts) == 1 and bursts[0]["n"] == 5
    gaps = synthesis.temporal_gaps(df, "ts", min_gap_s=3000).collect()
    assert len(gaps) == 2


def test_contradictions(spark):
    rows = [
        (1, "the sky is blue today", 0.9),
        (2, "the sky is not blue today", 0.9),
        (3, "the sky is blue today", 0.5),      # below confidence gate
        (4, "bananas are yellow fruit", 0.95),
    ]
    df = spark.createDataFrame(rows, "id int, text string, conf double")
    got = {(r["a"], r["b"]) for r in
           synthesis.detect_contradictions(df, "text", "id", "conf").collect()}
    assert got == {(1, 2)}


def test_connected_components_long_chain_pointer_jump(spark):
    """A 120-node path converges within max_iter=20: plain O(diameter)
    propagation could not (120 rounds needed); the round-3+ pointer
    jump gives path doubling."""
    from memory_engine_spark.operators.components import connected_components

    edges = spark.createDataFrame(
        [(f"n{i:03d}", f"n{i+1:03d}") for i in range(119)],
        "from_id string, to_id string")
    comp = connected_components(edges, max_iter=20)
    rows = comp.collect()
    assert len(rows) == 120
    assert {r["component"] for r in rows} == {"n000"}


def test_rolling_zscore_flags_local_spike_not_level_shift(spark):
    import datetime as dt
    from memory_engine_spark.operators.synthesis import (
        rolling_zscore_anomalies)
    t0 = dt.datetime(2024, 1, 1)
    rows = []
    # stable series with one spike at position 15
    for i in range(30):
        v = 100.0 if i == 15 else 10.0 + (i % 3)  # mild variation
        rows.append((1, i, t0 + dt.timedelta(minutes=i), v))
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, value double")
    out = rolling_zscore_anomalies(df, "user_id", "ts", "value",
                                   window_rows=10, z_threshold=2.5,
                                   id_col="event_id").collect()
    spikes = [r for r in out if r["value"] == 100.0]
    # self-inclusion dilutes the spike into its own window:
    # z lands ~2.85 here, which is why 2.5 is the working threshold
    assert len(spikes) == 1 and spikes[0]["z"] > 2.5
    # constant-window rows (std 0) and warm-up rows never flag
    assert all(r["value"] == 100.0 for r in out)


def test_merge_agg_deltas_ivm_semantics(spark):
    """IVM merge: insert into a new group creates it, deletes that
    zero a group's count kill it, updates change measures without
    touching counts, measure-mismatch raises."""
    import pytest

    from memory_engine_spark.operators.aggregates import (
        merge_agg_deltas)

    view = spark.createDataFrame(
        [("a", 2, 100), ("b", 1, 50)], "k string, n long, s long")
    delta = spark.createDataFrame(
        [("a", 0, -10),     # update: measure only
         ("b", -1, -50),    # delete last row -> group dies
         ("c", 3, 70)],     # brand-new group
        "k string, n long, s long")
    out = {r["k"]: r for r in
           merge_agg_deltas(view, delta, ["k"]).collect()}
    assert set(out) == {"a", "c"}
    assert (out["a"]["n"], out["a"]["s"]) == (2, 90)
    assert (out["c"]["n"], out["c"]["s"]) == (3, 70)
    bad = spark.createDataFrame([("a", 1)], "k string, n long")
    with pytest.raises(ValueError, match="measures"):
        merge_agg_deltas(view, bad, ["k"])
