"""Perspective analysis, NL query parsing, plugin registry."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from memory_engine_spark.operators import perspectives
from memory_engine_spark.plans.nlq import parse_nl_query
from memory_engine_spark.plugins import REGISTRY, FallbackChain


def test_viewpoints_and_consensus(spark):
    df = spark.createDataFrame(
        [(1, "spark is fast and distributed", "pro"),
         (2, "spark is fast and scalable", "pro"),
         (3, "spark is fast but distributed complexity", "con"),
         (4, "gardening tulips in spring", "pro")],
        "id int, body string, stance string")
    vp = perspectives.viewpoint_groups(df, "body", "id",
                                       similarity_threshold=0.3, ngram=1)
    groups = {r["id"]: r["viewpoint"] for r in vp.collect()}
    assert groups["1"] == groups["2"] == groups["3"]
    assert groups["4"] == "4"  # singleton keeps own id

    cons = {r["viewpoint"]: r for r in
            perspectives.perspective_consensus(df, "stance", "id", vp).collect()}
    g = cons[groups["1"]]
    assert g["n_members"] == 3 and g["dominant_stance"] == "pro"
    assert abs(g["consensus_ratio"] - 2 / 3) < 1e-6
    assert g["consensus"] == "moderate"           # 0.667 in (0.6, 0.8]
    assert cons["4"]["consensus"] == "strong"     # 1.0


def test_parse_nl_query_intents():
    p = parse_nl_query("how many nodes from source wikipedia")
    assert p.intent == "aggregation"
    assert any(f.field == "source" and f.value == "wikipedia" for f in p.spec.filters)
    assert p.spec.aggregations and p.spec.aggregations[0].op == "count"

    p2 = parse_nl_query("show me the latest nodes with rating above 0.7")
    assert p2.intent == "temporal"
    assert p2.spec.sorts and not p2.spec.sorts[0].ascending
    assert any(f.op == "gt" and f.value == 0.7 for f in p2.spec.filters)

    p3 = parse_nl_query("oldest entries containing 'spark'")
    assert p3.spec.sorts[0].ascending
    assert any(f.op == "contains" for f in p3.spec.filters)

    p4 = parse_nl_query("machine learning pipelines")
    assert p4.intent == "text_search" and "machine" in p4.search_terms
    assert p4.confidence == 0.5


def test_llm_parse_seam():
    hints = {"filters": [{"field": "source", "op": "eq", "value": "x"}],
             "intent": "semantic_search", "confidence": 0.9}
    p = parse_nl_query("anything", llm_parse=lambda q: hints)
    assert p.intent == "semantic_search" and p.confidence == 0.9
    assert p.spec.filters[-1].value == "x"


def test_registry_and_fallback():
    emb = REGISTRY.get("embedding", "hashed_projection")(dim=8)
    vecs = emb(["a", "b"])
    assert len(vecs) == 2 and len(vecs[0]) == 8
    with pytest.raises(KeyError, match="no 'embedding' provider named"):
        REGISTRY.get("embedding", "nonexistent")

    calls = []

    def bad(x):
        calls.append("bad")
        raise RuntimeError("down")

    def good(x):
        return x * 2

    chain = FallbackChain([("bad", bad), ("good", good)], failure_threshold=1)
    assert chain.call(3) == 6
    # circuit open (threshold 1): bad is skipped on the next call
    assert chain.call(4) == 8 and calls == ["bad"]


def test_cli_query_and_search(capsys):
    import json
    import memory_engine_cli as cli
    rc = cli.main(["--tables", "/root/testdata/sf0.001", "query",
                   "--entity", "orders",
                   "--filter", "o_orderstatus", "eq", "O",
                   "--sort", "o_totalprice", "DESC", "--limit", "3",
                   "--select", "o_orderkey", "o_totalprice"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert len(out["results"]) == 3
    prices = [r["o_totalprice"] for r in out["results"]]
    assert prices == sorted(prices, reverse=True)

    rc = cli.main(["--tables", "/root/testdata/sf0.001", "search",
                   "--text", "spark join filter", "--entity", "documents",
                   "--text-col", "text", "--limit", "2"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert len(out["results"]) == 2


def test_cli_nlq_export_replay(capsys, tmp_path):
    import json
    import memory_engine_cli as cli

    rc = cli.main(["--tables", "/root/testdata/sf0.001", "nlq",
                   "--question", "how many orders are there",
                   "--entity", "orders"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert out["intent"] == "aggregation"

    dest = str(tmp_path / "region_out")
    rc = cli.main(["--tables", "/root/testdata/sf0.001", "export",
                   "--entity", "region", "--fmt", "json", "--out", dest])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert out["rows"] == 5

    import datetime as dt

    from memory_engine_spark.session import get_spark
    from memory_engine_spark.streaming.events import EventBus
    spark = get_spark()
    bus = EventBus(spark, str(tmp_path / "bus"))
    bus.publish(spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 5), 1, "click", 1.0, "{}")],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"))
    rc = cli.main(["--tables", "/root/testdata/sf0.001", "replay",
                   "--events-dir", str(tmp_path / "bus"),
                   "--from-timestamp", "2024-01-01 00:00:00"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert out["replayed"] == 1


def test_classify_perspective_types(spark):
    from memory_engine_spark.operators import perspectives as pers

    df = spark.createDataFrame(
        [("o", "however this contradicts the earlier result"),
         ("c", "furthermore this confirms the hypothesis"),
         ("a", "alternatively use a different route"),
         ("s", "experts believe the cache is too small"),
         ("m", "the framework paradigm guides the design"),
         ("n", "plain statement with no markers")],
        "pid string, text string")
    got = {r["pid"]: r["pt"] for r in df.select(
        "pid", pers.classify_perspective(F.col("text")).alias("pt")).collect()}
    assert got == {"o": "opposing", "c": "complementary", "a": "alternative",
                   "s": "stakeholder", "m": "methodological", "n": "none"}
    # first-match priority: 'however' (opposing) beats 'method'
    both = spark.createDataFrame(
        [("x", "however the method differs")], "pid string, text string")
    assert both.select(pers.classify_perspective(F.col("text"))
                       .alias("pt")).first()["pt"] == "opposing"
    # temporal fallback when a timestamp rides along
    ts = spark.createDataFrame([("t", "no markers here", "2024-01-01")],
                               "pid string, text string, ts string")
    assert ts.select(pers.classify_perspective(
        F.col("text"), F.col("ts")).alias("pt")).first()["pt"] == "temporal"


def test_compare_perspectives_levels(spark):
    from memory_engine_spark.operators import perspectives as pers

    df = spark.createDataFrame(
        [("p1", "t1", "the cache speeds up reads a lot", "same", "n1,n2"),
         ("p2", "t1", "the cache speeds up reads a lot", "same", "n1,n2"),
         ("p3", "t2", "apples grow on trees", "x", "n3"),
         ("p4", "t2", "submarines dive very deep", "y", "n4"),
         ("p5", "t3", "only one voice here", "z", "n5")],
        "pid string, topic string, text string, claims string, evidence string")
    typed = df.withColumn("ptype", F.lit("none"))
    out = {r["topic"]: r for r in pers.compare_perspectives(
        typed, "topic", "text", "pid", type_col="ptype",
        claims_col="claims", evidence_col="evidence").collect()}
    # identical texts/claims/evidence -> sim 1.0 -> strong consensus
    assert out["t1"]["consensus_level"] == "strong_consensus"
    assert out["t1"]["avg_similarity"] == 1.0
    # fully disjoint -> 0 -> strong disagreement
    assert out["t2"]["consensus_level"] == "strong_disagreement"
    # single perspective -> strong consensus by definition
    assert out["t3"]["consensus_level"] == "strong_consensus"
    assert out["t3"]["n_perspectives"] == 1


def test_perspective_similarity_type_penalty(spark):
    from memory_engine_spark.operators import perspectives as pers

    df = spark.createDataFrame(
        [("a1", "t", "same words here", "opposing"),
         ("a2", "t", "same words here", "complementary")],
        "pid string, topic string, text string, ptype string")
    sim = pers.perspective_similarity_pairs(
        df, "topic", "text", "pid", type_col="ptype").first()["similarity"]
    assert abs(sim - 0.3) < 1e-9  # 1.0*0.5 - 0.2 penalty


def test_circuit_breaker_state_machine():
    from memory_engine_spark.plugins import CircuitBreaker

    t = [1000.0]
    cb = CircuitBreaker(failure_threshold=3, timeout_s=60, clock=lambda: t[0])
    assert cb.state("p") == "closed" and cb.allow("p")
    cb.record("p", False); cb.record("p", False)
    assert cb.state("p") == "closed"        # below threshold
    cb.record("p", False)
    assert cb.state("p") == "open"          # threshold reached
    assert not cb.allow("p")                # rejected while open
    t[0] += 61                              # timeout elapses
    assert cb.allow("p")                    # half-open probe admitted
    assert cb.state("p") == "half_open"
    cb.record("p", False)                   # probe fails -> re-open
    assert cb.state("p") == "open"
    assert not cb.allow("p")
    t[0] += 61
    assert cb.allow("p")
    cb.record("p", True)                    # probe succeeds -> closed
    assert cb.state("p") == "closed"
    assert cb._breaker("p")["failure_count"] == 0


def test_fallback_chain_skips_open_breaker():
    from memory_engine_spark.plugins import FallbackChain

    t = [0.0]
    calls = {"flaky": 0, "good": 0}

    def flaky(x):
        calls["flaky"] += 1
        raise RuntimeError("boom")

    def good(x):
        calls["good"] += 1
        return x * 2

    chain = FallbackChain([("flaky", flaky), ("good", good)],
                          failure_threshold=2, cooldown_s=60,
                          clock=lambda: t[0])
    assert chain.call(3) == 6 and calls == {"flaky": 1, "good": 1}
    chain.call(1)                            # second failure opens breaker
    assert chain.breaker.state("flaky") == "open"
    chain.call(1)
    assert calls["flaky"] == 2               # open breaker skipped
    t[0] += 61
    chain.call(1)                            # half-open probe retries flaky
    assert calls["flaky"] == 3
    assert chain.breaker.state("flaky") == "open"  # probe failed again


def test_fallback_chain_all_fail():
    from memory_engine_spark.plugins import FallbackChain

    chain = FallbackChain([("a", lambda: 1 / 0), ("b", lambda: 1 / 0)])
    import pytest as _pytest
    with _pytest.raises(RuntimeError, match="all providers failed"):
        chain.call()


def test_cli_dedup_corpus_sessionize_backup(capsys, tmp_path):
    import json
    import memory_engine_cli as cli

    rc = cli.main(["--tables", "/root/testdata/sf0.001", "dedup",
                   "--method", "exact", "--entity", "part",
                   "--text-col", "p_type", "--id-col", "p_partkey"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert out["method"] == "exact" and out["n_reported"] > 0

    rc = cli.main(["--tables", "/root/testdata/sf0.001", "corpus-filter",
                   "--limit", "3"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert out["n_docs"] > 0 and "n_dropped" in out

    rc = cli.main(["--tables", "/root/testdata/sf0.001", "sessionize",
                   "--gap-s", "3600", "--limit", "5"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert out["n_sessions"] > 0 and len(out["top"]) == 5

    rc = cli.main(["--tables", "/root/testdata/sf0.001", "backup",
                   "--out", str(tmp_path / "clibk"),
                   "--entities", "region", "nation"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert out["tables"]["region"] == 5


def test_perspective_report_fields(spark):
    """Report-level parity fields (perspective_analysis.py:96-110):
    per-type doc counts, confidence/evidence formulas, opposing pair
    detection, single-perspective topics as strong_consensus."""
    from memory_engine_spark.operators.perspectives import perspective_report

    rows = [
        # topic t1: two perspectives, textually opposing ('good'/'bad')
        ("t1", 1, "however this is good stuff"),           # opposing
        ("t1", 2, "additionally it is bad stuff"),         # complementary
        ("t1", 3, "additionally more of the same stuff"),  # complementary
        # topic t2: single perspective
        ("t2", 4, "the methodology is sound"),             # methodological
        # topic t3: nothing classifiable
        ("t3", 5, "plain text"),
    ]
    df = spark.createDataFrame(rows, "topic string, id long, text string")
    out = {r["topic"]: r for r in
           perspective_report(df, "topic", "text", "id").collect()}

    assert set(out) == {"t1", "t2"}  # t3 has no perspectives at all
    t1 = out["t1"]
    assert t1["n_perspectives"] == 2
    assert t1["n_opposing"] == 1 and t1["n_complementary"] == 2
    assert t1["dominant_type"] == "complementary"
    assert t1["n_pairs"] == 1
    # 'opposing' member AND good/bad keyword pair both flag the pair
    assert t1["n_opposing_pairs"] == 1
    assert t1["matrix"].startswith("complementary|opposing|")
    # confidence: [min(1/5,1)*0.6+0.2, min(2/5,1)*0.6+0.2] =
    # [0.32, 0.44] -> avg 0.38
    assert abs(t1["avg_confidence"] - 0.38) < 1e-9

    t2 = out["t2"]
    assert t2["n_perspectives"] == 1
    assert t2["consensus_level"] == "strong_consensus"
    assert t2["avg_similarity"] == 1.0 and t2["n_pairs"] == 0
    assert t2["matrix"] == ""
