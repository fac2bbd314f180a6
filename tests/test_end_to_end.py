"""End-to-end user story: raw documents → knowledge graph → engine.

Mirrors the reference's full ingestion+query workflow
(mcp_endpoint.ingest_raw_text → merge_or_create → relationship
extraction → query/search/synthesis) on the driver's documents table.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from memory_engine_spark.engine import MemoryEngine
from memory_engine_spark.operators import discovery, ingestion
from memory_engine_spark.plans.query_spec import QuerySpec
from memory_engine_spark.session import EngineSession


@pytest.fixture(scope="module")
def built_engine(spark):
    """Build the knowledge graph from sf0.001 documents end-to-end."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet") \
        .limit(60)

    # 1. extract knowledge units (deterministic provider) → nodes
    units = ingestion.extract_units(docs, "text", "source")
    nodes = ingestion.units_to_nodes(units).persist()

    # 2. dedup-merge against an initially-empty store → all create
    to_create, merges = ingestion.merge_or_create(
        nodes, nodes.limit(0), dim=64)
    assert merges.isEmpty()

    # 3. relationship discovery (tags + source strategies)
    edges = discovery.discover_all(
        nodes, "node_id", tags_col="tags", source_col="source"
    ).select(F.col("a").alias("from_id"), F.col("b").alias("to_id"),
             "relation_type", F.col("confidence").alias("confidence_score")) \
        .persist()

    # 4. embeddings
    emb = ingestion.embed_column(nodes, "content", dim=64) \
        .select("node_id", "embedding").persist()

    s = EngineSession(spark)
    s.register("nodes", nodes)
    s.register("edges", edges)
    s.register("embeddings", emb)
    return MemoryEngine(s)


def test_graph_built(built_engine):
    n_nodes = built_engine.s.table("nodes").count()
    n_edges = built_engine.s.table("edges").count()
    assert n_nodes >= 50
    assert n_edges > 0
    kinds = {r["relation_type"] for r in
             built_engine.s.table("edges").select("relation_type")
             .distinct().collect()}
    assert "SAME_SOURCE" in kinds


def test_structured_query_over_built_graph(built_engine):
    resp = built_engine.query(
        QuerySpec("nodes").filter("content", "contains", "spark")
        .sort("node_id").page(0, 5), use_cache=False)
    assert resp.total_count > 0
    assert all("spark" in r["content"] for r in resp.results)


def test_ranked_and_semantic_search(built_engine):
    resp = built_engine.search("spark join filter", limit=5)
    assert resp.results
    assert resp.results[0]["combined_score"] > 0

    # query = an existing node's exact content → cosine ≈ 1.0 even after
    # the reference's threshold clamp (<0.5 → 0.6)
    sample = built_engine.s.table("nodes").first()["content"]
    top = built_engine.semantic_search(sample, k=5).collect()
    assert top and top[0]["score"] > 0.999
    scores = [r["score"] for r in top]
    assert scores == sorted(scores, reverse=True)


def test_traverse_and_synthesize(built_engine):
    some = built_engine.s.table("edges").first()
    reach = built_engine.traverse([some["from_id"]], max_depth=2)
    assert reach.count() > 1

    out = built_engine.synthesize("comprehensive",
                                  question="what is described about spark?")
    assert out["patterns"].count() > 0
    assert out["answer"]["confidence"] > 0


def test_rating_update_roundtrip(built_engine):
    nid = built_engine.s.table("nodes").first()["node_id"]
    before = built_engine.s.table("nodes").filter(
        F.col("node_id") == nid).first()["rating_truthfulness"]
    built_engine.update_rating(nid, confirmation=1.0)
    after = built_engine.s.table("nodes").filter(
        F.col("node_id") == nid).first()["rating_truthfulness"]
    assert abs(after - min(1.0, before + 0.2)) < 1e-9


def test_registry_and_oracles_consistent():
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(qs) == set(oracles), (
        "every queries() entry needs an oracle_sql() twin and vice versa")
    assert len(qs) >= 152


def test_q86_hashed_columns_are_integers(spark):
    """Regression guard for the r03/r04 driver-hash flap: the DSIR
    weight must stay a BIGINT micro-unit sum — never a decimal/double
    produced by engine ROUND of ln()."""
    import __spark_entry__ as entrymod

    df = entrymod.queries()["q86_dsir_weights"](
        spark, "/root/testdata/sf0.001")
    kinds = dict(df.dtypes)
    assert kinds["log_weight"] == "bigint"
    assert kinds["n_features"] == "bigint"


def test_tz_drift_guard_raises_and_names_frontier(spark):
    """r12 (r11 verdict item 3): a MID-SESSION session-timezone change
    silently shifts the 5 NTZ-cast queries the registry drill measured
    (REGISTRY.md conf-sensitivity drills). The _t boundary now
    loud-fails instead: after the UTC load pin, any query invoked
    under a drifted zone raises, and the message names the measured
    frontier so the operator knows WHAT would have been wrong."""
    import pytest

    import __spark_entry__ as entrymod

    sf = "/root/testdata/sf0.001"
    # load boundary: first touch pins UTC
    entrymod.queries()["q04_group_key"](spark, sf)
    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        with pytest.raises(RuntimeError) as exc:
            entrymod.queries()["q04_group_key"](spark, sf)
        msg = str(exc.value)
        for q in ("q60_asof_join", "q94_resample_ffill", "q102_funnel",
                  "q105_rolling_zscore", "q117_session_windows"):
            assert q in msg
        assert "REGISTRY.md" in msg
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
    # restored zone: queries run again
    assert entrymod.queries()["q04_group_key"](spark, sf) is not None
