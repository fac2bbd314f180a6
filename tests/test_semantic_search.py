"""engine.semantic_search end-to-end with the deterministic provider."""

from __future__ import annotations

from pyspark.sql import functions as F

from memory_engine_spark.engine import MemoryEngine
from memory_engine_spark.operators.ingestion import embed_column
from memory_engine_spark.session import EngineSession


def test_semantic_search_finds_same_text(spark):
    s = EngineSession(spark)
    docs = spark.createDataFrame(
        [("n1", "distributed spark joins shuffle data"),
         ("n2", "gardening tulips bloom in spring"),
         ("n3", "spark shuffle exchange partitions data")],
        "node_id string, content string")
    emb = embed_column(docs, "content", dim=64).select("node_id", "embedding")
    s.register("embeddings", emb)
    eng = MemoryEngine(s)

    # query identical to n2's text → top hit n2 with similarity ~1
    out = eng.semantic_search("gardening tulips bloom in spring", k=2,
                              similarity_threshold=0.95)
    rows = out.collect()
    assert rows and rows[0]["node_id"] == "n2"
    assert rows[0]["score"] > 0.999
    # clamped threshold (0.95→0.85) still excludes unrelated docs
    assert all(r["node_id"] == "n2" for r in rows)

    # topically-related query ranks the two spark docs first
    out2 = eng.semantic_search("spark data shuffle", k=2,
                               similarity_threshold=0.1)
    assert {r["node_id"] for r in out2.collect()} == {"n1", "n3"}
