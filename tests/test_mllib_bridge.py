"""MLlib-bridge alternatives: TF-IDF embeddings, MinHashLSH join,
BucketedRandomProjectionLSH neighbors."""

from __future__ import annotations

import math

import pytest

pytest.importorskip("pyspark.ml")

from memory_engine_spark.operators import mllib_bridge

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox jumps over the lazy cat"),
    (3, "completely different content about spark engines"),
]


def test_tfidf_embed(spark):
    df = spark.createDataFrame(DOCS, "id int, body string")
    out = {r["id"]: r["embedding"] for r in
           mllib_bridge.tfidf_embed_column(df, "body", "id").collect()}
    assert len(out) == 3
    for v in out.values():
        norm = math.sqrt(sum(x * x for x in v))
        assert abs(norm - 1.0) < 1e-6  # L2-normalized
    # near-dup docs have high cosine; unrelated doc low
    def cos(a, b):
        return sum(x * y for x, y in zip(a, b))
    assert cos(out[1], out[2]) > 0.6
    assert cos(out[1], out[3]) < cos(out[1], out[2])


def test_minhash_lsh_join(spark):
    df = spark.createDataFrame(DOCS, "id int, body string")
    pairs = {(r["a"], r["b"]): r["jaccard_distance"] for r in
             mllib_bridge.minhash_lsh_join(df, "body", "id",
                                           jaccard_threshold=0.5).collect()}
    # docs 1,2 share 8 of 10 distinct tokens → J=0.8, distance 0.2
    assert (1, 2) in pairs and pairs[(1, 2)] < 0.5
    assert (1, 3) not in pairs


def test_brp_lsh_neighbors(spark):
    vecs = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [0.1, 0.0]), (3, [50.0, 50.0])],
        "id int, v array<double>")
    pairs = {(r["a"], r["b"]): r["l2_distance"] for r in
             mllib_bridge.random_projection_neighbors(
                 vecs, threshold_l2=1.0, id_col="id", vec_col="v").collect()}
    assert (1, 2) in pairs and abs(pairs[(1, 2)] - 0.1) < 1e-6
    assert all(3 not in p for p in pairs)
