"""Ingestion pipeline: knowledge-unit extraction, deterministic
embedding provider, merge-or-create dedup.

Reference:
- unit extraction (LLM boundary with structured output):
  /root/reference/memory_core/ingestion/advanced_extractor.py:51-193 —
  text → units {content, tags, metadata(importance, confidence_level),
  source}; unit→node mapping rules (:124-183).
- embedding generation (provider boundary, LRU+TTL cache, batch):
  /root/reference/memory_core/embeddings/embedding_manager.py:110-306.
- merge_or_create: embed → vector top-1 → merge if score ≥ 0.9 (0.92 in
  ingestion) else create: /root/reference/memory_core/ingestion/merging.py:17-111,
  threshold /root/reference/memory_core/ingestion/advanced_extractor.py:183.

Spark-first: both "LLM" boundaries are pluggable batch callables wrapped
as Arrow-vectorized Pandas UDFs (the reference's provider interface,
llm_provider_interface.py:16-26, becomes a function registry). The
default providers are DETERMINISTIC rule-based fallbacks so tests and
oracle runs are stable — swap in a real provider at the same seam.

The default embedding is a hashed-projection bag-of-words: token t adds
±1/√dim at dimensions chosen by two stable hashes (the classic feature-
hashing/SimHash-style projection), L2-normalized. Deterministic across
processes (md5-based), vectorized in NumPy per Arrow batch.
"""

from __future__ import annotations

import hashlib
import re
from typing import Callable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType
from pyspark.sql.window import Window

DEFAULT_DIM = 768          # vector_store_interface.py:62
MERGE_THRESHOLD = 0.9      # merging.py:22
INGEST_MERGE_THRESHOLD = 0.92  # advanced_extractor.py:183

_TOKEN_RE = re.compile(r"[a-z0-9]+")


def _hash32(data: str) -> int:
    return int.from_bytes(hashlib.md5(data.encode()).digest()[:4], "little")


def embed_text(text: str, dim: int = DEFAULT_DIM) -> np.ndarray:
    """Deterministic hashed-projection embedding of one text."""
    v = np.zeros(dim, dtype=np.float64)
    for tok in _TOKEN_RE.findall(text.lower()):
        h = _hash32(tok)
        idx = h % dim
        sign = 1.0 if (h >> 16) % 2 == 0 else -1.0
        v[idx] += sign
    n = np.linalg.norm(v)
    return (v / n if n > 0 else v).astype(np.float32)


def embed_texts_batch(texts: list[str], dim: int = DEFAULT_DIM) -> list:
    """Batch twin of ``embed_text`` with a per-batch token→(index, sign)
    cache: corpus vocabulary repeats heavily across an Arrow batch, so
    each distinct token pays its md5 exactly once instead of once per
    occurrence. Bit-identical to the scalar path."""
    cache: dict[str, tuple[int, float]] = {}
    out = []
    for t in texts:
        v = np.zeros(dim, dtype=np.float64)
        for tok in _TOKEN_RE.findall(t.lower()):
            e = cache.get(tok)
            if e is None:
                h = _hash32(tok)
                e = (h % dim, 1.0 if (h >> 16) % 2 == 0 else -1.0)
                cache[tok] = e
            v[e[0]] += e[1]
        n = np.linalg.norm(v)
        out.append((v / n if n > 0 else v).astype(np.float32))
    return out


def embedding_udf(dim: int = DEFAULT_DIM,
                  provider: Callable[[list[str]], list[list[float]]] | None = None):
    """Arrow-batched embedding UDF. ``provider`` is the pluggable batch
    boundary (list[str] → list[vector]); default = hashed projection.
    mapInPandas-compatible shape lives in ``embed_column``."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(ArrayType(FloatType()))
    def _embed(texts: pd.Series) -> pd.Series:
        if provider is not None:
            return pd.Series(provider(texts.fillna("").tolist()))
        return pd.Series(embed_texts_batch(texts.fillna("").tolist(), dim))

    return _embed


def embed_column(df: DataFrame, text_col: str, out_col: str = "embedding",
                 dim: int = DEFAULT_DIM, provider=None) -> DataFrame:
    """Add an embedding column. Batch-amortized like the reference's bulk
    path (bulk_processor.py:227-335); dedupe identical texts BEFORE the
    provider call (the reference's embedding cache, embedding_manager.py:31-109,
    expressed relationally): embed distinct texts, broadcast-join back.
    Join key is md5(text), not the raw text — at pipeline scale a
    full-document join key would shuffle every document body twice.
    NULL text never enters the provider and keeps a NULL embedding
    (md5(NULL) is NULL, so the left join finds no match)."""
    key = F.md5(F.col(text_col).cast("string"))
    distinct = (df.select(F.col(text_col).alias("_txt"))
                .where(F.col("_txt").isNotNull()).distinct())
    embedded = (distinct
                .withColumn(out_col, embedding_udf(dim, provider)(F.col("_txt")))
                .select(F.md5(F.col("_txt").cast("string")).alias("_tk"), out_col))
    return df.join(embedded, key == F.col("_tk"), "left").drop("_tk")


# ---------------------------------------------------------------------------
# knowledge-unit extraction (deterministic fallback provider)
# ---------------------------------------------------------------------------

def extract_units(df: DataFrame, text_col: str, source_col: str | None = None,
                  max_tags: int = 5) -> DataFrame:
    """Rule-based extract_knowledge_units fallback: one unit per
    sentence-ish span ≥ 20 chars, tags = top-N distinct long tokens,
    importance = clamped length/100 (mirrors the unit→node mapping shape
    of advanced_extractor.py:124-183 without the LLM). Pure built-ins:
    split + explode + expressions."""
    sent = F.explode(F.filter(
        F.split(F.col(text_col), r"[.!?\n]+"),
        lambda s: F.length(F.trim(s)) >= 20))
    base = df.select(
        sent.alias("_span"),
        (F.col(source_col) if source_col else F.lit("unknown")).alias("source"),
    ).select(F.trim("_span").alias("content"), "source")
    toks = F.filter(
        F.split(F.regexp_replace(F.lower(F.col("content")), "[^a-z0-9]+", " "), " "),
        lambda x: F.length(x) >= 4)
    return base.select(
        "content",
        "source",
        F.concat_ws(",", F.slice(F.array_distinct(toks), 1, max_tags)).alias("tags"),
        F.round(F.least(F.length("content") / F.lit(100.0), F.lit(1.0)), 6)
        .alias("importance"),
    )


def units_to_nodes(units: DataFrame, id_prefix: str = "node") -> DataFrame:
    """Unit→node mapping (advanced_extractor.py:124-183): stable content
    hash id, default 0.5 ratings, importance→richness blend."""
    return units.select(
        F.concat(F.lit(f"{id_prefix}_"), F.md5("content")).alias("node_id"),
        "content", "source", "tags",
        F.round(0.5 + 0.5 * F.col("importance"), 6).alias("rating_richness"),
        F.lit(0.5).alias("rating_truthfulness"),
        F.lit(0.5).alias("rating_stability"),
    ).dropDuplicates(["node_id"])


# ---------------------------------------------------------------------------
# merge-or-create
# ---------------------------------------------------------------------------

def merge_or_create(new_nodes: DataFrame, existing: DataFrame,
                    threshold: float = INGEST_MERGE_THRESHOLD,
                    text_col: str = "content", id_col: str = "node_id",
                    dim: int = 64) -> tuple[DataFrame, DataFrame]:
    """Batch merge_or_create_node (merging.py:17-111): embed new
    contents, top-1 similarity against existing embeddings; score ≥
    threshold → (new → existing) merge pair, else create.

    Returns (to_create, merge_pairs(new_id, existing_id, score)).
    Embeddings on both sides from the deterministic provider; the top-1
    search is the batch crossjoin_topk (broadcast the smaller side).
    """
    new_e = embed_column(new_nodes.select(F.col(id_col).alias("new_id"),
                                          F.col(text_col).alias("_c")),
                         "_c", "qv", dim=dim)
    old_e = embed_column(existing.select(F.col(id_col).alias("old_id"),
                                         F.col(text_col).alias("_c")),
                         "_c", "ev", dim=dim).select("old_id", "ev")

    from memory_engine_spark.functions.vector import cosine_similarity

    scored = old_e.join(F.broadcast(new_e.select("new_id", "qv"))) \
        .withColumn("score", cosine_similarity(F.col("ev"), F.col("qv")))
    w = Window.partitionBy("new_id").orderBy(F.col("score").desc(),
                                             F.col("old_id").asc())
    top1 = (scored.withColumn("rn", F.row_number().over(w)).filter("rn = 1")
            .select("new_id", F.col("old_id").alias("existing_id"),
                    F.round("score", 6).alias("score")))
    merge_pairs = top1.filter(F.col("score") >= threshold)
    to_create = new_nodes.join(
        merge_pairs.select(F.col("new_id").alias(id_col)), id_col, "left_anti")
    return to_create, merge_pairs
