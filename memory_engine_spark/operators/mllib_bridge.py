"""MLlib bridge: the SURVEY-named MLlib primitives as alternative
implementations of the vector/dedup paths.

SURVEY.md maps several reference operators onto MLlib out of the box:
- similarity join → ``MinHashLSH.approxSimilarityJoin`` /
  ``BucketedRandomProjectionLSH`` (§2.3 row "Similarity join")
- embedding fallback → ``HashingTF`` feature hashing (§2.8)

The expression-based implementations elsewhere in this package are the
defaults (oracle-friendly, dependency-light); these wrappers exist so a
deployment already standardized on MLlib pipelines can swap them in at
the same seams. Results are approximate (LSH) — exact thresholds are
re-verified with a distance filter, so like the native paths there are
no false positives.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from memory_engine_spark.operators.dedup import tokens


def tfidf_embed_column(df: DataFrame, text_col: str, id_col: str,
                       num_features: int = 256) -> DataFrame:
    """HashingTF → IDF → L2-normalize, returned as (id, embedding
    array<double>). The MLlib twin of ingestion.embed_column."""
    from pyspark.ml.feature import IDF, HashingTF, Normalizer
    from pyspark.ml.functions import vector_to_array

    toks = df.select(F.col(id_col), tokens(F.col(text_col)).alias("_toks"))
    tf = HashingTF(inputCol="_toks", outputCol="_tf",
                   numFeatures=num_features).transform(toks)
    idf_model = IDF(inputCol="_tf", outputCol="_tfidf").fit(tf)
    vecs = idf_model.transform(tf)
    normed = Normalizer(inputCol="_tfidf", outputCol="_norm", p=2.0) \
        .transform(vecs)
    return normed.select(id_col, vector_to_array("_norm").alias("embedding"))


def minhash_lsh_join(df: DataFrame, text_col: str, id_col: str,
                     jaccard_threshold: float = 0.5,
                     num_hash_tables: int = 8,
                     num_features: int = 1 << 18, seed: int = 42) -> DataFrame:
    """Near-dup pairs via MLlib MinHashLSH.approxSimilarityJoin over
    hashed token-set vectors. Returns (a, b, jaccard_distance) with
    a < b. Note MLlib's Jaccard distance = 1 − Jaccard similarity and is
    computed on the HASHED feature space (collisions possible at small
    num_features) — the native ``dedup.minhash_neardup`` remains the
    exact-verified default."""
    from pyspark.ml.feature import CountVectorizer, MinHashLSH

    toks = df.select(F.col(id_col).alias("_id"),
                     F.array_distinct(tokens(F.col(text_col))).alias("_toks")) \
        .filter(F.size("_toks") > 0)
    cv_model = CountVectorizer(inputCol="_toks", outputCol="_vec",
                               binary=True, vocabSize=num_features).fit(toks)
    vecs = cv_model.transform(toks)
    mh = MinHashLSH(inputCol="_vec", outputCol="_hashes",
                    numHashTables=num_hash_tables, seed=seed).fit(vecs)
    joined = mh.approxSimilarityJoin(vecs, vecs, 1.0 - jaccard_threshold,
                                     distCol="jaccard_distance")
    return (
        joined.select(F.col("datasetA._id").alias("a"),
                      F.col("datasetB._id").alias("b"),
                      F.round("jaccard_distance", 6).alias("jaccard_distance"))
        .filter(F.col("a") < F.col("b"))
    )


def random_projection_neighbors(embeddings: DataFrame, threshold_l2: float,
                                id_col: str = "node_id",
                                vec_col: str = "embedding",
                                bucket_length: float = 2.0,
                                num_hash_tables: int = 4,
                                seed: int = 42) -> DataFrame:
    """Euclidean near-neighbor pairs via BucketedRandomProjectionLSH —
    SURVEY's named primitive for the merge-gate similarity join.
    Returns (a, b, l2_distance), a < b."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    # array_to_vector is a JVM-side expression — no Python round-trip
    vecs = embeddings.select(
        F.col(id_col).alias("_id"),
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("_vec"))
    brp = BucketedRandomProjectionLSH(
        inputCol="_vec", outputCol="_hashes",
        bucketLength=bucket_length, numHashTables=num_hash_tables,
        seed=seed).fit(vecs)
    joined = brp.approxSimilarityJoin(vecs, vecs, threshold_l2,
                                      distCol="l2_distance")
    return (
        joined.select(F.col("datasetA._id").alias("a"),
                      F.col("datasetB._id").alias("b"),
                      F.round("l2_distance", 6).alias("l2_distance"))
        .filter(F.col("a") < F.col("b"))
    )
