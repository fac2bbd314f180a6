"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

The reference dedups at ingestion via embedding top-1 ≥ 0.9/0.92
(/root/reference/memory_core/ingestion/merging.py:17-111) and detects
near-duplicate content in anomaly detection
(/root/reference/memory_core/synthesis/insight_discovery.py:1871-1935);
content-word Jaccard > 0.4 drives SIMILAR_CONTENT edge discovery
(/root/reference/memory_core/ingestion/relationship_extractor.py:251-258).
This module generalizes those to the training-data-pipeline dedup suite
(exact / MinHash-LSH / SimHash / n-gram Jaccard), all shuffle-bounded:

- exact: one groupBy on a normalized content hash — the cheapest
  possible plan (map-side partial agg, one shuffle on the hash).
- n-gram Jaccard: explode shingles → equi-join on shingle → count
  common → Jaccard. Only pairs sharing ≥1 shingle materialize, so for
  τ > 0 this is EXACT yet never a cross join. Frequency-capped
  shingles (stop-shingle removal) bound worst-case skew.
- MinHash+LSH: per-doc signature (k independent xxhash64 draws), bands
  hashed to buckets, candidates = within-bucket pairs, verified with
  exact Jaccard. Candidate generation is an equi-join on
  (band, band_hash) — per-bucket quadratic, globally near-linear.
- SimHash: 64-bit sign-sum fingerprint; near-dup candidates block on
  16-bit chunks (any hamming-≤3 pair shares at least one of 4 chunks),
  verified by popcount of XOR.

Everything is built-in Column expressions (higher-order functions,
xxhash64, bitwise ops) — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# normalization + exact dedup
# ---------------------------------------------------------------------------

def normalized(col):
    """Lowercase, collapse whitespace, trim — canonical dedup key."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def exact_duplicate_groups(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Groups of exact (normalized) duplicates: (content_hash, n_dups,
    keep_id, dup_ids). keep_id = min id (deterministic survivor)."""
    h = F.md5(normalized(F.col(text_col))).alias("content_hash")
    return (
        df.select(h, F.col(id_col).alias("_id"))
        .groupBy("content_hash")
        .agg(F.count(F.lit(1)).alias("n_dups"),
             F.min("_id").alias("keep_id"),
             F.array_sort(F.collect_list("_id")).alias("dup_ids"))
        .filter(F.col("n_dups") > 1)
    )


# ---------------------------------------------------------------------------
# shingling
# ---------------------------------------------------------------------------

def tokens(col):
    """Whitespace/punct word tokens, lowercased, empties dropped."""
    return F.filter(
        F.split(F.regexp_replace(F.lower(col), r"[^a-z0-9]+", " "), " "),
        lambda x: x != "",
    )


def word_shingles(col, n: int = 3):
    """Distinct word n-gram shingles of a text column (array<string>).
    Texts shorter than n words yield their full token string as the one
    shingle so no row silently drops out."""
    toks = tokens(col)
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
    )
    return F.array_distinct(grams)


def _spread(df: DataFrame) -> DataFrame:
    """Repartition a narrow input when it arrives in too few partitions
    (single parquet file) so the expensive per-row work that follows
    (tokenize/shingle/hash) parallelizes. On a real corpus the input is
    already many-partitioned and this is a no-op."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < max(2, target // 2):
        return df.repartition(target)
    return df


def explode_shingles(df: DataFrame, text_col: str, id_col: str, n: int = 3) -> DataFrame:
    narrow = _spread(df.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_txt")))
    return narrow.select("_id", F.explode(word_shingles(F.col("_txt"), n)).alias("shingle"))


# ---------------------------------------------------------------------------
# exact n-gram Jaccard pair join
# ---------------------------------------------------------------------------

def ngram_jaccard_pairs(df: DataFrame, text_col: str, id_col: str,
                        n: int = 3, threshold: float = 0.4,
                        max_shingle_freq: int | None = None) -> DataFrame:
    """All unordered pairs with shingle-set Jaccard ≥ threshold.

    EXACT for threshold > 0 (a qualifying pair must share a shingle).
    ``max_shingle_freq`` drops shingles occurring in more than that many
    docs before the join (stop-shingle skew guard for web-scale corpora);
    leave None for exact semantics.
    Returns (a, b, jaccard) with a < b.
    """
    ex = explode_shingles(df, text_col, id_col, n)
    if max_shingle_freq is not None:
        hot = (ex.groupBy("shingle").agg(F.count(F.lit(1)).alias("f"))
               .filter(F.col("f") > max_shingle_freq).select("shingle"))
        ex = ex.join(hot, "shingle", "left_anti")
    # The exploded shingle set feeds three plan branches (sizes + both
    # join sides); persist so the tokenize/explode runs once, not 3×.
    ex = ex.persist()
    sizes = ex.groupBy("_id").agg(F.count(F.lit(1)).alias("sz"))
    ex = ex.join(sizes.hint("broadcast"), "_id")  # shingle rows distinct per doc

    a = ex.select(F.col("_id").alias("a"), F.col("sz").alias("sz_a"), "shingle")
    b = ex.select(F.col("_id").alias("b"), F.col("sz").alias("sz_b"), "shingle")
    common = (
        a.join(b, "shingle")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b", "sz_a", "sz_b")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    jac = F.col("common") / (F.col("sz_a") + F.col("sz_b") - F.col("common"))
    return (common.withColumn("jaccard", jac)
            .filter(F.col("jaccard") >= threshold)
            .select("a", "b", F.round("jaccard", 6).alias("jaccard")))


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def minhash_signature(df: DataFrame, text_col: str, id_col: str,
                      num_hashes: int = 64, n: int = 3) -> DataFrame:
    """(id, sig array<bigint>): per-doc MinHash signature. One explode +
    one groupBy; the k hash draws are xxhash64(shingle, seed_i) computed
    JVM-side in a single projection."""
    ex = explode_shingles(df, text_col, id_col, n)
    mins = [F.min(F.xxhash64("shingle", F.lit(i))).alias(f"h{i}") for i in range(num_hashes)]
    agg = ex.groupBy("_id").agg(*mins)
    return agg.select(F.col("_id").alias("id"),
                      F.array(*[f"h{i}" for i in range(num_hashes)]).alias("sig"))


def lsh_candidates(sig_df: DataFrame, bands: int = 16) -> DataFrame:
    """Band the signatures and emit candidate pairs (a, b), a<b, that
    collide in ≥1 band. Join key is (band, hash-of-band-slice)."""
    num_hashes = len(sig_df.select("sig").first()["sig"])
    r = num_hashes // bands
    banded = sig_df.select(
        "id",
        F.explode(F.transform(
            F.sequence(F.lit(0), F.lit(bands - 1)),
            lambda bidx: F.struct(
                bidx.alias("band"),
                F.xxhash64(F.concat_ws(",", F.slice("sig", bidx * r + 1, r).cast("array<string>")))
                .alias("bh"),
            ),
        )).alias("bk"),
    ).select("id", "bk.band", "bk.bh")
    l = banded.select(F.col("id").alias("a"), "band", "bh")
    rr = banded.select(F.col("id").alias("b"), "band", "bh")
    return (l.join(rr, ["band", "bh"]).filter(F.col("a") < F.col("b"))
            .select("a", "b").distinct())


def minhash_neardup(df: DataFrame, text_col: str, id_col: str,
                    threshold: float = 0.7, num_hashes: int = 64,
                    bands: int = 16, n: int = 3) -> DataFrame:
    """MinHash-LSH near-dup pairs, verified with EXACT Jaccard so output
    contains no false positives (candidates are a recall-only
    approximation). Returns (a, b, jaccard)."""
    ex = explode_shingles(df, text_col, id_col, n).persist()
    mins = [F.min(F.xxhash64("shingle", F.lit(i))).alias(f"h{i}")
            for i in range(num_hashes)]
    sig = (ex.groupBy("_id").agg(*mins)
           .select(F.col("_id").alias("id"),
                   F.array(*[f"h{i}" for i in range(num_hashes)]).alias("sig")))
    cand = lsh_candidates(sig, bands)
    docs = ex.groupBy("_id").agg(F.collect_set("shingle").alias("sh"),
                                 F.count(F.lit(1)).alias("sz"))
    cand = (
        cand.join(docs.select(F.col("_id").alias("a"), F.col("sh").alias("sh_a"),
                              F.col("sz").alias("sz_a")), "a")
        .join(docs.select(F.col("_id").alias("b"), F.col("sh").alias("sh_b"),
                          F.col("sz").alias("sz_b")), "b")
    )
    common = F.size(F.array_intersect("sh_a", "sh_b"))
    jac = common / (F.col("sz_a") + F.col("sz_b") - common)
    return (cand.withColumn("jaccard", jac)
            .filter(F.col("jaccard") >= threshold)
            .select("a", "b", F.round("jaccard", 6).alias("jaccard")))


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """64-bit SimHash per doc: sign of the per-bit weighted sum of token
    hashes. Pure expressions: explode tokens → per-bit ±1 sums → pack.
    Returns (id, simhash bigint)."""
    narrow = _spread(df.select(F.col(id_col).alias("id"), F.col(text_col).alias("_txt")))
    toks = narrow.select("id", F.explode(tokens(F.col("_txt"))).alias("tok"))
    h = toks.withColumn("h", F.xxhash64("tok"))
    bit_sums = h.groupBy("id").agg(*[
        F.sum(F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1)
              .otherwise(-1)).alias(f"b{i}")
        for i in range(64)
    ])
    packed = bit_sums.select(
        "id",
        sum(
            (F.when(F.col(f"b{i}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
             * F.lit(1 << i).cast("long") for i in range(63)),
            start=F.lit(0).cast("long"),
        ).alias("simhash"),
    )
    return packed


def hamming64(a, b):
    return F.bit_count(F.col(a).bitwiseXOR(F.col(b)))


def simhash32_md5(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """32-bit SimHash using md5-derived token hashes — functionally the
    same sketch as ``simhash`` but built ONLY from operations that exist
    identically in ANSI SQL/DuckDB (md5, hex→int, bit shifts), so the
    whole operator is oracle-checkable cross-engine. Returns
    (id, simhash32 long)."""
    narrow = _spread(df.select(F.col(id_col).alias("id"), F.col(text_col).alias("_txt")))
    toks = narrow.select("id", F.explode(tokens(F.col("_txt"))).alias("tok"))
    h = toks.withColumn("h", F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10)
                        .cast("long"))
    bit_sums = h.groupBy("id").agg(*[
        F.sum(F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1)
              .otherwise(-1)).alias(f"b{b}")
        for b in range(32)
    ])
    packed = bit_sums.select(
        "id",
        sum((F.when(F.col(f"b{b}") > 0, F.lit(1 << b).cast("long"))
             .otherwise(F.lit(0).cast("long")) for b in range(32)),
            start=F.lit(0).cast("long")).alias("simhash32"),
    )
    return packed


def simhash32_neardup(df: DataFrame, text_col: str, id_col: str,
                      max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by 32-bit md5-SimHash hamming ≤ max_hamming (≤ 3):
    4 chunks of 8 bits — any pair within hamming 3 shares ≥1 chunk
    (pigeonhole), so candidates come from an equi-join on
    (chunk_idx, chunk_value). Returns (a, b, hamming)."""
    sh = simhash32_md5(df, text_col, id_col)
    chunks = sh.select(
        "id", "simhash32",
        F.explode(F.array(*[
            F.struct(F.lit(ci).alias("ci"),
                     F.shiftrightunsigned("simhash32", ci * 8)
                     .bitwiseAND(F.lit(255)).alias("cv"))
            for ci in range(4)
        ])).alias("c"),
    ).select("id", "simhash32", "c.ci", "c.cv")
    l = chunks.select(F.col("id").alias("a"), F.col("simhash32").alias("sa"),
                      "ci", "cv")
    r = chunks.select(F.col("id").alias("b"), F.col("simhash32").alias("sb"),
                      "ci", "cv")
    return (
        l.join(r, ["ci", "cv"]).filter(F.col("a") < F.col("b"))
        .select("a", "b", F.bit_count(F.col("sa").bitwiseXOR(F.col("sb")))
                .cast("long").alias("hamming")).distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def simhash_neardup(df: DataFrame, text_col: str, id_col: str,
                    max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance ≤ max_hamming (≤ 15).
    Blocking: split the 64-bit fingerprint into 4 16-bit chunks — any
    pair within hamming 3 agrees on ≥1 chunk (pigeonhole), so the join
    is an equi-join on (chunk_idx, chunk_value), never a cross join."""
    sh = simhash(df, text_col, id_col)
    chunks = sh.select(
        "id", "simhash",
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("ci"),
                     F.shiftrightunsigned("simhash", i * 16).bitwiseAND(F.lit(0xFFFF))
                     .alias("cv"))
            for i in range(4)
        ])).alias("c"),
    ).select("id", "simhash", "c.ci", "c.cv")
    l = chunks.select(F.col("id").alias("a"), F.col("simhash").alias("sa"), "ci", "cv")
    r = chunks.select(F.col("id").alias("b"), F.col("simhash").alias("sb"), "ci", "cv")
    return (
        l.join(r, ["ci", "cv"]).filter(F.col("a") < F.col("b"))
        .select("a", "b", hamming64("sa", "sb").alias("hamming")).distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
