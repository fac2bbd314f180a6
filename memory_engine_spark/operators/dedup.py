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
from memory_engine_spark.checkpoint import lc_lazy as _lc_lazy

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


def _materialize_release(result: DataFrame, cached: DataFrame) -> DataFrame:
    """Eagerly materialize the (small) result via cache()+count(), then
    unpersist the LARGE cached intermediate immediately — the result no
    longer needs it, so the big exploded/banded frame never outlives the
    call (the round-1 'unreleased persist' finding).

    cache()-not-localCheckpoint: one job computes the result (checkpoint
    would re-run the whole query a second time), and a repeated call
    with the identical plan is served from the CacheManager entry
    instead of recomputing. Only the small above-threshold pair set is
    pinned (MEMORY_AND_DISK, LRU-evictable); the reference keeps whole
    query responses cached the same way (query_cache.py)."""
    out = result.cache()
    out.count()
    cached.unpersist(False)
    return out


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
    # join sides); persist so tokenize/explode runs once, not 3×. The
    # small pair result is materialized eagerly and the big intermediate
    # released before returning.
    cached = ex.persist()
    ex = cached
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
    out = (common.withColumn("jaccard", jac)
           .filter(F.col("jaccard") >= threshold)
           .select("a", "b", F.round("jaccard", 6).alias("jaccard")))
    return _materialize_release(out, cached)


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
    out = (cand.withColumn("jaccard", jac)
           .filter(F.col("jaccard") >= threshold)
           .select("a", "b", F.round("jaccard", 6).alias("jaccard")))
    return _materialize_release(out, ex)


def _md5_word(col, pos: int):
    """32-bit unsigned int from 8 hex chars of md5(col) starting at
    1-based ``pos``. Built only from md5/substring/base-conversion so the
    identical value is reproducible in ANSI SQL / DuckDB (the q45
    portability trick)."""
    return F.conv(F.substring(F.md5(col), pos, 8), 16, 10).cast("long")


def minhash_md5_neardup(df: DataFrame, text_col: str, id_col: str,
                        threshold: float = 0.7, num_hashes: int = 64,
                        bands: int = 32, n: int = 3) -> DataFrame:
    """MinHash+LSH near-dup pairs — same sketch/banding pipeline as
    ``minhash_neardup`` but with md5-derived universal-hash draws
    (Broder-style: h_i(s) = (w1 + i·w2) mod 2³², where w1/w2 are the two
    32-bit words of md5(s)) and band keys that are the plain
    comma-joined signature slice, so EVERY stage (signature, banding,
    candidate join, exact-Jaccard verify) is reproducible in DuckDB and
    the whole operator is oracle-checkable, not rows-only. One md5 per
    shingle; the k draws are cheap integer arithmetic.

    Identical LSH guarantees: candidates = pairs colliding in ≥1 band,
    verified with exact Jaccard (no false positives). One explode + one
    groupBy + one banded equi-join — never a cross join.
    """
    r = num_hashes // bands
    ex = explode_shingles(df, text_col, id_col, n).persist()

    w1 = _md5_word(F.col("shingle"), 1)
    w2 = _md5_word(F.col("shingle"), 9)
    words = ex.select("_id", w1.alias("w1"), w2.alias("w2"))
    mask = F.lit((1 << 32) - 1).cast("long")
    sig = words.groupBy("_id").agg(
        *[F.min((F.col("w1") + F.lit(i) * F.col("w2")).bitwiseAND(mask))
          .alias(f"h{i}") for i in range(num_hashes)])
    banded = sig.select(
        F.col("_id").alias("id"),
        F.explode(F.array(*[
            F.struct(
                F.lit(b).alias("band"),
                F.concat_ws(",", *[F.col(f"h{b * r + j}").cast("string")
                                   for j in range(r)]).alias("bk"))
            for b in range(bands)
        ])).alias("x"),
    ).select("id", "x.band", "x.bk")
    l = banded.select(F.col("id").alias("a"), "band", "bk")
    rr = banded.select(F.col("id").alias("b"), "band", "bk")
    cand = (l.join(rr, ["band", "bk"]).filter(F.col("a") < F.col("b"))
            .select("a", "b").distinct())

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
    out = (cand.withColumn("jaccard", jac)
           .filter(F.col("jaccard") >= threshold)
           .select("a", "b", F.round("jaccard", 6).alias("jaccard")))
    return _materialize_release(out, ex)


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
    # Bit 63 contributes -(2^63): adding it to the non-negative low 63
    # bits yields the two's-complement long with the sign bit set, so the
    # fingerprint is genuinely 64-bit.
    addends = [
        F.when(F.col(f"b{i}") > 0,
               F.lit(-(1 << 63) if i == 63 else (1 << i)).cast("long"))
        .otherwise(F.lit(0).cast("long"))
        for i in range(64)
    ]
    packed = bit_sums.select(
        "id", sum(addends, start=F.lit(0).cast("long")).alias("simhash"))
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
    """Near-dup pairs by SimHash hamming distance ≤ max_hamming.

    Blocking: split the 64-bit fingerprint into ``max_hamming + 1``
    near-equal contiguous chunks — a pair within hamming h differs in at
    most h chunks, so with h+1 chunks at least one chunk is identical
    (pigeonhole) and recall is EXACT. The join is an equi-join on
    (chunk_idx, chunk_value), never a cross join. Requires
    max_hamming ≤ 31 (chunks need ≥2 bits to prune)."""
    if not 0 <= max_hamming <= 31:
        raise ValueError("max_hamming must be in [0, 31]")
    n_chunks = max_hamming + 1
    bounds = [round(64 * j / n_chunks) for j in range(n_chunks + 1)]

    def chunk_val(j: int):
        width = bounds[j + 1] - bounds[j]
        if width >= 64:  # max_hamming=0: the chunk IS the fingerprint
            return F.col("simhash")
        return (F.shiftrightunsigned("simhash", bounds[j])
                .bitwiseAND(F.lit((1 << width) - 1)))

    sh = simhash(df, text_col, id_col)
    chunks = sh.select(
        "id", "simhash",
        F.explode(F.array(*[
            F.struct(F.lit(j).alias("ci"), chunk_val(j).alias("cv"))
            for j in range(n_chunks)
        ])).alias("c"),
    ).select("id", "simhash", "c.ci", "c.cv")
    l = chunks.select(F.col("id").alias("a"), F.col("simhash").alias("sa"), "ci", "cv")
    r = chunks.select(F.col("id").alias("b"), F.col("simhash").alias("sb"), "ci", "cv")
    return (
        l.join(r, ["ci", "cv"]).filter(F.col("a") < F.col("b"))
        .select("a", "b", hamming64("sa", "sb").alias("hamming")).distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


# ---------------------------------------------------------------------------
# 64-bit md5-SimHash (oracle-portable: 2 × 32-bit words)
# ---------------------------------------------------------------------------

def simhash64_md5(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """64-bit SimHash carried as TWO 32-bit words (lo, hi) built from
    md5(token) hex chars 1-8 / 9-16 — the same sketch as ``simhash`` but
    from cross-engine-identical primitives (md5, substring, base-16
    conversion, shifts), and split into two non-negative words so no
    two's-complement sign games are needed in SQL. Returns
    (id, sh_lo long, sh_hi long)."""
    narrow = _spread(df.select(F.col(id_col).alias("id"), F.col(text_col).alias("_txt")))
    toks = narrow.select("id", F.explode(tokens(F.col("_txt"))).alias("tok"))
    h = toks.select("id", _md5_word(F.col("tok"), 1).alias("hl"),
                    _md5_word(F.col("tok"), 9).alias("hh"))
    bit_sums = h.groupBy("id").agg(
        *[F.sum(F.when(F.shiftright(F.col("hl"), b).bitwiseAND(F.lit(1)) == 1, 1)
                .otherwise(-1)).alias(f"l{b}") for b in range(32)],
        *[F.sum(F.when(F.shiftright(F.col("hh"), b).bitwiseAND(F.lit(1)) == 1, 1)
                .otherwise(-1)).alias(f"g{b}") for b in range(32)],
    )
    pack = lambda pfx: sum(  # noqa: E731
        (F.when(F.col(f"{pfx}{b}") > 0, F.lit(1 << b).cast("long"))
         .otherwise(F.lit(0).cast("long")) for b in range(32)),
        start=F.lit(0).cast("long"))
    return bit_sums.select("id", pack("l").alias("sh_lo"), pack("g").alias("sh_hi"))


def simhash64_md5_neardup(df: DataFrame, text_col: str, id_col: str,
                          max_hamming: int = 6) -> DataFrame:
    """Near-dup pairs by 64-bit md5-SimHash hamming ≤ max_hamming (≤ 7):
    8 chunks of 8 bits (4 from each word) — pigeonhole guarantees a pair
    within hamming 7 shares ≥1 chunk, so candidates come from an
    equi-join on (chunk_idx, chunk_value). hamming =
    popcount(lo⊕lo) + popcount(hi⊕hi). Fully oracle-checkable (q15).
    Returns (a, b, hamming)."""
    if not 0 <= max_hamming <= 7:
        raise ValueError("max_hamming must be in [0, 7] (8 chunks of 8 bits)")
    sh = simhash64_md5(df, text_col, id_col)
    chunk = [
        F.struct(F.lit(ci).alias("ci"),
                 F.shiftrightunsigned("sh_lo" if ci < 4 else "sh_hi",
                                      (ci % 4) * 8)
                 .bitwiseAND(F.lit(255)).alias("cv"))
        for ci in range(8)
    ]
    chunks = (sh.select("id", "sh_lo", "sh_hi",
                        F.explode(F.array(*chunk)).alias("c"))
              .select("id", "sh_lo", "sh_hi", "c.ci", "c.cv"))
    l = chunks.select(F.col("id").alias("a"), F.col("sh_lo").alias("la"),
                      F.col("sh_hi").alias("ha"), "ci", "cv")
    r = chunks.select(F.col("id").alias("b"), F.col("sh_lo").alias("lb"),
                      F.col("sh_hi").alias("hb"), "ci", "cv")
    ham = (F.bit_count(F.col("la").bitwiseXOR(F.col("lb")))
           + F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))).cast("long")
    return (
        l.join(r, ["ci", "cv"]).filter(F.col("a") < F.col("b"))
        .select("a", "b", ham.alias("hamming")).distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


# ---------------------------------------------------------------------------
# near-dup clustering + canonical document selection
# ---------------------------------------------------------------------------

def neardup_clusters(df: DataFrame, pairs: DataFrame, id_col: str,
                     length_col) -> DataFrame:
    """Cluster near-duplicate pairs and pick ONE canonical document per
    cluster — the corpus-dedup step that follows any pair generator
    (Jaccard/MinHash/SimHash/embedding): pairs → connected components →
    deterministic survivor. Mirrors the reference's duplicate-merge
    semantics (merging.py keep-one; relationship_extractor.py:251-258
    SIMILAR_CONTENT gates) lifted from pairwise to corpus level.

    ``pairs``: (a, b) ids (any extra columns ignored).
    ``length_col``: Column expression used as the keep-preference (the
    canonical doc is the one with the LARGEST value; ties break toward
    the smallest numeric id) — pass e.g. ``F.length("text")``.

    Returns one row PER INPUT DOC: (doc_id, cluster, cluster_size,
    is_canonical 0/1). Singletons are their own cluster of size 1.
    Scale: components is iterative over the (small) pair graph only;
    the corpus join is one broadcast-able hash join + one window
    partitioned by cluster — no shuffle of document text.
    """
    from memory_engine_spark.operators.components import connected_components
    from pyspark.sql import Window

    edges = pairs.select(F.col("a").cast("string").alias("from_id"),
                         F.col("b").cast("string").alias("to_id"))
    comp = connected_components(edges)  # (node_id, component) — strings
    ids = df.select(F.col(id_col).cast("string").alias("node_id"),
                    F.col(id_col).alias("_orig"),
                    length_col.alias("_pref"))
    labeled = (ids.join(comp, "node_id", "left")
               .withColumn("cluster",
                           F.coalesce(F.col("component"), F.col("node_id"))))
    w = Window.partitionBy("cluster").orderBy(
        F.col("_pref").desc(), F.col("_orig").asc())
    return (
        labeled.withColumn(
            "cluster_size",
            F.count(F.lit(1)).over(Window.partitionBy("cluster")))
        .withColumn("is_canonical",
                    F.when(F.row_number().over(w) == 1, 1).otherwise(0))
        .select(F.col("_orig").alias(id_col),
                "cluster",
                F.col("cluster_size").cast("long").alias("cluster_size"),
                F.col("is_canonical").cast("int").alias("is_canonical"))
    )


def canonical_corpus(df: DataFrame, pairs: DataFrame, id_col: str,
                     length_col) -> DataFrame:
    """The deduplicated corpus: input rows whose doc survives
    ``neardup_clusters`` canonical selection. One semi-join back — the
    full document payload (text, binary columns) never enters the
    clustering shuffle."""
    keep = (neardup_clusters(df, pairs, id_col, length_col)
            .filter(F.col("is_canonical") == 1).select(id_col))
    return df.join(keep, id_col, "left_semi")


# ---------------------------------------------------------------------------
# line-level dedup (CCNet / RefinedWeb style)
# ---------------------------------------------------------------------------

def dedup_lines(df: DataFrame, text_col: str, id_col: str,
                min_dup: int = 2, min_line_chars: int = 1) -> DataFrame:
    """Corpus-wide duplicate-LINE removal (the CCNet preprocessing
    step, Wenzek et al. LREC 2020; the reference's engine has no text
    pipeline — this extends its dedup family to the training-data
    path): a line is dropped from EVERY document when its trimmed form
    occurs in ≥ ``min_dup`` distinct documents (boilerplate headers,
    cookie banners, navigation chrome). Lines whose trimmed form is
    shorter than ``min_line_chars`` never participate in counting and
    are always kept, preserving layout. Returns
    (id, text, n_lines, n_dropped).

    Exact output contract:
      - split on '\\n'; trim each line for the frequency key;
      - a trimmed line participates in counting iff its length ≥
        ``min_line_chars``;
      - the kept document re-joins, in original order, every line
        whose trimmed form is non-counting OR occurs in < ``min_dup``
        DISTINCT documents;
      - n_lines = original line count, n_dropped = removed count.

    Scale shape: one explode → one (line → distinct-doc count) groupBy,
    map-side combined; the hot-line set (a tiny fraction of distinct
    lines — AQE broadcasts it under threshold) joins back against the
    exploded view, and each document reassembles with array_sort over
    (pos, line) structs partitioned by its own id. The full text
    shuffles on the id key for reassembly, never on line content.
    """
    lines = (df.select(F.col(id_col).alias("_id"),
                       F.posexplode(F.split(F.col(text_col), "\n"))
                       .alias("pos", "line"))
             .withColumn("key", F.trim(F.col("line"))))
    counting = F.length("key") >= min_line_chars
    hot = (lines.filter(counting)
           .groupBy("key")
           .agg(F.countDistinct("_id").alias("_docs"))
           .filter(F.col("_docs") >= min_dup)
           .select("key", F.lit(1).alias("_hot")))
    marked = (lines.join(hot, "key", "left")
              .withColumn("_drop", counting & F.col("_hot").isNotNull()))
    return (marked.groupBy("_id")
            .agg(F.count(F.lit(1)).alias("n_lines"),
                 F.sum(F.col("_drop").cast("long")).alias("n_dropped"),
                 F.array_sort(F.collect_list(
                     F.when(~F.col("_drop"),
                            F.struct("pos", "line")))).alias("_kept"))
            .select(F.col("_id").alias(id_col),
                    F.concat_ws("\n", F.transform(
                        F.col("_kept"), lambda s: s["line"])).alias(text_col),
                    F.col("n_lines").cast("long").alias("n_lines"),
                    F.col("n_dropped").cast("long").alias("n_dropped")))


# ---------------------------------------------------------------------------
# SemDeDup (embedding-cluster semantic dedup)
# ---------------------------------------------------------------------------

def semdedup(embeddings: DataFrame, threshold: float, nlist: int = 16,
             id_col: str = "node_id", vec_col: str = "embedding",
             prebuilt_ivf: tuple[DataFrame, DataFrame] | None = None
             ) -> DataFrame:
    """Semantic dedup over an embedding column (SemDeDup, Abbas et al.
    2023; extends the reference's embedding merge-gate
    `ingestion/merging.py:17-111` from pairwise-at-ingest to
    corpus-wide): cluster vectors with the deterministic IVF-FLAT
    coarse quantizer (first-``nlist`` seeding, `similarity.py`), rank
    each cluster's members by similarity-to-centroid ASCENDING (the
    paper's "keep low-similarity examples" policy), and drop a member
    when ANY earlier-ranked member of the same cluster has cosine ≥
    ``threshold`` with it — the one-pass upper-triangular formulation
    of the paper's algorithm, which is purely relational (no
    iteration). Returns
    (id, cell, centroid_sim, max_prior_sim, is_kept); callers semi-join
    ``is_kept`` against the corpus.

    Scale shape: centroids broadcast; assignment is a broadcast join +
    ``max_by`` groupBy (scored rows never fully shuffle). The cluster
    ranking and the prior-pair join both hash-partition on ``cell``, so
    the second reuses the first's exchange. Within-cell work is
    quadratic in cell size — the knob the paper itself turns (50k
    clusters for 600M points); size ``nlist`` ≈ n/1k so a cell's pairs
    fit one task, and no cross-cell pair ever materializes. The IVF
    build itself (N·nlist·dim assignment scan) is INGEST-time work —
    pass ``prebuilt_ivf=(centroids, assigned)`` (e.g. the offline
    ``.derived`` index) to amortize it across calls.
    """
    from pyspark.sql import Window

    from ..functions.vector import cosine_similarity
    from .similarity import build_ivf_flat

    if prebuilt_ivf is not None:
        centroids, assigned = prebuilt_ivf
    else:
        centroids, assigned = build_ivf_flat(embeddings, nlist, id_col,
                                             vec_col)
    ranked = (assigned.join(F.broadcast(centroids), "cell")
              .select(id_col, vec_col, "cell",
                      cosine_similarity(F.col(vec_col), F.col("centroid"))
                      .alias("centroid_sim")))
    w = Window.partitionBy("cell").orderBy(
        F.col("centroid_sim").asc(), F.col(id_col).asc())
    # ranked feeds three consumers (both self-join sides + the output
    # projection); checkpoint it once so the assignment subtree isn't
    # recomputed per consumer (lazy: the first action materializes it)
    ranked = (ranked.withColumn("rk", F.row_number().over(w))
              .transform(_lc_lazy))
    a = ranked.select("cell", F.col("rk").alias("rk_a"),
                      F.col(vec_col).alias("_va"))
    b = ranked.select(id_col, "cell", F.col("rk").alias("rk_b"),
                      F.col(vec_col).alias("_vb"))
    prior = (b.join(a, "cell")
             .filter(F.col("rk_a") < F.col("rk_b"))
             .groupBy(id_col)
             .agg(F.max(cosine_similarity(F.col("_va"), F.col("_vb")))
                  .alias("max_prior_sim")))
    return (ranked.join(prior, id_col, "left")
            .select(id_col, "cell", "centroid_sim", "max_prior_sim",
                    (F.col("max_prior_sim").isNull()
                     | (F.col("max_prior_sim") < F.lit(threshold)))
                    .alias("is_kept")))


# ---------------------------------------------------------------------------
# exact-substring dedup (Lee et al. 2022)
# ---------------------------------------------------------------------------

def substring_dedup(df: DataFrame, text_col: str, id_col: str,
                    window: int = 50, min_dup: int = 2) -> DataFrame:
    """Exact-substring deduplication ("Deduplicating Training Data
    Makes Language Models Better", Lee et al. ACL 2022, ExactSubstr):
    remove every token that belongs to an exact duplicate span of ≥
    ``window`` tokens occurring in ≥ ``min_dup`` DISTINCT documents.
    Token-window granularity makes this exactly equivalent to the
    suffix-array formulation: a duplicated span of length ≥ window has
    ALL its length-``window`` sub-windows duplicated (so the span is
    fully covered), and every hot window IS an exact cross-doc
    duplicate of length ``window``. Unlike the paper, within-ONE-doc
    repeats don't count (min_dup counts distinct docs — the corpus
    boilerplate case); docs shorter than ``window`` tokens pass
    through untouched. Returns (id, text, n_tokens, n_removed) with
    text rebuilt from surviving tokens (single-space joined,
    tokenizer-normalized).

    Scale shape — the suffix-array step the paper runs on one machine
    becomes three bounded passes:
      1. window-hash counts: explode (n_toks − window + 1) md5 window
         hashes per doc → map-side-combined countDistinct groupBy;
      2. the hot-hash set (a tiny fraction) broadcasts back against
         the window frame → hot START positions per doc;
      3. coverage is a per-doc RUNNING MAX over token positions
         (covered ⇔ last hot start ≥ pos − window + 1) — one window
         pass partitioned by doc id, NO per-token interval scan, then
         ordered reassembly in the same doc-keyed shuffle.
    Nothing is ever quadratic; the only all-rows shuffles key on the
    doc id (token frame) and the window hash (counting).
    """
    from pyspark.sql import Window as W

    toks = tokens(F.col(text_col))
    base = df.select(F.col(id_col).alias("_id"), toks.alias("_toks"))
    wins = (base.filter(F.size("_toks") >= window)
            .select("_id", F.posexplode(F.transform(
                F.sequence(F.lit(0), F.size("_toks") - window),
                lambda i: F.md5(F.concat_ws(" ", F.slice(F.col("_toks"),
                                                         i + 1, window)))))
                .alias("i", "h")))
    hot = (wins.groupBy("h")
           .agg(F.countDistinct("_id").alias("_docs"))
           .filter(F.col("_docs") >= min_dup)
           .select("h"))
    starts = wins.join(F.broadcast(hot), "h").select("_id", "i")
    tok_rows = base.select("_id", F.posexplode("_toks").alias("pos", "tok"))
    marked = (tok_rows.join(starts,
                            (tok_rows["_id"] == starts["_id"])
                            & (tok_rows["pos"] == starts["i"]), "left")
              .select(tok_rows["_id"], "pos", "tok",
                      starts["i"].alias("start_here")))
    run = W.partitionBy("_id").orderBy("pos") \
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    covered = (marked
               .withColumn("last_start", F.max("start_here").over(run))
               .withColumn("_drop",
                           F.col("last_start").isNotNull()
                           & (F.col("last_start") >= F.col("pos") - window + 1)))
    return (covered.groupBy("_id")
            .agg(F.count(F.lit(1)).alias("n_tokens"),
                 F.sum(F.col("_drop").cast("long")).alias("n_removed"),
                 F.array_sort(F.collect_list(
                     F.when(~F.col("_drop"), F.struct("pos", "tok"))))
                 .alias("_kept"))
            .select(F.col("_id").alias(id_col),
                    F.concat_ws(" ", F.transform(
                        F.col("_kept"), lambda s: s["tok"])).alias(text_col),
                    F.col("n_tokens").cast("long").alias("n_tokens"),
                    F.col("n_removed").cast("long").alias("n_removed")))
