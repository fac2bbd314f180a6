"""Training-corpus composition operators: deterministic sampling, source
mixing, and sequence packing.

These extend the engine past the reference's per-document operators to
the corpus-level steps a pretraining data pipeline runs after cleaning
and dedup (the reference stops at ingestion: bulk_processor.py feeds
nodes one batch at a time). Everything is hash-deterministic — stable
across runs, partitions, and engines (same md5 trick as
text.hash_split) — so every operator is oracle-checkable and resumable.

Scale notes:
- Sampling/mixing are stateless row-local filters — no shuffle at all.
- ``mix_corpus`` needs one tiny per-source count aggregate (#sources
  rows to the driver) to solve for the rate vector; the data pass
  itself is shuffle-free.
- ``pack_sequences`` is the GPT-style concat-and-chunk layout. A naive
  global running offset would be a single-partition window; instead the
  corpus is split into ``n_shards`` deterministic hash shards, offsets
  cumsum WITHIN shards (parallel windows), and shard base offsets come
  from a cumulative sum over the n_shards-row totals table — the
  classic two-phase distributed prefix sum. Only the tiny totals table
  ever centralizes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from memory_engine_spark.checkpoint import lc as _lc
from memory_engine_spark.checkpoint import lc_lazy as _lc_lazy

HASH_BUCKETS = 10_000


def _hash_bucket(id_col, salt: str):
    """md5(salt:id) → integer in [0, 10000) — portable to ANSI SQL."""
    return (F.conv(F.substring(F.md5(
        F.concat_ws(":", F.lit(salt), F.col(id_col).cast("string"))), 1, 8),
        16, 10).cast("long") % HASH_BUCKETS)


def stratified_sample(df: DataFrame, strata_col: str, rates: dict[str, float],
                      id_col: str, salt: str = "sample",
                      default_rate: float = 0.0) -> DataFrame:
    """Deterministic per-stratum subsample: keep a row iff its id-hash
    bucket falls under its stratum's rate. Content-independent, so the
    SAME ids survive regardless of partitioning/engine — reproducible
    corpus recipes. Strata missing from ``rates`` get ``default_rate``.
    Row-local (no shuffle); at 100 TB this is a pure scan filter."""
    for k, v in rates.items():
        if not 0.0 <= v <= 1.0:
            raise ValueError(f"rate for {k!r} must be in [0, 1]")
    if not 0.0 <= default_rate <= 1.0:
        raise ValueError("default_rate must be in [0, 1]")
    expr = None
    for name, rate in rates.items():
        cond = F.col(strata_col) == name
        thr = F.lit(int(round(rate * HASH_BUCKETS)))
        expr = (F.when(cond, thr) if expr is None else expr.when(cond, thr))
    thr_col = (expr.otherwise(F.lit(int(round(default_rate * HASH_BUCKETS))))
               if expr is not None
               else F.lit(int(round(default_rate * HASH_BUCKETS))))
    return df.filter(_hash_bucket(id_col, salt) < thr_col)


def mix_corpus(df: DataFrame, source_col: str, weights: dict[str, float],
               id_col: str, salt: str = "mix") -> DataFrame:
    """Compose a corpus matching target source PROPORTIONS while keeping
    as much data as possible: the limiting source (largest count-deficit
    relative to its weight) is kept whole and every other source is
    hash-downsampled to match. rate_s = (C · w_s) / n_s with
    C = min_s n_s / w_s. Sources absent from ``weights`` are dropped.

    One #sources-row aggregate decides the rates (bounded driver
    collect); the data pass is a shuffle-free filter."""
    total_w = sum(weights.values())
    if total_w <= 0:
        raise ValueError("weights must sum to a positive value")
    weights = {k: v / total_w for k, v in weights.items()}
    counts = {r["s"]: r["n"] for r in
              df.filter(F.col(source_col).isin(list(weights)))
              .groupBy(F.col(source_col).alias("s"))
              .agg(F.count(F.lit(1)).alias("n")).collect()}
    missing = [s for s in weights if s not in counts]
    if missing:
        raise ValueError(f"no rows for weighted source(s) {missing}")
    c = min(counts[s] / w for s, w in weights.items() if w > 0)
    rates = {s: min(1.0, (c * w) / counts[s]) for s, w in weights.items()}
    return stratified_sample(df, source_col, rates, id_col, salt=salt,
                             default_rate=0.0)


def pack_sequences(df: DataFrame, token_count_col, budget: int,
                   id_col: str, n_shards: int = 32,
                   salt: str = "pack") -> DataFrame:
    """GPT-style concat-and-chunk packing layout: documents are laid out
    back-to-back in a deterministic order and cut into fixed
    ``budget``-token training sequences; a document straddling a cut
    spans consecutive sequences. Returns one row per doc:

      (id, shard, n_tokens, start_offset, seq_id, offset_in_seq, n_seqs)

    where seq_id = start_offset div budget (the sequence the doc STARTS
    in), offset_in_seq = start_offset mod budget, and n_seqs = how many
    sequences the doc touches. Zero-token docs are dropped (nothing to
    pack). Layout order is (shard, id) with shard = id-hash mod
    n_shards, so the layout is engine/partitioning-independent.

    Distributed prefix sum: within-shard running offsets are parallel
    windows partitioned by shard; shard base offsets are a cumulative
    sum over the n_shards-row totals frame (broadcast back). No global
    single-partition window anywhere.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    base = (df.select(F.col(id_col).alias("_id"),
                      token_count_col.cast("long").alias("n_tokens"))
            .filter(F.col("n_tokens") > 0)
            .withColumn("shard",
                        (_hash_bucket("_id", salt) % n_shards).cast("int")))
    w_in = (Window.partitionBy("shard")
            .orderBy(F.col("_id").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    within = base.withColumn("_cum", F.sum("n_tokens").over(w_in))
    totals = within.groupBy("shard").agg(F.max("_cum").alias("_tot"))
    w_sh = (Window.orderBy(F.col("shard").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    bases = totals.withColumn(
        "_base", F.sum("_tot").over(w_sh) - F.col("_tot")).select("shard", "_base")
    start = F.col("_base") + F.col("_cum") - F.col("n_tokens")
    return (
        within.join(F.broadcast(bases), "shard")
        .withColumn("start_offset", start)
        .select(
            F.col("_id").alias(id_col), "shard", "n_tokens", "start_offset",
            # integer `div`, not float division: offsets can exceed 2^53
            # total tokens at corpus scale, where double loses exactness
            F.expr(f"start_offset div {int(budget)}").alias("seq_id"),
            (F.col("start_offset") % budget).alias("offset_in_seq"),
            F.expr(f"(start_offset + n_tokens - 1) div {int(budget)}")
            .alias("_last"))
        .withColumn("n_seqs", (F.col("_last") - F.col("seq_id") + 1).cast("long"))
        .drop("_last")
    )


def vocabulary(df: DataFrame, text_col: str, id_col: str,
               top_k: int = 1000) -> DataFrame:
    """Corpus vocabulary: (term, tf, doc_freq, idf) for the ``top_k``
    most frequent terms (tie → lexicographic). idf is the smoothed
    ln((N+1)/(df+1)) + 1 (scikit-style). One explode + one groupBy —
    map-side partial aggregation keeps the shuffle at |vocab|, not
    |tokens|; top-k lowers to TakeOrderedAndProject. The reference
    computes per-document keywords only (relationship_extractor.py),
    never a corpus vocabulary."""
    from memory_engine_spark.operators.dedup import tokens

    n_docs = df.count()
    tok = df.select(F.col(id_col).alias("_doc"),
                    F.explode(tokens(F.col(text_col))).alias("term"))
    return (
        tok.groupBy("term")
        .agg(F.count(F.lit(1)).alias("tf"),
             F.countDistinct("_doc").alias("doc_freq"))
        .withColumn("idf", F.round(
            F.log((F.lit(float(n_docs)) + 1.0) / (F.col("doc_freq") + 1.0))
            + 1.0, 6))
        .orderBy(F.col("tf").desc(), F.col("term").asc())
        .limit(top_k)
    )


def weighted_sample(df: DataFrame, weight_col: str, k: int,
                    id_col: str, salt: str = "aes") -> DataFrame:
    """Weighted random sample WITHOUT replacement of ``k`` rows,
    deterministic: algorithm A-ES (Efraimidis & Spirakis, IPL 2006)
    with the randomness replaced by a portable md5 draw.

    Each row gets u = (md5word(salt:id)+1) / 2^32 ∈ (0, 1] and
    exponential key e = -ln(u) / w; the k SMALLEST keys win, which is
    distributionally identical to sequential weighted draws without
    replacement. Rows with weight ≤ 0 never win. Ties (impossible for
    distinct ids) and the boundary are broken by id for stability.

    Scale shape: one projection + TakeOrderedAndProject — per-partition
    top-k heaps, only ``k`` rows per partition ever reach the driver
    side of the sort. No shuffle of the corpus, no RNG state: the
    sample is reproducible on any engine and any partitioning, and
    resuming a failed run re-selects the identical rows.
    """
    word = (F.conv(F.substring(F.md5(
        F.concat_ws(":", F.lit(salt), F.col(id_col).cast("string"))), 1, 8),
        16, 10).cast("long"))
    u = (word + 1) / F.lit(4294967296.0)
    key = -F.log(u) / F.col(weight_col).cast("double")
    return (df.filter(F.col(weight_col) > 0)
            .withColumn("_aes_key", key)
            .orderBy(F.col("_aes_key").asc(), F.col(id_col).asc())
            .limit(k)
            .drop("_aes_key"))


def dsir_features(df: DataFrame, text_col: str, id_col: str,
                  n_buckets: int = 8192) -> DataFrame:
    """The DSIR feature pass on its own: word unigrams+bigrams hashed
    to bucket ids INSIDE the row expression (feature strings never
    leave their source row), exploded to skinny (``_id``, ``b``) longs.
    This is the expensive tokenize+md5 scan — in a real pipeline it is
    INGEST-time work (like embedding generation), so callers can
    materialize it once (e.g. to parquet next to the other offline
    indexes) and pass it back to ``dsir_importance`` via ``feats=`` /
    ``target_feats=``."""
    from .dedup import tokens

    def features(col):
        toks = tokens(col)
        bigrams = F.when(F.size(toks) >= 2, F.transform(
            F.sequence(F.lit(0), F.size(toks) - 2),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, 2)),
        )).otherwise(F.array().cast("array<string>"))
        return F.concat(toks, bigrams)

    def bucket(col):
        return (F.conv(F.substring(F.md5(col), 1, 8), 16, 10)
                .cast("long") % n_buckets)

    return df.select(
        F.col(id_col).alias("_id"),
        F.explode(F.transform(features(F.col(text_col)),
                              lambda g: bucket(g))).alias("b"))


def dsir_importance(df: DataFrame, target: DataFrame, text_col: str,
                    id_col: str, n_buckets: int = 8192,
                    smoothing: float = 1.0,
                    feats: DataFrame | None = None,
                    target_feats: DataFrame | None = None) -> DataFrame:
    """DSIR importance weights (Data Selection via Importance
    Resampling, Xie et al. NeurIPS 2023): score every raw-corpus
    document by how much its hashed n-gram distribution resembles a
    TARGET corpus. Features are word unigrams + bigrams (the paper's
    choice) hashed into ``n_buckets`` via the repo's md5-portable
    bucket hash, so the whole operator — including the per-bucket
    log-ratio table — is reproducible in ANSI SQL and oracle-checked.

    weight(d) = Σ_{g ∈ ngrams(d)} ln( p_target(bucket(g)) /
                                      p_raw(bucket(g)) )
    with add-``smoothing`` Laplace estimates over the bucket vocabulary.
    Per-bucket log-ratios are quantized to BIGINT micro-units —
    ``floor(x * 1e6 + 0.5)``, pure IEEE-double arithmetic with no
    engine ROUND/DECIMAL involved — and summed as BIGINT, so the sum
    is order-independent AND free of decimal-rounding divergence
    (engine ROUND-on-double implementations disagree on apparent
    half-ties; two rounds of dp-tuning failed at the r03/r04 driver
    gate before the integer quantization). The only residual
    cross-engine exposure is ``ln`` itself straddling a floor
    boundary, a ~1e-10 event per bucket. Resampling = feed
    ``log_weight`` (micro-units; ordering unchanged by the positive
    scale) to ``weighted_sample`` (Gumbel top-k on log weights ≡ A-ES
    on weights).

    Returns (id, n_features, log_weight BIGINT micro-units, i.e.
    1e6 × Σ log-ratio).

    Scale shape: two explode→groupBy(bucket) count passes (map-side
    combined; the bucket tables are ≤ n_buckets rows), then the scoring
    pass joins the exploded corpus against the BROADCAST log-ratio
    table and sums per document — one shuffle on ``id``. The target
    corpus is typically tiny (a quality reference set); the raw pass
    never materializes pairs and never shuffles text. The tokenize+md5
    scan dominates the per-call cost — pass ``feats`` /
    ``target_feats`` (materialized ``dsir_features`` output) to
    amortize it across calls, exactly like the pagerank/LPA indexes;
    prebuilt frames are NOT unpersisted here (caller owns them).
    """
    # ONE tokenize+hash pass over the raw corpus, persisted as skinny
    # (_id, bucket) longs: the count pass, the totals action, and the
    # scoring join all read it — unpersisted, each consumer re-ran the
    # full explode (measured 3× the query cost at sf0.1). The
    # call-local intermediates are released via _materialize_release
    # once the scored result is pinned, matching the module-wide
    # persist discipline (they must not outlive the call).
    from .dedup import _materialize_release

    feats_here = feats is None
    exploded = (dsir_features(df, text_col, id_col, n_buckets).persist()
                if feats_here else feats)
    tgt = (dsir_features(target, text_col, id_col, n_buckets)
           if target_feats is None else target_feats)
    raw_c = exploded.groupBy("b").agg(F.count(F.lit(1)).alias("n")).persist()
    tgt_c = tgt.groupBy("b").agg(F.count(F.lit(1)).alias("n")).persist()
    try:
        totals = (raw_c.agg(F.sum("n")).first()[0] or 0,
                  tgt_c.agg(F.sum("n")).first()[0] or 0)
        denom_r = float(totals[0]) + smoothing * n_buckets
        denom_t = float(totals[1]) + smoothing * n_buckets
        ratio = (raw_c.withColumnRenamed("n", "n_raw")
                 .join(tgt_c.withColumnRenamed("n", "n_tgt"), "b", "full")
                 .select("b", F.floor(
                     (F.log((F.coalesce(F.col("n_tgt"), F.lit(0))
                             + smoothing) / F.lit(denom_t))
                      - F.log((F.coalesce(F.col("n_raw"), F.lit(0))
                               + smoothing) / F.lit(denom_r)))
                     * F.lit(1e6) + F.lit(0.5))
                     .cast("long").alias("log_ratio")))
        # buckets unseen in BOTH corpora share one constant ratio
        default_ratio = (F.floor(
            (F.log(F.lit(smoothing / denom_t))
             - F.log(F.lit(smoothing / denom_r)))
            * F.lit(1e6) + F.lit(0.5)).cast("long"))
        out = (exploded.join(F.broadcast(ratio), "b", "left")
               .groupBy("_id")
               .agg(F.count(F.lit(1)).alias("n_features"),
                    F.sum(F.coalesce(F.col("log_ratio"), default_ratio))
                    .cast("long").alias("log_weight"))
               .select(F.col("_id").alias(id_col), "n_features",
                       "log_weight"))
        out = _materialize_release(out, raw_c)
    finally:
        tgt_c.unpersist(False)
        raw_c.unpersist(False)
        if feats_here:
            exploded.unpersist(False)
    return out


def bigram_perplexity(df: DataFrame, target: DataFrame, text_col: str,
                      id_col: str, n_buckets: int = 65536,
                      smoothing: float = 0.1) -> DataFrame:
    """CCNet-style language-model quality scoring (Wenzek et al. LREC
    2020 filter by KenLM perplexity; here an add-k-smoothed BIGRAM
    model over hashed token buckets instead of a 5-gram KenLM binary —
    the filtering semantics, minus the external model artifact):
    train bigram/unigram counts on a TARGET corpus (the clean
    reference, e.g. Wikipedia), then score every document by
    cross-entropy

        H(d) = −(1/|d|−1) Σ_i ln P(tok_i | tok_{i−1}),
        P(b | a) = (c(a,b) + k) / (c(a·) + k·B)

    with tokens hashed into ``n_buckets`` ids (md5-portable — the
    whole model is two relational count tables, so training AND
    scoring are oracle-checkable). Lower = more target-like;
    perplexity = e^H. Docs with < 2 tokens form no bigram and are
    absent from the output (no evidence to score). Returns
    (id, n_bigrams, cross_entropy, ppl).

    Scale shape: training = one explode→groupBy(bigram) + one
    groupBy(unigram) over the target, both map-side combined; the
    model is ≤ |distinct bigrams| rows of (a, b, log_p). Scoring joins
    the exploded corpus bigrams against the BROADCAST model (unseen
    bigrams take the per-``a`` backoff constant via a second broadcast
    join on the unigram table, and a global constant when ``a`` itself
    is unseen) and sums per doc — one doc-keyed shuffle. Per-bigram
    log-probs are quantized to BIGINT micro-units (``floor(x * 1e6 +
    0.5)``, pure IEEE-double arithmetic) and summed as BIGINT — the
    sum is order-independent at any partitioning and carries no
    engine ROUND/DECIMAL divergence (see dsir_importance for the
    driver-gate history that forced integers). The final
    cross-entropy / ppl are likewise floor-quantized doubles, not
    engine-ROUNDed.
    """
    from .dedup import tokens

    def tok_ids(frame):
        return frame.select(
            F.col(id_col).alias("_id"),
            F.posexplode(F.transform(
                tokens(F.col(text_col)),
                lambda t: (F.conv(F.substring(F.md5(t), 1, 8), 16, 10)
                           .cast("long") % n_buckets))).alias("pos", "tok"))

    def bigrams(frame):
        t = tok_ids(frame)
        nxt = t.select(F.col("_id"), (F.col("pos") - 1).alias("pos"),
                       F.col("tok").alias("tok_b"))
        return (t.join(nxt, ["_id", "pos"])
                .select("_id", "pos", F.col("tok").alias("a"),
                        F.col("tok_b").alias("b")))

    tgt_bi = (bigrams(target).groupBy("a", "b")
              .agg(F.count(F.lit(1)).alias("c_ab")))
    tgt_uni = (tgt_bi.groupBy("a").agg(F.sum("c_ab").alias("c_a")))
    k, B = float(smoothing), n_buckets
    model = (tgt_bi.join(tgt_uni, "a")
             .select("a", "b", F.floor(
                 F.log((F.col("c_ab") + F.lit(k))
                       / (F.col("c_a") + F.lit(k * B)))
                 * F.lit(1e6) + F.lit(0.5))
                 .cast("long").alias("log_p")))
    # backoff when (a, b) unseen but a seen: ln(k / (c_a + kB));
    # when a itself unseen: ln(k / kB) = -ln(B)
    backoff_a = (tgt_uni.select("a", F.floor(
        F.log(F.lit(k) / (F.col("c_a") + F.lit(k * B)))
        * F.lit(1e6) + F.lit(0.5)).cast("long").alias("log_backoff")))
    import math
    unseen = F.lit(int(math.floor(-math.log(B) * 1e6 + 0.5)))

    scored = (bigrams(df)
              .join(F.broadcast(model), ["a", "b"], "left")
              .join(F.broadcast(backoff_a), "a", "left")
              .select("_id", F.coalesce(
                  F.col("log_p"), F.col("log_backoff"), unseen)
                  .alias("lp")))
    # entropy in double from the exact BIGINT micro-sum: /1e6 then
    # /count is IEEE-deterministic; the 6-dp / 4-dp presentation uses
    # floor(x*scale+0.5)/scale — NOT engine ROUND, whose half-tie
    # behavior differs between JVM BigDecimal and DuckDB nearbyint.
    ent = (-(F.col("_sum_lp").cast("double") / F.lit(1e6))
           / F.col("n_bigrams"))
    return (scored.groupBy("_id")
            .agg(F.count(F.lit(1)).alias("n_bigrams"),
                 F.sum("lp").alias("_sum_lp"))
            .select(F.col("_id").alias(id_col), "n_bigrams",
                    (F.floor(ent * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6))
                    .alias("cross_entropy"),
                    (F.floor(F.exp(ent) * F.lit(1e4) + F.lit(0.5))
                     / F.lit(1e4)).alias("ppl")))


def stratified_weighted_sample(df: DataFrame, strata_col: str,
                               weight_col: str, k: int, id_col: str,
                               salt: str = "aes") -> DataFrame:
    """EXACTLY ``k`` rows per stratum, weighted without replacement —
    the per-source balanced-subset sampler (fixed quota per source/
    language/domain; contrast ``stratified_sample``'s RATE-based
    thinning, which only hits quotas in expectation). Same portable
    A-ES construction as ``weighted_sample`` — md5 uniform draw,
    exponential key −ln(u)/w — but the k smallest keys are taken PER
    STRATUM via one row_number window instead of a global top-k.
    Strata with fewer than k eligible rows return all of them.

    Scale shape: one projection + one window partitioned by the
    stratum (a single shuffle on the stratum key; skewed strata are
    bounded by the same salting tools as any hot key). Deterministic
    on any engine and partitioning, like every sampler in this module.
    """
    from pyspark.sql import Window as W

    word = (F.conv(F.substring(F.md5(
        F.concat_ws(":", F.lit(salt), F.col(id_col).cast("string"))), 1, 8),
        16, 10).cast("long"))
    u = (word + 1) / F.lit(4294967296.0)
    key = -F.log(u) / F.col(weight_col).cast("double")
    w = W.partitionBy(strata_col).orderBy(
        F.col("_aes_key").asc(), F.col(id_col).asc())
    return (df.filter(F.col(weight_col) > 0)
            .withColumn("_aes_key", key)
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= k)
            .drop("_aes_key", "_rn"))


def rank_buckets(df: DataFrame, val_col: str, part_col: str, id_col: str,
                 labels: tuple[str, ...] = ("head", "middle", "tail")
                 ) -> DataFrame:
    """CCNet's head/middle/tail corpus split (Wenzek et al. LREC 2020
    §4.3: partition each language's documents into perplexity terciles;
    'head' = most target-like, the slice usually kept or up-sampled):
    rank rows within ``part_col`` by (``val_col`` asc, ``id_col`` asc —
    the full tiebreak makes the tile assignment a total order, hence
    identical on any engine) and deal them into ``len(labels)``
    equal-ish tiles (ntile semantics: earlier tiles take the extra
    rows). Returns the input columns plus ``bucket``.

    Scale shape: ONE window over the partition key — a single shuffle
    on ``part_col``; at 100 TB the per-language sort is the
    distributed-sort primitive Spark already does well, and skewed
    languages can pre-split by salted subpartition + merge ranks if a
    single language dominates the corpus.
    """
    from pyspark.sql import Window as W

    w = W.partitionBy(part_col).orderBy(F.col(val_col).asc(),
                                        F.col(id_col).asc())
    return df.select(
        *df.columns,
        F.element_at(F.array(*[F.lit(x) for x in labels]),
                     F.ntile(len(labels)).over(w)).alias("bucket"))


def temperature_mixture(df: DataFrame, source_col: str, id_col: str,
                        alpha: float = 0.3, k: int = 100,
                        salt: str = "mix") -> DataFrame:
    """Temperature-scaled source mixing — the GPT-3 / multilingual-LM
    data-mixing step (Brown et al. 2020 §2.2 dataset sampling weights;
    Conneau & Lample 2019 α-scaling): per-source quotas proportional to
    n_s^α (α<1 up-samples small sources), realized EXACTLY over one
    pass with largest-remainder apportionment and the repo's portable
    md5 uniform draw inside each source.

    Quota construction (deterministic on any engine):
    p_s = round(n_s^α / Σ_t n_t^α, 6); base_s = floor(k·p_s);
    the k − Σ base_s leftovers go to the largest remainders
    (ties → smaller source id). A quota larger than a source's
    population yields that source's full population (no reallocation
    pass — the deficit is visible in the output size, not silently
    shifted). Shares round to 6 dp before the arithmetic because pow()
    is engine-local floating point — same recipe as the ln() addends
    elsewhere in this module.

    Returns the sampled rows plus (n_source, quota, draw_rank).

    Scale shape: one count aggregate (≤ |sources| rows, broadcast
    back), one md5-keyed row_number window partitioned by source —
    a single shuffle on the source key; A-ES-style, no driver state.
    """
    from pyspark.sql import Window as W

    counts = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("n_source"))
    tot = counts.agg(F.sum(F.pow(F.col("n_source"), alpha)).alias("tot"))
    share = (counts.crossJoin(F.broadcast(tot))
             .select(source_col, "n_source",
                     F.round(F.pow(F.col("n_source"), alpha) / F.col("tot"),
                             6).alias("p")))
    base = share.select(
        source_col, "n_source",
        F.floor(F.lit(float(k)) * F.col("p")).cast("long").alias("base"),
        (F.lit(float(k)) * F.col("p")
         - F.floor(F.lit(float(k)) * F.col("p"))).alias("rem"))
    leftover = F.lit(k) - F.sum("base").over(W.partitionBy())
    quota = base.select(
        source_col, "n_source",
        (F.col("base")
         + F.when(F.row_number().over(
             W.orderBy(F.col("rem").desc(), F.col(source_col).asc()))
             <= leftover, 1).otherwise(0)).alias("quota"))
    w = W.partitionBy(source_col).orderBy(
        F.md5(F.concat_ws(":", F.lit(salt), F.col(id_col).cast("string")))
        .asc(), F.col(id_col).asc())
    return (df.withColumn("draw_rank", F.row_number().over(w))
            .join(F.broadcast(quota), source_col)
            .filter(F.col("draw_rank") <= F.col("quota")))


def bpe_train(df: DataFrame, text_col: str, n_merges: int = 10,
              top_words: int = 400) -> list[tuple[int, str, str, int]]:
    """Byte-pair-encoding vocabulary induction (Sennrich et al. 2016,
    the standard subword-tokenizer trainer): learn ``n_merges`` merge
    rules from the corpus word-frequency table.

    The reference ships no tokenizer trainer (its token counts are
    whitespace heuristics, result_ranker.py:246-264); this is a
    training-data-pipeline extension, the vocabulary-induction step a
    100 TB corpus pipeline runs before token counting and packing.

    Scale shape: the corpus collapses to a WORD-FREQUENCY table first
    (one tokenize+groupBy — the only pass over the raw text; |V| rows,
    millions at worst, not billions). Every merge round then runs on
    the |V|-row symbol table: one explode+groupBy for weighted pair
    counts (map-side partial agg keeps the shuffle at |pairs|), a
    1-row TakeOrdered argmax (count desc, pair asc — deterministic),
    and a narrow map applying the merge. The per-round driver state is
    exactly one (left, right, count) row.

    Greedy left-to-right merging is expressed as a delimiter-doubling
    string replace, identical on any engine: with every separator
    doubled, ``replace(' a  b ' -> ' ab ')`` consumes one space from
    each side, so the surviving space still delimits the next
    occurrence — chains like ``a b a b`` merge to ``ab ab`` and runs
    like ``a a a`` merge to ``aa a``, exactly the left-to-right fold
    (plain non-overlapping replace() would eat the shared boundary).

    Returns the merge table [(round, left, right, pair_count)], the
    trainer's actual artifact; symbols never contain spaces ([a-z0-9]
    alphabet), so the delimiter encoding is unambiguous.
    """
    from memory_engine_spark.operators.dedup import tokens

    words = (df.select(F.explode(tokens(F.col(text_col))).alias("word"))
             .groupBy("word").agg(F.count(F.lit(1)).alias("freq"))
             .orderBy(F.col("freq").desc(), F.col("word").asc())
             .limit(top_words))
    # LAZY checkpoints throughout (r16, guide §1.2): each round's w is
    # consumed by exactly one argmax collect (plus the next round's
    # narrow map, which reads the blocks that collect materialized),
    # so the eager per-round checkpoint action is pure dispatch floor
    # — folding it into the collect halves the round's action count,
    # and the LAST round's w (never read again) no longer
    # materializes at all. Lineage truncation is identical.
    w = words.select(
        F.trim(F.regexp_replace(F.col("word"), "(.)", "$1 ")).alias("w"),
        "freq").transform(_lc_lazy)

    merges: list[tuple[int, str, str, int]] = []
    for rnd in range(1, n_merges + 1):
        s = F.split(F.col("w"), " ")
        pair_list = F.when(
            F.size(s) > 1,
            F.transform(F.sequence(F.lit(1), F.size(s) - 1),
                        lambda i: F.struct(
                            F.element_at(s, i).alias("l"),
                            F.element_at(s, i + 1).alias("r")))
        ).otherwise(F.array().cast("array<struct<l:string,r:string>>"))
        pc = (w.select(F.explode(pair_list).alias("p"), "freq")
              .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
              .agg(F.sum("freq").alias("c")))
        top = (pc.orderBy(F.col("c").desc(), F.col("l").asc(),
                          F.col("r").asc()).limit(1).collect())
        if not top:
            break
        a, b, c = top[0]["l"], top[0]["r"], int(top[0]["c"])
        merges.append((rnd, a, b, c))
        doubled = F.concat(F.lit("  "),
                           F.replace(F.col("w"), F.lit(" "), F.lit("  ")),
                           F.lit("  "))
        merged = F.replace(doubled, F.lit(f" {a}  {b} "), F.lit(f" {a}{b} "))
        w = w.select(
            F.trim(F.regexp_replace(merged, " +", " ")).alias("w"), "freq")
        # checkpoint each round: the next argmax re-evaluates w, and
        # 10 rounds of nested replace() otherwise recompute from scratch
        w = w.transform(_lc_lazy)
    return merges


def bpe_apply(col, merges: list[tuple[int, str, str, int]]):
    """Column expression applying a pretrained BPE merge table, in
    merge order, to a space-separated symbol string (the ``w`` encoding
    ``bpe_train`` uses). Each rule is the same delimiter-doubling
    replace as the trainer, so encode semantics are byte-identical to
    the greedy left-to-right fold the rules were learned under."""
    w = col
    for _rnd, a, b, _cnt in merges:
        doubled = F.concat(F.lit("  "),
                           F.replace(w, F.lit(" "), F.lit("  ")),
                           F.lit("  "))
        merged = F.replace(doubled, F.lit(f" {a}  {b} "), F.lit(f" {a}{b} "))
        w = F.trim(F.regexp_replace(merged, " +", " "))
    return w


def bpe_encode(df: DataFrame, text_col: str, id_col: str,
               merges: list[tuple[int, str, str, int]]) -> DataFrame:
    """Tokenize documents with a pretrained BPE merge table: per-row
    word count and subword-piece count.

    The scale shape is a DICTIONARY encode: merges apply once per
    DISTINCT word (|V| rows — millions at 100 TB, not billions), the
    tiny word→n_pieces dictionary broadcasts back into the exploded
    token stream, and the only full-width shuffle keys on the row id
    for the per-document sum. Rows with no tokens keep n_words =
    n_pieces = 0 via the final left join (nothing silently drops).

    Returns (id_col, n_words BIGINT, n_pieces BIGINT). Reference has
    no subword tokenizer (whitespace heuristics only,
    result_ranker.py:246-264); this is the encoder half of the
    training-pipeline extension started by ``bpe_train``.
    """
    from memory_engine_spark.operators.dedup import tokens

    toks = df.select(F.col(id_col), tokens(F.col(text_col)).alias("_toks"))
    exploded = toks.select(id_col, F.explode("_toks").alias("word"))
    dictionary = (exploded.select("word").distinct()
                  .select("word", bpe_apply(
                      F.trim(F.regexp_replace(F.col("word"), "(.)", "$1 ")),
                      merges).alias("_enc"))
                  .select("word", F.size(F.split("_enc", " "))
                          .cast("bigint").alias("_np")))
    agg = (exploded.join(F.broadcast(dictionary), "word")
           .groupBy(id_col)
           .agg(F.count(F.lit(1)).cast("bigint").alias("n_words"),
                F.sum("_np").cast("bigint").alias("n_pieces")))
    return (df.select(id_col).join(agg, id_col, "left")
            .select(id_col,
                    F.coalesce("n_words", F.lit(0)).cast("bigint")
                    .alias("n_words"),
                    F.coalesce("n_pieces", F.lit(0)).cast("bigint")
                    .alias("n_pieces")))


def probe_features(df: DataFrame, text_col: str, id_col: str,
                   dim: int = 64) -> DataFrame:
    """Hashed bag-of-words features for the linear quality probe:
    bucket j = md5word(token) % dim, x = bucket count / token count,
    plus a bias feature (j = dim, x = 1.0). Rows without tokens drop
    (no signal, and 0/0 is undefined on any engine). Returns
    (id, j, x) — the exploded sparse feature matrix, ratios of
    integers so every x is the same double everywhere."""
    from memory_engine_spark.operators.dedup import tokens

    toks = df.select(F.col(id_col), F.explode(tokens(F.col(text_col)))
                     .alias("_tok"))
    bucket = (F.conv(F.substring(F.md5(F.col("_tok")), 1, 8), 16, 10)
              .cast("long") % dim).cast("int")
    counts = (toks.select(id_col, bucket.alias("j"))
              .groupBy(id_col, "j").agg(F.count(F.lit(1)).alias("c")))
    n_tok = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("n"))
    feats = (counts.join(n_tok, id_col)
             .select(id_col, "j",
                     (F.col("c").cast("double") / F.col("n").cast("double"))
                     .alias("x")))
    bias = n_tok.select(id_col, F.lit(dim).cast("int").alias("j"),
                        F.lit(1.0).alias("x"))
    return feats.unionByName(bias)


def logistic_probe(df: DataFrame, text_col: str, id_col: str,
                   label_col, dim: int = 64, n_steps: int = 3,
                   lr: float = 1.0, pos_weight: float | Column = 1.0,
                   neg_weight: float | Column = 1.0,
                   prebuilt_feats: DataFrame | None = None,
                   label_aux: DataFrame | None = None
                   ) -> tuple[list[float], DataFrame]:
    """Linear quality-probe classifier (the fasttext/CCNet-style
    model-based corpus filter) trained END TO END in the engine:
    ``n_steps`` full-batch gradient-descent steps over hashed
    bag-of-words features, then per-document scoring. Returns
    (weights, scored_df) with scored_df = (id, label, score).

    Every step is oracle-unrollable because NOTHING depends on
    engine-local transcendentals or float summation order (the q86
    discipline applied to ML training):

    - the link is the RATIONAL fast sigmoid p = 0.5 + 0.5·z/(1+|z|) —
      pure IEEE arithmetic, bit-identical on any engine, unlike exp();
    - per-document z sums as BIGINT femto-units
      (floor(w_j·x_j·1e15 + 0.5)), so the dot product is
      order-independent;
    - the gradient Σ wt_y·(p−y)·x_j sums as BIGINT pico-units per
      feature (``pos_weight``/``neg_weight`` = the standard class
      re-balancing for skewed corpora — without it the bias gradient
      of the majority class swamps the signal buckets);
    - the weight update w − ((g/1e12)·lr)/n runs in the SAME
      association driver-side and in SQL.

    Scale shape: the sparse feature matrix builds once (explode +
    two map-side-combined aggregates) and persists; each step is one
    broadcast join against the (dim+1)-row weight table, one id-keyed
    BIGINT sum, one feature-keyed BIGINT sum, and a (dim+1)-row
    collect — the pagerank shuffle discipline with the rank vector
    replaced by the weight vector. ``prebuilt_feats`` takes an
    already-persisted probe_features frame (the feature matrix is the
    ingest-time artifact; labels/steps are per-query).

    Latency shape (r16, guide §1.2/§2.4 — fewer driver actions, same
    bits): the whole run is ``n_steps`` gradient collects + the scored
    checkpoint, nothing else.

    - The old up-front ``labels.count()`` action is FOLDED into the
      first gradient collect as a ``j = -1`` sentinel row (the
      feature ids are 0..dim, so -1 never collides).
    - Step 1 always runs from w = 0, where every per-feature term is
      ``floor(0.0·x·1e15 + 0.5) = 0``, so z = 0 and the rational
      sigmoid is EXACTLY 0.5 for every document — the z/p subplan is
      a constant and is skipped; the step-1 gradient term
      ``(0.5 − y)·x·wt`` is the same IEEE expression in the same
      association, so the weights are bit-identical.
    - Steps 2+ cannot share one action: full-batch GD is sequential
      (step k's join needs step k−1's collected weights) — measured
      and closed, see OPTIMIZATION_r16.md.
    - ``pos_weight``/``neg_weight`` also accept Column expressions
      over the label frame's columns, and ``label_aux`` (a 1-row
      aggregate frame) is broadcast-crossJoined into the label frame
      once at build — so a caller's class-balance statistics ride the
      persisted labels instead of costing a separate up-front action
      (q150's n_pos/n_all fold).
    """
    spark = df.sparkSession
    own = prebuilt_feats is None
    feats = (probe_features(df, text_col, id_col, dim).persist()
             if own else prebuilt_feats)
    # labels feeds every GD step's gradient join plus the final
    # scoring join (n_steps+1 consumers); unpinned it re-runs the
    # corpus scan + feature-id distinct each time (the
    # branch-re-derivation rule). It is one int per doc — pin it; the
    # first gradient collect materializes it.
    lbl = df.select(F.col(id_col), F.col(label_col).cast("int").alias("y"))
    if label_aux is not None:
        lbl = lbl.crossJoin(F.broadcast(label_aux))
    labels = lbl.join(feats.select(id_col).distinct(), id_col).persist()
    pw = pos_weight if isinstance(pos_weight, Column) else F.lit(pos_weight)
    nw = neg_weight if isinstance(neg_weight, Column) else F.lit(neg_weight)
    wt = F.when(F.col("y") == 1, pw).otherwise(nw)
    n_docs = None
    w = [0.0] * (dim + 1)
    try:
        for step in range(n_steps):
            if step == 0:
                # w == 0: p is exactly 0.5 for every doc (see
                # docstring) — no z/p subplan, and the n_docs count
                # rides this collect as the j = -1 row.
                grad = (feats.join(labels, id_col)
                        .select("j", F.floor(
                            (F.lit(0.5) - F.col("y").cast("double"))
                            * F.col("x") * wt * F.lit(1e12) + F.lit(0.5))
                            .cast("long").alias("g"))
                        .groupBy("j").agg(F.sum("g").alias("gm"))
                        .unionByName(
                            labels.agg(F.count(F.lit(1)).alias("gm"))
                            .select(F.lit(-1).alias("j"), "gm")))
            else:
                wdf = spark.createDataFrame(
                    [(j, wj) for j, wj in enumerate(w)], "j int, w double")
                z = (feats.join(F.broadcast(wdf), "j")
                     .select(id_col,
                             F.floor(F.col("w") * F.col("x") * F.lit(1e15)
                                     + F.lit(0.5)).cast("long").alias("zt"))
                     .groupBy(id_col).agg(F.sum("zt").alias("zm")))
                p = (z.select(id_col,
                              (F.col("zm").cast("double") / F.lit(1e15))
                              .alias("zv"))
                     .select(id_col,
                             (F.lit(0.5) + F.lit(0.5) * F.col("zv")
                              / (F.lit(1.0) + F.abs(F.col("zv"))))
                             .alias("p")))
                grad = (feats.join(p, id_col).join(labels, id_col)
                        .select("j", F.floor(
                            (F.col("p") - F.col("y").cast("double"))
                            * F.col("x") * wt * F.lit(1e12) + F.lit(0.5))
                            .cast("long").alias("g"))
                        .groupBy("j").agg(F.sum("g").alias("gm")))
            gmap = {r["j"]: r["gm"] for r in grad.collect()}
            if step == 0:
                n_docs = gmap.pop(-1)
            w = [wj - ((gmap.get(j, 0) / 1e12) * lr) / n_docs
                 for j, wj in enumerate(w)]
        wdf = spark.createDataFrame(
            [(j, wj) for j, wj in enumerate(w)], "j int, w double")
        scored = (feats.join(F.broadcast(wdf), "j")
                  .select(id_col,
                          F.floor(F.col("w") * F.col("x") * F.lit(1e15)
                                  + F.lit(0.5)).cast("long").alias("zt"))
                  .groupBy(id_col).agg(F.sum("zt").alias("zm"))
                  .select(id_col,
                          (F.col("zm").cast("double") / F.lit(1e15))
                          .alias("zv"))
                  .select(id_col,
                          (F.lit(0.5) + F.lit(0.5) * F.col("zv")
                           / (F.lit(1.0) + F.abs(F.col("zv"))))
                          .alias("p"))
                  .join(labels, id_col)
                  .select(id_col, F.col("y").alias("label"),
                          (F.floor(F.col("p") * F.lit(1e6) + F.lit(0.5))
                           .cast("double") / F.lit(1e6)).alias("score"))
                  .transform(_lc))
        return w, scored
    finally:
        labels.unpersist(False)   # scored is checkpointed; safe to drop
        if own:
            feats.unpersist(False)


def span_corrupt(df: DataFrame, text_col: str, id_col: str,
                 mask_denom: int = 5,
                 salt: str = "t5") -> DataFrame:
    """T5-style span corruption (Raffel et al. 2020 §3.1.4) — the
    denoising-objective prep step: ~1/``mask_denom`` of whitespace
    tokens are masked by a DETERMINISTIC md5 coin (same trick as
    ``hash_split`` — stable across runs, partitions, and engines),
    CONSECUTIVE masked tokens collapse into one span, the input
    replaces each span with an ordinal ``<extra_id_k>`` sentinel, and
    the target lists each sentinel + its hidden tokens, closed by a
    terminal sentinel. Returns (id, input_text, target_text,
    n_spans, n_masked).

    Relational shape (no Python anywhere): posexplode → md5 coin →
    gaps-and-islands span grouping (pos − row_number over masked
    tokens), sentinel numbering by span start, then two ordered
    re-aggregations. Windows run per document — bounded frames.
    A document with no masked tokens yields the original text and a
    bare ``<extra_id_0>`` target."""
    toks = df.select(
        id_col,
        F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "tok"))
    coin = (F.conv(F.substring(F.md5(F.concat_ws(
        ":", F.lit(salt), F.col(id_col).cast("string"),
        F.col("pos").cast("string"))), 1, 4), 16, 10)
        .cast("long") % mask_denom == 0)
    toks = toks.select(id_col, "pos", "tok", coin.alias("m"))

    wm = Window.partitionBy(id_col).orderBy("pos")
    masked = (toks.filter("m")
              .withColumn("_grp", F.col("pos") - F.row_number().over(wm)))
    spans = (masked.groupBy(id_col, "_grp")
             .agg(F.min("pos").alias("start"),
                  F.count("*").alias("n_toks"),
                  F.array_join(F.transform(
                      F.array_sort(F.collect_list(
                          F.struct("pos", "tok"))),
                      lambda s: s["tok"]), " ").alias("hidden")))
    ws = Window.partitionBy(id_col).orderBy("start")
    spans = spans.withColumn("k", F.row_number().over(ws) - 1)

    sentinels = spans.select(
        id_col, F.col("start").alias("pos"),
        F.concat(F.lit("<extra_id_"), F.col("k").cast("string"),
                 F.lit(">")).alias("tok"))
    inputs = (toks.filter(~F.col("m")).select(id_col, "pos", "tok")
              .unionByName(sentinels)
              .groupBy(id_col)
              .agg(F.array_join(F.transform(
                  F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                  lambda s: s["tok"]), " ").alias("input_text")))
    targets = (spans.groupBy(id_col)
               .agg(F.count("*").alias("n_spans"),
                    F.sum("n_toks").cast("long").alias("n_masked"),
                    F.array_join(F.transform(
                        F.array_sort(F.collect_list(F.struct(
                            "k",
                            F.concat(F.lit("<extra_id_"),
                                     F.col("k").cast("string"),
                                     F.lit("> "), F.col("hidden"))
                            .alias("piece")))),
                        lambda s: s["piece"]), " ").alias("_tgt")))
    base = df.select(id_col, F.col(text_col).alias("_orig"))
    out = (base.join(inputs, id_col, "left")
           .join(targets, id_col, "left"))
    n_spans = F.coalesce(F.col("n_spans"), F.lit(0)).cast("int")
    return out.select(
        id_col,
        F.coalesce(F.col("input_text"), F.col("_orig"))
        .alias("input_text"),
        F.concat(
            F.when(F.col("_tgt").isNull(), F.lit(""))
            .otherwise(F.concat(F.col("_tgt"), F.lit(" "))),
            F.lit("<extra_id_"), n_spans.cast("string"), F.lit(">"))
        .alias("target_text"),
        n_spans.alias("n_spans"),
        F.coalesce(F.col("n_masked"), F.lit(0)).cast("long")
        .alias("n_masked"))


CHAT_SYS = "<|system|>You are helpful.<|end|>"
CHAT_U0, CHAT_U1 = "<|user|>", "<|end|>"
CHAT_A0, CHAT_A1 = "<|assistant|>", "<|end|>"


def render_chat(turns: DataFrame, id_col: str = "doc_id",
                round_col: str = "round", user_col: str = "user_msg",
                asst_col: str = "asst_msg") -> DataFrame:
    """SFT example assembly: render a multi-turn conversation into
    the training string AND emit the LOSS-MASK span per assistant
    turn — the (start, len) character offsets a trainer needs to
    compute loss on assistant tokens only. Offsets come from an
    exclusive prefix-sum window over per-turn block lengths (ordered
    by round, per conversation — bounded frames), so the arithmetic
    is exact and SQL-replayable; `substr(rendered, asst_start,
    asst_len) == asst_msg` is the invariant (pinned in tests and by
    the q178 oracle's hash). Returns one row per (id, round):
    (id, round, asst_start 1-based, asst_len, render_md5,
    total_chars)."""
    u_block = F.concat(F.lit(CHAT_U0), F.col(user_col), F.lit(CHAT_U1))
    a_block = F.concat(F.lit(CHAT_A0), F.col(asst_col), F.lit(CHAT_A1))
    t = turns.select(
        id_col, round_col, user_col, asst_col,
        (F.length(u_block) + F.length(a_block)).alias("_blk_len"),
        F.concat(u_block, a_block).alias("_block"))
    w = (Window.partitionBy(id_col).orderBy(round_col)
         .rowsBetween(Window.unboundedPreceding, -1))
    t = t.withColumn(
        "_prefix",
        F.lit(len(CHAT_SYS)) + F.coalesce(F.sum("_blk_len").over(w),
                                          F.lit(0)))
    spans = t.select(
        id_col, round_col,
        (F.col("_prefix") + F.length(F.lit(CHAT_U0))
         + F.length(F.col(user_col)) + F.length(F.lit(CHAT_U1))
         + F.length(F.lit(CHAT_A0)) + 1).cast("long")
        .alias("asst_start"),
        F.length(F.col(asst_col)).cast("long").alias("asst_len"))
    rendered = (t.groupBy(id_col).agg(
        F.concat(F.lit(CHAT_SYS), F.array_join(
            F.transform(F.array_sort(F.collect_list(
                F.struct(round_col, "_block"))),
                lambda s: s["_block"]), "")).alias("_rendered")))
    return (spans.join(rendered, id_col)
            .select(id_col, round_col, "asst_start", "asst_len",
                    F.md5("_rendered").alias("render_md5"),
                    F.length("_rendered").cast("long")
                    .alias("total_chars")))


def bleu_report(pairs: DataFrame, cand_col: str = "cand",
                ref_col: str = "ref", id_col: str = "doc_id",
                max_n: int = 4) -> DataFrame:
    """Corpus BLEU components per (candidate, reference) pair
    (Papineni et al. 2002): for n = 1..max_n the CLIPPED n-gram match
    count (per-gram min of candidate and reference occurrences — the
    'modified precision' trick that stops word-spam inflation) and
    the candidate total, plus lengths and the smoothed sentence BLEU
    (epsilon-free: pairs with any zero precision get bleu 0, the
    uns-moothed original). All counts are exact integers; only the
    final bleu does float math (ln/exp, emitted rounded to 6dp —
    same both engines at this precision).

    Relational shape (r16, the chrf_report long form): ONE word-gram
    explode per side covering all orders n = 1..max_n as (n, gram)
    structs — instead of the original per-n loop (2·max_n explode
    scans + 3·max_n id-keyed left joins = 8 scans, 12 shuffles at
    max_n=4) — one clip join on (id, n, gram), one conditional-sum
    pivot back to the clip columns. The per-n candidate TOTALS never
    need the gram census at all: the n-gram count of a token list is
    the length formula max(cand_len−n+1, 0). Same exact integer
    components; the BLEU float expression is unchanged."""
    from memory_engine_spark.operators.dedup import _spread

    toks_c = F.split(F.col(cand_col), " ")
    toks_r = F.split(F.col(ref_col), " ")
    # _spread: the explode feeders otherwise run on the single-file
    # corpus scan's one task.
    base = _spread(pairs.select(
        id_col, toks_c.alias("_tc"), toks_r.alias("_tr"),
        F.size(toks_c).cast("long").alias("cand_len"),
        F.size(toks_r).cast("long").alias("ref_len")))

    # r17 (guide §2.3/§2.4): the clip join is gone. Both gram censuses
    # key on the SAME (id, n, gram) and come from the SAME base row,
    # so ONE explode over the concat of the two side-tagged gram
    # arrays + one conditional count per side replaces the two
    # separate censuses AND their inner join: a gram group missing
    # from one side has nc=0 or nr=0, so least(nc, nr)=0 contributes
    # exactly what the inner join's dropped row did (integer sums —
    # no float-order concern). The per-(id, n) intermediate groupBy
    # also folds into the final per-id conditional sums (integer-sum
    # associativity). Plan: 2 explode scans + 2 exchanges + 1 join +
    # 2 agg exchanges → 1 explode scan + 2 exchanges, no join.
    def all_grams(tok_col, c, r):
        t = F.col(tok_col)
        return F.flatten(F.transform(
            F.sequence(F.lit(1), F.lit(max_n)),
            lambda n: F.when(
                F.size(t) >= n,
                F.transform(
                    F.sequence(F.lit(0), F.size(t) - n),
                    lambda i: F.struct(
                        n.cast("int").alias("n"),
                        F.concat_ws(" ", F.slice(t, i + 1, n))
                        .alias("g"),
                        F.lit(c).alias("c"), F.lit(r).alias("r")))
            ).otherwise(
                F.array().cast(
                    "array<struct<n:int,g:string,c:int,r:int>>"))))

    gb = (base.select(id_col, F.explode(F.concat(
              all_grams("_tc", 1, 0),
              all_grams("_tr", 0, 1))).alias("x"))
          .groupBy(id_col, "x.n", "x.g")
          .agg(F.sum("x.c").alias("nc"), F.sum("x.r").alias("nr")))
    m_aggs = [F.sum(F.when(F.col("n") == n, F.least("nc", "nr")))
              .alias(f"clip{n}") for n in range(1, max_n + 1)]
    tot_cols = [F.greatest(F.col("cand_len") - (n - 1), F.lit(0))
                .cast("long").alias(f"tot{n}")
                for n in range(1, max_n + 1)]
    out = (base.select(id_col, "cand_len", "ref_len", *tot_cols)
           .join(gb.groupBy(id_col).agg(*m_aggs), id_col, "left"))
    for n in range(1, max_n + 1):
        out = out.withColumn(
            f"clip{n}",
            F.coalesce(F.col(f"clip{n}"), F.lit(0)).cast("long"))
    logsum = None
    any_zero = F.lit(False)
    for n in range(1, max_n + 1):
        p = F.col(f"clip{n}") / F.col(f"tot{n}")
        any_zero = any_zero | (F.col(f"clip{n}") == 0) \
            | (F.col(f"tot{n}") == 0)
        term = F.log(p)
        logsum = term if logsum is None else logsum + term
    bp = F.when(F.col("cand_len") >= F.col("ref_len"), F.lit(1.0)) \
        .otherwise(F.exp(1.0 - F.col("ref_len") / F.col("cand_len")))
    bleu = F.when(any_zero, F.lit(0.0)) \
        .otherwise(bp * F.exp(logsum / max_n))
    return out.select(
        id_col, "cand_len", "ref_len",
        *[F.col(f"clip{n}") for n in range(1, max_n + 1)],
        *[F.col(f"tot{n}") for n in range(1, max_n + 1)],
        F.round(bleu, 6).alias("bleu"))


def rouge_report(pairs: DataFrame, cand_col: str = "cand",
                 ref_col: str = "ref", id_col: str = "doc_id",
                 max_n: int = 2) -> DataFrame:
    """ROUGE-N components per (candidate, reference) pair (Lin 2004
    — the RECALL-side eval metric summarization / SFT pipelines run
    at corpus scale, complementing bleu_report's precision side):
    for n = 1..max_n the CLIPPED n-gram match count (per-gram min of
    candidate and reference occurrences) plus BOTH totals, so
    precision = match/cand_total, recall = match/ref_total, and
    F1 = 2PR/(P+R) (0 when match is 0) all derive from exact integer
    components; only the three final ratios are floats, emitted
    rounded to 6dp (same both engines at this precision).

    Relational shape (reference parity: the reference computes
    ROUGE-style unit overlap driver-side in its QA evidence scorer,
    memory_core row loops — here it is two gram explodes + groupBy
    counts + an inner join on (id, gram) per n, all JVM-side, no
    Python, no windows). Scale posture: each join key is (id, gram)
    — cardinality bounded by tokens per doc, perfectly partitioned,
    map-side combinable; nothing is quadratic in corpus size.

    r16: the chrf_report long form — ONE word-gram explode per side
    covering all orders as (n, gram) structs, one clip join on
    (id, n, gram), one conditional-sum pivot; both totals are the
    length formula max(len−n+1, 0) (no gram census needed). Same
    exact integer components, same float expressions."""
    from memory_engine_spark.operators.dedup import _spread

    toks_c = F.split(F.col(cand_col), " ")
    toks_r = F.split(F.col(ref_col), " ")
    base = _spread(pairs.select(
        id_col, toks_c.alias("_tc"), toks_r.alias("_tr"),
        F.size(toks_c).cast("long").alias("_lc"),
        F.size(toks_r).cast("long").alias("_lr")))

    # r17: clip join removed — one side-tagged explode + conditional
    # per-side counts; see bleu_report for the equivalence argument
    # (least(nc, 0) = 0 replays the inner join's dropped rows; all
    # integer sums).
    def all_grams(tok_col, c, r):
        t = F.col(tok_col)
        return F.flatten(F.transform(
            F.sequence(F.lit(1), F.lit(max_n)),
            lambda n: F.when(
                F.size(t) >= n,
                F.transform(
                    F.sequence(F.lit(0), F.size(t) - n),
                    lambda i: F.struct(
                        n.cast("int").alias("n"),
                        F.concat_ws(" ", F.slice(t, i + 1, n))
                        .alias("g"),
                        F.lit(c).alias("c"), F.lit(r).alias("r")))
            ).otherwise(
                F.array().cast(
                    "array<struct<n:int,g:string,c:int,r:int>>"))))

    gb = (base.select(id_col, F.explode(F.concat(
              all_grams("_tc", 1, 0),
              all_grams("_tr", 0, 1))).alias("x"))
          .groupBy(id_col, "x.n", "x.g")
          .agg(F.sum("x.c").alias("nc"), F.sum("x.r").alias("nr")))
    m_aggs = [F.sum(F.when(F.col("n") == n, F.least("nc", "nr")))
              .alias(f"m{n}") for n in range(1, max_n + 1)]
    tot_cols = []
    for n in range(1, max_n + 1):
        tot_cols.append(
            F.greatest(F.col("_lc") - (n - 1), F.lit(0))
            .cast("long").alias(f"tc{n}"))
        tot_cols.append(
            F.greatest(F.col("_lr") - (n - 1), F.lit(0))
            .cast("long").alias(f"tr{n}"))
    out = (base.select(id_col, *tot_cols)
           .join(gb.groupBy(id_col).agg(*m_aggs), id_col, "left"))
    for n in range(1, max_n + 1):
        out = out.withColumn(
            f"m{n}",
            F.coalesce(F.col(f"m{n}"), F.lit(0)).cast("long"))
    cols = [F.col(id_col)]
    for n in range(1, max_n + 1):
        m, tc, tr = (F.col(f"m{n}"), F.col(f"tc{n}"), F.col(f"tr{n}"))
        p = F.when(tc > 0, m / tc).otherwise(F.lit(0.0))
        r = F.when(tr > 0, m / tr).otherwise(F.lit(0.0))
        f1 = F.when(m > 0, 2 * (m / tc) * (m / tr)
                    / (m / tc + m / tr)).otherwise(F.lit(0.0))
        cols += [m.alias(f"match{n}"), tc.alias(f"cand_tot{n}"),
                 tr.alias(f"ref_tot{n}"),
                 F.round(p, 6).alias(f"rouge{n}_p"),
                 F.round(r, 6).alias(f"rouge{n}_r"),
                 F.round(f1, 6).alias(f"rouge{n}_f")]
    return out.select(*cols)


def chrf_report(pairs: DataFrame, cand_col: str = "cand",
                ref_col: str = "ref", id_col: str = "doc_id",
                max_n: int = 6, beta: float = 2.0) -> DataFrame:
    """chrF components per (candidate, reference) pair (Popović
    2015, the character-level MT metric sacrebleu ships next to
    BLEU): character n-grams n = 1..max_n over the WHITESPACE-
    STRIPPED strings, clipped match + both totals per n as exact
    integers, then the pinned scoring spec: per-n P and R are
    averaged over the EFFECTIVE orders only (orders where the
    respective total > 0 — short-string orders are skipped, the
    epsilon-free analogue of sacrebleu's effective order), and
    chrF_beta = (1+β²)·avgP·avgR / (β²·avgP + avgR), 0 when the
    denominator is 0; β = 2 (recall-weighted, the standard chrF2),
    rounded 6dp. Relational shape: one char-gram explode per side
    per n — substring() over a position sequence, all JVM-side; the
    join keys are (id, gram), map-side combinable, nothing
    quadratic."""
    def chars(col):
        return F.regexp_replace(F.col(col), " ", "")

    from memory_engine_spark.operators.dedup import _spread

    # _spread: the explode feeders otherwise run on the single-file
    # corpus scan's one task.
    base = _spread(pairs.select(
        id_col, chars(cand_col).alias("_sc"),
        chars(ref_col).alias("_sr")))

    # ONE explode per side covering ALL orders n = 1..max_n as
    # (n, gram) structs, instead of the original per-n loop (2·max_n
    # explode branches + 3·max_n id-keyed left joins = 12 scans and
    # 18 shuffles at max_n=6 — measured 4.4 s warm at sf0.1 under the
    # r9 noop-write bench; pinning base made it WORSE, 10.5 s, because
    # the join chain itself was the cost). Long form keys everything
    # on (id, n, gram) → one clip join + per-(id, n) totals → one
    # conditional-sum pivot back to the m/tc/tr columns. Same exact
    # integer components, 2 explodes + 3 joins + 1 pivot agg.
    # The per-n TOTALS never need the gram census at all — the n-gram
    # count of a string is a length formula, max(L−n+1, 0) — so the
    # census feeds ONLY the clip computation.
    # r17: clip join removed — one side-tagged explode + conditional
    # per-side counts; see bleu_report for the equivalence argument
    # (least(nc, 0) = 0 replays the inner join's dropped rows; all
    # integer sums).
    def all_grams(scol, c, r):
        s = F.col(scol)
        return F.flatten(F.transform(
            F.sequence(F.lit(1), F.lit(max_n)),
            lambda n: F.when(
                F.length(s) >= n,
                F.transform(
                    F.sequence(F.lit(1), F.length(s) - n + 1),
                    lambda i: F.struct(n.cast("int").alias("n"),
                                       F.substring(s, i, n).alias("g"),
                                       F.lit(c).alias("c"),
                                       F.lit(r).alias("r")))
            ).otherwise(
                F.array().cast(
                    "array<struct<n:int,g:string,c:int,r:int>>"))))

    gb = (base.select(id_col, F.explode(F.concat(
              all_grams("_sc", 1, 0),
              all_grams("_sr", 0, 1))).alias("x"))
          .groupBy(id_col, "x.n", "x.g")
          .agg(F.sum("x.c").alias("nc"), F.sum("x.r").alias("nr")))
    m_aggs = [F.sum(F.when(F.col("n") == n, F.least("nc", "nr")))
              .alias(f"m{n}") for n in range(1, max_n + 1)]
    tot_cols = []
    for n in range(1, max_n + 1):
        tot_cols.append(
            F.greatest(F.length("_sc") - (n - 1), F.lit(0))
            .cast("long").alias(f"tc{n}"))
        tot_cols.append(
            F.greatest(F.length("_sr") - (n - 1), F.lit(0))
            .cast("long").alias(f"tr{n}"))
    out = (base.select(id_col, *tot_cols)
           .join(gb.groupBy(id_col).agg(*m_aggs), id_col, "left"))
    for n in range(1, max_n + 1):
        out = out.withColumn(
            f"m{n}",
            F.coalesce(F.col(f"m{n}"), F.lit(0)).cast("long"))
    psum, pcnt, rsum, rcnt = (F.lit(0.0), F.lit(0), F.lit(0.0),
                              F.lit(0))
    for n in range(1, max_n + 1):
        m, tc, tr = (F.col(f"m{n}"), F.col(f"tc{n}"), F.col(f"tr{n}"))
        psum = psum + F.when(tc > 0, m / tc).otherwise(F.lit(0.0))
        pcnt = pcnt + F.when(tc > 0, 1).otherwise(0)
        rsum = rsum + F.when(tr > 0, m / tr).otherwise(F.lit(0.0))
        rcnt = rcnt + F.when(tr > 0, 1).otherwise(0)
    avg_p = F.when(pcnt > 0, psum / pcnt).otherwise(F.lit(0.0))
    avg_r = F.when(rcnt > 0, rsum / rcnt).otherwise(F.lit(0.0))
    b2 = beta * beta
    denom = b2 * avg_p + avg_r
    score = F.when(denom > 0,
                   (1 + b2) * avg_p * avg_r / denom) \
        .otherwise(F.lit(0.0))
    cols = [F.col(id_col)]
    for n in range(1, max_n + 1):
        cols += [F.col(f"m{n}"), F.col(f"tc{n}"), F.col(f"tr{n}")]
    return out.select(*cols, F.round(score, 6).alias("chrf"))


def poisson_cum_u(max_k: int = 6, quant: int = 10 ** 4) -> list[int]:
    """Quantized Poisson(1) CDF thresholds: cum_u[k] =
    round(quant · P(X ≤ k)). Computed ONCE driver-side and injected
    as the same integer literals into both engines (the ir_disc_u
    trick), so bootstrap replica counts need no runtime exp/
    factorial anywhere."""
    import math

    cum, acc = [], 0.0
    for k in range(max_k + 1):
        acc += math.exp(-1.0) / math.factorial(k)
        cum.append(min(quant, round(quant * acc)))
    return cum


def poisson_bootstrap(df: DataFrame, value_col: str, id_col: str,
                      n_replicates: int = 20,
                      salt: str = "boot") -> DataFrame:
    """Deterministic Poisson bootstrap — the only bootstrap that
    works at 100 TB (Chamandy et al., Google 2012: resampling with
    replacement is a shuffle of the whole corpus per replicate;
    Poisson(1) replica WEIGHTS are a scan): each (row, replicate)
    draws u = md5(salt‖b‖id) mod 10⁴ — the repo's engine-stable
    uniform — and maps it through the `poisson_cum_u` shared-literal
    thresholds to a replica count k (capped at len(cum)); replicate
    statistics are then weighted aggregates: Σk·v and Σk as exact
    BIGINTs, the mean their single float division (6dp). Returns one
    row per replicate — percentile selection over B≈20 rows is a
    driver-trivial epilogue (tests pin it). Relational shape: an
    explode by B on the scan, one groupBy(replicate) — map-side
    combinable, no data shuffle beyond B partial rows per task."""
    reps = F.explode(F.sequence(
        F.lit(0), F.lit(n_replicates - 1))).alias("b")
    cum = poisson_cum_u()
    u = (F.conv(F.substring(F.md5(F.concat_ws(
        ":", F.lit(salt), F.col("b").cast("string"),
        F.col(id_col).cast("string"))), 1, 8), 16, 10)
        .cast("long") % 10000)
    k = F.lit(len(cum))
    for j in range(len(cum) - 1, -1, -1):
        k = F.when(u < cum[j], F.lit(j)).otherwise(k)
    rows = (df.select(id_col, F.col(value_col).cast("long")
                      .alias("_v"), reps)
            .withColumn("_k", k.cast("long")))
    return (rows.groupBy("b").agg(
        F.sum("_k").alias("n_eff"),
        F.sum(F.col("_k") * F.col("_v")).alias("wsum"))
        .select(
            F.col("b").cast("int").alias("replicate"),
            F.col("n_eff").cast("long").alias("n_eff"),
            F.col("wsum").cast("long").alias("wsum"),
            F.round(F.when(F.col("n_eff") > 0,
                           F.col("wsum") / F.col("n_eff"))
                    .otherwise(F.lit(0.0)), 6).alias("mean")))
