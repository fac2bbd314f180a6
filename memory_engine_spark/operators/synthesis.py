"""Synthesis analytics: pattern detection, trend analysis, anomaly
detection, contradiction detection.

Reference: /root/reference/memory_core/synthesis/insight_discovery.py —
frequency patterns (co-occurring term pairs ≥ min_count, :202-245,563-588),
hierarchy/sequence chains (:289-374), time-series trends with slope
direction (:1062-1166), growth rate (:1168-1183), sudden-change >50%
jumps (:1307-1344), temporal burst/gap anomalies (:1652-1734), IQR
outliers (:1793-1822, in operators/aggregates.py), structural anomalies
(isolated/hub nodes, :1499-1577); contradiction detection
/root/reference/memory_core/mcp_integration/enhanced_mcp_endpoint.py:587-681,
889-951 (negation-pattern heuristic over high-confidence node pairs
sharing topic terms).

All deterministic, all built-ins: explode + self-join for co-occurrence,
``regr_slope`` for trends, ``lag`` windows for bursts/changes, blocked
self-join + expression scoring for contradictions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from memory_engine_spark.checkpoint import lc as _lc

from memory_engine_spark.operators.dedup import tokens, _spread
from memory_engine_spark.operators.text import STOPWORDS


# ---------------------------------------------------------------------------
# pattern detection
# ---------------------------------------------------------------------------

def term_cooccurrence(df: DataFrame, text_col: str, id_col: str,
                      min_count: int = 3, min_term_len: int = 3) -> DataFrame:
    """Frequency patterns: pairs of terms co-occurring in ≥ min_count
    documents (insight_discovery.py:202-245). Stop words and short terms
    dropped, terms distinct per doc, pair ordered t1 < t2.

    Explode → self-join per doc → count: the join is blocked on the
    document id, so cost is Σ terms²-per-doc, not corpus²."""
    sw = F.array(*[F.lit(s) for s in STOPWORDS])
    terms = F.array_distinct(F.filter(
        tokens(F.col("_txt")),
        lambda t: (~F.array_contains(sw, t)) & (F.length(t) >= min_term_len)))
    narrow = _spread(df.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_txt")))
    ex = narrow.select("_id", F.explode(terms).alias("term"))
    a = ex.select(F.col("_id").alias("_id"), F.col("term").alias("t1"))
    b = ex.select(F.col("_id").alias("_id"), F.col("term").alias("t2"))
    return (
        a.join(b, "_id").filter(F.col("t1") < F.col("t2"))
        .groupBy("t1", "t2").agg(F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") >= min_count)
    )


def relation_chains(edges: DataFrame, chain_types: list[str],
                    max_len: int = 4) -> DataFrame:
    """Hierarchy/sequence patterns: chains of typed edges (is_a/part_of
    → hierarchy; causes/leads_to/results_in → sequence,
    insight_discovery.py:289-374). Returns (path array<string>, length),
    one row per maximal-extension step ≥ 2 nodes. Iterative join like
    BFS; chains deduped by path."""
    e = (edges.filter(F.col("relation_type").isin(chain_types))
         .select("from_id", "to_id").distinct().persist())
    chains = e.select(F.array("from_id", "to_id").alias("path"),
                      F.col("to_id").alias("head"))
    out = chains.select("path")
    for _ in range(max_len - 2):
        nxt = (
            chains.join(e, chains["head"] == e["from_id"])
            .filter(~F.array_contains(F.col("path"), F.col("to_id")))  # no cycles
            .select(F.concat(F.col("path"), F.array(F.col("to_id"))).alias("path"),
                    F.col("to_id").alias("head"))
            .transform(_lc)
        )
        if nxt.isEmpty():
            break
        chains = nxt
        out = out.unionByName(nxt.select("path"))
    e.unpersist()
    return out.select("path", F.size("path").alias("length"))


# ---------------------------------------------------------------------------
# trend analysis
# ---------------------------------------------------------------------------

def monthly_trend(df: DataFrame, ts_col: str, bucket: str = "yyyy-MM") -> DataFrame:
    """Slope-based trend over time-bucket counts (insight_discovery.py:
    1062-1166): regr_slope of count vs bucket-index, plus growth rate
    (last−first)/first (:1168-1183). Returns one row."""
    m = df.select(F.date_format(ts_col, bucket).alias("month"))
    counts = m.groupBy("month").agg(F.count(F.lit(1)).alias("n"))
    w = Window.orderBy("month")
    idx = counts.withColumn("i", F.row_number().over(w) - 1)
    return idx.agg(
        F.round(F.expr("regr_slope(n, i)"), 6).alias("slope"),
        F.round(((F.max(F.struct("i", "n"))["n"] - F.min(F.struct("i", "n"))["n"])
                 / F.min(F.struct("i", "n"))["n"]), 6).alias("growth_rate"),
        F.count(F.lit(1)).alias("n_periods"),
    )


def autocorrelation(df: DataFrame, ts_col: str, lag: int = 1,
                    bucket: str = "yyyy-MM-dd") -> DataFrame:
    """Cyclical-pattern detection via lag-k autocorrelation of the
    bucket-count series (insight_discovery.py:1243-1305): Pearson corr
    of (n_t, n_{t−k}). One groupBy + one lag window + one corr agg."""
    b = df.select(F.date_format(ts_col, bucket).alias("bucket"))
    counts = b.groupBy("bucket").agg(F.count(F.lit(1)).alias("n"))
    w = Window.orderBy("bucket")
    lagged = counts.withColumn("prev", F.lag("n", lag).over(w)) \
        .filter(F.col("prev").isNotNull())
    return lagged.agg(
        F.round(F.corr("n", "prev"), 6).alias("autocorr"),
        F.count(F.lit(1)).alias("n_points"),
        F.lit(lag).cast("long").alias("lag"),
    )


def behavioral_anomalies(df: DataFrame, actor_col: str,
                         z_threshold: float = 2.0) -> DataFrame:
    """Behavioral anomalies (insight_discovery.py:1736-1791): actors
    whose activity volume deviates more than z_threshold standard
    deviations from the mean actor volume. Returns (actor, n, z)."""
    counts = df.groupBy(actor_col).agg(F.count(F.lit(1)).alias("n"))
    stats = counts.agg(F.avg("n").alias("mu"),
                       F.coalesce(F.stddev("n"), F.lit(0.0)).alias("sd"))
    z = (F.col("n") - F.col("mu")) / F.col("sd")
    return (counts.crossJoin(F.broadcast(stats))
            .filter(F.col("sd") > 0)
            .withColumn("z", F.round(z, 6))
            .filter(F.abs(F.col("z")) > z_threshold)
            .select(actor_col, "n", "z"))


def sudden_changes(df: DataFrame, ts_col: str, bucket: str = "yyyy-MM-dd",
                   jump_ratio: float = 0.5) -> DataFrame:
    """>50%-jump detection between consecutive time buckets
    (insight_discovery.py:1307-1344): |n_t − n_{t−1}| / n_{t−1} > ratio.
    Returns (bucket, n, prev_n, change_ratio)."""
    b = df.select(F.date_format(ts_col, bucket).alias("bucket"))
    counts = b.groupBy("bucket").agg(F.count(F.lit(1)).alias("n"))
    w = Window.orderBy("bucket")
    with_prev = counts.withColumn("prev_n", F.lag("n").over(w))
    ratio = F.abs(F.col("n") - F.col("prev_n")) / F.col("prev_n")
    return (
        with_prev.filter(F.col("prev_n").isNotNull())
        .withColumn("change_ratio", F.round(ratio, 6))
        .filter(F.col("change_ratio") > jump_ratio)
    )


# ---------------------------------------------------------------------------
# anomaly detection
# ---------------------------------------------------------------------------

def structural_anomalies(edges: DataFrame, nodes: DataFrame,
                         hub_degree: int = 10) -> DataFrame:
    """Isolated (degree 0) and hub (degree ≥ hub_degree) nodes
    (insight_discovery.py:1499-1577). Returns (node_id, degree, kind)."""
    from memory_engine_spark.operators.graph import degrees
    d = nodes.select("node_id").join(degrees(edges), "node_id", "left") \
        .fillna(0, ["degree"])
    return (
        d.withColumn("kind", F.when(F.col("degree") == 0, "isolated")
                     .when(F.col("degree") >= hub_degree, "hub"))
        .filter(F.col("kind").isNotNull())
        .select("node_id", F.col("degree").cast("long").alias("degree"), "kind")
    )


def temporal_bursts(df: DataFrame, ts_col: str, id_col: str,
                    burst_window_s: float = 60.0, min_burst: int = 5) -> DataFrame:
    """Burst anomalies: ≥ min_burst events inside one burst window
    (insight_discovery.py:1652-1734). Tumbling-window count — one shuffle."""
    w = F.window(F.col(ts_col), f"{int(burst_window_s)} seconds")
    return (
        df.groupBy(w.alias("w")).agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= min_burst)
        .select(F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
                F.col("n"))
    )


def temporal_gaps(df: DataFrame, ts_col: str, min_gap_s: float,
                  tiebreak: str | None = None) -> DataFrame:
    """Gap anomalies: consecutive-event gaps ≥ min_gap_s
    (insight_discovery.py:1652-1734). lag window over the time-sorted
    stream (``tiebreak`` makes equal timestamps deterministic); at scale
    partition by a stream key first."""
    w = Window.orderBy(*( [ts_col, tiebreak] if tiebreak else [ts_col] ))
    us = F.unix_micros(F.col(ts_col))
    gaps = df.select(F.col(ts_col).alias("ts"), (us - F.lag(us).over(w)).alias("gap_us"))
    return (
        gaps.filter(F.col("gap_us") >= int(min_gap_s * 1_000_000))
        .select(F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("gap_end"),
                F.round(F.col("gap_us") / 1_000_000.0, 6).alias("gap_s"))
    )


# ---------------------------------------------------------------------------
# contradiction detection
# ---------------------------------------------------------------------------

NEGATION_MARKERS = ["not", "no", "never", "cannot", "isnt", "dont", "doesnt",
                    "wasnt", "werent", "without"]


def detect_contradictions(df: DataFrame, text_col: str, id_col: str,
                          confidence_col: str | None = None,
                          min_confidence: float = 0.8,
                          topic_overlap: float = 0.7) -> DataFrame:
    """Heuristic contradiction pairs (enhanced_mcp_endpoint.py:587-681,
    889-951): among high-confidence texts, pairs whose shared-topic
    (content-word Jaccard) ≥ topic_overlap where exactly one side
    carries a negation marker.

    Blocked exactly like similar_content — shared non-stop-word join —
    so only topically-related pairs are scored."""
    base = df
    if confidence_col is not None:
        base = base.filter(F.col(confidence_col) >= min_confidence)
    sw = F.array(*[F.lit(s) for s in STOPWORDS])
    neg = F.array(*[F.lit(m) for m in NEGATION_MARKERS])
    toks = tokens(F.col("_txt"))
    words = F.array_distinct(F.filter(toks, lambda t: ~F.array_contains(sw, t)))
    narrow = _spread(base.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_txt")))
    # persist feeds both join sides; the small pair result is
    # materialized eagerly below and this intermediate released before
    # returning (no session-lifetime executor-memory pin).
    prepared = narrow.select(
        "_id",
        words.alias("w"),
        (F.size(F.array_intersect(toks, neg)) > 0).alias("has_neg"),
    ).persist()
    ex = prepared.select("_id", "has_neg",
                         F.size(F.array_except("w", neg)).alias("sz"),
                         F.explode(F.array_except("w", neg)).alias("k"))
    # A contradiction needs EXACTLY ONE negated side — so block the join
    # asymmetrically: negated docs × non-negated docs. Candidates scale
    # with Σ_w f_neg(w)·f_plain(w), which collapses when negation is
    # rare (the common case), instead of Σ_w f(w)² over all pairs.
    a = ex.filter(F.col("has_neg")).select(
        F.col("_id").alias("na"), F.col("sz").alias("sz_na"), "k")
    b = ex.filter(~F.col("has_neg")).select(
        F.col("_id").alias("nb"), F.col("sz").alias("sz_nb"), "k")
    common = (
        a.join(b, "k")
        .groupBy("na", "nb", "sz_na", "sz_nb")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    jac = F.col("common") / (F.col("sz_na") + F.col("sz_nb") - F.col("common"))
    out = (
        common.withColumn("topic_score", F.round(jac, 6))
        .filter(F.col("topic_score") >= topic_overlap)
        .select(F.least("na", "nb").alias("a"),
                F.greatest("na", "nb").alias("b"), "topic_score")
    )
    from memory_engine_spark.operators.dedup import _materialize_release
    return _materialize_release(out, prepared)


def rolling_zscore_anomalies(events: DataFrame, key_col: str, ts_col: str,
                             value_col: str, window_rows: int = 20,
                             z_threshold: float = 3.0,
                             id_col: str | None = None) -> DataFrame:
    """Per-key rolling z-score anomaly detection: each value is scored
    against the mean/σ of its TRAILING ``window_rows`` observations
    (itself included) — the streaming-monitor shape of the reference's
    global IQR outliers (insight_discovery.py:1427-1497), localized in
    time so level shifts don't mask spikes. Returns flagged rows
    (key, ts, value, mean_w, std_w, z) where |z| > ``z_threshold``
    and the window holds ≥ half its capacity (cold-start guard).

    Portability note: built-in windowed avg/stddev accumulate floats
    in an engine-private order (sliding add/remove vs segment trees),
    which flaps cross-engine hashes. Here the window computes EXACT
    decimal Σx and Σx² of the 6-dp-rounded values; mean and the
    sample-σ formula sqrt((Σx² − (Σx)²/n)/(n−1)) then run as scalar
    double ops on those exact sums — identical on any engine, at any
    partitioning. One shuffle (the per-key sort)."""
    from pyspark.sql import Window as W

    order = [F.col(ts_col).asc()] + ([F.col(id_col).asc()] if id_col else [])
    w = (W.partitionBy(key_col).orderBy(*order)
         .rowsBetween(-(window_rows - 1), W.currentRow))
    v = F.round(F.col(value_col), 6).cast("decimal(18,6)")
    s1 = F.sum(v).over(w).cast("double")
    s2 = F.sum((v * v).cast("decimal(38,12)")).over(w).cast("double")
    n = F.count(v).over(w).cast("double")
    mean = s1 / n
    var = (s2 - s1 * s1 / n) / (n - 1)
    std = F.sqrt(F.greatest(var, F.lit(0.0)))  # clamp -0.0 rounding
    z = (F.col(value_col) - mean) / std
    return (events.select(key_col, ts_col, value_col,
                          F.round(mean, 6).alias("mean_w"),
                          F.round(std, 6).alias("std_w"),
                          F.round(z, 4).alias("z"),
                          n.alias("_n"))
            .filter((F.col("_n") >= window_rows / 2)
                    & (F.col("std_w") > 0)
                    & (F.abs(F.col("z")) > z_threshold))
            .drop("_n"))
