"""Perspective analysis: group nodes into viewpoints, measure consensus.

Reference: /root/reference/memory_core/synthesis/perspective_analysis.py
(2102 LoC) — 6 perspective types (:22-42), viewpoint grouping, consensus
levels: strong >80%, moderate 60–80%, weak 40–60%, conflict <40%.

Spark decomposition (SURVEY.md §2.11): viewpoints = connected components
of the content-similarity graph; each viewpoint's stance profile =
per-group aggregates; consensus = share of members agreeing with the
group-dominant stance. Deterministic: similarity via word-Jaccard pairs,
stance via a caller-provided column (e.g. rating_truthfulness ≥ 0.5,
or a sentiment/position label).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from memory_engine_spark.operators.components import connected_components
from memory_engine_spark.operators.dedup import ngram_jaccard_pairs

CONSENSUS_LEVELS = [(0.8, "strong"), (0.6, "moderate"), (0.4, "weak")]


def consensus_level(ratio):
    out = F.lit("conflict")
    for threshold, name in reversed(CONSENSUS_LEVELS):
        out = F.when(ratio > threshold, name).otherwise(out)
    return out


# -- 6-type classification (perspective_analysis.py:22-29,116-172) -----------

PERSPECTIVE_TYPES = ["opposing", "complementary", "alternative", "temporal",
                     "stakeholder", "methodological"]

# Indicator keyword lists, verbatim from the reference's
# perspective_indicators dict (:121-172); checked in that order.
PERSPECTIVE_INDICATORS: dict[str, list[str]] = {
    "opposing": ["however", "but", "on the contrary", "conversely",
                 "disagreed", "opposed", "contradicts", "refutes",
                 "challenges", "disputes"],
    "complementary": ["additionally", "furthermore", "moreover", "also",
                      "supports", "confirms", "validates", "complements",
                      "builds upon"],
    "alternative": ["alternatively", "another approach", "different method",
                    "another way", "instead", "rather than"],
    "stakeholder": ["experts believe", "users think", "researchers suggest",
                    "practitioners argue", "stakeholders view",
                    "community feels"],
    "methodological": ["methodology", "approach", "technique", "method",
                       "framework", "model", "strategy", "paradigm"],
}


def classify_perspective(text_col, ts_col=None):
    """Column expr: the FIRST perspective type (reference indicator-dict
    order) whose indicator keyword occurs in the text; 'temporal' when
    nothing matches but a timestamp rides along (the reference extracts
    temporal perspectives from time distribution, :603-662); else
    'none'."""
    low = F.lower(text_col)
    out = F.lit("temporal") if ts_col is not None else F.lit("none")
    if ts_col is not None:
        out = F.when(ts_col.isNull(), F.lit("none")).otherwise(out)
    for ptype in reversed([t for t in PERSPECTIVE_TYPES if t != "temporal"]):
        hit = F.lit(False)
        for kw in PERSPECTIVE_INDICATORS[ptype]:
            hit = hit | F.contains(low, F.lit(kw))
        out = F.when(hit, F.lit(ptype)).otherwise(out)
    return out


# -- perspective comparison (perspective_analysis.py:1083-1143,1280-1309) ----

def _word_set_jaccard(a, b):
    """perspective_analysis.py:_calculate_text_similarity — Jaccard of
    whitespace-split lowercase word SETS (not the alnum tokenizer)."""
    wa = F.array_distinct(F.filter(F.split(F.lower(a), r"\s+"),
                                   lambda x: x != ""))
    wb = F.array_distinct(F.filter(F.split(F.lower(b), r"\s+"),
                                   lambda x: x != ""))
    union = F.size(F.array_union(wa, wb))
    return F.when(union <= 0, F.lit(0.0)).otherwise(
        F.size(F.array_intersect(wa, wb)) / union)


def perspective_similarity_pairs(df: DataFrame, topic_col: str,
                                 text_col: str, id_col: str,
                                 type_col: str | None = None,
                                 claims_col: str | None = None,
                                 evidence_col: str | None = None) -> DataFrame:
    """Pairwise perspective similarity within each topic
    (perspective_analysis.py:1102-1143): 0.5·viewpoint Jaccard +
    0.3·claims Jaccard + 0.2·evidence overlap − 0.2 type-mismatch
    penalty, floored at 0. Self-join is blocked on the topic — never a
    cross join. ``evidence_col`` is a comma-separated id list.
    Returns (topic, a, b, similarity)."""
    cols = [F.col(topic_col).alias("_topic"), F.col(id_col).alias("_id"),
            F.col(text_col).alias("_txt")]
    if type_col:
        cols.append(F.col(type_col).alias("_pt"))
    if claims_col:
        cols.append(F.col(claims_col).alias("_cl"))
    if evidence_col:
        cols.append(F.split(F.col(evidence_col), ",").alias("_ev"))
    base = df.select(*cols)
    l = base.select(*[F.col(c).alias(c + "_a") for c in base.columns])
    r = base.select(*[F.col(c).alias(c + "_b") for c in base.columns])
    joined = l.join(r, (F.col("_topic_a") == F.col("_topic_b"))
                    & (F.col("_id_a") < F.col("_id_b")))
    sim = _word_set_jaccard(F.col("_txt_a"), F.col("_txt_b")) * 0.5
    if claims_col:
        sim = sim + _word_set_jaccard(F.col("_cl_a"), F.col("_cl_b")) * 0.3
    if evidence_col:
        mx = F.greatest(F.size("_ev_a"), F.size("_ev_b"))
        sim = sim + F.when(mx <= 0, F.lit(0.0)).otherwise(
            F.size(F.array_intersect("_ev_a", "_ev_b")) / mx) * 0.2
    if type_col:
        sim = sim - F.when(F.col("_pt_a") != F.col("_pt_b"), 0.2).otherwise(0.0)
    return joined.select(
        F.col("_topic_a").alias("topic"),
        F.col("_id_a").alias("a"), F.col("_id_b").alias("b"),
        F.greatest(sim, F.lit(0.0)).alias("similarity"))


def consensus_level_named(avg_similarity):
    """perspective_analysis.py:1299-1309 thresholds over the average
    pairwise similarity."""
    return (F.when(avg_similarity >= 0.8, "strong_consensus")
            .when(avg_similarity >= 0.6, "moderate_consensus")
            .when(avg_similarity >= 0.4, "weak_consensus")
            .when(avg_similarity >= 0.2, "no_consensus")
            .otherwise("strong_disagreement"))


def compare_perspectives(df: DataFrame, topic_col: str, text_col: str,
                         id_col: str, type_col: str | None = None,
                         claims_col: str | None = None,
                         evidence_col: str | None = None) -> DataFrame:
    """Per-topic perspective comparison (perspective_analysis.py:
    1020-1081): average pairwise similarity → named consensus level.
    Topics with a single perspective are strong_consensus (:1284-1285).
    Returns (topic, n_perspectives, avg_similarity, consensus_level)."""
    pairs = perspective_similarity_pairs(
        df, topic_col, text_col, id_col, type_col, claims_col, evidence_col)
    per_topic = df.groupBy(F.col(topic_col).alias("topic")).agg(
        F.count(F.lit(1)).alias("n_perspectives"))
    avg = pairs.groupBy("topic").agg(F.avg("similarity").alias("avg_similarity"))
    out = per_topic.join(avg, "topic", "left")
    lvl = (F.when(F.col("n_perspectives") < 2, "strong_consensus")
           .otherwise(consensus_level_named(F.col("avg_similarity"))))
    return out.select(
        "topic", "n_perspectives",
        F.round(F.coalesce("avg_similarity", F.lit(1.0)), 6).alias("avg_similarity"),
        lvl.alias("consensus_level"))


def viewpoint_groups(df: DataFrame, text_col: str, id_col: str,
                     similarity_threshold: float = 0.3,
                     ngram: int = 1) -> DataFrame:
    """Group rows into viewpoints: connected components over the
    word/shingle-Jaccard similarity graph. Returns (id, viewpoint);
    singletons get their own id as viewpoint."""
    pairs = ngram_jaccard_pairs(df, text_col, id_col, n=ngram,
                                threshold=similarity_threshold)
    edges = pairs.select(F.col("a").cast("string").alias("from_id"),
                         F.col("b").cast("string").alias("to_id"))
    comp = connected_components(edges)
    ids = df.select(F.col(id_col).cast("string").alias("node_id"))
    return (ids.join(comp, "node_id", "left")
            .select(F.col("node_id").alias(id_col),
                    F.coalesce("component", "node_id").alias("viewpoint")))


def perspective_consensus(df: DataFrame, stance_col: str, id_col: str,
                          viewpoints: DataFrame) -> DataFrame:
    """Per-viewpoint consensus (perspective_analysis.py levels): dominant
    stance share → strong/moderate/weak/conflict. One groupBy pair.
    Ties between stances break toward the smaller stance value for
    determinism."""
    from pyspark.sql.window import Window

    joined = df.select(F.col(id_col).cast("string").alias("_id"),
                       F.col(stance_col).alias("stance")) \
        .join(viewpoints.select(F.col(viewpoints.columns[0]).cast("string")
                                .alias("_id"), "viewpoint"), "_id")
    per_stance = joined.groupBy("viewpoint", "stance").agg(
        F.count(F.lit(1)).alias("n"))
    # dominant stance: max by (n desc, stance asc) — deterministic
    w = Window.partitionBy("viewpoint").orderBy(F.col("n").desc(),
                                                F.col("stance").asc())
    dom = (per_stance.withColumn("rk", F.row_number().over(w))
           .filter("rk = 1")
           .select("viewpoint", F.col("stance").alias("dominant_stance"),
                   F.col("n").alias("dominant_n")))
    out = (per_stance.groupBy("viewpoint").agg(F.sum("n").alias("n_members"))
           .join(dom, "viewpoint"))
    ratio = F.col("dominant_n") / F.col("n_members")
    return out.select(
        "viewpoint", "n_members", "dominant_stance",
        F.round(ratio, 6).alias("consensus_ratio"),
        consensus_level(ratio).alias("consensus"),
    )
