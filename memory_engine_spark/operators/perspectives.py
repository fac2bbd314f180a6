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


# -- comprehensive report (perspective_analysis.py:96-110,1440-1530) ---------

# Verbatim from _are_perspectives_opposing (:1243-1254).
OPPOSING_KEYWORD_PAIRS = [
    ("positive", "negative"), ("good", "bad"),
    ("effective", "ineffective"), ("beneficial", "harmful"),
    ("increase", "decrease"), ("support", "oppose"),
    ("agree", "disagree"), ("should", "should not"), ("yes", "no"),
]


def perspective_report(df: DataFrame, topic_col: str, text_col: str,
                       id_col: str) -> DataFrame:
    """Per-topic PerspectiveAnalysisReport fields
    (perspective_analysis.py:96-110 dataclass; r05 VERDICT item 5: the
    evidence summaries + agreement matrix the 6-type/consensus port
    didn't carry).

    Reference semantics, made deterministic and order-independent:

    - One perspective per (topic, indicator type) present; docs with no
      indicator join no perspective (:257-296 extracts only around
      indicators). The perspective's viewpoint representative = the
      text of its smallest doc id (the reference keeps the first
      encountered viewpoint; arrival order isn't distributed-stable,
      min-id is).
    - confidence_score (:896-915): min(n/5,1)·0.6 + relevance·0.4
      capped at 0.95, relevance = the reference's 0.5 default (no
      relevance_score in the corpus schema).
    - evidence_quality (:917-947): mean over docs of
      length_score·0.3 + 0.5·0.4 (+ 0 for the absent metadata /
      relationship components), length_score = min(len/500, 1) below
      2000 chars else 0.8.
    - agreement matrix (:1083-1128): pairwise 0.5·word-set-Jaccard of
      the representatives − 0.2 cross-type penalty, floored at 0
      (claims/evidence components drop out — no such columns here);
      emitted both as summary stats and as the
      "a|b|sim_micro" ;-joined sorted string.
    - disagreement areas (:1240-1271): pairs opposing by the 9 keyword
      pairs or an 'opposing'-typed member.
    - consensus level (:1299-1309 thresholds) on the matrix average;
      single-perspective topics are strong_consensus (:1284-1285).
    - analysis_confidence (:1343-1364): min(n/5,1)·0.4 + avg
      perspective confidence·0.4 + type-diversity·0.2, capped 0.95.

    All float aggregates are BIGINT-micro-quantized before summing
    (order-independent across partitions — the r05 q86 lesson).
    """
    from pyspark.sql.window import Window

    topic = F.col(topic_col)
    docs = (df.select(topic.alias("topic"),
                      F.col(id_col).alias("_id"),
                      F.col(text_col).alias("_txt"))
            .withColumn("ptype", classify_perspective(F.col("_txt")))
            .filter(F.col("ptype") != "none"))
    ln = F.length("_txt")
    length_score = F.when(ln < 2000, F.least(ln / F.lit(500.0), F.lit(1.0))) \
        .otherwise(F.lit(0.8))
    qual_micro = F.floor((length_score * 0.3 + 0.2) * 1e6 + 0.5).cast("long")

    persp = (docs.withColumn("_qm", qual_micro)
             .groupBy("topic", "ptype")
             .agg(F.count(F.lit(1)).alias("n_docs"),
                  F.sum("_qm").alias("_sum_qm"),
                  F.min_by("_txt", "_id").alias("_rep")))
    conf_micro = F.least(
        F.floor((F.least(F.col("n_docs") / F.lit(5.0), F.lit(1.0)) * 0.6
                 + 0.2) * 1e6 + 0.5).cast("long"),
        F.lit(950000).cast("long"))
    eq_micro = F.floor(F.col("_sum_qm").cast("double") / F.col("n_docs")
                       + 0.5).cast("long")
    persp = persp.select("topic", "ptype", "n_docs",
                         conf_micro.alias("conf_micro"),
                         eq_micro.alias("eq_micro"), "_rep")

    a = persp.select(*[F.col(c).alias(c + "_a") for c in persp.columns])
    b = persp.select(*[F.col(c).alias(c + "_b") for c in persp.columns])
    pairs = a.join(b, (F.col("topic_a") == F.col("topic_b"))
                   & (F.col("ptype_a") < F.col("ptype_b")))
    jacc = _word_set_jaccard(F.col("_rep_a"), F.col("_rep_b"))
    sim_micro = F.floor(F.greatest(jacc * 0.5 - 0.2, F.lit(0.0)) * 1e6
                        + 0.5).cast("long")
    la, lb = F.lower("_rep_a"), F.lower("_rep_b")
    opposing = (F.col("ptype_a") == "opposing") | (F.col("ptype_b") == "opposing")
    for pos, neg in OPPOSING_KEYWORD_PAIRS:
        opposing = opposing | \
            (F.contains(la, F.lit(pos)) & F.contains(lb, F.lit(neg))) | \
            (F.contains(la, F.lit(neg)) & F.contains(lb, F.lit(pos)))
    pairs = pairs.select(
        F.col("topic_a").alias("topic"), "ptype_a", "ptype_b",
        sim_micro.alias("sim_micro"), opposing.cast("int").alias("opp"))

    pair_agg = pairs.groupBy("topic").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum("sim_micro").alias("_sum_sim"),
        F.sum("opp").alias("n_opposing_pairs"),
        F.array_join(F.array_sort(F.collect_list(
            F.concat_ws("|", "ptype_a", "ptype_b", "sim_micro"))), ";")
        .alias("matrix"))

    w = Window.partitionBy("topic").orderBy(F.col("n_docs").desc(),
                                            F.col("ptype").asc())
    dom = (persp.withColumn("_rk", F.row_number().over(w)).filter("_rk = 1")
           .select("topic", F.col("ptype").alias("dominant_type")))
    type_cols = [
        F.sum(F.when(F.col("ptype") == pt, F.col("n_docs")).otherwise(0))
        .cast("bigint").alias(f"n_{pt}")
        for pt in ("opposing", "complementary", "alternative",
                   "stakeholder", "methodological")]
    topic_agg = persp.groupBy("topic").agg(
        F.count(F.lit(1)).alias("n_perspectives"),
        *type_cols,
        F.floor(F.sum("conf_micro").cast("double")
                / F.count(F.lit(1)) + 0.5).alias("_avg_conf_micro"),
        F.floor(F.sum("eq_micro").cast("double")
                / F.count(F.lit(1)) + 0.5).alias("_avg_eq_micro"))

    out = (topic_agg.join(dom, "topic").join(pair_agg, "topic", "left"))
    avg_sim_micro = F.when(
        F.col("n_pairs").isNull(), F.lit(1000000).cast("long")).otherwise(
        F.floor(F.col("_sum_sim").cast("double") / F.col("n_pairs") + 0.5)
        .cast("long"))
    level = (F.when(F.col("n_perspectives") < 2, "strong_consensus")
             .when(avg_sim_micro >= 800000, "strong_consensus")
             .when(avg_sim_micro >= 600000, "moderate_consensus")
             .when(avg_sim_micro >= 400000, "weak_consensus")
             .when(avg_sim_micro >= 200000, "no_consensus")
             .otherwise("strong_disagreement"))
    count_conf = F.least(F.col("n_perspectives") / F.lit(5.0), F.lit(1.0))
    type_div = F.col("n_perspectives") / F.lit(6.0)
    ac = F.least(count_conf * 0.4
                 + (F.col("_avg_conf_micro") / F.lit(1e6)) * 0.4
                 + type_div * 0.2, F.lit(0.95))
    return out.select(
        "topic",
        F.col("n_perspectives").cast("bigint").alias("n_perspectives"),
        "dominant_type", "n_opposing", "n_complementary", "n_alternative",
        "n_stakeholder", "n_methodological",
        (F.col("_avg_conf_micro").cast("double") / 1e6).alias("avg_confidence"),
        (F.col("_avg_eq_micro").cast("double") / 1e6)
        .alias("avg_evidence_quality"),
        F.coalesce(F.col("n_pairs"), F.lit(0)).cast("bigint").alias("n_pairs"),
        (avg_sim_micro.cast("double") / 1e6).alias("avg_similarity"),
        F.coalesce(F.col("n_opposing_pairs"), F.lit(0)).cast("bigint")
        .alias("n_opposing_pairs"),
        level.alias("consensus_level"),
        (F.floor(ac * 1e6 + 0.5).cast("double") / 1e6)
        .alias("analysis_confidence"),
        F.coalesce(F.col("matrix"), F.lit("")).alias("matrix"))
