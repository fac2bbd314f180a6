"""Contradiction resolution engine: severity, status, strategies.

Reference: /root/reference/memory_core/quality/contradiction_resolution.py
— strategy/severity/status enums (:23-53), severity assessment
(:283-309: type base score + 0.2·confidence + capped content-importance,
mapped to critical/high/medium/low), strategy implementations
(:342-660): source authority (>0.7 gate), consensus voting (>0.6
strength), temporal preference (most recent, fixed 0.7 confidence),
confidence weighting (>0.7 gate), evidence based (clear winner), hybrid
(authority 0.4 / temporal 0.3 / confidence 0.3 weighted node scores).

Spark-first: the reference resolves case-by-case in Python; here a whole
DataFrame of contradiction pairs (each row = one case with its per-side
attribute columns) is resolved in ONE pass of Column expressions — no
driver loop, no UDF. Deterministic tie-break: side ``a`` wins equal
scores.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RESOLUTION_STRATEGIES = [
    "source_authority", "consensus_voting", "temporal_preference",
    "confidence_weighted", "expert_review", "evidence_based",
    "hybrid_approach",
]
SEVERITY_LEVELS = ["critical", "high", "medium", "low"]
RESOLUTION_STATUSES = ["resolved", "partially_resolved", "unresolved",
                       "requires_review", "deferred"]

# contradiction_resolution.py:290 type base scores
_TYPE_SEVERITY = {"factual": 0.8, "numerical": 0.7, "temporal": 0.5,
                  "qualitative": 0.4}

# contradiction_resolution.py:639-646 hybrid weights
_HYBRID_WEIGHTS = {"source_authority": 0.4, "temporal_preference": 0.3,
                   "confidence_weighted": 0.3}


def severity_score(type_col, confidence_col, content_len_col):
    """contradiction_resolution.py:283-300: type base + 0.2·confidence +
    min(content_len/1000·0.1, 0.2)."""
    base = F.lit(0.5)
    for t, s in _TYPE_SEVERITY.items():
        base = F.when(type_col == t, F.lit(s)).otherwise(base)
    return (base + confidence_col * 0.2
            + F.least(content_len_col / 1000.0 * 0.1, F.lit(0.2)))


def severity_level(score_col):
    """:301-309 thresholds."""
    return (F.when(score_col >= 0.8, "critical")
            .when(score_col >= 0.6, "high")
            .when(score_col >= 0.4, "medium")
            .otherwise("low"))


def _gated_preference(pairs: DataFrame, va, vb, gate: float,
                      id_a: str, id_b: str, strategy: str,
                      keep: tuple[str, ...] = ()):
    """Shared shape of source_authority / confidence_weighted (:385-421,
    :488-521): prefer the side with the larger attribute when it clears
    the gate, else flag for review. Tie → side a (reference max() returns
    the first maximal item)."""
    win = F.greatest(va, vb)
    resolved = win > gate
    return pairs.select(
        id_a, id_b,
        F.lit(strategy).alias("strategy_used"),
        F.when(resolved, "resolved").otherwise("requires_review").alias("status"),
        F.when(resolved & (va >= vb), F.col(id_a))
        .when(resolved, F.col(id_b)).alias("preferred"),
        F.when(resolved, win).otherwise(F.lit(0.0)).alias("resolution_confidence"),
        *keep,
    )


def resolve_contradictions(pairs: DataFrame, strategy: str = "hybrid_approach",
                           id_a: str = "a", id_b: str = "b",
                           keep: tuple[str, ...] = ()) -> DataFrame:
    """Resolve a DataFrame of contradiction cases.

    Expected per-side attribute columns (only those the chosen strategy
    reads): authority_a/b, ts_a/b (timestamp-comparable), confidence_a/b,
    support_a/b (corroborating-node counts), evidence_a/b (evidence
    scores). Returns (id_a, id_b, strategy_used, status, preferred,
    resolution_confidence, *keep) — one row per case, resolved in one
    distributed pass; ``keep`` names pass through untouched (e.g. a
    precomputed severity column).
    """
    c = F.col
    if strategy == "source_authority":
        return _gated_preference(pairs, c("authority_a"), c("authority_b"),
                                 0.7, id_a, id_b, strategy, keep)
    if strategy == "confidence_weighted":
        return _gated_preference(pairs, c("confidence_a"), c("confidence_b"),
                                 0.7, id_a, id_b, strategy, keep)
    if strategy == "temporal_preference":
        # :452-486 — most recent wins with fixed 0.7 confidence; no
        # timestamps at all → review. Null ts loses to any non-null.
        any_ts = c("ts_a").isNotNull() | c("ts_b").isNotNull()
        a_wins = c("ts_b").isNull() | (c("ts_a").isNotNull()
                                       & (c("ts_a") >= c("ts_b")))
        return pairs.select(
            id_a, id_b, F.lit(strategy).alias("strategy_used"),
            F.when(any_ts, "resolved").otherwise("requires_review").alias("status"),
            F.when(any_ts & a_wins, c(id_a)).when(any_ts, c(id_b)).alias("preferred"),
            F.when(any_ts, F.lit(0.7)).otherwise(F.lit(0.0))
            .alias("resolution_confidence"),
            *keep,
        )
    if strategy == "consensus_voting":
        # :423-450 — majority share of corroborating nodes > 0.6.
        total = c("support_a") + c("support_b")
        strength = F.when(total > 0, F.greatest(c("support_a"), c("support_b"))
                          / total).otherwise(F.lit(0.0))
        resolved = strength > 0.6
        return pairs.select(
            id_a, id_b, F.lit(strategy).alias("strategy_used"),
            F.when(resolved, "resolved").otherwise("requires_review").alias("status"),
            F.when(resolved & (c("support_a") >= c("support_b")), c(id_a))
            .when(resolved, c(id_b)).alias("preferred"),
            F.when(resolved, strength).otherwise(F.lit(0.0))
            .alias("resolution_confidence"),
            *keep,
        )
    if strategy == "evidence_based":
        # :523-553 — clear winner on evidence scores (strict inequality),
        # confidence = winner's share.
        total = c("evidence_a") + c("evidence_b")
        clear = (c("evidence_a") != c("evidence_b")) & (total > 0)
        share = F.greatest(c("evidence_a"), c("evidence_b")) / total
        return pairs.select(
            id_a, id_b, F.lit(strategy).alias("strategy_used"),
            F.when(clear, "resolved").otherwise("requires_review").alias("status"),
            F.when(clear & (c("evidence_a") > c("evidence_b")), c(id_a))
            .when(clear, c(id_b)).alias("preferred"),
            F.when(clear, share).otherwise(F.lit(0.0))
            .alias("resolution_confidence"),
            *keep,
        )
    if strategy == "expert_review":
        # :364-378 fallthrough — always flag.
        return pairs.select(
            id_a, id_b, F.lit(strategy).alias("strategy_used"),
            F.lit("requires_review").alias("status"),
            F.lit(None).cast("string").alias("preferred"),
            F.lit(0.0).alias("resolution_confidence"),
            *keep,
        )
    if strategy == "hybrid_approach":
        # :619-637 — weighted node scores across the three sub-strategies.
        wa, wt, wc = (_HYBRID_WEIGHTS["source_authority"],
                      _HYBRID_WEIGHTS["temporal_preference"],
                      _HYBRID_WEIGHTS["confidence_weighted"])
        auth_res = F.greatest(c("authority_a"), c("authority_b")) > 0.7
        auth_win_a = auth_res & (c("authority_a") >= c("authority_b"))
        conf_res = F.greatest(c("confidence_a"), c("confidence_b")) > 0.7
        conf_win_a = conf_res & (c("confidence_a") >= c("confidence_b"))
        ts_res = c("ts_a").isNotNull() | c("ts_b").isNotNull()
        ts_win_a = ts_res & (c("ts_b").isNull() | (c("ts_a").isNotNull()
                                                   & (c("ts_a") >= c("ts_b"))))

        def side_score(win_a_flip: bool):
            def pick(res, win_a, conf):
                won = win_a if not win_a_flip else res & ~win_a
                return F.when(res & won, conf).otherwise(F.lit(0.0))
            return (
                pick(auth_res, auth_win_a,
                     F.greatest(c("authority_a"), c("authority_b")) * wa)
                + pick(ts_res, ts_win_a, F.lit(0.7) * wt)
                + pick(conf_res, conf_win_a,
                       F.greatest(c("confidence_a"), c("confidence_b")) * wc)
            )

        score_a, score_b = side_score(False), side_score(True)
        any_res = auth_res | ts_res | conf_res
        return pairs.select(
            id_a, id_b, F.lit(strategy).alias("strategy_used"),
            F.when(any_res, "resolved").otherwise("requires_review").alias("status"),
            F.when(any_res & (score_a >= score_b), c(id_a))
            .when(any_res, c(id_b)).alias("preferred"),
            F.when(any_res, F.least(F.greatest(score_a, score_b), F.lit(1.0)))
            .otherwise(F.lit(0.0)).alias("resolution_confidence"),
            *keep,
        )
    raise ValueError(f"unknown strategy {strategy!r} "
                     f"(have {RESOLUTION_STRATEGIES})")
