"""Contradiction-resolution engine: severity mapping + all 7 strategies
(reference contradiction_resolution.py:23-53,283-309,342-660)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from memory_engine_spark.operators import resolution


@pytest.fixture(scope="module")
def cases(spark):
    # (a, b, authority_a/b, ts_a/b, confidence_a/b, support_a/b,
    #  evidence_a/b)
    return spark.createDataFrame(
        [
            ("n1", "n2", 0.9, 0.3, "2024-02-01", "2024-01-01", 0.9, 0.2, 8, 2, 3.0, 1.0),
            ("n3", "n4", 0.5, 0.6, None, "2024-03-01", 0.4, 0.5, 1, 1, 2.0, 2.0),
            ("n5", "n6", 0.2, 0.1, None, None, 0.3, 0.2, 0, 0, 0.0, 0.0),
        ],
        "a string, b string, authority_a double, authority_b double, "
        "ts_a string, ts_b string, confidence_a double, confidence_b double, "
        "support_a int, support_b int, evidence_a double, evidence_b double")


def _by_pair(df):
    return {(r["a"], r["b"]): r.asDict() for r in df.collect()}


def test_severity_score_and_levels(spark):
    df = spark.createDataFrame(
        [("factual", 0.9, 2000), ("numerical", 0.5, 100),
         ("temporal", 0.5, 100), ("qualitative", 0.0, 0),
         ("unknown", 0.0, 0)],
        "ctype string, conf double, clen int")
    out = df.select(
        "ctype",
        resolution.severity_score(F.col("ctype"), F.col("conf"),
                                  F.col("clen")).alias("score"),
    ).withColumn("level", resolution.severity_level(F.col("score"))).collect()
    got = {r["ctype"]: (round(r["score"], 6), r["level"]) for r in out}
    assert got["factual"] == (pytest.approx(0.8 + 0.18 + 0.2), "critical")
    assert got["numerical"] == (pytest.approx(0.7 + 0.1 + 0.01), "critical")
    assert got["temporal"] == (pytest.approx(0.5 + 0.1 + 0.01), "high")
    assert got["qualitative"][1] == "medium"        # 0.4 exactly
    assert got["unknown"][0] == 0.5                 # default base


def test_source_authority(cases):
    out = _by_pair(resolution.resolve_contradictions(cases, "source_authority"))
    assert out[("n1", "n2")]["status"] == "resolved"
    assert out[("n1", "n2")]["preferred"] == "n1"
    assert out[("n1", "n2")]["resolution_confidence"] == 0.9
    assert out[("n3", "n4")]["status"] == "requires_review"  # 0.6 < gate
    assert out[("n3", "n4")]["preferred"] is None


def test_confidence_weighted(cases):
    out = _by_pair(resolution.resolve_contradictions(cases, "confidence_weighted"))
    assert out[("n1", "n2")]["preferred"] == "n1"
    assert out[("n5", "n6")]["status"] == "requires_review"


def test_temporal_preference(cases):
    out = _by_pair(resolution.resolve_contradictions(cases, "temporal_preference"))
    assert out[("n1", "n2")]["preferred"] == "n1"          # more recent
    assert out[("n1", "n2")]["resolution_confidence"] == 0.7
    assert out[("n3", "n4")]["preferred"] == "n4"          # only b has ts
    assert out[("n5", "n6")]["status"] == "requires_review"  # no ts at all


def test_consensus_voting(cases):
    out = _by_pair(resolution.resolve_contradictions(cases, "consensus_voting"))
    assert out[("n1", "n2")]["status"] == "resolved"       # 8/10 > 0.6
    assert out[("n1", "n2")]["preferred"] == "n1"
    assert abs(out[("n1", "n2")]["resolution_confidence"] - 0.8) < 1e-9
    assert out[("n3", "n4")]["status"] == "requires_review"  # 0.5 split
    assert out[("n5", "n6")]["status"] == "requires_review"  # no support


def test_evidence_based(cases):
    out = _by_pair(resolution.resolve_contradictions(cases, "evidence_based"))
    assert out[("n1", "n2")]["preferred"] == "n1"          # 3 vs 1
    assert abs(out[("n1", "n2")]["resolution_confidence"] - 0.75) < 1e-9
    assert out[("n3", "n4")]["status"] == "requires_review"  # tied


def test_expert_review_and_unknown(cases):
    out = _by_pair(resolution.resolve_contradictions(cases, "expert_review"))
    assert all(v["status"] == "requires_review" for v in out.values())
    with pytest.raises(ValueError):
        resolution.resolve_contradictions(cases, "majority_rules")


def test_hybrid_combines_weighted_scores(cases):
    out = _by_pair(resolution.resolve_contradictions(cases, "hybrid_approach"))
    r = out[("n1", "n2")]
    # n1 wins all three: 0.9*0.4 + 0.7*0.3 + 0.9*0.3 = 0.84
    assert r["status"] == "resolved" and r["preferred"] == "n1"
    assert abs(r["resolution_confidence"] - 0.84) < 1e-9
    # n3/n4: only temporal resolves (authority/confidence under gate)
    r2 = out[("n3", "n4")]
    assert r2["preferred"] == "n4"
    assert abs(r2["resolution_confidence"] - 0.21) < 1e-9  # 0.7*0.3
    # n5/n6: nothing resolves
    assert out[("n5", "n6")]["status"] == "requires_review"


def test_keep_passthrough(cases):
    sev = cases.withColumn("severity", F.lit("high"))
    out = resolution.resolve_contradictions(sev, "source_authority",
                                            keep=("severity",))
    assert out.columns[-1] == "severity"
    assert all(r["severity"] == "high" for r in out.collect())
