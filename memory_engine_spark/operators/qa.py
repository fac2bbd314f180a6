"""Question-answering pipeline, decomposed Spark-first.

Reference: /root/reference/memory_core/synthesis/question_answering.py —
8 question types with regex type-detection (:23-34, 178-186), entity/
keyword extraction (:188-245), relevant-subgraph identification =
entity-neighborhood + keyword space with overlap-merge (:310-471),
evidence gathering + relevance scoring (:539-608), type-specific answer
synthesis (:610-746), confidence (:820-841), sources (:843-860).

Spark decomposition (SURVEY.md §2.11): keyword/entity match is a filter
+ relevance expression; neighborhood expansion is the k-hop join;
overlap-merge is connected components; evidence scoring is the ranking
expression; answer synthesis is driver-side template assembly over the
already-small evidence set (the only collect, bounded by top_k).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from memory_engine_spark.operators import graph
from memory_engine_spark.operators.ranking import relevance_score
from memory_engine_spark.operators.text import STOPWORDS

# question_answering.py:23-34
QUESTION_TYPES = ["factual", "relational", "aggregation", "temporal",
                  "causal", "comparative", "hypothetical", "exploratory"]

_TYPE_PATTERNS = [  # regex type-detect (question_answering.py:178-186)
    ("relational", r"\b(related|relationship|connect|between|links?)\b"),
    ("aggregation", r"\b(how many|count|number of|total|average|sum)\b"),
    ("temporal", r"\b(when|before|after|during|recent|latest|history)\b"),
    ("causal", r"\b(why|cause[sd]?|because|leads? to|results? in)\b"),
    ("comparative", r"\b(compare|versus|vs|difference|better|worse)\b"),
    ("hypothetical", r"\b(what if|would|could|suppose|imagine)\b"),
    ("exploratory", r"\b(tell me about|describe|explain|overview)\b"),
]


@dataclass
class ParsedQuestion:
    text: str
    qtype: str
    keywords: list[str] = field(default_factory=list)


def parse_question(question: str) -> ParsedQuestion:
    """Regex classification + keyword extraction
    (question_answering.py:178-245). Driver-side: O(1) work."""
    low = question.lower()
    qtype = "factual"
    for name, pat in _TYPE_PATTERNS:
        if re.search(pat, low):
            qtype = name
            break
    words = re.findall(r"[a-z0-9]+", low)
    keywords = [w for w in words if w not in STOPWORDS and len(w) >= 3]
    return ParsedQuestion(question, qtype, keywords)


def relevant_nodes(nodes: DataFrame, parsed: ParsedQuestion,
                   text_col: str = "content", id_col: str = "node_id",
                   top_k: int = 20) -> DataFrame:
    """Keyword-space identification (question_answering.py:310-471):
    score every node by word-Jaccard relevance to the question, keep
    top-k with score > 0 — one scan + TakeOrderedAndProject."""
    scored = nodes.withColumn(
        "relevance",
        F.round(relevance_score(F.col(text_col), " ".join(parsed.keywords)), 6))
    return (scored.filter(F.col("relevance") > 0)
            .orderBy(F.col("relevance").desc(), F.col(id_col).asc())
            .limit(top_k))


def expand_evidence(seeds: DataFrame, edges: DataFrame, nodes: DataFrame,
                    hops: int = 1, id_col: str = "node_id") -> DataFrame:
    """Entity-neighborhood expansion (question_answering.py:310-400):
    k-hop around the seed nodes, joined back to node content; seeds keep
    their relevance, expansion nodes get hop-decayed scores (0.5/hop)."""
    reach = graph.k_hop(edges, seeds.select(id_col), hops)
    ev = reach.join(nodes, id_col)
    seed_rel = seeds.select(id_col, F.col("relevance").alias("seed_rel"))
    return (ev.join(seed_rel, id_col, "left")
            .withColumn("evidence_score",
                        F.round(F.coalesce(
                            F.col("seed_rel"),
                            F.lit(0.0)) + F.pow(F.lit(0.5), F.col("hop_distance")) - 0.5, 6))
            .drop("seed_rel"))


def answer(question: str, nodes: DataFrame, edges: DataFrame,
           text_col: str = "content", id_col: str = "node_id",
           source_col: str | None = "source", top_k: int = 20,
           hops: int = 1) -> dict:
    """End-to-end QA (question_answering.py pipeline): parse → identify
    → expand → score → synthesize. Deterministic template synthesis —
    the LLM seam of the reference is the ``synthesize`` step and can be
    swapped without touching the distributed part."""
    parsed = parse_question(question)
    seeds = relevant_nodes(nodes, parsed, text_col, id_col, top_k)
    evidence = expand_evidence(seeds, edges, nodes, hops, id_col)
    rows = (evidence.orderBy(F.col("evidence_score").desc(), F.col(id_col).asc())
            .limit(top_k).collect())
    if not rows:
        return {"question": question, "type": parsed.qtype, "answer": None,
                "confidence": 0.0, "sources": [], "evidence": []}
    # confidence = mean evidence score of the used rows (qa.py:820-841)
    conf = round(sum(r["evidence_score"] for r in rows) / len(rows), 6)
    sources = sorted({r[source_col] for r in rows
                      if source_col and r[source_col] is not None})
    best = rows[0]
    synthesized = {
        "factual": f"Most relevant: {best[text_col]}",
        "aggregation": f"{len(rows)} matching items found.",
    }.get(parsed.qtype, f"Top evidence: {best[text_col]}")
    return {
        "question": question, "type": parsed.qtype, "answer": synthesized,
        "confidence": conf, "sources": sources,
        "evidence": [{"id": r[id_col], "score": r["evidence_score"]} for r in rows],
    }
