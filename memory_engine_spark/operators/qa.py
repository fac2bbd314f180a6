"""Question-answering pipeline, decomposed Spark-first.

Reference: /root/reference/memory_core/synthesis/question_answering.py —
8 question types (:23-34) with regex type-detection (:95-186), entity/
keyword extraction (:131-245), relevant-subgraph identification =
entity-neighborhood + keyword space with overlap-merge (:310-471),
evidence gathering + relevance scoring (:539-608), TYPE-SPECIFIC answer
synthesis (:610-746), sentence/step/causal extraction (:748-819),
confidence (:820-841), source attributions (:843-860).

Spark decomposition (SURVEY.md §2.11): keyword/entity match is a filter
+ relevance expression; neighborhood expansion is the k-hop join;
evidence scoring (including the per-type marker columns the
synthesizers select on) is all Column expressions; answer synthesis is
driver-side template assembly over the already-small evidence set (the
only collect, bounded by top_k) — the reference's LLM seam.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from memory_engine_spark.operators import graph
from memory_engine_spark.operators.ranking import relevance_score

# question_answering.py:23-34
QUESTION_TYPES = ["factual", "comparative", "causal", "procedural",
                  "temporal", "definitional", "relational", "analytical"]

# Type-detection patterns, first match wins, in the reference's dict
# order (question_answering.py:95-128,178-186).
_TYPE_PATTERNS = [
    ("factual", r"^what is|^who is|^where is|^when is|^which is"
                r"|tell me about|information about|details about"),
    ("comparative", r"compare|difference between|similar to|versus|vs"
                    r"|how does .* differ|how is .* different"),
    ("causal", r"why does|what causes|reason for|because of"
               r"|how does .* affect|impact of|effect of"),
    ("procedural", r"how to|steps to|process of|procedure for"
                   r"|how do i|how can i|method to"),
    ("temporal", r"when did|before|after|during|timeline"
                 r"|history of|chronology|sequence of events"),
    ("definitional", r"define|definition of|meaning of|what does .* mean"
                     r"|explain|explanation of"),
    ("relational", r"relationship between|how (?:is|are) .* related"
                   r"|connection between|associated with|linked to"
                   r"|ties between"),
    ("analytical", r"patterns in|trends in|analysis of|insights about"
                   r"|what can we learn|implications of"),
]

# question_answering.py:206-244 keyword stop list
_QA_STOPWORDS = {
    "what", "who", "where", "when", "why", "how", "is", "are", "was",
    "were", "the", "a", "an", "and", "or", "but", "in", "on", "at", "to",
    "for", "of", "with", "by", "can", "could", "would", "should", "will",
    "do", "does",
}

# Per-type content markers the synthesizers select on
# (question_answering.py:686-747).
CAUSAL_KEYWORDS = ["because", "due to", "causes", "leads to",
                   "results in", "reason"]
PROCEDURAL_KEYWORDS = ["step", "first", "then", "next", "finally",
                       "process", "method"]
_DEFINITION_RE = r"is defined as|means|refers to|is a type of"


@dataclass
class ParsedQuestion:
    text: str
    qtype: str
    keywords: list[str] = field(default_factory=list)
    entities: list[str] = field(default_factory=list)


def parse_question(question: str) -> ParsedQuestion:
    """Regex classification + entity/keyword extraction
    (question_answering.py:137-245). Driver-side: O(1) work."""
    low = question.lower()
    qtype = "factual"
    for name, pat in _TYPE_PATTERNS:
        if re.search(pat, low):
            qtype = name
            break
    words = re.findall(r"\b\w+\b", low)
    keywords = [w for w in words if w not in _QA_STOPWORDS and len(w) > 2]
    entities: list[str] = []
    for pat in (r"[A-Z][a-z]+(?:\s+[A-Z][a-z]+)*", r'"([^"]*)"', r"'([^']*)'"):
        entities.extend(m if isinstance(m, str) else m[0]
                        for m in re.findall(pat, question))
    entities = sorted({e for e in entities if len(e) > 2})
    return ParsedQuestion(question, qtype, keywords, entities)


def _contains_any(col, phrases: list[str]):
    out = F.lit(False)
    for p in phrases:
        out = out | F.contains(F.lower(col), F.lit(p))
    return out


def annotate_evidence(nodes: DataFrame, parsed: ParsedQuestion,
                      text_col: str = "content") -> DataFrame:
    """Every node scored + marker-annotated (no filter): relevance
    (word-Jaccard vs the question) and the per-type content markers the
    synthesizers select on. One projection."""
    return nodes.withColumn(
        "relevance",
        F.round(relevance_score(F.col(text_col), " ".join(parsed.keywords)), 6),
    ).withColumn(
        "has_causal", _contains_any(F.col(text_col), CAUSAL_KEYWORDS),
    ).withColumn(
        "has_procedural", _contains_any(F.col(text_col), PROCEDURAL_KEYWORDS),
    ).withColumn(
        "has_definition",
        F.col(text_col).rlike(f"(?i){_DEFINITION_RE}"),
    )


def relevant_nodes(nodes: DataFrame, parsed: ParsedQuestion,
                   text_col: str = "content", id_col: str = "node_id",
                   top_k: int = 20) -> DataFrame:
    """Keyword-space identification (question_answering.py:310-471):
    score every node by word-Jaccard relevance to the question, annotate
    the per-type marker columns the synthesizers use, keep top-k with
    score > 0 — one scan + TakeOrderedAndProject."""
    scored = annotate_evidence(nodes, parsed, text_col)
    return (scored.filter(F.col("relevance") > 0)
            .orderBy(F.col("relevance").desc(), F.col(id_col).asc())
            .limit(top_k))


def relevant_nodes_multi(nodes: DataFrame, parsed_list: list[ParsedQuestion],
                         text_col: str = "content", id_col: str = "node_id",
                         top_k: int = 20) -> DataFrame:
    """ONE-SCAN multi-question evidence retrieval (r08 verdict item
    4): N independent ``relevant_nodes`` pipelines re-scan and
    re-tokenize the corpus once per question; here the questions
    become an N-row BROADCAST dim crossed against a single corpus
    scan, so tokenization and the question-independent marker
    columns (causal/procedural/definition — identical exprs for
    every question) are computed exactly once per document.
    Returns the same shape as ``relevant_nodes`` plus a ``qtype``
    tag: per question, the top-k nodes by (relevance desc, id asc)
    with relevance > 0.

    Scale shape: the per-question top-k is TWO-PHASE — a partial
    top-k inside each scan partition (window over (qtype,
    partition_id), ≤ k·P survivors) then the exact top-k over that
    bounded set — so no single reducer ever sorts a question's full
    candidate list; with N questions a one-phase window would cap
    parallelism at N and sort everything that matched. The
    reference evaluates questions strictly one at a time
    (question_answering.py:310-471)."""
    from pyspark.sql.window import Window

    spark = nodes.sparkSession
    qtypes = [p.qtype for p in parsed_list]
    if len(set(qtypes)) != len(qtypes):
        raise ValueError(
            f"relevant_nodes_multi tags results by qtype; duplicate "
            f"types {qtypes} would merge two questions' evidence")
    dim = spark.createDataFrame(
        [(p.qtype, " ".join(p.keywords)) for p in parsed_list],
        "qtype string, _kw string")
    marked = nodes.withColumn(
        "has_causal", _contains_any(F.col(text_col), CAUSAL_KEYWORDS),
    ).withColumn(
        "has_procedural",
        _contains_any(F.col(text_col), PROCEDURAL_KEYWORDS),
    ).withColumn(
        "has_definition", F.col(text_col).rlike(f"(?i){_DEFINITION_RE}"),
    )
    scored = (marked.crossJoin(F.broadcast(dim))
              .withColumn("relevance",
                          F.round(relevance_score(F.col(text_col),
                                                  F.col("_kw")), 6))
              .filter(F.col("relevance") > 0))
    part_w = Window.partitionBy("qtype", "_pid").orderBy(
        F.col("relevance").desc(), F.col(id_col).asc())
    full_w = Window.partitionBy("qtype").orderBy(
        F.col("relevance").desc(), F.col(id_col).asc())
    return (scored
            .withColumn("_pid", F.spark_partition_id())
            .withColumn("_prk", F.row_number().over(part_w))
            .filter(F.col("_prk") <= top_k)
            .withColumn("_rk", F.row_number().over(full_w))
            .filter(F.col("_rk") <= top_k)
            .drop("_pid", "_prk", "_rk", "_kw"))


def expand_evidence(seeds: DataFrame, edges: DataFrame, nodes: DataFrame,
                    hops: int = 1, id_col: str = "node_id") -> DataFrame:
    """Entity-neighborhood expansion (question_answering.py:310-400):
    k-hop around the seed nodes, joined back to node content. When
    ``nodes`` is an ``annotate_evidence`` output (the ``answer`` path),
    every evidence row — seed or expansion — carries its own relevance
    and marker columns for the typed synthesizers; evidence_score =
    seed relevance + hop decay (0.5/hop)."""
    reach = graph.k_hop(edges, seeds.select(id_col), hops)
    ev = reach.join(nodes, id_col)
    seed_rel = seeds.select(id_col, F.col("relevance").alias("seed_rel"))
    if "relevance" in seeds.columns and "relevance" not in nodes.columns:
        ev = ev.join(seed_rel, id_col, "left") \
            .withColumn("relevance", F.col("seed_rel"))
    else:
        ev = ev.join(seed_rel.select(id_col, "seed_rel"), id_col, "left")
    return (ev.withColumn("evidence_score",
                          F.round(F.coalesce(
                              F.col("seed_rel"),
                              F.lit(0.0)) + F.pow(F.lit(0.5), F.col("hop_distance")) - 0.5, 6))
            .drop("seed_rel"))


# ---------------------------------------------------------------------------
# type-specific synthesis (question_answering.py:610-746) — driver-side
# template assembly over the bounded evidence set
# ---------------------------------------------------------------------------

def _sentences(content: str) -> list[str]:
    return [s.strip() for s in re.split(r"[.!?]+", content) if len(s.strip()) >= 10]


def _relevant_sentences(content: str, keywords: list[str]) -> list[str]:
    """question_answering.py:748-769: keyword-hit-ranked sentences, top 3."""
    scored = []
    for s in _sentences(content):
        low = s.lower()
        hits = sum(1 for k in keywords if k.lower() in low)
        if hits > 0:
            scored.append((s, hits))
    scored.sort(key=lambda x: (-x[1], x[0]))
    return [s for s, _ in scored[:3]]


def _synth_factual(ev: list[dict], parsed: ParsedQuestion, text_col: str) -> str:
    """question_answering.py:634-655: top-2 relevant sentences from each
    of the top-3 evidence rows."""
    parts: list[str] = []
    for item in ev[:3]:
        parts.extend(_relevant_sentences(
            item[text_col], parsed.entities + parsed.keywords)[:2])
    if parts:
        return " ".join(parts)
    return f"Based on the available information: {ev[0][text_col][:200]}..."


def _synth_comparative(ev, parsed, text_col):
    """:657-682: group evidence by mentioned entity."""
    if len(parsed.entities) < 2:
        return _synth_factual(ev, parsed, text_col)
    parts = []
    for entity in parsed.entities:
        for item in ev:
            if entity.lower() in item[text_col].lower():
                parts.append(f"Regarding {entity}: {item[text_col][:150]}")
                break
    return " ".join(parts) if parts else _synth_factual(ev, parsed, text_col)


def _synth_causal(ev, parsed, text_col):
    """:684-705 + :771-796: prefer causal-marked evidence, extract the
    first causally-marked sentence."""
    causal = [e for e in ev if e.get("has_causal")]
    if not causal:
        return _synth_factual(ev, parsed, text_col)
    content = causal[0][text_col]
    pats = [r"because\s+", r"due to\s+", r"caused by\s+", r"results from\s+",
            r"leads to\s+", r"reason.*is\s+"]
    for s in _sentences(content):
        if any(re.search(p, s, re.IGNORECASE) for p in pats):
            return s
    return content[:200] + "..."


def _synth_procedural(ev, parsed, text_col):
    """:707-726 + :798-818: collect ordered steps (max 5)."""
    proc = [e for e in ev if e.get("has_procedural")]
    steps: list[str] = []
    for item in proc:
        for pat in (r"(\d+[\.\)]\s*[^.]+)", r"(first[^.]+)", r"(then[^.]+)",
                    r"(next[^.]+)", r"(finally[^.]+)"):
            steps.extend(re.findall(pat, item[text_col], re.IGNORECASE))
    if steps:
        return "Here's the process: " + " ".join(steps[:5])
    return _synth_factual(ev, parsed, text_col)


def _synth_definitional(ev, parsed, text_col):
    """:728-746: first definition-patterned content, truncated at 300."""
    for item in ev:
        if item.get("has_definition"):
            c = item[text_col]
            return c[:300] + "..." if len(c) > 300 else c
    c = ev[0][text_col]
    return c[:300] + "..." if len(c) > 300 else c


def _synth_temporal(ev, parsed, text_col):
    """Temporal: order evidence chronologically when a timestamp rode
    along (the reference falls back to factual; the time ordering is the
    type-specific value-add its TEMPORAL parse intends)."""
    stamped = [e for e in ev if e.get("ts") is not None]
    if not stamped:
        return _synth_factual(ev, parsed, text_col)
    stamped.sort(key=lambda e: e["ts"])
    first, last = stamped[0], stamped[-1]
    return (f"Earliest relevant item ({first['ts']}): {first[text_col][:120]} "
            f"Latest ({last['ts']}): {last[text_col][:120]}")


def _synth_relational(ev, parsed, text_col):
    """Relational: name the relations among evidence nodes (edge rows
    ride along in ev[i]['relations'] when the caller passed edges)."""
    rels = []
    for e in ev:
        for r in e.get("relations") or []:
            rels.append(f"{r['from_id']} -[{r['relation_type']}]-> {r['to_id']}")
        if len(rels) >= 5:
            break
    if rels:
        return "Relations found: " + "; ".join(rels[:5])
    return _synth_factual(ev, parsed, text_col)


def _synth_analytical(ev, parsed, text_col):
    """Analytical: surface the dominant terms across the evidence set —
    the deterministic stand-in for 'patterns in X'."""
    counts: dict[str, int] = {}
    for e in ev:
        for w in re.findall(r"[a-z0-9]+", e[text_col].lower()):
            if len(w) > 3 and w not in _QA_STOPWORDS:
                counts[w] = counts.get(w, 0) + 1
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    if top:
        return ("Dominant terms across the evidence: "
                + ", ".join(f"{w} ({n})" for w, n in top))
    return _synth_factual(ev, parsed, text_col)


_SYNTHESIZERS = {
    "factual": _synth_factual,
    "comparative": _synth_comparative,
    "causal": _synth_causal,
    "procedural": _synth_procedural,
    "definitional": _synth_definitional,
    "temporal": _synth_temporal,
    "relational": _synth_relational,
    "analytical": _synth_analytical,
}


def synthesize_answer(parsed: ParsedQuestion, evidence: list[dict],
                      text_col: str = "content") -> str:
    """Dispatch to the type-specific synthesizer
    (question_answering.py:610-632)."""
    if not evidence:
        return "I don't have enough information to answer this question."
    return _SYNTHESIZERS.get(parsed.qtype, _synth_factual)(
        evidence, parsed, text_col)


def answer_confidence(relevances: list[float]) -> float:
    """question_answering.py:820-841: 0.6·avg relevance + corroboration
    boost (≥3 sources +0.2, ≥2 +0.1) + 0.2·high-quality fraction
    (> 0.7), capped at 0.95; 0.1 with no evidence."""
    if not relevances:
        return 0.1
    n = len(relevances)
    conf = (sum(relevances) / n) * 0.6
    if n >= 3:
        conf += 0.2
    elif n >= 2:
        conf += 0.1
    conf += (sum(1 for r in relevances if r > 0.7) / n) * 0.2
    return min(conf, 0.95)


def source_attributions(evidence: list[dict], text_col: str = "content",
                        id_col: str = "node_id") -> list[dict]:
    """question_answering.py:843-860: top-5 sources with 200-char
    snippet, confidence = relevance + 0.2 capped at 1.0."""
    out = []
    for item in evidence[:5]:
        content = item[text_col]
        rel = float(item.get("relevance") or item.get("evidence_score") or 0.0)
        out.append({
            "node_id": item[id_col],
            "content_snippet": content[:200] + "..." if len(content) > 200 else content,
            "relevance_score": rel,
            "confidence_score": min(rel + 0.2, 1.0),
        })
    return out


def answer(question: str, nodes: DataFrame, edges: DataFrame,
           text_col: str = "content", id_col: str = "node_id",
           source_col: str | None = "source", top_k: int = 20,
           hops: int = 1) -> dict:
    """End-to-end QA (question_answering.py pipeline): parse → identify
    → expand → score → type-specific synthesis. Deterministic template
    synthesis — the LLM seam of the reference is the ``synthesize`` step
    and can be swapped without touching the distributed part."""
    parsed = parse_question(question)
    marked = annotate_evidence(nodes, parsed, text_col)
    seeds = (marked.filter(F.col("relevance") > 0)
             .orderBy(F.col("relevance").desc(), F.col(id_col).asc())
             .limit(top_k))
    # expansion joins the MARKED nodes so every evidence row carries its
    # own relevance + synthesizer marker columns
    evidence = expand_evidence(seeds, edges, marked, hops, id_col)
    rows = (evidence.orderBy(F.col("evidence_score").desc(), F.col(id_col).asc())
            .limit(top_k).collect())
    ev = [r.asDict() for r in rows]
    if not ev:
        return {"question": question, "type": parsed.qtype, "answer":
                synthesize_answer(parsed, []), "confidence": 0.1,
                "sources": [], "attributions": [], "evidence": []}
    if parsed.qtype == "relational":
        # Induced relations among the evidence nodes, bounded by top_k².
        ids = [e[id_col] for e in ev]
        id_df = nodes.sparkSession.createDataFrame(
            [(i,) for i in ids], "node_id string")
        rel_rows = [r.asDict() for r in
                    graph.induced_subgraph(edges, id_df).limit(50).collect()]
        for e in ev:
            e["relations"] = [r for r in rel_rows
                              if r["from_id"] == e[id_col]]
    conf = round(answer_confidence(
        [float(e.get("relevance") or 0.0) for e in ev]), 6)
    sources = sorted({e[source_col] for e in ev
                      if source_col and e.get(source_col) is not None})
    return {
        "question": question, "type": parsed.qtype,
        "answer": synthesize_answer(parsed, ev, text_col),
        "confidence": conf, "sources": sources,
        "attributions": source_attributions(ev, text_col, id_col),
        "evidence": [{"id": e[id_col], "score": e["evidence_score"]} for e in ev],
    }
