"""Natural-language query processing: regex classification → QuerySpec.

Reference: /root/reference/memory_core/query/natural_language_processor.py —
regex classification (:120-161) combined with an LLM parse (:163-192) at
(:194-246) into a ParsedQuery that may rewrite the query type, add
filters, and bump similarity thresholds
(/root/reference/memory_core/query/query_engine.py:276-300).

The deterministic regex half is implemented fully; the LLM half is the
same pluggable-provider seam as ingestion (pass ``llm_parse`` to
override/augment). Output is a QuerySpec + search intent, ready for
MemoryEngine.query / .search.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from memory_engine_spark.plans.query_spec import QuerySpec

_PATTERNS = [
    # (intent, regex) — first match wins, mirroring the reference's
    # ordered classification (natural_language_processor.py:120-161)
    ("aggregation", r"\b(how many|count|number of|total|average|avg|sum)\b"),
    ("relationship", r"\b(related to|connected to|relationships? of|links? to)\b"),
    ("temporal", r"\b(recent|latest|newest|oldest|last (week|month|year))\b"),
    ("semantic_search", r"\b(similar to|like|about|regarding)\b"),
]

_FILTER_PATTERNS = [
    # "... from source X", "... with rating above 0.7"
    (r"from source (\w+)", ("source", "eq")),
    (r"rating (?:above|over|greater than) ([0-9.]+)", ("rating_truthfulness", "gt")),
    (r"rating (?:below|under|less than) ([0-9.]+)", ("rating_truthfulness", "lt")),
    (r"containing ['\"]?([\w ]+?)['\"]?$", ("content", "contains")),
]


@dataclass
class ParsedNLQuery:
    """natural_language_processor.py:18-42 shape."""

    raw: str
    intent: str
    spec: QuerySpec
    search_terms: str = ""
    confidence: float = 0.5


def parse_nl_query(question: str, entity: str = "nodes",
                   llm_parse=None) -> ParsedNLQuery:
    """Classify + extract filters. ``llm_parse(question) -> dict`` may
    add filters / override intent (the provider seam); absent, the
    regex-only result stands (deterministic)."""
    low = question.lower().strip()
    intent = "text_search"
    for name, pat in _PATTERNS:
        if re.search(pat, low):
            intent = name
            break

    spec = QuerySpec(entity)
    matched_any = False
    for pat, (field_, op) in _FILTER_PATTERNS:
        m = re.search(pat, low)
        if m:
            val: object = m.group(1)
            if op in ("gt", "lt"):
                val = float(val)
            spec.filter(field_, op, val)
            matched_any = True

    if intent == "aggregation":
        spec.agg("count", alias="count")
    if intent == "temporal":
        desc = not bool(re.search(r"\boldest\b", low))
        spec.sort("creation_timestamp", ascending=not desc)

    # residual words (minus recognized patterns) become search terms
    residual = low
    for _, pat in _PATTERNS:
        residual = re.sub(pat, " ", residual)
    for pat, _ in _FILTER_PATTERNS:
        residual = re.sub(pat, " ", residual)
    residual = re.sub(r"[^a-z0-9 ]", " ", residual)
    stop = {"what", "which", "show", "me", "all", "the", "а", "is", "are",
            "find", "get", "list", "of", "nodes", "node", "items"}
    terms = " ".join(w for w in residual.split() if w not in stop and len(w) > 2)

    confidence = 0.8 if (matched_any or intent != "text_search") else 0.5
    parsed = ParsedNLQuery(question, intent, spec, terms, confidence)

    if llm_parse is not None:  # provider seam (query_engine.py:117-136)
        hints = llm_parse(question) or {}
        for f_ in hints.get("filters", []):
            parsed.spec.filter(f_["field"], f_["op"], f_.get("value"))
        parsed.intent = hints.get("intent", parsed.intent)
        parsed.confidence = max(parsed.confidence, hints.get("confidence", 0.0))
    return parsed
