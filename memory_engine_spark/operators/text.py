"""Text analysis: token counting, quality scoring, language ID,
document fingerprinting.

Reference analogues: word tokenization + Jaccard relevance
(/root/reference/memory_core/query/result_ranker.py:228-264), stop-word
removal (/root/reference/memory_core/ingestion/relationship_extractor.py:289-307),
content-length scoring (result_ranker.py:413-436), term extraction with
frequency (/root/reference/memory_core/synthesis/insight_discovery.py:489-561).
Extended to the training-data-pipeline text suite (language ID, BPE-ish
token counts, rolling fingerprints) per the build brief.

All deterministic, all built-in expressions, all reproducible in ANSI
SQL for the DuckDB oracle (md5 for fingerprints — same algorithm both
sides; ASCII [[:punct:]] class — same set in Java regex and RE2).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from memory_engine_spark.operators.dedup import normalized, tokens

# reference stop-word flavor (relationship_extractor.py:289-307)
STOPWORDS = [
    "the", "a", "an", "and", "or", "but", "in", "on", "at", "to", "for",
    "of", "with", "by", "from", "up", "about", "into", "through", "is",
    "are", "was", "were", "be", "been", "being", "have", "has", "had",
    "do", "does", "did", "will", "would", "could", "should", "this",
    "that", "these", "those", "it", "its", "as",
]

# Marker words per language for the n-gram/marker heuristic language ID.
LANG_MARKERS = {
    "en": ["the", "and", "is", "of", "to", "in", "that", "it", "with", "for"],
    "es": ["el", "la", "de", "que", "y", "los", "las", "una", "por", "con"],
    "fr": ["le", "la", "les", "des", "est", "une", "dans", "que", "pour", "sur"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein", "eine", "auf"],
    "zh": ["de", "shi", "zai", "le", "wo", "you", "he", "ren", "zhe", "men"],
}


def token_count(col) -> Column:
    """Whitespace-word token count."""
    return F.size(tokens(col))


def regex_token_count(col) -> Column:
    """BPE-ish token count: words OR single non-space-non-word chars —
    the common pre-tokenizer approximation (\\w+|[^\\w\\s])."""
    return F.regexp_count(col, F.lit(r"\w+|[^\w\s]"))


# Explicit ASCII punctuation class — identical semantics in Java regex
# (Spark) and RE2 (DuckDB); POSIX [[:punct:]] is NOT valid Java syntax.
PUNCT_CLASS = r"""[!"#$%&'()*+,\-./:;<=>?@\[\\\]^_`{|}~]"""


def punct_ratio(col) -> Column:
    """#ASCII-punct chars / total chars (0 for empty)."""
    n_punct = F.length(col) - F.length(F.regexp_replace(col, PUNCT_CLASS, ""))
    return F.when(F.length(col) == 0, 0.0).otherwise(n_punct / F.length(col))


def stopword_ratio(col) -> Column:
    """Fraction of tokens that are stopwords (0 for token-less text)."""
    toks = tokens(col)
    sw = F.array(*[F.lit(s) for s in STOPWORDS])
    n_sw = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return F.when(F.size(toks) == 0, 0.0).otherwise(n_sw / F.size(toks))


def avg_word_length(col) -> Column:
    toks = tokens(col)
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return F.when(F.size(toks) == 0, 0.0).otherwise(total / F.size(toks))


def content_length_score(col) -> Column:
    """result_ranker.py:413-436: optimal 50–500 chars → 1.0, shorter
    scales linearly from 0, longer decays linearly to 0.3 floor at
    5000+ chars."""
    n = F.length(col)
    return (
        F.when(n <= 0, 0.0)
        .when(n < 50, n / F.lit(50.0))
        .when(n <= 500, F.lit(1.0))
        .otherwise(F.greatest(F.lit(0.3), 1.0 - (n - 500) / F.lit(4500.0) * 0.7))
    )


def quality_score(col) -> Column:
    """Composite document quality in [0,1]:
    0.4·length_score + 0.3·(1 − punct_ratio) + 0.3·(1 − stopword_ratio).
    Deterministic and SQL-replicable; the weighting mirrors the
    reference's weighted-score style (result_ranker.py:322-334)."""
    return (0.4 * content_length_score(col)
            + 0.3 * (1.0 - punct_ratio(col))
            + 0.3 * (1.0 - stopword_ratio(col)))


def language_id(col) -> Column:
    """Marker-word language ID: per language, count tokens in its marker
    list; argmax wins, ties broken by language code order, no hits →
    'und'. One pass of array expressions, no UDF."""
    toks = tokens(col)
    scores = []
    for lang in sorted(LANG_MARKERS):
        markers = F.array(*[F.lit(m) for m in LANG_MARKERS[lang]])
        scores.append(
            F.struct(
                F.size(F.filter(toks, lambda t: F.array_contains(markers, t))).alias("hits"),
                F.lit(lang).alias("lang"),
            )
        )
    # argmax: sort by (hits desc, lang asc) — struct compare sorts by
    # first field asc, so invert hits; then take the first element.
    arr = F.array(*scores)
    best = F.array_sort(
        F.transform(arr, lambda s: F.struct((-s["hits"]).alias("neg"), s["lang"].alias("lang")))
    )[0]
    return F.when(best["neg"] == 0, F.lit("und")).otherwise(best["lang"])


def fingerprint(col) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text
    (md5 matches the DuckDB oracle bit-for-bit). The reference's
    content-hash idiom (query_cache.py:268-317 MD5-of-normalized)."""
    return F.md5(normalized(col))


def rolling_fingerprints(col, window: int = 8) -> Column:
    """Winnowing-style rolling fingerprints: md5 over each ``window``-token
    span, returned as array<string>. Basis for robust near-dup/overlap
    detection at corpus scale."""
    toks = tokens(col)
    return F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - window, F.lit(0))),
        lambda i: F.md5(F.concat_ws(" ", F.slice(toks, i + 1, window))),
    )


def text_stats(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Per-document text statistics table — one narrow projection."""
    c = F.col(text_col)
    return df.select(
        F.col(id_col),
        F.length(c).alias("n_chars"),
        token_count(c).alias("n_tokens"),
        regex_token_count(c).alias("n_regex_tokens"),
        F.round(avg_word_length(c), 6).alias("avg_word_len"),
        F.round(punct_ratio(c), 6).alias("punct_ratio"),
        F.round(stopword_ratio(c), 6).alias("stopword_ratio"),
        F.round(quality_score(c), 6).alias("quality"),
        language_id(c).alias("lang_guess"),
        fingerprint(c).alias("fingerprint"),
    )
