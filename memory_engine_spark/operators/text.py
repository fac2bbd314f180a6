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

import pandas
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


# ---------------------------------------------------------------------------
# Gopher-style document quality filters (Rae et al. 2021, "Scaling
# Language Models: ... Gopher" §A1.1; same family as C4's heuristics).
# Public-paper thresholds, all Column expressions — one projection.
# ---------------------------------------------------------------------------

GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def _ws_words(col):
    return F.filter(F.split(col, r"\s+"), lambda w: w != "")


def gopher_signals(col) -> Column:
    """Struct of the Gopher §A1.1 per-document signals:
    word_count, mean_word_length, symbol_word_ratio (#/… per word),
    bullet_line_ratio, ellipsis_line_ratio, alpha_word_ratio
    (words containing ≥1 alphabetic char), stopword_hits (distinct
    Gopher stop words present)."""
    words = _ws_words(col)
    n_words = F.size(words)
    lines = F.filter(F.split(col, r"\n"), lambda x: F.trim(x) != "")
    n_lines = F.greatest(F.size(lines), F.lit(1))
    symbols = (F.length(col) - F.length(F.replace(col, F.lit("#"), F.lit("")))
               + F.regexp_count(col, F.lit(r"\.\.\.|…")))
    alpha_words = F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]")))
    sw = F.array(*[F.lit(s) for s in GOPHER_STOPWORDS])
    low_words = F.transform(words, F.lower)
    return F.struct(
        n_words.cast("long").alias("word_count"),
        F.when(n_words == 0, F.lit(0.0)).otherwise(
            F.round(F.aggregate(words, F.lit(0).cast("long"),
                                lambda acc, w: acc + F.length(w))
                    / n_words, 6)).alias("mean_word_length"),
        F.when(n_words == 0, F.lit(0.0))
        .otherwise(F.round(symbols / n_words, 6)).alias("symbol_word_ratio"),
        F.round(F.size(F.filter(lines, lambda x: F.trim(x)
                                .rlike(r"^[-*•]"))) / n_lines, 6)
        .alias("bullet_line_ratio"),
        F.round(F.size(F.filter(lines, lambda x: F.trim(x)
                                .rlike(r"(\.\.\.|…)$"))) / n_lines, 6)
        .alias("ellipsis_line_ratio"),
        F.when(n_words == 0, F.lit(0.0))
        .otherwise(F.round(alpha_words / n_words, 6)).alias("alpha_word_ratio"),
        F.size(F.array_intersect(F.array_distinct(low_words), sw))
        .cast("long").alias("stopword_hits"),
    )


def gopher_keep(signals) -> Column:
    """Gopher §A1.1 keep rule: 50 ≤ words ≤ 100k, 3 ≤ mean word length
    ≤ 10, symbol ratio ≤ 0.1, ≤ 90% bullet lines, ≤ 30% ellipsis lines,
    ≥ 80% alphabetic words, ≥ 2 stop words."""
    s = signals
    return ((s["word_count"] >= 50) & (s["word_count"] <= 100_000)
            & (s["mean_word_length"] >= 3) & (s["mean_word_length"] <= 10)
            & (s["symbol_word_ratio"] <= 0.1)
            & (s["bullet_line_ratio"] <= 0.9)
            & (s["ellipsis_line_ratio"] <= 0.3)
            & (s["alpha_word_ratio"] >= 0.8)
            & (s["stopword_hits"] >= 2))


def gopher_filter(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Per-document Gopher signals + keep flag — one projection, no
    shuffle; the standard pre-training corpus gate."""
    sig = gopher_signals(F.col(text_col))
    return df.select(
        id_col, sig.alias("s"),
    ).select(
        id_col, "s.word_count", "s.mean_word_length", "s.symbol_word_ratio",
        "s.bullet_line_ratio", "s.ellipsis_line_ratio", "s.alpha_word_ratio",
        "s.stopword_hits", gopher_keep(F.col("s")).alias("keep"),
    )


# ---------------------------------------------------------------------------
# repetition detection (Gopher §A1.1 repetition filters)
# ---------------------------------------------------------------------------

def repetition_stats(df: DataFrame, text_col: str, id_col: str,
                     ngram: int = 2) -> DataFrame:
    """Per-document repetition signals: duplicate_line_fraction (dup
    lines / lines), duplicate_line_char_fraction (chars in repeated
    lines / chars), top_ngram_char_fraction (chars covered by the most
    frequent word n-gram / chars). Line stats are pure expressions; the
    top-n-gram needs one explode + groupBy (map-side combined)."""
    from memory_engine_spark.operators.dedup import _spread

    # The per-doc array algebra (line dedup sums, n-gram transform)
    # is the expensive part and the single-file documents scan feeds
    # it through ONE task otherwise — invisible under the old count()
    # bench materializer (the left join let Catalyst drop these
    # columns entirely), 4.4 s warm at sf0.1 once r9's noop-write
    # bench measured the real plan.
    df = _spread(df.select(id_col, text_col))
    lines = F.filter(F.split(F.col(text_col), r"\n"),
                     lambda x: F.trim(x) != "")
    n_lines = F.greatest(F.size(lines), F.lit(1))
    dup_lines = F.size(lines) - F.size(F.array_distinct(lines))
    # chars in occurrences beyond the first of each distinct line
    dup_chars = (F.aggregate(lines, F.lit(0).cast("long"),
                             lambda acc, x: acc + F.length(x))
                 - F.aggregate(F.array_distinct(lines), F.lit(0).cast("long"),
                               lambda acc, x: acc + F.length(x)))
    total_chars = F.greatest(F.length(F.col(text_col)), F.lit(1))
    base = df.select(
        F.col(id_col).alias("_id"),
        F.round(dup_lines / n_lines, 6).alias("duplicate_line_fraction"),
        F.round(dup_chars / total_chars, 6).alias("duplicate_line_char_fraction"),
        total_chars.alias("_chars"),
    )
    from memory_engine_spark.operators.dedup import tokens as _alnum_tokens

    toks = _alnum_tokens(F.col(text_col))
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - ngram, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, ngram)))
    ex = df.select(F.col(id_col).alias("_id"), F.explode(grams).alias("g")) \
        .filter(F.col("g") != "")
    # Top-1 per doc as min(struct(-n, g)) — (n desc, g asc) tiebreak
    # identical to the previous row_number window, but an AGGREGATE:
    # map-side partial combine, no per-partition sort (the window
    # version sorted every doc's full gram census; round-8 full-
    # registry bench exposed it as one of the suite's slowest scans).
    top = (ex.groupBy("_id", "g").agg(F.count(F.lit(1)).alias("n"))
           .groupBy("_id")
           .agg(F.min(F.struct((-F.col("n")).alias("_neg"),
                               F.col("g").alias("_g"))).alias("_t"))
           .select("_id", (-F.col("_t._neg")).alias("top_n"),
                   F.length("_t._g").alias("top_l")))
    out = base.join(top, "_id", "left")
    frac = F.when(F.col("top_n").isNull(), 0.0).otherwise(
        F.round(F.col("top_n") * F.col("top_l") / F.col("_chars"), 6))
    return out.select(F.col("_id").alias(id_col),
                      "duplicate_line_fraction",
                      "duplicate_line_char_fraction",
                      frac.alias("top_ngram_char_fraction"))


# ---------------------------------------------------------------------------
# train/benchmark decontamination (n-gram collision, the standard
# 13-gram rule of GPT-3/PaLM eval decontamination)
# ---------------------------------------------------------------------------

def decontaminate(train: DataFrame, benchmark: DataFrame, text_col: str,
                  id_col: str, window: int = 13) -> DataFrame:
    """Training documents sharing ≥1 rolling ``window``-token fingerprint
    with any benchmark document. Fingerprints are md5 of the token
    window (operators/text.rolling_fingerprints), so the collision check
    is an equi-join on the fingerprint — never a cross join; the
    benchmark side is tiny and broadcasts. Returns
    (id, n_collisions) for CONTAMINATED docs (anti-join to drop them)."""
    from memory_engine_spark.operators.dedup import _spread

    def fp(df):
        # _spread: a single-file scan otherwise runs the whole
        # tokenize+md5 fingerprint stage in ONE task (round-8 bench:
        # 3.9 s warm on one core at sf0.1).
        return _spread(df.select(F.col(id_col).alias("_id"),
                                 F.col(text_col).alias("_t"))).select(
            "_id",
            F.explode(F.array_distinct(
                rolling_fingerprints(F.col("_t"), window))).alias("fp"))

    bench_fps = fp(benchmark).select("fp").distinct()
    hits = fp(train).join(F.broadcast(bench_fps), "fp")
    return (hits.groupBy("_id").agg(F.count(F.lit(1)).alias("n_collisions"))
            .select(F.col("_id").alias(id_col), "n_collisions"))


# ---------------------------------------------------------------------------
# PII redaction (C4-style scrubbing) + deterministic dataset splits
# ---------------------------------------------------------------------------

# Simple, cross-engine-identical patterns (no lookarounds): email, US-ish
# phone, IPv4, 13-19-digit card-like numbers.
PII_PATTERNS = [
    ("EMAIL", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("PHONE", r"\+?[0-9]{1,2}[-. ]?\(?[0-9]{3}\)?[-. ][0-9]{3}[-. ][0-9]{4}"),
    ("IP", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"),
    ("NUMBER", r"\b[0-9]{13,19}\b"),
]


def redact_pii(col) -> Column:
    """Replace email / phone / IPv4 / long-number spans with
    ``<TAG>`` markers — the standard corpus-scrubbing pass, pure
    regexp_replace chain (one projection)."""
    out = col
    for tag, pat in PII_PATTERNS:
        out = F.regexp_replace(out, pat, f"<{tag}>")
    return out


def pii_counts(col) -> Column:
    """Struct of per-kind PII match counts (for filtering/reporting)."""
    return F.struct(*[
        F.regexp_count(col, F.lit(pat)).cast("long").alias(tag.lower())
        for tag, pat in PII_PATTERNS])


def hash_split(df: DataFrame, id_col: str,
               splits: dict[str, float] | None = None,
               salt: str = "split") -> DataFrame:
    """Deterministic train/val/test assignment by content-independent
    id hash: bucket = md5(salt ‖ id) mod 10000 mapped through the
    cumulative split weights. Stable across runs, partitions, and
    engines (the md5 trick — reproducible in SQL for oracle checks).
    Returns the input plus a ``split`` column."""
    splits = splits or {"train": 0.8, "val": 0.1, "test": 0.1}
    if abs(sum(splits.values()) - 1.0) > 1e-9:
        raise ValueError("split weights must sum to 1")
    bucket = (F.conv(F.substring(F.md5(
        F.concat_ws(":", F.lit(salt), F.col(id_col).cast("string"))), 1, 8),
        16, 10).cast("long") % 10000)
    expr = None
    acc = 0.0
    for name, w in splits.items():
        acc += w
        cond = bucket < int(round(acc * 10000))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return df.withColumn("split", expr)


def chunk_tokens(df: DataFrame, text_col: str, id_col: str,
                 chunk_size: int = 128, overlap: int = 16) -> DataFrame:
    """Fixed-token-window chunking with overlap — the document→chunk
    explosion feeding context-window-bounded training/RAG pipelines
    (the reference ingests whole documents only; bulk_processor.py).

    Chunks start every ``chunk_size - overlap`` tokens; the last chunk
    may be short; a doc shorter than one chunk yields exactly one chunk.
    Returns (id, chunk_idx, start_tok, n_chunk_tokens, chunk_text) —
    all Column expressions (sequence + explode + slice), row-local, no
    shuffle: at 100 TB this is a pure scan-side flatMap whose output
    feeds .repartition or a partitioned write."""
    if overlap >= chunk_size:
        raise ValueError("overlap must be < chunk_size")
    stride = chunk_size - overlap
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    n_chunks = F.greatest(
        F.lit(1), F.ceil((n - F.lit(overlap)) / F.lit(stride)).cast("int"))
    return (
        df.select(F.col(id_col), toks.alias("_toks"), n.alias("_n"),
                  F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"))
        .select(
            F.col(id_col),
            "chunk_idx",
            (F.col("chunk_idx") * stride).cast("long").alias("start_tok"),
            F.slice(F.col("_toks"), F.col("chunk_idx") * stride + 1,
                    chunk_size).alias("_chunk"))
        .select(
            F.col(id_col), F.col("chunk_idx").cast("int").alias("chunk_idx"),
            "start_tok",
            F.size("_chunk").cast("long").alias("n_chunk_tokens"),
            F.concat_ws(" ", F.col("_chunk")).alias("chunk_text"))
    )


def fuzzy_term_pairs(df: DataFrame, term_col: str,
                     max_len: int = 24) -> DataFrame:
    """All unordered pairs of distinct terms within edit distance 1,
    via SymSpell-style DELETION-NEIGHBORHOOD blocking (Garbe's
    symmetric delete algorithm): each term generates itself plus its
    |term| single-character deletions as block keys; two terms with
    levenshtein ≤ 1 MUST share a key (equal, or one is the other's
    deletion, or both delete to the common core), so the candidate
    join is an equi-join on the key — never a cross join — and exact
    levenshtein verifies each candidate. The standard spelling-
    normalization step of a text pipeline (cluster misspelled variants
    before counting/matching).

    Returns (a, b, dist) with a < b, dist ∈ {0 is impossible for
    distinct terms, so always 1}. Terms longer than ``max_len`` are
    skipped (deletion fan-out is |term|; web-scale junk tokens get
    arbitrarily long — the cap bounds the explode exactly like
    max_shingle_freq bounds the Jaccard join).

    Scale shape: |term|+1 key rows per term → equi-join on the key →
    per-key quadratic bounded by bucket size (terms sharing a deletion
    core), verified JVM-side with levenshtein; distinct-pair dedup is
    the only full shuffle and it carries (a, b) strings only.
    """
    terms = (df.select(F.col(term_col).alias("t")).distinct()
             .filter((F.length("t") > 0) & (F.length("t") <= max_len)))
    keys = terms.select(
        "t",
        F.explode(F.array_union(
            F.array(F.col("t")),
            F.transform(
                F.sequence(F.lit(1), F.length("t")),
                lambda i: F.concat(F.substring(F.col("t"), 1, i - 1),
                                   F.col("t").substr(i + 1, F.length("t")))),
        )).alias("k"))
    a = keys.select(F.col("t").alias("a"), "k")
    b = keys.select(F.col("t").alias("b"), "k")
    return (a.join(b, "k")
            .filter(F.col("a") < F.col("b"))
            .select("a", "b").distinct()
            .withColumn("dist", F.levenshtein("a", "b"))
            .filter(F.col("dist") <= 1))


# ---------------------------------------------------------------------------
# HTML main-content extraction (trafilatura/jusText-style, simplified):
# the web-corpus step BEFORE every text filter in a pretraining pipeline.
# Everything is JVM-side Column expressions (regexp_replace / split /
# posexplode / aggregate) — no Python in the hot path — and every regex
# sticks to the Java∩RE2 common subset (non-greedy, (?s), classes;
# NO backreferences or lookaround) so the same patterns run in the
# DuckDB oracle verbatim.
# ---------------------------------------------------------------------------

HTML_BLOCK_RE = r"</?(?:p|div|nav|h1|h2|h3|ul|ol|li|body|html|table|tr|td)[^>]*>"
_HTML_DROP_RE = ("(?s)<head[^>]*>.*?</head>|(?s)<script[^>]*>.*?</script>"
                 "|(?s)<style[^>]*>.*?</style>|(?s)<!--.*?-->")
_HTML_LINK_RE = r"(?s)<a[^>]*>(.*?)</a>"


def html_clean_block(col) -> Column:
    """Tag-strip + whitespace-collapse + trim — the canonical block
    text the link-density test measures."""
    return F.trim(F.regexp_replace(
        F.regexp_replace(col, "<[^>]*>", " "), r"\s+", " "))


def html_entity_decode(col) -> Column:
    """The five entities a text pipeline must fold (&amp; decoded
    LAST, per the standard double-escape rule)."""
    out = F.replace(col, F.lit("&lt;"), F.lit("<"))
    out = F.replace(out, F.lit("&gt;"), F.lit(">"))
    out = F.replace(out, F.lit("&quot;"), F.lit('"'))
    out = F.replace(out, F.lit("&nbsp;"), F.lit(" "))
    return F.replace(out, F.lit("&amp;"), F.lit("&"))


def html_main_content(df: DataFrame, html_col: str = "html",
                      id_col: str = "doc_id") -> DataFrame:
    """HTML → main text: (1) drop head/script/style/comments wholesale,
    (2) split the body into blocks at block-level tags, (3) per block
    compute the LINK DENSITY — total anchor-text chars vs block text
    chars, both through the same clean() — and drop link-dominated
    blocks (2·link_chars > chars: navs, footers, ad units), (4) stitch
    survivors back in document order, entity-decode, re-collapse.
    Returns (id, text, n_blocks, n_kept). The density test is exact
    integer arithmetic so the operator is byte-reproducible
    cross-engine (q169).

    Scale shape: posexplode fans each doc into its blocks (bounded by
    doc size), everything per-block is a scalar expression, and the
    stitch-back is one groupBy(id) with an array_sort — no window, no
    Python. 100-TB posture: runs straight after the WARC/CC scan,
    before any tokenization, so everything downstream sees plain text."""
    frag = F.col("_frag")
    txt = html_clean_block(frag)
    links = F.expr(f"regexp_extract_all(_frag, '{_HTML_LINK_RE}', 1)")
    link_n = F.aggregate(links, F.lit(0),
                         lambda a, x: a + F.length(html_clean_block(x)))
    blocks = (df.select(
        id_col,
        F.posexplode(F.split(
            F.regexp_replace(F.col(html_col), _HTML_DROP_RE, " "),
            HTML_BLOCK_RE)).alias("_pos", "_frag"))
        .select(id_col, "_pos", txt.alias("_txt"),
                link_n.alias("_link_n")))
    scored = blocks.select(
        id_col, "_pos", "_txt",
        (F.length("_txt") > 0).alias("_nonempty"),
        ((F.length("_txt") > 0)
         & (2 * F.col("_link_n") <= F.length("_txt"))).alias("_keep"))
    stitched = (scored.groupBy(id_col).agg(
        F.sum(F.when(F.col("_nonempty"), 1).otherwise(0))
        .cast("int").alias("n_blocks"),
        F.sum(F.when(F.col("_keep"), 1).otherwise(0))
        .cast("int").alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.when(
                    F.col("_keep"),
                    F.struct(F.col("_pos"), F.col("_txt"))))),
                lambda s: s["_txt"]), " ")
        .alias("_raw")))
    final = F.trim(F.regexp_replace(
        html_entity_decode(F.col("_raw")), r"\s+", " "))
    return stitched.select(id_col, final.alias("text"),
                           "n_blocks", "n_kept")


# ---------------------------------------------------------------------------
# URL canonicalization — the crawl-dedup prerequisite: the same page
# arrives under scheme/host case variants, default ports, fragments,
# tracking params, and shuffled query order; dedup-by-URL without
# canonicalization undercounts duplicates badly. Pure Column
# expressions in the Java∩RE2 regex subset (q169's rule), so the
# DuckDB oracle replays it verbatim.
# ---------------------------------------------------------------------------

# utm_* is a KEY-PREFIX family (utm_source, utm_medium, …); the rest
# are exact key matches — prefix-matching those stripped innocent
# params like 'fbclid2' or 'gclid_src' (round-7 ADVICE).
_URL_TRACKING_EXACT = ("fbclid", "gclid", "msclkid", "mc_eid")


def _is_tracking_param(p: Column) -> Column:
    """True when a 'key=value' query token is a tracking param: the
    KEY (token up to the first '=') either starts with 'utm_' or
    equals one of the exact tracker names — never the value part."""
    key = F.split_part(p, F.lit("="), F.lit(1))
    hit = key.startswith("utm_")
    for t in _URL_TRACKING_EXACT:
        hit = hit | (key == t)
    return hit


def url_normalize(col) -> Column:
    """Canonical URL: lowercase scheme+host, strip the scheme's
    default port (:80 http / :443 https), drop the fragment, drop
    tracking params (utm_* key prefix; fbclid/gclid/msclkid/mc_eid
    exact keys), sort the surviving query params bytewise, empty
    path → '/'. Path case and non-default ports are PRESERVED (paths
    are case-sensitive per RFC 3986; a real port difference is a real
    origin difference). Inputs WITHOUT a scheme ('://' absent) pass
    through unchanged — scheme extraction on them would emit a
    malformed '://…' string."""
    u = F.regexp_replace(col, "#.*$", "")
    scheme = F.lower(F.regexp_extract(u, "^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    hostport = F.lower(F.regexp_extract(u, "^[^:/?]+://([^/?]+)", 1))
    host = F.when(
        (scheme == "http") & hostport.endswith(":80"),
        F.regexp_replace(hostport, ":80$", "")
    ).when(
        (scheme == "https") & hostport.endswith(":443"),
        F.regexp_replace(hostport, ":443$", "")
    ).otherwise(hostport)
    path = F.regexp_extract(u, "^[^:/?]+://[^/?]*(/[^?]*)?", 1)
    query = F.regexp_extract(u, r"\?(.*)$", 1)
    kept = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~_is_tracking_param(p))
    qnorm = F.array_join(F.array_sort(kept), "&")
    norm = F.concat(
        scheme, F.lit("://"), host,
        F.when(path == "", "/").otherwise(path),
        F.when(qnorm == "", "").otherwise(F.concat(F.lit("?"), qnorm)))
    return F.when(col.rlike("^[a-zA-Z][a-zA-Z0-9+.-]*://"), norm) \
        .otherwise(col)


def url_host(col) -> Column:
    """Lowercased host (port stripped) — the crawl-politeness /
    per-site aggregation key."""
    return F.regexp_replace(
        F.lower(F.regexp_extract(col, "^[^:/?]+://([^/?]+)", 1)),
        ":[0-9]+$", "")


def nfc_normalize_col(col) -> Column:
    """Unicode NFC normalization as an Arrow-batched pandas UDF —
    the canonical-composition step a text pipeline runs before any
    byte-level dedup/fingerprinting (the same logical text arrives
    as precomposed é OR e+COMBINING ACUTE; hash-based dedup treats
    them as different documents unless normalized). NFC (not NFKC):
    canonical equivalence only — compatibility characters like the
    ﬁ ligature are PRESERVED, because folding them loses information
    the tokenizer may want. Python's unicodedata is the reference
    implementation here; the q221 oracle cross-checks it against
    DuckDB's independent nfc_normalize, so the two engines' Unicode
    tables verify each other."""
    import unicodedata

    import pandas  # noqa: F401 — resolves the UDF's type hints
    from pyspark.sql.functions import pandas_udf

    # NOTE: the hints must name module-resolvable types — this file
    # uses `from __future__ import annotations`, so pandas_udf resolves
    # them as strings against the function's globals.
    @pandas_udf("string")
    def _nfc(s: "pandas.Series") -> "pandas.Series":
        return s.map(lambda x: None if x is None
                     else unicodedata.normalize("NFC", x))

    return _nfc(col)
