"""Portable sketches: deterministic, oracle-checkable approximations
for 100 TB-scale aggregates.

``approx_count_distinct`` (Spark's native HLL++) is the right call in
production, but its register hashing is engine-private, so its output
can't be cross-checked against any other engine. This module rebuilds
HyperLogLog (Flajolet et al., AofA 2007) from *portable* primitives —
md5 for the hash, ``bin()`` for the leading-zero rank — so the exact
same registers (and therefore the exact same estimate) come out of
Spark and DuckDB. The reference exposes no sketches at all (its
count-distincts are exact in SQLite, sqlite_storage.py); this is the
scale path those queries need at 1000 executors: per-group state is
``m`` bytes, the aggregation is map-side combinable, and NOTHING is
shuffled but (group, register, max-rank) partials.

Design notes:
- hash = two independent 32-bit words from the md5 hex (chars 1-8 for
  the register index, chars 9-16 for the rank word); md5 is identical
  everywhere, unlike xxhash/murmur variants that differ per engine.
- rank = leading zeros of the 32-bit word + 1 = 33 - length(bin(w)),
  because both Spark and DuckDB print ``bin()`` without leading zeros
  (and both print '0' for zero — handled as rank 33).
- small-range correction (linear counting) applied when E ≤ 2.5m and
  empty registers exist; the 32-bit large-range correction is omitted
  (cardinalities here are far below 2^32/30).
- the final estimate sums ≤ m doubles; both engines ROUND to 4
  decimals so partial-order float drift can never flip a hash.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _md5_word(col: Column, start: int) -> Column:
    """32-bit unsigned int from 8 hex chars of md5(col), 1-based
    ``start``. conv() parses hex → decimal string → long."""
    return F.conv(F.substring(F.md5(col.cast("string")), start, 8),
                  16, 10).cast("long")


def hll_rank(col: Column) -> Column:
    """Position of the first 1-bit (from the MSB of a 32-bit window)
    of a hash word: 33 - length(bin(w)); all-zero word → 33."""
    w = col.cast("long")
    return (F.when(w == 0, F.lit(33))
            .otherwise(F.lit(33) - F.length(F.bin(w)))).cast("int")


def hll_count_distinct(df: DataFrame, col: str,
                       group_cols: list[str] | None = None,
                       p: int = 8) -> DataFrame:
    """HyperLogLog distinct-count estimate with ``m = 2**p`` registers,
    optionally per group. Returns group_cols + (hll_estimate double).

    Two shuffles total, both tiny: (group, register) max-rank partials
    — map-side combined, at most m rows per group — then the per-group
    fold of ≤ m register rows into the estimate. The input table is
    never re-shuffled on the data column itself (compare exact
    count-distinct: a full shuffle of every distinct value).
    """
    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    gcols = list(group_cols or [])
    c = F.col(col)
    # count-distinct semantics ignore NULLs; md5(NULL) would otherwise
    # add a NULL register row that inflates _n and skews the estimate
    df = df.filter(c.isNotNull())
    regs = (df.select(*gcols,
                      (_md5_word(c, 1) % m).alias("_reg"),
                      hll_rank(_md5_word(c, 9)).alias("_rank"))
            .groupBy(*gcols, "_reg")
            .agg(F.max("_rank").alias("_m")))
    # Empty registers never appear as rows; account for them as
    # 2^-0 = 1 each, and as the zero-register count V for the
    # linear-counting correction.
    agg = (regs.groupBy(*gcols)
           .agg(F.sum(F.pow(F.lit(2.0), -F.col("_m"))).alias("_s"),
                F.count(F.lit(1)).alias("_n")))
    v = F.lit(m) - F.col("_n")                       # empty registers
    raw = F.lit(alpha * m * m) / (F.col("_s") + v.cast("double"))
    est = F.when((raw <= F.lit(2.5 * m)) & (v > 0),
                 F.lit(float(m)) * F.log(F.lit(float(m)) / v.cast("double"))
                 ).otherwise(raw)
    return agg.select(*gcols, F.round(est, 4).alias("hll_estimate"))


def cms_estimate(df: DataFrame, col: str, probes: DataFrame,
                 d: int = 4, w: int = 2048) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan, J.Alg 2005) frequency
    estimates, portable primitives: row-``i`` hash = md5(``"i:" || x``)
    word mod ``w``, so Spark and DuckDB materialize identical counters.

    ``probes`` is a DataFrame with one column ``item`` (the candidate
    heavy hitters to read out of the sketch). Returns
    (item, cms_estimate long) with the classic one-sided error:
    estimate ≥ true count, ≤ true + εN with ε = e/w at δ = e^-d.

    Scale shape: the sketch is one map-side-combinable groupBy over
    (row, bucket) — at most ``d·w`` rows leave the map stage no matter
    the input size — and the probe side joins against that ≤ d·w-row
    table (broadcast). The raw items are never shuffled, which is the
    point at 100 TB: exact heavy hitters need a full shuffle of every
    distinct key; this needs d·w counters.
    """
    c = F.col(col)
    buckets = F.array(*[
        (_md5_word(F.concat(F.lit(f"{i}:"), c.cast("string")), 1) % w)
        .cast("int") for i in range(d)])
    sk = (df.select(F.posexplode(buckets).alias("_row", "_b"))
          .groupBy("_row", "_b")
          .agg(F.count(F.lit(1)).alias("_c")))
    p = F.col("item")
    pb = probes.select(
        "item",
        F.posexplode(F.array(*[
            (_md5_word(F.concat(F.lit(f"{i}:"), p.cast("string")), 1) % w)
            .cast("int") for i in range(d)])).alias("_row", "_b"))
    return (pb.join(F.broadcast(sk), ["_row", "_b"], "left")
            .groupBy("item")
            .agg(F.min(F.coalesce(F.col("_c"), F.lit(0)))
                 .cast("long").alias("cms_estimate")))


def _md5_word_sql(expr: str, start: int) -> str:
    """DuckDB twin of ``_md5_word``: 32-bit word from 8 hex chars of
    md5(expr), 1-based ``start``."""
    return f"""CAST(list_sum(list_transform(range(0, 8),
        j -> (strpos('0123456789abcdef',
              substr(md5({expr}), {start} + j::INT, 1)) - 1)
             * power(16, 7 - j))) AS BIGINT)"""


def cms_oracle_sql(table: str, col: str, probes_sql: str,
                   d: int = 4, w: int = 2048) -> str:
    """Generated DuckDB half of ``cms_estimate`` — same hashes, same
    counters, same min-readout. ``probes_sql`` must select one column
    aliased ``item``."""
    def b(i: int, x: str) -> str:
        return (_md5_word_sql(f"'{i}:' || CAST({x} AS VARCHAR)", 1)
                + f" % {w}")

    hashed = "\n            UNION ALL ".join(
        f"SELECT {i} AS _row, {b(i, col)} AS _b FROM {table}"
        for i in range(d))
    probe_rows = "\n            UNION ALL ".join(
        f"SELECT item, {i} AS _row, {b(i, 'item')} AS _b FROM probes"
        for i in range(d))
    return f"""
        WITH hashed AS (
            {hashed}
        ),
        sk AS (
            SELECT _row, _b, COUNT(*) AS _c FROM hashed GROUP BY _row, _b
        ),
        probes AS ({probes_sql}),
        pr AS (
            {probe_rows}
        )
        SELECT pr.item,
               CAST(MIN(COALESCE(sk._c, 0)) AS BIGINT) AS cms_estimate
        FROM pr LEFT JOIN sk ON pr._row = sk._row AND pr._b = sk._b
        GROUP BY pr.item
    """


def hll_oracle_sql(table: str, col: str, group_cols: list[str] | None = None,
                   p: int = 8) -> str:
    """The DuckDB side of the same sketch — generated, so the Spark
    operator and its oracle can never drift apart. ``col`` must be a
    SQL expression castable to VARCHAR."""
    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    gsel = "".join(f"{g}, " for g in (group_cols or []))
    gby = ("GROUP BY " + ", ".join(group_cols)) if group_cols else ""
    gby_reg = "GROUP BY " + ", ".join(list(group_cols or []) + ["_reg"])

    def word(start: int) -> str:
        return f"""CAST(list_sum(list_transform(range(0, 8),
            j -> (strpos('0123456789abcdef',
                  substr(md5(CAST({col} AS VARCHAR)), {start} + j::INT, 1)) - 1)
                 * power(16, 7 - j))) AS BIGINT)"""

    return f"""
        WITH hashed AS (
            SELECT {gsel}{word(1)} % {m} AS _reg,
                   CASE WHEN {word(9)} = 0 THEN 33
                        ELSE 33 - length(bin({word(9)})) END AS _rank
            FROM {table}
            WHERE {col} IS NOT NULL
        ),
        regs AS (
            SELECT {gsel}_reg, MAX(_rank) AS _m FROM hashed {gby_reg}
        ),
        folded AS (
            SELECT {gsel}SUM(power(2.0, -_m)) AS _s,
                   COUNT(*) AS _n
            FROM regs {gby}
        )
        SELECT {gsel}ROUND(
            CASE WHEN ({alpha * m * m} / (_s + ({m} - _n))) <= {2.5 * m}
                      AND ({m} - _n) > 0
                 THEN {float(m)} * ln({float(m)} / ({m} - _n))
                 ELSE {alpha * m * m} / (_s + ({m} - _n)) END, 4)
            AS hll_estimate
        FROM folded
    """


# ---------------------------------------------------------------------------
# Portable Bloom filter (completes the sketch family: HLL, CMS, Bloom)
# ---------------------------------------------------------------------------

def _bloom_pos(col: Column, i: int, m_bits: int) -> Column:
    """i-th bit position of a value: md5('bloom<i>:' || value) word
    mod m_bits — the same portable-hash construction as the HLL/CMS
    draws, so build and probe reproduce identically in ANSI SQL."""
    return (F.conv(F.substring(F.md5(
        F.concat_ws(":", F.lit(f"bloom{i}"), col.cast("string"))), 1, 8),
        16, 10).cast("long") % m_bits)


def bloom_build(df: DataFrame, col: str, m_bits: int = 65536,
                k: int = 4) -> DataFrame:
    """Build a Bloom filter over a column as ONE row
    (words array<long>): a dense bitmap of ``m_bits`` bits stored as
    32-BIT words (32, not 64: word values stay < 2^32, so shifts and
    ``bit_or`` never touch the sign bit — the cross-engine two's-
    complement trap the 64-bit SimHash packing has to work around).

    Spark ships runtime bloom-filter join pruning natively
    (spark.sql.optimizer.runtime.bloomFilter.enabled) — use that for
    ad-hoc joins; THIS one is for a persisted, engine-portable
    membership artifact (decontamination lists, seen-URL sets) that a
    non-Spark consumer can probe with plain SQL.

    Scale shape: k explode'd positions per value → one
    map-side-combined bit_or groupBy over ≤ m_bits/32 word rows → a
    single dense array row (broadcast at probe time). Probing is O(1)
    per value: element_at + shift, no scan of the bitmap.
    """
    nw = m_bits // 32
    c = F.col(col)
    pos = (df.filter(c.isNotNull())
           .select(F.explode(F.array(
               *[_bloom_pos(c, i, m_bits) for i in range(k)])).alias("p")))
    # pyspark's shiftleft() only takes a literal shift amount; the SQL
    # function form accepts a column expression
    word_rows = (pos.select(
        F.floor(F.col("p") / 32).cast("long").alias("w"),
        (F.col("p") % 32).cast("int").alias("b"))
        .selectExpr("w", "cast(shiftleft(1L, b) as long) as v")
        .groupBy("w").agg(F.expr("bit_or(v)").alias("bits")))
    idx = df.sparkSession.range(nw).select(F.col("id").alias("w"))
    return (idx.join(word_rows, "w", "left")
            .select("w", F.coalesce(F.col("bits"), F.lit(0)).alias("bits"))
            .agg(F.array_sort(F.collect_list(
                F.struct("w", "bits"))).alias("e"))
            .select(F.transform(F.col("e"),
                                lambda s: s["bits"]).alias("words")))


def bloom_probe(df: DataFrame, col: str, bloom: DataFrame,
                m_bits: int = 65536, k: int = 4) -> DataFrame:
    """Append ``maybe`` (boolean) to ``df``: true iff ALL k bit
    positions of the value are set — no false negatives, false
    positives at the classic (1−e^{−kn/m})^k rate. The one-row filter
    broadcasts; each probe is k element_at + shift ops."""
    c = F.col(col)
    out = df.crossJoin(F.broadcast(bloom))
    for i in range(k):
        out = out.withColumn(f"_p{i}", _bloom_pos(c, i, m_bits))
    cond = " AND ".join(
        f"((shiftright(element_at(words, cast(_p{i} div 32 as int) + 1), "
        f"cast(_p{i} % 32 as int)) & 1) = 1)" for i in range(k))
    return (out.withColumn("maybe", F.expr(cond))
            .drop("words", *[f"_p{i}" for i in range(k)]))


# ---------------------------------------------------------------------------
# Portable log-bucketed quantile sketch (HDR-histogram style)
# ---------------------------------------------------------------------------

def hdr_quantiles(df: DataFrame, col: str, quantiles: list[float],
                  group_cols: list[str] | None = None,
                  scale: int = 100) -> DataFrame:
    """Quantile estimates from a log-bucketed histogram (the
    HdrHistogram idea: bucket width grows geometrically, so relative
    error is bounded by e^(1/scale) − 1 — 1% at scale=100 — while
    per-group state is a few hundred (bucket, count) rows no matter
    how many values flow in). Spark's native approx_percentile has the
    same role but engine-private internals; like the HLL/CMS/Bloom
    siblings this one is built from ln/floor/exp only, so the SAME
    buckets — and therefore the same estimates — come out of any ANSI
    engine, and the estimate itself is under oracle check.

    bucket(x) = floor(ln(x)·scale); estimate for quantile q = the
    geometric bucket midpoint exp((b+0.5)/scale) of the first bucket
    whose cumulative count reaches q·N. Non-positive values are
    excluded (log domain), mirroring latency/price-style usage.
    Returns group_cols + (q, est).

    Scale shape: one map-side-combined (group, bucket) count groupBy,
    then a per-group cumulative window over ≤ a few hundred bucket
    rows joined against the broadcast quantile list — nothing
    data-sized ever re-shuffles.
    """
    from pyspark.sql import Window as W

    gcols = list(group_cols or [])
    c = F.col(col)
    counts = (df.filter(c > 0)
              .select(*gcols,
                      F.floor(F.log(c.cast("double")) * scale).alias("b"))
              .groupBy(*gcols, "b").agg(F.count(F.lit(1)).alias("n")))
    w = W.partitionBy(*gcols).orderBy("b") if gcols else W.orderBy("b")
    cum = (counts
           .withColumn("cum", F.sum("n").over(
               w.rowsBetween(W.unboundedPreceding, W.currentRow)))
           .withColumn("total", F.sum("n").over(
               w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing))))
    spark = df.sparkSession
    qdf = spark.createDataFrame([(float(q),) for q in quantiles], "q double")
    hit = (cum.crossJoin(F.broadcast(qdf))
           .filter(F.col("cum") >= F.col("q") * F.col("total"))
           .groupBy(*gcols, "q").agg(F.min("b").alias("b")))
    return (hit.select(*gcols, "q",
                       F.round(F.exp((F.col("b") + 0.5) / scale), 6)
                       .alias("est"))
            .orderBy(*gcols, "q"))
