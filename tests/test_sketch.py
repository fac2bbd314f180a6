"""Portable-HLL sketch tests: accuracy envelope, partition
invariance, and group handling."""

from pyspark.sql import functions as F

from memory_engine_spark.functions import sketch


def test_hll_accuracy_and_partition_invariance(spark):
    n = 5000
    df = spark.range(n).select((F.col("id") % 3).alias("g"),
                               (F.col("id")).alias("v"))
    est = {r["g"]: r["hll_estimate"]
           for r in sketch.hll_count_distinct(df, "v", ["g"], p=8).collect()}
    exact = {r["g"]: r["n"] for r in
             df.groupBy("g").agg(F.countDistinct("v").alias("n")).collect()}
    for g in exact:
        rel = abs(est[g] - exact[g]) / exact[g]
        # 256 registers -> ~1.04/sqrt(256) = 6.5% std error; 3 sigma
        assert rel < 0.20, f"group {g}: rel err {rel:.3f}"
    # repartitioning must not change a single register -> same estimate
    est2 = {r["g"]: r["hll_estimate"]
            for r in sketch.hll_count_distinct(
                df.repartition(7), "v", ["g"], p=8).collect()}
    assert est == est2


def test_hll_small_range_linear_counting(spark):
    # tiny cardinality -> linear-counting branch; must stay close
    df = spark.range(40).select(F.col("id").alias("v"))
    [row] = sketch.hll_count_distinct(df, "v", p=8).collect()
    assert abs(row["hll_estimate"] - 40) / 40 < 0.15


def test_hll_duplicates_ignored(spark):
    # duplicates must not move the estimate at all
    base = spark.range(1000).select(F.col("id").alias("v"))
    dup = base.union(base).union(base)
    [a] = sketch.hll_count_distinct(base, "v", p=8).collect()
    [b] = sketch.hll_count_distinct(dup, "v", p=8).collect()
    assert a["hll_estimate"] == b["hll_estimate"]


def test_hll_nulls_ignored(spark):
    # count-distinct semantics: NULLs contribute nothing to the estimate
    base = spark.range(500).select(F.col("id").alias("v"))
    with_nulls = base.union(
        spark.range(200).select(F.lit(None).cast("long").alias("v")))
    [a] = sketch.hll_count_distinct(base, "v", p=8).collect()
    [b] = sketch.hll_count_distinct(with_nulls, "v", p=8).collect()
    assert a["hll_estimate"] == b["hll_estimate"]
