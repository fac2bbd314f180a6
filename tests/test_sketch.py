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


def test_bloom_no_false_negatives_and_low_fp(spark):
    from memory_engine_spark.functions.sketch import bloom_build, bloom_probe
    members = spark.range(0, 500).select(F.col("id").alias("v"))
    bloom = bloom_build(members, "v", m_bits=65536, k=4)
    # probe members and 5000 non-members
    probe = spark.range(0, 5500).select(F.col("id").alias("v"))
    out = bloom_probe(probe, "v", bloom, m_bits=65536, k=4)
    res = {r["v"]: r["maybe"] for r in out.collect()}
    # no false negatives: every member reports maybe
    assert all(res[v] for v in range(500))
    # false-positive rate near (1 - e^(-kn/m))^k ≈ 0.08% for these params
    fps = sum(1 for v in range(500, 5500) if res[v])
    assert fps < 50  # << 1% of 5000


def test_bloom_word_array_is_dense_and_32bit(spark):
    from memory_engine_spark.functions.sketch import bloom_build
    bloom = bloom_build(
        spark.range(0, 10).select(F.col("id").alias("v")), "v",
        m_bits=1024, k=2).first()
    words = bloom["words"]
    assert len(words) == 1024 // 32
    assert all(0 <= w < (1 << 32) for w in words)  # sign bit never set
    assert sum(bin(w).count("1") for w in words) <= 20  # ≤ k*n bits set


def test_hdr_quantiles_within_relative_error_bound(spark):
    import math
    from memory_engine_spark.functions.sketch import hdr_quantiles
    # lognormal-ish positive values with a deterministic spread
    df = spark.range(1, 5001).selectExpr(
        "exp(1.0 + (id % 997) / 150.0) as v")
    qs = [0.5, 0.9, 0.99]
    est = {r["q"]: r["est"] for r in
           hdr_quantiles(df, "v", qs, scale=100).collect()}
    exact = df.selectExpr(
        *[f"percentile(v, {q}) as p{i}" for i, q in enumerate(qs)]).first()
    bound = math.exp(1 / 100) - 1 + 0.01  # bucket width + midpoint slack
    for i, q in enumerate(qs):
        rel = abs(est[q] - exact[f"p{i}"]) / exact[f"p{i}"]
        assert rel <= bound, (q, est[q], exact[f"p{i}"], rel)


def test_hdr_quantiles_grouped_and_ignores_nonpositive(spark):
    from memory_engine_spark.functions.sketch import hdr_quantiles
    df = spark.createDataFrame(
        [("a", 10.0), ("a", 20.0), ("a", 30.0), ("a", -5.0), ("a", 0.0),
         ("b", 1000.0)], "g string, v double")
    out = {(r["g"], r["q"]): r["est"] for r in
           hdr_quantiles(df, "v", [0.5], group_cols=["g"]).collect()}
    # median of {10,20,30} lands in 20's bucket; nonpositive excluded
    assert abs(out[("a", 0.5)] - 20.0) / 20.0 < 0.02
    assert abs(out[("b", 0.5)] - 1000.0) / 1000.0 < 0.02


def test_zorder_key_prefix_locality_and_bounds(spark):
    from memory_engine_spark.functions.layout import zorder_key
    import pytest as _pytest
    df = spark.createDataFrame(
        [(x, y) for x in range(0, 64, 8) for y in range(0, 64, 8)],
        "x long, y long")
    out = df.select("x", "y",
                    zorder_key([F.col("x"), F.col("y")], bits=6).alias("z")) \
        .collect()
    zmap = {(r["x"], r["y"]): r["z"] for r in out}
    # interleave correctness: bit i of x lands at position 2i, y at 2i+1
    def ref(x, y):
        z = 0
        for i in range(6):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z
    assert all(zmap[(x, y)] == ref(x, y) for (x, y) in zmap)
    # prefix property: points in the same 32x32 quadrant share the
    # top-2 bits of a 12-bit key
    q00 = [z for (x, y), z in zmap.items() if x < 32 and y < 32]
    q11 = [z for (x, y), z in zmap.items() if x >= 32 and y >= 32]
    assert all(z >> 10 == 0 for z in q00)
    assert all(z >> 10 == 3 for z in q11)
    # clamp: negatives and overflow stay in range
    edge = spark.createDataFrame([(-5, 1 << 40)], "x long, y long") \
        .select(zorder_key([F.col("x"), F.col("y")], bits=6).alias("z")) \
        .first()["z"]
    assert 0 <= edge < (1 << 12)
    with _pytest.raises(ValueError, match="62-bit"):
        zorder_key([F.col("x"), F.col("y")], bits=32)
