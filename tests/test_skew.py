"""Salted-join / two-phase-count result parity with unsalted twins."""

from __future__ import annotations

from pyspark.sql import functions as F

from memory_engine_spark.operators.skew import salted_join, two_phase_count


def test_salted_join_parity(spark):
    # 90% of the big side is one hot key
    big = spark.createDataFrame(
        [(i, "hot" if i % 10 else f"k{i}") for i in range(1000)],
        "id long, key string")
    small = spark.createDataFrame(
        [("hot", "H"), ("k10", "A"), ("k20", "B"), ("missing", "Z")],
        "key string, val string")
    salted = salted_join(big, small, "key", salt_buckets=4)
    plain = big.join(small, "key")
    assert salted.count() == plain.count()
    assert salted.exceptAll(plain).isEmpty()
    assert plain.exceptAll(salted).isEmpty()

    left = salted_join(big, small, "key", salt_buckets=4, how="left")
    plain_left = big.join(small, "key", "left")
    assert left.count() == plain_left.count() == 1000


def test_salted_join_spreads_hot_key(spark):
    big = spark.createDataFrame([(i, "hot") for i in range(100)], "id long, key string")
    small = spark.createDataFrame([("hot", 1)], "key string, v int")
    out = salted_join(big, small, "key", salt_buckets=8)
    assert out.count() == 100


def test_two_phase_count_parity(spark):
    df = spark.createDataFrame(
        [( "hot" if i % 5 else f"k{i}",) for i in range(500)], "key string")
    got = {r["key"]: r["count"] for r in two_phase_count(df, "key").collect()}
    expect = {r["key"]: r["count"] for r in df.groupBy("key").count().collect()}
    assert got == expect


def test_engine_explain_plan(spark):
    from memory_engine_spark.engine import MemoryEngine
    from memory_engine_spark.plans.query_spec import QuerySpec
    from memory_engine_spark.session import EngineSession

    s = EngineSession(spark)
    s.register("nodes", spark.createDataFrame([("a", 1)], "node_id string, v int"))
    eng = MemoryEngine(s)
    resp = eng.query(QuerySpec("nodes").filter("v", "gt", 0), use_cache=False,
                     explain=True)
    assert any("Filter" in step or "Scan" in step for step in resp.explanation)


def test_salted_join_rejects_small_side_preserving_outer(spark):
    import pytest

    from memory_engine_spark.operators.skew import salted_join

    big = spark.createDataFrame([("k", 1)], "key string, v int")
    small = spark.createDataFrame([("k", 2), ("m", 3)], "key string, w int")
    for how in ("right", "full", "full_outer", "right_outer"):
        with pytest.raises(ValueError):
            salted_join(big, small, "key", how=how)
    # left join stays supported and exact
    out = salted_join(big, small, "key", how="left")
    assert out.count() == 1


def test_inverted_index_salted_equals_unsalted(spark):
    """The round-8 skew fix: range-salted two-pass posting assembly
    must be HASH-IDENTICAL to the one-pass plan — df, cf, and the
    content-addressed postings_md5 — on a Zipf-skewed corpus where
    one term ('the') carries ~30% of all tokens, including with the
    hot-only salting gate and with non-zero-based, gappy doc ids."""
    from memory_engine_spark.operators.ranking import inverted_index

    rows = []
    for i in range(400):
        # gappy, non-zero-based ids; 'the' in every doc (often twice),
        # per-doc unique terms, and a mid-frequency band.
        did = 1000 + i * 3
        toks = ["the", f"w{i % 7}", f"uniq{i}"]
        if i % 2:
            toks += ["the", "mid"]
        rows.append((did, " ".join(toks)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    base = {r["term"]: (r["df"], r["cf"], r["postings_md5"])
            for r in inverted_index(docs).collect()}
    for kwargs in ({"salt_buckets": 8},
                   {"salt_buckets": 8, "hot_cf": 100},
                   {"salt_buckets": 3, "hot_cf": 5}):
        got = {r["term"]: (r["df"], r["cf"], r["postings_md5"])
               for r in inverted_index(docs, **kwargs).collect()}
        assert got == base, kwargs


def test_inverted_index_rejects_nonintegral_id(spark):
    import pytest

    from memory_engine_spark.operators.ranking import inverted_index

    docs = spark.createDataFrame([("a", "x y")], "doc_id string, text string")
    with pytest.raises(ValueError, match="integral"):
        inverted_index(docs, salt_buckets=4)
