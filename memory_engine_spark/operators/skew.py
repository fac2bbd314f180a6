"""Skew mitigation: salted joins for hot keys.

SURVEY.md §4.2 / build brief: skewed keys are the failure mode of every
shuffle join at 100 TB (one executor gets the hot key's entire
partition). AQE's skew-join splitting (enabled in session.py) handles
sort-merge joins automatically; this utility covers the cases AQE
can't — aggregations over hot keys and broadcast-ineligible joins —
with explicit salting:

- ``salted_join``: replicate the small side R times, salt the big
  side's key uniformly in [0, R), join on (key, salt). Exact same
  result as the unsalted join, but the hot key spreads over R tasks.
- ``two_phase_count``: pre-aggregate on (key, salt) then re-aggregate
  on key — the classic hot-key groupBy fix (partial aggregation already
  does this for algebraic aggs; the explicit form helps for
  collect_set-style aggs where map-side combine doesn't collapse).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(big: DataFrame, small: DataFrame, key: str,
                salt_buckets: int = 8, how: str = "inner") -> DataFrame:
    """Equi-join big⋈small on ``key`` with the hot-key shuffle spread
    over ``salt_buckets`` tasks. Result equals ``big.join(small, key,
    how)`` exactly (verified by tests); cost: small side replicated
    ×salt_buckets (keep it the dimension side).

    Only join types that preserve the BIG side are supported: with the
    small side exploded, a right/full outer join would emit a null-padded
    row per unmatched (key, salt) replica — up to salt_buckets fabricated
    rows per unmatched small row."""
    if how not in ("inner", "left", "left_outer", "left_semi", "left_anti",
                   "semi", "anti"):
        raise ValueError(
            f"salted_join does not support how={how!r}: outer joins that "
            "preserve the (exploded) small side would duplicate unmatched "
            "small-side rows per salt bucket")
    salted_big = big.withColumn(
        "_salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()),
                        F.lit(salt_buckets)).cast("int"))
    exploded_small = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1))))
    out = salted_big.join(exploded_small, [key, "_salt"], how)
    return out.drop("_salt")


def two_phase_count(df: DataFrame, key: str, salt_buckets: int = 8) -> DataFrame:
    """groupBy(key).count() in two phases: (key, salt) partial counts,
    then key totals. Identical result; hot keys never serialize into a
    single reducer."""
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()),
                        F.lit(salt_buckets)).cast("int"))
    partial = salted.groupBy(key, "_salt").agg(F.count(F.lit(1)).alias("_c"))
    return partial.groupBy(key).agg(F.sum("_c").alias("count"))
