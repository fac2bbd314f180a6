"""Skew mitigation: the ONE salting discipline, three spellings.

SURVEY.md §4.2 / build brief: skewed keys are the failure mode of every
shuffle join at 100 TB (one executor gets the hot key's entire
partition). AQE's skew-join splitting (enabled in session.py) handles
sort-merge joins automatically; this module covers the cases AQE
can't — aggregations over hot keys and broadcast-ineligible joins —
and is the unification point the r08 verdict asked for (item 9):
every salted operator in the repo picks its spelling by ONE rule —

  **does the second phase need the partials in key order?**

- NO (algebraic merge: counts, sums, sets): HASH salt —
  ``hash_salt`` / ``two_phase_count`` / ``salted_join``. Uniform
  spread, no coordination; any permutation of partials merges to the
  same result.
- YES (order-sensitive merge: concatenated posting lists, sorted
  fingerprints): RANGE salt — ``range_salt``. Each bucket covers a
  contiguous ascending id interval, so per-bucket partials sorted
  within the bucket concatenate IN BUCKET ORDER into the exact
  globally-sorted whole. Hash salting spreads load equally well but
  interleaves ids across buckets, so partials could only be merged
  by re-sorting everything in one reducer — the memory problem
  salting was meant to remove. (The r08 builder/judge exchange that
  settled this lives in ranking.inverted_index's q204 gate.)

Per-reducer bound either way: ≤ hot-key-volume / salt_buckets rows
per task. Consumers: ranking.inverted_index (range), q146
(hash join + two-phase), dedup hot-line paths (hash).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hash_salt(df: DataFrame, salt_buckets: int = 8,
              salt_col: str = "_salt") -> DataFrame:
    """Uniform row salt in [0, salt_buckets) — the ORDER-DESTROYING
    spelling, for algebraic second phases only (see module
    docstring). Derived from a per-row id, not rand(), so retries
    are deterministic."""
    return df.withColumn(
        salt_col, F.pmod(F.xxhash64(F.monotonically_increasing_id()),
                         F.lit(salt_buckets)).cast("int"))


def range_salt(df: DataFrame, id_col: str, salt_buckets: int,
               bounds: tuple[int, int] | None = None,
               salt_col: str = "_salt") -> DataFrame:
    """ORDER-PRESERVING salt: bucket = floor((id − lo) / width) with
    width = ceil(span / salt_buckets) — the spelling for
    order-sensitive merges (module docstring). Requires an integral
    ``id_col``; raises otherwise (hash-salting cannot preserve merge
    order, so silently falling back would corrupt the consumer's
    fingerprint). ``bounds`` injects known (lo, hi) to skip the
    min/max scan — pass them when the caller already aggregates the
    frame (ranking.inverted_index derives them from the compact doc
    frame rather than the exploded token stream)."""
    dtypes = dict(df.dtypes)
    if dtypes.get(id_col) not in ("tinyint", "smallint", "int", "bigint"):
        raise ValueError(
            f"range salting needs an integral {id_col!r}; got "
            f"{dtypes.get(id_col)!r} (hash-salting cannot preserve "
            "merge order — see skew.py module docstring)")
    if bounds is None:
        lo, hi = df.agg(F.min(id_col), F.max(id_col)).first()
        if lo is None:
            return df.withColumn(salt_col, F.lit(0))
    else:
        lo, hi = bounds
    width = max(1, -(-(int(hi) - int(lo) + 1) // int(salt_buckets)))
    return df.withColumn(
        salt_col,
        F.floor((F.col(id_col) - F.lit(int(lo))) / F.lit(width))
        .cast("int"))


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
    salted_big = hash_salt(big, salt_buckets)
    exploded_small = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1))))
    out = salted_big.join(exploded_small, [key, "_salt"], how)
    return out.drop("_salt")


def two_phase_count(df: DataFrame, key: str, salt_buckets: int = 8) -> DataFrame:
    """groupBy(key).count() in two phases: (key, salt) partial counts,
    then key totals. Identical result; hot keys never serialize into a
    single reducer."""
    salted = hash_salt(df, salt_buckets)
    partial = salted.groupBy(key, "_salt").agg(F.count(F.lit(1)).alias("_c"))
    return partial.groupBy(key).agg(F.sum("_c").alias("count"))
