"""q79 triangle-census stage decomposition (r08 verdict item 2).

The r8 artifacts showed q79 swinging 5.3-9.6 s run-to-run at sf0.1 —
the worst variance in the suite — with the plan itself already audited
as right (equi-join pair build, ReusedExchange-shared distinct,
lowest-degree wedge orientation; explicit persist measured SLOWER).
Before calling any number a floor, this probe splits the pipeline at
its materialization points and times each span separately, plus three
consecutive full runs, so the variance can be attributed to a STAGE
rather than to the query:

  s1  lineitem scan -> distinct (ok, pk)            [1 shuffle]
  s2  + co-occurrence self-join -> distinct pairs   [+1 join, 1 shuffle]
  s3  + canon/degree/orient build (persist point)   [+2 joins]
  s4  full triangle_count from the persisted edges  [wedge+closure]
  full three consecutive complete q79 runs

Each span is CUMULATIVE from the parquet scan (Spark has no way to
time a middle stage in isolation without materializing its input,
which is itself the persist-is-slower result from r8) — so stage cost
is the DELTA between consecutive spans, and the full-run triple is the
variance envelope. Usage:

    python tools/q79_stages.py [sf_dir] [n_full_runs]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from memory_engine_spark.operators import graph
from memory_engine_spark.session import get_spark


def spans(spark, sf_dir: str) -> dict[str, float]:
    t = entrymod._t(spark, sf_dir)
    out: dict[str, float] = {}

    t0 = time.time()
    li = (t["lineitem"]
          .select(F.col("l_orderkey").alias("ok"),
                  F.col("l_partkey").alias("pk")).distinct())
    li.count()
    out["s1_li_distinct"] = round(time.time() - t0, 3)

    t0 = time.time()
    a, b = li.alias("a"), li.alias("b")
    pairs = (a.join(b, (F.col("a.ok") == F.col("b.ok"))
                    & (F.col("a.pk") < F.col("b.pk")))
             .select(F.col("a.pk").alias("from_id"),
                     F.col("b.pk").alias("to_id"))
             .distinct())
    pairs.count()
    out["s2_pairs"] = round(time.time() - t0, 3)

    t0 = time.time()
    canon = (pairs
             .select(F.least("from_id", "to_id").alias("u"),
                     F.greatest("from_id", "to_id").alias("v"))
             .filter(F.col("u") != F.col("v"))
             .distinct())
    deg = (graph.degrees(canon.select(F.col("u").alias("from_id"),
                                      F.col("v").alias("to_id")))
           .select("node_id", "degree"))
    ed = (canon
          .join(deg.select(F.col("node_id").alias("u"),
                           F.col("degree").alias("du")), "u")
          .join(deg.select(F.col("node_id").alias("v"),
                           F.col("degree").alias("dv")), "v"))
    lower_first = (F.col("du") < F.col("dv")) | \
                  ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v")))
    oriented = ed.select(
        F.when(lower_first, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(lower_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
        F.when(lower_first, F.col("dv")).otherwise(F.col("du")).alias("ddeg"),
    )
    oriented.count()
    out["s3_oriented"] = round(time.time() - t0, 3)

    t0 = time.time()
    graph.triangle_count(pairs).collect()
    out["s4_full_triangle_count"] = round(time.time() - t0, 3)
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else \
        os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_full = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark()
    q79 = entrymod.queries()["q79_triangles"]

    # warm the table cache / codegen the way bench.py's loop does
    q79(spark, sf_dir).collect()

    rec: dict = {"sf_dir": sf_dir}
    for trial in range(2):
        rec[f"spans_trial{trial}"] = spans(spark, sf_dir)
    rec["full_runs"] = []
    for _ in range(n_full):
        t0 = time.time()
        q79(spark, sf_dir).collect()
        rec["full_runs"].append(round(time.time() - t0, 3))
    mn, mx = min(rec["full_runs"]), max(rec["full_runs"])
    rec["full_spread_pct"] = round(100 * (mx - mn) / mn, 1)
    print(json.dumps(rec, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
