"""Isolated per-query profiler for the optimization rounds: run the
named queries() entries (default: the slowest tier) N times through the
noop sink, print per-run walls, and optionally dump
``.explain("formatted")`` to plans/<tag>/<query>_<suffix>.txt.

Usage:
    python tools/profile_query.py [--runs N] [--plans TAG SUFFIX]
                                  [--sf SF_DIR] query [query ...]

Timing methodology matches bench.py exactly (noop write materializer,
min of N). Index builds run untimed first, like the bench.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from memory_engine_spark.session import get_spark


def main() -> None:
    args = sys.argv[1:]
    runs = 3
    plans_tag = None
    suffix = None
    sf_dir = "/root/testdata/sf0.1"
    prep = True
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--runs":
            runs = int(args[i + 1]); i += 2
        elif args[i] == "--plans":
            plans_tag, suffix = args[i + 1], args[i + 2]; i += 3
        elif args[i] == "--sf":
            sf_dir = args[i + 1]; i += 2
        elif args[i] == "--no-prep":
            # skip prepare_indexes: pins the query needs build lazily
            # on its first (cold) run — fine for min-of-N A/Bs
            prep = False; i += 1
        else:
            names.append(args[i]); i += 1

    spark = get_spark("profile-query")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    entrymod.entry(spark).count()  # warmup, like bench.py
    if prep:
        t0 = time.time()
        entrymod.prepare_indexes(spark, sf_dir)
        print(f"# index builds: {time.time() - t0:.1f}s", file=sys.stderr)

    for name in names:
        if name not in qs:
            print(f"{name}: UNKNOWN"); continue
        if plans_tag:
            d = os.path.join("/root/repo/plans", plans_tag)
            os.makedirs(d, exist_ok=True)
            df = qs[name](spark, sf_dir)
            plan = spark._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            with open(os.path.join(d, f"{name}_{suffix}.txt"), "w") as fh:
                fh.write(plan)
        per = []
        for _ in range(runs):
            spark.sparkContext.setJobDescription(name)
            t0 = time.time()
            qs[name](spark, sf_dir).write.mode("overwrite") \
                .format("noop").save()
            per.append(round(time.time() - t0, 3))
        print(f"{name}: min={min(per):.3f} runs={per}")
    spark.stop()


if __name__ == "__main__":
    main()
