"""Mechanical plan audit over the whole registry: build every
`queries()` entry's DataFrame at the given SF and scan its PHYSICAL
plan for the anti-patterns this repo bans, plus record the shuffle
count as a tracked metric.

Flags:
- ``CartesianProduct`` — a non-broadcast cartesian join. Never OK at
  scale; tiny scalar cross-joins compile to BroadcastNestedLoopJoin,
  which is fine and not flagged.
- ``BatchEvalPython`` — a ROW-AT-A-TIME Python UDF in the plan. The
  repo's contract is Arrow everywhere (``ArrowEvalPython`` /
  ``MapInPandas`` / ``FlatMapGroupsInPandas`` are the allowed Python
  boundaries).

Recorded, not flagged:
- ``n_exchanges`` — count of Exchange operators (shuffles) per query,
  so a future change that silently doubles a query's shuffle count
  shows up as an artifact diff.

Queries that materialize internally (iterative graph/stream ops)
execute real jobs during plan BUILD; the audit still only inspects
the returned frame's plan. Usage:

    python tools/plan_audit.py [sf_dir] [out.json]
"""

from __future__ import annotations

import json
import re
import sys
import time

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod
from memory_engine_spark.session import get_spark

# Whitelist: query -> reason a flagged pattern is legitimate THERE.
# Keep this SHORT and justified; an empty dict is the goal state.
WHITELIST: dict[str, str] = {}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "PLAN_AUDIT.json"
    spark = get_spark("plan-audit")
    results: dict = {}
    flagged: list = []
    for name, fn in entrymod.queries().items():
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # noqa: BLE001 — audit must not abort
            results[name] = {"error": str(exc)[:200]}
            flagged.append(name)
            continue
        cartesian = plan.count("CartesianProduct")
        row_udf = plan.count("BatchEvalPython")
        n_exchanges = len(re.findall(r"\bExchange\b", plan))
        entry = {"n_exchanges": n_exchanges,
                 "build_secs": round(time.time() - t0, 2)}
        problems = []
        if cartesian:
            problems.append(f"CartesianProduct x{cartesian}")
        if row_udf:
            problems.append(f"BatchEvalPython (row-at-a-time UDF) "
                            f"x{row_udf}")
        if problems and name not in WHITELIST:
            entry["problems"] = problems
            flagged.append(name)
            print(f"FLAG  {name}: {'; '.join(problems)}")
        elif problems:
            entry["whitelisted"] = WHITELIST[name]
        results[name] = entry
    with open(out_path, "w") as fh:
        json.dump({"sf_dir": sf_dir, "n_queries": len(results),
                   "n_flagged": len(flagged), "flagged": flagged,
                   "queries": results}, fh, indent=0, sort_keys=True)
    print(f"wrote {out_path}: {len(results)} plans, "
          f"{len(flagged)} flagged")
    sys.exit(1 if flagged else 0)


if __name__ == "__main__":
    main()
