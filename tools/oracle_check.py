"""Self-check harness mimicking the driver's t2 gate: run each
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB at the
given SF, compare row count, column names, and order-insensitive values.

Usage: python tools/oracle_check.py [--exact] [--json OUT] [sf_dir] [query ...]

``--exact`` compares canonical value strings BYTE-FOR-BYTE: floats use
their full shortest ``repr`` (no 9-dp tolerance), so a single-ulp
engine disagreement in any value fails the query. This predicts the
driver's hash gate, which the tolerant default cannot (the r04 q86
lesson: local 9-dp-tolerant green, driver hash red). ``--json OUT``
writes a per-query result artifact (e.g. SELFCHECK_r5.json).
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb

import __spark_entry__ as entrymod
from memory_engine_spark.session import get_spark

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

EXACT = False

# The byte-exact contract is version-pinned (REGISTRY.md): IEEE
# summation order, percentile_approx internals, and xxhash64 seeds are
# Spark-internal behaviors the oracles deliberately replay. Certifying
# under a different major.minor would stamp a green artifact that says
# nothing about the frozen registry — refuse instead (exit 3, distinct
# from a parity failure's exit 1).
PINNED_SPARK = "4.1"


def check_version(spark, allow_drift: bool) -> bool:
    mm = ".".join(spark.version.split(".")[:2])
    if mm == PINNED_SPARK:
        return False
    msg = (f"Spark {spark.version} != pinned {PINNED_SPARK}.x "
           f"(REGISTRY.md) — the byte-exact contract is not "
           f"certified under this version")
    if not allow_drift:
        print(f"REFUSED: {msg}; pass --allow-version-drift to run "
              f"anyway for migration triage")
        sys.exit(3)
    print(f"WARNING: {msg}; running with version_drift=true")
    return True


def canon(val):
    if val is None:
        return "NULL"
    if isinstance(val, float):
        if val != val:
            return "NaN"
        if val == int(val) and abs(val) < 1e15:
            return str(int(val))
        return repr(val) if EXACT else repr(round(val, 9))
    if isinstance(val, bool):
        return str(int(val))
    return str(val)


def rows_key(columns, rows):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted("|".join(canon(r[i]) for i in order) for r in rows)


def main():
    global EXACT
    argv = sys.argv[1:]
    json_out = None
    if "--exact" in argv:
        EXACT = True
        argv.remove("--exact")
    allow_drift = "--allow-version-drift" in argv
    if allow_drift:
        argv.remove("--allow-version-drift")
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        del argv[i:i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    spark = get_spark("oracle-check")
    drifted = check_version(spark, allow_drift)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    if only:
        # Prefix selection ("q172" → q172_robots_gate); an argument
        # matching nothing is a HARD error — a silently-empty filter
        # once turned targeted checks into vacuous ALL MATCH runs.
        selected = {n for n in qs
                    if any(n == o or n.startswith(o) for o in only)}
        unmatched = [o for o in only
                     if not any(n == o or n.startswith(o) for n in qs)]
        if unmatched:
            print(f"ERROR: no query matches {unmatched}")
            sys.exit(2)
        only = selected
    failures = []
    results = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            failures.append(name)
            results[name] = {"match": False, "err": f"spark: {e}"[:300]}
            continue
        if name not in oracles:
            print(f"ok*   {name}: rows-only ({len(srows)} rows, "
                  f"{time.time()-t0:.1f}s, no oracle)")
            results[name] = {"match": True, "rows": len(srows),
                             "oracle": False,
                             "secs": round(time.time() - t0, 2)}
            continue
        try:
            orel = con.execute(oracles[name])
            ocols = [d[0] for d in orel.description]
            orows = orel.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            failures.append(name)
            results[name] = {"match": False, "err": f"duckdb: {e}"[:300]}
            continue
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} oracle={len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"columns spark={sorted(scols)} oracle={sorted(ocols)}")
        if not problems:
            sk = rows_key(scols, [tuple(r) for r in srows])
            ok = rows_key(ocols, orows)
            if sk != ok:
                diff = [(a, b) for a, b in zip(sk, ok) if a != b][:3]
                extra_s = [x for x in sk if x not in set(ok)][:3]
                extra_o = [x for x in ok if x not in set(sk)][:3]
                problems.append(f"values differ; first diffs={diff} "
                                f"spark-only={extra_s} oracle-only={extra_o}")
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)}")
            failures.append(name)
            results[name] = {"match": False,
                             "err": "; ".join(problems)[:300]}
        else:
            print(f"ok    {name}: {len(srows)} rows match ({time.time()-t0:.1f}s)")
            results[name] = {"match": True, "rows": len(srows),
                             "oracle": True,
                             "secs": round(time.time() - t0, 2)}

    print()
    if json_out:
        n_ok = sum(1 for r in results.values() if r["match"])
        with open(json_out, "w") as f:
            json.dump({"mode": "exact" if EXACT else "tolerant",
                       "sf_dir": sf_dir, "n_queries": len(results),
                       "n_match": n_ok, "spark_version": spark.version,
                       "version_drift": drifted,
                       "queries": results}, f, indent=1,
                      sort_keys=True)
        print(f"wrote {json_out} ({n_ok}/{len(results)} match)")
    if failures:
        print(f"{len(failures)} FAILURES: {failures}")
        sys.exit(1)
    print("ALL MATCH")


if __name__ == "__main__":
    main()
