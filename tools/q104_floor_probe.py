"""Round-10 bounded experiment on the q104 diameter floor (r9 verdict
item 4): the 2-sweep BFS is dispatch-bound — each hop is one Spark JOB
(~0.3 s of scheduler+py4j latency at ANY frontier size), so 2 sweeps ×
~8 hops ≈ the measured ~4.7 s median. The candidate fix keeps the plan
per hop identical but chains all ``max_depth`` hops as LAZY tracked
localCheckpoints and derives every per-hop count as DATA (a union of
12 one-row aggregates over the checkpointed hop frames): ONE action
materializes the whole sweep as ONE job whose stages pipeline in the
DAG scheduler, replacing ~8 job dispatches with ~1.

Run:  python tools/q104_floor_probe.py [sf_dir]
Prints per-variant wall times (3 runs each) + per-sweep hop/job
counts. The verdict's closing criterion either way: rounds before /
after + 3-run spread, or a documented negative.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from memory_engine_spark.checkpoint import lc_free, lc_tracked  # noqa: E402
from memory_engine_spark.session import get_spark  # noqa: E402


def onejob_sweep(adj, start_id: str, max_depth: int):
    """One-job variant of graph._bfs_sweep: identical per-hop plans
    (shuffle_hash hints, last-two-frontier anti-join), but all hops
    are lazy checkpoints and the counts come back as one 12-row
    collect."""
    spark = adj.sparkSession
    frontier, ids0 = lc_tracked(
        spark.createDataFrame([(start_id,)], "node_id string"))
    hops = [(frontier, ids0)]
    counts = [frontier.agg(F.lit(0).alias("d"),
                           F.count(F.lit(1)).alias("n"))]
    prev = None
    for depth in range(1, max_depth + 1):
        seen = frontier if prev is None else frontier.unionByName(prev)
        f = (frontier.select(F.col("node_id").alias("from_id"))
             .hint("shuffle_hash"))
        nxt, n_ids = lc_tracked(
            adj.join(f, "from_id")
            .select(F.col("to_id").alias("node_id")).distinct()
            .join(seen.hint("shuffle_hash"), "node_id", "left_anti"),
            eager=False)
        counts.append(nxt.agg(F.lit(depth).alias("d"),
                              F.count(F.lit(1)).alias("n")))
        hops.append((nxt, n_ids))
        prev, frontier = frontier, nxt
    allc = counts[0]
    for c in counts[1:]:
        allc = allc.unionByName(c)
    rows = {r["d"]: r["n"] for r in allc.collect()}   # THE one job
    depth_reached = max((d for d, n in rows.items() if n > 0 and d > 0),
                        default=0)
    n_reached = sum(n for d, n in rows.items() if d <= depth_reached)
    last, last_ids = hops[depth_reached]
    dead = set()
    for i, (_, ids) in enumerate(hops):
        if i != depth_reached:
            dead |= ids
    lc_free(spark, dead)
    return last, last_ids, depth_reached, n_reached


def onejob_diameter(adj, start_id: str, max_depth: int):
    spark = adj.sparkSession
    k_shuf = "spark.sql.shuffle.partitions"
    k_aqe = "spark.sql.adaptive.enabled"
    k_excl = "spark.sql.optimizer.excludedRules"
    old_shuf = spark.conf.get(k_shuf)
    old_aqe = spark.conf.get(k_aqe)
    old_excl = spark.conf.get(k_excl, None)
    rule = ("org.apache.spark.sql.catalyst.optimizer."
            "PushDownLeftSemiAntiJoin")
    try:
        spark.conf.set(k_shuf, str(max(4, int(old_shuf) // 8)))
        spark.conf.set(k_aqe, "false")
        spark.conf.set(k_excl, rule if not old_excl
                       else old_excl + "," + rule)
        last1, l1, _, _ = onejob_sweep(adj, start_id, max_depth)
        far = last1.orderBy(F.col("node_id").asc()).limit(1).collect()
        far_id = far[0]["node_id"] if far else start_id
        lc_free(spark, l1)
        _, l2, ecc, n_reached = onejob_sweep(adj, far_id, max_depth)
        lc_free(spark, l2)
        return far_id, ecc, n_reached
    finally:
        spark.conf.set(k_shuf, old_shuf)
        spark.conf.set(k_aqe, old_aqe)
        if old_excl is not None:
            spark.conf.set(k_excl, old_excl)
        else:
            spark.conf.unset(k_excl)


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark()
    sc = spark.sparkContext
    import __spark_entry__ as m
    adj = m._sym_adj(spark, sf)
    from memory_engine_spark.operators import graph

    # warm both paths once
    graph.diameter_estimate(None, "c_1", max_depth=12,
                            prebuilt_adj=adj).collect()
    onejob_diameter(adj, "c_1", 12)

    tracker = sc.statusTracker()

    def jobs_run(fn):
        before = len(tracker.getJobIdsForGroup() or [])
        sc.setJobGroup("probe", "probe")
        fn()
        after = len(tracker.getJobIdsForGroup("probe") or [])
        sc.setJobGroup(None, None)
        return after

    base = m.q104_diameter  # noqa: F841  (reference impl, via entry)

    for name, fn in [
        ("per-hop-jobs (current)",
         lambda: graph.diameter_estimate(
             None, "c_1", max_depth=12, prebuilt_adj=adj).collect()),
        ("one-job-per-sweep (candidate)",
         lambda: onejob_diameter(adj, "c_1", 12)),
    ]:
        times = []
        for _ in range(3):
            t0 = time.time()
            fn()
            times.append(time.time() - t0)
        nj = jobs_run(fn)
        print(f"{name}: runs={[round(t, 2) for t in times]} "
              f"median={sorted(times)[1]:.2f}s jobs={nj}")

    # parity check
    ref = graph.diameter_estimate(None, "c_1", max_depth=12,
                                  prebuilt_adj=adj).collect()[0]
    got = onejob_diameter(adj, "c_1", 12)
    print("parity:", (ref["sweep2_start"], ref["diameter_lb"],
                      ref["n_reached"]) == got, ref, got)


if __name__ == "__main__":
    main()
