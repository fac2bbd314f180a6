"""Scale probe for bounded_scc's exhaustive FW-BW peel: does the wall
track GRAPH VOLUME or SCC DIAMETER?

Construction: the antipodal split 10-ring (one SCC, two never-touching
self-certified minima — the q243 shape) plus N chaff nodes, each one
DAG edge into the ring. The chaff is certificate-residual (-1) but the
single pivot lands in the ring (smallest residual id), whose backward
frontier absorbs ALL chaff in one round — so 10x chaff means 10x
per-round join volume at IDENTICAL round count. The peel's claim is
rounds = SCC-diameter / 2^s with per-round volume delegated to the
shuffle: at local[32] the wall should stay ~flat (dispatch-bound)
while volume grows 10x, and on a real cluster the same plan scales by
adding executors, not rounds.

Usage: python tools/peel_scale_probe.py [N_base]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from memory_engine_spark.operators import graph
from memory_engine_spark.session import get_spark


def main() -> None:
    n_base = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    spark = get_spark("peel-scale-probe")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    ring = [0, 7, 5, 8, 6, 1, 9, 3, 2, 4]        # 0/1 antipodal
    cyc = [(ring[i], ring[(i + 1) % 10]) for i in range(10)]
    ring_df = spark.createDataFrame(cyc, "from_id long, to_id long")
    for factor in (1, 10):
        n = n_base * factor
        chaff = (spark.range(n)
                 .select((F.col("id") + 1000).alias("from_id"),
                         (F.col("id") % 10).alias("_r")))
        ring_map = spark.createDataFrame(
            [(i, ring[i]) for i in range(10)], "_r long, to_id long")
        edges = (ring_df.unionByName(
            chaff.join(F.broadcast(ring_map), "_r")
            .select("from_id", "to_id")))
        # warm + measure
        for tag in ("warm", "run1", "run2"):
            t0 = time.time()
            lab = graph.bounded_scc(edges, n_iter=3, exhaustive=True,
                                    max_pivots=1, peel_shortcuts=3)
            rows = lab.groupBy("scc_id").count().collect()
            wall = time.time() - t0
            by = {r["scc_id"]: r["count"] for r in rows}
            assert by.get(0) == 10, f"ring not healed: {by}"
            assert by.get(-1) == n, f"chaff not residual: {by}"
            if tag != "warm":
                print(f"N={n:>8,} ({factor}x) {tag}: "
                      f"{wall:.2f}s  |V|={n + 10:,} |E|={n + 10:,}")


if __name__ == "__main__":
    main()
