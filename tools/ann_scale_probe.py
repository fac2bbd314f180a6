"""ANN index-build scale probe (r11 verdict item 5): the dedup path
has its 100x MinHash probe; this is the matching evidence for the ANN
story's OFFLINE half — IVF build (first-k seed + deterministic Lloyd
refinement, the `kmeans_refine` path) and the online probe
(`topk_ivf`) — at 1x/10x/100x replication of the sf0.1 embeddings.

Construction mirrors the MinHash probe's adversarial shape: every
original vector becomes a factor-sized CLONE CLUSTER (tiny
deterministic single-dimension perturbation, cosine ~1, shifted ids),
the skew a dedup-heavy corpus feeds an ANN index — clone clusters land
whole inside one IVF cell, so cell sizes scale by the clone factor
while the cell COUNT stays nlist.

What the numbers must show (SCALING.md r12 section):
- build s/Mrow FLAT from 10x to 100x: the build is one broadcast
  assignment (max_by, no window) + |V|*dim BIGINT map-side-combined
  sums per Lloyd round — linear in rows, no pairwise term;
- probe wall linear in PROBED-cell volume only (nprobe/nlist of the
  data), not in N;
- cell balance (max/mean) roughly factor-invariant: clones multiply
  every cell uniformly, so skew comes from the base distribution,
  not the replication.

In-probe correctness asserts (not just timings):
- assigned row count == N at every factor (no rows dropped),
- exactly nlist centroids, all components finite,
- recall@10 vs brute force >= 0.7 averaged over the query panel at
  every factor (nprobe=8 of nlist=64; the query's own clone cluster
  dominates its cell, so missing it would mean a desynced build).

Usage: python tools/ann_scale_probe.py [factors...]  (default 1 10 100)
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from memory_engine_spark.operators import similarity
from memory_engine_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.1"
NLIST, NPROBE, K, N_QUERIES, LLOYD_ROUNDS = 64, 8, 10, 8, 2


def clone_cluster(base, factor: int):
    """vec_id -> factor near-dup clones: clone c perturbs dimension
    (vec_id mod 64) by c * 1e-4 — cosine stays ~1, so each original
    becomes one clone cluster (the adversarial corpus shape).

    Id scheme is clone*10000 + vec_id (NOT vec_id*factor + clone):
    build_ivf_flat seeds from the nlist LOWEST ids, so the clone-major
    layout would make every seed a clone of vector 0 at factor >= 64
    — a seeding degeneracy that varies WITH the factor and would
    conflate seed quality with the scale question. Base-major ids keep
    the seed set = {clone 0 of vectors 0..63} identical at every
    factor, so the only thing the sweep varies is row volume."""
    clones = base.crossJoin(F.broadcast(
        base.sparkSession.range(factor).select(F.col("id").alias("clone"))))
    return clones.select(
        (F.col("clone") * 10000 + F.col("vec_id")).alias("vec_id"),
        F.transform(
            F.col("embedding").cast("array<double>"),
            lambda x, i: x + F.when(
                i == (F.col("vec_id") % 64).cast("int"),
                F.col("clone").cast("double") * 1e-4).otherwise(0.0)
        ).alias("embedding"),
    )


def main() -> None:
    factors = [int(a) for a in sys.argv[1:]] or [1, 10, 100]
    spark = get_spark("ann-scale-probe")
    spark.conf.set("spark.sql.shuffle.partitions", "64")

    base = (spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
            .select("vec_id", "embedding"))
    # the clone-id scheme is clone*10000 + vec_id: a base corpus with
    # vec_id >= 10000 would silently collide clone ids and corrupt the
    # recall/balance numbers with no assertion firing (r12 ADVICE)
    max_base_id = base.agg(F.max("vec_id")).first()[0]
    assert max_base_id < 10000, (
        f"base max(vec_id)={max_base_id} >= 10000: clone-id stride "
        f"collides; raise the stride in clone_cluster")
    queries = [(r["vec_id"], list(r["embedding"])) for r in
               base.orderBy("vec_id").limit(N_QUERIES).collect()]

    for factor in factors:
        n = base.count() * factor
        # single-file parquet feeder -> spread BEFORE per-row work
        vecs = clone_cluster(base, factor).repartition(64) \
            .persist()
        assert vecs.count() == n

        t0 = time.time()
        cent0, _ = similarity.build_ivf_flat(
            vecs, nlist=NLIST, id_col="vec_id", vec_col="embedding")
        cent, assigned = similarity.kmeans_refine(
            vecs, cent0, n_rounds=LLOYD_ROUNDS,
            id_col="vec_id", vec_col="embedding")
        assigned = assigned.persist()
        n_assigned = assigned.count()          # materialize the codes
        build_s = time.time() - t0

        assert n_assigned == n, (n_assigned, n)
        crows = cent.collect()
        assert len(crows) == NLIST
        assert all(all(c == c and abs(c) < 1e6 for c in r["centroid"])
                   for r in crows), "non-finite centroid component"

        sizes = [r["sz"] for r in
                 assigned.groupBy("cell").agg(F.count("*").alias("sz"))
                 .collect()]
        balance = {"cells": len(sizes), "max": max(sizes),
                   "mean": round(sum(sizes) / len(sizes), 1),
                   "max_over_mean":
                       round(max(sizes) / (sum(sizes) / len(sizes)), 2)}

        t1 = time.time()
        hits = []
        for _qid, qv in queries:
            ivf = [r["vec_id"] for r in similarity.topk_ivf(
                assigned, cent, qv, k=K, nprobe=NPROBE,
                id_col="vec_id", vec_col="embedding").collect()]
            hits.append(ivf)
        probe_s = time.time() - t1

        recalls = []
        for (_qid, qv), ivf in zip(queries, hits):
            brute = [r["vec_id"] for r in similarity.topk_brute(
                vecs, qv, k=K, id_col="vec_id",
                vec_col="embedding").collect()]
            recalls.append(len(set(ivf) & set(brute)) / K)
        recall = sum(recalls) / len(recalls)
        assert recall >= 0.7, f"recall@{K} collapsed: {recall}"

        print(json.dumps({
            "factor": factor, "rows": n,
            "build_s": round(build_s, 1),
            "build_s_per_mrow": round(build_s / (n / 1e6), 1),
            "probe_s_total": round(probe_s, 2),
            "probe_s_per_query": round(probe_s / len(queries), 3),
            "recall_at_10": round(recall, 3),
            "cell_balance": balance,
        }), flush=True)
        vecs.unpersist()
        assigned.unpersist()


if __name__ == "__main__":
    main()
