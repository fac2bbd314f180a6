"""Connected components + clustering patterns.

Reference uses: subgraph overlap-merge in QA
(/root/reference/memory_core/synthesis/question_answering.py:433-471),
clustering patterns = dense neighbor groups with density =
internal/possible edges (/root/reference/memory_core/synthesis/
insight_discovery.py:247-287,590-645), similarity groups (:429-487).

Connected components via min-label propagation with a pointer-jumping
shortcut each round (labels chase their own label's label — the
path-doubling idea behind HashToMin / large-star, Kiveris et al.,
"Connected Components in MapReduce and Beyond"): a round is an edge
join + a label join + groupBy mins, and label distance to the component
minimum roughly halves per round → O(log diameter) rounds instead of
O(diameter). No GraphFrames dependency.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from memory_engine_spark.checkpoint import lc as _lc
from memory_engine_spark.checkpoint import lc_lazy as _lc_lazy


def connected_components(edges: DataFrame, max_iter: int = 20) -> DataFrame:
    """(node_id, component) where component = min node id reachable.
    Undirected; isolated nodes absent (join with your node table after).
    Each round: (1) propagate labels across edges, (2) pointer-jump —
    shortcut every label through its own current label (component ids
    are node ids, so the lookup is a self-join on the labeling). The
    jump makes convergence O(log diameter); every frame is
    localCheckpointed so plans stay O(1) per round.
    """
    sym = edges.select("from_id", "to_id").unionByName(
        edges.select(F.col("to_id").alias("from_id"),
                     F.col("from_id").alias("to_id"))).distinct().persist()
    labels = (sym.groupBy(F.col("from_id").alias("node_id"))
              .agg(F.least(F.min("to_id"), F.first("from_id")).alias("component"))
              .transform(_lc_lazy))

    def signature(lbl) -> int:
        # order-independent fingerprint of the full labeling — one cheap
        # aggregate per round instead of a join + isEmpty convergence
        # check. This collect is also what MATERIALIZES the round's
        # LAZY label checkpoint (r16, guide §1.2): the eager
        # per-round checkpoint action was redundant with it — the
        # blocks land during this aggregate, the next round's joins
        # read them, and the action count per round drops 2 → 1.
        return lbl.agg(
            F.sum(F.xxhash64("node_id", "component").cast("decimal(38,0)"))
            .alias("s")).first()["s"]

    prev_sig = signature(labels)
    for rnd in range(max_iter):
        prop = (
            sym.join(labels, sym.from_id == labels.node_id)
            .select(F.col("to_id").alias("node_id"), "component")
            .unionByName(labels)
            .groupBy("node_id").agg(F.min("component").alias("component"))
        )
        if rnd >= 2:
            # Pointer jump (path doubling): component ids are node ids,
            # so resolving each label through the labeling shortcuts
            # chains. Engaged only from round 3 — short-diameter graphs
            # (the common similarity-component case) converge before
            # paying the extra join; long chains then halve per round.
            lbl_of_lbl = prop.select(F.col("node_id").alias("component"),
                                     F.col("component").alias("_cc"))
            prop = (prop.join(lbl_of_lbl, "component", "left")
                    .select("node_id",
                            F.least(F.col("component"),
                                    F.coalesce(F.col("_cc"), F.col("component")))
                            .alias("component")))
        labels = prop.transform(_lc_lazy)
        sig = signature(labels)
        if sig == prev_sig:
            break
        prev_sig = sig
    sym.unpersist()
    return labels


def cluster_density(edges: DataFrame, labels: DataFrame) -> DataFrame:
    """Density per component: internal_edges / possible_edges where
    possible = n·(n−1)/2 (insight_discovery.py:247-287). Returns
    (component, n_nodes, n_edges, density)."""
    sizes = labels.groupBy("component").agg(F.count(F.lit(1)).alias("n_nodes"))
    e = (edges.select("from_id", "to_id")
         .join(labels.withColumnRenamed("node_id", "from_id"), "from_id")
         .withColumnRenamed("component", "c_from")
         .join(labels.withColumnRenamed("node_id", "to_id"), "to_id")
         .filter(F.col("c_from") == F.col("component"))
         .groupBy(F.col("component")).agg(F.count(F.lit(1)).alias("n_edges")))
    possible = (F.col("n_nodes") * (F.col("n_nodes") - 1)) / 2
    return (sizes.join(e, "component", "left").fillna(0, ["n_edges"])
            .withColumn("density",
                        F.when(F.col("n_nodes") < 2, F.lit(0.0))
                        .otherwise(F.round(F.col("n_edges") / possible, 6))))
