"""k-hop with paths, semantic suggestion edges, relationship metrics,
metadata merge, delete, synthesize orchestrator."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from memory_engine_spark.engine import MemoryEngine
from memory_engine_spark.operators import discovery, graph
from memory_engine_spark.operators.aggregates import (
    rating_correlations, relationship_metrics,
)
from memory_engine_spark.operators.merging import delete_rows, merged_metadata
from memory_engine_spark.session import EngineSession


def test_k_hop_paths(spark):
    edges = spark.createDataFrame(
        [("a", "b", "r", 0.9), ("b", "c", "r", 0.9), ("a", "c", "r", 0.9),
         ("c", "d", "r", 0.9)],
        "from_id string, to_id string, relation_type string, confidence_score double")
    out = {r["node_id"]: (r["hop_distance"], r["path"]) for r in
           graph.k_hop_paths(edges, ["a"], 3, directed=True).collect()}
    assert out["a"] == (0, ["a"])
    assert out["b"] == (1, ["a", "b"])
    assert out["c"] == (1, ["a", "c"])       # direct edge wins over a-b-c
    assert out["d"] == (2, ["a", "c", "d"])  # lexicographically-min shortest


def test_semantically_similar_topk(spark):
    vecs = spark.createDataFrame(
        [(1, [1.0, 0.0], 0), (2, [0.9, 0.1], 0), (3, [0.8, 0.2], 0),
         (4, [0.0, 1.0], 0)],
        "vec_id int, embedding array<double>, label int")
    out = discovery.semantically_similar(vecs, k=1, threshold=0.5,
                                         id_col="vec_id", vec_col="embedding",
                                         bucket_col="label")
    top = {r["a"]: r["b"] for r in out.collect()}
    # 1's nearest is 2; 2's nearest is 1 (0.9939 > 0.9907); 3's is 2.
    assert top == {1: 2, 2: 1, 3: 2}  # vec 4 below threshold everywhere
    assert all(r["relation_type"] == "SEMANTICALLY_SIMILAR" for r in out.collect())


def test_relationship_metrics(spark):
    edges = spark.createDataFrame(
        [("a", "b", "is_a", 0.8), ("b", "c", "is_a", 0.6), ("a", "c", "part_of", 0.4)],
        "from_id string, to_id string, relation_type string, confidence_score double")
    m = {r["relation_type"]: r for r in relationship_metrics(edges).collect()}
    assert m["is_a"]["n_edges"] == 2 and m["is_a"]["avg_confidence"] == 0.7
    assert abs(m["is_a"]["graph_density"] - 3 / 6) < 1e-9  # 3 edges, 3 nodes


def test_rating_correlations(spark):
    df = spark.createDataFrame(
        [(1.0, 2.0, -1.0), (2.0, 4.0, -2.0), (3.0, 6.0, -3.0)],
        "x double, y double, z double")
    r = rating_correlations(df, ["x", "y", "z"]).collect()[0]
    assert r["corr_x__y"] == 1.0 and r["corr_x__z"] == -1.0


def test_merged_metadata_right_wins(spark):
    df = spark.createDataFrame(
        [({"a": "1", "b": "2"}, {"b": "9", "c": "3"})],
        "m1 map<string,string>, m2 map<string,string>")
    out = df.select(merged_metadata(F.col("m1"), F.col("m2")).alias("m")).collect()[0]
    assert out["m"] == {"a": "1", "b": "9", "c": "3"}


def test_delete_rows(spark):
    df = spark.createDataFrame([("a", 1), ("b", 2), ("c", 3)], "id string, v int")
    out = delete_rows(df, ["b"], "id")
    assert {r["id"] for r in out.collect()} == {"a", "c"}


def test_synthesize_modes(spark):
    s = EngineSession(spark)
    nodes = spark.createDataFrame(
        [("n1", "spark data engine processing pipelines", "w", 1000.0),
         ("n2", "spark data engine processing clusters", "w", 2000.0),
         ("n3", "spark data engine processing storage", "w", 3000.0)],
        "node_id string, content string, source string, creation_timestamp double")
    edges = spark.createDataFrame(
        [("n1", "n2", "RELATED", 0.5)],
        "from_id string, to_id string, relation_type string, confidence_score double")
    s.register("nodes", nodes)
    s.register("edges", edges)
    eng = MemoryEngine(s)
    fast = eng.synthesize("fast")
    assert set(fast) == {"patterns"}
    assert fast["patterns"].count() > 0  # shared terms across ≥3 docs
    comp = eng.synthesize("comprehensive", question="what is spark processing?")
    assert {"patterns", "structural_anomalies", "contradictions", "answer"} <= set(comp)
    assert comp["answer"]["confidence"] > 0


def test_synthesis_modes_share_plans(spark):
    """q141 memoizes df.count() keyed only by insight name, relying on
    MemoryEngine.synthesize returning a mode-INDEPENDENT plan per
    insight (the contract in engine.synthesize's docstring). Enforce it
    loudly: every insight key shared by two modes must be semantically
    the same lazy plan — a future mode-specific parameter must use a
    new key or this fails."""
    s = EngineSession(spark)
    nodes = spark.createDataFrame(
        [("n1", "spark data engine processing pipelines", "w", 1000.0),
         ("n2", "spark data engine processing clusters", "w", 2000.0)],
        "node_id string, content string, source string, creation_timestamp double")
    edges = spark.createDataFrame(
        [("n1", "n2", "RELATED", 0.5)],
        "from_id string, to_id string, relation_type string, confidence_score double")
    s.register("nodes", nodes)
    s.register("edges", edges)
    eng = MemoryEngine(s)
    by_mode = {m: eng.synthesize(m) for m in
               ("fast", "balanced", "comprehensive")}
    modes = list(by_mode)
    checked = 0
    for i, m1 in enumerate(modes):
        for m2 in modes[i + 1:]:
            for key in set(by_mode[m1]) & set(by_mode[m2]):
                a, b = by_mode[m1][key], by_mode[m2][key]
                if not hasattr(a, "sameSemantics"):
                    continue  # non-DataFrame insight (e.g. QA answer dict)
                assert a.sameSemantics(b), (
                    f"insight {key!r} differs between modes {m1}/{m2}; "
                    "q141's count memoization would report stale counts")
                checked += 1
    assert checked >= 3  # patterns ×3 pairs at minimum


def test_bounded_scc_certificate(spark):
    """Exactness of the k-bounded FW-BW certificate: a 3-cycle
    resolves to its min member, a 2-cycle resolves, a DAG tail stays
    unresolved (-1), and a node on a long cycle whose min is beyond
    k hops stays unresolved rather than mislabeled."""
    from memory_engine_spark.operators.graph import bounded_scc

    edges = [(1, 2), (2, 3), (3, 1),      # 3-cycle -> scc 1
             (10, 11), (11, 10),          # 2-cycle -> scc 10
             (3, 20), (20, 21),           # DAG tail -> unresolved
             # 8-cycle: min member 30; nodes >3 hops away unresolved
             (30, 31), (31, 32), (32, 33), (33, 34), (34, 35),
             (35, 36), (36, 37), (37, 30)]
    df = spark.createDataFrame(edges, "from_id long, to_id long")
    got = {r["node_id"]: r["scc_id"]
           for r in bounded_scc(df, n_iter=3).collect()}
    assert got[1] == got[2] == got[3] == 1
    assert got[10] == got[11] == 10
    assert got[20] == -1 and got[21] == -1
    # only node 30 sees its min BOTH ways within 3 hops (fwd covers
    # 31-33, bwd covers 35-37); every other cycle member's fmin stays
    # above 30, so they stay unresolved rather than mislabeled.
    assert got[30] == 30
    assert all(got[x] == -1 for x in range(31, 38))
    # raising k resolves the full 8-cycle
    got8 = {r["node_id"]: r["scc_id"]
            for r in bounded_scc(df, n_iter=7).collect()}
    assert all(got8[x] == 30 for x in range(30, 38))


def test_bounded_scc_self_label_demotion(spark):
    """Round-8 ADVICE regression: a 9-cycle with ids 50,51,52,53,10,
    54,55,56,57 at n_iter=3 used to label node 50 as SCC 50 (it is
    the min of its own 3-hop forward AND backward balls) while node
    10 got SCC 10 — one SCC split across two labels. The
    verification round demotes node 50 (round 4 drops its fmin to
    10), so only the true min's certificate survives."""
    from memory_engine_spark.operators.graph import bounded_scc

    ring = [50, 51, 52, 53, 10, 54, 55, 56, 57]
    edges = [(ring[i], ring[(i + 1) % len(ring)])
             for i in range(len(ring))]
    df = spark.createDataFrame(edges, "from_id long, to_id long")
    got = {r["node_id"]: r["scc_id"]
           for r in bounded_scc(df, n_iter=3).collect()}
    assert got[10] == 10            # true min, stable through round 4
    assert got[50] == -1            # demoted, not self-labeled
    assert set(got.values()) <= {10, -1}  # never two labels / one SCC


def test_bounded_scc_merge_labels(spark):
    """Round-9 verdict item 2: ``merge_labels=True`` runs min-label
    connected components over the certified (node, label) relations so
    chained certificate classes collapse to ONE component key. The
    gadget SCC {0,2,3,4,5,6,7,8,9}: node 7's 3-hop balls certify it
    only against label 2 (its paths to/from 2 are exactly 3 hops
    through ids > 2, and ids < 2 stay ≥ 5 hops away, so round 4
    cannot demote it), while node 2 certifies against the true min 0
    — pre-merge 7 and 2 carry DIFFERENT keys for the same SCC, the
    split-label hazard; the merge chains 7→2→0 into one key."""
    from memory_engine_spark.operators.graph import bounded_scc

    edges = [(7, 5), (5, 6), (6, 2), (2, 3), (3, 4), (4, 7),
             (2, 9), (9, 0), (0, 8), (8, 2), (1, 0)]
    df = spark.createDataFrame(edges, "from_id long, to_id long")

    pre = {r["node_id"]: r["scc_id"]
           for r in bounded_scc(df, n_iter=3).collect()}
    assert pre[7] == 2 and pre[2] == 0       # the split, pinned
    assert pre[0] == pre[8] == pre[9] == 0
    assert pre[1] == -1                      # DAG node: residual

    post = {r["node_id"]: r["scc_id"]
            for r in bounded_scc(df, n_iter=3,
                                 merge_labels=True).collect()}
    assert post[7] == 0                      # healed by the merge
    assert post[1] == -1                     # residual untouched
    assert {k: v for k, v in post.items() if k != 7} == \
           {k: v for k, v in pre.items() if k != 7}

    # a DEMOTED label that someone's certificate names is healed:
    # cycle {2,5,6,7,8,9} with 0 feeding node 2 at distance exactly 4
    # — node 2 certifies at k=3 but round 4 drops its bmin to 0
    # (demoted), while node 7 stays stably certified TO 2; the merge
    # seeds named labels, so 2 recovers key 2 instead of -1 (7's
    # certificate proves 2 ∈ SCC(2), which is also trivially true).
    heal = [(2, 5), (5, 6), (6, 7), (7, 8), (8, 9), (9, 2),
            (0, 10), (10, 11), (11, 12), (12, 2)]
    hdf = spark.createDataFrame(heal, "from_id long, to_id long")
    hpre = {r["node_id"]: r["scc_id"]
            for r in bounded_scc(hdf, n_iter=3).collect()}
    assert hpre[7] == 2 and hpre[2] == -1
    hpost = {r["node_id"]: r["scc_id"]
             for r in bounded_scc(hdf, n_iter=3,
                                  merge_labels=True).collect()}
    assert hpost[7] == 2 and hpost[2] == 2

    # the merge is a no-op where nothing chains: the 9-cycle keeps
    # exactly the demotion-rule labeling.
    ring = [50, 51, 52, 53, 10, 54, 55, 56, 57]
    ringdf = spark.createDataFrame(
        [(ring[i], ring[(i + 1) % 9]) for i in range(9)],
        "from_id long, to_id long")
    merged = {r["node_id"]: r["scc_id"]
              for r in bounded_scc(ringdf, n_iter=3,
                                   merge_labels=True).collect()}
    assert merged[10] == 10 and merged[50] == -1
    assert set(merged.values()) <= {10, -1}


def test_bounded_scc_exhaustive_peel(spark):
    """Round-10 verdict item 3: ``exhaustive=True`` runs the FW-BW
    DESCENT on the residual — up to max_pivots times, pivot = min
    unresolved id, F∩B from the pivot over the whole graph = exactly
    SCC(pivot), everyone in it re-keyed to the true SCC minimum.
    Topology = the docstring's own split case: a 10-cycle with ids
    placed so 0 and 1 sit antipodal — both are minima of their
    radius-4 windows, so both SELF-certify; their singleton
    certificate classes never touch and merge_labels provably leaves
    two keys. The peel's first pivot (node 2, the smallest demoted
    id) reaches the whole cycle both ways and re-keys EVERYONE —
    certified minima included — to 0."""
    from memory_engine_spark.operators.graph import bounded_scc

    ring = [0, 7, 5, 8, 6, 1, 9, 3, 2, 4]          # 0 and 1 antipodal
    cyc = [(ring[i], ring[(i + 1) % 10]) for i in range(10)]
    df = spark.createDataFrame(cyc, "from_id long, to_id long")

    merged = {r["node_id"]: r["scc_id"]
              for r in bounded_scc(df, n_iter=3,
                                   merge_labels=True).collect()}
    assert merged[0] == 0 and merged[1] == 1      # the split, pinned
    assert set(merged.values()) == {0, 1, -1}

    ex = {r["node_id"]: r["scc_id"]
          for r in bounded_scc(df, n_iter=3, exhaustive=True,
                               max_pivots=1).collect()}
    assert ex == {n: 0 for n in range(10)}        # ONE pivot heals all

    # Bounded-by-K residual + singleton resolution: chain 98→99→0
    # into the cycle adds two singleton SCCs. K=1 resolves only the
    # cycle (backward reach includes 98/99 but forward does not, so
    # F∩B stays exactly the cycle); K=3 resolves everything.
    df2 = spark.createDataFrame(cyc + [(99, 0), (98, 99)],
                                "from_id long, to_id long")
    k1 = {r["node_id"]: r["scc_id"]
          for r in bounded_scc(df2, n_iter=3, exhaustive=True,
                               max_pivots=1).collect()}
    assert all(k1[n] == 0 for n in range(10))
    assert k1[98] == -1 and k1[99] == -1          # bounded by K pivots
    k3 = {r["node_id"]: r["scc_id"]
          for r in bounded_scc(df2, n_iter=3, exhaustive=True,
                               max_pivots=3).collect()}
    assert all(k3[n] == 0 for n in range(10))
    assert k3[98] == 98 and k3[99] == 99          # singleton SCCs

    # shortcut squaring is reachability-preserving: s=0 (pure BFS)
    # and s=3 give byte-identical labelings.
    for s in (0, 3):
        alt = {r["node_id"]: r["scc_id"]
               for r in bounded_scc(df2, n_iter=3, exhaustive=True,
                                    max_pivots=3,
                                    peel_shortcuts=s).collect()}
        assert alt == k3


def test_bounded_scc_flag_composition(spark):
    """The two flags compose but neither implies the other: with BOTH
    set, the merge chase collapses chained certificate classes FIRST
    (q242's gadget: 7→2→0), then the peel resolves what certificates
    never could (the DAG node 1 = singleton SCC {1}). include_cert
    threads the phase-1 verified label through every path."""
    from memory_engine_spark.operators.graph import bounded_scc

    gad = [(7, 5), (5, 6), (6, 2), (2, 3), (3, 4), (4, 7),
           (2, 9), (9, 0), (0, 8), (8, 2), (1, 0)]
    df = spark.createDataFrame(gad, "from_id long, to_id long")

    both = {r["node_id"]: (r["cert_scc"], r["scc_id"])
            for r in bounded_scc(df, n_iter=3, merge_labels=True,
                                 exhaustive=True, max_pivots=2,
                                 include_cert=True).collect()}
    assert both[7] == (2, 0)          # cert split to 2; merge+peel → 0
    assert both[2] == (0, 0)
    # pivot 1 = node 1 (min residual) → singleton SCC {1}; pivot 2 =
    # the smallest still-demoted cycle node → F∩B = the whole 9-node
    # SCC, so EVERYTHING resolves at K=2
    assert both[1] == (-1, 1)
    assert all(v[1] == 0 for k, v in both.items() if k != 1)

    # include_cert on the phase-1-only and merge-only paths: the two
    # columns are the documented (cert, final) pair
    p1 = {r["node_id"]: (r["cert_scc"], r["scc_id"])
          for r in bounded_scc(df, n_iter=3,
                               include_cert=True).collect()}
    assert all(c == s for c, s in p1.values())      # phase-1: cert==scc
    mg = {r["node_id"]: (r["cert_scc"], r["scc_id"])
          for r in bounded_scc(df, n_iter=3, merge_labels=True,
                               include_cert=True).collect()}
    assert mg[7] == (2, 0) and mg[1] == (-1, -1)
