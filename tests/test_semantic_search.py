"""engine.semantic_search end-to-end with the deterministic provider."""

from __future__ import annotations

from pyspark.sql import functions as F

from memory_engine_spark.engine import MemoryEngine
from memory_engine_spark.operators.ingestion import embed_column
from memory_engine_spark.session import EngineSession


def test_semantic_search_finds_same_text(spark):
    s = EngineSession(spark)
    docs = spark.createDataFrame(
        [("n1", "distributed spark joins shuffle data"),
         ("n2", "gardening tulips bloom in spring"),
         ("n3", "spark shuffle exchange partitions data")],
        "node_id string, content string")
    emb = embed_column(docs, "content", dim=64).select("node_id", "embedding")
    s.register("embeddings", emb)
    eng = MemoryEngine(s)

    # query identical to n2's text → top hit n2 with similarity ~1
    out = eng.semantic_search("gardening tulips bloom in spring", k=2,
                              similarity_threshold=0.95)
    rows = out.collect()
    assert rows and rows[0]["node_id"] == "n2"
    assert rows[0]["score"] > 0.999
    # clamped threshold (0.95→0.85) still excludes unrelated docs
    assert all(r["node_id"] == "n2" for r in rows)

    # topically-related query ranks the two spark docs first
    out2 = eng.semantic_search("spark data shuffle", k=2,
                               similarity_threshold=0.1)
    assert {r["node_id"] for r in out2.collect()} == {"n1", "n3"}


def test_kmeans_refine_moves_centroids_to_means(spark):
    """Lloyd refinement: with two well-separated 2-D clusters and
    first-k seeds landing one in each, one round moves each centroid
    to its cluster mean (the quantized BIGINT-sum mean — exact for
    these values), assignments stay with their cluster, and a seed
    whose cell goes empty keeps its previous centroid."""
    import pytest

    from memory_engine_spark.operators.similarity import (build_ivf_flat,
                                                          kmeans_refine)

    # cluster A around (1, 0): ids 0,2,3 — cluster B around (0, 1):
    # ids 1,4,5. Seeds (nlist=2) = ids 0 and 1, one per cluster.
    rows = [(0, [1.0, 0.0]), (1, [0.0, 1.0]),
            (2, [0.8, 0.2]), (3, [0.9, 0.1]),
            (4, [0.2, 0.8]), (5, [0.1, 0.9])]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>")
    seeds, _ = build_ivf_flat(emb, nlist=2, id_col="vec_id")
    cents, assigned = kmeans_refine(emb, seeds, n_rounds=1,
                                    id_col="vec_id")
    got = {r["cell"]: r["centroid"] for r in cents.collect()}
    assert got[0] == [pytest.approx((1.0 + 0.8 + 0.9) / 3),
                      pytest.approx((0.0 + 0.2 + 0.1) / 3)]
    assert got[1] == [pytest.approx((0.0 + 0.2 + 0.1) / 3),
                      pytest.approx((1.0 + 0.8 + 0.9) / 3)]
    cells = {r["vec_id"]: r["cell"] for r in assigned.collect()}
    assert cells == {0: 0, 2: 0, 3: 0, 1: 1, 4: 1, 5: 1}

    # empty-cell retention: a far-off seed that captures nothing
    # keeps its ORIGINAL centroid through the round
    rows2 = rows + [(6, [-1.0, -1.0])]
    emb2 = spark.createDataFrame(
        rows2, "vec_id long, embedding array<double>")
    seeds3 = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0]), (99, [-1.0, -1.0])],
        "cell long, centroid array<double>")
    # remove vec 6 so cell 99 is empty this round
    cents3, _ = kmeans_refine(emb, seeds3, n_rounds=1, id_col="vec_id")
    got3 = {r["cell"]: r["centroid"] for r in cents3.collect()}
    assert got3[99] == [-1.0, -1.0]


def test_ivf_append_equals_rebuild(spark):
    """Incremental IVF maintenance: building on a base corpus and
    appending a delta batch against the frozen centroids yields
    EXACTLY the assignment a full rebuild produces (per-row
    assignment has no cross-row state), and the probe over the
    appended index equals the probe over the rebuilt one."""
    import random

    from memory_engine_spark.operators.similarity import (build_ivf_flat,
                                                          ivf_append,
                                                          topk_ivf)
    rng = random.Random(11)
    rows = [(i, [rng.gauss(0, 1) for _ in range(6)]) for i in range(90)]
    emb = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    base = emb.filter("vec_id < 8 OR vec_id % 5 != 2")
    delta = emb.filter("vec_id >= 8 AND vec_id % 5 = 2")
    assert delta.count() > 0

    cents_b, assigned_b = build_ivf_flat(base, nlist=8, id_col="vec_id")
    appended = ivf_append(assigned_b, cents_b, delta, id_col="vec_id")
    cents_f, assigned_f = build_ivf_flat(emb, nlist=8, id_col="vec_id")

    got = {(r["vec_id"], r["cell"]) for r in appended.collect()}
    want = {(r["vec_id"], r["cell"]) for r in assigned_f.collect()}
    assert got == want                      # append == rebuild, exactly

    qv = rows[5][1]
    top_a = [(r["vec_id"], round(r["score"], 9)) for r in
             topk_ivf(appended, cents_b, qv, k=7, nprobe=3,
                      id_col="vec_id").collect()]
    top_f = [(r["vec_id"], round(r["score"], 9)) for r in
             topk_ivf(assigned_f, cents_f, qv, k=7, nprobe=3,
                      id_col="vec_id").collect()]
    assert top_a == top_f


def test_knn_join_recall_vs_brute(spark):
    import random

    from memory_engine_spark.operators.similarity import (build_ivf_flat,
                                                          knn_join,
                                                          knn_join_brute)
    rng = random.Random(7)
    # 3 loose clusters in 8-dim space so IVF cells are meaningful
    rows = []
    for i in range(120):
        center = [0.0] * 8
        center[i % 3] = 4.0
        rows.append((i, [c + rng.gauss(0, 0.8) for c in center]))
    emb = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    cents, assigned = build_ivf_flat(emb, nlist=6, id_col="vec_id")
    ann = knn_join(assigned, cents, k=3, nprobe=3, id_col="vec_id")
    exact = knn_join_brute(emb, k=3, id_col="vec_id")

    assert ann.count() == 120 * 3  # every vector got k neighbors
    a = {(r["qid"], r["nid"]) for r in ann.collect()}
    e = {(r["qid"], r["nid"]) for r in exact.collect()}
    recall = len(a & e) / len(e)
    assert recall >= 0.7, f"recall {recall:.2f}"
    # ranks are 1..k per query, scores non-increasing within a query
    per_q = {}
    for r in ann.collect():
        per_q.setdefault(r["qid"], []).append((r["nn_rank"], r["score"]))
    for q, pairs in per_q.items():
        pairs.sort()
        assert [p[0] for p in pairs] == [1, 2, 3]
        assert pairs[0][1] >= pairs[1][1] >= pairs[2][1]


def test_pq_adc_recall_vs_exact_l2(spark):
    import random

    from memory_engine_spark.operators.similarity import (pq_codebooks,
                                                          pq_encode, pq_topk)
    rng = random.Random(11)
    dim, n = 16, 200
    rows = [(i, [rng.gauss(0, 1) for _ in range(dim)]) for i in range(n)]
    emb = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    books = pq_codebooks(emb, dim=dim, m=4, ksub=32, id_col="vec_id")
    assert books.count() == 4 * 32
    codes = pq_encode(emb, books, dim=dim, m=4, id_col="vec_id")
    assert codes.count() == n * 4  # every vector got a code per subspace

    qv = rows[0][1]
    approx = [r["vec_id"] for r in
              pq_topk(codes, books, qv, k=20, m=4, id_col="vec_id").collect()]
    # exact L2 top-20
    exact = sorted(rows, key=lambda r: sum((a - b) ** 2
                                           for a, b in zip(r[1], qv)))[:20]
    exact_ids = [r[0] for r in exact]
    recall = len(set(approx) & set(exact_ids)) / 20
    assert recall >= 0.5, f"PQ recall {recall:.2f}"
    assert approx[0] == 0  # the query itself (distance ~0) ranks first
    import pytest as _pytest
    with _pytest.raises(ValueError, match="divisible"):
        pq_codebooks(emb, dim=dim, m=5, id_col="vec_id")


def test_ivfpq_rerank_recall_and_order(spark):
    import random

    from memory_engine_spark.operators.similarity import (build_ivf_flat,
                                                          ivfpq_topk,
                                                          pq_codebooks,
                                                          pq_encode)
    rng = random.Random(13)
    dim, n = 16, 200
    rows = []
    for i in range(n):
        center = [0.0] * dim
        center[i % 4] = 5.0
        rows.append((i, [c + rng.gauss(0, 1) for c in center]))
    emb = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    cents, assigned = build_ivf_flat(emb, nlist=8, id_col="vec_id")
    books = pq_codebooks(emb, dim=dim, m=4, ksub=16, id_col="vec_id")
    codes = pq_encode(emb, books, dim=dim, m=4, id_col="vec_id")
    qv = rows[0][1]
    got = ivfpq_topk(assigned, cents, codes, books, qv, k=10, nprobe=4,
                     m=4, rerank=40, id_col="vec_id").collect()
    assert len(got) == 10
    # exact distances are re-ranked: ascending, query itself first
    dists = [r["sq_dist"] for r in got]
    assert dists == sorted(dists)
    assert got[0]["vec_id"] == 0 and got[0]["sq_dist"] == 0.0
    # recall vs exact L2 top-10
    exact_ids = [r[0] for r in sorted(
        rows, key=lambda r: sum((a - b) ** 2 for a, b in zip(r[1], qv)))[:10]]
    recall = len({r["vec_id"] for r in got} & set(exact_ids)) / 10
    assert recall >= 0.6, f"IVF-PQ recall {recall:.2f}"
