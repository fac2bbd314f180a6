"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from memory_engine_spark.session import get_spark

# Headline set: one per operator family, all scale-relevant.
BENCH_QUERIES = [
    "q01_filter_sort_page",   # scan + filter + sort + page
    "q03_pricing_summary",    # grouped aggregation (600k lineitem)
    "q06_monthly_events",     # time bucketing (100k events)
    "q09_khop",               # iterative BFS join (1.3M edges)
    "q10_degree_hubs",        # degree aggregation + top-k
    "q11_temporal_pairs",     # blocked self-join, range predicate
    "q13_jaccard_pairs",      # shingle-join similarity (5k docs)
    "q14_minhash_neardup",    # MinHash LSH pipeline
    "q16_knn_cosine",         # brute-force vector top-k
    "q17_embedding_neardup",  # blocked vector pair join
    "q18_text_stats",         # text-analysis expressions
    "q21_search_ranking",     # multi-criteria scoring + top-k
    "q22_top_orders_per_cust",  # ranking window
    "q26_similar_tags",       # tag-Jaccard discovery join
    "q27_term_cooccurrence",  # pattern detection self-join
    "q28_daily_trend",        # regr_slope trend
    "q31_gaps",               # lag-window anomaly
    "q35_components",         # iterative connected components
    "q36_ivf_knn",            # ANN coarse-quantized top-k
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("memory-engine-bench")
    spark.sparkContext.setLogLevel("ERROR")

    qs = entrymod.queries()
    # JVM/codegen warmup on the smallest SF so the first measured query
    # doesn't absorb one-time startup cost.
    entrymod.entry(spark).count()

    # Each query runs twice; report steady-state (min) as the headline —
    # run 1 additionally pays one-time index builds (derived-edge cache)
    # — and keep the cold run for transparency.
    cold: dict[str, float] = {}
    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        per_run = []
        for run in range(2):
            t0 = time.time()
            n = qs[name](spark, sf_dir).count()
            per_run.append(round(time.time() - t0, 3))
        cold[name] = per_run[0]
        timings[name] = min(per_run)
        print(f"# {name}: {n} rows cold={per_run[0]:.2f}s warm={per_run[1]:.2f}s",
              file=sys.stderr)

    # ingestion throughput (reference parity: BulkIngestionMetrics docs/s,
    # bulk_processor.py:39-51): documents → units → nodes → embeddings
    from pyspark.sql import functions as F

    from memory_engine_spark.operators import ingestion
    from memory_engine_spark.sources.tables import load_tables

    docs = load_tables(spark, sf_dir)["documents"]
    n_docs = docs.count()
    t0 = time.time()
    units = ingestion.extract_units(docs, "text", "source")
    nodes = ingestion.units_to_nodes(units)
    ingestion.embed_column(nodes, "content", dim=64) \
        .select("node_id", "embedding").write.mode("overwrite") \
        .format("noop").save()
    ingest_s = time.time() - t0
    docs_per_sec = round(n_docs / ingest_s, 1)
    print(f"# ingest: {n_docs} docs in {ingest_s:.2f}s = {docs_per_sec} docs/s",
          file=sys.stderr)

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "headline_query_total_steady_state",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "cold_run": cold,
        "cold_total": round(sum(cold.values()), 3),
        "ingest_docs_per_sec": docs_per_sec,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
