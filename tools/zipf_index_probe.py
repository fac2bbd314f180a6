"""Hot-cf census value probe on a TAILED vocabulary (r08 verdict
item 3).

The r8 A/B ran the salted inverted index on a 32-term synthetic
vocabulary where EVERY term cleared the hot threshold, so the hot-cf
census could only show its cost; its claimed benefit — halving the
salt-shuffle volume by leaving the long tail unsalted — had no number.
This probe builds a Zipf(≈1)-tailed corpus (log-uniform rank draws:
p(rank) ∝ 1/rank, head term ~7-9% of tokens, tens of thousands of
tail types) and measures WALL + SHUFFLE BYTES (AppStatusStore stage
metrics, write side) for the three plans:

    one-pass        groupBy(term) collect_list        (the OOM plan)
    salted-all      S=8, every term range-salted
    salted-hot      S=8, census gate: only cf >= hot_cf salted

Usage: python tools/zipf_index_probe.py [n_docs] [vocab] [runs]
Prints a JSON record; SCALING.md quotes it.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from memory_engine_spark.operators.ranking import inverted_index
from memory_engine_spark.session import get_spark


def shuffle_totals(sc) -> tuple[int, int]:
    """(write_bytes, read_bytes) summed over every completed stage."""
    ss = sc._jsc.sc().statusStore()
    jvm = sc._jvm
    empty = jvm.java.util.ArrayList()
    lst = ss.stageList(empty, False, False,
                       sc._gateway.new_array(jvm.double, 0), empty)
    w = sum(lst.apply(i).shuffleWriteBytes() for i in range(lst.size()))
    r = sum(lst.apply(i).shuffleReadBytes() for i in range(lst.size()))
    return w, r


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    vocab = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    tokens_per_doc = 60
    spark = get_spark()
    sc = spark.sparkContext

    # Deterministic Zipf-ish corpus: token rank = floor(exp(u·ln V))
    # with u = a 64-bit hash of (doc, position) scaled to [0,1) —
    # log-uniform ranks give p(rank) ∝ 1/rank (Zipf s=1): rank 1 ≈
    # 1/ln(V) ≈ 8.7% of all tokens at V=100k, and the tail holds tens
    # of thousands of once-or-twice types. No RNG state, so the three
    # plans see byte-identical input.
    docs = (spark.range(n_docs).select(F.col("id").alias("doc_id"))
            .repartition(sc.defaultParallelism)
            .select("doc_id", F.concat_ws(" ", F.transform(
                F.sequence(F.lit(1), F.lit(tokens_per_doc)),
                lambda i: F.concat(F.lit("t"), rank_expr(i, vocab))))
                .alias("text"))
            .persist())

    docs.count()
    tot = n_docs * tokens_per_doc
    head = docs.select(F.explode(F.split("text", " ")).alias("t")) \
        .groupBy("t").count().orderBy(F.col("count").desc())
    top = head.limit(3).collect()
    n_types = head.count()
    head_share = top[0]["count"] / tot
    print(f"# corpus: {n_docs} docs x {tokens_per_doc} tokens, "
          f"{n_types} types, head {top[0]['t']} = "
          f"{100 * head_share:.1f}%", file=sys.stderr)
    # hot_cf at 0.05% of tokens: salts the true head, leaves the tail
    hot_cf = max(2, tot // 2000)

    plans = {
        "one_pass": dict(salt_buckets=1),
        "salted_all": dict(salt_buckets=8),
        "salted_hot": dict(salt_buckets=8, hot_cf=hot_cf),
    }
    rec: dict = {"n_docs": n_docs, "vocab": vocab, "n_types": n_types,
                 "head_share_pct": round(100 * head_share, 2),
                 "hot_cf": hot_cf, "plans": {}}
    for name, kw in plans.items():
        walls, writes, reads = [], [], []
        out = inverted_index(docs, "text", "doc_id", **kw)
        n = out.count()
        for _ in range(runs):
            w0, r0 = shuffle_totals(sc)
            t0 = time.time()
            # noop write, NOT count(): count() lets Catalyst prune the
            # collect_list/md5 payload entirely (measured: the salted
            # plan's second exchange carried SIX records under count),
            # so all three plans degenerate to the same key-only
            # shuffle. The noop sink consumes every output column.
            out.write.mode("overwrite").format("noop").save()
            walls.append(round(time.time() - t0, 3))
            w1, r1 = shuffle_totals(sc)
            writes.append(w1 - w0)
            reads.append(r1 - r0)
        rec["plans"][name] = {
            "rows": n, "wall": walls,
            "wall_min": min(walls),
            "shuffle_write_mb": [round(w / 2**20, 1) for w in writes],
            "shuffle_read_mb": [round(r / 2**20, 1) for r in reads]}
        print(f"# {name}: wall {walls} write_mb "
              f"{rec['plans'][name]['shuffle_write_mb']}", file=sys.stderr)
    print(json.dumps(rec, indent=1))
    spark.stop()


def rank_expr(i, vocab):
    import math

    u = (F.pmod(F.xxhash64(F.col("doc_id"), i), F.lit(1_000_000))
         / 1_000_000.0)
    return F.floor(F.exp(u * math.log(vocab))).cast("long")


if __name__ == "__main__":
    main()
