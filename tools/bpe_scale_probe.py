"""BPE tokenizer scale probe (r12 extra, the MinHash/ANN probes'
sibling): the tokenizer pillar's 100-TB claim is that it is a
DICTIONARY encode — `bpe_train` collapses the corpus to a capped
word-frequency table (one tokenize+groupBy pass; 10 fixed merge
rounds on a 400-row symbol table), and `bpe_encode` applies merges
once per DISTINCT word, broadcasting the tiny word→pieces dictionary
back into the stream. Replicating the sf0.1 documents ×1/×10/×100
multiplies every word frequency uniformly, so the claim has sharp,
assertable consequences:

- the learned MERGE RULES are IDENTICAL at every factor (uniform
  frequency scaling preserves every argmax; deterministic
  count-desc/pair-asc tie-breaks), with pair counts scaling by
  exactly the factor;
- per-document (n_words, n_pieces) of every clone equals its base
  document's (the dictionary is the same, the text is the same);
- train wall is one linear corpus pass + a fixed-cost merge loop;
  encode wall per Mrow is FLAT once the ~20 s per-job dispatch floor
  amortizes — no term grows with corpus size except the single
  broadcast-join pass.

Usage: python tools/bpe_scale_probe.py [factors...]  (default 1 10 100)
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from memory_engine_spark.operators import corpus
from memory_engine_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.1"
N_MERGES, TOP_WORDS = 10, 400


def main() -> None:
    factors = [int(a) for a in sys.argv[1:]] or [1, 10, 100]
    spark = get_spark("bpe-scale-probe")
    spark.conf.set("spark.sql.shuffle.partitions", "64")

    base = (spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .select("doc_id", "text"))
    base_n = base.count()
    base_rules = None
    base_counts = None                    # doc_id -> (n_words, n_pieces)

    for factor in factors:
        n = base_n * factor
        clones = base.crossJoin(F.broadcast(
            spark.range(factor).select(F.col("id").alias("clone"))))
        docs = clones.select(
            (F.col("clone") * 1_000_000 + F.col("doc_id"))
            .alias("doc_id"), "text").repartition(64).persist()
        assert docs.count() == n

        t0 = time.time()
        rules = corpus.bpe_train(docs, "text", n_merges=N_MERGES,
                                 top_words=TOP_WORDS)
        train_s = time.time() - t0

        t1 = time.time()
        enc = corpus.bpe_encode(docs, "text", "doc_id", rules).persist()
        n_enc = enc.count()
        encode_s = time.time() - t1
        assert n_enc == n, (n_enc, n)     # nothing silently drops

        if factor == 1 or base_rules is None:
            base_rules = rules
            base_counts = {r["doc_id"]: (r["n_words"], r["n_pieces"])
                           for r in enc.collect()}
        else:
            # merge rules invariant; counts scale by exactly the factor
            assert [(r, a, b) for r, a, b, _ in rules] == \
                [(r, a, b) for r, a, b, _ in base_rules], \
                "merge rules changed under uniform replication"
            assert all(c == bc * factor for (_, _, _, c), (_, _, _, bc)
                       in zip(rules, base_rules)), \
                "pair counts did not scale by the clone factor"
            # every clone's counts equal its base doc's
            sample = enc.filter(F.col("doc_id") % 1_000_000 < 50) \
                .collect()
            assert sample, "empty clone sample"
            for r in sample:
                want = base_counts[r["doc_id"] % 1_000_000]
                got = (r["n_words"], r["n_pieces"])
                assert got == want, (r["doc_id"], got, want)

        print(json.dumps({
            "factor": factor, "rows": n,
            "train_s": round(train_s, 1),
            "encode_s": round(encode_s, 1),
            "encode_s_per_mrow": round(encode_s / (n / 1e6), 1),
            "n_rules": len(rules),
            "top_rule": list(rules[0][:3]),
        }), flush=True)
        docs.unpersist()
        enc.unpersist()


if __name__ == "__main__":
    main()
