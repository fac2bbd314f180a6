from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from memory_engine_spark.operators import corpus


def _docs(spark, n=400, sources=("a", "b", "c", "d")):
    rows = [(i, sources[i % len(sources)], f"text {i}") for i in range(n)]
    return spark.createDataFrame(rows, "doc_id int, source string, text string")


def test_stratified_sample_deterministic_and_rated(spark):
    df = _docs(spark)
    rates = {"a": 1.0, "b": 0.5, "c": 0.0}
    kept = corpus.stratified_sample(df, "source", rates, "doc_id",
                                    default_rate=0.2)
    rows = kept.collect()
    again = set(r["doc_id"] for r in
                corpus.stratified_sample(df.repartition(7), "source", rates,
                                         "doc_id", default_rate=0.2).collect())
    assert set(r["doc_id"] for r in rows) == again  # partition-independent
    by_src = {}
    for r in rows:
        by_src.setdefault(r["source"], set()).add(r["doc_id"])
    assert len(by_src["a"]) == 100          # rate 1.0 keeps all

    assert 30 <= len(by_src["b"]) <= 70     # ~50 of 100
    assert "c" not in by_src                # rate 0 drops all
    assert 5 <= len(by_src["d"]) <= 40      # default 0.2 of 100
    with pytest.raises(ValueError, match="rate"):
        corpus.stratified_sample(df, "source", {"a": 1.5}, "doc_id")


def test_mix_corpus_hits_target_proportions(spark):
    # 300 a / 100 b, target 50/50 -> b limiting: keep all b, ~100 of a
    rows = [(i, "a" if i < 300 else "b") for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id int, source string")
    out = corpus.mix_corpus(df, "source", {"a": 0.5, "b": 0.5}, "doc_id")
    counts = {r["source"]: r["n"] for r in
              out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts["b"] == 100
    assert 75 <= counts["a"] <= 125
    with pytest.raises(ValueError, match="no rows"):
        corpus.mix_corpus(df, "source", {"a": 0.5, "zzz": 0.5}, "doc_id")


def test_pack_sequences_layout_invariants(spark):
    df = spark.createDataFrame(
        [(i, "w " * (i % 40 + 1)) for i in range(200)],
        "doc_id int, text string")
    from memory_engine_spark.operators.dedup import tokens
    out = corpus.pack_sequences(df, F.size(tokens(F.col("text"))), budget=64,
                                id_col="doc_id", n_shards=4).collect()
    assert len(out) == 200
    rows = sorted(out, key=lambda r: r["start_offset"])
    # concat layout: offsets are contiguous, no gaps or overlaps
    pos = 0
    for r in rows:
        assert r["start_offset"] == pos
        pos += r["n_tokens"]
    total = pos
    for r in rows:
        assert r["seq_id"] == r["start_offset"] // 64
        assert r["offset_in_seq"] == r["start_offset"] % 64
        last = r["start_offset"] + r["n_tokens"] - 1
        assert r["n_seqs"] == last // 64 - r["seq_id"] + 1
    # shards ordered: every shard-s doc comes before any shard-(s+1) doc
    shard_of = [r["shard"] for r in rows]
    assert shard_of == sorted(shard_of)
    # deterministic under repartitioning
    again = corpus.pack_sequences(df.repartition(5),
                                  F.size(tokens(F.col("text"))), budget=64,
                                  id_col="doc_id", n_shards=4).collect()
    assert {(r["doc_id"], r["start_offset"]) for r in again} == \
           {(r["doc_id"], r["start_offset"]) for r in out}
    assert total == sum(r["n_tokens"] for r in rows)


def test_vocabulary_counts_and_idf(spark):
    import math
    df = spark.createDataFrame(
        [(1, "apple banana apple"), (2, "banana cherry"), (3, "banana")],
        "doc_id int, text string")
    rows = {r["term"]: r for r in
            corpus.vocabulary(df, "text", "doc_id", top_k=10).collect()}
    assert rows["banana"]["tf"] == 3 and rows["banana"]["doc_freq"] == 3
    assert rows["apple"]["tf"] == 2 and rows["apple"]["doc_freq"] == 1
    assert rows["cherry"]["tf"] == 1
    assert rows["apple"]["idf"] == round(math.log(4 / 2) + 1.0, 6)


def test_quantize_int8_roundtrip_quality(spark):
    import random

    from memory_engine_spark.operators.similarity import quantize_int8
    rng = random.Random(3)
    emb = spark.createDataFrame(
        [(i, [rng.gauss(0, 1) for _ in range(16)]) for i in range(50)]
        + [(999, [0.0] * 16)],
        "vec_id int, embedding array<double>")
    rows = {r["vec_id"]: r for r in
            quantize_int8(emb, id_col="vec_id").collect()}
    assert len(rows) == 51
    for vid, r in rows.items():
        if vid == 999:
            assert r["scale"] == 0.0 and all(q == 0 for q in r["qvec"])
            continue
        assert all(-127 <= q <= 127 for q in r["qvec"])
        assert max(abs(q) for q in r["qvec"]) == 127  # max element hits full range
        assert r["dequant_cos"] > 0.999


def test_dsir_importance_prefers_target_like_docs(spark):
    from memory_engine_spark.operators.corpus import dsir_importance
    raw = spark.createDataFrame(
        [(1, "spark joins shuffle data across executors"),
         (2, "spark joins shuffle partitions fast"),
         (3, "le chat noir dort sur le tapis rouge"),
         (4, "der hund lauft schnell durch den park")],
        "doc_id long, text string")
    target = raw.filter("doc_id IN (1, 2)")  # the 'english/spark' slice
    out = {r["doc_id"]: r for r in
           dsir_importance(raw, target, "text", "doc_id",
                           n_buckets=512).collect()}
    # docs drawn from the target distribution outscore the others
    assert min(out[1]["log_weight"], out[2]["log_weight"]) > \
        max(out[3]["log_weight"], out[4]["log_weight"])
    # n_features = unigrams + bigrams = 2*len(toks) - 1
    assert out[1]["n_features"] == 2 * 6 - 1
    assert out[3]["n_features"] == 2 * 8 - 1


def test_dsir_importance_single_word_doc_has_no_bigrams(spark):
    from memory_engine_spark.operators.corpus import dsir_importance
    raw = spark.createDataFrame([(1, "hello"), (2, "hello world")],
                                "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           dsir_importance(raw, raw, "text", "doc_id",
                           n_buckets=64).collect()}
    assert out[1]["n_features"] == 1     # one unigram, zero bigrams
    assert out[2]["n_features"] == 3     # 2 unigrams + 1 bigram
    # target == raw -> every bucket ratio is ~0 after identical smoothing
    assert abs(float(out[1]["log_weight"])) < 1e-6
    assert abs(float(out[2]["log_weight"])) < 1e-6


def test_bigram_perplexity_scores_target_like_docs_lower(spark):
    from memory_engine_spark.operators.corpus import bigram_perplexity
    raw = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "the quick brown fox sleeps near the lazy dog"),
         (3, "zzz qqq vvv kkk www yyy xxx uuu ppp")],
        "doc_id long, text string")
    target = raw.filter("doc_id IN (1, 2)")
    out = {r["doc_id"]: r for r in
           bigram_perplexity(raw, target, "text", "doc_id",
                             n_buckets=4096).collect()}
    # every bigram of doc 3 is unseen -> max entropy; docs 1/2 are in
    # the training set -> far lower
    assert out[1]["cross_entropy"] < out[3]["cross_entropy"]
    assert out[2]["cross_entropy"] < out[3]["cross_entropy"]
    assert out[1]["ppl"] < out[3]["ppl"]
    # n_bigrams = n_tokens - 1
    assert out[1]["n_bigrams"] == 8
    assert out[3]["n_bigrams"] == 8


def test_bigram_perplexity_short_docs_absent(spark):
    from memory_engine_spark.operators.corpus import bigram_perplexity
    raw = spark.createDataFrame(
        [(1, "solo"), (2, "two tokens here")], "doc_id long, text string")
    out = bigram_perplexity(raw, raw, "text", "doc_id",
                            n_buckets=64).collect()
    assert [r["doc_id"] for r in out] == [2]


def test_stratified_weighted_sample_exact_quota_and_determinism(spark):
    from memory_engine_spark.operators.corpus import stratified_weighted_sample
    rows = [(f"s{i % 3}", i, float(i + 1)) for i in range(60)]
    rows.append(("tiny", 999, 1.0))  # stratum smaller than k
    df = spark.createDataFrame(rows, "src string, doc_id long, w double")
    out = stratified_weighted_sample(df, "src", "w", k=4, id_col="doc_id")
    counts = {r["src"]: r["n"] for r in
              out.groupBy("src").count().withColumnRenamed("count", "n").collect()}
    assert counts == {"s0": 4, "s1": 4, "s2": 4, "tiny": 1}
    # deterministic: identical call selects identical ids
    again = stratified_weighted_sample(df, "src", "w", k=4, id_col="doc_id")
    assert sorted(r["doc_id"] for r in out.collect()) == \
        sorted(r["doc_id"] for r in again.collect())
    # zero/negative weights never win
    df2 = df.withColumn("w", F.when(F.col("doc_id") < 30, -1.0)
                        .otherwise(F.col("w")))
    out2 = stratified_weighted_sample(df2, "src", "w", k=4, id_col="doc_id")
    assert all(r["doc_id"] >= 30 for r in out2.collect())


def test_rank_buckets_deals_terciles_with_total_order(spark):
    from memory_engine_spark.operators.corpus import rank_buckets

    rows = [(i, "en", float(i)) for i in range(1, 10)]  # 9 rows -> 3/3/3
    rows += [(100 + i, "fr", 1.0) for i in range(4)]    # ties -> id order
    df = spark.createDataFrame(rows, "doc_id long, lang string, ppl double")
    out = {(r["lang"], r["doc_id"]): r["bucket"]
           for r in rank_buckets(df, "ppl", "lang", "doc_id").collect()}
    assert [out[("en", i)] for i in range(1, 10)] == \
        ["head"] * 3 + ["middle"] * 3 + ["tail"] * 3
    # 4 tied rows in fr: ntile gives 2/1/1 with id as the tiebreak
    assert [out[("fr", 100 + i)] for i in range(4)] == \
        ["head", "head", "middle", "tail"]


def test_temperature_mixture_quotas_and_determinism(spark):
    from memory_engine_spark.operators.corpus import temperature_mixture

    rows = [(i, "big") for i in range(900)] + \
           [(1000 + i, "small") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = temperature_mixture(df, "source", "doc_id", alpha=0.3, k=50)
    got = out.collect()
    quotas = {}
    for r in got:
        quotas.setdefault(r["source"], set()).add(r["doc_id"])
        assert r["draw_rank"] <= r["quota"]
    # alpha=0.3 up-samples the small source far above its 10% share
    n_small = len(quotas["small"])
    assert len(quotas["big"]) + n_small == 50
    assert n_small >= 15
    # deterministic: same call, same rows
    again = {r["doc_id"] for r in temperature_mixture(
        df, "source", "doc_id", alpha=0.3, k=50).collect()}
    assert again == {r["doc_id"] for r in got}


def test_temperature_mixture_quota_exceeding_population(spark):
    from memory_engine_spark.operators.corpus import temperature_mixture

    rows = [(i, "big") for i in range(200)] + [(900, "tiny")]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = temperature_mixture(df, "source", "doc_id", alpha=0.1, k=100)
    got = out.collect()
    # tiny's quota exceeds its single row: it contributes what it has,
    # and the total is visibly short of k (no silent reallocation)
    tiny = [r for r in got if r["source"] == "tiny"]
    assert len(tiny) == 1 and tiny[0]["quota"] > 1
    assert len(got) < 100


def test_bpe_train_greedy_merge_sequence(spark):
    """Hand-computed BPE on a toy corpus: 'a t' (7 occurrences across
    cat/sat/mat/hat) merges first, then 'c at' (4), then the tie
    between 'h e' and 't h' (both 2) resolves lexicographically to
    'h e', then 't he'; round 5 falls to the lexicographically first
    count-1 pair 'a n'. Also exercises the a==b run-parity path."""
    from memory_engine_spark.operators.corpus import bpe_train

    df = spark.createDataFrame(
        [("the cat sat on the mat cat cat",), ("a cat and a hat",)],
        "text string")
    m = bpe_train(df, "text", n_merges=5, top_words=50)
    assert m == [(1, "a", "t", 7), (2, "c", "at", 4), (3, "h", "e", 2),
                 (4, "t", "he", 2), (5, "a", "n", 1)]

    # run parity: 'aaaa' merges greedily to [aa, aa] then to [aaaa]
    df2 = spark.createDataFrame([("aaaa aaaa",)], "text string")
    m2 = bpe_train(df2, "text", n_merges=2, top_words=10)
    assert m2[0][:3] == (1, "a", "a")   # 'a a' picked first
    assert m2[1][:3] == (2, "aa", "aa")  # doubled-space replace kept
                                         # the run parity: [aa, aa]


def test_bpe_encode_piece_counts(spark):
    """Encoding with a hand-built merge table: 'the' collapses to one
    piece via t+h -> th+e, 'cat' stays 3 pieces (no rule touches it),
    an empty doc keeps 0/0 through the left join, and out-of-vocab
    words still char-split (encoder applies rules, not a closed
    vocabulary)."""
    from memory_engine_spark.operators.corpus import bpe_encode

    merges = [(1, "t", "h", 0), (2, "th", "e", 0)]
    df = spark.createDataFrame(
        [(1, "the cat"), (2, "thee"), (3, ""), (4, "zq the")],
        "id bigint, text string")
    got = {r["id"]: (r["n_words"], r["n_pieces"])
           for r in bpe_encode(df, "text", "id", merges).collect()}
    # the=1 piece, cat=3 -> doc1: 2 words, 4 pieces
    # thee = [the, e] -> 2 pieces; zq = 2 pieces (no rules apply)
    assert got == {1: (2, 4), 2: (1, 2), 3: (0, 0), 4: (2, 3)}


def test_logistic_probe_learns_marker_token(spark):
    """The probe must discover a perfectly-predictive marker token's
    hash bucket: positives (docs containing 'zzz') end up scoring
    strictly above every negative, and retraining is bit-identical
    (the BIGINT-quantized GD is deterministic by construction)."""
    from pyspark.sql import functions as F

    from memory_engine_spark.operators.corpus import logistic_probe

    rows = [(i, ("zzz alpha beta" if i % 3 == 0 else "alpha beta gamma"),
             1 if i % 3 == 0 else 0) for i in range(30)]
    df = spark.createDataFrame(rows, "id bigint, text string, y int")
    w1, scored1 = logistic_probe(df, "text", "id", "y", dim=16,
                                 n_steps=4, lr=50.0,
                                 pos_weight=1.5, neg_weight=0.75)
    s1 = {r["id"]: (r["label"], r["score"]) for r in scored1.collect()}
    pos = [v for (l, v) in s1.values() if l == 1]
    neg = [v for (l, v) in s1.values() if l == 0]
    assert min(pos) > max(neg)
    w2, _ = logistic_probe(df, "text", "id", "y", dim=16,
                           n_steps=4, lr=50.0,
                           pos_weight=1.5, neg_weight=0.75)
    assert w1 == w2


def test_span_corrupt_reconstruction_invariant(spark):
    """T5 span corruption: sentinels are ordinal by span position,
    consecutive masked tokens share one span, the terminal sentinel
    index equals n_spans, and splicing each target span back into
    its input sentinel reconstructs the original token sequence
    exactly — for every document in a 40-doc property sweep."""
    from memory_engine_spark.operators.corpus import span_corrupt

    rows = [(i, " ".join(f"w{i}x{j}" for j in range(5 + i % 23)))
            for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = span_corrupt(df, "text", "doc_id").collect()
    orig = dict(rows)
    assert len(out) == 40
    for r in out:
        spans = {}
        parts = r["target_text"].split("<extra_id_")
        assert parts[0] == ""
        for p in parts[1:]:
            k, rest = p.split(">", 1)
            spans[int(k)] = rest.strip()
        assert max(spans) == r["n_spans"]      # terminal sentinel
        assert spans[max(spans)] == ""
        recon = r["input_text"]
        for k in range(r["n_spans"]):
            assert f"<extra_id_{k}>" in recon
            recon = recon.replace(f"<extra_id_{k}>", spans[k], 1)
        assert recon.split() == orig[r["doc_id"]].split()
        n_hidden = sum(len(v.split()) for k, v in spans.items()
                       if k < r["n_spans"])
        assert n_hidden == r["n_masked"]


def test_render_chat_loss_mask_invariant(spark):
    """substr(rendered, asst_start, asst_len) == the assistant text,
    for every turn of multi-turn conversations with varied lengths;
    render_md5/total_chars are conversation-level constants."""
    import hashlib

    from memory_engine_spark.operators import corpus

    convs = {1: [("hi", "hello there"), ("more?", "sure — here")],
             2: [("x", "y")],
             3: [("a b", ""), ("", "final answer"), ("q", "z9")]}
    rows = [(cid, r, u, a)
            for cid, turns in convs.items()
            for r, (u, a) in enumerate(turns)]
    df = spark.createDataFrame(
        rows, "doc_id long, round int, user_msg string, asst_msg string")
    out = corpus.render_chat(df).collect()
    rendered = {}
    for cid, turns in convs.items():
        s = corpus.CHAT_SYS
        for u, a in turns:
            s += (corpus.CHAT_U0 + u + corpus.CHAT_U1
                  + corpus.CHAT_A0 + a + corpus.CHAT_A1)
        rendered[cid] = s
    assert len(out) == len(rows)
    for r in out:
        s = rendered[r["doc_id"]]
        want = convs[r["doc_id"]][r["round"]][1]
        got = s[r["asst_start"] - 1:r["asst_start"] - 1 + r["asst_len"]]
        assert got == want, (r["doc_id"], r["round"], got, want)
        assert r["render_md5"] == hashlib.md5(s.encode()).hexdigest()
        assert r["total_chars"] == len(s)


def test_bleu_report_hand_computed(spark):
    """Clipped modified precisions against hand-computed counts:
    word-spam clipping ('the the the the' vs 'the cat' clips to 1),
    per-n components for a 1-substitution pair, perfect match -> 1.0,
    zero 4-gram overlap -> unsmoothed 0, short-input guard."""
    from memory_engine_spark.operators.corpus import bleu_report

    pairs = spark.createDataFrame(
        [(1, "the cat sat on the mat", "the cat sat on the mat"),
         (2, "the the the the", "the cat"),
         (3, "a b c d e f", "a b x d e f"),
         (4, "short", "a much longer reference here")],
        "doc_id long, cand string, ref string")
    out = {r["doc_id"]: r for r in bleu_report(pairs).collect()}
    assert out[1]["bleu"] == 1.0
    assert (out[2]["clip1"], out[2]["tot1"]) == (1, 4)
    assert out[2]["bleu"] == 0.0
    r3 = out[3]
    assert (r3["clip1"], r3["tot1"], r3["clip2"], r3["tot2"],
            r3["clip3"], r3["tot3"], r3["clip4"], r3["tot4"]) \
        == (5, 6, 3, 5, 1, 4, 0, 3)
    assert out[4]["clip1"] == 0 and out[4]["bleu"] == 0.0


def test_rouge_report_hand_computed(spark):
    """ROUGE-1/2 clipped components against hand-computed counts:
    clipping caps candidate spam at reference multiplicity; recall
    denominators come from the REFERENCE totals (the side BLEU never
    uses); perfect match -> F1 1.0; zero overlap -> all ratios 0."""
    from memory_engine_spark.operators.corpus import rouge_report

    pairs = spark.createDataFrame(
        [(1, "the cat sat", "the cat sat"),
         (2, "the the the the", "the cat"),
         (3, "a b c d", "a b x d e f"),
         (4, "zz yy", "a b c")],
        "doc_id long, cand string, ref string")
    out = {r["doc_id"]: r for r in rouge_report(pairs).collect()}
    r1 = out[1]
    assert (r1["rouge1_p"], r1["rouge1_r"], r1["rouge1_f"]) \
        == (1.0, 1.0, 1.0)
    assert (r1["match2"], r1["cand_tot2"], r1["ref_tot2"]) == (2, 2, 2)
    # spam clip: 'the' x4 in cand vs x1 in ref -> match1 = 1
    r2 = out[2]
    assert (r2["match1"], r2["cand_tot1"], r2["ref_tot1"]) == (1, 4, 2)
    assert r2["rouge1_p"] == 0.25 and r2["rouge1_r"] == 0.5
    # unigrams: a,b,d shared -> P=3/4, R=3/6, F=2*.75*.5/1.25=0.6
    r3 = out[3]
    assert (r3["match1"], r3["cand_tot1"], r3["ref_tot1"]) == (3, 4, 6)
    assert r3["rouge1_f"] == 0.6
    # bigrams: only 'a b' shared -> 1/3 vs 1/5
    assert (r3["match2"], r3["cand_tot2"], r3["ref_tot2"]) == (1, 3, 5)
    r4 = out[4]
    assert (r4["match1"], r4["rouge1_f"], r4["rouge2_f"]) \
        == (0, 0.0, 0.0)


def test_chrf_report_hand_computed(spark):
    """chrF2 components: whitespace stripping ('ab cd' and 'abcd'
    yield identical grams), effective-order averaging skips orders
    longer than the string, clipping, and the beta=2 F formula."""
    from memory_engine_spark.operators.corpus import chrf_report

    pairs = spark.createDataFrame(
        [(1, "ab cd", "abcd"),      # identical after stripping
         (2, "abc", "xyz"),        # zero overlap
         (3, "ab", "abab")],       # short: orders 3+ skipped on cand
        "doc_id long, cand string, ref string")
    out = {r["doc_id"]: r for r in chrf_report(pairs).collect()}
    r1 = out[1]
    assert (r1["m1"], r1["tc1"], r1["tr1"]) == (4, 4, 4)
    assert (r1["m4"], r1["tc4"], r1["tr4"]) == (1, 1, 1)
    assert r1["tc5"] == 0 and r1["chrf"] == 1.0
    assert out[2]["chrf"] == 0.0 and out[2]["m1"] == 0
    r3 = out[3]
    # cand 'ab': m1=2 (a,b each clip 2), m2=1 ('ab' x1 vs x2)
    assert (r3["m1"], r3["tc1"], r3["tr1"]) == (2, 2, 4)
    assert (r3["m2"], r3["tc2"], r3["tr2"]) == (1, 1, 3)
    # effective orders: P over n=1,2 (tc3..6=0), R over n=1..4
    # (ref 'abab' still has 3- and 4-grams, matched 0)
    avg_p = (2 / 2 + 1 / 1) / 2
    avg_r = (2 / 4 + 1 / 3 + 0 / 2 + 0 / 1) / 4
    exp = round(5.0 * avg_p * avg_r / (4.0 * avg_p + avg_r), 6)
    assert r3["chrf"] == exp


def test_poisson_bootstrap_weights_and_ci(spark):
    """Poisson(1) replica weights: thresholds pin ~e^-1 of rows at
    k=0 and mean weight ~1; replicate means are deterministic across
    runs; the 2.5/97.5-percentile CI epilogue brackets the true mean
    over 20 replicates."""
    from memory_engine_spark.operators.corpus import (poisson_cum_u,
                                                      poisson_bootstrap)

    cum = poisson_cum_u()
    assert cum[0] == 3679 and cum[-1] == 9999  # e^-1, cap tail
    df = spark.range(2000).selectExpr("id", "id % 101 AS v")
    out = poisson_bootstrap(df, "v", "id", n_replicates=20,
                            salt="t").collect()
    assert len(out) == 20
    # mean replica weight over all replicates ~ 1 (Poisson(1))
    tot_eff = sum(r["n_eff"] for r in out)
    assert abs(tot_eff / (20 * 2000) - 1.0) < 0.05
    true_mean = sum(i % 101 for i in range(2000)) / 2000
    means = sorted(r["mean"] for r in out)
    lo, hi = means[0], means[-1]
    assert lo <= true_mean <= hi
    assert hi - lo < 5.0  # tight CI at n=2000
    # determinism: same salt -> identical replicate means
    again = poisson_bootstrap(df, "v", "id", n_replicates=20,
                              salt="t").collect()
    assert sorted(r["mean"] for r in again) == means
