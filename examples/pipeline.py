#!/usr/bin/env python
"""End-to-end tour of the engine on the sf0.001 test tables (~1 min, local).

Runs the full story a reference user needs: catalog → relational analytics →
text-quality funnel → tiered dedup → vector search → recsys train/evaluate →
streaming twin. Each stage prints a couple of result rows.

    python examples/pipeline.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from ds_ga1004_bigdata_project_spark.ml import als as A  # noqa: E402
from ds_ga1004_bigdata_project_spark.ml import protocol as P  # noqa: E402
from ds_ga1004_bigdata_project_spark.operators import dedup, relational as rel  # noqa: E402
from ds_ga1004_bigdata_project_spark.operators import similarity as sim  # noqa: E402
from ds_ga1004_bigdata_project_spark.operators.aggregates import exact_sum  # noqa: E402
from ds_ga1004_bigdata_project_spark.session import get_local_session  # noqa: E402
from ds_ga1004_bigdata_project_spark.sources.catalog import Catalog  # noqa: E402


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = get_local_session(8, app_name="engine-tour")
    spark.sparkContext.setLogLevel("ERROR")
    cat = Catalog(spark, sf_dir)

    print("== 1. relational analytics: revenue per nation (star join) ==")
    joined = rel.join_chain(
        cat.lineitem,
        (F.broadcast(cat.orders.select("o_orderkey", "o_custkey")),
         F.col("l_orderkey") == F.col("o_orderkey")),
        (F.broadcast(cat.customer.select("c_custkey", "c_nationkey")),
         F.col("o_custkey") == F.col("c_custkey")),
        (F.broadcast(cat.nation), F.col("c_nationkey") == F.col("n_nationkey")),
    )
    joined.groupBy("n_name").agg(exact_sum("l_extendedprice", "revenue")) \
        .orderBy(F.desc("revenue")).show(3, truncate=False)

    print("== 2. text-quality funnel + exact dedup ==")
    docs = cat.documents
    keep = dedup.exact_dedup(docs).select(F.col("keep_id").alias("doc_id"))
    cleaned = rel.semi_join(docs, keep, "doc_id")
    print(f"docs {docs.count()} -> {cleaned.count()} after exact dedup")

    print("== 3. near-dup pairs (native banded MinHash, exact-Jaccard verify) ==")
    pairs = dedup.minhash_banded_pairs(docs, n=5, min_jaccard=0.8)
    pairs.orderBy(F.desc("jaccard")).show(3)

    print("== 4. vector search: top-3 cosine neighbors for 3 query vectors ==")
    emb = cat.embeddings
    sim.cosine_topk(emb, emb.filter(F.col("vec_id") < 3), k=3).show(9)

    print("== 5. recsys: implicit ALS on (customer, part, qty) ==")
    inter = A.interactions_from_orders(cat.lineitem, cat.orders)
    model = A.train_als(inter, A.ALSConfig(rank=8, max_iter=5, num_blocks=4))
    P_ = A.evaluate_model(model, inter, k=10)
    P_.show()
    splits = P.make_splits(inter, val_frac=0.2, test_frac=0.2)
    print(f"splits: train={splits.train.count()} val={splits.validation.count()} "
          f"test={splits.test.count()}")

    print("== 6. event-time windows (same expressions run under readStream) ==")
    cat.events.groupBy(F.window("ts", "1 hour"), "event_type") \
        .agg(F.count(F.lit(1)).alias("n")).orderBy(F.desc("n")).show(3, truncate=False)

    print("== 7. learned quality gate (featurize -> LR -> corpus scores) ==")
    from ds_ga1004_bigdata_project_spark.ml import quality as Q
    qm = Q.train_quality_classifier(docs)
    print(f"heldout AUC={qm.train_auc_row[0]:.4f}")
    Q.score_corpus(qm, docs).orderBy("quality_score").show(3)

    print("== 8. eval-set decontamination (5-gram overlap vs train split) ==")
    dedup.cross_split_ngram_overlap(docs, ["src0", "src1"], n=5) \
        .orderBy(F.desc("n_shared_ngrams")).show(3)

    print("== 9. corpus assembly: decontaminate -> mix -> quota -> shard ==")
    import tempfile

    from ds_ga1004_bigdata_project_spark.operators import sampling as S
    from ds_ga1004_bigdata_project_spark.sources.catalog import (
        write_training_shards)

    clean = dedup.decontaminate_corpus(docs, ["src0", "src1"], n=5)
    mixed = S.mixture_sample(clean, "source", "doc_id",
                             {"src2": 1.0, "src3": 0.5}, default=0.25)
    balanced = S.per_group_quota_sample(mixed, "source", "doc_id", quota=20)
    with tempfile.TemporaryDirectory() as tmp:
        write_training_shards(balanced, f"{tmp}/shards", "doc_id", n_shards=4)
        out = spark.read.parquet(f"{tmp}/shards")
        out.groupBy("shard").count().orderBy("shard").show()
    print(f"corpus: {docs.count()} -> clean {clean.count()} "
          f"-> mixed {mixed.count()} -> balanced {balanced.count()}")

    print("== 10. stream-stream interval join (click -> purchase attribution) ==")
    from ds_ga1004_bigdata_project_spark.streaming import events as SE

    epath = os.path.join(sf_dir, "events.parquet")
    clicks = SE.read_event_stream_auto(spark, epath) \
        .filter(F.col("event_type") == "click")
    purchases = SE.read_event_stream_auto(spark, epath) \
        .filter(F.col("event_type") == "purchase")
    SE.run_available_now(
        SE.interval_join_streams(clicks, purchases, max_span="1 hour"),
        "tour_ssj", output_mode="append")
    spark.table("tour_ssj").show(3)

    print("== 11a. sequence packing: offsets + per-pack slices ==")
    from ds_ga1004_bigdata_project_spark.functions.text import (
        sequence_pack_slices)

    caches: list = []
    slices = sequence_pack_slices(docs, seq_len=512, caches=caches) \
        .localCheckpoint(eager=True)
    for c in caches:
        c.unpersist()
    slices.groupBy("pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("slice_len").alias("n_tokens")).orderBy("pack_id").show(3)

    print("== 11b. int8-quantized neighbor candidates (exact integer dots) ==")
    sim.quantized_topk(emb, emb.filter(F.col("vec_id") < 2), k=3).show(6)

    print("== 11c. negative sampling for the implicit trainer ==")
    from ds_ga1004_bigdata_project_spark.ml.protocol import negative_sample
    items = cat.part.select(F.col("p_partkey").alias("item_id"))
    inter_pairs = inter.select(F.col("user_id"),
                               F.col("item_id")).distinct()
    negs = negative_sample(inter_pairs, items, n_negatives=4)
    print(f"negative pairs: {negs.count()} "
          f"(~4/user minus positives and collisions)")

    print("== 11d. semantic dedup + curriculum phases over embeddings ==")
    from ds_ga1004_bigdata_project_spark.functions import text as T
    from ds_ga1004_bigdata_project_spark.operators import ranks

    cents = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec"))
    surv = sim.semantic_neardup_survivors(emb, cents, threshold=0.3)
    print(f"SemDeDup: {emb.count()} vectors -> {surv.count()} survivors")
    scored = docs.select(
        "doc_id", T.distinct_token_ratio(T.ws_tokens(F.col("text")),
                                         scale=None).alias("score"))
    caches2: list = []
    phased = ranks.global_distribution_ranks(
        scored, key_cols=["score"], tiebreak_cols=["doc_id"],
        ntile=4, caches=caches2).localCheckpoint(eager=True)
    for c in caches2:
        c.unpersist()
    phased.groupBy("ntile").count().orderBy("ntile").show()

    print("== 11e. bloom-pruned join: lineitems of urgent orders ==")
    from ds_ga1004_bigdata_project_spark.operators import bloom

    urgent = cat.orders.filter(F.col("o_orderpriority") == "1-URGENT")
    kept = bloom.bloom_semi_join(cat.lineitem, urgent,
                                 "l_orderkey", "o_orderkey")
    print(f"probe {cat.lineitem.count()} rows -> {kept.count()} "
          f"after bloom+exact (bitset: 128 KiB broadcast)")

    print("== 11f. web-text cleanup + sentence-boundary chunking ==")
    from ds_ga1004_bigdata_project_spark.functions import text as TX

    html_doc = spark.createDataFrame(
        [(9001, "<html><script>x</script><p>Hello &amp; welcome. "
                "Second sentence here. A third one too.</p></html>")],
        "doc_id long, text string")
    cleaned = html_doc.select(
        "doc_id", TX.strip_html(F.col("text")).alias("text"))
    TX.chunk_by_sentences(cleaned, max_tokens=5) \
        .select("chunk_idx", "n_sentences", "n_tokens", "chunk_text").show(truncate=False)

    print("== 11g. graph-walk item importance (PageRank on interactions) ==")
    from ds_ga1004_bigdata_project_spark.operators import graph as GR

    pr_inter = rel.persisted(
        cat.orders.join(cat.lineitem,
                        F.col("o_orderkey") == F.col("l_orderkey"))
        .select("o_custkey", "l_partkey").distinct())
    pr = GR.pagerank(GR.bipartite_interaction_edges(
        pr_inter, "o_custkey", "l_partkey"), iters=2)
    (pr.filter(F.col("node") % 2 == 0)
       .select((F.col("node") / 2).cast("long").alias("part"),
               F.round("rank", 4).alias("pr"))
       .orderBy(F.desc("pr"), "part").show(3))
    pr_inter.unpersist()

    print("== 11h. k-anonymous release gate before export ==")
    from ds_ga1004_bigdata_project_spark.operators.privacy import (
        k_anonymity_report)

    quasi = (cat.customer.join(F.broadcast(cat.nation),
                               F.col("c_nationkey") == F.col("n_nationkey"))
             .select("c_mktsegment", "n_name",
                     F.floor(F.col("c_acctbal") / 1000).alias("bal_kbucket")))
    k_anonymity_report(
        quasi, ["c_mktsegment", "n_name", "bal_kbucket"], k=5).show()

    print("== 11. M7 hyperparameter sweep -> results relation ==")
    # The reference's rank x regParam protocol (param_train_2nd.py:43-85),
    # one ALS fit + distributed ranking-metrics eval per cell, materialized
    # as a queryable relation and written like any other table.
    # `python examples/pipeline.py /root/testdata/sf0.01` runs it at the
    # measured scale from SCALE.md.
    # Round 7: the sweep evaluates against a held-out split with partial
    # eval-user histories in train (the MSD protocol — holdout_splits),
    # exactly as tools/sweep_artifact.py reproduces it at sf0.1.
    hs = P.holdout_splits(inter, val_frac=0.2, test_frac=0.2)
    grid = A.param_grid(ranks=(4, 8), regs=(0.05, 0.2), alphas=(10.0,),
                        max_iter=3, num_blocks=4)
    res = A.sweep_results_df(
        spark, A.sweep(hs.train, grid, k=10,
                       eval_interactions=hs.validation))
    with tempfile.TemporaryDirectory() as tmp:
        res.write.parquet(f"{tmp}/sweep_results")
        spark.read.parquet(f"{tmp}/sweep_results") \
            .orderBy(F.desc("map")).show(truncate=False)

    print("== 12. LLM-corpus curation & retrieval (round-8 surface) ==")
    docs = cat.documents

    print("-- 12a. duplicated-span rewrite (Lee et al. substring dedup) --")
    dedup.span_dedup_rewrite(docs, k=8) \
        .filter(F.col("n_removed") > 0) \
        .orderBy(F.desc("n_removed"), "doc_id") \
        .select("doc_id", "n_tokens", "n_removed").show(3)

    print("-- 12a2. CDC chunk-overlap clusters (partial-overlap dedup) --")
    caches12 = []
    dedup.cdc_overlap_clusters(docs, caches=caches12) \
        .orderBy(F.desc("n_cluster_docs"), "cluster_id", "doc_id").show(4)
    for c in caches12:
        c.unpersist()

    print("-- 12b. BPE merge learning (tokenizer training) --")
    from ds_ga1004_bigdata_project_spark.functions import subword

    subword.bpe_learn(docs, n_merges=8).orderBy("merge_rank").show(8)

    print("-- 12c. hybrid retrieval: BM25 + dense cosine, RRF-fused --")
    from pyspark.sql.window import Window as W

    probes = (docs.filter(F.col("doc_id") < 3)
              .select(F.col("doc_id").alias("query_id"),
                      F.col("text").alias("qtext")))
    sparse = TX.bm25_topk(docs, probes, k=20, exclude_query_doc=True)
    emb = cat.embeddings
    wd = W.partitionBy("query_id").orderBy(F.desc("cosine_sim"),
                                           F.asc("neighbor_id"))
    dense_ranked = (sim.cosine_topk(emb, emb.filter(F.col("vec_id") < 3),
                                    k=20)
                    .withColumn("rank", F.row_number().over(wd))
                    .select("query_id",
                            F.col("neighbor_id").alias("doc_id"), "rank"))
    sim.rrf_fuse(sparse, dense_ranked, k=5) \
        .orderBy("query_id", "rank").show(10)

    print("-- 12d. hard negatives for contrastive training --")
    sim.hard_negatives(emb, docs, emb.filter(F.col("vec_id") < 3),
                       k_dense=10, k_out=3).show(9)

    print("-- 12e. Moore-Lewis domain selection (most en-like non-en docs) --")
    target = docs.filter(F.col("lang") == "en")
    h_t = (TX.bigram_lm_nll(docs, train_df=target)
           .select("doc_id", "n_bigrams", F.col("sum_nll").alias("sum_t")))
    h_r = (TX.bigram_lm_nll(docs)
           .select("doc_id", F.col("sum_nll").alias("sum_r")))
    (h_t.join(h_r, "doc_id")
        .join(docs.select("doc_id", "lang"), "doc_id")
        .filter(F.col("lang") != "en")
        .select("doc_id", "lang",
                ((F.col("sum_t") - F.col("sum_r")).cast("double")
                 / F.col("n_bigrams")).alias("ce_diff"))
        .orderBy("ce_diff", "doc_id").show(5))

    print("-- 12f. leakage-safe split + ANN-tier recall check --")
    dedup.leakage_safe_split(docs).groupBy("split") \
        .agg(F.count("*").alias("n_docs")).orderBy("split").show()
    from ds_ga1004_bigdata_project_spark.ml import metrics as MM

    truth = sim.cosine_topk(emb, emb.filter(F.col("vec_id") < 5), k=10)
    cand = sim.quantized_topk(emb, emb.filter(F.col("vec_id") < 5), k=10)
    MM.retrieval_recall_at_k(truth, cand, k=10).orderBy("query_id").show()

    print("== 13. corpus statistics & training-order surface ==")

    print("-- 13a. PMI collocations (phrase/tokenizer-vocab mining) --")
    TX.pmi_collocations(docs, min_count=3) \
        .orderBy(F.desc("pmi"), "w1", "w2").show(5)

    print("-- 13b. temperature-scaled mixture plan (tau=0.7) --")
    toks = docs.select("source",
                       F.size(TX.ws_tokens(F.col("text")))
                        .alias("n_tokens"))
    S.temperature_mixture_plan(toks, tau=0.7, budget=10_000) \
        .orderBy(F.desc("weight")).show(5)

    print("-- 13c. epoch-shuffle microbatch manifest (budget=1024) --")
    d2 = docs.select("doc_id",
                     F.size(TX.ws_tokens(F.col("text"))).alias("n_tokens"))
    S.epoch_batch_manifest(d2, "doc_id", "n_tokens",
                           budget=1024, epochs=2) \
        .orderBy("epoch", "batch_id").show(6)

    print("-- 13d. trigram stupid-backoff scoring (held-out src0) --")
    TX.stupid_backoff_nll(docs,
                          train_df=docs.filter(F.col("source") != "src0")) \
        .orderBy(F.desc("mean_nll"), "doc_id") \
        .select("doc_id", "n_trigrams", "n_bi_backoffs",
                "n_uni_backoffs", "mean_nll").show(5)

    print("-- 13e. source JSD matrix (closest + farthest source pairs) --")
    jsd = TX.source_js_divergence(docs)
    jsd.orderBy("jsd").show(3)
    jsd.orderBy(F.desc("jsd")).show(3)

    print("-- 13f. BPE fertility per language --")
    subword.bpe_fertility(docs, n_merges=8, group_col="lang") \
        .orderBy("lang").show()

    print("-- 13g. winnowing fingerprint similarity (MOSS) --")
    dedup.winnowing_pairs(docs, k=4, w=5, min_shared=2) \
        .orderBy(F.desc("n_shared"), "doc_a", "doc_b").show(5)

    print("-- 13h. blocklist gate + per-source PSI-style accounting --")
    TX.blocklist_stats(docs, terms=("dup", "spam"), group_col="source") \
        .orderBy(F.desc("flagged_rate")).show(4)

    print("-- 13i. keep-best dedup (quality argmax per canonical group) --")
    score = F.expr("(size(array_distinct(split(lower(text), '\\\\s+'))) "
                   "* 10000L) div size(split(lower(text), '\\\\s+'))")
    dedup.exact_dedup_keep_best(docs, score, fingerprint=True) \
        .filter(F.col("dup_cnt") > 1) \
        .orderBy(F.desc("dup_cnt")).show(4)

    print("-- 13j. prefix-filtered exact similarity join (PPJoin) --")
    caches13 = []
    dedup.prefix_filtered_jaccard_pairs(docs, threshold=0.5,
                                        caches=caches13) \
        .orderBy(F.desc("jaccard"), "a", "b").show(4)
    for c in caches13:
        c.unpersist()

    print("-- 13k. co-purchase triangle participation --")
    from ds_ga1004_bigdata_project_spark.operators.graph import (
        triangle_participation)

    items = cat.lineitem.select("l_orderkey", "l_partkey").distinct()
    ia = items.select("l_orderkey", F.col("l_partkey").alias("u"))
    ib = items.select(F.col("l_orderkey").alias("_ok2"),
                      F.col("l_partkey").alias("v"))
    tri_edges = (ia.join(ib, (F.col("l_orderkey") == F.col("_ok2"))
                         & (F.col("u") < F.col("v")))
                 .select("u", "v").distinct())
    triangle_participation(tri_edges, src="u", dst="v") \
        .orderBy(F.desc("n_triangles"), "node").show(5)

    print("-- 14a. DSIR importance weights (target = src0) --")
    caches14 = []
    TX.dsir_importance(docs.withColumn("_t", F.col("source") == "src0"),
                       "_t", caches=caches14) \
        .orderBy(F.desc("weight"), "doc_id").show(4)
    for c in caches14:
        c.unpersist()

    print("-- 14b. priority sample (exact-quota, size-weighted) --")
    from ds_ga1004_bigdata_project_spark.operators.sampling import (
        priority_sample)

    priority_sample(docs, "doc_id", "n_chars", 5, salt=7) \
        .select("doc_id", "n_chars", "_priority").show(5)

    print("-- 14c. scorer calibration + labeler agreement (kappa) --")
    from ds_ga1004_bigdata_project_spark.ml.metrics import (
        calibration_table, cohens_kappa)

    toks14 = TX.ws_tokens(F.col("text"))
    scored14 = docs.select(TX.stopword_ratio(toks14).alias("score"),
                           (F.col("lang") == "en").alias("label"))
    calibration_table(scored14, "score", "label").show(10)
    labeled14 = docs.select(TX.lang_id(toks14).alias("pred"),
                            F.col("lang").alias("gold"))
    cohens_kappa(labeled14, "pred", "gold").show()

    print("-- 14d. Zipf slope (corpus-health diagnostic) --")
    TX.zipf_slope(docs, top_n=100).show()

    print("-- 14e. n-gram novelty of held-out docs vs train --")
    from ds_ga1004_bigdata_project_spark.operators.sampling import (
        _perm_rank)

    hs = F.pmod(_perm_rank("doc_id", 42), F.lit(10))
    d14 = docs.withColumn("_hs", hs)
    dedup.ngram_novelty(d14.filter(F.col("_hs") < 8),
                        d14.filter(F.col("_hs") >= 8), n=3) \
        .orderBy("novelty", "doc_id").show(4)

    print("-- 14f. CCNet head/middle/tail perplexity buckets --")
    from ds_ga1004_bigdata_project_spark.queries import REGISTRY

    REGISTRY["q182_ccnet_buckets"].build(spark, sf_dir).show(15)

    print("-- 14g. dedup threshold curve (one candidate pass) --")
    caches14g = []
    dedup.jaccard_threshold_curve(docs, caches=caches14g).show()
    for c in caches14g:
        c.unpersist()

    print("-- 14h. Poisson-bootstrap CI for a corpus-mean metric --")
    from ds_ga1004_bigdata_project_spark.operators.sampling import (
        poisson_bootstrap_ci)

    scored14h = docs.select(
        "doc_id", TX.distinct_token_ratio(
            TX.ws_tokens(F.col("text")), scale=None).alias("score"))
    poisson_bootstrap_ci(scored14h, "score", "doc_id", b=50).show()

    print("-- 14i. Heaps'-law vocabulary growth (nested subsamples) --")
    TX.vocab_growth(docs).show()

    print("-- 14j. UniMax budget split (1-epoch cap) --")
    from ds_ga1004_bigdata_project_spark.operators.sampling import (
        unimax_allocation)

    toks14j = docs.select(
        "source", F.size(TX.ws_tokens(F.col("text"))).alias("n_tok"))
    unimax_allocation(toks14j, "source", "n_tok", budget=2500).show(5)

    print("-- 14k. Borda rank fusion of quality signals --")
    REGISTRY["q187_borda_fusion"].build(spark, sf_dir).show(5)

    print("-- 14l. padding-waste audit for bucketed batching --")
    TX.padding_waste(docs).show()

    print("-- 14m. Gopher repetition gate (dup n-gram char fractions) --")
    TX.gopher_repetition(docs, top_n=5).show(5, truncate=False)

    print("-- 14o. WordPiece merges (likelihood-score argmax) --")
    from ds_ga1004_bigdata_project_spark.functions.subword import (
        wordpiece_learn)

    wordpiece_learn(docs, n_merges=4).show()

    print("-- 14n. margin-criterion pair mining (ratio margin, k-NN) --")
    from ds_ga1004_bigdata_project_spark.operators.similarity import (
        margin_topk, mmr_select)

    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    margin_topk(embs, top_n=5).show(5)

    print("-- 14p. MMR diversity selection (greedy, shuffle-free) --")
    mmr_select(embs, k=5).show()

    print("-- 14q. kNN label-consistency probe of the embedding space --")
    REGISTRY["q193_knn_label_eval"].build(spark, sf_dir).show()

    print("-- 14r. self-retrieval MRR of the BM25 stack (no labels) --")
    rr = REGISTRY["q194_self_retrieval_eval"].build(spark, sf_dir)
    rr.agg(F.round(F.avg("rr"), 4).alias("mrr"),
           F.sum(F.when(F.col("found_rank") > 0, 1).otherwise(0))
           .alias("n_found")).show()

    print("-- 14s. ORC roundtrip (columnar-format portability) --")
    REGISTRY["q195_orc_roundtrip"].build(spark, sf_dir).show(5)

    print("-- 14t. bigram entropy (lowest = most template-like) --")
    REGISTRY["q196_bigram_entropy"].build(spark, sf_dir).show(5)

    print("-- 14u. streaming exact dedup (dropDuplicates state drain) --")
    REGISTRY["q197_streaming_dedup"].build(spark, sf_dir).show()

    print("-- 14v. length-vs-quality correlation (selection-bias check) --")
    REGISTRY["q198_length_quality_corr"].build(spark, sf_dir).show()

    print("== 15. round-10 wave: mixture update, filter QA, "
          "streaming state, reservoirs ==")

    print("-- 15a. DoReMi reweight (one multiplicative-weights step) --")
    REGISTRY["q199_doremi_reweight"].build(spark, sf_dir) \
        .select("source", "src_loss", "base_share", "new_weight").show(5)

    print("-- 15b. quality-filter agreement matrix (keep-set Jaccard) --")
    REGISTRY["q200_filter_agreement"].build(spark, sf_dir).show()

    print("-- 15c. streaming session windows (native gap merge, drained) --")
    REGISTRY["q201_stream_session_windows"].build(spark, sf_dir).show(5)

    print("-- 15d. streaming MERGE keep-latest (foreachBatch upsert) --")
    REGISTRY["q202_stream_upsert_latest"].build(spark, sf_dir).show()

    print("-- 15e. deterministic k-per-source reservoir --")
    REGISTRY["q203_group_reservoir"].build(spark, sf_dir) \
        .groupBy("source").count().orderBy("source").show(5)

    print("-- 15f. quality gate on the streaming engine (ingest-time) --")
    REGISTRY["q204_stream_quality_gate"].build(spark, sf_dir).show(5)

    print("-- 15g. curriculum interleave (easy-first, source-balanced) --")
    REGISTRY["q205_curriculum_interleave"].build(spark, sf_dir).show(5)

    print("-- 15h. Pareto frontier (quality vs length skyline) --")
    REGISTRY["q206_pareto_frontier"].build(spark, sf_dir).show(5)

    print("-- 15i. per-source quantile normalization (scalable pct_rank) --")
    REGISTRY["q207_quantile_normalize"].build(spark, sf_dir).show(5)

    print("-- 15j. cross-source duplicate-flow matrix --")
    REGISTRY["q208_source_overlap_matrix"].build(spark, sf_dir).show(5)

    print("== 16. round-11 wave: observability, privacy, robustness, "
          "streaming rollups ==")

    print("-- 16a. streaming windowed top-k (6h leaderboard) --")
    REGISTRY["q209_stream_windowed_topk"].build(spark, sf_dir).show(6)

    print("-- 16b. k-anonymity audit (QI group-size risk) --")
    REGISTRY["q210_k_anonymity"].build(spark, sf_dir).show(5)

    print("-- 16c. robust MAD outlier gate (median + MAD per source) --")
    REGISTRY["q211_mad_outliers"].build(spark, sf_dir).show(5)

    print("-- 16d. token-mass length quantiles (packing planner) --")
    REGISTRY["q212_token_mass_quantiles"].build(spark, sf_dir).show(5)

    print("-- 16e. dedup-funnel accounting (stage survival) --")
    REGISTRY["q213_dedup_funnel"].build(spark, sf_dir).show()

    print("-- 16f. embedding dispersion (per-label drift audit) --")
    REGISTRY["q214_embedding_dispersion"].build(spark, sf_dir).show(5)

    print("-- 16g. deterministic sampling on the streaming engine --")
    REGISTRY["q215_stream_modulo_sample"].build(spark, sf_dir).show(5)

    print("-- 16h. quality-gate rule ablation (unique kills) --")
    REGISTRY["q216_gate_ablation"].build(spark, sf_dir).show()

    print("-- 16i. language-mix chi-square (mixture drift) --")
    REGISTRY["q217_lang_mix_chisq"].build(spark, sf_dir).show(5)

    print("-- 16j. source vocabulary overlap (lexical Jaccard matrix) --")
    REGISTRY["q218_source_vocab_overlap"].build(spark, sf_dir).show(5)

    print("-- 16k. stateful lag enrichment (online deltas, streaming) --")
    REGISTRY["q219_stream_lag_enrich"].build(spark, sf_dir).show(5)

    print("== 17. round-12 wave: event analytics, corpus economics, "
          "privacy depth ==")

    print("-- 17a. l-diversity audit (sensitive-value homogeneity) --")
    REGISTRY["q220_l_diversity"].build(spark, sf_dir).show(5)

    print("-- 17b. ordered event funnel (sequenced conversion) --")
    REGISTRY["q221_event_funnel"].build(spark, sf_dir).show()

    print("-- 17c. Kaplan-Meier conversion survival (censored at 72h) --")
    REGISTRY["q222_survival_curve"].build(spark, sf_dir).show(5)

    print("-- 17d. int8 quantization error audit (vector compression) --")
    REGISTRY["q223_embedding_quantization"].build(spark, sf_dir).show(5)

    print("-- 17e. vocabulary coverage curve (OOV vs vocab size) --")
    REGISTRY["q224_vocab_coverage"].build(spark, sf_dir).show()

    print("-- 17f. grouped OLS trend slopes (value drift) --")
    REGISTRY["q225_value_trend_slopes"].build(spark, sf_dir).show()

    print("-- 17g. gap-filled hourly series audit (silent hours) --")
    REGISTRY["q226_gapfill_hourly"].build(spark, sf_dir).show()

    print("-- 17h. session path mining (top trigrams) --")
    REGISTRY["q227_session_paths"].build(spark, sf_dir).show(5)

    print("-- 17i. session concurrency profile (daily peaks) --")
    REGISTRY["q228_session_concurrency"].build(spark, sf_dir).show(5)

    print("-- 17j. token-mass Gini (corpus balance) --")
    REGISTRY["q229_token_gini"].build(spark, sf_dir).show(5)

    print("-- 17k. stateful funnel on the streaming engine --")
    REGISTRY["q230_stream_funnel_stages"].build(spark, sf_dir).show()

    print("== 18. round-13 wave: the q53 oracle twin, basket mining, "
          "customer analytics, robust stats ==")

    print("-- 18a. top-k recommend twin (q53's unnest path, oracled) --")
    REGISTRY["q231_topk_recommend_twin"].build(spark, sf_dir).show(5)

    print("-- 18b. market-basket pair lift (co-purchase mining) --")
    REGISTRY["q232_basket_pair_lift"].build(spark, sf_dir).show(5)

    print("-- 18c. growth accounting (new/retained/resurrected/churned) --")
    REGISTRY["q233_growth_accounting"].build(spark, sf_dir).show()

    print("-- 18d. RFM segmentation (value-domain quartiles) --")
    REGISTRY["q234_rfm_segments"].build(spark, sf_dir).show(5)

    print("-- 18e. referential-integrity audit --")
    REGISTRY["q235_referential_audit"].build(spark, sf_dir).show()

    print("-- 18f. seasonal residual outlier hours --")
    REGISTRY["q236_residual_outlier_hours"].build(spark, sf_dir).show(5)

    print("-- 18g. last-touch revenue attribution --")
    REGISTRY["q237_last_touch_attribution"].build(spark, sf_dir).show()

    print("-- 18h. inter-arrival burstiness (per-user gaps) --")
    REGISTRY["q238_interarrival_burstiness"].build(spark, sf_dir).show()

    print("-- 18i. winsorized robust mean --")
    REGISTRY["q239_winsorized_stats"].build(spark, sf_dir).show()

    print("-- 18j. week-over-week revenue movers --")
    REGISTRY["q240_weekly_top_movers"].build(spark, sf_dir).show(5)

    print("-- 18k. recursive EWMA smoothing (dyadic-exact) --")
    REGISTRY["q241_ewma_daily"].build(spark, sf_dir).show(5)

    print("-- 18l. conversion-latency cohorts --")
    REGISTRY["q242_time_to_convert"].build(spark, sf_dir).show()

    print("== 19. round-14 wave: audits, experimentation, "
          "robust statistics ==")

    print("-- 19a. Benford first-digit audit (fraud screen) --")
    REGISTRY["q243_benford_first_digit"].build(spark, sf_dir).show()

    print("-- 19b. Theil-Sen robust trend + Mann-Kendall S --")
    REGISTRY["q244_theil_sen_trend"].build(spark, sf_dir).show()

    print("-- 19c. consecutive-day activity streaks --")
    REGISTRY["q245_activity_streaks"].build(spark, sf_dir).show(5)

    print("-- 19d. order-to-ship lead-time SLA profile --")
    REGISTRY["q246_lead_time_sla"].build(spark, sf_dir).show(5)

    print("-- 19e. A/A two-proportion z-test (experiment null check) --")
    REGISTRY["q247_aa_proportion_ztest"].build(spark, sf_dir).show()

    print("-- 19f. supplier revenue concentration (HHI) --")
    REGISTRY["q248_supplier_hhi"].build(spark, sf_dir).show(5)

    print("-- 19g. Spearman rank correlation of scoring rules --")
    REGISTRY["q249_spearman_rank_corr"].build(spark, sf_dir).show()

    print("-- 19h. join-key skew audit (broadcast/salt/AQE triage) --")
    REGISTRY["q250_join_key_skew_audit"].build(spark, sf_dir).show()

    print("-- 19i. decile lift / cumulative gains table --")
    REGISTRY["q251_decile_lift"].build(spark, sf_dir).show()

    print("-- 19j. nearest-centroid confusion matrix --")
    REGISTRY["q252_centroid_confusion"].build(spark, sf_dir).show(5)

    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:2])
