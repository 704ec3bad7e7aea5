"""Round-7 LLM-pipeline additions: content-defined chunking dedup and
corpus bigram-LM perplexity scoring."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from ds_ga1004_bigdata_project_spark.functions.text import bigram_lm_nll
from ds_ga1004_bigdata_project_spark.operators.dedup import (
    cdc_chunks, cdc_duplicate_chunks)


@pytest.fixture(scope="module")
def corpus(spark):
    import random

    rng = random.Random(5)
    words = [f"w{rng.randint(0, 400)}" for _ in range(200)]
    base = " ".join(words)
    edited = " ".join(words[:100] + ["inserted"] + words[100:])
    return spark.createDataFrame(
        [(1, base), (2, edited), (3, base)], "doc_id long, text string"), base


def test_cdc_reconstruction_exact(spark, corpus):
    df, base = corpus
    rows = sorted(cdc_chunks(df).filter(F.col("doc_id") == 1).collect(),
                  key=lambda r: r.chunk_no)
    assert " ".join(r.chunk_text for r in rows) == base
    assert len(rows) > 5  # the cut rule actually fires


def test_cdc_insertion_robustness(spark, corpus):
    # The CDC property fixed-size chunking lacks: a mid-document insertion
    # must perturb only the chunk(s) at the edit site.
    df, _ = corpus
    rows = cdc_chunks(df).collect()
    f1 = {r.fp for r in rows if r.doc_id == 1}
    f2 = {r.fp for r in rows if r.doc_id == 2}
    assert len(f1) > 5
    assert len(f1 & f2) >= len(f1) - 2  # all but the edited chunk(s) survive


def test_cdc_duplicate_report(spark, corpus):
    # doc 3 duplicates doc 1 exactly: every doc-1 chunk reports >= 2 copies
    # across 2 distinct docs, first_doc = 1.
    df, _ = corpus
    dup = cdc_duplicate_chunks(df, top_n=100).collect()
    n1 = cdc_chunks(df).filter(F.col("doc_id") == 1).count()
    full = [r for r in dup if r.n_docs >= 2]
    assert len(full) >= n1 - 1
    assert all(r.first_doc == 1 for r in full)


def test_cdc_overlap_clusters_hand_fixture(spark, corpus):
    # VERDICT r7 #5: doc-level partial-overlap clusters. docs 1/2/3 share
    # nearly all chunks (2 = edited copy, 3 = exact copy) -> ONE cluster
    # named by min id 1 with all three members; an unrelated doc never
    # joins; a doc sharing only a single chunk stays below the
    # min_shared_chunks=2 edge threshold.
    from ds_ga1004_bigdata_project_spark.operators.dedup import (
        cdc_chunks, cdc_overlap_clusters)

    df, base = corpus
    # doc 4: unrelated vocabulary; doc 5: exactly ONE chunk of doc 1
    one_chunk = sorted(cdc_chunks(df).filter("doc_id = 1").collect(),
                       key=lambda r: r.chunk_no)[1].chunk_text
    docs = df.unionByName(spark.createDataFrame(
        [(4, " ".join(f"q{i}" for i in range(80))), (5, one_chunk)],
        "doc_id long, text string"))
    out = cdc_overlap_clusters(docs).collect()
    members = {r.doc_id: r.cluster_id for r in out}
    assert members == {1: 1, 2: 1, 3: 1}
    assert all(r.n_cluster_docs == 3 for r in out)


def test_cdc_overlap_threshold_pins_edges(spark):
    # Pinned overlap-threshold semantics: exactly min_shared_chunks shared
    # fps creates the edge; one fewer does not. Build docs from two known
    # chunks by brute-force searching short token strings whose md5 cut
    # rule yields clean boundaries is fragile — instead verify against the
    # operator's own chunk table: doc B shares >= 2 chunk fps with A (copy
    # of A), doc C shares exactly 1 (single chunk), so with
    # min_shared_chunks=2 C is excluded and with 1 it joins.
    from ds_ga1004_bigdata_project_spark.operators.dedup import (
        cdc_chunks, cdc_overlap_clusters)
    import random

    rng = random.Random(9)
    a_txt = " ".join(f"w{rng.randint(0, 300)}" for _ in range(160))
    df_a = spark.createDataFrame([(1, a_txt)], "doc_id long, text string")
    chunks_a = sorted(cdc_chunks(df_a).collect(), key=lambda r: r.chunk_no)
    assert len(chunks_a) >= 3
    docs = spark.createDataFrame(
        [(1, a_txt), (2, a_txt), (3, chunks_a[1].chunk_text)],
        "doc_id long, text string")
    strict = {r.doc_id: r.cluster_id
              for r in cdc_overlap_clusters(docs, min_shared_chunks=2)
              .collect()}
    assert strict == {1: 1, 2: 1}  # C's single shared chunk is no edge
    loose = {r.doc_id: r.cluster_id
             for r in cdc_overlap_clusters(docs, min_shared_chunks=1)
             .collect()}
    assert loose == {1: 1, 2: 1, 3: 1}


def test_cdc_overlap_fp_cap_excludes_viral_chunks(spark):
    # max_fp_docs: a chunk carried by MORE docs than the cap is boilerplate
    # evidence, not overlap evidence — docs related ONLY through it never
    # cluster (and pair generation stays non-quadratic at scale).
    from ds_ga1004_bigdata_project_spark.operators.dedup import (
        cdc_overlap_clusters)
    import random

    rng = random.Random(11)
    boiler = " ".join(f"b{rng.randint(0, 99)}" for _ in range(120))
    docs = spark.createDataFrame(
        [(i, boiler) for i in range(10)], "doc_id long, text string")
    # 10 identical docs, cap below 10: every shared fp is over-cap.
    assert cdc_overlap_clusters(docs, max_fp_docs=9).count() == 0
    # cap at 10: full 10-doc cluster.
    out = cdc_overlap_clusters(docs, max_fp_docs=10).collect()
    assert {r.doc_id for r in out} == set(range(10))
    assert all(r.cluster_id == 0 and r.n_cluster_docs == 10 for r in out)


def test_bigram_lm_hand_values(spark):
    # corpus bigrams: d1 (a,b)(b,a)(a,b)(b,c); d2 (a,b); d4 (c,c)(c,c)
    # c2: (a,b)=3 (b,a)=1 (b,c)=1 (c,c)=2; c1: a=3 b=2 c=2; V={a,b,c,z}=4
    df = spark.createDataFrame(
        [(1, "a b a b c"), (2, "a b"), (3, "z"), (4, "c c c")],
        "doc_id long, text string")
    out = {r.doc_id: r for r in bigram_lm_nll(df).collect()}
    assert 3 not in out  # single-token doc: no bigrams, no row
    k, v = 0.5, 4

    def lp(c2, c1):
        return round(math.log((c2 + k) / (c1 + k * v)), 4)

    assert out[2].n_bigrams == 1
    assert out[2].mean_nll == pytest.approx(round(-lp(3, 3), 4), abs=1e-9)
    d1 = -(lp(3, 3) * 2 + lp(1, 2) + lp(1, 2))
    assert out[1].n_bigrams == 4
    assert out[1].mean_nll == pytest.approx(round(d1 / 4, 4), abs=1e-4)


def test_bigram_lm_flags_off_domain_doc(spark):
    # 30 docs sharing a vocabulary + one gibberish doc: the outlier must
    # score the highest NLL (the quality-filter use case).
    rows = [(i, "the quick brown fox jumps over the lazy dog again and again")
            for i in range(30)]
    rows.append((99, "zxqv kjhw pqrs mnbv zxqv kjhw"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    top = (bigram_lm_nll(df)
           .orderBy(F.desc("mean_nll"), "doc_id").first())
    assert top.doc_id == 99


def test_cross_doc_boilerplate_hand_case(spark):
    from ds_ga1004_bigdata_project_spark.operators.dedup import (
        cross_doc_boilerplate)

    # 10 docs: all share the trigram "legal header text" (df=10 -> always
    # boilerplate at any permille); unique tails keep ratios fractional.
    rows = [(i, "s0" if i < 5 else "s1",
             f"legal header text unique{i} tail{i} body{i}")
            for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {r.source: r for r in
           cross_doc_boilerplate(df, n=3, df_permille=500,
                                 flag_ratio=0.2).collect()}
    # each doc: 4 distinct trigrams, exactly 1 boilerplate -> ratio 0.25
    for s in ("s0", "s1"):
        assert out[s].n_docs == 5
        assert out[s].n_flagged == 5  # 0.25 > 0.2
        assert float(out[s].mean_boiler_ratio) == pytest.approx(0.25)


def test_bigram_lm_separate_train_corpus_smooths_unseen(spark):
    # Model trained ONLY on doc 1 ("a b a b"): c2 (a,b)=2 (b,a)=1,
    # c1 a=2 b=1, V={a,b}=2. Scoring doc 2 "a b z": bigram (a,b) seen,
    # (b,z) unseen under seen w1=b -> ln(k/(c1_b + kV)); doc 3 "z z":
    # fully unseen w1 -> ln(k/(kV)) = ln(1/V).
    import math

    train = spark.createDataFrame([(1, "a b a b")],
                                  "doc_id long, text string")
    score = spark.createDataFrame([(2, "a b z"), (3, "z z")],
                                  "doc_id long, text string")
    out = {r.doc_id: r for r in
           bigram_lm_nll(score, train_df=train).collect()}
    k, v = 0.5, 2
    lp_ab = round(math.log((2 + k) / (2 + k * v)), 4)
    lp_bz = round(math.log((0 + k) / (1 + k * v)), 4)
    lp_zz = round(math.log((0 + k) / (0 + k * v)), 4)
    assert out[2].n_bigrams == 2
    assert out[2].mean_nll == pytest.approx(
        round(-(lp_ab + lp_bz) / 2, 4), abs=1e-9)
    assert out[3].mean_nll == pytest.approx(round(-lp_zz, 4), abs=1e-9)
    # exact decimal sum exposed for cross-model differencing (q157)
    assert float(out[2].sum_nll) == pytest.approx(-(lp_ab + lp_bz), abs=1e-9)


def test_bigram_lm_default_train_is_unchanged_by_refactor(spark):
    # train_df=None must reproduce the historical self-trained values —
    # the left-join coalesces are inert when every bigram is in-model.
    df = spark.createDataFrame(
        [(1, "a b a b c"), (2, "a b"), (4, "c c c")],
        "doc_id long, text string")
    a = sorted((r.doc_id, r.n_bigrams, r.mean_nll)
               for r in bigram_lm_nll(df).collect())
    b = sorted((r.doc_id, r.n_bigrams, r.mean_nll)
               for r in bigram_lm_nll(df, train_df=df).collect())
    assert a == b
