"""Unit semantics for the round-8 corpus-statistics additions: PMI
collocations (q160), the epoch-shuffle microbatch manifest (q161), trigram
stupid-backoff scoring (q162), and the source JSD matrix (q163). Hand-sized
corpora with hand-computed expectations — the driver parity suite covers the
cross-engine contract; these pin the math itself."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from ds_ga1004_bigdata_project_spark.functions import text as T
from ds_ga1004_bigdata_project_spark.operators import sampling


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ---------------------------------------------------------------- PMI


def test_pmi_matches_hand_computation(spark):
    # corpus: "a b" x 4, "a c" x 2  ->  tokens: a=6, b=4, c=2, N=12
    # bigrams: (a,b)=4, (a,c)=2, M=6
    df = _docs(spark, [(i, "a b") for i in range(4)]
               + [(10 + i, "a c") for i in range(2)])
    out = {(r["w1"], r["w2"]): r for r in
           T.pmi_collocations(df, min_count=1).collect()}
    assert set(out) == {("a", "b"), ("a", "c")}
    def pmi(c12, c1, c2, m=6.0, n=12.0):
        return round(math.log((c12 / m) / ((c1 / n) * (c2 / n))), 4)
    assert out[("a", "b")]["c12"] == 4
    assert out[("a", "b")]["pmi"] == pytest.approx(pmi(4, 6, 4), abs=0)
    assert out[("a", "c")]["pmi"] == pytest.approx(pmi(2, 6, 2), abs=0)


def test_pmi_min_count_filters_but_totals_use_all_pairs(spark):
    # (a,b) survives min_count=2; (c,d) does not — but M must still
    # count it (M=3, not 2): a filtered-M PMI would be ln-shifted.
    df = _docs(spark, [(1, "a b"), (2, "a b"), (3, "c d")])
    rows = T.pmi_collocations(df, min_count=2).collect()
    assert [(r["w1"], r["w2"]) for r in rows] == [("a", "b")]
    n, m = 6.0, 3.0
    expect = round(math.log((2 / m) / ((2 / n) * (2 / n))), 4)
    assert rows[0]["pmi"] == pytest.approx(expect, abs=0)


# ------------------------------------------------- epoch batch manifest


def test_epoch_manifest_partitions_every_doc_exactly_once(spark):
    df = spark.range(0, 300).select(
        F.col("id").alias("doc_id"),
        (F.pmod(F.col("id"), 7) + 1).alias("n_tokens"))
    total = df.agg(F.sum("n_tokens")).collect()[0][0]
    out = sampling.epoch_batch_manifest(
        df, "doc_id", "n_tokens", budget=50, epochs=3).collect()
    for e in range(3):
        rows = [r for r in out if r["epoch"] == e]
        assert sum(r["n_docs"] for r in rows) == 300
        assert sum(r["sum_tokens"] for r in rows) == total
        # batch ids are the dense prefix-interval ids: 0..max with no gap
        ids = sorted(r["batch_id"] for r in rows)
        assert ids == list(range(len(ids)))


def test_epoch_manifest_batches_respect_budget_semantics(spark):
    # 10 docs of 30 tokens, budget 100: exclusive prefixes 0,30,..,270
    # -> batch = prefix // 100 gives batches of 4, 3, 3 docs.
    df = spark.range(0, 10).select(F.col("id").alias("doc_id"),
                                   F.lit(30).alias("n_tokens"))
    rows = sorted(sampling.epoch_batch_manifest(
        df, "doc_id", "n_tokens", budget=100, epochs=1).collect(),
        key=lambda r: r["batch_id"])
    assert [r["n_docs"] for r in rows] == [4, 3, 3]
    assert [r["sum_tokens"] for r in rows] == [120, 90, 90]


def test_epoch_manifest_epochs_are_decorrelated_and_deterministic(spark):
    # variable token counts: a different permutation lands different
    # documents around each budget boundary, so the per-batch token
    # sums fingerprint the epoch's order
    df = spark.range(0, 500).select(
        F.col("id").alias("doc_id"),
        (F.pmod(F.col("id"), 7) + 1).alias("n_tokens"))
    a = sampling.epoch_batch_manifest(df, "doc_id", "n_tokens",
                                      budget=200, epochs=2)
    b = sampling.epoch_batch_manifest(df, "doc_id", "n_tokens",
                                      budget=200, epochs=2)
    ra = sorted(map(tuple, a.collect()))
    rb = sorted(map(tuple, b.collect()))
    assert ra == rb  # rerun-identical
    per_epoch = {e: [(r[1], r[2], r[3]) for r in ra if r[0] == e]
                 for e in (0, 1)}
    assert per_epoch[0] != per_epoch[1]  # fresh permutation per epoch


# --------------------------------------------------- stupid backoff


def test_stupid_backoff_tiers_and_values(spark):
    # model corpus: one doc "x y z x y z" -> trigrams xyz, yzx, zxy;
    # scored doc exercises all three tiers.
    train = _docs(spark, [(1, "x y z x y z")])
    # "x y z" -> trigram hit (c123=2/c12=2 -> ln 1 = 0)
    # "w y z" -> unseen trigram, bigram (y,z) seen: alpha*c23/c2 = .4*2/2
    # "w w q" -> unseen trigram AND bigram (w,q): alpha^2 * unigram(q)
    score = _docs(spark, [(10, "x y z"), (11, "w y z"), (12, "w w q")])
    out = {r["doc_id"]: r for r in
           T.stupid_backoff_nll(score, train_df=train).collect()}
    assert (out[10]["n_tri_hits"], out[10]["n_bi_backoffs"],
            out[10]["n_uni_backoffs"]) == (1, 0, 0)
    assert out[10]["mean_nll"] == pytest.approx(0.0, abs=0)
    assert (out[11]["n_tri_hits"], out[11]["n_bi_backoffs"],
            out[11]["n_uni_backoffs"]) == (0, 1, 0)
    assert out[11]["mean_nll"] == pytest.approx(
        -round(math.log(0.4 * 2 / 2), 4), abs=1e-9)
    assert (out[12]["n_tri_hits"], out[12]["n_bi_backoffs"],
            out[12]["n_uni_backoffs"]) == (0, 0, 1)
    # unigram tier: q unseen -> (0+0.5)/(N + 0.5*V), N=6 tokens, V=3
    expect = -round(math.log(0.4 * 0.4 * 0.5 / (6 + 0.5 * 3)), 4)
    assert out[12]["mean_nll"] == pytest.approx(expect, abs=1e-9)


def test_stupid_backoff_self_train_never_backs_off(spark):
    df = _docs(spark, [(1, "a b c d"), (2, "b c d e")])
    out = T.stupid_backoff_nll(df).collect()
    assert all(r["n_bi_backoffs"] == 0 and r["n_uni_backoffs"] == 0
               for r in out)
    assert sum(r["n_trigrams"] for r in out) == 4


# ------------------------------------------------------------- JSD


def test_jsd_identical_distributions_is_zero(spark):
    df = spark.createDataFrame(
        [(1, "a b c", "s1"), (2, "a b c", "s2")],
        "doc_id long, text string, source string")
    rows = T.source_js_divergence(df).collect()
    assert len(rows) == 1
    assert rows[0]["jsd"] == pytest.approx(0.0, abs=0)
    assert rows[0]["n_shared"] == 3


def test_jsd_disjoint_vocabularies_is_ln2(spark):
    # No shared words -> the pair has no inner-join row at all; the
    # operator reports only pairs sharing >= 1 word, so pad each side
    # with one shared token and check the value approaches ln 2.
    df = spark.createDataFrame(
        [(1, "z a a a a a a a a a", "s1"),
         (2, "z b b b b b b b b b", "s2")],
        "doc_id long, text string, source string")
    rows = T.source_js_divergence(df).collect()
    assert len(rows) == 1
    # hand value: shared word z has p=q=0.1 -> term 0; missing mass 0.9
    # each side -> jsd = 0.9 * ln 2
    assert rows[0]["jsd"] == pytest.approx(0.9 * math.log(2), abs=1e-6)


def test_jsd_hand_computed_two_source_value(spark):
    # s1: a a b   s2: a b b  -> p_a=2/3, q_a=1/3; symmetric for b
    df = spark.createDataFrame(
        [(1, "a a b", "s1"), (2, "a b b", "s2")],
        "doc_id long, text string, source string")
    rows = T.source_js_divergence(df).collect()
    p, q = 2 / 3, 1 / 3
    term = (round(p / 2 * math.log(2 * p / (p + q))
                  + q / 2 * math.log(2 * q / (p + q)), 8) * 2)
    assert rows[0]["jsd"] == pytest.approx(round(term, 6), abs=1e-9)


def test_jsd_symmetric_in_group_order(spark):
    # swapping which source holds which text flips g_a/g_b but not jsd
    d1 = spark.createDataFrame(
        [(1, "a a b", "s1"), (2, "a b b", "s2")],
        "doc_id long, text string, source string")
    d2 = spark.createDataFrame(
        [(1, "a a b", "s2"), (2, "a b b", "s1")],
        "doc_id long, text string, source string")
    j1 = T.source_js_divergence(d1).collect()[0]["jsd"]
    j2 = T.source_js_divergence(d2).collect()[0]["jsd"]
    assert j1 == pytest.approx(j2, abs=0)


# ---------------------------------------------------- blocklist / langs


def test_blocklist_stats_hand_counts(spark):
    df = spark.createDataFrame(
        [(1, "good text here", "s1"),
         (2, "spam spam good", "s1"),
         (3, "all clean words", "s2")],
        "doc_id long, text string, source string")
    out = {r["source"]: r for r in T.blocklist_stats(
        df, terms=("spam",), group_col="source").collect()}
    assert (out["s1"]["n_docs"], out["s1"]["n_flagged"],
            out["s1"]["n_kept"], out["s1"]["total_hits"]) == (2, 1, 1, 2)
    assert out["s1"]["flagged_rate"] == pytest.approx(0.5, abs=0)
    assert (out["s2"]["n_flagged"], out["s2"]["total_hits"]) == (0, 0)


def test_blocklist_max_ratio_tolerates_low_rates(spark):
    # 1 hit in 10 tokens = 0.1 ratio; a 0.15 threshold keeps it
    text = "spam " + " ".join(f"w{i}" for i in range(9))
    df = spark.createDataFrame([(1, text, "s")],
                               "doc_id long, text string, source string")
    strict = T.blocklist_stats(df, ("spam",), group_col="source",
                               max_hit_ratio=0.0).collect()[0]
    loose = T.blocklist_stats(df, ("spam",), group_col="source",
                              max_hit_ratio=0.15).collect()[0]
    assert strict["n_flagged"] == 1
    assert loose["n_flagged"] == 0


def test_mixed_language_detects_concatenated_doc(spark):
    from ds_ga1004_bigdata_project_spark.queries import REGISTRY  # noqa: F401

    en = "the cat and the dog is in a house of cards and a king"
    de = "der hund und die katze ist nicht das haus und der mann die"
    df = spark.createDataFrame(
        [(1, en + " " + de), (2, en + " " + en)],
        "doc_id long, text string")
    toks = T.ws_tokens(F.col("text"))
    half = F.floor(F.size(toks) / 2).cast("int")
    out = df.select(
        "doc_id",
        T.lang_id(F.slice(toks, 1, half)).alias("a"),
        T.lang_id(F.slice(toks, half + 1,
                          F.size(toks) - half)).alias("b")).collect()
    got = {r["doc_id"]: (r["a"], r["b"]) for r in out}
    assert got[1] == ("en", "de")
    assert got[2][0] == got[2][1] == "en"


# ------------------------------------------- keep-best dedup / PSI


def test_keep_best_dedup_picks_quality_not_first(spark):
    from ds_ga1004_bigdata_project_spark.operators.dedup import (
        exact_dedup_keep_best)

    # docs 1 and 2: same token bag; doc 2 has the higher distinct-token
    # ratio (fewer repeats) -> keep 2 despite the larger id.
    df = spark.createDataFrame(
        [(1, "a b c a b c a b c"),   # 3 distinct / 9 tokens
         (2, "a b c"),               # 3 distinct / 3 tokens
         (3, "x y z")],
        "doc_id long, text string")
    score = F.expr("(size(array_distinct(split(lower(text), '\\\\s+'))) "
                   "* 10000L) div size(split(lower(text), '\\\\s+'))")
    out = {r["content_hash"]: r for r in exact_dedup_keep_best(
        df, score, fingerprint=True).collect()}
    grp = [r for r in out.values() if r["dup_cnt"] == 2]
    assert len(grp) == 1
    assert grp[0]["keep_id"] == 2
    assert grp[0]["keep_score"] == 10000


def test_keep_best_dedup_ties_break_to_min_id(spark):
    from ds_ga1004_bigdata_project_spark.operators.dedup import (
        exact_dedup_keep_best)

    df = spark.createDataFrame(
        [(7, "p q r"), (3, "p q r")], "doc_id long, text string")
    out = exact_dedup_keep_best(
        df, F.lit(1), fingerprint=True).collect()
    assert len(out) == 1 and out[0]["keep_id"] == 3


def test_keep_best_dedup_string_ids(spark):
    """ADVICE r8 regression: the old (score, −id) struct tie-break
    unary-minused the id column, which on a STRING id silently casts to
    null — keep_id came back null instead of the min-id survivor. The
    rewritten (−score, id) ordering keeps the id in its own type."""
    from ds_ga1004_bigdata_project_spark.operators.dedup import (
        exact_dedup_keep_best)

    df = spark.createDataFrame(
        [("crawl/007", "p q r", 5), ("crawl/003", "p q r", 5),
         ("crawl/009", "p q r", 9), ("solo/001", "x y", 1)],
        "doc_id string, text string, q int")
    out = {r["dup_cnt"]: r for r in exact_dedup_keep_best(
        df, F.col("q"), id_col="doc_id").collect()}
    assert out[3]["keep_id"] == "crawl/009"       # highest score wins
    assert out[3]["keep_score"] == 9
    assert out[1]["keep_id"] == "solo/001"
    # score tie -> min string id
    df2 = spark.createDataFrame(
        [("b", "p q r", 5), ("a", "p q r", 5)],
        "doc_id string, text string, q int")
    out2 = exact_dedup_keep_best(df2, F.col("q"), id_col="doc_id").collect()
    assert len(out2) == 1 and out2[0]["keep_id"] == "a"


def test_keep_best_dedup_rejects_float_score(spark):
    import pytest

    from ds_ga1004_bigdata_project_spark.operators.dedup import (
        exact_dedup_keep_best)

    df = spark.createDataFrame([(1, "p q r")], "doc_id long, text string")
    with pytest.raises(TypeError, match="integer-valued"):
        exact_dedup_keep_best(df, F.lit(0.5))


def test_psi_zero_for_identical_halves_and_positive_for_shifted(spark):
    import datetime

    rows = []
    # identical value distributions in both halves for type "same";
    # shifted distribution for type "moved"
    for i in range(200):
        d0 = datetime.datetime(2024, 1, 2) + datetime.timedelta(minutes=i)
        d1 = datetime.datetime(2024, 1, 20) + datetime.timedelta(minutes=i)
        v = float(25 + (i % 4) * 50)
        rows.append((i, d0, 1, "same", v, "{}"))
        rows.append((1000 + i, d1, 1, "same", v, "{}"))
        rows.append((2000 + i, d0, 1, "moved", v, "{}"))
        rows.append((3000 + i, d1, 1, "moved", v + 200.0, "{}"))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    import tempfile
    import os
    tmp = tempfile.mkdtemp()
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "documents", "embeddings"):
        pass  # q175 only reads events
    df.write.mode("overwrite").parquet(os.path.join(tmp, "events.parquet"))
    from ds_ga1004_bigdata_project_spark.queries import REGISTRY
    out = {r["event_type"]: r["psi"] for r in
           REGISTRY["q175_psi_drift"].build(spark, tmp).collect()}
    assert out["same"] == pytest.approx(0.0, abs=1e-9)
    assert out["moved"] > 0.5  # textbook "significant drift" band
