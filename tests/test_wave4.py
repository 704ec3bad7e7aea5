"""Semantic unit tests for the round-9 deferred wave (q188-q193).

The cross-engine oracles certify arithmetic parity; these pin the
SEMANTICS a twin can't catch if both engines replicated the same
mistake (the learning-15 class): known repetition fractions, WordPiece
vs a pure-Python reference, padding arithmetic, MMR actually picking
diversity over a duplicate, margin scoring demoting hub vectors, and
kNN label recovery on separable clusters.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from ds_ga1004_bigdata_project_spark.functions.subword import (
    wordpiece_learn)
from ds_ga1004_bigdata_project_spark.functions.text import (
    gopher_repetition, padding_waste)
from ds_ga1004_bigdata_project_spark.operators.similarity import (
    margin_topk, mmr_select)


# ---------------------------------------------------------------- q188

def test_gopher_repetition_known_fractions(spark):
    # "a b a b a b": 2-grams (a b)x3 (b a)x2, 3-grams (a b a)x2
    # (b a b)x2 — every occurrence duplicated -> both fractions 1.0;
    # top 2-gram "a b" covers 3*3 of 15 chars = 0.6.
    # "a b a b a c": 2-grams (a b)x2 (b a)x2 (a c)x1 -> 12/15 = 0.8;
    # 3-grams (a b a)x2 (b a b)x1 (b a c)x1 -> 10/20 = 0.5.
    df = spark.createDataFrame(
        [(0, "a b a b a b"), (1, "u v w x y z"), (2, "a b a b a c")],
        "doc_id long, text string")
    rows = {r["doc_id"]: r for r in gopher_repetition(df).collect()}
    rep = rows[0]
    assert rep["dup_2gram_frac"] == 1.0
    assert rep["dup_3gram_frac"] == 1.0
    assert rep["top_2gram_frac"] == 0.6
    assert rep["top_2gram"] == "a b"
    part = rows[2]
    assert part["dup_2gram_frac"] == 0.8
    assert part["dup_3gram_frac"] == 0.5
    clean = rows[1]
    assert clean["dup_2gram_frac"] == 0.0
    assert clean["dup_3gram_frac"] == 0.0


# ---------------------------------------------------------------- q189

def _ref_wordpiece(texts, n_merges, min_pair_count=2):
    words = Counter()
    for t in texts:
        for w in t.lower().split():
            if w:
                words[w] += 1
    vocab = {w: [w[0]] + ["##" + c for c in w[1:]] for w in words}
    merges = []
    for rank in range(1, n_merges + 1):
        pc: Counter = Counter()
        sc: Counter = Counter()
        for w, syms in vocab.items():
            for s in syms:
                sc[s] += words[w]
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += words[w]
        cands = [(n / (sc[p[0]] * sc[p[1]]), p, n)
                 for p, n in pc.items() if n >= min_pair_count]
        if not cands:
            break
        best = sorted(cands, key=lambda x: (-x[0], x[1][0], x[1][1]))[0]
        score, (l, r), n = best
        merged = l + r[2:] if r.startswith("##") else l + r
        merges.append((rank, l, r, merged, n, sc[l], sc[r],
                       round(score, 6)))
        for w, syms in vocab.items():
            out: list[str] = []
            for x in syms:
                if out and out[-1] == l and x == r:
                    out[-1] = merged
                else:
                    out.append(x)
            vocab[w] = out
    return merges


_WP_CORPUS = [
    "low low low low low",
    "lower lower newest newest",
    "newest newest newest newest",
    "widest widest widest",
    "LOW lowest newest",
]


def test_wordpiece_matches_reference(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(_WP_CORPUS)],
        "doc_id long, text string")
    got = [tuple(r) for r in wordpiece_learn(df, n_merges=8).collect()]
    assert got == _ref_wordpiece(_WP_CORPUS, 8)
    # WordPiece invariants the BPE trainer would violate: continuation
    # markers present, merged symbols strip the right's prefix.
    for _, left, right, merged, *_ in got:
        assert right.startswith("##")
        assert merged == left + right[2:]


def test_wordpiece_diverges_from_bpe_frequency_argmax(spark):
    # likelihood argmax != frequency argmax: "x y" pairs dominate by
    # count but their symbols are ubiquitous; the rare-symbol pair has
    # the higher count/(count*count) score.
    texts = ["ab " * 50 + "qz qz qz", "ab ab ab ab"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    got = wordpiece_learn(df, n_merges=1).collect()[0]
    # pair (q, ##z): 3/(3*3) = 0.333; pair (a, ##b): 54/(54*54) ~ 0.018
    assert (got["left"], got["right"]) == ("q", "##z")


# ---------------------------------------------------------------- q191

def test_padding_waste_arithmetic(spark):
    texts = [(0, " ".join(["t"] * 10)),   # bucket 16: pad 6
             (1, " ".join(["t"] * 16)),   # bucket 16: pad 0
             (2, " ".join(["t"] * 40)),   # bucket 64: pad 24
             (3, " ".join(["t"] * 200))]  # truncated to 128: pad 0
    df = spark.createDataFrame(texts, "doc_id long, text string")
    rows = {(r["strategy"], r["bucket"]): r
            for r in padding_waste(df).collect()}
    b16 = rows[("bucketed", 16)]
    assert (b16["n_docs"], b16["sum_tokens"], b16["padding"]) == (2, 26, 6)
    b64 = rows[("bucketed", 64)]
    assert (b64["capacity"], b64["padding"]) == (64, 24)
    b128 = rows[("bucketed", 128)]
    assert b128["padding"] == 0  # truncation caps real tokens at 128
    g = rows[("global", 128)]
    assert g["capacity"] == 4 * 128
    assert g["sum_tokens"] == 26 + 40 + 128
    assert g["padding"] == g["capacity"] - g["sum_tokens"]


# ---------------------------------------------------------------- q192

def test_mmr_picks_diversity_over_duplicate(spark):
    # Candidate 2 duplicates candidate 1 (cosine 1.0). Pure relevance
    # would pick it second; MMR's penalty must prefer the orthogonal
    # candidate 3 despite its lower relevance.
    rows = [(0, [1.0, 0.0, 0.0], 0),
            (1, [0.8, 0.6, 0.0], 0),
            (2, [0.8, 0.6, 0.0], 0),
            (3, [0.6, -0.8, 0.0], 0)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>,"
                                     " label int")
    picks = mmr_select(df, k=2).collect()
    assert [p["vec_id"] for p in picks] == [1, 3]
    # score algebra: pick 2's mmr = 0.7*0.6 - 0.3*0.0 = 0.42
    assert abs(picks[1]["mmr_score"] - 0.42) < 1e-12


# ---------------------------------------------------------------- q190

def test_margin_demotes_hub_vectors(spark):
    # Even side: a hub h0 sitting in a dense odd-side cluster, and an
    # isolated vector x2 whose only match is y7. Raw cosine ranks the
    # hub's best pair first (1.0 vs 0.95); the margin criterion must
    # rank the isolated mutual pair above every hub pair.
    rows = [(0, [1.0, 0.0]), (2, [0.05, 0.9987]),
            (1, [1.0, 0.0]), (3, [0.99, 0.141]),
            (5, [0.98, 0.199]), (7, [0.0, 1.0])]
    df = (spark.createDataFrame(rows, "vec_id long, embedding array<float>")
          .withColumn("label", F.lit(0)))
    out = margin_topk(df, k=4, top_n=4).collect()
    assert (out[0]["src"], out[0]["dst"]) == (2, 7)
    hub_best = max(r["cosine_sim"] for r in out if r["src"] == 0)
    iso = [r for r in out if r["src"] == 2][0]
    assert iso["cosine_sim"] < hub_best  # cosine order is reversed...
    assert iso["margin"] > max(r["margin"] for r in out if r["src"] == 0)


# ---------------------------------------------------------------- q193

def test_knn_label_eval_recovers_separable_clusters(spark):
    from ds_ga1004_bigdata_project_spark.queries import REGISTRY  # noqa
    # Two orthogonal clusters, labels consistent -> accuracy 1.0 both.
    rows = []
    for i in range(12):
        base = [1.0, 0.0] if i % 2 == 0 else [0.0, 1.0]
        jitter = 0.001 * (i // 2)
        rows.append((i, [base[0] + jitter, base[1] + jitter],
                     i % 2))
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int")
    from ds_ga1004_bigdata_project_spark.operators.similarity import (
        cosine_topk)
    top = cosine_topk(df, df, k=5)
    lab = df.select(F.col("vec_id").alias("neighbor_id"),
                    F.col("label").alias("n_label"))
    votes = (top.join(lab, "neighbor_id")
             .groupBy("query_id", "n_label").agg(F.count("*").alias("c")))
    pred = (votes.groupBy("query_id")
            .agg(F.max(F.struct("c", F.col("n_label").alias("lab")))
                 .alias("m"))
            .select("query_id", F.col("m.lab").alias("pred")))
    truth = df.select(F.col("vec_id").alias("query_id"), "label")
    wrong = (pred.join(truth, "query_id")
             .filter(F.col("pred") != F.col("label")).count())
    assert wrong == 0


# ------------------------------------------------- randomized references

def _random_corpus(seed: int, n_docs: int = 30, n_words: int = 12):
    import random
    rng = random.Random(seed)
    vocab = ["".join(rng.choice("abcdef") for _ in range(rng.randint(2, 5)))
             for _ in range(n_words)]
    return [" ".join(rng.choice(vocab) for _ in range(rng.randint(3, 12)))
            for _ in range(n_docs)]


def test_wordpiece_matches_reference_on_random_corpora(spark):
    # The likelihood argmax + ##-prefix fold against the pure-Python
    # reference on seeded random corpora — the determinism fuzz the
    # fixed corpus can't provide (tie-breaks, early stops, chain
    # merges all get exercised somewhere in the seeds).
    for seed in (7, 21, 99):
        texts = _random_corpus(seed)
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)],
            "doc_id long, text string")
        got = [tuple(r) for r in wordpiece_learn(df, n_merges=6).collect()]
        assert got == _ref_wordpiece(texts, 6), f"seed {seed} diverged"


def _ref_mmr(vecs: dict, query_id: int, k: int, lam: float = 0.7):
    import math

    def cos4(a, b):
        num = sum(x * y for x, y in zip(a, b))
        den = math.sqrt(sum(x * x for x in a)) * \
            math.sqrt(sum(y * y for y in b))
        return round(num / den, 4)

    q = vecs[query_id]
    state = {i: [cos4(q, v), 0.0] for i, v in vecs.items()
             if i != query_id}
    picks = []
    for rank in range(1, k + 1):
        best = max(state.items(),
                   key=lambda kv: (lam * kv[1][0] - (1 - lam) * kv[1][1],
                                   -kv[0]))
        i, (rel, maxsim) = best
        picks.append((rank, i, rel, lam * rel - (1 - lam) * maxsim))
        pv = vecs[i]
        del state[i]
        for j, st in state.items():
            st[1] = max(st[1], cos4(vecs[j], pv))
    return picks


def test_mmr_matches_reference_on_random_vectors(spark):
    import random
    rng = random.Random(123)
    vecs = {i: [rng.uniform(-1, 1) for _ in range(8)] for i in range(25)}
    df = spark.createDataFrame(
        [(i, [float(x) for x in v], 0) for i, v in vecs.items()],
        "vec_id long, embedding array<float>, label int")
    got = [(r["pick_rank"], r["vec_id"]) for r in
           mmr_select(df, k=8).collect()]
    # float32 storage: replay the reference on the float32-rounded
    # vectors the operator actually sees.
    import struct
    f32 = {i: [struct.unpack("f", struct.pack("f", x))[0] for x in v]
           for i, v in vecs.items()}
    ref = [(rank, i) for rank, i, _, _ in _ref_mmr(f32, 0, 8)]
    assert got == ref


# ------------------------------------------------------- guard rails

def test_gopher_excludes_sub3token_docs(spark):
    df = spark.createDataFrame(
        [(0, "a b"), (1, "x y x y x y")], "doc_id long, text string")
    out = gopher_repetition(df).collect()
    assert [r["doc_id"] for r in out] == [1]  # 2-token doc has no 3-grams


def test_margin_rejects_non_integral_ids(spark):
    import pytest
    df = spark.createDataFrame(
        [("a", [1.0, 0.0]), ("b", [0.0, 1.0])],
        "vec_id string, embedding array<float>")
    with pytest.raises(TypeError, match="integral"):
        margin_topk(df)


def test_padding_waste_rejects_unsorted_boundaries(spark):
    import pytest
    df = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError, match="ascending"):
        padding_waste(df, boundaries=(64, 32))
