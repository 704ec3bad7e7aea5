"""Unit semantics for winnowing fingerprints (q166) and degree-oriented
triangle counting (q167). Hand-built inputs with known answers; the parity
suite covers the cross-engine contract."""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import functions as F

from ds_ga1004_bigdata_project_spark.operators.dedup import (
    winnowing_fingerprints, winnowing_pairs)
from ds_ga1004_bigdata_project_spark.operators.graph import (
    triangle_participation)

# ------------------------------------------------------------ winnowing


def _ref_winnow(text, k, w):
    import hashlib

    toks = text.lower().split()
    if len(toks) < k:
        return set()
    hs = [hashlib.md5(" ".join(toks[i:i + k]).encode()).hexdigest()[:16]
          for i in range(len(toks) - k + 1)]
    if len(hs) < w:
        return set()
    return {min(hs[s:s + w]) for s in range(len(hs) - w + 1)}


def test_winnowing_matches_reference(spark):
    texts = ["the quick brown fox jumps over the lazy dog",
             "pack my box with five dozen liquor jugs",
             "the quick brown fox jumps over the lazy dog again today"]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id long, text string")
    got = {}
    for r in winnowing_fingerprints(df, k=3, w=3).collect():
        got.setdefault(r["doc_id"], set()).add(r["fp"])
    for i, t in enumerate(texts):
        want = _ref_winnow(t, 3, 3)
        assert got.get(i, set()) == want, f"doc {i}"


def test_winnowing_guarantee_shared_run_always_detected(spark):
    # the Schleimer guarantee: a shared run of k+w-1 tokens MUST produce
    # >= 1 common fingerprint. Build two docs sharing exactly an
    # 8-token run (k=4, w=5) inside otherwise-distinct text.
    shared = "alpha beta gamma delta epsilon zeta eta theta"
    a = "one two three four " + shared + " five six seven eight"
    b = "nine ten eleven twelve " + shared + " thirteen fourteen fifteen sixteen"
    df = spark.createDataFrame([(1, a), (2, b)],
                               "doc_id long, text string")
    pairs = winnowing_pairs(df, k=4, w=5, min_shared=1).collect()
    assert len(pairs) == 1
    assert (pairs[0]["doc_a"], pairs[0]["doc_b"]) == (1, 2)
    assert pairs[0]["n_shared"] >= 1


def test_winnowing_short_docs_yield_no_fingerprints(spark):
    df = spark.createDataFrame(
        [(1, "a b"), (2, "a b c d e f")], "doc_id long, text string")
    rows = winnowing_fingerprints(df, k=4, w=5).collect()
    # doc 1: < k tokens; doc 2: 3 grams < w windows -> none either
    assert rows == []


def test_winnowing_max_df_drops_boilerplate(spark):
    t = "common common common common common common common common"
    df = spark.createDataFrame(
        [(i, t) for i in range(5)], "doc_id long, text string")
    full = winnowing_fingerprints(df, k=3, w=3).collect()
    assert len(full) > 0
    capped = winnowing_fingerprints(df, k=3, w=3, max_df=4).collect()
    assert capped == []  # every fp appears in all 5 docs -> dropped


# ------------------------------------------------------------ triangles


def _edges_df(spark, pairs):
    rows = [(min(a, b), max(a, b)) for a, b in pairs]
    return (spark.createDataFrame(rows, "u long, v long").distinct())


def _ref_triangles(pairs):
    es = {(min(a, b), max(a, b)) for a, b in pairs}
    nodes = {x for e in es for x in e}
    from collections import Counter
    c = Counter()
    for a, b, cc in combinations(sorted(nodes), 3):
        if (a, b) in es and (b, cc) in es and (a, cc) in es:
            c[a] += 1
            c[b] += 1
            c[cc] += 1
    return dict(c)


def test_triangles_match_reference_on_random_graph(spark):
    import random

    rng = random.Random(7)
    pairs = {(rng.randrange(30), rng.randrange(30)) for _ in range(120)}
    pairs = [(a, b) for a, b in pairs if a != b]
    got = {r["node"]: r["n_triangles"] for r in
           triangle_participation(_edges_df(spark, pairs),
                                  src="u", dst="v").collect()}
    assert got == _ref_triangles(pairs)


def test_triangles_k4_counts(spark):
    # K4: every vertex sits in C(3,2)=3 triangles, 4 triangles total
    pairs = list(combinations(range(4), 2))
    got = {r["node"]: r["n_triangles"] for r in
           triangle_participation(_edges_df(spark, pairs),
                                  src="u", dst="v").collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}


def test_triangles_hub_star_has_none(spark):
    # star graph: hub connected to 10 leaves, no leaf-leaf edges
    pairs = [(0, i) for i in range(1, 11)]
    got = triangle_participation(_edges_df(spark, pairs),
                                 src="u", dst="v").collect()
    assert got == []


def test_triangles_cache_contract(spark):
    pairs = list(combinations(range(5), 2))
    caches: list = []
    out = triangle_participation(_edges_df(spark, pairs), src="u",
                                 dst="v", caches=caches)
    n = out.count()
    assert n == 5  # K5: every vertex in C(4,2)=6 triangles
    assert len(caches) == 1
    for c in caches:
        c.unpersist()


# ------------------------------------------------- wave-3 additions


def test_containment_catches_what_jaccard_misses(spark):
    from ds_ga1004_bigdata_project_spark.operators.dedup import (
        containment_pairs)

    short = "alpha beta gamma delta epsilon"
    longd = (short + " one two three four five six seven eight nine ten "
             "eleven twelve thirteen fourteen fifteen sixteen seventeen")
    df = spark.createDataFrame([(1, short), (2, longd)],
                               "doc_id long, text string")
    caches: list = []
    rows = containment_pairs(df, min_containment=0.9,
                             caches=caches).collect()
    for c in caches:
        c.unpersist()
    assert len(rows) == 1
    r = rows[0]
    # the short doc's 3 shingles all live in the long doc
    assert r["containment_a"] == 1.0
    # while the symmetric Jaccard is far below any dedup threshold
    jac = r["inter_cnt"] / (r["a_cnt"] + r["b_cnt"] - r["inter_cnt"])
    assert jac < 0.2


def test_jl_distortion_concentrates_and_is_deterministic(spark):
    from ds_ga1004_bigdata_project_spark.operators.similarity import (
        jl_distortion)
    from ds_ga1004_bigdata_project_spark.sources.catalog import Catalog

    from .conftest import SF_SMOKE

    emb = Catalog(spark, SF_SMOKE).embeddings
    a = jl_distortion(emb, out_dim=8).collect()
    b = jl_distortion(emb, out_dim=8).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    ratios = [r["ratio"] for r in a]
    mean = sum(ratios) / len(ratios)
    # E[ratio] = 1 under Rademacher projections; k=8 concentrates the
    # corpus MEAN tightly even though single vectors swing
    assert 0.85 < mean < 1.15, mean
    assert all(r["n2_orig"] > 0 for r in a)


def test_jl_distortion_salt_changes_projection(spark):
    from ds_ga1004_bigdata_project_spark.operators.similarity import (
        jl_distortion)
    from ds_ga1004_bigdata_project_spark.sources.catalog import Catalog

    from .conftest import SF_SMOKE

    emb = Catalog(spark, SF_SMOKE).embeddings.limit(20)
    a = {r["vec_id"]: r["n2_proj"] for r in
         jl_distortion(emb, out_dim=8, salt=42).collect()}
    b = {r["vec_id"]: r["n2_proj"] for r in
         jl_distortion(emb, out_dim=8, salt=43).collect()}
    assert any(a[k] != b[k] for k in a)


def test_event_transitions_probabilities_normalize(spark):
    from ds_ga1004_bigdata_project_spark.queries import REGISTRY

    from .conftest import SF_ORACLE

    rows = REGISTRY["q170_event_transitions"].build(
        spark, SF_ORACLE).collect()
    from collections import defaultdict
    by_prev = defaultdict(float)
    for r in rows:
        by_prev[r["prev"]] += r["p"]
    # rounded 6dp probabilities per prev-state sum to 1 within rounding
    for prev, s in by_prev.items():
        assert abs(s - 1.0) < 1e-4, (prev, s)


def test_event_transitions_hand_counts(spark):
    rows = [(1, i, 100, t) for i, t in
            enumerate(["a", "b", "a", "b", "a"])] + \
           [(10 + i, i, 200, t) for i, t in enumerate(["a", "a", "c"])]
    import datetime
    df = spark.createDataFrame(
        [(eid, datetime.datetime(2026, 1, 1, 0, 0, sec), uid, t)
         for (eid, sec, uid, t) in rows],
        "event_id long, ts timestamp, user_id long, event_type string")
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F2
    seq = df.select("user_id", "event_type",
                    F2.lag("event_type").over(
                        W.partitionBy("user_id").orderBy("ts", "event_id"))
                    .alias("prev"))
    cnt = {(r["prev"], r["event_type"]): r["n"] for r in
           seq.filter(F2.col("prev").isNotNull())
              .groupBy("prev", "event_type")
              .agg(F2.count("*").alias("n")).collect()}
    assert cnt == {("a", "b"): 2, ("b", "a"): 2,
                   ("a", "a"): 1, ("a", "c"): 1}


# ---------------------------------------------- prefix-filtered join


def test_prefix_filter_is_complete_vs_unfiltered(spark):
    """PPJoin completeness on randomized near-dup data: the prefix-
    filtered join must output the IDENTICAL pair set as the plain
    inverted-index join at the same threshold."""
    import random

    from ds_ga1004_bigdata_project_spark.operators.dedup import (
        ngram_jaccard_pairs, prefix_filtered_jaccard_pairs)

    rng = random.Random(11)
    vocab = [f"tok{i}" for i in range(60)]
    docs = []
    for i in range(40):
        docs.append((i, " ".join(rng.choices(vocab, k=30))))
    # planted near-dups: copy with small perturbations
    for i in range(10):
        base = docs[i][1].split()
        j = rng.randrange(len(base))
        base[j] = rng.choice(vocab)
        docs.append((100 + i, " ".join(base)))
    df = spark.createDataFrame(docs, "doc_id long, text string")

    for t in (0.4, 0.6, 0.8):
        caches: list = []
        fast = sorted((r["a"], r["b"], r["jaccard"]) for r in
                      prefix_filtered_jaccard_pairs(
                          df, threshold=t, caches=caches).collect())
        for c in caches:
            c.unpersist()
        caches = []
        slow = sorted((r["a"], r["b"], r["jaccard"]) for r in
                      ngram_jaccard_pairs(df, min_jaccard=t,
                                          caches=caches).collect())
        for c in caches:
            c.unpersist()
        assert fast == slow, f"threshold {t}: prefix filter lost pairs"
        assert len(fast) >= 10  # the planted dups are found


def test_prefix_filter_generates_fewer_candidates(spark):
    """The point of the scheme: prefix postings are a strict subset of
    full postings, so candidate pairs shrink (here: measured, not
    assumed)."""
    from ds_ga1004_bigdata_project_spark.sources.catalog import Catalog

    from .conftest import SF_SMOKE

    docs = Catalog(spark, SF_SMOKE).documents
    from ds_ga1004_bigdata_project_spark.functions.text import (
        word_shingles, ws_tokens)

    sh = docs.select(
        F.col("doc_id").alias("id"),
        F.array_distinct(word_shingles(ws_tokens(F.col("text")), 3))
         .alias("s"))
    posting = sh.select("id", F.explode("s").alias("t"))
    full_cands = (posting.alias("x").join(
        posting.alias("y"),
        (F.col("x.t") == F.col("y.t")) & (F.col("x.id") < F.col("y.id")))
        .select("x.id", "y.id").distinct().count())

    dfreq = posting.groupBy("t").agg(F.count("*").alias("d"))
    ordered = (posting.join(dfreq, "t").groupBy("id")
               .agg(F.sort_array(F.collect_list(F.struct("d", "t")))
                    .alias("o")))
    plen = (F.size("o") - F.ceil(F.size("o") * F.lit(0.5)) + 1).cast("int")
    pre = ordered.select("id", F.explode(
        F.transform(F.slice("o", 1, plen), lambda s: s["t"])).alias("t"))
    pre_cands = (pre.alias("x").join(
        pre.alias("y"),
        (F.col("x.t") == F.col("y.t")) & (F.col("x.id") < F.col("y.id")))
        .select("x.id", "y.id").distinct().count())
    assert pre_cands < full_cands / 3, (pre_cands, full_cands)


def test_prefix_filter_exact_ceil_non_dyadic_threshold(spark):
    """ADVICE r8 regression: the float ceil F.ceil(n·t) rounds UP when
    t·n is an exact integer whose IEEE product carries ulp noise —
    threshold 0.28 on a 25-shingle document gives 25·0.28 =
    7.000000000000001 → ceil 8 → prefix 18 instead of the lemma's 19,
    silently dropping a qualifying pair whose only common prefix
    shingle sits at position 19. This fixture constructs exactly that
    pair: doc A = 27 distinct tokens (25 trigram shingles: the first 18
    unique to A → df 1 → rarity positions 1–18; the last 7 shared with
    doc B → df 2 → positions 19–25), doc B = A's last 9 tokens (its 7
    shingles all shared). J = 7/(25+7−7) = 0.28 ≥ t exactly, and the
    pair is findable ONLY through A's prefix position 19."""
    from ds_ga1004_bigdata_project_spark.operators.dedup import (
        prefix_filtered_jaccard_pairs)

    toks = [f"w{i:02d}" for i in range(27)]
    df = spark.createDataFrame(
        [(1, " ".join(toks)), (2, " ".join(toks[18:]))],
        "doc_id long, text string")
    caches: list = []
    pairs = prefix_filtered_jaccard_pairs(
        df, threshold=0.28, caches=caches).collect()
    for c in caches:
        c.unpersist()
    assert [(r["a"], r["b"], r["inter_cnt"], r["jaccard"])
            for r in pairs] == [(1, 2, 7, 0.28)], (
        "the 0.28-threshold qualifying pair was dropped — the prefix "
        "length regressed below the completeness lemma")
