"""Round-8 lexical retrieval: Okapi BM25 top-k (functions.text.bm25_topk).

Semantics pinned against a hand-rolled reference implementation on a tiny
corpus, plus the operator-shape invariants: missing query terms drop at the
inverted-index join, ranking ties break on ascending doc id, and the
query-term frame rides a broadcast (the candidate filter IS the join).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from ds_ga1004_bigdata_project_spark.functions.text import bm25_topk

DOCS = [
    (1, "fast hash join fast"),
    (2, "slow sort merge join"),
    (3, "hash table scan"),
    (4, "fast fast fast"),
    (5, "window agg"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _reference_scores(query):
    """Row-at-a-time BM25 (k1=1.2, b=0.75) with the operator's rounding
    discipline: per-term partials rounded to 4 dp, then summed."""
    toks = {d: t.lower().split() for d, t in DOCS}
    n = len(toks)
    sum_dl = sum(len(t) for t in toks.values())
    df = {}
    for t in toks.values():
        for w in set(t):
            df[w] = df.get(w, 0) + 1
    out = {}
    for d, t in toks.items():
        parts = []
        for w in set(query.split()):
            if w not in df or w not in t:
                continue
            tf = t.count(w)
            idf = math.log(1.0 + (n - df[w] + 0.5) / (df[w] + 0.5))
            dl = len(t)
            parts.append(round(
                idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl * n / sum_dl)),
                4))
        if parts:
            out[d] = (len(parts), round(sum(parts), 4))
    return out


def test_bm25_matches_reference(spark, docs):
    got = {r.doc_id: (r.n_terms, round(r.score_4dp, 4))
           for r in bm25_topk(docs, [(1, "fast hash join")], k=10).collect()}
    assert got == _reference_scores("fast hash join")


def test_bm25_missing_terms_drop(spark, docs):
    # 'zebra' hits no posting: the all-missing query returns nothing, the
    # half-missing query scores exactly as its surviving term alone.
    rows = bm25_topk(docs, [(1, "zebra"), (2, "zebra agg")], k=10).collect()
    assert {r.query_id for r in rows} == {2}
    only_agg = _reference_scores("agg")
    got = {r.doc_id: (r.n_terms, round(r.score_4dp, 4)) for r in rows}
    assert got == only_agg


def test_bm25_rank_order_and_ties(spark, docs):
    # Repeated-term doc 4 must out-rank single-mention docs for 'fast';
    # ranks are 1..k dense, ordered by (score desc, doc_id asc).
    rows = bm25_topk(docs, [(1, "fast")], k=10).collect()
    rows.sort(key=lambda r: r.rank)
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
    assert rows[0].doc_id == 4
    for a, b in zip(rows, rows[1:]):
        assert (a.score_4dp, -a.doc_id) >= (b.score_4dp, -b.doc_id)


def test_bm25_k_truncates(spark, docs):
    assert bm25_topk(docs, [(1, "fast hash")], k=1).count() == 1


def test_bm25_query_frame_is_broadcast(spark, docs):
    plan = bm25_topk(docs, [(1, "fast hash join")], k=3) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_bm25_dataframe_queries_match_list_queries(spark, docs):
    qdf = spark.createDataFrame([(1, "fast hash join")],
                                "query_id long, qtext string")
    a = sorted(map(tuple, bm25_topk(docs, [(1, "fast hash join")]).collect()))
    b = sorted(map(tuple, bm25_topk(docs, qdf).collect()))
    assert a == b


def test_bm25_exclude_query_doc_keeps_ranks_dense(spark, docs):
    # Query-by-document: doc 1's own text, self dropped BEFORE ranking —
    # doc 1 absent, ranks still 1..n dense, other docs' scores untouched.
    qdf = spark.createDataFrame([(1, DOCS[0][1])],
                                "query_id long, qtext string")
    rows = bm25_topk(docs, qdf, k=10, exclude_query_doc=True).collect()
    assert 1 not in {r.doc_id for r in rows}
    assert sorted(r.rank for r in rows) == list(range(1, len(rows) + 1))
    with_self = {r.doc_id: r.score_4dp
                 for r in bm25_topk(docs, qdf, k=10).collect()}
    for r in rows:
        assert r.score_4dp == with_self[r.doc_id]


def test_rrf_fuse_hand_case(spark):
    from ds_ga1004_bigdata_project_spark.operators.similarity import rrf_fuse

    sparse = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3)],
        "query_id long, doc_id long, rank int")
    dense = spark.createDataFrame(
        [(1, 11, 1), (1, 13, 2)],
        "query_id long, doc_id long, rank int")
    rows = {r.doc_id: r for r in rrf_fuse(sparse, dense, k0=60, k=10).collect()}
    # doc 11 in both lists wins; singles score exactly round(1/(60+r), 6).
    assert rows[11].rank == 1
    assert rows[11].rrf_score == round(1 / 62, 6) + round(1 / 61, 6)
    assert rows[10].rrf_score == round(1 / 61, 6)
    assert rows[13].rrf_score == round(1 / 62, 6)
    assert rows[12].rrf_score == round(1 / 63, 6)
    assert rows[10].dense_rank is None and rows[13].sparse_rank is None
    # tie: docs 10 (sparse r1) and 13 (dense r2)? 1/61 > 1/62 — strict
    # order here; equal contributions tie-break on ascending doc_id.
    eq = spark.createDataFrame([(2, 20, 1)], "query_id long, doc_id long, rank int")
    ed = spark.createDataFrame([(2, 19, 1)], "query_id long, doc_id long, rank int")
    tied = sorted((r.rank, r.doc_id)
                  for r in rrf_fuse(eq, ed, k0=60, k=10)
                  .filter(F.col("query_id") == 2).collect())
    assert tied == [(1, 19), (2, 20)]
