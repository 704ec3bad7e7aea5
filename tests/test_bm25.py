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
