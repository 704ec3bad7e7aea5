"""Exact duplicated-span rewrite (Lee et al. 2021 "Deduplicating Training
Data Makes Language Models Better" class): find every k-token span that
occurs more than once corpus-wide, keep the first occurrence, cut all
later occurrences out of the rebuilt text.

Covers: winner-keeps semantics, intra-doc repetition, overlap union,
short docs, case-normalized matching with original-case rebuild, the
hash64 scale-mode key, and determinism.
"""

from __future__ import annotations

import pytest

from ds_ga1004_bigdata_project_spark.operators.dedup import span_dedup_rewrite

K = 4  # small k so fixtures stay readable


def _corpus(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _result(df):
    return {r["doc_id"]: r.asDict() for r in df.collect()}


def test_cross_doc_span_removed_from_later_doc_only(spark):
    span = "alpha beta gamma delta"
    rows = [
        (1, f"intro {span} outro"),
        (2, f"start {span} end tail"),
    ]
    out = _result(span_dedup_rewrite(_corpus(spark, rows), k=K))
    assert out[1]["n_removed"] == 0
    assert out[1]["clean_text"] == rows[0][1]
    assert out[2]["n_removed"] == K
    assert out[2]["clean_text"] == "start end tail"
    assert out[2]["n_tokens"] == 7


def test_intra_doc_repetition_keeps_first_occurrence(spark):
    span = "one two three four"
    rows = [(7, f"{span} filler pad {span}")]
    out = _result(span_dedup_rewrite(_corpus(spark, rows), k=K))
    assert out[7]["n_removed"] == K
    assert out[7]["clean_text"] == f"{span} filler pad"


def test_overlapping_loser_spans_union_coverage(spark):
    # Doc 2 contains a 5-token run whose two overlapping 4-grams BOTH
    # duplicate doc-1 grams; coverage is the union (5 tokens), not 8.
    run = "a b c d e"
    rows = [
        (1, f"x {run} y"),
        (2, f"p q {run} r"),
    ]
    out = _result(span_dedup_rewrite(_corpus(spark, rows), k=K))
    assert out[2]["n_removed"] == 5
    assert out[2]["clean_text"] == "p q r"


def test_short_docs_pass_through(spark):
    rows = [(1, "one two three"), (2, "one two three")]  # < k tokens
    out = _result(span_dedup_rewrite(_corpus(spark, rows), k=K))
    assert out[1]["n_removed"] == 0 and out[2]["n_removed"] == 0
    assert out[2]["clean_text"] == "one two three"


def test_matching_is_case_normalized_rebuild_keeps_original_case(spark):
    rows = [
        (1, "Alpha Beta Gamma Delta tail"),
        (2, "head ALPHA beta GaMmA delta"),
    ]
    out = _result(span_dedup_rewrite(_corpus(spark, rows), k=K))
    assert out[1]["clean_text"] == rows[0][1]
    assert out[2]["n_removed"] == K
    assert out[2]["clean_text"] == "head"


def test_winner_is_lexicographic_min_doc_then_pos(spark):
    span = "w x y z"
    rows = [
        (5, f"pad {span}"),   # pos 1
        (3, f"{span} pad2"),  # pos 0 in the smaller doc_id -> winner
    ]
    out = _result(span_dedup_rewrite(_corpus(spark, rows), k=K))
    assert out[3]["n_removed"] == 0
    assert out[5]["n_removed"] == K
    assert out[5]["clean_text"] == "pad"


def test_hash64_key_mode_matches_string_mode(spark):
    rows = [
        (i, f"tok{i} shared span body here tok{i + 1} uniq{i * 7}")
        for i in range(1, 9)
    ]
    df = _corpus(spark, rows)
    a = sorted(span_dedup_rewrite(df, k=K).collect())
    b = sorted(span_dedup_rewrite(df, k=K, key_mode="hash64").collect())
    assert a == b
    assert any(r["n_removed"] > 0 for r in a)


def test_deterministic_across_runs(spark):
    rows = [(i, f"c{i % 3} d{i % 3} e{i % 3} f{i % 3} g{i}") for i in range(12)]
    df = _corpus(spark, rows)
    assert sorted(span_dedup_rewrite(df, k=K).collect()) == \
        sorted(span_dedup_rewrite(df, k=K).collect())


def test_invalid_k_rejected(spark):
    with pytest.raises(ValueError):
        span_dedup_rewrite(_corpus(spark, [(1, "a b")]), k=1)
