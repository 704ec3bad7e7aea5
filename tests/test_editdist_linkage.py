"""Blocked bounded-edit-distance near-dup pairs
(operators/dedup.editdist_blocked_pairs, q140): threshold and blocking
semantics on hand-built corpora."""

from __future__ import annotations

from ds_ga1004_bigdata_project_spark.operators.dedup import (
    editdist_blocked_pairs)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_pairs_within_threshold_and_block(spark):
    docs = _docs(spark, [
        (1, "the quick brown fox jumps"),
        (2, "the quick brown fox jumped"),      # dist 2 from #1 (s→ed)
        (3, "the quick brOWN FOX JUMPS"),       # case-folds to == #1
        (4, "a completely different start"),    # different block
    ])
    got = {(r["id_a"], r["id_b"]): r["dist"]
           for r in editdist_blocked_pairs(
               docs, block_len=8, prefix_len=40, max_dist=3).collect()}
    assert got == {(1, 2): 2, (1, 3): 0, (2, 3): 2}


def test_distance_above_threshold_is_dropped(spark):
    docs = _docs(spark, [
        (1, "prefix--aaaaaaaaaaaa"),
        (2, "prefix--bbbbbbbbbbbb"),  # same 8-char block, dist 12
    ])
    out = editdist_blocked_pairs(docs, block_len=8, prefix_len=40,
                                 max_dist=3).collect()
    assert out == []


def test_block_stoplist_skips_boilerplate_prefixes(spark):
    """A block over ``max_block`` contributes NO pairs at all (skipped,
    not truncated), while smaller blocks still pair."""
    boiler = [(i, "copyright 2024 acme corp page " + str(i))
              for i in range(5)]
    small = [(100, "rare opening line one"), (101, "rare opening line two")]
    docs = _docs(spark, boiler + small)
    got = {(r["id_a"], r["id_b"])
           for r in editdist_blocked_pairs(
               docs, block_len=16, prefix_len=40, max_dist=10,
               max_block=4).collect()}
    assert got == {(100, 101)}


def test_ordering_invariant_id_a_lt_id_b(spark):
    docs = _docs(spark, [(9, "same same same"), (2, "same same samX")])
    [row] = editdist_blocked_pairs(docs, block_len=8, prefix_len=40,
                                   max_dist=2).collect()
    assert (row["id_a"], row["id_b"], row["dist"]) == (2, 9, 1)


def test_distance_measured_on_prefix_only(spark):
    """Divergence beyond prefix_len is invisible — the operator is a
    candidate tier, not a full-text verifier."""
    docs = _docs(spark, [
        (1, "identical head " + "x" * 100),
        (2, "identical head " + "y" * 100),
    ])
    [row] = editdist_blocked_pairs(docs, block_len=8, prefix_len=15,
                                   max_dist=0).collect()
    assert row["dist"] == 0


def test_plan_stays_jvm_side(spark):
    docs = _docs(spark, [(1, "a b c"), (2, "a b d")])
    plan = (editdist_blocked_pairs(docs)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_multi_eval_contamination_attributes_per_benchmark(spark):
    """One pass must attribute each leaky train doc to EACH benchmark it
    shares an n-gram with, counting distinct shared grams (repeats inside
    a doc count once)."""
    from ds_ga1004_bigdata_project_spark.operators.dedup import (
        multi_eval_contamination)

    rows = [
        (1, "the quick brown fox jumps over", "evalA"),
        (2, "pack my box with five dozen jugs", "evalB"),
        # train doc leaks evalA's 5-gram TWICE (repeat counts once) and
        # none of evalB's
        (10, "x the quick brown fox jumps y the quick brown fox jumps",
         "web"),
        # train doc leaks both benchmarks
        (11, "the quick brown fox jumps pack my box with five dozen",
         "web"),
        (12, "completely clean document text here", "web"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {(r["doc_id"], r["eval_source"]): r["n_shared_ngrams"]
           for r in multi_eval_contamination(
               docs, ["evalA", "evalB"], n=5).collect()}
    assert got == {(10, "evalA"): 1, (11, "evalA"): 1, (11, "evalB"): 2}
