"""Bloom-filter join pruning (operators/bloom.py, q125): exactness under
false positives, no-false-negative guarantee, and the plan shape that makes
it worth having — the bloom test sits ON the probe scan, below the exact
join."""

from __future__ import annotations

from pyspark.sql import functions as F

from ds_ga1004_bigdata_project_spark.operators import bloom
from ds_ga1004_bigdata_project_spark.operators.relational import semi_join
from ds_ga1004_bigdata_project_spark.sources.catalog import Catalog

from .conftest import SF_SMOKE


def _exact(spark):
    cat = Catalog(spark, SF_SMOKE)
    urgent = cat.orders.filter(F.col("o_orderpriority") == "1-URGENT")
    keys = urgent.select(F.col("o_orderkey").alias("l_orderkey")).distinct()
    return cat, urgent, semi_join(cat.lineitem, keys, "l_orderkey")


def test_prefilter_has_no_false_negatives(spark):
    cat, urgent, exact = _exact(spark)
    pre = bloom.bloom_prefilter(cat.lineitem, urgent,
                                "l_orderkey", "o_orderkey")
    # every exactly-matching row survives the prefilter
    missing = exact.join(pre.select("l_orderkey").distinct(),
                         "l_orderkey", "left_anti")
    assert missing.count() == 0


def test_prefilter_prunes_nonmatching_rows(spark):
    cat, urgent, exact = _exact(spark)
    pre = bloom.bloom_prefilter(cat.lineitem, urgent,
                                "l_orderkey", "o_orderkey")
    n_probe, n_pre, n_exact = (cat.lineitem.count(), pre.count(),
                               exact.count())
    # the filter actually removes the non-matching bulk; at the default
    # 2^20-bit sizing the FP count on this key domain is ~0
    assert n_exact <= n_pre < n_probe
    assert (n_pre - n_exact) <= 0.01 * n_probe


def test_bloom_semi_join_equals_plain_semi_join(spark):
    cat, urgent, exact = _exact(spark)
    got = bloom.bloom_semi_join(cat.lineitem, urgent,
                                "l_orderkey", "o_orderkey")
    assert got.columns == cat.lineitem.columns
    assert got.exceptAll(exact).count() == 0
    assert exact.exceptAll(got).count() == 0


def test_exactness_survives_a_saturated_bitset(spark):
    """64-bit bitset → massive false-positive rate → the exact join must
    still produce exactly the semi-join result (the correctness contract
    is independent of sizing)."""
    cat, urgent, exact = _exact(spark)
    got = bloom.bloom_semi_join(cat.lineitem, urgent,
                                "l_orderkey", "o_orderkey", num_bits=64)
    assert got.exceptAll(exact).count() == 0
    assert exact.exceptAll(got).count() == 0


def test_bloom_anti_join_equals_plain_anti_join(spark):
    from ds_ga1004_bigdata_project_spark.operators.relational import anti_join

    cat, urgent, _ = _exact(spark)
    keys = urgent.select(F.col("o_orderkey").alias("l_orderkey")).distinct()
    want = anti_join(cat.lineitem, keys, "l_orderkey")
    got = bloom.bloom_anti_join(cat.lineitem, urgent,
                                "l_orderkey", "o_orderkey")
    assert got.columns == cat.lineitem.columns
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_bloom_anti_join_exact_under_saturation(spark):
    """A 64-bit bitset makes nearly every key bloom-positive — the exact
    anti join must still produce the exact result (only the split point
    moves, never the answer)."""
    from ds_ga1004_bigdata_project_spark.operators.relational import anti_join

    cat, urgent, _ = _exact(spark)
    keys = urgent.select(F.col("o_orderkey").alias("l_orderkey")).distinct()
    want = anti_join(cat.lineitem, keys, "l_orderkey")
    got = bloom.bloom_anti_join(cat.lineitem, urgent,
                                "l_orderkey", "o_orderkey", num_bits=64)
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_null_keys_follow_standard_join_semantics(spark):
    """Null probe keys: semi drops them, anti keeps them — identical to the
    plain joins (nulls never equi-match), whatever the bloom bits say."""
    probe = spark.createDataFrame(
        [(1, "a"), (None, "b"), (2, "c"), (None, "d")],
        "k long, payload string")
    build = spark.createDataFrame([(1,), (None,)], "bk long")
    semi = bloom.bloom_semi_join(probe, build, "k", "bk")
    assert sorted(r["payload"] for r in semi.collect()) == ["a"]
    anti = bloom.bloom_anti_join(probe, build, "k", "bk")
    assert sorted(r["payload"] for r in anti.collect()) == ["b", "c", "d"]


def test_empty_build_side(spark):
    """Zero build keys: semi keeps nothing, anti keeps everything — the
    all-zeros bitset must short-circuit correctly, not error."""
    cat = Catalog(spark, SF_SMOKE)
    none = cat.orders.filter(F.lit(False))
    assert bloom.bloom_semi_join(cat.lineitem, none,
                                 "l_orderkey", "o_orderkey").count() == 0
    assert bloom.bloom_anti_join(cat.lineitem, none,
                                 "l_orderkey", "o_orderkey").count() \
        == cat.lineitem.count()


def test_bloom_test_sits_below_the_exact_join(spark):
    """Plan order: the BroadcastNestedLoopJoin carrying the bloom bit-test
    must be BELOW the exact equi-join (a child in the tree — printed later),
    i.e. the probe scan is pruned before the exact join sees it. Catalyst's
    PushDownLeftSemiAntiJoin would invert this for a left-semi exactness
    pass — the inner-join form in bloom_semi_join is what keeps the order."""
    cat, urgent, _ = _exact(spark)
    got = bloom.bloom_semi_join(cat.lineitem, urgent,
                                "l_orderkey", "o_orderkey")
    plan = got._jdf.queryExecution().executedPlan().toString()
    i_exact = plan.index("BroadcastHashJoin")
    i_bloom = plan.index("BroadcastNestedLoopJoin")
    assert i_exact < i_bloom, "bloom prefilter was reordered above the exact join"
