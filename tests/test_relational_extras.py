"""q130/q131 semantics: the SQL surface's correlated subquery (Catalyst
decorrelation) must equal the hand-decorrelated builder, and the curriculum
phases must be globally balanced."""

from __future__ import annotations

from ds_ga1004_bigdata_project_spark.queries import REGISTRY

from .conftest import SF_SMOKE


def test_correlated_sql_surface_equals_decorrelated_builder(spark):
    """Run the ORACLE's correlated-scalar-subquery SQL through Spark itself
    (temp views) — Catalyst's DecorrelateInnerQuery must produce the same
    result as q130's explicit per-key-aggregate + join rewrite."""
    from ds_ga1004_bigdata_project_spark.sources.catalog import Catalog

    cat = Catalog(spark, SF_SMOKE)
    cat.lineitem.createOrReplaceTempView("_t_lineitem")
    cat.part.createOrReplaceTempView("_t_part")
    try:
        via_sql = spark.sql("""
            SELECT p_brand,
                   count(*) AS n_small,
                   round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
                              AS DOUBLE), 2) AS small_revenue
            FROM _t_lineitem l JOIN _t_part p ON l.l_partkey = p.p_partkey
            WHERE l.l_quantity < (SELECT 0.5 * avg(l2.l_quantity)
                                  FROM _t_lineitem l2
                                  WHERE l2.l_partkey = l.l_partkey)
            GROUP BY p_brand
        """)
        # Catalyst really decorrelated: no per-row subquery survives
        plan = via_sql._jdf.queryExecution().executedPlan().toString()
        assert "Subquery" not in plan

        built = REGISTRY["q130_correlated_subquery"].build(spark, SF_SMOKE)
        assert sorted(map(tuple, via_sql.collect())) == \
            sorted(map(tuple, built.collect()))
    finally:
        spark.catalog.dropTempView("_t_lineitem")
        spark.catalog.dropTempView("_t_part")


def test_curriculum_phases_are_balanced_and_ordered(spark):
    rows = {r["phase"]: r for r in
            REGISTRY["q131_curriculum_phases"].build(spark, SF_SMOKE)
            .collect()}
    assert sorted(rows) == [1, 2, 3, 4]
    sizes = [rows[p]["n_docs"] for p in (1, 2, 3, 4)]
    assert max(sizes) - min(sizes) <= 1          # NTILE balance contract
    for p in (1, 2, 3):                          # phases ascend in score
        assert rows[p]["max_score"] <= rows[p + 1]["min_score"] + 1e-9


def test_fan_out_small_scan_is_conditional(spark, tmp_path):
    """The serial-scan fan-out (SCALE.md round 10, extended to the
    bigram-LM family round 11) must repartition ONLY when the scan has
    fewer input splits than cores: a one-file corpus fans out to
    defaultParallelism; a frame already at/above parallelism keeps its
    plan untouched (shuffling raw text at 100 TB is the failure mode
    this conditionality exists to prevent)."""
    from ds_ga1004_bigdata_project_spark.operators.relational import (
        fan_out_small_scan)

    width = spark.sparkContext.defaultParallelism
    one = str(tmp_path / "one_file")
    spark.range(100).coalesce(1).write.parquet(one)
    small = spark.read.parquet(one)
    assert small.rdd.getNumPartitions() < width  # precondition
    fanned = fan_out_small_scan(small)
    assert fanned.rdd.getNumPartitions() == width
    assert fanned.count() == 100  # values survive the shuffle

    wide = spark.range(1000).repartition(width)
    assert fan_out_small_scan(wide) is wide  # identical object: no-op
