"""k-anonymity release operators (operators/privacy.py, q142)."""

from __future__ import annotations

from ds_ga1004_bigdata_project_spark.operators.privacy import (
    k_anonymize, k_anonymity_report)


def _df(spark):
    rows = [("A", "de", 1), ("A", "de", 2), ("A", "de", 3),
            ("B", "fr", 4), ("B", "fr", 5),
            ("C", "us", 6)]
    return spark.createDataFrame(rows, "seg string, geo string, id int")


def test_small_groups_suppress_whole(spark):
    out = k_anonymize(_df(spark), ["seg", "geo"], k=2)
    ids = sorted(r["id"] for r in out.collect())
    assert ids == [1, 2, 3, 4, 5]  # the C/us singleton is gone entirely


def test_k_equals_group_size_boundary(spark):
    out = k_anonymize(_df(spark), ["seg", "geo"], k=3)
    assert sorted(r["id"] for r in out.collect()) == [1, 2, 3]


def test_released_rows_keep_all_columns(spark):
    out = k_anonymize(_df(spark), ["seg"], k=3)
    assert out.columns == ["seg", "geo", "id"]


def test_report_totals_partition_the_corpus(spark):
    [r] = k_anonymity_report(_df(spark), ["seg", "geo"], k=2).collect()
    assert (r["n_groups_released"], r["n_rows_released"],
            r["n_rows_suppressed"]) == (2, 5, 1)
    # released + suppressed = corpus, always
    assert r["n_rows_released"] + r["n_rows_suppressed"] == 6


def test_report_matches_anonymize_rowcount(spark):
    df = _df(spark)
    for k in (1, 2, 3, 4):
        [r] = k_anonymity_report(df, ["seg", "geo"], k=k).collect()
        assert r["n_rows_released"] == \
            k_anonymize(df, ["seg", "geo"], k=k).count()


def test_null_quasi_values_form_their_own_group(spark):
    rows = [("A", None, 1), ("A", None, 2), ("A", "x", 3)]
    df = spark.createDataFrame(rows, "seg string, geo string, id int")
    out = k_anonymize(df, ["seg", "geo"], k=2)
    # groupBy treats NULL as a value; the USING-style semi-join must match
    # it the same way or null-group rows would silently vanish.
    assert sorted(r["id"] for r in out.collect()) == [1, 2]


def test_report_on_empty_corpus_is_zeros_not_nulls(spark):
    df = _df(spark).filter("id > 100")
    [r] = k_anonymity_report(df, ["seg", "geo"], k=2).collect()
    assert (r["n_groups_released"], r["n_rows_released"],
            r["n_rows_suppressed"]) == (0, 0, 0)
