"""Sampling operators: seed determinism + stratification invariants (R1-R4;
not oracle-expressible, so the correctness story lives here)."""

from __future__ import annotations

from ds_ga1004_bigdata_project_spark.operators import sampling as S
from ds_ga1004_bigdata_project_spark.sources.catalog import Catalog

from .conftest import SF_ORACLE


def test_bernoulli_seed_determinism(spark):
    li = Catalog(spark, SF_ORACLE).lineitem
    a = S.bernoulli_sample(li, 0.1, seed=66).count()
    b = S.bernoulli_sample(li, 0.1, seed=66).count()
    c = S.bernoulli_sample(li, 0.1, seed=67).count()
    assert a == b
    assert a != c  # different seed → different sample (overwhelmingly)
    n = li.count()
    assert 0.07 * n < a < 0.13 * n  # fraction roughly honored


def test_stratified_sample_keeps_whole_groups(spark):
    li = Catalog(spark, SF_ORACLE).lineitem
    sampled = S.stratified_key_sample(li, ["l_orderkey"], 0.2, seed=42)
    # every sampled order keeps ALL its lineitems (group-atomic sampling)
    full = li.groupBy("l_orderkey").count().withColumnRenamed("count", "n_full")
    got = sampled.groupBy("l_orderkey").count().withColumnRenamed("count", "n_got")
    mismatched = got.join(full, "l_orderkey") \
        .filter("n_got <> n_full").count()
    assert mismatched == 0


def test_hash_sample_engine_independent_and_stable(spark):
    ev = Catalog(spark, SF_ORACLE).events
    a = sorted(r["event_id"] for r in
               S.deterministic_hash_sample(ev, ["event_id"], 0.2).select("event_id").collect())
    b = sorted(r["event_id"] for r in
               S.deterministic_hash_sample(ev, ["event_id"], 0.2).select("event_id").collect())
    assert a == b and len(a) > 0
    # content-determined: repartitioning must not change membership
    c = sorted(r["event_id"] for r in
               S.deterministic_hash_sample(ev.repartition(13), ["event_id"], 0.2)
               .select("event_id").collect())
    assert a == c
