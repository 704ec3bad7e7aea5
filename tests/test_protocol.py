"""The reference's end-to-end protocol (SURVEY §3): splits with invariants →
downsample → index → ALS → metrics → factor export; plus model persistence
(S3), salted joins, and the driver-boundary ops (B3, A8)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ds_ga1004_bigdata_project_spark.ml import als as A
from ds_ga1004_bigdata_project_spark.ml import protocol as P
from ds_ga1004_bigdata_project_spark.operators.relational import salted_join
from ds_ga1004_bigdata_project_spark.sources.catalog import Catalog

from .conftest import SF_SMOKE


@pytest.fixture(scope="module")
def interactions(spark):
    cat = Catalog(spark, SF_SMOKE)
    df = A.interactions_from_orders(cat.lineitem, cat.orders).persist()
    df.count()
    yield df
    df.unpersist()


def test_split_invariants(spark, interactions):
    s = P.make_splits(interactions, val_frac=0.2, test_frac=0.2, seed=7)
    val_u = {r[0] for r in s.validation.select("user_id").distinct().collect()}
    test_u = {r[0] for r in s.test.select("user_id").distinct().collect()}
    train_u = {r[0] for r in s.train.select("user_id").distinct().collect()}
    assert val_u and test_u and train_u
    assert not val_u & test_u          # disjoint val/test users (F1 invariant)
    assert not train_u & (val_u | test_u)
    total = s.train.count() + s.validation.count() + s.test.count()
    assert total == interactions.count()  # partition of the rows


def test_downsample_keeps_whole_users(spark, interactions):
    down = P.downsample_train_users(interactions, 0.5, seed=7)
    per_user_full = interactions.groupBy("user_id").count() \
        .withColumnRenamed("count", "n_full")
    per_user_down = down.groupBy("user_id").count() \
        .withColumnRenamed("count", "n_down")
    broken = per_user_down.join(per_user_full, "user_id") \
        .filter("n_down <> n_full").count()
    assert broken == 0


def test_learning_curve_two_points(spark, interactions):
    pts = P.learning_curve(interactions, [0.3, 0.8],
                           A.ALSConfig(rank=3, max_iter=1, num_blocks=2), k=3)
    assert [f for f, _ in pts] == [0.3, 0.8]
    for _, m in pts:
        assert m["rmse"] >= 0 and m["n_users"] > 0


def test_learning_curve_holdout_protocol(spark, interactions):
    # VERDICT r7 #6 — the Fig.-1 protocol: a FIXED eval split across every
    # fraction point (only non-eval train users are downsampled), metrics
    # schema stable, and the whole relation deterministic in its seeds.
    def run():
        return P.learning_curve_holdout(
            interactions, [0.2, 0.8],
            A.ALSConfig(rank=3, max_iter=1, num_blocks=2), k=3, seed=7)

    a, b = run(), run()
    assert [f for f, _ in a] == [0.2, 0.8]
    for _, m in a:
        assert set(m) >= {"rmse", "n", "map", "precision_at_k",
                          "ndcg_at_k", "n_users"}
        assert m["rmse"] >= 0 and m["n"] > 0
    # seeded determinism: split → sample → fit → score is bit-stable
    assert [(f, m["rmse"], m["map"], m["n"]) for f, m in a] == \
           [(f, m["rmse"], m["map"], m["n"]) for f, m in b]
    # fixed eval split: scored rows never exceed the val split the first
    # run's seed produces (each point scores the SAME val relation)
    n_val = P.holdout_splits(interactions, val_frac=0.1, test_frac=0.1,
                             seed=7).validation.count()
    assert all(m["n"] <= n_val for _, m in a)


def test_model_persistence_roundtrip(spark, interactions, tmp_path):
    # S3: persist + reload the fitted model; factors identical after reload.
    from pyspark.ml.recommendation import ALSModel

    model = A.train_als(interactions, A.ALSConfig(rank=3, max_iter=1,
                                                  num_blocks=2))
    path = str(tmp_path / "als_model")
    model.write().overwrite().save(path)
    back = ALSModel.load(path)
    a = sorted((r["id"], tuple(r["features"])) for r in model.itemFactors.collect())
    b = sorted((r["id"], tuple(r["features"])) for r in back.itemFactors.collect())
    assert a == b


def test_factor_export_arrow(spark, interactions):
    # B3: the UMAP hand-off — (id, features) to pandas via Arrow.
    model = A.train_als(interactions, A.ALSConfig(rank=3, max_iter=1,
                                                  num_blocks=2))
    pdf = P.export_factors(model, "item")
    assert list(pdf.columns) == ["id", "features"]
    assert len(pdf) > 0 and len(pdf["features"].iloc[0]) == 3


def test_umap_gated_import(spark, interactions):
    model = A.train_als(interactions, A.ALSConfig(rank=3, max_iter=1,
                                                  num_blocks=2))
    pdf = P.export_factors(model)
    with pytest.raises(NotImplementedError):
        P.umap_project(pdf, n_neighbors=5)


def test_sweep_driver(spark, interactions):
    # M7: the hyperparameter sweep with the input persisted once.
    grid = [A.ALSConfig(rank=2, max_iter=1, num_blocks=2),
            A.ALSConfig(rank=3, max_iter=1, num_blocks=2)]
    results = A.sweep(interactions, grid, k=3)
    assert len(results) == 2
    for cfg, metrics in results:
        assert metrics["n_users"] > 0
        assert 0.0 <= metrics["precision_at_k"] <= 1.0


def test_holdout_splits_partial_history_invariants(spark, interactions):
    # FIXTURES.md F1: val/test user sets disjoint; train carries a PARTIAL
    # history of every multi-interaction eval user (the property the sweep
    # protocol needs so the model has factors for its eval users).
    s = P.holdout_splits(interactions, val_frac=0.2, test_frac=0.2, seed=7)
    val_u = {r[0] for r in s.validation.select("user_id").distinct().collect()}
    test_u = {r[0] for r in s.test.select("user_id").distinct().collect()}
    train_u = {r[0] for r in s.train.select("user_id").distinct().collect()}
    assert val_u and test_u
    assert not val_u & test_u
    assert (val_u | test_u) <= train_u  # every eval user has train history
    total = s.train.count() + s.validation.count() + s.test.count()
    assert total == interactions.count()  # partition of the rows


def test_holdout_splits_singleton_users_stay_in_train(spark):
    # ADVICE r7 (protocol.py holdout parity): a user with exactly ONE
    # interaction must keep it in train and drop out of evaluation — the
    # TPC-H fixture has no singletons, so build a corpus that is MOSTLY
    # singletons (MSD one-listen users) plus a few 2/3-interaction users,
    # and drive eval fractions to 1.0 so every user is an eval user.
    rows = [(u, i, 1.0) for u in range(40) for i in range(1)]          # singles
    rows += [(100 + u, i, 1.0) for u in range(6) for i in range(2)]    # pairs
    rows += [(200 + u, i, 1.0) for u in range(6) for i in range(3)]    # triples
    inter = spark.createDataFrame(rows, ["user_id", "item_id", "rating"])
    s = P.holdout_splits(inter, val_frac=0.5, test_frac=0.5, seed=11)
    val_u = {r[0] for r in s.validation.select("user_id").distinct().collect()}
    test_u = {r[0] for r in s.test.select("user_id").distinct().collect()}
    train_u = {r[0] for r in s.train.select("user_id").distinct().collect()}
    assert val_u and test_u  # the 0.5/1.0 fractions picked real eval users
    singles = set(range(40))
    # Every singleton's only row is in train; none ever reaches a holdout.
    assert singles <= train_u
    assert not singles & (val_u | test_u)
    # Every eval user (singletons included by vacuity) has train history.
    assert (val_u | test_u) <= train_u
    # Odd-count (triple) EVAL users keep the majority (2 of 3) in train.
    eval_triples = {u for u in (val_u | test_u) if u >= 200}
    assert eval_triples  # fractions high enough that some triple is eval
    triple_train = {r["user_id"]: r["count"] for r in
                    s.train.filter(F.col("user_id").isin(list(eval_triples)))
                    .groupBy("user_id").count().collect()}
    assert all(triple_train[u] == 2 for u in eval_triples)
    total = s.train.count() + s.validation.count() + s.test.count()
    assert total == inter.count()


def test_sweep_protocol_seeded_determinism(spark, interactions):
    # VERDICT r6 #5: the sweep relation end-to-end — split → fit → rank →
    # metrics — must be bit-stable in its seeds. Two full runs from the
    # same inputs must produce the SAME relation (schema + values).
    def run():
        s = P.holdout_splits(interactions, val_frac=0.2, test_frac=0.2,
                             seed=7)
        grid = [A.ALSConfig(rank=2, max_iter=1, num_blocks=2),
                A.ALSConfig(rank=3, max_iter=1, num_blocks=2)]
        res = A.sweep(s.train, grid, k=5, eval_interactions=s.validation)
        return A.sweep_results_df(spark, res)

    a, b = run(), run()
    assert a.schema == b.schema
    assert [f.name for f in a.schema.fields] == [
        "rank", "reg_param", "alpha", "map", "precision_at_k",
        "ndcg_at_k", "n_users"]
    rows_a = sorted(map(tuple, a.collect()))
    rows_b = sorted(map(tuple, b.collect()))
    assert rows_a == rows_b
    for row in rows_a:  # eval users carried factors: metrics are real
        assert row[3] is not None and row[6] > 0


def test_salted_join_matches_plain_join(spark):
    cat = Catalog(spark, SF_SMOKE)
    li = cat.lineitem.select("l_orderkey", "l_partkey", "l_quantity")
    pk = cat.part.select(F.col("p_partkey").alias("l_partkey"), "p_name")
    plain = li.join(pk, "l_partkey").groupBy("l_partkey") \
        .agg(F.count(F.lit(1)).alias("n"))
    salted = salted_join(li, pk, "l_partkey").groupBy("l_partkey") \
        .agg(F.count(F.lit(1)).alias("n"))
    a = {(r["l_partkey"], r["n"]) for r in plain.collect()}
    b = {(r["l_partkey"], r["n"]) for r in salted.collect()}
    assert a == b


def test_summary_stats_driver_boundary(spark):
    # A8: describe/summary surface.
    from ds_ga1004_bigdata_project_spark.operators.aggregates import summary_stats
    cat = Catalog(spark, SF_SMOKE)
    rows = summary_stats(cat.orders, ["o_totalprice"]).collect()
    stats = {r["summary"] for r in rows}
    assert {"count", "mean", "min", "max"} <= stats


def test_snapshot_diff_null_payloads_and_statuses(spark):
    from ds_ga1004_bigdata_project_spark.operators.relational import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", None), (3, "c", 3.0), (4, None, 4.0)],
        "k long, s string, v double")
    new = spark.createDataFrame(
        [(2, "b", None), (3, "CHANGED", 3.0), (4, None, 4.0), (5, "e", 5.0)],
        "k long, s string, v double")
    out = {r["k"]: r["diff_status"]
           for r in snapshot_diff(old, new, ["k"], ["s", "v"]).collect()}
    assert out == {1: "removed", 2: "unchanged", 3: "changed",
                   4: "unchanged", 5: "added"}


def test_snapshot_diff_null_shift_detected(spark):
    # Regression: Spark hash expressions SKIP null inputs, so a bare
    # xxhash64(s, v) hashes (s='b', v=NULL) and (s=NULL, v='b') identically —
    # a value moving across a null column must still classify as 'changed'.
    from ds_ga1004_bigdata_project_spark.operators.relational import snapshot_diff

    old = spark.createDataFrame(
        [(1, "b", None), (2, None, "b"), (3, "1", None)],
        "k long, s string, v string")
    new = spark.createDataFrame(
        [(1, None, "b"), (2, "b", None), (3, None, "1")],
        "k long, s string, v string")
    out = {r["k"]: r["diff_status"]
           for r in snapshot_diff(old, new, ["k"], ["s", "v"]).collect()}
    assert out == {1: "changed", 2: "changed", 3: "changed"}


def test_temporal_leave_last_out_semantics(spark):
    """Hand-built history: last-by-ts (tiebreak id desc) goes to test, the
    rest to train, every user in both sides, no future leakage."""
    from ds_ga1004_bigdata_project_spark.ml.protocol import (
        temporal_leave_last_out)

    inter = spark.createDataFrame(
        [(1, 100, 10), (1, 101, 20), (1, 102, 20),   # tie at ts=20 -> 102
         (2, 200, 5)],                               # single-event user
        "user_id long, event_id long, ts long")
    sp = temporal_leave_last_out(inter, ts_col="ts", tiebreak_col="event_id")
    test = {(r.user_id, r.event_id) for r in sp.test.collect()}
    train = {(r.user_id, r.event_id) for r in sp.train.collect()}
    assert test == {(1, 102), (2, 200)}
    assert train == {(1, 100), (1, 101)}
    assert sp.validation.count() == 0


def test_negative_sample_excludes_positives_and_is_deterministic(spark):
    """Negatives never collide with a user's positives; same salt -> same
    pair set; different salt -> (almost surely) different proposals."""
    from ds_ga1004_bigdata_project_spark.ml.protocol import negative_sample

    inter = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 10)], "user_id long, item_id long")
    items = spark.createDataFrame([(i,) for i in range(10, 30)],
                                  "item_id long")
    out1 = {(r.user_id, r.item_id, r.slot)
            for r in negative_sample(inter, items, 6).collect()}
    out2 = {(r.user_id, r.item_id, r.slot)
            for r in negative_sample(inter, items, 6).collect()}
    assert out1 == out2 and len(out1) > 0
    pos = {(1, 10), (1, 11), (2, 10)}
    assert not {(u, i) for u, i, _ in out1} & pos
    out_salt = {(r.user_id, r.item_id, r.slot)
                for r in negative_sample(inter, items, 6, salt=7).collect()}
    assert out_salt != out1
