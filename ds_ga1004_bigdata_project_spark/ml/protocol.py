"""The reference's full evaluation protocol as engine APIs (SURVEY §3, §5).

``sample_indexer.py`` → :func:`make_splits` (distributed rewrite: the
val/test-user disjointness and train-downsampling invariants via semi/anti
joins instead of collected Python sets).
``learning_curve.py`` → :func:`learning_curve` (RMSE/ranking vs sampled user
fraction, inputs persisted across points).
``Exploration-EDA.ipynb`` → :func:`export_factors` (ALS factor matrices out to
the driver/CSV for UMAP — the only place the pipeline legitimately collects).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.relational import anti_join, persisted, semi_join
from ..operators.sampling import DEFAULT_SEED, sample_keys
from .als import ALSConfig, evaluate_model, train_als
from .metrics import rmse


@dataclass
class Splits:
    train: DataFrame
    validation: DataFrame
    test: DataFrame


def make_splits(interactions: DataFrame, user_col: str = "user_id",
                val_frac: float = 0.1, test_frac: float = 0.1,
                seed: int = DEFAULT_SEED) -> Splits:
    """Reference split invariants (FIXTURES.md F1): val and test user sets
    disjoint; train = everyone else's full history. All set algebra stays
    distributed (J4/J5 rewrites of ``sample_indexer.py:28-39``)."""
    users = interactions.select(user_col).distinct()
    val_users = users.sample(False, val_frac, seed)
    rest = anti_join(users, val_users, user_col)
    test_users = rest.sample(False, test_frac / max(1 - val_frac, 1e-9), seed + 1)

    val = semi_join(interactions, val_users, user_col)
    test = semi_join(interactions, test_users, user_col)
    train = anti_join(interactions,
                      val_users.unionByName(test_users).distinct(), user_col)
    return Splits(train=train, validation=val, test=test)


def holdout_splits(interactions: DataFrame, user_col: str = "user_id",
                   item_col: str = "item_id", val_frac: float = 0.1,
                   test_frac: float = 0.1,
                   seed: int = DEFAULT_SEED) -> Splits:
    """The MSD evaluation split EXACTLY as the reference consumed it
    (FIXTURES.md F1; report p.1 §2.1): val/test user sets disjoint, and
    train carries a PARTIAL history of every val/test user (so the fitted
    model has factors for them — the property :func:`make_splits`' clean
    user-level exclusion deliberately lacks) plus the full history of
    everyone else; each eval user's remaining interactions are the ground
    truth their recommendations are scored against.

    The within-user half split ranks each eval user's items by a seeded
    hash (ONE hash-partitioned window per user — no global sort; skew
    bounded by the largest single user, same plan shape as
    :func:`temporal_leave_last_out`): ODD ranks → train, even → holdout,
    so rank 1 — a single-interaction user's only row — always lands in
    train and that user drops out of evaluation rather than entering the
    model unseen, and odd-count users keep the extra row on the train
    side (ADVICE r7: the previous even→train parity inverted this,
    starving one-listen MSD users of factors). Fully deterministic in
    (seed, data)."""
    from pyspark.sql import Window

    users = interactions.select(user_col).distinct()
    val_users = users.sample(False, val_frac, seed)
    rest = anti_join(users, val_users, user_col)
    test_users = rest.sample(False, test_frac / max(1 - val_frac, 1e-9),
                             seed + 1)
    eval_users = val_users.unionByName(test_users).distinct()

    w = Window.partitionBy(user_col).orderBy(
        F.xxhash64(F.col(item_col), F.lit(seed)))
    # _half: 1 for odd ranks (train side — includes rank 1, the whole
    # history of a single-interaction user), 0 for even ranks (holdout).
    tagged = interactions.withColumn("_half", F.row_number().over(w) % 2)
    val_all = semi_join(tagged, val_users, user_col)
    test_all = semi_join(tagged, test_users, user_col)
    others = anti_join(interactions, eval_users, user_col)
    train = (others
             .unionByName(val_all.filter(F.col("_half") == 1).drop("_half"))
             .unionByName(test_all.filter(F.col("_half") == 1).drop("_half")))
    val = val_all.filter(F.col("_half") == 0).drop("_half")
    test = test_all.filter(F.col("_half") == 0).drop("_half")
    return Splits(train=train, validation=val, test=test)


def temporal_leave_last_out(interactions: DataFrame,
                            user_col: str = "user_id",
                            ts_col: str = "ts",
                            tiebreak_col: str | None = None) -> Splits:
    """Temporal leave-last-out split — the sequential-recommender evaluation
    protocol (next-item prediction): each user's chronologically LAST
    interaction is the test example; everything earlier is train. Unlike
    :func:`make_splits`' user-level random split, this never lets the model
    see the future, and every user appears in both sides.

    Plan: ONE hash-partitioned window per user (each user sorts only their
    own history — no global sort, no skew beyond the largest single user),
    then two filters off the same ranked projection. ``tiebreak_col``
    (descending, e.g. an event id) makes the split deterministic when a
    user's max timestamp ties. Validation is empty by protocol (use the
    second-to-last rank if needed).
    """
    from pyspark.sql import Window

    order = [F.col(ts_col).desc()]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col).desc())
    w = Window.partitionBy(user_col).orderBy(*order)
    ranked = interactions.withColumn("_rn", F.row_number().over(w))
    test = ranked.filter(F.col("_rn") == 1).drop("_rn")
    train = ranked.filter(F.col("_rn") > 1).drop("_rn")
    empty = interactions.limit(0)
    return Splits(train=train, validation=empty, test=test)


def downsample_train_users(train: DataFrame, fraction: float,
                           user_col: str = "user_id",
                           seed: int = DEFAULT_SEED) -> DataFrame:
    """The reference's user-level downsampling (50% chosen from the learning
    curve, BASELINE.md): sample the user key space, keep whole histories."""
    keys = sample_keys(train, [user_col], fraction, seed)
    return semi_join(train, keys, user_col)


def learning_curve(interactions: DataFrame, fractions: list[float],
                   cfg: ALSConfig = ALSConfig(rank=4, max_iter=2), k: int = 5,
                   user_col: str = "user_id", seed: int = DEFAULT_SEED):
    """``learning_curve.py`` rewritten: metric-vs-training-fraction sweep with
    the interaction table persisted ONCE; each point = stratified user sample
    → fit → RMSE + ranking metrics. Returns [(fraction, metrics dict)]."""
    cached = persisted(interactions)
    try:
        out = []
        for frac in fractions:
            sampled = downsample_train_users(cached, frac, user_col, seed)
            model = train_als(sampled, cfg)
            scored = model.transform(sampled).filter(F.col("prediction").isNotNull())
            r = rmse(scored, "count", "prediction").collect()[0]
            rank_row = evaluate_model(model, sampled, k).collect()[0]
            out.append((frac, {"rmse": r["rmse"], "n": r["n"],
                               **rank_row.asDict()}))
        return out
    finally:
        cached.unpersist()


def learning_curve_holdout(interactions: DataFrame, fractions: list[float],
                           cfg: ALSConfig = ALSConfig(rank=4, max_iter=2),
                           k: int = 5, val_frac: float = 0.1,
                           test_frac: float = 0.1,
                           user_col: str = "user_id",
                           seed: int = DEFAULT_SEED):
    """The reference's ACTUAL learning-curve protocol
    (``learning_curve.py:41-59``, report Fig. 1): the evaluation split is
    FIXED across every point — only the non-eval training users are
    downsampled, and eval users' partial train histories are always kept
    (so the model always has factors for the users it is scored on); each
    point fits ALS on (eval-user partial histories + a ``frac`` user
    sample of everyone else) and reports RMSE + ranking metrics against
    the SAME held-out validation split. :func:`learning_curve` (train-set
    RMSE, no split) remains as the cheap self-fit diagnostic; THIS
    function is the Fig.-1 reproduction — RMSE is comparable across
    fractions only because the eval set never moves.

    Plan: splits + the sampled-from user pool are computed once and
    persisted; each point adds one key-sample semi-join (whole histories
    kept — the reference samples USER IDS, not rows) + one fit + one
    scoring pass. Returns [(fraction, metrics dict)]."""
    splits = holdout_splits(interactions, user_col=user_col,
                            val_frac=val_frac, test_frac=test_frac,
                            seed=seed)
    train = persisted(splits.train)
    val = persisted(splits.validation)
    eval_users = persisted(
        splits.validation.select(user_col)
        .unionByName(splits.test.select(user_col)).distinct())
    # the sampleable pool: train rows of NON-eval users (the reference's
    # user_to_sample = train users − (val ∪ test) users)
    pool = persisted(anti_join(train, eval_users, user_col))
    keep_always = semi_join(train, eval_users, user_col)
    try:
        out = []
        for frac in fractions:
            sampled_users = sample_keys(pool, [user_col], frac,
                                        seed + int(frac * 1000))
            train_sampled = keep_always.unionByName(
                semi_join(pool, sampled_users, user_col))
            model = train_als(train_sampled, cfg)
            scored = (model.transform(val)
                      .filter(F.col("prediction").isNotNull()))
            r = rmse(scored, "count", "prediction").collect()[0]
            rank_row = evaluate_model(model, val, k).collect()[0]
            out.append((frac, {"rmse": r["rmse"], "n": r["n"],
                               **rank_row.asDict()}))
        return out
    finally:
        for c in (train, val, eval_users, pool):
            c.unpersist()


def export_factors(model, which: str = "item"):
    """ALS factor matrices → pandas (Arrow transfer), the UMAP hand-off
    (``Exploration-EDA.ipynb#cell11,#cell23``). This is the B3 driver
    boundary: legitimate because UMAP is inherently single-process."""
    factors = model.itemFactors if which == "item" else model.userFactors
    return factors.toPandas()


def umap_project(factors_pdf, **umap_kwargs):
    """UMAP projection of factor matrices (reference extension M9,
    ``Plotting.ipynb#cell2-6``; tuned params in BASELINE.md). The umap library
    is not installed in this container — gated import, driver-side only."""
    try:
        import umap  # type: ignore
    except ImportError as exc:  # pragma: no cover - env-dependent
        raise NotImplementedError(
            "umap-learn is not installed in this environment; "
            "export_factors() output is ready for any embedding tool") from exc
    import numpy as np
    mat = np.vstack(factors_pdf["features"].to_numpy())
    return umap.UMAP(**umap_kwargs).fit_transform(mat)


def negative_sample(interactions: DataFrame, items: DataFrame,
                    n_negatives: int, user_col: str = "user_id",
                    item_col: str = "item_id",
                    salt: int = DEFAULT_SEED) -> DataFrame:
    """Deterministic negative sampling for implicit-feedback training: for
    each user, propose ``n_negatives`` candidate items by hashing
    (user, slot) into a DENSE item index, then drop candidates the user has
    actually interacted with (and hash collisions). Output:
    (user_col, item_col, slot) — the (user, negative-item) pairs a BPR/ALS
    trainer consumes alongside the positives.

    Everything is reproducible integer arithmetic on the shared
    multiplicative hash (``operators.sampling._knuth_hash``), so the exact
    pair set is engine-independent (SQL twin in the q118 oracle). Yield is
    slightly under ``n_negatives`` per user (collisions + positives are
    dropped, the standard trade — re-salt for more).

    Plan shape: users × n_negatives explode (map-side), one join against
    the dense item index (broadcast — item dims are small relative to
    interactions), one LEFT ANTI against the positives on (user, item).
    The interactions table — the 100 TB side — shuffles once, hash-
    partitioned by (user, item), and nothing ever collects."""
    from pyspark.sql import Window

    from ..operators.sampling import _KNUTH_C

    # dense 0-based index over the DISTINCT item dimension (small; single
    # window over the dim table only, never over interactions). n_items is
    # the distinct count so hash indexes always resolve — a dim with
    # duplicate rows would otherwise leave dangling indexes (silent yield
    # loss).
    distinct_items = items.select(F.col(item_col).alias("_item")).distinct()
    n_items = distinct_items.count()
    idx = distinct_items.withColumn(
        "_idx", F.row_number().over(Window.orderBy("_item")) - 1)
    users = interactions.select(user_col).distinct()
    slots = users.select(
        user_col, F.explode(F.sequence(
            F.lit(0), F.lit(n_negatives - 1))).alias("slot"))
    # salt mixes into the KEY (scaled past the >>16 truncation) — adding it
    # after the multiply would mostly vanish under the shift.
    key = F.pmod(F.col(user_col) * n_negatives + F.col("slot")
                 + F.lit(salt) * F.lit(1_000_003), F.lit(1 << 31))
    hashed = F.shiftright(key * F.lit(_KNUTH_C), 16)
    cand = slots.withColumn("_idx", F.pmod(hashed, F.lit(n_items)))
    cand = cand.join(F.broadcast(idx), "_idx") \
        .select(user_col, F.col("_item").alias(item_col), "slot")
    return cand.join(interactions.select(user_col, item_col),
                     [user_col, item_col], "left_anti")
