"""Relational operator library (SURVEY.md §2.2, §2.3, §2.5-2.7).

Thin, named, composable wrappers that compile to DataFrame plans. The scale
rewrites the reference needed are encoded here once (SURVEY.md §4):

- driver-side set algebra → distributed semi/anti joins (J4/J5 rewrite of
  ``sample_indexer.py:28-39``'s collect + Python sets + giant ``isin``)
- small-side joins broadcast explicitly (J1, ``param_train_1st.py:60``)
- top-k-per-group as a window (W1 relational form of ``recommendForUserSubset``)
- global top-N as orderBy+limit → Spark's TakeOrderedAndProject (O4)

Every function returns a lazy DataFrame; Catalyst handles pushdown, pruning,
join selection, and AQE handles runtime re-planning. Nothing here collects.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


# ---------------------------------------------------------------- joins (J1-J5)

def broadcast_inner_join(big: DataFrame, small: DataFrame, on, how: str = "inner") -> DataFrame:
    """Equi-join with an explicit broadcast of the small side (J1).

    The reference broadcast the per-user truth table into the prediction join
    (``one_train.py:48``). At 100 TB this is the difference between a shuffle
    of the fact table and a map-side hash join: always hint dimensions."""
    return big.join(F.broadcast(small), on, how)


def semi_join(df: DataFrame, keys: DataFrame, on) -> DataFrame:
    """Keep rows of ``df`` whose key appears in ``keys`` (J5).

    Scalable rewrite of the reference's ``isin(collected_list)`` (P4,
    ``sample_indexer.py:39``): the key set stays distributed; Catalyst picks
    broadcast vs shuffle by size, and no multi-MB In-predicate ships to
    executors."""
    return df.join(keys, on, "left_semi")


def anti_join(df: DataFrame, keys: DataFrame, on) -> DataFrame:
    """Keep rows of ``df`` whose key does NOT appear in ``keys`` (J4).

    Scalable rewrite of driver-side ``set.difference`` after ``collect()``
    (``sample_indexer.py:28-33``)."""
    return df.join(keys, on, "left_anti")


def join_chain(base: DataFrame, *links: tuple[DataFrame, object]) -> DataFrame:
    """Inner-join a chain of relations (J2): ``join_chain(f, (d1, k1), (d2, k2))``.

    Dimension sides below the broadcast threshold are picked up by AQE; callers
    can pre-wrap with ``F.broadcast``."""
    out = base
    for other, on in links:
        out = out.join(other, on, "inner")
    return out


# ---------------------------------------------------- windows / top-k (W1, W2)

def topk_per_group(df: DataFrame, partition_by: Sequence[str],
                   order_by: Sequence[Column], k: int,
                   rank_col: str = "rn", keep_rank: bool = False) -> DataFrame:
    """Top-k rows per group via ``row_number`` (W1 relational analog of
    ``recommendForUserSubset(users, 500)``, ``param_train_1st.py:57``).

    ``order_by`` must be a total order (append a unique tiebreak column) or the
    result is nondeterministic under shuffle. Physical plan: one hash shuffle
    on ``partition_by``, per-partition sort — no global sort."""
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    out = df.withColumn(rank_col, F.row_number().over(w)).filter(F.col(rank_col) <= k)
    return out if keep_rank else out.drop(rank_col)


def rank_in_group(df: DataFrame, partition_by: Sequence[str],
                  order_by: Sequence[Column], rank_col: str = "rank",
                  dense: bool = False) -> DataFrame:
    """SQL ``rank()``/``dense_rank()`` over a window (W2; the reference did
    pandas ``.rank()``, ``Exploration-EDA.ipynb#cell86``)."""
    w = Window.partitionBy(*partition_by).orderBy(*order_by) if partition_by \
        else Window.orderBy(*order_by)
    fn = F.dense_rank() if dense else F.rank()
    return df.withColumn(rank_col, fn.over(w))


def global_topn(df: DataFrame, order_by: Sequence[Column], n: int) -> DataFrame:
    """Global top-N (O4): orderBy+limit compiles to TakeOrderedAndProject —
    each task keeps an N-row heap, the driver merges heaps; no full sort."""
    return df.orderBy(*order_by).limit(n)


# ------------------------------------------------------------- set ops (U1-U3)

def union_distinct(a: DataFrame, b: DataFrame) -> DataFrame:
    """Distributed rewrite of driver-side ``set.union`` (U1)."""
    return a.unionByName(b).distinct()


def union_all(a: DataFrame, b: DataFrame) -> DataFrame:
    """Row-bag union by column name (U3); no shuffle at all."""
    return a.unionByName(b)


def difference(a: DataFrame, b: DataFrame) -> DataFrame:
    """Set difference (U2): distributed rewrite of ``set.difference``."""
    return a.exceptAll(b)


def intersection(a: DataFrame, b: DataFrame) -> DataFrame:
    """Set intersection (free surface per SURVEY §2.7)."""
    return a.intersect(b)


# ------------------------------------------------- projections/filters helpers

def filter_in_range(df: DataFrame, col: str, lo, hi) -> DataFrame:
    """Range predicate (P7) — pushes to the parquet scan as min/max filters."""
    return df.filter(F.col(col).between(lo, hi))


def null_if_sentinel(df: DataFrame, col: str, sentinel) -> DataFrame:
    """Sentinel→null normalization (P6): the reference's ``year.replace(0, NaN)``
    (``Exploration-EDA.ipynb#cell46``) as a catalyst expression."""
    return df.withColumn(col, F.when(F.col(col) == sentinel, None).otherwise(F.col(col)))


# ------------------------------------------------------- physical layout (X1-X3)

def repartition_by_key(df: DataFrame, num_partitions: int, *cols: str) -> DataFrame:
    """Hash repartition by key before a write or iterated reuse (X1). The
    reference dropped the result (``sample_indexer.py:50`` no-op bug); the
    engine returns it so callers can't lose it."""
    return df.repartition(num_partitions, *cols)


def salted_join(big: DataFrame, skewed_small: DataFrame, on: str,
                salt_buckets: int = 16, how: str = "inner") -> DataFrame:
    """Skew-resistant equi-join by key salting: the big side gets a random
    salt in [0, buckets); the small side is exploded ``buckets``× with every
    salt value; the join key becomes (key, salt), splitting each hot key's
    rows across ``buckets`` tasks.

    AQE's skew-join splitting (on by default in the session factory) handles
    most cases at runtime; explicit salting remains for aggregation-skew and
    for engines/paths AQE can't rewrite (e.g. a skewed key feeding a window).
    The salt is not seeded — it balances load, never changes results."""
    salted_big = big.withColumn("_salt", (F.rand() * salt_buckets).cast("int"))
    exploded_small = skewed_small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)])))
    out = salted_big.join(exploded_small, [on, "_salt"], how)
    return out.drop("_salt")


def merge_upsert(base: DataFrame, updates: DataFrame, key: str) -> DataFrame:
    """MERGE/upsert semantics as a plan: rows from ``updates`` win on key
    collision, unmatched base rows are kept (classic warehouse merge —
    update-or-insert). Implemented as base-anti-updates ∪ updates: one join
    + one union, no full-outer coalesce per column.

    At scale, pair with partitioned/bucketed sinks: only partitions touched
    by ``updates`` need rewriting (hash-join prunes the rest)."""
    untouched = anti_join(base, updates.select(key), key)
    return untouched.unionByName(updates)


def fan_out_small_scan(df: DataFrame) -> DataFrame:
    """Repartition a frame to defaultParallelism when its scan has fewer
    input splits than cores — otherwise leave the plan untouched.

    A corpus living in one small parquet file is ONE input split, so any
    expression-heavy scan pipeline built on it (shingling, tokenizing,
    HOF projections) runs in a single task no matter how downstream
    exchanges are partitioned — the serial stage behind the rotating
    in-suite inflation class (SCALE.md §in-suite-inflation: a chunk
    JVM's JIT-queue backlog amplifies exactly such stages ~10×, and even
    compiled they cap the query at 1/width of the machine). On a real
    corpus the split count exceeds parallelism and this is a no-op —
    which is the point: shuffling raw text at 100 TB would be the real
    mistake, so the fan-out must be conditional, never unconditional."""
    spark = df.sparkSession
    width = spark.sparkContext.defaultParallelism
    try:
        if df.rdd.getNumPartitions() < width:
            return df.repartition(width)
    except Exception:
        pass  # exotic sources: keep the plan untouched
    return df


def persisted(df: DataFrame):
    """MEMORY_AND_DISK persist around reuse points (X2) — the reference left
    this commented out and re-read parquet every sweep iteration."""
    from pyspark import StorageLevel
    return df.persist(StorageLevel.MEMORY_AND_DISK)


def lineage_cut(df: DataFrame, eager: bool = True) -> DataFrame:
    """Materialize iterative state and CUT its logical lineage.

    ``persist`` caches the physical result but never shrinks the LOGICAL
    plan — an iterative operator whose update embeds the previous state
    once grows its plan linearly per step, and one that embeds it twice
    (e.g. label propagation: join left side + the neighbor aggregate)
    grows it EXPONENTIALLY; either way the driver eventually spends its
    heap analyzing/printing plans instead of running them. Checkpointing
    is the standard fix: the returned DataFrame's plan is a scan of the
    materialized state, one iteration deep forever.

    Reliable ``checkpoint`` when the session has a checkpoint dir set
    (cluster runs wanting executor-loss fault-tolerance set one);
    ``localCheckpoint`` — executor-local MEMORY_AND_DISK blocks,
    GC-cleaned via the ContextCleaner — otherwise. ``eager=True`` also
    serves as the iteration's materializing action; ``eager=False``
    defers to the caller's first action (use when that action is itself
    needed, e.g. a convergence-delta aggregate)."""
    sc = df.sparkSession.sparkContext
    if sc._jsc.sc().getCheckpointDir().isDefined():
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)


def snapshot_diff(old: DataFrame, new: DataFrame, keys: list[str],
                  compare_cols: list[str]) -> DataFrame:
    """CDC-style diff of two table snapshots: one full-outer join on the key
    → per-row status ``added`` / ``removed`` / ``changed`` / ``unchanged``.

    Change detection hashes the compared columns (xxhash64) so arbitrarily
    wide rows cost one 8-byte comparison after the join; at scale this is a
    single co-partitioned shuffle of (key, hash) — never the full row twice.
    Null-safe: a null key column never matches (standard join semantics);
    null payloads hash position-significantly — Spark's hash expressions
    SKIP null inputs, so a bare ``xxhash64(*cols)`` would hash
    ``(s='b', v=NULL)`` and ``(s=NULL, v='b')`` identically and miss the
    change. Each column therefore contributes an ``isnull`` flag alongside
    its value, making the null pattern part of the hashed sequence."""
    def hashed(df: DataFrame, tag: str) -> DataFrame:
        null_tagged = [part
                       for c in compare_cols
                       for part in (F.isnull(F.col(c)).cast("int"), F.col(c))]
        return df.select(
            *keys, F.xxhash64(*null_tagged).alias(f"_h_{tag}"),
            F.lit(1).alias(f"_present_{tag}"))

    j = hashed(old, "old").join(hashed(new, "new"), keys, "full_outer")
    status = (
        F.when(F.col("_present_old").isNull(), F.lit("added"))
        .when(F.col("_present_new").isNull(), F.lit("removed"))
        .when(F.col("_h_old") != F.col("_h_new"), F.lit("changed"))
        .otherwise(F.lit("unchanged")))
    return j.select(*keys, status.alias("diff_status"))


def scd2_apply(dim: DataFrame, updates: DataFrame, key: str,
               effective_date: str, initial_date: str = "1900-01-01") -> DataFrame:
    """Slowly-Changing-Dimension Type 2: apply ``updates`` (same schema as
    ``dim``) as NEW VERSIONS effective ``effective_date``, preserving
    history. Returns the versioned dimension with ``valid_from``,
    ``valid_to`` (null = open) and ``is_current``.

    Construction is three scans and at most one shuffle each (the semi/anti
    split on the key) — never a row-by-row merge:

    * unchanged rows: open versions for keys NOT in updates
      (``initial_date``, open);
    * closed-out rows: the PRIOR version of updated keys, ``valid_to`` set
      to the effective date;
    * new rows: the update rows, open from the effective date.

    At 100 TB the update set is typically << the dimension: both the semi
    and anti join broadcast the update keys, so history application is a
    scan-speed operation on the big side. The q48 merge/upsert is the
    history-free special case of this operator."""
    upd_keys = updates.select(key).distinct()
    untouched = anti_join(dim, upd_keys, key).select(
        "*",
        F.lit(initial_date).cast("date").alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
        F.lit(True).alias("is_current"))
    closed = semi_join(dim, upd_keys, key).select(
        "*",
        F.lit(initial_date).cast("date").alias("valid_from"),
        F.lit(effective_date).cast("date").alias("valid_to"),
        F.lit(False).alias("is_current"))
    opened = updates.select(
        "*",
        F.lit(effective_date).cast("date").alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
        F.lit(True).alias("is_current"))
    return untouched.unionByName(closed).unionByName(opened)


def scd2_apply_incremental(versioned: DataFrame, updates: DataFrame,
                           key: str, effective_date: str) -> DataFrame:
    """Apply the NEXT update batch to an already-versioned SCD2 relation
    (output of :func:`scd2_apply` or of this function): closed history
    passes through untouched; current rows of updated keys close at the
    effective date KEEPING their original ``valid_from``; update rows open.
    Same broadcast-split cost shape as :func:`scd2_apply` — repeated daily
    batches never rewrite history, only the current slice."""
    upd_keys = updates.select(key).distinct()
    cur = versioned.filter(F.col("is_current"))
    hist = versioned.filter(~F.col("is_current"))
    closed = (semi_join(cur, upd_keys, key)
              .withColumn("valid_to", F.lit(effective_date).cast("date"))
              .withColumn("is_current", F.lit(False)))
    untouched = anti_join(cur, upd_keys, key)
    opened = updates.select(
        "*",
        F.lit(effective_date).cast("date").alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
        F.lit(True).alias("is_current"))
    return (hist.unionByName(closed).unionByName(untouched)
            .unionByName(opened.select(*hist.columns)))
