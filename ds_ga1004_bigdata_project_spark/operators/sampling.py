"""Sampling operators (SURVEY.md §2.9, R1-R4).

The reference sampled *user ids on the driver* with ``random.sample`` over a
collected list (``sample_indexer.py:36-38``) — O(users) driver memory. The
scalable rewrite samples the key relation distributedly and semi-joins it back
(R3 → J5), so nothing ever collects.

All entry points take an explicit seed (R4) so runs are reproducible; seeded
sampling is engine-specific, hence these are rows-only checks in the harness
(FIXTURES.md "Harness notes").
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .relational import semi_join

#: Engine-level default seed threaded through all sampling ops (R4; the
#: reference pinned sample seed=66 and ALS seed=123).
DEFAULT_SEED = 42


def bernoulli_sample(df: DataFrame, fraction: float, seed: int = DEFAULT_SEED) -> DataFrame:
    """Seeded row-level Bernoulli sample (R1/R2,
    ``Exploration-EDA.ipynb#cell43``). Per-partition and streaming-friendly:
    no shuffle, no driver involvement."""
    return df.sample(withReplacement=False, fraction=fraction, seed=seed)


def sample_keys(df: DataFrame, key_cols: Sequence[str], fraction: float,
                seed: int = DEFAULT_SEED) -> DataFrame:
    """Sample the *key space*: distinct keys → Bernoulli sample. The building
    block of stratified-by-key sampling (R3 rewrite)."""
    return df.select(*key_cols).distinct().sample(False, fraction, seed)


def stratified_key_sample(df: DataFrame, key_cols: Sequence[str], fraction: float,
                          seed: int = DEFAULT_SEED) -> DataFrame:
    """Keep ALL rows of a sampled subset of keys (the reference's user-level
    downsampling, ``sample_indexer.py:36-39``, without the driver round-trip):
    sample keys distributedly, then left-semi join back. Two shuffles max
    (distinct + join build side, usually broadcast by AQE)."""
    keys = sample_keys(df, key_cols, fraction, seed)
    return semi_join(df, keys, list(key_cols))


def deterministic_hash_sample(df: DataFrame, key_cols: Sequence[str],
                              fraction: float, salt: int = DEFAULT_SEED) -> DataFrame:
    """Content-deterministic sample: keep rows where a hash of the key lands
    under ``fraction``. Unlike ``sample()``, the SAME keys are kept on every
    run and every partitioning — the right tool for reproducible
    train/validation splits at 100 TB. (xxhash64 is Spark-specific, so this
    variant is engine-reproducible but not cross-engine; see
    :func:`modulo_sample` for the cross-engine-checkable form.)"""
    h = F.abs(F.xxhash64(*[F.col(c) for c in key_cols], F.lit(salt)))
    return df.filter((h % 1_000_000) < int(fraction * 1_000_000))


#: Knuth's multiplicative-hash constant (2654435761 = ⌊2³²/φ⌋) — public
#: domain technique; any engine with 64-bit integer arithmetic reproduces it.
_KNUTH_C = 2_654_435_761


def modulo_sample(df: DataFrame, key_col: str, fraction: float,
                  salt: int = DEFAULT_SEED) -> DataFrame:
    """Cross-engine deterministic sample over an integer key. Keep predicate
    (exactly this formula, in this order):

        k = ((key mod 2³¹) + 2³¹) mod 2³¹          -- canonical non-negative
        keep ⇔ ((k·C + salt) div 2¹⁶) mod 10⁶ < fraction·10⁶

    with C = 2654435761 (Knuth's multiplicative-hash constant, ⌊2³²/φ⌋,
    public domain). Pure 64-bit integer arithmetic, overflow-free by
    construction (k < 2³¹, C < 2³² ⇒ k·C < 2⁶³) — ANY SQL engine (DuckDB,
    Trino, BigQuery) computes the identical keep-set, which makes sampled
    pipelines oracle-checkable end-to-end (Spark's ``sample()`` and
    ``xxhash64`` are both engine-specific).
    :func:`modulo_sample_predicate_sql` emits the matching DuckDB-SQL
    predicate so the two sides can never drift.

    Design notes (r3 ADVICE):

    - The ``div 2¹⁶`` BEFORE the final modulus feeds the multiply's high
      bits into the keep decision — without it, ``(k·C) mod 10⁶`` depends
      only on ``k mod 10⁶``, so keys 10⁶ apart would always be co-sampled.
      With it, no period shorter than the 2³¹ key domain exists.
    - The key is canonicalized to a NON-NEGATIVE residue explicitly on both
      engines: Spark's ``pmod`` is always ≥ 0 while DuckDB/Trino ``%`` keeps
      the dividend's sign, so a bare mod would diverge on negative keys.
    - Knuth's hash scrambles sequential ids well enough that the kept
      fraction tracks ``fraction`` closely; for adversarial keys use
      :func:`deterministic_hash_sample` instead."""
    # shiftright == div 2¹⁶ for the non-negative numerator; `/` would be
    # DOUBLE division in Spark (53-bit mantissa — inexact near 2⁶³).
    h = F.pmod(_knuth_hash(key_col, salt), F.lit(1_000_000))
    return df.filter(h < int(fraction * 1_000_000))


def _knuth_hash(key_col: str, salt: int):
    """The shared multiplicative hash: canonical non-negative key residue →
    (k·C + salt) div 2¹⁶. Overflow-free 64-bit arithmetic (see
    :func:`modulo_sample`); every deterministic sampler/sharder derives its
    decision from this value so the SQL twins stay in one convention."""
    k = F.pmod(F.col(key_col), F.lit(1 << 31))
    return F.shiftright(k * F.lit(_KNUTH_C) + F.lit(salt), 16)


def _knuth_hash_sql(key_col: str, salt: int) -> str:
    """DuckDB-SQL twin of :func:`_knuth_hash`. Deliberately DuckDB-dialect:
    ``//`` (exact int64 floor division) and C-style ``%`` keep every step in
    integer arithmetic — a portable ``CAST(x/65536 ...)`` would route through
    DOUBLE and lose exactness above 2^53, which the pre-shift product here
    (up to ~5.5e18) exceeds. Porting to another engine means swapping in its
    exact integer-division operator (e.g. Postgres ``div(x, 65536)``)."""
    return (f"((((({key_col} % 2147483648) + 2147483648) % 2147483648)"
            f" * {_KNUTH_C} + {salt}) // 65536)")


def shard_assign(df: DataFrame, key_col: str, n_shards: int,
                 salt: int = DEFAULT_SEED, out_col: str = "shard") -> DataFrame:
    """Deterministic cross-engine shard assignment over an integer key —
    the write-the-training-corpus step: ``shard = knuth_hash(key) mod n``.

    Pure per-row arithmetic: no shuffle, no skew sensitivity, stable under
    reruns and engine swaps (the SQL twin is :func:`shard_assign_sql`), so
    shard membership can be asserted by an external system. Pair with
    ``write.partitionBy(out_col)`` for one directory per shard."""
    return df.withColumn(
        out_col, F.pmod(_knuth_hash(key_col, salt), F.lit(n_shards)).cast("int"))


def shard_assign_sql(key_col: str, n_shards: int,
                     salt: int = DEFAULT_SEED) -> str:
    """DuckDB-SQL twin (see :func:`_knuth_hash_sql` dialect note) of :func:`shard_assign`'s shard expression."""
    return f"CAST({_knuth_hash_sql(key_col, salt)} % {n_shards} AS INTEGER)"


def per_group_quota_sample(df: DataFrame, group_col: str, key_col: str,
                           quota: int, salt: int = DEFAULT_SEED) -> DataFrame:
    """Deterministic per-group quota sample: keep the ``quota`` rows of each
    group with the smallest :func:`_perm_rank` of ``key_col`` (key asc as
    the out-of-domain-collision tiebreak) — balanced per-source corpus
    construction with a reproducible, engine-independent keep-set.

    Ranking history: this originally ordered by raw :func:`_knuth_hash`,
    whose ``div 2¹⁶`` keeps the product's monotone HIGH bits — ordering by
    it is ordering by the key, so the "sample" silently kept each group's
    smallest keys (fine for determinism, wrong for representativeness —
    low ids are the OLDEST records in most corpora). ``_perm_rank`` is the
    bijective low-bits mix, a genuine scrambled permutation.

    Plan: one hash-partitioned window per group — each group sorts only its
    own rows. For groups large enough that a single group's rows strain one
    task, pre-thin with :func:`modulo_sample` at a few× the target rate
    first; the quota then resolves among survivors."""
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(
        _perm_rank(key_col, salt).asc(), F.col(key_col).asc())
    return (df.withColumn("_quota_rn", F.row_number().over(w))
            .filter(F.col("_quota_rn") <= quota).drop("_quota_rn"))


def per_group_quota_sql(table: str, group_col: str, key_col: str,
                        quota: int, salt: int = DEFAULT_SEED) -> str:
    """DuckDB-SQL twin (see :func:`_knuth_hash_sql` dialect note) of :func:`per_group_quota_sample` (as a subquery)."""
    h = _perm_rank_sql(key_col, salt)
    return (f"(SELECT * FROM (SELECT *, row_number() OVER "
            f"(PARTITION BY {group_col} ORDER BY {h} ASC, {key_col} ASC) "
            f"AS _quota_rn FROM {table}) WHERE _quota_rn <= {quota})")


def mixture_sample(df: DataFrame, source_col: str, key_col: str,
                   fractions: dict[str, float], default: float = 0.0,
                   salt: int = DEFAULT_SEED) -> DataFrame:
    """Deterministic training-data MIXTURE: sample each source at its own
    rate (the up/down-weighting step of corpus mixing — e.g. wiki 3×
    oversampled relative to web crawl) with the cross-engine keep predicate
    of :func:`modulo_sample`, so the mixed corpus is reproducible and
    externally verifiable. Sources absent from ``fractions`` keep
    ``default`` (0 = dropped).

    Per-row arithmetic against a CASE over the source column — no shuffle,
    no per-source scans: one pass whatever the number of sources."""
    h = F.pmod(_knuth_hash(key_col, salt), F.lit(1_000_000))
    thresh = F.lit(int(default * 1_000_000))
    for src, frac in sorted(fractions.items()):
        thresh = F.when(F.col(source_col) == src,
                        F.lit(int(frac * 1_000_000))).otherwise(thresh)
    return df.filter(h < thresh)


def mixture_sample_predicate_sql(source_col: str, key_col: str,
                                 fractions: dict[str, float],
                                 default: float = 0.0,
                                 salt: int = DEFAULT_SEED) -> str:
    """DuckDB-SQL twin (see :func:`_knuth_hash_sql` dialect note) of :func:`mixture_sample`'s keep predicate."""
    h = f"({_knuth_hash_sql(key_col, salt)} % 1000000)"
    cases = " ".join(
        # SQL string literals escape an embedded quote by doubling it — a
        # source name like "o'reilly" must not produce a malformed CASE arm.
        f"WHEN '{src.replace(chr(39), chr(39) * 2)}' "
        f"THEN {int(frac * 1_000_000)}"
        for src, frac in sorted(fractions.items()))
    return (f"{h} < (CASE {source_col} {cases} "
            f"ELSE {int(default * 1_000_000)} END)")


def modulo_sample_predicate_sql(key_col: str, fraction: float,
                                salt: int = DEFAULT_SEED) -> str:
    """The DuckDB-SQL twin (see :func:`_knuth_hash_sql` dialect note) of :func:`modulo_sample`'s keep predicate — run it
    in DuckDB/Trino/BigQuery to reproduce the exact keep-set. Kept in one
    place so the Spark expression and the oracle SQL cannot drift.

    ``((x % m) + m) % m`` is the portable non-negative mod; the division is
    integer (both operands BIGINT) and truncating — identical to floor for
    the non-negative numerator guaranteed by the canonicalized key."""
    return (f"((((({key_col} % 2147483648) + 2147483648) % 2147483648)"
            f" * {_KNUTH_C} + {salt}) // 65536) % 1000000"
            f" < {int(fraction * 1_000_000)}")


def weighted_bernoulli_sample(df: DataFrame, key_col: str, weight_col,
                              salt: int = DEFAULT_SEED,
                              scale: int = 1_000_000) -> DataFrame:
    """Deterministic PER-ROW weighted Bernoulli sample: keep a row with
    probability equal to its own ``weight_col`` value (clamped to [0, 1]) —
    the quality-proportional document-sampling step of corpus construction
    (rows carry a learned quality score; high-quality documents survive at
    higher rates). The row-level generalization of :func:`mixture_sample`'s
    per-source rates.

    Keep predicate: ``knuth_hash(key) mod scale < floor(weight * scale)`` —
    the weight is quantized to ``1/scale`` resolution ONCE, so the decision
    is pure integer comparison and any engine reproduces the identical
    keep-set (:func:`weighted_bernoulli_predicate_sql`). Per-row arithmetic,
    no shuffle, streaming-safe."""
    w = F.least(F.greatest(F.col(weight_col) if isinstance(weight_col, str)
                           else weight_col, F.lit(0.0)), F.lit(1.0))
    h = F.pmod(_knuth_hash(key_col, salt), F.lit(scale))
    return df.filter(h < F.floor(w * scale).cast("long"))


def weighted_bernoulli_predicate_sql(key_col: str, weight_expr: str,
                                     salt: int = DEFAULT_SEED,
                                     scale: int = 1_000_000) -> str:
    """DuckDB-SQL twin (see :func:`_knuth_hash_sql` dialect note) of
    :func:`weighted_bernoulli_sample`'s keep predicate. ``weight_expr`` is
    any SQL expression computing the per-row weight."""
    w = f"least(greatest(({weight_expr}), 0.0), 1.0)"
    return (f"({_knuth_hash_sql(key_col, salt)} % {scale})"
            f" < CAST(floor({w} * {scale}) AS BIGINT)")


def _perm_rank(key_col: str, salt: int):
    """Bijective pseudo-random PERMUTATION rank over integer keys:
    ``((key + salt) mod 2³¹) · C mod 2³¹``. Ordering by this value is a
    genuinely scrambled order — the property :func:`_knuth_hash` does NOT
    have for ordering purposes: its ``div 2¹⁶`` keeps the product's HIGH
    bits, which grow monotonically with the key (~40504 per step, no
    64-bit wrap below 2³¹·C), so ordering by it is ordering by key. The
    LOW 31 bits of the product are the mixed ones, and with C odd the map
    ``k ↦ k·C mod 2³¹`` is a bijection on [0, 2³¹) — distinct in-domain
    keys get distinct ranks (no tie clusters at any corpus size).

    The salt offsets the KEY, not the product: a post-multiply ``+ salt``
    shifts every rank by the same constant (same order), while a key
    offset hands each salt the rank sequence of a translated key range —
    multiplicative mixing decorrelates those completely. Overflow-free
    (operands < 2³¹ and C < 2³² ⇒ product < 2⁶³); exact int64 arithmetic
    on any engine (:func:`_perm_rank_sql`)."""
    k = F.pmod(F.col(key_col) + F.lit(salt), F.lit(1 << 31))
    return F.pmod(k * F.lit(_KNUTH_C), F.lit(1 << 31))


def _perm_rank_sql(key_col: str, salt: int) -> str:
    """DuckDB-SQL twin of :func:`_perm_rank` (see :func:`_knuth_hash_sql`
    dialect note; the product is non-negative so one canonicalizing
    double-mod on the key side suffices)."""
    return (f"(((({key_col} + {salt}) % 2147483648 + 2147483648)"
            f" % 2147483648) * {_KNUTH_C} % 2147483648)")


def epoch_batch_manifest(df: DataFrame, key_col: str, token_col: str,
                         budget: int, epochs: int = 2,
                         salt: int = DEFAULT_SEED,
                         caches: list | None = None) -> DataFrame:
    """Deterministic per-epoch training order + fixed-token-budget
    microbatch manifest — the data-order side of reproducible LLM
    training: every epoch is a fresh global permutation (the epoch-salted
    bijective ``_perm_rank`` over the document key — NOT the raw
    ``_knuth_hash``, whose order is key-monotone — so any engine, and any
    restart, reproduces the exact same shuffled order), and consecutive
    documents pack greedily into batches of ``budget`` tokens.

    Batch semantics: document d lands in batch
    ``floor(exclusive_token_prefix(d) / budget)`` along the epoch's
    order — i.e. batch b covers the token interval
    [b·budget, (b+1)·budget), with a document straddling a boundary
    belonging to the batch its FIRST token falls in. A pure function of
    the prefix sum, so the manifest is exact integer arithmetic
    end-to-end and a resumed run can seek to any batch without replaying
    the shuffle.

    Plan: per epoch, ONE range-partitioned sort on the hash order +
    the metadata-sized per-partition offset collect
    (:func:`ranks.global_prefix_sum` — no single-partition window at any
    size), then a map-side-combined (epoch, batch) agg. Epochs union.

    ``caches`` receives the internally persisted range-sorted tables
    (ranks.py ownership contract).

    Returns one row per (epoch, batch_id): n_docs, sum_tokens, min_h
    (the batch's first hash key — lets an external consumer verify the
    order without recomputing it)."""
    from . import ranks

    out = None
    for epoch in range(epochs):
        h = _perm_rank(key_col, salt + epoch)
        ordered = df.select(F.col(key_col), F.col(token_col),
                            h.alias("_h"))
        cum = ranks.global_prefix_sum(
            ordered, [F.col("_h").asc(), F.col(key_col).asc()],
            token_col, out_col="_cum", caches=caches)
        batches = (cum
                   .withColumn("_pre", F.col("_cum") - F.col(token_col))
                   .groupBy(F.floor(F.col("_pre") / budget)
                             .cast("long").alias("batch_id"))
                   .agg(F.count("*").alias("n_docs"),
                        F.sum(token_col).cast("long").alias("sum_tokens"),
                        F.min("_h").alias("min_h"))
                   .select(F.lit(epoch).alias("epoch"), "batch_id",
                           "n_docs", "sum_tokens", "min_h"))
        out = batches if out is None else out.unionAll(batches)
    return out


def epoch_batch_manifest_sql(key_col: str, token_col: str, budget: int,
                             epochs: int = 2,
                             salt: int = DEFAULT_SEED) -> str:
    """DuckDB-SQL twin of :func:`epoch_batch_manifest` over a table named
    ``t`` with columns ``key_col``/``token_col`` (see
    :func:`_knuth_hash_sql` dialect note). Single-partition window on the
    oracle side — the point of the twin is semantics, not scale."""
    parts = []
    for epoch in range(epochs):
        hx = _perm_rank_sql(key_col, salt + epoch)
        parts.append(f"""
        SELECT {epoch} AS epoch,
               CAST(floor(pre / {budget}) AS BIGINT) AS batch_id,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum({token_col}) AS BIGINT) AS sum_tokens,
               min(h) AS min_h
        FROM (SELECT {token_col}, h,
                     sum({token_col}) OVER (ORDER BY h, {key_col}
                         ROWS UNBOUNDED PRECEDING) - {token_col} AS pre
              FROM (SELECT {key_col}, {token_col}, {hx} AS h FROM t))
        GROUP BY 2""")
    return " UNION ALL ".join(parts)


def temperature_mixture_plan(df: DataFrame, source_col: str = "source",
                             tokens_col: str = "n_tokens",
                             tau: float = 0.7, budget: int = 100_000,
                             scale: int = 4) -> DataFrame:
    """Temperature-scaled data-mixture planning — the sampling-weight
    computation of multilingual/multi-source LLM training (sample source
    i with probability ∝ nᵢ^τ, τ < 1 up-weighting small sources): per
    source, the token mass, the normalized mixture weight, the planned
    tokens per epoch under a global token ``budget``, and how many
    epochs exhaust the source at that rate (small sources repeat —
    the overexposure number data-mixing work watches).

    One map-side-combined agg to source-level token sums (sources-sized
    output), then pure scalar arithmetic against the broadcast total.
    Cross-engine determinism: each ``nᵢ^τ`` rounds to ``scale`` then
    sums as exact DECIMAL (associative integer math — aggregation order
    can't drift the total), the weight is one IEEE divide of identical
    operands rounded once, and planned tokens floor a double product of
    identical operands."""
    per = (df.groupBy(source_col)
             .agg(F.sum(tokens_col).cast("long").alias("n_tokens"))
             .withColumn(
                 "p",
                 F.round(F.pow(F.col("n_tokens").cast("double"),
                               F.lit(tau)), scale)
                  .cast(f"decimal(18,{scale})")))
    tot = per.agg(F.sum("p").alias("ptot"))
    w = F.round(F.col("p").cast("double") / F.col("ptot").cast("double"),
                6)
    planned = F.floor(w * F.lit(float(budget))).cast("long")
    return (per.crossJoin(F.broadcast(tot))
            .select(source_col, "n_tokens", w.alias("weight"),
                    planned.alias("planned_tokens_per_epoch"),
                    F.when(planned > 0,
                           F.round(F.col("n_tokens").cast("double")
                                   / planned.cast("double"), 2))
                     .alias("epochs_to_exhaust")))


def priority_sample(df: DataFrame, key_col: str, weight_col: str,
                    n: int, salt: int = DEFAULT_SEED) -> DataFrame:
    """Fixed-size weighted sample without replacement — priority
    sampling (Duffield–Lund–Thorup, JACM 2007): each row draws priority
    ``q = w / u`` with ``u`` uniform on (0, 1]; the ``n`` largest
    priorities are the sample. Complements
    :func:`weighted_bernoulli_sample` (independent per-row keeps, random
    output SIZE) when the pipeline needs an exact quota — e.g. "exactly
    n docs, quality-proportional" for an eval set or an annotation batch.

    Determinism/portability: ``u = (perm_rank(key)+1) / 2³¹`` — the
    bijective multiplicative-permutation hash (no tie clusters, salt
    decorrelates draws), so the priority is
    ``w · 2³¹ / (perm_rank+1)``: one exact int→double product and ONE
    IEEE divide — bit-identical on any engine, no rounding needed, and
    a SQL twin reproduces the exact sample. Total order: priority desc,
    key asc.

    Plan: pure per-row arithmetic + global top-n
    (TakeOrderedAndProject) — no shuffle of the full input at any
    corpus size, streaming-safe."""
    u_rank = _perm_rank(key_col, salt)
    prio = (F.col(weight_col).cast("double") * F.lit(float(1 << 31))
            / (u_rank + F.lit(1)).cast("double"))
    return (df.withColumn("_priority", prio)
            .orderBy(F.desc("_priority"), F.col(key_col).asc())
            .limit(n))


def priority_sample_sql(key_col: str, weight_col: str, n: int,
                        salt: int = DEFAULT_SEED) -> str:
    """DuckDB ORDER-BY/LIMIT twin of :func:`priority_sample` — the
    priority expression and tiebreak, for embedding in an oracle's
    ``ORDER BY ... LIMIT {n}`` (see :func:`_perm_rank_sql`)."""
    h = _perm_rank_sql(key_col, salt)
    return (f"(CAST({weight_col} AS DOUBLE) * 2147483648.0"
            f" / CAST(({h}) + 1 AS DOUBLE))")


#: floor(CDF_Poisson(1)(k) · 2³¹) for k = 0..9 — integer cutoffs for a
#: hash-derived Poisson(1) draw: k = #cutoffs ≤ rank. Exact int64
#: comparisons, so any engine draws the identical weights.
_POISSON1_CUTOFFS = (
    790015084, 1580030168, 1975037710, 2106706891, 2139624186,
    2146207645, 2147304888, 2147461638, 2147481231, 2147483408)


def poisson_bootstrap_ci(df: DataFrame, value_col: str, key_col: str,
                         b: int = 50, salt: int = 1000,
                         alpha: float = 0.05,
                         scale: int = 4) -> DataFrame:
    """Percentile confidence interval for the corpus mean of
    ``value_col`` by POISSON bootstrap — the resampling scheme that
    distributes (Chamandy et al. 2012, "Estimating Uncertainty for
    Massive Data Streams"): the multinomial bootstrap needs the global
    N per draw, but Poisson(1) per-row weights are independent, so each
    row computes its ``b`` replicate weights locally from a hash and
    the per-replicate means reduce in one aggregation. This is the
    error bar a curation dashboard should put on every corpus-mean
    metric before acting on a shift.

    Determinism: weight k for (row, replicate) counts the
    :data:`_POISSON1_CUTOFFS` at or below the replicate-salted
    ``_perm_rank`` — exact integer arithmetic, identical draws on any
    engine. The value rounds once to ``scale`` and weighted sums
    accumulate as exact DECIMAL; each replicate mean is ONE IEEE
    divide; the CI picks order statistics (rank ⌊α/2·b⌋+1 and
    ⌈(1−α/2)·b⌉, replicate id as tiebreak) — no float summation
    anywhere.

    Plan: one in-row ``explode(sequence(0, b−1))`` (narrow (key, value)
    rows only — the ×b blow-up never carries the corpus payload), one
    map-side-combined b-group aggregation, then the b-row order
    statistics. Returns one row: (n_rows, n_replicates, mean,
    ci_lo, ci_hi)."""
    import math as _math

    from pyspark.sql import Window

    val = F.round(F.col(value_col), scale).cast(f"decimal(18,{scale})")
    base = df.select(F.col(key_col).alias("_k"), val.alias("_v"))
    rep = base.select(
        "_k", "_v",
        F.explode(F.sequence(F.lit(0), F.lit(b - 1))).alias("_b"))
    k0 = F.pmod(F.col("_k") + F.lit(salt) + F.col("_b"), F.lit(1 << 31))
    rank = F.pmod(k0 * F.lit(_KNUTH_C), F.lit(1 << 31))
    w = sum((rank >= F.lit(c)).cast("int") for c in _POISSON1_CUTOFFS)
    means = (rep.select("_b", "_v", w.alias("_w"))
             .groupBy("_b")
             .agg((F.sum(F.col("_w") * F.col("_v")).cast("double")
                   / F.sum("_w").cast("double")).alias("_mean")))
    lo_rank = int(_math.floor(alpha / 2 * b)) + 1
    hi_rank = int(_math.ceil((1 - alpha / 2) * b))
    ordered = means.withColumn(
        "_r", F.row_number().over(
            Window.orderBy(F.asc("_mean"), F.asc("_b"))))
    ci = (ordered.agg(
        F.max(F.when(F.col("_r") == lo_rank, F.col("_mean")))
         .alias("ci_lo"),
        F.max(F.when(F.col("_r") == hi_rank, F.col("_mean")))
         .alias("ci_hi")))
    full = base.agg(
        F.count("*").alias("n_rows"),
        (F.sum("_v").cast("double") / F.count("*")).alias("mean"))
    return (full.crossJoin(F.broadcast(ci))
            .select("n_rows", F.lit(b).alias("n_replicates"),
                    "mean", "ci_lo", "ci_hi"))


def unimax_allocation(df: DataFrame, group_col: str, tokens_col: str,
                      budget: int, epoch_cap: float = 1.0) -> DataFrame:
    """UniMax budget allocation (Chung et al. 2023, "UniMax: Fairer and
    More Effective Language Sampling"): split a total token ``budget``
    across groups AS UNIFORMLY AS POSSIBLE subject to no group repeating
    more than ``epoch_cap`` epochs (alloc_g ≤ ⌊epoch_cap·n_g⌋) — the
    principled alternative to temperature mixing
    (:func:`temperature_mixture_plan`) when over-exposure of small
    sources is the binding constraint.

    Closed form instead of the paper's iterative loop: sort groups by
    cap ascending; a group is SATURATED iff giving every not-yet-placed
    group its cap-or-more would still fit —
    ``cap_i·(K−i+1) + prefix_{i−1} ≤ B`` (monotone in i, exact int64
    arithmetic) — and every unsaturated group gets the same fair share
    ``(B − Σ_sat caps) / (K − #sat)``: ONE IEEE divide of exact
    integers, so any engine reproduces the allocation bit-for-bit.

    Plan: one map-side-combined agg to group-level token sums; the
    sort/window/rollup all run on the K-row group relation (groups =
    languages/sources — K is small by definition; the corpus
    contributes one pass). Returns one row per group: (group_col,
    n_tokens, cap, saturated, alloc, epochs), group ascending."""
    from pyspark.sql import Window

    per = (df.groupBy(group_col)
           .agg(F.sum(tokens_col).cast("long").alias("n_tokens"))
           .withColumn("cap",
                       F.floor(F.lit(float(epoch_cap))
                               * F.col("n_tokens")).cast("long")))
    w = Window.orderBy(F.asc("cap"), F.asc(group_col))
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranked = (per
              .withColumn("_i", F.row_number().over(w))
              .withColumn("_pre", F.sum("cap").over(wcum) - F.col("cap")))
    tot = ranked.agg(F.count("*").alias("_k"))
    flagged = (ranked.crossJoin(F.broadcast(tot))
               .withColumn(
                   "_sat",
                   (F.col("cap") * (F.col("_k") - F.col("_i") + 1)
                    + F.col("_pre")) <= F.lit(budget)))
    sat_tot = flagged.agg(
        F.coalesce(F.sum(F.col("_sat").cast("long")), F.lit(0))
         .alias("_j"),
        F.coalesce(F.sum(F.when(F.col("_sat"), F.col("cap"))), F.lit(0))
         .alias("_p"))
    fair = F.when(
        F.col("_k") > F.col("_j"),
        (F.lit(budget) - F.col("_p")).cast("double")
        / (F.col("_k") - F.col("_j")).cast("double")).otherwise(F.lit(0.0))
    alloc = F.when(F.col("_sat"), F.col("cap").cast("double")) \
             .otherwise(fair)
    return (flagged.crossJoin(F.broadcast(sat_tot))
            .select(group_col, "n_tokens", "cap",
                    F.col("_sat").cast("int").alias("saturated"),
                    alloc.alias("alloc"),
                    (alloc / F.col("n_tokens").cast("double"))
                     .alias("epochs"))
            .orderBy(group_col))
