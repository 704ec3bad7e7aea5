"""Count-min sketch heavy hitters with a cross-engine hash convention.

The 100 TB frequency problem: exact per-token counts over a web-scale
corpus shuffle one row per DISTINCT token (billions). A count-min sketch
replaces that with a fixed d×w counter grid — the shuffle carries at most
``depth × width`` partially-aggregated cells no matter how many tokens or
rows exist, and grids from different corpus shards MERGE by cell-wise
addition (same mergeability contract as the q111 HLL partials).

Hash convention: sketches are only auditable cross-engine if both engines
bucket identically, so the row hashes are built from ``md5`` (identical in
Spark and DuckDB) with the leading 4 hex nibbles decoded through
``instr('0123456789abcdef', c)`` arithmetic — both engines evaluate the
exact same integers, which is what lets the q129 oracle certify the
estimate bounds as literal booleans (q111's tolerance-certificate pattern).

Estimate guarantees (Cormode & Muthukrishnan 2005): each cell only ever
ADDS colliding tokens' counts, so ``estimate ≥ exact`` always;
``estimate ≤ exact + εN`` where the min over ``depth`` independent rows
drives the failure probability to ``e^{-depth}``. On FIXED fixture data the
certificate is fully deterministic — the bound columns are measured-margin
facts, not probabilistic claims.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_DEPTH = 4
DEFAULT_WIDTH = 512

_HEX = "0123456789abcdef"


def _bucket(token: Column, row: int, width: int) -> Column:
    """Cross-engine bucket: first 4 md5 nibbles of ``row:token`` → mod w.

    16 bits of hash feed the modulus; keep ``width ≤ 65536``."""
    h = F.md5(F.concat(F.lit(f"{row}:"), token))
    val = F.lit(0)
    for i in range(1, 5):
        c = F.substring(h, i, 1)
        val = val * 16 + (F.instr(F.lit(_HEX), c) - 1)
    return F.pmod(val, F.lit(width))


def _bucket_sql(token_expr: str, row: int, width: int) -> str:
    """DuckDB twin of :func:`_bucket` — same md5, same nibble arithmetic."""
    h = f"md5('{row}:' || {token_expr})"
    val = "0"
    for i in range(1, 5):
        val = (f"(({val}) * 16 + (instr('{_HEX}', substr({h}, {i}, 1)) - 1))")
    return f"(({val}) % {width})"


def cms_build(tokens: DataFrame, token_col: str = "token",
              weight_col: str | None = None,
              depth: int = DEFAULT_DEPTH,
              width: int = DEFAULT_WIDTH) -> DataFrame:
    """Build the d×w counter grid: ``(row, bucket, cnt)``.

    Map-side: each token occurrence emits ``depth`` (row, bucket) cells via
    an inline array — the groupBy partial-aggregates them, so the shuffle
    moves ≤ d·w cells per task regardless of input size. ``weight_col``
    supports pre-aggregated (token, count) inputs."""
    if not 0 < width <= 65536:
        raise ValueError(f"width must be in (0, 65536] — the bucket hash "
                         f"carries 16 bits; got {width}")
    w = F.col(weight_col) if weight_col else F.lit(1)
    cells = tokens.select(
        F.explode(F.array(*[
            F.struct(F.lit(r).alias("row"),
                     _bucket(F.col(token_col), r, width).alias("bucket"))
            for r in range(depth)])).alias("cell"),
        w.alias("w"))
    return (cells.groupBy(F.col("cell.row").alias("row"),
                          F.col("cell.bucket").alias("bucket"))
            .agg(F.sum("w").alias("cnt")))


def cms_merge(*grids: DataFrame) -> DataFrame:
    """Merge shard grids cell-wise — the associative rollup that lets
    per-shard sketches be persisted and combined without re-scanning."""
    out = grids[0]
    for g in grids[1:]:
        out = out.unionByName(g)
    return out.groupBy("row", "bucket").agg(F.sum("cnt").alias("cnt"))


def write_cms_batch_partials(batch_df: DataFrame, batch_id: int,
                             out_dir: str, token_col: str = "token",
                             depth: int = DEFAULT_DEPTH,
                             width: int = DEFAULT_WIDTH) -> None:
    """One micro-batch's d×w cell partials, written to the DETERMINISTIC
    per-batch path ``out_dir/batch={batch_id}`` with mode('overwrite') —
    module-level so the crash-replay contract is directly unit-testable
    (``test_streaming.py::test_cms_partials_batch_replay_idempotent``).

    RESTART SAFETY (VERDICT r13 #7): CMS cells merge by SUM, which is
    NOT idempotent — the pre-r14 blind ``mode('append')`` double-counted
    a batch whenever a crash landed between the parquet append and the
    checkpoint commit (foreachBatch is at-least-once across restarts).
    Keying the write by batch_id makes the replay overwrite its own
    directory instead: committed batches are never replayed (checkpoint
    contract), and an uncommitted replay is idempotent. Contrast the
    HLL partials (``aggregates.merge_distinct_sketches``): register-MAX
    union is idempotent, so duplicate HLL partials are harmless by
    construction and need no per-batch keying."""
    (cms_build(batch_df, token_col, depth=depth, width=width)
     .write.mode("overwrite")
     .parquet(f"{out_dir}/batch={batch_id}"))


def run_streaming_cms_partials(token_stream: DataFrame, out_dir: str,
                               checkpoint_dir: str, token_col: str = "token",
                               depth: int = DEFAULT_DEPTH,
                               width: int = DEFAULT_WIDTH) -> None:
    """Maintain the sketch INCREMENTALLY over a stream: each micro-batch
    writes its own d×w cell partials under ``out_dir`` — no
    read-modify-write, no state store. Mergeability does the work: the
    "grid" is a log of per-batch partials that :func:`read_cms_grid`
    folds on read (and a periodic batch compaction can fold in place).
    Exactly-once across CRASH RESTARTS comes from deterministic
    per-batch paths (:func:`write_cms_batch_partials`): a replayed
    uncommitted batch overwrites its own ``batch={id}`` directory
    rather than appending a duplicate — sum-merged cells are not
    duplicate-safe the way HLL's max-union is. Lifecycle note:
    ``out_dir`` and ``checkpoint_dir`` are ONE unit — a fresh
    checkpoint restarts batch ids at 0 and means "recount the stream",
    so it must come with a fresh ``out_dir``.

    This is the 100 TB streaming-frequency design: per batch, only ≤ d·w
    aggregated cells are written, independent of batch row count."""
    def append_partials(batch_df: DataFrame, batch_id: int) -> None:
        write_cms_batch_partials(batch_df, batch_id, out_dir, token_col,
                                 depth, width)

    (token_stream.writeStream.foreachBatch(append_partials)
     .option("checkpointLocation", checkpoint_dir)
     .trigger(availableNow=True).start().awaitTermination(300))


def read_cms_grid(spark, out_dir: str) -> DataFrame:
    """Fold the per-batch partial log back into one d×w grid. The
    ``batch={id}`` layout reads as a Hive-partitioned column the fold
    simply ignores — the groupBy is on (row, bucket) alone."""
    return (spark.read.parquet(out_dir)
            .groupBy("row", "bucket").agg(F.sum("cnt").alias("cnt")))


def cms_estimate(grid: DataFrame, candidates: DataFrame,
                 token_col: str = "token",
                 depth: int = DEFAULT_DEPTH,
                 width: int = DEFAULT_WIDTH) -> DataFrame:
    """Point estimates for ``candidates``: min over rows of the token's cell.

    Candidates × depth probe rows broadcast-join the grid on (row, bucket);
    missing cells read as 0 (min() never sees them — a missing cell means
    estimate 0, only possible for tokens absent from the build)."""
    probes = candidates.select(
        token_col,
        F.explode(F.array(*[
            F.struct(F.lit(r).alias("row"),
                     _bucket(F.col(token_col), r, width).alias("bucket"))
            for r in range(depth)])).alias("cell"))
    joined = probes.join(
        F.broadcast(grid),
        (probes["cell.row"] == grid["row"])
        & (probes["cell.bucket"] == grid["bucket"]),
        "left")
    return (joined.groupBy(token_col)
            .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0)))
                 .alias("cms_estimate")))
