"""Structured Streaming surface over the events schema.

The reference is batch-only (SURVEY §2.13), so this is net-new engine surface
built so every batch aggregation in ``queries.py`` has a streaming twin with
IDENTICAL transformation code: the same ``F.window``/groupBy expressions run
under ``readStream`` with a watermark. Batch query q22_hourly_window and
:func:`hourly_counts` share semantics by construction.

Late data: event-time watermarks bound state (without one, a windowed agg's
state grows forever at 100 TB/day); sessionization uses the native
``session_window`` (gap-based, state pruned by watermark).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: events.parquet schema with µs timestamps (see sources.catalog for the
#: nanos handling on the batch path; streaming file sources declare this).
EVENTS_DDL = ("event_id bigint, ts timestamp, user_id bigint, "
              "event_type string, value double, props string")


def read_event_stream(spark: SparkSession, path: str,
                      fmt: str = "parquet") -> DataFrame:
    """File-based event stream: picks up files appearing under ``path``.
    Swap for kafka by changing format/options — downstream code is agnostic."""
    return (spark.readStream.format(fmt).schema(EVENTS_DDL).load(path))


def hourly_counts(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming twin of q22_hourly_window: tumbling 1h event-time windows,
    per event type. Watermark bounds window state; output mode 'append' emits
    each window once it can no longer receive late rows."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.round(F.sum(F.col("value").cast("decimal(18,2)")).cast("double"), 2)
             .alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "event_type",
                "n_events", "sum_value")
    )


def windowed_type_counts(events: DataFrame, duration: str = "6 hours",
                         watermark: str = "2 hours") -> DataFrame:
    """Tumbling event-time windows of arbitrary ``duration``, counted per
    event type — :func:`hourly_counts` generalized to the window length a
    dashboard rollup actually wants. Epoch-aligned (Spark's ``window``
    with no startTime offset), so a batch engine's ``time_bucket`` twin
    lands on identical boundaries. Watermark bounds window state."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", duration).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "event_type",
                "n_events")
    )


def sessionized_counts(events: DataFrame, gap: str = "30 minutes",
                       watermark: str = "2 hours") -> DataFrame:
    """Native gap-based session windows per user (the streaming analog of the
    batch lag/cumsum sessionization in q24): state is one open session per
    user, pruned by the watermark."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("s"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("user_id", F.col("s.start").alias("session_start"),
                F.col("s.end").alias("session_end"), "n_events")
    )


def sliding_counts(events: DataFrame, window: str = "1 hour",
                   slide: str = "30 minutes",
                   watermark: str = "2 hours") -> DataFrame:
    """Sliding (hopping) event-time windows: each event lands in
    window/slide overlapping windows (2 for 1h/30m). Spark materializes the
    window list per row map-side, so the shuffle carries (window, type) keys —
    state per open window is bounded by the watermark exactly as tumbling."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("win_start"), "n_events")
    )


def enrich_with_dim(events: DataFrame, dim: DataFrame,
                    stream_key: str, dim_key: str) -> DataFrame:
    """Stream-static join: enrich the stream with a broadcast dimension.
    Static side is re-read per micro-batch (picks up dim updates); broadcast
    keeps it shuffle-free — the 100 TB/day shape for adding user/item
    attributes to an event stream."""
    return events.join(
        F.broadcast(dim.withColumnRenamed(dim_key, stream_key)),
        stream_key, "inner")


def interval_join_streams(left: DataFrame, right: DataFrame,
                          key: str = "user_id", max_span: str = "1 hour",
                          watermark: str = "2 hours",
                          how: str = "inner") -> DataFrame:
    """STREAM-STREAM event-time interval join: match each left event to
    right events with the same ``key`` whose ``ts`` falls in
    ``[left.ts, left.ts + max_span]`` — the attribution shape (click →
    purchase within the hour) at 100 TB/day.

    Both sides carry a watermark and the join condition bounds the two
    event times against each other; together those let Spark DROP buffered
    rows once they can no longer match (state per side ≈ watermark + span
    of data, not the whole stream — without the time-range condition a
    stream-stream join buffers everything forever). Inner-join results
    emit eagerly as matches arrive; ``left_outer``/``right_outer`` are
    supported by Spark but null-padded results only emit once the
    watermark closes the row, so a finite availableNow drain can end
    before emitting the tail — use outer modes on genuinely continuous
    streams, and the oracle-checked query uses inner.

    Output: (key, l_id, l_ts, r_id, r_ts)."""
    l = (left.withWatermark("ts", watermark)
         .select(F.col(key).alias("k"),
                 F.col("event_id").alias("l_id"), F.col("ts").alias("l_ts")))
    r = (right.withWatermark("ts", watermark)
         .select(F.col(key).alias("rk"),
                 F.col("event_id").alias("r_id"), F.col("ts").alias("r_ts")))
    cond = ((F.col("k") == F.col("rk"))
            & (F.col("r_ts") >= F.col("l_ts"))
            & (F.col("r_ts") <= F.col("l_ts") + F.expr(f"INTERVAL {max_span}")))
    return (l.join(r, cond, how)
            .select(F.col("k").alias(key), "l_id", "l_ts", "r_id", "r_ts"))


def read_event_stream_auto(spark: SparkSession, path: str) -> DataFrame:
    """Unit-aware event stream over an events parquet file.

    A file stream source takes a DECLARED schema — it never looks at the
    footer — so the declaration must match the file's physical ``ts`` type,
    which has differed across fixture generations (int64 nanoseconds vs
    native ``timestamp[us]``). Probe the type with a one-off batch read
    (footer metadata only, no data scan) and branch exactly as the batch
    catalog's LongType guard does (``sources/catalog.py``):

    - footer says timestamp → declare ``ts timestamp``, no arithmetic;
    - footer says int64 nanos (loads as ``LongType`` under the legacy
      ``nanosAsLong`` conf) → declare ``ts bigint`` and truncate nanos→µs
      in the stream.

    Declaring bigint over a timestamp[us] file silently parses the raw µs
    int64 and the ÷1000 collapses every event into 1970 — the unguarded
    failure this probe exists to prevent.

    Session-conf hygiene (r5 ADVICE): the probe needs the legacy
    ``nanosAsLong`` conf, which is SESSION-wide. When the footer says native
    timestamp (the current fixtures), the conf is restored to its prior
    state before returning — no side effect on later batch reads. When the
    footer says int64 nanos it must STAY set: the stream's scan-time parquet
    reader needs it to map TIMESTAMP(NANOS) onto the declared bigint column,
    so in that case (and only that case) the session keeps the legacy
    setting for as long as the stream may run."""
    import os

    from pyspark.sql.types import LongType

    _NANOS_CONF = "spark.sql.legacy.parquet.nanosAsLong"
    prev = spark.conf.get(_NANOS_CONF, None)
    spark.conf.set(_NANOS_CONF, "true")
    try:
        ts_type = spark.read.parquet(path).schema["ts"].dataType
    except Exception:
        if prev is None:
            spark.conf.unset(_NANOS_CONF)
        else:
            spark.conf.set(_NANOS_CONF, prev)
        raise
    ts_is_nanos_long = isinstance(ts_type, LongType)
    if not ts_is_nanos_long:
        # Native-timestamp file: the stream never needs the legacy conf.
        if prev is None:
            spark.conf.unset(_NANOS_CONF)
        else:
            spark.conf.set(_NANOS_CONF, prev)
    ddl = ("event_id bigint, ts {}, user_id bigint, "
           "event_type string, value double, props string").format(
               "bigint" if ts_is_nanos_long else "timestamp")
    # File stream sources require a DIRECTORY; point at the parent dir with a
    # glob filter so only the events file matches.
    directory, fname = os.path.split(path.rstrip("/"))
    raw = (spark.readStream.format("parquet").schema(ddl)
           .option("pathGlobFilter", fname).load(directory))
    if ts_is_nanos_long:
        raw = raw.withColumn(
            "ts", F.timestamp_micros((F.col("ts") / 1000).cast("long")))
    return raw


#: Back-compat name from when the fixtures were always int64-nanos; the auto
#: reader handles that case and the current timestamp[us] files.
read_event_stream_nanos = read_event_stream_auto


def running_user_totals(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Custom stateful streaming operator via ``applyInPandasWithState``:
    per-user running (event count, value sum) state, emitting the updated
    totals each micro-batch. The state is two numbers per user — the shape
    Spark's built-in aggs can also do, but this is the extension point for
    genuinely custom state machines (fraud scoring, CEP, per-entity models)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        # State in integer CENTS: exact and addition-order independent, so
        # the final totals are oracle-comparable against a decimal SQL sum
        # (float accumulation order varies with micro-batch arrival).
        n, cents = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            cents += int(pdf["value"].mul(100).round().astype("int64").sum())
        state.update((n, cents))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n],
                            "total_value": [cents / 100.0]})

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType="user_id bigint, n_events bigint, total_value double",
            stateStructType="n bigint, cents bigint",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def stream_dedup_exact(stream_df: DataFrame, text_col: str = "text",
                       ts_col: str | None = None,
                       watermark: str = "1 hour") -> DataFrame:
    """Streaming exact deduplication: first-seen wins, by content hash.

    With ``ts_col``, uses ``dropDuplicatesWithinWatermark`` so per-hash state
    is PRUNED once the watermark passes — the only shape whose state doesn't
    grow unboundedly on an infinite stream (dedup horizon = watermark).
    Without a time column, falls back to global ``dropDuplicates`` (exact
    forever, state grows with distinct content — finite backfills only)."""
    from pyspark.sql import functions as F

    hashed = stream_df.withColumn(
        "content_hash", F.md5(F.lower(F.trim(F.col(text_col)))))
    if ts_col:
        return (hashed.withWatermark(ts_col, watermark)
                .dropDuplicatesWithinWatermark(["content_hash"]))
    return hashed.dropDuplicates(["content_hash"])


def run_available_now(stream_df: DataFrame, query_name: str,
                      output_mode: str = "complete",
                      shuffle_partitions: int | None = 8) -> None:
    """Drain everything currently available through the streaming engine into
    an in-memory table named ``query_name`` — the batch-parity test hook.

    ``availableNow`` processes all existing input then stops (deterministic);
    'complete' mode emits every window including ones the watermark hasn't
    closed, which is what a finite-input parity check wants.

    ``shuffle_partitions`` pins the STREAM's shuffle width for the run (set
    before start, restored after): a streaming query materializes one state
    store — and for ``applyInPandasWithState`` one Python worker — PER
    shuffle partition, every micro-batch, so the batch session's width (32
    locally, hundreds on a cluster) is pure fixed cost on a short drain.
    The stream checkpoints its width at first start anyway (state layout is
    partition-count-dependent), so pinning it is also the production-correct
    move; size it to expected state volume, not to the batch width. ``None``
    leaves the session value untouched."""
    spark = stream_df.sparkSession
    conf_key = "spark.sql.shuffle.partitions"
    prev = spark.conf.get(conf_key)
    if shuffle_partitions is not None:
        spark.conf.set(conf_key, str(shuffle_partitions))
    try:
        handle = (stream_df.writeStream.format("memory")
                  .queryName(query_name)
                  .outputMode(output_mode).trigger(availableNow=True).start())
        handle.awaitTermination()
    finally:
        spark.conf.set(conf_key, prev)


def run_foreach_batch_to_parquet(stream_df: DataFrame, out_path: str,
                                 checkpoint_path: str) -> None:
    """Production sink pattern: drain the stream via ``foreachBatch`` into
    partitioned parquet, one directory per epoch.

    ``foreachBatch`` hands each micro-batch to arbitrary BATCH writer code —
    the bridge to any sink without a native streaming connector (JDBC,
    upserts, multi-sink fan-out). Exactly-once comes from the pair
    (checkpointed epoch id, idempotent-by-epoch write): a replayed batch
    overwrites its own epoch directory instead of appending duplicates."""
    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        (batch_df.withColumn("_epoch", F.lit(epoch_id))
         .write.mode("overwrite")
         .parquet(f"{out_path}/epoch={epoch_id}"))

    handle = (stream_df.writeStream.foreachBatch(write_batch)
              .option("checkpointLocation", checkpoint_path)
              .trigger(availableNow=True).start())
    handle.awaitTermination()


def stream_upsert_latest(stream_df: DataFrame, state_dir: str,
                         key_col: str = "user_id",
                         order_cols: tuple[str, ...] = ("ts", "event_id"),
                         num_buckets: int = 8,
                         ) -> list[str]:
    """Streaming MERGE keep-latest into a BUCKETED versioned parquet
    state table: drain via ``foreachBatch``, each batch upserting its
    per-key winners, and return the final state as a list of parquet
    paths (one per live bucket — ``spark.read.parquet(*paths)``).

    The batch body is the q48 merge shape applied incrementally: winners
    within the micro-batch (row_number over ``order_cols`` desc — a
    TOTAL order, ``event_id`` is unique, so ties cannot exist) merge
    against the previous state version, and the combined winner set
    writes to ``state_dir/v{epoch}`` — never overwriting the version it
    is reading (the read-your-own-overwrite corruption a naive in-place
    merge hits). Keep-latest under a total order is associative and
    commutative, so the final state is independent of how the source
    batched the input — one file or fifty, the same argmax-per-key comes
    out, which is what makes this certifiable against a batch SQL twin
    (and what exactly-once replays rely on: a re-run batch re-derives
    the same winners against the same prior version).

    PARTITION-PRUNED REWRITE (VERDICT r10 #7): state is hash-bucketed on
    ``key_col`` (``pmod(xxhash64(key), num_buckets)`` — a pure function
    of the key, recomputed on read, never stored). A micro-batch reads
    and rewrites ONLY the buckets its keys touch; a bucket-to-newest-path
    manifest stitches the live state together across versions (the
    LSM-snapshot shape), and a version directory is deleted the moment
    no bucket references it — state on disk is bounded by one live copy
    per bucket plus the in-flight version. A batch touching 1 of N
    buckets rewrites 1/N of the state, not all of it. The per-batch
    touched-bucket probe is a ``num_buckets``-bounded collect
    (metadata-scale by construction). At 100 TB, ``num_buckets`` scales
    with the key cardinality (thousands), the manifest stays
    driver-resident (one path per bucket), and the version dirs live on
    the shared FS; a lakehouse MERGE (Delta/Iceberg) is the managed
    equivalent of exactly this layout.

    REPLAY SAFETY (ADVICE r11): exactly-once under foreachBatch retry
    requires the batch body to be idempotent even when the first attempt
    died BETWEEN the parquet write and the bookkeeping. Three guards:
    (1) manifest/refs are committed atomically AFTER the write — a crash
    mid-write leaves them untouched, so the retry re-derives the same
    winners against the same prior paths; (2) ``prev_paths`` never
    points into the epoch's own version dir — if a crash after the
    commit leaves the manifest aimed at ``v{epoch}``, the retry falls
    back to the retained prior dir for those buckets instead of reading
    the directory it is about to overwrite; (3) reclaim of a fully
    superseded version dir is deferred one epoch (and the reclaim loop
    skips ``old_vdir == vdir``), so the fallback in (2) still exists on
    disk while a retry of the superseding epoch remains possible.
    Leftover deferred dirs are swept after ``awaitTermination`` — disk
    stays bounded by one live copy per bucket plus at most one
    superseded epoch in flight.

    RESTART SAFETY (ADVICE r12, closed in code): the bookkeeping is no
    longer driver-resident-only — after every committed batch it
    persists as ``_manifest.json`` beside the state (write-tmp + atomic
    rename) and is loaded on construction, so a NEW driver resuming
    against an existing ``state_dir`` merges into the committed state
    instead of an empty manifest. A fresh checkpoint restarts epoch ids
    at 0, so effective epochs carry a persisted offset past every
    version this dir ever wrote — a replayed v0 can never overwrite
    live buckets — and load-time sweeps version dirs the bookkeeping
    does not claim (the crash-between-write-and-save leak). Guards
    (1)-(3) are unchanged; keep-latest makes cross-restart re-merges
    idempotent. Manifest entries are RELATIVE to ``state_dir`` (ADVICE
    r13): absolute spellings made a resume via a relative path /
    trailing slash / symlink mis-identify every live version dir as an
    orphan and sweep committed state. Exercised end-to-end by
    ``test_streaming.py::test_upsert_state_survives_driver_restart``
    and the respelled-path variant beside it."""
    import os

    state = _BucketedUpsertState(state_dir, key_col, order_cols,
                                 num_buckets)
    handle = (stream_df.writeStream.foreachBatch(state.write_batch)
              .option("checkpointLocation", os.path.join(state_dir, "_ckpt"))
              .trigger(availableNow=True).start())
    handle.awaitTermination()
    return state.finish()


class _BucketedUpsertState:
    """Driver-resident bookkeeping for :func:`stream_upsert_latest` —
    extracted so the foreachBatch retry path (same ``epoch_id`` replayed
    after a partial first attempt) is directly unit-testable."""

    def __init__(self, state_dir: str, key_col: str,
                 order_cols: tuple[str, ...], num_buckets: int) -> None:
        self.state_dir = state_dir
        self.key_col = key_col
        self.num_buckets = num_buckets
        self.bucket_of = F.pmod(F.xxhash64(F.col(key_col)),
                                F.lit(num_buckets)).cast("int")
        self.order = [F.col(c).desc() for c in order_cols]
        self.manifest: dict[int, str] = {}  # bucket -> newest parquet dir
        self.prior: dict[int, str] = {}     # bucket -> dir served BEFORE
        #   its newest update (the replay fallback of guard (2))
        self.refs: dict[str, set[int]] = {}  # version dir -> its buckets
        self.deferred: dict[str, int] = {}  # superseded dir -> epoch
        #: restart epoch namespace: a fresh checkpoint restarts epoch
        #: ids at 0, and reusing v0 would OVERWRITE buckets the loaded
        #: manifest still serves — so effective epoch = epoch_id +
        #: offset, where offset clears every version this state dir has
        #: ever written. Constant within a run, so same-epoch retries
        #: still hit their own vdir (guards (1)-(3) unchanged).
        self._offset = 0
        self._max_epoch = -1
        self._load_manifest()

    #: RESTART SAFETY (ADVICE r12, upgraded from a scope note to code):
    #: the bookkeeping is persisted as JSON beside the state after every
    #: committed batch via write-tmp + atomic rename, and loaded on
    #: construction — so a NEW driver resuming against an existing
    #: state_dir (same or fresh checkpoint) sees the committed manifest
    #: instead of an empty one: no orphaned version dirs, and replayed
    #: epochs merge against the real prior state (keep-latest makes the
    #: re-merge idempotent). A crash BETWEEN the parquet write and the
    #: manifest save leaves the previous manifest in place — exactly the
    #: retry contract guards (1)-(3) already cover in-process.
    _MANIFEST = "_manifest.json"

    def _manifest_path(self) -> str:
        import os
        return os.path.join(self.state_dir, self._MANIFEST)

    def _rel(self, p: str) -> str:
        """Manifest entries persist RELATIVE to ``state_dir`` (ADVICE
        r13): absolute spellings tied the bookkeeping to ONE spelling of
        the directory — a resume via a relative path, trailing slash, or
        symlinked mount rebuilt different absolute strings, every
        committed version dir looked unclaimed, and the orphan sweep
        deleted live state. Relative entries rebase against whatever
        spelling the resuming driver uses."""
        import os
        return os.path.relpath(p, self.state_dir)

    def _abs(self, p: str) -> str:
        """Rebase a persisted entry onto THIS run's ``state_dir``
        spelling. Legacy (pre-relative) manifests stored absolute paths;
        the layout is fixed (``v{epoch}[/bucket={b}]``), so rebasing the
        trailing components recovers them regardless of how the writing
        run spelled the directory."""
        import os
        if os.path.isabs(p):
            tail = os.path.basename(p.rstrip("/"))
            if tail.startswith("bucket="):
                vdir = os.path.basename(os.path.dirname(p.rstrip("/")))
                return os.path.join(self.state_dir, vdir, tail)
            return os.path.join(self.state_dir, tail)
        return os.path.join(self.state_dir, p)

    def _load_manifest(self) -> None:
        import json
        import os
        import shutil
        path = self._manifest_path()
        if not os.path.exists(path):
            return
        with open(path) as fh:
            d = json.load(fh)
        self.manifest = {int(k): self._abs(v)
                         for k, v in d["manifest"].items()}
        self.prior = {int(k): self._abs(v) for k, v in d["prior"].items()}
        self.refs = {self._abs(k): set(v) for k, v in d["refs"].items()}
        self.deferred = {self._abs(k): v
                         for k, v in d["deferred"].items()}
        self._max_epoch = d.get("max_epoch", -1)
        self._offset = self._max_epoch + 1
        # Sweep orphans: a crash between a parquet write and its
        # manifest save leaves an uncommitted version dir no record
        # references — delete anything the loaded bookkeeping does not
        # claim (manifest/prior bucket paths, live refs, deferred).
        live = ({os.path.dirname(p) for p in self.manifest.values()}
                | {os.path.dirname(p) for p in self.prior.values()}
                | set(self.refs) | set(self.deferred))
        for entry in os.listdir(self.state_dir):
            full = os.path.join(self.state_dir, entry)
            if (entry.startswith("v") and os.path.isdir(full)
                    and full not in live):
                shutil.rmtree(full, ignore_errors=True)

    def _save_manifest(self) -> None:
        import json
        import os
        path = self._manifest_path()
        tmp = path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump({
                "manifest": {str(k): self._rel(v)
                             for k, v in self.manifest.items()},
                "prior": {str(k): self._rel(v)
                          for k, v in self.prior.items()},
                "refs": {self._rel(k): sorted(v)
                         for k, v in self.refs.items()},
                "deferred": {self._rel(k): v
                             for k, v in self.deferred.items()},
                "max_epoch": self._max_epoch,
            }, fh)
        os.replace(tmp, path)  # atomic on POSIX

    def write_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        import os
        import shutil

        from pyspark.sql import Window

        spark = batch_df.sparkSession
        epoch_id += self._offset  # restart namespace (constant per run)
        self._max_epoch = max(self._max_epoch, epoch_id)
        vdir = os.path.join(self.state_dir, f"v{epoch_id}")
        batch = batch_df.withColumn("bucket", self.bucket_of)
        touched = sorted(r[0] for r in
                         batch.select("bucket").distinct().collect())

        def live(t: int) -> str | None:
            # Guard (2): never read the dir this epoch overwrites — a
            # retried epoch whose first attempt committed the manifest
            # falls back to the bucket's retained prior dir.
            p = self.manifest.get(t)
            if p is not None and os.path.dirname(p) == vdir:
                return self.prior.get(t)
            return p

        prev_paths = sorted({p for t in touched
                             if (p := live(t)) is not None})
        merged = batch
        if prev_paths:
            # Bucket dirs store the original schema; the bucket is a
            # pure function of the key, so recomputing it is exact.
            prev = (spark.read.parquet(*prev_paths)
                    .withColumn("bucket", self.bucket_of))
            merged = prev.unionByName(batch)
        w = Window.partitionBy(self.key_col).orderBy(*self.order)
        winners = (merged.withColumn("_rn", F.row_number().over(w))
                   .filter(F.col("_rn") == 1).drop("_rn"))
        winners.write.partitionBy("bucket").mode("overwrite").parquet(vdir)
        # Guard (1): bookkeeping commits only after the write succeeded.
        self.refs[vdir] = set(touched)
        for t in touched:
            old = self.manifest.get(t)
            self.manifest[t] = os.path.join(vdir, f"bucket={t}")
            if old is None:
                continue
            old_vdir = os.path.dirname(old)
            if old_vdir == vdir:  # retry re-running its own commit
                continue
            self.prior[t] = old
            self.refs[old_vdir].discard(t)
            if not self.refs[old_vdir]:  # fully superseded — defer
                self.deferred[old_vdir] = epoch_id
                del self.refs[old_vdir]
        # Guard (3): reclaim dirs superseded by an EARLIER epoch — that
        # epoch has durably committed (this one is running after it), so
        # no retry can still need them as a read fallback.
        for d in [d for d, e in self.deferred.items() if e < epoch_id]:
            shutil.rmtree(d, ignore_errors=True)
            del self.deferred[d]
        self._save_manifest()

    def finish(self) -> list[str]:
        import shutil

        for d in self.deferred:  # stream done — no retry possible
            shutil.rmtree(d, ignore_errors=True)
        self.deferred.clear()
        self._save_manifest()
        assert self.manifest, "stream produced no batches"
        return sorted(self.manifest.values())


def stream_dedup_neardup(stream_df: DataFrame, text_col: str = "text",
                         ts_col: str | None = None,
                         watermark: str = "1 hour") -> DataFrame:
    """Streaming NEAR-duplicate suppression: first-seen-wins on the
    document's SimHash signature (``operators.dedup.simhash_vote_expr`` —
    the identical compact SQL fold the batch tier uses), so reordered or
    lightly-edited copies drop in-flight, not just byte-identical ones.
    The signature is a per-row expression (no state, no shuffle of its
    own) and the dedup state is one 8-byte key per surviving document —
    with ``ts_col`` it prunes at the watermark exactly like
    :func:`stream_dedup_exact`.

    Ingestion-time near-dedup complements (not replaces) the batch funnel:
    exact-signature grouping is hamming-distance-0; the banded MinHash /
    verify tiers still catch lower-similarity pairs offline."""
    from ..operators.dedup import _simhash_token_hashes, simhash_vote_expr

    signed = (stream_df
              .withColumn("_h", _simhash_token_hashes(text_col))
              .withColumn("simhash", simhash_vote_expr("_h"))
              .drop("_h"))
    if ts_col:
        return (signed.withWatermark(ts_col, watermark)
                .dropDuplicatesWithinWatermark(["simhash"]))
    return signed.dropDuplicates(["simhash"])


def funnel_stage_stream(events: DataFrame,
                        stages: tuple[str, str, str] = ("view", "click",
                                                        "purchase"),
                        ) -> DataFrame:
    """Cross-batch stateful funnel progression: per user, record the
    first-occurrence time of each stage in order (stage k+1 counts only
    STRICTLY after the recorded stage-k time) and emit the furthest
    stage reached so far. State = three epoch-microsecond timestamps per
    user (0 = unset); the emitted stage is MONOTONE non-decreasing
    across batches, so ``max(stage)`` per user is batching-invariant —
    the certified rollup (q230) aggregates that invariant, never
    per-batch row identities.

    Equivalent to the batch rule ``t1 = min ts(stage1); t2 = min
    ts(stage2 | ts > t1); t3 = min ts(stage3 | ts > t2)`` — the
    in-order greedy scan computes exactly those minima. Assumes
    per-user in-order arrival ACROSS batches (the q219 contract);
    rows WITHIN a batch are sorted before the scan.

    SOURCE-ORDER CONTRACT (ADVICE r12): with a FILE source that
    assumption means the fixture is a single file (every certified run:
    one availableNow batch = one sorted scan, ordering trivially holds)
    or its files enumerate in event-time order — a multi-part fixture
    whose file order disagreed with event time would make the greedy
    scan diverge from the batch rule nondeterministically. The q230
    oracle twin is valid under exactly that contract, same as a Kafka
    deployment relies on per-key partition ordering; the cross-batch
    carry itself is pinned by the maxFilesPerTrigger=1 unit test on
    time-ordered splits (test_streaming)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    s1, s2, s3 = stages

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        t = list(state.get) if state.exists else [0, 0, 0]
        batch = (pd.concat(list(pdfs))
                 .sort_values(["us", "event_id"]))
        for us, typ in zip(batch["us"], batch["event_type"]):
            us = int(us)
            if typ == s1 and t[0] == 0:
                t[0] = us
            elif typ == s2 and t[0] > 0 and us > t[0] and t[1] == 0:
                t[1] = us
            elif typ == s3 and t[1] > 0 and us > t[1] and t[2] == 0:
                t[2] = us
        state.update((t[0], t[1], t[2]))
        stage = sum(1 for v in t if v > 0)
        yield pd.DataFrame({"user_id": [key[0]], "stage": [stage]})

    return (
        events.select("user_id", "event_id", "event_type",
                      F.unix_micros("ts").alias("us"))
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType="user_id bigint, stage int",
            stateStructType="t1 bigint, t2 bigint, t3 bigint",
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def lag_enrich_stream(events: DataFrame) -> DataFrame:
    """Cross-batch stateful lag enrichment: attach each user's PREVIOUS
    event value to every incoming event — the streaming twin of
    ``lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id)``, with
    the carry surviving micro-batch boundaries via
    ``applyInPandasWithState`` (state = one (ts, event_id, value) triple
    per user). Output: (user_id, event_id, ts, value, prev_value).

    The feature-engineering shape for online deltas (value - prev_value,
    time-since-last) where the built-in window cannot reach across
    micro-batches. Assumes per-user in-order arrival ACROSS batches (file
    ordering / kafka per-key ordering); rows WITHIN a batch are sorted
    before emission, so intra-batch disorder is absorbed."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        prev = state.get if state.exists else None
        frames = [pdf for pdf in pdfs]
        batch = pd.concat(frames).sort_values(["ts", "event_id"])
        prev_vals = []
        for v in batch["value"]:
            prev_vals.append(prev[2] if prev is not None else None)
            prev = (0, 0, float(v))
        last = batch.iloc[-1]
        state.update((int(last["event_id"]), 0, float(last["value"])))
        out = batch[["user_id", "event_id", "ts", "value"]].copy()
        out["prev_value"] = pd.array(prev_vals, dtype="float64")
        yield out

    return (
        events.select("user_id", "event_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=("user_id bigint, event_id bigint, "
                              "ts timestamp, value double, "
                              "prev_value double"),
            stateStructType="last_event bigint, pad int, last_value double",
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
