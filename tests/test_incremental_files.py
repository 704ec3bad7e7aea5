"""Manifest-driven incremental file processing
(sources/catalog.incremental_file_batch): only unprocessed files are read,
no-op runs return None, and the returned manifest rows chain."""

from __future__ import annotations

from ds_ga1004_bigdata_project_spark.sources.catalog import (
    incremental_file_batch)


def _write_shard(spark, path, lo, hi):
    spark.range(lo, hi).coalesce(1).write.mode("overwrite").parquet(path)


def _shard_files(spark, base, tag):
    # one parquet data file per shard dir, copied flat into the batch dir
    import glob
    import shutil

    [src] = glob.glob(f"{base}/_stage_{tag}/*.parquet")
    shutil.copy(src, f"{base}/{tag}.parquet")


def _setup_dir(spark, tmp_path, tags_and_ranges):
    base = str(tmp_path / "incoming")
    import os

    os.makedirs(base, exist_ok=True)
    for tag, (lo, hi) in tags_and_ranges.items():
        _write_shard(spark, f"{base}/_stage_{tag}", lo, hi)
        _shard_files(spark, base, tag)
    return base


def test_first_run_reads_everything(spark, tmp_path):
    base = _setup_dir(spark, tmp_path, {"a": (0, 10), "b": (10, 30)})
    batch, fresh = incremental_file_batch(spark, base, None)
    assert batch.count() == 30
    assert {r["file_name"] for r in fresh.collect()} == \
        {"a.parquet", "b.parquet"}


def test_second_run_reads_only_new_files(spark, tmp_path):
    base = _setup_dir(spark, tmp_path, {"a": (0, 10), "b": (10, 30)})
    _, manifest = incremental_file_batch(spark, base, None)
    manifest = manifest.localCheckpoint()  # freeze pre-arrival listing
    _write_shard(spark, f"{base}/_stage_c", 30, 35)
    _shard_files(spark, base, "c")

    batch, fresh = incremental_file_batch(spark, base, manifest)
    assert sorted(r["id"] for r in batch.collect()) == [30, 31, 32, 33, 34]
    assert [r["file_name"] for r in fresh.collect()] == ["c.parquet"]
    # the scan must touch ONLY the new file, not re-read processed bytes
    assert all(f.endswith("c.parquet") for f in batch.inputFiles())


def test_noop_run_returns_none_and_empty_manifest_delta(spark, tmp_path):
    base = _setup_dir(spark, tmp_path, {"a": (0, 10)})
    _, manifest = incremental_file_batch(spark, base, None)
    batch, fresh = incremental_file_batch(spark, base,
                                          manifest.localCheckpoint())
    assert batch is None
    assert fresh.count() == 0


def test_staging_and_metadata_files_are_ignored(spark, tmp_path):
    """_-prefixed entries (Spark _SUCCESS markers, staging dirs) never enter
    the manifest — the listing filter is the same one compaction uses."""
    base = _setup_dir(spark, tmp_path, {"a": (0, 10)})
    open(f"{base}/_SUCCESS", "w").close()
    batch, fresh = incremental_file_batch(spark, base, None)
    assert {r["file_name"] for r in fresh.collect()} == {"a.parquet"}
    assert batch.count() == 10


def test_glob_metacharacter_file_names_read_literally(spark, tmp_path):
    """Producer-named shards like export[2024-01].parquet must be read
    byte-literally, not treated as glob patterns (which would wedge the
    pipeline forever — the file could never be marked processed)."""
    base = _setup_dir(spark, tmp_path, {"plain": (0, 5)})
    import glob
    import shutil

    [src] = glob.glob(f"{base}/_stage_plain/*.parquet")
    shutil.copy(src, f"{base}/export[2024-01].parquet")
    batch, fresh = incremental_file_batch(spark, base, None)
    assert {r["file_name"] for r in fresh.collect()} == \
        {"plain.parquet", "export[2024-01].parquet"}
    assert batch.count() == 10  # both five-row shards, read literally


def test_dynamic_partition_overwrite_replaces_only_touched(spark, tmp_path):
    """Re-running one day's backfill must replace that day's partition and
    leave the others byte-untouched (static overwrite would wipe the
    table root first)."""
    from ds_ga1004_bigdata_project_spark.sources.catalog import (
        write_dynamic_partition_overwrite)

    path = str(tmp_path / "table")
    base = spark.createDataFrame(
        [("d1", 1), ("d1", 2), ("d2", 10), ("d3", 20)], "day string, v int")
    write_dynamic_partition_overwrite(base, path, ["day"])

    fix = spark.createDataFrame([("d2", 99)], "day string, v int")
    write_dynamic_partition_overwrite(fix, path, ["day"])

    got = {(r["day"], r["v"]) for r in spark.read.parquet(path).collect()}
    assert got == {("d1", 1), ("d1", 2), ("d2", 99), ("d3", 20)}
    # and the session conf is restored
    assert spark.conf.get("spark.sql.sources.partitionOverwriteMode",
                          None) in (None, "STATIC", "static")


def test_overwritten_file_with_new_size_reenters_batch(spark, tmp_path):
    """ADVICE r6: a file rewritten in place with different-sized contents
    must re-enter the batch — the anti-join keys on (name, size) when the
    manifest carries file_size (as returned manifests always do)."""
    base = _setup_dir(spark, tmp_path, {"a": (0, 10), "b": (10, 30)})
    _, manifest = incremental_file_batch(spark, base, None)
    manifest = manifest.localCheckpoint()
    # overwrite a.parquet in place with a bigger shard (different size)
    _write_shard(spark, f"{base}/_stage_a2", 100, 150)
    import glob
    import shutil

    [src] = glob.glob(f"{base}/_stage_a2/*.parquet")
    shutil.copy(src, f"{base}/a.parquet")

    batch, fresh = incremental_file_batch(spark, base, manifest)
    assert [r["file_name"] for r in fresh.collect()] == ["a.parquet"]
    assert sorted(r["id"] for r in batch.collect()) == list(range(100, 150))


def test_name_only_manifest_still_works(spark, tmp_path):
    """Backward compat: a caller-built manifest with only file_name keys
    the anti-join on name alone."""
    base = _setup_dir(spark, tmp_path, {"a": (0, 10), "b": (10, 30)})
    name_only = spark.createDataFrame([("a.parquet",)], "file_name string")
    batch, fresh = incremental_file_batch(spark, base, name_only)
    assert [r["file_name"] for r in fresh.collect()] == ["b.parquet"]
    assert batch.count() == 20
