"""Catalog/IO layer: sinks + sources round-trips (S2/S5/S6) and
partition-pruned reads of directory-partitioned output."""

from __future__ import annotations

from pyspark.sql import functions as F

from ds_ga1004_bigdata_project_spark.plans.inspect import physical_plan
from ds_ga1004_bigdata_project_spark.sources import catalog as C

from .conftest import SF_SMOKE


def test_parquet_sink_roundtrip(spark, tmp_path):
    cat = C.Catalog(spark, SF_SMOKE)
    out = str(tmp_path / "orders_out")
    C.write_parquet(cat.orders, out)
    back = spark.read.parquet(out)
    assert back.count() == cat.orders.count()
    assert back.schema == cat.orders.schema


def test_partitioned_write_prunes_partitions(spark, tmp_path):
    cat = C.Catalog(spark, SF_SMOKE)
    out = str(tmp_path / "orders_by_status")
    C.write_parquet(cat.orders, out, partition_by=["o_orderstatus"])
    back = spark.read.parquet(out).filter(F.col("o_orderstatus") == "F")
    plan = physical_plan(back)
    # partition filter must prune directories, not scan-and-filter
    assert "PartitionFilters" in plan and "o_orderstatus" in plan
    want = cat.orders.filter("o_orderstatus = 'F'").count()
    assert back.count() == want


def test_csv_roundtrip_with_schema(spark, tmp_path):
    cat = C.Catalog(spark, SF_SMOKE)
    out = str(tmp_path / "nation_csv")
    C.write_csv(cat.nation, out, single_file=True)
    back = spark.read.csv(out, header=True,
                          schema="n_nationkey int, n_name string, n_regionkey int")
    assert sorted(r["n_name"] for r in back.collect()) == \
        sorted(r["n_name"] for r in cat.nation.collect())


def test_headerless_csv_with_declared_schema(spark, tmp_path):
    # S5: the reference's header-less factor CSVs with post-hoc names
    p = tmp_path / "factors.csv"
    p.write_text("0,0.1,0.2\n1,0.3,0.4\n")
    df = C.read_csv(spark, str(p), schema="id int, f1 double, f2 double")
    rows = {r["id"]: (r["f1"], r["f2"]) for r in df.collect()}
    assert rows == {0: (0.1, 0.2), 1: (0.3, 0.4)}


def test_register_views_sql_access(spark):
    C.register_views(spark, SF_SMOKE)
    n = spark.sql("SELECT count(*) AS n FROM lineitem").collect()[0]["n"]
    assert n > 0


def test_jsonl_roundtrip_with_schema(spark, tmp_path):
    cat = C.Catalog(spark, SF_SMOKE)
    out = str(tmp_path / "nation_jsonl")
    C.write_jsonl(cat.nation, out)
    back = C.read_jsonl(spark, out,
                        schema="n_nationkey int, n_name string, n_regionkey int")
    assert sorted(tuple(r) for r in back.collect()) == \
        sorted(tuple(r) for r in cat.nation.collect())


def test_orc_roundtrip_all_engine_types(spark, tmp_path):
    """ORC round-trip over the engine's full type surface: longs, doubles,
    strings, µs timestamps (events) and float arrays (embeddings)."""
    cat = C.Catalog(spark, SF_SMOKE)
    for name, df in (("events", cat.events), ("embeddings", cat.embeddings)):
        out = str(tmp_path / f"{name}_orc")
        C.write_orc(df, out)
        back = C.read_orc(spark, out)
        assert back.schema == df.schema
        assert sorted(map(str, back.collect())) == \
            sorted(map(str, df.collect()))


def test_orc_scan_gets_pushdown(spark, tmp_path):
    """Predicate pushdown and column pruning must reach the ORC reader just
    like the parquet scans the plan tests audit."""
    cat = C.Catalog(spark, SF_SMOKE)
    out = str(tmp_path / "li_orc")
    C.write_orc(cat.lineitem, out)
    from pyspark.sql import functions as F
    q = (C.read_orc(spark, out)
         .filter(F.col("l_quantity") > 30).select("l_partkey"))
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "GreaterThan(l_quantity,30" in plan
    assert "ReadSchema: struct<l_partkey:bigint,l_quantity:double>" in plan


def test_schema_evolution_merge_read(spark, tmp_path):
    """Old shard (no quality column) + new shard (added column) read as one
    relation with the merged schema; old rows surface null."""
    from pyspark.sql import functions as F

    cat = C.Catalog(spark, SF_SMOKE)
    old = str(tmp_path / "v1")
    new = str(tmp_path / "v2")
    cat.documents.select("doc_id", "text").filter(F.col("doc_id") < 100) \
        .write.parquet(old)
    cat.documents.select("doc_id", "text",
                         F.length("text").alias("quality")) \
        .filter(F.col("doc_id") >= 100).write.parquet(new)
    merged = C.read_parquet_evolving(spark, old, new)
    assert set(merged.columns) == {"doc_id", "text", "quality"}
    assert merged.count() == cat.documents.count()
    assert merged.filter(F.col("doc_id") < 100) \
        .filter(F.col("quality").isNotNull()).count() == 0
    assert merged.filter(F.col("doc_id") >= 100) \
        .filter(F.col("quality").isNull()).count() == 0


def test_compaction_reduces_file_count_preserves_rows(spark, tmp_path):
    frag = str(tmp_path / "fragmented")
    out = str(tmp_path / "compacted")
    li = C.Catalog(spark, SF_SMOKE).lineitem
    li.repartition(64).write.parquet(frag)     # 64 tiny files
    n_in = len(C._list_files(spark, frag))
    assert n_in >= 64
    n_out = C.compact_parquet(spark, frag, out)
    assert n_out < n_in / 8
    back = spark.read.parquet(out)
    assert back.count() == li.count()
    assert sorted(back.columns) == sorted(li.columns)


def test_jsonl_quarantine_splits_corrupt_lines(spark, tmp_path):
    """A shard with truncated/garbage lines: clean rows parse, every bad
    line lands in quarantine verbatim, nothing is silently dropped."""
    p = tmp_path / "shard.jsonl"
    good = ['{"doc_id": 1, "text": "alpha"}', '{"doc_id": 2, "text": "beta"}']
    bad = ['{"doc_id": 3, "text": "trunca',      # cut mid-string
           'not json at all',
           '{"doc_id": "NaN-ish" "text": }']     # structurally broken
    p.write_text("\n".join(good + bad) + "\n")
    df = C.read_jsonl_audited(spark, str(p), "doc_id long, text string")
    clean, corrupt = C.split_corrupt_records(df)
    assert sorted((r["doc_id"], r["text"]) for r in clean.collect()) == \
        [(1, "alpha"), (2, "beta")]
    quarantined = sorted(r["_corrupt_record"] for r in corrupt.collect())
    assert quarantined == sorted(bad)
    assert clean.count() + corrupt.count() == len(good) + len(bad)
    df.unpersist()


def test_read_jdbc_sqlite_skip_gated(spark, tmp_path):
    # S4 literal parity: the reference read SQLite side tables; the engine's
    # default mapping is parquet temp views, but read_jdbc covers a user
    # migrating a real SQLite/Postgres dimension. Skip when no sqlite JDBC
    # driver jar is on the Spark classpath (this container ships none).
    import sqlite3

    import pytest

    db = tmp_path / "side.db"
    con = sqlite3.connect(db)
    con.execute("CREATE TABLE tags (tag_id INTEGER, tag TEXT)")
    con.executemany("INSERT INTO tags VALUES (?, ?)",
                    [(1, "rock"), (2, "jazz"), (3, "pop")])
    con.commit()
    con.close()
    try:
        rows = C.read_jdbc(spark, f"jdbc:sqlite:{db}", "tags",
                           driver="org.sqlite.JDBC").collect()
    except Exception as e:  # py4j wraps ClassNotFoundException opaquely
        pytest.skip(f"sqlite JDBC driver unavailable: {type(e).__name__}")
    assert sorted((r["tag_id"], r["tag"]) for r in rows) == \
        [(1, "rock"), (2, "jazz"), (3, "pop")]


def test_read_jdbc_partition_bounds_validated(spark):
    # partition_column without bounds used to pass the literal string 'None'
    # to Spark (opaque runtime failure) — must be a clear ValueError instead.
    import pytest

    with pytest.raises(ValueError, match="lower_bound"):
        C.read_jdbc(spark, "jdbc:sqlite:/nonexistent.db", "t",
                    partition_column="id")
