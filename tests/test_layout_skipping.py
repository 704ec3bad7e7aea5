"""Clustered-write data skipping: the layout property that lets parquet
row-group min/max statistics prune range scans (the 100 TB clustering
lever), verified from the ACTUAL file footers via pyarrow."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq

from ds_ga1004_bigdata_project_spark.sources.catalog import (
    Catalog, write_clustered_parquet)

from .conftest import SF_SMOKE


def _rowgroup_spans(path_glob: str, col: str):
    spans = []
    for f in glob.glob(path_glob):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(col)
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            spans.append((st.min, st.max))
    return sorted(spans)


def test_clustered_write_produces_prunable_rowgroups(spark, tmp_path):
    li = Catalog(spark, SF_SMOKE).lineitem
    clustered = str(tmp_path / "clustered")
    plain = str(tmp_path / "plain")
    write_clustered_parquet(li, clustered, "l_shipdate", num_files=8)
    li.repartition(8).write.parquet(plain)

    c_spans = _rowgroup_spans(f"{clustered}/*.parquet", "l_shipdate")
    p_spans = _rowgroup_spans(f"{plain}/*.parquet", "l_shipdate")
    assert len(c_spans) >= 8

    lo = min(s for s, _ in p_spans)
    hi = max(e for _, e in p_spans)

    def overlap_fraction(spans, a, b):
        return sum(1 for s, e in spans if not (e < a or s > b)) / len(spans)

    # a ~5%-of-range date slice: nearly every UNCLUSTERED row group
    # overlaps it (no pruning possible); clustered row groups mostly don't.
    span_days = (hi - lo).days
    a = lo + __import__("datetime").timedelta(days=int(span_days * 0.40))
    b = lo + __import__("datetime").timedelta(days=int(span_days * 0.45))
    f_plain = overlap_fraction(p_spans, a, b)
    f_clustered = overlap_fraction(c_spans, a, b)
    assert f_plain > 0.9, f"unclustered groups should all overlap: {f_plain}"
    assert f_clustered < 0.35, \
        f"clustered groups should mostly prune: {f_clustered}"

    # and the data is identical either way
    assert (spark.read.parquet(clustered).count()
            == spark.read.parquet(plain).count() == li.count())


def test_morton_code_interleaves_bits(spark):
    """Hand-check the Morton expression on known values.

    Uses the shared session fixture: calling ``get_local_session(2)`` here
    would APPLY ``spark.sql.shuffle.partitions=2`` to the existing session
    (``getOrCreate`` merges builder SQL confs into a live session), which
    silently re-partitions every later test — the q54 snapshot pin caught
    exactly that."""
    from ds_ga1004_bigdata_project_spark.sources.catalog import (
        morton_code_expr)
    df = spark.createDataFrame([(0b101, 0b011)], "a long, b long")
    z = df.select(morton_code_expr("a", "b").alias("z")).first()["z"]
    # a bits at even positions: 1,0,1 -> 0b010001 ; b bits at odd:
    # 1,1,0 -> 0b001010 ; interleaved = 0b011011 = 27
    assert z == 0b011011 == 27


def test_zorder_prunes_on_both_columns(spark, tmp_path):
    """Z-ordered layout: narrow slices on EITHER clustered column overlap
    far fewer row groups than the unclustered layout."""
    from pyspark.sql import functions as F

    from ds_ga1004_bigdata_project_spark.sources.catalog import (
        write_zordered_parquet)

    li = Catalog(spark, SF_SMOKE).lineitem.select(
        "l_partkey", "l_suppkey", "l_quantity")
    zpath, plain = str(tmp_path / "zorder"), str(tmp_path / "plain2")
    write_zordered_parquet(li, zpath, "l_partkey", "l_suppkey", num_files=8)
    li.repartition(8).write.parquet(plain)

    for col in ("l_partkey", "l_suppkey"):
        zs = _rowgroup_spans(f"{zpath}/*.parquet", col)
        ps = _rowgroup_spans(f"{plain}/*.parquet", col)
        lo = min(s for s, _ in ps)
        hi = max(e for _, e in ps)
        a = lo + int((hi - lo) * 0.40)
        b = lo + int((hi - lo) * 0.45)
        f_plain = sum(1 for s, e in ps if not (e < a or s > b)) / len(ps)
        f_z = sum(1 for s, e in zs if not (e < a or s > b)) / len(zs)
        assert f_plain > 0.9, (col, f_plain)
        assert f_z < 0.7, f"{col}: z-order should prune some groups: {f_z}"

    assert spark.read.parquet(zpath).count() == li.count()


def test_zorder_empty_input_writes_empty_dataset(spark, tmp_path):
    """A scheduled job's zero-row day must write an empty (schema-bearing)
    dataset, not crash on NULL min/max/quantiles."""
    from ds_ga1004_bigdata_project_spark.sources.catalog import (
        write_zordered_parquet)

    li = Catalog(spark, SF_SMOKE).lineitem.select(
        "l_partkey", "l_suppkey").filter("l_partkey < 0")
    path = str(tmp_path / "empty_z")
    write_zordered_parquet(li, path, "l_partkey", "l_suppkey", num_files=4)
    out = spark.read.parquet(path)
    assert out.count() == 0
    assert set(out.columns) == {"l_partkey", "l_suppkey"}
