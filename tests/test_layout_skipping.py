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
