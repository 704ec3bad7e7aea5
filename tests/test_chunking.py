"""Document chunking: boundary arithmetic pinned on hand-computable cases."""

from __future__ import annotations

from ds_ga1004_bigdata_project_spark.functions.text import chunk_documents

from .conftest import SF_SMOKE


def _chunks(spark, text, size, overlap):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    return [(r["chunk_idx"], r["n_tokens"], r["chunk_text"])
            for r in chunk_documents(df, size, overlap)
            .orderBy("chunk_idx").collect()]


def test_short_doc_is_one_chunk(spark):
    assert _chunks(spark, "a b c", 5, 2) == [(0, 3, "a b c")]


def test_exact_multiple_has_no_empty_tail(spark):
    # 6 tokens, size 3, no overlap → exactly two chunks
    got = _chunks(spark, "a b c d e f", 3, 0)
    assert got == [(0, 3, "a b c"), (1, 3, "d e f")]


def test_overlap_windows(spark):
    # 7 tokens, size 4, overlap 2 (stride 2) → starts at 0,2,4 (ceil((7-4)/2)=2 extra)
    got = _chunks(spark, "a b c d e f g", 4, 2)
    assert got == [(0, 4, "a b c d"), (1, 4, "c d e f"), (2, 3, "e f g")]


def test_empty_text_yields_no_rows(spark):
    df = spark.createDataFrame([(1, ""), (2, "x y")], "doc_id long, text string")
    rows = chunk_documents(df, 5, 0).collect()
    assert {r["doc_id"] for r in rows} == {2}


def test_every_token_covered_and_strides_align(spark):
    text = " ".join(f"t{i}" for i in range(103))
    got = _chunks(spark, text, 50, 10)
    # stride 40: starts 0, 40, 80 → 3 chunks; last has 103-80=23 tokens
    assert [(i, n) for i, n, _ in got] == [(0, 50), (1, 50), (2, 23)]
    # overlap regions repeat exactly
    assert got[0][2].split()[40:] == got[1][2].split()[:10]


def test_bad_overlap_rejected(spark):
    import pytest

    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(df, 5, 5)


def test_pack_slices_reassemble_exactly(spark):
    """Invariants over the pack materialization: per-doc slice lengths sum
    to the doc's token count; per-pack lengths sum to seq_len for every
    interior (full) pack; slices within a doc are contiguous from 0."""
    from pyspark.sql import functions as F

    from ds_ga1004_bigdata_project_spark.functions.text import (
        sequence_pack_slices)

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    caches = []
    sl = sequence_pack_slices(docs, seq_len=512, num_partitions=4,
                              caches=caches).localCheckpoint(eager=True)
    for c in caches:
        c.unpersist()
    # per-doc: contiguous coverage of [0, n_tokens)
    per_doc = sl.groupBy("doc_id").agg(
        F.sum("slice_len").alias("tot"),
        F.min("slice_start").alias("mn"))
    toks = docs.select("doc_id",
                       F.size(F.split(F.col("text"), r"\s+")).alias("n"))
    bad = per_doc.join(toks, "doc_id") \
        .filter((F.col("tot") != F.col("n")) | (F.col("mn") != 0)).count()
    assert bad == 0
    # per-pack: every pack except the last sums to exactly seq_len
    last_pack = sl.agg(F.max("pack_id")).first()[0]
    partial = sl.groupBy("pack_id").agg(F.sum("slice_len").alias("tot")) \
        .filter((F.col("pack_id") < last_pack) & (F.col("tot") != 512)).count()
    assert partial == 0


def test_strip_html_drops_tags_scripts_entities(spark):
    from pyspark.sql import functions as F

    from ds_ga1004_bigdata_project_spark.functions import text as T

    raw = ("<html><head><style>p {color:red}</style>"
           "<script>var x = '<p>sneaky</p>';</script></head>"
           "<body><!-- note --><p>Hello &amp; welcome to &quot;Spark&quot;"
           "</p>\n<div>  line&nbsp;two &lt;3 </div></body></html>")
    df = spark.createDataFrame([(raw,)], "t string")
    [row] = df.select(T.strip_html(F.col("t")).alias("c")).collect()
    assert row["c"] == 'Hello & welcome to "Spark" line two <3'


def test_strip_html_plain_text_passthrough(spark):
    from pyspark.sql import functions as F

    from ds_ga1004_bigdata_project_spark.functions import text as T

    df = spark.createDataFrame([("already   clean\n text",)], "t string")
    [row] = df.select(T.strip_html(F.col("t")).alias("c")).collect()
    assert row["c"] == "already clean text"


def test_sentence_split_boundaries(spark):
    from pyspark.sql import functions as F

    from ds_ga1004_bigdata_project_spark.functions import text as T

    df = spark.createDataFrame(
        [("First one. Second, with 3.5 inside! Third? 4th starts digit.",)],
        "t string")
    [row] = df.select(T.sentences(F.col("t")).alias("s")).collect()
    assert row["s"] == ["First one.", "Second, with 3.5 inside!",
                        "Third?", "4th starts digit."]


def test_chunk_by_sentences_never_splits_a_sentence(spark):
    from pyspark.sql import functions as F  # noqa: F401

    from ds_ga1004_bigdata_project_spark.functions import text as T

    doc = ("One two three. Four five. Six seven eight nine. "
           "Ten. Eleven twelve thirteen fourteen fifteen sixteen seventeen.")
    df = spark.createDataFrame([(1, doc)], "doc_id long, text string")
    rows = sorted((r["chunk_idx"], r["chunk_text"], r["n_tokens"])
                  for r in T.chunk_by_sentences(df, max_tokens=6).collect())
    # greedy packing: [3 tok][+2 tok = 5] | [4 tok][+1 = 5] | [7 tok alone]
    assert rows == [
        (0, "One two three. Four five.", 5),
        (1, "Six seven eight nine. Ten.", 5),
        (2, "Eleven twelve thirteen fourteen fifteen sixteen seventeen.", 7),
    ]
    # chunk 2 is over budget because the single sentence itself is — the
    # never-split-a-sentence contract


def test_chunk_by_sentences_reconstructs_document(spark):
    from pyspark.sql import functions as F

    from ds_ga1004_bigdata_project_spark.functions import text as T
    from ds_ga1004_bigdata_project_spark.sources.catalog import Catalog

    from .conftest import SF_SMOKE

    docs = Catalog(spark, SF_SMOKE).documents.limit(50)
    chunks = T.chunk_by_sentences(docs, max_tokens=16)
    rebuilt = (chunks.groupBy("doc_id")
               .agg(F.array_join(
                   F.transform(
                       F.sort_array(F.collect_list(
                           F.struct("chunk_idx", "chunk_text"))),
                       lambda s: s["chunk_text"]), " ").alias("re")))
    joined = docs.join(rebuilt, "doc_id")
    # normalized original == concatenation of chunks (sentences preserved,
    # in order, nothing lost)
    bad = joined.filter(
        F.regexp_replace(F.trim(F.col("text")), r"\s+", " ")
        != F.col("re"))
    assert bad.count() == 0
    budgets = chunks.filter(F.col("n_sentences") > 1) \
        .filter(F.col("n_tokens") > 16)
    assert budgets.count() == 0   # only single-sentence chunks may overflow
