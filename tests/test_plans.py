"""Physical-plan guardrails (SURVEY §4): scale properties asserted as tests so
a regression shows up here, not on a 1000-executor cluster."""

from __future__ import annotations

from pyspark.sql import functions as F

from ds_ga1004_bigdata_project_spark.plans.inspect import (
    assert_broadcast_join,
    assert_no_cartesian,
    assert_pushed_filters,
    physical_plan,
    read_schema_width,
)
from ds_ga1004_bigdata_project_spark.queries import REGISTRY

from .conftest import SF_ORACLE


def _build(spark, name):
    return REGISTRY[name].build(spark, SF_ORACLE)


def test_filters_push_to_parquet(spark):
    df = _build(spark, "q03_scan_filter_project")
    assert_pushed_filters(df, "GreaterThanOrEqual(l_quantity,5.0)",
                          "LessThanOrEqual(l_quantity,10.0)",
                          "EqualTo(l_returnflag,R)")


def test_column_pruning_reaches_scan(spark):
    # q03 projects 3 columns; the lineitem scan must not read all 16.
    df = _build(spark, "q03_scan_filter_project")
    width = read_schema_width(df, "lineitem")
    assert width <= 4, f"lineitem scan reads {width} columns for a 3-col projection"


def test_dimension_joins_broadcast(spark):
    # The star join must broadcast all four dimension sides (never shuffle
    # the fact table against a dim).
    assert_broadcast_join(_build(spark, "q06_join_chain_revenue"), min_count=4)
    assert_broadcast_join(_build(spark, "q01_top_parts"), min_count=1)


def test_single_shuffle_star_join(spark):
    # With all dims broadcast, the only shuffle is the final groupBy.
    plan = physical_plan(_build(spark, "q06_join_chain_revenue"))
    shuffles = [line for line in plan.splitlines()
                if line.strip().startswith("(") and "Exchange" in line
                and "Broadcast" not in line]
    assert len(shuffles) <= 1, f"expected ≤1 shuffle, got {len(shuffles)}:\n{plan}"


def test_global_topn_uses_heap_not_sort(spark):
    # orderBy+limit must compile to TakeOrderedAndProject (per-task heaps),
    # never a global Sort.
    plan = physical_plan(_build(spark, "q15_global_topn_orders"))
    assert "TakeOrderedAndProject" in plan


def test_topk_per_group_gets_group_limit_pushdown(spark):
    # row_number<=k filters get WindowGroupLimit (Spark 3.5+): each task keeps
    # a k-heap per group before the shuffle.
    plan = physical_plan(_build(spark, "q14_topk_per_brand"))
    assert "WindowGroupLimit" in plan


def test_no_cartesian_anywhere(spark):
    # Pair-generating queries (jaccard, near-dup) must never plan a
    # CartesianProduct; candidate joins are equi-joins or broadcast-NL.
    for name in ("q32_ngram_jaccard_topk", "q41_cosine_neardup_pairs",
                 "q40_ann_cosine_topk"):
        assert_no_cartesian(_build(spark, name))


def test_semi_join_not_in_list(spark):
    # The isin→semi-join rewrite must plan a real (semi) join, not a giant
    # In-predicate.
    plan = physical_plan(_build(spark, "q04_semi_join"))
    assert "LeftSemi" in plan


def test_aggregates_are_partial(spark):
    # groupBy sums must plan partial (map-side) + final HashAggregate pairs.
    plan = physical_plan(_build(spark, "q02_pricing_summary"))
    assert plan.count("HashAggregate") >= 2


def test_exact_dedup_shuffles_hash_not_text(spark):
    # The dedup shuffle key is the 32-char hash; text must be pruned before
    # the exchange (only hash + partial-agg state cross the wire), and the
    # aggregation must be partial+final around it.
    plan = physical_plan(_build(spark, "q30_dedup_exact"))
    lines = plan.splitlines()
    for i, line in enumerate(lines):
        if line.startswith("(") and "Exchange" in line:
            exchange_input = lines[i + 1]
            assert "text" not in exchange_input, \
                f"raw text crosses the shuffle: {exchange_input}"
            break
    else:
        raise AssertionError(f"no Exchange found:\n{plan}")
    assert "partial_min" in plan and "partial_count" in plan


def test_no_python_boundary_on_scalar_path(spark):
    # Scalar-function queries must stay JVM-side (no Python UDF eval node in
    # the hot path; mapInPandas appears only in the multimodal query).
    for name in ("q19_scalar_string_funcs", "q33_lang_id", "q34_text_quality",
                 "q57_simhash_groups"):
        plan = physical_plan(_build(spark, name))
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, \
            f"{name} crosses into Python:\n{plan}"


def test_range_count_broadcasts_cell_counts(spark):
    # The aggregate-pushdown range count must broadcast the tiny cell-count
    # table into the interior-bin join and never plan a cartesian product.
    from ds_ga1004_bigdata_project_spark.plans.inspect import (
        assert_broadcast_join, assert_no_cartesian)
    df = _build(spark, "q42_range_join")
    assert_broadcast_join(df)
    assert_no_cartesian(df)


def test_snapshot_diff_single_join_of_hashes(spark):
    # snapshot_diff must compare via 8-byte hashes: the full-outer join's
    # inputs carry xxhash64 columns, not the raw payload columns.
    plan = physical_plan(_build(spark, "q100_snapshot_diff"))
    assert "xxhash64" in plan
    assert "SortMergeJoin FullOuter" in plan or "ShuffledHashJoin FullOuter" in plan \
        or "FullOuter" in plan


def test_decontamination_never_shuffles_train_corpus(spark):
    # q104: the train side (the 100 TB side) must reach both its joins
    # through broadcasts only — every non-broadcast Exchange in the plan
    # must sit under the eval-side distinct or the contaminated-id
    # distinct, never carry the exploded train n-grams or the corpus rows.
    plan = physical_plan(_build(spark, "q104_decontaminated_corpus"))
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan
    # the only wide exchanges allowed: eval n-gram distinct, contaminated-id
    # distinct, and the final small groupBy — 3, none of them corpus-wide
    wide = [ln for ln in plan.splitlines()
            if ln.strip().startswith("(") and "Exchange" in ln
            and "Broadcast" not in ln]
    assert len(wide) <= 3, f"unexpected wide exchanges:\n{plan}"


def test_weighted_sample_is_shuffle_free(spark):
    """q113's claim: per-row integer predicate — the plan must contain no
    Exchange at all (pure scan+filter, streaming-safe)."""
    from ds_ga1004_bigdata_project_spark.functions import text as T
    from ds_ga1004_bigdata_project_spark.operators.sampling import (
        weighted_bernoulli_sample)
    from ds_ga1004_bigdata_project_spark.sources.catalog import Catalog

    from .conftest import SF_SMOKE

    docs = Catalog(spark, SF_SMOKE).documents
    toks = T.ws_tokens(F.col("text"))
    w = docs.withColumn("_w", T.distinct_token_ratio(toks, scale=None))
    plan = physical_plan(weighted_bernoulli_sample(w, "doc_id", "_w"))
    assert "Exchange" not in plan, f"expected shuffle-free plan:\n{plan}"


def test_shard_and_mixture_are_shuffle_free(spark):
    """Same contract for the other per-row samplers (q105/q107 paths)."""
    from ds_ga1004_bigdata_project_spark.operators.sampling import (
        mixture_sample, shard_assign)
    from ds_ga1004_bigdata_project_spark.sources.catalog import Catalog

    from .conftest import SF_SMOKE

    docs = Catalog(spark, SF_SMOKE).documents
    assert "Exchange" not in physical_plan(shard_assign(docs, "doc_id", 16))
    assert "Exchange" not in physical_plan(
        mixture_sample(docs, "source", "doc_id", {"src0": 0.5}))


def test_epoch_manifest_never_plans_single_partition(spark):
    """q161: the global prefix sum must be the range-partitioned
    construction — an `Exchange SinglePartition` under the cumsum means
    someone reintroduced a global window."""
    from ds_ga1004_bigdata_project_spark.operators import sampling
    from ds_ga1004_bigdata_project_spark.sources.catalog import Catalog

    docs = (Catalog(spark, SF_ORACLE).documents
            .select("doc_id", F.size(F.split(F.col("text"), r"\s+"))
                    .alias("n_tokens")))
    caches: list = []
    try:
        df = sampling.epoch_batch_manifest(docs, "doc_id", "n_tokens",
                                           budget=2048, epochs=2,
                                           caches=caches)
        plan = physical_plan(df)
        assert "Exchange SinglePartition" not in plan
        assert plan.count("rangepartitioning") >= 2  # one sort per epoch
    finally:
        for c in caches:
            c.unpersist()


def test_lm_count_pyramids_cache_their_base(spark):
    """q162/q146: the count pyramid's base relation (c123 / c2) and the
    unigram model must read from cache — without the persists every
    rollup re-executes its corpus explode."""
    from ds_ga1004_bigdata_project_spark.functions import text as T
    from ds_ga1004_bigdata_project_spark.sources.catalog import Catalog

    docs = Catalog(spark, SF_ORACLE).documents
    caches: list = []
    try:
        df = T.stupid_backoff_nll(
            docs, train_df=docs.filter(F.col("source") != "src0"),
            caches=caches)
        plan = physical_plan(df)
        assert plan.count("InMemoryTableScan") >= 4  # c123 rollups + muni
        assert_no_cartesian(df)
    finally:
        for c in caches:
            c.unpersist()


def test_winnowing_hashes_in_row_and_shuffles_narrow(spark):
    """q166: gram hashing happens in-row (substring(md5(...)) in the
    projection, not a corpus-wide HOF over a computed array) and the
    pairing never plans a cartesian product."""
    from ds_ga1004_bigdata_project_spark.operators.dedup import (
        winnowing_pairs)
    from ds_ga1004_bigdata_project_spark.sources.catalog import Catalog

    df = winnowing_pairs(Catalog(spark, SF_ORACLE).documents, k=4, w=5)
    plan = physical_plan(df)
    assert "substring(md5" in plan
    assert "Exchange SinglePartition" not in plan
    assert_no_cartesian(df)


def test_triangles_use_edge_iterator_not_wedge_join(spark):
    """q167: the plan must close triangles with the in-row
    array_intersect over adjacency arrays — a regression to the
    materialized wedge self-join (29.3 s / OOM class at sf0.1) loses
    that node."""
    from ds_ga1004_bigdata_project_spark.operators.graph import (
        triangle_participation)

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4)], "u long, v long")
    df = triangle_participation(edges, src="u", dst="v")
    plan = physical_plan(df)
    assert "array_intersect" in plan
    assert_no_cartesian(df)


def test_priority_sample_is_top_n_not_sort(spark):
    """q177's claim: priority sampling is per-row arithmetic + a global
    top-n — TakeOrderedAndProject (per-task heaps), never a full sort
    or any exchange of the input."""
    from ds_ga1004_bigdata_project_spark.operators.sampling import (
        priority_sample)
    from ds_ga1004_bigdata_project_spark.sources.catalog import Catalog

    from .conftest import SF_SMOKE

    docs = Catalog(spark, SF_SMOKE).documents
    plan = physical_plan(priority_sample(docs, "doc_id", "n_chars", 50))
    assert "TakeOrderedAndProject" in plan, plan
    assert "Exchange" not in plan, f"expected shuffle-free top-n:\n{plan}"


def test_zipf_regression_window_is_topn_sized(spark):
    """q180's claim: the single-partition rank window runs AFTER the
    global top-N — the plan's TakeOrderedAndProject caps the window
    input at top_n rows at any corpus size."""
    from ds_ga1004_bigdata_project_spark.functions import text as T
    from ds_ga1004_bigdata_project_spark.sources.catalog import Catalog

    from .conftest import SF_SMOKE

    docs = Catalog(spark, SF_SMOKE).documents
    plan = physical_plan(T.zipf_slope(docs, top_n=200))
    assert "TakeOrderedAndProject" in plan, plan
    # the window (printed above its inputs) must consume the top-N —
    # TakeOrderedAndProject sits in its subtree, so the
    # SinglePartition exchange moves <= top_n rows by construction
    idx_win = plan.index("Window")
    assert "TakeOrderedAndProject" in plan[idx_win:], plan


def test_ccnet_buckets_window_runs_on_histogram(spark):
    """q182's claim: the per-lang cumulative window consumes the
    (lang, v) HISTOGRAM — a HashAggregate must feed the Window's
    SinglePartition-per-lang exchange, so lang partitions carry
    value-distinct rows, not documents (the q158 discipline). Composed
    exactly as the q182 builder composes it (checkpointing in the
    registered query hides its lineage from EXPLAIN)."""
    from pyspark.sql import Window
    from ds_ga1004_bigdata_project_spark.functions import text as T
    from ds_ga1004_bigdata_project_spark.sources.catalog import Catalog

    from .conftest import SF_SMOKE

    docs = Catalog(spark, SF_SMOKE).documents
    nll = T.bigram_lm_nll(docs)
    scored = (nll.join(docs.select("doc_id", "lang"), "doc_id")
              .withColumn("v", F.col("sum_nll").cast("double")
                          / F.col("n_bigrams")))
    hist = scored.groupBy("lang", "v").agg(F.count("*").alias("c"))
    w = (Window.partitionBy("lang").orderBy(F.asc("v"))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    plan = physical_plan(hist.withColumn("cum", F.sum("c").over(w)))
    iw = plan.index("Window")
    assert "HashAggregate" in plan[iw:], (
        "window must consume the aggregated histogram, not raw docs:\n"
        + plan)


def test_threshold_curve_streams_pairs_builds_literals(spark):
    """q183's claim: the non-equi threshold rollup streams the PAIR
    relation against the broadcast literal table — never the inversion
    that broadcasts the whole candidate pipeline onto the driver's
    broadcast-build path (learning-13 class; measured 11.5 s vs 2.9 s
    at sf0.01)."""
    from ds_ga1004_bigdata_project_spark.operators.dedup import (
        jaccard_threshold_curve)
    from ds_ga1004_bigdata_project_spark.sources.catalog import Catalog

    from .conftest import SF_SMOKE

    docs = Catalog(spark, SF_SMOKE).documents
    caches = []
    try:
        df = jaccard_threshold_curve(docs, caches=caches)
        # the formatted plan drops the BNLJ build side; the simple
        # string carries it
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        for c in caches:
            c.unpersist()
    assert "BroadcastNestedLoopJoin BuildRight, Cross" in plan, plan
    assert "BroadcastNestedLoopJoin BuildLeft" not in plan, (
        f"pair side broadcast:\n{plan}")


def test_filter_agreement_single_scan(spark):
    """q200's claim: the 3x3 agreement matrix reduces in ONE
    map-side-combined aggregate over ONE corpus scan — the 3-row output
    is a projection of a single aggregate row, never a union of three
    re-scans (learning-17 class)."""
    import re

    plan = physical_plan(_build(spark, "q200_filter_agreement"))
    scans = re.findall(r"\(\d+\) Scan parquet", plan)
    assert len(scans) == 1, plan
    assert "partial_sum" in plan, plan  # map-side combine


def test_group_reservoir_gets_group_limit_pushdown(spark):
    """q203's claim: rank<=k over the per-source window compiles to
    partial+final WindowGroupLimit, so each map task forwards at most k
    rows per stratum and low-cardinality sources never drag the corpus
    through a handful of reducers."""
    plan = physical_plan(_build(spark, "q203_group_reservoir"))
    assert "WindowGroupLimit" in plan, plan


def test_bm25_postings_width_is_pinned(spark):
    """The q150 in-suite-inflation fix (SCALE.md round 10): the persisted
    postings relation repartitions to defaultParallelism on t BEFORE the
    cache, AQE-exempt — the cache build must never collapse to a single
    AQE-coalesced task. The explicit round-robin-free hash repartition
    shows as REPARTITION_BY_NUM in the plan."""
    plan = physical_plan(_build(spark, "q150_bm25_retrieval"))
    assert "REPARTITION_BY_NUM" in plan, plan


def test_gate_ablation_single_scan(spark):
    """q216's claim: the rule array projects ONCE per row and the 6-row
    ablation rollup reduces in one map-side-combined aggregate over ONE
    corpus scan — never six re-scans of the token pipeline (the q200
    single-scan class)."""
    import re

    plan = physical_plan(_build(spark, "q216_gate_ablation"))
    scans = re.findall(r"\(\d+\) Scan parquet", plan)
    assert len(scans) == 1, plan
    assert "partial_sum" in plan or "partial_count" in plan, plan


def test_dedup_funnel_winner_selection_gets_group_limit(spark):
    """q213's claim: both hash-winner selections (rn = 1 per content
    hash) compile to WindowGroupLimit, so map tasks forward one row per
    hash group instead of dragging whole duplicate groups through the
    window sort."""
    plan = physical_plan(_build(spark, "q213_dedup_funnel"))
    assert "WindowGroupLimit" in plan, plan


def test_k_anonymity_aggregates_map_side(spark):
    """q210's claim: both the QI histogram and the per-source rollup are
    map-side-combined hash aggregates (partial_*), so nothing row-sized
    survives the first exchange."""
    plan = physical_plan(_build(spark, "q210_k_anonymity"))
    assert "partial_count" in plan, plan
