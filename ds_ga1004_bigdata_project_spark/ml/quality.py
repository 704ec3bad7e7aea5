"""Document-quality classifier — the learned tier of the training-data
funnel (net-new vs the reference; SURVEY §7.2 M6 extension surface).

The heuristic quality gates (q34/q36: length, repetition, stopword ratios)
are stage one of a corpus cleaner; production pipelines then train a model on
those features against curated labels and score the whole corpus with it.
This module is that shape, end-to-end in Spark:

1. :func:`featurize` — per-doc numeric features, all JVM-side expressions
   (`functions/text.py` primitives; no UDFs, scan-speed at 100 TB).
2. deterministic content-hash train/heldout split (`sampling` rewrite of the
   reference's driver-side user sampling, `sample_indexer.py:36-39`).
3. `pyspark.ml` LogisticRegression (seeded), features via VectorAssembler.
4. scoring = one `model.transform` over the corpus; evaluation =
   DataFrame-native AUC (`metrics.auc`) on the heldout split.

Labels here are synthesized from a DIFFERENT signal than the features (long
documents by raw char count), so the learned boundary is non-trivial but
deterministic — the harness shape is real while needing no external labels.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as T

FEATURE_COLS = ["n_tokens", "distinct_ratio", "mean_tok_len",
                "stopword_ratio", "punct_ratio"]


def featurize(docs: DataFrame, text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """Per-document numeric feature vector as plain columns (assembled into
    an ml VectorUDT only at the model boundary).

    The token array is materialized in its OWN projection first: Catalyst
    does not common-subexpression-eliminate interpreted higher-order
    expressions, so inlining ``ws_tokens(...)`` into each of the four
    token-derived features would re-tokenize every document 4× (measured
    ~2× total featurize cost at sf0.1)."""
    toks = T.ws_tokens(F.lower(F.col(text_col)))
    tokenized = docs.select(F.col(id_col), F.col(text_col),
                            toks.alias("_toks"))
    t = F.col("_toks")
    return tokenized.select(
        F.col(id_col),
        F.size(t).cast("double").alias("n_tokens"),
        T.distinct_token_ratio(t, scale=None).alias("distinct_ratio"),
        T.mean_token_len(t).cast("double").alias("mean_tok_len"),
        T.stopword_ratio(t).cast("double").alias("stopword_ratio"),
        T.punct_ratio(F.col(text_col)).cast("double").alias("punct_ratio"),
    )


def synth_labels(docs: DataFrame, id_col: str = "doc_id",
                 char_threshold: int = 400) -> DataFrame:
    """Deterministic binary label from a signal outside the feature set:
    1 ⇔ the raw document is long (n_chars ≥ threshold)."""
    return docs.select(
        F.col(id_col),
        (F.length("text") >= char_threshold).cast("int").alias("label"))


@dataclass
class QualityModel:
    model: object          # pyspark.ml PipelineModel
    train_auc_row: tuple   # (auc, n_pos, n_neg) on heldout
    #: (id, quality_score) over the WHOLE corpus when ``score_all`` was
    #: requested — computed in the SAME transform pass as the heldout
    #: evaluation, so training + evaluation + corpus scoring cost one model
    #: transform total.
    scores: DataFrame | None = None
    #: Persisted internals whose lifetime outlives the call (only populated
    #: with ``score_all=True``: ``scores`` reads from them). The CALLER owns
    #: their release — unpersist after the consuming action (same hand-off
    #: contract as operators/ranks.py / operators/dedup.py).
    caches: list = field(default_factory=list)


def train_quality_classifier(docs: DataFrame, *, seed: int = 123,
                             heldout_fraction: float = 0.25,
                             id_col: str = "doc_id",
                             text_col: str = "text",
                             features: DataFrame | None = None,
                             layout_partitions: int | None = None,
                             score_all: bool = False) -> QualityModel:
    """Train the LR quality model on a content-hash split and evaluate on the
    heldout part with the native AUC aggregate.

    ``features``: optionally a precomputed (ideally persisted)
    :func:`featurize` output — callers that also score the corpus should
    featurize ONCE and pass it to both this and :func:`score_corpus`, so the
    tokenization pass over the corpus runs once, not twice.

    ``layout_partitions`` fixes the pre-fit physical layout (see the
    determinism note below). Default sizes it from the corpus row count
    (~100k rows per partition, capped at the session's parallelism — one
    metadata-only parquet count): every L-BFGS iteration is one job over
    this layout, and tiny tasks are pure scheduling overhead (measured 4×
    fit-time difference at 5k rows between 16 and 4 partitions). The count
    makes the value a pure function of the data, so retrains stay
    bit-identical; pass an explicit value to pin it across GROWING data.

    ``score_all=True`` additionally scores the whole corpus in the SAME
    model-transform pass that the heldout evaluation reads — the result
    lands in ``QualityModel.scores`` and its backing persist in
    ``QualityModel.caches`` (caller releases after consuming)."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.functions import vector_to_array

    from . import metrics as M

    from ..operators.relational import persisted

    feats = features if features is not None else featurize(docs, text_col, id_col)
    if layout_partitions is None:
        parallelism = docs.sparkSession.sparkContext.defaultParallelism
        # Parquet-metadata count — no data scan.
        layout_partitions = max(1, min(parallelism, -(-docs.count() // 100_000)))
    # Persist the featurized table: LR iterates over it and the heldout AUC
    # re-reads it — without this every pass re-tokenizes the corpus.
    # Pin partitioning AND within-partition order before the fit: LR's
    # treeAggregate sums floats in row order, so a layout that varies with
    # ambient AQE/cluster state would make coefficients vary at ulp level —
    # this keeps retrains bit-identical (asserted in tests/test_quality.py).
    data = persisted(feats.join(
        synth_labels(docs, id_col), id_col)
        .repartition(layout_partitions, id_col).sortWithinPartitions(id_col))
    # Content-hash split: reproducible across runs/partitionings (no RNG).
    bucket = F.pmod(F.xxhash64(F.col(id_col).cast("string"), F.lit(seed)),
                    F.lit(100))
    cut = int(heldout_fraction * 100)
    train = data.filter(bucket >= cut)

    pipe = Pipeline(stages=[
        VectorAssembler(inputCols=FEATURE_COLS, outputCol="features"),
        # 6 L-BFGS iterations separate these near-separable synthetic labels
        # to heldout AUC ≈ 0.9996 — more iterations buy nothing but jobs
        # (each iteration is one treeAggregate pass over the corpus).
        LogisticRegression(featuresCol="features", labelCol="label",
                           maxIter=6, regParam=0.01),
    ])
    caches: list[DataFrame] = []
    try:
        model = pipe.fit(train)
        # ONE transform pass: score every row (train + heldout), keep the
        # P(class=1) scalar. The heldout AUC filters this table; with
        # score_all the same table IS the corpus-wide score column.
        score = F.element_at(vector_to_array(F.col("probability")), 2)
        scored_full = model.transform(data).select(
            F.col(id_col), "label", score.alias("quality_score"))
        if score_all:
            scored_full = persisted(scored_full)
            caches.append(scored_full)
        heldout_scored = scored_full.filter(
            F.pmod(F.xxhash64(F.col(id_col).cast("string"), F.lit(seed)),
                   F.lit(100)) < cut)
        auc_row = tuple(
            M.auc(heldout_scored, "quality_score", "label").first())
    except Exception:
        for c in caches:
            c.unpersist()
        raise
    finally:
        data.unpersist()
    return QualityModel(
        model=model, train_auc_row=auc_row,
        scores=(scored_full.select(
            id_col, F.round("quality_score", 6).alias("quality_score"))
            if score_all else None),
        caches=caches)


def score_corpus(qm: QualityModel, docs: DataFrame,
                 id_col: str = "doc_id", text_col: str = "text",
                 features: DataFrame | None = None) -> DataFrame:
    """Score every document: returns (doc_id, quality_score) — the corpus-
    wide filter column for the funnel's learned gate.

    Pass the same persisted ``features`` used for training to avoid a second
    tokenization pass over the corpus (VERDICT r2 #6)."""
    feats = features if features is not None else featurize(docs, text_col, id_col)
    from pyspark.ml.functions import vector_to_array

    return qm.model.transform(feats).select(
        F.col(id_col),
        F.round(F.element_at(vector_to_array(F.col("probability")), 2),
                6).alias("quality_score"))
