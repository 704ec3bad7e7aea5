"""Privacy-preserving release operators for training-data governance.

A corpus released for model training carries re-identification risk
through quasi-identifier combinations (segment × geography × value
bucket), not just through direct identifiers — the PII scrub
(functions/text.py, q83) removes the latter; this module enforces
k-anonymity over the former: every released row must be indistinguishable
from at least k-1 others on its quasi-identifier tuple, and groups
smaller than k are SUPPRESSED (the standard generalize-then-suppress
release model).

Scale shape: one map-side-combined aggregation over the quasi tuple
(group count), then a semi-join of the corpus against the qualifying
groups — the qualifying-group relation is |distinct tuples| rows
(typically broadcastable; AQE decides from runtime stats). No window, no
per-row state; generalization (bucketing a continuous column) is a pure
projection the caller applies before calling, so the operator composes
with any generalization ladder.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def k_anonymize(df: DataFrame, quasi_cols: list[str], k: int) -> DataFrame:
    """Rows of ``df`` whose quasi-identifier tuple occurs ≥ k times.

    Returns the released rows (all original columns). Suppression is
    all-or-nothing per group — the k-anonymity guarantee.

    The semi-join uses NULL-SAFE equality: ``groupBy`` treats NULL as a
    value (a null-geo group of size ≥ k is a legitimate release), but a
    plain column-list join matches with ``=`` and would silently suppress
    every row whose quasi tuple contains a NULL — a correctness trap this
    operator's test pins."""
    qualifying = (df.groupBy(*quasi_cols)
                  .agg(F.count(F.lit(1)).alias("_qc"))
                  .filter(F.col("_qc") >= k)
                  .select([F.col(c).alias(f"_q_{c}") for c in quasi_cols]))
    cond = None
    for c in quasi_cols:
        eq = F.col(c).eqNullSafe(F.col(f"_q_{c}"))
        cond = eq if cond is None else (cond & eq)
    return df.join(qualifying, cond, "left_semi")


def k_anonymity_report(df: DataFrame, quasi_cols: list[str],
                       k: int) -> DataFrame:
    """One-row release audit: groups/rows released vs rows suppressed.

    Computed from the group-count relation alone (|distinct tuples| rows
    — the corpus is scanned once for the aggregation and never again)."""
    counts = df.groupBy(*quasi_cols).agg(F.count(F.lit(1)).alias("_qc"))
    ok = F.col("_qc") >= k
    # coalesce: sum over ZERO groups (an empty, fully-pre-filtered
    # corpus) is NULL, and a release gate comparing `suppressed == 0`
    # must see honest zeros, not None.
    return counts.agg(
        F.coalesce(F.sum(ok.cast("int")), F.lit(0))
        .alias("n_groups_released"),
        F.coalesce(F.sum(F.when(ok, F.col("_qc")).otherwise(0)), F.lit(0))
        .alias("n_rows_released"),
        F.coalesce(F.sum(F.when(~ok, F.col("_qc")).otherwise(0)), F.lit(0))
        .alias("n_rows_suppressed"))
