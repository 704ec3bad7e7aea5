"""Physical-plan inspection — the engine's scale guardrails.

SURVEY §4: the reference never inspected plans. At 100 TB the physical plan IS
the product: a filter that doesn't reach the parquet scan re-reads the corpus;
a dimension join that doesn't broadcast shuffles the fact table. These helpers
turn those properties into assertions, used by ``tests/test_plans.py`` so plan
regressions fail CI, not the cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    """The formatted physical plan (what ``df.explain('formatted')`` prints)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted")


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges in the plan (broadcast exchanges excluded).
    Every one is a full network rewrite of its input — the unit of cost to
    minimize."""
    plan = physical_plan(df)
    return sum(1 for line in plan.splitlines()
               if "Exchange" in line and "Broadcast" not in line
               and line.strip().startswith(("+-", ":-", "*(",)) or
               line.strip().startswith("Exchange"))


def assert_pushed_filters(df: DataFrame, *fragments: str) -> None:
    """Assert the parquet scan carries PushedFilters mentioning each fragment
    (predicate pushdown reached storage — P7's scale requirement)."""
    plan = physical_plan(df)
    assert "PushedFilters" in plan, f"no pushed filters in plan:\n{plan}"
    pushed = [line for line in plan.splitlines() if "PushedFilters" in line]
    blob = " ".join(pushed)
    for frag in fragments:
        assert frag in blob, f"filter {frag!r} not pushed; got: {blob}"


def assert_broadcast_join(df: DataFrame, min_count: int = 1) -> None:
    """Assert at least ``min_count`` BroadcastHashJoins (dimension sides must
    broadcast, never shuffle the fact table — J1's scale requirement)."""
    plan = physical_plan(df)
    n = plan.count("BroadcastHashJoin")
    assert n >= min_count, f"expected ≥{min_count} broadcast joins, found {n}:\n{plan}"


def assert_no_cartesian(df: DataFrame) -> None:
    """Assert no CartesianProduct stage (an accidental cross join is a
    cluster-killer; intentional broadcast nested loops are fine)."""
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan, f"cartesian product in plan:\n{plan}"


def read_schema_width(df: DataFrame, table_fragment: str) -> int:
    """Number of columns in the scan's ReadSchema for scans whose path matches
    ``table_fragment`` — column pruning made observable."""
    plan = physical_plan(df)
    widths = []
    lines = plan.splitlines()
    for i, line in enumerate(lines):
        if "Location" in line and table_fragment in line:
            for j in range(max(0, i - 5), min(len(lines), i + 6)):
                if "ReadSchema" in lines[j]:
                    schema = lines[j].split("ReadSchema:")[1]
                    widths.append(schema.count(":"))
    assert widths, f"no scan of {table_fragment} found:\n{plan}"
    return max(widths)
