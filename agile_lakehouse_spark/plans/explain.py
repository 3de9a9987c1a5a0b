"""Physical-plan inspection helpers.

The build rule is ".explain('formatted') every operator and iterate until
it's the plan you'd want"; these helpers make that checkable in pytest so
plan regressions (lost pushdown, surprise shuffle, Python-UDF creep) fail CI
instead of shipping.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def has_pushed_filters(df: DataFrame) -> bool:
    """True if the Parquet scan received pushed data filters."""
    plan = formatted_plan(df)
    return "PushedFilters: [" in plan and "PushedFilters: []" not in plan


def read_schema_columns(df: DataFrame) -> list[str]:
    """Columns actually read from Parquet (column pruning check)."""
    plan = formatted_plan(df)
    cols: list[str] = []
    for line in plan.splitlines():
        if "ReadSchema:" in line:
            struct = line.split("ReadSchema:", 1)[1].strip()
            inner = struct[struct.find("<") + 1 : struct.rfind(">")]
            for fld in inner.split(","):
                if ":" in fld:
                    cols.append(fld.split(":")[0].strip())
    return cols


def num_shuffles(df: DataFrame) -> int:
    """Count of exchange operators in the physical plan.

    Counts only the tree section (before the per-node details), so each
    node is counted once and plans embedded in cached-relation details
    don't inflate the count.
    """
    plan = formatted_plan(df)
    tree = plan.split("\n\n", 1)[0]
    # post-execution AQE plans print "Final Plan" then "Initial Plan";
    # count the final one only (the initial repeats every exchange)
    if "== Initial Plan ==" in tree:
        tree = tree.split("== Initial Plan ==", 1)[0]
    return sum(
        1
        for line in tree.splitlines()
        if "Exchange" in line
        and "ReusedExchange" not in line
        and "BroadcastExchange" not in line  # broadcast is not a data shuffle
        and "QueryStage" not in line
    )


def uses_python_udf(df: DataFrame) -> bool:
    plan = formatted_plan(df)
    return "BatchEvalPython" in plan or "ArrowEvalPython" in plan


def is_top_k(df: DataFrame) -> bool:
    """True if the plan is a TakeOrderedAndProject (no full sort for top-k)."""
    return "TakeOrderedAndProject" in formatted_plan(df)


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df)
