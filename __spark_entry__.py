"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query on sf0.001;
``queries()``/``oracle_sql()`` expose the declared-query registry
(agile_lakehouse_spark/declared.py) that the driver hash-matches against
DuckDB at sf0.01 (SURVEY.md §2.8 / FIXTURES.md).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from agile_lakehouse_spark import declared  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: multi-way join + broadcast dims + agg (DQ11)."""
    return declared.SPARK_QUERIES["dq11_multiway_join"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(declared.SPARK_QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per declared query (column names aligned)."""
    return dict(declared.ORACLES)
