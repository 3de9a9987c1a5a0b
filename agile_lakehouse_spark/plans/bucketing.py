"""Bucketed tables: co-located joins and aggregations without shuffle.

At 100 TB the dominant cost of fact-fact joins (lineitem ⋈ orders, events
self-joins) is shuffling both sides on the key.  Writing both tables
bucketed on that key (same bucket count) lets Spark plan a SortMergeJoin
with NO Exchange on either side — the shuffle is paid once at write time
and amortized over every subsequent join/aggregation on the key.

This is the Spark-native equivalent of the reference's ahead-of-time
layout idea (pc-cli/src/partition.rs) applied to the relational axis
instead of the spatial one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 8,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist ``df`` as a bucketed (+optionally sorted) catalog table.

    Sorting within buckets additionally removes the Sort below a
    SortMergeJoin — the join degenerates to a zipper merge per bucket.
    """
    writer = df.write.mode("overwrite").format("parquet").bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def co_located_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    left_key: str,
    right_key: str,
    force_sort_merge: bool = False,
) -> DataFrame:
    """Join two same-bucketed tables on their bucket keys (no shuffle).

    Requires both tables written by :func:`write_bucketed` with the same
    ``num_buckets`` on the join keys; Spark's bucketing rule then reports
    compatible output partitioning for both scans.  ``force_sort_merge``
    pins the SMJ strategy — useful to demonstrate/guarantee the zero-
    exchange plan when one side is small enough to auto-broadcast.
    """
    left = spark.table(left_table)
    right = spark.table(right_table)
    if force_sort_merge:
        left = left.hint("merge")
    return left.join(right, left[left_key] == right[right_key])
