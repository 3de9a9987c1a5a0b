"""Structured Streaming operators over the ``events`` stream.

The reference is batch-only (SURVEY.md §2.8); streams are declared as part
of our engine's contract and built on Spark Structured Streaming built-ins:
watermarks for late data, tumbling/sliding/session windows, stateful dedup.
The batch twin of the tumbling window (declared query dq20_time_bucket)
keeps the semantics oracle-testable; these builders are exercised by
``tests/test_streaming.py`` with file sources + ``availableNow`` triggers.

Scale notes: stateful aggregation state lives in the state store keyed by
(window, group); watermarks bound state size — never run an unbounded
window at 100 TB/day without one.  Sinks should be idempotent
(checkpointed exactly-once for file sinks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def read_events_stream(spark, path: str, schema=None) -> DataFrame:
    """File-based stream over an events directory (parquet).

    ``maxFilesPerTrigger=1`` gives deterministic micro-batches in tests; a
    production source would be Kafka/Kinesis with the same downstream ops.
    """
    reader = spark.readStream.format("parquet").option("maxFilesPerTrigger", 1)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(path)


def with_event_time(df: DataFrame, ts_col: str = "ts", delay: str = "10 minutes") -> DataFrame:
    """Attach the watermark that bounds lateness (and state size)."""
    return df.withWatermark(ts_col, delay)


def tumbling_counts(df: DataFrame, ts_col: str = "ts", width: str = "10 minutes") -> DataFrame:
    """Tumbling window counts + value sums (streaming twin of dq20)."""
    return (
        df.groupBy(F.window(ts_col, width).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(F.col("w.start").alias("w_start"), F.col("w.end").alias("w_end"), "n_events", "sum_value")
    )


def sliding_counts(df: DataFrame, ts_col: str = "ts", width: str = "10 minutes", slide: str = "5 minutes") -> DataFrame:
    """Sliding (hopping) window counts."""
    return (
        df.groupBy(F.window(ts_col, width, slide).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("w_start"), F.col("w.end").alias("w_end"), "n_events")
    )


def session_counts(df: DataFrame, ts_col: str = "ts", gap: str = "5 minutes", key: str = "user_id") -> DataFrame:
    """Session windows per key: events closer than ``gap`` merge into one session."""
    return (
        df.groupBy(F.col(key), F.session_window(ts_col, gap).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(key, F.col("w.start").alias("w_start"), F.col("w.end").alias("w_end"), "n_events")
    )


def dedup_within_watermark(df: DataFrame, keys: list[str], ts_col: str = "ts") -> DataFrame:
    """Stateful streaming dedup bounded by the watermark.

    ``dropDuplicatesWithinWatermark`` keeps state only while a duplicate
    could still arrive — the streaming analogue of exact_dedup.
    """
    return df.dropDuplicatesWithinWatermark(keys)


def run_to_memory(stream_df: DataFrame, name: str, output_mode: str = "append") -> None:
    """Drain a stream into an in-memory table with availableNow (test helper)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    max_lag: str = "15 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Stream-stream INNER join: each left event pairs with same-key right
    events from the preceding ``max_lag`` (right.ts in [left.ts - lag,
    left.ts]).

    Both sides carry watermarks and the join condition is time-BOUNDED in
    both directions — that's what lets Spark evict join state: without the
    range bound the state store would buffer both streams forever.  The
    batch twin (same condition on static frames) is what tests assert
    equality against.
    """
    lw = left.withWatermark(ts_col, watermark).alias("l")
    rw = right.withWatermark(ts_col, watermark).alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"r.{ts_col}") >= F.col(f"l.{ts_col}") - F.expr(f"INTERVAL {max_lag}"))
        & (F.col(f"r.{ts_col}") <= F.col(f"l.{ts_col}"))
    )
    return lw.join(rw, cond, "inner")
