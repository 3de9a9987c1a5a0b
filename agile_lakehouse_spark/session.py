"""SparkSession factory.

Mirrors the intent of the reference's ``default_session_config``
(``pc-io/src/config.rs:6-33``): statistics collection on, Parquet filter
pushdown + page-index pruning on, sensible batch sizing — but expressed as
Spark conf.  Designed for a real cluster; ``local[*]`` is only the test
harness.

Scale notes (100 TB / 1000 executors):
- AQE on: runtime shuffle-partition coalescing, skew-join splitting, and
  broadcast-join demotion/promotion replace hand-tuning per dataset.
- ``spark.sql.shuffle.partitions`` is a *default*; AQE coalesces down, and
  large jobs should set it ~2-3x total cores.
- Parquet vectorized reader + page-index pruning give the row-group/page
  skipping the reference hand-rolls over LAZ chunk stats.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_BATCH_SIZE = 524_288  # reference ingest batch rows (pc-io/src/config.rs:3)


def get_session(
    app_name: str = "agile-lakehouse-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession configured for the engine.

    Defaults favor local testing; on a cluster, ``master`` comes from the
    submit environment and only the SQL confs below matter.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.session.timeZone", "UTC")
        # Catalyst/AQE: runtime coalescing + skew handling at scale
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # scan-side pruning (reference: pushdown_filters/reorder_filters,
        # page statistics — pc-io/src/config.rs:12-13, merge.rs:26)
        .config("spark.sql.parquet.filterPushdown", "true")
        # parquet TIMESTAMP(NANOS) is not a Spark type: read as long,
        # sources/catalog.py converts to microsecond timestamps exactly
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # naive parquet timestamps read as LTZ (UTC session), never NTZ —
        # event-time streaming ops (withWatermark) reject TIMESTAMP_NTZ
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        .config("spark.sql.parquet.columnIndex.enabled", "true")
        .config("spark.sql.cbo.enabled", "true")
        # Arrow for any pandas-UDF path (the slow path; keep batches big)
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or max(cpus, 8)))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    if master:
        builder = builder.master(master)
    elif not os.environ.get("SPARK_MASTER"):
        builder = builder.master(f"local[{cpus}]")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
