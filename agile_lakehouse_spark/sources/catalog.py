"""Catalog helpers: the fixture star schema + the derived ``points`` view.

Tables live as one Parquet file/dir each under a scale-factor directory
(TESTDATA.md).  ``points_view`` is the deterministic point-cloud projection
of ``lineitem`` defined in FIXTURES.md §B — it mirrors the reference's data
model (x/y/z dimension columns ordered per ``PC:dimension``, an importance
column ``i`` in [0,1), LAS-style attribute columns — see
``pc-format/src/schema.rs:11-17``, ``pc-io/src/las/schema.rs:55-70``) while
staying oracle-computable in DuckDB (no RNG; arithmetic hash importance).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from agile_lakehouse_spark.schema import with_pc_metadata

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# SQL body of the points view — single source of truth shared by the Spark
# builder below and the DuckDB oracle CTE (keep in lockstep with FIXTURES.md §B).
POINTS_SQL = """
SELECT
  l_orderkey * 10 + l_linenumber                          AS pid,
  l_extendedprice / 100.0                                 AS x,
  l_quantity * 20.0                                       AS y,
  l_tax * 1000.0                                          AS z,
  (((l_orderkey * 2654435761) % 1048576) / 1048576.0)     AS i,
  CAST(l_partkey % 256 AS INT)                            AS classification,
  CAST(l_suppkey % 65536 AS INT)                          AS intensity
FROM lineitem
"""

POINTS_CTE = f"WITH points AS ({POINTS_SQL})"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one fixture table (plain Parquet scan; pushdown/pruning built-in).

    ``events.ts`` is parquet TIMESTAMP(NANOS) — no such Spark type, so the
    session reads it as a nanos long (``spark.sql.legacy.parquet.nanosAsLong``)
    and we convert to a microsecond timestamp here with exact integer
    division (ns epochs exceed double's 2^53 exact range — never divide as
    float).
    """
    # Self-defending confs: declared queries may run on a CALLER-built
    # session (the correctness driver's), not ours — set the two runtime
    # confs every query depends on.  UTC pins timestamp<->local conversions
    # (year()/casts) to match the oracle's naive timestamps; nanosAsLong
    # makes TIMESTAMP(NANOS) parquet readable at all.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # Naive parquet timestamps (isAdjustedToUTC=false) must read as LTZ
    # TIMESTAMP, not TIMESTAMP_NTZ: withWatermark/event-time ops reject NTZ,
    # and with the session pinned to UTC the wall-clock arithmetic is
    # identical either way (oracle-verified).  Spark 4 infers NTZ by default.
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def register_all(spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TABLES) -> None:
    """Register every fixture table as a temp view for spark.sql access."""
    for t in tables:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


def points_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The derived point-cloud table (FIXTURES.md §B) with pc.* metadata.

    Built as a pure Catalyst projection over the lineitem scan, so column
    pruning/pushdown reach the Parquet reader; the importance column is a
    deterministic Knuth-multiplicative hash of the row key, replacing the
    reference's unseeded ``random()`` (``pc-format/src/compute.rs:29-75``)
    for cross-engine reproducibility.
    """
    li = load_table(spark, sf_dir, "lineitem")
    df = li.select(
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("pid"),
        (F.col("l_extendedprice") / 100.0).alias("x"),
        (F.col("l_quantity") * 20.0).alias("y"),
        (F.col("l_tax") * 1000.0).alias("z"),
        (((F.col("l_orderkey") * 2654435761) % 1048576) / 1048576.0).alias("i"),
        (F.col("l_partkey") % 256).cast("int").alias("classification"),
        (F.col("l_suppkey") % 65536).cast("int").alias("intensity"),
    )
    return with_pc_metadata(
        df,
        dimensions={"x": 1, "y": 2, "z": 3, "i": 4},
        locations={"x": "x", "y": "y", "z": "z"},
        importance="i",
    )
