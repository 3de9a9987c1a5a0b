"""CSV / JSON-lines ingest and export (lakehouse boundary formats).

The reference's I/O surface is LAS/LAZ/PLY/Parquet; a general lakehouse
also lands delimited and JSONL drops.  Spark's readers are distributed and
schema-aware — these helpers pin the options that matter for correctness
at scale:

- ALWAYS pass an explicit schema on the read path.  ``inferSchema``/JSON
  schema inference is a FULL extra pass over the data (at 100 TB: a full
  extra scan) and can silently mis-type columns between batches.
- ``mode=FAILFAST`` by default: a malformed row should fail the ingest
  job, not become a row of NULLs (``PERMISSIVE`` + a corrupt-record column
  is the quarantine pattern — opt in via ``permissive=True``).
- Exports write a directory of part files (distributed, like every Spark
  sink); merging to one file is the caller's (driver-side) choice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

CORRUPT_COL = "_corrupt_record"


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    header: bool = True,
    permissive: bool = False,
    **options,
) -> DataFrame:
    reader = (
        spark.read.format("csv")
        .schema(schema)
        .option("header", header)
        .option("mode", "PERMISSIVE" if permissive else "FAILFAST")
    )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(path)


def write_csv(df: DataFrame, path: str, header: bool = True, **options) -> None:
    writer = df.write.mode("overwrite").format("csv").option("header", header)
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.save(path)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    permissive: bool = False,
    **options,
) -> DataFrame:
    reader = (
        spark.read.format("json")
        .schema(schema)
        .option("mode", "PERMISSIVE" if permissive else "FAILFAST")
    )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(path)


def write_jsonl(df: DataFrame, path: str, **options) -> None:
    writer = df.write.mode("overwrite").format("json")
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.save(path)
