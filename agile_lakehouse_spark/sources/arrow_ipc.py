"""Arrow IPC (Feather v2) file source/sink — executor-side, no driver funnel.

The reference spills point chunks as Arrow IPC files and reads them back
with projection (``pc-format/src/chunk.rs:61-128``); Arrow IPC is also the
natural zero-copy interchange format toward ML training loaders.  Spark has
no built-in IPC file source, so:

- **write**: ``df.mapInArrow`` — each task streams its partitions' Arrow
  batches straight into one ``.arrow`` file (RecordBatchFileWriter) on the
  shared filesystem and emits a one-row manifest (path, rows).  The data
  never touches the driver, exactly like a parquet sink.
- **read**: ``binaryFile`` scan (one task per file) → ``mapInArrow``
  decodes each file's bytes back into record batches, optionally
  projecting columns before emission (the reader-side projection the
  reference's ``chunk.read(projection, ...)`` performs).

Scale notes: files are the parallelism unit on read (same contract as the
LAS chunk table); write preserves the upstream partitioning 1:1.  For
many-GB partitions the writer streams batch-by-batch — nothing is
materialized beyond one Arrow batch at a time.
"""

from __future__ import annotations

import os
import uuid
from collections.abc import Iterator

import pyarrow as pa

from pyspark.sql import DataFrame, SparkSession


def write_ipc(df: DataFrame, out_dir: str) -> list[tuple[str, int]]:
    """Write ``df`` as one Arrow IPC file per partition; returns the
    (path, n_rows) manifest.  Executor-side: tasks write directly."""
    os.makedirs(out_dir, exist_ok=True)

    def _write(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        path = os.path.join(out_dir, f"part-{uuid.uuid4().hex}.arrow")
        writer = None
        n = 0
        for batch in batches:
            if writer is None:
                writer = pa.ipc.new_file(path, batch.schema)
            writer.write_batch(batch)
            n += batch.num_rows
        if writer is None:
            return  # empty partition -> no file
        writer.close()
        yield pa.RecordBatch.from_pydict({"path": [path], "n_rows": [n]})

    manifest = df.mapInArrow(_write, "path string, n_rows long").collect()
    return [(r.path, r.n_rows) for r in manifest]


def read_ipc(spark: SparkSession, path: str, columns: list[str] | None = None) -> DataFrame:
    """Distributed Arrow IPC read: one task per file, reader-side projection.

    The output Spark schema is derived from the first file's Arrow schema
    (driver opens ONE footer — the same single-header schema sniff the LAS
    source performs; data decoding happens on executors).
    """
    from pyspark.sql.pandas.types import from_arrow_schema

    files = sorted(
        os.path.join(path, f) for f in os.listdir(path) if f.endswith(".arrow")
    )
    if not files:
        raise FileNotFoundError(f"no .arrow files under {path}")
    with pa.ipc.open_file(files[0]) as rd:
        arrow_schema = rd.schema
    if columns is not None:
        arrow_schema = pa.schema([arrow_schema.field(c) for c in columns])
    spark_schema = from_arrow_schema(arrow_schema)

    def _decode(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:  # rows of the binaryFile scan: (path, ..., content)
            paths = batch.column(batch.schema.get_field_index("path")).to_pylist()
            for fpath in paths:
                local = fpath.removeprefix("file:")
                with pa.ipc.open_file(local) as rd:
                    for i in range(rd.num_record_batches):
                        b = rd.get_batch(i)
                        if columns is not None:
                            b = b.select(columns)
                        yield b

    listing = spark.read.format("binaryFile").load(files).select("path")
    return listing.mapInArrow(_decode, spark_schema)
