"""LAS/LAZ ingest adapter (reference S1-S4: ``pc-io/src/las/``).

Spark has no LAS reader; the idiomatic shape is a one-time ELT job, not a
live scan (SURVEY.md §2.1): plan per-chunk read units from the LAZ chunk
table, decode chunks in parallel tasks (``laspy`` vectorizes straight to
numpy — no row loop), emit Arrow batches, land Parquet.  After ingest every
query runs on Parquet with built-in pruning, which subsumes the reference's
custom LasExec + file/chunk skip masks.

``laspy`` is not installed in this container, so the decode is gated; the
chunk-planning arithmetic and the distributed plumbing (parallelize chunk
plans -> per-task decode -> createDataFrame) are real and unit-tested via a
deterministic fake decoder.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

try:  # pragma: no cover - not present in this container
    import laspy  # type: ignore

    HAS_LASPY = True
except ImportError:
    laspy = None
    HAS_LASPY = False

DEFAULT_CHUNK_POINTS = 524_288  # reference batch size (pc-io/src/config.rs:3)


@dataclass(frozen=True)
class ChunkPlan:
    """One parallel read unit: (file, point offset, point count).

    Mirrors the LAZ chunk table (or synthesized fixed-size chunks for
    uncompressed LAS — ``pc-io/src/las/source.rs:159-208``).
    """

    path: str
    offset: int
    count: int


def plan_chunks(path: str, total_points: int, chunk_points: int = DEFAULT_CHUNK_POINTS) -> list[ChunkPlan]:
    """Synthesize fixed-size chunk plans (LAS case; LAZ would read the VLR)."""
    plans = []
    off = 0
    while off < total_points:
        n = min(chunk_points, total_points - off)
        plans.append(ChunkPlan(path, off, n))
        off += n
    return plans


def decode_chunk_laspy(plan: ChunkPlan, raw: bool = False) -> list[tuple]:
    """Decode one chunk with laspy -> list of (x, y, z, intensity, classification).

    ``raw=True`` keeps integer grid coordinates + scale/offset (reference
    ``--raw`` mode, ``pc-io/src/las/schema.rs:11-53``).
    """
    if not HAS_LASPY:
        raise NotImplementedError("laspy not installed; use ingest_las(..., decoder=...) with a custom decoder")
    with laspy.open(plan.path) as rd:  # pragma: no cover
        rd.seek(plan.offset)
        pts = rd.read_points(plan.count)
        if raw:
            xs, ys, zs = pts.X, pts.Y, pts.Z
        else:
            hdr = rd.header
            xs = pts.X * hdr.scales[0] + hdr.offsets[0]
            ys = pts.Y * hdr.scales[1] + hdr.offsets[1]
            zs = pts.Z * hdr.scales[2] + hdr.offsets[2]
        return list(zip(map(float, xs), map(float, ys), map(float, zs), map(int, pts.intensity), map(int, pts.classification)))


def ingest_las(
    spark: SparkSession,
    plans: list[ChunkPlan],
    decoder=None,
    schema: str = "x double, y double, z double, intensity int, classification int",
) -> DataFrame:
    """Distributed ingest: one Spark task per chunk plan.

    ``decoder(plan) -> list[tuple]`` runs inside executors (keep it
    import-light).  This is the only RDD use in the engine — per-partition
    imperative decode of a foreign format, exactly the carve-out the
    Spark-first rule allows.
    """
    decoder = decoder or decode_chunk_laspy
    rdd = spark.sparkContext.parallelize(plans, max(len(plans), 1)).flatMap(decoder)
    return spark.createDataFrame(rdd, schema=schema)
