"""LAS/LAZ ingest adapter (reference S1-S4: ``pc-io/src/las/``).

Spark has no LAS reader; the idiomatic shape is a one-time ELT job, not a
live scan (SURVEY.md §2.1): plan per-chunk read units from the LAZ chunk
table, decode chunks in parallel tasks (vectorized numpy — no row loop),
emit Arrow batches, land Parquet.  After ingest every query runs on
Parquet with built-in pruning, which subsumes the reference's custom
LasExec + file/chunk skip masks.

Uncompressed ``.las`` (point formats 0-3) decodes NATIVELY via
``sources/las_native.py`` — fixed-width records, one ``numpy.frombuffer``
per chunk, no third-party dependency.  Compressed ``.laz`` point formats
0-3 (POINT10 + GPSTIME11 + RGB12, all version 2) ALSO decode natively
via ``sources/laz_native.py`` (vendored LASzip arithmetic codec, round
4) — chunk plans come from the REAL chunk table, one Spark task per LAZ
chunk (``pc-io/src/las/source.rs:159-208``).  Exotic variants (formats
4+, layered compressor 3, extra bytes) stay gated on ``laspy``.
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


def decode_chunk_native(plan: ChunkPlan, raw: bool = False) -> list[tuple]:
    """Decode one uncompressed-LAS chunk with the dependency-free parser
    (``las_native.decode_points``) -> (x, y, z, intensity, classification)
    rows.  Runs inside executor tasks; the frombuffer decode is fully
    vectorized, only the final row materialization is Python."""
    from agile_lakehouse_spark.sources import las_native

    cols = las_native.decode_points(plan.path, offset=plan.offset, count=plan.count, raw=raw)
    return list(
        zip(
            map(float, cols["x"]),
            map(float, cols["y"]),
            map(float, cols["z"]),
            map(int, cols["intensity"]),
            map(int, cols["classification"]),
        )
    )


def decode_chunk_native_laz(plan: ChunkPlan, raw: bool = False) -> list[tuple]:
    """Decode one LAZ chunk with the vendored LASzip codec
    (``laz_native``).  The plan's offset must sit on a real chunk
    boundary (which :func:`plan_chunks_for_file` guarantees for .laz)."""
    from agile_lakehouse_spark.sources import laz_native

    info = laz_native.read_laz_info(plan.path)
    idx = plan.offset // info.chunk_size
    if info.chunk_size * idx != plan.offset or plan.count != info.chunk_points[idx]:
        raise ValueError(
            f"LAZ plan ({plan.offset}, {plan.count}) not aligned with the chunk table"
        )
    cols = laz_native.decode_laz_chunk(plan.path, info, idx, raw=raw)
    return list(
        zip(
            map(float, cols["x"]),
            map(float, cols["y"]),
            map(float, cols["z"]),
            map(int, cols["intensity"]),
            map(int, cols["classification"]),
        )
    )


def plan_chunks_for_file(path: str, chunk_points: int = DEFAULT_CHUNK_POINTS) -> list[ChunkPlan]:
    """Chunk plans for a real ``.las``/``.laz`` file.

    ``.las``: point count from the header (metadata-only read),
    fixed-size chunks.  ``.laz`` (POINT10): the REAL chunk table from the
    LASzip stream — each plan is exactly one independently-decodable
    compressed chunk (the reference's parallel unit,
    ``pc-io/src/las/source.rs:159-208``)."""
    from agile_lakehouse_spark.sources import las_native

    if path.endswith(".laz"):
        from agile_lakehouse_spark.sources import laz_native

        try:
            info = laz_native.read_laz_info(path)
        except NotImplementedError:
            # non-POINT10 LAZ: laspy path with synthesized fixed chunks
            return plan_chunks(path, las_native.read_header(path).n_points, chunk_points)
        plans, off = [], 0
        for cnt in info.chunk_points:
            plans.append(ChunkPlan(path, off, cnt))
            off += cnt
        return plans
    return plan_chunks(path, las_native.read_header(path).n_points, chunk_points)


def ingest_las(
    spark: SparkSession,
    plans: list[ChunkPlan],
    decoder=None,
    schema: str = "x double, y double, z double, intensity int, classification int",
) -> DataFrame:
    """Distributed ingest: one Spark task per chunk plan.

    ``decoder(plan) -> list[tuple]`` runs inside executors (keep it
    import-light).  Defaults to the native uncompressed-LAS decoder for
    ``.las`` plans and laspy for ``.laz``.  This is the only RDD use in
    the engine — per-partition imperative decode of a foreign format,
    exactly the carve-out the Spark-first rule allows.
    """
    if decoder is None:
        if any(p.path.endswith(".laz") for p in plans):
            # native LASzip codec for POINT10 variants; laspy otherwise
            from agile_lakehouse_spark.sources import laz_native

            try:
                laz_native.read_laz_info(plans[0].path)
                decoder = decode_chunk_native_laz
            except NotImplementedError:
                decoder = decode_chunk_laspy
        else:
            decoder = decode_chunk_native
    rdd = spark.sparkContext.parallelize(plans, max(len(plans), 1)).flatMap(decoder)
    return spark.createDataFrame(rdd, schema=schema)
