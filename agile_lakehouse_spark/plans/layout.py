"""Data-layout engine — the paper's core contribution, as Spark write jobs.

The reference streams spatial windows through a hand-rolled cache/evict
partitioner so each grid/quadtree cell lands in its own Parquet row group
(``pc-cli/src/partition.rs:80-374``).  In Spark the entire mechanism IS the
shuffle: assign cell keys as native columns, ``repartition`` on them,
``sortWithinPartitions`` so row groups are tight in (cell, importance), and
write.  The memory-bounded out-of-core behavior the reference implements by
hand (window buffers, global cell cache, eviction) comes for free from
shuffle spill.

Read-side benefit needs no custom planner rule: queries filter on x/y/i,
Parquet footer + page stats prune files/row-groups/pages that the layout
made tight (SURVEY.md §4).

Sizing arithmetic mirrors the reference:
- :func:`derive_grid_size`     (pc-cli/src/partition.rs:164-198)
- :func:`derive_quadtree_depth`(pc-cli/src/partition.rs:199-237)
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark.sql import Column

from agile_lakehouse_spark.operators.pointcloud import bounds, grid_cells, quadtree_cells
from agile_lakehouse_spark.session import DEFAULT_BATCH_SIZE


def zorder_key(cx: Column | str, cy: Column | str, bits: int = 16) -> Column:
    """Morton/Z-order interleave of two non-negative cell indices.

    Pure bit arithmetic (shifts + masks — whole-stage-codegen friendly), so
    ``repartitionByRange(zkey)`` gives every output file a spatially
    CONTIGUOUS block of cells — the Spark-first equivalent of Delta
    ``OPTIMIZE ZORDER BY``.  Plain hash ``repartition(cell)`` would scatter
    distant cells into the same file and destroy min/max pruning.
    Negative cell indices are offset into the non-negative range first.
    """
    cx = F.col(cx) if isinstance(cx, str) else cx
    cy = F.col(cy) if isinstance(cy, str) else cy
    half = F.lit(1 << (bits - 1))
    x = (cx + half).cast("bigint")
    y = (cy + half).cast("bigint")
    z = F.lit(0).cast("bigint")
    for b in range(bits):
        z = z + F.shiftleft(F.shiftright(x, b).bitwiseAND(F.lit(1)), 2 * b)
        z = z + F.shiftleft(F.shiftright(y, b).bitwiseAND(F.lit(1)), 2 * b + 1)
    return z


def zorder_key3(
    cx: Column | str, cy: Column | str, cz: Column | str, bits: int = 16
) -> Column:
    """3-D Morton interleave for full XYZ clustering (reference dims are
    XYZ(I) — ``pc-format/src/dims.rs:6-22``): bit i of each axis lands at
    position 3i+axis, so files own spatially contiguous CUBES.

    Use over :func:`zorder_key` when queries predicate all three axes
    (e.g. airborne LiDAR slabs); 2-D keys leave z scattered and a z-range
    predicate prunes nothing.  16 bits/axis = 48-bit key, still a bigint.
    """
    cx = F.col(cx) if isinstance(cx, str) else cx
    cy = F.col(cy) if isinstance(cy, str) else cy
    cz = F.col(cz) if isinstance(cz, str) else cz
    half = F.lit(1 << (bits - 1))
    x = (cx + half).cast("bigint")
    y = (cy + half).cast("bigint")
    w = (cz + half).cast("bigint")
    z = F.lit(0).cast("bigint")
    for b in range(bits):
        z = z + F.shiftleft(F.shiftright(x, b).bitwiseAND(F.lit(1)), 3 * b)
        z = z + F.shiftleft(F.shiftright(y, b).bitwiseAND(F.lit(1)), 3 * b + 1)
        z = z + F.shiftleft(F.shiftright(w, b).bitwiseAND(F.lit(1)), 3 * b + 2)
    return z


def derive_grid_size(count: int, area: float, splits: int = 1, batch_size: int = DEFAULT_BATCH_SIZE) -> float:
    """Grid spacing so one cell holds ≈ one row group of points.

    ``size = sqrt(area / (count/batch_size / splits))`` — same arithmetic as
    the reference (two cheap agg queries feed it: count + bounds).
    """
    n_cells = max(count / batch_size / max(splits, 1), 1.0)
    return math.sqrt(area / n_cells)


def derive_quadtree_depth(count: int, batch_size: int = DEFAULT_BATCH_SIZE) -> int:
    """``depth = round(log4(count / batch_size))``, min 0 (partition.rs:210-212)."""
    batches = max(count / batch_size, 1.0)
    return max(round(math.log(batches, 4)), 0)


def _layout_partitions(df: DataFrame, max_records_per_file: int) -> int:
    """Size the layout shuffle so each range-partition task sorts and
    writes ≈ ONE output file.  Leaving it at spark.sql.shuffle.partitions
    makes a handful of tasks each sort multi-GB runs and write dozens of
    files serially: measured at 200M points / local[32], grid(1) takes
    104 s at 32 partitions, 56 s at 128, 43.7 s at 384 (one task ≈ one
    524k-row file) — the last beats the reference's single-node 46.0 s at
    the same point count.  Costs one cheap columnar count (the reference's
    own pipeline counts anyway for its sizing derivations,
    partition.rs:164-198)."""
    n = df.count()
    default = df.sparkSession.sparkContext.defaultParallelism
    return max(default, min(4096, -(-n // max_records_per_file)))


def write_grid_layout(
    df: DataFrame,
    path: str,
    delta_x: float,
    delta_y: float,
    importance_splits: int = 1,
    x: str = "x",
    y: str = "y",
    importance_col: str = "i",
    max_records_per_file: int = DEFAULT_BATCH_SIZE,
    curve: str = "morton",
    keep_cell_cols: bool = False,
) -> None:
    """Grid layout: shuffle on (cell_x, cell_y[, islice]), cluster, write.

    ``importance_splits`` > 1 reproduces grid(8): each xy cell is further
    sliced into equal importance bands (framework.rs:69-110 via split_aabb).
    One shuffle, then files whose row groups are tight in (x, y, i) — at
    100 TB this is the job you run once per ingest batch, and every later
    query pays less scan.  ``curve`` picks the clustering key: "morton"
    (default) or "hilbert" (adjacent-cell guarantee, no quadrant seams —
    see :func:`hilbert_key`).
    """
    out = grid_cells(df, {x: delta_x, y: delta_y})
    if curve == "morton":
        out = out.withColumn("zkey", zorder_key("cell_x", "cell_y"))
    elif curve == "hilbert":
        # the key depends only on the CELL: evaluate the fold once per
        # distinct cell and broadcast-join it back — Spark higher-order
        # functions run interpreted (outside codegen), so the per-ROW
        # spelling costs 8× the whole layout job at sf0.1 (measured
        # 12.0 s vs 1.5 s) and scales with points, not cells
        cells = (
            out.select("cell_x", "cell_y")
            .distinct()
            .withColumn("zkey", hilbert_key("cell_x", "cell_y"))
        )
        out = out.join(F.broadcast(cells), ["cell_x", "cell_y"])
    else:
        raise ValueError(f"unknown curve {curve!r} (morton | hilbert)")
    # cell ids are pure floor arithmetic over (x, y) — any reader can
    # recompute them, no reader prunes on them (pruning = footer x/y
    # stats + zkey file clustering), and each rides the exchange as a
    # fixed 8-byte UnsafeRow field: dropping both BEFORE the shuffle cuts
    # ~20% of exchange bytes on the disk-bound 2 B layout jobs (round 10).
    # ``keep_cell_cols=True`` opts back into materialized cell ids for
    # consumers that want them on disk.
    if not keep_cell_cols:
        out = out.drop("cell_x", "cell_y")
    sort_keys = ["zkey"]
    if importance_splits > 1:
        out = out.withColumn(
            "islice",
            F.least(
                F.floor(F.col(importance_col) * importance_splits),
                F.lit(importance_splits - 1),
            ).cast("int"),
        )
        sort_keys = ["zkey", "islice"]
    # range-partition on the space-filling curve: each task (and therefore
    # each file) owns a contiguous, spatially compact block of cells.
    # The raw coordinate rides along as a TIE-BREAKER partition key (not
    # a sort key): with fewer distinct cells than requested partitions —
    # a dense extract, a banded 2 B run whose x-band holds ~20 cells —
    # RangePartitioner collapses to one task per cell, and each task
    # then sorts+writes tens of millions of rows serially (measured: the
    # 2 B banded grid ran 21-wide on 32 cores and OOMed sorts at <=64 g
    # heap).  The tie-breaker splits hot cells across adjacent tasks
    # whose x RANGES are disjoint (x is a range-partition key only, not
    # a sort key, and maxRecordsPerFile splits ignore cell boundaries —
    # so neither per-file cell purity nor intra-cell x order is
    # guaranteed); the disjoint per-task x ranges of a split hot cell
    # are what keep footer min/max stats tight.
    part_keys = [*sort_keys, x]
    (
        out.repartitionByRange(_layout_partitions(df, max_records_per_file), *part_keys)
        .sortWithinPartitions(*sort_keys)
        .drop("zkey")
        .write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
        .parquet(path)
    )


def write_quadtree_layout(
    df: DataFrame,
    path: str,
    depth: int,
    side: float,
    x: str = "x",
    y: str = "y",
    importance_col: str = "i",
    origin: tuple[float, float] = (0.0, 0.0),
    max_records_per_file: int = DEFAULT_BATCH_SIZE,
    keep_cell_cols: bool = False,
) -> None:
    """Importance-stratified quadtree layout (framework.rs:169-219).

    ``partitionBy(level)`` externalizes the LoD hierarchy as directory
    partitions (partition pruning on ``level`` predicates = free), and rows
    inside each level are clustered by (qx, qy).

    The within-partition sort is (level, zkey) ONLY — near-constant keys
    per range-partitioned task, so the sort is effectively free.  Rounds
    3-6 additionally sorted by the raw importance double, which forced a
    true sort of every cell's rows for nothing the layout contract uses:
    the reference stratifies importance ACROSS levels (the level IS the
    importance slab, framework.rs:169-219) and leaves intra-cell order
    unspecified; no reader predicate prunes on intra-cell ``i``.
    Measured at 200 M points (scripts/profile_quadtree_gap.py): the
    i-sort cost 19 s of a 72 s job; after dropping it (+ the pow-free
    cell assignment) alternating same-session A/B runs put quadtree at
    34.9-41.2 s vs grid(1) at 32.1-59.6 s — parity.  At 2 B (banded,
    matched 64 g runs) quadtree 700 s vs grid 746 s.
    """
    out = quadtree_cells(df, depth, side, x=x, y=y, importance_col=importance_col, origin=origin)
    out = out.withColumn("zkey", zorder_key("qx", "qy"))
    # qx/qy are recomputable floor arithmetic and nothing reads them back
    # (level directories + footer x/y stats do the pruning) — dropping
    # them pre-shuffle cuts two 8-byte fields from every exchanged row
    # (~20% of exchange bytes at 2 B, round 10); keep_cell_cols opts back in.
    if not keep_cell_cols:
        out = out.drop("qx", "qy")
    # x rides along as a tie-breaker PARTITION key (same rationale as
    # write_grid_layout): a level-3 band holds only ~16 cells, so the
    # range partitioner otherwise collapses to one fat task per cell
    (
        out.repartitionByRange(
            _layout_partitions(df, max_records_per_file), "level", "zkey", x
        )
        .sortWithinPartitions("level", "zkey")
        .drop("zkey")
        .write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy("level")
        .parquet(path)
    )


def compact(spark: SparkSession, src_paths: list[str], dest: str, target_files: int) -> None:
    """File merge/compaction (reference merge.rs:46-84): many files -> few.

    Row-group boundaries follow the repartition; zstd to mirror the
    reference's merged-output default.
    """
    df = spark.read.parquet(*src_paths)
    (
        df.repartition(target_files)
        .write.mode("overwrite")
        .option("compression", "zstd")
        .parquet(dest)
    )


def layout_stats(spark: SparkSession, path: str, dims: list[str]) -> DataFrame:
    """Per-file extent/count stats (mirrors scripts/evaluation.py:36-103).

    Reads back a layout and reports, per physical file, row count and the
    per-dimension extents — the validation that "row group ≈ cell" held.
    """
    df = spark.read.parquet(path).withColumn("_file", F.input_file_name())
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for d in dims:
        aggs += [F.min(d).alias(f"{d}_min"), F.max(d).alias(f"{d}_max")]
    return df.groupBy("_file").agg(*aggs)


# --- Iceberg-style partition transforms -------------------------------------
#
# Hidden-partitioning transforms (Iceberg spec §Partition Transforms):
# derive the partition value from a data column so writers never manage
# partition columns by hand and layouts can evolve.  Ours use the
# portable md5-fold hash instead of Iceberg's murmur3_32 so the DuckDB
# oracle can verify assignments bit-for-bit; the shapes (hash-bucket,
# value-truncate, time-granularity) are the spec's.


def bucket_transform(col: str, n: int) -> Column:
    """Hash-bucket a key into ``n`` partitions, engine-portably.

    Equality predicates on the source column translate to ONE bucket —
    the pruning contract of hash partitioning (see
    :func:`bucket_of` for the reader-side value).
    """
    from agile_lakehouse_spark.functions.portable import hex15_spark

    return F.pmod(F.expr(hex15_spark(f"CAST({col} AS STRING)")), F.lit(n)).cast("int")


def bucket_of(value, n: int) -> int:
    """Driver-side bucket of a literal key — what a reader adds as a
    partition predicate to get hidden-partition pruning."""
    import hashlib

    h = int(hashlib.md5(str(value).encode()).hexdigest()[:15], 16)
    return h % n


def truncate_int_transform(col: Column | str, width: int) -> Column:
    """Numeric truncate transform: floor to ``width``-sized bins (range
    predicates on the source column stay prunable).

    Floor runs on the RAW value — casting a double to bigint first is an
    engine property (Spark truncates, DuckDB rounds) and would shift bin
    boundaries by one for fractions >= .5.
    """
    c = F.col(col) if isinstance(col, str) else col
    return (F.floor(c / width) * width).cast("bigint")


def truncate_str_transform(col: Column | str, width: int) -> Column:
    """String truncate transform: first ``width`` chars (prefix-range
    predicates stay prunable)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.substring(c, 1, width)


def days_transform(ts: Column | str) -> Column:
    """Day granularity: epoch days as an int partition value."""
    c = F.col(ts) if isinstance(ts, str) else ts
    return F.floor(F.unix_timestamp(c) / 86400).cast("int")


def write_bucketed_by_key(
    df: DataFrame, path: str, key_col: str, n_buckets: int
) -> None:
    """Write hash-bucket partitioned files: one directory per bucket, so a
    point lookup on the key reads 1/n of the table (plus the manifest-
    bloom layer for file-level pruning inside the bucket)."""
    (
        df.withColumn("bucket", bucket_transform(key_col, n_buckets))
        .repartition("bucket")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(path)
    )


def _hilbert_fold(cx: str, cy: str, order: int, sl, sr, bxor, land) -> tuple[str, str]:
    """Engine-agnostic Hilbert fold, state PACKED into one BIGINT:
    bits [0, order) = y, [order, 2*order) = x, [2*order, 4*order) = d —
    so ``order`` <= 15 (60 bits).  A struct accumulator would be the
    natural spelling, but DuckDB 1.0 mis-evaluates struct-lambda
    list_reduce under vectorized (multi-row) execution (off-by-one on a
    16/64 cell sample; single rows fold correctly) — the packed-integer
    fold sidesteps that and keeps both engines' arithmetic literally
    identical.  sl/sr/bxor/land are the engine spellings of shiftleft /
    shiftright / xor / bitwise-and."""
    half = 1 << (order - 1)
    mask = (1 << order) - 1
    x = land(sr("acc", order), mask)
    y = land("acc", mask)
    # the shifted 1 must be a BIGINT up front: s*s reaches 2^28, which
    # would overflow 32-bit INTEGER arithmetic in either engine
    s_ = sl("CAST(1 AS BIGINT)", "i")
    rx = f"(CASE WHEN ({land(x, s_)}) > 0 THEN 1 ELSE 0 END)"
    ry = f"(CASE WHEN ({land(y, s_)}) > 0 THEN 1 ELSE 0 END)"
    newd = f"({sr('acc', 2 * order)} + ({s_}) * ({s_}) * ({bxor(f'(3 * {rx})', ry)}))"
    # reflection about the FULL grid (n-1-v, canonical Hilbert rotation):
    # the per-level (s-1-v) variant produces NEGATIVE intermediates when
    # v >= s, which the packed representation cannot hold (and DuckDB
    # refuses to left-shift); n-1-v keeps state in [0, n) at every level
    n1 = (1 << order) - 1
    newx = (
        f"(CASE WHEN {ry} = 1 THEN ({x}) "
        f"WHEN {rx} = 1 THEN {n1} - ({y}) ELSE ({y}) END)"
    )
    newy = (
        f"(CASE WHEN {ry} = 1 THEN ({y}) "
        f"WHEN {rx} = 1 THEN {n1} - ({x}) ELSE ({x}) END)"
    )
    step = f"({sl(newd, 2 * order)} + {sl(newx, order)} + {newy})"
    init = f"({sl(f'(CAST({cx} AS BIGINT) + {half})', order)} + (CAST({cy} AS BIGINT) + {half}))"
    return init, step


def hilbert_key(cx: str, cy: str, order: int = 15) -> Column:
    """Hilbert-curve index of two cell indices (order bits per axis) —
    the locality-tighter alternative to :func:`zorder_key`: successive
    Hilbert cells are always GRID-ADJACENT (Morton jumps at quadrant
    boundaries), so range-partitioned files have no long seams.

    The classic per-level rotate/reflect walk runs as ONE ``aggregate``
    fold over the bit levels — pure JVM integer arithmetic inside
    whole-stage codegen, no UDF; the DuckDB oracle replays the identical
    fold (:func:`hilbert_key_duck`), so keys verify bit-for-bit.
    Negative indices are offset into the non-negative range first, as in
    ``zorder_key``; ``order`` <= 15 (the packed fold uses 4*order bits).
    """
    if order > 15:
        raise ValueError("packed fold supports order <= 15")
    init, step = _hilbert_fold(
        cx, cy, order,
        sl=lambda a, b: f"shiftleft({a}, {b})",
        sr=lambda a, b: f"shiftright({a}, {b})",
        bxor=lambda a, b: f"({a} ^ {b})",
        land=lambda a, b: f"({a} & {b})",
    )
    return F.expr(
        f"shiftright(aggregate(sequence({order - 1}, 0, -1), CAST({init} AS BIGINT), "
        f"(acc, i) -> CAST({step} AS BIGINT)), {2 * order})"
    )


def hilbert_key_duck(cx: str, cy: str, order: int = 15) -> str:
    """DuckDB SQL with semantics identical to :func:`hilbert_key`."""
    if order > 15:
        raise ValueError("packed fold supports order <= 15")
    init, step = _hilbert_fold(
        cx, cy, order,
        sl=lambda a, b: f"({a} << CAST({b} AS INTEGER))",
        sr=lambda a, b: f"({a} >> CAST({b} AS INTEGER))",
        bxor=lambda a, b: f"xor(CAST({a} AS BIGINT), CAST({b} AS BIGINT))",
        land=lambda a, b: f"({a} & {b})",
    )
    levels = ", ".join(f"CAST({i} AS BIGINT)" for i in range(order - 1, -1, -1))
    return (
        f"(list_reduce(list_prepend(CAST({init} AS BIGINT), [{levels}]), "
        f"(acc, i) -> CAST({step} AS BIGINT)) >> {2 * order})"
    )
