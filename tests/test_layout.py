"""Layout engine: count conservation across re-layouts + pruning benefit.

Mirrors the reference's cross-layout invariants (same seeded queries over
convert/grid/quadtree layouts must return identical counts —
pc-cli/examples/partition.rs:21-136) and the evaluation-style stats job.
"""

import math

import pytest
from pyspark.sql import functions as F

from agile_lakehouse_spark.operators import pointcloud as pc
from agile_lakehouse_spark.plans import layout
from agile_lakehouse_spark.sources.catalog import points_view


@pytest.fixture(scope="module")
def points(spark, sf_dir):
    return points_view(spark, sf_dir)


def test_derivations():
    # 2B points over 4 km² at default batch -> sensible positive numbers
    size = layout.derive_grid_size(count=2_000_000, area=4_000_000.0)
    assert size > 0
    assert layout.derive_quadtree_depth(524_288) == 0
    assert layout.derive_quadtree_depth(524_288 * 16) == 2
    assert layout.derive_quadtree_depth(100) == 0


def test_grid_layout_roundtrip(points, spark, tmp_path):
    dest = str(tmp_path / "grid")
    layout.write_grid_layout(points, dest, 200.0, 200.0)
    back = spark.read.parquet(dest)
    # count + content conservation (same multiset of pids)
    assert back.count() == points.count()
    assert back.select(F.sum("pid")).collect()[0][0] == points.select(F.sum("pid")).collect()[0][0]
    # identical query answers across layouts (the reference's invariant)
    box = {"x": (100.0, 400.0), "y": (200.0, 600.0)}
    assert pc.range_query(back, box).count() == pc.range_query(points, box).count()


def test_grid_layout_importance_slices(points, spark, tmp_path):
    dest = str(tmp_path / "grid8")
    layout.write_grid_layout(points, dest, 400.0, 400.0, importance_splits=8)
    back = spark.read.parquet(dest)
    assert back.count() == points.count()
    assert pc.sample(back, p=0.25).count() == pc.sample(points, p=0.25).count()


def test_quadtree_layout_partitions(points, spark, tmp_path):
    dest = str(tmp_path / "qt")
    layout.write_quadtree_layout(points, dest, depth=2, side=1024.0)
    back = spark.read.parquet(dest)
    assert back.count() == points.count()
    # level became a partition column -> level predicate prunes directories
    lv = back.filter(F.col("level") == 0)
    assert lv.count() == pc.quadtree_cells(points, 2, 1024.0).filter(F.col("level") == 0).count()


def test_layout_stats_tightness(points, spark, tmp_path):
    """Files written by the grid layout are tight in x/y (row group ≈ cell)."""
    dest = str(tmp_path / "grid_tight")
    # small max_records_per_file ≈ "row group = cell" at this tiny SF; the
    # z-sorted stream slices into contiguous (tight) files
    layout.write_grid_layout(points, dest, 250.0, 250.0, max_records_per_file=500)
    stats = layout.layout_stats(spark, dest, ["x", "y"]).collect()
    xmin = min(r["x_min"] for r in stats)
    xmax = max(r["x_max"] for r in stats)
    full_extent = xmax - xmin
    # average per-file x-extent must be far below the full extent
    avg_extent = sum(r["x_max"] - r["x_min"] for r in stats) / len(stats)
    assert avg_extent < full_extent * 0.6


def test_compact(points, spark, tmp_path):
    src = str(tmp_path / "many")
    points.repartition(16).write.parquet(src)
    dest = str(tmp_path / "one")
    layout.compact(spark, [src], dest, target_files=2)
    back = spark.read.parquet(dest)
    assert back.count() == points.count()
    files = {r[0] for r in back.select(F.input_file_name()).distinct().collect()}
    assert len(files) <= 2


def test_layout_pruning_benefit(points, spark, tmp_path):
    """Range queries on a z-ordered layout touch a small fraction of files."""
    dest = str(tmp_path / "grid_prune")
    layout.write_grid_layout(points, dest, 250.0, 250.0, max_records_per_file=400)
    back = spark.read.parquet(dest)
    total_files = back.select(F.input_file_name()).distinct().count()
    box = {"x": (100.0, 350.0), "y": (100.0, 350.0)}
    hit = pc.range_query(back, box)
    hit_files = hit.select(F.input_file_name()).distinct().count()
    assert hit.count() == pc.range_query(points, box).count()
    # spatial locality: the query's rows live in a minority of files
    assert hit_files < total_files * 0.5, (hit_files, total_files)


def test_zorder3_matches_python_model(spark):
    from pyspark.sql import functions as F

    from agile_lakehouse_spark.plans.layout import zorder_key3

    def model(x, y, z, bits=16):
        x, y, z = x + (1 << 15), y + (1 << 15), z + (1 << 15)
        out = 0
        for b in range(bits):
            out |= ((x >> b) & 1) << (3 * b)
            out |= ((y >> b) & 1) << (3 * b + 1)
            out |= ((z >> b) & 1) << (3 * b + 2)
        return out

    cells = [(-3, 5, 0), (0, 0, 0), (7, -2, 9), (1000, 999, -1000), (-32768, 32767, 1)]
    df = spark.createDataFrame(cells, "cx bigint, cy bigint, cz bigint")
    got = df.select(zorder_key3("cx", "cy", "cz").alias("k")).collect()
    assert [r.k for r in got] == [model(*c) for c in cells]


def test_zorder3_locality_beats_2d_for_z_slabs(spark):
    """A z-slab predicate over 3-D-clustered cells must touch a much
    smaller contiguous key span than under the 2-D key (where z is
    scattered across the whole range) — the property that makes the
    3-D variant worth its narrower per-axis budget."""
    from pyspark.sql import functions as F

    from agile_lakehouse_spark.plans.layout import zorder_key, zorder_key3

    n = 16
    cells = [(x, y, z) for x in range(n) for y in range(n) for z in range(n)]
    df = spark.createDataFrame(cells, "cx bigint, cy bigint, cz bigint")
    keyed = df.select(
        "cz",
        zorder_key3("cx", "cy", "cz").alias("k3"),
        zorder_key("cx", "cy").alias("k2"),
    )
    slab = keyed.filter(F.col("cz") == 3)
    full = keyed.agg(
        (F.max("k3") - F.min("k3")).alias("r3"), (F.max("k2") - F.min("k2")).alias("r2")
    ).collect()[0]
    got = slab.agg(
        (F.max("k3") - F.min("k3")).alias("r3"), (F.max("k2") - F.min("k2")).alias("r2")
    ).collect()[0]
    # 2-D key: the slab spans essentially the whole key range (z ignored);
    # 3-D key: the slab's span is a strict subset
    assert got.r2 == full.r2
    assert got.r3 < full.r3


def test_bucket_transform_hidden_partition_pruning(spark, tmp_path):
    """A key-equality lookup on a bucket-partitioned table reads one
    bucket directory (partition pruning), and bucket_of() computes the
    same bucket the writer assigned."""
    from agile_lakehouse_spark.plans.layout import bucket_of, bucket_transform, write_bucketed_by_key

    df = spark.range(2000).select(
        F.col("id").alias("k"), (F.col("id") * 3 % 97).alias("v")
    )
    dest = str(tmp_path / "bucketed")
    write_bucketed_by_key(df, dest, "k", 8)
    back = spark.read.parquet(dest)
    assert back.count() == 2000
    # reader-side: hidden-partition lookup = key predicate + derived bucket
    key = 777
    b = bucket_of(key, 8)
    hit = back.filter((F.col("bucket") == b) & (F.col("k") == key))
    rows = hit.collect()
    assert len(rows) == 1 and rows[0]["v"] == 777 * 3 % 97
    files = hit.select(F.input_file_name()).distinct().count()
    total = back.select(F.input_file_name()).distinct().count()
    assert files <= max(1, total // 8)
    # writer/reader agreement on every key, not just one
    mism = (
        df.select("k", bucket_transform("k", 8).alias("bw"))
        .join(back.select("k", F.col("bucket").cast("int").alias("br")), "k")
        .filter(F.col("bw") != F.col("br"))
        .count()
    )
    assert mism == 0


def test_truncate_transform_bins(spark):
    from agile_lakehouse_spark.plans.layout import truncate_int_transform, truncate_str_transform

    df = spark.createDataFrame(
        [(49999.50,), (50000.0,), (12.3,), (-0.5,)], "p double"
    ).select(truncate_int_transform("p", 50000).alias("bin"))
    assert [r["bin"] for r in df.collect()] == [0, 50000, 0, -50000]
    s = spark.createDataFrame([("5-LOW",), ("1-URGENT",)], "x string").select(
        truncate_str_transform("x", 1).alias("p")
    )
    assert [r["p"] for r in s.collect()] == ["5", "1"]


def _hilbert_model(order, x, y):
    n = 1 << order
    d = 0
    s = n >> 1
    while s > 0:
        rx = 1 if (x & s) else 0
        ry = 1 if (y & s) else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x, y = n - 1 - x, n - 1 - y
            x, y = y, x
        s >>= 1
    return d


def test_hilbert_matches_python_model(spark):
    from agile_lakehouse_spark.plans.layout import hilbert_key

    n, order = 16, 15
    half = 1 << (order - 1)
    df = spark.range(n * n).select(
        ((F.col("id") % n) - 5).alias("cx"), ((F.col("id") / n).cast("int") - 5).alias("cy")
    )
    out = df.withColumn("h", hilbert_key("cx", "cy", order)).collect()
    for r in out:
        assert r.h == _hilbert_model(order, r.cx + half, r.cy + half), (r.cx, r.cy)


def test_hilbert_is_a_true_space_filling_curve():
    """Bijection + the Hilbert guarantee: SUCCESSIVE keys are always
    grid-ADJACENT cells (Morton jumps at quadrant seams — that guarantee
    is exactly what distinguishes the two curves)."""
    for order in (2, 3, 4):
        n = 1 << order
        pos = {}
        for x in range(n):
            for y in range(n):
                d = _hilbert_model(order, x, y)
                assert d not in pos
                pos[d] = (x, y)
        assert len(pos) == n * n
        for i in range(n * n - 1):
            (x1, y1), (x2, y2) = pos[i], pos[i + 1]
            assert abs(x1 - x2) + abs(y1 - y2) == 1, (order, i)


def test_grid_layout_hilbert_curve_prunes(points, spark, tmp_path):
    """curve="hilbert" layouts conserve rows and keep range-query file
    locality at least as tight as the default."""
    dest = str(tmp_path / "grid_hil")
    layout.write_grid_layout(points, dest, 250.0, 250.0, max_records_per_file=400, curve="hilbert")
    back = spark.read.parquet(dest)
    assert back.count() == points.count()
    total_files = back.select(F.input_file_name()).distinct().count()
    box = {"x": (100.0, 350.0), "y": (100.0, 350.0)}
    hit = pc.range_query(back, box)
    assert hit.count() == pc.range_query(points, box).count()
    hit_files = hit.select(F.input_file_name()).distinct().count()
    assert hit_files < total_files * 0.5, (hit_files, total_files)


def test_lod_sweep_matches_naive_and_levels_complete(points, spark):
    """lod_sweep's one-plan aggregate must equal the naive per-level
    recomputation, and every level 0..depth must appear."""
    out = {r.level: r for r in pc.lod_sweep(points, depth=2, side=1024.0).collect()}
    assert sorted(out) == [0, 1, 2]
    cells = pc.quadtree_cells(points, 2, 1024.0)
    per_cell = cells.groupBy("level", "qx", "qy").count()
    for lv in (0, 1, 2):
        rows = per_cell.filter(F.col("level") == lv).collect()
        # depth 2: stride = max(4^l // 16, 1) = 1 -> every nonempty cell probed
        assert out[lv].n_cells == len(rows)
        assert out[lv].n_points == sum(r["count"] for r in rows)
        assert out[lv].max_cell_points == max(r["count"] for r in rows)


def test_lod_render_pruning_per_level(points, spark, tmp_path):
    """The layout's whole point (viz.rs:85-273): under the quadtree
    layout, a viewport render at level ℓ reads only the level-ℓ files
    whose footprint intersects the viewport — files-touched shrinks as
    the level drops, and every per-level probe touches a minority of
    that level's files; a flat convert layout forces every probe to
    read (nearly) every file."""
    import collections
    import glob
    import os

    import pyarrow.parquet as pq

    depth, side = 2, 1024.0
    dest = str(tmp_path / "qt_lod")
    layout.write_quadtree_layout(points, dest, depth=depth, side=side, max_records_per_file=400)

    # per-level parquet footer stats: (file, x_min, x_max, y_min, y_max)
    stats = collections.defaultdict(list)
    for f in glob.glob(os.path.join(dest, "level=*", "*.parquet")):
        lv = int(f.split("level=")[1].split(os.sep)[0])
        md = pq.ParquetFile(f).metadata
        cols = {md.schema.column(i).name: i for i in range(md.num_columns)}
        xmn = min(md.row_group(g).column(cols["x"]).statistics.min for g in range(md.num_row_groups))
        xmx = max(md.row_group(g).column(cols["x"]).statistics.max for g in range(md.num_row_groups))
        ymn = min(md.row_group(g).column(cols["y"]).statistics.min for g in range(md.num_row_groups))
        ymx = max(md.row_group(g).column(cols["y"]).statistics.max for g in range(md.num_row_groups))
        stats[lv].append((xmn, xmx, ymn, ymx))

    assert sorted(stats) == list(range(depth + 1))

    # viewport = one deepest-level cell around the data centroid
    cx, cy = points.agg(F.avg("x"), F.avg("y")).collect()[0]
    cell = side / 2**depth
    vx_lo, vy_lo = (cx // cell) * cell, (cy // cell) * cell
    vx_hi, vy_hi = vx_lo + cell, vy_lo + cell

    def touched(lv):
        return sum(
            1
            for (xmn, xmx, ymn, ymx) in stats[lv]
            if xmn < vx_hi and xmx >= vx_lo and ymn < vy_hi and ymx >= vy_lo
        )

    per_level = {lv: touched(lv) for lv in stats}
    totals = {lv: len(stats[lv]) for lv in stats}
    # each level's probe touches a minority of that level's files (levels
    # with a single file trivially touch it — require >1 file to assert)
    for lv in stats:
        if totals[lv] > 2:
            assert per_level[lv] < totals[lv], (lv, per_level, totals)
    # files-touched shrinks as the level drops: the cumulative render
    # cost of level ℓ (levels 0..ℓ over the viewport) is monotone in ℓ
    cum = [sum(per_level[k] for k in range(lv + 1)) for lv in range(depth + 1)]
    assert cum == sorted(cum)
    # and the FULL deepest render touches a minority of all files, while
    # the flat convert layout intersects the viewport with ~every file
    flat = str(tmp_path / "flat")
    points.repartition(8).write.parquet(flat)
    flat_touched = flat_total = 0
    for f in glob.glob(os.path.join(flat, "*.parquet")):
        md = pq.ParquetFile(f).metadata
        cols = {md.schema.column(i).name: i for i in range(md.num_columns)}
        xmn = min(md.row_group(g).column(cols["x"]).statistics.min for g in range(md.num_row_groups))
        xmx = max(md.row_group(g).column(cols["x"]).statistics.max for g in range(md.num_row_groups))
        ymn = min(md.row_group(g).column(cols["y"]).statistics.min for g in range(md.num_row_groups))
        ymx = max(md.row_group(g).column(cols["y"]).statistics.max for g in range(md.num_row_groups))
        flat_total += 1
        if xmn < vx_hi and xmx >= vx_lo and ymn < vy_hi and ymx >= vy_lo:
            flat_touched += 1
    assert flat_touched == flat_total  # random layout: no pruning at all
    assert cum[-1] / sum(totals.values()) < flat_touched / flat_total, (cum, totals)


def test_layout_hot_cell_splits_across_tasks(spark, tmp_path):
    """The round-7 banded-2B finding, pinned: when the input has FEWER
    distinct cells than requested range partitions (here: ONE cell),
    the coordinate tie-breaker partition key must still spread the
    rows across multiple write tasks — without it RangePartitioner
    collapses to one task per cell, which serialized 20M-row sorts and
    OOMed the 2B banded bands.  Output filenames encode the writing
    task's partition id (part-NNNNN-), so distinct prefixes count the
    non-empty tasks directly."""
    import glob
    import os
    import re

    n = 40_000
    pts = spark.range(n).select(
        F.col("id").alias("pid"),
        (10.0 + (F.col("id") % 1000) / 100.0).alias("x"),  # all in cell (0, 0)
        (20.0 + (F.col("id") % 997) / 100.0).alias("y"),
        F.lit(1.0).alias("z"),
        ((F.col("id") % 1024) / 1024.0).alias("i"),
    )
    dest = str(tmp_path / "hot_cell")
    layout.write_grid_layout(pts, dest, 400.0, 400.0, max_records_per_file=4000)
    tasks = {
        re.match(r"part-(\d+)-", os.path.basename(f)).group(1)
        for f in glob.glob(os.path.join(dest, "part-*.parquet"))
    }
    assert len(tasks) >= 2, f"hot cell collapsed to {len(tasks)} write task(s)"
    assert spark.read.parquet(dest).count() == n
