"""Attribute the quadtree-vs-grid layout gap (round-7 verdict task 8).

At the reference's 2 B decade the banded grid(1) layout ran 1.33x the
reference's number while banded quadtree ran 1.57x — this script breaks
the quadtree job into its candidate costs at a cheaper decade so the
delta can be attributed before touching the writer:

  A. cell-ASSIGNMENT cost, isolated (noop sink, no shuffle/write):
     - grid_cells        (two fixed-delta floors)
     - quadtree_cells    (CASE level chain + per-row pow(2, level) x2)
     - quadtree_cells with the pow replaced by a 4-literal array lookup
  B. full WRITE variants (shuffle + sort + parquet):
     - write_quadtree_layout as shipped (partitionBy(level))
     - same plan without partitionBy (single dir, level as a column)
     - grid(100) reference point

    python scripts/profile_quadtree_gap.py [n_points ...]   # default 200M

Prints one JSON line per scale.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from agile_lakehouse_spark import get_session
from agile_lakehouse_spark.operators import pointcloud as pc
from agile_lakehouse_spark.plans import layout
from scripts.scaling_layout_big import synth_points


def quadtree_cells_lookup(df, depth: int, side: float):
    """quadtree_cells with the per-row pow(2.0, level) replaced by an
    element_at over depth+1 precomputed reciprocal cell sizes; floor on
    a multiply instead of a divide.  Semantics identical (powers of two
    are exact in double)."""
    total = sum(4**lv for lv in range(depth + 1))
    cum = 0
    cuts = []
    for lv in range(depth + 1):
        cum += 4**lv
        cuts.append((lv, cum / total))
    level_expr = F.lit(depth)
    for lv, cut in reversed(cuts[:-1]):
        level_expr = F.when(F.col("i") < F.lit(cut), F.lit(lv)).otherwise(level_expr)
    out = df.withColumn("level", level_expr.cast("int"))
    inv = F.array(*[F.lit(float(2**lv) / side) for lv in range(depth + 1)])
    out = out.withColumn("_inv", F.element_at(inv, F.col("level") + 1))
    out = out.withColumn("qx", F.floor(F.col("x") * F.col("_inv")).cast("bigint"))
    out = out.withColumn("qy", F.floor(F.col("y") * F.col("_inv")).cast("bigint"))
    return out.drop("_inv")


def _noop(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return round(time.time() - t0, 2)


def run(spark, n: int) -> dict:
    out: dict[str, object] = {"n_points": n}
    tmp = tempfile.mkdtemp(prefix=f"qtgap_{n}_")
    try:
        synth_points(spark, n).write.mode("overwrite").parquet(f"{tmp}/convert")
        stored = spark.read.parquet(f"{tmp}/convert")

        # A: assignment-only (warm each shape once, then time)
        for probe, name in (
            (lambda: pc.grid_cells(stored, {"x": 100.0, "y": 100.0}), "assign_grid_s"),
            (lambda: pc.quadtree_cells(stored, 3, 1024.0), "assign_qt_pow_s"),
            (lambda: quadtree_cells_lookup(stored, 3, 1024.0), "assign_qt_lookup_s"),
        ):
            _noop(probe())
            out[name] = _noop(probe())

        # sanity: lookup variant assigns identical cells
        mismatch = (
            pc.quadtree_cells(stored, 3, 1024.0)
            .select("pid", "level", "qx", "qy")
            .exceptAll(
                quadtree_cells_lookup(stored, 3, 1024.0).select(
                    "pid", "level", "qx", "qy"
                )
            )
            .count()
        )
        assert mismatch == 0, f"lookup variant diverged on {mismatch} rows"

        # B: write variants
        t0 = time.time()
        layout.write_quadtree_layout(stored, f"{tmp}/qt", depth=3, side=1024.0)
        out["write_qt_partitionby_s"] = round(time.time() - t0, 2)
        shutil.rmtree(f"{tmp}/qt", ignore_errors=True)

        cells = pc.quadtree_cells(stored, 3, 1024.0).withColumn(
            "zkey", layout.zorder_key("qx", "qy")
        )
        nparts = layout._layout_partitions(stored, layout.DEFAULT_BATCH_SIZE)

        def write_variant(name, sort_keys, partition_by):
            t0 = time.time()
            w = (
                cells.repartitionByRange(nparts, "level", "zkey")
                .sortWithinPartitions(*sort_keys)
                .drop("zkey")
                .write.mode("overwrite")
                .option("maxRecordsPerFile", layout.DEFAULT_BATCH_SIZE)
            )
            if partition_by:
                w = w.partitionBy("level")
            w.parquet(f"{tmp}/qt_v")
            out[name] = round(time.time() - t0, 2)
            shutil.rmtree(f"{tmp}/qt_v", ignore_errors=True)

        # flat + full (level, zkey, i) sort: isolates partitionBy
        write_variant("write_qt_flat_s", ["level", "zkey", "i"], False)
        # drop the trailing importance sort key: isolates the random-
        # double per-cell sort (zkey is near-constant per task, i is not)
        write_variant("write_qt_flat_nosorti_s", ["level", "zkey"], False)
        write_variant("write_qt_partitionby_nosorti_s", ["level", "zkey"], True)

        t0 = time.time()
        layout.write_grid_layout(stored, f"{tmp}/grid", 100.0, 100.0)
        out["write_grid_s"] = round(time.time() - t0, 2)
        shutil.rmtree(f"{tmp}/grid", ignore_errors=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return out


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [200_000_000]
    spark = get_session("qtgap")
    spark.sparkContext.setLogLevel("ERROR")
    for n in sizes:
        print(json.dumps(run(spark, n)), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
