"""Layout-engine parity at the reference's second dataset decade.

The reference publishes two scales (``pc-cli/examples/partition.rs:7-19``,
BASELINE.md): 200M points (AHN4 C_69AZ1 — matched in round 3: grid(1)
44-61 s vs 46.0 s) and 2B points (AHN3 Delft: grid(1) 375.6 s, quadtree
398.2 s).  2B does not fit this sandbox's disk (3 copies x ~40 B/pt =
~240 GB vs ~80 GB free), so this script brackets the missing decade at
500M-1B with SEQUENTIAL lifecycle management — each layout is measured,
validated, then deleted before the next starts, so peak usage is
convert + one layout (~2 copies):

    python scripts/scaling_layout_big.py [n_points ...]

Prints one JSON line per scale.  Workload runs against the grid layout
BEFORE it is deleted (the convert-then-query discipline the engine
advocates).  Count conservation asserts each layout lost/duplicated
nothing — the reference's own cross-layout invariant
(``pc-cli/examples/partition.rs:21-136``).
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


def synth_points(spark, n: int):
    """Deterministic synthetic cloud, FIXTURES.md §B shape (same as
    scaling_run.py): x/y/z in [0, 1000), importance in [0, 1)."""
    return spark.range(n).select(
        F.col("id").alias("pid"),
        (((F.col("id") * 2654435761) % 1000000) / 1000.0).alias("x"),
        (((F.col("id") * 40503 + 7) % 1000000) / 1000.0).alias("y"),
        (((F.col("id") * 69069 + 13) % 1000000) / 1000.0).alias("z"),
        ((((F.col("id") + 1) * 2654435761) % 1048576) / 1048576.0).alias("i"),
    )


def run_scale(spark, n: int) -> dict:
    out: dict[str, object] = {"n_points": n}
    tmp = tempfile.mkdtemp(prefix=f"big_layout_{n}_")
    try:
        t0 = time.time()
        synth_points(spark, n).write.mode("overwrite").parquet(f"{tmp}/convert")
        out["convert_s"] = round(time.time() - t0, 2)
        stored = spark.read.parquet(f"{tmp}/convert")

        t0 = time.time()
        layout.write_grid_layout(stored, f"{tmp}/grid", 100.0, 100.0)
        out["grid_s"] = round(time.time() - t0, 2)
        g = spark.read.parquet(f"{tmp}/grid")
        assert g.count() == n, "grid layout lost rows"

        # reference workload over the layout while it exists
        t0 = time.time()
        for k in range(5):
            cx, cy = 100.0 + 160 * k, 80.0 + 150 * k
            pc.range_query(
                g, {"x": (cx, cx + 70.0), "y": (cy, cy + 70.0)}, importance_col="i"
            ).write.format("noop").mode("overwrite").save()
        out["rect_x5_s"] = round(time.time() - t0, 2)
        t0 = time.time()
        for k in range(5):
            cx, cy = 150.0 + 150 * k, 120.0 + 140 * k
            pc.knn(g, cx, cy, 1000).write.format("noop").mode("overwrite").save()
        out["knn_x5_s"] = round(time.time() - t0, 2)
        shutil.rmtree(f"{tmp}/grid", ignore_errors=True)

        t0 = time.time()
        layout.write_quadtree_layout(stored, f"{tmp}/qt", depth=3, side=1024.0)
        out["quadtree_s"] = round(time.time() - t0, 2)
        assert spark.read.parquet(f"{tmp}/qt").count() == n, "quadtree layout lost rows"
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    out["grid_pts_per_s"] = round(n / out["grid_s"])
    out["quadtree_pts_per_s"] = round(n / out["quadtree_s"])
    return out


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [500_000_000]
    spark = get_session("scaling-big-layout")
    spark.sparkContext.setLogLevel("ERROR")
    for n in sizes:
        print(json.dumps(run_scale(spark, n)), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
