"""Scaling evidence: run the layout jobs + reference workload over a
SYNTHETIC point table far beyond fixture scale (default 20M points vs
sf0.1's 600k) to show throughput, not job-launch constants.

The table is generated distributed (spark.range + the same deterministic
arithmetic as the fixtures' points view — no driver data, no RNG), so
the experiment is reproducible anywhere:

    python scripts/scaling_run.py [n_points ...]

Prints one JSON line per scale with per-job seconds and derived
points/sec so runs at different N are directly comparable (SCALE.md
records representative numbers).
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
    """Deterministic synthetic cloud, FIXTURES.md §B shape: x/y/z in
    [0, 1000), importance = Knuth hash in [0, 1)."""
    return spark.range(n).select(
        F.col("id").alias("pid"),
        (((F.col("id") * 2654435761) % 1000000) / 1000.0).alias("x"),
        (((F.col("id") * 40503 + 7) % 1000000) / 1000.0).alias("y"),
        (((F.col("id") * 69069 + 13) % 1000000) / 1000.0).alias("z"),
        ((((F.col("id") + 1) * 2654435761) % 1048576) / 1048576.0).alias("i"),
    )


def run_scale(spark, n: int) -> dict:
    out: dict[str, float] = {}
    pts = synth_points(spark, n)
    tmp = tempfile.mkdtemp(prefix=f"scaling_{n}_")
    try:
        t0 = time.time()
        pts.write.mode("overwrite").parquet(f"{tmp}/convert")
        out["convert_s"] = round(time.time() - t0, 2)

        stored = spark.read.parquet(f"{tmp}/convert")
        t0 = time.time()
        layout.write_grid_layout(stored, f"{tmp}/grid", 100.0, 100.0)
        out["grid_s"] = round(time.time() - t0, 2)
        t0 = time.time()
        layout.write_quadtree_layout(stored, f"{tmp}/qt", depth=3, side=1024.0)
        out["quadtree_s"] = round(time.time() - t0, 2)

        # workload over the GRID layout (the reference benches post-layout)
        g = spark.read.parquet(f"{tmp}/grid")
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
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    out["n_points"] = n
    out["grid_pts_per_s"] = round(n / out["grid_s"])
    out["quadtree_pts_per_s"] = round(n / out["quadtree_s"])
    return out


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [600_000, 2_000_000, 20_000_000]
    spark = get_session("scaling")
    spark.sparkContext.setLogLevel("ERROR")
    for n in sizes:
        print(json.dumps(run_scale(spark, n)), flush=True)


if __name__ == "__main__":
    main()
