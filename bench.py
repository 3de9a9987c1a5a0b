"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {"q": sec, ...}, "sf": <sf>}

Query set mirrors the reference's benchmark workload
(``pc-cli/src/benchmark.rs:95-265``: rect/circle/sampling/kNN/count/bounds)
plus the engine's headline relational and LLM-pipeline operators.  Each
query executes fully (noop sink / driver-side count for aggregates) so
timings measure scan+compute, not result transfer.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from agile_lakehouse_spark import declared, get_session  # noqa: E402

BENCH_QUERIES = [
    "dq01_pc_scan_count",
    "dq03_pc_bounds",
    "dq05_pc_rect_count",
    "dq06_pc_circle",
    "dq07_pc_sample",
    "dq08_pc_knn",
    "dq24_pc_grid_cells",
    "dq24b_pc_quadtree_cells",
    "dq09_groupby_agg",
    "dq11_multiway_join",
    "dq15_window_rank",
    "dq20_time_bucket",
    "dq21_dedup_exact",
    "dq21b_dedup_minhash",
    "dq21c_dedup_simhash",
    "dq22_ann_topk",
    "dq23_text_stats",
    "dq23c_quality_score",
]


def execute_fully(df) -> int:
    """Run the whole plan without shipping rows to the driver."""
    df.write.format("noop").mode("overwrite").save()
    return 0


def layout_jobs(spark, sf_dir: str, timings: dict[str, float]) -> None:
    """Layout-pipeline timings comparable to BASELINE.md's partition rows
    (convert/grid/quadtree — pc-cli/examples/partition.rs)."""
    import shutil
    import tempfile

    from agile_lakehouse_spark.plans import layout
    from agile_lakehouse_spark.sources.catalog import points_view

    tmp = tempfile.mkdtemp(prefix="bench_layout_")
    try:
        pts = points_view(spark, sf_dir)
        t0 = time.time()
        pts.write.mode("overwrite").parquet(f"{tmp}/convert")
        timings["layout_convert"] = round(time.time() - t0, 3)
        t0 = time.time()
        layout.write_grid_layout(pts, f"{tmp}/grid1", 100.0, 100.0)
        timings["layout_grid1"] = round(time.time() - t0, 3)
        t0 = time.time()
        layout.write_grid_layout(pts, f"{tmp}/grid8", 100.0, 100.0, importance_splits=8)
        timings["layout_grid8"] = round(time.time() - t0, 3)
        t0 = time.time()
        layout.write_quadtree_layout(pts, f"{tmp}/qt", depth=2, side=1024.0)
        timings["layout_quadtree"] = round(time.time() - t0, 3)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    spark = get_session("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM + file metadata once (reference benches also run against
    # a warmed session; JIT/codegen noise would otherwise dominate query 1)
    for t in ("lineitem", "orders", "documents", "embeddings", "events"):
        spark.read.parquet(f"{sf_dir}/{t}.parquet").count()

    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        fn = declared.SPARK_QUERIES[name]
        t0 = time.time()
        execute_fully(fn(spark, sf_dir))
        timings[name] = round(time.time() - t0, 3)

    layout_jobs(spark, sf_dir, timings)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "bench_suite_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
