"""Attribute the r12 dq148 driver-artifact swing (VERDICT r12 item 1).

The round-12 driver bench recorded dq148 (batch SemDeDup) at 12.98 s while
the same-round sidecar measured 5.72 +/- 0.28 s on untouched code — a
2.28x swing beyond the recorded noise band, in a run whose canary was
healthy.  Hypotheses: (a) the gram sieve silently fell back to the
distributed pair join, (b) an AQE/broadcast flip, (c) driver-window
contention invisible to the start-of-suite canary.

This script runs dq148 N times in ONE fresh session with the round-13
sieve-path marker enabled (``similarity.SIEVE_PATH_LOG``), bracketing
each rep with the dq01 canary so a mid-session stall is attributable
per-rep, and prints one JSON line.  Run it in (at least) two separate
sessions; if the path marker is identical across all reps/sessions while
the timing is bimodal, the plan choice is exonerated and the swing is
environmental.

Usage: python scripts/measure_dq148.py [n_reps] [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from agile_lakehouse_spark import declared, get_session  # noqa: E402
from agile_lakehouse_spark.operators import similarity  # noqa: E402
from bench import execute_fully  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "8g")
    spark = get_session("measure-dq148")
    spark.sparkContext.setLogLevel("ERROR")
    fn = declared.SPARK_QUERIES["dq148_semantic_dedup"]
    canary_fn = declared.SPARK_QUERIES["dq01_pc_scan_count"]

    # same warmup discipline as bench.py: page cache + Python workers +
    # one unrecorded plan/codegen run at the measured SF
    spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    spark.createDataFrame([(0, 1.0)], "k int, v double").groupBy("k").applyInPandas(
        lambda p: p, schema="k int, v double"
    ).count()
    execute_fully(canary_fn(spark, sf_dir))
    execute_fully(fn(spark, sf_dir))

    similarity.SIEVE_PATH_LOG = []
    reps = []
    for _ in range(n):
        t0 = time.time()
        execute_fully(canary_fn(spark, sf_dir))
        canary = time.time() - t0
        before = len(similarity.SIEVE_PATH_LOG)
        t0 = time.time()
        execute_fully(fn(spark, sf_dir))
        dt = time.time() - t0
        reps.append(
            {
                "dq148_s": round(dt, 3),
                "canary_s": round(canary, 3),
                "paths": similarity.SIEVE_PATH_LOG[before:],
            }
        )
    times = sorted(r["dq148_s"] for r in reps)
    out = {
        "metric": "dq148_path_attribution",
        "sf_dir": sf_dir,
        "n": n,
        "median_s": times[len(times) // 2],
        "min_s": times[0],
        "max_s": times[-1],
        "reps": reps,
        "distinct_paths": sorted(
            {json.dumps(p, sort_keys=True) for r in reps for p in r["paths"]}
        ),
    }
    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
