"""Scaling evidence for the bucketed (write-once-join-forever) layout.

Two synthetic fact tables joined on a shared key, three ways:

1. plain   — both sides shuffle on the key at every join (the default
             SortMergeJoin; auto-broadcast off, both sides are fact-sized);
2. bucket  — both sides pre-written with ``plans.bucketing.write_bucketed``
             (same bucket count, sorted buckets), then joined with ZERO
             Exchange and zero Sort; the write cost is reported separately
             because it is paid once and amortized over every later join;
3. rejoin  — the bucketed join run again, which is the steady state a
             100 TB pipeline actually lives in.

    python scripts/scaling_bucketed.py [n_left] [n_right] [buckets] [n_joins]

Prints one JSON line; SCALE.md records a representative run.  The grouped
aggregation after the join keeps Spark from hiding the shuffle behind
pipelining, same discipline as scaling_skew.py.
"""

from __future__ import annotations

import json
import shutil
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from agile_lakehouse_spark import get_session
from agile_lakehouse_spark.plans.bucketing import co_located_join, write_bucketed


def main() -> None:
    n_left = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    n_right = int(sys.argv[2]) if len(sys.argv) > 2 else 5_000_000
    buckets = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    n_joins = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    spark = get_session("scaling-bucketed")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    n_keys = n_right  # right side is unique on the key, left has ~n_left/n_keys fan-in
    left = spark.range(n_left).select(
        F.pmod(F.xxhash64("id"), n_keys).alias("k"), (F.col("id") % 1000).alias("v")
    )
    right = spark.range(n_right).select(
        F.col("id").alias("rk"), (F.col("id") % 97).alias("grp")
    )

    def joined_agg(l, r, lk, rk):
        return (
            l.join(r, l[lk] == r[rk])
            .groupBy("grp")
            .agg(F.sum("v").alias("sv"), F.count(F.lit(1)).alias("n"))
            .agg(F.sum("sv"), F.sum("n"))
            .collect()[0]
        )

    # 1. plain shuffle join, repeated — every repetition pays both shuffles
    t0 = time.time()
    for _ in range(n_joins):
        base = joined_agg(left, right, "k", "rk")
    plain_s = (time.time() - t0) / n_joins

    # 2. bucketed write (paid once) ...
    t0 = time.time()
    write_bucketed(left, "scb_left", ["k"], buckets, sort_cols=["k"])
    write_bucketed(right, "scb_right", ["rk"], buckets, sort_cols=["rk"])
    write_s = time.time() - t0

    try:
        # ... then the co-located join, repeated — no Exchange on either side
        t0 = time.time()
        for _ in range(n_joins):
            got = joined_agg(
                spark.table("scb_left"), spark.table("scb_right"), "k", "rk"
            )
        bucket_s = (time.time() - t0) / n_joins
        assert tuple(base) == tuple(got), (base, got)
        plan = co_located_join(
            spark, "scb_left", "scb_right", "k", "rk", force_sort_merge=True
        )._jdf.queryExecution().executedPlan().toString()
        n_exchanges = plan.count("Exchange")
    finally:
        wh = spark.conf.get("spark.sql.warehouse.dir", "")
        spark.sql("DROP TABLE IF EXISTS scb_left")
        spark.sql("DROP TABLE IF EXISTS scb_right")
        for t in ("scb_left", "scb_right"):  # saveAsTable leaves dirs on some drops
            shutil.rmtree(f"{wh.removeprefix('file:')}/{t}", ignore_errors=True)

    print(
        json.dumps(
            {
                "n_left": n_left,
                "n_right": n_right,
                "buckets": buckets,
                "n_joins": n_joins,
                "plain_join_s": round(plain_s, 2),
                "bucketed_write_s": round(write_s, 2),
                "bucketed_join_s": round(bucket_s, 2),
                "join_exchanges_in_plan": n_exchanges,
                "breakeven_joins": round(
                    write_s / max(plain_s - bucket_s, 1e-9), 1
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
