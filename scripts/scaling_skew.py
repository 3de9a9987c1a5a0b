"""Scaling evidence for skew handling: a measured hot-key join.

Synthetic fact table where ONE key owns `hot_frac` of all rows (the
"celebrity user" / null-surrogate shape that stalls real pipelines): the
straggler task processing the hot partition pins join wall-time to the
hot key's row count, while `plans.skew.salted_join` scatters it across
`salt` partitions.  AQE's skew-join optimizer (on in `session.py`) also
engages for sort-merge joins; the salted form is the explicit,
plan-time-deterministic variant that also covers broadcast-ineligible
aggregations.

    python scripts/scaling_skew.py [n_rows] [hot_frac] [salt]

Prints one JSON line (SCALE.md records a representative run).  The
grouped aggregation AFTER the join (per-key revenue) is where the skew
actually bites — a bare join followed by noop can hide stragglers behind
pipelining.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from agile_lakehouse_spark import get_session
from agile_lakehouse_spark.plans.skew import salted_join


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    hot_frac = float(sys.argv[2]) if len(sys.argv) > 2 else 0.5
    salt = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    spark = get_session("scaling-skew")
    spark.sparkContext.setLogLevel("ERROR")
    # disable auto-broadcast so the join actually shuffles (the small side
    # here is broadcast-sized; real skewed dimensions often are not)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    n_keys = 10_000
    # hash-threshold hot assignment: id % int(1/hot_frac) quantizes the
    # fraction coarsely and degenerates to 100%-hot for hot_frac > 0.5
    # (modulus truncates to 1) — a hash draw hits the target fraction for
    # ANY hot_frac in (0, 1)
    facts = spark.range(n).select(
        F.when(F.pmod(F.xxhash64(F.col("id") + 7), 1000) < int(hot_frac * 1000), F.lit(0))
        .otherwise(F.pmod(F.xxhash64("id"), n_keys))
        .alias("k"),
        (F.col("id") % 1000).alias("v"),
    ).persist()
    facts.count()
    dim = spark.range(n_keys).select(F.col("id").alias("dk"), (F.col("id") % 97).alias("grp"))

    t0 = time.time()
    plain = (
        facts.join(dim, facts["k"] == dim["dk"])
        .groupBy("grp")
        .agg(F.sum("v").alias("s"))
        .count()
    )
    plain_s = round(time.time() - t0, 2)

    t0 = time.time()
    salted = (
        salted_join(facts, dim, "k", "dk", salt=salt)
        .groupBy("grp")
        .agg(F.sum("v").alias("s"))
        .count()
    )
    salted_s = round(time.time() - t0, 2)
    assert plain == salted

    print(
        json.dumps(
            {
                "n_rows": n,
                "hot_frac": hot_frac,
                "salt": salt,
                "plain_join_s": plain_s,
                "salted_join_s": salted_s,
                "speedup": round(plain_s / salted_s, 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
