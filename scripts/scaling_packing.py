"""Two-phase pack_sequences vs the global cumsum window, at scale.

pack_sequences' round-8 claim: the id-order cumsum decomposes into
quantile id-range buckets + a driver prefix-sum + bucket-local windows,
so no task ever sorts more than ~1/n_buckets of the corpus — while the
global window (`n_buckets=1`, the declared oracle twin) funnels
EVERYTHING through one task.  This script measures both shapes on the
scaling_dedup synthetic corpus and asserts the outputs agree bin-for-bin
(checksum of (doc_id, bin), not a driver collect):

    SPARK_DRIVER_MEMORY=64g python scripts/scaling_packing.py [n_docs ...]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from agile_lakehouse_spark import get_session
from agile_lakehouse_spark.operators.text import pack_sequences
from scripts.scaling_dedup import synth_docs


def _checksum(df):
    """Order-insensitive exact fingerprint: xor-fold of xxhash64 rows."""
    return df.select(F.xxhash64("doc_id", "n_tokens", "bin").alias("h")).select(
        F.expr("bit_xor(h)").alias("s"),  # xor never overflows, order-free
        F.count(F.lit(1)).alias("n"),
    ).first()


def run_scale(spark, n: int, with_global: bool) -> dict:
    out: dict[str, object] = {"n_docs": n}
    docs = synth_docs(spark, n).persist()
    docs.count()

    t0 = time.time()
    caches: list = []
    two = pack_sequences(docs, capacity=2048, n_buckets=256, caches=caches)
    c2 = _checksum(two)
    out["two_phase_s"] = round(time.time() - t0, 2)
    out["docs_per_s_two_phase"] = round(n / out["two_phase_s"])
    [c.unpersist() for c in caches]

    if with_global:
        t0 = time.time()
        c1 = _checksum(pack_sequences(docs, capacity=2048, n_buckets=1))
        out["global_window_s"] = round(time.time() - t0, 2)
        assert (c1.s, c1.n) == (c2.s, c2.n), (c1, c2)
        out["agree"] = True
    docs.unpersist()
    return out


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    # the global window at >=10M is exactly the single-task funnel the
    # two-phase form removes; skip it past the comparison decade unless
    # explicitly asked so the ladder's top rung doesn't take an hour
    global_cap = 5_000_000
    for a in sys.argv[1:]:
        if a.startswith("--global-cap="):
            global_cap = int(a.split("=", 1)[1])
    sizes = [int(a) for a in args] or [500_000, 2_000_000]
    spark = get_session("scaling-packing")
    spark.sparkContext.setLogLevel("ERROR")
    for n in sizes:
        print(json.dumps(run_scale(spark, n, with_global=n <= global_cap)), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
