"""Incremental minhash dedup vs re-running the batch pipeline, at scale.

The claim behind `dedup.minhash_incremental_pairs`: when yesterday's
corpus is present as its stored signature table, matching today's batch
costs O(batch) shingling plus a band-key join against the signature
stream — while the honest alternative (re-run `minhash_near_dup` on the
union) re-shingles and re-self-joins the whole corpus.  This script
measures both on the scaling_dedup synthetic corpus with a 5% batch and
asserts pair-for-pair agreement (order-free xor checksum on the pairs
touching the batch):

    SPARK_DRIVER_MEMORY=64g python scripts/scaling_incremental.py [n_docs ...]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from agile_lakehouse_spark.operators import dedup
from agile_lakehouse_spark import get_session
from scripts.scaling_dedup import synth_docs


def _checksum(df):
    return df.select(F.xxhash64("id_a", "id_b", "est_jaccard").alias("h")).select(
        F.expr("bit_xor(h)").alias("s"), F.count(F.lit(1)).alias("n")
    ).first()


def run_scale(spark, n: int) -> dict:
    out: dict[str, object] = {"n_docs": n, "batch_frac": 0.05}
    docs = synth_docs(spark, n).persist()
    docs.count()
    old = docs.filter(F.col("doc_id") % 20 != 0)
    new = docs.filter(F.col("doc_id") % 20 == 0)

    # one-time corpus index build (amortized across every future batch)
    t0 = time.time()
    sigs = dedup.minhash_signatures(old, k=5).persist()
    sigs.count()
    out["index_build_s"] = round(time.time() - t0, 2)

    t0 = time.time()
    inc = dedup.minhash_incremental_pairs(new, sigs, k=5, threshold=0.5)
    ci = _checksum(inc)
    out["incremental_s"] = round(time.time() - t0, 2)
    out["incremental_pairs"] = ci.n

    t0 = time.time()
    batch = dedup.minhash_near_dup(docs, k=5, threshold=0.5).filter(
        (F.col("id_a") % 20 == 0) | (F.col("id_b") % 20 == 0)
    )
    cb = _checksum(batch)
    out["batch_rerun_s"] = round(time.time() - t0, 2)
    assert (ci.s, ci.n) == (cb.s, cb.n), (ci, cb)
    out["agree"] = True
    out["speedup_vs_rerun"] = round(out["batch_rerun_s"] / max(out["incremental_s"], 0.01), 2)
    sigs.unpersist()
    docs.unpersist()
    return out


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [200_000, 1_000_000]
    spark = get_session("scaling-incremental")
    spark.sparkContext.setLogLevel("ERROR")
    for n in sizes:
        print(json.dumps(run_scale(spark, n)), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
