"""Incremental curation ingest vs re-running the batch pipeline, at scale.

The claim behind `pipeline.curate_corpus_incremental` (round 9, the
end-to-end wiring of the incremental-dedup trio): with yesterday's
corpus present as its persisted state (normalized-fingerprint store +
MinHash signature store), ingesting today's 5% batch costs O(batch)
quality/normalize/shingle work plus key joins against the stores —
while the honest alternative re-runs `curate_corpus` over the union,
re-scoring and re-shingling the whole corpus.  This script measures
both on the scaling_dedup synthetic corpus (batch = the top 5% of the
id range, so ids increase across batches as the equivalence contract
requires) and asserts survivor-for-survivor agreement on the batch ids
(order-free xor checksum):

    SPARK_DRIVER_MEMORY=64g python scripts/scaling_curate.py [n_docs ...]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from agile_lakehouse_spark import get_session
from agile_lakehouse_spark.operators.pipeline import (
    curate_corpus,
    curate_corpus_incremental,
)
from scripts.scaling_dedup import synth_docs


def _checksum(df, col="doc_id"):
    return df.select(F.xxhash64(col).alias("h")).select(
        F.expr("bit_xor(h)").alias("s"), F.count(F.lit(1)).alias("n")
    ).first()


def run_scale(spark, n: int) -> dict:
    out: dict[str, object] = {"n_docs": n, "batch_frac": 0.05}
    docs = synth_docs(spark, n).persist()
    docs.count()
    cut = int(n * 0.95)
    old = docs.filter(F.col("doc_id") < cut)
    new = docs.filter(F.col("doc_id") >= cut)
    # held-out benchmark split: every 500th doc's text under fresh ids —
    # shares 8-grams with its train twin, so decontamination has real work
    test = docs.filter(F.col("doc_id") % 500 == 7).select(
        (F.col("doc_id") + 2 * n).alias("doc_id"), "text"
    )

    # one-time state build over the existing corpus (amortized across
    # every future batch; a production pipeline reads it from a table)
    caches: list = []
    t0 = time.time()
    out0, state = curate_corpus_incremental(old, test, None, caches=caches)
    state = {k: v.persist() for k, v in state.items()}
    c_old = _checksum(out0)
    for v in state.values():
        v.count()
    out["state_build_s"] = round(time.time() - t0, 2)
    out["old_survivors"] = c_old.n

    t0 = time.time()
    out1, _ = curate_corpus_incremental(new, test, state, caches=caches)
    ci = _checksum(out1)
    out["incremental_s"] = round(time.time() - t0, 2)
    out["batch_survivors"] = ci.n

    # the honest alternative: re-run the whole batch pipeline on the union
    full = docs.withColumn("source", F.lit("train")).unionByName(
        test.withColumn("source", F.lit("src0"))
    )
    t0 = time.time()
    rerun = curate_corpus(full).filter(F.col("doc_id") >= cut)
    cb = _checksum(rerun)
    out["batch_rerun_s"] = round(time.time() - t0, 2)
    assert (ci.s, ci.n) == (cb.s, cb.n), (ci, cb)
    out["agree"] = True
    out["speedup_vs_rerun"] = round(
        out["batch_rerun_s"] / max(out["incremental_s"], 0.01), 2
    )
    for v in state.values():
        v.unpersist()
    for c in caches:
        c.unpersist()
    docs.unpersist()
    return out


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [200_000, 1_000_000]
    spark = get_session("scaling-curate")
    spark.sparkContext.setLogLevel("ERROR")
    for nn in sizes:
        print(json.dumps(run_scale(spark, nn)), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
