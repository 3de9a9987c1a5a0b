"""Incremental embedding matching vs re-running the batch near-dup, at scale.

The semantic member of the incremental-dedup trio
(`similarity.embedding_match`): with yesterday's corpus stored as
(cell, id, vector) — the state `embedding_store_update` maintains —
matching today's 5% batch runs a bipartite new-x-stored gram sieve per
shared cell plus the batch's own within-batch near-dup; the corpus-vs-
corpus pair join never runs.  The honest alternative re-runs
`embedding_near_dup` on the union.  Both are measured on a deterministic
synthetic vector corpus with planted cross-boundary duplicates, and
pair-for-pair agreement (order-free xor checksum over the pairs touching
the batch) is asserted at every rung:

    SPARK_DRIVER_MEMORY=64g python scripts/scaling_embedding_incr.py [n ...]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from agile_lakehouse_spark import get_session
from agile_lakehouse_spark.operators import similarity as S

DIM = 64
CELLS = 256
THR = 0.9


def synth_vectors(spark, n: int):
    """Deterministic corpus: vector t-th coord = hash(seed, t) in [-1, 1).
    Ids i with i % 50 == 1 reuse seed i-1 scaled by 2 (cosine exactly 1 —
    a guaranteed near-dup pair per 50 vectors, sharing the seed's cell)."""
    base = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.when(F.col("id") % 50 == 1, F.col("id") - 1).otherwise(F.col("id")).alias("seed"),
        F.when(F.col("id") % 50 == 1, F.lit(2.0)).otherwise(F.lit(1.0)).alias("scale"),
    )
    coords = (
        f"transform(sequence(1, {DIM}), "
        "t -> scale * (CAST(pmod(xxhash64(seed, t), 2000) AS DOUBLE) / 1000.0 - 1.0))"
    )
    return base.select(
        "vec_id",
        F.expr(f"CAST(pmod(xxhash64(seed), {CELLS}) AS INT)").alias("cell"),
        F.expr(coords).alias("embedding"),
    )


def _checksum(df):
    return df.select(F.xxhash64("id_a", "id_b", "cos").alias("h")).select(
        F.expr("bit_xor(h)").alias("s"), F.count(F.lit(1)).alias("n")
    ).first()


def run_scale(spark, n: int) -> dict:
    out: dict[str, object] = {"n_vectors": n, "dim": DIM, "batch_frac": 0.05}
    vecs = synth_vectors(spark, n).persist()
    vecs.count()
    cut = int(n * 0.95)
    old = vecs.filter(F.col("vec_id") < cut)
    new = vecs.filter(F.col("vec_id") >= cut)

    # one-time store materialization (a production pipeline reads the
    # cell-partitioned table embedding_store_update maintains)
    t0 = time.time()
    store = old.persist()
    store.count()
    out["store_build_s"] = round(time.time() - t0, 2)

    t0 = time.time()
    cross = S.embedding_match(new, store, THR).select(
        F.col("match_id").alias("id_a"), F.col("vec_id").alias("id_b"), "cos"
    )  # new ids are greater, so (old, new) is already (id_a, id_b) order
    within = S.embedding_near_dup(new, THR, block_col="cell")
    inc = cross.unionByName(within)
    ci = _checksum(inc)
    out["incremental_s"] = round(time.time() - t0, 2)
    out["incremental_pairs"] = ci.n

    t0 = time.time()
    batch = S.embedding_near_dup(vecs, THR, block_col="cell").filter(
        (F.col("id_a") >= cut) | (F.col("id_b") >= cut)
    )
    cb = _checksum(batch)
    out["batch_rerun_s"] = round(time.time() - t0, 2)
    assert (ci.s, ci.n) == (cb.s, cb.n), (ci, cb)
    out["agree"] = True
    out["speedup_vs_rerun"] = round(
        out["batch_rerun_s"] / max(out["incremental_s"], 0.01), 2
    )
    store.unpersist()
    vecs.unpersist()
    return out


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [200_000, 1_000_000]
    spark = get_session("scaling-embedding-incr")
    spark.sparkContext.setLogLevel("ERROR")
    for nn in sizes:
        print(json.dumps(run_scale(spark, nn)), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
