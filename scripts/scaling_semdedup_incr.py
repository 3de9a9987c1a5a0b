"""Incremental SemDeDup vs re-running the batch operator, at scale.

The cluster-level member of the incremental-dedup family
(`similarity.semantic_dedup_update`): with yesterday's corpus stored as
(cell, id, vector) plus the current (id, cell, grp, kept) assignment
table, folding today's 5% batch re-solves ONLY the batch's dirty cells
(bipartite new-x-stored gram sieve + within-batch pairs + one structural
id->grp edge per old dirty-cell member); clean cells pass through
untouched.  The honest alternative re-runs `semantic_dedup` on the
union.  Both run in PRE-ASSIGNED mode (centroids=None, the write-time
layout shape both docstrings mandate at scale), so the ladder measures
the dedup work itself, not the ingest-time m-way argmax both sides
would share.  Assignment equality (order-free xor checksum over
(id, cell, grp, kept)) is asserted at every rung:

    SPARK_DRIVER_MEMORY=64g python scripts/scaling_semdedup_incr.py [n ...]
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
THR = 0.9
BATCH_FRAC = 0.05


def synth_vectors(spark, n: int, cells: int):
    """Deterministic corpus (scaling_embedding_incr.py's shape): vector
    t-th coord = hash(seed, t) in [-1, 1).  Ids i with i % 50 == 1 reuse
    seed i-1 scaled by 2 (cosine exactly 1 — a guaranteed near-dup pair
    per 50 vectors, sharing the seed's cell), so ~1% of the batch's
    pairs cross the store boundary and groups must MERGE."""
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
        F.expr(f"CAST(pmod(xxhash64(seed), {cells}) AS BIGINT)").alias("cell"),
        F.expr(coords).alias("embedding"),
    )


def _checksum(assign):
    return assign.select(
        F.xxhash64("vec_id", "cell", "grp", "kept").alias("h")
    ).select(F.expr("bit_xor(h)").alias("s"), F.count(F.lit(1)).alias("n")).first()


def run_scale(spark, n: int) -> dict:
    # cells sized so the per-cell population stays inside one gram-sieve
    # block (the embedding_near_dup memory model) at every rung
    cells = max(n // 8192, 8)
    out: dict[str, object] = {
        "n_vectors": n, "dim": DIM, "cells": cells, "batch_frac": BATCH_FRAC
    }
    vecs = synth_vectors(spark, n, cells).persist()
    vecs.count()
    cut = int(n * (1.0 - BATCH_FRAC))
    old = vecs.filter(F.col("vec_id") < cut)
    new = vecs.filter(F.col("vec_id") >= cut)

    # one-time state build (a production pipeline reads the tables the
    # previous ingest step persisted)
    caches: list = []
    t0 = time.time()
    _, state = S.semantic_dedup_update(old, None, caches=caches)
    state["assign"].count()
    state["vectors"].count()
    out["state_build_s"] = round(time.time() - t0, 2)

    t0 = time.time()
    assign_inc, _ = S.semantic_dedup_update(new, None, state, threshold=THR, caches=caches)
    ci = _checksum(assign_inc)
    out["incremental_s"] = round(time.time() - t0, 2)
    out["rows"] = ci.n

    t0 = time.time()
    assign_batch = S.semantic_dedup(vecs, None, threshold=THR)
    cb = _checksum(assign_batch)
    out["batch_rerun_s"] = round(time.time() - t0, 2)
    assert (ci.s, ci.n) == (cb.s, cb.n), (ci, cb)
    out["agree"] = True
    out["speedup_vs_rerun"] = round(
        out["batch_rerun_s"] / max(out["incremental_s"], 0.01), 2
    )
    for c in caches:
        c.unpersist()
    vecs.unpersist()
    return out


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [200_000, 1_000_000]
    spark = get_session("scaling-semdedup-incr")
    spark.sparkContext.setLogLevel("ERROR")
    for nn in sizes:
        print(json.dumps(run_scale(spark, nn)), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
