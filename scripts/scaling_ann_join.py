"""Scaling evidence for the batched ANN join's two-phase per-query cut.

Scores nq query vectors against N synthetic corpus vectors (dim 64) and
takes per-query top-k two ways:

- window — row_number() over q_id on the full scored table: every scored
  row funnels into nq shuffle partitions (corpus-sized sort per query);
- two-phase — ``similarity.cosine_topk_join``: partition-local slice to k
  per (query, partition), then a k x n_partitions merge per query.

    python scripts/scaling_ann_join.py [n_vectors] [n_queries] [k]

Prints one JSON line; SCALE.md records a representative run.  Both paths
must return identical (q_id, rank, vec_id) triples — checked before
timing is reported.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import Window
from pyspark.sql import functions as F

from agile_lakehouse_spark import get_session
from agile_lakehouse_spark.functions import vector
from agile_lakehouse_spark.functions.portable import round4
from agile_lakehouse_spark.operators import similarity

DIM = 64


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    nq = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    spark = get_session("scaling-ann-join")
    spark.sparkContext.setLogLevel("ERROR")

    # deterministic synthetic vectors: dim hash-derived floats in [-1, 1]
    comps = F.array(
        *[
            (F.pmod(F.xxhash64(F.col("id") * DIM + d), 2001) - 1000).cast("float") / 1000.0
            for d in range(DIM)
        ]
    )
    corpus = spark.range(n).select(F.col("id").alias("vec_id"), comps.alias("embedding")).persist()
    corpus.count()
    qs = corpus.filter(F.col("vec_id") < nq).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )

    t0 = time.time()
    two_phase = {
        (r.q_id, r.rank): r.vec_id
        for r in similarity.cosine_topk_join(qs, corpus, k=k).collect()
    }
    two_phase_s = time.time() - t0

    t0 = time.time()
    scored = corpus.crossJoin(F.broadcast(qs)).select(
        "q_id", "vec_id",
        round4(vector.cosine(F.col("embedding"), F.col("q_vec"))).alias("cos"),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    naive = {
        (r.q_id, r.rn): r.vec_id
        for r in scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .collect()
    }
    window_s = time.time() - t0
    assert two_phase == naive, "two-phase and window top-k diverge"

    print(
        json.dumps(
            {
                "n_vectors": n,
                "n_queries": nq,
                "k": k,
                "dim": DIM,
                "two_phase_s": round(two_phase_s, 2),
                "window_s": round(window_s, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
