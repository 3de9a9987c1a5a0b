"""Phase-level timing of the SemDeDup incremental entries (dq148b/dq148d).

Replays semantic_dedup_update's internals step by step, forcing each
intermediate with a noop sink and timing it, so the 17-s bench entry is
attributable to phases (guide §1).  Read-only: nothing written under the
repo; stores go to a tmpdir.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from agile_lakehouse_spark import declared, get_session  # noqa: E402
from agile_lakehouse_spark.operators import similarity  # noqa: E402
from agile_lakehouse_spark.operators.similarity import (  # noqa: E402
    embedding_match,
    embedding_near_dup,
    ivf_assign,
    semantic_dedup,
)
from agile_lakehouse_spark.sources.catalog import load_table  # noqa: E402

IVF_M = declared.IVF_M
EMB_COS_T = declared.EMB_COS_T


def t(label, df):
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    dt = time.time() - t0
    print(f"{label:45s} {dt:7.3f}s", flush=True)
    return dt


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session("semdedup-phases")
    spark.sparkContext.setLogLevel("ERROR")
    emb = load_table(spark, sf_dir, "embeddings")
    emb.count()

    cents = similarity.default_centroids(emb, IVF_M)
    cut = emb.agg(((F.min("vec_id") + F.max("vec_id")) / 2).cast("bigint")).collect()[0][0]
    b1 = emb.filter(F.col("vec_id") <= cut)
    b2 = emb.filter(F.col("vec_id") > cut)

    # warm python workers
    spark.createDataFrame([(0, 1.0)], "k int, v double").groupBy("k").applyInPandas(
        lambda p: p, schema="k int, v double"
    ).count()

    for rep in range(2):
        print(f"--- rep {rep} ---")
        total0 = time.time()
        caches = []

        # batch 1 = semantic_dedup on b1
        t0 = time.time()
        assigned1 = ivf_assign(b1, cents).persist()
        caches.append(assigned1)
        assigned1.count()
        print(f"{'b1 ivf_assign+persist':45s} {time.time()-t0:7.3f}s")
        tagged1 = b1.join(assigned1, "vec_id").select(
            F.col("cell").cast("bigint").alias("cell"), "vec_id", "embedding"
        ).persist()
        caches.append(tagged1)
        t0 = time.time(); tagged1.count()
        print(f"{'b1 tagged persist':45s} {time.time()-t0:7.3f}s")

        t0 = time.time()
        pairs1 = embedding_near_dup(tagged1, EMB_COS_T, block_col="cell")
        pairs1.write.format("noop").mode("overwrite").save()
        print(f"{'b1 within pairs (near_dup)':45s} {time.time()-t0:7.3f}s")

        from agile_lakehouse_spark.operators import graph
        t0 = time.time()
        comps1 = graph.connected_components(pairs1, src="id_a", dst="id_b", id_col="vec_id")
        comps1.write.format("noop").mode("overwrite").save()
        print(f"{'b1 connected_components':45s} {time.time()-t0:7.3f}s")

        rep_ = F.coalesce(F.col("component"), F.col("vec_id"))
        assign1 = tagged1.join(comps1, "vec_id", "left").select(
            F.col("vec_id"), F.col("cell").cast("bigint").alias("cell"),
            rep_.cast("bigint").alias("grp"), (rep_ == F.col("vec_id")).alias("kept"),
        ).persist()
        caches.append(assign1)
        t0 = time.time(); assign1.count()
        print(f"{'b1 assign join+persist':45s} {time.time()-t0:7.3f}s")

        # batch 2 = semantic_dedup_update with state
        t0 = time.time()
        assigned2 = ivf_assign(b2, cents)
        tagged2 = b2.join(assigned2, "vec_id").select(
            F.col("cell").cast("bigint").alias("cell"), "vec_id", "embedding"
        ).persist()
        caches.append(tagged2)
        tagged2.count()
        print(f"{'b2 tagged persist':45s} {time.time()-t0:7.3f}s")

        dirty = tagged2.select("cell").distinct()
        store_dirty = tagged1.join(F.broadcast(dirty), "cell")
        old_dirty = assign1.join(F.broadcast(dirty), "cell")

        t0 = time.time()
        cross = embedding_match(tagged2, store_dirty, EMB_COS_T, block_col="cell").select(
            F.col("vec_id").alias("id_a"), F.col("match_id").alias("id_b")
        )
        cross.write.format("noop").mode("overwrite").save()
        print(f"{'b2 cross pairs (match)':45s} {time.time()-t0:7.3f}s")

        t0 = time.time()
        within2 = embedding_near_dup(tagged2, EMB_COS_T, block_col="cell").select("id_a", "id_b")
        within2.write.format("noop").mode("overwrite").save()
        print(f"{'b2 within pairs':45s} {time.time()-t0:7.3f}s")

        old_edges = old_dirty.filter(F.col("grp") != F.col("vec_id")).select(
            F.col("vec_id").alias("id_a"), F.col("grp").alias("id_b")
        )
        edges = cross.unionByName(within2).unionByName(old_edges)
        t0 = time.time()
        comps2 = graph.connected_components(edges, src="id_a", dst="id_b", id_col="vec_id")
        comps2.write.format("noop").mode("overwrite").save()
        print(f"{'b2 connected_components':45s} {time.time()-t0:7.3f}s")

        dirty_ids = old_dirty.select("vec_id", "cell").unionByName(tagged2.select("vec_id", "cell"))
        dirty_assign = dirty_ids.join(comps2, "vec_id", "left").select(
            F.col("vec_id"), F.col("cell").cast("bigint").alias("cell"),
            rep_.cast("bigint").alias("grp"), (rep_ == F.col("vec_id")).alias("kept"),
        )
        final = assign1.join(F.broadcast(dirty), "cell", "left_anti").unionByName(dirty_assign)
        t0 = time.time()
        final.orderBy("vec_id").write.format("noop").mode("overwrite").save()
        print(f"{'final union+sort':45s} {time.time()-t0:7.3f}s")
        print(f"{'TOTAL':45s} {time.time()-total0:7.3f}s")
        for c in caches:
            c.unpersist()

    spark.stop()


if __name__ == "__main__":
    main()
