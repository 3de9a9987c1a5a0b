"""End-to-end training-data cleaning pipeline (the north-star composition).

One declared operator chaining the LLM-data ops the way a production
corpus-prep job would:

    quality filter  ->  exact dedup (keep lowest id)  ->  MinHash-LSH
    near-dup removal (drop the higher id of every near-dup pair)

Everything stays one lazy Catalyst plan — no materialization between
stages, so column pruning and predicate pushdown cross stage boundaries,
and the whole pipeline is a handful of shuffles (quality is a map, dedup
one agg, near-dup the LSH join) regardless of corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from agile_lakehouse_spark.operators import dedup
from agile_lakehouse_spark.operators.text import quality_score


def clean_corpus(
    df: DataFrame,
    min_quality: float = 0.5,
    shingle_k: int = 5,
    near_dup_threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Return the surviving (cleaned) documents: (doc_id, quality).

    Deterministic survivor rule: per exact-duplicate group the lowest id
    survives; per near-dup pair (est_jaccard >= threshold) the higher id is
    dropped.  Output ordered by id.
    """
    scored = quality_score(df, text_col).filter(F.col("quality") >= min_quality)
    keep_exact = (
        scored.groupBy(text_col)
        .agg(F.min(id_col).alias(id_col), F.min("quality").alias("quality"))
        .select(id_col, "quality")
    )
    near = dedup.minhash_near_dup(
        scored.select(id_col, text_col),
        k=shingle_k,
        threshold=near_dup_threshold,
        text_col=text_col,
        id_col=id_col,
    )
    drop = near.select(F.col("id_b").alias(id_col)).distinct()
    return (
        keep_exact.join(drop, id_col, "left_anti")
        .select(F.col(id_col).cast("bigint").alias(id_col), "quality")
        .orderBy(id_col)
    )
