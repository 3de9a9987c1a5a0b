"""Two-phase token-budget fill vs the naive global window, at scale.

fill_token_budget's claim is that a per-source cumsum window over a
low-cardinality source key concentrates the whole corpus on a handful of
partitions (one per source), while the two-phase cut windows only the
cut bucket.  This script measures BOTH shapes on the scaling_dedup
synthetic corpus with 4 sources (worst-case key cardinality):

    SPARK_DRIVER_MEMORY=64g python scripts/scaling_budget.py [n_docs ...]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import Window
from pyspark.sql import functions as F

from agile_lakehouse_spark import get_session
from agile_lakehouse_spark.functions import portable
from agile_lakehouse_spark.operators.text import fill_token_budget
from scripts.scaling_dedup import synth_docs


def naive_fill(df, budgets):
    h = F.expr(portable.hex15_spark("CAST(doc_id AS STRING)"))
    toks = F.expr(portable.tokens_spark("text"))
    base = df.select(
        "doc_id", "source", F.size(toks).cast("bigint").alias("n_tokens"), h.alias("h")
    ).filter(F.col("source").isin(list(budgets)))
    w = (
        Window.partitionBy("source")
        .orderBy("h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    budget = F.lit(None).cast("bigint")
    for s, b in budgets.items():
        budget = F.when(F.col("source") == s, F.lit(b)).otherwise(budget)
    return (
        base.withColumn("cum", F.sum("n_tokens").over(w))
        .filter(F.col("cum") <= budget)
        .select("doc_id", "source", "n_tokens")
    )


def run_scale(spark, n: int) -> dict:
    out: dict[str, object] = {"n_docs": n}
    docs = (
        synth_docs(spark, n)
        .withColumn("source", F.concat(F.lit("s"), (F.col("doc_id") % 4).cast("string")))
        .persist()
    )
    docs.count()
    # budgets sized to cut each source roughly in half (~70 tokens/doc avg)
    per_source_tokens = n // 4 * 70
    budgets = {f"s{i}": per_source_tokens // 2 for i in range(4)}

    t0 = time.time()
    kept2 = fill_token_budget(docs, budgets, n_buckets=64).count()
    out["two_phase_s"] = round(time.time() - t0, 2)
    out["two_phase_kept"] = kept2

    t0 = time.time()
    kept1 = naive_fill(docs, budgets).count()
    out["naive_window_s"] = round(time.time() - t0, 2)
    out["naive_kept"] = kept1

    assert kept1 == kept2, (kept1, kept2)
    docs.unpersist()
    out["docs_per_s_two_phase"] = round(n / out["two_phase_s"])
    return out


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [500_000, 2_000_000]
    spark = get_session("scaling-budget")
    spark.sparkContext.setLogLevel("ERROR")
    for n in sizes:
        print(json.dumps(run_scale(spark, n)), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
