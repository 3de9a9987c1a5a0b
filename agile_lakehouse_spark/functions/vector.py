"""Vector (embedding) expressions over ``array<float>`` columns.

JVM-side (whole-stage-codegen-friendly) higher-order functions — no Python
UDF in the hot path.  All arithmetic is forced to DOUBLE with strict
left-to-right summation so results agree bit-for-bit with the DuckDB oracle
(same fold order there via ``list_reduce``).

At 100 TB scale the brute-force path is a single narrow projection + top-k
(TakeOrderedAndProject — no full sort, no shuffle beyond the final k-merge);
the IVF path (operators/similarity.py) prunes candidates by centroid cell
before the same kernel.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column | str, b: Column | str) -> Column:
    """Sequential-order double-precision dot product of two array columns."""
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column | str, b: Column | str) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


# DuckDB oracle fragments with the same fold order -------------------------


def dot_duck(a: str, b: str, dim: int) -> str:
    return (
        f"list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, {dim + 1}), "
        f"k -> CAST({a}[CAST(k AS INT)] AS DOUBLE) * CAST({b}[CAST(k AS INT)] AS DOUBLE))), "
        f"(acc, v) -> acc + v)"
    )


def cosine_duck(a: str, b: str, dim: int) -> str:
    return f"({dot_duck(a, b, dim)} / (sqrt({dot_duck(a, a, dim)}) * sqrt({dot_duck(b, b, dim)})))"
