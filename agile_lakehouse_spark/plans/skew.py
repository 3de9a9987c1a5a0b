"""Skew-handling utilities for joins on hot keys.

AQE's skew-join splitting (on by default in session.py) handles most skew
at runtime; explicit salting remains the tool of choice when one side is a
*broadcast-too-big* dimension with a few dominant keys (a power-law user
table, a null-heavy foreign key), because it fixes the partition sizes at
plan time instead of waiting for runtime stats.

``salted_join``: replicate the small side ``salt`` times, scatter the big
side's hot keys uniformly over the salt space, join on (key, salt) — every
shuffle partition receives ~1/salt of each hot key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: salt the big side, replicate the small side.

    Correctness-equivalent to ``big.join(small, big[big_key] == small[small_key], how)``
    for inner/left joins on unique ``small_key``; cost trades a ``salt``-x
    replication of the small side for uniform shuffle partitions.

    ``how`` is validated: right/full-outer would emit each unmatched
    small-side row ``salt`` times (the small side is replicated before the
    join), so those are rejected rather than silently wrong.
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi", "left_anti", "leftanti"}
    if how not in allowed:
        raise ValueError(
            f"salted_join supports {sorted(allowed)} only; {how!r} would duplicate "
            f"unmatched small-side rows {salt}x (small side is replicated pre-join)"
        )
    big_salted = big.withColumn("_salt", (F.rand(42) * salt).cast("int"))
    explode_salt = F.explode(F.array(*[F.lit(s) for s in range(salt)])).alias("_salt")
    small_replicated = small.select("*", explode_salt)
    cond = (big_salted[big_key] == small_replicated[small_key]) & (
        big_salted["_salt"] == small_replicated["_salt"]
    )
    return big_salted.join(small_replicated, cond, how).drop("_salt")
