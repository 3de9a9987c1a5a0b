"""Python UDTF surface (Spark 4): table functions via LATERAL join.

The declared queries keep Python out of the hot path (asserted elsewhere);
this pins the CAPABILITY — a user-defined table function expanding each
input row into multiple output rows, the Spark-4 door for custom
one-to-many logic that doesn't fit explode/inline.
"""

from pyspark.sql.functions import udtf


@udtf(returnType="gram: string, pos: int")
class CharBigrams:
    """Emit each adjacent character bigram of a string with its position."""

    def eval(self, s: str):
        if s is None:
            return
        for i in range(len(s) - 1):
            yield s[i : i + 2], i


def test_udtf_lateral_expansion(spark):
    spark.udtf.register("char_bigrams", CharBigrams)
    spark.createDataFrame([(1, "spark"), (2, "ok"), (3, None)], "id int, s string") \
        .createOrReplaceTempView("_udtf_in")
    rows = spark.sql(
        """
        SELECT id, gram, pos FROM _udtf_in,
        LATERAL char_bigrams(s)
        ORDER BY id, pos
        """
    ).collect()
    got = [(r.id, r.gram, r.pos) for r in rows]
    assert got == [
        (1, "sp", 0), (1, "pa", 1), (1, "ar", 2), (1, "rk", 3),
        (2, "ok", 0),
    ]
