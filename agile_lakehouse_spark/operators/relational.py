"""Relational query surface — Catalyst built-ins, declared and tested.

The reference implements no joins/windows/set-ops itself but opens the full
SQL door via DataFusion ``ctx.sql`` (``pc-io/src/las/mod.rs:101-126``); our
engine declares the full Spark-SQL relational surface as part of its
contract (SURVEY.md §2.8, DQ9-DQ20).  Each builder returns a DataFrame whose
column names/types match the DuckDB oracle exactly (FIXTURES.md determinism
rules: explicit aliases, round(.,4) on float aggregates, total ordering).

Scale notes: small dimensions are broadcast explicitly; fact-fact joins
shuffle on their keys and AQE handles skew; aggregations rely on map-side
partial combine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from agile_lakehouse_spark.sources.catalog import load_table
from agile_lakehouse_spark.functions.portable import round4


def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-heavy group-by with map-side combine (DQ9)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            round4(F.sum("l_quantity")).alias("sum_qty"),
            round4(F.sum("l_extendedprice")).alias("sum_base_price"),
            round4(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("sum_disc_price"),
            round4(F.avg("l_quantity")).alias("avg_qty"),
            round4(F.avg("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).cast("bigint").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast equi-join: orders ⋈ customer, revenue per nation (DQ10).

    ``customer`` is the small side -> explicit ``F.broadcast`` so no shuffle
    of the fact table happens even if stats are stale.
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    return (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            round4(F.sum("o_totalprice")).alias("total_price"),
        )
        .orderBy("c_nationkey")
    )


def multiway_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: multi-way join + filter + agg (DQ11).

    lineitem⋈orders shuffles on the order key; every dimension side
    (customer/supplier/nation/region) broadcasts.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            round4(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue"),
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
        )
        .orderBy("n_name")
    )


def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi: customers that have at least one order (DQ12a)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_semi")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            round4(F.sum("c_acctbal")).alias("sum_acctbal"),
        )
    )


def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti: customers with no orders (DQ12b)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_anti")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            round4(F.sum("c_acctbal")).alias("sum_acctbal"),
        )
    )


def distinct_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """distinct / count-distinct (DQ13) — exact, plus row count of distinct pairs."""
    li = load_table(spark, sf_dir, "lineitem")
    pairs = li.select("l_partkey", "l_suppkey").distinct()
    return pairs.agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs")).crossJoin(
        li.agg(F.countDistinct("l_partkey").cast("bigint").alias("n_parts"))
    )


def set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION / INTERSECT / EXCEPT over nation-key sets (DQ14), one row out."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("k"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("k"))
    u = c.union(s).distinct().agg(F.count(F.lit(1)).cast("bigint").alias("union_cnt"))
    i = c.intersect(s).agg(F.count(F.lit(1)).cast("bigint").alias("intersect_cnt"))
    e = c.subtract(s).agg(F.count(F.lit(1)).cast("bigint").alias("except_cnt"))
    return u.crossJoin(i).crossJoin(e)


def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking window: top-5 orders per status by price (DQ15)."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= 5)
        .select("o_orderstatus", "rn", "o_orderkey", round4("o_totalprice").alias("price"))
        .orderBy("o_orderstatus", "rn")
    )


def window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic frame: running sum of event value per user (DQ16)."""
    events = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 10)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        events.select("user_id", "event_id", round4(F.sum("value").over(w)).alias("running_value"))
        .orderBy("user_id", "event_id")
    )


def date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time scalar functions over the events table (DQ17)."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.year("ts").cast("bigint").alias("y"),
            F.month("ts").cast("bigint").alias("m"),
            F.dayofmonth("ts").cast("bigint").alias("d"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            round4(F.sum("value")).alias("sum_value"),
        )
        .orderBy("y", "m", "d")
    )


def string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String scalar functions over part (DQ18)."""
    part = load_table(spark, sf_dir, "part")
    return (
        part.filter(F.col("p_name").like("%a%"))
        .select(
            "p_partkey",
            F.upper("p_brand").alias("brand_u"),
            F.substring("p_name", 1, 8).alias("name_prefix"),
            F.length("p_name").cast("bigint").alias("name_len"),
            F.concat_ws("/", "p_brand", "p_type").alias("brand_type"),
        )
        .orderBy("p_partkey")
    )


def rollup_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over (returnflag, linestatus) (DQ19a)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            round4(F.sum("l_quantity")).alias("sum_qty"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("flag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("status"),
            "n_rows",
            "sum_qty",
        )
        .orderBy("flag", "status")
    )


def cube_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (orderstatus, orderpriority) (DQ19b)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            round4(F.sum("o_totalprice")).alias("sum_price"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n_rows",
            "sum_price",
        )
        .orderBy("status", "priority")
    )


def session_islands(spark: SparkSession, sf_dir: str, gap_s: int = 300) -> DataFrame:
    """Batch sessionization (gaps-and-islands) — oracle-testable twin of the
    streaming ``session_window`` (DQ20b).

    A new session starts when the gap to the previous event of the same
    user exceeds ``gap_s``; sessions are numbered per user with a running
    sum over the new-session flags.  Two window passes, both over the same
    ``(user_id, ts)`` partitioning — Catalyst reuses one Exchange.
    """
    from pyspark.sql.window import Window as W

    events = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    # exact integer milliseconds — never compare fractional epochs across
    # engines (truncation semantics differ)
    ts_ms = F.unix_millis(F.col("ts").cast("timestamp"))
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag(ts_ms).over(w)
    new_session = F.when(prev.isNull() | ((ts_ms - prev) > gap_s * 1000), 1).otherwise(0)
    with_sess = (
        events.withColumn("sess", F.sum(new_session).over(
            W.partitionBy("user_id").orderBy("ts", "event_id")
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        ))
    )
    return (
        with_sess.groupBy("user_id", F.col("sess").cast("bigint").alias("session_id"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            round4(F.sum("value")).alias("sum_value"),
        )
        .orderBy("user_id", "session_id")
    )


def grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS through the SQL door (DQ19c).

    DataFrame API exposes rollup/cube; arbitrary grouping sets go through
    ``spark.sql`` — same Catalyst Expand operator underneath.
    """
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("_gs_lineitem")
    return spark.sql(
        """
        SELECT coalesce(l_returnflag, 'ALL') AS flag,
               coalesce(l_linestatus, 'ALL') AS status,
               CAST(count(*) AS BIGINT) AS n_rows,
               -- Spark SQL parses 10000.0 as DECIMAL and floor() yields BIGINT;
               -- force DOUBLE so the result type/value matches round4 exactly
               (CAST(floor(sum(l_extendedprice) * CAST(10000.0 AS DOUBLE) + 0.5) AS DOUBLE)
                / CAST(10000.0 AS DOUBLE)) AS sum_price
        FROM _gs_lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        ORDER BY flag, status
        """
    )


def time_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 10-minute buckets — batch analogue of a streaming window (DQ20).

    Pure epoch arithmetic so the DuckDB oracle agrees; the Structured
    Streaming twin (streaming/windows.py) uses ``F.window`` + watermark.
    """
    events = load_table(spark, sf_dir, "events")
    bucket = F.floor(F.unix_timestamp(F.col("ts").cast("timestamp")) / 600).cast("bigint")
    return (
        events.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            round4(F.sum("value")).alias("sum_value"),
        )
        .orderBy("bucket")
    )


def pivot_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: lineitem quantities by linestatus column per returnflag (DQ28).

    Explicit value list (``F, O``) — at scale an implicit pivot triggers a
    distinct-values collect job; pinning the columns keeps it one pass and
    makes the output schema static (a Catalyst pivot lowers to
    ``sum(CASE WHEN ...)`` conditional aggregation, the same shape the
    oracle states explicitly).
    """
    li = load_table(spark, sf_dir, "lineitem")
    piv = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.sum("l_quantity"))
    )
    return (
        piv.select(
            "l_returnflag",
            round4(F.coalesce(F.col("F"), F.lit(0.0))).alias("qty_f"),
            round4(F.coalesce(F.col("O"), F.lit(0.0))).alias("qty_o"),
        )
        .orderBy("l_returnflag")
    )


def unpivot_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (melt): the wide pivot table back to long form (DQ28b).

    ``df.unpivot`` lowers to Expand — one pass, rows multiply by the value
    column count, no join; the relational dual of :func:`pivot_agg`.
    """
    wide = pivot_agg(spark, sf_dir)
    return (
        wide.unpivot(
            ids=["l_returnflag"],
            values=["qty_f", "qty_o"],
            variableColumnName="status_col",
            valueColumnName="qty",
        )
        .orderBy("l_returnflag", "status_col")
    )


def array_agg_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array aggregation + array functions per user (DQ29).

    ``collect_set`` -> ``sort_array`` -> ``array_join``: the deterministic
    way to aggregate rows into lists (bare ``collect_list`` order is
    partition-dependent — never expose it unsorted).  ``size`` exercises
    array introspection.
    """
    events = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 30)
    types = F.sort_array(F.collect_set("event_type"))
    return (
        events.groupBy("user_id")
        .agg(
            F.array_join(types, ",").alias("types_csv"),
            F.size(types).cast("bigint").alias("n_types"),
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
        )
        .orderBy("user_id")
    )


def json_extract_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON scalar functions over the events ``props`` column (DQ30).

    ``get_json_object`` runs JVM-side (Jackson) — no UDF; the extracted
    value feeds a normal aggregation.  At scale, parse-once-then-reuse:
    extract to a typed column in one projection rather than re-parsing the
    JSON per expression.
    """
    events = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        events.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum("k").cast("bigint").alias("sum_k"),
            round4(F.avg("k")).alias("avg_k"),
        )
        .orderBy("event_type")
    )


def correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (TPC-H Q17 shape) through the SQL door (DQ32).

    Selects lineitems whose quantity is below 20% of their part's average
    quantity.  Catalyst decorrelates the subquery into an aggregate +
    join — no per-row re-execution (``.explain`` shows a single
    aggregation over lineitem joined back, not a nested-loop).
    """
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("_cs_lineitem")
    return spark.sql(
        """
        SELECT CAST(count(*) AS BIGINT) AS n_small,
               (CAST(floor(sum(l_extendedprice) * CAST(10000.0 AS DOUBLE) + 0.5) AS DOUBLE)
                / CAST(10000.0 AS DOUBLE)) AS sum_price
        FROM _cs_lineitem l1
        WHERE l_quantity < (
            SELECT 0.2 * avg(l_quantity) FROM _cs_lineitem l2
            WHERE l2.l_partkey = l1.l_partkey)
        """
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    tie_col: str | None = None,
) -> DataFrame:
    """Generic as-of join: each left row gets the latest right row with
    ``right_ts <= left_ts`` for the same ``on`` key (ties: the right row
    wins, matching DuckDB ``ASOF JOIN``'s ``>=`` semantics).

    Spark has no native as-of join; the scalable formulation is the
    union-sort trick: tag both sides, union, and run ``last(value,
    ignorenulls=True)`` over a per-key window ordered by (ts, side) with
    right rows sorted before left rows at equal timestamps.  ONE shuffle
    on the key (the window partition), no range self-join blowup —
    equivalent to pandas ``merge_asof`` but distributed.

    Returns the left rows plus ``value_cols`` carried from the matched
    right row (NULL when no earlier right row exists).

    ``tie_col`` (a right-side column) deterministically breaks ties among
    right rows sharing the same (key, timestamp): the HIGHEST ``tie_col``
    row wins.  Without it, which same-timestamp right row is carried is
    partition-order-dependent.
    """
    lcols = left.columns
    side_right = F.lit(0)
    side_left = F.lit(1)
    tie_expr = F.col(tie_col) if tie_col else F.lit(0)
    r_tagged = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        side_right.alias("_side"),
        tie_expr.cast("bigint").alias("_tie"),
        *[F.col(c).alias(f"_v_{c}") for c in value_cols],
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}") for c in lcols],
    )
    l_tagged = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        side_left.alias("_side"),
        F.lit(0).cast("bigint").alias("_tie"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_v_{c}") for c in value_cols],
        *[F.col(c).alias(f"_l_{c}") for c in lcols],
    )
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_side", "_tie")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    unioned = r_tagged.unionByName(l_tagged)
    filled = unioned.select(
        "*", *[F.last(f"_v_{c}", ignorenulls=True).over(w).alias(f"_asof_{c}") for c in value_cols]
    )
    return filled.filter(F.col("_side") == 1).select(
        *[F.col(f"_l_{c}").alias(c) for c in lcols],
        *[F.col(f"_asof_{c}").alias(f"asof_{c}") for c in value_cols],
    )


def asof_clicks_to_views(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join demo on events: each click joined to the user's latest
    prior-or-simultaneous view's value (DQ33)."""
    events = load_table(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    views = events.filter(F.col("event_type") == "view").select("user_id", "ts", "value", "event_id")
    # deterministic tie-break among same-timestamp views: keep max event_id
    # (the window's last() picks the final row in sort order)
    views = views.withColumnRenamed("event_id", "view_id")
    joined = asof_join(
        clicks,
        views,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        value_cols=["value", "view_id"],
        tie_col="view_id",
    )
    return joined.select(
        "event_id",
        "user_id",
        round4(F.col("asof_value")).alias("view_value"),
        F.col("asof_view_id").cast("bigint").alias("view_id"),
    ).orderBy("event_id")


def percentile_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles of l_quantity per returnflag (DQ35).

    Spark ``percentile`` (exact, sort-based) ≙ DuckDB ``quantile_cont``:
    both interpolate at position ``p * (n-1)``.  Only binary-exact
    fractions (.25/.5/.75) over integral quantities are declared, so the
    interpolation arithmetic is bit-identical across engines.  At scale
    prefer ``approx_percentile`` (GK sketch, mergeable map-side); the
    exact form is the oracle-checkable twin.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            round4(F.expr("percentile(l_quantity, 0.25)")).alias("q25"),
            round4(F.expr("percentile(l_quantity, 0.5)")).alias("q50"),
            round4(F.expr("percentile(l_quantity, 0.75)")).alias("q75"),
        )
        .orderBy("l_returnflag")
    )


def stratified_sample(spark: SparkSession, sf_dir: str, pct: int = 10) -> DataFrame:
    """Deterministic hash-based stratified sample of orders (DQ36).

    ``sample()``/``sampleBy()`` are seeded per-partition, so their output
    changes with partitioning — useless for reproducible pipelines.  The
    portable md5-fold hash on the key gives a sample that is stable across
    engines, partition layouts, AND cluster sizes: membership is a pure
    function of o_orderkey.  One pass, conditional aggregation per stratum.
    """
    from agile_lakehouse_spark.functions import portable

    orders = load_table(spark, sf_dir, "orders")
    h = F.expr(portable.hex15_spark("CAST(o_orderkey AS STRING)")) % 100
    in_sample = h < pct
    return (
        orders.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_total"),
            F.sum(F.when(in_sample, 1).otherwise(0)).cast("bigint").alias("n_sampled"),
            round4(F.max(F.when(in_sample, F.col("o_totalprice")))).alias("max_sampled_price"),
        )
        .orderBy("o_orderstatus")
    )


def gap_fill_hours(spark: SparkSession, sf_dir: str, max_user: int = 10) -> DataFrame:
    """Dense time-series gap fill with forward fill (DQ38).

    Per user: hourly event counts on a dense hour spine spanning that
    user's [first, last] event — missing hours appear with n_events=0 and
    the last observed hourly max forward-filled.  ``sequence`` + explode
    generates the spine distributed (each user's span expands in its own
    task — no driver-side date range); integer hour indices avoid
    cross-engine timestamp-arithmetic drift.  Aggregates are count/max
    only (order-independent — no float-summation divergence).
    """
    events = load_table(spark, sf_dir, "events").filter(F.col("user_id") < max_user)
    hour = (F.unix_millis(F.col("ts").cast("timestamp")) / F.lit(3600000)).cast("bigint")
    per_hour = events.groupBy("user_id", hour.alias("h")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.max("value").alias("mx"),
    )
    spine = (
        per_hour.groupBy("user_id")
        .agg(F.min("h").alias("lo"), F.max("h").alias("hi"))
        .select("user_id", F.explode(F.sequence("lo", "hi")).alias("h"))
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.join(per_hour, ["user_id", "h"], "left")
        .select(
            "user_id",
            "h",
            F.coalesce("n", F.lit(0)).cast("bigint").alias("n_events"),
            round4(F.last("mx", ignorenulls=True).over(w)).alias("ffill_max"),
        )
        .orderBy("user_id", "h")
    )


def banded_interval_join(spark: SparkSession, sf_dir: str, window_ms: int = 600000) -> DataFrame:
    """Batch interval join via time-band blocking (DQ39).

    Each click is joined to the same user's views in the trailing
    ``window_ms``.  A naive range join is O(n*m) per user
    (BroadcastNestedLoopJoin at scale); banding makes it an EQUI-join:
    clicks explode to the (≤2) band buckets their window covers, views
    hash to their own bucket, join on (user_id, bucket), then refine the
    exact range.  Shuffle is bounded by data size × 2, never by pair
    count — the batch twin of streaming interval_join
    (streaming/windows.py).
    """
    events = load_table(spark, sf_dir, "events")
    ms = F.unix_millis(F.col("ts").cast("timestamp"))
    clicks = events.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", ms.alias("c_ms")
    )
    views = events.filter(F.col("event_type") == "view").select(
        "user_id", ms.alias("v_ms"), "value"
    )
    clicks_b = clicks.withColumn(
        "b",
        F.explode(
            F.array_distinct(
                F.array(
                    F.floor((F.col("c_ms") - window_ms) / window_ms),
                    F.floor(F.col("c_ms") / window_ms),
                )
            )
        ),
    )
    views_b = views.withColumn("b", F.floor(F.col("v_ms") / window_ms))
    matched = (
        clicks_b.join(views_b, ["user_id", "b"])
        .filter((F.col("v_ms") > F.col("c_ms") - window_ms) & (F.col("v_ms") <= F.col("c_ms")))
        .groupBy("event_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_views"),
            F.max("value").alias("mx"),
        )
    )
    return (
        clicks.join(matched, "event_id", "left")
        .select(
            "event_id",
            "user_id",
            F.coalesce("n_views", F.lit(0)).cast("bigint").alias("n_views"),
            round4(F.col("mx")).alias("max_view_value"),
        )
        .orderBy("event_id")
    )


def range_frame_running(spark: SparkSession, sf_dir: str, max_user: int = 10) -> DataFrame:
    """RANGE-framed window: trailing-1h event count/max per user (DQ41).

    ``rangeBetween`` on integer epoch-ms — the frame is defined by VALUE
    distance, not row count, so same-timestamp peers are always included
    together (deterministic under any shuffle order, unlike a ROWS frame
    over a non-unique ordering).  Aggregates are count/max (order-free).
    """
    events = load_table(spark, sf_dir, "events").filter(F.col("user_id") < max_user)
    ms = F.unix_millis(F.col("ts").cast("timestamp"))
    with_ms = events.select("event_id", "user_id", ms.alias("ms"), "value")
    w = Window.partitionBy("user_id").orderBy("ms").rangeBetween(-3600000, 0)
    return (
        with_ms.select(
            "event_id",
            "user_id",
            F.count(F.lit(1)).over(w).cast("bigint").alias("n_trailing_1h"),
            round4(F.max("value").over(w)).alias("max_trailing_1h"),
        )
        .orderBy("event_id")
    )


def price_histogram(spark: SparkSession, sf_dir: str, bin_width: float = 5000.0) -> DataFrame:
    """Fixed-width histogram of l_extendedprice (DQ42).

    ``floor(v / width)`` binning — a single map-side-combinable groupBy,
    no data-dependent bounds pass (a min/max prescan would be a second
    full scan at 100 TB; fixed widths or quantile-sketch-derived bounds
    avoid it).  Bin ids are exact integer arithmetic in both engines.
    """
    li = load_table(spark, sf_dir, "lineitem")
    bin_col = F.floor(F.col("l_extendedprice") / bin_width).cast("bigint")
    return (
        li.groupBy(bin_col.alias("bin"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            round4(F.min("l_extendedprice")).alias("bin_min"),
            round4(F.max("l_extendedprice")).alias("bin_max"),
        )
        .orderBy("bin")
    )


def recursive_month_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4): dense monthly calendar spine over the order
    date range, with per-month order counts — months with no orders appear
    as 0 (DQ43).

    ``WITH RECURSIVE`` iterates driver-coordinated like the DataFrame CC
    loop (operators/graph.py) but through the SQL door; Spark supports
    UNION ALL recursion (monotone append), so the recursion must be
    ACYCLIC by construction — a bounded date walk, unlike the cyclic
    label-propagation shape that needs fixpoint UNION semantics.
    """
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("_rcte_orders")
    return spark.sql(
        """
        WITH RECURSIVE sub AS (
            SELECT o_orderkey, o_orderdate FROM _rcte_orders
            WHERE o_orderdate < TIMESTAMP '1998-01-01'),
        months(m) AS (
            SELECT date_trunc('MONTH', min(o_orderdate)) FROM sub
            UNION ALL
            SELECT add_months(m, 1) FROM months
            WHERE m < (SELECT date_trunc('MONTH', max(o_orderdate)) FROM sub))
        SELECT CAST(year(m) AS BIGINT) AS yr, CAST(month(m) AS BIGINT) AS mo,
               CAST(count(o_orderkey) AS BIGINT) AS n_orders
        FROM months LEFT JOIN sub ON date_trunc('MONTH', o_orderdate) = m
        GROUP BY yr, mo ORDER BY yr, mo
        """
    )


def lateral_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery: each customer's top-2 orders by price
    (DQ44).

    The lateral per-row LIMIT decorrelates to a ranked window under
    Catalyst — no per-customer re-execution; same result as the
    ``row_number() <= 2`` formulation but stated in the natural
    "for each row" shape.
    """
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("_lat_orders")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("_lat_customer")
    return spark.sql(
        """
        SELECT c.c_custkey, o.o_orderkey,
               (CAST(floor(o.o_totalprice * CAST(10000.0 AS DOUBLE) + 0.5) AS DOUBLE)
                / CAST(10000.0 AS DOUBLE)) AS price
        FROM _lat_customer c,
        LATERAL (SELECT o_orderkey, o_totalprice FROM _lat_orders
                 WHERE o_custkey = c.c_custkey
                 ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
        WHERE c.c_custkey < 50
        ORDER BY c_custkey, o_orderkey
        """
    )


def null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-handling semantics, pinned cross-engine (DQ48).

    Nulls derived via NULLIF (fixtures have none); exercises the
    count(*) / count(col) / count(DISTINCT col) distinctions, null-safe
    equality (Spark ``<=>`` ≙ DuckDB ``IS NOT DISTINCT FROM``), and
    COALESCE defaulting.  These are exactly the semantics silent data-bug
    hunts hinge on at scale — declared so the oracle pins them.
    """
    li = load_table(spark, sf_dir, "lineitem")
    v = F.expr("nullif(l_linenumber % 3, 0)")
    return (
        li.withColumn("v", v)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.count("v").cast("bigint").alias("n_notnull"),
            F.count_distinct(F.col("v")).cast("bigint").alias("n_distinct"),
            F.sum(F.expr("CASE WHEN v <=> CAST(NULL AS INT) THEN 1 ELSE 0 END"))
            .cast("bigint")
            .alias("n_null_safe"),
            F.sum(F.coalesce("v", F.lit(0))).cast("bigint").alias("sum_coalesced"),
        )
        .orderBy("l_returnflag")
    )


def decimal_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact decimal money aggregation (DQ49).

    Float sums are partition-order-dependent (non-associative IEEE adds);
    DECIMAL sums are exact integers underneath — the SAME answer under any
    shuffle order, any cluster size, any retry.  Computed exactly in
    decimal(18,2)/scale-4 products, presented as double (one deterministic
    final conversion).  This is how money columns should be aggregated at
    100 TB; the float-typed fixtures are cast at scan time.
    """
    li = load_table(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    one = F.lit(1).cast("decimal(3,2)")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.sum(price).cast("double").alias("sum_price"),
            F.sum(price * (one - disc)).cast("double").alias("revenue"),
        )
        .orderBy("l_returnflag")
    )


def integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality audit: referential integrity + key invariants (DQ50).

    The checks a lakehouse runs after every load: orphaned foreign keys
    (anti-joins — NULL-safe, unlike ``NOT IN``), duplicate primary keys,
    null keys.  Each check is one aggregation; small dimension key-sets
    broadcast, big-big anti-joins shuffle on the key like any other join.
    One unioned report frame, stable check names.
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")

    def _count(df, name):
        return df.agg(F.count(F.lit(1)).cast("bigint").alias("n_violations")).select(
            F.lit(name).alias("check_name"), "n_violations"
        )

    dup_keys = cust.agg(
        (F.count("c_custkey") - F.count_distinct(F.col("c_custkey"))).cast("bigint").alias("n_violations")
    ).select(F.lit("dup_customer_keys").alias("check_name"), "n_violations")
    null_fk = _count(orders.filter(F.col("o_custkey").isNull()), "null_order_custkey")
    orphan_orders = _count(
        orders.join(
            F.broadcast(cust.select("c_custkey")),
            F.col("o_custkey") == F.col("c_custkey"),
            "left_anti",
        ),
        "orphan_orders",
    )
    orphan_lineitems = _count(
        li.join(
            orders.select("o_orderkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
            "left_anti",
        ),
        "orphan_lineitems",
    )
    return (
        dup_keys.unionByName(null_fk)
        .unionByName(orphan_lineitems)
        .unionByName(orphan_orders)
        .orderBy("check_name")
    )


def window_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-function breadth: ntile, nth_value, first/last over explicit
    frames, lag with default (DQ51).

    All one window partitioning (custkey-bounded orders) — Catalyst plans
    a single Exchange + sort for every function in the set.  Ordering is
    made total (o_totalprice, o_orderkey) so ranks are deterministic.
    """
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 50)
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    w_all = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            F.ntile(4).over(w).cast("bigint").alias("quartile"),
            round4(F.nth_value("o_totalprice", 2).over(w_all)).alias("second_price"),
            round4(F.first("o_totalprice").over(w_all)).alias("top_price"),
            round4(F.last("o_totalprice").over(w_all)).alias("bottom_price"),
            F.lag("o_orderkey", 1, -1).over(w).cast("bigint").alias("prev_key"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


def exact_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mean/variance/stddev from exact decimal power sums
    (DQ52).

    Built-in ``stddev``/``variance`` stream floating-point accumulators —
    partition-order-dependent in the last ulps, so they can flip a rounded
    digit across engines or cluster sizes.  Computing Σx and Σx² as exact
    DECIMALs (order-independent integer arithmetic) and deriving
    var = (Σx² − (Σx)²/n) / (n−1) with ONE final float division gives
    bit-stable moments under any shuffle — the same trick as dq49 applied
    to second moments.
    """
    li = load_table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("decimal(18,2)")
    agg = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(q).alias("_s"),
        F.sum(q * q).alias("_ss"),
    )
    n = F.col("n").cast("double")
    s = F.col("_s").cast("double")
    ss = F.col("_ss").cast("double")
    var = (ss - (s * s) / n) / (n - F.lit(1.0))
    return agg.select(
        "l_returnflag",
        "n",
        round4(s / n).alias("mean_qty"),
        round4(var).alias("var_qty"),
        round4(F.sqrt(var)).alias("std_qty"),
    ).orderBy("l_returnflag")


def bool_bit_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean and bitwise aggregates (DQ53): bool_and/bool_or ≙ DuckDB
    bool_and/bool_or, bit_and/bit_or/bit_xor on integer keys — all exact,
    order-independent, map-side combinable."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.bool_and(F.col("l_quantity") > 5).alias("all_gt5"),
            F.bool_or(F.col("l_discount") > 0.05).alias("any_disc"),
            F.bit_and(F.col("l_orderkey")).cast("bigint").alias("key_and"),
            F.bit_or(F.col("l_orderkey")).cast("bigint").alias("key_or"),
            F.bit_xor(F.col("l_orderkey")).cast("bigint").alias("key_xor"),
        )
        .orderBy("l_returnflag")
    )


def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: top-10 unshipped orders by revenue (DQ58).

    Classic join-agg-topk: two fact joins shuffle on their keys, the
    aggregation is map-side combinable, and the final top-10 is
    TakeOrderedAndProject — no global sort.  Revenue in exact decimal
    (dq49 discipline), cast once at the end.
    """
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1995-03-15")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1995-03-15")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    one = F.lit(1).cast("decimal(3,2)")
    return (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"])
        .join(li, orders["o_orderkey"] == li["l_orderkey"])
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(price * (one - disc)).cast("double").alias("revenue"))
        .select(
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_date"),
            "o_orderpriority",
            round4(F.col("revenue")).alias("revenue"),
        )
        .orderBy(F.desc("revenue"), "o_orderkey")
        .limit(10)
    )


def tpch_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: customers with any order above a quantity
    threshold (DQ59).

    The IN-subquery over a grouped HAVING decorrelates into an aggregate +
    semi-join; quantity sums are exact decimal so the threshold predicate
    is shuffle-order-stable.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("qty"))
        .filter(F.col("qty") > 150)
        .select("l_orderkey", F.col("qty").cast("double").alias("total_qty"))
    )
    return (
        big.join(orders, big["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .select(
            "c_custkey",
            "o_orderkey",
            round4(F.col("o_totalprice")).alias("o_price"),
            round4(F.col("total_qty")).alias("total_qty"),
        )
        .orderBy("o_orderkey")
    )


def percent_rank_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank + cume_dist over order prices per status (DQ60) —
    the remaining analytic-window pair after dq51; both are pure rank
    arithmetic (deterministic under total ordering)."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 30)
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    return (
        orders.select(
            "o_orderstatus",
            "o_orderkey",
            round4(F.percent_rank().over(w)).alias("pct_rank"),
            round4(F.cume_dist().over(w)).alias("cume"),
        )
        .orderBy("o_orderstatus", "o_orderkey")
    )


def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: min-cost supplier per part via a correlated min (dq65).

    The fixture schema has no partsupp, so lineitem is the part↔supplier
    link; semantics are Q2's exactly — for each part, keep only offers whose
    price equals the minimum over the region-restricted supplier pool
    (correlated scalar subquery in the oracle).  Spark-side the correlation
    decorrelates by hand into a keyed min + self-join — the same plan
    Catalyst produces for the subquery form, written explicitly so the
    broadcast of the per-part min is visible.

    Scale: the per-part min aggregate is map-side combinable and tiny
    (|parts| rows) — broadcast back against the offers; the equality
    predicate on a parquet-stored double is exact (no arithmetic on it).
    """
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region")
    part = load_table(spark, sf_dir, "part")
    eligible = (
        li.join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .join(F.broadcast(nat), supp["s_nationkey"] == nat["n_nationkey"])
        .join(F.broadcast(reg), nat["n_regionkey"] == reg["r_regionkey"])
        .filter(F.col("r_name") == "EUROPE")
        .select("l_partkey", "l_suppkey", "l_extendedprice", "s_acctbal")
    )
    offers = part.filter(F.col("p_size") <= 5).join(
        eligible, part["p_partkey"] == eligible["l_partkey"]
    )
    best = (
        offers.groupBy("p_partkey")
        .agg(F.min("l_extendedprice").alias("best_price"))
        .withColumnRenamed("p_partkey", "bp_partkey")  # lineage-unambiguous self-join key
    )
    return (
        offers.join(
            F.broadcast(best),
            (offers["p_partkey"] == F.col("bp_partkey"))
            & (offers["l_extendedprice"] == F.col("best_price")),
        )
        .select(
            offers["p_partkey"].alias("p_partkey"),
            F.col("l_suppkey").alias("s_suppkey"),
            round4(F.col("best_price")).alias("best_price"),
            round4(F.col("s_acctbal")).alias("s_acctbal"),
        )
        .distinct()
        .orderBy("p_partkey", "s_suppkey")
    )


def tpch_q16_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier counts with an excluded-supplier
    anti-join (dq66).

    The NOT IN subquery (suppliers with negative balance standing in for
    the complaints LIKE) is a left_anti join on the fact side; the oracle
    uses NOT EXISTS so NULL semantics match left_anti exactly.

    Scale: the excluded set is tiny → broadcast anti-join, no shuffle on
    the fact; count(DISTINCT) expands to a two-phase partial/final agg.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    bad = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    joined = (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .filter((F.col("p_brand") != "Brand#1") & (F.col("p_type") != "ECONOMY") & (F.col("p_size") <= 25))
        .join(F.broadcast(bad), li["l_suppkey"] == bad["s_suppkey"], "left_anti")
    )
    return (
        joined.groupBy("p_brand", "p_type", F.col("p_size").cast("bigint").alias("p_size"))
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


def tpch_q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: nested semi-joins — suppliers who shipped more than
    a threshold of 'small%' parts in 1996 (dq67).

    IN (SELECT ... IN (SELECT ...) GROUP BY ... HAVING) nests two levels;
    both lower to semi-joins against aggregates.  Quantity sums are exact
    decimal so the HAVING threshold is shuffle-order-stable.

    Scale: the part-name filter prunes before the fact shuffle; the final
    supplier probe is a broadcast semi-join (|qualifying suppliers| rows).
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")
    wanted_parts = part.filter(F.col("p_name").like("small%")).select("p_partkey")
    heavy = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(F.broadcast(wanted_parts), li["l_partkey"] == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("qty"))
        .filter(F.col("qty") > 200)
        .select("l_suppkey")
    )
    return (
        supp.join(F.broadcast(heavy), supp["s_suppkey"] == F.col("l_suppkey"), "left_semi")
        .select("s_name", round4(F.col("s_acctbal")).alias("s_acctbal"))
        .orderBy("s_name")
    )


def tpch_q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: global-average scalar subquery + anti-join (dq68).

    Customers with above-average (positive) balance and no order since
    2000, aggregated per nation.  The average threshold is compared
    cross-multiplied (``c_acctbal * n > total``) so no division happens —
    the decimal sum and the IEEE multiply are bit-identical cross-engine,
    where a double division could differ in the last ulp right at the
    boundary.

    Scale: the scalar aggregate is one row (broadcast); the anti-join
    shuffles once on custkey; the recency predicate prunes the orders side
    before the shuffle.
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    thresh = (
        cust.filter(F.col("c_acctbal") > 0)
        .agg(
            F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double").alias("total"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )
    )
    recent = orders.filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
    return (
        cust.crossJoin(F.broadcast(thresh))
        .filter(F.col("c_acctbal") * F.col("n") > F.col("total"))
        .join(recent, cust["c_custkey"] == recent["o_custkey"], "left_anti")
        .groupBy(F.col("c_nationkey").cast("bigint").alias("cntry"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("numcust"),
            round4(F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")).alias("totacctbal"),
        )
        .orderBy("cntry")
    )


def group_topk_sample(spark: SparkSession, sf_dir: str, k: int = 5) -> DataFrame:
    """Deterministic per-group sample: exactly min(k, |group|) docs per
    language, membership a pure function of doc_id (dq69).

    Rank-by-portable-hash generalizes dq36's Bernoulli stratified sample to
    EXACT per-stratum sizes — the reservoir-sample shape, derandomized.
    Spark 3.5+ plans the rank filter as WindowGroupLimit: each map task
    keeps only its local top-k per group BEFORE the shuffle (asserted in
    tests/test_relational_plans.py), so shuffle volume is O(k·groups·tasks), not
    O(rows) — the property that makes per-group sampling viable at 100 TB.
    """
    from agile_lakehouse_spark.functions import portable

    docs = load_table(spark, sf_dir, "documents")
    h = F.expr(portable.hex15_spark("CAST(doc_id AS STRING)"))
    w = Window.partitionBy("lang").orderBy(h.asc(), F.col("doc_id").asc())
    return (
        docs.select("lang", "doc_id", F.row_number().over(w).cast("bigint").alias("rk"))
        .filter(F.col("rk") <= k)
        .orderBy("lang", "rk")
    )


def weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-proportional deterministic sampling (dq71): a document's keep
    probability scales with its length, membership a pure function of
    doc_id.

    Keep iff ``(h(doc_id) % 100000) * max_chars < n_chars * 20000`` — i.e.
    p(doc) = 0.2 * n_chars/max_chars, decided entirely in INTEGER
    arithmetic (cross-multiplied, like dq68's average threshold) so no
    float rounding can flip a boundary row between engines.  This is the
    importance-sampling primitive of training-data pipelines (upweight
    long/high-quality docs) in the same derandomized family as dq36/dq69.

    Scale: one broadcast of the 1-row max, one map-side-combinable pass;
    membership survives repartitioning, engine swaps, and cluster resizes.
    """
    from agile_lakehouse_spark.functions import portable

    docs = load_table(spark, sf_dir, "documents")
    maxc = docs.agg(F.max("n_chars").cast("bigint").alias("maxc"))
    h = F.expr(portable.hex15_spark("CAST(doc_id AS STRING)")) % 100000
    keep = (h * F.col("maxc")) < (F.col("n_chars").cast("bigint") * 20000)
    return (
        docs.crossJoin(F.broadcast(maxc))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_total"),
            F.sum(F.when(keep, 1).otherwise(0)).cast("bigint").alias("n_sampled"),
            round4(F.avg(F.when(keep, F.col("n_chars")))).alias("avg_sampled_chars"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# round-2c: TPC-H shape completion (dq74-dq83)
# ---------------------------------------------------------------------------


def tpch_q4_priority_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: order-priority counts gated by an EXISTS (dq74).

    Orders in one quarter that have at least one "late" lineitem (shipped
    more than 60 days after the order date — the fixture's stand-in for
    Q4's commitdate < receiptdate).  The correlated EXISTS decorrelates to
    a left-semi join with a compound condition; counts are exact integers.

    Scale: the quarter predicate prunes orders before the shuffle and the
    semi-join emits each order at most once, so no post-join dedup pass.
    """
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1995-10-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    late = (li["l_orderkey"] == orders["o_orderkey"]) & (
        # timestamp-preserving: date_add would truncate o_orderdate to a
        # DATE, silently diverging from the oracle's + INTERVAL 60 DAY on
        # intraday timestamps
        li["l_shipdate"] > orders["o_orderdate"] + F.expr("INTERVAL 60 DAYS")
    )
    return (
        orders.join(li, late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("bigint").alias("order_count"))
        .orderBy("o_orderpriority")
    )


def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: single-pass predicate aggregation (dq75).

    The simplest scan shape in the suite — every predicate reaches the
    Parquet reader (PushedFilters), the aggregate is one map-side-combined
    decimal sum, and the answer is a single row.  Discount bounds compare
    against the stored doubles directly (no arithmetic on them), so the
    row set is bit-identical cross-engine.
    """
    li = load_table(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(price * disc).cast("double").alias("revenue"),
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        )
    )


def tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bi-directional nation-pair trade volume (dq76).

    Revenue by (supplier nation, customer nation, ship year) for a small
    set of nations, reached through two independent dimension paths
    (lineitem→supplier→nation and lineitem→orders→customer→nation).
    Decimal revenue; year() under the UTC session.

    Scale: both nation paths are broadcast joins (dimension tables);
    only lineitem⋈orders shuffles, on the order key.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier").filter(F.col("s_nationkey") < 3)
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_nationkey") < 3)
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    one = F.lit(1).cast("decimal(3,2)")
    return (
        li.join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("cn_key"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("bigint").alias("l_year"))
        .agg(F.sum(price * (one - disc)).cast("double").alias("volume"))
        .select("supp_nation", "cust_nation", "l_year", round4(F.col("volume")).alias("volume"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by returned-item revenue (dq77).

    Join-agg-topk over a quarter of orders and 'R' lineitems; revenue in
    exact decimal so the ranking key is shuffle-order-stable, tie-broken
    by custkey for full determinism.  Plans as TakeOrderedAndProject.
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    one = F.lit(1).cast("decimal(3,2)")
    return (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"])
        .join(li, orders["o_orderkey"] == li["l_orderkey"])
        .groupBy("c_custkey", "c_name", "c_nationkey")
        .agg(F.sum(price * (one - disc)).cast("double").alias("revenue"))
        .select(
            "c_custkey",
            "c_name",
            F.col("c_nationkey").cast("bigint").alias("c_nationkey"),
            round4(F.col("revenue")).alias("revenue"),
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


def tpch_q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: conditional counts after a fact-fact join (dq78).

    For lineitems shipped in 1996, counts of high- vs low-priority orders
    per linestatus (the fixture carries no shipmode; linestatus is the
    grouping stand-in).  The CASE-sum conditional-aggregation shape is
    exactly Q12's; all outputs are exact integers.
    """
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).cast("bigint").alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


def tpch_q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: customer order-count distribution (dq79).

    LEFT OUTER join with an extra join-side predicate (priority filter
    folded into the join condition, NOT the where clause — the Q13 trap:
    a post-join filter would silently drop zero-order customers), then a
    second aggregation over the counts.  All integers, fully exact.

    Scale: two shuffles (custkey, then count value); the second input is
    one row per customer, negligible.
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    cond = (cust["c_custkey"] == orders["o_custkey"]) & (
        orders["o_orderpriority"] != "3-MEDIUM"
    )
    per_cust = (
        cust.join(orders, cond, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("bigint").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).cast("bigint").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


def tpch_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo revenue share for one month (dq80).

    Conditional decimal sums over a broadcast part join; the percentage is
    a single IEEE division of two exact decimal sums (correctly rounded,
    hence cross-engine stable), then round4.
    """
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    one = F.lit(1).cast("decimal(3,2)")
    rev = price * (one - disc)
    promo = F.col("p_type").startswith("PROMO")
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .agg(
            F.sum(F.when(promo, rev).otherwise(F.lit(0).cast("decimal(21,4)"))).alias("p"),
            F.sum(rev).alias("t"),
        )
        .select(
            F.col("p").cast("double").alias("promo_revenue"),
            F.col("t").cast("double").alias("total_revenue"),
            round4(F.lit(100.0) * F.col("p").cast("double") / F.col("t").cast("double")).alias(
                "promo_pct"
            ),
        )
    )


def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) with the maximum quarterly revenue
    (dq81).

    The revenue view aggregates once; the scalar max is a one-row
    broadcast and the equality filter compares exact decimals, so the
    "ties kept" semantics of Q15 is reproduced without any float
    comparison hazards.
    """
    supp = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    one = F.lit(1).cast("decimal(3,2)")
    rev = li.groupBy("l_suppkey").agg(F.sum(price * (one - disc)).alias("total_rev"))
    mx = rev.agg(F.max("total_rev").alias("max_rev"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_rev") == F.col("max_rev"))
        .join(F.broadcast(supp), F.col("l_suppkey") == supp["s_suppkey"])
        .select(
            "s_suppkey",
            "s_name",
            round4(F.col("total_rev").cast("double")).alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


def tpch_q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-conjunctions predicate join (dq82).

    Three brand/size/quantity bands OR-ed together across a broadcast part
    join — the disjunction cannot be pushed as a single range but Catalyst
    still extracts the common ``p_partkey = l_partkey`` equi-condition, so
    this plans as a hash join with the disjunction as a post-join filter
    (never a nested-loop join).  Decimal revenue + integer count.
    """
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    one = F.lit(1).cast("decimal(3,2)")
    band = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5) & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10) & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(20, 30))
    )
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .filter(band)
        .agg(
            F.sum(price * (one - disc)).cast("double").alias("revenue"),
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        )
        .select(round4(F.col("revenue")).alias("revenue"), "n_lines")
    )


def tpch_q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the sole late shipper (dq83).

    For finished ('F') orders: keep late lineitems (shipped >60 days after
    order) whose order involves MORE than one supplier but where NO OTHER
    supplier was late.  The EXISTS / NOT-EXISTS pair decorrelates into two
    per-order aggregates — distinct suppliers and distinct LATE suppliers —
    joined back in; "no other late supplier" ≡ n_late_supp = 1 given the
    row itself is late.  Counts are exact integers.

    Scale: three shuffles on l_orderkey (late rows, the two per-order
    aggregates), then a broadcast of the 100-row supplier dim; no
    correlated re-execution anywhere.
    """
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = load_table(spark, sf_dir, "lineitem")
    late = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        # timestamp-preserving (see tpch_q4): no DATE truncation
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .select("l_orderkey", "l_suppkey")
    )
    n_supp = (
        li.join(orders.select("o_orderkey"), li["l_orderkey"] == F.col("o_orderkey"))
        .groupBy("l_orderkey")
        .agg(F.countDistinct("l_suppkey").alias("n_supp"))
        .filter(F.col("n_supp") > 1)
        .select(F.col("l_orderkey").alias("ms_orderkey"))
    )
    n_late = (
        late.groupBy("l_orderkey")
        .agg(F.countDistinct("l_suppkey").alias("n_late_supp"))
        .filter(F.col("n_late_supp") == 1)
        .select(F.col("l_orderkey").alias("sl_orderkey"))
    )
    return (
        late.join(n_supp, late["l_orderkey"] == F.col("ms_orderkey"), "left_semi")
        .join(n_late, late["l_orderkey"] == F.col("sl_orderkey"), "left_semi")
        .join(F.broadcast(supp), late["l_suppkey"] == supp["s_suppkey"])
        .groupBy("s_suppkey", "s_name")
        .agg(F.count(F.lit(1)).cast("bigint").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_suppkey")
        .limit(25)
    )


# ---------------------------------------------------------------------------
# round-2c: events product analytics (dq84-dq85)
# ---------------------------------------------------------------------------


def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: view → click → purchase, strictly in sequence
    per user (dq84).

    Stage N counts only users whose earliest stage-N event is strictly
    after their earliest stage-(N-1) event — the standard product-funnel
    semantics (not mere co-occurrence).  Three keyed min-aggregations and
    two broadcast-sized joins; all outputs exact integers.

    Scale: each stage is a map-side-combinable min per user; the join keys
    are user_id throughout so one partitioning serves all stages.
    """
    ev = load_table(spark, sf_dir, "events")
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .join(views, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    buys = (
        ev.filter(F.col("event_type") == "purchase")
        .join(clicks, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_buy"))
    )
    return (
        views.agg(F.count(F.lit(1)).cast("bigint").alias("n_viewed"))
        .crossJoin(clicks.agg(F.count(F.lit(1)).cast("bigint").alias("n_clicked")))
        .crossJoin(buys.agg(F.count(F.lit(1)).cast("bigint").alias("n_purchased")))
    )


def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention cohorts (dq85): users grouped by first-activity
    week, counted in each subsequent activity week.

    Weeks are epoch-aligned integer buckets (``floor(epoch_ms / 7d)``) —
    NOT date_trunc('week'), whose week-start convention is an engine
    property; integer bucket arithmetic is identical everywhere.  Counts
    are exact distinct integers.

    Scale: first-touch is one min-agg per user; the cohort matrix is a
    distinct + group-by over (user, week) pairs — both shuffle on user_id
    first, so AQE can reuse the exchange.
    """
    ev = load_table(spark, sf_dir, "events")
    wk = F.floor(F.unix_timestamp("ts") / F.lit(7 * 86400)).cast("bigint")
    first = ev.select("user_id", wk.alias("w")).groupBy("user_id").agg(
        F.min("w").alias("cohort_week")
    )
    active = ev.select("user_id", wk.alias("active_week")).distinct()
    return (
        active.join(first, "user_id")
        .groupBy("cohort_week", (F.col("active_week") - F.col("cohort_week")).alias("week_offset"))
        .agg(F.countDistinct("user_id").cast("bigint").alias("n_users"))
        .orderBy("cohort_week", "week_offset")
    )


def linear_interpolate_hours(spark: SparkSession, sf_dir: str, max_user: int = 10) -> DataFrame:
    """Linear interpolation over a dense hourly spine (dq90) — the
    time-series counterpart of dq38's forward fill.

    Missing hours get ``prev + (next - prev) * (h - prev_h)/(next_h -
    prev_h)`` between the nearest observed hourly values; leading/trailing
    gaps clamp to the single available neighbor.  Every term is a plain
    IEEE double op evaluated in the same order by both engines (the
    division is bigint/bigint → double in each), so the oracle matches
    bit-for-bit before the final round4.

    Scale: same shape as gap_fill — the spine expands per user inside its
    own task, and the four neighbor lookups ride ONE window partitioning
    (two frame directions over the same sort), so a single Exchange+Sort
    serves the whole interpolation.
    """
    events = load_table(spark, sf_dir, "events").filter(F.col("user_id") < max_user)
    hour = (F.unix_millis(F.col("ts").cast("timestamp")) / F.lit(3600000)).cast("bigint")
    per_hour = events.groupBy("user_id", hour.alias("h")).agg(F.max("value").alias("mx"))
    spine = (
        per_hour.groupBy("user_id")
        .agg(F.min("h").alias("lo"), F.max("h").alias("hi"))
        .select("user_id", F.explode(F.sequence("lo", "hi")).alias("h"))
    )
    joined = spine.join(per_hour, ["user_id", "h"], "left")
    back = (
        Window.partitionBy("user_id")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fwd = (
        Window.partitionBy("user_id")
        .orderBy("h")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_h = F.when(F.col("mx").isNotNull(), F.col("h"))
    prev_v = F.last("mx", ignorenulls=True).over(back)
    prev_h = F.last(obs_h, ignorenulls=True).over(back)
    next_v = F.first("mx", ignorenulls=True).over(fwd)
    next_h = F.first(obs_h, ignorenulls=True).over(fwd)
    interp = (
        F.when(F.col("mx").isNotNull(), F.col("mx"))
        .when(
            prev_v.isNotNull() & next_v.isNotNull(),
            prev_v + (next_v - prev_v) * ((F.col("h") - prev_h) / (next_h - prev_h)),
        )
        .otherwise(F.coalesce(prev_v, next_v))
    )
    return joined.select(
        "user_id",
        "h",
        (F.col("mx").isNotNull()).alias("observed"),
        round4(interp).alias("value_interp"),
    ).orderBy("user_id", "h")


def profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiler over ``orders`` (dq91): one row per column with
    non-null count, distinct count, and min/max — numeric columns in
    ``min_num``/``max_num`` (round4 doubles; timestamps as epoch seconds),
    string columns in ``min_str``/``max_str`` (lexicographic).

    The per-load data-profiling pass every warehouse runs before trusting
    a dataset.  ALL aggregates compute in ONE scan (a single multi-agg
    job); the per-column rows are six projections of that one-row result
    unioned together — no re-scan per column, no string formatting of
    numerics (cross-engine float printing is not stable; numbers stay
    numbers).
    """
    orders = load_table(spark, sf_dir, "orders")
    od_s = F.unix_timestamp("o_orderdate")
    stats = orders.agg(
        F.count("o_orderkey").cast("bigint").alias("nn_ok"),
        F.countDistinct("o_orderkey").cast("bigint").alias("nd_ok"),
        F.min("o_orderkey").cast("double").alias("mn_ok"),
        F.max("o_orderkey").cast("double").alias("mx_ok"),
        F.count("o_custkey").cast("bigint").alias("nn_ck"),
        F.countDistinct("o_custkey").cast("bigint").alias("nd_ck"),
        F.min("o_custkey").cast("double").alias("mn_ck"),
        F.max("o_custkey").cast("double").alias("mx_ck"),
        F.count("o_totalprice").cast("bigint").alias("nn_tp"),
        F.countDistinct("o_totalprice").cast("bigint").alias("nd_tp"),
        F.min("o_totalprice").cast("double").alias("mn_tp"),
        F.max("o_totalprice").cast("double").alias("mx_tp"),
        F.count("o_orderdate").cast("bigint").alias("nn_od"),
        F.countDistinct("o_orderdate").cast("bigint").alias("nd_od"),
        F.min(od_s).cast("double").alias("mn_od"),
        F.max(od_s).cast("double").alias("mx_od"),
        F.count("o_orderstatus").cast("bigint").alias("nn_os"),
        F.countDistinct("o_orderstatus").cast("bigint").alias("nd_os"),
        F.min("o_orderstatus").alias("mn_os"),
        F.max("o_orderstatus").alias("mx_os"),
        F.count("o_orderpriority").cast("bigint").alias("nn_op"),
        F.countDistinct("o_orderpriority").cast("bigint").alias("nd_op"),
        F.min("o_orderpriority").alias("mn_op"),
        F.max("o_orderpriority").alias("mx_op"),
    )
    null_d = F.lit(None).cast("double")
    null_s = F.lit(None).cast("string")

    def _num(name, nn, nd, mn, mx):
        return stats.select(
            F.lit(name).alias("col_name"),
            F.col(nn).alias("n_nonnull"),
            F.col(nd).alias("n_distinct"),
            round4(F.col(mn)).alias("min_num"),
            round4(F.col(mx)).alias("max_num"),
            null_s.alias("min_str"),
            null_s.alias("max_str"),
        )

    def _str(name, nn, nd, mn, mx):
        return stats.select(
            F.lit(name).alias("col_name"),
            F.col(nn).alias("n_nonnull"),
            F.col(nd).alias("n_distinct"),
            null_d.alias("min_num"),
            null_d.alias("max_num"),
            F.col(mn).alias("min_str"),
            F.col(mx).alias("max_str"),
        )

    return (
        _num("o_orderkey", "nn_ok", "nd_ok", "mn_ok", "mx_ok")
        .unionAll(_num("o_custkey", "nn_ck", "nd_ck", "mn_ck", "mx_ck"))
        .unionAll(_num("o_totalprice", "nn_tp", "nd_tp", "mn_tp", "mx_tp"))
        .unionAll(_num("o_orderdate", "nn_od", "nd_od", "mn_od", "mx_od"))
        .unionAll(_str("o_orderstatus", "nn_os", "nd_os", "mn_os", "mx_os"))
        .unionAll(_str("o_orderpriority", "nn_op", "nd_op", "mn_op", "mx_op"))
        .orderBy("col_name")
    )


def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: a supplier nation's market share inside one region,
    by year (dq93) — completes the join-DAG family: customer→nation→region
    restricts the MARKET, supplier→nation tags the SELLER, and the share
    is a conditional sum over the total per year.

    Share = one IEEE division of two exact decimal sums; both paths to
    nation are broadcast dimensions; only lineitem⋈orders shuffles.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    market = (
        cust.join(
            F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"]
        )
        .join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"])
        .filter(F.col("r_name") == "ASIA")
        .select("c_custkey")
    )
    seller = supp.join(
        F.broadcast(nation.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))),
        supp["s_nationkey"] == F.col("sn_key"),
    ).select("s_suppkey", "supp_nation")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    one = F.lit(1).cast("decimal(3,2)")
    vol = price * (one - disc)
    target = F.col("supp_nation") == "NATION_7"
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(market), orders["o_custkey"] == market["c_custkey"], "left_semi")
        .join(F.broadcast(seller), li["l_suppkey"] == seller["s_suppkey"])
        .groupBy(F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(
            F.sum(F.when(target, vol).otherwise(F.lit(0).cast("decimal(21,4)")))
            .cast("double")
            .alias("nation_volume"),
            F.sum(vol).cast("double").alias("total_volume"),
        )
        .select(
            "o_year",
            round4(F.col("nation_volume")).alias("nation_volume"),
            round4(F.col("total_volume")).alias("total_volume"),
            round4(F.col("nation_volume") / F.col("total_volume")).alias("mkt_share"),
        )
        .orderBy("o_year")
    )


def tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit by supplier nation and year for a part-name
    pattern (dq94).

    The fixture has no partsupp, so cost = 10% of p_retailprice × quantity
    (the same two-fact-one-dim profit arithmetic, partsupp's role played
    by part).  Profit stays decimal end-to-end — revenue(21,4) minus
    cost(25,5) — so group sums are shuffle-order-independent.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").contains("gear"))
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    one = F.lit(1).cast("decimal(3,2)")
    qty = F.col("l_quantity").cast("decimal(18,2)")
    cost_rate = F.col("p_retailprice").cast("decimal(18,2)") * F.lit(0.1).cast("decimal(3,2)")
    profit = price * (one - disc) - cost_rate * qty
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .join(F.broadcast(nation), supp["s_nationkey"] == nation["n_nationkey"])
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
        )
        .agg(F.sum(profit).cast("double").alias("sum_profit"))
        .select("nation", "o_year", round4(F.col("sum_profit")).alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


def tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose held value exceeds a global fraction
    (dq95).

    Inventory value per part (from one nation's suppliers) vs a scalar
    global-total subquery; the fraction test is CROSS-MULTIPLIED in exact
    decimals (``value * 2000 > total``, i.e. value > 0.05% of total) so no
    float division sits on the decision boundary — dq68's discipline.
    """
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier").filter(F.col("s_nationkey") == 7)
    value = (F.col("l_extendedprice").cast("decimal(18,2)") * F.col("l_quantity").cast("decimal(18,2)"))
    held = (
        li.join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .groupBy("l_partkey")
        .agg(F.sum(value).alias("part_value"))
    )
    total = held.agg(F.sum("part_value").alias("total_value"))
    return (
        held.crossJoin(F.broadcast(total))
        .filter(F.col("part_value") * 2000 > F.col("total_value"))
        .select("l_partkey", round4(F.col("part_value").cast("double")).alias("part_value"))
        .orderBy(F.desc("part_value"), "l_partkey")
    )


def keyset_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyset (cursor) pagination via row-value comparison (dq96).

    Page N of a composite-ordered scan fetched as ``(k1, k2) > (cursor)``
    + LIMIT — struct comparison maps to DuckDB's row-value comparator.
    At scale this is THE pagination pattern: the predicate pushes into the
    scan and reads one page, where OFFSET must sort-and-skip every
    preceding row on every request.
    """
    li = load_table(spark, sf_dir, "lineitem")
    cursor = F.struct(F.lit(500).cast("bigint"), F.lit(3).cast("int"))
    return (
        li.filter(F.struct(F.col("l_orderkey"), F.col("l_linenumber")) > cursor)
        .select("l_orderkey", "l_linenumber", round4(F.col("l_extendedprice")).alias("price"))
        .orderBy("l_orderkey", "l_linenumber")
        .limit(50)
    )


def map_function_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-type construction + lookup (dq97): per-user event-type count
    MAP assembled with ``map_from_entries`` over a ``collect_list`` of
    (type, n) structs, then probed by key.

    Maps never reach the output (hash comparison of map ordering is
    engine-specific); they are built, transformed (``map_keys``), and
    extracted from — the full map-function surface under a scalar-output
    oracle.  One aggregation per (user, type), one per user.
    """
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 40)
    per_type = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    m = F.map_from_entries(
        F.sort_array(F.collect_list(F.struct("event_type", "n")))
    )
    return (
        per_type.groupBy("user_id")
        .agg(m.alias("counts"))
        .select(
            "user_id",
            F.size(F.map_keys(F.col("counts"))).cast("bigint").alias("n_types"),
            F.coalesce(F.element_at(F.col("counts"), "click"), F.lit(0)).cast("bigint").alias("n_click"),
            F.coalesce(F.element_at(F.col("counts"), "purchase"), F.lit(0)).cast("bigint").alias("n_purchase"),
        )
        .orderBy("user_id")
    )


def latest_state_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC compaction: keep each user's LATEST event per type (dq98) —
    the "current state from a changelog" pattern every CDC/upsert pipeline
    runs (Debezium streams, Kafka compaction, MERGE staging).

    row_number over (key ORDER BY ts DESC, event_id DESC) = 1; the
    event_id tie-break makes "latest" total even for equal timestamps.
    Spark 3.5+ plans the rn=1 filter as WindowGroupLimit — per-task top-1
    per key BEFORE the shuffle, O(keys·tasks) shuffle volume (same
    property dq69 asserts).
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            "event_id",
            round4(F.col("value")).alias("last_value"),
        )
        .orderBy("user_id", "event_type")
    )


def union_by_name_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution union (dq99): two projections with different
    column sets and orders combined with ``unionByName(allowMissing
    Columns=True)`` — positional UNION would silently misalign columns;
    by-name union with NULL fill is how evolving table versions append.

    The batch analogue of plans/snapshots.py's version-schema reads,
    declared so the resolution semantics sit under the oracle gate.
    """
    orders = load_table(spark, sf_dir, "orders")
    old = orders.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", F.col("o_orderstatus").alias("status")
    )
    new = orders.filter(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey",
        F.col("o_orderstatus").alias("status"),
        round4(F.col("o_totalprice")).alias("price"),
    )
    return (
        old.unionByName(new, allowMissingColumns=True)
        .groupBy("status")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.count("price").cast("bigint").alias("n_with_price"),
            round4(F.sum(F.col("price").cast("decimal(18,4)")).cast("double")).alias("sum_price"),
        )
        .orderBy("status")
    )


def listagg_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic LISTAGG / string_agg (dq100): per order-priority, the
    lexicographically-sorted '|'-joined set of customer names with open
    orders over a price threshold.

    collect_list order is partition-arbitrary — NEVER emit it raw; sorting
    the collected set (sort_array ≙ ORDER BY inside string_agg) is what
    makes distributed string aggregation deterministic.  The set is
    bounded (DISTINCT names above a tight threshold) so the row stays
    metadata-sized — the listagg discipline at scale.
    """
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderstatus") == "O") & (F.col("o_totalprice") > 400000)
    )
    cust = load_table(spark, sf_dir, "customer")
    return (
        orders.join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.array_join(F.sort_array(F.collect_set("c_name")), "|").alias("customer_names"),
        )
        .orderBy("o_orderpriority")
    )


def first_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """min_by / max_by attribution (dq101): each user's first- and
    last-touch event types plus their peak value — the marketing
    attribution shape, via argmin/argmax aggregates instead of two window
    passes.

    Keyed on the UNIQUE event_id (arrival order proxy): min_by/max_by on
    a non-unique key is nondeterministic under partitioning — the classic
    silent-flakiness source; a unique total key is the discipline.  One
    map-side-combinable aggregation, no window, no shuffle beyond the
    group-by.
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(
            F.min_by("event_type", "event_id").alias("first_touch"),
            F.max_by("event_type", "event_id").alias("last_touch"),
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            round4(F.max("value")).alias("peak_value"),
        )
        .orderBy("user_id")
    )


def events_since_last_purchase(spark: SparkSession, sf_dir: str, max_user: int = 20) -> DataFrame:
    """Running-reset window (dq104): for every event, how many events the
    user has produced since their most recent 'purchase' (the
    sessionize-by-marker-event pattern — spend-since-reset, errors-since-
    deploy, and retries-since-success are all this shape).

    Two frames over ONE window sort: a running count of markers partitions
    the stream into reset epochs; a second count within (user, epoch)
    ranks events since the marker.  All integers, total tie-break by
    event_id.
    """
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < max_user)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    epoch = F.sum(
        F.when(F.col("event_type") == "purchase", 1).otherwise(0)
    ).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    we = Window.partitionBy("user_id", "epoch").orderBy("ts", "event_id")
    return (
        ev.withColumn("epoch", epoch)
        .withColumn("n_since", (F.row_number().over(we) - 1).cast("bigint"))
        .select(
            "event_id",
            "user_id",
            F.col("epoch").cast("bigint").alias("epoch"),
            # a purchase itself starts epoch N with n_since=0
            "n_since",
        )
        .orderBy("event_id")
    )


def percent_of_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-of-total window (dq105): each order's share of its
    customer's total spend — the BI ratio-to-report pattern.

    The denominator is an exact decimal sum OVER the partition (one
    Exchange, no self-join with a grouped aggregate — the naive form
    scans twice); the share is a single IEEE division of that exact sum,
    then round4.
    """
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 50)
    w = Window.partitionBy("o_custkey")
    total = F.sum(F.col("o_totalprice").cast("decimal(18,2)")).over(w)
    return (
        orders.select(
            "o_orderkey",
            "o_custkey",
            round4(F.col("o_totalprice")).alias("price"),
            round4(
                F.lit(100.0) * F.col("o_totalprice") / total.cast("double")
            ).alias("pct_of_customer"),
        )
        .orderBy("o_orderkey")
    )


def date_function_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time scalar breadth (dq109), complementing dq17: datediff,
    add_months, last_day, quarter, dayofweek, weekofyear arithmetic —
    all integer/date-exact (no timezone-dependent wall-clock math; the
    session is pinned UTC and the fixture timestamps are naive)."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    d = F.col("o_orderdate")
    return orders.select(
        "o_orderkey",
        F.datediff(F.lit("2000-01-01").cast("date"), d.cast("date")).cast("bigint").alias("days_to_y2k"),
        F.date_format(F.add_months(d, 3), "yyyy-MM-dd").alias("plus_quarter"),
        F.date_format(F.last_day(d), "yyyy-MM-dd").alias("month_end"),
        F.quarter(d).cast("bigint").alias("qtr"),
        F.dayofweek(d).cast("bigint").alias("dow"),
        F.dayofyear(d).cast("bigint").alias("doy"),
    ).orderBy("o_orderkey")


def string_function_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String scalar breadth (dq110), complementing dq18: pad, reverse,
    repeat, split_part, strpos, left/right, translate — the porting
    surface a reference user hits first.  ASCII-only inputs so collation
    and unicode-width differences cannot leak in."""
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 200)
    n = F.col("c_name")
    return cust.select(
        "c_custkey",
        F.lpad(n, 20, ".").alias("padded"),
        F.reverse(n).alias("rev"),
        F.repeat(F.substring(n, 1, 3), 2).alias("rep"),
        F.split(n, "#").getItem(0).alias("name_part"),
        F.instr(n, "#").cast("bigint").alias("hash_pos"),
        F.substring(n, 1, 4).alias("l4"),
        n.substr(F.length(n) - 3, F.lit(4)).alias("r4"),
        F.translate(n, "#", "-").alias("dashed"),
    ).orderBy("c_custkey")


def math_function_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math scalar breadth (dq111): abs/sign/mod/pmod, greatest/least,
    ceil/floor, sqrt, integer power — every function here is IEEE-exact
    or integer (sqrt is correctly rounded per IEEE-754; ln/exp/trig are
    LIBM-DEPENDENT and deliberately excluded from the oracle-matched
    surface — engines may differ in the last ulp)."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 500)
    q = F.col("l_quantity")
    p = F.col("l_extendedprice")
    return li.select(
        "l_orderkey",
        F.col("l_linenumber").cast("bigint").alias("line"),
        F.abs(q - 25).alias("abs_dev"),
        F.signum(q - 25).cast("bigint").alias("sign_dev"),
        (F.col("l_partkey") % 7).cast("bigint").alias("mod7"),
        F.greatest(q, F.lit(10.0)).alias("at_least_10"),
        F.least(q, F.lit(40.0)).alias("at_most_40"),
        F.ceil(q / 8).cast("bigint").alias("ceil8"),
        F.floor(q / 8).cast("bigint").alias("floor8"),
        round4(F.sqrt(p)).alias("sqrt_price"),
        (q * q).alias("q_squared"),
    ).orderBy("l_orderkey", "line")


def null_function_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-handling scalar breadth (dq112), extending dq48's aggregate
    semantics to the scalar surface: nullif/coalesce chains, nvl2-style
    branching, null propagation through greatest/least (BOTH engines skip
    NULLs there — pinned, because several databases return NULL instead),
    and null-safe equality as a projected value."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 300)
    v = F.nullif(F.col("l_linenumber") % 3, F.lit(0))
    return li.select(
        "l_orderkey",
        F.col("l_linenumber").cast("bigint").alias("line"),
        v.cast("bigint").alias("v"),
        F.coalesce(v, F.col("l_linenumber"), F.lit(-1)).cast("bigint").alias("coalesced"),
        F.when(v.isNotNull(), F.lit("set")).otherwise(F.lit("unset")).alias("nvl2_style"),
        F.greatest(v, F.lit(1)).cast("bigint").alias("greatest_skips_null"),
        (v.eqNullSafe(F.lit(1))).alias("null_safe_eq_1"),
        v.isNull().alias("is_null"),
    ).orderBy("l_orderkey", "line")


def bitwise_function_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar bitwise breadth (dq113), the expression-level complement of
    dq53's bit aggregates: and/or/xor/not, shifts — all exact int64
    (the layout engine's Morton keys live on these; dq70/dq102 prove the
    composition, this pins the primitives)."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 300)
    k = F.col("l_partkey").cast("bigint")
    return li.select(
        "l_orderkey",
        F.col("l_linenumber").cast("bigint").alias("line"),
        k.bitwiseAND(F.lit(255)).alias("and255"),
        k.bitwiseOR(F.lit(4096)).alias("or4096"),
        k.bitwiseXOR(F.col("l_suppkey")).alias("xor_supp"),
        F.expr("~CAST(l_partkey AS BIGINT)").alias("inverted"),
        F.shiftleft(k, 3).alias("shl3"),
        F.shiftright(k, 2).alias("shr2"),
    ).orderBy("l_orderkey", "line")


def array_function_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-function breadth (dq114), beyond dq45's higher-order fns:
    set algebra (union/intersect/except), membership, position, slicing,
    flatten — every array OUTPUT is sorted first, because Spark's set
    operations preserve first-seen order while DuckDB's preserve theirs:
    unordered-set results must never be compared as ordered lists.
    Array outputs are then serialized with ``array_join`` (dq29 pattern)
    so every top-level column is scalar — the driver's pandas
    canonicalizer cannot hash list-valued cells."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 30)
    per_user = ev.groupBy("user_id").agg(
        F.sort_array(F.collect_set("event_type")).alias("types")
    )
    fixed = F.array(F.lit("view"), F.lit("click"), F.lit("order"))
    return per_user.select(
        "user_id",
        F.array_join(F.col("types"), ",").alias("types_csv"),
        F.array_join(
            F.sort_array(F.array_union(F.col("types"), fixed)), ","
        ).alias("union_fixed"),
        F.array_join(
            F.sort_array(F.array_intersect(F.col("types"), fixed)), ","
        ).alias("intersect_fixed"),
        F.array_join(
            F.sort_array(F.array_except(F.col("types"), fixed)), ","
        ).alias("except_fixed"),
        F.array_contains(F.col("types"), "purchase").alias("has_purchase"),
        F.array_position(F.col("types"), "click").cast("bigint").alias("click_pos"),
        F.array_join(F.slice(F.col("types"), 1, 2), ",").alias("first_two"),
        F.size(F.flatten(F.array(F.col("types"), fixed))).cast("bigint").alias("flat_size"),
    ).orderBy("user_id")


def variant_extract_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured VARIANT path over events ``props`` (DQ121).

    Spark 4's VARIANT type is the lakehouse answer to schemaless columns:
    ``parse_json`` once into a binary variant, then typed ``variant_get``
    path extraction — the encoded form is cheaper to re-extract than raw
    JSON strings and is the type Delta/Iceberg shred into typed subcolumns
    at scale.  ``try_variant_get`` on a missing path yields NULL (not an
    error) — pinned by the ``n_missing`` output.  The oracle reads the
    same paths with DuckDB's JSON extraction, so only the parse
    representation differs, never the values.
    """
    events = load_table(spark, sf_dir, "events")
    v = events.withColumn("v", F.parse_json("props"))
    k = F.expr("variant_get(v, '$.k', 'bigint')")
    missing = F.expr("try_variant_get(v, '$.absent', 'bigint')")
    return (
        v.withColumn("k", k)
        .withColumn("absent", missing)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.min("k").cast("bigint").alias("min_k"),
            F.max("k").cast("bigint").alias("max_k"),
            F.sum("k").cast("bigint").alias("sum_k"),
            F.count("absent").cast("bigint").alias("n_missing"),
        )
        .orderBy("event_type")
    )


def try_arithmetic_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe arithmetic surface (DQ125): ``try_divide`` /
    ``try_multiply`` / ``try_cast`` return NULL instead of failing the
    job on division-by-zero / int64 overflow / malformed casts.

    At 100 TB this is the difference between a 20-hour job dying at hour
    19 on one bad row and a NULL you can count: every migration from
    non-ANSI engines (Hive semantics) hits it.  The oracle reproduces the
    NULL outcomes with guard expressions (``nullif``, CASE) — semantics,
    not syntax, are what's pinned.
    """
    orders = load_table(spark, sf_dir, "orders")
    safe_div = F.expr("try_divide(o_totalprice, CAST(o_custkey % 7 AS DOUBLE))")
    big = 9_223_372_036_854_775_807
    safe_mul = F.expr(f"try_multiply(o_orderkey, {big}L)")
    # digits-only priority prefix casts; the alpha suffix rows yield NULL
    safe_cast = F.expr("try_cast(substring(o_orderpriority, 1, 1) AS BIGINT)")
    return (
        orders.select(
            F.col("o_orderstatus").alias("status"),
            safe_div.alias("sd"),
            safe_mul.alias("sm"),
            safe_cast.alias("sc"),
        )
        .groupBy("status")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum(F.when(F.col("sd").isNull(), 1).otherwise(0)).cast("bigint").alias("n_div_null"),
            # floor before summing: Σ of raw double quotients is shuffle-
            # order-dependent in the last decimals; Σ of their floors is
            # an exact integer under any reduction order
            F.sum(F.floor("sd")).cast("bigint").alias("sum_div_floor"),
            F.sum(F.when(F.col("sm").isNull(), 1).otherwise(0)).cast("bigint").alias("n_mul_overflow"),
            F.sum("sc").cast("bigint").alias("sum_prio_digit"),
        )
        .orderBy("status")
    )


def table_diff(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Row-level diff of two relations sharing a key (DQ132): classify
    every key as ``added`` (right only), ``removed`` (left only),
    ``changed`` (both, any compare column differs NULL-safely) or
    ``unchanged``.  The data-ops primitive behind migration validation,
    CDC reconciliation, and snapshot comparison.

    ONE full outer join on the key; comparison is ``<=>`` per column so
    NULLs diff correctly.  At 100 TB both sides shuffle once on the key —
    there is no cheaper exact diff — and the output is the per-class
    count summary, never a materialized row dump.
    """
    lk = [F.col(f"l.{k}") for k in key_cols]
    rk = [F.col(f"r.{k}") for k in key_cols]
    cond = None
    for k in key_cols:
        c = F.col(f"l.{k}") == F.col(f"r.{k}")
        cond = c if cond is None else cond & c
    j = left.alias("l").join(right.alias("r"), cond, "full_outer")
    in_l = lk[0].isNotNull()
    in_r = rk[0].isNotNull()
    same = None
    for c in compare_cols:
        eq = F.col(f"l.{c}").eqNullSafe(F.col(f"r.{c}"))
        same = eq if same is None else same & eq
    cls = (
        F.when(in_l & ~in_r, F.lit("removed"))
        .when(~in_l & in_r, F.lit("added"))
        .when(same, F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return (
        j.select(cls.alias("class"))
        .groupBy("class")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"))
        .orderBy("class")
    )


def scd2_history(spark: SparkSession, sf_dir: str, max_user: int = 20) -> DataFrame:
    """Slowly-changing-dimension Type 2 build (DQ133): turn a changelog
    into validity intervals — each change opens a version at its own
    timestamp and closes at the NEXT change (open-ended for the current
    version).  ``lead()`` over one (key, time) window sort; the warehouse
    op behind every dimension table with history.

    Epochs emitted as integer microseconds (exact; Spark ``unix_micros``
    ≙ DuckDB ``epoch_us``); event_id tie-breaks equal timestamps so
    versions are total-ordered under any shuffle.
    """
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < max_user)
    ms = F.expr("unix_micros(ts)").cast("bigint")
    return (
        ev.select(
            "user_id",
            "event_id",
            F.col("value").alias("attr_value"),
            ms.alias("valid_from"),
        )
        .withColumn("version", F.row_number().over(Window.partitionBy("user_id").orderBy("valid_from", "event_id")).cast("bigint"))
        .withColumn(
            "valid_to",
            F.lead("valid_from").over(
                Window.partitionBy("user_id").orderBy("valid_from", "event_id")
            ),
        )
        .withColumn("is_current", F.col("valid_to").isNull())
        .select("user_id", "version", "event_id", round4(F.col("attr_value")).alias("attr_value"), "valid_from", "valid_to", "is_current")
        .orderBy("user_id", "version")
    )


def resample_interpolate(
    df,
    ts_col: str = "ts",
    key_col: str = "user_id",
    val_col: str = "value",
    step_s: int = 3600,
):
    """Per-key time-series resampling with LINEAR interpolation: emit one
    row per ``step_s``-second grid slot inside each key's [min(ts),
    max(ts)] span, valued by interpolating between the bracketing events
    (the TimescaleDB ``time_bucket_gapfill`` + ``interpolate`` shape).

    One union (events + generated spine) and TWO windows per key — a
    forward pass carrying the previous event's (t, v) and a reverse pass
    carrying the next's — then a pure projection does the interpolation
    arithmetic.  No asof join per grid point, no per-slot probe: cost is
    O(events + slots) rows through two sorts on the key partition, the
    shape that holds when keys number in the millions.

    Numeric portability: timestamps become integer MICROS before any
    arithmetic (exact in both engines; the fraction divides two integer
    deltas cast to double), events at an identical (key, micro) collapse
    by avg first so window tie order can't differ between engines.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from agile_lakehouse_spark.functions.portable import round4

    step_us = step_s * 1_000_000
    e0 = (
        df.select(
            F.col(key_col), F.unix_micros(F.col(ts_col)).alias("t_us"),
            F.col(val_col).cast("double").alias("v"),
        )
        .groupBy(key_col, "t_us")
        .agg(F.avg("v").alias("v"))
    )
    bounds = e0.groupBy(key_col).agg(F.min("t_us").alias("lo"), F.max("t_us").alias("hi"))
    # exact integer floor-div: double division of ~1e15 epochs can land a
    # hair under an integer and truncate one slot off vs the oracle's //.
    # The start > end case (a key's whole span inside one step) MUST
    # short-circuit to an empty spine: Spark's sequence(a, b) with a > b
    # yields a DESCENDING sequence (two phantom slots outside the span,
    # NULL interpolation), where the oracle's generate_series is empty —
    # the same descending-sequence pitfall as the round-3 n-gram crash.
    # TRUE floor division, not Spark's `div` (truncation toward zero):
    # the DuckDB oracle's `//` floors, and for pre-1970 timestamps
    # (negative epoch micros) trunc and floor disagree by one slot.
    # floor_div(a, b) for b > 0 == (a - pmod(a, b)) div b — pmod is
    # non-negative, the subtraction lands on an exact multiple, and div
    # of an exact multiple is floor.  All-integer, exact at 1e15.
    first = f"((lo + {step_us - 1}) - pmod(lo + {step_us - 1}, {step_us})) div {step_us}"
    last = f"(hi - pmod(hi, {step_us})) div {step_us}"
    spine = bounds.select(
        F.col(key_col),
        F.explode(
            F.expr(
                f"CASE WHEN {first} <= {last} "
                f"THEN sequence({first}, {last}) "
                f"ELSE CAST(array() AS ARRAY<BIGINT>) END"
            )
        ).alias("slot"),
    )
    u = e0.select(key_col, "t_us", "v", F.lit(1).alias("is_ev")).unionByName(
        spine.select(
            F.col(key_col),
            (F.col("slot") * step_us).alias("t_us"),
            F.lit(None).cast("double").alias("v"),
            F.lit(0).alias("is_ev"),
        )
    )
    fwd = (
        Window.partitionBy(key_col)
        .orderBy(F.col("t_us").asc(), F.col("is_ev").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    bwd = (
        Window.partitionBy(key_col)
        .orderBy(F.col("t_us").desc(), F.col("is_ev").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    ev_v = F.when(F.col("is_ev") == 1, F.col("v"))
    ev_t = F.when(F.col("is_ev") == 1, F.col("t_us"))
    w = u.select(
        key_col, "t_us", "is_ev",
        F.last(ev_v, ignorenulls=True).over(fwd).alias("pv"),
        F.last(ev_t, ignorenulls=True).over(fwd).alias("pt"),
        F.last(ev_v, ignorenulls=True).over(bwd).alias("nv"),
        F.last(ev_t, ignorenulls=True).over(bwd).alias("nt"),
    )
    frac = (F.col("t_us") - F.col("pt")).cast("double") / (
        F.col("nt") - F.col("pt")
    ).cast("double")
    interp = F.when(F.col("nt") == F.col("pt"), F.col("pv")).otherwise(
        F.col("pv") + (F.col("nv") - F.col("pv")) * frac
    )
    return (
        w.filter(F.col("is_ev") == 0)
        .select(
            F.col(key_col).cast("bigint").alias(key_col),
            # floor, like the oracle's `//` (negative t_us = pre-1970)
            F.expr("(t_us - pmod(t_us, 1000000)) div 1000000").alias("slot_s"),
            round4(interp).alias("v_interp"),
        )
        .orderBy(key_col, "slot_s")
    )


def profile_table(df):
    """One-pass data-profiling summary: one OUTPUT row per column with
    row count, null count, exact distinct count, and a type-portable
    min/max (numerics as doubles, dates as days-since-epoch, strings by
    LENGTH — engine-neutral, unlike string-rendering a double).

    The whole profile is ONE aggregate over the table (Spark plans the
    multi-count-distinct via expand, still a single scan + one shuffle),
    then a driver-side pivot of the 1-row result into the per-column
    frame — profile output is O(columns), never data-sized.
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from agile_lakehouse_spark.functions.portable import round4

    num = (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
           T.FloatType, T.DoubleType, T.DecimalType)
    aggs, cols = [], []
    for f in df.schema.fields:
        c = f.name
        if isinstance(f.dataType, num):
            lo, hi = F.min(F.col(c).cast("double")), F.max(F.col(c).cast("double"))
        elif isinstance(f.dataType, T.DateType):
            lo = F.min(F.datediff(F.col(c), F.lit("1970-01-01")).cast("double"))
            hi = F.max(F.datediff(F.col(c), F.lit("1970-01-01")).cast("double"))
        elif isinstance(f.dataType, T.TimestampType):
            lo = F.min(F.unix_micros(F.col(c)).cast("double") / 1_000_000.0)
            hi = F.max(F.unix_micros(F.col(c)).cast("double") / 1_000_000.0)
        elif isinstance(f.dataType, T.StringType):
            lo, hi = F.min(F.length(c).cast("double")), F.max(F.length(c).cast("double"))
        else:
            continue
        cols.append(c)
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__n"),
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"{c}__nulls"),
            F.countDistinct(c).alias(f"{c}__distinct"),
            lo.alias(f"{c}__lo"),
            hi.alias(f"{c}__hi"),
        ]
    row = df.agg(*aggs).collect()[0]
    out = [
        (
            c,
            int(row[f"{c}__n"]),
            int(row[f"{c}__nulls"]),
            int(row[f"{c}__distinct"]),
            float(row[f"{c}__lo"]) if row[f"{c}__lo"] is not None else None,
            float(row[f"{c}__hi"]) if row[f"{c}__hi"] is not None else None,
        )
        for c in cols
    ]
    spark = df.sparkSession
    res = spark.createDataFrame(
        out,
        "column string, n_rows bigint, n_nulls bigint, n_distinct bigint, "
        "min_v double, max_v double",
    )
    return res.select(
        "column", "n_rows", "n_nulls", "n_distinct",
        round4(F.col("min_v")).alias("min_v"), round4(F.col("max_v")).alias("max_v"),
    ).orderBy("column")


def sessionize_capped(
    df,
    gap_s: int = 1800,
    cap_s: int = 7200,
    ts_col: str = "ts",
    key_col: str = "user_id",
    seq_col: str = "event_id",
):
    """Sessionization with BOTH a max-gap rule and a max-DURATION cap —
    the production nuance plain gaps-and-islands misses (a bot emitting
    one event a minute forever would otherwise make one unbounded
    session, unbounded per-session state at 100 TB).

    Gap islands form as usual (lag + running sum); each island is then
    split at absolute ``cap_s``-sized offsets from ITS start
    (``floor((ts - island_start) / cap)``) — a deterministic, windowed
    rule (the last-reset variant is inherently sequential; the anchored
    split is the portable, parallelizable formulation and bounds every
    session's duration by cap_s all the same).

    Three window passes over one (key, ts) partitioning — Catalyst
    reuses a single Exchange for all of them.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W

    ts_ms = F.unix_millis(F.col(ts_col).cast("timestamp"))
    order = W.partitionBy(key_col).orderBy(ts_col, seq_col)
    running = order.rowsBetween(W.unboundedPreceding, W.currentRow)
    prev = F.lag(ts_ms).over(order)
    new_island = F.when(prev.isNull() | ((ts_ms - prev) > gap_s * 1000), 1).otherwise(0)
    with_isl = df.withColumn("t_ms", ts_ms).withColumn(
        "island", F.sum(new_island).over(running)
    )
    isl_start = F.min("t_ms").over(W.partitionBy(key_col, "island"))
    with_sub = with_isl.withColumn("isl_start", isl_start).withColumn(
        "sub", F.expr(f"(t_ms - isl_start) div {cap_s * 1000}")
    )
    return (
        with_sub.groupBy(
            F.col(key_col).cast("bigint").alias(key_col),
            F.col("island").cast("bigint").alias("island"),
            F.col("sub").cast("bigint").alias("sub_session"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.min("t_ms").alias("start_ms"),
            F.max("t_ms").alias("end_ms"),
        )
        .orderBy(key_col, "island", "sub_session")
    )

