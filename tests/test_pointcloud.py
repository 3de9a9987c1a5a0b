"""Point-cloud operator semantics (reference benchmark.rs parity rules)."""

import pytest
from pyspark.sql import functions as F

from agile_lakehouse_spark.operators import pointcloud as pc
from agile_lakehouse_spark.plans import explain
from agile_lakehouse_spark.schema import PC_DIMENSION, dimensions, importance, validate
from agile_lakehouse_spark.sources.catalog import points_view


@pytest.fixture(scope="module")
def points(spark, sf_dir):
    return points_view(spark, sf_dir).cache()


def test_schema_metadata(points):
    assert dimensions(points.schema) == ["x", "y", "z", "i"]
    assert importance(points.schema) == "i"
    validate(points.schema)  # >= 3 numeric dims
    assert points.schema["x"].metadata[PC_DIMENSION] == 1


def test_half_open_range(points, spark):
    """Right-open upper bound: a point exactly AT the bound is excluded."""
    xmax = points.agg(F.max("x")).collect()[0][0]
    box = {"x": (0.0, xmax)}
    n_open = pc.range_query(points, box).count()
    n_all = points.count()
    n_at_bound = points.filter(F.col("x") == xmax).count()
    assert n_open == n_all - n_at_bound
    assert n_at_bound >= 1


def test_importance_closed_bound_rule(points):
    """i-dimension upper bound becomes <= when hi >= 1 (compute.rs:188-190):
    sampling at p=1.0 must keep every row."""
    n = points.count()
    assert pc.sample(points, p=1.0).count() == n
    # and p=0.5 keeps roughly half (i is uniform-ish)
    frac = pc.sample(points, p=0.5).count() / n
    assert 0.4 < frac < 0.6


def test_circle_subset_of_bbox(points):
    cx, cy, r = 500.0, 500.0, 100.0
    circ = pc.circle_query(points, cx, cy, r)
    bbox = pc.range_query(points, {"x": (cx - r, cx + r), "y": (cy - r, cy + r)})
    assert circ.count() <= bbox.count()
    worst = circ.select(
        (F.pow(F.col("x") - cx, 2) + F.pow(F.col("y") - cy, 2)).alias("d2")
    ).agg(F.max("d2")).collect()[0][0]
    assert worst < r * r


def test_knn_exact_and_plan(points):
    out = pc.knn(points, 500.0, 500.0, 50)
    rows = out.collect()
    assert len(rows) == 50
    dists = [r.dist2 for r in rows]
    assert dists == sorted(dists)
    # top-k must plan as TakeOrderedAndProject, not a global sort
    assert explain.is_top_k(out)


def test_knn_approx_may_undershoot(points):
    # reference heuristic: bbox r=sqrt(k/10); on sparse data returns < k
    out = pc.knn_approx(points, 500.0, 500.0, 1000)
    assert out.count() <= 1000


def test_bounds_single_pass(spark, sf_dir):
    # fresh (uncached) view: the cached fixture's InMemoryRelation printout
    # embeds its own plan and would double-count exchanges
    b = pc.bounds(points_view(spark, sf_dir), ["x", "y", "z", "i"])
    row = b.collect()[0]
    assert row["x_min"] <= row["x_max"]
    assert 0.0 <= row["i_min"] and row["i_max"] <= 1.0
    assert explain.num_shuffles(b) <= 1  # one partial/final agg, no extra exchange


def test_grid_cells_conserve_count(points):
    g = pc.grid_cells(points, {"x": 100.0, "y": 100.0})
    total = g.groupBy("cell_x", "cell_y").count().agg(F.sum("count")).collect()[0][0]
    assert total == points.count()


def test_quadtree_levels(points):
    qt = pc.quadtree_cells(points, depth=2, side=1024.0)
    levels = {r.level for r in qt.select("level").distinct().collect()}
    assert levels <= {0, 1, 2}
    assert qt.count() == points.count()
    # deeper level -> finer cells -> more distinct cells
    per_level = {
        r["level"]: r["n"]
        for r in qt.groupBy("level").agg(F.countDistinct("qx", "qy").alias("n")).collect()
    }
    if 0 in per_level and 2 in per_level:
        assert per_level[2] >= per_level[0]


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").filter(F.col("l_quantity") > 30)
    assert explain.has_pushed_filters(li)


def test_column_pruning(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select("l_orderkey", "l_quantity")
    read_cols = explain.read_schema_columns(df)
    assert set(read_cols) == {"l_orderkey", "l_quantity"}


def test_raw_coords_roundtrip(points):
    raw = pc.to_raw_coords(points, {"x": (0.0, 0.01)})
    res = pc.resolve_coords(raw, ["x"])
    # resolution error bounded by scale/2
    worst = res.select(F.max(F.abs(F.col("x") - F.col("x_resolved")))).collect()[0][0]
    assert worst <= 0.005 + 1e-9
    assert dict(raw.dtypes)["x_raw"] == "int"


def test_add_importance_idempotent(spark, sf_dir):
    from agile_lakehouse_spark.schema import add_importance, importance

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select("l_orderkey")
    with_i = add_importance(li, "imp", seed=42)
    assert importance(with_i.schema) == "imp"
    lo, hi = with_i.agg(F.min("imp"), F.max("imp")).collect()[0]
    assert 0.0 <= lo and hi < 1.0
    assert dict(with_i.dtypes)["imp"] == "float"
    # idempotent: column already present -> unchanged
    again = add_importance(with_i, "imp", seed=99)
    assert again.columns == with_i.columns


def test_rect_join_is_not_nested_loop(spark, sf_dir):
    """The spatial join must plan as an equi-join on cell keys (hash or
    broadcast-hash), never BroadcastNestedLoopJoin/CartesianProduct."""
    from agile_lakehouse_spark import declared

    df = declared.SPARK_QUERIES["dq34_spatial_join"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan


def test_knn_join_grid_matches_bruteforce(spark, sf_dir):
    """Ring-expansion grid kNN must agree with the brute-force join on
    every (probe, rank) pair — exactness, not a heuristic."""
    from agile_lakehouse_spark.operators.pointcloud import knn_join, knn_join_grid
    from agile_lakehouse_spark.sources.catalog import points_view

    pts = points_view(spark, sf_dir).select("pid", "x", "y")
    probes = spark.createDataFrame(
        [(0, 120.0, 240.0), (1, 300.0, 500.0), (2, 510.0, 480.0), (3, 950.0, 60.0)],
        "qid long, x double, y double",
    )
    exact = {(r.qid, r.rk): r.pid for r in knn_join(probes, pts, 7).collect()}
    grid = {(r.qid, r.rk): r.pid for r in knn_join_grid(probes, pts, 7, delta=60.0).collect()}
    assert grid == exact


def test_knn_join_grid_tiny_delta_falls_back(spark, sf_dir):
    """A pathologically small delta forces the max_rounds fallback path;
    results must still be exact."""
    from agile_lakehouse_spark.operators.pointcloud import knn_join, knn_join_grid
    from agile_lakehouse_spark.sources.catalog import points_view

    pts = points_view(spark, sf_dir).select("pid", "x", "y")
    probes = spark.createDataFrame([(0, 400.0, 400.0)], "qid long, x double, y double")
    exact = {(r.qid, r.rk): r.pid for r in knn_join(probes, pts, 5).collect()}
    grid = {
        (r.qid, r.rk): r.pid
        for r in knn_join_grid(probes, pts, 5, delta=0.5, max_rounds=3).collect()
    }
    assert grid == exact
