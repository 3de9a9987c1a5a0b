"""Point-cloud query operators — the reference's core workload, Spark-first.

Reproduces the semantics of the reference benchmark queries
(``pc-cli/src/benchmark.rs:95-265``) and filter expression builders
(``pc-format/src/expressions.rs``, ``pc-format/src/compute.rs``):

- :func:`bounds`        — per-dimension min/max, ONE pass (reference loops per dim)
- :func:`range_query`   — half-open rectangle with the closed-importance rule
- :func:`circle_query`  — bbox prefilter -> cache -> exact x²+y²<r² refine
- :func:`sample`        — importance sampling ``i < p``
- :func:`knn`           — exact top-k by squared distance (TakeOrderedAndProject)
- :func:`knn_approx`    — the reference's sqrt(k/10)-radius bbox heuristic
- :func:`grid_cells` / :func:`quadtree_cells` — layout cell assignment as
  native column expressions (see plans/layout.py for the write side)

All operators are pure Catalyst expressions: filters push to the Parquet
scan, aggregations get map-side partial combine, top-k plans as
TakeOrderedAndProject (no full sort).  Nothing here collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from agile_lakehouse_spark.functions.portable import round4


def count(df: DataFrame) -> DataFrame:
    """Exact row count (benchmark.rs:100-104) as a 1-row DataFrame."""
    return df.agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))


def bounds(df: DataFrame, dims: list[str]) -> DataFrame:
    """Per-dimension min/max AABB in ONE aggregation pass.

    Reference computes one aggregate per dimension sequentially
    (``pc-format/src/expressions.rs:18-105``); a single ``agg`` with 2·d
    expressions is one scan + one partial/final combine — strictly better at
    scale and exactly what Parquet aggregate-pushdown can answer from
    footer statistics.
    """
    aggs = []
    for d in dims:
        aggs.append(F.min(d).alias(f"{d}_min"))
        aggs.append(F.max(d).alias(f"{d}_max"))
    return df.agg(*aggs)


def range_predicate(
    df_or_cols: DataFrame | None,
    box: dict[str, tuple[float, float]],
    importance_col: str | None = None,
) -> Column:
    """Half-open conjunctive range predicate (the workload's core filter).

    ``lo <= col AND col < hi`` per dimension (``benchmark.rs:131-137``,
    ``pc-format/src/expressions.rs:108-164``) with the reference's edge rule
    (``pc-format/src/compute.rs:188-190``): the *importance* dimension's
    upper bound becomes closed (``<=``) when ``hi >= 1`` — otherwise
    sampling at p=1.0 would silently drop rows with i == 1.0.
    """
    pred = F.lit(True)
    for col, (lo, hi) in box.items():
        closed_upper = importance_col is not None and col == importance_col and hi >= 1.0
        upper = F.col(col) <= F.lit(hi) if closed_upper else F.col(col) < F.lit(hi)
        pred = pred & (F.col(col) >= F.lit(lo)) & upper
    return pred


def range_query(
    df: DataFrame,
    box: dict[str, tuple[float, float]],
    importance_col: str | None = None,
    projection: list[str] | None = None,
) -> DataFrame:
    """Rectangular range query: filter + projection, both pushed to the scan."""
    out = df.filter(range_predicate(df, box, importance_col))
    return out.select(*projection) if projection else out


def circle_query(
    df: DataFrame,
    cx: float,
    cy: float,
    r: float,
    x: str = "x",
    y: str = "y",
    cache: bool = False,
) -> DataFrame:
    """Circle query: bbox prefilter -> (optional cache) -> exact refine.

    Two-phase shape of ``benchmark.rs:183-220``: the bbox conjunction prunes
    row groups at the scan; the ``pow`` refine runs only on survivors.
    ``cache=True`` reproduces the reference's explicit cache between phases —
    useful when the same prefilter feeds several refinements; default off
    because a single-shot query is faster un-cached.
    """
    bbox = range_query(df, {x: (cx - r, cx + r), y: (cy - r, cy + r)})
    if cache:
        bbox = bbox.cache()
    # (a-b)*(a-b), not pow(a-b, 2): identical correctly-rounded square,
    # but a plain multiply in codegen instead of a Math.pow call per row
    # (measured ~30% per-query on the knn workload entries)
    dx_, dy_ = F.col(x) - cx, F.col(y) - cy
    dist2 = dx_ * dx_ + dy_ * dy_
    return bbox.filter(dist2 < F.lit(float(r) ** 2))


def sample(df: DataFrame, n: int | None = None, p: float | None = None, importance_col: str = "i") -> DataFrame:
    """Importance sampling: ``i < p`` (p = n/total when n given).

    ``benchmark.rs:147-180``: a size-≈n uniform sample is a pure filter on
    the precomputed uniform importance column — deterministic, pushdown-able,
    and (unlike ``df.sample``) repeatable across runs and engines.
    """
    if p is None:
        if n is None:
            raise ValueError("need n or p")
        total = df.count()
        p = min(n / max(total, 1), 1.0)
    return df.filter(range_predicate(df, {importance_col: (0.0, p)}, importance_col))


def knn(
    df: DataFrame,
    cx: float,
    cy: float,
    k: int,
    x: str = "x",
    y: str = "y",
    id_col: str = "pid",
) -> DataFrame:
    """EXACT k nearest neighbours by squared euclidean distance.

    ``orderBy(dist).limit(k)`` plans as ``TakeOrderedAndProject`` — a true
    distributed top-k (per-partition heap + k-way driver merge), not a full
    sort.  Ties broken by ``id_col`` for cross-engine determinism
    (FIXTURES.md determinism rules).
    """
    # multiply instead of Math.pow — same correctly-rounded square,
    # measured ~30% faster per query at sf0.1 (see knn_join)
    dx_, dy_ = F.col(x) - cx, F.col(y) - cy
    dist2 = (dx_ * dx_ + dy_ * dy_).alias("dist2")
    return df.select(F.col(id_col), dist2).orderBy(F.asc_nulls_last("dist2"), F.asc(id_col)).limit(k)


def knn_approx(df: DataFrame, cx: float, cy: float, k: int, x: str = "x", y: str = "y", id_col: str = "pid") -> DataFrame:
    """The reference's approximate kNN (``benchmark.rs:223-264``).

    bbox prefilter of radius ``sqrt(k/10)`` (assumes >= 10 pts/unit²; may
    return < k rows or miss true neighbours — SURVEY.md §7) -> distance ->
    top-k.  Kept for bench parity; use :func:`knn` when exactness matters.
    """
    r = (k / 10.0) ** 0.5
    pre = range_query(df, {x: (cx - r, cx + r), y: (cy - r, cy + r)})
    return knn(pre, cx, cy, k, x=x, y=y, id_col=id_col)


def to_raw_coords(df: DataFrame, transforms: dict[str, tuple[float, float]]) -> DataFrame:
    """Resolved f64 coords -> raw i32 grid coords + offset/scale columns.

    The LAS storage model (``pc-io/src/las/schema.rs:11-53``): a coordinate
    is stored as ``int32 raw`` with per-axis ``offset``/``scale`` so
    ``resolved = raw * scale + offset``.  Emits ``{col}_raw`` (int) plus
    ``{col}_offset``/``{col}_scale`` literal columns — the ``--raw``
    storage-footprint mode of the reference (README.md:53-54).
    """
    out = df
    for col, (offset, scale) in transforms.items():
        raw = F.floor((F.col(col) - F.lit(offset)) / F.lit(scale) + F.lit(0.5))
        out = (
            out.withColumn(f"{col}_raw", raw.cast("int"))
            .withColumn(f"{col}_offset", F.lit(float(offset)))
            .withColumn(f"{col}_scale", F.lit(float(scale)))
        )
    return out


def resolve_coords(df: DataFrame, cols: list[str]) -> DataFrame:
    """Raw i32 grid coords -> resolved f64: ``raw * scale + offset``.

    Inverse of :func:`to_raw_coords` (reference resolves at decode time,
    ``pc-io/src/las/builder.rs:49-188``).
    """
    out = df
    for col in cols:
        out = out.withColumn(
            f"{col}_resolved",
            F.col(f"{col}_raw").cast("double") * F.col(f"{col}_scale") + F.col(f"{col}_offset"),
        )
    return out


def grid_cells(df: DataFrame, deltas: dict[str, float]) -> DataFrame:
    """Assign each point its grid cell: ``floor(col/δ)`` per axis.

    The reference materializes cells as AABB objects keyed by a string id
    (``pc-format/src/framework.rs:8-41``, ``aabb.rs:23-34``); in Spark the
    cell is just a group key computed natively — it never exists as an
    object, and the layout writer shuffles on it (plans/layout.py).
    """
    out = df
    for col, delta in deltas.items():
        out = out.withColumn(f"cell_{col}", F.floor(F.col(col) / F.lit(delta)).cast("bigint"))
    return out


def rect_join_counts(
    points: DataFrame,
    rects: DataFrame,
    delta_x: float,
    delta_y: float,
    x: str = "x",
    y: str = "y",
) -> DataFrame:
    """Spatial join: count points inside each half-open rectangle —
    grid-bucketed, NEVER a cross join.

    ``rects``: (rect_id, x_lo, x_hi, y_lo, y_hi).  Each rectangle explodes
    into its covering grid cells (a few rows per rect); points carry their
    cell key; the join is a plain EQUI-join on the cell, followed by the
    exact containment refine.  Catalyst would otherwise plan rect-vs-point
    range predicates as BroadcastNestedLoopJoin — O(|points|·|rects|)
    comparisons; bucketing makes it O(|points| + candidates), the same
    cell-blocking idea the reference's partitioner uses for routing
    (pc-cli/src/partition.rs:249-374), applied to a join.

    Half-open semantics ([lo, hi) per axis) match range_query/P2.
    """
    cover_x = F.sequence(
        F.floor(F.col("x_lo") / delta_x).cast("bigint"),
        F.floor(F.col("x_hi") / delta_x).cast("bigint"),
    )
    cover_y = F.sequence(
        F.floor(F.col("y_lo") / delta_y).cast("bigint"),
        F.floor(F.col("y_hi") / delta_y).cast("bigint"),
    )
    rect_cells = (
        rects.select("*", F.explode(cover_x).alias("cell_x"))
        .select("*", F.explode(cover_y).alias("cell_y"))
    )
    pts = grid_cells(points, {x: delta_x, y: delta_y})
    contained = (
        (F.col(x) >= F.col("x_lo"))
        & (F.col(x) < F.col("x_hi"))
        & (F.col(y) >= F.col("y_lo"))
        & (F.col(y) < F.col("y_hi"))
    )
    return (
        pts.join(F.broadcast(rect_cells), ["cell_x", "cell_y"])
        .filter(contained)
        .groupBy("rect_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_points"))
    )


def quadtree_cells(
    df: DataFrame,
    depth: int,
    side: float,
    x: str = "x",
    y: str = "y",
    importance_col: str = "i",
    origin: tuple[float, float] = (0.0, 0.0),
) -> DataFrame:
    """Importance-stratified quadtree cell assignment (framework.rs:169-219).

    Level ℓ ∈ [0, depth] holds 4^ℓ XY cells and the importance slab
    [cells_before/total, cells_through/total); the leaf level's upper bound
    is closed (i -> 1.0).  Emitted as three native columns
    ``level, qx, qy`` — pure CASE/floor arithmetic, no UDF.
    """
    total = sum(4**level for level in range(depth + 1))
    cum = 0
    level_expr = None
    cuts: list[tuple[int, float]] = []
    for level in range(depth + 1):
        cum += 4**level
        cuts.append((level, cum / total))
    # CASE WHEN i < cut0 THEN 0 WHEN i < cut1 THEN 1 ... ELSE depth
    level_expr = F.lit(depth)
    for level, cut in reversed(cuts[:-1]):
        level_expr = F.when(F.col(importance_col) < F.lit(cut), F.lit(level)).otherwise(level_expr)
    out = df.withColumn("level", level_expr.cast("int"))
    # cell size via a (depth+1)-literal lookup instead of per-row
    # pow(2.0, level): the literals are computed with the SAME float
    # division (side / 2^level, powers of two exact in double) so cell
    # assignment is bit-identical, but the transcendental pow leaves the
    # per-row path — measured 3.4 s -> 2.4 s for the assignment pass at
    # 200 M points (scripts/profile_quadtree_gap.py), and the layout
    # write pays it twice (range-partition sampling + final pass)
    sizes = F.array(*[F.lit(float(side) / float(2**lv)) for lv in range(depth + 1)])
    cell_size = F.element_at(sizes, F.col("level") + 1)
    out = out.withColumn("qx", F.floor((F.col(x) - origin[0]) / cell_size).cast("bigint"))
    out = out.withColumn("qy", F.floor((F.col(y) - origin[1]) / cell_size).cast("bigint"))
    return out


def lod_sweep(
    df: DataFrame,
    depth: int,
    side: float,
    probes_per_level: int = 16,
    x: str = "x",
    y: str = "y",
    importance_col: str = "i",
    origin: tuple[float, float] = (0.0, 0.0),
) -> DataFrame:
    """Progressive-LOD sweep — viz.rs-SHAPED, not viz.rs-identical
    (``pc-cli/examples/viz.rs:85-273``): per quadtree level, the per-cell
    point populations a renderer would stream, probed on a deterministic
    stride of the level's cell grid (viz.rs probes M=16 cells per level,
    ``i % max(n/M, 1) == 0`` over the cell enumeration).

    Two deliberate divergences from viz.rs's loop: (a) viz.rs strides the
    GLOBAL cell enumeration including empty cells — a stride hit on an
    empty cell issues a query that returns 0 points — while this sweep
    strides the aggregated NONEMPTY cells only (an empty cell contributes
    no aggregate row, so the same ordinal test selects a subset of
    viz.rs's probe set and never logs 0-point probes); (b) at low levels
    where ``4^level < M``, viz.rs revisits cells ~(M/n) times each and
    averages repeated measurements of the same cell — this sweep counts
    each selected cell once.  Same workload shape and per-level rollup;
    not a probe-for-probe replay.

    Output per level: probed nonempty cells, their total points, the
    min/max/mean per-cell count (viz.rs logs mean±std per level).  The
    whole sweep is ONE plan — cell assignment is pure floor/CASE
    arithmetic, the per-cell counts one hash aggregate, the stride a
    filter ON THE AGGREGATE (4^ℓ cells per level, never data-sized), and
    the per-level rollup a second tiny aggregate.  No per-cell query
    loop: a 1000-executor sweep reads the table once, where the
    reference issues one query per probed cell.

    The pruning benefit the layout exists for (each probe touching ~1
    file under the quadtree layout) is asserted separately in
    tests/test_layout.py over parquet footer stats.
    """
    cells = quadtree_cells(
        df, depth, side, x=x, y=y, importance_col=importance_col, origin=origin
    )
    per_cell = cells.groupBy("level", "qx", "qy").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    # viz.rs's deterministic probe stride over each level's cell grid:
    # ordinal = qy * 2^ℓ + qx, stride = max(4^ℓ div M, 1).  Integer
    # arithmetic only (powers of 2/4 up to depth are exact in double,
    # cast to bigint); % follows the dividend's sign identically in
    # Spark and DuckDB, so out-of-grid cells select identically too.
    ordinal = F.col("qy") * F.pow(F.lit(2.0), F.col("level").cast("double")).cast(
        "bigint"
    ) + F.col("qx")
    stride = F.greatest(
        (F.pow(F.lit(4.0), F.col("level").cast("double")).cast("bigint") / F.lit(probes_per_level)).cast("bigint"),
        F.lit(1).cast("bigint"),
    )
    probed = per_cell.filter(ordinal % stride == 0)
    return (
        probed.groupBy(F.col("level").cast("bigint").alias("level"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_cells"),
            F.sum("n").cast("bigint").alias("n_points"),
            F.min("n").cast("bigint").alias("min_cell_points"),
            F.max("n").cast("bigint").alias("max_cell_points"),
            round4(F.avg("n")).alias("avg_cell_points"),
        )
        .orderBy("level")
    )


def knn_join(
    probes: DataFrame,
    points: DataFrame,
    k: int,
    x: str = "x",
    y: str = "y",
    probe_id: str = "qid",
    id_col: str = "pid",
) -> DataFrame:
    """EXACT kNN JOIN: for every probe point, its ``k`` nearest points
    (squared euclidean, ties by ``id_col``) — the batch many-query form of
    :func:`knn` (DQ62).

    Declared form is brute-force: broadcast the probe set, score all
    (probe, point) pairs, rank per probe with one window — exact, and for
    probe sets that fit a broadcast (the common "query batch" case) the
    only shuffle is the per-probe rank.  At 100 TB with LARGE probe sets,
    block both sides by grid cell (join own + 8 neighbour cells, ring-
    expand under-filled probes) so candidates scale with density, not
    |points| — same banding discipline as `rect_join_counts` and
    `banded_interval_join`.
    """
    from pyspark.sql.window import Window as W

    from agile_lakehouse_spark.operators.dedup import spread

    p = probes.select(
        F.col(probe_id), F.col(x).alias("_qx"), F.col(y).alias("_qy")
    )
    # spread BEFORE the |probes|x amplification: a few-file scan would pin
    # the scoring + partial top-k on a few cores (3.3s -> 0.9s at sf0.1)
    narrow = spread(points.select(F.col(id_col), F.col(x), F.col(y)))
    scored = narrow.crossJoin(F.broadcast(p))
    # (a-b)*(a-b), not pow(a-b, 2): same correctly-rounded product, but a
    # plain multiply in codegen instead of a Math.pow call per pair
    dx = F.col(x) - F.col("_qx")
    dy = F.col(y) - F.col("_qy")
    dist2 = dx * dx + dy * dy
    w = W.partitionBy(probe_id).orderBy(F.asc("_d2"), F.asc(id_col))
    return (
        scored.withColumn("_d2", dist2)
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .select(
            F.col(probe_id),
            F.col(id_col),
            F.col("_rk").cast("bigint").alias("rk"),
        )
    )


def knn_join_grid(
    probes: DataFrame,
    points: DataFrame,
    k: int,
    delta: float,
    x: str = "x",
    y: str = "y",
    probe_id: str = "qid",
    id_col: str = "pid",
    max_rounds: int = 12,
) -> DataFrame:
    """EXACT kNN join by grid blocking + ring expansion — the LARGE-probe-
    set engine :func:`knn_join`'s docstring points at.

    Round R joins each still-active probe against only the points in the
    Chebyshev ring R of grid cells around it (8R cells — an EQUI-join on
    the cell key, the rect_join_counts/banded_interval_join discipline),
    keeps a running per-probe top-k, and retires the probe once its k-th
    distance is ≤ R·δ — every unexplored cell lies beyond Chebyshev R, so
    no closer point can exist (exactness, not a heuristic; equivalence-
    tested against the brute-force join).  Candidate volume scales with
    LOCAL DENSITY × k, never |probes|×|points|; state is ≤ k rows per
    probe between rounds.

    ``delta`` tunes rounds-vs-candidates: δ ≈ expected k-NN radius retires
    most probes in 1-2 rounds (the same derive_grid_size arithmetic that
    sizes layouts applies).  Driver-coordinated rounds, the dq31/dq43
    loop shape.
    """
    from pyspark.sql.window import Window as W

    from agile_lakehouse_spark.operators.dedup import spread

    pts = spread(points.select(F.col(id_col), F.col(x), F.col(y))).withColumn(
        "_cx", F.floor(F.col(x) / F.lit(delta)).cast("bigint")
    ).withColumn("_cy", F.floor(F.col(y) / F.lit(delta)).cast("bigint")).persist()

    active = probes.select(
        F.col(probe_id),
        F.col(x).alias("_qx"),
        F.col(y).alias("_qy"),
        F.floor(F.col(x) / F.lit(delta)).cast("bigint").alias("_pcx"),
        F.floor(F.col(y) / F.lit(delta)).cast("bigint").alias("_pcy"),
    ).localCheckpoint()
    kept = None  # per-probe running top-k candidates
    done = []

    w = W.partitionBy(probe_id).orderBy(F.asc("_d2"), F.asc(id_col))
    for r in range(max_rounds):
        # ring R cell offsets (Chebyshev distance == r), as a literal array
        ring = [
            (dx_, dy_)
            for dx_ in range(-r, r + 1)
            for dy_ in range(-r, r + 1)
            if max(abs(dx_), abs(dy_)) == r
        ]
        offs = F.array(*[F.struct(F.lit(a).alias("ox"), F.lit(b).alias("oy")) for a, b in ring])
        probe_cells = active.select(
            probe_id, "_qx", "_qy", "_pcx", "_pcy", F.explode(offs).alias("_o")
        ).select(
            probe_id,
            "_qx",
            "_qy",
            "_pcx",
            "_pcy",
            (F.col("_pcx") + F.col("_o.ox")).alias("_cx"),
            (F.col("_pcy") + F.col("_o.oy")).alias("_cy"),
        )
        dx_ = F.col(x) - F.col("_qx")
        dy_ = F.col(y) - F.col("_qy")
        new_cand = probe_cells.join(pts, ["_cx", "_cy"]).select(
            probe_id,
            "_qx",
            "_qy",
            "_pcx",
            "_pcy",
            F.col(id_col),
            (dx_ * dx_ + dy_ * dy_).alias("_d2"),
        )
        pool = new_cand if kept is None else kept.drop("_rk").unionByName(new_cand)
        kept = (
            pool.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") <= k)
            .localCheckpoint()
        )
        # retire probes whose k-th hit is provably closer than anything
        # beyond ring R: unexplored cells are at Chebyshev >= R+1, hence
        # at least R*delta away from any point inside the probe's cell
        stats = kept.groupBy(probe_id).agg(
            F.count(F.lit(1)).alias("_n"), F.max("_d2").alias("_kth")
        )
        bound = (r * delta) * (r * delta)
        finished = stats.filter((F.col("_n") >= k) & (F.col("_kth") <= F.lit(bound)))
        done.append(kept.join(finished.select(probe_id), probe_id, "left_semi"))
        active = active.join(finished.select(probe_id), probe_id, "left_anti").localCheckpoint()
        kept = kept.join(finished.select(probe_id), probe_id, "left_anti").localCheckpoint()
        if active.limit(1).count() == 0:
            break
    else:
        # unfinished probes after max_rounds: exact brute-force fallback
        if kept is not None:
            rest = knn_join(
                active.select(probe_id, F.col("_qx").alias(x), F.col("_qy").alias(y)),
                points,
                k,
                x=x,
                y=y,
                probe_id=probe_id,
                id_col=id_col,
            )
            pts.unpersist()
            base = _knn_grid_collect(done, probe_id, id_col)
            return base.unionByName(rest)
    pts.unpersist()
    return _knn_grid_collect(done, probe_id, id_col)


def _knn_grid_collect(done: list[DataFrame], probe_id: str, id_col: str) -> DataFrame:
    out = [
        d.select(probe_id, id_col, F.col("_rk").cast("bigint").alias("rk"))
        for d in done
    ]
    base = out[0]
    for o in out[1:]:
        base = base.unionByName(o)
    return base


def transform_points(
    df: DataFrame,
    matrix: list[list[float]],
    x: str = "x",
    y: str = "y",
    z: str = "z",
) -> DataFrame:
    """Apply a 4x4 homogeneous transform to the coordinate columns —
    the registration primitive (``pc-format/examples/registration.rs:
    31-48``'s ``transformed``), as pure native column arithmetic.

    Each output coordinate is a fused multiply-add over the input row
    (whole-stage codegen, no UDF, no shuffle); the projective divide is
    emitted only when the bottom row isn't the affine ``[0,0,0,1]``, so
    rigid/affine transforms cost 9 multiplies + 9 adds per point.  All
    non-coordinate columns pass through untouched.
    """
    if len(matrix) != 4 or any(len(r) != 4 for r in matrix):
        raise ValueError("matrix must be 4x4 (homogeneous)")
    cx, cy, cz = F.col(x), F.col(y), F.col(z)

    def row(r):
        return F.lit(r[0]) * cx + F.lit(r[1]) * cy + F.lit(r[2]) * cz + F.lit(r[3])

    nx, ny, nz = row(matrix[0]), row(matrix[1]), row(matrix[2])
    if matrix[3] != [0.0, 0.0, 0.0, 1.0]:
        w = row(matrix[3])
        nx, ny, nz = nx / w, ny / w, nz / w
    others = [c for c in df.columns if c not in (x, y, z)]
    return df.select(*others, nx.alias(x), ny.alias(y), nz.alias(z))


def _directed_max_min_d2(p: DataFrame, q: DataFrame, cols: tuple[str, ...]) -> DataFrame:
    """max over p-rows of (min over q-rows of squared distance), 1 row.

    ``q`` is broadcast (the inner min side); ``p`` streams through one
    pair-scoring stage and two aggregations.  The per-row grouping key is
    synthetic, so duplicate points contribute identical mins — harmless.
    """
    pa = p.select(*[F.col(c).alias(f"_p{i}") for i, c in enumerate(cols)]).withColumn(
        "_rid", F.monotonically_increasing_id()
    )
    qb = q.select(*[F.col(c).alias(f"_q{i}") for i, c in enumerate(cols)])
    d2 = None
    for i in range(len(cols)):
        t = (F.col(f"_p{i}") - F.col(f"_q{i}")) * (F.col(f"_p{i}") - F.col(f"_q{i}"))
        d2 = t if d2 is None else d2 + t
    return (
        pa.crossJoin(F.broadcast(qb))
        .groupBy("_rid")
        .agg(F.min(d2).alias("_mn"))
        .agg(F.max("_mn").alias("max_min_d2"))
    )


def hausdorff_distance(
    a: DataFrame,
    b: DataFrame,
    cols: tuple[str, ...] = ("x", "y", "z"),
) -> DataFrame:
    """Discrete Hausdorff distance between two point clouds -> one row
    ``(hausdorff double)`` (``registration.rs:50-96``): the max over both
    directed max-min squared distances, square-rooted once at the end
    (same shape as the reference — it compares squared distances and
    sqrt's only the winner).

    Scale: the reference materializes the full |X|x|Y| distance matrix;
    here each direction broadcasts the MIN side and streams the other, so
    memory is O(broadcast side) and the pair stream never materializes.
    For two huge clouds, run k=1 :func:`knn_join_grid` per direction and
    take the max — candidates then scale with local density, not |X|x|Y|.
    """
    ab = _directed_max_min_d2(a, b, cols)
    ba = _directed_max_min_d2(b, a, cols)
    return (
        ab.crossJoin(ba.withColumnRenamed("max_min_d2", "_ba"))
        .select(F.sqrt(F.greatest(F.col("max_min_d2"), F.col("_ba"))).alias("hausdorff"))
    )


def point_in_polygon(
    df,
    polygon: list[tuple[float, float]],
    x_col: str = "x",
    y_col: str = "y",
    out_col: str = "inside",
):
    """Append a boolean: point strictly inside (or on the boundary of) a
    CONVEX polygon given as counter-clockwise vertices.

    Convexity reduces the test to a conjunction of half-plane edge checks
    ``(x2-x1)(y-y1) - (y2-y1)(x-x1) >= 0`` — pure column arithmetic, so
    the predicate runs inside whole-stage codegen and composes with a
    bounding-box prefilter that DOES reach the Parquet scan (the same
    coarse-then-refine discipline as the circle query,
    pc-cli/src/benchmark.rs:183-220).  Arbitrary (concave) polygons would
    use the crossing-number sum over edges instead — same expression
    family, no UDF.
    """
    from pyspark.sql import functions as F

    if len(polygon) < 3:
        raise ValueError("polygon needs >= 3 vertices")
    cond = None
    for (x1, y1), (x2, y2) in zip(polygon, polygon[1:] + polygon[:1]):
        cross = (F.lit(x2 - x1)) * (F.col(y_col) - F.lit(y1)) - (F.lit(y2 - y1)) * (
            F.col(x_col) - F.lit(x1)
        )
        c = cross >= 0
        cond = c if cond is None else (cond & c)
    return df.withColumn(out_col, cond)
