"""Graph operators: connected components for dedup-cluster resolution.

Near-dup detection (operators/dedup.py, operators/similarity.py) emits
PAIRS; a training-data pipeline needs GROUPS — "keep one doc per duplicate
cluster" is transitive, so pairs must be closed into connected components.
The reference has no iterative operators at all; this is the canonical
Spark pattern for them: a driver loop over lazy DataFrame steps with
``localCheckpoint`` per iteration (truncates the lineage that would
otherwise grow unboundedly and re-execute every prior round).

Algorithm: min-label propagation. Every node starts labeled with its own
id; each round every node takes the min of its label and its neighbors'
labels; fixpoint = every node holds the min id of its component.
Converges in O(diameter) rounds — fine for dedup graphs, whose components
are small and dense.  For web-scale graphs with long chains, swap the
round body for large-star/small-star (Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC'14) — O(log n) rounds, same
driver-loop skeleton.

Scale notes (100 TB): each round is one shuffle (edge ⋈ label on dst,
combine-min on src) + one broadcast-able label join; the edge table is
read from the checkpointed/persisted symmetric form, never recomputed.
The convergence check rides on the same job that materializes the round's
labels (localCheckpoint is eager) — no extra pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    id_col: str = "id",
    max_iterations: int = 50,
) -> DataFrame:
    """Undirected connected components -> (id_col, component).

    ``component`` is the minimum node id in the node's component — a
    deterministic canonical representative (cross-engine reproducible,
    unlike hash-based labeling).

    ``edges`` may be directed pairs (e.g. near-dup ``id_a < id_b`` output);
    they are symmetrized internally.
    """
    sym = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    sym = sym.union(sym.select(F.col("b").alias("a"), F.col("a").alias("b"))).distinct()
    sym = sym.persist()

    labels = sym.select(F.col("a").alias(id_col)).distinct().withColumn("lbl", F.col(id_col))
    labels = labels.localCheckpoint()

    for _ in range(max_iterations):
        nbr_min = (
            sym.join(labels.withColumnRenamed(id_col, "b_id"), F.col("b") == F.col("b_id"))
            .groupBy(F.col("a").alias(id_col))
            .agg(F.min("lbl").alias("nbr_lbl"))
        )
        proposed = labels.withColumnRenamed("lbl", "old").join(nbr_min, id_col, "left").select(
            F.col(id_col),
            F.col("old"),
            F.least(F.col("old"), F.coalesce(F.col("nbr_lbl"), F.col("old"))).alias("lbl"),
        )
        proposed = proposed.localCheckpoint()
        changed = proposed.filter(F.col("lbl") < F.col("old")).count()
        labels = proposed.drop("old")
        if changed == 0:
            break
    sym.unpersist()
    return labels.withColumnRenamed("lbl", "component")


def component_sizes(components: DataFrame, id_col: str = "id") -> DataFrame:
    """Cluster summary: one row per component with its size."""
    return (
        components.groupBy("component")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_members"))
    )


def dedup_keep_representatives(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    pair_a: str = "id_a",
    pair_b: str = "id_b",
) -> DataFrame:
    """Drop all but the canonical (min-id) member of every duplicate cluster.

    The end-to-end near-dup removal a corpus pipeline actually wants:
    ``df`` minus every row whose id sits in a component but is not its
    representative.  Non-paired rows pass through untouched.
    """
    comp = connected_components(pairs, pair_a, pair_b, id_col)
    losers = comp.filter(F.col(id_col) != F.col("component")).select(id_col)
    return df.join(losers, id_col, "left_anti")


def triangle_count(edges: DataFrame, u_col: str = "u", v_col: str = "v") -> DataFrame:
    """Exact triangle + edge count over an undirected graph (DQ86).

    ``edges`` must be the canonical oriented edge set: one row per
    undirected edge with ``u < v`` (callers dedupe first).  Counting joins
    each wedge (e1: u→v, e2: v→w) against the closing edge (u→w) — with
    the ``u < v`` orientation every triangle {a<b<c} is counted exactly
    once, as (a,b)+(b,c)+(a,c).  All-integer outputs, order-independent.

    Scale: two shuffles on the join keys; for skewed degree distributions
    the standard refinement is degree-ordered orientation (point each edge
    at the higher-degree endpoint), which bounds wedge fan-out by
    sqrt(|E|) — noted here, not needed for the fixture graph.
    """
    e = edges.select(F.col(u_col).alias("u"), F.col(v_col).alias("v")).persist()
    n_edges = e.groupBy().agg(F.count(F.lit(1)).cast("bigint").alias("n_edges"))
    e2 = e.select(F.col("u").alias("w_u"), F.col("v").alias("w_v"))
    e3 = e.select(F.col("u").alias("c_u"), F.col("v").alias("c_v"))
    # The edge list is the SMALL relation (|E| rows of two ints) while the
    # wedge stream fans out to Σ deg·deg rows — broadcast the edges into
    # both probes so wedge generation + closure run in ONE shuffle-free
    # stage over e's partitions.  (Past broadcast size, drop the hints and
    # the same plan degrades gracefully to shuffled hash joins.)
    wedges = e.join(F.broadcast(e2), F.col("v") == F.col("w_u"))
    tri = wedges.join(
        F.broadcast(e3),
        (F.col("u") == F.col("c_u")) & (F.col("w_v") == F.col("c_v")),
        "left_semi",
    ).groupBy().agg(F.count(F.lit(1)).cast("bigint").alias("n_triangles"))
    return n_edges.crossJoin(tri)


def connected_components_star(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    id_col: str = "id",
    max_iterations: int = 30,
) -> DataFrame:
    """Connected components via alternating large-star / small-star rounds
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14) — O(log n) rounds regardless of component DIAMETER, where
    min-label propagation (:func:`connected_components`) needs O(diameter)
    rounds and dies on long chains at web scale.

    - large-star(u): every neighbor v > u re-attaches to m = min(N(u)∪{u})
    - small-star(u): every neighbor v ≤ u re-attaches to m

    Both steps preserve connectivity and strictly shrink star height;
    at fixpoint every node's edge points at its component minimum — the
    same deterministic canonical representative the propagation variant
    emits (output-identical, property-tested against union-find).

    Each round is two keyed aggregations + joins (one shuffle each) over
    the CURRENT edge set, which only shrinks; the convergence check is an
    exceptAll on the canonically-oriented edges.
    """
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).filter(
        F.col("u") != F.col("v")
    )
    nodes = (
        e.select(F.col("u").alias(id_col))
        .union(e.select(F.col("v").alias(id_col)))
        .distinct()
        .localCheckpoint()
    )
    cur = (
        e.select(F.greatest("u", "v").alias("hi"), F.least("u", "v").alias("lo"))
        .distinct()
        .localCheckpoint()
    )
    for _ in range(max_iterations):
        sym = cur.select(F.col("hi").alias("a"), F.col("lo").alias("b")).union(
            cur.select(F.col("lo").alias("a"), F.col("hi").alias("b"))
        )
        mins = (
            sym.groupBy("a")
            .agg(F.min("b").alias("mn"))
            .select("a", F.least(F.col("mn"), F.col("a")).alias("m"))
        )
        # large-star: strictly-larger neighbors attach to the minimum
        ls = (
            sym.join(mins, "a")
            .filter(F.col("b") > F.col("a"))
            .select(F.col("b").alias("hi"), F.col("m").alias("lo"))
            .filter(F.col("hi") != F.col("lo"))
            .distinct()
            .localCheckpoint()
        )
        # small-star on (hi -> lo) orientation: all lows + the hub attach
        # to the minimum low
        mins2 = ls.groupBy("hi").agg(F.min("lo").alias("m"))
        ss = (
            ls.join(mins2, "hi")
            .select(
                F.greatest(F.col("lo"), F.col("m")).alias("hi"),
                F.least(F.col("lo"), F.col("m")).alias("lo"),
            )
            .union(mins2.select(F.col("hi"), F.col("m").alias("lo")))
        )
        new = ss.filter(F.col("hi") != F.col("lo")).distinct().localCheckpoint()
        unchanged = (
            new.exceptAll(cur).limit(1).count() == 0
            and cur.exceptAll(new).limit(1).count() == 0
        )
        cur = new
        if unchanged:
            break
    lbl = cur.groupBy(F.col("hi").alias(id_col)).agg(F.min("lo").alias("component"))
    return nodes.join(lbl, id_col, "left").select(
        F.col(id_col),
        F.coalesce(F.col("component"), F.col(id_col)).alias("component"),
    )
