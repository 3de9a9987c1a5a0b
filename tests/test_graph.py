"""Connected components + as-of join (round-2 operators)."""

from pyspark.sql import functions as F

from agile_lakehouse_spark.operators import graph, relational


def test_connected_components_basic(spark):
    # two components {1,2,3,7} and {5,6}; 9 isolated via self-pair input absence
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 7), (5, 6)], "src bigint, dst bigint"
    )
    comp = graph.connected_components(edges, "src", "dst", "node")
    got = {r.node: r.component for r in comp.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 7: 1, 5: 5, 6: 5}


def test_connected_components_chain_converges(spark):
    # a long chain exercises multiple propagation rounds
    n = 40
    edges = spark.createDataFrame([(i, i + 1) for i in range(n)], "src bigint, dst bigint")
    comp = graph.connected_components(edges, "src", "dst", "node")
    rows = comp.collect()
    assert len(rows) == n + 1
    assert {r.component for r in rows} == {0}


def test_blocked_cc_matches_iterative(spark):
    # block-contained graph: components never cross blocks (the SemDeDup
    # invariant) — the one-shuffle union-find must be bit-identical to
    # min-label propagation, including chains, merges and isolated pairs
    edges = spark.createDataFrame(
        [
            (10, 1, 2), (10, 2, 3), (10, 3, 7),       # chain in block 10
            (20, 5, 6),                                # pair in block 20
            (30, 11, 12), (30, 13, 12), (30, 14, 11),  # star merge in block 30
            (40, 9, 9),                                # self-loop
            (10, 1, 2),                                # duplicate edge
        ],
        "cell bigint, id_a bigint, id_b bigint",
    )
    it = graph.connected_components(edges, "id_a", "id_b", "node")
    bl = graph.connected_components_blocked(edges, "cell", "id_a", "id_b", "node")
    assert {tuple(r) for r in it.collect()} == {tuple(r) for r in bl.collect()}


def test_blocked_cc_big_block_fallback(spark):
    # a block over max_block_pairs takes the iterative engine; results
    # stitch with the union-find blocks into one exact answer
    edges = spark.createDataFrame(
        [(1, i, i + 1) for i in range(10)] + [(2, 100, 101), (2, 102, 101)],
        "cell bigint, id_a bigint, id_b bigint",
    )
    bl = graph.connected_components_blocked(
        edges, "cell", "id_a", "id_b", "node", max_block_pairs=5
    )
    got = {r.node: r.component for r in bl.collect()}
    assert got == {**{i: 0 for i in range(11)}, 100: 100, 101: 100, 102: 100}


def test_blocked_cc_empty_edges(spark):
    edges = spark.createDataFrame([], "cell bigint, id_a bigint, id_b bigint")
    bl = graph.connected_components_blocked(edges, "cell", "id_a", "id_b", "node")
    assert bl.count() == 0 and bl.columns == ["node", "component"]


def test_dedup_keep_representatives(spark):
    docs = spark.createDataFrame(
        [(i, f"t{i}") for i in range(6)], "doc_id bigint, text string"
    )
    pairs = spark.createDataFrame([(0, 3), (3, 4), (1, 5)], "id_a bigint, id_b bigint")
    kept = graph.dedup_keep_representatives(docs, pairs)
    assert sorted(r.doc_id for r in kept.collect()) == [0, 1, 2]


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [(1, 1, 5), (2, 1, 10), (3, 1, 2), (4, 2, 7)],
        "eid bigint, k bigint, t bigint",
    )
    right = spark.createDataFrame(
        [(1, 3, 30.0, 100), (1, 10, 99.0, 101), (1, 10, 98.0, 102), (2, 8, 1.0, 103)],
        "k bigint, t bigint, v double, rid bigint",
    )
    out = relational.asof_join(
        left, right, on="k", left_ts="t", right_ts="t", value_cols=["v", "rid"], tie_col="rid"
    )
    got = {r.eid: (r.asof_v, r.asof_rid) for r in out.collect()}
    # eid=1 t=5: latest right t<=5 is t=3 -> 30.0
    # eid=2 t=10: ties at t=10 -> highest rid (102) wins -> 98.0
    # eid=3 t=2: no earlier right row -> NULLs
    # eid=4 k=2 t=7: right t=8 is later -> NULLs
    assert got == {1: (30.0, 100), 2: (98.0, 102), 3: (None, None), 4: (None, None)}
    assert out.count() == left.count()  # left join: every left row survives


def test_asof_join_single_shuffle(spark):
    """The union-window formulation must shuffle ONCE (on the key), not do
    a range self-join."""
    left = spark.createDataFrame([(1, 1, 5)], "eid bigint, k bigint, t bigint")
    right = spark.createDataFrame([(1, 3, 30.0, 1)], "k bigint, t bigint, v double, rid bigint")
    out = relational.asof_join(
        left, right, on="k", left_ts="t", right_ts="t", value_cols=["v"], tie_col="rid"
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") <= 1
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_triangle_count_known_graph(spark):
    # K4 minus one edge: edges on {0,1,2,3} with (2,3) missing ->
    # triangles {0,1,2} and {0,1,3} only
    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3)], "u bigint, v bigint"
    )
    row = graph.triangle_count(edges).collect()[0]
    assert (row.n_edges, row.n_triangles) == (5, 2)


def test_triangle_count_matches_bruteforce(spark):
    # pseudo-random sparse graph, checked against an O(n^3) reference
    import itertools

    n = 25
    pairs = [
        (a, b)
        for a, b in itertools.combinations(range(n), 2)
        if (a * 7919 + b * 104729) % 5 == 0
    ]
    adj = set(pairs)
    expect = sum(
        1
        for a, b, c in itertools.combinations(range(n), 3)
        if (a, b) in adj and (b, c) in adj and (a, c) in adj
    )
    edges = spark.createDataFrame(pairs, "u bigint, v bigint")
    row = graph.triangle_count(edges).collect()[0]
    assert (row.n_edges, row.n_triangles) == (len(pairs), expect)


def test_star_cc_matches_propagation(spark):
    # chain + cycle + isolated-pair: same canonical labels as propagation
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 7), (5, 6), (10, 11), (11, 12), (12, 10)],
        "src bigint, dst bigint",
    )
    star = {r.id: r.component for r in graph.connected_components_star(edges, id_col="id").collect()}
    prop = {r.node: r.component for r in graph.connected_components(edges, "src", "dst", "node").collect()}
    assert star == prop


def test_star_cc_long_chain(spark):
    # the case the algorithm exists for: diameter >> rounds
    n = 60
    edges = spark.createDataFrame([(i, i + 1) for i in range(n)], "src bigint, dst bigint")
    comp = graph.connected_components_star(edges, id_col="node")
    rows = comp.collect()
    assert len(rows) == n + 1
    assert {r.component for r in rows} == {0}


def test_triangle_count_degree_ordered_matches(spark):
    # same pseudo-random graph as the brute-force test: the degree-ordered
    # engine must be output-identical to id-orientation
    import itertools

    n = 25
    pairs = [
        (a, b)
        for a, b in itertools.combinations(range(n), 2)
        if (a * 7919 + b * 104729) % 5 == 0
    ]
    edges = spark.createDataFrame(pairs, "u bigint, v bigint")
    base = graph.triangle_count(edges).collect()[0]
    ordered = graph.triangle_count(edges, degree_ordered=True).collect()[0]
    assert (base.n_edges, base.n_triangles) == (ordered.n_edges, ordered.n_triangles)


def test_triangle_count_degree_ordered_skewed_hub(spark):
    # the case the orientation exists for: one hub connected to everything
    # (star + a clique among 6 spokes).  id-orientation fans out deg(hub)^2
    # wedges at the hub; degree-ordering bounds out-degree.
    import itertools

    hub = 0
    spokes = list(range(1, 41))
    edges = [(hub, s) for s in spokes] + list(itertools.combinations(spokes[:6], 2))
    # expected: triangles = hub x (clique edge) + clique-internal = 15 + C(6,3)=20 -> 35
    df = spark.createDataFrame(edges, "u bigint, v bigint")
    row = graph.triangle_count(df, degree_ordered=True).collect()[0]
    assert (row.n_edges, row.n_triangles) == (len(edges), 15 + 20)


def test_cc_unconverged_warns(spark):
    import warnings

    n = 12  # diameter > max_iterations -> cannot reach fixpoint
    edges = spark.createDataFrame([(i, i + 1) for i in range(n)], "src bigint, dst bigint")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        graph.connected_components(edges, "src", "dst", "node", max_iterations=2).collect()
    assert any("fixpoint not reached" in str(x.message) for x in w)

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        graph.connected_components_star(edges, id_col="node", max_iterations=1).collect()
    assert any("fixpoint not reached" in str(x.message) for x in w)


def test_pagerank_ring_is_uniform(spark):
    from agile_lakehouse_spark.operators import graph

    n = 8
    ring = [(i, (i + 1) % n) for i in range(n)] + [((i + 1) % n, i) for i in range(n)]
    e = spark.createDataFrame(ring, "u bigint, v bigint")
    pr = {r["node"]: r["pr"] for r in graph.pagerank(e, iters=4).collect()}
    # symmetric ring: every node has identical rank, and mass stays ~1.0
    assert len(set(pr.values())) == 1
    assert abs(sum(pr.values()) - 10**9) < n * 200  # floor-division leakage only


def test_pagerank_star_center_wins(spark):
    from agile_lakehouse_spark.operators import graph

    star = [(0, i) for i in range(1, 6)] + [(i, 0) for i in range(1, 6)]
    e = spark.createDataFrame(star, "u bigint, v bigint")
    pr = {r["node"]: r["pr"] for r in graph.pagerank(e, iters=5).collect()}
    assert pr[0] > max(pr[i] for i in range(1, 6)) * 2


def test_bfs_hops_line_graph(spark):
    from agile_lakehouse_spark.operators import graph

    line = [(i, i + 1) for i in range(5)] + [(i + 1, i) for i in range(5)]
    e = spark.createDataFrame(line, "u bigint, v bigint")
    d = {r["node"]: r["hops"] for r in graph.bfs_hops(e, source=0, max_hops=3).collect()}
    assert d == {0: 0, 1: 1, 2: 2, 3: 3}  # nodes beyond max_hops absent
