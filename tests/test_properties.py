"""Property-based tests (hypothesis) for semantics that must hold on ANY input.

Complements the fixture tests: ranges/sampling/cells are checked against a
plain-Python reference model on generated data, so edge cases (empty boxes,
negative coords, boundary values) are explored automatically.
"""

import math

from hypothesis import given, settings, strategies as st

from agile_lakehouse_spark.functions import portable
from agile_lakehouse_spark.operators import pointcloud as pc
from agile_lakehouse_spark.plans.layout import derive_quadtree_depth

coords = st.floats(min_value=-1000, max_value=1000, allow_nan=False, width=32)


@settings(max_examples=10, deadline=None)
@given(
    pts=st.lists(st.tuples(coords, coords), min_size=1, max_size=40),
    lo=coords,
    width=st.floats(min_value=0.1, max_value=500, allow_nan=False),
)
def test_range_query_matches_python_model(spark, pts, lo, width):
    df = spark.createDataFrame(
        [(i, float(x), float(y)) for i, (x, y) in enumerate(pts)], "pid int, x double, y double"
    )
    hi = lo + width
    got = sorted(r.pid for r in pc.range_query(df, {"x": (lo, hi)}).collect())
    want = sorted(i for i, (x, _) in enumerate(pts) if lo <= x < hi)
    assert got == want


@settings(max_examples=10, deadline=None)
@given(pts=st.lists(st.tuples(coords, coords), min_size=1, max_size=40), delta=st.floats(min_value=0.5, max_value=300))
def test_grid_cells_match_floor_model(spark, pts, delta):
    df = spark.createDataFrame(
        [(i, float(x), float(y)) for i, (x, y) in enumerate(pts)], "pid int, x double, y double"
    )
    got = {r.pid: (r.cell_x, r.cell_y) for r in pc.grid_cells(df, {"x": delta, "y": delta}).collect()}
    for i, (x, y) in enumerate(pts):
        assert got[i] == (math.floor(x / delta), math.floor(y / delta))


@settings(max_examples=30, deadline=None)
@given(n=st.integers(min_value=1, max_value=10**12))
def test_quadtree_depth_monotone(n):
    assert derive_quadtree_depth(n) >= 0
    assert derive_quadtree_depth(4 * n) >= derive_quadtree_depth(n)


@settings(max_examples=20, deadline=None)
@given(s=st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=40))
def test_fingerprint_model(spark, s):
    df = spark.createDataFrame([(0, s)], "doc_id long, text string")
    from agile_lakehouse_spark.operators.text import fingerprint

    got = fingerprint(df).collect()[0].fp
    want = 0
    for ch in s:
        want = (want * 31 + ord(ch)) % portable.FNV_MOD
    assert got == want


@settings(max_examples=10, deadline=None)
@given(
    edges=st.lists(
        st.tuples(st.integers(min_value=0, max_value=14), st.integers(min_value=0, max_value=14)),
        min_size=1,
        max_size=20,
    )
)
def test_connected_components_match_union_find(spark, edges):
    from agile_lakehouse_spark.operators.graph import connected_components

    edges = [(a, b) for a, b in edges if a != b]
    if not edges:
        return
    # reference model: classic union-find with min-representative labels
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {x: find(x) for x in parent}

    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.component for r in connected_components(df, "src", "dst", "node").collect()}
    assert got == want
