"""Registration operators (reference pc-format/examples/registration.rs):
rigid transform + discrete Hausdorff distance."""

import math

import numpy as np
import pytest

from pyspark.sql import functions as F

from agile_lakehouse_spark.operators import pointcloud as pc


def _cloud(spark, pts):
    return spark.createDataFrame(
        [(i, float(x), float(y), float(z)) for i, (x, y, z) in enumerate(pts)],
        "pid bigint, x double, y double, z double",
    )


def _rot_z(angle, tx=0.0, ty=0.0, tz=0.0):
    c, s = math.cos(angle), math.sin(angle)
    return [[c, -s, 0.0, tx], [s, c, 0.0, ty], [0.0, 0.0, 1.0, tz], [0.0, 0.0, 0.0, 1.0]]


def test_transform_matches_numpy(spark):
    rng = np.random.default_rng(5)
    pts = rng.normal(size=(50, 3)) * 10
    m = _rot_z(0.7, 3.0, -2.0, 1.5)
    got = (
        pc.transform_points(_cloud(spark, pts), m)
        .orderBy("pid")
        .select("x", "y", "z")
        .collect()
    )
    hom = np.hstack([pts, np.ones((50, 1))])
    want = (np.array(m) @ hom.T).T[:, :3]
    assert np.allclose(np.array([[r.x, r.y, r.z] for r in got]), want)


def test_transform_projective_divide(spark):
    # non-affine bottom row engages the homogeneous divide
    m = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0], [0.0, 0.0, 1.0, 0.0], [0.0, 0.0, 0.0, 2.0]]
    got = pc.transform_points(_cloud(spark, [(4.0, -6.0, 8.0)]), m).collect()[0]
    assert (got.x, got.y, got.z) == (2.0, -3.0, 4.0)


def test_transform_rejects_bad_matrix(spark):
    with pytest.raises(ValueError, match="4x4"):
        pc.transform_points(_cloud(spark, [(0.0, 0.0, 0.0)]), [[1.0, 0.0], [0.0, 1.0]])


def test_hausdorff_known_clouds(spark):
    # reference example's shape: tiny clouds, hand-checkable answer
    a = _cloud(spark, [(0.0, 0.0, 0.0), (1.0, 0.0, 0.0)])
    b = _cloud(spark, [(0.0, 0.0, 0.0), (5.0, 0.0, 0.0)])
    # directed a->b max-min = 1 (point (1,0,0) to origin); b->a max-min = 4
    got = pc.hausdorff_distance(a, b).collect()[0].hausdorff
    assert got == pytest.approx(4.0)


def test_hausdorff_matches_bruteforce_numpy(spark):
    rng = np.random.default_rng(9)
    pa, pb = rng.normal(size=(40, 3)) * 5, rng.normal(size=(30, 3)) * 5 + 1
    got = pc.hausdorff_distance(_cloud(spark, pa), _cloud(spark, pb)).collect()[0].hausdorff
    dm = np.sqrt(((pa[:, None, :] - pb[None, :, :]) ** 2).sum(-1))
    want = max(dm.min(axis=1).max(), dm.min(axis=0).max())
    assert got == pytest.approx(want)


def test_hausdorff_rotation_invariance(spark):
    """Rigid transforms preserve all pairwise distances, hence Hausdorff:
    H(Ra, Rb) == H(a, b) — the property the reference's angle-search
    optimizer relies on (it minimizes H(x, R(angle)a) over angle)."""
    rng = np.random.default_rng(21)
    pa, pb = rng.normal(size=(25, 3)), rng.normal(size=(35, 3))
    m = _rot_z(1.234, 7.0, -3.0, 2.0)
    a, b = _cloud(spark, pa), _cloud(spark, pb)
    base = pc.hausdorff_distance(a, b).collect()[0].hausdorff
    rot = pc.hausdorff_distance(
        pc.transform_points(a, m), pc.transform_points(b, m)
    ).collect()[0].hausdorff
    assert rot == pytest.approx(base, rel=1e-9)


def test_hausdorff_identity_is_zero(spark):
    rng = np.random.default_rng(2)
    pa = rng.normal(size=(20, 3))
    a = _cloud(spark, pa)
    assert pc.hausdorff_distance(a, a).collect()[0].hausdorff == 0.0


def test_hausdorff_no_cartesian_shuffle(spark):
    """The plan must broadcast the min side — no shuffled cartesian."""
    rng = np.random.default_rng(1)
    a, b = _cloud(spark, rng.normal(size=(10, 3))), _cloud(spark, rng.normal(size=(10, 3)))
    plan = pc.hausdorff_distance(a, b)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan
