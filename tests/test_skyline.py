"""Pareto-front / skyline operator (operators/skyline.py)."""

from __future__ import annotations

import random

import pytest

from kafka_denormalization_spark.operators.skyline import pareto_front


def _brute_front(pts):
    """Reference O(n^2) dominance (the oracle's NOT EXISTS)."""
    out = []
    for p in pts:
        dominated = any(
            q[0] <= p[0] and q[1] >= p[1] and (q[0] < p[0] or q[1] > p[1])
            for q in pts
        )
        if not dominated:
            out.append(p)
    return sorted(out)


def _run(spark, pts, **kw):
    df = spark.createDataFrame(
        [(i, x, y) for i, (x, y) in enumerate(pts)], "id long, x double, y long"
    )
    return sorted(
        (r["x"], r["y"]) for r in pareto_front(df, "x", "y", **kw).collect()
    )


def test_hand_computed_front(spark):
    # minimize x, maximize y
    pts = [(1.0, 5), (2.0, 7), (2.0, 3), (3.0, 7), (0.5, 1), (4.0, 9)]
    # front: (0.5,1)? dominated by (1,5)? 1>0.5 no — (0.5,1) has the min
    # x, nothing has x<=0.5 with y>=1 except itself -> on front.
    # (1,5): nothing cheaper with y>=5 -> front. (2,7): front.
    # (3,7): dominated by (2,7). (2,3): dominated by (1,5)? 1<=2, 5>=3
    # strict -> dominated. (4,9): max y -> front.
    assert _run(spark, pts) == sorted(
        [(0.5, 1), (1.0, 5), (2.0, 7), (4.0, 9)]
    )


def test_duplicates_all_kept(spark):
    pts = [(1.0, 5), (1.0, 5), (2.0, 1)]
    out = _run(spark, pts)
    # duplicate front points never dominate each other; both rows return
    assert out == [(1.0, 5), (1.0, 5)]


def test_matches_brute_force_randomized(spark):
    rng = random.Random(7)
    pts = [
        (round(rng.uniform(0, 10), 2), rng.randint(0, 100)) for _ in range(300)
    ]
    expected = sorted(
        p for p in set(pts) for _ in range(pts.count(p))
        if p in set(_brute_front(list(set(pts))))
    )
    assert _run(spark, pts) == expected


def test_bucket_count_invariance(spark):
    """The bucket decomposition is an execution detail: any bucket count
    (including the degenerate single bucket = classic sorted skyline)
    yields the identical front."""
    rng = random.Random(11)
    pts = [
        (float(rng.randint(0, 20)), rng.randint(0, 50)) for _ in range(200)
    ]
    a = _run(spark, pts, num_buckets=1)
    b = _run(spark, pts, num_buckets=16)
    c = _run(spark, pts, num_buckets=1024)
    assert a == b == c


def test_constant_min_dim(spark):
    """All x equal: the front is exactly the max-y rows."""
    pts = [(3.0, 1), (3.0, 9), (3.0, 9), (3.0, 4)]
    assert _run(spark, pts) == [(3.0, 9), (3.0, 9)]


def test_null_criteria_excluded_and_never_dominate(spark):
    """ADVICE r07 #2 regression: a row with NULL min_col used to land in
    the top bucket (F.least skips NULLs) where its max_col poisoned the
    running max, wrongly eliminating legitimate front points. Contract:
    NULL-criteria rows are excluded — never on the front, never
    dominating (matches the oracle's NOT EXISTS under three-valued
    comparison)."""
    rows = [
        (0, 1.0, 5),      # front
        (1, 2.0, 7),      # front
        (2, None, 100),   # NULL x, huge y: must NOT eliminate (1.0, 5)
        (3, 0.5, None),   # NULL y: must NOT eliminate anything
        (4, 3.0, 2),      # dominated by (1.0, 5)
    ]
    df = spark.createDataFrame(rows, "id long, x double, y long")
    out = sorted(
        (r["x"], r["y"]) for r in pareto_front(df, "x", "y").collect()
    )
    assert out == [(1.0, 5), (2.0, 7)]
    # and with a single bucket too (degenerate path)
    out1 = sorted(
        (r["x"], r["y"])
        for r in pareto_front(df, "x", "y", num_buckets=1).collect()
    )
    assert out1 == [(1.0, 5), (2.0, 7)]


def test_validation(spark):
    df = None
    with pytest.raises(ValueError):
        pareto_front(df, "x", "y", num_buckets=0)
