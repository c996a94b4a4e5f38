"""Window operators + as-of join (operators/window.py, operators/asof.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_denormalization_spark.operators.asof import asof_join
from kafka_denormalization_spark.operators.window import (
    running_agg,
    sessionize,
    top_k_per_group,
)


def test_top_k_per_group(spark):
    df = spark.createDataFrame(
        [("a", 1, 10.0), ("a", 2, 30.0), ("a", 3, 20.0), ("b", 4, 5.0)],
        "g string, id int, v double",
    )
    out = top_k_per_group(df, ["g"], [F.col("v").desc(), F.col("id")], k=2)
    got = {(r["g"], r["id"], r["rank"]) for r in out.collect()}
    assert got == {("a", 2, 1), ("a", 3, 2), ("b", 4, 1)}


def test_running_agg(spark):
    df = spark.createDataFrame(
        [("a", 1, 10), ("a", 2, 5), ("a", 3, 1)], "g string, t int, v int"
    )
    out = running_agg(df, ["g"], [F.col("t")], F.sum("v"), "cum")
    assert [r["cum"] for r in out.orderBy("t").collect()] == [10, 15, 16]


def test_sessionize_gap_boundaries(spark):
    df = spark.createDataFrame(
        [("u", 0), ("u", 100), ("u", 1000), ("u", 1099), ("u", 5000)],
        "user string, ts long",
    )
    out = sessionize(df, "user", "ts", F.lit(500))
    sessions = [r["session_id"] for r in out.orderBy("ts").collect()]
    # gaps: 100 (same), 900 (new), 99 (same), 3901 (new)
    assert sessions == [1, 1, 2, 2, 3]


def test_asof_backward_inclusive_tie(spark):
    clicks = spark.createDataFrame([("u", 100, 1), ("u", 50, 2)], "k string, ts long, id int")
    errs = spark.createDataFrame(
        [("u", 100, 91), ("u", 60, 92), ("u", 10, 93)], "k string, ets long, eid int"
    )
    out = asof_join(clicks, errs, on="k", left_ts="ts", right_ts="ets")
    got = {r["id"]: r["eid"] for r in out.collect()}
    # ts=100 matches the equal-ts error (inclusive); ts=50 matches ets=10
    assert got == {1: 91, 2: 93}


def test_asof_no_match_is_null(spark):
    clicks = spark.createDataFrame([("u", 5, 1)], "k string, ts long, id int")
    errs = spark.createDataFrame([("u", 10, 91)], "k string, ets long, eid int")
    out = asof_join(clicks, errs, on="k", left_ts="ts", right_ts="ets").collect()
    assert out[0]["eid"] is None


def test_asof_forward(spark):
    clicks = spark.createDataFrame([("u", 5, 1), ("u", 70, 2)], "k string, ts long, id int")
    errs = spark.createDataFrame([("u", 10, 91), ("u", 60, 92)], "k string, ets long, eid int")
    out = asof_join(clicks, errs, on="k", left_ts="ts", right_ts="ets", direction="forward")
    got = {r["id"]: r["eid"] for r in out.collect()}
    assert got == {1: 91, 2: None}


def test_asof_rejects_overlapping_columns(spark):
    a = spark.createDataFrame([("u", 1, 2)], "k string, ts long, v long")
    b = spark.createDataFrame([("u", 1, 2)], "k string, ts2 long, v long")
    with pytest.raises(ValueError, match="overlap"):
        asof_join(a, b, on="k", left_ts="ts", right_ts="ts2")


def test_asof_single_shuffle(spark):
    """The scale property: union-and-window as-of adds exactly one exchange
    (no join blowup)."""
    from kafka_denormalization_spark.plans import count_exchanges

    a = spark.createDataFrame([("u", 1, 2)], "k string, ts long, v long")
    b = spark.createDataFrame([("u", 1, 2)], "k string, ts2 long, w long")
    out = asof_join(a, b, on="k", left_ts="ts", right_ts="ts2")
    assert count_exchanges(out) == 1


def test_range_join_bucket_boundaries(spark):
    """Bucketized range join: matches spanning a bucket boundary are found
    (the 2-bucket probe), bounds are inclusive, out-of-range drops."""
    from kafka_denormalization_spark.operators.range_join import range_join

    left = spark.createDataFrame([("u", 95, 1)], "k string, ts long, lid int")
    right = spark.createDataFrame(
        [("u", 95, 10), ("u", 105, 11), ("u", 96, 12), ("u", 106, 13), ("u", 94, 14)],
        "k string, rts long, rid int",
    )
    # window [ts+0, ts+10] = [95, 105]: rids 10 (==lower), 11 (==upper), 12; not 13/14
    out = range_join(left, right, on="k", left_ts="ts", right_ts="rts", lower=0, upper=10)
    assert sorted(r["rid"] for r in out.collect()) == [10, 11, 12]


def test_range_join_negative_window(spark):
    from kafka_denormalization_spark.operators.range_join import range_join

    left = spark.createDataFrame([("u", 100, 1)], "k string, ts long, lid int")
    right = spark.createDataFrame(
        [("u", 92, 10), ("u", 100, 11), ("u", 89, 12)], "k string, rts long, rid int"
    )
    # [ts-10, ts+0] = [90, 100]
    out = range_join(left, right, on="k", left_ts="ts", right_ts="rts", lower=-10, upper=0)
    assert sorted(r["rid"] for r in out.collect()) == [10, 11]


def test_range_join_left_outer(spark):
    """left_outer must emit exactly ONE null-extended row per unmatched
    left row — never one per exploded bucket copy — and no null row for a
    left matched in only one of its two bucket probes."""
    from kafka_denormalization_spark.operators.range_join import range_join

    left = spark.createDataFrame(
        [("a", 5, "m"), ("a", 5, "m"), ("a", 100, "u"), ("b", 7, "u")],
        "k string, ts long, tag string",
    )
    right = spark.createDataFrame([("a", 9)], "k string, rts long")
    out = range_join(
        left, right, on="k", left_ts="ts", right_ts="rts", lower=0, upper=10,
        how="left_outer",
    ).collect()
    rows = sorted((r["k"], r["ts"], r["tag"], r["rts"]) for r in out)
    # both duplicate matched rows keep their match; each unmatched left
    # appears exactly once with a null right
    assert rows == [
        ("a", 5, "m", 9),
        ("a", 5, "m", 9),
        ("a", 100, "u", None),
        ("b", 7, "u", None),
    ]


def test_range_join_rejects_right_preserving(spark):
    import pytest as _pytest

    from kafka_denormalization_spark.operators.range_join import range_join

    left = spark.createDataFrame([("a", 1)], "k string, ts long")
    right = spark.createDataFrame([("a", 2)], "k string, rts long")
    for how in ("right_outer", "full_outer", "left_semi"):
        with _pytest.raises(ValueError):
            range_join(left, right, on="k", left_ts="ts", right_ts="rts",
                       lower=0, upper=10, how=how)


def test_range_join_left_outer_randomized_vs_bruteforce(spark):
    import random

    from kafka_denormalization_spark.operators.range_join import range_join

    rng = random.Random(7)
    lrows = [(str(rng.randint(0, 3)), rng.randint(0, 200), i) for i in range(60)]
    rrows = [(str(rng.randint(0, 3)), rng.randint(0, 200), i) for i in range(40)]
    ldf = spark.createDataFrame(lrows, "k string, ts long, lid long")
    rdf = spark.createDataFrame(rrows, "k string, rts long, rid long")
    got = sorted(
        (r["k"], r["ts"], r["lid"], r["rts"], r["rid"])
        for r in range_join(ldf, rdf, on="k", left_ts="ts", right_ts="rts",
                            lower=-15, upper=15, how="left_outer").collect()
    )
    expect = []
    for lk, lts, lid in lrows:
        matches = [
            (rk, rts, rid) for rk, rts, rid in rrows
            if rk == lk and lts - 15 <= rts <= lts + 15
        ]
        if matches:
            expect.extend((lk, lts, lid, rts, rid) for _, rts, rid in matches)
        else:
            expect.append((lk, lts, lid, None, None))
    assert got == sorted(expect)


def test_scd2_intervals_and_as_of(spark):
    """SCD2: intervals partition each key's timeline; as_of(T) returns
    exactly one version per key for any T inside the history."""
    from kafka_denormalization_spark.operators.scd import as_of, scd2_from_changelog

    rows = [
        ("k1", 100, "v1"), ("k1", 200, "v2"), ("k1", 300, "v3"),
        ("k2", 150, "w1"),
    ]
    df = spark.createDataFrame(rows, "key string, ver long, val string")
    scd = scd2_from_changelog(df, ["key"], ["ver"])
    got = {(r.key, r.ver, r.valid_from, r.valid_to) for r in scd.collect()}
    assert got == {
        ("k1", 100, 100, 200), ("k1", 200, 200, 300), ("k1", 300, 300, None),
        ("k2", 150, 150, None),
    }
    at = {(r.key, r.val) for r in as_of(scd, F.lit(250)).collect()}
    assert at == {("k1", "v2"), ("k2", "w1")}
    # before any history for k2's start: only versions valid at T=120
    early = {(r.key, r.val) for r in as_of(scd, F.lit(120)).collect()}
    assert early == {("k1", "v1")}


def test_scd2_current_matches_latest_per_key(spark):
    from kafka_denormalization_spark.operators.latest import latest_per_key
    from kafka_denormalization_spark.operators.scd import scd2_from_changelog

    rows = [("a", 1, "x"), ("a", 2, "y"), ("b", 5, "z")]
    df = spark.createDataFrame(rows, "key string, ver long, val string")
    current = (
        scd2_from_changelog(df, ["key"], ["ver"])
        .filter(F.col("valid_to").isNull())
        .select("key", "ver", "val")
    )
    latest = latest_per_key(df, ["key"], ["ver", "val"])
    assert {tuple(r) for r in current.collect()} == {tuple(r) for r in latest.collect()}
