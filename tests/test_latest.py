"""latest_per_key: KTable/compaction semantics (SURVEY §2 O2)."""

from __future__ import annotations

import pytest

from kafka_denormalization_spark.operators.latest import latest_per_key


@pytest.mark.parametrize("strategy", ["max_by", "window"])
def test_latest_comment_wins(spark, comments, strategy):
    latest = latest_per_key(comments, ["id"], ["time"], strategy=strategy)
    rows = {r["id"]: r for r in latest.collect()}
    assert len(rows) == 4
    assert rows[1]["text"] == "first! (edited)"
    assert rows[1]["time"] == 1010


@pytest.mark.parametrize("strategy", ["max_by", "window"])
def test_latest_story_wins(spark, stories, strategy):
    latest = latest_per_key(stories, ["id"], ["time"], strategy=strategy)
    rows = {r["id"]: r for r in latest.collect()}
    assert len(rows) == 3
    assert rows[100]["score"] == 42


def test_strategies_agree(spark, comments):
    a = latest_per_key(comments, ["id"], ["time", "text"], strategy="max_by")
    b = latest_per_key(comments, ["id"], ["time", "text"], strategy="window")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_composite_key(spark):
    df = spark.createDataFrame(
        [(1, "a", 10, "x"), (1, "a", 20, "y"), (1, "b", 5, "z")],
        "k1 int, k2 string, v int, payload string",
    )
    latest = latest_per_key(df, ["k1", "k2"], ["v"])
    got = {(r["k1"], r["k2"]): r["payload"] for r in latest.collect()}
    assert got == {(1, "a"): "y", (1, "b"): "z"}


def test_rejects_empty_args(spark, comments):
    with pytest.raises(ValueError):
        latest_per_key(comments, [], ["time"])
    with pytest.raises(ValueError):
        latest_per_key(comments, ["id"], [])
    with pytest.raises(ValueError):
        latest_per_key(comments, ["id"], ["time"], strategy="bogus")
