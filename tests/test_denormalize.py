"""End-to-end DSL tests: the reference's semantic contract (SURVEY §3.5).

Golden invariant: output == latest(left) ⋈ latest(right) per join flavor,
regardless of update interleaving (JoinTransformer.java:138-200).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_denormalization_spark.dsl import Denormalize


def _pipeline(comments, stories, flavor):
    b = (
        Denormalize.builder()
        .left(comments, key=["id"], version=["time", "id"])
        .right(stories, key=["id"], version=["time", "id"])
        .join_on("story")
        .joiner("comment", "story")
        .key_by(lambda df: F.col("comment.id").cast("string"))
    )
    return getattr(b, flavor)()


def test_inner_join_shape(spark, comments, stories):
    out = _pipeline(comments, stories, "inner")
    assert out.columns == ["key", "comment", "story"]
    rows = {r["key"]: r for r in out.collect()}
    # orphan comment 4 (story 999) dropped by inner join
    assert set(rows) == {"1", "2", "3"}
    # nested struct carries the full left and right values (README.md:27-33)
    assert rows["1"]["comment"]["text"] == "first! (edited)"  # upsert won
    assert rows["1"]["story"]["score"] == 42  # right upsert won
    assert rows["3"]["story"]["title"] == "story two hundred"


def test_left_outer_emits_null_story(spark, comments, stories):
    rows = {r["key"]: r for r in _pipeline(comments, stories, "left_outer").collect()}
    assert set(rows) == {"1", "2", "3", "4"}
    assert rows["4"]["story"] is None  # JoinTransformer.java:159-166
    assert rows["4"]["comment"]["text"] == "orphan"


def test_right_outer_emits_null_comment(spark, comments, stories):
    out = _pipeline(comments, stories, "right_outer").collect()
    lonely = [r for r in out if r["story"] is not None and r["story"]["id"] == 300]
    assert len(lonely) == 1
    assert lonely[0]["comment"] is None  # JoinTransformer.java:192-196
    assert lonely[0]["key"] is None


def test_full_outer(spark, comments, stories):
    out = _pipeline(comments, stories, "full_outer").collect()
    assert len(out) == 5  # 3 matched + orphan comment + lonely story
    null_story = [r for r in out if r["story"] is None]
    null_comment = [r for r in out if r["comment"] is None]
    assert len(null_story) == 1 and null_story[0]["comment"]["id"] == 4
    assert len(null_comment) == 1 and null_comment[0]["story"]["id"] == 300


def test_fanout_right_update_reaches_all_lefts(spark, comments, stories):
    """One story update re-emits every comment on it
    (JoinTransformer.java:172-186): both comments on story 100 see score 42."""
    out = _pipeline(comments, stories, "inner").collect()
    on_100 = [r for r in out if r["story"]["id"] == 100]
    assert len(on_100) == 2
    assert all(r["story"]["score"] == 42 for r in on_100)


def test_arrival_order_invariance(spark, comments, stories):
    """SURVEY §3.5: the joined set must not depend on row order — feed the
    sides in reversed/shuffled order and expect identical output."""
    def normalize(df):
        return sorted((r["key"], tuple(r["comment"]), tuple(r["story"])) for r in df.collect())

    base = normalize(_pipeline(comments, stories, "inner"))
    reversed_left = comments.orderBy(F.col("time").desc())
    reversed_right = stories.orderBy(F.col("time").desc())
    again = normalize(_pipeline(reversed_left, reversed_right, "inner"))
    assert base == again


def test_join_on_key_variant(spark, stories):
    """joinOnKeys (dsl/StreamDenormalize.java:47-50): FK is the left key."""
    left = spark.createDataFrame([(100, "meta-a"), (300, "meta-b")], "id long, note string")
    out = (
        Denormalize.builder()
        .left(left, key=["id"])
        .right(stories, key=["id"], version=["time", "id"])
        .join_on_key()
        .joiner("l", "r")
        .inner()
    )
    rows = {r["l"]["id"]: r["r"]["title"] for r in out.collect()}
    assert rows == {100: "story hundred (updated)", 300: "lonely story"}


def test_builder_validation(spark, comments, stories):
    b = Denormalize.builder().left(comments, key=["id"]).right(stories, key=["id"])
    with pytest.raises(ValueError):
        b.inner()  # neither join_on nor join_on_key
    with pytest.raises(ValueError):
        Denormalize.builder().left(comments, key=["id"]).inner()  # missing right
    b2 = (
        Denormalize.builder()
        .left(comments, key=["id"])
        .right(stories, key=["id", "time"])
        .join_on("story")
    )
    with pytest.raises(ValueError):
        b2.inner()  # composite right key
