"""Two-stream streaming pipeline + salted join."""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import functions as F

from kafka_denormalization_spark.operators.skew import salted_join
from kafka_denormalization_spark.streaming.pipeline import stream_denormalize


def test_stream_denormalize_two_file_streams(spark, tmp_path):
    """The reference's HackerNews wiring, end-to-end in streaming mode:
    comments stream + stories stream -> joined changelog."""
    cdir, sdir = str(tmp_path / "comments"), str(tmp_path / "stories")
    comments = spark.createDataFrame(
        [("alice", 1, "first", 900, 100), ("bob", 2, "second", 901, 100)],
        "by string, id long, text string, time long, story long",
    )
    stories = spark.createDataFrame(
        [(100, "story hundred", 950)], "id long, title string, time long"
    )
    comments.coalesce(1).write.mode("overwrite").parquet(cdir)
    stories.coalesce(1).write.mode("overwrite").parquet(sdir)

    cstream = spark.readStream.schema(comments.schema).parquet(cdir)
    sstream = spark.readStream.schema(stories.schema).parquet(sdir)
    out = stream_denormalize(
        cstream,
        sstream,
        left_key="id",
        left_fk="story",
        right_key="id",
        left_payload=["by", "id", "text", "story"],
        right_payload=["id", "title"],
        left_seq="time",
        right_seq="time",
        how="inner",
    )
    name = "pipe_" + uuid.uuid4().hex[:8]
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", os.path.join(str(tmp_path), "ck"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = spark.sql(f"SELECT * FROM {name}").collect()
    got = {
        (r["key"], json.loads(r["left_value"])["text"], json.loads(r["right_value"])["title"])
        for r in rows
    }
    assert got == {
        ("1", "first", "story hundred"),
        ("2", "second", "story hundred"),
    }


def test_salted_join_matches_plain_join(spark):
    big = spark.createDataFrame(
        [(k, i) for k in ("hot", "cold") for i in range(50 if k == "hot" else 2)],
        "k string, v int",
    )
    small = spark.createDataFrame([("hot", 1.0), ("cold", 2.0)], "sk string, w double")
    plain = big.join(small, big["k"] == small["sk"]).select("k", "v", "w")
    salted = salted_join(big, small, "k", "sk", salt=4)
    assert sorted(map(tuple, salted.select("k", "v", "w").collect())) == sorted(
        map(tuple, plain.collect())
    )


def test_salted_join_left_outer_preserves_unmatched(spark):
    big = spark.createDataFrame([("a", 1), ("orphan", 2)], "k string, v int")
    small = spark.createDataFrame([("a", 9.0)], "sk string, w double")
    out = salted_join(big, small, "k", "sk", salt=3, how="left_outer")
    got = {(r["k"], r["w"]) for r in out.select("k", "w").collect()}
    assert got == {("a", 9.0), ("orphan", None)}


def test_salted_join_rejects_small_side_preserving(spark):
    import pytest as _pytest

    from kafka_denormalization_spark.operators.skew import salted_join

    big = spark.createDataFrame([(1, "x")], "k long, v string")
    small = spark.createDataFrame([(1, "d")], "k long, d string")
    for how in ("right_outer", "full_outer"):
        with _pytest.raises(ValueError):
            salted_join(big, small, "k", "k", salt=4, how=how)
