"""The reference's demo pipeline (hackernews/HackerNewsPipeline.java:41-54),
re-expressed end-to-end: JSON comment/story payloads -> typed frames ->
upsert denormalization -> nested JSON output.

Runnable without Kafka: feeds literal JSON (the reference's own sample
payloads, README.md:15-33) through the same serde + DSL path a Kafka
deployment would use. With a broker + connector jar, swap the literal
frames for ``sources.kafka.read_kafka_stream(...)`` and the final
``show`` for ``sources.kafka.write_kafka_stream(...)``.

Run: python examples/hackernews_pipeline.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from kafka_denormalization_spark.dsl import Denormalize
from kafka_denormalization_spark.engine import get_spark
from kafka_denormalization_spark.functions.json_io import parse_json, render_json
from kafka_denormalization_spark.schemas import COMMENT_SCHEMA, STORY_SCHEMA

COMMENT_JSON = (
    '{"by":"zinekeller","id":32546427,"parent":32546388,"text":"Direct link","'
    'time":1661132891,"type":"comment","story":32545513}'
)
STORY_JSON = (
    '{"by":"thesuperbigfrog","descendants":40,"id":32545513,"score":50,'
    '"time":1661124181,"title":"The Google Pixel 6a highlights everything '
    'wrong with the U.S. phone market","type":"story","url":"https://example.com"}'
)


def main() -> None:
    spark = get_spark("hackernews-example")

    raw_comments = spark.createDataFrame(
        [("32546427", COMMENT_JSON)], "key string, value string"
    )
    raw_stories = spark.createDataFrame(
        [("32545513", STORY_JSON)], "key string, value string"
    )

    comments = parse_json(raw_comments, "value", COMMENT_SCHEMA, out="v").select("v.*")
    stories = parse_json(raw_stories, "value", STORY_SCHEMA, out="v").select("v.*")

    joined = (
        Denormalize.builder()
        .left(comments, key=["id"], version=["time", "id"])
        .right(stories, key=["id"], version=["time", "id"])
        .join_on("story")
        .joiner("comment", "story")
        .key_by(lambda df: F.col("comment.id").cast("string"))
        .inner()
    )

    out = joined.select("key", render_json(F.struct("comment", "story")).alias("value"))
    for row in out.collect():
        print(row["key"], "->", row["value"][:120], "...")


if __name__ == "__main__":
    main()
