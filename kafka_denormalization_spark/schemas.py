"""Typed schemas — the reference's DTOs as explicit StructTypes.

Reference parity: the demo binds JSON payloads to Java records via
``JsonSerde`` (hackernews/dto/Comment.java:5-6, Story.java:7-9,
JoinedCommentStoryEvent.java:5-6); nothing validates shapes beyond Jackson.
Here the schemas are explicit — ``from_json`` yields typed (nullable)
columns and malformed payloads become NULLs you can route, not runtime
exceptions.

Field sets match FIXTURES.md F1/F2/F3 (taken from the reference's sample
payloads, README.md:15-33).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

COMMENT_SCHEMA = StructType(
    [
        StructField("by", StringType()),
        StructField("id", LongType(), nullable=False),
        StructField("parent", LongType()),
        StructField("text", StringType()),
        StructField("time", LongType(), nullable=False),
        StructField("type", StringType(), nullable=False),
        StructField("story", LongType(), nullable=False),  # FK -> stories.id
    ]
)

STORY_SCHEMA = StructType(
    [
        StructField("by", StringType()),
        StructField("descendants", LongType()),
        StructField("id", LongType(), nullable=False),
        StructField("kids", ArrayType(LongType())),
        StructField("score", LongType()),
        StructField("time", LongType(), nullable=False),
        StructField("title", StringType()),
        StructField("type", StringType(), nullable=False),
        StructField("url", StringType()),
        StructField("text", StringType()),
    ]
)

JOINED_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("comment", COMMENT_SCHEMA),
        StructField("story", STORY_SCHEMA),
    ]
)
