from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from kafka_denormalization_spark.engine import get_spark


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("tests")
    yield spark


# -- HackerNews-shaped fixtures (FIXTURES.md F1/F2) --------------------------


@pytest.fixture(scope="session")
def comments(spark):
    """Left/N side: upsert stream keyed by id, FK = story.
    Includes: a duplicate id with later time (upsert), an orphan FK (story
    999 has no story row), and two comments on one story (fan-out)."""
    rows = [
        # (by, id, parent, text, time, type, story)
        ("alice", 1, 100, "first!", 1000, "comment", 100),
        ("bob", 2, 100, "second", 1001, "comment", 100),
        ("carol", 3, 200, "hello", 1002, "comment", 200),
        ("dave", 4, 999, "orphan", 1003, "comment", 999),
        ("alice", 1, 100, "first! (edited)", 1010, "comment", 100),
    ]
    return spark.createDataFrame(
        rows, "by string, id long, parent long, text string, time long, type string, story long"
    )


@pytest.fixture(scope="session")
def stories(spark):
    """Right/1 side: story 300 has zero comments (right-outer case);
    story 100 has a later upsert changing its score."""
    rows = [
        # (by, descendants, id, score, time, title, type)
        ("sam", 2, 100, 10, 900, "story hundred", "story"),
        ("tim", 1, 200, 5, 901, "story two hundred", "story"),
        ("uma", 0, 300, 1, 902, "lonely story", "story"),
        ("sam", 2, 100, 42, 950, "story hundred (updated)", "story"),
    ]
    return spark.createDataFrame(
        rows, "by string, descendants long, id long, score long, time long, title string, type string"
    )
