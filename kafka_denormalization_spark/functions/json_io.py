"""JSON serde — bytes <-> typed rows per topic.

Reference parity: ``new JsonSerde<>(Comment.class)`` etc. bind JSON payloads
to typed records (hackernews/dto/Comment.java:6, Story.java:9,
JoinedCommentStoryEvent.java:6). Spark-first: ``from_json``/``to_json`` with an
explicit StructType — JVM-side, codegen'd, no Python in the loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def parse_json(df: DataFrame, col: str, schema: StructType | str, out: str = "value") -> DataFrame:
    """Deserialize a JSON string/binary column into a typed struct column."""
    return df.withColumn(out, F.from_json(F.col(col).cast("string"), schema))


def render_json(*cols: Column | str) -> Column:
    """Serialize columns into a JSON string (sink-side serde)."""
    packed = [F.col(c) if isinstance(c, str) else c for c in cols]
    if len(packed) == 1:
        return F.to_json(packed[0])
    return F.to_json(F.struct(*packed))
