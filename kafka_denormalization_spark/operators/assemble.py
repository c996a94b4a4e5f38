"""Output assembly: nested value joiner + output key mapper.

Reference parity:
- ``ValueJoiner<V,FV,VR>`` combines left+right values into one nested output
  value (dsl/StreamDenormalize.java:33; demo ``JoinedCommentStoryEvent::new``
  at HackerNewsPipeline.java:50, dto/JoinedCommentStoryEvent.java:5).
- ``KeyValueMapper<JoinKey, VR, KR>`` computes the output record key
  (dsl/StreamDenormalize.java:34; demo keys by comment id,
  HackerNewsPipeline.java:51).

Spark-first: ``struct()`` projection — pure Catalyst expressions, fully inside
whole-stage codegen; an outer-join null side becomes a null struct (matching
the reference's null left/right value at JoinTransformer.java:159-166,
:192-196).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def side_struct(df: DataFrame, alias: str, null_when_key_null: str | None = None) -> Column:
    """Pack one join side's columns into a named struct.

    ``null_when_key_null``: for outer joins, Spark yields a struct of nulls
    for the missing side rather than a null struct; passing the side's key
    column collapses that to a true NULL (the reference emits a null value,
    JoinTransformer.java:162, :195).
    """
    s = F.struct(*[F.col(f"{alias}.{c}").alias(c) for c in df.columns])
    if null_when_key_null is not None:
        s = F.when(F.col(f"{alias}.{null_when_key_null}").isNotNull(), s)
    return s


def assemble(
    joined: DataFrame,
    columns: Sequence[Column],
) -> DataFrame:
    """Final projection of the joined frame (value joiner + key mapper)."""
    return joined.select(*columns)
