"""Fluent builder — the Spark-native equivalent of the reference's only
public API, ``StreamDenormalize.builder()...innerJoin(builder)``
(dsl/StreamDenormalize.java:19-77; usage README.md:37-56,
HackerNewsPipeline.java:41-54).

Reference builder fields -> this builder:

| reference (StreamDenormalize.java)      | here                               |
|-----------------------------------------|------------------------------------|
| leftTopic/leftKeySerde/leftValueSerde   | ``.left(df, key=, version=)``      |
| rightTopic/right serdes                 | ``.right(df, key=, version=)``     |
| joinOn (FK from left value) :31         | ``.join_on(fk_col)``               |
| joinOnKeys (FK from left key) :32       | ``.join_on_key()``                 |
| joiner (ValueJoiner) :33                | ``.joiner(left_name, right_name)`` |
| keyMapper :34                           | ``.key_by(expr_fn)``               |
| keySchema (Blake2b digests) :27         | not needed — join on values        |
| indexTopic/indexStore :29-30            | not needed — Catalyst join state   |
| .innerJoin(builder) :36                 | ``.inner()`` (+ 3 outer flavors)   |

The builder validates exactly-one-of join_on/join_on_key, mirroring
dsl/StreamDenormalize.java:37-38, :51-52.

Upsert semantics: both sides are treated as changelogs — latest version per
key wins before the join (SURVEY §3.5 "golden invariant":
output == latest(left) ⋈ latest(right) for every interleaving).
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kafka_denormalization_spark.operators.assemble import side_struct
from kafka_denormalization_spark.operators.join import fk_denormalize
from kafka_denormalization_spark.operators.latest import latest_per_key


class Denormalize:
    """Two-sided FK denormalization with upsert semantics.

    Example (the HackerNews pipeline of HackerNewsPipeline.java:41-54)::

        out = (Denormalize.builder()
               .left(comments, key=["id"], version=["time", "id"])
               .right(stories, key=["id"], version=["time", "id"])
               .join_on("story")
               .joiner("comment", "story")
               .key_by(lambda j: F.col("comment.id").cast("string"))
               .inner())
    """

    def __init__(self) -> None:
        self._left: DataFrame | None = None
        self._right: DataFrame | None = None
        self._left_key: Sequence[str] = ()
        self._right_key: Sequence[str] = ()
        self._left_version: Sequence[str] | None = None
        self._right_version: Sequence[str] | None = None
        self._join_on: str | None = None
        self._join_on_key: bool = False
        self._left_name = "left"
        self._right_name = "right"
        self._key_by: Callable[[DataFrame], Column] | None = None
        self._broadcast_right = False
        self._latest_strategy = "window"

    @staticmethod
    def builder() -> "Denormalize":
        return Denormalize()

    def left(self, df: DataFrame, key: Sequence[str], version: Sequence[str] | None = None) -> "Denormalize":
        """N-side changelog. ``version`` orders upserts (omit if keys unique)."""
        self._left, self._left_key, self._left_version = df, list(key), version
        return self

    def right(self, df: DataFrame, key: Sequence[str], version: Sequence[str] | None = None) -> "Denormalize":
        """1-side changelog (the join target)."""
        self._right, self._right_key, self._right_version = df, list(key), version
        return self

    def join_on(self, fk: str) -> "Denormalize":
        """FK extracted from the left *value* (LeftKeyMapper.java:19-22 via
        keySchema.joinOn, schema/JoinKeySchema.java:35-37)."""
        self._join_on = fk
        return self

    def join_on_key(self) -> "Denormalize":
        """FK is the left *key* itself (schema/JoinKeySchema.java:39-41,
        dsl/StreamDenormalize.java:47-50)."""
        self._join_on_key = True
        return self

    def joiner(self, left_name: str, right_name: str) -> "Denormalize":
        """Names for the nested output structs (ValueJoiner,
        dto/JoinedCommentStoryEvent.java:5)."""
        self._left_name, self._right_name = left_name, right_name
        return self

    def key_by(self, fn: Callable[[DataFrame], Column]) -> "Denormalize":
        """Output key mapper (dsl/StreamDenormalize.java:34)."""
        self._key_by = fn
        return self

    def latest_strategy(self, strategy: str) -> "Denormalize":
        """Upsert-dedup strategy: 'window' (pruning-friendly, default) or
        'max_by' (map-side combine for high-duplication changelogs) — see
        operators/latest.py scale notes."""
        self._latest_strategy = strategy
        return self

    def broadcast_right(self, flag: bool = True) -> "Denormalize":
        """Broadcast the 1-side (scale knob; no reference analog — the
        reference always co-partitions via JoinKeyPartitioner.java:20-22)."""
        self._broadcast_right = flag
        return self

    # -- join flavors (JoinTransformer.java:72-130) --------------------------

    def inner(self) -> DataFrame:
        return self._build("inner")

    def left_outer(self) -> DataFrame:
        return self._build("left_outer")

    def right_outer(self) -> DataFrame:
        return self._build("right_outer")

    def full_outer(self) -> DataFrame:
        return self._build("full_outer")

    # ------------------------------------------------------------------------

    def _build(self, how: str) -> DataFrame:
        if self._left is None or self._right is None:
            raise ValueError("both .left(...) and .right(...) are required")
        if (self._join_on is None) == (not self._join_on_key):
            # mirrors the reference's exactly-one-of validation
            # (dsl/StreamDenormalize.java:37-38, :51-52)
            raise ValueError("exactly one of .join_on(fk) / .join_on_key() required")
        if len(self._right_key) != 1:
            raise ValueError("right key must be a single column (N:1 join target)")

        left = self._left
        right = self._right
        fk = self._join_on if self._join_on is not None else self._left_key[0]
        if self._left_version and fk in self._left_key and not self._broadcast_right:
            # one exchange serves both the upsert-dedup window and the join:
            # hash(fk) co-locates every (fk, ...) dedup group AND every join
            # key (valid only because fk is part of the dedup key; must run
            # BEFORE the dedup so its window reuses this partitioning).
            # Measured 2x on non-broadcast joins (docs/SCALE_NOTES.md).
            left = left.repartition(F.col(fk))
        if self._left_version:
            left = latest_per_key(
                left, self._left_key, self._left_version, self._latest_strategy
            )
        if self._right_version:
            right = latest_per_key(
                right, self._right_key, self._right_version, self._latest_strategy
            )
        joined, _, _ = fk_denormalize(
            left, right, fk, self._right_key[0], how=how,
            broadcast_right=self._broadcast_right,
        )

        cols = []
        lstruct = side_struct(
            left, "l",
            null_when_key_null=self._left_key[0] if how in ("right_outer", "full_outer") else None,
        ).alias(self._left_name)
        rstruct = side_struct(
            right, "r",
            null_when_key_null=self._right_key[0] if how in ("left_outer", "full_outer") else None,
        ).alias(self._right_name)
        cols = [lstruct, rstruct]
        out = joined.select(*cols)
        if self._key_by is not None:
            out = out.select(self._key_by(out).alias("key"), "*")
        return out
