"""Continuous changelog FK denormalization — Structured Streaming.

Reference parity: this is the faithful re-expression of
``JoinTransformer`` (transform/JoinTransformer.java:138-200) for true
streaming-upsert output (SURVEY §4.3.2 option b):

- both topics land in one co-partitioned stream (the reference's index topic,
  dsl/StreamDenormalize.java:43-60) -> here: union of side-tagged records,
  grouped by FK;
- per-FK state {latest right, map of lefts} (the prefix-scannable store,
  schema/JoinKey.java:94-99) -> ``applyInPandasWithState`` group state;
- left update: point lookup of right + emit (JoinTransformer.java:152-158);
- right update: re-emit every left for that FK (JoinTransformer.java:168-186);
- per-batch dedup (JoinTransformer.java:210-222): each affected left key is
  emitted at most once per micro-batch, with the latest values;
- no tombstones, no TTL — state lives forever (the reference's acknowledged
  gap, HackerNewsPipeline.java:35-36); pass ``ttl`` to do better than the
  reference.

Payloads travel as JSON strings — the Spark analog of the reference's
serde-opaque byte values (dsl/StreamDenormalize.java:25-26).

Scale notes:
- state is partitioned by FK across executors (Spark state store); a hot FK
  with millions of lefts concentrates its state in one partition — the same
  limit the reference has (one partition per FK digest,
  transform/JoinKeyPartitioner.java:20-22). The batch/incremental path
  (``incremental.py``) is the recommended mode for heavily skewed backfills.
- This is the Python-stateful slow path by design (custom semantics Spark
  lacks); the hot path stays JVM-side until the grouped state step, and
  payload JSON crosses via Arrow batches.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# input contract: one side-tagged record stream (FIXTURES.md F4 shape)
UPDATE_SCHEMA = StructType(
    [
        StructField("seq", LongType()),       # arrival order within the batch
        StructField("side", StringType()),    # 'left' | 'right'
        StructField("key", StringType()),     # record key (id as string)
        StructField("fk", StringType()),      # join FK (right key for rights)
        StructField("payload", StringType()), # JSON value
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("key", StringType()),     # output key = left key
        StructField("fk", StringType()),
        StructField("left_value", StringType()),
        StructField("right_value", StringType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("right_value", StringType()),
        StructField("left_keys", ArrayType(StringType())),
        StructField("left_values", ArrayType(StringType())),
    ]
)


def _joiner(how: str, ttl_ms: int | None = None, tombstones: bool = True):
    left_outer = how in ("left_outer", "full_outer")
    right_outer = how in ("right_outer", "full_outer")

    def update(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        fk = key[0]
        if ttl_ms is not None and state.hasTimedOut:
            # state TTL: drop this FK's index entries (the reference keeps
            # state forever — its acknowledged gap, HackerNewsPipeline.java:35-36)
            state.remove()
            return
        if state.exists:
            right_value, left_keys, left_values = state.get
            lefts = dict(zip(left_keys, left_values))
        else:
            right_value, lefts = None, {}

        affected: set[str] = set()
        deleted_lefts: set[str] = set()
        right_updated = False
        right_deleted = False
        right_existed = right_value is not None
        # applyInPandasWithState delivers one group's batch as MULTIPLE Arrow
        # chunks (~10k rows each); sorting per-chunk would let a lower-seq
        # row in a later chunk overwrite a higher-seq one. Materialize the
        # whole group (bounded by one FK's batch volume) and sort ONCE so
        # last-write-wins follows the global seq order.
        chunks = [pdf for pdf in pdfs if len(pdf)]
        rows = (
            pd.concat(chunks, ignore_index=True) if chunks else pd.DataFrame()
        )
        if len(rows):
            for row in rows.sort_values("seq", kind="stable").itertuples(index=False):
                is_tombstone = tombstones and (
                    row.payload is None or row.payload != row.payload  # None/NaN
                )
                if row.side == "left":
                    if is_tombstone:
                        # delete handling — a gap in the reference (no
                        # null-value check at JoinTransformer.java:138).
                        # Retract only if the key actually existed.
                        if row.key in lefts:
                            del lefts[row.key]
                            deleted_lefts.add(row.key)
                        affected.discard(row.key)
                    else:
                        lefts[row.key] = row.payload
                        affected.add(row.key)
                        deleted_lefts.discard(row.key)
                else:
                    right_value = None if is_tombstone else row.payload
                    right_updated = True
                    right_deleted = is_tombstone
                    right_existed = right_existed or not is_tombstone

        state.update((right_value, list(lefts.keys()), list(lefts.values())))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)

        # right update fans out to every indexed left
        # (JoinTransformer.java:172-186); left updates emit just themselves
        # (:152-158). Each key at most once per batch (:210-222).
        emit_keys = sorted(lefts.keys() if right_updated else affected)
        out = []
        for k in emit_keys:
            if right_value is not None or left_outer:
                out.append((k, fk, lefts[k], right_value))
            elif right_deleted and right_existed:
                # inner join: previously-emitted pairs are now invalid ->
                # changelog retraction (null values for the output key)
                out.append((k, fk, None, None))
        for k in sorted(deleted_lefts):
            out.append((k, fk, None, None))
        if right_updated and not lefts and right_outer and right_value is not None:
            out.append((None, fk, None, right_value))
        if out:
            yield pd.DataFrame(out, columns=["key", "fk", "left_value", "right_value"])

    return update


def upsert_join(
    updates: DataFrame,
    how: str = "inner",
    ttl_ms: int | None = None,
    tombstones: bool = True,
) -> DataFrame:
    """Continuous FK denormalization over a side-tagged update stream.

    ``updates`` must match UPDATE_SCHEMA (streaming or batch-tested via
    memory sink). Returns the changelog stream (OUTPUT_SCHEMA): one record
    per (re-)joined left, re-emitted whenever either side changes.

    ``ttl_ms``: evict an FK's state after that many ms without updates
    (processing-time timeout). ``None`` = keep forever, matching the
    reference's compact-topic semantics.

    ``tombstones``: treat a NULL payload as a delete (Kafka compaction
    convention): the key leaves the index and a retraction record (null
    values) is emitted for every invalidated join output. The reference
    ignores deletes entirely (no null-value handling,
    JoinTransformer.java:138) — set ``tombstones=False`` for bug-parity.
    """
    if how not in ("inner", "left_outer", "right_outer", "full_outer"):
        raise ValueError(f"unknown join flavor {how!r}")
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return (
        updates.groupBy(F.col("fk"))
        .applyInPandasWithState(
            _joiner(how, ttl_ms, tombstones),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=timeout,
        )
    )


def tag_side(
    df: DataFrame,
    side: str,
    key: str,
    fk: str | None,
    payload_cols: list[str],
    seq: str,
) -> DataFrame:
    """Project a typed changelog frame into the UPDATE_SCHEMA shape.

    ``fk=None`` (right side) uses the record key as the join FK — rights are
    keyed by the FK itself (RightKeyMapper.java:16-18)."""
    fk_col = F.col(fk) if fk else F.col(key)
    return df.select(
        F.col(seq).cast("long").alias("seq"),
        F.lit(side).alias("side"),
        F.col(key).cast("string").alias("key"),
        fk_col.cast("string").alias("fk"),
        F.to_json(F.struct(*[F.col(c) for c in payload_cols])).alias("payload"),
    )
