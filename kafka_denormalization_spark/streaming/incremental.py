"""Incremental (micro-batch) changelog denormalization — SURVEY §4.3.2
option (a), the primary verified streaming mode.

Reference parity: identical observable semantics to the continuous mode in
``upsert_join.py`` (and thus to transform/JoinTransformer.java:138-200), but
state lives in hash-bucketed parquet and each call to ``process_batch``
plays one micro-batch:

- left update -> join against latest right, emit (JoinTransformer.java:152-158)
- right update -> re-emit ALL lefts for that FK (JoinTransformer.java:168-186)
- latest-per-key upsert state on both sides (StreamDenormalize.java:66-69)
- no retraction of a left's old FK association when its FK changes — the
  reference has the same gap (old index entries are never tombstoned; no
  null-value handling at JoinTransformer.java:138). Production path: Delta
  MERGE with delete.

Scale notes (100 TB):
- state is partitioned by pmod(xxhash64(fk), n_buckets): a micro-batch
  rewrites ONLY the buckets it touches (dynamic partition overwrite), and
  every read is partition-pruned to the touched buckets — merge cost is
  O(touched state), not O(total state).
- the LEFT state is bucketed by FK (not by left key) because both the join
  and the right-update fan-out are FK-addressed — the same reason the
  reference prefix-scans on the FK digest (schema/JoinKey.java:94-99).
- per-FK skew concentrates a hot FK's lefts in one bucket; raise n_buckets
  or use the continuous mode's AQE-planned join for emit.
- payloads are opaque JSON strings (the reference's serde-opaque values);
  the typed projection happens at the edges.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_denormalization_spark.operators.latest import latest_per_key

_STATE_SCHEMA = "key string, fk string, payload string, version long, bucket int"


class IncrementalDenormalize:
    """FK denormalization with durable micro-batch state.

    Use standalone (call ``process_batch`` per batch) or from Structured
    Streaming via ``foreachBatch``.
    """

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        how: str = "inner",
        n_buckets: int = 32,
    ) -> None:
        if how not in ("inner", "left_outer", "right_outer", "full_outer"):
            raise ValueError(f"unknown join flavor {how!r}")
        self.spark = spark
        self.state_dir = state_dir
        self.how = how
        self.n_buckets = n_buckets
        self._left_dir = os.path.join(state_dir, "left")
        self._right_dir = os.path.join(state_dir, "right")

    # -- state helpers -------------------------------------------------------

    def _bucket(self, col):
        return F.pmod(F.xxhash64(col), F.lit(self.n_buckets)).cast("int")

    def _read_state(self, path: str, buckets: list[int] | None) -> DataFrame:
        if not os.path.exists(path):
            return self.spark.createDataFrame([], _STATE_SCHEMA)
        df = self.spark.read.schema(_STATE_SCHEMA).parquet(path)
        if buckets is not None:
            df = df.filter(F.col("bucket").isin(buckets))  # partition-pruned
        return df

    def _merge_state(self, path: str, updates: DataFrame) -> None:
        """Copy-on-write upsert: rewrite only the buckets the batch touches."""
        updates = updates.withColumn("bucket", self._bucket(F.col("fk"))).cache()
        touched = [r["bucket"] for r in updates.select("bucket").distinct().collect()]
        if not touched:
            return
        existing = self._read_state(path, touched)
        merged = latest_per_key(
            existing.unionByName(updates), ["key", "fk"], ["version"]
        )
        (
            merged.repartition(len(touched), F.col("bucket"))
            .write.partitionBy("bucket")
            .option("partitionOverwriteMode", "dynamic")
            .mode("overwrite")
            .parquet(path)
        )

    # -- one micro-batch -----------------------------------------------------

    def process_batch(
        self, left_updates: DataFrame | None, right_updates: DataFrame | None
    ) -> DataFrame:
        """Apply one micro-batch of updates (either side may be None/empty);
        return the changelog to emit: (key, fk, left_value, right_value).

        Inputs must have columns (key, fk, payload, version); for the right
        side fk == key (RightKeyMapper.java:16-18). Use
        ``streaming.upsert_join.tag_side`` to project typed frames.
        """
        spark = self.spark
        empty = spark.createDataFrame([], "key string, fk string, payload string, version long")
        lu = (left_updates or empty).select("key", "fk", "payload", "version").cache()
        ru = (right_updates or empty).select("key", "fk", "payload", "version").cache()

        self._merge_state(self._left_dir, lu)
        self._merge_state(self._right_dir, ru)

        # affected FK set drives every read below (partition-pruned)
        left_fks = lu.select(F.col("fk")).distinct()
        right_fks = ru.select(F.col("fk")).distinct()
        affected = left_fks.unionByName(right_fks).distinct().cache()
        fk_buckets = [
            r["b"] for r in affected.select(self._bucket(F.col("fk")).alias("b")).distinct().collect()
        ]

        lstate = self._read_state(self._left_dir, fk_buckets)
        rstate = self._read_state(self._right_dir, fk_buckets)

        # lefts to emit: updated lefts + full fan-out for FKs whose right changed
        updated_left_keys = lu.select("key", "fk").distinct()
        emit_updated = lstate.join(updated_left_keys, ["key", "fk"], "left_semi")
        emit_fanout = lstate.join(right_fks, ["fk"], "left_semi")
        lefts = emit_updated.unionByName(emit_fanout).dropDuplicates(["key", "fk"])

        rights = rstate.join(affected, ["fk"], "left_semi").select(
            F.col("fk").alias("r_fk"), F.col("payload").alias("right_value")
        )

        jhow = {
            "inner": "inner",
            "left_outer": "left_outer",
            "right_outer": "left_outer",  # right-outer extras added below
            "full_outer": "left_outer",
        }[self.how]
        joined = lefts.join(rights, lefts["fk"] == rights["r_fk"], jhow).select(
            F.col("key"),
            F.col("fk"),
            F.col("payload").alias("left_value"),
            F.col("right_value"),
        )
        out = joined
        if self.how in ("right_outer", "full_outer"):
            # rights (updated this batch) with zero lefts -> (null, right)
            # (JoinTransformer.java:192-196)
            updated_rights = rstate.join(right_fks, ["fk"], "left_semi")
            no_lefts = updated_rights.join(lstate.select("fk").distinct(), ["fk"], "left_anti")
            extras = no_lefts.select(
                F.lit(None).cast("string").alias("key"),
                F.col("fk"),
                F.lit(None).cast("string").alias("left_value"),
                F.col("payload").alias("right_value"),
            )
            if self.how == "right_outer":
                out = joined.filter(F.col("right_value").isNotNull()).unionByName(extras)
            else:
                out = joined.unionByName(extras)
        return out

    def foreach_batch(self, tag_left, tag_right, sink):
        """Adapter for ``writeStream.foreachBatch`` over a side-tagged update
        stream (UPDATE_SCHEMA): splits sides, plays the batch, hands the
        changelog to ``sink(df, epoch_id)``."""

        def fn(batch_df: DataFrame, epoch_id: int) -> None:
            lu = tag_left(batch_df)
            ru = tag_right(batch_df)
            sink(self.process_batch(lu, ru), epoch_id)

        return fn
