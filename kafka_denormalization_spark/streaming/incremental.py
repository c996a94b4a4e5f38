"""Incremental (micro-batch) changelog denormalization — SURVEY §4.3.2
option (a), the primary verified streaming mode.

Reference parity: identical observable semantics to the continuous mode in
``upsert_join.py`` (and thus to transform/JoinTransformer.java:138-200), but
state lives in hash-bucketed parquet and each call to ``process_batch``
plays one micro-batch:

- left update -> join against latest right, emit (JoinTransformer.java:152-158)
- right update -> re-emit ALL lefts for that FK (JoinTransformer.java:168-186)
- latest-per-key upsert state on both sides (StreamDenormalize.java:66-69)
- left FK-change retraction (``retract_fk_changes``, default on): a left
  update whose FK differs from the stored association deletes the stale
  (key, old_fk) index row and emits a retraction record for it. The
  reference has the exact same staleness gap and never fixes it (old index
  entries are never tombstoned; no null-value check at
  JoinTransformer.java:138) — pass ``retract_fk_changes=False`` for
  bug-parity.

Scale notes (100 TB):
- state is partitioned by pmod(xxhash64(fk), n_buckets): a micro-batch
  rewrites ONLY the buckets it touches (dynamic partition overwrite), and
  every read is partition-pruned to the touched buckets — merge cost is
  O(touched state), not O(total state).
- NO driver-side collect anywhere: touched-bucket pruning is a broadcast
  semi-join on the partition column (Catalyst's dynamic partition pruning
  turns it into directory-level pruning); bucket targets for the writer
  come from the data itself via dynamic partition overwrite.
- every bucket a batch touches gets a sentinel row (NULL key) so dynamic
  overwrite rewrites it even when deletions empty it — otherwise stale
  rows would survive on disk in deletion-only buckets.
- the LEFT state is bucketed by FK (not by left key) because both the join
  and the right-update fan-out are FK-addressed — the same reason the
  reference prefix-scans on the FK digest (schema/JoinKey.java:94-99).
  FK-change detection therefore needs a second, KEY-bucketed index
  (key -> latest fk/version), read pruned to the batch's key buckets.
- per-FK skew concentrates a hot FK's lefts in one bucket; raise n_buckets
  or use the continuous mode's AQE-planned join for emit.
- payloads are opaque JSON strings (the reference's serde-opaque values);
  the typed projection happens at the edges.
- state paths go through Spark's Hadoop filesystem layer (no ``os.path``),
  so ``state_dir`` may live on HDFS/S3, not just the driver's local disk.
"""

from __future__ import annotations

import os

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_denormalization_spark.operators.latest import latest_per_key

_STATE_SCHEMA = "key string, fk string, payload string, version long, bucket int"
_KEY_INDEX_SCHEMA = "key string, fk string, version long, kbucket int"


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
        retract_fk_changes: bool = True,
        tombstones: bool | None = None,
    ) -> None:
        """``tombstones``: treat NULL payloads as deletes (continuous-mode
        parity — index removal + retraction; a left tombstone's FK is
        resolved through the key index, so only the record KEY is needed,
        matching Kafka's key-only delete convention). Defaults to
        ``retract_fk_changes`` (the key index is its backbone); the
        bug-parity mode (both False) ignores deletes like the reference."""
        if how not in ("inner", "left_outer", "right_outer", "full_outer"):
            raise ValueError(f"unknown join flavor {how!r}")
        if tombstones is None:
            tombstones = retract_fk_changes
        if tombstones and not retract_fk_changes:
            raise ValueError(
                "tombstones=True requires retract_fk_changes=True (left "
                "deletes are resolved through the key index)"
            )
        self.spark = spark
        self.state_dir = state_dir
        self.how = how
        self.n_buckets = n_buckets
        self.retract_fk_changes = retract_fk_changes
        self.tombstones = tombstones
        self._left_dir = os.path.join(state_dir, "left")
        self._right_dir = os.path.join(state_dir, "right")
        self._key_index_dir = os.path.join(state_dir, "key_index")

    # -- state helpers -------------------------------------------------------

    def _bucket(self, col):
        return F.pmod(F.xxhash64(col), F.lit(self.n_buckets)).cast("int")

    def _read(self, path: str, schema: str, prune: DataFrame | None, col: str) -> DataFrame:
        """Read a bucketed state table, partition-pruned to the buckets in
        ``prune`` (a 1-column DataFrame named ``col``). Pruning is a
        broadcast semi-join on the partition column — dynamic partition
        pruning skips the untouched directories at runtime; no driver
        collect. Missing path (first batch) -> empty frame, whatever the
        filesystem (probed by the read itself, not ``os.path``)."""
        try:
            df = self.spark.read.schema(schema).parquet(path)
            # force the scan to notice nonexistent paths eagerly
            if not df.schema.fields:
                return self.spark.createDataFrame([], schema)
        except AnalysisException:
            return self.spark.createDataFrame([], schema)
        df = df.filter(F.col("key").isNotNull())  # drop writer sentinels
        if prune is not None:
            # the >= 0 predicate is vacuously true (pmod), but Catalyst's
            # DynamicPartitionPruning rule only fires when the build side
            # carries a selective predicate — with it, the scan shows
            # `dynamicpruningexpression(bucket IN ...)` in PartitionFilters
            # and skips untouched directories; without it, the semi-join
            # filters ROWS but the scan lists every bucket
            df = df.join(
                F.broadcast(prune.filter(F.col(col) >= 0)), on=col, how="left_semi"
            )
        return df

    def _merge_state(
        self, path: str, updates: DataFrame, deletes: DataFrame | None = None
    ) -> None:
        """Copy-on-write upsert: rewrite only the buckets the batch touches.

        ``updates``: (key, fk, payload, version) rows to upsert (latest
        version per (key, fk) wins). ``deletes``: (key, fk) pairs to remove.
        Every touched bucket gets a NULL-key sentinel row so dynamic
        partition overwrite rewrites it even if it ends up empty."""
        updates = updates.withColumn("bucket", self._bucket(F.col("fk")))
        touched = updates.select("bucket").distinct()
        if deletes is not None:
            touched = (
                touched.unionByName(
                    deletes.select(self._bucket(F.col("fk")).alias("bucket")).distinct()
                ).distinct()
            )
        existing = self._read(path, _STATE_SCHEMA, touched, "bucket")
        merged = latest_per_key(
            existing.unionByName(updates), ["key", "fk"], ["version"]
        )
        if deletes is not None:
            merged = merged.join(
                F.broadcast(deletes.select("key", "fk")), ["key", "fk"], "left_anti"
            )
        sentinels = touched.select(
            F.lit(None).cast("string").alias("key"),
            F.lit(None).cast("string").alias("fk"),
            F.lit(None).cast("string").alias("payload"),
            F.lit(0).cast("long").alias("version"),
            F.col("bucket"),
        )
        (
            merged.unionByName(sentinels)
            .repartition(F.col("bucket"))
            .write.partitionBy("bucket")
            .option("partitionOverwriteMode", "dynamic")
            .mode("overwrite")
            .parquet(path)
        )

    def _merge_key_index(
        self, updates: DataFrame, deletes: DataFrame | None = None
    ) -> None:
        """Upsert (key -> latest fk/version) into the KEY-bucketed index;
        ``deletes`` is a 1-column (key) frame of tombstoned keys. Same
        sentinel discipline as ``_merge_state`` so a deletion-emptied
        kbucket still gets rewritten."""
        updates = updates.withColumn("kbucket", self._bucket(F.col("key")))
        touched = updates.select("kbucket").distinct()
        if deletes is not None:
            touched = touched.unionByName(
                deletes.select(self._bucket(F.col("key")).alias("kbucket")).distinct()
            ).distinct()
        existing = self._read(self._key_index_dir, _KEY_INDEX_SCHEMA, touched, "kbucket")
        merged = latest_per_key(
            existing.unionByName(updates), ["key"], ["version", "fk"]
        )
        if deletes is not None:
            merged = merged.join(
                F.broadcast(deletes.select("key")), ["key"], "left_anti"
            )
        sentinels = touched.select(
            F.lit(None).cast("string").alias("key"),
            F.lit(None).cast("string").alias("fk"),
            F.lit(0).cast("long").alias("version"),
            F.col("kbucket"),
        )
        (
            merged.unionByName(sentinels)
            .repartition(F.col("kbucket"))
            .write.partitionBy("kbucket")
            .option("partitionOverwriteMode", "dynamic")
            .mode("overwrite")
            .parquet(self._key_index_dir)
        )

    # -- one micro-batch -----------------------------------------------------

    def process_batch(
        self, left_updates: DataFrame | None, right_updates: DataFrame | None
    ) -> DataFrame:
        """Apply one micro-batch of updates (either side may be None/empty);
        return the changelog to emit: (key, fk, left_value, right_value).
        FK-change retractions come out as (key, old_fk, NULL, NULL).

        Inputs must have columns (key, fk, payload, version); for the right
        side fk == key (RightKeyMapper.java:16-18). Use
        ``streaming.upsert_join.tag_side`` to project typed frames.
        """
        spark = self.spark
        empty = spark.createDataFrame([], "key string, fk string, payload string, version long")
        caches: list[DataFrame] = []

        def cached(df: DataFrame) -> DataFrame:
            df = df.cache()
            caches.append(df)
            return df

        lu = cached((left_updates or empty).select("key", "fk", "payload", "version"))
        ru = cached((right_updates or empty).select("key", "fk", "payload", "version"))

        stale = None
        tomb_pairs = None
        right_tomb_fks = None
        stale_right_fks = None
        if self.retract_fk_changes:
            # per-batch winner per KEY (not per (key, fk)): an FK move is a
            # new association for the same key, and out-of-order stragglers
            # (version below the stored one) must not apply at all
            lu_latest = latest_per_key(lu, ["key"], ["version", "fk", "payload"])
            kidx = self._read(
                self._key_index_dir,
                _KEY_INDEX_SCHEMA,
                lu_latest.select(self._bucket(F.col("key")).alias("kbucket")).distinct(),
                "kbucket",
            ).select(
                "key",
                F.col("fk").alias("_old_fk"),
                F.col("version").alias("_old_ver"),
            )
            # EAGER checkpoint before any state write: this frame reads the
            # pre-merge key index, which the merge below overwrites — lazy
            # recomputation after the write would silently resolve against
            # the NEW index (no stale rows, no retractions). Truncating the
            # lineage pins the pre-merge view; the frame is batch-sized.
            resolved = lu_latest.join(kidx, on="key", how="left_outer").localCheckpoint()
            winners = resolved.filter(
                F.col("_old_ver").isNull() | (F.col("version") >= F.col("_old_ver"))
            )
            if self.tombstones:
                # NULL payload = delete (Kafka compaction convention).
                # The delete targets the INDEXED pair — a tombstone for an
                # unindexed key is a no-op (continuous-mode parity).
                lw_vals = winners.filter(F.col("payload").isNotNull())
                lw_tombs = winners.filter(F.col("payload").isNull())
                tomb_pairs = lw_tombs.filter(F.col("_old_fk").isNotNull()).select(
                    "key", F.col("_old_fk").alias("fk")
                )
            else:
                lw_vals = winners
                lw_tombs = None
            lu_apply = lw_vals.select("key", "fk", "payload", "version")
            stale = lw_vals.filter(
                F.col("_old_fk").isNotNull() & (F.col("_old_fk") != F.col("fk"))
            ).select("key", F.col("_old_fk").alias("fk"))
            if self.how in ("inner", "right_outer"):
                # Whether a stale (key, old_fk) pair was ever EMITTED depends
                # on the right side as of emission time — approximate with
                # the PRE-merge right state, captured here before any right
                # write. Consulting post-merge rstate instead would miss the
                # retraction when old_fk's right is tombstoned in this same
                # batch, and fabricate one when it first appears in this
                # batch. Checkpointed for the same pre-merge-view reason as
                # `resolved` above.
                stale_right_fks = (
                    self._read(
                        self._right_dir,
                        _STATE_SCHEMA,
                        stale.select(self._bucket(F.col("fk")).alias("bucket")).distinct(),
                        "bucket",
                    )
                    .join(stale.select("fk").distinct(), ["fk"], "left_semi")
                    .select("fk")
                    .distinct()
                    .localCheckpoint()
                )
            deletes = stale if tomb_pairs is None else stale.unionByName(tomb_pairs)
            self._merge_state(self._left_dir, lu_apply, deletes=deletes)
            self._merge_key_index(
                lu_apply.select("key", "fk", "version"),
                deletes=None if lw_tombs is None else lw_tombs.select("key"),
            )
        else:
            lu_apply = lu
            self._merge_state(self._left_dir, lu)

        if self.tombstones:
            # right side: resolve the batch's final value per key, split
            # deletes out, and remember which tombstoned rights actually
            # existed BEFORE the merge (retraction gating) — checkpointed
            # for the same pre-merge-view reason as `resolved` above
            ru_final = latest_per_key(ru, ["key"], ["version", "payload"])
            rv = ru_final.filter(F.col("payload").isNotNull()).select(
                "key", "fk", "payload", "version"
            )
            rt = ru_final.filter(F.col("payload").isNull()).select("key", "fk")
            right_tomb_fks = (
                self._read(
                    self._right_dir,
                    _STATE_SCHEMA,
                    rt.select(self._bucket(F.col("fk")).alias("bucket")).distinct(),
                    "bucket",
                )
                .join(rt, ["key", "fk"], "left_semi")
                .select("fk")
                .distinct()
                .localCheckpoint()
            )
            self._merge_state(self._right_dir, rv, deletes=rt)
        else:
            self._merge_state(self._right_dir, ru)

        # affected FK set drives every state read below (partition-pruned);
        # stale old-FKs are included so retractions can look up their rights
        left_fks = lu.select(F.col("fk")).distinct()
        right_fks = cached(ru.select(F.col("fk")).distinct())
        affected = left_fks.unionByName(right_fks)
        if stale is not None:
            affected = affected.unionByName(stale.select("fk"))
        affected = cached(affected.distinct())
        fk_buckets = affected.select(self._bucket(F.col("fk")).alias("bucket")).distinct()

        lstate = self._read(self._left_dir, _STATE_SCHEMA, fk_buckets, "bucket")
        rstate = cached(
            self._read(self._right_dir, _STATE_SCHEMA, fk_buckets, "bucket")
            .join(affected, ["fk"], "left_semi")
        )

        # lefts to emit: updated lefts + full fan-out for FKs whose right changed
        updated_left_keys = lu_apply.select("key", "fk").distinct()
        emit_updated = lstate.join(updated_left_keys, ["key", "fk"], "left_semi")
        emit_fanout = lstate.join(right_fks, ["fk"], "left_semi")
        lefts = emit_updated.unionByName(emit_fanout).dropDuplicates(["key", "fk"])

        rights = rstate.select(
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

        retract_pairs = None
        if stale is not None:
            # retract the old (key, old_fk) association. For the
            # left-preserving flavors that pair was emitted unconditionally;
            # for inner/right_outer it only ever reached the output if a
            # right existed for the old FK — don't retract what was never
            # emitted (a spurious delete could race the same-batch re-emit
            # under the new FK for consumers keyed by `key` alone). Gated on
            # the PRE-merge right state (stale_right_fks) — post-merge rstate
            # is wrong when old_fk's right was deleted or created this batch.
            if self.how in ("left_outer", "full_outer"):
                retract_pairs = stale
            else:
                retract_pairs = stale.join(stale_right_fks, ["fk"], "left_semi")
        if tomb_pairs is not None:
            # left delete: retract whenever the key was indexed, whatever
            # the right side (continuous-mode parity: upsert_join.py emits
            # deleted_lefts unconditionally)
            retract_pairs = (
                tomb_pairs
                if retract_pairs is None
                else retract_pairs.unionByName(tomb_pairs)
            )
        if right_tomb_fks is not None and self.how in ("inner", "right_outer"):
            # right delete invalidates every previously-emitted pair for
            # that FK (continuous parity: right_deleted && right_existed).
            # The left-preserving flavors re-emit (left, NULL) through the
            # fan-out path instead — no retraction rows there.
            dead_lefts = lstate.join(right_tomb_fks, ["fk"], "left_semi").select(
                "key", "fk"
            )
            retract_pairs = (
                dead_lefts
                if retract_pairs is None
                else retract_pairs.unionByName(dead_lefts)
            )
        if retract_pairs is not None:
            retractions = retract_pairs.select(
                F.col("key"),
                F.col("fk"),
                F.lit(None).cast("string").alias("left_value"),
                F.lit(None).cast("string").alias("right_value"),
            )
            out = out.unionByName(retractions)

        for df in caches:
            df.unpersist()
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
