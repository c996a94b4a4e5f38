"""Continuous-ingest exact dedup — the streaming face of
operators/dedup.py ``incremental_dedup`` (same semantics per batch:
within-batch min-id keep, then anti-join against everything already
seen), driven by ``foreachBatch`` with durable digest state.

State is the SEEN CONTENT-DIGEST SET as hash-bucketed parquet (the
streaming/incremental.py convention): 32-byte sha-256 digests partitioned
by ``pmod(xxhash64(digest), n_buckets)``, so each micro-batch reads only
the buckets its own digests hash into (broadcast semi-join on the
partition column → DynamicPartitionPruning skips untouched directories)
and appends only its fresh digests. The corpus text itself never enters
state — at 100 TB the digest table is the persisted index a nightly
pipeline appends to (cf. SCALE_NOTES on incremental_dedup).

Exactly-once note: a replayed epoch re-appends digests it already wrote.
That is SEMANTICALLY idempotent here — the anti-join treats state as a
set, so duplicate digest rows can never flip a keep/drop decision — but
the replayed batch would re-EMIT its survivors, so the downstream sink
still wants the epoch-marker wrapper (streaming/sinks.py
``idempotent_foreach_batch``) like every other foreachBatch pipeline in
this repo.

Reference parity: the reference has no dedup at all on its ingest path
(its HTTP pollers re-produce whatever the API returns,
services/stories.py:25-44); client-side dedup (P4, SURVEY §2) is the
batch twin, this is its continuous counterpart.
"""

from __future__ import annotations

import os

from pyspark.errors.exceptions.captured import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
_STATE_SCHEMA = "key string, bucket int"


class IngestDedup:
    """Cross-batch exact content dedup with durable digest state.

    ``process_batch(batch_df)`` returns the batch rows that survive
    (first occurrence wins, within the batch by min ``id_col``, across
    batches by arrival order) and appends their digests to state.
    """

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        id_col: str,
        text_col: str,
        n_buckets: int = 32,
    ) -> None:
        self.spark = spark
        self.state_dir = os.path.join(state_dir, "seen_digests")
        self.id_col = id_col
        self.text_col = text_col
        self.n_buckets = n_buckets

    def _seen(self, prune: DataFrame) -> DataFrame:
        """Read the digest state pruned to the batch's buckets. Missing
        path (first batch) -> empty frame."""
        try:
            df = self.spark.read.schema(_STATE_SCHEMA).parquet(self.state_dir)
        except AnalysisException:
            return self.spark.createDataFrame([], _STATE_SCHEMA)
        df = df.filter(F.col("key").isNotNull())
        # vacuously-true predicate so DynamicPartitionPruning fires on the
        # partition column (same trick as incremental.py._read)
        return df.join(
            F.broadcast(prune.filter(F.col("bucket") >= 0)),
            on="bucket",
            how="left_semi",
        )

    def process_batch(self, batch_df: DataFrame, epoch_id: int = 0) -> DataFrame:
        """One micro-batch: returns survivors (original columns), appends
        their digests. The survivor frame is MATERIALIZED before the
        state append so the anti-join can never observe the batch's own
        digests."""
        digested = batch_df.withColumn(
            "_h", F.sha2(F.col(self.text_col), 256)
        ).withColumn(
            "bucket", F.pmod(F.xxhash64(F.col("_h")), F.lit(self.n_buckets)).cast("int")
        )
        # within-batch: min id per digest (operators/dedup.incremental_dedup
        # keeper rule)
        w_min = digested.groupBy("_h").agg(
            F.min(F.col(self.id_col)).alias("_keep_id")
        )
        batch_min = digested.join(w_min, "_h").filter(
            F.col(self.id_col) == F.col("_keep_id")
        ).drop("_keep_id")
        seen = self._seen(batch_min.select("bucket").distinct())
        # localCheckpoint (eager) PINS the survivor rows before the state
        # append: a lazily-recomputed anti-join would re-read state that
        # now contains this batch's own digests and return nothing
        # (plain persist would need a caller-side unpersist contract;
        # checkpointed lineage has no such footgun)
        fresh = batch_min.join(
            seen.withColumnRenamed("key", "_h"),
            ["_h"],
            "left_anti",
        ).localCheckpoint(eager=True)
        (
            fresh.select(F.col("_h").alias("key"), "bucket")
            .write.mode("append")
            .partitionBy("bucket")
            .parquet(self.state_dir)
        )
        return fresh.drop("_h", "bucket")

    def foreach_batch(self, sink):
        """Adapter for ``writeStream.foreachBatch``: dedup each batch and
        hand survivors to ``sink(df, epoch_id)``."""

        def fn(batch_df: DataFrame, epoch_id: int) -> None:
            sink(self.process_batch(batch_df, epoch_id), epoch_id)

        return fn
