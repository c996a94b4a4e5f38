"""Continuous-ingest shard layout — the streaming face of
operators/sharding.py ``shard_plan``: docs arriving in micro-batches are
assigned their training shard and a within-shard position as they land,
so a continuously-built corpus keeps the same consumable layout a batch
build ships.

Shard ASSIGNMENT is stateless and identical to the batch twin (md5 draw
modulo ``n_shards`` — a pure function of (salt, id), so a doc lands in
the same shard no matter which batch delivers it). Within-shard POSITION
cannot be a pure function under continuous ingest — it is an append
offset, exactly like a Kafka partition offset: each batch's docs take
the next contiguous positions of their shard, ordered within the batch
by the same (draw, id) key the batch twin uses. Given the same batch
sequence the layout is deterministic; the batch twin remains the
canonical full-shuffle layout for from-scratch builds (documented
deviation, same spirit as the dedup twins' arrival-order keeper rule).

Durable state is the per-shard position COUNTERS as append-only parquet
``(shard_id, n)`` rows — one row per (batch, shard), summed on read.
The state is tiny (shards × batches rows), needs no partition pruning,
and ``compact()`` folds history into one row per shard.

Exactly-once note: unlike IngestDedup's digest SET, counter state is
NOT replay-idempotent — a re-run epoch would re-append its counts and
shift every later position. Wrap the sink with streaming/sinks.py
``idempotent_foreach_batch`` (epoch markers) like every other
foreachBatch pipeline in this repo; its skip also suppresses the state
append since the whole batch callback is skipped.

Reference parity: the reference has no sharded output at all (its sink
is a Kafka topic, dsl/StreamDenormalize.java:60); this is a north-star
extension pairing the batch ``shard_plan`` with a continuous twin.
"""

from __future__ import annotations

import os

from pyspark.errors.exceptions.captured import AnalysisException
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_denormalization_spark.operators.sharding import shard_draw

_COUNTER_SCHEMA = "shard_id long, n long"


class IngestShard:
    """Cross-batch shard layout with durable per-shard position counters.

    ``process_batch(batch_df)`` returns the batch rows with
    ``(shard_id, pos)`` appended and advances the counters.
    """

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        id_col: str,
        n_shards: int,
        salt: str = "shard",
    ) -> None:
        self.spark = spark
        self.state_dir = os.path.join(state_dir, "shard_counters")
        self.id_col = id_col
        self.n_shards = n_shards
        self.salt = salt

    def _bases(self) -> DataFrame:
        """Current next-position per shard: sum of all appended counter
        rows. Missing path (first batch) -> empty frame."""
        try:
            df = self.spark.read.schema(_COUNTER_SCHEMA).parquet(self.state_dir)
        except AnalysisException:
            return self.spark.createDataFrame([], _COUNTER_SCHEMA)
        return df.groupBy("shard_id").agg(F.sum("n").alias("n"))

    def process_batch(self, batch_df: DataFrame, epoch_id: int = 0) -> DataFrame:
        """One micro-batch: assign (shard_id, pos) and advance counters.

        The output frame is pinned with an eager localCheckpoint BEFORE
        the counter append (the ingest_dedup convention) — a lazily
        recomputed plan would re-read counters that already include this
        batch and double-shift its own positions.
        """
        draw = shard_draw(F.col(self.id_col), self.salt)
        shard = (
            F.conv(F.substring(draw, 1, 8), 16, 10).cast("long")
            % F.lit(self.n_shards)
        ).cast("long")
        w = Window.partitionBy("shard_id").orderBy("_draw", self.id_col)
        plan = (
            batch_df.withColumn("_draw", draw)
            .withColumn("shard_id", shard)
            .withColumn("_bpos", (F.row_number().over(w) - F.lit(1)).cast("long"))
        )
        out = (
            plan.join(
                F.broadcast(self._bases().withColumnRenamed("n", "_base")),
                "shard_id",
                "left",
            )
            .withColumn(
                "pos", F.coalesce(F.col("_base"), F.lit(0)) + F.col("_bpos")
            )
            .drop("_draw", "_bpos", "_base")
            .localCheckpoint(eager=True)
        )
        (
            out.groupBy("shard_id")
            .agg(F.count(F.lit(1)).alias("n"))
            .write.mode("append")
            .parquet(self.state_dir)
        )
        return out

    def foreach_batch(self, sink):
        """Adapter for ``writeStream.foreachBatch``: lay out each batch
        and hand the positioned rows to ``sink(df, epoch_id)``."""

        def fn(batch_df: DataFrame, epoch_id: int) -> None:
            sink(self.process_batch(batch_df, epoch_id), epoch_id)

        return fn

    def compact(self) -> int:
        """Fold counter history into one row per shard (read-sum-rewrite;
        call between batches). Returns the rows after compaction."""
        folded = self._bases().localCheckpoint(eager=True)
        folded.write.mode("overwrite").parquet(self.state_dir)
        return folded.count()
