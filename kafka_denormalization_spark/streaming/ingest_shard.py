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


_MANIFEST_SCHEMA = (
    "shard_id long, n_docs long, total_bytes long, pos_max long, "
    "checksum long"
)


class IngestManifest:
    """Continuously-maintained shard integrity manifest — the streaming
    face of operators/sharding.py ``shard_manifest``: per batch, the
    newly laid-out rows fold into durable per-shard totals (docs, bytes,
    max position, and the order-independent 60-bit XOR checksum over
    md5(id @ pos)). XOR's associativity is what makes the incremental
    fold exact: the checksum of the union IS the XOR of the per-batch
    checksums, so ``manifest()`` over any batch sequence equals the
    batch twin computed over the union of shipped rows (pytest-pinned).

    State is append-only parquet, one row per (batch, shard) — tiny,
    summed/XOR-folded on read; ``compact()`` folds history to one row
    per shard. Same exactly-once caveat as IngestShard's counters:
    wrap the sink in ``idempotent_foreach_batch`` so a replayed epoch
    cannot double-fold.
    """

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        id_col: str,
        bytes_col: str,
        shard_col: str = "shard_id",
        pos_col: str = "pos",
    ) -> None:
        self.spark = spark
        self.state_dir = os.path.join(state_dir, "shard_manifest")
        self.id_col = id_col
        self.bytes_col = bytes_col
        self.shard_col = shard_col
        self.pos_col = pos_col

    def _state(self) -> DataFrame:
        try:
            return self.spark.read.schema(_MANIFEST_SCHEMA).parquet(
                self.state_dir
            )
        except AnalysisException:
            return self.spark.createDataFrame([], _MANIFEST_SCHEMA)

    def update(self, laid_out: DataFrame) -> None:
        """Fold one batch's laid-out rows (the output of
        ``IngestShard.process_batch``) into the manifest state."""
        row_h = F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "@",
                        F.col(self.id_col).cast("string"),
                        F.col(self.pos_col).cast("string"),
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        (
            laid_out.select(
                F.col(self.shard_col).alias("shard_id"),
                F.col(self.pos_col).alias("_pos"),
                F.col(self.bytes_col).cast("long").alias("_b"),
                row_h.alias("_h"),
            )
            .groupBy("shard_id")
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("_b").alias("total_bytes"),
                F.max("_pos").alias("pos_max"),
                F.expr("bit_xor(_h)").alias("checksum"),
            )
            .write.mode("append")
            .parquet(self.state_dir)
        )

    def manifest(self) -> DataFrame:
        """The current manifest: folded state, with the contiguity flag
        derived the same way as the batch twin (pos_min is 0 by the
        append-offset construction, so contiguity is
        pos_max == n_docs - 1)."""
        return (
            self._state()
            .groupBy("shard_id")
            .agg(
                F.sum("n_docs").alias("n_docs"),
                F.sum("total_bytes").alias("total_bytes"),
                F.max("pos_max").alias("pos_max"),
                F.expr("bit_xor(checksum)").alias("checksum"),
            )
            .select(
                "shard_id",
                "n_docs",
                "total_bytes",
                F.lit(0).cast("long").alias("pos_min"),
                "pos_max",
                (F.col("pos_max") == F.col("n_docs") - 1).alias("contiguous"),
                "checksum",
            )
        )

    def compact(self) -> int:
        """Fold manifest history into one row per shard."""
        folded = (
            self._state()
            .groupBy("shard_id")
            .agg(
                F.sum("n_docs").alias("n_docs"),
                F.sum("total_bytes").alias("total_bytes"),
                F.max("pos_max").alias("pos_max"),
                F.expr("bit_xor(checksum)").alias("checksum"),
            )
            .localCheckpoint(eager=True)
        )
        folded.write.mode("overwrite").parquet(self.state_dir)
        return folded.count()


class IngestShardWriter:
    """Streaming corpus MATERIALIZATION: layout + data files + manifest
    in one foreachBatch — the continuous twin of the batch chain
    ``shard_plan_bytes -> sources/corpus_io.write_corpus_shards ->
    shard_manifest``. Per batch: ``IngestShard.process_batch`` assigns
    (shard_id, pos); the positioned rows APPEND into the same Hive-style
    ``shard_id=N`` directories the batch writer produces (multi-file per
    shard is inherent under continuous ingest — each batch adds at most
    one file per touched shard, rows inside a file ordered by pos); and
    ``IngestManifest`` folds the same rows into the durable manifest.

    ``verify()`` re-reads the written directories and derives the batch
    ``shard_manifest`` from what is ON DISK; equality with the
    maintained manifest proves the files hold exactly every shipped row
    at its assigned position — the pre-training trust check after any
    ingest outage, retry storm, or manual surgery on the directory.

    Scale (100 TB continuous build): per batch the only exchange is the
    shard-id hash repartition of THAT batch's rows; state stays
    counter/manifest-sized (shards x batches before ``compact()``).
    Readers see a consistent prefix at every batch boundary. Same
    exactly-once caveat as the underlying state classes: wrap with
    ``idempotent_foreach_batch`` so a replayed epoch cannot re-append
    files or double-fold state.
    """

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        out_dir: str,
        id_col: str,
        bytes_col: str,
        n_shards: int,
        fmt: str = "jsonl",
        salt: str = "shard",
    ) -> None:
        from kafka_denormalization_spark.sources.corpus_io import _FORMATS

        if fmt not in _FORMATS:
            raise ValueError(
                f"fmt must be one of {sorted(_FORMATS)}, got {fmt!r}"
            )
        self.spark = spark
        self.out_dir = out_dir
        self.id_col = id_col
        self.bytes_col = bytes_col
        self.n_shards = n_shards
        self.fmt = fmt
        self.layout = IngestShard(spark, state_dir, id_col, n_shards, salt)
        self.manifest = IngestManifest(spark, state_dir, id_col, bytes_col)

    def process_batch(self, batch_df: DataFrame, epoch_id: int = 0) -> DataFrame:
        from kafka_denormalization_spark.sources.corpus_io import _FORMATS

        out = self.layout.process_batch(batch_df, epoch_id)
        (
            out.repartition(int(self.n_shards), F.col("shard_id"))
            .sortWithinPartitions("shard_id", "pos")
            .write.partitionBy("shard_id")
            .mode("append")
            .format(_FORMATS[self.fmt])
            .save(self.out_dir)
        )
        self.manifest.update(out)
        return out

    def foreach_batch(self):
        """Adapter for ``writeStream.foreachBatch``."""

        def fn(batch_df: DataFrame, epoch_id: int) -> None:
            self.process_batch(batch_df, epoch_id)

        return fn

    def verify(self, schema: str | None = None) -> DataFrame:
        """Manifest of what is ON DISK vs the maintained manifest —
        returns the mismatch table (empty = trustworthy shard set).
        ``schema`` is the data schema for JSONL read-back (the
        ``read_corpus_shards`` contract)."""
        from kafka_denormalization_spark.operators.sharding import (
            shard_manifest,
        )
        from kafka_denormalization_spark.sources.corpus_io import (
            manifest_mismatches,
            read_corpus_shards,
        )

        back = read_corpus_shards(
            self.spark, self.out_dir, schema=schema, fmt=self.fmt
        )
        got = shard_manifest(back, self.id_col, self.bytes_col)
        return manifest_mismatches(self.manifest.manifest(), got)
