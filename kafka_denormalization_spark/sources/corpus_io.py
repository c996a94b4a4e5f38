"""Loader-facing corpus shard materialization: sink + read-back + verify.

The shard planners (operators/sharding.py shard_plan / shard_plan_bytes /
curriculum_shards / epoch_shards) emit a LOGICAL layout — (shard_id, pos)
per document. This module is the physical half a training pipeline needs:
write one directory per shard in a loader-native format (JSONL, the
pretraining-corpus lingua franca, or parquet), read a shard set back with
a fixed schema, and verify the written set against the plan's manifest
before any training job trusts it.

No analog in the reference (its sink is a Kafka topic —
dsl/StreamDenormalize.java:55ff); this is north-star scope: the handoff
from the Spark curation side to the data-loader side.

Scale (100 TB):
- the writer's ONLY exchange is the hash repartition onto ``shard_col``
  (all rows of one shard land in exactly one task, so each shard
  directory receives exactly one file); shard sizing upstream keeps
  tasks uniform — that is shard_plan_bytes' serpentine guarantee, not
  the writer's job;
- ``sortWithinPartitions(shard, pos)`` orders every shard file by
  position with NO global sort;
- verification re-derives ``shard_manifest`` from what was READ BACK
  and joins it to the plan's manifest: the checksum covers (id, pos),
  so partial writes, duplicated task retries, dropped rows, and
  re-ordered rewrites all surface as a mismatched row. The join is over
  two |shards|-row frames — report-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_denormalization_spark.operators.sharding import shard_manifest

_FORMATS = {"jsonl": "json", "parquet": "parquet"}


def write_corpus_shards(
    plan: DataFrame,
    out_dir: str,
    n_shards: int,
    fmt: str = "jsonl",
    shard_col: str = "shard_id",
    pos_col: str = "pos",
    max_records_per_file: int | None = None,
) -> None:
    """Materialize a shard plan: one ``shard_id=N`` directory per shard,
    rows inside each file ordered by ``pos_col``. ``fmt``: ``jsonl`` or
    ``parquet``. The partition column is encoded in the directory name
    (Hive-style) and recovered on read; all other plan columns land in
    the data files, including ``pos_col`` so read-back verification can
    re-derive the layout checksum.

    ``max_records_per_file``: size-target the output — a shard larger
    than this splits into sequential part files (the regime where one
    file per shard exceeds the loader's chunk size). The single writing
    task rolls files in write order, so name-sorted part files within a
    shard directory remain globally pos-ordered; read-back verification
    is file-layout-independent either way (the checksum covers
    (id, pos), not file boundaries)."""
    if fmt not in _FORMATS:
        raise ValueError(f"fmt must be one of {sorted(_FORMATS)}, got {fmt!r}")
    writer = (
        plan.repartition(int(n_shards), F.col(shard_col))
        .sortWithinPartitions(shard_col, pos_col)
        .write.partitionBy(shard_col)
        .mode("overwrite")
        .format(_FORMATS[fmt])
    )
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", int(max_records_per_file))
    writer.save(out_dir)


def read_corpus_shards(
    spark: SparkSession,
    out_dir: str,
    schema: str | None = None,
    fmt: str = "jsonl",
    shard_col: str = "shard_id",
) -> DataFrame:
    """Read a written shard set back. ``schema`` is the DATA schema (DDL
    string, without ``shard_col``) — pass it for JSONL so types survive
    the text roundtrip exactly (long stays long, no sampling inference
    pass over 100 TB); the Hive partition column comes back from the
    directory names and is normalized to a long."""
    if fmt not in _FORMATS:
        raise ValueError(f"fmt must be one of {sorted(_FORMATS)}, got {fmt!r}")
    reader = spark.read.format(_FORMATS[fmt])
    if schema is not None:
        # partition-dir column types are inferred independently of the
        # data schema; pin it via basePath-style recovery then cast below
        reader = reader.schema(f"{schema}, {shard_col} int")
    df = reader.load(out_dir)
    return df.withColumn(shard_col, F.col(shard_col).cast("long"))


def manifest_mismatches(
    m_plan: DataFrame, m_got: DataFrame, shard_col: str = "shard_id"
) -> DataFrame:
    """Full-outer manifest-vs-manifest diff: one row per shard where ANY
    manifest field (count, bytes, envelope, contiguity, checksum)
    diverges, including shards present on only one side (NULL opposite
    columns). Empty result = the two manifests describe the same layout.
    Both inputs must have ``shard_manifest``'s column set."""
    fields = [c for c in m_plan.columns if c != shard_col]
    p = m_plan.select(
        shard_col, *[F.col(c).alias(f"plan_{c}") for c in fields]
    )
    g = m_got.select(
        shard_col, *[F.col(c).alias(f"got_{c}") for c in fields]
    )
    joined = p.join(g, shard_col, "full_outer")
    mismatch = None
    for c in fields:
        d = ~F.col(f"plan_{c}").eqNullSafe(F.col(f"got_{c}"))
        mismatch = d if mismatch is None else (mismatch | d)
    return joined.filter(mismatch)


def verify_corpus_shards(
    written: DataFrame,
    plan: DataFrame,
    id_col: str,
    bytes_col: str,
    shard_col: str = "shard_id",
    pos_col: str = "pos",
) -> DataFrame:
    """Integrity check of a read-back shard set against its plan: derive
    ``shard_manifest`` from both sides and diff per shard. Returns the
    MISMATCH table (empty = the written set is exactly the planned
    layout): pos swaps, dropped/duplicated rows, byte drift, and missing
    shards all surface as rows."""
    m_plan = shard_manifest(plan, id_col, bytes_col, shard_col, pos_col)
    m_got = shard_manifest(written, id_col, bytes_col, shard_col, pos_col)
    return manifest_mismatches(m_plan, m_got, shard_col)
