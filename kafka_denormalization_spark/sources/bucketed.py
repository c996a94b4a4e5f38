"""Bucketed-table support: co-located joins without a shuffle.

The 100 TB story for *repeated* FK joins on the same key: pay the shuffle
once at write time (`bucketBy`), then every later join/aggregation on that
key reads pre-partitioned buckets and plans NO exchange on either side.
This is the durable version of the reference's FK co-partitioning
(transform/JoinKeyPartitioner.java:20-22 routes the index topic by FK so
the join is local; a bucketed table is the same contract on disk).

Uses the session catalog (in-memory, no Hive metastore needed); bucketed
layout survives in the warehouse dir and is re-readable via
``spark.table`` in the same session catalog.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def save_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (optionally sorted) managed table. Sorting
    within buckets additionally removes the sort from later sort-merge
    joins and window functions on the same keys.

    Overwrite is crash-safe against ORPHANED locations: a session killed
    between writing the managed directory and committing/dropping the
    catalog entry leaves a warehouse dir with NO table backing it, and
    saveAsTable then fails with LOCATION_ALREADY_EXISTS even under
    mode="overwrite" (the catalog check sees no table to overwrite).
    Scoped strictly to that case — an existing CATALOG table goes
    through the normal overwrite path untouched."""
    spark = df.sparkSession
    if mode == "overwrite" and not spark.catalog.tableExists(table_name):
        import os
        import shutil
        from urllib.parse import urlparse

        wh = urlparse(
            spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
        ).path
        orphan = os.path.join(wh, table_name.lower())
        if os.path.isdir(orphan):
            shutil.rmtree(orphan)
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)


def read_bucketed(spark: SparkSession, table_name: str) -> DataFrame:
    return spark.table(table_name)
