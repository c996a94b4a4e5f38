"""SCD Type-2: turn an upsert changelog into validity intervals, and do
point-in-time (as-of) lookups against them.

The reference keeps only latest-per-key state (its KTable,
dsl/StreamDenormalize.java:66-69 — history is discarded on compaction);
SCD2 is the standard warehouse extension that KEEPS the history: every
version of a key gets ``[valid_from, valid_to)``, the live version has
``valid_to = NULL``. ``latest_per_key`` is then just "WHERE valid_to IS
NULL", and a temporal join at time T filters
``valid_from <= T < coalesce(valid_to, +inf)``.

Scale notes (100 TB):
- one window pass per key (lead over the version order) — a single
  shuffle on the key, the same partitioning a downstream temporal join
  wants; no self-join formulation (the naive "next version" self-join
  shuffles twice and blows up on hot keys).
- the point-in-time filter is a plain Catalyst predicate: it pushes into
  the parquet scan of a persisted SCD2 table, so "state of the world at T"
  reads only pages whose min/max validity straddles T.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def scd2_from_changelog(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Assign validity intervals per key from a changelog ordered by
    ``order_cols`` (first of which is the event-time/version column used
    as the interval bound; extra columns break ties deterministically).
    The latest version per key gets ``valid_to = NULL`` (still valid)."""
    first = order_cols[0]
    w = Window.partitionBy(*key_cols).orderBy(*order_cols)
    return df.withColumn(valid_from, F.col(first)).withColumn(
        valid_to, F.lead(F.col(first)).over(w)
    )


def as_of(
    scd: DataFrame,
    at: Column,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Rows valid at time ``at``: valid_from <= at < valid_to (NULL
    valid_to = open interval). A plain predicate — pushes down to the
    scan on persisted SCD2 tables."""
    return scd.filter(
        (F.col(valid_from) <= at)
        & (F.col(valid_to).isNull() | (F.col(valid_to) > at))
    )
