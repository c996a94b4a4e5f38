"""Corpus snapshot diff — dataset-versioning support.

A reproducible training-corpus build is re-run against a moving crawl;
what a data team reviews between two builds is the DIFF: which documents
appeared, vanished, or changed content. At 100 TB the diff must never
shuffle text — both sides reduce to (id, md5(text)) in their scan
stages, and the full-outer join moves 16-byte digests only.

The reference engine has no multi-snapshot concept at all (SURVEY.md
§2.3 — its state is a single continuously-updated view); this is a
north-star extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """Classify every document id across two corpus snapshots:

    - ``added``     — id only in ``new``
    - ``removed``   — id only in ``old``
    - ``changed``   — id in both, content digest differs
    - ``unchanged`` — id in both, content identical

    One row per id in either snapshot, with both digests carried (NULL
    on the missing side) so downstream tooling can drill into changed
    content without re-reading the unchanged bulk.

    Plan shape: each side is a scan-stage projection to (id, digest);
    the only exchange is the id-hash join of two digest tables. No
    window, no text movement, count aggregation is a follow-up
    ``groupBy("status")`` the caller owns.
    """
    o = old.select(
        F.col(id_col).alias("_id"),
        F.md5(F.col(text_col)).alias("old_digest"),
    )
    n = new.select(
        F.col(id_col).alias("_id"),
        F.md5(F.col(text_col)).alias("new_digest"),
    )
    status = (
        F.when(F.col("old_digest").isNull(), F.lit("added"))
        .when(F.col("new_digest").isNull(), F.lit("removed"))
        .when(F.col("old_digest") == F.col("new_digest"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return (
        o.join(n, "_id", "full_outer")
        .select(
            F.col("_id").alias(id_col),
            status.alias("status"),
            "old_digest",
            "new_digest",
        )
    )
