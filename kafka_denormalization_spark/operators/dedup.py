"""Deduplication operators.

Reference parity:
- per-batch duplicate suppression: HashSet of JoinKeys reset per stream-time
  tick (transform/JoinTransformer.java:142-145, :210-222) ->
  ``suppress_duplicates`` (dropDuplicates on the pair key).
- client-side ingest dedup: in-memory seen-sets (services/comments.py:18,
  :52-53; services/stories.py:17, :32-33) -> ``exact_dedup_by_key``.

North-star extensions (LLM-data-pipeline): content-hash exact dedup over the
``documents`` table; near-dup operators live in functions/similarity.py.

Scale notes (100 TB):
- ``exact_dedup_content`` groups on a 256-bit content hash, not the content
  itself: shuffle keys are 32 bytes regardless of document size, and the
  min() representative-pick is a partial aggregation (map-side combine).
- ``dropDuplicates`` on high-cardinality keys is itself a hash aggregation —
  same shuffle bound (distinct keys, not rows).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def suppress_duplicates(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Emit each key combination at most once (O16). The reference does this
    per stream-time batch; in batch mode the scope is the whole frame, in
    streaming use ``dropDuplicatesWithinWatermark``."""
    return df.dropDuplicates(list(keys))


def exact_dedup_by_key(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Ingest-style dedup on record keys (P4)."""
    return df.dropDuplicates(list(keys))


def near_dedup_keep_min(
    df: DataFrame,
    id_col: str,
    pairs: DataFrame,
) -> DataFrame:
    """Greedy near-dup removal: given similarity ``pairs`` (id_a < id_b),
    drop every row whose id appears as the GREATER member of a pair — the
    min-id document of each similarity clique survives.

    One anti-join; no iterative connected components (chains A~B~C with
    A!~C keep A only if B bridges them via pairs (A,B),(B,C) — B and C both
    drop; the standard greedy approximation used by large-scale text-dedup
    pipelines, cheap and deterministic).
    """
    losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(losers, [id_col], "left_anti")


def incremental_dedup(
    new_df: DataFrame,
    base_df: DataFrame,
    content_col: str,
    id_col: str,
) -> DataFrame:
    """Dedup an incoming batch against an already-ingested corpus: drop
    new rows whose content hash already exists in ``base_df``, and keep
    one representative (min ``id_col``) per duplicated content WITHIN the
    batch. The continuous-ingest analog of ``exact_dedup_content`` — every
    nightly crawl drop is deduped against the accumulated corpus without
    rereading corpus text: the base side reduces to a 32-byte digest set
    before the anti-join (at scale, a pre-computed digest table / bloom
    filter; here derived inline).
    """
    h = F.sha2(F.col(content_col).cast("string"), 256)
    within = exact_dedup_content(new_df, content_col, id_col)
    # NULL content hashes to NULL; drop those from the seen-set explicitly
    # (a NULL key never matches a left_anti probe anyway, so new NULL-text
    # rows are kept — the oracle mirrors this with NOT EXISTS + h IS NOT
    # NULL, keeping both engines symmetric if testdata ever ships NULLs).
    seen = base_df.select(h.alias("_h")).filter(F.col("_h").isNotNull()).dropDuplicates()
    return (
        within.withColumn("_h", h)
        .join(seen, ["_h"], "left_anti")
        .drop("_h")
    )


def exact_dedup_content(
    df: DataFrame,
    content_col: str,
    id_col: str,
) -> DataFrame:
    """Exact content dedup: keep the row with the smallest ``id_col`` among
    rows whose ``content_col`` hashes identically (sha2-256).

    Deterministic representative choice makes this oracle-testable; grouping
    by hash keeps shuffle rows small at scale.
    """
    h = F.sha2(F.col(content_col).cast("string"), 256)
    row = F.struct(*[F.col(c) for c in df.columns])
    return (
        df.groupBy(h.alias("_h"))
        .agg(F.min_by(row, F.col(id_col)).alias("_row"))
        .select("_row.*")
    )
