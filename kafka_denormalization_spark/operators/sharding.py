"""Deterministic training-shard layout: the global shuffle + sharding step
that turns a curated corpus into the fixed, reproducible byte layout a
training run consumes (WebDataset/TFRecord-style shard files).

Training jobs need (a) a uniform random-looking interleave of sources so a
sequential reader sees a stationary mixture, (b) bit-reproducibility — the
same corpus must yield the same shards on every rerun, regardless of
cluster size or partitioning, and (c) balanced shard sizes so data-loader
workers finish together. A Spark ``orderBy(rand())`` gives none of these;
the standard fix is a *hash shuffle*: every row's shard and its position
inside the shard derive from a stable content/id hash, never from
execution order.

Design (cf. the repo's md5-draw convention, operators/sampling.py): the
draw is ``md5(salt | id)``; the first 8 hex chars parsed as an integer
modulo ``n_shards`` picks the shard (uniform, skew-free), and the full
digest orders rows WITHIN the shard (tie-broken by id for byte-identical
reruns even under hash collisions). Changing ``salt`` re-deals the entire
layout — a fresh epoch-level shuffle with zero state.

100 TB shape: one hash per row, ONE exchange (hash-partition by shard id
— the same exchange the shard write needs anyway, so the plan carries no
extra shuffle), and the per-shard ``row_number`` window is bounded by
|corpus| / n_shards rows; pick ``n_shards`` so a shard fits an executor
(real corpus builds use 10k-1M shards, exactly this regime). No global
sort, no driver state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def shard_draw(id_col: Column, salt: str) -> Column:
    """The stable per-row draw: md5 over (salt | id)."""
    return F.md5(F.concat_ws("|", F.lit(salt), id_col.cast("string")))


def shard_plan(
    docs: DataFrame,
    id_col: str,
    n_shards: int,
    salt: str = "shard",
) -> DataFrame:
    """Assign every row a ``shard_id`` in ``[0, n_shards)`` and a dense
    0-based ``pos`` inside its shard (the read order a data loader sees).

    Both are pure functions of (salt, id): rerunning on any partitioning,
    cluster size, or input order yields the identical layout.

    Output: all input columns + (shard_id, pos).
    """
    draw = shard_draw(F.col(id_col), salt)
    shard = (
        F.conv(F.substring(draw, 1, 8), 16, 10).cast("long")
        % F.lit(n_shards)
    ).cast("long")
    w = Window.partitionBy("shard_id").orderBy("_draw", id_col)
    return (
        docs.withColumn("_draw", draw)
        .withColumn("shard_id", shard)
        .withColumn("pos", (F.row_number().over(w) - F.lit(1)).cast("long"))
        .drop("_draw")
    )


def shard_stats(
    plan: DataFrame,
    token_count_col: Column,
    char_col: str = "text",
) -> DataFrame:
    """Per-shard balance report over a ``shard_plan`` output: row, token,
    and a size-proxy char count per shard — the numbers that tell you
    whether loader workers will finish together. One aggregation pass.

    ``char_col`` names the text column used for the char-count proxy;
    pass whatever text/payload column the plan carries (plans that drop
    the raw text, e.g. ``corpus_to_shards``, can point this at any
    retained string column).

    Output: (shard_id, n_docs, n_tokens, n_chars).
    """
    return plan.groupBy("shard_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_count_col).cast("long").alias("n_tokens"),
        F.sum(F.length(char_col)).cast("long").alias("n_chars"),
    )


def write_shards(
    plan: DataFrame,
    path: str,
) -> None:
    """Materialize a ``shard_plan`` as one directory per shard
    (``shard_id=K/``), rows stored in shard-read order.

    ``repartition(shard_id)`` routes each shard to one task and
    ``sortWithinPartitions`` lays rows out in ``pos`` order, so each
    shard directory's parquet row order IS the training read order —
    the loader never re-sorts. The repartition satisfies the
    ``partitionBy`` clustering requirement, so this is the plan's only
    exchange.
    """
    (
        plan.repartition("shard_id")
        .sortWithinPartitions("shard_id", "pos")
        .write.mode("overwrite")
        .partitionBy("shard_id")
        .parquet(path)
    )
