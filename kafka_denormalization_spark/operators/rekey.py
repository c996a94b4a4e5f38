"""Re-key / join-key projection operators.

Reference parity:
- ``.selectKey(KeyValueMapper)`` replaces the record key, forcing a downstream
  repartition (dsl/StreamDenormalize.java:45, :49, :59) — here a plain
  projection; any later join/agg inserts the exchange via Catalyst.
- ``LeftKeyMapper`` / ``RightKeyMapper`` build the composite JoinKey
  ``[digestSize][rightDigest][leftDigest|zeros]`` (transform/LeftKeyMapper.java:19-22,
  transform/RightKeyMapper.java:16-18, schema/JoinKey.java:28-43). We join on
  values so digests are unnecessary, but ``join_key_digest`` reproduces the
  digest-pair *shape* (via xxhash64) for pipelines that want compact fixed-size
  keys, e.g. as a sink key column.
- ``JoinKeyPartitioner`` routes by murmur2(rightDigest) % n
  (transform/JoinKeyPartitioner.java:20-22) — ``copartition_by_fk`` is the
  explicit-repartition equivalent; normally leave it to Catalyst.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def select_key(df: DataFrame, key: Column | str, key_name: str = "key") -> DataFrame:
    """Replace the record key (O4). Pure projection; the shuffle the
    reference forces here is inserted lazily by Catalyst when needed."""
    k = F.col(key) if isinstance(key, str) else key
    return df.select(k.alias(key_name), *[c for c in df.columns if c != key_name])


def join_key_digest(
    fk: Column | str, pk: Column | str | None = None, algo: str = "xxhash64"
) -> Column:
    """Composite join-key digest struct, shape-parity with JoinKey.java:28-43.

    ``pk is None`` marks a right-side key (left digest null — the all-zeros
    marker of schema/JoinKey.java:55). Algorithms replacing Blake2b:
    ``xxhash64`` (default: non-crypto, JVM-codegen'd, 8 bytes — the width
    the demo uses, HackerNewsPipeline.java:42) or ``md5`` (slower, but
    engine-portable: identical hex in Spark/DuckDB/Kafka consumers).
    NOT used for joining (we join on values).
    """
    fkc = F.col(fk) if isinstance(fk, str) else fk
    pkc = (F.col(pk) if isinstance(pk, str) else pk) if pk is not None else None
    if algo == "xxhash64":
        right = F.xxhash64(fkc)
        left = F.xxhash64(pkc) if pkc is not None else F.lit(None).cast("long")
    elif algo == "md5":
        right = F.md5(fkc.cast("string"))
        left = (
            F.md5(pkc.cast("string")) if pkc is not None else F.lit(None).cast("string")
        )
    else:
        raise ValueError(f"unknown digest algo {algo!r} (xxhash64 or md5)")
    return F.struct(right.alias("right_digest"), left.alias("left_digest"))


def copartition_by_fk(df: DataFrame, fk: str, num_partitions: int | None = None) -> DataFrame:
    """Explicit FK co-partitioning (O9). Only needed to pre-stage a reused
    partitioning across several joins; single joins should let Catalyst place
    the exchange."""
    if num_partitions:
        return df.repartition(num_partitions, F.col(fk))
    return df.repartition(F.col(fk))
