"""Skew-aware join: explicit key salting.

AQE's skew-join splitting (enabled in engine.get_spark) handles skewed
sort-merge joins automatically at runtime; explicit salting remains useful
when (a) AQE is off, (b) the skew is in an aggregation, or (c) the skewed
side feeds a non-SMJ operator. The reference has the same hot-FK problem
(all comments of one story hit one partition, JoinKeyPartitioner.java:20-22)
and no answer to it.

Mechanism: replicate the *small* side S times (S = salt factor) with salt
ids 0..S-1; give each big-side row a deterministic pseudo-random salt in
[0, S); join on (key, salt). The hot key's rows spread across S partitions
at the cost of S copies of the small side's matching rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side's hot keys spread over ``salt`` buckets.

    The salt is derived from xxhash64 of the big side's whole row via a
    monotonically increasing id — deterministic per task layout but
    effectively uniform; the small side is exploded ``salt`` times.
    Output columns: big.* + small.* (minus the duplicate key).

    Only the big-side-preserving flavors are valid: the small side is
    replicated ``salt`` times, so right_outer/full_outer would emit each
    unmatched small-side row once per replica. Put the preserved side on
    ``big`` (it carries the skew anyway) or dedup downstream.
    """
    if salt < 1:
        raise ValueError("salt must be >= 1")
    if how not in ("inner", "left_outer"):
        raise ValueError(
            f"salted_join supports how='inner'|'left_outer', got {how!r}: "
            "small-side-preserving flavors would duplicate unmatched small rows "
            "(one per salt replica)"
        )
    b = big.withColumn(
        "_salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt))
    )
    s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    ).withColumn("_salt", F.col("_salt").cast(b.schema["_salt"].dataType))
    joined = b.join(
        s,
        (b[big_key] == s[small_key]) & (b["_salt"] == s["_salt"]),
        how,
    )
    return joined.drop(s[small_key]).drop(b["_salt"]).drop(s["_salt"])
