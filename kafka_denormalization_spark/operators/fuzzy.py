"""Fuzzy (edit-distance) join via deletion-neighborhood blocking.

Entity-resolution workhorse: find (left, right) pairs whose string keys
are within edit distance 1, WITHOUT the all-pairs scan and WITHOUT
prefix blocking (which collapses to all-pairs when the corpus shares a
common prefix — e.g. every TPC-H name starts with ``Customer#``).

The SymSpell observation: if ``levenshtein(s, t) <= 1`` then s and t
share at least one member of their 1-deletion neighborhoods (s itself,
plus s with one char removed). Substitution at i: deleting i from both
yields the same string; insertion: deleting the inserted char from the
longer yields the shorter, which is its own neighborhood member. So
candidates come from ONE equi-join on variant keys — |s|+1 variants per
row, shuffled as (variant, id) pairs — then exact ``levenshtein``
verifies candidates only. Generalizes to distance k with k-deletion
combinations (k+1 pigeonhole); k=1 implemented here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _deletion_variants(df: DataFrame, id_col: str, s_col: str) -> DataFrame:
    """(_vid, _vs, _v) rows: the string itself (i=0) and every
    one-char-deleted variant (i=1..len)."""
    s = F.col(s_col)
    exploded = df.select(
        F.col(id_col).alias("_vid"),
        s.alias("_vs"),
        F.explode(F.sequence(F.lit(0), F.length(s))).alias("_i"),
    )
    vs = F.col("_vs")
    i = F.col("_i")
    deleted = F.concat(
        vs.substr(F.lit(1), i - 1), vs.substr(i + 1, F.length(vs))
    )
    return exploded.select(
        "_vid", "_vs", F.when(i == 0, vs).otherwise(deleted).alias("_v")
    )


def fuzzy_self_join_dist1(df: DataFrame, id_col: str, s_col: str) -> DataFrame:
    """All (id_a, id_b, dist) pairs with id_a < id_b and
    ``levenshtein`` distance <= 1 between their ``s_col`` values."""
    va = _deletion_variants(df, id_col, s_col).alias("va")
    vb = _deletion_variants(df, id_col, s_col).alias("vb")
    cands = (
        va.join(
            vb,
            (F.col("va._v") == F.col("vb._v"))
            & (F.col("va._vid") < F.col("vb._vid")),
        )
        .select(
            F.col("va._vid").alias("id_a"),
            F.col("vb._vid").alias("id_b"),
            F.col("va._vs").alias("_sa"),
            F.col("vb._vs").alias("_sb"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        cands.withColumn("dist", F.levenshtein(F.col("_sa"), F.col("_sb")))
        .filter(F.col("dist") <= 1)
        .select("id_a", "id_b", F.col("dist").cast("long").alias("dist"))
    )
