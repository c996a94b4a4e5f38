"""Privacy auditing for training corpora: k-anonymity / l-diversity over
quasi-identifier (QI) groupings, plus suppression (north-star extension;
SURVEY §2.3 — the reference has no privacy surface; this generalizes the
PII-scrub stage from token-level redaction to record-level linkage risk).

Why this belongs in a 100-TB curation engine: PII scrubbing removes
*direct* identifiers, but a released/retained corpus can still leak
identity through combinations of innocuous attributes (the classic
Sweeney result: ZIP + birthdate + sex re-identifies most of a
population). The standard audit is k-anonymity — every QI combination
must be shared by >= k records — refined by l-diversity: within a QI
group the *sensitive* attribute must take >= l distinct values, or the
group leaks the sensitive value even at k >= l (the homogeneity attack).

Scale (100 TB): both the audit and suppression are single hash
aggregations on the QI key — partial-aggregated map-side, shuffle volume
bounded by |distinct QI combinations|, never the corpus. Suppression
re-joins the (bounded) group table back on the same key, so AQE folds it
onto the same exchange. No windows, no driver state, no skew hazard
beyond the QI-group aggregate itself (a pathological single-group corpus
degenerates to a 1-row aggregate, which is fine).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def k_anonymity_audit(
    df: DataFrame,
    qi_cols: Sequence[str],
    sensitive_col: str,
    k: int = 5,
    l: int = 2,
) -> DataFrame:
    """Per-QI-group anonymity report.

    Output: one row per distinct QI combination —
    (*qi_cols, n, l_div, at_risk) where ``n`` is the group size,
    ``l_div`` the number of distinct sensitive values in the group, and
    ``at_risk`` flags groups failing EITHER bar (n < k or l_div < l).

    ``l_div`` is an exact count-distinct inside a group-bounded
    aggregation (not a global distinct): at 100 TB the shuffle carries
    (QI, sensitive) pairs once each after map-side combine.
    """
    if k < 1 or l < 1:
        raise ValueError(f"k and l must be >= 1, got k={k}, l={l}")
    if not qi_cols:
        raise ValueError("qi_cols must be non-empty")
    return (
        df.groupBy(*qi_cols)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.countDistinct(sensitive_col).cast("long").alias("l_div"),
        )
        .withColumn(
            "at_risk", (F.col("n") < F.lit(k)) | (F.col("l_div") < F.lit(l))
        )
    )


def suppress_small_groups(
    df: DataFrame,
    qi_cols: Sequence[str],
    k: int = 5,
) -> DataFrame:
    """k-anonymity by suppression: drop every row whose QI group has
    fewer than ``k`` members (the baseline generalization-free
    enforcement — what you run before releasing a corpus slice).

    The surviving table is k-anonymous on ``qi_cols`` by construction.
    Implementation is one QI aggregation + a semi-join back on the same
    key (one exchange, reused), never a window.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if not qi_cols:
        raise ValueError("qi_cols must be non-empty")
    safe = (
        df.groupBy(*qi_cols)
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") >= F.lit(k))
        .drop("_n")
    )
    return df.join(safe, list(qi_cols), "left_semi")
