"""k-anonymity / l-diversity audit + suppression (operators/privacy.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_denormalization_spark.operators.privacy import (
    k_anonymity_audit,
    suppress_small_groups,
)


@pytest.fixture(scope="module")
def people_df(spark):
    # QI = (zip, age band); sensitive = diag. Groups: one safe (n=3,
    # diverse), one too small (n=2), one homogeneous (n=3, l_div=1),
    # one singleton.
    rows = [
        ("94107", "30s", "flu"),
        ("94107", "30s", "flu"),
        ("94107", "30s", "cold"),
        ("94110", "40s", "flu"),
        ("94110", "40s", "cold"),
        ("94103", "20s", "flu"),
        ("94103", "20s", "flu"),
        ("94103", "20s", "flu"),
        ("10001", "70s", "rare"),
    ]
    return spark.createDataFrame(rows, "zip string, age string, diag string")


def test_audit_counts_and_flags(spark, people_df):
    out = {
        (r["zip"], r["age"]): r
        for r in k_anonymity_audit(
            people_df, ["zip", "age"], "diag", k=3, l=2
        ).collect()
    }
    assert out[("94107", "30s")]["n"] == 3
    assert out[("94107", "30s")]["l_div"] == 2
    assert not out[("94107", "30s")]["at_risk"]
    # n=2 < k
    assert out[("94110", "40s")]["at_risk"]
    # n ok, homogeneity attack (l_div=1)
    assert out[("94103", "20s")]["n"] == 3
    assert out[("94103", "20s")]["l_div"] == 1
    assert out[("94103", "20s")]["at_risk"]
    assert out[("10001", "70s")]["at_risk"]


def test_suppression_makes_table_k_anonymous(spark, people_df):
    k = 3
    kept = suppress_small_groups(people_df, ["zip", "age"], k=k)
    sizes = [
        r["n"]
        for r in kept.groupBy("zip", "age")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    ]
    assert sizes and all(n >= k for n in sizes)
    # groups that met the bar survive in full
    assert kept.filter(F.col("zip") == "94107").count() == 3
    assert kept.filter(F.col("zip") == "94103").count() == 3
    # the n=2 group and the singleton are suppressed
    assert kept.filter(F.col("zip").isin("94110", "10001")).count() == 0


def test_validation(spark, people_df):
    with pytest.raises(ValueError):
        k_anonymity_audit(people_df, [], "diag")
    with pytest.raises(ValueError):
        k_anonymity_audit(people_df, ["zip"], "diag", k=0)
    with pytest.raises(ValueError):
        suppress_small_groups(people_df, ["zip"], k=0)
