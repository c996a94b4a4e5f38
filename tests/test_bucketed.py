"""Bucketed co-located joins: the pay-shuffle-once scale path, proven by
plan shape (no exchange on either join side)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_denormalization_spark.engine import table
from kafka_denormalization_spark.plans import count_exchanges, explain_str
from kafka_denormalization_spark.sources.bucketed import read_bucketed, save_bucketed

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    li = table(spark, SF_DIR, "lineitem")
    orders = table(spark, SF_DIR, "orders")
    save_bucketed(li, "li_bucketed", ["l_orderkey"], num_buckets=8)
    save_bucketed(orders, "ord_bucketed", ["o_orderkey"], num_buckets=8)
    yield
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS ord_bucketed")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    # disable auto-broadcast so the join would otherwise need two exchanges
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        li = read_bucketed(spark, "li_bucketed")
        orders = read_bucketed(spark, "ord_bucketed")
        joined = li.join(orders, li["l_orderkey"] == orders["o_orderkey"]).select(
            "l_orderkey", "l_linenumber", "o_totalprice"
        )
        plan = explain_str(joined, "simple")
        assert count_exchanges(joined) == 0, plan
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_bucketed_agg_has_no_shuffle(spark, bucketed_tables):
    li = read_bucketed(spark, "li_bucketed")
    agg = li.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("n"))
    assert count_exchanges(agg) == 0
    assert agg.count() > 0


def test_unbucketed_join_needs_shuffles(spark):
    """Control: same join from plain parquet shuffles both sides."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        li = table(spark, SF_DIR, "lineitem")
        orders = table(spark, SF_DIR, "orders")
        joined = li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        assert count_exchanges(joined) == 2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_save_bucketed_recovers_from_orphaned_location(spark):
    """A session killed between writing the managed dir and committing
    the catalog entry leaves an ORPHANED warehouse location (no table
    backing it); saveAsTable then fails LOCATION_ALREADY_EXISTS even
    under mode='overwrite'. save_bucketed must clear the orphan and
    succeed — while an existing CATALOG table still goes through the
    normal overwrite path."""
    import os
    from urllib.parse import urlparse

    li = table(spark, SF_DIR, "lineitem").limit(100)
    name = "li_orphan_test"
    try:
        # plant an orphan: directory in the warehouse, no catalog entry
        wh = urlparse(
            spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
        ).path
        orphan = os.path.join(wh, name)
        os.makedirs(os.path.join(orphan, "junk"), exist_ok=True)
        assert not spark.catalog.tableExists(name)

        save_bucketed(li, name, ["l_orderkey"], num_buckets=4)
        assert read_bucketed(spark, name).count() == 100

        # normal overwrite of a LIVE table also works
        save_bucketed(li.limit(50), name, ["l_orderkey"], num_buckets=4)
        assert read_bucketed(spark, name).count() == 50
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
