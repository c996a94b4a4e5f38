"""Stream-stream interval join: native watermark-bounded band join.

File-source streams -> memory sink, same discipline as the other streaming
suites; batch mode cross-checked against operators/range_join.py.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from kafka_denormalization_spark.streaming.interval_join import stream_interval_join

CLICK_SCHEMA = "user string, click_ts timestamp, click_id long"
ERR_SCHEMA = "user string, err_ts timestamp, err_id long"


def _ts(sec):
    return f"2024-01-01 00:{sec // 60:02d}:{sec % 60:02d}"


def _clicks(spark, rows):
    return spark.createDataFrame(
        [(u, _ts(s), i) for (u, s, i) in rows], "user string, click_ts string, click_id long"
    ).select("user", F.col("click_ts").cast("timestamp").alias("click_ts"), "click_id")


def _errs(spark, rows):
    return spark.createDataFrame(
        [(u, _ts(s), i) for (u, s, i) in rows], "user string, err_ts string, err_id long"
    ).select("user", F.col("err_ts").cast("timestamp").alias("err_ts"), "err_id")


@pytest.fixture
def tmpdir(tmp_path):
    return str(tmp_path)


def test_batch_mode_matches_range_join(spark):
    from kafka_denormalization_spark.operators.range_join import range_join

    clicks = _clicks(spark, [("a", 10, 1), ("a", 100, 2), ("b", 50, 3)])
    errs = _errs(spark, [("a", 40, 10), ("a", 400, 11), ("b", 55, 12)])
    out = stream_interval_join(
        clicks, errs, on="user", left_ts="click_ts", right_ts="err_ts",
        lower_s=0, upper_s=60,
    )
    got = {(r.click_id, r.err_id) for r in out.collect()}
    rj = range_join(
        clicks.withColumn("cts", F.col("click_ts").cast("long")).drop("click_ts"),
        errs.withColumn("ets", F.col("err_ts").cast("long")).drop("err_ts"),
        on="user", left_ts="cts", right_ts="ets", lower=0, upper=60,
    )
    expected = {(r.click_id, r.err_id) for r in rj.collect()}
    assert got == expected == {(1, 10), (3, 12)}


def test_rejects_bad_args(spark):
    clicks = _clicks(spark, [("a", 0, 1)])
    errs = _errs(spark, [("a", 0, 2)])
    with pytest.raises(ValueError, match="upper_s"):
        stream_interval_join(clicks, errs, "user", "click_ts", "err_ts", 10, 0)
    with pytest.raises(ValueError, match="flavor"):
        stream_interval_join(clicks, errs, "user", "click_ts", "err_ts", 0, 10, how="cross")


def test_streaming_inner_band_join(spark, tmpdir):
    csrc, esrc = os.path.join(tmpdir, "c"), os.path.join(tmpdir, "e")
    _clicks(spark, [("a", 10, 1), ("a", 300, 2)]).coalesce(1).write.parquet(csrc)
    _errs(spark, [("a", 40, 10), ("a", 290, 11)]).coalesce(1).write.parquet(esrc)
    cs = spark.readStream.schema(CLICK_SCHEMA).parquet(csrc)
    es = spark.readStream.schema(ERR_SCHEMA).parquet(esrc)
    out = stream_interval_join(
        cs, es, on="user", left_ts="click_ts", right_ts="err_ts",
        lower_s=0, upper_s=60, watermark="2 minutes",
    )
    q = (
        out.writeStream.format("memory")
        .queryName("ivj_inner")
        .outputMode("append")
        .option("checkpointLocation", os.path.join(tmpdir, "ck"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {(r.click_id, r.err_id) for r in spark.sql("select * from ivj_inner").collect()}
    # click 1 (t=10) matches err 10 (t=40, within +60); click 2 (t=300) does
    # NOT match err 11 (t=290: before the click, outside [0, +60])
    assert got == {(1, 10)}


def test_streaming_left_outer_emits_unmatched_after_watermark(spark, tmpdir):
    csrc, esrc = os.path.join(tmpdir, "c"), os.path.join(tmpdir, "e")
    # click 2 has no err within band; the late minute-30 rows push the
    # watermark far enough to close its band and emit the null row
    for i, df in enumerate(
        [_clicks(spark, [("a", 10, 1), ("a", 70, 2)]), _clicks(spark, [("a", 1800, 3)])]
    ):
        df.coalesce(1).write.mode("append" if i else "overwrite").parquet(csrc)
    for i, df in enumerate(
        [_errs(spark, [("a", 40, 10)]), _errs(spark, [("a", 1800, 11)])]
    ):
        df.coalesce(1).write.mode("append" if i else "overwrite").parquet(esrc)
    cs = spark.readStream.schema(CLICK_SCHEMA).option("maxFilesPerTrigger", 1).parquet(csrc)
    es = spark.readStream.schema(ERR_SCHEMA).option("maxFilesPerTrigger", 1).parquet(esrc)
    out = stream_interval_join(
        cs, es, on="user", left_ts="click_ts", right_ts="err_ts",
        lower_s=0, upper_s=60, watermark="1 minute", how="left_outer",
    )
    q = (
        out.writeStream.format("memory")
        .queryName("ivj_louter")
        .outputMode("append")
        .option("checkpointLocation", os.path.join(tmpdir, "ck"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {(r.click_id, r.err_id) for r in spark.sql("select * from ivj_louter").collect()}
    assert (1, 10) in got          # matched within band
    assert (2, None) in got        # unmatched, emitted after watermark closed
