"""Event-time windowed aggregation: tumbling/sliding/session windows with
watermarks, and watermark-bounded streaming dedup.

Strategy mirrors tests/test_streaming.py: parquet file source fed batch by
batch (maxFilesPerTrigger=1) -> memory sink; batch-mode twins are checked
against the lag+cumsum / groupBy formulations the rest of the library uses.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from kafka_denormalization_spark.operators.window import sessionize
from kafka_denormalization_spark.streaming.windows import (
    drop_duplicates_within_watermark,
    session_window_agg,
    windowed_agg,
)

EVENT_SCHEMA = "user string, ts timestamp, amount long"


def _ts(sec: int):
    return f"2024-01-01 00:{sec // 60:02d}:{sec % 60:02d}"


def _events(spark, rows):
    return spark.createDataFrame(
        [(u, _ts(s), a) for (u, s, a) in rows], "user string, ts string, amount long"
    ).select("user", F.col("ts").cast("timestamp").alias("ts"), "amount")


@pytest.fixture
def tmpdir(tmp_path):
    return str(tmp_path)


# -- batch-mode twins --------------------------------------------------------


def test_tumbling_window_batch(spark):
    df = _events(spark, [("a", 10, 1), ("a", 70, 2), ("b", 65, 3), ("a", 130, 4)])
    out = windowed_agg(
        df, "ts", ["user"], [F.sum("amount").alias("total")], window="1 minute"
    )
    got = {(r.user, r.window_start.minute, r.total) for r in out.collect()}
    assert got == {("a", 0, 1), ("a", 1, 2), ("b", 1, 3), ("a", 2, 4)}


def test_sliding_window_batch_counts_overlap(spark):
    # one event at t=70s; 2-minute window sliding by 1 minute -> it lands in
    # the [0,2) and [1,3) panes
    df = _events(spark, [("a", 70, 5)])
    out = windowed_agg(
        df,
        "ts",
        ["user"],
        [F.count("*").alias("n")],
        window="2 minutes",
        slide="1 minute",
    )
    starts = sorted(r.window_start.minute for r in out.collect())
    assert starts == [0, 1]


def test_session_window_batch_matches_sessionize(spark):
    # same gap semantics as the lag+cumsum sessionize operator away from the
    # exact-boundary case (session_window closes at diff >= gap, sessionize
    # at diff > gap; inputs here avoid diff == gap)
    rows = [("a", 0, 1), ("a", 30, 1), ("a", 200, 1), ("b", 10, 1)]
    df = _events(spark, rows)
    native = session_window_agg(
        df, "ts", ["user"], [F.count("*").alias("n")], gap="1 minute"
    )
    legacy = (
        sessionize(
            df.withColumn("t", F.col("ts").cast("long")), "user", "t", gap=F.lit(60)
        )
        .groupBy("user", "session_id")
        .agg(F.count("*").alias("n"), F.min("t").alias("start_s"))
    )
    n_native = {
        (r.user, r.session_start.minute * 60 + r.session_start.second, r.n)
        for r in native.collect()
    }
    # legacy start_s is epoch seconds; events all live in the first hour of
    # 2024-01-01 so subtracting the day's epoch yields the same offsets
    epoch = 1704067200
    n_legacy = {(r.user, r.start_s - epoch, r.n) for r in legacy.collect()}
    assert n_native == n_legacy


def test_dedup_batch_fallback(spark):
    df = _events(spark, [("a", 10, 1), ("a", 10, 1), ("b", 20, 2)])
    out = drop_duplicates_within_watermark(df, ["user", "ts"], "ts")
    assert out.count() == 2


def test_agg_requires_alias(spark):
    df = _events(spark, [("a", 10, 1)])
    with pytest.raises(ValueError, match="alias"):
        windowed_agg(df, "ts", ["user"], [F.sum("amount")], window="1 minute")


# -- streaming: file source, memory sink ------------------------------------


def _feed(spark, src, dfs):
    # one file per batch, appended in order (file-source triggers follow
    # modification time, so each coalesced file becomes one micro-batch
    # under maxFilesPerTrigger=1 — same discipline as test_streaming.py)
    for i, df in enumerate(dfs):
        df.coalesce(1).write.mode("append" if i else "overwrite").parquet(src)


def _drain(q):
    q.processAllAvailable()
    q.stop()


def test_streaming_tumbling_append_finalizes_on_watermark(spark, tmpdir):
    src = os.path.join(tmpdir, "src")
    # batch 1: events in minute 0 and minute 1; batch 2: minute 10 event
    # advances the watermark far past minute 0/1 -> both panes finalize
    _feed(
        spark,
        src,
        [
            _events(spark, [("a", 10, 1), ("a", 20, 2), ("a", 70, 4)]),
            _events(spark, [("a", 600, 8)]),
        ],
    )
    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = windowed_agg(
        stream,
        "ts",
        ["user"],
        [F.sum("amount").alias("total")],
        window="1 minute",
        watermark="2 minutes",
    )
    q = (
        out.writeStream.format("memory")
        .queryName("win_tumble")
        .outputMode("append")
        .option("checkpointLocation", os.path.join(tmpdir, "ck"))
        .start()
    )
    _drain(q)
    got = {
        (r.user, r.window_start.minute, r.total)
        for r in spark.sql("select * from win_tumble").collect()
    }
    # minute-10 pane is NOT emitted (watermark hasn't passed it); 0 and 1 are
    assert got == {("a", 0, 3), ("a", 1, 4)}


def test_streaming_late_within_delay_folds_in(spark, tmpdir):
    src = os.path.join(tmpdir, "src")
    # late event (minute 0) arrives in batch 2 while watermark (2 min delay,
    # max seen 70s) still admits it; batch 3 pushes the watermark past the
    # pane so the FINAL pane includes the late row
    _feed(
        spark,
        src,
        [
            _events(spark, [("a", 10, 1), ("a", 70, 2)]),
            _events(spark, [("a", 30, 10)]),
            _events(spark, [("a", 600, 1)]),
        ],
    )
    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = windowed_agg(
        stream,
        "ts",
        ["user"],
        [F.sum("amount").alias("total")],
        window="1 minute",
        watermark="2 minutes",
    )
    q = (
        out.writeStream.format("memory")
        .queryName("win_late")
        .outputMode("append")
        .option("checkpointLocation", os.path.join(tmpdir, "ck"))
        .start()
    )
    _drain(q)
    got = {
        (r.window_start.minute, r.total)
        for r in spark.sql("select * from win_late").collect()
    }
    assert (0, 11) in got  # late +10 folded into the minute-0 pane


def test_streaming_session_window_merges_across_batches(spark, tmpdir):
    src = os.path.join(tmpdir, "src")
    # two events 30s apart across separate micro-batches -> ONE session
    # (state-store session merge); the minute-20 event finalizes it
    _feed(
        spark,
        src,
        [
            _events(spark, [("a", 0, 1)]),
            _events(spark, [("a", 30, 1)]),
            _events(spark, [("a", 1200, 1)]),
        ],
    )
    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = session_window_agg(
        stream,
        "ts",
        ["user"],
        [F.count("*").alias("n")],
        gap="1 minute",
        watermark="2 minutes",
    )
    q = (
        out.writeStream.format("memory")
        .queryName("win_sess")
        .outputMode("append")
        .option("checkpointLocation", os.path.join(tmpdir, "ck"))
        .start()
    )
    _drain(q)
    rows = spark.sql("select * from win_sess").collect()
    assert [(r.user, r.n) for r in rows] == [("a", 2)]


def test_streaming_dedup_within_watermark(spark, tmpdir):
    src = os.path.join(tmpdir, "src")
    # duplicate (user, ts) in a later batch while still inside the
    # watermark -> suppressed; the minute-20 row then advances the watermark
    # so the (a, 10) state row is evicted (bounded state — late copies after
    # that are below the watermark and filtered as late data, not matched
    # against unbounded state)
    _feed(
        spark,
        src,
        [
            _events(spark, [("a", 10, 1)]),
            _events(spark, [("a", 10, 1), ("a", 60, 2)]),
            _events(spark, [("a", 1200, 3)]),
        ],
    )
    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = drop_duplicates_within_watermark(stream, ["user", "ts"], "ts", "1 minute")
    q = (
        out.writeStream.format("memory")
        .queryName("win_dedup")
        .outputMode("append")
        .option("checkpointLocation", os.path.join(tmpdir, "ck"))
        .start()
    )
    _drain(q)
    rows = spark.sql("select user, ts, amount from win_dedup").collect()
    tss = sorted(r.ts.minute * 60 + r.ts.second for r in rows)
    # the in-window duplicate of ts=10 was suppressed
    assert tss == [10, 60, 1200]


def test_streaming_content_digest_dedup(spark, tmpdir):
    """Continuous-ingest content dedup: the streaming twin of
    operators/dedup.py incremental_dedup — key the watermark-bounded dedup
    on a sha256 CONTENT digest, so an identical document arriving in a
    later micro-batch (different doc_id) is suppressed while its digest is
    inside the watermark. State holds one 64-hex-char row per distinct
    content, never the text."""
    src = os.path.join(tmpdir, "src")

    def docs(rows):
        return spark.createDataFrame(
            [(i, _ts(s), t) for (i, s, t) in rows],
            "doc_id long, ts string, text string",
        ).select("doc_id", F.col("ts").cast("timestamp").alias("ts"), "text")

    _feed(
        spark,
        src,
        [
            docs([(1, 10, "alpha"), (2, 20, "beta")]),
            # doc 3 repeats doc 1's content inside the watermark -> dropped;
            # doc 4 is fresh content -> kept
            docs([(3, 30, "alpha"), (4, 40, "gamma")]),
        ],
    )
    stream = (
        spark.readStream.schema("doc_id long, ts timestamp, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    ).withColumn("digest", F.sha2("text", 256))
    out = drop_duplicates_within_watermark(stream, ["digest"], "ts", "10 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("digest_dedup")
        .outputMode("append")
        .option("checkpointLocation", os.path.join(tmpdir, "ck_dd"))
        .start()
    )
    _drain(q)
    kept = sorted(r.doc_id for r in spark.sql("select doc_id from digest_dedup").collect())
    assert kept == [1, 2, 4]
