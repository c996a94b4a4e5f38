"""Batch IO round-trips + approx-sketch bounds + streaming windowed agg."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from kafka_denormalization_spark.sources.batch import read_batch, write_batch
from kafka_denormalization_spark.sources.kafka import probe_kafka_available


@pytest.mark.parametrize("fmt", ["parquet", "orc", "json", "csv"])
def test_batch_roundtrip(spark, comments, fmt, tmp_path):
    path = os.path.join(str(tmp_path), fmt)
    write_batch(comments, path, fmt)
    back = read_batch(
        spark, path, fmt,
        schema="by string, id long, parent long, text string, time long, type string, story long",
    )
    assert back.count() == comments.count()
    assert {r["id"] for r in back.select("id").collect()} == {1, 2, 3, 4}


def test_schemaless_json_rejected(spark, tmp_path):
    with pytest.raises(ValueError, match="schema"):
        read_batch(spark, str(tmp_path), "json")


def test_kafka_probe_is_honest(spark):
    """The container has no Kafka connector jar; the gate must say so
    (on a real deployment with --packages it flips to True)."""
    assert probe_kafka_available(spark) is False


def test_approx_stats_within_bounds(spark):
    from kafka_denormalization_spark.queries import q_approx_stats, q_quantiles

    sf = "/root/testdata/sf0.01"
    approx = {r["l_returnflag"]: r for r in q_approx_stats(spark, sf).collect()}
    exact_p50 = {r["l_returnflag"]: r["p50_qty"] for r in q_quantiles(spark, sf).collect()}
    from kafka_denormalization_spark.engine import table

    li = table(spark, sf, "lineitem")
    exact_distinct = {
        r["l_returnflag"]: r["d"]
        for r in li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_orderkey").alias("d"))
        .collect()
    }
    for flag, row in approx.items():
        rel_err = abs(row["approx_orders"] - exact_distinct[flag]) / exact_distinct[flag]
        assert rel_err < 0.08, f"HLL++ error {rel_err} too large for {flag}"


def test_streaming_windowed_agg_with_watermark(spark, tmp_path):
    """North-star streaming coverage beyond the join: tumbling-window count
    with a watermark, driven through a real streaming query."""
    src = os.path.join(str(tmp_path), "ev")
    rows = [
        (1, "2024-01-01 00:00:10"),
        (2, "2024-01-01 00:00:50"),
        (3, "2024-01-01 00:01:10"),
        (4, "2024-01-01 00:03:20"),
    ]
    df = spark.createDataFrame(rows, "id long, ts_s string").select(
        "id", F.col("ts_s").cast("timestamp").alias("ts")
    )
    df.coalesce(1).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 minute").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").cast("string").alias("start"), "n")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("winagg")
        .outputMode("complete")
        .option("checkpointLocation", os.path.join(str(tmp_path), "ck"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {r["start"]: r["n"] for r in spark.sql("SELECT * FROM winagg").collect()}
    assert got == {
        "2024-01-01 00:00:00": 2,
        "2024-01-01 00:01:00": 1,
        "2024-01-01 00:03:00": 1,
    }


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """O16 streaming form: dropDuplicatesWithinWatermark suppresses
    re-deliveries inside the watermark horizon."""
    src = os.path.join(str(tmp_path), "dup")
    rows = [
        (1, "2024-01-01 00:00:10"),
        (1, "2024-01-01 00:00:11"),  # re-delivery, same key
        (2, "2024-01-01 00:00:12"),
    ]
    df = spark.createDataFrame(rows, "id long, ts_s string").select(
        "id", F.col("ts_s").cast("timestamp").alias("ts")
    )
    df.coalesce(1).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    deduped = stream.withWatermark("ts", "1 hour").dropDuplicatesWithinWatermark(["id"])
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_wm")
        .outputMode("append")
        .option("checkpointLocation", os.path.join(str(tmp_path), "ckd"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    ids = sorted(r["id"] for r in spark.sql("SELECT id FROM dedup_wm").collect())
    assert ids == [1, 2]


def test_streaming_session_window_agg(spark, tmp_path):
    """Streaming sessionization via session_window (the built-in gap-window
    twin of operators.window.sessionize)."""
    src = os.path.join(str(tmp_path), "sess")
    rows = [
        (1, "u", "2024-01-01 00:00:00"),
        (2, "u", "2024-01-01 00:00:30"),   # same session (gap < 1m)
        (3, "u", "2024-01-01 00:05:00"),   # new session
    ]
    df = spark.createDataFrame(rows, "id long, user string, ts_s string").select(
        "id", "user", F.col("ts_s").cast("timestamp").alias("ts")
    )
    df.coalesce(1).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.session_window("ts", "1 minute").alias("w"), "user")
        .agg(F.count(F.lit(1)).alias("n"))
        .select("user", "n")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("sess_out")
        .outputMode("complete")
        .option("checkpointLocation", os.path.join(str(tmp_path), "cks"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    counts = sorted(r["n"] for r in spark.sql("SELECT n FROM sess_out").collect())
    assert counts == [1, 2]


def test_read_with_quarantine_json(spark, tmp_path):
    from kafka_denormalization_spark.sources.batch import read_with_quarantine

    p = tmp_path / "in.jsonl"
    p.write_text(
        '{"id": 1, "v": "ok"}\n'
        'not json at all\n'
        '{"id": 2, "v": "also ok"}\n'
        '{"id": "badtype and", "v": }\n'
    )
    good, bad = read_with_quarantine(spark, str(p), "json", "id LONG, v STRING")
    assert sorted((r["id"], r["v"]) for r in good.collect()) == [
        (1, "ok"),
        (2, "also ok"),
    ]
    quarantined = [r["_corrupt"] for r in bad.collect()]
    assert len(quarantined) == 2
    assert "not json at all" in quarantined


def test_read_with_quarantine_csv(spark, tmp_path):
    from kafka_denormalization_spark.sources.batch import read_with_quarantine

    p = tmp_path / "in.csv"
    p.write_text("id,v\n1,ok\nnotanumber,alsook\n2,fine\n")
    good, bad = read_with_quarantine(spark, str(p), "csv", "id LONG, v STRING")
    assert sorted((r["id"], r["v"]) for r in good.collect()) == [(1, "ok"), (2, "fine")]
    assert bad.count() == 1


def test_partitioned_write_prunes_partitions(spark, tmp_path):
    """partitionBy layout + a partition-column predicate must prune at
    PLAN time (PartitionFilters on the scan), not post-scan."""
    from kafka_denormalization_spark.engine import events_table
    from kafka_denormalization_spark.plans import explain_str
    from kafka_denormalization_spark.sources.batch import read_batch, write_batch

    ev = events_table(spark, "/root/testdata/sf0.001")
    write_batch(ev, str(tmp_path / "ev"), partition_by=["event_type"])
    back = read_batch(spark, str(tmp_path / "ev")).filter(
        F.col("event_type") == "click"
    )
    plan = explain_str(back)
    assert "PartitionFilters" in plan
    # the predicate must appear in PartitionFilters, not PushedFilters
    pf = plan[plan.index("PartitionFilters") :].split("]")[0]
    assert "click" in pf


def test_events_table_dtype_dispatch(spark, tmp_path):
    """events.ts has shipped as TIMESTAMP(NANOS)-as-long AND as
    TIMESTAMP_MICROS across driver rounds; the loader must handle both and
    fail with a one-line drift diagnosis on anything else."""
    import pytest

    from kafka_denormalization_spark.engine import events_table

    base = (
        "event_id LONG, user_id LONG, event_type STRING, value DOUBLE, "
        "props STRING"
    )

    # (a) legacy: ts is BIGINT epoch-nanos (what nanosAsLong yields)
    legacy = tmp_path / "legacy"
    spark.createDataFrame(
        [(1, 1_704_067_200_123_456_789, 7, "click", 1.0, "{}")],
        "event_id LONG, ts LONG, user_id LONG, event_type STRING, "
        "value DOUBLE, props STRING",
    ).write.parquet(str(legacy / "events.parquet"))
    ev = events_table(spark, str(legacy))
    assert ev.select("ts_us").first()[0] == 1_704_067_200_123_456

    # (b) current: ts is timestamp (µs) — written as TIMESTAMP_MICROS
    micros = tmp_path / "micros"
    spark.sql(
        "SELECT 1L AS event_id, TIMESTAMP'2024-01-01 00:00:00.123456' AS ts, "
        "7L AS user_id, 'click' AS event_type, 1.0D AS value, '{}' AS props"
    ).write.parquet(str(micros / "events.parquet"))
    ev = events_table(spark, str(micros))
    assert ev.select("ts_us").first()[0] == 1_704_067_200_123_456

    # (c) drift: ts as STRING must raise a clean one-line diagnosis
    drifted = tmp_path / "drifted"
    spark.createDataFrame(
        [(1, "2024-01-01", 7, "click", 1.0, "{}")],
        "event_id LONG, ts STRING, user_id LONG, event_type STRING, "
        "value DOUBLE, props STRING",
    ).write.parquet(str(drifted / "events.parquet"))
    with pytest.raises(TypeError, match="testdata schema changed"):
        events_table(spark, str(drifted))


def test_observe_metrics_single_pass(spark):
    from kafka_denormalization_spark.operators.observe import observe_corpus_metrics

    df = spark.createDataFrame(
        [(1, "hello world"), (2, ""), (3, None), (4, "x")],
        "id long, text string",
    )
    observed, obs = observe_corpus_metrics(df, "text")
    assert observed.count() == 4
    m = obs.get
    assert m["n_docs"] == 4
    assert m["total_chars"] == 12
    assert m["n_empty"] == 1
    assert m["n_null"] == 1


def test_observe_metrics_streaming(spark, tmp_path):
    """observe() metrics surface per-batch in StreamingQueryProgress —
    the same helper serves batch and streaming ingest telemetry."""
    from kafka_denormalization_spark.operators.observe import observe_corpus_metrics

    src = os.path.join(str(tmp_path), "obs")
    df = spark.createDataFrame(
        [(1, "hello world"), (2, ""), (3, "abc")], "id long, text string"
    )
    df.coalesce(1).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    observed, _ = observe_corpus_metrics(stream, "text")
    q = (
        observed.writeStream.format("memory")
        .queryName("obs_out")
        .outputMode("append")
        .option("checkpointLocation", os.path.join(str(tmp_path), "cko"))
        .start()
    )
    q.processAllAvailable()
    progresses = [p for p in q.recentProgress if p.get("observedMetrics")]
    q.stop()
    assert progresses, "no batch carried observed metrics"
    m = progresses[-1]["observedMetrics"]["corpus_metrics"]
    assert m["n_docs"] == 3
    assert m["total_chars"] == 14
    assert m["n_empty"] == 1


class TestCorpusIO:
    def _plan(self, spark):
        from kafka_denormalization_spark.engine import table
        from kafka_denormalization_spark.operators.sharding import (
            shard_plan_bytes,
        )

        docs = table(spark, "/root/testdata/sf0.001", "documents")
        return shard_plan_bytes(docs, "doc_id", "n_chars", n_shards=4).select(
            "doc_id", "text", "lang", "source", "n_chars", "shard_id", "pos"
        )

    def test_jsonl_roundtrip_verifies_against_plan(self, spark, tmp_path):
        from kafka_denormalization_spark.sources.corpus_io import (
            read_corpus_shards,
            verify_corpus_shards,
            write_corpus_shards,
        )

        plan = self._plan(spark)
        out = str(tmp_path / "shards")
        write_corpus_shards(plan, out, n_shards=4, fmt="jsonl")
        back = read_corpus_shards(
            spark,
            out,
            schema=(
                "doc_id long, text string, lang string, source string, "
                "n_chars long, pos long"
            ),
        )
        assert back.count() == plan.count()
        # full-fidelity roundtrip, not just counts
        assert (
            back.select("doc_id", "shard_id", "pos")
            .exceptAll(plan.select("doc_id", "shard_id", "pos"))
            .count()
            == 0
        )
        mism = verify_corpus_shards(back, plan, "doc_id", "n_chars")
        assert mism.count() == 0

    def test_each_shard_is_one_file_ordered_by_pos(self, spark, tmp_path):
        import glob
        import json

        from kafka_denormalization_spark.sources.corpus_io import (
            write_corpus_shards,
        )

        plan = self._plan(spark)
        out = str(tmp_path / "shards")
        write_corpus_shards(plan, out, n_shards=4, fmt="jsonl")
        shard_dirs = sorted(glob.glob(f"{out}/shard_id=*"))
        assert len(shard_dirs) == 4
        for d in shard_dirs:
            files = [
                f for f in glob.glob(f"{d}/part-*") if not f.endswith(".crc")
            ]
            assert len(files) == 1, f"{d} has {len(files)} part files"
            positions = [
                json.loads(line)["pos"] for line in open(files[0])
            ]
            assert positions == sorted(positions)
            # dense 0-based per shard (shard_plan_bytes contract)
            assert positions[0] == 0

    def test_verify_flags_tampered_layout(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from kafka_denormalization_spark.sources.corpus_io import (
            read_corpus_shards,
            verify_corpus_shards,
            write_corpus_shards,
        )

        plan = self._plan(spark)
        out = str(tmp_path / "shards")
        write_corpus_shards(plan, out, n_shards=4, fmt="jsonl")
        back = read_corpus_shards(
            spark,
            out,
            schema=(
                "doc_id long, text string, lang string, source string, "
                "n_chars long, pos long"
            ),
        )
        # a pos swap inside shard 0 keeps counts/bytes/envelope identical;
        # only the (id @ pos) checksum can catch it
        lo = F.col("shard_id") == 0
        swapped = back.withColumn(
            "pos",
            F.when(lo & (F.col("pos") == 0), F.lit(1))
            .when(lo & (F.col("pos") == 1), F.lit(0))
            .otherwise(F.col("pos")),
        )
        mism = verify_corpus_shards(swapped, plan, "doc_id", "n_chars")
        rows = mism.collect()
        assert len(rows) == 1 and rows[0]["shard_id"] == 0
        assert rows[0]["plan_checksum"] != rows[0]["got_checksum"]
        # and a dropped shard surfaces as a NULL-sided row
        partial = back.filter(F.col("shard_id") != 3)
        mism2 = verify_corpus_shards(partial, plan, "doc_id", "n_chars")
        assert any(r["shard_id"] == 3 for r in mism2.collect())

    def test_parquet_roundtrip(self, spark, tmp_path):
        from kafka_denormalization_spark.sources.corpus_io import (
            read_corpus_shards,
            verify_corpus_shards,
            write_corpus_shards,
        )

        plan = self._plan(spark)
        out = str(tmp_path / "pshards")
        write_corpus_shards(plan, out, n_shards=4, fmt="parquet")
        back = read_corpus_shards(spark, out, fmt="parquet")
        assert back.count() == plan.count()
        assert dict(back.dtypes)["shard_id"] == "bigint"
        assert verify_corpus_shards(back, plan, "doc_id", "n_chars").count() == 0

    def test_bad_format_rejected(self, spark, tmp_path):
        import pytest

        from kafka_denormalization_spark.sources.corpus_io import (
            write_corpus_shards,
        )

        with pytest.raises(ValueError, match="fmt"):
            write_corpus_shards(self._plan(spark), str(tmp_path / "x"), 4, fmt="csv")

    def test_size_targeted_multi_file_shards(self, spark, tmp_path):
        """max_records_per_file splits big shards into sequential part
        files; name-ordered concatenation stays pos-ordered and the
        manifest verification is file-layout-independent."""
        import glob
        import json

        from kafka_denormalization_spark.sources.corpus_io import (
            read_corpus_shards,
            verify_corpus_shards,
            write_corpus_shards,
        )

        plan = self._plan(spark)
        out = str(tmp_path / "sized")
        write_corpus_shards(
            plan, out, n_shards=4, fmt="jsonl", max_records_per_file=10
        )
        shard_dirs = sorted(glob.glob(f"{out}/shard_id=*"))
        assert len(shard_dirs) == 4
        multi = 0
        for d in shard_dirs:
            files = sorted(
                f for f in glob.glob(f"{d}/part-*") if not f.endswith(".crc")
            )
            positions = [
                json.loads(line)["pos"] for f in files for line in open(f)
            ]
            assert all(len(open(f).readlines()) <= 10 for f in files)
            assert positions == sorted(positions)  # name order == pos order
            if len(files) > 1:
                multi += 1
        assert multi >= 1  # the cap actually split something
        back = read_corpus_shards(
            spark,
            out,
            schema=(
                "doc_id long, text string, lang string, source string, "
                "n_chars long, pos long"
            ),
        )
        assert verify_corpus_shards(back, plan, "doc_id", "n_chars").count() == 0
