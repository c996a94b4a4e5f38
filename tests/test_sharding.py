"""Deterministic training-shard layout (operators/sharding.py)."""

from __future__ import annotations

import collections

from pyspark.sql import functions as F

from kafka_denormalization_spark.operators.sharding import (
    shard_plan,
    shard_stats,
    write_shards,
)


def _docs(spark, n=500):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("tok "), F.col("id").cast("string")).alias("text"),
    )


def test_shard_plan_layout_invariants(spark):
    plan = shard_plan(_docs(spark), "doc_id", n_shards=8, salt="s").collect()
    assert len(plan) == 500
    by_shard = collections.defaultdict(list)
    for r in plan:
        assert 0 <= r["shard_id"] < 8
        by_shard[r["shard_id"]].append(r["pos"])
    # every shard's positions are dense 0..n-1 (the loader read order)
    for positions in by_shard.values():
        assert sorted(positions) == list(range(len(positions)))
    # hash sharding is roughly balanced
    sizes = [len(v) for v in by_shard.values()]
    assert len(sizes) == 8 and min(sizes) > 500 / 8 / 2


def test_shard_plan_partition_independent(spark):
    base = _docs(spark)
    a = {
        (r["doc_id"], r["shard_id"], r["pos"])
        for r in shard_plan(base, "doc_id", 8, salt="s").collect()
    }
    b = {
        (r["doc_id"], r["shard_id"], r["pos"])
        for r in shard_plan(
            base.repartition(13).sortWithinPartitions(F.col("doc_id").desc()),
            "doc_id",
            8,
            salt="s",
        ).collect()
    }
    assert a == b
    # a different salt re-deals the layout
    c = {
        (r["doc_id"], r["shard_id"], r["pos"])
        for r in shard_plan(base, "doc_id", 8, salt="other").collect()
    }
    assert a != c


def _sized_docs(spark, n=400):
    # heavy-tailed sizes: a few giants, many small docs
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 97 == 0, F.col("id") * 50 + 10_000)
        .otherwise(F.col("id") % 37 + 5)
        .cast("long")
        .alias("n_bytes"),
    )


def test_shard_plan_bytes_balance_and_density(spark):
    from kafka_denormalization_spark.operators.sharding import (
        shard_plan_bytes,
    )

    docs = _sized_docs(spark)
    plan = shard_plan_bytes(docs, "doc_id", "n_bytes", n_shards=8).collect()
    assert len(plan) == 400
    by_shard = collections.defaultdict(list)
    bytes_by_shard = collections.defaultdict(int)
    for r in plan:
        assert 0 <= r["shard_id"] < 8
        by_shard[r["shard_id"]].append(r["pos"])
        bytes_by_shard[r["shard_id"]] += r["n_bytes"]
    # per-shard positions dense 0..n-1
    for positions in by_shard.values():
        assert sorted(positions) == list(range(len(positions)))
    # serpentine guarantee: byte spread <= max single item (with 5
    # giants over 8 shards NO packing can do better than "a giant-less
    # shard trails by one giant" — the theorem is the right assertion)
    max_item = max(r["n_bytes"] for r in plan)
    spread = max(bytes_by_shard.values()) - min(bytes_by_shard.values())
    assert spread <= max_item
    # on a balanceable size mix (many moderate items), the layout is
    # near-perfect: every shard within 2% of the mean
    mild = spark.range(400).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 200 + 50).cast("long").alias("n_bytes"),
    )
    mplan = shard_plan_bytes(mild, "doc_id", "n_bytes", n_shards=8).collect()
    mtotals = collections.defaultdict(int)
    for r in mplan:
        mtotals[r["shard_id"]] += r["n_bytes"]
    mmean = sum(mtotals.values()) / 8
    for total in mtotals.values():
        assert abs(total - mmean) <= 0.02 * mmean


def test_shard_plan_bytes_partition_independent(spark):
    from kafka_denormalization_spark.operators.sharding import (
        shard_plan_bytes,
    )

    base = _sized_docs(spark)
    a = {
        (r["doc_id"], r["shard_id"], r["pos"])
        for r in shard_plan_bytes(base, "doc_id", "n_bytes", 8).collect()
    }
    b = {
        (r["doc_id"], r["shard_id"], r["pos"])
        for r in shard_plan_bytes(
            base.repartition(13).sortWithinPartitions(F.col("doc_id").desc()),
            "doc_id",
            "n_bytes",
            8,
        ).collect()
    }
    assert a == b


def test_shard_stats_totals(spark):
    plan = shard_plan(_docs(spark, 200), "doc_id", 4, salt="s")
    stats = shard_stats(plan, F.size(F.split(F.trim("text"), r"\s+"))).collect()
    assert sum(r["n_docs"] for r in stats) == 200
    assert sum(r["n_tokens"] for r in stats) == 400  # 2 tokens per doc


def test_write_shards_read_order(spark, tmp_path):
    plan = shard_plan(_docs(spark, 120), "doc_id", 4, salt="s")
    out = str(tmp_path / "shards")
    write_shards(plan, out)
    back = spark.read.parquet(out)
    # partitionBy layout: one directory per shard, pos column intact
    assert sorted(
        r["shard_id"] for r in back.select("shard_id").distinct().collect()
    ) == [0, 1, 2, 3]
    expect = {
        (r["doc_id"], r["shard_id"], r["pos"])
        for r in plan.select("doc_id", "shard_id", "pos").collect()
    }
    got = {
        (r["doc_id"], r["shard_id"], r["pos"])
        for r in back.select("doc_id", "shard_id", "pos").collect()
    }
    assert got == expect
    # within each shard file, physical row order IS the pos order
    for shard_dir in (tmp_path / "shards").glob("shard_id=*"):
        rows = (
            spark.read.parquet(str(shard_dir))
            .select("pos")
            .toPandas()["pos"]
            .tolist()
        )
        assert rows == sorted(rows)


def _batch(spark, lo, hi):
    from pyspark.sql import functions as F

    return spark.range(lo, hi).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("tok "), F.col("id").cast("string")).alias("text"),
    )


def test_ingest_shard_contiguous_across_batches(spark, tmp_path):
    """The streaming twin: shard assignment matches the batch twin's
    hash; positions are contiguous per shard across batches (batch 2
    continues where batch 1 stopped)."""
    from kafka_denormalization_spark.streaming.ingest_shard import IngestShard

    ing = IngestShard(spark, str(tmp_path), "doc_id", n_shards=4, salt="s")
    out1 = ing.process_batch(_batch(spark, 0, 100)).collect()
    out2 = ing.process_batch(_batch(spark, 100, 180)).collect()
    # assignment agrees with the stateless batch twin
    twin = {
        r["doc_id"]: r["shard_id"]
        for r in shard_plan(_batch(spark, 0, 180), "doc_id", 4, salt="s")
        .select("doc_id", "shard_id")
        .collect()
    }
    for r in out1 + out2:
        assert r["shard_id"] == twin[r["doc_id"]]
    # per shard: batch-1 positions dense from 0, batch-2 continues
    import collections

    per1 = collections.Counter(r["shard_id"] for r in out1)
    for s in per1:
        p1 = sorted(r["pos"] for r in out1 if r["shard_id"] == s)
        assert p1 == list(range(len(p1)))
        p2 = sorted(r["pos"] for r in out2 if r["shard_id"] == s)
        assert p2 == list(range(len(p1), len(p1) + len(p2)))


def test_ingest_shard_restart_memory_and_compact(spark, tmp_path):
    """A fresh instance over the same state dir continues the counters;
    compact() folds history without changing them."""
    from kafka_denormalization_spark.streaming.ingest_shard import IngestShard

    a = IngestShard(spark, str(tmp_path), "doc_id", n_shards=2, salt="s")
    out1 = a.process_batch(_batch(spark, 0, 50)).collect()
    assert a.compact() <= 2  # one row per touched shard
    b = IngestShard(spark, str(tmp_path), "doc_id", n_shards=2, salt="s")
    out2 = b.process_batch(_batch(spark, 50, 90)).collect()
    n1 = {s: sum(1 for r in out1 if r["shard_id"] == s) for s in (0, 1)}
    for s in (0, 1):
        p2 = sorted(r["pos"] for r in out2 if r["shard_id"] == s)
        assert p2 == list(range(n1[s], n1[s] + len(p2)))


def test_ingest_shard_file_stream_e2e(spark, tmp_path):
    """Real Structured Streaming run: file source -> foreachBatch ->
    positioned rows collected; the full output is a valid layout (all
    rows positioned, per-shard positions dense)."""
    import collections

    from kafka_denormalization_spark.streaming.ingest_shard import IngestShard

    src = tmp_path / "src"
    src.mkdir()
    _batch(spark, 0, 60).write.mode("overwrite").parquet(str(src / "b1"))
    _batch(spark, 60, 100).write.mode("overwrite").parquet(str(src / "b2"))
    got = []
    ing = IngestShard(spark, str(tmp_path / "state"), "doc_id", n_shards=4)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*")
    )
    q = (
        stream.writeStream.foreachBatch(
            ing.foreach_batch(lambda df, _e: got.extend(df.collect()))
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert len(got) == 100
    by_shard = collections.defaultdict(list)
    for r in got:
        by_shard[r["shard_id"]].append(r["pos"])
    for positions in by_shard.values():
        assert sorted(positions) == list(range(len(positions)))


# ---------------------------------------------------------------------------
# shard_manifest (loader-side integrity record)
# ---------------------------------------------------------------------------


def test_shard_manifest_intact_plan(spark):
    from kafka_denormalization_spark.operators.sharding import (
        shard_manifest,
        shard_plan,
    )

    docs = spark.createDataFrame(
        [(i, 10 + i) for i in range(40)], "doc_id long, n_bytes long"
    )
    plan = shard_plan(docs, "doc_id", n_shards=4)
    man = {r["shard_id"]: r for r in shard_manifest(plan, "doc_id", "n_bytes").collect()}
    assert set(man) <= set(range(4))
    assert sum(r["n_docs"] for r in man.values()) == 40
    assert sum(r["total_bytes"] for r in man.values()) == sum(10 + i for i in range(40))
    for r in man.values():
        assert r["contiguous"]
        assert r["pos_min"] == 0 and r["pos_max"] == r["n_docs"] - 1


def test_shard_manifest_detects_mutations(spark):
    from pyspark.sql import functions as F

    from kafka_denormalization_spark.operators.sharding import (
        shard_manifest,
        shard_plan,
    )

    docs = spark.createDataFrame(
        [(i, 100) for i in range(30)], "doc_id long, n_bytes long"
    )
    plan = shard_plan(docs, "doc_id", n_shards=2).cache()
    base = {r["shard_id"]: r for r in shard_manifest(plan, "doc_id", "n_bytes").collect()}

    # dropping an interior row breaks contiguity AND the checksum
    victim = plan.filter((F.col("shard_id") == 0) & (F.col("pos") == 1))
    vid = victim.first()["doc_id"]
    broken = shard_manifest(
        plan.filter(F.col("doc_id") != vid), "doc_id", "n_bytes"
    )
    b0 = {r["shard_id"]: r for r in broken.collect()}[0]
    assert not b0["contiguous"]
    assert b0["checksum"] != base[0]["checksum"]

    # swapping two rows' positions keeps counts/bytes/envelope but
    # flips the checksum (the layout is part of the contract)
    swapped = plan.withColumn(
        "pos",
        F.when((F.col("shard_id") == 0) & (F.col("pos") == 0), F.lit(1))
        .when((F.col("shard_id") == 0) & (F.col("pos") == 1), F.lit(0))
        .otherwise(F.col("pos")),
    )
    s0 = {r["shard_id"]: r for r in shard_manifest(swapped, "doc_id", "n_bytes").collect()}[0]
    assert s0["n_docs"] == base[0]["n_docs"]
    assert s0["contiguous"]
    assert s0["checksum"] != base[0]["checksum"]
    plan.unpersist()


def test_ingest_manifest_matches_batch_twin(spark, tmp_path):
    """Streaming manifest fold == batch shard_manifest over the union of
    all streamed layout rows (XOR associativity makes the incremental
    fold exact); restart reads the same durable state; compact is
    lossless."""
    from kafka_denormalization_spark.operators.sharding import shard_manifest
    from kafka_denormalization_spark.streaming.ingest_shard import (
        IngestManifest,
        IngestShard,
    )

    sh = IngestShard(spark, str(tmp_path), "doc_id", n_shards=3)
    man = IngestManifest(spark, str(tmp_path), "doc_id", "n_bytes")
    batches = [
        [(i, 100 + i) for i in range(8)],
        [(i, 100 + i) for i in range(8, 20)],
        [(i, 100 + i) for i in range(20, 25)],
    ]
    laid = []
    for b in batches:
        df = spark.createDataFrame(b, "doc_id long, n_bytes long")
        out = sh.process_batch(df)
        man.update(out)
        laid.extend(r.asDict() for r in out.collect())

    union = spark.createDataFrame(
        laid, "doc_id long, n_bytes long, shard_id long, pos long"
    )
    ref = {r["shard_id"]: r for r in shard_manifest(union, "doc_id", "n_bytes").collect()}
    got = {r["shard_id"]: r for r in man.manifest().collect()}
    assert set(got) == set(ref)
    for sid in ref:
        for col in ("n_docs", "total_bytes", "pos_min", "pos_max",
                    "contiguous", "checksum"):
            assert got[sid][col] == ref[sid][col], (sid, col)

    # restart memory: a fresh instance over the same state dir agrees
    man2 = IngestManifest(spark, str(tmp_path), "doc_id", "n_bytes")
    got2 = {r["shard_id"]: r for r in man2.manifest().collect()}
    assert {k: v["checksum"] for k, v in got2.items()} == {
        k: v["checksum"] for k, v in got.items()
    }

    # compact folds losslessly
    n_rows = man.compact()
    assert n_rows == len(ref)
    got3 = {r["shard_id"]: r for r in man.manifest().collect()}
    for sid in ref:
        assert got3[sid]["checksum"] == ref[sid]["checksum"]
        assert got3[sid]["n_docs"] == ref[sid]["n_docs"]


def test_curriculum_shards_progression_and_balance(spark):
    """Every shard receives exactly one item per full round (dense pos),
    within-shard read order is monotone in difficulty band, NULL scores
    land in the final +inf band, and the layout is a pure function of
    the input multiset (partitioning-independent)."""
    from kafka_denormalization_spark.operators.sharding import (
        curriculum_shards,
    )

    rows = [(i, float(i % 7) + (i % 3) * 0.01) for i in range(37)]
    rows += [(100 + i, None) for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, score double")
    out = {r["doc_id"]: r for r in curriculum_shards(df, "doc_id", "score", n_shards=4).collect()}
    assert set(out) == {i for i, _ in rows}
    # NULL scores -> +inf band, at the end of the curriculum
    import math
    for i in range(5):
        assert math.isinf(out[100 + i]["band"])
    max_pos = max(r["pos"] for r in out.values())
    inf_pos = min(out[100 + i]["pos"] for i in range(5))
    assert inf_pos >= max_pos - 2  # tail rounds
    # per-shard: pos dense from 0, band monotone nondecreasing in pos
    from collections import defaultdict
    by_shard = defaultdict(list)
    for r in out.values():
        by_shard[r["shard_id"]].append((r["pos"], r["band"]))
    for sid, items in by_shard.items():
        items.sort()
        assert [p for p, _ in items] == list(range(len(items)))
        bands = [b for _, b in items]
        assert bands == sorted(bands)
    # partitioning independence
    out2 = {
        r["doc_id"]: (r["shard_id"], r["pos"])
        for r in curriculum_shards(
            df.repartition(7), "doc_id", "score", n_shards=4
        ).collect()
    }
    assert out2 == {k: (v["shard_id"], v["pos"]) for k, v in out.items()}


def test_ingest_shard_writer_e2e(spark, tmp_path):
    """Streaming shard materialization: three batches -> appended shard
    directories + maintained manifest; verify() proves disk == manifest,
    a deleted data file surfaces as a mismatch row, and a restarted
    writer continues positions/files/manifest seamlessly."""
    import glob
    import json
    import os

    from kafka_denormalization_spark.streaming.ingest_shard import (
        IngestShardWriter,
    )

    out_dir = str(tmp_path / "out")
    schema = "doc_id long, n_bytes long, pos long"
    w = IngestShardWriter(
        spark, str(tmp_path / "state"), out_dir, "doc_id", "n_bytes",
        n_shards=3,
    )
    w.process_batch(
        spark.createDataFrame(
            [(i, 100 + i) for i in range(8)], "doc_id long, n_bytes long"
        )
    )
    w.process_batch(
        spark.createDataFrame(
            [(i, 100 + i) for i in range(8, 20)], "doc_id long, n_bytes long"
        )
    )
    assert w.verify(schema).count() == 0

    # restart: a fresh writer over the same dirs continues the build
    w2 = IngestShardWriter(
        spark, str(tmp_path / "state"), out_dir, "doc_id", "n_bytes",
        n_shards=3,
    )
    w2.process_batch(
        spark.createDataFrame(
            [(i, 100 + i) for i in range(20, 25)], "doc_id long, n_bytes long"
        )
    )
    assert w2.verify(schema).count() == 0

    # every input doc is on disk exactly once, positions dense per shard
    rows = []
    for d in glob.glob(f"{out_dir}/shard_id=*"):
        sid = int(d.rsplit("=", 1)[1])
        for f in glob.glob(f"{d}/part-*"):
            if f.endswith(".crc"):
                continue
            with open(f) as fh:
                rows += [(sid, json.loads(line)) for line in fh]
    assert sorted(r["doc_id"] for _, r in rows) == list(range(25))
    by_shard: dict[int, list[int]] = {}
    for sid, r in rows:
        by_shard.setdefault(sid, []).append(r["pos"])
    for sid, ps in by_shard.items():
        assert sorted(ps) == list(range(len(ps))), sid

    # tamper: removing one data file must break verification
    victim = next(
        f
        for f in glob.glob(f"{out_dir}/shard_id=*/part-*")
        if not f.endswith(".crc")
    )
    os.remove(victim)
    crc = os.path.join(
        os.path.dirname(victim), "." + os.path.basename(victim) + ".crc"
    )
    if os.path.exists(crc):
        os.remove(crc)
    assert w2.verify(schema).count() >= 1


# -- z-order layout ----------------------------------------------------------

from kafka_denormalization_spark.operators.sharding import (  # noqa: E402
    morton_interleave,
    z_order_plan,
    z_order_stats,
)


def test_morton_interleave_known_values(spark):
    # a=0b101, b=0b011 -> even bits from a (1,0,1), odd from b (1,1,0):
    # z = 1 + 2 + 0 + 8 + 16 + 0 = 0b011011 = 27
    df = spark.range(1).select(
        morton_interleave(F.lit(5).cast("long"), F.lit(3).cast("long")).alias("z")
    )
    assert df.collect()[0]["z"] == 27
    # interleave of (max, max) at 16 bits fills all 32 low bits
    df2 = spark.range(1).select(
        morton_interleave(
            F.lit(65535).cast("long"), F.lit(65535).cast("long")
        ).alias("z")
    )
    assert df2.collect()[0]["z"] == (1 << 32) - 1


def _grid(spark, n=32):
    # n x n grid of (x, y) points, id = row-major index
    return spark.range(n * n).select(
        F.col("id"),
        (F.col("id") % n).alias("x"),
        F.expr(f"id DIV {n}").cast("long").alias("y"),
    )


def test_z_order_plan_matches_global_sort(spark):
    """Banded rank decomposition == a plain global (z, id) sort."""
    g = _grid(spark)
    plan = z_order_plan(g, "id", "x", "y", rows_per_shard=64).collect()
    by_rank = sorted(plan, key=lambda r: (r["z"], r["id"]))
    for rank, r in enumerate(by_rank):
        assert r["shard_id"] == rank // 64
        assert r["pos"] == rank % 64
    # bijective layout
    assert len({(r["shard_id"], r["pos"]) for r in plan}) == len(plan)


def test_z_order_plan_partitioning_invariant(spark):
    g = _grid(spark)
    a = sorted(
        z_order_plan(g, "id", "x", "y", rows_per_shard=100).collect(),
        key=lambda r: r["id"],
    )
    b = sorted(
        z_order_plan(
            g.repartition(13), "id", "x", "y", rows_per_shard=100
        ).collect(),
        key=lambda r: r["id"],
    )
    assert [(r["id"], r["z"], r["shard_id"], r["pos"]) for r in a] == [
        (r["id"], r["z"], r["shard_id"], r["pos"]) for r in b
    ]


def test_z_order_envelopes_tighter_than_hash_layout(spark):
    """The point of the curve: contiguous z-chunks cover small
    rectangles of BOTH dims; a hash layout's per-shard envelopes span
    ~the full domain. Compare summed envelope areas on a 32x32 grid."""
    g = _grid(spark)
    zplan = z_order_plan(g, "id", "x", "y", rows_per_shard=64)
    zs = z_order_stats(zplan, "x", "y").collect()
    z_area = sum(
        (r["a_max"] - r["a_min"] + 1) * (r["b_max"] - r["b_min"] + 1)
        for r in zs
    )
    hplan = shard_plan(g, "id", n_shards=16)
    hs = (
        hplan.groupBy("shard_id")
        .agg(
            F.min("x").alias("a_min"), F.max("x").alias("a_max"),
            F.min("y").alias("b_min"), F.max("y").alias("b_max"),
        )
        .collect()
    )
    h_area = sum(
        (r["a_max"] - r["a_min"] + 1) * (r["b_max"] - r["b_min"] + 1)
        for r in hs
    )
    # 16 shards x 64 rows: ideal z-envelopes are ~8x8=64 each (sum
    # ~1024); hash envelopes are ~the full 1024 grid EACH (sum ~16k).
    assert z_area * 4 < h_area, (z_area, h_area)


def test_z_order_degenerate_dim(spark):
    """A constant dimension normalizes to 0 everywhere and the layout
    degrades to a clean 1-D sort on the other dim."""
    g = _grid(spark, n=8).withColumn("c", F.lit(7).cast("long"))
    plan = z_order_plan(g, "id", "c", "x", rows_per_shard=16).collect()
    by_rank = sorted(plan, key=lambda r: (r["shard_id"], r["pos"]))
    xs = [r["x"] for r in by_rank]
    assert xs == sorted(xs)


def test_z_order_wide_span_no_overflow(spark):
    """ADVICE r07 #1 regression: a dimension spanning more than
    2^63/65535 (~2^47 — e.g. epoch-microseconds over >4.5 years) used
    to wrap the BIGINT product (x - min) * 65535 silently under
    non-ANSI Spark, producing wrong z-values. The DECIMAL(38,0)
    normalization must match exact Python integer arithmetic across
    the FULL signed-64-bit domain, including min/max endpoints."""
    lo, hi = -(2**63), 2**63 - 1
    xs = [lo, -(2**50), -1, 0, 1, 7, 2**40, 2**50, 2**62, hi]
    rows = [(i, x, i % 4) for i, x in enumerate(xs)]
    g = spark.createDataFrame(rows, "id long, x long, y long")
    plan = {r["id"]: r for r in
            z_order_plan(g, "id", "x", "y", rows_per_shard=4).collect()}

    def norm(v, mn, mx):
        return (v - mn) * 65535 // (mx - mn) if mx > mn else 0

    def morton(a, b):
        z = 0
        for i in range(16):
            z |= ((a >> i) & 1) << (2 * i)
            z |= ((b >> i) & 1) << (2 * i + 1)
        return z

    expect = {
        i: morton(norm(x, lo, hi), norm(i % 4, 0, 3))
        for i, x in enumerate(xs)
    }
    got = {i: plan[i]["z"] for i in expect}
    assert got == expect, (got, expect)


def test_z_order_prune_beats_hash_layout(spark):
    from kafka_denormalization_spark.operators.sharding import z_order_prune

    g = _grid(spark)
    bounds = g.agg(
        F.min(F.col("x").cast("long")).alias("_amn"),
        F.max(F.col("x").cast("long")).alias("_amx"),
        F.min(F.col("y").cast("long")).alias("_bmn"),
        F.max(F.col("y").cast("long")).alias("_bmx"),
    )
    zplan = z_order_plan(g, "id", "x", "y", rows_per_shard=64)
    zs = z_order_stats(zplan, "x", "y")
    zp = {r["probe_id"]: r for r in z_order_prune(zs, bounds, 4).collect()}
    assert all(r["n_shards"] == 16 for r in zp.values())
    # aligned quadrant probes on a 32x32 grid: most z-shards prune
    assert sum(r["prune_frac_r"] for r in zp.values()) / 4 >= 0.5
    # the hash layout's envelopes span the domain: nothing prunes
    hplan = shard_plan(g, "id", n_shards=16)
    hs = (
        hplan.groupBy("shard_id")
        .agg(
            F.min("x").alias("a_min"), F.max("x").alias("a_max"),
            F.min("y").alias("b_min"), F.max("y").alias("b_max"),
        )
    )
    hp = z_order_prune(hs, bounds, 4).collect()
    assert all(r["prune_frac_r"] == 0.0 for r in hp)
