"""Continuous-ingest MULTIMODAL near-dedup — the streaming face of the
image/audio/video retention family (functions/multimodal.py
``_sig_keep_min``): per micro-batch, fingerprint the incoming blobs,
find Hamming-ball candidates against every signature that ever
survived (pigeonhole banding: distance <= 3 over four 16-bit bands
implies at least one band matches exactly — zero false negatives),
verify with the exact popcount, and drop batch blobs dominated by an
earlier survivor (or a smaller id within the batch).

One class serves all three modalities because the batch family already
funnels them through one signature shape — (id, b0..b3 16-bit bands):
``image_dhash``, ``audio_fingerprint``, and ``video_fingerprint`` are
interchangeable ``fingerprint`` callables.

Durable state (hash-bucket-partitioned parquet, both reads
partition-pruned to the batch's touched partitions — the
ingest_dedup.py layout):

- ``band_rows/``: (_id, _bi, _bv, part) — one row per (survivor, band);
  candidate lookup is one equi-join on (_bi, _bv).
- ``sigs/``: (_id, b0..b3, part) — the popcount-verify side, pruned to
  candidate ids only, so verify reads are bounded by candidates, not
  survivor history.

Scale notes: blobs decode exactly once (in the batch's fingerprint
pass) and NEVER enter state — state is 4+5 longs per survivor. The
hot-bucket guard of the batch path is deliberately absent: the
streaming candidate join is batch-bands x state-bands, so per-batch
candidate volume is (batch band width) x (state band width) — bounded
by the BATCH size on one side, which is the guard the batch path
lacks. A pathological corpus where one band value accumulates millions
of STATE survivors would still want the band-seeded split; at that
point pre-collapse exact duplicates per batch (``_sig_keep_min``'s
rep trick) before ingesting — documented, not silently capped.

Exactly-once: state appends are set-semantics idempotent under epoch
replay (re-appending a survivor's rows changes no decision); wrap the
sink with streaming/sinks.py idempotent_foreach_batch for emit dedup.

Reference parity: none — the reference engine has no media surface;
this is the north-star extension's multimodal lane (SURVEY.md §2.3).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException


class IngestSigDedup:
    """Streaming fingerprint near-dedup with durable signature state.

    ``fingerprint``: DataFrame -> DataFrame mapping a batch of blobs to
    (id_col, b0..b3) signature rows — ``image_dhash``,
    ``audio_fingerprint`` or ``video_fingerprint`` (or None when the
    batch already carries b0..b3). ``process_batch`` returns the
    batch's surviving ORIGINAL rows (untouched schema).
    """

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        id_col: str = "id",
        fingerprint=None,
        hamming_max: int = 3,
        n_buckets: int = 32,
    ) -> None:
        if not 0 <= hamming_max <= 3:
            raise ValueError(
                "hamming_max must be in [0, 3]: 4-band pigeonhole "
                "blocking only guarantees recall through distance 3"
            )
        self.spark = spark
        self.id_col = id_col
        self.fingerprint = fingerprint
        self.hamming_max = hamming_max
        self.n_buckets = n_buckets
        self._bands_dir = os.path.join(state_dir, "band_rows")
        self._sigs_dir = os.path.join(state_dir, "sigs")

    def _part(self, col):
        return F.pmod(F.xxhash64(col), F.lit(self.n_buckets)).cast("int")

    def _read_state(self, path: str, schema: str, prune: DataFrame) -> DataFrame:
        try:
            df = self.spark.read.schema(schema).parquet(path)
        except AnalysisException:
            return self.spark.createDataFrame([], schema)
        return df.join(
            F.broadcast(prune.filter(F.col("part") >= 0)), on="part", how="left_semi"
        )

    @staticmethod
    def _ham(a_prefix: str, b_prefix: str):
        return sum(
            F.bit_count(
                F.col(f"{a_prefix}{c}").bitwiseXOR(F.col(f"{b_prefix}{c}"))
            )
            for c in ("b0", "b1", "b2", "b3")
        ).cast("long")

    def process_batch(self, batch_df: DataFrame, epoch_id: int = 0) -> DataFrame:
        id_col = self.id_col
        sig_src = (
            self.fingerprint(batch_df) if self.fingerprint is not None else batch_df
        )
        sig = (
            sig_src.select(
                F.col(id_col).alias("_id"), "b0", "b1", "b2", "b3"
            )
            .localCheckpoint(eager=True)
        )
        bands = sig.select(
            "_id",
            F.posexplode(F.array("b0", "b1", "b2", "b3")).alias("_bi", "_bv"),
        ).withColumn(
            "part", self._part(F.concat_ws("#", F.col("_bi"), F.col("_bv")))
        ).localCheckpoint(eager=True)

        state_bands = self._read_state(
            self._bands_dir,
            "_id long, _bi int, _bv long, part int",
            bands.select("part").distinct(),
        )
        nb, sb = bands.alias("a"), state_bands.alias("b")
        cross_cand = (
            nb.join(
                sb,
                (F.col("a._bi") == F.col("b._bi"))
                & (F.col("a._bv") == F.col("b._bv")),
            )
            .select(F.col("b._id").alias("id_a"), F.col("a._id").alias("id_b"))
            .distinct()
        )
        wa, wb = bands.alias("a"), bands.alias("b")
        within_cand = (
            wa.join(
                wb,
                (F.col("a._bi") == F.col("b._bi"))
                & (F.col("a._bv") == F.col("b._bv"))
                & (F.col("a._id") < F.col("b._id")),
            )
            .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
            .distinct()
        ).localCheckpoint(eager=True)
        cross_cand = cross_cand.localCheckpoint(eager=True)

        # verify: batch side from sig, state side pruned to candidates
        cand_ids = cross_cand.select(F.col("id_a").alias("_id")).distinct()
        state_sigs = self._read_state(
            self._sigs_dir,
            "_id long, b0 long, b1 long, b2 long, b3 long, part int",
            cand_ids.select(self._part(F.col("_id")).alias("part")).distinct(),
        ).join(cand_ids, "_id", "left_semi")
        a_side = state_sigs.select(
            F.col("_id").alias("id_a"),
            *[F.col(c).alias(f"_a{c}") for c in ("b0", "b1", "b2", "b3")],
        )
        batch_a = sig.select(
            F.col("_id").alias("id_a"),
            *[F.col(c).alias(f"_a{c}") for c in ("b0", "b1", "b2", "b3")],
        )
        b_side = sig.select(
            F.col("_id").alias("id_b"),
            *[F.col(c).alias(f"_b{c}") for c in ("b0", "b1", "b2", "b3")],
        )
        thr = self._ham("_a", "_b") <= self.hamming_max
        dup_vs_base = (
            cross_cand.join(a_side, "id_a")
            .join(b_side, "id_b")
            .filter(thr)
            .select(F.col("id_b").alias(id_col))
            .distinct()
        )
        dup_within = (
            within_cand.join(batch_a, "id_a")
            .join(b_side, "id_b")
            .filter(thr)
            .select(F.col("id_b").alias(id_col))
            .distinct()
        )
        dropped = dup_vs_base.unionByName(dup_within).distinct()
        survivors = batch_df.join(dropped, [id_col], "left_anti").localCheckpoint(
            eager=True
        )
        surv_ids = survivors.select(F.col(id_col).alias("_id"))
        (
            bands.join(surv_ids, "_id", "left_semi")
            .select("_id", "_bi", "_bv", "part")
            .write.mode("append")
            .partitionBy("part")
            .parquet(self._bands_dir)
        )
        (
            sig.join(surv_ids, "_id", "left_semi")
            .select(
                "_id", "b0", "b1", "b2", "b3",
                self._part(F.col("_id")).alias("part"),
            )
            .write.mode("append")
            .partitionBy("part")
            .parquet(self._sigs_dir)
        )
        return survivors

    def foreach_batch(self, sink):
        """Adapter for ``writeStream.foreachBatch``."""

        def fn(batch_df: DataFrame, epoch_id: int) -> None:
            sink(self.process_batch(batch_df, epoch_id), epoch_id)

        return fn

    def compact(self) -> dict[str, int]:
        """Rewrite both state tables to one file per partition."""
        from kafka_denormalization_spark.streaming.ingest_dedup import (
            _compact_all,
        )

        return _compact_all(
            self.spark,
            [
                (self._bands_dir, "_id long, _bi int, _bv long, part int", "part"),
                (
                    self._sigs_dir,
                    "_id long, b0 long, b1 long, b2 long, b3 long, part int",
                    "part",
                ),
            ],
        )


class IngestSceneKeyframes:
    """Streaming scene/keyframe twin of the batch video family
    (VERDICT r10 #5): per micro-batch, scene cuts and keyframe hashes
    are STATELESS 1->N decode work (``video_scene_cuts`` /
    ``video_keyframe_hash`` run as-is inside the batch — blobs decode
    once, in the scan, and never enter state); the keyframe hashes then
    feed the EXISTING signature-dedup state (``IngestSigDedup`` over
    the 14-bit-band decomposition of the 56-bit khash), so only
    first-seen distinct keyframes survive across the whole stream.

    ``process_batch`` returns (scenes, keyframes): the batch's full
    scene table (stateless — every scene of every batch clip) and its
    SURVIVING keyframes (id, scene_idx, frame_idx, khash) after the
    cross-batch near-dedup. State is 9 longs per surviving keyframe.
    """

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        id_col: str = "id",
        blob_col: str = "blob",
        hamming_max: int = 3,
        n_buckets: int = 32,
        num: int = 13,
        den: int = 10,
    ) -> None:
        self.id_col = id_col
        self.blob_col = blob_col
        self.num = num
        self.den = den
        self._sig = IngestSigDedup(
            spark, state_dir, "kid",
            fingerprint=None, hamming_max=hamming_max, n_buckets=n_buckets,
        )

    def process_batch(self, batch_df: DataFrame, epoch_id: int = 0):
        from kafka_denormalization_spark.functions.multimodal import (
            KEYFRAME_ID_SHIFT,
            keyframe_sig,
            video_keyframe_hash,
            video_scene_cuts,
        )

        scenes = video_scene_cuts(
            batch_df, self.id_col, self.blob_col, self.num, self.den
        ).localCheckpoint(eager=True)
        kf = video_keyframe_hash(
            batch_df, self.id_col, self.blob_col, self.num, self.den
        ).localCheckpoint(eager=True)
        surviving_sigs = self._sig.process_batch(keyframe_sig(kf, self.id_col))
        keep = surviving_sigs.select("kid")
        survivors = (
            kf.withColumn(
                "kid",
                F.col(self.id_col) * F.lit(KEYFRAME_ID_SHIFT)
                + F.col("scene_idx"),
            )
            .join(keep, "kid", "left_semi")
            .drop("kid")
        )
        return scenes, survivors

    def foreach_batch(self, scene_sink, keyframe_sink):
        """Adapter for ``writeStream.foreachBatch`` with two sinks."""

        def fn(batch_df: DataFrame, epoch_id: int) -> None:
            scenes, survivors = self.process_batch(batch_df, epoch_id)
            scene_sink(scenes, epoch_id)
            keyframe_sink(survivors, epoch_id)

        return fn

    def compact(self) -> dict[str, int]:
        return self._sig.compact()


class IngestResizeDedup:
    """Streaming twin of the batch multimodal lane's FIRST stage
    (VERDICT r11 #6; queries.py q_multimodal_to_shards): stateless
    exact-integer RESIZE to the encoder geometry (resize_images — 1->1
    per batch, no state, blobs decode once in the scan) feeding the
    durable signature near-dedup state (``IngestSigDedup`` over the
    resized thumbnails' dHash).

    ``process_batch`` returns the batch's SURVIVING resized rows
    (id_col, blob [FAKB out_w x out_h], width, height) — the
    normalize-then-dedup lane a streamed multimodal ingest runs.
    Because DIV-grid area pooling composes exactly for exact-multiple
    geometries (dhash(resize(img)) == dhash(img) — the
    test_dhash_invariant_under_exact_resize pin), the survivor ID set
    equals the batch chain resize -> image_phash_dedup over the union
    whenever ids arrive in monotone order (the ingest_dedup min-key
    equivalence regime).
    """

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        id_col: str = "id",
        blob_col: str = "blob",
        out_w: int = 9,
        out_h: int = 8,
        hamming_max: int = 3,
        n_buckets: int = 32,
    ) -> None:
        self.id_col = id_col
        self.blob_col = blob_col
        self.out_w = out_w
        self.out_h = out_h
        self._sig = IngestSigDedup(
            spark,
            state_dir,
            id_col,
            fingerprint=self._fingerprint,
            hamming_max=hamming_max,
            n_buckets=n_buckets,
        )

    def _fingerprint(self, resized: DataFrame) -> DataFrame:
        from kafka_denormalization_spark.functions.multimodal import (
            image_dhash,
        )

        return image_dhash(resized, self.id_col, self.blob_col)

    def process_batch(self, batch_df: DataFrame, epoch_id: int = 0) -> DataFrame:
        from kafka_denormalization_spark.functions.multimodal import (
            resize_images,
        )

        # resize once per batch; survivors ship the thumbnail (the
        # full-resolution blob stays in the batch scan, never in state)
        resized = resize_images(
            batch_df, self.id_col, self.blob_col, self.out_w, self.out_h
        ).localCheckpoint(eager=True)
        return self._sig.process_batch(resized, epoch_id)

    def foreach_batch(self, sink):
        """Adapter for ``writeStream.foreachBatch``."""

        def fn(batch_df: DataFrame, epoch_id: int) -> None:
            sink(self.process_batch(batch_df, epoch_id), epoch_id)

        return fn

    def compact(self) -> dict[str, int]:
        return self._sig.compact()
