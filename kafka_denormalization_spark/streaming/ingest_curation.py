"""Continuous-ingest CURATION — the composed streaming face of the
batch ``corpus_to_shards`` chain (queries.py), wiring the four
continuous-ingest twins into ONE ``foreachBatch`` pipeline:

    span dedup (IngestSpanDedup)
      -> mostly-duplicated gate (stateless, the v3 "kept" rule:
         2 * n_dropped <= n_chunks AND non-empty rebuilt text)
      -> optional stateless doc filter (see below)
      -> exact content dedup (IngestDedup, on the REBUILT text)
      -> near dedup (IngestNearDedup, MinHash-LSH vs all survivors)
      -> shard layout (IngestShard, durable per-shard positions)

Each stage keeps its own durable state under one shared ``state_dir``
(disjoint subdirectories), so a restart resumes every stage at once —
the composed pipeline inherits the per-stage restart guarantees the
individual twins already test.

Corpus-GLOBAL stages of the batch chain (the bigram-LM perplexity gate
and the temperature mix) are deliberately NOT incrementalized: their
models are functions of the whole corpus, so a faithful streaming
version would change past keep/drop decisions every batch. Production
streaming curation freezes those models offline and applies them as
stateless per-document filters — exactly what the ``doc_filter`` hook
is for: pass a Column predicate over the post-gate frame, or a
``DataFrame -> DataFrame`` callable for filters that need a model-table
lookup (e.g. a frozen-LM cutoff scored through
``functions/text.py lm_score_with_model`` over parquet-frozen model
tables — vocab-bounded, broadcast by AQE; tests/test_ingest_curation.py
exercises exactly that pattern end-to-end). The batch
``corpus_to_shards`` remains the canonical from-scratch build (same
deviation contract as IngestShard's append-offset positions).

Exactly-once: IngestShard's counter state is the one non-idempotent
piece under epoch replay, so the composed ``foreach_batch`` wants the
same ``streaming/sinks.py idempotent_foreach_batch`` wrapper as every
other foreachBatch pipeline here.

Reference parity: the reference's ingest path is poll -> enrich ->
produce with no curation at all (services/stories.py:25-44); this is
the north-star extension composed end-to-end.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_denormalization_spark.streaming.ingest_dedup import (
    IngestDedup,
    IngestNearDedup,
    IngestSpanDedup,
)
from kafka_denormalization_spark.streaming.ingest_shard import IngestShard


class IngestCuration:
    """Composed continuous curation with durable per-stage state.

    ``process_batch(batch_df)`` returns the batch's shipped rows:
    (id_col, text_dedup, n_chunks, n_dropped, shard_id, pos).
    """

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        id_col: str,
        text_col: str,
        n_shards: int = 8,
        chunk_tokens: int = 16,
        near_threshold: float = 0.5,
        doc_filter=None,
        pre_transform=None,
        shard_salt: str = "shard",
        n_buckets: int = 32,
    ) -> None:
        self.id_col = id_col
        self.doc_filter = doc_filter
        # stateless batch_df -> batch_df rewrite applied BEFORE the span
        # stage — the hook for frozen corpus-rewriting models (e.g. the
        # boilerplate heavy-line strip, functions/text.py
        # line_dedup_with_lines over a parquet-frozen digest set). Must
        # preserve (id_col, text_col); may drop rows.
        self.pre_transform = pre_transform
        self.span = IngestSpanDedup(
            spark, state_dir, id_col, text_col, chunk_tokens, n_buckets
        )
        self.exact = IngestDedup(
            spark, state_dir, id_col, "text_dedup", n_buckets
        )
        self.near = IngestNearDedup(
            spark,
            state_dir,
            id_col,
            "text_dedup",
            threshold=near_threshold,
            n_buckets=n_buckets,
        )
        self.shard = IngestShard(
            spark, state_dir, id_col, n_shards, shard_salt
        )

    def process_batch(self, batch_df: DataFrame, epoch_id: int = 0) -> DataFrame:
        if self.pre_transform is not None:
            batch_df = self.pre_transform(batch_df)
        spanned = self.span.process_batch(batch_df, epoch_id)
        gated = spanned.filter(
            (F.lit(2) * F.col("n_dropped") <= F.col("n_chunks"))
            & (F.length("text_dedup") > 0)
        )
        if self.doc_filter is not None:
            if isinstance(self.doc_filter, Column):
                gated = gated.filter(self.doc_filter)
            else:
                # stateless DataFrame transformation (frozen-model
                # lookup filters); must not add or rename columns the
                # downstream stages depend on
                gated = self.doc_filter(gated)
        exact = self.exact.process_batch(gated, epoch_id)
        near = self.near.process_batch(exact, epoch_id)
        return self.shard.process_batch(near, epoch_id)

    def foreach_batch(self, sink):
        """Adapter for ``writeStream.foreachBatch``: curate each batch
        and hand the shipped rows to ``sink(df, epoch_id)``."""

        def fn(batch_df: DataFrame, epoch_id: int) -> None:
            sink(self.process_batch(batch_df, epoch_id), epoch_id)

        return fn

    def compact(self) -> dict[str, int]:
        """Compact every stage's state between batches."""
        stats: dict[str, int] = {}
        for stage in (self.span, self.exact, self.near):
            stats.update(stage.compact())
        stats["shard_counters"] = self.shard.compact()
        return stats
