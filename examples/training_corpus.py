"""End-to-end training-corpus build: the LLM-data-pipeline API surface in
one runnable script.

Stages (each also an oracle-checked ``queries()`` entry):
  1. ingest metrics       (operators.observe — free, in-job)
  2. Gopher quality rules (functions.text.gopher_quality_flags)
  3. transitive near-dedup (MinHash-LSH pairs -> connected components)
  4. decontamination      (functions.text.contamination_scan_join)
  5. per-source mix sampling (operators.sampling.stratified_sample)
  6. chunk + pack         (operators.chunking — 64-token chunks into
                           256-token context windows)
  7. shard + materialize  (operators.sharding.shard_plan_bytes ->
                           sources.corpus_io JSONL write, read-back,
                           manifest verification — the loader handoff)

Everything composes into lazy DataFrames; the only materializations are
the ``show``s and the shard write at the end.

Run: python examples/training_corpus.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from kafka_denormalization_spark.engine import get_spark, table
from kafka_denormalization_spark.functions.graph import connected_components
from kafka_denormalization_spark.functions.similarity import minhash_lsh_pairs
from kafka_denormalization_spark.functions.text import (
    contamination_scan_join,
    gopher_quality_flags,
)
from kafka_denormalization_spark.operators.chunking import chunk_documents, pack_chunks
from kafka_denormalization_spark.operators.observe import observe_corpus_metrics
from kafka_denormalization_spark.operators.sampling import stratified_sample

BENCHMARK_NEEDLES = ["hash join", "slow query"]
MIX = {"src0": 0.75, "src1": 0.5}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark()

    docs, obs = observe_corpus_metrics(table(spark, sf_dir, "documents"), "text")

    flags = gopher_quality_flags(F.col("text"))
    keep = F.lit(True)
    for c in flags.values():
        keep = keep & c
    quality = docs.filter(keep)

    pairs = minhash_lsh_pairs(docs, "doc_id", "text", n=3, num_hashes=64, bands=32)
    comps = connected_components(pairs, src="id_a", dst="id_b")
    dropped = comps.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias("doc_id")
    )
    deduped = quality.join(F.broadcast(dropped), ["doc_id"], "left_anti")

    contaminated = contamination_scan_join(
        deduped, "doc_id", "text", BENCHMARK_NEEDLES
    ).select("doc_id").dropDuplicates()
    clean = deduped.join(F.broadcast(contaminated), ["doc_id"], "left_anti")

    sampled = stratified_sample(clean, "source", MIX, "doc_id", 0.25, "mix1")

    chunks = chunk_documents(sampled, "doc_id", "text", chunk_tokens=64).join(
        sampled.select("doc_id", "source"), ["doc_id"]
    )
    packed = pack_chunks(chunks, "source", ["doc_id", "chunk_id"], budget=256)

    packed.select(
        "source", "pack_id", "doc_id", "chunk_id", "n_tokens", "pack_offset"
    ).orderBy("source", "pack_id", "pack_offset").show(10, truncate=False)
    packed.groupBy("source").agg(
        F.countDistinct("pack_id").alias("n_packs"),
        F.sum("n_tokens").alias("total_tokens"),
    ).orderBy("source").show()

    # 7. loader handoff: byte-balanced shard layout -> one ordered JSONL
    # file per shard -> read back -> verify the manifest before trusting it
    import tempfile

    from kafka_denormalization_spark.operators.sharding import shard_plan_bytes
    from kafka_denormalization_spark.sources.corpus_io import (
        read_corpus_shards,
        verify_corpus_shards,
        write_corpus_shards,
    )

    plan = shard_plan_bytes(sampled, "doc_id", "n_chars", n_shards=4).select(
        "doc_id", "text", "lang", "source", "n_chars", "shard_id", "pos"
    )
    out_dir = tempfile.mkdtemp(prefix="corpus_shards_")
    write_corpus_shards(plan, out_dir, n_shards=4, fmt="jsonl")
    back = read_corpus_shards(
        spark,
        out_dir,
        schema=(
            "doc_id long, text string, lang string, source string, "
            "n_chars long, pos long"
        ),
    )
    mismatches = verify_corpus_shards(back, plan, "doc_id", "n_chars").count()
    print(f"shards written to {out_dir}; manifest mismatches: {mismatches}")
    print("ingest metrics:", obs.get)


if __name__ == "__main__":
    main()
