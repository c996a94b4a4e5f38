"""Document chunking + sequence packing for training-data preparation.

Chunking splits each document into fixed-token-budget windows (optionally
overlapping) — the unit LLM pipelines tokenize and pack. Packing assigns
chunks to fixed-size context windows with concat-and-cut semantics (the
standard pretraining layout: concatenate the corpus stream, slice every
``budget`` tokens).

Both are pure Catalyst expression chains — sequence/slice/explode for
chunking, one window cumsum for packing — with EXACT integer arithmetic
throughout, so the DuckDB oracles match bitwise. Packing partitions by
``source`` so no single window partition absorbs the whole corpus (the
global-order variant would serialize on one task at 100 TB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kafka_denormalization_spark.functions.text import tokens


def chunk_documents(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    chunk_tokens: int = 64,
    overlap: int = 0,
) -> DataFrame:
    """(id, chunk_id, chunk_text, n_tokens) rows; chunk ``i`` covers
    whitespace tokens [i*step, i*step + chunk_tokens), step = chunk -
    overlap. Short documents produce a single (possibly small) chunk."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    step = chunk_tokens - overlap
    toks = tokens(F.col(text_col))
    wc = F.size(toks)
    n_chunks = F.greatest(
        F.lit(1), F.floor((wc - F.lit(overlap) + F.lit(step - 1)) / F.lit(step))
    ).cast("int")
    with_toks = docs.select(
        F.col(id_col).alias("_id"),
        toks.alias("_w"),
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_id"),
    )
    sliced = F.slice(
        F.col("_w"), F.col("chunk_id") * step + 1, F.lit(chunk_tokens)
    )
    return with_toks.select(
        F.col("_id").alias(id_col),
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.array_join(sliced, " ").alias("chunk_text"),
        F.size(sliced).cast("long").alias("n_tokens"),
    )


def pack_chunks(
    chunks: DataFrame,
    part_col: str,
    order_cols: list[str],
    token_col: str = "n_tokens",
    budget: int = 256,
) -> DataFrame:
    """Concat-and-cut packing: within each ``part_col`` stream (ordered by
    ``order_cols``), a chunk starting at cumulative token offset ``s``
    lands in pack ``s // budget`` at offset ``s % budget``. One window
    cumsum per partition — no iterative bin state, no driver loop."""
    w = Window.partitionBy(part_col).orderBy(*order_cols)
    cum_end = F.sum(F.col(token_col)).over(w)
    out_cols = chunks.columns
    staged = chunks.select(
        "*", (cum_end - F.col(token_col)).cast("long").alias("_start")
    )
    # Integral DIV, not floor(double division): cumulative offsets can exceed
    # 2^53 at corpus scale, where the double round-trip silently loses bits.
    return staged.select(
        *out_cols,
        F.expr(f"_start DIV {int(budget)}").alias("pack_id"),
        (F.col("_start") % F.lit(budget)).cast("long").alias("pack_offset"),
    )


def span_dedup(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    chunk_tokens: int = 16,
) -> DataFrame:
    """Corpus-level exact-substring deduplication at fixed chunk
    granularity — the scalable approximation of Lee et al. 2021
    ("Deduplicating Training Data Makes Language Models Better")
    ExactSubstr: any ``chunk_tokens``-token span that occurs more than
    once in the corpus survives only at its globally-first occurrence
    (minimum (doc id, chunk index)); every document is reassembled from
    its surviving chunks. Catches cross-document boilerplate and copied
    runs that document-level dedup misses.

    Plan shape (100 TB): chunking is a narrow sequence/slice/explode;
    the first-occurrence winner per span is ONE partial-agg groupBy on
    the md5 span digest — ``min(struct(id, chunk, text))`` carries the
    winning span's text through the aggregate itself, so there is no
    join-back, no window over the digest (hot boilerplate spans are
    absorbed map-side by the combiner, where a window partition would
    concentrate them), and the chunk frame has exactly one consumer (no
    recompute/persist dilemma). Reassembly is a second groupBy on doc
    id; the final left join restores fully-deduplicated docs as empty
    text. Exact integer/string arithmetic end-to-end — the DuckDB
    oracle matches bitwise.

    Output: (id_col, text_dedup, n_chunks, n_dropped) — one row per
    input document.
    """
    chunks = chunk_documents(docs, id_col, text_col, chunk_tokens, overlap=0)
    ch = chunks.select(
        F.col(id_col),
        "chunk_id",
        "chunk_text",
        F.md5("chunk_text").alias("_h"),
    )
    first = ch.groupBy("_h").agg(
        F.min(
            F.struct(
                F.col(id_col).alias("i"),
                F.col("chunk_id").alias("c"),
                F.col("chunk_text").alias("t"),
            )
        ).alias("_k")
    )
    kept = first.select(
        F.col("_k.i").alias(id_col),
        F.col("_k.c").alias("chunk_id"),
        F.col("_k.t").alias("chunk_text"),
    )
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.sort_array(
                    F.collect_list(
                        F.struct(
                            F.col("chunk_id").alias("c"),
                            F.col("chunk_text").alias("t"),
                        )
                    )
                ),
                lambda s: s.getField("t"),
            ),
            " ",
        ).alias("text_dedup"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    wc = F.size(tokens(F.col(text_col)))
    n_chunks = F.greatest(
        F.lit(1), F.floor((wc + F.lit(chunk_tokens - 1)) / F.lit(chunk_tokens))
    ).cast("long")
    return (
        docs.select(F.col(id_col), n_chunks.alias("n_chunks"))
        .join(rebuilt, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("text_dedup"), F.lit("")).alias("text_dedup"),
            F.col("n_chunks"),
            (F.col("n_chunks") - F.coalesce(F.col("n_kept"), F.lit(0)))
            .cast("long")
            .alias("n_dropped"),
        )
    )
