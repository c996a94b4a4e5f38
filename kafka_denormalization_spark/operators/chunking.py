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


def exact_substr_dedup(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    window_tokens: int = 16,
) -> DataFrame:
    """Rolling-window exact-substring deduplication — the stride-1
    strengthening of ``span_dedup`` and the closest Spark-native
    equivalent of Lee et al. 2021 ExactSubstr (suffix-array variant):
    EVERY ``window_tokens``-token window (all starts, not just
    chunk-aligned ones) is digested; a token survives iff at least one
    window covering it is that window-text's globally-first occurrence
    (minimum (doc id, start)). Chunk-aligned span_dedup misses
    duplicated runs that straddle chunk boundaries or start mid-chunk;
    this catches them all at window granularity. Documents shorter than
    the window carry no window and survive intact (spans below the
    match-length threshold are not dedup candidates — same rule as the
    suffix-array ExactSubstr length cutoff).

    Plan shape (100 TB): the window explode is ~n rows/doc (not the
    naive n*W token-coverage explode — W-fold amplification avoided two
    ways). First-occurrence is the same single partial-agg groupBy
    (md5 digest -> min(struct(id, start))) as span_dedup — hot
    boilerplate digests are absorbed map-side. Kept windows then merge
    into coverage INTERVALS per doc (one per-doc window over starts:
    running max of interval end, gap starts a new group), so the kept
    token positions explode is bounded by the kept span, <= n. Per-doc
    window partitions are bounded by document length, never corpus
    width. Exact integer/string arithmetic end-to-end — the DuckDB
    oracle (which replays the naive coverage semantics) matches
    bitwise.

    Output: (id_col, text_dedup, n_tokens, n_kept) — one row per input
    document; text_dedup is '' when every token was covered only by
    duplicate windows.
    """
    if window_tokens < 2:
        raise ValueError("window_tokens must be >= 2")
    w_ = int(window_tokens)
    base, digested = substr_window_digests(docs, id_col, text_col, w_)
    # globally-first occurrence per window text: one partial-agg groupBy
    first = digested.groupBy("_h").agg(
        F.min(
            F.struct(F.col(id_col).alias("i"), F.col("_s").alias("s"))
        ).alias("_k")
    )
    kept_wins = first.select(
        F.col("_k.i").alias(id_col),
        F.col("_k.s").alias("_s"),
        (F.col("_k.s") + F.lit(w_ - 1)).alias("_e"),
    )
    return assemble_from_kept_windows(base, kept_wins, id_col, w_)


def substr_window_digests(
    docs: DataFrame, id_col: str, text_col: str, window_tokens: int
) -> tuple[DataFrame, DataFrame]:
    """Shared front half of the rolling-window substring dedup: returns
    (base, digested) where base = (id, _w tokens, _n) and digested =
    (id, _s start, _h window md5) — one row per window start for docs
    long enough to carry one. Used by the batch operator and the
    streaming twin (streaming/ingest_dedup.IngestSubstrDedup)."""
    w_ = int(window_tokens)
    toks = tokens(F.col(text_col))
    base = docs.select(
        F.col(id_col), toks.alias("_w"), F.size(toks).alias("_n")
    )
    wins = base.filter(F.col("_n") >= w_).select(
        id_col,
        "_w",
        F.explode(F.sequence(F.lit(0), F.col("_n") - w_)).alias("_s"),
    )
    digested = wins.select(
        id_col,
        "_s",
        F.md5(F.array_join(F.slice("_w", F.col("_s") + 1, w_), " ")).alias(
            "_h"
        ),
    )
    return base, digested


def assemble_from_kept_windows(
    base: DataFrame, kept_wins: DataFrame, id_col: str, w_: int
) -> DataFrame:
    """Shared back half of the rolling-window substring dedup: merge a
    doc's kept windows (id, _s, _e) into coverage intervals, explode the
    covered positions (bounded by the kept span), rebuild each doc from
    its surviving tokens; short docs (no windows) pass through intact.
    Output: (id_col, text_dedup, n_tokens, n_kept)."""
    # merge kept windows into coverage intervals: a window starts a new
    # interval when it begins past the running max end of everything
    # before it (positions inclusive, so contiguous means start <= end+1)
    ww = Window.partitionBy(id_col).orderBy("_s")
    prev_end = F.max("_e").over(
        ww.rowsBetween(Window.unboundedPreceding, -1)
    )
    grouped = kept_wins.select(
        id_col,
        "_s",
        "_e",
        F.sum(
            F.when(
                F.col("_s") > F.coalesce(prev_end, F.lit(-1)) + 1, 1
            ).otherwise(0)
        )
        .over(ww)
        .alias("_g"),
    )
    intervals = grouped.groupBy(id_col, "_g").agg(
        F.min("_s").alias("_lo"), F.max("_e").alias("_hi")
    )
    kept_pos = intervals.select(
        id_col, F.explode(F.sequence("_lo", "_hi")).alias("_p")
    )
    # rebuild: kept positions -> tokens (via the doc's token array),
    # short docs (no windows) keep everything
    rebuilt = (
        base.filter(F.col("_n") >= w_)
        .join(kept_pos, id_col)
        .groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(
                        F.collect_list(
                            F.struct(
                                F.col("_p").alias("p"),
                                F.element_at(
                                    "_w", (F.col("_p") + 1).cast("int")
                                ).alias("t"),
                            )
                        )
                    ),
                    lambda s: s.getField("t"),
                ),
                " ",
            ).alias("text_dedup"),
            F.count(F.lit(1)).alias("_kept"),
        )
    )
    return (
        base.select(
            id_col,
            F.col("_n").cast("long").alias("n_tokens"),
            F.when(F.col("_n") < w_, F.array_join("_w", " ")).alias(
                "_short_text"
            ),
        )
        .join(rebuilt, id_col, "left")
        .select(
            id_col,
            F.coalesce(
                F.col("_short_text"), F.col("text_dedup"), F.lit("")
            ).alias("text_dedup"),
            "n_tokens",
            F.when(F.col("_short_text").isNotNull(), F.col("n_tokens"))
            .otherwise(F.coalesce(F.col("_kept"), F.lit(0)))
            .cast("long")
            .alias("n_kept"),
        )
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
