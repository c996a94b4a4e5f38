"""Conversation / SFT-data curation operators — north-star extension.

The one corpus family beyond pretraining text (VERDICT r07 next-round
#8): instruction-tuning and chat datasets arrive as conversations —
ordered (role, content) turns — and their curation needs are
turn-shaped, not document-shaped:

- **turn-level dedup**: canned assistant responses ("I'm sorry, I
  can't help with that", template greetings) repeat across millions of
  conversations; document-level dedup never sees them because the
  surrounding turns differ. The audit is per TURN, first occurrence
  wins (the span_dedup convention at turn granularity).
- **role-aware PII scrub**: user turns carry third-party PII
  (emails/IPs/phones pasted into prompts) and get the full redaction
  chain; assistant turns are model-generated and get a configurable,
  typically narrower, pattern set — a blanket scrub would destroy
  e.g. synthetic contact-format examples the dataset intends to keep.
- **instruction-response pair contamination**: an SFT pair whose
  INSTRUCTION shares an n-gram with an evaluation prompt leaks the
  benchmark into training (the n-gram decontamination definition of
  Lee et al. 2022 / GPT-3 appendix, applied to the instruction side of
  each pair).

All three are pure composition: codegen expression chains + the
corpus's existing digest-groupBy / broadcast-gram-join machinery. No
Python UDFs; every operator has a bitwise DuckDB oracle
(queries.py conv_*).

Scale notes (100 TB of conversations):
- operators consume the exploded TURNS normal form (conv_id, turn_idx,
  role, content) — ``conversation_turns`` unnests the nested
  array<struct> wire shape once, a narrow generator, no shuffle;
- turn dedup shuffles (digest -> min claimant) with map-side combine —
  hot canned responses are absorbed by the combiner exactly like
  span_dedup's boilerplate spans;
- the PII scrub is a per-row regexp chain in the scan stage;
- pair contamination joins the corpus's instruction n-gram rows
  against a BROADCAST eval-prompt gram table (benchmarks are thousands
  of prompts) — one hash join, no nested-loop scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kafka_denormalization_spark.functions.text import (
    PII_PATTERNS,
    tokens,
)


def conversation_turns(
    conv: DataFrame,
    conv_col: str = "conv_id",
    turns_col: str = "turns",
) -> DataFrame:
    """Unnest the nested conversation wire shape —
    (conv_id, turns array<struct<role string, content string>>) —
    into the turns normal form (conv_id, turn_idx, role, content) the
    operators below consume. Narrow posexplode; turn_idx is the
    0-based position in the conversation."""
    return conv.select(
        F.col(conv_col).alias("conv_id"),
        F.posexplode(turns_col).alias("turn_idx", "_t"),
    ).select(
        "conv_id",
        F.col("turn_idx").cast("long").alias("turn_idx"),
        F.col("_t.role").alias("role"),
        F.col("_t.content").alias("content"),
    )


def turn_dedup(turns: DataFrame) -> DataFrame:
    """Cross-conversation exact turn dedup audit: every (role, content)
    turn text survives as "original" only at its globally-first
    occurrence (minimum (conv_id, turn_idx) — the span_dedup
    convention); later copies are flagged with a pointer to the
    original. Role participates in the identity: the same sentence as
    a user prompt and as an assistant reply is two different turns.

    One digest groupBy (min(struct) partial-agg, canned-response hot
    keys absorbed map-side) + one join back on the digest.

    Output: input columns + (is_dup, src_conv, src_turn) — one row per
    input turn; src_* point at the first occurrence (self for
    originals).
    """
    digested = turns.withColumn(
        "_h", F.md5(F.concat_ws("|", F.col("role"), F.col("content")))
    )
    first = digested.groupBy("_h").agg(
        F.min(
            F.struct(
                F.col("conv_id").alias("c"), F.col("turn_idx").alias("t")
            )
        ).alias("_k")
    )
    return (
        digested.join(first, "_h")
        .select(
            "conv_id",
            "turn_idx",
            "role",
            "content",
            (
                (F.col("conv_id") != F.col("_k.c"))
                | (F.col("turn_idx") != F.col("_k.t"))
            ).alias("is_dup"),
            F.col("_k.c").alias("src_conv"),
            F.col("_k.t").alias("src_turn"),
        )
    )


def role_scrub_pii(
    turns: DataFrame,
    user_patterns: list[tuple[str, str]] | None = None,
    assistant_patterns: list[tuple[str, str]] | None = None,
) -> DataFrame:
    """Role-aware PII redaction: user turns get the full PII chain
    (default: text.PII_PATTERNS — emails, IPv4, phone runs), assistant
    turns a narrower set (default: emails only — model-generated text
    keeps synthetic numerals, direct identifiers still go). Roles other
    than 'user'/'assistant' (system, tool) pass through unscrubbed —
    they are pipeline-authored, not user-supplied.

    Pure codegen regexp_replace chains gated per role; the patterns are
    restricted to the Java-regex/RE2 shared subset so the DuckDB oracle
    replays them verbatim (text.scrub_pii convention).

    Output: input columns + (content_scrubbed, changed).
    """
    if user_patterns is None:
        user_patterns = PII_PATTERNS
    if assistant_patterns is None:
        assistant_patterns = PII_PATTERNS[:1]  # emails only

    def chain(col: Column, pats: list[tuple[str, str]]) -> Column:
        for pat, repl in pats:
            col = F.regexp_replace(col, pat, repl)
        return col

    scrubbed = (
        F.when(F.col("role") == "user", chain(F.col("content"), user_patterns))
        .when(
            F.col("role") == "assistant",
            chain(F.col("content"), assistant_patterns),
        )
        .otherwise(F.col("content"))
    )
    return turns.select(
        "*",
        scrubbed.alias("content_scrubbed"),
    ).withColumn("changed", F.col("content_scrubbed") != F.col("content"))


def instruction_response_pairs(turns: DataFrame) -> DataFrame:
    """(instruction, response) SFT pairs: every user turn followed
    immediately by an assistant turn in the same conversation. An
    equi-join on (conv_id, turn_idx + 1) — no window, so the pairing
    shuffles once on conv_id and never serializes a conversation's
    turns through a single task.

    Output: (conv_id, turn_idx, instruction, response) — turn_idx is
    the USER turn's index."""
    u = turns.filter(F.col("role") == "user").select(
        "conv_id",
        "turn_idx",
        F.col("content").alias("instruction"),
        (F.col("turn_idx") + 1).alias("_next"),
    )
    a = turns.filter(F.col("role") == "assistant").select(
        "conv_id",
        F.col("turn_idx").alias("_next"),
        F.col("content").alias("response"),
    )
    return u.join(a, ["conv_id", "_next"]).select(
        "conv_id", "turn_idx", "instruction", "response"
    )


def _token_gram_rows(
    df: DataFrame, text_col: str, keep: list[str], n: int
) -> DataFrame:
    """One row per whitespace-token n-gram of ``text_col`` (texts with
    fewer than n tokens contribute nothing) — shared by the batch
    decontamination scan and the frozen-gram freeze/apply pair below."""
    toks = tokens(F.col(text_col))
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(-1))),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
    )
    grams = F.when(F.size(toks) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )
    return df.select(*keep, F.explode(grams).alias("_g"))


def freeze_eval_grams(
    evals: DataFrame,
    path: str,
    eval_id_col: str = "eval_id",
    text_col: str = "answer",
    n: int = 8,
) -> None:
    """FREEZE step of the decontamination freeze/apply pattern (the
    lm_model convention — eval sets are corpus-external and never grow
    with the stream, so a streaming pipeline gates against a
    parquet-frozen gram table instead of re-gramming the eval set per
    micro-batch): distinct (gram, eval_id) rows of every ``n``-token
    gram of ``text_col``, written to ``path``. Raises on an empty eval
    set (the fuzzy_contamination honest-gate convention — a silently
    empty frozen gate reports zero contamination forever)."""
    grams = (
        _token_gram_rows(evals, text_col, [eval_id_col], n)
        .dropDuplicates()
        .select(F.col(eval_id_col).alias("_eid"), "_g")
    )
    # validate BEFORE writing (ADVICE r10 #4): raising after the write
    # used to leave an empty parquet at ``path`` — exactly the
    # silently-empty always-pass gate the honest-gate convention
    # exists to prevent, handed to whichever pipeline reads the path
    # next. Persist so the emptiness probe and the write share one
    # gram computation.
    grams = grams.persist()
    try:
        if grams.limit(1).count() == 0:
            raise ValueError(
                "freeze_eval_grams: the frozen gram table is empty — "
                f"every eval text has fewer than n={n} tokens (or the "
                "eval set is empty); refusing to freeze a gate that "
                "can never fire"
            )
        grams.write.mode("overwrite").parquet(path)
    finally:
        grams.unpersist()


def pair_decontaminate_frozen(
    pairs: DataFrame,
    frozen_grams: DataFrame,
    side: str = "response",
    n: int = 8,
) -> DataFrame:
    """APPLY step: ``pair_ngram_contamination`` semantics against a
    pre-frozen (_eid, _g) gram table (``freeze_eval_grams``) — the
    per-batch gate a streaming pipeline runs. Identical output schema:
    (conv_id, turn_idx, instruction, response, n_eval_hits,
    contaminated), zero-hit pairs included."""
    if side not in ("instruction", "response"):
        raise ValueError(f"side must be instruction or response, got {side!r}")
    igrams = _token_gram_rows(pairs, side, ["conv_id", "turn_idx"], n)
    hits = (
        igrams.join(F.broadcast(frozen_grams), "_g")
        .groupBy("conv_id", "turn_idx")
        .agg(F.countDistinct("_eid").alias("n_eval_hits"))
    )
    return (
        pairs.join(hits, ["conv_id", "turn_idx"], "left")
        .select(
            "conv_id",
            "turn_idx",
            "instruction",
            "response",
            F.coalesce(F.col("n_eval_hits"), F.lit(0))
            .cast("long")
            .alias("n_eval_hits"),
        )
        .withColumn("contaminated", F.col("n_eval_hits") > 0)
    )


def pair_ngram_contamination(
    pairs: DataFrame,
    prompts: DataFrame,
    prompt_id_col: str = "eval_id",
    prompt_col: str = "prompt",
    n: int = 8,
    side: str = "instruction",
) -> DataFrame:
    """n-gram decontamination of SFT pairs against an eval table: a pair
    is contaminated iff its ``side`` text shares an ``n``-token gram
    with any evaluation row (the 13-gram/8-gram overlap definition of
    GPT-3/Lee et al. decontamination).

    ``side``: which half of the pair to gram —
    - ``"instruction"`` (default) against eval PROMPTS: the pair's
      question restates a benchmark question;
    - ``"response"`` against eval REFERENCE ANSWERS: a memorized
      benchmark answer sits in an assistant turn — the WORSE leak
      (VERDICT r08 #5: the model trains on the exact target string),
      invisible to the instruction-side scan because the question may
      be paraphrased while the answer matches verbatim.

    Scale: instruction gram rows explode ~len-n+1 rows per pair; the
    eval side (benchmarks: thousands of prompts) reduces to a DISTINCT
    (gram -> eval_id) table and is BROADCAST into one hash join —
    never a per-needle substring scan. Post-join aggregation is keyed
    on the pair with map-side combine.

    Output: (conv_id, turn_idx, instruction, response, n_eval_hits,
    contaminated) — one row per input pair, zero-hit pairs included.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    if side not in ("instruction", "response"):
        raise ValueError(f"side must be instruction or response, got {side!r}")

    pgrams = (
        _token_gram_rows(prompts, prompt_col, [prompt_id_col], n)
        .dropDuplicates()
        .select(F.col(prompt_id_col).alias("_eid"), "_g")
    )
    igrams = _token_gram_rows(pairs, side, ["conv_id", "turn_idx"], n)
    hits = (
        igrams.join(F.broadcast(pgrams), "_g")
        .groupBy("conv_id", "turn_idx")
        .agg(F.countDistinct("_eid").alias("n_eval_hits"))
    )
    return (
        pairs.join(hits, ["conv_id", "turn_idx"], "left")
        .select(
            "conv_id",
            "turn_idx",
            "instruction",
            "response",
            F.coalesce(F.col("n_eval_hits"), F.lit(0))
            .cast("long")
            .alias("n_eval_hits"),
        )
        .withColumn("contaminated", F.col("n_eval_hits") > 0)
    )
