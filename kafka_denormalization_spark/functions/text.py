"""Text analysis operators (north-star LLM-data-pipeline extensions).

No analog exists in the reference (SURVEY §2.3 — it has no value-level
functions at all); these are the additions BASELINE.json's north star
requires: language-ID, quality scoring, token counting, document
fingerprinting.

Spark-first: everything here is built-in Catalyst expressions (split /
regexp / higher-order array functions / md5) — JVM-side, whole-stage
codegen, zero Python in the hot path. Each function returns a Column so
they compose into any plan; `queries.py` mirrors the exact arithmetic in
DuckDB SQL for the oracle.

Scale notes (100 TB):
- all ops are narrow (per-row) — no shuffle, fully pipelined with the scan;
- the fingerprint is a winnowing-style min-of-ngram-hashes: constant output
  size per document regardless of document length, so downstream dedup
  groups shuffle 32 hex chars, not documents.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from ..checkpoint import persist_if_uncached

from kafka_denormalization_spark.operators.window import global_ordered_window

# A small English stopword list (shared with the DuckDB oracle — keep in
# sync with queries.py).
STOPWORDS_EN = ["the", "a", "of", "and", "to", "in", "is", "it"]

# Per-language discriminator word lists for the n-gram/stopword-profile
# language-ID heuristic. Order defines deterministic tie-break (struct max).
LANG_PROFILES: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "is"],
    "de": ["der", "die", "das", "und", "ist"],
    "fr": ["le", "la", "les", "et", "est"],
    "es": ["el", "los", "las", "y", "es"],
    "zh": ["de", "shi", "bu", "le", "zai"],
}


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization."""
    t = F.col(text) if isinstance(text, str) else text
    return F.split(F.trim(t), r"\s+")


def token_count(text: Column | str) -> Column:
    """Whitespace token count."""
    return F.size(tokens(text))


def bpe_ish_token_count(text: Column | str) -> Column:
    """Sub-word-ish token count: word chunks + standalone punctuation,
    the usual pre-tokenizer regex shape (``\\w+|[^\\w\\s]``)."""
    t = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(t, F.lit(r"\w+|[^\w\s]"), F.lit(0)))


def punct_ratio(text: Column | str) -> Column:
    """Punctuation chars / total chars."""
    t = F.col(text) if isinstance(text, str) else text
    n_punct = F.length(F.regexp_replace(t, r"[^.,;:!?'\"()-]", ""))
    return n_punct.cast("double") / F.length(t).cast("double")


def stopword_ratio(text: Column | str, stopwords: list[str] | None = None) -> Column:
    """Stopword tokens / total tokens."""
    sw = stopwords or STOPWORDS_EN
    toks = tokens(text)
    hits = F.size(F.filter(toks, lambda tok: tok.isin(*sw)))
    return hits.cast("double") / F.size(toks).cast("double")


def quality_score(text: Column | str) -> Column:
    """Composite document-quality heuristic in [0, 1]:
    rewards reasonable length, some stopword density, low punctuation noise.
    The exact arithmetic is mirrored in the DuckDB oracle — keep in sync."""
    n_tok = token_count(text).cast("double")
    len_component = F.least(F.lit(1.0), n_tok / F.lit(100.0))
    sw_component = F.least(F.lit(1.0), stopword_ratio(text) * F.lit(5.0))
    punct_component = F.lit(1.0) - F.least(F.lit(1.0), punct_ratio(text) * F.lit(10.0))
    return (
        F.lit(0.4) * len_component
        + F.lit(0.3) * sw_component
        + F.lit(0.3) * punct_component
    )


def lang_hits(text: Column | str, lang: str) -> Column:
    """Discriminator-word hit count for one language profile."""
    toks = tokens(text)
    return F.size(F.filter(toks, lambda tok: tok.isin(*LANG_PROFILES[lang])))


def lang_id(text: Column | str) -> Column:
    """Heuristic language ID: argmax of per-language profile hits.

    Implemented as ``greatest`` over (hits, lang) structs — struct comparison
    gives a deterministic tie-break (higher lang code wins ties), identical
    in Spark and DuckDB.
    """
    candidates = [
        F.struct(lang_hits(text, lang).alias("h"), F.lit(lang).alias("l"))
        for lang in LANG_PROFILES
    ]
    return F.greatest(*candidates).getField("l")


# Script ranges for the non-whitespace-script fallbacks (BMP-only, so
# char indexing/length agree across engines): name -> (lo, hi, lang).
# Kana is checked FIRST — Japanese text mixes Han and Kana, and any
# meaningful Kana presence marks it Japanese, not Chinese (the standard
# CJK disambiguation rule).
SCRIPT_RANGES: list[tuple[str, int, int, str]] = [
    ("kana", 0x3040, 0x30FF, "ja"),
    ("hangul", 0xAC00, 0xD7AF, "ko"),
    ("han", 0x4E00, 0x9FFF, "zh"),
    ("cyrillic", 0x0400, 0x04FF, "ru"),
]


def script_char_count(text: Column | str, lo: int, hi: int) -> Column:
    """Count of characters in the [lo, hi] code-point range — length
    minus the length with the class removed, a pure expression the
    DuckDB oracle replays with the same literal-char class (+ 'g')."""
    t = F.col(text) if isinstance(text, str) else text
    return F.length(t) - F.length(
        F.regexp_replace(t, f"[{chr(lo)}-{chr(hi)}]", "")
    )


def tokens_v2(text: Column | str) -> Column:
    """Script-aware tokenization: CJK characters (Han, Kana, Hangul) are
    isolated into single-character tokens — the character-level fallback
    for scripts that do not delimit words with whitespace (VERDICT r08
    #8: plain ``tokens`` treats an unsegmented Chinese sentence as ONE
    token, collapsing token counts, n-gram dedup, and quality signals on
    CJK corpora) — while whitespace-delimited text splits exactly like
    ``tokens``. Single-char CJK tokens make word-n-gram machinery
    degrade to character n-grams on those scripts, the standard
    no-segmenter baseline.

    Pure codegen: one regexp_replace inserting spaces around each CJK
    char, then the usual whitespace split. On pure-Latin text the output
    is identical to ``tokens``."""
    t = F.col(text) if isinstance(text, str) else text
    cjk = "".join(
        f"{chr(lo)}-{chr(hi)}"
        for name, lo, hi, _lang in SCRIPT_RANGES
        if name in ("kana", "hangul", "han")
    )
    spaced = F.regexp_replace(t, f"([{cjk}])", " $1 ")
    return F.split(F.trim(spaced), r"\s+")


def lang_id_v2(text: Column | str) -> Column:
    """Script-aware language ID (VERDICT r08 #8): character-class census
    first — a text whose Kana / Hangul / Han / Cyrillic character count
    reaches 10% of its length is classified by script (Kana before Han:
    Japanese mixes both scripts, so Kana presence dominates) — and only
    Latin-script text falls through to the stopword-profile argmax of
    ``lang_id``. All integer comparisons (10 * count >= length), no
    floats, so the DuckDB oracle matches bit-for-bit."""
    t = F.col(text) if isinstance(text, str) else text
    ln = F.length(t)
    out = lang_id(t)
    for _name, lo, hi, lang in reversed(SCRIPT_RANGES):
        out = F.when(
            (ln > 0) & (script_char_count(t, lo, hi) * 10 >= ln),
            F.lit(lang),
        ).otherwise(out)
    return out


def ngrams(text: Column | str, n: int = 3) -> Column:
    """Word n-grams (space-joined)."""
    toks = tokens(text)
    grams = F.transform(
        F.sequence(F.lit(0), F.size(toks) - n),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
    )
    return F.when(F.size(toks) >= n, grams).otherwise(F.array().cast("array<string>"))


def fingerprint(text: Column | str, n: int = 3) -> Column:
    """Winnowing-style document fingerprint: min md5 over word n-grams.

    md5 (not xxhash) so the value is engine-independent and oracle-checkable;
    constant 32-char output bounds shuffle width for dedup-by-fingerprint.
    Expression form (array lambda, interpreted) — for corpus-scale use
    ``fingerprint_table``, the codegen'd columnar twin.
    """
    return F.array_min(F.transform(ngrams(text, n), F.md5))


def winnow_fingerprints(
    text: Column | str, n: int = 3, w: int = 4
) -> Column:
    """Winnowing proper (Schleimer/Wilkerson/Aiken, SIGMOD'03): md5 each
    word n-gram, slide a window of ``w`` hashes, keep each window's minimum,
    distinct the selections. Guarantees: any shared run of w+n-1 tokens
    between two documents yields at least one shared fingerprint.

    Local-match robust (unlike the single global-min ``fingerprint``);
    output size ~ len/w, bounded and shuffle-friendly.
    """
    hashes = F.transform(ngrams(text, n), F.md5)
    windows = F.transform(
        F.sequence(F.lit(0), F.size(hashes) - w),
        lambda i: F.array_min(F.slice(hashes, i + 1, w)),
    )
    windows = F.when(F.size(hashes) >= w, windows).otherwise(
        # short docs: fall back to the global min (non-empty gram list)
        F.when(F.size(hashes) > 0, F.array(F.array_min(hashes))).otherwise(
            F.array().cast("array<string>")
        )
    )
    return F.array_sort(F.array_distinct(windows))


def fingerprint_table(docs, id_col: str, text_col: str, n: int = 3):
    """Columnar fingerprint: codegen'd gram rows (posexplode + window lead,
    see similarity.word_gram_rows) -> min(md5) agg with map-side combine.
    Docs too short for any n-gram keep a NULL fingerprint via the join-back
    (same output as the expression form)."""
    from kafka_denormalization_spark.functions.similarity import word_gram_rows

    ex = word_gram_rows(docs, id_col, text_col, n)
    mins = (
        ex.groupBy("_id")
        .agg(F.min(F.md5(F.col("_g"))).alias("fp"))
        .withColumnRenamed("_id", id_col)
    )
    return docs.select(id_col).join(mins, id_col, "left")


URL_PATTERN = r"https?://\S+"


def clean_text(text: Column | str) -> Column:
    """Canonical text normalization for training corpora: strip URLs,
    lowercase, collapse whitespace runs, trim. Pure regexp/codegen chain —
    arithmetic mirrored 1:1 in the DuckDB oracle (regexp_replace with 'g')."""
    t = F.col(text) if isinstance(text, str) else text
    t = F.regexp_replace(t, URL_PATTERN, " ")
    t = F.lower(t)
    t = F.regexp_replace(t, r"\s+", " ")
    return F.trim(t)


# PII patterns restricted to the syntax subset Java regex and RE2 share
# (no lookarounds, no backrefs), so the DuckDB oracle replays them verbatim.
# Order matters: emails before phones (an email's digit run must not be
# half-eaten by the phone pattern first).
PII_PATTERNS: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    (r"\+?\d[\d .-]{7,}\d", "<PHONE>"),
]


def scrub_pii(text: Column | str) -> Column:
    """Redact common PII shapes (emails, IPv4 addresses, phone-like digit
    runs) with typed placeholders — the standard pre-training scrub pass.
    A chain of codegen ``regexp_replace`` (replace-all), narrow and fully
    pipelined with the scan; no shuffle, no Python."""
    t = F.col(text) if isinstance(text, str) else text
    for pat, repl in PII_PATTERNS:
        t = F.regexp_replace(t, pat, repl)
    return t


def repetition_score(text: Column | str, n: int = 2) -> Column:
    """Repetition quality signal: 1 - distinct n-grams / total n-grams
    (0 = no repetition, ->1 = highly repetitive boilerplate). A standard
    low-quality-document filter for LLM corpora."""
    grams = ngrams(text, n)
    return F.when(
        F.size(grams) > 0,
        F.lit(1.0)
        - F.size(F.array_distinct(grams)).cast("double") / F.size(grams).cast("double"),
    ).otherwise(F.lit(0.0))


def repetition_profile(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Gopher-style repetition accounting (Rae et al. 2021,
    arXiv:2112.11446 §A1.1 — the n-gram half; the line-based half needs
    multi-line documents): per document, the character mass of the
    single most frequent word 2-/3-gram and the OVERLAP-AWARE character
    mass of all duplicated 5-grams (each token position counted once no
    matter how many duplicated 5-grams span it — the detail naive
    ``count * len`` accounting gets wrong).

    Everything is an exact integer so the numbers are bitwise-identical
    across engines; callers derive Gopher's fractions downstream
    (``top2_chars / n_chars`` etc.). Gram char mass includes the n-1
    single-space separators (documented convention, mirrored in the
    oracle); dup5 char mass is separator-free (sum of covered token
    lengths). Ties for "most frequent gram" break to the
    lexicographically smallest gram.

    Output: (id, n_tokens, n_chars, top2_count, top2_chars, top3_count,
    top3_chars, dup5_tokens, dup5_chars); top*/dup* are 0 for docs too
    short to form the gram.

    100 TB shape: the per-doc windows (lead, row_number) are bounded by
    document length; gram groupBys shuffle (doc, gram) pairs — linear in
    corpus tokens with map-side combine; the duplicated-occurrence join
    fans out only grams already known duplicated. No global state.
    """
    toks = docs.select(
        F.col(id_col).alias("_rid"),
        F.posexplode(tokens(text_col)).alias("_pos", "_t"),
    )
    base = toks.groupBy("_rid").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.sum(F.length("_t")).cast("long").alias("n_chars"),
    )
    w = Window.partitionBy("_rid").orderBy("_pos")
    led = toks.select(
        "_rid",
        "_pos",
        "_t",
        F.lead("_t", 1).over(w).alias("_t1"),
        F.lead("_t", 2).over(w).alias("_t2"),
        F.lead("_t", 3).over(w).alias("_t3"),
        F.lead("_t", 4).over(w).alias("_t4"),
    )

    def top_gram(n: int, prefix: str) -> DataFrame:
        parts = ["_t"] + [f"_t{i}" for i in range(1, n)]
        grams = led.where(F.col(parts[-1]).isNotNull()).select(
            "_rid", F.concat_ws(" ", *parts).alias("_g")
        )
        cnt = grams.groupBy("_rid", "_g").agg(F.count(F.lit(1)).alias("_c"))
        w_top = Window.partitionBy("_rid").orderBy(
            F.col("_c").desc(), F.col("_g")
        )
        return (
            cnt.withColumn("_rn", F.row_number().over(w_top))
            .where(F.col("_rn") == 1)
            .select(
                "_rid",
                F.col("_c").cast("long").alias(f"{prefix}_count"),
                (F.col("_c") * F.length("_g"))
                .cast("long")
                .alias(f"{prefix}_chars"),
            )
        )

    g5 = led.where(F.col("_t4").isNotNull()).select(
        "_rid",
        "_pos",
        F.concat_ws(" ", "_t", "_t1", "_t2", "_t3", "_t4").alias("_g"),
    )
    dup_grams = (
        g5.groupBy("_rid", "_g")
        .agg(F.count(F.lit(1)).alias("_c"))
        .where(F.col("_c") >= 2)
        .select("_rid", "_g")
    )
    covered = (
        g5.join(dup_grams, ["_rid", "_g"])
        .select(
            "_rid",
            F.explode(
                F.sequence(F.col("_pos"), F.col("_pos") + F.lit(4))
            ).alias("_cp"),
        )
        .distinct()
    )
    dup5 = (
        covered.join(
            toks.withColumnRenamed("_pos", "_cp"), ["_rid", "_cp"]
        )
        .groupBy("_rid")
        .agg(
            F.count(F.lit(1)).cast("long").alias("dup5_tokens"),
            F.sum(F.length("_t")).cast("long").alias("dup5_chars"),
        )
    )
    zero_cols = [
        "top2_count",
        "top2_chars",
        "top3_count",
        "top3_chars",
        "dup5_tokens",
        "dup5_chars",
    ]
    return (
        base.join(top_gram(2, "top2"), "_rid", "left")
        .join(top_gram(3, "top3"), "_rid", "left")
        .join(dup5, "_rid", "left")
        .select(
            F.col("_rid").alias(id_col),
            "n_tokens",
            "n_chars",
            *[
                F.coalesce(F.col(c), F.lit(0)).cast("long").alias(c)
                for c in zero_cols
            ],
        )
    )


GOPHER_STOPWORDS = ["the", "and", "of", "to", "a", "in", "is", "that"]


def gopher_quality_flags(text: Column | str) -> dict[str, Column]:
    """Gopher-style (Rae et al. 2021, arXiv:2112.11446 §A1.1) document
    quality rules as named boolean columns. Every ratio threshold is
    expressed with EXACT integer cross-multiplication (``3*wc <= chars``
    instead of ``chars/wc >= 3``) so the flags are bitwise-identical
    across engines — no float division anywhere.

    Rules: word count in [50, 100k]; mean word length in [3, 10];
    symbol-to-word ratio (# and ...) <= 0.1; >=80% of words contain an
    alphabetic char; >=2 distinct stopwords present.
    """
    t = F.col(text) if isinstance(text, str) else text
    toks = tokens(t)
    wc = F.size(toks)
    word_chars = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
    )
    alpha_wc = F.size(F.filter(toks, lambda w: w.rlike("[A-Za-z]")))
    stop_hits = F.size(
        F.array_intersect(
            F.transform(toks, F.lower),
            F.array(*[F.lit(s) for s in GOPHER_STOPWORDS]),
        )
    )
    hash_count = F.length(t) - F.length(F.replace(t, F.lit("#"), F.lit("")))
    ellipsis_count = F.floor(
        (F.length(t) - F.length(F.replace(t, F.lit("..."), F.lit("")))) / 3
    )
    return {
        "r_word_count": wc.between(50, 100_000),
        "r_mean_word_len": (F.lit(3) * wc <= word_chars)
        & (word_chars <= F.lit(10) * wc),
        "r_symbol_ratio": F.lit(10) * (hash_count + ellipsis_count) <= wc,
        "r_alpha_words": F.lit(5) * alpha_wc >= F.lit(4) * wc,
        "r_stopwords": stop_hits >= 2,
    }


def contamination_scan_join(
    docs, id_col: str, text_col: str, patterns: list[str], probe_grams: int = 2
):
    """Many-needle decontamination at corpus scale: TOKEN-SEQUENCE match
    of each needle against each document, found via an equi-join on the
    needle's first ``probe_grams``-token gram instead of a per-needle
    substring scan.

    ``contamination_scan`` is a broadcast nested-loop: every document is
    string-scanned once per needle — fine for a handful, O(corpus x
    needles) for a benchmark suite with thousands of probes. Here a
    document containing needle tokens w1..wn must contain the gram
    (w1..wk), so candidates come from ONE hash join between the corpus
    gram table (reusable from the dedup pipeline) and the broadcast
    needle-gram table; the exact token-boundary verification then runs
    only on candidates. Needles shorter than ``probe_grams`` tokens fall
    back to the contains scan (their gram key doesn't exist).

    Matching is on whitespace-normalized token sequences — " ``a b`` "
    matches "``x a b y``" but not "``xa by``" — the standard
    decontamination definition, identical in the DuckDB oracle.
    """
    spark = docs.sparkSession
    pats = spark.createDataFrame([(p,) for p in patterns], "pat string")
    norm = lambda c: F.array_join(tokens(c), " ")
    pats = pats.select(
        "pat",
        norm(F.col("pat")).alias("_pnorm"),
        F.size(tokens(F.col("pat"))).alias("_ptoks"),
        F.array_join(F.slice(tokens(F.col("pat")), 1, probe_grams), " ").alias("_g"),
    )
    long_pats = pats.filter(F.col("_ptoks") >= probe_grams)
    short_pats = pats.filter(F.col("_ptoks") < probe_grams)

    from kafka_denormalization_spark.functions.similarity import word_gram_rows

    # broadcast-filter the gram stream BEFORE any exchange (r13, guide
    # §2.3 "project/filter before the exchange"): the needle-gram join
    # is map-side, so only matching gram rows survive the explode — the
    # previous shape dropDuplicates'd the ENTIRE corpus gram table (one
    # full exploded-row exchange) just to feed this join, and the
    # distinct was redundant anyway (candidates are dedup'd below)
    grams = word_gram_rows(docs, id_col, text_col, probe_grams)
    candidates = (
        grams.join(F.broadcast(long_pats), ["_g"])
        .select(F.col("_id").alias(id_col), "pat", "_pnorm")
        .dropDuplicates()
    )
    normed = docs.select(
        F.col(id_col), F.concat(F.lit(" "), norm(F.col(text_col)), F.lit(" ")).alias("_dnorm")
    )
    boundary_hit = F.contains(
        F.col("_dnorm"), F.concat(F.lit(" "), F.col("_pnorm"), F.lit(" "))
    )
    verified = (
        candidates.join(normed, [id_col])
        .filter(boundary_hit)
        .select(id_col, "pat")
    )
    fallback = (
        normed.join(F.broadcast(short_pats), boundary_hit)
        .select(F.col(id_col), F.col("pat"))
    )
    return verified.unionByName(fallback)


def vocab_table(docs, text_col: str, k: int = 50):
    """Corpus vocabulary: token -> frequency, top-k (count desc, token asc
    tiebreak so the result set is deterministic).

    Scale: explode + hash-agg with map-side combine — shuffle volume is
    bounded by DISTINCT tokens per partition, not corpus tokens; the top-k
    is a TakeOrdered (no global sort materialization)."""
    return (
        docs.select(F.explode(tokens(text_col)).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("token"))
        .limit(k)
    )


def oov_rate_table(docs, id_col: str, text_col: str, k: int = 50):
    """Per-document out-of-vocabulary rate against the corpus top-``k``
    vocabulary — the tokenizer-coverage curation signal (docs full of
    tokens a fixed vocab can't represent are poor training material).

    Scale: the vocab is k rows — broadcast to every executor, so the
    per-token membership probe is a broadcast left join on the exploded
    token stream (no shuffle of the tokens themselves); the only exchange
    is the final per-doc aggregation, map-side combined. The vocab
    derivation reuses ``vocab_table`` (distinct-token-bounded shuffle).

    Output: (id, n_tokens, oov_frac) — oov_frac is one int/int division
    (correctly-rounded IEEE, oracle-exact)."""
    tok = docs.select(
        F.col(id_col).alias("_id"), F.explode(tokens(text_col)).alias("token")
    )
    vocab = vocab_table(docs, text_col, k).select("token", F.lit(1).alias("_in"))
    return (
        tok.join(F.broadcast(vocab), ["token"], "left")
        .groupBy(F.col("_id").alias(id_col))
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            (
                F.sum(F.when(F.col("_in").isNull(), 1).otherwise(0)).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("oov_frac"),
        )
    )


def contamination_scan(docs, id_col: str, text_col: str, patterns: list[str]):
    """Benchmark-decontamination primitive: (doc, pattern) pairs for every
    document containing any needle substring.

    Scale: the pattern list is tiny and broadcast; the scan is a single
    pass over the corpus with a whole-stage-codegen `contains` — a
    broadcast nested-loop join whose inner side is len(patterns), which is
    the right plan here (substring match has no equi-key to hash on; for
    thousands of patterns, switch to an Aho-Corasick pandas UDF)."""
    spark = docs.sparkSession
    pats = spark.createDataFrame([(p,) for p in patterns], "pat string")
    return (
        docs.join(F.broadcast(pats), F.contains(F.col(text_col), F.col("pat")))
        .select(F.col(id_col), F.col("pat"))
    )


def bm25_topk(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 ranked retrieval for a fixed (small) query-term list —
    Okapi BM25 (Robertson et al., TREC-3), the classic relevance score a
    training-data pipeline uses for corpus search / quality probes.

    score(d) = Σ_t idf(t) · tf · (k1+1) / (tf + k1·(1 − b + b·dl·N/T))
    with idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5)) — the Lucene-style
    non-negative idf, so documents matching a very common term (df > N/2)
    still outrank documents matching nothing (raw Robertson idf goes
    negative there and inverts that). dl is the doc token count, N docs,
    T total tokens (avgdl = T/N folded in to keep every input an exact
    integer until a fixed-order float expression).

    Plan shape (scale-first): per-term tf via array expressions — the
    token stream is NEVER exploded or shuffled. One 1-row corpus-stats
    aggregate (N, T, df per term) broadcast back (allow-listed 1-row
    cross join), then a narrow per-doc score and a global
    ORDER BY/LIMIT k top-k (no unpartitioned window; Spark's TakeOrdered
    does per-partition heaps + a k-row driver merge).

    The emitted score is rounded to 9 decimals: ln() is correctly-rounded
    on neither engine (≤1 ulp each), and the grid absorbs the skew so the
    DuckDB oracle hashes identically — same convention as
    temperature_fractions.

    Output: (id_col, score_r) — the top-k docs by rounded score,
    ``id_col`` ascending as the tiebreak.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    toks = tokens(F.col(text_col))

    def _matches(term: str):
        # NB: a two-parameter lambda would be interpreted by pyspark as
        # (element, index) — close over the term instead
        return lambda x: x == F.lit(term)

    tf_cols = [
        F.size(F.filter(toks, _matches(t))).alias(f"_tf{i}")
        for i, t in enumerate(query_terms)
    ]
    base = docs.select(F.col(id_col), F.size(toks).alias("_dl"), *tf_cols)
    stats = base.agg(
        F.count(F.lit(1)).alias("_N"),
        F.sum("_dl").alias("_T"),
        *[
            F.sum((F.col(f"_tf{i}") > 0).cast("long")).alias(f"_df{i}")
            for i in range(len(query_terms))
        ],
    )
    scored = base.crossJoin(F.broadcast(stats))
    n = F.col("_N").cast("double")
    total = F.col("_T").cast("double")
    score = None
    for i in range(len(query_terms)):
        tf = F.col(f"_tf{i}").cast("double")
        df = F.col(f"_df{i}").cast("double")
        idf = F.log(F.lit(1.0) + (n - df + F.lit(0.5)) / (df + F.lit(0.5)))
        denom = tf + F.lit(k1) * (
            F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("_dl").cast("double") * n / total
        )
        term = idf * tf * F.lit(k1 + 1.0) / denom
        score = term if score is None else score + term
    return (
        scored.select(F.col(id_col), F.round(score, 9).alias("score_r"))
        .orderBy(F.col("score_r").desc(), F.col(id_col))
        .limit(k)
    )


def bm25_batch(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    queries: DataFrame,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Table-driven BM25 batch retrieval: ``queries`` is a DataFrame of
    (query_id, term) rows, and the result is the top-``k`` docs PER query
    — the batch-retrieval shape a training pipeline uses to pull topical
    slices for many probes at once (vs :func:`bm25_topk`'s single fixed
    term list).  Same Okapi/Lucene scoring as bm25_topk.

    Plan shape (scale-first, differs from bm25_topk by design):
    1. Tokens ARE exploded here — but immediately semi-joined against the
       broadcast distinct query-term set, so only matching (doc, term)
       rows survive past the explode; the full token stream never
       shuffles.  For a 100 TB corpus and a few hundred query terms this
       prunes ~99.9% of token rows map-side.
    2. (doc, term) tf via one partial-agg groupBy; per-term df as a
       count over Window.partitionBy(term) ON THE TF ROWS — a separate
       df aggregate branch would re-derive the whole corpus explode
       (column pruning de-canonicalizes the shared exchange, so neither
       ReuseExchange nor AQE stage reuse collapses it; measured: 0
       ReusedExchange, 2 corpus scans).  The window partition holds df
       rows per term — fine for selective retrieval terms; if a caller
       ships stopword-frequency terms the per-term partition grows with
       df, and they should pre-filter the query table instead.  Corpus
       N/T from one 1-row aggregate broadcast back (allow-listed 1-row
       cross join).
    3. Query fan-out joins the broadcast query table ON term after the
       per-(doc, term) contribution is computed, so a term shared by many
       queries is scored once.
    4. Per-(query, doc) total = a sorted sequential fold
       (``aggregate(sort_array(collect_list(c)))``) over per-term
       contributions each pre-rounded to 9 decimals: identical operand
       order on both engines makes the IEEE double sum bit-identical, so
       the DuckDB oracle (list_reduce(list_sort(...))) hashes exactly —
       a groupBy SUM over doubles would be partition-order-dependent.
    5. Top-k per query via row_number over (query_id) — candidates are
       already reduced to matching docs, so the window partition is
       bounded by matches, not corpus size.

    Docs matching no query term are omitted (score 0) — the batch
    variant returns matches only, unlike bm25_topk which ranks the whole
    corpus for one query.

    Output: (query_id, id_col, score_r) — top-k per query, rounded score
    descending, ``id_col`` ascending tiebreak.
    """
    toks = tokens(F.col(text_col))
    terms = queries.select("term").distinct()
    base = docs.select(F.col(id_col), F.size(toks).alias("_dl"), toks.alias("_toks"))
    stats = base.agg(
        F.count(F.lit(1)).cast("double").alias("_N"),
        F.sum("_dl").cast("double").alias("_T"),
    )
    tok_rows = base.select(
        F.col(id_col), F.col("_dl"), F.explode("_toks").alias("term")
    ).join(F.broadcast(terms), "term")
    tf = tok_rows.groupBy(id_col, "term").agg(
        F.count(F.lit(1)).alias("_tf"), F.max("_dl").alias("_dl")
    ).withColumn(
        "_df",
        F.count(F.lit(1)).over(Window.partitionBy("term")).cast("double"),
    )
    n, total = F.col("_N"), F.col("_T")
    tfd = F.col("_tf").cast("double")
    dfd = F.col("_df")
    idf = F.log(F.lit(1.0) + (n - dfd + F.lit(0.5)) / (dfd + F.lit(0.5)))
    denom = tfd + F.lit(k1) * (
        F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("_dl").cast("double") * n / total
    )
    contrib = (
        tf.crossJoin(F.broadcast(stats))
        .select(
            F.col("term"),
            F.col(id_col),
            F.round(idf * tfd * F.lit(k1 + 1.0) / denom, 9).alias("_c"),
        )
        .join(F.broadcast(queries), "term")
    )
    scores = contrib.groupBy("query_id", id_col).agg(
        F.round(
            F.aggregate(
                F.sort_array(F.collect_list("_c")),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            9,
        ).alias("score_r")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score_r").desc(), F.col(id_col)
    )
    return (
        scores.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select("query_id", id_col, "score_r")
    )


def lm_score(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    target_pred,
    lam: float = 0.5,
    alpha: float = 0.5,
) -> DataFrame:
    """CCNet-style language-model quality scoring (Wenzek et al. 2020):
    per-document mean negative log-likelihood under an interpolated
    bigram model trained on the ``target_pred`` subset — the "does this
    raw document read like the curated corpus" filter (low nll = fluent /
    in-domain, high = gibberish or off-domain). Complements
    ``dsir_log_weights``: that is a target-vs-raw contrast, this is an
    absolute fluency score under the target model alone.

    Per bigram position: P = lam * (c2 + a)/(c1_prev + a*V)
    + (1 - lam) * (c1_cur + a)/(T + a*V), with c2/c1 target bigram and
    unigram counts, V the target vocabulary size, T target token count
    (additive smoothing everywhere, so unseen words/bigrams stay finite).
    nll = -(Σ ln P)/n_bigrams.

    Deterministic cross-engine: counts/V/T are exact integers; each
    ln(P) rounds to the 9-decimal grid; the per-doc sum folds in token
    POSITION order; the final mean rounds again.

    Plan shape (100 TB): the model is built from TWO narrow passes over
    only the target subset (the predicate pushes into the scan, and the
    curated target is small next to the raw corpus) — deliberately NOT
    shared with the scoring pass, so nothing corpus-sized needs a
    persist. Scoring is one corpus pass with TWO model lookups, not
    three: the unigram count is joined once per TOKEN before the
    per-doc lead window, and ``lead`` carries it forward so one probe
    yields both the prev- and cur-unigram counts; only the bigram
    count still joins per bigram row. Both lookup tables are bounded
    by target vocabulary — AQE broadcasts them when they fit, and its
    skew-join covers the stopword hot keys when they don't. The
    per-doc fold reuses the window's hash(id) partitioning (subset
    rule).

    Output: (id_col, n_bigrams, nll_r); docs with < 2 tokens carry NULL
    nll_r (no bigram evidence) and n_bigrams = 0.
    """
    uni, bi_model, stats = lm_model(docs, text_col, target_pred, id_col)
    return lm_score_with_model(
        docs, id_col, text_col, uni, bi_model, stats, lam, alpha
    )


def lm_model(
    docs: DataFrame,
    text_col: str,
    target_pred,
    id_col: str = "doc_id",
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """The ``lm_score`` model half, exposed so the model can be trained
    once in batch, FROZEN (e.g. written to parquet), and applied later
    as a stateless scorer — the production pattern for corpus-global
    stages in continuous ingest (streaming/ingest_curation.py
    ``doc_filter``). Returns (uni, bi_model, stats): target unigram
    counts (_w, _c1), target bigram counts (_w1m, _w2m, _c2), and the
    1-row (_T, _V) totals. All vocab-bounded."""
    tgt_docs = docs.filter(target_pred)
    tgt_toks = tgt_docs.select(F.explode(tokens(F.col(text_col))).alias("_w"))
    uni = tgt_toks.groupBy("_w").agg(F.count(F.lit(1)).alias("_c1"))
    stats = uni.agg(
        F.sum("_c1").alias("_T"), F.count(F.lit(1)).alias("_V")
    )
    tgt_tok_pos = tgt_docs.select(
        F.col(id_col).alias("_id"),
        F.posexplode(tokens(F.col(text_col))).alias("_pos", "_t"),
    )
    w_t = Window.partitionBy("_id").orderBy("_pos")
    bi_model = (
        tgt_tok_pos.select(
            "_t", F.lead("_t", 1).over(w_t).alias("_nxt")
        )
        .filter(F.col("_nxt").isNotNull())
        .groupBy("_t", "_nxt")
        .agg(F.count(F.lit(1)).alias("_c2"))
        .select(
            F.col("_t").alias("_w1m"),
            F.col("_nxt").alias("_w2m"),
            "_c2",
        )
    )
    return uni, bi_model, stats


def _lm_scored_rows(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    uni: DataFrame,
    bi_model: DataFrame,
    stats: DataFrame,
    lam: float = 0.5,
    alpha: float = 0.5,
) -> DataFrame:
    """Per-bigram-position interpolated log-probabilities under the
    frozen model: (_id, _pos, _lnp) rows, each ln rounded to the
    9-decimal grid — the shared scoring pass behind
    ``lm_score_with_model`` (mean nll) and ``lm_burstiness``
    (mean + spread). One corpus pass, two vocab-bounded lookups
    (the lead-carried unigram trick: one probe serves prev and cur)."""
    all_tok_pos = docs.select(
        F.col(id_col).alias("_id"),
        F.posexplode(tokens(F.col(text_col))).alias("_pos", "_t"),
    ).join(uni.withColumnRenamed("_w", "_t"), "_t", "left")
    w_a = Window.partitionBy("_id").orderBy("_pos")
    bi = all_tok_pos.select(
        "_id",
        "_pos",
        F.col("_t").alias("_w1"),
        F.col("_c1").alias("_c1p"),
        F.lead("_t", 1).over(w_a).alias("_w2"),
        F.lead("_c1", 1).over(w_a).alias("_c1c"),
    ).filter(F.col("_w2").isNotNull())
    joined = (
        bi.join(
            bi_model,
            (F.col("_w1") == F.col("_w1m")) & (F.col("_w2") == F.col("_w2m")),
            "left",
        )
        .drop("_w1m", "_w2m")
        .crossJoin(F.broadcast(stats))
    )
    av = F.lit(alpha) * F.col("_V").cast("double")
    p_bi = (F.coalesce(F.col("_c2"), F.lit(0)).cast("double") + F.lit(alpha)) / (
        F.coalesce(F.col("_c1p"), F.lit(0)).cast("double") + av
    )
    p_uni = (F.coalesce(F.col("_c1c"), F.lit(0)).cast("double") + F.lit(alpha)) / (
        F.col("_T").cast("double") + av
    )
    lnp = F.round(F.log(F.lit(lam) * p_bi + F.lit(1.0 - lam) * p_uni), 9)
    return joined.select("_id", "_pos", lnp.alias("_lnp"))


def lm_score_with_model(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    uni: DataFrame,
    bi_model: DataFrame,
    stats: DataFrame,
    lam: float = 0.5,
    alpha: float = 0.5,
) -> DataFrame:
    """The ``lm_score`` scoring half over PROVIDED (frozen) model
    tables — arithmetic identical to ``lm_score`` by construction
    (``lm_score`` delegates here). Stateless given the model: one pass
    over ``docs``, two vocab-bounded lookups."""
    folded = (
        _lm_scored_rows(docs, id_col, text_col, uni, bi_model, stats, lam, alpha)
        .groupBy("_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.aggregate(
                F.transform(
                    F.sort_array(
                        F.collect_list(
                            F.struct(F.col("_pos").alias("p"), F.col("_lnp").alias("l"))
                        )
                    ),
                    lambda s: s.getField("l"),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("_s"),
        )
        .select(
            "_id",
            "n_bigrams",
            F.round(-F.col("_s") / F.col("n_bigrams").cast("double"), 9).alias(
                "nll_r"
            ),
        )
    )
    return (
        docs.select(F.col(id_col))
        .join(folded.withColumnRenamed("_id", id_col), id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_bigrams"), F.lit(0)).alias("n_bigrams"),
            F.col("nll_r"),
        )
    )


def bpe_merges(
    docs: DataFrame,
    text_col: str,
    num_merges: int = 3,
) -> DataFrame:
    """BPE merge induction (Sennrich et al. 2016): learn the first
    ``num_merges`` byte-pair merges from the corpus — the
    tokenizer-training primitive. Classic formulation: aggregate the
    corpus to its word-frequency table ONCE, split words into character
    symbols, then per round (a) count adjacent symbol pairs weighted by
    word frequency, (b) pick the max-count pair (ties break to the
    lexicographically largest pair — deterministic struct max on both
    engines), (c) rewrite every word's symbol sequence with a greedy
    left-to-right merge fold.

    The merge rewrite is a sequential array fold (``F.aggregate`` with a
    list accumulator; DuckDB mirrors it with ``list_reduce`` over
    singleton lists) — identical greedy semantics on both engines, so
    the merge table hash-matches exactly.

    Scale (100 TB): the corpus is touched ONCE (the word-frequency
    aggregation — partial-agg, vocabulary-bounded output). Every merge
    round runs on the persisted vocab table (|vocab| rows), with the
    1-row best-pair aggregate broadcast back (allow-listed cross join)
    — round cost is independent of corpus size, exactly how production
    BPE trainers work on the word-count table.

    Output: (rank, p1, p2, cnt) — one row per learned merge, rank 1..M.
    """
    if num_merges < 1:
        raise ValueError("num_merges must be >= 1")
    syms_df = _bpe_vocab_syms(docs, text_col)
    bests = []
    for rnd in range(num_merges):
        best = _bpe_best_pair(syms_df, rnd)
        bests.append(best)
        if rnd == num_merges - 1:
            break
        syms_df = _bpe_apply_merge(syms_df, best)
    out = bests[0]
    for b in bests[1:]:
        out = out.unionByName(b)
    return out


def _bpe_vocab_syms(docs: DataFrame, text_col: str) -> DataFrame:
    """The persisted word-frequency table with each word split into
    character symbols — the single corpus pass every BPE round reuses."""

    vocab = (
        docs.select(F.explode(tokens(F.col(text_col))).alias("_w"))
        .groupBy("_w")
        .agg(F.count(F.lit(1)).alias("_f"))
    )
    chars = F.when(
        F.length("_w") > 0,
        F.transform(
            F.sequence(F.lit(1), F.length("_w")),
            lambda i: F.col("_w").substr(i, F.lit(1)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return vocab.select("_w", "_f", chars.alias("_syms")).transform(persist_if_uncached)


def _bpe_best_pair(syms_df: DataFrame, rnd: int) -> DataFrame:
    """One merge round's winner: weighted adjacent-pair count over the
    vocab symbol table, struct-max tie-broken (cnt, p1, p2) — a 1-row
    frame (rank, p1, p2, cnt)."""
    empty_pairs = F.array().cast("array<struct<p1:string,p2:string>>")
    pairs = F.when(
        F.size("_syms") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("_syms") - 1),
            lambda i: F.struct(
                F.element_at(F.col("_syms"), i).alias("p1"),
                F.element_at(F.col("_syms"), i + 1).alias("p2"),
            ),
        ),
    ).otherwise(empty_pairs)
    counts = (
        syms_df.select("_f", F.explode(pairs).alias("_p"))
        .groupBy("_p.p1", "_p.p2")
        .agg(F.sum("_f").alias("cnt"))
    )
    return counts.agg(
        F.max(
            F.struct(
                F.col("cnt").alias("cnt"),
                F.col("p1").alias("p1"),
                F.col("p2").alias("p2"),
            )
        ).alias("_b")
    ).select(
        F.lit(rnd + 1).cast("long").alias("rank"),
        F.col("_b.p1").alias("p1"),
        F.col("_b.p2").alias("p2"),
        F.col("_b.cnt").alias("cnt"),
    )


def _bpe_apply_merge(syms_df: DataFrame, best: DataFrame) -> DataFrame:
    """Rewrite every word's symbol sequence with a greedy left-to-right
    fold of the broadcast 1-row winning pair."""
    merged = F.concat(F.col("p1"), F.col("p2"))
    fold = F.aggregate(
        F.transform(F.col("_syms"), lambda s: F.array(s)),
        F.array().cast("array<string>"),
        # F.get (NULL out-of-bounds) not element_at (throws under the
        # ANSI mode a vanilla Spark 4 session runs with; AND does not
        # short-circuit in SQL, so the size guard alone cannot save
        # an out-of-bounds probe on the empty accumulator)
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.get(acc, F.size(acc) - 1) == F.col("p1"))
            & (F.get(x, F.lit(0)) == F.col("p2")),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(merged)
            ),
        ).otherwise(F.concat(acc, x)),
    )
    return syms_df.crossJoin(F.broadcast(best)).select(
        "_w", "_f", fold.alias("_syms")
    )


def bpe_token_counts(
    docs: DataFrame,
    text_col: str,
    num_merges: int = 3,
) -> DataFrame:
    """Apply a freshly-trained BPE tokenizer back to the corpus and
    return the resulting token histogram — the encode half of the
    train/encode loop (``bpe_merges`` is the train half, sharing the
    same round helpers, so both replay identical greedy-fold
    arithmetic).

    Every learned merge — including the last — rewrites the vocab
    symbol table; the histogram is then the symbol explode weighted by
    word frequency. Token counts over the MERGED vocabulary are the
    standard post-training sanity check (which merges actually fire,
    what the unigram distribution of the new units looks like) and the
    input to vocabulary-size decisions.

    Scale (100 TB): identical profile to ``bpe_merges`` — the corpus is
    touched once for the word-frequency table; every round and the
    final explode run on the |vocab|-bounded symbol table with the
    1-row winner broadcast back. Encoding never touches raw documents.

    Output: (token, cnt) — one row per post-merge symbol.
    """
    if num_merges < 1:
        raise ValueError("num_merges must be >= 1")
    syms_df = _bpe_vocab_syms(docs, text_col)
    for rnd in range(num_merges):
        best = _bpe_best_pair(syms_df, rnd)
        syms_df = _bpe_apply_merge(syms_df, best)
    return (
        syms_df.select("_f", F.explode("_syms").alias("token"))
        .groupBy("token")
        .agg(F.sum("_f").cast("long").alias("cnt"))
    )


def bpe_encode_docs(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    num_merges: int = 3,
) -> DataFrame:
    """Per-DOCUMENT BPE encoding: train ``num_merges`` merges on the
    corpus (shared round helpers with ``bpe_merges``), then score every
    document's token count under the learned tokenizer — the number the
    packing/sharding pipeline actually needs (``bpe_token_counts`` only
    reports the corpus-level histogram).

    Word-level factoring keeps encoding off the raw text: a document's
    BPE length is Σ_w count_d(w) · |merged_syms(w)|, so the per-doc pass
    joins the (doc, word, count) explode against the |vocab|-row merged
    symbol table and never re-runs the merge fold per document — the
    same trick production tokenizers use (encode the vocabulary once,
    look words up).

    Scale (100 TB): two corpus passes total — the word-frequency
    aggregation that trains the merges (partial-agg, vocab-bounded
    output) and the (doc, word) explode that scores documents (map-side
    combine on (doc, word)). The join key is the word; the vocab side
    is corpus-bounded (|distinct words|), broadcastable for real
    vocabularies, and skew-free on the build side (one row per word).
    Token-less documents (empty text) score 0 via the left join.

    Output: (id_col, n_words, n_bpe_tokens) — one row per input doc.
    """
    if num_merges < 1:
        raise ValueError("num_merges must be >= 1")
    syms_df = _bpe_vocab_syms(docs, text_col)
    for rnd in range(num_merges):
        best = _bpe_best_pair(syms_df, rnd)
        syms_df = _bpe_apply_merge(syms_df, best)
    word_len = syms_df.select(
        "_w", F.size("_syms").cast("long").alias("_wlen")
    )
    doc_words = (
        docs.select(
            F.col(id_col).alias("_id"),
            F.explode(tokens(F.col(text_col))).alias("_w"),
        )
        # whitespace-split of empty text yields the '' token, which IS
        # in the trained vocab (with empty syms) — without this filter
        # an empty doc scores n_words=1, n_bpe_tokens=0 instead of 0/0
        .filter(F.col("_w") != "")
        .groupBy("_id", "_w")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    per_doc = doc_words.join(word_len, "_w").groupBy("_id").agg(
        F.sum("_c").cast("long").alias("n_words"),
        F.sum(F.col("_c") * F.col("_wlen")).cast("long").alias("n_bpe_tokens"),
    )
    return (
        docs.select(F.col(id_col))
        .join(per_doc.withColumnRenamed("_id", id_col), id_col, "left")
        .select(
            id_col,
            F.coalesce("n_words", F.lit(0)).cast("long").alias("n_words"),
            F.coalesce("n_bpe_tokens", F.lit(0))
            .cast("long")
            .alias("n_bpe_tokens"),
        )
    )


def blocklist_filter(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    blockwords: list[str],
) -> DataFrame:
    """C4-style bad-words document filter (Raffel et al. 2020 §2.2 —
    C4 drops any page containing a word from a public blocklist): a doc
    is dropped if ANY whitespace token, lowercased, is in
    ``blockwords``. Token-level membership, not substring — 'class'
    never matches a blocklist entry 'ass' (the standard footgun of the
    naive contains-scan).

    Expression-only: array_intersect of the lowered token array with
    the literal blockword array (size-bounded by the list, InSet-style
    — a PSL-scale word list would broadcast-anti-join a token explode
    instead, same escalation as registered_domain_join). One scan, no
    shuffle; the filter pushes into the projection.

    Output: input columns + ``n_blockword_hits`` for surviving docs
    (always 0 by construction) dropped; just the surviving rows.
    """
    t = tokens(F.col(text_col))
    hits = F.size(
        F.array_intersect(
            F.transform(t, F.lower),
            F.array(*[F.lit(w.lower()) for w in blockwords]),
        )
    )
    return docs.where(hits == 0)

def line_digest_rows(
    docs: DataFrame, id_col: str, lines_col: str
) -> DataFrame:
    """The (_id, _pos, _h) line-digest explode shared by both halves of
    ``line_dedup`` — one row per (doc, line position) carrying only the
    16-byte md5 of the line, never the text."""
    return docs.select(
        F.col(id_col).alias("_id"),
        F.posexplode(F.col(lines_col)).alias("_pos", "_ln"),
    ).select("_id", "_pos", F.md5(F.col("_ln")).alias("_h"))


def line_dedup(
    docs: DataFrame,
    id_col: str,
    lines_col: str,
    min_docs: int = 2,
    sep: str = "\n",
    share_digest: bool = False,
) -> DataFrame:
    """RefinedWeb/CCNet-style boilerplate line removal (Penedo et al.
    2023 §G; Wenzek et al. 2020 §4.1): any line whose digest appears in
    at least ``min_docs`` DISTINCT documents is removed from EVERY
    document. Unlike ``span_dedup`` (which keeps the globally-first
    occurrence of a repeated span), boilerplate removal wants NO copy
    kept — navigation bars, cookie banners, and footers repeated across
    a site carry no training signal at all.

    Plan shape (100 TB): document text NEVER shuffles. The explode
    carries only (id, pos, md5(line)) — 16-byte digests; line
    document-frequency is a distinct + count over digests; the removal
    list per doc is a tiny (id, positions[]) table that AQE broadcasts
    back onto the corpus scan (docs with no boilerplate hit never leave
    their input partition when the broadcast applies; otherwise one
    id-hash exchange of the positions table, never of text). The
    rebuild is an index-filter expression over the in-place lines
    array.

    Output: (id_col, text_clean, n_lines_kept, n_lines_removed) — one
    row per input doc; a doc whose every line is boilerplate survives
    with text_clean = '' and n_lines_kept = 0.

    Reference parity note: the reference engine has no text operators
    at all (SURVEY.md §2.3) — this is a north-star extension.

    ``share_digest``: explode + hash the corpus ONCE — persist the
    (_id, _pos, _h) digest frame and feed both the document-frequency
    aggregation and the removal join from the same cache (default runs
    the explode twice, once per half). The cache is digest-sized
    (id + pos + 16-byte hash per line), never text-sized; the heavy-
    line aggregation sits on the build side of the removal join, so its
    stage materializes the cache before the probe side's second read
    (the ``share_grams`` sequencing argument in similarity.py). The
    persisted handle rides on the result as ``_sg_internal_cache`` so
    callers can unpersist once materialized. At cluster scale where
    even the digest frame is unwelcome in cache, leave the default:
    two digest explodes, zero cache pressure.
    """
    if share_digest:

        digest = line_digest_rows(docs, id_col, lines_col).transform(persist_if_uncached)
        heavy = (
            digest.select("_id", "_h")
            .distinct()
            .groupBy("_h")
            .agg(F.count(F.lit(1)).alias("_df"))
            .filter(F.col("_df") >= min_docs)
            .select("_h")
        )
        out = _line_rebuild(docs, id_col, lines_col, digest, heavy, sep)
        out._sg_internal_cache = digest
        return out
    heavy = boilerplate_lines(docs, id_col, lines_col, min_docs)
    return line_dedup_with_lines(docs, id_col, lines_col, heavy, sep=sep)


def boilerplate_lines(
    docs: DataFrame,
    id_col: str,
    lines_col: str,
    min_docs: int = 2,
) -> DataFrame:
    """The corpus-global half of ``line_dedup``, exposed so the heavy-
    line set can be trained once in batch, FROZEN to parquet, and
    applied statelessly to a stream (same freeze/apply split as
    ``lm_model`` / ``nb_quality_model``). Returns the 1-column ``_h``
    table of md5 digests of lines appearing in >= ``min_docs`` distinct
    documents — bounded by the boilerplate population, tiny next to the
    corpus."""
    lines = line_digest_rows(docs, id_col, lines_col).select("_id", "_h")
    return (
        lines.distinct()
        .groupBy("_h")
        .agg(F.count(F.lit(1)).alias("_df"))
        .filter(F.col("_df") >= min_docs)
        .select("_h")
    )


def line_dedup_with_lines(
    docs: DataFrame,
    id_col: str,
    lines_col: str,
    heavy: DataFrame,
    sep: str = "\n",
) -> DataFrame:
    """The apply half of ``line_dedup`` over a PROVIDED (frozen) heavy-
    line digest table — stateless given ``heavy``, so it drops into a
    streaming foreachBatch unchanged."""
    lines = line_digest_rows(docs, id_col, lines_col)
    return _line_rebuild(docs, id_col, lines_col, lines, heavy, sep)


def _line_rebuild(
    docs: DataFrame,
    id_col: str,
    lines_col: str,
    digest: DataFrame,
    heavy: DataFrame,
    sep: str,
) -> DataFrame:
    """Shared apply half: join the digest rows against the heavy-line
    set, collect per-doc removal positions, rebuild each doc's lines
    array in place."""
    rm = (
        digest.join(heavy, "_h")
        .groupBy("_id")
        .agg(F.collect_list("_pos").alias("_rm"))
    )
    rm_arr = F.coalesce(
        F.col("_rm"), F.expr("CAST(array() AS array<int>)")
    )
    kept = F.filter(
        F.col(lines_col),
        lambda x, i: ~F.array_contains(rm_arr, i),
    )
    return (
        docs.join(rm, docs[id_col] == rm["_id"], "left")
        .select(
            F.col(id_col),
            F.concat_ws(sep, kept).alias("text_clean"),
            (F.size(F.col(lines_col)) - F.coalesce(F.size("_rm"), F.lit(0)))
            .cast("long")
            .alias("n_lines_kept"),
            F.coalesce(F.size("_rm"), F.lit(0)).cast("long")
            .alias("n_lines_removed"),
        )
    )

def lm_perplexity_buckets(
    scored: DataFrame,
    nll_col: str = "nll_r",
    probs: tuple[float, float] = (0.25, 0.75),
    labels: tuple[str, str, str] = ("head", "middle", "tail"),
) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020 §4.3): split
    the corpus into head / middle / tail by corpus-level quantiles of
    the per-doc LM score (low nll = fluent, in-domain). CCNet keeps the
    head and middle thirds and drops (or down-weights) the tail; this
    returns the label so the policy stays with the caller.

    ``probs`` must be DYADIC quantile points (0.25/0.5/0.75): the exact
    ``percentile`` aggregate linear-interpolates a + (b - a) * f, and a
    dyadic f makes the interpolation bit-identical to DuckDB's
    ``quantile_cont`` (same convention as operators/profile.py
    percentile_profile). At 100 TB the thresholds would come from
    ``approx_percentile`` over the same single pass — the plan shape
    (one scan + a 1-row threshold aggregate broadcast back over the
    scored rows) is unchanged.

    Docs with NULL score (< 2 tokens: no bigram evidence) get label
    NULL — no evidence, no bucket.

    Output: scored's columns + ``bucket``.
    """
    lo, hi = probs
    thr = scored.filter(F.col(nll_col).isNotNull()).agg(
        F.expr(f"percentile({nll_col}, {lo})").alias("_plo"),
        F.expr(f"percentile({nll_col}, {hi})").alias("_phi"),
    )
    head, middle, tail = labels
    bucket = (
        F.when(F.col(nll_col).isNull(), F.lit(None).cast("string"))
        .when(F.col(nll_col) <= F.col("_plo"), F.lit(head))
        .when(F.col(nll_col) <= F.col("_phi"), F.lit(middle))
        .otherwise(F.lit(tail))
    )
    return (
        scored.crossJoin(F.broadcast(thr))
        .withColumn("bucket", bucket)
        .drop("_plo", "_phi")
    )

def nb_quality_model(
    docs: DataFrame,
    text_col: str,
    positive_pred,
    alpha: float = 1.0,
) -> tuple[DataFrame, DataFrame]:
    """Train the token log-odds model for ``nb_quality_score`` — exposed
    separately so it can be frozen to parquet and applied statelessly
    (same freeze/apply split as ``lm_model`` / ``lm_score_with_model``).

    Returns (model, stats): per-token ``(_w, _lo)`` rounded log-odds
    rows (vocab-bounded) and the 1-row ``(_dlo)`` default log-odds for
    tokens unseen in training. Log-odds use Laplace smoothing:
    lo(w) = ln((cp + a)/(Tp + a·V)) - ln((cn + a)/(Tn + a·V)) with cp/cn
    the positive/negative class token counts, Tp/Tn the class totals, V
    the training vocabulary — exact integers in, one 9-decimal-rounded
    double out, so both engines land on identical model rows.
    """
    tok = docs.select(
        positive_pred.alias("_y"),
        F.explode(tokens(F.col(text_col))).alias("_w"),
    )
    counts = tok.groupBy("_w").agg(
        F.sum(F.when(F.col("_y"), 1).otherwise(0)).alias("_cp"),
        F.sum(F.when(F.col("_y"), 0).otherwise(1)).alias("_cn"),
    )
    stats = counts.agg(
        F.sum("_cp").alias("_tp"),
        F.sum("_cn").alias("_tn"),
        F.count(F.lit(1)).alias("_v"),
    )
    a = F.lit(alpha)

    def _lo(cp, cn, tp, tn, v):
        av = a * v.cast("double")
        return F.round(
            F.log((cp.cast("double") + a) / (tp.cast("double") + av))
            - F.log((cn.cast("double") + a) / (tn.cast("double") + av)),
            9,
        )

    model = counts.crossJoin(F.broadcast(stats)).select(
        "_w",
        _lo(F.col("_cp"), F.col("_cn"), F.col("_tp"), F.col("_tn"),
            F.col("_v")).alias("_lo"),
    )
    default = stats.select(
        _lo(F.lit(0), F.lit(0), F.col("_tp"), F.col("_tn"),
            F.col("_v")).alias("_dlo")
    )
    return model, default


def nb_quality_score(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    positive_pred,
    alpha: float = 1.0,
) -> DataFrame:
    """fastText-lineage model-based quality scoring (the GPT-3 / PaLM
    "classifier trained on a curated seed vs the raw crawl" filter,
    Brown et al. 2020 §A): a Naive-Bayes token log-odds model is trained
    with ``positive_pred`` marking the curated class, then every doc is
    scored by the MEAN token log-odds — positive means "reads like the
    curated seed". The linear-in-token-counts shape is exactly a
    fastText classifier with unigram features and frozen softmax.

    Deterministic cross-engine: class counts are exact integers, each
    token's log-odds rounds to the 9-decimal grid, the per-doc sum folds
    in token POSITION order, the mean rounds again (conventions of
    ``lm_score``).

    Plan shape (100 TB): ONE token-explode aggregation trains the model
    (conditional sums per token — partial aggregation map-side), a
    1-row class-totals broadcast finishes it; scoring is one corpus pass
    with a single vocab-bounded model lookup (AQE broadcasts it when it
    fits) and a per-doc sorted-array fold — no window, no second corpus
    pass, text never shuffles (only (id, pos, token) rows).

    Output: (id_col, n_tokens, logodds_r, keep) with keep = logodds_r > 0.
    """
    model, default = nb_quality_model(docs, text_col, positive_pred, alpha)
    return nb_score_with_model(docs, id_col, text_col, model, default)


def nb_score_with_model(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    model: DataFrame,
    default: DataFrame,
) -> DataFrame:
    """The ``nb_quality_score`` scoring half over PROVIDED (frozen)
    model tables — arithmetic identical by delegation, stateless given
    the model, so it drops into a streaming ``doc_filter`` hook
    unchanged (same split as ``lm_score_with_model``). Tokens unseen in
    training fall back to the 1-row ``default`` log-odds."""
    tok = docs.select(
        F.col(id_col).alias("_id"),
        F.posexplode(tokens(F.col(text_col))).alias("_pos", "_w"),
    )
    scored = (
        tok.join(model, "_w", "left")
        .crossJoin(F.broadcast(default))
        .select("_id", "_pos", F.coalesce("_lo", "_dlo").alias("_lo"))
    )
    folded = (
        scored.groupBy("_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.aggregate(
                F.transform(
                    F.sort_array(
                        F.collect_list(
                            F.struct(F.col("_pos").alias("p"),
                                     F.col("_lo").alias("l"))
                        )
                    ),
                    lambda s: s.getField("l"),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("_s"),
        )
        .select(
            "_id",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.round(F.col("_s") / F.col("n_tokens").cast("double"), 9).alias(
                "logodds_r"
            ),
        )
    )
    return (
        docs.select(F.col(id_col))
        .join(folded.withColumnRenamed("_id", id_col), id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_tokens"), F.lit(0)).alias("n_tokens"),
            F.col("logodds_r"),
            (F.col("logodds_r") > 0).alias("keep"),
        )
    )


def quality_signals(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """RedPajama-v2-style per-document quality-signal bundle (Together
    2023, "RedPajama-Data-v2"; the flat signal table every downstream
    filter reads instead of re-deriving its own stats): one wide row per
    document carrying the standard lexical statistics —

    - ``n_words`` / ``n_chars``: whitespace token count, raw length
    - ``mean_word_len_r``: word chars / words
    - ``frac_unique_r``: distinct words / words (type-token ratio;
      low = repetitive boilerplate)
    - ``top_word_frac_r``: occurrences of the modal word / words
      (Gopher's "fraction in most common word" analog)
    - ``stop_frac_r``: STOPWORDS_EN hits / words (fluency proxy)

    Ratios are IEEE double divisions of exact integer counts, rounded
    to the 9-decimal grid (repo convention) — bit-identical on any
    engine. Empty/whitespace-only docs carry ``n_words = 0`` and NULL
    ratios (the '' token from splitting empty text is filtered, the
    ``_dsir_gram_rows`` convention).

    Plan shape (100 TB): the array-expression signals are a narrow
    single pass fused into the scan; only the modal-word count needs
    rows — one posexplode + (id, word) count + per-id max, all on the
    hash(id) exchange the final join reuses (subset rule). Nothing
    corpus-global, nothing driver-side.

    Reference parity note: the reference engine has no text operators
    (SURVEY.md §2.3) — north-star extension.
    """
    toks = F.filter(tokens(F.col(text_col)), lambda t: t != "")
    wc = F.size(toks)
    word_chars = F.aggregate(
        F.transform(toks, lambda t: F.length(t).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    stop_hits = F.size(
        F.filter(toks, lambda t: t.isin(*STOPWORDS_EN))
    )
    base = docs.select(
        F.col(id_col),
        wc.cast("long").alias("n_words"),
        F.length(F.col(text_col)).cast("long").alias("n_chars"),
        word_chars.alias("_wchars"),
        F.size(F.array_distinct(toks)).cast("long").alias("_uniq"),
        stop_hits.cast("long").alias("_stop"),
    )
    top = (
        docs.select(
            F.col(id_col).alias("_id"),
            F.explode(toks).alias("_w"),
        )
        .groupBy("_id", "_w")
        .agg(F.count(F.lit(1)).alias("_c"))
        .groupBy("_id")
        .agg(F.max("_c").alias("_top"))
    )
    wcd = F.col("n_words").cast("double")
    return (
        base.join(
            top.withColumnRenamed("_id", id_col), id_col, "left"
        )
        .select(
            id_col,
            "n_words",
            "n_chars",
            F.when(
                F.col("n_words") > 0,
                F.round(F.col("_wchars").cast("double") / wcd, 9),
            ).alias("mean_word_len_r"),
            F.when(
                F.col("n_words") > 0,
                F.round(F.col("_uniq").cast("double") / wcd, 9),
            ).alias("frac_unique_r"),
            F.when(
                F.col("n_words") > 0,
                F.round(F.col("_top").cast("double") / wcd, 9),
            ).alias("top_word_frac_r"),
            F.when(
                F.col("n_words") > 0,
                F.round(F.col("_stop").cast("double") / wcd, 9),
            ).alias("stop_frac_r"),
        )
    )


def ngram_diversity(
    docs: DataFrame,
    group_col: str,
    text_col: str,
    id_col: str,
    max_n: int = 3,
) -> DataFrame:
    """Distinct-n diversity profile per corpus slice (Li et al. 2016
    "distinct-1/2" generalized to a corpus audit): for each ``group_col``
    value and each n in 1..``max_n``, total n-gram occurrences vs
    distinct n-grams and their ratio — the standard lexical-diversity /
    memorization-risk dashboard over a training mix (a slice whose
    diversity collapses is template spam or a dedup failure).

    Output: (group, n, total_ngrams, distinct_ngrams, diversity_r)
    with diversity_r = distinct/total on the 9-decimal grid.

    Plan shape (100 TB): per n one gram pass (posexplode + per-DOC lead
    window — grams never cross document boundaries and the window key
    is the high-cardinality doc id, not the handful of groups) into a
    (group, gram) count — partial aggregation absorbs the duplicate
    mass map-side, so the exchange carries distinct (group, gram)
    pairs, not occurrences; the per-group rollup is |groups|-sized.
    The n passes union after aggregation (each a few rows per group).
    """
    out = None
    for n in range(1, max_n + 1):
        toks = docs.select(
            F.col(group_col).alias("_grp"),
            F.col(id_col).alias("_id"),
            F.posexplode(tokens(F.col(text_col))).alias("_pos", "_t"),
        )
        if n == 1:
            grams = toks.select("_grp", F.col("_t").alias("_g"))
        else:
            w = Window.partitionBy("_id").orderBy("_pos")
            leads = [F.lead("_t", i).over(w) for i in range(1, n)]
            grams = (
                toks.select(
                    "_grp",
                    F.concat_ws(" ", F.col("_t"), *leads).alias("_g"),
                    leads[-1].alias("_last"),
                )
                .filter(F.col("_last").isNotNull())
                .drop("_last")
            )
        grams = grams.filter(F.col("_g") != "")
        agg = (
            grams.groupBy("_grp", "_g")
            .agg(F.count(F.lit(1)).alias("_c"))
            .groupBy("_grp")
            .agg(
                F.sum("_c").alias("total_ngrams"),
                F.count(F.lit(1)).alias("distinct_ngrams"),
            )
            .select(
                F.col("_grp").alias(group_col),
                F.lit(n).alias("n"),
                F.col("total_ngrams").cast("long").alias("total_ngrams"),
                F.col("distinct_ngrams").cast("long").alias("distinct_ngrams"),
                F.round(
                    F.col("distinct_ngrams").cast("double")
                    / F.col("total_ngrams").cast("double"),
                    9,
                ).alias("diversity_r"),
            )
        )
        out = agg if out is None else out.unionByName(agg)
    return out


def lm_burstiness(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    target_pred,
    lam: float = 0.5,
    alpha: float = 0.5,
) -> DataFrame:
    """Machine-generated-text heuristic: per-document mean AND spread
    of token-level log-probabilities under the frozen bigram model —
    the perplexity + burstiness pair (Gehrmann et al. 2019 GLTR;
    popularized by MGT detectors): human text is "bursty" (high
    variance across positions — some tokens surprise the model), while
    sampled/templated text is uniformly probable (low spread at a given
    mean). Emits the statistics; the gate policy (e.g. flag low-std
    low-nll docs) belongs downstream.

    Arithmetic: per-position lnp rounds to the 9-decimal grid
    (identical to ``lm_score`` — shared ``_lm_scored_rows`` pass), then
    TWO position-ordered folds per doc (Σ lnp and Σ round(lnp², 9)),
    population variance s2/n − (s1/n)², clamped at 0 before the sqrt;
    mean and std land back on the 9-decimal grid. Bit-identical
    cross-engine: both engines fold the same rounded doubles in the
    same order.

    Output: (id_col, n_bigrams, nll_r, nll_std_r); docs with < 2
    tokens carry NULLs and n_bigrams = 0.

    Plan shape (100 TB): identical to ``lm_score`` — two narrow
    target-subset passes build the model, one corpus pass scores;
    the extra moment rides the SAME per-doc fold (no new exchange).
    """
    uni, bi_model, stats = lm_model(docs, text_col, target_pred, id_col)
    scored = _lm_scored_rows(
        docs, id_col, text_col, uni, bi_model, stats, lam, alpha
    )
    ordered = F.transform(
        F.sort_array(
            F.collect_list(
                F.struct(F.col("_pos").alias("p"), F.col("_lnp").alias("l"))
            )
        ),
        lambda s: s.getField("l"),
    )
    folded = (
        scored.groupBy("_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.aggregate(
                ordered, F.lit(0.0), lambda acc, x: acc + x
            ).alias("_s1"),
            F.aggregate(
                ordered,
                F.lit(0.0),
                lambda acc, x: acc + F.round(x * x, 9),
            ).alias("_s2"),
        )
        .select(
            "_id",
            "n_bigrams",
            F.round(
                -F.col("_s1") / F.col("n_bigrams").cast("double"), 9
            ).alias("nll_r"),
            F.round(
                F.sqrt(
                    F.greatest(
                        F.col("_s2") / F.col("n_bigrams").cast("double")
                        - (F.col("_s1") / F.col("n_bigrams").cast("double"))
                        * (F.col("_s1") / F.col("n_bigrams").cast("double")),
                        F.lit(0.0),
                    )
                ),
                9,
            ).alias("nll_std_r"),
        )
    )
    return (
        docs.select(F.col(id_col))
        .join(folded.withColumnRenamed("_id", id_col), id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_bigrams"), F.lit(0)).alias("n_bigrams"),
            F.col("nll_r"),
            F.col("nll_std_r"),
        )
    )


def zipf_fit(
    docs: DataFrame,
    text_col: str,
    min_count: int = 2,
    top_ranks: int | None = None,
) -> DataFrame:
    """Zipf power-law fit over the corpus rank-frequency curve: OLS of
    ln(freq) on ln(rank) across the vocabulary — the one-row corpus-audit
    answer to "does this corpus look like natural language". Natural text
    sits near slope -1; boilerplate-heavy or template-generated corpora
    flatten the head (slope > -0.8-ish), and a synthetic vocabulary
    truncates the tail. Diffing the slope across crawl snapshots is a
    cheap drift alarm before any model sees the data.

    Determinism (cross-engine hash parity): per-row ln() values round to
    the 9-decimal grid, then fold as DECIMAL(38,9) — exact, order-free
    sums (the lm-score convention); the closed-form OLS scalars divide
    identically-structured doubles, and the outputs round to 9.

    Scale (100 TB): token counting is explode + hash-agg with map-side
    combine (shuffle bounded by distinct tokens per partition). The
    global frequency rank uses NO single-partition window — it decomposes
    into (a) a distinct-frequency offsets table (one row per distinct
    count value, cumulative window over that tiny table only) and (b) a
    per-frequency ``row_number`` partitioned by count — the
    ``shard_plan_bytes`` decomposition. The fold to one row is a plain
    aggregate. ``min_count`` trims the hapax tail (rank ties there carry
    no fit information and dominate |V| otherwise).

    ``top_ranks``: fit only the head of the curve (ranks 1..K). The
    full-tail fit moves when the crawl's tail vocabulary churns between
    snapshots even if the language is unchanged; the head-only variant
    diffs stably across snapshots. ``vocab_size`` still reports the
    FULL above-``min_count`` vocabulary either way (the fit scope is
    the knob, not the census).

    Output: one row (vocab_size, zipf_slope, zipf_intercept). vocab_size
    < 2 would make the OLS denominator 0 -> NaN; real corpora are far
    from that edge.
    """
    counts = (
        docs.select(F.explode(tokens(text_col)).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") >= int(min_count))
    )
    by_n = counts.groupBy("_n").agg(F.count(F.lit(1)).alias("_c"))
    # metadata-sized frame (count-of-counts: one row per distinct token
    # frequency) — see window.global_ordered_window for the pinned task
    w_off = global_ordered_window(F.col("_n"), F.col("_n").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = by_n.select(
        "_n", F.coalesce(F.sum("_c").over(w_off), F.lit(0)).alias("_off")
    )
    w_in = Window.partitionBy("_n").orderBy("token")
    ranked = counts.join(F.broadcast(offsets), "_n").withColumn(
        "_rank", F.col("_off") + F.row_number().over(w_in)
    )
    if top_ranks is not None:
        # head-only fit: carry the FULL vocab census through the rank
        # filter via a 1-row broadcast (the registered full-tail query
        # keeps the plain count — no extra join in its plan)
        if top_ranks < 2:
            raise ValueError("top_ranks must be >= 2")
        ranked = ranked.crossJoin(
            F.broadcast(
                counts.agg(F.count(F.lit(1)).cast("long").alias("_nv"))
            )
        ).filter(F.col("_rank") <= int(top_ranks))
    x = F.round(F.log(F.col("_rank").cast("double")), 9)
    y = F.round(F.log(F.col("_n").cast("double")), 9)
    census = (
        [F.col("_nv")] if top_ranks is not None else [F.lit(None).cast("long").alias("_nv")]
    )
    terms = ranked.select(
        x.cast("decimal(38,9)").alias("_x"),
        y.cast("decimal(38,9)").alias("_y"),
        F.round(x * y, 9).cast("decimal(38,9)").alias("_xy"),
        F.round(x * x, 9).cast("decimal(38,9)").alias("_xx"),
        *census,
    )
    s = terms.agg(
        F.count(F.lit(1)).alias("_nn"),
        F.sum("_x").alias("_sx"),
        F.sum("_y").alias("_sy"),
        F.sum("_xy").alias("_sxy"),
        F.sum("_xx").alias("_sxx"),
        F.first("_nv").alias("_nvf"),
    )
    nn = F.col("_nn").cast("double")
    sx = F.col("_sx").cast("double")
    sy = F.col("_sy").cast("double")
    sxy = F.col("_sxy").cast("double")
    sxx = F.col("_sxx").cast("double")
    raw = s.select(
        F.coalesce(F.col("_nvf"), F.col("_nn")).cast("long").alias("vocab_size"),
        ((nn * sxy - sx * sy) / (nn * sxx - sx * sx)).alias("_slope"),
        sx.alias("_sxd"),
        sy.alias("_syd"),
        nn.alias("_nd"),
    )
    return raw.select(
        "vocab_size",
        F.round(F.col("_slope"), 9).alias("zipf_slope"),
        F.round(
            (F.col("_syd") - F.col("_slope") * F.col("_sxd")) / F.col("_nd"), 9
        ).alias("zipf_intercept"),
    )


def contamination_scrub(
    docs: DataFrame, id_col: str, text_col: str, patterns: list[str]
) -> DataFrame:
    """Span-level decontamination: REMOVE benchmark needle strings from
    document text instead of dropping the whole document (the
    open-source eval-decontamination recipe when the document is
    otherwise good training material — `contamination_scan` is the
    detect/drop half, this is the rewrite half).

    Per doc: every occurrence of every pattern is deleted (literal
    replace-all, applied in list order), and ``n_hits`` counts total
    occurrences on the ORIGINAL text — exact via the length-delta
    identity occurrences = (len(t) - len(replace(t, p, ''))) / len(p),
    all integer arithmetic.

    Scale (100 TB): a chain of codegen literal `replace` expressions —
    narrow, fully pipelined with the scan, no shuffle, no regex engine,
    no Python. For needle sets beyond a few hundred the expression tree
    stops scaling; that regime escalates to the gram-probe join
    (`contamination_scan_join`) to FIND the docs, then scrubs only the
    flagged slice with this pass — document-count-bounded, not
    corpus-bounded.
    """
    if not patterns:
        raise ValueError("patterns must be non-empty")
    orig = F.col(text_col)
    t = orig
    hits = F.lit(0).cast("long")
    for p in patterns:
        if not p:
            raise ValueError("empty pattern")
        occ = (
            (F.length(orig) - F.length(F.replace(orig, F.lit(p), F.lit(""))))
            / F.lit(len(p))
        ).cast("long")
        hits = hits + occ
        t = F.replace(t, F.lit(p), F.lit(""))
    return docs.select(
        F.col(id_col),
        t.alias("text_scrubbed"),
        hits.alias("n_hits"),
    )


LN2 = 0.6931471805599453


def source_divergence(
    docs: DataFrame, source_col: str, text_col: str
) -> DataFrame:
    """Per-source Jensen-Shannon divergence from the corpus unigram
    distribution — the information-theoretic source-drift alarm (a
    source whose JSD jumps between snapshots changed register, language
    mix, or got polluted; bounded in [0, ln 2], so thresholds are
    portable across corpora).

    Decomposition that avoids materializing |sources| x |vocab|: with
    p = in-source rel. freq, q = corpus rel. freq, m = (p+q)/2,

        JSD(s) = 0.5 * SUM_{t in s} [p ln(p/m) + q ln(q/m)]
                 + 0.5 * ln2 * (1 - coverage_s),

    where coverage_s = SUM_{t in s} q_t: tokens ABSENT from the source
    contribute exactly q ln(q/(q/2)) = q ln 2, so their whole mass folds
    into the closed-form tail — only (source, token) pairs that actually
    occur are processed. coverage_s is computed from EXACT integer
    corpus counts (one division at the end), not a float fold.

    Determinism: ln terms round to the 9-decimal grid and fold as
    DECIMAL(38,9) (order-free); the ln 2 constant is a shared literal;
    all divisions are identically-structured double ops. Scale: shuffle
    bounded by distinct (source, token) pairs; the corpus total is a
    1-row broadcast, the per-source totals a |sources|-row join.

    Output: one row per source (source, n_tokens, jsd_r).
    """
    toks = docs.select(
        F.col(source_col).alias("_s"),
        F.explode(tokens(F.col(text_col))).alias("_t"),
    ).filter(F.col("_t") != "")
    st = toks.groupBy("_s", "_t").agg(F.count(F.lit(1)).alias("_c"))
    tot_s = st.groupBy("_s").agg(F.sum("_c").alias("_ns"))
    corpus = st.groupBy("_t").agg(F.sum("_c").alias("_cq"))
    tot = st.agg(F.sum("_c").alias("_n"))
    j = (
        st.join(tot_s, "_s")
        .join(corpus, "_t")
        .crossJoin(F.broadcast(tot))
    )
    p = F.col("_c").cast("double") / F.col("_ns").cast("double")
    q = F.col("_cq").cast("double") / F.col("_n").cast("double")
    m = (p + q) / F.lit(2.0)
    term = F.round(
        p * F.round(F.log(p / m), 9) + q * F.round(F.log(q / m), 9), 9
    ).cast("decimal(38,9)")
    per_s = (
        j.select(
            "_s",
            F.col("_ns"),
            F.col("_n"),
            term.alias("_term"),
            F.col("_cq"),
        )
        .groupBy("_s")
        .agg(
            F.first("_ns").alias("_ns"),
            F.first("_n").alias("_n"),
            F.sum("_term").alias("_ts"),
            F.sum("_cq").alias("_covc"),
        )
    )
    cov = F.col("_covc").cast("double") / F.col("_n").cast("double")
    jsd = F.round(
        F.lit(0.5) * F.col("_ts").cast("double")
        + F.lit(0.5) * F.lit(LN2) * (F.lit(1.0) - cov),
        9,
    )
    return per_s.select(
        F.col("_s").alias("source"),
        F.col("_ns").cast("long").alias("n_tokens"),
        jsd.alias("jsd_r"),
    )


def collocations(
    docs: DataFrame,
    text_col: str,
    min_count: int = 5,
    top_k: int = 50,
) -> DataFrame:
    """PMI collocation extraction (Church & Hanks 1990 association
    ratio): the top multi-word expressions the corpus actually carries —
    bigrams whose observed count beats the independence expectation,
    ``pmi = ln(c_xy * N / (c_x * c_y))`` with N the corpus unigram
    total. The corpus-audit consumer: a crawl slice whose top
    collocations are SEO boilerplate ("click here", "all rights
    reserved") needs curation; a healthy slice surfaces domain phrases.

    ``min_count`` floors the bigram count first — PMI is notoriously
    dominated by hapax pairs (two rare words co-occurring once have
    near-maximal PMI but zero evidence), so the floor IS the operator,
    not a tuning detail.

    Determinism: every count is an exact integer; the PMI decomposes as
    ``ln(c_xy) + ln(N) - ln(c_x) - ln(c_y)``, each ln on the 9-decimal
    grid before the (order-fixed) sum rounds again — no large integer
    products (c_xy * N overflows long at corpus scale), no float folds.
    Tie-break on the bigram string makes the top-k selection total.

    Plan shape (100 TB): bigrams are built INSIDE the token array
    (slice + zip_with — grams never cross doc boundaries and no per-doc
    window shuffle exists, unlike the lead() formulation); the exchanges
    carry distinct unigrams / bigrams after map-side partial counts.
    The >= min_count filter cuts the bigram table before the two
    vocab-keyed joins; N is a 1-row aggregate broadcast. The final
    top-k is TakeOrdered (per-partition heaps + k-row merge), never a
    global sort.

    Output: (bigram, n_xy, n_x, n_y, pmi_r), top ``top_k`` by PMI.
    """
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    w = F.filter(tokens(F.col(text_col)), lambda x: x != "")
    base = docs.select(w.alias("_w"))
    n_tail = F.greatest(F.size("_w") - F.lit(1), F.lit(0))
    pairs = base.select(
        F.explode(
            F.zip_with(
                F.slice("_w", 1, n_tail),
                F.slice("_w", 2, n_tail),
                lambda a, b: F.struct(a.alias("_x"), b.alias("_y")),
            )
        ).alias("_p")
    ).select("_p._x", "_p._y")
    uni = (
        base.select(F.explode("_w").alias("_t"))
        .groupBy("_t")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    tot = uni.agg(F.sum("_c").alias("_n"))
    bi = (
        pairs.groupBy("_x", "_y")
        .agg(F.count(F.lit(1)).alias("_cxy"))
        .filter(F.col("_cxy") >= int(min_count))
    )
    j = (
        bi.join(uni.select(F.col("_t").alias("_x"), F.col("_c").alias("_cx")), "_x")
        .join(uni.select(F.col("_t").alias("_y"), F.col("_c").alias("_cy")), "_y")
        .crossJoin(F.broadcast(tot))
    )
    ln = lambda c: F.round(F.log(F.col(c).cast("double")), 9)  # noqa: E731
    pmi = F.round(ln("_cxy") + ln("_n") - ln("_cx") - ln("_cy"), 9)
    return (
        j.select(
            F.concat_ws(" ", "_x", "_y").alias("bigram"),
            F.col("_cxy").cast("long").alias("n_xy"),
            F.col("_cx").cast("long").alias("n_x"),
            F.col("_cy").cast("long").alias("n_y"),
            pmi.alias("pmi_r"),
        )
        .orderBy(F.col("pmi_r").desc(), "bigram")
        .limit(int(top_k))
    )


def signal_correlations(
    sig: DataFrame,
    cols: list[str],
    scale: int = 10**6,
) -> DataFrame:
    """Pearson correlation matrix over a per-document signal table
    (the quality_signals consumer): which quality signals are
    redundant, which carry independent information — the audit that
    decides whether a new filter stage adds signal or re-measures an
    existing one. Rows with ANY null signal are dropped (the empty-doc
    rows quality_signals nulls out), so every pair sees the same n.

    Cross-engine exactness: each signal is floored to ``scale`` integer
    units; all sums (Sx, Sxx, Sxy) run in DECIMAL(38,0)/HUGEINT over
    those integers — exact and order-free — and the closed-form
    corr = (n*Sxy - Sx*Sy) / sqrt((n*Sxx - Sx^2)(n*Syy - Sy^2))
    touches floats only in the final cast/sqrt/divide/round-9 chain
    (single deterministic IEEE ops). Zero-variance signals yield NULL.

    Scale (100 TB): one pass over the signal table — the k^2-per-row
    pair explode collapses map-side to a k^2-row aggregate (k = a
    handful of signals), the moments side is k rows; everything after
    the partial agg is broadcast arithmetic.

    Output: (sig_a, sig_b, corr_r) for each unordered pair a < b (by
    ``cols`` position) — k*(k-1)/2 rows.
    """
    k = len(cols)
    if k < 2:
        raise ValueError("need at least 2 signal columns")
    ints = [
        F.floor(F.col(c).cast("double") * F.lit(float(scale))).cast("long")
        for c in cols
    ]
    base = sig.na.drop(subset=list(cols)).select(F.array(*ints).alias("_a"))
    seq = F.sequence(F.lit(0), F.lit(k - 1))
    dec = lambda c: c.cast("decimal(19,0)")  # noqa: E731
    mom = (
        base.select(F.posexplode("_a").alias("i", "x"))
        .groupBy("i")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(dec(F.col("x"))).alias("s"),
            F.sum(dec(F.col("x")) * dec(F.col("x"))).alias("ss"),
        )
    )
    pair_structs = F.flatten(
        F.transform(
            seq,
            lambda i: F.transform(
                seq,
                lambda j: F.struct(
                    i.alias("i"),
                    j.alias("j"),
                    (
                        dec(F.element_at(F.col("_a"), i + 1))
                        * dec(F.element_at(F.col("_a"), j + 1))
                    ).alias("p"),
                ),
            ),
        )
    )
    pairs = (
        base.select(F.explode(pair_structs).alias("_p"))
        .select("_p.i", "_p.j", "_p.p")
        .filter(F.col("i") < F.col("j"))
        .groupBy("i", "j")
        .agg(F.sum("p").alias("sij"))
    )
    mi = mom.select(
        F.col("i"), F.col("n"), F.col("s").alias("si"), F.col("ss").alias("sii")
    )
    mj = mom.select(
        F.col("i").alias("j"), F.col("s").alias("sj"), F.col("ss").alias("sjj")
    )
    names = F.array(*[F.lit(c) for c in cols])
    num = F.col("n") * F.col("sij") - F.col("si") * F.col("sj")
    da = F.col("n") * F.col("sii") - F.col("si") * F.col("si")
    db = F.col("n") * F.col("sjj") - F.col("sj") * F.col("sj")
    corr = F.when(
        (da > 0) & (db > 0),
        F.round(
            num.cast("double")
            / F.sqrt(da.cast("double") * db.cast("double")),
            9,
        ),
    )
    return (
        pairs.join(F.broadcast(mi), "i")
        .join(F.broadcast(mj), "j")
        .select(
            F.element_at(names, F.col("i") + 1).alias("sig_a"),
            F.element_at(names, F.col("j") + 1).alias("sig_b"),
            corr.alias("corr_r"),
        )
    )
