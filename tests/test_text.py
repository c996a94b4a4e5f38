"""Text analysis functions (functions/text.py)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from kafka_denormalization_spark.functions import text as T


def _one(spark, text):
    return spark.createDataFrame([(1, text)], "id long, text string")


def test_token_counts(spark):
    df = _one(spark, "the quick brown fox, jumps!")
    row = df.select(
        T.token_count("text").alias("ws"),
        T.bpe_ish_token_count("text").alias("bpe"),
    ).first()
    assert row["ws"] == 5
    # word chunks: the quick brown fox jumps + "," + "!" = 7
    assert row["bpe"] == 7


def test_ratios_and_quality_bounds(spark):
    df = _one(spark, "the cat sat on the mat.")
    row = df.select(
        T.punct_ratio("text").alias("p"),
        T.stopword_ratio("text").alias("s"),
        T.quality_score("text").alias("q"),
    ).first()
    assert 0 < row["p"] < 0.1
    assert abs(row["s"] - 2 / 6) < 1e-12  # "the" twice of 6 tokens
    assert 0.0 <= row["q"] <= 1.0


def test_lang_id_picks_profile(spark):
    df = spark.createDataFrame(
        [(1, "der hund und die katze ist da"), (2, "le chat et la souris est ici")],
        "id long, text string",
    )
    got = {r["id"]: r["l"] for r in df.select("id", T.lang_id("text").alias("l")).collect()}
    assert got == {1: "de", 2: "fr"}


def test_ngrams_and_fingerprint(spark):
    df = _one(spark, "a b c d")
    grams = df.select(T.ngrams("text", 3).alias("g")).first()["g"]
    assert grams == ["a b c", "b c d"]
    fp = df.select(T.fingerprint("text", 3).alias("f")).first()["f"]
    expected = min(hashlib.md5(g.encode()).hexdigest() for g in grams)
    assert fp == expected


def test_fingerprint_short_doc_is_null(spark):
    df = _one(spark, "a b")
    assert df.select(T.fingerprint("text", 3).alias("f")).first()["f"] is None


def test_fingerprint_detects_exact_dup(spark):
    df = spark.createDataFrame(
        [(1, "x y z w"), (2, "x y z w"), (3, "totally different text here")],
        "id long, text string",
    )
    fps = [r["f"] for r in df.select(T.fingerprint("text").alias("f")).collect()]
    assert fps[0] == fps[1] != fps[2]


def test_winnowing_guarantee(spark):
    """Winnowing guarantee: documents sharing a run of >= w+n-1 tokens share
    at least one fingerprint; disjoint documents share none."""
    shared = "alpha beta gamma delta epsilon zeta"  # 6 tokens = w+n-1 with n=3,w=4
    df = spark.createDataFrame(
        [
            (1, f"one two {shared} three four"),
            (2, f"five six {shared} seven eight"),
            (3, "completely different words with no overlap at all here"),
        ],
        "doc_id long, text string",
    )
    fps = {
        r["doc_id"]: set(r["f"])
        for r in df.select("doc_id", T.winnow_fingerprints("text", 3, 4).alias("f")).collect()
    }
    assert fps[1] & fps[2], "shared run must yield a shared fingerprint"
    assert not (fps[1] & fps[3])
    assert not (fps[2] & fps[3])


def test_winnowing_short_doc_fallback(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    fps = df.select(T.winnow_fingerprints("text", 3, 4).alias("f")).first()["f"]
    assert len(fps) == 1  # single gram -> global-min fallback


def test_clean_text(spark):
    from kafka_denormalization_spark.functions.text import clean_text

    df = spark.createDataFrame(
        [(1, "  Visit https://example.com/x?q=1 NOW!!   Multiple   spaces\there ")],
        "id long, text string",
    )
    out = df.select(clean_text("text").alias("c")).first()["c"]
    assert out == "visit now!! multiple spaces here"


def test_repetition_score(spark):
    from kafka_denormalization_spark.functions.text import repetition_score

    df = spark.createDataFrame(
        [
            (1, "a b a b a b"),   # grams: ab ba ab ba ab -> 5 total, 2 distinct
            (2, "all words differ here"),
            (3, "one"),           # no 2-grams -> 0.0
        ],
        "id long, text string",
    )
    got = {r["id"]: r["rep"] for r in df.select("id", repetition_score("text", 2).alias("rep")).collect()}
    assert abs(got[1] - (1 - 2 / 5)) < 1e-12
    assert got[2] == 0.0
    assert got[3] == 0.0


def test_vocab_table_topk_deterministic(spark):
    from kafka_denormalization_spark.functions.text import vocab_table

    df = spark.createDataFrame(
        [(1, "b a a"), (2, "c b a")], "id long, text string"
    )
    rows = [(r["token"], r["n"]) for r in vocab_table(df, "text", k=2).collect()]
    assert rows == [("a", 3), ("b", 2)]


def test_contamination_scan(spark):
    from kafka_denormalization_spark.functions.text import contamination_scan

    df = spark.createDataFrame(
        [(1, "uses a hash join here"), (2, "nothing to see"), (3, "hash join and hash join")],
        "id long, text string",
    )
    got = sorted(
        (r["id"], r["pat"])
        for r in contamination_scan(df, "id", "text", ["hash join", "absent"]).collect()
    )
    # doc 3 matches once per PATTERN, not per occurrence
    assert got == [(1, "hash join"), (3, "hash join")]


def test_gopher_quality_flags(spark):
    from pyspark.sql import functions as F

    from kafka_denormalization_spark.functions.text import gopher_quality_flags

    good = "the quick brown fox jumps over a lazy dog and runs to town in time " * 5
    short = "too few words here"
    symbols = " ".join(["###"] * 60)
    no_stop = " ".join(["zebra"] * 60)
    df = spark.createDataFrame(
        [(1, good), (2, short), (3, symbols), (4, no_stop)], "id long, text string"
    )
    flags = gopher_quality_flags(F.col("text"))
    out = {
        r["id"]: r
        for r in df.select(
            "id", *[c.alias(n) for n, c in flags.items()]
        ).collect()
    }
    assert all(out[1][n] for n in flags), "good doc passes every rule"
    assert not out[2]["r_word_count"], "short doc fails word count"
    assert not out[3]["r_symbol_ratio"], "hash-runs fail symbol ratio"
    assert not out[3]["r_alpha_words"], "hash-runs fail alpha-word rule"
    assert not out[4]["r_stopwords"], "stopword-free doc fails stopword rule"


def test_contamination_scan_join_token_boundaries(spark):
    from kafka_denormalization_spark.functions.text import contamination_scan_join

    docs = spark.createDataFrame(
        [
            (1, "uses a hash join here"),
            (2, "rehash joint ventures"),     # substring but not token-seq
            (3, "hash  join\twith odd   ws"),  # whitespace-normalized match
            (4, "the query planner"),          # single-token fallback path
            (5, "queryx plans"),               # no boundary match
        ],
        "id long, text string",
    )
    got = sorted(
        (r["id"], r["pat"])
        for r in contamination_scan_join(
            docs, "id", "text", ["hash join", "query"], probe_grams=2
        ).collect()
    )
    assert got == [(1, "hash join"), (3, "hash join"), (4, "query")]


def test_scrub_pii(spark):
    from kafka_denormalization_spark.functions.text import scrub_pii

    df = spark.createDataFrame(
        [
            (1, "mail bob.smith+x@example.co.uk now"),
            (2, "server at 192.168.1.100 responded"),
            (3, "call +1 555-123-4567 or 8005551234"),
            (4, "clean text, no pii at all"),
            (5, "a@b.io and 10.0.0.1 and +44 20 7946 0958"),
        ],
        "id long, text string",
    )
    out = {r["id"]: r["s"] for r in df.select("id", scrub_pii("text").alias("s")).collect()}
    assert out[1] == "mail <EMAIL> now"
    assert out[2] == "server at <IP> responded"
    assert out[3] == "call <PHONE> or <PHONE>"
    assert out[4] == "clean text, no pii at all"
    assert out[5] == "<EMAIL> and <IP> and <PHONE>"


def test_oov_rate_table(spark):
    from kafka_denormalization_spark.functions.text import oov_rate_table

    # top-2 vocab over this corpus is {"a", "b"} (a:5, b:4); "x"/"y" are OOV
    df = spark.createDataFrame(
        [
            (1, "a a b x"),
            (2, "a b b y"),
            (3, "a a b"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in oov_rate_table(df, "doc_id", "text", k=2).collect()}
    assert out[1]["n_tokens"] == 4
    assert abs(out[1]["oov_frac"] - 0.25) < 1e-12
    assert abs(out[2]["oov_frac"] - 0.25) < 1e-12
    assert out[3]["oov_frac"] == 0.0


def test_bm25_topk_semantics(spark):
    """BM25 retrieval: matching docs outrank non-matching, tf monotonic
    within equal lengths, k bound respected, non-negative idf keeps
    common-term matches above zero."""
    from kafka_denormalization_spark.functions.text import bm25_topk

    rows = [
        (1, "spark spark spark engine engine"),   # tf(spark)=3
        (2, "spark engine engine engine other"),  # tf(spark)=1
        (3, "totally unrelated words here now"),  # tf=0
        (4, "spark spark engine other other"),    # tf(spark)=2
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = bm25_topk(df, "doc_id", "text", ["spark"], k=3).collect()
    assert [r["doc_id"] for r in out] == [1, 4, 2]  # tf desc, equal dl
    assert all(r["score_r"] > 0 for r in out)
    assert len(out) == 3  # doc 3 (score 0) cut by k

    # common term (df = 3/4 docs): Lucene idf stays positive, so matches
    # still beat the non-matching doc
    out2 = bm25_topk(df, "doc_id", "text", ["engine"], k=4).collect()
    assert [r["doc_id"] for r in out2][-1] == 3
    assert out2[-1]["score_r"] == 0.0


def test_bm25_batch_per_query_topk(spark):
    """Table-driven BM25: per-query top-k, shared terms scored once,
    only matching docs returned, per-query ordering matches bm25_topk's
    ranking for the same terms."""
    from kafka_denormalization_spark.functions.text import bm25_batch, bm25_topk

    rows = [
        (1, "spark spark spark engine engine"),
        (2, "spark engine engine engine other"),
        (3, "totally unrelated words here now"),
        (4, "spark spark engine other other"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    qdf = spark.createDataFrame(
        [(10, "spark"), (20, "engine"), (20, "unrelated")],
        "query_id int, term string",
    )
    out = bm25_batch(df, "doc_id", "text", qdf, k=3).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    # q10: docs 1,4,2 match 'spark'; doc 3 omitted (no match, unlike topk)
    assert [r["doc_id"] for r in by_q[10]] == [1, 4, 2]
    assert all(r["score_r"] > 0 for r in by_q[10])
    # q20 ('engine' OR 'unrelated'): all four docs match >=1 term; k=3 cuts
    assert len(by_q[20]) == 3
    # single-term query ranking agrees with bm25_topk on the same corpus
    topk = bm25_topk(df, "doc_id", "text", ["spark"], k=3).collect()
    match_ids = [r["doc_id"] for r in by_q[10]]
    assert match_ids == [r["doc_id"] for r in topk if r["score_r"] > 0]
    # scores agree to the shared 9-decimal grid
    topk_scores = {r["doc_id"]: r["score_r"] for r in topk}
    for r in by_q[10]:
        assert abs(r["score_r"] - topk_scores[r["doc_id"]]) < 1e-9


def test_bm25_batch_k_and_ties(spark):
    """k=1 keeps exactly the best doc per query; doc_id breaks score ties."""
    from kafka_denormalization_spark.functions.text import bm25_batch

    rows = [(1, "alpha beta"), (2, "alpha beta"), (3, "gamma delta")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    qdf = spark.createDataFrame([(7, "alpha")], "query_id int, term string")
    out = bm25_batch(df, "doc_id", "text", qdf, k=1).collect()
    assert len(out) == 1 and out[0]["doc_id"] == 1  # tie -> lower id


def test_lm_score_fluency_ordering(spark):
    """Docs made of target-corpus bigrams score lower nll than docs of
    unseen words; short docs carry NULL nll and n_bigrams=0."""
    from pyspark.sql import functions as F
    from kafka_denormalization_spark.functions.text import lm_score

    rows = [
        (1, "the cat sat on the mat", "tgt"),
        (2, "the dog sat on the rug", "tgt"),
        (3, "the cat sat on the rug", "raw"),   # in-domain bigrams
        (4, "zz qq ww ee rr tt", "raw"),        # all unseen
        (5, "single", "raw"),                   # no bigrams
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, src string")
    out = {r["doc_id"]: r for r in lm_score(df, "doc_id", "text", F.col("src") == "tgt").collect()}
    assert len(out) == 5
    assert out[3]["nll_r"] < out[4]["nll_r"]
    assert out[1]["nll_r"] < out[4]["nll_r"]
    assert out[5]["nll_r"] is None and out[5]["n_bigrams"] == 0
    assert out[1]["n_bigrams"] == 5


def test_bpe_merges_classic_example(spark):
    """The Sennrich-style toy corpus learns the expected merges in
    order: most frequent pair first, then a pair involving the merged
    symbol — proving the fold rewrites sequences between rounds."""
    from kafka_denormalization_spark.functions.text import bpe_merges

    df = spark.createDataFrame(
        [(1, "low low low lower lowest"), (2, "new newer newest low")],
        "id long, text string",
    )
    out = [(r["rank"], r["p1"], r["p2"], r["cnt"]) for r in bpe_merges(df, "text", 3).collect()]
    assert out[0] == (1, "o", "w", 6)
    assert out[1] == (2, "l", "ow", 6)   # uses round-1's merged symbol
    assert out[2][3] == 3


def test_bpe_merges_greedy_chain(spark):
    """'aaa' with pair (a,a): greedy left-to-right merges the first two,
    leaving (aa, a) — no overlapping re-merge within one round."""
    from pyspark.sql import functions as F
    from kafka_denormalization_spark.functions.text import bpe_merges

    df = spark.createDataFrame([(1, "aaa aaa ab")], "id long, text string")
    out = bpe_merges(df, "text", 2).collect()
    assert (out[0]["p1"], out[0]["p2"]) == ("a", "a")
    # round 2 pairs come from [aa, a] (+ 'ab' chars): (aa,a) count 2
    assert (out[1]["p1"], out[1]["p2"]) == ("aa", "a")


def test_bpe_token_counts_applies_all_merges(spark):
    """Encode half of the BPE loop: after the learned merges are applied
    (including the LAST one), the histogram counts post-merge symbols
    weighted by word frequency."""
    from kafka_denormalization_spark.functions.text import (
        bpe_merges,
        bpe_token_counts,
    )

    df = spark.createDataFrame([(1, "aaa aaa ab")], "id long, text string")
    # merges: (a,a) then (aa,a) — 'aaa' encodes to [aaa], 'ab' to [a, b]
    merges = [(r["p1"], r["p2"]) for r in bpe_merges(df, "text", 2).collect()]
    assert merges == [("a", "a"), ("aa", "a")]
    hist = {
        r["token"]: r["cnt"]
        for r in bpe_token_counts(df, "text", num_merges=2).collect()
    }
    assert hist == {"aaa": 2, "a": 1, "b": 1}


def test_bpe_token_counts_totals_preserved(spark):
    """Merging never changes the total character mass: sum(len(token) *
    cnt) equals the corpus character count (whitespace removed)."""
    from pyspark.sql import functions as F
    from kafka_denormalization_spark.functions.text import bpe_token_counts

    df = spark.createDataFrame(
        [(1, "low low lower"), (2, "new newest")], "id long, text string"
    )
    hist = bpe_token_counts(df, "text", num_merges=3)
    mass = hist.select(
        F.sum(F.length("token") * F.col("cnt")).alias("m")
    ).collect()[0]["m"]
    assert mass == len("lowlowlower") + len("newnewest")


def test_bpe_encode_docs_per_doc_counts(spark):
    """Per-doc BPE lengths under the learned merges: 'aaa aaa ab' with
    merges (a,a),(aa,a) encodes doc words as aaa->1, ab->2 tokens; doc
    totals follow word multiplicity, and histogram mass is conserved."""
    from pyspark.sql import functions as F
    from kafka_denormalization_spark.functions.text import (
        bpe_encode_docs,
        bpe_token_counts,
    )

    df = spark.createDataFrame(
        [(1, "aaa aaa ab"), (2, "ab ab"), (3, "aaa")],
        "id long, text string",
    )
    out = {
        r["id"]: (r["n_words"], r["n_bpe_tokens"])
        for r in bpe_encode_docs(df, "id", "text", num_merges=2).collect()
    }
    assert out == {1: (3, 4), 2: (2, 4), 3: (1, 1)}
    # per-doc totals must add to the corpus histogram mass
    hist_total = (
        bpe_token_counts(df, "text", num_merges=2)
        .select(F.sum("cnt").alias("t"))
        .collect()[0]["t"]
    )
    assert sum(v[1] for v in out.values()) == hist_total


def test_bpe_encode_docs_empty_doc_zero(spark):
    """Token-less docs score 0 BPE tokens (the '' split token has an
    empty symbol sequence); they still emit a row."""
    from kafka_denormalization_spark.functions.text import bpe_encode_docs

    df = spark.createDataFrame(
        [(1, "low low"), (2, "")], "id long, text string"
    )
    out = {
        r["id"]: r["n_bpe_tokens"]
        for r in bpe_encode_docs(df, "id", "text", num_merges=1).collect()
    }
    assert len(out) == 2 and out[2] == 0 and out[1] > 0


def test_repetition_profile_hand_computed(spark):
    """Micro-fixture with hand-computed Gopher repetition numbers,
    including the overlap-union detail of dup5 accounting."""
    from kafka_denormalization_spark.functions.text import repetition_profile

    # doc 1: "a b a b a b a b" — top 2-gram "a b" occurs 4x (len 3);
    # 5-grams: "a b a b a" (pos 0, 2) and "b a b a b" (pos 1, 3) — both
    # duplicated -> covered = union(0..4, 1..5, 2..6, 3..7) = all 8
    # positions, counted ONCE each despite the 4-way overlap.
    # doc 2: "x y z" — no 5-gram, top2 "x y"/"y z" both 1x -> tie breaks
    # to "x y". doc 3: one token — no grams at all.
    df = spark.createDataFrame(
        [(1, "a b a b a b a b"), (2, "x y z"), (3, "solo")],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r for r in repetition_profile(df, "doc_id", "text").collect()
    }
    r1 = rows[1]
    assert (r1["n_tokens"], r1["n_chars"]) == (8, 8)
    assert (r1["top2_count"], r1["top2_chars"]) == (4, 12)
    # top 3-gram "a b a" occurs 3x (positions 0,2,4), len 5 -> 15 chars
    assert (r1["top3_count"], r1["top3_chars"]) == (3, 15)
    assert (r1["dup5_tokens"], r1["dup5_chars"]) == (8, 8)
    r2 = rows[2]
    assert (r2["top2_count"], r2["top2_chars"]) == (1, 3)
    assert (r2["dup5_tokens"], r2["dup5_chars"]) == (0, 0)
    r3 = rows[3]
    assert (r3["n_tokens"], r3["top2_count"], r3["dup5_tokens"]) == (1, 0, 0)


def test_blocklist_filter_token_level(spark):
    """Token membership, not substring: 'classify' survives a 'class'
    blockword; case-insensitive; multi-hit docs dropped once."""
    from kafka_denormalization_spark.functions.text import blocklist_filter

    docs = spark.createDataFrame(
        [
            (1, "a classify b"),        # substring only -> keep
            (2, "a class b"),           # exact token -> drop
            (3, "A CLASS b"),           # case-insensitive -> drop
            (4, "clean text here"),     # keep
            (5, "class bad class"),     # multi-hit -> drop (once)
        ],
        "doc_id long, text string",
    )
    out = sorted(
        r["doc_id"]
        for r in blocklist_filter(docs, "doc_id", "text", ["class", "bad"]).collect()
    )
    assert out == [1, 4]


# ---------------------------------------------------------------------------
# line_dedup (boilerplate line removal)
# ---------------------------------------------------------------------------


def _lines_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, lines array<string>")


def test_line_dedup_removes_heavy_lines_everywhere(spark):
    # "footer" appears in 3 distinct docs -> removed from ALL of them
    df = _lines_df(
        spark,
        [
            (1, ["alpha", "footer", "beta"]),
            (2, ["footer", "gamma"]),
            (3, ["delta", "footer"]),
            (4, ["epsilon"]),
        ],
    )
    out = {
        r["doc_id"]: r
        for r in T.line_dedup(df, "doc_id", "lines", min_docs=3).collect()
    }
    assert out[1]["text_clean"] == "alpha\nbeta"
    assert out[2]["text_clean"] == "gamma"
    assert out[3]["text_clean"] == "delta"
    assert out[4]["text_clean"] == "epsilon"
    assert out[1]["n_lines_removed"] == 1
    assert out[4]["n_lines_removed"] == 0


def test_line_dedup_within_doc_repeats_dont_count(spark):
    # "x" repeated 5x inside ONE doc: distinct-doc count is 1 -> kept
    df = _lines_df(spark, [(1, ["x", "x", "x", "x", "x"]), (2, ["y"])])
    out = {
        r["doc_id"]: r
        for r in T.line_dedup(df, "doc_id", "lines", min_docs=2).collect()
    }
    assert out[1]["text_clean"] == "x\nx\nx\nx\nx"
    assert out[1]["n_lines_kept"] == 5


def test_line_dedup_all_boilerplate_doc_survives_empty(spark):
    df = _lines_df(spark, [(1, ["nav"]), (2, ["nav"]), (3, ["nav", "body"])])
    out = {
        r["doc_id"]: r
        for r in T.line_dedup(df, "doc_id", "lines", min_docs=2).collect()
    }
    assert out[1]["text_clean"] == ""
    assert out[1]["n_lines_kept"] == 0
    assert out[1]["n_lines_removed"] == 1
    assert out[3]["text_clean"] == "body"
    # every input doc has exactly one output row
    assert set(out) == {1, 2, 3}


def test_line_dedup_removes_all_copies_unlike_span_dedup(spark):
    # heavy line occurring twice in one doc AND once in another: every
    # occurrence goes (boilerplate semantics, not first-wins)
    df = _lines_df(spark, [(1, ["ad", "body", "ad"]), (2, ["ad", "tail"])])
    out = {
        r["doc_id"]: r
        for r in T.line_dedup(df, "doc_id", "lines", min_docs=2).collect()
    }
    assert out[1]["text_clean"] == "body"
    assert out[1]["n_lines_removed"] == 2
    assert out[2]["text_clean"] == "tail"


def test_line_dedup_share_digest_parity(spark):
    # share_digest=True (single persisted explode feeding both the
    # df-count and the removal join) must be row-identical to the
    # default two-explode formulation, and must expose the persisted
    # digest frame for caller-side unpersist.
    df = _lines_df(
        spark,
        [
            (1, ["alpha", "footer", "beta", "footer"]),
            (2, ["footer", "gamma"]),
            (3, ["delta", "footer"]),
            (4, ["epsilon"]),
            (5, ["footer"]),
        ],
    )
    base = sorted(
        T.line_dedup(df, "doc_id", "lines", min_docs=3).collect()
    )
    shared_df = T.line_dedup(
        df, "doc_id", "lines", min_docs=3, share_digest=True
    )
    shared = sorted(shared_df.collect())
    assert shared == base
    cache = shared_df._sg_internal_cache
    assert cache.is_cached
    cache.unpersist()
    assert not cache.is_cached


# ---------------------------------------------------------------------------
# lm_perplexity_buckets (CCNet head/middle/tail)
# ---------------------------------------------------------------------------


def test_lm_perplexity_buckets_split_and_nulls(spark):
    rows = [(i, float(i)) for i in range(1, 9)] + [(99, None)]
    scored = spark.createDataFrame(rows, "doc_id long, nll_r double")
    out = {
        r["doc_id"]: r["bucket"]
        for r in T.lm_perplexity_buckets(scored).collect()
    }
    # p25 of 1..8 = 2.75, p75 = 6.25
    assert [out[i] for i in range(1, 9)] == [
        "head", "head", "middle", "middle", "middle", "middle", "tail", "tail"
    ]
    assert out[99] is None


def test_lm_perplexity_buckets_keeps_columns(spark):
    scored = spark.createDataFrame(
        [(1, 4, 0.5), (2, 6, 1.5)], "doc_id long, n_bigrams long, nll_r double"
    )
    out = T.lm_perplexity_buckets(scored)
    assert set(out.columns) == {"doc_id", "n_bigrams", "nll_r", "bucket"}


# ---------------------------------------------------------------------------
# nb_quality_score (curated-seed Naive-Bayes quality classifier)
# ---------------------------------------------------------------------------


def test_nb_quality_score_separates_classes(spark):
    docs = spark.createDataFrame(
        [
            (1, "good fine good prose", True),
            (2, "good prose fine text", True),
            (3, "spam junk spam junk", False),
            (4, "junk spam junk noise", False),
        ],
        "doc_id long, text string, curated boolean",
    )
    out = {
        r["doc_id"]: r
        for r in T.nb_quality_score(
            docs, "doc_id", "text", F.col("curated")
        ).collect()
    }
    assert out[1]["logodds_r"] > 0 and out[1]["keep"]
    assert out[3]["logodds_r"] < 0 and not out[3]["keep"]
    assert out[1]["n_tokens"] == 4


def test_nb_quality_frozen_model_handles_unseen_tokens(spark):
    train = spark.createDataFrame(
        [(1, "good prose", True), (2, "spam junk", False)],
        "doc_id long, text string, y boolean",
    )
    model, default = T.nb_quality_model(train, "text", F.col("y"))
    d = default.first()["_dlo"]
    # unseen tokens fall back to the default log-odds (= 0 when the
    # class totals are symmetric, as here: Tp == Tn)
    assert abs(d) < 1e-12
    m = {r["_w"]: r["_lo"] for r in model.collect()}
    assert m["good"] > 0 > m["spam"]


# ---------------------------------------------------------------------------
# quality_signals / ngram_diversity
# ---------------------------------------------------------------------------


def test_quality_signals_hand_computed(spark):
    df = spark.createDataFrame(
        [(1, "the cat the mat"), (2, "zzz"), (3, "   ")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in T.quality_signals(df, "doc_id", "text").collect()
    }
    r1 = out[1]
    assert r1["n_words"] == 4 and r1["n_chars"] == 15
    assert r1["mean_word_len_r"] == 3.0  # (3+3+3+3)/4
    assert r1["frac_unique_r"] == 0.75  # {the, cat, mat}
    assert r1["top_word_frac_r"] == 0.5  # 'the' x2
    assert r1["stop_frac_r"] == 0.5  # 'the' is a stopword
    r2 = out[2]
    assert r2["n_words"] == 1 and r2["frac_unique_r"] == 1.0
    assert r2["stop_frac_r"] == 0.0
    # whitespace-only doc: zero words, NULL ratios (the '' token filtered)
    r3 = out[3]
    assert r3["n_words"] == 0
    assert r3["mean_word_len_r"] is None
    assert r3["top_word_frac_r"] is None


def test_ngram_diversity_grams_stay_within_docs(spark):
    """Distinct-n per group; bigram/trigram construction must not
    bridge document boundaries (doc2 contributes no trigram)."""
    df = spark.createDataFrame(
        [(1, "g1", "a b a b"), (2, "g1", "a b")],
        "doc_id long, grp string, text string",
    )
    out = {
        r["n"]: r
        for r in T.ngram_diversity(df, "grp", "text", "doc_id", 3).collect()
    }
    assert out[1]["total_ngrams"] == 6 and out[1]["distinct_ngrams"] == 2
    assert out[1]["diversity_r"] == round(2 / 6, 9)
    # bigrams: doc1 {a b, b a, a b}, doc2 {a b} -> 4 total, 2 distinct
    assert out[2]["total_ngrams"] == 4 and out[2]["distinct_ngrams"] == 2
    # trigrams: doc1 only (a b a, b a b); a cross-doc gram would add more
    assert out[3]["total_ngrams"] == 2 and out[3]["distinct_ngrams"] == 2
    assert out[3]["diversity_r"] == 1.0


# ---------------------------------------------------------------------------
# lm_burstiness
# ---------------------------------------------------------------------------


def test_lm_burstiness_mean_matches_lm_score_and_spread_separates(spark):
    """nll_r must equal lm_score's bit-for-bit (shared scoring pass);
    a uniformly-repeating doc has (near-)zero spread while a doc mixing
    common and rare bigrams is bursty; <2-token docs carry NULLs."""
    df = spark.createDataFrame(
        [
            (1, "a b a b a b a b"),      # one bigram pattern: uniform
            (2, "a b a b zq wx a b"),    # rare bigrams mid-doc: bursty
            (3, "solo"),                 # no bigram evidence
        ],
        "doc_id long, text string",
    )
    tgt = F.lit(True)
    burst = {
        r["doc_id"]: r
        for r in T.lm_burstiness(df, "doc_id", "text", tgt).collect()
    }
    score = {
        r["doc_id"]: r for r in T.lm_score(df, "doc_id", "text", tgt).collect()
    }
    for i in (1, 2):
        assert burst[i]["nll_r"] == score[i]["nll_r"]
        assert burst[i]["n_bigrams"] == score[i]["n_bigrams"]
    assert burst[1]["nll_std_r"] < burst[2]["nll_std_r"]
    assert burst[2]["nll_std_r"] > 0.1
    assert burst[3]["n_bigrams"] == 0 and burst[3]["nll_std_r"] is None


def test_v4_attribution_consistent_with_funnel(spark):
    """The per-doc status histogram must telescope exactly into the
    funnel's stage survivor counts."""
    from collections import Counter

    from kafka_denormalization_spark.queries import (
        q_v4_attribution,
        q_v4_funnel,
    )

    sf = "/root/testdata/sf0.01"
    hist = Counter(
        r["status"] for r in q_v4_attribution(spark, sf).collect()
    )
    funnel = {
        r["stage"]: r["n_docs"] for r in q_v4_funnel(spark, sf).collect()
    }
    assert sum(hist.values()) == funnel["input"]
    assert hist["shipped"] == funnel["shipped"]
    assert hist["shipped"] + hist["mix_sampled_out"] == funnel["nb_survivors"]
    assert (
        hist["shipped"] + hist["mix_sampled_out"] + hist["nb_gate"]
        == funnel["lm_survivors"]
    )
    assert (
        funnel["lm_survivors"] + hist["lm_gate"] == funnel["span_kept"]
    )
    assert funnel["span_kept"] + hist["span_gate"] == funnel["line_stripped"]
    # every doc accounted for by exactly one stage
    assert set(hist) <= {
        "shipped", "mix_sampled_out", "nb_gate", "lm_gate",
        "span_gate", "line_strip",
    }


def test_zipf_fit_hand_computed(spark):
    import math

    # counts: a=5 (rank 1), b=3 (rank 2, token-asc tiebreak), c=3 (rank 3);
    # d appears once -> trimmed by min_count=2
    df = spark.createDataFrame(
        [(1, "a a a b b c"), (2, "a a b c c d")],
        "doc_id long, text string",
    )
    row = T.zipf_fit(df, "text", min_count=2).collect()[0]
    assert row["vocab_size"] == 3
    xs = [round(math.log(r), 9) for r in (1, 2, 3)]
    ys = [round(math.log(n), 9) for n in (5, 3, 3)]
    n = 3.0
    sx, sy = sum(xs), sum(ys)
    sxy = sum(round(x * y, 9) for x, y in zip(xs, ys))
    sxx = sum(round(x * x, 9) for x in xs)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = (sy - slope * sx) / n
    assert abs(row["zipf_slope"] - slope) < 1e-8
    assert abs(row["zipf_intercept"] - intercept) < 1e-8
    # more frequent -> lower rank, so the fit slopes down
    assert row["zipf_slope"] < 0


def test_zipf_fit_rank_tiebreak_is_token_asc(spark):
    """Equal-frequency tokens rank in token order — the decomposed
    (offset + per-frequency row_number) rank must match a single global
    (count desc, token asc) ordering exactly."""
    df = spark.createDataFrame(
        [(1, "z z y y x x w w")], "doc_id long, text string"
    )
    # all four tokens have count 2: ranks w=1 x=2 y=3 z=4; any other
    # assignment changes sxy and therefore the slope
    import math

    row = T.zipf_fit(df, "text", min_count=2).collect()[0]
    assert row["vocab_size"] == 4
    xs = [round(math.log(r), 9) for r in (1, 2, 3, 4)]
    ys = [round(math.log(2), 9)] * 4
    n = 4.0
    sx, sy = sum(xs), sum(ys)
    sxy = sum(round(x * y, 9) for x, y in zip(xs, ys))
    sxx = sum(round(x * x, 9) for x in xs)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert abs(row["zipf_slope"] - slope) < 1e-8


def test_contamination_scrub_hand_computed(spark):
    from kafka_denormalization_spark.functions.text import contamination_scrub

    df = spark.createDataFrame(
        [
            (1, "x hash join y hash join z"),
            (2, "clean doc"),
            (3, "merge batchmerge batch"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in contamination_scrub(
            df, "doc_id", "text", ["hash join", "merge batch"]
        ).collect()
    }
    assert out[1]["text_scrubbed"] == "x  y  z" and out[1]["n_hits"] == 2
    assert out[2]["text_scrubbed"] == "clean doc" and out[2]["n_hits"] == 0
    # adjacent occurrences both removed and both counted
    assert out[3]["text_scrubbed"] == "" and out[3]["n_hits"] == 2


def test_zipf_fit_head_only(spark):
    """top_ranks restricts the FIT to ranks 1..K while vocab_size still
    reports the full above-min_count census."""
    import math

    df = spark.createDataFrame(
        [(1, "a a a a a b b b c c d d")], "doc_id long, text string"
    )
    # counts: a=5 (r1), b=3 (r2), c=2 (r3), d=2 (r4)
    row = T.zipf_fit(df, "text", min_count=2, top_ranks=2).collect()[0]
    assert row["vocab_size"] == 4  # full census survives the head filter
    xs = [round(math.log(r), 9) for r in (1, 2)]
    ys = [round(math.log(n), 9) for n in (5, 3)]
    n = 2.0
    sx, sy = sum(xs), sum(ys)
    sxy = sum(round(x * y, 9) for x, y in zip(xs, ys))
    sxx = sum(round(x * x, 9) for x in xs)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert abs(row["zipf_slope"] - slope) < 1e-8
    # and the default path is unchanged by the knob's plumbing
    full = T.zipf_fit(df, "text", min_count=2).collect()[0]
    assert full["vocab_size"] == 4
    assert full["zipf_slope"] != row["zipf_slope"]
    import pytest

    with pytest.raises(ValueError, match="top_ranks"):
        T.zipf_fit(df, "text", top_ranks=1)


def test_source_divergence_matches_naive_jsd(spark):
    """The closed-form absent-token tail decomposition equals the naive
    full-union JSD computed in plain Python (within the 9-decimal-grid
    tolerance); identical sources diverge by ~0."""
    import math
    from collections import Counter

    rows = [
        (1, "sa", "a a b c"),
        (2, "sa", "a b b d"),
        (3, "sb", "x x y a"),
        (4, "sc", "a a b c a b b d"),  # sc == sa's union -> JSD vs corpus differs from sa's only via totals
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {
        r["source"]: r
        for r in T.source_divergence(df, "source", "text").collect()
    }

    per_src: dict[str, Counter] = {}
    for _, s, text in rows:
        per_src.setdefault(s, Counter()).update(text.split())
    corpus: Counter = Counter()
    for c in per_src.values():
        corpus.update(c)
    n = sum(corpus.values())

    for s, cnt in per_src.items():
        ns = sum(cnt.values())
        jsd = 0.0
        for t, cq in corpus.items():
            p = cnt.get(t, 0) / ns
            q = cq / n
            m = (p + q) / 2.0
            if p > 0:
                jsd += 0.5 * p * math.log(p / m)
            jsd += 0.5 * q * math.log(q / m)
        assert abs(got[s]["jsd_r"] - jsd) < 1e-6, s
        assert got[s]["n_tokens"] == ns
        assert 0.0 <= got[s]["jsd_r"] <= math.log(2.0) + 1e-9


def test_collocations_hand_computed(spark):
    """PMI and counts match a plain-Python computation on a tiny corpus;
    bigrams never cross document boundaries; min_count floors hapax
    pairs out; ordering is (pmi desc, bigram asc)."""
    import math
    from collections import Counter

    rows = [
        (1, "new york new york city"),
        (2, "york new york new"),
        (3, "city hall city hall"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = T.collocations(df, "text", min_count=2, top_k=10).collect()

    uni: Counter = Counter()
    bi: Counter = Counter()
    for _, text in rows:
        w = text.split()
        uni.update(w)
        bi.update(zip(w, w[1:]))  # within-doc only
    n = sum(uni.values())

    exp = {}
    for (x, y), cxy in bi.items():
        if cxy < 2:
            continue
        pmi = round(
            round(math.log(cxy), 9)
            + round(math.log(n), 9)
            - round(math.log(uni[x]), 9)
            - round(math.log(uni[y]), 9),
            9,
        )
        exp[f"{x} {y}"] = (cxy, uni[x], uni[y], pmi)

    assert {r["bigram"] for r in got} == set(exp)
    for r in got:
        cxy, cx, cy, pmi = exp[r["bigram"]]
        assert (r["n_xy"], r["n_x"], r["n_y"]) == (cxy, cx, cy)
        assert abs(r["pmi_r"] - pmi) < 1e-9, r["bigram"]
    ranks = [(-r["pmi_r"], r["bigram"]) for r in got]
    assert ranks == sorted(ranks)
    # the doc-boundary bigram ("city", "york" across docs 1->2) never exists
    assert "city york" not in {r["bigram"] for r in got}


def test_collocations_min_count_floor(spark):
    """A pair of rare words co-occurring once has huge PMI but must be
    floored out — the hapax-domination guard IS the operator."""
    df = spark.createDataFrame(
        [(1, "rare pair"), (2, "a a a a a a a a")],
        "doc_id long, text string",
    )
    got = T.collocations(df, "text", min_count=2, top_k=10).collect()
    assert "rare pair" not in {r["bigram"] for r in got}


def test_signal_correlations_matches_numpy(spark):
    import numpy as np

    from kafka_denormalization_spark.functions.text import (
        signal_correlations,
    )

    rng = np.random.default_rng(31)
    a = rng.normal(10, 2, size=200)
    rows = [
        (i, float(a[i]), float(2 * a[i] + 3), float(rng.normal()), 7.0)
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "id long, s1 double, s2 double, s3 double, s4 double")
    out = {
        (r["sig_a"], r["sig_b"]): r["corr_r"]
        for r in signal_correlations(df, ["s1", "s2", "s3", "s4"]).collect()
    }
    assert len(out) == 6
    # s2 is a positive affine image of s1 -> corr exactly 1 on the grid
    assert abs(out[("s1", "s2")] - 1.0) < 1e-6
    # independent noise ~ 0
    assert abs(out[("s1", "s3")]) < 0.2
    # constant column -> zero variance -> NULL
    assert out[("s1", "s4")] is None
    # parity with numpy on the SAME floored-integer inputs
    ints = np.floor(np.array([[r[1], r[2], r[3]] for r in rows]) * 1e6)
    ref = np.corrcoef(ints.T)
    for (x, y), idx in ((("s1", "s2"), (0, 1)), (("s1", "s3"), (0, 2)), (("s2", "s3"), (1, 2))):
        assert abs(out[(x, y)] - ref[idx]) < 1e-6


def test_signal_correlations_validation(spark):
    from kafka_denormalization_spark.functions.text import (
        signal_correlations,
    )

    import pytest as _pytest

    with _pytest.raises(ValueError):
        signal_correlations(None, ["only_one"])


def test_tokens_v2_cjk_char_fallback(spark):
    """Script-aware tokenizer: CJK chars isolate to single-char tokens
    (the no-segmenter character baseline), Latin splits unchanged, mixed
    text interleaves both (VERDICT r08 #8)."""
    from pyspark.sql import functions as F

    han = chr(0x4E16) + chr(0x754C)          # two Han chars
    kana = chr(0x30AB) + chr(0x30BF)         # two Katakana chars
    hangul = chr(0xD55C) + chr(0xAD6D)       # two Hangul syllables
    rows = [
        (1, f"hello {han} world"),
        (2, han + han),                       # unsegmented, no whitespace
        (3, kana + " " + hangul),
        (4, "plain latin text only"),
        (5, ""),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    out = {
        r["id"]: r["t"]
        for r in df.select("id", T.tokens_v2("text").alias("t")).collect()
    }
    assert out[1] == ["hello", han[0], han[1], "world"]
    assert out[2] == [han[0], han[1], han[0], han[1]]
    assert out[3] == [kana[0], kana[1], hangul[0], hangul[1]]
    # Latin text: identical to the v1 whitespace tokenizer
    v1 = df.filter("id = 4").select(T.tokens("text").alias("t")).collect()[0]["t"]
    assert out[4] == v1 == ["plain", "latin", "text", "only"]
    assert out[5] == [""]  # empty-doc convention matches tokens()


def test_lang_id_v2_script_census(spark):
    from pyspark.sql import functions as F

    han30 = chr(0x4E00) * 30
    kana_mix = chr(0x4E00) * 20 + chr(0x30A2) * 10   # Japanese: Han+Kana
    hangul30 = chr(0xAC00) * 30
    cyr30 = chr(0x0410) * 30
    latin_en = "the cat is on the mat and the dog is in the house"
    # sparse CJK under the 10% gate, with English stopwords so the
    # fallback argmax has signal (a stopword-free text ties at 0 hits
    # and the deterministic tie-break picks the highest lang code)
    sparse = "the cat and the dog met one " + chr(0x4E00) + " in the house"
    rows = [
        (1, han30), (2, kana_mix), (3, hangul30), (4, cyr30),
        (5, latin_en), (6, sparse),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    out = {
        r["id"]: r["p"]
        for r in df.select("id", T.lang_id_v2("text").alias("p")).collect()
    }
    assert out[1] == "zh"
    assert out[2] == "ja"      # Kana presence beats the Han majority
    assert out[3] == "ko"
    assert out[4] == "ru"
    assert out[5] == "en"      # Latin falls through to the stopword argmax
    # one CJK char in 40+ chars is under the 10% gate -> Latin fallback
    assert out[6] == "en"
