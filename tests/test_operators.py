"""Unit tests for rekey / dedup / json serde operators (SURVEY §2)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_denormalization_spark.functions.json_io import parse_json, render_json
from kafka_denormalization_spark.operators.dedup import (
    exact_dedup_content,
    suppress_duplicates,
)
from kafka_denormalization_spark.operators.rekey import (
    copartition_by_fk,
    join_key_digest,
    select_key,
)


def test_select_key(spark, comments):
    out = select_key(comments, F.col("id").cast("string"))
    assert out.columns[0] == "key"
    assert {r["key"] for r in out.select("key").collect()} == {"1", "2", "3", "4"}


def test_join_key_digest_left_and_right(spark, comments):
    left = comments.select(join_key_digest("story", "id").alias("jk"))
    right = comments.select(join_key_digest("story").alias("jk"))
    lrow = left.first()["jk"]
    rrow = right.first()["jk"]
    assert lrow["right_digest"] is not None and lrow["left_digest"] is not None
    # right-side marker: left digest absent (JoinKey.java:55 null-left wire form)
    assert rrow["left_digest"] is None
    # same FK ⇒ same right digest on both sides (prefix compatibility)
    assert lrow["right_digest"] == rrow["right_digest"]


def test_suppress_duplicates(spark):
    df = spark.createDataFrame([(1, 10), (1, 10), (2, 20)], "fk int, pk int")
    assert suppress_duplicates(df, ["fk", "pk"]).count() == 2


def test_exact_dedup_content_keeps_min_id(spark):
    df = spark.createDataFrame(
        [(3, "same text"), (1, "same text"), (2, "other")], "doc_id long, text string"
    )
    out = exact_dedup_content(df, "text", "doc_id")
    assert sorted(r["doc_id"] for r in out.collect()) == [1, 2]


def test_json_roundtrip(spark):
    df = spark.createDataFrame([(1, '{"k": 7}')], "id long, props string")
    parsed = parse_json(df, "props", "k INT", out="p")
    assert parsed.first()["p"]["k"] == 7
    rendered = parsed.select(render_json(F.col("p")).alias("j"))
    assert rendered.first()["j"] == '{"k":7}'


def test_copartition_by_fk(spark, comments):
    out = copartition_by_fk(comments, "story", num_partitions=4)
    assert out.rdd.getNumPartitions() == 4
    assert out.count() == comments.count()


def test_json_serde_with_reference_schemas(spark):
    """Round-trip the reference's own sample payloads (README.md:15-33)
    through the typed schemas; malformed JSON becomes NULL, not an error."""
    from kafka_denormalization_spark.schemas import COMMENT_SCHEMA

    raw = spark.createDataFrame(
        [
            ('{"by":"z","id":1,"parent":2,"text":"t","time":3,"type":"comment","story":9}',),
            ("not json at all",),
        ],
        "value string",
    )
    parsed = parse_json(raw, "value", COMMENT_SCHEMA, out="v")
    rows = parsed.select("v").collect()
    assert rows[0]["v"]["story"] == 9
    assert rows[1]["v"] is None or all(
        rows[1]["v"][f] is None for f in ("by", "id", "story")
    )


def test_stats_agg_matches_native_moments(spark):
    """The exact-integer moment formulation (q_stats_agg) must agree with
    Spark's native corr/covar_samp/stddev_samp to float tolerance — the
    moment route exists only for bitwise cross-engine determinism."""
    from kafka_denormalization_spark import queries as Q
    from kafka_denormalization_spark.engine import table as eng_table

    sf = "/root/testdata/sf0.001"
    ours = {r["l_returnflag"]: r for r in Q.q_stats_agg(spark, sf).collect()}
    native = {
        r["l_returnflag"]: r
        for r in eng_table(spark, sf, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.corr("l_quantity", "l_extendedprice").alias("c"),
            F.covar_samp("l_quantity", "l_extendedprice").alias("cv"),
            F.stddev_samp("l_quantity").alias("sd"),
        )
        .collect()
    }
    assert set(ours) == set(native)
    for flag, r in ours.items():
        n = native[flag]
        assert abs(r["corr_qty_price"] - n["c"]) < 1e-9
        assert abs(r["covar_qty_price"] - n["cv"]) < 1e-6 * max(1.0, abs(n["cv"]))
        assert abs(r["stddev_qty"] - n["sd"]) < 1e-9


def test_chunk_documents_overlap_and_short_docs(spark):
    from kafka_denormalization_spark.operators.chunking import chunk_documents

    text10 = " ".join(f"w{i}" for i in range(10))
    df = spark.createDataFrame([(1, text10), (2, "solo")], "id long, text string")
    out = chunk_documents(df, "id", "text", chunk_tokens=4, overlap=2)
    rows = {(r["id"], r["chunk_id"]): r for r in out.collect()}
    # doc 1: 10 tokens, step 2 -> ceil((10-2)/2) = 4 chunks at offsets 0,2,4,6
    assert sorted(k[1] for k in rows if k[0] == 1) == [0, 1, 2, 3]
    assert rows[(1, 0)]["chunk_text"] == "w0 w1 w2 w3"
    assert rows[(1, 1)]["chunk_text"] == "w2 w3 w4 w5"
    assert rows[(1, 3)]["chunk_text"] == "w6 w7 w8 w9"
    # short doc: one undersized chunk
    assert rows[(2, 0)]["chunk_text"] == "solo"
    assert rows[(2, 0)]["n_tokens"] == 1


def test_pack_chunks_concat_and_cut(spark):
    from kafka_denormalization_spark.operators.chunking import pack_chunks

    chunks = spark.createDataFrame(
        [("s", 1, 0, 60), ("s", 1, 1, 60), ("s", 2, 0, 60), ("s", 2, 1, 30)],
        "source string, doc_id long, chunk_id long, n_tokens long",
    )
    out = pack_chunks(chunks, "source", ["doc_id", "chunk_id"], budget=128)
    got = {
        (r["doc_id"], r["chunk_id"]): (r["pack_id"], r["pack_offset"])
        for r in out.collect()
    }
    # starts: 0, 60, 120, 180 with budget 128 -> packs 0,0,0,1
    assert got == {(1, 0): (0, 0), (1, 1): (0, 60), (2, 0): (0, 120), (2, 1): (1, 52)}


def test_fuzzy_self_join_dist1_edit_types(spark):
    from kafka_denormalization_spark.operators.fuzzy import fuzzy_self_join_dist1

    rows = [
        (1, "abcdef"),
        (2, "abcxef"),   # substitution of 1
        (3, "abcdefg"),  # insertion vs 1
        (4, "abcde"),    # deletion vs 1
        (5, "abXYef"),   # distance 2 from 1: excluded
        (6, "abcdef"),   # exact duplicate of 1: distance 0
    ]
    df = spark.createDataFrame(rows, "id long, s string")
    got = {
        (r["id_a"], r["id_b"]): r["dist"]
        for r in fuzzy_self_join_dist1(df, "id", "s").collect()
    }
    assert got[(1, 2)] == 1 and got[(1, 3)] == 1 and got[(1, 4)] == 1
    assert got[(1, 6)] == 0
    assert (1, 5) not in got
    # pairs among the variants themselves
    assert got[(3, 6)] == 1 and got[(4, 6)] == 1


def test_profile_and_constraints(spark):
    from pyspark.sql import functions as F

    from kafka_denormalization_spark.operators.profile import (
        check_constraints,
        profile,
    )

    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, None, -1.0), (3, "a", None)],
        "id long, tag string, v double",
    )
    prof = {r["col_name"]: r for r in profile(df).collect()}
    assert prof["id"]["n_rows"] == 3 and prof["id"]["n_nulls"] == 0
    assert prof["id"]["n_distinct"] == 3
    assert prof["tag"]["n_nulls"] == 1 and prof["tag"]["n_distinct"] == 1
    checks = {
        r["check_name"]: r
        for r in check_constraints(
            df,
            {
                "v_positive": F.col("v") > 0,
                "tag_present": F.col("tag").isNotNull(),
            },
        ).collect()
    }
    # NULL conditions are NOT violations (SQL three-valued semantics) —
    # add an explicit isNotNull constraint to catch missing values
    assert checks["v_positive"]["n_violations"] == 1
    assert not checks["v_positive"]["passed"]
    assert checks["tag_present"]["n_violations"] == 1


def test_incremental_dedup_against_base_and_within_batch(spark):
    from kafka_denormalization_spark.operators.dedup import incremental_dedup

    new = spark.createDataFrame(
        [
            (10, "alpha"),   # dup of base doc 1 -> dropped
            (11, "beta"),    # fresh -> kept
            (12, "gamma"),   # within-batch dup: min id 12 kept...
            (13, "gamma"),   # ...13 dropped
        ],
        "doc_id long, text string",
    )
    base = spark.createDataFrame([(1, "alpha"), (2, "delta")], "doc_id long, text string")
    kept = sorted(r["doc_id"] for r in incremental_dedup(new, base, "text", "doc_id").collect())
    assert kept == [11, 12]


def test_percentile_profile_exact_quantiles(spark):
    import pytest

    from kafka_denormalization_spark.operators.profile import percentile_profile

    df = spark.createDataFrame(
        [("a", v) for v in [1, 2, 3, 10]] + [("b", v) for v in [5, 5, 5]],
        "g string, v long",
    )
    out = {r["g"]: r for r in percentile_profile(df, "g", "v").collect()}
    assert out["a"]["n_rows"] == 4
    assert out["a"]["p25"] == 1.75
    assert out["a"]["p50"] == 2.5
    assert out["a"]["p75"] == 4.75
    assert out["b"]["p50"] == 5.0
    with pytest.raises(ValueError, match="dyadic"):
        percentile_profile(df, "g", "v", (0.9,))


def test_span_dedup_first_occurrence_wins(spark):
    """Repeated chunks survive only at min (doc_id, chunk_id); docs
    rebuild in chunk order; unique docs pass through untouched."""
    from kafka_denormalization_spark.operators.chunking import span_dedup

    a = "a b c d"   # chunk of doc 1 and (shifted copy) chunk 0 of doc 2
    rows = [
        (1, f"{a} e f g h"),          # chunks: 'a b c d', 'e f g h'
        (2, f"{a} x y z w"),          # 'a b c d' repeated -> dropped here
        (3, "p q r s"),               # unique single chunk
        (4, f"{a}"),                  # exactly the repeated chunk -> empty
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in span_dedup(df, "doc_id", "text", chunk_tokens=4).collect()}
    assert out[1]["text_dedup"] == "a b c d e f g h" and out[1]["n_dropped"] == 0
    assert out[2]["text_dedup"] == "x y z w" and out[2]["n_dropped"] == 1
    assert out[3]["text_dedup"] == "p q r s" and out[3]["n_dropped"] == 0
    assert out[4]["text_dedup"] == "" and out[4]["n_dropped"] == 1
    assert out[4]["n_chunks"] == 1


def test_exact_substr_dedup_hand_computed(spark):
    """Rolling-window substring dedup (operators/chunking.py
    exact_substr_dedup): a token survives iff some window covering it
    is that window-text's globally-first occurrence. Unique docs pass
    through; a full-duplicate doc empties; short docs survive intact."""
    from kafka_denormalization_spark.operators.chunking import (
        exact_substr_dedup,
    )

    rows = [
        (1, "a b c d e f"),   # all windows first-occurrence -> intact
        (2, "a b c d e f"),   # every window a repeat -> empty
        (3, "x y"),           # shorter than the window -> intact
        (4, "p q r s a b c d e f"),  # trailing run repeats doc 1
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in exact_substr_dedup(
            df, "doc_id", "text", window_tokens=4
        ).collect()
    }
    assert out[1]["text_dedup"] == "a b c d e f"
    assert out[1]["n_kept"] == 6 and out[1]["n_tokens"] == 6
    assert out[2]["text_dedup"] == "" and out[2]["n_kept"] == 0
    assert out[3]["text_dedup"] == "x y" and out[3]["n_kept"] == 2
    # doc 4: windows starting at 'p q r s', 'q r s a', 'r s a b',
    # 's a b c' are first occurrences (cover tokens 0..6); 'a b c d',
    # 'b c d e', 'c d e f' repeat doc 1 — tokens 7..9 ('d e f') are
    # covered ONLY by repeated windows and drop
    assert out[4]["text_dedup"] == "p q r s a b c"
    assert out[4]["n_kept"] == 7 and out[4]["n_tokens"] == 10


def test_exact_substr_dedup_catches_non_chunk_aligned_duplicate(spark):
    """The fidelity gap VERDICT r07 'What's missing' #3 names, pytested
    both ways: a duplicated run that straddles span_dedup's chunk
    boundaries (starts mid-chunk, spans two chunks) SURVIVES
    chunk-granular span_dedup (provably — both copies intact) but is
    REMOVED at its second occurrence by exact_substr_dedup."""
    from kafka_denormalization_spark.operators.chunking import (
        exact_substr_dedup,
        span_dedup,
    )

    # the repeated run R = r0..r19 (20 tokens >= 2*window-1, so some of
    # doc 2's copy is covered ONLY by in-run windows). In doc 1 it
    # occupies positions 2..21; in doc 2 positions 5..24 — with
    # chunk_tokens=8 the two copies are chunk-misaligned (offsets 2 vs
    # 5 mod 8), so no 8-token CHUNK of doc 1 equals any chunk of doc 2.
    run = " ".join(f"r{i}" for i in range(20))
    d1 = "u1 u2 " + run + " u3 u4 u5 u6 u7 u8"       # 28 tokens
    d2 = "v1 v2 v3 v4 v5 " + run + " v6 v7 v8"       # 28 tokens
    df = spark.createDataFrame(
        [(1, d1), (2, d2)], "doc_id long, text string"
    )
    spanned = {
        r["doc_id"]: r
        for r in span_dedup(df, "doc_id", "text", chunk_tokens=8).collect()
    }
    # span_dedup provably misses it: nothing dropped anywhere
    assert spanned[1]["n_dropped"] == 0 and spanned[2]["n_dropped"] == 0
    assert spanned[2]["text_dedup"] == d2

    exact = {
        r["doc_id"]: r
        for r in exact_substr_dedup(
            df, "doc_id", "text", window_tokens=8
        ).collect()
    }
    # exact_substr_dedup keeps doc 1 (first occurrence) intact. In
    # doc 2, tokens at positions 12..17 (r7..r12) are covered ONLY by
    # all-r windows, every one of which repeats doc 1 — they drop; the
    # run's head/tail stay (each is covered by a unique window that
    # straddles into the v-prefix/suffix).
    assert exact[1]["text_dedup"] == d1
    assert exact[2]["n_kept"] == 22 and exact[2]["n_tokens"] == 28
    assert "r7 r8 r9 r10 r11 r12" not in exact[2]["text_dedup"]
    assert exact[2]["text_dedup"].startswith("v1 v2 v3 v4 v5 r0")
    assert exact[2]["text_dedup"].endswith("r19 v6 v7 v8")


def test_exact_substr_dedup_matches_brute_force_randomized(spark):
    """Randomized differential vs a Python brute-force of the same
    semantics (first occurrence by (doc_id, start); token kept iff
    covered by a kept window; short docs intact)."""
    import random

    from kafka_denormalization_spark.operators.chunking import (
        exact_substr_dedup,
    )

    rng = random.Random(13)
    vocab = [f"w{i}" for i in range(12)]  # small vocab => real repeats
    docs = []
    for i in range(30):
        n = rng.randint(1, 24)
        docs.append((i, " ".join(rng.choice(vocab) for _ in range(n))))
    w = 5

    first = {}
    for i, text in docs:
        toks = text.split()
        for s in range(len(toks) - w + 1):
            key = " ".join(toks[s : s + w])
            if key not in first:
                first[key] = (i, s)
    expect = {}
    for i, text in docs:
        toks = text.split()
        if len(toks) < w:
            expect[i] = (text, len(toks), len(toks))
            continue
        kept = set()
        for s in range(len(toks) - w + 1):
            if first[" ".join(toks[s : s + w])] == (i, s):
                kept.update(range(s, s + w))
        kept_toks = [toks[p] for p in sorted(kept)]
        expect[i] = (" ".join(kept_toks), len(toks), len(kept_toks))

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["text_dedup"], r["n_tokens"], r["n_kept"])
        for r in exact_substr_dedup(
            df, "doc_id", "text", window_tokens=w
        ).collect()
    }
    assert got == expect


def test_corpus_report_rollup_consistency(spark):
    """Rollup invariants: grand total row equals the sum of lang rows;
    quality_rate = quality_docs/n_docs; gid distinguishes levels."""
    from kafka_denormalization_spark.queries import q_corpus_report

    rows = q_corpus_report(spark, "/root/testdata/sf0.001").collect()
    total = [r for r in rows if r["gid"] == 3]
    langs = [r for r in rows if r["gid"] == 1]
    assert len(total) == 1
    assert total[0]["n_docs"] == sum(r["n_docs"] for r in langs)
    assert total[0]["total_tokens"] == sum(r["total_tokens"] for r in langs)
    for r in rows:
        assert 0.0 <= r["quality_rate"] <= 1.0
        assert abs(r["quality_rate"] - round(r["quality_docs"] / r["n_docs"], 6)) < 1e-12


def test_rolling_zscore_flags_outlier(spark):
    """A spike after a flat run gets a high z; flat windows get z=0;
    the first row of each partition is 0 (variance undefined)."""
    from kafka_denormalization_spark.operators.window import rolling_zscore

    rows = [(i, 1, float(10 + (i % 2)), i) for i in range(8)] + [
        (8, 1, 100.0, 8),          # spike for user 1
        (20, 2, 5.0, 0), (21, 2, 5.0, 1),   # flat user 2
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, value double, t long")
    out = {r["event_id"]: r["z_r"] for r in
           rolling_zscore(df, "user_id", ["t", "event_id"], "value").collect()}
    assert out[0] == 0.0           # first row: no variance
    assert out[8] > 2.0            # spike
    assert out[20] == 0.0 and out[21] == 0.0   # flat -> zero variance


def test_rolling_zscore_large_magnitudes(spark):
    """Values of ~5e4 (bytes/microseconds scale) must not overflow the
    sum-of-squares accumulator (v20^2 ~ 2.7e21 > int64 max; the decimal
    accumulator holds it) — and the z-score stays scale-invariant."""
    from kafka_denormalization_spark.operators.window import rolling_zscore

    base = [10.0] * 8 + [100.0]
    big = [v * 5e3 for v in base]  # peak value 5e5, v20 ~ 5.2e11
    rows = [(i, 1, base[i], i) for i in range(9)] + [
        (100 + i, 2, big[i], i) for i in range(9)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, value double, t long"
    )
    out = {r["event_id"]: r["z_r"] for r in
           rolling_zscore(df, "user_id", ["t", "event_id"], "value").collect()}
    assert out[108] > 2.0
    # scale-invariance: same shape, 5000x the magnitude, ~same z
    assert abs(out[108] - out[8]) < 1e-6


def test_probe_masks_guard():
    """2^num_planes driver-side enumeration refuses above 20 planes."""
    import pytest as _pytest
    from kafka_denormalization_spark.functions.similarity import _probe_masks

    assert len(_probe_masks(4, 1)) == 5
    with _pytest.raises(ValueError, match="num_planes"):
        _probe_masks(32, 1)


# ---------------------------------------------------------------------------
# corpus_diff (snapshot versioning)
# ---------------------------------------------------------------------------


def test_corpus_diff_classifies_all_statuses(spark):
    from kafka_denormalization_spark.operators.diff import corpus_diff

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(1, "a"), (2, "B2"), (4, "d")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in corpus_diff(old, new, "doc_id", "text").collect()}
    assert out[1]["status"] == "unchanged"
    assert out[2]["status"] == "changed"
    assert out[3]["status"] == "removed" and out[3]["new_digest"] is None
    assert out[4]["status"] == "added" and out[4]["old_digest"] is None
    assert set(out) == {1, 2, 3, 4}
