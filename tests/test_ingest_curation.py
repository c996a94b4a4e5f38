"""Composed continuous-ingest curation (streaming/ingest_curation.py):
N batches through span-dedup -> gate -> exact -> near-dedup -> shard
layout, with a mid-stream restart, must equal the same chain composed
from the BATCH operators over the union (id-ordered arrival is the
twins' documented equivalence regime; shard positions are append
offsets, so the batch comparison checks shard ASSIGNMENT + per-shard
position contiguity, per IngestShard's deviation contract)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

pytestmark = pytest.mark.usefixtures("spark")


def _tok_run(prefix: str, n: int, start: int = 1) -> str:
    return " ".join(f"{prefix}{i}" for i in range(start, start + n))


def _fixture_batches():
    a32 = _tok_run("a", 32)
    b12 = _tok_run("b", 12)
    c12 = _tok_run("c", 12)
    return [
        # batch 1
        [
            (1, a32),                                   # survivor (2 chunks)
            (2, b12),                                   # survivor
            (3, c12),                                   # survivor, near-group C
            (4, _tok_run("d", 12)),                     # survivor
        ],
        # batch 2
        [
            (5, _tok_run("c", 11) + " zz"),             # near-dups 3 -> dropped
            (6, b12),                                   # span state kills (='')
            (7, _tok_run("a", 16) + " " + _tok_run("e", 16)),
            # ^ chunk 1 seen (doc 1's first 16 tokens), chunk 2 fresh:
            #   1 of 2 dropped, gate passes, rebuilt = e1..e16 -> survivor
            (8, a32 + " " + _tok_run("f", 8)),          # 2 of 3 chunks seen -> gated
        ],
        # batch 3 (after restart)
        [
            (9, _tok_run("c", 11, start=2) + " ww"),    # near-dups 3 across restart
            (10, b12),                                  # span state survives restart
            (11, _tok_run("g", 12)),                    # survivor
        ],
    ]


def _batch_reference(spark, union_df, n_shards):
    """The same composed chain built from the batch operators."""
    from kafka_denormalization_spark.functions.similarity import (
        ngram_jaccard_pairs,
    )
    from kafka_denormalization_spark.operators.chunking import span_dedup
    from kafka_denormalization_spark.operators.sharding import shard_plan

    spanned = span_dedup(union_df, "doc_id", "text", chunk_tokens=16)
    gated = spanned.filter(
        (F.lit(2) * F.col("n_dropped") <= F.col("n_chunks"))
        & (F.length("text_dedup") > 0)
    )
    pairs = ngram_jaccard_pairs(
        gated.select("doc_id", F.col("text_dedup").alias("text")),
        "doc_id",
        "text",
        threshold=0.5,
    )
    survivors = gated.join(
        pairs.select(F.col("id_b").alias("doc_id")), "doc_id", "left_anti"
    )
    return shard_plan(survivors, "doc_id", n_shards=n_shards, salt="shard")


def test_composed_curation_matches_batch_chain_with_restart(spark, tmp_path):
    from kafka_denormalization_spark.streaming.ingest_curation import (
        IngestCuration,
    )

    batches = _fixture_batches()
    state = str(tmp_path / "state")
    shipped = []

    cur = IngestCuration(
        spark, state, "doc_id", "text", n_shards=4, chunk_tokens=16
    )
    for batch in batches[:2]:
        df = spark.createDataFrame(batch, "doc_id long, text string")
        shipped.extend(r.asDict() for r in cur.process_batch(df).collect())

    # mid-stream restart: a FRESH instance over the same state dir
    cur2 = IngestCuration(
        spark, state, "doc_id", "text", n_shards=4, chunk_tokens=16
    )
    df3 = spark.createDataFrame(batches[2], "doc_id long, text string")
    shipped.extend(r.asDict() for r in cur2.process_batch(df3).collect())

    union = spark.createDataFrame(
        [row for b in batches for row in b], "doc_id long, text string"
    )
    ref = {
        r["doc_id"]: r
        for r in _batch_reference(spark, union, n_shards=4).collect()
    }

    got = {r["doc_id"]: r for r in shipped}
    # 1) the shipped DOCUMENT SET matches the batch chain
    assert sorted(got) == sorted(ref) == [1, 2, 3, 4, 7, 11]
    # 2) rebuilt text matches per doc
    for d in got:
        assert got[d]["text_dedup"] == ref[d]["text_dedup"], d
    # 3) shard assignment is the same pure function
    for d in got:
        assert got[d]["shard_id"] == ref[d]["shard_id"], d
    # 4) streaming positions: contiguous 0..n-1 per shard (append
    #    offsets; global order is the documented deviation vs the
    #    batch twin's full-shuffle layout)
    by_shard: dict[int, list[int]] = {}
    for d in got:
        by_shard.setdefault(got[d]["shard_id"], []).append(got[d]["pos"])
    for s, poss in by_shard.items():
        assert sorted(poss) == list(range(len(poss))), (s, poss)


def test_composed_curation_streaming_e2e(spark, tmp_path):
    """Real Structured Streaming run of the composed pipeline: file
    source, one file per trigger, foreachBatch(IngestCuration)."""
    from kafka_denormalization_spark.streaming.ingest_curation import (
        IngestCuration,
    )

    batches = _fixture_batches()
    src = str(tmp_path / "src")
    os.makedirs(src)
    for i, b in enumerate(batches):
        spark.createDataFrame(b, "doc_id long, text string").coalesce(
            1
        ).write.parquet(f"{src}/f{i}")

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/f*")
    )
    cur = IngestCuration(
        spark, str(tmp_path / "state"), "doc_id", "text",
        n_shards=4, chunk_tokens=16,
    )
    got: list[int] = []

    def sink(df, epoch_id):
        got.extend(r["doc_id"] for r in df.collect())

    q = (
        stream.writeStream.foreachBatch(cur.foreach_batch(sink))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    # file order within one trigger run is by path, matching batch
    # numbering, so the survivor set is the deterministic one
    assert sorted(got) == [1, 2, 3, 4, 7, 11]


def test_composed_curation_compact_preserves_state(spark, tmp_path):
    from kafka_denormalization_spark.streaming.ingest_curation import (
        IngestCuration,
    )

    batches = _fixture_batches()
    cur = IngestCuration(
        spark, str(tmp_path / "st"), "doc_id", "text",
        n_shards=4, chunk_tokens=16,
    )
    for batch in batches[:2]:
        cur.process_batch(
            spark.createDataFrame(batch, "doc_id long, text string")
        ).collect()
    stats = cur.compact()
    assert set(stats) >= {"span_digests", "seen_digests", "shard_counters"}
    out3 = cur.process_batch(
        spark.createDataFrame(batches[2], "doc_id long, text string")
    ).collect()
    assert sorted(r["doc_id"] for r in out3) == [11]


def test_frozen_model_doc_filter_e2e(spark, tmp_path):
    """The production pattern for corpus-GLOBAL stages in continuous
    ingest: train the bigram LM (functions/text.py lm_model) and the
    temperature fractions (operators/sampling.py temperature_fractions)
    in BATCH on a historical corpus, FREEZE both to parquet, reload,
    and apply them as stateless filters through IngestCuration's
    doc_filter hook (a DataFrame callable — the LM cutoff needs the
    vocab-bounded model-table lookup, broadcast by AQE). Parity: the
    streamed shipped set must equal the batch chain with the SAME
    frozen filters inserted at the same point."""
    from kafka_denormalization_spark.functions.similarity import (
        ngram_jaccard_pairs,
    )
    from kafka_denormalization_spark.functions.text import (
        lm_model,
        lm_score_with_model,
    )
    from kafka_denormalization_spark.operators.chunking import span_dedup
    from kafka_denormalization_spark.operators.sampling import (
        sample_hash,
        temperature_fractions,
    )
    from kafka_denormalization_spark.operators.sharding import shard_plan
    from kafka_denormalization_spark.streaming.ingest_curation import (
        IngestCuration,
    )

    # --- batch: train + freeze ------------------------------------------
    fluent_base = "the cat sat on the mat and the dog ran fast"
    hist = spark.createDataFrame(
        [(100 + i, fluent_base) for i in range(10)],
        "doc_id long, text string",
    ).withColumn("n_chars", F.length("text"))
    uni, bi, stats = lm_model(hist, "text", F.lit(True))
    hist_strat = hist.withColumn(
        "stratum",
        F.when(F.col("doc_id") % 2 == 0, F.lit("even")).otherwise(
            F.lit("odd")
        ),
    )
    fr = temperature_fractions(
        hist_strat, "stratum", "n_chars", budget_frac=0.6
    )
    mdl = str(tmp_path / "frozen")
    uni.write.parquet(f"{mdl}/uni")
    bi.write.parquet(f"{mdl}/bi")
    stats.write.parquet(f"{mdl}/stats")
    fr.write.parquet(f"{mdl}/fr")
    # reload: the freeze is a real parquet round-trip, not lineage reuse
    uni_f = spark.read.parquet(f"{mdl}/uni")
    bi_f = spark.read.parquet(f"{mdl}/bi")
    stats_f = spark.read.parquet(f"{mdl}/stats")
    fr_f = spark.read.parquet(f"{mdl}/fr")

    # --- streaming corpus: fluent (in-model bigrams) vs gibberish -------
    def fluent(i):
        return f"the cat sat on the mat p{i} q{i}"

    def gibberish(i):
        return " ".join(f"z{i}x{k}" for k in range(9))

    batches = [
        [(1, fluent(1)), (2, gibberish(2)), (3, fluent(3))],
        [(4, gibberish(4)), (5, fluent(5)), (6, fluent(6))],
        [(7, fluent(7)), (8, gibberish(8))],
    ]
    all_rows = [r for b in batches for r in b]
    union = spark.createDataFrame(all_rows, "doc_id long, text string")

    # cutoff from the FROZEN scorer: midpoint between the classes (the
    # classes must actually separate, or the fixture is broken)
    scored = {
        r["doc_id"]: r["nll_r"]
        for r in lm_score_with_model(
            union, "doc_id", "text", uni_f, bi_f, stats_f
        ).collect()
    }
    flu = [scored[d] for d, t in all_rows if t.startswith("the ")]
    gib = [scored[d] for d, t in all_rows if not t.startswith("the ")]
    assert max(flu) < min(gib), (flu, gib)
    cutoff = round((max(flu) + min(gib)) / 2, 6)

    stratum_col = (
        F.when(F.col("doc_id") % 2 == 0, F.lit("even"))
        .otherwise(F.lit("odd"))
    )

    def frozen_filter(df):
        keep = (
            lm_score_with_model(
                df, "doc_id", "text_dedup", uni_f, bi_f, stats_f
            )
            .filter(
                (F.col("n_bigrams") >= 1) & (F.col("nll_r") <= cutoff)
            )
            .select("doc_id")
        )
        out = df.join(F.broadcast(keep), "doc_id", "left_semi")
        return (
            out.withColumn("stratum", stratum_col)
            .join(F.broadcast(fr_f), "stratum")
            .filter(
                sample_hash(F.col("doc_id"), "temp") < F.col("_thr")
            )
            .drop("stratum", "keep_frac", "_thr")
        )

    # --- stream through the hook ----------------------------------------
    cur = IngestCuration(
        spark, str(tmp_path / "state"), "doc_id", "text",
        n_shards=4, chunk_tokens=16, doc_filter=frozen_filter,
    )
    shipped = []
    for batch in batches:
        df = spark.createDataFrame(batch, "doc_id long, text string")
        shipped.extend(r.asDict() for r in cur.process_batch(df).collect())
    got = {r["doc_id"]: r for r in shipped}

    # --- batch reference: same chain, same frozen filters ---------------
    spanned = span_dedup(union, "doc_id", "text", chunk_tokens=16)
    gated = spanned.filter(
        (F.lit(2) * F.col("n_dropped") <= F.col("n_chunks"))
        & (F.length("text_dedup") > 0)
    )
    filtered = frozen_filter(gated)
    pairs = ngram_jaccard_pairs(
        filtered.select("doc_id", F.col("text_dedup").alias("text")),
        "doc_id", "text", threshold=0.5,
    )
    survivors = filtered.join(
        pairs.select(F.col("id_b").alias("doc_id")), "doc_id", "left_anti"
    )
    ref = {
        r["doc_id"]: r
        for r in shard_plan(
            survivors, "doc_id", n_shards=4, salt="shard"
        ).collect()
    }

    assert sorted(got) == sorted(ref)
    # non-vacuous: every gibberish doc was LM-gated out...
    assert not ({2, 4, 8} & set(got))
    # ...and the temperature stage dropped at least one FLUENT doc
    assert set(got) < {1, 3, 5, 6, 7}
    for d in got:
        assert got[d]["text_dedup"] == ref[d]["text_dedup"], d
        assert got[d]["shard_id"] == ref[d]["shard_id"], d


def test_frozen_boilerplate_and_nb_filter_e2e(spark, tmp_path):
    """Round-8 frozen-model composition: the heavy-LINE set
    (functions/text.py boilerplate_lines — corpus-global, so batch-
    trained) and the NB quality model (nb_quality_model) are frozen to
    parquet, reloaded, and applied to a stream — the line strip as a
    stateless PRE-stage (line_dedup_with_lines, the same composition
    pattern as the url_dedup streaming twin), the NB gate through
    IngestCuration's doc_filter hook. Parity: the streamed shipped set
    must equal the batch chain with the SAME frozen filters at the same
    points, and no shipped text may contain a boilerplate line."""
    from kafka_denormalization_spark.functions.similarity import (
        ngram_jaccard_pairs,
    )
    from kafka_denormalization_spark.functions.text import (
        boilerplate_lines,
        line_dedup_with_lines,
        nb_quality_model,
        nb_score_with_model,
    )
    from kafka_denormalization_spark.operators.chunking import span_dedup
    from kafka_denormalization_spark.operators.sharding import shard_plan
    from kafka_denormalization_spark.streaming.ingest_curation import (
        IngestCuration,
    )

    BOILER = "subscribe to our newsletter today"

    # --- batch: train + freeze both models -------------------------------
    hist = spark.createDataFrame(
        [
            (100, f"{BOILER}\ngood clean prose here", True),
            (101, f"{BOILER}\nmore good clean text", True),
            (102, f"{BOILER}\nfine curated writing", True),
            (103, "zz spam qq junk vv noise", False),
            (104, "qq junk zz spam xx drivel", False),
        ],
        "doc_id long, text string, curated boolean",
    ).withColumn("lines", F.split(F.col("text"), "\n"))
    heavy = boilerplate_lines(hist, "doc_id", "lines", min_docs=3)
    model, default = nb_quality_model(hist, "text", F.col("curated"))
    mdl = str(tmp_path / "frozen")
    heavy.write.parquet(f"{mdl}/heavy")
    model.write.parquet(f"{mdl}/model")
    default.write.parquet(f"{mdl}/default")
    heavy_f = spark.read.parquet(f"{mdl}/heavy")
    model_f = spark.read.parquet(f"{mdl}/model")
    default_f = spark.read.parquet(f"{mdl}/default")

    # --- stream corpus: boilerplate-carrying good docs + junk docs -------
    def good(i):
        return f"{BOILER}\ngood clean prose p{i} q{i}"

    def junk(i):
        return f"{BOILER}\nzz spam qq junk j{i}"

    batches = [
        [(1, good(1)), (2, junk(2))],
        [(3, good(3)), (4, good(4)), (5, junk(5))],
        [(6, good(6))],
    ]
    all_rows = [r for b in batches for r in b]
    union = spark.createDataFrame(all_rows, "doc_id long, text string")

    def strip(df):
        """Frozen-line strip as a stateless pre-stage (rewrites text)."""
        with_lines = df.withColumn("lines", F.split(F.col("text"), "\n"))
        out = line_dedup_with_lines(
            with_lines, "doc_id", "lines", F.broadcast(heavy_f)
        )
        return out.filter(F.col("n_lines_kept") > 0).select(
            "doc_id", F.col("text_clean").alias("text")
        )

    def nb_gate(df):
        keep = (
            nb_score_with_model(
                df, "doc_id", "text_dedup", model_f, default_f
            )
            .filter(F.col("logodds_r") > 0)
            .select("doc_id")
        )
        return df.join(F.broadcast(keep), "doc_id", "left_semi")

    # --- stream through both hooks (pre_transform + doc_filter) ----------
    cur = IngestCuration(
        spark, str(tmp_path / "state"), "doc_id", "text",
        n_shards=4, chunk_tokens=2, doc_filter=nb_gate,
        pre_transform=strip,
    )
    shipped = []
    for batch in batches:
        df = spark.createDataFrame(batch, "doc_id long, text string")
        shipped.extend(
            r.asDict() for r in cur.process_batch(df).collect()
        )
    got = {r["doc_id"]: r for r in shipped}

    # no shipped text carries the boilerplate line
    assert got and all(BOILER not in r["text_dedup"] for r in got.values())
    # junk docs were NB-gated out; at least one good doc shipped
    assert not ({2, 5} & set(got))
    assert set(got) <= {1, 3, 4, 6}

    # --- batch reference: same chain, same frozen filters ----------------
    stripped = strip(union)
    spanned = span_dedup(stripped, "doc_id", "text", chunk_tokens=2)
    gated = spanned.filter(
        (F.lit(2) * F.col("n_dropped") <= F.col("n_chunks"))
        & (F.length("text_dedup") > 0)
    )
    filtered = nb_gate(gated)
    pairs = ngram_jaccard_pairs(
        filtered.select("doc_id", F.col("text_dedup").alias("text")),
        "doc_id", "text", threshold=0.5,
    )
    survivors = filtered.join(
        pairs.select(F.col("id_b").alias("doc_id")), "doc_id", "left_anti"
    )
    ref = {
        r["doc_id"]: r
        for r in shard_plan(
            survivors, "doc_id", n_shards=4, salt="shard"
        ).collect()
    }
    assert sorted(got) == sorted(ref)
    for d in got:
        assert got[d]["shard_id"] == ref[d]["shard_id"]


def test_signal_gate_pre_transform_e2e(spark, tmp_path):
    """quality_signals thresholds as the stateless pre_transform: docs
    failing the signal gate (dominant modal word / no stopwords) never
    reach the span stage or ship; the streamed shipped set equals the
    batch chain over the gate's survivors."""
    from kafka_denormalization_spark.functions.text import quality_signals
    from kafka_denormalization_spark.operators.chunking import span_dedup
    from kafka_denormalization_spark.operators.sharding import shard_plan
    from kafka_denormalization_spark.streaming.ingest_curation import (
        IngestCuration,
    )

    good1 = "the quick fox of the north is it going to the river tonight"
    good2 = "a calm sea and a long wind carry the boat to harbor at dawn"
    spam = " ".join(["buy"] * 12)          # top_word_frac 1.0 -> gated
    soup = _tok_run("z", 12)               # zero stopwords -> gated
    batches = [
        [(1, good1), (2, spam)],
        [(3, good2), (4, soup)],
    ]

    def signal_gate(df):
        sig = quality_signals(df, "doc_id", "text")
        keep = sig.filter(
            (sig.n_words >= 10)
            & (sig.frac_unique_r >= 0.3)
            & (sig.top_word_frac_r <= 0.25)
            & (sig.stop_frac_r >= 0.02)
        ).select("doc_id")
        return df.join(keep, "doc_id")

    cur = IngestCuration(
        spark, str(tmp_path / "state"), "doc_id", "text",
        n_shards=4, chunk_tokens=4, pre_transform=signal_gate,
    )
    shipped = []
    for batch in batches:
        df = spark.createDataFrame(batch, "doc_id long, text string")
        shipped.extend(r.asDict() for r in cur.process_batch(df).collect())
    got = {r["doc_id"]: r for r in shipped}
    assert set(got) == {1, 3}

    # batch reference over the union with the same gate
    union = spark.createDataFrame(
        [r for b in batches for r in b], "doc_id long, text string"
    )
    gated = signal_gate(union)
    spanned = span_dedup(gated, "doc_id", "text", chunk_tokens=4)
    surv = spanned.filter(
        (F.lit(2) * F.col("n_dropped") <= F.col("n_chunks"))
        & (F.length("text_dedup") > 0)
    )
    ref = {
        r["doc_id"]: r
        for r in shard_plan(surv, "doc_id", n_shards=4, salt="shard").collect()
    }
    assert sorted(got) == sorted(ref)
    for d in got:
        assert got[d]["shard_id"] == ref[d]["shard_id"]


def test_semantic_decontamination_doc_filter_e2e(spark, tmp_path):
    """Round-9 frozen-model composition: embedding-level
    decontamination (functions/similarity.py semantic_contamination)
    as IngestCuration's doc_filter. The benchmark eval-set embeddings
    are corpus-external and frozen to parquet (the production shape —
    eval sets never grow with the stream); a per-doc embedding side
    table joins each batch's survivors to their vectors, and docs with
    cosine >= threshold against ANY eval vector are dropped before
    exact/near dedup state ever sees them. Parity: the streamed
    shipped set equals the batch chain with the same frozen gate."""
    import numpy as np

    from kafka_denormalization_spark.functions.similarity import (
        semantic_contamination,
    )
    from kafka_denormalization_spark.operators.chunking import span_dedup
    from kafka_denormalization_spark.operators.sharding import shard_plan
    from kafka_denormalization_spark.streaming.ingest_curation import (
        IngestCuration,
    )

    rng = np.random.default_rng(17)
    evalv = rng.normal(size=(3, 8)).astype("float64")
    # doc embeddings: docs 2 and 5 are near-copies of eval vectors
    docvec = {i: rng.normal(size=8) for i in range(1, 7)}
    docvec[2] = evalv[0] + rng.normal(size=8) * 0.01
    docvec[5] = evalv[2] + rng.normal(size=8) * 0.01

    mdl = str(tmp_path / "frozen")
    spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(evalv)],
        "vec_id long, embedding array<float>",
    ).write.parquet(f"{mdl}/eval")
    spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in docvec.items()],
        "doc_id long, embedding array<float>",
    ).write.parquet(f"{mdl}/docvec")
    eval_f = spark.read.parquet(f"{mdl}/eval")
    docvec_f = spark.read.parquet(f"{mdl}/docvec")

    def decon_gate(df):
        flagged = (
            semantic_contamination(
                df.join(docvec_f, "doc_id").select("doc_id", "embedding"),
                eval_f,
                id_col="doc_id",
                threshold=0.95,
            )
            .filter(F.col("contaminated"))
            .select("doc_id")
        )
        return df.join(F.broadcast(flagged), "doc_id", "left_anti")

    batches = [
        [(1, "clean doc one a1 b1"), (2, "benchmark leak two a2 b2")],
        [(3, "clean doc three a3 b3"), (4, "clean doc four a4 b4")],
        [(5, "benchmark leak five a5 b5"), (6, "clean doc six a6 b6")],
    ]
    cur = IngestCuration(
        spark, str(tmp_path / "state"), "doc_id", "text",
        n_shards=4, chunk_tokens=4, doc_filter=decon_gate,
    )
    shipped = []
    for batch in batches:
        df = spark.createDataFrame(batch, "doc_id long, text string")
        shipped.extend(r.asDict() for r in cur.process_batch(df).collect())
    got = {r["doc_id"]: r for r in shipped}
    assert set(got) == {1, 3, 4, 6}  # the two planted leaks are dropped

    # batch reference: same chain, same frozen gate
    union = spark.createDataFrame(
        [r for b in batches for r in b], "doc_id long, text string"
    )
    spanned = span_dedup(union, "doc_id", "text", chunk_tokens=4)
    surv = spanned.filter(
        (F.lit(2) * F.col("n_dropped") <= F.col("n_chunks"))
        & (F.length("text_dedup") > 0)
    )
    gated = decon_gate(surv)
    ref = {
        r["doc_id"]: r
        for r in shard_plan(gated, "doc_id", n_shards=4, salt="shard").collect()
    }
    assert sorted(got) == sorted(ref)
    for d in got:
        assert got[d]["shard_id"] == ref[d]["shard_id"]


# -- conversation/preference streaming twin (VERDICT r09 #5) -------------------


def _conv(conv_id, *turns):
    return (conv_id, [{"role": r, "content": c} for r, c in turns])


_CONV_SCHEMA = (
    "conv_id long, "
    "turns array<struct<role: string, content: string>>"
)

_CANNED = (
    "i am sorry but i cannot help with that particular request "
    "please consult the documentation for details today"
)
# reworded canned response: same leading 18 tokens, new tail ->
# 3-gram jaccard well above the 0.5 threshold
_CANNED_REWORDED = " ".join(_CANNED.split()[:18]) + " friend okay"
_EVAL_ANSWER = "the capital of france is paris not london"


def _conv_batches():
    return [
        # batch 1: two clean conversations; conv 1 carries the canned
        # assistant response every later rewording must dedup against
        [
            _conv(
                1,
                ("user", "please explain how rainbows form in the sky"),
                ("assistant", _CANNED),
            ),
            _conv(
                2,
                ("user", "write a haiku about distributed shuffle joins"),
                ("assistant", "partitions in flight silent exchange of"
                              " the keys reducers await"),
            ),
        ],
        # batch 2: conv 3's assistant turn REWORDS conv 1's canned
        # response (turn near-dup -> pair killed); conv 4's response
        # embeds a frozen eval ANSWER 8-gram (decon gate -> pair
        # killed); conv 5 is clean
        [
            _conv(
                3,
                ("user", "completely different novel question about gardens"),
                ("assistant", _CANNED_REWORDED),
            ),
            _conv(
                4,
                ("user", "what is the capital city of france then"),
                ("assistant", "well " + _EVAL_ANSWER + " as everyone knows"),
            ),
            _conv(
                5,
                ("user", "how do i tune shuffle partitions in spark"),
                ("assistant", "start from cores times two then watch the"
                              " spill metrics and adjust upward slowly"),
            ),
        ],
    ]


def test_conv_curation_matches_batch_chain_with_restart(spark, tmp_path):
    """Streamed curated pairs == the batch chain (turn unnest -> turn
    near-dedup with smaller-key retention -> pair assembly ->
    response-side decontamination) over the concatenated corpus; a
    RESTARTED instance (fresh object, same state_dir) still remembers
    batch-1 turns (the ingest_dedup twin standard)."""
    from kafka_denormalization_spark.functions.conversations import (
        conversation_turns,
        freeze_eval_grams,
        instruction_response_pairs,
        pair_ngram_contamination,
    )
    from kafka_denormalization_spark.streaming.ingest_conversations import (
        TURN_KEY_STRIDE,
        IngestConvCuration,
    )

    evals = spark.createDataFrame(
        [(100, _EVAL_ANSWER)], "eval_id long, answer string"
    )
    frozen = str(tmp_path / "frozen_eval_grams")
    freeze_eval_grams(evals, frozen, text_col="answer", n=8)

    batches = _conv_batches()
    state = str(tmp_path / "conv_state")
    cur = IngestConvCuration(spark, state, frozen_grams_path=frozen)
    shipped = []
    # batch 1 through the first instance, batch 2 through a RESTARTED
    # one — the near-dedup memory must live in the durable state dir
    shipped.extend(
        r.asDict()
        for r in cur.process_batch(
            spark.createDataFrame(batches[0], _CONV_SCHEMA)
        ).collect()
    )
    cur2 = IngestConvCuration(spark, state, frozen_grams_path=frozen)
    shipped.extend(
        r.asDict()
        for r in cur2.process_batch(
            spark.createDataFrame(batches[1], _CONV_SCHEMA)
        ).collect()
    )
    got = {(r["conv_id"], r["turn_idx"]) for r in shipped}
    # conv 3's pair dies to turn near-dedup, conv 4's to the frozen
    # response-side gate
    assert got == {(1, 0), (2, 0), (5, 0)}

    # --- batch reference: same chain over the union ----------------------
    from kafka_denormalization_spark.functions.similarity import (
        minhash_lsh_pairs,
    )

    union = spark.createDataFrame(
        [c for b in batches for c in b], _CONV_SCHEMA
    )
    turns = conversation_turns(union).withColumn(
        "_turn_key",
        F.col("conv_id") * TURN_KEY_STRIDE + F.col("turn_idx"),
    )
    dup_pairs = minhash_lsh_pairs(
        turns, "_turn_key", "content", threshold=0.5, eager_cleanup=True
    )
    dropped = dup_pairs.select(
        F.greatest("id_a", "id_b").alias("_turn_key")
    ).dropDuplicates()
    surv = turns.join(dropped, "_turn_key", "left_anti").drop("_turn_key")
    ref_pairs = pair_ngram_contamination(
        instruction_response_pairs(surv), evals,
        prompt_col="answer", side="response",
    ).filter(~F.col("contaminated"))
    ref = {(r["conv_id"], r["turn_idx"]) for r in ref_pairs.collect()}
    assert got == ref

    # responses shipped are the verbatim surviving assistant turns
    by_conv = {r["conv_id"]: r for r in shipped}
    assert by_conv[1]["response"] == _CANNED
    assert by_conv[1]["instruction"].startswith("please explain")


def test_conv_curation_restart_memory_and_gate_off(spark, tmp_path):
    """A near-dup of a batch-1 canned turn arriving AFTER a restart is
    dropped (durable memory); with no frozen gate configured the twin
    is turn-dedup only and the eval-answer pair ships."""
    from kafka_denormalization_spark.streaming.ingest_conversations import (
        IngestConvCuration,
    )

    batches = _conv_batches()
    state = str(tmp_path / "state2")
    cur = IngestConvCuration(spark, state)  # no frozen gate
    out1 = cur.process_batch(
        spark.createDataFrame(batches[0], _CONV_SCHEMA)
    ).collect()
    assert {r["conv_id"] for r in out1} == {1, 2}
    cur2 = IngestConvCuration(spark, state)
    out2 = cur2.process_batch(
        spark.createDataFrame(batches[1], _CONV_SCHEMA)
    ).collect()
    # conv 3 still dies (restart memory); conv 4 SHIPS (gate off)
    assert {r["conv_id"] for r in out2} == {4, 5}


def test_freeze_eval_grams_empty_gate_raises(spark, tmp_path):
    """Honest gate: freezing an eval set whose every answer is shorter
    than n tokens would silently disable decontamination forever."""
    from kafka_denormalization_spark.functions.conversations import (
        freeze_eval_grams,
    )

    short = spark.createDataFrame(
        [(1, "too short")], "eval_id long, answer string"
    )
    with pytest.raises(ValueError, match="refusing to freeze"):
        freeze_eval_grams(short, str(tmp_path / "f"), text_col="answer", n=8)
    # ADVICE r10 #4: the failed freeze must leave NOTHING at the path —
    # an empty parquet there is a silently-always-pass gate for the
    # next pipeline pointed at it
    import os

    assert not os.path.exists(str(tmp_path / "f")), (
        "failed freeze left an (empty) parquet on disk"
    )


def test_pref_pair_dedup_streaming_matches_batch_with_restart(spark, tmp_path):
    """IngestPrefPairDedup: streamed survivors == the batch both-sides
    operator (functions/preference.py preference_pair_dedup) over the
    union; a single matching side SHIPS; a RESTARTED instance still
    remembers batch-1 pairs."""
    from kafka_denormalization_spark.functions.preference import (
        preference_pair_dedup,
    )
    from kafka_denormalization_spark.streaming.ingest_conversations import (
        IngestPrefPairDedup,
    )

    base = "the quick brown fox jumps over the lazy dog again and again"
    alt = "completely different response about database join strategies here"
    rej = "a brief unhelpful reply that dodges the question entirely"
    schema = "pair_id long, chosen string, rejected string"
    batches = [
        # batch 1: the original pair + an unrelated pair
        [
            (1, base + " extra tail words", rej),
            (2, alt, "another terse reply that refuses to engage at all"),
        ],
        # batch 2: pair 10 both-sides near-dups pair 1 (dropped);
        # pair 11 chosen-only match (ships); pair 12 within-batch
        # both-sides near-dup of pair 11 (dropped, min pair_id wins)
        [
            (10, base + " extra tail words padded", rej + " sadly"),
            (11, base + " extra tail words also", alt + " with numbers"),
            (12, base + " extra tail words also yes", alt + " with numbers too"),
        ],
    ]
    state = str(tmp_path / "pref_state")
    dd = IngestPrefPairDedup(spark, state, threshold=0.5)
    out1 = sorted(
        r["pair_id"]
        for r in dd.process_batch(
            spark.createDataFrame(batches[0], schema)
        ).collect()
    )
    assert out1 == [1, 2]
    # restart: fresh instance, same state dir
    dd2 = IngestPrefPairDedup(spark, state, threshold=0.5)
    out2 = sorted(
        r["pair_id"]
        for r in dd2.process_batch(
            spark.createDataFrame(batches[1], schema)
        ).collect()
    )
    assert out2 == [11]

    # batch reference over the union
    union = spark.createDataFrame(
        [p for b in batches for p in b], schema
    )
    ref = sorted(
        r["pair_id"] for r in preference_pair_dedup(union).collect()
    )
    assert sorted(out1 + out2) == ref


def test_pref_curation_composed_matches_batch_with_restart(spark, tmp_path):
    """IngestPrefCuration (VERDICT r10 #7): conversations -> role-scoped
    turn dedup -> per-batch preference-pair assembly -> cross-batch
    BOTH-SIDES pair dedup, one foreachBatch — streamed survivors == the
    batch chain (instruction_response_pairs -> preference_pairs ->
    preference_pair_dedup) over the union, with a RESTART between
    batches. Regime: every instruction group arrives within one batch
    (the class docstring's documented equivalence regime); identical
    user instructions survive because only assistant turns enter the
    turn-dedup state."""
    from kafka_denormalization_spark.functions.conversations import (
        conversation_turns,
        instruction_response_pairs,
    )
    from kafka_denormalization_spark.functions.preference import (
        preference_pair_dedup,
        preference_pairs,
    )
    from kafka_denormalization_spark.streaming.ingest_conversations import (
        IngestPrefCuration,
    )

    # 14-word A / 10-word B: chosen (longest) is stable under the
    # single-word rewordings; one changed word keeps 3-gram Jaccard in
    # [0.5, 0.9) — past the 0.9 turn gate, inside the 0.5 pair rule
    A = ("cherry blossoms drift across the quiet pond while morning "
         "sunlight settles gently over stones")
    A_last = A.replace("stones", "pebbles")
    A_first = A.replace("cherry", "sakura")
    B = "petals fall in pink spirals covering wooden bridges near temples"
    B_last = B.replace("temples", "shrines")
    C = ("weeds tangle beneath broken fences where rusty gates lean "
         "against crumbling walls")

    batches = [
        # batch 1 — group G1 (instruction I1): pair (A chosen, B rejected)
        [
            _conv(1, ("user", "write a short poem about spring"),
                  ("assistant", A)),
            _conv(2, ("user", "write a short poem about spring"),
                  ("assistant", B)),
        ],
        # batch 2 — G2 rewords BOTH of G1's sides (cross-batch drop);
        # G3 rewords only the chosen side (single-side match SHIPS)
        [
            _conv(6, ("user", "write a short poem about springtime blooms"),
                  ("assistant", A_last)),
            _conv(7, ("user", "write a short poem about springtime blooms"),
                  ("assistant", B_last)),
            _conv(8, ("user", "compose a verse about gardens in spring"),
                  ("assistant", A_first)),
            _conv(9, ("user", "compose a verse about gardens in spring"),
                  ("assistant", C)),
        ],
    ]
    state = str(tmp_path / "pref_state")
    got = []
    pc = IngestPrefCuration(spark, state)
    got.extend(
        r.asDict()
        for r in pc.process_batch(
            spark.createDataFrame(batches[0], _CONV_SCHEMA)
        ).collect()
    )
    # restart: fresh instance, same state dir — both the turn and the
    # pair memories must live in durable state
    pc2 = IngestPrefCuration(spark, state)
    got.extend(
        r.asDict()
        for r in pc2.process_batch(
            spark.createDataFrame(batches[1], _CONV_SCHEMA)
        ).collect()
    )

    union = spark.createDataFrame(
        [c for b in batches for c in b], _CONV_SCHEMA
    )
    ref_prefs = preference_pairs(
        instruction_response_pairs(conversation_turns(union))
    )
    ref = sorted(
        r["pair_id"]
        for r in preference_pair_dedup(ref_prefs, threshold=0.5).collect()
    )
    assert sorted(r["pair_id"] for r in got) == ref
    # the both-sides drop actually fired: G1 (conv 1) and G3 (conv 8)
    # survive, G2 (conv 6) does not
    assert sorted(r["chosen_conv"] for r in got) == [1, 8]
    chosen = {r["chosen_conv"]: r for r in got}
    assert chosen[1]["chosen"] == A and chosen[1]["rejected"] == B
    assert chosen[8]["chosen"] == A_first and chosen[8]["rejected"] == C


def test_pref_curation_streaming_e2e(spark, tmp_path):
    """Real Structured Streaming run for IngestPrefCuration: file
    source, one file per trigger — the batch-2 group whose chosen AND
    rejected sides reword a batch-1 surviving pair never reaches the
    sink (durable both-sides state across triggers)."""
    import os

    from kafka_denormalization_spark.streaming.ingest_conversations import (
        IngestPrefCuration,
    )

    A = ("cherry blossoms drift across the quiet pond while morning "
         "sunlight settles gently over stones")
    B = "petals fall in pink spirals covering wooden bridges near temples"
    src = str(tmp_path / "src")
    os.makedirs(src)
    spark.createDataFrame(
        [
            _conv(1, ("user", "write a short poem about spring"),
                  ("assistant", A)),
            _conv(2, ("user", "write a short poem about spring"),
                  ("assistant", B)),
        ],
        _CONV_SCHEMA,
    ).coalesce(1).write.parquet(src + "/f1")
    spark.createDataFrame(
        [
            _conv(6, ("user", "write a short poem about springtime"),
                  ("assistant", A.replace("stones", "pebbles"))),
            _conv(7, ("user", "write a short poem about springtime"),
                  ("assistant", B.replace("temples", "shrines"))),
        ],
        _CONV_SCHEMA,
    ).coalesce(1).write.parquet(src + "/f2")

    stream = (
        spark.readStream.schema(_CONV_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/f*")
    )
    pc = IngestPrefCuration(spark, str(tmp_path / "state"))
    got: list[int] = []
    q = (
        stream.writeStream.foreachBatch(
            pc.foreach_batch(
                lambda df, e: got.extend(r["chosen_conv"] for r in df.collect())
            )
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    # whichever file ran first assembles the surviving pair; the other
    # group's pair (a both-sides reword) is dropped against state
    assert len(got) == 1 and got[0] in (1, 6)


def test_role_scope_split_is_exhaustive_with_null_roles(spark):
    """ADVICE r11 #2: the role-scoped dedup split must be EXHAUSTIVE —
    a turn with a NULL role satisfies neither isin() nor ~isin() (both
    evaluate to NULL), so the naive filter pair dropped it silently;
    it must land in pass_through exactly like the dedup_roles=None
    regime would keep it."""
    from kafka_denormalization_spark.streaming.ingest_conversations import (
        role_scope_split,
    )

    rows = [
        (1, 0, "user", "hello"),
        (1, 1, "assistant", "hi"),
        (1, 2, None, "system note with no role"),
        (2, 0, "tool", "result blob"),
    ]
    turns = spark.createDataFrame(
        rows, "conv_id long, turn_idx long, role string, content string"
    )
    in_scope, pass_through = role_scope_split(turns, ("assistant",))
    scope_keys = {(r[0], r[1]) for r in in_scope.collect()}
    pass_keys = {(r[0], r[1]) for r in pass_through.collect()}
    assert scope_keys == {(1, 1)}
    assert pass_keys == {(1, 0), (1, 2), (2, 0)}, (
        "NULL-role turn was dropped by the scoped split"
    )
    assert scope_keys | pass_keys == {(r[0], r[1]) for r in rows}
    assert not (scope_keys & pass_keys)
