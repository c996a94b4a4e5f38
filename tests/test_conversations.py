"""Conversation / SFT-data operators (functions/conversations.py)."""

from __future__ import annotations

from kafka_denormalization_spark.functions import conversations as C


def _nested(spark, rows):
    return spark.createDataFrame(
        rows,
        "conv_id long, turns array<struct<role string, content string>>",
    )


def test_conversation_turns_explode(spark):
    conv = _nested(
        spark,
        [
            (1, [("user", "hello there"), ("assistant", "hi")]),
            (2, [("system", "be nice")]),
        ],
    )
    out = sorted(
        (r["conv_id"], r["turn_idx"], r["role"], r["content"])
        for r in C.conversation_turns(conv).collect()
    )
    assert out == [
        (1, 0, "user", "hello there"),
        (1, 1, "assistant", "hi"),
        (2, 0, "system", "be nice"),
    ]


def test_turn_dedup_canned_response_flagged(spark):
    canned = "I am sorry but I cannot help with that request"
    conv = _nested(
        spark,
        [
            (1, [("user", "how do I fix my code"), ("assistant", canned)]),
            (2, [("user", "write me a poem"), ("assistant", canned)]),
            (3, [("user", canned)]),  # same text, user role: NOT a dup
        ],
    )
    turns = C.conversation_turns(conv)
    out = {
        (r["conv_id"], r["turn_idx"]): r for r in C.turn_dedup(turns).collect()
    }
    assert not out[(1, 1)]["is_dup"]  # first occurrence
    assert out[(2, 1)]["is_dup"]
    assert (out[(2, 1)]["src_conv"], out[(2, 1)]["src_turn"]) == (1, 1)
    assert not out[(3, 0)]["is_dup"]  # role participates in identity
    assert not out[(1, 0)]["is_dup"] and not out[(2, 0)]["is_dup"]
    # originals point at themselves
    assert (out[(1, 1)]["src_conv"], out[(1, 1)]["src_turn"]) == (1, 1)


def test_role_scrub_pii_is_role_aware(spark):
    conv = _nested(
        spark,
        [
            (
                1,
                [
                    ("user", "mail bob@corp.com or call +1 555-123-9999 ok"),
                    ("assistant", "contact alice@corp.com at +1 555-123-9999"),
                    ("system", "log to admin@corp.com"),
                ],
            ),
        ],
    )
    out = {
        r["turn_idx"]: r
        for r in C.role_scrub_pii(C.conversation_turns(conv)).collect()
    }
    # user: full chain — email AND phone go
    assert out[0]["content_scrubbed"] == "mail <EMAIL> or call <PHONE> ok"
    assert out[0]["changed"]
    # assistant: emails only — the phone stays
    assert out[1]["content_scrubbed"] == "contact <EMAIL> at +1 555-123-9999"
    # system/tool turns pass through untouched
    assert out[2]["content_scrubbed"] == "log to admin@corp.com"
    assert not out[2]["changed"]


def test_instruction_response_pairs_adjacency(spark):
    conv = _nested(
        spark,
        [
            (
                1,
                [
                    ("user", "q1"),
                    ("assistant", "a1"),
                    ("user", "q2"),
                    ("user", "q2 again"),   # user->user: no pair for q2
                    ("assistant", "a2"),    # pairs with 'q2 again'
                    ("user", "dangling"),   # trailing user: no pair
                ],
            ),
        ],
    )
    out = sorted(
        (r["turn_idx"], r["instruction"], r["response"])
        for r in C.instruction_response_pairs(
            C.conversation_turns(conv)
        ).collect()
    )
    assert out == [(0, "q1", "a1"), (3, "q2 again", "a2")]


def test_pair_ngram_contamination_flags_overlap(spark):
    prompt = "what is the capital of france and why is it paris"
    conv = _nested(
        spark,
        [
            # instruction embeds an 8-gram of the prompt -> contaminated
            (1, [("user", "please tell me what is the capital of france and"
                          " why x"),
                 ("assistant", "paris")]),
            # clean pair
            (2, [("user", "summarize the history of rome in two sentences"
                          " please thanks"),
                 ("assistant", "ok")]),
            # instruction shorter than n tokens -> no grams, clean
            (3, [("user", "short one"), ("assistant", "yes")]),
        ],
    )
    prompts = spark.createDataFrame(
        [(100, prompt)], "eval_id long, prompt string"
    )
    out = {
        r["conv_id"]: r
        for r in C.pair_ngram_contamination(
            C.instruction_response_pairs(C.conversation_turns(conv)),
            prompts,
            n=8,
        ).collect()
    }
    assert out[1]["contaminated"] and out[1]["n_eval_hits"] == 1
    assert not out[2]["contaminated"] and out[2]["n_eval_hits"] == 0
    assert not out[3]["contaminated"]
    assert len(out) == 3  # zero-hit pairs included


def test_pair_ngram_contamination_response_side(spark):
    """side='response' scans the ANSWER text: a memorized benchmark
    answer in an assistant turn is flagged even when the instruction is
    paraphrased past the instruction-side scan (VERDICT r08 #5)."""
    answer = "the capital of france is paris because of the seine river"
    conv = _nested(
        spark,
        [
            # paraphrased question, verbatim answer -> response-side hit
            (1, [("user", "name the french capital city please and also"
                          " explain"),
                 ("assistant", "well the capital of france is paris"
                               " because of the seine river history")]),
            # clean response
            (2, [("user", "summarize the history of rome in two sentences"
                          " please thanks"),
                 ("assistant", "rome was founded long ago and it grew"
                               " into an empire")]),
        ],
    )
    answers = spark.createDataFrame(
        [(100, answer)], "eval_id long, answer string"
    )
    pairs = C.instruction_response_pairs(C.conversation_turns(conv))
    resp = {
        r["conv_id"]: r
        for r in C.pair_ngram_contamination(
            pairs, answers, prompt_col="answer", n=8, side="response"
        ).collect()
    }
    assert resp[1]["contaminated"] and resp[1]["n_eval_hits"] == 1
    assert not resp[2]["contaminated"]
    # the instruction-side scan misses the same leak (paraphrased question)
    instr = {
        r["conv_id"]: r["contaminated"]
        for r in C.pair_ngram_contamination(
            pairs, answers, prompt_col="answer", n=8, side="instruction"
        ).collect()
    }
    assert not instr[1] and not instr[2]


def test_pair_ngram_contamination_rejects_bad_side():
    import pytest as _pytest

    with _pytest.raises(ValueError, match="side"):
        C.pair_ngram_contamination(None, None, side="both")
