"""Property-based test (SURVEY §5.4): for ANY interleaving of upserts split
into ANY batching, the final changelog state equals
``latest(left) ⋈ latest(right)`` — the algebraic invariant the reference
maintains by construction.

Each left key has a stable FK (the reference never retracts a left's old FK
association when it changes — we inherit that gap deliberately, see
streaming/incremental.py docstring — so FK churn is out of scope here).
"""

from __future__ import annotations

import json
import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from kafka_denormalization_spark.streaming.incremental import IncrementalDenormalize
from kafka_denormalization_spark.streaming.upsert_join import UPDATE_SCHEMA

LEFT_KEYS = [f"c{i}" for i in range(6)]
FKS = ["f0", "f1", "f2"]


def fk_of(key: str) -> str:
    return FKS[hash(key) % len(FKS)]


update_st = st.one_of(
    st.tuples(st.just("left"), st.sampled_from(LEFT_KEYS), st.integers(0, 99)),
    st.tuples(st.just("right"), st.sampled_from(FKS), st.integers(0, 99)),
)

# a run: up to 24 updates, chopped into up to 5 batches
runs_st = st.lists(update_st, min_size=1, max_size=24)
cuts_st = st.lists(st.integers(1, 23), max_size=4, unique=True)


def expected_final(updates):
    """Driver-side model: latest per key both sides, inner join on fk."""
    latest_left: dict[str, tuple[int, int]] = {}
    latest_right: dict[str, tuple[int, int]] = {}
    for seq, (side, key, val) in enumerate(updates):
        if side == "left":
            latest_left[key] = (seq, val)
        else:
            latest_right[key] = (seq, val)
    out = {}
    for k, (_, v) in latest_left.items():
        fk = fk_of(k)
        if fk in latest_right:
            out[k] = (v, latest_right[fk][1])
    return out


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(updates=runs_st, cuts=cuts_st)
def test_incremental_converges_to_latest_join(spark, updates, cuts):
    rows = []
    for seq, (side, key, val) in enumerate(updates):
        fk = fk_of(key) if side == "left" else key
        rows.append((seq, side, key, fk, json.dumps({"v": val})))

    bounds = sorted({c for c in cuts if c < len(rows)}) + [len(rows)]
    batches, start = [], 0
    for b in bounds:
        if b > start:
            batches.append(rows[start:b])
            start = b

    state_dir = tempfile.mkdtemp(prefix="prop_state_")
    eng = IncrementalDenormalize(spark, state_dir, how="inner")
    last_emit: dict[str, tuple[int, int]] = {}
    for batch in batches:
        df = spark.createDataFrame(batch, UPDATE_SCHEMA)
        lu = df.filter(F.col("side") == "left").select(
            "key", "fk", "payload", F.col("seq").alias("version")
        )
        ru = df.filter(F.col("side") == "right").select(
            "key", "fk", "payload", F.col("seq").alias("version")
        )
        for r in eng.process_batch(lu, ru).collect():
            last_emit[r["key"]] = (
                json.loads(r["left_value"])["v"],
                json.loads(r["right_value"])["v"],
            )

    assert last_emit == expected_final(updates)


import random as _random


def _brute_range_pairs(lefts, rights, lower, upper):
    out = set()
    for (lk, lts, lid) in lefts:
        for (rk, rts, rid) in rights:
            if lk == rk and lts + lower <= rts <= lts + upper:
                out.add((lid, rid))
    return out


def test_range_join_randomized_vs_bruteforce(spark):
    """Randomized cross-check: bucketized range join == O(n^2) reference
    model across window shapes (positive, negative, zero-width)."""
    from kafka_denormalization_spark.operators.range_join import range_join

    rng = _random.Random(42)
    for lower, upper in [(0, 7), (-5, 5), (3, 3), (-9, -2)]:
        lefts = [(rng.choice("ab"), rng.randrange(0, 40), i) for i in range(25)]
        rights = [(rng.choice("ab"), rng.randrange(0, 40), 100 + i) for i in range(25)]
        ldf = spark.createDataFrame(lefts, "k string, ts long, lid int")
        rdf = spark.createDataFrame(rights, "k string, rts long, rid int")
        got = {
            (r["lid"], r["rid"])
            for r in range_join(ldf, rdf, on="k", left_ts="ts", right_ts="rts",
                                lower=lower, upper=upper).collect()
        }
        assert got == _brute_range_pairs(lefts, rights, lower, upper), (lower, upper)


def test_asof_join_randomized_vs_bruteforce(spark):
    """Randomized cross-check: union-and-window as-of == per-row max model."""
    from kafka_denormalization_spark.operators.asof import asof_join

    rng = _random.Random(7)
    lefts = [(rng.choice("xy"), rng.randrange(0, 60), i) for i in range(30)]
    rights = [(rng.choice("xy"), rng.randrange(0, 60), 100 + i) for i in range(30)]
    # determinism: the operator breaks right-ts ties arbitrarily; keep one
    # right per (key, ts)
    seen = {}
    for k, ts, rid in rights:
        seen[(k, ts)] = rid
    rights = [(k, ts, rid) for (k, ts), rid in seen.items()]
    ldf = spark.createDataFrame(lefts, "k string, ts long, lid int")
    rdf = spark.createDataFrame(rights, "k string, rts long, rid int")
    got = {
        r["lid"]: r["rid"]
        for r in asof_join(ldf, rdf, on="k", left_ts="ts", right_ts="rts").collect()
    }
    for k, ts, lid in lefts:
        cands = [(rts, rid) for (rk, rts, rid) in rights if rk == k and rts <= ts]
        want = max(cands)[1] if cands else None
        assert got[lid] == want, (lid, k, ts)


def test_chunking_conserves_tokens_randomized(spark):
    """No-overlap chunking must partition every document's token stream:
    per-doc sum(n_tokens) == token count, offsets tile without gaps, and
    packing offsets stay inside the budget."""
    from kafka_denormalization_spark.operators.chunking import (
        chunk_documents,
        pack_chunks,
    )

    rng = _random.Random(7)
    rows = [
        (i, " ".join(f"t{rng.randrange(100)}" for _ in range(rng.randrange(1, 90))))
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    chunks = chunk_documents(df, "id", "text", chunk_tokens=16)
    per_doc = {
        r["id"]: r["s"]
        for r in chunks.groupBy("id").agg(F.sum("n_tokens").alias("s")).collect()
    }
    expected = {i: len(t.split()) for i, t in rows}
    assert per_doc == expected
    packed = pack_chunks(
        chunks.withColumn("src", F.lit("s")), "src", ["id", "chunk_id"], budget=64
    )
    for r in packed.collect():
        assert 0 <= r["pack_offset"] < 64
        assert r["pack_id"] >= 0


def test_fuzzy_join_randomized_vs_bruteforce(spark):
    """Deletion-neighborhood blocking must have PERFECT recall for
    distance <= 1 — cross-checked against the O(n^2) levenshtein scan on
    random strings with random single edits applied."""
    from kafka_denormalization_spark.operators.fuzzy import fuzzy_self_join_dist1

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    rng = _random.Random(13)
    base = ["".join(rng.choice("abcd") for _ in range(rng.randrange(4, 10))) for _ in range(15)]
    mutated = []
    for s in base:
        i = rng.randrange(len(s))
        op = rng.choice(["sub", "ins", "del"])
        if op == "sub":
            mutated.append(s[:i] + rng.choice("abcd") + s[i + 1 :])
        elif op == "ins":
            mutated.append(s[:i] + rng.choice("abcd") + s[i:])
        else:
            mutated.append(s[:i] + s[i + 1 :])
    strings = base + mutated
    rows = list(enumerate(strings))
    df = spark.createDataFrame(rows, "id long, s string")
    got = {
        (r["id_a"], r["id_b"]): r["dist"]
        for r in fuzzy_self_join_dist1(df, "id", "s").collect()
    }
    want = {
        (i, j): lev(a, b)
        for i, a in rows
        for j, b in rows
        if i < j and lev(a, b) <= 1
    }
    assert got == want


# -- transformWithStateInPandas twin: randomized convergence ---------------
# Same invariant as test_incremental_converges_to_latest_join, replayed
# through the REAL transformWithStateInPandas path (executable since the
# vendored miniproto shim, round 5). Emission values per key are monotone
# in (left_seq, right_seq) — state only moves forward and this run has no
# tombstones — so the final state is the per-key max over both seqs, which
# sidesteps the memory sink's lack of cross-batch ordering.


def test_tws_converges_to_latest_join_randomized(spark, tmp_path):
    import os

    from kafka_denormalization_spark.streaming.tws_join import (
        tws_available,
        upsert_join_tws,
    )

    if not tws_available():
        import pytest

        pytest.skip("no protobuf runtime")

    rng = _random.Random(7)
    updates = []
    for _ in range(18):
        if rng.random() < 0.6:
            updates.append(("left", rng.choice(LEFT_KEYS), rng.randrange(100)))
        else:
            updates.append(("right", rng.choice(FKS), rng.randrange(100)))

    rows = []
    for seq, (side, key, val) in enumerate(updates):
        fk = fk_of(key) if side == "left" else key
        rows.append((seq, side, key, fk, json.dumps({"v": val, "s": seq})))
    cuts = sorted(rng.sample(range(1, len(rows)), 3)) + [len(rows)]
    batches, start = [], 0
    for b in cuts:
        if b > start:
            batches.append(rows[start:b])
            start = b

    src = str(tmp_path / "updates")
    for i, batch in enumerate(batches):
        spark.createDataFrame(batch, UPDATE_SCHEMA).coalesce(1).write.mode(
            "append" if i else "overwrite"
        ).parquet(src)

    prev = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider",
    )
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = (
            spark.readStream.schema(UPDATE_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        name = "twsprop"
        q = (
            upsert_join_tws(stream, how="inner")
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .option("checkpointLocation", os.path.join(str(tmp_path), "ckpt"))
            .start()
        )
        q.processAllAvailable()
        q.stop()
        emitted = [r.asDict() for r in spark.sql(f"SELECT * FROM {name}").collect()]
    finally:
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)

    final: dict[str, tuple] = {}
    for r in emitted:
        lv, rv = json.loads(r["left_value"]), json.loads(r["right_value"])
        cur = final.get(r["key"])
        if cur is None or (lv["s"], rv["s"]) >= cur[0]:
            final[r["key"]] = ((lv["s"], rv["s"]), (lv["v"], rv["v"]))
    got = {k: v for k, (_, v) in final.items()}
    assert got == expected_final(updates)


def test_span_dedup_invariants_randomized(spark):
    """For random corpora: (1) every surviving chunk's text is a chunk of
    its original doc at the same boundary; (2) each distinct chunk text
    survives exactly once corpus-wide, at its min (doc_id, chunk_id);
    (3) n_kept + n_dropped == n_chunks; (4) deterministic."""
    import random as rnd

    from kafka_denormalization_spark.operators.chunking import span_dedup

    rnd.seed(11)
    vocab = [f"t{i}" for i in range(12)]   # small vocab -> real collisions
    C = 4
    docs = []
    for i in range(30):
        n = rnd.randrange(1, 20)
        docs.append((i, " ".join(rnd.choice(vocab) for _ in range(n))))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r["doc_id"]: r for r in span_dedup(df, "doc_id", "text", chunk_tokens=C).collect()}
    again = {r["doc_id"]: r for r in span_dedup(df, "doc_id", "text", chunk_tokens=C).collect()}
    assert {k: (v["text_dedup"], v["n_dropped"]) for k, v in out.items()} == {
        k: (v["text_dedup"], v["n_dropped"]) for k, v in again.items()
    }

    # driver-side model
    first_owner: dict[str, tuple[int, int]] = {}
    chunks_of: dict[int, list[str]] = {}
    for i, text in docs:
        toks = text.split()
        cs = [" ".join(toks[j : j + C]) for j in range(0, max(len(toks), 1), C)]
        chunks_of[i] = cs
        for ci, c in enumerate(cs):
            if c not in first_owner or (i, ci) < first_owner[c]:
                first_owner[c] = (i, ci)
    for i, text in docs:
        kept = [
            c for ci, c in enumerate(chunks_of[i]) if first_owner[c] == (i, ci)
        ]
        assert out[i]["text_dedup"] == " ".join(kept)
        assert out[i]["n_chunks"] == len(chunks_of[i])
        assert out[i]["n_dropped"] == len(chunks_of[i]) - len(kept)


def test_containment_pairs_randomized_vs_bruteforce(spark):
    """Prefix filtering loses nothing: the full containment pair set at
    the threshold equals the brute-force computation."""
    import random as rnd

    from kafka_denormalization_spark.functions.similarity import containment_pairs

    rnd.seed(23)
    vocab = [f"w{i}" for i in range(25)]
    docs = []
    for i in range(25):
        n = rnd.randrange(3, 25)
        docs.append((i, " ".join(rnd.choice(vocab) for _ in range(n))))
    # plant guaranteed subset dups
    docs.append((100, docs[0][1] + " zz"))
    docs.append((101, " ".join(docs[1][1].split()[:6])))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    n, t = 3, 0.6
    got = {
        (r["id_a"], r["id_b"]): r["containment"]
        for r in containment_pairs(df, "doc_id", "text", n=n, threshold=t, persist=False).collect()
    }

    def grams(text):
        toks = text.split()
        return {" ".join(toks[j : j + n]) for j in range(len(toks) - n + 1)}

    gs = {i: grams(text) for i, text in docs}
    want = {}
    for a, ga in gs.items():
        if not ga:
            continue
        for b, gb in gs.items():
            if a == b:
                continue
            c = len(ga & gb) / len(ga)
            if c >= t:
                want[(a, b)] = c
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-12


# --- registered-domain extraction: expression path == join path ---------

_label_st = st.text(
    alphabet="abcxyz019-", min_size=1, max_size=6
).filter(lambda s: not s.startswith("-") and not s.endswith("-"))
_host_st = st.lists(_label_st, min_size=1, max_size=5).map(".".join)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(hosts=st.lists(_host_st, min_size=1, max_size=20))
def test_registered_domain_paths_agree(spark, hosts):
    """For ARBITRARY hosts (random labels, including ones that collide
    with suffix rules, bare suffixes, and no-match shapes), the InSet
    expression path and the broadcast-join path return the same
    registered domain. Suffix set extended with single-label rules that
    the random labels can actually hit ('com' etc. are in the default
    set; 'a'/'x' widen the collision surface)."""
    from pyspark.sql import functions as F

    from kafka_denormalization_spark.functions import domains as D

    suffixes = D.PUBLIC_SUFFIXES_MIN + ("a", "x", "x.a", "b.x")
    df = spark.createDataFrame([(h,) for h in hosts], "host string")
    expr_out = [
        r["d"]
        for r in df.select(
            D.registered_domain(F.col("host"), suffixes).alias("d")
        ).collect()
    ]
    sfx = spark.createDataFrame([(s,) for s in suffixes], "suffix string")
    join_rows = D.registered_domain_join(df, "host", sfx).collect()
    join_out = [r["domain"] for r in join_rows]
    # order: registered_domain_join preserves input row order per its
    # left join on the row id, but be safe and compare as multisets
    # alongside the per-host mapping
    assert sorted(map(str, expr_out)) == sorted(map(str, join_out))
    per_host_expr = {
        r["host"]: r["d"]
        for r in df.select(
            "host", D.registered_domain(F.col("host"), suffixes).alias("d")
        ).collect()
    }
    for r in join_rows:
        assert r["domain"] == per_host_expr[r["host"]], r["host"]


_url_path_st = st.text(alphabet="abcp019/", min_size=0, max_size=10)
_url_q_st = st.lists(
    st.tuples(
        st.sampled_from(["a", "b", "utm_source", "utm_x", "fbclid", "gclid", "ref"]),
        st.text(alphabet="xyz01", min_size=1, max_size=3),
    ),
    max_size=4,
).map(lambda kvs: "&".join(f"{k}={v}" for k, v in kvs))
_url_st = st.builds(
    lambda host, port, path, q, frag: (
        f"https://{host}{port}/{path}"
        + (f"?{q}" if q else "")
        + (f"#{frag}" if frag else "")
    ),
    host=_host_st,
    port=st.sampled_from(["", ":80", ":8443"]),
    path=_url_path_st,
    q=_url_q_st,
    frag=st.text(alphabet="fg1", max_size=3),
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(urls=st.lists(_url_st, min_size=1, max_size=16))
def test_normalize_url_idempotent(spark, urls):
    """normalize(normalize(u)) == normalize(u): the canonical form is a
    fixed point for arbitrary generated URLs (tracking params in any
    position, ports, fragments, trailing slashes, repeated separators) —
    the invariant URL-level dedup state depends on across re-ingests of
    already-normalized urls."""
    from pyspark.sql import functions as F

    from kafka_denormalization_spark.functions import domains as D

    df = spark.createDataFrame([(u,) for u in urls], "url string")
    once = df.select(D.normalize_url("url").alias("url"))
    twice = once.select(D.normalize_url("url").alias("url"))
    assert sorted(r["url"] for r in once.collect()) == sorted(
        r["url"] for r in twice.collect()
    )


def test_line_dedup_randomized_vs_model(spark):
    """For random line corpora: the rebuilt text equals the python model
    (remove EVERY occurrence of any line appearing in >= min_docs
    DISTINCT docs, preserve order of the rest), counts reconcile, every
    input doc has exactly one output row, and the operator is
    deterministic."""
    import random as rnd

    from kafka_denormalization_spark.functions.text import line_dedup

    rnd.seed(23)
    vocab = [f"line {i} text" for i in range(9)]  # tiny pool -> collisions
    MIN_DOCS = 3
    docs = []
    for i in range(40):
        n = rnd.randrange(1, 8)
        docs.append((i, [rnd.choice(vocab) for _ in range(n)]))
    df = spark.createDataFrame(docs, "doc_id long, lines array<string>")
    out = {
        r["doc_id"]: r
        for r in line_dedup(df, "doc_id", "lines", min_docs=MIN_DOCS).collect()
    }
    again = {
        r["doc_id"]: r
        for r in line_dedup(df, "doc_id", "lines", min_docs=MIN_DOCS).collect()
    }
    assert {k: v["text_clean"] for k, v in out.items()} == {
        k: v["text_clean"] for k, v in again.items()
    }

    # driver-side model
    doc_count: dict[str, set[int]] = {}
    for i, lines in docs:
        for ln in lines:
            doc_count.setdefault(ln, set()).add(i)
    heavy = {ln for ln, ids in doc_count.items() if len(ids) >= MIN_DOCS}
    assert heavy, "fixture must actually produce boilerplate"
    assert set(out) == {i for i, _ in docs}
    for i, lines in docs:
        kept = [ln for ln in lines if ln not in heavy]
        assert out[i]["text_clean"] == "\n".join(kept)
        assert out[i]["n_lines_kept"] == len(kept)
        assert out[i]["n_lines_removed"] == len(lines) - len(kept)


def test_unimax_plan_invariants_randomized(spark):
    """Waterfilling invariants against a reference sequential
    implementation of the UniMax loop (Chung et al. 2023), over random
    stratum-size profiles: per-stratum cap respected, budget never
    exceeded, budget exhausted unless every stratum is cap-bound, all
    budget-bound strata share one fair allocation, and the closed form
    matches the loop exactly."""
    import math

    from kafka_denormalization_spark.operators.sampling import unimax_plan

    rng = _random.Random(80811)
    for trial in range(6):
        n_strata = rng.randint(1, 8)
        sizes = {f"s{i:02d}": rng.randint(1, 1000) for i in range(n_strata)}
        cap = rng.randint(1, 4)
        frac = rng.uniform(0.05, float(cap))
        df = spark.createDataFrame(
            [(k, v) for k, v in sizes.items()], "lang string, n_chars long"
        )
        got = {
            r["lang"]: r
            for r in unimax_plan(df, "lang", "n_chars", frac, cap).collect()
        }
        # reference: the paper's sequential loop, smallest-first
        total = sum(sizes.values())
        budget = math.floor(frac * total)
        order = sorted(sizes, key=lambda k: (sizes[k], k))
        remaining, ref = budget, {}
        for j, k in enumerate(order):
            left = len(order) - j
            fair = remaining / left
            alloc = min(cap * sizes[k], fair)
            ref[k] = alloc
            remaining -= alloc
        for k in sizes:
            assert abs(got[k]["alloc_weight_r"] - round(ref[k], 9)) < 1e-6, (
                trial, k, got[k], ref[k])
            assert got[k]["alloc_weight_r"] <= cap * sizes[k] + 1e-9
        spent = sum(got[k]["alloc_weight_r"] for k in sizes)
        all_capped = all(got[k]["capped"] for k in sizes)
        if all_capped:
            assert abs(spent - cap * total) < 1e-6 or spent <= budget + 1e-6
        else:
            assert abs(spent - budget) < 1e-4  # budget exhausted
            uncapped = sorted(
                got[k]["alloc_weight_r"] for k in sizes if not got[k]["capped"]
            )
            assert uncapped[-1] - uncapped[0] < 1e-6  # one fair share
