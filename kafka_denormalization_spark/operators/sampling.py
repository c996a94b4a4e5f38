"""Deterministic (hash-based) sampling — training-mix construction for
LLM-data pipelines (north-star extension; SURVEY §2.3 — the reference has
no sampling surface at all).

Why not ``df.sample()``: Bernoulli sampling is seeded per-partition, so the
kept set changes whenever partitioning changes (file splits, AQE, cluster
size) and cannot be reproduced across engines. Hashing a stable KEY makes
the decision a pure function of the row — re-runs, backfills, and the
DuckDB oracle all agree row-for-row, and a document keeps/loses membership
consistently across every pipeline stage that re-derives the mix.

Mechanism: md5 over (salt | key) is uniform; keeping rows whose first 8 hex
chars compare below ``hex(fraction * 16^8)`` keeps ~fraction of rows. The
string comparison is equivalent to the numeric one (fixed-width lowercase
hex) and works identically in any engine with md5 — no engine-specific
hash needed (cf. join_key_digest's md5-vs-xxhash64 split).

Scale notes (100 TB): pure narrow expression — no shuffle, fully pipelined
with the scan, pushdown-friendly (the filter sits directly on scan output).
Changing ``salt`` draws an independent sample; stratified rates are a CASE
over the strata column, still one pass.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from ..checkpoint import persist_if_uncached

from kafka_denormalization_spark.operators.window import global_ordered_window

_HEX_WIDTH = 8  # compare 32 bits of the digest: granularity 1/2^32


def fraction_threshold(fraction: float) -> str:
    """Fixed-width lowercase-hex threshold for a keep-fraction in [0, 1]."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return format(min(int(fraction * 16**_HEX_WIDTH), 16**_HEX_WIDTH - 1), f"0{_HEX_WIDTH}x")


def sample_hash(key: Column, salt: str) -> Column:
    """The stable per-row draw: first 8 hex chars of md5(salt | key)."""
    return F.substring(F.md5(F.concat_ws("|", F.lit(salt), key.cast("string"))), 1, _HEX_WIDTH)


def hash_sample(
    df: DataFrame, key_col: str, fraction: float, salt: str = "sample"
) -> DataFrame:
    """Keep ~``fraction`` of rows, decided by hash(key) — deterministic
    across partitionings, engines, and re-runs."""
    if fraction >= 1.0:
        return df
    return df.filter(sample_hash(F.col(key_col), salt) < F.lit(fraction_threshold(fraction)))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: Mapping[str, float],
    key_col: str,
    default_fraction: float = 0.0,
    salt: str = "sample",
) -> DataFrame:
    """Per-stratum deterministic sampling — the training-mix primitive
    ("webtext at 30%, books at 90%, ..."). One narrow pass; strata absent
    from ``fractions`` fall back to ``default_fraction``."""
    thr: Column = F.lit(fraction_threshold(default_fraction))
    for stratum, frac in fractions.items():
        thr = F.when(
            F.col(strata_col) == stratum, F.lit(fraction_threshold(frac))
        ).otherwise(thr)
    return df.filter(sample_hash(F.col(key_col), salt) < thr)


def temperature_fractions(
    df: DataFrame,
    strata_col: str,
    weight_col: str,
    budget: float | None = None,
    alpha: float = 0.5,
    budget_frac: float | None = None,
) -> DataFrame:
    """Temperature-rebalanced mixture fractions (mT5 / CC multilingual
    sampling, arXiv:1910.10683 §3.4.3-style): a stratum with weight share
    ``q_l`` is sampled toward share ``q_l^alpha / sum_m q_m^alpha`` —
    ``alpha < 1`` up-weights low-resource strata. Returns one row per
    stratum: (stratum, keep fraction, fixed-width hex draw threshold).

    The keep fraction is ``least(1, budget * p_l / w_l)`` with ``w_l`` the
    stratum's total weight. It is rounded to 6 decimals BEFORE the hex
    threshold is derived: the upstream doubles (sqrt + aggregate sums) can
    differ across engines in the last ulp, and rounding collapses both to
    the same grid point, so the DuckDB oracle lands on bit-identical
    thresholds. One aggregation over ~|strata| rows, then a 1-row global
    aggregate of the per-stratum totals broadcast back via cross-join —
    no unpartitioned window anywhere, so plans stay free of
    ``WindowExec: No Partition Defined`` warnings even on the tiny side.
    """
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    if (budget is None) == (budget_frac is None):
        raise ValueError("pass exactly one of budget / budget_frac")
    w = df.groupBy(strata_col).agg(
        F.sum(F.col(weight_col)).cast("double").alias("_w")
    )
    # alpha=0.5 routes through sqrt (IEEE-exact, engine-portable); other
    # alphas use pow, which is correctly rounded on both JVMs/DuckDB libms
    # for the magnitudes here — the round-to-6 grid absorbs any ulp skew.
    powed = F.sqrt(F.col("_w")) if alpha == 0.5 else F.pow(F.col("_w"), F.lit(alpha))
    w = w.withColumn("_pw", powed)
    totals = w.agg(
        F.sum("_pw").alias("_tpw"), F.sum("_w").alias("_tw")
    )
    # 1-row broadcast cross join (a constant-key equi-join constant-folds
    # back to exactly this plan): one comparison-free probe per stratum
    # row. Allow-listed in the repo-wide BNLJ sweep alongside the other
    # 1-row scalar-aggregate cross joins (tests/test_plans.py).
    w = w.crossJoin(F.broadcast(totals)).withColumn(
        "_p", F.col("_pw") / F.col("_tpw")
    )
    b = (
        F.lit(float(budget))
        if budget is not None
        else F.lit(float(budget_frac)) * F.col("_tw")
    )
    frac = F.round(F.least(F.lit(1.0), b * F.col("_p") / F.col("_w")), 6)
    thr = F.format_string(
        f"%0{_HEX_WIDTH}x",
        F.least(
            (frac * F.lit(float(16**_HEX_WIDTH))).cast("long"),
            F.lit(16**_HEX_WIDTH - 1),
        ),
    )
    return w.select(
        F.col(strata_col), frac.alias("keep_frac"), thr.alias("_thr")
    )


def temperature_sample(
    df: DataFrame,
    strata_col: str,
    weight_col: str,
    key_col: str,
    budget: float | None = None,
    alpha: float = 0.5,
    salt: str = "temp",
    budget_frac: float | None = None,
) -> DataFrame:
    """Deterministic temperature sampling: rebalance strata toward the
    ``alpha``-tempered distribution under a total ``weight_col`` budget
    (absolute, or relative via ``budget_frac``). Two tiny aggregations +
    a broadcast join of |strata| rows against the corpus — the per-row
    keep decision stays a pure hash function, so re-runs, backfills, and
    the oracle agree row-for-row."""
    fr = temperature_fractions(
        df, strata_col, weight_col, budget, alpha, budget_frac=budget_frac
    )
    return (
        df.join(F.broadcast(fr), [strata_col])
        .filter(sample_hash(F.col(key_col), salt) < F.col("_thr"))
        .drop("keep_frac", "_thr")
    )


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    key_col: str,
    fraction: float,
    salt: str = "wsample",
) -> DataFrame:
    """Weight-scaled deterministic sampling: each row is kept with
    probability ``weight * fraction`` (clamped to [0, 1]) — the per-ROW
    generalization of ``hash_sample``'s single global fraction. The
    designed consumer is soft dedup (``dedup_weights``): with weight
    1/cluster-size, every near-dup FAMILY is sampled at the target rate
    in expectation instead of each copy independently, so duplicated
    content stops being over-represented in the drawn corpus without
    hard-dropping any document.

    Determinism: the effective fraction rounds to the 6-decimal grid
    before the 32-bit hex threshold is derived (the
    ``temperature_fractions`` convention — one double multiply on
    identically-rounded inputs, then integer/format ops), and the draw
    is the same md5 hash — re-runs, backfills, and the oracle agree
    row-for-row.

    Scale (100 TB): fully narrow — a per-row expression chain fused into
    the scan; no shuffle, no Python, no aggregation.
    """
    eff = F.round(
        F.least(
            F.lit(1.0),
            F.greatest(
                F.lit(0.0),
                F.col(weight_col).cast("double") * F.lit(float(fraction)),
            ),
        ),
        6,
    )
    thr = F.format_string(
        f"%0{_HEX_WIDTH}x",
        F.least(
            (eff * F.lit(float(16**_HEX_WIDTH))).cast("long"),
            F.lit(16**_HEX_WIDTH - 1),
        ),
    )
    return df.filter(sample_hash(F.col(key_col), salt) < thr)


def epoch_mixture_plan(
    df: DataFrame,
    strata_col: str,
    weight_col: str,
    target_shares: Mapping[str, float],
    budget_frac: float,
    max_epochs: float = 4.0,
) -> DataFrame:
    """Epoch-aware mixture plan (UniMax-style, Chung et al. 2023): given
    TARGET mixture shares and a total budget of ``budget_frac`` x the
    corpus weight, a stratum whose share of the budget exceeds its corpus
    weight REPEATS (multiple epochs) instead of being silently
    under-served — capped at ``max_epochs`` to bound memorization.

    Per stratum: effective epochs E = min(budget * share / w, max_epochs);
    emit (stratum, full_epochs = floor(E), tail fraction = E - floor(E)
    rounded to the 6-decimal grid, and its fixed-width hex draw
    threshold). One aggregation over |strata| rows + a 1-row corpus total
    broadcast back; every float step is a single correctly-rounded op on
    exact integers, so both engines land on identical plans.
    """
    if budget_frac <= 0:
        raise ValueError(f"budget_frac must be > 0, got {budget_frac}")
    w = df.groupBy(strata_col).agg(
        F.sum(F.col(weight_col)).cast("double").alias("_w")
    )
    totals = w.agg(F.sum("_w").alias("_tw"))
    share: Column = F.lit(0.0)
    for stratum, s in target_shares.items():
        share = F.when(F.col(strata_col) == stratum, F.lit(float(s))).otherwise(share)
    # round the effective-epoch count to the 6-decimal grid BEFORE floor:
    # an unrounded eff sitting 1 ulp either side of an integer would flip
    # full_epochs (and swing the tail fraction by ~1) between engines
    eff = F.round(
        F.least(
            F.lit(float(budget_frac)) * F.col("_tw") * share / F.col("_w"),
            F.lit(float(max_epochs)),
        ),
        6,
    )
    full = F.floor(eff).cast("long")
    tail = F.round(eff - F.floor(eff), 6)
    thr = F.format_string(
        f"%0{_HEX_WIDTH}x",
        F.least(
            (tail * F.lit(float(16**_HEX_WIDTH))).cast("long"),
            F.lit(16**_HEX_WIDTH - 1),
        ),
    )
    return (
        w.crossJoin(F.broadcast(totals))
        .select(
            F.col(strata_col),
            full.alias("full_epochs"),
            tail.alias("tail_frac"),
            thr.alias("_thr"),
        )
    )


def epoch_mixture_sample(
    df: DataFrame,
    strata_col: str,
    weight_col: str,
    key_col: str,
    target_shares: Mapping[str, float],
    budget_frac: float,
    max_epochs: float = 4.0,
    salt: str = "epoch",
) -> DataFrame:
    """Materialize the epoch-aware mixture: every row of a stratum appears
    ``full_epochs`` times (epoch = 0..full_epochs-1) plus once more in the
    tail epoch when its deterministic hash draw falls under the tail
    fraction. The per-row draw is salted with the tail epoch index, so
    re-runs, backfills, and the oracle agree row-for-row; rows never
    shuffle — the plan is broadcast-join + generator + filter, fully
    pipelined with the scan.

    Output: input columns + ``epoch`` (long).
    """
    plan = epoch_mixture_plan(
        df, strata_col, weight_col, target_shares, budget_frac, max_epochs
    )
    joined = df.join(F.broadcast(plan), [strata_col])
    epoch = F.explode(
        F.sequence(F.lit(0).cast("long"), F.col("full_epochs"))
    ).alias("epoch")
    out = joined.select("*", epoch)
    tail_draw = sample_hash(
        F.concat_ws(
            "#",
            F.col(key_col).cast("string"),
            F.col("full_epochs").cast("string"),
        ),
        salt,
    )
    return (
        out.filter(
            (F.col("epoch") < F.col("full_epochs"))
            | ((F.col("epoch") == F.col("full_epochs")) & (tail_draw < F.col("_thr")))
        )
        .drop("full_epochs", "tail_frac", "_thr")
    )


# ---------------------------------------------------------------------------
# DSIR — data selection via importance resampling (Xie et al., NeurIPS 2023).
# Select raw-corpus documents whose hashed-n-gram profile looks like a small
# target domain: per-doc importance weight = log p_target(features) -
# log p_raw(features) under bucketed unigram+bigram models, then Gumbel
# top-k resampling. The standard "make 100 TB of web text look like the
# target corpus" primitive.
# ---------------------------------------------------------------------------

_DSIR_U32 = 4294967296.0  # 2^32: md5-prefix draws map to (0,1) as (v+0.5)/2^32


def _dsir_gram_rows(
    docs: DataFrame, id_col: str, text_col: str, flag: Column
) -> DataFrame:
    """(_id, _tgt, _g) rows: whitespace unigrams AND bigrams from ONE
    posexplode pass (bigram via window ``lead`` over token position — the
    word_gram_rows trick, shared exchange, rather than a second scan for
    each gram order). Duplicates kept: DSIR weights are count-weighted.

    The doc-id exchange sits BELOW the explode (r13 — the r12
    word_gram_rows rewrite, guide §2.3/§2.4): the lead window needs
    hashpartitioning(_id) either way, so repartitioning the DOC rows
    first shuffles whole documents instead of exploded (pos, token)
    rows, runs the explode + per-gram md5 bucketing at full parallelism
    instead of the scan's task count (one task on monolithic inputs),
    and the downstream (_id, _b) count aggregation reuses the
    partitioning (subset rule). Exchange count unchanged; partition
    count follows session conf. Streaming frames pass through."""
    base = docs.select(
        F.col(id_col).alias("_id"),
        flag.cast("int").alias("_tgt"),
        F.col(text_col).alias("_dsir_txt"),
    )
    if not base.isStreaming:
        from kafka_denormalization_spark.engine import target_partitions

        base = base.repartition(target_partitions(docs.sparkSession), "_id")
    toks = base.select(
        "_id",
        "_tgt",
        F.posexplode(F.split(F.trim(F.col("_dsir_txt")), r"\s+")).alias("_pos", "_t"),
    )
    w = Window.partitionBy("_id").orderBy("_pos")
    # window expressions can't live inside a Generate — project the lead
    # first, then explode the (unigram, optional-bigram) pair
    with_next = toks.select(
        "_id", "_tgt", "_t", F.lead("_t", 1).over(w).alias("_nxt")
    )
    grams = F.array_compact(
        F.array(
            F.col("_t"),
            F.when(
                F.col("_nxt").isNotNull(),
                F.concat_ws(" ", F.col("_t"), F.col("_nxt")),
            ),
        )
    )
    # whitespace-split of an empty doc yields [''] — drop that empty
    # gram so token-less docs contribute no features (and land on the
    # caller's 0.0 fallback instead of scoring the ''-bucket)
    return (
        with_next.select("_id", "_tgt", F.explode(grams).alias("_g"))
        .filter(F.col("_g") != "")
    )


def dsir_log_weights(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    target_pred: Column,
    num_buckets: int = 64,
    salt: str = "dsir",
    persist: bool = True,
) -> DataFrame:
    """Per-document DSIR log importance weight
    ``logw(d) = Σ_b count_d(b) · (ln p̂_tgt(b) − ln p̂_raw(b))`` over
    ``num_buckets`` hashed unigram+bigram feature buckets, with Laplace
    0.5 smoothing. ``target_pred`` marks the in-domain rows (evaluated on
    ``docs`` columns); the raw model is the whole input.

    Deterministic cross-engine arithmetic: the per-bucket log-ratio is
    rounded to the repo's 9-decimal grid (absorbs ln() ulp skew), the
    per-doc sum is a sequential fold over contributions ordered by bucket
    id (IEEE order-identical to the DuckDB ``list(c ORDER BY b)`` +
    ``list_reduce`` oracle), and everything upstream is exact integer
    counting.

    Plan shape (100 TB): ONE corpus pass — posexplode + per-doc window
    (the only big exchange, hash(id)); the (id, bucket) count groupBy and
    the final per-doc fold both reuse that partitioning (subset rule), so
    tokens shuffle once as md5-bucketed gram rows and never again. The
    (id, bucket) count frame has TWO consumers (the bucket model and the
    per-doc contributions) and Spark will not collapse the shared subtree
    (pruning de-canonicalizes it, cf. bm25_batch), so ``persist=True``
    caches it MEMORY_AND_DISK — it is the corpus reduced to ≤
    ``num_buckets`` small rows per doc, and the broadcast (model) side
    materializes first, so the probe side reads the cache. Pass
    ``persist=False`` to trade the cache for a second gram pass. The
    bucket model is a ``num_buckets``-row aggregate joined back broadcast;
    bucket counts are skew-free by construction (md5 is uniform). No
    wide pivot: weights fold from (bucket, contrib) lists, so
    ``num_buckets`` can be the paper's 10k without a 10k-column row.

    Output: (id_col, logw_r) — one row per input doc; docs with no
    tokens weigh 0.0.
    """
    feats = _dsir_gram_rows(docs, id_col, text_col, target_pred)
    bucket = F.pmod(
        F.conv(
            F.substring(F.md5(F.concat_ws("|", F.lit(salt), F.col("_g"))), 1, 8),
            16,
            10,
        ).cast("long"),
        F.lit(num_buckets),
    )
    counts = (
        feats.select("_id", "_tgt", bucket.alias("_b"))
        .groupBy("_id", "_b")
        .agg(F.count(F.lit(1)).alias("_c"), F.max("_tgt").alias("_t"))
    )
    if persist:

        counts = persist_if_uncached(counts)
    bucket_stats = counts.groupBy("_b").agg(
        F.sum("_c").alias("_raw"),
        F.sum(F.col("_c") * F.col("_t")).alias("_tgt_c"),
    )
    totals = bucket_stats.agg(
        F.sum("_raw").alias("_raw_tot"), F.sum("_tgt_c").alias("_tgt_tot")
    )
    half_b = F.lit(0.5 * num_buckets)
    ratio = F.round(
        F.log(
            (F.col("_tgt_c").cast("double") + F.lit(0.5))
            / (F.col("_tgt_tot").cast("double") + half_b)
        )
        - F.log(
            (F.col("_raw").cast("double") + F.lit(0.5))
            / (F.col("_raw_tot").cast("double") + half_b)
        ),
        9,
    )
    ratios = (
        bucket_stats.crossJoin(F.broadcast(totals))
        .select("_b", ratio.alias("_r"))
    )
    contribs = counts.join(F.broadcast(ratios), "_b").select(
        "_id", "_b", (F.col("_c").cast("double") * F.col("_r")).alias("_cr")
    )
    folded = contribs.groupBy("_id").agg(
        F.round(
            F.aggregate(
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct(F.col("_b").alias("b"), F.col("_cr").alias("c")))
                    ),
                    lambda s: s.getField("c"),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            9,
        ).alias("logw_r")
    )
    return (
        docs.select(F.col(id_col))
        .join(folded.withColumnRenamed("_id", id_col), id_col, "left")
        .select(id_col, F.coalesce(F.col("logw_r"), F.lit(0.0)).alias("logw_r"))
    )


def dsir_resample(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    target_pred: Column,
    k: int,
    num_buckets: int = 64,
    salt: str = "dsir",
) -> DataFrame:
    """DSIR selection proper: Gumbel-top-k over the log weights —
    equivalent to sampling k docs WITHOUT replacement proportionally to
    exp(logw) (Gumbel-max trick), but fully deterministic: the Gumbel
    noise ``g = −ln(−ln(u))`` draws u from the stable md5 hash of the doc
    id (``(v32 + 0.5)/2^32`` — never exactly 0 or 1). One global
    ORDER BY/LIMIT k (TakeOrdered: per-partition heaps + k-row merge),
    score rounded to the 9-decimal grid before ranking, id ascending as
    the tiebreak.

    Output: (id_col, score_r) — the k selected docs.
    """
    weights = dsir_log_weights(
        docs, id_col, text_col, target_pred, num_buckets, salt
    )
    v32 = F.conv(
        F.substring(
            F.md5(F.concat_ws("|", F.lit(salt + "-gumbel"), F.col(id_col).cast("string"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    u = (v32.cast("double") + F.lit(0.5)) / F.lit(_DSIR_U32)
    gumbel = -F.log(-F.log(u))
    return (
        weights.select(
            F.col(id_col),
            F.round(F.col("logw_r") + gumbel, 9).alias("score_r"),
        )
        .orderBy(F.col("score_r").desc(), F.col(id_col))
        .limit(k)
    )


def unimax_plan(
    df: DataFrame,
    strata_col: str,
    weight_col: str,
    budget_frac: float,
    max_epochs: int = 4,
) -> DataFrame:
    """UniMax budget allocation (Chung et al. 2023, arXiv:2304.09151):
    distribute a total training budget over strata (languages) as
    uniformly as possible subject to a per-stratum repetition cap —
    each stratum gets ``min(max_epochs * size, fair share)``, where the
    fair share is recomputed over the strata the cap has not yet
    exhausted, walking strata smallest-first.

    Closed form instead of the paper's sequential loop: with strata
    sorted ascending by size, stratum i is cap-bound iff
    ``max_epochs * s_i * (L - i + 1) <= B - P_{i-1}`` (P = running sum
    of capped allocations) — once one stratum goes budget-bound every
    larger one is too (sizes ascend, the fair share is constant from
    there), so the first budget-bound index k* splits the plan:
    ``alloc_i = max_epochs * s_i`` for i < k*, else
    ``(B - P_{k*-1}) / (L - k* + 1)``. The bound test multiplies
    EXACT integers (no float in the branch decision); only the final
    fair-share division and the epochs ratio are doubles, rounded to
    the 9-decimal grid.

    Output per stratum: (strata_col, size_weight, capped,
    alloc_weight_r, epochs_r), epochs_r = alloc / size.

    Plan shape (100 TB): one aggregation to |strata| rows, then window
    arithmetic on that tiny frame — the window is deliberately
    unpartitioned because the frame is strata-metadata-sized (languages:
    dozens), the shard_plan_bytes precedent. The 1-row (k*, P_{k*-1},
    B, L) summary broadcasts back via a scalar-aggregate cross join
    (the repo's allow-listed 1-row BNLJ shape). Nothing row-scale ever
    reaches the driver.
    """
    if not 0.0 < budget_frac <= float(max_epochs):
        raise ValueError(f"budget_frac must be in (0, {max_epochs}], got {budget_frac}")
    if max_epochs < 1:
        raise ValueError(f"max_epochs must be >= 1, got {max_epochs}")
    sizes = df.groupBy(strata_col).agg(
        F.sum(F.col(weight_col)).cast("long").alias("_s")
    )
    # metadata-sized frame (one row per stratum) — see
    # window.global_ordered_window for why the single task is pinned
    w = global_ordered_window(F.col("_s"), "_s", strata_col)
    wp = w.rowsBetween(Window.unboundedPreceding, -1)
    wall = global_ordered_window(F.col("_s"), "_s", strata_col).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cap = F.lit(int(max_epochs)) * F.col("_s")
    annotated = sizes.select(
        F.col(strata_col),
        F.col("_s"),
        cap.alias("_cap"),
        F.row_number().over(w).alias("_i"),
        F.count(F.lit(1)).over(wall).alias("_l"),
        F.coalesce(F.sum(cap).over(wp), F.lit(0)).cast("long").alias("_p"),
        F.floor(
            F.lit(float(budget_frac)) * F.sum("_s").over(wall).cast("double")
        ).cast("long").alias("_b"),
    ).withColumn(
        # exact-integer bound test: cap * remaining_strata <= remaining budget
        "_capped",
        F.col("_cap") * (F.col("_l") - F.col("_i") + 1)
        <= (F.col("_b") - F.col("_p")),
    )
    kstar = annotated.agg(
        F.min(F.when(~F.col("_capped"), F.col("_i"))).alias("_k")
    )
    # P_{k*-1} and the constant fair share live on the k* row itself
    fair = annotated.join(F.broadcast(kstar), F.col("_i") == F.col("_k")).select(
        F.col("_k").alias("_k2"),
        F.round(
            (F.col("_b") - F.col("_p")).cast("double")
            / (F.col("_l") - F.col("_k") + 1).cast("double"),
            9,
        ).alias("_fair"),
    )
    out = annotated.crossJoin(F.broadcast(kstar))
    out = out.join(
        F.broadcast(fair), out["_k"] == fair["_k2"], "left"
    )
    alloc = F.when(
        F.col("_k").isNull() | (F.col("_i") < F.col("_k")),
        F.col("_cap").cast("double"),
    ).otherwise(F.col("_fair"))
    return out.select(
        F.col(strata_col),
        F.col("_s").alias("size_weight"),
        (F.col("_k").isNull() | (F.col("_i") < F.col("_k"))).alias("capped"),
        F.round(alloc, 9).alias("alloc_weight_r"),
        F.round(alloc / F.col("_s").cast("double"), 9).alias("epochs_r"),
    )


def doremi_weights(
    per_doc: DataFrame,
    domain_col: str,
    weight_col: str,
    nll_col: str,
    eta: float = 1.0,
) -> DataFrame:
    """DoReMi-style domain reweighting, one exponentiated-gradient step
    (Xie et al. 2023, arXiv:2305.10429, simplified to a single update
    under a frozen scorer): per-domain EXCESS loss over the best-fit
    domain drives a multiplicative update of the token-share prior —
    ``w_d ∝ share_d * exp(eta * (mean_nll_d - min_e mean_nll_e))``,
    normalized. Domains the frozen model finds hardest (highest mean
    NLL) are up-weighted, the DoReMi direction; eta scales the step.

    Determinism: per-domain NLL sums fold the 9-decimal-rounded per-doc
    scores through DECIMAL(38,9) — exact, order-free, engine-portable —
    and every double division/exp result lands back on the 9-decimal
    grid before the next cross-row fold (scores re-enter DECIMAL for
    the normalizer). NULL-nll docs (< 2 tokens) are excluded from the
    mean but still count toward the token-share prior.

    Output per domain: (domain_col, n_docs, share_r, mean_nll_r,
    excess_r, weight_r).

    Plan shape (100 TB): one partial-aggregated pass to |domains| rows,
    one 1-row global broadcast back (the allow-listed scalar-aggregate
    cross-join shape) — the corpus is touched exactly once; everything
    after is metadata-sized.
    """
    dom = per_doc.groupBy(domain_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col(weight_col)).cast("long").alias("_w"),
        F.sum(F.col(nll_col).cast("decimal(38,9)")).alias("_nsum"),
        F.count(F.col(nll_col)).alias("_nn"),
    )
    mean_nll = F.round(
        F.col("_nsum").cast("double") / F.col("_nn").cast("double"), 9
    )
    dom = dom.withColumn("_mnll", mean_nll)
    tot = dom.agg(
        F.sum("_w").alias("_tw"),
        F.min("_mnll").alias("_base"),
    )
    dom = dom.crossJoin(F.broadcast(tot)).withColumn(
        "share_r",
        F.round(F.col("_w").cast("double") / F.col("_tw").cast("double"), 9),
    ).withColumn(
        "excess_r", F.round(F.col("_mnll") - F.col("_base"), 9)
    ).withColumn(
        "_score",
        F.round(
            F.col("share_r") * F.exp(F.lit(float(eta)) * F.col("excess_r")), 9
        ),
    )
    norm = dom.agg(
        F.sum(F.col("_score").cast("decimal(38,9)")).alias("_z")
    )
    return (
        dom.crossJoin(F.broadcast(norm))
        .select(
            F.col(domain_col),
            F.col("n_docs").cast("long").alias("n_docs"),
            "share_r",
            F.col("_mnll").alias("mean_nll_r"),
            "excess_r",
            F.round(
                F.col("_score") / F.col("_z").cast("double"), 9
            ).alias("weight_r"),
        )
    )


def unimax_sample(
    df: DataFrame,
    strata_col: str,
    weight_col: str,
    key_col: str,
    budget_frac: float,
    max_epochs: int = 4,
    salt: str = "unimax",
) -> DataFrame:
    """Materialize the UniMax mixture: every row of a stratum appears
    ``floor(epochs)`` times plus once more in the tail epoch when its
    deterministic hash draw falls under the fractional part — the
    ``epoch_mixture_sample`` expansion driven by ``unimax_plan``'s
    waterfilled allocation instead of user target shares (the paper's
    actual training loop: uniform budget split under the repetition
    cap, no hand-tuned shares).

    The effective epoch count re-rounds to the 6-decimal grid BEFORE
    floor (the ``epoch_mixture_plan`` ulp rule), and the tail draw is
    salted with the full-epoch index, so re-runs and the oracle agree
    row-for-row. Plan shape: |strata|-row broadcast + generator +
    filter, fully pipelined with the scan — rows never shuffle.

    Output: input columns + ``epoch`` (long).
    """
    plan = unimax_plan(df, strata_col, weight_col, budget_frac, max_epochs)
    eff = F.round(F.col("epochs_r"), 6)
    p2 = plan.select(
        F.col(strata_col),
        F.floor(eff).cast("long").alias("full_epochs"),
        F.round(eff - F.floor(eff), 6).alias("_tail"),
    ).withColumn(
        "_thr",
        F.format_string(
            f"%0{_HEX_WIDTH}x",
            F.least(
                (F.col("_tail") * F.lit(float(16**_HEX_WIDTH))).cast("long"),
                F.lit(16**_HEX_WIDTH - 1),
            ),
        ),
    )
    joined = df.join(F.broadcast(p2), [strata_col])
    epoch = F.explode(
        F.sequence(F.lit(0).cast("long"), F.col("full_epochs"))
    ).alias("epoch")
    out = joined.select("*", epoch)
    tail_draw = sample_hash(
        F.concat_ws(
            "#",
            F.col(key_col).cast("string"),
            F.col("full_epochs").cast("string"),
        ),
        salt,
    )
    return (
        out.filter(
            (F.col("epoch") < F.col("full_epochs"))
            | (
                (F.col("epoch") == F.col("full_epochs"))
                & (tail_draw < F.col("_thr"))
            )
        )
        .drop("full_epochs", "_tail", "_thr")
    )
