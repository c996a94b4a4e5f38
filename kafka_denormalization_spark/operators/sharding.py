"""Deterministic training-shard layout: the global shuffle + sharding step
that turns a curated corpus into the fixed, reproducible byte layout a
training run consumes (WebDataset/TFRecord-style shard files).

Training jobs need (a) a uniform random-looking interleave of sources so a
sequential reader sees a stationary mixture, (b) bit-reproducibility — the
same corpus must yield the same shards on every rerun, regardless of
cluster size or partitioning, and (c) balanced shard sizes so data-loader
workers finish together. A Spark ``orderBy(rand())`` gives none of these;
the standard fix is a *hash shuffle*: every row's shard and its position
inside the shard derive from a stable content/id hash, never from
execution order.

Design (cf. the repo's md5-draw convention, operators/sampling.py): the
draw is ``md5(salt | id)``; the first 8 hex chars parsed as an integer
modulo ``n_shards`` picks the shard (uniform, skew-free), and the full
digest orders rows WITHIN the shard (tie-broken by id for byte-identical
reruns even under hash collisions). Changing ``salt`` re-deals the entire
layout — a fresh epoch-level shuffle with zero state.

100 TB shape: one hash per row, ONE exchange (hash-partition by shard id
— the same exchange the shard write needs anyway, so the plan carries no
extra shuffle), and the per-shard ``row_number`` window is bounded by
|corpus| / n_shards rows; pick ``n_shards`` so a shard fits an executor
(real corpus builds use 10k-1M shards, exactly this regime). No global
sort, no driver state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from kafka_denormalization_spark.operators.window import global_ordered_window


def shard_draw(id_col: Column, salt: str) -> Column:
    """The stable per-row draw: md5 over (salt | id)."""
    return F.md5(F.concat_ws("|", F.lit(salt), id_col.cast("string")))


def shard_plan(
    docs: DataFrame,
    id_col: str,
    n_shards: int,
    salt: str = "shard",
) -> DataFrame:
    """Assign every row a ``shard_id`` in ``[0, n_shards)`` and a dense
    0-based ``pos`` inside its shard (the read order a data loader sees).

    Both are pure functions of (salt, id): rerunning on any partitioning,
    cluster size, or input order yields the identical layout.

    Output: all input columns + (shard_id, pos).
    """
    draw = shard_draw(F.col(id_col), salt)
    shard = (
        F.conv(F.substring(draw, 1, 8), 16, 10).cast("long")
        % F.lit(n_shards)
    ).cast("long")
    w = Window.partitionBy("shard_id").orderBy("_draw", id_col)
    return (
        docs.withColumn("_draw", draw)
        .withColumn("shard_id", shard)
        .withColumn("pos", (F.row_number().over(w) - F.lit(1)).cast("long"))
        .drop("_draw")
    )


def shard_plan_bytes(
    docs: DataFrame,
    id_col: str,
    size_col: str,
    n_shards: int,
) -> DataFrame:
    """Byte-budgeted shard layout: serpentine round-robin over the
    size-descending rank — the bin-packing variant of ``shard_plan``
    for corpora with heavy-tailed document sizes, where a pure hash
    deal leaves loader workers waiting on whichever shard drew the
    giants.

    Rank every row by (size desc, id asc); item at global rank ``r``
    goes to round ``r DIV n_shards``; within an even round slots map
    left-to-right (shard = r % n_shards) and within an odd round
    right-to-left (shard = n_shards-1 - r % n_shards). The reversal
    pairs each shard's large pick with a small one next round, so
    per-shard byte totals track each other to within one item's size
    (classic serpentine/boustrophedon guarantee for sorted input) —
    versus the O(sqrt(n)) statistical spread of the hash deal.
    ``pos`` = the round index, which is dense 0-based per shard (every
    shard receives exactly one item per full round).

    100 TB shape: NO single-partition global window. The global rank
    decomposes into (a) a distinct-size table with a cumulative-count
    window — tiny (one row per distinct byte length, ~1e5 rows for
    real corpora) and explicitly the only unpartitioned window here —
    and (b) a per-size ``row_number`` window, bounded by the most
    populous exact byte length. The offsets side is broadcast. Rows
    carry only (id, size) through the rank machinery; the payload
    joins back by id at write time if needed.

    Output: all input columns + (shard_id, pos); both are pure
    functions of the (size, id) multiset — identical on any
    partitioning, cluster size, or engine.
    """
    size = F.col(size_col).cast("long")
    sized = docs.withColumn("_size", size)
    by_size = sized.groupBy("_size").agg(F.count(F.lit(1)).alias("_c"))
    w_off = (
        # metadata-sized frame (distinct byte lengths) — see
        # window.global_ordered_window for why the single task is pinned
        global_ordered_window(F.col("_size"), F.col("_size").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = by_size.select(
        "_size", F.coalesce(F.sum("_c").over(w_off), F.lit(0)).alias("_off")
    )
    w_in = Window.partitionBy("_size").orderBy(id_col)
    ranked = sized.join(F.broadcast(offsets), "_size").withColumn(
        "_r", F.col("_off") + F.row_number().over(w_in) - F.lit(1)
    )
    # integral DIV, not double division: exact for ranks beyond 2^53
    # (same hazard pack_chunks documents for cumulative offsets)
    rnd = F.expr(f"_r DIV {int(n_shards)}")
    slot = F.col("_r") % F.lit(n_shards)
    shard = F.when(rnd % 2 == 0, slot).otherwise(F.lit(n_shards - 1) - slot)
    return (
        ranked.withColumn("shard_id", shard.cast("long"))
        .withColumn("pos", rnd.cast("long"))
        .drop("_size", "_off", "_r")
    )


def shard_stats(
    plan: DataFrame,
    token_count_col: Column,
    char_col: str = "text",
) -> DataFrame:
    """Per-shard balance report over a ``shard_plan`` output: row, token,
    and a size-proxy char count per shard — the numbers that tell you
    whether loader workers will finish together. One aggregation pass.

    ``char_col`` names the text column used for the char-count proxy;
    pass whatever text/payload column the plan carries (plans that drop
    the raw text, e.g. ``corpus_to_shards``, can point this at any
    retained string column).

    Output: (shard_id, n_docs, n_tokens, n_chars).
    """
    return plan.groupBy("shard_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_count_col).cast("long").alias("n_tokens"),
        F.sum(F.length(char_col)).cast("long").alias("n_chars"),
    )


def write_shards(
    plan: DataFrame,
    path: str,
) -> None:
    """Materialize a ``shard_plan`` as one directory per shard
    (``shard_id=K/``), rows stored in shard-read order.

    ``repartition(shard_id)`` routes each shard to one task and
    ``sortWithinPartitions`` lays rows out in ``pos`` order, so each
    shard directory's parquet row order IS the training read order —
    the loader never re-sorts. The repartition satisfies the
    ``partitionBy`` clustering requirement, so this is the plan's only
    exchange.
    """
    (
        plan.repartition("shard_id")
        .sortWithinPartitions("shard_id", "pos")
        .write.mode("overwrite")
        .partitionBy("shard_id")
        .parquet(path)
    )

def shard_manifest(
    plan: DataFrame,
    id_col: str,
    bytes_col: str,
    shard_col: str = "shard_id",
    pos_col: str = "pos",
) -> DataFrame:
    """Per-shard integrity manifest over a shard layout (the output of
    ``shard_plan`` / ``shard_plan_bytes``): row count, byte total,
    position envelope, a contiguity flag, and an ORDER-INDEPENDENT
    content checksum — what a training-data loader verifies before it
    trusts a 100-TB shard set (partial writes, duplicated retries, and
    re-ordered rewrites all flip either the checksum or the contiguity
    flag).

    The checksum is the XOR fold of a 60-bit integer drawn from
    md5(id @ pos) per row: XOR is commutative/associative, so the value
    is independent of partitioning and aggregation order (no overflow,
    no float), yet any single added, dropped, or re-positioned row
    changes it. Covering (id, pos) — not just id — makes the LAYOUT
    part of the contract: the same rows in a different read order fail.

    One aggregation pass; only (shard, id, pos, bytes) shuffle.

    Output: (shard_col, n_docs, total_bytes, pos_min, pos_max,
    contiguous, checksum).
    """
    row_h = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    "@",
                    F.col(id_col).cast("string"),
                    F.col(pos_col).cast("string"),
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    return (
        plan.select(
            F.col(shard_col),
            F.col(pos_col),
            F.col(bytes_col).cast("long").alias("_b"),
            row_h.alias("_h"),
        )
        .groupBy(shard_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_b").alias("total_bytes"),
            F.min(pos_col).cast("long").alias("pos_min"),
            F.max(pos_col).cast("long").alias("pos_max"),
            F.expr("bit_xor(_h)").alias("checksum"),
        )
        .select(
            shard_col,
            "n_docs",
            "total_bytes",
            "pos_min",
            "pos_max",
            (
                (F.col("pos_min") == 0)
                & (F.col("pos_max") == F.col("n_docs") - 1)
            ).alias("contiguous"),
            "checksum",
        )
    )

def curriculum_shards(
    scored: DataFrame,
    id_col: str,
    score_col: str,
    n_shards: int,
    decimals: int = 2,
) -> DataFrame:
    """Curriculum-ordered shard layout: rank the corpus easiest-first by
    a per-doc difficulty score (ascending — e.g. LM nll, so fluent
    in-domain docs lead), then deal the serpentine round-robin so every
    shard sees the same difficulty PROGRESSION. A sequential reader of
    any one shard walks the curriculum; shards stay interchangeable
    (each round hands every shard one item from the same difficulty
    band, the shard_plan_bytes balance guarantee applied to difficulty
    instead of bytes).

    The global rank uses the same no-global-window decomposition as
    ``shard_plan_bytes``, with one adaptation: a near-continuous score
    would make the distinct-value offsets table corpus-sized, so the
    score is first quantized to ``decimals`` places — curriculum BANDS.
    Within a band, order is (id) — deterministic and curriculum-
    equivalent (a band is by construction one difficulty step). Rows
    with NULL score (no evidence, e.g. < 2 tokens for an LM score) sort
    into a final +inf band: no evidence, end of curriculum.

    Output: all input columns + (band, shard_id, pos); pure function of
    the (round(score), id) multiset — identical on any partitioning or
    engine.
    """
    band = F.coalesce(
        F.round(F.col(score_col).cast("double"), decimals),
        F.lit(float("inf")),
    )
    banded = scored.withColumn("_band", band)
    by_band = banded.groupBy("_band").agg(F.count(F.lit(1)).alias("_c"))
    w_off = (
        global_ordered_window(F.col("_band"), F.col("_band").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = by_band.select(
        "_band", F.coalesce(F.sum("_c").over(w_off), F.lit(0)).alias("_off")
    )
    w_in = Window.partitionBy("_band").orderBy(id_col)
    ranked = banded.join(F.broadcast(offsets), "_band").withColumn(
        "_r", F.col("_off") + F.row_number().over(w_in) - F.lit(1)
    )
    rnd = F.expr(f"_r DIV {int(n_shards)}")
    slot = F.col("_r") % F.lit(n_shards)
    shard = F.when(rnd % 2 == 0, slot).otherwise(F.lit(n_shards - 1) - slot)
    return (
        ranked.withColumn("band", F.col("_band"))
        .withColumn("shard_id", shard.cast("long"))
        .withColumn("pos", rnd.cast("long"))
        .drop("_band", "_off", "_r")
    )


def morton_interleave(a: Column, b: Column, bits: int = 16) -> Column:
    """Morton (Z-order) bit interleave of two ``bits``-wide non-negative
    integer columns: ``a``'s bit i lands at position 2i, ``b``'s at
    2i+1. Pure unrolled integer expression (2*bits shift/mask/or terms)
    — whole-stage-codegen'd JVM-side, and replayable verbatim in any
    engine with bitwise operators (the DuckDB oracle does).
    """
    if not 1 <= bits <= 31:
        raise ValueError(f"bits must be in [1, 31], got {bits}")
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


def z_order_plan(
    df: DataFrame,
    id_col: str,
    dim_a: str,
    dim_b: str,
    rows_per_shard: int,
    bits: int = 16,
    band_bits: int = 12,
) -> DataFrame:
    """Z-order (Morton-curve) data layout over two numeric dimensions —
    the multi-column clustering step a 100-TB lakehouse runs so that
    min/max file statistics prune scans for predicates on EITHER
    dimension (Delta/Iceberg ``OPTIMIZE ZORDER BY`` lineage; a plain
    sort clusters only its leading column).

    Mechanism: each dimension is normalized to ``[0, 2^bits)`` by EXACT
    integer arithmetic — ``((x - min) * (2^bits - 1)) DIV (max - min)``
    in LONG when the span allows, escalating to DECIMAL(38,0) for
    spans beyond 2^63/(2^bits - 1) ≈ 2^47 where a BIGINT product would
    silently wrap (e.g. any epoch-microsecond dimension spanning more
    than ~4.5 years; never float division — a double wobbles in the
    low bit beyond 2^53); exact for the FULL 64-bit domain — then
    Morton-interleaved into a z-value; rows are globally ranked by
    ``(z, id)`` and dealt into contiguous ``rows_per_shard`` chunks.
    Contiguous-in-z chunks are the point: each shard covers a small
    hyper-rectangle of (dim_a, dim_b), so its min/max envelope is tight
    on both dimensions (``z_order_stats`` measures exactly that).

    Scale (100 TB): the dimension min/max is ONE bounded aggregate
    collected to the driver and inlined as literals (the normalization
    is then a pure codegen expression — no bounds join at all). The
    global rank reuses the shard_plan_bytes / curriculum_shards
    no-global-window decomposition: rows are banded by the TOP
    ``band_bits`` bits of z (<= 2^band_bits bands — the one
    unpartitioned window runs on that bounded band-count table),
    offset by the band prefix sum, and row_number'd within their band
    only. One aggregation + one partitioned window + one broadcast
    join; no global sort.

    Output: all input columns + (z, shard_id, pos) — a pure function of
    the (dim_a, dim_b, id) multiset, identical on any partitioning or
    engine.
    """
    if rows_per_shard < 1:
        raise ValueError(f"rows_per_shard must be >= 1, got {rows_per_shard}")
    if not 1 <= band_bits <= 2 * bits:
        raise ValueError(f"band_bits must be in [1, {2 * bits}]")
    # The 1-row dimension bounds are COLLECTED to the driver (one
    # bounded aggregate job — the eager work the old localCheckpoint
    # paid anyway) and inlined as literals: the normalization becomes a
    # pure codegen expression (no bounds crossJoin), and the driver can
    # pick the arithmetic per dimension:
    #   - span * (2^bits - 1) fits int64 (span <= ~2^47): exact LONG
    #     arithmetic, whole-stage codegen — every realistic dimension;
    #   - wider spans (e.g. epoch-microsecond ranges over >4.5 years,
    #     up to the full 2^64 - 1 signed-64-bit domain): exact
    #     DECIMAL(38,0) arithmetic — a BIGINT product would wrap
    #     silently under non-ANSI Spark while the DuckDB oracle errors
    #     (ADVICE r07 #1). Spark's `div` (IntegralDivide) returns the
    #     exact BIGINT quotient (<= 2^bits - 1) for both types.
    # The measured cost of running DECIMAL unconditionally was ~3x on
    # the whole layout query (BENCH r08 A/B), hence the driver-side
    # dispatch.
    row = df.agg(
        F.min(F.col(dim_a).cast("long")).alias("_amn"),
        F.max(F.col(dim_a).cast("long")).alias("_amx"),
        F.min(F.col(dim_b).cast("long")).alias("_bmn"),
        F.max(F.col(dim_b).cast("long")).alias("_bmx"),
    ).collect()[0]
    top = (1 << bits) - 1
    long_safe = (2**63 - 1) // top

    def scaled(dim: str, mn, mx):
        """(numerator column, divisor column) for ((x - mn) * top) and
        the span, in the narrowest exact type; None for degenerate
        (constant / empty) dimensions."""
        if mn is None or mx is None or mx <= mn:
            return None, None
        span = int(mx) - int(mn)
        if span <= long_safe:
            num = (F.col(dim).cast("long") - F.lit(int(mn))) * F.lit(top)
            den = F.lit(span)
        else:
            dec = "decimal(38,0)"
            num = (
                F.col(dim).cast(dec) - F.lit(int(mn)).cast(dec)
            ) * F.lit(top).cast(dec)
            den = F.expr(f"CAST('{span}' AS DECIMAL(38,0))")
        return num, den

    sa, wa = scaled(dim_a, row["_amn"], row["_amx"])
    sb, wb = scaled(dim_b, row["_bmn"], row["_bmx"])
    zero = F.lit(0).cast("long")
    with_b = df.select(
        "*",
        (sa if sa is not None else zero).alias("_sa"),
        (wa if wa is not None else F.lit(1)).alias("_wa"),
        (sb if sb is not None else zero).alias("_sb"),
        (wb if wb is not None else F.lit(1)).alias("_wb"),
    )
    na = F.expr("_sa div _wa") if sa is not None else zero
    nb = F.expr("_sb div _wb") if sb is not None else zero
    zed = with_b.withColumn(
        "z", morton_interleave(na, nb, bits)
    ).drop("_sa", "_wa", "_sb", "_wb")

    band = F.shiftright(F.col("z"), 2 * bits - band_bits)
    banded = zed.withColumn("_band", band)
    by_band = banded.groupBy("_band").agg(F.count(F.lit(1)).alias("_c"))
    w_off = (
        global_ordered_window(F.col("_band"), F.col("_band").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = by_band.select(
        "_band", F.coalesce(F.sum("_c").over(w_off), F.lit(0)).alias("_off")
    ).localCheckpoint(eager=True)
    w_in = Window.partitionBy("_band").orderBy("z", id_col)
    ranked = banded.join(F.broadcast(offsets), "_band").withColumn(
        "_r", F.col("_off") + F.row_number().over(w_in) - F.lit(1)
    )
    return (
        ranked.withColumn(
            "shard_id", F.expr(f"_r DIV {int(rows_per_shard)}").cast("long")
        )
        .withColumn("pos", (F.col("_r") % F.lit(rows_per_shard)).cast("long"))
        .drop("_band", "_off", "_r")
    )


def z_order_stats(
    plan: DataFrame, dim_a: str, dim_b: str
) -> DataFrame:
    """Per-shard min/max envelope of both layout dimensions — the
    file-statistics view a scan planner prunes against. Tight envelopes
    on BOTH columns are z-order's deliverable; compare against
    ``shard_plan``'s hash layout (envelopes span the full domain, no
    shard is ever prunable). Bounded output: one row per shard."""
    return plan.groupBy("shard_id").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.min(dim_a).alias("a_min"),
        F.max(dim_a).alias("a_max"),
        F.min(dim_b).alias("b_min"),
        F.max(dim_b).alias("b_max"),
    )


def z_order_prune(
    stats: DataFrame,
    bounds: DataFrame,
    n_probes: int = 4,
) -> DataFrame:
    """Data-skipping report over a z-order layout: for ``n_probes``
    aligned probe rectangles (probe i covers the i-th 1/n slice of BOTH
    dimensions — the "this user, this week" shape the layout exists
    for), the fraction of shards a min/max-pruning scan planner skips.
    This is the measurable consumer of ``z_order_stats``: on a hash
    layout every envelope spans the full domain and prune_frac is 0;
    on the Morton layout most shards fall outside any aligned
    rectangle.

    ``stats``: z_order_stats output; ``bounds``: 1-row frame with
    (_amn, _amx, _bmn, _bmx) — the same aggregate z_order_plan uses.
    Probe edges are exact integer arithmetic (lo + (span * i) DIV n),
    so any engine derives identical rectangles.

    Scale: everything here is bounded — |shards| stats rows, 1-row
    bounds, n_probes rows; the broadcast nested loops are the
    documented 1-row/bounded class.

    Output: (probe_id, n_shards, n_overlap, prune_frac_r).
    """
    if n_probes < 1:
        raise ValueError(f"n_probes must be >= 1, got {n_probes}")
    spark = stats.sparkSession
    pr = (
        spark.range(n_probes)
        .withColumnRenamed("id", "probe_id")
        .crossJoin(F.broadcast(bounds))
        .select(
            "probe_id",
            (F.col("_amn") + F.expr(f"((_amx - _amn) * probe_id) DIV {n_probes}")).alias("_ulo"),
            (F.col("_amn") + F.expr(f"((_amx - _amn) * (probe_id + 1)) DIV {n_probes}")).alias("_uhi"),
            (F.col("_bmn") + F.expr(f"((_bmx - _bmn) * probe_id) DIV {n_probes}")).alias("_tlo"),
            (F.col("_bmn") + F.expr(f"((_bmx - _bmn) * (probe_id + 1)) DIV {n_probes}")).alias("_thi"),
        )
    )
    total = stats.agg(F.count(F.lit(1)).alias("n_shards"))
    overlap = (
        pr.join(
            F.broadcast(stats),
            (F.col("a_min") <= F.col("_uhi"))
            & (F.col("a_max") >= F.col("_ulo"))
            & (F.col("b_min") <= F.col("_thi"))
            & (F.col("b_max") >= F.col("_tlo")),
        )
        .groupBy("probe_id")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    return (
        pr.select("probe_id")
        .join(overlap, "probe_id", "left")
        .crossJoin(F.broadcast(total))
        .select(
            "probe_id",
            F.col("n_shards").cast("long").alias("n_shards"),
            F.coalesce("n_overlap", F.lit(0)).cast("long").alias("n_overlap"),
            F.round(
                F.lit(1.0)
                - F.coalesce("n_overlap", F.lit(0)).cast("double")
                / F.col("n_shards").cast("double"),
                9,
            ).alias("prune_frac_r"),
        )
    )
