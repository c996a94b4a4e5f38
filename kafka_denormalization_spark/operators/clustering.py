"""Deterministic embedding k-means (Lloyd's iterations) — corpus
clustering for training-data curation (topic balancing, per-cluster
sampling quotas, semantic dedup seeds; cf. the IVF coarse quantizer in
functions/similarity.py, which uses random-projection buckets instead of
learned centroids).

No analog in the reference (SURVEY §2.3 — no value-level compute at
all); this is a north-star extension alongside ANN/similarity.

Spark-first: the whole `iters`-round loop is ONE lazy DataFrame plan —
assignment is a k-row broadcast cross join + fixed-order fold per
vector, centroid recomputation is a partial-agg groupBy over exploded
(cluster, dim) component rows. No driver round-trips at all (centroids
stay distributed; contrast graph.py, which pulls one scalar per round
for convergence checks).

Cross-engine determinism (the DuckDB oracle replays the same rounds):
- centroid components route through the embedding_centroid fixed-point
  convention — scale by 2^36 (exact exponent shift), FLOOR, sum exactly
  in DECIMAL(38,0) (the oracle uses HUGEINT; a BIGINT accumulator would
  overflow near ~1.3e8 unit-scale members per cluster), divide once as
  doubles — so both engines hold bit-identical centroids after every
  round;
- squared distances fold over dimensions IN ARRAY ORDER with the same
  (x-c)*(x-c) operand shapes, so IEEE evaluation is bit-identical;
- assignment ties break on cluster id via min(struct(dist, cid)).

Scale notes (100 TB): per round, the corpus shuffles ONCE as exploded
(cluster, dim, fixed-point component) triples with map-side combine —
shuffle volume after combine is k x dims rows, never the corpus. The
k-row centroid table broadcasts. Iteration count is a compile-time
constant (plans nest linearly, like graph.py's bounded label rounds);
``persist=True`` caches the projected input once so each round rereads
columnar cache, not the source scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from ..checkpoint import persist_if_uncached
from ..engine import parallelize_scan

# 2^36: exact binary scale for the fixed-point centroid sums (shared
# convention with queries.py embedding_centroid oracle).
_FP_SCALE = 68719476736.0


def _sq_dist(vec, carr):
    """Σ_i (vec_i − carr_i)² as a sequential fold in array order."""
    return F.aggregate(
        F.zip_with(vec, carr, lambda x, c: (x - c) * (x - c)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def kmeans_assign(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 8,
    iters: int = 3,
    persist: bool = True,
    checkpoint_dir: str | None = None,
    session_memo: bool = False,
) -> DataFrame:
    """Lloyd's k-means, ``iters`` assignment rounds with ``iters - 1``
    centroid updates between them. Seeds are the ``k`` vectors with the
    smallest ids (deterministic; cluster labels ARE the seed ids, which
    avoids an unpartitioned row-number window just to mint 0..k-1).
    Clusters that lose all members disappear for later rounds (standard
    Lloyd behavior; deterministic here, so both engines agree).

    ``checkpoint_dir``: reliably checkpoint the (k-row) centroid table
    after every update round — plan depth stays O(1) in ``iters`` and
    the materialized rounds survive executor loss (checkpoint.py); the
    default keeps the pure-lazy plan (fine at the default 3 rounds).
    Results identical through both paths.

    ``session_memo`` (r12): route the assignment table through
    ``checkpoint.truncate_lineage_session`` — one eager materialization
    per (session, plan, params) serves every consumer (five registry
    queries run Lloyd over the same embeddings corpus per bench pass:
    kmeans_clusters, semantic_dedup, prototype_prune, kmeans_sizes,
    cluster-audit shapes); identical rows either way, the memo only
    swaps recomputation for a LogicalRDD read.

    Output: (id_col, cluster_id, dist_r) — every vector's final cluster
    and squared distance on the 9-decimal grid.
    """
    if k < 1 or iters < 1:
        raise ValueError("need k >= 1 and iters >= 1")
    # every assignment round's k-way distance folds run over the cached
    # projection of this frame, which keeps the INPUT's partitioning —
    # parallelize a monolithic input (engine.parallelize_scan is a
    # no-op on real layouts); all round arithmetic is exact decimal /
    # min(struct), partitioning-free
    emb = parallelize_scan(emb, id_col)
    vecs = emb.select(
        F.col(id_col).alias("_vid"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("_v"),
    )
    if persist:

        vecs = persist_if_uncached(vecs)
    centroids = (
        vecs.orderBy("_vid")
        .limit(k)
        .select(F.col("_vid").alias("_cid"), F.col("_v").alias("_carr"))
    )
    assigned = None
    for rnd in range(iters):
        scored = vecs.crossJoin(F.broadcast(centroids)).select(
            "_vid",
            "_v",
            "_cid",
            _sq_dist(F.col("_v"), F.col("_carr")).alias("_d"),
        )
        assigned = (
            scored.groupBy("_vid")
            .agg(
                F.min(
                    F.struct(
                        F.col("_d").alias("d"),
                        F.col("_cid").alias("cid"),
                        F.col("_v").alias("v"),
                    )
                ).alias("_m")
            )
            .select(
                "_vid",
                F.col("_m.cid").alias("_cid"),
                F.col("_m.d").alias("_d"),
                F.col("_m.v").alias("_v"),
            )
        )
        if rnd == iters - 1:
            break
        comps = (
            assigned.select(
                "_cid", F.posexplode("_v").alias("_pos", "_x")
            )
            .groupBy("_cid", "_pos")
            .agg(
                # decimal(38,0) accumulator: a long-side sum of 2^36
                # fixed-point components overflows int64 once a cluster
                # holds ~1.3e8 unit-scale members; decimal is exact (and
                # deterministic cross-engine) up to ~1e27 members
                F.sum(
                    F.floor(F.col("_x") * F.lit(_FP_SCALE))
                    .cast("decimal(38,0)")
                ).alias("_s"),
                F.count(F.lit(1)).alias("_n"),
            )
        )
        centroids = (
            comps.select(
                "_cid",
                "_pos",
                (
                    F.col("_s").cast("double")
                    / (F.col("_n") * F.lit(_FP_SCALE))
                ).alias("_mean"),
            )
            .groupBy("_cid")
            .agg(
                F.transform(
                    F.sort_array(
                        F.collect_list(
                            F.struct(
                                F.col("_pos").alias("p"),
                                F.col("_mean").alias("m"),
                            )
                        )
                    ),
                    lambda s: s.getField("m"),
                ).alias("_carr")
            )
        )
        if checkpoint_dir is not None:
            from kafka_denormalization_spark.checkpoint import (
                truncate_lineage,
            )

            centroids = truncate_lineage(centroids, checkpoint_dir)
    out = assigned.select(
        F.col("_vid").alias(id_col),
        F.col("_cid").alias("cluster_id"),
        F.round(F.col("_d"), 9).alias("dist_r"),
    )
    if session_memo:
        from kafka_denormalization_spark.checkpoint import (
            truncate_lineage_session,
        )

        out = truncate_lineage_session(out, checkpoint_dir)
    return out


def semantic_dedup(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 8,
    iters: int = 3,
    threshold: float = 0.5,
    session_memo: bool = False,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): semantic deduplication of an
    embedding corpus — k-means cluster first, then drop near-identical
    vectors WITHIN each cluster (cosine ≥ ``threshold``), keeping the
    lowest id of every duplicate pair (the repo's deterministic greedy
    rule, cf. cosine_dedup). Pairwise work is confined to clusters, so
    the corpus never sees an all-pairs join; at production scale k grows
    with the corpus (SemDeDup uses tens of thousands of clusters) to
    keep per-cluster candidate sets bounded, and the within-cluster join
    shuffles by cluster id with AQE handling stragglers.

    Builds on :func:`kmeans_assign` (same determinism contract — the
    DuckDB oracle replays the rounds bit-identically, and the exact
    cosine verify folds dimensions in array order).

    Output: (id_col, cluster_id) — the surviving vectors.
    """

    from kafka_denormalization_spark.functions.similarity import cosine

    assigned = kmeans_assign(
        emb, id_col, vec_col, k=k, iters=iters, session_memo=session_memo
    )
    # one persisted frame feeds the pair join's both sides AND the final
    # anti-join — otherwise each consumer replays the whole Lloyd plan
    with_vec = assigned.join(
        emb.select(F.col(id_col), F.col(vec_col).alias("_v")), id_col
    ).transform(persist_if_uncached)
    a = with_vec.select(
        F.col(id_col).alias("_ida"),
        F.col("cluster_id").alias("_c"),
        F.col("_v").alias("_va"),
    )
    b = with_vec.select(
        F.col(id_col).alias("_idb"),
        F.col("cluster_id").alias("_c"),
        F.col("_v").alias("_vb"),
    )
    dropped = (
        a.join(b, ["_c"])
        .filter(F.col("_ida") < F.col("_idb"))
        .filter(cosine(F.col("_va"), F.col("_vb")) >= F.lit(threshold))
        .select(F.col("_idb").alias(id_col))
        .distinct()
    )
    return with_vec.join(dropped, id_col, "left_anti").select(
        id_col, "cluster_id"
    )

def prototype_prune(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 8,
    iters: int = 3,
    keep_frac: float = 0.5,
    keep: str = "hard",
    session_memo: bool = False,
) -> DataFrame:
    """Prototype-based data pruning (Sorscher et al. 2022, "Beyond
    neural scaling laws"): cluster the embedding corpus, rank each
    cluster's members by distance to their centroid, and keep a
    fraction per cluster — ``keep='hard'`` retains the FARTHEST
    (prunes easy/prototypical examples, the right policy in the
    abundant-data regime the paper establishes), ``keep='easy'`` the
    closest (the scarce-data policy). Per-cluster ranking keeps the
    pruning topic-balanced — a global distance cut would empty the
    tightest clusters first.

    Deterministic cross-engine: distances come from ``kmeans_assign``'s
    9-decimal grid with id tiebreaks; the per-cluster quota is
    ceil(keep_frac * cluster_size) with a dyadic ``keep_frac``
    recommended (exact IEEE product either way at these magnitudes).

    Plan shape (100 TB): the Lloyd rounds are kmeans_assign's (k-row
    centroid broadcast per round); the prune adds ONE cluster-id hash
    exchange shared by the rank and size windows. At production scale k
    grows with the corpus (tens of thousands of clusters), keeping every
    cluster's window partition small — same scaling argument as
    semantic_dedup.

    Output: (id_col, cluster_id, dist_r, rank) for kept rows; rank is
    1-based within the cluster in the kept ordering.
    """
    if keep not in ("hard", "easy"):
        raise ValueError(f"keep must be 'hard' or 'easy', got {keep!r}")
    asg = kmeans_assign(
        emb, id_col, vec_col, k=k, iters=iters, session_memo=session_memo
    )
    order = (
        [F.col("dist_r").desc(), F.col(id_col).asc()]
        if keep == "hard"
        else [F.col("dist_r").asc(), F.col(id_col).asc()]
    )
    w = Window.partitionBy("cluster_id")
    ranked = asg.select(
        id_col,
        "cluster_id",
        "dist_r",
        F.row_number().over(w.orderBy(*order)).cast("long").alias("rank"),
        F.count(F.lit(1)).over(w).alias("_n"),
    )
    return ranked.filter(
        F.col("rank") <= F.ceil(F.lit(keep_frac) * F.col("_n"))
    ).drop("_n")
