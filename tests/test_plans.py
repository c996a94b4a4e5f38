"""Physical-plan shape assertions — the 100 TB story, pinned by tests.

These fail if a refactor silently loses broadcast placement, filter
pushdown, or column pruning — regressions invisible to correctness tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_denormalization_spark import queries as Q
from kafka_denormalization_spark.engine import table
from kafka_denormalization_spark.plans import (
    count_exchanges,
    has_broadcast_join,
    pushed_filters,
    read_schemas,
)

SF_DIR = "/root/testdata/sf0.001"


def test_two_hop_customer_join_is_broadcast(spark):
    df = Q.q_two_hop_denorm(spark, SF_DIR)
    assert has_broadcast_join(df), "small-dim customer join must broadcast"


def test_filter_pushdown_reaches_scan(spark):
    li = table(spark, SF_DIR, "lineitem").filter(F.col("l_quantity") > 30).select(
        "l_orderkey", "l_quantity"
    )
    assert any("l_quantity" in f for f in pushed_filters(li))


def test_column_pruning_in_denorm(spark):
    df = Q.q_two_hop_denorm(spark, SF_DIR)
    schemas = read_schemas(df)
    # the customer scan must not read columns the query never touches
    cust = [s for s in schemas if "c_name" in s]
    assert cust and all("c_acctbal" not in s for s in cust)


def test_latest_per_key_single_shuffle(spark):
    """max_by latest-per-key is one hash aggregation: exactly one exchange
    (the window strategy would also be one, but without partial agg)."""
    df = Q.q_latest_per_key(spark, SF_DIR)
    assert count_exchanges(df) == 1


def test_denorm_inner_shuffle_budget(spark):
    """latest(lineitem) + join: dedup agg shuffles on (okey, linenumber);
    the join on okey. AQE may reuse/convert, but the static plan must not
    exceed 3 exchanges (2 sides + agg)."""
    df = Q.q_denorm_inner(spark, SF_DIR)
    assert count_exchanges(df) <= 3


def test_partial_aggregation_before_shuffle(spark):
    """groupBy count must plan a map-side partial agg (HashAggregate appears
    above AND below the exchange)."""
    from kafka_denormalization_spark.plans import explain_str

    df = table(spark, SF_DIR, "lineitem").groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n")
    )
    plan = explain_str(df)
    assert plan.count("HashAggregate") >= 2


def test_exists_subquery_decorrelates_to_semi_join(spark):
    """Catalyst must rewrite the EXISTS correlated subquery into a semi
    join (no per-row subquery execution)."""
    from kafka_denormalization_spark.plans import explain_str

    df = Q.q_exists_late_ship(spark, SF_DIR)
    plan = explain_str(df)
    assert "LeftSemi" in plan or "left_semi" in plan.lower()


def test_correlated_scalar_subquery_decorrelates(spark):
    """The per-part avg scalar subquery becomes an aggregate + join, not a
    row-at-a-time subquery plan."""
    from kafka_denormalization_spark.plans import explain_str

    df = Q.q_small_qty_revenue(spark, SF_DIR)
    plan = explain_str(df)
    # decorrelated: an aggregate over l_partkey joined back; no Subquery
    # node surviving in the physical plan
    assert "Subquery" not in plan
    assert "avg" in plan.lower()


def test_volume_shipping_broadcasts_filtered_dims(spark):
    """The nation-pair predicate shrinks supplier/customer dims to
    broadcast size; the fact table must join them without a shuffle on
    the dim side."""
    df = Q.q_volume_shipping(spark, SF_DIR)
    assert has_broadcast_join(df)


def test_disjunctive_revenue_pushes_part_predicate(spark):
    """The OR'd brand/size predicate must reach the part scan (shrinks
    part to broadcast size before the fact join)."""
    df = Q.q_disjunctive_revenue(spark, SF_DIR)
    filters = pushed_filters(df)
    assert any("p_brand" in f or "p_size" in f for f in filters)
    assert has_broadcast_join(df)


def test_waiting_suppliers_decorrelates(spark):
    """EXISTS -> left-semi, NOT EXISTS -> left-anti; no per-row subquery
    nodes survive in the physical plan."""
    from kafka_denormalization_spark.plans import explain_str

    df = Q.q_waiting_suppliers(spark, SF_DIR)
    plan = explain_str(df)
    assert "LeftSemi" in plan or "left_semi" in plan.lower()
    assert "LeftAnti" in plan or "left_anti" in plan.lower()


def test_runtime_bloom_filter_injects_on_selective_join(spark):
    """Spark's InjectRuntimeFilter adds a bloom-filter semi-reduction on
    the fact side of a shuffle join whose dim side carries a selective
    predicate. The application-side threshold defaults to 10 GB, so at
    cluster scale it fires on its own; locally we lower it to prove the
    plan shape (and that our query form doesn't block the rule)."""
    from kafka_denormalization_spark.plans import explain_str

    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = table(spark, SF_DIR, "lineitem")
        orders = table(spark, SF_DIR, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = (
            li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
            .groupBy("o_orderpriority")
            .count()
        )
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom_filter_agg" in plan or "BloomFilter" in plan
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)


def test_funnel_reuses_user_partitioning(spark):
    """The single user_id repartition must be shared by all three stage
    aggregations at runtime (AQE ReuseExchange) — the naive per-stage
    formulation shuffles six times."""
    df = Q.q_funnel_counts(spark, SF_DIR)
    df.collect()
    final = df._jdf.queryExecution().executedPlan().toString()
    assert final.count("ReusedExchange") >= 2


def test_no_unjustified_scale_killers_anywhere(spark):
    """Sweep EVERY registered query plan for cartesian products and
    nested-loop joins. The allow-list is exhaustive and each entry is a
    documented design: brute-force correctness baselines (the LSH/ANN
    scale paths exist), tiny broadcast inner sides (needle lists, <=2^4
    centroid rows, 1-row scalar aggregates). Anything new that shows up
    here is a scale regression, not a style choice."""
    ALLOWED_BNLJ = {
        "contamination_scan",       # broadcast needle list (documented few-needle path)
        "contamination_scan_join",  # short-needle fallback only; probes are broadcast
        "ngram_jaccard_pairs",      # documented O(n^2) baseline for the LSH path
        "ann_cosine_topk",          # documented brute-force ANN baseline
        "ann_int8_topk",            # same brute-force topology over int8 codes
                                    # (the quantized serving baseline)
        "ann_ivf_topk",             # <=2^planes centroid rows, broadcast cross
        "idle_rich_customers",      # 1-row scalar aggregate cross join
        "temperature_sample",       # 1-row strata-totals aggregate broadcast
                                    # back over |languages| rows (replaced the
                                    # r04 unpartitioned-window formulation)
        "corpus_pipeline_v2",       # same temperature_fractions stage inside
                                    # the composed pipeline
        "corpus_pipeline_v3",       # same 1-row broadcasts via its embedded
                                    # lm_score + temperature stages
        "bm25_search",              # 1-row corpus-stats aggregate broadcast
                                    # back over the per-doc score expression
        "bm25_batch",               # same 1-row corpus-stats broadcast over
                                    # the (doc, term) contribution rows
        "dsir_weights",             # 1-row bucket-model totals broadcast
                                    # over the 64 bucket rows
        "dsir_sample",              # same (embeds dsir_weights)
        "kmeans_clusters",          # k-row centroid table broadcast cross
                                    # join, once per Lloyd round
        "semantic_dedup",           # same (embeds kmeans_clusters)
        "prototype_prune",          # same k-row centroid broadcasts
                                    # (embeds kmeans_clusters)
        "icp_packing",              # same (embeds kmeans_clusters for the
                                    # semantic stream assignment)
        "lm_perplexity",            # 1-row vocab-stats aggregate broadcast
                                    # over the bigram probability rows
        "ccnet_buckets",            # same lm_score 1-row broadcasts plus the
                                    # 1-row p25/p75 threshold aggregate
                                    # broadcast back over the scored rows
        "nb_quality",               # 1-row class-totals + 1-row default
                                    # log-odds aggregate broadcasts over the
                                    # vocab-bounded model rows
        "corpus_pipeline_v4",       # embeds lm_score + nb_quality + the
                                    # temperature stage — the same 1-row
                                    # aggregate broadcasts as v3/nb_quality
        "v4_funnel",                # same chain (per-stage 1-row counts
                                    # over the v4 stage frames)
        "curriculum_shards",        # embedded lm_score 1-row vocab-stats
                                    # broadcast (difficulty scoring)
        "bpe_merges",               # 1-row best-pair aggregate broadcast
                                    # over the vocab table, once per round
        "bpe_token_counts",         # same 1-row best-pair broadcasts (the
                                    # encode half replays every round's
                                    # apply, including the last)
        "corpus_to_shards",         # corpus_pipeline_v3's embedded lm_score
                                    # + temperature 1-row broadcasts, plus
                                    # the equi-partitioned shard window
        "epoch_mixture",            # 1-row corpus-total aggregate broadcast
                                    # over |languages| plan rows (epoch plan)
        "bpe_doc_tokens",           # 1-row best-pair broadcasts from the
                                    # embedded merge-training rounds (same
                                    # topology as bpe_merges)
        "token_fertility",          # same embedded merge-training 1-row
                                    # broadcasts (aggregates bpe_encode_docs)
        "bpe_sequence_packing",     # same (embeds bpe_doc_tokens' encoder)
        "domain_temperature_mix",   # temperature_fractions' 1-row
                                    # strata-totals broadcast, domain strata
                                    # (same stage as temperature_sample)
        "epoch_shards",             # epoch_mixture's 1-row corpus-total
                                    # broadcast (embeds epoch_mixture_sample)
        "unimax_mixture",           # 1-row k*-summary aggregate broadcast
                                    # back over |languages| plan rows
        "doremi_weights",           # embedded lm_score 1-row vocab-stats
                                    # broadcast + two 1-row domain-total /
                                    # normalizer broadcasts over |domains|
        "lm_burstiness",            # lm_score's 1-row vocab-stats broadcast
                                    # (shared _lm_scored_rows pass)
        "unimax_shards",            # unimax_plan's 1-row k*-summary
                                    # broadcast (embeds unimax_sample)
        "v4_attribution",           # the v4 chain's embedded lm/nb/mix
                                    # 1-row broadcasts (same frames as
                                    # corpus_pipeline_v4 / v4_funnel)
        "cluster_source_mix",       # k-row centroid broadcasts (embeds
                                    # kmeans_clusters, same as icp_packing)
        "zipf_fit_head",            # 1-row vocab-census aggregate broadcast
                                    # carried through the head-rank filter
        "source_divergence",        # 1-row corpus-total aggregate broadcast
                                    # over the (source, token) rows
        "collocations",             # 1-row unigram-total aggregate broadcast
                                    # into the PMI expression
        "copurchase_pagerank",      # 1-row node-census broadcast into each
                                    # power-iteration update
        "pareto_front",             # 1-row min/max bounds broadcast feeding
                                    # the bucket expression
        "z_order_layout",           # 1-row dim-bounds aggregate broadcast
                                    # feeding the exact-integer normalization
        "z_order_stats",            # same (embeds z_order_plan)
        "semantic_contamination",   # bounded eval-set broadcast scan — the
                                    # deliberate needle topology (same class
                                    # as contamination_scan); RP-LSH bucketed
                                    # variant is the documented escalation
        "mahalanobis_outliers",     # 1-row (mu[], var[]) moment-array
                                    # broadcast over the distance scan
        "embedding_pca",            # per-iteration 1-row norm broadcast
                                    # over the 64-row iterate (power
                                    # method; pagerank's census class)
        "embedding_debias",         # 1-row (mu[], pc1[]) model-array
                                    # broadcast over the scoring scan
                                    # (embeds embedding_pca's norms)
        "z_order_prune",            # 1-row bounds + 1-row shard-total
                                    # broadcasts over the bounded
                                    # (probes x shard-stats) report
    }
    from kafka_denormalization_spark.plans import explain_str

    offenders = {}
    for name, fn in Q.QUERIES.items():
        plan = explain_str(fn(spark, SF_DIR))
        if "CartesianProduct" in plan:
            offenders[name] = "CartesianProduct"
        elif "BroadcastNestedLoopJoin" in plan and name not in ALLOWED_BNLJ:
            offenders[name] = "BroadcastNestedLoopJoin"
    assert not offenders, offenders
