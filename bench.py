"""Benchmark harness — driver contract.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {name: sec}, "sf": ...}

Each query is fully materialized through the noop sink (executes the whole
plan on the executors; nothing is collected to the driver, so the number is
engine time, not transfer time).

Per-query timing is split into two attributable phases (round-6):
  build_s — calling the query builder: Python plan construction +
            analysis + any bounded eager work the builder performs
            (e.g. the LSH family materializes its memoized pair table
            at build time since round 5's eager_cleanup);
  exec_s  — the noop-sink materialization of the returned DataFrame.
The per-query value stays build+exec (the round-5 totals methodology, so
totals remain comparable). The stdout headline carries ONLY the total,
the query count, and the 10 slowest queries (the driver's tail capture
truncated both the round-6 and round-7 artifacts when the full per-query
map was inlined); the complete per-query timings + build/exec phase
split + any errors go to the committed BENCH_PHASES.json sidecar.

DRIFT SELF-DIAGNOSIS (VERDICT r09 #2): two consecutive rounds spent
judge+builder time re-attributing near-uniform total inflation to box
load (r8 +14.5%, r9 +11.0% — both pinned to environment, not plans).
The artifact now carries the evidence inline:
  - /proc/loadavg + process counts sampled at bench start and end
    (load_start / load_end in BENCH_PHASES.json; load1 start->end in
    the stdout headline);
  - the 5 slowest queries are re-run 2 more times (full build+exec)
    and their per-rep times + warm minimum recorded
    (phases[name]["reps_s"] / ["min_s"], headline "slowest_min_s").
    A loaded box shows high loadavg AND rep-to-rep spread; a real
    plan regression reproduces in the warm minimum.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from kafka_denormalization_spark.engine import get_spark
from kafka_denormalization_spark.queries import QUERIES

# Headline set: the reference-parity pipeline + the heaviest extension ops.
#
# SELECTION RULE (VERDICT r08 #7 — committed so the 130-of-189 coverage
# number is auditable): the headline benches every operator FAMILY through
# its heaviest registered representative; a registry query is EXCLUDED
# only when it is a lighter variant of an already-benched code path —
# same operator function, smaller plan (e.g. denorm_left_outer /
# denorm_right_outer / denorm_on_key ride the benched denorm_inner /
# denorm_full_outer join operator; ann_ivf_topk / ann_lsh_topk share
# ann_cosine_topk's scoring kernel behind cheaper pruning; cosine_dedup
# rides semantic_dedup's embedding join; v4_attribution is a projection
# of the benched corpus_pipeline_v4 stage frames; winnowing shares
# fingerprint's rolling-hash kernel; the TPC-H micro-shapes
# [top_supplier, min_cost_per_part, exists_late_ship, ...] are sub-second
# single-join/agg plans whose physics the benched Q1/Q3/Q5/Q12/Q14/Q18
# shapes already cover) — or it is metadata-sized by construction
# (quality_checks, profile_orders, multimodal_metadata, shard_stats,
# approx_stats, quantiles, value_histogram). Streaming twins never appear
# here (no finite materialization). The full excluded list is exactly
# `sorted(set(QUERIES) - set(BENCH_QUERIES))`; every excluded name still
# runs under tools/oracle_check.py each round (CORRECTNESS_FULL.json),
# so exclusion affects TIMING coverage only, never correctness coverage.
BENCH_QUERIES = [
    "denorm_inner",
    "denorm_nested",
    "denorm_full_outer",
    "two_hop_denorm",
    "latest_per_key",
    "dedup_exact",
    "agg_fanout_topk",
    "agg_pricing_summary",
    "minhash_lsh_dedup",
    "simhash_pairs",
    "ann_cosine_topk",
    "ann_int8_topk",
    "text_stats",
    "fingerprint",
    "window_running_total",
    "sessionize",
    "asof_join",
    "range_join",
    "rollup_timeseries",
    "near_dedup_docs",
    "near_dup_clusters",
    "corpus_pipeline",
    "quality_filter",
    "sequence_packing",
    "keyword_extraction",
    "contamination_scan_join",
    "bm25_search",
    "bm25_batch",
    "dsir_sample",
    "span_dedup",
    "kmeans_clusters",
    "semantic_dedup",
    "lm_perplexity",
    "containment_dedup",
    "funnel_counts",
    "shipping_priority",
    "local_supplier_volume",
    "volume_shipping",
    "returned_items",
    "waiting_suppliers",
    "sliding_window",
    "session_window",
    "big_orders",
    "stats_agg",
    # round-4 pipeline operators
    "temperature_sample",
    "epoch_mixture",
    "pii_scrub",
    "gram_novelty",
    "incremental_dedup",
    "incremental_near_dedup",
    "percentile_profile",
    "oov_rate",
    "corpus_pipeline_v2",
    "corpus_pipeline_v3",
    "corpus_to_shards",
    "corpus_report",
    "promo_revenue",
    "nation_year_revenue",
    "rolling_zscore",
    "leakage_safe_split",
    "packing_stats",
    "shard_plan",
    "bpe_merges",
    "quantize_embeddings",
    # round-6 operators
    "bpe_doc_tokens",
    "bpe_sequence_packing",
    "image_phash_dedup",
    "containment_clusters",
    # round-6 late + round-7 operators
    "gopher_repetition",
    "shard_plan_bytes",
    "domain_profile",
    "domain_filtered_corpus",
    "url_dedup",
    "domain_temperature_mix",
    "blocklist_filter",
    "epoch_shards",
    # round-8 operators
    "line_dedup",
    "ccnet_buckets",
    "nb_quality",
    "shard_manifest",
    "corpus_diff",
    "corpus_pipeline_v4",
    "token_fertility",
    "prototype_prune",
    "icp_packing",
    "v4_funnel",
    "curriculum_shards",
    # round-8 late additions (corpus audit + mixture design)
    "quality_signals",
    "ngram_diversity",
    "source_overlap",
    "unimax_mixture",
    "doremi_weights",
    "lm_burstiness",
    "unimax_shards",
    "signal_filter",
    "cluster_size_histogram",
    "cross_source_dups",
    "dedup_mixture_shift",
    "dedup_weights",
    "soft_dedup_sample",
    "cluster_source_mix",
    "zipf_fit",
    "zipf_fit_head",
    "contamination_scrub",
    "source_divergence",
    "collocations",
    "copurchase_pagerank",
    # round-9 operators (layout / privacy / skyline / embedding audits)
    "k_anonymity",
    "pareto_front",
    "z_order_layout",
    "z_order_stats",
    "semantic_contamination",
    "mahalanobis_outliers",
    "embedding_covariance",
    "embedding_pca",
    "audio_stats",
    "audio_fingerprint",
    "audio_dedup",
    "embedding_debias",
    "signal_correlations",
    "z_order_prune",
    # round-8 operators (grading-round numbering)
    "substring_dedup",
    "paired_dedup",
    "conv_turn_dedup",
    "conv_turn_near_dedup",
    "conv_stats",
    "conv_dedup",
    "paired_retention",
    "conv_pii_scrub",
    "conv_pair_contamination",
    # round-9 operators (grading-round numbering): conversation near-dedup +
    # response-side decontamination, preference-pair/RLHF family
    "conv_near_dedup",
    "conv_response_contamination",
    "pref_pairs",
    "pref_pair_dedup",
    "pref_length_bias",
    "lang_id_v2",
    "fuzzy_contamination",
    "doc_tokens_v2",
    # round-10 operators (grading-round numbering): video modality
    "video_stats",
    "video_frame_sample",
    "video_fingerprint",
    "video_dedup",
    "video_scenes",
    "video_keyframes",
    "audio_segments",
    # round-11 operators
    "video_keyframe_dedup",
    "image_resize",
    "multimodal_to_shards",
    "multimodal_funnel",
    "multimodal_attribution",
]


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def load_telemetry() -> dict:
    """One /proc sample: 1/5/15-min loadavg, runnable/total process
    counts, plus the cumulative CPU jiffies split (user+sys / idle /
    STEAL — r13: this box's drift source turned out to be hypervisor
    steal bursts of 10-60%, invisible in loadavg; the start/end delta
    lets a judge attribute inflation to the host without archaeology).
    Linux-only by construction (the bench box is Linux); returns {}
    elsewhere so the bench never fails on telemetry."""
    try:
        with open("/proc/loadavg") as fh:
            parts = fh.read().split()
        runnable, total_procs = parts[3].split("/")
        out = {
            "load1": float(parts[0]),
            "load5": float(parts[1]),
            "load15": float(parts[2]),
            "runnable": int(runnable),
            "procs": int(total_procs),
        }
        with open("/proc/stat") as fh:
            cpu = fh.readline().split()
        # jiffies: user, nice, system, idle, iowait, irq, softirq, steal
        out["cpu_busy_s"] = (int(cpu[1]) + int(cpu[2]) + int(cpu[3])) / 100.0
        out["cpu_idle_s"] = int(cpu[4]) / 100.0
        out["cpu_steal_s"] = int(cpu[8]) / 100.0
        return out
    except Exception:  # pragma: no cover - non-Linux fallback
        return {}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None
    spark = get_spark("bench")
    load_start = load_telemetry()

    # warm the JVM/codegen/broadcast machinery so the first timed query
    # doesn't absorb session startup
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    try:
        materialize(QUERIES["denorm_inner"](spark, sf_dir).limit(1000))
    except Exception:
        pass

    names = [n for n in BENCH_QUERIES if n in QUERIES]
    extra = [n for n in QUERIES if n not in names and n in _EXTRA_BENCH]
    timings: dict[str, float] = {}
    phases: dict[str, dict[str, float]] = {}
    errors: dict[str, str] = {}
    for name in names + extra:
        fn = QUERIES[name]
        # per-query fault isolation: one broken query must not zero out the
        # timings for the healthy ones — record its error and keep going
        try:
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            materialize(df)
            t2 = time.perf_counter()
            timings[name] = round(t2 - t0, 3)
            phases[name] = {
                "build_s": round(t1 - t0, 3),
                "exec_s": round(t2 - t1, 3),
            }
        except Exception as exc:  # noqa: BLE001
            errors[name] = f"{type(exc).__name__}: {exc}"[:500]

    # Re-run selected queries 2 more times, full build+exec per rep.
    # Rep 1 is the cold number already in `timings`; reps 2-3 are warm
    # (session memos / JIT / page cache populated), so their MINIMUM is a
    # stable round-over-round floor: a loaded box shows rep-to-rep spread
    # while a genuine plan regression reproduces in the warm minimum.
    # Selection (VERDICT r10 #6 + r11 #7): the 15 slowest by cold time
    # PLUS any query whose time moved >±30% against the previous
    # round's committed sidecar (this file pre-run IS last round's — it
    # is overwritten at the end of this function), so a per-query
    # regression like r10's v4_funnel carries its own warm minimum in
    # the artifact instead of needing a git-archaeology session, and
    # every expensive query carries a warm floor (r11 #7: names like
    # video_keyframe_dedup / corpus_pipeline_v4 previously got min_s
    # only when they happened to trip the slowest-5 or mover rules).
    # The stdout headline still reports only the 5 slowest minima (the
    # driver captures stdout's tail — keep the line under ~1 KB; the
    # full reps live in the sidecar). Movers under 0.5 s either way are
    # noise, not regressions; the mover list is capped at 10 by |delta|
    # with the dropped names RECORDED in the sidecar (no silent caps).
    phases_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_PHASES.json"
    )
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    # VERDICT r12 #4: a multi-config driver run (32c then 8c) used to
    # overwrite the one sidecar, so mover detection compared this run's
    # times against a DIFFERENT core count's priors and flagged spurious
    # movers. Priors now come from the same-cpus sidecar only (32c owns
    # BENCH_PHASES.json, other counts own BENCH_PHASES_c{N}.json), with
    # a cpus-field cross-check for pre-r13 sidecars (all 32c except the
    # final 8c driver pass).
    prior_path = (
        phases_path if cpus == 32
        else phases_path.replace(".json", f"_c{cpus}.json")
    )
    prior_timings: dict[str, float] = {}
    try:
        with open(prior_path) as fh:
            prior = json.load(fh)
        if prior.get("cpus", cpus) == cpus:
            prior_timings = prior.get("queries", {}) or {}
    except Exception:  # first run / missing sidecar
        prior_timings = {}
    slow15 = sorted(timings.items(), key=lambda kv: kv[1], reverse=True)[:15]
    slow5 = slow15[:5]
    slow_names = [n for n, _ in slow15]
    movers = []
    for name, t in timings.items():
        p = prior_timings.get(name)
        if not p or name in slow_names:
            continue
        if max(t, p) >= 0.5 and (t > 1.3 * p or t < 0.7 * p):
            movers.append((abs(t - p), name))
    movers.sort(reverse=True)
    moved_names = [n for _, n in movers[:10]]
    movers_dropped = [n for _, n in movers[10:]]
    for name in slow_names + moved_names:
        reps = [timings[name]]
        try:
            for _rep in range(2):
                t0 = time.perf_counter()
                materialize(QUERIES[name](spark, sf_dir))
                reps.append(round(time.perf_counter() - t0, 3))
        except Exception as exc:  # noqa: BLE001
            errors[f"{name}#rep"] = f"{type(exc).__name__}: {exc}"[:200]
        phases[name]["reps_s"] = reps
        phases[name]["min_s"] = min(reps)
        if name in moved_names:
            phases[name]["prior_s"] = prior_timings[name]
    load_end = load_telemetry()

    total = round(sum(timings.values()), 3)
    # The driver captures only the TAIL of stdout; the round-7 headline
    # (119 inline per-query entries) outgrew that window and the artifact
    # recorded `parsed: null` (VERDICT r07 "What's wrong" #1). Keep the
    # stdout line under ~1 KB: total + count + the 10 slowest queries.
    # The FULL per-query map (timings + build/exec phase split) lives in
    # the committed BENCH_PHASES.json sidecar.
    slowest = dict(
        sorted(timings.items(), key=lambda kv: kv[1], reverse=True)[:10]
    )
    out = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "n_queries": len(timings),
        "queries": slowest,
        "slowest_min_s": {n: phases[n]["min_s"] for n, _ in slow5},
        "moved_min_s": {
            n: [prior_timings[n], timings[n], phases[n]["min_s"]]
            for n in moved_names
        },
        "load1": [load_start.get("load1"), load_end.get("load1")],
        "procs": [load_start.get("procs"), load_end.get("procs")],
        "sf": sf,
    }
    if errors:
        # a failing query is dropped from `timings`, so the total covers
        # fewer queries than a healthy run — flag it so totals are never
        # compared across runs with different coverage
        out["valid"] = False
        out["n_errors"] = len(errors)
    sidecar = {
        "sf": sf,
        "cpus": cpus,
        "total_s": total,
        "load_start": load_start,
        "load_end": load_end,
        "queries": timings,
        "phases": phases,
        "movers_dropped_from_reps": movers_dropped,
        "errors": errors,
    }
    # VERDICT r12 #4: version the sidecar by core count. The canonical
    # 32c run owns BENCH_PHASES.json (the round-over-round comparison
    # artifact); every other count writes BENCH_PHASES_c{N}.json, so a
    # 32c+8c driver double-run leaves BOTH per-query maps on disk
    # instead of the second overwriting the first.
    if cpus == 32:
        with open(phases_path, "w") as fh:
            json.dump(sidecar, fh, indent=1)
    else:
        with open(phases_path.replace(".json", f"_c{cpus}.json"), "w") as fh:
            json.dump(sidecar, fh, indent=1)
    print(json.dumps(out), flush=True)


_EXTRA_BENCH: set[str] = set()  # extension queries opt in here as they land

if __name__ == "__main__":
    main()
