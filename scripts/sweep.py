#!/usr/bin/env python3
"""Three-decade durability sweep driver (driver-side tooling, like
check.py — NOT part of the Spark library).

Runs graft.Bench in family-sized chunks (one JVM per chunk, so one
family's accumulated state can't distort another's numbers) against each
scale decade, and accumulates every chunk's bench_detail.json into a
single results file for the round notes:

    {"<sfdir>": {"queries": {name: sec}, "errors": {...},
                 "telemetry": {...}}, ...}

Methodology knobs match docs/ROUND15_NOTES.md §7: local[32], GC_EVERY=1
at the big corpora, 8/48/100 GiB heaps for sf0.1 / 100× / 1000×,
single-shot at the big corpora (reps via --reps for the sf0.1 isolated
baseline).

Usage:
  python3 scripts/sweep.py SFDIR [--reps N] [--heap 48g] [--out FILE]
                                 [--chunks name,name | --queries q1,q2]
"""
import json, os, subprocess, sys, glob, tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ADD_OPENS = [f"--add-opens={p}=ALL-UNNAMED" for p in [
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io", "java.base/java.net",
    "java.base/java.nio", "java.base/java.util",
    "java.base/java.util.concurrent", "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar"]]

# The r18 tranche: every registry query without three-decade evidence in
# docs/ROUND14..17 notes, grouped by family (one JVM per group).
CHUNKS = {
    "relational1": [
        "anti_customers_no_urgent", "bloom_pruned_join", "cross_join_grid",
        "cube_orders", "distinct_customers", "distinct_flag_status",
        "except_urgent_not_low", "filter_project_pushdown",
        "full_outer_nation_balance", "grouping_sets_margins",
        "intersect_nations", "join_priority_shipping", "null_handling"],
    "relational2": [
        "null_semantics_probe", "pivot_status_priority",
        "promo_revenue_ratio", "rename_date_format", "rollup_revenue",
        "semi_customers_with_orders", "sql_correlated_subquery",
        "string_functions", "union_all_slices", "unpivot_pricing_measures",
        "missing_dates_relational", "array_higher_order", "json_props_agg",
        "map_column_ops"],
    "tpch": ["q10_returned_items", "q15_top_supplier", "q16_parts_supplier",
             "q20_promotion_suppliers"],
    "topk_window": [
        "top25_orders_global", "topk_orders_bounded_agg",
        "topk_orders_per_customer", "window_lead_nth", "window_range_7d",
        "window_rank_family"],
    "scale_patterns": [
        "global_shuffle_shards", "salted_skew_agg", "skew_split_join",
        "range_join_bands", "interval_join_clicks", "zorder_layout_stats",
        "pipeline_zone_map_pruning", "pipeline_compaction_plan",
        "pipeline_manifest_diff"],
    # r19 bucketed-layout family: join_priority_shipping rides along as the
    # shuffling twin so the co-located ratio is a within-chunk comparison
    "bucketed": ["bucketed_colocated_join", "bucketed_items_histogram",
                 "bucket_pruned_lookup", "join_priority_shipping"],
    "asof": ["asof_custom_strategy", "asof_tolerance_close"],
    "dedup": ["dedup_exact", "dedup_normalized_tokens", "dedup_simhash",
              "dedup_unicode_nfc"],
    "ann": ["ann_ivf_label", "ann_ivf_pq_recall", "ann_lsh_buckets",
            "ann_lsh_recall", "ann_pq_recall", "ann_rp_recall",
            "ann_rp_rerank", "ann_sq8_rerank"],
    "media": ["media_cdc_shared", "media_features_mappartitions",
              "media_frame_sample", "media_metadata", "media_phash",
              "media_resize_stride", "media_scene_cuts"],
    "text": ["text_bigram_quality", "text_boilerplate_removal",
             "text_fingerprints", "text_pii_mask", "text_simpson_diversity",
             "chunk_documents_stride", "context_length_buckets",
             "pack_sequences_4k", "search_phrase_rank"],
    "vocab": ["vocab_bpe_apply", "vocab_bpe_compression_curve",
              "vocab_bpe_first_merge", "vocab_bpe_merges",
              "vocab_coverage_curve", "vocab_oov_rate"],
    "stats1": ["stats_approx_percentiles", "stats_autocorr_lag",
               "stats_benford_digits", "stats_chi2_independence",
               "stats_cms_heavyhitters", "stats_cusum_changepoint",
               "stats_hll_mergeable", "stats_kll_exact_anchor",
               "stats_kll_quantiles", "stats_ks_binned"],
    "stats2": ["stats_mann_whitney", "stats_mode_custom_agg",
               "stats_overlap_exact", "stats_pareto_share",
               "stats_poisson_bootstrap", "stats_quantiles_histogram",
               "stats_runs_test", "stats_theil_sen_trend",
               "stats_trimmed_mean", "stats_welch_ttest",
               "approx_count_distinct"],
    "timeseries": ["ts_bollinger_breakout", "ts_ewma10", "ts_max_drawdown",
                   "ts_pattern_vbottom", "ts_resample_ffill",
                   "ts_rolling_volatility", "ts_rsi14",
                   "ts_seasonal_decompose"],
    "dq": ["dq_anomaly_mad", "dq_anomaly_seasonal", "dq_anomaly_zscore",
           "dq_drift_profile", "dq_expectations", "dq_freshness_lag"],
    "sampling": ["mix_sampling_rates", "sample_bernoulli_orders",
                 "sample_hash_split", "sample_neyman_allocation",
                 "sample_priority_events", "sample_priority_pps",
                 "sample_systematic_pps", "sample_temperature_mix"],
    "curriculum": ["curriculum_decile_buckets", "curriculum_pacing_schedule",
                   "kmeans_assign_step", "kmeans_update_step"],
    "cdc": ["cdc_snapshot_diff", "incremental_snapshot_agg",
            "mv_topk_maintenance", "scd2_priority_history"],
    "graph": ["graph_bfs_hops", "graph_closeness_centrality"],
}


def run_chunk(sfdir, queries, heap, reps, cpus, classes):
    cp = f"{classes}:" + ":".join(glob.glob("/opt/spark/jars/*.jar"))
    env = dict(os.environ,
               SPARK_GRAFT_SF_DIR=sfdir,
               SPARK_GRAFT_CPUS=str(cpus),
               SPARK_GRAFT_GC_EVERY="1",
               SPARK_GRAFT_BENCH_ONLY=",".join(queries))
    if reps > 1:
        env["SPARK_GRAFT_BENCH_REPS"] = str(reps)
    with tempfile.TemporaryDirectory() as cwd:
        cmd = (["java"] + ADD_OPENS +
               [f"-Xmx{heap}", "-Dspark.ui.enabled=false",
                "-cp", cp, "graft.Bench"])
        r = subprocess.run(cmd, cwd=cwd, env=env, capture_output=True,
                           text=True, timeout=3600)
        detail_path = os.path.join(cwd, "bench_detail.json")
        if r.returncode != 0 or not os.path.exists(detail_path):
            return None, r.stderr[-3000:]
        detail = json.load(open(detail_path))
        return detail, r.stderr[-3000:] if detail.get("errors") else ""


def main():
    sfdir = sys.argv[1]
    if not os.path.isdir(sfdir):  # e.g. a stray --help burning a JVM run
        sys.exit(f"sweep: SFDIR {sfdir!r} is not a directory\n{__doc__}")
    args = sys.argv[2:]

    def opt(name, default):
        return args[args.index(name) + 1] if name in args else default
    reps = int(opt("--reps", "1"))
    heap = opt("--heap", "48g")
    out = opt("--out", f"{REPO}/sweep_results.json")
    cpus = int(opt("--cpus", "32"))
    # --classes: measure a SNAPSHOT of compiled classes, so sbt compiles in
    # the working tree can't silently change code under a running sweep
    classes = opt("--classes", f"{REPO}/target/scala-2.13/classes")
    chunks = dict(CHUNKS)
    if "--chunks" in args:
        keep = set(opt("--chunks", "").split(","))
        chunks = {k: v for k, v in chunks.items() if k in keep}
    if "--queries" in args:
        chunks = {"adhoc": opt("--queries", "").split(",")}

    acc = json.load(open(out)) if os.path.exists(out) else {}
    slot = acc.setdefault(sfdir, {"queries": {}, "errors": {},
                                  "telemetry": {}})
    for name, queries in chunks.items():
        detail, err = run_chunk(sfdir, queries, heap, reps, cpus, classes)
        if detail is None:
            print(f"[sweep] {name}: CHUNK FAILED\n{err}", flush=True)
            slot["errors"][name] = "chunk_failed"
            continue
        slot["queries"].update(detail.get("queries", {}))
        slot["errors"].update(detail.get("errors", {}))
        slot["telemetry"].update(detail.get("telemetry", {}))
        worst = sorted(detail.get("queries", {}).items(),
                       key=lambda kv: -kv[1])[:3]
        print(f"[sweep] {name}: {len(detail.get('queries', {}))} queries, "
              f"total {sum(detail.get('queries', {}).values()):.1f}s, "
              f"worst {worst}"
              + (f" ERRORS={detail['errors']}" if detail.get('errors')
                 else ""), flush=True)
        if err:
            print(err[-1500:], flush=True)
        json.dump(acc, open(out, "w"), indent=1, sort_keys=True)
    json.dump(acc, open(out, "w"), indent=1, sort_keys=True)
    n = len(slot["queries"])
    print(f"[sweep] DONE {sfdir}: {n} queries, "
          f"{len(slot['errors'])} errors -> {out}", flush=True)


if __name__ == "__main__":
    main()
