"""Benchmark harness: headline pipelines over $GRAFT_SF_DIR (default
/root/testdata/sf0.1) at $RAY_GRAFT_CPUS CPUs (default 32).

Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "num_cpus": N,
   "kg_docs_per_sec": ..., "synthetic_docs_per_sec": ...}

--scaling: runs the synthetic-corpus KG construction headline twice in
fresh processes (8 and 32 CPUs; N and 4N) on the same input and prints
throughputs + scaling efficiency (north-rule evidence, BASELINE.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
SYNTH_DOCS = int(os.environ.get("GRAFT_SYNTH_DOCS", "20000"))
# --scaling needs enough work to amortize fixed costs (shuffle round
# latency, materialize barriers) at 32 CPUs; after the round-2 per-core
# speedups the knee moved out — 1.6M docs needed where 800k sufficed.
# The sandbox host also throttles under sustained load (its raw-CPU 4x
# delivery varies 0.48-1.04 between windows), so the JSON embeds a
# raw-CPU control; normalized_efficiency = pipeline / host is the
# robust metric.
SCALING_DOCS = int(os.environ.get("GRAFT_SCALING_DOCS", "3200000"))

BENCH_QUERIES = [
    "kg_entity_merge",
    "kg_edge_merge",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "similarity_topk",
    "text_token_stats",
    "events_hourly_agg",
    "agg_pricing_summary",
    "join_revenue_by_segment",
    # round-2 operator family (kept after the round-1 list so per-query
    # comparisons against BENCH_r01 stay aligned)
    "events_sliding_agg",
    "events_value_quantiles",
    "topk_customers_per_nation",
    "events_asof_join",
    # round-3 reproducible-selection family (appended to keep per-query
    # comparisons against BENCH_r02 aligned)
    "split_documents",
    "sample_events_per_type",
    "pack_documents",
    "decontaminate_documents",
    "upsample_documents_by_lang",
    "training_data_prep",
    # round-3b window/corpus-stat families (appended to keep per-query
    # comparisons against earlier BENCH_r03 runs aligned)
    "events_range_join",
    "events_percent_rank",
    "events_running_total",
    "events_user_gaps",
    "text_vocabulary",
    "text_term_pmi",
    "documents_above_p90",
    "events_ntile",
    "documents_length_norm",
    "dedup_incremental",
    "events_funnel",
    "events_retention",
    "events_lag_value",
    "events_enumerate",
    "documents_rollup",
    "documents_cube",
    "events_moving_avg",
    "events_first_last_value",
    "documents_grouping_sets",
    "events_pivot_type",
    "part_fuzzy_name_pairs",
    "bloom_semijoin_orders",
    "events_mode_value",
    "events_type_sequence",
    "events_value_histogram",
    "except_event_users",
    "kg_pagerank",
    "events_frequent_types",
    "events_cume_dist",
    "weighted_sample_documents",
    "kg_triangles",
    "events_hour_value_corr",
    "events_unpivot_counts",
    "events_json_extract",
    "embeddings_label_centroid",
    "events_latest_per_user",
    "events_value_share",
    "cross_region_nation",
    "documents_redact",
    "events_type_transitions",
    "stratified_sample_documents",
    "documents_kfold",
    "events_nth_value",
    # round-5 additions (appended to keep per-query comparisons against
    # BENCH_r04 aligned)
    "tpch_shipping_priority",
    "tpch_returned_customers",
    "events_hour_value_regression",
    "events_trailing_hour",
    "tpch_order_priority",
    "tpch_asia_volume",
    "similarity_topk_lsh",
    "events_value_quantiles_cont",
    "tpch_revenue_forecast",
    "events_disjunctive_scan",
    "tpch_ship_priority_lines",
    "tpch_customer_order_counts",
    "tpch_promo_revenue",
    "tpch_small_quantity_revenue",
    "tpch_large_orders",
    "tpch_idle_rich_customers",
    "embeddings_kmeans_sizes",
    "text_inverted_index",
    "events_type_value_stddev",
    "text_bigram_counts",
    "documents_source_entropy",
    "documents_lang_source_chi2",
    "text_tfidf_top_terms",
    "kg_media_features",
    "graph_bfs_hops",
    "events_hour_groups_frame",
    "events_value_mad",
    "events_dense_topk",
    "events_winsorized_mean",
    "events_user_gini",
    "referential_integrity_audit",
    "events_column_profile",
    "tpch_nation_trade_pairs",
    "events_hourly_dense",
    "documents_k_anonymity",
    "events_value_psi",
    "tpch_top_supplier",
    "tpch_market_share",
    "events_daily_new_users",
    "events_type_trigrams",
    "events_weighted_median",
    "contamination_provenance",
    "events_wow_change",
    "events_session_sizes",
    # round-5 coda (appended to keep earlier per-query comparisons aligned)
    "tpch_waiting_suppliers",
    "part_brand_copurchase",
    "events_value_scd",
    "part_price_size_skyline",
    "events_peak_concurrency",
    "events_time_weighted_value",
    "events_session_attribution",
    "dedup_group_representatives",
    # round-5 coda 2 (appended; earlier per-query comparisons stay aligned)
    "tpch_daily_order_ship_recon",
    "events_zscore_outliers",
    "documents_number_extract",
    "events_rolling_median",
    "events_quantile_sketch_bound",
    "events_trailing_distinct_users",
    "documents_union_by_name",
    "events_equidepth_histogram",
    "events_dau_wau",
    "tpch_reorder_intervals",
    "customer_name_onechar_variants",
    "tpch_order_total_audit",
    "events_user_skew_profile",
    "tpch_exact_median_charge",
    "events_click_view_intersect_all",
    "events_click_view_except_all",
    "events_linear_attribution",
    "events_longest_streak",
    "events_signup_to_purchase_latency",
    "events_top_types_with_other",
    "tpch_benford_digits",
    "join_revenue_hhi_by_nation",
    "tpch_rfm_segments",
    "tpch_pareto_customers",
    "events_session_conversion",
    "dedup_rate_by_source",
    "orders_priority_drift",
    "tpch_order_to_ship_latency",
    "tpch_nation_share_of_region",
    "events_purchase_by_prior_type",
    "kg_local_search_context",
    "kg_global_search_context",
    # round-5 coda 3: corpus-quality family (appended; earlier
    # per-query comparisons stay aligned)
    "documents_repetition_stats",
    "documents_unigram_logprob",
    "dedup_duplicated_spans",
    # round-5 coda 4: global exact set-similarity self-join (PPJoin)
    "dedup_prefix_filter",
    "dedup_prefix_filter_groups",
    "similarity_pq_recall",
    "events_zorder_blocks",
    "events_type_cms_bound",
    "similarity_ivfpq_recall",
    # round-5 coda 6: keyword retrieval family (appended; earlier
    # per-query comparisons stay aligned)
    "text_bm25_topk",
    "hybrid_rrf_topk",
    # round-5 coda 7: iterative graph + A/B-stat family
    "tpch_nation_sssp",
    "trade_graph_kcore",
    "events_welch_ttest",
    "documents_consistent_sample",
    "customer_name_edit1_pairs",
    "events_user_consistent_sample",
    # round-5 coda 8: link-prediction / mutual-NN / record-linkage /
    # drift-stat family (appended; earlier comparisons stay aligned)
    "trade_graph_link_prediction",
    "embeddings_mutual_nn",
    "embeddings_mutual_nn_ivf",
    "events_exploration_length",
    "trade_graph_hits",
    "customer_name_jw_pairs",
    "customer_name_lev2_pairs",
    "events_chi2_dow",
    "events_user_type_entropy",
    "kg_clustering_coefficient",
    "kg_ktruss",
    # round-5 coda 9: propagation / graph-metric / mining family
    # (appended; earlier per-query comparisons stay aligned)
    "kg_personalized_pagerank",
    "kg_harmonic_centrality",
    "kg_label_spread",
    "events_markov_stationary",
    "documents_fd_violations",
    "embeddings_silhouette",
    "kg_local_bridges",
    "kg_rich_club",
    "kg_degree_assortativity",
    "text_rake_keywords",
    "events_association_rules",
    "embeddings_centroid_distances",
    "documents_vocab_growth",
    "events_ks_statistic",
    "kg_triangles_doulion",
    "events_anova_f",
    "events_runs_test",
    "events_cusum_drift",
    "tpch_cohort_ltv",
    "kg_hash_walks",
    "similarity_range_search",
    "documents_l_diversity",
    "events_holt_forecast",
    "events_jackknife_mean_se",
    "trade_graph_luby_mis",
    "tpch_duplicate_invoices",
    "tpch_customer_migration",
]


def consume(result) -> int:
    """Materialize a result without holding it (stream to count)."""
    import pandas as pd
    import pyarrow as pa
    import ray.data

    if isinstance(result, ray.data.Dataset):
        return result.count()
    if isinstance(result, (pd.DataFrame, pa.Table)):
        return len(result)
    return 0


def run_bench() -> dict:
    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from knowledge_graph_ray.pipelines import queries as Q

    # warm the page cache (untimed) so we measure compute + shuffle
    ray.data.read_parquet(f"{SF_DIR}/documents.parquet").count()
    ray.data.read_parquet(f"{SF_DIR}/lineitem.parquet").count()

    # warm the worker pool (untimed): the first tasks on each worker
    # process pay the package + pandas/polars imports (~2s across the
    # pool) and the clustering tasks the networkx import — steady-state
    # throughput is the metric (a 100TB run amortizes spin-up to zero).
    # A tiny full pipeline touches every UDF module the timed runs use.
    from knowledge_graph_ray.config import PipelineConfig as _PC
    from knowledge_graph_ray.corpus import read_corpus as _rc
    from knowledge_graph_ray.pipelines.build import build_knowledge_graph as _bkg

    _warm = _bkg(_rc(1500, seed=6969, shard_size=64),
                 _PC(chunk_size=64, chunk_overlap=16,
                     extract_use_actor_pool=False))
    _warm.entities.materialize()

    timings: dict[str, float] = {}

    # headline 1: full KG construction over the sf documents table
    t0 = time.time()
    n_docs = ray.data.read_parquet(f"{SF_DIR}/documents.parquet").count()
    ents = Q.kg_pipeline_entities(SF_DIR)
    consume(ents)
    kg_sec = time.time() - t0
    timings["kg_pipeline_entities"] = round(kg_sec, 3)

    # headline 2: synthetic interleaved corpus (span-aware chunking +
    # extraction + canonicalization at volume — the scaling workload)
    from knowledge_graph_ray.config import PipelineConfig
    from knowledge_graph_ray.corpus import read_corpus
    from knowledge_graph_ray.pipelines.build import build_graph

    t0 = time.time()
    # FIXED shard size, not fixed shard count: shards must stay
    # bounded-memory as the corpus grows (at a fixed 128 shards the
    # 32-cpu leg degraded super-linearly past ~2M docs — concurrent
    # per-task memory traffic saturates the node)
    docs = read_corpus(SYNTH_DOCS, seed=6969,
                       shard_size=max(64, min(12_500, SYNTH_DOCS // 128)))
    cfg = PipelineConfig(
        chunk_size=256,
        chunk_overlap=32,
        extract_use_actor_pool=False,
        max_descriptions_per_key=32,
        max_sources_per_key=256,
        # unfused here: at 20k docs the mention barrier is tiny and the
        # two-DAG overlap wins (~2.4s vs ~4s fused); the fused path's
        # barrier saving only dominates at volume — the 1.6M scaling
        # worker and the sf0.1 flagship run fused (BASELINE.md round-3b)
    )
    tables = build_graph(docs, cfg)
    from knowledge_graph_ray.functions.poolcache import materialize_concurrently

    materialize_concurrently([tables.entities, tables.relationships])
    synth_sec = time.time() - t0
    timings["kg_synthetic_corpus"] = round(synth_sec, 3)

    for name in BENCH_QUERIES:
        fn = Q.QUERIES[name]
        t0 = time.time()
        consume(fn(SF_DIR))
        timings[name] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    result = {
        "metric": "kg_construct_bench_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "kg_docs_per_sec": round(n_docs / kg_sec, 1),
        "synthetic_docs_per_sec": round(SYNTH_DOCS / synth_sec, 1),
        # host control: this sandbox throttles 2-4x between windows —
        # compare totals across rounds via value * raw_cpu_tasks_per_sec
        # (work per raw-CPU unit), not wall-clock alone
        "raw_cpu_tasks_per_sec": round(_calibrate_raw_cpu(NUM_CPUS), 2),
    }
    ray.shutdown()
    return result


def run_scaling() -> dict:
    """Same synthetic KG job at 8 and 32 CPUs in fresh processes."""

    def one(ncpu: int) -> dict:
        env = dict(
            os.environ,
            RAY_GRAFT_CPUS=str(ncpu),
            GRAFT_SYNTH_DOCS=str(SCALING_DOCS),
        )
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--scaling-worker"],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = one(8), one(32)
    tput_lo = lo["docs_per_sec"]
    tput_hi = hi["docs_per_sec"]
    eff = (tput_hi / tput_lo) / (32 / 8)
    # control: what 4x scaling the throttled sandbox host actually
    # delivers for pure CPU work measured in the same sessions
    raw_eff = (hi["raw_cpu_tasks_per_sec"] / lo["raw_cpu_tasks_per_sec"]) / (32 / 8)
    return {
        "metric": "kg_construct_scaling",
        "unit": "docs_per_sec",
        "synthetic_docs": SCALING_DOCS,
        "cpus_lo": 8,
        "cpus_hi": 32,
        "docs_per_sec_8": tput_lo,
        "docs_per_sec_32": tput_hi,
        "sec_8": lo["sec"],
        "sec_32": hi["sec"],
        "scaling_efficiency": round(eff, 3),
        "host_raw_cpu_efficiency": round(raw_eff, 3),
        "normalized_efficiency": round(eff / raw_eff, 3) if raw_eff else None,
    }


def _calibrate_raw_cpu(ncpu: int) -> float:
    """Raw CPU throughput of this host at ncpu parallel ray tasks
    (tasks/sec).  The sandbox host throttles under sustained load, so the
    pipeline's scaling efficiency is reported alongside this control."""
    import ray

    @ray.remote
    def burn(n: int) -> int:
        x = 0
        for i in range(n):
            x += i * i
        return x

    n_tasks = ncpu * 6
    t0 = time.time()
    ray.get([burn.remote(4_000_000) for _ in range(n_tasks)])
    return n_tasks / (time.time() - t0)


def run_scaling_worker() -> dict:
    """One fresh-process synthetic KG construction run at $RAY_GRAFT_CPUS."""
    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        logging_level="ERROR",
    )
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from knowledge_graph_ray.config import PipelineConfig
    from knowledge_graph_ray.corpus import read_corpus
    from knowledge_graph_ray.pipelines.build import build_graph

    # warm-up (untimed): pay worker startup + package imports once, on
    # EVERY worker — shard_size sized so warm tasks >= 2x the worker
    # count (a 4-shard warm-up left 28 of 32 workers importing
    # pandas/polars inside the timed leg)
    warm_docs = max(2000, NUM_CPUS * 64)
    warm = build_graph(
        read_corpus(warm_docs, seed=6969,
                    shard_size=max(8, warm_docs // (NUM_CPUS * 2))),
        PipelineConfig(chunk_size=256, chunk_overlap=32,
                       extract_use_actor_pool=False,
                       max_descriptions_per_key=32, max_sources_per_key=256,
                       fused_canonicalize=True),
    )
    consume(warm.entities)

    t0 = time.time()
    # FIXED shard size, not fixed shard count: shards must stay
    # bounded-memory as the corpus grows (at a fixed 128 shards the
    # 32-cpu leg degraded super-linearly past ~2M docs — concurrent
    # per-task memory traffic saturates the node)
    docs = read_corpus(SYNTH_DOCS, seed=6969,
                       shard_size=max(64, min(12_500, SYNTH_DOCS // 128)))
    cfg = PipelineConfig(
        chunk_size=256,
        chunk_overlap=32,
        extract_use_actor_pool=False,
        max_descriptions_per_key=32,
        max_sources_per_key=256,
        # fused G1+G2: no mention materialization barrier — the
        # barrier was the non-scaling component (BASELINE.md round-3b)
        fused_canonicalize=True,
    )
    tables = build_graph(docs, cfg)
    from knowledge_graph_ray.functions.poolcache import materialize_concurrently

    ents, rels = materialize_concurrently([tables.entities, tables.relationships])
    n_ents, n_rels = ents.count(), rels.count()
    sec = time.time() - t0
    calib = _calibrate_raw_cpu(NUM_CPUS)
    out = {
        "sec": round(sec, 3),
        "docs_per_sec": round(SYNTH_DOCS / sec, 1),
        "num_cpus": NUM_CPUS,
        "entities": n_ents,
        "relationships": n_rels,
        "raw_cpu_tasks_per_sec": round(calib, 2),
    }
    ray.shutdown()
    return out


def _persist(result: dict, suffix: str) -> None:
    """Write the parsed result next to the repo so the artifact survives
    stdout tail truncation (BENCH_r04.json arrived with parsed:null and a
    mid-JSON tail; the driver only captures stdout)."""
    try:
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            f"bench_results{suffix}.json")
        with open(path, "w") as f:
            json.dump(result, f, indent=1, sort_keys=True)
    except OSError:
        pass


if __name__ == "__main__":
    if "--scaling-worker" in sys.argv:
        print(json.dumps(run_scaling_worker()))
    elif "--scaling" in sys.argv:
        res = run_scaling()
        _persist(res, "_scaling")
        print(json.dumps(res))
    else:
        res = run_bench()
        _persist(res, "")
        print(json.dumps(res))
