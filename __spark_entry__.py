"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()`` / ``oracle_sql()`` expose every operator registered in
``uforwarder_spark.registry`` (one per SURVEY.md §2 row).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

import uforwarder_spark  # noqa: F401  (import registers all operators)
from uforwarder_spark.registry import ORACLES, QUERIES

# The driver's correctness report covers the first 50 keys of queries().
# Order the dict so that window holds (a) keys that are new or whose
# implementation changed since their last driver check, then (b) the
# keys with the OLDEST driver evidence. Keys beyond the window stay
# verified by tests/test_oracle_parity.py — the identical row-count +
# schema + value-hash comparison — at sf0.001 and sf0.01.
# Round-7 window (round-6 verdict, next-round item 2): rotate onto the
# now-oldest evidence. Slot arithmetic (counted, not estimated):
# 37 new/changed-this-round + 13 r03 leftovers + 0 r04 cohort
# = 50 exactly (embedding_centroid_outliers and incremental_dedup, the
# last two r03 leftovers, slide just past the line — new/never-
# driver-checked keys outrank old-evidence re-checks per the window
# rule; both keep their r03 driver rows + both-SF pytest parity, and
# D94/E48 newly exercise incremental_dedup's kernels in tests.
# Then tpch_q1_pricing_summary,
# tpch_q10_returned_revenue, tpch_q14_promo_revenue,
# tpch_q18_large_orders,
# tpch_q15_top_supplier, tpch_q7_volume_shipping,
# tpch_q8_market_share, tpch_q13_customer_distribution,
# tpch_q17_small_quantity, tpch_q9_product_profit,
# tpch_q22_idle_balances,
# tpch_q19_disjunctive_filter, funnel_conversion,
# retention_cohorts, asof_join_purchases, range_join_error_impact,
# cube_revenue, pivot_priority_revenue, fetcher_throughput,
# resq_routing, aimd_inflight_limiter and head_blocking_cancel slide
# to the overflow head, keeping their r04 rows + both-SF pytest
# parity).
_KEY_PRIORITY = [
    # -- (a) new or changed this round (37): D72-D96 are new; B22/E30
    #    gained the zero-span guard; D71 the decimal expected-rate sum;
    #    D31/D42/D62 the clamped shared reconstruct expr; D67 the
    #    AQE-decided spine join; D68 the fused encode+ADC map; D70 the
    #    split hash/diff kernel; D40/D41/D59 the pass-through assign +
    #    factored M-step; D7 moved to the shared knn_band_frame kernel
    #    and D76/D77 to the normalized-dot score --
    "bigram_perplexity", "contrastive_triplets", "incr_triplet_mining",
    "markov_transitions", "cusum_changepoints", "doremi_weights",
    "split_leakage_audit", "audio_silence_segments", "kcenter_coreset",
    "hybrid_rrf_retrieval", "heaps_vocab_growth", "hybrid_rrf_multiquery",
    "pmi_collocations", "jl_projection_audit",
    "ivf_index_refresh", "exact_substring_dedup", "incr_substring_dedup",
    "quality_classifier_score", "knn_graph_lsh", "incr_knn_edges",
    "substring_span_removal", "ann_topk_lsh", "index_drift_stats",
    "decon_span_removal", "kmv_sketch_overlap", "knn_graph_pagerank",
    "system_load_ratio", "lsh_recall_audit",
    "embedding_int8_quantize", "ann_topk_int8_rescore",
    "ann_topk_ivf_int8", "ngram_decontamination", "ann_topk_pq",
    "corpus_snapshot_diff",
    "kmeans_embedding_assign", "semdedup_prune", "kmeans_cluster_purity",
    # -- (b) r03 leftovers (15): the oldest driver rows in the repo --
    "worker_lease_reassignment", "scale_window_proposal",
    "reactive_downscale_window", "batch_job_completion",
    "pod_assignment_groups", "flow_control_aggregate",
    "workload_monitor_ttl", "user_sessions",
    "dedup_exact", "dedup_minhash_lsh", "containment_pairs",
    "corpus_shuffle_export", "sequence_packing",
    "embedding_centroid_outliers", "incremental_dedup",
    # ---------------- 50-slot window ends here ----------------
    # (the r04 relational cohort now sits just past the line; its keys
    # keep their r04 driver rows + both-SF pytest parity)
    "tpch_q1_pricing_summary",
    "tpch_q10_returned_revenue", "tpch_q14_promo_revenue",
    "tpch_q18_large_orders", "tpch_q15_top_supplier",
    "tpch_q7_volume_shipping", "tpch_q8_market_share",
    "tpch_q13_customer_distribution",
    "tpch_q17_small_quantity", "tpch_q9_product_profit",
    "tpch_q22_idle_balances", "tpch_q19_disjunctive_filter",
    "funnel_conversion", "retention_cohorts", "asof_join_purchases",
    "range_join_error_impact", "cube_revenue", "pivot_priority_revenue",
    "fetcher_throughput", "resq_routing", "aimd_inflight_limiter",
    "head_blocking_cancel",
    # Overflow (both-SF pytest parity continues to cover these with the
    # driver-grade comparator): the remaining r04 keys — A35/A36,
    # D8/D34/D37-D39/D44/D45/D47-D49/D51-D53/D55-D58/D60/D61 — are next
    # round's rotation candidates; then token_bucket_exact (rows-only
    # by design — no SQL oracle; its driver-r4 hash-green twin
    # token_bucket_summary pins the shared applyInPandas kernel).
    "token_bucket_summary", "linger_sampler", "lang_id",
    "mixture_interleave", "ngram_novelty", "source_lang_kl",
    "importance_sampling_weights", "zipf_fit", "ngram_entropy",
    "weighted_sample_ares", "cms_heavy_hitters", "hll_distinct_tokens",
    "source_overlap_matrix", "token_budget_allocation",
    "timeseries_znorm_topk", "cdc_chunking", "window_outliers",
    "bm25_topk", "tokenizer_fertility", "unigram_perplexity",
    "blocklist_filter",
    "token_bucket_exact",
]


def _ordered(mapping: dict) -> dict:
    head = {k: mapping[k] for k in _KEY_PRIORITY if k in mapping}
    head.update({k: v for k, v in mapping.items() if k not in head})
    return head


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["tpch_q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _ordered(dict(QUERIES))


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each oracle-checkable query."""
    return _ordered(dict(ORACLES))
