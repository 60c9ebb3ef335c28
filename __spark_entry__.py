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
# Round-6 window (round-5 verdict, next-round item 1): rotate onto the
# now-oldest cohorts. Slot arithmetic (counted, not estimated):
# 13 new/changed-this-round + 9 r02 relational cohort + 25 r03 A-cohort
# + 3 r03 B-cohort = 50 exactly (B15-B21 and C10 slide to the
# overflow head, keeping their r03 rows + both-SF pytest parity).
_KEY_PRIORITY = [
    # -- (a) new or changed this round (13): D67-D71/B22 are new; D64
    #    moved to the shared phash kernels; D31/D42/D62 moved to the
    #    shared sq8_codebook kernel; D40/D41/D59 moved to the
    #    array_min E-step kernel --
    "ngram_decontamination", "ann_topk_pq", "ann_multiquery_ivf",
    "corpus_snapshot_diff", "lsh_recall_audit", "system_load_ratio",
    "multimodal_phash_dedup",
    "embedding_int8_quantize", "ann_topk_int8_rescore",
    "ann_topk_ivf_int8",
    "kmeans_embedding_assign", "semdedup_prune", "kmeans_cluster_purity",
    # -- (b) r02 relational cohort (9): oldest driver rows in the repo,
    #    four of them slid to overflow in the r05 window --
    "tpch_q3_shipping_priority", "tpch_q5_local_supplier",
    "tpch_q6_forecast_revenue", "top_customers_window",
    "orders_without_lineitems", "customer_order_stats",
    "running_revenue", "rollup_revenue", "tpch_q4_order_priority",
    # -- (c) r03 A-cohort (25): A1-A11, A13/A14, A16/A17, A20-A27,
    #    A29, A31 (A12/A15/A19/A30 are driver-r5; A28/A32-A36 r4) --
    "fetch_offset_range", "filter_messages", "route_messages",
    "dedup_dispatch", "ack_commit_watermark", "head_of_line_blocking",
    "inflight_limiter", "rate_limit_tokens", "retry_tier_assignment",
    "dlq_messages", "dlq_resurrection", "throughput_windows",
    "consumer_lag", "pipeline_health", "retry_backoff_eligibility",
    "log_compaction", "checkpoint_resume", "dlq_purge",
    "unprocessed_limiter", "delay_process", "dlq_dispatch_tokens",
    "inflight_bootstrap", "inflight_pending_order",
    "dlq_produce_batches", "inflight_usage_critical",
    # -- (d) r03 B-cohort (3) --
    "job_commands", "workload_assignment", "autoscale_prediction",
    # ---------------- 50-slot window ends here ----------------
    "worker_lease_reassignment",
    "scale_window_proposal", "reactive_downscale_window",
    "batch_job_completion", "pod_assignment_groups",
    "flow_control_aggregate", "workload_monitor_ttl", "user_sessions",
    # Overflow (both-SF pytest parity continues to cover these with the
    # driver-grade comparator): the remaining r03 keys — the D-cohort
    # (D1/D2/D30/D32/D33/D35/D36), next round's rotation candidates —
    # then token_bucket_exact (rows-only by design — no SQL oracle; its
    # driver-r4 hash-green twin token_bucket_summary pins the shared
    # applyInPandas kernel).
    "dedup_exact", "dedup_minhash_lsh", "containment_pairs",
    "corpus_shuffle_export", "sequence_packing",
    "embedding_centroid_outliers", "incremental_dedup",
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
