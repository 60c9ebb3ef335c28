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
# Order the dict so that window holds (a) every key that has never had a
# driver row (round-1's report covered a different 50), then (b) the keys
# whose implementation changed since their last driver check. Keys beyond
# the window stay verified by tests/test_oracle_parity.py — the identical
# row-count + schema + value-hash comparison — at sf0.001 and sf0.01.
_KEY_PRIORITY = [
    # -- never driver-checked in ANY round (round-2 verdict list) --
    "delay_process", "dlq_dispatch_tokens", "batch_job_completion",
    "containment_pairs", "embedding_int8_quantize",
    # -- new in round 3 --
    "inflight_bootstrap", "pod_assignment_groups", "fetcher_throughput",
    "inflight_pending_order", "dlq_produce_batches",
    "latency_littles_law", "flow_control_aggregate",
    "corpus_shuffle_export", "sequence_packing", "mixture_interleave",
    "inflight_usage_critical", "workload_monitor_ttl",
    "embedding_centroid_outliers", "incremental_dedup",
    # -- touched by the round-3 ts normalization fix (model.py load_table):
    #    every operator reading messages()/events gets a fresh driver row --
    "fetch_offset_range", "filter_messages", "route_messages",
    "dedup_dispatch", "ack_commit_watermark", "head_of_line_blocking",
    "inflight_limiter", "rate_limit_tokens", "retry_tier_assignment",
    "dlq_messages", "dlq_resurrection", "latency_percentiles",
    "throughput_windows", "consumer_lag", "adaptive_inflight_vegas",
    "pipeline_health", "retry_backoff_eligibility",
    "worker_pipeline_summary", "log_compaction", "checkpoint_resume",
    "dlq_purge", "unprocessed_limiter",
    "job_commands", "workload_assignment", "autoscale_prediction",
    "worker_lease_reassignment", "scale_window_proposal",
    "reactive_downscale_window",
    "user_sessions",
    # -- documents/embeddings family (ts-independent, rotate back in) --
    "dedup_exact", "dedup_minhash_lsh", "ngram_jaccard_pairs",
    "dedup_representatives", "contamination_check",
    "chunk_dedup", "repetition_stats", "corpus_prep_funnel",
    "bpe_merge_pairs", "pii_redaction", "multimodal_frame_sample",
    "ann_topk_bruteforce", "ann_topk_ivf",
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
