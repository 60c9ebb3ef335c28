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
    # -- never driver-checked (25) --
    "tpch_q1_pricing_summary", "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier", "tpch_q6_forecast_revenue",
    "top_customers_window", "orders_without_lineitems",
    "customer_order_stats", "running_revenue", "rollup_revenue",
    "user_sessions", "tpch_q4_order_priority",
    "ann_topk_bruteforce", "ann_topk_lsh", "ann_topk_ivf",
    "log_compaction", "checkpoint_resume", "dlq_purge",
    "unprocessed_limiter",
    "job_commands", "workload_assignment", "autoscale_prediction",
    "worker_lease_reassignment",
    "chunk_dedup", "repetition_stats", "corpus_prep_funnel",
    "scale_window_proposal", "reactive_downscale_window",  # new in round 3
    "bpe_merge_pairs", "pii_redaction", "multimodal_frame_sample",  # round 3
    # -- changed since their round-1 driver check (20) --
    "ngram_jaccard_pairs",          # PPJoin prefix-filtered plan now
    "dedup_representatives", "contamination_check",  # de-vacuated
    "dedup_exact", "dedup_minhash_lsh", "dedup_simhash",
    "embedding_cosine_pairs", "dedup_connected_components",
    "minhash_jaccard_estimate", "multimodal_meta",
    "fetch_offset_range", "filter_messages", "route_messages",
    "dedup_dispatch", "ack_commit_watermark", "head_of_line_blocking",
    "inflight_limiter", "rate_limit_tokens", "retry_tier_assignment",
    "dlq_messages",
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
