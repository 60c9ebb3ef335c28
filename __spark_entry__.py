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
# Round-10 window (round-9 verdict item 1): slot arithmetic (counted,
# not estimated): 3 new/changed this round + the 9 r05-cohort keys
# deferred from round 9 + the full 38-key r06-evidence cohort = 50
# exactly. After this round the oldest evidence is the 46-key r07
# cohort — r11's window is new/changed + those 46 (4 slots spare).
_KEY_PRIORITY = [
    # -- (a) new or changed this round (3 + dsir_selection, which is
    #    already in the r05 nine below): domain_dedup_caps is NEW
    #    (D103, the FineWeb/RefinedWeb URL-dedup + per-domain-cap
    #    first stage); multi_epoch_token_accounting is NEW (D104,
    #    Muennighoff data-constrained multi-epoch accounting over the
    #    D52 quotas); tpch_q16's oracle text gained an explicit
    #    l_suppkey IS NOT NULL so NOT IN == anti join holds even with
    #    an empty complaint subquery (ADVICE r09 — values identical
    #    on this data, oracle text changed) --
    "domain_dedup_caps", "multi_epoch_token_accounting",
    "tpch_q16_supplier_part_types",
    # -- (b) the nine r05-evidence keys deferred from round 9's window
    #    (the oldest oracle-checked driver rows in the repo);
    #    dsir_selection leads — its plan ALSO changed this round (the
    #    256-bucket model now folds back as a literal decimal array;
    #    values identical, parity re-proven at both SFs) --
    "dsir_selection",
    "bloom_dedup_prefilter", "length_bucketing",
    "hdr_histogram_quantiles", "phash_incremental_dedup",
    "dedup_embedding_agreement", "token_count", "quality_score",
    "multimodal_meta",
    # -- (c) the full r06-evidence cohort (38): the A-pipeline block,
    #    the r06 relational block, and the two r06 D/similarity keys --
    "fetch_offset_range", "filter_messages", "route_messages",
    "dedup_dispatch", "ack_commit_watermark", "head_of_line_blocking",
    "inflight_limiter", "rate_limit_tokens", "retry_tier_assignment",
    "dlq_messages", "dlq_resurrection", "throughput_windows",
    "consumer_lag", "retry_backoff_eligibility", "log_compaction",
    "checkpoint_resume", "dlq_purge", "unprocessed_limiter",
    "delay_process", "dlq_dispatch_tokens", "inflight_bootstrap",
    "inflight_pending_order", "dlq_produce_batches",
    "inflight_usage_critical", "job_commands", "workload_assignment",
    "autoscale_prediction",
    "tpch_q3_shipping_priority", "tpch_q5_local_supplier",
    "tpch_q6_forecast_revenue", "top_customers_window",
    "orders_without_lineitems", "customer_order_stats",
    "running_revenue", "rollup_revenue", "tpch_q4_order_priority",
    "multimodal_phash_dedup", "ann_multiquery_ivf",
    # ---------------- 50-slot window ends here ----------------
    # Past the line (both-SF pytest parity continues to cover every
    # key with the driver-grade comparator): everything else carries
    # r07+ evidence. token_bucket_exact stays last (rows-only by
    # design — no SQL oracle; its hash-green twin token_bucket_summary
    # pins the shared applyInPandas kernel).
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
