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
# Round-12 window (round-11 verdict item 1): slot arithmetic (counted,
# not estimated): 1 NEW (paragraph_span_dedup, D109 — verdict item 6's
# spare-slot condition was met because token_bucket_summary sits
# INSIDE the 48-key r08 cohort, not beside it) + 1 CHANGED
# (contamination_fraction — the ADVICE r12 zero-token 0/0 guard
# changed both the plan and the oracle text) + the full 48-key
# r08-evidence cohort (every key whose latest green driver row is
# CORRECTNESS_r08, token_bucket_summary among them — its <= r12 due
# date lands inside the cohort rotation) = 50 exactly, 0 spare.
# After this round the oldest evidence is the r09 cohort (49 keys) —
# r13's window is new/changed + those 49 (1 slot spare, before any
# r13 additions). One CHANGED key is already known for r13:
# incr_sentence_span_dedup's kernel gained a span-length parameter
# late in r12 (default-arg only — hash-exact re-verified by driver
# sim + both-SF parity the same session — but the composed source
# changed after its r11 driver row, so it re-windows first in r13).
_KEY_PRIORITY = [
    # -- (a) new/changed this round (2): paragraph_span_dedup is NEW
    #    (D109, the MassiveText repeated-paragraph keep-one rule =
    #    the D105/D107 kernels at a paragraph declared unit);
    #    contamination_fraction CHANGED (n_tokens = 0 guard in both
    #    engines, ADVICE r12) --
    "paragraph_span_dedup", "contamination_fraction",
    # -- (b) the full r08-evidence cohort (48) — every key whose
    #    latest green driver row is CORRECTNESS_r08; token_bucket_
    #    summary (the rows-only A18 kernel's hash-pinned twin, due
    #    <= r12 per VERDICT r11 item 8) is a member and leads --
    "token_bucket_summary",
    "aimd_inflight_limiter", "asof_join_purchases", "bm25_topk",
    "bpe_train_merges", "cdc_chunking", "cms_heavy_hitters",
    "cube_revenue", "embedding_centroid_outliers",
    "exact_substring_dedup", "fetcher_throughput", "funnel_conversion",
    "head_blocking_cancel", "hll_distinct_tokens",
    "importance_sampling_weights", "incremental_dedup",
    "kcenter_coreset", "lang_id", "linger_sampler",
    "mixture_interleave", "multimodal_resize", "ngram_entropy",
    "ngram_novelty", "pipeline_health", "pivot_priority_revenue",
    "range_join_error_impact", "resq_routing", "retention_cohorts",
    "source_lang_kl", "source_overlap_matrix",
    "substring_span_removal", "timeseries_znorm_topk",
    "token_budget_allocation", "tpch_q10_returned_revenue",
    "tpch_q13_customer_distribution", "tpch_q14_promo_revenue",
    "tpch_q15_top_supplier", "tpch_q17_small_quantity",
    "tpch_q18_large_orders", "tpch_q19_disjunctive_filter",
    "tpch_q1_pricing_summary", "tpch_q22_idle_balances",
    "tpch_q7_volume_shipping", "tpch_q8_market_share",
    "tpch_q9_product_profit", "weighted_sample_ares",
    "window_outliers", "zipf_fit",
    # ---------------- 50-slot window ends here ----------------
    # Past the line (both-SF pytest parity continues to cover every
    # key with the driver-grade comparator): everything else carries
    # r09+ evidence. token_bucket_exact stays last (rows-only by
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
