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
# Round-8 window (round-7 verdict item 1): rotate onto the now-oldest
# evidence. Slot arithmetic (counted, not estimated): 8 new/changed
# this round + 2 r03 leftovers + 40 of the 43 r04-cohort keys = 50
# exactly; tokenizer_fertility, unigram_perplexity and
# blocklist_filter slide just past the line (keeping their r04 driver
# rows + both-SF pytest parity) and lead the r09 window.
_KEY_PRIORITY = [
    # -- (a) new or changed this round (8): bpe_train_merges and
    #    bpe_apply_fertility are NEW (D97/D98, iterated BPE training +
    #    its encode/fertility side); pipeline_health gained the full
    #    KafkaPipelineIssue taxonomy columns (hash CHANGED); the
    #    exact-substring family moved to the flag-dispatched window
    #    kernel (default md5 path value-identical, code changed);
    #    kcenter_coreset gained per-step localCheckpoints;
    #    multimodal_resize moved to the pluggable-decoder kernel --
    "bpe_train_merges", "bpe_apply_fertility",
    "pipeline_health", "exact_substring_dedup", "incr_substring_dedup",
    "substring_span_removal", "kcenter_coreset", "multimodal_resize",
    # -- (b) the two r03 leftovers that slid past last round's line —
    #    the oldest driver rows in the repo --
    "embedding_centroid_outliers", "incremental_dedup",
    # -- (c) the r04 cohort (40 of its 43 keys; tokenizer_fertility,
    #    unigram_perplexity and blocklist_filter slide just past the
    #    line and lead next round): relational C1 + C12-C28, then
    #    A28/A32-A36, then the r04 D keys --
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
    "head_blocking_cancel", "token_bucket_summary", "linger_sampler",
    "lang_id", "mixture_interleave", "ngram_novelty", "source_lang_kl",
    "importance_sampling_weights", "zipf_fit", "ngram_entropy",
    "weighted_sample_ares", "cms_heavy_hitters", "hll_distinct_tokens",
    "source_overlap_matrix", "token_budget_allocation",
    "timeseries_znorm_topk", "cdc_chunking", "window_outliers",
    "bm25_topk",
    # ---------------- 50-slot window ends here ----------------
    # Past the line (both-SF pytest parity continues to cover every key
    # with the driver-grade comparator): tokenizer_fertility,
    # unigram_perplexity and blocklist_filter are the three r04 keys
    # that did not fit (8 new/changed + 2 r03 + 43 r04 = 53) and lead
    # the r09 window; everything after them carries r05+ evidence.
    # token_bucket_exact stays last (rows-only by design — no SQL
    # oracle; its hash-green twin token_bucket_summary pins the shared
    # applyInPandas kernel).
    "tokenizer_fertility",
    "unigram_perplexity",
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
