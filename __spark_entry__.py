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
# Round-5 window: the ENTIRE 50-slot budget goes to evidence debt
# (round-4 verdict, next-round item 1) — no key in slots 1-50 has a
# driver row fresher than r02 unless its implementation changed THIS
# round. Slot arithmetic (counted, not estimated): 6 never-checked +
# 8 changed-this-round + 2 changed-r4-on-freed-slots + 11 B-cohort +
# 7 r01 text cohort = 34, topped up with 16 r02-cohort keys = 50
# (top_customers_window / tpch_q6 / tpch_q5 / tpch_q3 slide to
# overflow, keeping their r02 rows + both-SF pytest parity).
_KEY_PRIORITY = [
    # -- (a) never had a driver row (5) --
    "multimodal_resize",       # D46: pytest-parity only since round 2
    "ann_topk_ivf_int8",       # D62: new this round (IVF-SQ8)
    "dsir_selection",          # D63: new this round (DSIR Gumbel-top-K)
    "multimodal_phash_dedup",  # D64: new this round (aHash image dedup)
    "phash_incremental_dedup",  # D65: new this round (incremental aHash)
    "dedup_embedding_agreement",  # D66: new this round (cross-modal audit)
    # -- (b) implementation changed this round (10): HDR bucket clamp,
    #    Bloom shuffle split, counts_quantiles kernel gained an n
    #    column (A12 rebuilt on it; A15/A19/A30/D23 consume it),
    #    length-bucket overflow chain --
    "hdr_histogram_quantiles", "bloom_dedup_prefilter",
    "latency_percentiles", "length_bucketing",
    "adaptive_inflight_vegas", "latency_littles_law", "corpus_stats",
    "worker_pipeline_summary",
    # -- (c) changed in round 4 on freed slots, never re-checked since
    #    (round-4 verdict "What's wrong" #3) --
    "vocab_topk", "bpe_merge_pairs",
    # -- (d) controller cohort B1-B11: only driver evidence is round 1,
    #    three rounds of session/model refactors ago --
    "partition_assignment", "load_balance_stats", "autoscale_decision",
    "batch_job_offsets", "partition_expansion", "hibernating_jobs",
    "colocating_assignment", "autoscale_hysteresis",
    "pod_aware_assignment", "range_assignment",
    "rebalancer_shadow_compare",
    # -- (e) remaining r01 text cohort (lang_id already driver-r4) --
    "quality_score", "token_count", "doc_fingerprint",
    "quality_filter_gopher", "stratified_sample",
    "tfidf_top_terms", "lang_id_confusion",
    # -- (f) r02-cohort top-up: similarity/dedup/multimodal first (their
    #    modules churned this round), then the r02 relational keys --
    "dedup_simhash", "ngram_jaccard_pairs", "embedding_cosine_pairs",
    "ann_topk_bruteforce", "ann_topk_lsh", "ann_topk_ivf",
    "dedup_representatives", "dedup_connected_components",
    "minhash_jaccard_estimate", "contamination_check",
    "multimodal_meta", "multimodal_frame_sample",
    "pii_redaction", "chunk_dedup", "repetition_stats",
    "corpus_prep_funnel",
    # ---------------- 50-slot window ends here ----------------
    # Overflow (both-SF pytest parity continues to cover these with the
    # driver-grade comparator): the rest of the r02 cohort, then
    # token_bucket_exact (rows-only by design — no SQL oracle; its
    # driver-r4 hash-green twin token_bucket_summary pins the shared
    # applyInPandas kernel).
    "tpch_q3_shipping_priority", "tpch_q5_local_supplier",
    "tpch_q6_forecast_revenue", "top_customers_window",
    "orders_without_lineitems", "customer_order_stats",
    "running_revenue", "rollup_revenue", "tpch_q4_order_priority",
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
