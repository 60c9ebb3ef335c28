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
# Round-13 window (optimization round 2): slot arithmetic (counted,
# not estimated): 18 CHANGED keys — the r13 optimizations, every one
# re-proven result-identical in-repo (both-SF parity + where the
# change was materialization-only, OLD-vs-NEW row-identity at sf0.1)
# before landing: 17 from this round (pagerank lineage checkpoint,
# one-pass BM25 pair, norm hoist/factorization family, ivf/jaccard/
# containment/phash/hybrid materialization fixes, lsh-audit union
# identity) + incr_sentence_span_dedup (kernel default-arg changed
# late in r12 after its r11 driver row; flagged for r13 re-window in
# the r12 ordering note) = 18, + the 32 OLDEST r09-evidence-cohort
# keys (the cohort is 50; ngram_jaccard_pairs is already in (a); the
# remaining 17 r09 keys carry pytest-parity evidence and rotate next)
# = 50 exactly, 0 spare.
_KEY_PRIORITY = [
    # -- (a) changed this round (18) --
    "knn_graph_pagerank", "knn_graph_lsh", "incr_knn_edges",
    "semdedup_prune", "contrastive_triplets", "incr_triplet_mining",
    "kcenter_coreset", "bm25_topk", "hybrid_rrf_retrieval",
    "hybrid_rrf_multiquery", "ann_multiquery_ivf", "ivf_index_refresh",
    "ngram_jaccard_pairs", "containment_pairs",
    "multimodal_phash_dedup", "phash_incremental_dedup",
    "lsh_recall_audit", "incr_sentence_span_dedup",
    # -- (b) the 32 oldest r09-evidence keys (CORRECTNESS_r09 order) --
    "unigram_lm_train", "unigram_lm_fertility", "wordpiece_train_merges",
    "wordpiece_apply_fertility", "tpch_q12_shipmode_priority",
    "tpch_q21_waiting_suppliers", "tpch_q16_supplier_part_types",
    "tpch_q11_important_balances", "pii_redaction",
    "bpe_apply_fertility", "incr_substring_dedup", "tokenizer_fertility",
    "unigram_perplexity", "blocklist_filter", "latency_percentiles",
    "adaptive_inflight_vegas", "worker_pipeline_summary",
    "latency_littles_law", "partition_assignment", "load_balance_stats",
    "autoscale_decision", "batch_job_offsets", "partition_expansion",
    "hibernating_jobs", "colocating_assignment", "autoscale_hysteresis",
    "pod_aware_assignment", "range_assignment",
    "rebalancer_shadow_compare", "dedup_simhash",
    "embedding_cosine_pairs", "ann_topk_bruteforce",
    # ---------------- 50-slot window ends here ----------------
    # Past the line (both-SF pytest parity continues to cover every
    # key with the driver-grade comparator): the 17 remaining r09-
    # cohort keys rotate first next round, then r10+. token_bucket_
    # exact stays last (rows-only by design — no SQL oracle; its
    # hash-green twin token_bucket_summary pins the shared
    # applyInPandas kernel).
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
