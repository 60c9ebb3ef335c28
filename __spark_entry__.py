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
# Round-11 window (round-10 verdict item 1): slot arithmetic (counted,
# not estimated): 4 new this round + the full 46-key r07-evidence
# cohort = 50 exactly. token_bucket_summary (verdict item 8: the
# token-bucket kernel's hash-green twin, due inside every second
# window) did not fit once D108 landed — it leads the r12 spares,
# within its <= r12 due date. After this round the oldest evidence is
# the r08 cohort (48 keys remaining) — r12's window is new/changed +
# token_bucket_summary + those 48 (1 slot spare, before any r12
# additions).
_KEY_PRIORITY = [
    # -- (a) new this round (4): sentence_span_dedup is NEW (D105, the
    #    C4 three-sentence keep-one span rule — VERDICT r10 #5);
    #    incr_sentence_span_dedup is NEW (D106, the same rule in the
    #    D74 at-ingest asymmetric shape, live twin E55); line_dedup is
    #    NEW (D107, the RefinedWeb exact line rule = the keep-one
    #    machinery at span 1); contamination_fraction is NEW (D108,
    #    the Llama-2 covered-token-mass tier rule over D80's shared
    #    detection head) --
    "sentence_span_dedup", "incr_sentence_span_dedup", "line_dedup",
    "contamination_fraction",
    # -- (b) the full r07-evidence cohort (46) — every key whose latest
    #    green driver row is CORRECTNESS_r07; the four gen1/gen2 ANN
    #    keys under this round's perf adjudication (ann_topk_lsh /
    #    bruteforce is gen1-family / pq / ivf_int8) lead so any plan
    #    change from that work is driver-checked in the same round --
    "ann_topk_lsh", "ann_topk_pq", "ann_topk_ivf_int8",
    "ann_topk_int8_rescore",
    "audio_silence_segments", "batch_job_completion",
    "bigram_perplexity", "containment_pairs", "contrastive_triplets",
    "corpus_shuffle_export", "corpus_snapshot_diff",
    "cusum_changepoints", "decon_span_removal", "dedup_exact",
    "dedup_minhash_lsh", "doremi_weights", "embedding_int8_quantize",
    "flow_control_aggregate", "heaps_vocab_growth",
    "hybrid_rrf_multiquery", "hybrid_rrf_retrieval", "incr_knn_edges",
    "incr_triplet_mining", "index_drift_stats", "ivf_index_refresh",
    "jl_projection_audit", "kmeans_cluster_purity",
    "kmeans_embedding_assign", "kmv_sketch_overlap", "knn_graph_lsh",
    "knn_graph_pagerank", "lsh_recall_audit", "markov_transitions",
    "ngram_decontamination", "pmi_collocations",
    "pod_assignment_groups", "quality_classifier_score",
    "reactive_downscale_window", "scale_window_proposal",
    "semdedup_prune", "sequence_packing", "split_leakage_audit",
    "system_load_ratio", "user_sessions", "worker_lease_reassignment",
    "workload_monitor_ttl",
    # ---------------- 50-slot window ends here ----------------
    # token_bucket_summary leads the r12 spares (verdict item 8,
    # due <= r12; the rows-only token_bucket_exact's hash-pinned twin)
    "token_bucket_summary",
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
