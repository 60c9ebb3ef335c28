#!/usr/bin/env python
"""Day-in-the-life of the TRAINING-DATA side: the curation pipeline a
100 TB corpus runs between "crawl landed" and "loader reads batches",
stage by stage, each backed by a registered (oracle-checked) operator.

    python examples/curation_pipeline.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import uforwarder_spark  # noqa: F401,E402
from uforwarder_spark.registry import QUERIES  # noqa: E402
from uforwarder_spark.session import get_spark  # noqa: E402

STAGES = [
    # -- ingest-time dedup ------------------------------------------------
    ("0. URL dedup + per-domain caps (the FineWeb first stage)", "domain_dedup_caps"),
    ("1. Bloom prefilter: new crawl vs corpus bitset", "bloom_dedup_prefilter"),
    ("2. incremental near-dup vs corpus signatures", "incremental_dedup"),
    ("3. full-corpus MinHash/LSH near-dup pairs", "dedup_minhash_lsh"),
    ("4. dedup clusters -> keep one representative", "dedup_representatives"),
    ("4b. RefinedWeb line dedup (boilerplate lines, keep-first)", "line_dedup"),
    ("4c. C4 three-sentence span dedup (keep-one)", "sentence_span_dedup"),
    ("4d. sentence spans at ingest: new crawl vs corpus", "incr_sentence_span_dedup"),
    ("5. semantic dedup in embedding space (SemDeDup)", "semdedup_prune"),
    # -- corpus health ----------------------------------------------------
    ("6. which sources copy from which (overlap matrix)", "source_overlap_matrix"),
    ("7. language-mix drift per source (KL)", "source_lang_kl"),
    ("8. Zipf-law fit per source (templated-text flag)", "zipf_fit"),
    ("9. next-token entropy per source (predictability)", "ngram_entropy"),
    ("10. distinct-token cardinality (HLL sketch + audit)", "hll_distinct_tokens"),
    ("11. heavy hitters (count-min sketch + audit)", "cms_heavy_hitters"),
    ("12. train/eval contamination check (whole-doc)", "contamination_check"),
    ("12a. train/eval contamination check (any 13-gram)", "ngram_decontamination"),
    ("12a'. contamination tiers by covered-token mass (Llama 2)", "contamination_fraction"),
    ("12b. cluster purity before cluster-level pruning", "kmeans_cluster_purity"),
    # -- filtering + sampling --------------------------------------------
    ("13. Gopher-style quality gate", "quality_filter_gopher"),
    ("13b. perplexity bands (corpus unigram LM)", "unigram_perplexity"),
    ("13c. C4 blocklist gate", "blocklist_filter"),
    ("14. PII redaction accounting", "pii_redaction"),
    ("15. token-budget weighted sample (A-Res)", "weighted_sample_ares"),
    ("16. temperature mixture weights per source", "importance_sampling_weights"),
    # -- export to the loader --------------------------------------------
    ("16b. integer token quotas (largest remainder)", "token_budget_allocation"),
    ("16b'. multi-epoch accounting under the budget", "multi_epoch_token_accounting"),
    ("16c. tokenizer fertility per (lang, source)", "tokenizer_fertility"),
    ("16d. train a BPE tokenizer on the corpus", "bpe_train_merges"),
    ("16e. fertility under the trained BPE vocab", "bpe_apply_fertility"),
    ("16f. fertility under a unigram-LM (SentencePiece) vocab", "unigram_lm_fertility"),
    ("16g. fertility under a WordPiece (BERT) vocab", "wordpiece_apply_fertility"),
    ("17. padding-waste audit for batch buckets", "length_bucketing"),
    ("18. fixed-length sequence packing", "sequence_packing"),
    ("18b. snapshot diff vs the previous corpus version", "corpus_snapshot_diff"),
    ("19. sharded shuffle export", "corpus_shuffle_export"),
    # -- serving-side similarity -----------------------------------------
    ("20. ANN over embeddings: quantized scan + rescore", "ann_topk_int8_rescore"),
    ("20b. ANN with PQ codes (ADC + exact rescore)", "ann_topk_pq"),
    ("20c. batched query workload through the IVF index", "ann_multiquery_ivf"),
    ("21. corpus search: BM25 top-k", "bm25_topk"),
    ("22. storage dedup: content-defined chunks", "cdc_chunking"),
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("curation-day", shuffle_partitions="8")
    spark.sparkContext.setLogLevel("ERROR")
    for title, name in STAGES:
        print(f"\n=== {title} [{name}] ===")
        QUERIES[name](spark, sf_dir).show(8, truncate=False)
    # The COMPOSED funnel (stages chained, not run standalone): exact
    # dedup -> one span grade -> decon tiers, with per-stage doc/token
    # accounting — the family-interaction evidence docs/SCALE.md's
    # round-12 table records at 10x.
    from uforwarder_spark.operators.funnel import span_family_funnel

    print("\n=== composed span-family funnel (chained stages) ===")
    acc, _final = span_family_funnel(
        spark.read.parquet(f"{sf_dir}/documents.parquet")
    )
    for row in acc:
        print(f"{row['stage']:>22}: docs={row['docs']:>8} tokens={row['tokens']:>12}")
    # same funnel at the D109 paragraph grade (grades are alternatives,
    # not stages — docs/SCALE.md round-12 second table)
    print("\n=== composed funnel, paragraph grade (D109 unit) ===")
    acc_p, _ = span_family_funnel(
        spark.read.parquet(f"{sf_dir}/documents.parquet"),
        span_s=1,
        span_unit="paragraph",
    )
    for row in acc_p:
        print(f"{row['stage']:>22}: docs={row['docs']:>8} tokens={row['tokens']:>12}")


if __name__ == "__main__":
    main()
