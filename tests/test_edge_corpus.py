"""Edge-corpus robustness: the text/dedup operators must behave on the
degenerate documents a real corpus contains — empty strings, one-token
docs, punctuation-only docs, exact duplicates — not just the synthetic
mid-sized ones.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

EDGE_DOCS = [
    # (doc_id, text, lang, source, n_chars)
    (0, "", "en", "web", 0),
    (1, "word", "en", "web", 4),
    (2, "!!! ??? ...", "en", "web", 11),
    (3, "the quick brown fox jumps over the lazy dog", "en", "books", 43),
    (4, "the quick brown fox jumps over the lazy dog", "en", "books", 43),  # exact dup
    (5, "the quick brown fox jumps over a lazy dog", "en", "books", 41),  # near dup
    (6, "uno dos tres cuatro cinco seis siete ocho", "es", "web", 41),
    (7, "a b", "en", "web", 3),
]


@pytest.fixture(scope="module")
def edge_dir(tmp_path_factory):
    from uforwarder_spark.session import get_spark

    spark = get_spark("uforwarder-tests", shuffle_partitions="8")
    d = tmp_path_factory.mktemp("edge")
    spark.createDataFrame(
        EDGE_DOCS, ["doc_id", "text", "lang", "source", "n_chars"]
    ).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    return str(d)


def test_dedup_exact_counts_duplicates(spark, edge_dir):
    from uforwarder_spark.operators.dedup import dedup_exact

    rows = {r.source: r for r in dedup_exact(spark, edge_dir).collect()}
    assert rows["books"].n_docs == 3 and rows["books"].n_dups == 1
    assert rows["web"].n_dups == 0


def test_minhash_handles_short_docs_and_finds_dups(spark, edge_dir):
    from uforwarder_spark.operators.dedup import dedup_minhash_lsh

    pairs = {(r.doc_a, r.doc_b): r.jaccard for r in dedup_minhash_lsh(spark, edge_dir).collect()}
    assert pairs[(3, 4)] == 1.0  # exact dup found with jaccard 1
    assert all(j >= 0.5 for j in pairs.values())
    # short docs (< 3 tokens) go through the single-shingle path without error


def test_simhash_excludes_tokenless_docs(spark, edge_dir):
    from uforwarder_spark.operators.dedup import dedup_simhash

    rows = {r.doc_id: r.simhash for r in dedup_simhash(spark, edge_dir).collect()}
    assert 0 not in rows and 2 not in rows  # no tokens → excluded
    assert rows[3] == rows[4]  # identical docs, identical fingerprints
    assert 0 <= rows[1] < 2**32


def test_text_metrics_on_empty_and_tiny_docs(spark, edge_dir):
    from uforwarder_spark.functions.text import lang_id, quality_score, token_count

    tc = {r.doc_id: r for r in token_count(spark, edge_dir).collect()}
    assert tc[0].ws_tokens == 0 and tc[0].bpe_ish_tokens == 0
    assert tc[2].ws_tokens == 3  # "!!! ??? ..." splits on whitespace
    li = {r.doc_id: r for r in lang_id(spark, edge_dir).collect()}
    assert li[0].pred_lang == "unk" and li[0].stop_ratio == 0.0
    assert li[3].pred_lang == "en"  # two 'the' in nine tokens
    qs = {r.doc_id: r for r in quality_score(spark, edge_dir).collect()}
    assert qs[0].quality_band == "low"
    assert all(0.0 <= r.quality_score <= 1.0 for r in qs.values())


def test_fingerprint_identical_for_exact_dups(spark, edge_dir):
    from uforwarder_spark.functions.text import doc_fingerprint

    rows = {r.doc_id: r for r in doc_fingerprint(spark, edge_dir).collect()}
    assert rows[3].full_hash == rows[4].full_hash
    assert rows[3].min_shingle_hash == rows[4].min_shingle_hash
    assert rows[3].full_hash != rows[5].full_hash  # near dup differs exactly
    assert len(rows) == len(EDGE_DOCS)  # every doc fingerprints, even empty


def test_ann_ignores_zero_norm_vectors(spark, tmp_path):
    """A zero vector's cosine is NaN and Spark sorts NaN as greatest —
    it must never appear in (or crash) the top-k."""
    import random

    rng = random.Random(7)
    rows = [(i, i % 3, [rng.uniform(-1, 1) for _ in range(64)]) for i in range(30)]
    rows.append((30, 0, [0.0] * 64))  # the hazard
    spark.createDataFrame(rows, "vec_id long, label long, embedding array<float>").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "embeddings.parquet"))

    from uforwarder_spark.operators.similarity import ann_topk_bruteforce, ann_topk_lsh

    for fn in (ann_topk_bruteforce, ann_topk_lsh):
        got = fn(spark, str(tmp_path)).collect()
        assert all(r.vec_id != 30 for r in got)
        assert all(r.cosine == r.cosine for r in got)  # no NaN survives


def _brute_jaccard_pairs(docs, threshold=0.9):
    """Python brute-force oracle for D4: all same-source pairs, distinct
    token sets, Jaccard >= threshold."""
    import itertools
    import re

    sets = {d[0]: (d[3], set(t for t in re.split(r"[^a-z0-9]+", d[1].lower()) if t)) for d in docs}
    out = set()
    for (a, (sa, ta)), (b, (sb, tb)) in itertools.combinations(sorted(sets.items()), 2):
        if sa != sb or not (ta | tb):
            continue
        j = len(ta & tb) / len(ta | tb)
        if j >= threshold:
            out.add((a, b))
    return out


def test_ngram_jaccard_prefix_filter_is_exact(spark, tmp_path):
    """The PPJoin prefix filter must find EXACTLY the pairs the naive
    all-pairs Jaccard finds — on a corpus with hot shared tokens, near
    dups, exact dups, and singleton docs."""
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = [
        # 6 docs sharing the hot stopword spine but pairwise-distinct tails
        (i, f"the of and in {base} tail{i}a tail{i}b tail{i}c", "en", "web", 0)
        for i in range(6)
    ] + [
        (10, f"the of and in {base} shared tail", "en", "web", 0),
        (11, f"the of and in {base} shared tail", "en", "web", 0),  # exact dup of 10
        (12, f"the of and in {base} shared tails", "en", "web", 0),  # near dup
        (13, "solo", "en", "web", 0),
        (14, f"{base}", "en", "books", 0),  # other source: never pairs with web
        (15, f"{base}", "en", "books", 0),
    ]
    d = tmp_path / "jac"
    spark.createDataFrame(docs, ["doc_id", "text", "lang", "source", "n_chars"]).write.mode(
        "overwrite"
    ).parquet(str(d / "documents.parquet"))

    from uforwarder_spark.operators.jaccard import ngram_jaccard_pairs

    got = {(r.doc_a, r.doc_b) for r in ngram_jaccard_pairs(spark, str(d)).collect()}
    want = _brute_jaccard_pairs(docs)
    assert got == want and (10, 11) in want and (14, 15) in want


def test_ngram_jaccard_candidates_are_bounded(spark, tmp_path):
    """Scale guard: with one token shared by ALL n docs, the naive
    (source, token) join emits O(n^2) candidate rows; the prefix join
    must stay near-linear because the hot token never enters a prefix."""
    n = 60
    docs = [
        # 12 distinct rare tokens each + 1 universal hot token -> prefix
        # length floor(0.1*13)+1 = 2 rarest tokens, never 'common'
        (i, "common " + " ".join(f"tok{i}x{j}" for j in range(12)), "en", "web", 0)
        for i in range(n)
    ]
    d = tmp_path / "hot"
    spark.createDataFrame(docs, ["doc_id", "text", "lang", "source", "n_chars"]).write.mode(
        "overwrite"
    ).parquet(str(d / "documents.parquet"))

    from pyspark.sql import functions as F

    from uforwarder_spark.functions.tokenize import TOKENS_SPARK
    from uforwarder_spark.model import load_parallel
    from uforwarder_spark.operators.jaccard import ngram_jaccard_pairs, prefix_tokens

    t = (
        load_parallel(spark, str(d), "documents")
        .withColumn("ts", F.expr(f"array_distinct({TOKENS_SPARK})"))
        .select("doc_id", "source", "ts")
    )
    pref = prefix_tokens(t)
    a, b = pref.alias("a"), pref.alias("b")
    n_candidates = (
        a.join(
            b,
            (F.col("a.source") == F.col("b.source"))
            & (F.col("a.tok") == F.col("b.tok"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        ).count()
    )
    # naive join would emit >= C(60,2) = 1770 rows for 'common' alone
    assert n_candidates == 0  # all prefixes are doc-unique rare tokens
    # prefix rows are bounded by sum(floor(0.1*n)+1) — 2 per doc here
    assert pref.count() <= 2 * n
    assert ngram_jaccard_pairs(spark, str(d)).count() == 0


def test_dedup_representatives_on_dup_corpus(spark, edge_dir):
    """Non-vacuous D14: the (3, 4) exact-dup pair must surface as one
    group keeping doc 3 (the sf0.01 synthetic corpus has no exact dups,
    so the driver's parity row passes 0/0 — this pins the non-empty
    behavior)."""
    from uforwarder_spark.operators.dedup import dedup_representatives

    rows = dedup_representatives(spark, edge_dir).collect()
    assert len(rows) == 1
    (g,) = rows
    assert (g.n_members, g.keep_doc_id, g.n_dropped) == (2, 3, 1)


def test_contamination_check_on_seeded_corpus(spark, tmp_path):
    """Non-vacuous D20: doc 51 is in the deterministic eval set
    (hash60(md5('51')) % 50 == 0); docs 1 and 2 carry the same
    normalized text, so both must count as contaminated."""
    docs = [
        (1, "The  Quick brown fox", "en", "web", 20),
        (2, "the quick  brown FOX", "en", "books", 20),  # same normalized text
        (3, "something else entirely", "en", "web", 23),
        (51, "the quick brown fox", "en", "eval", 19),  # eval-set member
        (52, "unrelated holdout text", "en", "eval", 22),  # eval, no match
    ]
    d = tmp_path / "contam"
    spark.createDataFrame(docs, ["doc_id", "text", "lang", "source", "n_chars"]).write.mode(
        "overwrite"
    ).parquet(str(d / "documents.parquet"))

    from uforwarder_spark.operators.dedup import contamination_check

    got = {r.source: r for r in contamination_check(spark, str(d)).collect()}
    assert got["web"].n_contaminated == 1 and got["web"].n_eval_hit == 1
    assert got["books"].n_contaminated == 1 and got["books"].n_eval_hit == 1
    assert "eval" not in got  # the eval doc itself is excluded (doc_id != eval_doc_id)


def test_ngram_jaccard_prefix_filter_exact_on_random_corpora(spark, tmp_path):
    """Randomized exactness sweep: three seeded corpora with tunable
    dup-density and hot-token mixes; the prefix-filtered operator must
    equal the python brute force on every one (guards the prefix-length
    off-by-one, the length filter, and the per-source df ordering)."""
    import random

    vocab = [f"w{i}" for i in range(40)]  # small vocab -> plenty of shared tokens
    for seed in (7, 41, 1337):
        rng = random.Random(seed)
        docs = []
        base_texts = []
        for i in range(40):
            n = rng.randint(1, 14)
            text = " ".join(rng.choice(vocab) for _ in range(n))
            src = rng.choice(["web", "books"])
            if base_texts and rng.random() < 0.4:
                # mutate an earlier doc: drop/replace one token -> near dup
                words = base_texts[rng.randrange(len(base_texts))].split()
                if len(words) > 1 and rng.random() < 0.5:
                    words.pop(rng.randrange(len(words)))
                else:
                    words[rng.randrange(len(words))] = rng.choice(vocab)
                text = " ".join(words)
            base_texts.append(text)
            docs.append((i, text, "en", src, len(text)))
        d = tmp_path / f"rand{seed}"
        spark.createDataFrame(
            docs, ["doc_id", "text", "lang", "source", "n_chars"]
        ).write.mode("overwrite").parquet(str(d / "documents.parquet"))

        from uforwarder_spark.operators.jaccard import ngram_jaccard_pairs

        got = {(r.doc_a, r.doc_b) for r in ngram_jaccard_pairs(spark, str(d)).collect()}
        want = _brute_jaccard_pairs(docs)
        assert got == want, f"seed {seed}: {got ^ want}"


def test_repetition_stats_on_crafted_docs(spark, tmp_path):
    docs = [
        (0, "a a a a", "en", "web", 7),          # fully repetitive
        (1, "one two three four", "en", "web", 18),  # no repetition
        (2, "x", "en", "web", 1),                 # single token: no bigrams
        (3, "", "en", "web", 0),                  # empty
    ]
    d = tmp_path / "rep"
    spark.createDataFrame(docs, ["doc_id", "text", "lang", "source", "n_chars"]).write.mode(
        "overwrite"
    ).parquet(str(d / "documents.parquet"))

    from uforwarder_spark.functions.text import repetition_stats

    r = {x.doc_id: x for x in repetition_stats(spark, str(d)).collect()}
    assert r[0].dup_token_frac == 0.75 and r[0].top_token_frac == 1.0
    assert r[0].dup_bigram_frac == round(1 - 1 / 3, 6)  # 3 bigrams, 1 distinct
    assert r[1].dup_token_frac == 0.0 and r[1].dup_bigram_frac == 0.0
    assert r[1].top_token_frac == 0.25
    assert r[2].dup_bigram_frac == 0.0 and r[2].top_token_frac == 1.0
    assert r[3].n_tokens == 0 and r[3].dup_token_frac == 0.0


def test_chunk_dedup_flags_shared_chunks(spark, tmp_path):
    shared = " ".join(f"s{i}" for i in range(10))  # exactly one chunk
    docs = [
        (0, shared + " " + " ".join(f"a{i}" for i in range(10)), "en", "web", 0),
        (1, shared + " " + " ".join(f"b{i}" for i in range(10)), "en", "web", 0),
        (2, " ".join(f"c{i}" for i in range(10)), "en", "web", 0),
    ]
    d = tmp_path / "chunks"
    spark.createDataFrame(docs, ["doc_id", "text", "lang", "source", "n_chars"]).write.mode(
        "overwrite"
    ).parquet(str(d / "documents.parquet"))

    from uforwarder_spark.functions.text import chunk_dedup

    r = {x.doc_id: x for x in chunk_dedup(spark, str(d)).collect()}
    assert r[0].n_chunks == 2 and r[0].n_dup_chunks == 1 and r[0].dup_chunk_frac == 0.5
    assert r[1].n_chunks == 2 and r[1].n_dup_chunks == 1
    assert r[2].n_chunks == 1 and r[2].n_dup_chunks == 0


def test_corpus_prep_funnel_stages_all_bind(spark, tmp_path):
    """Each funnel stage must actually drop documents: a quality-failing
    doc, a quality-passing exact dup, and enough passing docs that the
    hash sample keeps a strict subset."""
    good = (
        "the quick brown fox jumps over the lazy dog and then runs far "
        "away into the deep green forest with great speed today"
    )  # 22 tokens, stopword-rich, no digits
    docs = [(0, "tiny doc", "en", "web", 8)]  # fails n_tokens >= 20
    docs += [(1, good, "en", "web", len(good)), (2, good, "en", "web", len(good))]  # dup pair
    docs += [
        (10 + i, good + f" variant token version{'x' * (i + 1)} appended here", "en", "web", 0)
        for i in range(20)
    ]
    d = tmp_path / "funnel"
    spark.createDataFrame(docs, ["doc_id", "text", "lang", "source", "n_chars"]).write.mode(
        "overwrite"
    ).parquet(str(d / "documents.parquet"))

    from uforwarder_spark.functions.text import corpus_prep_funnel

    (r,) = corpus_prep_funnel(spark, str(d)).collect()
    assert r.n_docs == 23
    assert r.n_quality == 22  # doc 0 dropped by the rules
    assert r.n_unique == 21  # doc 2 collapsed onto doc 1
    assert 0 < r.n_sampled < r.n_unique  # the 1-in-10 sample binds


def test_pii_redaction_on_seeded_corpus(spark, tmp_path):
    """The synthetic corpus has no PII, so pin the mechanism on seeded
    docs: every pattern type redacts, counts match, order prevents the
    phone pattern from eating email/IP digits."""
    from uforwarder_spark.functions.text import pii_redaction

    docs = [
        (0, "contact alice.smith+x@example.org or bob@sub.domain.co today", "en", "web", 60),
        (1, "server at 10.0.255.7 then call 415-555-0199 now", "en", "web", 47),
        (2, "nothing sensitive here at all", "en", "web", 29),
        (3, "dial 123.456.7890 and 987-654-3210", "en", "web", 34),
    ]
    d = tmp_path / "pii"
    spark.createDataFrame(docs, ["doc_id", "text", "lang", "source", "n_chars"]).write.mode(
        "overwrite"
    ).parquet(str(d / "documents.parquet"))
    out = {r.doc_id: r for r in pii_redaction(spark, str(d)).collect()}
    assert (out[0].n_emails, out[0].n_ips, out[0].n_phones) == (2, 0, 0)
    assert (out[1].n_emails, out[1].n_ips, out[1].n_phones) == (0, 1, 1)
    assert out[2].n_redactions == 0
    assert out[3].n_phones == 2


def test_bpe_pairs_skip_sub_two_token_docs(spark, edge_dir):
    """Docs with <2 tokens contribute no pairs (the slice guard); the
    dup'd fox sentence dominates the top pairs."""
    from uforwarder_spark.functions.text import bpe_merge_pairs

    rows = bpe_merge_pairs(spark, edge_dir).collect()
    pairs = {(r.tok_l, r.tok_r): r.freq for r in rows}
    assert pairs[("quick", "brown")] == 3  # docs 3, 4, 5
    assert rows[0].rank == 1 and rows[0].freq >= 3
    assert all(r.freq >= 1 for r in rows)


def test_frame_sample_short_and_empty_payloads(spark, tmp_path):
    """Payloads shorter than a frame produce truncated (even empty)
    frames with consistent offsets — no crash, 1:N fan-out intact."""
    from uforwarder_spark.functions.multimodal import N_FRAMES, multimodal_frame_sample

    docs = [(0, "abcd", "en", "web", 4), (1, "", "en", "web", 0)]
    d = tmp_path / "frames"
    spark.createDataFrame(docs, ["doc_id", "text", "lang", "source", "n_chars"]).write.mode(
        "overwrite"
    ).parquet(str(d / "documents.parquet"))
    rows = multimodal_frame_sample(spark, str(d)).collect()
    assert len(rows) == 2 * N_FRAMES
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert [r.frame_off for r in sorted(by_doc[0], key=lambda r: r.frame_idx)] == [0, 1, 2, 3]
    assert all(r.frame_len == 0 and r.frame_off == 0 for r in by_doc[1])


def test_shuffle_export_includes_empty_docs(spark, edge_dir):
    """D32: every doc ships to exactly one shard — including empty and
    punctuation-only docs (an export must not silently drop rows)."""
    from uforwarder_spark.operators.training import corpus_shuffle_export

    rows = corpus_shuffle_export(spark, edge_dir).collect()
    assert sorted(r.doc_id for r in rows) == [d[0] for d in EDGE_DOCS]
    for r in rows:
        assert 0 <= r.shard < 8 and r.pos >= 1


def test_sequence_packing_zero_token_docs(spark, edge_dir):
    """D33: zero-token docs occupy a sequence slot without advancing the
    budget or ever counting as boundary-crossing; totals conserve."""
    from uforwarder_spark.functions.tokenize import TOKENS_SPARK
    from uforwarder_spark.model import load_table
    from uforwarder_spark.operators.training import sequence_packing

    out = sequence_packing(spark, edge_dir).collect()
    total = sum(r.sum_tokens for r in out)
    expect = (
        load_table(spark, edge_dir, "documents")
        .select(F.expr(f"size({TOKENS_SPARK})").alias("t"))
        .agg(F.sum("t"))
        .collect()[0][0]
    )
    assert total == expect
    assert sum(r.n_docs for r in out) == len(EDGE_DOCS)
    assert all(r.n_crossing == 0 for r in out)  # tiny corpus: one seq per shard


def test_mixture_interleave_dense_positions(spark, edge_dir):
    """D34: the schedule is a permutation — dense positions 1..N, every
    doc exactly once, heavier sources never starved."""
    from uforwarder_spark.operators.training import mixture_interleave

    rows = sorted(mixture_interleave(spark, edge_dir).collect(), key=lambda r: r.position)
    assert [r.position for r in rows] == list(range(1, len(EDGE_DOCS) + 1))
    assert sorted(r.doc_id for r in rows) == [d[0] for d in EDGE_DOCS]


def test_incremental_dedup_actions(spark, tmp_path_factory):
    """D36: an incoming doc duplicating an EXISTING doc drops with the
    match recorded; an incoming near-copy of another INCOMING doc is
    kept (the asymmetric join never pairs incoming with incoming)."""
    from uforwarder_spark.operators.dedup import incremental_dedup

    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        # existing corpus (even source number)
        (0, base, "en", "src0", len(base)),
        (1, "completely unrelated text about spark shuffles", "en", "src2", 46),
        # incoming batch (odd source number)
        (10, base, "en", "src1", len(base)),                 # dup of 0 -> drop
        (11, "fresh new content never seen before today", "en", "src1", 41),  # keep
        (12, "fresh new content never seen before yesterday", "en", "src3", 45),  # near-dup of 11 but both incoming -> keep
    ]
    d = tmp_path_factory.mktemp("incr")
    spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))

    out = {r.doc_id: r for r in incremental_dedup(spark, str(d)).collect()}
    assert set(out) == {10, 11, 12}  # only incoming docs are decided
    assert out[10].action == "drop" and out[10].match_doc_id == 0
    assert out[10].jaccard == 1.0
    assert out[11].action == "keep" and out[11].match_doc_id is None
    assert out[12].action == "keep"


def test_ngram_novelty_edges(spark, edge_dir):
    from uforwarder_spark.functions.text import ngram_novelty

    rows = {r.doc_id: r for r in ngram_novelty(spark, edge_dir).collect()}
    assert len(rows) == len(EDGE_DOCS)  # every doc scored, even empty/short
    # doc 0 (empty) and doc 2 (punct-only) collapse to md5('') — first
    # occurrence wins, the later one is fully derivative
    assert rows[0].n_ngrams == 1 and rows[0].novel_frac == 1.0
    assert rows[2].novel_frac == 0.0
    # exact dup: doc 4 repeats every 5-gram of doc 3
    assert rows[3].novel_frac == 1.0
    assert rows[4].novel_frac == 0.0
    # near dup: doc 5 shares a prefix run but has novel grams around the edit
    assert 0.0 < rows[5].novel_frac < 1.0


def test_source_lang_kl_zero_for_mirror_mix(spark, edge_dir):
    from uforwarder_spark.functions.text import source_lang_kl

    rows = {r.source: r for r in source_lang_kl(spark, edge_dir).collect()}
    assert rows["books"].n_docs == 3 and rows["web"].n_docs == 5
    # books is all-en; corpus is 7/8 en -> books' KL = 1 * ln(8/7) > 0
    import math
    assert abs(rows["books"].kl_divergence - round(math.log(8 / 7), 8)) < 1e-9
    # web holds the only es doc -> strictly positive drift
    assert rows["web"].kl_divergence > 0


def test_int8_rescore_recall_and_exactness(spark, tmp_path):
    """D42's quantized scan must (a) never emit a hit whose exact cosine
    is wrong, and (b) recover the brute-force top-10 on a corpus where
    SQ8 reconstruction error is small relative to neighbor gaps."""
    import math
    import random

    rng = random.Random(11)
    rows = [(i, i % 3, [rng.uniform(-1, 1) for _ in range(64)]) for i in range(200)]
    spark.createDataFrame(rows, "vec_id long, label long, embedding array<float>").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "embeddings.parquet"))

    from uforwarder_spark.operators.similarity import (
        ann_topk_bruteforce,
        ann_topk_int8_rescore,
    )

    exact = {r.vec_id: r.cosine for r in ann_topk_bruteforce(spark, str(tmp_path)).collect()}
    got = ann_topk_int8_rescore(spark, str(tmp_path)).collect()
    # exactness: the rescored cosine equals brute force for shared ids
    for r in got:
        if r.vec_id in exact:
            assert math.isclose(r.cosine, exact[r.vec_id], abs_tol=1e-6)
    # recall: with C=50 candidates over n=200 the exact top-10 survives
    assert sum(1 for r in got if r.vec_id in exact) >= 9
    # the approximate score tracks the exact one (SQ8 error is bounded)
    assert all(abs(r.approx_cosine - r.cosine) < 0.05 for r in got)


def test_phash_dedup_exact_groups_and_near_dups(spark, tmp_path):
    """D64: byte-identical payloads share a phash (exact group, min
    doc_id canonical), a 1-char edit stays within the Hamming threshold
    (near-dup found via bands), and an unrelated doc matches nothing."""
    # 64-char payloads: every char IS a sampled pixel, so bit flips are
    # controllable. base: 32 low bytes then 32 high -> phash 0^32 1^32.
    # edited flips exactly 3 mid positions (20-22) -> Hamming 3 (<= 6),
    # bands 0/2/3 still collide. other: alternating -> no shared band.
    base = "a" * 32 + "z" * 32
    edited = base[:20] + "zzz" + base[23:]
    other = "az" * 32
    rows = [
        (0, base, "en", "src00", len(base)),
        (1, base, "en", "src01", len(base)),     # exact dup of 0
        (2, edited, "en", "src02", len(edited)),  # near dup of 0/1
        (3, other, "en", "src03", len(other)),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    from uforwarder_spark.functions.multimodal import multimodal_phash_dedup

    got = {r.doc_id: r for r in multimodal_phash_dedup(spark, str(tmp_path)).collect()}
    assert set(got) == {0, 1, 2, 3}
    assert got[0].phash == got[1].phash
    assert got[0].canonical_id == 0 and not got[0].is_exact_dup
    assert got[1].canonical_id == 0 and got[1].is_exact_dup
    # the edit moved few sampled bytes: same-band collision + small Hamming
    assert got[2].n_near_dups >= 2  # near-matches both copies of base
    assert not got[2].is_exact_dup
    assert got[3].n_near_dups == 0 and not got[3].is_exact_dup


def test_dsir_selection_prefers_target_like_docs(spark, tmp_path):
    """D63: candidate docs resembling the target distribution must
    carry strictly higher log-weights than candidates that don't, the
    selection only ever contains candidate-side (odd-source) docs, and
    every candidate appears when K exceeds the candidate count."""
    target = [(i, "alpha beta gamma " * 8, "en", "src00", 40) for i in range(10)]
    like = [(100 + i, "alpha beta gamma delta " * 6, "en", "src01", 40) for i in range(5)]
    unlike = [(200 + i, "zebra yak xylo wombat " * 6, "en", "src01", 40) for i in range(5)]
    spark.createDataFrame(
        target + like + unlike,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    from uforwarder_spark.operators.training import dsir_selection

    got = {r.doc_id: r for r in dsir_selection(spark, str(tmp_path)).collect()}
    assert set(got) == {r[0] for r in like + unlike}  # candidates only, all of them
    lw_like = min(got[i].log_weight for i, *_ in like)
    lw_unlike = max(got[i].log_weight for i, *_ in unlike)
    assert lw_like > lw_unlike


def test_ivf_int8_rescore_is_exact_within_probed_cells(spark, tmp_path):
    """D62: every returned cosine equals the brute-force exact value
    (rescore is full precision), hits only come from probed cells, and
    the SQ8 approximation error is bounded."""
    import random

    rng = random.Random(23)
    rows = [(i, i % 3, [rng.uniform(-1, 1) for _ in range(64)]) for i in range(200)]
    spark.createDataFrame(rows, "vec_id long, label long, embedding array<float>").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "embeddings.parquet"))

    from uforwarder_spark.operators.similarity import N_PROBE, ann_topk_ivf_int8

    got = ann_topk_ivf_int8(spark, str(tmp_path)).collect()
    assert len(got) == 10
    assert len({r.label for r in got}) <= N_PROBE  # cell pruning held
    # exact rescore: recompute the true cosine driver-side
    import math as _m

    vecs = {i: v for i, _, v in rows}
    qv = vecs[0]

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return d / _m.sqrt(sum(x * x for x in a) * sum(y * y for y in b))

    for r in got:
        assert _m.isclose(r.cosine, cos(vecs[r.vec_id], qv), abs_tol=1e-5)
        assert abs(r.approx_cosine - r.cosine) < 0.05  # bounded SQ8 error


def test_bloom_prefilter_has_no_false_negatives(spark, tmp_path):
    """Every true cross-side exact dup MUST be flagged maybe_dup (Bloom
    has no false negatives) and classified is_dup; FPs are possible but
    never counted as dups."""
    rows = [
        # existing corpus (even source) --------------------------------
        (0, "shared text one", "en", "src00", 15),
        (1, "shared text two", "en", "src02", 15),
        (2, "only in corpus", "en", "src04", 14),
        # incoming batch (odd source) ----------------------------------
        (10, "shared text one", "en", "src01", 15),   # exact dup
        (11, "  SHARED   text two ", "en", "src03", 20),  # dup after norm
        (12, "genuinely brand new", "en", "src05", 19),
        (13, "another fresh doc", "en", "src07", 17),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    from uforwarder_spark.operators.dedup import bloom_dedup_prefilter

    got = {r.doc_id: r for r in bloom_dedup_prefilter(spark, str(tmp_path)).collect()}
    assert set(got) == {10, 11, 12, 13}
    for dup_id in (10, 11):
        assert got[dup_id].maybe_dup and got[dup_id].is_dup
        assert not got[dup_id].bloom_false_positive
    for fresh_id in (12, 13):
        assert not got[fresh_id].is_dup  # may be a Bloom FP, never a dup
        assert got[fresh_id].bloom_false_positive == got[fresh_id].maybe_dup


def test_length_bucketing_overflow_docs_get_fitting_bucket(spark, tmp_path):
    """D50 (round-5 ADVICE): docs longer than the largest tuned edge
    must land in a power-of-two bucket that FITS them — bucket_len >=
    n_tok and padding_waste >= 0 for every bucket, never a negative
    waste from an undersized overflow bucket."""
    rows = [
        (0, "w " * 10, "en", "src00", 20),          # tuned bucket 16
        (1, "w " * 600, "en", "src01", 1200),       # overflow 1024
        (2, "w " * 1500, "en", "src02", 3000),      # overflow 2048
        (3, "w " * 5000, "en", "src03", 10000),     # overflow 8192
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    from uforwarder_spark.operators.training import length_bucketing

    got = {r.bucket_len: r for r in length_bucketing(spark, str(tmp_path)).collect()}
    assert set(got) == {16, 1024, 2048, 8192}
    for r in got.values():
        assert r.sum_padded >= r.sum_tokens, r
        assert r.padding_waste >= 0, r
        # power-of-two fit: halving the bucket would not fit its docs
        assert r.sum_tokens > r.n_docs * r.bucket_len // 2 or r.bucket_len == 16


def test_zipf_and_entropy_match_numpy(spark, tmp_path):
    """D44/D45 against independent numpy math on a hand-built corpus,
    plus the degenerate branches: a one-type vocabulary (zipf NULL) and
    a source with zero bigrams (absent from the entropy frame)."""
    import math

    import numpy as np

    rows = [
        (0, "alpha alpha alpha beta beta gamma delta", "en", "src01", 39),
        (1, "alpha beta beta epsilon zeta", "en", "src01", 28),
        (2, "same same same same", "en", "src03", 19),   # one-type vocab
        (3, "solo", "en", "src05", 4),                   # zero bigrams
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    from uforwarder_spark.functions.text import ngram_entropy, zipf_fit

    z = {r.source: r for r in zipf_fit(spark, str(tmp_path)).collect()}
    toks = "alpha alpha alpha beta beta gamma delta alpha beta beta epsilon zeta".split()
    freqs = sorted(
        [toks.count(t) for t in set(toks)], reverse=True
    )  # 4, 4, 1, 1, 1, 1 (alpha, beta, then singles)
    x = np.log(np.arange(1, len(freqs) + 1))
    y = np.log(np.array(freqs, dtype=float))
    slope = np.polyfit(x, y, 1)[0]
    assert math.isclose(z["src01"].zipf_slope, slope, abs_tol=1e-4)
    assert z["src01"].n_types == 6 and z["src01"].n_tokens == 12
    assert z["src03"].zipf_slope is None  # one-type vocab: zero variance

    e = {r.source: r for r in ngram_entropy(spark, str(tmp_path)).collect()}
    cnt = {t: toks.count(t) for t in set(toks)}
    h1 = -sum((c / 12) * math.log(c / 12) for c in cnt.values())
    assert math.isclose(e["src01"].unigram_entropy, h1, abs_tol=1e-4)
    assert math.isclose(e["src03"].unigram_entropy, 0.0, abs_tol=1e-9)
    assert e["src01"].cond_entropy <= e["src01"].unigram_entropy + 1e-9
    assert "src05" not in e  # no bigrams -> no next-token distribution


def test_ares_sample_is_weighted_and_reproducible(spark, tmp_path):
    """D47: a 10x-heavier doc must enter the per-source sample more often
    than a light one across many sources, and resampling is bit-stable."""
    rows = []
    for s in range(40):
        for i in range(30):
            doc_id = s * 100 + i
            n_chars = 2000 if i < 5 else 20  # 5 heavy docs per source
            rows.append((doc_id, "x" * 10, "en", f"src{s:02d}", n_chars))
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    from uforwarder_spark.functions.text import ARES_K, weighted_sample_ares

    got = weighted_sample_ares(spark, str(tmp_path)).collect()
    assert len(got) == 40 * ARES_K
    heavy = sum(1 for r in got if r.n_chars == 2000)
    # heavy docs are 5/30 of the pool but weight 100x: they should take
    # well over half the sample slots (expected ~5 of 10 per source
    # since all 5 heavies nearly surely beat the lights)
    assert heavy > 0.4 * len(got)
    again = weighted_sample_ares(spark, str(tmp_path)).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, again))


def test_cms_never_underestimates(spark, tmp_path):
    """D48: the CMS guarantee (estimate >= exact, always) on a skewed
    corpus, with the hot token correctly ranked first."""
    rows = []
    for i in range(60):
        text = ("hot " * 50 if i % 3 == 0 else f"tok{i} rare word here")
        rows.append((i, text.strip(), "en", f"src{i % 4:02d}", len(text)))
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    from uforwarder_spark.functions.text import cms_heavy_hitters

    got = cms_heavy_hitters(spark, str(tmp_path)).collect()
    assert all(r.overestimate >= 0 for r in got)  # the CMS invariant
    top = next(r for r in got if r.rank == 1)
    assert top.token == "hot" and top.freq == 20 * 50
    # estimates of the top token include every colliding count, so the
    # estimate for 'hot' is at least its own mass
    assert top.cms_estimate >= top.freq


def test_hll_accuracy_in_both_regimes(spark, tmp_path):
    """D49: linear counting must kick in below ~2.5m and the raw
    estimator above it; both regimes land within sane HLL error for
    m=64 (~13% stderr), and the estimate is reproducible."""
    rows = []
    # source A: 20 distinct tokens (small range -> linear counting)
    rows.append((0, " ".join(f"tok{i}" for i in range(20)), "en", "srcA", 100))
    # source B: 2000 distinct tokens (raw estimator regime)
    big = " ".join(f"word{i}" for i in range(2000))
    for j in range(4):
        rows.append((1 + j, big, "en", "srcB", len(big)))
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    from uforwarder_spark.functions.text import hll_distinct_tokens

    got = {r.source: r for r in hll_distinct_tokens(spark, str(tmp_path)).collect()}
    assert got["srcA"].exact_distinct == 20
    assert got["srcA"].rel_error < 0.35  # linear counting, tiny n
    assert got["srcB"].exact_distinct == 2000
    assert got["srcB"].rel_error < 0.40  # raw estimator, 3 sigma of 13%
    again = {r.source: r for r in hll_distinct_tokens(spark, str(tmp_path)).collect()}
    assert got["srcB"].hll_estimate == again["srcB"].hll_estimate


def test_budget_allocation_sums_exactly(spark, tmp_path):
    """D52: quotas always sum to the budget exactly, whatever the share
    skew, and every quota is floor or floor+1 of its raw entitlement."""
    rows = []
    sizes = {"srcA": 1, "srcB": 7, "srcC": 100, "srcD": 3}
    i = 0
    for src, n in sizes.items():
        for _ in range(n):
            rows.append((i, "alpha beta gamma delta epsilon", "en", src, 30))
            i += 1
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    from uforwarder_spark.operators.training import TOKEN_BUDGET, token_budget_allocation

    got = token_budget_allocation(spark, str(tmp_path)).collect()
    assert sum(r.quota_tokens for r in got) == TOKEN_BUDGET
    for r in got:
        assert r.quota_tokens in (r.quota_floor, r.quota_floor + 1)
    # temperature flattening: the dominant source cedes share to the tail
    by = {r.source: r for r in got}
    assert by["srcC"].quota_tokens < TOKEN_BUDGET * (100 / 111)
    assert by["srcA"].quota_tokens > TOKEN_BUDGET * (1 / 111)


def test_znorm_topk_is_shape_invariant(spark, tmp_path):
    """D53: z-normalization makes the match about SHAPE — a scaled+
    shifted copy of the query series must rank closest (distance ~0),
    a different shape further, a constant series excluded."""
    import datetime

    base = [float(x) for x in [1, 3, 2, 5, 4, 7, 6, 9, 8, 11, 10, 13, 12, 15, 14, 17]]
    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0

    def add_series(uid, vals):
        nonlocal eid
        for v in vals:
            rows.append((eid, t0 + datetime.timedelta(seconds=eid), uid, "click", v, "{}"))
            eid += 1

    add_series(1, base)                                   # query (min uid)
    add_series(2, [10.0 * v + 100.0 for v in base])       # same shape
    add_series(3, list(reversed(base)))                   # mirrored shape
    add_series(4, [5.0] * 16)                             # constant -> excluded
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

    from uforwarder_spark.operators.timeseries import timeseries_znorm_topk

    got = timeseries_znorm_topk(spark, str(tmp_path)).collect()
    assert [r.user_id for r in got] == [2, 3]  # 4 excluded, 1 is the query
    assert got[0].znorm_ed < 1e-6              # affine copy: distance ~ 0
    assert got[1].znorm_ed > 1.0               # mirrored: far


def test_cdc_chunks_are_shift_resistant(spark, tmp_path):
    """D55: after a head insertion, every chunk beyond the edited one
    must still hash identically (the property fixed-size chunking
    lacks), so the dup-chunk audit marks the tail shared."""
    base = (
        "the quick brown fox jumps over the lazy dog again and again "
        "while the cat watches from the fence and the birds fly south "
        "for winter as the river runs cold beneath the old stone bridge"
    )
    rows = [
        (0, base, "en", "src00", len(base)),
        (1, "XYZQ " + base, "en", "src01", len(base) + 5),  # head insertion
        (2, "totally different content here", "en", "src02", 30),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    from uforwarder_spark.operators.dedup import cdc_chunking

    rows_out = cdc_chunking(spark, str(tmp_path)).collect()
    h0 = {r.chunk_hash for r in rows_out if r.doc_id == 0}
    d1 = [r for r in rows_out if r.doc_id == 1]
    shared = [r for r in d1 if r.chunk_hash in h0]
    # all but the first chunk (which absorbed the insertion) re-align
    assert len(shared) >= len(d1) - 2 and len(shared) > 0
    assert all(r.is_dup_chunk for r in shared)  # keep-first dedup fired
    # the unrelated doc may share an incidental short chunk, but never
    # re-aligns wholesale like the edited copy does
    d2 = [r for r in rows_out if r.doc_id == 2]
    assert sum(1 for r in d2 if r.chunk_hash in h0) <= len(d2) // 2


def test_bm25_ranks_relevance_sanely(spark, tmp_path):
    """D57 semantics on a hand-built corpus: more query terms and higher
    tf beat fewer; a doc with no query term never appears; longer docs
    are length-penalized against an identical-tf shorter doc."""
    filler = " ".join(f"pad{i}" for i in range(60))
    rows = [
        (0, "spark query join spark query join", "en", "src00", 34),  # all terms, high tf
        (1, "spark alpha beta", "en", "src01", 16),                    # one term, short
        (2, "spark " + filler, "en", "src02", 200),                    # one term, long
        (3, "nothing relevant here", "en", "src03", 21),               # no terms
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    from uforwarder_spark.functions.text import bm25_topk

    got = bm25_topk(spark, str(tmp_path)).collect()
    ids = [r.doc_id for r in got]
    assert ids[0] == 0              # full-coverage high-tf doc wins
    assert 3 not in ids             # zero-term doc cannot score
    s = {r.doc_id: r.bm25_score for r in got}
    assert s[1] > s[2]              # same tf, shorter doc scores higher


def test_funnel_ordering_is_strict(spark, tmp_path):
    """C23 semantics: a click BEFORE the user's first view must not
    count; a user with clicks but no view reaches no step; purchase
    requires the click to have happened first."""
    import datetime

    t0 = datetime.datetime(2024, 1, 1)
    rows = []

    def ev(eid, uid, etype):
        rows.append((eid, t0 + datetime.timedelta(seconds=eid), uid, etype, 1.0, "{}"))

    # user 1: click(1) BEFORE view(2), then click(3), purchase(4): full funnel
    ev(1, 1, "click"); ev(2, 1, "view"); ev(3, 1, "click"); ev(4, 1, "purchase")
    # user 2: clicks only -> no step at all
    ev(10, 2, "click"); ev(11, 2, "click")
    # user 3: view then purchase WITHOUT click -> stops at step 1
    ev(20, 3, "view"); ev(21, 3, "purchase")
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

    from uforwarder_spark.plans.relational import funnel_conversion

    got = {r.step: r for r in funnel_conversion(spark, str(tmp_path)).collect()}
    assert got[1].n_users == 2   # users 1 and 3 viewed
    assert got[2].n_users == 1   # only user 1 clicked after viewing
    assert got[3].n_users == 1   # and purchased after that click
    assert got[2].conv_from_prev == 0.5
    assert got[3].conv_from_top == 0.5


def test_retention_cohort_math(spark, tmp_path):
    """C24: a user active in weeks w and w+2 contributes k=0 and k=2 to
    their cohort; k=0 retention is always 1.0."""
    import datetime

    week = datetime.timedelta(days=7)
    t0 = datetime.datetime(2024, 1, 7)
    rows = []
    eid = 0

    def ev(uid, when):
        nonlocal eid
        rows.append((eid, when, uid, "click", 1.0, "{}"))
        eid += 1

    ev(1, t0); ev(1, t0 + 2 * week)        # cohort w0, back in k=2
    ev(2, t0)                               # cohort w0, never returns
    ev(3, t0 + week); ev(3, t0 + 2 * week)  # cohort w1, back in k=1
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

    from uforwarder_spark.plans.relational import retention_cohorts

    got = {(r.cohort_week, r.week_k): r for r in retention_cohorts(spark, str(tmp_path)).collect()}
    cohorts = sorted({c for c, _ in got})
    w0, w1 = cohorts
    assert got[(w0, 0)].retention == 1.0 and got[(w0, 0)].cohort_size == 2
    assert got[(w0, 2)].n_active == 1 and got[(w0, 2)].retention == 0.5
    assert (w0, 1) not in got            # nobody from w0 active in k=1
    assert got[(w1, 1)].retention == 1.0


def test_perplexity_flags_surprising_docs(spark, tmp_path):
    """D60: a doc of corpus-rare tokens must score higher cross-entropy
    (and a worse band) than one of corpus-common tokens; empty docs
    emit no row."""
    common = "alpha beta gamma delta " * 10
    rows = [(i, common, "en", "src00", len(common)) for i in range(8)]
    rows.append((8, "zzq wxv qqj kkx pzt", "en", "src01", 19))  # rare mix
    rows.append((9, "", "en", "src02", 0))                       # empty
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    from uforwarder_spark.functions.text import unigram_perplexity

    got = {r.doc_id: r for r in unigram_perplexity(spark, str(tmp_path)).collect()}
    assert 9 not in got  # empty doc: nothing to score
    assert got[8].cross_entropy > got[0].cross_entropy
    assert got[8].ppl_band == "tail" and got[0].ppl_band == "head"


def test_embedding_agreement_flags_disagreeing_pairs(spark, tmp_path):
    """D66: a near-dup text pair with aligned embeddings agrees; a
    near-dup text pair with orthogonal embeddings is flagged for
    review; non-near-dup docs produce no pair at all."""
    t1 = "alpha beta gamma delta epsilon zeta eta theta " * 4
    t2 = t1 + "iota"
    t3 = "one two three four five six seven eight nine ten " * 4
    t4 = t3 + "eleven"
    rows = [
        (0, t1, "en", "src00", len(t1)),
        (1, t2, "en", "src01", len(t2)),   # near-dup of 0
        (2, t3, "en", "src02", len(t3)),
        (3, t4, "en", "src03", len(t4)),   # near-dup of 2
        (4, "totally unrelated content words here", "en", "src04", 36),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    dim = 64
    v_a = [1.0] + [0.0] * (dim - 1)
    v_b = [0.0] * (dim - 1) + [1.0]  # orthogonal to v_a
    emb = [
        (0, 0, v_a), (1, 0, v_a),     # pair (0,1): cosine 1 -> agree
        (2, 1, v_a), (3, 1, v_b),     # pair (2,3): cosine 0 -> disagree
        (4, 2, v_b),
    ]
    spark.createDataFrame(
        emb, "vec_id long, label long, embedding array<float>"
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))

    from uforwarder_spark.operators.dedup import dedup_embedding_agreement

    got = {
        (r.doc_a, r.doc_b): r
        for r in dedup_embedding_agreement(spark, str(tmp_path)).collect()
    }
    assert set(got) == {(0, 1), (2, 3)}
    assert got[(0, 1)].embeddings_agree and got[(0, 1)].cosine == 1.0
    assert not got[(2, 3)].embeddings_agree and got[(2, 3)].cosine == 0.0
    assert all(r.jaccard >= 0.5 for r in got.values())


def test_ngram_decon_short_docs_and_quoted_eval_text(spark, edge_dir, tmp_path):
    """Non-vacuous D67. (a) On the edge corpus every doc is shorter
    than the 13-token window, so no doc contributes grams — the
    operator must still return EVERY non-eval doc with zero counts
    (the short-doc CASE guard, the published rule). (b) On a seeded
    corpus, doc 1 quotes eval doc 51's 13-gram inside a LONGER page —
    the exact scenario D20's whole-doc hash misses — and must be the
    only contaminated doc, attributed to exactly one eval doc."""
    from uforwarder_spark.operators.dedup import ngram_decontamination

    rows = ngram_decontamination(spark, edge_dir).collect()
    assert len(rows) > 0
    assert all(r.n_gram_hits == 0 and not r.contaminated for r in rows)

    eval_text = "alpha bravo charlie delta echo foxtrot golf hotel india juliett kilo lima mike"
    docs = [
        # quotes the full 13-gram inside a longer page -> contaminated
        (1, "intro words then " + eval_text + " and a trailing sentence", "en", "web", 99),
        # shares only a 12-gram prefix -> clean under the 13-gram rule
        (2, "alpha bravo charlie delta echo foxtrot golf hotel india juliett kilo lima", "en", "web", 75),
        (3, "completely unrelated words about nothing in particular at all", "en", "books", 62),
        (51, eval_text, "en", "eval", 80),  # eval-set member (hash60(md5('51')) % 50 == 0)
    ]
    d = tmp_path / "decon"
    spark.createDataFrame(docs, ["doc_id", "text", "lang", "source", "n_chars"]).write.mode(
        "overwrite"
    ).parquet(str(d / "documents.parquet"))
    got = {r.doc_id: r for r in ngram_decontamination(spark, str(d)).collect()}
    assert 51 not in got  # eval docs are not training candidates
    assert got[1].contaminated and got[1].n_eval_docs == 1 and got[1].n_gram_hits >= 1
    assert not got[2].contaminated and got[2].n_gram_hits == 0
    assert not got[3].contaminated


def test_lsh_recall_audit_mid_curve_on_seeded_pairs(spark, tmp_path):
    """Non-vacuous D71: natural corpora only exercise the S-curve's
    ends (random pairs sit in decile 0, dups in decile 9), so seed ~48
    isolated pairs with Jaccard ≈ 0.45-0.55 (shared core shingles +
    per-pair salt words) and check the mid-decile observed collision
    rate sits within 3σ-binomial of the theoretical 1-(1-j^4)^8."""
    from uforwarder_spark.operators.dedup import AUDIT_MOD, lsh_recall_audit

    words = "alpha bravo charlie delta echo foxtrot golf hotel india juliett".split()
    docs = []
    did = 0
    for p in range(48):
        # two docs sharing a 12-token core; each adds 4 private tokens
        core = [words[(p + i) % 10] + str(p) for i in range(12)]
        a = core + [f"xx{p}w{i}" for i in range(4)]
        b = core + [f"yy{p}w{i}" for i in range(4)]
        for text_toks in (a, b):
            docs.append((did * AUDIT_MOD, " ".join(text_toks), "en", "web",
                         len(" ".join(text_toks))))  # all ids sampled
            did += 1
    d = tmp_path / "scurve"
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(d / "documents.parquet"))

    rows = {r.decile: r for r in lsh_recall_audit(spark, str(d)).collect()}
    mid = [r for dec, r in rows.items() if 3 <= dec <= 6]
    n_mid = sum(r.n_pairs for r in mid)
    assert n_mid >= 40  # the seeded pairs landed mid-curve
    obs = sum(r.n_candidates for r in mid) / n_mid
    exp = sum(r.expected_rate * r.n_pairs for r in mid) / n_mid
    sigma = (exp * (1 - exp) / n_mid) ** 0.5
    assert abs(obs - exp) <= max(3 * sigma, 0.15), (obs, exp)
    # the unrelated cross pairs stay in decile 0 and (almost) never collide
    assert rows[0].observed_rate <= 0.01


def test_exact_substring_spans_merge_and_count(spark, tmp_path):
    """Non-vacuous D73: a seeded corpus with a KNOWN repeated 60-token
    span shared by two docs, a clean doc, and a doc whose repetition
    is internal (the same 55-token run twice in one doc) — the
    published rule counts same-doc repeats too. Checks the exact span
    arithmetic: a repeated run of L tokens yields L-W+1 duplicated
    windows merging into ONE island of exactly L duplicated tokens."""
    from uforwarder_spark.operators.dedup import ES_W, exact_substring_dedup

    W = ES_W
    shared = " ".join(f"tok{i}" for i in range(60))  # 60-token shared run
    uniq_a = " ".join(f"ua{i}" for i in range(40))
    uniq_b = " ".join(f"ub{i}" for i in range(40))
    run55 = " ".join(f"rep{i}" for i in range(55))
    filler = " ".join(f"fill{i}" for i in range(60))
    docs = [
        (1, uniq_a + " " + shared, "en", "web", 10),
        (2, shared + " " + uniq_b, "en", "web", 10),
        (3, " ".join(f"clean{i}" for i in range(80)), "en", "books", 10),
        (4, run55 + " " + filler + " " + run55, "en", "web", 10),
    ]
    d = tmp_path / "es"
    spark.createDataFrame(docs, ["doc_id", "text", "lang", "source", "n_chars"]).write.mode(
        "overwrite"
    ).parquet(str(d / "documents.parquet"))
    got = {r.doc_id: r for r in exact_substring_dedup(spark, str(d)).collect()}

    # docs 1 and 2: exactly the 60 shared tokens are duplicated —
    # 60-W+1 = 11 windows, one island, 60 tokens
    for did in (1, 2):
        r = got[did]
        assert r.flagged and r.n_spans == 1
        assert r.n_dup_windows == 60 - W + 1
        assert r.n_dup_tokens == 60
    assert got[1].n_tokens == 100 and got[2].n_tokens == 100
    # doc 3: clean
    assert not got[3].flagged and got[3].n_dup_tokens == 0 and got[3].n_spans == 0
    # doc 4: the 55-token run repeats WITHIN the doc — both copies are
    # duplicated text (2 islands of 55 tokens, 6 windows each)
    r = got[4]
    assert r.flagged and r.n_spans == 2
    assert r.n_dup_windows == 2 * (55 - W + 1)
    assert r.n_dup_tokens == 2 * 55


def test_incr_substring_gate_is_asymmetric(spark, tmp_path):
    """Non-vacuous D74: the gate must flag ONLY incoming spans present
    in the EXISTING corpus — a 60-token run shared by two INCOMING docs
    (src1/src3) must NOT flag (no incoming-incoming pairs), while the
    incoming doc quoting an existing doc's run must flag exactly that
    span; existing docs never appear in the output."""
    from uforwarder_spark.operators.dedup import ES_W, incr_substring_dedup

    W = ES_W
    ex_run = " ".join(f"ex{i}" for i in range(60))
    in_run = " ".join(f"inr{i}" for i in range(60))
    pad = " ".join(f"pad{i}" for i in range(40))
    docs = [
        (1, pad + " " + ex_run, "en", "src0", 10),           # existing
        (2, " ".join(f"other{i}" for i in range(80)), "en", "src2", 10),  # existing
        (3, ex_run + " " + " ".join(f"ua{i}" for i in range(40)), "en", "src1", 10),
        (4, in_run + " " + pad, "en", "src1", 10),           # incoming
        (5, pad + " " + in_run, "en", "src3", 10),           # incoming
    ]
    d = tmp_path / "ies"
    spark.createDataFrame(docs, ["doc_id", "text", "lang", "source", "n_chars"]).write.mode(
        "overwrite"
    ).parquet(str(d / "documents.parquet"))
    got = {r.doc_id: r for r in incr_substring_dedup(spark, str(d)).collect()}
    assert set(got) == {3, 4, 5}  # incoming docs only
    # doc 3 quotes the existing run: exactly 60 tokens, one span
    assert got[3].flagged and got[3].n_spans == 1
    assert got[3].n_dup_windows == 60 - W + 1 and got[3].n_dup_tokens == 60
    # docs 4/5 share a run ONLY with each other -> asymmetry keeps them clean
    assert not got[4].flagged and got[4].n_dup_tokens == 0
    assert not got[5].flagged and got[5].n_dup_tokens == 0


def test_span_removal_cuts_exactly_the_islands(spark, tmp_path):
    """Non-vacuous D78: on the seeded corpus the cleaned output must be
    exactly the original tokens minus the duplicated islands — checked
    against a by-hand reconstruction, including a fully-duplicated doc
    that must clean to the empty string."""
    import hashlib

    from uforwarder_spark.operators.dedup import substring_span_removal

    shared = " ".join(f"tok{i}" for i in range(60))
    uniq_a = " ".join(f"ua{i}" for i in range(40))
    uniq_b = " ".join(f"ub{i}" for i in range(40))
    docs = [
        (1, uniq_a + " " + shared, "en", "src0", 10),
        (2, shared + " " + uniq_b, "en", "src1", 10),
        (3, shared, "en", "src2", 10),  # nothing but the shared run
        (4, " ".join(f"clean{i}" for i in range(80)), "en", "src3", 10),
    ]
    d = tmp_path / "sr"
    spark.createDataFrame(docs, ["doc_id", "text", "lang", "source", "n_chars"]).write.mode(
        "overwrite"
    ).parquet(str(d / "documents.parquet"))
    got = {r.doc_id: r for r in substring_span_removal(spark, str(d)).collect()}

    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()
    assert got[1].n_tokens_cut == 60 and got[1].cleaned_md5 == md5(uniq_a)
    assert got[2].n_tokens_cut == 60 and got[2].cleaned_md5 == md5(uniq_b)
    # doc 3 is ALL duplicated text -> empty after the cut
    assert got[3].n_tokens_kept == 0 and got[3].cleaned_md5 == md5("")
    assert got[4].n_tokens_cut == 0 and got[4].cleaned_md5 == md5(
        " ".join(f"clean{i}" for i in range(80))
    )


def test_decon_span_removal_cuts_only_the_quote(spark, tmp_path):
    """Non-vacuous D80: the doc quoting a full eval 13-gram inside a
    longer page loses EXACTLY the quoted window's tokens (not the whole
    doc — the surgical alternative to D67's drop); the 12-gram-prefix
    doc and the unrelated doc pass through byte-identical; eval docs
    never appear. Reuses D67's seeded scenario so the two operators'
    verdicts can be compared on the same corpus."""
    import hashlib

    from uforwarder_spark.operators.dedup import (
        decon_span_removal,
        ngram_decontamination,
    )

    eval_text = "alpha bravo charlie delta echo foxtrot golf hotel india juliett kilo lima mike"
    pre, post = "intro words then", "and a trailing sentence"
    docs = [
        (1, pre + " " + eval_text + " " + post, "en", "web", 99),
        (2, "alpha bravo charlie delta echo foxtrot golf hotel india juliett kilo lima", "en", "web", 75),
        (3, "completely unrelated words about nothing in particular at all", "en", "books", 62),
        (51, eval_text, "en", "eval", 80),  # eval member (hash rule)
    ]
    d = tmp_path / "dsr"
    spark.createDataFrame(docs, ["doc_id", "text", "lang", "source", "n_chars"]).write.mode(
        "overwrite"
    ).parquet(str(d / "documents.parquet"))
    got = {r.doc_id: r for r in decon_span_removal(spark, str(d)).collect()}
    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()

    assert set(got) == {1, 2, 3}
    # doc 1: exactly the 13 quoted tokens cut; intro + trailing survive
    r = got[1]
    assert r.n_spans == 1 and r.n_matched_windows == 1 and r.n_tokens_cut == 13
    assert r.cleaned_md5 == md5((pre + " " + post).lower())
    # doc 2 (12-gram prefix only) and doc 3 pass through untouched
    assert got[2].n_tokens_cut == 0 and got[2].cleaned_md5 == md5(docs[1][1].lower())
    assert got[3].n_tokens_cut == 0

    # consistency with the D67 verdict on the same corpus: cut iff drop
    d67 = {r.doc_id: r.contaminated for r in ngram_decontamination(spark, str(d)).collect()}
    for did, r in got.items():
        assert (r.n_tokens_cut > 0) == d67[did]


def test_kmv_degrades_to_exact_on_tiny_sources(spark, edge_dir):
    """D81 edge: when every source holds fewer than K distinct shingles
    the sketches ARE the sets — the KMV estimates must equal the exact
    audit bit-for-bit (k_used < K path)."""
    from uforwarder_spark.operators.dedup import KMV_K, kmv_sketch_overlap

    rows = kmv_sketch_overlap(spark, edge_dir).collect()
    assert len(rows) == 1  # sources {books, web} -> one pair
    r = rows[0]
    assert (r.src_a, r.src_b) == ("books", "web")
    assert r.k_used < KMV_K
    assert r.kmv_jacc == r.exact_jacc and r.jacc_abs_err == 0.0
    assert r.kmv_union_est == float(r.n_a + r.n_b - r.exact_inter)
    assert abs(r.kmv_inter_est - r.exact_inter) <= 0.01


def test_multi_epoch_accounting_invariants(spark, tmp_path):
    """D104: the accounting identities hold under skew, BOTH branches
    of the effective-epochs formula are exercised (a dominant source
    the budget cannot exhaust → epochs < 1 → effective == actual; tiny
    boosted sources → epochs >> 1 → the Muennighoff decay), and the
    numbers agree with a pure-Python recomputation from the D39/D52
    frames."""
    import math

    rows = []
    # srcBig's token supply (4000 docs x ~400 tokens = 1.6M) exceeds
    # the 1M budget, so even its near-total flattened share leaves
    # quota < supply (epochs < 1); the tiny sources repeat heavily
    big_text = " ".join(["alpha beta gamma delta epsilon zeta"] * 67)
    sizes = {"srcBig": 4000, "srcT1": 3, "srcT2": 10}
    i = 0
    for src, n in sizes.items():
        text = big_text if src == "srcBig" else "alpha beta gamma delta epsilon zeta"
        for _ in range(n):
            rows.append((i, text, "en", src, len(text)))
            i += 1
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    from uforwarder_spark.operators.training import (
        MULTI_EPOCH_RSTAR,
        multi_epoch_token_accounting,
        token_budget_allocation,
    )

    got = {r.source: r for r in multi_epoch_token_accounting(spark, str(tmp_path)).collect()}
    quotas = {r.source: r.quota_tokens for r in token_budget_allocation(spark, str(tmp_path)).collect()}
    assert set(got) == set(sizes)
    saw_under = saw_over = False
    for src, r in got.items():
        assert r.quota_tokens == quotas[src], src  # D52 composition exact
        # identities
        assert r.unique_tokens_seen == min(r.quota_tokens, r.n_tokens)
        assert r.repeated_tokens == r.quota_tokens - r.unique_tokens_seen
        assert r.full_epochs == math.floor(r.quota_tokens / r.n_tokens)
        ep = r.quota_tokens / r.n_tokens
        assert abs(r.epochs - round(ep, 6)) < 1e-9
        if ep <= 1:
            saw_under = True
            assert r.effective_epochs == round(ep, 6), src
            assert r.repeated_tokens == 0, src
        else:
            saw_over = True
            want = round(
                1
                + MULTI_EPOCH_RSTAR
                * (1 - round(math.exp(-((ep - 1) / MULTI_EPOCH_RSTAR)), 8)),
                6,
            )
            assert abs(r.effective_epochs - want) < 1e-9, src
            # repetition is worth less than fresh data, more than one epoch
            assert 1 < r.effective_epochs < ep, src
        assert abs(r.effective_tokens - round(r.n_tokens * r.effective_epochs, 2)) < 1e-6
    assert saw_under and saw_over, (
        "test corpus must exercise BOTH effective-epochs branches: "
        + str({s: (got[s].epochs) for s in got})
    )


def test_domain_dedup_caps_model(spark, tmp_path):
    """D103: keep-first semantics against a pure-Python model on a
    corpus built to collide — identical texts on the same pseudo-domain
    share a URL (crawl re-fetch), near-identical whitespace variants
    normalize together, and one domain overflows its cap."""
    import hashlib

    from uforwarder_spark.operators.dedup import (
        DOMAIN_DOC_CAP,
        DOMAINS_PER_SOURCE,
        PAGES_PER_DOMAIN,
        domain_dedup_caps,
    )

    def h60(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    texts = [
        "alpha beta gamma",
        "alpha  beta\tgamma",  # normalizes to the same URL bucket as above
        "delta epsilon",
        "zeta eta theta iota",
        "kappa",
        "lambda mu nu",
    ]
    rows = [
        (i, texts[i % len(texts)], "en", "srcX", len(texts[i % len(texts)]))
        for i in range(40)
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    # pure-Python model
    import re

    urls = {}
    for doc_id, text, _, src, _ in rows:
        dom = f"{src}.d{h60(str(doc_id)) % DOMAINS_PER_SOURCE}"
        norm = re.sub(r"\s+", " ", text.lower()).strip()
        url = f"{dom}/p{h60(norm) % PAGES_PER_DOMAIN}"
        key = (src, dom, url)
        if key not in urls or doc_id < urls[key][0]:
            n = urls.get(key, (doc_id, 0))[1]
            urls[key] = (min(doc_id, urls.get(key, (doc_id,))[0]), n + 1)
        else:
            urls[key] = (urls[key][0], urls[key][1] + 1)
    doms = {}
    for (src, dom, url), (rep, n) in urls.items():
        doms.setdefault((src, dom), []).append((rep, n))
    want = {}
    for (src, dom), lst in doms.items():
        lst.sort()
        n_urls = len(lst)
        want[(src, dom)] = dict(
            n_docs=sum(n for _, n in lst),
            n_urls=n_urls,
            n_url_dups=sum(n for _, n in lst) - n_urls,
            n_kept=min(n_urls, DOMAIN_DOC_CAP),
            n_overflow=max(0, n_urls - DOMAIN_DOC_CAP),
            first_doc_id=lst[0][0],
        )

    got = {
        (r.source, r.domain): r for r in domain_dedup_caps(spark, str(tmp_path)).collect()
    }
    assert set(got) == set(want)
    overflowed = False
    dup_seen = False
    for k, w in want.items():
        r = got[k]
        for f, v in w.items():
            assert getattr(r, f) == v, (k, f, getattr(r, f), v)
        overflowed = overflowed or w["n_overflow"] > 0
        dup_seen = dup_seen or w["n_url_dups"] > 0
    assert dup_seen, "corpus must exercise URL-level dups"


def test_sentence_span_dedup_keep_one_by_hand(spark, tmp_path):
    """Non-vacuous D105: on a hand-built corpus the canonical (lowest
    doc_id, lowest position) occurrence of a repeated three-sentence
    span survives untouched, every other occurrence is cut — including
    a doc that is NOTHING BUT the repeated span (cleans to empty) —
    and unique docs pass through."""
    import hashlib

    from uforwarder_spark.operators.dedup import sentence_span_dedup

    # sentences terminate at the stopword; the splitter lowercases and
    # strips punctuation, so these literals are already normalized
    S1, S2, S3 = "alpha beta the", "gamma delta of", "eps zeta to"
    U = "uniq1 uniq2"  # trailing fragment with no terminator
    V = "vee one and"
    docs = [
        (1, f"{S1} {S2} {S3} {U}", "en", "src0", 10),  # canonical holder
        (2, f"{V} {S1} {S2} {S3}", "en", "src1", 10),  # cuts the span
        (3, f"{S1} {S2} {S3}", "en", "src2", 10),      # all span -> empty
        (4, "solo1 solo2 in solo3 solo4 on solo5 for solo6", "en", "src3", 10),
    ]
    d = tmp_path / "ssd"
    spark.createDataFrame(docs, ["doc_id", "text", "lang", "source", "n_chars"]).write.mode(
        "overwrite"
    ).parquet(str(d / "documents.parquet"))
    got = {r.doc_id: r for r in sentence_span_dedup(spark, str(d)).collect()}

    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()  # noqa: E731
    assert got[1].n_sentences_cut == 0  # canonical survives whole
    assert got[1].cleaned_md5 == md5("|".join([S1, S2, S3, U]))
    assert got[2].n_sentences_cut == 3 and got[2].cleaned_md5 == md5(V)
    assert got[3].n_sentences_kept == 0 and got[3].cleaned_md5 == md5("")
    assert got[4].n_sentences_cut == 0


def test_incr_sentence_gate_cuts_only_corpus_matches(spark, tmp_path):
    """Non-vacuous D106: only spans present in the EXISTING corpus
    (even sources) are cut from incoming docs (odd sources); a span
    shared between two INCOMING docs is not cut (the corpus is the
    only canonical), and existing docs never appear in the output."""
    import hashlib

    from uforwarder_spark.operators.dedup import incr_sentence_span_dedup

    S1, S2, S3 = "alpha beta the", "gamma delta of", "eps zeta to"
    W = "dub one the dub two of dub three to"  # 3 sentences, incoming-only
    V = "vee one and"
    docs = [
        (1, f"{S1} {S2} {S3}", "en", "src0", 10),      # existing corpus
        (2, f"{V} {S1} {S2} {S3}", "en", "src1", 10),  # incoming: cut
        (3, W, "en", "src1", 10),                       # incoming twin A
        (4, W, "en", "src3", 10),                       # incoming twin B
    ]
    d = tmp_path / "isg"
    spark.createDataFrame(docs, ["doc_id", "text", "lang", "source", "n_chars"]).write.mode(
        "overwrite"
    ).parquet(str(d / "documents.parquet"))
    got = {r.doc_id: r for r in incr_sentence_span_dedup(spark, str(d)).collect()}

    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()  # noqa: E731
    assert set(got) == {2, 3, 4}  # existing doc 1 emits nothing
    assert got[2].n_sentences_cut == 3 and got[2].cleaned_md5 == md5(V)
    # incoming-vs-incoming repeat: NOT in the corpus, so NOT cut
    assert got[3].n_sentences_cut == 0 and got[4].n_sentences_cut == 0


def test_line_dedup_keep_first_and_adjacent_runs(spark, tmp_path):
    """Non-vacuous D107: a repeated line keeps only its lexicographic-
    first occurrence — including repeats WITHIN one doc — and adjacent
    cut lines collapse into one span."""
    import hashlib

    from uforwarder_spark.operators.dedup import line_dedup

    L, X, Y = "alpha beta the", "ex one of", "why two to"
    docs = [
        (1, f"{L} {X}", "en", "src0", 10),       # canonical holder of L
        (2, f"{L} {Y} {L}", "en", "src1", 10),   # both copies cut
        (3, f"{L} {L} solo", "en", "src2", 10),  # adjacent run -> 1 span
    ]
    d = tmp_path / "ld"
    spark.createDataFrame(docs, ["doc_id", "text", "lang", "source", "n_chars"]).write.mode(
        "overwrite"
    ).parquet(str(d / "documents.parquet"))
    got = {r.doc_id: r for r in line_dedup(spark, str(d)).collect()}

    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()  # noqa: E731
    assert got[1].n_sentences_cut == 0
    assert got[1].cleaned_md5 == md5("|".join([L, X]))
    assert got[2].n_sentences_cut == 2 and got[2].cleaned_md5 == md5(Y)
    assert got[2].n_spans == 2  # positions 0 and 2: non-adjacent runs
    assert got[3].n_sentences_cut == 2 and got[3].n_spans == 1  # adjacent run
    assert got[3].cleaned_md5 == md5("solo")


def test_contamination_fraction_tiers_by_hand(spark, tmp_path):
    """Non-vacuous D108: hand-built docs land in each tier — an eval
    clone reads 'dirty' (100% coverage), a doc quoting one window is
    'not_clean' or 'clean' by exact integer arithmetic, an untouched
    doc is 'clean' — and eval docs are held out of the output."""
    import hashlib

    from uforwarder_spark.operators.dedup import (
        EVAL_MOD,
        NGRAM_DECON_N,
        contamination_fraction,
    )

    def is_eval(i):
        return int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16) % EVAL_MOD == 0

    eval_id = next(i for i in range(10_000) if is_eval(i))
    non_eval = [i for i in range(10_000) if not is_eval(i)][:4]
    N = NGRAM_DECON_N
    eval_toks = [f"ev{i}" for i in range(2 * N)]  # 26 tokens
    quote = eval_toks[:N]  # one shared window
    filler = [f"fill{i}" for i in range(3 * N)]
    docs = [
        (eval_id, " ".join(eval_toks), "en", "src0", 10),
        # clone of the eval doc: every window matches -> coverage 100%
        (non_eval[0], " ".join(eval_toks), "en", "src1", 10),
        # 13 contaminated of 52 tokens -> exactly 25% -> not_clean
        (non_eval[1], " ".join(quote + filler), "en", "src2", 10),
        (non_eval[2], " ".join(filler), "en", "src0", 10),
        # ZERO tokens after [a-z0-9] tokenization (ADVICE r12): the
        # 0/0 guard must read frac 0.0 / 'clean', not NULL-vs-NaN
        (non_eval[3], "!!! ??? ---", "en", "src1", 10),
    ]
    d = tmp_path / "cf"
    spark.createDataFrame(docs, ["doc_id", "text", "lang", "source", "n_chars"]).write.mode(
        "overwrite"
    ).parquet(str(d / "documents.parquet"))
    got = {r.doc_id: r for r in contamination_fraction(spark, str(d)).collect()}

    assert eval_id not in got  # held out
    assert got[non_eval[0]].verdict == "dirty"
    assert got[non_eval[0]].n_tokens_contaminated == 2 * N
    r = got[non_eval[1]]
    assert (r.n_tokens_contaminated, r.n_tokens) == (N, N + 3 * N)
    assert r.verdict == "not_clean"  # 13*5 >= 52 exactly at the 20% line? 65 >= 52 -> yes
    assert got[non_eval[2]].verdict == "clean"
    assert got[non_eval[2]].n_tokens_contaminated == 0
    z = got[non_eval[3]]
    assert (z.n_tokens, z.contam_frac, z.verdict) == (0, 0.0, "clean")


def test_contamination_fraction_zero_token_oracle_parity(spark, duck, tmp_path):
    """ADVICE r12 (operators/dedup.py contam_frac 0/0): the unguarded
    fraction reads NULL in Spark (non-ANSI Divide) but NaN in DuckDB
    (IEEE) on a zero-token doc, breaking the driver's value hash on
    exactly that row. Both engines now guard on n_tokens = 0 — this
    runs the REGISTERED oracle SQL against a corpus that contains such
    a doc, the comparison the stock parity suite can't exercise
    (driver testdata has no zero-token text)."""
    import hashlib

    from uforwarder_spark.operators.dedup import EVAL_MOD
    from uforwarder_spark.registry import ORACLES, QUERIES

    from .parity import assert_parity

    def is_eval(i):
        return int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16) % EVAL_MOD == 0

    eval_id = next(i for i in range(10_000) if is_eval(i))
    non_eval = [i for i in range(10_000) if not is_eval(i)][:2]
    docs = [
        (eval_id, "ev one two three four", "en", "src0", 10),
        (non_eval[0], "plain english words here", "en", "src1", 10),
        (non_eval[1], "!!! ??? ---", "en", "src2", 10),  # zero tokens
    ]
    d = tmp_path / "cfp"
    spark.createDataFrame(docs, ["doc_id", "text", "lang", "source", "n_chars"]).write.mode(
        "overwrite"
    ).parquet(str(d / "documents.parquet"))
    spark_pdf = QUERIES["contamination_fraction"](spark, str(d)).toPandas()
    duck.execute(
        "CREATE OR REPLACE VIEW documents AS "
        f"SELECT * FROM read_parquet('{d}/documents.parquet/*.parquet')"
    )
    duck_pdf = duck.execute(ORACLES["contamination_fraction"]).fetchdf()
    assert_parity(spark_pdf, duck_pdf, "contamination_fraction")
    z = spark_pdf[spark_pdf.doc_id == non_eval[1]].iloc[0]
    assert (z.n_tokens, z.contam_frac, z.verdict) == (0, 0.0, "clean")


def test_paragraph_span_dedup_blocks_by_hand(spark, tmp_path):
    """Non-vacuous D109: a repeated 4-sentence paragraph block keeps
    only its first occurrence (including in-doc repeats); a 6-sentence
    doc splits into one full block plus its 2-sentence tail paragraph;
    a doc that was ALL duplicate paragraphs keeps nothing."""
    import hashlib

    from uforwarder_spark.operators.dedup import PARA_G, paragraph_span_dedup

    assert PARA_G == 4  # the hand arithmetic below assumes it
    P = "p one the p two of p three to p four and"  # one full block
    Q = "q one the q two of q three to q four and"
    R = "r one the r two of r three to r four and"
    tail = "t one the t two of"  # 2 sentences
    docs = [
        (1, f"{P} {Q}", "en", "src0", 10),  # canonical holder of P, Q
        (2, P, "en", "src1", 10),           # all-duplicate: kept empty
        (3, f"{R} {P}", "en", "src2", 10),  # P cut, R kept
        (4, f"{P} {tail}", "en", "src0", 10),  # full block + partial tail
        (5, f"{P} {P}", "en", "src1", 10),  # in-doc repeat: both cut
    ]
    d = tmp_path / "pd"
    spark.createDataFrame(docs, ["doc_id", "text", "lang", "source", "n_chars"]).write.mode(
        "overwrite"
    ).parquet(str(d / "documents.parquet"))
    got = {r.doc_id: r for r in paragraph_span_dedup(spark, str(d)).collect()}

    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()  # noqa: E731
    assert got[1].n_paragraphs == 2 and got[1].n_paragraphs_cut == 0
    assert got[1].cleaned_md5 == md5("|".join([P, Q]))
    assert got[2].n_paragraphs_cut == 1 and got[2].cleaned_md5 == md5("")
    assert got[3].n_paragraphs_cut == 1 and got[3].cleaned_md5 == md5(R)
    assert got[4].n_paragraphs == 2  # partial tail is its own paragraph
    assert got[4].n_paragraphs_cut == 1 and got[4].cleaned_md5 == md5(tail)
    assert got[5].n_paragraphs_cut == 2 and got[5].cleaned_md5 == md5("")
    assert got[5].n_spans == 1  # adjacent cut paragraphs: one run
