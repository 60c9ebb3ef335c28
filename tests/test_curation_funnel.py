"""The composed span-family curation funnel (VERDICT r11 #5):
drift-locks each funnel stage against the registered operator's
cleaned_md5, proves the one ordering that genuinely commutes
(exact dedup vs decon drop), and proves the span rules are
alternative grades rather than chainable stages (line dedup makes
any later window rule vacuous)."""

from __future__ import annotations

import hashlib

import pytest

from uforwarder_spark.functions.tokenize import STOPWORDS

SW = set(STOPWORDS)


def sents_of(text):
    out, cur = [], []
    for t in text.lower().split():
        cur.append(t)
        if t in SW:
            out.append(" ".join(cur))
            cur = []
    if cur:
        out.append(" ".join(cur))
    return out


def _write(spark, tmp_path, docs, name="fc"):
    d = tmp_path / name
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    return str(d)


def _docs_frame(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


SEED = [
    # line L repeated across docs; span P1 P2 P3 repeated; filler
    (0, "alpha beta the gamma of line one the", "en", "src0", 10),
    (1, "line one the p1 a p2 of p3 to tail x", "en", "src1", 10),
    (2, "p1 a p2 of p3 to other y and line one the", "en", "src2", 10),
    (3, "solo words without repeats here and", "en", "src0", 10),
    (4, "solo words without repeats here and", "en", "src1", 10),  # exact dup of 3
]


@pytest.mark.parametrize("s", [1, 3], ids=["lines", "spans"])
def test_span_stage_drift_locked_to_registered_operator(spark, tmp_path, s):
    """The funnel's span stage must rebuild EXACTLY the kept sentences
    the registered operator (line_dedup / sentence_span_dedup) hashes:
    re-splitting the stage's rebuilt text and '|'-joining equals the
    operator's cleaned_md5 per doc; docs the stage dropped are exactly
    the operator's cut-to-nothing docs."""
    from uforwarder_spark.operators.dedup import line_dedup, sentence_span_dedup
    from uforwarder_spark.operators.funnel import span_dedup_stage

    d = _write(spark, tmp_path, SEED)
    op = line_dedup if s == 1 else sentence_span_dedup
    want = {r.doc_id: r.cleaned_md5 for r in op(spark, d).collect()}
    got = {
        r.doc_id: hashlib.md5("|".join(sents_of(r.text)).encode()).hexdigest()
        for r in span_dedup_stage(
            _docs_frame(spark, d).select("doc_id", "text"), s
        ).collect()
    }
    empty = hashlib.md5(b"").hexdigest()
    for doc_id, md5 in want.items():
        if md5 == empty:
            assert doc_id not in got  # cut to nothing -> dropped
        else:
            assert got[doc_id] == md5, f"doc {doc_id} drifted at s={s}"
    # docs below the sentence threshold pass through UNTOUCHED (the
    # concat_ws-on-NULL trap: they must not be dropped or blanked)
    below = set(r.doc_id for r in _docs_frame(spark, d).collect()) - set(want)
    assert below <= set(got)


def test_exact_dedup_commutes_with_decon_drop(spark, tmp_path):
    """The one ordering that genuinely commutes: exact dedup (keep-first
    per text class) vs the decon DROP decision (a pure predicate of
    text) land on the same kept doc_id set in either order — classes
    are unchanged by a filter, and the predicate is constant within a
    class. (The CUT grade rewrites text and does NOT commute — two
    different docs can rewrite to the same text — which is why its
    position in FUNNEL_ORDER is a contract, not a convenience.)"""
    from uforwarder_spark.operators.dedup import (
        decon_eval_filter,
        decon_grams_frame,
    )
    from uforwarder_spark.operators.funnel import (
        decon_tier_stage,
        exact_dedup_stage,
    )

    # find a real eval doc id (hash-selected), clone its text into
    # non-eval docs so the drop grade fires; plant exact duplicates
    import hashlib as hl

    from uforwarder_spark.operators.dedup import EVAL_MOD

    def is_eval(i):
        return int(hl.md5(str(i).encode()).hexdigest()[:15], 16) % EVAL_MOD == 0

    eval_id = next(i for i in range(10_000) if is_eval(i))
    ne = [i for i in range(10_000) if not is_eval(i)][:4]
    ev_text = " ".join(f"ev{j}" for j in range(20)) + " the"
    clean = "totally unrelated clean words here and"
    docs = [
        (eval_id, ev_text, "en", "src0", 10),
        (ne[0], ev_text, "en", "src1", 10),  # dirty clone A
        (ne[1], ev_text, "en", "src2", 10),  # dirty clone B (exact dup of A)
        (ne[2], clean, "en", "src0", 10),
        (ne[3], clean, "en", "src1", 10),  # clean exact dup
    ]
    d = _write(spark, tmp_path, docs, "commute")
    frame = _docs_frame(spark, d)
    is_ev = decon_eval_filter()
    eval_grams = (
        decon_grams_frame(frame.filter(is_ev).select("doc_id", "text"))
        .select("g")
        .distinct()
    )
    base = frame.filter(~is_ev).select("doc_id", "text")
    a = exact_dedup_stage(decon_tier_stage(base, eval_grams))
    b = decon_tier_stage(exact_dedup_stage(base), eval_grams)
    ka = sorted(r.doc_id for r in a.collect())
    kb = sorted(r.doc_id for r in b.collect())
    assert ka == kb == [ne[2]]  # dirty clones dropped, one clean dup kept


def test_span_grades_are_alternatives_not_stages(spark, tmp_path):
    """The structural fact the funnel's contract rests on: global
    keep-one LINE dedup leaves every surviving line unique
    corpus-wide, so a sentence-WINDOW rule run after it can never find
    a repeated window (provably vacuous) — while the window rule run
    FIRST genuinely cuts. The span rules are therefore alternative
    GRADES (the funnel takes one as a parameter), exactly as the
    published stacks each pick one (C4 spans vs RefinedWeb lines)."""
    from uforwarder_spark.operators.funnel import FUNNEL_ORDER, span_dedup_stage

    s1, s2, s3 = "s one the", "s two of", "s three to"
    docs = [
        (0, f"intro words and {s2}", "en", "src0", 10),  # canonical s2
        (1, f"{s1} {s2} {s3}", "en", "src1", 10),  # canonical span
        (2, f"{s1} {s2} {s3} extra tail", "en", "src2", 10),  # dup span
    ]
    d = _write(spark, tmp_path, docs, "order")
    base = _docs_frame(spark, d).select("doc_id", "text")
    # the window rule alone fires: doc 2 loses its repeated span
    span_only = {r.doc_id: r.text for r in span_dedup_stage(base, 3).collect()}
    assert span_only[2] == "extra tail"
    # lines first: after line dedup every line is globally unique, so
    # the 3-window stage is an exact no-op on the whole frame
    lined = span_dedup_stage(base, 1).localCheckpoint()
    after_window = span_dedup_stage(lined, 3)
    a = {r.doc_id: r.text for r in lined.collect()}
    b = {r.doc_id: r.text for r in after_window.collect()}
    assert a == b  # vacuous by construction — grades, not stages
    assert "span_dedup" in FUNNEL_ORDER  # the funnel carries ONE grade


def test_span_family_funnel_accounting_monotone(spark):
    """End-to-end on the real sf0.001 corpus: the funnel runs, the
    accounting is monotone non-increasing in docs and tokens, and the
    final frame is non-empty with (doc_id, text) schema."""
    from uforwarder_spark.operators.funnel import FUNNEL_ORDER, span_family_funnel

    acc, final = span_family_funnel(
        _docs_frame(spark, "/root/testdata/sf0.001")
    )
    assert [a["stage"] for a in acc] == ["input", *FUNNEL_ORDER]
    docs = [a["docs"] for a in acc]
    toks = [a["tokens"] for a in acc]
    assert all(a >= b for a, b in zip(docs, docs[1:]))
    assert all(a >= b for a, b in zip(toks, toks[1:]))
    assert docs[-1] > 0
    assert final.columns == ["doc_id", "text"]


PARA_SEED = [
    # doc 10/11 share an identical 4-sentence block at block position
    # 0 (the declared-paragraph unit); doc 12 shares the SENTENCES but
    # not at a block boundary, so the paragraph grade must NOT cut it
    (10, "w1 the w2 of w3 a w4 to tail one and epsilon", "en", "src0", 10),
    (11, "w1 the w2 of w3 a w4 to other end here and", "en", "src1", 10),
    (12, "shift the w1 the w2 of w3 a w4 to end and", "en", "src2", 10),
    (13, "plain words without any repeats and", "en", "src0", 10),
]


def test_paragraph_grade_drift_locked_to_d109(spark, tmp_path):
    """The funnel's span stage at the paragraph grade (unit='paragraph',
    s=1) must rebuild EXACTLY the kept paragraph blocks D109 hashes:
    re-splitting the rebuilt text and re-BLOCKING by PARA_G reproduces
    the operator's cleaned_md5 per doc (re-blocking is idempotent —
    every block except the doc-final partial tail is exactly PARA_G
    sentences and cuts preserve order), and a repeated sentence run
    that is NOT block-aligned survives untouched."""
    from uforwarder_spark.operators.dedup import PARA_G, paragraph_span_dedup
    from uforwarder_spark.operators.funnel import span_dedup_stage

    def paras_of(text):
        ss = sents_of(text)
        return [
            " ".join(ss[i : i + PARA_G]) for i in range(0, len(ss), PARA_G)
        ]

    d = _write(spark, tmp_path, PARA_SEED, name="pfc")
    want = {r.doc_id: r.cleaned_md5 for r in paragraph_span_dedup(spark, d).collect()}
    got = {
        r.doc_id: hashlib.md5("|".join(paras_of(r.text)).encode()).hexdigest()
        for r in span_dedup_stage(
            _docs_frame(spark, d).select("doc_id", "text"), 1, unit="paragraph"
        ).collect()
    }
    empty = hashlib.md5(b"").hexdigest()
    assert len(want) > 0
    for doc_id, md5 in want.items():
        if md5 == empty:
            assert doc_id not in got
        else:
            assert got[doc_id] == md5, f"doc {doc_id} drifted at paragraph grade"
    # the cut actually fired cross-doc (11 lost its block-0 paragraph)
    # and the non-block-aligned repeat (12) survived whole
    texts = {
        r.doc_id: r.text
        for r in span_dedup_stage(
            _docs_frame(spark, d).select("doc_id", "text"), 1, unit="paragraph"
        ).collect()
    }
    assert "w1 the" not in texts[11] and "other end here and" in texts[11]
    assert texts[12] == PARA_SEED[2][1]


@pytest.mark.parametrize("unit,s", [("sentence", 1), ("paragraph", 1)], ids=["lines", "paragraphs"])
def test_single_unit_grades_are_fixed_points(spark, tmp_path, unit, s):
    """The keep-one cut at a SINGLE-unit grade (RefinedWeb lines,
    MassiveText paragraphs) is idempotent: after the cut, every
    surviving unit is unique corpus-wide and no NEW units form (cutting
    removes whole units without changing the survivors), so a second
    pass is a no-op. This is NOT claimed for the 3-sentence grade —
    cutting can make previously-separated sentences adjacent, forming
    new windows — which is one more reason the published rules are
    single-pass."""
    from uforwarder_spark.operators.funnel import span_dedup_stage

    d = _write(spark, tmp_path, SEED + PARA_SEED, name=f"fix{unit}")
    once = span_dedup_stage(
        _docs_frame(spark, d).select("doc_id", "text"), s, unit=unit
    )
    a = {r.doc_id: r.text for r in once.collect()}
    twice = span_dedup_stage(once, s, unit=unit)
    b = {r.doc_id: r.text for r in twice.collect()}
    assert len(a) > 0 and a == b


def test_paragraph_reblocking_idempotent_under_any_cut_pattern():
    """The combinatorial fact the paragraph drift-lock relies on,
    proven over random docs and ALL cut patterns (pure mirror logic,
    no Spark — Spark-vs-mirror agreement is the drift-lock test):
    rebuilding a doc from any kept subset of its PARA_G-sentence
    blocks, re-splitting, and re-blocking reproduces exactly the kept
    blocks. Holds because every block except the doc-final partial
    tail is exactly PARA_G sentences, cuts preserve order, and only
    the doc-final sentence may lack a terminating stopword (so it can
    only ever sit at the end of the rebuilt text)."""
    import itertools
    import random

    from uforwarder_spark.operators.dedup import PARA_G

    rng = random.Random(12)
    words = ["alpha", "beta", "gamma", "delta", "w1", "w2", "zz"]
    stops = sorted(SW)[:5]

    def rand_doc(n_sents, terminated_last):
        sents = []
        for i in range(n_sents):
            body = [rng.choice(words) for _ in range(rng.randint(1, 3))]
            last = i == n_sents - 1 and not terminated_last
            sents.append(" ".join(body + ([] if last else [rng.choice(stops)])))
        return sents

    def blocks_of(sents):
        return [
            " ".join(sents[i : i + PARA_G])
            for i in range(0, len(sents), PARA_G)
        ]

    checked = 0
    for n_sents in range(1, 22):
        for terminated in (True, False):
            sents = rand_doc(n_sents, terminated)
            blocks = blocks_of(sents)
            assert sents_of(" ".join(sents)) == sents  # splitter round-trip
            n = len(blocks)
            for mask in itertools.product((0, 1), repeat=n):
                kept = [b for b, m in zip(blocks, mask) if m]
                if not kept:
                    continue
                rebuilt = " ".join(kept)
                assert blocks_of(sents_of(rebuilt)) == kept, (
                    sents, mask
                )
                checked += 1
    assert checked > 400  # the sweep genuinely enumerated patterns
