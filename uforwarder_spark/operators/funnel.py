"""Composed span-family curation funnel (VERDICT r11 #5): the
keep-one dedup rules and the three decontamination grades chained the
way a production pipeline chains them, so the FAMILY'S INTERACTION has
measured evidence (docs/SCALE.md round-12 table), not just the
per-operator rows.

Every stage is built from the SAME kernels the registered operators
use (sent_frame / sent_window_frame / sent_canonical_frame / es_spans
/ decon_grams_frame / decon_match_positions), and
tests/test_curation_funnel.py drift-locks each stage's output against
the registered operator's cleaned_md5 — the funnel cannot silently
diverge from the oracle-checked rules.

CONTRACT ORDER (pinned by tests):
    exact dedup (D1 rule) -> ONE span grade (D105 sentence spans by
    default; D107 lines and D109 paragraphs are the alternative
    grades) -> decon tiers (D67 drop / D80 cut / D108 tier on one
    detection head)
The span rules are ALTERNATIVE GRADES, not chainable stages — a
structural fact the tests prove rather than assume: global keep-one
line dedup leaves every surviving line UNIQUE corpus-wide, so any
window rule run after it can never find a repeated window (the
sentence-span stage would be vacuous by construction). That is why
C4 and RefinedWeb each publish ONE span rule, and why this funnel
takes the grade as a parameter instead of chaining them. The decon
gate runs LAST because the published rules grade the text that will
actually be trained on. Exact dedup DOES commute with the decon DROP
decision (a pure predicate of the text, so filtering before or after
keep-first-per-text-class lands on the same kept set — proven as a
test), so its position is efficiency, not semantics: drop whole
duplicate docs before paying per-sentence fingerprints. The decon
CUT grade rewrites text (two different docs can rewrite to the same
text), so its position after dedup IS part of the contract.

SCALE: each stage's output is localCheckpoint'd before feeding the
next (at 100 TB: materialized to storage between stages, exactly like
the published multi-pass curation runs); within a stage the plan is
the registered operator's plan — map-side fingerprints, one hash
group-by, survivors-only join back, row-local cut.

Reference analogue: none — training-data curation family (SURVEY §2
D; C4 / RefinedWeb / MassiveText / Llama-2 composed curation order).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.tokenize import TOKENS_SPARK
from .dedup import (
    NGRAM_DECON_N,
    SENT_PACK,
    SENT_S,
    decon_eval_filter,
    decon_grams_frame,
    decon_match_positions,
    es_spans,
    sent_canonical_frame,
    para_frame,
    sent_frame,
    sent_window_frame,
)


def _kept_units(t: DataFrame, pos: DataFrame, s: int) -> DataFrame:
    """(doc_id, kept): the kept-unit arrays behind sent_span_cut's
    accounting — same islands (es_spans at w=s), same filter-with-index
    cut; exposed because the funnel must MATERIALIZE the cleaned text
    to feed the next stage (the registered operators only emit its
    md5). Drift-locked against those operators' cleaned_md5 in
    tests/test_curation_funnel.py."""
    ranges = (
        es_spans(pos, s)
        .groupBy("doc_id")
        .agg(F.expr("collect_list(struct(p0, p1))").alias("rs"))
    )
    kept = F.expr(
        f"filter(sents, (x, i) -> NOT exists(rs2, r -> i >= r.p0 AND i < r.p1 + {s}))"
    )
    return (
        t.join(ranges, "doc_id", "left")
        .withColumn("rs2", F.expr("coalesce(rs, array())"))
        .select("doc_id", kept.alias("kept"))
    )


def exact_norm_hash():
    """The D1 normalized-text identity (lowercase, whitespace-folded,
    trimmed — one md5 per exact-dup class): shared by the batch funnel
    stage and the E57 live gate so the two exact rules cannot drift."""
    return F.md5(F.expr(r"trim(regexp_replace(lower(text), '\\s+', ' '))"))


def exact_dedup_stage(docs: DataFrame) -> DataFrame:
    """D1's keep-first rule as a funnel stage: one doc per
    normalized-text hash (min doc_id keeps)."""
    n = docs.select("doc_id", "text", exact_norm_hash().alias("h"))
    keep = n.groupBy("h").agg(F.min("doc_id").alias("doc_id"))
    return n.join(keep, ["h", "doc_id"], "leftsemi").select("doc_id", "text")


def span_dedup_stage(
    docs: DataFrame, s: int, unit: str = "sentence"
) -> DataFrame:
    """D107 (s=1) / D105 (s=SENT_S) / D109 (unit='paragraph', s=1)
    keep-one cut as a funnel stage: repeated s-unit windows are cut
    from every non-canonical occurrence and the text is rebuilt from
    the kept units (' '-join — the deterministic splitter re-derives
    exactly the kept sentences from the rebuild, so the representation
    is idempotent; for the paragraph unit re-BLOCKING is also
    idempotent, because every block except the doc-final partial tail
    is exactly PARA_G sentences and cuts preserve order, so regrouping
    the kept blocks reproduces the same blocks — drift-locked in
    tests). From this stage on the funnel carries the NORMALIZED token
    stream. Docs below the unit threshold pass through untouched; docs
    cut to nothing drop out of the funnel."""
    if unit == "paragraph":
        assert s == 1, "the paragraph grade windows at span length 1 (D109)"
        t = para_frame(docs)
    else:
        t = sent_frame(docs, s=s)
    w = sent_window_frame(t, s=s)
    pos = (
        w.join(sent_canonical_frame(w), "h")
        .filter(F.col("doc_id") * SENT_PACK + F.col("p") != F.col("c"))
        .select("doc_id", "p")
    )
    kept = _kept_units(t, pos, s)
    # concat_ws treats a NULL array as '' (never NULL), so the
    # pass-through branch must test kept itself — coalesce on the
    # concat would silently drop every doc below the sentence
    # threshold (caught by test_span_grades_are_alternatives...)
    rebuilt = F.when(
        F.col("kept").isNotNull(), F.expr("concat_ws(' ', kept)")
    ).otherwise(F.col("text"))
    return (
        docs.join(kept, "doc_id", "left")
        .select("doc_id", rebuilt.alias("text"))
        .filter("text <> ''")
    )


def decon_tier_stage(docs: DataFrame, eval_grams: DataFrame) -> DataFrame:
    """The three decontamination grades composed on ONE detection head
    (the Llama-2 tier rule deciding which published treatment each doc
    gets): per doc, covered-token mass vs the broadcast eval-gram set
    tiers the doc — 'dirty' (>= 80%) DROPS it (the D67 grade),
    'not_clean' (>= 20%) CUTS the matched token spans (the D80 grade),
    'clean' passes untouched. Tier boundaries compare on integer
    cross-multiplication; zero-token docs are clean (the ADVICE r12
    guard)."""
    t = docs.select(
        "doc_id", "text", F.expr(TOKENS_SPARK).alias("ts")
    ).withColumn("n_tokens", F.expr("CAST(size(ts) AS BIGINT)"))
    cover = (
        es_spans(decon_match_positions(t, eval_grams), w=NGRAM_DECON_N)
        .groupBy("doc_id")
        .agg(
            F.sum(F.col("p1") + NGRAM_DECON_N - F.col("p0"))
            .cast("bigint")
            .alias("cov"),
            F.expr("collect_list(struct(p0, p1))").alias("rs"),
        )
    )
    z = F.lit(0).cast("bigint")
    j = t.join(cover, "doc_id", "left").withColumn(
        "cov", F.coalesce("cov", z)
    )
    tier = (
        F.when(F.col("n_tokens") == 0, "clean")
        .when(F.col("cov") * 5 >= F.col("n_tokens") * 4, "dirty")
        .when(F.col("cov") * 5 >= F.col("n_tokens"), "not_clean")
        .otherwise("clean")
    )
    kept = F.expr(
        "concat_ws(' ', filter(ts, (x, i) -> NOT exists(rs2, "
        f"r -> i >= r.p0 AND i < r.p1 + {NGRAM_DECON_N})))"
    )
    return (
        j.withColumn("tier", tier)
        .filter("tier <> 'dirty'")
        .withColumn("rs2", F.expr("coalesce(rs, array())"))
        .select(
            "doc_id",
            F.when(F.col("tier") == "not_clean", kept)
            .otherwise(F.col("text"))
            .alias("text"),
        )
        .filter("text <> ''")
    )


FUNNEL_ORDER = ["exact_dedup", "span_dedup", "decon_tiers"]


def span_family_funnel(
    docs: DataFrame, span_s: int = SENT_S, span_unit: str = "sentence"
) -> tuple[list[dict], DataFrame]:
    """Run the composed funnel in CONTRACT ORDER over a (doc_id, text,
    ...) documents frame; (``span_s``, ``span_unit``) pick the span
    GRADE (SENT_S/'sentence' = the C4 three-sentence rule,
    1/'sentence' = the RefinedWeb line rule, 1/'paragraph' = the
    MassiveText/Gopher D109 rule — grades are alternatives, see the
    module docstring). Eval docs (decon_eval_filter) are held out as
    the decon reference and never enter the funnel. Returns (per-stage
    accounting rows [{stage, docs, tokens}], final cleaned frame)."""
    is_eval = decon_eval_filter()
    eval_grams = (
        decon_grams_frame(docs.filter(is_eval).select("doc_id", "text"))
        .select("g")
        .distinct()
    )
    stage_fns = {
        "exact_dedup": exact_dedup_stage,
        "span_dedup": lambda d: span_dedup_stage(d, span_s, span_unit),
        "decon_tiers": lambda d: decon_tier_stage(d, eval_grams),
    }
    cur = docs.filter(~is_eval).select("doc_id", "text")
    acc = []

    def account(stage: str, frame: DataFrame) -> None:
        row = frame.agg(
            F.count("*").alias("docs"),
            F.coalesce(
                F.sum(F.expr(f"size({TOKENS_SPARK})")), F.lit(0)
            ).cast("bigint").alias("tokens"),
        ).collect()[0]
        acc.append({"stage": stage, "docs": row.docs, "tokens": row.tokens})

    account("input", cur)
    for name in FUNNEL_ORDER:
        # each stage feeds the next: checkpoint cuts the composed
        # lineage (at 100 TB: materialize to storage between stages)
        cur = stage_fns[name](cur).localCheckpoint()
        account(name, cur)
    return acc, cur
