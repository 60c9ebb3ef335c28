"""D4: n-gram/token-set Jaccard near-dup pairs with BOUNDED candidate
generation (prefix filtering).

Lives in its own module (not operators/dedup.py) so registration order
can place it inside the driver's correctness window independently of the
rest of the dedup family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.tokenize import TOKENS_DUCK, TOKENS_SPARK
from ..model import load_parallel
from ..registry import register

JACCARD_T = 0.9

# The oracle stays the naive all-shared-token formulation — the prefix
# filter is an exact optimization, so both compute the same pair set.
NGRAM_JACCARD_ORACLE = f"""
WITH t AS (
  SELECT doc_id, source, list_distinct({TOKENS_DUCK}) AS ts FROM documents
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.source AS source,
       round(CAST(len(list_intersect(a.ts, b.ts)) AS DOUBLE)
             / len(list_distinct(list_concat(a.ts, b.ts))), 6) AS jaccard
FROM t a JOIN t b ON a.source = b.source AND a.doc_id < b.doc_id
WHERE CAST(len(list_intersect(a.ts, b.ts)) AS DOUBLE)
      / len(list_distinct(list_concat(a.ts, b.ts))) >= {JACCARD_T}
"""


def prefix_tokens(t: DataFrame, threshold: float = JACCARD_T) -> DataFrame:
    """Per-doc PPJoin prefix: the (n − ceil(t·n) + 1) globally-rarest
    tokens of each doc's distinct-token set (Xiao et al., PPJoin, WWW'08;
    Chaudhuri et al., SSJoin, ICDE'06). Any pair with Jaccard ≥ t must
    share a prefix token, so joining prefixes is exact — and the join
    input shrinks to ~(1−t) of the exploded tokens, all of them RARE
    (low df), so no token pairs more than a handful of docs.

    Token order = (per-source df asc, token asc): consistent for every
    doc of a source, which is all prefix filtering needs since pairs are
    blocked by source. Built as hash aggs only — df via groupBy count,
    prefix via sort_array over a collected (df, tok) list — no windows
    (a windowed formulation measured 9× slower, docs/SCALE.md).

    OPTIMIZATION r13 (exact prune): a prefix member with df = 1 exists
    in exactly ONE doc of its source, so it can never match the
    equi-join's other side — a shared token implies df >= 2. The slice
    is taken over the FULL ordered token set first (the PPJoin prefix
    definition needs every token), then df-1 members are dropped from
    the emitted join input — provably identical candidate pair set,
    strictly fewer self-join/DISTINCT input rows. Measured a WASH at
    sf0.1 (the index build dominates; OPTIMIZATION_r13.md §E) — kept
    as a structural, zero-risk prune.

    Input: t(doc_id, source, ts) with ts distinct. Output: one row per
    (doc_id, source, n, tok) prefix member that at least one OTHER doc
    of the source also contains — join input, not the full prefix."""
    toks = t.select(
        "doc_id", "source", F.expr("size(ts)").cast("long").alias("n"), F.explode("ts").alias("tok")
    )
    df_tbl = toks.groupBy("source", "tok").agg(F.count("*").alias("df"))
    plen = F.expr(f"CAST(n - ceil({threshold} * n) + 1 AS INT)")
    return (
        toks.join(df_tbl, ["source", "tok"])
        .groupBy("doc_id", "source", "n")
        .agg(F.expr("slice(sort_array(collect_list(struct(df, tok))), 1, "
                    f"CAST(n - ceil({threshold} * n) + 1 AS INT))").alias("prefix"))
        .withColumn("plen", plen)
        .select(
            "doc_id",
            "source",
            "n",
            F.explode(F.expr("transform(filter(prefix, p -> p.df > 1), p -> p.tok)")).alias("tok"),
        )
    )


@register("ngram_jaccard_pairs", NGRAM_JACCARD_ORACLE)
def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-set Jaccard ≥ 0.9 pairs within source blocks — the
    verification kernel of shingle dedup, candidate-bounded by PPJoin
    prefix filtering instead of an all-shared-token self-join.

    SCALE: the naive (source, token) equi-join is quadratic in hot
    tokens (a stopword shared by k docs yields O(k²) join rows); the
    prefix join touches only each doc's ~0.1·n+1 RAREST tokens, so
    candidate output is bounded by Σ_tok df_prefix(tok)² over rare
    tokens only — linear in practice. Stages: df count (1 shuffle),
    df attach + per-doc prefix regroup (2), prefix self-join + pair
    distinct (2), then exact array_intersect verification joins against
    the doc table on doc_id — candidates only pay that cost. Length
    filter t·n_b ≤ n_a prunes before verification. All hash joins/aggs,
    no windows, no Python."""
    docs = load_parallel(spark, sf_dir, "documents")
    t = (
        docs.withColumn("ts", F.expr(f"array_distinct({TOKENS_SPARK})"))
        .select("doc_id", "source", "ts")
        .localCheckpoint()  # reused by prefix build + both verification
        # probes — CONCURRENT stages of one action, which race a
        # lazily-populated cache and re-run the tokenize per branch
        # (persist -> localCheckpoint measured CPU 23.3 -> 7.8 s
        # interleaved at sf0.1, OPTIMIZATION r13)
    )
    pref = prefix_tokens(t, JACCARD_T).localCheckpoint()
    # materialization barrier: the self-join below references pref on
    # BOTH sides; without it the whole df-count + prefix regroup subtree
    # executes twice (exchange reuse does not survive AQE's broadcast
    # conversion here). pref is ~(1-t)·|tokens| rows — tiny.
    a, b = pref.alias("a"), pref.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.source") == F.col("b.source"))
            & (F.col("a.tok") == F.col("b.tok"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            # length filter: J ≥ t forces t·max(n_a,n_b) ≤ min(n_a,n_b)
            & (F.col("a.n") >= F.ceil(F.lit(JACCARD_T) * F.col("b.n")))
            & (F.col("b.n") >= F.ceil(F.lit(JACCARD_T) * F.col("a.n"))),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.source").alias("source"),
        )
        .distinct()
    )
    verified = (
        cands.join(t.select(F.col("doc_id").alias("doc_a"), F.col("ts").alias("ts_a")), "doc_a")
        .join(t.select(F.col("doc_id").alias("doc_b"), F.col("ts").alias("ts_b")), "doc_b")
        .withColumn("inter", F.expr("CAST(size(array_intersect(ts_a, ts_b)) AS DOUBLE)"))
        .withColumn("jaccard_raw", F.expr("inter / (size(ts_a) + size(ts_b) - inter)"))
        .filter(F.col("jaccard_raw") >= JACCARD_T)
    )
    return verified.select("doc_a", "doc_b", "source", F.round("jaccard_raw", 6).alias("jaccard"))
