"""Round-12 optimization equivalence tests: every rewrite that changed
an operator's internals ships with a direct old-form-vs-new-form
equality check (OPTIMIZATION_r12.md), independent of the oracle parity
suite.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from uforwarder_spark.functions.multimodal import _PHASH_HAM, PHASH_BITS
from uforwarder_spark.functions.text import _MERGE_FOLD, _merge_fold_col


def _old_ham_expr() -> str:
    """The pre-r12 positional-substr Hamming form (kept here as the
    reference implementation the popcount rewrite must equal)."""
    return (
        f"aggregate(transform(sequence(0, {PHASH_BITS - 1}), "
        "i -> CASE WHEN substr(pa, i + 1, 1) <> substr(pb, i + 1, 1) "
        "THEN 1 ELSE 0 END), 0, (acc, x) -> acc + x)"
    )


def test_phash_hamming_popcount_equals_positional(spark):
    rng = random.Random(12012)
    rows = []
    for _ in range(200):
        pa = "".join(rng.choice("01") for _ in range(PHASH_BITS))
        # mix of near and far pairs, plus exact equals
        pb = list(pa)
        for i in rng.sample(range(PHASH_BITS), rng.randint(0, PHASH_BITS)):
            pb[i] = "1" if pb[i] == "0" else "0"
        rows.append((pa, "".join(pb)))
    rows.append(("0" * PHASH_BITS, "1" * PHASH_BITS))  # all 64 differ
    rows.append(("1" * PHASH_BITS, "1" * PHASH_BITS))  # none differ
    df = spark.createDataFrame(rows, "pa string, pb string")
    bad = (
        df.withColumn("new", F.expr(_PHASH_HAM))
        .withColumn("old", F.expr(_old_ham_expr()))
        .filter(F.col("new") != F.col("old"))
        .count()
    )
    assert bad == 0


@pytest.mark.slow  # ADVICE r12: one Spark job per distinct winner pair
def test_merge_fold_literal_form_equals_column_form(spark):
    """_merge_fold_col(l, r) (winner as literals, r12) must re-segment
    exactly like _MERGE_FOLD with (l, r) as columns — including the
    overlap case ('a a a a' under (a,a) -> 'aa aa', leftmost-greedy
    non-overlapping) and no-match/boundary cases."""
    rng = random.Random(97)
    syms = ["a", "b", "ab", "c", "</w>"]
    cases = [
        ("a a a a a", "a", "a"),
        ("a a a a", "a", "a"),
        ("a b a b", "a", "b"),
        ("ab ab ab", "ab", "ab"),
        ("b a", "a", "b"),
        ("x", "a", "b"),
    ]
    for _ in range(60):
        s = " ".join(rng.choice(syms) for _ in range(rng.randint(1, 12)))
        l, r = rng.choice(syms), rng.choice(syms)
        cases.append((s, l, r))
    # the literal form binds (l, r) at plan time: evaluate one job per
    # distinct winner pair, all that pair's sym_strs in one frame
    by_pair: dict = {}
    for s, l, r in cases:
        by_pair.setdefault((l, r), []).append(s)
    for (l, r), strs in by_pair.items():
        df = spark.createDataFrame(
            [(s, l, r) for s in strs], "sym_str string, l string, r string"
        )
        bad = (
            df.withColumn("old", F.expr(_MERGE_FOLD))
            .withColumn("new", _merge_fold_col(l, r))
            .filter(F.col("new") != F.col("old"))
            .collect()
        )
        assert not bad, (l, r, bad)
