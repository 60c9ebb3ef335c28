"""Skew handling: two-stage salted aggregation.

uForwarder's load is topic-skewed by nature — one hot topic can carry
most of the cluster's traffic (that is why the reference rebalances by
load, ``consumerproxy/controller/rebalancer/RpcJobColocatingRebalancer
.java``). In Spark the same skew shows up as one straggler reduce task
owning the hot grouping key. AQE's skew-join split handles joins; for
AGGREGATIONS over a hot key the standard fix is salting, packaged here
once so every operator can opt in.

How it works: stage 1 groups by (key, salt) with salt = hash(row) % N —
the hot key's rows spread over N reducers and combine map-side; stage 2
re-aggregates the N partial rows per key. Total shuffled volume is
unchanged (partial aggs already shrink it); the win is that no single
reducer owns a hot key's whole input.

Correct only for algebraic aggregates (those with an associative merge:
sum / count / min / max — and avg via sum+count). That is every
aggregate the message operators use.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SALTS = 16

# (merge_fn, final_fn) per supported aggregate: stage-2 merge of stage-1
# partials, and the final projection.
_MERGES = {
    "sum": F.sum,
    "count": F.sum,  # counts merge by summing
    "min": F.min,
    "max": F.max,
}


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = DEFAULT_SALTS,
) -> DataFrame:
    """Two-stage aggregation: ``aggs`` maps output column → (fn, input
    column) with fn in {sum, count, min, max}. Equivalent to
    ``df.groupBy(*keys).agg(...)`` for any data, but immune to hot-key
    stragglers: stage 1 shuffles on (keys, salt), stage 2 on keys over
    |keys|×n_salts rows — negligible.

    ``count`` counts non-null values of its input column ('*' for rows).

    The salt hashes EVERY input column, never a nondeterministic
    expression: if a map task is recomputed after a shuffle-fetch
    failure, each row must re-salt into the same partition reducers
    already consumed, or rows double-count/drop (the pre-Spark-2.4
    round-robin repartition hazard). Identical rows share a salt, which
    only matters if one key's rows are ALSO mostly identical.
    """
    salt = F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(n_salts))
    stage1_aggs: list[Column] = []
    stage2_aggs: list[Column] = []
    for out, (fn, col) in aggs.items():
        if fn == "count":
            src = F.count("*") if col == "*" else F.count(col)
            stage1_aggs.append(src.alias(f"_p_{out}"))
        else:
            stage1_aggs.append(_MERGES[fn](col).alias(f"_p_{out}"))
        stage2_aggs.append(_MERGES[fn](f"_p_{out}").alias(out))
    partial = df.withColumn("_salt", salt).groupBy(*keys, "_salt").agg(*stage1_aggs)
    return partial.groupBy(*keys).agg(*stage2_aggs)


def hotkey_segments(env_default: int = 0) -> int:
    """Parse ``SPARK_GRAFT_HOTKEY_SEGMENTS`` defensively: the
    segment-and-carry fallback is an opt-in performance flag, so a
    malformed value (``auto``, ``8x``, a typo) must fall back to the
    default single-window path, never crash plan-build for flag-off-
    equivalent workloads (C10 / D91 / every E45 micro-batch)."""
    import os

    raw = os.environ.get("SPARK_GRAFT_HOTKEY_SEGMENTS", "")
    try:
        return int(raw) if raw else env_default
    except ValueError:
        return env_default


def segment_by_span(events, segments: int):
    """Shared segment-binning half of the segment-and-carry hot-key
    fallback (C10 `sessions_frame`, D91 `markov_pairs_frame`): append a
    ``seg`` column cutting the frame's GLOBAL time span (a 1-row
    broadcast — never a |users|-sized bounds table) into `segments`
    contiguous right-open ranges.

    The load-bearing invariants the exactness proofs depend on live
    here, once: seg is a function of ts ALONE (equal timestamps share a
    segment, so per-key per-segment (ts, event_id) order concatenates
    to the global per-key order); the upper bound is right-open (+1 s)
    so the max-ts row maps below `segments`; the floor of the double
    division is monotone non-decreasing in ts and clamped by least();
    a NULL ts is PINNED to segment 0 — the flag-off path sorts
    `orderBy(ts asc)` which places NULLs FIRST, so the segmented
    concatenation must start with them too (without the pin, least()
    skips the NULL floor and a NULL-ts row would land in the LAST
    segment, silently diverging from the default path — ADVICE r09).
    Binning is at SECOND granularity (ts cast to long), matching the
    repo's epoch arithmetic."""
    from pyspark.sql import functions as F

    span = events.agg(
        F.min("ts").cast("long").alias("t_lo"),
        (F.max("ts").cast("long") + 1).alias("t_hi"),  # right-open
    )
    seg = (
        F.when(F.col("ts").isNull(), F.lit(0))
        .otherwise(
            F.least(
                F.lit(segments - 1),
                F.floor(
                    (F.col("ts").cast("long") - F.col("t_lo"))
                    * segments
                    / (F.col("t_hi") - F.col("t_lo"))
                ),
            )
        )
        .alias("seg")
    )
    return events.crossJoin(F.broadcast(span)).select(*events.columns, seg)
