"""A18 + A23: the exact flow-control pair — the continuous-refill token
bucket (the one batch operator using the documented Pandas escape
hatch: a sequential recurrence) and the unprocessed-cache limiter.

This module registers AFTER the driver's 50-key correctness window on
purpose: A18's driver row is rows-only (``no_oracle``) by design, so it
cedes its slot to oracle-checkable keys — its correctness is
model-checked in tests/test_operators.py; A23 is parity-checked by the
repo harness at two SFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..model import messages
from ..registry import register

BUCKET_RATE = 0.05  # tokens per second
BUCKET_BURST = 5.0  # bucket capacity


def token_bucket_frame(
    m: DataFrame, rate: float = BUCKET_RATE, burst: float = BUCKET_BURST
) -> DataFrame:
    """Frame-level A18: EXACT token-bucket admission per (topic,
    part_id) — the continuous-refill semantics of the reference's Guava
    RateLimiter (rate permits/s, burst capacity; worker/processor/
    TokenLimiter.java via ProcessorImpl.java), not the fixed-window
    approximation of A8. The reference limiter runs per pipeline shard,
    i.e. per (topic, partition) — the same key used here. The
    per-message recurrence
        tokens = min(burst, tokens + Δt·rate); admit iff tokens ≥ 1
    is sequential and not SQL-expressible, so this is grouped,
    Arrow-batched ``applyInPandas`` with a deterministic in-group sort.

    SCALE: one shuffle on (topic, part_id) — the log's own shard unit,
    so parallelism = #shards (40 here, thousands at 100 TB) and each
    pandas group is one executor-sized shard, never a whole topic's
    history. Inside a group the timestamps are a single numpy int64
    array; the state loop is O(|shard|) over primitive floats."""
    import numpy as np
    import pandas as pd

    def bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "msg_offset"]).reset_index(drop=True)
        t = pdf["ts"].to_numpy("datetime64[ns]").astype(np.int64) / 1e9
        admitted = np.empty(len(t), dtype=bool)
        toks = np.empty(len(t), dtype=np.float64)
        tokens = burst
        prev = None
        for i, now in enumerate(t):
            if prev is not None:
                tokens = min(burst, tokens + (now - prev) * rate)
            prev = now
            if tokens >= 1.0:
                tokens -= 1.0
                admitted[i] = True
            else:
                admitted[i] = False
            toks[i] = tokens
        pdf["admitted"] = admitted
        pdf["tokens_after"] = toks
        # the group arrives whole and sorted (ts, msg_offset), so the
        # kernel knows its own final row — emitting the marker lets the
        # A35 rollup take final_tokens with a fixed-width conditional
        # max instead of max_by over a struct key, which is not
        # UnsafeRow-mutable and silently forced a SortAggregate over
        # the message-scale verdict frame (OPTIMIZATION r12, found by
        # the all-keys plan sweep).
        # INVARIANT (ADVICE r12): is_last marks the final row PER
        # (topic, part_id) GROUP — max(when(is_last, …)) is only the
        # "latest row's value" for a consumer grouping by exactly
        # (topic, part_id). A coarser rollup (e.g. per-topic, like
        # token_bucket_exact's counters) must NOT use is_last that way:
        # it would take the max over several shards' final balances,
        # where the grain-independent max_by(…, struct(ts, msg_offset))
        # would pick the single latest row.
        is_last = np.zeros(len(t), dtype=bool)
        if len(t):
            is_last[-1] = True
        pdf["is_last"] = is_last
        return pdf[
            ["topic", "part_id", "msg_offset", "ts", "admitted", "tokens_after", "is_last"]
        ]

    out_schema = (
        "topic string, part_id long, msg_offset long, ts timestamp, "
        "admitted boolean, tokens_after double, is_last boolean"
    )
    return (
        m.select("topic", "part_id", "msg_offset", "ts")
        .groupBy("topic", "part_id")
        .applyInPandas(bucket, schema=out_schema)
    )


@register("token_bucket_exact")  # rows-only: sequential recurrence, no SQL twin
def token_bucket_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-shard admission verdicts under the exact token bucket
    (processor-side RateLimiter, reference ProcessorImpl.java), rolled
    up to per-topic admitted/throttled accounting.

    SCALE: see token_bucket_frame — one shuffle on (topic, part_id),
    then a tiny partial agg per topic."""
    verdicts = token_bucket_frame(messages(spark, sf_dir))
    return verdicts.groupBy("topic").agg(
        F.count("*").alias("n_msgs"),
        F.sum(F.when(F.col("admitted"), 1).otherwise(0)).alias("n_admitted"),
        F.sum(F.when(~F.col("admitted"), 1).otherwise(0)).alias("n_throttled"),
    )


# --- A23 -----------------------------------------------------------------
from ..model import MESSAGES_SQL_BODY  # noqa: E402

MSG_CTE = f"WITH messages AS ({MESSAGES_SQL_BODY})"
CACHE_COUNT_CAP = 50  # unprocessed messages per partition
CACHE_BYTE_CAP = 50_000  # unprocessed bytes per partition

UNPROCESSED_ORACLE = f"""{MSG_CTE},
pending AS (
  SELECT topic, part_id, msg_offset, size_bytes,
         row_number() OVER (PARTITION BY topic, part_id ORDER BY msg_offset) AS rn,
         sum(size_bytes) OVER (PARTITION BY topic, part_id ORDER BY msg_offset) AS cum_bytes
  FROM messages WHERE NOT acked
)
SELECT topic, part_id,
       count(*) AS n_pending,
       CAST(sum(CASE WHEN rn <= {CACHE_COUNT_CAP} AND cum_bytes <= {CACHE_BYTE_CAP}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_cached,
       CAST(sum(CASE WHEN rn <= {CACHE_COUNT_CAP} AND cum_bytes <= {CACHE_BYTE_CAP}
                     THEN size_bytes ELSE 0 END) AS BIGINT) AS cached_bytes,
       CAST(sum(CASE WHEN rn > {CACHE_COUNT_CAP} OR cum_bytes > {CACHE_BYTE_CAP}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_deferred
FROM pending
GROUP BY topic, part_id
"""


@register("unprocessed_limiter", UNPROCESSED_ORACLE)
def unprocessed_limiter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UnprocessedMessageManager (consumerproxy/worker/processor/
    UnprocessedMessageManager.java:30): the worker caps the
    fetched-but-unprocessed cache per partition by BOTH message count
    and byte size (count limiter + byteSizeLimiter at :37-38, byte cap
    resized per-partition at :198) — messages past either cap defer
    (the fetcher pauses the partition) until processing drains the
    cache. Computed over the unacked backlog in offset order.

    SCALE: one shuffle on (topic, part_id); the ordered prefix-sum
    window is REQUIRED by the semantics (admission is in offset order,
    cumulative bytes decide the cut) — per docs/SCALE.md's rule this is
    safe only because at 100 TB the unacked backlog per shard is bounded
    by the very cache this models, and shard count scales with data; the
    agg reuses the window's partitioning (no second shuffle)."""
    from pyspark.sql import Window

    m = messages(spark, sf_dir).filter(~F.col("acked"))
    w = Window.partitionBy("topic", "part_id").orderBy("msg_offset")
    pending = m.select(
        "topic",
        "part_id",
        "msg_offset",
        "size_bytes",
        F.row_number().over(w).alias("rn"),
        F.sum("size_bytes").over(w).alias("cum_bytes"),
    )
    cached = (F.col("rn") <= CACHE_COUNT_CAP) & (F.col("cum_bytes") <= CACHE_BYTE_CAP)
    return pending.groupBy("topic", "part_id").agg(
        F.count("*").alias("n_pending"),
        F.sum(F.when(cached, 1).otherwise(0)).alias("n_cached"),
        F.sum(F.when(cached, F.col("size_bytes")).otherwise(0)).alias("cached_bytes"),
        F.sum(F.when(~cached, 1).otherwise(0)).alias("n_deferred"),
    )


# --- A18 twin: driver-checkable summary ----------------------------------
# The exact recurrence IS SQL-expressible as a sequential fold: DuckDB's
# list_reduce mirrors the kernel's per-message state transition
# bit-for-bit (same double arithmetic in the same order: seconds =
# epoch_ns/1e9, refill = tokens + dt*rate clamped at burst, admit iff
# >= 1.0). A prepended sentinel carrying (t_first, burst, 0) reproduces
# the kernel's "no refill before the first message" initial state.
_REFILL = (
    f"least(CAST({BUCKET_BURST} AS DOUBLE), "
    f"acc.tok + (x.t - acc.t) * CAST({BUCKET_RATE} AS DOUBLE))"
)

from ..model import MESSAGES_SQL_BODY as _MSG_BODY  # noqa: E402

TOKEN_SUMMARY_ORACLE = f"""WITH messages AS ({_MSG_BODY}),
seq AS (
  SELECT topic, part_id,
         list(struct_pack(
                t := CAST(epoch_ns(ts) AS DOUBLE) / 1000000000.0,
                tok := CAST(0 AS DOUBLE),
                adm := CAST(0 AS BIGINT))
              ORDER BY ts, msg_offset) AS evs,
         count(*) AS n_msgs
  FROM messages GROUP BY topic, part_id
),
folded AS (
  SELECT topic, part_id, n_msgs,
         list_reduce(
           list_prepend(struct_pack(t := evs[1].t,
                                    tok := CAST({BUCKET_BURST} AS DOUBLE),
                                    adm := CAST(0 AS BIGINT)), evs),
           (acc, x) -> struct_pack(
              t := x.t,
              tok := CASE WHEN {_REFILL} >= 1.0
                          THEN {_REFILL} - 1.0 ELSE {_REFILL} END,
              adm := acc.adm + CASE WHEN {_REFILL} >= 1.0 THEN 1 ELSE 0 END)
         ) AS st
  FROM seq
)
SELECT topic, part_id, n_msgs,
       st.adm          AS n_admitted,
       n_msgs - st.adm AS n_throttled,
       st.tok          AS final_tokens
FROM folded
"""


@register("token_bucket_summary", TOKEN_SUMMARY_ORACLE)
def token_bucket_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checkable twin of A18 (round-3 verdict item 5; reference
    TokenLimiter.java credit/acquire semantics via ProcessorImpl.java):
    the same applyInPandas kernel (token_bucket_frame), rolled up to the final
    balance + admitted/throttled counts per (topic, part_id) — so the
    driver's hash check pins the one recurrence it previously could
    only rows-check. The oracle replays the identical recurrence as a
    DuckDB list_reduce fold over the (ts, msg_offset)-sorted sequence;
    both sides compute in IEEE doubles with the same operation order,
    so final_tokens matches bit-for-bit.

    SCALE: identical to A18 — one shuffle on (topic, part_id), O(|shard|)
    state loop per Arrow batch, then a same-key partial agg."""
    verdicts = token_bucket_frame(messages(spark, sf_dir))
    return verdicts.groupBy("topic", "part_id").agg(
        F.count("*").alias("n_msgs"),
        F.sum(F.when(F.col("admitted"), 1).otherwise(0)).alias("n_admitted"),
        F.sum(F.when(~F.col("admitted"), 1).otherwise(0)).alias("n_throttled"),
        # the kernel marks each shard's final row (one per group), so
        # this is a plain fixed-width max — HashAggregate, where the
        # former max_by(tokens_after, struct(ts, msg_offset)) planned a
        # SortAggregate over the whole verdict frame (r12 plan sweep)
        F.max(F.when(F.col("is_last"), F.col("tokens_after"))).alias("final_tokens"),
    )
