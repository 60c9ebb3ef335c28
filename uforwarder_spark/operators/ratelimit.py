"""A18: exact continuous-refill token bucket — the one batch operator
using the documented Pandas escape hatch (sequential recurrence).

Registered LAST on purpose: its driver row is rows-only (``no_oracle``)
by design, so it cedes its slot in the driver's correctness window to
oracle-checkable keys; correctness is model-checked in
tests/test_operators.py instead.
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
        pdf["admitted"] = admitted
        return pdf[["topic", "part_id", "msg_offset", "ts", "admitted"]]

    out_schema = "topic string, part_id long, msg_offset long, ts timestamp, admitted boolean"
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
