"""A. Message-pipeline operators — uForwarder's worker-side semantics
re-expressed as Spark DataFrame plans over the message log.

Reference parity is cited per operator (files under
``/root/reference/uforwarder-core/src/main/java/com/uber/data/kafka/
consumerproxy/worker`` unless noted). Everything here is pure built-in
DataFrame ops — no UDFs at all — so Catalyst pushes filters into the
parquet scan and whole-stage codegen covers every expression.

SCALE: the work unit is (topic, part_id) — uForwarder's own shard unit —
so every window/agg shuffles exactly once on those keys. At 100 TB the
message log is parquet partitioned by (topic, date): topic predicates
prune entire directories, and AQE coalesces the post-shuffle partitions.
Skewed topics (one hot topic dominating) are handled by AQE skew-join
plus the fact that all aggregations are partial (map-side combine).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.quantiles import counts_quantiles, counts_quantiles_sql
from ..model import MESSAGES_SQL_BODY, messages
from ..registry import register

# Shared CTE so every oracle computes the identical message projection.
MSG_CTE = f"WITH messages AS ({MESSAGES_SQL_BODY})"

# Routing table: topic -> consumer callee uri (reference RoutingUtils /
# DispatcherMessage: each job group carries a consumer service RPC uri).
ROUTES = [
    ("click", "grpc://consumer-clickstream"),
    ("view", "grpc://consumer-clickstream"),
    ("purchase", "grpc://consumer-billing"),
    ("signup", "grpc://consumer-identity"),
    ("error", "grpc://consumer-oncall"),
]
ROUTES_SQL = "(VALUES " + ", ".join(f"('{t}', '{u}')" for t, u in ROUTES) + ") AS routes(topic, callee_uri)"


def _routes_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(ROUTES, ["topic", "callee_uri"])


# --- A1 ------------------------------------------------------------------
FETCH_ORACLE = f"""{MSG_CTE}
SELECT msg_offset, topic, part_id, ts, size_bytes
FROM messages
WHERE topic = 'click' AND msg_offset >= 1000 AND msg_offset < 5000
"""


@register("fetch_offset_range", FETCH_ORACLE)
def fetch_offset_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OriginalTopicKafkaFetcher seek/poll (fetcher/OriginalTopicKafkaFetcher.java):
    deliver exactly the messages of one topic inside an offset range.

    SCALE: topic + offset predicates push down to the parquet scan
    (min/max row-group stats prune); no shuffle at all."""
    m = messages(spark, sf_dir)
    return m.filter(
        (F.col("topic") == "click") & (F.col("msg_offset") >= 1000) & (F.col("msg_offset") < 5000)
    ).select("msg_offset", "topic", "part_id", "ts", "size_bytes")


# --- A2 ------------------------------------------------------------------
FILTER_ORACLE = f"""{MSG_CTE}
SELECT msg_offset, topic, part_id, outcome, payload_value
FROM messages
WHERE topic IN ('click', 'view', 'purchase')
  AND payload_value >= 1.0
  AND outcome <> 'SKIP'
"""


@register("filter_messages", FILTER_ORACLE)
def filter_messages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter / OriginalClusterFilter / CompositeFilter (filter/*.java):
    drop messages failing attribute predicates before dispatch.

    SCALE: pure pushed-down predicates; zero shuffle."""
    m = messages(spark, sf_dir)
    return m.filter(
        F.col("topic").isin("click", "view", "purchase")
        & (F.col("payload_value") >= 1.0)
        & (F.col("outcome") != "SKIP")
    ).select("msg_offset", "topic", "part_id", "outcome", "payload_value")


# --- A3 ------------------------------------------------------------------
ROUTE_ORACLE = f"""{MSG_CTE}
SELECT callee_uri,
       count(*)            AS n_msgs,
       CAST(sum(size_bytes) AS BIGINT)     AS total_bytes
FROM messages
JOIN {ROUTES_SQL} USING (topic)
GROUP BY callee_uri
"""


@register("route_messages", ROUTE_ORACLE)
def route_messages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RoutingUtils + DispatcherImpl (common/RoutingUtils.java,
    worker/dispatcher/DispatcherImpl.java): resolve each message's consumer
    callee from its topic's routing config; account dispatch volume.

    SCALE: routing table is O(topics) → broadcast join, no shuffle for the
    join; single partial agg on callee."""
    m = messages(spark, sf_dir)
    routes = _routes_df(spark)
    return (
        m.join(F.broadcast(routes), "topic")
        .groupBy("callee_uri")
        .agg(F.count("*").alias("n_msgs"), F.sum("size_bytes").alias("total_bytes"))
    )


# --- A4 ------------------------------------------------------------------
DEDUP_DISPATCH_ORACLE = f"""{MSG_CTE},
attempts AS (
  SELECT topic, part_id, msg_offset, 1 AS attempt FROM messages
  UNION ALL
  SELECT topic, part_id, msg_offset, 2 AS attempt FROM messages WHERE msg_offset % 10 = 0
)
SELECT topic,
       count(*) AS n_attempts,
       count(DISTINCT msg_offset) AS n_unique,
       count(*) - count(DISTINCT msg_offset) AS n_duplicates
FROM attempts
GROUP BY topic
"""


@register("dedup_dispatch", DEDUP_DISPATCH_ORACLE)
def dedup_dispatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DedupHeaderInterceptor (dispatcher/grpc/DedupHeaderInterceptor.java):
    redeliveries carry the same (group, topic, partition, offset) — dedupe
    dispatches and account duplicates. Redelivery simulated for every 10th
    offset.

    SCALE: distinct-count shuffles once on topic; at scale the dedup key
    (topic, part_id, msg_offset) is hash-partitioned so the distinct is
    map-side partial first."""
    m = messages(spark, sf_dir).select("topic", "part_id", "msg_offset")
    attempts = m.withColumn("attempt", F.lit(1)).unionAll(
        m.filter(F.col("msg_offset") % 10 == 0).withColumn("attempt", F.lit(2))
    )
    return attempts.groupBy("topic").agg(
        F.count("*").alias("n_attempts"),
        F.countDistinct("msg_offset").alias("n_unique"),
        (F.count("*") - F.countDistinct("msg_offset")).alias("n_duplicates"),
    )


# --- A5 ------------------------------------------------------------------
ACK_WATERMARK_ORACLE = f"""{MSG_CTE},
flagged AS (
  SELECT topic, part_id, msg_offset, acked,
         sum(CASE WHEN acked THEN 0 ELSE 1 END)
           OVER (PARTITION BY topic, part_id ORDER BY msg_offset) AS unacked_upto
  FROM messages
)
SELECT topic, part_id,
       max(CASE WHEN unacked_upto = 0 THEN msg_offset END) AS committed_offset,
       max(msg_offset)                                     AS high_watermark,
       count(*)                                            AS n_msgs,
       CAST(sum(CASE WHEN acked THEN 1 ELSE 0 END) AS BIGINT)  AS n_acked
FROM flagged
GROUP BY topic, part_id
"""


def _heads(m: DataFrame) -> DataFrame:
    """Per-partition first-unacked offset — the pivot that turns every
    prefix-contiguity question into plain conditional aggregation."""
    return m.groupBy("topic", "part_id").agg(
        F.min(F.when(~F.col("acked"), F.col("msg_offset"))).alias("min_unacked")
    )


def ack_watermark_frame(m: DataFrame) -> DataFrame:
    """Frame-level A5 over any messages-shaped frame (unit-testable on
    hand-built gap/out-of-order cases, like the reference's
    AckTrackingQueueTest).

    SORT-FREE formulation: committed = max acked offset BELOW the first
    unacked offset — two hash aggregations and a broadcast join back,
    instead of an ordered running-sum window. Both are one shuffle, but
    hash aggregation is fully partial (map-side combined) and never
    sorts, so a hot partition costs O(n) not O(n log n): measured 34.8s
    → 12.7s on a 100M-row log with 40 keys (docs/SCALE.md)."""
    heads = _heads(m)
    joined = m.join(F.broadcast(heads), ["topic", "part_id"])
    below = F.col("min_unacked").isNull() | (F.col("msg_offset") < F.col("min_unacked"))
    return joined.groupBy("topic", "part_id").agg(
        F.max(F.when(F.col("acked") & below, F.col("msg_offset"))).alias("committed_offset"),
        F.max("msg_offset").alias("high_watermark"),
        F.count("*").alias("n_msgs"),
        F.sum(F.when(F.col("acked"), 1).otherwise(0)).alias("n_acked"),
    )


@register("ack_commit_watermark", ACK_WATERMARK_ORACLE)
def ack_commit_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AckTrackingQueue / LinkedAckTrackingQueue / AckManager
    (processor/LinkedAckTrackingQueue.java): out-of-order acks commit only
    the largest prefix-contiguous acked offset per partition; NULL if the
    partition head is unacked.

    SCALE: one shuffle on (topic, part_id) for the running-sum window;
    the agg reuses the same partitioning (no second shuffle)."""
    return ack_watermark_frame(messages(spark, sf_dir))


# --- A6 ------------------------------------------------------------------
HOL_ORACLE = f"""{MSG_CTE},
heads AS (
  SELECT topic, part_id,
         min(CASE WHEN NOT acked THEN msg_offset END) AS head_offset,
         count(*) AS n_msgs
  FROM messages
  GROUP BY topic, part_id
)
SELECT h.topic, h.part_id, h.head_offset,
       count(CASE WHEN m.acked AND m.msg_offset > h.head_offset THEN 1 END)
         AS acked_behind_head,
       count(CASE WHEN m.acked AND m.msg_offset > h.head_offset THEN 1 END) >= 100
         AS is_blocked
FROM heads h
JOIN messages m ON m.topic = h.topic AND m.part_id = h.part_id
WHERE h.head_offset IS NOT NULL
GROUP BY h.topic, h.part_id, h.head_offset
"""


def hol_blocking_frame(m: DataFrame, threshold: int = 100) -> DataFrame:
    """Frame-level A6: head-of-line blocked partitions (unit-testable —
    mirrors HeadBlockingDetectorTest's stuck-head cases)."""
    heads = (
        m.groupBy("topic", "part_id")
        .agg(F.min(F.when(~F.col("acked"), F.col("msg_offset"))).alias("head_offset"))
        .filter(F.col("head_offset").isNotNull())
    )
    joined = m.join(F.broadcast(heads), ["topic", "part_id"])
    acked_behind = F.count(
        F.when(F.col("acked") & (F.col("msg_offset") > F.col("head_offset")), 1)
    )
    return joined.groupBy("topic", "part_id", "head_offset").agg(
        acked_behind.alias("acked_behind_head"),
        (acked_behind >= threshold).alias("is_blocked"),
    )


@register("head_of_line_blocking", HOL_ORACLE)
def head_of_line_blocking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HeadBlockingDetector (processor/HeadBlockingDetector.java): a
    partition is head-of-line blocked when its oldest unacked (head)
    message is stuck while many later messages completed.

    SCALE: two aggs over the same (topic, part_id) partitioning — the
    heads side is tiny (one row per partition) and broadcast back."""
    return hol_blocking_frame(messages(spark, sf_dir))


# --- A7 ------------------------------------------------------------------
INFLIGHT_LIMIT = 50
INFLIGHT_ORACLE = f"""{MSG_CTE},
pending AS (
  SELECT topic, part_id, msg_offset,
         row_number() OVER (PARTITION BY topic, part_id ORDER BY msg_offset) AS rn
  FROM messages WHERE NOT acked
)
SELECT topic, part_id,
       count(*)                                            AS n_pending,
       CAST(sum(CASE WHEN rn <= {INFLIGHT_LIMIT} THEN 1 ELSE 0 END) AS BIGINT) AS n_admitted,
       CAST(sum(CASE WHEN rn >  {INFLIGHT_LIMIT} THEN 1 ELSE 0 END) AS BIGINT) AS n_blocked,
       max(CASE WHEN rn <= {INFLIGHT_LIMIT} THEN msg_offset END) AS last_admitted_offset
FROM pending
GROUP BY topic, part_id
"""


def inflight_limiter_frame(m: DataFrame, limit: int = INFLIGHT_LIMIT) -> DataFrame:
    """Frame-level A7: admit ≤ limit unacked per partition in offset order
    (unit-testable — mirrors LongFixedInflightLimiterTest admit/block)."""
    pending = m.filter(~F.col("acked")).withColumn(
        "rn", F.row_number().over(Window.partitionBy("topic", "part_id").orderBy("msg_offset"))
    )
    return pending.groupBy("topic", "part_id").agg(
        F.count("*").alias("n_pending"),
        F.sum(F.when(F.col("rn") <= limit, 1).otherwise(0)).alias("n_admitted"),
        F.sum(F.when(F.col("rn") > limit, 1).otherwise(0)).alias("n_blocked"),
        F.max(F.when(F.col("rn") <= limit, F.col("msg_offset"))).alias("last_admitted_offset"),
    )


@register("inflight_limiter", INFLIGHT_ORACLE)
def inflight_limiter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LongFixedInflightLimiter (limiter/LongFixedInflightLimiter.java):
    admit at most N unacked messages per partition in offset order; the
    rest block awaiting permits.

    SCALE: row_number windows over the native (topic, part_id) shard —
    one shuffle, then agg reuses the partitioning."""
    return inflight_limiter_frame(messages(spark, sf_dir))


# --- A8 ------------------------------------------------------------------
RATE_LIMIT = 10
RATE_ORACLE = f"""{MSG_CTE},
bucketed AS (
  SELECT topic, msg_offset,
         (CAST(floor(epoch(ts)) AS BIGINT) // 60) * 60 AS window_epoch,
         row_number() OVER (
           PARTITION BY topic, (CAST(floor(epoch(ts)) AS BIGINT) // 60) * 60
           ORDER BY msg_offset) AS rn
  FROM messages
)
SELECT topic,
       count(*)                                        AS n_msgs,
       CAST(sum(CASE WHEN rn <= {RATE_LIMIT} THEN 1 ELSE 0 END) AS BIGINT) AS n_allowed,
       CAST(sum(CASE WHEN rn >  {RATE_LIMIT} THEN 1 ELSE 0 END) AS BIGINT) AS n_throttled
FROM bucketed
GROUP BY topic
"""


def rate_limit_frame(m: DataFrame, rate: int = RATE_LIMIT) -> DataFrame:
    """Frame-level A8: ≤ rate messages per topic per 1-min window, granted
    in offset order (unit-testable token-bucket cases)."""
    window_epoch = F.expr("CAST(unix_timestamp(ts) DIV 60 AS BIGINT) * 60")
    w = Window.partitionBy("topic", "window_epoch").orderBy("msg_offset")
    bucketed = m.withColumn("window_epoch", window_epoch).withColumn("rn", F.row_number().over(w))
    return bucketed.groupBy("topic").agg(
        F.count("*").alias("n_msgs"),
        F.sum(F.when(F.col("rn") <= rate, 1).otherwise(0)).alias("n_allowed"),
        F.sum(F.when(F.col("rn") > rate, 1).otherwise(0)).alias("n_throttled"),
    )


@register("rate_limit_tokens", RATE_ORACLE)
def rate_limit_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-bucket throttling (reference uses Guava RateLimiter inside the
    processor, worker/processor/ProcessorImpl.java with config
    ProcessorConfiguration.maxInboundCacheCount / messageRateLimit): R tokens per topic per 1-minute window, granted in
    offset order; excess is throttled.

    SCALE: window keyed by (topic, minute) — high cardinality keys spread
    evenly; row_number + agg share one shuffle."""
    return rate_limit_frame(messages(spark, sf_dir))


# --- A9 ------------------------------------------------------------------
RETRY_TIER_ORACLE = f"""{MSG_CTE}
SELECT topic,
       CASE WHEN retry_count <= 1 THEN 'retry_q_0'
            WHEN retry_count <= 3 THEN 'retry_q_1'
            ELSE 'retry_q_2' END AS retry_tier,
       count(*)          AS n_msgs,
       CAST(sum(retry_count) AS BIGINT)  AS total_retries,
       min(msg_offset)   AS min_offset,
       max(msg_offset)   AS max_offset
FROM messages
WHERE outcome = 'RETRY'
GROUP BY topic, CASE WHEN retry_count <= 1 THEN 'retry_q_0'
                     WHEN retry_count <= 3 THEN 'retry_q_1'
                     ELSE 'retry_q_2' END
"""


@register("retry_tier_assignment", RETRY_TIER_ORACLE)
def retry_tier_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RetryUtils + RetryTopicKafkaFetcher (utils/RetryUtils.java,
    fetcher/RetryTopicKafkaFetcher.java): tiered retry queues — a failed
    message lands in the retry topic for its retry-count band.

    SCALE: pushed-down outcome filter, single partial agg."""
    m = messages(spark, sf_dir).filter(F.col("outcome") == "RETRY")
    tier = (
        F.when(F.col("retry_count") <= 1, "retry_q_0")
        .when(F.col("retry_count") <= 3, "retry_q_1")
        .otherwise("retry_q_2")
    )
    return m.withColumn("retry_tier", tier).groupBy("topic", "retry_tier").agg(
        F.count("*").alias("n_msgs"),
        F.sum("retry_count").alias("total_retries"),
        F.min("msg_offset").alias("min_offset"),
        F.max("msg_offset").alias("max_offset"),
    )


# --- A10 -----------------------------------------------------------------
DLQ_ORACLE = f"""{MSG_CTE}
SELECT topic,
       count(*)        AS n_dlq,
       CAST(sum(size_bytes) AS BIGINT) AS dlq_bytes,
       min(msg_offset) AS min_offset,
       max(msg_offset) AS max_offset
FROM messages
WHERE outcome = 'DLQ' OR (outcome = 'RETRY' AND retry_count >= 5)
GROUP BY topic
"""


@register("dlq_messages", DLQ_ORACLE)
def dlq_messages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DlqDispatchManager + DlqTopicKafkaFetcher
    (processor/DlqDispatchManager.java): poison pills and retry-exhausted
    messages produce to the dead-letter topic.

    SCALE: pushed-down filter + single partial agg per topic."""
    m = messages(spark, sf_dir).filter(
        (F.col("outcome") == "DLQ") | ((F.col("outcome") == "RETRY") & (F.col("retry_count") >= 5))
    )
    return m.groupBy("topic").agg(
        F.count("*").alias("n_dlq"),
        F.sum("size_bytes").alias("dlq_bytes"),
        F.min("msg_offset").alias("min_offset"),
        F.max("msg_offset").alias("max_offset"),
    )


# --- A11 -----------------------------------------------------------------
RESURRECT_ORACLE = f"""{MSG_CTE},
merged AS (
  SELECT topic, part_id, msg_offset, 'live' AS src FROM messages
  WHERE outcome = 'OK'
  UNION ALL
  SELECT topic, part_id, msg_offset, 'resurrected' AS src FROM messages
  WHERE outcome = 'DLQ' OR (outcome = 'RETRY' AND retry_count >= 5)
)
SELECT topic, part_id,
       count(*)                                              AS n_total,
       CAST(sum(CASE WHEN src = 'live' THEN 1 ELSE 0 END) AS BIGINT)        AS n_live,
       CAST(sum(CASE WHEN src = 'resurrected' THEN 1 ELSE 0 END) AS BIGINT) AS n_resurrected,
       min(CASE WHEN src = 'resurrected' THEN msg_offset END) AS first_resurrected_offset
FROM merged
GROUP BY topic, part_id
"""


@register("dlq_resurrection", RESURRECT_ORACLE)
def dlq_resurrection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DLQ purge/merge — resurrection (DlqTopicKafkaFetcher.java: DLQ
    consumption replays dead messages back through the pipeline merged
    with live traffic, preserving per-partition offset order).

    SCALE: unionAll is metadata-only; one shuffle for the agg."""
    m = messages(spark, sf_dir)
    live = m.filter(F.col("outcome") == "OK").select(
        "topic", "part_id", "msg_offset", F.lit("live").alias("src")
    )
    dead = m.filter(
        (F.col("outcome") == "DLQ") | ((F.col("outcome") == "RETRY") & (F.col("retry_count") >= 5))
    ).select("topic", "part_id", "msg_offset", F.lit("resurrected").alias("src"))
    merged = live.unionAll(dead)
    return merged.groupBy("topic", "part_id").agg(
        F.count("*").alias("n_total"),
        F.sum(F.when(F.col("src") == "live", 1).otherwise(0)).alias("n_live"),
        F.sum(F.when(F.col("src") == "resurrected", 1).otherwise(0)).alias("n_resurrected"),
        F.min(F.when(F.col("src") == "resurrected", F.col("msg_offset"))).alias(
            "first_resurrected_offset"
        ),
    )


# --- A12 -----------------------------------------------------------------
LATENCY_ORACLE = f"""{MSG_CTE}
SELECT topic,
       round(min(CASE WHEN q = 0.50 THEN exact END), 6) AS p50_ms,
       round(min(CASE WHEN q = 0.95 THEN exact END), 6) AS p95_ms,
       round(min(CASE WHEN q = 0.99 THEN exact END), 6) AS p99_ms,
       min(n) AS n_samples
FROM {counts_quantiles_sql('messages', ['topic'], 'latency_ms', [0.50, 0.95, 0.99])}
GROUP BY topic
"""


@register("latency_percentiles", LATENCY_ORACLE)
def latency_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LatencyTracker (dispatcher/LatencyTracker.java): dispatch latency
    distribution per topic feeding the adaptive limiter.

    SCALE: EXACT percentiles without the buffer-every-value
    percentile() aggregate (one agg buffer per topic holding all its
    latencies — the OOM shape docs/SCALE.md rejects): latencies are
    integers with bounded cardinality, so the interpolated order
    statistic x_k1 + frac·(x_k2 − x_k1) is recovered from a
    (topic, latency)-counts frame — partial agg + a window over
    value-cardinality rows. Same numbers, mergeable memory. Built on
    the SHARED functions/quantiles kernel (as A15/A30/D23 are) rather
    than an inline re-derivation: the kernel's IS NOT NULL filter makes
    NULL handling identical in both engines (Spark windows sort NULLS
    FIRST, DuckDB NULLS LAST — an inline version without the filter
    would diverge the day latency_ms ever carried a NULL)."""
    m = messages(spark, sf_dir)
    qf = counts_quantiles(m, ["topic"], "latency_ms", [0.50, 0.95, 0.99])
    return qf.groupBy("topic").agg(
        F.round(F.min(F.when(F.col("q") == 0.50, F.col("exact"))), 6).alias("p50_ms"),
        F.round(F.min(F.when(F.col("q") == 0.95, F.col("exact"))), 6).alias("p95_ms"),
        F.round(F.min(F.when(F.col("q") == 0.99, F.col("exact"))), 6).alias("p99_ms"),
        F.min("n").alias("n_samples"),
    )


# --- A13 -----------------------------------------------------------------
THROUGHPUT_ORACLE = f"""{MSG_CTE}
SELECT topic,
       (CAST(floor(epoch(ts)) AS BIGINT) // 300) * 300 AS window_epoch,
       count(*)                  AS n_msgs,
       CAST(sum(size_bytes) AS BIGINT)      AS total_bytes,
       count(*) / 300.0          AS msgs_per_sec,
       sum(size_bytes) / 300.0   AS bytes_per_sec
FROM messages
GROUP BY topic, (CAST(floor(epoch(ts)) AS BIGINT) // 300) * 300
"""


@register("throughput_windows", THROUGHPUT_ORACLE)
def throughput_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Throughput / WindowedAggregator (controller/autoscalar/Throughput.java,
    limiter/WindowedAggregator.java): per-topic msgs/s + bytes/s in 5-min
    tumbling windows — the autoscaler's input signal.

    SCALE: map-side partial agg on (topic, window) then one shuffle;
    output is O(topics × windows), tiny."""
    m = messages(spark, sf_dir)
    window_epoch = F.expr("CAST(unix_timestamp(ts) DIV 300 AS BIGINT) * 300")
    return (
        m.withColumn("window_epoch", window_epoch)
        .groupBy("topic", "window_epoch")
        .agg(
            F.count("*").alias("n_msgs"),
            F.sum("size_bytes").alias("total_bytes"),
            (F.count("*") / 300.0).alias("msgs_per_sec"),
            (F.sum("size_bytes") / 300.0).alias("bytes_per_sec"),
        )
    )


# --- A14 -----------------------------------------------------------------
LAG_ORACLE = f"""{MSG_CTE},
flagged AS (
  SELECT topic, part_id, msg_offset, acked,
         sum(CASE WHEN acked THEN 0 ELSE 1 END)
           OVER (PARTITION BY topic, part_id ORDER BY msg_offset) AS unacked_upto
  FROM messages
)
SELECT topic, part_id,
       max(msg_offset) AS high_watermark,
       max(CASE WHEN unacked_upto = 0 THEN msg_offset END) AS committed_offset,
       CAST(sum(CASE WHEN unacked_upto > 0 THEN 1 ELSE 0 END) AS BIGINT) AS lag_msgs
FROM flagged
GROUP BY topic, part_id
"""


@register("consumer_lag", LAG_ORACLE)
def consumer_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consumer lag (controller/rpc/ControllerWorkerService.java job status:
    lag = high watermark − committed): messages past the commit point per
    (topic, part_id).

    SCALE: same sort-free shape as A5 — lag is the count of offsets at
    or past the first unacked one, plain conditional aggregation."""
    m = messages(spark, sf_dir)
    joined = m.join(F.broadcast(_heads(m)), ["topic", "part_id"])
    below = F.col("min_unacked").isNull() | (F.col("msg_offset") < F.col("min_unacked"))
    return joined.groupBy("topic", "part_id").agg(
        F.max("msg_offset").alias("high_watermark"),
        F.max(F.when(F.col("acked") & below, F.col("msg_offset"))).alias("committed_offset"),
        F.sum(F.when(~below, 1).otherwise(0)).alias("lag_msgs"),
    )


# --- A15 -----------------------------------------------------------------
TARGET_LATENCY_MS = 50.0
VEGAS_ORACLE = f"""{MSG_CTE},
lat AS (
  SELECT topic, part_id, exact AS p95
  FROM {counts_quantiles_sql('messages', ['topic', 'part_id'], 'latency_ms', [0.95])}
)
SELECT topic, part_id, round(p95, 6) AS p95_ms,
       greatest(4, least(200,
         CAST(floor({INFLIGHT_LIMIT} * {TARGET_LATENCY_MS} / p95) AS BIGINT))) AS adapted_limit,
       CASE WHEN greatest(4, least(200,
              CAST(floor({INFLIGHT_LIMIT} * {TARGET_LATENCY_MS} / p95) AS BIGINT))) > {INFLIGHT_LIMIT}
            THEN 'grow'
            WHEN greatest(4, least(200,
              CAST(floor({INFLIGHT_LIMIT} * {TARGET_LATENCY_MS} / p95) AS BIGINT))) < {INFLIGHT_LIMIT}
            THEN 'shrink' ELSE 'hold' END AS decision
FROM lat
"""


@register("adaptive_inflight_vegas", VEGAS_ORACLE)
def adaptive_inflight_vegas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VegasAdaptiveInflightLimiter / AdaptiveInflightLimiter
    (limiter/VegasAdaptiveInflightLimiter.java): adapt the in-flight cap
    from latency feedback, TCP-Vegas style — when observed latency rises
    above target the window shrinks, when it is comfortably below the
    window grows; clamped to [4, 200]. Here the feedback signal is the
    per-partition p95 dispatch latency scaling the fixed base cap.

    SCALE: counts-based exact p95 (functions/quantiles.py) — partial
    agg + a value-cardinality window per shard, never a
    buffer-every-value percentile aggregate; the cap arithmetic is
    pure projection."""
    m = messages(spark, sf_dir)
    lat = counts_quantiles(m, ["topic", "part_id"], "latency_ms", [0.95]).select(
        "topic", "part_id", F.col("exact").alias("p95")
    )
    limit_expr = F.greatest(
        F.lit(4),
        F.least(
            F.lit(200),
            F.floor(F.lit(INFLIGHT_LIMIT) * F.lit(TARGET_LATENCY_MS) / F.col("p95")).cast("long"),
        ),
    )
    return lat.select(
        "topic",
        "part_id",
        F.round("p95", 6).alias("p95_ms"),
        limit_expr.alias("adapted_limit"),
        F.when(limit_expr > INFLIGHT_LIMIT, "grow")
        .when(limit_expr < INFLIGHT_LIMIT, "shrink")
        .otherwise("hold")
        .alias("decision"),
    )


# --- A16 -----------------------------------------------------------------
LAG_DEGRADED = 200
DLQ_UNHEALTHY = 5
# --- KafkaPipelineIssue taxonomy (per-issue-type accounting) --------------
# PipelineHealthState keeps 10-s windows, each holding a SET of issues
# reported in that window; accounting = per (topic, part_id, issue) the
# number of 10-s windows in which the issue fired (set semantics inside
# a window — a flood of one issue in one window still counts once,
# exactly recordIssue/getIssues).
HEALTH_WIN_S = 10  # PipelineHealthManager.stateWindowDuration
# Issue-trigger thresholds at the test-SF event grain (the testdata log
# carries ~1 msg/topic/minute; a production config would reuse A7/A8's
# RATE_LIMIT/INFLIGHT_LIMIT — same expressions, different literals):
HEALTH_RATE_LIMIT = 1  # msgs per (topic, minute) before MESSAGE_RATE_LIMITED
HEALTH_BYTES_LIMIT = 140  # bytes per (topic, minute) before BYTES_RATE_LIMITED
MED_LAT_HIGH = 104  # MEDIAN_RPC_LATENCY_HIGH: >half the window's RPCs above
MAX_LAT_HIGH = 195  # MAX_RPC_LATENCY_HIGH: any RPC in the window above
NO_RETRY_QUEUE_TOPIC = "signup"  # simulated: the one topic with no retry queue

HEALTH_ORACLE = f"""{MSG_CTE},
flagged AS (
  SELECT topic, part_id, msg_offset, acked, outcome, retry_count,
         latency_ms,
         (CAST(floor(epoch(ts)) AS BIGINT) // {HEALTH_WIN_S}) * {HEALTH_WIN_S} AS w10,
         row_number() OVER (
           PARTITION BY topic, (CAST(floor(epoch(ts)) AS BIGINT) // 60) * 60
           ORDER BY msg_offset) AS rate_rn,
         sum(size_bytes) OVER (
           PARTITION BY topic, (CAST(floor(epoch(ts)) AS BIGINT) // 60) * 60
           ORDER BY msg_offset ROWS UNBOUNDED PRECEDING) AS bytes_run,
         sum(CASE WHEN acked THEN 0 ELSE 1 END)
           OVER (PARTITION BY topic, part_id ORDER BY msg_offset) AS unacked_upto
  FROM messages
),
per_win AS (
  SELECT topic, part_id, w10,
         CAST(sum(CASE WHEN unacked_upto > 0 THEN 1 ELSE 0 END) AS BIGINT) AS lag_msgs,
         CAST(sum(CASE WHEN outcome = 'DLQ'
                        OR (outcome = 'RETRY' AND retry_count >= 5)
                       THEN 1 ELSE 0 END) AS BIGINT) AS dlq_msgs,
         max(CASE WHEN NOT acked THEN 1 ELSE 0 END) AS any_unacked,
         max(CASE WHEN rate_rn > {HEALTH_RATE_LIMIT} THEN 1 ELSE 0 END) AS f_rate,
         max(CASE WHEN bytes_run > {HEALTH_BYTES_LIMIT} THEN 1 ELSE 0 END) AS f_bytes,
         max(CASE WHEN NOT acked AND unacked_upto > {INFLIGHT_LIMIT}
                  THEN 1 ELSE 0 END) AS f_inflight,
         max(CASE WHEN outcome IN ('RETRY', 'DLQ') AND msg_offset % 23 = 0
                  THEN 1 ELSE 0 END) AS f_perm,
         max(CASE WHEN outcome IN ('RETRY', 'DLQ') AND msg_offset % 23 = 1
                  THEN 1 ELSE 0 END) AS f_invalid,
         max(CASE WHEN outcome = 'RETRY' AND topic = '{NO_RETRY_QUEUE_TOPIC}'
                  THEN 1 ELSE 0 END) AS f_noq,
         CASE WHEN 2 * sum(CASE WHEN latency_ms > {MED_LAT_HIGH} THEN 1 ELSE 0 END)
                   > count(*) THEN 1 ELSE 0 END AS f_med,
         CASE WHEN max(latency_ms) > {MAX_LAT_HIGH} THEN 1 ELSE 0 END AS f_max
  FROM flagged
  GROUP BY topic, part_id, w10
),
per_part AS (
  SELECT topic, part_id,
         CAST(sum(lag_msgs) AS BIGINT) AS lag_msgs,
         CAST(sum(dlq_msgs) AS BIGINT) AS dlq_msgs,
         max(any_unacked) = 1 AS has_stuck_head,
         CAST(sum(f_rate) AS BIGINT)     AS wins_msg_rate_limited,
         CAST(sum(f_bytes) AS BIGINT)    AS wins_bytes_rate_limited,
         CAST(sum(f_inflight) AS BIGINT) AS wins_inflight_limited,
         CAST(sum(f_perm) AS BIGINT)     AS wins_permission_denied,
         CAST(sum(f_invalid) AS BIGINT)  AS wins_invalid_response,
         CAST(sum(f_noq) AS BIGINT)      AS wins_retry_no_queue,
         CAST(sum(f_med) AS BIGINT)      AS wins_median_latency_high,
         CAST(sum(f_max) AS BIGINT)      AS wins_max_latency_high
  FROM per_win
  GROUP BY topic, part_id
)
SELECT topic, part_id, lag_msgs, dlq_msgs, has_stuck_head,
       wins_msg_rate_limited, wins_bytes_rate_limited, wins_inflight_limited,
       wins_permission_denied, wins_invalid_response, wins_retry_no_queue,
       wins_median_latency_high, wins_max_latency_high,
       CASE WHEN dlq_msgs >= {DLQ_UNHEALTHY} THEN 'UNHEALTHY'
            WHEN lag_msgs > {LAG_DEGRADED} THEN 'DEGRADED'
            ELSE 'HEALTHY' END AS health
FROM per_part
"""


@register("pipeline_health", HEALTH_ORACLE)
def pipeline_health(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PipelineHealthManager / KafkaPipelineIssue / PipelineHealthState
    (datatransfer/worker/pipelines/PipelineHealthManager.java,
    KafkaPipelineIssue.java, PipelineHealthState.java): fold the
    per-partition issue signals — commit lag, stuck head, DLQ pressure —
    into one health verdict per pipeline, PLUS the full
    KafkaPipelineIssue taxonomy accounting: per (topic, part_id) and
    per issue type, the number of {HEALTH_WIN_S}-s health-state windows
    in which the issue fired. This mirrors PipelineHealthState exactly:
    recordIssue() adds an issue to the current window's SET (a flood of
    one issue within one window counts once) and getIssues() reads
    whole windows, so window-counts — not raw message counts — are the
    reference's accounting unit. All eight enum members are covered:
    MESSAGE_RATE_LIMITED (A8's over-rate rule at the test-SF grain),
    BYTES_RATE_LIMITED (per-minute running byte budget),
    INFLIGHT_MESSAGE_LIMITED (A7's rule: unacked depth beyond the
    inflight cap), PERMISSION_DENIED / INVALID_RESPONSE_RECEIVED
    (deterministic failure-cause classes over the simulated non-OK
    outcomes, the model.py convention: msg_offset % 23 ∈ {{0, 1}}),
    RETRY_WITHOUT_RETRY_QUEUE (a RETRY response on the one topic
    configured without a retry queue), and MEDIAN/MAX_RPC_LATENCY_HIGH
    (A30's Little's-law alarms at window grain: strictly more than
    half the window's RPCs above the median threshold / any RPC above
    the max threshold).

    Exactness: every flag is an integer CASE over exact integers; the
    median-high rule is the count form 2·n_above > n (no percentile
    interpolation), so both engines agree bit-for-bit.

    SCALE: the verdict inputs ride the same per-partition ordered
    window A5 uses (one shuffle on the native (topic, part_id) shard);
    the rate/bytes windows key per (topic, minute) — high-cardinality,
    evenly spread; everything downstream is two partial aggs
    (windows-sized, then partitions-sized). No Python, no sort beyond
    the keyed window sorts."""
    return pipeline_health_frame(messages(spark, sf_dir))


def pipeline_health_frame(m: DataFrame) -> DataFrame:
    """Frame-level A16 over any messages-shaped frame (unit-testable on
    hand-built edge cases, the reference's PipelineHealthManagerTest
    style — window-boundary, exactly-at-limit, exactly-half-latency
    rows)."""
    w10 = F.expr(
        f"CAST(unix_timestamp(ts) DIV {HEALTH_WIN_S} AS BIGINT) * {HEALTH_WIN_S}"
    )
    w60 = F.expr("CAST(unix_timestamp(ts) DIV 60 AS BIGINT) * 60")
    w_rate = Window.partitionBy("topic", "w60").orderBy("msg_offset")
    w_part = Window.partitionBy("topic", "part_id").orderBy("msg_offset")
    flagged = (
        m.withColumn("w10", w10)
        .withColumn("w60", w60)
        .withColumn("rate_rn", F.row_number().over(w_rate))
        .withColumn(
            "bytes_run",
            F.sum("size_bytes").over(
                w_rate.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .withColumn(
            "unacked_upto",
            F.sum(F.when(F.col("acked"), 0).otherwise(1)).over(w_part),
        )
    )
    fail = F.col("outcome").isin("RETRY", "DLQ")
    flag = lambda cond: F.max(F.when(cond, 1).otherwise(0))  # noqa: E731
    per_win = flagged.groupBy("topic", "part_id", "w10").agg(
        F.sum(F.when(F.col("unacked_upto") > 0, 1).otherwise(0)).alias("lag_msgs"),
        F.sum(
            F.when(
                (F.col("outcome") == "DLQ")
                | ((F.col("outcome") == "RETRY") & (F.col("retry_count") >= 5)),
                1,
            ).otherwise(0)
        ).alias("dlq_msgs"),
        flag(~F.col("acked")).alias("any_unacked"),
        flag(F.col("rate_rn") > HEALTH_RATE_LIMIT).alias("f_rate"),
        flag(F.col("bytes_run") > HEALTH_BYTES_LIMIT).alias("f_bytes"),
        flag((~F.col("acked")) & (F.col("unacked_upto") > INFLIGHT_LIMIT)).alias(
            "f_inflight"
        ),
        flag(fail & (F.col("msg_offset") % 23 == 0)).alias("f_perm"),
        flag(fail & (F.col("msg_offset") % 23 == 1)).alias("f_invalid"),
        flag(
            (F.col("outcome") == "RETRY") & (F.col("topic") == NO_RETRY_QUEUE_TOPIC)
        ).alias("f_noq"),
        F.when(
            2 * F.sum(F.when(F.col("latency_ms") > MED_LAT_HIGH, 1).otherwise(0))
            > F.count("*"),
            1,
        )
        .otherwise(0)
        .alias("f_med"),
        F.when(F.max("latency_ms") > MAX_LAT_HIGH, 1).otherwise(0).alias("f_max"),
    )
    per_part = per_win.groupBy("topic", "part_id").agg(
        F.sum("lag_msgs").cast("bigint").alias("lag_msgs"),
        F.sum("dlq_msgs").cast("bigint").alias("dlq_msgs"),
        (F.max("any_unacked") == 1).alias("has_stuck_head"),
        F.sum("f_rate").cast("bigint").alias("wins_msg_rate_limited"),
        F.sum("f_bytes").cast("bigint").alias("wins_bytes_rate_limited"),
        F.sum("f_inflight").cast("bigint").alias("wins_inflight_limited"),
        F.sum("f_perm").cast("bigint").alias("wins_permission_denied"),
        F.sum("f_invalid").cast("bigint").alias("wins_invalid_response"),
        F.sum("f_noq").cast("bigint").alias("wins_retry_no_queue"),
        F.sum("f_med").cast("bigint").alias("wins_median_latency_high"),
        F.sum("f_max").cast("bigint").alias("wins_max_latency_high"),
    )
    return per_part.select(
        "topic",
        "part_id",
        "lag_msgs",
        "dlq_msgs",
        "has_stuck_head",
        "wins_msg_rate_limited",
        "wins_bytes_rate_limited",
        "wins_inflight_limited",
        "wins_permission_denied",
        "wins_invalid_response",
        "wins_retry_no_queue",
        "wins_median_latency_high",
        "wins_max_latency_high",
        F.when(F.col("dlq_msgs") >= DLQ_UNHEALTHY, "UNHEALTHY")
        .when(F.col("lag_msgs") > LAG_DEGRADED, "DEGRADED")
        .otherwise("HEALTHY")
        .alias("health"),
    )


# --- A17 -----------------------------------------------------------------
BACKOFF_ORACLE = f"""{MSG_CTE},
retries AS (
  SELECT topic, msg_offset, ts,
         CASE WHEN retry_count <= 1 THEN 0
              WHEN retry_count <= 3 THEN 1
              ELSE 2 END AS tier
  FROM messages WHERE outcome = 'RETRY'
),
now_ref AS (SELECT max(ts) AS now_ts FROM messages)
SELECT topic, tier,
       CAST(60 * power(4, tier) AS BIGINT) AS backoff_s,
       count(*) AS n_msgs,
       CAST(sum(CASE WHEN CAST(floor(epoch(r.ts)) AS BIGINT) + CAST(60 * power(4, tier) AS BIGINT)
                          <= CAST(floor(epoch(n.now_ts)) AS BIGINT)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_eligible,
       CAST(sum(CASE WHEN CAST(floor(epoch(r.ts)) AS BIGINT) + CAST(60 * power(4, tier) AS BIGINT)
                          > CAST(floor(epoch(n.now_ts)) AS BIGINT)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_delayed
FROM retries r CROSS JOIN now_ref n
GROUP BY topic, tier
"""


@register("retry_backoff_eligibility", BACKOFF_ORACLE)
def retry_backoff_eligibility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KafkaDelayProcessManager / DelayProcessManager
    (worker/fetchers/kafka/KafkaDelayProcessManager.java): retry-topic
    messages wait out their tier's backoff (60s × 4^tier) before
    re-processing; partitions holding only still-delayed messages pause.
    Counts eligible vs delayed per (topic, tier) at now = max event time.

    SCALE: the now-reference is a 1-row broadcast; the rest is a pushed
    filter + single partial agg per (topic, tier)."""
    m = messages(spark, sf_dir)
    retries = m.filter(F.col("outcome") == "RETRY").select(
        "topic",
        "msg_offset",
        "ts",
        F.when(F.col("retry_count") <= 1, 0)
        .when(F.col("retry_count") <= 3, 1)
        .otherwise(2)
        .alias("tier"),
    )
    now_ref = m.agg(F.max("ts").alias("now_ts"))
    backoff = F.expr("CAST(60 * power(4, tier) AS BIGINT)")
    eligible = F.expr(
        "CAST(unix_timestamp(ts) AS BIGINT) + CAST(60 * power(4, tier) AS BIGINT)"
        " <= CAST(unix_timestamp(now_ts) AS BIGINT)"
    )
    return (
        retries.crossJoin(F.broadcast(now_ref))
        .groupBy("topic", "tier")
        .agg(
            F.max(backoff).alias("backoff_s"),
            F.count("*").alias("n_msgs"),
            F.sum(F.when(eligible, 1).otherwise(0)).alias("n_eligible"),
            F.sum(F.when(~eligible, 1).otherwise(0)).alias("n_delayed"),
        )
        .select(
            "topic", "tier", "backoff_s", "n_msgs", "n_eligible", "n_delayed"
        )
    )


# --- A18 lives in operators/ratelimit.py (registered last: rows-only) ----


# --- A19 -----------------------------------------------------------------
WORKER_SUMMARY_ORACLE = f"""{MSG_CTE}
SELECT m.topic, routes.callee_uri,
       count(*)                                                     AS n_fetched,
       CAST(sum(CASE WHEN m.outcome = 'SKIP' THEN 1 ELSE 0 END) AS BIGINT)  AS n_filtered,
       CAST(sum(CASE WHEN m.outcome = 'OK' THEN 1 ELSE 0 END) AS BIGINT)    AS n_delivered,
       CAST(sum(CASE WHEN m.outcome = 'RETRY' AND m.retry_count < 5
                     THEN 1 ELSE 0 END) AS BIGINT)                          AS n_retried,
       CAST(sum(CASE WHEN m.outcome = 'DLQ'
                      OR (m.outcome = 'RETRY' AND m.retry_count >= 5)
                     THEN 1 ELSE 0 END) AS BIGINT)                          AS n_dlq,
       CAST(sum(CASE WHEN m.outcome <> 'SKIP' THEN m.size_bytes ELSE 0 END)
            AS BIGINT)                                                      AS dispatched_bytes
FROM messages m JOIN {ROUTES_SQL} USING (topic)
GROUP BY m.topic, routes.callee_uri
"""


@register("worker_pipeline_summary", WORKER_SUMMARY_ORACLE)
def worker_pipeline_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole worker pass composed as ONE query (reference
    worker/pipelines/PipelineImpl.java wiring fetcher → processor →
    dispatcher): fetch volume, filter drops, successful deliveries per
    callee, retry-queue traffic, DLQ traffic, and dispatched bytes —
    per (topic, callee). This is the operator a proxy operator's
    dashboard runs; it demonstrates that the A-family stages compose
    into a single scan instead of one pass per stage.

    SCALE: everything is conditional aggregation over one message scan —
    one broadcast join (routes), one partial-agg shuffle on (topic,
    callee). No stage materializes an intermediate."""
    m = messages(spark, sf_dir)
    routes = _routes_df(spark)
    exhausted = (F.col("outcome") == "DLQ") | (
        (F.col("outcome") == "RETRY") & (F.col("retry_count") >= 5)
    )
    return (
        m.join(F.broadcast(routes), "topic")
        .groupBy("topic", "callee_uri")
        .agg(
            F.count("*").alias("n_fetched"),
            F.sum(F.when(F.col("outcome") == "SKIP", 1).otherwise(0)).alias("n_filtered"),
            F.sum(F.when(F.col("outcome") == "OK", 1).otherwise(0)).alias("n_delivered"),
            F.sum(
                F.when((F.col("outcome") == "RETRY") & (F.col("retry_count") < 5), 1).otherwise(0)
            ).alias("n_retried"),
            F.sum(F.when(exhausted, 1).otherwise(0)).alias("n_dlq"),
            F.sum(F.when(F.col("outcome") != "SKIP", F.col("size_bytes")).otherwise(0)).alias(
                "dispatched_bytes"
            ),
        )
    )


# --- A20 -----------------------------------------------------------------
COMPACTION_ORACLE = f"""{MSG_CTE}
SELECT topic,
       CAST(msg_offset % 1000 AS BIGINT) AS msg_key,
       max(msg_offset)                   AS latest_offset,
       arg_max(ts, msg_offset)           AS latest_ts,
       arg_max(payload_value, msg_offset) AS payload_value
FROM messages
GROUP BY topic, msg_offset % 1000
"""


@register("log_compaction", COMPACTION_ORACLE)
def log_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kafka compacted-topic semantics (the retention mode uForwarder's
    source topics can run under — the fetchers consume them like any
    topic, fetchers/kafka/AbstractKafkaFetcherThread.java;
    cleanup.policy=compact keeps only the LATEST record per message
    key): one row per (topic, key) at its highest offset. Key simulated
    as msg_offset % 1000.

    SCALE: latest-per-key is max_by — plain hash aggregation, one
    shuffle on (topic, key), fully map-side-combined, NO per-key sort
    (the row_number formulation sorts every key's history; max_by keeps
    one row per key per map partition). Deterministic because offsets
    are unique within a partition."""
    m = messages(spark, sf_dir)
    keyed = m.withColumn("msg_key", (F.col("msg_offset") % 1000).cast("bigint"))
    return keyed.groupBy("topic", "msg_key").agg(
        F.max("msg_offset").alias("latest_offset"),
        F.expr("max_by(ts, msg_offset)").alias("latest_ts"),
        F.expr("max_by(payload_value, msg_offset)").alias("payload_value"),
    )


# --- A21 -----------------------------------------------------------------
CHECKPOINT_RESUME_ORACLE = f"""{MSG_CTE},
heads AS (
  SELECT topic, part_id,
         min(msg_offset)                                   AS earliest_offset,
         max(msg_offset)                                   AS latest_offset,
         min(CASE WHEN NOT acked THEN msg_offset END)      AS min_unacked
  FROM messages GROUP BY topic, part_id
),
ck AS (
  SELECT h.topic, h.part_id, h.earliest_offset, h.latest_offset,
         max(CASE WHEN m.acked AND (h.min_unacked IS NULL OR m.msg_offset < h.min_unacked)
                  THEN m.msg_offset END) AS committed_offset
  FROM heads h
  JOIN messages m ON m.topic = h.topic AND m.part_id = h.part_id
  GROUP BY h.topic, h.part_id, h.earliest_offset, h.latest_offset
),
spec AS (
  SELECT topic, part_id, earliest_offset, latest_offset, committed_offset,
         CASE part_id % 3 WHEN 0 THEN 'ORIGINAL' WHEN 1 THEN 'RETRY' ELSE 'DLQ' END AS fetcher,
         CASE WHEN topic IN ('click', 'view') THEN 'EARLIEST'
              WHEN topic IN ('purchase', 'signup') THEN 'LATEST'
              ELSE 'NONE' END AS reset_policy,
         CASE part_id % 4
           WHEN 0 THEN earliest_offset - 100
           WHEN 1 THEN latest_offset + 100
           WHEN 2 THEN coalesce(committed_offset, earliest_offset)
           ELSE CAST(-1 AS BIGINT) END AS specified_offset
  FROM ck
),
seek AS (
  SELECT *,
         CASE
           WHEN fetcher = 'RETRY' THEN 'DO_NOT_SEEK'
           WHEN fetcher = 'DLQ' THEN
             CASE WHEN earliest_offset > specified_offset THEN 'SEEK_TO_EARLIEST'
                  WHEN latest_offset  < specified_offset THEN 'SEEK_TO_LATEST'
                  ELSE 'DO_NOT_SEEK' END
           ELSE
             CASE WHEN earliest_offset > specified_offset OR latest_offset < specified_offset THEN
                    CASE reset_policy WHEN 'EARLIEST' THEN 'SEEK_TO_EARLIEST'
                                      WHEN 'LATEST'   THEN 'SEEK_TO_LATEST'
                                      ELSE 'SEEK_TO_SPECIFIED' END
                  ELSE 'SEEK_TO_SPECIFIED' END
         END AS seek_option
  FROM spec
)
SELECT topic, part_id, fetcher, reset_policy,
       earliest_offset, latest_offset, committed_offset, specified_offset, seek_option,
       CASE seek_option
         WHEN 'SEEK_TO_EARLIEST'  THEN earliest_offset
         WHEN 'SEEK_TO_LATEST'    THEN latest_offset
         WHEN 'SEEK_TO_SPECIFIED' THEN specified_offset
         ELSE coalesce(committed_offset + 1, earliest_offset)
       END AS resume_offset
FROM seek
"""


@register("checkpoint_resume", CHECKPOINT_RESUME_ORACLE)
def checkpoint_resume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KafkaCheckpointManager + SeekStartOffsetOption + the per-fetcher
    seek policies (worker/fetchers/kafka/KafkaCheckpointManager.java:16,
    SeekStartOffsetOption.java:4; consumerproxy/worker/fetcher/
    OriginalTopicKafkaFetcher.java:72, RetryTopicKafkaFetcher.java:88,
    DlqTopicKafkaFetcher.java:66): on (re)assignment a fetcher resolves
    WHERE to start reading — the job's specified start offset checked
    against the partition's [earliest, latest] range, with the
    auto-offset-reset policy deciding the out-of-range fallback:

      ORIGINAL: out-of-range -> policy (EARLIEST/LATEST/else SPECIFIED);
                in-range -> SEEK_TO_SPECIFIED
      RETRY:    always DO_NOT_SEEK (resume from the consumer group's
                committed offset)
      DLQ:      below range -> EARLIEST, above -> LATEST, else DO_NOT_SEEK

    DO_NOT_SEEK resumes at committed+1 (the A5 watermark — the offset
    the group would have committed), falling back to earliest when
    nothing is committed. Fetcher type and the job's specified offset
    are simulated deterministically per partition so all matrix cells
    are exercised.

    SCALE: same shape as A5 — two hash aggs over (topic, part_id) with
    a broadcast heads join; the policy matrix is pure per-row CASE on
    the O(partitions) result. No sort, no UDFs."""
    m = messages(spark, sf_dir)
    heads = m.groupBy("topic", "part_id").agg(
        F.min("msg_offset").alias("earliest_offset"),
        F.max("msg_offset").alias("latest_offset"),
        F.min(F.when(~F.col("acked"), F.col("msg_offset"))).alias("min_unacked"),
    )
    below = F.col("min_unacked").isNull() | (F.col("msg_offset") < F.col("min_unacked"))
    ck = (
        m.join(F.broadcast(heads), ["topic", "part_id"])
        .groupBy("topic", "part_id", "earliest_offset", "latest_offset")
        .agg(
            F.max(F.when(F.col("acked") & below, F.col("msg_offset"))).alias("committed_offset")
        )
    )
    spec = ck.select(
        "*",
        F.expr(
            "CASE part_id % 3 WHEN 0 THEN 'ORIGINAL' WHEN 1 THEN 'RETRY' ELSE 'DLQ' END"
        ).alias("fetcher"),
        F.expr(
            "CASE WHEN topic IN ('click', 'view') THEN 'EARLIEST' "
            "WHEN topic IN ('purchase', 'signup') THEN 'LATEST' ELSE 'NONE' END"
        ).alias("reset_policy"),
        F.expr(
            "CASE part_id % 4 WHEN 0 THEN earliest_offset - 100 "
            "WHEN 1 THEN latest_offset + 100 "
            "WHEN 2 THEN coalesce(committed_offset, earliest_offset) "
            "ELSE CAST(-1 AS BIGINT) END"
        ).alias("specified_offset"),
    )
    seek = spec.withColumn(
        "seek_option",
        F.expr(
            "CASE WHEN fetcher = 'RETRY' THEN 'DO_NOT_SEEK' "
            "WHEN fetcher = 'DLQ' THEN "
            "  CASE WHEN earliest_offset > specified_offset THEN 'SEEK_TO_EARLIEST' "
            "       WHEN latest_offset  < specified_offset THEN 'SEEK_TO_LATEST' "
            "       ELSE 'DO_NOT_SEEK' END "
            "ELSE "
            "  CASE WHEN earliest_offset > specified_offset OR latest_offset < specified_offset THEN "
            "         CASE reset_policy WHEN 'EARLIEST' THEN 'SEEK_TO_EARLIEST' "
            "                           WHEN 'LATEST'   THEN 'SEEK_TO_LATEST' "
            "                           ELSE 'SEEK_TO_SPECIFIED' END "
            "       ELSE 'SEEK_TO_SPECIFIED' END "
            "END"
        ),
    )
    return seek.select(
        "topic", "part_id", "fetcher", "reset_policy",
        "earliest_offset", "latest_offset", "committed_offset", "specified_offset", "seek_option",
        F.expr(
            "CASE seek_option WHEN 'SEEK_TO_EARLIEST' THEN earliest_offset "
            "WHEN 'SEEK_TO_LATEST' THEN latest_offset "
            "WHEN 'SEEK_TO_SPECIFIED' THEN specified_offset "
            "ELSE coalesce(committed_offset + 1, earliest_offset) END"
        ).alias("resume_offset"),
    )


# --- A22 -----------------------------------------------------------------
DLQ_PURGE_ORACLE = f"""{MSG_CTE},
dlq AS (
  SELECT topic, part_id, msg_offset, size_bytes FROM messages
  WHERE outcome = 'DLQ' OR (outcome = 'RETRY' AND retry_count >= 5)
),
bounds AS (
  SELECT topic, part_id,
         min(msg_offset) AS purge_start,
         (min(msg_offset) + max(msg_offset)) // 2 AS purge_end
  FROM dlq GROUP BY topic, part_id
)
SELECT d.topic, d.part_id, b.purge_start, b.purge_end,
       count(*) AS n_dlq,
       CAST(sum(CASE WHEN d.msg_offset < b.purge_end THEN 1 ELSE 0 END) AS BIGINT) AS n_purged,
       CAST(sum(CASE WHEN d.msg_offset >= b.purge_end THEN 1 ELSE 0 END) AS BIGINT) AS n_surviving,
       min(CASE WHEN d.msg_offset >= b.purge_end THEN d.msg_offset END) AS surviving_min,
       max(CASE WHEN d.msg_offset >= b.purge_end THEN d.msg_offset END) AS surviving_max
FROM dlq d JOIN bounds b USING (topic, part_id)
GROUP BY d.topic, d.part_id, b.purge_start, b.purge_end
"""


@register("dlq_purge", DLQ_PURGE_ORACLE)
def dlq_purge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DLQ purge (consumerproxy/worker/fetcher/DlqTopicKafkaFetcher
    .java:112): a purge job acknowledges a DLQ offset range WITHOUT
    reprocessing it (handleEndOffsetAndDelay skips every record of a
    start==end purge job, so the range is committed past) — the admin
    twin of A11's merge/resurrection. Purge range per partition is
    simulated as [min, midpoint); emits purged vs surviving accounting
    and the surviving offset span that a follow-up merge job would
    target.

    SCALE: pushed-down DLQ filter shrinks the scan to the DLQ subset;
    bounds are one hash agg per (topic, part_id), broadcast back; the
    final agg reuses the same shard key. No sort, no message-scale
    join."""
    dlq = messages(spark, sf_dir).filter(
        (F.col("outcome") == "DLQ") | ((F.col("outcome") == "RETRY") & (F.col("retry_count") >= 5))
    ).select("topic", "part_id", "msg_offset", "size_bytes")
    bounds = dlq.groupBy("topic", "part_id").agg(
        F.min("msg_offset").alias("purge_start"),
        F.expr("(min(msg_offset) + max(msg_offset)) DIV 2").alias("purge_end"),
    )
    purged = F.col("msg_offset") < F.col("purge_end")
    return (
        dlq.join(F.broadcast(bounds), ["topic", "part_id"])
        .groupBy("topic", "part_id", "purge_start", "purge_end")
        .agg(
            F.count("*").alias("n_dlq"),
            F.sum(F.when(purged, 1).otherwise(0)).alias("n_purged"),
            F.sum(F.when(~purged, 1).otherwise(0)).alias("n_surviving"),
            F.min(F.when(~purged, F.col("msg_offset"))).alias("surviving_min"),
            F.max(F.when(~purged, F.col("msg_offset"))).alias("surviving_max"),
        )
    )


# --- A24 -----------------------------------------------------------------
# Per-topic processing delay (ms) — the consumer-configured delay that
# KafkaDelayProcessManager enforces (0 = no delay, the NOOP manager).
DELAYS = [
    ("click", 0),
    ("view", 3_600_000),         # 1 h
    ("purchase", 43_200_000),    # 12 h
    ("signup", 86_400_000),      # 24 h
    ("error", 259_200_000),      # 72 h
]
DELAYS_SQL = "(VALUES " + ", ".join(f"('{t}', {d})" for t, d in DELAYS) + ") AS d(topic, delay_ms)"
# The fetcher's poll instant, fixed so the operator is deterministic.
DELAY_NOW = "2024-01-12 00:00:00"

DELAY_PROCESS_ORACLE = f"""{MSG_CTE},
polled AS (
  SELECT m.topic, m.part_id, m.msg_offset, m.ts, d.delay_ms,
         d.delay_ms > 0
           AND epoch_ms(m.ts) + d.delay_ms > epoch_ms(TIMESTAMP '{DELAY_NOW}') AS delayed
  FROM messages m JOIN {DELAYS_SQL} USING (topic)
  WHERE m.ts <= TIMESTAMP '{DELAY_NOW}'
),
marked AS (
  SELECT *,
         min(CASE WHEN delayed THEN msg_offset END)
           OVER (PARTITION BY topic, part_id) AS paused_start_offset
  FROM polled
)
SELECT topic, part_id, delay_ms,
       count(*) AS n_polled,
       CAST(count(*) FILTER (WHERE paused_start_offset IS NULL
                                OR msg_offset < paused_start_offset) AS BIGINT) AS n_processed,
       CAST(count(*) FILTER (WHERE paused_start_offset IS NOT NULL
                               AND msg_offset >= paused_start_offset) AS BIGINT) AS n_paused,
       paused_start_offset,
       max(CASE WHEN msg_offset = paused_start_offset
                THEN epoch_ms(ts) + delay_ms END) AS resume_ms
FROM marked
GROUP BY topic, part_id, delay_ms, paused_start_offset
"""


@register("delay_process", DELAY_PROCESS_ORACLE)
def delay_process(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KafkaDelayProcessManager
    (uforwarder-core/.../worker/fetchers/kafka/KafkaDelayProcessManager.java:54):
    delayed-processing topics hold each record until
    ``record.timestamp + processingDelayMs`` has passed. The fetcher
    consumes a partition in offset order, so the FIRST record whose
    deadline is still in the future pauses the whole partition
    (kafkaConsumer.pause) and every already-polled record from that
    offset on is parked as unprocessed; the partition resumes when the
    head record's deadline expires (resumePausedPartitionsAndRecords).

    Emits the per-(topic, part_id) pause ledger at one poll instant:
    how many polled records were processed vs parked, where the pause
    begins, and the epoch-ms instant the partition becomes resumable.
    Topics with delay 0 use the NOOP manager (never delayed), matching
    DelayProcessManager.NOOP.

    SCALE: one broadcast join against the O(topics) delay config, one
    window + groupBy on the SAME (topic, part_id) key — Catalyst reuses
    the exchange, so the message log shuffles once. The ts <= now
    predicate pushes to the scan (prunes future date partitions
    outright at 100 TB)."""
    delays = spark.createDataFrame(DELAYS, ["topic", "delay_ms"])
    now = F.lit(DELAY_NOW).cast("timestamp")
    polled = (
        messages(spark, sf_dir)
        .filter(F.col("ts") <= now)
        .join(F.broadcast(delays), "topic")
        .withColumn(
            "delayed",
            (F.col("delay_ms") > 0)
            & (F.unix_millis(F.col("ts")) + F.col("delay_ms") > F.unix_millis(now)),
        )
    )
    marked = polled.withColumn(
        "paused_start_offset",
        F.min(F.when(F.col("delayed"), F.col("msg_offset"))).over(
            Window.partitionBy("topic", "part_id")
        ),
    )
    processed = F.col("paused_start_offset").isNull() | (
        F.col("msg_offset") < F.col("paused_start_offset")
    )
    return marked.groupBy("topic", "part_id", "delay_ms", "paused_start_offset").agg(
        F.count("*").alias("n_polled"),
        F.count(F.when(processed, 1)).alias("n_processed"),
        F.count(F.when(~processed, 1)).alias("n_paused"),
        F.max(
            F.when(
                F.col("msg_offset") == F.col("paused_start_offset"),
                F.unix_millis(F.col("ts")) + F.col("delay_ms"),
            )
        ).alias("resume_ms"),
    ).select(
        "topic", "part_id", "delay_ms", "n_polled", "n_processed", "n_paused",
        "paused_start_offset", "resume_ms",
    )


# --- A25 -----------------------------------------------------------------
CREDIT_WINDOW_MS = 300_000  # DLQ_TOKEN_LIMITER_WINDOW_MILLIS: 5-min expiry
CREDIT_DEFAULT_TOKENS = 1   # DLQ_TOKEN_LIMITER_DEFAULT_TOKENS
TIMEOUT_RETRIES = 4         # proxy for timeoutCount >= maxRpcTimeouts

DLQ_TOKENS_ORACLE = f"""{MSG_CTE},
flow AS (
  SELECT topic, part_id, epoch_ms(ts) AS ms,
         CASE WHEN acked THEN 1 ELSE -1 END AS credit_net,
         NOT acked AS candidate
  FROM messages
  WHERE acked
     OR (outcome IN ('DLQ', 'RETRY') AND retry_count >= {TIMEOUT_RETRIES})
),
balance AS (
  SELECT *,
         {CREDIT_DEFAULT_TOKENS} + sum(credit_net) OVER (
           PARTITION BY topic, part_id ORDER BY ms
           RANGE BETWEEN {CREDIT_WINDOW_MS - 1} PRECEDING AND CURRENT ROW
         ) AS tokens_after
  FROM flow
)
SELECT topic, part_id,
       CAST(count(*) FILTER (WHERE NOT candidate) AS BIGINT)  AS n_credits,
       CAST(count(*) FILTER (WHERE candidate) AS BIGINT)      AS n_candidates,
       CAST(count(*) FILTER (WHERE candidate AND tokens_after >= 0) AS BIGINT)
         AS n_to_dlq,
       CAST(count(*) FILTER (WHERE candidate AND tokens_after < 0) AS BIGINT)
         AS n_backoff,
       CAST(min(tokens_after) AS BIGINT) AS min_tokens
FROM balance
GROUP BY topic, part_id
"""


@register("dlq_dispatch_tokens", DLQ_TOKENS_ORACLE)
def dlq_dispatch_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DlqDispatchManager + WindowedTokenLimiter
    (consumerproxy/worker/processor/DlqDispatchManager.java:22,
    WindowedTokenLimiter.java:31, used at ProcessorImpl.java:425,446):
    per (topic, partition) a time-windowed token limiter gates
    BACKOFF -> DLQ conversion for messages that exhausted their RPC
    timeout budget. Completions (COMMIT/SKIP) credit one token; tokens
    EXPIRE after the 5-minute window (unlike A8's fixed per-minute rate
    and A18's continuous refill, the balance is a sliding-window sum);
    each window grants one free default token so consumers never stick.

    Credits map to acked messages, acquirers to messages whose retry
    count exhausted the timeout budget. The balance each acquirer sees
    is the window sum of credits minus window debits through its own —
    the deterministic pessimistic variant (every candidate debits
    whether or not it was approved); the exact acquire-feedback
    recurrence is sequential state, A18's applyInPandas territory.

    SCALE: the flow frame keeps only credit/acquire events (the
    disjunctive filter runs right after the column-pruned scan — the
    outcome columns are derived, so there is nothing to push into
    parquet), so the range window sorts a fraction of the log per
    (topic, part_id) — uForwarder's own shard unit — and the summary
    agg reuses the same hash partitioning (one exchange total,
    plan-locked)."""
    m = messages(spark, sf_dir)
    flow = m.filter(
        F.col("acked")
        | (F.col("outcome").isin("DLQ", "RETRY") & (F.col("retry_count") >= TIMEOUT_RETRIES))
    ).select(
        "topic",
        "part_id",
        F.unix_millis("ts").alias("ms"),
        F.when(F.col("acked"), 1).otherwise(-1).alias("credit_net"),
        (~F.col("acked")).alias("candidate"),
    )
    w = (
        Window.partitionBy("topic", "part_id")
        .orderBy("ms")
        .rangeBetween(-(CREDIT_WINDOW_MS - 1), 0)
    )
    balance = flow.withColumn(
        "tokens_after", F.lit(CREDIT_DEFAULT_TOKENS) + F.sum("credit_net").over(w)
    )
    return balance.groupBy("topic", "part_id").agg(
        F.count(F.when(~F.col("candidate"), 1)).alias("n_credits"),
        F.count(F.when(F.col("candidate"), 1)).alias("n_candidates"),
        F.count(F.when(F.col("candidate") & (F.col("tokens_after") >= 0), 1)).alias("n_to_dlq"),
        F.count(F.when(F.col("candidate") & (F.col("tokens_after") < 0), 1)).alias("n_backoff"),
        F.min("tokens_after").alias("min_tokens"),
    )


# --- A26 -----------------------------------------------------------------
BOOT_CAP = 10                  # bootstrapLimit (slow-start cap)
BOOT_COMPLETE_THRESHOLD = 100  # bootstrapCompleteThreshold
STEADY_CAP = INFLIGHT_LIMIT    # working-phase cap = A7's limit

BOOTSTRAP_ORACLE = f"""{MSG_CTE},
phase AS (
  SELECT topic, part_id,
         CAST(sum(CASE WHEN acked THEN 1 ELSE 0 END) AS BIGINT) AS n_completed
  FROM messages GROUP BY topic, part_id
),
pending AS (
  SELECT topic, part_id, msg_offset,
         row_number() OVER (PARTITION BY topic, part_id ORDER BY msg_offset) AS rn
  FROM messages WHERE NOT acked
)
SELECT ph.topic, ph.part_id,
       CASE WHEN ph.n_completed > {BOOT_COMPLETE_THRESHOLD}
            THEN 'working' ELSE 'bootstrap' END             AS phase,
       ph.n_completed,
       CASE WHEN ph.n_completed > {BOOT_COMPLETE_THRESHOLD}
            THEN {STEADY_CAP} ELSE {min(BOOT_CAP, STEADY_CAP)} END AS effective_cap,
       count(p.msg_offset)                                  AS n_pending,
       CAST(sum(CASE WHEN p.rn <= CASE WHEN ph.n_completed > {BOOT_COMPLETE_THRESHOLD}
                                       THEN {STEADY_CAP} ELSE {min(BOOT_CAP, STEADY_CAP)} END
                     THEN 1 ELSE 0 END) AS BIGINT)          AS n_admitted,
       CAST(sum(CASE WHEN p.rn > CASE WHEN ph.n_completed > {BOOT_COMPLETE_THRESHOLD}
                                      THEN {STEADY_CAP} ELSE {min(BOOT_CAP, STEADY_CAP)} END
                     THEN 1 ELSE 0 END) AS BIGINT)          AS n_blocked
FROM phase ph LEFT JOIN pending p USING (topic, part_id)
GROUP BY ph.topic, ph.part_id, ph.n_completed
"""


def inflight_bootstrap_frame(
    m: DataFrame,
    boot_cap: int = BOOT_CAP,
    steady_cap: int = STEADY_CAP,
    threshold: int = BOOT_COMPLETE_THRESHOLD,
) -> DataFrame:
    """Frame-level A26 (unit-testable): a partition whose completed count
    has not yet exceeded ``threshold`` is still bootstrapping and admits
    under min(boot_cap, steady_cap) — the reference acquires from BOTH
    limiters during bootstrap — then admits under steady_cap alone."""
    boot_eff = min(boot_cap, steady_cap)
    phase_df = m.groupBy("topic", "part_id").agg(
        F.sum(F.when(F.col("acked"), 1).otherwise(0)).alias("n_completed")
    )
    pending = m.filter(~F.col("acked")).withColumn(
        "rn", F.row_number().over(Window.partitionBy("topic", "part_id").orderBy("msg_offset"))
    )
    working = F.col("n_completed") > threshold
    cap = F.when(working, steady_cap).otherwise(boot_eff)
    joined = phase_df.join(pending.select("topic", "part_id", "msg_offset", "rn"),
                           ["topic", "part_id"], "left")
    return (
        joined.groupBy("topic", "part_id", "n_completed")
        .agg(
            F.count("msg_offset").alias("n_pending"),
            F.sum(F.when(F.col("rn") <= cap, 1).otherwise(0)).cast("bigint").alias("n_admitted"),
            F.sum(F.when(F.col("rn") > cap, 1).otherwise(0)).cast("bigint").alias("n_blocked"),
        )
        .withColumn("phase", F.when(working, "working").otherwise("bootstrap"))
        .withColumn("effective_cap", F.when(working, F.lit(steady_cap)).otherwise(F.lit(boot_eff)).cast("int"))
        .select("topic", "part_id", "phase", "n_completed", "effective_cap",
                "n_pending", "n_admitted", "n_blocked")
    )


@register("inflight_bootstrap", BOOTSTRAP_ORACLE)
def inflight_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BootstrapLongFixedInflightLimiter
    (uforwarder/.../worker/limiter/BootstrapLongFixedInflightLimiter.java:14):
    a freshly-started pipeline runs a bootstrap phase in which every
    acquire must win a permit from BOTH the working limiter and the
    (tighter) bootstrap limiter — i.e. slow-start under
    min(bootstrapLimit, limit) — and flips permanently to the working
    phase once completed tasks exceed bootstrapCompleteThreshold
    (BootstrapPermit.complete, :117-121). Emits the per-partition phase,
    effective cap, and admit/block split of the pending backlog.

    SCALE: two shuffles on (topic, part_id) — the full log for the
    phase agg and the (much smaller) unacked subset for the pending
    window; the O(partitions) phase table then broadcast-joins onto the
    pending rows. No global ordering anywhere."""
    return inflight_bootstrap_frame(messages(spark, sf_dir))


# --- A27 -----------------------------------------------------------------
PENDING_ORDER_ORACLE = f"""{MSG_CTE},
pending AS (
  SELECT topic, part_id, msg_offset,
         row_number() OVER (PARTITION BY topic, part_id ORDER BY msg_offset) AS rn
  FROM messages WHERE NOT acked
),
blocked AS (
  -- rn is dense per partition, so the blocked queue position is just
  -- the offset-rank beyond the admit cap: no second window needed
  SELECT topic, part_id, msg_offset, rn - {INFLIGHT_LIMIT} AS queue_pos
  FROM pending WHERE rn > {INFLIGHT_LIMIT}
)
SELECT topic, part_id, msg_offset, queue_pos,
       row_number() OVER (PARTITION BY topic ORDER BY queue_pos, part_id) AS completion_rank
FROM blocked
"""


@register("inflight_pending_order", PENDING_ORDER_ORACLE)
def inflight_pending_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AsyncInflightLimiterAdapter.PendingMessageQueue
    (uforwarder/.../worker/limiter/AsyncInflightLimiterAdapter.java:42,194):
    acquires that could not get a permit synchronously enter a pending
    queue that drains round-robin ACROSS partitions and in offset order
    WITHIN a partition (PriorityQueue per partition keyed by offset,
    circulating partition iterator). Emits, for every blocked acquire
    (the unacked messages beyond A7's cap), its per-partition queue
    position and the deterministic round-robin completion rank within
    its topic's job group.

    SCALE: both windows shuffle on (topic, part_id) / topic of already-
    filtered pending rows (a small fraction of the log); the per-topic
    rank orders by (queue_pos, part_id), which Spark evaluates as one
    window over the pruned pending set — no global sort of the log."""
    m = messages(spark, sf_dir)
    pending = m.filter(~F.col("acked")).withColumn(
        "rn", F.row_number().over(Window.partitionBy("topic", "part_id").orderBy("msg_offset"))
    )
    # rn is dense per partition → queue position is rn - cap, no second window
    blocked = pending.filter(F.col("rn") > INFLIGHT_LIMIT).withColumn(
        "queue_pos", (F.col("rn") - INFLIGHT_LIMIT).cast("long")
    )
    return blocked.withColumn(
        "completion_rank",
        F.row_number().over(Window.partitionBy("topic").orderBy("queue_pos", "part_id")),
    ).select("topic", "part_id", "msg_offset", "queue_pos", "completion_rank")


# --- A28 -----------------------------------------------------------------
THROUGHPUT_AS_OF = "2024-01-31 00:00:00"   # fixed observation instant
RECENT_WINDOW_MS = 7 * 86_400_000          # trailing 'recent-rate' window

FETCHER_THROUGHPUT_ORACLE = f"""{MSG_CTE}
SELECT topic, part_id,
       CAST(count(CASE WHEN acked THEN 1 END) AS BIGINT)  AS n_acked,
       CAST(sum(CASE WHEN acked THEN size_bytes ELSE 0 END) AS BIGINT) AS acked_bytes,
       epoch_ms(TIMESTAMP '{THROUGHPUT_AS_OF}') - epoch_ms(min(ts)) + 1 AS elapsed_ms,
       CAST(count(CASE WHEN acked THEN 1 END) AS DOUBLE) * 1000.0
         / (epoch_ms(TIMESTAMP '{THROUGHPUT_AS_OF}') - epoch_ms(min(ts)) + 1) AS msgs_per_sec,
       CAST(sum(CASE WHEN acked THEN size_bytes ELSE 0 END) AS DOUBLE) * 1000.0
         / (epoch_ms(TIMESTAMP '{THROUGHPUT_AS_OF}') - epoch_ms(min(ts)) + 1) AS bytes_per_sec,
       CAST(count(CASE WHEN acked AND epoch_ms(ts) >
             epoch_ms(TIMESTAMP '{THROUGHPUT_AS_OF}') - {RECENT_WINDOW_MS}
           THEN 1 END) AS BIGINT)                          AS recent_msgs,
       CAST(sum(CASE WHEN acked AND epoch_ms(ts) >
             epoch_ms(TIMESTAMP '{THROUGHPUT_AS_OF}') - {RECENT_WINDOW_MS}
           THEN size_bytes ELSE 0 END) AS BIGINT)          AS recent_bytes
FROM messages
GROUP BY topic, part_id
"""


@register("fetcher_throughput", FETCHER_THROUGHPUT_ORACLE)
def fetcher_throughput(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ThroughputTracker
    (uforwarder-core/.../worker/fetchers/kafka/ThroughputTracker.java:11):
    the fetcher tracks per-TopicPartition message/byte ACK rates
    (M1Rate.mark on every record ack, :106) — a signal distinct from
    A13's dispatch-side windows — and reports them to the controller's
    workload model. Batch twin: lifetime msgs/bytes-per-sec since the
    partition's first message (init, :31) plus a trailing recent window
    standing in for the reference's 1-minute EWMA (the synthetic log's
    cadence is days, so the recent window is 7 days; the semantic —
    recent rate vs lifetime rate — is what the controller consumes).

    SCALE: single partial agg on (topic, part_id) with conditional
    sums — one shuffle, no windows, no second scan."""
    m = messages(spark, sf_dir)
    as_of_ms = F.unix_millis(F.lit(THROUGHPUT_AS_OF).cast("timestamp"))
    acked = F.col("acked")
    recent = acked & (F.unix_millis("ts") > as_of_ms - RECENT_WINDOW_MS)
    agg = m.groupBy("topic", "part_id").agg(
        F.count(F.when(acked, 1)).alias("n_acked"),
        F.sum(F.when(acked, F.col("size_bytes")).otherwise(0)).alias("acked_bytes"),
        # +1 ms guards the elapsed==0 edge (earliest ts == THROUGHPUT_AS_OF):
        # Spark integer division would yield NULL but DuckDB double division
        # yields inf — a cross-engine parity divergence. Same trick as
        # littles_law_frame's span denominator.
        (as_of_ms - F.unix_millis(F.min("ts")) + F.lit(1)).alias("elapsed_ms"),
        F.count(F.when(recent, 1)).alias("recent_msgs"),
        F.sum(F.when(recent, F.col("size_bytes")).otherwise(0)).alias("recent_bytes"),
    )
    return agg.select(
        "topic", "part_id", "n_acked", "acked_bytes", "elapsed_ms",
        (F.col("n_acked").cast("double") * 1000.0 / F.col("elapsed_ms")).alias("msgs_per_sec"),
        (F.col("acked_bytes").cast("double") * 1000.0 / F.col("elapsed_ms")).alias("bytes_per_sec"),
        "recent_msgs", "recent_bytes",
    )


# --- A29 -----------------------------------------------------------------
FLUSH_INTERVAL_MS = 60_000   # KafkaDispatcher.FLUSH_INTERVAL_IN_MS
PRODUCE_BATCH_RECORDS = 20   # producer batching: records per send batch

PRODUCE_BATCHES_ORACLE = f"""{MSG_CTE},
outbound AS (
  SELECT CASE WHEN outcome = 'DLQ' THEN topic || '__dlq'
              ELSE topic || '__retry' END AS dest_topic,
         (epoch_ms(ts) // {FLUSH_INTERVAL_MS}) * {FLUSH_INTERVAL_MS} AS flush_ms,
         size_bytes
  FROM messages WHERE outcome IN ('RETRY', 'DLQ')
),
per_flush AS (
  SELECT dest_topic, flush_ms, count(*) AS n_records,
         CAST(sum(size_bytes) AS BIGINT) AS flush_bytes,
         CAST(ceil(CAST(count(*) AS DOUBLE) / {PRODUCE_BATCH_RECORDS}) AS BIGINT) AS n_batches
  FROM outbound GROUP BY dest_topic, flush_ms
)
SELECT dest_topic,
       strftime(to_timestamp(flush_ms // 86400000 * 86400), '%Y-%m-%d') AS day,
       count(*)                          AS n_flushes,
       CAST(sum(n_batches) AS BIGINT)    AS n_batches,
       CAST(sum(n_records) AS BIGINT)    AS n_records,
       CAST(sum(flush_bytes) AS BIGINT)  AS total_bytes,
       CAST(max(n_records) AS BIGINT)    AS max_flush_records
FROM per_flush
GROUP BY dest_topic, flush_ms // 86400000
"""


@register("dlq_produce_batches", PRODUCE_BATCHES_ORACLE)
def dlq_produce_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KafkaDispatcher
    (uforwarder-core/.../worker/dispatchers/kafka/KafkaDispatcher.java:76,133):
    the produce side of the retry/DLQ path — async submit() per record to
    the resolved destination topic, with the producer flushed every
    FLUSH_INTERVAL_IN_MS (mayBeFlush, :133). Batch twin of the E7 sink
    fan-out: RETRY traffic produces to <topic>__retry, DLQ to
    <topic>__dlq (RetryUtils routing), records group into 60-s flush
    intervals, and each flush splits into producer send batches of
    PRODUCE_BATCH_RECORDS. Emits the per-destination per-day produce
    ledger: flushes, batches, records, bytes, and the largest flush.

    SCALE: pushed-down outcome filter, then two partial aggs on aligned
    keys ((dest, flush) → (dest, day)) — the second agg's input is
    already tiny; no windows, no Python."""
    m = messages(spark, sf_dir).filter(F.col("outcome").isin("RETRY", "DLQ"))
    outbound = m.select(
        F.when(F.col("outcome") == "DLQ", F.concat(F.col("topic"), F.lit("__dlq")))
        .otherwise(F.concat(F.col("topic"), F.lit("__retry")))
        .alias("dest_topic"),
        ((F.unix_millis("ts") / FLUSH_INTERVAL_MS).cast("bigint") * FLUSH_INTERVAL_MS).alias(
            "flush_ms"
        ),
        "size_bytes",
    )
    per_flush = outbound.groupBy("dest_topic", "flush_ms").agg(
        F.count("*").alias("n_records"),
        F.sum("size_bytes").alias("flush_bytes"),
        F.ceil(F.count("*").cast("double") / PRODUCE_BATCH_RECORDS).alias("n_batches"),
    )
    day = F.date_format(
        ((F.col("flush_ms") / 86_400_000).cast("bigint") * 86_400).cast("timestamp"),
        "yyyy-MM-dd",
    )
    return per_flush.groupBy(day.alias("day"), F.col("dest_topic")).agg(
        F.count("*").alias("n_flushes"),
        F.sum("n_batches").alias("n_batches"),
        F.sum("n_records").alias("n_records"),
        F.sum("flush_bytes").alias("total_bytes"),
        F.max("n_records").alias("max_flush_records"),
    ).select("dest_topic", "day", "n_flushes", "n_batches", "n_records",
             "total_bytes", "max_flush_records")


# --- A30 -----------------------------------------------------------------
LL_MAX_INBOUND = 1000    # maxInboundMessages (median-latency concurrency bound)
LL_MAX_COMMIT_SKEW = 10_000  # maxCommitSkew (max-latency concurrency bound)

LITTLES_LAW_ORACLE = f"""{MSG_CTE},
base AS (
  SELECT topic, part_id,
         CAST(count(CASE WHEN acked THEN 1 END) AS BIGINT)     AS sample_size,
         CAST(max(CASE WHEN acked THEN latency_ms END) AS BIGINT) AS max_ms,
         CASE WHEN count(CASE WHEN acked THEN 1 END) > 0 THEN
           CAST(count(CASE WHEN acked THEN 1 END) AS DOUBLE) * 1000.0
             / (epoch_ms(max(ts)) - epoch_ms(min(ts)) + 1)
         END AS mps
  FROM messages
  GROUP BY topic, part_id
),
med AS (
  SELECT topic, part_id, exact AS median_ms
  FROM {counts_quantiles_sql('(SELECT * FROM messages WHERE acked)',
                             ['topic', 'part_id'], 'latency_ms', [0.5])}
),
stats AS (
  SELECT b.topic, b.part_id, b.sample_size, m.median_ms, b.max_ms, b.mps
  FROM base b LEFT JOIN med m ON m.topic = b.topic AND m.part_id = b.part_id
)
SELECT topic, part_id, sample_size, median_ms, max_ms, mps,
       {LL_MAX_INBOUND} / mps * 1000.0     AS max_median_ms,
       {LL_MAX_COMMIT_SKEW} / mps * 1000.0 AS max_max_ms,
       coalesce(median_ms > {LL_MAX_INBOUND} / mps * 1000.0, FALSE)  AS median_high,
       coalesce(max_ms > {LL_MAX_COMMIT_SKEW} / mps * 1000.0, FALSE) AS max_high
FROM stats
"""


def littles_law_frame(
    m: DataFrame, max_inbound: int = LL_MAX_INBOUND, max_commit_skew: int = LL_MAX_COMMIT_SKEW
) -> DataFrame:
    """Frame-level A30 (unit-testable): latency snapshot stats vs the
    Little's-law bounds concurrency/throughput."""
    acked_lat = F.when(F.col("acked"), F.col("latency_ms"))
    base = m.groupBy("topic", "part_id").agg(
        F.count(acked_lat).alias("sample_size"),
        F.max(acked_lat).alias("max_ms"),
        (
            F.count(acked_lat).cast("double")
            * 1000.0
            / (F.unix_millis(F.max("ts")) - F.unix_millis(F.min("ts")) + 1)
        ).alias("mps_raw"),
    )
    med = counts_quantiles(
        m.filter(F.col("acked")), ["topic", "part_id"], "latency_ms", [0.5]
    ).select("topic", "part_id", F.col("exact").alias("median_ms"))
    stats = base.join(med, ["topic", "part_id"], "left").select(
        "topic", "part_id", "sample_size", "median_ms", "max_ms", "mps_raw"
    )
    stats = stats.withColumn(
        "mps", F.when(F.col("sample_size") > 0, F.col("mps_raw"))
    ).drop("mps_raw")
    max_median = F.lit(float(max_inbound)) / F.col("mps") * 1000.0
    max_max = F.lit(float(max_commit_skew)) / F.col("mps") * 1000.0
    return stats.select(
        "topic", "part_id", "sample_size", "median_ms", "max_ms", "mps",
        max_median.alias("max_median_ms"),
        max_max.alias("max_max_ms"),
        # empty sample -> bound is effectively Long.MAX_VALUE (reference
        # getMaxLatency on zero throughput) -> never "high", not NULL
        F.coalesce(F.col("median_ms") > max_median, F.lit(False)).alias("median_high"),
        F.coalesce(F.col("max_ms") > max_max, F.lit(False)).alias("max_high"),
    )


@register("latency_littles_law", LITTLES_LAW_ORACLE)
def latency_littles_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LatencyTracker
    (uforwarder/.../worker/processor/LatencyTracker.java:60-125): a
    sliding reservoir of completed-request latencies yields median/max,
    compared against Little's-law ceilings — max tolerable latency =
    concurrencyLimit / messagesPerSec (getMaxLatency, :118) with
    maxInboundMessages bounding the median and maxCommitSkew bounding
    the max; isMedianLatencyHigh / isMaxLatencyHigh drive the
    commit-skew alarms. Batch twin over the ack'd message population per
    partition, with throughput measured from the partition's own span
    (A28's signal).

    SCALE: one partial agg on (topic, part_id); the exact median is the
    only non-streaming aggregate and runs on the already-reduced
    per-group arrays — at 100 TB swap F.percentile for
    percentile_approx(1e-4 accuracy) without touching the plan shape."""
    return littles_law_frame(messages(spark, sf_dir))


# --- A31 -----------------------------------------------------------------
CRITICAL_INFLIGHT_USAGE = 0.8   # CRITICAL_INFLIGHT_LIMIT_USAGE

USAGE_ORACLE = f"""{MSG_CTE},
spans AS (
  SELECT topic, part_id,
         epoch_ms(ts) AS start_ms,
         epoch_ms(ts) + latency_ms AS end_ms
  FROM messages
),
points AS (
  SELECT topic, part_id, start_ms AS ms, 1 AS delta FROM spans
  UNION ALL
  SELECT topic, part_id, end_ms AS ms, -1 AS delta FROM spans
),
running AS (
  SELECT topic, part_id,
         sum(delta) OVER (PARTITION BY topic, part_id
                          ORDER BY ms, delta
                          ROWS UNBOUNDED PRECEDING) AS inflight
  FROM points
)
SELECT topic, part_id,
       CAST(count(*) / 2 AS BIGINT)            AS n_spans,
       CAST(max(inflight) AS BIGINT)           AS peak_inflight,
       CAST(max(inflight) AS DOUBLE) / {INFLIGHT_LIMIT} AS usage,
       CAST(max(inflight) AS DOUBLE) / {INFLIGHT_LIMIT} > {CRITICAL_INFLIGHT_USAGE}
                                               AS is_critical
FROM running
GROUP BY topic, part_id
"""


def inflight_usage_frame(m: DataFrame, limit: int = INFLIGHT_LIMIT) -> DataFrame:
    """Frame-level A31 (unit-testable): peak concurrent dispatch spans
    per shard vs the inflight limit; usage > 0.8 flags critical."""
    spans = m.select(
        "topic",
        "part_id",
        F.unix_millis("ts").alias("start_ms"),
        (F.unix_millis("ts") + F.col("latency_ms")).alias("end_ms"),
    )
    points = spans.select(
        "topic", "part_id", F.col("start_ms").alias("ms"), F.lit(1).alias("delta")
    ).unionByName(
        spans.select(
            "topic", "part_id", F.col("end_ms").alias("ms"), F.lit(-1).alias("delta")
        )
    )
    w = (
        Window.partitionBy("topic", "part_id")
        .orderBy("ms", "delta")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    running = points.withColumn("inflight", F.sum("delta").over(w))
    usage = F.max("inflight").cast("double") / limit
    return running.groupBy("topic", "part_id").agg(
        (F.count("*") / 2).cast("bigint").alias("n_spans"),
        F.max("inflight").cast("bigint").alias("peak_inflight"),
        usage.alias("usage"),
        (usage > CRITICAL_INFLIGHT_USAGE).alias("is_critical"),
    )


@register("inflight_usage_critical", USAGE_ORACLE)
def inflight_usage_critical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimpleOutboundMessageLimiter usage stats
    (uforwarder/.../worker/processor/SimpleOutboundMessageLimiter.java:43,355-361,591):
    the limiter tracks how much of the inflight limit is actually in use
    (inflightTracker bucketed max / limit) and flags usage above
    CRITICAL_INFLIGHT_LIMIT_USAGE = 0.8 — the signal that lag is being
    CAUSED by inflight limiting rather than consumer slowness. Batch
    twin: each message's dispatch span is [ts, ts + latency_ms); peak
    concurrency per shard is the classic +1/−1 interval-overlap running
    sum (ends sort before starts at the same instant, so touching spans
    don't double-count); usage = peak / limit.

    SCALE: the span→point fan-out is map-side (2 rows per message), then
    ONE shuffle on (topic, part_id) serves both the running-sum window
    and the final agg. No joins, no global order."""
    return inflight_usage_frame(messages(spark, sf_dir))


# --- A32 -----------------------------------------------------------------
# Deterministic source-tier simulation: which queue a message was consumed
# FROM (original topic, tiered retry topic, DLQ topic, or resilience
# queue). Mirrors RetryUtils.isRetryTopic/isDLQTopic/isResqTopic, which
# classify by comparing the consumed topic against the job's queue config.
SRC_TIER_SQL = """CASE
    WHEN msg_offset % 23 = 0 THEN 'dlq'
    WHEN msg_offset % 23 = 1 THEN 'resq'
    WHEN retry_count > 0 THEN 'retry'
    ELSE 'original' END"""

RESQ_ROUTING_ORACLE = f"""{MSG_CTE},
tiered AS (
  SELECT *, {SRC_TIER_SQL} AS src_tier FROM messages
),
flow AS (
  SELECT topic, part_id, msg_offset, src_tier, retry_count, acked,
         epoch_ms(ts) AS ms,
         CASE WHEN acked THEN 1
              WHEN src_tier NOT IN ('dlq', 'resq')
                   AND retry_count >= {TIMEOUT_RETRIES} THEN -1
              ELSE 0 END AS credit_net
  FROM tiered
),
balance AS (
  SELECT *,
         {CREDIT_DEFAULT_TOKENS} + sum(credit_net) OVER (
           PARTITION BY topic, part_id ORDER BY ms
           RANGE BETWEEN {CREDIT_WINDOW_MS - 1} PRECEDING AND CURRENT ROW
         ) AS tokens_after
  FROM flow
),
rewritten AS (
  SELECT topic, msg_offset, src_tier,
         CASE WHEN src_tier = 'dlq' THEN 'DLQ'
              WHEN src_tier = 'resq' THEN 'INVALID'
              WHEN retry_count >= {TIMEOUT_RETRIES} AND tokens_after >= 0
                THEN 'DLQ'
              ELSE 'RETRY' END AS final_outcome
  FROM balance WHERE NOT acked
)
SELECT topic, src_tier,
       count(*)                                                    AS n_backoff,
       CAST(count(*) FILTER (WHERE final_outcome = 'DLQ') AS BIGINT)
                                                                   AS n_to_dlq,
       CAST(count(*) FILTER (WHERE final_outcome = 'INVALID') AS BIGINT)
                                                                   AS n_invalid,
       CAST(count(*) FILTER (WHERE final_outcome = 'RETRY') AS BIGINT)
                                                                   AS n_to_retry,
       min(msg_offset)                                   AS first_backoff_offset
FROM rewritten
GROUP BY topic, src_tier
"""


def resq_routing_frame(m: DataFrame) -> DataFrame:
    """Frame-level A32 (unit-testable): the full BACKOFF rewrite
    precedence of ProcessorImpl.handleTimeout
    (uforwarder/.../worker/processor/ProcessorImpl.java:431-466) with
    RetryUtils source-tier classification (utils/RetryUtils.java:91-107):

      1. consumed FROM the DLQ topic        -> DLQ     (never re-enters
         other queues)
      2. consumed FROM the resilience queue -> INVALID (in-memory retry;
         must not leak to other queues)
      3. otherwise: timeout budget exhausted AND a DlqDispatchManager
         token available -> DLQ, else -> RETRY (A25's windowed token
         balance, pessimistic deterministic variant)

    Acked completions credit the limiter (handleTimeout SKIP/COMMIT
    branch); tier-ineligible BACKOFFs never touch it (credit_net = 0)."""
    src_tier = (
        F.when(F.col("msg_offset") % 23 == 0, "dlq")
        .when(F.col("msg_offset") % 23 == 1, "resq")
        .when(F.col("retry_count") > 0, "retry")
        .otherwise("original")
    )
    tiered = m.withColumn("src_tier", src_tier)
    eligible = (
        ~F.col("src_tier").isin("dlq", "resq")
        & (F.col("retry_count") >= TIMEOUT_RETRIES)
    )
    flow = tiered.select(
        "topic",
        "part_id",
        "msg_offset",
        "src_tier",
        "retry_count",
        "acked",
        F.unix_millis("ts").alias("ms"),
        F.when(F.col("acked"), 1).when(eligible, -1).otherwise(0).alias("credit_net"),
    )
    w = (
        Window.partitionBy("topic", "part_id")
        .orderBy("ms")
        .rangeBetween(-(CREDIT_WINDOW_MS - 1), 0)
    )
    balance = flow.withColumn(
        "tokens_after", F.lit(CREDIT_DEFAULT_TOKENS) + F.sum("credit_net").over(w)
    )
    rewritten = balance.filter(~F.col("acked")).withColumn(
        "final_outcome",
        F.when(F.col("src_tier") == "dlq", "DLQ")
        .when(F.col("src_tier") == "resq", "INVALID")
        .when(
            (F.col("retry_count") >= TIMEOUT_RETRIES) & (F.col("tokens_after") >= 0),
            "DLQ",
        )
        .otherwise("RETRY"),
    )
    return rewritten.groupBy("topic", "src_tier").agg(
        F.count("*").alias("n_backoff"),
        F.count(F.when(F.col("final_outcome") == "DLQ", 1)).alias("n_to_dlq"),
        F.count(F.when(F.col("final_outcome") == "INVALID", 1)).alias("n_invalid"),
        F.count(F.when(F.col("final_outcome") == "RETRY", 1)).alias("n_to_retry"),
        F.min("msg_offset").alias("first_backoff_offset"),
    )


@register("resq_routing", RESQ_ROUTING_ORACLE)
def resq_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ProcessorImpl.handleTimeout BACKOFF rewrite
    (uforwarder/.../worker/processor/ProcessorImpl.java:431-466) +
    RetryUtils.java:91-107 source tiers (see resq_routing_frame).
    Extends A25: where A25 models only
    the token-gated third branch, this models the full three-branch
    precedence including the resilience-queue INVALID conversion.

    SCALE: one window + one agg, both keyed by uForwarder's own
    (topic, part_id) shard; the window input is the full log but
    credit_net is a map-side projection — same single-wide-shuffle class
    as A25, and the final (topic, src_tier) agg is tiny."""
    return resq_routing_frame(messages(spark, sf_dir))


# --- A33 -----------------------------------------------------------------
AIMD_BATCH = 50        # dispatch results folded per adaptation step
AIMD_MIN = 4           # same clamps as A15's Vegas variant
AIMD_MAX = 200
AIMD_INIT = INFLIGHT_LIMIT


def _aimd_step(lim: str, drop: str, succ: str) -> str:
    """One AIMD transition (dialect-shared): multiplicative halve on any
    dropped result in the batch, additive +1 on an all-clear batch with
    at least one success, hold otherwise. DIV spelling differs."""
    return (
        f"CASE WHEN {drop} THEN greatest({AIMD_MIN}, ({lim}) {{div}} 2) "
        f"WHEN {succ} THEN least({AIMD_MAX}, ({lim}) + 1) "
        f"ELSE ({lim}) END"
    )


_STEP0_DUCK = _aimd_step(str(AIMD_INIT), "has_drop", "has_succ").format(div="//")
_STEPN_DUCK = _aimd_step("t.lim", "b.has_drop", "b.has_succ").format(div="//")

AIMD_ORACLE = f"""WITH RECURSIVE messages AS ({MESSAGES_SQL_BODY}),
numbered AS (
  SELECT topic, part_id, outcome, acked,
         row_number() OVER (PARTITION BY topic, part_id ORDER BY msg_offset) - 1
           AS rn0
  FROM messages
),
batches AS (
  SELECT topic, part_id, rn0 // {AIMD_BATCH} AS batch_id,
         bool_or(outcome = 'DLQ') AS has_drop,
         bool_or(acked)           AS has_succ
  FROM numbered GROUP BY topic, part_id, rn0 // {AIMD_BATCH}
),
traj AS (
  SELECT topic, part_id, batch_id,
         CAST({_STEP0_DUCK} AS BIGINT) AS lim,
         CAST(CASE WHEN NOT has_drop AND has_succ THEN 1 ELSE 0 END AS BIGINT)
           AS n_inc,
         CAST(CASE WHEN has_drop THEN 1 ELSE 0 END AS BIGINT) AS n_dec,
         CAST(least({AIMD_INIT}, {_STEP0_DUCK}) AS BIGINT)    AS min_lim,
         CAST(greatest({AIMD_INIT}, {_STEP0_DUCK}) AS BIGINT) AS max_lim
  FROM batches WHERE batch_id = 0
  UNION ALL
  SELECT b.topic, b.part_id, b.batch_id,
         CAST({_STEPN_DUCK} AS BIGINT),
         t.n_inc + CASE WHEN NOT b.has_drop AND b.has_succ THEN 1 ELSE 0 END,
         t.n_dec + CASE WHEN b.has_drop THEN 1 ELSE 0 END,
         least(t.min_lim, {_STEPN_DUCK}),
         greatest(t.max_lim, {_STEPN_DUCK})
  FROM traj t
  JOIN batches b
    ON b.topic = t.topic AND b.part_id = t.part_id
   AND b.batch_id = t.batch_id + 1
),
last AS (
  SELECT topic, part_id, max(batch_id) AS mb FROM traj GROUP BY topic, part_id
)
SELECT t.topic, t.part_id,
       t.batch_id + 1 AS n_batches,
       t.lim          AS final_limit,
       t.n_inc        AS n_increase,
       t.n_dec        AS n_decrease,
       t.min_lim      AS min_limit,
       t.max_lim      AS max_limit
FROM traj t
JOIN last l ON t.topic = l.topic AND t.part_id = l.part_id AND t.batch_id = l.mb
"""

_STEP_SPARK = _aimd_step("acc.lim", "b.has_drop", "b.has_succ").format(div="DIV")

_AIMD_FOLD = f"""aggregate(
  batches,
  named_struct(
    'lim',     CAST({AIMD_INIT} AS BIGINT),
    'n_inc',   CAST(0 AS BIGINT),
    'n_dec',   CAST(0 AS BIGINT),
    'min_lim', CAST({AIMD_INIT} AS BIGINT),
    'max_lim', CAST({AIMD_INIT} AS BIGINT)),
  (acc, b) -> named_struct(
    'lim',     CAST({_STEP_SPARK} AS BIGINT),
    'n_inc',   acc.n_inc + CASE WHEN NOT b.has_drop AND b.has_succ THEN 1 ELSE 0 END,
    'n_dec',   acc.n_dec + CASE WHEN b.has_drop THEN 1 ELSE 0 END,
    'min_lim', CAST(least(acc.min_lim, {_STEP_SPARK}) AS BIGINT),
    'max_lim', CAST(greatest(acc.max_lim, {_STEP_SPARK}) AS BIGINT))
)"""


def aimd_limiter_frame(m: DataFrame, batch: int = AIMD_BATCH) -> DataFrame:
    """Frame-level A33 (unit-testable): the base AdaptiveInflightLimiter
    trajectory (uforwarder/.../worker/limiter/AdaptiveInflightLimiter.java
    doComplete: onDropped shrinks the floating limit, onSuccess grows it,
    onIgnore holds — the additive-increase / multiplicative-decrease
    policy underneath the Vegas variant A15 models). Dispatch results
    fold in offset order in fixed-size batches; each batch applies one
    AIMD transition, clamped to [AIMD_MIN, AIMD_MAX].

    The recurrence is inherently sequential per shard, but the fold runs
    JVM-side as a higher-order ``aggregate`` over the ordered batch
    array — no Python, no applyInPandas. The oracle twin is a DuckDB
    recursive CTE over the same batch frame."""
    numbered = m.withColumn(
        "rn0",
        F.row_number().over(Window.partitionBy("topic", "part_id").orderBy("msg_offset"))
        - 1,
    )
    batches = numbered.groupBy(
        "topic", "part_id", F.expr(f"rn0 DIV {batch}").alias("batch_id")
    ).agg(
        F.expr("bool_or(outcome = 'DLQ')").alias("has_drop"),
        F.expr("bool_or(acked)").alias("has_succ"),
    )
    folded = batches.groupBy("topic", "part_id").agg(
        F.sort_array(F.collect_list(F.struct("batch_id", "has_drop", "has_succ"))).alias(
            "batches"
        )
    )
    return folded.select(
        "topic",
        "part_id",
        F.size("batches").cast("bigint").alias("n_batches"),
        F.expr(_AIMD_FOLD).alias("acc"),
    ).select(
        "topic",
        "part_id",
        "n_batches",
        F.col("acc.lim").alias("final_limit"),
        F.col("acc.n_inc").alias("n_increase"),
        F.col("acc.n_dec").alias("n_decrease"),
        F.col("acc.min_lim").alias("min_limit"),
        F.col("acc.max_lim").alias("max_limit"),
    )


@register("aimd_inflight_limiter", AIMD_ORACLE)
def aimd_inflight_limiter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AdaptiveInflightLimiter AIMD trajectory (see aimd_limiter_frame).
    Reference test mirrored: AdaptiveInflightLimiterTest.java (limit
    floats with completion results; blocked acquires wait for permits).

    SCALE: the rank window and the batch agg share the (topic, part_id)
    hash partitioning — one wide shuffle; batch summaries are 1/BATCH
    the log before the per-shard array collects, and the fold itself is
    O(n_batches) inside codegen. The per-shard sequential tail is the
    same irreducible class as A18's token bucket — but here it runs on
    the 50x-reduced batch frame, not the raw log."""
    return aimd_limiter_frame(messages(spark, sf_dir))


# --- A34 -----------------------------------------------------------------
QUEUE_CAPACITY = 250         # AckTrackingQueue capacity (sized so the
                             # critical-load branch fires on the log)
CRITICAL_LOAD = 0.9          # HeadBlockingDetector.Builder critical
MIN_ACK_PERCENT = 0.9        # minAckPercent (ref default 0.98; lowered so
                             # both branches occur on the synthetic log)
COST_TOKEN_RESQ = 2          # BlockingQueueStubManager.COST_TOKEN_RESQ
COST_TOKEN_RETRY = 50        # BlockingQueueStubManager.COST_TOKEN_RETRY

# Which queue each job consumes (simulated from part_id) and which
# mitigation queues each topic's job config provides.
_JOB_SRC_SQL = """CASE part_id WHEN 0 THEN 'dlq' WHEN 1 THEN 'resq'
    WHEN 2 THEN 'retry' ELSE 'original' END"""
_HAS_RESQ_SQL = "topic IN ('click', 'view')"
_HAS_RETRY_SQL = "topic <> 'signup'"

HEAD_CANCEL_ORACLE = f"""{MSG_CTE},
heads AS (
  SELECT topic, part_id,
         min(CASE WHEN NOT acked THEN msg_offset END) AS head_offset
  FROM messages GROUP BY topic, part_id
),
q AS (
  SELECT m.topic, m.part_id, h.head_offset,
         CAST(count(CASE WHEN m.msg_offset >= h.head_offset THEN 1 END) AS BIGINT)
           AS q_size,
         CAST(count(CASE WHEN m.msg_offset >= h.head_offset AND m.acked THEN 1 END)
              AS BIGINT) AS q_acked
  FROM messages m JOIN heads h USING (topic, part_id)
  GROUP BY m.topic, m.part_id, h.head_offset
),
state AS (
  SELECT *,
         CAST(q_size AS DOUBLE) / {QUEUE_CAPACITY} AS load_factor,
         CASE WHEN q_size > 0
              THEN CAST(q_acked AS DOUBLE) / CAST(q_size AS DOUBLE) END AS ack_pct,
         {_JOB_SRC_SQL} AS job_src,
         {_HAS_RESQ_SQL} AS has_resq,
         {_HAS_RETRY_SQL} AS has_retry
  FROM q
),
ruled AS (
  SELECT *,
         head_offset IS NOT NULL
           AND CAST(q_size AS DOUBLE) / {QUEUE_CAPACITY} > {CRITICAL_LOAD}
           AND CASE WHEN q_size > 0
                    THEN CAST(q_acked AS DOUBLE) / CAST(q_size AS DOUBLE)
                    ELSE 0.0 END > {MIN_ACK_PERCENT} AS blocking,
         CASE WHEN job_src = 'dlq' THEN NULL
              WHEN job_src <> 'resq' AND has_resq THEN 'RESQ'
              WHEN job_src NOT IN ('retry', 'resq') AND has_retry THEN 'RETRY'
              END AS rule_resp,
         CASE WHEN job_src = 'dlq' THEN NULL
              WHEN job_src <> 'resq' AND has_resq THEN {COST_TOKEN_RESQ}
              WHEN job_src NOT IN ('retry', 'resq') AND has_retry
                THEN {COST_TOKEN_RETRY} END AS rule_cost
  FROM state
)
SELECT topic, part_id, head_offset, q_size, q_acked,
       load_factor, ack_pct,
       CASE WHEN head_offset IS NULL THEN 'NO_CANCELABLE'
            WHEN NOT blocking THEN 'NOT_BLOCKING'
            WHEN rule_resp IS NULL THEN 'JOB_NOT_SUPPORTED'
            WHEN q_acked < rule_cost THEN 'RATE_LIMITED'
            ELSE 'CANCEL' END AS verdict,
       CASE WHEN head_offset IS NOT NULL AND blocking AND rule_resp IS NOT NULL
                 AND q_acked >= rule_cost
            THEN rule_resp ELSE 'INVALID' END AS response_code,
       CAST(CASE WHEN head_offset IS NOT NULL AND blocking THEN rule_cost END
            AS BIGINT) AS cost_tokens
FROM ruled
"""


def head_blocking_cancel_frame(
    m: DataFrame,
    capacity: int = QUEUE_CAPACITY,
    critical: float = CRITICAL_LOAD,
    min_ack_percent: float = MIN_ACK_PERCENT,
) -> DataFrame:
    """Frame-level A34: HeadBlockingDetector detection + the
    BlockingQueueStubManager cancel-rule matrix
    (uforwarder/.../worker/processor/HeadBlockingDetector.java:42-66,
    BlockingQueueStubManager.java:62-84,270-285):

    Detection — a queue with a cancelable head (lowest unacked offset)
    is BLOCKING iff loadFactor = size/capacity > critical AND
    acked/size > minAckPercent (poison head: nearly everything behind
    it completed but the queue is about to fill).

    Cancel rules (first match wins, per the job's source tier):
      * job consumes the DLQ topic        -> no rule (JOB_NOT_SUPPORTED:
        DLQ messages are not retriable, ctor line 106)
      * job not on resq + resq configured -> cancel to RESQ, cost 2
      * job not on retry/resq + retry configured -> cancel to RETRY,
        cost 50
      * otherwise                         -> JOB_NOT_SUPPORTED
    The WindowedTokenLimiter credits 1 per completed ack and the chosen
    rule must afford its token cost, else RATE_LIMITED.

    SCALE: heads agg + a same-key conditional agg with a broadcast-back
    join — the sort-free A5/A14 shape, one wide shuffle total; the rule
    matrix is pure projection."""
    heads = m.groupBy("topic", "part_id").agg(
        F.min(F.when(~F.col("acked"), F.col("msg_offset"))).alias("head_offset")
    )
    in_q = F.col("msg_offset") >= F.col("head_offset")
    q = (
        m.join(F.broadcast(heads), ["topic", "part_id"])
        .groupBy("topic", "part_id", "head_offset")
        .agg(
            F.count(F.when(in_q, 1)).alias("q_size"),
            F.count(F.when(in_q & F.col("acked"), 1)).alias("q_acked"),
        )
    )
    load_factor = F.col("q_size").cast("double") / capacity
    ack_pct = F.when(
        F.col("q_size") > 0, F.col("q_acked").cast("double") / F.col("q_size").cast("double")
    )
    job_src = F.expr(_JOB_SRC_SQL)
    state = q.select(
        "topic",
        "part_id",
        "head_offset",
        "q_size",
        "q_acked",
        load_factor.alias("load_factor"),
        ack_pct.alias("ack_pct"),
        job_src.alias("job_src"),
        F.expr(_HAS_RESQ_SQL).alias("has_resq"),
        F.expr(_HAS_RETRY_SQL).alias("has_retry"),
    )
    blocking = (
        F.col("head_offset").isNotNull()
        & (load_factor > critical)
        & (F.coalesce(ack_pct, F.lit(0.0)) > min_ack_percent)
    )
    rule_resp = (
        F.when(F.col("job_src") == "dlq", F.lit(None).cast("string"))
        .when((F.col("job_src") != "resq") & F.col("has_resq"), "RESQ")
        .when(
            ~F.col("job_src").isin("retry", "resq") & F.col("has_retry"), "RETRY"
        )
    )
    rule_cost = (
        F.when(F.col("job_src") == "dlq", F.lit(None).cast("long"))
        .when((F.col("job_src") != "resq") & F.col("has_resq"), COST_TOKEN_RESQ)
        .when(
            ~F.col("job_src").isin("retry", "resq") & F.col("has_retry"),
            COST_TOKEN_RETRY,
        )
    )
    ruled = state.withColumn("blocking", blocking).withColumn(
        "rule_resp", rule_resp
    ).withColumn("rule_cost", rule_cost)
    return ruled.select(
        "topic",
        "part_id",
        "head_offset",
        "q_size",
        "q_acked",
        "load_factor",
        "ack_pct",
        F.when(F.col("head_offset").isNull(), "NO_CANCELABLE")
        .when(~F.col("blocking"), "NOT_BLOCKING")
        .when(F.col("rule_resp").isNull(), "JOB_NOT_SUPPORTED")
        .when(F.col("q_acked") < F.col("rule_cost"), "RATE_LIMITED")
        .otherwise("CANCEL")
        .alias("verdict"),
        F.when(
            F.col("head_offset").isNotNull()
            & F.col("blocking")
            & F.col("rule_resp").isNotNull()
            & (F.col("q_acked") >= F.col("rule_cost")),
            F.col("rule_resp"),
        )
        .otherwise("INVALID")
        .alias("response_code"),
        F.when(
            F.col("head_offset").isNotNull() & F.col("blocking"), F.col("rule_cost")
        )
        .cast("long")
        .alias("cost_tokens"),
    )


@register("head_blocking_cancel", HEAD_CANCEL_ORACLE)
def head_blocking_cancel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 extension (round-3 verdict item 6): not just DETECTING the
    stuck head (HeadBlockingDetector.java:42-66) but emitting the
    cancel/nack decision the BlockingQueueStubManager.java:62-84 would
    take — see head_blocking_cancel_frame for the decision matrix and
    reference lines.

    SCALE: same sort-free two-agg shape as A6/A14; decision matrix is
    pure projection inside codegen."""
    return head_blocking_cancel_frame(messages(spark, sf_dir))


# --- A36 -----------------------------------------------------------------
LINGER_MS = 10_000_000  # registered-query linger; reference default is 10 s
# (10_000 ms) — this log's median inter-message gap is ~2 h, so the
# 10 000 s setting exercises BOTH branches (fresh sample vs carried)


def linger_sampler_frame(m: DataFrame, linger_ms: int = LINGER_MS) -> DataFrame:
    """LingerSampler (uforwarder/.../consumerproxy/common/LingerSampler
    .java:14-52): a value is re-sampled at most once per linger interval
    — ``get()`` returns the cached sample unless ``now - lastTick >
    lingerMs`` (strict, :80), in which case the delegate is invoked and
    the tick anchors at the read instant (rolling gate, NOT aligned
    windows). Here every message is a read of the shard's current
    payload_value; output tags each read with the sample in force, its
    age, and whether this read took a fresh sample.

    The sampled-time chain is a greedy recurrence (each sample time
    depends on the previous), so like A18 it runs as a grouped
    Arrow-batched applyInPandas kernel with integer-millisecond
    timestamps (exact, engine-independent).

    SCALE: one shuffle on (topic, part_id) — the shard unit; O(|shard|)
    primitive loop per Arrow batch, no cross-row lookups."""
    import numpy as np
    import pandas as pd

    def sampler(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "msg_offset"]).reset_index(drop=True)
        t_ms = pdf["ts"].to_numpy("datetime64[ns]").astype(np.int64) // 1_000_000
        vals = pdf["payload_value"].to_numpy(np.float64)
        fresh = np.empty(len(t_ms), dtype=bool)
        age = np.empty(len(t_ms), dtype=np.int64)
        sampled = np.empty(len(t_ms), dtype=np.float64)
        last_tick = None
        last_val = 0.0
        for i, now in enumerate(t_ms):
            if last_tick is None or now - last_tick > linger_ms:
                last_tick, last_val = now, vals[i]
                fresh[i] = True
            else:
                fresh[i] = False
            age[i] = now - last_tick
            sampled[i] = last_val
        pdf["fresh"] = fresh
        pdf["sample_age_ms"] = age
        pdf["sampled_value"] = sampled
        return pdf[
            ["topic", "part_id", "msg_offset", "fresh", "sample_age_ms", "sampled_value"]
        ]

    return (
        m.select("topic", "part_id", "msg_offset", "ts", "payload_value")
        .groupBy("topic", "part_id")
        .applyInPandas(
            sampler,
            schema="topic string, part_id long, msg_offset long, "
            "fresh boolean, sample_age_ms long, sampled_value double",
        )
    )


# Oracle: the same greedy chain as a DuckDB recursive CTE walking each
# shard in (ts, msg_offset) order — one recursion step per read, carrying
# (st=last tick ms, sv=last sampled value). (A list_reduce fold cannot
# carry a growing output list in DuckDB 1.0: list_append inside the
# lambda retains only the final element.)
_LNG_STEP = f"(o.t - w.st > {LINGER_MS})"

LINGER_ORACLE = f"""WITH RECURSIVE messages AS ({MESSAGES_SQL_BODY}),
ord AS (
  SELECT topic, part_id, msg_offset, payload_value AS v,
         epoch_ns(ts) // 1000000 AS t,
         row_number() OVER (PARTITION BY topic, part_id
                            ORDER BY ts, msg_offset) AS rn
  FROM messages
),
walk AS (
  SELECT topic, part_id, msg_offset, rn, t, v,
         TRUE AS fresh, t AS st, v AS sv
  FROM ord WHERE rn = 1
  UNION ALL
  SELECT o.topic, o.part_id, o.msg_offset, o.rn, o.t, o.v,
         {_LNG_STEP} AS fresh,
         CASE WHEN {_LNG_STEP} THEN o.t ELSE w.st END AS st,
         CASE WHEN {_LNG_STEP} THEN o.v ELSE w.sv END AS sv
  FROM walk w
  JOIN ord o ON o.topic = w.topic AND o.part_id = w.part_id
            AND o.rn = w.rn + 1
)
SELECT topic, part_id, msg_offset, fresh,
       t - st AS sample_age_ms,
       sv     AS sampled_value
FROM walk
"""


@register("linger_sampler", LINGER_ORACLE)
def linger_sampler(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LingerSampler.java at-most-one-sample-per-interval semantics over
    the message log — see linger_sampler_frame for the recurrence and
    reference lines.

    SCALE: see linger_sampler_frame — one (topic, part_id) shuffle,
    O(|shard|) Arrow-batched loop."""
    return linger_sampler_frame(messages(spark, sf_dir))
