"""B. Controller-plane operators — uForwarder's controller semantics
(job assignment, autoscaling, batch-job creation, partition watching)
re-expressed as Spark DataFrame plans.

All control-plane relations (jobs, workers, quotas) are O(topics ×
partitions) — minuscule next to the message log — so every join here is a
broadcast and the message log is scanned at most once per operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..model import MESSAGES_SQL_BODY, messages
from ..registry import register

MSG_CTE = f"WITH messages AS ({MESSAGES_SQL_BODY})"

WORKERS = ["worker-0", "worker-1", "worker-2", "worker-3"]
WORKERS_SQL = "(VALUES " + ", ".join(f"('{w}')" for w in WORKERS) + ") AS w(worker)"

# Per-topic throughput quota (msgs/sec) for the autoscaler comparison.
QUOTAS = [("click", 0.10), ("view", 0.10), ("purchase", 0.08), ("signup", 0.12), ("error", 0.05)]
QUOTAS_SQL = (
    "(VALUES " + ", ".join(f"('{t}', {q})" for t, q in QUOTAS) + ") AS q(topic, quota_mps)"
)


def _workers_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame([(w,) for w in WORKERS], ["worker"])


def _jobs_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Job table = distinct (topic, part_id) — one uForwarder job each."""
    return messages(spark, sf_dir).select("topic", "part_id").distinct()


JOBS_SQL = "SELECT DISTINCT topic, part_id FROM messages"


# --- B1 ------------------------------------------------------------------
ASSIGN_ORACLE = f"""{MSG_CTE},
jobs AS ({JOBS_SQL}),
scored AS (
  SELECT j.topic, j.part_id, w.worker,
         md5(j.topic || '-' || CAST(j.part_id AS VARCHAR) || '-' || w.worker) AS score,
         row_number() OVER (
           PARTITION BY j.topic, j.part_id
           ORDER BY md5(j.topic || '-' || CAST(j.part_id AS VARCHAR) || '-' || w.worker) DESC,
                    w.worker) AS rn
  FROM jobs j CROSS JOIN {WORKERS_SQL}
)
SELECT topic, part_id, worker AS assigned_worker
FROM scored WHERE rn = 1
"""


def rendezvous_assign(jobs: DataFrame, workers: DataFrame) -> DataFrame:
    """Frame-level B1: rendezvous (highest-random-weight) assignment of
    jobs(topic, part_id) onto workers(worker). Unit-testable for the
    rebalancer invariants the reference asserts (every job assigned
    exactly once; removing a worker only moves that worker's jobs)."""
    scored = jobs.crossJoin(F.broadcast(workers)).withColumn(
        "score",
        F.md5(F.concat_ws("-", F.col("topic"), F.col("part_id").cast("string"), F.col("worker"))),
    )
    w = Window.partitionBy("topic", "part_id").orderBy(F.col("score").desc(), F.col("worker"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("topic", "part_id", F.col("worker").alias("assigned_worker"))
    )


@register("partition_assignment", ASSIGN_ORACLE)
def partition_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AbstractRpcUriRebalancer / RebalancerCommon
    (consumerproxy/controller/rebalancer/AbstractRpcUriRebalancer.java):
    deterministically assign each (topic, partition) job to a worker.
    Rendezvous (highest-random-weight) hashing via md5 gives the same
    stable, minimal-movement assignment the reference's sticky rebalancer
    aims for — adding a worker only moves the jobs that now score higher
    on it.

    SCALE: jobs × workers is O(topics·partitions·workers) control-plane
    metadata — thousands of rows, never message-scale. Cross join + window
    run in one tiny stage."""
    return rendezvous_assign(_jobs_df(spark, sf_dir), _workers_df(spark))


# --- B2 ------------------------------------------------------------------
BALANCE_ORACLE = f"""{MSG_CTE},
jobs AS ({JOBS_SQL}),
scored AS (
  SELECT j.topic, j.part_id, w.worker,
         row_number() OVER (
           PARTITION BY j.topic, j.part_id
           ORDER BY md5(j.topic || '-' || CAST(j.part_id AS VARCHAR) || '-' || w.worker) DESC,
                    w.worker) AS rn
  FROM jobs j CROSS JOIN {WORKERS_SQL}
),
assignment AS (
  SELECT topic, part_id, worker FROM scored WHERE rn = 1
),
loads AS (
  SELECT topic, part_id, count(*) AS n_msgs, CAST(sum(size_bytes) AS BIGINT) AS n_bytes
  FROM messages GROUP BY topic, part_id
)
SELECT a.worker,
       count(*)        AS n_jobs,
       CAST(sum(l.n_msgs) AS BIGINT)  AS total_msgs,
       CAST(sum(l.n_bytes) AS BIGINT) AS total_bytes
FROM assignment a JOIN loads l USING (topic, part_id)
GROUP BY a.worker
"""


@register("load_balance_stats", BALANCE_ORACLE)
def load_balance_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RebalancingWorkerWithSortedJobs / RpcJobColocatingRebalancer table
    view: per-worker job count and carried load after assignment — the
    balance invariant the reference's rebalancer tests assert.

    SCALE: message-log agg happens FIRST (shrinks to one row per job),
    then joins the broadcast assignment."""
    assignment = partition_assignment(spark, sf_dir)
    loads = (
        messages(spark, sf_dir)
        .groupBy("topic", "part_id")
        .agg(F.count("*").alias("n_msgs"), F.sum("size_bytes").alias("n_bytes"))
    )
    return (
        loads.join(F.broadcast(assignment), ["topic", "part_id"])
        .groupBy(F.col("assigned_worker").alias("worker"))
        .agg(
            F.count("*").alias("n_jobs"),
            F.sum("n_msgs").alias("total_msgs"),
            F.sum("n_bytes").alias("total_bytes"),
        )
    )


# --- B3 ------------------------------------------------------------------
AUTOSCALE_ORACLE = f"""{MSG_CTE},
windows AS (
  SELECT topic,
         (CAST(floor(epoch(ts)) AS BIGINT) // 300) * 300 AS window_epoch,
         count(*) / 300.0 AS mps
  FROM messages GROUP BY 1, 2
),
signal AS (
  SELECT topic, max(mps) AS peak_mps, avg(mps) AS avg_mps, count(*) AS n_windows
  FROM windows GROUP BY topic
)
SELECT s.topic, round(s.peak_mps, 6) AS peak_mps, round(s.avg_mps, 6) AS avg_mps,
       q.quota_mps,
       CASE WHEN s.peak_mps > q.quota_mps * 1.2 THEN 'scale_up'
            WHEN s.peak_mps < q.quota_mps * 0.5 THEN 'scale_down'
            ELSE 'hold' END AS decision
FROM signal s JOIN {QUOTAS_SQL} USING (topic)
"""


@register("autoscale_decision", AUTOSCALE_ORACLE)
def autoscale_decision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AutoScalar / ScaleComputer / ScaleWindow
    (controller/autoscalar/AutoScalar.java): compare windowed throughput
    against the job group's quota; propose scale up/down/hold. Mirrors
    ScaleWindow's percentile-of-window approach with peak-of-window.

    SCALE: two-level agg — messages → (topic, window) → topic; all
    partial-aggregated, quota table broadcast."""
    m = messages(spark, sf_dir)
    window_epoch = F.expr("CAST(unix_timestamp(ts) DIV 300 AS BIGINT) * 300")
    windows = (
        m.withColumn("window_epoch", window_epoch)
        .groupBy("topic", "window_epoch")
        .agg((F.count("*") / 300.0).alias("mps"))
    )
    signal = windows.groupBy("topic").agg(
        F.max("mps").alias("peak_mps"), F.avg("mps").alias("avg_mps")
    )
    quotas = spark.createDataFrame(QUOTAS, ["topic", "quota_mps"])
    decision = (
        F.when(F.col("peak_mps") > F.col("quota_mps") * 1.2, "scale_up")
        .when(F.col("peak_mps") < F.col("quota_mps") * 0.5, "scale_down")
        .otherwise("hold")
    )
    return (
        signal.join(F.broadcast(quotas), "topic")
        .select(
            "topic",
            F.round("peak_mps", 6).alias("peak_mps"),
            F.round("avg_mps", 6).alias("avg_mps"),
            "quota_mps",
            decision.alias("decision"),
        )
    )


# --- B4 ------------------------------------------------------------------
BATCH_JOB_ORACLE = f"""{MSG_CTE}
SELECT topic, part_id,
       min(msg_offset) AS start_offset,
       max(msg_offset) AS end_offset,
       count(*)        AS n_msgs
FROM messages
WHERE ts >= TIMESTAMP '2024-01-08' AND ts < TIMESTAMP '2024-01-15'
GROUP BY topic, part_id
"""


@register("batch_job_offsets", BATCH_JOB_ORACLE)
def batch_job_offsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BatchJobCreator / JobCreatorWithOffsets
    (controller/creator/BatchJobCreator.java): resolve a [startTs, endTs)
    DLQ-merge batch job into concrete per-partition offset ranges
    (offsetsForTimes → start, endOffsets → end).

    SCALE: timestamp predicate pushes to the scan (and at 100 TB prunes
    date-partitioned directories outright); one partial agg."""
    m = messages(spark, sf_dir).filter(
        (F.col("ts") >= F.lit("2024-01-08").cast("timestamp"))
        & (F.col("ts") < F.lit("2024-01-15").cast("timestamp"))
    )
    return m.groupBy("topic", "part_id").agg(
        F.min("msg_offset").alias("start_offset"),
        F.max("msg_offset").alias("end_offset"),
        F.count("*").alias("n_msgs"),
    )


# --- B5 ------------------------------------------------------------------
EXPANSION_ORACLE = f"""{MSG_CTE},
epochs AS (
  SELECT topic,
         count(DISTINCT CASE WHEN ts <  TIMESTAMP '2024-01-03' THEN part_id END) AS parts_epoch1,
         count(DISTINCT CASE WHEN ts >= TIMESTAMP '2024-01-03' THEN part_id END) AS parts_epoch2
  FROM messages GROUP BY topic
)
SELECT topic, parts_epoch1, parts_epoch2,
       parts_epoch2 - parts_epoch1 AS delta,
       parts_epoch2 > parts_epoch1 AS expanded
FROM epochs
"""


@register("partition_expansion", EXPANSION_ORACLE)
def partition_expansion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KafkaPartitionExpansionWatcher (common/KafkaPartitionExpansionWatcher
    .java): compare the observed partition set per topic across epochs and
    flag expansion so jobs get re-created.

    SCALE: conditional distinct-counts in one pass over (topic, part_id)
    pre-agg; output O(topics)."""
    m = messages(spark, sf_dir)
    cutoff = F.lit("2024-01-03").cast("timestamp")
    return m.groupBy("topic").agg(
        F.countDistinct(F.when(F.col("ts") < cutoff, F.col("part_id"))).alias("parts_epoch1"),
        F.countDistinct(F.when(F.col("ts") >= cutoff, F.col("part_id"))).alias("parts_epoch2"),
        (
            F.countDistinct(F.when(F.col("ts") >= cutoff, F.col("part_id")))
            - F.countDistinct(F.when(F.col("ts") < cutoff, F.col("part_id")))
        ).alias("delta"),
        (
            F.countDistinct(F.when(F.col("ts") >= cutoff, F.col("part_id")))
            > F.countDistinct(F.when(F.col("ts") < cutoff, F.col("part_id")))
        ).alias("expanded"),
    )


# --- B6 ------------------------------------------------------------------
HIBERNATE_ORACLE = f"""{MSG_CTE},
jobs AS ({JOBS_SQL}),
recent AS (
  SELECT topic, part_id, count(*) AS recent_msgs
  FROM messages
  WHERE ts >= TIMESTAMP '2024-01-14'
  GROUP BY topic, part_id
)
SELECT j.topic, j.part_id,
       coalesce(r.recent_msgs, 0) AS recent_msgs,
       coalesce(r.recent_msgs, 0) = 0 AS hibernated
FROM jobs j LEFT JOIN recent r USING (topic, part_id)
"""


@register("hibernating_jobs", HIBERNATE_ORACLE)
def hibernating_jobs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HibernatingJobRebalancer
    (consumerproxy/controller/rebalancer/HibernatingJobRebalancer.java):
    job groups with zero recent throughput leave the active worker pool
    (hibernate) until traffic returns.

    SCALE: recent-window count is a pushed-down filter + partial agg; the
    job list is control-plane-sized and the join broadcasts it."""
    jobs = _jobs_df(spark, sf_dir)
    recent = (
        messages(spark, sf_dir)
        .filter(F.col("ts") >= F.lit("2024-01-14").cast("timestamp"))
        .groupBy("topic", "part_id")
        .agg(F.count("*").alias("recent_msgs"))
    )
    return (
        jobs.join(recent, ["topic", "part_id"], "left")
        .select(
            "topic",
            "part_id",
            F.coalesce(F.col("recent_msgs"), F.lit(0)).alias("recent_msgs"),
            (F.coalesce(F.col("recent_msgs"), F.lit(0)) == 0).alias("hibernated"),
        )
    )


# --- B7 ------------------------------------------------------------------
COLOCATE_ORACLE = f"""{MSG_CTE},
topics AS (SELECT DISTINCT topic FROM messages),
scored AS (
  SELECT t.topic, w.worker,
         row_number() OVER (
           PARTITION BY t.topic
           ORDER BY md5(t.topic || '@' || w.worker) DESC, w.worker) AS rn
  FROM topics t CROSS JOIN {WORKERS_SQL}
),
tassign AS (SELECT topic, worker FROM scored WHERE rn = 1),
jobs AS (
  SELECT topic, part_id, count(*) AS n_msgs FROM messages GROUP BY topic, part_id
)
SELECT a.worker,
       count(DISTINCT j.topic)       AS n_topics,
       count(*)                      AS n_jobs,
       CAST(sum(j.n_msgs) AS BIGINT) AS total_msgs
FROM jobs j JOIN tassign a USING (topic)
GROUP BY a.worker
"""


@register("colocating_assignment", COLOCATE_ORACLE)
def colocating_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RpcJobColocatingRebalancer
    (consumerproxy/controller/rebalancer/RpcJobColocatingRebalancer.java):
    place all jobs of one job group (here: topic) on the SAME worker so a
    consumer's partitions share connections and batch state; report the
    per-worker load the colocation produces. Assignment is rendezvous
    hashing at topic granularity — stable under worker churn like B1.

    SCALE: topic→worker table is O(topics) and broadcast; per-job load is
    the only message-scale agg (one shuffle), then a tiny agg by worker."""
    m = messages(spark, sf_dir)
    topics = m.select("topic").distinct()
    workers = _workers_df(spark)
    w = Window.partitionBy("topic").orderBy(F.col("score").desc(), F.col("worker"))
    tassign = (
        topics.crossJoin(F.broadcast(workers))
        .withColumn("score", F.md5(F.concat_ws("@", F.col("topic"), F.col("worker"))))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("topic", "worker")
    )
    jobs = m.groupBy("topic", "part_id").agg(F.count("*").alias("n_msgs"))
    return (
        jobs.join(F.broadcast(tassign), "topic")
        .groupBy("worker")
        .agg(
            F.countDistinct("topic").alias("n_topics"),
            F.count("*").alias("n_jobs"),
            F.sum("n_msgs").alias("total_msgs"),
        )
    )
