"""B15: worker lease expiry and job reassignment — the controller's
liveness loop (worker/controller/Lease.java, controller/manager/
WorkerManager.java).

Registered after the driver's 50-key window (which is full of
never-before-checked keys); verified by the repo's identical parity
harness at sf0.001 + sf0.01.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..model import H_DUCK, H_SPARK, MESSAGES_SQL_BODY
from ..registry import register
from .controller import WORKERS, WORKERS_SQL, _jobs_df, _workers_df, rendezvous_assign

MSG_CTE = f"WITH messages AS ({MESSAGES_SQL_BODY})"
LEASE_S = 3600  # lease duration: heartbeat older than this expires the worker

# Simulated heartbeat age per worker: deterministic hash in [0, 7200) s so
# both expiry branches are exercised at any SF (H_SPARK / H_DUCK twins).
WORKER_LEASE_ORACLE = f"""{MSG_CTE},
jobs AS (SELECT DISTINCT topic, part_id FROM messages),
hb AS (
  SELECT worker,
         ('0x' || substr(md5(worker || '|hb'), 1, 15))::BIGINT % 7200 AS hb_age_s
  FROM {WORKERS_SQL}
),
live AS (SELECT worker FROM hb WHERE hb_age_s <= {LEASE_S}),
assigned AS (
  SELECT topic, part_id, worker AS old_worker FROM (
    SELECT j.topic, j.part_id, w.worker,
           row_number() OVER (
             PARTITION BY j.topic, j.part_id
             ORDER BY md5(j.topic || '-' || CAST(j.part_id AS VARCHAR) || '-' || w.worker) DESC,
                      w.worker) AS rn
    FROM jobs j CROSS JOIN {WORKERS_SQL}
  ) WHERE rn = 1
),
reassigned AS (
  SELECT topic, part_id, worker AS new_worker FROM (
    SELECT j.topic, j.part_id, w.worker,
           row_number() OVER (
             PARTITION BY j.topic, j.part_id
             ORDER BY md5(j.topic || '-' || CAST(j.part_id AS VARCHAR) || '-' || w.worker) DESC,
                      w.worker) AS rn
    FROM jobs j CROSS JOIN live w
  ) WHERE rn = 1
)
SELECT a.topic, a.part_id, a.old_worker,
       h.hb_age_s AS old_worker_hb_age_s,
       h.hb_age_s <= {LEASE_S} AS lease_valid,
       CASE WHEN h.hb_age_s <= {LEASE_S} THEN a.old_worker ELSE r.new_worker END AS new_worker
FROM assigned a
JOIN hb h ON h.worker = a.old_worker
JOIN reassigned r USING (topic, part_id)
"""


@register("worker_lease_reassignment", WORKER_LEASE_ORACLE)
def worker_lease_reassignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lease + WorkerManager (worker/controller/Lease.java: a lease is
    valid while lastSuccess + duration > now; controller/manager/
    WorkerManager.java expires workers whose heartbeat lease lapsed and
    returns their jobs to the rebalancer): jobs keep their worker while
    its lease is valid; jobs of expired workers move by the SAME
    rendezvous hash over the surviving worker set — which is exactly the
    HRW minimal-movement property B1's tests pin (survivors' jobs never
    move). Heartbeat ages are deterministic hash-simulated so both
    branches exist at any SF.

    SCALE: worker heartbeats are O(workers); both assignments are
    control-plane-sized rendezvous plans; the only message-scale work is
    deriving the job list (one distinct). Joins broadcast.

    Cites: uforwarder-core/.../worker/controller/Lease.java:56,
    controller/manager/WorkerManager.java."""
    jobs = _jobs_df(spark, sf_dir)
    workers = _workers_df(spark)
    hb_hash = H_SPARK.format(col="concat(worker, '|hb')")
    hb = workers.withColumn("hb_age_s", F.expr(f"{hb_hash} % 7200"))
    live = hb.filter(F.col("hb_age_s") <= LEASE_S).select("worker")
    assigned = rendezvous_assign(jobs, workers).withColumnRenamed(
        "assigned_worker", "old_worker"
    )
    reassigned = rendezvous_assign(jobs, live).withColumnRenamed(
        "assigned_worker", "new_worker"
    )
    return (
        assigned.join(F.broadcast(hb.withColumnRenamed("worker", "old_worker")), "old_worker")
        .join(reassigned, ["topic", "part_id"])
        .select(
            "topic",
            "part_id",
            "old_worker",
            F.col("hb_age_s").alias("old_worker_hb_age_s"),
            (F.col("hb_age_s") <= LEASE_S).alias("lease_valid"),
            F.when(F.col("hb_age_s") <= LEASE_S, F.col("old_worker"))
            .otherwise(F.col("new_worker"))
            .alias("new_worker"),
        )
    )
