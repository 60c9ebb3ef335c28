"""SparkSession factory tuned for this engine.

Local testing runs ``local[$SPARK_GRAFT_CPUS]``; the same settings are the
ones we would ship to a 1000-executor cluster (AQE for runtime re-planning
and skew joins, partial aggregation, Arrow for any pandas exchange).
Session timezone is pinned to UTC so timestamp semantics match the DuckDB
oracle exactly.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = "32"


def get_spark(app_name: str = "uforwarder-spark", shuffle_partitions: str | None = None) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Spill-aware sizing: scan splits capped at 128 MiB keep each task's
        # working set well inside an executor core's memory share at any SF;
        # AQE re-coalesces post-shuffle partitions toward 64 MiB so reducers
        # neither spill (too big) nor drown in scheduling overhead (too
        # small). At 100 TB these two knobs — not shuffle.partitions, which
        # AQE overrides — are what bound per-task memory.
        .config("spark.sql.files.maxPartitionBytes", "128m")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64m")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()


def release_operator_caches(spark: SparkSession) -> None:
    """Drop every cached operator intermediate.

    The persist-lifecycle contract for this library: a handful of
    operators (`_emb`, D4's token frame, D64's fingerprint/group
    frames) ``persist()`` subtrees that multiple branches of the SAME
    returned plan re-read, and deliberately do NOT unpersist — the
    returned DataFrame is lazy, so the cache must outlive the call
    until the caller materializes it. The cost is that a long-lived
    session invoking many operators accumulates cache entries until
    LRU eviction. Callers that loop over queries should call THIS
    between materializations (bench.py and scripts/bench_all.py do,
    via the same ``clearCache``); one-shot jobs need nothing."""
    spark.catalog.clearCache()
