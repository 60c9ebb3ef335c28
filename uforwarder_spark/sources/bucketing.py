"""Bucketed-table layout: shuffle-free big-big joins.

Broadcast covers dim-sized sides; when BOTH join sides are fact-scale
(lineitem ⋈ orders, message log ⋈ message log), the scale tool is
bucketing: both tables are written pre-hash-partitioned (and sorted)
on the join key into the same bucket count, so every future join or
aggregation on that key reads co-located buckets and plans NO Exchange —
the shuffle is paid once at write time, amortized over every read.

This is the batch analogue of uForwarder's partition affinity: a
(topic, partition) job's state always lives with its data. At 100 TB
the message log would be bucketed by (topic, part_id) so A5/A6/A7's
window passes never shuffle at all.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    keys: Sequence[str],
    n_buckets: int = 8,
) -> None:
    """Persist ``df`` as an external bucketed+sorted table on ``keys``.

    SCALE: pays one repartition at write; every subsequent equi-join /
    groupBy on ``keys`` against a same-bucketed table is exchange-free
    and (being sorted) merge-joins without a sort step."""
    (
        df.write.mode("overwrite")
        .option("path", path)
        .bucketBy(n_buckets, *keys)
        .sortBy(*keys)
        .saveAsTable(table)
    )


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table WITH its bucket metadata (spark.table — a
    plain parquet read of the same files would lose the bucketing and
    reintroduce the shuffle)."""
    return spark.table(table)
