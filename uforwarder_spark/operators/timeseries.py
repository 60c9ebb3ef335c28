"""D53: time-series similarity search over the events log — the
z-normalized Euclidean-distance top-k of the UCR-suite baseline (and of
the EDBT'19 streaming-similarity / ICDE'21 top-k trajectory retrieval
line of work), re-expressed as DataFrame ops.

Each user's event-value sequence (ordered by event_id — unique and
monotone, so the series is generation-proof against the driver's three
parquet ts encodings) is truncated to a fixed window, z-normalized, and
compared to the query user's normalized shape. All reductions are
sequential array folds (Spark ``aggregate`` with 0.0 init == DuckDB
``list_reduce``), so distances — and the top-k cut — are bit-identical
across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..model import load_table
from ..registry import register

TS_LEN = 16  # fixed comparison window (first TS_LEN points per user)
TS_TOPK = 10

_FOLD_SUM_SPARK = "aggregate({v}, 0.0D, (a, x) -> a + x)"
_FOLD_SUM_DUCK = "list_reduce({v}, (a, x) -> a + x)"


TS_TOPK_ORACLE = f"""
WITH s AS (
  SELECT user_id, list(value ORDER BY event_id) AS vs
  FROM events GROUP BY user_id
),
v AS (
  SELECT user_id, vs[1:{TS_LEN}] AS v FROM s WHERE len(vs) >= {TS_LEN}
),
m AS (
  SELECT user_id, v,
         {_FOLD_SUM_DUCK.format(v='v')} / {TS_LEN}.0 AS mu,
         {_FOLD_SUM_DUCK.format(v='list_transform(v, x -> x * x)')} / {TS_LEN}.0 AS msq
  FROM v
),
z AS (
  SELECT user_id,
         list_transform(v, x -> (x - mu) / sqrt(msq - mu * mu)) AS z
  FROM m WHERE msq - mu * mu > 0
),
q AS (SELECT z AS qz FROM z WHERE user_id = (SELECT min(user_id) FROM z)),
d AS (
  SELECT z.user_id,
         sqrt({_FOLD_SUM_DUCK.format(
             v='list_transform(range(' + str(TS_LEN) + '), i -> '
               '(z.z[i+1] - q.qz[i+1]) * (z.z[i+1] - q.qz[i+1]))')}) AS dist
  FROM z CROSS JOIN q
  WHERE z.user_id <> (SELECT min(user_id) FROM z)
)
SELECT user_id, round(dist, 6) AS znorm_ed
FROM d ORDER BY dist, user_id LIMIT {TS_TOPK}
"""


@register("timeseries_znorm_topk", TS_TOPK_ORACLE)
def timeseries_znorm_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-series similarity search: which users' event-value series
    have the same SHAPE as the query user's (the qualifying user with
    the smallest id)? Series are the first TS_LEN points by event_id,
    z-normalized (shape match, not level match — the UCR baseline), and
    ranked by Euclidean distance; constant series (zero variance) are
    excluded because their shape is undefined.

    SCALE: one (user) partial agg builds every series — the per-user
    sort is an ARRAY sort inside the agg row, never a corpus-wide
    window; the query row broadcasts; the top-k is per-partition
    TakeOrdered + a {TS_TOPK}-row merge, no global sort. At 100 TB the
    series table is the persisted feature store and only the distance
    scan reruns per query.

    Reference analogue: none (events-domain analytics family; the
    EDBT'19/ICDE'21 distributed similarity-search pattern)."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_id", "value")
    s = ev.groupBy("user_id").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(event_id, value))), p -> p.value)"
        ).alias("vs")
    )
    v = s.filter(F.size("vs") >= TS_LEN).select(
        "user_id", F.expr(f"slice(vs, 1, {TS_LEN})").alias("v")
    )
    m = v.select(
        "user_id",
        "v",
        (F.expr(_FOLD_SUM_SPARK.format(v="v")) / TS_LEN).alias("mu"),
        (F.expr(_FOLD_SUM_SPARK.format(v="transform(v, x -> x * x)")) / TS_LEN).alias("msq"),
    )
    z = m.filter(F.col("msq") - F.col("mu") * F.col("mu") > 0).select(
        "user_id",
        F.expr("transform(v, x -> (x - mu) / sqrt(msq - mu * mu))").alias("z"),
    )
    qmin = z.agg(F.min("user_id").alias("qid"))
    q = z.join(F.broadcast(qmin), F.col("user_id") == F.col("qid")).select(
        F.col("z").alias("qz"), "qid"
    )
    # Spark [] indexing is 0-based (DuckDB's is 1-based — the oracle
    # uses i+1 for the same element)
    diff = (
        f"transform(sequence(0, {TS_LEN - 1}), "
        "i -> (z[i] - qz[i]) * (z[i] - qz[i]))"
    )
    return (
        z.crossJoin(F.broadcast(q))
        .filter(F.col("user_id") != F.col("qid"))
        .withColumn("dist", F.sqrt(F.expr(_FOLD_SUM_SPARK.format(v=diff))))
        .orderBy("dist", "user_id")
        .limit(TS_TOPK)
        .select("user_id", F.round("dist", 6).alias("znorm_ed"))
    )
