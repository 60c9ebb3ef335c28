"""Exact interpolated percentiles WITHOUT the buffer-every-value
``percentile`` aggregate.

Spark's exact ``percentile()`` (and DuckDB's ``quantile_cont``) hold
every value of a group in a single aggregation buffer — O(group rows)
memory in one task, the OOM shape ``docs/SCALE.md`` documents. When the
value column has bounded cardinality (integer latencies, token counts,
fixed-scale decimals), the same number — the linear-interpolated order
statistic at pos = 1 + q·(n−1), exactly what both engines' native
functions compute — is recoverable from a (keys, value)-counts frame:
one partial aggregation plus a window over value-cardinality rows.

Both dialects share the formula, so results are bit-identical to each
other (and to the native functions they replaced — verified by the
unchanged oracle hashes of A12/A15/A30/D23 when they switched over).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def counts_quantiles(
    df: DataFrame, keys: Sequence[str], val: str, qs: Sequence[float]
) -> DataFrame:
    """(keys..., q, exact, n): interpolated exact quantiles of ``val``
    per key group, from counts, plus ``n`` — the non-NULL sample count
    the quantile was computed over. NULL values are excluded (matching
    the native aggregates); groups with no non-NULL value emit no row —
    left-join and coalesce at the call site if they must appear."""
    keys = list(keys)
    vc = (
        df.filter(F.col(val).isNotNull())
        .groupBy(*keys, F.col(val).alias("_v"))
        .agg(F.count("*").alias("_c"))
    )
    vcum = vc.withColumn(
        "_cum", F.sum("_c").over(Window.partitionBy(*keys).orderBy("_v"))
    ).withColumn("_n", F.sum("_c").over(Window.partitionBy(*keys)))
    spark = df.sparkSession
    qdf = spark.range(1).select(
        F.explode(F.array(*[F.lit(float(q)) for q in qs])).alias("q")
    )
    probe = vcum.crossJoin(F.broadcast(qdf)).withColumn(
        "_pos", 1 + F.col("q") * (F.col("_n") - 1)
    )
    ostat = probe.groupBy(*keys, "q").agg(
        F.min("_pos").alias("_pos"),
        F.min(F.when(F.col("_cum") >= F.floor("_pos"), F.col("_v"))).alias("_x1"),
        F.min(F.when(F.col("_cum") >= F.ceil("_pos"), F.col("_v"))).alias("_x2"),
        F.min("_n").cast("bigint").alias("n"),
    )
    exact = F.col("_x1") + (F.col("_pos") - F.floor("_pos")) * (F.col("_x2") - F.col("_x1"))
    return ostat.select(*keys, "q", exact.alias("exact"), "n")


def counts_quantiles_sql(
    src: str, keys: Sequence[str], val: str, qs: Sequence[float]
) -> str:
    """DuckDB twin of :func:`counts_quantiles` as a nested subquery
    (no CTE names, so it embeds inside any oracle). ``src`` is a table
    or CTE name; ``val`` an expression."""
    k = ", ".join(keys)
    q_list = ", ".join(f"{float(q)!r}::DOUBLE" for q in qs)
    return f"""(
  SELECT {k}, q,
         _x1 + (_pos - floor(_pos)) * (_x2 - _x1) AS exact,
         n
  FROM (
    SELECT {k}, q, min(_pos) AS _pos,
           min(CASE WHEN _cum >= floor(_pos) THEN _v END) AS _x1,
           min(CASE WHEN _cum >= ceil(_pos) THEN _v END) AS _x2,
           CAST(min(_n) AS BIGINT) AS n
    FROM (
      SELECT {k}, _v, _cum, _n, q, 1 + q * (_n - 1) AS _pos
      FROM (
        SELECT {k}, _v,
               sum(_c) OVER (PARTITION BY {k} ORDER BY _v) AS _cum,
               sum(_c) OVER (PARTITION BY {k}) AS _n
        FROM (
          SELECT {k}, {val} AS _v, count(*) AS _c
          FROM {src} WHERE {val} IS NOT NULL GROUP BY {k}, {val}
        )
      ) CROSS JOIN unnest([{q_list}]) AS _t(q)
    ) GROUP BY {k}, q
  )
)"""
