"""Interchange formats: the same message/table schema over parquet, ORC,
CSV, and JSON line sources.

The engine's canonical storage is parquet (columnar, predicate/column
pushdown, row-group stats); these adapters exist for ingest boundaries —
uForwarder's equivalent is accepting whatever bytes arrive on the wire
and normalizing to one internal message model (DispatcherMessage).

SCALE: CSV/JSON are ingest-only — schema is always supplied explicitly
(inference would scan twice and guess types), reads go through the same
DataFrame plans, and the first job in any pipeline rewrites them to
parquet/bucketed layout so everything downstream gets pushdown + stats.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

_WRITERS = {
    "parquet": lambda w: w,
    "orc": lambda w: w,
    "csv": lambda w: w.option("header", "true"),
    "json": lambda w: w,
}


def write_as(df: DataFrame, fmt: str, path: str) -> None:
    writer = df.write.mode("overwrite").format(fmt)
    _WRITERS[fmt](writer).save(path)


def read_as(spark: SparkSession, fmt: str, path: str, schema: StructType | str) -> DataFrame:
    """Schema-enforced read — identical column names/types regardless of
    the container format, so every operator runs unchanged on any of
    them. Text formats (csv/json) parse with the supplied schema in one
    pass; timestamps round-trip via the session-UTC formatter."""
    reader = spark.read.format(fmt).schema(schema)
    if fmt == "csv":
        reader = reader.option("header", "true").option(
            "timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
        )
    return reader.load(path)
