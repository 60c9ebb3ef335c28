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


def read_json_permissive(
    spark: SparkSession, path: str, schema: StructType | str
) -> DataFrame:
    """Ingest-boundary JSON read with corrupt-record capture: malformed
    lines land in ``_corrupt_record`` instead of failing the job or being
    silently dropped — at 100 TB some records WILL be malformed, and an
    ingest job must account for them (quarantine + count), not die at
    hour three.

    SCALE: single-pass parse against the supplied schema; the corrupt
    column is NULL for good rows so it compresses away after the
    quarantine split."""
    s = schema if isinstance(schema, StructType) else StructType.fromDDL(schema)
    from pyspark.sql.types import StringType as _Str

    with_corrupt = s.add("_corrupt_record", _Str())
    return (
        spark.read.schema(with_corrupt)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )


def split_quarantine(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(good, quarantined): rows that parsed cleanly vs rows carrying a
    ``_corrupt_record``. Spark requires caching the parsed frame before
    referencing only the corrupt column (SPARK-21610) — done here so
    callers can't hit the analyzer error."""
    df = df.cache()
    good = df.filter(df["_corrupt_record"].isNull()).drop("_corrupt_record")
    bad = df.filter(df["_corrupt_record"].isNotNull()).select("_corrupt_record")
    return good, bad


def decode_json_payload(records: DataFrame, payload_schema: StructType | str) -> DataFrame:
    """Bridge from the Kafka wire (readers.parse_kafka_records output:
    opaque binary ``payload``) to typed columns: decode the payload as
    UTF-8 JSON against an explicit schema. The reference does the same
    normalization at the dispatch boundary (DispatcherMessage wraps raw
    bytes; the consumer contract defines the payload schema).

    SCALE: from_json is a codegen'd per-row map, no shuffle; keep it
    AFTER any offset/topic filtering so pruned rows never pay the
    parse."""
    from pyspark.sql import functions as F

    return records.withColumn(
        "payload_decoded",
        F.from_json(F.col("payload").cast("string"), payload_schema),
    )
