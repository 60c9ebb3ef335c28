"""Sources — the fetcher side of uForwarder re-expressed as Spark readers.

The reference's fetchers (``/root/reference/uforwarder-core/src/main/java/
com/uber/data/kafka/datatransfer/worker/fetchers/kafka/*.java`` and
``consumerproxy/worker/fetcher/{OriginalTopic,RetryTopic,DlqTopic}
KafkaFetcher.java``) poll Kafka with per-partition offset seeks driven by
``KafkaFetcherConfiguration``. Here each concern maps to a reader:

* live cluster      → ``kafka_stream_options`` + ``parse_kafka_records``
  (Structured Streaming Kafka source, same record identity)
* historical replay → ``offset_range_scan`` over the parquet message log
  (BatchJobCreator-style bounded jobs)
* log layout        → ``write_partitioned_log`` — the (topic, date)
  directory layout every topic predicate prunes against at 100 TB

No UDFs anywhere; every parser is built-in expressions so the scan stays
inside whole-stage codegen and filters push down to the source.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..model import messages


# --- Kafka (live) ---------------------------------------------------------
def kafka_stream_options(
    brokers: str,
    topics: list[str],
    starting_offsets: dict[str, dict[str, int]] | str = "earliest",
    max_offsets_per_trigger: int | None = None,
) -> dict[str, str]:
    """Options for ``spark.readStream.format("kafka")`` mirroring
    KafkaFetcherConfiguration (reference ``fetchers/kafka/
    KafkaFetcherConfiguration.java``): bootstrap servers, subscription,
    per-partition starting offsets (the fetcher's seek), and a per-trigger
    offset cap (the fetcher's poll batch size → micro-batch sizing).

    Pure config — testable without a broker; apply with
    ``spark.readStream.format("kafka").options(**opts).load()``."""
    opts = {
        "kafka.bootstrap.servers": brokers,
        "subscribe": ",".join(topics),
        "startingOffsets": (
            starting_offsets
            if isinstance(starting_offsets, str)
            else json.dumps(starting_offsets)
        ),
        "failOnDataLoss": "false",
    }
    if max_offsets_per_trigger is not None:
        opts["maxOffsetsPerTrigger"] = str(max_offsets_per_trigger)
    return opts


def parse_kafka_records(records: DataFrame) -> DataFrame:
    """Kafka record schema → this engine's message identity.

    The Kafka source yields (key binary, value binary, topic, partition,
    offset, timestamp, headers array<struct<key,value>>); uForwarder's
    DispatcherMessage carries exactly (group, topic, partition, offset,
    headers, payload) — see ``worker/dispatcher/DispatcherMessage.java``.
    Works identically on a streaming or a static DataFrame.

    SCALE: pure column projection (no shuffle, codegen'd); payload stays
    an opaque binary column — decode happens at the dispatch edge, never
    in the engine. Kafka allows DUPLICATE header keys and Spark's
    default mapKeyDedupPolicy=EXCEPTION would fail the job on the first
    repeated key, so headers fold left-to-right with last-wins (Kafka's
    own Headers.lastHeader convention) before becoming a map."""
    last_wins_headers = F.expr(
        "aggregate(headers, cast(map() as map<string,binary>), "
        "(acc, h) -> map_concat(map_filter(acc, (k, v) -> k != h.key), map(h.key, h.value)))"
    )
    return records.select(
        F.col("offset").alias("msg_offset"),
        F.col("topic"),
        F.col("partition").cast("long").alias("part_id"),
        F.col("timestamp").alias("ts"),
        (F.octet_length(F.col("value")) + F.lit(64)).cast("long").alias("size_bytes"),
        F.col("value").alias("payload"),
        last_wins_headers.alias("headers"),
    )


# --- Historical replay (bounded jobs over the parquet log) ----------------
def offset_range_scan(
    spark: SparkSession, sf_dir: str, topic: str, lo: int, hi: int
) -> DataFrame:
    """Bounded fetch job: one topic, [lo, hi) offsets — the batch twin of
    OriginalTopicKafkaFetcher's seek/poll and what BatchJobCreator
    resolves a [startTs, endTs) job into (``controller/creator/
    BatchJobCreator.java``).

    SCALE: both predicates reach the parquet scan (topic prunes
    directories under the partitioned layout; offset min/max prunes row
    groups) — verify with ``.explain``: PushedFilters lists both."""
    return messages(spark, sf_dir).filter(
        (F.col("topic") == topic) & (F.col("msg_offset") >= lo) & (F.col("msg_offset") < hi)
    )


# --- Log layout -----------------------------------------------------------
def write_partitioned_log(msgs: DataFrame, path: str) -> None:
    """Persist the message log in the layout the 100 TB deployment uses:
    parquet partitioned by (topic, date). Every per-topic operator then
    prunes whole directories at plan time, and date bounds the scan for
    windowed jobs.

    SCALE: partitionBy keeps one writer task per (topic, date, input
    partition); at scale, repartition by the layout keys first so each
    directory gets few, large files instead of input_partitions × keys
    small ones."""
    msgs.withColumn("date", F.to_date("ts")).write.mode("overwrite").partitionBy(
        "topic", "date"
    ).parquet(path)


def read_partitioned_log(spark: SparkSession, path: str) -> DataFrame:
    """Read back the (topic, date)-partitioned log; topic/date filters on
    the result prune partitions (check ``.explain`` PartitionFilters)."""
    return spark.read.parquet(path)


# --- Kafka sink (retry / DLQ production) ----------------------------------
def kafka_sink_options(brokers: str, topic: str) -> dict[str, str]:
    """Options for ``df.write/writeStream.format("kafka")`` — the produce
    side of the retry/DLQ flow (reference ``worker/processor/
    DlqDispatchManager.java`` produces exhausted messages to the DLQ
    topic; retry tiers produce to retry topics)."""
    return {"kafka.bootstrap.servers": brokers, "topic": topic}


def serialize_for_kafka(msgs: DataFrame) -> DataFrame:
    """Message frame → Kafka producer record schema: key = the message
    identity (ordering key — Kafka partitions by key hash, preserving
    per-(topic, part_id) order like the reference's producer), value =
    the full message as JSON bytes.

    SCALE: pure projection (to_json is codegen'd); no shuffle — the
    producer's partitioner does the routing, exactly as uForwarder's
    KafkaSink relies on the client partitioner."""
    return msgs.select(
        F.concat_ws("/", F.col("topic"), F.col("part_id"), F.col("msg_offset"))
        .cast("binary")
        .alias("key"),
        F.to_json(F.struct(*msgs.columns)).cast("binary").alias("value"),
    )
