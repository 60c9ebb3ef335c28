"""Sources: Kafka record parsing, offset-range pruned scans, and the
(topic, date)-partitioned log layout (pruning verified in the plan).
"""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL
from uforwarder_spark import model
from uforwarder_spark.sources import readers as R


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_kafka_stream_options_shape():
    opts = R.kafka_stream_options(
        "b1:9092,b2:9092",
        ["click", "view"],
        starting_offsets={"click": {"0": 100, "1": 200}},
        max_offsets_per_trigger=5000,
    )
    assert opts["kafka.bootstrap.servers"] == "b1:9092,b2:9092"
    assert opts["subscribe"] == "click,view"
    assert '"click"' in opts["startingOffsets"] and '"0": 100' in opts["startingOffsets"]
    assert opts["maxOffsetsPerTrigger"] == "5000"


def test_parse_kafka_records(spark):
    rows = [
        (b"k1", b"payload-one", "click", 0, 7, datetime(2024, 1, 1), [("h1", b"v1")]),
        (b"k2", b"pp", "view", 3, 9, datetime(2024, 1, 2), []),
    ]
    schema = (
        "key binary, value binary, topic string, partition int, offset long, "
        "timestamp timestamp, headers array<struct<key: string, value: binary>>"
    )
    out = R.parse_kafka_records(spark.createDataFrame(rows, schema)).collect()
    by_off = {r.msg_offset: r for r in out}
    assert by_off[7].topic == "click" and by_off[7].part_id == 0
    assert by_off[7].size_bytes == len(b"payload-one") + 64
    assert by_off[7].headers == {"h1": bytearray(b"v1")}
    assert by_off[9].headers == {}


def test_parse_kafka_records_duplicate_headers_last_wins(spark):
    """Kafka permits repeated header keys; Spark's default
    mapKeyDedupPolicy=EXCEPTION would kill the job on the first one, so
    the parser folds last-wins (Kafka's Headers.lastHeader convention)."""
    rows = [
        (
            b"k", b"v", "click", 0, 1, datetime(2024, 1, 1),
            [("trace", b"old"), ("other", b"x"), ("trace", b"new")],
        ),
    ]
    schema = (
        "key binary, value binary, topic string, partition int, offset long, "
        "timestamp timestamp, headers array<struct<key: string, value: binary>>"
    )
    (r,) = R.parse_kafka_records(spark.createDataFrame(rows, schema)).collect()
    assert r.headers == {"trace": bytearray(b"new"), "other": bytearray(b"x")}


def test_offset_range_scan_matches_and_pushes_down(spark):
    df = R.offset_range_scan(spark, SF_SMALL, "click", 100, 400)
    rows = df.collect()
    m = model.messages(spark, SF_SMALL).collect()
    expected = [r for r in m if r.topic == "click" and 100 <= r.msg_offset < 400]
    assert len(rows) == len(expected)
    plan = _plan(df)
    # both predicates reach the parquet scan on the underlying columns
    assert "PushedFilters" in plan
    assert "event_id" in plan.split("PushedFilters")[1][:200]


def test_partitioned_log_roundtrip_and_pruning(spark, tmp_path):
    m = model.messages(spark, SF_SMALL)
    R.write_partitioned_log(m, str(tmp_path / "log"))
    back = R.read_partitioned_log(spark, str(tmp_path / "log"))
    assert back.count() == m.count()

    one_topic = back.filter(F.col("topic") == "click")
    assert one_topic.count() == m.filter(F.col("topic") == "click").count()
    plan = _plan(one_topic)
    # topic predicate prunes directories, not rows
    assert "PartitionFilters" in plan and "topic" in plan.split("PartitionFilters")[1][:200]


def test_kafka_sink_serialization(spark):
    import json

    m = model.messages(spark, SF_SMALL).limit(50)
    rec = R.serialize_for_kafka(m)
    assert [f.name for f in rec.schema.fields] == ["key", "value"]
    assert all(f.dataType.simpleString() == "binary" for f in rec.schema.fields)
    rows = rec.collect()
    assert len(rows) == 50
    one = json.loads(bytes(rows[0].value))
    key = bytes(rows[0].key).decode()
    assert key == f"{one['topic']}/{one['part_id']}/{one['msg_offset']}"
    assert {"topic", "part_id", "msg_offset", "outcome"} <= one.keys()


def test_bucketed_join_is_exchange_free(spark, tmp_path):
    from uforwarder_spark.model import load_table
    from uforwarder_spark.sources.bucketing import read_bucketed, write_bucketed

    orders = load_table(spark, SF_SMALL, "orders")
    lineitem = load_table(spark, SF_SMALL, "lineitem")
    write_bucketed(orders, "orders_b", str(tmp_path / "ob"), ["o_orderkey"])
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "lineitem_b",
        str(tmp_path / "lb"),
        ["o_orderkey"],
    )
    # force a non-broadcast plan so the join strategy is visible
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = read_bucketed(spark, "orders_b").join(
            read_bucketed(spark, "lineitem_b"), "o_orderkey"
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # bucketed sides co-locate: merge join with NO shuffle exchange
        assert "Exchange" not in plan, plan[:1500]

        plain = orders.join(
            lineitem.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey"
        )
        plain_plan = plain._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plain_plan  # the shuffle bucketing removed
        assert joined.count() == plain.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")


@pytest.mark.parametrize("fmt", ["parquet", "orc", "json", "csv"])
def test_format_roundtrip_preserves_messages(spark, tmp_path, fmt):
    from uforwarder_spark.sources.formats import read_as, write_as
    from uforwarder_spark.streaming.pipelines import MESSAGE_SCHEMA

    m = model.messages(spark, SF_SMALL)
    path = str(tmp_path / fmt)
    write_as(m, fmt, path)
    back = read_as(spark, fmt, path, MESSAGE_SCHEMA)
    assert back.schema == MESSAGE_SCHEMA
    assert back.count() == m.count()
    # value-level: per-topic checksums survive the round trip
    agg = lambda df: {
        (r.topic): (r.n, r.s)
        for r in df.groupBy("topic")
        .agg(F.count("*").alias("n"), F.sum("msg_offset").alias("s"))
        .collect()
    }
    assert agg(back) == agg(m)


def test_bucketed_log_makes_watermark_exchange_free(spark, tmp_path):
    """The A5 scale claim, proven: with the message log bucketed on
    (topic, part_id), the commit-watermark operator plans no shuffle
    Exchange at all — both hash aggregations read co-located buckets and
    the heads side is broadcast."""
    from uforwarder_spark.operators.pipeline import ack_watermark_frame
    from uforwarder_spark.sources.bucketing import read_bucketed, write_bucketed

    m = model.messages(spark, SF_SMALL)
    write_bucketed(m, "msgs_b", str(tmp_path / "mb"), ["topic", "part_id"])
    try:
        bucketed = read_bucketed(spark, "msgs_b")
        df = ack_watermark_frame(bucketed)
        df.write.format("noop").mode("overwrite").save()  # finalize AQE
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastExchange" in plan  # the heads side
        shuffles = plan.count("Exchange") - plan.count("BroadcastExchange")
        assert shuffles == 0, plan[:2000]
        # and results match the unbucketed computation
        a = sorted(map(tuple, df.collect()))
        b = sorted(map(tuple, ack_watermark_frame(m).collect()))
        assert a == b
    finally:
        spark.sql("DROP TABLE IF EXISTS msgs_b")


def test_read_json_permissive_quarantines_bad_lines(spark, tmp_path):
    from uforwarder_spark.sources import formats as FM

    p = tmp_path / "in.json"
    p.write_text(
        '{"msg_offset": 1, "topic": "click", "value": 2.5}\n'
        "this is not json\n"
        '{"msg_offset": "NaN-ish", "topic": "view", "value": "x"}\n'
        '{"msg_offset": 3, "topic": "view", "value": 0.5}\n'
    )
    df = FM.read_json_permissive(
        spark, str(p), "msg_offset long, topic string, value double"
    )
    good, bad = FM.split_quarantine(df)
    assert {r.msg_offset for r in good.collect()} == {1, 3}
    assert bad.count() == 2  # the non-JSON line and the type-mismatched one
    assert good.columns == ["msg_offset", "topic", "value"]


def test_decode_json_payload(spark):
    from datetime import datetime

    from uforwarder_spark.sources import formats as FM

    rows = [
        (b"k", b'{"user": 7, "amount": 1.5}', "click", 0, 1, datetime(2024, 1, 1), []),
        (b"k", b"garbage", "click", 0, 2, datetime(2024, 1, 1), []),
    ]
    schema = (
        "key binary, value binary, topic string, partition int, offset long, "
        "timestamp timestamp, headers array<struct<key: string, value: binary>>"
    )
    parsed = R.parse_kafka_records(spark.createDataFrame(rows, schema))
    out = FM.decode_json_payload(parsed, "user long, amount double")
    by_off = {r.msg_offset: r for r in out.collect()}
    assert by_off[1].payload_decoded.user == 7
    assert by_off[1].payload_decoded.amount == 1.5
    assert by_off[2].payload_decoded is None or by_off[2].payload_decoded.user is None


def test_cell_partitioned_embeddings_prune_ivf_probe(spark, tmp_path):
    """The IVF SCALE claim D13/D62/D69 make — 'at 100 TB the corpus is
    partitioned by cell, so probing prunes whole partitions at the
    scan' — demonstrated for real: embeddings written
    ``partitionBy(label)``, a probed-cells predicate compiles to
    PartitionFilters (directories pruned before any row is read), and
    the pruned read returns exactly the probed cells' rows."""
    e = model.load_table(spark, SF_SMALL, "embeddings")
    e.write.partitionBy("label").mode("overwrite").parquet(str(tmp_path / "cells"))
    back = spark.read.parquet(str(tmp_path / "cells"))
    probed = back.filter(F.col("label").isin(0, 1))
    plan = _plan(probed)
    assert "PartitionFilters" in plan
    assert "label" in plan.split("PartitionFilters")[1][:200]
    want = e.filter(F.col("label").isin(0, 1)).count()
    assert probed.count() == want and want > 0
