"""Hot-key skew evidence (round-3 verdict item 9): uForwarder's load is
topic-skewed by nature — one hot topic can own ~90% of the log. These
tests build that shape explicitly (one topic = 90% of rows, one hot
(topic, part_id) shard) and verify that

1. the salted two-stage aggregation (operators/skew.salted_agg) is
   bit-equal to the plain groupBy on the skewed input,
2. the salt expression actually SPREADS the hot key across buckets
   (≥ 3/4 of the salt space used, no bucket owning more than 2× fair
   share) — the property that kills the straggler reducer,
3. the A5 / A13 shard-keyed operators stay correct on the skewed log
   (their hash-agg plans have no per-key sort to blow up).

Wall-clock comparisons at 10× replication live in docs/SCALE.md
("Hot-topic skew" section); CI asserts the deterministic properties
only.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

# Driver profile (VERDICT r12 item 2): the 10×-replicated hot-shard
# fixtures are the named slow-set member; run with `-m slow`.
pytestmark = pytest.mark.slow

from tests.conftest import SF_SMALL
from uforwarder_spark import model
from uforwarder_spark.operators.skew import DEFAULT_SALTS, salted_agg


@pytest.fixture(scope="module")
def skewed(request):
    """10× replicated message log with 90% of rows forced onto one hot
    (topic, part_id) shard — the adversarial shape for shard-keyed aggs."""
    spark_fixture = request.getfixturevalue("spark")
    m = model.messages(spark_fixture, SF_SMALL)
    rep = m.withColumn("rep", F.explode(F.expr("sequence(0, 9)")))
    hot = F.pmod(F.hash("topic", "part_id", "msg_offset", "rep"), F.lit(10)) < 9
    df = (
        rep.withColumn("topic", F.when(hot, F.lit("hot_topic")).otherwise(F.col("topic")))
        .withColumn("part_id", F.when(hot, F.lit(0)).otherwise(F.col("part_id")))
        # keep offsets unique per shard after replication
        .withColumn("msg_offset", F.col("msg_offset") * 10 + F.col("rep"))
        .drop("rep")
    ).persist()
    df.count()
    yield df
    df.unpersist()


def test_skew_shape_is_as_claimed(skewed):
    per_key = skewed.groupBy("topic", "part_id").count().toPandas()
    total = per_key["count"].sum()
    hot_share = per_key.loc[per_key["topic"] == "hot_topic", "count"].sum() / total
    assert 0.85 <= hot_share <= 0.95


def test_salted_agg_equals_plain_on_skewed(skewed):
    plain = (
        skewed.groupBy("topic", "part_id")
        .agg(
            F.count("*").alias("n_msgs"),
            F.sum("size_bytes").alias("total_bytes"),
            F.min("msg_offset").alias("lo"),
            F.max("msg_offset").alias("hi"),
        )
        .toPandas()
        .sort_values(["topic", "part_id"])
        .reset_index(drop=True)
    )
    salted = (
        salted_agg(
            skewed,
            ["topic", "part_id"],
            {
                "n_msgs": ("count", "*"),
                "total_bytes": ("sum", "size_bytes"),
                "lo": ("min", "msg_offset"),
                "hi": ("max", "msg_offset"),
            },
        )
        .toPandas()
        .sort_values(["topic", "part_id"])
        .reset_index(drop=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(plain, salted, check_dtype=False)


def test_salt_spreads_hot_key(skewed):
    """The helper's salt (hash of every column) must divide the hot
    shard's rows across reducers: ≥ 3/4 of the salt space occupied and
    no bucket over 2× fair share — otherwise the two-stage rewrite still
    has a straggler."""
    hot = skewed.filter("topic = 'hot_topic'")
    salt = F.pmod(F.hash(*[F.col(c) for c in hot.columns]), F.lit(DEFAULT_SALTS))
    dist = hot.groupBy(salt.alias("salt")).count().toPandas()
    n_hot = dist["count"].sum()
    assert len(dist) >= DEFAULT_SALTS * 3 // 4
    assert dist["count"].max() <= 2 * n_hot / DEFAULT_SALTS


def test_a5_a13_correct_on_skewed_log(skewed, spark):
    """A5 (sort-free watermark) and an A13-shaped throughput agg stay
    correct when one shard owns 90% of rows: verified against an
    independent pandas computation of the same semantics."""
    from uforwarder_spark.operators.pipeline import ack_watermark_frame

    got = ack_watermark_frame(skewed).toPandas().set_index(["topic", "part_id"])
    pdf = skewed.select("topic", "part_id", "msg_offset", "acked").toPandas()

    for (topic, part), g in pdf.groupby(["topic", "part_id"]):
        g = g.sort_values("msg_offset")
        unacked = g.loc[~g["acked"], "msg_offset"]
        min_unacked = unacked.min() if len(unacked) else None
        below = g["msg_offset"] < min_unacked if min_unacked is not None else g["msg_offset"] == g["msg_offset"]
        acked_below = g.loc[g["acked"] & below, "msg_offset"]
        committed = acked_below.max() if len(acked_below) else None
        row = got.loc[(topic, part)]
        assert row["high_watermark"] == g["msg_offset"].max()
        if committed is None:
            assert row.isna()["committed_offset"]
        else:
            assert row["committed_offset"] == committed

    thr = (
        skewed.withColumn(
            "window_epoch", F.expr("CAST(unix_timestamp(ts) DIV 300 AS BIGINT) * 300")
        )
        .groupBy("topic", "window_epoch")
        .agg(F.count("*").alias("n_msgs"), F.sum("size_bytes").alias("total_bytes"))
        .toPandas()
    )
    assert thr["n_msgs"].sum() == len(pdf)
    hot_windows = thr[thr["topic"] == "hot_topic"]
    assert len(hot_windows) > 1  # the hot topic spans windows, so even the
    # hot topic's agg key space is wider than one reducer's worth


def test_minhash_band_join_hot_bucket_aqe_splits(spark, tmp_path):
    """D2/D36 band-join skew evidence (round-4 verdict item 7): a
    boilerplate cluster — hundreds of identical documents, the
    real-corpus shape (mirrored pages, templated chrome) — collides
    into ONE band bucket per band, the adversarial key for the band
    self-join. With the broadcast path disabled (at 100 TB the band
    frame never broadcasts) AQE's OptimizeSkewedJoin must split the hot
    partition (skew=true in the final adaptive plan), and the verified
    pair set must still be exactly every boilerplate pair.

    Trigger arithmetic (mirrored in docs/SCALE.md): a partition is
    split when its size > max(skewedPartitionThresholdInBytes,
    skewedPartitionFactor × median). The session defaults (256 MB / 5×)
    fire at production sizes; this test scales the thresholds down
    (4 KB / 2 KB advisory) so the same machinery fires on a 500-doc
    fixture."""
    n_hot, n_uniq = 500, 50
    boiler = "terms of service apply contact us all rights reserved " * 6
    rows = [(i, boiler, "en", "src00", len(boiler)) for i in range(n_hot)] + [
        (n_hot + i, f"unique document body number {i} with its own words {i * 7}",
         "en", "src01", 40)
        for i in range(n_uniq)
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    from uforwarder_spark.operators.dedup import dedup_minhash_lsh

    conf = spark.conf
    saved = {
        k: conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        )
    }
    try:
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "4KB")
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2KB")
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        df = dedup_minhash_lsh(spark, str(tmp_path))
        pairs = df.collect()  # executes df's OWN QueryExecution, so the
        # adaptive plan below is the finalized one this very run produced
        # every boilerplate pair, verified at jaccard exactly 1.0
        assert len(pairs) == n_hot * (n_hot - 1) // 2
        assert all(r.jaccard == 1.0 for r in pairs)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan[:4000]
    finally:
        for k, v in saved.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)


def test_exact_substring_hot_window_hash(spark, tmp_path):
    """D73 under the adversarial boilerplate shape: 200 docs all carry
    the SAME 60-token run (one window hash owns ~200x its fair share of
    the corpus group-by), plus per-doc unique tails. The hash group-by
    must partial-aggregate the hot key map-side (no straggler carrying
    raw positions), and the answer must stay exact: every doc's shared
    run is duplicated (one island, 60 tokens), no unique tail is."""
    from uforwarder_spark.operators.dedup import ES_W, exact_substring_dedup

    boiler = " ".join(f"boil{i}" for i in range(60))
    docs = [
        (i, boiler + " " + " ".join(f"d{i}u{j}" for j in range(40)), "en", f"src{i % 4}", 10)
        for i in range(200)
    ]
    d = tmp_path / "hot"
    spark.createDataFrame(docs, ["doc_id", "text", "lang", "source", "n_chars"]).write.mode(
        "overwrite"
    ).parquet(str(d / "documents.parquet"))
    out = exact_substring_dedup(spark, str(d))
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the hot hash must meet a partial (map-side) aggregate before any
    # exchange — the property that bounds the straggler reducer to one
    # combined row per partition instead of 200 raw position rows
    assert plan.count("HashAggregate") >= 2
    rows = {r.doc_id: r for r in out.collect()}
    assert len(rows) == 200
    for i, r in rows.items():
        assert r.n_spans == 1 and r.n_dup_tokens == 60
        assert r.n_dup_windows == 60 - ES_W + 1
        assert r.n_tokens == 100
