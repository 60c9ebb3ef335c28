"""Timestamp-generation compatibility: every registered query must ANALYZE
against every physical encoding of events.ts the driver has shipped.

Round 2 broke because a new testdata generation switched events.ts from
TIMESTAMP(NANOS) to TIMESTAMP(MICROS) (Spark TIMESTAMP_NTZ) and two
operators failed at *analysis* time (unix_millis rejects NTZ) — invisible
to any test that pins one generation. This suite writes the events schema
in all three physical variants and analyzes every key in QUERIES against
each; a 10-second analysis pass catches the whole failure class.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tests.conftest import SF_SMALL, TABLES

VARIANTS = ["ns", "us_ntz", "us_ltz"]


@pytest.fixture(scope="module")
def variant_dirs(tmp_path_factory):
    """sf0.001 rewritten with events.ts in each physical encoding.

    Non-events tables are symlinked — identical bytes, no copies."""
    base = tmp_path_factory.mktemp("tsgen")
    events = pq.read_table(f"{SF_SMALL}/events.parquet")
    ts_idx = events.schema.get_field_index("ts")
    encodings = {
        "ns": pa.timestamp("ns"),
        "us_ntz": pa.timestamp("us"),
        "us_ltz": pa.timestamp("us", tz="UTC"),
    }
    dirs = {}
    for name, ts_type in encodings.items():
        d = base / name
        d.mkdir()
        cast = events.set_column(
            ts_idx, pa.field("ts", ts_type), events.column("ts").cast(ts_type)
        )
        pq.write_table(cast, d / "events.parquet")
        for t in TABLES:
            if t != "events":
                os.symlink(f"{SF_SMALL}/{t}.parquet", d / f"{t}.parquet")
        dirs[name] = str(d)
    return dirs


@pytest.fixture(scope="module")
def all_queries():
    import uforwarder_spark  # noqa: F401

    from uforwarder_spark.registry import QUERIES

    return dict(QUERIES)


@pytest.mark.parametrize("variant", VARIANTS)
def test_every_query_analyzes_against_variant(spark, variant_dirs, all_queries, variant):
    """df construction + .schema force full analysis (no execution)."""
    sf_dir = variant_dirs[variant]
    failures = []
    for key, fn in all_queries.items():
        try:
            df = fn(spark, sf_dir)
            _ = df.schema
        except Exception as ex:  # noqa: BLE001 — collecting all failures
            failures.append(f"{key}: {type(ex).__name__}: {str(ex)[:160]}")
    assert not failures, f"[{variant}] {len(failures)} keys fail analysis:\n" + "\n".join(failures)


@pytest.mark.parametrize("variant", VARIANTS)
def test_ts_normalized_to_ltz(spark, variant_dirs, variant):
    """load_table must yield plain TIMESTAMP (LTZ) for every generation."""
    from uforwarder_spark.model import load_table

    df = load_table(spark, variant_dirs[variant], "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
