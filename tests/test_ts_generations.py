"""Timestamp-generation compatibility: every registered query must ANALYZE
against every physical encoding of events.ts the driver has shipped.

Round 2 broke because a new testdata generation switched events.ts from
TIMESTAMP(NANOS) to TIMESTAMP(MICROS) (Spark TIMESTAMP_NTZ) and two
operators failed at *analysis* time (unix_millis rejects NTZ) — invisible
to any test that pins one generation. This suite writes the events schema
in all four physical variants (incl. legacy INT96) and analyzes every key in QUERIES against
each; a 10-second analysis pass catches the whole failure class.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tests.conftest import SF_SMALL, TABLES

VARIANTS = ["ns", "us_ntz", "us_ltz", "int96"]


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
    # fourth encoding: legacy Spark/Hive INT96 — pyarrow reports it as
    # timestamp[ns] in the arrow schema, so the loader must distinguish
    # it by parquet PHYSICAL type (model._ts_unit) and take the plain
    # reader path, never the raw-long nanos schema
    d = base / "int96"
    d.mkdir()
    cast = events.set_column(
        ts_idx, pa.field("ts", pa.timestamp("ns")), events.column("ts").cast(pa.timestamp("ns"))
    )
    pq.write_table(cast, d / "events.parquet", use_deprecated_int96_timestamps=True)
    for t in TABLES:
        if t != "events":
            os.symlink(f"{SF_SMALL}/{t}.parquet", d / f"{t}.parquet")
    dirs["int96"] = str(d)
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


def test_ns_generation_reads_without_legacy_conf(spark, variant_dirs):
    """The TIMESTAMP(NANOS) generation must load via the explicit-schema
    path, leaving spark.sql.legacy.parquet.nanosAsLong untouched — a
    session-wide flip would silently corrupt any OTHER nanos column read
    later in the session."""
    from uforwarder_spark.model import load_table

    before = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false")
    df = load_table(spark, variant_dirs["ns"], "events")
    assert df.count() > 0
    assert dict(df.dtypes)["ts"] == "timestamp"
    assert spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") == before == "false"


def test_size_conf_spellings():
    """_size_bytes accepts every documented Spark size spelling."""
    from uforwarder_spark.model import _size_bytes

    assert _size_bytes("128m") == _size_bytes("128MB") == 128 << 20
    assert _size_bytes("64k") == _size_bytes("64kb") == 64 << 10
    assert _size_bytes("1g") == _size_bytes("1GB") == 1 << 30
    assert _size_bytes("4194304") == 4 << 20
    import pytest as _pytest

    with _pytest.raises(ValueError):
        _size_bytes("lots")
