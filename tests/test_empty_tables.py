"""Degenerate-input sweep: every registered query must EXECUTE (not just
analyze) against zero-row tables without raising — empty partitions,
empty groups, missing query vectors, and absent dimension rows are
normal at the edges of a 100 TB job (a pruned partition, a fresh day's
directory), and an operator that throws there takes the whole stage
down."""

from __future__ import annotations

import pytest

import pyarrow.parquet as pq

from tests.conftest import SF_SMALL, TABLES


@pytest.fixture(scope="module")
def empty_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("empty_sf")
    for t in TABLES:
        tbl = pq.read_table(f"{SF_SMALL}/{t}.parquet")
        pq.write_table(tbl.slice(0, 0), str(d / f"{t}.parquet"))
    return str(d)


def test_every_query_executes_on_empty_tables(spark, empty_dir):
    import uforwarder_spark  # noqa: F401
    from uforwarder_spark.registry import QUERIES

    failures = []
    for name, fn in QUERIES.items():
        try:
            fn(spark, empty_dir).count()
        except Exception as ex:  # noqa: BLE001 - collecting the sweep
            failures.append((name, type(ex).__name__))
    assert not failures, failures
