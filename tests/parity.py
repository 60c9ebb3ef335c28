"""Oracle-parity harness mirroring the driver's check: row-count + schema
(column-name set) + order-insensitive exact value comparison between a
Spark query result and its DuckDB oracle."""

from __future__ import annotations

import numpy as np
import pandas as pd


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_bool_dtype(df[c]):
            df[c] = df[c].astype(bool)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def assert_parity(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, name: str) -> None:
    assert len(spark_pdf) == len(duck_pdf), (
        f"{name}: row count {len(spark_pdf)} != oracle {len(duck_pdf)}"
    )
    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), (
        f"{name}: columns {sorted(spark_pdf.columns)} != oracle {sorted(duck_pdf.columns)}"
    )
    s, d = normalize(spark_pdf), normalize(duck_pdf)
    for c in s.columns:
        # dtype KIND must agree pre-normalization: the driver hashes raw
        # reprs, so DuckDB HUGEINT→object/float vs Spark int64 is a real
        # mismatch even when values are numerically equal.
        sk = spark_pdf[c].dtype.kind
        dk = duck_pdf[c].dtype.kind
        assert sk == dk, (
            f"{name}.{c}: dtype kind {spark_pdf[c].dtype} (spark) != "
            f"{duck_pdf[c].dtype} (oracle) — cast the oracle (e.g. HUGEINT→BIGINT)"
        )
    for c in s.columns:
        sv, dv = s[c].to_numpy(), d[c].to_numpy()
        if np.issubdtype(sv.dtype, np.floating):
            both_nan = np.isnan(sv) & np.isnan(dv)
            eq = np.isclose(sv, dv, rtol=0, atol=0) | both_nan
            if not eq.all():
                i = int(np.argmin(eq))
                diff = np.nanmax(np.abs(sv - dv))
                raise AssertionError(
                    f"{name}.{c}: value mismatch at sorted row {i}: "
                    f"{sv[i]!r} != {dv[i]!r} (max abs diff {diff:.3e})"
                )
        else:
            eq = sv == dv
            if not np.asarray(eq).all():
                i = int(np.argmin(eq))
                raise AssertionError(
                    f"{name}.{c}: value mismatch at sorted row {i}: {sv[i]!r} != {dv[i]!r}"
                )
