"""Driver-style Spark-vs-DuckDB comparison used across tests.

Mirrors the driver's correctness gate: row count, column-name set, and
order-insensitive value equality (rows sorted by all columns)."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def assert_frames_equal(spark_df, oracle_sql: str, float_rtol: float = 0.0):
    got = normalize(spark_df.toPandas())
    want = normalize(duckdb.sql(oracle_sql).df())
    assert list(got.columns) == list(want.columns), f"columns {list(got.columns)} != {list(want.columns)}"
    assert len(got) == len(want), f"row count {len(got)} != {len(want)}"
    for c in got.columns:
        a, b = got[c].to_numpy(), want[c].to_numpy()
        if np.issubdtype(np.asarray(a).dtype, np.floating) or np.issubdtype(np.asarray(b).dtype, np.floating):
            a = np.asarray(a, dtype=np.float64)
            b = np.asarray(b, dtype=np.float64)
            both_nan = np.isnan(a) & np.isnan(b)
            if float_rtol == 0.0:
                ok = (a == b) | both_nan
            else:
                ok = np.isclose(a, b, rtol=float_rtol, equal_nan=True)
            assert ok.all(), f"column {c}: first diff at {np.argmin(ok)}: {a[np.argmin(ok)]} vs {b[np.argmin(ok)]}"
        else:
            mism = ~(pd.Series(a).fillna("<NULL>") == pd.Series(b).fillna("<NULL>"))
            assert not mism.any(), f"column {c}: {int(mism.sum())} mismatches, first: {a[mism.idxmax()]} vs {b[mism.idxmax()]}"
