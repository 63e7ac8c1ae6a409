"""Local emulation of the driver's oracle compare: row-count + schema +
order-insensitive value comparison between a Spark DataFrame and DuckDB SQL."""

from __future__ import annotations

import numpy as np
import pandas as pd


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, rows by all values; canonicalize dtypes."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64").round(6)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            # pin the resolution too: Series.equals is dtype-strict, and
            # Spark toPandas yields datetime64[ns] while DuckDB .df()
            # yields datetime64[us] — equal values, unequal dtypes
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None).astype("datetime64[ns]")
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def assert_oracle_match(spark_df, duck_con, sql: str, name: str = "query") -> None:
    got = normalize(spark_df.toPandas())
    want = normalize(duck_con.sql(sql).df())
    assert list(got.columns) == list(want.columns), (
        f"{name}: column mismatch {list(got.columns)} vs {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: row count {len(got)} vs {len(want)}"
    for c in got.columns:
        if pd.api.types.is_float_dtype(got[c]):
            ok = np.allclose(got[c].fillna(-9e99), want[c].fillna(-9e99), atol=2e-6, rtol=0)
        else:
            ok = got[c].fillna("∅").equals(want[c].fillna("∅")) if got[c].dtype == object else got[c].equals(want[c])
        assert ok, f"{name}: values differ in column {c}:\n{got[c].head()}\nvs\n{want[c].head()}"
