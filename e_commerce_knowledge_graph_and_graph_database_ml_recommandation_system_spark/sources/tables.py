"""Parquet source layer for the driver-generated star-schema testdata.

Mirrors the reference's CSV scan stage (S1, ``First_Data_injection.py:33,55,84``)
but declaratively: parquet scans carry schemas, and Catalyst pushes filters
and column pruning into the scan. At 100 TB these tables would be
partitioned (orders/lineitem by date, events by ts); the loaders are
path-based so partition discovery is free when that layout exists.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    """Load one testdata table as a DataFrame (lazy parquet scan).

    ``events`` carries TIMESTAMP(NANOS) which the vectorized parquet reader
    rejects; it is read with nanos-as-long and converted to a microsecond
    timestamp (truncation, matching Spark's native precision).
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        from pyspark.sql import functions as F

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        # integer div: float division of epoch-nanos exceeds double precision
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR, names=TABLES) -> dict[str, DataFrame]:
    """Load several tables at once: ``{name: DataFrame}``."""
    return {name: load_table(spark, name, sf_dir) for name in names}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register every table as a temp view so ``spark.sql`` sees the same
    names the DuckDB oracle does."""
    for name in TABLES:
        load_table(spark, name, sf_dir).createOrReplaceTempView(name)
