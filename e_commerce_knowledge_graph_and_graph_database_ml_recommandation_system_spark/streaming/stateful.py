"""Custom stateful streaming operator via applyInPandasWithState
(SURVEY §2.13: the escape hatch for operators Structured Streaming's
built-in aggregations can't express).

Running per-user profile: event count, value sum, last event type — the
streaming analog of the reference's incremental per-entity attribute updates
(dvid batches mutating node attrs). State is one tiny tuple per user;
watermark bounds state retention in production (omitted here because the
test drains a finite source)."""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..sources.tables import normalize_event_ts

OUTPUT_SCHEMA = "user_id long, n_events long, total_value double, last_type string"
STATE_SCHEMA = "n long, total double, last string"


def _update_user_profile(
    key, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        n, total, last = state.get
    else:
        n, total, last = 0, 0.0, None
    for pdf in pdfs:
        pdf = pdf.sort_values("ts")
        n += len(pdf)
        total += float(pdf["value"].sum())
        if len(pdf):
            last = str(pdf["event_type"].iloc[-1])
    state.update((n, total, last))
    yield pd.DataFrame(
        [(user_id, n, round(total, 6), last)],
        columns=["user_id", "n_events", "total_value", "last_type"],
    )


def stream_user_profiles(spark, sf_dir: str) -> DataFrame:
    """Run the stateful profile operator over the events table as a stream;
    returns the final materialized per-user profile (last update per user).
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    static = spark.read.parquet(f"{sf_dir}/events.parquet")
    stream = normalize_event_ts(
        spark.readStream.schema(static.schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    profiles = stream.groupBy("user_id").applyInPandasWithState(
        _update_user_profile,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    name = f"stream_profiles_{abs(hash(sf_dir)) % 100000}"
    q = profiles.writeStream.format("memory").queryName(name).outputMode("update").start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # update-mode sink may hold several versions per user; keep the latest
    # (max n_events) — the completed profile
    snap = spark.table(name)
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.desc("n_events"))
    return (
        snap.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1).drop("rn")
    )
