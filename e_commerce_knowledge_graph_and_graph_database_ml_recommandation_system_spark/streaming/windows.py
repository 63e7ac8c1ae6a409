"""Event-stream windowing — batch AND Structured Streaming forms.

Beyond-reference scope (SURVEY §2.13): the reference ingests in dvid batches;
the idiomatic Spark upgrade is event-time windows + watermark. Each window
shape has (a) a batch DataFrame form, oracle-checkable against DuckDB, and
(b) the identical logic runnable under readStream (see stream_tumbling_counts)
— Structured Streaming's unified batch/stream semantics mean the SAME
expression tree serves both, which is exactly what makes the streaming path
trustworthy: the micro-batch result must equal the batch oracle.

Scale: windowed aggregations shuffle on (window, key); watermarks bound
state. Session windows use the lag/cumsum gaps-and-islands form in batch
(one window shuffle per user) and ``session_window`` under streaming.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..sources.tables import normalize_event_ts


def _sum_value():
    """value summed as DECIMAL (cast is deterministic: nearest 6dp decimal
    to the double, identical in Spark and DuckDB), back to double only for
    the final round — float SUM is summation-order-dependent and the orders
    differ across engines/partitions (knn_aggregates' round-1 failure mode)."""
    return F.round(F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 6)


def tumbling_counts(events: DataFrame, width: str = "5 minutes") -> DataFrame:
    """Tumbling event-time windows per event_type: count + sum(value)."""
    return (
        events.groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(F.count("*").alias("cnt"), _sum_value().alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "cnt", "sum_value")
    )


def sliding_counts(events: DataFrame, width: str = "10 minutes", slide: str = "5 minutes") -> DataFrame:
    """Sliding windows: each event lands in width/slide windows."""
    return (
        events.groupBy(F.window("ts", width, slide).alias("w"), "event_type")
        .agg(F.count("*").alias("cnt"))
        .select(F.col("w.start").alias("window_start"), "event_type", "cnt")
    )


def session_windows(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Per-user session windows (gap-based), batch form: classic
    gaps-and-islands — lag + cumulative sum of session-break flags.
    Deterministic and SQL-expressible, so the streaming ``session_window``
    operator has an exact batch oracle."""
    w_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = events.select(
        "user_id",
        "event_id",
        "ts",
        F.when(
            (F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w_user))) > gap_minutes * 60,
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    w_cum = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    sessions = flagged.withColumn("session_id", F.sum("new_session").over(w_cum))
    return sessions.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


def dedup_events(events: DataFrame) -> DataFrame:
    """Exactly-once analog: first event per event_id (streaming form is
    ``withWatermark + dropDuplicates``). The full column list is the sort
    key: two rows sharing (event_id, ts) would otherwise resolve to
    engine-dependent survivors and pass the hash gate only by data luck
    (round-1 advice)."""
    w = Window.partitionBy("event_id").orderBy("ts", "user_id", "event_type", "value", "props")
    return (
        events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


def stream_tumbling_counts(spark, sf_dir: str, width: str = "5 minutes") -> DataFrame:
    """The REAL Structured Streaming path: readStream over the events parquet
    with a 1-hour watermark, tumbling window per event_type, complete-mode
    memory sink drained to a batch DataFrame.

    Returns the materialized result — byte-equal to tumbling_counts on the
    same data, which is the registry's oracle check for this entry."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    events_file = f"{sf_dir}/events.parquet"
    static = spark.read.parquet(events_file)
    # readStream needs a directory source; glob-filter the sf dir to events
    stream = normalize_event_ts(
        spark.readStream.schema(static.schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    ).withWatermark("ts", "1 hour")
    agg = (
        stream.groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(F.count("*").alias("cnt"), _sum_value().alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "cnt", "sum_value")
    )
    name = f"stream_tumbling_{abs(hash(sf_dir)) % 100000}"
    q = agg.writeStream.format("memory").queryName(name).outputMode("complete").start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)


def stream_enriched_counts(spark, sf_dir: str, width: str = "15 minutes") -> DataFrame:
    """Stream-static join: the events READSTREAM enriched with the customer
    dimension (broadcast — stream-static joins never shuffle the stream
    side against a dim table), then a watermarked tumbling aggregate per
    market segment. The static side is re-read per micro-batch by
    Structured Streaming's unified plan, so dim updates between batches are
    picked up for free — the streaming analog of the serving layer's
    broadcast dim joins.

    Returns the drained complete-mode result, hash-checked against the
    identical batch SQL (unified semantics, same guarantee as
    stream_tumbling_counts)."""
    from ..sources.tables import load_table

    dim = load_table(spark, "customer", sf_dir).select("c_custkey", "c_mktsegment")
    static = spark.read.parquet(f"{sf_dir}/events.parquet")
    stream = normalize_event_ts(
        spark.readStream.schema(static.schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    ).withWatermark("ts", "1 hour")
    joined = stream.join(F.broadcast(dim), stream.user_id == dim.c_custkey)
    agg = (
        joined.groupBy(F.window("ts", width).alias("w"), "c_mktsegment")
        .agg(F.count("*").alias("cnt"), _sum_value().alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("c_mktsegment").alias("segment"),
            "cnt",
            "sum_value",
        )
    )
    name = f"stream_enriched_{abs(hash(sf_dir)) % 100000}"
    q = agg.writeStream.format("memory").queryName(name).outputMode("complete").start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)


def stream_stream_attribution(
    spark,
    sf_dir: str,
    lookback_minutes: int = 30,
    max_files_per_trigger: int | None = None,
    progress_out: list | None = None,
) -> DataFrame:
    """REAL stream-stream join (the §2.13 shape stream-static can't cover):
    purchase events joined to the SAME user's view events within the
    preceding ``lookback_minutes`` — attribution candidates. Both sides are
    watermarked readStreams; the time-range predicate bounds the view-side
    state Structured Streaming must hold (views older than purchase_ts -
    lookback - watermark are evicted), which is what makes a stream-stream
    join runnable forever at 100 TB/day — an unbounded join would
    accumulate state without limit.

    Drained append-mode result equals the batch interval join row-for-row
    (unified semantics), so it carries a full DuckDB hash oracle. lag_us
    is an exact integer microsecond difference — no float time math."""
    import os

    ev_path = f"{sf_dir}/events.parquet"
    static = spark.read.parquet(ev_path)

    def src():
        # single-file testdata layout streams via the glob filter; a
        # directory layout (scale-probe scratch, any production landing
        # zone) streams the directory itself. max_files_per_trigger splits
        # the drain into multiple micro-batches so watermark advancement /
        # state eviction is observable (the scale-probe instrumentation).
        reader = spark.readStream.schema(static.schema)
        if max_files_per_trigger is not None:
            reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
        if os.path.isdir(ev_path):
            return normalize_event_ts(reader.parquet(ev_path))
        return normalize_event_ts(
            reader.option("pathGlobFilter", "events.parquet").parquet(sf_dir)
        )

    views = (
        src()
        .filter(F.col("event_type") == "view")
        .select(
            F.col("event_id").alias("view_id"),
            F.col("user_id").alias("v_user"),
            F.col("ts").alias("view_ts"),
        )
        .withWatermark("view_ts", "1 hour")
    )
    purchases = (
        src()
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "1 hour")
    )
    joined = purchases.join(
        views,
        (F.col("v_user") == F.col("user_id"))
        & (F.col("view_ts") <= F.col("purchase_ts"))
        & (
            F.col("view_ts")
            >= F.col("purchase_ts") - F.expr(f"INTERVAL {int(lookback_minutes)} MINUTES")
        ),
        "inner",
    ).select(
        "purchase_id",
        "view_id",
        "user_id",
        F.date_format("purchase_ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
        F.date_format("view_ts", "yyyy-MM-dd HH:mm:ss").alias("view_ts"),
        (F.unix_micros(F.col("purchase_ts")) - F.unix_micros(F.col("view_ts")))
        .cast("long")
        .alias("lag_us"),
    )
    name = f"stream_attr_{abs(hash(sf_dir)) % 100000}"
    q = joined.writeStream.format("memory").queryName(name).outputMode("append").start()
    try:
        q.processAllAvailable()
        if progress_out is not None:
            progress_out.extend(q.recentProgress)
    finally:
        q.stop()
    return spark.table(name)
