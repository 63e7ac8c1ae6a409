"""Registry entries: event-stream windowing (SURVEY §2.13 / §7.2 step 8).

``events_stream_tumbling`` actually runs Structured Streaming (readStream →
watermark → window → memory sink) and is hash-checked against the SAME
DuckDB oracle as the batch form — the unified-semantics guarantee made
testable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from ..streaming import windows as sw
from .registry import register

# temporal outputs are STRINGS in both engines: timestamp dtypes/precisions
# (ns vs µs, date objects) hash differently across engines even when equal
_TUMBLING_SQL = """
SELECT strftime(time_bucket(INTERVAL '5 minutes', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type,
       COUNT(*) AS cnt,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 6) AS sum_value
FROM events
GROUP BY 1, 2
"""


@register("events_tumbling_agg", _TUMBLING_SQL)
def q_events_tumbling_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = sw.tumbling_counts(load_table(spark, "events", sf_dir))
    return out.withColumn("window_start", F.date_format("window_start", "yyyy-MM-dd HH:mm:ss"))


@register("events_stream_tumbling", _TUMBLING_SQL)
def q_events_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming execution of the tumbling aggregate."""
    out = sw.stream_tumbling_counts(spark, sf_dir)
    return out.withColumn("window_start", F.date_format("window_start", "yyyy-MM-dd HH:mm:ss"))


@register(
    "events_sliding_agg",
    """
WITH expanded AS (
    SELECT event_type,
           UNNEST([time_bucket(INTERVAL '5 minutes', ts) - INTERVAL '5 minutes',
                   time_bucket(INTERVAL '5 minutes', ts)]) AS ws
    FROM events
)
SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start, event_type, COUNT(*) AS cnt
FROM expanded GROUP BY 1, 2
""",
)
def q_events_sliding_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = sw.sliding_counts(load_table(spark, "events", sf_dir))
    return out.withColumn("window_start", F.date_format("window_start", "yyyy-MM-dd HH:mm:ss"))


@register(
    "events_session_windows",
    """
WITH flagged AS (
    SELECT user_id, event_id, ts,
           CASE WHEN CAST(floor(epoch(ts)) AS BIGINT)
                     - CAST(floor(epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))) AS BIGINT)
                     > 1800
                THEN 1 ELSE 0 END AS new_session
    FROM events
),
sess AS (
    SELECT user_id, event_id, ts,
           CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
    FROM flagged
)
SELECT user_id, session_id,
       COUNT(*) AS n_events,
       strftime(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
       strftime(MAX(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_end
FROM sess GROUP BY user_id, session_id
""",
)
def q_events_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = sw.session_windows(load_table(spark, "events", sf_dir), gap_minutes=30)
    return out.withColumn(
        "session_start", F.date_format("session_start", "yyyy-MM-dd HH:mm:ss.SSSSSS")
    ).withColumn("session_end", F.date_format("session_end", "yyyy-MM-dd HH:mm:ss.SSSSSS"))


@register(
    "events_dedup",
    """
SELECT event_id, strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts,
       user_id, event_type, value, props
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY event_id
          ORDER BY ts, user_id, event_type, value, props) AS rn FROM events)
WHERE rn = 1
""",
)
def q_events_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sw.dedup_events(load_table(spark, "events", sf_dir)).select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    )


@register(
    "events_stream_enriched",
    """
SELECT strftime(time_bucket(INTERVAL '15 minutes', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       c_mktsegment AS segment,
       COUNT(*) AS cnt,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 6) AS sum_value
FROM events JOIN customer ON user_id = c_custkey
GROUP BY 1, 2
""",
)
def q_events_stream_enriched(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static broadcast join + watermarked tumbling aggregate,
    executed on a real readStream and hash-checked against the batch SQL."""
    out = sw.stream_enriched_counts(spark, sf_dir)
    return out.withColumn("window_start", F.date_format("window_start", "yyyy-MM-dd HH:mm:ss"))


@register(
    "events_asof_last_purchase",
    """
WITH r AS (
    SELECT user_id, ts, value, event_id FROM (
        SELECT user_id, ts, value, event_id,
               ROW_NUMBER() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
        FROM events WHERE event_type = 'purchase'
    ) WHERE rn = 1
),
l AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'view')
SELECT l.event_id, l.user_id,
       strftime(l.ts, '%Y-%m-%d %H:%M:%S.%f') AS ts,
       strftime(r.ts, '%Y-%m-%d %H:%M:%S.%f') AS last_purchase_ts,
       ROUND(r.value, 6) AS last_purchase_value
FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
""",
)
def q_events_asof_last_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (the time-series operator Spark lacks natively): every
    'view' event gets the user's latest 'purchase' at or before it. The
    Spark side is the union + carry-forward-window composition
    (operators/asof.py); the ORACLE is DuckDB's native ASOF JOIN — two
    entirely different formulations, one hash."""
    from ..operators.asof import as_of_join
    from pyspark.sql import Window as W

    events = load_table(spark, "events", sf_dir)
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value", "event_id"
    )
    # one right row per (key, ts): duplicate-ts winners are unspecified in
    # native ASOF, so pin them identically on both engines
    rn = F.row_number().over(W.partitionBy("user_id", "ts").orderBy(F.desc("event_id")))
    purchases = (
        purchases.withColumn("rn", rn).filter(F.col("rn") == 1).drop("rn", "event_id")
    )
    views = events.filter(F.col("event_type") == "view").select("event_id", "user_id", "ts")
    out = as_of_join(views, purchases, key="user_id", left_ts="ts", right_ts="ts")
    return out.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts"),
        F.date_format("asof_ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("last_purchase_ts"),
        F.round("asof_value", 6).alias("last_purchase_value"),
    )


_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@register(
    "events_type_pivot",
    f"""
SELECT user_id,
       {", ".join(f"CAST(SUM(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS BIGINT) AS {t}" for t in _EVENT_TYPES)},
       ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 6) AS total_value
FROM events GROUP BY user_id
""",
)
def q_events_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long→wide): per-user event-type counts via the DataFrame
    pivot API with an EXPLICIT value list — at 100 TB the implicit form
    costs an extra distinct pass over the fact table and can explode the
    schema; pinning the dimension values keeps it one aggregate. Total
    value rides along decimal-exact."""
    ev = load_table(spark, "events", sf_dir)
    counts = (
        ev.groupBy("user_id")
        .pivot("event_type", _EVENT_TYPES)
        .agg(F.count(F.lit(1)))
        .na.fill(0)
        .select("user_id", *[F.col(t).cast("long").alias(t) for t in _EVENT_TYPES])
    )
    vals = ev.groupBy("user_id").agg(
        F.round(F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 6).alias("total_value")
    )
    return counts.join(vals, "user_id")


@register(
    "events_json_props",
    """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k,
       ROUND(CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS DOUBLE) / COUNT(*), 6) AS avg_k
FROM events GROUP BY event_type
""",
)
def q_events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction (§2.10 function surface): pull a typed
    field out of the JSON ``props`` column with get_json_object (JVM-side
    JSON path, no UDF) and aggregate it — integer sums so the mean is
    division-exact cross-engine."""
    ev = load_table(spark, "events", sf_dir)
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(k).alias("sum_k"),
        F.max(k).alias("max_k"),
        F.round(F.sum(k).cast("double") / F.count(F.lit(1)), 6).alias("avg_k"),
    )


@register(
    "events_funnel",
    """
WITH firsts AS (
    SELECT user_id,
           MIN(CASE WHEN event_type = 'signup' THEN ts END) AS t_signup,
           MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
           MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
           MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
    FROM events GROUP BY user_id
),
depth AS (
    SELECT user_id,
           CASE
             WHEN t_signup IS NULL THEN 0
             WHEN t_view IS NULL OR t_view < t_signup THEN 1
             WHEN t_click IS NULL OR t_click < t_view THEN 2
             WHEN t_purchase IS NULL OR t_purchase < t_click THEN 3
             ELSE 4
           END AS funnel_depth
    FROM firsts
)
SELECT funnel_depth, CAST(COUNT(*) AS BIGINT) AS n_users
FROM depth GROUP BY funnel_depth
""",
)
def q_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel analysis (signup → view → click → purchase): a user reaches
    depth k when the FIRST occurrence of each step happens in temporal
    order up to step k — the classic product-analytics ordered-funnel
    semantics, as one conditional-min aggregate per user plus a
    constant-size depth rollup (single shuffle keyed by user, map-side
    combinable; no sessionization state needed for first-touch funnels)."""
    ev = load_table(spark, "events", sf_dir)
    firsts = ev.groupBy("user_id").agg(
        *[
            F.min(F.when(F.col("event_type") == s, F.col("ts"))).alias(f"t_{s}")
            for s in ("signup", "view", "click", "purchase")
        ]
    )
    depth = (
        F.when(F.col("t_signup").isNull(), 0)
        .when(F.col("t_view").isNull() | (F.col("t_view") < F.col("t_signup")), 1)
        .when(F.col("t_click").isNull() | (F.col("t_click") < F.col("t_view")), 2)
        .when(F.col("t_purchase").isNull() | (F.col("t_purchase") < F.col("t_click")), 3)
        .otherwise(4)
    )
    return (
        firsts.select(depth.alias("funnel_depth"))
        .groupBy("funnel_depth")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


@register(
    "events_retention_cohorts",
    """
WITH signup AS (
    SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
    FROM events WHERE event_type = 'signup' GROUP BY user_id
),
activity AS (
    SELECT DISTINCT user_id, date_trunc('week', ts) AS active_week FROM events
),
joined AS (
    SELECT s.cohort_week, a.active_week,
           CAST(datediff('week', s.cohort_week, a.active_week) AS INT) AS week_offset,
           a.user_id
    FROM signup s JOIN activity a USING (user_id)
    WHERE a.active_week >= s.cohort_week
)
SELECT strftime(cohort_week, '%Y-%m-%d') AS cohort_week,
       week_offset,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_active
FROM joined GROUP BY 1, 2
""",
)
def q_events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention cohort matrix: users cohorted by first-signup week, counted
    distinct per week offset of ANY later activity — the standard cohort
    retention table as two aggregates + one equi-join (no window, no
    per-user state). Week boundaries are date_trunc ISO Mondays in both
    engines; the cohort week is STRINGIFIED for hash parity."""
    ev = load_table(spark, "events", sf_dir)
    signup = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.date_trunc("week", F.min("ts")).alias("cohort_week"))
    )
    activity = ev.select("user_id", F.date_trunc("week", F.col("ts")).alias("active_week")).distinct()
    joined = (
        signup.join(activity, "user_id")
        .filter(F.col("active_week") >= F.col("cohort_week"))
        .select(
            "cohort_week",
            (F.datediff(F.col("active_week"), F.col("cohort_week")) / 7).cast("int").alias("week_offset"),
            "user_id",
        )
    )
    return joined.groupBy(
        F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"), "week_offset"
    ).agg(F.countDistinct("user_id").alias("n_active"))


@register(
    "events_rate_anomalies",
    """
WITH buckets AS (
    SELECT event_type,
           strftime(time_bucket(INTERVAL '5 minutes', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           COUNT(*) AS cnt
    FROM events GROUP BY 1, 2
),
stats AS (
    SELECT event_type, AVG(cnt) AS mu, stddev_pop(cnt) AS sigma
    FROM buckets GROUP BY event_type
)
SELECT b.event_type, b.window_start, CAST(b.cnt AS BIGINT) AS cnt,
       ROUND((b.cnt - s.mu) / NULLIF(s.sigma, 0), 6) AS zscore,
       CAST(ABS((b.cnt - s.mu) / NULLIF(s.sigma, 0)) > 3.0 AS INT) AS is_anomaly
FROM buckets b JOIN stats s USING (event_type)
""",
)
def q_events_rate_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed rate-anomaly detection: per event type, each 5-minute
    bucket's count z-scored against that type's own bucket distribution,
    |z| > 3 flagged — the monitoring workload an event pipeline runs next
    to its windowed aggregates. Two aggregates (bucket counts, per-type
    moments over the BUCKET table — window-cardinality-sized, tiny) + one
    broadcastable join; stddev_pop/6dp-round is the W3 z-score discipline."""
    ev = load_table(spark, "events", sf_dir)
    buckets = (
        ev.groupBy(
            "event_type",
            F.date_format(F.window("ts", "5 minutes")["start"], "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    stats = buckets.groupBy("event_type").agg(
        F.avg("cnt").alias("mu"), F.stddev_pop("cnt").alias("sigma")
    )
    z = (F.col("cnt") - F.col("mu")) / F.nullif(F.col("sigma"), F.lit(0))
    return (
        buckets.join(stats, "event_type")
        .select(
            "event_type",
            "window_start",
            F.col("cnt").cast("long").alias("cnt"),
            F.round(z, 6).alias("zscore"),
            (F.abs(z) > 3.0).cast("int").alias("is_anomaly"),
        )
    )


@register(
    "events_level_shifts",
    """
WITH buckets AS (
    SELECT event_type,
           strftime(time_bucket(INTERVAL '5 minutes', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           COUNT(*) AS cnt
    FROM events GROUP BY 1, 2
),
roll AS (
    SELECT event_type, window_start, cnt,
           AVG(cnt) OVER w6 AS recent_mean,
           COUNT(*) OVER w6 AS n_recent,
           AVG(cnt) OVER wp AS past_mean,
           COUNT(*) OVER wp AS n_past
    FROM buckets
    WINDOW w6 AS (PARTITION BY event_type ORDER BY window_start
                  ROWS BETWEEN 5 PRECEDING AND CURRENT ROW),
           wp AS (PARTITION BY event_type ORDER BY window_start
                  ROWS BETWEEN 11 PRECEDING AND 6 PRECEDING)
),
stats AS (SELECT event_type, stddev_pop(cnt) AS sigma FROM buckets GROUP BY 1)
SELECT r.event_type, r.window_start, CAST(r.cnt AS BIGINT) AS cnt,
       ROUND(r.recent_mean - r.past_mean, 6) AS level_shift,
       -- round both sides before the threshold compare: stddev_pop is
       -- Welford vs two-pass across engines, a 1-ulp boundary value would
       -- flip the flag (repo cross-engine floor/compare guard)
       CAST(ROUND(ABS(r.recent_mean - r.past_mean), 9) > ROUND(2 * s.sigma, 9) AS INT) AS is_shift
FROM roll r JOIN stats s USING (event_type)
WHERE r.n_recent = 6 AND r.n_past = 6
""",
)
def q_events_level_shifts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sustained level-shift detection per event type — the companion
    signal to events_rate_anomalies' point outliers: a 6-bucket rolling
    mean compared against the PRECEDING 6-bucket mean, flagged when the
    shift exceeds 2x the type's own bucket stddev (a windowed mean-shift
    detector; the clamped-recursion CUSUM variant is the companion query
    ``events_cusum_shifts`` — its recursion has a prefix-sum/running-min
    closed form, so it IS window-expressible after all).
    Windows partition by type (no global sort); rows without a
    full 12-bucket history are excluded on both engines identically."""
    from pyspark.sql import Window

    ev = load_table(spark, "events", sf_dir)
    buckets = ev.groupBy(
        "event_type",
        F.date_format(F.window("ts", "5 minutes")["start"], "yyyy-MM-dd HH:mm:ss").alias(
            "window_start"
        ),
    ).agg(F.count(F.lit(1)).alias("cnt"))
    w6 = Window.partitionBy("event_type").orderBy("window_start").rowsBetween(-5, 0)
    wp = Window.partitionBy("event_type").orderBy("window_start").rowsBetween(-11, -6)
    roll = (
        buckets.withColumn("recent_mean", F.avg("cnt").over(w6))
        .withColumn("n_recent", F.count(F.lit(1)).over(w6))
        .withColumn("past_mean", F.avg("cnt").over(wp))
        .withColumn("n_past", F.count(F.lit(1)).over(wp))
    )
    stats = buckets.groupBy("event_type").agg(F.stddev_pop("cnt").alias("sigma"))
    shift = F.col("recent_mean") - F.col("past_mean")
    return (
        roll.join(stats, "event_type")
        .filter((F.col("n_recent") == 6) & (F.col("n_past") == 6))
        .select(
            "event_type",
            "window_start",
            F.col("cnt").cast("long").alias("cnt"),
            F.round(shift, 6).alias("level_shift"),
            (F.round(F.abs(shift), 9) > F.round(2 * F.col("sigma"), 9)).cast("int").alias("is_shift"),
        )
    )


@register(
    "events_cusum_shifts",
    """
WITH buckets AS (
    SELECT event_type,
           strftime(time_bucket(INTERVAL '5 minutes', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           COUNT(*) AS cnt
    FROM events GROUP BY 1, 2
),
stats AS (
    SELECT event_type, AVG(cnt) AS mu, stddev_pop(cnt) AS sigma
    FROM buckets GROUP BY 1
),
pre AS (
    SELECT b.event_type, b.window_start, b.cnt,
           SUM(b.cnt - s.mu - 0.5 * s.sigma) OVER w AS run_sum,
           s.sigma
    FROM buckets b JOIN stats s USING (event_type)
    WINDOW w AS (PARTITION BY b.event_type ORDER BY b.window_start
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
cus AS (
    SELECT event_type, window_start, cnt, sigma,
           run_sum - LEAST(0, MIN(run_sum) OVER w) AS cusum
    FROM pre
    WINDOW w AS (PARTITION BY event_type ORDER BY window_start
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT event_type, window_start, CAST(cnt AS BIGINT) AS cnt,
       ROUND(cusum, 6) AS cusum,
       CAST(ROUND(cusum, 9) > ROUND(4 * sigma, 9) AS INT) AS is_alarm
FROM cus
""",
)
def q_events_cusum_shifts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM change detection per event type — the sequential
    detector ``events_level_shifts``' docstring called "not
    window-expressible". It is: the clamped recursion
    ``s_i = max(0, s_{i-1} + d_i)`` has the closed form
    ``s_i = S_i - min(0, min_{j<=i} S_j)`` (prefix sum minus running
    minimum of prefix sums), so the whole detector is two
    partitioned-window passes — zero Python, zero sequential state, and
    the plan shuffles once on event_type. d_i = cnt_i - (mu + 0.5*sigma)
    (slack at half a stddev), alarm at h = 4*sigma, both per type.
    Prefix sums evaluate left-to-right in both engines (identical FP
    order), and the alarm compare carries the repo's 9dp cross-engine
    guard."""
    from pyspark.sql import Window

    ev = load_table(spark, "events", sf_dir)
    buckets = ev.groupBy(
        "event_type",
        F.date_format(F.window("ts", "5 minutes")["start"], "yyyy-MM-dd HH:mm:ss").alias(
            "window_start"
        ),
    ).agg(F.count(F.lit(1)).alias("cnt"))
    stats = buckets.groupBy("event_type").agg(
        F.avg("cnt").alias("mu"), F.stddev_pop("cnt").alias("sigma")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("window_start")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    pre = (
        buckets.join(stats, "event_type")
        .withColumn("d", F.col("cnt") - F.col("mu") - 0.5 * F.col("sigma"))
        .withColumn("run_sum", F.sum("d").over(w))
    )
    cus = pre.withColumn(
        "cusum", F.col("run_sum") - F.least(F.lit(0.0), F.min("run_sum").over(w))
    )
    return cus.select(
        "event_type",
        "window_start",
        F.col("cnt").cast("long").alias("cnt"),
        F.round("cusum", 6).alias("cusum"),
        (F.round(F.col("cusum"), 9) > F.round(4 * F.col("sigma"), 9)).cast("int").alias("is_alarm"),
    )


@register(
    "events_stream_attribution",
    """
SELECT p.event_id AS purchase_id, v.event_id AS view_id, p.user_id,
       strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
       strftime(v.ts, '%Y-%m-%d %H:%M:%S') AS view_ts,
       CAST(date_diff('microsecond', v.ts, p.ts) AS BIGINT) AS lag_us
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
JOIN (SELECT event_id, user_id, ts FROM events WHERE event_type = 'view') v
  ON v.user_id = p.user_id
 AND v.ts <= p.ts
 AND v.ts >= p.ts - INTERVAL 240 MINUTE
""",
)
def q_events_stream_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL watermarked stream-stream interval join executed under
    readStream (purchase↔view attribution candidates within 4 hours,
    per user) and drained to completion — the one §2.13 join shape the
    stream-static path can't express, hash-checked row-for-row against
    the batch interval join (Structured Streaming's unified semantics).
    The time-range predicate is what bounds the join STATE: without it a
    stream-stream join holds every view forever."""
    from ..streaming.windows import stream_stream_attribution

    return stream_stream_attribution(spark, sf_dir, lookback_minutes=240)


@register(
    "events_markov_transitions",
    """
WITH seq AS (
    SELECT user_id, ts, event_type,
           LEAD(event_type) OVER w AS next_type,
           LEAD(ts) OVER w AS next_ts
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
trans AS (
    SELECT event_type AS cur_type, next_type
    FROM seq
    WHERE next_type IS NOT NULL
      AND date_diff('second', ts, next_ts) <= 1800
),
cnts AS (
    SELECT cur_type, next_type, COUNT(*) AS cnt FROM trans GROUP BY 1, 2
),
tot AS (SELECT cur_type, SUM(cnt) AS total FROM cnts GROUP BY 1)
SELECT c.cur_type, c.next_type, CAST(c.cnt AS BIGINT) AS cnt,
       ROUND(CAST(c.cnt AS DOUBLE) / t.total, 6) AS prob
FROM cnts c JOIN tot t ON c.cur_type = t.cur_type
""",
)
def q_events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov next-event model over per-user event sequences —
    the transition matrix behind next-item prediction (the sequential
    recommender baseline; companion to the graph recommenders): P(next |
    current) from lead() pairs within a 30-minute gap, the same session
    notion as events_session_windows.

    Scale: one window partitioned by user (no global sort), one
    |types|²-bounded aggregate — the matrix is dimension-sized however
    large the event log. Gap test is integer microsecond arithmetic;
    probabilities are exact-int divisions (engine-identical), 6dp out.
    """
    ev = load_table(spark, "events", sf_dir)
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    seq = ev.select(
        "user_id",
        "ts",
        "event_type",
        F.lead("event_type").over(w).alias("next_type"),
        F.lead("ts").over(w).alias("next_ts"),
    )
    trans = seq.filter(
        F.col("next_type").isNotNull()
        & (F.unix_timestamp("next_ts") - F.unix_timestamp("ts") <= 1800)
    ).select(F.col("event_type").alias("cur_type"), "next_type")
    cnts = trans.groupBy("cur_type", "next_type").agg(F.count(F.lit(1)).alias("cnt"))
    tot = cnts.groupBy("cur_type").agg(F.sum("cnt").alias("total"))
    return cnts.join(tot, "cur_type").select(
        "cur_type",
        "next_type",
        F.col("cnt").cast("long").alias("cnt"),
        F.round(F.col("cnt").cast("double") / F.col("total"), 6).alias("prob"),
    )


@register(
    "events_ewma_daily",
    """
WITH daily AS (
    SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS cnt
    FROM events GROUP BY 1, 2
),
contrib AS (
    SELECT d.event_type,
           d.day + k.k * INTERVAL 1 DAY AS target_day,
           ROUND(ROUND(pow(0.7, k.k - 1), 9) * d.cnt, 9) AS wcnt,
           ROUND(pow(0.7, k.k - 1), 9) AS w
    FROM daily d CROSS JOIN (SELECT UNNEST(range(1, 8)) AS k) k
),
hist AS (
    SELECT event_type, target_day,
           CAST(SUM(CAST(wcnt AS DECIMAL(26,12))) AS DOUBLE) AS num,
           CAST(SUM(CAST(w AS DECIMAL(26,12))) AS DOUBLE) AS den
    FROM contrib GROUP BY 1, 2
)
SELECT d.event_type, strftime(d.day, '%Y-%m-%d') AS day,
       CAST(d.cnt AS BIGINT) AS cnt,
       ROUND(h.num / h.den, 6) AS ewma,
       ROUND(d.cnt / (h.num / h.den), 6) AS ratio,
       CAST(round(d.cnt / (h.num / h.den), 9) > 1.5 AS INT) AS is_burst
FROM daily d JOIN hist h ON h.event_type = d.event_type AND h.target_day = d.day
""",
)
def q_events_ewma_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily per-type event volume against its exponentially-weighted
    7-day history (alpha via 0.7^lag weights, missing days contribute
    nothing to numerator OR denominator), burst-flagged at ratio > 1.5 —
    the seasonal-baseline monitor next to the z-score (events_rate_
    anomalies) and CUSUM (events_cusum_shifts) detectors. The EWMA
    recursion is NOT computed as sequential state: each source day
    scatters its weighted count onto the next 7 calendar days (a 7-way
    explode, corpus-linear) and one keyed aggregate folds them — no
    window over an unbounded frame, no single-partition sort; weights and
    weighted terms follow the 9dp-round + DECIMAL accumulation
    convention, and the burst compare carries the repo's cross-engine
    round-before-threshold guard."""
    ev = load_table(spark, "events", sf_dir)
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    w = F.round(F.pow(F.lit(0.7), F.col("k") - 1), 9)
    contrib = (
        daily.select(
            "event_type",
            "day",
            "cnt",
            F.explode(F.sequence(F.lit(1), F.lit(7))).alias("k"),
        )
        .select(
            "event_type",
            F.date_add("day", F.col("k")).alias("target_day"),
            F.round(w * F.col("cnt"), 9).alias("wcnt"),
            w.alias("w"),
        )
    )
    hist = contrib.groupBy("event_type", "target_day").agg(
        F.sum(F.col("wcnt").cast("decimal(26,12)")).cast("double").alias("num"),
        F.sum(F.col("w").cast("decimal(26,12)")).cast("double").alias("den"),
    )
    ewma = F.col("num") / F.col("den")
    return (
        daily.join(
            hist.withColumnRenamed("target_day", "day"), ["event_type", "day"]
        )
        .select(
            "event_type",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.col("cnt").cast("long").alias("cnt"),
            F.round(ewma, 6).alias("ewma"),
            F.round(F.col("cnt") / ewma, 6).alias("ratio"),
            (F.round(F.col("cnt") / ewma, 9) > 1.5).cast("int").alias("is_burst"),
        )
    )


@register(
    "events_multitouch_attribution",
    """
WITH ordered AS (
    SELECT user_id, event_id, event_type, ts,
           SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS cum_purch
    FROM events
),
convs AS (
    SELECT user_id, cum_purch AS ord FROM ordered WHERE event_type = 'purchase'
),
touches AS (
    SELECT o.user_id, o.event_id, o.event_type, o.ts,
           o.cum_purch + 1 AS ord
    FROM ordered o
    JOIN convs c ON c.user_id = o.user_id AND c.ord = o.cum_purch + 1
    WHERE o.event_type <> 'purchase'
),
pos AS (
    SELECT user_id, event_type, ord,
           ROW_NUMBER() OVER (PARTITION BY user_id, ord ORDER BY ts, event_id) AS r,
           COUNT(*) OVER (PARTITION BY user_id, ord) AS n
    FROM touches
),
weighted AS (
    SELECT event_type,
           CASE WHEN n = 1 THEN 1.0
                WHEN n = 2 THEN 0.5
                WHEN r = 1 OR r = n THEN 0.4
                ELSE round(0.2 / (n - 2), 9)
           END AS w
    FROM pos
)
SELECT event_type AS channel,
       CAST(COUNT(*) AS BIGINT) AS n_touches,
       ROUND(CAST(SUM(CAST(w AS DECIMAL(26,12))) AS DOUBLE), 6) AS attributed_conversions
FROM weighted GROUP BY event_type
""",
)
def q_events_multitouch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-based (40/20/40) multi-touch attribution: every purchase's
    credit splits over the touchpoints since the user's previous purchase
    — 40% first touch, 40% last, 20% spread over the middle (1.0 / 0.5-0.5
    for 1- and 2-touch paths). The batch counterpart of the stream-side
    events_stream_attribution: per-user windows are session-bounded (the
    skew unit is one user's history, never the corpus), the conversion
    scoping is a running purchase count + an equi-join back to conversion
    ordinals — no self-join over the event log — and the fractional
    credits follow the 9dp-round + DECIMAL accumulation convention."""
    ev = load_table(spark, "events", sf_dir)
    win = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = ev.select(
        "user_id",
        "event_id",
        "event_type",
        "ts",
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .over(win.rowsBetween(Window.unboundedPreceding, 0))
        .alias("cum_purch"),
    )
    convs = ordered.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("cum_purch").alias("ord")
    )
    touches = (
        ordered.filter(F.col("event_type") != "purchase")
        .withColumn("ord", F.col("cum_purch") + 1)
        .join(convs, ["user_id", "ord"], "left_semi")
    )
    pw = Window.partitionBy("user_id", "ord")
    pos = touches.select(
        "event_type",
        F.row_number().over(pw.orderBy("ts", "event_id")).alias("r"),
        F.count(F.lit(1)).over(pw).alias("n"),
    )
    w = (
        F.when(F.col("n") == 1, F.lit(1.0))
        .when(F.col("n") == 2, F.lit(0.5))
        .when((F.col("r") == 1) | (F.col("r") == F.col("n")), F.lit(0.4))
        .otherwise(F.round(F.lit(0.2) / (F.col("n") - 2), 9))
    )
    return (
        pos.select("event_type", w.alias("w"))
        .groupBy(F.col("event_type").alias("channel"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_touches"),
            F.round(
                F.sum(F.col("w").cast("decimal(26,12)")).cast("double"), 6
            ).alias("attributed_conversions"),
        )
    )


@register(
    "events_markov_holdout",
    """
WITH seq AS (
    SELECT user_id, ts, event_id, event_type,
           LEAD(event_type) OVER w AS next_type,
           LEAD(ts) OVER w AS next_ts
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
trans AS (
    SELECT user_id, ts, event_id, event_type AS cur_type, next_type
    FROM seq
    WHERE next_type IS NOT NULL
      AND date_diff('second', ts, next_ts) <= 1800
),
ranked AS (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
    FROM trans
),
hold AS (SELECT user_id, cur_type, next_type FROM ranked WHERE rn = 1),
train AS (SELECT cur_type, next_type FROM ranked WHERE rn > 1),
cnts AS (SELECT cur_type, next_type, COUNT(*) AS cnt FROM train GROUP BY 1, 2),
pred AS (
    SELECT cur_type, next_type AS pred_type FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY cur_type ORDER BY cnt DESC, next_type ASC) AS r
        FROM cnts
    ) WHERE r = 1
)
SELECT h.cur_type,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(CASE WHEN p.pred_type = h.next_type THEN 1 ELSE 0 END) AS BIGINT) AS hits,
       ROUND(CAST(SUM(CASE WHEN p.pred_type = h.next_type THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 6) AS hit_rate
FROM hold h JOIN pred p ON p.cur_type = h.cur_type
GROUP BY h.cur_type
""",
)
def q_events_markov_holdout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal-holdout evaluation of the Markov next-event model: each
    user's LAST in-session transition is held out, the argmax-count
    predictor trains on everything earlier (same 1800 s session gap as
    events_markov_transitions), and the per-state hit rate is reported —
    the eval harness that tells you whether the transition matrix is
    worth serving. Holdout states unseen in training drop from the inner
    join on both engines. Per-user windows only (skew unit = one user's
    history); the predictor is a state-cardinality-sized argmax."""
    ev = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.col("event_type").alias("cur_type"),
        F.lead("event_type").over(w).alias("next_type"),
        F.lead("ts").over(w).alias("next_ts"),
    )
    trans = seq.filter(
        F.col("next_type").isNotNull()
        & (F.unix_timestamp("next_ts") - F.unix_timestamp("ts") <= 1800)
    )
    rw = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    ranked = trans.withColumn("rn", F.row_number().over(rw))
    hold = ranked.filter(F.col("rn") == 1).select("user_id", "cur_type", "next_type")
    train = ranked.filter(F.col("rn") > 1).select("cur_type", "next_type")
    cnts = train.groupBy("cur_type", "next_type").agg(F.count(F.lit(1)).alias("cnt"))
    pw = Window.partitionBy("cur_type").orderBy(F.desc("cnt"), F.asc("next_type"))
    pred = (
        cnts.withColumn("r", F.row_number().over(pw))
        .filter(F.col("r") == 1)
        .select("cur_type", F.col("next_type").alias("pred_type"))
    )
    hit = F.when(F.col("pred_type") == F.col("next_type"), 1).otherwise(0)
    return (
        hold.join(pred, "cur_type")
        .groupBy("cur_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_users"),
            F.sum(hit).cast("long").alias("hits"),
            F.round(F.sum(hit).cast("double") / F.count(F.lit(1)), 6).alias("hit_rate"),
        )
    )


@register(
    "events_anomaly_consensus",
    """
WITH daily AS (
    SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS cnt
    FROM events GROUP BY 1, 2
),
stats AS (
    SELECT event_type, AVG(cnt) AS mu, stddev_pop(cnt) AS sigma
    FROM daily GROUP BY event_type
),
contrib AS (
    SELECT d.event_type,
           d.day + k.k * INTERVAL 1 DAY AS target_day,
           ROUND(ROUND(pow(0.7, k.k - 1), 9) * d.cnt, 9) AS wcnt,
           ROUND(pow(0.7, k.k - 1), 9) AS w
    FROM daily d CROSS JOIN (SELECT UNNEST(range(1, 8)) AS k) k
),
hist AS (
    SELECT event_type, target_day,
           CAST(SUM(CAST(wcnt AS DECIMAL(26,12))) AS DOUBLE) AS num,
           CAST(SUM(CAST(w AS DECIMAL(26,12))) AS DOUBLE) AS den
    FROM contrib GROUP BY 1, 2
),
lagd AS (
    SELECT event_type, day, cnt,
           LAG(cnt) OVER (PARTITION BY event_type ORDER BY day) AS prev_cnt
    FROM daily
),
flags AS (
    SELECT l.event_type, l.day, l.cnt,
           CAST(round(abs((l.cnt - s.mu) / NULLIF(s.sigma, 0)), 9) > 2.0 AS INT) AS z_flag,
           CAST(round(l.cnt / (h.num / h.den), 9) > 1.5 AS INT) AS ewma_flag,
           CAST(l.prev_cnt IS NOT NULL AND l.cnt > 2 * l.prev_cnt AS INT) AS jump_flag
    FROM lagd l
    JOIN stats s ON s.event_type = l.event_type
    JOIN hist h ON h.event_type = l.event_type AND h.target_day = l.day
)
SELECT event_type, strftime(day, '%Y-%m-%d') AS day, CAST(cnt AS BIGINT) AS cnt,
       z_flag, ewma_flag, jump_flag,
       CAST(z_flag + ewma_flag + jump_flag AS INT) AS n_detectors,
       CAST(z_flag + ewma_flag + jump_flag >= 2 AS INT) AS consensus
FROM flags
""",
)
def q_events_anomaly_consensus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Detector-ensemble monitoring: three independent daily anomaly
    signals per event type — corpus z-score (|z| > 2), 7-day EWMA burst
    (ratio > 1.5, the events_ewma_daily recursion-as-scatter form), and
    a day-over-day jump (cnt > 2x previous) — plus the >=2-of-3
    consensus flag that production alerting actually pages on (single
    detectors are noisy; the ensemble is the standard fix). Every
    threshold compare carries the repo's round-before-compare guard;
    EWMA terms follow the 9dp+DECIMAL convention; the only window is a
    per-type LAG over ~30 day-rows."""
    ev = load_table(spark, "events", sf_dir)
    daily = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    stats = daily.groupBy("event_type").agg(
        F.avg("cnt").alias("mu"), F.stddev_pop("cnt").alias("sigma")
    )
    wexp = F.round(F.pow(F.lit(0.7), F.col("k") - 1), 9)
    contrib = daily.select(
        "event_type",
        "day",
        "cnt",
        F.explode(F.sequence(F.lit(1), F.lit(7))).alias("k"),
    ).select(
        "event_type",
        F.date_add("day", F.col("k")).alias("target_day"),
        F.round(wexp * F.col("cnt"), 9).alias("wcnt"),
        wexp.alias("w"),
    )
    hist = contrib.groupBy("event_type", "target_day").agg(
        F.sum(F.col("wcnt").cast("decimal(26,12)")).cast("double").alias("num"),
        F.sum(F.col("w").cast("decimal(26,12)")).cast("double").alias("den"),
    )
    lw = Window.partitionBy("event_type").orderBy("day")
    lagd = daily.withColumn("prev_cnt", F.lag("cnt").over(lw))
    ewma = F.col("num") / F.col("den")
    flags = (
        lagd.join(stats, "event_type")
        .join(hist.withColumnRenamed("target_day", "day"), ["event_type", "day"])
        .select(
            "event_type",
            "day",
            "cnt",
            (
                F.round(
                    F.abs((F.col("cnt") - F.col("mu")) / F.nullif(F.col("sigma"), F.lit(0.0))), 9
                )
                > 2.0
            ).cast("int").alias("z_flag"),
            (F.round(F.col("cnt") / ewma, 9) > 1.5).cast("int").alias("ewma_flag"),
            (
                F.col("prev_cnt").isNotNull() & (F.col("cnt") > 2 * F.col("prev_cnt"))
            ).cast("int").alias("jump_flag"),
        )
    )
    nd = F.col("z_flag") + F.col("ewma_flag") + F.col("jump_flag")
    return flags.select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.col("cnt").cast("long").alias("cnt"),
        "z_flag",
        "ewma_flag",
        "jump_flag",
        nd.cast("int").alias("n_detectors"),
        (nd >= 2).cast("int").alias("consensus"),
    )
