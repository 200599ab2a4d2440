"""Event-stream analytics (batch): sessionization, funnels, attribution, time series, anomaly/outlier detection.

Mechanically split from the flat queries.py (r10); see the package
__init__ for conventions. Registration side effects only — import
through ``datagouv_tools_spark.queries``."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ._registry import dec, dround, query, t
from ._common import _SESSION_ORACLE, _SQL_TOKENS

# ---------------------------------------------------------------------------
# Events (JSON props, time-bucketed aggregation, as-of style latest-per-key)
# ---------------------------------------------------------------------------


@query(
    "events_hourly",
    """
    SELECT date_trunc('hour', ts) AS hour, event_type,
           COUNT(*) AS n_events,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window aggregation (batch form of the streaming op in
    streaming/events.py). Scale: one shuffle on (hour, type); at 100 TB
    you'd pre-partition the events source by event date."""
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dround(F.sum(dec("value"))).alias("sum_value"),
        )
        .orderBy("hour", "event_type")
    )


@query(
    "events_json_extract",
    """
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured JSON column access (get_json_object, JVM-side)."""
    ev = t(spark, sf_dir, "events")
    return (
        ev.select(
            "event_type",
            F.get_json_object(F.col("props"), "$.k").cast("bigint").alias("k"),
        )
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("k").alias("sum_k"))
        .orderBy("event_type")
    )


@query(
    "latest_event_per_user",
    """
    SELECT user_id, event_id, ts, event_type FROM (
      SELECT user_id, event_id, ts, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rk
      FROM events
    ) WHERE rk = 1
    ORDER BY user_id
    """,
)
def latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of style 'latest record per key' (the reference has no joins at
    all; this is the engine's point-in-time primitive). Scale: single
    shuffle on user_id; WindowGroupLimit prunes to 1 row per key per
    partition pre-shuffle."""
    from pyspark.sql.window import Window

    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.select("user_id", "event_id", "ts", "event_type", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") == 1)
        .drop("rk")
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# Streaming surface (streaming/windows.py, streaming/stateful.py) — each
# batch query here is the oracle-checkable twin of the streaming operator;
# the *_stream variants run the real Structured Streaming path (availableNow
# replay to a memory sink) against the SAME oracle.
# ---------------------------------------------------------------------------


@query(
    "events_tumbling_15min",
    """
    SELECT time_bucket(INTERVAL '15 minutes', ts) AS window_start,
           time_bucket(INTERVAL '15 minutes', ts) + INTERVAL '15 minutes' AS window_end,
           event_type,
           COUNT(*) AS n_events,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2, 3
    ORDER BY 1, 3
    """,
)
def events_tumbling_15min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling event-time windows (streaming/windows.tumbling_agg) on
    the batch path. Scale: one shuffle on (window, type); with a
    watermark the stream variant's state is bounded."""
    from datagouv_tools_spark.streaming.windows import tumbling_agg

    ev = t(spark, sf_dir, "events")
    return tumbling_agg(
        ev,
        "15 minutes",
        {
            "n_events": F.count(F.lit(1)),
            "sum_value": dround(F.sum(dec("value"))),
        },
        keys=("event_type",),
    ).orderBy("window_start", "event_type")


@query(
    "events_sliding_1h_15min",
    """
    WITH w AS (
      SELECT time_bucket(INTERVAL '15 minutes', ts) - k * INTERVAL '15 minutes' AS window_start,
             value
      FROM events CROSS JOIN (VALUES (0),(1),(2),(3)) AS slots(k)
    )
    SELECT window_start,
           window_start + INTERVAL '1 hour' AS window_end,
           COUNT(*) AS n_events,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_value
    FROM w
    GROUP BY window_start
    ORDER BY window_start
    """,
)
def events_sliding_1h_15min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows, 1 h long advancing every 15 min
    (streaming/windows.sliding_agg): each event lands in 4 windows —
    the SQL twin materializes the 4 slots explicitly."""
    from datagouv_tools_spark.streaming.windows import sliding_agg

    ev = t(spark, sf_dir, "events")
    return sliding_agg(
        ev,
        "1 hour",
        "15 minutes",
        {
            "n_events": F.count(F.lit(1)),
            "sum_value": dround(F.sum(dec("value"))),
        },
    ).orderBy("window_start")


@query("events_session_stats", _SESSION_ORACLE)
def events_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows, 30 min gap, per user
    (streaming/windows.session_agg). A new session starts when
    ts - prev_ts >= gap; window end = last ts + gap — the SQL twin is
    the classic gaps-and-islands (LAG + running SUM). Scale: one
    shuffle on user_id; streaming state = one open session per user."""
    from datagouv_tools_spark.streaming.windows import session_agg

    ev = t(spark, sf_dir, "events")
    return (
        session_agg(
            ev,
            "30 minutes",
            {
                "n_events": F.count(F.lit(1)),
                "sum_value": dround(F.sum(dec("value"))),
            },
            keys=("user_id",),
        )
        .withColumnRenamed("window_start", "session_start")
        .withColumnRenamed("window_end", "session_end")
        .orderBy("user_id", "session_start")
    )


# ---------------------------------------------------------------------------
# Extended relational coverage: as-of join, range join, cube/grouping sets,
# window frames, argmin, correlated aggregates, percentiles
# ---------------------------------------------------------------------------


@query(
    "events_asof_click_view",
    """
    WITH u AS (
      SELECT user_id, ts, event_id,
             CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS is_click,
             CASE WHEN event_type = 'view' THEN event_id END AS vid
      FROM events WHERE event_type IN ('click', 'view')
    ), m AS (
      SELECT user_id, event_id, is_click,
             LAST_VALUE(vid IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, is_click, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS view_id
      FROM u
    )
    SELECT user_id, event_id AS click_id, view_id
    FROM m WHERE is_click = 1
    ORDER BY user_id, click_id
    """,
)
def events_asof_click_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (operators/asof.py): each click matched to the latest
    view of the same user at or before it. Scale: ONE shuffle of
    |clicks|+|views| on user_id — no range cross join, no per-key
    quadratic blow-up."""
    from datagouv_tools_spark.operators.asof import asof_join_backward

    ev = t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts"
    )
    return (
        asof_join_backward(
            clicks, views, on="user_id",
            right_payload=("event_id",), tiebreak="event_id",
        )
        .select(
            "user_id",
            F.col("event_id").alias("click_id"),
            F.col("event_id_asof").alias("view_id"),
        )
        .orderBy("user_id", "click_id")
    )


@query(
    "events_click_view_interval_join",
    """
    SELECT v.user_id,
           c.event_id AS click_id,
           v.event_id AS view_id,
           CAST(ROUND(EXTRACT(epoch FROM c.ts - v.ts), 1) AS DOUBLE) AS lag_s
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON c.user_id = v.user_id
     AND v.ts >= c.ts - INTERVAL '10 minutes'
     AND v.ts <= c.ts
    ORDER BY v.user_id, click_id, view_id
    """,
)
def events_click_view_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join (streaming/joins.interval_join, batch twin): every
    view within 10 minutes BEFORE each click of the same user. On
    streams both sides are watermarked and the interval bounds the
    join state; the stream==batch equivalence is asserted in
    tests/test_streaming.py."""
    from datagouv_tools_spark.streaming.joins import interval_join

    ev = t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("c_ts")
    )
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id"), F.col("event_id").alias("view_id"), F.col("ts").alias("ts")
    )
    joined = interval_join(
        clicks, views, on="user_id", lower="10 minutes", upper="0 seconds",
        left_ts="c_ts", right_ts="ts",
    )
    # NTZ has no numeric cast; go through TimestampType (UTC session)
    lag_s = F.round(
        (
            F.unix_micros(F.col("c_ts").cast("timestamp"))
            - F.unix_micros(F.col("ts").cast("timestamp"))
        )
        / F.lit(1_000_000.0),
        1,
    ).cast("double")
    return joined.select(
        "user_id", "click_id", "view_id", lag_s.alias("lag_s")
    ).orderBy("user_id", "click_id", "view_id")


@query(
    "user_event_type_arrays",
    """
    SELECT user_id,
           array_to_string(list_sort(list(DISTINCT event_type)), ',')
               AS event_types,
           len(list(DISTINCT event_type)) AS n_types
    FROM events
    WHERE user_id < 30
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def user_event_type_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-valued aggregation: per-user sorted distinct event types
    (collect_set -> sort_array gives a deterministic array despite
    partition-order-dependent accumulation). The array is emitted as a
    ','-joined string — the driver's canonicalizer cannot hash an
    array<string> cell (same constraint as ``multimodal_features``);
    the array form remains available inside the plan."""
    ev = t(spark, sf_dir, "events").filter(F.col("user_id") < 30)
    return (
        ev.groupBy("user_id")
        .agg(F.sort_array(F.collect_set("event_type")).alias("_event_types"))
        .select(
            "user_id",
            F.array_join("_event_types", ",").alias("event_types"),
            F.size("_event_types").cast("long").alias("n_types"),
        )
        .orderBy("user_id")
    )


@query(
    "events_value_statistics",
    """
    SELECT event_type,
           COUNT(*) AS n,
           ROUND(AVG(value), 4) AS avg_value,
           ROUND(STDDEV_SAMP(value), 4) AS sd_value,
           ROUND(VAR_SAMP(value), 4) AS var_value,
           ROUND(CORR(value, CAST(json_extract_string(props, '$.k') AS DOUBLE)), 4) AS corr_vk,
           ROUND(COVAR_SAMP(value, CAST(json_extract_string(props, '$.k') AS DOUBLE)), 4) AS covar_vk
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def events_value_statistics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregate coverage: stddev/variance/correlation/
    covariance per group (single shuffle; all are mergeable partial
    aggregates — the distributed accumulation differs from sequential
    by ~1 ULP, absorbed by ROUND to 4)."""
    ev = t(spark, sf_dir, "events")
    # Project the JSON field ONCE before the aggregate: inlining
    # get_json_object inside both corr and covar balloons the generated
    # aggregate-update code (7x slower codegen compile) and parses the
    # JSON twice per row.
    proj = ev.select(
        "event_type",
        "value",
        F.get_json_object("props", "$.k").cast("double").alias("k"),
    )
    return (
        proj.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("value"), 4).alias("avg_value"),
            F.round(F.stddev_samp("value"), 4).alias("sd_value"),
            F.round(F.var_samp("value"), 4).alias("var_value"),
            F.round(F.corr("value", "k"), 4).alias("corr_vk"),
            F.round(F.covar_samp("value", "k"), 4).alias("covar_vk"),
        )
        .orderBy("event_type")
    )


@query(
    "events_conversion_funnel",
    """
    WITH v AS (
      SELECT user_id, MIN(ts) AS tv FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, MIN(ts) AS tc FROM events e JOIN v USING (user_id)
      WHERE event_type = 'click' AND ts > tv GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, MIN(ts) AS tp FROM events e JOIN c USING (user_id)
      WHERE event_type = 'purchase' AND ts > tc GROUP BY e.user_id
    )
    SELECT stage, users FROM (
      SELECT 'stage1_view' AS stage, COUNT(*) AS users FROM v
      UNION ALL SELECT 'stage2_click', COUNT(*) FROM c
      UNION ALL SELECT 'stage3_purchase', COUNT(*) FROM p
    ) ORDER BY stage
    """,
)
def events_conversion_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel: users whose first view precedes a
    click precedes a purchase. The oracle's 3-CTE formulation scans
    events three times; here each stage is a conditional MIN window
    over the SAME user_id partitioning — Catalyst plans ONE exchange
    and three stacked Window nodes, so the fact scans and shuffles
    exactly once at any scale. Timestamp comparisons are exact
    (microsecond integers), so both engines agree."""
    from pyspark.sql.window import Window

    ev = t(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    w = Window.partitionBy("user_id")
    tv = F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
    s1 = ev.withColumn("tv", tv)
    tc = F.min(
        F.when(
            (F.col("event_type") == "click") & (F.col("ts") > F.col("tv")),
            F.col("ts"),
        )
    ).over(w)
    s2 = s1.withColumn("tc", tc)
    tp = F.min(
        F.when(
            (F.col("event_type") == "purchase") & (F.col("ts") > F.col("tc")),
            F.col("ts"),
        )
    ).over(w)
    # groupBy(user_id), not distinct(): rows within a user are identical
    # after the windows, and user_id grouping reuses the windows' hash
    # partitioning — distinct() on all four columns would re-shuffle.
    per_user = (
        s2.withColumn("tp", tp)
        .groupBy("user_id")
        .agg(F.min("tv").alias("tv"), F.min("tc").alias("tc"), F.min("tp").alias("tp"))
    )
    counts = per_user.agg(
        F.count(F.when(F.col("tv").isNotNull(), 1)).alias("n_view"),
        F.count(F.when(F.col("tc").isNotNull(), 1)).alias("n_click"),
        F.count(F.when(F.col("tp").isNotNull(), 1)).alias("n_purchase"),
    )
    return (
        counts.select(
            F.expr(
                "stack(3, 'stage1_view', n_view, 'stage2_click', n_click,"
                " 'stage3_purchase', n_purchase) AS (stage, users)"
            )
        )
        .orderBy("stage")
    )


@query(
    "events_gap_sessions",
    """
    WITH marked AS (
      SELECT user_id, ts,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ),
    sess AS (
      SELECT user_id, ts,
             CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_no
      FROM marked
    )
    SELECT user_id, session_no, COUNT(*) AS n_events,
           MIN(ts) AS session_start, MAX(ts) AS session_end
    FROM sess
    GROUP BY user_id, session_no
    ORDER BY user_id, session_no
    """,
)
def events_gap_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization by inactivity gap (30 min): the classic
    lag -> boundary flag -> running-sum session id, then per-session
    rollup. All three windows AND the final groupBy share the user_id
    hash partitioning, so the fact shuffles once; the sort within
    partitions is reused across the stacked windows. (The streaming
    twin is events_session_stats_stream via session_window.)"""
    from pyspark.sql.window import Window

    ev = t(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    wlag = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(wlag)
    # interval arithmetic, not cast-to-seconds: TIMESTAMP_NTZ has no
    # numeric cast in ANSI Spark 4; ts > prev + 30min == gap > 30min
    new_session = F.when(
        prev.isNull() | (F.col("ts") > prev + F.expr("INTERVAL 30 MINUTES")), 1
    ).otherwise(0)
    marked = ev.withColumn("new_session", new_session)
    wrun = (
        Window.partitionBy("user_id")
        .orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sess = marked.withColumn("session_no", F.sum("new_session").over(wrun))
    return (
        sess.groupBy("user_id", "session_no")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
        .orderBy("user_id", "session_no")
    )


@query(
    "events_weekly_retention",
    """
    WITH first_week AS (
      SELECT user_id, MIN(date_trunc('week', ts)) AS cohort_week
      FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT e.user_id, f.cohort_week,
             CAST(date_diff('week', f.cohort_week, date_trunc('week', e.ts)) AS BIGINT) AS week_no
      FROM events e JOIN first_week f ON e.user_id = f.user_id
    )
    SELECT cohort_week, week_no, COUNT(*) AS active_users
    FROM activity
    WHERE week_no <= 8
    GROUP BY cohort_week, week_no
    ORDER BY cohort_week, week_no
    """,
)
def events_weekly_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users bucketed by first-seen week, counted in
    each subsequent week they return. The cohort assignment is a MIN
    window over the same user_id partitioning as the distinct — one
    fact shuffle for cohorting, one for the (cohort, week) rollup whose
    input is already deduplicated to |users| x |weeks| rows."""
    from pyspark.sql.window import Window

    ev = t(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("week", "ts").alias("week")
    )
    cohort = F.min("week").over(Window.partitionBy("user_id"))
    activity = ev.withColumn("cohort_week", cohort).select(
        "user_id",
        "cohort_week",
        (
            F.floor(
                (F.col("week").cast("double") - F.col("cohort_week").cast("double"))
                / F.lit(7 * 24 * 3600)
            )
        ).alias("week_no"),
    )
    # count_distinct instead of distinct()+count: the partial-distinct
    # happens map-side inside one (cohort, week) aggregation exchange
    # rather than a separate all-columns dedup shuffle.
    return (
        activity.filter(F.col("week_no") <= 8)
        .groupBy("cohort_week", "week_no")
        .agg(F.count_distinct("user_id").alias("active_users"))
        .orderBy("cohort_week", "week_no")
    )


@query(
    "events_value_histogram",
    """
    SELECT event_type,
           CAST(LEAST(FLOOR(value / 25.0), 19) AS BIGINT) AS bucket,
           COUNT(*) AS n,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) AS bucket_sum
    FROM events
    GROUP BY event_type, CAST(LEAST(FLOOR(value / 25.0), 19) AS BIGINT)
    ORDER BY event_type, bucket
    """,
)
def events_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width value histogram per event type (bucket = 25 units,
    capped at 19) — the distribution-profiling primitive behind every
    monitoring dashboard. Scale: bucketing is a map-side expression;
    the shuffle carries (type, bucket) partial counts — cardinality
    |types| x 20 regardless of input size. Determinism: floor of an
    IEEE division of identical doubles, and exact-decimal sums."""
    ev = t(spark, sf_dir, "events")
    bucket = F.least(F.floor(F.col("value") / F.lit(25.0)), F.lit(19)).cast("long")
    return (
        ev.groupBy("event_type", bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            dround(F.sum(dec("value"))).alias("bucket_sum"),
        )
        .orderBy("event_type", "bucket")
    )


@query(
    "user_event_type_bitmask",
    """
    WITH bits AS (
      SELECT user_id,
             CASE event_type WHEN 'click' THEN 1 WHEN 'error' THEN 2
                             WHEN 'purchase' THEN 4 WHEN 'signup' THEN 8
                             WHEN 'view' THEN 16 ELSE 0 END AS bit
      FROM events WHERE user_id < 30
    )
    SELECT user_id,
           CAST(bit_or(bit) AS BIGINT) AS type_mask,
           CAST(bit_count(CAST(bit_or(bit) AS BIGINT)) AS INTEGER) AS n_types
    FROM bits
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def user_event_type_bitmask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise aggregate profile: one bigint bitmask of event types per
    user (bit_or) — the compact set-membership encoding used for
    behavioral cohort filters (mask & wanted = wanted) without arrays
    or joins. One shuffle; the mask merges map-side like any
    commutative aggregate."""
    ev = t(spark, sf_dir, "events").filter(F.col("user_id") < 30)
    bit = (
        F.when(F.col("event_type") == "click", 1)
        .when(F.col("event_type") == "error", 2)
        .when(F.col("event_type") == "purchase", 4)
        .when(F.col("event_type") == "signup", 8)
        .when(F.col("event_type") == "view", 16)
        .otherwise(0)
    )
    return (
        ev.select("user_id", bit.alias("bit"))
        .groupBy("user_id")
        .agg(F.bit_or("bit").cast("bigint").alias("type_mask"))
        .select(
            "user_id",
            "type_mask",
            F.bit_count("type_mask").alias("n_types"),
        )
        .orderBy("user_id")
    )


@query(
    "user_event_transitions",
    """
    WITH seq AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
      FROM events
    )
    SELECT prev_type, event_type AS next_type, COUNT(*) AS n_transitions
    FROM seq WHERE prev_type IS NOT NULL
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def user_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov transition matrix over per-user event sequences (lag →
    pair counts) — the behavioral sequence-mining primitive behind
    next-action models and anomaly screens. Scale: one shuffle on
    user_id for the window; the (prev, next) aggregate reuses partial
    map-side counts; output is |types|² rows regardless of input
    size."""
    from pyspark.sql.window import Window

    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    )
    return (
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n_transitions"))
        .orderBy("prev_type", "next_type")
    )


@query(
    "user_state_intervals",
    """
    WITH seq AS (
      SELECT user_id, event_type, ts, event_id,
             LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
      FROM events WHERE user_id < 20
    ),
    marked AS (
      SELECT user_id, event_type, ts, event_id,
             CASE WHEN prev_type IS NULL OR prev_type <> event_type THEN 1 ELSE 0 END AS chg
      FROM seq
    ),
    grp AS (
      SELECT user_id, event_type, ts,
             CAST(SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS island
      FROM marked
    )
    SELECT user_id, event_type AS state, island,
           MIN(ts) AS valid_from, MAX(ts) AS valid_to, COUNT(*) AS n_events
    FROM grp
    GROUP BY user_id, event_type, island
    ORDER BY user_id, valid_from
    """,
)
def user_state_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: collapse each user's event sequence into
    maximal runs of the same type with validity intervals — the SCD2 /
    state-history primitive (lag → change marker → running island id →
    per-island min/max). Scale: everything rides ONE user_id window
    exchange; the island aggregate reuses the same partitioning."""
    from pyspark.sql.window import Window

    ev = t(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = ev.select(
        "user_id", "event_type", "ts", "event_id",
        F.when(
            F.lag("event_type").over(w).isNull()
            | (F.lag("event_type").over(w) != F.col("event_type")),
            1,
        ).otherwise(0).alias("chg"),
    )
    # the running sum MUST use the same (ts, event_id) total order the
    # chg flags were computed under: a ts-only order leaves tied rows
    # free to permute between the two windows and scramble island ids
    wrun = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    grp = marked.withColumn("island", F.sum("chg").over(wrun).cast("bigint"))
    return (
        grp.groupBy("user_id", F.col("event_type").alias("state"), "island")
        .agg(
            F.min("ts").alias("valid_from"),
            F.max("ts").alias("valid_to"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("user_id", "valid_from")
    )


@query(
    "events_value_deciles",
    """
    WITH ranked AS (
      SELECT value, NTILE(10) OVER (ORDER BY value, event_id) AS decile
      FROM events
    )
    SELECT decile,
           COUNT(*) AS n_events,
           CAST(ROUND(MIN(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) AS lo,
           CAST(ROUND(MAX(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) AS hi
    FROM ranked
    GROUP BY decile
    ORDER BY decile
    """,
)
def events_value_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth histogram via NTILE: ten equal-population value
    buckets with their boundaries — the distribution profile that
    drives range-partitioning and skew decisions. Deterministic: the
    ntile ordering carries an event_id tie-break.

    Scale (r7): the rank comes from the repo's range-partitioned
    two-pass rank (operators/ranking.distributed_row_number) — one
    parallel range shuffle, no Exchange SinglePartition — and NTILE is
    recovered arithmetically from (rank, n): the first n%10 buckets
    hold ceil(n/10) rows, the rest floor(n/10) (the SQL-standard NTILE
    rule, identical in Spark and DuckDB, pinned by the unchanged
    oracle). So the exact equi-depth profile is now itself
    cluster-scalable; events_value_deciles_sketch (end of module) is
    the sampled variant for when even one full sort pass is too much."""
    from datagouv_tools_spark.operators.ranking import distributed_ntile

    ev = t(spark, sf_dir, "events")
    return (
        distributed_ntile(
            ev.select("value", "event_id"),
            10,
            [F.col("value"), F.col("event_id")],
            bucket_col="decile",
        )
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dround(F.min(dec("value"))).alias("lo"),
            dround(F.max(dec("value"))).alias("hi"),
        )
        .orderBy("decile")
    )


@query(
    "events_cdc_snapshot",
    """
    WITH changelog AS (
      SELECT user_id,
             CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
             value, ts, event_id
      FROM events WHERE user_id < 40
    ),
    ranked AS (
      SELECT user_id, op, value, ts,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rk
      FROM changelog
    )
    SELECT user_id,
           CAST(ROUND(CAST(value AS DECIMAL(18,4)), 2) AS DOUBLE) AS value,
           ts
    FROM ranked WHERE rk = 1 AND op <> 'D'
    ORDER BY user_id
    """,
)
def events_cdc_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changelog → snapshot materialization (operators/cdc.
    apply_changelog): events become a keyed upsert/delete feed ('error'
    = tombstone), and the snapshot is each key's latest SURVIVING row —
    deletes drop the key only when the tombstone is the newest record,
    re-inserts after a delete survive. One shuffle on the key with
    WindowGroupLimit pre-pruning; the CDC-merge primitive behind SCD1
    dims and compacted-topic reads."""
    from datagouv_tools_spark.operators.cdc import apply_changelog

    ev = t(spark, sf_dir, "events").filter(F.col("user_id") < 40)
    changelog = ev.select(
        "user_id",
        F.when(F.col("event_type") == "error", "D").otherwise("U").alias("op"),
        "value",
        "ts",
        "event_id",
    )
    snap = apply_changelog(changelog, "user_id", ("ts", "event_id"))
    return snap.select(
        "user_id", dround(dec("value")).alias("value"), "ts"
    ).orderBy("user_id")


@query(
    "events_hourly_interpolated",
    """
    WITH spine AS (
      SELECT t.hour, et.event_type FROM
        (SELECT unnest(generate_series(TIMESTAMP '2024-01-01 00:00:00',
                                       TIMESTAMP '2024-01-03 23:00:00',
                                       INTERVAL '1 hour')) AS hour) t,
        (SELECT DISTINCT event_type FROM events) et
    ),
    hourly AS (
      SELECT time_bucket(INTERVAL '1 hour', ts) AS hour, event_type,
             CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_value
      FROM events
      WHERE ts < TIMESTAMP '2024-01-04 00:00:00' AND user_id < 10
      GROUP BY 1, 2
    ),
    joined AS (
      SELECT s.hour, s.event_type, h.sum_value,
             ROW_NUMBER() OVER (PARTITION BY s.event_type ORDER BY s.hour) AS pos
      FROM spine s LEFT JOIN hourly h ON h.hour = s.hour AND h.event_type = s.event_type
    ),
    ctx AS (
      SELECT hour, event_type, sum_value, pos,
             LAST_VALUE(sum_value IGNORE NULLS) OVER (
               PARTITION BY event_type ORDER BY pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_v,
             LAST_VALUE(CASE WHEN sum_value IS NULL THEN NULL ELSE pos END IGNORE NULLS) OVER (
               PARTITION BY event_type ORDER BY pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_p,
             FIRST_VALUE(sum_value IGNORE NULLS) OVER (
               PARTITION BY event_type ORDER BY pos
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_v,
             FIRST_VALUE(CASE WHEN sum_value IS NULL THEN NULL ELSE pos END IGNORE NULLS) OVER (
               PARTITION BY event_type ORDER BY pos
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_p
      FROM joined
    )
    SELECT hour, event_type,
           CAST(ROUND(CAST(CASE
             WHEN sum_value IS NOT NULL THEN sum_value
             WHEN prev_v IS NULL THEN next_v
             WHEN next_v IS NULL THEN prev_v
             ELSE prev_v + (next_v - prev_v) * (pos - prev_p) / (next_p - prev_p)
           END AS DECIMAL(18,6)), 2) AS DOUBLE) AS filled_value,
           CAST(CASE WHEN sum_value IS NULL THEN 1 ELSE 0 END AS INTEGER) AS interpolated
    FROM ctx
    ORDER BY event_type, hour
    """,
)
def events_hourly_interpolated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap fill with LINEAR INTERPOLATION: densify an
    hourly spine per event type, then fill missing hours between the
    nearest observed neighbors proportionally (endpoints extend).
    The sensor/metrics-pipeline primitive. Determinism: observed sums
    go through exact decimal; the interpolation is the same float
    expression both engines round identically at 2dp. Scale: spine
    broadcast, ONE event_type window partitioning carries both
    direction scans."""
    from pyspark.sql.window import Window

    ev = t(spark, sf_dir, "events").filter(
        (F.col("ts") < "2024-01-04") & (F.col("user_id") < 10)
    )
    hourly = (
        ev.groupBy(
            F.date_trunc("hour", "ts").alias("hour"), "event_type"
        ).agg(dround(F.sum(dec("value"))).alias("sum_value"))
    )
    spark_types = hourly.select("event_type").distinct()
    spine_hours = spark.range(0, 72).select(
        (F.to_timestamp(F.lit("2024-01-01 00:00:00")) + F.make_interval(hours=F.col("id"))).cast("timestamp_ntz").alias("hour")
    )
    spine = F.broadcast(spine_hours).crossJoin(spark_types)
    joined = spine.join(hourly, ["hour", "event_type"], "left")
    wo = Window.partitionBy("event_type").orderBy("hour")
    joined = joined.withColumn("pos", F.row_number().over(wo))
    wb = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wf = wo.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    obs_pos = F.when(F.col("sum_value").isNotNull(), F.col("pos"))
    ctx = joined.select(
        "hour", "event_type", "sum_value", "pos",
        F.last("sum_value", ignorenulls=True).over(wb).alias("prev_v"),
        F.last(obs_pos, ignorenulls=True).over(wb).alias("prev_p"),
        F.first("sum_value", ignorenulls=True).over(wf).alias("next_v"),
        F.first(obs_pos, ignorenulls=True).over(wf).alias("next_p"),
    )
    filled = (
        F.when(F.col("sum_value").isNotNull(), F.col("sum_value"))
        .when(F.col("prev_v").isNull(), F.col("next_v"))
        .when(F.col("next_v").isNull(), F.col("prev_v"))
        .otherwise(
            F.col("prev_v")
            + (F.col("next_v") - F.col("prev_v"))
            * (F.col("pos") - F.col("prev_p"))
            / (F.col("next_p") - F.col("prev_p"))
        )
    )
    return ctx.select(
        "hour", "event_type",
        F.round(filled.cast("decimal(18,6)"), 2).cast("double").alias("filled_value"),
        F.when(F.col("sum_value").isNull(), 1).otherwise(0).alias("interpolated"),
    ).orderBy("event_type", "hour")


@query(
    "events_hourly_anomalies",
    """
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS hr,
             COUNT(*) AS cnt
      FROM events GROUP BY event_type, date_trunc('hour', ts)
    ), win AS (
      SELECT event_type, hr, cnt,
             CAST(SUM(cnt) OVER w AS DECIMAL(38,0)) AS s1,
             SUM(CAST(cnt AS DECIMAL(38,0)) * cnt) OVER w AS s2,
             COUNT(*) OVER w AS n
      FROM hourly
      WINDOW w AS (PARTITION BY event_type ORDER BY hr
                   ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
    ), z AS (
      SELECT event_type, hr, cnt,
             ROUND((cnt - CAST(s1 AS DOUBLE) / 24.0)
                   / sqrt((CAST(s2 AS DOUBLE)
                           - (CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)) / 24.0) / 24.0), 6) AS zscore
      FROM win
      WHERE n = 24 AND (CAST(s2 AS DOUBLE)
                        - (CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)) / 24.0) / 24.0 > 0
    ), ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
                                   ORDER BY zscore DESC, hr) AS rk
      FROM z
    )
    SELECT event_type,
           COUNT(*) AS n_eval,
           CAST(SUM(CASE WHEN zscore > 3.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies,
           MAX(CASE WHEN rk = 1 THEN zscore END) AS max_z,
           MAX(CASE WHEN rk = 1 THEN hr END) AS peak_hour
    FROM ranked
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def events_hourly_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series anomaly detection: per event type, each hour's count
    is z-scored against its trailing 24 OBSERVED hours (rows-frame, so
    gaps don't change the window size), flagging count spikes — the
    ops-monitoring shape over the events stream.

    Determinism without trusting stddev implementations: the trailing
    moment sums s1=Σcnt, s2=Σcnt² are exact BIGINT window sums; mean
    and variance derive from them in one pinned double expression
    ((s2 − s1²/24)/24), and IEEE sqrt is correctly rounded — so both
    engines compute bit-identical z-scores (Spark's stddev_samp and
    DuckDB's use different streaming algorithms and would drift at the
    6th decimal). Peak hour ties break on earliest hour.

    Scale: one shuffle to hourly aggregates (map-side combine over the
    raw scan), one window per event_type over the tiny hourly series —
    the window input is |types| × |hours|, not |events|."""
    from pyspark.sql.window import Window

    ev = t(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hr")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("hr")
        .rowsBetween(-24, -1)
    )
    # exact decimal moment sums (no int64 wrap at any corpus scale),
    # converted to double in ONE pinned expression shared with the SQL
    win = hourly.select(
        "event_type", "hr", "cnt",
        F.sum(F.col("cnt").cast("decimal(38,0)")).over(w).alias("s1"),
        F.sum(F.col("cnt").cast("decimal(38,0)") * F.col("cnt")).over(w).alias("s2"),
        F.count(F.lit(1)).over(w).alias("n"),
    )
    s1d = F.col("s1").cast("double")
    var = (F.col("s2").cast("double") - (s1d * s1d) / F.lit(24.0)) / F.lit(24.0)
    z = (
        win.filter((F.col("n") == 24) & (var > 0))
        .withColumn(
            "zscore",
            F.round(
                (F.col("cnt") - s1d / F.lit(24.0)) / F.sqrt(var), 6
            ),
        )
    )
    rk = Window.partitionBy("event_type").orderBy(
        F.desc("zscore"), F.asc("hr")
    )
    ranked = z.withColumn("rk", F.row_number().over(rk))
    return (
        ranked.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_eval"),
            F.sum((F.col("zscore") > 3.0).cast("int")).cast("bigint").alias("n_anomalies"),
            F.max(F.when(F.col("rk") == 1, F.col("zscore"))).alias("max_z"),
            F.max(F.when(F.col("rk") == 1, F.col("hr"))).alias("peak_hour"),
        )
        .orderBy("event_type")
    )


@query(
    "events_distinct_sketch",
    """
    WITH hv AS (
      SELECT event_type,
             ('0x' || substr(md5(user_id::VARCHAR || ':ds'), 1, 15))::BIGINT AS h
      FROM events
    ), bm AS (
      SELECT event_type, h % 64 AS b, MIN(h // 128) AS mv
      FROM hv GROUP BY event_type, h % 64
    ), sk AS (
      SELECT event_type,
             COUNT(*) AS n_buckets,
             SUM((9007199254740992000 // (mv + 1) - 1000)::DECIMAL(38,0))
               AS est
      FROM bm GROUP BY event_type
    ), ex AS (
      SELECT event_type, COUNT(DISTINCT user_id) AS n_exact
      FROM events GROUP BY event_type
    )
    SELECT ex.event_type, n_exact, n_buckets,
           (est // 1000000000)::BIGINT AS est_mille_hi,
           (est % 1000000000)::BIGINT AS est_mille_lo
    FROM ex JOIN sk USING (event_type)
    ORDER BY ex.event_type
    """,
)
def events_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-count sketch (MinCount / KMV with stochastic
    averaging, Giroire 2005 family): hash each user into one of 64
    buckets, keep the per-bucket MINIMUM of the remaining 53 hash bits,
    and estimate |distinct| as sum_b(2^53/(m_b+1) - 1). The exact
    count rides along for calibration.

    Why this shape at 100 TB: the sketch state is 64 bigints per group
    and MIN is algebraic, so the whole estimate is one map-side-combining
    aggregation — no count-distinct expansion, no second shuffle of raw
    ids, and sketches from different days/partitions merge by taking
    bucket-wise mins (the property HyperLogLog deployments rely on).
    All estimator arithmetic is integer division (term scaled by 1000),
    so the DuckDB oracle reproduces it bit-for-bit — no transcendental
    or float-sum divergence. The exact-count branch exists only for the
    comparison column; a production rollup ships the sketch alone.

    The estimate crosses the correctness harness as TWO BIGINT columns
    (hi = est DIV 1e9, lo = est MOD 1e9) rather than one DECIMAL(38,0):
    the r05 driver run hash-mismatched on the decimal column while the
    Spark, DuckDB, and plain-Python computations were bit-identical
    locally, so no wide decimal is allowed through the value hasher.
    """
    from datagouv_tools_spark.operators.sketches import mincount_buckets

    ev = t(spark, sf_dir, "events")
    bm = mincount_buckets(ev, ["event_type"], F.col("user_id"))
    sk = (
        bm.withColumn(
            "em",
            F.expr("9007199254740992000L DIV (mv + 1) - 1000").cast("decimal(38,0)"),
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.sum("em").alias("est"),
        )
    )
    ex = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_exact")
    )
    return (
        ex.join(sk, "event_type")
        .select(
            "event_type",
            "n_exact",
            "n_buckets",
            F.expr("CAST(est DIV 1000000000 AS BIGINT)").alias("est_mille_hi"),
            F.expr("CAST(est % 1000000000 AS BIGINT)").alias("est_mille_lo"),
        )
        .orderBy("event_type")
    )


@query(
    "events_zorder_cells",
    """
    WITH k AS (
      SELECT user_id AS x, CAST(floor(value) AS BIGINT) AS y, value
      FROM events
    ), z AS (
      SELECT ((SELECT (__sx5)::BIGINT FROM (SELECT ((__sx4 | (__sx4 << 1)) & 6148914691236517205) AS __sx5 FROM (SELECT ((__sx3 | (__sx3 << 2)) & 3689348814741910323) AS __sx4 FROM (SELECT ((__sx2 | (__sx2 << 4)) & 1085102592571150095) AS __sx3 FROM (SELECT ((__sx1 | (__sx1 << 8)) & 71777214294589695) AS __sx2 FROM (SELECT ((__sx0 | (__sx0 << 16)) & 281470681808895) AS __sx1 FROM (SELECT ((x) & 1023)::HUGEINT AS __sx0) AS __qsx0) AS __qsx1) AS __qsx2) AS __qsx3) AS __qsx4) AS __qsx5) | ((SELECT (__sy5)::BIGINT FROM (SELECT ((__sy4 | (__sy4 << 1)) & 6148914691236517205) AS __sy5 FROM (SELECT ((__sy3 | (__sy3 << 2)) & 3689348814741910323) AS __sy4 FROM (SELECT ((__sy2 | (__sy2 << 4)) & 1085102592571150095) AS __sy3 FROM (SELECT ((__sy1 | (__sy1 << 8)) & 71777214294589695) AS __sy2 FROM (SELECT ((__sy0 | (__sy0 << 16)) & 281470681808895) AS __sy1 FROM (SELECT ((y) & 1023)::HUGEINT AS __sy0) AS __qsy0) AS __qsy1) AS __qsy2) AS __qsy3) AS __qsy4) AS __qsy5) << 1)) AS zkey, value
      FROM k
    )
    SELECT zkey // 4096 AS zcell,
           COUNT(*) AS n_events,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_value
    FROM z
    GROUP BY zkey // 4096
    ORDER BY zcell
    """,
)
def events_zorder_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) spatial binning (functions/zorder.py): interleave
    (user_id, floor(value)) into one key and aggregate per coarse
    z-cell — the clustering key `zorder_write` lays files out by, here
    surfaced as a queryable binning so the DuckDB oracle pins the bit
    interleave exactly (same masks, same shifts, both engines).

    Scale: the key is pure JVM bit arithmetic inside codegen; one
    map-side-combining aggregation on the cell id. The layout payoff is
    measured (not asserted by prose) in tests/test_zorder.py: with
    z-ordered files a filter on EITHER dimension prunes most files via
    parquet footer stats, where single-column sort prunes only its own
    column."""
    from datagouv_tools_spark.functions.zorder import morton2

    ev = t(spark, sf_dir, "events")
    k = ev.select(
        F.col("user_id").alias("x"),
        F.floor("value").cast("bigint").alias("y"),
        "value",
    )
    z = k.select(morton2("x", "y", bits=10).alias("zkey"), "value")
    return (
        z.groupBy(F.expr("zkey DIV 4096").alias("zcell"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dround(F.sum(dec("value")), 2).alias("total_value"),
        )
        .orderBy("zcell")
    )


@query(
    "events_sampled_quantiles",
    """
    WITH s AS (
      SELECT event_type, value, event_id
      FROM events
      WHERE ('0x' || substr(md5(event_id::VARCHAR || ':qs'), 1, 15))::BIGINT % 4 = 0
    ), rs AS (
      SELECT event_type, value,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rk,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM s
    ), re AS (
      SELECT event_type, value,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rk,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM events
    ), qs AS (
      SELECT event_type,
             MAX(n) AS n_sample,
             MAX(CASE WHEN rk = CAST(ceil(0.5 * n) AS BIGINT) THEN value END) AS p50_sample,
             MAX(CASE WHEN rk = CAST(ceil(0.9 * n) AS BIGINT) THEN value END) AS p90_sample
      FROM rs GROUP BY event_type
    ), qe AS (
      SELECT event_type,
             MAX(CASE WHEN rk = CAST(ceil(0.5 * n) AS BIGINT) THEN value END) AS p50_exact
      FROM re GROUP BY event_type
    )
    SELECT qs.event_type, n_sample, p50_sample, p90_sample, p50_exact
    FROM qs JOIN qe USING (event_type)
    ORDER BY qs.event_type
    """,
)
def events_sampled_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile estimation over a deterministic hash sample: keep the
    25% of events whose seeded md5 falls in residue class 0 (the same
    rows on every engine, run, and cluster layout — no rand()), then
    take DISCRETE per-type quantiles (rank ceil(q·n), ties broken by
    id) from the sample; the exact median rides along to show the
    error.

    Scale: exact grouped quantiles need a per-group sort of ALL values
    — the sample bounds that sort to the kept fraction, and the kept
    set is stable under repartitioning, so estimates reproduce
    byte-for-byte. Discrete (value-from-the-data) quantiles keep the
    oracle exact: no interpolation arithmetic to diverge. A production
    variant drops the exact branch and tunes the residue modulus to the
    accuracy target (stderr ~ 1/sqrt(f·n))."""
    from pyspark.sql.window import Window

    from datagouv_tools_spark.functions.xhash import md5_hash60

    ev = t(spark, sf_dir, "events").select("event_type", "value", "event_id")
    h = md5_hash60(F.concat(F.col("event_id").cast("string"), F.lit(":qs")))
    s = ev.filter(h % 4 == 0)

    def ranked(df):
        w = Window.partitionBy("event_type").orderBy("value", "event_id")
        wc = Window.partitionBy("event_type")
        return df.select(
            "event_type",
            "value",
            F.row_number().over(w).alias("rk"),
            F.count(F.lit(1)).over(wc).alias("n"),
        )

    def pick(df, q, name):
        at = F.ceil(F.lit(q) * F.col("n")).cast("bigint")
        return F.max(F.when(F.col("rk") == at, F.col("value"))).alias(name)

    rs = ranked(s)
    qs = rs.groupBy("event_type").agg(
        F.max("n").alias("n_sample"),
        pick(rs, 0.5, "p50_sample"),
        pick(rs, 0.9, "p90_sample"),
    )
    re_ = ranked(ev)
    qe = re_.groupBy("event_type").agg(pick(re_, 0.5, "p50_exact"))
    return (
        qs.join(qe, "event_type")
        .select("event_type", "n_sample", "p50_sample", "p90_sample", "p50_exact")
        .orderBy("event_type")
    )


@query(
    "events_hist_quantile_sketch",
    """
    WITH bb AS (
      SELECT event_type,
             LEAST(GREATEST(CAST(floor(value / 25.0) AS INT), 0), 19) AS b
      FROM events
    ), cells AS (
      SELECT event_type, b, COUNT(*) AS c FROM bb GROUP BY event_type, b
    ), cum AS (
      SELECT event_type, b,
             SUM(c) OVER (PARTITION BY event_type ORDER BY b) AS cum,
             SUM(c) OVER (PARTITION BY event_type) AS total
      FROM cells
    )
    SELECT event_type,
           MAX(total)::BIGINT AS total,
           ((MIN(CASE WHEN cum >= (total * 500 + 999) // 1000 THEN b END) + 1) * 25)::BIGINT AS p500,
           ((MIN(CASE WHEN cum >= (total * 900 + 999) // 1000 THEN b END) + 1) * 25)::BIGINT AS p900,
           ((MIN(CASE WHEN cum >= (total * 990 + 999) // 1000 THEN b END) + 1) * 25)::BIGINT AS p990
    FROM cum
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def events_hist_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distribution sketch: per event type, a 20-bin
    fixed-width histogram of ``value`` (operators/sketches.
    histogram_cells — the third sketch family: CMS counts frequencies,
    MinCount counts distincts, this one holds the distribution), with
    p50/p90/p99 estimated as the upper edge of the first bin whose
    cumulative count reaches ⌈q·total⌉ (histogram_quantiles). The
    whole path is integer-exact — bin ids, counts, ranks, edges — so
    the oracle reproduces every estimate bit-for-bit, which no
    float-centroid sketch (t-digest/KLL) could promise. Estimates are
    within one bin width of the true quantile by construction.

    Scale: one map-side-combining aggregation to ≤ |types| × 20 rows;
    the quantile scan runs over that bounded state, never raw events.
    Histograms from different days/shards merge by bin-wise ADD — the
    streaming maintainer (streaming/sketch_maintain.
    histogram_maintain_batch) keeps one continuously fresh under the
    same tag + versioned-store replay discipline as the CMS."""
    from datagouv_tools_spark.operators.sketches import (
        histogram_cells,
        histogram_quantiles,
    )

    ev = t(spark, sf_dir, "events")
    cells = histogram_cells(ev, ["event_type"], F.col("value"))
    return histogram_quantiles(
        cells, ["event_type"], [500, 900, 990]
    ).orderBy("event_type")


@query(
    "events_attribution_last_touch",
    """
    WITH u AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_buy,
             CASE WHEN event_type IN ('click', 'view', 'signup')
                  THEN event_type END AS touch
      FROM events WHERE event_type IN ('click', 'view', 'signup', 'purchase')
    ), m AS (
      SELECT user_id, event_id, value, is_buy,
             LAST_VALUE(touch IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, is_buy, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS channel
      FROM u
    )
    SELECT COALESCE(channel, 'direct') AS channel,
           COUNT(*) AS n_purchases,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE)
             AS attributed_value
    FROM m WHERE is_buy = 1
    GROUP BY COALESCE(channel, 'direct')
    ORDER BY channel
    """,
)
def events_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marketing last-touch attribution: every purchase is credited to
    the user's most recent preceding touch event (click/view/signup;
    'direct' when none), then revenue rolls up per channel. The as-of
    semantics reuse the engine's union + LAST_VALUE(IGNORE NULLS)
    pattern — one window pass instead of a per-purchase point-in-time
    join — with a total (ts, is_buy, event_id) tie-break so same-
    timestamp touches sort before the purchase they precede.

    Scale: one shuffle on user_id for the window (both event classes
    arrive in the SAME exchange — no join of two sorted streams), then
    a tiny-domain channel aggregation with map-side combine. Decimal-
    exact revenue sums keep the hash stable."""
    ev = t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "view", "signup", "purchase")
    )
    from pyspark.sql import Window as W

    u = ev.select(
        "user_id",
        "ts",
        "event_id",
        "value",
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("is_buy"),
        F.when(
            F.col("event_type").isin("click", "view", "signup"),
            F.col("event_type"),
        ).alias("touch"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "is_buy", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    m = u.withColumn("channel", F.last("touch", ignorenulls=True).over(w))
    return (
        m.filter(F.col("is_buy") == 1)
        .groupBy(F.coalesce(F.col("channel"), F.lit("direct")).alias("channel"))
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            dround(F.sum(dec("value"))).alias("attributed_value"),
        )
        .orderBy("channel")
    )


@query(
    "events_cumulative_distinct",
    """
    WITH firsts AS (
      SELECT user_id, MIN(date_trunc('day', ts)) AS day
      FROM events GROUP BY user_id
    ),
    daily AS (SELECT day, COUNT(*) AS new_users FROM firsts GROUP BY day)
    SELECT day, new_users,
           CAST(SUM(new_users) OVER (ORDER BY day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS cum_users
    FROM daily
    ORDER BY day
    """,
)
def events_cumulative_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily new-user counts and the running cumulative distinct-user
    curve — the growth-accounting query every product dashboard runs.
    Distinct-over-time is computed WITHOUT a per-day distinct scan:
    each user collapses to their first-seen day (one groupBy), daily
    news are a second tiny aggregation, and the cumulative curve is a
    running sum over the ~day-domain result.

    Scale: the only full-data shuffle is groupBy(user_id) with map-side
    combine; everything after runs on |days| rows, so the unpartitioned
    running-sum window (single task) touches only the tiny aggregate —
    the pattern that keeps "cumulative distinct" linear instead of the
    O(days × users) repeated-COUNT-DISTINCT trap."""
    ev = t(spark, sf_dir, "events")
    from pyspark.sql import Window as W

    firsts = ev.groupBy("user_id").agg(
        F.min(F.date_trunc("day", F.col("ts"))).alias("day")
    )
    daily = firsts.groupBy("day").agg(F.count(F.lit(1)).alias("new_users"))
    w = W.orderBy("day").rowsBetween(W.unboundedPreceding, W.currentRow)
    return daily.select(
        "day",
        "new_users",
        F.sum("new_users").over(w).alias("cum_users"),
    ).orderBy("day")


@query(
    "events_hourly_seasonal",
    """
    WITH h AS (
      SELECT CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hour_of_day,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(CAST(value AS DECIMAL(18,4)) * 1000 AS BIGINT))
                  AS BIGINT) AS sum_mille
      FROM events
      GROUP BY 1
    ),
    tot AS (
      SELECT CAST(SUM(n) AS BIGINT) AS n_tot,
             CAST(SUM(sum_mille) AS BIGINT) AS sum_tot
      FROM h
    )
    SELECT hour_of_day, n,
           (sum_mille * 1000) // n AS mean_micro,
           ((sum_mille * 1000) // n) * 1000000
             // ((sum_tot * 1000) // n_tot) AS seasonal_index_ppm
    FROM h CROSS JOIN tot
    ORDER BY hour_of_day
    """,
)
def events_hourly_seasonal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day seasonal profile: per-hour event value mean vs the
    overall mean, as an integer ppm index — the seasonality diagnostic
    behind capacity planning and anomaly baselines. Means are built
    from milli-unit integer sums (value has 2-decimal resolution, so
    ×1000 is exact), divided in fixed point — no float sum ordering to
    drift cross-engine.

    Scale: one map-side-combining aggregation into a 24-row domain;
    the totals row is a broadcast cross join. Runs at scan speed on
    any volume."""
    ev = t(spark, sf_dir, "events")
    h = ev.groupBy(
        F.hour("ts").cast("bigint").alias("hour_of_day")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        # decimal-exact milli conversion: value*1000 as DOUBLE truncates
        # in Spark but rounds in DuckDB on .999999 representations
        F.sum((dec("value") * 1000).cast("bigint"))
        .cast("bigint")
        .alias("sum_mille"),
    )
    tot = h.agg(
        F.sum("n").cast("bigint").alias("n_tot"),
        F.sum("sum_mille").cast("bigint").alias("sum_tot"),
    )
    return (
        h.crossJoin(F.broadcast(tot))
        .select(
            "hour_of_day",
            "n",
            F.expr("(sum_mille * 1000) div n").alias("mean_micro"),
            F.expr(
                "((sum_mille * 1000) div n) * 1000000"
                " div ((sum_tot * 1000) div n_tot)"
            ).alias("seasonal_index_ppm"),
        )
        .orderBy("hour_of_day")
    )


def _ewma_oracle() -> str:
    from datagouv_tools_spark.operators.timeseries import ewma_oracle_sql

    pts = """
      SELECT event_type, date_trunc('hour', ts) AS h,
             CAST(COUNT(*) * 1000 AS BIGINT) AS xm
      FROM events GROUP BY 1, 2
    """
    return ewma_oracle_sql(pts, "event_type", "h", "xm", 300)


@query("events_hourly_ewma", _ewma_oracle())
def events_hourly_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average of hourly event volume per
    event type (operators/timeseries.ewma_fold): the smoothing fold
    ``s_t = (300·x_t + 700·s_{t-1}) div 1000`` runs in integer milli
    fixed point inside one Arrow group per series, and DuckDB replays
    the identical recurrence as a recursive CTE — an intrinsically
    sequential operator, still value-hash-checked point by point.

    Scale: raw events collapse to (type, hour) integer aggregates in a
    map-side-combining groupBy FIRST; only those bucket rows (8 760 per
    series-year, kilobytes) shuffle into the per-series fold, whose
    state is O(1). The anomaly/trending baseline every monitoring
    pipeline needs, with none of the float-order drift."""
    from datagouv_tools_spark.operators.timeseries import ewma_fold

    ev = t(spark, sf_dir, "events")
    pts = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("h")
    ).agg((F.count(F.lit(1)) * 1000).cast("bigint").alias("xm"))
    return ewma_fold(pts, "event_type", "h", "xm", 300)


def _debounce_oracle() -> str:
    from datagouv_tools_spark.operators.timeseries import debounce_oracle_sql

    inner = debounce_oracle_sql(
        "SELECT user_id, event_type, ts, event_id FROM events",
        "user_id::VARCHAR || ':' || event_type",
        "ts",
        "event_id",
        600_000_000,
    )
    return f"""
    WITH d AS ({inner})
    SELECT split_part(__k, ':', 2) AS event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(kept) AS BIGINT) AS n_kept,
           CAST(COUNT(*) - SUM(kept) AS BIGINT) AS n_suppressed,
           BIT_XOR(CASE WHEN kept = 1 THEN
             ('0x' || substr(md5(__id::VARCHAR), 1, 15))::BIGINT END)
             AS kept_xor
    FROM d GROUP BY 1 ORDER BY 1"""


@query("events_throttle_debounce", _debounce_oracle())
def events_throttle_debounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Alert-throttle / debounce (operators/timeseries.debounce_fold):
    per (user, event type), keep an event only if ≥10 minutes have
    passed since the last KEPT one — the retry-storm and alert-dedup
    primitive. The kept-state recurrence is NOT a lag() comparison
    (suppressed events must not reset the clock), so it runs as a
    sequential Arrow fold per key, and the recursive-CTE oracle
    replays it event for event; kept_xor folds the exact kept set.

    Scale: one shuffle partitions events by (user, type); each group
    folds with O(1) state in time order. Group size is a single user's
    stream — human-bounded — and a hot synthetic key would shard by
    time range first (the skew discipline of salted_event_type_stats).
    """
    from datagouv_tools_spark.functions.xhash import md5_hash60
    from datagouv_tools_spark.operators.timeseries import debounce_fold

    ev = t(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    marked = debounce_fold(
        ev, ["user_id", "event_type"], "ts", "event_id", 600_000_000
    )
    return (
        marked.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum("kept").cast("bigint").alias("n_kept"),
            (F.count(F.lit(1)) - F.sum("kept"))
            .cast("bigint")
            .alias("n_suppressed"),
            F.expr(
                "bit_xor(case when kept = 1 then"
                " cast(conv(substring(md5(cast(event_id as string)), 1, 15), 16, 10) as bigint) end)"
            ).alias("kept_xor"),
        )
        .orderBy("event_type")
    )


def _holt_oracle() -> str:
    from datagouv_tools_spark.operators.timeseries import holt_oracle_sql

    pts = """
      SELECT event_type, date_trunc('hour', ts) AS h,
             CAST(COUNT(*) * 1000 AS BIGINT) AS xm
      FROM events GROUP BY 1, 2
    """
    inner = holt_oracle_sql(pts, "event_type", "h", "xm", 300, 200)
    return f"""
    WITH holt AS ({inner})
    SELECT event_type, CAST(i AS BIGINT) AS n_hours, level, trend,
           level + 3 * trend AS forecast_3h
    FROM holt
    QUALIFY i = MAX(i) OVER (PARTITION BY event_type)
    ORDER BY event_type"""


@query("events_hourly_holt", _holt_oracle())
def events_hourly_holt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt double exponential smoothing per event type
    (operators/timeseries.holt_fold): level + trend state over the
    hourly volume series (α=0.3, β=0.2 in milli fixed point), reported
    as each series' final state plus a 3-hour-ahead linear forecast —
    the trend-aware upgrade of events_hourly_ewma, with the division
    explicitly truncating so a declining series' negative trend stays
    bit-identical cross-engine (Python floors, the engines truncate).

    Scale: identical shape to the EWMA query — map-side collapse to
    (type, hour), one shuffle to the O(1)-state Arrow fold."""
    from pyspark.sql.window import Window

    from datagouv_tools_spark.operators.timeseries import holt_fold

    ev = t(spark, sf_dir, "events")
    pts = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("h")
    ).agg((F.count(F.lit(1)) * 1000).cast("bigint").alias("xm"))
    holt = holt_fold(pts, "event_type", "h", "xm", 300, 200)
    w = Window.partitionBy("event_type")
    return (
        holt.withColumn("__imax", F.max("i").over(w))
        .filter(F.col("i") == F.col("__imax"))
        .select(
            "event_type",
            F.col("i").cast("bigint").alias("n_hours"),
            "level",
            "trend",
            (F.col("level") + 3 * F.col("trend")).alias("forecast_3h"),
        )
        .orderBy("event_type")
    )


@query(
    "source_vocab_overlap",
    f"""
    WITH ts AS (
      SELECT source, unnest({_SQL_TOKENS.replace("text", "text")}) AS tok
      FROM documents
    ),
    v AS (SELECT DISTINCT source, tok FROM ts),
    sz AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM v GROUP BY source),
    inter AS (
      SELECT a.source AS src_a, b.source AS src_b,
             CAST(COUNT(*) AS BIGINT) AS n_common
      FROM v a JOIN v b ON a.tok = b.tok AND a.source < b.source
      GROUP BY 1, 2
    )
    SELECT src_a, src_b, n_common,
           sa.n AS n_a, sb.n AS n_b,
           CAST(n_common * 1000000 // (sa.n + sb.n - n_common) AS BIGINT)
             AS jaccard_ppm
    FROM inter
    JOIN sz sa ON sa.source = src_a
    JOIN sz sb ON sb.source = src_b
    ORDER BY jaccard_ppm DESC, src_a, src_b
    LIMIT 20
    """,
)
def source_vocab_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise vocabulary Jaccard between sources — the corpus-
    similarity matrix behind domain-mixing decisions (which sources are
    near-redundant, which add coverage). Intersections come from the
    INVERTED-INDEX shape: one equi-join on token of the distinct
    (source, token) list against itself, never a source×source×vocab
    block — the same candidate discipline as the dedup front, since a
    shared token is the only way two sources can intersect.

    Scale: |sources| is small but vocabulary is not; the token join
    fans out only where tokens are shared, and a stopword shared by
    every source contributes |sources|² rows for THAT token only —
    bounded by the source count, not the corpus. Integer ppm Jaccard,
    top-20 by similarity."""
    from datagouv_tools_spark.functions.text import tokens

    docs = t(spark, sf_dir, "documents")
    v = (
        docs.select("source", F.explode(tokens("text")).alias("tok"))
        .distinct()
    )
    sz = v.groupBy("source").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    a = v.select(F.col("source").alias("src_a"), "tok")
    b = v.select(F.col("source").alias("src_b"), "tok")
    inter = (
        a.join(b, "tok")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_common"))
    )
    return (
        inter.join(
            F.broadcast(sz.select(F.col("source").alias("src_a"), F.col("n").alias("n_a"))),
            "src_a",
        )
        .join(
            F.broadcast(sz.select(F.col("source").alias("src_b"), F.col("n").alias("n_b"))),
            "src_b",
        )
        .select(
            "src_a",
            "src_b",
            "n_common",
            "n_a",
            "n_b",
            F.expr("n_common * 1000000 div (n_a + n_b - n_common)")
            .cast("bigint")
            .alias("jaccard_ppm"),
        )
        .orderBy(F.desc("jaccard_ppm"), "src_a", "src_b")
        .limit(20)
    )


@query(
    "events_cusum_alarms",
    """
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS h,
             CAST(COUNT(*) * 1000 AS BIGINT) AS xm
      FROM events GROUP BY 1, 2
    ),
    stats AS (
      SELECT event_type,
             CAST(SUM(xm) // COUNT(*) AS BIGINT) AS mean_m
      FROM hourly GROUP BY event_type
    ),
    y AS (
      SELECT h.event_type, h.h, h.xm,
             h.xm - s.mean_m - s.mean_m // 10 AS yp,
             s.mean_m - h.xm - s.mean_m // 10 AS yn,
             CAST(3 * s.mean_m AS BIGINT) AS thresh
      FROM hourly h JOIN stats s USING (event_type)
    ),
    cum AS (
      SELECT event_type, h, thresh,
             CAST(SUM(yp) OVER w AS BIGINT) AS cp,
             CAST(SUM(yn) OVER w AS BIGINT) AS cn
      FROM y
      WINDOW w AS (PARTITION BY event_type ORDER BY h
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    c AS (
      SELECT event_type, h, thresh,
             CAST(cp - LEAST(MIN(cp) OVER w, 0) AS BIGINT) AS s_pos,
             CAST(cn - LEAST(MIN(cn) OVER w, 0) AS BIGINT) AS s_neg
      FROM cum
      WINDOW w AS (PARTITION BY event_type ORDER BY h
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_hours,
           CAST(SUM(CASE WHEN s_pos > thresh THEN 1 ELSE 0 END) AS BIGINT)
             AS n_pos_alarms,
           CAST(SUM(CASE WHEN s_neg > thresh THEN 1 ELSE 0 END) AS BIGINT)
             AS n_neg_alarms,
           MAX(s_pos) AS max_s_pos,
           MAX(s_neg) AS max_s_neg
    FROM c
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def events_cusum_alarms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point alarms per event type (Page 1954): the
    classic drift detector over the hourly volume series, slack =
    mean/10, threshold = 3·mean, all integer milli. The clamped
    recurrence s_t = max(0, s_{t-1} + y_t) is NOT folded sequentially —
    it is rewritten as prefix_sum − min(0, running-min of prefix sums),
    an exact identity that turns CUSUM into two stacked window passes
    Catalyst keeps in one exchange; both engines evaluate the identical
    windows, so every alarm count is hash-exact.

    Scale: raw events collapse map-side to (type, hour); the windows
    run per series over bucket rows. The window rewrite is the point:
    a sequential fold needs an Arrow kernel, this shape stays entirely
    JVM-side."""
    from pyspark.sql.window import Window

    ev = t(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("h")
    ).agg((F.count(F.lit(1)) * 1000).cast("bigint").alias("xm"))
    stats = hourly.groupBy("event_type").agg(
        F.expr("sum(xm) div count(*)").cast("bigint").alias("mean_m")
    )
    y = hourly.join(F.broadcast(stats), "event_type").select(
        "event_type",
        "h",
        F.expr("xm - mean_m - mean_m div 10").alias("yp"),
        F.expr("mean_m - xm - mean_m div 10").alias("yn"),
        (3 * F.col("mean_m")).cast("bigint").alias("thresh"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = y.select(
        "event_type",
        "h",
        "thresh",
        F.sum("yp").over(w).alias("cp"),
        F.sum("yn").over(w).alias("cn"),
    )
    c = cum.select(
        "event_type",
        "thresh",
        (
            F.col("cp")
            - F.least(F.min("cp").over(w), F.lit(0).cast("bigint"))
        )
        .cast("bigint")
        .alias("s_pos"),
        (
            F.col("cn")
            - F.least(F.min("cn").over(w), F.lit(0).cast("bigint"))
        )
        .cast("bigint")
        .alias("s_neg"),
    )
    return (
        c.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_hours"),
            F.sum(F.when(F.col("s_pos") > F.col("thresh"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_pos_alarms"),
            F.sum(F.when(F.col("s_neg") > F.col("thresh"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_neg_alarms"),
            F.max("s_pos").alias("max_s_pos"),
            F.max("s_neg").alias("max_s_neg"),
        )
        .orderBy("event_type")
    )


@query(
    "events_range_partition_plan",
    """
    WITH ranked AS (
      SELECT value,
             ROW_NUMBER() OVER (ORDER BY value, event_id) AS rk,
             COUNT(*) OVER () AS n
      FROM events
    ),
    bounds AS (
      SELECT CAST(ceil(i * n / 8.0) AS BIGINT) AS cut_rank, i AS b_idx
      FROM (SELECT DISTINCT n FROM ranked)
      CROSS JOIN UNNEST(generate_series(1, 7)) AS g(i)
    ),
    cuts AS (
      SELECT b_idx, value AS cut_value
      FROM bounds JOIN ranked ON ranked.rk = bounds.cut_rank
    ),
    assigned AS (
      SELECT r.value,
             CAST(COALESCE(SUM(CASE WHEN c.cut_value < r.value
                                    THEN 1 ELSE 0 END), 0) AS BIGINT) AS part
      FROM ranked r CROSS JOIN cuts c
      GROUP BY r.value, r.rk
    ),
    parts AS (
      SELECT part, CAST(COUNT(*) AS BIGINT) AS n_rows,
             MIN(value) AS lo, MAX(value) AS hi
      FROM assigned GROUP BY part
    ),
    tot AS (
      SELECT CAST(SUM(n_rows) AS BIGINT) AS nt,
             CAST(MAX(n_rows) AS BIGINT) AS nmax
      FROM parts
    )
    SELECT part, n_rows, lo, hi,
           CAST(n_rows * 1000000 // nt AS BIGINT) AS share_ppm,
           CAST(nmax * 8 * 1000000 // nt AS BIGINT) AS skew_ppm
    FROM parts CROSS JOIN tot
    ORDER BY part
    """,
)
def events_range_partition_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range-partition planning made explicit: the 7 boundary values an
    8-way repartitionByRange would pick (discrete rank-ceil quantiles
    of `value`, id tie-broken), each row assigned to the partition =
    count of boundaries STRICTLY below its value — so duplicate-heavy
    values pile into one partition and the plan's skew_ppm (largest
    partition × partitions / total) measures exactly the imbalance a
    real range shuffle would suffer. The layout-debugging companion to
    the repo's z-order and salting queries.

    Scale (r7): the rank is the range-partitioned two-pass rank
    (operators/ranking.distributed_row_number — no Exchange
    SinglePartition), then a 7-row broadcast of boundary cuts,
    map-local assignment (expressed as a grouped count against
    broadcast cuts), and an 8-row report."""
    from datagouv_tools_spark.operators.ranking import distributed_row_number

    ev = t(spark, sf_dir, "events").select("value", "event_id")
    ranked = distributed_row_number(
        ev, [F.col("value"), F.col("event_id")], rank_col="rk"
    ).select("value", "rk")
    nrow = ev.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    cut_ranks = (
        spark.range(1, 8)
        .select(F.col("id").alias("b_idx"))
        .crossJoin(F.broadcast(nrow))
        .select(
            "b_idx",
            F.ceil(F.col("b_idx") * F.col("n") / 8.0)
            .cast("bigint")
            .alias("cut_rank"),
        )
    )
    cuts = ranked.join(
        F.broadcast(cut_ranks), ranked.rk == cut_ranks.cut_rank
    ).select("b_idx", F.col("value").alias("cut_value"))
    # Map-local boundary assignment (r11): fold the 7 cuts into a
    # single broadcast array row and compute part = #cuts strictly
    # below the value with F.aggregate — no row-grain re-shuffle; the
    # only remaining row-grain exchange is the rank itself.
    cuts_arr = cuts.agg(F.collect_list("cut_value").alias("cut_values"))
    assigned = ranked.crossJoin(F.broadcast(cuts_arr)).select(
        "value",
        F.aggregate(
            F.col("cut_values"),
            F.lit(0).cast("bigint"),
            lambda acc, c: acc
            + F.when(c < F.col("value"), F.lit(1)).otherwise(F.lit(0)),
        ).alias("part"),
    )
    parts = assigned.groupBy("part").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.min("value").alias("lo"),
        F.max("value").alias("hi"),
    )
    tot = parts.agg(
        F.sum("n_rows").cast("bigint").alias("nt"),
        F.max("n_rows").cast("bigint").alias("nmax"),
    )
    return (
        parts.crossJoin(F.broadcast(tot))
        .select(
            "part",
            "n_rows",
            "lo",
            "hi",
            F.expr("n_rows * 1000000 div nt").cast("bigint").alias("share_ppm"),
            F.expr("nmax * 8 * 1000000 div nt").cast("bigint").alias("skew_ppm"),
        )
        .orderBy("part")
    )


_MARKOV_CHANNELS: tuple[str, ...] = ("click", "error", "signup", "view")


def _markov_oracle() -> str:
    from datagouv_tools_spark.operators.markov_attribution import (
        markov_oracle_sql,
    )

    return markov_oracle_sql(_MARKOV_CHANNELS, iters=16)


@query("events_attribution_markov", _markov_oracle())
def events_attribution_markov(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-driven multi-touch attribution by the Markov removal-effect
    model (operators/markov_attribution.py, Anderl et al. 2014): user
    journeys up to first purchase become a transition graph, conversion
    probability comes from a 16-round integer-ppm fixed-point solve,
    and each channel is credited by how much conversion drops when
    walks through it fail. Complements events_attribution_last_touch
    (single-touch) with the standard data-driven alternative; the
    oracle unrolls all five fixed-point chains (base + one per removed
    channel) as CTEs, so the whole solve is value-hash-checked.

    Scale: the distributed work is journey extraction — ONE shuffle on
    user_id for the first-conversion cutoff + LEAD pairing window (no
    self-join) — and a (src, dst) edge count with map-side combine;
    only the ≤(|channels|+3)² transition matrix crosses the driver
    (the BPE-winners bounded-driver pattern), where the five ppm
    solves are O(channels²·iters) scalar work."""
    from datagouv_tools_spark.operators.markov_attribution import (
        markov_removal_attribution,
    )

    ev = t(spark, sf_dir, "events")
    return markov_removal_attribution(ev, _MARKOV_CHANNELS, iters=16)


@query(
    "events_session_concurrency",
    """
    WITH marked AS (
      SELECT user_id, ts,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ),
    sess AS (
      SELECT user_id,
             CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS session_no,
             ts
      FROM marked
    ),
    spans AS (
      SELECT user_id, session_no, MIN(ts) AS s, MAX(ts) AS e
      FROM sess GROUP BY user_id, session_no
    ),
    deltas AS (
      SELECT user_id, session_no, s AS ts, 1 AS delta FROM spans
      UNION ALL
      SELECT user_id, session_no, e AS ts, -1 AS delta FROM spans
    ),
    run AS (
      SELECT date_trunc('day', ts) AS day, ts, delta,
             CAST(SUM(delta) OVER (ORDER BY ts, delta DESC, user_id, session_no
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run
      FROM deltas
    ),
    peaks AS (
      SELECT day, ts, run,
             MAX(run) OVER (PARTITION BY day) AS daypeak
      FROM run
    ),
    per_day AS (
      SELECT day, CAST(MAX(run) AS BIGINT) AS peak_concurrency,
             MIN(ts) AS peak_at
      FROM peaks WHERE run = daypeak GROUP BY day
    ),
    counts AS (
      SELECT date_trunc('day', ts) AS day,
             CAST(SUM(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_opened,
             CAST(SUM(CASE WHEN delta = -1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_closed
      FROM deltas GROUP BY day
    )
    SELECT day, peak_concurrency, peak_at, n_opened, n_closed
    FROM per_day JOIN counts USING (day)
    ORDER BY day
    """,
)
def events_session_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sweep-line concurrency: peak number of simultaneously-open
    30-min-gap sessions per day, with when the peak is first reached
    and the day's open/close traffic. Sessions become ±1 boundary
    deltas; concurrency is the running sum over the global
    (ts, +1-before-−1, user, session) total order — boundary-inclusive
    semantics, so back-to-back sessions at the same instant both count.

    Scale: the GLOBAL running sum is computed as a DISTRIBUTED prefix
    sum — within-day partials ride one day-partitioned window, and the
    cross-day carry is a cumulative offset over the ≤|days| per-day
    totals (a tiny frame whose unpartitioned window is free),
    broadcast back. No single-partition pass ever touches row-grain
    data; peak extraction and open/close counts reuse the same day
    partitioning. The oracle runs the equivalent single window."""
    from pyspark.sql.window import Window

    ev = t(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    wlag = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(wlag)
    new_session = F.when(
        prev.isNull() | (F.col("ts") > prev + F.expr("INTERVAL 30 MINUTES")), 1
    ).otherwise(0)
    wrun = (
        Window.partitionBy("user_id")
        .orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    spans = (
        ev.withColumn("new_session", new_session)
        .withColumn(
            "session_no", F.sum("new_session").over(wrun).cast("bigint")
        )
        .groupBy("user_id", "session_no")
        .agg(F.min("ts").alias("s"), F.max("ts").alias("e"))
    )
    # The ±1 boundary rows are emitted by ONE explode instead of a
    # union of two selects: the union's branches each re-evaluated the
    # whole two-window spans lineage, doubling the sessionization work
    # inside every downstream consumer (measured 4.45 s → 3.37 s
    # interleaved at sf0.1; output rows identical — downstream is
    # order-insensitive). The three delta consumers below (running
    # sum, day offsets, open/close counts) still each run the
    # sessionization — their column pruning specializes the subtrees,
    # so neither static exchange reuse nor AQE's stage cache
    # deduplicates them (verified: 8 distinct runtime shuffle stages)
    # — but an eager localCheckpoint of spans was measured SLOWER
    # (3.97 s) than the recompute it saves at bench scale; a 100 TB
    # deployment would materialize the session-grain spans table once
    # and feed all three consumers from it.
    deltas = spans.select(
        "user_id",
        "session_no",
        F.explode(
            F.array(
                F.struct(F.col("s").alias("ts"), F.lit(1).alias("delta")),
                F.struct(F.col("e").alias("ts"), F.lit(-1).alias("delta")),
            )
        ).alias("b"),
    ).select(
        "user_id",
        "session_no",
        F.col("b.ts").alias("ts"),
        F.col("b.delta").alias("delta"),
        F.date_trunc("day", F.col("b.ts")).alias("day"),
    )
    # distributed prefix sum: within-day partial + cross-day carry
    wday = (
        Window.partitionBy("day")
        .orderBy("ts", F.desc("delta"), "user_id", "session_no")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    partial = deltas.withColumn("run0", F.sum("delta").over(wday))
    woff = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offs = (
        deltas.groupBy("day")
        .agg(F.sum("delta").alias("dsum"))
        .withColumn(
            "offset", F.coalesce(F.sum("dsum").over(woff), F.lit(0))
        )
        .select("day", "offset")
    )
    run = partial.join(F.broadcast(offs), "day").withColumn(
        "run", (F.col("run0") + F.col("offset")).cast("bigint")
    )
    peaks = run.withColumn(
        "daypeak", F.max("run").over(Window.partitionBy("day"))
    )
    per_day = (
        peaks.filter(F.col("run") == F.col("daypeak"))
        .groupBy("day")
        .agg(
            F.max("run").cast("bigint").alias("peak_concurrency"),
            F.min("ts").alias("peak_at"),
        )
    )
    counts = deltas.groupBy("day").agg(
        F.sum((F.col("delta") == 1).cast("long"))
        .cast("bigint")
        .alias("n_opened"),
        F.sum((F.col("delta") == -1).cast("long"))
        .cast("bigint")
        .alias("n_closed"),
    )
    return (
        per_day.join(counts, "day")
        .select("day", "peak_concurrency", "peak_at", "n_opened", "n_closed")
        .orderBy("day")
    )


#: DuckDB twin of source_gram_containment: distinct (source, 6-gram
#: hash) pairs, pairwise intersection by self-join on the hash, per-
#: source totals — identical md5-60bit gram hashes as the Spark side.
_SQL_SRC_CONTAIN_ORACLE = f"""
    WITH d AS (
      SELECT doc_id, source, {_SQL_TOKENS} AS ts FROM documents
    ),
    occ0 AS (
      SELECT source, ts, unnest(generate_series(1, len(ts) - 5)) AS pos
      FROM d WHERE len(ts) >= 6
    ),
    gs AS (
      SELECT DISTINCT source,
             ('0x' || substr(md5(ts[pos] || ' ' || ts[pos+1] || ' ' ||
                                 ts[pos+2] || ' ' || ts[pos+3] || ' ' ||
                                 ts[pos+4] || ' ' || ts[pos+5]), 1, 15))::BIGINT AS gh
      FROM occ0
    ),
    inter AS (
      SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS n_shared
      FROM gs a JOIN gs b ON a.gh = b.gh AND a.source <> b.source
      GROUP BY 1, 2
    ),
    tot AS (SELECT source, COUNT(*) AS n_grams FROM gs GROUP BY source)
    SELECT i.src_a, i.src_b,
           CAST(i.n_shared AS BIGINT) AS n_shared,
           CAST(t.n_grams AS BIGINT) AS n_grams_a,
           CAST(ROUND(i.n_shared::DOUBLE / t.n_grams::DOUBLE, 6) AS DOUBLE)
             AS containment
    FROM inter i JOIN tot t ON t.source = i.src_a
    ORDER BY src_a, src_b
    """


@query("source_gram_containment", _SQL_SRC_CONTAIN_ORACLE)
def source_gram_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise source-containment matrix: for every ordered source
    pair (a, b), the fraction of a's distinct word-6-grams that also
    appear in b — the cross-source duplication signal behind domain
    MIXING decisions (doc_source_mixing): a source largely contained
    in another contributes little marginal data and double-counts its
    distribution mass.

    Scale: the corpus never self-joins — distinct (source, gram-hash)
    pairs reduce to ONE row per gram carrying a bounded set of sources
    (collect_set ≤ n_sources), and ordered pairs explode from that set
    map-side: a gram shared by every source emits n·(n-1) pair rows
    ONCE, not |occurrences|² join rows. Per-source totals are an
    algebraic count; the oracle's self-join twin is the semantics
    statement, not the plan."""
    from datagouv_tools_spark.functions.text import tokens as _toks
    from datagouv_tools_spark.functions.xhash import md5_hash60
    from datagouv_tools_spark.operators.skew import fan_out_narrow_scan

    # per-gram md5 over every 6-gram is compute-bound: unblock the
    # single-split-scan case (guide §2.5; no-op on multi-split inputs)
    docs = fan_out_narrow_scan(t(spark, sf_dir, "documents"))
    base = docs.select("source", _toks("text").alias("ts")).withColumn(
        "n", F.size("ts")
    )
    ts = F.col("ts")

    def gram_hash(i: Column) -> Column:
        return md5_hash60(
            F.concat_ws(
                " ", *[F.element_at(ts, i + F.lit(o)) for o in range(6)]
            )
        )

    gs = (
        base.filter(F.col("n") >= 6)
        .select(
            "source",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.col("n") - F.lit(5)), gram_hash
                )
            ).alias("gh"),
        )
        .distinct()
    )
    sets = gs.groupBy("gh").agg(F.collect_set("source").alias("ss"))
    pair_structs = F.flatten(
        F.transform(
            F.col("ss"),
            lambda a: F.transform(
                F.filter(F.col("ss"), lambda b: b != a),
                lambda b: F.struct(a.alias("src_a"), b.alias("src_b")),
            ),
        )
    )
    inter = (
        sets.select(F.explode(pair_structs).alias("p"))
        .groupBy(F.col("p.src_a").alias("src_a"), F.col("p.src_b").alias("src_b"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared"))
    )
    tot = gs.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_grams_a")
    )
    return (
        inter.join(
            F.broadcast(tot), inter["src_a"] == tot["source"]
        )
        .select(
            "src_a",
            "src_b",
            "n_shared",
            "n_grams_a",
            F.round(
                F.col("n_shared").cast("double")
                / F.col("n_grams_a").cast("double"),
                6,
            ).alias("containment"),
        )
        .orderBy("src_a", "src_b")
    )


@query(
    "events_time_weighted_value",
    """
    WITH nxt AS (
      SELECT event_type, value, epoch_us(ts) AS us,
             LEAD(epoch_us(ts)) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS nus
      FROM events
    ),
    g AS (
      SELECT event_type,
             CAST(value AS DECIMAL(18,4)) AS v,
             CAST((nus - us) // 1000000 AS DECIMAL(18,4)) AS gap_s
      FROM nxt WHERE nus IS NOT NULL
    ),
    agg AS (
      SELECT event_type,
             COUNT(*) AS n_weighted,
             CAST(SUM(gap_s) AS BIGINT) AS total_secs,
             CAST(ROUND(SUM(v * gap_s), 6) AS DOUBLE) AS wsum
      FROM g GROUP BY event_type
    )
    SELECT event_type, n_weighted, total_secs,
           CASE WHEN total_secs > 0
                THEN CAST(ROUND(wsum / CAST(total_secs AS DOUBLE), 6) AS DOUBLE)
                ELSE 0.0 END AS twap
    FROM agg
    ORDER BY event_type
    """,
)
def events_time_weighted_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value (TWAP) over irregular event samples:
    each observation holds until the user's NEXT event, so its weight
    is the gap to the successor — the right mean for sampled state
    (price, queue depth, sensor reading) where arithmetic averaging
    over-weights bursty periods. Last event per user carries no gap
    and is excluded on both sides by contract.

    Scale: one keyed window pass (shuffle on user_id — the same single
    exchange every sessionization query pays), then an algebraic
    per-type aggregation of decimal-exact (value × gap) products;
    gaps are floor-exact integer seconds from microsecond epochs, so
    no engine's interval semantics are involved."""
    from pyspark.sql.window import Window

    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    nxt = ev.select(
        "event_type",
        "value",
        us.alias("us"),
        F.lead(us).over(w).alias("nus"),
    ).filter(F.col("nus").isNotNull())
    g = nxt.select(
        "event_type",
        dec("value").alias("v"),
        F.expr("cast((nus - us) div 1000000 as decimal(18,4))").alias("gap_s"),
    )
    agg = g.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_weighted"),
        F.sum("gap_s").cast("bigint").alias("total_secs"),
        F.round(F.sum(F.col("v") * F.col("gap_s")), 6)
        .cast("double")
        .alias("wsum"),
    )
    return (
        agg.select(
            "event_type",
            "n_weighted",
            "total_secs",
            F.when(
                F.col("total_secs") > 0,
                F.round(
                    F.col("wsum") / F.col("total_secs").cast("double"), 6
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("twap"),
        )
        .orderBy("event_type")
    )


@query(
    "events_partitioned_prune",
    """
    SELECT event_type,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_value
    FROM events
    WHERE CAST(ts AS DATE) >= DATE '2024-01-08'
      AND CAST(ts AS DATE) < DATE '2024-01-15'
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def events_partitioned_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-partitioned lake layout with partition PRUNING — the third
    leg of the layout trilogy (bucketing = join locality, z-order =
    multi-dim skipping, hive-style date partitions = time pruning):
    events are laid out once as `event_date=.../part-*.parquet`, and a
    week-long date predicate prunes every other partition directory
    at PLANNING time — the scan never opens them (plan-guarded:
    PartitionFilters non-empty, files read ≪ files on disk). The
    aggregate is hash-checked against a plain filter oracle — layout
    is answer-invariant by construction.

    Scale: this is THE time-series lake pattern at 100 TB — a day's
    query touches a day's directories regardless of corpus size.
    One repartition by date at write time gives ~1 file per date;
    the read is scan(7 dirs) → partial agg → 1 exchange."""
    import os
    import tempfile

    ev = t(spark, sf_dir, "events")
    base = os.path.join(
        tempfile.gettempdir(),
        "spark_graft_datepart_v1",
        os.path.basename(sf_dir.rstrip("/")),
    )
    marker = os.path.join(base, "_SUCCESS")
    if not os.path.exists(marker):
        (
            ev.withColumn("event_date", F.col("ts").cast("date"))
            .repartition(F.col("event_date"))
            .write.mode("overwrite")
            .partitionBy("event_date")
            .parquet(base)
        )
    part = spark.read.parquet(base).filter(
        (F.col("event_date") >= F.lit("2024-01-08").cast("date"))
        & (F.col("event_date") < F.lit("2024-01-15").cast("date"))
    )
    return (
        part.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            dround(F.sum(dec("value")), 2).alias("total_value"),
        )
        .orderBy("event_type")
    )


@query(
    "user_erasure_cascade",
    """
    WITH survivors AS (
      SELECT * FROM events WHERE user_id % 37 <> 0
    ),
    erased AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_erased
      FROM events WHERE user_id % 37 = 0 GROUP BY event_type
    )
    SELECT s.event_type,
           CAST(COUNT(*) AS BIGINT) AS n_after,
           CAST(ROUND(SUM(CAST(s.value AS DECIMAL(28,6))), 2) AS DOUBLE)
             AS total_after,
           MIN(s.value) AS vmin_after,
           MAX(s.value) AS vmax_after,
           CAST(COALESCE(MAX(e.n_erased), 0) AS BIGINT) AS n_erased
    FROM survivors s LEFT JOIN erased e ON s.event_type = e.event_type
    GROUP BY s.event_type
    ORDER BY s.event_type
    """,
)
def user_erasure_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten CASCADE: an erasure list (every user with
    user_id % 37 = 0) is removed from the event store and the derived
    per-type rollup is repaired by DELTA MAINTENANCE
    (operators/incremental.maintain_rollup) — delete rows become a
    CDC delta, count/sum subtract algebraically, and min/max recompute
    only for dirty keys via a delta-sized semi-join into the surviving
    base. The oracle recomputes everything from scratch over the
    survivors, so the hash match proves the maintained state carries
    no trace of the erased users.

    Scale: erasure at 100 TB cannot re-aggregate the corpus per
    request — the delta costs O(erased rows), the extrema repair
    touches only dirty keys' partitions (pruned/bucketed base), and
    the same delta drives every downstream rollup; this mirrors the
    ANN index's tombstone-delete path on the relational side."""
    from datagouv_tools_spark.operators.incremental import (
        aggregate_base,
        maintain_rollup,
    )

    ev = t(spark, sf_dir, "events")
    is_erased = F.col("user_id") % 37 == 0
    erased = ev.filter(is_erased)
    survivors = ev.filter(~is_erased)
    # the stored rollup state (in production: the persisted MV)
    rollup = aggregate_base(ev, "event_type", "value")
    delta = erased.select(
        "event_type", "value", F.lit("D").alias("op")
    )
    repaired = maintain_rollup(
        rollup, delta, survivors, "event_type", "value"
    )
    n_erased = erased.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_erased")
    )
    return (
        repaired.join(F.broadcast(n_erased), "event_type", "left")
        .select(
            "event_type",
            F.col("n").cast("bigint").alias("n_after"),
            F.round(F.col("total"), 2).cast("double").alias("total_after"),
            F.col("vmin").alias("vmin_after"),
            F.col("vmax").alias("vmax_after"),
            F.coalesce("n_erased", F.lit(0).cast("bigint")).alias(
                "n_erased"
            ),
        )
        .orderBy("event_type")
    )


@query(
    "events_ab_welch",
    """
    WITH m AS (
      SELECT event_type,
             CAST(COUNT(*) FILTER (user_id % 2 = 0) AS BIGINT) AS n_a,
             CAST(COUNT(*) FILTER (user_id % 2 = 1) AS BIGINT) AS n_b,
             CAST(SUM(CAST(value AS DECIMAL(18,4)))
                  FILTER (user_id % 2 = 0) AS DOUBLE) AS s1a,
             CAST(SUM(CAST(value AS DECIMAL(18,4)))
                  FILTER (user_id % 2 = 1) AS DOUBLE) AS s1b,
             CAST(SUM(CAST(value AS DECIMAL(19,4))
                      * CAST(value AS DECIMAL(19,4)))
                  FILTER (user_id % 2 = 0) AS DOUBLE) AS s2a,
             CAST(SUM(CAST(value AS DECIMAL(19,4))
                      * CAST(value AS DECIMAL(19,4)))
                  FILTER (user_id % 2 = 1) AS DOUBLE) AS s2b
      FROM events GROUP BY event_type
    )
    SELECT event_type, n_a, n_b,
           CAST(ROUND(s1a / n_a, 6) AS DOUBLE) AS mean_a,
           CAST(ROUND(s1b / n_b, 6) AS DOUBLE) AS mean_b,
           CAST(ROUND((s1a / n_a - s1b / n_b)
                / sqrt(((s2a - s1a * s1a / n_a) / (n_a - 1.0)) / n_a
                       + ((s2b - s1b * s1b / n_b) / (n_b - 1.0)) / n_b),
                6) AS DOUBLE) AS t_welch,
           CAST(ROUND(
             (((s2a - s1a * s1a / n_a) / (n_a - 1.0)) / n_a
              + ((s2b - s1b * s1b / n_b) / (n_b - 1.0)) / n_b)
             * (((s2a - s1a * s1a / n_a) / (n_a - 1.0)) / n_a
                + ((s2b - s1b * s1b / n_b) / (n_b - 1.0)) / n_b)
             / ((((s2a - s1a * s1a / n_a) / (n_a - 1.0)) / n_a)
                * (((s2a - s1a * s1a / n_a) / (n_a - 1.0)) / n_a)
                / (n_a - 1.0)
                + (((s2b - s1b * s1b / n_b) / (n_b - 1.0)) / n_b)
                  * (((s2b - s1b * s1b / n_b) / (n_b - 1.0)) / n_b)
                  / (n_b - 1.0)),
             4) AS DOUBLE) AS dof
    FROM m ORDER BY event_type""",
)
def events_ab_welch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experiment readout: Welch's unequal-variance t-statistic and
    Welch–Satterthwaite degrees of freedom per event_type, variants
    assigned by the deterministic user_id parity split. Cross-engine
    exact by the repo's moment convention: per-variant n, Σv, Σv² are
    decimal-exact conditional aggregates cast to double, and the t/dof
    formulas are FIXED parenthesized shapes of +,*,/,sqrt over those
    identical doubles — both engines produce the same bits before the
    final ROUND.

    Scale: one scan, six algebraic aggregates per group, map-side
    combined; no shuffle of data rows, only of the per-type moment
    partials — the same always-on cheapness that makes continuous
    experiment monitoring viable on full traffic."""
    ev = t(spark, sf_dir, "events")
    a = F.col("user_id") % 2 == 0
    m = ev.groupBy("event_type").agg(
        F.count(F.when(a, 1)).cast("bigint").alias("n_a"),
        F.count(F.when(~a, 1)).cast("bigint").alias("n_b"),
        F.sum(F.when(a, dec("value"))).cast("double").alias("s1a"),
        F.sum(F.when(~a, dec("value"))).cast("double").alias("s1b"),
        F.sum(F.when(a, dec("value") * dec("value")))
        .cast("double")
        .alias("s2a"),
        F.sum(F.when(~a, dec("value") * dec("value")))
        .cast("double")
        .alias("s2b"),
    )
    na, nb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    s1a, s1b = F.col("s1a"), F.col("s1b")
    s2a, s2b = F.col("s2a"), F.col("s2b")
    va = (s2a - s1a * s1a / na) / (na - F.lit(1.0))
    vb = (s2b - s1b * s1b / nb) / (nb - F.lit(1.0))
    se2 = va / na + vb / nb
    return m.select(
        "event_type",
        "n_a",
        "n_b",
        F.round(s1a / na, 6).cast("double").alias("mean_a"),
        F.round(s1b / nb, 6).cast("double").alias("mean_b"),
        F.round((s1a / na - s1b / nb) / F.sqrt(se2), 6)
        .cast("double")
        .alias("t_welch"),
        F.round(
            se2
            * se2
            / (
                (va / na) * (va / na) / (na - F.lit(1.0))
                + (vb / nb) * (vb / nb) / (nb - F.lit(1.0))
            ),
            4,
        )
        .cast("double")
        .alias("dof"),
    ).orderBy("event_type")


@query(
    "events_dpp_join",
    """
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE)
             AS total_value
    FROM events
    WHERE day(CAST(ts AS DATE)) % 3 = 0
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def events_dpp_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DYNAMIC partition pruning — the runtime sibling of
    events_partitioned_prune's static pruning: the campaign-day filter
    lives on a separate broadcast dimension, so the fact scan cannot
    prune at planning time; Spark instead injects a
    dynamicpruningexpression subquery that evaluates the dim first and
    prunes the date-partitioned fact to the 10 matching directories at
    RUNTIME (plan-guarded). The oracle applies the equivalent date
    predicate directly — the join is answer-invariant to the layout.

    Scale: DPP is what makes star-schema joins against a partitioned
    100 TB fact viable when the partition predicate is only implied by
    a dim filter — without it the scan reads every date directory and
    the filter happens post-join."""
    import datetime
    import os
    import tempfile

    ev = t(spark, sf_dir, "events")
    base = os.path.join(
        tempfile.gettempdir(),
        "spark_graft_datepart_v1",
        os.path.basename(sf_dir.rstrip("/")),
    )
    if not os.path.exists(os.path.join(base, "_SUCCESS")):
        (
            ev.withColumn("event_date", F.col("ts").cast("date"))
            .repartition(F.col("event_date"))
            .write.mode("overwrite")
            .partitionBy("event_date")
            .parquet(base)
        )
    part = spark.read.parquet(base)
    dim = spark.createDataFrame(
        [
            (datetime.date(2024, 1, d), 1 if d % 3 == 0 else 0)
            for d in range(1, 31)
        ],
        "event_date date, is_campaign int",
    )
    return (
        part.join(
            F.broadcast(dim.filter(F.col("is_campaign") == 1)),
            "event_date",
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.countDistinct("event_date").cast("bigint").alias("n_days"),
            dround(F.sum(dec("value")), 2).alias("total_value"),
        )
        .orderBy("event_type")
    )


@query(
    "events_cep_click_purchase",
    """
    WITH e AS (
      SELECT user_id, event_id, event_type, ts FROM events
      WHERE event_type IN ('click', 'purchase', 'error')
    ),
    w AS (
      SELECT user_id, event_type, ts,
             LAST_VALUE(CASE WHEN event_type = 'click' THEN ts END
                        IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS last_click_ts,
             LAST_VALUE(CASE WHEN event_type = 'error' THEN ts END
                        IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS last_error_ts
      FROM e
    ),
    m AS (
      SELECT user_id, event_type,
             CASE WHEN event_type = 'purchase'
                   AND last_click_ts IS NOT NULL
                   AND date_diff('microsecond', last_click_ts, ts)
                       <= 1800000000
                   AND (last_error_ts IS NULL
                        OR last_error_ts < last_click_ts)
              THEN date_diff('microsecond', last_click_ts, ts) END AS lag_us
      FROM w
    )
    SELECT user_id,
           CAST(COUNT(*) FILTER (event_type = 'purchase') AS BIGINT)
             AS n_purchases,
           CAST(COUNT(lag_us) AS BIGINT) AS n_matched,
           CAST(COALESCE(SUM(lag_us), 0) AS BIGINT) AS sum_lag_us
    FROM m
    GROUP BY user_id
    HAVING COUNT(*) FILTER (event_type = 'purchase') > 0
    ORDER BY user_id
    """,
)
def events_cep_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Complex-event-pattern matching — MATCH_RECOGNIZE semantics Spark
    doesn't ship, composed from windows: per user, a purchase MATCHES
    when its most recent preceding click is within 30 minutes and no
    error event interleaves (skip-till-last-click / last-touch
    semantics, ties broken by event_id). Emits per-user purchase
    totals, match counts, and the exact microsecond click→purchase
    latency sum.

    Scale: ONE keyed window pass — the two LAST_VALUE(IGNORE NULLS)
    running states turn the pattern into a linear scan per user
    partition (no self-join, no per-purchase lookback probe); the
    aggregate reuses the window's partitioning, so the fact shuffles
    once on user_id."""
    from pyspark.sql.window import Window

    ev = t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase", "error")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    last_click = F.last(
        F.when(F.col("event_type") == "click", F.col("ts")), ignorenulls=True
    ).over(w)
    last_error = F.last(
        F.when(F.col("event_type") == "error", F.col("ts")), ignorenulls=True
    ).over(w)
    lag_us = F.unix_micros(F.col("ts").cast("timestamp")) - F.unix_micros(
        F.col("last_click_ts").cast("timestamp")
    )
    m = (
        ev.select(
            "user_id",
            "event_type",
            "ts",
            last_click.alias("last_click_ts"),
            last_error.alias("last_error_ts"),
        )
        .select(
            "user_id",
            "event_type",
            F.when(
                (F.col("event_type") == "purchase")
                & F.col("last_click_ts").isNotNull()
                & (lag_us <= 1800000000)
                & (
                    F.col("last_error_ts").isNull()
                    | (F.col("last_error_ts") < F.col("last_click_ts"))
                ),
                lag_us,
            ).alias("lag_us"),
        )
    )
    return (
        m.groupBy("user_id")
        .agg(
            F.count(F.when(F.col("event_type") == "purchase", 1))
            .cast("bigint")
            .alias("n_purchases"),
            F.count("lag_us").cast("bigint").alias("n_matched"),
            F.coalesce(F.sum("lag_us"), F.lit(0))
            .cast("bigint")
            .alias("sum_lag_us"),
        )
        .filter(F.col("n_purchases") > 0)
        .orderBy("user_id")
    )


@query(
    "source_token_drift",
    f"""
    WITH toks AS (
      SELECT source, unnest({_SQL_TOKENS}) AS tok FROM documents
    ),
    ctok AS (
      SELECT tok, CAST(COUNT(*) AS BIGINT) AS c_tok
      FROM toks GROUP BY tok
      ORDER BY c_tok DESC, tok LIMIT 30
    ),
    ctot AS (SELECT CAST(COUNT(*) AS BIGINT) AS c_tot FROM toks),
    stot AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_src
      FROM toks GROUP BY source
    ),
    obs AS (
      SELECT t.source, t.tok, CAST(COUNT(*) AS BIGINT) AS o
      FROM toks t JOIN ctok USING (tok)
      GROUP BY t.source, t.tok
    ),
    grid AS (
      SELECT s.source, c.tok, c.c_tok, s.n_src, COALESCE(obs.o, 0) AS o
      FROM stot s CROSS JOIN ctok c
      LEFT JOIN obs ON obs.source = s.source AND obs.tok = c.tok
    )
    SELECT g.source,
           MAX(g.n_src) AS n_tokens_src,
           CAST(SUM(
             ((g.o * ct.c_tot - g.n_src * g.c_tok)
              * (g.o * ct.c_tot - g.n_src * g.c_tok))
             // (g.n_src * g.c_tok) * 1000000 // ct.c_tot
           ) AS BIGINT) AS chi2_scaled
    FROM grid g, ctot ct
    GROUP BY g.source
    ORDER BY g.source
    """,
)
def source_token_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-DRIFT score per source: a Pearson-χ²-style statistic
    of each source's token distribution against the corpus distribution
    over the global top-30 tokens (deterministic count-then-token
    order), computed ENTIRELY in fixed-point integer arithmetic —
    per-token residuals ((o·C − n·c)² ÷ (n·c) · 10⁶ ÷ C) floor at two
    pinned points and SUM order-free, so no float ever forms. The
    production use: alarm when an incoming shard's score jumps against
    its source's history (vocabulary rot, scraper drift, encoding
    regressions).

    Scale: two aggregations over one exploded token stream (corpus
    counts and per-source×top-token counts, both map-side combined) +
    a 20×30 broadcast grid; the residual grid never exceeds
    |sources| × 30 rows regardless of corpus size."""
    from datagouv_tools_spark.functions.text import tokens as _toks

    toks = (
        t(spark, sf_dir, "documents")
        .select("source", F.explode(_toks("text")).alias("tok"))
        .localCheckpoint(eager=True)
    )
    ctok = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c_tok"))
        .orderBy(F.desc("c_tok"), "tok")
        .limit(30)
    )
    ctot = toks.agg(F.count(F.lit(1)).cast("bigint").alias("c_tot"))
    stot = toks.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_src")
    )
    obs = (
        toks.join(F.broadcast(ctok.select("tok")), "tok")
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("o"))
    )
    grid = (
        stot.crossJoin(F.broadcast(ctok))
        .join(obs, ["source", "tok"], "left")
        .fillna(0, subset=["o"])
        .crossJoin(F.broadcast(ctot))
    )
    resid = F.expr(
        "((o * c_tot - n_src * c_tok) * (o * c_tot - n_src * c_tok))"
        " div (n_src * c_tok) * 1000000 div c_tot"
    )
    return (
        grid.groupBy("source")
        .agg(
            F.max("n_src").alias("n_tokens_src"),
            F.sum(resid).cast("bigint").alias("chi2_scaled"),
        )
        .orderBy("source")
    )


@query(
    "events_outlier_mad",
    """
    WITH med AS (
      SELECT event_type, MEDIAN(value) AS med
      FROM events GROUP BY event_type
    ),
    dev AS (
      SELECT e.event_type, m.med, ABS(e.value - m.med) AS adev
      FROM events e JOIN med m USING (event_type)
    ),
    mad AS (
      SELECT event_type, MAX(med) AS med, MEDIAN(adev) AS mad
      FROM dev GROUP BY event_type
    )
    SELECT d.event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(MAX(m.med), 4) AS median_value,
           ROUND(MAX(m.mad), 4) AS mad_value,
           CAST(COUNT(*) FILTER (d.adev > 3 * m.mad) AS BIGINT)
             AS n_outliers
    FROM dev d JOIN mad m USING (event_type)
    GROUP BY d.event_type
    ORDER BY d.event_type
    """,
)
def events_outlier_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection by MEDIAN ABSOLUTE DEVIATION: per
    event_type, flag values more than 3 MADs from the median — the
    estimator that survives the very outliers a mean/stddev rule gets
    dragged by. Every cross-engine float op is a single IEEE
    subtraction/multiply/compare (no accumulation), so the outlier
    counts match bit-for-bit; medians interpolate identically in both
    engines.

    Scale: exact MAD is honestly TWO passes (median, then median of
    deviations) with a broadcast of the 5-row median table between —
    the streaming-friendly variant swaps each median for the mergeable
    histogram sketch (events_hist_quantile_sketch), same plan shape,
    one pass."""
    ev = t(spark, sf_dir, "events").select("event_type", "value")
    med = ev.groupBy("event_type").agg(F.median("value").alias("med"))
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type", "med", F.abs(F.col("value") - F.col("med")).alias("adev")
    )
    mad = dev.groupBy("event_type").agg(
        F.max("med").alias("med"), F.median("adev").alias("mad")
    )
    return (
        dev.join(F.broadcast(mad.select("event_type", "mad")), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.round(F.max("med"), 4).alias("median_value"),
            F.round(F.max("mad"), 4).alias("mad_value"),
            F.count(F.when(F.col("adev") > 3 * F.col("mad"), 1))
            .cast("bigint")
            .alias("n_outliers"),
        )
        .orderBy("event_type")
    )


def _kmv_setops_oracle() -> str:
    est = (
        "SUM((9007199254740992000 // (mv + 1) - 1000)::DECIMAL(38,0))"
    )
    return f"""
    WITH pairs AS (
      SELECT * FROM (VALUES ('click', 'view'), ('click', 'purchase'),
                            ('view', 'purchase')) p(type_a, type_b)
    ),
    hv AS (
      SELECT event_type, user_id,
             ('0x' || substr(md5(user_id::VARCHAR || ':ds'), 1, 15))::BIGINT
               AS h
      FROM events WHERE event_type IN ('click', 'view', 'purchase')
    ),
    bm AS (
      SELECT event_type, h % 64 AS b, MIN(h // 128) AS mv
      FROM hv GROUP BY event_type, h % 64
    ),
    sk AS (SELECT event_type, {est} AS est FROM bm GROUP BY event_type),
    un AS (
      SELECT p.type_a, p.type_b, b.b, MIN(b.mv) AS mv
      FROM pairs p JOIN bm b
        ON b.event_type = p.type_a OR b.event_type = p.type_b
      GROUP BY p.type_a, p.type_b, b.b
    ),
    sku AS (
      SELECT type_a, type_b, {est} AS est_u
      FROM un GROUP BY type_a, type_b
    ),
    ex AS (
      SELECT p.type_a, p.type_b,
             COUNT(DISTINCT CASE WHEN h.event_type = p.type_a
                                 THEN h.user_id END) AS nx_a,
             COUNT(DISTINCT CASE WHEN h.event_type = p.type_b
                                 THEN h.user_id END) AS nx_b,
             COUNT(DISTINCT h.user_id) AS nx_union
      FROM pairs p JOIN hv h
        ON h.event_type = p.type_a OR h.event_type = p.type_b
      GROUP BY p.type_a, p.type_b
    )
    SELECT e.type_a, e.type_b,
           CAST(e.nx_a AS BIGINT) AS nx_a,
           CAST(e.nx_b AS BIGINT) AS nx_b,
           CAST(e.nx_union AS BIGINT) AS nx_union,
           CAST(e.nx_a + e.nx_b - e.nx_union AS BIGINT) AS nx_intersect,
           CAST(sa.est AS VARCHAR) AS est_a_mille,
           CAST(sb.est AS VARCHAR) AS est_b_mille,
           CAST(u.est_u AS VARCHAR) AS est_union_mille,
           CAST(sa.est + sb.est - u.est_u AS VARCHAR) AS est_intersect_mille
    FROM ex e
    JOIN sk sa ON sa.event_type = e.type_a
    JOIN sk sb ON sb.event_type = e.type_b
    JOIN sku u ON u.type_a = e.type_a AND u.type_b = e.type_b
    ORDER BY e.type_a, e.type_b"""


@query("events_user_kmv_setops", _kmv_setops_oracle())
def events_user_kmv_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch SET ALGEBRA on the mergeable KMV/MinCount state: per
    event-type pair, the union's distinct-user estimate comes from the
    bucket-wise MIN of the two stored sketches (the KMV merge — no
    rescan of either side), and the intersection estimate follows by
    inclusion-exclusion on the mille-scaled integer estimates (exact
    DECIMAL arithmetic; emitted as VARCHAR so no decimal crosses the
    harness). Exact counts ride along so the estimation error is
    visible.

    Scale: THE audience-overlap primitive — once per-segment sketches
    exist (64 bigints each), any pairwise/n-way union or
    inclusion-exclusion intersection is pure sketch arithmetic,
    touching zero raw events; the exact columns here are the audit
    that would be sampled, not computed, at 100 TB."""
    from datagouv_tools_spark.operators.sketches import mincount_buckets

    types = ["click", "view", "purchase"]
    pairs = spark.createDataFrame(
        [("click", "view"), ("click", "purchase"), ("view", "purchase")],
        "type_a string, type_b string",
    )
    ev = t(spark, sf_dir, "events").filter(F.col("event_type").isin(types))
    bm = mincount_buckets(
        ev, ["event_type"], F.col("user_id"), n_buckets=64
    ).localCheckpoint(eager=True)
    # integer floor of 2^53·1000/(mv+1) via bigint div (decimal
    # division would round); mv+1 ≤ 2^53 keeps the div exact
    sk = (
        bm.select(
            "event_type",
            F.expr(
                "cast(9007199254740992000 div (mv + 1) - 1000"
                " as decimal(38,0))"
            ).alias("term"),
        )
        .groupBy("event_type")
        .agg(F.sum("term").cast("decimal(38,0)").alias("est"))
    )
    # The literal 3-row pairs side MUST carry the broadcast hint: an
    # RDD-backed literal has no stats, so Spark estimates it huge and
    # would otherwise build the nested-loop hash on the EVENTS side —
    # fine at sf0.001, an executor OOM at scale (caught by the r11
    # bnlj_unbounded planaudit gate).
    un = (
        F.broadcast(pairs).join(
            bm,
            (F.col("event_type") == F.col("type_a"))
            | (F.col("event_type") == F.col("type_b")),
        )
        .groupBy("type_a", "type_b", "b")
        .agg(F.min("mv").alias("mv"))
        .select(
            "type_a",
            "type_b",
            F.expr(
                "cast(9007199254740992000 div (mv + 1) - 1000"
                " as decimal(38,0))"
            ).alias("term"),
        )
        .groupBy("type_a", "type_b")
        .agg(F.sum("term").cast("decimal(38,0)").alias("est_u"))
    )
    hv = ev.select("event_type", "user_id")
    ex = (
        F.broadcast(pairs).join(
            hv,
            (F.col("event_type") == F.col("type_a"))
            | (F.col("event_type") == F.col("type_b")),
        )
        .groupBy("type_a", "type_b")
        .agg(
            F.countDistinct(
                F.when(F.col("event_type") == F.col("type_a"),
                       F.col("user_id"))
            ).cast("bigint").alias("nx_a"),
            F.countDistinct(
                F.when(F.col("event_type") == F.col("type_b"),
                       F.col("user_id"))
            ).cast("bigint").alias("nx_b"),
            F.countDistinct("user_id").cast("bigint").alias("nx_union"),
        )
    )
    sa = sk.select(F.col("event_type").alias("type_a"), F.col("est").alias("ea"))
    sb = sk.select(F.col("event_type").alias("type_b"), F.col("est").alias("eb"))
    return (
        ex.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .join(F.broadcast(un), ["type_a", "type_b"])
        .select(
            "type_a",
            "type_b",
            "nx_a",
            "nx_b",
            "nx_union",
            (F.col("nx_a") + F.col("nx_b") - F.col("nx_union"))
            .cast("bigint")
            .alias("nx_intersect"),
            F.col("ea").cast("string").alias("est_a_mille"),
            F.col("eb").cast("string").alias("est_b_mille"),
            F.col("est_u").cast("string").alias("est_union_mille"),
            (F.col("ea") + F.col("eb") - F.col("est_u"))
            .cast("decimal(38,0)")
            .cast("string")
            .alias("est_intersect_mille"),
        )
        .orderBy("type_a", "type_b")
    )


@query(
    "events_schema_evolution_merge",
    """
    WITH v1 AS (
      SELECT event_id, user_id, event_type,
             CAST(NULL AS DOUBLE) AS value, 1 AS schema_v
      FROM events WHERE event_id % 2 = 0
    ),
    v2 AS (
      SELECT event_id, user_id, event_type, value, 2 AS schema_v
      FROM events WHERE event_id % 2 = 1
    ),
    merged AS (SELECT * FROM v1 UNION ALL SELECT * FROM v2)
    SELECT schema_v,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(value) AS BIGINT) AS n_value_present,
           CAST(COUNT(*) - COUNT(value) AS BIGINT) AS n_value_null,
           CAST(ROUND(SUM(CAST(COALESCE(value, 0) AS DECIMAL(18,4))), 2)
                AS DOUBLE) AS total_value
    FROM merged
    GROUP BY schema_v
    ORDER BY schema_v
    """,
)
def events_schema_evolution_merge(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """SCHEMA EVOLUTION on the lake: generation-1 files were written
    before the `value` column existed (even event_ids), generation-2
    files carry it (odd event_ids); one mergeSchema read unifies both
    generations, null-filling the missing column — and the per-schema
    audit (row counts, value presence, decimal-exact totals) pins the
    merge semantics. The oracle simulates the two generations with
    typed NULL projection.

    Scale: schema merge is a FOOTER operation (one schema union across
    file footers, no data rewrite) — the property that lets a 100 TB
    table add columns without a backfill; the audit is one scan of the
    merged view."""
    import os
    import tempfile

    ev = t(spark, sf_dir, "events")
    base = os.path.join(
        tempfile.gettempdir(),
        "spark_graft_schemaevo_v1",
        os.path.basename(sf_dir.rstrip("/")),
    )
    g1, g2 = os.path.join(base, "gen=1"), os.path.join(base, "gen=2")
    if not os.path.exists(os.path.join(g1, "_SUCCESS")):
        (
            ev.filter(F.col("event_id") % 2 == 0)
            .select("event_id", "user_id", "event_type")
            .write.mode("overwrite")
            .parquet(g1)
        )
    if not os.path.exists(os.path.join(g2, "_SUCCESS")):
        (
            ev.filter(F.col("event_id") % 2 == 1)
            .select("event_id", "user_id", "event_type", "value")
            .write.mode("overwrite")
            .parquet(g2)
        )
    merged = spark.read.option("mergeSchema", "true").parquet(g1, g2)
    return (
        merged.withColumn(
            "schema_v",
            F.when(F.col("event_id") % 2 == 0, 1).otherwise(2),
        )
        .groupBy("schema_v")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.count("value").cast("bigint").alias("n_value_present"),
            (F.count(F.lit(1)) - F.count("value"))
            .cast("bigint")
            .alias("n_value_null"),
            dround(F.sum(dec(F.coalesce(F.col("value"), F.lit(0.0)))), 2)
            .alias("total_value"),
        )
        .orderBy("schema_v")
    )


@query(
    "events_compaction_audit",
    """
    SELECT CAST(64 AS BIGINT) AS n_files_before,
           CAST(4 AS BIGINT) AS n_files_after,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT event_id) AS BIGINT) AS n_ids,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE)
             AS total_value
    FROM events
    """,
)
def events_compaction_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-files COMPACTION with a content-invariance audit: the
    events table is first written as 64 tiny files (the
    streaming-ingest pathology), compacted by a repartition rewrite to
    4 right-sized files, and the audit row pins (a) the actual file
    counts on disk before/after — asserted in-query, surfaced as
    columns — and (b) rows / distinct ids / decimal-exact totals over
    the COMPACTED copy, hash-equal to reading the original table:
    compaction moved bytes, not data.

    Scale: small files are the top silent killer of 100 TB scans (one
    task + one open per file); compaction is one shuffle-free-read →
    repartition → write pass, idempotent under re-run, and the audit
    is the cheap invariant every compaction job should ship with."""
    import glob
    import os
    import tempfile

    ev = t(spark, sf_dir, "events")
    base = os.path.join(
        tempfile.gettempdir(),
        "spark_graft_compact_v1",
        os.path.basename(sf_dir.rstrip("/")),
    )
    small, big = os.path.join(base, "small"), os.path.join(base, "compact")
    if not os.path.exists(os.path.join(small, "_SUCCESS")):
        ev.repartition(64).write.mode("overwrite").parquet(small)
    if not os.path.exists(os.path.join(big, "_SUCCESS")):
        (
            spark.read.parquet(small)
            .repartition(4)
            .write.mode("overwrite")
            .parquet(big)
        )
    n_before = len(glob.glob(os.path.join(small, "part-*")))
    n_after = len(glob.glob(os.path.join(big, "part-*")))
    assert n_before == 64 and n_after == 4, (n_before, n_after)
    compacted = spark.read.parquet(big)
    return compacted.agg(
        F.lit(n_before).cast("bigint").alias("n_files_before"),
        F.lit(n_after).cast("bigint").alias("n_files_after"),
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.countDistinct("event_id").cast("bigint").alias("n_ids"),
        dround(F.sum(dec("value")), 2).alias("total_value"),
    )


_SHAPLEY_CHANNELS = [("click", 1), ("view", 2), ("signup", 4), ("error", 8)]


#: |S|!·(4−|S|−1)!/4! scaled by 24, indexed by |S|
_SHAPLEY_W24 = {0: 6, 1: 2, 2: 2, 3: 6}


def _shapley_terms(bit: int) -> list[tuple[int, int, int]]:
    """(w24, S, S|bit) for every S ⊆ C\\{bit}, in ascending-S order —
    the PINNED left-fold order both engines sum in."""
    out = []
    for s in range(16):
        if s & bit:
            continue
        out.append((_SHAPLEY_W24[bin(s).count("1")], s, s | bit))
    return out


def _shapley_oracle() -> str:
    chan_bits = " ".join(
        f"WHEN '{name}' THEN {b}" for name, b in _SHAPLEY_CHANNELS
    )
    def v(m: int) -> str:
        return (
            f"(SELECT COALESCE(MAX(CAST(k AS DOUBLE) / n), 0.0)"
            f" FROM coal WHERE mask = {m})"
        )

    rows = []
    for name, bit in _SHAPLEY_CHANNELS:
        expr = None
        for w, s, si in _shapley_terms(bit):
            term = f"{w} * ({v(si)} - {v(s)})"
            expr = term if expr is None else f"({expr}) + {term}"
        rows.append(
            f"""SELECT '{name}' AS channel,
           CAST(ROUND(({expr}) / 24, 6) AS DOUBLE) AS shapley_v"""
        )
    union = "\n    UNION ALL\n    ".join(rows)
    return f"""
    WITH fp AS (
      SELECT user_id, MIN(ts) AS fp_ts
      FROM events WHERE event_type = 'purchase' GROUP BY user_id
    ),
    touch AS (
      SELECT e.user_id,
             CASE e.event_type {chan_bits} ELSE 0 END AS bit,
             CASE WHEN f.fp_ts IS NOT NULL THEN 1 ELSE 0 END AS conv
      FROM events e LEFT JOIN fp f USING (user_id)
      WHERE e.event_type <> 'purchase'
        AND (f.fp_ts IS NULL OR e.ts < f.fp_ts)
    ),
    urow AS (
      SELECT user_id, bit_or(bit) AS mask, MAX(conv) AS conv
      FROM touch GROUP BY user_id
    ),
    coal AS (
      SELECT mask, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(conv) AS BIGINT) AS k
      FROM urow WHERE mask > 0 GROUP BY mask
    )
    {union}
    ORDER BY channel"""


@query("events_shapley_attribution", _shapley_oracle())
def events_shapley_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT Shapley-value attribution over observed channel
    coalitions: each user's pre-conversion touch set becomes a 4-bit
    coalition mask, coalition conversion rates v(S) come from exact
    counts (unobserved coalitions impute v=0 — the standard
    observed-coalition simplification), and each channel's Shapley
    value is the exact 8-term weighted marginal sum, folded in pinned
    ascending-mask order so both engines produce identical doubles
    before the round. The game-theoretic answer to "which channel
    earns the conversion credit" — complementing last-touch
    (events_attribution_last_touch) and Markov removal
    (events_attribution_markov).

    Scale: ONE pass builds user masks (bit_or per user), coalition
    stats are ≤ 2⁴ rows, and the Shapley fold is constant work — at
    any event volume the cost is the mask aggregation."""
    ev = t(spark, sf_dir, "events")
    fp = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ts").alias("fp_ts"))
    )
    bit = F.when(F.col("event_type") == "click", 1)
    for name, b in _SHAPLEY_CHANNELS[1:]:
        bit = bit.when(F.col("event_type") == name, b)
    bit = bit.otherwise(0)
    touch = (
        ev.filter(F.col("event_type") != "purchase")
        .join(fp, "user_id", "left")
        .filter(F.col("fp_ts").isNull() | (F.col("ts") < F.col("fp_ts")))
        .select(
            "user_id",
            bit.alias("bit"),
            F.when(F.col("fp_ts").isNotNull(), 1).otherwise(0).alias("conv"),
        )
    )
    urow = touch.groupBy("user_id").agg(
        F.bit_or("bit").alias("mask"), F.max("conv").alias("conv")
    )
    coal = {
        int(r["mask"]): (int(r["n"]), int(r["k"]))
        for r in urow.filter(F.col("mask") > 0)
        .groupBy("mask")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("conv").alias("k"),
        )
        .collect()
    }

    def v(m: int) -> float:
        if m in coal and coal[m][0] > 0:
            n, k = coal[m]
            return float(k) / n
        return 0.0

    def round_half_away(x: float, nd: int = 6) -> float:
        # DuckDB/Spark ROUND is half-away-from-zero; Python's round()
        # is banker's — replicate the SQL semantics exactly
        import math

        scale = 10**nd
        return (
            math.floor(x * scale + 0.5) / scale
            if x >= 0
            else -math.floor(-x * scale + 0.5) / scale
        )

    out = []
    for name, b in _SHAPLEY_CHANNELS:
        acc = None
        for w, s, si in _shapley_terms(b):
            term = w * (v(si) - v(s))
            acc = term if acc is None else acc + term
        out.append((name, round_half_away(acc / 24)))
    return spark.createDataFrame(
        out, "channel string, shapley_v double"
    ).orderBy("channel")


@query(
    "events_dau_stickiness",
    """
    WITH days AS (
      SELECT DISTINCT CAST(ts AS DATE) AS d FROM events
    ),
    ud AS (
      SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events
    )
    SELECT CAST(days.d AS VARCHAR) AS day,
           CAST(COUNT(DISTINCT CASE WHEN ud.d = days.d
                                    THEN ud.user_id END) AS BIGINT) AS dau,
           CAST(COUNT(DISTINCT CASE WHEN ud.d > days.d - 7
                                    THEN ud.user_id END) AS BIGINT) AS wau,
           CAST(COUNT(DISTINCT CASE WHEN ud.d > days.d - 30
                                    THEN ud.user_id END) AS BIGINT) AS mau,
           CAST(COUNT(DISTINCT CASE WHEN ud.d = days.d
                                    THEN ud.user_id END) * 1000
                // COUNT(DISTINCT CASE WHEN ud.d > days.d - 30
                                       THEN ud.user_id END) AS BIGINT)
             AS stickiness_mille
    FROM days JOIN ud ON ud.d <= days.d AND ud.d > days.d - 30
    GROUP BY days.d
    ORDER BY day
    """,
)
def events_dau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The product-analytics staple: DAU / trailing-7-day WAU /
    trailing-30-day MAU distinct users per day, plus the DAU/MAU
    stickiness ratio in exact mille — the engagement dashboard row. The
    (day, user) relation is deduplicated FIRST, so the trailing windows
    join day-grain rows, not raw events.

    Scale: |days × trailing-window| day-user rows feed one conditional
    distinct aggregate — at 100 TB the exact distincts swap for the
    per-day KMV sketches (events_user_kmv_setops' union merge gives any
    trailing window from 30 daily sketches), same output contract."""
    ev = t(spark, sf_dir, "events")
    ud = ev.select(
        F.col("ts").cast("date").alias("d"), "user_id"
    ).distinct()
    days = ud.select("d").distinct().withColumnRenamed("d", "day_d")
    j = days.join(
        ud,
        (F.col("d") <= F.col("day_d"))
        & (F.col("d") > F.date_sub(F.col("day_d"), 30)),
    )
    return (
        j.groupBy(F.col("day_d").cast("string").alias("day"))
        .agg(
            F.countDistinct(
                F.when(F.col("d") == F.col("day_d"), F.col("user_id"))
            )
            .cast("bigint")
            .alias("dau"),
            F.countDistinct(
                F.when(
                    F.col("d") > F.date_sub(F.col("day_d"), 7),
                    F.col("user_id"),
                )
            )
            .cast("bigint")
            .alias("wau"),
            F.countDistinct("user_id").cast("bigint").alias("mau"),
        )
        .select(
            "day",
            "dau",
            "wau",
            "mau",
            F.expr("cast(dau * 1000 div mau as bigint)").alias(
                "stickiness_mille"
            ),
        )
        .orderBy("day")
    )


@query(
    "events_value_deciles_sketch",
    """
    WITH s AS (
      SELECT value, event_id FROM events
      WHERE ('0x' || substr(md5(event_id::VARCHAR || ':dq'), 1, 15))::BIGINT
            % 16 = 0
    ),
    rs AS (
      SELECT value, event_id,
             ROW_NUMBER() OVER (ORDER BY value, event_id) AS rk,
             COUNT(*) OVER () AS n
      FROM s
    ),
    b AS (
      SELECT value AS bv, event_id AS bid
      FROM rs
      WHERE rk IN ((1*n+9)//10, (2*n+9)//10, (3*n+9)//10, (4*n+9)//10,
                   (5*n+9)//10, (6*n+9)//10, (7*n+9)//10, (8*n+9)//10,
                   (9*n+9)//10)
    ),
    a AS (
      SELECT e.event_id, e.value,
             1 + SUM(CASE WHEN b.bv < e.value
                            OR (b.bv = e.value AND b.bid < e.event_id)
                     THEN 1 ELSE 0 END) AS decile
      FROM events e CROSS JOIN b
      GROUP BY e.event_id, e.value
    )
    SELECT CAST(decile AS BIGINT) AS decile,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(ROUND(MIN(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) AS lo,
           CAST(ROUND(MAX(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) AS hi
    FROM a
    GROUP BY decile
    ORDER BY decile
    """,
)
def events_value_deciles_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scale path for events_value_deciles: decile BOUNDARIES come
    from a deterministic 1/16 hash sample (seeded md5 residue — the
    same rows on every engine, run, and cluster layout, the
    events_sampled_quantiles discipline), the full table is then
    assigned map-locally against the 9 broadcast boundary tuples, and
    the per-decile population/lo/hi report reads off one
    map-side-combining aggregation. Populations are ~n/10 ± sampling
    error (pytest pins the bound at sf0.1) instead of exactly n/10 —
    the trade that deletes the full-data sort entirely.

    Scale: the only sort anywhere is the range-partitioned two-pass
    rank over the SAMPLE (operators/ranking.distributed_row_number —
    no single-partition funnel even there); boundary selection is a
    9-row filter; assignment is a 1-row-broadcast array scan inside
    codegen (comparisons only — no float arithmetic crosses engines);
    tune the residue modulus to the accuracy target (boundary-rank
    stderr ~ n·sqrt(f(1-f)/n_s) rows at sampling fraction f)."""
    from datagouv_tools_spark.functions.xhash import md5_hash60
    from datagouv_tools_spark.operators.ranking import (
        distributed_row_number_total,
    )

    ev = t(spark, sf_dir, "events").select("value", "event_id")
    h = md5_hash60(F.concat(F.col("event_id").cast("string"), F.lit(":dq")))
    rs, ns = distributed_row_number_total(
        ev.filter(h % 16 == 0),
        [F.col("value"), F.col("event_id")],
        rank_col="rk",
        # pin: the 1/16 sample (2 narrow columns) materializes once
        # instead of re-running the scan+hash-filter for the sampler
        pin_input=True,
    )
    # The DuckDB twin's CROSS JOIN against an empty boundary set yields
    # an empty result; here every event would land in decile 1 instead.
    # At any real scale factor the 1/16 sample is never empty — fail
    # loudly rather than diverge silently on degenerate inputs.
    if ns == 0:
        raise ValueError(
            "events_value_deciles_sketch: empty 1/16 sample — input too "
            "small for the sketch (use events_value_deciles instead)"
        )
    cut = " OR ".join(f"rk = ({d}*{ns}+9) div 10" for d in range(1, 10))
    barr = (
        rs.filter(F.expr(cut))
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col("value").alias("bv"),
                        F.col("event_id").alias("bid"),
                    )
                )
            ).alias("bs")
        )
    )
    assigned = ev.crossJoin(F.broadcast(barr)).select(
        "value",
        (
            F.lit(1)
            + F.expr(
                "size(filter(bs, b -> b.bv < value"
                " OR (b.bv = value AND b.bid < event_id)))"
            )
        )
        .cast("bigint")
        .alias("decile"),
    )
    return (
        assigned.groupBy("decile")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            dround(F.min(dec("value"))).alias("lo"),
            dround(F.max(dec("value"))).alias("hi"),
        )
        .orderBy("decile")
    )
