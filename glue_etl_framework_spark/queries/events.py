"""Time-windowed operators over the events table (SURVEY.md §2.9).

ABSENT in the reference (strictly batch, no readStream anywhere in
glue_etl_framework.py) — this is the EXT streaming-capable surface, built
batch-first so the DuckDB oracle applies; the same expressions run under
Structured Streaming in glue_etl_framework_spark.streaming (readStream +
watermark + availableNow replaces Glue job bookmarks,
glue_etl_framework.py:101).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from glue_etl_framework_spark.queries import register, t


@register(
    "tumbling_window_agg",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) / 100.0 AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    category="time-window",
)
def tumbling_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling window — groupBy(F.window(...)): identical code path
    for batch and streaming."""
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            (F.sum(F.round(F.col("value") * 100).cast("long")) / 100.0).alias("total_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "event_type", "n_events", "total_value",
        )
    )


@register(
    "sliding_window_agg",
    oracle="""
    WITH b AS (SELECT time_bucket(INTERVAL '5 minutes', ts) AS tb, user_id, value FROM events)
    SELECT ws AS window_start,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM b, UNNEST([tb, tb - INTERVAL '5 minutes']) AS u(ws)
    GROUP BY ws
    """,
    category="time-window",
)
def sliding_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-minute window sliding every 5 — each event lands in exactly two
    windows; the oracle reproduces that with an UNNEST of the two
    epoch-aligned starts."""
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "10 minutes", "5 minutes"))
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .select(F.col("window.start").alias("window_start"), "n_events", "n_users")
    )


@register(
    "session_window_agg",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts, value,
             CASE WHEN LAG(ts) OVER w IS NULL
                    OR ts - LAG(ts) OVER w >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
      SELECT user_id, ts, value,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM marked
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 30 MINUTE AS session_end,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) / 100.0 AS session_value
    FROM sessions
    GROUP BY user_id, sid
    """,
    category="time-window",
)
def session_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows with a 30-minute gap (F.session_window — a new
    session starts when the gap since the previous event reaches 30min;
    window end = last event + gap). The oracle rebuilds the same semantics
    with LAG + running-sum session ids."""
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(
            F.count("*").alias("n_events"),
            (F.sum(F.round(F.col("value") * 100).cast("long")) / 100.0).alias("session_value"),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events", "session_value",
        )
    )


@register(
    "watermark_late_filter",
    oracle="""
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_recent
    FROM events
    WHERE ts >= (SELECT MAX(ts) FROM events) - INTERVAL 7 DAY
    GROUP BY event_type
    """,
    category="time-window",
)
def watermark_late_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch equivalent of a 7-day watermark: drop rows older than
    max(event time) - delay. In streaming this is df.withWatermark(ts, ...)
    (glue_etl_framework_spark.streaming)."""
    e = t(spark, sf_dir, "events")
    e.createOrReplaceTempView("__wm_events")
    return spark.sql(
        """
        SELECT event_type, COUNT(*) AS n_recent
        FROM __wm_events
        WHERE ts >= (SELECT MAX(ts) FROM __wm_events) - INTERVAL 7 DAY
        GROUP BY event_type
        """
    )


@register(
    "event_dedup_first",
    oracle="""
    SELECT user_id, event_type, MIN(ts) AS first_ts,
           CAST(COUNT(*) AS BIGINT) AS n_dupes
    FROM events
    GROUP BY user_id, event_type
    """,
    category="time-window",
)
def event_dedup_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-first dedup per (user, type) — the batch shape of streaming
    dropDuplicates-with-watermark; exposed as first-event + dupe count so
    the result is deterministic."""
    e = t(spark, sf_dir, "events")
    return e.groupBy("user_id", "event_type").agg(
        F.min("ts").alias("first_ts"), F.count("*").alias("n_dupes")
    )


@register(
    "event_funnel_conversion",
    oracle="""
    WITH s AS (
      SELECT user_id, MIN(ts) FILTER (WHERE event_type = 'signup') AS first_signup
      FROM events GROUP BY user_id
    ),
    p AS (
      SELECT e.user_id, MIN(e.ts) AS first_purchase
      FROM events e JOIN s ON e.user_id = s.user_id
      WHERE e.event_type = 'purchase' AND e.ts >= s.first_signup
      GROUP BY e.user_id
    )
    SELECT s.user_id, s.first_signup, p.first_purchase,
           CASE WHEN p.first_purchase IS NOT NULL THEN 1 ELSE 0 END AS converted
    FROM s LEFT JOIN p ON s.user_id = p.user_id
    WHERE s.first_signup IS NOT NULL
    """,
    category="time-window",
)
def event_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-step funnel (signup -> first purchase at-or-after it) per user:
    conditional MIN for step 1, a key-equi-join with a range predicate for
    step 2, left join for the conversion flag. Both joins and all three
    aggregates shuffle only on user_id — the same single key — so AQE can
    reuse/coalesce those exchanges; nothing is per-event-pair."""
    e = t(spark, sf_dir, "events")
    s = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias("first_signup")
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(s, "user_id")
        .filter(F.col("ts") >= F.col("first_signup"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_purchase"))
    )
    return (
        s.filter(F.col("first_signup").isNotNull())
        .join(p, "user_id", "left")
        .select(
            "user_id",
            "first_signup",
            "first_purchase",
            F.when(F.col("first_purchase").isNotNull(), 1).otherwise(0).alias("converted"),
        )
    )


@register(
    "window_range_time_rolling",
    oracle="""
    WITH e AS (
      SELECT event_id, user_id, value,
             CAST(FLOOR(date_part('epoch', ts)) AS BIGINT) AS sec
      FROM events
    )
    SELECT event_id, user_id,
           CAST(COUNT(*) OVER w AS BIGINT) AS n_last_10min,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER w AS BIGINT) / 100.0 AS value_last_10min
    FROM e
    WINDOW w AS (PARTITION BY user_id ORDER BY sec
                 RANGE BETWEEN 600 PRECEDING AND CURRENT ROW)
    """,
    category="time-window",
)
def window_range_time_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 10-minute per-user window via a RANGE frame over epoch
    seconds — the time-based frame spec (SURVEY §2.5 RANGE BETWEEN) applied
    to event time. One shuffle on user_id + a partition-local sort; the
    frame is evaluated by a sliding aggregate, never a self-join. Epoch
    seconds are floor-truncated identically in both engines."""
    e = t(spark, sf_dir, "events")
    sec = F.col("ts").cast("long")
    w = W.partitionBy("user_id").orderBy("sec").rangeBetween(-600, 0)
    return (
        e.select("event_id", "user_id", "value", sec.alias("sec"))
        .select(
            "event_id",
            "user_id",
            F.count("*").over(w).alias("n_last_10min"),
            (F.sum(F.round(F.col("value") * 100).cast("long")).over(w) / 100.0).alias(
                "value_last_10min"
            ),
        )
    )


@register(
    "event_pattern_detect",
    oracle="""
    WITH seq AS (
      SELECT user_id,
             string_agg(event_type, '>' ORDER BY ts, event_id) AS path,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM events GROUP BY user_id
    )
    SELECT user_id, n_events,
           CASE WHEN regexp_matches(path, 'view>(.*>)?click') THEN 1 ELSE 0 END AS saw_view_then_click,
           CASE WHEN regexp_matches(path, 'signup>(.*>)?purchase') THEN 1 ELSE 0 END AS converted_after_signup
    FROM seq
    """,
    category="time-window",
)
def event_pattern_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral sequence detection: order each user's events by time
    (ties broken by event_id for full determinism), join into a path
    string, and regex-match funnels — MATCH_RECOGNIZE-style analysis with
    one shuffle on user_id. The ordered collect is a sort_array over
    (ts, event_id) structs, not a window + groupBy double-shuffle."""
    e = t(spark, sf_dir, "events")
    ordered = F.transform(
        F.sort_array(F.collect_list(F.struct("ts", "event_id", "event_type"))),
        lambda s: s["event_type"],
    )
    path = F.array_join(ordered, ">")
    return (
        e.groupBy("user_id")
        .agg(path.alias("path"), F.count("*").alias("n_events"))
        .select(
            "user_id",
            "n_events",
            F.when(F.col("path").rlike("view>(.*>)?click"), 1).otherwise(0).alias("saw_view_then_click"),
            F.when(F.col("path").rlike("signup>(.*>)?purchase"), 1).otherwise(0).alias("converted_after_signup"),
        )
    )


@register(
    "events_gap_fill",
    oracle="""
    WITH bounds AS (
      SELECT user_id, MIN(ts::DATE) AS d0, MAX(ts::DATE) AS d1
      FROM events GROUP BY user_id
    ),
    spine AS (
      SELECT user_id, unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day
      FROM bounds
    ),
    counts AS (
      SELECT user_id, ts::DATE AS day, COUNT(*) AS n
      FROM events GROUP BY user_id, ts::DATE
    )
    SELECT s.user_id, strftime(s.day, '%Y-%m-%d') AS day,
           CAST(COALESCE(c.n, 0) AS BIGINT) AS n_events
    FROM spine s
    LEFT JOIN counts c ON c.user_id = s.user_id AND c.day = s.day
    """,
    category="events",
)
def events_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar gap-fill (date spine): per user, one row per day between
    that user's first and last event, zero-filling days with no events —
    the standard densify step before rolling features on sparse activity.
    The spine is generated DISTRIBUTED (sequence+explode per key, never a
    driver-side calendar loop); the left join is an equi-join on
    (user_id, day) so AQE can pick broadcast when the counts side is
    small. At 100 TB the spine size is keys x days — bounded and
    predictable, independent of event volume."""
    e = t(spark, sf_dir, "events").select("user_id", F.to_date("ts").alias("day"))
    bounds = e.groupBy("user_id").agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    spine = bounds.select(
        "user_id",
        F.explode(F.sequence("d0", "d1", F.expr("interval 1 day"))).alias("day"),
    )
    counts = e.groupBy("user_id", "day").agg(F.count("*").alias("n"))
    return (
        spine.join(counts, ["user_id", "day"], "left")
        .select(
            "user_id",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.coalesce("n", F.lit(0)).cast("long").alias("n_events"),
        )
    )


SESSION_GAP_MIN = 30  # minutes of inactivity that closes a session


@register(
    "events_sessionize_gap",
    oracle=f"""
    WITH us AS (
      SELECT user_id, event_id, value, epoch_us(ts) AS tus FROM events
    ),
    marked AS (
      SELECT user_id, event_id, value, tus,
             CASE WHEN tus - LAG(tus) OVER (PARTITION BY user_id ORDER BY tus, event_id)
                       > {SESSION_GAP_MIN} * 60 * 1000000
                  THEN 1 ELSE 0 END AS new_session
      FROM us
    ),
    numbered AS (
      SELECT user_id, value, tus,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY tus, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_no
      FROM marked
    )
    SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents,
           CAST((MAX(tus) - MIN(tus)) // 1000000 AS BIGINT) AS duration_s
    FROM numbered
    GROUP BY user_id, session_no
    """,
    category="events",
)
def events_sessionize_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization the MANUAL way (lag + running sum of
    session-break flags), complementing the built-in F.session_window
    (session_window_agg): this formulation also yields a stable per-user
    session NUMBER and works when session identity must join back to other
    tables. Both windows share ONE shuffle (same partition key user_id,
    same ordering — Catalyst plans a single Exchange + sort). All time
    arithmetic is integer MICROSECONDS (unix_micros both engines) so gap
    comparison and duration are exact; value sums use integer cents. At
    100 TB per-user partitions are small; skewed power-users are the known
    hazard (salt or pre-split by day if one user exceeds a partition)."""
    e = t(spark, sf_dir, "events")
    us = e.select("user_id", "event_id", "value", F.unix_micros("ts").alias("tus"))
    w_ord = W.partitionBy("user_id").orderBy("tus", "event_id")
    gap_us = F.col("tus") - F.lag("tus").over(w_ord)
    marked = us.select(
        "user_id", "event_id", "value", "tus",
        F.when(gap_us > SESSION_GAP_MIN * 60 * 1_000_000, 1).otherwise(0).alias("new_session"),
    )
    numbered = marked.withColumn(
        "session_no",
        F.sum("new_session").over(w_ord.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )
    return (
        numbered.groupBy("user_id", F.col("session_no").cast("long").alias("session_no"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("value_cents"),
            ((F.max("tus") - F.min("tus")) / 1_000_000).cast("long").alias("duration_s"),
        )
    )


@register(
    "events_retention_cohorts",
    oracle="""
    WITH firsts AS (
      SELECT user_id, MIN(ts::DATE) AS first_day FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT e.user_id,
             date_diff('day', f.first_day, e.ts::DATE) // 7 AS week_offset,
             f.first_day - (((date_part('dow', f.first_day)::INTEGER + 6) % 7)::INTEGER) AS cohort_week
      FROM events e JOIN firsts f ON e.user_id = f.user_id
    )
    SELECT strftime(cohort_week, '%Y-%m-%d') AS cohort_week,
           CAST(week_offset AS BIGINT) AS week_offset,
           CAST(COUNT(*) AS BIGINT) AS n_active_users
    FROM activity
    GROUP BY cohort_week, week_offset
    """,
    category="events",
)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by the Monday-aligned week of their
    first event; n_active_users counts distinct users from each cohort seen
    again k weeks after their own first day. Three shuffles, all on
    user-sized keys (first-day agg, user-level distinct, final small agg) —
    the fact table is touched twice but never self-joined row-to-row. The
    user_id-keyed join broadcasts when the user dimension fits."""
    e = t(spark, sf_dir, "events").select("user_id", F.to_date("ts").alias("day"))
    firsts = e.groupBy("user_id").agg(F.min("day").alias("first_day"))
    # Monday alignment: Spark dayofweek is 1=Sunday..7=Saturday; shift back
    # (dayofweek+5) % 7 days to reach the preceding Monday.
    cohort_week = F.date_sub(F.col("first_day"), (F.dayofweek("first_day") + 5) % 7)
    activity = (
        e.join(firsts, "user_id")
        .select(
            "user_id",
            F.floor(F.datediff(F.col("day"), F.col("first_day")) / 7).alias("week_offset"),
            F.date_format(cohort_week, "yyyy-MM-dd").alias("cohort_week"),
        )
        .distinct()
    )
    return activity.groupBy("cohort_week", "week_offset").agg(
        F.count("*").alias("n_active_users")
    )


ZSCORE_FP = 1_000_000  # fixed-point scale for the z-score (exact compare)


@register(
    "events_anomaly_zscore",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, ts::DATE AS day, COUNT(*) AS n
      FROM events GROUP BY event_type, ts::DATE
    ),
    stats AS (
      SELECT event_type, day, n,
             SUM(n) OVER w AS s1, SUM(n * n) OVER w AS s2, COUNT(*) OVER w AS cnt
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
    )
    SELECT event_type, strftime(day, '%Y-%m-%d') AS day, CAST(n AS BIGINT) AS n,
           CAST(round(
             (n - CAST(s1 AS DOUBLE) / cnt)
             / sqrt(CAST(s2 AS DOUBLE) / cnt - (CAST(s1 AS DOUBLE) / cnt) * (CAST(s1 AS DOUBLE) / cnt))
             * {ZSCORE_FP}) AS BIGINT) AS zscore_fp
    FROM stats
    WHERE cnt >= 3
      AND CAST(s2 AS DOUBLE) / cnt - (CAST(s1 AS DOUBLE) / cnt) * (CAST(s1 AS DOUBLE) / cnt) > 0
    """,
    category="events",
)
def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing z-score anomaly detection on daily event volumes: each
    (event_type, day) count is scored against the mean/std of its own
    trailing 7 days (exclusive — ROWS 7 PRECEDING TO 1 PRECEDING, so the
    current day never contaminates its baseline). Mean and variance come
    from integer SUM/SUM-of-squares window aggregates — exact in any
    order — and the z-score is emitted as a fixed-point integer so both
    engines agree bit-for-bit. One shuffle: daily rollup and the trailing
    window share the event_type partitioning. The daily rollup shrinks the
    fact table to (types x days) rows first, so the window input is tiny
    at any event volume."""
    e = t(spark, sf_dir, "events")
    daily = (
        e.select("event_type", F.to_date("ts").alias("day"))
        .groupBy("event_type", "day")
        .agg(F.count("*").alias("n"))
    )
    w = W.partitionBy("event_type").orderBy("day").rowsBetween(-7, -1)
    stats = daily.select(
        "event_type", "day", "n",
        F.sum("n").over(w).alias("s1"),
        F.sum(F.col("n") * F.col("n")).over(w).alias("s2"),
        F.count("*").over(w).alias("cnt"),
    )
    mean = F.col("s1").cast("double") / F.col("cnt")
    var = F.col("s2").cast("double") / F.col("cnt") - mean * mean
    z = (F.col("n") - mean) / F.sqrt(var)
    return (
        stats.filter((F.col("cnt") >= 3) & (var > 0))
        .select(
            "event_type",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.col("n").cast("long").alias("n"),
            F.round(z * ZSCORE_FP).cast("long").alias("zscore_fp"),
        )
    )


@register(
    "events_transition_matrix",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
    )
    SELECT prev_type, event_type AS next_type,
           CAST(COUNT(*) AS BIGINT) AS n_transitions
    FROM seq
    WHERE prev_type IS NOT NULL
    GROUP BY prev_type, event_type
    """,
    category="events",
)
def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type transition counts (the Markov-chain view of user
    behavior): consecutive event pairs per user via lag, counted across
    all users. Two shuffles — the per-user ordering window (user-sized
    partitions) and a tiny |types|^2 final aggregate. The deterministic
    (ts, event_id) ordering makes the lag reproducible under ties."""
    e = t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    )
    return (
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count("*").alias("n_transitions"))
    )


ANOM_Z_FP = 3_000_000  # flag when |z| * 1e6 exceeds 3 sigma


@register(
    "events_anomaly_seasonal_zscore",
    oracle=f"""
    WITH cells AS (
      SELECT date_trunc('day', ts) AS day,
             CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hr,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY day, hr
    ),
    base AS (
      SELECT hr,
             CAST(COUNT(*) AS BIGINT) AS n_days,
             CAST(SUM(c) AS HUGEINT) AS s,
             CAST(SUM(CAST(c AS HUGEINT) * c) AS HUGEINT) AS s2
      FROM cells GROUP BY hr
    ),
    scored AS (
      SELECT c.day, c.hr, c.c,
             CAST(round((c.c - CAST(b.s AS DOUBLE) / b.n_days)
                        / sqrt((b.s2 - CAST(b.s AS DOUBLE) * b.s / b.n_days)
                               / b.n_days)
                        * 1000000) AS BIGINT) AS z_fp
      FROM cells c JOIN base b ON c.hr = b.hr
      WHERE b.s2 * b.n_days > b.s * b.s  -- HUGEINT: exact at any volume
    )
    SELECT day, hr, c AS n_events, z_fp,
           CASE WHEN abs(z_fp) > {ANOM_Z_FP} THEN 1 ELSE 0 END AS anomalous
    FROM scored
    """,
    category="events",
)
def events_anomaly_seasonal_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonally-adjusted volume anomaly detection: each (day, hour) cell
    is z-scored against the baseline of the SAME hour-of-day across all
    days — the detector that catches a 3am traffic spike a raw global
    threshold would miss inside the diurnal cycle. Variance uses the
    sum/sum-of-squares identity over exact integer counts, so the double
    math is a fixed expression of exact sums (engine-deterministic), and
    the verdict compares in 1e-6 fixed point. Plan: the volume collapses
    in ONE (day, hour) count aggregate; the 24-row baseline derives from
    it and broadcasts back. Cells grow with the time horizon (days x 24),
    never with event rate. Degenerate zero-variance hours are excluded on
    both engines (strict s2*n > s^2)."""
    e = t(spark, sf_dir, "events")
    cells = (
        e.groupBy(
            F.date_trunc("day", "ts").alias("day"),
            F.hour("ts").cast("long").alias("hr"),
        )
        .agg(F.count("*").alias("c"))
    )
    base = cells.groupBy("hr").agg(
        F.count("*").alias("n_days"),
        F.sum(F.col("c").cast("decimal(38,0)")).alias("s"),
        F.sum(F.col("c").cast("decimal(38,0)") * F.col("c")).alias("s2"),
    )
    mean = F.col("s").cast("double") / F.col("n_days")
    var = (F.col("s2") - F.col("s").cast("double") * F.col("s") / F.col("n_days")) / F.col(
        "n_days"
    )
    z_fp = F.round((F.col("c") - mean) / F.sqrt(var) * 1_000_000).cast("long")
    return (
        cells.join(F.broadcast(base), "hr")
        .filter(
            F.col("s2") * F.col("n_days")
            > F.col("s") * F.col("s")  # decimal(38,0): exact at any volume
        )
        .select(
            "day",
            "hr",
            F.col("c").alias("n_events"),
            z_fp.alias("z_fp"),
            F.when(F.abs(z_fp) > ANOM_Z_FP, 1).otherwise(0).alias("anomalous"),
        )
    )


TRAILING_DAYS = 7  # trailing-window width for the rolling distinct-user gauge


@register(
    "events_trailing_distinct_users",
    oracle=f"""
    WITH du AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS d FROM events
    ),
    days AS (SELECT DISTINCT d FROM du)
    SELECT strftime(days.d, '%Y-%m-%d') AS day,
           CAST(COUNT(DISTINCT du.user_id) AS BIGINT) AS u7
    FROM days JOIN du
      ON du.d BETWEEN days.d - INTERVAL {TRAILING_DAYS - 1} DAY AND days.d
    GROUP BY days.d
    """,
    category="events",
)
def events_trailing_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day (TRAILING_DAYS) distinct active users per day (the "WAU
    curve") — the metric a naive engine computes with a per-day COUNT
    DISTINCT over a 7-day self-join of raw events, O(days x
    events) with unbounded distinct state. Scale-correct reformulation:
    collapse to DISTINCT (user, day) first (the only corpus-sized
    shuffle, keyed and combinable), then fan each pair out to the
    <= 7 target days it makes active (a FIXED x7
    sequence-explode, not a join), re-distinct on (user, target_day), and
    count. Every stage is keyed; per-day state never exceeds the distinct
    (user, day) pairs of one window — this is also exactly the shape a
    streaming version maintains incrementally. The oracle keeps the
    textbook range-join COUNT DISTINCT formulation, so the hash-match
    proves the fan-out rewrite equivalent. Days with no activity emit no
    row (both engines; densify via window_days_densify if needed)."""
    e = t(spark, sf_dir, "events")
    du = e.select("user_id", F.to_date("ts").alias("d")).distinct()
    fanned = du.select(
        "user_id",
        F.explode(
            F.expr(f"sequence(d, date_add(d, {TRAILING_DAYS - 1}), interval 1 day)")
        ).alias("tday"),
    ).distinct()
    present = du.select(F.col("d").alias("tday")).distinct()
    return (
        fanned.join(present, "tday")
        .groupBy("tday")
        .agg(F.count("*").alias("u7"))  # fanned is distinct (user, tday)
        .select(F.date_format("tday", "yyyy-MM-dd").alias("day"), "u7")
    )


CPT_SCALE = 1_000_000  # fixed-point scale for the changepoint gap statistic


@register(
    "events_changepoint_binseg",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    pre AS (
      SELECT event_type, day, n,
             SUM(n) OVER w AS cum_n,
             CAST(row_number() OVER w AS BIGINT) AS i,
             SUM(n) OVER (PARTITION BY event_type) AS tot_n,
             CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS days
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY day)
    ),
    gaps AS (
      SELECT event_type, day, i, days,
             CAST(round(abs(CAST(cum_n AS DOUBLE) / i
                            - CAST(tot_n - cum_n AS DOUBLE) / (days - i))
                        * {CPT_SCALE}) AS BIGINT) AS gap_fp
      FROM pre WHERE i < days
    )
    SELECT event_type, strftime(day, '%Y-%m-%d') AS split_day,
           CAST(i AS BIGINT) AS days_before, CAST(days - i AS BIGINT) AS days_after,
           gap_fp
    FROM (
      SELECT *, row_number() OVER (PARTITION BY event_type
                                   ORDER BY gap_fp DESC, day) AS rk
      FROM gaps
    ) WHERE rk = 1
    """,
    category="events",
)
def events_changepoint_binseg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-changepoint detection per event type (the first step of
    binary segmentation, Scott & Knott / CUSUM-family): for every
    candidate split day, the gap statistic |mean(before) - mean(after)|
    of daily event counts — computed from PREFIX SUMS, so the whole scan
    over candidate splits is ONE ordered window per type, not a per-split
    re-aggregation (the naive formulation is O(days^2) per type; this is
    O(days)). The argmax day per type is the detected changepoint.
    Recursive CUSUM (S_t = max(0, S_t-1 + ...)) is NOT window-expressible
    — binary segmentation's split-scan form is the declarative-engine-
    native changepoint method, and applying it recursively to each half
    yields the full segmentation. Gap emitted as fixed point (exact
    integer counts feed one double division), deterministic tie-break on
    day. Scale: the daily rollup collapses the corpus to (types x days)
    rows first; all three windows share the event_type partitioning —
    one shuffle."""
    e = t(spark, sf_dir, "events")
    daily = (
        e.select("event_type", F.to_date("ts").alias("day"))
        .groupBy("event_type", "day")
        .agg(F.count("*").alias("n"))
    )
    w = W.partitionBy("event_type").orderBy("day")
    wp = W.partitionBy("event_type")
    pre = daily.select(
        "event_type",
        "day",
        F.sum("n").over(w).alias("cum_n"),
        F.row_number().over(w).cast("long").alias("i"),
        F.sum("n").over(wp).alias("tot_n"),
        F.count("*").over(wp).cast("long").alias("days"),
    )
    gap = F.round(
        F.abs(
            F.col("cum_n").cast("double") / F.col("i")
            - (F.col("tot_n") - F.col("cum_n")).cast("double") / (F.col("days") - F.col("i"))
        )
        * CPT_SCALE
    ).cast("long")
    gaps = pre.filter(F.col("i") < F.col("days")).select(
        "event_type", "day", "i", "days", gap.alias("gap_fp")
    )
    rk = F.row_number().over(
        W.partitionBy("event_type").orderBy(F.col("gap_fp").desc(), F.col("day"))
    )
    return (
        gaps.withColumn("rk", rk)
        .filter(F.col("rk") == 1)
        .select(
            "event_type",
            F.date_format("day", "yyyy-MM-dd").alias("split_day"),
            F.col("i").alias("days_before"),
            (F.col("days") - F.col("i")).alias("days_after"),
            "gap_fp",
        )
    )


@register(
    "events_user_streaks",
    oracle="""
    WITH du AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day FROM events
    ),
    anchored AS (
      SELECT user_id, day,
             date_diff('day', DATE '2024-01-01', day)
               - row_number() OVER (PARTITION BY user_id ORDER BY day) AS anchor
      FROM du
    ),
    streaks AS (
      SELECT user_id, anchor,
             CAST(COUNT(*) AS BIGINT) AS streak_days,
             MIN(day) AS start_day, MAX(day) AS end_day
      FROM anchored GROUP BY user_id, anchor
    )
    SELECT user_id, streak_days,
           strftime(start_day, '%Y-%m-%d') AS start_day,
           strftime(end_day, '%Y-%m-%d') AS end_day
    FROM (
      SELECT *, row_number() OVER (PARTITION BY user_id
                                   ORDER BY streak_days DESC, start_day) AS rk
      FROM streaks
    ) WHERE rk = 1
    """,
    category="events",
)
def events_user_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-day activity streak per user — the
    gaps-and-islands pattern (day_index - row_number is constant within a
    consecutive run, so one subtraction turns streak detection into a
    plain groupBy; no self-joins, no recursion). Distinct from the
    session-window operators: those group by INTRA-day inactivity gaps
    on raw timestamps; this is the calendar-day engagement streak a
    retention dashboard shows. All three windows (row_number, the streak
    rollup, the per-user argmax) partition by user_id — one shuffle key
    end to end, and the input collapses to distinct (user, day) first.
    Deterministic tie-break: earliest of the equal-length streaks."""
    e = t(spark, sf_dir, "events")
    du = e.select("user_id", F.to_date("ts").alias("day")).distinct()
    anchor = (
        F.datediff(F.col("day"), F.lit("2024-01-01").cast("date"))
        - F.row_number().over(W.partitionBy("user_id").orderBy("day"))
    )
    streaks = (
        du.withColumn("anchor", anchor)
        .groupBy("user_id", "anchor")
        .agg(
            F.count("*").alias("streak_days"),
            F.min("day").alias("start_day"),
            F.max("day").alias("end_day"),
        )
    )
    rk = F.row_number().over(
        W.partitionBy("user_id").orderBy(F.col("streak_days").desc(), F.col("start_day"))
    )
    return (
        streaks.withColumn("rk", rk)
        .filter(F.col("rk") == 1)
        .select(
            "user_id",
            "streak_days",
            F.date_format("start_day", "yyyy-MM-dd").alias("start_day"),
            F.date_format("end_day", "yyyy-MM-dd").alias("end_day"),
        )
    )


ENTROPY_SCALE = 1_000_000


@register(
    "events_markov_entropy_rate",
    oracle=f"""
    WITH seq AS (
      SELECT event_type AS src,
             lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dst
      FROM events
    ),
    trans AS (
      SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS c
      FROM seq WHERE dst IS NOT NULL GROUP BY src, dst
    ),
    row_tot AS (SELECT src, CAST(SUM(c) AS BIGINT) AS rc FROM trans GROUP BY src),
    tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM trans)
    SELECT t.src,
           r.rc AS n_transitions,
           CAST(-SUM(CAST(round(CAST(t.c AS DOUBLE) / r.rc
                                * ln(CAST(t.c AS DOUBLE) / r.rc)
                                * {ENTROPY_SCALE}) AS BIGINT)) AS BIGINT)
             AS row_entropy_fp,
           CAST(round(CAST(r.rc AS DOUBLE) / tot.n * {ENTROPY_SCALE}) AS BIGINT)
             AS weight_fp
    FROM trans t
    JOIN row_tot r ON r.src = t.src
    CROSS JOIN tot
    GROUP BY t.src, r.rc, tot.n
    """,
    category="events",
)
def events_markov_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-state conditional entropy of the behavioral Markov chain — the
    information-theoretic summary on top of events_transition_matrix:
    for each source event type, H(next | src) = -sum_j p(j|src) ln
    p(j|src), with the state's empirical weight alongside, so
    sum(weight x row_entropy) is the chain's entropy rate under the
    empirical state distribution (the stationary-distribution variant
    needs an eigenvector solve — out of declarative scope and stated
    so). Low row entropy = predictable next action (funnel states);
    high = branching states. Shapes: the per-user ordering window, a
    |types|^2 transition aggregate, then everything is bounded-frame
    arithmetic; fixed-point ln like the PMI/KL family."""
    e = t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        F.col("event_type").alias("src"),
        F.lead("event_type").over(w).alias("dst"),
    ).filter(F.col("dst").isNotNull())
    trans = seq.groupBy("src", "dst").agg(F.count("*").alias("c"))
    row_tot = trans.groupBy("src").agg(F.sum("c").alias("rc"))
    tot = trans.agg(F.sum("c").alias("n"))
    p = F.col("c").cast("double") / F.col("rc")
    return (
        trans.join(row_tot, "src")
        .crossJoin(F.broadcast(tot))
        .groupBy("src", "rc", "n")
        # per-term fixed-point BEFORE the sum: integer sums are exact in any
        # order, so partition count can never flip a rounded boundary
        .agg(
            (-F.sum(F.round(p * F.log(p) * ENTROPY_SCALE).cast("long")))
            .cast("long")
            .alias("row_entropy_fp")
        )
        .select(
            "src",
            F.col("rc").alias("n_transitions"),
            "row_entropy_fp",
            F.round(F.col("rc").cast("double") / F.col("n") * ENTROPY_SCALE)
            .cast("long")
            .alias("weight_fp"),
        )
    )
