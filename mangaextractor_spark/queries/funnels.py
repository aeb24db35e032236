"""Behavioral analytics over the events stream: ordered funnel
conversion and weekly retention cohorts — the two classic
product-analytics operators (Amplitude/Mixpanel shape) that a
warehouse engine is expected to answer without exporting data.

Both are built window-free: every per-user reduction is a map-side-
combined groupBy and every re-attachment is a user-keyed equi-join
(AQE-skew-splittable; a power user is a hot JOIN key, never a window
pin — queries/_scale_notes.py). Ratios are e6-scaled integer floor
divisions of exact counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import load_table
from . import register

# Ordered funnel: a user converts step k only with an event of that
# type STRICTLY AFTER their step-(k-1) conversion time and within the
# conversion window (the standard ordered-funnel semantics; unordered
# funnels are a plain conditional aggregation). 24 h keeps the fixture
# funnel selective (150 -> 60 -> 25 at sf0.01) instead of degenerate.
FUNNEL_STEPS = ("view", "click", "purchase")
FUNNEL_WINDOW_HOURS = 24

_FUNNEL_SQL = f"""
WITH s1 AS (
  SELECT user_id, MIN(ts) AS t1 FROM events
  WHERE event_type = '{FUNNEL_STEPS[0]}' GROUP BY user_id
),
s2 AS (
  SELECT e.user_id, MIN(e.ts) AS t2
  FROM events e JOIN s1 USING (user_id)
  WHERE e.event_type = '{FUNNEL_STEPS[1]}' AND e.ts > s1.t1
    AND e.ts <= s1.t1 + INTERVAL {FUNNEL_WINDOW_HOURS} HOUR
  GROUP BY e.user_id
),
s3 AS (
  SELECT e.user_id, MIN(e.ts) AS t3
  FROM events e JOIN s2 USING (user_id)
  WHERE e.event_type = '{FUNNEL_STEPS[2]}' AND e.ts > s2.t2
    AND e.ts <= s2.t2 + INTERVAL {FUNNEL_WINDOW_HOURS} HOUR
  GROUP BY e.user_id
),
counts AS (
  SELECT 1 AS step, '{FUNNEL_STEPS[0]}' AS event_type, COUNT(*) AS n_users FROM s1
  UNION ALL
  SELECT 2, '{FUNNEL_STEPS[1]}', COUNT(*) FROM s2
  UNION ALL
  SELECT 3, '{FUNNEL_STEPS[2]}', COUNT(*) FROM s3
)
SELECT step, event_type, CAST(n_users AS BIGINT) AS n_users,
       CASE WHEN step = 1 THEN 1000000
            ELSE (1000000 * n_users)
                 // GREATEST(LAG(n_users) OVER (ORDER BY step), 1)
       END AS conv_from_prev_e6
FROM counts
ORDER BY step
"""


@register(
    "funnel_steps",
    _FUNNEL_SQL,
    doc=f"Ordered funnel over the event stream ({' -> '.join(FUNNEL_STEPS)}, "
    f"{FUNNEL_WINDOW_HOURS} h conversion window per step): "
    "a user converts a step only with a qualifying event STRICTLY "
    "AFTER their previous step's conversion time and within the "
    "window — the standard "
    "ordered-funnel semantics, built WITHOUT per-user event-sequence "
    "windows: each step is one filtered map-side-combined groupBy "
    "(MIN ts per user) re-attached by a user-keyed equi-join, so a "
    "power user with millions of events is a skew-splittable join key "
    "and every task sees only its share. The 3-row summary carries "
    "e6-scaled step-over-step conversion (the one LAG window rides "
    "THREE rows). Three corpus scans of one filtered type each — at "
    "10^12 events, with the table partitioned by event_type (the "
    "zorder_layout story), each scan prunes to its own partition.",
    tags=("events", "analytics"),
)
def funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    s1 = (
        e.filter(F.col("event_type") == FUNNEL_STEPS[0])
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        e.filter(F.col("event_type") == FUNNEL_STEPS[1])
        .join(s1, "user_id")
        .filter(
            (F.col("ts") > F.col("t1"))
            & (F.col("ts") <= F.col("t1") + F.expr(f"INTERVAL {FUNNEL_WINDOW_HOURS} HOUR"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        e.filter(F.col("event_type") == FUNNEL_STEPS[2])
        .join(s2, "user_id")
        .filter(
            (F.col("ts") > F.col("t2"))
            & (F.col("ts") <= F.col("t2") + F.expr(f"INTERVAL {FUNNEL_WINDOW_HOURS} HOUR"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )

    def cnt(df: DataFrame, step: int, et: str) -> DataFrame:
        return df.agg(F.count(F.lit(1)).cast("long").alias("n_users")).select(
            F.lit(step).alias("step"), F.lit(et).alias("event_type"), "n_users"
        )

    counts = (
        cnt(s1, 1, FUNNEL_STEPS[0])
        .unionByName(cnt(s2, 2, FUNNEL_STEPS[1]))
        .unionByName(cnt(s3, 3, FUNNEL_STEPS[2]))
    )
    from pyspark.sql import Window as W

    # the one window rides the 3-row summary, never event rows
    prev = F.lag("n_users").over(W.orderBy("step"))
    return (
        counts.withColumn("_prev", prev)
        .select(
            "step",
            "event_type",
            "n_users",
            F.when(F.col("step") == 1, F.lit(1000000).cast("long"))
            .otherwise(F.expr("(1000000 * n_users) DIV GREATEST(_prev, 1)"))
            .alias("conv_from_prev_e6"),
        )
        .orderBy("step")
    )


# -- weekly retention cohorts -------------------------------------------------

RETENTION_SCALE = 1_000_000

RETENTION_EVENT = "purchase"

_RETENTION_SQL = f"""
WITH first_seen AS (
  SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_week
  FROM events WHERE event_type = '{RETENTION_EVENT}' GROUP BY user_id
),
sizes AS (
  SELECT cohort_week, COUNT(*) AS cohort_size FROM first_seen GROUP BY cohort_week
),
activity AS (
  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS active_week
  FROM events WHERE event_type = '{RETENTION_EVENT}'
),
ret AS (
  SELECT f.cohort_week,
         CAST(datediff('day', f.cohort_week, a.active_week) // 7 AS INT)
           AS week_offset,
         COUNT(*) AS n_active
  FROM activity a JOIN first_seen f USING (user_id)
  GROUP BY 1, 2
)
SELECT STRFTIME(r.cohort_week, '%Y-%m-%d') AS cohort_week, r.week_offset,
       CAST(r.n_active AS BIGINT) AS n_active,
       CAST(s.cohort_size AS BIGINT) AS cohort_size,
       ({RETENTION_SCALE} * r.n_active) // s.cohort_size AS retained_e6
FROM ret r JOIN sizes s USING (cohort_week)
ORDER BY r.cohort_week, r.week_offset
"""


@register(
    "retention_cohorts",
    _RETENTION_SQL,
    doc=f"Weekly retention cohorts: users are cohorted by the ISO week "
    f"of their first {RETENTION_EVENT} event; each (cohort, week-offset) cell counts "
    f"users with a {RETENTION_EVENT} that week (the value action, so the "
    "fixture corpus produces real decay instead of everyone-always-active), with an e6-scaled retention share of the "
    "cohort size — the triangle view every growth dashboard renders. "
    "Window-free at corpus scale: first-seen and per-week activity "
    "are map-side-combined groupBys (the DISTINCT collapses each "
    "user-week to one row BEFORE the join, so a power user "
    "contributes max one row per week), the cohort attach is a "
    "user-keyed equi-join, and the |cohorts|-row size table joins "
    "back broadcast-sized. date_trunc('week') is ISO-Monday in both "
    "engines; the offset is an exact integer day-diff DIV 7 and the "
    "cohort key is rendered through an explicit engine-stable date "
    "format.",
    tags=("events", "analytics"),
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    e = e.filter(F.col("event_type") == RETENTION_EVENT)
    first_seen = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    sizes = first_seen.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    activity = e.select(
        "user_id", F.date_trunc("week", F.col("ts")).cast("date").alias("active_week")
    ).distinct()
    ret = (
        activity.join(first_seen, "user_id")
        .groupBy(
            "cohort_week",
            F.expr("CAST(datediff(active_week, cohort_week) DIV 7 AS INT)").alias(
                "week_offset"
            ),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_active"))
    )
    return (
        ret.join(F.broadcast(sizes), "cohort_week")
        .select(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            "week_offset",
            "n_active",
            F.col("cohort_size").cast("long").alias("cohort_size"),
            F.expr(f"({RETENTION_SCALE} * n_active) DIV cohort_size").alias(
                "retained_e6"
            ),
        )
        .orderBy("cohort_week", "week_offset")
    )


# --- event-rate anomaly flags ----------------------------------------------

# |z| > ANOMALY_Z flags a bucket; the test is evaluated as the exact
# integer inequality (n*cnt - s)^2 > z^2 * (n*q - s^2) over hourly
# counts (population variance scaled by n^2 on both sides), so the
# flag is bit-exact across engines — no float mean/stddev anywhere.
ANOMALY_Z = 2

_ANOMALY_SQL = f"""
WITH b AS (
  SELECT event_type, date_trunc('hour', ts) AS hour, COUNT(*) AS cnt
  FROM events GROUP BY event_type, date_trunc('hour', ts)
),
st AS (
  SELECT event_type,
         CAST(COUNT(*) AS HUGEINT) AS n,
         CAST(SUM(cnt) AS HUGEINT) AS s,
         CAST(SUM(cnt * cnt) AS HUGEINT) AS q
  FROM b GROUP BY event_type
)
SELECT b.event_type, b.hour, CAST(b.cnt AS BIGINT) AS cnt,
       CAST((1000000 * s) // n AS BIGINT) AS mean_e6,
       (n * cnt - s) * (n * cnt - s)
         > {ANOMALY_Z * ANOMALY_Z} * (n * q - s * s) AS is_anomaly
FROM b JOIN st USING (event_type)
ORDER BY b.event_type, b.hour
"""


@register(
    "event_rate_anomaly",
    _ANOMALY_SQL,
    doc=f"Hourly event-rate anomaly flags per event type: a bucket is "
    f"anomalous when its count deviates from the type's mean by more "
    f"than {ANOMALY_Z} population standard deviations, evaluated as "
    "the exact integer inequality (n*cnt - s)^2 > z^2*(n*q - s^2) in "
    "DECIMAL(38,0) (Spark) / HUGEINT (DuckDB) so the flag is bit-"
    "exact — the monitoring pass an ingestion pipeline runs to catch "
    "crawler stalls and bot storms before they pollute the corpus "
    "mix. Scale shape: one map-side-combined bucket groupBy (the only "
    "corpus-sized op), a per-type stats groupBy over BUCKET rows "
    "(bounded: types x hours, independent of corpus size), and a "
    "broadcast join-back — never a window, never a second scan.",
    tags=("quality", "time", "stats"),
)
def event_rate_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    DEC = "decimal(38,0)"
    e = load_table(spark, sf_dir, "events")
    b = e.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    st = b.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_b"),
        F.sum("cnt").alias("s_b"),
        F.sum(F.col("cnt") * F.col("cnt")).cast(DEC).alias("q"),
    )
    j = b.join(F.broadcast(st), "event_type")
    n_d = F.col("n_b").cast(DEC)
    s_d = F.col("s_b").cast(DEC)
    cnt_d = F.col("cnt").cast(DEC)
    dev = n_d * cnt_d - s_d
    var_n2 = n_d * F.col("q") - s_d * s_d
    return j.select(
        "event_type",
        "hour",
        F.col("cnt").cast("long").alias("cnt"),
        F.expr("CAST((1000000 * s_b) DIV n_b AS BIGINT)").alias("mean_e6"),
        (dev * dev > F.lit(ANOMALY_Z * ANOMALY_Z) * var_n2).alias("is_anomaly"),
    ).orderBy("event_type", "hour")
