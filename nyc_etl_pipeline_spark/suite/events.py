"""Event-stream operator suite: time windows, sessionization, JSON
extraction over the `events` table.

Batch implementations here (window()/Window functions); the
structured-streaming variants (readStream + watermark, same results
via Trigger.AvailableNow) live in nyc_etl_pipeline_spark/streaming and
are exercised in tests — the driver's oracle gate runs these batch
forms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from nyc_etl_pipeline_spark.io import read_testdata
from nyc_etl_pipeline_spark.functions import dec_avg, dec_sum
from nyc_etl_pipeline_spark.functions import round_half_up as R
from nyc_etl_pipeline_spark.functions import sql_dec_avg, sql_round_half_up
from nyc_etl_pipeline_spark.suite import QuerySpec


def q13_events_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly tumbling windows. window() is a projection (no UDF);
    the aggregation is a partial+final hash agg on (window, type)."""
    e = read_testdata(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), R(dec_sum("value"), 3).alias("total_value"))
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


_Q13_SQL = """
SELECT date_trunc('hour', ts) AS window_start,
       event_type,
       count(*) AS n_events,
       floor((CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE)) * 1000.0 + 0.5) / 1000.0 AS total_value
FROM events
GROUP BY 1, 2
"""


def q14_events_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour windows sliding every 15 minutes — each event lands in
    exactly 4 windows. Spark expands via the window() generator; the
    oracle replicates with an explicit 0..3 unnest."""
    e = read_testdata(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "15 minutes"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), R(dec_sum("value"), 3).alias("total_value"))
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


_Q14_SQL = """
WITH base AS (
  SELECT make_timestamp((epoch_us(ts) // 900000000) * 900000000) AS floor15,
         event_type, value
  FROM events
),
expanded AS (
  SELECT floor15 - (k * INTERVAL 15 MINUTE) AS window_start, event_type, value
  FROM base, range(4) r(k)
)
SELECT window_start, event_type,
       count(*) AS n_events,
       floor((CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE)) * 1000.0 + 0.5) / 1000.0 AS total_value
FROM expanded
GROUP BY 1, 2
"""


def q15_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity) via lag + running
    sum of session-start flags. One shuffle on user_id; within each
    user the window sort is local. (Streaming equivalent:
    session_window(ts, '30 minutes') — see streaming module.)"""
    e = read_testdata(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts")
    gap_us = 30 * 60 * 1_000_000
    flagged = e.withColumn(
        "__new_session",
        F.when(
            (F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))) > gap_us,
            F.lit(1),
        )
        .otherwise(F.lit(0)),
    ).withColumn(
        "__session_idx",
        F.sum("__new_session").over(w.rowsBetween(W.unboundedPreceding, 0)),
    )
    return (
        flagged.groupBy("user_id", "__session_idx")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            R(dec_sum("value"), 3).alias("total_value"),
        )
        .select(
            "user_id",
            F.col("__session_idx").cast("int").alias("session_id"),
            "session_start",
            "session_end",
            "n_events",
            "total_value",
        )
    )


_Q15_SQL = """
WITH flagged AS (
  SELECT user_id, ts, value,
         CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
sessions AS (
  SELECT user_id, ts, value,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
  FROM flagged
)
SELECT user_id,
       CAST(session_idx AS INTEGER) AS session_id,
       min(ts) AS session_start,
       max(ts) AS session_end,
       count(*) AS n_events,
       floor((CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE)) * 1000.0 + 0.5) / 1000.0 AS total_value
FROM sessions
GROUP BY 1, 2
"""


def q16_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access: pull a JSON field out of the string
    props column (get_json_object is JVM-side, no UDF)."""
    e = read_testdata(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        e.select("event_type", k.alias("__k"))
        .groupBy("event_type")
        .agg(
            R(F.avg("__k"), 3).alias("avg_k"),
            F.max("__k").cast("int").alias("max_k"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


_Q16_SQL = """
SELECT event_type,
       floor((avg(CAST(json_extract_string(props, '$.k') AS INTEGER))) * 1000.0 + 0.5) / 1000.0 AS avg_k,
       CAST(max(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS INTEGER) AS max_k,
       count(*) AS n_events
FROM events
GROUP BY 1
"""


# --------------------------------------------------------------------------
# q85 — VARIANT semi-structured access (Spark 4 VariantType). q16 pulls
# one field with get_json_object (string re-parse per extraction); the
# VARIANT path parses each props value ONCE into a typed binary form,
# then extractions are cheap typed reads — at scale the difference
# between N parses and 1 per row. schema_of_variant proves the typed
# decode; try_variant_get on a missing path must yield NULL (not an
# error) — the tolerant-read contract messy real-world JSON needs.
# --------------------------------------------------------------------------

def q85_variant_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_testdata(spark, sf_dir, "events")
    v = F.parse_json("props")
    row = e.select(
        "event_type",
        F.schema_of_variant(v).alias("__sch"),
        F.variant_get(v, "$.k", "int").alias("__k"),
        F.try_variant_get(v, "$.missing", "int").alias("__miss"),
    )
    return row.groupBy("event_type").agg(
        F.min("__sch").alias("props_schema"),
        R(F.avg("__k"), 3).alias("avg_k"),
        F.max("__k").cast("int").alias("max_k"),
        F.count("__miss").alias("n_missing_hits"),
        F.count(F.lit(1)).alias("n_events"),
    )


_Q85_SQL = """
SELECT event_type,
       'OBJECT<k: BIGINT>' AS props_schema,
       floor((avg(CAST(json_extract_string(props, '$.k') AS INTEGER))) * 1000.0 + 0.5) / 1000.0 AS avg_k,
       CAST(max(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS INTEGER) AS max_k,
       CAST(0 AS BIGINT) AS n_missing_hits,
       count(*) AS n_events
FROM events
GROUP BY 1
"""


# --------------------------------------------------------------------------
# q89 — XML parse (Spark 4 native from_xml). No XML in the fixtures,
# so the query builds an XML payload from the known props field with
# to_xml, parses it back with from_xml, and aggregates the extracted
# values; the oracle computes the same aggregates from the source
# field directly — any defect in the XML encode/decode breaks the
# match. This is how the engine would land XML feeds (the classic
# enterprise source format) without a UDF.
# --------------------------------------------------------------------------

def q89_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_testdata(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    with_xml = e.select(
        "event_type",
        F.to_xml(F.struct(k.alias("k"), F.col("event_id").alias("id"))).alias("__xml"),
    )
    parsed = with_xml.select(
        "event_type",
        F.from_xml("__xml", "k INT, id BIGINT").alias("__p"),
    )
    return parsed.groupBy("event_type").agg(
        R(F.avg(F.col("__p.k")), 3).alias("avg_k"),
        F.max(F.col("__p.k")).cast("int").alias("max_k"),
        F.count(F.when(F.col("__p.id").isNull(), 1)).alias("n_bad_ids"),
        F.count(F.lit(1)).alias("n_events"),
    )


_Q89_SQL = """
SELECT event_type,
       floor((avg(CAST(json_extract_string(props, '$.k') AS INTEGER))) * 1000.0 + 0.5) / 1000.0 AS avg_k,
       CAST(max(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS INTEGER) AS max_k,
       CAST(0 AS BIGINT) AS n_bad_ids,
       count(*) AS n_events
FROM events
GROUP BY 1
"""


# --------------------------------------------------------------------------
# q70 — dense-grid gap fill with forward fill (time-series regularization)
# --------------------------------------------------------------------------

GAPFILL_USER_MOD = 5  # bound the dense grid: 1-in-5 users


def q70_gapfill_hours(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regularize a sparse event stream to one row per (user, hour)
    between each user's first and last active hour: empty hours carry
    n_events=0 and the forward-filled mean value. The dense grid is
    sequence()+explode over AGGREGATED per-user spans (grid size =
    hours-in-span, independent of raw event volume); the fill is
    last(ignorenulls) over a per-user window. See operators/
    timeseries.gapfill for the 100 TB shape notes."""
    from nyc_etl_pipeline_spark.operators import timeseries

    e = read_testdata(spark, sf_dir, "events").filter(
        F.col("user_id") % GAPFILL_USER_MOD == 0
    )
    return timeseries.gapfill(e, "user_id", "ts", "value", unit="hour")


_Q70_SQL = f"""
WITH ev AS (SELECT * FROM events WHERE user_id % {GAPFILL_USER_MOD} = 0),
hourly AS (
  SELECT user_id, date_trunc('hour', ts) AS bucket,
         count(*) AS n, (CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE) / count(value)) AS v
  FROM ev GROUP BY 1, 2
),
spans AS (SELECT user_id, min(bucket) AS lo, max(bucket) AS hi FROM hourly GROUP BY 1),
grid AS (
  SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket
  FROM spans
)
SELECT g.user_id,
       g.bucket,
       CAST(coalesce(h.n, 0) AS BIGINT) AS n_events,
       floor((last_value(h.v IGNORE NULLS)
              OVER (PARTITION BY g.user_id ORDER BY g.bucket)) * 1000.0 + 0.5) / 1000.0
         AS filled_avg
FROM grid g LEFT JOIN hourly h USING (user_id, bucket)
"""


# --------------------------------------------------------------------------
# q75 — bounded-window EWMA per user (sequential fold, engine-exact)
# --------------------------------------------------------------------------

EWMA_ALPHA = 0.5  # exact binary fraction: every multiply is an exact halving
EWMA_LOOKBACK = 8


def q75_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user EWMA of event values over the trailing 8 observations:
    collect_list over a bounded window frame + a JVM aggregate() fold
    — the no-UDF, no-state-store form of a sequential recurrence. The
    oracle replays the identical left fold with list() OVER +
    list_reduce; see operators/timeseries.ewma_bounded for why the
    doubles match bit-for-bit."""
    from nyc_etl_pipeline_spark.operators.timeseries import ewma_bounded

    e = read_testdata(spark, sf_dir, "events")
    out = ewma_bounded(
        e, "user_id", "ts", "value",
        order_cols=["event_id"], alpha=EWMA_ALPHA, lookback=EWMA_LOOKBACK,
    )
    return out.select("event_id", "user_id", "ts", R(F.col("value"), 3).alias("value"), "ewma")


_Q75_SQL = f"""
WITH framed AS (
  SELECT event_id, user_id, ts, value,
         list(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN {EWMA_LOOKBACK - 1} PRECEDING AND CURRENT ROW)
           AS vals
  FROM events
)
SELECT event_id, user_id, ts,
       floor(value * 1000.0 + 0.5) / 1000.0 AS value,
       floor(list_reduce(vals, (acc, x) -> acc * {1.0 - EWMA_ALPHA} + x * {EWMA_ALPHA})
             * 1000000.0 + 0.5) / 1000000.0 AS ewma
FROM framed
"""


# --------------------------------------------------------------------------
# q84 — trailing-window anomaly bands (monitoring over event streams).
# z-score of each value against its user's previous ANOM_N
# observations (frame excludes the current row — no self-influence).
# Mean/variance are built from explicit sum / sum-of-squares over the
# same ordered frame in BOTH engines, NOT the stddev builtin: framed
# sums fold in identical order, so the doubles match bit-for-bit and
# the anomaly boolean (computed from the ROUNDED z on both sides)
# cannot flip on a ulp. Scales as one exchange on user_id + per-key
# frame scan — the batch twin of a streaming anomaly detector.
# --------------------------------------------------------------------------

ANOM_N = 16
ANOM_K = 3.0


def q84_anomaly_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_testdata(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(-ANOM_N, -1)
    )
    n = F.count(F.lit(1)).over(w)
    s1 = F.sum("value").over(w)
    s2 = F.sum(F.col("value") * F.col("value")).over(w)
    mean = s1 / n
    var = F.greatest(s2 / n - mean * mean, F.lit(0.0))
    z = (F.col("value") - mean) / F.sqrt(var)
    z_r = F.when((n >= 2) & (var > 0), R(z, 6))
    return e.select(
        "event_id",
        "user_id",
        R(F.col("value"), 3).alias("value"),
        z_r.alias("z"),
        (z_r > ANOM_K).alias("is_anomaly"),
    )


_Q84_SQL = f"""
WITH framed AS (
  SELECT event_id, user_id, value,
         count(*) OVER w AS n,
         sum(value) OVER w AS s1,
         sum(value * value) OVER w AS s2
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN {ANOM_N} PRECEDING AND 1 PRECEDING)
),
scored AS (
  SELECT event_id, user_id, value, n,
         greatest(s2 / n - (s1 / n) * (s1 / n), 0.0) AS var,
         CASE WHEN n >= 2 AND greatest(s2 / n - (s1 / n) * (s1 / n), 0.0) > 0
              THEN {sql_round_half_up('(value - s1 / n) / sqrt(greatest(s2 / n - (s1 / n) * (s1 / n), 0.0))', 6)}
         END AS z
  FROM framed
)
SELECT event_id, user_id,
       {sql_round_half_up('value', 3)} AS value,
       z,
       z > {ANOM_K} AS is_anomaly
FROM scored
"""


# --------------------------------------------------------------------------
# q90 — gaps and islands: per-user activity streaks over calendar
# days. The canonical SQL-pattern formulation: day_number minus
# row_number is constant within a consecutive run, so the difference
# IS the island id — one window + one group-by, no iteration, scales
# as a single exchange on the user key. (Sessionization q15 is the
# event-time analogue; this is the calendar-grid form used for
# retention/streak features.)
# --------------------------------------------------------------------------

def q90_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_testdata(spark, sf_dir, "events")
    days = e.select(
        "user_id", F.to_date("ts").alias("day")
    ).dropDuplicates(["user_id", "day"])
    w = W.partitionBy("user_id").orderBy("day")
    islands = days.withColumn(
        "__grp", F.datediff("day", F.lit("2024-01-01")) - F.row_number().over(w)
    )
    return (
        islands.groupBy("user_id", "__grp")
        .agg(
            F.date_format(F.min("day"), "yyyy-MM-dd").alias("streak_start"),
            F.date_format(F.max("day"), "yyyy-MM-dd").alias("streak_end"),
            F.count(F.lit(1)).alias("streak_days"),
        )
        .drop("__grp")
        .select("user_id", "streak_start", "streak_end", "streak_days")
    )


_Q90_SQL = """
WITH days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
),
islands AS (
  SELECT user_id, day,
         datediff('day', DATE '2024-01-01', day)
           - row_number() OVER (PARTITION BY user_id ORDER BY day) AS grp
  FROM days
)
SELECT user_id,
       strftime(min(day), '%Y-%m-%d') AS streak_start,
       strftime(max(day), '%Y-%m-%d') AS streak_end,
       count(*) AS streak_days
FROM islands
GROUP BY user_id, grp
"""


# --------------------------------------------------------------------------
# q91 — CDC latest-wins compaction: collapse a change log to the
# current snapshot (one row per key, the newest record). The batch
# form of reading a CDC/upsert stream: row_number() DESC = 1 per key
# — one exchange, per-key sort, no join. The deterministic event_id
# tie-break matters: at-least-once logs carry same-timestamp
# duplicates, and an undefined tie pick would flap between runs.
# (SCD2 q78 keeps the full history; this keeps only the head.)
# --------------------------------------------------------------------------

def q91_latest_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_testdata(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        e.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("last_event_id"),
            F.col("ts").alias("last_ts"),
            F.col("event_type").alias("last_type"),
            R(F.col("value"), 3).alias("last_value"),
        )
    )


_Q91_SQL = """
SELECT user_id,
       event_id AS last_event_id,
       ts AS last_ts,
       event_type AS last_type,
       floor(value * 1000.0 + 0.5) / 1000.0 AS last_value
FROM (
  SELECT *,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
WHERE rn = 1
"""


# --------------------------------------------------------------------------
# q92 — ratio-to-report: each (user, event_type)'s share of the
# user's total and of the global total, from ONE pre-aggregated pass.
# The unpartitioned share comes from a grand-total broadcast (scalar
# agg cross join), never a global window — the same single-partition
# trap q72 avoided. Plan: one group-by exchange + one per-user window
# over user-cardinality rows + a broadcast.
# --------------------------------------------------------------------------

def q92_ratio_to_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_testdata(spark, sf_dir, "events")
    per = e.groupBy("user_id", "event_type").agg(dec_sum("value").alias("__v"))
    w = W.partitionBy("user_id")
    total = e.agg(dec_sum("value").alias("__total"))
    return (
        per.withColumn("__user_total", F.sum(F.col("__v").cast("decimal(28,6)")).over(w).cast("double"))
        .crossJoin(F.broadcast(total))
        .select(
            "user_id",
            "event_type",
            R(F.col("__v"), 3).alias("type_value"),
            R(F.col("__v") / F.col("__user_total"), 6).alias("share_of_user"),
            R(F.col("__v") / F.col("__total"), 9).alias("share_of_total"),
        )
    )


_Q92_SQL = """
WITH per AS (
  SELECT user_id, event_type, CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS v
  FROM events GROUP BY 1, 2
)
SELECT user_id, event_type,
       floor(v * 1000.0 + 0.5) / 1000.0 AS type_value,
       floor((v / CAST(sum(CAST(v AS DECIMAL(28,6))) OVER (PARTITION BY user_id) AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0
         AS share_of_user,
       floor((v / (SELECT CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE) FROM events)) * 1000000000.0 + 0.5) / 1000000000.0
         AS share_of_total
FROM per
"""


# --------------------------------------------------------------------------
# q77 — skew-safe salted aggregation (oracle = the plain group-by)
# --------------------------------------------------------------------------

SALT_N = 16


def q77_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The five event_type values make a pathologically hot-keyed
    aggregation (5 reducers own everything). salted_sum_count spreads
    each key over {SALT_N} deterministic sub-keys (partial agg) and
    recombines — the oracle is the PLAIN group-by, proving the salted
    two-phase plan is result-identical. This is the aggregation shape
    to reach for when one key owns 30% of 100 TB."""
    from nyc_etl_pipeline_spark.operators.skew import salted_sum_count

    e = read_testdata(spark, sf_dir, "events")
    out = salted_sum_count(e, "event_type", "value", n_salts=SALT_N)
    return out.select(
        "event_type",
        R(F.col("sum_value"), 3).alias("total_value"),
        F.col("n_rows"),
    )


_Q77_SQL = """
SELECT event_type,
       floor((CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE)) * 1000.0 + 0.5) / 1000.0 AS total_value,
       count(*) AS n_rows
FROM events
GROUP BY 1
"""


# --------------------------------------------------------------------------
# q79 — NATIVE session windows (F.session_window). q15 proves the
# windowing-functions formulation; this gates Spark's built-in session
# operator — the same one Structured Streaming uses for watermarked
# streaming sessions (merging session state per key, bounded by the
# gap). Boundary semantics differ from q15's: an event exactly at
# last_ts + gap starts a NEW session (window end is exclusive), so the
# oracle uses >= where q15 uses >.
# --------------------------------------------------------------------------

def q79_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_testdata(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            R(dec_sum("value"), 3).alias("total_value"),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


_Q79_SQL = """
WITH flagged AS (
  SELECT user_id, ts, value,
         CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
sessions AS (
  SELECT user_id, ts, value,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
  FROM flagged
)
SELECT user_id,
       min(ts) AS session_start,
       max(ts) + INTERVAL 30 MINUTE AS session_end,
       count(*) AS n_events,
       floor((CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE)) * 1000.0 + 0.5) / 1000.0 AS total_value
FROM sessions
GROUP BY user_id, session_idx
"""


# --------------------------------------------------------------------------
# q78 — SCD type-2 interval build from the event log. The reference's
# gold layer upserts dims type-1 (gold.py:150-240, latest value wins);
# this derives full validity history: per user, each event_type change
# opens an interval, closed by the next change. Window-only plan —
# one exchange on the key, no iteration, no driver state.
# --------------------------------------------------------------------------

def q78_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nyc_etl_pipeline_spark.operators.scd import scd2_from_log

    e = read_testdata(spark, sf_dir, "events")
    return scd2_from_log(
        e, key_cols=["user_id"], attr_col="event_type", ts_col="ts",
        tie_cols=["event_id"],
    )


_Q78_SQL = """
WITH ordered AS (
  SELECT user_id, event_type, ts, event_id,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events
),
changes AS (
  SELECT user_id, event_type, ts, event_id FROM ordered
  WHERE prev IS NULL OR prev <> event_type
)
SELECT user_id, event_type,
       ts AS valid_from,
       lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
       lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL AS is_current
FROM changes
"""


# --------------------------------------------------------------------------
# q132 — session transition matrix (behavioral bigrams)
# --------------------------------------------------------------------------

def q132_session_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type transition matrix within 30-min sessions: for each
    (from_type, to_type) adjacent pair inside a session, the count and
    the row-normalized transition probability — the Markov-chain view
    of user behavior a product-analytics pipeline derives from the
    same sessionization as q15. One shuffle on user_id; the lag chain
    and both aggregations are per-user-local then hash-combined.
    Ties in ts within a user are ordered by event_id (total order, so
    the pair sequence is engine-independent)."""
    e = read_testdata(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = 30 * 60 * 1_000_000
    flagged = e.withColumn(
        "__new_session",
        F.when(
            (F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))) > gap_us,
            F.lit(1),
        ).otherwise(F.lit(0)),
    ).withColumn(
        "__session_idx",
        F.sum("__new_session").over(w.rowsBetween(W.unboundedPreceding, 0)),
    )
    ws = W.partitionBy("user_id", "__session_idx").orderBy("ts", "event_id")
    pairs = (
        flagged.withColumn("__next", F.lead("event_type").over(ws))
        .filter(F.col("__next").isNotNull())
        .select(F.col("event_type").alias("from_type"), F.col("__next").alias("to_type"))
    )
    cnt = pairs.groupBy("from_type", "to_type").agg(F.count(F.lit(1)).alias("n"))
    tot = cnt.groupBy("from_type").agg(F.sum("n").alias("__t"))
    return cnt.join(tot, "from_type").select(
        "from_type", "to_type", "n", R(F.col("n") / F.col("__t"), 6).alias("p")
    )


_Q132_SQL = f"""
WITH flagged AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
  SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
  FROM flagged
),
pairs AS (
  SELECT event_type AS from_type,
         lead(event_type) OVER (PARTITION BY user_id, session_idx
                                ORDER BY ts, event_id) AS to_type
  FROM sessions
),
cnt AS (
  SELECT from_type, to_type, count(*) AS n FROM pairs
  WHERE to_type IS NOT NULL GROUP BY 1, 2
)
SELECT from_type, to_type, n,
       {sql_round_half_up('n * 1.0 / sum(n) OVER (PARTITION BY from_type)', 6)} AS p
FROM cnt
"""


# --------------------------------------------------------------------------
# q133 — time-weighted average value per user (TWAP)
# --------------------------------------------------------------------------

def q133_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user TIME-weighted average: each observation's value holds
    until the user's next event, so it is weighted by that holding
    duration (the last observation carries no weight — no lookahead).
    The metric a monitoring/trading pipeline wants when events arrive
    irregularly and a plain avg() over-weights bursts.

    Exactness: weights are integer microseconds; each value*weight
    product is decimal-cast before summing (dec_sum discipline), so
    the result is merge-order invariant. One shuffle on user_id."""
    e = read_testdata(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    dur = (F.unix_micros(F.lead("ts").over(w)) - F.unix_micros(F.col("ts"))).alias("__w")
    weighted = e.select("user_id", "value", dur).filter(F.col("__w").isNotNull())
    num = F.sum((F.col("value") * F.col("__w")).cast("decimal(38,6)")).cast("double")
    den = F.sum("__w")
    return (
        weighted.groupBy("user_id")
        .agg(num.alias("__num"), den.alias("__den"), F.count(F.lit(1)).alias("n_holds"))
        .select(
            "user_id",
            "n_holds",
            R(F.col("__num") / F.col("__den"), 6).alias("twap"),
        )
    )


_Q133_SQL = f"""
WITH held AS (
  SELECT user_id, value,
         epoch_us(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
           - epoch_us(ts) AS w
  FROM events
)
SELECT user_id,
       count(*) AS n_holds,
       {sql_round_half_up('CAST(sum(CAST(value * w AS DECIMAL(38,6))) AS DOUBLE) / sum(w)', 6)} AS twap
FROM held WHERE w IS NOT NULL
GROUP BY 1
"""


# --------------------------------------------------------------------------
# q134 — running distinct users per day (growth analytics)
# --------------------------------------------------------------------------

def q134_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct users by day WITHOUT a running COUNT
    (DISTINCT) window (which buffers the whole id set per frame): each
    user reduces to their FIRST-seen day (one hash agg), daily
    first-appearance counts cumulate with an ordinary running sum, and
    daily actives come from a second small agg. Exact, and every stage
    is partial-aggregable — the formulation that survives a billion
    users where the naive distinct-window OOMs."""
    e = read_testdata(spark, sf_dir, "events")
    first_day = (
        e.groupBy("user_id")
        .agg(F.min(F.date_trunc("day", F.col("ts"))).alias("day"))
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("new_users"))
    )
    daily = (
        e.select(F.date_trunc("day", F.col("ts")).alias("day"), "user_id")
        .distinct()
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("active_users"))
    )
    w = W.orderBy("day").rowsBetween(W.unboundedPreceding, 0)
    # single-partition OK: input is one row per DAY (bounded by the
    # calendar, not the data)
    return (
        first_day.join(daily, "day")
        .withColumn("cum_users", F.sum("new_users").over(w))
        .select("day", "new_users", "active_users", "cum_users")
    )


_Q134_SQL = """
WITH first_day AS (
  SELECT day, count(*) AS new_users FROM (
    SELECT user_id, min(date_trunc('day', ts)) AS day FROM events GROUP BY 1
  ) GROUP BY 1
),
daily AS (
  SELECT day, count(*) AS active_users FROM (
    SELECT DISTINCT date_trunc('day', ts) AS day, user_id FROM events
  ) GROUP BY 1
)
SELECT f.day, f.new_users, d.active_users,
       CAST(sum(f.new_users) OVER (ORDER BY f.day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_users
FROM first_day f JOIN daily d ON f.day = d.day
"""


# --------------------------------------------------------------------------
# q131 — grid-bucketed spatial radius self-join (haversine verify)
# --------------------------------------------------------------------------

GEO_RADIUS_M = 200.0
GEO_CELL_DEG = 0.0025  # >= one radius in degrees on both axes at 40.7N


def q131_radius_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point pairs within 200 m over NYC-box coordinates synthesized
    deterministically from event ids (the q54/q71 injection pattern —
    both engines build identical points, so the cell bucketing AND the
    exact haversine verification are genuinely gated). Banding pattern
    #3: 3x3 neighbor-cell equi-join, never |P|^2."""
    from nyc_etl_pipeline_spark.operators import geo
    from nyc_etl_pipeline_spark.functions import md5_long

    e = read_testdata(spark, sf_dir, "events")
    u = lambda salt: (  # noqa: E731 — uniform [0,1) from a salted md5
        F.pmod(md5_long(F.concat(F.lit(salt), F.col("event_id").cast("string"))), F.lit(1000000))
        / F.lit(1000000.0)
    )
    pts = e.select(
        F.col("event_id").alias("point_id"),
        (F.lit(40.50) + u("lat") * F.lit(0.40)).alias("lat"),
        (F.lit(-74.20) + u("lon") * F.lit(0.50)).alias("lon"),
    )
    out = geo.radius_pairs(pts, GEO_RADIUS_M, GEO_CELL_DEG)
    return out.select("a_id", "b_id", R(F.col("dist_m"), 1).alias("dist_m"))


def _q131_sql() -> str:
    from nyc_etl_pipeline_spark.functions import sql_md5_long
    from nyc_etl_pipeline_spark.operators.geo import sql_haversine_m

    lat_u = f"({sql_md5_long(chr(39) + 'lat' + chr(39) + ' || CAST(event_id AS VARCHAR)')} % 1000000) / 1000000.0"
    lon_u = f"({sql_md5_long(chr(39) + 'lon' + chr(39) + ' || CAST(event_id AS VARCHAR)')} % 1000000) / 1000000.0"
    dist = sql_haversine_m("a.lat", "a.lon", "b.lat", "b.lon")
    return f"""
WITH pts AS (
  SELECT event_id AS point_id,
         40.50 + {lat_u} * 0.40 AS lat,
         -74.20 + {lon_u} * 0.50 AS lon
  FROM events
),
cells AS (
  SELECT *, CAST(floor(lat / {GEO_CELL_DEG}) AS BIGINT) AS cx,
            CAST(floor(lon / {GEO_CELL_DEG}) AS BIGINT) AS cy
  FROM pts
),
pairs AS (
  SELECT a.point_id AS a_id, b.point_id AS b_id, {dist} AS d
  FROM cells a JOIN cells b
    ON b.cx BETWEEN a.cx - 1 AND a.cx + 1
   AND b.cy BETWEEN a.cy - 1 AND a.cy + 1
   AND a.point_id < b.point_id
)
SELECT a_id, b_id, {sql_round_half_up('d', 1)} AS dist_m
FROM pairs WHERE d <= {GEO_RADIUS_M}
"""


# --------------------------------------------------------------------------
# q130 — per-key linear trend fit (daily volume slope, monitoring)
# --------------------------------------------------------------------------

def q130_trend_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type OLS trend of daily total value vs day index —
    the is-this-metric-drifting primitive a pipeline monitor fits per
    slice. Deliberately formulated as the five classic sums (n, Σx,
    Σy, Σxy, Σx²) with the SAME expression order in both engines
    (q84's bit-exact-framed-sums approach) instead of builtin
    regr_slope/covar aggregates, whose accumulation order differs
    across engines at the last ulp. Two hash aggregations, no window,
    no driver round-trip."""
    e = read_testdata(spark, sf_dir, "events")
    daily = (
        e.groupBy(
            "event_type",
            F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date")).alias("x"),
        )
        .agg(dec_sum("value").alias("y"))
    )
    sums = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("x").cast("double")).alias("sx"),
        F.sum(F.col("y").cast("decimal(28,6)")).cast("double").alias("sy"),
        F.sum((F.col("x").cast("double") * F.col("y")).cast("decimal(28,6)")).cast("double").alias("sxy"),
        F.sum(F.col("x").cast("double") * F.col("x").cast("double")).alias("sxx"),
    )
    n = F.col("n").cast("double")
    denom = n * F.col("sxx") - F.col("sx") * F.col("sx")
    # single-distinct-day groups have denom == 0: emit NULL explicitly
    # in BOTH engines (Spark's non-ANSI x/0.0 is NULL but DuckDB's
    # IEEE mode returns Inf/NaN — an engine-divergence trap)
    slope = F.when(denom != 0, (n * F.col("sxy") - F.col("sx") * F.col("sy")) / denom)
    intercept = F.when(denom != 0, (F.col("sy") - slope * F.col("sx")) / n)
    return sums.select(
        "event_type",
        F.col("n").alias("n_days"),
        R(slope, 4).alias("slope"),
        R(intercept, 4).alias("intercept"),
    )


_Q130_SQL = f"""
WITH daily AS (
  SELECT event_type,
         date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS x,
         CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS y
  FROM events GROUP BY 1, 2
),
sums AS (
  SELECT event_type, count(*) AS n,
         sum(CAST(x AS DOUBLE)) AS sx, CAST(sum(CAST(y AS DECIMAL(28,6))) AS DOUBLE) AS sy,
         CAST(sum(CAST(CAST(x AS DOUBLE) * y AS DECIMAL(28,6))) AS DOUBLE) AS sxy,
         sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS sxx
  FROM daily GROUP BY 1
)
SELECT event_type, n AS n_days,
       CASE WHEN CAST(n AS DOUBLE) * sxx - sx * sx = 0 THEN NULL ELSE
       {sql_round_half_up(
           '(CAST(n AS DOUBLE) * sxy - sx * sy) / (CAST(n AS DOUBLE) * sxx - sx * sx)', 4)} END AS slope,
       CASE WHEN CAST(n AS DOUBLE) * sxx - sx * sx = 0 THEN NULL ELSE
       {sql_round_half_up(
           '(sy - ((CAST(n AS DOUBLE) * sxy - sx * sy) / (CAST(n AS DOUBLE) * sxx - sx * sx)) * sx) / CAST(n AS DOUBLE)', 4)} END AS intercept
FROM sums
"""


# --------------------------------------------------------------------------
# q139 — CDC change-log apply (latest-wins WITH deletes)
# --------------------------------------------------------------------------

def q139_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Current snapshot from a Debezium/binlog-style change feed via
    operators/scd.cdc_snapshot — the missing piece between q91's
    latest-wins upsert (no deletes) and q78's SCD2 history. The op
    column is injected deterministically from event_type (the
    q54/q71 injection pattern: signup='I', error='D', rest='U'), so
    both engines replay the identical log; a user whose LATEST op is
    a delete must be absent."""
    from nyc_etl_pipeline_spark.operators.scd import cdc_snapshot

    e = read_testdata(spark, sf_dir, "events")
    log = e.select(
        "event_id", "user_id", "ts", "value",
        F.when(F.col("event_type") == "signup", "I")
        .when(F.col("event_type") == "error", "D")
        .otherwise("U")
        .alias("op"),
    )
    snap = cdc_snapshot(log, ["user_id"], "ts", "op", tie_cols=["event_id"])
    return snap.select(
        "user_id",
        F.col("ts").alias("last_ts"),
        R(F.col("value"), 3).alias("last_value"),
        F.col("op").alias("last_op"),
    )


_Q139_SQL = f"""
WITH log AS (
  SELECT event_id, user_id, ts, value,
         CASE WHEN event_type = 'signup' THEN 'I'
              WHEN event_type = 'error' THEN 'D'
              ELSE 'U' END AS op
  FROM events
),
r AS (
  SELECT *, row_number() OVER (PARTITION BY user_id
                               ORDER BY ts DESC, event_id DESC) AS rn
  FROM log
)
SELECT user_id, ts AS last_ts,
       {sql_round_half_up('value', 3)} AS last_value,
       op AS last_op
FROM r WHERE rn = 1 AND op <> 'D'
"""


# --------------------------------------------------------------------------
# q142 — robust per-type outlier report (median + MAD)
# --------------------------------------------------------------------------

MAD_K = 3.0


def q142_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median/MAD outlier gate per event type — the contamination-
    tolerant counterpart to q84's z-score bands (a single huge value
    inflates a stddev enough to mask real outliers; it moves a median
    by one rank)."""
    from nyc_etl_pipeline_spark.operators.quality import mad_outlier_report

    return mad_outlier_report(
        read_testdata(spark, sf_dir, "events"), "event_type", "value", k=MAD_K
    )


_Q142_SQL = f"""
WITH med AS (
  SELECT event_type, quantile_cont(CAST(value AS DOUBLE), 0.5) AS med
  FROM events GROUP BY 1
),
dev AS (
  SELECT e.event_type,
         abs(CAST(e.value AS DOUBLE) - m.med) AS dev,
         m.med
  FROM events e JOIN med m ON e.event_type = m.event_type
),
mad AS (
  SELECT event_type, quantile_cont(dev, 0.5) AS mad
  FROM dev GROUP BY 1
)
SELECT d.event_type,
       {sql_round_half_up('d.med', 6)} AS med,
       {sql_round_half_up('a.mad', 6)} AS mad,
       count(*) AS n,
       count(CASE WHEN d.dev > {MAD_K} * a.mad THEN 1 END) AS n_outliers,
       {sql_round_half_up(f'count(CASE WHEN d.dev > {MAD_K} * a.mad THEN 1 END) * 1.0 / count(*)', 4)} AS outlier_rate
FROM dev d JOIN mad a ON d.event_type = a.event_type
GROUP BY d.event_type, d.med, a.mad
"""


# --------------------------------------------------------------------------
# q144 — 7-day rolling median of daily totals per event type
# --------------------------------------------------------------------------

ROLL_MED_PRECEDING = 6


def q144_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust monitoring smoother: daily dec_sum totals, then an exact
    trailing-7-row median. Spark can't frame `median`, so the operator
    collects the bounded frame and interpolates with the identical
    lower + frac*(upper-lower) arithmetic as DuckDB's windowed
    quantile_cont."""
    from nyc_etl_pipeline_spark.operators.timeseries import rolling_median

    e = read_testdata(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(dec_sum("value").alias("__total"))
    return daily.select(
        "event_type",
        "day",
        R(
            rolling_median("event_type", "day", "__total", ROLL_MED_PRECEDING),
            3,
        ).alias("med7"),
    )


_Q144_SQL = f"""
WITH daily AS (
  SELECT event_type, date_trunc('day', ts) AS day,
         CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS total
  FROM events GROUP BY 1, 2
)
SELECT event_type, day,
       {sql_round_half_up("quantile_cont(total, 0.5) OVER (PARTITION BY event_type ORDER BY day ROWS BETWEEN " + str(ROLL_MED_PRECEDING) + " PRECEDING AND CURRENT ROW)", 3)} AS med7
FROM daily
"""


# --------------------------------------------------------------------------
# q147 — session-basket association rules (support / confidence / lift)
# --------------------------------------------------------------------------

def q147_session_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association over sessions-as-baskets: for every
    unordered event-type pair, co-occurrence count, support,
    both-direction confidence, and lift. Complements q132's ADJACENCY
    transitions — lift measures co-presence anywhere in the session.

    Scale shape: the basket self-join runs on (user, session) AFTER a
    distinct that collapses each session to <=|event types| rows, so
    its fan-out is bounded by types^2 per session, never events^2.
    All ratios divide exact integer products (bigint-safe: counts *
    sessions stays under 2^63 at any realistic scale) — both engines
    convert the same integers to double, so parity needs no decimal
    machinery."""
    e = read_testdata(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = 30 * 60 * 1_000_000
    items = (
        e.withColumn(
            "__new_session",
            F.when(
                (F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))) > gap_us,
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
        .withColumn(
            "__session_idx",
            F.sum("__new_session").over(w.rowsBetween(W.unboundedPreceding, 0)),
        )
        .select("user_id", "__session_idx", "event_type")
        .distinct()
    )
    n_sessions = items.select("user_id", "__session_idx").distinct().agg(
        F.count(F.lit(1)).alias("__n_sessions")
    )
    per_type = items.groupBy("event_type").agg(F.count(F.lit(1)).alias("__n_t"))
    a = items.select("user_id", "__session_idx", F.col("event_type").alias("a_type"))
    b = items.select("user_id", "__session_idx", F.col("event_type").alias("b_type"))
    pairs = (
        a.join(b, on=["user_id", "__session_idx"])
        .filter(F.col("a_type") < F.col("b_type"))
        .groupBy("a_type", "b_type")
        .agg(F.count(F.lit(1)).alias("n_ab"))
    )
    na = per_type.select(F.col("event_type").alias("a_type"), F.col("__n_t").alias("__na"))
    nb = per_type.select(F.col("event_type").alias("b_type"), F.col("__n_t").alias("__nb"))
    out = (
        pairs.join(F.broadcast(na), "a_type")
        .join(F.broadcast(nb), "b_type")
        .crossJoin(F.broadcast(n_sessions))
    )
    return out.select(
        "a_type",
        "b_type",
        "n_ab",
        R(F.col("n_ab") / F.col("__n_sessions"), 6).alias("support"),
        R(F.col("n_ab") / F.col("__na"), 6).alias("conf_ab"),
        R(F.col("n_ab") / F.col("__nb"), 6).alias("conf_ba"),
        R(
            (F.col("n_ab") * F.col("__n_sessions")) / (F.col("__na") * F.col("__nb")), 6
        ).alias("lift"),
    )


_Q147_SQL = f"""
WITH flagged AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
items AS (
  SELECT DISTINCT user_id,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx,
         event_type
  FROM flagged
),
ns AS (SELECT count(*) AS n_sessions
       FROM (SELECT DISTINCT user_id, session_idx FROM items)),
per_type AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_t
             FROM items GROUP BY 1),
pairs AS (
  SELECT a.event_type AS a_type, b.event_type AS b_type,
         CAST(count(*) AS BIGINT) AS n_ab
  FROM items a
  JOIN items b ON a.user_id = b.user_id AND a.session_idx = b.session_idx
              AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT a_type, b_type, n_ab,
       {sql_round_half_up('n_ab * 1.0 / ns.n_sessions', 6)} AS support,
       {sql_round_half_up('n_ab * 1.0 / na.n_t', 6)} AS conf_ab,
       {sql_round_half_up('n_ab * 1.0 / nb.n_t', 6)} AS conf_ba,
       {sql_round_half_up('(n_ab * ns.n_sessions) * 1.0 / (na.n_t * nb.n_t)', 6)} AS lift
FROM pairs
JOIN per_type na ON pairs.a_type = na.event_type
JOIN per_type nb ON pairs.b_type = nb.event_type
CROSS JOIN ns
"""


# --------------------------------------------------------------------------
# q148 — IPv4/CIDR network classification (broadcast range join)
# --------------------------------------------------------------------------

# (label, cidr) -> [lo, hi) computed in Python; the SAME integers land
# in the Spark literal DataFrame and the oracle's VALUES list.
CIDR_NETS = [
    ("private10", "10.0.0.0/8"),
    ("cgnat", "100.64.0.0/10"),
    ("private172", "172.16.0.0/12"),
    ("private192", "192.168.0.0/16"),
    ("multicast", "224.0.0.0/4"),
]


def _cidr_bounds() -> list[tuple[str, int, int]]:
    out = []
    for label, cidr in CIDR_NETS:
        base, plen = cidr.split("/")
        a, b, c, d = (int(x) for x in base.split("."))
        lo = (a << 24) | (b << 16) | (c << 8) | d
        out.append((label, lo, lo + (1 << (32 - int(plen)))))
    return out


def _dotted_quad(col):  # Spark column: bigint ip -> 'a.b.c.d'
    octs = [
        (F.shiftright(col, s).bitwiseAND(F.lit(255))).cast("string")
        for s in (24, 16, 8, 0)
    ]
    return F.concat_ws(".", *octs)


def q148_ip_cidr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classify per-user synthetic IPv4 addresses (md5-derived, same
    derivation in the oracle) into CIDR blocks: the log-enrichment /
    bot-filtering primitive. The range table is bounded, so the
    non-equi containment join broadcasts (BroadcastNestedLoopJoin is
    linear in the probe side); unmatched IPs fall through to
    'public'. Output is integers + formatted dotted quads."""
    from nyc_etl_pipeline_spark.functions import md5_long

    users = read_testdata(spark, sf_dir, "events").select("user_id").distinct()
    ips = users.select(
        F.pmod(
            md5_long(F.concat(F.lit("ip:"), F.col("user_id").cast("string"))),
            F.lit(4294967296),
        ).alias("ip")
    )
    nets = spark.createDataFrame(_cidr_bounds(), ["label", "lo", "hi"])
    j = ips.join(
        F.broadcast(nets),
        (F.col("ip") >= F.col("lo")) & (F.col("ip") < F.col("hi")),
        "left",
    ).select("ip", F.coalesce(F.col("label"), F.lit("public")).alias("label"))
    return j.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.min("ip").alias("min_ip"),
        _dotted_quad(F.min("ip")).alias("sample_ip"),
    )


def _q148_sql() -> str:
    from nyc_etl_pipeline_spark.functions import sql_md5_long

    vals = ", ".join(f"('{l}', {lo}, {hi})" for l, lo, hi in _cidr_bounds())
    ip_expr = sql_md5_long("'ip:' || CAST(user_id AS VARCHAR)") + " % 4294967296"
    quad = " || '.' || ".join(
        f"CAST((min(ip) >> {s}) & 255 AS VARCHAR)" for s in (24, 16, 8, 0)
    )
    return f"""
WITH users AS (SELECT DISTINCT user_id FROM events),
ips AS (SELECT {ip_expr} AS ip FROM users),
nets(label, lo, hi) AS (VALUES {vals}),
j AS (
  SELECT i.ip, coalesce(n.label, 'public') AS label
  FROM ips i LEFT JOIN nets n ON i.ip >= n.lo AND i.ip < n.hi
)
SELECT label,
       CAST(count(*) AS BIGINT) AS n_users,
       CAST(min(ip) AS BIGINT) AS min_ip,
       {quad} AS sample_ip
FROM j GROUP BY label
"""


# --------------------------------------------------------------------------
# q150 — capped sessionization (inactivity gap OR hard duration cap)
# --------------------------------------------------------------------------

CAP_GAP_US = 30 * 60 * 1_000_000   # 30-min inactivity, as q15/q132
CAP_DUR_US = 45 * 60 * 1_000_000   # 45-min hard cap (fixture sessions reach ~57 min)


def q150_capped_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram of per-user session counts under gap-OR-cap
    sessionization. The cap's loop-carried dependency forces the
    applyInPandas scan on the Spark side; the oracle replays the same
    recurrence as a recursive CTE stepping one event rank at a time
    (depth = max events per user)."""
    from nyc_etl_pipeline_spark.operators.pandas_ops import capped_sessionize

    e = read_testdata(spark, sf_dir, "events")
    s = capped_sessionize(e, "user_id", "ts", "event_id", CAP_GAP_US, CAP_DUR_US)
    per_user = s.groupBy("user_id").agg(F.max("session_idx").alias("n_sessions"))
    return per_user.groupBy("n_sessions").agg(F.count(F.lit(1)).alias("n_users"))


_Q150_SQL = f"""
WITH RECURSIVE ordered AS (
  SELECT user_id, epoch_us(ts) AS us,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
),
r AS (
  SELECT user_id, rn, us, 1 AS session_idx, us AS session_start
  FROM ordered WHERE rn = 1
  UNION ALL
  SELECT o.user_id, o.rn, o.us,
         CASE WHEN o.us - r.us > {CAP_GAP_US} OR o.us - r.session_start > {CAP_DUR_US}
              THEN r.session_idx + 1 ELSE r.session_idx END,
         CASE WHEN o.us - r.us > {CAP_GAP_US} OR o.us - r.session_start > {CAP_DUR_US}
              THEN o.us ELSE r.session_start END
  FROM r JOIN ordered o ON o.user_id = r.user_id AND o.rn = r.rn + 1
),
per_user AS (
  SELECT user_id, CAST(max(session_idx) AS BIGINT) AS n_sessions
  FROM r GROUP BY 1
)
SELECT n_sessions, CAST(count(*) AS BIGINT) AS n_users
FROM per_user GROUP BY 1
"""


# --------------------------------------------------------------------------
# q152 — winsorized statistics per event type
# --------------------------------------------------------------------------

WINSOR_LO, WINSOR_HI = 0.05, 0.95


def q152_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nyc_etl_pipeline_spark.operators.quality import winsorize_report

    return winsorize_report(
        read_testdata(spark, sf_dir, "events"), "event_type", "value", WINSOR_LO, WINSOR_HI
    )


_Q152_SQL = f"""
WITH p AS (
  SELECT event_type,
         quantile_cont(CAST(value AS DOUBLE), {WINSOR_LO}) AS lo,
         quantile_cont(CAST(value AS DOUBLE), {WINSOR_HI}) AS hi
  FROM events GROUP BY 1
),
c AS (
  SELECT e.event_type, CAST(e.value AS DOUBLE) AS v, p.lo, p.hi,
         CASE WHEN CAST(e.value AS DOUBLE) < p.lo THEN p.lo
              WHEN CAST(e.value AS DOUBLE) > p.hi THEN p.hi
              ELSE CAST(e.value AS DOUBLE) END AS w
  FROM events e JOIN p ON e.event_type = p.event_type
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(count(CASE WHEN v < lo THEN 1 END) AS BIGINT) AS n_low,
       CAST(count(CASE WHEN v > hi THEN 1 END) AS BIGINT) AS n_high,
       {sql_round_half_up(sql_dec_avg('v'), 6)} AS mean_raw,
       {sql_round_half_up(sql_dec_avg('w'), 6)} AS mean_winsor
FROM c GROUP BY event_type
"""


# --------------------------------------------------------------------------
# q153 — Benford first-digit distribution + chi-square per event type
# --------------------------------------------------------------------------

def q153_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nyc_etl_pipeline_spark.operators.quality import benford_report

    return benford_report(read_testdata(spark, sf_dir, "events"), "event_type", "value")


def _q153_sql() -> str:
    from nyc_etl_pipeline_spark.operators.quality import BENFORD_P

    dcounts = ",\n       ".join(
        f"CAST(count(CASE WHEN d = {d} THEN 1 END) AS BIGINT) AS d{d}"
        for d in range(1, 10)
    )
    terms = " + ".join(
        f"(d{d} - n * CAST('{BENFORD_P[d]!r}' AS DOUBLE)) * "
        f"(d{d} - n * CAST('{BENFORD_P[d]!r}' AS DOUBLE)) / "
        f"(n * CAST('{BENFORD_P[d]!r}' AS DOUBLE))"
        for d in range(1, 10)
    )
    return f"""
WITH s AS (
  SELECT event_type,
         CAST(floor(CAST(value AS DOUBLE) * 1000000.0) AS BIGINT) AS sc
  FROM events
),
f AS (
  SELECT event_type, CAST(substr(CAST(sc AS VARCHAR), 1, 1) AS INTEGER) AS d
  FROM s WHERE sc > 0
),
c AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       {dcounts}
  FROM f GROUP BY 1
)
SELECT event_type, n, d1, d2, d3, d4, d5, d6, d7, d8, d9,
       {sql_round_half_up(terms, 6)} AS chi2
FROM c
"""


# --------------------------------------------------------------------------
# q157 — exact KS drift statistic per event type vs the pooled corpus
# --------------------------------------------------------------------------

def q157_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nyc_etl_pipeline_spark.operators.quality import ks_vs_global

    return ks_vs_global(read_testdata(spark, sf_dir, "events"), "event_type", "value")


_Q157_SQL = f"""
WITH vals AS (SELECT event_type, CAST(value AS DOUBLE) AS v FROM events
              WHERE value IS NOT NULL),
ac AS (SELECT event_type, v, count(*) AS a FROM vals GROUP BY 1, 2),
gc AS (SELECT v, count(*) AS g FROM vals GROUP BY 1),
types AS (SELECT DISTINCT event_type FROM vals),
grid AS (
  SELECT t.event_type, gc.v, gc.g, coalesce(ac.a, 0) AS a
  FROM types t CROSS JOIN gc
  LEFT JOIN ac ON ac.event_type = t.event_type AND ac.v = gc.v
),
cum AS (
  SELECT event_type,
         CAST(sum(a) OVER (PARTITION BY event_type ORDER BY v
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS ca,
         CAST(sum(g) OVER (PARTITION BY event_type ORDER BY v
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cg
  FROM grid
),
tot AS (SELECT event_type, CAST(sum(a) AS BIGINT) AS na FROM grid GROUP BY 1),
n AS (SELECT CAST(count(*) AS BIGINT) AS ng FROM vals),
d AS (
  SELECT c.event_type, t.na, n.ng,
         CAST(max(abs(c.ca * n.ng - c.cg * t.na)) AS BIGINT) AS dnum
  FROM cum c JOIN tot t ON c.event_type = t.event_type CROSS JOIN n
  GROUP BY 1, 2, 3
)
SELECT event_type, na AS n_a, dnum AS d_num,
       {sql_round_half_up('dnum * 1.0 / (na * ng)', 6)} AS ks
FROM d
"""


# --------------------------------------------------------------------------
# q158 — Theil-Sen robust slope of daily totals per event type
# --------------------------------------------------------------------------

DAY_US = 86400000000.0  # one shared constant feeds BOTH engines
_DAY_US = f"CAST({int(DAY_US)} AS DOUBLE)"


def q158_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median of all pairwise day-slopes — the robust trend estimator
    q130's OLS is not (one corrupted day drags a least-squares line;
    it moves the slope median by one rank). The pair self-join is
    per-type and bounded by days^2 (~30 days -> <=435 pairs/type —
    this is the small-group robust fit, not a corpus-sized join); the
    median reuses the spillable exact-percentile pass. Slopes are
    per-pair doubles with identical expression order on both engines;
    daily totals are decimal-accumulated first."""
    from nyc_etl_pipeline_spark.operators.quality import exact_percentiles_sorted

    e = read_testdata(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("d")
    ).agg(dec_sum("value").alias("t"))
    a = daily.select("event_type", F.col("d").alias("da"), F.col("t").alias("ta"))
    b = daily.select("event_type", F.col("d").alias("db"), F.col("t").alias("tb"))
    pairs = a.join(b, "event_type").filter(F.col("da") < F.col("db"))
    slope = (F.col("tb") - F.col("ta")) / (
        (F.unix_micros(F.col("db")) - F.unix_micros(F.col("da")))
        / F.lit(DAY_US)
    )
    slopes = pairs.select("event_type", slope.alias("slope"))
    med = exact_percentiles_sorted(slopes, "event_type", "slope", [0.5]).select(
        "event_type", F.col("p_5").alias("__m")
    )
    n_days = daily.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_days"))
    n_pairs = slopes.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_pairs"))
    return (
        n_days.join(n_pairs, "event_type")
        .join(med, "event_type")
        .select("event_type", "n_days", "n_pairs", R(F.col("__m"), 6).alias("ts_slope"))
    )


_Q158_SQL = f"""
WITH daily AS (
  SELECT event_type, date_trunc('day', ts) AS d,
         CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS t
  FROM events GROUP BY 1, 2
),
p AS (
  SELECT a.event_type,
         (b.t - a.t) / ((epoch_us(b.d) - epoch_us(a.d)) / {_DAY_US}) AS slope
  FROM daily a JOIN daily b ON a.event_type = b.event_type AND a.d < b.d
),
m AS (
  SELECT event_type, quantile_cont(slope, 0.5) AS ts_slope,
         CAST(count(*) AS BIGINT) AS n_pairs
  FROM p GROUP BY 1
),
nd AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days FROM daily GROUP BY 1)
SELECT nd.event_type, nd.n_days, m.n_pairs,
       {sql_round_half_up('m.ts_slope', 6)} AS ts_slope
FROM nd JOIN m ON nd.event_type = m.event_type
"""


# --------------------------------------------------------------------------
# q159 — Gini concentration coefficient of value per event type
# --------------------------------------------------------------------------

def q159_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient via the sorted-rank identity
    G = 2*sum(i*x_(i)) / (n*sum(x)) - (n+1)/n — the concentration
    report behind 'how skewed is the token/value budget across
    users/sources'. One spillable per-group sort (row_number), then
    two decimal-accumulated sums; rank ties on equal x don't affect
    sum(i*x) (equal values x distribute over consecutive ranks), so
    no tie-break column is needed. All remaining arithmetic is a
    fixed-order scalar expression on both engines. NULL values are
    dropped on both sides (the quality-operator null contract): a
    NULL ranks FIRST in Spark's window but LAST in DuckDB's, shifting
    every i."""
    e = read_testdata(spark, sf_dir, "events")
    w = W.partitionBy("event_type").orderBy("__x")
    ranked = (
        e.select(
            "event_type",
            F.col("value").cast("double").alias("__x"),
        )
        .where(F.col("__x").isNotNull())
        .withColumn("__i", F.row_number().over(w))
    )
    agg = ranked.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        dec_sum("__x").alias("__s0"),
        dec_sum(F.col("__i") * F.col("__x")).alias("__s1"),
    )
    gini = (F.lit(2.0) * F.col("__s1")) / (F.col("n") * F.col("__s0")) - (
        F.col("n") + F.lit(1.0)
    ) / F.col("n")
    return agg.select("event_type", "n", R(gini, 6).alias("gini"))


_Q159_SQL = f"""
WITH ranked AS (
  SELECT event_type, CAST(value AS DOUBLE) AS x,
         row_number() OVER (PARTITION BY event_type ORDER BY value) AS i
  FROM events WHERE value IS NOT NULL
),
agg AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(x AS DECIMAL(28,6))) AS DOUBLE) AS s0,
         CAST(sum(CAST(i * x AS DECIMAL(28,6))) AS DOUBLE) AS s1
  FROM ranked GROUP BY 1
)
SELECT event_type, n,
       {sql_round_half_up('(2.0 * s1) / (n * s0) - (n + 1.0) / n', 6)} AS gini
FROM agg
"""


# --------------------------------------------------------------------------
# q187 — maintained (streaming) HLL distinct counts: error-bound contract
# --------------------------------------------------------------------------
# The q80/q34 pattern for approximate artifacts: the oracle pins the
# EXACT distinct counts plus two booleans that must be TRUE —
# (a) the maintained estimate is within the sketch's documented bound
# of exact, and (b) the estimate grown by the streaming maintainer
# across micro-batches (one replayed, through parquet) EXACTLY equals
# a from-scratch batch job unioning the same per-batch partials —
# replay, binary storage round-trip, and merge are provably lossless.
# (Equality against a SINGLE-PASS sketch is deliberately NOT asserted:
# at sf0.1's 1500 distinct users the union-of-partials and the
# one-shot sketch sit in different precision modes and disagree by a
# fraction of a register — an HLL property, not maintainer loss.)

HLL_MAINT_BATCHES = 3
HLL_MAINT_TOL = 0.10  # 5x the lgK=12 rsd; the sketch is deterministic

# sf_dir -> temp warehouse root (same memoization contract as
# q175/q176: the maintainer machinery — 3 batches + 1 replay — runs on
# the first invocation per process; best-of-2 times the serving read).
_MAINT_HLL_INDEX: dict[str, str] = {}


def q187_maintained_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type distinct-user estimates from the streaming
    `hll_maintainer`'s stored per-batch sketch partials, checked two
    ways: within HLL_MAINT_TOL of the exact count, and exactly equal
    to a from-scratch batch union of identically-sliced partials —
    the replay-safety + storage-round-trip invariant a 100 TB rollup
    deployment depends on."""
    import tempfile

    from nyc_etl_pipeline_spark.io import Warehouse
    from nyc_etl_pipeline_spark.streaming.sinks import hll_maintainer, merged_hll

    e = read_testdata(spark, sf_dir, "events")
    if sf_dir not in _MAINT_HLL_INDEX:
        root = tempfile.mkdtemp(prefix="maintained_hll_")
        wh = Warehouse(spark, root)
        write_batch = hll_maintainer(wh, "hll", ["event_type"], "user_id")
        for b in range(HLL_MAINT_BATCHES):
            write_batch(
                e.filter(F.pmod(F.col("user_id"), F.lit(HLL_MAINT_BATCHES)) == b), b
            )
        write_batch(
            e.filter(F.pmod(F.col("user_id"), F.lit(HLL_MAINT_BATCHES)) == 0), 0
        )  # retry replay: idempotent partition overwrite
        _MAINT_HLL_INDEX[sf_dir] = root
    wh = Warehouse(spark, _MAINT_HLL_INDEX[sf_dir])

    maintained = merged_hll(wh, "hll", ["event_type"])
    batch_built = (
        e.withColumn("__b", F.pmod(F.col("user_id"), F.lit(HLL_MAINT_BATCHES)))
        .groupBy("event_type", "__b")
        .agg(F.hll_sketch_agg("user_id").alias("__sk"))
        .groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("__sk")).alias("__batch_est"))
    )
    exact = (
        e.select("event_type", "user_id")
        .distinct()
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("exact_users"))
    )
    est = F.col("distinct_est").cast("double")
    return (
        maintained.join(batch_built, on="event_type")
        .join(exact, on="event_type")
        .select(
            "event_type",
            "exact_users",
            (F.abs(est - F.col("exact_users")) <= HLL_MAINT_TOL * F.col("exact_users"))
            .alias("maintained_within_tol"),
            (est == F.col("__batch_est").cast("double")).alias(
                "maintained_equals_batch"
            ),
        )
    )


_Q187_SQL = """
SELECT event_type,
       CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
       TRUE AS maintained_within_tol,
       TRUE AS maintained_equals_batch
FROM events
GROUP BY 1
"""


SPECS = [
    QuerySpec("q187_maintained_hll", q187_maintained_hll, _Q187_SQL,
              "streaming-maintained HLL rollup: error bound + exact batch equality"),
    QuerySpec("q130_trend_fit", q130_trend_fit, _Q130_SQL,
              "per-key OLS daily-volume trend (bit-exact sums formulation)"),
    QuerySpec("q131_radius_pairs", q131_radius_pairs, _q131_sql(),
              "grid-bucketed spatial radius self-join (haversine verify)"),
    QuerySpec("q132_session_transitions", q132_session_transitions, _Q132_SQL,
              "session-scoped event-type transition matrix (Markov view)"),
    QuerySpec("q133_twap", q133_twap, _Q133_SQL,
              "per-user time-weighted average (holding-duration weights)"),
    QuerySpec("q134_running_distinct", q134_running_distinct, _Q134_SQL,
              "running distinct users per day (first-seen reduction, no distinct window)"),
    QuerySpec("q139_cdc_apply", q139_cdc_apply, _Q139_SQL,
              "CDC change-log apply: latest-wins snapshot with deletes"),
    QuerySpec("q142_mad_outliers", q142_mad_outliers, _Q142_SQL,
              "robust median/MAD outlier report per event type"),
    QuerySpec("q144_rolling_median", q144_rolling_median, _Q144_SQL,
              "7-day rolling exact median of daily totals (framed collect+interpolate)"),
    QuerySpec("q147_session_lift", q147_session_lift, _Q147_SQL,
              "session-basket association rules: support/confidence/lift"),
    QuerySpec("q148_ip_cidr", q148_ip_cidr, _q148_sql(),
              "IPv4/CIDR classification via broadcast range join"),
    QuerySpec("q150_capped_sessions", q150_capped_sessions, _Q150_SQL,
              "gap-OR-cap sessionization (sequential recurrence; recursive-CTE oracle)"),
    QuerySpec("q152_winsorize", q152_winsorize, _Q152_SQL,
              "winsorized per-type stats (exact percentile clamp, decimal means)"),
    QuerySpec("q153_benford", q153_benford, _q153_sql(),
              "Benford first-digit distribution + chi-square (log-free digits)"),
    QuerySpec("q157_ks_drift", q157_ks_drift, _Q157_SQL,
              "exact KS drift statistic (integer-exact, one final division)"),
    QuerySpec("q158_theil_sen", q158_theil_sen, _Q158_SQL,
              "Theil-Sen robust slope of daily totals (median of pair slopes)"),
    QuerySpec("q159_gini", q159_gini, _Q159_SQL,
              "Gini concentration coefficient (sorted-rank identity, decimal sums)"),
    QuerySpec("q13_events_tumbling", q13_events_tumbling, _Q13_SQL,
              "hourly tumbling window aggregation"),
    QuerySpec("q14_events_sliding", q14_events_sliding, _Q14_SQL,
              "1h/15m sliding window aggregation"),
    QuerySpec("q15_sessionize", q15_sessionize, _Q15_SQL,
              "gap-based sessionization (lag + cumulative flag)"),
    QuerySpec("q16_json_extract", q16_json_extract, _Q16_SQL,
              "JSON field extraction + aggregation"),
    QuerySpec("q70_gapfill_hours", q70_gapfill_hours, _Q70_SQL,
              "dense-grid hourly gap fill with forward-filled means"),
    QuerySpec("q75_ewma", q75_ewma, _Q75_SQL,
              "bounded-window per-user EWMA (sequential fold, engine-exact)"),
    QuerySpec("q77_salted_agg", q77_salted_agg, _Q77_SQL,
              "salted two-phase aggregation vs plain group-by oracle"),
    QuerySpec("q78_scd2_intervals", q78_scd2_intervals, _Q78_SQL,
              "SCD type-2 validity intervals from an event log (lag/lead)"),
    QuerySpec("q79_session_window", q79_session_window, _Q79_SQL,
              "native session_window aggregation (streaming-capable operator)"),
    QuerySpec("q84_anomaly_bands", q84_anomaly_bands, _Q84_SQL,
              "trailing-window z-score anomaly bands (bit-exact framed sums)"),
    QuerySpec("q85_variant_props", q85_variant_props, _Q85_SQL,
              "VariantType semi-structured access (parse once, typed extraction)"),
    QuerySpec("q89_xml_roundtrip", q89_xml_roundtrip, _Q89_SQL,
              "native XML encode/decode round-trip (to_xml -> from_xml)"),
    QuerySpec("q90_activity_streaks", q90_activity_streaks, _Q90_SQL,
              "gaps-and-islands calendar streaks (day - row_number island id)"),
    QuerySpec("q91_latest_wins", q91_latest_wins, _Q91_SQL,
              "CDC latest-wins compaction (current snapshot from a change log)"),
    QuerySpec("q92_ratio_to_report", q92_ratio_to_report, _Q92_SQL,
              "ratio-to-report shares (per-user window + broadcast grand total)"),
]


# --------------------------------------------------------------------------
# q195 — maintained (streaming) incremental mart: full value parity
# --------------------------------------------------------------------------
# Unlike the sketch maintainers (q187 HLL, q192 MG), the mart's merged
# output is fully deterministic, so this gate asserts COMPLETE value
# parity: the per-event-type mart grown by the streaming
# `mart_maintainer` across micro-batches (one replayed, through
# parquet) must equal the oracle's direct aggregate of the whole
# table — merge(partials) == recompute, through storage and replay.
# DECIMAL(28,6) partial sums make the identity exact, not merely
# round-stable (operators/incremental.py).

MART_MAINT_BATCHES = 3

# sf_dir -> temp warehouse root (q187 memoization contract).
_MAINT_MART_INDEX: dict[str, str] = {}


def q195_maintained_mart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type (sum/cnt/min/max/avg of value, n_rows) from the
    streaming mart maintainer's stored batch partials — one merge
    aggregation over O(keys x batches) rows, never the event stream."""
    import tempfile

    from nyc_etl_pipeline_spark.io import Warehouse
    from nyc_etl_pipeline_spark.streaming.sinks import mart_maintainer, merged_mart

    keys, measures = ["event_type"], ["value"]
    e = read_testdata(spark, sf_dir, "events")
    if sf_dir not in _MAINT_MART_INDEX:
        root = tempfile.mkdtemp(prefix="maintained_mart_")
        wh = Warehouse(spark, root)
        write_batch = mart_maintainer(wh, "mart", keys, measures)
        for b in range(MART_MAINT_BATCHES):
            write_batch(
                e.filter(F.pmod(F.col("user_id"), F.lit(MART_MAINT_BATCHES)) == b), b
            )
        write_batch(
            e.filter(F.pmod(F.col("user_id"), F.lit(MART_MAINT_BATCHES)) == 0), 0
        )  # retry replay: idempotent partition overwrite
        _MAINT_MART_INDEX[sf_dir] = root
    wh = Warehouse(spark, _MAINT_MART_INDEX[sf_dir])
    return merged_mart(wh, "mart", keys, measures)


_Q195_SQL = f"""
SELECT event_type,
       count(*) AS n_rows,
       {sql_round_half_up("CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE)")} AS sum_value,
       CAST(count(value) AS BIGINT) AS cnt_value,
       min(value) AS min_value,
       max(value) AS max_value,
       {sql_round_half_up("CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE) / count(value)")} AS avg_value
FROM events
GROUP BY 1
"""


SPECS.append(
    QuerySpec("q195_maintained_mart", q195_maintained_mart, _Q195_SQL,
              "streaming-maintained incremental mart: merge(partials) == "
              "direct recompute, full value parity")
)


# --------------------------------------------------------------------------
# q197 — maintainer COMPACTION lifecycle: maintain -> compact ->
# continue maintaining -> replay -> merged result still equals the
# direct recompute
# --------------------------------------------------------------------------
# q195 gates the maintainer itself; this gates the lifecycle a
# long-running 100 TB mart actually lives (VERDICT r10 item 7):
# streaming partials accumulate small files, a periodic
# `Warehouse.compact` folds them, and BOTH the exactly-once replay
# contract and value parity must survive the compaction —
# specifically, compact must preserve the batch_id partition layout
# (an unpartitioned rewrite would leave old rows in root files while
# a post-compaction replay writes a fresh batch_id dir, double-
# counting). The gate interleaves: batches 0-1, compact, batches 2-3,
# then a REPLAY of batch 2 after compaction; the merged mart must
# still equal the oracle's direct aggregate of the whole table.

MART_LIFECYCLE_BATCHES = 4

# sf_dir -> temp warehouse root (q187 memoization contract).
_MART_LIFECYCLE_INDEX: dict[str, str] = {}


def q197_mart_compaction_lifecycle(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-event-type mart through maintain -> compact -> maintain ->
    replay: one merge aggregation over the stored partials, with a
    small-file compaction folded into the middle of the batch
    history."""
    import tempfile

    from nyc_etl_pipeline_spark.io import Warehouse
    from nyc_etl_pipeline_spark.streaming.sinks import (
        mart_maintainer,
        merged_mart,
    )

    keys, measures = ["event_type"], ["value"]
    e = read_testdata(spark, sf_dir, "events")
    nb = MART_LIFECYCLE_BATCHES
    if sf_dir not in _MART_LIFECYCLE_INDEX:
        root = tempfile.mkdtemp(prefix="mart_lifecycle_")
        wh = Warehouse(spark, root)
        write_batch = mart_maintainer(wh, "mart", keys, measures)
        for b in (0, 1):
            write_batch(
                e.filter(F.pmod(F.col("user_id"), F.lit(nb)) == b), b
            )
        # fold the small-file history mid-stream; must keep batch_id
        # partition dirs (the replay contract's load-bearing invariant)
        wh.compact("mart", target_file_mb=512)
        # explicit raise, not `assert` (stripped under python -O) —
        # this is the replay contract's load-bearing invariant
        kept = wh.partition_columns("mart")
        if kept != ["batch_id"]:
            raise RuntimeError(
                f"compact broke the mart's partition layout: {kept!r}"
            )
        for b in (2, 3):
            write_batch(
                e.filter(F.pmod(F.col("user_id"), F.lit(nb)) == b), b
            )
        # retry replay AFTER the compaction: idempotent rewrite, and a
        # pre-compaction batch replayed post-compaction (batch 1) must
        # overwrite its compacted partition rather than double-count
        write_batch(e.filter(F.pmod(F.col("user_id"), F.lit(nb)) == 2), 2)
        write_batch(e.filter(F.pmod(F.col("user_id"), F.lit(nb)) == 1), 1)
        _MART_LIFECYCLE_INDEX[sf_dir] = root
    wh = Warehouse(spark, _MART_LIFECYCLE_INDEX[sf_dir])
    return merged_mart(wh, "mart", keys, measures)


SPECS.append(
    QuerySpec("q197_mart_compaction_lifecycle", q197_mart_compaction_lifecycle,
              _Q195_SQL,
              "maintainer compaction lifecycle: maintain -> compact -> "
              "maintain -> replay == direct recompute")
)
