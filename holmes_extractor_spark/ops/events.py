"""Event-stream analytics (batch form of the streaming aggregations in
streaming/ingest_stream.py — identical semantics, so the watermarked
streaming path is verified against this oracle-checked batch path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def event_windows(events: DataFrame, minutes: int = 10) -> DataFrame:
    """Tumbling-window counts + value sums per event_type (epoch-aligned
    windows, same alignment as DuckDB time_bucket)."""
    w = F.window(F.col("ts").cast("timestamp"), f"{minutes} minutes")
    return (events.groupBy(w.alias("w"), "event_type")
            .agg(F.count("*").alias("n"),
                 F.round(F.sum("value"), 4).alias("total_value"))
            .select(F.col("w.start").cast("string").alias("window_start"),
                    "event_type", "n", "total_value"))


def event_windows_sql(minutes: int = 10) -> str:
    return f"""
SELECT CAST(time_bucket(INTERVAL '{minutes} minutes', ts) AS VARCHAR) AS window_start,
       event_type, count(*) AS n, round(sum(value), 4) AS total_value
FROM events
GROUP BY 1, 2
ORDER BY 1, 2
"""


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Session windows per user: a new session starts after a gap >
    `gap_minutes` (classic lag + cumulative-sum sessionization — pure
    window functions, no UDF)."""
    from pyspark.sql import Window
    # total order (ts, event_id) — duplicate timestamps per user would
    # otherwise make lag() nondeterministic across partitionings
    uw = Window.partitionBy("user_id").orderBy("ts", "event_id")
    epoch = F.col("ts").cast("timestamp").cast("long")
    with_gap = events.withColumn(
        "new_session",
        (epoch - F.lag(epoch, 1, 0).over(uw) > gap_minutes * 60).cast("int"))
    with_sid = with_gap.withColumn(
        "session_no",
        F.sum("new_session").over(
            uw.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    return (with_sid.groupBy("user_id", "session_no")
            .agg(F.count("*").alias("n_events"),
                 F.min("ts").cast("string").alias("session_start"),
                 F.max("ts").cast("string").alias("session_end")))


def sessionize_sql(gap_minutes: int = 30) -> str:
    return f"""
WITH g AS (
  SELECT user_id, ts, event_id,
         CASE WHEN epoch(ts) - epoch(lag(ts, 1, '1970-01-01'::TIMESTAMP)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id)) > {gap_minutes * 60}
              THEN 1 ELSE 0 END AS new_session
  FROM events
),
s AS (
  SELECT user_id, ts,
         CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_no
  FROM g
)
SELECT user_id, session_no, count(*) AS n_events,
       CAST(min(ts) AS VARCHAR) AS session_start,
       CAST(max(ts) AS VARCHAR) AS session_end
FROM s GROUP BY user_id, session_no
ORDER BY user_id, session_no
"""
