"""Streaming §2B.10 — batch twins. Every streaming aggregation is written
once against a batch DataFrame (this module — oracle-checkable, these are
the ``queries()`` entries) and once as real Structured Streaming
(stream_ops.py); tests assert batch ≡ stream under availableNow.

Scale notes: tumbling/sliding windows are plain hash aggregates on
(window, keys) — partial+final, horizontally scalable. Session windows
require a per-key sort (gaps-and-islands); Spark's session_window handles
merging in the state store when streaming and via sort-based aggregation
in batch.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from gvcf_hbase_spark.registry import register
from gvcf_hbase_spark.sources.tables import load_table


def tumbling_agg(ev: DataFrame) -> DataFrame:
    """Shared by batch and streaming paths: per-hour, per-type counts."""
    return (
        ev.groupBy(F.window("ts_us", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("cnt"), F.round(F.sum("value"), 4).alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "cnt",
            "total_value",
        )
    )


def sliding_agg(ev: DataFrame) -> DataFrame:
    """1-hour windows sliding every 15 minutes (each event in 4 windows)."""
    return (
        ev.groupBy(F.window("ts_us", "1 hour", "15 minutes").alias("w"))
        .agg(F.count("*").alias("cnt"), F.round(F.sum("value"), 4).alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "cnt", "total_value")
    )


def session_agg(ev: DataFrame) -> DataFrame:
    """30-minute-gap session windows per user."""
    return (
        ev.groupBy(F.session_window("ts_us", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 4).alias("total_value"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "n_events",
            "total_value",
        )
    )


@register(
    "stream_tumbling",
    oracle="""
    SELECT time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) AS window_start,
           event_type,
           count(*) AS cnt,
           round(sum(value), 4) AS total_value
    FROM events GROUP BY 1, 2
    """,
    tags=("streaming",),
)
def stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1h windows (batch twin; streaming equivalence in tests)."""
    return tumbling_agg(load_table(spark, sf_dir, "events"))


@register(
    "stream_sliding",
    oracle="""
    SELECT time_bucket(INTERVAL '15 minutes', CAST(ts AS TIMESTAMP))
             - k * INTERVAL '15 minutes' AS window_start,
           count(*) AS cnt,
           round(sum(value), 4) AS total_value
    FROM events, unnest([0, 1, 2, 3]) AS u(k)
    GROUP BY 1
    """,
    tags=("streaming",),
)
def stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 1h/15min windows. Oracle derivation: an event at t belongs
    to exactly the 4 windows starting at bucket15(t) - k·15min, k∈0..3."""
    return sliding_agg(load_table(spark, sf_dir, "events"))


@register(
    "agg_time_rollup",
    oracle="""
    WITH fine AS (
      SELECT time_bucket(INTERVAL '5 minutes', CAST(ts AS TIMESTAMP)) AS w5,
             event_type, count(*) AS cnt, sum(value) AS sv
      FROM events GROUP BY 1, 2
    )
    SELECT time_bucket(INTERVAL '1 hour', w5) AS window_start, event_type,
           CAST(sum(cnt) AS BIGINT) AS cnt,
           round(sum(sv), 4) AS total_value
    FROM fine GROUP BY 1, 2
    """,
    tags=("streaming", "agg", "rollup"),
)
def agg_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous-aggregate rollup: maintain the
    5-minute fine-grain aggregate (the materialized tier a streaming job
    keeps current), then answer the 1-hour query by RE-AGGREGATING the
    fine tier — never rescanning the raw events. Works because count/sum
    are mergeable; the oracle re-aggregates the same fine tier, and the
    1h result must equal stream_tumbling's direct aggregation (asserted
    in tests). At 100 TB the fine tier is ~raw/300 rows, so every coarser
    rollup (hour/day/month) costs a scan of the tier above it, not the
    fact table — the same persisted-sketch pattern as
    agg_hll_sketch_merge, for time."""
    ev = load_table(spark, sf_dir, "events")
    fine = (
        ev.groupBy(F.window("ts_us", "5 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("cnt"), F.sum("value").alias("sv"))
        .select(F.col("w.start").alias("w5"), "event_type", "cnt", "sv")
    )
    return (
        fine.groupBy(F.window("w5", "1 hour").alias("w"), "event_type")
        .agg(
            F.sum("cnt").cast("bigint").alias("cnt"),
            F.round(F.sum("sv"), 4).alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "cnt", "total_value")
    )


@register(
    "stream_session",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS t, value,
             lag(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev_t
      FROM events
    ),
    flagged AS (
      SELECT *, CASE WHEN prev_t IS NULL
                       OR epoch_us(t) - epoch_us(prev_t) >= 1800000000 THEN 1 ELSE 0 END AS new_s
      FROM ordered
    ),
    sessions AS (
      -- event_id tiebreak matches the lag clause above: under duplicate
      -- (user_id, ts) pairs a ROWS running sum is peer-order-sensitive, and
      -- a tied row could otherwise be summed in a different order than its
      -- new_s flag was computed in (r08 ADVICE window-wobble audit).
      SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY epoch_us(t), event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM flagged
    )
    SELECT user_id, min(t) AS session_start,
           count(*) AS n_events, round(sum(value), 4) AS total_value
    FROM sessions GROUP BY user_id, sid
    """,
    tags=("streaming", "gvcf"),
)
def stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows, 30-min gap (batch twin). Boundary semantics
    aligned: a gap of exactly 30min starts a NEW session on both engines
    (Spark merges only while next_start < prev_ts + gap)."""
    return session_agg(load_table(spark, sf_dir, "events"))
