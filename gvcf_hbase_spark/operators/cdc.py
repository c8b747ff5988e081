"""Change-data-capture processing: changelog compaction (latest state
per key) and SCD type-2 history building (validity intervals per
version).

The events table stands in for a CDC changelog: key = ``user_id``,
change sequence = (event time, event_id), and ``event_type = 'error'``
plays the DELETE op (any other type upserts). Both operators are one
window shuffle on the key — the exact shape a 100 TB table-maintenance
job has: merge a day's changelog into a snapshot without ever joining
snapshot × changelog row-by-row. The HBase reading (SURVEY §2A): row
versioning with latest-wins is what the reference's storage gave for
free per cell; these operators are the engine-side equivalent with full
history retained (SCD2) or compacted away (latest-state).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from gvcf_hbase_spark.registry import register
from gvcf_hbase_spark.sources.tables import load_table


def _changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "user_id",
        "event_id",
        F.col("ts_us_long").alias("seq_us"),
        F.when(F.col("event_type") == "error", F.lit("D")).otherwise(F.lit("U")).alias("op"),
        "value",
    )


@register(
    "cdc_compact_latest",
    oracle="""
    WITH ranked AS (
      SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS seq_us,
             CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op, value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
      FROM events
    )
    SELECT user_id, event_id AS last_event_id, seq_us AS last_seq_us,
           round(value, 4) AS last_value
    FROM ranked WHERE rn = 1 AND op <> 'D'
    """,
    tags=("cdc", "window"),
)
def cdc_compact_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changelog compaction: the final materialized state is each key's
    LATEST change by (seq, tiebreak) — unless that change is a DELETE,
    in which case the key is absent. One descending window + rank-1
    filter: the snapshot-merge kernel of every CDC sink (and of HBase's
    latest-version-wins cell semantics). Keys whose last op is D
    disappear, exactly like a tombstoned row; earlier versions never
    survive regardless of op."""
    log = _changelog(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(
        F.col("seq_us").desc(), F.col("event_id").desc()
    )
    return (
        log.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("op") != "D"))
        .select(
            "user_id",
            F.col("event_id").alias("last_event_id"),
            F.col("seq_us").alias("last_seq_us"),
            F.round("value", 4).alias("last_value"),
        )
    )


@register(
    "cdc_scd2_intervals",
    oracle="""
    SELECT user_id, event_id,
           epoch_us(CAST(ts AS TIMESTAMP)) AS valid_from_us,
           coalesce(lead(epoch_us(CAST(ts AS TIMESTAMP)))
                      OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) - 1,
                    9223372036854775807) AS valid_to_us,
           (lead(epoch_us(CAST(ts AS TIMESTAMP)))
              OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) IS NULL)
             AS is_current
    FROM events
    """,
    tags=("cdc", "window"),
)
def cdc_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 history builder: every change becomes a version row
    with a validity interval — ``valid_from`` = its own sequence time,
    ``valid_to`` = the next version's time − 1 (open/current versions get
    MAX_LONG so range predicates need no NULL handling). One ascending
    window with ``lead``; the result is the as-of-queryable dimension
    history (`join_interval` / `join_asof` over these rows answers
    "state of key K at time T"). At 100 TB this is the standard
    dimension-history rebuild: shuffle once on the key, no self-join."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts_us_long", "event_id")
    nxt = F.lead("ts_us_long").over(w)
    return ev.select(
        "user_id",
        "event_id",
        F.col("ts_us_long").alias("valid_from_us"),
        F.coalesce(nxt - 1, F.lit(9223372036854775807)).alias("valid_to_us"),
        nxt.isNull().alias("is_current"),
    )


_PIT_JOIN_ORACLE = """
    WITH dim AS (
      SELECT user_id, event_id AS version_id,
             CAST(round(value * 100, 0) AS BIGINT) AS state_cents,
             epoch_us(CAST(ts AS TIMESTAMP)) AS valid_from_us,
             coalesce(lead(epoch_us(CAST(ts AS TIMESTAMP)))
                        OVER (PARTITION BY user_id
                              ORDER BY epoch_us(ts), event_id) - 1,
                      9223372036854775807) AS valid_to_us
      FROM events WHERE event_type = 'purchase'
    ),
    probe AS (
      SELECT event_id AS click_id, user_id,
             epoch_us(CAST(ts AS TIMESTAMP)) AS t
      FROM events WHERE event_type = 'click'
    )
    SELECT p.click_id, p.user_id, d.version_id, d.state_cents
    FROM probe p JOIN dim d
      ON p.user_id = d.user_id
     AND p.t BETWEEN d.valid_from_us AND d.valid_to_us
"""


@register("join_point_in_time", oracle=_PIT_JOIN_ORACLE, tags=("cdc", "join"))
def join_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (temporal) join against a versioned SCD2 dimension:
    each click is joined to the purchase-state version VALID at the
    click's timestamp — the feature-store join that prevents training-
    data leakage (a feature computed after the label's timestamp must
    never be visible; the validity interval enforces it structurally).

    Same ANSWER as the as-of join, different physical contract: `join_asof`
    rebuilds carry-forward state from the raw history each run (one
    union+window, no join), while this op consumes a dimension ALREADY
    STORED as SCD2 intervals — the shape a warehouse maintains
    incrementally (`cdc_scd2_intervals` builds it; this joins it). Plan:
    equi join on the key with the interval predicate as a post-join
    filter — versions-per-key is small and bounded (a dimension, not an
    event log), so the per-key match scan is cheap and no BETWEEN-driven
    BNL appears; clicks before a user's first purchase drop out (inner),
    matching the interval semantics exactly. MAX_LONG open intervals mean
    the predicate needs no NULL branch on either engine.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts_us_long", "event_id")
    dim = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.col("event_id").alias("version_id"),
            F.round(F.col("value") * 100, 0).cast("bigint").alias("state_cents"),
            F.col("ts_us_long").alias("valid_from_us"),
            "event_id",
        )
        .withColumn(
            "valid_to_us",
            F.coalesce(
                F.lead("valid_from_us").over(
                    Window.partitionBy("user_id").orderBy("valid_from_us", "event_id")
                )
                - 1,
                F.lit(9223372036854775807),
            ),
        )
        .drop("event_id")
    )
    probe = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("ts_us_long").alias("t"),
    )
    return (
        probe.join(dim, "user_id")
        .filter(
            (F.col("t") >= F.col("valid_from_us"))
            & (F.col("t") <= F.col("valid_to_us"))
        )
        .select("click_id", "user_id", "version_id", "state_cents")
    )


_SNAPSHOT_DIFF_ORACLE = """
    WITH log AS (
      SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS seq_us,
             CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
             CAST(round(value * 100, 0) AS BIGINT) AS cents
      FROM events
    ),
    cut AS (SELECT (min(seq_us) + max(seq_us)) // 2 AS t1 FROM log),
    s1 AS (
      SELECT user_id, cents FROM (
        SELECT l.user_id, l.cents, l.op,
               row_number() OVER (PARTITION BY l.user_id
                                  ORDER BY l.seq_us DESC, l.event_id DESC) AS rn
        FROM log l CROSS JOIN cut WHERE l.seq_us <= cut.t1
      ) WHERE rn = 1 AND op <> 'D'
    ),
    s2 AS (
      SELECT user_id, cents FROM (
        SELECT user_id, cents, op,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY seq_us DESC, event_id DESC) AS rn
        FROM log
      ) WHERE rn = 1 AND op <> 'D'
    )
    SELECT coalesce(s1.user_id, s2.user_id) AS user_id,
           CASE WHEN s1.user_id IS NULL THEN 'I'
                WHEN s2.user_id IS NULL THEN 'D'
                ELSE 'U' END AS change,
           s1.cents AS old_cents,
           s2.cents AS new_cents
    FROM s1 FULL OUTER JOIN s2 ON s2.user_id = s1.user_id
    WHERE s1.user_id IS NULL OR s2.user_id IS NULL OR s1.cents <> s2.cents
"""


@register("cdc_snapshot_diff", oracle=_SNAPSHOT_DIFF_ORACLE, tags=("cdc", "join"))
def cdc_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-to-snapshot diff: materialize the keyed state at the
    changelog's midpoint (T1) and at its end (T2), then emit the net
    change set between them — insert / update / delete per key, old and
    new values side by side. This is the table-diff primitive behind
    incremental reconciliation, backfill audits, and "what changed
    since the last training snapshot" questions; CDC systems produce it
    as a *changelog-to-changelog* reduction without replaying either
    snapshot from scratch.

    The cutoff is data-derived ((min+max)/2 of the sequence axis,
    integer arithmetic, one scalar aggregate broadcast) so the op is
    deterministic at every SF. Both snapshots are the same
    latest-wins window compaction as `cdc_compact_latest` (delete-last
    keys absent); the diff is ONE full-outer equi-join on the key with
    a three-way classification and an unchanged-row filter — all three
    stages partition on user_id, so the whole pipeline rides one
    partitioning at scale. Values compared in exact cents."""
    log = _changelog(spark, sf_dir).withColumn(
        "cents", F.round(F.col("value") * 100, 0).cast("bigint")
    )
    cut = log.agg(
        ((F.min("seq_us") + F.max("seq_us")) / 2).cast("bigint").alias("t1")
    )

    def state(df):
        w = Window.partitionBy("user_id").orderBy(
            F.col("seq_us").desc(), F.col("event_id").desc()
        )
        return (
            df.withColumn("rn", F.row_number().over(w))
            .filter((F.col("rn") == 1) & (F.col("op") != "D"))
            .select("user_id", "cents")
        )

    s1 = state(log.crossJoin(F.broadcast(cut)).filter(F.col("seq_us") <= F.col("t1")))
    s2 = state(log)
    a = s1.select(F.col("user_id").alias("uid_a"), F.col("cents").alias("old_cents"))
    b = s2.select(F.col("user_id").alias("uid_b"), F.col("cents").alias("new_cents"))
    j = a.join(b, a.uid_a == b.uid_b, "full_outer")
    return j.filter(
        F.col("uid_a").isNull()
        | F.col("uid_b").isNull()
        | (F.col("old_cents") != F.col("new_cents"))
    ).select(
        F.coalesce(F.col("uid_a"), F.col("uid_b")).alias("user_id"),
        F.when(F.col("uid_a").isNull(), "I")
        .when(F.col("uid_b").isNull(), "D")
        .otherwise("U")
        .alias("change"),
        "old_cents",
        "new_cents",
    )
