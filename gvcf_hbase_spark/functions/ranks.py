"""Two-phase distributed rank / ntile — the scale-safe replacement for
``row_number()/ntile() OVER (ORDER BY ...)`` global windows (which Spark
plans as a SINGLE-partition WindowExec: every row through one task).

The trick (same machinery as ``feat_rank_bucketize`` and
``curate_pack_batches``'s prefix sum): pick a bucket key that is
(non-strictly) MONOTONE in the global sort order and CONSTANT across
sort-key ties — e.g. ``value div W`` for an ascending sort on value, or
its negation for descending. Then value buckets are rank-contiguous, so

    global_rank = local_rank_within_bucket + (# rows in earlier buckets)

bit-for-bit. Phase 1 ranks inside each bucket (a keyed, bounded window);
phase 2 computes the exclusive running count over ONE ROW PER BUCKET
(thousands of rows at 100 TB) and broadcasts it back. No global sort is
ever materialized; every per-row sort is bounded by a bucket.

``ntile`` is rank arithmetic after that: with n rows and b tiles,
q = n div b and r = n mod b, the first r tiles hold q+1 rows, so

    tile(rk) = 1 + (rk-1) div (q+1)                    if rk <= r*(q+1)
             = 1 + r + (rk-1 - r*(q+1)) div q          otherwise

which is exactly the SQL-standard ntile both Spark and DuckDB implement.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_VBKT, _LR, _OFF, _CNT, _N = "__vbkt", "__lr", "__off", "__c", "__n"


def attach_two_phase_rank(
    df: DataFrame,
    order: list[Column],
    bucket: Column,
    out: str = "__rk",
    with_total: bool = False,
) -> DataFrame:
    """Append the global ``row_number() OVER (ORDER BY *order)`` as
    column ``out`` without a single-partition window.

    ``bucket`` MUST be monotone in the sort order, constant across
    ties of the non-tiebreak sort keys (callers pass e.g.
    ``-floor(col/W)`` for a descending sort on ``col``), and NON-NULL
    for every row: a NULL bucket would silently miss the offsets join
    and drop the row from the output (native row_number/ntile would
    rank it), so the plan raises at runtime instead — coalesce NULLs
    into a real bucket value BEFORE calling if the metric is nullable.
    With ``with_total`` a ``__n`` total-row-count column (1-row
    broadcast) is appended too — ``attach_two_phase_ntile`` needs it."""
    # Coalesce is lazily evaluated, so the error branch costs nothing on
    # the non-null path; a NULL bucket fails the job loudly rather than
    # losing rows in the inner join below.
    tagged = df.withColumn(
        _VBKT,
        F.coalesce(
            bucket.cast("long"),
            F.raise_error(
                F.lit("attach_two_phase_rank: bucket expression must be non-null")
            ).cast("long"),
        ),
    )
    in_bkt = Window.partitionBy(_VBKT).orderBy(*order)
    local = tagged.withColumn(_LR, F.row_number().over(in_bkt))
    counts = tagged.groupBy(_VBKT).agg(F.count("*").alias(_CNT))
    off_w = Window.orderBy(_VBKT).rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        _VBKT, F.coalesce(F.sum(_CNT).over(off_w), F.lit(0)).alias(_OFF)
    )
    out_df = local.join(F.broadcast(offsets), _VBKT).withColumn(
        out, (F.col(_OFF) + F.col(_LR)).cast("long")
    )
    if with_total:
        n = counts.agg(F.sum(_CNT).cast("long").alias(_N))
        out_df = out_df.crossJoin(F.broadcast(n))
    return out_df.drop(_VBKT, _LR, _OFF)


def attach_two_phase_cumsum(
    df: DataFrame,
    order: list[Column],
    bucket: Column,
    sums: dict[str, str],
) -> DataFrame:
    """Append inclusive running sums ``sum(src) OVER (ORDER BY *order)``
    as ``{src: out}`` columns without a single-partition window — the
    running-SUM sibling of :func:`attach_two_phase_rank`, same bucket
    contract (monotone in the sort order, constant across ties,
    non-null). Phase 1 runs each cumulative sum inside its bucket (a
    keyed window); phase 2 folds the exclusive prefix of PER-BUCKET
    totals (one row per bucket) back in via a broadcast join. Used by
    the exact CDF statistics (`agg_ks_test`, `analytics_mann_whitney`)
    whose support relation is value-domain-sized: bounded today, but a
    wide domain at 100× would otherwise ride one task."""
    tagged = df.withColumn(
        _VBKT,
        F.coalesce(
            bucket.cast("long"),
            F.raise_error(
                F.lit("attach_two_phase_cumsum: bucket expression must be non-null")
            ).cast("long"),
        ),
    )
    in_bkt = (
        Window.partitionBy(_VBKT)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = tagged
    for src, out in sums.items():
        local = local.withColumn(out, F.sum(src).over(in_bkt))
    totals = tagged.groupBy(_VBKT).agg(
        *[F.sum(src).alias(f"__t{out}") for src, out in sums.items()]
    )
    off_w = Window.orderBy(_VBKT).rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        _VBKT,
        *[
            F.coalesce(F.sum(f"__t{out}").over(off_w), F.lit(0)).alias(f"__o{out}")
            for out in sums.values()
        ],
    )
    out_df = local.join(F.broadcast(offsets), _VBKT)
    for out in sums.values():
        out_df = out_df.withColumn(out, F.col(out) + F.col(f"__o{out}"))
    return out_df.drop(_VBKT, *[f"__o{out}" for out in sums.values()])


def ntile_from_rank(rk: Column, n: Column, tiles: int) -> Column:
    """SQL-standard ntile(tiles) given a 1-based global rank and total n."""
    q = F.floor(n / tiles)
    r = n - q * tiles
    thr = r * (q + 1)
    return (
        F.when(rk <= thr, F.floor((rk - 1) / (q + 1)) + 1)
        .otherwise(r + F.floor((rk - thr - 1) / q) + 1)
        .cast("long")
    )


def attach_two_phase_ntile(
    df: DataFrame,
    order: list[Column],
    bucket: Column,
    tiles: int,
    out: str,
) -> DataFrame:
    """Append ``ntile(tiles) OVER (ORDER BY *order)`` as column ``out``
    via the two-phase rank — identical output, no global window."""
    ranked = attach_two_phase_rank(df, order, bucket, out="__rk", with_total=True)
    return ranked.withColumn(
        out, ntile_from_rank(F.col("__rk"), F.col(_N), tiles)
    ).drop("__rk", _N)
