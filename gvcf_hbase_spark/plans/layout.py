"""100 TB storage layout: the reference's bulk-load pattern, Spark-first.

The reference bulk-loads key-sorted HFiles into pre-split HBase regions
(SURVEY §2A A5/A12): sorted sequential writes, and scan parallelism = the
region splits aligned with block boundaries (A4). The Spark-native
equivalent is a range-partitioned, sorted Parquet layout:

- ``repartitionByRange(n, keys)``  ≙ pre-split regions (each output file
  owns a contiguous key range)
- ``sortWithinPartitions(keys)``   ≙ HFile key order (row-group min/max
  stats become tight, so key-range scans skip whole files/row groups —
  the Parquet analog of an HBase start/stop-row scan)

At 100 TB, choose n so each file lands 128 MB-1 GB; AQE coalesces small
reads back together. No fixed-boundary block duplication (A4) is needed:
Spark shuffles realign interval data, so layout is purely a performance
contract here, not a correctness one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def bulk_write_range_sorted(
    df: DataFrame, path: str, keys: list[str], num_partitions: int | None = None
) -> None:
    """A5 analog: write ``df`` as range-partitioned, key-sorted Parquet."""
    out = (
        df.repartitionByRange(num_partitions, *keys)
        if num_partitions
        else df.repartitionByRange(*keys)
    )
    out.sortWithinPartitions(*keys).write.mode("overwrite").parquet(path)


def write_hive_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], sort_keys: list[str] | None = None
) -> None:
    """Hive-style directory partitioning (``path/col=value/...``): the
    coarse pruning axis that range-sorting alone can't give. A filter on a
    partition column never opens non-matching directories — Catalyst turns
    it into ``PartitionFilters`` at plan time (zero I/O, not even footer
    reads), the exact analog of scanning only the HBase regions whose key
    range matches (A12).

    Layout contract at 100 TB: partition on the low-cardinality pruning
    axis (date, contig/chromosome), range-sort WITHIN partitions on the
    fine key so row-group stats handle the rest. Over-partitioning
    (millions of tiny dirs) kills the file listing — keep partitions
    ≥ ~1 GB and let row-group stats do the fine-grained work."""
    w = df.repartition(*partition_cols)
    if sort_keys:
        w = w.sortWithinPartitions(*partition_cols, *sort_keys)
    w.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)


def write_bucketed(
    spark: SparkSession,
    df: DataFrame,
    table: str,
    path: str,
    keys: list[str],
    n_buckets: int,
) -> None:
    """Bucketed, sorted table: the co-located-join layout. Both sides of a
    recurring large-large join bucketed by the join key into the same
    bucket count hash-place matching keys into matching files, so the join
    compiles to a zero-Exchange SortMergeJoin — the shuffle is paid ONCE
    at write time and amortized over every subsequent join/aggregation on
    that key. This is the Spark-native analog of the reference pre-
    splitting regions so scans never re-distribute (A4/A5/A12).

    Scale: pick n_buckets so each bucket file is 128 MB–1 GB at target
    volume (100 TB / 1 GB ≈ 10⁵ buckets); bucket counts on the two sides
    must match (or divide evenly, AQE-era Spark can coalesce)."""
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    (
        df.write.mode("overwrite")
        .option("path", path)
        .bucketBy(n_buckets, *keys)
        .sortBy(*keys)
        .saveAsTable(table)
    )
