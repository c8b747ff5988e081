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

from pyspark.sql import DataFrame


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
