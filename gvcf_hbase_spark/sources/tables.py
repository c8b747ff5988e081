"""Parquet table sources.

Reference parity: the reference's only source is a gVCF file parsed with
htsjdk into variant records that are then bulk-loaded into HBase (SURVEY
§2A A1/A6 — upstream recollection, reference checkout empty). Our engine's
sources are columnar Parquet scans: Catalyst pushes predicates to row-group
min/max stats (the Spark-native replacement for HBase start/stop-row range
scans) and prunes columns (the replacement for column-family projection).

Scale note (100 TB): ``spark.read.parquet`` over a partitioned/range-sorted
directory gives one task per file split; partition pruning + row-group
skipping mean a key-range query touches only the matching fraction of the
data, exactly like an HBase region scan — see plans/layout.py for the
writer half of that contract.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import LongType

from gvcf_hbase_spark.session import apply_runtime_confs

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def with_event_time(df: DataFrame) -> DataFrame:
    """Derive the engine's canonical event-time columns from whatever
    physical type ``ts`` arrived as:

    - ``ts_us_long``: bigint epoch microseconds (exact arithmetic column —
      every band/as-of/window predicate runs on this);
    - ``ts_us``: µs TIMESTAMP_NTZ (window/session grouping, date math).

    Two physical sources exist in the wild: the fixtures carry
    ``timestamp[us]`` (arrives as TIMESTAMP_NTZ; the ntz→ltz cast under the
    UTC session timezone makes ``unix_micros`` exact), and legacy writers
    emit TIMESTAMP(NANOS), which under ``nanosAsLong=true`` arrives as long
    nanoseconds (``div 1000`` is exact integer math — a double round trip
    would lose precision at 1.7e18). Branching on the actual dtype keeps one
    distributed scan path for both; there is deliberately NO driver-side
    fallback — at 100 TB a pyarrow/pandas materialization is not slow, it is
    impossible.
    """
    dt = df.schema["ts"].dataType
    if isinstance(dt, LongType):
        us = F.expr("ts div 1000")
    else:
        us = F.unix_micros(F.col("ts").cast("timestamp"))
    return df.withColumn("ts_us_long", us).withColumn(
        "ts_us", F.timestamp_micros(F.col("ts_us_long")).cast("timestamp_ntz")
    )


def _read_events(spark: SparkSession, path: str) -> DataFrame:
    return with_event_time(spark.read.parquet(path))


def _parse_byte_conf(raw: str) -> int:
    """Parse a Spark byte-string conf value (``134217728``, ``128m``,
    ``1g``, ``134217728b`` — the JavaUtils.byteStringAsBytes grammar).
    Stripping non-digits is NOT safe here: ``'128m'`` would become 128
    bytes and silently wreck any size arithmetic built on it."""
    s = str(raw).strip().lower()
    if s.endswith("b"):
        s = s[:-1]
    mult = 1
    if s and s[-1] in "kmgtp":
        mult = 1024 ** ("kmgtp".index(s[-1]) + 1)
        s = s[:-1]
    return int(s) * mult


def scan_size_bytes(df: DataFrame) -> int | None:
    """Total on-disk bytes of the DataFrame's scan, from the file listing
    (~4 ms) — the cheap stand-in for ``df.count()`` when an operator needs
    a size-based physical-strategy dispatch (e.g. broadcast brute-force vs
    blocked vector search). Returns None for non-file sources or remote
    filesystems where local stat fails; callers must treat None as
    "unknown, assume large" so the scale-safe path is the default."""
    import os
    from urllib.parse import urlparse

    files = df.inputFiles()
    if not files:
        return None
    try:
        return sum(os.path.getsize(urlparse(f).path) for f in files)
    except OSError:
        return None


def scan_raw_bytes(df: DataFrame) -> int | None:
    """Total UNCOMPRESSED bytes of the DataFrame's parquet scan, from the
    file footers (~ms, local paths only). Compressed file size is a bad
    work proxy for clone-heavy corpora (the 10x-replicated sf1 fixture
    compresses to 1.5x the sf0.1 file while carrying 10x the per-byte
    compute), so work-gated dispatches read the raw size. None when the
    source is not local parquet — callers treat None as "unknown, assume
    large" so the scale-safe path is the default."""
    from urllib.parse import urlparse

    files = df.inputFiles()
    if not files:
        return None
    try:
        import pyarrow.parquet as pq

        total = 0
        for f in files:
            md = pq.ParquetFile(urlparse(f).path).metadata
            for rg in range(md.num_row_groups):
                total += md.row_group(rg).total_byte_size
        return total
    except Exception:
        return None


# Work floor for spread_heavy: the heaviest per-raw-byte pass in the
# Arrow tier (the Gear CDC rolling hash) runs ~0.17 us/byte single-
# threaded, so 8 MB is ~1.4 s of single-core work — the regime where
# paying one extra round-robin exchange (+~0.1-0.3 s of stage overhead
# at local scale) for a many-core win is clearly right. Below it the
# overhead rivals the win: the r10 A/B measured spread-always costing
# +0.1-0.33 s per key at sf0.1 (~1.5 MB raw) while saving 1.7-1.9 s per
# key at sf1 (~15 MB raw). Both fixtures sit a comfortable factor from
# the threshold on their correct sides.
_SPREAD_HEAVY_MIN_RAW_BYTES = 8 << 20


def spread_heavy(df: DataFrame) -> DataFrame:
    """spread() gated on RAW scan bytes: fan an under-parallel scan out
    ONLY when the single-split work is big enough to beat the extra
    exchange (see _SPREAD_HEAVY_MIN_RAW_BYTES). Unknown size => spread
    (scale-safe default; at scale spread() is itself a no-op)."""
    raw = scan_raw_bytes(df)
    if raw is not None and raw < _SPREAD_HEAVY_MIN_RAW_BYTES:
        return df
    return spread(df)


def spread(df: DataFrame, n: int | None = None) -> DataFrame:
    """Fan a table out across the cluster before compute-heavy per-row
    work — but ONLY when it actually arrives under-parallel.

    A small parquet table arrives as ONE input split, so an expensive
    per-row pipeline (shingling, hashing, vector math) would run on a
    single core no matter how many are available — measured 12.6 s → 1.7 s
    on the sf0.1 shingle explode by spreading first.

    The guard is the 100 TB half of the contract: at scale the same table
    arrives as thousands of splits, and an unconditional repartition would
    be a full shuffle of raw text/vectors for nothing. If the scan already
    yields >= the target parallelism, the input passes through untouched —
    so operators can call spread() unconditionally and stay correct at
    both ends of the scale.

    Parallelism is estimated from the scan's file listing (count, plus
    size/maxPartitionBytes splits for large files) — ~4 ms. The obvious
    alternative, ``df.rdd.getNumPartitions()``, compiles the plan to an
    RDD and costs ~1 s per call (measured); for non-file sources (no
    listing available) we fall back to it. Contract: call spread() on
    scans (or projections of scans) — it estimates the SCAN's
    parallelism and won't see a repartition a caller already applied."""
    spark = df.sparkSession
    target = n or spark.sparkContext.defaultParallelism
    files = df.inputFiles()
    if files:
        est = len(files)
        total = scan_size_bytes(df)
        if total is not None:
            try:
                raw = spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728b")
                max_bytes = _parse_byte_conf(raw)
            except ValueError:
                max_bytes = 134217728  # odd conf value: Spark's default
            est = max(est, total // max_bytes)
    else:
        est = df.rdd.getNumPartitions()
    if est >= target:
        return df
    return df.repartition(target)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table as a DataFrame.

    Applies the engine's runtime confs to the session first (the driver
    harness hands us a session we didn't build).
    """
    apply_runtime_confs(spark)
    path = f"{sf_dir}/{name}.parquet"
    if name == "events":
        return _read_events(spark, path)
    return spark.read.parquet(path)
