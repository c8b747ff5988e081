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


def _read_events(spark: SparkSession, path: str) -> DataFrame:
    """events.parquet carries TIMESTAMP(NANOS); Spark 4.1.2 rejects it
    unless ``spark.sql.legacy.parquet.nanosAsLong=true`` (SURVEY §1.2,
    probe-verified). With the flag, ``ts`` arrives as long nanoseconds; we
    add ``ts_us`` (µs-truncated timestamp — matches DuckDB's ns→µs cast) and
    keep the raw ``ts`` long for exact arithmetic.

    Fallback (driver session where the conf could not be applied): read via
    pyarrow and cast ns→µs before handing to Spark. Only viable at test SFs;
    the conf path is the scale path.
    """
    try:
        df = spark.read.parquet(path)
        # long ns -> µs timestamp. Integer division: exact (a double round
        # trip would lose ns precision at 1.7e18).
        return df.withColumn(
            "ts_us", F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz")
        )
    except Exception:
        import pyarrow.parquet as pq

        tbl = pq.read_table(path)
        pdf = tbl.to_pandas()
        pdf["ts_us"] = pdf["ts"].astype("datetime64[us]")
        pdf["ts"] = pdf["ts"].astype("int64")
        return spark.createDataFrame(pdf)


def spread(df: DataFrame, n: int | None = None) -> DataFrame:
    """Fan a small single-file table out across the cluster before
    compute-heavy per-row work.

    A small parquet table arrives as ONE input split, so an expensive
    per-row pipeline (shingling, hashing, vector math) would run on a
    single core no matter how many are available — measured 12.6 s → 1.7 s
    on the sf0.1 shingle explode by spreading first. The shuffle this
    costs is trivial (the table is small by definition); do NOT use on
    large fact tables, which already arrive as many splits at scale.
    """
    sc = df.sparkSession.sparkContext
    return df.repartition(n or sc.defaultParallelism)


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
